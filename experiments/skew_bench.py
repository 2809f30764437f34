"""Planted-hot-key skew bench: salted_join vs plain vs AQE skew-join.

Builds (once) a skewed copy of the amplified lineitem where ONE
orderkey owns ~30% of all rows — the shape a viral item / default
value / null-key surrogate produces in real fact tables — then times
the lineitem ⋈ orders revenue join three ways on the SAME files:

  plain      static plan, AQE off: the hot key's entire row mass lands
             in one sort-merge reducer — the straggler lane.
  aqe        AQE skew-join splitting (session default posture): the
             runtime re-plan splits the oversized partition when it
             exceeds skewedPartitionThresholdInBytes (256 MB default).
  salted     operators/skew.py salted_join, blanket mode: every key is
             salted and the WHOLE small side replicated `salt` times —
             measured here precisely to show it is a bad trade.
  targeted   salted_join(hot_keys=[...]): only the detected hot key is
             salted/replicated (detect_hot_keys, one agg job); the cold
             path joins 1:1. The production lane for the shapes AQE
             can't fix (hash aggs, stream-stream joins, sub-threshold
             skew).

Run: python experiments/skew_bench.py [src_amplified_dir]
(defaults to /tmp/sf10-amp — build with tools/amplify_all.py first).
Prints one timing line per lane; the table lives in BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spotify_etl_aws_spark.operators.skew import salted_join
from spotify_etl_aws_spark.session import get_spark
from spotify_etl_aws_spark.sources.readers import load_table

HOT_FRACTION = 0.3
HOT_KEY = 7  # an existing orderkey; 30% of lineitem rows collapse onto it
SALT = 16
RUNS = 2


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def build_skewed(spark, src_dir: str, out: str) -> None:
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return
    li = load_table(spark, src_dir, "lineitem")
    skewed = li.withColumn(
        "l_orderkey",
        F.when(F.rand(seed=11) < HOT_FRACTION, F.lit(HOT_KEY)).otherwise(
            F.col("l_orderkey")
        ),
    )
    skewed.write.mode("overwrite").parquet(out)


def revenue_join(li, orders):
    return (
        li.join(orders.select("o_orderkey", "o_custkey"),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
    )


def salted_revenue_join(li, orders, hot_keys=None):
    joined = salted_join(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        orders.select("o_orderkey", "o_custkey"),
        on="o_orderkey",
        salt=SALT,
        hot_keys=hot_keys,
    )
    return joined.groupBy("o_custkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )


def timed(label: str, mk) -> float:
    materialize(mk())  # warm (codegen + page cache)
    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        materialize(mk())
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best:.2f}s", flush=True)
    return best


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10-amp"
    skew_path = "/tmp/skew-lineitem"
    spark = get_spark(app_name="skew_bench")
    spark.sparkContext.setLogLevel("ERROR")
    build_skewed(spark, src, skew_path)
    li = spark.read.parquet(skew_path)
    orders = load_table(spark, src, "orders")
    n_hot = li.filter(F.col("l_orderkey") == HOT_KEY).count()
    print(f"rows={li.count()} hot_key_rows={n_hot}", flush=True)

    conf = spark.conf
    # plain: static plan, the hot key serializes one reducer
    conf.set("spark.sql.adaptive.enabled", "false")
    timed("plain (AQE off)", lambda: revenue_join(li, orders))

    # AQE skew-join splitting (cluster default posture)
    conf.set("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    timed("aqe skew-join", lambda: revenue_join(li, orders))

    # blanket salting: plan-time spreading of EVERY key, AQE off
    conf.set("spark.sql.adaptive.enabled", "false")
    timed(f"salted blanket (salt={SALT}, AQE off)",
          lambda: salted_revenue_join(li, orders))

    # targeted salting: detect the hot keys once, salt only those
    from spotify_etl_aws_spark.operators.skew import detect_hot_keys

    t0 = time.perf_counter()
    hot = detect_hot_keys(li, "l_orderkey", min_fraction=0.05)
    print(f"detect_hot_keys: {time.perf_counter() - t0:.2f}s -> {hot}", flush=True)
    timed(f"salted targeted (salt={SALT}, AQE off)",
          lambda: salted_revenue_join(li, orders, hot_keys=hot))
    conf.set("spark.sql.adaptive.enabled", "true")


if __name__ == "__main__":
    main()
