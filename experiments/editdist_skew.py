"""Planted power-law skew probe for the edit-distance segment join
(round-8 verdict item 5): ONE title with 10^4 copies inside a uniform
50k-string background, through `editdistance_join` unsalted vs salted.

What the probe establishes (also pinned at test scale in
tests/test_editdist.py::test_planted_skew_salt_balances_hot_key):

- **AQE skew split does NOT fire on this shape, structurally.** AQE
  detects skew from the shuffle's map-output (INPUT) partition sizes;
  a replica family's segment keys have modest input (~75 probe rows
  and d+1 index rows per copy) but QUADRATIC join output (~H² rows
  from one reduce key). The explosion AQE would need to see happens
  after the exchange it inspects. Measured at test scale: a 600-copy
  family leaves the plan un-split at 258× the median partition with
  zero `isSkew` reads.
- **Salting restores balance**: probe rows shard by id hash, index
  rows replicate across shards, every pair still meets exactly once;
  `salt > 1` also pins a sort-merge join so the spread actually
  happens in a shuffle (a broadcast would generate all candidates
  inside the probe's upstream partitions, where replica families are
  adjacent).
- The within-family output itself (≈ H²/2 = 5×10^7 pairs at 10^4) is
  the operator's CONTRACT, not overhead — every pair is within
  distance 0 — so the probe reports end-to-end pair-count equality
  between both paths, wall time, and the candidate-join partition
  balance (max/median rows).

Run: python experiments/editdist_skew.py [H] [U]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
U = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
SALT = 64


def main() -> None:
    from pyspark.sql import functions as F

    from spotify_etl_aws_spark.operators.editdist import (
        _candidates,
        _normalized,
        editdistance_join,
    )
    from spotify_etl_aws_spark.session import get_spark

    spark = get_spark(app_name="editdist-skew")
    spark.sparkContext.setLogLevel("ERROR")
    # the 100 TB shape: the indexed side is NOT broadcastable (at probe
    # scale Spark would broadcast it, and a round-robin input layout
    # then masks the hot key by accident — the output lands wherever
    # the probe rows already were; measured 1.1x "balance" that no
    # cluster layout guarantees). Force the shuffled join both paths.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    hot = "the hot duplicated title xx"
    df = (
        spark.range(H + U)
        .select(
            F.col("id"),
            F.when(F.col("id") < H, F.lit(hot))
            .otherwise(
                # deterministic distinct 20-28 char background strings
                F.expr("substring(md5(CAST(id AS STRING)), 1, 20 + CAST(id % 9 AS INT))")
            )
            .alias("s"),
        )
        .repartition(32)
    )
    df.write.mode("overwrite").parquet("/tmp/editdist_skew_input")
    df = spark.read.parquet("/tmp/editdist_skew_input")

    print(f"hot copies H={H}, uniform U={U}, salt={SALT}", flush=True)

    # candidate-join partition balance (AQE coalescing off so the ids
    # reflect the raw shuffle distribution)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    for salt in (1, SALT):
        s = _normalized(df, "id", "s", 2, "probe-side")
        cs = sorted(
            r["count"]
            for r in _candidates(s, s, 2, salt)
            .groupBy(F.spark_partition_id())
            .count()
            .collect()
        )
        med = statistics.median(cs)
        print(
            f"candidate balance salt={salt:3d}: partitions={len(cs)} "
            f"median={med:,.0f} max={cs[-1]:,} ratio={cs[-1] / med:,.1f}x",
            flush=True,
        )
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")

    counts = {}
    runs = [
        ("salted", dict(salt=SALT)),
        ("unsalted", dict()),
        ("collapse+salt", dict(salt=SALT, collapse_exact=True)),
    ]
    for name, kw in runs:
        t0 = time.perf_counter()
        counts[name] = editdistance_join(df, "id", "s", 2, **kw).count()
        w = time.perf_counter() - t0
        print(
            f"end-to-end {name:13s}: pairs={counts[name]:,} "
            f"wall={w:,.1f}s",
            flush=True,
        )
    assert len(set(counts.values())) == 1, counts
    want_hot = H * (H - 1) // 2
    assert counts["unsalted"] >= want_hot, (counts, want_hot)
    print(f"pair counts identical; >= {want_hot:,} within-family pairs OK")


if __name__ == "__main__":
    main()
