"""Scale probe for the frequency-sketch lane: heavy-hitter detection
over a HIGH-CARDINALITY key space (the regime the sketches exist for
— replica-amplifying the documents fixture would not grow its
vocabulary, so the key stream is synthesized: ~60% of rows spread over
~tens of millions of distinct tail keys via xxhash, 40% concentrated
on four planted hot keys).

Compares, at increasing row counts:
- exact groupBy top-k (shuffles the full key space),
- Misra–Gries top-k (capacity 4096; survivor-sized shuffle,
  undercount certificate),
- count-min sketch build + hot-key point estimates (depth 4 x 8192
  cells regardless of cardinality).

Checks, not just timings: MG must surface all four planted hot keys
with certificate-consistent counts, and CM estimates must upper-bound
the exact hot counts. Results go to BASELINE.md.

Run: python experiments/sketch_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

HOT = ["hot_a", "hot_b", "hot_c", "hot_d"]
CAPACITY = 4096
K = 20


def keyed(spark, n_rows: int):
    """~40% of rows on the four hot keys, the rest on a tail whose
    cardinality is ~n_rows/2 (deterministic xxhash spread)."""
    base = spark.range(n_rows)
    hot_idx = F.pmod(F.xxhash64(F.lit("pick"), "id"), F.lit(10))
    tail = F.concat(
        F.lit("t"),
        F.pmod(F.xxhash64(F.lit("tail"), "id"), F.lit(n_rows // 2)),
    )
    key = (
        F.when(hot_idx == 0, HOT[0])
        .when(hot_idx == 1, HOT[1])
        .when(hot_idx == 2, HOT[2])
        .when(hot_idx == 3, HOT[3])
        .otherwise(tail)
    )
    return base.select(key.alias("term"))


def main() -> None:
    from spotify_etl_aws_spark.operators.sketches import (
        cm_estimate,
        count_min_sketch,
        misra_gries_topk,
    )
    from spotify_etl_aws_spark.session import get_spark

    spark = get_spark(app_name="sketch-scale")
    spark.sparkContext.setLogLevel("ERROR")
    for n in (3_000_000, 30_000_000):
        df = keyed(spark, n)

        t0 = time.perf_counter()
        exact = (
            df.groupBy("term")
            .agg(F.count("*").alias("cnt"))
            .orderBy(F.desc("cnt"), "term")
            .limit(K)
            .collect()
        )
        t_exact = time.perf_counter() - t0
        exact_hot = {r["term"]: r["cnt"] for r in exact if r["term"] in HOT}

        t0 = time.perf_counter()
        mg = misra_gries_topk(df, "term", k=K, capacity=CAPACITY).collect()
        t_mg = time.perf_counter() - t0
        mg_hot = {r["term"]: r["cnt"] for r in mg if r["term"] in HOT}
        bound = mg[0]["max_undercount"] if mg else 0
        assert set(mg_hot) == set(HOT), f"MG missed hot keys: {mg_hot}"
        for h, cnt in mg_hot.items():
            assert cnt <= exact_hot[h] <= cnt + bound, (h, cnt, bound)

        t0 = time.perf_counter()
        sketch = count_min_sketch(df, "term")
        keys = spark.createDataFrame([(h,) for h in HOT], "term string")
        est = {
            r["term"]: r["est"]
            for r in cm_estimate(sketch, keys, "term").collect()
        }
        t_cm = time.perf_counter() - t0
        for h in HOT:
            assert est[h] >= exact_hot[h], (h, est[h], exact_hot[h])

        print(
            f"n={n:>9,}: exact {t_exact:6.2f}s | mg {t_mg:6.2f}s "
            f"(certificate {bound}) | cm {t_cm:6.2f}s | "
            f"hot counts ok on all three paths",
            flush=True,
        )


if __name__ == "__main__":
    main()
