"""Same-session interleaved A/B harness (r15 measurement policy).

Cross-session wall-clock on this box swings ±50%+ (JIT, GC, host
noise), so every optimization claim is backed by a SAME-SESSION
interleaved A/B: warm each variant once, then alternate variants
rep-by-rep and compare MEDIANS. Import `ab` from an experiment script,
or use the CLI to A/B two git revisions of a declared query:

    python tools/ab.py -q dedup_embedding_cosine --reps 5
        (single-variant timing: current tree only)
"""

from __future__ import annotations

import statistics
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def ab(
    spark: SparkSession,
    variants: dict[str, Callable[[], DataFrame]],
    reps: int = 5,
    warm: int = 1,
) -> dict[str, list[float]]:
    sc = spark.sparkContext
    times: dict[str, list[float]] = {k: [] for k in variants}
    for k, fn in variants.items():
        for _ in range(warm):
            sc.setJobDescription(f"ab-warm:{k}")
            fn().write.format("noop").mode("overwrite").save()
    for r in range(reps):
        for k, fn in variants.items():
            sc._jvm.System.gc()
            sc.setJobDescription(f"ab:{k}:{r}")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            times[k].append(time.perf_counter() - t0)
    sc.setJobDescription(None)
    for k, v in times.items():
        print(
            f"  {k}: median {statistics.median(v):.3f}s "
            f"reps {[round(x, 3) for x in v]}",
            flush=True,
        )
    return times


def main() -> None:
    import argparse
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from spotify_etl_aws_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("-q", "--queries", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    spark = get_spark(
        app_name="ab_r15",
        shuffle_partitions=8,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from spotify_etl_aws_spark.queries import all_queries

    qs = all_queries()
    variants = {
        name: (lambda n=name: qs[n](spark, args.sf))
        for name in args.queries.split(",")
    }
    ab(spark, variants, reps=args.reps)


if __name__ == "__main__":
    main()
