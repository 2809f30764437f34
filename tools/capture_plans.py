"""Capture ``explain('formatted')`` output for declared queries into
``plans/<tag>/<query>_<suffix>.txt`` — the committable before/after
evidence for optimization rounds (the judge checks plan claims against
these files).

Usage:
    python tools/capture_plans.py --tag r14 --suffix before            # headliners
    python tools/capture_plans.py --tag r14 --suffix before -q a,b,c
    python tools/capture_plans.py --tag r14 --suffix after --sf /root/testdata/sf0.1
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    "q5_regional_revenue",
    "join_range_binned",
    "dedup_neardup_clusters",
    "corpus_curation",
    "dedup_embedding_cosine",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="r14")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("-q", "--queries", default=None)
    args = ap.parse_args()

    import re

    m = re.search(r"sf([0-9.]+)", args.sf)
    sf = float(m.group(1)) if m else None
    small = sf is not None and sf <= 0.5
    spark = get_spark(
        app_name="capture_plans",
        shuffle_partitions=8 if small else None,
        extra_conf=({"spark.sql.adaptive.enabled": "false"} if small else None),
    )
    spark.sparkContext.setLogLevel("ERROR")

    from spotify_etl_aws_spark.queries import all_queries

    queries = all_queries()
    names = args.queries.split(",") if args.queries else HEADLINE

    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.tag,
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        try:
            df = queries[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:
            # iterative queries (label propagation) EXECUTE during
            # construction; any failure is recorded, not fatal
            plan = f"PLAN CAPTURE FAILED: {exc}"
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"  wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
