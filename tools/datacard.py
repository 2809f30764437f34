"""Emit the one-row corpus data card (operators/stats.py) for a
documents table as one JSON line — the release artifact a training
set ships with.

Usage: python tools/datacard.py [sf_dir] [out.json]
Defaults: $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.01, stdout.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    from spotify_etl_aws_spark.operators.stats import corpus_stats
    from spotify_etl_aws_spark.session import get_spark
    from spotify_etl_aws_spark.sources.readers import load_table

    spark = get_spark()
    docs = load_table(spark, sf_dir, "documents")
    (row,) = corpus_stats(docs).collect()
    card = {k: (dict(v) if isinstance(v, dict) else v) for k, v in row.asDict().items()}
    card["source"] = sf_dir
    line = json.dumps(card, sort_keys=True)
    if out_path:
        with open(out_path, "w", encoding="utf-8") as f:
            f.write(line + "\n")
    print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
