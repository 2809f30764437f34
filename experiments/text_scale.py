"""Amplified-scale probe for the TEXT near-dup pipeline (the sibling of
vector_scale.py): replicates sf0.1's documents table R times (exact
copies, shifted doc_ids — every document gains R-1 true duplicates) and
times MinHash -> banded LSH -> Jaccard verify -> connected components
on both engines, via the SAME operator (neardup_clusters) and the SAME
oracle SQL (ORACLE_NEARDUP_CLUSTERS) as the declared
dedup_neardup_clusters query. Results recorded in BASELINE.md.

Run: python experiments/text_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.common import compare_loop, timed_oracle

OUT = "/tmp/text_scale"


def spark_pipeline(docs_path: str) -> tuple[float, int]:
    import pyspark.sql.functions as F

    from spotify_etl_aws_spark.operators.dedup import neardup_clusters
    from spotify_etl_aws_spark.queries.dedup import (
        BANDS,
        LSH_VERIFY_THRESHOLD,
        NUM_HASHES,
        SHINGLE_N,
    )

    t0 = time.perf_counter()
    docs = _SPARK.read.parquet(docs_path)
    labels = neardup_clusters(
        docs,
        num_hashes=NUM_HASHES,
        bands=BANDS,
        shingle_n=SHINGLE_N,
        threshold=LSH_VERIFY_THRESHOLD,
    )
    n_dups = labels.filter(F.col("doc_id") != F.col("cluster_rep")).count()
    return time.perf_counter() - t0, n_dups


def duckdb_pipeline(docs_path: str) -> tuple[float, int]:
    from spotify_etl_aws_spark.queries.dedup import ORACLE_NEARDUP_CLUSTERS

    dt, rows = timed_oracle(ORACLE_NEARDUP_CLUSTERS, "documents", docs_path)
    return dt, sum(1 for did, rep in rows if did != rep)


def main() -> None:
    from spotify_etl_aws_spark.session import get_spark

    global _SPARK
    _SPARK = get_spark(app_name="text-scale")
    _SPARK.sparkContext.setLogLevel("ERROR")
    compare_loop(
        "documents",
        "doc_id",
        OUT,
        reps_list=[1, 4, 10],
        duckdb_max_reps=4,
        spark_fn=spark_pipeline,
        duckdb_fn=duckdb_pipeline,
    )


if __name__ == "__main__":
    main()
