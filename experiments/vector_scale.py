"""Amplified-scale probe for the embedding near-dup pipeline.

Replicates the sf0.1 embeddings table R times (exact copies with
shifted vec_ids — the textbook near-dup scenario: every vector gains
R-1 true duplicates) and times the full pipeline
(quantizer fit -> blocked Arrow GEMM pair kernel -> connected
components) at 2k / 20k / 100k vectors, plus DuckDB running the
equivalent SQL on the same amplified parquet up to 20k (its exact
recursive transitive closure goes super-linear in clique size).
Results recorded in BASELINE.md.

Run: python experiments/vector_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.common import compare_loop, timed_oracle

OUT = "/tmp/vector_scale"


def spark_pipeline(emb_path: str) -> tuple[float, int]:
    """End-to-end: fit + pairs + CC on the amplified table, via the
    SAME code paths as the declared query (the fit is the shared
    _fit_centroids helper and the CC bound is the operator default, so
    the experiment cannot desynchronize from dedup_embedding_cosine)."""
    import pyspark.sql.functions as F

    from spotify_etl_aws_spark.functions.vectors import as_double
    from spotify_etl_aws_spark.operators.dedup import label_propagation
    from spotify_etl_aws_spark.operators.vector_ops import (
        assign_cells_arrow,
        cell_cosine_pairs_arrow,
    )
    from spotify_etl_aws_spark.queries import vector as V

    t0 = time.perf_counter()
    emb = (
        _SPARK.read.parquet(emb_path)
        .select("vec_id", as_double("embedding").alias("v"))
    )
    cents = V._fit_centroids(emb)
    pairs = cell_cosine_pairs_arrow(
        assign_cells_arrow(emb, cents), V.EMB_DUP_THRESHOLD
    )
    nodes = emb.select(F.col("vec_id").alias("node"))
    labels = label_propagation(pairs, nodes)
    n_dups = labels.filter(F.col("node") != F.col("label")).count()
    return time.perf_counter() - t0, n_dups


def duckdb_pipeline(emb_path: str) -> tuple[float, int]:
    from spotify_etl_aws_spark.queries.vector import ORACLE_EMB_DEDUP

    dt, rows = timed_oracle(ORACLE_EMB_DEDUP, "embeddings", emb_path)
    return dt, sum(1 for vid, rep in rows if vid != rep)


def main() -> None:
    from spotify_etl_aws_spark.session import get_spark

    global _SPARK
    _SPARK = get_spark(app_name="vector-scale")
    _SPARK.sparkContext.setLogLevel("ERROR")
    compare_loop(
        "embeddings",
        "vec_id",
        OUT,
        reps_list=[1, 10, 50],
        duckdb_max_reps=10,
        spark_fn=spark_pipeline,
        duckdb_fn=duckdb_pipeline,
    )


if __name__ == "__main__":
    main()
