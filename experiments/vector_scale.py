"""Amplified-scale probe for the embedding near-dup pipeline.

Replicates the sf0.1 embeddings table R times (exact copies with
shifted vec_ids — the textbook near-dup scenario: every vector gains
R-1 true duplicates) and times the full pipeline
(quantizer fit -> Arrow GEMM pair kernel -> connected components) at
2k / 20k / 100k vectors, plus DuckDB running the equivalent SQL on the
same amplified parquet at 20k. Results recorded in BASELINE.md.

Run: python experiments/vector_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/vector_scale"


def amplify(reps: int) -> tuple[str, int]:
    src = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"))
    n = src.num_rows
    # cache key includes the source dir name and row count so pointing
    # SPARK_GRAFT_SF_DIR elsewhere can never serve stale amplification
    tag = os.path.basename(os.path.normpath(SF_DIR))
    path = f"{OUT}/emb_{tag}_{n}_x{reps}.parquet"
    if os.path.exists(path):
        return path, n * reps
    os.makedirs(OUT, exist_ok=True)
    chunks = []
    for r in range(reps):
        t = src.set_column(
            src.schema.get_field_index("vec_id"),
            "vec_id",
            pa.compute.add(src.column("vec_id"), r * n),
        )
        chunks.append(t)
    pq.write_table(pa.concat_tables(chunks), path)
    return path, n * reps


def spark_pipeline(spark, emb_path: str) -> tuple[float, int]:
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
        spark.read.parquet(emb_path)
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

    con = duckdb.connect(config={"threads": "32"})
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{emb_path}')"
    )
    t0 = time.perf_counter()
    rows = con.execute(ORACLE_EMB_DEDUP).fetchall()
    dt = time.perf_counter() - t0
    return dt, sum(1 for vid, rep in rows if vid != rep)


def main() -> None:
    from spotify_etl_aws_spark.session import get_spark

    spark = get_spark(app_name="vector-scale")
    spark.sparkContext.setLogLevel("ERROR")
    for reps in (1, 10, 50):
        path, n = amplify(reps)
        wall, dups = spark_pipeline(spark, path)
        print(f"spark  n={n:>6}: {wall:6.2f}s  non-singleton={dups}", flush=True)
        if reps <= 10:
            dwall, ddups = duckdb_pipeline(path)
            print(
                f"duckdb n={n:>6}: {dwall:6.2f}s  non-singleton={ddups}",
                flush=True,
            )
            if ddups != dups:
                print("MISMATCH between engines!", file=sys.stderr)


if __name__ == "__main__":
    main()
