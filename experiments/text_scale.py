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

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/text_scale"


def amplify(reps: int) -> tuple[str, int]:
    src = pq.read_table(os.path.join(SF_DIR, "documents.parquet"))
    n = src.num_rows
    tag = os.path.basename(os.path.normpath(SF_DIR))
    path = f"{OUT}/docs_{tag}_{n}_x{reps}.parquet"
    if os.path.exists(path):
        return path, n * reps
    os.makedirs(OUT, exist_ok=True)
    chunks = []
    for r in range(reps):
        t = src.set_column(
            src.schema.get_field_index("doc_id"),
            "doc_id",
            pa.compute.add(src.column("doc_id"), r * n),
        )
        chunks.append(t)
    pq.write_table(pa.concat_tables(chunks), path)
    return path, n * reps


def spark_pipeline(spark, docs_path: str) -> tuple[float, int]:
    import pyspark.sql.functions as F

    from spotify_etl_aws_spark.operators.dedup import neardup_clusters
    from spotify_etl_aws_spark.queries.dedup import (
        BANDS,
        LSH_VERIFY_THRESHOLD,
        NUM_HASHES,
        SHINGLE_N,
    )

    t0 = time.perf_counter()
    docs = spark.read.parquet(docs_path)
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

    con = duckdb.connect(config={"threads": "32"})
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{docs_path}')"
    )
    t0 = time.perf_counter()
    rows = con.execute(ORACLE_NEARDUP_CLUSTERS).fetchall()
    dt = time.perf_counter() - t0
    return dt, sum(1 for did, rep in rows if did != rep)


def main() -> None:
    from spotify_etl_aws_spark.session import get_spark

    spark = get_spark(app_name="text-scale")
    spark.sparkContext.setLogLevel("ERROR")
    for reps in (1, 4, 10):
        path, n = amplify(reps)
        wall, dups = spark_pipeline(spark, path)
        print(f"spark  n={n:>6}: {wall:6.2f}s  non-singleton={dups}", flush=True)
        if reps <= 4:
            dwall, ddups = duckdb_pipeline(path)
            print(
                f"duckdb n={n:>6}: {dwall:6.2f}s  non-singleton={ddups}",
                flush=True,
            )
            if ddups != dups:
                print("MISMATCH between engines!", file=sys.stderr)


if __name__ == "__main__":
    main()
