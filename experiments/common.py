"""Shared harness for the amplified-scale probes: replicate a fixture
table R times with shifted ids (exact copies — the textbook true-dup
scenario) and run a Spark-vs-DuckDB comparison loop that hard-flags
any output disagreement."""

from __future__ import annotations

import os
import sys
import time
from collections.abc import Callable

import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def amplify(table: str, id_col: str, reps: int, out_root: str) -> tuple[str, int]:
    """Write (or reuse) `{table}` replicated ``reps`` times with
    ``id_col`` shifted by the source row count per replica. The cache
    key embeds the source dir name and row count so repointing
    SPARK_GRAFT_SF_DIR can never serve stale amplification; on cache
    hits only the parquet FOOTER is read (metadata row count), not the
    data."""
    src_path = os.path.join(SF_DIR, f"{table}.parquet")
    n = pq.ParquetFile(src_path).metadata.num_rows
    tag = os.path.basename(os.path.normpath(SF_DIR))
    path = f"{out_root}/{table}_{tag}_{n}_x{reps}.parquet"
    if os.path.exists(path):
        return path, n * reps
    os.makedirs(out_root, exist_ok=True)
    src = pq.read_table(src_path)
    chunks = []
    for r in range(reps):
        chunks.append(
            src.set_column(
                src.schema.get_field_index(id_col),
                id_col,
                pa.compute.add(src.column(id_col), r * n),
            )
        )
    pq.write_table(pa.concat_tables(chunks), path)
    return path, n * reps


def timed_oracle(oracle_sql: str, view: str, path: str) -> tuple[float, list]:
    """Run an oracle statement on the amplified parquet (32 threads),
    returning (wall seconds, rows)."""
    import duckdb

    con = duckdb.connect(config={"threads": "32"})
    con.execute(f"CREATE VIEW {view} AS SELECT * FROM read_parquet('{path}')")
    t0 = time.perf_counter()
    rows = con.execute(oracle_sql).fetchall()
    return time.perf_counter() - t0, rows


def compare_loop(
    table: str,
    id_col: str,
    out_root: str,
    reps_list: list[int],
    duckdb_max_reps: int,
    spark_fn: Callable[[str], tuple[float, int]],
    duckdb_fn: Callable[[str], tuple[float, int]],
) -> None:
    """Per amplification: run Spark always, DuckDB up to
    ``duckdb_max_reps`` (its exact recursive closures go super-linear),
    print one line each, and hard-flag any output mismatch."""
    mismatched = False
    for reps in reps_list:
        path, n = amplify(table, id_col, reps, out_root)
        wall, summary = spark_fn(path)
        print(f"spark  n={n:>6}: {wall:6.2f}s  non-singleton={summary}", flush=True)
        if reps <= duckdb_max_reps:
            dwall, dsummary = duckdb_fn(path)
            print(
                f"duckdb n={n:>6}: {dwall:6.2f}s  non-singleton={dsummary}",
                flush=True,
            )
            if dsummary != summary:
                print("MISMATCH between engines!", file=sys.stderr)
                mismatched = True
    if mismatched:
        # scripted runs must fail loudly on a cross-engine disagreement
        sys.exit(1)
