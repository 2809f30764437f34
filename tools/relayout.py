"""Re-lay a testdata SF dir as a multi-file parquet layout.

The driver fixture writes each table as ONE parquet file with ONE row
group, so every Spark scan is one task on one core while DuckDB
parallelizes inside the row group across threads — a storage-layout
artifact, not a plan property (BASELINE.md "Measured"). A 100 TB lake
is the opposite posture: thousands of files/row-groups per table and
scan parallelism to match. This tool writes the same rows as N part
files per table (schema- and order-preserving, round-robin by row
block) into `<out>/<table>.parquet/part-*.parquet`, so both engines
can be benched on the cluster-like layout too:

    python tools/relayout.py /root/testdata/sf0.1 /tmp/sf0.1-32f 32
    SPARK_GRAFT_SF_DIR=/tmp/sf0.1-32f python bench.py
    SPARK_GRAFT_SF_DIR=/tmp/sf0.1-32f python tools/duckbench.py

Small dims stay single-file (splitting 5 rows over 32 files only adds
open() overhead on both sides).
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# below this many rows a table is copied as a single part file
MIN_ROWS_TO_SPLIT = 10_000


def relayout(src_dir: str, out_dir: str, n_files: int) -> None:
    for t in TABLES:
        src = os.path.join(src_dir, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        os.makedirs(dst, exist_ok=True)
        tbl = pq.read_table(src)
        n = tbl.num_rows
        parts = 1 if n < MIN_ROWS_TO_SPLIT else n_files
        step = -(-n // parts)
        for i in range(parts):
            chunk = tbl.slice(i * step, step)
            if chunk.num_rows == 0:
                break
            pq.write_table(chunk, os.path.join(dst, f"part-{i:05d}.parquet"))
        print(f"{t}: {n} rows -> {parts} file(s)", flush=True)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf0.1-32f"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    relayout(src, out, n)


if __name__ == "__main__":
    main()
