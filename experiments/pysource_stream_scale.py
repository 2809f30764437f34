"""Custom Python STREAMING source: Simple (driver-side) vs
partition-planned (executor-side) reader throughput.

The Simple reader (`_PagesStreamReader`) reads every row on the DRIVER
— one fragment per micro-batch, rows crossing as pickled Python
objects. The partition-planned reader (`_PagesDistStreamReader`) fans
each batch out to one task per (fragment, row-group) with executor-side
pyarrow reads yielding Arrow batches. This probe stages the documents
table as N fragments and drains the SAME feed through both, measuring
wall seconds and rows/s — the number that justifies "implement
`streamReader` for high-throughput connectors" in the module
docstring.

Run: python experiments/pysource_stream_scale.py [sf_dir] [n_fragments]
"""

from __future__ import annotations

import ast
import glob
import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1-amp"
N_FRAGMENTS = int(sys.argv[2]) if len(sys.argv) > 2 else 16


def parse_offset(s: str) -> dict:
    try:
        return json.loads(s)
    except json.JSONDecodeError:
        return ast.literal_eval(s)


def drain(spark, fmt: str, path: str, n_files: int) -> tuple[float, int]:
    from pyspark.sql import functions as F

    agg = (
        spark.readStream.format(fmt)
        .load(path)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars"))
    )
    name = f"probe_{uuid.uuid4().hex[:8]}"
    t0 = time.perf_counter()
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix=f"ckpt_{fmt}_"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.monotonic() + 1200
        while time.monotonic() < deadline:
            p = q.lastProgress
            if p and p["sources"]:
                end = parse_offset(p["sources"][0]["endOffset"] or "{}")
                if end.get("i", -1) >= n_files and p["numInputRows"] == 0:
                    break
            time.sleep(0.1)
        else:
            raise TimeoutError(f"{fmt} never drained")
        wall = time.perf_counter() - t0
        n = spark.table(name).agg(F.sum("n")).collect()[0][0]
        return wall, int(n)
    finally:
        q.stop()
        q.awaitTermination(60)


def main() -> None:
    from spotify_etl_aws_spark.session import get_spark
    from spotify_etl_aws_spark.sources.pysource import register
    from spotify_etl_aws_spark.sources.readers import load_table

    spark = get_spark(app_name="pysource-stream-scale")
    spark.sparkContext.setLogLevel("ERROR")
    register(spark)

    staged = tempfile.mkdtemp(prefix="pysource_scale_")
    docs = load_table(spark, SF_DIR, "documents")
    docs.repartition(N_FRAGMENTS).write.mode("overwrite").parquet(staged)
    # drop non-parquet markers from the glob's view (source lists *.parquet)
    n_files = len(glob.glob(os.path.join(staged, "*.parquet")))
    n_rows = docs.count()
    print(f"staged {n_rows} rows as {n_files} fragments", flush=True)

    try:
        for fmt in ("parquet_pages_dist", "parquet_pages"):
            wall, n = drain(spark, fmt, staged, n_files)
            assert n == n_rows, (fmt, n, n_rows)
            print(
                f"{fmt:20s}: {wall:6.2f}s  {n_rows / wall:,.0f} rows/s",
                flush=True,
            )
    finally:
        shutil.rmtree(staged, ignore_errors=True)


if __name__ == "__main__":
    main()
