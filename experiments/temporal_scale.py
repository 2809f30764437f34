"""Scale probe for the round-7 late-session operator families
(temporal joins/windows, SCD/CDC, packing, NB classification,
weighted sampling, embedding LSH): each declared query run
Spark-vs-DuckDB at sf0.1 and on the 10× FK-consistent amplified
corpus (/tmp/sf1-amp from tools/amplify_all.py), wall seconds plus a
hard row-count parity check (values are hash-verified separately by
tools/sweep.py — this script measures).

Spark runs use the bench.py posture: vanilla session, noop-format
write (full executor materialization, nothing collected), best of
RUNS warm runs so one-time codegen JIT doesn't dominate. Results go
to BASELINE.md.

Run: python experiments/temporal_scale.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

QUERIES = [
    "join_interval_overlap",
    "window_time_range_agg",
    "agg_session_window",
    "dim_scd2_history",
    "cdc_latest_snapshot",
    "order_pack_sequences",
    "text_nb_lang_classifier",
    "sample_weighted_docs",
    "dedup_embedding_lsh_pairs",
]
RUNS = 2
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main(dirs: list[str]) -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "32g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    qs, os_ = E.queries(), E.oracle_sql()
    failed = False
    for d in dirs:
        con = duckdb.connect(config={"threads": 32})
        for t in TABLES:
            p = f"{d}/{t}.parquet"
            if os.path.isdir(p):
                p = f"{p}/*.parquet"
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
        print(f"== {d}", flush=True)
        for name in QUERIES:
            best = float("inf")
            for _ in range(RUNS):
                df = qs[name](spark, d)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            n_spark = qs[name](spark, d).count()
            t0 = time.perf_counter()
            rows = con.execute(os_[name]).fetchall()
            d_wall = time.perf_counter() - t0
            ok = len(rows) == n_spark
            failed |= not ok
            print(
                f"  {name:28s} spark {best:6.2f}s  duckdb {d_wall:6.2f}s"
                f"  rows {n_spark} {'OK' if ok else 'MISMATCH ' + str(len(rows))}",
                flush=True,
            )
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    args = sys.argv[1:] or [
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        "/tmp/sf1-amp",
    ]
    main(args)
