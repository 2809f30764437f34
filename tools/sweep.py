"""Full-inventory oracle sweep on a vanilla (driver-parity) session.

Runs every `__spark_entry__.queries()` entry against its DuckDB oracle
at one or more scale factors and prints a per-query verdict plus a
final MISMATCH/EMPTY summary. The driver only checks sf0.01 — this
catches scale-dependent fragility (rounding boundaries, vacuous
results) the driver can't see; the IEEE -0.0 zscore bug was found by
exactly this sweep at sf0.1.

Usage:
    python tools/sweep.py                 # sf0.01 (driver parity)
    python tools/sweep.py all             # sf0.001 + sf0.01 + sf0.1
    python tools/sweep.py /root/testdata/sf0.1
    python tools/sweep.py all -q vector_cosine_topk,dedup_embedding_cosine
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _cell(v):
    # pd.isna covers None, float NaN, AND pd.NaT — a null timestamp
    # arrives as None from Spark but NaT from DuckDB's datetime64
    # column; both must normalize to the same marker
    if v is None or (not isinstance(v, (str, bytes, list)) and pd.isna(v)):
        return "\\N"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (dt.datetime, pd.Timestamp)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is None and ts == ts.normalize():
            return ts.date().isoformat()
        return ts.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    return str(v)


def sweep(spark, sf_dir: str, only: set[str] | None = None) -> tuple[list, list]:
    import __spark_entry__ as E

    con = duckdb.connect(config={"threads": 32})
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):  # multi-file layout (tools/relayout.py)
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    qs, oracles = E.queries(), E.oracle_sql()
    if only is not None:
        unknown = only - qs.keys()
        if unknown:
            raise SystemExit(f"unknown query names: {sorted(unknown)}")
        qs = {k: v for k, v in qs.items() if k in only}
    bad, empty = [], []
    for name in qs:
        try:
            got = qs[name](spark, sf_dir).toPandas()
            if not len(got):
                empty.append(name)
            if name not in oracles:
                print(f"  {name}: rows={len(got)} (rows-only)", flush=True)
                continue
            want = con.sql(oracles[name]).df()
            cols = sorted(got.columns)
            g = sorted(
                tuple(_cell(v) for v in r)
                for r in got[cols].itertuples(index=False, name=None)
            )
            w = sorted(
                tuple(_cell(v) for v in r)
                for r in want[sorted(want.columns)].itertuples(index=False, name=None)
            )
            ok = cols == sorted(want.columns) and g == w and len(got) == len(want)
            print(f"  {name}: rows={len(got)}/{len(want)} ok={ok}", flush=True)
            if not ok:
                bad.append(name)
        except Exception as exc:
            bad.append(name)
            print(f"  {name}: ERROR {type(exc).__name__}: {str(exc)[:150]}", flush=True)
    return bad, empty


def main() -> None:
    from pyspark.sql import SparkSession

    argv = sys.argv[1:]
    only = None
    if "-q" in argv:
        i = argv.index("-q")
        only = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2 :]
    arg = argv[0] if argv else "/root/testdata/sf0.01"
    dirs = (
        ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
        if arg == "all"
        else [arg]
    )
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # plain JVM sizing, not a SQL-semantics conf: the 1g default heap
        # OOMs on amplified-scale sweeps (full toPandas materialization);
        # driver-parity is about leaving query semantics configs alone
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_SWEEP_MEM", "16g"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    failures = 0
    for d in dirs:
        print(f"== {d}", flush=True)
        bad, empty = sweep(spark, d, only)
        print(f"== {d}: MISMATCH={bad} EMPTY={empty}", flush=True)
        failures += len(bad)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
