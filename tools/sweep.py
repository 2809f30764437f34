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
    python tools/sweep.py all --manifest SWEEP_r09.json

--manifest writes the sweep as a committable artifact (round-8 verdict
item 6): per (sf_dir, query) the row counts, schema/value verdict, and
a sha256 over the canonical sorted cell tuples of BOTH engines — so
"the out-of-window 93 were verified" is a checkable file, not a ledger
sentence.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import json
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


def _digest(cols, rows) -> str:
    h = hashlib.sha256()
    h.update("\x01".join(cols).encode())
    for r in rows:
        h.update(b"\x02")
        h.update("\x01".join(r).encode())
    return h.hexdigest()


def sweep(
    spark,
    sf_dir: str,
    only: set[str] | None = None,
    manifest: dict | None = None,
) -> tuple[list, list]:
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
    rec = {} if manifest is None else manifest.setdefault(sf_dir, {})
    for name in qs:
        try:
            got = qs[name](spark, sf_dir).toPandas()
            if not len(got):
                empty.append(name)
            cols = sorted(got.columns)
            g = sorted(
                tuple(_cell(v) for v in r)
                for r in got[cols].itertuples(index=False, name=None)
            )
            if name not in oracles:
                rec[name] = {
                    "rows": len(got),
                    "check": "rows-only",
                    "spark_hash": _digest(cols, g),
                }
                print(f"  {name}: rows={len(got)} (rows-only)", flush=True)
                continue
            want = con.sql(oracles[name]).df()
            w = sorted(
                tuple(_cell(v) for v in r)
                for r in want[sorted(want.columns)].itertuples(index=False, name=None)
            )
            ok = cols == sorted(want.columns) and g == w and len(got) == len(want)
            rec[name] = {
                "rows": len(got),
                "oracle_rows": len(want),
                "ok": ok,
                "spark_hash": _digest(cols, g),
                "oracle_hash": _digest(sorted(want.columns), w),
            }
            print(f"  {name}: rows={len(got)}/{len(want)} ok={ok}", flush=True)
            if not ok:
                bad.append(name)
        except Exception as exc:
            bad.append(name)
            rec[name] = {"ok": False, "err": f"{type(exc).__name__}: {str(exc)[:200]}"}
            print(f"  {name}: ERROR {type(exc).__name__}: {str(exc)[:150]}", flush=True)
    return bad, empty


def main() -> None:
    from pyspark.sql import SparkSession

    argv = sys.argv[1:]
    only = None
    manifest_path = None
    if "-q" in argv:
        i = argv.index("-q")
        only = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2 :]
    if "--manifest" in argv:
        i = argv.index("--manifest")
        manifest_path = argv[i + 1]
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
    results: dict = {}
    for d in dirs:
        print(f"== {d}", flush=True)
        bad, empty = sweep(spark, d, only, manifest=results)
        print(f"== {d}: MISMATCH={bad} EMPTY={empty}", flush=True)
        failures += len(bad)
    if manifest_path:
        doc = {
            "generated_by": "tools/sweep.py --manifest",
            "generated_at": dt.datetime.now(dt.timezone.utc).isoformat(
                timespec="seconds"
            ),
            "sf_dirs": dirs,
            "queries_swept": sorted(
                {q for per_sf in results.values() for q in per_sf}
            ),
            "mismatches": failures,
            "results": results,
        }
        with open(manifest_path, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"manifest written: {manifest_path}", flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
