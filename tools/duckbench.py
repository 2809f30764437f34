"""DuckDB twin of bench.py: times the HEADLINE queries' oracle SQL on
the same parquet (32 threads, warm-up + best of N) and prints ONE JSON
line in the same shape, so the Spark-vs-DuckDB ratio in BASELINE.md is
reproducible instead of hand-measured.

bench.py also calls ``run_duckbench`` directly after its Spark loop,
so every emitted bench artifact carries its own same-session DuckDB
denominator (round-5 lesson: a cross-session driver-file comparison
confused host-load variance for a regression — the denominator must
ride in the same artifact, same box, same minute).

Queries with no oracle (or non-SQL surfaces) are skipped with a null.

Run: python tools/duckbench.py
(SPARK_GRAFT_BENCH_ONLY=a,b,c restricts to a subset — e.g. to finish a
tail after one query exceeds a timeout at amplified scale.)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bench import HEADLINE, RUNS

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connect(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    """32-thread connection with the fixture views registered —
    exposed so bench.py can INTERLEAVE per-query DuckDB timings with
    the Spark timings (round-10 verdict item 2: phase-ordered
    measurement lets a host-noise burst hit one engine's whole phase
    and masquerade as a ratio move)."""
    con = duckdb.connect(config={"threads": 32})
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):  # multi-file layout (tools/relayout.py)
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def duck_time_one(con, sql: str, runs: int = RUNS) -> float:
    """Warm once + best of ``runs`` for one oracle SQL string."""
    con.execute(sql).fetchall()  # warm
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def run_duckbench(
    sf_dir: str, names: list[str], runs: int = RUNS
) -> dict[str, float | None]:
    """Time each named query's oracle SQL on ``sf_dir`` (32 threads,
    one warm run + best of ``runs``). Returns name -> seconds, or None
    for queries with no SQL oracle."""
    import __spark_entry__ as E

    oracles = E.oracle_sql()
    con = duck_connect(sf_dir)
    timings: dict[str, float | None] = {}
    for name in names:
        sql = oracles.get(name)
        if sql is None:
            timings[name] = None
            continue
        timings[name] = duck_time_one(con, sql, runs)
        print(f"  duckdb {name}: {timings[name]}s", file=sys.stderr)
    con.close()
    return timings


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    names = only.split(",") if only else HEADLINE
    unknown = set(names) - set(HEADLINE)
    if unknown:  # a typo must not masquerade as a valid null-skip
        raise SystemExit(f"unknown headline names: {sorted(unknown)}")
    timings = run_duckbench(sf_dir, names)

    total = round(sum(v for v in timings.values() if v is not None), 3)
    print(
        json.dumps(
            {
                "metric": "duckdb_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "runs_per_query": RUNS,
            }
        )
    )


if __name__ == "__main__":
    main()
