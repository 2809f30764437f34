"""Scale probe for the DTW top-k lane (`operators/dtw.py`): Spark
(one Arrow batch per candidate series, exact int DP inside the task)
vs the DuckDB recursive-CTE twin (one DP row per recursion level for
EVERY candidate simultaneously) at 1× and 10× user counts.

Top-k results are asserted identical in-run. The shapes differ
fundamentally: Spark's cost is (users) independent tiny tasks — the
dispatch floor amortizes across the fan-out; the single-box twin
materializes users × (m+1) rows per recursion level for max(n)
levels, so its working set grows with the candidate count while
Spark's per-task memory stays O(n·m) regardless of fleet size.

Run: python experiments/dtw_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIRS = [
    ("sf0.1 (1x)", "/root/testdata/sf0.1"),
    ("10x", "/tmp/sf1-amp"),
]


def main() -> None:
    import duckdb

    from spotify_etl_aws_spark.queries.selection import (
        ORACLE_DTW,
        ts_dtw_topk_similarity,
    )
    from spotify_etl_aws_spark.session import get_spark

    spark = get_spark(app_name="dtw-scale")
    spark.sparkContext.setLogLevel("ERROR")

    for label, d in DIRS:
        if not os.path.isdir(d):
            print(f"{label}: fixture missing, skipped", flush=True)
            continue
        t0 = time.perf_counter()
        got = [
            (r.user_id, r.dtw_dist)
            for r in ts_dtw_topk_similarity(spark, d).collect()
        ]
        t_spark = time.perf_counter() - t0

        con = duckdb.connect(config={"threads": "32"})
        ev = f"{d}/events.parquet"
        src = f"'{ev}/*.parquet'" if os.path.isdir(ev) else f"'{ev}'"
        con.execute(f"CREATE VIEW events AS SELECT * FROM {src}")
        t0 = time.perf_counter()
        want = con.execute(ORACLE_DTW).fetchall()
        t_duck = time.perf_counter() - t0
        con.close()

        assert sorted(got) == sorted(want), (label, got[:3], want[:3])
        print(
            f"{label:12s}: spark {t_spark:6.2f}s  duckdb {t_duck:6.2f}s  "
            f"ratio {t_spark / t_duck:4.2f}x  (top-k identical)",
            flush=True,
        )


if __name__ == "__main__":
    main()
