"""q5 at 100× amplification: plain li-rooted plan vs the co-bucketed
serial posture (the round-5 verdict's last perf-weak query).

BASELINE.md round 5 measured q5 WIDENING with scale (7.1× at sf0.1 →
11.6× at 100×) because the 60M-row fact stream shuffles twice more
after the orderkey join (o_custkey, then the compound supplier key)
while single-node DuckDB probes four shared-memory hash tables. The
fix is layout, not plan surgery: bucket lineitem on l_orderkey and
orders+customer on custkey (``save_bucketed``), then run
``q5_snowflake_cobucketed`` — orders⋈customer joins with zero
exchange, lineitem's bucketing absorbs the fact side of the orderkey
join, supplier/nation/region broadcast, and the only data-sized
exchange left is the (4× smaller) orders⋈customer result re-keyed to
orderkey.

Prereq: tools/amplify_all.py /root/testdata/sf0.1 /tmp/sf10-amp 100 32
Run:    python experiments/q5_bucketed.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AMP_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10-amp"
WAREHOUSE = "/tmp/q5_bucketed_wh"
BUCKETS = 32
RUNS = 3


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def best_of(fn, runs: int = RUNS) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    shutil.rmtree(WAREHOUSE, ignore_errors=True)
    from spotify_etl_aws_spark.session import get_spark
    from spotify_etl_aws_spark.sources.readers import load_table
    from spotify_etl_aws_spark.sources.sinks import save_bucketed
    from spotify_etl_aws_spark.queries.relational import (
        ORACLE_Q5,
        q5_regional_revenue,
        q5_snowflake_cobucketed,
    )

    spark = get_spark(
        app_name="q5-bucketed",
        extra_conf={"spark.sql.warehouse.dir": WAREHOUSE},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # --- plain plan (reproduces the BASELINE 100x number) -----------
    materialize(q5_regional_revenue(spark, AMP_DIR))  # warm
    t_plain = best_of(lambda: materialize(q5_regional_revenue(spark, AMP_DIR)))
    print(f"plain q5           : {t_plain:6.2f}s", flush=True)

    # --- one-time layout (amortized over every custkey/orderkey join)
    t0 = time.perf_counter()
    save_bucketed(
        load_table(spark, AMP_DIR, "lineitem"), "q5_li", BUCKETS,
        ["l_orderkey"], ["l_orderkey"], one_file_per_bucket=True,
    )
    save_bucketed(
        load_table(spark, AMP_DIR, "orders"), "q5_o", BUCKETS,
        ["o_custkey"], ["o_custkey"], one_file_per_bucket=True,
    )
    save_bucketed(
        load_table(spark, AMP_DIR, "customer"), "q5_c", BUCKETS,
        ["c_custkey"], ["c_custkey"], one_file_per_bucket=True,
    )
    t_layout = time.perf_counter() - t0
    print(f"layout (one-time)  : {t_layout:6.2f}s", flush=True)

    def bucketed():
        materialize(
            q5_snowflake_cobucketed(
                spark.table("q5_li"),
                spark.table("q5_o"),
                spark.table("q5_c"),
                load_table(spark, AMP_DIR, "supplier"),
                load_table(spark, AMP_DIR, "nation"),
                load_table(spark, AMP_DIR, "region"),
            )
        )

    bucketed()  # warm
    t_buck = best_of(bucketed)
    print(f"co-bucketed q5     : {t_buck:6.2f}s", flush=True)

    # cross-check: identical result rows
    got = sorted(
        map(
            tuple,
            q5_snowflake_cobucketed(
                spark.table("q5_li"),
                spark.table("q5_o"),
                spark.table("q5_c"),
                load_table(spark, AMP_DIR, "supplier"),
                load_table(spark, AMP_DIR, "nation"),
                load_table(spark, AMP_DIR, "region"),
            ).collect(),
        )
    )
    want = sorted(map(tuple, q5_regional_revenue(spark, AMP_DIR).collect()))
    if got != want:
        print("MISMATCH between plain and co-bucketed q5!", file=sys.stderr)
        sys.exit(1)
    print(f"parity             : OK ({len(got)} rows)", flush=True)

    # --- DuckDB same files ------------------------------------------
    import duckdb

    con = duckdb.connect(config={"threads": "32"})
    for t in ["customer", "orders", "lineitem", "supplier", "nation", "region"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{AMP_DIR}/{t}.parquet/*.parquet')"
        )
    con.execute(ORACLE_Q5).fetchall()  # warm
    t_duck = best_of(lambda: con.execute(ORACLE_Q5).fetchall())
    print(f"duckdb q5          : {t_duck:6.2f}s", flush=True)
    print(
        f"ratios: plain {t_plain / t_duck:.2f}x  "
        f"co-bucketed {t_buck / t_duck:.2f}x",
        flush=True,
    )


if __name__ == "__main__":
    main()
