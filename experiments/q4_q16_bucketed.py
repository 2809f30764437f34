"""q4 + q16 at 100× amplification: plain verbatim-SQL plan vs the
co-bucketed posture (the round-7 verdict's two unbent TPC-H lanes).

BASELINE.md's "three decades" table shows q4 at 10.5× and q16 at 8.6×
DuckDB at 100× — neither plan has a scale-killer (semi-join and
anti-join respectively, pinned), the cost is the unbucketed
lineitem⋈orders / part⋈lineitem exchange plus the dispatch floor. The
q5 treatment applies verbatim: pay the shuffle ONCE at layout time
(``save_bucketed``), then the fact join needs zero data-sized
exchange.

Layouts probed:
- q4: lineitem bucketed on l_orderkey (REUSES q5's layout — one
  warehouse serves both), orders bucketed on o_orderkey;
- q16: lineitem bucketed on l_partkey, part on p_partkey.

Prereq: tools/amplify_all.py /root/testdata/sf0.1 /tmp/sf10-amp 100 32
Run:    python experiments/q4_q16_bucketed.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AMP_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10-amp"
WAREHOUSE = "/tmp/q4q16_bucketed_wh"
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


def n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


def main() -> None:
    shutil.rmtree(WAREHOUSE, ignore_errors=True)
    from spotify_etl_aws_spark.session import get_spark
    from spotify_etl_aws_spark.sources.readers import load_table
    from spotify_etl_aws_spark.sources.sinks import save_bucketed
    from spotify_etl_aws_spark.queries.tpch import (
        _Q4_SQL,
        _Q16_SQL,
        q4_cobucketed,
        q16_approx_cobucketed,
        q16_cobucketed,
        sql_q4_priority_lateness,
        sql_q16_supplier_variety,
    )

    spark = get_spark(
        app_name="q4q16-bucketed",
        extra_conf={
            "spark.sql.warehouse.dir": WAREHOUSE,
            # context-level conf: needed by the amortization section
            "spark.scheduler.mode": "FAIR",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # --- plain plans (reproduce the BASELINE 100x numbers) -----------
    materialize(sql_q4_priority_lateness(spark, AMP_DIR))  # warm
    t_q4_plain = best_of(
        lambda: materialize(sql_q4_priority_lateness(spark, AMP_DIR))
    )
    print(f"plain q4            : {t_q4_plain:6.2f}s", flush=True)
    materialize(sql_q16_supplier_variety(spark, AMP_DIR))  # warm
    t_q16_plain = best_of(
        lambda: materialize(sql_q16_supplier_variety(spark, AMP_DIR))
    )
    print(f"plain q16           : {t_q16_plain:6.2f}s", flush=True)

    # --- one-time layouts --------------------------------------------
    t0 = time.perf_counter()
    save_bucketed(
        load_table(spark, AMP_DIR, "lineitem"), "b_li_ok", BUCKETS,
        ["l_orderkey"], ["l_orderkey"], one_file_per_bucket=True,
    )
    save_bucketed(
        load_table(spark, AMP_DIR, "orders"), "b_o_ok", BUCKETS,
        ["o_orderkey"], ["o_orderkey"], one_file_per_bucket=True,
    )
    t_layout_q4 = time.perf_counter() - t0
    print(f"q4 layout (one-time): {t_layout_q4:6.2f}s", flush=True)
    t0 = time.perf_counter()
    save_bucketed(
        load_table(spark, AMP_DIR, "lineitem"), "b_li_pk", BUCKETS,
        ["l_partkey"], ["l_partkey"], one_file_per_bucket=True,
    )
    save_bucketed(
        load_table(spark, AMP_DIR, "part"), "b_p_pk", BUCKETS,
        ["p_partkey"], ["p_partkey"], one_file_per_bucket=True,
    )
    t_layout_q16 = time.perf_counter() - t0
    print(f"q16 layout (one-time): {t_layout_q16:5.2f}s", flush=True)

    def q4b():
        return q4_cobucketed(spark.table("b_li_ok"), spark.table("b_o_ok"))

    def q16b():
        return q16_cobucketed(
            spark.table("b_li_pk"),
            spark.table("b_p_pk"),
            load_table(spark, AMP_DIR, "supplier"),
        )

    materialize(q4b())  # warm
    t_q4_buck = best_of(lambda: materialize(q4b()))
    print(f"co-bucketed q4      : {t_q4_buck:6.2f}s "
          f"(exchanges={n_exchanges(q4b())})", flush=True)
    materialize(q16b())  # warm
    t_q16_buck = best_of(lambda: materialize(q16b()))
    print(f"co-bucketed q16     : {t_q16_buck:6.2f}s "
          f"(exchanges={n_exchanges(q16b())})", flush=True)

    # --- q16 approx posture (round-9): HLL++ sketch count-distinct ----
    # kills the exact plan's (brand, type, size, suppkey) partial-
    # aggregate shuffle — the one exchange bucketing can't remove
    def q16a():
        return q16_approx_cobucketed(
            spark.table("b_li_pk"),
            spark.table("b_p_pk"),
            load_table(spark, AMP_DIR, "supplier"),
        )

    materialize(q16a())  # warm
    t_q16_appr = best_of(lambda: materialize(q16a()))
    print(f"approx q16 (hll++)  : {t_q16_appr:6.2f}s "
          f"(exchanges={n_exchanges(q16a())})", flush=True)
    exact = {
        (r.p_brand, r.p_type, r.p_size): r.supplier_cnt
        for r in q16b().collect()
    }
    appr = {
        (r.p_brand, r.p_type, r.p_size): r.supplier_cnt
        for r in q16a().collect()
    }
    shared = exact.keys() & appr.keys()
    if shared:
        errs = [abs(appr[k] - exact[k]) / max(exact[k], 1) for k in shared]
        print(
            f"approx q16 accuracy : top-30 overlap {len(shared)}/30, "
            f"max rel err {max(errs):.3%}, mean {sum(errs)/len(errs):.3%}",
            flush=True,
        )

    # cross-check: identical result rows
    for name, plain, buck in [
        ("q4", sql_q4_priority_lateness(spark, AMP_DIR), q4b()),
        ("q16", sql_q16_supplier_variety(spark, AMP_DIR), q16b()),
    ]:
        want = sorted(map(tuple, plain.collect()))
        got = sorted(map(tuple, buck.collect()))
        if got != want:
            print(f"MISMATCH on {name}!", file=sys.stderr)
            sys.exit(1)
        print(f"parity {name}          : OK ({len(got)} rows)", flush=True)

    # --- bare-scan floor for the q16 adjudication ----------------------
    # the minimal work ANY q16 plan must do: materialize the fact's two
    # join/aggregate columns off the bucketed layout
    t_floor = best_of(
        lambda: materialize(
            spark.table("b_li_pk").select("l_partkey", "l_suppkey")
        )
    )
    print(f"q16 scan floor      : {t_floor:6.2f}s "
          f"(l_partkey+l_suppkey off the bucketed fact)", flush=True)

    # --- FAIR-scheduler amortization on the bucketed layout -----------
    # (the q5 adjudication's second leg: a 1000-executor cluster never
    # runs one 5-row-result query alone; concurrent submissions share
    # the scan+dispatch floor)
    import threading

    for name, fn in [("q4", q4b), ("q16", q16b), ("q16a", q16a)]:
        n = 4
        t0 = time.perf_counter()
        th = [
            threading.Thread(target=lambda: materialize(fn()))
            for _ in range(n)
        ]
        for x in th:
            x.start()
        for x in th:
            x.join()
        w = time.perf_counter() - t0
        print(
            f"{name} x{n} concurrent  : {w:6.2f}s "
            f"-> {w / n:.2f}s effective/query",
            flush=True,
        )

    # --- DuckDB same files --------------------------------------------
    import duckdb

    con = duckdb.connect(config={"threads": "32"})
    for t in ["customer", "orders", "lineitem", "part", "supplier",
              "nation", "region"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{AMP_DIR}/{t}.parquet/*.parquet')"
        )
    con.execute(_Q4_SQL).fetchall()  # warm
    t_q4_duck = best_of(lambda: con.execute(_Q4_SQL).fetchall())
    con.execute(_Q16_SQL).fetchall()  # warm
    t_q16_duck = best_of(lambda: con.execute(_Q16_SQL).fetchall())
    print(f"duckdb q4           : {t_q4_duck:6.2f}s", flush=True)
    print(f"duckdb q16          : {t_q16_duck:6.2f}s", flush=True)
    print(
        f"q4 ratios : plain {t_q4_plain / t_q4_duck:.2f}x  "
        f"co-bucketed {t_q4_buck / t_q4_duck:.2f}x",
        flush=True,
    )
    print(
        f"q16 ratios: plain {t_q16_plain / t_q16_duck:.2f}x  "
        f"co-bucketed {t_q16_buck / t_q16_duck:.2f}x",
        flush=True,
    )


if __name__ == "__main__":
    main()
