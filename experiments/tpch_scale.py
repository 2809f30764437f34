"""TPC-H lane scale probe: time the fourteen `queries/tpch.py` lanes
Spark-vs-DuckDB at sf0.1 and on the FK-consistent 10× amplified corpus
(`tools/amplify_all.py` → /tmp/sf1-amp). Correctness is the sweep's
job; this records the perf posture rows for BASELINE.md — each lane's
median-of-3 warm wall time after one untimed warm-up run (first-plan
JIT and broadcast builds otherwise dominate sub-second queries).

Usage: python experiments/tpch_scale.py [sf_dir ...]
(defaults: /root/testdata/sf0.1 /tmp/sf1-amp)
"""

from __future__ import annotations

import glob
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LANES = [
    "sql_q4_priority_lateness",
    "sql_q6_revenue_delta",
    "sql_q7_volume_shipping",
    "sql_q8_market_share",
    "sql_q9_product_profit",
    "sql_q10_returned_items",
    "sql_q11_important_value",
    "sql_q12_latency_priority",
    "sql_q13_order_distribution",
    "sql_q14_promo_effect",
    "sql_q15_top_supplier",
    "sql_q16_supplier_variety",
    "sql_q19_brand_size_qty",
    "sql_q20_quarter_share_suppliers",
]

TABLES = ("region", "nation", "customer", "orders", "lineitem", "part",
          "supplier")


def duck_connect(sf_dir: str):
    import duckdb

    con = duckdb.connect(config={"threads": "32"})
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    return con


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sf1-amp"]
    from pyspark.sql import SparkSession

    from spotify_etl_aws_spark.queries import all_oracles, all_queries

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs, os_ = all_queries(), all_oracles()

    for d in dirs:
        if not glob.glob(os.path.join(d, "*.parquet")):
            print(f"== {d}: missing, skipped")
            continue
        print(f"== {d}")
        con = duck_connect(d)
        total_s = total_d = 0.0
        for name in LANES:
            qs[name](spark, d).count()  # warm-up: plan JIT + broadcasts
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                n = qs[name](spark, d).count()
                walls.append(time.perf_counter() - t0)
            s = statistics.median(walls)
            dwalls = []
            for _ in range(3):
                t0 = time.perf_counter()
                dn = len(con.execute(os_[name]).fetchall())
                dwalls.append(time.perf_counter() - t0)
            dw = statistics.median(dwalls)
            total_s += s
            total_d += dw
            flag = "" if n == dn else "  ROWS-MISMATCH!"
            print(f"  {name:34s} spark {s:6.3f}s  duckdb {dw:6.3f}s  "
                  f"ratio {s / dw:5.2f}x  rows {n}{flag}", flush=True)
        print(f"  {'TOTAL':34s} spark {total_s:6.3f}s  duckdb {total_d:6.3f}s"
              f"  ratio {total_s / total_d:5.2f}x")


if __name__ == "__main__":
    main()
