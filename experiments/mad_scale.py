"""Scale probe for the MAD outlier pair (`operators/robust.py`):
exact window-rank form vs the percentile_approx partial-agg form at
1x/10x the sf0.1 orders table, on BOTH group shapes — many small
groups (per-customer: the exact form's window partitions stay tiny)
and few huge groups (per-priority: the shape where a window-rank
shuffle of full rows hurts and the sketch's map-side merge wins).

Flag-set fidelity is printed for the approx run (groups below
`accuracy` are exact by the GK theorem, so per-customer must be
identical; per-priority reports the symmetric difference — rows whose
deviation sits inside the rank envelope of the k*MAD threshold).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from spotify_etl_aws_spark.operators.robust import (
        mad_outliers,
        mad_outliers_approx,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .appName("mad-scale")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    src = pq.read_table(
        os.path.join(SF_DIR, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"],
    )
    n0 = src.num_rows
    for reps in (1, 10):
        chunks = [
            src.set_column(
                src.schema.get_field_index("o_orderkey"),
                "o_orderkey",
                pc.add(src.column("o_orderkey"), r * 10 * n0),
            )
            for r in range(reps)
        ]
        pq.write_table(pa.concat_tables(chunks), f"/tmp/mad_amp_{reps}.parquet")
        orders = spark.read.parquet(f"/tmp/mad_amp_{reps}.parquet").select(
            F.col("o_orderkey").alias("id"),
            F.col("o_custkey").alias("cust"),
            F.col("o_orderpriority").alias("prio"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        ).repartition(32).cache()
        rows = orders.count()
        for gcol, label in (("cust", "small-groups"), ("prio", "huge-groups")):
            t0 = time.time()
            ex = mad_outliers(orders, gcol, "cents", "id").cache()
            ne = ex.count()
            we = time.time() - t0
            t0 = time.time()
            ap = mad_outliers_approx(orders, gcol, "cents", "id").cache()
            na = ap.count()
            wa = time.time() - t0
            sym = (
                ex.select("id").exceptAll(ap.select("id")).count()
                + ap.select("id").exceptAll(ex.select("id")).count()
            )
            print(
                f"reps={reps:>2} rows={rows:>8,} {label:12s} "
                f"exact={we:6.2f}s ({ne:,} flagged)  "
                f"approx={wa:6.2f}s ({na:,} flagged)  symdiff={sym}",
                flush=True,
            )
            ex.unpersist()
            ap.unpersist()
        orders.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
