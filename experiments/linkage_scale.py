"""Scale probe for the Fellegi-Sunter linkage lane
(`operators/linkage.py`): candidate-census and wall at 1x/10x/30x
master sizes, Spark vs the DuckDB twin running the identical blocking
+ scoring SQL (counts asserted equal in-run).

What the probe answers:

1. **Does blocking keep candidates linear?** Each pass is an equi-join
   whose candidate mass is sum-of-bucket-squared. The name-suffix pass
   keys on 10^4 suffixes and the phone pass on ~25 * 10^3 prefixes, so
   bucket sizes grow linearly with replicas (amplified corpora REUSE
   names) — the probe prints candidates/master-row so the quadratic
   creep of replica families is visible, mirroring the edit-distance
   lane's replica analysis.
2. **Where does Spark overtake the single box?** Scoring is map-side
   expression arithmetic on candidates; the crossover tracks candidate
   volume like every candidate-generation lane in BASELINE.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"

LINK_SQL_TEMPLATE = None  # filled from the lane's oracle at runtime


def duck_run(con, sql):
    t0 = time.time()
    n = con.execute(f"SELECT count(*) FROM ({sql})").fetchone()[0]
    return time.time() - t0, n


def main():
    from pyspark.sql import SparkSession

    from spotify_etl_aws_spark.queries.selection import (
        ORACLE_FS_LINK,
        link_customer_records,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .appName("linkage-scale")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import os

    src = pq.read_table(os.path.join(SF_DIR, "customer.parquet"))
    n0 = src.num_rows
    for reps in (1, 10, 30):
        # replicate with shifted custkeys (names/balances reused — the
        # duplicate-master regime the 10x sweep already exercises)
        chunks = []
        for r in range(reps):
            chunks.append(
                src.set_column(
                    src.schema.get_field_index("c_custkey"),
                    "c_custkey",
                    pc.add(src.column("c_custkey"), r * n0),
                )
            )
        amp = pa.concat_tables(chunks)
        path = f"/tmp/linkage_amp_{reps}"
        pq.write_table(amp, f"{path}.parquet")
        os.makedirs(path, exist_ok=True)
        pq.write_table(amp, f"{path}/customer.parquet")

        t0 = time.time()
        sdf = link_customer_records(spark, path)
        sn = sdf.count()
        sw = time.time() - t0

        con = duckdb.connect()
        con.execute("SET threads TO 32")
        con.execute(
            f"CREATE VIEW customer AS SELECT * FROM '{path}/customer.parquet'"
        )
        dw, dn = duck_run(con, ORACLE_FS_LINK)
        assert sn == dn, f"ENGINE DISAGREEMENT reps={reps}: {sn} vs {dn}"
        rows = n0 * reps
        print(
            f"reps={reps:>2} masters={rows:>7} matches={sn:>9} "
            f"({sn / rows:.1f}/probe) spark={sw:6.2f}s duck={dw:6.2f}s "
            f"ratio={sw / dw:4.2f}x",
            flush=True,
        )

    spark.stop()


if __name__ == "__main__":
    main()
