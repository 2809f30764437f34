"""Scale probe for the segment-partition edit-distance join
(`operators/editdist.py`): Spark vs the relational DuckDB twin over
document-title prefixes at 1×/10×/100× amplification.

Amplified fixtures replicate documents, so every replica family is an
exact-title group — the OUTPUT grows quadratically in the replication
factor (each family of ~R near-identical titles yields ~R²/2 pairs)
while the candidate-generation work stays linear in rows: exactly the
regime that separates a pigeonhole equi-join from a theta join. The
in-run check asserts Spark and DuckDB produce identical pair counts.

Run: python experiments/editdist_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIRS = [
    ("sf0.1 (1x)", "/root/testdata/sf0.1"),
    ("10x", "/tmp/sf1-amp"),
    ("100x", "/tmp/sf10-amp"),
]


def main() -> None:
    import duckdb

    from spotify_etl_aws_spark.queries.selection import (
        ORACLE_EDITDIST,
        dedup_editdistance_pairs,
    )
    from spotify_etl_aws_spark.session import get_spark

    spark = get_spark(app_name="editdist-scale")
    spark.sparkContext.setLogLevel("ERROR")

    for label, d in DIRS:
        if not os.path.isdir(d):
            print(f"{label}: fixture missing, skipped", flush=True)
            continue
        t0 = time.perf_counter()
        n_spark = dedup_editdistance_pairs(spark, d).count()
        t_spark = time.perf_counter() - t0
        print(
            f"{label:12s}: spark  {t_spark:7.2f}s  pairs={n_spark:>10,}",
            flush=True,
        )

        con = duckdb.connect(config={"threads": "32"})
        doc = f"{d}/documents.parquet"
        src = f"'{doc}/*.parquet'" if os.path.isdir(doc) else f"'{doc}'"
        con.execute(f"CREATE VIEW documents AS SELECT * FROM {src}")
        t0 = time.perf_counter()
        n_duck = con.execute(
            f"SELECT count(*) FROM ({ORACLE_EDITDIST})"
        ).fetchone()[0]
        t_duck = time.perf_counter() - t0
        con.close()

        assert n_spark == n_duck, (label, n_spark, n_duck)
        print(
            f"{label:12s}: duckdb {t_duck:7.2f}s  "
            f"ratio {t_spark / t_duck:4.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
