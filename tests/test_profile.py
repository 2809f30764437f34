"""Column-profiling lane (stats_column_profile): per-column metrics
against direct aggregates on the source columns (the injectivity
contract: carrier-cast distinct counts equal native distinct counts),
null accounting on a synthetic frame, and the one-scan plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_etl_aws_spark.queries.selection import (
    PROFILE_COLS,
    stats_column_profile,
)
from spotify_etl_aws_spark.sources.readers import load_table


def test_matches_direct_aggregates(spark, sf_dir):
    """For every profiled column: n_rows == table count, n_null ==
    native null count, n_distinct == native countDistinct — i.e. the
    string carrier changed nothing (injective casts)."""
    orders = load_table(spark, sf_dir, "orders")
    direct = orders.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.countDistinct(c).alias(f"d_{c}") for c in PROFILE_COLS],
        *[
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"z_{c}")
            for c in PROFILE_COLS
        ],
    ).collect()[0]
    got = {r.col_name: r for r in stats_column_profile(spark, sf_dir).collect()}
    assert set(got) == set(PROFILE_COLS)
    for c in PROFILE_COLS:
        assert got[c].n_rows == direct["n"]
        assert got[c].n_null == direct[f"z_{c}"]
        assert got[c].n_distinct == direct[f"d_{c}"]


def test_null_accounting(spark):
    """Nulls count toward n_rows and n_null but never n_distinct, per
    SQL count(DISTINCT) semantics on both engines."""
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, None)], "id long, s string"
    )
    stacked = df.select(
        F.expr("stack(1, 's', cast(s as string)) as (col_name, val)")
    )
    row = stacked.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("val").isNull(), 1).otherwise(0)).alias("n_null"),
        F.countDistinct("val").alias("n_distinct"),
    ).collect()[0]
    assert (row.n_rows, row.n_null, row.n_distinct) == (4, 2, 1)


def test_plan_one_scan_no_python(spark, sf_dir):
    plan = (
        stats_column_profile(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("FileScan parquet") == 1
    for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert bad not in plan
