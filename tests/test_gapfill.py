"""Time-series gap filling (operators/gapfill.py): grid completeness,
LOCF fill-group semantics, linear interpolation arithmetic, edge
(no-extrapolation) behavior, and the window-only plan shape."""

from __future__ import annotations

import datetime as dt

import pytest

import pyspark.sql.functions as F

from spotify_etl_aws_spark.operators.gapfill import gapfill, time_grid


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture()
def series(spark):
    # series 'a': obs at hours 0 (10.0), 3 (40.0), 4 (20.0); gaps 1, 2
    # series 'b': single obs at hour 2
    rows = [
        ("a", _ts(0), 10.0),
        ("a", _ts(3), 40.0),
        ("a", _ts(4), 20.0),
        ("b", _ts(2), 7.0),
    ]
    return spark.createDataFrame(rows, "g string, bucket timestamp, v double")


def test_time_grid_dense_lattice(spark, series):
    grid = time_grid(series, "bucket", ["g"], 3600)
    got = {(r.g, r.bucket) for r in grid.collect()}
    # global [min, max] = hours 0..4 for BOTH dims
    assert got == {(g, _ts(h)) for g in ("a", "b") for h in range(5)}


def test_locf_carries_and_leading_nulls(spark, series):
    out = gapfill(series, "bucket", ["g"], "v", 3600, method="locf")
    got = {(r.g, r.bucket.hour): r.v for r in out.collect()}
    assert got[("a", 0)] == 10.0
    assert got[("a", 1)] == 10.0  # carried
    assert got[("a", 2)] == 10.0  # carried
    assert got[("a", 3)] == 40.0
    assert got[("a", 4)] == 20.0
    assert got[("b", 0)] is None  # before first obs: no fill
    assert got[("b", 1)] is None
    assert got[("b", 2)] == 7.0
    assert got[("b", 3)] == 7.0  # trailing carry
    assert got[("b", 4)] == 7.0


def test_linear_interpolates_and_never_extrapolates(spark, series):
    out = gapfill(series, "bucket", ["g"], "v", 3600, method="linear")
    got = {(r.g, r.bucket.hour): r.v for r in out.collect()}
    assert got[("a", 0)] == 10.0  # observed verbatim
    assert got[("a", 1)] == pytest.approx(20.0)  # 10 + (40-10)*1/3
    assert got[("a", 2)] == pytest.approx(30.0)
    assert got[("a", 3)] == 40.0
    assert got[("a", 4)] == 20.0
    # single-obs series: nothing to bracket with — edges stay NULL
    assert got[("b", 0)] is None and got[("b", 1)] is None
    assert got[("b", 2)] == 7.0
    assert got[("b", 3)] is None and got[("b", 4)] is None


def test_explicit_bounds_and_validation(spark, series):
    out = gapfill(
        series, "bucket", ["g"], "v", 3600, method="locf",
        start=_ts(2), end=_ts(6),
    )
    hours = {r.bucket.hour for r in out.filter(F.col("g") == "a").collect()}
    assert hours == {2, 3, 4, 5, 6}
    with pytest.raises(ValueError, match="method"):
        gapfill(series, "bucket", ["g"], "v", 3600, method="cubic")
    with pytest.raises(ValueError, match="step_seconds"):
        time_grid(series, "bucket", ["g"], 0)


def test_no_join_back_to_facts_only_windows(spark, series):
    """The fill is pure window work over the aggregated series: no
    self-joins per gap, no Python, and the only joins are the lattice
    build (dims × buckets) plus the one grid left-join."""
    out = gapfill(series, "bucket", ["g"], "v", 3600, method="linear")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert plan.count("SortMergeJoin") <= 1  # the grid left-join only


def test_integer_values_survive_locf(spark):
    rows = [("a", _ts(0), 5), ("a", _ts(2), 9)]
    df = spark.createDataFrame(rows, "g string, bucket timestamp, v long")
    out = gapfill(df, "bucket", ["g"], "v", 3600, method="locf")
    got = {r.bucket.hour: r.v for r in out.collect()}
    assert got == {0: 5, 1: 5, 2: 9}
    assert dict(out.dtypes)["v"] == "bigint"


def test_lttb_default_order_cols(spark):
    # regression: order_cols=None must order by the post-rename "__x"
    # (previously referenced the dropped original x_col and failed
    # with UNRESOLVED_COLUMN)
    from spotify_etl_aws_spark.operators.gapfill import lttb_downsample

    rows = [(1, x, (x * 37) % 101) for x in range(40)]
    df = spark.createDataFrame(rows, "s long, x long, y long")
    out = lttb_downsample(df, "s", "x", "y", n_out=5)
    got = out.orderBy("step").collect()
    assert len(got) == 5
    assert got[0].x == 0 and got[-1].x == 39  # endpoints always kept
    # explicit order_cols naming x_col itself follows the rename
    out2 = lttb_downsample(df, "s", "x", "y", n_out=5, order_cols=["x"])
    assert [r.x for r in out2.orderBy("step").collect()] == [
        r.x for r in got
    ]


def test_lttb_max_series_points_guard(spark):
    from spotify_etl_aws_spark.operators.gapfill import lttb_downsample

    rows = [(1, x, x) for x in range(50)]
    df = spark.createDataFrame(rows, "s long, x long, y long")
    out = lttb_downsample(df, "s", "x", "y", n_out=5, max_series_points=10)
    with pytest.raises(Exception, match="max_series_points"):
        out.collect()
