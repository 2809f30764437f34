"""DTW sequence similarity (operators/dtw.py): DP reference parity
(textbook full-matrix implementation), metric sanity (identity,
symmetry, shift tolerance vs pointwise distance), top-k ranking with
id tie-break and the TakeOrderedAndProject plan pin, and the loud
series-length guard."""

from __future__ import annotations

import random

import pytest

from spotify_etl_aws_spark.operators.dtw import dtw_distance, dtw_topk_search


def ref_dtw(a, b):
    """Full-matrix textbook DP — independent of the rolling-array
    implementation under test."""
    n, m = len(a), len(b)
    INF = float("inf")
    D = [[INF] * (m + 1) for _ in range(n + 1)]
    D[0][0] = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            D[i][j] = abs(a[i - 1] - b[j - 1]) + min(
                D[i - 1][j], D[i][j - 1], D[i - 1][j - 1]
            )
    return D[n][m]


def test_matches_reference_dp_random():
    rng = random.Random(5)
    for _ in range(200):
        a = [rng.randrange(-50, 50) for _ in range(rng.randrange(1, 15))]
        b = [rng.randrange(-50, 50) for _ in range(rng.randrange(1, 15))]
        assert dtw_distance(a, b) == ref_dtw(a, b), (a, b)


def test_metric_sanity():
    a = [1, 5, 9, 2]
    assert dtw_distance(a, a) == 0
    b = [2, 6, 8, 1]
    assert dtw_distance(a, b) == dtw_distance(b, a)
    # time-shifted copy: DTW absorbs the shift (distance 0 via warping),
    # where pointwise L1 would pay at every position
    shifted = [1, 1, 5, 9, 2, 2]
    assert dtw_distance(a, shifted) == 0
    assert sum(abs(x - y) for x, y in zip(a + [2, 2], shifted)) > 0


def test_empty_series_raises():
    with pytest.raises(ValueError, match="empty"):
        dtw_distance([], [1])
    with pytest.raises(ValueError, match="empty"):
        dtw_distance([1], [])


def _series_df(spark, series: dict[int, list[int]]):
    rows = [
        (sid, pos, val)
        for sid, vals in series.items()
        for pos, val in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "series_id long, pos long, val long")


def test_topk_matches_brute_and_breaks_ties_by_id(spark):
    rng = random.Random(9)
    series = {
        sid: [rng.randrange(0, 40) for _ in range(rng.randrange(3, 12))]
        for sid in range(40)
    }
    # plant exact ties: two ids with identical series
    series[50] = list(series[0])
    series[51] = list(series[0])
    q = [10, 20, 30, 20]
    got = [
        (r.series_id, r.dtw_dist)
        for r in dtw_topk_search(_series_df(spark, series), q, k=7).collect()
    ]
    want = sorted(
        ((sid, ref_dtw(vals, q)) for sid, vals in series.items()),
        key=lambda t: (t[1], t[0]),
    )[:7]
    assert got == want


def test_topk_plan_uses_heap_cut(spark):
    series = {sid: [sid, sid + 1] for sid in range(10)}
    out = dtw_topk_search(_series_df(spark, series), [1, 2], k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_max_len_guard_is_loud(spark):
    series = {1: list(range(50))}
    out = dtw_topk_search(_series_df(spark, series), [1, 2], k=1, max_len=10)
    with pytest.raises(Exception, match="max_len"):
        out.collect()


def test_validates_params(spark):
    df = _series_df(spark, {1: [1, 2]})
    with pytest.raises(ValueError, match="k must be"):
        dtw_topk_search(df, [1], k=0)
    with pytest.raises(ValueError, match="query series is empty"):
        dtw_topk_search(df, [], k=1)


def test_non_numeric_id_raises_contract_error(spark):
    """UUID-style string ids cast to NULL long — before the guard the
    groupBy collapsed every series into one group and the kernel died
    with a cryptic TypeError; now the plan raises naming the long-id
    contract and the offending value."""
    rows = [("a1b2c3", 0, 5), ("a1b2c3", 1, 7), ("ffee00", 0, 2)]
    df = spark.createDataFrame(rows, "series_id string, pos long, val long")
    out = dtw_topk_search(df, [1, 2], k=1)
    with pytest.raises(Exception, match="long-id contract"):
        out.collect()
