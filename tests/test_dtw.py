"""DTW sequence similarity (operators/dtw.py): DP reference parity
(textbook full-matrix implementation), metric sanity (identity,
symmetry, shift tolerance vs pointwise distance), top-k ranking with
id tie-break and the TakeOrderedAndProject plan pin, and the loud
series-length guard."""

from __future__ import annotations

import random

import pytest

from spotify_etl_aws_spark.operators.dtw import (
    dtw_distance,
    dtw_lower_bound,
    dtw_topk_search,
)


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


def test_lower_bound_is_admissible_and_cheap_shapes():
    """LB never exceeds the true DTW distance (admissibility — the
    property the pruning cascade's exactness rests on), is exact for
    single-point series, and is 0 for identical series."""
    rng = random.Random(17)
    for _ in range(300):
        a = [rng.randrange(-80, 80) for _ in range(rng.randrange(1, 16))]
        b = [rng.randrange(-80, 80) for _ in range(rng.randrange(1, 16))]
        lb, d = dtw_lower_bound(a, b), ref_dtw(a, b)
        assert lb <= d, (a, b, lb, d)
        assert lb == dtw_lower_bound(b, a)  # symmetric
    assert dtw_lower_bound([7], [3]) == 4 == dtw_distance([7], [3])
    a = [1, 9, 4, 4, 2]
    assert dtw_lower_bound(a, a) == 0
    with pytest.raises(ValueError, match="empty"):
        dtw_lower_bound([], [1])


def test_pruned_matches_unpruned_and_geometry_prunes(spark):
    """The LB → seed-τ → survivors cascade returns exactly the
    unpruned top-k, on data where pruning is provably active: a tight
    cluster near the query plus far-flung outliers whose LB alone
    disqualifies them (verified by replaying the cascade arithmetic in
    pure Python)."""
    rng = random.Random(31)
    q = [100, 120, 110, 130, 105]
    series = {}
    for sid in range(15):  # near cluster
        series[sid] = [v + rng.randrange(-5, 6) for v in q]
    for sid in range(15, 60):  # far outliers, varied lengths
        base = rng.randrange(1000, 9000)
        series[sid] = [
            base + rng.randrange(-50, 51)
            for _ in range(rng.randrange(3, 9))
        ]
    k = 7
    df = _series_df(spark, series)
    pruned = [
        (r.series_id, r.dtw_dist)
        for r in dtw_topk_search(df, q, k=k, prune=True).collect()
    ]
    unpruned = [
        (r.series_id, r.dtw_dist)
        for r in dtw_topk_search(df, q, k=k, prune=False).collect()
    ]
    brute = sorted(
        ((sid, ref_dtw(vals, q)) for sid, vals in series.items()),
        key=lambda t: (t[1], t[0]),
    )[:k]
    assert pruned == unpruned == brute
    # replay the heap+LB-skip logic sequentially: on this geometry the
    # evolving τ must let the LB skip most of the outlier DPs
    import heapq

    heap, skipped = [], 0
    for sid in sorted(series):
        vals = series[sid]
        if len(heap) == k and dtw_lower_bound(vals, q) > -heap[0][0]:
            skipped += 1
            continue
        item = (-ref_dtw(vals, q), -sid)
        if len(heap) < k:
            heapq.heappush(heap, item)
        elif item > heap[0]:
            heapq.heapreplace(heap, item)
    replay = sorted((-d, -s) for d, s in heap)
    assert [(s, d) for d, s in replay] == brute
    assert skipped > len(series) // 2, (skipped, len(series))


def test_series_spanning_arrow_batches(spark):
    """The single-pass kernel carries a series across Arrow batch
    boundaries (mapInPandas splits a sorted partition at
    maxRecordsPerBatch rows, so one series can straddle consecutive
    batches): force tiny batches and verify distances stay exact."""
    rng = random.Random(77)
    series = {
        sid: [rng.randrange(0, 500) for _ in range(rng.randrange(20, 40))]
        for sid in range(12)
    }
    q = [rng.randrange(0, 500) for _ in range(15)]
    conf = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(conf)
    spark.conf.set(conf, "7")
    try:
        got = [
            (r.series_id, r.dtw_dist)
            for r in dtw_topk_search(
                _series_df(spark, series), q, k=5
            ).collect()
        ]
    finally:
        spark.conf.set(conf, old)
    want = sorted(
        ((sid, ref_dtw(vals, q)) for sid, vals in series.items()),
        key=lambda t: (t[1], t[0]),
    )[:5]
    assert got == want


def ref_banded(a, b, w):
    """Full-matrix banded reference DP, cells |i-j| <= w only."""
    n, m = len(a), len(b)
    INF = float("inf")
    D = [[INF] * (m + 1) for _ in range(n + 1)]
    D[0][0] = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            if abs(i - j) > w:
                continue
            D[i][j] = abs(a[i - 1] - b[j - 1]) + min(
                D[i - 1][j], D[i][j - 1], D[i - 1][j - 1]
            )
    return D[n][m]


def test_banded_distance_matches_reference_and_orders():
    from spotify_etl_aws_spark.operators.dtw import dtw_lower_bound

    rng = random.Random(13)
    for _ in range(200):
        n = rng.randrange(1, 14)
        m = rng.randrange(max(1, n - 3), n + 4)
        a = [rng.randrange(-60, 60) for _ in range(n)]
        b = [rng.randrange(-60, 60) for _ in range(m)]
        w = rng.randrange(abs(n - m), abs(n - m) + 5)
        got = dtw_distance(a, b, band=w)
        assert got == ref_banded(a, b, w), (a, b, w)
        # restricting paths can only increase the distance; a band
        # covering the whole matrix equals the unconstrained DP
        assert got >= dtw_distance(a, b)
        assert dtw_distance(a, b, band=max(n, m)) == dtw_distance(a, b)
        # the banded LB (value-set + LB_Keogh envelope) is admissible
        lb = dtw_lower_bound(a, b, band=w)
        assert lb <= got, (a, b, w, lb, got)
        assert lb >= dtw_lower_bound(a, b)  # at least as tight
    with pytest.raises(ValueError, match="no warping path"):
        dtw_distance([1, 2, 3, 4, 5], [1], band=2)
    with pytest.raises(ValueError, match="band must be"):
        dtw_distance([1], [1], band=-1)


def test_banded_envelope_prunes_same_regime():
    """The round-9 boundary close: on same-regime series where the
    value-set bound is hopeless (~27 % tight, 0 % skip measured), the
    band's positional envelope separates phase-shifted candidates —
    LB_Keogh reaches past the value-set floor."""
    from spotify_etl_aws_spark.operators.dtw import dtw_lower_bound

    rng = random.Random(99)
    q = [1000 * ((7 * i) % 13) for i in range(40)]
    # same VALUE SET, different order (a phase shift the value-set
    # bound cannot see at all)
    shifted = q[20:] + q[:20]
    w = 3
    unbanded_lb = dtw_lower_bound(shifted, q)
    banded_lb = dtw_lower_bound(shifted, q, band=w)
    banded_d = dtw_distance(shifted, q, band=w)
    assert banded_lb <= banded_d
    # measured: 39000 vs 13000 (the unbanded bound is pure endpoint
    # terms here — the interior value-set distance is exactly 0 on a
    # permutation); the envelope sees the phase shift
    assert banded_lb > 2 * unbanded_lb, (unbanded_lb, banded_lb, banded_d)


@pytest.mark.parametrize("prune", [False, True])
def test_banded_topk_matches_brute_and_drops_infeasible(spark, prune):
    rng = random.Random(21)
    w = 4
    series = {}
    for sid in range(50):
        n = rng.randrange(3, 16)
        series[sid] = [rng.randrange(0, 50) for _ in range(n)]
    q = [10, 25, 30, 20, 15, 40, 5, 30]  # len 8
    got = [
        (r.series_id, r.dtw_dist)
        for r in dtw_topk_search(
            _series_df(spark, series), q, k=9, prune=prune, band=w
        ).collect()
    ]
    feas = {
        sid: vals for sid, vals in series.items() if abs(len(vals) - 8) <= w
    }
    assert len(feas) < len(series)  # infeasible candidates planted
    want = sorted(
        ((sid, ref_banded(vals, q, w)) for sid, vals in feas.items()),
        key=lambda t: (t[1], t[0]),
    )[:9]
    assert got == want


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
