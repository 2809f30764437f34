"""MAD outlier detection (operators/robust.py): hand-computed
median/MAD on known groups, discrete-median semantics (percentile_disc
rank ceil(n/2)), MAD=0 flag-any-deviation behavior, min_group gate,
and robustness (one wild value does not mask itself)."""

from __future__ import annotations

import pytest

from spotify_etl_aws_spark.operators.robust import mad_outliers


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "g long, id long, v long")
    out = mad_outliers(df, "g", "v", "id", **kw).collect()
    return {r.id: (r.med, r.mad, r.abs_dev) for r in out}


def test_hand_computed_outlier(spark):
    # group: 10,12,14,16,1000 -> sorted rank ceil(5/2)=3 -> med=14;
    # abs devs 4,2,0,2,986 -> mad (rank 3 of 0,2,2,4,986) = 2;
    # threshold 3*2=6 -> only the 1000 row flags (986 > 6)
    rows = [(1, i, v) for i, v in enumerate([10, 12, 14, 16, 1000])]
    got = _run(spark, rows)
    assert got == {4: (14, 2, 986)}


def test_discrete_median_even_group(spark):
    # 6 values 1,2,3,100,101,102: med = rank ceil(6/2)=3 -> 3 (the
    # DISCRETE lower-middle, no interpolation — quantile_cont would
    # say 51.5); devs sorted 0,1,2,97,98,99 -> mad = rank 3 -> 2;
    # threshold 6 -> exactly the far trio flags
    rows = [(1, i, v) for i, v in enumerate([1, 2, 3, 100, 101, 102])]
    got = _run(spark, rows, min_group=6)
    assert set(got) == {3, 4, 5}
    assert got[3] == (3, 2, 97)


def test_mad_zero_flags_any_deviation(spark):
    # over half the group identical -> mad=0 -> the single deviant
    # flags no matter how small its deviation
    rows = [(1, i, 50) for i in range(5)] + [(1, 9, 51)]
    got = _run(spark, rows)
    assert got == {9: (50, 0, 1)}


def test_min_group_gate(spark):
    rows = [(1, i, v) for i, v in enumerate([10, 10, 10, 999])]
    assert _run(spark, rows, min_group=5) == {}
    assert 3 in _run(spark, rows, min_group=4)


def test_wild_value_does_not_mask_itself(spark):
    # the classic z-score failure: one huge value inflates stddev and
    # hides itself; median/MAD must still flag it
    rows = [(1, i, 100 + (i % 3)) for i in range(12)] + [(1, 99, 10_000_000)]
    got = _run(spark, rows)
    assert 99 in got and len(got) == 1


def test_groups_are_independent(spark):
    rows = (
        [(1, i, v) for i, v in enumerate([10, 12, 14, 16, 1000])]
        + [(2, 100 + i, v) for i, v in enumerate([5, 5, 5, 5, 5])]
    )
    got = _run(spark, rows)
    assert set(got) == {4}


def test_approx_equals_exact_below_accuracy(spark):
    # every group smaller than `accuracy` -> the GK summary retains
    # all samples and the approx form must equal the exact form
    # row-for-row, including even-group discrete-median choice
    import random

    from spotify_etl_aws_spark.operators.robust import mad_outliers_approx

    rng = random.Random(29)
    rows = []
    rid = 0
    for g in range(20):
        n = rng.randrange(5, 200)
        for _ in range(n):
            v = rng.randrange(100) if rng.random() < 0.9 else rng.randrange(10**6)
            rows.append((g, rid, v))
            rid += 1
    df = spark.createDataFrame(rows, "g long, id long, v long")
    exact = {
        r.id: (r.med, r.mad, r.abs_dev)
        for r in mad_outliers(df, "g", "v", "id").collect()
    }
    approx = {
        r.id: (r.med, r.mad, r.abs_dev)
        for r in mad_outliers_approx(df, "g", "v", "id", accuracy=10_000).collect()
    }
    assert approx == exact
    assert exact, "degenerate fixture: nothing flagged"


def test_approx_rank_envelope_at_low_accuracy(spark):
    # one 5,000-row group at accuracy=50 (rank tolerance n/50 = 100):
    # the returned med/mad must be group elements whose exact rank is
    # within the envelope of the true median rank — the published
    # Greenwald-Khanna bound, checked directly
    import random

    from spotify_etl_aws_spark.operators.robust import mad_outliers_approx

    rng = random.Random(31)
    vals = [rng.randrange(10**9) for _ in range(5_000)]
    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(vals)], "g long, id long, v long"
    )
    out = mad_outliers_approx(df, "g", "v", "id", k=0, accuracy=50).collect()
    assert out  # k=0 flags any deviation above zero -> non-empty
    med = out[0].med
    mad = out[0].mad
    n = len(vals)
    tol = n // 50
    target = (n + 1) // 2

    def rank_of(x, xs):
        assert x in xs, "approx result must be an actual group element"
        s = sorted(xs)
        import bisect

        return bisect.bisect_right(s, x)

    assert abs(rank_of(med, vals) - target) <= tol
    devs = [abs(v - med) for v in vals]
    assert abs(rank_of(mad, devs) - target) <= tol


def test_approx_plan_has_no_window_shuffle(spark):
    from spotify_etl_aws_spark.operators.robust import (
        mad_outliers,
        mad_outliers_approx,
    )

    df = spark.createDataFrame(
        [(1, i, i * 7 % 100) for i in range(50)], "g long, id long, v long"
    )
    plan_a = (
        mad_outliers_approx(df, "g", "v", "id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan_a  # partial-agg pass, no window-rank
    assert "percentile_approx" in plan_a
    plan_e = (
        mad_outliers(df, "g", "v", "id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan_e  # the exact form is the window one
