"""Interval-overlap join (operators/intervals.py): parity with a
brute-force reference across random interval sets, count-once
no-duplicate guarantee, key isolation, bin-size invariance, and the
no-cartesian plan pin."""

from __future__ import annotations

import random

import pytest

import pyspark.sql.functions as F

from spotify_etl_aws_spark.operators.intervals import interval_overlap_join


def _df(spark, rows, prefix):
    return spark.createDataFrame(
        rows, f"k long, {prefix}id long, {prefix}s long, {prefix}e long"
    )


def _brute(a_rows, b_rows):
    out = set()
    for k1, ai, as_, ae in a_rows:
        for k2, bi, bs, be in b_rows:
            if k1 == k2 and as_ <= be and bs <= ae:
                out.add((k1, ai, bi))
    return out


@pytest.mark.parametrize("bin_size", [1, 7, 32, 1000])
def test_matches_brute_force_all_bin_sizes(spark, bin_size):
    rng = random.Random(13)
    a_rows, b_rows = [], []
    for i in range(120):
        k = rng.randrange(4)
        s = rng.randrange(0, 300)
        a_rows.append((k, i, s, s + rng.randrange(0, 40)))
    for i in range(120):
        k = rng.randrange(4)
        s = rng.randrange(0, 300)
        b_rows.append((k, 1000 + i, s, s + rng.randrange(0, 40)))
    out = interval_overlap_join(
        _df(spark, a_rows, "a"),
        _df(spark, b_rows, "b"),
        "as",
        "ae",
        "bs",
        "be",
        on=["k"],
        bin_size=bin_size,
    ).collect()
    got = [(r.k, r.aid, r.bid) for r in out]
    # count-once: each qualifying pair appears EXACTLY once
    assert len(got) == len(set(got))
    assert set(got) == _brute(a_rows, b_rows)


def test_no_keys_and_touching_endpoints(spark):
    a = _df(spark, [(0, 1, 0, 10), (0, 2, 50, 60)], "a").drop("k")
    b = _df(spark, [(0, 7, 10, 20), (0, 8, 21, 49)], "b").drop("k")
    out = interval_overlap_join(a, b, "as", "ae", "bs", "be", bin_size=8)
    got = {(r.aid, r.bid) for r in out.collect()}
    # inclusive endpoints: [0,10] and [10,20] touch -> overlap
    assert got == {(1, 7)}


def test_negative_coordinates(spark):
    """floor-division binning (not int-cast truncation) must keep
    negative starts in the correct bin."""
    a = _df(spark, [(0, 1, -15, -5)], "a")
    b = _df(spark, [(0, 2, -6, 3), (0, 3, -40, -16)], "b")
    out = interval_overlap_join(
        a, b, "as", "ae", "bs", "be", on=["k"], bin_size=10
    )
    assert {(r.aid, r.bid) for r in out.collect()} == {(1, 2)}


def test_equi_join_plan_no_cartesian(spark):
    a = _df(spark, [(0, 1, 0, 5)], "a")
    b = _df(spark, [(0, 2, 3, 9)], "b")
    out = interval_overlap_join(a, b, "as", "ae", "bs", "be", on=["k"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan, plan


def test_validates_bin_size(spark):
    a = _df(spark, [(0, 1, 0, 5)], "a")
    with pytest.raises(ValueError, match="bin_size"):
        interval_overlap_join(a, a, "as", "ae", "as", "ae", bin_size=0)


def test_huge_bounds_beyond_double_precision(spark):
    # bin ids must come from exact int64 floor division: doubles round
    # above 2^53, so float binning could place the explode bins and the
    # count-once bin differently and drop/duplicate pairs
    base = (1 << 60) + 1  # not representable as double
    a_rows = [(0, 1, base, base + 10), (0, 2, base + 100, base + 130)]
    b_rows = [(0, 7, base + 5, base + 6), (0, 8, base + 131, base + 140)]
    a = _df(spark, a_rows, "a")
    b = _df(spark, b_rows, "b")
    out = interval_overlap_join(
        a, b, "as", "ae", "bs", "be", on=["k"], bin_size=7
    ).collect()
    got = {(r.aid, r.bid) for r in out}
    assert got == {(1, 7)}
    assert len(out) == 1  # count-once: no duplicate from shared bins


@pytest.mark.parametrize("bin_size", [3, 64])
def test_brute_force_parity_huge_and_negative_coords(spark, bin_size):
    """Randomized parity sweep in the regimes double arithmetic gets
    wrong: magnitudes beyond 2^53 (both signs) mixed with small ones,
    so any float rounding in bin assignment or the count-once filter
    would show as a dropped or duplicated pair."""
    rng = random.Random(97)
    anchors = [0, -(1 << 60), (1 << 60) + 7, -(1 << 54), (1 << 53)]
    a_rows, b_rows = [], []
    for i in range(80):
        k = rng.randrange(3)
        base = rng.choice(anchors) + rng.randrange(-200, 200)
        a_rows.append((k, i, base, base + rng.randrange(0, 50)))
    for i in range(80):
        k = rng.randrange(3)
        base = rng.choice(anchors) + rng.randrange(-200, 200)
        b_rows.append((k, i, base, base + rng.randrange(0, 50)))
    out = interval_overlap_join(
        _df(spark, a_rows, "a"),
        _df(spark, b_rows, "b"),
        "as", "ae", "bs", "be",
        on=["k"],
        bin_size=bin_size,
    ).collect()
    got = [(r.k, r.aid, r.bid) for r in out]
    want = _brute(a_rows, b_rows)
    assert sorted(got) == sorted(want)  # also proves count-once
    assert want, "vacuous: no overlapping pairs generated"
