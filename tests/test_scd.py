"""SCD Type-2 compression, CDC latest-wins apply, and point-in-time
join (operators/scd.py) — parity with a dict-based Python reference,
null-safe change detection, delete semantics, and the shared-sort
plan shape.
"""

from __future__ import annotations

import datetime as dt

import pytest

import pyspark.sql.functions as F

from spotify_etl_aws_spark.operators.scd import (
    apply_cdc,
    scd2_compress,
    scd2_point_in_time,
)


def _d(day):
    return dt.date(2024, 1, day)


def _obs(spark, rows):
    return spark.createDataFrame(
        rows, "uid long, attr string, extra long, ts date"
    )


def test_scd2_basic_runs_collapse(spark):
    rows = [
        (1, "a", 0, _d(1)),
        (1, "a", 0, _d(2)),
        (1, "b", 0, _d(3)),
        (1, "b", 0, _d(5)),
        (1, "a", 0, _d(9)),
        (2, "x", 0, _d(4)),
    ]
    out = scd2_compress(
        _obs(spark, rows), ["uid"], ["attr"], "ts"
    ).collect()
    got = {
        (r.uid, r.version): (r.attr, r.valid_from, r.valid_to, r.is_current)
        for r in out
    }
    assert got[(1, 1)] == ("a", _d(1), _d(3), False)
    assert got[(1, 2)] == ("b", _d(3), _d(9), False)
    assert got[(1, 3)] == ("a", _d(9), None, True)
    assert got[(2, 1)] == ("x", _d(4), None, True)
    assert len(got) == 4


def test_scd2_null_safe_and_multi_attr(spark):
    rows = [
        (1, None, 7, _d(1)),  # NULL first attr still opens version 1
        (1, None, 7, _d(2)),  # no change
        (1, None, 8, _d(3)),  # second attr changes
        (1, "z", 8, _d(4)),  # NULL -> value is a change
    ]
    out = scd2_compress(
        _obs(spark, rows), ["uid"], ["attr", "extra"], "ts"
    ).collect()
    byver = {r.version: r for r in out}
    assert len(byver) == 3
    assert byver[1].attr is None and byver[1].extra == 7
    assert byver[2].extra == 8 and byver[2].valid_from == _d(3)
    assert byver[3].attr == "z" and byver[3].is_current


def test_scd2_matches_dict_reference(spark):
    import random

    rng = random.Random(11)
    rows = []
    for uid in range(40):
        day = 1
        for _ in range(rng.randrange(0, 15)):
            rows.append((uid, rng.choice("abc"), rng.randrange(2), _d(day)))
            day += rng.randrange(1, 3)
    df = _obs(spark, rows)
    out = scd2_compress(df, ["uid"], ["attr", "extra"], "ts").collect()

    want = {}
    for uid, attr, extra, ts in sorted(rows, key=lambda r: (r[0], r[3])):
        hist = want.setdefault(uid, [])
        if not hist or (hist[-1][0], hist[-1][1]) != (attr, extra):
            hist.append([attr, extra, ts, None])
    for hist in want.values():
        for a, b in zip(hist, hist[1:]):
            a[3] = b[2]
    flat = {
        (uid, i + 1): tuple(v)
        for uid, hist in want.items()
        for i, v in enumerate(hist)
    }
    got = {
        (r.uid, r.version): (r.attr, r.extra, r.valid_from, r.valid_to)
        for r in out
    }
    assert got == flat


def test_scd2_single_sort_plan(spark):
    """The two observation windows and the groupBy share the (uid)
    partitioning and (ts) ordering — the plan must contain exactly one
    Exchange for the observation pass (plus one for the version
    window over far fewer rows)."""
    rows = [(i % 5, "a", 0, _d(1 + i % 9)) for i in range(50)]
    out = scd2_compress(_obs(spark, rows), ["uid"], ["attr"], "ts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def _cdc(spark, rows):
    return spark.createDataFrame(
        rows, "uid long, seq long, op string, val long"
    )


def test_apply_cdc_latest_wins_and_delete(spark):
    rows = [
        (1, 1, "U", 10),
        (1, 3, "U", 30),
        (1, 2, "U", 20),
        (2, 1, "U", 11),
        (2, 2, "D", 0),  # deleted
        (3, 2, "D", 0),
        (3, 5, "U", 55),  # resurrected after delete
    ]
    out = apply_cdc(_cdc(spark, rows), ["uid"], ["seq"], "op")
    got = {r.uid: (r.seq, r.val) for r in out.collect()}
    assert got == {1: (3, 30), 3: (5, 55)}
    assert "op" not in out.columns


def test_apply_cdc_is_aggregate_not_window(spark):
    out = apply_cdc(_cdc(spark, [(1, 1, "U", 1)]), ["uid"], ["seq"], "op")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "partial_max_by" in plan or "HashAggregate" in plan, plan


def test_apply_cdc_multi_seq_tiebreak(spark):
    rows = [(1, 5, "U", 1), (1, 5, "U", 2)]
    df = spark.createDataFrame(rows, "uid long, seq long, op string, sub long")
    out = apply_cdc(df, ["uid"], ["seq", "sub"], "op").collect()
    assert out[0].sub == 2


def test_apply_cdc_validates(spark):
    with pytest.raises(ValueError, match="seq_cols"):
        apply_cdc(_cdc(spark, [(1, 1, "U", 1)]), ["uid"], [], "op")
    with pytest.raises(ValueError, match="attr_cols"):
        scd2_compress(_cdc(spark, [(1, 1, "U", 1)]), ["uid"], [], "seq")


def test_point_in_time_join(spark):
    hist = scd2_compress(
        _obs(
            spark,
            [
                (1, "a", 0, _d(1)),
                (1, "b", 0, _d(5)),
                (2, "x", 0, _d(3)),
            ],
        ),
        ["uid"],
        ["attr"],
        "ts",
    )
    facts = spark.createDataFrame(
        [(1, _d(2)), (1, _d(5)), (1, _d(20)), (2, _d(1)), (9, _d(4))],
        "uid long, fts date",
    )
    out = scd2_point_in_time(hist, facts, ["uid"], "fts")
    got = {(r.uid, r.fts): r.attr for r in out.collect()}
    assert got[(1, _d(2))] == "a"
    assert got[(1, _d(5))] == "b"  # valid_from inclusive, valid_to exclusive
    assert got[(1, _d(20))] == "b"  # open version
    assert got[(2, _d(1))] is None  # before first version -> no match
    assert got[(9, _d(4))] is None  # unknown key kept (left join)
    # at most one version matches each fact
    assert out.count() == facts.count()


def test_apply_cdc_null_op_kept_not_dropped(spark):
    # a NULL winning op must not vanish silently (op != 'D' yields
    # NULL and would drop the key); null-safe filter keeps it
    rows = [(1, 1, "U", 10), (1, 2, None, 20), (2, 2, "D", 0)]
    out = apply_cdc(_cdc(spark, rows), ["uid"], ["seq"], "op")
    got = {r.uid: (r.seq, r.val) for r in out.collect()}
    assert got == {1: (2, 20)}
