"""Snapshot diff (operators/diff.py): status classification, null-safe
comparison, changed-column lists, default compare-column inference,
and the single-shuffle plan shape."""

from __future__ import annotations

import pytest

from spotify_etl_aws_spark.operators.diff import snapshot_diff


def _old(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10),
            (2, "b", 20),
            (3, "c", None),
            (4, "d", 40),
            (5, None, 50),
        ],
        "k long, s string, v long",
    )


def _new(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10),      # unchanged
            (2, "B", 20),      # s changed
            (3, "c", 30),      # v NULL -> 30 (null-safe change)
            (5, None, 50),     # unchanged (NULL == NULL null-safely)
            (6, "f", 60),      # added
        ],                      # 4 removed
        "k long, s string, v long",
    )


def test_statuses_and_changed_cols(spark):
    out = snapshot_diff(_old(spark), _new(spark), ["k"]).collect()
    got = {r.k: (r.diff_status, r.changed_cols) for r in out}
    assert got == {
        1: ("unchanged", ""),
        2: ("changed", "s"),
        3: ("changed", "v"),
        4: ("removed", ""),
        5: ("unchanged", ""),
        6: ("added", ""),
    }
    vals = {r.k: (r.s_old, r.s_new, r.v_old, r.v_new) for r in out}
    assert vals[2] == ("b", "B", 20, 20)
    assert vals[6] == (None, "f", None, 60)


def test_multi_column_change_order(spark):
    old = spark.createDataFrame([(1, "a", 1)], "k long, s string, v long")
    new = spark.createDataFrame([(1, "z", 9)], "k long, s string, v long")
    out = snapshot_diff(old, new, ["k"], compare_cols=["s", "v"]).collect()
    assert out[0].changed_cols == "s,v"  # declaration order
    out2 = snapshot_diff(old, new, ["k"], compare_cols=["v", "s"]).collect()
    assert out2[0].changed_cols == "v,s"


def test_validates_empty_compare(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="compare"):
        snapshot_diff(df, df, ["k"])


def test_single_join_plan(spark):
    out = snapshot_diff(_old(spark), _new(spark), ["k"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Join") <= 1 or "SortMergeJoin" in plan, plan
    assert "Cartesian" not in plan and "NestedLoop" not in plan, plan
