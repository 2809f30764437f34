"""Fellegi-Sunter record linkage (operators/linkage.py): hand-scored
planted pairs, blocking-pass union semantics (pair caught by both
passes scores once), threshold gate, validation errors, and the
no-cartesian plan pin."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from spotify_etl_aws_spark.operators.linkage import Comparator, fs_link


def _frames(spark):
    probe = spark.createDataFrame(
        [
            (1, "alice smith", "555-1234", 100),   # clean match to m1
            (2, "alicx smith", "555-9999", 105),   # name lev1, phone off
            (3, "zz nobody", "555-1234", 100),     # phone block, name off
            (4, "bob jones", "777-0000", 500),     # clean match to m4
        ],
        "pid long, name string, phone string, bal long",
    )
    master = spark.createDataFrame(
        [
            (1, "alice smith", "555-1234", 101),
            (4, "bob jones", "777-0000", 500),
            (9, "carol white", "888-1111", 42),
        ],
        "mid long, name string, phone string, bal long",
    )
    return probe, master


def _link(spark, threshold):
    probe, master = _frames(spark)
    comparators = [
        Comparator(
            "name",
            F.levenshtein(F.col("p_name"), F.col("m_name")) <= 1,
            40,
            -25,
        ),
        Comparator("phone", F.col("p_phone") == F.col("m_phone"), 30, -15),
        Comparator(
            "bal", F.abs(F.col("p_bal") - F.col("m_bal")) <= 10, 15, -10
        ),
    ]
    blocking = [
        # both passes hit for clean matches -> union must dedup
        (F.substring(F.col("p_name"), 1, 3), F.substring(F.col("m_name"), 1, 3)),
        (F.col("p_phone"), F.col("m_phone")),
    ]
    out = fs_link(
        probe, master, "pid", "mid",
        blocking=blocking, comparators=comparators, threshold=threshold,
    )
    return {(r.pid, r.mid): r.score for r in out.collect()}


def test_hand_scored_pairs(spark):
    got = _link(spark, threshold=45)
    # pid1-m1: 40+30+15 = 85; pid2-m1: 40-15+15 = 40 (below 45);
    # pid3-m1: -25+30+15 = 20; pid4-m4: 85
    assert got == {(1, 1): 85, (4, 4): 85}
    # lower threshold admits the name-agree/phone-off pair exactly once
    got40 = _link(spark, threshold=40)
    assert got40 == {(1, 1): 85, (4, 4): 85, (2, 1): 40}


def test_agree_flags(spark):
    probe, master = _frames(spark)
    out = fs_link(
        probe, master, "pid", "mid",
        blocking=[(F.col("p_phone"), F.col("m_phone"))],
        comparators=[
            Comparator("phone", F.col("p_phone") == F.col("m_phone"), 30, -15),
            Comparator(
                "name",
                F.levenshtein(F.col("p_name"), F.col("m_name")) <= 1,
                40,
                -25,
            ),
        ],
        threshold=0,
    ).collect()
    by_pair = {(r.pid, r.mid): (r.phone_agree, r.name_agree) for r in out}
    assert by_pair[(1, 1)] == (True, True)
    assert by_pair[(3, 1)] == (True, False)


def test_validation(spark):
    probe, master = _frames(spark)
    with pytest.raises(ValueError, match="blocking"):
        fs_link(probe, master, "pid", "mid", blocking=[],
                comparators=[Comparator("x", F.lit(True), 1, -1)],
                threshold=0)
    with pytest.raises(ValueError, match="comparator"):
        fs_link(probe, master, "pid", "mid",
                blocking=[(F.col("p_phone"), F.col("m_phone"))],
                comparators=[], threshold=0)


def test_plan_has_no_cartesian(spark):
    probe, master = _frames(spark)
    plan = (
        fs_link(
            probe, master, "pid", "mid",
            blocking=[
                (F.substring(F.col("p_name"), 1, 3),
                 F.substring(F.col("m_name"), 1, 3)),
                (F.col("p_phone"), F.col("m_phone")),
            ],
            comparators=[
                Comparator("phone", F.col("p_phone") == F.col("m_phone"),
                           30, -15)
            ],
            threshold=0,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
