"""Exact Jaccard join via prefix filtering
(operators/dedup.py:jaccard_join_prefix): completeness vs the
quadratic exact twin, boundary-exact thresholds, and the prefix's
immunity to hot corpus shingles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spotify_etl_aws_spark.operators.dedup import (
    jaccard_join_prefix,
    jaccard_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(df):
    return sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"]) for r in df.collect()
    )


WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda "
    "mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
).split()


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.7])
def test_matches_quadratic_exact_join(spark, threshold):
    """Every pair the inverted-index exact join finds, the prefix join
    finds — same pairs, same Jaccard values, at several thresholds."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(30):
        base = rng.sample(WORDS, 12)
        rows.append((i, " ".join(base)))
        if i % 3 == 0:  # planted near-dup: same text, small edit
            rows.append((100 + i, " ".join(base[:-1] + ["edited"])))
    docs = _docs(spark, rows)
    want = _pairs(jaccard_pairs(docs, threshold=threshold))
    got = _pairs(jaccard_join_prefix(docs, threshold=threshold))
    assert got == want
    assert got, "fixture must produce at least one qualifying pair"


def test_boundary_exact_jaccard_survives(spark):
    """A pair sitting EXACTLY at the threshold (J = 4 common / 10
    union = 0.4) must be returned — the fp-guard case for the
    ceil/size filters."""
    docs = _docs(
        spark,
        [
            (1, "c1 c2 c3 c4 c5 c6 x1 x2 x3"),  # 7 shingles, 4 shared
            (2, "c1 c2 c3 c4 c5 c6 y1 y2 y3"),
        ],
    )
    out = jaccard_join_prefix(docs, threshold=0.3)
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["jaccard"] == 0.4
    assert _pairs(out) == _pairs(jaccard_pairs(docs, threshold=0.3))
    # exact-threshold run: threshold == the pair's true Jaccard (0.4 is
    # the same double on both sides of the >= comparison)
    out_exact = jaccard_join_prefix(docs, threshold=0.4)
    assert len(out_exact.collect()) == 1, (
        "pair at J == threshold must not be pruned by fp rounding"
    )


def test_hot_shingle_never_in_prefix(spark):
    """A boilerplate shingle shared by EVERY document (the quadratic
    killer for the inverted-index join) stays out of the prefixes, so
    the candidate set stays linear: with 40 docs all sharing one hot
    trigram, the prefix join returns only the genuinely similar pair."""
    hot = "all rights reserved"
    rows = [
        (i, f"{hot} doc{i}a doc{i}b doc{i}c doc{i}d doc{i}e")
        for i in range(40)
    ]
    rows.append((100, rows[0][1] + " tail"))
    docs = _docs(spark, rows)
    got = _pairs(jaccard_join_prefix(docs, threshold=0.5))
    want = _pairs(jaccard_pairs(docs, threshold=0.5))
    assert got == want
    assert all(a == 0 and b == 100 for a, b, _ in got)


def test_validation(spark):
    docs = _docs(spark, [(1, "a b c d")])
    with pytest.raises(ValueError, match="threshold"):
        jaccard_join_prefix(docs, threshold=0.0)
    with pytest.raises(ValueError, match="threshold"):
        jaccard_join_prefix(docs, threshold=1.5)


def test_plan_no_cartesian_or_nested_loop(spark):
    """Candidates come from a shingle-keyed equi-join; nothing in the
    pipeline may degrade to a cartesian/nested-loop product."""
    docs = _docs(spark, [(i, f"a{i} b{i} c{i} d{i} e{i}") for i in range(10)])
    plan = (
        jaccard_join_prefix(docs, threshold=0.5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
