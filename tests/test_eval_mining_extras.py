"""Round-13 extras: PQ recall@k consistency with its two source
rankings, and CHARM closed-pair semantics on the multi-level
brand/line item domain (closure must be NON-vacuous: the hierarchy
makes most pairs not-closed, and every not-closed pair must have an
equal-support witness triple).
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_pq_recall_consistent_with_rankings(spark):
    from spotify_etl_aws_spark.queries.lanes_vector_select import (
        vector_pq_adc_topk,
        vector_pq_recall,
    )
    from spotify_etl_aws_spark.queries.vector import (
        TOPK,
        vector_cosine_topk,
    )

    row = vector_pq_recall(spark, SF_DIR).collect()[0]
    ex = {
        r.vec_id
        for r in vector_cosine_topk(spark, SF_DIR)
        .filter(F.col("method") == "exact")
        .collect()
    }
    adc = {r.vec_id for r in vector_pq_adc_topk(spark, SF_DIR).collect()}
    assert row["k"] == TOPK == len(ex)
    assert row["n_hits"] == len(ex & adc)
    assert row["recall"] == row["n_hits"] / TOPK
    assert 0.0 < row["recall"] <= 1.0  # m-byte codes keep real signal


def test_closed_pairs_hierarchy_semantics(spark):
    from spotify_etl_aws_spark.queries.lanes_layout import (
        _multilevel_basket_frame,
        mine_closed_pairs,
    )

    rows = mine_closed_pairs(spark, SF_DIR).collect()
    by_flag = {True: 0, False: 0}
    for r in rows:
        by_flag[r["closed"]] += 1
    # NON-vacuous both ways: the hierarchy forces redundancy (most
    # pairs extend with an implied line at equal support) while some
    # pairs survive as closed
    assert by_flag[True] > 0 and by_flag[False] > 0
    assert by_flag[False] > by_flag[True]  # hierarchies are redundant

    # every brand pair from DIFFERENT lines is not-closed: both
    # implied lines are equal-support extensions
    for r in rows:
        a, b = r["item_a"], r["item_b"]
        if a.startswith("Brand#") and b.startswith("Brand#"):
            if a[6] != b[6]:  # different prefix families
                assert not r["closed"], (a, b)

    # witness check: each not-closed pair has a same-support superset
    # in the basket frame (recomputed independently)
    b = _multilevel_basket_frame(spark, SF_DIR)
    baskets = {}
    for row2 in b.collect():
        baskets.setdefault(row2["o"], set()).add(row2["i"])
    import itertools

    not_closed = [r for r in rows if not r["closed"]][:20]
    for r in not_closed:
        pair = {r["item_a"], r["item_b"]}
        holders = [items for items in baskets.values() if pair <= items]
        assert len(holders) == r["support"]
        common = set.intersection(*holders) - pair
        assert common, (pair, "no equal-support extension found")


def test_rule_interest_independence_anchor(spark):
    """Srikant & Agrawal R-interest: under independence within a
    line, a brand pair's support matches the ancestor-expected value
    and the ratio concentrates near 1.0 — assert the measure is
    well-formed (positive, finite) and actually centered (median
    within [0.5, 2.0]) rather than degenerate, and that ancestors are
    genuine line-level pairs with support >= the brand pair's."""
    from spotify_etl_aws_spark.queries.lanes_layout import (
        mine_rule_interest,
    )

    rows = mine_rule_interest(spark, SF_DIR).collect()
    assert rows
    vals = sorted(r["interest"] for r in rows)
    assert all(v > 0 and v == v for v in vals)
    med = vals[len(vals) // 2]
    assert 0.5 <= med <= 2.0
    for r in rows:
        assert r["anc_a"].startswith("Line#")
        assert r["anc_b"].startswith("Line#")
        assert r["anc_support"] >= r["support"]  # ancestor dominates
        assert r["item_a"][6] != r["item_b"][6]  # cross-line only
