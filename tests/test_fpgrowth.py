"""FP-Growth (operators/fpgrowth.py + mine_fpgrowth_itemsets, round
14 verdict item 2): the candidate-generation-free path must EQUAL the
A-Priori lanes level-by-level on the same frame (the literature's
correctness anchor — both compute exact supports, so any difference
is a bug in one of them), with no within-basket self-join in the
executed plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _fp_rows(spark, sf_dir, max_len=3):
    from spotify_etl_aws_spark.queries.lanes_layout import (
        MINE3_MINSUP_BP,
        _brand_basket_frame,
    )
    from spotify_etl_aws_spark.operators.fpgrowth import fpgrowth_itemsets

    b = _brand_basket_frame(spark, sf_dir)
    n = b.select("o").distinct().count()
    minsup = -(-MINE3_MINSUP_BP * n // 10000)
    return fpgrowth_itemsets(b, minsup, max_len=max_len).collect(), b, n


def test_equals_apriori_l2_l3_on_brand_domain(spark, sf_dir):
    """Size-2 slice == _triple_support's L2; size-3 slice == its L3 —
    same frame, same relative minsup, support-for-support."""
    from spotify_etl_aws_spark.queries.lanes_layout import _triple_support

    rows, b, n = _fp_rows(spark, sf_dir)
    sup3, sup2, _ = _triple_support(b, n)
    ap2 = {(r.a, r.b): r.pair_support for r in sup2.collect()}
    ap3 = {(r.a, r.b, r.c): r.support for r in sup3.collect()}
    fp2 = {
        tuple(r.itemset.split(",")): r.support for r in rows if r.size == 2
    }
    fp3 = {
        tuple(r.itemset.split(",")): r.support for r in rows if r.size == 3
    }
    assert fp2 == ap2 and len(fp2) > 0
    assert fp3 == ap3 and len(fp3) > 0


def test_equals_apriori_pairs_on_partkey_domain(spark, sf_dir):
    """The operator is domain-generic: on the UNCAPPED partkey basket
    frame with the pairs lane's absolute minsup, its size-2 slice
    equals mine_frequent_pairs' (part_a, part_b, support) set."""
    from spotify_etl_aws_spark.operators.fpgrowth import fpgrowth_itemsets
    from spotify_etl_aws_spark.queries.lanes_layout import (
        MINE_MINSUP,
        _basket_frame,
        _mine_pairs,
    )

    b = _basket_frame(spark, sf_dir)
    n = b.select("o").distinct().count()
    ap = {
        (r.part_a, r.part_b): r.support
        for r in _mine_pairs(b, n).collect()
    }
    fp = {
        tuple(int(x) for x in r.itemset.split(",")): r.support
        for r in fpgrowth_itemsets(
            b.select("o", F.col("p").alias("i")), MINE_MINSUP, max_len=2
        ).collect()
        if r.size == 2
    }
    # partkeys sort NUMERICALLY in the A-Priori join (p < p) but the
    # itemset string sorts lexicographically — normalize to frozensets
    assert {frozenset(k): v for k, v in fp.items()} == {
        frozenset(k): v for k, v in ap.items()
    }
    assert len(fp) > 0


def test_singletons_are_l1_counts(spark, sf_dir):
    rows, b, n = _fp_rows(spark, sf_dir)
    got = {r.itemset: r.support for r in rows if r.size == 1}
    want = {
        r.i: r.cnt
        for r in b.groupBy("i")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
        if r.cnt * 10000 >= 30 * n
    }
    assert got == want


def test_no_within_basket_self_join_in_plan(spark, sf_dir):
    """The point of the lane: no WITHIN-BASKET SELF-JOIN — an Inner
    join keyed o = o — anywhere in the executed plan. (The basket
    frame's own construction joins — lineitem x part and the valve
    semi-join — are input plumbing both families share.) The A-Priori
    triples lane is the positive control: the same pattern MUST match
    its plan, so the regex provably detects what it excludes."""
    import re

    from spotify_etl_aws_spark.queries.selection import (
        mine_fpgrowth_itemsets,
        mine_frequent_triples,
    )

    self_join = re.compile(r"Join(Exec)? \[o#\d+L?\], \[o#\d+L?\], Inner")
    plan = (
        mine_fpgrowth_itemsets(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert not self_join.search(plan), self_join.search(plan)
    assert "FlatMapGroupsInPandas" in plan
    control = (
        mine_frequent_triples(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert self_join.search(control), "control regex no longer matches"


def test_conditional_miner_exhaustive_small_case():
    """Hand-checkable ground truth: 4 transactions, minsup 2, all
    itemset sizes — the recursion must find exactly the bruteforce
    enumeration."""
    from itertools import combinations

    from spotify_etl_aws_spark.operators.fpgrowth import _mine_conditional

    txs = [
        ("a", "b", "c"),
        ("a", "b"),
        ("a", "c", "d"),
        ("b", "c"),
    ]
    # brute force over the 4-item universe
    want = {}
    for size in (1, 2, 3, 4):
        for combo in combinations("abcd", size):
            s = sum(1 for t in txs if set(combo) <= set(t))
            if s >= 2:
                want[combo] = s
    # drive the per-group mining exactly as fpgrowth_itemsets does:
    # ranks = lexicographic here (a=0..d=3), group g gets prefixes
    # ending at g
    rank = {c: i for i, c in enumerate("abcd")}
    item = {i: c for c, i in rank.items()}
    got = {}
    for g in range(4):
        base: dict[tuple[int, ...], int] = {}
        n_g = 0
        for t in txs:
            rs = tuple(sorted(rank[c] for c in t))
            if g in rs:
                n_g += 1
                pre = tuple(r for r in rs if r < g)
                if pre:
                    base[pre] = base.get(pre, 0) + 1
        if n_g == 0:
            continue
        found = [((g,), n_g)]
        if base:
            _mine_conditional(list(base.items()), 2, (g,), 4, found)
        for iset, sup in found:
            if sup >= 2:
                got[tuple(sorted(item[r] for r in iset))] = sup
    assert got == want


def test_empty_when_nothing_frequent(spark):
    from spotify_etl_aws_spark.operators.fpgrowth import fpgrowth_itemsets

    b = spark.createDataFrame(
        [(1, "x"), (2, "y")], "o long, i string"
    )
    assert fpgrowth_itemsets(b, 5).count() == 0
    with pytest.raises(ValueError, match="minsup"):
        fpgrowth_itemsets(b, 0)
