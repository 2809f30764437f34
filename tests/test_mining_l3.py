"""A-Priori L3 (round 13, verdict item 7): semantics + the plan pin
that the triple enumeration rides the L2-SURVIVOR semi-joins (the
anti-monotonic prune), not an unpruned three-way self-join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_etl_aws_spark.queries.lanes_layout import (
    MINE3_MINSUP_BP,
    _brand_basket_frame,
    mine_frequent_triples,
    mine_triple_rules,
)

SF_DIR = "/root/testdata/sf0.001"


def test_triples_subset_frequency(spark):
    """Anti-monotonicity, checked on real output: every frequent
    triple's three faces appear as frequent pairs (support >= the
    triple's), and its support clears the relative minsup."""
    tr = mine_frequent_triples(spark, SF_DIR).collect()
    assert len(tr) > 0
    b = _brand_basket_frame(spark, SF_DIR)
    n = b.select("o").distinct().count()
    pair_sup = {
        (r["a"], r["b"]): r["s"]
        for r in (
            b.alias("x")
            .join(
                b.alias("y"),
                (F.col("x.o") == F.col("y.o"))
                & (F.col("x.i") < F.col("y.i")),
            )
            .select(
                F.col("x.i").alias("a"), F.col("y.i").alias("b")
            )
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("s"))
            .collect()
        )
    }
    for r in tr:
        a, bb, c, s = r["brand_a"], r["brand_b"], r["brand_c"], r["support"]
        assert s * 10000 >= MINE3_MINSUP_BP * n
        for face in ((a, bb), (a, c), (bb, c)):
            assert pair_sup[face] >= s, (face, s)


def test_rules_confidence_and_direction_count(spark):
    tr = mine_frequent_triples(spark, SF_DIR)
    rules = mine_triple_rules(spark, SF_DIR)
    n_triples = tr.count()
    rows = rules.collect()
    assert len(rows) == 3 * n_triples  # every {x,y} -> z direction
    for r in rows:
        assert 0.0 < r["confidence"] <= 1.0
        assert r["lift"] > 0.0


def test_triple_plan_has_l2_survivor_semijoins(spark):
    """The prune pin: the executed plan must contain the broadcast
    LeftSemi joins against the L2 survivor set (>= 3: the occ2 gate
    plus the two new-face gates), and no cartesian product."""
    df = mine_frequent_triples(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    semi = plan.count("LeftSemi")
    # 3 L2-survivor gates (the occ2 gate plus the two new-face gates);
    # the valve keep + L1 prefilter semis moved behind the pair_occ
    # localCheckpoint reuse boundary (r14: the basket self-join feeds
    # three consumers, so it materializes once) and show up as the
    # reused ExistingRDD scans below instead of inline LeftSemi nodes
    assert semi >= 3, f"expected >=3 semi-joins in plan, got {semi}"
    assert "BroadcastHashJoin" in plan  # survivor sets broadcast
    # the checkpointed pair-occurrence frame is scanned (not re-joined)
    # by at least the sup2 lineage and the occ2 probe side
    assert plan.count("Scan ExistingRDD") >= 2, plan
