"""Decorrelation plan pins for the correlated-subquery SQL lanes
(``queries/subqueries.py``). The oracle suite proves the VALUES; these
prove the PLANS decorrelated — every subquery must become a hash/sort
join, never a per-row re-execution, nested loop, or cartesian fallback
(the difference between a 100 TB plan and a non-terminating one).
"""

from __future__ import annotations

import pytest

from spotify_etl_aws_spark.queries import all_queries

QUERIES = all_queries()

SUBQUERY_LANES = [
    "sql_q17_avg_yearly",
    "sql_q18_large_orders",
    "sql_q22_big_spender_gap",
    "sql_q2_min_cost_supplier",
    "sql_q21_waiting_suppliers",
]


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", SUBQUERY_LANES)
def test_decorrelated_no_nested_loop(spark, sf_dir, name):
    """No cartesian products and no nested-loop joins anywhere in the
    executed plan: the correlated predicates must ride hash joins."""
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


@pytest.mark.parametrize(
    "name,join_kw",
    [
        # Q18's IN (GROUP BY...) becomes a left-semi join against the
        # PRE-AGGREGATED order list; Q22's NOT EXISTS an anti join.
        ("sql_q18_large_orders", "LeftSemi"),
        ("sql_q22_big_spender_gap", "LeftAnti"),
        ("sql_q21_waiting_suppliers", "LeftAnti"),
    ],
)
def test_subquery_becomes_semi_or_anti_join(spark, sf_dir, name, join_kw):
    plan = _plan(spark, sf_dir, name)
    assert join_kw in plan, f"{name}: expected a {join_kw} join\n{plan}"


@pytest.mark.parametrize("name", ["sql_q17_avg_yearly", "sql_q2_min_cost_supplier"])
def test_scalar_agg_subquery_is_aggregated_join(spark, sf_dir, name):
    """The correlated scalar agg must appear as an Aggregate feeding a
    join on the correlation key — i.e. computed once per key, not once
    per outer row."""
    plan = _plan(spark, sf_dir, name)
    assert "HashAggregate" in plan, name
    assert "Join" in plan, name


def test_q18_semi_join_aggregates_before_join(spark, sf_dir):
    """The HAVING list must be aggregated BEFORE the semi-join: at
    TPC-H scale the aggregated order list is ~4 orders of magnitude
    smaller than lineitem, so aggregate-then-join vs join-then-filter
    is the difference between a narrow build side and a full shuffle."""
    plan = _plan(spark, sf_dir, "sql_q18_large_orders")
    semi_pos = plan.find("LeftSemi")
    assert semi_pos != -1
    # at least one HashAggregate must occur in the subtree printed
    # after the semi-join node (Spark prints children below parents)
    assert "HashAggregate" in plan[semi_pos:], plan[:2000]


@pytest.mark.parametrize("name", SUBQUERY_LANES)
def test_nonempty_at_smallest_sf(spark, name):
    """Parameter choices were probed to stay nonempty at every SF —
    an empty result would hash-match trivially and verify nothing."""
    df = QUERIES[name](spark, "/root/testdata/sf0.001")
    assert df.count() > 0, name


def test_recursive_rollup_bounds_recursion_guard(spark):
    """The recursion limit must be sized to the workload (12 rows per
    part), NOT blanket-raised to 2^30 — a later runaway recursive
    query on the shared session must still hit a real guard."""
    df = QUERIES["sql_recursive_subtree_rollup"](
        spark, "/root/testdata/sf0.001"
    )
    assert df.count() > 0
    limit = int(spark.conf.get("spark.sql.cteRecursionRowLimit"))
    assert limit <= 16_000_000, limit
