"""Round-13 guards: the mining family's widened integer products NULL
loudly at near-wrap magnitudes instead of silently wrapping (round-12
verdict item 1 — the OLS decimal(38,0) overflow class), and the
pseudonymization token is genuinely KEYED (round-12 verdict item 2:
different keys must produce unrelated token sets).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _lift_expr():
    """The exact widened product/division shape of
    lanes_layout._mine_pairs' lift column."""
    return (
        F.col("support").cast("decimal(19,0)")
        * F.col("n").cast("decimal(19,0)")
    ).cast("double") / (
        F.col("ca").cast("decimal(19,0)") * F.col("cb").cast("decimal(19,0)")
    ).cast("double")


def _pair_mass_expr():
    """The exact widened product shape of mine_basket_census."""
    tri = F.expr("basket_items * (basket_items - 1) div 2").cast(
        "decimal(19,0)"
    )
    # try_cast: the plain non-ANSI decimal->long cast CLAMPS to
    # Long.MIN on overflow — still silent; try_cast NULLs
    return (tri * F.col("n_baskets").cast("decimal(19,0)")).try_cast("long")


def test_pair_mass_nulls_loudly_past_int64(spark):
    # triangle(2^21) * 2^43 baskets ~= 2^84 — far past int64; the old
    # int64/double pipeline would WRAP or silently lose precision, the
    # decimal product NULLs at the final long cast
    df = spark.createDataFrame(
        [(1 << 21, 1 << 43), (4, 10)], "basket_items long, n_baskets long"
    )
    rows = {
        r["basket_items"]: r["mass"]
        for r in df.select(
            "basket_items", _pair_mass_expr().alias("mass")
        ).collect()
    }
    assert rows[1 << 21] is None  # loud NULL, not a wrapped integer
    assert rows[4] == 6 * 10  # small values untouched


def test_pair_mass_exact_past_double_53bits(spark):
    # tri * n = 3 * (2^60+1): representable in int64 but NOT in a
    # double (> 2^53 and odd) — the old double-route pipeline rounds
    # it, the decimal route is exact
    n = (1 << 60) + 1
    df = spark.createDataFrame(
        [(3, n)], "basket_items long, n_baskets long"
    )
    got = df.select(_pair_mass_expr().alias("mass")).collect()[0]["mass"]
    assert got == 3 * n


def test_lift_products_exact_past_int64(spark):
    # support * n = 2^62 * 4 = 2^64 — int64 wraps to 0; the decimal
    # product is exact and converts to the true double
    df = spark.createDataFrame(
        [(1 << 62, 4, 1 << 31, 1 << 31)],
        "support long, n long, ca long, cb long",
    )
    got = df.select(_lift_expr().alias("lift")).collect()[0]["lift"]
    assert got == float(1 << 64) / float(1 << 62)  # = 4.0, not 0.0


def test_lift_matches_lane_expression_source():
    # pin that the lane actually uses the widened form (guard against
    # a refactor quietly restoring the int64 product)
    import inspect

    from spotify_etl_aws_spark.queries import lanes_layout

    src = inspect.getsource(lanes_layout._mine_pairs)
    assert 'cast("decimal(19,0)")' in src
    census = inspect.getsource(lanes_layout.mine_basket_census)
    assert 'cast("decimal(19,0)")' in census
    assert 'try_cast("long")' in census
    for name in (
        "ORACLE_FREQ_PAIRS",
        "ORACLE_FREQ_PAIRS_CAPPED",
        "ORACLE_ASSOC_RULES",
    ):
        assert "HUGEINT" in getattr(lanes_layout, name)


def test_pseudonymize_token_is_keyed(spark):
    from spotify_etl_aws_spark.queries.lanes_linkage import _pseudo_token

    df = spark.createDataFrame(
        [("Customer#000000001",), ("Customer#000000002",)], "name string"
    )
    a = {
        r["t"]
        for r in df.select(_pseudo_token("name", "key-a").alias("t")).collect()
    }
    b = {
        r["t"]
        for r in df.select(_pseudo_token("name", "key-b").alias("t")).collect()
    }
    # without the key, tokens cannot be regenerated: the two keys'
    # token sets are disjoint, and each key is deterministic
    assert a.isdisjoint(b)
    a2 = {
        r["t"]
        for r in df.select(_pseudo_token("name", "key-a").alias("t")).collect()
    }
    assert a == a2
    assert all(t.startswith("u-") and len(t) == 2 + 16 for t in a)
