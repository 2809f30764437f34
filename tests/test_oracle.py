"""The local mirror of the driver's correctness gate: every declared
query with an oracle must match DuckDB exactly; oracle-less queries
must at least run and return a stable schema."""

from __future__ import annotations

import pytest

from spotify_etl_aws_spark.queries import all_oracles, all_queries

from .conftest import assert_df_matches_oracle

QUERIES = all_queries()
ORACLES = all_oracles()


def test_every_oracle_key_has_a_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle entries without queries: {missing}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(name, spark, sf_dir, oracle_con):
    df = QUERIES[name](spark, sf_dir)
    assert_df_matches_oracle(df, oracle_con, ORACLES[name], name=name)


def test_every_query_has_an_oracle():
    """The correctness contract is POSITIVE: every declared query
    carries a DuckDB oracle (50/50 since round 5 — the rows-only
    weaker check is retired). A new query without an oracle fails
    here instead of silently downgrading to a rows-only check."""
    missing = set(QUERIES) - set(ORACLES)
    assert not missing, f"queries without oracles: {sorted(missing)}"
