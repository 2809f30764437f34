"""Driver-contract guards for the bench harness: every headline name
must resolve to a declared query (a rename would otherwise surface only
as a null timing in the driver's BENCH json), and the oracle side used
by tools/duckbench.py must cover the headline set."""

from __future__ import annotations

from bench import HEADLINE
from spotify_etl_aws_spark.queries import all_oracles, all_queries


def test_headline_names_resolve_to_declared_queries():
    qs = all_queries()
    missing = [n for n in HEADLINE if n not in qs]
    assert not missing, f"bench HEADLINE references unknown queries: {missing}"


def test_headline_queries_have_oracles_for_duckbench():
    oracles = all_oracles()
    missing = [n for n in HEADLINE if n not in oracles]
    assert not missing, (
        "tools/duckbench.py would skip these headline queries "
        f"(no oracle): {missing}"
    )


def test_headline_is_unique_and_nonempty():
    assert len(HEADLINE) == len(set(HEADLINE)) >= 10
