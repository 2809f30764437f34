"""Exact-phrase containment search (decon_phrase_matches): the
self-recall witness, occurrence exactness against a Python re-scan,
and the broadcast exchange-free plan shape."""

from __future__ import annotations

import re

import pytest

from spotify_etl_aws_spark.queries.selection import (
    PHRASE_EVERY,
    PHRASE_N,
    decon_phrase_matches,
)
from spotify_etl_aws_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return {
        r.doc_id: re.split(r"\s+", r.text.lower())
        for r in load_table(spark, sf_dir, "documents").collect()
    }


@pytest.fixture(scope="module")
def matches(spark, sf_dir):
    return decon_phrase_matches(spark, sf_dir).collect()


def test_every_probe_hits_its_source(docs, matches):
    """Each probe phrase comes from a real doc, so (phrase_id,
    phrase_id, 1) must be in the output — recall cannot silently
    degrade."""
    probes = {
        d for d, toks in docs.items()
        if d % PHRASE_EVERY == 0 and len(toks) >= PHRASE_N
    }
    assert probes  # the fixture must actually exercise the lane
    got = {(r.phrase_id, r.doc_id, r.pos) for r in matches}
    for d in probes:
        assert (d, d, 1) in got


def test_matches_are_exact_and_complete(docs, matches):
    """Every reported (phrase_id, doc_id, pos) is a true occurrence,
    and a brute-force Python scan finds nothing more."""
    probes = {
        d: docs[d][:PHRASE_N]
        for d in docs
        if d % PHRASE_EVERY == 0 and len(docs[d]) >= PHRASE_N
    }
    want = set()
    for pid, phrase in probes.items():
        for doc_id, toks in docs.items():
            for i in range(len(toks) - PHRASE_N + 1):
                if toks[i : i + PHRASE_N] == phrase:
                    want.add((pid, doc_id, i + 1))
    got = {(r.phrase_id, r.doc_id, r.pos) for r in matches}
    assert got == want


def test_plan_is_broadcast_exchange_free(spark, sf_dir):
    """The probe side broadcasts; the corpus side is one map-side
    posexplode — no shuffle exchange anywhere in the plan."""
    plan = (
        decon_phrase_matches(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    for bad in ("SortMergeJoin", "CartesianProduct", "BatchEvalPython"):
        assert bad not in plan
