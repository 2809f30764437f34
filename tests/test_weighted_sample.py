"""Efraimidis–Spirakis weighted sampling (operators/splits.py):
portable-key parity with a Python reference, weight-proportional
inclusion across salts, determinism, loud weight validation, and the
heap-based (no global window) plan."""

from __future__ import annotations

import hashlib
import math

import pytest

from spotify_etl_aws_spark.operators.splits import (
    ES_DENOM,
    sample_weighted_topk,
)


def _ref_key(salt: str, did: int, w: float) -> float:
    h = int(hashlib.md5(f"{salt}:{did}".encode()).hexdigest()[:15], 16)
    return math.log((h + 0.5) / ES_DENOM) / w


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, w long")


def test_matches_python_reference(spark):
    rows = [(i, 10 + (i * 7) % 90) for i in range(200)]
    out = sample_weighted_topk(
        _df(spark, rows), 25, "w", salt="s1"
    ).collect()
    keys = {did: _ref_key("s1", did, w) for did, w in rows}
    want = sorted(keys, key=lambda d: (-keys[d], d))[:25]
    assert [r.doc_id for r in out] != []
    assert {r.doc_id for r in out} == set(want)
    for r in out:
        assert r.es_key == pytest.approx(keys[r.doc_id], abs=1e-12)


def test_weight_proportional_inclusion(spark):
    """A single item carrying half the total weight must be sampled
    in (nearly) every draw across many salts; a minimum-weight item
    must appear in only a few."""
    rows = [(0, 5000)] + [(i, 10) for i in range(1, 500)]
    df = _df(spark, rows)
    heavy = light = 0
    for s in range(30):
        got = {
            r.doc_id
            for r in sample_weighted_topk(df, 50, "w", salt=f"t{s}").collect()
        }
        assert len(got) == 50
        heavy += 0 in got
        light += 1 in got
    assert heavy >= 29, heavy  # P(include) ~ 1 for half the mass
    assert light <= 15, light  # ~k/n-ish odds for a tail item


def test_deterministic_and_salt_sensitive(spark):
    rows = [(i, 1 + i % 9) for i in range(100)]
    a = {r.doc_id for r in sample_weighted_topk(_df(spark, rows), 10, "w").collect()}
    b = {r.doc_id for r in sample_weighted_topk(_df(spark, rows), 10, "w").collect()}
    c = {r.doc_id for r in sample_weighted_topk(_df(spark, rows), 10, "w", salt="other").collect()}
    assert a == b
    assert a != c


def test_validates_weights_and_k(spark):
    with pytest.raises(ValueError, match="k must"):
        sample_weighted_topk(_df(spark, [(1, 1)]), 0, "w")
    with pytest.raises(ValueError, match="positive"):
        sample_weighted_topk(_df(spark, [(1, 0)]), 1, "w")
    with pytest.raises(ValueError, match="positive"):
        sample_weighted_topk(_df(spark, [(1, None)]), 1, "w")


def test_heap_plan_no_global_window(spark):
    out = sample_weighted_topk(_df(spark, [(i, 1 + i) for i in range(50)]), 5, "w")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan, plan
