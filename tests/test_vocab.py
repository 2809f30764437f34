"""Vocabulary-statistics operators (operators/vocab.py): pair counts
match a driver-side reference, edge cases, and the plan shape."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from spotify_etl_aws_spark.operators.vocab import (
    BPE_PRETOKEN_RE,
    bpe_pair_counts,
    token_frequencies,
)
from spotify_etl_aws_spark.sources.readers import load_table


def _ref_pairs(texts: list[str]) -> Counter:
    c: Counter = Counter()
    for t in texts:
        toks = re.findall(BPE_PRETOKEN_RE, t.lower())
        c.update(zip(toks, toks[1:]))
    return c


def test_pair_counts_match_reference(spark):
    texts = [
        "the cat sat on the mat",
        "the cat ran. the cat sat!",
        "a1b2 c3",  # digit/letter/punct run splitting
        "solo",  # single token -> no pairs
        "",  # empty -> no pairs
    ]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string")
    got = {
        (r.left, r.right): r.n_pairs for r in bpe_pair_counts(docs).collect()
    }
    assert got == dict(_ref_pairs(texts))


def test_top_k_cut_is_deterministic(spark):
    docs = spark.createDataFrame(
        [(0, "x y x y z w z w a b")], "doc_id bigint, text string"
    )
    top = bpe_pair_counts(docs, top_k=3).collect()
    assert len(top) == 3
    ns = [r.n_pairs for r in top]
    assert ns == sorted(ns, reverse=True)
    again = bpe_pair_counts(docs, top_k=3).collect()
    assert [tuple(r) for r in top] == [tuple(r) for r in again]


def test_token_frequencies_on_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("text").limit(200)
    freq = token_frequencies(docs, min_count=2)
    rows = freq.collect()
    assert rows, "fixture produced no repeated tokens — vacuous"
    assert all(r.n_occurrences >= 2 and r.n_docs >= 1 for r in rows)
    assert all(r.n_docs <= r.n_occurrences for r in rows)


def test_token_frequencies_exact_n_docs(spark):
    """A token repeating WITHIN one doc must count that doc once.

    Regression: monotonically_increasing_id() placed in the same select
    as explode() was evaluated above the Generate, so every exploded row
    got a fresh doc id and n_docs silently equalled n_occurrences."""
    docs = spark.createDataFrame(
        [
            (0, "the cat and the dog and the bird"),  # 'the' x3, 'and' x2
            (1, "the end"),
            (2, "no articles here"),
        ],
        "doc_id bigint, text string",
    )
    got = {r.token: (r.n_occurrences, r.n_docs) for r in token_frequencies(docs).collect()}
    assert got["the"] == (4, 2)
    assert got["and"] == (2, 1)
    assert got["cat"] == (1, 1)


def test_pair_counts_plan_shape(spark, sf_dir):
    """No UDFs anywhere; counting partial-aggregates map-side before
    its exchange."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    plan = (
        bpe_pair_counts(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan  # pure JVM lane
    assert "partial_count" in plan
