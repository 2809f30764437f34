"""In-engine quality classifier (operators/classifier.py): separable
synthetic corpora converge, scoring orders held-out docs correctly,
determinism, and the gate wiring."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spotify_etl_aws_spark.operators.classifier import (
    LinearQualityModel,
    _featurize,
    classifier_gate,
    score_quality,
    train_quality_classifier,
)

GOOD_WORDS = (
    "the engine compacts sorted immutable files while readers continue "
    "to see a consistent snapshot of committed state"
).split()
SPAM_WORDS = (
    "click buy cheap winner prize casino bonus free offer deal urgent "
    "limited guarantee cash"
).split()


def _docs(spark, words, n, seed, label_from):
    rng = np.random.default_rng(seed)
    rows = [
        (
            label_from + i,
            " ".join(rng.choice(words, size=20)),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_train_separable_and_score_holdout(spark):
    pos = _docs(spark, GOOD_WORDS, 60, 1, 0)
    neg = _docs(spark, SPAM_WORDS, 60, 2, 1000)
    model = train_quality_classifier(pos, neg, dim=64, iters=30)
    assert isinstance(model, LinearQualityModel)
    # held-out docs from the same distributions
    hold_pos = _docs(spark, GOOD_WORDS, 20, 3, 2000)
    hold_neg = _docs(spark, SPAM_WORDS, 20, 4, 3000)
    scored = score_quality(model, hold_pos.unionByName(hold_neg))
    got = {r.doc_id: r.quality_prob for r in scored.collect()}
    pos_scores = [got[i] for i in range(2000, 2020)]
    neg_scores = [got[i] for i in range(3000, 3020)]
    assert min(pos_scores) > max(neg_scores)
    assert np.mean(pos_scores) > 0.8 and np.mean(neg_scores) < 0.2
    kept = classifier_gate(scored, 0.5).select("doc_id").collect()
    assert {r.doc_id for r in kept} == set(range(2000, 2020))


def test_training_is_deterministic(spark):
    pos = _docs(spark, GOOD_WORDS, 30, 5, 0)
    neg = _docs(spark, SPAM_WORDS, 30, 6, 500)
    m1 = train_quality_classifier(pos, neg, dim=32, iters=10)
    m2 = train_quality_classifier(pos, neg, dim=32, iters=10)
    assert m1 == m2


def test_featurizer_contract():
    v = _featurize("alpha beta alpha", 16, 1)
    assert v.shape == (16,)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-12
    assert np.array_equal(v, _featurize("ALPHA beta Alpha", 16, 1))
    assert np.linalg.norm(_featurize("", 16, 1)) == 0.0
    assert np.linalg.norm(_featurize(None, 16, 1)) == 0.0
    # repeated term scales its bucket pre-norm: direction is unchanged,
    # distinct content is not
    a = _featurize("zap", 16, 1)
    b = _featurize("zap zap", 16, 1)
    assert np.allclose(a, b)
    assert not np.allclose(a, _featurize("zip", 16, 1))


def test_shingle_features_see_order(spark):
    pos = _docs(spark, GOOD_WORDS, 20, 7, 0)
    neg = _docs(spark, SPAM_WORDS, 20, 8, 100)
    m = train_quality_classifier(pos, neg, dim=64, shingle_n=2, iters=10)
    assert m.shingle_n == 2
    assert not np.allclose(
        _featurize("a b c", 64, 2), _featurize("c b a", 64, 2)
    )


def test_null_text_scores_null_and_drops(spark):
    model = LinearQualityModel(8, 1, 0.0, tuple([0.1] * 8))
    docs = spark.createDataFrame(
        [(1, "some words"), (2, None)], "doc_id bigint, text string"
    )
    scored = score_quality(model, docs)
    rows = {r.doc_id: r.quality_prob for r in scored.collect()}
    assert rows[2] is None and rows[1] is not None
    assert {r.doc_id for r in classifier_gate(scored, 0.0).collect()} == {1}


def test_empty_training_set_raises(spark):
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    with pytest.raises(Exception, match="no training documents"):
        train_quality_classifier(empty, empty, dim=8, iters=1)
