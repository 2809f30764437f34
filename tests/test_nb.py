"""Multinomial NB (operators/nb.py): exact parity with a dict-based
reference (counts, smoothing, priors, scores), argmax/tie semantics,
and plan shape (broadcast model, no cartesian on the scoring path).
"""

from __future__ import annotations

import math
from collections import Counter

import pytest

from spotify_etl_aws_spark.operators.nb import nb_classify, nb_train

DOCS = [
    (0, "the cat sat", "en"),
    (1, "the dog sat on the mat", "en"),
    (2, "le chat noir", "fr"),
    (3, "le chien et le chat", "fr"),
    (4, "the chat", "en"),
]


def _fit_ref(rows, alpha=1.0):
    cnt, tot, vocab, ndocs, nlab = {}, Counter(), set(), 0, Counter()
    for _, text, lab in rows:
        ndocs += 1
        nlab[lab] += 1
        for w in text.lower().split():
            cnt[(w, lab)] = cnt.get((w, lab), 0) + 1
            tot[lab] += 1
            vocab.add(w)
    v = len(vocab)
    logp = {
        (w, lab): math.log((cnt.get((w, lab), 0) + alpha) / (tot[lab] + alpha * v))
        for w in vocab
        for lab in tot
    }
    priors = {lab: math.log(n / ndocs) for lab, n in nlab.items()}
    return logp, priors, vocab


def test_train_matches_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, label string")
    token_logp, priors = nb_train(df)
    want_logp, want_priors, vocab = _fit_ref(DOCS)
    got = {(r.token, r.label): r.logp for r in token_logp.collect()}
    assert set(got) == set(want_logp)  # full vocab x class grid
    for k, v in want_logp.items():
        assert got[k] == pytest.approx(v, abs=1e-12), k
    gotp = {r.label: r.logprior for r in priors.collect()}
    assert gotp == pytest.approx(want_priors, abs=1e-12)


def test_classify_matches_reference_argmax(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, label string")
    token_logp, priors = nb_train(df)
    out = nb_classify(df, token_logp, priors).collect()
    want_logp, want_priors, vocab = _fit_ref(DOCS)
    got = {r.doc_id: (r.label, r.score) for r in out}
    for did, text, _ in DOCS:
        scores = {}
        for lab in want_priors:
            s = want_priors[lab]
            for w in text.lower().split():
                if w in vocab:
                    s += want_logp[(w, lab)]
            scores[lab] = s
        best = min(sorted(scores), key=lambda l: (-scores[l], l))
        assert got[did][0] == best, did
        assert got[did][1] == pytest.approx(scores[best], abs=1e-9)


def test_tie_breaks_to_smallest_label(spark):
    # perfectly symmetric classes -> identical scores; 'a' must win
    rows = [(0, "x", "a"), (1, "x", "b")]
    df = spark.createDataFrame(rows, "doc_id long, text string, label string")
    token_logp, priors = nb_train(df)
    out = {r.doc_id: r.label for r in nb_classify(df, token_logp, priors).collect()}
    assert out == {0: "a", 1: "a"}


def test_oov_and_empty_docs_absent(spark):
    train = spark.createDataFrame(
        [(0, "hello world", "en")], "doc_id long, text string, label string"
    )
    token_logp, priors = nb_train(train)
    score = spark.createDataFrame(
        [(10, "zzz qqq"), (11, ""), (12, "hello")],
        "doc_id long, text string",
    )
    out = nb_classify(score, token_logp, priors).collect()
    assert {r.doc_id for r in out} == {12}


def test_validates_alpha(spark):
    df = spark.createDataFrame([(0, "x", "a")], "doc_id long, text string, label string")
    with pytest.raises(ValueError, match="alpha"):
        nb_train(df, alpha=0.0)


def test_plan_broadcasts_model(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, label string")
    token_logp, priors = nb_train(df)
    out = nb_classify(df, token_logp, priors)
    out.count()  # materialize so the adaptive plan is final
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    # the only non-equi join allowed is the broadcast vocab x classes
    # grid (|classes|-row build side); never a CartesianProduct
    assert "CartesianProduct" not in plan, plan
