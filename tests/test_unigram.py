"""Unigram-LM tokenizer (operators/unigram.py): Viterbi semantics on a
hand-built model, hard-EM likelihood monotonicity, coverage, pruning,
determinism, and the map-side-only encode plan."""

from __future__ import annotations

import math
import re

import pytest

from spotify_etl_aws_spark.operators.bpe import word_frequencies
from spotify_etl_aws_spark.operators.unigram import (
    UnigramModel,
    _viterbi,
    _word_ll,
    encode_unigram,
    train_unigram,
)
from spotify_etl_aws_spark.operators.vocab import BPE_PRETOKEN_RE

CORPUS = [
    "international internal internet interval",
    "internal international internet internet",
    "the interval in the internet",
    "nation national nationality international",
]


def test_viterbi_hand_model():
    logp = {
        "ab": math.log(0.4),
        "c": math.log(0.1),
        "a": math.log(0.2),
        "bc": math.log(0.3),
    }
    # p(a)*p(bc) = 0.06 > p(ab)*p(c) = 0.04
    assert _viterbi("abc", logp, 2) == ["a", "bc"]
    # flip the odds
    logp["bc"] = math.log(0.05)  # p(a)p(bc)=0.01 < p(ab)p(c)=0.04
    assert _viterbi("abc", logp, 2) == ["ab", "c"]
    # unknown chars fall back, never dead-end
    assert _viterbi("axc", {"a": math.log(0.5), "c": math.log(0.5)}, 2) == [
        "a", "x", "c",
    ]
    # _word_ll agrees with the score of the returned path
    seg = _viterbi("abc", logp, 2)
    assert _word_ll("abc", logp, 2) == pytest.approx(
        sum(logp[p] for p in seg)
    )


def test_hard_em_likelihood_nondecreasing(spark):
    """Each extra EM iteration must not lower corpus Viterbi
    log-likelihood — the defining property of the re-estimation
    step."""
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    wf = word_frequencies(df)
    lls = []
    for iters in range(4):
        m = train_unigram(df, vocab_size=60, em_iters=iters, seed_size=500)
        lls.append(
            sum(n * _word_ll(w, m.log_probs, m.max_piece_len) for w, n in wf)
        )
    for a, b in zip(lls, lls[1:]):
        assert b >= a - 1e-9


def test_training_learns_frequent_pieces(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    m = train_unigram(df, vocab_size=80, seed_size=2000)
    # the dominant morpheme is in the vocab as one piece
    assert "intern" in m.log_probs or "inter" in m.log_probs
    # probabilities normalize
    assert sum(math.exp(p) for p in m.log_probs.values()) == pytest.approx(1.0)
    # every single char of the corpus is covered
    chars = {c for t in CORPUS for w in re.findall(BPE_PRETOKEN_RE, t.lower()) for c in w}
    assert chars <= set(m.log_probs)
    # determinism under repartition
    m2 = train_unigram(df.repartition(7), vocab_size=80, seed_size=2000)
    assert m2.log_probs == m.log_probs


def test_vocab_size_prunes_multichar_only(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    chars = {c for t in CORPUS for w in re.findall(BPE_PRETOKEN_RE, t.lower()) for c in w}
    m = train_unigram(df, vocab_size=len(chars) + 3, seed_size=2000)
    multi = [p for p in m.log_probs if len(p) > 1]
    assert len(multi) <= 3
    assert chars <= set(m.log_probs)


def test_spark_encode_matches_driver_and_plan(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    m = train_unigram(df, vocab_size=80, seed_size=2000)
    enc = encode_unigram(m, df)
    rows = {r["doc_id"]: r["unigram_tokens"] for r in enc.collect()}
    for i, t in enumerate(CORPUS):
        want = []
        for w in re.findall(BPE_PRETOKEN_RE, t.lower()):
            want.extend(_viterbi(w, m.log_probs, m.max_piece_len))
        assert rows[i] == want
        assert "".join(rows[i]) == "".join(re.findall(BPE_PRETOKEN_RE, t.lower()))
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_empty_and_degenerate(spark):
    df = spark.createDataFrame([("",)], "text string")
    m = train_unigram(df, vocab_size=10)
    assert m.log_probs == {}
    # an empty model still encodes via char fallback
    empty = UnigramModel({}, 6)
    assert _viterbi("ab", empty.log_probs, 6) == ["a", "b"]
