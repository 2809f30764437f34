"""BPE tokenizer training (operators/bpe.py): merge-loop parity
against an independent naive corpus-rescan implementation, encoder
greedy semantics, determinism, and the map-side-only plan."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from spotify_etl_aws_spark.operators.bpe import (
    BpeModel,
    _encode_word,
    encode_bpe,
    train_bpe,
    word_frequencies,
)
from spotify_etl_aws_spark.operators.vocab import BPE_PRETOKEN_RE

CORPUS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "the low new low THE the",
    "wide wider widest wide",
]


def _naive_bpe(texts: list[str], num_merges: int, min_pair_count: int = 2):
    """Sennrich's algorithm formulated the NAIVE way — re-tokenize and
    re-count pairs from the raw corpus every iteration. Equivalent by
    construction only if the word-frequency-table shortcut is sound;
    that equivalence is what the parity test checks."""
    words: list[list[str]] = []
    for t in texts:
        for w in re.findall(BPE_PRETOKEN_RE, t.lower()):
            words.append(list(w))
    merges = []
    for _ in range(num_merges):
        stats: Counter = Counter()
        for syms in words:
            for p in zip(syms, syms[1:]):
                stats[p] += 1
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        a, b = best[0]
        for syms in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [a + b]
                else:
                    i += 1
        merges.append((a, b))
    return merges


def test_train_matches_naive_corpus_rescan(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    model = train_bpe(df, num_merges=12)
    assert model.merges == _naive_bpe(CORPUS, 12)
    # learned-order ranks, vocab contains every merge product
    assert [model.ranks[p] for p in model.merges] == list(range(len(model.merges)))
    for a, b in model.merges:
        assert a + b in model.vocab


def test_train_deterministic_and_capped(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    m1 = train_bpe(df, num_merges=8)
    m2 = train_bpe(df.repartition(7), num_merges=8)
    assert m1.merges == m2.merges
    # min_pair_count stops before singleton merges: every merged pair
    # occurred at least twice at merge time
    assert len(m1.merges) <= 8
    # the cap keeps only the most frequent words, deterministically
    wf = word_frequencies(df, max_words=3)
    assert len(wf) == 3
    assert wf == sorted(wf, key=lambda x: (-x[1], x[0]))


def test_encoder_greedy_semantics():
    # ranks: ('l','o')=0, ('lo','w')=1 -> "low" becomes one token;
    # "slow" contains the same merges mid-word
    ranks = {("l", "o"): 0, ("lo", "w"): 1}
    assert _encode_word("low", ranks) == ["low"]
    assert _encode_word("slow", ranks) == ["s", "low"]
    # lowest rank wins even when a later-rank pair appears first
    ranks2 = {("a", "b"): 1, ("b", "c"): 0}
    assert _encode_word("abc", ranks2) == ["a", "bc"]
    # no applicable merges / unseen chars -> single-char fallback
    assert _encode_word("xyz", ranks) == ["x", "y", "z"]


def test_spark_encode_roundtrip_and_plan(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")
    model = train_bpe(df, num_merges=12)
    enc = encode_bpe(model, df)
    rows = {r["doc_id"]: r for r in enc.collect()}
    for i, t in enumerate(CORPUS):
        toks = rows[i]["bpe_tokens"]
        # concatenating tokens reconstructs the pre-tokenized text
        assert "".join(toks) == "".join(re.findall(BPE_PRETOKEN_RE, t.lower()))
        # every token is a vocab symbol
        assert all(s in model.vocab for s in toks)
        # driver encoder agrees with the kernel
        want = []
        for w in re.findall(BPE_PRETOKEN_RE, t.lower()):
            want.extend(_encode_word(w, model.ranks))
        assert toks == want
    # frequent whole words became single tokens
    assert ["low"] == _encode_word("low", model.ranks)
    # encode is map-side only: no Exchange in the plan
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_empty_and_degenerate(spark):
    df = spark.createDataFrame([("",), ("a",)], "text string")
    model = train_bpe(df, num_merges=5)
    assert model.merges == []  # nothing repeats
    enc = encode_bpe(model, df).collect()
    assert sorted(len(r["bpe_tokens"]) for r in enc) == [0, 1]
    # a model with no merges still encodes (char fallback)
    empty = BpeModel([], {}, [])
    assert _encode_word("ab", empty.ranks) == ["a", "b"]
