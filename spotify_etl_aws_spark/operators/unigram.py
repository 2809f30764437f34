"""Unigram-LM tokenizer training (north-star, SURVEY.md §2.11c) — the
SentencePiece-style counterpart to ``operators/bpe.py``: instead of
greedy merges, learn a PROBABILITY per subword piece and segment by
maximum likelihood (Viterbi).

Scale shape is identical to the BPE trainer: the corpus-sized work is
the ONE capped word-frequency aggregation (``bpe.word_frequencies`` —
explode + partial-agg shuffle, Zipf-bounded driver model state); seed
construction, EM, and pruning all run on the driver over that table,
O(iters * distinct_words * word_len^2), independent of corpus size.
Encoding is a map-side pandas_udf with closure-shipped piece log-probs
and an in-kernel word cache.

Simplifications vs Kudo 2018, stated honestly: hard EM (Viterbi
counts, not forward-backward expectations) and count-based pruning
(not likelihood-loss ranking). Both keep the algorithm deterministic
and dependency-free while preserving the trainer's structure: seed ->
EM re-estimate -> prune -> final piece probabilities. Hard EM makes
corpus Viterbi log-likelihood non-decreasing per iteration — asserted
in tests, the property soft EM shares.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import NamedTuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spotify_etl_aws_spark.operators.bpe import word_frequencies
from spotify_etl_aws_spark.operators.vocab import _pretokens

_UNSEEN_LOGP = -30.0  # char-fallback score for pieces outside the model


class UnigramModel(NamedTuple):
    """``log_probs`` maps each piece to its log probability; every
    single character seen in training is always present (full
    coverage), so Viterbi never dead-ends on trained text."""

    log_probs: dict[str, float]
    max_piece_len: int


def _viterbi(word: str, logp: dict[str, float], max_len: int) -> list[str]:
    """Max-likelihood segmentation: best[i] = best score of word[:i];
    O(len * max_len). Unknown single chars get the fallback score so
    any word segments (byte-fallback posture)."""
    n = len(word)
    best = [0.0] + [-math.inf] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j == 1:
                    lp = _UNSEEN_LOGP
                else:
                    continue
            s = best[j] + lp
            if s > best[i]:
                best[i], back[i] = s, j
    out: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    return out[::-1]


def _word_ll(word: str, logp: dict[str, float], max_len: int) -> float:
    n = len(word)
    best = [0.0] + [-math.inf] * n
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            lp = logp.get(word[j:i])
            if lp is None:
                lp = _UNSEEN_LOGP if i - j == 1 else None
                if lp is None:
                    continue
            if best[j] + lp > best[i]:
                best[i] = best[j] + lp
    return best[n]


def _normalize(counts: Counter) -> dict[str, float]:
    total = sum(counts.values())
    return {p: math.log(c / total) for p, c in counts.items() if c > 0}


def train_unigram(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 1000,
    max_piece_len: int = 6,
    seed_size: int = 20_000,
    em_iters: int = 4,
    max_words: int = 100_000,
) -> UnigramModel:
    """Fit the unigram tokenizer. Spark computes the capped
    word-frequency table; the driver then (1) seeds the piece inventory
    with the ``seed_size`` most frequent substrings up to
    ``max_piece_len`` (count desc, piece asc — deterministic), always
    including every single character; (2) runs ``em_iters`` rounds of
    hard EM (Viterbi-segment every word under current probs, recount
    pieces weighted by word frequency); (3) prunes to ``vocab_size`` by
    final count (single chars are never pruned — coverage), and
    renormalizes."""
    wf = word_frequencies(docs, text_col, max_words=max_words)

    seed: Counter = Counter()
    chars: set[str] = set()
    for w, n in wf:
        for c in w:
            chars.add(c)
        for ln in range(1, max_piece_len + 1):
            for i in range(len(w) - ln + 1):
                seed[w[i : i + ln]] += n
    if not seed:
        return UnigramModel({}, max_piece_len)
    multi = sorted(
        ((p, c) for p, c in seed.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[: max(0, seed_size - len(chars))]
    pieces = Counter({p: c for p, c in multi})
    for c in chars:
        pieces[c] = seed[c]

    logp = _normalize(pieces)
    for _ in range(em_iters):
        counts: Counter = Counter()
        for w, n in wf:
            for piece in _viterbi(w, logp, max_piece_len):
                counts[piece] += n
        # coverage floor: chars that fell out of every Viterbi path
        # stay in the model with count 1 so unseen compositions still
        # segment
        for c in chars:
            if counts[c] == 0:
                counts[c] = 1
        logp = _normalize(counts)

    final: Counter = Counter()
    for w, n in wf:
        for piece in _viterbi(w, logp, max_piece_len):
            final[piece] += n
    for c in chars:
        if final[c] == 0:
            final[c] = 1
    multi_final = sorted(
        ((p, c) for p, c in final.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[: max(0, vocab_size - len(chars))]
    kept = Counter({p: c for p, c in multi_final})
    for c in chars:
        kept[c] = final[c]
    return UnigramModel(_normalize(kept), max_piece_len)


def encode_unigram(
    model: UnigramModel,
    docs: DataFrame,
    text_col: str = "text",
    out_col: str = "unigram_tokens",
) -> DataFrame:
    """Append ``out_col: array<string>`` — the max-likelihood piece
    stream. Same kernel shape as ``bpe.encode_bpe``: JVM pre-token
    split, closure-shipped log-probs, in-kernel Zipf word cache,
    map-side only."""
    logp = model.log_probs
    max_len = model.max_piece_len

    @F.pandas_udf("array<string>")
    def segment(words: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def one(ws: list[str]) -> list[str]:
            out: list[str] = []
            for w in ws:
                enc = cache.get(w)
                if enc is None:
                    enc = _viterbi(w, logp, max_len)
                    if len(cache) < 65_536:
                        cache[w] = enc
                out.extend(enc)
            return out

        return words.map(one)

    return docs.withColumn(out_col, segment(_pretokens(text_col)))
