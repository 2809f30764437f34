"""BPE tokenizer TRAINING (north-star, SURVEY.md §2.11c) — the full
merge-learning loop on top of the counting kernels in
``operators/vocab.py``.

The scalable shape (the one HF tokenizers / SentencePiece trainers use
on large corpora): the corpus-sized work is ONE Spark aggregation — a
word-frequency table (explode + partial-agg shuffle), Zipf-bounded and
explicitly capped at ``max_words`` — and the merge loop itself runs on
the driver over that frequency table, O(num_merges * distinct_words *
word_len), INDEPENDENT of corpus size. At 100 TB the word-count agg is
the only job that touches the data; re-counting pairs corpus-wide per
merge iteration (num_merges shuffles) would be the naive non-scale
formulation, and counting within-word pairs over the capped frequency
table is exactly equivalent because BPE merges never cross pre-token
boundaries.

Encoding is map-side only: the learned merge ranks ship to executors
in the kernel closure (O(vocab) bytes, broadcast-sized) and each
pre-token is encoded with the classical lowest-rank-first greedy loop
behind an in-kernel word cache — Zipf again: the cache hit rate on
natural text makes amortized cost per token tiny.

Pre-tokenization is ``vocab.BPE_PRETOKEN_RE`` (letter / digit /
punctuation runs, lowercased) — the same regex the unigram and
pair-count statistics use, so the trainer and the statistics agree on
word boundaries.
"""

from __future__ import annotations

from collections import Counter
from typing import NamedTuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spotify_etl_aws_spark.operators.vocab import _pretokens


class BpeModel(NamedTuple):
    """A trained tokenizer: ``merges`` in learned order; ``ranks`` maps
    each merged pair to its priority (lower = earlier = applied first);
    ``vocab`` is every emittable symbol (single chars + merge
    products), sorted."""

    merges: list[tuple[str, str]]
    ranks: dict[tuple[str, str], int]
    vocab: list[str]


def word_frequencies(
    docs: DataFrame,
    text_col: str = "text",
    max_words: int = 100_000,
) -> list[tuple[str, int]]:
    """The one corpus-sized job: (word, count) for the ``max_words``
    most frequent pre-tokens (ties broken lexicographically so the cap
    is deterministic). One explode + one partial-agg shuffle +
    TakeOrderedAndProject; the result is driver model state, O(cap)."""
    rows = (
        docs.select(F.explode(_pretokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(max_words)
        .collect()
    )
    return [(r["word"], r["n"]) for r in rows]


def _pair_stats(words: dict[tuple[str, ...], int]) -> Counter:
    stats: Counter = Counter()
    for syms, freq in words.items():
        for a, b in zip(syms, syms[1:]):
            stats[(a, b)] += freq
    return stats


def _merge_word(
    syms: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    min_pair_count: int = 2,
    max_words: int = 100_000,
) -> BpeModel:
    """Learn ``num_merges`` BPE merges from the corpus.

    Spark computes the capped word-frequency table (see
    ``word_frequencies``); the Sennrich-style merge loop then runs on
    the driver over that table: each iteration picks the most frequent
    adjacent symbol pair (count desc, then lexicographic pair — fully
    deterministic), merges it in every word, and records it. Stops
    early when the best pair drops below ``min_pair_count`` (merging
    singletons memorizes the corpus). Merges never cross pre-token
    boundaries, matching the regex pre-tokenizer."""
    wf = word_frequencies(docs, text_col, max_words=max_words)
    words: dict[tuple[str, ...], int] = {}
    for w, n in wf:
        words[tuple(w)] = words.get(tuple(w), 0) + n

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        stats = _pair_stats(words)
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        pair = best[0]
        merges.append(pair)
        words = {
            _merge_word(syms, pair): freq for syms, freq in words.items()
        }

    ranks = {p: i for i, p in enumerate(merges)}
    chars = {c for w, _ in wf for c in w}
    vocab = sorted(chars | {a + b for a, b in merges})
    return BpeModel(merges, ranks, vocab)


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Classical greedy BPE apply: repeatedly merge the present pair
    with the lowest learned rank until none apply."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def encode_bpe(
    model: BpeModel,
    docs: DataFrame,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append ``out_col: array<string>`` — the document's BPE token
    stream. Map-side only: the ranks table rides the kernel closure and
    a per-executor word cache exploits the Zipf distribution; unseen
    characters pass through as single-char tokens (byte-fallback
    posture). The JVM side does the pre-token split (same regex as
    training); only the per-word merge loop is Python."""
    ranks = model.ranks

    @F.pandas_udf("array<string>")
    def apply_merges(words: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def one(ws: list[str]) -> list[str]:
            out: list[str] = []
            for w in ws:
                enc = cache.get(w)
                if enc is None:
                    enc = _encode_word(w, ranks)
                    if len(cache) < 65_536:
                        cache[w] = enc
                out.extend(enc)
            return out

        return words.map(one)

    return docs.withColumn(out_col, apply_merges(_pretokens(text_col)))
