"""Exact-substring deduplication (north-star, SURVEY.md §2.11a) — the
span-level complement of the document-level ladder in
``operators/dedup.py``.

Document-level dedup (exact hash / MinHash / SimHash) keeps or drops
WHOLE documents; real web corpora additionally repeat long *spans*
inside otherwise-distinct documents (boilerplate headers, licenses,
quoted articles). Lee et al. 2021, "Deduplicating Training Data Makes
Language Models Better", remove every substring of >= k tokens that
occurs more than once in the corpus, keeping one canonical occurrence.
Their single-node implementation builds a corpus suffix array; that
does not distribute. The standard cluster formulation (used by the
open Dolma/RedPajama-class pipelines) is the one here:

1. hash every k-token window of every document (map-side: one
   ``sequence`` of starts + ``transform`` + ``posexplode`` — no UDF);
2. one partial-aggregating shuffle on the window hash finds hashes
   with >1 occurrence and elects the canonical (minimal
   ``(doc_id, pos)``) occurrence;
3. every NON-canonical occurrence of a duplicated window marks its
   ``[pos, pos+k)`` token range; ranges are unioned per document
   (sorted starts -> merged disjoint intervals, a pure-JVM
   ``aggregate``) and the covered tokens are dropped with an
   index-aware ``filter``.

A duplicated span of length L >= k produces L-k+1 duplicated windows
whose union is exactly the span, so the non-canonical occurrence loses
the whole span while the canonical occurrence survives intact —
per-window minimal-occurrence election is consistent across the span
because the occurrence order of shifted windows equals the occurrence
order of their spans. Two documented deviations from the literal
suffix-array semantics:

- SELF-overlapping repeats (a token sequence with period < k, e.g.
  the same token repeated 2k times) compress down to roughly one
  period even in their only occurrence — the overlapping windows
  duplicate each other. For degenerate repetition that is the
  desirable outcome (it is what the Gopher repetition gate also
  targets); prose is never periodic at k >= 8 words.
- Spans are keyed by 64-bit xxhash64, not compared byte-wise: at
  ~10^13 corpus windows birthday collisions appear and each one cuts
  a unique <=k-token span somewhere. Acceptable for training-data
  hygiene (the loss is randomly-placed and tiny); a strictly exact
  run swaps `_window_hash` for a 128-bit digest (md5 of the joined
  window — same plan shape, wider shuffle key).

Scale: the window table has one row per corpus token (linear, never
quadratic), and it shuffles ONCE, keyed on the 8-byte xxhash64 —
canonical election and the non-canonical remainder come out of the
same exchange via ``row_number() OVER (PARTITION BY wh ORDER BY
doc_id, pos)``: the minimal occurrence gets rank 1, everything else
is a non-canonical duplicate. Crucially this bounds reducer memory on
hot windows: a boilerplate k-gram occurring 10^7-10^8 times across a
web corpus lands in ONE sort group, but WindowExec's per-group buffer
(and the sort feeding it) is spill-backed, so the group streams
through disk instead of materializing an occurrence LIST in one
reducer (the failure mode of a ``collect_list``-per-hash
formulation). An optional ``hot_max_occurrences`` cap additionally
short-circuits such boilerplate: a window with more occurrences than
the cap is duplicated *everywhere* by definition, so every occurrence
(including the would-be canonical) is cut — the policy a curation
ladder wants for license headers and navigation chrome. Document text
never shuffles. The per-document interval merge and the token cutting
are linear map-side higher-order functions (shifted-compare boundary
detection + gap slices — no sequential accumulator, no per-token
lambda).

Tokens are whitespace tokens (``functions.text.tokens``), matching the
rest of the text lane; ``text_deduped`` is the space-join of surviving
tokens, i.e. whitespace-normalized — the same contract every pipeline
that operates on a token stream (including the reference
implementation's byte-level variant) accepts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import TOKEN_SPLIT_RE, tokens
from .dedup import spread_narrow_scan


def _window_hash(win: Column) -> Column:
    # \x1f joiner cannot occur inside a whitespace token, so distinct
    # windows can never collide by concatenation ambiguity
    return F.xxhash64(F.concat_ws("\x1f", win))


def window_table(
    docs: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, pos, wh): one row per k-token window, ``wh`` the xxhash64
    of the window. Documents shorter than k tokens emit no rows.
    Entirely map-side (Generate over a ``sequence`` of starts)."""
    if k < 2:
        raise ValueError(f"window size k must be >= 2, got {k}")
    toks = tokens(text_col)
    n = F.size(toks)
    # sequence(0, n-k) DESCENDS when n-k < 0 — guard short docs to an
    # empty start list instead
    starts = F.when(
        n >= k, F.sequence(F.lit(0), n - k)
    ).otherwise(F.array().cast("array<int>"))
    hashes = F.transform(starts, lambda s: _window_hash(F.slice(toks, s + 1, k)))
    # a compact single-file corpus arrives as one task; the window
    # derivation is the CPU-heavy map work, so spread the raw rows first
    return spread_narrow_scan(docs).select(
        F.col(id_col), F.posexplode(hashes).alias("pos", "wh")
    )


def duplicated_spans(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    hot_max_occurrences: int | None = None,
) -> DataFrame:
    """(id, dup_starts): per document, the sorted window-start
    positions whose k-token window also occurs elsewhere in the corpus
    at a smaller (doc_id, pos) — i.e. every non-canonical occurrence.
    Documents with no duplicated windows are absent.

    ONE shuffle of the window table (keyed on ``wh``) elects canonicals
    AND yields the non-canonical remainder: ``row_number() OVER
    (PARTITION BY wh ORDER BY doc_id, pos)`` ranks the minimal
    occurrence 1, so rows with rank > 1 are exactly the non-canonical
    occurrences of duplicated windows (a unique window's single row has
    rank 1 and drops out). Unlike a ``collect_list``-per-hash
    aggregation this never materializes an occurrence list in reducer
    memory — the sort and WindowExec's group buffer both spill, so a
    boilerplate window with 10^8 occurrences streams through one task
    slowly instead of OOMing it. The join-back formulation (groupBy wh
    + equi-join win on wh) would shuffle the window table a second
    time for the same answer.

    ``hot_max_occurrences``: if set, a window hash with more than this
    many occurrences is treated as corpus boilerplate and cut from
    EVERY occurrence — no canonical survives. This both matches
    curation intent (license headers / nav chrome should not survive
    "once") and skips the pointless election for pathological keys.
    ``None`` (default) preserves the literal keep-first semantics.
    """
    win = window_table(docs, k, id_col, text_col)
    w = Window.partitionBy("wh").orderBy(id_col, "pos")
    ranked = win.withColumn("rn", F.row_number().over(w))
    if hot_max_occurrences is not None:
        if hot_max_occurrences < 1:
            raise ValueError(
                f"hot_max_occurrences must be >= 1, got {hot_max_occurrences}"
            )
        # count() over the same partitioning reuses the wh sort/exchange
        # (its clustering requirement is satisfied) — no extra shuffle
        cnt = F.count("*").over(Window.partitionBy("wh"))
        ranked = ranked.withColumn("cnt", cnt)
        is_dup = (F.col("rn") > 1) | (F.col("cnt") > hot_max_occurrences)
    else:
        is_dup = F.col("rn") > 1
    return (
        ranked.filter(is_dup)
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_set("pos")).alias("dup_starts"))
    )


def _merge_starts(starts: Column, k: int) -> Column:
    """Sorted window starts -> disjoint merged [lo, hi) intervals
    (array<struct<lo,hi>>). Because every span has width k and starts
    are sorted, a start opens a new interval iff its gap to the
    previous start exceeds k, and closes one iff the gap to the NEXT
    start does — so the merge is two shifted-compare filters (O(n),
    no sequential accumulator whose array-copy would go quadratic on
    densely duplicated documents)."""
    n = F.size(starts)
    m1 = F.greatest(n - 1, F.lit(0))
    null1 = F.array(F.lit(None).cast("int"))
    prev = F.when(n == F.lit(0), starts).otherwise(
        F.concat(null1, F.slice(starts, 1, m1))
    )
    nxt = F.when(n == F.lit(0), starts).otherwise(
        F.concat(F.slice(starts, 2, m1), null1)
    )
    los = F.filter(
        F.zip_with(starts, prev, lambda s, p: F.when(
            p.isNull() | (s - p > k), s
        )),
        lambda x: x.isNotNull(),
    )
    his = F.filter(
        F.zip_with(starts, nxt, lambda s, x: F.when(
            x.isNull() | (x - s > k), s + k
        )),
        lambda x: x.isNotNull(),
    )
    return F.zip_with(
        los, his, lambda lo, hi: F.struct(lo.alias("lo"), hi.alias("hi"))
    )


def dedup_substrings(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    hot_max_occurrences: int | None = None,
) -> DataFrame:
    """Corpus-wide exact-substring dedup: every >= k-token span that
    occurs more than once keeps its first (minimal ``(doc_id, pos)``)
    occurrence; all other occurrences are cut from the text. With
    ``hot_max_occurrences`` set, spans above that occurrence count are
    boilerplate and are cut everywhere (see ``duplicated_spans``).

    Returns every input document as (id, text, n_tokens, dup_tokens,
    text_deduped, n_tokens_deduped); untouched documents have
    ``dup_tokens == 0`` and ``text_deduped`` == whitespace-normalized
    ``text``. Window HASHING is case-insensitive (matching the rest of
    the text lane), but the cut slices a case-preserving token array —
    lowercasing never changes whitespace boundaries, so the two arrays
    align index-for-index and ``text_deduped`` keeps original case.
    """
    spans = duplicated_spans(docs, k, id_col, text_col, hot_max_occurrences)
    # case-PRESERVING split for reconstruction; hashing used tokens()
    # (lowered). The SAME split pattern is load-bearing: the cut
    # positions only align index-for-index because both arrays split on
    # TOKEN_SPLIT_RE (lowercasing never changes whitespace boundaries)
    toks = F.split(F.col(text_col), TOKEN_SPLIT_RE)
    joined = spread_narrow_scan(docs).join(spans, id_col, "left").withColumn(
        "__iv",
        _merge_starts(
            F.coalesce(F.col("dup_starts"), F.array().cast("array<int>")), k
        ),
    )
    iv = F.col("__iv")
    # surviving tokens = the GAPS between merged intervals, materialized
    # as O(#intervals) native array slices (never a per-token lambda)
    gap_los = F.concat(
        F.array(F.lit(0)), F.transform(iv, lambda r: r["hi"])
    )
    gap_his = F.concat(
        F.transform(iv, lambda r: r["lo"]), F.array(F.size(toks))
    )
    kept = F.flatten(
        F.zip_with(
            gap_los,
            gap_his,
            lambda a, b: F.slice(toks, a + 1, F.greatest(b - a, F.lit(0))),
        )
    )
    dup_tokens = F.aggregate(
        iv, F.lit(0), lambda acc, r: acc + (r["hi"] - r["lo"])
    )
    return joined.select(
        F.col(id_col),
        F.col(text_col),
        F.size(toks).alias("n_tokens"),
        dup_tokens.alias("dup_tokens"),
        F.concat_ws(" ", kept).alias("text_deduped"),
        F.size(kept).alias("n_tokens_deduped"),
    )
