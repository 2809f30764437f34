"""Document chunking (north-star, SURVEY.md §2.11c) — split long
documents into overlapping context-length windows, the preprocessing
step between curation and packing when documents exceed the trainer's
sequence length (and the indexing step for retrieval corpora).

Pure JVM throughout: tokenize once (`functions.text.tokens` or a
caller-provided ``array<string>`` column), then one ``transform`` over
a ``sequence`` of window starts takes ``slice``s of the token array,
and one ``explode`` emits a row per chunk. No UDF, no shuffle — the
whole operator is a map-side Generate, so at 100 TB it streams
scan -> explode -> sink; chunk counts are carried so downstream
packing can budget without re-tokenizing.

Window geometry is the standard stride form: starts at 0, stride,
2*stride, ... with ``stride = chunk_tokens - overlap_tokens``; every
token lands in at least one chunk; the final window is the only one
allowed to be short, and a document shorter than one window yields
exactly one chunk (itself). Mirrors HF ``return_overflowing_tokens``
/ LangChain splitter semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens as _default_tokens


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int,
    overlap_tokens: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """(id, text|tokens) -> one row per chunk: (id, chunk_idx,
    n_chunks, chunk_tokens_arr, chunk_text, n_tokens).

    ``tokens_col`` (an existing ``array<string>`` column, e.g. a BPE
    encoding from ``operators/bpe.py``) skips the whitespace tokenizer;
    ``chunk_text`` is then the space-join of the subword pieces —
    callers that want byte-exact text reconstruction should chunk on
    whitespace tokens.
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            f"overlap_tokens must be in [0, chunk_tokens), got "
            f"{overlap_tokens} vs {chunk_tokens}"
        )
    stride = chunk_tokens - overlap_tokens

    # the default whitespace tokenizer yields [""] on empty text (split
    # semantics); chunking wants a true empty stream there
    toks: Column = (
        F.col(tokens_col)
        if tokens_col
        else F.filter(_default_tokens(text_col), lambda x: x != F.lit(""))
    )
    n = F.size(toks)
    # number of stride steps so the last window's START is < n (or one
    # chunk for empty/short docs): ceil(max(n - overlap, 1) / stride)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap_tokens)) / F.lit(stride)).cast("int"),
        F.lit(1),
    )
    windows = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.slice(toks, i * stride + 1, chunk_tokens).alias(
                "chunk_tokens_arr"
            ),
        ),
    )
    return (
        docs.select(
            id_col,
            n_chunks.alias("n_chunks"),
            F.explode(windows).alias("w"),
        )
        .select(
            id_col,
            F.col("w.chunk_idx").alias("chunk_idx"),
            "n_chunks",
            F.col("w.chunk_tokens_arr").alias("chunk_tokens_arr"),
            F.array_join("w.chunk_tokens_arr", " ").alias("chunk_text"),
            F.size("w.chunk_tokens_arr").alias("n_tokens"),
        )
    )
