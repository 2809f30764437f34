"""Corpus statistics — the "data card" summary every released training
set ships with (counts, token-length distribution, quality, duplicate
rate, per-language composition), computed as TWO aggregation jobs
regardless of corpus size:

1. one full-corpus agg of scalar statistics (counts, percentile
   sketches, approx-distinct content hashes — all partial-aggregating,
   sketch-sized driver output);
2. one group-by on the language column folded into a map column.

Nothing here scans twice per statistic, collects rows, or runs Python
per document — the card for a 100 TB corpus costs two shuffles of
sketch/group sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import quality_score, tokens


def corpus_stats(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str | None = "lang",
) -> DataFrame:
    """One-row data card: (n_docs, n_empty, total_tokens, p50/p90/max
    token lengths, mean_quality, approx_distinct_texts,
    approx_dup_rate, total_chars[, lang_counts map]).

    ``approx_dup_rate`` uses HLL over the content hash — the scalable
    estimate (exact duplicate accounting is ``dedup_exact_docs``'s
    job). ``lang_col=None`` skips the composition map for corpora
    without language labels."""
    n_toks = F.size(F.filter(tokens(text_col), lambda x: x != F.lit("")))
    base = docs.select(
        F.col(text_col).alias("__text"),
        n_toks.alias("__nt"),
        quality_score(text_col).alias("__q"),
    )
    card = base.agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("__nt") == 0).cast("long")).alias("n_empty"),
        F.sum("__nt").alias("total_tokens"),
        F.expr("percentile_approx(__nt, 0.5)").alias("p50_tokens"),
        F.expr("percentile_approx(__nt, 0.9)").alias("p90_tokens"),
        F.max("__nt").alias("max_tokens"),
        F.round(F.avg("__q"), 4).alias("mean_quality"),
        F.approx_count_distinct(F.xxhash64("__text")).alias(
            "approx_distinct_texts"
        ),
        F.sum(F.length("__text")).alias("total_chars"),
    ).withColumn(
        "approx_dup_rate",
        F.round(
            1 - F.col("approx_distinct_texts") / F.col("n_docs"), 4
        ),
    )
    if lang_col is None:
        return card
    langs = (
        docs.groupBy(F.col(lang_col).alias("__lang"))
        .agg(F.count("*").alias("__n"))
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("__lang", "__n")))
            ).alias("lang_counts")
        )
    )
    return card.crossJoin(langs)


def audit_summary(audit: DataFrame) -> DataFrame:
    """One row per ladder stage from a curation audit frame
    (``plans.curation.curation_audit`` output): (status, n_docs,
    fraction) ordered by count — the drop-rate table a data card
    publishes next to the corpus stats. One aggregation; fractions
    computed from the same pass via a window total."""
    from pyspark.sql.window import Window

    counts = audit.groupBy("status").agg(F.count("*").alias("n_docs"))
    total = F.sum("n_docs").over(Window.partitionBy())
    return (
        counts.withColumn("fraction", F.round(F.col("n_docs") / total, 6))
        .orderBy(F.desc("n_docs"), "status")
    )
