"""Benchmark decontamination (north-star, SURVEY.md §2.11c): drop
training documents that overlap an evaluation set — the standard
pre-training hygiene step (n-gram collision against held-out
benchmarks), run before packing.

Scale shape: the BENCHMARK side is small (eval suites are 1e3-1e6
rows) and collapses to a distinct-shingle set that BROADCASTS; the
corpus side pays one shingle pass and a broadcast semi/inner join —
the 100 TB corpus is never shuffled on text, and non-colliding
documents never leave their scan partition. Shingle width defaults to
8 tokens (the window eval-contamination checks conventionally use —
wide enough that natural-language collisions are evidence of true
overlap, narrow enough to catch partial quotes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_table

DEFAULT_SHINGLE_N = 8


def benchmark_overlap(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    shingle_n: int = DEFAULT_SHINGLE_N,
) -> DataFrame:
    """Per-document contamination evidence: (id, n_hit_shingles) for
    every corpus document sharing at least one ``shingle_n``-gram with
    the benchmark set. Documents with zero overlap are absent — at
    corpus scale the hit set is tiny and the absence IS the signal."""
    bench_sh = (
        shingle_table(
            bench.select(
                F.monotonically_increasing_id().alias("__bid"),
                F.col(bench_text_col or text_col).alias(text_col),
            ),
            "__bid",
            text_col,
            shingle_n,
        )
        .select("shingle")
        .distinct()
    )
    # count_distinct dedups (id, shingle) in the same aggregation —
    # no separate dropDuplicates pass on the corpus-side hot path
    corpus_sh = shingle_table(docs, id_col, text_col, shingle_n)
    return (
        corpus_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count_distinct("shingle").alias("n_hit_shingles"))
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    shingle_n: int = DEFAULT_SHINGLE_N,
    min_hits: int = 1,
) -> DataFrame:
    """The corpus minus documents with >= ``min_hits`` distinct
    benchmark n-grams: one broadcast overlap pass + one anti-join on
    id. ``min_hits`` > 1 tolerates incidental single-window collisions
    on short/formulaic text."""
    if min_hits < 1:
        raise ValueError(f"min_hits must be >= 1, got {min_hits}")
    flagged = benchmark_overlap(
        docs, bench, id_col, text_col, bench_text_col, shingle_n
    ).filter(F.col("n_hit_shingles") >= min_hits)
    return docs.join(flagged.select(id_col), id_col, "left_anti")
