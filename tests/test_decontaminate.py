"""Benchmark decontamination (operators/decontaminate.py): planted
contamination is caught, clean docs survive, thresholds and the
broadcast-no-corpus-shuffle plan shape hold."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spotify_etl_aws_spark.operators.decontaminate import (
    benchmark_overlap,
    decontaminate,
)


@pytest.fixture(scope="module")
def corpus(spark):
    base = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (1, "completely unrelated text about spark partitions and shuffle behavior here now"),
        (2, "what is the capital of france paris is the capital of france indeed"),
        (3, "another clean document discussing parquet row groups and column pruning strategies"),
    ]
    return spark.createDataFrame(base, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def bench(spark):
    # benchmark questions: one matches doc 0's phrasing, one doc 2's
    return spark.createDataFrame(
        [
            ("the quick brown fox jumps over the lazy dog near the river",),
            ("what is the capital of france paris is the capital",),
        ],
        "question string",
    )


def test_planted_contamination_is_flagged(corpus, bench):
    hits = {
        r.doc_id: r.n_hit_shingles
        for r in benchmark_overlap(
            corpus, bench, bench_text_col="question"
        ).collect()
    }
    assert set(hits) == {0, 2}
    assert all(n >= 1 for n in hits.values())


def test_decontaminate_drops_only_contaminated(corpus, bench):
    kept = sorted(
        r.doc_id
        for r in decontaminate(corpus, bench, bench_text_col="question").collect()
    )
    assert kept == [1, 3]


def test_min_hits_threshold(corpus, bench):
    # raising min_hits above any doc's hit count keeps everything
    kept = decontaminate(
        corpus, bench, bench_text_col="question", min_hits=10_000
    )
    assert kept.count() == 4
    with pytest.raises(ValueError, match="min_hits"):
        decontaminate(corpus, bench, min_hits=0)


def test_benchmark_side_broadcasts(corpus, bench):
    """The benchmark shingle set must broadcast — the corpus is never
    shuffled on text for the overlap join."""
    plan = (
        benchmark_overlap(corpus, bench, bench_text_col="question")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_overlap_on_documents_fixture(spark, sf_dir):
    """Self-check on real data: using a benchmark sampled FROM the
    corpus, every sampled doc flags itself (8-gram identity)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    sample = docs.filter(F.col("doc_id") < 5).select(
        F.col("text").alias("question")
    )
    n_long_enough = docs.filter(
        (F.col("doc_id") < 5) & (F.size(F.split("text", r"\s+")) >= 8)
    ).count()
    hits = benchmark_overlap(docs, sample, bench_text_col="question")
    flagged = {r.doc_id for r in hits.collect()}
    assert {d for d in flagged if d < 5} == set(range(5)) if n_long_enough == 5 else True
    kept = decontaminate(docs, sample, bench_text_col="question")
    assert kept.count() <= docs.count() - n_long_enough
