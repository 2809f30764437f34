"""Curation-heuristics operators (operators/heuristics.py): Gopher-style
repetition stats, PII scrubbing, deterministic hash sampling, domain
mixing. Planted fixtures with hand-computed expectations; plan pins for
the map-side-only claims."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spotify_etl_aws_spark.operators.heuristics import (
    domain_mix,
    repetition_gate,
    repetition_stats,
    scrub_pii,
    stratified_sample,
)


def _stats_row(spark, text: str):
    df = spark.createDataFrame([(0, text)], "doc_id bigint, text string")
    return repetition_stats(df).collect()[0]


def test_repetition_stats_planted_lines(spark):
    # 4 non-empty lines, "dup" appears 3x -> 2 duplicated-beyond-first
    text = "dup\ndup\n\nuniq\ndup"
    r = _stats_row(spark, text)
    assert r.n_lines == 4
    assert r.dup_line_frac == pytest.approx(1 - 2 / 4)
    # repeated occurrences: 2 extra "dup" lines of 3 chars over the 13
    # chars of all non-empty lines (dup+dup+uniq+dup = 3+3+4+3)
    assert r.dup_line_char_frac == pytest.approx(6 / 13)


def test_repetition_stats_top_and_dup_ngrams(spark):
    # "a b" bigram occurs 3x in "a b a b a b" (overlapping: positions
    # 1,3,5 -> also "b a" 2x). top bigram = "a b": 3 occurrences * 3
    # chars = 9 over 11 total chars.
    text = "a b a b a b"
    r = _stats_row(spark, text)
    assert r.top_2gram_char_frac == pytest.approx(9 / 11)
    # no 5-grams repeated (only two 5-gram windows, distinct)
    assert r.dup_5gram_char_frac == pytest.approx(
        # windows: "a b a b a" and "b a b a b" -> distinct -> 0
        0.0
    )

    # a 12-token doc that repeats one 5-gram: "w1..w5" twice then filler
    text2 = "p q r s t p q r s t x y"
    r2 = _stats_row(spark, text2)
    # sorted 5-gram windows: "p q r s t" occurs at positions 1 and 6
    # -> one repeated occurrence of 9 chars over 23 chars
    assert r2.dup_5gram_char_frac == pytest.approx(9 / 23)


def test_repetition_stats_degenerate_docs(spark):
    r = _stats_row(spark, "")
    assert r.dup_line_frac == 0.0 and r.dup_line_char_frac == 0.0
    assert r.top_2gram_char_frac == 0.0 and r.dup_10gram_char_frac == 0.0
    r1 = _stats_row(spark, "single")
    assert r1.n_lines == 1 and r1.dup_line_frac == 0.0
    assert r1.top_2gram_char_frac == 0.0  # no bigrams in a 1-token doc


def test_repetition_gate_filters_spam(spark):
    spam = "buy now " * 50
    clean = " ".join(f"w{i} x{i * 7} y{i + 13}" for i in range(40))
    df = spark.createDataFrame(
        [(0, spam), (1, clean)], "doc_id bigint, text string"
    )
    kept = [r.doc_id for r in repetition_gate(repetition_stats(df)).collect()]
    assert kept == [1]


def test_repetition_stats_no_shuffle(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id bigint, text string")
    plan = repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_scrub_pii(spark):
    df = spark.createDataFrame(
        [
            (0, "mail alice@example.com or bob.smith+x@sub.co.uk now"),
            (1, "server at 10.0.255.3, call +1 (415) 555-0199 today"),
            (2, "no pii here"),
        ],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in scrub_pii(df).collect()}
    assert rows[0].n_email == 2 and rows[0].pii_total == 2
    assert "alice@example.com" not in rows[0].text
    assert rows[0].text.count("<EMAIL>") == 2
    assert rows[1].n_ip == 1 and rows[1].n_phone == 1
    assert "<IP>" in rows[1].text and "<PHONE>" in rows[1].text
    assert "555" not in rows[1].text
    assert rows[2].pii_total == 0 and rows[2].text == "no pii here"


def test_stratified_sample_deterministic_and_faithful(spark):
    df = spark.range(20000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 4 == 0, "web").otherwise("books").alias("src"),
    )
    frac = {"web": 0.5, "books": 0.1}
    s1 = stratified_sample(df, frac, "src")
    s2 = stratified_sample(df, frac, "src")
    assert sorted(r.doc_id for r in s1.collect()) == sorted(
        r.doc_id for r in s2.collect()
    )
    got = {r.src: r.n for r in s1.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert got["web"] == pytest.approx(0.5 * 5000, rel=0.05)
    assert got["books"] == pytest.approx(0.1 * 15000, rel=0.05)
    # different salt re-deals membership
    s3 = stratified_sample(df, frac, "src", salt="v2")
    assert sorted(r.doc_id for r in s3.collect()) != sorted(
        r.doc_id for r in s1.collect()
    )
    # map-side only
    plan = s1._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    with pytest.raises(ValueError, match="fraction"):
        stratified_sample(df, {"web": 1.5}, "src")


def test_domain_mix_temperatures(spark):
    df = spark.range(12000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 6 == 0, "rare").otherwise("common").alias("src"),
    )
    # T=1: natural mix — every rate is 1.0, nothing dropped
    full, rates = domain_mix(df, "src", temperature=1.0)
    assert rates == {"rare": 1.0, "common": 1.0}
    assert full.count() == 12000
    # T=0: equalize — rare keeps all, common downsamples to rare's size
    eq, rates0 = domain_mix(df, "src", temperature=0.0)
    assert rates0["rare"] == pytest.approx(1.0)
    assert rates0["common"] == pytest.approx(2000 / 10000)
    got = {r.src: r.n for r in eq.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert got["rare"] == 2000
    assert got["common"] == pytest.approx(2000, rel=0.1)
    # 0<T<1 flattens monotonically: common's rate between T=0 and T=1
    _, rates_half = domain_mix(df, "src", temperature=0.5)
    assert rates0["common"] < rates_half["common"] < 1.0
    with pytest.raises(ValueError, match="temperature"):
        domain_mix(df, "src", temperature=-1)


def test_domain_mix_scaled_matches_dict_variant(spark):
    """The broadcast-join path must agree row-for-row with the driver-
    dict path at equal inputs — same hash, same rounding."""
    from spotify_etl_aws_spark.operators.heuristics import domain_mix_scaled

    df = spark.range(6000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("d"), (F.col("id") % 9).cast("string")).alias("src"),
    )
    for temp in (0.0, 0.5, 1.0):
        full_dict, rates_dict = domain_mix(df, "src", temperature=temp)
        full_df, rates_df = domain_mix_scaled(df, "src", temperature=temp)
        rd = {r["src"]: r["rate"] for r in rates_df.collect()}
        assert set(rd) == set(rates_dict)
        for k, v in rates_dict.items():
            assert rd[k] == pytest.approx(v, abs=1e-12), (temp, k)
        assert sorted(r.doc_id for r in full_df.collect()) == sorted(
            r.doc_id for r in full_dict.collect()
        ), temp


def test_domain_mix_scaled_high_cardinality_web_domains(spark):
    """The web-scale posture: 20k registrable domains (standing in for
    10^7). Deterministic across calls, fraction-faithful per the rate
    table, and the corpus apply side is a BROADCAST join — no driver
    dict, no per-stratum expression chain, no corpus shuffle."""
    from spotify_etl_aws_spark.operators.heuristics import domain_mix_scaled

    n_domains = 20_000
    # skewed domain sizes: domain d gets 1 + (d % 13) docs
    df = spark.range(140_000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("host"), (F.col("id") % n_domains).cast("string"), F.lit(".com")
        ).alias("domain"),
    )
    s1, rates = domain_mix_scaled(df, "domain", temperature=0.5)
    s2, _ = domain_mix_scaled(df, "domain", temperature=0.5)
    assert rates.count() == n_domains
    c1 = sorted(r.doc_id for r in s1.collect())
    assert c1 == sorted(r.doc_id for r in s2.collect())
    # fraction fidelity: total kept ≈ Σ rate_d * n_d
    expected = (
        rates.join(
            df.groupBy("domain").agg(F.count("*").alias("n")), "domain"
        )
        .agg(F.sum(F.col("rate") * F.col("n")))
        .collect()[0][0]
    )
    assert len(c1) == pytest.approx(expected, rel=0.05)
    # plan: the corpus side broadcast-joins the rate table; the only
    # hashpartitioning exchanges belong to the rate COMPUTATION (the
    # per-domain count agg), never re-keying the corpus rows
    plan = s1._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_domain_mix_scaled_empty_and_bad_inputs(spark):
    from spotify_etl_aws_spark.operators.heuristics import (
        domain_mix_scaled,
        stratified_sample_rates,
    )

    empty = spark.createDataFrame([], "doc_id bigint, src string")
    out, rates = domain_mix_scaled(empty, "src", temperature=0.5)
    assert out.count() == 0 and rates.count() == 0
    with pytest.raises(ValueError, match="temperature"):
        domain_mix_scaled(empty, "src", temperature=-1)
    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("d").alias("src")
    )
    bad = spark.createDataFrame([("d", -0.2)], "src string, rate double")
    with pytest.raises(Exception, match="out of \\[0,1\\]"):
        stratified_sample_rates(df, bad, "src").count()


def test_rates_df_midpoint_rounding_matches_dict_variant(spark):
    """Review fix: the DataFrame variant must use HALF_EVEN (bround)
    like Python's round() in the dict variant — at a .5-midpoint rate
    both must keep the same rows."""
    from spotify_etl_aws_spark.operators.heuristics import (
        stratified_sample_rates,
    )

    df = spark.range(4000).select(
        F.col("id").alias("doc_id"), F.lit("d").alias("src")
    )
    rate = 2.5e-6  # rate * 1e6 buckets = 2.5 — the midpoint
    dict_rows = sorted(
        r.doc_id for r in stratified_sample(df, {"d": rate}, "src").collect()
    )
    rates = spark.createDataFrame([("d", rate)], "src string, rate double")
    df_rows = sorted(
        r.doc_id
        for r in stratified_sample_rates(df, rates, "src").collect()
    )
    assert df_rows == dict_rows
