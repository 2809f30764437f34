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


# ---------------------------- UniMax -------------------------------

from spotify_etl_aws_spark.operators.heuristics import (  # noqa: E402
    unimax_allocation,
    unimax_mix,
)


def test_unimax_allocation_hand_computed():
    # equal share 1000 each; a caps at 200, surplus flows to b and c
    alloc = unimax_allocation({"a": 100, "b": 1000, "c": 10000}, 3000, 2.0)
    assert alloc == {"a": 200.0, "b": 1400.0, "c": 1400.0}
    assert sum(alloc.values()) == 3000.0


def test_unimax_allocation_budget_exceeds_capacity():
    alloc = unimax_allocation({"a": 10, "b": 20}, 10_000, 2.0)
    assert alloc == {"a": 20.0, "b": 40.0}  # every stratum at cap


def test_unimax_allocation_uncapped_even_split():
    alloc = unimax_allocation({"a": 500, "b": 500, "c": 500}, 900, 4.0)
    assert alloc == {"a": 300.0, "b": 300.0, "c": 300.0}


def test_unimax_allocation_bad_args():
    with pytest.raises(ValueError):
        unimax_allocation({"a": 1}, -1, 2.0)
    with pytest.raises(ValueError):
        unimax_allocation({"a": 1}, 10, 0.0)
    with pytest.raises(ValueError):
        unimax_allocation({"a": -5}, 10, 2.0)


def _unimax_corpus(spark):
    rows = []
    for i in range(20):
        rows.append((i, "lo"))  # small stratum: gets upweighted
    for i in range(20, 420):
        rows.append((i, "hi"))  # big stratum: gets downsampled
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_unimax_mix_epoch_semantics(spark):
    df = _unimax_corpus(spark)
    # budget 240, cap 4 epochs: share 120 each; lo caps at 80 (20*4),
    # surplus to hi -> hi gets 160. rates: lo=4.0, hi=0.4
    out, rates = unimax_mix(df, "lang", budget=240, max_epochs=4.0)
    assert rates == {"lo": 4.0, "hi": 0.4}
    rows = out.collect()
    lo = [r for r in rows if r.lang == "lo"]
    hi = [r for r in rows if r.lang == "hi"]
    # integer rate: every lo doc appears in epochs 0..3 exactly
    assert len(lo) == 80
    by_doc = {}
    for r in lo:
        by_doc.setdefault(r.doc_id, []).append(r.epoch)
    assert all(sorted(v) == [0, 1, 2, 3] for v in by_doc.values())
    # fractional rate: hash-thresholded single epoch, ~40% of 400
    assert all(r.epoch == 0 for r in hi)
    assert len({r.doc_id for r in hi}) == len(hi)
    assert 120 <= len(hi) <= 200  # 1M-bucket hash ≈ 160 ± noise


def test_unimax_mix_deterministic_and_token_weighted(spark):
    df = _unimax_corpus(spark).withColumn("n_tok", F.lit(10.0))
    a, ra = unimax_mix(df, "lang", 2400, 4.0, weight_col="n_tok")
    b, rb = unimax_mix(df, "lang", 2400, 4.0, weight_col="n_tok")
    assert ra == rb
    ka = sorted((r.doc_id, r.epoch) for r in a.collect())
    kb = sorted((r.doc_id, r.epoch) for r in b.collect())
    assert ka == kb
    # uniform 10-token docs: token-weighted rates equal row-weighted
    # rates at 10x the budget
    _, row_rates = unimax_mix(df, "lang", 240, 4.0)
    assert ra == row_rates


def test_unimax_mix_corpus_side_stays_map_side(spark):
    df = _unimax_corpus(spark)
    out, _ = unimax_mix(df, "lang", budget=240)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # broadcast-join the rate table; the corpus never hash-exchanges
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_unimax_composes_with_training_order(spark):
    """The epoch column exists so the order shuffler can DISPERSE a
    doc's repeats instead of replaying them back-to-back: keying the
    deterministic order on (doc_id, epoch) interleaves copies."""
    from spotify_etl_aws_spark.operators.ordering import training_order

    df = _unimax_corpus(spark)
    out, _ = unimax_mix(df, "lang", budget=240, max_epochs=4.0)
    # composite order id: epoch copies of one doc get distinct keys
    keyed = out.withColumn(
        "order_id", F.col("doc_id") * 8 + F.col("epoch")
    )
    ordered = [
        (r.doc_id, r.epoch)
        for r in training_order(keyed, seed=3, id_col="order_id").collect()
    ]
    again = [
        (r.doc_id, r.epoch)
        for r in training_order(keyed, seed=3, id_col="order_id").collect()
    ]
    assert ordered == again  # deterministic epoch order
    # each lo doc appears 4x; its copies are spread out, not adjacent
    positions: dict[int, list[int]] = {}
    for pos, (d, _e) in enumerate(ordered):
        positions.setdefault(d, []).append(pos)
    lo_docs = [p for d, p in positions.items() if len(p) == 4]
    assert lo_docs
    adjacent_runs = sum(
        1
        for p in lo_docs
        for a, b in zip(p, p[1:])
        if b == a + 1
    )
    # hash dispersal: of the 60 copy-gaps, at most a hashful collide
    assert adjacent_runs <= 6


# ------------------------ Gopher quality rules ----------------------

from spotify_etl_aws_spark.operators.heuristics import (  # noqa: E402
    gopher_quality_gate,
    gopher_quality_stats,
)

_CLEAN = (
    "the quick brown fox jumps over the lazy dog and then runs back to "
    "the barn with plenty of energy because it is a fine morning and "
    "every animal in the yard seems to have something useful to do "
    "while the farmer watches from the porch with a warm cup of coffee"
)


def test_gopher_stats_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "the cat... sat\n• bullet line\nplain tail...")],
        "doc_id long, text string",
    )
    r = gopher_quality_stats(df).collect()[0]
    # words: the cat... sat • bullet line plain tail... -> 8 tokens
    assert r.n_words == 8
    # '#'-free text, two '...' occurrences -> 2/8
    assert r.symbol_word_ratio == pytest.approx(2 / 8)
    assert r.bullet_line_frac == pytest.approx(1 / 3)
    assert r.ellipsis_line_frac == pytest.approx(1 / 3)  # only 'plain tail...'
    # '•' has no [a-z]
    assert r.alpha_word_frac == pytest.approx(7 / 8)
    assert r.required_word_hits == 1  # 'the'


@pytest.mark.parametrize(
    "mutant, reason",
    [
        ("tiny doc", "word count < 50"),
        (" ".join(["supercalifragilisticexpialidocious"] * 60), "mean word len"),
        (_CLEAN + " " + "### " * 20, "symbol ratio"),
        ("\n".join("• item " + str(i) + " of the and that have with list to be of" for i in range(30)), "bullets"),
        ("\n".join("the line number " + str(i) + " trails off..." for i in range(40)), "ellipsis"),
        (_CLEAN + " " + " ".join(str(i) for i in range(100)), "alpha frac"),
        (" ".join("w" + str(i) for i in range(60)), "required words"),
    ],
)
def test_gopher_gate_drops_each_violation(spark, mutant, reason):
    df = spark.createDataFrame(
        [(0, _CLEAN), (1, mutant)], "doc_id long, text string"
    )
    kept = {
        r.doc_id for r in gopher_quality_gate(gopher_quality_stats(df)).collect()
    }
    assert kept == {0}, f"mutant should fail ({reason})"


def test_gopher_stats_no_shuffle(spark):
    df = spark.createDataFrame([(0, _CLEAN)], "doc_id long, text string")
    plan = (
        gopher_quality_stats(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
