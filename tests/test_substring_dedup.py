"""Exact-substring dedup (operators/substring_dedup.py): planted
duplicate spans, a brute-force Python reference, edge cases, and the
partial-aggregation plan pin."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from spotify_etl_aws_spark.operators.substring_dedup import (
    dedup_substrings,
    duplicated_spans,
    window_table,
)
from spotify_etl_aws_spark.sources.readers import load_table


def _toks(t: str) -> list[str]:
    return re.split(r"\s+", t.lower())


def _ref_dedup(texts: dict[int, str], k: int) -> dict[int, list[str]]:
    """Brute force: canonical occurrence per window = min (doc, pos);
    every other occurrence of a duplicated window marks its range."""
    occ: dict[tuple[str, ...], list[tuple[int, int]]] = {}
    tok = {i: _toks(t) for i, t in texts.items()}
    for i in sorted(tok):
        ts = tok[i]
        for p in range(len(ts) - k + 1):
            occ.setdefault(tuple(ts[p : p + k]), []).append((i, p))
    cut: dict[int, set[int]] = {i: set() for i in tok}
    for sites in occ.values():
        if len(sites) > 1:
            for d, p in sites[1:] if sites == sorted(sites) else sorted(sites)[1:]:
                cut[d].update(range(p, p + k))
    return {
        i: [t for j, t in enumerate(ts) if j not in cut[i]]
        for i, ts in tok.items()
    }


def _run(spark, texts: dict[int, str], k: int):
    docs = spark.createDataFrame(
        sorted(texts.items()), "doc_id bigint, text string"
    )
    return {
        r.doc_id: r for r in dedup_substrings(docs, k=k).collect()
    }


def test_cross_doc_span_removed_canonical_kept(spark):
    span = "one two three four five six seven eight nine ten"
    texts = {
        0: f"alpha {span} omega",
        1: f"start {span} end words differ here",
        2: "totally unrelated text with enough tokens to count",
    }
    got = _run(spark, texts, k=8)
    # canonical (doc 0) untouched
    assert got[0].text_deduped == texts[0]
    assert got[0].dup_tokens == 0
    # doc 1 loses exactly the 10-token span
    assert got[1].text_deduped == "start end words differ here"
    assert got[1].dup_tokens == 10
    assert got[1].n_tokens_deduped == got[1].n_tokens - 10
    # bystander untouched
    assert got[2].text_deduped == texts[2]


def test_matches_bruteforce_reference(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    texts = {
        0: base + " first tail piece",
        1: "prefix words here " + base,
        2: base + " " + base,  # within-doc repeat
        3: "short doc",  # < k tokens
        4: "an entirely distinct document with no shared spans at all",
    }
    k = 6
    ref = _ref_dedup(texts, k)
    got = _run(spark, texts, k)
    for i in texts:
        assert got[i].text_deduped == " ".join(ref[i]), f"doc {i}"
        assert got[i].n_tokens_deduped == len(ref[i])


def test_within_doc_repeat_keeps_first(spark):
    span = "a b c d e f g h"
    got = _run(spark, {0: f"{span} mid {span}"}, k=8)
    assert got[0].text_deduped == f"{span} mid"
    assert got[0].dup_tokens == 8


def test_no_duplicates_passthrough(spark):
    texts = {
        0: "each document here is wholly unique in its token stream",
        1: "and this second one shares no eight gram with the first",
    }
    got = _run(spark, texts, k=8)
    for i in texts:
        assert got[i].dup_tokens == 0
        assert got[i].text_deduped == texts[i].lower()
        assert got[i].n_tokens == got[i].n_tokens_deduped


def test_short_docs_emit_no_windows(spark):
    docs = spark.createDataFrame(
        [(0, "tiny doc"), (1, "")], "doc_id bigint, text string"
    )
    assert window_table(docs, k=8).count() == 0
    got = {r.doc_id: r for r in dedup_substrings(docs, k=8).collect()}
    assert got[0].dup_tokens == 0 and got[1].dup_tokens == 0


def test_overlapping_windows_merge_to_one_span(spark):
    # a 12-token duplicated span at k=8 yields 5 overlapping duplicated
    # windows on the copy; the merge must cut exactly 12 tokens, not 40
    span = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12"
    texts = {0: f"{span} unique0 tail0", 1: f"head1 uniq1 {span}"}
    got = _run(spark, texts, k=8)
    assert got[0].dup_tokens == 0
    assert got[1].dup_tokens == 12
    assert got[1].text_deduped == "head1 uniq1"
    spans = {
        r.doc_id: list(r.dup_starts)
        for r in duplicated_spans(
            spark.createDataFrame(
                sorted(texts.items()), "doc_id bigint, text string"
            ),
            k=8,
        ).collect()
    }
    assert list(spans) == [1]
    assert spans[1] == [2, 3, 4, 5, 6]  # span starts at token 2, 5 windows


def test_fixture_documents_sane(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = dedup_substrings(docs.limit(300), k=12)
    rows = out.collect()
    assert len(rows) == min(300, docs.count())
    for r in rows:
        assert 0 <= r.dup_tokens <= r.n_tokens
        assert r.n_tokens_deduped == r.n_tokens - r.dup_tokens


def test_window_table_shuffles_once(spark):
    """Plan pin: canonical election + non-canonical remainder come out
    of ONE window-table shuffle (row_number over the wh partitioning,
    no join-back, no collect_list), so the plan has no join and at
    most two Exchanges (wh, then doc_id) plus AQE reads. The
    per-group state is WindowExec's spillable buffer, never a merged
    occurrence list."""
    docs = spark.createDataFrame(
        [(0, "a b c d e f g h i j")], "doc_id bigint, text string"
    )
    plan = duplicated_spans(docs, k=8)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "collect_list" not in plan
    import re

    n_exchanges = len(re.findall(r"Exchange (hash|range)partitioning", plan))
    assert n_exchanges <= 2, plan


def test_hot_cap_single_exchange_for_window_table(spark):
    """The hot-occurrence count reuses the wh sort/exchange — adding
    the cap must not add a shuffle of the window table."""
    docs = spark.createDataFrame(
        [(0, "a b c d e f g h i j")], "doc_id bigint, text string"
    )
    plan = (
        duplicated_spans(docs, k=8, hot_max_occurrences=100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    import re

    n_exchanges = len(re.findall(r"Exchange (hash|range)partitioning", plan))
    assert n_exchanges <= 2, plan


def test_hot_window_100k_occurrences(spark):
    """Planted hot-boilerplate window: the same 8-token span opens
    100_000 documents. The bounded (row_number) formulation must
    process it without materializing a 100k-occurrence list; keep-first
    semantics cut it from every doc but the canonical (doc 0)."""
    n = 100_000
    span_cols = ", ".join(f"'s{i}'" for i in range(1, 9))
    docs = spark.range(n).selectExpr(
        "id as doc_id",
        f"concat_ws(' ', {span_cols}, concat('u', id)) as text",
    )
    out = dedup_substrings(docs, k=8).agg(
        F.sum("dup_tokens").alias("total_dup"),
        F.sum(F.when(F.col("dup_tokens") == 0, 1).otherwise(0)).alias(
            "untouched"
        ),
    ).collect()[0]
    # every doc but the canonical loses exactly the 8-token span
    assert out.total_dup == 8 * (n - 1)
    assert out.untouched == 1


def test_hot_cap_cuts_boilerplate_everywhere(spark):
    """With hot_max_occurrences set below the occurrence count, the
    boilerplate span is cut from EVERY document — no canonical
    survives; spans under the cap keep first-occurrence semantics."""
    n = 500
    span_cols = ", ".join(f"'s{i}'" for i in range(1, 9))
    docs = spark.range(n).selectExpr(
        "id as doc_id",
        f"concat_ws(' ', {span_cols}, concat('u', id)) as text",
    )
    rows = dedup_substrings(docs, k=8, hot_max_occurrences=100).collect()
    assert all(r.dup_tokens == 8 for r in rows)
    assert all(r.text_deduped == f"u{r.doc_id}" for r in rows)
    # a twice-occurring span stays keep-first under the same cap
    pair = spark.createDataFrame(
        [(0, "p1 p2 p3 p4 p5 p6 p7 p8 tail0"),
         (1, "p1 p2 p3 p4 p5 p6 p7 p8 tail1")],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: r
        for r in dedup_substrings(pair, k=8, hot_max_occurrences=100).collect()
    }
    assert got[0].dup_tokens == 0
    assert got[1].dup_tokens == 8


def test_case_preserved_in_output(spark):
    """Hashing is case-insensitive but the cut text keeps original
    case — enabling the curation stage must never lowercase a corpus."""
    span = "One Two Three Four Five Six Seven Eight"
    texts = {
        0: f"The CEO of IBM said {span}",
        1: f"{span.lower()} differs only by case plus tail words here",
    }
    got = _run(spark, texts, k=8)
    # doc 0 is canonical (lower doc_id): untouched, case intact
    assert got[0].text_deduped == texts[0]
    # doc 1's span matched case-insensitively and was cut; the
    # surviving tail keeps its original characters
    assert got[1].text_deduped == "differs only by case plus tail words here"
