"""Degenerate-input contracts for the text/dedup ladder: real corpora
contain null, empty, and sub-shingle-length documents, and the operators
must degrade predictably (documented drops, null-safe hashing) rather
than crash or silently corrupt neighboring rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_etl_aws_spark.operators.dedup import (
    exact_dedup_groups,
    jaccard_pairs,
    lsh_verified_pairs,
    minhash_signatures,
    neardup_clusters,
    simhash_fingerprints,
)


def _edge_docs(spark):
    return spark.createDataFrame(
        [
            (0, None),
            (1, ""),
            (2, "one"),
            (3, "two words"),
            (4, "dup dup dup dup"),
            (5, "dup dup dup dup"),
        ],
        "doc_id bigint, text string",
    )


def test_exact_dedup_handles_null_and_empty(spark):
    """Every row lands in exactly one group; null text hashes to the
    null group, empty text to the empty-string hash — neither is lost
    and neither merges with real content."""
    out = exact_dedup_groups(_edge_docs(spark)).collect()
    assert sum(r.n_copies for r in out) == 6
    by_rep = {r.doc_id: r.n_copies for r in out}
    assert by_rep[4] == 2  # the real duplicates still collapse
    assert by_rep[0] == 1 and by_rep[1] == 1


def test_signature_builders_drop_subshingle_docs_only(spark):
    """Docs with fewer than shingle_n tokens have no shingles and
    vanish from signature tables (the documented contract, mirrored by
    the SQL oracle) — full-length docs are unaffected."""
    docs = _edge_docs(spark)
    assert {r.doc_id for r in minhash_signatures(docs).collect()} == {4, 5}
    assert {r.doc_id for r in simhash_fingerprints(docs).collect()} == {4, 5}


def test_pair_generators_never_emit_degenerate_docs(spark):
    """Null/empty/short docs cannot appear in any near-dup pair, and
    identical full-length docs still pair."""
    docs = _edge_docs(spark)
    jp = jaccard_pairs(docs, threshold=0.01).collect()
    assert [(r.doc_a, r.doc_b) for r in jp] == [(4, 5)]
    lv = lsh_verified_pairs(docs, threshold=0.5).collect()
    assert [(r.doc_a, r.doc_b) for r in lv] == [(4, 5)]


def test_neardup_clusters_keep_degenerate_docs_as_singletons(spark):
    """Cluster assignment is TOTAL over the corpus: docs that can't
    participate in near-dup detection are their own representatives —
    dropping them here would silently delete them from the curated
    corpus downstream."""
    got = {
        r.doc_id: r.cluster_rep
        for r in neardup_clusters(_edge_docs(spark), threshold=0.5).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 4}


def test_jaccard_pairs_brute_force_reference(spark):
    """Exact Jaccard against an independent Python reference on a small
    random-ish corpus (fixed strings, no LSH probability involved)."""
    texts = {
        0: "the quick brown fox jumps over the lazy dog",
        1: "the quick brown fox leaps over the lazy dog",
        2: "a completely different sentence about spark engines",
        3: "a completely different sentence about duck engines",
        4: "the quick brown fox jumps over the lazy dog",
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id bigint, text string")

    def shingles(t):
        w = t.lower().split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    want = {}
    for a in texts:
        for b in texts:
            if a < b:
                sa, sb = shingles(texts[a]), shingles(texts[b])
                j = len(sa & sb) / len(sa | sb)
                if j >= 0.2:
                    want[(a, b)] = round(j, 4)
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(docs, threshold=0.2).collect()
    }
    assert got == want
