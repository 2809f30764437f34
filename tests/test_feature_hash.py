"""Feature-hashing embeddings (operators/feature_hash.py): invariants,
similarity behavior, integration with the vector lane, and the
no-UDF/partial-agg plan shape."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from spotify_etl_aws_spark.operators.feature_hash import hashed_embedding
from spotify_etl_aws_spark.sources.readers import load_table


def _collect(spark, texts, **kw):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    return {
        r.doc_id: np.array(r.embedding, dtype=np.float64)
        for r in hashed_embedding(docs, **kw).collect()
    }


def test_shape_norm_and_determinism(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "an entirely different document about query planners",
        "",  # termless -> zero vector
    ]
    got = _collect(spark, texts, dim=64)
    assert set(got) == {0, 1, 2}
    assert all(v.shape == (64,) for v in got.values())
    assert math.isclose(np.linalg.norm(got[0]), 1.0, rel_tol=1e-6)
    assert np.linalg.norm(got[2]) == 0.0
    again = _collect(spark, texts, dim=64)
    for k in got:
        assert np.array_equal(got[k], again[k])


def test_identical_texts_identical_vectors(spark):
    t = "same words same order"
    got = _collect(spark, [t, t, "something else entirely now"], dim=128)
    assert np.array_equal(got[0], got[1])
    assert not np.array_equal(got[0], got[2])


def test_similarity_ordering(spark):
    base = (
        "storage engines compact immutable files into sorted levels "
        "while bloom filters keep point lookups cheap"
    )
    near = base + " and manifests track every snapshot"
    far = (
        "the recipe calls for two eggs a cup of flour and a pinch of "
        "salt folded gently into the batter"
    )
    got = _collect(spark, [base, near, far], dim=256)
    cos_near = float(got[0] @ got[1])
    cos_far = float(got[0] @ got[2])
    assert cos_near > 0.8 > cos_far, (cos_near, cos_far)


def test_counts_accumulate_not_binarize(spark):
    # one term repeated r times must scale that bucket by r pre-norm
    got = _collect(spark, ["zap", "zap zap zap"], dim=32, normalize=False)
    assert np.array_equal(got[1], 3 * got[0])


def test_shingle_mode_distinguishes_order(spark):
    a = "alpha beta gamma delta"
    b = "delta gamma beta alpha"
    uni = _collect(spark, [a, b], dim=128)
    assert np.array_equal(uni[0], uni[1])  # unigram bag: order-blind
    bi = _collect(spark, [a, b], dim=128, shingle_n=2)
    assert not np.array_equal(bi[0], bi[1])  # bigram hashing sees order


def test_feeds_vector_lane(spark, sf_dir):
    """End-to-end bridge: hash-embed the documents fixture, then find
    a planted near-duplicate via brute-force cosine on the embeddings."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    probe = docs.filter(F.col("doc_id") == 7).select(
        F.lit(990001).cast("long").alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tiny tail")).alias("text"),
    )
    emb = hashed_embedding(docs.limit(400).unionByName(probe), dim=128)
    vecs = {
        r.doc_id: np.array(r.embedding, dtype=np.float64)
        for r in emb.collect()
    }
    q = vecs[990001]
    sims = {k: float(q @ v) for k, v in vecs.items() if k != 990001}
    assert max(sims, key=sims.get) == 7


def test_plan_no_udf_and_partial_agg(spark):
    docs = spark.createDataFrame(
        [(0, "a b c")], "doc_id bigint, text string"
    )
    plan = (
        hashed_embedding(docs, dim=16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert "partial_sum" in plan or "Partial" in plan, plan


def test_shingle_counts_accumulate(spark):
    """Review fix: n-gram mode must count repeated shingles (the
    shared word_shingles helper deduplicates — binarized features)."""
    got = _collect(
        spark, ["ping pong", "ping pong ping pong ping pong"],
        dim=64, shingle_n=2, normalize=False,
    )
    # doc 1 contains 'ping pong' 3x, 'pong ping' 2x; doc 0 once/zero —
    # the 'ping pong' bucket must scale, not binarize
    assert not np.array_equal(got[0], got[1])
    assert np.abs(got[1]).sum() == 5.0 and np.abs(got[0]).sum() == 1.0


def test_hashed_embeddings_compose_with_pq(spark, sf_dir):
    """Cross-lane composition: feature-hashed TEXT vectors -> PQ
    codebooks -> byte codes -> ADC top-k recovers the planted
    near-duplicate that brute-force cosine finds."""
    from spotify_etl_aws_spark.operators.pq import encode_pq, fit_pq, pq_topk
    from spotify_etl_aws_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(300)
    probe_src = docs.filter(F.col("doc_id") == 11)
    probe = probe_src.select(
        F.lit(990011).cast("long").alias("doc_id"),
        F.concat(F.col("text"), F.lit(" small suffix")).alias("text"),
    )
    emb = hashed_embedding(docs.unionByName(probe), dim=64).select(
        F.col("doc_id").alias("vec_id"), F.col("embedding").alias("v")
    )
    model = fit_pq(emb, m=8, k=16, sample_n=301)
    codes = encode_pq(emb, model)
    q = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 990011).collect()[0].v
    ]
    top = pq_topk(codes, model, q, top_k=3).collect()
    ids = [r.vec_id for r in top]
    # the twin pair owns the top two (their order can flip: ADC of the
    # query against its own codes carries quantization error too)
    assert set(ids[:2]) == {11, 990011}
