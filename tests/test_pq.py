"""Product quantization (operators/pq.py): codebook fit determinism,
the exact ADC identity, byte-code compression, and recall against the
exact cosine ranking on the embeddings fixture."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spotify_etl_aws_spark.operators.pq import (
    PQModel,
    adc_table,
    encode_pq,
    fit_pq,
    pq_topk,
    reconstruct,
)
from spotify_etl_aws_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").alias("v")
    )


@pytest.fixture(scope="module")
def model(emb):
    return fit_pq(emb, m=8, k=16, iters=5, sample_n=1024)


def test_fit_shapes_and_determinism(emb, model):
    assert model.m == 8 and model.k == 16
    assert model.dim == len(emb.first().v)
    again = fit_pq(emb, m=8, k=16, iters=5, sample_n=1024)
    assert np.array_equal(model.codebooks, again.codebooks)
    with pytest.raises(ValueError, match="one byte"):
        fit_pq(emb, k=300)
    with pytest.raises(ValueError, match="divisible"):
        fit_pq(emb, m=7)


def test_encode_is_bytes_and_deterministic(emb, model):
    codes = encode_pq(emb.limit(200), model)
    rows = codes.collect()
    assert all(len(bytes(r.code)) == model.m for r in rows)
    again = {r.vec_id: bytes(r.code) for r in encode_pq(emb.limit(200), model).collect()}
    assert {r.vec_id: bytes(r.code) for r in rows} == again
    # map-side only: no Exchange in the encode plan (pin on the
    # un-limited frame — the test's own .limit adds its own exchange)
    plan = encode_pq(emb, model)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_adc_identity_exact(model):
    """ADC is not an approximation of the reconstruction distance —
    it IS that distance: lut-gather-sum == ||q - decode(code)||^2."""
    rng = np.random.default_rng(5)
    q = rng.normal(size=model.dim)
    codes = rng.integers(0, model.k, size=(32, model.m), dtype=np.uint8)
    lut = adc_table(q, model)
    got = lut[np.arange(model.m)[None, :], codes].sum(axis=1)
    qn = q / np.linalg.norm(q)
    want = ((qn[None, :] - reconstruct(codes, model)) ** 2).sum(axis=1)
    assert np.allclose(got, want, atol=1e-12)


def test_quantization_error_shrinks_with_k(emb):
    x = np.array([r.v for r in emb.limit(512).collect()], dtype=np.float64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)

    def mse(k):
        mod = fit_pq(emb, m=8, k=k, iters=4, sample_n=512)
        codes_df = encode_pq(emb.limit(512), mod)
        codes = np.array(
            [
                np.frombuffer(bytes(r.code), dtype=np.uint8)
                for r in codes_df.orderBy("vec_id").collect()
            ]
        )
        return (((x - reconstruct(codes, mod)) ** 2).sum(axis=1)).mean()

    assert mse(32) < mse(4)


def test_pq_topk_recall_vs_exact(spark, emb, model):
    """PQ-ADC top-10 should overlap heavily with the exact cosine
    top-10 (m=8, k=16 on unit vectors — coarse but far above chance:
    random recall would be ~10/N)."""
    q = emb.filter(F.col("vec_id") == 7).first().v
    exact = (
        emb.select(
            "vec_id",
            F.aggregate(
                F.zip_with("v", F.lit(q), lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("dot"),
            F.sqrt(
                F.aggregate(
                    F.zip_with("v", "v", lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ).alias("nrm"),
        )
        .select("vec_id", (F.col("dot") / F.col("nrm")).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(10)
    )
    exact_ids = {r.vec_id for r in exact.collect()}
    codes = encode_pq(emb, model)
    got = pq_topk(codes, model, q, top_k=10)
    got_ids = {r.vec_id for r in got.collect()}
    assert 7 in got_ids  # the query vector itself must be found
    assert len(exact_ids & got_ids) >= 4
    # the scan is TakeOrderedAndProject, not a global sort
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
