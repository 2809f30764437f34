"""Random-hyperplane embedding LSH (operators/embedding_lsh.py):
portable plane derivation, signature correctness vs numpy, candidate
soundness (every emitted pair shares a band and clears the cosine
cut), and recall on planted near-duplicates."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

import pyspark.sql.functions as F

from spotify_etl_aws_spark.operators.embedding_lsh import (
    embedding_lsh_pairs,
    rademacher_planes,
    rh_band_buckets,
)


def test_planes_are_md5_portable():
    w = rademacher_planes("s1", 4, 6)
    assert w.shape == (4, 6)
    assert set(np.unique(w)) <= {-1.0, 1.0}
    # spot-check the derivation contract an oracle replays
    h = int(hashlib.md5(b"s1:2:3").hexdigest()[:15], 16)
    assert w[2, 3] == (1.0 if h % 2 == 0 else -1.0)
    # deterministic across calls
    assert (rademacher_planes("s1", 4, 6) == w).all()
    assert (rademacher_planes("s2", 4, 6) != w).any()


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, v array<double>")


def test_signatures_match_numpy(spark):
    rng = np.random.RandomState(5)
    x = rng.randn(20, 8)
    df = _vecs(spark, [(i, [float(a) for a in x[i]]) for i in range(20)])
    got = {
        (r.vec_id, r.band): r.bv
        for r in rh_band_buckets(df, n_bits=8, bands=2, seed="t").collect()
    }
    w = rademacher_planes("t", 8, 8)
    bits = (x @ w.T) >= 0
    for i in range(20):
        for b in range(2):
            want = "".join("1" if v else "0" for v in bits[i, b * 4 : (b + 1) * 4])
            assert got[(i, b)] == want


def test_pairs_sound_and_planted_dups_recalled(spark):
    """Planted near-identical pairs (cosine ~1) must surface — at
    cosine ~1 every bit agrees, so every band collides; emitted pairs
    must all clear the threshold with exact cosines."""
    rng = np.random.RandomState(9)
    base = rng.randn(30, 16)
    rows = [(i, [float(a) for a in base[i]]) for i in range(30)]
    # planted: 100 + i is a tiny perturbation of i, for i in 0..4
    for i in range(5):
        dup = base[i] + rng.randn(16) * 1e-4
        rows.append((100 + i, [float(a) for a in dup]))
    df = _vecs(spark, rows)
    out = embedding_lsh_pairs(df, 0.9, n_bits=16, bands=4, seed="t2")
    pairs = {(r.vec_a, r.vec_b): r.cosine for r in out.collect()}
    for i in range(5):
        assert (i, 100 + i) in pairs, i
        assert pairs[(i, 100 + i)] > 0.999
    # soundness: re-verify every emitted cosine exactly
    byid = {i: np.array(v) for i, v in rows}
    for (a, b), c in pairs.items():
        va, vb = byid[a], byid[b]
        want = va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
        assert abs(c - want) < 1e-9
        assert c >= 0.9


def test_validation_and_empty(spark):
    df = _vecs(spark, [(1, [1.0, 2.0])])
    with pytest.raises(ValueError, match="multiple"):
        rh_band_buckets(df, n_bits=10, bands=4)
    empty = _vecs(spark, [])
    assert rh_band_buckets(empty, n_bits=8, bands=2).count() == 0
    assert embedding_lsh_pairs(empty, 0.5, n_bits=8, bands=2).count() == 0
