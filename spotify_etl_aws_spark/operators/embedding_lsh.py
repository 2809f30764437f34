"""Random-hyperplane LSH for embedding near-dup (north-star §2.11b —
the SimHash-for-vectors rung of the dedup ladder; Charikar 2002).

The IVF path (``vector_ops``/``dedup_embedding_cosine``) buckets
candidates by a LEARNED quantizer — it needs a fit pass and its recall
depends on cell granularity. Random-hyperplane LSH is the fit-free
alternative: bit i of a vector's signature is the side of hyperplane
w_i it falls on (sign⟨w_i, x⟩); two vectors agree on a bit with
probability 1 − θ/π, so banding the bits (the MinHash-LSH band trick)
yields candidate pairs whose collision probability rises steeply with
cosine. Candidates then verify by EXACT cosine.

Portability: hyperplanes are Rademacher ±1 vectors derived from md5
(entry (i, j) = +1 iff the top 60 md5 bits of "seed:i:j" are even) —
the same portable-hash doctrine as the DSIR featurizer, so a SQL
oracle regenerates the identical planes, signatures, bands and
candidates. Sign boundaries are safe when min |⟨w_i, x⟩| over the
corpus dwarfs cross-engine summation drift (probed per fixture —
~1e-2 observed vs ~1e-14 drift).

Scale: signatures are one Arrow pass (X·Wᵀ per batch, W rides the
closure — n_bits×dim doubles); banding explodes to ``bands`` rows per
vector; candidate generation is an equi-join on (band, band_value) —
never all-pairs; verification joins vectors back by id for candidate
pairs only. Bits-per-band trades recall against candidate volume
exactly as in MinHash LSH.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine
from .lineage import cut_lineage


def rademacher_planes(seed: str, n_bits: int, dim: int) -> np.ndarray:
    """(n_bits × dim) ±1 hyperplane matrix, entry-wise md5-derived —
    regenerable bit-for-bit by any engine with md5."""
    w = np.empty((n_bits, dim), dtype=np.float64)
    for i in range(n_bits):
        for j in range(dim):
            h = int(
                hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()[:15], 16
            )
            w[i, j] = 1.0 if h % 2 == 0 else -1.0
    return w


def rh_band_buckets(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    n_bits: int = 16,
    bands: int = 4,
    seed: str = "rh-v1",
    dim: int | None = None,
) -> DataFrame:
    """(id, band, bv): each vector's per-band signature — ``bv`` is
    the band's bits as a '0'/'1' string in bit order. ``dim`` defaults
    to the first vector's length."""
    if n_bits < 1 or bands < 1 or n_bits % bands:
        raise ValueError(
            f"n_bits must be a positive multiple of bands, got "
            f"{n_bits}/{bands}"
        )
    if dim is None:
        head = emb.select(F.size(vec_col).alias("d")).limit(1).collect()
        if not head:
            return emb.sparkSession.createDataFrame(
                [], f"{id_col} long, band int, bv string"
            )
        dim = head[0]["d"]
    w = rademacher_planes(seed, n_bits, dim)
    r = n_bits // bands
    schema = f"{id_col} long, band int, bv string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            bits = (x @ w.T) >= 0.0  # (n, n_bits)
            ids = pdf[id_col].to_numpy()
            out_ids, out_band, out_bv = [], [], []
            for b in range(bands):
                chunk = bits[:, b * r : (b + 1) * r]
                vals = ["".join("1" if v else "0" for v in row) for row in chunk]
                out_ids.extend(ids)
                out_band.extend([b] * len(ids))
                out_bv.extend(vals)
            yield pd.DataFrame(
                {id_col: out_ids, "band": out_band, "bv": out_bv}
            )

    return emb.select(id_col, vec_col).mapInPandas(gen, schema)


def embedding_lsh_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "v",
    n_bits: int = 16,
    bands: int = 4,
    seed: str = "rh-v1",
) -> DataFrame:
    """(vec_a, vec_b, cosine): candidate pairs sharing ≥ 1 LSH band,
    verified at exact cosine ≥ ``threshold``. Completeness is
    probabilistic (band recall), exactness of every EMITTED pair is
    not — the verification is exact."""
    # the signature frame is referenced on BOTH sides of the band
    # self-join; without materialization the Python GEMM pass
    # (mapInPandas X·Wᵀ) runs twice. One lazy localCheckpoint of the
    # narrow (id, band, bv) proxy computes it once (r14; guide §8 —
    # same pattern as the phash/video media proxies)
    sig = rh_band_buckets(
        emb, id_col, vec_col, n_bits, bands, seed
    ).transform(cut_lineage)
    a, b = sig.alias("a"), sig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
        )
        .distinct()
    )
    va = emb.select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("__va")
    )
    vb = emb.select(
        F.col(id_col).alias("vec_b"), F.col(vec_col).alias("__vb")
    )
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .withColumn("cosine", cosine(F.col("__va"), F.col("__vb")))
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )
