"""Product quantization (PQ) for the embedding lane (north-star,
SURVEY.md §2.11b): compress ``array<float>`` embeddings to m-byte codes
and scan them with asymmetric distance computation (ADC) — the FAISS
IVF-PQ design, re-expressed Spark-first.

Why this matters at 100 TB: a 64-dim float64 embedding is 512 bytes;
its PQ code is m bytes (8 here). The exact/IVF lanes
(``queries/vector.py``) ship full vectors through every scan; the PQ
lane makes the hot scan read ~64x less, which at corpus scale is the
difference between an in-memory index and an I/O-bound one.

Design, mirroring the engine's quantizer conventions:

- ``fit_pq`` trains per-subspace codebooks with deterministic Lloyd
  iterations on a BOUNDED sample (the lowest ``sample_n`` vec_ids —
  reproducible, no RNG), collected to the driver: codebooks are
  O(m*k*dsub) MODEL STATE exactly like the IVF centroids
  (``queries/vector.py:_learned_centroids``) and FAISS's
  train-on-sample practice.
- ``encode_pq`` is mapInPandas: per Arrow batch, one GEMM per subspace
  against the codebook, argmin per row; emits (vec_id, code binary).
  Linear, map-side, no shuffle.
- ``pq_topk`` scans codes with an ADC lookup table built from the
  query on the driver (m*k floats): per batch the distance is
  ``LUT[sub, code].sum(axis=subspaces)`` — pure numpy gather, no
  decode. Top-k via orderBy(limit) = TakeOrderedAndProject.
- ``reconstruct`` (decode) exists for testing/diagnostics: the ADC
  identity ``adc(q, codes) == ||q - reconstruct(codes)||^2`` is exact
  and unit-tested.

Vectors are unit-normalized before fit/encode, so L2 ordering equals
cosine ordering (``||q-x||^2 = 2 - 2 cos`` on unit vectors).
"""

from __future__ import annotations

from typing import Iterator, NamedTuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class PQModel(NamedTuple):
    """Per-subspace codebooks: shape (m, k, dsub). ``dim`` is the full
    embedding dimensionality (m * dsub)."""

    codebooks: np.ndarray

    @property
    def m(self) -> int:
        return self.codebooks.shape[0]

    @property
    def k(self) -> int:
        return self.codebooks.shape[1]

    @property
    def dsub(self) -> int:
        return self.codebooks.shape[2]

    @property
    def dim(self) -> int:
        return self.m * self.dsub


def _unit(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return mat / n


def _round_away(x: np.ndarray, decimals: int) -> np.ndarray:
    """Half-away-from-zero rounding — the SQL ``round()`` convention on
    both engines (np.round is half-to-even, which would diverge from a
    DuckDB twin exactly at grid midpoints)."""
    scale = 10.0**decimals
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale


def fit_pq(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 5,
    sample_n: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "v",
    decimals: int | None = None,
) -> PQModel:
    """Train PQ codebooks on the ``sample_n`` lowest-id vectors.

    Deterministic end to end: the sample is an ORDER BY id LIMIT (no
    RNG), initial centroids are the first k sample rows per subspace,
    and Lloyd runs a fixed ``iters`` with empty-cluster slots keeping
    their previous centroid. k <= 256 so one code fits a byte.

    ``decimals`` rounds each M-step mean half-away-from-zero (the SQL
    ``round()`` convention) — the same landing grid the IVF quantizer
    uses (queries/vector.py CENTROID_DECIMALS) so a relational twin
    re-deriving the codebooks arrives at bit-identical centroids."""
    if not 1 <= k <= 256:
        raise ValueError(f"k must be in [1,256] (one byte per code), got {k}")
    rows = (
        emb.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample_n)
        .collect()
    )
    if not rows:
        raise ValueError("fit_pq: empty embedding frame")
    x = _unit(np.array([r[1] for r in rows], dtype=np.float64))
    return PQModel(_lloyd_books(x, m, k, iters, decimals))


def _lloyd_books(
    x: np.ndarray, m: int, k: int, iters: int, decimals: int | None
) -> np.ndarray:
    """The per-subspace Lloyd loop over an (n, dim) training matrix —
    shared VERBATIM by ``fit_pq`` (unit vectors) and ``fit_ivfpq``
    (residuals), so the two quantizer families can never drift in
    arithmetic or tie conventions."""
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    if len(x) < k:
        raise ValueError(f"need >= k={k} sample vectors, got {len(x)}")
    books = np.empty((m, k, dsub), dtype=np.float64)
    for s in range(m):
        sub = x[:, s * dsub : (s + 1) * dsub]
        cents = sub[:k].copy()
        for _ in range(iters):
            # argmin L2 via the expanded form; first minimum wins (ties
            # resolve to the lowest centroid index, deterministically)
            d2 = (
                (sub**2).sum(axis=1, keepdims=True)
                - 2.0 * sub @ cents.T
                + (cents**2).sum(axis=1)[None, :]
            )
            assign = np.argmin(d2, axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    mean = sub[mask].mean(axis=0)
                    cents[c] = (
                        mean if decimals is None else _round_away(mean, decimals)
                    )
        books[s] = cents
    return books


def encode_pq(
    emb: DataFrame,
    model: PQModel,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """(id, v) -> (id, code binary): m bytes per vector, one sub-GEMM
    per subspace per Arrow batch. Map-side only."""
    books = model.codebooks
    m, k, dsub = books.shape

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents2 = (books**2).sum(axis=2)  # (m, k)
        for pdf in batches:
            if not len(pdf):
                continue
            x = _unit(np.array(pdf[vec_col].tolist(), dtype=np.float64))
            codes = np.empty((len(x), m), dtype=np.uint8)
            for s in range(m):
                sub = x[:, s * dsub : (s + 1) * dsub]
                d2 = -2.0 * sub @ books[s].T + cents2[s][None, :]
                codes[:, s] = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "code": [c.tobytes() for c in codes]}
            )

    return emb.select(id_col, vec_col).mapInPandas(
        gen, schema=f"{id_col} bigint, code binary"
    )


def reconstruct(codes: np.ndarray, model: PQModel) -> np.ndarray:
    """Decode (n, m) uint8 codes back to (n, dim) approximate vectors."""
    parts = [model.codebooks[s][codes[:, s]] for s in range(model.m)]
    return np.concatenate(parts, axis=1)


def adc_table(
    query: np.ndarray, model: PQModel, normalize: bool = True
) -> np.ndarray:
    """(m, k) table of per-subspace squared-L2 contributions of the
    (unit-normalized) query against every codeword.

    ``normalize=False`` takes the input as-is — the IVFADC path passes
    a query RESIDUAL (unit(q) - centroid), which must not be
    re-normalized or the residual geometry breaks."""
    q = np.asarray(query, dtype=np.float64)
    if normalize:
        n = np.linalg.norm(q)
        if n > 0:
            q = q / n
    lut = np.empty((model.m, model.k), dtype=np.float64)
    for s in range(model.m):
        diff = model.codebooks[s] - q[s * model.dsub : (s + 1) * model.dsub][None, :]
        lut[s] = (diff**2).sum(axis=1)
    return lut


def pq_topk(
    codes_df: DataFrame,
    model: PQModel,
    query: list[float] | np.ndarray,
    top_k: int = 10,
    id_col: str = "vec_id",
    decimals: int | None = None,
) -> DataFrame:
    """ADC top-k over a PQ-coded frame: (id, adc_dist), ascending.

    The scan reads m BYTES per row and does an (m,) LUT gather + sum —
    no decode, no vectors in flight. The final top-k is
    TakeOrderedAndProject (no global sort materialization).

    ``decimals`` rounds the distance JVM-side BEFORE the ordering (ties
    then break on id), so a relational twin summing the per-subspace
    contributions in a different order lands on the same top-k set."""
    lut = adc_table(np.asarray(query, dtype=np.float64), model)
    m = model.m

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = np.arange(m)
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.frombuffer(
                b"".join(pdf["code"]), dtype=np.uint8
            ).reshape(len(pdf), m)
            dist = lut[rows[None, :], codes].sum(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "adc_dist": dist})

    scored = codes_df.select(id_col, "code").mapInPandas(
        gen, schema=f"{id_col} bigint, adc_dist double"
    )
    if decimals is not None:
        scored = scored.withColumn("adc_dist", F.round("adc_dist", decimals))
    return scored.orderBy(F.asc("adc_dist"), F.asc(id_col)).limit(top_k)


# ---- IVFADC: coarse quantizer + residual PQ (round 14) ----
#
# FAISS's workhorse index (Jégou, Douze & Schmid 2011, "Product
# Quantization for Nearest Neighbor Search" §IV): the coarse IVF
# quantizer routes each vector to a cell, PQ encodes the RESIDUAL
# unit(v) - centroid(cell), and a query probes nprobe cells, scanning
# only those cells' m-byte codes with a PER-CELL ADC table built from
# the query's residual against that cell. The identity
# ||q - u||^2 == ||(q - c) - (u - c)||^2 holds exactly for ANY cell
# centroid c, so the approximation error is purely the PQ
# quantization of the residual — which is far smaller than the
# quantization of the raw vector because residuals concentrate near
# the origin (the reason FAISS encodes residuals at all).
#
# 100 TB posture: memory is m bytes/vector (the codes) + O(k_cells*d)
# model state; a probe scans ~nprobe/n_cells of the codes. Both
# fit (driver-side, bounded sample) and encode (mapInPandas, one
# GEMM per subspace per Arrow batch) are linear, shuffle-free.


def _coarse_parts(
    cents: list[tuple[int, list[float]]],
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(cell_ids, C, Cn): sorted cell ids, raw centroid matrix, and
    unit-normalized rows — the exact matrices assign_cells_arrow
    builds, shared so assignment conventions cannot drift."""
    cells = np.array([c for c, _ in sorted(cents)], dtype=np.int64)
    C = np.array([cv for _, cv in sorted(cents)], dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    return cells, C, Cn


def fit_ivfpq(
    emb: DataFrame,
    cents: list[tuple[int, list[float]]],
    m: int = 8,
    k: int = 16,
    iters: int = 5,
    sample_n: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "v",
    decimals: int | None = None,
) -> PQModel:
    """Train RESIDUAL codebooks on the ``sample_n`` lowest-id vectors:
    each sample row is assigned to its argmax-cosine coarse cell
    (assign_cells_arrow's convention: ties -> lowest cell id,
    zero-norm rows dropped — safe under the fixture's no-zero-vectors
    pin) and the training matrix is unit(v) - raw_centroid(cell),
    pooled across cells (FAISS's shared-residual-codebook design).
    The Lloyd loop is _lloyd_books — byte-identical arithmetic to
    fit_pq."""
    rows = (
        emb.select(id_col, vec_col).orderBy(id_col).limit(sample_n).collect()
    )
    if not rows:
        raise ValueError("fit_ivfpq: empty embedding frame")
    M = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(M, axis=1, keepdims=True)
    keep = norms[:, 0] > 0.0
    M, norms = M[keep], norms[keep]
    U = M / norms
    _, C, Cn = _coarse_parts(cents)
    idx = np.argmax(U @ Cn.T, axis=1)
    return PQModel(_lloyd_books(U - C[idx], m, k, iters, decimals))


def encode_ivfpq(
    assigned: DataFrame,
    cents: list[tuple[int, list[float]]],
    model: PQModel,
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cell, u) -> (id, cell, code): PQ codes of the residual
    u - raw_centroid(cell). Consumes assign_cells_arrow's output (its
    ``u`` column is already unit-normalized), pure mapInPandas — one
    centroid gather + one sub-GEMM per subspace per Arrow batch."""
    books = model.codebooks
    m, k, dsub = books.shape
    cells_sorted, C, _ = _coarse_parts(cents)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents2 = (books**2).sum(axis=2)  # (m, k)
        for pdf in batches:
            if not len(pdf):
                continue
            U = np.vstack(pdf["u"].to_numpy()).astype(np.float64)
            ci = np.searchsorted(cells_sorted, pdf["cell"].to_numpy())
            R = U - C[ci]
            codes = np.empty((len(R), m), dtype=np.uint8)
            for s in range(m):
                sub = R[:, s * dsub : (s + 1) * dsub]
                d2 = -2.0 * sub @ books[s].T + cents2[s][None, :]
                codes[:, s] = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "cell": pdf["cell"],
                    "code": [c.tobytes() for c in codes],
                }
            )

    return assigned.select(id_col, "cell", "u").mapInPandas(
        gen, schema=f"{id_col} bigint, cell bigint, code binary"
    )


def ivfpq_topk(
    codes_df: DataFrame,
    cents: list[tuple[int, list[float]]],
    model: PQModel,
    query: list[float] | np.ndarray,
    top_k: int = 10,
    id_col: str = "vec_id",
    decimals: int | None = None,
) -> DataFrame:
    """ADC top-k over an IVFADC-coded frame (already filtered to the
    probed cells): (id, cell, adc_dist) ascending. Per-cell LUTs are
    built driver-side from the query residual unit(q) - centroid(cell)
    — O(n_cells * m * k) floats of model state — and the scan is a
    per-row (cell, code) double gather + sum: m bytes read per row,
    no vectors in flight, TakeOrderedAndProject for the cut."""
    q = np.asarray(query, dtype=np.float64)
    n = np.linalg.norm(q)
    if n == 0:
        raise ValueError("ivfpq_topk: zero-norm query")
    qu = q / n
    cells_sorted, C, _ = _coarse_parts(cents)
    luts = np.stack(
        [adc_table(qu - C[j], model, normalize=False) for j in range(len(C))]
    )  # (n_cells, m, k)
    m = model.m

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = np.arange(m)
        for pdf in batches:
            if not len(pdf):
                continue
            cp = np.searchsorted(cells_sorted, pdf["cell"].to_numpy())
            codes = np.frombuffer(
                b"".join(pdf["code"]), dtype=np.uint8
            ).reshape(len(pdf), m)
            dist = luts[cp[:, None], rows[None, :], codes].sum(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "cell": pdf["cell"],
                    "adc_dist": dist,
                }
            )

    scored = codes_df.select(id_col, "cell", "code").mapInPandas(
        gen, schema=f"{id_col} bigint, cell bigint, adc_dist double"
    )
    if decimals is not None:
        scored = scored.withColumn("adc_dist", F.round("adc_dist", decimals))
    return scored.orderBy(F.asc("adc_dist"), F.asc(id_col)).limit(top_k)
