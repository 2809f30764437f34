"""Diversity selection by greedy k-center (farthest-first traversal,
Gonzalez 1985; the coreset active-selection of Sener & Savarese, ICLR
2018) — the "pick k maximally-different examples" operator a curation
pipeline runs to seed labeling, prompt few-shots, or eval panels from
a 100 TB corpus.

Semantics (deterministic, cross-engine exact):

- seed = the lowest id;
- coverage(x) = max over already-chosen c of round(cos(x, c), decimals)
  — how well x is already represented (rounding half-away-from-zero,
  the SQL round() convention);
- each step picks the row with MINIMUM coverage (ties -> lowest id):
  the point farthest from everything chosen so far. Rounding before
  the argmin makes the decision grid engine-independent (round is
  monotone, so per-term rounding commutes with the max).

Scale shape: k-1 passes, each ONE linear scan — an Arrow batch GEMM
against the <= k chosen vectors (model state broadcast in the task
closure, exactly like the IVF centroids) that pre-reduces to ONE
candidate row per batch, finished by a TakeOrderedAndProject(1) over
those per-batch winners. No shuffle wider than a top-1 reduce, no
pairwise joins, nothing but k scalars ever on the driver. The GEMM
kernel is the measured choice (operators/vector_ops.py precedent):
the JVM higher-order-function form — kept below as the
cross-validation reference — evaluates an interpreted 64-term
aggregate per (row, chosen) pair and measured ~9x slower per scan at
200k vectors (7.56 vs 0.86 s/scan, experiments/round10_scale.py,
picks identical). The 2-approx guarantee
of greedy k-center is what makes k passes enough — no
iterate-to-convergence loop.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine
from .pq import _round_away


def _unit_rows(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return x / n


def _coverage_expr(vec_col: str, vecs: list[list[float]], decimals: int):
    """JVM expression form of the coverage — the independent REFERENCE
    formulation for the Arrow kernel (cross-validated in
    tests/test_coreset.py); not the production path."""
    terms = [
        F.round(
            cosine(F.col(vec_col), F.array(*[F.lit(x) for x in cv])),
            decimals,
        )
        for cv in vecs
    ]
    return terms[0] if len(terms) == 1 else F.greatest(*terms)


def _min_coverage_pick(
    emb: DataFrame,
    vecs: list[list[float]],
    exclude: list[int],
    id_col: str,
    vec_col: str,
    decimals: int,
) -> list:
    """One selection step: Arrow GEMM coverage + per-batch local top-1,
    then a global TakeOrdered(1) on (coverage, id). Returns the picked
    row [(id, v, coverage)] (empty if no candidates remain)."""
    books = _unit_rows(np.array(vecs, dtype=np.float64))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            cov = _round_away(_unit_rows(x) @ books.T, decimals).max(axis=1)
            ids = pdf[id_col].to_numpy()
            best = np.lexsort((ids, cov))[0]
            yield pd.DataFrame(
                {
                    id_col: [ids[best]],
                    vec_col: [list(x[best])],
                    "coverage": [cov[best]],
                }
            )

    return (
        emb.select(id_col, vec_col)
        .filter(~F.col(id_col).isin(exclude))
        .mapInPandas(
            gen,
            schema=f"{id_col} bigint, {vec_col} array<double>, coverage double",
        )
        .orderBy(F.asc("coverage"), F.asc(id_col))
        .limit(1)
        .collect()
    )


def kcenter_select(
    emb: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "v",
    decimals: int = 6,
) -> list[tuple[int, int, float | None]]:
    """Greedy farthest-first selection of ``k`` rows.

    Returns [(sel_rank, id, coverage_at_selection)] — coverage is None
    for the seed (nothing was chosen before it). The list is SELECTION
    STATE (k scalars), not data; wrap it in a DataFrame for downstream
    joins."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    seed = emb.select(id_col, vec_col).orderBy(id_col).limit(1).collect()
    if not seed:
        raise ValueError("kcenter_select: empty embedding frame")
    chosen: list[tuple[int, int, float | None]] = [(1, seed[0][0], None)]
    vecs = [list(seed[0][1])]
    for rank in range(2, k + 1):
        pick = _min_coverage_pick(
            emb, vecs, [c[1] for c in chosen], id_col, vec_col, decimals
        )
        if not pick:  # fewer than k rows in the frame
            break
        chosen.append((rank, pick[0][0], float(pick[0]["coverage"])))
        vecs.append(list(pick[0][1]))
    return chosen


def _max_mmr_pick(
    emb: DataFrame,
    query: list[float],
    vecs: list[list[float]],
    exclude: list[int],
    lam: float,
    mu: float,
    id_col: str,
    vec_col: str,
    decimals: int,
) -> list:
    """One MMR step: score = lam*rel - mu*maxsim from 6dp-rounded
    ingredients (identical doubles on both engines, so the two
    IEEE multiplies and one subtract are bit-deterministic), Arrow
    GEMM + per-batch local top-1, global TakeOrdered(1) on
    (-score, id)."""
    books = _unit_rows(np.array(vecs, dtype=np.float64))
    uq = _unit_rows(np.array([query], dtype=np.float64))[0]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            ux = _unit_rows(x)
            rel = _round_away(ux @ uq, decimals)
            maxsim = _round_away(ux @ books.T, decimals).max(axis=1)
            score = lam * rel - mu * maxsim
            ids = pdf[id_col].to_numpy()
            best = np.lexsort((ids, -score))[0]
            yield pd.DataFrame(
                {
                    id_col: [ids[best]],
                    vec_col: [list(x[best])],
                    "relevance": [rel[best]],
                    "mmr_score": [score[best]],
                }
            )

    return (
        emb.select(id_col, vec_col)
        .filter(~F.col(id_col).isin(exclude))
        .mapInPandas(
            gen,
            schema=(
                f"{id_col} bigint, {vec_col} array<double>,"
                " relevance double, mmr_score double"
            ),
        )
        .orderBy(F.desc("mmr_score"), F.asc(id_col))
        .limit(1)
        .collect()
    )


def mmr_select(
    emb: DataFrame,
    query: list[float],
    k: int,
    lam: float = 0.7,
    mu: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "v",
    decimals: int = 6,
) -> list[tuple[int, int, float, float | None]]:
    """Maximal Marginal Relevance selection (Carbonell & Goldstein,
    SIGIR 1998) — the relevance-AND-diversity dual of k-center: seed =
    argmax relevance to the query; each later step maximizes
    ``lam * rel(x) - mu * max_sim(x, selected)``. ``lam`` and ``mu``
    are INDEPENDENT literals, not lam/1-lam — ``1 - 0.7`` is not the
    double ``0.3``, and both engines must multiply by the same bits.

    rel and every pairwise similarity round to ``decimals`` first, so
    the score is two IEEE multiplies and a subtract over
    grid-identical doubles — bit-deterministic across engines.

    Returns [(sel_rank, id, relevance, mmr_score)] with a None score
    for the seed (it has no diversity penalty). Same scale shape as
    ``kcenter_select``: k-1 linear GEMM scans, k scalars on the
    driver."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    uq = _unit_rows(np.array([query], dtype=np.float64))[0]

    def seed_gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            rel = _round_away(_unit_rows(x) @ uq, decimals)
            ids = pdf[id_col].to_numpy()
            best = np.lexsort((ids, -rel))[0]
            yield pd.DataFrame(
                {
                    id_col: [ids[best]],
                    vec_col: [list(x[best])],
                    "relevance": [rel[best]],
                }
            )

    seed = (
        emb.select(id_col, vec_col)
        .mapInPandas(
            seed_gen,
            schema=f"{id_col} bigint, {vec_col} array<double>, relevance double",
        )
        .orderBy(F.desc("relevance"), F.asc(id_col))
        .limit(1)
        .collect()
    )
    if not seed:
        raise ValueError("mmr_select: empty embedding frame")
    out: list[tuple[int, int, float, float | None]] = [
        (1, seed[0][0], float(seed[0]["relevance"]), None)
    ]
    vecs = [list(seed[0][1])]
    for rank in range(2, k + 1):
        pick = _max_mmr_pick(
            emb, query, vecs, [c[1] for c in out], lam, mu,
            id_col, vec_col, decimals,
        )
        if not pick:
            break
        out.append(
            (
                rank,
                pick[0][0],
                float(pick[0]["relevance"]),
                float(pick[0]["mmr_score"]),
            )
        )
        vecs.append(list(pick[0][1]))
    return out
