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
