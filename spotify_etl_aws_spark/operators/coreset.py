"""Diversity selection by greedy k-center (farthest-first traversal,
Gonzalez 1985; the coreset active-selection of Sener & Savarese, ICLR
2018) — the "pick k maximally-different examples" operator a curation
pipeline runs to seed labeling, prompt few-shots, or eval panels from
a 100 TB corpus.

Semantics (deterministic, cross-engine exact):

- seed = the lowest id;
- coverage(x) = max over already-chosen c of round(cos(x, c), decimals)
  — how well x is already represented;
- each step picks the row with MINIMUM coverage (ties -> lowest id):
  the point farthest from everything chosen so far. Rounding before
  the argmin makes the decision grid engine-independent (round is
  monotone, so per-term rounding commutes with the max).

Scale shape: k-1 passes, each ONE linear map-side scan — cosine
against <= k broadcast literal vectors (model state, exactly like the
IVF centroids) fused into whole-stage codegen — finished by a
TakeOrderedAndProject(1). No shuffle wider than a top-1 reduce, no
pairwise joins, nothing but k scalars ever on the driver. The 2-approx
guarantee of greedy k-center is what makes k passes enough — no
iterate-to-convergence loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine


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
        terms = [
            F.round(
                cosine(F.col(vec_col), F.array(*[F.lit(x) for x in cv])),
                decimals,
            )
            for cv in vecs
        ]
        cov = terms[0] if len(terms) == 1 else F.greatest(*terms)
        pick = (
            emb.select(id_col, vec_col)
            .filter(~F.col(id_col).isin([c[1] for c in chosen]))
            .select(id_col, vec_col, cov.alias("coverage"))
            .orderBy(F.asc("coverage"), F.asc(id_col))
            .limit(1)
            .collect()
        )
        if not pick:  # fewer than k rows in the frame
            break
        chosen.append((rank, pick[0][0], float(pick[0]["coverage"])))
        vecs.append(list(pick[0][1]))
    return chosen
