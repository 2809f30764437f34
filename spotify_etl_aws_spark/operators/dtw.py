"""Dynamic-time-warping sequence similarity search — the
trajectory/time-series analogue of the vector top-k lanes (REPOSE,
ICDE 2021 motivates distributed top-k trajectory search; this is the
Spark-idiomatic form: parallel ACROSS series, exact DP within).

``dtw_distance``: classic unit DP over two integer series —
``D(i,j) = |a_i − b_j| + min(D(i−1,j), D(i,j−1), D(i−1,j−1))`` with
``D(0,0) = 0`` and the first row/column unreachable (∞) except through
the origin. Pure int64 arithmetic end to end, so the distance is
bit-reproducible and oracle-checkable (the DuckDB twin replays the DP
as a recursive CTE advancing every candidate series one anti-diagonal
per level — three-predecessor recurrences carry the previous diagonal
forward, the ``order_pack_whole_docs`` pattern generalized to 2-D).

``dtw_lower_bound``: a cheap O((n+m)·log) admissible bound (never
exceeds the true DTW distance — property-tested) in the LB_Kim /
LB_Yi family (Kim et al. ICDE 2001; Yi et al. ICDE 1998), tightened
for the unconstrained DTW here: every warping path pins cells (1,1)
and (n,m) exactly, and every interior point of either series must
align with SOME point of the other, contributing at least its
distance to the other side's value SET (not just its [min, max]
envelope — a sorted-array ``searchsorted`` gives the nearest-value
gap in O(log)). LB_Keogh's positional envelope does NOT apply:
unconstrained DTW has no Sakoe-Chiba band, so any point may align
with any position and only value-set structure survives as a bound.

Scale posture (round-9 redesign, measured in
``experiments/dtw_scale.py``): the naive house-pattern cascade — a
separate LB pass, then exact DP on survivors — LOSES here even at
99.9 % pruning, because at realistic series lengths the dominant cost
is the per-series ``applyInPandas`` group round-trip, not the DP, and
a cascade pays that overhead twice plus an upstream recompute per
stage. The winning shape is a SINGLE pass, the per-partition-heap
idea behind ``TakeOrderedAndProject`` lifted to the Python level:

- repartition by series id, sort within partitions by (id, pos) — one
  shuffle, series become contiguous runs;
- ``mapInPandas`` streams MANY series per Arrow batch through one
  Python call, maintaining a partition-local top-k heap; the heap's
  worst distance is an evolving threshold τ, and a series whose
  ``dtw_lower_bound`` exceeds τ skips its O(n·m) DP entirely (the
  cheap-filter→exact-verify house pattern, fused into the scoring
  pass instead of staged before it);
- each partition emits at most k rows; ``TakeOrderedAndProject``
  merges the per-partition heaps.

Exactness: a skipped series has dist >= LB > τ = the partition's
current k-th best (d, id) distance, so it can never enter the
partition's top-k, and the union of exact per-partition top-ks
contains the global top-k (pinned by a pruned-vs-unpruned equality
test; the bound itself is property-tested admissible).

Measured envelope (experiments/dtw_scale.py): the single-pass kernel
beats the exhaustive twin at EVERY probed scale on overhead alone
(uniform lane, ~0 % skip: 3.1 s vs 7.0 s at 10×), and the LB skip
compounds it where τ gets competitive — 80 % skip on the replica-
heavy 100× lane (5.0 s vs 12.1 s vs DuckDB's 70 s) and 99.9 % on
separated retrieval geometry (6.3×). Boundary, recorded honestly:
τ is PARTITION-local, so the skip needs ≥ k competitive series per
partition (duplicate/clustered corpora) or a regime-separated bulk;
on same-regime data with a sparse near-family the ~27 %-tight bound
cannot separate candidates (no tighter bound exists for
unconstrained DTW — only value-set structure survives without a
warping band) and the pass degrades gracefully to exhaustive cost
plus one shuffle (0.89× on the long-series sparse probe). The DP is
O(len_a × len_b) INSIDE a task, the fan-out is across series — a
million users cost a million independent heap inserts, not a bigger
matrix. ``max_len`` fails a pathological series fast (the
``max_series_points`` precedent) instead of silently buffering an
O(L²) DP in one straggler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: cell penalty standing in for "forbidden" in the oracle's banded DP
#: (the min-plus prefix-scan closure must run over every j, so
#: out-of-band cells carry a cost no feasible path can reach instead
#: of being absent; 2^50 dwarfs any cent-scaled path total while
#: row-length × CELL_INF sums stay far inside int64)
CELL_INF = 1 << 50


def dtw_distance(a, b, band: int | None = None) -> int:
    """Exact integer DTW distance between two int sequences.

    ``band``: optional Sakoe-Chiba radius — warping cells are
    restricted to ``|i − j| <= band`` (1-based positions). Requires
    ``band >= |len(a) − len(b)|`` (otherwise no warping path exists:
    the operator fails loud). ``band=None`` is the unconstrained DP.
    """
    a = [int(x) for x in a]
    b = [int(x) for x in b]
    if not a or not b:
        raise ValueError("dtw_distance: empty series")
    w = None
    if band is not None:
        w = int(band)
        if w < 0:
            raise ValueError(f"band must be >= 0, got {band}")
        if abs(len(a) - len(b)) > w:
            raise ValueError(
                f"dtw_distance: band={w} < length difference "
                f"{abs(len(a) - len(b))}; no warping path exists "
                "within the band"
            )
    m = len(b)
    INF = 1 << 62
    prev = [INF] * (m + 1)
    prev[0] = 0  # D(0, 0); D(0, j>0) stays INF
    for i, ai in enumerate(a, 1):
        cur = [INF] * (m + 1)
        jlo = 1 if w is None else max(1, i - w)
        jhi = m if w is None else min(m, i + w)
        for j in range(jlo, jhi + 1):
            best = min(prev[j], cur[j - 1], prev[j - 1])
            if best < INF:
                cur[j] = abs(ai - b[j - 1]) + best
        prev = cur
    return prev[m]


def sakoe_chiba_envelope(q, band: int):
    """(L, U) envelope of ``q`` under a Sakoe-Chiba band: for each
    candidate position j (1-based, up to ``len(q) + band`` — the
    longest feasible partner), the min/max of q over the positions a
    banded warping path allows j to align with
    (``q[max(1, j−band) .. min(m, j+band)]``). This is the LB_Keogh
    envelope (Keogh & Ratanamahatana, KAIS 2005) — admissible HERE
    because the band restores the positional structure the
    unconstrained DP lacks."""
    import numpy as np

    w = int(band)
    if w < 0:
        raise ValueError(f"band must be >= 0, got {band}")
    qa = np.asarray([int(x) for x in q], dtype=np.int64)
    m = len(qa)
    if not m:
        raise ValueError("sakoe_chiba_envelope: empty series")
    L = np.empty(m + w, dtype=np.int64)
    U = np.empty(m + w, dtype=np.int64)
    for j in range(1, m + w + 1):
        lo, hi = max(1, j - w), min(m, j + w)
        window = qa[lo - 1 : hi]
        L[j - 1], U[j - 1] = window.min(), window.max()
    return L, U


def _envelope_bound(
    x, Ly, Uy, y_first: int, y_last: int, y_len: int
) -> int:
    """LB_Keogh-style one-direction bound for BANDED DTW: endpoints
    exact (cells (1,1) and (n,m) are on every path — distinct cells
    unless both series are single points), each interior x_j at least
    its distance to y's banded envelope at position j. Caller
    guarantees feasibility (len(x) <= len(envelope))."""
    import numpy as np

    end = abs(int(x[0]) - y_first)
    if len(x) > 1 or y_len > 1:
        end += abs(int(x[-1]) - y_last)
    if len(x) <= 2:
        return end
    interior = np.asarray(x[1:-1], dtype=np.int64)
    lo = Ly[1 : len(x) - 1]
    hi = Uy[1 : len(x) - 1]
    near = np.maximum(
        np.maximum(interior - hi, lo - interior), 0
    )
    return end + int(near.sum())


def _hybrid_bound(x, y) -> int:
    """Endpoint-exact + interior set-distance bound, one direction:
    sum over x's points of a per-point floor. Cells (1,1) and (n,m)
    are on every path (distinct cells unless both series are single
    points), so x's endpoints contribute |x_0 − y_0| and
    |x_-1 − y_-1| exactly; each interior x_j aligns with some y value,
    contributing at least its nearest-value gap. All counted cells
    are distinct (one per x row), so the sum is admissible."""
    import numpy as np

    end = abs(int(x[0]) - int(y[0]))
    if len(x) > 1 or len(y) > 1:
        end += abs(int(x[-1]) - int(y[-1]))
    if len(x) <= 2:
        return end
    ys = np.sort(np.asarray(y, dtype=np.int64))
    interior = np.asarray(x[1:-1], dtype=np.int64)
    pos = np.searchsorted(ys, interior)
    left = ys[np.clip(pos - 1, 0, len(ys) - 1)]
    right = ys[np.clip(pos, 0, len(ys) - 1)]
    near = np.minimum(np.abs(interior - left), np.abs(interior - right))
    return end + int(near.sum())


def dtw_lower_bound(a, b, band: int | None = None) -> int:
    """Admissible lower bound on ``dtw_distance(a, b, band)`` — max of
    the hybrid endpoint+set bound in both directions (each direction
    sums over one series' points; both are valid, the max is tighter).
    O((n+m) log(n+m)) vs the DP's O(n·m).

    With ``band``, additionally takes the LB_Keogh envelope bounds in
    both directions — the positional structure the band restores makes
    them admissible (banded DTW >= unconstrained DTW, so the value-set
    bounds stay valid too; the max of all four is tightest). Same
    feasibility contract as ``dtw_distance``."""
    a = [int(v) for v in a]
    b = [int(v) for v in b]
    if not a or not b:
        raise ValueError("dtw_lower_bound: empty series")
    lb = max(_hybrid_bound(a, b), _hybrid_bound(b, a))
    if band is None:
        return lb
    w = int(band)
    if abs(len(a) - len(b)) > w:
        raise ValueError(
            f"dtw_lower_bound: band={w} < length difference "
            f"{abs(len(a) - len(b))}; no warping path exists within "
            "the band"
        )
    Lb_, Ub_ = sakoe_chiba_envelope(b, w)
    La_, Ua_ = sakoe_chiba_envelope(a, w)
    return max(
        lb,
        _envelope_bound(a, Lb_, Ub_, b[0], b[-1], len(b)),
        _envelope_bound(b, La_, Ua_, a[0], a[-1], len(a)),
    )


def dtw_topk_search(
    series: DataFrame,
    query: list[int],
    k: int,
    id_col: str = "series_id",
    pos_col: str = "pos",
    val_col: str = "val",
    max_len: int = 100_000,
    prune: bool = True,
    band: int | None = None,
) -> DataFrame:
    """Top-k series nearest to ``query`` under exact integer DTW.

    ``series``: (id, pos, val) long rows — one point per row, ``pos``
    gives the within-series order (ties broken by the caller's
    construction). Returns (series_id, dtw_dist) — the k smallest
    distances with a series-id tie-break, cut via
    ``TakeOrderedAndProject`` (per-partition heaps, no global sort).

    ``prune=True`` (default) runs the single-pass partition-heap
    search with the LB early-skip documented in the module docstring;
    ``prune=False`` exact-scores every series (one ``applyInPandas``
    group each) — the verification twin. Results are identical by
    construction (pinned in tests/test_dtw.py).

    ``band``: optional Sakoe-Chiba radius (the practitioner form for
    long series — REPOSE-style systems constrain the warp). SEARCH
    semantics for infeasibility: a candidate whose length differs from
    the query's by more than ``band`` has no warping path and is
    DROPPED (it is simply "not similar"), unlike ``dtw_distance``
    which raises on a direct call. The band restores positional
    structure, so the LB gains the LB_Keogh envelope term — the
    tighter bound unconstrained DTW cannot have (measured boundary,
    BASELINE.md round 9)."""
    import heapq

    import pandas as pd

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not query:
        raise ValueError("query series is empty")
    q = [int(x) for x in query]
    limit = int(max_len)
    topk = int(k)
    w = None if band is None else int(band)
    if w is not None:
        if w < 0:
            raise ValueError(f"band must be >= 0, got {band}")
        env_L, env_U = sakoe_chiba_envelope(q, w)

    # long-id contract, validated IN the plan (rides the main action,
    # no extra job): a non-numeric id column (e.g. UUID strings) would
    # cast to NULL, silently collapsing every series into one group —
    # raise with the offending value instead
    id_cast = F.col(id_col).cast("long")
    prepared = series.select(
        F.when(
            id_cast.isNull(),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"dtw_topk_search: id column {id_col!r} must "
                        "cast to long (long-id contract); got "
                    ),
                    F.coalesce(F.col(id_col).cast("string"), F.lit("NULL")),
                )
            ).cast("long"),
        )
        .otherwise(id_cast)
        .alias("__id"),
        F.col(pos_col).cast("long").alias("__pos"),
        F.col(val_col).cast("long").alias("__val"),
    )

    def _check_len(sid, n: int) -> None:
        if n > limit:
            raise ValueError(
                f"dtw_topk_search: series {sid!r} has {n} points > "
                f"max_len={limit}; downsample (e.g. lttb_downsample) "
                "or raise the guard explicitly"
            )

    def _infeasible(n: int) -> bool:
        return w is not None and abs(n - len(q)) > w

    if not prune:
        # exhaustive twin: one Arrow batch per series, exact DP each.
        # The DP runs on Python ints (no silent int64 wraparound);
        # results are bounded by sum(|a_i - b_j|) over the path, well
        # inside int64 for cent-scaled fixtures.
        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame(
                {
                    "series_id": pd.Series([], dtype="int64"),
                    "dtw_dist": pd.Series([], dtype="int64"),
                }
            )
            _check_len(pdf["__id"].iloc[0], len(pdf))
            if _infeasible(len(pdf)):
                return empty
            pdf = pdf.sort_values("__pos")
            d = dtw_distance(pdf["__val"].tolist(), q, band=w)
            return pd.DataFrame(
                {"series_id": [int(pdf["__id"].iloc[0])], "dtw_dist": [d]}
            )

        scored = prepared.groupBy("__id").applyInPandas(
            kernel, "series_id bigint, dtw_dist bigint"
        )
        return scored.orderBy("dtw_dist", "series_id").limit(k)

    def part_topk(batches):
        # partition-local top-k: min-heap of (-d, -id) so heap[0] is
        # the WORST kept (largest (d, id)); τ = that distance
        heap: list[tuple[int, int]] = []
        carry_id = None
        carry_vals: list[int] = []

        def consider(sid: int, vals: list[int]) -> None:
            _check_len(sid, len(vals))
            if _infeasible(len(vals)):
                return  # no warping path within the band: dropped
            if len(heap) == topk:
                tau = -heap[0][0]
                lb = max(_hybrid_bound(vals, q), _hybrid_bound(q, vals))
                if w is not None and lb <= tau:
                    lb = max(
                        lb,
                        _envelope_bound(
                            vals, env_L, env_U, q[0], q[-1], len(q)
                        ),
                    )
                if lb > tau:
                    return  # dist >= LB > τ: cannot enter the top-k
            d = dtw_distance(vals, q, band=w)
            item = (-d, -sid)
            if len(heap) < topk:
                heapq.heappush(heap, item)
            elif item > heap[0]:  # (d, sid) < current worst (d, id)
                heapq.heapreplace(heap, item)

        for pdf in batches:
            if not len(pdf):
                continue
            # partition is sorted by (__id, __pos): series are
            # contiguous runs; only a batch's LAST run can spill into
            # the next batch, so one carry buffer suffices
            for sid, g in pdf.groupby("__id", sort=False):
                vals = g["__val"].tolist()
                if carry_id == sid:
                    carry_vals.extend(vals)
                else:
                    if carry_id is not None:
                        consider(carry_id, carry_vals)
                    carry_id, carry_vals = int(sid), vals
        if carry_id is not None:
            consider(carry_id, carry_vals)
        if heap:
            yield pd.DataFrame(
                {
                    "series_id": [-s for _, s in heap],
                    "dtw_dist": [-d for d, _ in heap],
                }
            )

    scored = (
        prepared.repartition("__id")
        .sortWithinPartitions("__id", "__pos")
        .mapInPandas(part_topk, "series_id bigint, dtw_dist bigint")
    )
    return scored.orderBy("dtw_dist", "series_id").limit(k)
