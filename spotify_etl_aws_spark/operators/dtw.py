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

Scale posture: one Arrow batch per candidate series
(``applyInPandas``), the query series broadcast in the closure
(bounded, collected once); the DP is O(len_a × len_b) INSIDE a task,
the fan-out is across series — a million users cost a million
independent tasks, not a bigger matrix. ``max_len`` fails a
pathological series fast (the ``max_series_points`` precedent) instead
of silently buffering an O(L²) DP in one straggler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dtw_distance(a, b) -> int:
    """Exact integer DTW distance between two int sequences."""
    a = [int(x) for x in a]
    b = [int(x) for x in b]
    if not a or not b:
        raise ValueError("dtw_distance: empty series")
    m = len(b)
    INF = 1 << 62
    prev = [INF] * (m + 1)
    prev[0] = 0  # D(0, 0); D(0, j>0) stays INF
    for ai in a:
        cur = [INF] * (m + 1)
        for j in range(1, m + 1):
            best = min(prev[j], cur[j - 1], prev[j - 1])
            if best < INF:
                cur[j] = abs(ai - b[j - 1]) + best
        prev = cur
    return prev[m]


def dtw_topk_search(
    series: DataFrame,
    query: list[int],
    k: int,
    id_col: str = "series_id",
    pos_col: str = "pos",
    val_col: str = "val",
    max_len: int = 100_000,
) -> DataFrame:
    """Top-k series nearest to ``query`` under exact integer DTW.

    ``series``: (id, pos, val) long rows — one point per row, ``pos``
    gives the within-series order (ties broken by the caller's
    construction). Returns (series_id, dtw_dist) — the k smallest
    distances with a series-id tie-break, cut via
    ``TakeOrderedAndProject`` (per-partition heaps, no global sort).
    """
    import pandas as pd

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not query:
        raise ValueError("query series is empty")
    q = [int(x) for x in query]
    limit = int(max_len)

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

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > limit:
            raise ValueError(
                f"dtw_topk_search: series {pdf['__id'].iloc[0]!r} has "
                f"{len(pdf)} points > max_len={limit}; downsample "
                "(e.g. lttb_downsample) or raise the guard explicitly"
            )
        pdf = pdf.sort_values("__pos")
        d = dtw_distance(pdf["__val"].tolist(), q)
        return pd.DataFrame(
            {"series_id": [int(pdf["__id"].iloc[0])], "dtw_dist": [d]}
        )

    # the DP runs on Python ints (no silent int64 wraparound); results
    # are bounded by sum(|a_i - b_j|) over the path, well inside int64
    # for cent-scaled fixtures
    scored = prepared.groupBy("__id").applyInPandas(
        kernel, "series_id bigint, dtw_dist bigint"
    )
    return scored.orderBy("dtw_dist", "series_id").limit(k)
