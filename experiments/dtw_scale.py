"""Scale probe for the DTW top-k lane (`operators/dtw.py`): Spark vs
the DuckDB recursive-CTE twin (one DP row per recursion level for
EVERY candidate simultaneously) at 1×/10×/100× user counts — and the
round-9 single-pass partition-heap search (mapInPandas, many series
per Arrow batch, LB early-skip against the evolving partition τ)
measured against the exhaustive one-``applyInPandas``-group-per-series
twin (``prune=False``).

Why this shape (negative probe recorded): the first round-9 attempt
was the staged house-pattern cascade — a separate LB pass, seed-k
exact scores, τ as a scalar subquery, DP on survivors. Measured on
this lane it LOST at every scale, even at 99.9 % pruning
(100×: 24.96 s vs 12.65 s unpruned; sf0.1: 13.52 s vs 3.48 s),
because at ~30-point series the dominant cost is the per-series
Python group round-trip and the upstream aggregate recompute — both
of which the cascade pays 2-3×, while the DP it saves is only ~half
the unpruned cost. Fusing the LB skip INTO the single scoring pass
(partition-local top-k heap, the TakeOrderedAndProject idea at the
Python level) removes the per-series group overhead entirely and
keeps the LB's savings where the DP dominates.

Scenarios:

1. **The declared lane** (per-user daily spend vs the min-user's
   series). At 1×/10× the LB skips ~nothing by the data's nature:
   every user's series is a same-distribution random walk, so true
   DTW distances cluster tightly while the best admissible value-set
   bound reaches only ~27 % of the true distance (unconstrained DTW
   admits no positional LB_Keogh band). At 100× the amplification
   plants exact replicas of the query user, τ collapses to 0 and the
   LB skips ~everything. Both regimes are recorded.

2. **Separated retrieval geometry** (synthetic, probe-only): a small
   near-query family inside a bulk population in a shifted value
   regime — "find series like this one in a mixed corpus".

3. **Long series, sparse near-family** (5k × 1,000 points, ~50 near)
   — the technique's measured BOUNDARY, kept as a negative probe: τ
   is partition-local, so with fewer than k competitive series per
   partition (50 near over 32 partitions × k=20 heaps) and a
   same-regime bulk, the ~27 %-tight bound cannot separate candidates
   and the kernel degrades gracefully to exhaustive cost plus one
   shuffle (~0.9×). No tighter admissible bound exists for
   unconstrained DTW; the lever at need is candidate density per
   partition, not the bound.

Top-k results are asserted identical in-run (pruned == unpruned, and
== twin for scenario 1). skip_rate is a sequential replay of the same
heap+LB arithmetic on collected data (a partition sees a prefix of
the same decisions; the sequential rate is the converged upper end).

Run: python experiments/dtw_scale.py
"""

from __future__ import annotations

import heapq
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIRS = [
    ("sf0.1 (1x)", "/root/testdata/sf0.1"),
    ("10x", "/tmp/sf1-amp"),
    ("100x", "/tmp/sf10-amp"),
]

DTW_K = 20


def _daily_and_query(spark, d):
    """Replicates the lane's candidate construction (queries/
    selection.py:ts_dtw_topk_similarity) so the probe can drive
    dtw_topk_search with prune on/off."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from spotify_etl_aws_spark.sources.readers import load_table as t

    ev = t(spark, d, "events")
    daily = (
        ev.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("v"))
        .withColumn(
            "pos",
            F.row_number().over(W.partitionBy("user_id").orderBy("day")),
        )
    )
    q_user = ev.agg(F.min("user_id")).collect()[0][0]
    query = [
        int(r.v)
        for r in daily.filter(F.col("user_id") == q_user)
        .orderBy("day")
        .collect()
    ]
    return daily.filter(F.col("user_id") != q_user), query


def _skip_stats(pdf, query, k):
    """Sequential replay of the kernel's heap + LB-skip arithmetic
    (same public functions) on collected (sid, pos, val) data:
    how many DPs does the LB save?"""
    from spotify_etl_aws_spark.operators.dtw import (
        dtw_distance,
        dtw_lower_bound,
    )

    heap, skipped, n = [], 0, 0
    for _, g in pdf.sort_values(["sid", "pos"]).groupby("sid", sort=True):
        n += 1
        vals = g["val"].tolist()
        if len(heap) == k and dtw_lower_bound(vals, query) > -heap[0][0]:
            skipped += 1
            continue
        item = (-dtw_distance(vals, query), -int(g["sid"].iloc[0]))
        if len(heap) < k:
            heapq.heappush(heap, item)
        elif item > heap[0]:
            heapq.heapreplace(heap, item)
    return n, skipped


def _run_both(cands, query, id_col, pos_col, val_col):
    from spotify_etl_aws_spark.operators.dtw import dtw_topk_search

    out = {}
    for prune in (True, False):
        t0 = time.perf_counter()
        got = [
            (r.series_id, r.dtw_dist)
            for r in dtw_topk_search(
                cands,
                query,
                DTW_K,
                id_col=id_col,
                pos_col=pos_col,
                val_col=val_col,
                prune=prune,
            ).collect()
        ]
        out[prune] = (got, time.perf_counter() - t0)
    assert out[True][0] == out[False][0], (
        out[True][0][:3],
        out[False][0][:3],
    )
    return out[True][0], out[True][1], out[False][1]


def lane_scenario(spark) -> None:
    import duckdb
    from pyspark.sql import functions as F

    from spotify_etl_aws_spark.queries.selection import ORACLE_DTW

    print("== scenario 1: the declared lane (uniform spend series)")
    for label, d in DIRS:
        if not os.path.isdir(d):
            print(f"{label}: fixture missing, skipped", flush=True)
            continue
        cands, query = _daily_and_query(spark, d)
        got, t_pruned, t_plain = _run_both(
            cands, query, "user_id", "pos", "v"
        )
        pdf = cands.select(
            F.col("user_id").alias("sid"), "pos", F.col("v").alias("val")
        ).toPandas()
        n, skipped = _skip_stats(pdf, query, DTW_K)

        con = duckdb.connect(config={"threads": "32"})
        ev = f"{d}/events.parquet"
        src = f"'{ev}/*.parquet'" if os.path.isdir(ev) else f"'{ev}'"
        con.execute(f"CREATE VIEW events AS SELECT * FROM {src}")
        t0 = time.perf_counter()
        want = con.execute(ORACLE_DTW).fetchall()
        t_duck = time.perf_counter() - t0
        con.close()
        assert sorted(got) == sorted((u, int(c)) for u, c in want), (label,)

        print(
            f"{label:12s}: cands {n:7d}  heap+LB {t_pruned:6.2f}s  "
            f"exhaustive {t_plain:6.2f}s  duckdb {t_duck:6.2f}s  "
            f"skip_rate {skipped / n:5.1%}",
            flush=True,
        )


def _synthetic(spark, n_cands, n_pts, query, near_frac=0.01):
    """near family = query + small jitter; bulk = shifted regime."""
    from pyspark.sql import functions as F

    n_near = max(int(n_cands * near_frac), DTW_K + 2)
    pos = F.col("pos")
    base = spark.range(n_cands).select(
        F.col("id").alias("sid"),
        F.explode(F.sequence(F.lit(0), F.lit(n_pts - 1))).alias("pos"),
    )
    val = F.when(
        F.col("sid") < n_near,
        F.lit(100_000)
        + F.lit(1_000) * ((F.lit(7) * pos) % 13)
        + (F.col("sid") * 31 + pos * 17) % 97,
    ).otherwise(
        F.lit(500_000) + F.lit(1_000) * ((F.col("sid") + pos * 5) % 29)
    )
    return base.select("sid", "pos", val.cast("long").alias("val")), n_near


def separated_scenario(spark, n_cands=150_000, n_pts=60) -> None:
    from pyspark.sql import functions as F  # noqa: F401

    print(
        f"== scenario 2: separated geometry "
        f"({n_cands} candidates x {n_pts} points)"
    )
    query = [100_000 + 1_000 * ((7 * i) % 13) for i in range(n_pts)]
    cands, n_near = _synthetic(spark, n_cands, n_pts, query)
    got, t_pruned, t_plain = _run_both(cands, query, "sid", "pos", "val")
    assert all(s < n_near for s, _ in got)  # sanity: near family wins
    pdf = cands.toPandas()
    n, skipped = _skip_stats(pdf, query, DTW_K)
    print(
        f"sep {n_cands // 1000}k      : heap+LB {t_pruned:6.2f}s  "
        f"exhaustive {t_plain:6.2f}s  speedup {t_plain / t_pruned:4.2f}x  "
        f"skip_rate {skipped / n:5.1%}",
        flush=True,
    )


def long_series_scenario(spark, n_cands=5_000, n_pts=1_000) -> None:
    import time as _t

    from spotify_etl_aws_spark.operators.dtw import dtw_topk_search

    print(
        f"== scenario 3: long series ({n_cands} candidates x "
        f"{n_pts} points — DP-dominated)"
    )
    query = [100_000 + 1_000 * ((7 * i) % 13) for i in range(n_pts)]
    cands, n_near = _synthetic(spark, n_cands, n_pts, query)
    got, t_pruned, t_plain = _run_both(cands, query, "sid", "pos", "val")
    assert all(s < n_near for s, _ in got)
    print(
        f"long 5k      : heap+LB {t_pruned:6.2f}s  "
        f"exhaustive {t_plain:6.2f}s  speedup {t_plain / t_pruned:4.2f}x",
        flush=True,
    )
    # the long-series answer in practice is the band itself: O(n·band)
    # DP per candidate instead of O(n·m) — a different metric (not
    # compared to the unbanded results above), same kernel
    t0 = _t.perf_counter()
    banded = [
        (r.series_id, r.dtw_dist)
        for r in dtw_topk_search(
            cands, query, DTW_K, id_col="sid", pos_col="pos",
            val_col="val", band=10,
        ).collect()
    ]
    t_band = _t.perf_counter() - t0
    assert all(s < n_near for s, _ in banded)
    print(
        f"long 5k band=10: {t_band:6.2f}s (DP O(n·band) — "
        f"{t_plain / t_band:4.1f}x the unbanded exhaustive wall)",
        flush=True,
    )


def banded_scenario(spark, n_cands=150_000, n_pts=60, band=5) -> None:
    """What the Sakoe-Chiba band buys (round-9 close of the
    unconstrained boundary): a bulk of PHASE-SHIFTED copies of the
    query — same value multiset, different order — is invisible to
    any value-set bound (the only admissible family without a band;
    LB ≈ endpoint terms ≈ 0 here) but glaring to the LB_Keogh
    envelope the band makes admissible. Same heap kernel, banded DP
    (O(n·band) per candidate instead of O(n·m)), banded LB."""
    from pyspark.sql import functions as F

    from spotify_etl_aws_spark.operators.dtw import (
        dtw_lower_bound,
        dtw_topk_search,
    )

    print(
        f"== scenario 4: banded search, phase-shifted bulk "
        f"({n_cands} candidates x {n_pts} points, band={band})"
    )
    # a RAMP query: rotating its interior preserves the value multiset
    # AND the endpoints, so the value-set bound reads ~0 — only the
    # band's positional envelope can see the shift
    query = [1_000 * i for i in range(n_pts)]
    n_near = n_cands // 100
    pos = F.col("pos")
    base = spark.range(n_cands).select(
        F.col("id").alias("sid"),
        F.explode(F.sequence(F.lit(0), F.lit(n_pts - 1))).alias("pos"),
    )
    # near: the query + per-sid jitter; bulk: endpoints kept, interior
    # ramp rotated by 6..(n_pts-8) positions (same value multiset)
    shift = F.lit(6) + (F.col("sid") % (n_pts - 13))
    inner = n_pts - 2
    val = F.when(
        F.col("sid") < n_near,
        F.lit(1_000) * pos + (F.col("sid") * 31 + pos * 17) % 97,
    ).otherwise(
        F.when(pos == 0, F.lit(0))
        .when(pos == n_pts - 1, F.lit(1_000) * (n_pts - 1))
        .otherwise(F.lit(1_000) * (F.lit(1) + ((pos - 1 + shift) % inner)))
    )
    cands = base.select("sid", "pos", val.cast("long").alias("val"))

    out = {}
    for prune in (True, False):
        t0 = time.perf_counter()
        got = [
            (r.series_id, r.dtw_dist)
            for r in dtw_topk_search(
                cands, query, DTW_K, id_col="sid", pos_col="pos",
                val_col="val", prune=prune, band=band,
            ).collect()
        ]
        out[prune] = (got, time.perf_counter() - t0)
    assert out[True][0] == out[False][0]
    assert all(s < n_near for s, _ in out[True][0])
    # bound contrast on one bulk series (sid = n_near):
    s0 = 6 + (n_near % (n_pts - 13))
    bulk = (
        [0]
        + [1_000 * (1 + ((p - 1 + s0) % inner)) for p in range(1, n_pts - 1)]
        + [1_000 * (n_pts - 1)]
    )
    print(
        f"banded 150k  : heap+LB {out[True][1]:6.2f}s  "
        f"exhaustive {out[False][1]:6.2f}s  "
        f"speedup {out[False][1] / out[True][1]:4.2f}x  "
        f"(bulk series: value-set LB {dtw_lower_bound(bulk, query)}, "
        f"banded LB_Keogh {dtw_lower_bound(bulk, query, band=band)})",
        flush=True,
    )


def main() -> None:
    from spotify_etl_aws_spark.session import get_spark

    spark = get_spark(app_name="dtw-scale")
    spark.sparkContext.setLogLevel("ERROR")
    lane_scenario(spark)
    separated_scenario(spark)
    long_series_scenario(spark)
    banded_scenario(spark)


if __name__ == "__main__":
    main()
