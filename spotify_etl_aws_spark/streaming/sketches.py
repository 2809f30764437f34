"""Streaming frequency sketches: per-event-time-window count-min over
an unbounded key space (north-star §2.9 × §2.11 composition).

The batch sketch (operators/sketches.py) bounds the SHUFFLE by the
depth×width cell world; the streaming variant bounds the STATE the
same way — a windowed groupBy on (window, r, c) keeps at most
depth×width counters per open window however many distinct keys
(users, domains, n-grams) the stream carries, where a per-key windowed
count would hold one state row per distinct key per window. Append
mode + watermark emit each window's sketch exactly once and purge it —
the only posture whose state stays bounded on an unbounded stream.

Estimates are served OFFLINE against the emitted sketch rows
(``cm_estimate_windowed``): point lookups min over the depth rows,
est ≥ true always, est ≤ true + e/width · n_window with the standard
confidence. The sketch rows land wherever the sink points (memory in
tests, parquet in production) and merge across restarts by cell-wise
sum — the same mergeability the batch sketch tests pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketches import _cm_cell


def windowed_count_min_stream(
    src: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window: str = "1 hour",
    watermark: str = "1 hour",
    depth: int = 4,
    width: int = 8192,
) -> DataFrame:
    """Streaming per-window count-min build: (w struct<start,end>, r,
    c, v) — state and output both bounded by depth×width per window.
    Keys are compared as strings (cast on the way in, like the batch
    sketch); NULL keys are dropped. The hash cell comes from the SAME
    ``_cm_cell`` expression as batch build/lookup, so a stream-built
    sketch serves batch estimates and vice versa."""
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    rows = F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("r")
    keyed = (
        src.withWatermark(ts_col, watermark)
        .select(
            F.col(ts_col), F.col(key_col).cast("string").alias("__key")
        )
        .filter(F.col("__key").isNotNull())
        .select(F.col(ts_col), rows, F.col("__key"))
        .select(
            F.col(ts_col),
            "r",
            _cm_cell(F.col("__key"), F.col("r"), width).alias("c"),
        )
    )
    return keyed.groupBy(
        F.window(ts_col, window).alias("w"), "r", "c"
    ).agg(F.count("*").alias("v"))


def streaming_heavy_hitters(
    src: DataFrame,
    key_col: str,
    n_buckets: int = 32,
    capacity: int = 4096,
) -> DataFrame:
    """Running (un-windowed) heavy hitters over an unbounded stream
    with BOUNDED state: keys hash-route to ``n_buckets`` salt buckets,
    each bucket maintains one Misra–Gries summary (≤ ``capacity``
    counters) in ``applyInPandasWithState`` GroupState — total state
    ≤ n_buckets × capacity counters however many distinct keys flow,
    where an exact running count would hold one state row per key.

    Because a key routes to exactly ONE bucket, its true stream count
    lives entirely in that bucket's substream, so the per-bucket MG
    guarantees hold globally: an emitted (term, cnt) undercounts by at
    most its bucket's ``dec``, and any key whose true count exceeds
    its bucket's ``dec`` is guaranteed present (tested against exact
    batch counts). Buckets update in parallel (state shuffles on the
    bucket key, n_buckets ≈ shuffle parallelism at scale).

    Update-mode output per trigger: (bucket, term, cnt, dec, seen) for
    every surviving counter — ``seen`` (rows processed by the bucket,
    monotone) lets a reader keep the LATEST summary per (bucket, term)
    when a sink accumulates multiple triggers; MG counts themselves
    are not monotone (decrements), so max-per-key would be wrong.
    """
    if n_buckets < 1 or capacity < 1:
        raise ValueError(
            f"n_buckets/capacity must be >= 1, got {n_buckets}/{capacity}"
        )
    from collections.abc import Iterator
    from typing import Any

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    keyed = (
        src.select(F.col(key_col).cast("string").alias("term"))
        .filter(F.col("term").isNotNull())
        .withColumn(
            "bucket",
            F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"),
        )
    )
    out_schema = "bucket int, term string, cnt bigint, dec bigint, seen bigint"
    state_schema = "terms array<string>, cnts array<long>, dec long, seen long"

    def _update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            terms, cnts, dec, seen = state.get
            counts = dict(zip(terms, cnts))
        else:
            counts, dec, seen = {}, 0, 0
        for pdf in pdfs:
            seen += len(pdf)
            for term in pdf["term"]:
                if term in counts:
                    counts[term] += 1
                elif len(counts) < capacity:
                    counts[term] = 1
                else:
                    dec += 1
                    dead = []
                    for t in counts:
                        counts[t] -= 1
                        if counts[t] == 0:
                            dead.append(t)
                    for t in dead:
                        del counts[t]
        state.update(
            (list(counts), [int(v) for v in counts.values()], dec, seen)
        )
        if counts:
            yield pd.DataFrame(
                {
                    "bucket": key[0],
                    "term": list(counts),
                    "cnt": [int(v) for v in counts.values()],
                    "dec": dec,
                    "seen": seen,
                }
            )

    return keyed.groupBy("bucket").applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def latest_hh_summary(rows: DataFrame) -> DataFrame:
    """Collapse an accumulated update-mode sink to the LATEST summary
    per bucket: keep each (bucket, term)'s row from the bucket's
    highest ``seen`` (MG counts are not monotone, so this is a filter
    on the monotone progress column, not a max over counts)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("bucket")
    latest = rows.withColumn("__mx", F.max("seen").over(w)).filter(
        F.col("seen") == F.col("__mx")
    )
    return latest.drop("__mx")


def cm_estimate_windowed(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str = "user_id",
    depth: int = 4,
    width: int = 8192,
) -> DataFrame:
    """Per-window point estimates for every (emitted window, key) pair:
    (w, key_col, est). The probe grid is keys × the sketch's distinct
    windows (both small: keys are a watchlist, windows are hours);
    missing cells count 0, and est is the min across the depth rows.
    The sketch side is depth×width rows per window — broadcast."""
    # alias the window column: `wins` derives from `sketch`, and a
    # join between two frames sharing the same source attributes is a
    # self-join Spark cannot disambiguate without the rename
    wins = sketch.select(F.col("w").alias("__w")).distinct()
    probes = (
        keys.select(key_col)
        .distinct()
        .crossJoin(wins)
        .select(
            key_col,
            "__w",
            F.explode(
                F.array(*[F.lit(r) for r in range(depth)])
            ).alias("r"),
        )
        .select(
            key_col,
            "__w",
            "r",
            _cm_cell(F.col(key_col).cast("string"), F.col("r"), width).alias(
                "c"
            ),
        )
    )
    p, s = probes.alias("p"), sketch.alias("s")
    joined = p.join(
        F.broadcast(s),
        (F.col("p.__w") == F.col("s.w"))
        & (F.col("p.r") == F.col("s.r"))
        & (F.col("p.c") == F.col("s.c")),
        "left",
    ).select(
        F.col(f"p.{key_col}").alias(key_col),
        F.col("p.__w").alias("__w"),
        F.coalesce(F.col("s.v"), F.lit(0)).alias("v"),
    )
    return joined.groupBy("__w", key_col).agg(
        F.min("v").alias("est")
    ).withColumnRenamed("__w", "w")
