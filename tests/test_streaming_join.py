"""Left-outer stream-stream join (queries/streaming.py): planted
boundary fixtures pinning the state-eviction semantics the DuckDB
oracle replicates — min-of-sides watermark policy and the 1 ms
state-value-watermark offset."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from spotify_etl_aws_spark.queries.streaming import streaming_stream_stream_join

_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()),
        ("event_type", pa.string()),
        ("value", pa.float64()),
        ("props", pa.string()),
    ]
)


def _T(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _write_events(tmp_path, rows) -> str:
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=_SCHEMA), str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_stream_stream_left_outer_boundary(spark, tmp_path):
    """Null-padding is emitted exactly at state eviction: with click max
    12:00 and purchase max 13:00, the global watermark is the MIN side
    (12:00 - 1h = 11:00), and a purchase row is evicted — emitting its
    null row — iff ts <= wm - 1ms (Spark's StreamingJoinHelper derives
    the state value watermark with a 1 ms subtraction). A purchase
    999 us below the watermark therefore stays buffered and is NEVER
    emitted."""
    sf = _write_events(
        tmp_path,
        [
            # click side max -> its watermark 11:00 is the global min
            (1, _T("2024-03-01 12:00:00.000000"), 999, "click", 1.0, "{}"),
            # purchase side max 13:00 -> side watermark 12:00 (not the min)
            (2, _T("2024-03-01 13:00:00.000000"), 998, "purchase", 1.0, "{}"),
            # strictly below wm - 1ms: null row emitted
            (3, _T("2024-03-01 10:59:59.998999"), 1, "purchase", 1.0, "{}"),
            # exactly wm - 1ms: eviction is non-strict -> emitted
            (4, _T("2024-03-01 10:59:59.999000"), 2, "purchase", 1.0, "{}"),
            # 999us below wm but above wm - 1ms: still in state -> dropped
            (5, _T("2024-03-01 10:59:59.999999"), 3, "purchase", 1.0, "{}"),
            # above wm: still in state -> dropped
            (6, _T("2024-03-01 11:00:00.001000"), 4, "purchase", 1.0, "{}"),
            # matched purchase: emitted regardless of watermark
            (7, _T("2024-03-01 10:00:00.000000"), 5, "purchase", 1.0, "{}"),
            (8, _T("2024-03-01 09:45:00.000000"), 5, "click", 1.0, "{}"),
            # click older than 30 min before the purchase: no match, and
            # the purchase is old enough to evict -> null row
            (9, _T("2024-03-01 09:00:00.000000"), 6, "purchase", 1.0, "{}"),
            (10, _T("2024-03-01 08:15:00.000000"), 6, "click", 1.0, "{}"),
        ],
    )
    got = {
        (r.user_id, r.click_id, r.purchase_id)
        for r in streaming_stream_stream_join(spark, sf).collect()
    }
    assert got == {
        (1, None, 3),
        (2, None, 4),
        (5, 8, 7),
        (6, None, 9),
    }


def test_stream_stream_left_outer_min_watermark_side_flips(spark, tmp_path):
    """When the PURCHASE side holds the older max, ITS watermark is the
    global min: purchases above purchase-side wm - 1ms are kept even
    though they sit hours below the click-side watermark."""
    sf = _write_events(
        tmp_path,
        [
            (1, _T("2024-03-01 18:00:00.000000"), 999, "click", 1.0, "{}"),
            # purchase max 12:00 -> global wm = 11:00 (click side: 17:00)
            (2, _T("2024-03-01 12:00:00.000000"), 998, "purchase", 1.0, "{}"),
            # 13 min below click-side wm but above the global min -> kept
            (3, _T("2024-03-01 11:30:00.000000"), 1, "purchase", 1.0, "{}"),
            # below the min-side wm -> evicted, null row
            (4, _T("2024-03-01 10:00:00.000000"), 2, "purchase", 1.0, "{}"),
        ],
    )
    got = {
        (r.user_id, r.click_id, r.purchase_id)
        for r in streaming_stream_stream_join(spark, sf).collect()
    }
    assert got == {(2, None, 4)}


def test_stream_stream_full_outer_pads_both_sides(spark, tmp_path):
    """FULL outer: the click side ALSO null-pads at ITS eviction point
    (a click is purged once no future purchase can reach back to it:
    watermark past click_ts + 30 min). Unmatched young clicks stay in
    state and are never emitted — symmetric with the purchase side."""
    from pyspark.sql import functions as F

    from spotify_etl_aws_spark.queries.streaming import (
        read_table_stream,
        run_available_now,
    )

    sf = _write_events(
        tmp_path,
        [
            # anchors: both sides max 12:00 -> global watermark 11:00
            (1, _T("2024-03-01 12:00:00"), 999, "click", 1.0, "{}"),
            (2, _T("2024-03-01 12:00:00"), 998, "purchase", 1.0, "{}"),
            # matched pair
            (3, _T("2024-03-01 09:45:00"), 5, "click", 1.0, "{}"),
            (4, _T("2024-03-01 10:00:00"), 5, "purchase", 1.0, "{}"),
            # unmatched old purchase -> (6, None, 5)
            (5, _T("2024-03-01 09:00:00"), 6, "purchase", 1.0, "{}"),
            # unmatched old click (09:00 + 30min << 11:00) -> (7, 6, None)
            (6, _T("2024-03-01 09:00:00"), 7, "click", 1.0, "{}"),
            # unmatched YOUNG click (10:45 + 30min > 11:00): in state
            (7, _T("2024-03-01 10:45:00"), 8, "click", 1.0, "{}"),
        ],
    )
    clicks = (
        read_table_stream(spark, sf, "events")
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        read_table_stream(spark, sf, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")
        ),
        "full_outer",
    ).select(
        F.coalesce("user_id", "c_user").alias("uid"),
        "click_id",
        "purchase_id",
    )
    got = {
        (r.uid, r.click_id, r.purchase_id)
        for r in run_available_now(joined, "ss_full", output_mode="append").collect()
    }
    assert (5, 3, 4) in got  # the match
    assert (6, None, 5) in got  # purchase-side padding
    assert (7, 6, None) in got  # click-side padding (full outer only)
    emitted_clicks = {c for _, c, _ in got if c is not None}
    assert 7 not in emitted_clicks  # young unmatched click: still in state
