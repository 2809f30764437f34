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
