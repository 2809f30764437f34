"""Streaming CUSUM control chart (streaming/stateful.py:
cusum_alarms_state + the declared streaming_cusum_alarms lane):
batch/stream parity over one AvailableNow pass, CROSS-TRIGGER state
resume (the property that distinguishes the stateful fold from a
single-batch replay), and the out-of-order guard."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

REF, H = 600, 1500  # small-fixture control parameters

_SCHEMA = "event_id long, user_id long, ts timestamp, cents long"


def _batch_alarms(spark, rows):
    """Scalar replay of the window identity on a batch frame."""
    from pyspark.sql import Window as W

    df = spark.createDataFrame(rows, _SCHEMA)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    p = df.withColumn("pt", F.sum(F.col("cents") - REF).over(w))
    s = p.withColumn(
        "cusum", F.col("pt") - F.least(F.lit(0), F.min("pt").over(w))
    )
    return {
        (r.event_id, r.user_id): (r.cents, r.cusum)
        for r in s.filter(F.col("cusum") > H).collect()
    }


def _run_stream(spark, src_dir, checkpoint, sink_name):
    """AvailableNow pass collecting update-mode output via
    foreachBatch (the memory sink cannot RECOVER from a checkpoint,
    and the cross-run resume is exactly what these tests exercise)."""
    from spotify_etl_aws_spark.streaming.stateful import cusum_alarms_state

    rows = []

    def _sink(batch_df, epoch_id):
        rows.extend(batch_df.collect())

    src = spark.readStream.schema(_SCHEMA).parquet(src_dir)
    q = (
        cusum_alarms_state(src, ref=REF, h=H)
        .writeStream.outputMode("update")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return rows


def _rows(spec):
    """spec: list of (event_id, user_id, day, cents)."""
    import datetime as dt

    return [
        (e, u, dt.datetime(2024, 1, 1) + dt.timedelta(days=d), c)
        for e, u, d, c in spec
    ]


def test_streaming_lane_matches_batch_lane(spark, sf_dir):
    """The declared lane: one AvailableNow pass over the events table
    emits exactly the batch ts_cusum_alarms set (its oracle is
    ORACLE_CUSUM byte-for-byte — this is the local replica of that
    parity check)."""
    from spotify_etl_aws_spark.queries.selection import (
        streaming_cusum_alarms,
        ts_cusum_alarms,
    )

    got = {
        r.event_id: (r.user_id, r.cents, r.cusum)
        for r in streaming_cusum_alarms(spark, sf_dir).collect()
    }
    want = {
        r.event_id: (r.user_id, r.cents, r.cusum)
        for r in ts_cusum_alarms(spark, sf_dir).collect()
    }
    assert got == want
    assert got  # non-vacuous


def test_cross_trigger_state_resume(spark):
    """Two time-ordered file batches through a SHARED checkpoint: the
    second run resumes the per-user (P_t, min P_j) state, so the union
    of update-mode outputs equals the batch alarms over the full
    history — including alarms in batch 2 whose exceedance accumulated
    in batch 1."""
    early = _rows(
        [(1, 7, 0, 1600), (2, 7, 1, 1500), (3, 9, 0, 100), (4, 9, 1, 500)]
    )
    late = _rows(
        [(5, 7, 2, 700), (6, 9, 3, 2000), (7, 9, 4, 1900), (8, 9, 5, 500)]
    )
    src = tempfile.mkdtemp(prefix="cusum_src_")
    ckpt = tempfile.mkdtemp(prefix="cusum_ckpt_")
    spark.createDataFrame(early, _SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    out1 = _run_stream(spark, src, ckpt, "cusum_resume_1")
    spark.createDataFrame(late, _SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    out2 = _run_stream(spark, src, ckpt, "cusum_resume_2")

    got = {
        (r.event_id, r.user_id): (r.cents, r.cusum)
        for r in list(out1) + list(out2)
    }
    want = _batch_alarms(spark, early + late)
    assert got == want
    # the resume actually mattered: batch-2 alarms exist, and at least
    # one of them needs batch-1 prefix state (user 7's carried surplus)
    assert any(r.event_id >= 5 for r in out2)
    assert (5, 7) in want  # 700 alone would never alarm; carry does


def test_out_of_order_across_triggers_raises(spark):
    """A second trigger delivering rows at or before the folded
    frontier must fail loudly (the lane's documented ordering
    contract), not silently corrupt the recurrence."""
    from pyspark.errors import StreamingQueryException

    late = _rows([(1, 7, 5, 1600), (2, 7, 6, 1500)])
    early = _rows([(3, 7, 0, 700)])  # BEFORE the folded frontier
    src = tempfile.mkdtemp(prefix="cusum_ooo_src_")
    ckpt = tempfile.mkdtemp(prefix="cusum_ooo_ckpt_")
    spark.createDataFrame(late, _SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _run_stream(spark, src, ckpt, "cusum_ooo_1")
    spark.createDataFrame(early, _SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    with pytest.raises(StreamingQueryException, match="time-ordered"):
        _run_stream(spark, src, ckpt, "cusum_ooo_2")


def test_state_is_constant_size(spark):
    """The state schema is four int64s per key — bounded by distinct
    users, not stream length (the 100 TB posture claim)."""
    import inspect

    from spotify_etl_aws_spark.streaming import stateful

    src_txt = inspect.getsource(stateful.cusum_alarms_state)
    assert "pt bigint, mp bigint, last_ts bigint, last_eid bigint" in src_txt
