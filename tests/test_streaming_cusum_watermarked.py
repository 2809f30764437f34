"""Watermark-bounded streaming CUSUM (round 13, verdict item 3):
late rows BUFFER instead of killing the job, the fold consumes only
the watermark-sealed prefix (batch-identical over any complete run),
stragglers behind the sealed frontier emit as dead-letters, and state
stays bounded by the watermark window.
"""

from __future__ import annotations

import datetime as dt
import tempfile

from pyspark.sql import functions as F

REF, H = 600, 1500

_SCHEMA = "event_id long, user_id long, ts timestamp, cents long"


def _batch_alarms(spark, rows):
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


def _run_stream(spark, src_dir, checkpoint, delay):
    from spotify_etl_aws_spark.streaming.stateful import (
        cusum_alarms_watermarked,
    )

    rows = []

    def _sink(batch_df, epoch_id):
        rows.extend(batch_df.collect())

    src = spark.readStream.schema(_SCHEMA).parquet(src_dir)
    q = (
        cusum_alarms_watermarked(src, ref=REF, h=H, delay=delay)
        .writeStream.outputMode("update")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return rows


def _rows(spec):
    return [
        (e, u, dt.datetime(2024, 1, 1) + dt.timedelta(days=d), c)
        for e, u, d, c in spec
    ]


def test_declared_lane_matches_batch_lane(spark, sf_dir):
    from spotify_etl_aws_spark.queries.selection import (
        streaming_cusum_watermarked,
        ts_cusum_alarms,
    )

    got = {
        r.event_id: (r.user_id, r.cents, r.cusum)
        for r in streaming_cusum_watermarked(spark, sf_dir).collect()
    }
    want = {
        r.event_id: (r.user_id, r.cents, r.cusum)
        for r in ts_cusum_alarms(spark, sf_dir).collect()
    }
    assert got == want
    assert got


def test_late_row_buffers_not_fatal(spark):
    """The scenario that KILLS the strict variant: trigger 2 delivers
    a row (day 5) event-time-BEFORE a row trigger 1 already saw (day
    6). With a 2-day watermark delay, day 6 was still unsealed, so the
    late row buffers and folds in its correct event-time position —
    the combined alarm set equals the batch fold of the sealed
    history, with zero dead letters."""
    early = _rows(
        [(1, 7, 0, 1600), (2, 7, 1, 1500), (3, 7, 2, 700), (4, 7, 6, 1800)]
    )
    late = _rows([(5, 7, 5, 1600), (6, 7, 9, 100)])
    src = tempfile.mkdtemp(prefix="cusum_wm_src_")
    ckpt = tempfile.mkdtemp(prefix="cusum_wm_ckpt_")
    spark.createDataFrame(early, _SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    out1 = _run_stream(spark, src, ckpt, "2 days")  # wm -> d4: seals d0..d2
    spark.createDataFrame(late, _SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    out2 = _run_stream(spark, src, ckpt, "2 days")  # wm -> d7: seals d5, d6

    all_rows = list(out1) + list(out2)
    assert all(r.kind == "alarm" for r in all_rows)  # no dead letters
    got = {
        (r.event_id, r.user_id): (r.cents, r.cusum) for r in all_rows
    }
    # sealed history after run 2 = everything with ts <= d7: eids 1..5
    sealed = [r for r in early + late if r[0] != 6]
    assert got == _batch_alarms(spark, sealed)
    # the late day-5 row genuinely folded BEFORE day 6 (its cusum value
    # reflects the day-0..2 carry, not a post-d6 position)
    assert (5, 7) in got


def test_straggler_behind_frontier_dead_letters(spark):
    """A row that arrives behind the already-SEALED frontier emits as
    a dead-letter (cusum NULL) and never corrupts the fold."""
    src = tempfile.mkdtemp(prefix="cusum_dl_src_")
    ckpt = tempfile.mkdtemp(prefix="cusum_dl_ckpt_")
    base = spark.createDataFrame(
        _rows([(1, 7, 0, 1600), (2, 7, 1, 1500)]), _SCHEMA
    ).withColumn("ts", F.expr("ts + INTERVAL '0.0005' SECOND"))
    base.coalesce(1).write.mode("append").parquet(src)
    out1 = _run_stream(spark, src, ckpt, "0 seconds")
    # frontier sealed at (d1 + 500us, 2); watermark = d1 (ms floor).
    # eid 3 at d1 + 200us passes Spark's late filter (> watermark) but
    # sits behind the frontier -> dead letter; eid 4 folds normally
    straggler = spark.createDataFrame(
        _rows([(3, 7, 1, 100)]), _SCHEMA
    ).withColumn("ts", F.expr("ts + INTERVAL '0.0002' SECOND"))
    straggler.coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        _rows([(4, 7, 2, 1800)]), _SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    out2 = _run_stream(spark, src, ckpt, "0 seconds")

    kinds = {r.event_id: r.kind for r in out2}
    assert kinds[3] == "dead_letter"
    dl = next(r for r in out2 if r.event_id == 3)
    assert dl.cusum is None
    # the fold ignored the dead letter: eid 4's cusum continues from
    # the eid-2 frontier (1000 + 900 + 1200 = 3100)
    alarm4 = next(r for r in out2 if r.event_id == 4)
    assert alarm4.kind == "alarm" and alarm4.cusum == 3100
    assert {r.event_id for r in out1} == {2}


def test_state_bounded_by_watermark_window(spark):
    """Source pin of the boundedness contract: the state carries the
    four-int64 frontier plus a buffer of only rows the watermark has
    not yet passed — O(rate x delay) per key, not stream length."""
    import inspect

    from spotify_etl_aws_spark.streaming import stateful

    src_txt = inspect.getsource(stateful.cusum_alarms_watermarked)
    assert "pt bigint, mp bigint, last_ts bigint, last_eid bigint" in src_txt
    assert "buf_ts array<bigint>" in src_txt
    # sealing drops sealed rows from the buffer (the boundedness move)
    assert "bts[n_seal:]" in src_txt


def test_consecutive_ms_tail_seals(spark):
    """Round-13 ADVICE (medium): a tail row whose event-time ms is
    exactly watermark+1 at arming time, and whose ms is also the
    stream's FINAL watermark, must still seal. The old clamp armed at
    max(row_ms - 1, wm_ms + 1) = the row's own ms; the event-time
    timeout fires only when the watermark STRICTLY exceeds the armed
    timestamp, so the final no-data batch (watermark == row ms) never
    fired and the row's alarm silently vanished. Arming clamps AT the
    watermark now (equality is legal per pyspark's state.py check),
    keeping the armed timestamp strictly below the first buffered
    row's ms."""
    src = tempfile.mkdtemp(prefix="cusum_ms_src_")
    ckpt = tempfile.mkdtemp(prefix="cusum_ms_ckpt_")
    t0 = dt.datetime(2024, 1, 1)
    spark.createDataFrame(
        [(1, 7, t0, 2200)], _SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    out1 = _run_stream(spark, src, ckpt, "0 seconds")
    assert {r.event_id for r in out1} == {1}  # wm -> t0: row 1 sealed

    # incremental restart: one new row exactly ONE ms after the
    # restored watermark -- the corner the old clamp stranded
    spark.createDataFrame(
        [(2, 7, t0 + dt.timedelta(milliseconds=1), 2200)], _SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    out2 = _run_stream(spark, src, ckpt, "0 seconds")
    got = {r.event_id: (r.kind, r.cusum) for r in out2}
    assert got == {2: ("alarm", 3200)}, got  # sealed, folded after row 1


def test_dead_letter_lane_is_max_day_odd_replay(spark, sf_dir):
    """Round-14 lane: the deterministic two-pass disordered replay
    dead-letters EXACTLY the odd replay's max-day rows (the only rows
    that pass the engine's late filter yet sit behind their user's
    sealed frontier) — the structural claim the SQL oracle encodes."""
    from spotify_etl_aws_spark.queries.selection import (
        streaming_cusum_dead_letters,
    )
    from spotify_etl_aws_spark.sources.readers import load_table

    got = {
        (r.event_id, r.user_id, r.cents)
        for r in streaming_cusum_dead_letters(spark, sf_dir).collect()
    }
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            F.date_trunc("day", F.col("ts")).alias("d"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
    )
    md = ev.agg(F.max("d")).first()[0]
    want = {
        (r.event_id * 2 + 1, r.user_id, r.cents)
        for r in ev.filter(F.col("d") == F.lit(md)).collect()
    }
    assert got == want
    assert len(got) > 0
