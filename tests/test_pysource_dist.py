"""Partition-planned executor-side streaming DataSource
(sources/pysource.py:_PagesDistStreamReader): per-row-group task
fan-out (>1 task per micro-batch), offset-algebra parity with the
Simple reader, deterministic replay of a committed range, checkpoint
restart without re-serving committed fragments, and row fidelity vs a
direct parquet read."""

from __future__ import annotations

import glob
import os
import shutil
import time

import pytest

import pyspark.sql.functions as F

from spotify_etl_aws_spark.sources.pysource import (
    _PagesDistStreamReader,
    register,
)
from spotify_etl_aws_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def _stage(spark, path: str, n_files: int, prefix: str = "a") -> None:
    """Write documents as n_files fragments whose names keep the
    lexicographic-append contract (prefix controls sort position)."""
    tmp = path + ".tmp"
    docs = load_table(spark, SF, "documents")
    docs.repartition(n_files).write.mode("overwrite").parquet(tmp)
    os.makedirs(path, exist_ok=True)
    for i, f in enumerate(sorted(glob.glob(os.path.join(tmp, "*.parquet")))):
        shutil.copy(f, os.path.join(path, f"{prefix}-{i:05d}.parquet"))
    shutil.rmtree(tmp)


def _drain(q, n_files: int, deadline_s: float = 120) -> None:
    import ast
    import json

    end = time.monotonic() + deadline_s
    while time.monotonic() < end:
        p = q.lastProgress
        if p and p["sources"]:
            raw = p["sources"][0]["endOffset"] or "{}"
            try:
                off = json.loads(raw)
            except json.JSONDecodeError:
                off = ast.literal_eval(raw)
            if off.get("i", -1) >= n_files and p["numInputRows"] == 0:
                return
        time.sleep(0.2)
    raise TimeoutError(f"stream never drained {n_files} fragments")


def test_partitions_fan_out_per_row_group(spark, tmp_path):
    path = str(tmp_path / "docs")
    _stage(spark, path, 4)
    r = _PagesDistStreamReader({"path": path})
    assert r.initialOffset() == {"i": 0}
    assert r.latestOffset() == {"i": 4}
    parts = r.partitions({"i": 0}, {"i": 4})
    assert len(parts) >= 4  # >= one per fragment (per row group)
    files = {p.value[0] for p in parts}
    assert len(files) == 4
    # deterministic replay: the same committed range plans the same
    # partitions (recovery re-serves exactly what was committed)
    again = r.partitions({"i": 0}, {"i": 4})
    assert [p.value for p in again] == [p.value for p in parts]
    # sub-range honors the cursor
    sub = r.partitions({"i": 1}, {"i": 3})
    assert {p.value[0] for p in sub} == set(sorted(files)[1:3])


def test_read_is_row_group_exact(spark, tmp_path):
    import pyarrow.parquet as pq

    path = str(tmp_path / "docs")
    _stage(spark, path, 2)
    r = _PagesDistStreamReader({"path": path})
    parts = r.partitions({"i": 0}, {"i": 2})
    total = 0
    for p in parts:
        batches = list(r.read(p))
        total += sum(b.num_rows for b in batches)
    direct = sum(
        pq.read_table(f).num_rows
        for f in glob.glob(os.path.join(path, "*.parquet"))
    )
    assert total == direct > 0


def test_stream_multibatch_executor_fanout(spark, tmp_path):
    """End-to-end: batch 1 ingests the 3 initially-visible fragments
    as >1 task (distinct spark_partition_id per micro-batch df);
    fragments appearing later arrive in a later batch; the union of
    all batches equals the full dataset exactly once."""
    register(spark)
    path = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    _stage(spark, path, 3, prefix="a")
    seen: list[tuple[int, int, int]] = []  # (batch, n_rows, n_parts)
    ids: list[int] = []

    def sink(df, bid):
        rows = df.select("doc_id", F.spark_partition_id().alias("p")).collect()
        if rows:
            seen.append((bid, len(rows), len({r.p for r in rows})))
            ids.extend(r.doc_id for r in rows)

    q = (
        spark.readStream.format("parquet_pages_dist")
        .load(path)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        _drain(q, 3)
        _stage(spark, str(tmp_path / "late"), 2)
        for i, f in enumerate(
            sorted(glob.glob(str(tmp_path / "late" / "*.parquet")))
        ):
            shutil.copy(f, os.path.join(path, f"z-{i:05d}.parquet"))
        _drain(q, 5)
    finally:
        q.stop()
        q.awaitTermination(60)
    docs = load_table(spark, SF, "documents")
    base = sorted(r.doc_id for r in docs.select("doc_id").collect())
    # initial 3 fragments hold one full copy, the late 2 another —
    # every doc exactly twice, nothing lost, nothing re-served
    assert sorted(ids) == sorted(base + base)
    assert max(n_parts for _, _, n_parts in seen) > 1
    assert len(seen) >= 2  # the late fragments landed in a later batch


def test_checkpoint_restart_does_not_reserve_committed(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    _stage(spark, path, 2, prefix="a")
    first: list[int] = []
    second: list[int] = []

    def run(sink_list, n_files):
        def sink(df, bid):
            sink_list.extend(r.doc_id for r in df.select("doc_id").collect())

        q = (
            spark.readStream.format("parquet_pages_dist")
            .load(path)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            _drain(q, n_files)
        finally:
            q.stop()
            q.awaitTermination(60)

    run(first, 2)
    # append two more fragments AFTER the first run fully committed
    _stage(spark, str(tmp_path / "late"), 2)
    for i, f in enumerate(
        sorted(glob.glob(str(tmp_path / "late" / "*.parquet")))
    ):
        shutil.copy(f, os.path.join(path, f"z-{i:05d}.parquet"))
    run(second, 4)
    docs_n = load_table(spark, SF, "documents").count()
    assert len(first) == docs_n
    assert len(second) == docs_n  # only the late fragments, no replay
    assert not set(first) & set(second) or len(first + second) == 2 * docs_n


def test_available_now_drains_fully(spark, tmp_path):
    """Unlike the Simple reader (whose one-prefetched-read() protocol
    caps an AvailableNow query at the first offset — the lane polls
    instead), the partition-planned reader's latestOffset() is honored
    by Trigger.AvailableNow: one run drains every visible fragment and
    terminates."""
    register(spark)
    path = str(tmp_path / "docs")
    _stage(spark, path, 4)
    agg = (
        spark.readStream.format("parquet_pages_dist")
        .load(path)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = "an_drain_test"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = spark.table(name).agg(F.sum("n")).collect()[0][0]
    assert got == load_table(spark, SF, "documents").count()


def test_batch_read_still_works_through_dist_source(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "docs")
    _stage(spark, path, 3)
    back = spark.read.format("parquet_pages_dist").load(path)
    assert back.count() == load_table(spark, SF, "documents").count()


def test_zero_row_fragment_is_consumed_not_stuck(spark, tmp_path):
    """A fragment with zero rows still advances the cursor (its row
    groups contribute no partitions) — the stream must drain past it
    rather than wedging or erroring."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    register(spark)
    path = str(tmp_path / "docs")
    _stage(spark, path, 2)
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    pq.write_table(
        pa.Table.from_arrays([[], [], [], [], []], schema=schema),
        os.path.join(path, "b-empty.parquet"),
    )
    got: list[int] = []

    def sink(df, bid):
        got.extend(r.doc_id for r in df.select("doc_id").collect())

    q = (
        spark.readStream.format("parquet_pages_dist")
        .load(path)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    assert len(got) == load_table(spark, SF, "documents").count()
