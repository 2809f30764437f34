"""Streaming CDC upsert (streaming/cdc.py): multi-micro-batch folding
parity with the batch apply_cdc, tombstone persistence across batches
(no resurrection by late-arriving older changes), and empty-feed
behavior."""

from __future__ import annotations

import pytest

from spotify_etl_aws_spark.operators.scd import apply_cdc
from spotify_etl_aws_spark.streaming.cdc import run_cdc_upsert

SCHEMA = "uid long, seq long, op string, val long"


def _write_feed(spark, tmp_path, batches):
    """One parquet file per batch so maxFilesPerTrigger=1 forces the
    micro-batch boundaries we want to test."""
    d = tmp_path / "feed"
    d.mkdir()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            str(d / f"b{i}")
        )
    return str(d)


def _stream(spark, path):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(path)
    )


def test_matches_batch_apply_cdc(spark, tmp_path):
    batches = [
        [(1, 1, "U", 10), (2, 1, "U", 20)],
        [(1, 3, "U", 30), (3, 1, "U", 11)],
        [(2, 2, "D", 0), (1, 2, "U", 99)],  # stale update for 1
    ]
    path = _write_feed(spark, tmp_path, batches)
    out = run_cdc_upsert(
        _stream(spark, path), ["uid"], ["seq"], "op"
    )
    got = {r.uid: (r.seq, r.val) for r in out.collect()}
    flat = [r for b in batches for r in b]
    batch = apply_cdc(
        spark.createDataFrame(flat, SCHEMA), ["uid"], ["seq"], "op"
    )
    want = {r.uid: (r.seq, r.val) for r in batch.collect()}
    assert got == want == {1: (3, 30), 3: (1, 11)}


def test_tombstone_not_resurrected_by_late_older_update(spark, tmp_path):
    # delete at seq 5 arrives BEFORE an older update at seq 2: if the
    # state dropped tombstones eagerly, batch 2 would resurrect uid 1
    batches = [
        [(1, 5, "D", 0)],
        [(1, 2, "U", 22)],
        [(2, 1, "U", 7)],
    ]
    path = _write_feed(spark, tmp_path, batches)
    out = run_cdc_upsert(_stream(spark, path), ["uid"], ["seq"], "op")
    got = {r.uid: r.val for r in out.collect()}
    assert got == {2: 7}


def test_delete_then_resurrect_by_newer_update(spark, tmp_path):
    batches = [[(1, 1, "D", 0)], [(1, 2, "U", 42)]]
    path = _write_feed(spark, tmp_path, batches)
    out = run_cdc_upsert(_stream(spark, path), ["uid"], ["seq"], "op")
    got = {r.uid: r.val for r in out.collect()}
    assert got == {1: 42}


def test_empty_feed(spark, tmp_path):
    d = tmp_path / "feed"
    d.mkdir()
    # schema-only: a feed dir with one empty parquet file
    spark.createDataFrame([], SCHEMA).coalesce(1).write.parquet(
        str(d / "b0")
    )
    out = run_cdc_upsert(
        _stream(spark, str(d)), ["uid"], ["seq"], "op"
    )
    assert out.count() == 0
    assert "op" not in out.columns
