"""Incremental bronze (streaming/pipeline.py:incremental_bronze):
checkpointed file-source ingestion must process each raw file exactly
once across runs — the streaming replacement for the reference's
re-scan-and-INSERT daily loop (bronze_dag.py:78-98)."""

from __future__ import annotations

import json

from spotify_etl_aws_spark.streaming.pipeline import incremental_bronze

from .test_medallion import _playlist_items, _write_fixture


def test_incremental_bronze_exactly_once(spark, tmp_path):
    raw_dir = tmp_path / "raw"
    raw_dir.mkdir()
    out = str(tmp_path / "bronze")
    ckpt = str(tmp_path / "ckpt")

    items = _playlist_items()
    _write_fixture(str(raw_dir / "p1.json"), items[:10])

    incremental_bronze(spark, str(raw_dir), out, ckpt)
    tracks = spark.read.parquet(f"{out}/tracks")
    assert tracks.count() == 10

    # re-run with no new files: nothing is re-ingested
    incremental_bronze(spark, str(raw_dir), out, ckpt)
    assert spark.read.parquet(f"{out}/tracks").count() == 10

    # land a second file: only its rows are appended
    _write_fixture(str(raw_dir / "p2.json"), items[10:25])
    incremental_bronze(spark, str(raw_dir), out, ckpt)
    tracks = spark.read.parquet(f"{out}/tracks")
    assert tracks.count() == 25
    assert tracks.select("track_id").distinct().count() == 25
