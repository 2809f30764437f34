"""Medallion pipeline runner (SURVEY.md §3, §7 step 6).

Replaces the reference's three Airflow DAGs + dbt/Cosmos DAG
(airflow/dags/{raw,bronze,silver,gold}_dag.py) with plain function
composition: each dbt model is a ``DataFrame -> DataFrame`` function and
the runner executes the stages in dependency order inside one Spark
session — no per-stage process boundary, no SQL-string templating, one
Catalyst plan per materialization.

Differences from the reference, on purpose:
- the gold export runs ONCE after the fact build (the reference's dbt
  post-hook re-exports after every core model, 4x —
  dbt_project.yml:41);
- the fact is written partitioned by ``playlist_id`` so downstream
  per-playlist reads prune partitions at scale;
- staging frames are cached: dims and the fact reuse them within the
  run (the reference re-reads parquet per model).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.core import gold
from ..operators.quality import (
    check_not_null,
    check_references,
    check_unique,
    expect_all,
)
from ..operators.shred import shred
from ..operators.staging import silver_projection, stage
from ..sources.readers import read_raw_playlists
from ..sources.sinks import write_parquet, write_partitioned


def run_medallion(
    spark: SparkSession,
    raw_json_path: str,
    out_root: str,
    validate: bool = True,
) -> dict[str, DataFrame]:
    """raw JSON -> bronze -> silver -> gold, all materialized as parquet
    under ``out_root``. Returns the gold DataFrames (re-read from disk so
    callers see exactly what was written).

    ``validate`` enforces the gold-layer contracts the reference only
    documents (schema.yml PK/FK prose, no dbt ``tests:``): dim primary
    keys unique + not-null, fact FKs resolving to their dims. Checked
    AFTER the write on the re-read frames — what is validated is what
    landed — raising if any contract fails, like a dbt build gated on
    its tests."""
    raw = read_raw_playlists(spark, raw_json_path)

    bronze = shred(raw)
    for name, df in bronze.items():
        write_parquet(df, os.path.join(out_root, "bronze", name))

    silver = {}
    for name in bronze:
        bdf = spark.read.parquet(os.path.join(out_root, "bronze", name))
        sdf = silver_projection(bdf, name)
        write_parquet(sdf, os.path.join(out_root, "silver", name))
        silver[name] = spark.read.parquet(os.path.join(out_root, "silver", name))

    stg = {name: df.cache() for name, df in stage(silver).items()}
    gold_frames = gold(stg)
    for name, df in gold_frames.items():
        path = os.path.join(out_root, "gold", name)
        if name == "fact_playlist_tracks":
            write_partitioned(df, path, ["playlist_id"])
        else:
            write_parquet(df, path)

    landed = {
        name: spark.read.parquet(os.path.join(out_root, "gold", name))
        for name in gold_frames
    }
    if validate:
        expect_all(gold_contracts(landed))
    return landed


_DIM_KEYS = {
    "dim_playlists": "playlist_id",
    "dim_albums": "album_id",
    "dim_artists": "artist_id",
}


def gold_contracts(gold_frames: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """The reference's documented schema contracts as named checks
    (dbt/spotify_etl_aws/models/staging/schema.yml:8,27-40,46,57):
    each dim's PK unique + not-null, each fact FK resolving. The fact
    itself gets NO uniqueness contract — its grain is (playlist,
    position): the same track legitimately repeats across playlists
    (and even within one), and the reference declares no fact PK."""
    fact = gold_frames["fact_playlist_tracks"]
    checks: dict[str, DataFrame] = {}
    for name, pk in _DIM_KEYS.items():
        checks[f"{name}.{pk}_unique"] = check_unique(gold_frames[name], [pk])
        checks[f"{name}.{pk}_not_null"] = check_not_null(gold_frames[name], [pk])
    for name, pk in _DIM_KEYS.items():
        checks[f"fact_playlist_tracks.{pk}_references"] = check_references(
            fact, pk, gold_frames[name], pk
        )
    return checks
