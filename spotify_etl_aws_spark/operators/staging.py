"""Silver + staging transforms (SURVEY.md §2.2 P2/P3/P4).

- ``silver_*``: the reference's silver layer is a pure column projection,
  still all-string (reference: ingestion/ingestion/silver/silver.py:76-94).
- ``stg_*``: the dbt staging models — rename + lenient typed cast per
  column, plus the CASE partial-date normalization in the newer airflow
  dbt copy (reference: dbt/spotify_etl_aws/models/staging/*.sql and
  airflow/dags/dbt/spotify_etl_aws/models/staging/*.sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.casts import bool_from_string, lenient_cast
from ..functions.dates import normalize_partial_date
from ..schemas import SILVER_COLUMNS


def silver_projection(bronze: DataFrame, table: str) -> DataFrame:
    """silver.py:76-94: fixed per-table column list, no typing."""
    return bronze.select(*SILVER_COLUMNS[table])


def stg_playlists(silver: DataFrame) -> DataFrame:
    """stg_playlists.sql:5-10."""
    return silver.select(
        lenient_cast("id", "string").alias("playlist_id"),
        lenient_cast("name", "string").alias("playlist_name"),
        lenient_cast("description", "string").alias("playlist_description"),
        lenient_cast("owner_id", "string").alias("playlist_owner_id"),
        lenient_cast("followers", "int").alias("playlist_followers"),
        bool_from_string("public").alias("playlist_public"),
    )


def stg_tracks(silver: DataFrame) -> DataFrame:
    """stg_tracks.sql:5-14 + the date CASE from the airflow copy
    (airflow/dags/dbt/.../stg_tracks.sql:13-18)."""
    return silver.select(
        lenient_cast("track_id", "string").alias("track_id"),
        lenient_cast("name", "string").alias("track_name"),
        lenient_cast("playlist_id", "string").alias("playlist_id"),
        lenient_cast("album_id", "string").alias("album_id"),
        lenient_cast("duration_ms", "int").alias("track_duration_ms"),
        lenient_cast("popularity", "int").alias("track_popularity"),
        bool_from_string("explicit").alias("track_explicit"),
        lenient_cast("track_number", "int").alias("track_number"),
        normalize_partial_date("album_release_date").alias("album_release_date"),
        lenient_cast("artist_id", "string").alias("artist_id"),
    )


def stg_albums(silver: DataFrame) -> DataFrame:
    """stg_albums.sql:5-8 + date CASE (airflow/dags/dbt/.../stg_albums.sql:7-12)."""
    return silver.select(
        lenient_cast("album_id", "string").alias("album_id"),
        lenient_cast("name", "string").alias("album_name"),
        normalize_partial_date("release_date").alias("album_release_date"),
        lenient_cast("total_tracks", "int").alias("album_total_tracks"),
    )


def stg_artists(silver: DataFrame) -> DataFrame:
    """stg_artists.sql:6-8."""
    return silver.select(
        lenient_cast("artist_id", "string").alias("artist_id"),
        lenient_cast("name", "string").alias("artist_name"),
        lenient_cast("track_id", "string").alias("track_id"),
    )


def stage(silver: dict[str, DataFrame]) -> dict[str, DataFrame]:
    return {
        "stg_playlists": stg_playlists(silver["playlists"]),
        "stg_tracks": stg_tracks(silver["tracks"]),
        "stg_albums": stg_albums(silver["albums"]),
        "stg_artists": stg_artists(silver["artists"]),
    }
