"""JSON shredding: nested playlist documents -> four flat bronze tables.

Replaces the reference's per-record Python walk + row-at-a-time DuckDB
INSERT (reference: ingestion/ingestion/bronze/bronze.py:79-211 —
``process_data`` / ``handle_playlist`` / ``handle_tracks`` /
``handle_album`` / ``handle_artists``) with four declarative
``explode``-based projections over the same raw DataFrame. Catalyst
prunes the untouched branches of the nested schema, and the work
distributes across however many input files/partitions exist — the
reference's biggest anti-pattern (per-row INSERT) disappears.

Parity notes (verified against the reference's checked-in data,
SURVEY.md §1.3):

- ``tracks.artist_id`` keeps only the FIRST artist
  (bronze.py:146: ``artists[0]["id"] if artists else None``) while the
  ``artists`` table gets one row per (artist, track) pair
  (bronze.py:186-192) — two different projections of the same array.
- ``albums`` is one row per *track occurrence*, not per album
  (bronze.py:169-175); dedup happens later in the gold dims.
- Parent keys are injected by nested projection (``playlist_id`` into
  tracks, ``track_id`` into albums/artists) — no join needed.
- All output columns are cast to string, matching the reference's
  all-TEXT bronze (bronze.py:202-206). Booleans become ``'true'``/
  ``'false'`` lowercase, as Spark's boolean->string cast produces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _s(col) -> F.Column:
    return col.cast("string")


def bronze_playlists(raw: DataFrame) -> DataFrame:
    """bronze.py:102-109: owner.id -> owner_id, followers.total -> followers."""
    return raw.select(
        _s(F.col("id")).alias("id"),
        _s(F.col("name")).alias("name"),
        _s(F.col("description")).alias("description"),
        _s(F.col("owner.id")).alias("owner_id"),
        _s(F.col("followers.total")).alias("followers"),
        _s(F.col("public")).alias("public"),
    )


def _exploded_items(raw: DataFrame) -> DataFrame:
    return raw.select(
        F.col("id").alias("_playlist_id"),
        F.explode("tracks.items").alias("it"),
    )


def bronze_tracks(raw: DataFrame) -> DataFrame:
    """bronze.py:136-147. Denormalizations preserved: playlist_id injected
    from the parent, album_release_date copied from the album, artist_id =
    first artist only (bronze.py:146)."""
    it = _exploded_items(raw)
    return it.select(
        _s(F.col("it.track.id")).alias("track_id"),
        _s(F.col("it.track.name")).alias("name"),
        _s(F.col("_playlist_id")).alias("playlist_id"),
        _s(F.col("it.track.album.id")).alias("album_id"),
        _s(F.col("it.track.duration_ms")).alias("duration_ms"),
        _s(F.col("it.track.popularity")).alias("popularity"),
        _s(F.col("it.track.explicit")).alias("explicit"),
        _s(F.col("it.track.track_number")).alias("track_number"),
        _s(F.col("it.track.album.release_date")).alias("album_release_date"),
        _s(F.element_at("it.track.artists", 1)["id"]).alias("artist_id"),
    )


def bronze_albums(raw: DataFrame) -> DataFrame:
    """bronze.py:169-175: one row per track occurrence, track_id injected."""
    it = _exploded_items(raw)
    return it.select(
        _s(F.col("it.track.album.id")).alias("album_id"),
        _s(F.col("it.track.album.name")).alias("name"),
        _s(F.col("it.track.album.release_date")).alias("release_date"),
        _s(F.col("it.track.album.total_tracks")).alias("total_tracks"),
        _s(F.col("it.track.id")).alias("track_id"),
    )


def bronze_artists(raw: DataFrame) -> DataFrame:
    """bronze.py:186-192: ALL artists, one row per (artist, track)."""
    it = _exploded_items(raw)
    return it.select(
        F.col("it.track.id").alias("_track_id"),
        F.explode("it.track.artists").alias("a"),
    ).select(
        _s(F.col("a.id")).alias("artist_id"),
        _s(F.col("a.name")).alias("name"),
        _s(F.col("_track_id")).alias("track_id"),
    )


def shred(raw: DataFrame) -> dict[str, DataFrame]:
    """The whole bronze stage as one dict of DataFrames
    (reference table list: bronze.py:361)."""
    return {
        "playlists": bronze_playlists(raw),
        "tracks": bronze_tracks(raw),
        "albums": bronze_albums(raw),
        "artists": bronze_artists(raw),
    }
