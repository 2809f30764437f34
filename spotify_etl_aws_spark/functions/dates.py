"""Partial-date normalization (SURVEY.md §2.2 P4).

Spotify album ``release_date`` arrives at three precisions —
``'YYYY'``, ``'YYYY-MM'``, ``'YYYY-MM-DD'`` — and the reference's newer
dbt copy normalizes them with a CASE on string length, padding to
Jan-1 / day-1 and NULLing anything else
(reference: airflow/dags/dbt/spotify_etl_aws/models/staging/
stg_albums.sql:7-12 and stg_tracks.sql:13-18).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_partial_date(col: Column | str) -> Column:
    """len 4 -> ``YYYY-01-01``; len 7 -> ``YYYY-MM-01``; len 10 -> as-is;
    anything else (or an unparseable 10-char string) -> NULL."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(F.length(c) == 4, F.try_to_date(F.concat(c, F.lit("-01-01"))))
        .when(F.length(c) == 7, F.try_to_date(F.concat(c, F.lit("-01"))))
        .when(F.length(c) == 10, F.try_to_date(c))
        .otherwise(F.lit(None).cast("date"))
    )
