"""Lenient cast helpers (SURVEY.md §2.8 F1).

The reference's bronze layer is all-TEXT (bronze.py:202-206) and typing
happens only at dbt staging via DuckDB ``CAST`` (stg_tracks.sql:5-14).
With ``spark.sql.ansi.enabled=false`` Spark's ``cast`` already matches
the lenient ``TRY_CAST`` behavior the oracle harness uses: malformed
input -> NULL, never an error.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def lenient_cast(col: Column | str, dtype: str) -> Column:
    """NULL-on-failure cast. ``try_cast`` is explicit so the semantics hold
    even if a session enables ANSI mode."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast(dtype)


def bool_from_string(col: Column | str) -> Column:
    """``'true'``/``'false'`` strings -> boolean.

    The reference stringifies Python bools into TEXT columns
    (bronze.py:208-211; verified ``'true'``/``'false'`` in the checked-in
    parquet) and relies on DuckDB's VARCHAR->BOOLEAN cast
    (stg_playlists.sql:10). Spark's boolean cast accepts the same
    literals (case-insensitive), so a plain cast is exact parity.
    """
    return lenient_cast(col, "boolean")
