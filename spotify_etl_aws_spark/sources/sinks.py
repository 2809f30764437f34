"""Sinks (SURVEY.md §2.1 S2/S3/S5/S7/S8/S9).

The reference writes Parquet by materializing a DuckDB table locally,
then re-uploading the file to S3 with boto3 (bronze.py:213-264). Spark
collapses both hops into a single distributed write — the same call
works for ``/local`` and ``s3a://`` destinations.

The reference's MotherDuck CTAS (bronze.py:294-318) maps to
``saveAsTable`` against the session catalog; its dbt post-hook gold
export — which re-runs after **every** core model, 4x
(dbt_project.yml:41) — becomes a single explicit ``write_parquet`` at
the end of the gold build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Directory-partitioned parquet — the scale posture for gold tables.

    Partitioning by a low-cardinality pruning key (the reference's analogue:
    ``playlist_id`` on the fact) turns downstream per-key reads into
    partition-pruned scans instead of full-table filters.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Raw-zone JSON landing (reference raw.py:200-241)."""
    df.write.mode(mode).json(path)


def save_as_table(df: DataFrame, name: str, mode: str = "overwrite") -> None:
    """Catalog sink — the Spark equivalent of the reference's remote-catalog
    CTAS into MotherDuck (bronze.py:294-318, manager.py:151-171)."""
    df.write.mode(mode).saveAsTable(name)


def save_bucketed(
    df: DataFrame,
    name: str,
    buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed catalog table: rows are hash-bucketed (and optionally
    sorted) on the join key at WRITE time, so two tables bucketed the
    same way join with ZERO exchanges and zero sorts — the shuffle is
    paid once at layout time instead of on every query. The 100 TB
    posture for fact⋈fact joins that AQE can't broadcast."""
    w = df.write.mode(mode).bucketBy(buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(name)
