"""Sources.

Spark-first replacements for the reference's readers
(SURVEY.md §2.1 S1/S4/S6):

- Parquet scans with declared schemas (no runtime inference) so Catalyst
  gets column pruning + predicate pushdown into the row groups for free.
- Multiline JSON reads for the raw playlist documents — the declarative
  equivalent of the reference's ``s3.get_object -> chardet -> json.loads``
  ingest (reference: ingestion/ingestion/bronze/bronze.py:33-77); schema
  supplied explicitly so an empty/partial file cannot silently change
  downstream types.

Paths are plain strings: ``/local/dir`` in tests, ``s3a://bucket/...`` on
a cluster — the code does not care which.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import (
    EVENTS_PARQUET_NANOS,
    RAW_PLAYLIST,
    TESTDATA_SCHEMAS,
    TESTDATA_TABLES,
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def enable_nanos_as_long(spark: SparkSession) -> None:
    """events.parquet stores ts as INT64 timestamp[ns]; Spark's vectorized
    parquet reader cannot load that as TimestampType. This legacy flag maps
    nanos columns to plain longs so the reader accepts them; the conversion
    to microsecond timestamps happens explicitly in ``_events_ts``.
    Runtime-settable, so it also works on a driver-created session.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def _events_ts(df: DataFrame) -> DataFrame:
    # integer div keeps the conversion exact (no double rounding at 1.7e18)
    return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One testdata table, schema-declared parquet scan."""
    if name == "events":
        enable_nanos_as_long(spark)
        raw = spark.read.schema(EVENTS_PARQUET_NANOS).parquet(
            table_path(sf_dir, name)
        )
        return _events_ts(raw)
    reader = spark.read
    schema = TESTDATA_SCHEMAS.get(name)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(table_path(sf_dir, name))


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TESTDATA_TABLES)}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for the SQL surface."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def read_raw_playlists(spark: SparkSession, path: str, encoding: str = "UTF-8") -> DataFrame:
    """Raw playlist JSON (array-of-playlists documents) -> one row per playlist.

    Replaces the reference's driver-side ``get_object + chardet + json.loads``
    (bronze.py:33-77) with a distributed multiline JSON scan. The encoding
    sniff becomes an explicit reader option; the reference's ISO-8859-1
    fallback is available via ``encoding="ISO-8859-1"``.
    """
    return (
        spark.read.schema(RAW_PLAYLIST)
        .option("multiLine", True)
        .option("encoding", encoding)
        .json(path)
    )
