"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The inventory itself lives in ``spotify_etl_aws_spark.queries`` —
one named query per implemented operator family from SURVEY.md §2,
plus the north-star dedup/similarity/text/streaming operators.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spotify_etl_aws_spark.queries import all_oracles, all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    lineitem ⋈ orders ⋈ customer ⋈ nation -> revenue per (nation,
    segment) — the reference's gold fact build (two inner equi-joins,
    fact_playlist_tracks.sql:18-20) plus the aggregation layer the
    reference lacks.
    """
    return all_queries()["flagship_revenue"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query.
    Every declared query has an oracle twin (sketch-valued queries emit
    deterministic error-bound contracts instead of raw sketch values);
    a key absent here would get the driver's weaker rows-only check."""
    return all_oracles()
