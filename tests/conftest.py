"""Shared fixtures: tuned local SparkSession + the DuckDB-oracle
comparator that mirrors the driver's correctness gate (row count +
column names + order-insensitive value comparison). Comparison is
EXACT (bit-exact doubles): both this harness and the driver run the
same two engines on the same data, so an exact pass here implies a
driver pass.
"""

from __future__ import annotations

import datetime as dt
import math
import os

import duckdb
import pandas as pd
import pytest

from spotify_etl_aws_spark.schemas import TESTDATA_TABLES
from spotify_etl_aws_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("warehouse")
    s = get_spark(
        app_name="tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={
            "spark.driver.memory": "8g",
            "spark.sql.warehouse.dir": str(warehouse),
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _cell(v) -> str:
    # pd.isna covers None, float NaN, AND pd.NaT — a null date/timestamp
    # arrives as None from Spark but NaT from DuckDB's datetime64 column;
    # both must normalize to the same marker (same guard as tools/sweep.py)
    if v is None or (
        not isinstance(v, (str, bytes, list)) and pd.isna(v)
    ):
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "\\N"
        return repr(v)
    if isinstance(v, (dt.datetime, pd.Timestamp)):
        # Spark DATE columns arrive as datetime.date while DuckDB's .df()
        # delivers datetime64 midnight timestamps — canonicalize both to the
        # bare date form so the comparison is representation-independent.
        # (datetime must be checked before date: datetime is a date subclass.)
        ts = pd.Timestamp(v)
        if ts.tzinfo is None and ts == ts.normalize():
            return ts.date().isoformat()
        return ts.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, bool):
        return str(v)
    return str(v)


def canonicalize(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def assert_df_matches_oracle(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "") -> None:
    got = spark_df.toPandas()
    want = con.sql(sql).df()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch: spark={sorted(got.columns)} oracle={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} != oracle {len(want)}"
    g = canonicalize(got)
    w = canonicalize(want)
    if g != w:
        diffs = [(a, b) for a, b in zip(g, w) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs (spark, oracle): {diffs}")
