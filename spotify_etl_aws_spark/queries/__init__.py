"""Declared query inventory — the correctness contract.

Every implemented operator family from SURVEY.md §2 appears here as a
named query: a ``(spark, sf_dir) -> DataFrame`` callable plus (where the
semantics are SQL-expressible) an equivalent ANSI-SQL oracle string that
DuckDB runs on the same parquet tables. The driver hash-compares the two
at sf=0.01; ``tests/test_oracle.py`` runs the same comparison locally.

Cross-engine parity conventions (see tests/conftest.py):
- every computed column is aliased identically on both sides;
- double aggregates are ``round(x, 2)`` on both sides so summation-order
  ulp drift cannot change the value hash;
- counts are BIGINT on both sides (Spark ``count`` == DuckDB ``count``);
- timestamps are projected as DATE (or strings) where the day is what
  matters, avoiding tz-representation drift;
- int-typed scalars (year(), grouping_id(), …) are cast explicitly on
  whichever side differs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    dedup,
    multimodal,
    relational,
    selection,
    sqlsurface,
    streaming,
    subqueries,
    text,
    tpch,
    udfs,
    vector,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

# Iteration order == the driver's CORRECTNESS order, and the driver checks
# only the FIRST 50 queries: keep the non-relational families (streaming,
# UDF lanes, multimodal, vectors) up front so they can never fall outside
# the verification window if the relational tail grows. The `selection`
# module (round-6 retrieval/mixing/decontamination lanes) sits LAST by
# design: the driver's 50-query window stays byte-stable while
# tests/test_oracle.py verifies the full inventory locally.
_MODULES = [
    vector, udfs, multimodal, streaming, dedup, text, relational, selection,
    subqueries, tpch, sqlsurface,
]


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out
