"""Jaro / Jaro–Winkler string similarity (north-star, SURVEY.md §2.11a
adjacent — the comparator rung between exact equality and the
edit-distance join in the entity-resolution ladder): the Splink/
production-linkage DEFAULT name comparator (Winkler 1990, the Census
Bureau string comparator), shipped as a pure-Python kernel plus an
Arrow-batched pandas UDF column.

Semantics match DuckDB's ``jaro_winkler_similarity`` BIT-FOR-BIT
(fuzz-pinned over 20k random cases in tests): Jaro with match window
floor(max(|a|,|b|)/2) - 1, transposition count t/2; Winkler prefix
boost j + L*p*(1-j) with L = common prefix capped at 4, p = 0.1,
applied only when j > 0.7 (the classic boost threshold); either
string empty -> 0.0 (even when both are empty — the DuckDB
convention). Because the per-pair arithmetic is a FIXED sequential
formula (no order-dependent float accumulation), both engines land on
identical doubles, so a threshold comparison can sit in an oracle
without a rounding grid.

Scale shape: similarity runs on BLOCKED CANDIDATES only (fs_link's
contract — never on a cross product), inside an Arrow-batched pandas
UDF. The per-row Python loop is the honest seam: no JVM Jaro–Winkler
exists in Spark (production Splink registers a Scala UDF; a
deployment swaps rapidfuzz/jellyfish into this SAME kernel signature
for a C-speed inner loop). The UDF appears only in candidate scoring,
never in candidate generation.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F


def jaro_similarity(s1: str, s2: str) -> float:
    """Jaro similarity in [0, 1]. Either string empty -> 0.0."""
    l1, l2 = len(s1), len(s2)
    if not l1 or not l2:
        return 0.0
    if s1 == s2:
        return 1.0
    window = max(max(l1, l2) // 2 - 1, 0)
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i in range(l1):
        lo, hi = max(0, i - window), min(l2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s1[i] == s2[j]:
                m1[i] = m2[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0


def jaro_winkler(
    s1: str,
    s2: str,
    prefix_weight: float = 0.1,
    max_prefix: int = 4,
    boost_threshold: float = 0.7,
) -> float:
    """Jaro–Winkler similarity in [0, 1] (see module docstring for the
    exact DuckDB-matching conventions)."""
    j = jaro_similarity(s1, s2)
    if j <= boost_threshold:
        return j
    pfx = 0
    for a, b in zip(s1[:max_prefix], s2[:max_prefix]):
        if a != b:
            break
        pfx += 1
    return j + pfx * prefix_weight * (1.0 - j)


def jaro_winkler_col(a: Column | str, b: Column | str) -> Column:
    """Arrow-batched pandas-UDF column: jaro_winkler(a, b) as double.
    NULL in either input -> NULL out (comparator semantics: a missing
    field is neither agreement nor disagreement evidence — callers
    decide via coalesce)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _jw(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if s1 is None or s2 is None else jaro_winkler(s1, s2)
                for s1, s2 in zip(x, y)
            ],
            dtype="float64",
        )

    a_col = F.col(a) if isinstance(a, str) else a
    b_col = F.col(b) if isinstance(b, str) else b
    return _jw(a_col, b_col)
