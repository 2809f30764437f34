"""Mergeable quantile summaries (operators/quantiles.py): exact-rank
invariants (cum weight = within-partition rank, total weight = row
count), the deterministic error bound against brute-force ranks over
random data and partitionings, and validation."""

from __future__ import annotations

import math
import random

import pytest

from spotify_etl_aws_spark.operators.quantiles import (
    estimate_quantiles,
    quantile_summary,
    summary_bounds,
)

QS = [0.25, 0.5, 0.75, 0.9, 0.99]


def _check_contract(vals, rows, qs=QS):
    est, n = estimate_quantiles(rows, qs)
    assert n == len(vals)
    b, max_k = summary_bounds(rows)
    for q in qs:
        target = max(1, math.ceil(q * n))
        cnt_le = sum(1 for v in vals if v <= est[q])
        cnt_lt = sum(1 for v in vals if v < est[q])
        assert cnt_le >= target, (q, cnt_le, target)
        assert cnt_lt < target + b, (q, cnt_lt, target, b)
    return b, max_k


@pytest.mark.parametrize("parts", [1, 4, 13])
def test_bound_holds_across_partitionings(spark, parts):
    rng = random.Random(5)
    vals = [rng.randrange(0, 10_000) for _ in range(5_000)]
    df = spark.createDataFrame(
        [(v,) for v in vals], "cents long"
    ).repartition(parts)
    rows = [r.asDict() for r in quantile_summary(df, "cents", samples=64).collect()]
    # summary size bounded: <= samples + 1 rows per partition
    per_pid = {}
    for r in rows:
        per_pid[r["pid"]] = per_pid.get(r["pid"], 0) + 1
    assert all(c <= 65 for c in per_pid.values())
    # total weight == row count (exact)
    assert sum(r["weight"] for r in rows) == len(vals)
    # global max always kept
    assert max(r["value"] for r in rows) == max(vals)
    b, max_k = _check_contract(vals, rows)
    # the bound is meaningful: at 64 samples it must stay well under n
    assert b + max_k < len(vals) * 0.25


def test_skewed_and_duplicate_heavy_data(spark):
    rng = random.Random(9)
    vals = [0] * 2000 + [rng.randrange(1, 50) for _ in range(500)] + [10**9]
    rng.shuffle(vals)
    df = spark.createDataFrame([(v,) for v in vals], "cents long").repartition(5)
    rows = [r.asDict() for r in quantile_summary(df, "cents", samples=32).collect()]
    _check_contract(vals, rows)


def test_nulls_excluded_and_empty_partitions(spark):
    df = spark.createDataFrame(
        [(1,), (None,), (2,), (3,), (None,)], "cents long"
    ).repartition(8)  # more partitions than rows -> empties
    rows = [r.asDict() for r in quantile_summary(df, "cents", samples=4).collect()]
    assert sum(r["weight"] for r in rows) == 3
    est, n = estimate_quantiles(rows, [1.0])
    assert n == 3 and est[1.0] == 3


def test_validation(spark):
    df = spark.createDataFrame([(1,)], "cents long")
    with pytest.raises(ValueError, match="samples"):
        quantile_summary(df, "cents", samples=0)
    with pytest.raises(ValueError, match="quantile"):
        estimate_quantiles([{"pid": 0, "value": 1, "weight": 1}], [0.0])
    with pytest.raises(ValueError, match="empty"):
        estimate_quantiles([], [0.5])
