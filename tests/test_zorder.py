"""Z-order layout (operators/zorder.py): Morton-curve correctness
against a python reference, and the pruning property itself — per-file
parquet footer min/max ranges tight on BOTH interleaved columns, which
a single-column sort provably can't give."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from spotify_etl_aws_spark.operators.zorder import (
    interleave_bits,
    zorder_write,
    zvalue,
)


def _py_morton(vals: list[int], bits: int) -> int:
    z = 0
    for k, v in enumerate(vals):
        for b in range(bits):
            z |= ((v >> b) & 1) << (b * len(vals) + k)
    return z


def test_interleave_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(x, y) for x in range(0, 64, 7) for y in range(0, 64, 5)],
        "x long, y long",
    )
    got = df.select(
        "x", "y", interleave_bits([F.col("x"), F.col("y")], 6).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _py_morton([r["x"], r["y"]], 6)
    # locality sanity: the curve orders quadrants — all points in the
    # low-low quadrant sort before any in the high-high quadrant
    zs = {(r["x"], r["y"]): r["z"] for r in got}
    low = max(v for (x, y), v in zs.items() if x < 32 and y < 32)
    high = min(v for (x, y), v in zs.items() if x >= 32 and y >= 32)
    assert low < high


def test_interleave_three_cols_and_validation(spark):
    df = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long")
    (r,) = df.select(
        interleave_bits([F.col("a"), F.col("b"), F.col("c")], 4).alias("z")
    ).collect()
    assert r["z"] == _py_morton([1, 2, 3], 4)
    with pytest.raises(ValueError, match="fit a long"):
        interleave_bits([F.col("a"), F.col("b")], 32)
    with pytest.raises(ValueError, match="at least one"):
        interleave_bits([], 4)


def test_zvalue_normalizes_and_is_constant_safe(spark):
    df = spark.createDataFrame(
        [(0.0, 100.0, 7), (50.0, 100.0, 7), (100.0, 100.0, 7)],
        "x double, k double, c long",
    )
    zdf, key = zvalue(df, ["x", "k", "c"], bits=4)
    rows = zdf.select("x", key).collect()
    # constant columns bin to 0 everywhere, so z is driven by x alone:
    # monotone in x here because x is the lowest-index column
    ordered = sorted(rows, key=lambda r: r["x"])
    zs = [r[key] for r in ordered]
    assert zs == sorted(zs) and zs[0] < zs[-1]


def _file_range_fractions(path: str, col: str, lo: float, hi: float) -> list[float]:
    """Per parquet file: (max(col) - min(col)) / domain width."""
    fracs = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        mn, mx = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    mn = s.min if mn is None else min(mn, s.min)
                    mx = s.max if mx is None else max(mx, s.max)
        assert mn is not None, f"no stats for {col} in {f}"
        fracs.append((mx - mn) / (hi - lo))
    return fracs


def test_layout_gives_tight_file_ranges_on_both_columns(spark, tmp_path):
    """The reason this operator exists: after a z-order write, per-file
    min/max is tight on BOTH columns; after a plain sort on x, y's
    per-file range spans the whole domain (filters on y prune
    nothing)."""
    n = 1 << 14
    df = (
        spark.range(n)
        .select(
            # two decorrelated uniform columns via independent hashes
            (F.abs(F.xxhash64(F.col("id"))) % 4096).alias("x"),
            (F.abs(F.xxhash64(F.col("id") + 12345)) % 4096).alias("y"),
        )
    )
    naive = str(tmp_path / "naive")
    zord = str(tmp_path / "zorder")
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(naive)
    )
    zorder_write(df, zord, ["x", "y"], bits=12, num_files=16)

    naive_y = _file_range_fractions(naive, "y", 0, 4095)
    z_x = _file_range_fractions(zord, "x", 0, 4095)
    z_y = _file_range_fractions(zord, "y", 0, 4095)

    # single-column sort: y is unsorted inside every file
    assert min(naive_y) > 0.9
    # z-order: both columns tight in the average file — each file
    # covers a quadrant-ish region, not the full domain
    assert sum(z_x) / len(z_x) < 0.6
    assert sum(z_y) / len(z_y) < 0.6
    # and the z-written table still holds all the rows
    assert spark.read.parquet(zord).count() == n
    # the layout key never leaks into the schema
    assert set(spark.read.parquet(zord).columns) == {"x", "y"}
