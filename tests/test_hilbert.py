"""Hilbert layout keys (operators/hilbert.py): parity of the Spark
projection chain with the textbook scalar xy2d, curve properties
(bijection, unit-step adjacency — the locality Morton lacks), plan
shape (no UDF, no shuffle), and the declared lane."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spotify_etl_aws_spark.operators.hilbert import (
    hilbert_xy2d,
    with_hilbert,
)


def test_reference_small_grid():
    # the canonical 2-bit curve: U-shape order
    order = sorted(
        ((x, y) for x in range(4) for y in range(4)),
        key=lambda p: hilbert_xy2d(p[0], p[1], 2),
    )
    assert order[0] == (0, 0) and order[-1] == (3, 0)
    ds = sorted(hilbert_xy2d(x, y, 2) for x in range(4) for y in range(4))
    assert ds == list(range(16))  # bijection on the full grid


def test_adjacency_full_grid():
    """Consecutive d-indices are ALWAYS grid neighbors (manhattan
    distance 1) — the property Morton order does not have."""
    bits = 4
    n = 1 << bits
    by_d = {
        hilbert_xy2d(x, y, bits): (x, y)
        for x in range(n)
        for y in range(n)
    }
    assert len(by_d) == n * n
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_spark_chain_matches_reference(spark):
    import random

    rng = random.Random(5)
    pts = [(i, rng.randrange(512), rng.randrange(512)) for i in range(800)]
    df = spark.createDataFrame(pts, "k long, x long, y long")
    got = {
        r.k: r.hval
        for r in with_hilbert(df, "x", "y", 9, "hval").collect()
    }
    for k, x, y in pts:
        assert got[k] == hilbert_xy2d(x, y, 9)


def test_plan_no_udf_no_shuffle(spark, sf_dir):
    from spotify_etl_aws_spark.queries.selection import layout_hilbert_keys

    plan = (
        layout_hilbert_keys(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # map-side only
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan


def test_bits_validation(spark):
    df = spark.createDataFrame([(1, 1, 1)], "k long, x long, y long")
    with pytest.raises(ValueError, match="bits"):
        with_hilbert(df, "x", "y", 0)
    with pytest.raises(ValueError, match="bits"):
        with_hilbert(df, "x", "y", 32)


def test_column_collision_guard(spark):
    """out_col or __h* temporaries already present must raise, not
    silently produce duplicate/ambiguous columns (round-12 ADVICE)."""
    df = spark.createDataFrame([(1, 1, 1)], "k long, x long, y long")
    with pytest.raises(ValueError, match="collision|already has"):
        with_hilbert(df.withColumn("hval", F.lit(0)), "x", "y", 4, "hval")
    with pytest.raises(ValueError, match="collision|already has"):
        with_hilbert(df.withColumn("__hx", F.lit(0)), "x", "y", 4)


def test_hilbert_clustered_write_prunes_2d_predicates(spark, tmp_path):
    """save_hilbert_clustered on a 64x64 grid into 16 files: parquet
    footer min/max boxes must admit at most half the files for a
    y-only band (a lexicographic x-sort can never prune on y), and the
    filtered read returns the identical rows — the measured layout win
    experiments/layout_scale.py records at 10x."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from spotify_etl_aws_spark.sources.sinks import save_hilbert_clustered

    n, files = 64, 16
    df = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x long, y long"
    )
    hdir = str(tmp_path / "hilbert")
    ldir = str(tmp_path / "linear")
    save_hilbert_clustered(df, hdir, "x", "y", bits=6, num_files=files)
    (
        df.repartitionByRange(files, "x", "y")
        .sortWithinPartitions("x", "y")
        .write.mode("overwrite").parquet(ldir)
    )
    qy0, qy1 = 8, 23  # y-only band

    def admitted(d):
        import os

        hit = total = 0
        for name in os.listdir(d):
            if not name.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(d, name)).metadata
            y_idx = next(
                i for i in range(md.num_columns)
                if md.row_group(0).column(i).path_in_schema == "y"
            )
            lo = min(md.row_group(g).column(y_idx).statistics.min
                     for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(y_idx).statistics.max
                     for g in range(md.num_row_groups))
            total += 1
            hit += lo <= qy1 and qy0 <= hi
        return hit, total

    h_hit, h_total = admitted(hdir)
    l_hit, l_total = admitted(ldir)
    assert l_hit == l_total  # x-stripes span all of y: nothing prunes
    assert h_hit <= h_total // 2, (h_hit, h_total)
    # same rows either way
    pred = F.col("y").between(qy0, qy1)
    assert (
        spark.read.parquet(hdir).filter(pred).count()
        == spark.read.parquet(ldir).filter(pred).count()
        == n * (qy1 - qy0 + 1)
    )
