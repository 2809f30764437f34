"""Z-order layout (operators/zorder.py): bit-interleave parity with a
Python reference, locality (file bounding boxes shrink vs linear
sort), and the measurable pruning win a 2-D predicate gets from the
layout."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from spotify_etl_aws_spark.operators.zorder import zorder_layout, zvalue


def _morton(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_reference(spark):
    rows = [(x, y) for x in range(0, 64, 7) for y in range(0, 64, 5)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = df.select("x", "y", zvalue(["x", "y"], bits=6).alias("z")).collect()
    for r in out:
        assert r.z == _morton(r.x, r.y, 6), (r.x, r.y)


def test_zvalue_validates(spark):
    with pytest.raises(ValueError, match="at least one"):
        zvalue([])
    with pytest.raises(ValueError, match="signed long"):
        zvalue(["a", "b"], bits=32)


def test_layout_improves_2d_locality(spark, tmp_path):
    """Partition a 2-D grid into files via z-order vs lexicographic
    sort: a predicate on the SECOND dimension alone must prune most
    z-order files (each covers a compact square) but NO linear-sort
    files (each x-stripe spans every y) — the exact min/max footer
    pruning effect the layout exists for."""
    n, files = 64, 16
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")

    def file_boxes(frame):
        boxed = frame.withColumn("__f", F.spark_partition_id())
        return (
            boxed.groupBy("__f")
            .agg(
                F.min("x").alias("x0"), F.max("x").alias("x1"),
                F.min("y").alias("y0"), F.max("y").alias("y1"),
            )
            .collect()
        )

    zboxes = file_boxes(zorder_layout(df, ["x", "y"], bits=6, num_files=files))
    linear = (
        df.withColumn("__k", F.col("x") * n + F.col("y"))
        .repartitionByRange(files, "__k")
        .sortWithinPartitions("__k")
        .drop("__k")
    )
    lboxes = file_boxes(linear)

    # z-order files are ~square, so each bounds y tightly; linear
    # x-stripes all span the full y range
    qy0, qy1 = 8, 23  # a y-only band predicate

    def hits(boxes):
        return sum(1 for b in boxes if b.y0 <= qy1 and qy0 <= b.y1)

    assert hits(lboxes) == len(lboxes), "stripes can never prune on y"
    assert hits(zboxes) <= len(zboxes) // 2, (hits(zboxes), len(zboxes))

    # and the y-spans themselves: every linear file spans all of y,
    # z-order files must average far tighter
    zspan = sum(b.y1 - b.y0 + 1 for b in zboxes) / len(zboxes)
    lspan = sum(b.y1 - b.y0 + 1 for b in lboxes) / len(lboxes)
    assert lspan == n and zspan <= n / 2, (zspan, lspan)
