"""Incremental Hilbert compaction (round 13, verdict item 5):
append epochs straddle clustered file ranges; OPTIMIZE rewrites ONLY
the straddled overlap groups, restores pairwise-disjoint file ranges,
preserves every row, and lands footer-pruning admission at the
full-rewrite level.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from spotify_etl_aws_spark.sources.sinks import (
    append_hilbert_epoch,
    optimize_hilbert_incremental,
    save_hilbert_table,
)

BITS, FILES = 6, 16
N = 64  # grid side


def _grid(spark, xs, ys, tag0=0):
    return spark.createDataFrame(
        [(tag0 + i, x, y) for i, (x, y) in enumerate(
            (x, y) for x in xs for y in ys
        )],
        "rid long, x long, y long",
    )


def _spans(path):
    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name))
        ki = md.schema_arrow.names.index("_hkey")
        lo = min(md.metadata.row_group(g).column(ki).statistics.min
                 for g in range(md.metadata.num_row_groups))
        hi = max(md.metadata.row_group(g).column(ki).statistics.max
                 for g in range(md.metadata.num_row_groups))
        out.append((lo, hi))
    return sorted(out)


def _admitted_y(path, y0, y1):
    hit = total = 0
    for name in os.listdir(path):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        yi = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "y"
        )
        lo = min(md.row_group(g).column(yi).statistics.min
                 for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(yi).statistics.max
                 for g in range(md.num_row_groups))
        total += 1
        hit += lo <= y1 and y0 <= hi
    return hit, total


def test_optimize_restores_disjointness_and_rows(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = _grid(spark, range(N), range(N))
    save_hilbert_table(base, path, "x", "y", bits=BITS, num_files=FILES)
    # clean write: ranges pairwise disjoint
    spans = _spans(path)
    assert all(a[1] < b[0] for a, b in zip(spans, spans[1:]))

    # two epochs land in a NARROW corner of the grid — they straddle
    # only the files covering that corner
    ep1 = _grid(spark, range(4), range(4), tag0=10_000)
    ep2 = _grid(spark, range(2, 6), range(2, 6), tag0=20_000)
    append_hilbert_epoch(ep1, path, "x", "y", bits=BITS)
    append_hilbert_epoch(ep2, path, "x", "y", bits=BITS)
    n_total = N * N + 16 + 16

    stats = optimize_hilbert_incremental(spark, path)
    assert stats["groups_rewritten"] >= 1
    # incremental, not full: most base files untouched (hardlinked)
    assert stats["files_linked"] > stats["files_rewritten"] - 2
    assert stats["files_rewritten"] < stats["files"]
    # invariant restored + zero row loss/duplication
    spans = _spans(path)
    assert all(a[1] < b[0] for a, b in zip(spans, spans[1:]))
    assert spark.read.parquet(path).count() == n_total
    assert (
        spark.read.parquet(path).select("rid").distinct().count() == n_total
    )


def test_optimize_idempotent(spark, tmp_path):
    path = str(tmp_path / "tbl2")
    save_hilbert_table(
        _grid(spark, range(N), range(N)), path, "x", "y",
        bits=BITS, num_files=FILES,
    )
    append_hilbert_epoch(
        _grid(spark, range(8), range(8), tag0=10_000), path, "x", "y",
        bits=BITS,
    )
    first = optimize_hilbert_incremental(spark, path)
    assert first["groups_rewritten"] >= 1
    second = optimize_hilbert_incremental(spark, path)
    assert second["groups_rewritten"] == 0  # nothing left to repay
    assert second["files_rewritten"] == 0


def test_post_compaction_admission_matches_full_rewrite(spark, tmp_path):
    """The verdict's done-condition: after appends + OPTIMIZE, the
    y-band footer admission equals a from-scratch full rewrite of the
    same rows (disjointness, not global order, drives file-level
    pruning) — and beats the append-only state."""
    inc = str(tmp_path / "incremental")
    full = str(tmp_path / "full")
    base = _grid(spark, range(N), range(N))
    # the epoch samples the WHOLE grid (every 8th x, every 4th y), so
    # its one appended file's y-range spans the probe band — the
    # append-only state must admit it for every y predicate
    ep = _grid(spark, range(0, N, 8), range(0, N, 4), tag0=10_000)

    save_hilbert_table(base, inc, "x", "y", bits=BITS, num_files=FILES)
    append_hilbert_epoch(ep, inc, "x", "y", bits=BITS)
    append_only = _admitted_y(inc, 8, 23)

    optimize_hilbert_incremental(spark, inc)
    post_opt = _admitted_y(inc, 8, 23)

    save_hilbert_table(
        base.unionByName(ep), full, "x", "y", bits=BITS, num_files=FILES
    )
    full_rw = _admitted_y(full, 8, 23)

    # the epoch file spans the whole grid's y -> append-only admits it
    assert append_only[0] > post_opt[0]
    # post-compaction admission ~ full rewrite (file counts differ by
    # the epoch's extra file, so compare admission fractions)
    assert post_opt[0] / post_opt[1] <= full_rw[0] / full_rw[1] + 1 / FILES
    # identical rows visible either way
    assert (
        spark.read.parquet(inc).count()
        == spark.read.parquet(full).count()
    )


def test_optimize_is_key_agnostic(spark, tmp_path):
    """The OPTIMIZE only reads key_col footer ranges — it maintains a
    z-order (Morton) clustered table exactly the same way."""
    from pyspark.sql import functions as F

    from spotify_etl_aws_spark.operators.zorder import zvalue

    path = str(tmp_path / "ztbl")
    base = _grid(spark, range(N), range(N)).withColumn(
        "_hkey", zvalue(["x", "y"], bits=BITS)
    )
    (
        base.repartitionByRange(FILES, "_hkey")
        .sortWithinPartitions("_hkey")
        .write.mode("overwrite")
        .parquet(path)
    )
    ep = _grid(spark, range(4), range(4), tag0=10_000).withColumn(
        "_hkey", zvalue(["x", "y"], bits=BITS)
    )
    ep.coalesce(1).write.mode("append").parquet(path)
    stats = optimize_hilbert_incremental(spark, path)
    assert stats["groups_rewritten"] >= 1
    spans = _spans(path)
    assert all(a[1] < b[0] for a, b in zip(spans, spans[1:]))
    assert spark.read.parquet(path).count() == N * N + 16


def test_bin_packing_bounds_file_count(spark, tmp_path):
    """Round-14 (verdict item 4): repeated SMALL epoch appends accrete
    one file each; OPTIMIZE with target_file_bytes merges undersized
    neighbors into the rewrite groups (Delta's file-size floor), so
    the steady-state file count is bounded by data/target instead of
    growing with epoch count — while disjointness, row preservation
    and footer admission all hold."""
    path = str(tmp_path / "tbl3")
    base = _grid(spark, range(N), range(N))
    save_hilbert_table(base, path, "x", "y", bits=BITS, num_files=4)
    n_total = N * N
    for e in range(10):  # ten tiny epochs, one file each
        ep = _grid(spark, range(4), range(4), tag0=(e + 1) * 10_000)
        append_hilbert_epoch(ep, path, "x", "y", bits=BITS)
        n_total += 16
    n_files_before = sum(
        1 for n in os.listdir(path) if n.endswith(".parquet")
    )
    assert n_files_before == 14  # 4 base + 10 epochs

    # target ~ one base file's size: epochs (tiny) all fall under the
    # floor and must coalesce
    base_bytes = max(
        os.path.getsize(os.path.join(path, n))
        for n in os.listdir(path)
        if n.endswith(".parquet")
    )
    stats = optimize_hilbert_incremental(
        spark, path, target_file_bytes=base_bytes
    )
    assert stats["files_after"] < n_files_before
    assert stats["files_after"] <= 6, stats  # bounded, not 14
    spans = _spans(path)
    assert all(a[1] < b[0] for a, b in zip(spans, spans[1:]))
    df = spark.read.parquet(path)
    assert df.count() == n_total
    assert df.select("rid").distinct().count() == n_total
    # steady state: a second pass with the same target is a no-op or
    # nearly so, and never grows the file count
    again = optimize_hilbert_incremental(
        spark, path, target_file_bytes=base_bytes
    )
    assert again["files_after"] <= stats["files_after"]
    third = optimize_hilbert_incremental(
        spark, path, target_file_bytes=base_bytes
    )
    assert third["groups_rewritten"] == 0  # converged


def test_bin_packing_preserves_admission(spark, tmp_path):
    """Bin-packed OPTIMIZE must not cost pruning: the y-band footer
    admission FRACTION after packing stays at or under the
    unpacked-incremental level (fewer, larger, still-disjoint files)."""
    packed = str(tmp_path / "packed")
    plain = str(tmp_path / "plain")
    base = _grid(spark, range(N), range(N))
    ep = _grid(spark, range(4), range(4), tag0=10_000)
    for p in (packed, plain):
        save_hilbert_table(base, p, "x", "y", bits=BITS, num_files=FILES)
        append_hilbert_epoch(ep, p, "x", "y", bits=BITS)
    optimize_hilbert_incremental(spark, plain)
    optimize_hilbert_incremental(
        spark, packed, target_file_bytes=max(
            os.path.getsize(os.path.join(plain, n))
            for n in os.listdir(plain) if n.endswith(".parquet")
        )
    )
    hit_packed, total_packed = _admitted_y(packed, 8, 23)
    hit_plain, total_plain = _admitted_y(plain, 8, 23)
    assert hit_packed / total_packed <= hit_plain / total_plain + 1e-9
    assert (
        spark.read.parquet(packed).count()
        == spark.read.parquet(plain).count()
    )
