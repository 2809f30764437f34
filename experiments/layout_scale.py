"""Layout-pruning probe (round-12 verdict item 2): does writing data
CLUSTERED by the Hilbert key actually reduce what a 2-D range
predicate reads, versus linear and z-order layouts?

Protocol: the 10x-amplified part table (200k rows via experiments/
common.amplify; sf0.1 part is 20k) is written 4 ways x 32 files (ingest order, linear
sort on p_size, z-order, Hilbert — same (p_size, price-bucket) grid
as the declared layout lanes, bits=9), then a mid-range 2-D band
predicate (p_size in [20, 29], p_retailprice in [940, 970)) is
evaluated against every file's and row-group's parquet min/max
footer stats. Reported: files/row-groups whose bounding box
intersects the predicate — exactly what an engine's footer pruning
admits, measured from the footers themselves (engine-independent and
deterministic, unlike timing). Spark-side cross-check: the same
filter's selected-rows count agrees across layouts.

Result (2026-08-16, 200k rows, 32 files, bits=9; BASELINE.md 'Layout
pruning'): 2-D band admits hilbert 7/32 files < linear 8 < zorder 9
<< ingest 32; the y-only band admits 26/32 for both space-filling
layouts while linear/ingest admit ALL 32 (a first-sort-key layout can
never prune the second dimension). Row counts identical (12,090) on
every layout. The y-only admission is bounded below by the domain:
10 distinct price buckets across 32 files means most boxes span
several buckets — at production cardinalities the same layouts admit
proportionally fewer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq

from experiments.common import amplify

BITS = 9
N_FILES = 32
# mid-range 2-D band: sizes 20..29, prices 940.00..969.99 (the
# fixture's price domain is [900, 1000) -> buckets 90..99)
X0, X1 = 20, 29
P0, P1 = 940.0, 970.0


def _boxes(out_dir: str):
    """(file, row-group) min/max boxes for p_size and p_retailprice
    straight from the parquet footers."""
    files = []
    for name in sorted(os.listdir(out_dir)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(out_dir, name))
        idx = {
            md.schema_arrow.names.index("p_size"): "x",
            md.schema_arrow.names.index("p_retailprice"): "p",
        }
        rgs = []
        for g in range(md.metadata.num_row_groups):
            rg = md.metadata.row_group(g)
            box = {}
            for c in range(rg.num_columns):
                col = rg.column(c)
                tag = idx.get(c)
                if tag:
                    st = col.statistics
                    box[tag] = (st.min, st.max)
            rgs.append(box)
        files.append(rgs)
    return files


def _hits(files, with_x=True):
    """Admission counts; with_x=False probes the y-only band (the
    predicate a FIRST-sort-key layout can never prune)."""
    f_hits = g_hits = groups = 0
    for rgs in files:
        groups += len(rgs)
        fh = False
        for box in rgs:
            (x0, x1), (p0, p1) = box["x"], box["p"]
            ok = p0 < P1 and P0 <= p1
            if with_x:
                ok = ok and x0 <= X1 and X0 <= x1
            if ok:
                g_hits += 1
                fh = True
        f_hits += fh
    return f_hits, len(files), g_hits, groups


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from spotify_etl_aws_spark.operators.hilbert import hilbert_layout
    from spotify_etl_aws_spark.operators.zorder import zorder_layout
    from spotify_etl_aws_spark.sources.sinks import save_hilbert_clustered

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    path, n = amplify("part", "p_partkey", 10, "/tmp/layout-amp")
    src = spark.read.parquet(path)
    # the declared lanes' grid: x = p_size, y = floor(cents / 1000)
    ycol = F.expr(
        "CAST(floor(CAST(round(p_retailprice * 100) AS BIGINT) / 1000)"
        " AS BIGINT)"
    )
    base = src.withColumn("__x", F.col("p_size").cast("long")).withColumn(
        "__y", ycol
    )
    out_root = "/tmp/layout-amp/layouts"
    layouts = {
        "ingest": base.repartition(N_FILES),
        "linear_size": base.repartitionByRange(N_FILES, "__x", "__y")
        .sortWithinPartitions("__x", "__y"),
        "zorder": zorder_layout(base, ["__x", "__y"], bits=BITS,
                                num_files=N_FILES),
        "hilbert": hilbert_layout(base, "__x", "__y", bits=BITS,
                                  num_files=N_FILES),
    }
    results = {}
    match_rows = {}
    for name, frame in layouts.items():
        dst = f"{out_root}/{name}"
        t0 = time.time()
        if name == "hilbert":
            # exercise the declared sink itself (grid cols ride along
            # in every layout's output — symmetry for the footer read)
            save_hilbert_clustered(
                base, dst, "__x", "__y", bits=BITS, num_files=N_FILES
            )
        else:
            frame.write.mode("overwrite").parquet(dst)
        wall = time.time() - t0
        boxes = _boxes(dst)
        fh, nf, gh, ng = _hits(boxes)
        fy, _, gy, _ = _hits(boxes, with_x=False)
        got = (
            spark.read.parquet(dst)
            .filter(
                (F.col("p_size").between(X0, X1))
                & (F.col("p_retailprice") >= P0)
                & (F.col("p_retailprice") < P1)
            )
            .count()
        )
        match_rows[name] = got
        results[name] = {
            "files_admitted": fh, "files": nf,
            "rowgroups_admitted": gh, "rowgroups": ng,
            "files_admitted_y_only": fy, "rowgroups_admitted_y_only": gy,
            "write_sec": round(wall, 2), "rows_matched": got,
        }
        print(name, results[name])
    assert len(set(match_rows.values())) == 1, match_rows  # same answer
    print(json.dumps({"n_rows": n, "predicate":
                      f"size in [{X0},{X1}], price in [{P0},{P1})",
                      "results": results}))


def main_incremental() -> None:
    """Round-13 probe (verdict item 5): pruning retained by the
    INCREMENTAL Hilbert compaction vs append-only vs full rewrite, at
    the same 10x/200k-row scale (amplify(part, 10) on sf0.1's 20k-row
    part table). 90% of the amplified part table is the
    clustered base; the remaining 10% lands as an epoch append (one
    file straddling many ranges); admission for the 2-D band is
    measured from the footers in all three states, plus how much data
    the incremental pass actually rewrote."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from spotify_etl_aws_spark.sources.sinks import (
        append_hilbert_epoch,
        optimize_hilbert_incremental,
        save_hilbert_table,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    path, n = amplify("part", "p_partkey", 10, "/tmp/layout-amp")
    src = spark.read.parquet(path)
    ycol = F.expr(
        "CAST(floor(CAST(round(p_retailprice * 100) AS BIGINT) / 1000)"
        " AS BIGINT)"
    )
    base = src.withColumn("__x", F.col("p_size").cast("long")).withColumn(
        "__y", ycol
    )
    # the epoch is LOCALIZED in the grid (new rows land inside the
    # probe's size band — the time-correlated-keys pattern real
    # appends have) and OVERLAPS existing coverage, so its files
    # genuinely straddle the base files for that region; a uniformly-
    # sampled epoch instead overlaps every file's range and correctly
    # degenerates to a full rewrite (probed) — locality is what
    # incremental clustering monetizes
    in_epoch = (F.col("p_size").between(20, 24)) & (
        F.col("p_partkey") % 2 == 0
    )
    main_part = base.filter(~in_epoch)
    epoch = base.filter(in_epoch)

    inc = "/tmp/layout-amp/layouts/incremental"
    full = "/tmp/layout-amp/layouts/full_rewrite"
    save_hilbert_table(
        main_part, inc, "__x", "__y", bits=BITS, num_files=N_FILES
    )
    # range-split the epoch so each epoch file covers a narrow d-span
    # (a single-file epoch's span would bridge the band's curve
    # segments and straddle far more base files)
    append_hilbert_epoch(
        epoch, inc, "__x", "__y", bits=BITS, num_files=8
    )

    def probe(d):
        fh, nf, gh, ng = _hits(_boxes(d))
        rows = (
            spark.read.parquet(d)
            .filter(
                (F.col("p_size").between(X0, X1))
                & (F.col("p_retailprice") >= P0)
                & (F.col("p_retailprice") < P1)
            )
            .count()
        )
        return {
            "files_admitted": fh, "files": nf,
            "rowgroups_admitted": gh, "rowgroups": ng, "rows_matched": rows,
        }

    out = {"n_rows": n}
    out["append_only"] = probe(inc)
    t0 = time.time()
    stats = optimize_hilbert_incremental(spark, inc)
    out["optimize_stats"] = {**stats, "optimize_sec": round(time.time() - t0, 2)}
    out["post_optimize"] = probe(inc)
    t0 = time.time()
    save_hilbert_table(
        base, full, "__x", "__y", bits=BITS, num_files=N_FILES
    )
    out["full_rewrite"] = {**probe(full),
                           "rewrite_sec": round(time.time() - t0, 2)}
    assert (
        out["append_only"]["rows_matched"]
        == out["post_optimize"]["rows_matched"]
        == out["full_rewrite"]["rows_matched"]
    )
    print(json.dumps(out))


def main_small_epochs() -> None:
    """Round-14 probe (verdict item 4): MANY SMALL EPOCHS. Ten 1-file
    epoch appends accrete ten undersized straddling files; OPTIMIZE
    with a target file size (the max base-file size) must (a) bound
    the final file count near the base count instead of base+10,
    (b) restore disjoint ranges and full row visibility, (c) retain
    the full-rewrite admission level, and (d) converge — a repeat
    pass rewrites nothing. Same 10x/200k-row amplified part fixture
    and probe band as main_incremental."""
    import os

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from spotify_etl_aws_spark.sources.sinks import (
        append_hilbert_epoch,
        optimize_hilbert_incremental,
        save_hilbert_table,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    path, n = amplify("part", "p_partkey", 10, "/tmp/layout-amp")
    src = spark.read.parquet(path)
    ycol = F.expr(
        "CAST(floor(CAST(round(p_retailprice * 100) AS BIGINT) / 1000)"
        " AS BIGINT)"
    )
    base = src.withColumn("__x", F.col("p_size").cast("long")).withColumn(
        "__y", ycol
    )
    # ten localized epoch slices inside the probe band (p_partkey
    # residue classes), each ~1% of the table, landing as ONE file
    in_band = F.col("p_size").between(20, 24)
    main_part = base.filter(~(in_band & (F.col("p_partkey") % 20 < 10)))
    tbl = "/tmp/layout-amp/layouts/small_epochs"
    save_hilbert_table(
        main_part, tbl, "__x", "__y", bits=BITS, num_files=N_FILES
    )
    for res in range(10):
        ep = base.filter(in_band & (F.col("p_partkey") % 20 == res))
        append_hilbert_epoch(ep, tbl, "__x", "__y", bits=BITS, num_files=1)
    count_files = lambda: sum(  # noqa: E731
        1 for f in os.listdir(tbl) if f.endswith(".parquet")
    )
    out = {"n_rows": n, "files_after_appends": count_files()}
    fh, nf, gh, ng = _hits(_boxes(tbl))
    out["append_only"] = {"files_admitted": fh, "files": nf}
    target = max(
        os.path.getsize(os.path.join(tbl, f))
        for f in os.listdir(tbl)
        if f.endswith(".parquet")
    )
    t0 = time.time()
    stats = optimize_hilbert_incremental(
        spark, tbl, target_file_bytes=target
    )
    out["optimize_stats"] = {
        **stats,
        "target_file_bytes": target,
        "optimize_sec": round(time.time() - t0, 2),
    }
    fh, nf, gh, ng = _hits(_boxes(tbl))
    out["post_optimize"] = {"files_admitted": fh, "files": nf}
    again = optimize_hilbert_incremental(
        spark, tbl, target_file_bytes=target
    )
    out["repeat_pass"] = {
        "groups_rewritten": again["groups_rewritten"],
        "files_after": again["files_after"],
    }
    assert spark.read.parquet(tbl).count() == n
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "incremental":
        main_incremental()
    elif len(sys.argv) > 1 and sys.argv[1] == "small-epochs":
        main_small_epochs()
    else:
        main()
