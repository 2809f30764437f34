"""Plan + behavior pins for the extended-surface lanes
(``queries/sqlsurface.py``). The sweep proves values; these pin the
physical shapes that matter at 100 TB."""

from __future__ import annotations

import pytest

from spotify_etl_aws_spark.queries import all_queries

QUERIES = all_queries()


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_lateral_posexplode_is_generate_no_shuffle(spark, sf_dir):
    """posexplode must plan as a map-side Generate — per-row expansion
    with no join and no exchange; document text never shuffles."""
    plan = _plan(spark, sf_dir, "join_lateral_posexplode")
    assert "Generate" in plan
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_grouping_sets_single_expand(spark, sf_dir):
    """GROUPING SETS must plan ONE Expand feeding one aggregation —
    not one scan per set."""
    plan = _plan(spark, sf_dir, "agg_grouping_sets")
    assert plan.count("Expand") == 1, plan
    assert plan.count("FileScan") == 1, plan


def test_corr_exact_is_one_aggregation(spark, sf_dir):
    """The six co-moments ride one partial-agg shuffle; the corr
    formula is projected after, never a second pass over lineitem."""
    plan = _plan(spark, sf_dir, "stats_corr_exact")
    assert plan.count("FileScan") == 1, plan


def test_redact_is_mapside(spark, sf_dir):
    plan = _plan(spark, sf_dir, "text_regex_redact")
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_csv_roundtrip_preserves_every_row(spark, sf_dir):
    """Totals over the CSV-read frame must equal the parquet source —
    header handling or quoting bugs would drop/garble rows."""
    got = QUERIES["source_csv_roundtrip"](spark, sf_dir)
    from spotify_etl_aws_spark.sources.readers import load_table

    n_csv = got.agg({"n_customers": "sum"}).collect()[0][0]
    n_pq = load_table(spark, sf_dir, "customer").count()
    assert n_csv == n_pq


def test_partitioned_write_prunes_at_planning_time(spark, sf_dir):
    """The o_year predicate must land in PartitionFilters (directory
    pruning before any file is opened) — at 100 TB this is reading one
    year, not the whole table. Also: no row-level o_year filter should
    remain, and only the matching partition's files are listed."""
    import os
    import tempfile

    df = QUERIES["sink_partitioned_pruning"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = plan[plan.find("FileScan"):]
    pf = scan.split("PartitionFilters:")[1].split("]")[0]
    assert "o_year" in pf and "1997" in pf, scan[:600]
    # behavioral twin: the pruned read must equal reading ONLY the
    # matching partition directory (inputFiles() reports the
    # pre-pruning listing, so it can't serve as the proof)
    sub = os.path.join(
        tempfile.gettempdir(),
        f"part_orders_{os.path.basename(os.path.normpath(sf_dir))}",
        "o_year=1997",
    )
    n_direct = spark.read.parquet(sub).count()
    n_pruned = df.agg({"n_orders": "sum"}).collect()[0][0]
    assert n_pruned == n_direct


def test_dynamic_partition_pruning_fires(spark, sf_dir, tmp_path):
    """DPP — the runtime companion to static pruning: a join against a
    FILTERED dim on the partition column must inject a
    dynamicpruningexpression into the fact scan's PartitionFilters
    (fed by a broadcast subquery), so at 100 TB the fact side reads
    only the dim-selected partitions even though the selected years
    are unknowable at plan time. Behavioral twin: result equals the
    statically-filtered aggregate."""
    from pyspark.sql import functions as F

    from spotify_etl_aws_spark.sources.readers import load_table

    scratch = str(tmp_path / "dpp_orders")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.year("o_orderdate").alias("o_year"),
    )
    orders.write.mode("overwrite").partitionBy("o_year").parquet(scratch)
    fact = spark.read.parquet(scratch)
    dim = spark.createDataFrame(
        [(1997, "keep"), (1998, "drop")], "o_year int, tag string"
    ).filter(F.col("tag") == "keep")
    j = fact.join(dim, "o_year").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("c")
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan.lower(), plan[:1500]
    got = j.collect()[0]
    want = (
        fact.filter(F.col("o_year") == 1997)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("c"))
        .collect()[0]
    )
    assert (got["n"], got["c"]) == (want["n"], want["c"])


def test_orc_roundtrip_preserves_every_row(spark, sf_dir):
    got = QUERIES["source_orc_roundtrip"](spark, sf_dir)
    from spotify_etl_aws_spark.sources.readers import load_table

    n_orc = got.agg({"n_rows": "sum"}).collect()[0][0]
    n_pq = load_table(spark, sf_dir, "lineitem").count()
    assert n_orc == n_pq


def test_python_sink_reader_trusts_only_manifest(spark, tmp_path):
    """Two-phase-commit discipline: a stray part file that never made
    it into _MANIFEST.json (a crashed task's leftover, a concurrent
    writer's stage) must be invisible to the committed read."""
    import json
    import os

    from pyspark.sql import functions as F

    from spotify_etl_aws_spark.sources.pysource import (
        read_jsonl_committed,
        register,
    )
    from spotify_etl_aws_spark.sources.readers import load_table

    register(spark)
    out = str(tmp_path / "committed")
    proj = load_table(spark, "/root/testdata/sf0.001", "customer").select(
        "c_custkey", "c_mktsegment"
    )
    proj.write.format("jsonl_commit").option("path", out).mode("append").save()
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert manifest["total_rows"] == proj.count()
    # plant a stray (uncommitted) part file
    with open(os.path.join(out, "part-99999-stray.jsonl"), "w") as f:
        f.write('{"c_custkey": 999999, "c_mktsegment": "GHOST"}\n')
    back = read_jsonl_committed(
        spark, out, "c_custkey bigint, c_mktsegment string"
    )
    assert back.count() == proj.count()
    assert back.filter(F.col("c_mktsegment") == "GHOST").count() == 0


def test_stream_sink_replayed_batch_replaces_manifest(tmp_path):
    """Recovery semantics: when Spark replays a batch after a driver
    failure, the re-commit must REPLACE the batch's manifest (and the
    first attempt's parts become invisible orphans) — publishing both
    attempts would double-count."""
    import json
    import os

    from spotify_etl_aws_spark.sources.pysource import (
        _JsonlStreamWriter,
        _PartMessage,
    )

    out = str(tmp_path / "sink")
    os.makedirs(out)
    w = _JsonlStreamWriter(out, ["a"])
    first = [_PartMessage(part_file="part-old.jsonl", n_rows=7)]
    w.commit(first, batchId=3)
    replay = [_PartMessage(part_file="part-new.jsonl", n_rows=7)]
    w.commit(replay, batchId=3)
    with open(os.path.join(out, "_MANIFEST-3.json")) as f:
        manifest = json.load(f)
    assert [p["file"] for p in manifest["parts"]] == ["part-new.jsonl"]
    assert manifest["total_rows"] == 7


def test_python_datasource_partition_per_fragment(spark, tmp_path):
    """The custom connector must plan one InputPartition per parquet
    fragment — the fan-out is the point of a DataSource over a driver
    loop. Write a 4-fragment dataset, read through the source, and pin
    the partition count and row fidelity."""
    from pyspark.sql import functions as F

    from spotify_etl_aws_spark.sources.pysource import register
    from spotify_etl_aws_spark.sources.readers import load_table

    register(spark)
    out = str(tmp_path / "docs4")
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    docs.repartition(4).write.mode("overwrite").parquet(out)
    # drop Spark's _SUCCESS marker from the fragment glob's view: the
    # source lists *.parquet only, so the marker is already excluded
    back = spark.read.format("parquet_pages").load(out)
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == docs.count()
    a = back.agg(F.sum("n_chars")).collect()[0][0]
    b = docs.agg(F.sum("n_chars")).collect()[0][0]
    assert a == b


@pytest.mark.parametrize(
    "name",
    [
        "stats_corr_exact",
        "window_distribution_funcs",
        "agg_grouping_sets",
        "join_lateral_posexplode",
        "text_regex_redact",
        "source_csv_roundtrip",
        "source_orc_roundtrip",
        "sink_partitioned_pruning",
        "order_pack_whole_docs",
        "udtf_split_tokens",
        "window_ignore_nulls_locf",
        "source_schema_evolution",
        "source_python_datasource",
        "search_maxsim_late_interaction",
    ],
)
def test_nonempty_at_smallest_sf(spark, name):
    assert QUERIES[name](spark, "/root/testdata/sf0.001").count() > 0, name
