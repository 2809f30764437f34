"""Plan-shape regression tests: the scale posture, asserted.

Correctness says what a query returns; these pin HOW — scans prune
columns, filters reach the parquet reader, small dims broadcast, no
cartesian products, no forced broadcast of SF-growing tables. A diff
that silently degrades one of these shapes fails here even though
results stay correct.
"""

from __future__ import annotations

import pytest

from spotify_etl_aws_spark.queries import all_queries

QUERIES = all_queries()


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


BATCH_QUERIES = [
    "flagship_revenue",
    "fact_order_lineitems",
    "q1_pricing_summary",
    "window_rank_topk",
    "join_asof",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_pairs",
    "dedup_jaccard_pairs",
    "dedup_lsh_verified_pairs",
    "vector_ann_ivf_bucketed",
    "orderby_topk",
    "join_range_binned",
    "set_operations",
    "join_semi_anti",
    "corpus_curation",
]


@pytest.mark.parametrize("name", BATCH_QUERIES)
def test_no_cartesian_product(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, name
    # BroadcastNestedLoopJoin is only legitimate for the 1-row broadcast
    # in cosine/centroid queries, never for these
    if name not in ("vector_ann_ivf_bucketed",):
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_flagship_scan_prunes_columns(spark, sf_dir):
    """The lineitem scan must read exactly the 3 columns the query
    touches — a scan of all 16 would be reading ~5x the bytes at 100 TB."""
    plan = _plan(spark, sf_dir, "flagship_revenue")
    scan = next(l for l in plan.splitlines() if "FileScan" in l and "lineitem" in l)
    assert "l_orderkey" in scan and "l_extendedprice" in scan and "l_discount" in scan
    assert "l_shipdate" not in scan and "l_comment" not in scan


def test_flagship_broadcasts_dims_not_fact(spark, sf_dir):
    plan = _plan(spark, sf_dir, "flagship_revenue")
    assert plan.count("BroadcastHashJoin") == 3
    # the probe (lineitem) side must never be exchanged before the joins:
    # the only shuffle is the final groupBy
    assert plan.count("Exchange hashpartitioning") == 1


def test_q1_filter_pushed_to_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    assert "l_comment" not in scan  # column pruning too


def test_q1_partial_aggregation(spark, sf_dir):
    """Map-side combine: a partial hash aggregate must run before the
    exchange so only 6 groups/task cross the wire, not 600k rows."""
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    pre_exchange = plan.split("Exchange hashpartitioning")[1]
    assert "partial_sum" in pre_exchange


def test_window_rank_single_shuffle(spark, sf_dir):
    """Top-k-per-group = exactly one exchange (on the partition key) +
    one sort; a global sort would not survive 100x."""
    plan = _plan(spark, sf_dir, "window_rank_topk")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan


def test_orderby_topk_is_take_ordered(spark, sf_dir):
    """LIMIT after ORDER BY must plan as TakeOrderedAndProject (per-
    partition top-k + merge), never a full global sort."""
    plan = _plan(spark, sf_dir, "orderby_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_q5_broadcasts_only_fixed_dims(spark, sf_dir):
    """The heaviest join tree: nation (25 rows) and region (5 rows) are
    the ONLY forced broadcasts — customer/supplier/orders/lineitem grow
    with SF and must stay shuffle-joinable (AQE may still elect to
    broadcast them at small SF, but the plan must never require it) —
    and no join may degenerate to a cartesian product."""
    df = QUERIES["q5_regional_revenue"](spark, sf_dir)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    # exactly the two fixed-size dims (nation, region) carry broadcast
    # hints on their join sides
    assert optimized.count("strategy=broadcast") == 2, optimized
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # scans prune: lineitem must not read l_comment / l_shipdate
    li_scan = next(
        l for l in plan.splitlines() if "FileScan" in l and "lineitem" in l
    )
    assert "l_comment" not in li_scan and "l_shipdate" not in li_scan


def test_asof_single_exchange_and_sort(spark, sf_dir):
    """The union+window as-of composition: one hash exchange + one sort,
    independent of per-key right cardinality."""
    plan = _plan(spark, sf_dir, "join_asof")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_range_binned_is_equi_join(spark, sf_dir):
    """The big-big range join must meet on the bin EQUI-key (hash or
    sort-merge join), never a nested loop — that's the whole point of
    the bin±1 explode."""
    plan = _plan(spark, sf_dir, "join_range_binned")
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("HashJoin" in plan)
    assert "jbin" in plan


def test_multimodal_media_bytes_never_shuffle(spark, sf_dir):
    """Media BYTES never cross an Exchange: the one allowed shuffle is
    the round-robin fan-out of the 28-byte seed rows BELOW the encode
    kernel (so the CPU-bound codec uses every core); from encode onward
    the plan is scan -> mapInPandas -> projection within a stage. At
    100 TB, shuffling encoded media would dominate the job."""
    plan = _plan(spark, sf_dir, "multimodal_images")
    assert "MapInPandas" in plan
    exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert len(exchanges) == 1 and "RoundRobinPartitioning" in exchanges[0]
    # parents print before children: every MapInPandas (encode, meta
    # decode) must sit ABOVE the seed shuffle, i.e. bytes never shuffle
    assert plan.rindex("MapInPandas") < plan.index("Exchange")


def test_tfidf_partial_aggregation_everywhere(spark, sf_dir):
    """All three hash aggregations (tf, doc_len, df) must partial-
    aggregate map-side before their exchanges."""
    plan = _plan(spark, sf_dir, "text_tfidf_top_terms")
    assert plan.count("partial_count") + plan.count("partial_sum") >= 3


def test_two_lane_topk_has_no_join_and_prunes_scan(spark, sf_dir):
    """Similarity search: both lanes end in TakeOrderedAndProject, the
    query vector is an inlined literal (no join anywhere — a broadcast-
    build job per search would dominate at high QPS), and the parquet
    scan reads only (vec_id, embedding)."""
    plan = _plan(spark, sf_dir, "vector_cosine_topk")
    assert plan.count("TakeOrderedAndProject") == 2  # exact + ivf_probe
    assert "Join" not in plan
    assert "ReadSchema: struct<vec_id:bigint,embedding:array<float" in plan


def test_ivf_probe_lane_prunes_partitions(spark, sf_dir):
    """The declared probe lane scans the cell-partitioned INDEX with a
    PartitionFilters-level `cell IN (...)`: only the NPROBE probed
    cells' directories are read — at 100 TB the probe touches
    ~nprobe/k of the corpus files, never all of them."""
    import os

    from spotify_etl_aws_spark.queries.vector import NPROBE, _ivf_index_path

    plan = _plan(spark, sf_dir, "vector_cosine_topk")
    # the exact lane's raw-table scan has empty PartitionFilters; the
    # probe lane's index scan must carry the cell IN (...) filter
    segs = [s[:160] for s in plan.split("PartitionFilters")[1:]]
    assert any("cell" in s and "IN" in s for s in segs), segs
    # pruning is non-vacuous: the index holds more cells than a probe reads
    idx = _ivf_index_path(spark, sf_dir)
    cells = [d for d in os.listdir(idx) if d.startswith("cell=")]
    assert len(cells) > NPROBE


def test_runtime_bloom_filter_reaches_fact_scan(spark, sf_dir):
    """Runtime filter posture: joining a selectively-filtered dim into
    the fact injects a bloom filter (might_contain over xxhash64 of
    the join key) on the fact side, pruning fact rows BEFORE the
    shuffle. Spark gates the rewrite on application-side scan size
    (default 10GB — i.e. it fires exactly at the scale this engine
    targets); the thresholds are lowered here only to pin the shape at
    fixture scale."""
    from pyspark.sql import functions as F

    from spotify_etl_aws_spark.sources.readers import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        part = load_table(spark, sf_dir, "part").filter(
            F.col("p_brand") == "Brand#23"
        )
        j = (
            li.join(part, li.l_partkey == part.p_partkey)
            .groupBy("p_brand")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
        # the filter sits on the lineitem (fact) side of the exchange
        fact_side = plan[: plan.find("part.parquet")]
        assert "might_contain" in fact_side
        assert j.count() >= 1  # rewrite preserved results
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_dynamic_partition_pruning_on_partitioned_gold(spark, sf_dir, tmp_path):
    """DPP posture: a fact written PARTITION BY joined through a
    selectively-filtered dim scans only the matching partitions — the
    partition filter is a dynamicpruning subquery, not a full scan."""
    from pyspark.sql import functions as F

    from spotify_etl_aws_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem").limit(20000)
    orders = load_table(spark, sf_dir, "orders")
    fact_path = str(tmp_path / "fact_by_flag")
    (
        li.join(orders.select("o_orderkey", "o_orderpriority"),
                li.l_orderkey == F.col("o_orderkey"))
        .write.mode("overwrite")
        .partitionBy("o_orderpriority")
        .parquet(fact_path)
    )
    fact = spark.read.parquet(fact_path)
    # DPP's rewrite requires a SELECTIVE predicate on the dim side, on
    # a NON-join column (a join-key literal would be propagated as a
    # STATIC partition filter — also pruning, but no runtime subquery
    # to pin): the surviving priorities are only knowable at runtime
    dim = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_custkey")
        .filter(F.col("o_custkey") < 5)
    )
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 << 20))
        j = fact.join(F.broadcast(dim), "o_orderpriority").agg(
            F.sum("l_quantity").alias("qty")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan[:2000]
        assert j.count() == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
