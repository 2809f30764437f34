"""Scale probe for the graph lane: PageRank iterations×time at
amplified edge counts (the CC/sketch lanes' measured-posture row, for
`operators/graph.py`).

The base graph is the supplier→customer fulfillment graph from
$SPARK_GRAFT_SF_DIR (the `graph_pagerank` query's edge set, ~600k
distinct edges at sf0.1). Amplification replicates it R times with
replica-prefixed node ids — R disconnected copies, which gives a free
exact correctness check: by symmetry each replica holds 1/R of the
total rank mass, so every node's amplified pr must equal its 1× pr
divided by R (checked to 1e-12 relative), and Σpr must stay 1.

Measures, per amplification: wall seconds for a 10-iteration run and
seconds/iteration (the loop-invariant probe build is amortized across
iterations — the round-7 hoist). Results go to BASELINE.md.

Run: python experiments/graph_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from experiments.common import SF_DIR

ITERATIONS = 10
REPS = [1, 4, 10]


def base_edges(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("dst"),
    ).distinct()


def amplified(spark, edges, reps: int):
    """reps disconnected replicas via node-id prefixing — no files,
    the replication happens in the scan-side projection."""
    if reps == 1:
        return edges
    r = spark.range(reps).withColumnRenamed("id", "rep")
    return edges.crossJoin(r).select(
        F.concat(F.lit("r"), "rep", F.lit("_"), "src").alias("src"),
        F.concat(F.lit("r"), "rep", F.lit("_"), "dst").alias("dst"),
    )


def main() -> None:
    from pyspark.sql import SparkSession

    from spotify_etl_aws_spark.operators.graph import pagerank

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    e1 = base_edges(spark).localCheckpoint()
    n_edges = e1.count()
    ref = None
    failed = False
    for reps in REPS:
        e = amplified(spark, e1, reps).localCheckpoint()  # exclude build
        t0 = time.perf_counter()
        ranks = pagerank(e, iterations=ITERATIONS).localCheckpoint()
        n_nodes = ranks.count()
        wall = time.perf_counter() - t0
        total = ranks.agg(F.sum("pr")).collect()[0][0]
        if reps == 1:
            ref = {r.node: r.pr for r in ranks.collect()}
            sym_err = 0.0
        else:
            got = {
                r.node[len(f"r0_"):]: r.pr
                for r in ranks.filter(F.col("node").startswith("r0_")).collect()
            }
            sym_err = max(
                abs(got[v] * reps - ref[v]) / ref[v] for v in ref
            )
        print(
            f"reps={reps:>2} edges={n_edges * reps:>8} nodes={n_nodes:>7} "
            f"iters={ITERATIONS}: {wall:6.2f}s  {wall / ITERATIONS:5.2f}s/iter  "
            f"|sum(pr)-1|={abs(total - 1.0):.2e}  sym_err={sym_err:.2e}",
            flush=True,
        )
        if abs(total - 1.0) > 1e-9 or sym_err > 1e-9:
            failed = True
    if failed:
        print("CHECK FAILED: mass or replica symmetry violated", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
