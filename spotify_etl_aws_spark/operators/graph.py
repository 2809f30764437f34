"""Link-graph centrality: distributed PageRank (north-star, SURVEY.md
§2.11 URL-curation lane).

Web-corpus curation ranks hosts/URLs by link authority before anything
touches page text — CommonCrawl publishes harmonic/PageRank host ranks
for exactly this, and the open curation pipelines (CCNet-class) use
them as a crawl-seed and quality prior next to the per-domain caps in
``operators/urls.py``. The reference engine has no graph surface at
all (its SQL never leaves scan/join/agg); this lane is part of the
beyond-reference training-data inventory, the iterative-algorithm twin
of connected components (`operators/dedup.py:connected_components`).

Formulation (Page et al. 1999, the dangling-mass variant): with
damping d and n nodes,

    pr'(v) = (1 - d)/n + d * (Σ_{u→v} pr(u)/outdeg(u) + dangling/n)

where ``dangling`` is the rank mass sitting on nodes with no
out-edges, redistributed uniformly so Σ pr stays exactly 1 — without
it, a bipartite supplier→customer graph (every customer dangling)
leaks all mass by iteration 2.

Scale posture:
- per iteration: ONE (edges⋈outdeg)⋈ranks equi-join on src (the
  edges⋈outdeg half is loop-invariant — joined once and checkpointed
  before the loop; both sides keyed on node id, AQE-coalesced,
  skew-split eligible; a real deployment pre-buckets edges on src once
  via ``sources/sinks.py:save_bucketed`` and every iteration's probe
  reuses the layout) and ONE partial-agg shuffle on dst. Edge data
  never moves twice; ranks are node-cardinality narrow rows.
- driver state per iteration is TWO scalars (the dangling-mass sum and
  nothing else — n is computed once) — the same O(1)-driver-state
  contract as the k-means/classifier loops.
- ``localCheckpoint`` every iteration cuts lineage so the DAG stays
  flat across iterations (the connected-components convention); the
  dangling aggregate runs on the checkpointed frame, so each
  iteration's work is executed exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """(node, pr) for every node incident to ``edges`` (either side),
    after ``iterations`` synchronous power-iteration steps from the
    uniform start. Duplicate edges are collapsed (a link counts once,
    the host-graph convention); self-loops count as ordinary edges.
    NULL endpoints are dropped."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if not (0.0 < damping < 1.0):
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    e = (
        edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("pr", F.lit(0.0))
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # loop-invariant: every iteration probes the SAME (src, dst, deg)
    # frame, so join edges⋈outdeg once and checkpoint the result —
    # 10 iterations pay for 1 probe build instead of 10
    e_deg = e.join(outdeg, "src").localCheckpoint()
    ranks = nodes.withColumn("pr", F.lit(1.0 / n))
    for _ in range(iterations):
        ranks = ranks.localCheckpoint()
        dangling = (
            ranks.join(outdeg, ranks.node == outdeg.src, "left_anti")
            .agg(F.sum("pr"))
            .collect()[0][0]
            or 0.0
        )
        contribs = (
            e_deg.join(ranks, e_deg.src == ranks.node)
            .select("dst", (F.col("pr") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = nodes.join(
            contribs, nodes.node == contribs.dst, "left"
        ).select(
            "node",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping)
                * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.lit(dangling / n))
            ).alias("pr"),
        )
    return ranks
