"""PageRank (`operators/graph.py`): exact parity with a numpy
reference implementation of the same dangling-mass formulation, mass
conservation, dangling-graph behavior, and the no-cartesian plan pin.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest

import pyspark.sql.functions as F

from spotify_etl_aws_spark.operators.graph import bfs_levels, pagerank


def ref_pagerank(edges, iterations=10, d=0.85, teleport=None, weights=None):
    """weights: {(u, v): w} — rank flows ∝ w/Σ_out w; None = uniform
    1/outdeg over the deduplicated edge set."""
    edges = set(edges)
    nodes = sorted({u for e in edges for u in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    if weights is None:
        outdeg = Counter(u for u, _ in edges)
    else:
        outdeg = Counter()
        for (u, _), w in weights.items():
            outdeg[u] += w
    if teleport is None:
        t = np.full(n, 1.0 / n)
        pr = np.full(n, 1.0 / n)
    else:
        t = np.zeros(n)
        for v, w in teleport.items():
            if v in idx and w > 0:
                t[idx[v]] = w
        t = t / t.sum()
        pr = t.copy()
    for _ in range(iterations):
        dang = sum(pr[idx[v]] for v in nodes if outdeg.get(v, 0) == 0)
        contrib = np.zeros(n)
        for u, v in edges:
            share = 1.0 if weights is None else weights[(u, v)]
            contrib[idx[v]] += pr[idx[u]] * share / outdeg[u]
        pr = (1 - d) * t + d * (contrib + dang * t)
    return {v: pr[idx[v]] for v in nodes}


EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"),
    ("e", "d"), ("e", "c"), ("f", "f"), ("c", "g"),  # g dangling, f self-loop
]


def test_matches_numpy_reference(spark):
    got = {
        r.node: r.pr
        for r in pagerank(
            spark.createDataFrame(EDGES, "src string, dst string"),
            iterations=7,
        ).collect()
    }
    want = ref_pagerank(EDGES, iterations=7)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, (v, got[v], want[v])


def test_mass_conserved(spark):
    ranks = pagerank(
        spark.createDataFrame(EDGES, "src string, dst string"), iterations=5
    )
    total = ranks.agg(F.sum("pr")).collect()[0][0]
    assert abs(total - 1.0) < 1e-9


def test_duplicate_edges_collapse(spark):
    """A link counts once: duplicating every edge changes nothing."""
    dup = EDGES + EDGES
    got = {
        r.node: r.pr
        for r in pagerank(
            spark.createDataFrame(dup, "src string, dst string"), iterations=4
        ).collect()
    }
    want = ref_pagerank(EDGES, iterations=4)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12


def test_all_dangling_star(spark):
    """Star graph hub->leaves: leaves are dangling; mass must cycle
    back through redistribution, not leak."""
    edges = [("hub", f"leaf{i}") for i in range(5)]
    df = spark.createDataFrame(edges, "src string, dst string")
    ranks = {r.node: r.pr for r in pagerank(df, iterations=6).collect()}
    want = ref_pagerank(edges, iterations=6)
    for v in want:
        assert abs(ranks[v] - want[v]) < 1e-12
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    # leaves tie exactly by symmetry
    leaf_vals = {round(ranks[f"leaf{i}"], 15) for i in range(5)}
    assert len(leaf_vals) == 1


def test_no_cartesian_in_iteration_plan(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    ranks = pagerank(df, iterations=2)
    plan = ranks._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bad_params_raise(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    with pytest.raises(ValueError):
        pagerank(df, iterations=0)
    with pytest.raises(ValueError):
        pagerank(df, damping=1.0)
    with pytest.raises(ValueError):
        pagerank(df, tol=0.0)
    with pytest.raises(ValueError):
        pagerank(
            df,
            teleport=spark.createDataFrame(
                [("not-in-graph", 1.0)], "node string, weight double"
            ),
        )


def test_tolerance_early_exit_matches_fixpoint(spark):
    """tol stops the iteration at the L∞ fixpoint test: the converged
    result must sit within tol of a deep fixed-iteration run, and the
    tolerance path must agree with the no-tol path run to the same
    depth (same per-iteration arithmetic)."""
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {
        r.node: r.pr
        for r in pagerank(df, iterations=200, tol=1e-10).collect()
    }
    deep = ref_pagerank(EDGES, iterations=200)
    for v in deep:
        assert abs(got[v] - deep[v]) < 1e-8
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_weighted_edges_match_reference(spark):
    """weight_col: rank flows ∝ w/Σ_out w; duplicate (src, dst) rows
    sum their weights; non-positive weights drop. Exact parity with
    the weighted numpy reference; heavier targets outrank lighter
    ones from the same source."""
    rows = [
        ("a", "b", 3.0), ("a", "c", 1.0),
        ("b", "c", 2.0), ("c", "a", 1.0),
        ("a", "b", 2.0),          # duplicate pair: weights sum to 5
        ("a", "d", 0.0),          # non-positive: dropped
        ("e", "a", 1.5),
    ]
    df = spark.createDataFrame(rows, "src string, dst string, w double")
    got = {
        r.node: r.pr
        for r in pagerank(df, iterations=6, weight_col="w").collect()
    }
    weights = {("a", "b"): 5.0, ("a", "c"): 1.0, ("b", "c"): 2.0,
               ("c", "a"): 1.0, ("e", "a"): 1.5}
    want = ref_pagerank(
        list(weights), iterations=6, weights=weights
    )
    assert set(got) == set(want)  # 'd' never enters the graph
    assert "d" not in got
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got["b"] > got["c"] * 0  # sanity anchor; real check below
    # from 'a', b receives 5/6 of the flow and c 1/6
    uniform = ref_pagerank(list(weights), iterations=6)
    assert got["b"] > uniform["b"]


def test_personalized_teleport_matches_reference(spark):
    """PPR: restart (and dangling) mass flows to the seed set; exact
    parity with the numpy reference; seeds outrank their uniform
    scores while mass stays 1; weights of absent nodes are ignored."""
    df = spark.createDataFrame(EDGES, "src string, dst string")
    seeds = {"a": 3.0, "e": 1.0}
    tele = spark.createDataFrame(
        list(seeds.items()) + [("ghost-node", 5.0)],
        "node string, weight double",
    )
    got = {
        r.node: r.pr
        for r in pagerank(df, iterations=7, teleport=tele).collect()
    }
    want = ref_pagerank(EDGES, iterations=7, teleport=seeds)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9
    uniform = ref_pagerank(EDGES, iterations=7)
    assert got["a"] > uniform["a"]  # seed bias is visible


def ref_bfs(edges, seeds, max_hops=10, directed=True):
    adj: dict = {}
    for u, v in set(edges):
        adj.setdefault(u, set()).add(v)
        if not directed:
            adj.setdefault(v, set()).add(u)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, max_hops + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    nxt.add(v)
        for v in nxt:
            dist[v] = h
        if not nxt:
            break
        frontier = nxt
    return dist


BFS_EDGES = [
    ("a", "b"), ("b", "c"), ("c", "d"), ("d", "b"),  # cycle b-c-d
    ("a", "e"), ("x", "y"),                          # y unreachable from a
]


def test_bfs_matches_reference_directed_and_undirected(spark):
    df = spark.createDataFrame(BFS_EDGES, "src string, dst string")
    seeds = spark.createDataFrame([("a",)], "node string")
    for directed in (True, False):
        got = {
            r.node: r.dist
            for r in bfs_levels(df, seeds, directed=directed).collect()
        }
        want = ref_bfs(BFS_EDGES, ["a"], directed=directed)
        assert got == want, directed
    # directed: x/y never reached; undirected: still a separate component
    assert "y" not in ref_bfs(BFS_EDGES, ["a"], directed=True)


def test_bfs_max_hops_and_seed_not_in_graph(spark):
    df = spark.createDataFrame(BFS_EDGES, "src string, dst string")
    seeds = spark.createDataFrame(
        [("a",), ("ghost",)], "node string"
    )
    got = {
        r.node: r.dist for r in bfs_levels(df, seeds, max_hops=1).collect()
    }
    # one hop only; detached seed still reported at dist 0
    assert got == {"a": 0, "ghost": 0, "b": 1, "e": 1}
    with pytest.raises(ValueError, match="max_hops"):
        bfs_levels(df, seeds, max_hops=-1)


def test_bfs_multi_seed_takes_min_distance(spark):
    df = spark.createDataFrame(BFS_EDGES, "src string, dst string")
    seeds = spark.createDataFrame([("a",), ("c",)], "node string")
    got = {r.node: r.dist for r in bfs_levels(df, seeds).collect()}
    want = ref_bfs(BFS_EDGES, ["a", "c"])
    assert got == want
    assert got["d"] == 1  # via c, not a->b->c->d


# ---------------------------------------------------------------- #
# triangle counting                                                 #
# ---------------------------------------------------------------- #

from itertools import combinations

from spotify_etl_aws_spark.operators.graph import triangle_count


def _tri(spark, edges):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    return triangle_count(df).collect()[0]


def test_triangles_k4(spark):
    """K4 has C(4,3)=4 triangles, 6 edges, and (under any orientation
    of a 4-clique) exactly 4 wedges at the apexes — one per triangle,
    so wedges == triangles here."""
    k4 = [(a, b) for a, b in combinations([1, 2, 3, 4], 2)]
    r = _tri(spark, k4)
    assert (r.n_vertices, r.n_edges, r.n_triangles) == (4, 6, 4)


def test_triangles_path_and_star_have_none(spark):
    r = _tri(spark, [(1, 2), (2, 3), (3, 4)])
    assert r.n_triangles == 0
    # star: the hub has degree n but ZERO out-degree under the
    # orientation, so wedge count is 0 — the skew-kill property itself
    star = [(0, i) for i in range(1, 30)]
    r = _tri(spark, star)
    assert (r.n_wedges, r.n_triangles) == (0, 0)


def test_triangles_dedup_and_direction_insensitive(spark):
    """Duplicate, reversed, and self-loop inputs must not change the
    count: one triangle however the edges arrive."""
    messy = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (1, 1), (2, 3)]
    r = _tri(spark, messy)
    assert (r.n_edges, r.n_triangles) == (3, 1)


def test_triangles_match_brute_force(spark):
    """Random-ish deterministic graph vs a Python brute force."""
    edges = [((i * 7) % 23, (i * 11 + 3) % 23) for i in range(60)]
    adj = {}
    canon = {
        (min(u, v), max(u, v)) for u, v in edges if u != v
    }
    for u, v in canon:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    brute = sum(
        1
        for a, b, c in combinations(sorted(adj), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    r = _tri(spark, edges)
    assert r.n_triangles == brute
    assert r.n_edges == len(canon)
