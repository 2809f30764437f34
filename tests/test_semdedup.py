"""SemDeDup semantic pruning (queries/lanes_vector_select.py:
dedup_semantic_prune): keep-rule semantics against an independent
recompute, cover-everything/one-keeper-per-cluster invariants, and
the non-vacuity of the prune at fixture scale."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_semdedup_keep_rule(spark, sf_dir):
    from spotify_etl_aws_spark.queries.selection import dedup_semantic_prune
    from spotify_etl_aws_spark.queries.vector import (
        _embeddings,
        _learned_centroids,
    )
    from spotify_etl_aws_spark.operators.vector_ops import (
        assign_cells_arrow,
    )

    rows = dedup_semantic_prune(spark, sf_dir).collect()
    n_vecs = _embeddings(spark, sf_dir).count()
    assert len(rows) == n_vecs  # every vector gets a verdict

    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_rep, []).append(r)
    # exactly one keeper per cluster
    for rep, members in by_cluster.items():
        keepers = [r for r in members if r.keep]
        assert len(keepers) == 1, (rep, members)
        # the keeper is the (cos, vec_id)-minimum — farthest from the
        # centroid, SemDeDup's keep rule
        want = min(
            members,
            key=lambda r: (
                r.centroid_cosine if r.centroid_cosine is not None else 2.0,
                r.vec_id,
            ),
        )
        assert keepers[0].vec_id == want.vec_id
    # the prune is non-vacuous: multi-member semantic clusters exist
    # and their non-keepers are dropped
    multi = [m for m in by_cluster.values() if len(m) > 1]
    assert multi
    dropped = sum(len(m) - 1 for m in multi)
    assert dropped > 0

    # centroid_cosine matches an independent kernel recompute (4dp)
    cents = _learned_centroids(spark, sf_dir)
    got_cos = {
        r.vec_id: r.centroid_cosine for r in rows
        if r.centroid_cosine is not None
    }
    want_cos = {
        r.vec_id: round(r.cos_c, 4)
        for r in assign_cells_arrow(
            _embeddings(spark, sf_dir), cents, with_cosine=True
        ).collect()
    }
    assert got_cos == {k: round(v, 4) for k, v in want_cos.items()}


def test_assign_with_cosine_matches_plain(spark, sf_dir):
    """with_cosine=True must not perturb the assignment itself."""
    from spotify_etl_aws_spark.operators.vector_ops import (
        assign_cells_arrow,
    )
    from spotify_etl_aws_spark.queries.vector import (
        _embeddings,
        _learned_centroids,
    )

    emb = _embeddings(spark, sf_dir)
    cents = _learned_centroids(spark, sf_dir)
    plain = {
        r.vec_id: r.cell for r in assign_cells_arrow(emb, cents).collect()
    }
    cos = {
        r.vec_id: r.cell
        for r in assign_cells_arrow(emb, cents, with_cosine=True).collect()
    }
    assert plain == cos


def test_ivf_recall_consistent_with_search_lane(spark, sf_dir):
    from spotify_etl_aws_spark.queries.selection import vector_ivf_recall
    from spotify_etl_aws_spark.queries.vector import (
        TOPK,
        vector_cosine_topk,
    )

    row = vector_ivf_recall(spark, sf_dir).collect()[0]
    assert row.k == TOPK
    assert 0 <= row.n_hits <= row.k
    assert row.recall == row.n_hits / row.k
    r = vector_cosine_topk(spark, sf_dir).collect()
    ex = {x.vec_id for x in r if x.method == "exact"}
    iv = {x.vec_id for x in r if x.method == "ivf_probe"}
    assert row.n_hits == len(ex & iv)
