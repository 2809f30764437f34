"""IVF recall@k-vs-nprobe curve (round 13, verdict item 4): the
monotone-recall property — the candidate set only grows with nprobe,
so recall is non-decreasing and hits 1.0 at nprobe = n_cells — plus
the single-point lane's consistency with the curve.
"""

from __future__ import annotations

from spotify_etl_aws_spark.queries.lanes_vector_select import (
    NPROBE_TIERS,
    vector_ivf_recall_curve,
)
from spotify_etl_aws_spark.queries.vector import NPROBE, NUM_CENTROIDS, TOPK

SF_DIR = "/root/testdata/sf0.001"


def test_recall_curve_monotone_and_anchored(spark):
    rows = {
        r["nprobe"]: r
        for r in vector_ivf_recall_curve(spark, SF_DIR).collect()
    }
    assert sorted(rows) == sorted(NPROBE_TIERS)
    rc = [rows[n]["recall"] for n in sorted(rows)]
    assert all(a <= b for a, b in zip(rc, rc[1:])), rc  # monotone
    assert max(NPROBE_TIERS) == NUM_CENTROIDS
    assert rows[NUM_CENTROIDS]["recall"] == 1.0  # all cells = exact
    for r in rows.values():
        assert r["k"] == TOPK
        assert 0 <= r["n_hits"] <= TOPK
        assert r["recall"] == r["n_hits"] / TOPK


def test_curve_agrees_with_single_point_lane(spark):
    """vector_ivf_recall (the round-12 single-point lane) must sit ON
    the curve at its fixed NPROBE."""
    from spotify_etl_aws_spark.queries.lanes_vector_select import (
        vector_ivf_recall,
    )

    point = vector_ivf_recall(spark, SF_DIR).collect()[0]
    curve = {
        r["nprobe"]: r
        for r in vector_ivf_recall_curve(spark, SF_DIR).collect()
    }
    assert NPROBE in curve
    assert curve[NPROBE]["n_hits"] == point["n_hits"]
    assert curve[NPROBE]["recall"] == point["recall"]
