"""Incremental IVF index (streaming/vector_index.py): two-wave
exactly-once indexing, committed-epoch visibility (crashed epochs
invisible), search parity with a numpy brute force over the probed
cells, and partition pruning on both epoch and cell."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from spotify_etl_aws_spark.sources.readers import load_table
from spotify_etl_aws_spark.streaming.vector_index import (
    incremental_vector_index,
    index_stats,
    search_incremental_index,
)

# a frozen toy quantizer: 4 axis-ish cells in the fixture's dim
DIM = 64


def _cents():
    cents = []
    for c in range(4):
        v = [0.0] * DIM
        v[c] = 1.0
        v[(c + 5) % DIM] = 0.5
        cents.append((c, v))
    return cents


@pytest.fixture()
def waves(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.first().embedding)
    assert dim == DIM, f"fixture dim changed to {dim}; update DIM"
    land = tmp_path / "landing"
    w1 = emb.filter(F.col("vec_id") % 2 == 0)
    w2 = emb.filter(F.col("vec_id") % 2 == 1)
    w1.coalesce(1).write.parquet(str(land / "wave1"))
    return land, w2, tmp_path


def _indexed_ids(spark, root):
    from spotify_etl_aws_spark.sources.sinks import read_committed_epochs

    return {
        r.vec_id
        for r in read_committed_epochs(spark, str(root), "ivf_index")
        .select("vec_id")
        .collect()
    }


def test_two_wave_exactly_once_and_search(spark, sf_dir, waves):
    land, w2, tmp = waves
    root, ckpt = tmp / "index_root", tmp / "ckpt"
    cents = _cents()
    incremental_vector_index(
        spark, str(land), str(root), cents, str(ckpt)
    )
    ids1 = _indexed_ids(spark, root)
    emb_rows = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    nonzero = {
        i for i, v in emb_rows.items() if np.linalg.norm(v) > 0
    }
    assert ids1 == {i for i in nonzero if i % 2 == 0}

    # wave 2 lands; a re-run indexes ONLY the new file
    w2.coalesce(1).write.parquet(str(land / "wave2"))
    incremental_vector_index(
        spark, str(land), str(root), cents, str(ckpt)
    )
    ids2 = _indexed_ids(spark, root)
    assert ids2 == nonzero

    # idle re-run: no new epoch, no duplicates
    incremental_vector_index(
        spark, str(land), str(root), cents, str(ckpt)
    )
    from spotify_etl_aws_spark.sources.sinks import read_committed_epochs

    total = read_committed_epochs(spark, str(root), "ivf_index").count()
    assert total == len(nonzero)

    # search parity: numpy brute force over the SAME probe cells
    q = emb_rows[sorted(nonzero)[0]].tolist()
    got = [
        (r.vec_id, r.cosine)
        for r in search_incremental_index(
            spark, str(root), cents, q, topk=5, nprobe=2
        ).collect()
    ]
    from spotify_etl_aws_spark.queries.vector import _probe_cells

    probe = set(_probe_cells(cents, q, 2))
    C = np.stack([np.asarray(v) for _, v in cents])
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    qv = np.asarray(q)
    want = []
    for i in sorted(nonzero):
        v = emb_rows[i]
        cell = int(np.argmax((v / np.linalg.norm(v)) @ Cn.T))
        if cell in probe:
            cos = float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv)))
            want.append((i, round(cos, 4) + 0.0))
    want.sort(key=lambda t: (-t[1], t[0]))
    assert got == want[:5]


def test_uncommitted_epoch_is_invisible(spark, waves):
    land, _, tmp = waves
    root, ckpt = tmp / "root2", tmp / "ckpt2"
    cents = _cents()
    incremental_vector_index(spark, str(land), str(root), cents, str(ckpt))
    before = _indexed_ids(spark, root)
    stats_before = index_stats(spark, str(root)).count()

    # a crashed batch: epoch dir present, NO commit marker
    committed = sorted(
        int(d.split("=")[1])
        for d in os.listdir(root / "ivf_index")
        if d.startswith("epoch=")
    )
    crashed = root / "ivf_index" / f"epoch={max(committed) + 1}"
    shutil.copytree(root / "ivf_index" / f"epoch={committed[0]}", crashed)

    assert _indexed_ids(spark, root) == before
    assert index_stats(spark, str(root)).count() == stats_before


def test_search_prunes_epoch_and_cell_partitions(spark, waves):
    land, _, tmp = waves
    root, ckpt = tmp / "root3", tmp / "ckpt3"
    cents = _cents()
    incremental_vector_index(spark, str(land), str(root), cents, str(ckpt))
    q = [1.0] + [0.0] * (DIM - 1)
    plan = (
        search_incremental_index(spark, str(root), cents, q, nprobe=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # both partition columns reach PartitionFilters, and the top-k is
    # a TakeOrderedAndProject, not a global sort
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters")[1][:300]
    assert "epoch" in plan.split("PartitionFilters")[1][:300]
    assert "TakeOrderedAndProject" in plan


def test_zero_query_rejected(spark, waves):
    land, _, tmp = waves
    with pytest.raises(ValueError, match="zero norm"):
        search_incremental_index(
            spark, str(tmp / "nowhere"), _cents(), [0.0] * DIM
        )


def test_index_compaction_preserves_search(spark, waves):
    """The maintenance loop: epoch-landed index files compact through
    compact_dataset (epoch+cell layout preserved) without changing a
    single search result — commit markers live outside the dataset, so
    compaction and visibility compose."""
    from spotify_etl_aws_spark.sources.sinks import compact_dataset

    land, w2, tmp = waves
    root, ckpt = tmp / "root4", tmp / "ckpt4"
    cents = _cents()
    incremental_vector_index(spark, str(land), str(root), cents, str(ckpt))
    w2.coalesce(4).write.parquet(str(land / "wave2"))
    incremental_vector_index(spark, str(land), str(root), cents, str(ckpt))

    q = [1.0] * DIM
    before = [
        (r.vec_id, r.cosine)
        for r in search_incremental_index(
            spark, str(root), cents, q, topk=8, nprobe=4
        ).collect()
    ]
    stats = compact_dataset(
        spark,
        str(root / "ivf_index"),
        target_file_mb=512,
        partition_cols=["epoch", "cell"],
    )
    assert stats["files_after"] <= stats["files_before"]
    after = [
        (r.vec_id, r.cosine)
        for r in search_incremental_index(
            spark, str(root), cents, q, topk=8, nprobe=4
        ).collect()
    ]
    assert after == before
