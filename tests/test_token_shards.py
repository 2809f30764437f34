"""Token-balanced shard assignment
(operators/ordering.py:assign_token_shards)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spotify_etl_aws_spark.operators.ordering import (
    assign_token_shards,
    order_key,
)

SEED = 3
SHARD = 1000


def _docs(spark, n=200, parts=4):
    import random

    rng = random.Random(5)
    rows = [(i, rng.randint(10, 400)) for i in range(n)]
    return spark.createDataFrame(
        rows, "doc_id long, n_tokens int"
    ).repartition(parts)


def test_shards_are_token_balanced(spark):
    docs = _docs(spark)
    out = assign_token_shards(docs, SHARD, SEED).collect()
    sums: dict[int, int] = {}
    max_doc = 0
    for r in out:
        sums[r["shard_id"]] = sums.get(r["shard_id"], 0) + r["n_tokens"]
        max_doc = max(max_doc, r["n_tokens"])
    shard_ids = sorted(sums)
    assert shard_ids == list(range(len(shard_ids)))  # contiguous from 0
    for sid in shard_ids[:-1]:
        assert SHARD - max_doc < sums[sid] < SHARD + max_doc, (
            sid, sums[sid]
        )
    total = sum(r["n_tokens"] for r in out)
    assert sum(sums.values()) == total
    assert len(out) == 200  # no rows lost or duplicated


def test_shards_respect_training_order(spark):
    """Every document in shard i precedes every document in shard i+1
    under the epoch order (xxhash key, id tie-break)."""
    docs = _docs(spark, n=150)
    out = assign_token_shards(docs, SHARD, SEED)
    keyed = out.select(
        "shard_id", order_key(SEED).alias("k"), "doc_id"
    ).collect()
    by_shard: dict[int, list] = {}
    for r in keyed:
        by_shard.setdefault(r["shard_id"], []).append((r["k"], r["doc_id"]))
    sids = sorted(by_shard)
    for a, b in zip(sids, sids[1:]):
        assert max(by_shard[a]) < min(by_shard[b])


def test_deterministic_across_runs(spark):
    docs = _docs(spark, n=120, parts=3)
    a = {r["doc_id"]: r["shard_id"]
         for r in assign_token_shards(docs, SHARD, SEED).collect()}
    b = {r["doc_id"]: r["shard_id"]
         for r in assign_token_shards(docs, SHARD, SEED).collect()}
    assert a == b


def test_oversized_doc_gets_own_boundary(spark):
    docs = spark.createDataFrame(
        [(1, 50), (2, 5000), (3, 60), (4, 70)],
        "doc_id long, n_tokens int",
    )
    out = assign_token_shards(docs, 100, SEED).collect()
    # total tokens 5180 -> the giant doc spans many boundary multiples;
    # every row still gets exactly one shard and totals are preserved
    assert len(out) == 4
    assert sum(r["n_tokens"] for r in out) == 5180


def test_null_tokens_rejected(spark):
    docs = spark.createDataFrame(
        [(1, 50), (2, None)], "doc_id long, n_tokens int"
    )
    with pytest.raises(ValueError, match="NULL"):
        assign_token_shards(docs, 100, SEED)


def test_validation(spark):
    docs = _docs(spark, n=5)
    with pytest.raises(ValueError, match="shard_tokens"):
        assign_token_shards(docs, 0, SEED)


def test_ladder_output_sharded_by_tokens(spark, tmp_path):
    """shard_tokens on build_training_corpus: output partitioned by
    (split, shard_id), every document present exactly once, and shard
    token sums balanced within one max-document of the target."""
    import random

    from spotify_etl_aws_spark.plans.curation import build_training_corpus

    rng = random.Random(9)
    vocab = [f"w{i}" for i in range(300)]
    docs = spark.createDataFrame(
        [(i, " ".join(rng.choices(vocab, k=rng.randint(20, 120))))
         for i in range(120)],
        "doc_id long, text string",
    )
    out = build_training_corpus(
        spark,
        docs,
        None,
        str(tmp_path / "corpus"),
        quality_cutoff=0.0,
        pii_scrub=False,
        repetition_filter=False,
        pack_budget=256,
        split_weights={"train": 1.0},
        shard_tokens=800,
    )
    rows = out.collect()
    assert len({r["doc_id"] for r in rows}) == len(rows) == 120
    sums: dict[int, int] = {}
    for r in rows:
        sums[r["shard_id"]] = sums.get(r["shard_id"], 0) + r["n_tokens"]
    max_doc = max(r["n_tokens"] for r in rows)
    for sid in sorted(sums)[:-1]:
        assert 800 - max_doc < sums[sid] < 800 + max_doc


def test_ladder_shards_balanced_per_split(spark, tmp_path):
    """With MULTIPLE splits, token balance holds within each split
    independently: every non-final (split, shard_id) group carries
    shard_tokens ± max_doc tokens of its OWN split (the per-split
    assignment — a global one only balances across splits combined)."""
    import random

    from spotify_etl_aws_spark.plans.curation import build_training_corpus

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(300)]
    docs = spark.createDataFrame(
        [(i, " ".join(rng.choices(vocab, k=rng.randint(20, 120))))
         for i in range(160)],
        "doc_id long, text string",
    )
    out = build_training_corpus(
        spark,
        docs,
        None,
        str(tmp_path / "corpus"),
        quality_cutoff=0.0,
        pii_scrub=False,
        repetition_filter=False,
        pack_budget=256,
        split_weights={"train": 0.8, "val": 0.2},
        shard_tokens=700,
    )
    rows = out.collect()
    assert len({r["doc_id"] for r in rows}) == len(rows) == 160
    by_split: dict[str, dict[int, int]] = {}
    for r in rows:
        by_split.setdefault(r["split"], {})
        by_split[r["split"]][r["shard_id"]] = (
            by_split[r["split"]].get(r["shard_id"], 0) + r["n_tokens"]
        )
    assert set(by_split) == {"train", "val"}
    max_doc = max(r["n_tokens"] for r in rows)
    for split, sums in by_split.items():
        # shard ids are contiguous from 0 within each split
        assert sorted(sums) == list(range(len(sums)))
        for sid in sorted(sums)[:-1]:
            assert 700 - max_doc < sums[sid] < 700 + max_doc, (split, sid)
