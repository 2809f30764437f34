"""Document chunking (operators/chunking.py): window geometry against
hand-computed layouts, full-coverage/reconstruction invariants, the
pre-tokenized path, and the map-side-only plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spotify_etl_aws_spark.operators.chunking import chunk_documents


def _mk(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_hand_computed_windows(spark):
    # 10 tokens, chunk 4, overlap 1 -> stride 3 -> starts 0,3,6
    text = " ".join(f"t{i}" for i in range(10))
    out = chunk_documents(_mk(spark, [text]), 4, 1).collect()
    got = {r.chunk_idx: r.chunk_tokens_arr for r in out}
    assert len(got) == 3 and out[0].n_chunks == 3
    assert got[0] == ["t0", "t1", "t2", "t3"]
    assert got[1] == ["t3", "t4", "t5", "t6"]
    assert got[2] == ["t6", "t7", "t8", "t9"]
    assert all(r.n_tokens == len(r.chunk_tokens_arr) for r in out)
    assert out[0].chunk_text == "t0 t1 t2 t3"


def test_short_empty_and_exact_docs(spark):
    out = chunk_documents(
        _mk(spark, ["a b", "", "a b c d"]), 4, 1
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # shorter than one window -> exactly one chunk, itself
    assert len(by_doc[0]) == 1 and by_doc[0][0].chunk_tokens_arr == ["a", "b"]
    # empty doc -> one empty chunk, not zero rows (kept for accounting)
    assert len(by_doc[1]) == 1 and by_doc[1][0].n_tokens == 0
    # exactly one window -> one chunk, no spurious overlap tail
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_tokens == 4


def test_every_token_covered_and_order(spark):
    for n, chunk, ov in [(1, 5, 0), (23, 5, 0), (23, 5, 2), (24, 8, 3), (7, 7, 6)]:
        text = " ".join(f"t{i}" for i in range(n))
        rows = sorted(
            chunk_documents(_mk(spark, [text]), chunk, ov).collect(),
            key=lambda r: r.chunk_idx,
        )
        stride = chunk - ov
        seen = set()
        for r in rows:
            assert r.chunk_tokens_arr == [
                f"t{i}"
                for i in range(r.chunk_idx * stride, min(r.chunk_idx * stride + chunk, n))
            ]
            seen.update(r.chunk_tokens_arr)
        assert seen == {f"t{i}" for i in range(n)}, (n, chunk, ov)
        # non-final chunks are full-size
        for r in rows[:-1]:
            assert r.n_tokens == chunk


def test_pretokenized_column_path(spark):
    df = spark.createDataFrame(
        [(1, ["lo", "w", "er", "lo", "w"])], "doc_id long, bpe array<string>"
    )
    out = chunk_documents(
        df, 2, 0, text_col="ignored", tokens_col="bpe"
    ).collect()
    assert [r.chunk_tokens_arr for r in sorted(out, key=lambda r: r.chunk_idx)] == [
        ["lo", "w"], ["er", "lo"], ["w"],
    ]


def test_validation_and_plan(spark):
    df = _mk(spark, ["a b c"])
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(df, 0)
    with pytest.raises(ValueError, match="overlap_tokens"):
        chunk_documents(df, 4, 4)
    # map-side only: explode, no Exchange
    plan = chunk_documents(df, 4, 1)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
