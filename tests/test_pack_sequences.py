"""Concat-and-split sequence packing (operators/ordering.py:
pack_sequences): parity with a Python reference over the same epoch
order, full-sequence / doc-partition invariants, boundary splits, and
validation."""

from __future__ import annotations

import hashlib

import pytest

import pyspark.sql.functions as F

from spotify_etl_aws_spark.operators.ordering import pack_sequences


def _md5_order(seed: int, id_col: str):
    return F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )


def _ref(rows, seq_len, seed):
    """rows = [(doc_id, n_tokens)] -> {(doc_id, seq_id): (seq_start,
    doc_offset, n_in_seq)} over md5 epoch order."""
    key = lambda d: (hashlib.md5(f"{seed}:{d}".encode()).hexdigest(), d)
    cum, out = 0, {}
    for did, n in sorted(rows, key=lambda r: key(r[0])):
        for seq_id in range(cum // seq_len, (cum + n - 1) // seq_len + 1):
            lo = seq_id * seq_len
            start = max(cum, lo)
            end = min(cum + n, lo + seq_len)
            out[(did, seq_id)] = (start - lo, start - cum, end - start)
        cum += n
    return out


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_matches_reference_and_invariants(spark):
    import random

    rng = random.Random(7)
    rows = [(i, rng.randrange(1, 900)) for i in range(200)]
    seq_len = 512
    out = pack_sequences(
        _df(spark, rows), seq_len, seed=3, order_fn=_md5_order
    ).collect()
    got = {
        (r.doc_id, r.seq_id): (r.seq_start, r.doc_offset, r.n_in_seq)
        for r in out
    }
    assert got == _ref(rows, seq_len, 3)

    total = sum(n for _, n in rows)
    per_seq = {}
    per_doc = {}
    for (did, sid), (ss, do, k) in got.items():
        assert 1 <= k <= seq_len
        assert 0 <= ss < seq_len and ss + k <= seq_len
        per_seq[sid] = per_seq.get(sid, 0) + k
        per_doc[did] = per_doc.get(did, 0) + k
    # every sequence but the last is exactly full
    last = max(per_seq)
    assert set(per_seq) == set(range(last + 1))
    for sid, tok in per_seq.items():
        assert tok == (seq_len if sid < last else total - last * seq_len)
    # every document's chunks partition its tokens
    assert per_doc == dict(rows)


def test_long_doc_spans_many_sequences(spark):
    rows = [(1, 10), (2, 2500), (3, 5)]
    out = pack_sequences(
        _df(spark, rows), 1000, seed=1, order_fn=_md5_order
    ).collect()
    got = {
        (r.doc_id, r.seq_id): (r.seq_start, r.doc_offset, r.n_in_seq)
        for r in out
    }
    assert got == _ref(rows, 1000, 1)
    # doc 2 must appear in >= 3 sequences with contiguous offsets
    chunks = sorted(
        (r.seq_id, r.doc_offset, r.n_in_seq) for r in out if r.doc_id == 2
    )
    assert len(chunks) >= 3
    off = 0
    for _, do, k in chunks:
        assert do == off
        off += k
    assert off == 2500


def test_zero_token_docs_absent_and_validation(spark):
    rows = [(1, 0), (2, 7)]
    out = pack_sequences(
        _df(spark, rows), 4, seed=1, order_fn=_md5_order
    ).collect()
    assert {r.doc_id for r in out} == {2}
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(_df(spark, rows), 0, seed=1)
    bad = spark.createDataFrame([(1, None)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError, match="NULL"):
        pack_sequences(bad, 4, seed=1)
