"""Property-style checks (SURVEY.md §5 item 4) on seeded random data:
algebraic invariants that must hold for any input, checked against
independent Python references rather than the DuckDB oracle."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spotify_etl_aws_spark.functions.dates import normalize_partial_date
from spotify_etl_aws_spark.operators.asof import asof_join
from spotify_etl_aws_spark.operators.dedup import (
    exact_dedup_groups,
    minhash_signatures,
)

SEED = 20260813


@pytest.fixture(scope="module")
def rng():
    return random.Random(SEED)


def test_distinct_idempotent_and_union_commutes(spark, rng):
    """distinct(distinct(x)) == distinct(x) and
    distinct(a ∪ b) == distinct(distinct(a) ∪ distinct(b))."""
    rows = [(rng.randint(0, 20), rng.choice("abc")) for _ in range(500)]
    a = spark.createDataFrame(rows[:250], ["k", "v"])
    b = spark.createDataFrame(rows[250:], ["k", "v"])
    u = a.union(b)
    d1 = sorted(u.distinct().collect())
    assert sorted(u.distinct().distinct().collect()) == d1
    assert sorted(a.distinct().union(b.distinct()).distinct().collect()) == d1
    assert d1 == sorted(set(rows))


def test_exact_dedup_partitions_the_input(spark, rng):
    """Groups cover every row exactly once: sum(n_copies) == n_rows,
    one group per distinct normalized text, representative is min id."""
    texts = [rng.choice(["dup a", "dup b", "DUP A", f"unique {i}"]) for i in range(200)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    out = exact_dedup_groups(df).collect()
    assert sum(r.n_copies for r in out) == 200
    norm = {}
    for i, t in enumerate(texts):
        norm.setdefault(t.lower(), []).append(i)
    assert len(out) == len(norm)
    reps = {min(ids) for ids in norm.values()}
    assert {r.doc_id for r in out} == reps


def test_minhash_identical_docs_identical_signatures(spark, rng):
    """Exact duplicates (and case-variants) get identical signatures;
    the signature is a pure function of the shingle set."""
    base = " ".join(rng.choice("abcdefg") for _ in range(30))
    df = spark.createDataFrame(
        [(0, base), (1, base), (2, base.upper()), (3, "totally different words here")],
        ["doc_id", "text"],
    )
    sigs = {r.doc_id: tuple(r)[1:] for r in minhash_signatures(df).collect()}
    assert sigs[0] == sigs[1] == sigs[2]  # tokenization lowercases
    assert sigs[3] != sigs[0]


def test_asof_join_matches_reference(spark, rng):
    """asof result == argmax{right_ts <= left_ts} per key, computed by a
    brute-force Python reference; NULL right timestamps never match."""
    keys = [1, 2, 3]
    base = dt.datetime(2024, 1, 1)
    left_rows = [
        Row(k=k, lts=base + dt.timedelta(minutes=rng.randint(0, 300)), lv=i)
        for i, k in enumerate(rng.choices(keys, k=40))
    ]
    right_rows = [
        Row(
            k=k,
            rts=(None if rng.random() < 0.15
                 else base + dt.timedelta(minutes=rng.randint(0, 300))),
            rv=100 + i,
        )
        for i, k in enumerate(rng.choices(keys, k=25))
    ]
    left = spark.createDataFrame(left_rows)
    right = spark.createDataFrame(right_rows)
    got = {
        (r.k, r.lv): (r.rts, r.rv)
        for r in asof_join(left, right, on="k", left_ts="lts", right_ts="rts").collect()
    }
    assert len(got) == len(left_rows)
    for lr in left_rows:
        cands = [
            rr for rr in right_rows
            if rr.k == lr.k and rr.rts is not None and rr.rts <= lr.lts
        ]
        want = max(cands, key=lambda rr: (rr.rts, rr.rv), default=None)
        if want is None:
            assert got[(lr.k, lr.lv)] == (None, None)
        else:
            assert got[(lr.k, lr.lv)] == (want.rts, want.rv)


def test_asof_join_forward_matches_reference(spark, rng):
    """forward asof == argmin{right_ts >= left_ts} per key (earliest
    at-or-after, inclusive), against the brute-force reference; among
    tied right timestamps the residual-order-latest payload wins, as
    in the backward direction."""
    keys = [1, 2]
    base = dt.datetime(2024, 1, 1)
    left_rows = [
        Row(k=k, lts=base + dt.timedelta(minutes=rng.randint(0, 300)), lv=i)
        for i, k in enumerate(rng.choices(keys, k=40))
    ]
    right_rows = [
        Row(
            k=k,
            rts=(None if rng.random() < 0.15
                 else base + dt.timedelta(minutes=rng.randint(0, 300))),
            rv=100 + i,
        )
        for i, k in enumerate(rng.choices(keys, k=25))
    ]
    left = spark.createDataFrame(left_rows)
    right = spark.createDataFrame(right_rows)
    got = {
        (r.k, r.lv): (r.rts, r.rv)
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            tie_breakers=["rv"], direction="forward",
        ).collect()
    }
    assert len(got) == len(left_rows)
    for lr in left_rows:
        cands = [
            rr for rr in right_rows
            if rr.k == lr.k and rr.rts is not None and rr.rts >= lr.lts
        ]
        want = min(cands, key=lambda rr: (rr.rts, -rr.rv), default=None)
        if want is None:
            assert got[(lr.k, lr.lv)] == (None, None)
        else:
            assert got[(lr.k, lr.lv)] == (want.rts, want.rv)
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on="k", left_ts="lts", right_ts="rts",
                  direction="sideways")


def test_partial_date_normalization_total(spark, rng):
    """For every input: len-4 -> Jan 1, len-7 -> first of month,
    len-10 -> itself, anything else -> NULL (never raises)."""
    cases = (
        [f"{rng.randint(1900, 2100)}" for _ in range(10)]
        + [f"{rng.randint(1900, 2100)}-{rng.randint(1, 12):02d}" for _ in range(10)]
        + ["2024-02-29", "1999-12-31", "", "garbage", "2024-13-40", None]
    )
    def ref(d):  # lenient-cast twin: invalid padded strings -> None
        if d is None or len(d) not in (4, 7, 10):
            return None
        padded = {4: f"{d}-01-01", 7: f"{d}-01", 10: d}[len(d)]
        try:
            return dt.date.fromisoformat(padded)
        except ValueError:
            return None

    df = spark.createDataFrame([(c,) for c in cases], ["d"])
    out = df.select("d", normalize_partial_date("d").alias("n")).collect()
    for r in out:
        assert r.n == ref(r.d), r


def test_exact_dedup_canonical_mode(spark):
    """normalize='canonical': re-punctuated / re-wrapped copies
    collide; the default 'lower' mode keeps them distinct (the
    declared-query contract is untouched)."""
    import pytest

    from spotify_etl_aws_spark.functions.text import canonical_text
    from pyspark.sql import functions as F

    docs = [
        (0, "Hello,  World! This is   fine."),
        (1, "hello world this is fine"),
        (2, "HELLO WORLD.\nThis is fine?"),
        (3, "a genuinely different document"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    lower = exact_dedup_groups(df).collect()
    canon = exact_dedup_groups(df, normalize="canonical").collect()
    assert len(lower) == 4  # punctuation keeps them apart
    assert len(canon) == 2  # 0,1,2 fold together; rep = min id
    by_rep = {r.doc_id: r.n_copies for r in canon}
    assert by_rep == {0: 3, 3: 1}
    # the fold is idempotent (canonical of canonical is canonical)
    once = df.select(canonical_text("text").alias("t"))
    twice = once.select(canonical_text("t").alias("t"))
    assert [r.t for r in once.collect()] == [r.t for r in twice.collect()]
    with pytest.raises(ValueError, match="unknown normalize"):
        exact_dedup_groups(df, normalize="nfkc")
