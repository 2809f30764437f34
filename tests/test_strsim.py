"""Jaro-Winkler kernel (operators/strsim.py): textbook values, the
DuckDB bit-parity fuzz pin (the property the link_customer_jw oracle
rides), edge conventions (empty strings, boost threshold), and the
Arrow UDF column end-to-end."""

from __future__ import annotations

import random

import duckdb
import pytest

from spotify_etl_aws_spark.operators.strsim import (
    jaro_similarity,
    jaro_winkler,
    jaro_winkler_col,
)


def test_textbook_values():
    assert jaro_similarity("martha", "marhta") == pytest.approx(
        0.9444444444444445, abs=0
    )
    assert jaro_winkler("martha", "marhta") == pytest.approx(
        0.9611111111111111, abs=0
    )
    assert jaro_winkler("DUANE", "DWAYNE") == pytest.approx(0.84, abs=1e-15)


def test_edge_conventions():
    # DuckDB conventions: either side empty -> 0.0 (even both empty);
    # identical non-empty -> 1.0; boost only ABOVE 0.7
    assert jaro_winkler("", "") == 0.0
    assert jaro_winkler("abc", "") == 0.0
    assert jaro_winkler("abc", "abc") == 1.0
    # jaro('ed','ee') = 2/3 <= 0.7 -> no prefix boost despite prefix 1
    assert jaro_winkler("ed", "ee") == jaro_similarity("ed", "ee")


def test_bit_parity_with_duckdb_fuzz():
    con = duckdb.connect()
    rng = random.Random(19)
    cases = [("martha", "marhta"), ("", ""), ("a", "a"), ("abcd", "dcba")]
    for _ in range(3000):
        a = "".join(rng.choice("abcdef") for _ in range(rng.randrange(0, 12)))
        b = "".join(rng.choice("abcdef") for _ in range(rng.randrange(0, 12)))
        cases.append((a, b))
    for a, b in cases:
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert jaro_winkler(a, b) == want, (a, b)


def test_udf_column_end_to_end(spark):
    df = spark.createDataFrame(
        [("martha", "marhta"), ("DUANE", "DWAYNE"), (None, "x"), ("", "")],
        "a string, b string",
    )
    got = [
        r.jw for r in df.select(jaro_winkler_col("a", "b").alias("jw")).collect()
    ]
    assert got[0] == pytest.approx(0.9611111111111111, abs=0)
    assert got[1] == pytest.approx(0.84, abs=1e-15)
    assert got[2] is None  # NULL propagates
    assert got[3] == 0.0


def test_batch_kernel_bit_equal_to_scalar_fuzz():
    """The length-bucketed numpy batch kernel (the production column
    path) is BIT-EQUAL to the scalar parity-reference kernel — 20k
    random pairs incl. empties, equal strings, None, and long strings
    past the match-window/prefix corners."""
    from spotify_etl_aws_spark.operators.strsim import jaro_winkler_batch

    rng = random.Random(77)
    xs, ys = [], []
    for _ in range(20000):
        xs.append(
            "".join(rng.choice("abcdef") for _ in range(rng.randrange(0, 14)))
        )
        ys.append(
            "".join(rng.choice("abcdef") for _ in range(rng.randrange(0, 14)))
        )
    xs += ["", "martha", None, "abcdabcdabcdabcd", "aaaa"]
    ys += ["x", "marhta", "q", "abcdabcdabcdabcd"[::-1], "aaaa"]
    got = jaro_winkler_batch(xs, ys)
    for i, (a, b) in enumerate(zip(xs, ys)):
        if a is None or b is None:
            import math

            assert math.isnan(got[i])
        else:
            assert got[i] == jaro_winkler(a, b), (a, b)


def test_batch_kernel_non_latin_paths():
    """Mixed-script pairs exercise the uint32 codepoint matrices (and
    uint8-vs-uint32 mixed buckets): batch stays bit-equal to the
    scalar kernel on CODEPOINTS. DuckDB's jaro_winkler_similarity is
    BYTE-level (UTF-8) — pinned here by replaying the kernel on the
    byte sequences, where it matches DuckDB bit-for-bit; the two
    conventions agree exactly on ASCII (the declared lane's domain)."""
    from spotify_etl_aws_spark.operators.strsim import jaro_winkler_batch

    rng = random.Random(99)
    alpha = "abcdefαβγδεζ漢字かなまち"  # latin + greek + CJK + kana
    xs, ys = [], []
    for _ in range(4000):
        xs.append("".join(rng.choice(alpha) for _ in range(rng.randrange(0, 10))))
        ys.append("".join(rng.choice(alpha) for _ in range(rng.randrange(0, 10))))
    xs += ["漢字", "漢字かな", "abcδ"]
    ys += ["漢字", "かな漢字", "abcd"]
    got = jaro_winkler_batch(xs, ys)
    con = duckdb.connect()
    for i, (a, b) in enumerate(zip(xs, ys)):
        assert got[i] == jaro_winkler(a, b), (a, b)  # batch == scalar
        duck = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        byte_kernel = jaro_winkler(
            a.encode("utf-8").decode("latin-1"),
            b.encode("utf-8").decode("latin-1"),
        )
        assert byte_kernel == duck, (a, b)  # kernel-on-bytes == DuckDB
        if a.isascii() and b.isascii():
            assert got[i] == duck, (a, b)  # conventions coincide
