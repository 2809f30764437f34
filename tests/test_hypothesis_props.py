"""Hypothesis-driven property tests: adversarial inputs against
independent pure-Python references. Each example ships ONE batched
DataFrame through Spark (a Spark job per hypothesis example is the
cost ceiling, so examples are few and batches are wide)."""

from __future__ import annotations

import math
import re

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spotify_etl_aws_spark.functions.text import tokens, word_shingles
from spotify_etl_aws_spark.functions.vectors import as_double, cosine, dot, l2_norm
from spotify_etl_aws_spark.queries.text import _BPE_RE

from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# printable-ish text incl. unicode whitespace-adjacent traps, empty and
# punctuation-heavy strings
_texts = st.lists(
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_categories=("Cs", "Cc")
        ),
        max_size=60,
    ),
    min_size=1,
    max_size=40,
)


@settings(**_SETTINGS)
@given(_texts)
def test_bpe_token_count_matches_python_re(spark, texts):
    """regexp_extract_all over the BPE pattern: token COUNTS match
    Python's re.findall compiled with re.ASCII, which gives \\s the
    exact Java semantics (ASCII-only) — so the property holds for the
    FULL unicode input range, not just ASCII. Lowercasing happens in
    Python before the data reaches either side, isolating the regex
    contract from any str.lower()/toLowerCase() unicode-version skew
    (the production lower() path is covered by the sf0.01 oracle)."""
    lowered = [t.lower() for t in texts]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(lowered)], "i long, t string"
    )
    got = {
        r.i: r.n
        for r in df.select(
            "i",
            F.size(
                F.regexp_extract_all(F.col("t"), F.lit(_BPE_RE), 0)
            ).alias("n"),
        ).collect()
    }
    pat = re.compile(_BPE_RE, re.ASCII)
    for i, t in enumerate(lowered):
        assert got[i] == len(pat.findall(t)), repr(t)


@settings(**_SETTINGS)
@given(_texts)
def test_whitespace_tokens_match_python_split(spark, texts):
    """The whitespace tokenizer agrees with a Python re.split reference
    (JVM \\s vs Python \\s on ASCII whitespace; inputs are drawn from
    the full unicode range, asserting only on rows where both sides
    tokenize — any divergence in count or content fails."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {r.i: list(r.tok) for r in df.select("i", tokens("t").alias("tok")).collect()}
    for i, t in enumerate(texts):
        want = re.split(r"\s+", t.lower())
        if got[i] != want:
            # JVM and Python disagree on which codepoints are \s for a
            # handful of unicode spaces; the engine contract is JVM
            # semantics (mirrored by DuckDB), so only flag ASCII cases.
            if all(ord(c) < 128 for c in t):
                raise AssertionError(f"ASCII divergence on {t!r}: {got[i]} != {want}")


@settings(**_SETTINGS)
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-1e3,
                max_value=1e3,
                allow_nan=False,
                allow_infinity=False,
                width=32,
            ),
            min_size=4,
            max_size=4,
        ),
        min_size=2,
        max_size=30,
    )
)
def test_vector_hof_matches_numpy(spark, vecs):
    """dot / l2_norm / cosine (JVM higher-order functions) agree with
    numpy float64 references to 1e-9 relative on arbitrary finite
    vectors; zero vectors yield NaN cosine on both sides."""
    q = vecs[0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "i long, v array<float>"
    )
    qlit = F.array(*[F.lit(float(x)) for x in np.asarray(q, dtype=np.float32).astype(float)])
    rows = df.select(
        "i",
        dot(as_double("v"), qlit).alias("d"),
        l2_norm(as_double("v")).alias("n"),
        cosine(as_double("v"), qlit).alias("c"),
    ).collect()
    qd = np.asarray(q, dtype=np.float32).astype(np.float64)
    for r in rows:
        vd = np.asarray(vecs[r.i], dtype=np.float32).astype(np.float64)
        d_ref = float(vd @ qd)
        n_ref = float(np.sqrt(vd @ vd))
        assert math.isclose(r.d, d_ref, rel_tol=1e-9, abs_tol=1e-9)
        assert math.isclose(r.n, n_ref, rel_tol=1e-9, abs_tol=1e-9)
        denom = n_ref * float(np.sqrt(qd @ qd))
        if denom == 0.0:
            assert r.c is None or math.isnan(r.c)
        else:
            assert math.isclose(r.c, d_ref / denom, rel_tol=1e-9, abs_tol=1e-9)


@settings(**_SETTINGS)
@given(_texts, st.integers(min_value=2, max_value=4))
def test_word_shingles_match_python_reference(spark, texts, n):
    """word_shingles == the distinct n-grams of the whitespace tokens,
    in first-appearance order semantics (set compare; sub-n docs give
    the empty set). ASCII-only assertion, same \\s caveat as above."""
    ascii_texts = [t for t in texts if all(ord(c) < 128 for c in t)]
    if not ascii_texts:
        return
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ascii_texts)], "i long, t string"
    )
    got = {
        r.i: set(r.sh)
        for r in df.select(
            "i", word_shingles(tokens("t"), n).alias("sh")
        ).collect()
    }
    for i, t in enumerate(ascii_texts):
        w = re.split(r"\s+", t.lower())
        want = {" ".join(w[j : j + n]) for j in range(len(w) - n + 1)}
        assert got[i] == want, repr(t)
