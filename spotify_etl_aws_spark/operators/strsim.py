"""Jaro / Jaro–Winkler string similarity (north-star, SURVEY.md §2.11a
adjacent — the comparator rung between exact equality and the
edit-distance join in the entity-resolution ladder): the Splink/
production-linkage DEFAULT name comparator (Winkler 1990, the Census
Bureau string comparator), shipped as a pure-Python kernel plus an
Arrow-batched pandas UDF column.

Semantics match DuckDB's ``jaro_winkler_similarity`` BIT-FOR-BIT
(fuzz-pinned over 20k random cases in tests) — with one precisely
pinned boundary: this kernel compares CODEPOINTS (the Winkler
definition over characters) while DuckDB compares UTF-8 BYTES, so the
two coincide exactly on ASCII (the declared lane's domain) and the
kernel replayed on the byte sequences reproduces DuckDB bit-for-bit
on any input (both facts fuzz-pinned over mixed Greek/CJK strings).
Jaro with match window
floor(max(|a|,|b|)/2) - 1, transposition count t/2; Winkler prefix
boost j + L*p*(1-j) with L = common prefix capped at 4, p = 0.1,
applied only when j > 0.7 (the classic boost threshold); either
string empty -> 0.0 (even when both are empty — the DuckDB
convention). Because the per-pair arithmetic is a FIXED sequential
formula (no order-dependent float accumulation), both engines land on
identical doubles, so a threshold comparison can sit in an oracle
without a rounding grid.

Scale shape: similarity runs on BLOCKED CANDIDATES only (fs_link's
contract — never on a cross product), inside an Arrow-batched pandas
UDF. The production column path is the LENGTH-BUCKETED numpy batch
kernel (round-10 verdict item 6): pairs in an Arrow batch group by
(|a|, |b|), and within a bucket the match-window scan runs as |a|
vectorized passes over the whole bucket at once — every arithmetic
step is the same IEEE float64 operation in the same order as the
scalar kernel, so the two are BIT-EQUAL (fuzz-pinned), and the scalar
kernel stays as the parity reference (and the DuckDB-bit-parity
anchor). No JVM Jaro–Winkler exists in Spark (production Splink
registers a Scala UDF; a deployment swaps rapidfuzz/jellyfish into
the same column seam for a C inner loop). The UDF appears only in
candidate scoring, never in candidate generation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F


def jaro_similarity(s1: str, s2: str) -> float:
    """Jaro similarity in [0, 1]. Either string empty -> 0.0."""
    l1, l2 = len(s1), len(s2)
    if not l1 or not l2:
        return 0.0
    if s1 == s2:
        return 1.0
    window = max(max(l1, l2) // 2 - 1, 0)
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i in range(l1):
        lo, hi = max(0, i - window), min(l2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s1[i] == s2[j]:
                m1[i] = m2[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0


def jaro_winkler(
    s1: str,
    s2: str,
    prefix_weight: float = 0.1,
    max_prefix: int = 4,
    boost_threshold: float = 0.7,
) -> float:
    """Jaro–Winkler similarity in [0, 1] (see module docstring for the
    exact DuckDB-matching conventions)."""
    j = jaro_similarity(s1, s2)
    if j <= boost_threshold:
        return j
    pfx = 0
    for a, b in zip(s1[:max_prefix], s2[:max_prefix]):
        if a != b:
            break
        pfx += 1
    return j + pfx * prefix_weight * (1.0 - j)


def _codes(strs: list[str], length: int) -> np.ndarray:
    """[n, length] codepoint matrix for same-length strings — uint8
    when every character is Latin-1 (the common blocked-comparator
    case: 4x less memory traffic in the compare loop), uint32
    otherwise. Equality compares are exact either way."""
    if length == 0:
        return np.zeros((len(strs), 0), dtype=np.uint8)
    joined = "".join(strs)
    try:
        buf = joined.encode("latin-1")
        return np.frombuffer(buf, dtype=np.uint8).reshape(len(strs), length)
    except UnicodeEncodeError:
        buf = joined.encode("utf-32-le")
        return np.frombuffer(buf, dtype=np.uint32).reshape(
            len(strs), length
        )


_JW_CHUNK = 1 << 15  # rows per chunk: keeps the O(l1) pass temps L3-hot


def _jw_bucket_chunk(
    a: np.ndarray,
    b: np.ndarray,
    l1: int,
    l2: int,
    prefix_weight: float,
    max_prefix: int,
    boost_threshold: float,
) -> np.ndarray:
    """Vectorized Jaro–Winkler for one code-matrix chunk of a single
    (|a|, |b|) bucket — the same greedy first-unmatched-in-window
    match, t/2 transpositions, and prefix boost as the scalar kernel,
    with every float64 step in the identical order (bit-equal by
    construction, fuzz-asserted). Per-row arithmetic is independent,
    so chunking cannot change any bit."""
    n = a.shape[0]
    window = max(max(l1, l2) // 2 - 1, 0)
    m1 = np.zeros((n, l1), dtype=bool)
    m2 = np.zeros((n, l2), dtype=bool)
    for i in range(l1):
        lo, hi = max(0, i - window), min(l2, i + window + 1)
        if lo >= hi:
            continue
        # first unmatched equal char in the window: argmax of the
        # candidate mask IS the first True; mask-scatter avoids both
        # nonzero() and a fancy-index row copy
        cand = (a[:, i : i + 1] == b[:, lo:hi]) & ~m2[:, lo:hi]
        has = cand.any(axis=1)
        j = cand.argmax(axis=1) + lo
        m1[:, i] = has
        m2[has, j[has]] = True
    matches = m1.sum(axis=1)
    maxm = int(matches.max()) if n else 0
    t = np.zeros(n, dtype=np.int64)
    if maxm:
        # gather each side's matched chars in order via cumsum ranks,
        # then count positionwise mismatches (the scalar walk's t)
        seq1 = np.zeros((n, maxm), dtype=a.dtype)
        seq2 = np.zeros((n, maxm), dtype=b.dtype)
        r1, c1 = np.nonzero(m1)
        seq1[r1, (np.cumsum(m1, axis=1, dtype=np.int32) - 1)[r1, c1]] = a[
            r1, c1
        ]
        r2, c2 = np.nonzero(m2)
        seq2[r2, (np.cumsum(m2, axis=1, dtype=np.int32) - 1)[r2, c2]] = b[
            r2, c2
        ]
        valid = np.arange(maxm)[None, :] < matches[:, None]
        t = ((seq1 != seq2) & valid).sum(axis=1) // 2
    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = (
            matches / l1 + matches / l2 + (matches - t) / matches
        ) / 3.0
    jaro = np.where(matches == 0, 0.0, jaro)
    p = min(l1, l2, max_prefix)
    if p:
        eq = a[:, :p] == b[:, :p]
        pfx = np.cumprod(eq, axis=1).sum(axis=1)
    else:
        pfx = np.zeros(n, dtype=np.int64)
    boost = jaro + pfx * prefix_weight * (1.0 - jaro)
    return np.where(jaro > boost_threshold, boost, jaro)


def _jw_bucket(
    s1: list[str],
    s2: list[str],
    l1: int,
    l2: int,
    prefix_weight: float,
    max_prefix: int,
    boost_threshold: float,
) -> np.ndarray:
    n = len(s1)
    if l1 == 0 or l2 == 0:
        return np.zeros(n, dtype=np.float64)
    a = _codes(s1, l1)
    b = _codes(s2, l2)
    if n <= _JW_CHUNK:
        return _jw_bucket_chunk(
            a, b, l1, l2, prefix_weight, max_prefix, boost_threshold
        )
    out = np.empty(n, dtype=np.float64)
    for st in range(0, n, _JW_CHUNK):
        en = min(st + _JW_CHUNK, n)
        out[st:en] = _jw_bucket_chunk(
            a[st:en], b[st:en], l1, l2,
            prefix_weight, max_prefix, boost_threshold,
        )
    return out


def jaro_winkler_batch(
    s1: list,
    s2: list,
    prefix_weight: float = 0.1,
    max_prefix: int = 4,
    boost_threshold: float = 0.7,
) -> np.ndarray:
    """Length-bucketed batch Jaro–Winkler over parallel string lists
    (None in either -> nan placeholder; the UDF maps it back to NULL).
    Bit-equal to the scalar ``jaro_winkler`` on every pair."""
    n = len(s1)
    out = np.full(n, np.nan, dtype=np.float64)
    if not n:
        return out
    # vectorized grouping: one argsort over the packed (|a|, |b|) key
    # instead of a per-row dict — the grouping itself was a measured
    # share of the batch wall at 2M pairs
    l1s = np.fromiter(
        (-1 if x is None else len(x) for x in s1), np.int64, count=n
    )
    l2s = np.fromiter(
        (-1 if y is None else len(y) for y in s2), np.int64, count=n
    )
    key = np.where((l1s < 0) | (l2s < 0), np.int64(-1), l1s << 32 | l2s)
    order = np.argsort(key, kind="stable")
    bounds = np.nonzero(np.diff(key[order]))[0] + 1
    for st, en in zip(
        np.concatenate(([0], bounds)), np.concatenate((bounds, [n]))
    ):
        k = key[order[st]]
        if k < 0:  # None rows stay nan
            continue
        idxs = order[st:en]
        out[idxs] = _jw_bucket(
            [s1[i] for i in idxs],
            [s2[i] for i in idxs],
            int(k >> 32),
            int(k & 0xFFFFFFFF),
            prefix_weight,
            max_prefix,
            boost_threshold,
        )
    return out


def jaro_winkler_col(a: Column | str, b: Column | str) -> Column:
    """Arrow-batched pandas-UDF column: jaro_winkler(a, b) as double,
    computed by the length-bucketed numpy batch kernel (bit-equal to
    the scalar reference). NULL in either input -> NULL out
    (comparator semantics: a missing field is neither agreement nor
    disagreement evidence — callers decide via coalesce)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _jw(x: pd.Series, y: pd.Series) -> pd.Series:
        xs = [None if v is None else str(v) for v in x]
        ys = [None if v is None else str(v) for v in y]
        vals = jaro_winkler_batch(xs, ys)
        null = [u is None or v is None for u, v in zip(xs, ys)]
        return pd.Series(
            [None if nn else float(v) for nn, v in zip(null, vals)],
            dtype="float64",
        )

    a_col = F.col(a) if isinstance(a, str) else a
    b_col = F.col(b) if isinstance(b, str) else b
    return _jw(a_col, b_col)
