"""Segment-partition edit-distance join (operators/editdist.py):
brute-force parity against a pure-Python Levenshtein DP over random
strings, planted single-edit families, Spark-levenshtein parity with
the reference DP, the short-string loud guard, no-duplicate pairs, and
the equi-join (no theta/cartesian) plan pin."""

from __future__ import annotations

import random

import pytest

import pyspark.sql.functions as F

from spotify_etl_aws_spark.operators.editdist import editdistance_join


def ref_lev(a: str, b: str) -> int:
    """Textbook unit-cost DP — the independent reference both engines'
    builtins must agree with."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _brute(rows, d):
    out = set()
    for i, (ia, sa) in enumerate(rows):
        for ib, sb in rows[i + 1:]:
            dist = ref_lev(sa, sb)
            if dist <= d:
                lo, hi = sorted((ia, ib))
                out.add((lo, hi, dist))
    return out


def _run(spark, rows, d, **kw):
    df = spark.createDataFrame(rows, "id long, s string")
    got = editdistance_join(df, "id", "s", d, **kw).collect()
    return {(r.id_a, r.id_b, r.dist) for r in got}


@pytest.mark.parametrize("d", [1, 2, 3])
@pytest.mark.parametrize("collapse", [False, True])
def test_matches_brute_force_random_strings(spark, d, collapse):
    rng = random.Random(41 + d)
    alpha = "abcde"  # small alphabet -> dense near matches AND exact
    # duplicates at the short lengths (covers collapse_exact's
    # within-group expansion)
    rows = [
        (i, "".join(rng.choice(alpha) for _ in range(rng.randrange(d + 1, 14))))
        for i in range(120)
    ]
    got = _run(spark, rows, d, collapse_exact=collapse)
    want = _brute(rows, d)
    assert got == want
    assert want, "vacuous: no pairs generated"


def test_collapse_exact_duplicate_heavy_families(spark):
    """The collapse_exact posture on its target shape: replica
    families (one 40-copy, one 7-copy, near-copies bridging them,
    plus uniques) — identical results to the direct path and to
    brute force, with and without salt."""
    base = "power law replica title"
    near = "power law replica titre"  # dist 1 from base
    rows = [(i, base) for i in range(40)]
    rows += [(100 + i, near) for i in range(7)]
    rows += [(200 + i, f"unique string number {i:02d}") for i in range(30)]
    want = _brute(rows, 2)
    direct = _run(spark, rows, 2)
    collapsed = _run(spark, rows, 2, collapse_exact=True)
    collapsed_salted = _run(spark, rows, 2, collapse_exact=True, salt=16)
    assert direct == collapsed == collapsed_salted == want
    # the families really expand: 40*39/2 + 7*6/2 within + 40*7 across
    assert len(want) >= 780 + 21 + 280


def test_planted_edit_families(spark):
    """One base string with a substitution, an insertion, a deletion
    (each at start / middle / end), plus an unrelated string — each
    edited copy pairs with the base at distance 1."""
    base = "the quick brown fox"
    rows = [
        (0, base),
        (1, "xhe quick brown fox"),   # sub at start
        (2, "the quick crown fox"),   # sub in middle
        (3, "the quick brown foy"),   # sub at end
        (4, "tthe quick brown fox"),  # insert at start
        (5, "the quiick brown fox"),  # insert in middle
        (6, "the quick brown foxx"),  # insert at end
        (7, "he quick brown fox"),    # delete at start
        (8, "the quck brown fox"),    # delete in middle
        (9, "the quick brown fo"),    # delete at end
        (10, "completely different"),
    ]
    got = _run(spark, rows, 1)
    want = _brute(rows, 1)
    assert got == want
    for i in range(1, 10):
        assert (0, i, 1) in got


def test_unicode_strings(spark):
    rows = [
        (0, "naïve café"),
        (1, "naive café"),     # é/e substitution -> dist 1 in chars
        (2, "naïve cafés"),    # append
        (3, "날씨가 좋다"),
        (4, "날씨가 좋아"),
    ]
    got = _run(spark, rows, 1)
    assert got == _brute(rows, 1)
    assert (3, 4, 1) in got


def test_spark_levenshtein_matches_reference_dp(spark):
    rng = random.Random(7)
    alpha = "abcdefg"
    pairs = [
        (
            "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 20))),
            "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 20))),
        )
        for _ in range(300)
    ]
    df = spark.createDataFrame(pairs, "a string, b string")
    got = df.select(F.levenshtein("a", "b").alias("d")).collect()
    for (a, b), r in zip(pairs, got):
        assert r.d == ref_lev(a, b), (a, b)


def test_duckdb_levenshtein_matches_reference_dp():
    import duckdb

    rng = random.Random(11)
    alpha = "abcdef"
    con = duckdb.connect()
    for _ in range(200):
        a = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 15)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 15)))
        d = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert d == ref_lev(a, b), (a, b)


def test_short_string_guard_is_loud(spark):
    # the guard rides the main action (raise_error in the length
    # projection), so it fires at collect time, not construction
    df = spark.createDataFrame([(0, "ab"), (1, "abcdef")], "id long, s string")
    out = editdistance_join(df, "id", "s", 2)
    with pytest.raises(Exception, match="length > max_dist"):
        out.collect()
    with pytest.raises(ValueError, match="max_dist"):
        editdistance_join(df, "id", "s", 0)


def test_construction_dispatches_no_jobs(spark):
    """The round-8 guard ran an eager .limit(1).count() per side —
    two extra Spark jobs per call before any real work. Pin the fix:
    constructing the join dispatches ZERO jobs (validation is folded
    into the main action)."""
    sc = spark.sparkContext
    df = spark.createDataFrame(
        [(i, "abcdefgh"[: 5 + (i % 3)]) for i in range(20)],
        "id long, s string",
    )
    group = "editdist-construction-probe"
    sc.setJobGroup(group, "pin: lazy construction")
    try:
        out = editdistance_join(df, "id", "s", 2)
        assert list(sc.statusTracker().getJobIdsForGroup(group)) == []
    finally:
        sc.setJobGroup(None, None)
    assert out.count() > 0  # still a working join


def test_no_duplicate_pairs_and_plan_is_equi(spark):
    rows = [(i, "abcabcabc"[: 4 + (i % 5)]) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, s string")
    out = editdistance_join(df, "id", "s", 2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    got = [(r.id_a, r.id_b) for r in out.collect()]
    assert len(got) == len(set(got))


def test_planted_skew_salt_balances_hot_key(spark):
    """Power-law replica family: one title with hundreds of copies
    makes its segment keys emit ~H² candidate rows from ONE reduce
    task — and AQE's skew-join split cannot help, because skew
    detection reads the shuffle's map-output (INPUT) sizes, which stay
    modest while the join OUTPUT explodes quadratically (the probe
    measured 258× the median partition with zero skew splits). Pins:
    (a) the unsalted candidate join really does straggle (>4× median),
    (b) salt spreads it to within 4× of the median partition,
    (c) salted results are identical and the plan stays equi-join."""
    import statistics

    from spotify_etl_aws_spark.operators.editdist import (
        _candidates,
        _normalized,
    )

    rng = random.Random(3)
    alpha = "abcdefghijklmnop"
    hot = "the hot duplicated title xx"
    rows = [(i, hot) for i in range(600)]
    rows += [
        (
            1000 + i,
            "".join(rng.choice(alpha) for _ in range(rng.randrange(20, 28))),
        )
        for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    d = 2

    def partition_counts(salt: int):
        s = _normalized(df, "id", "s", d, "probe-side")
        raw = _candidates(s, s, d, salt)
        return sorted(
            r["count"]
            for r in raw.groupBy(F.spark_partition_id()).count().collect()
        )

    # AQE's size-based partition COALESCING merges the small uniform
    # partitions and would hide the hash distribution this test pins
    # (it merges small partitions; it never splits the hot one) —
    # measure with coalescing off so partition ids reflect the shuffle
    coalesce_conf = "spark.sql.adaptive.coalescePartitions.enabled"
    old = spark.conf.get(coalesce_conf)
    spark.conf.set(coalesce_conf, "false")
    try:
        unsalted = partition_counts(1)
        assert unsalted[-1] > 4 * statistics.median(unsalted), unsalted
        salted = partition_counts(64)
        assert salted[-1] <= 4 * statistics.median(salted), salted
    finally:
        spark.conf.set(coalesce_conf, old)

    # end-to-end: identical pairs, and the salted plan stays pure
    # equi-join (the explode adds rows, never a theta condition)
    plain = editdistance_join(df, "id", "s", d)
    with_salt = editdistance_join(df, "id", "s", d, salt=64)
    plan = with_salt._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    got_p = {(r.id_a, r.id_b, r.dist) for r in plain.collect()}
    got_s = {(r.id_a, r.id_b, r.dist) for r in with_salt.collect()}
    assert got_p == got_s and got_p
    with pytest.raises(ValueError, match="salt"):
        editdistance_join(df, "id", "s", d, salt=0)


def test_two_table_join_matches_brute(spark):
    """Entity-resolution shape: probe records vs an indexed master
    table — ids in separate spaces, every (probe, master) pair within
    d returned exactly once, including id collisions across tables and
    identical strings (dist 0)."""
    rng = random.Random(23)
    alpha = "abcd"
    master = [
        (i, "".join(rng.choice(alpha) for _ in range(rng.randrange(4, 10))))
        for i in range(60)
    ]
    probes = [(i, s) for i, (_, s) in enumerate(master[:20])]  # exact hits
    probes += [
        (i + 100, "".join(rng.choice(alpha) for _ in range(rng.randrange(4, 10))))
        for i in range(40)
    ]
    df_p = spark.createDataFrame(probes, "pid long, ps string")
    df_m = spark.createDataFrame(master, "mid long, ms string")
    want = set()
    for pid, ps in probes:
        for mid, ms in master:
            dd = ref_lev(ps, ms)
            if dd <= 2:
                want.add((pid, mid, dd))
    for collapse in (False, True):
        got = {
            (r.id_a, r.id_b, r.dist)
            for r in editdistance_join(
                df_p, "pid", "ps", 2,
                other=df_m, other_id_col="mid", other_str_col="ms",
                collapse_exact=collapse,
            ).collect()
        }
        assert got == want, f"collapse_exact={collapse}"
    assert any(dist == 0 for _, _, dist in want)  # the planted exact hits
