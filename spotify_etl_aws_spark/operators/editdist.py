"""Exact edit-distance (Levenshtein) string join via segment
partitioning — the entity-resolution / fuzzy-dedup join the q-gram and
shingle lanes can't express (they bound set overlap, not edit
operations). The reference has no string-similarity machinery at all
(its dbt models never leave exact equality), so this is gap inventory
(SURVEY.md §2.11a ladder).

Algorithm (PassJoin, Li/Deng/Wang/Feng, VLDB 2012, simplified
fixed-±d position windows): a naive edit-distance join is a quadratic
theta join — the classic 100 TB killer. Segmenting makes it an
EQUI-join by pigeonhole:

- every string, as the INDEXED side, splits into ``d + 1`` contiguous
  segments (lengths ``⌊L/(d+1)⌋`` or ``⌈L/(d+1)⌉``). At most ``d``
  edit operations cannot touch all ``d + 1`` segments, so any string
  within distance ``d`` contains at least one segment VERBATIM;
- every string, as the PROBE side, enumerates the substrings that
  could equal a segment of a partner of length ``Lb ∈ [L−d, L+d]``:
  for each candidate partner length and segment index, the substring
  of the segment's length at positions within ``±d`` of the segment's
  home position (insertions/deletions shift a surviving segment by at
  most ``d``);
- candidates meet on the equi-key ``(Lb, segment_index, substring)``
  — one hash join, no theta anywhere — and the exact
  ``levenshtein(a, b) <= d`` verify (JVM-side ``F.levenshtein``)
  discards false positives.

Probe fan-out is ``(2d+1)`` lengths × ``(d+1)`` segments × ``≤(2d+1)``
positions ≈ 75 rows per string at ``d = 2`` — constant per string, so
the join scales like the data, not its square; segment equality is
selective precisely because segments are ``~L/(d+1)`` characters
long. Self-join symmetry: a pair within distance ``d`` is found with
either side as the probe (both, in fact), so candidates normalize to
``(lo, hi)`` and dedup with one ``distinct``. The two-table form
(probe records vs a master table — the entity-resolution shape)
indexes ``other`` and probes ``df``: pigeonhole completeness needs
only one direction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _normalized(df: DataFrame, id_col: str, str_col: str, d: int, side: str):
    s = df.select(F.col(id_col).alias("id"), F.col(str_col).alias("s")).filter(
        F.col("s").isNotNull()
    )
    # loud guard: segment partitioning needs L >= d + 1. Folded INTO
    # the length projection (raise_error under CASE WHEN) so validation
    # rides the main join action instead of dispatching an eager
    # .limit(1).count() job per side at construction time — the
    # operator stays fully lazy, zero extra jobs (pinned in
    # tests/test_editdist.py::test_construction_dispatches_no_jobs).
    # Every candidate string flows through _probe/_indexed, and both
    # read L, so the guard cannot be projection-pruned away.
    msg = (
        f"editdistance_join: {side} string of length <= max_dist={d} "
        "present; segment partitioning requires length > max_dist "
        "(filter or route short strings separately): "
    )
    return s.withColumn(
        "L",
        F.when(
            F.length("s") <= d,
            F.raise_error(F.concat(F.lit(msg), F.col("s"))).cast("int"),
        ).otherwise(F.length("s")),
    )


def _indexed(s: DataFrame, d: int):
    k = d + 1
    return s.select(
        F.col("id").alias("b_id"),
        F.col("L").alias("Lb"),
        F.explode(F.sequence(F.lit(0), F.lit(d))).alias("i"),
        F.col("s").alias("b_s"),
    ).select(
        "b_id",
        "Lb",
        "i",
        F.expr(
            f"substring(b_s, (i * (Lb div {k}) + least(i, Lb % {k})) + 1, "
            f"(Lb div {k}) + (CASE WHEN i < Lb % {k} THEN 1 ELSE 0 END))"
        ).alias("seg"),
    )


def _probe(s: DataFrame, d: int):
    k = d + 1
    seg_len = f"(L div {k}) + (CASE WHEN i < L % {k} THEN 1 ELSE 0 END)"
    seg_start = f"i * (L div {k}) + least(i, L % {k})"
    return (
        s.select(
            F.col("id").alias("a_id"),
            F.col("s").alias("a_s"),
            F.col("L").alias("La"),
            F.explode(
                F.expr(f"sequence(greatest(L - {d}, {k}), L + {d})")
            ).alias("L"),  # candidate partner length Lb (>= k)
        )
        .select(
            "a_id",
            "a_s",
            "La",
            F.col("L").alias("Lb"),
            F.col("L"),
            F.explode(F.sequence(F.lit(0), F.lit(d))).alias("i"),
        )
        .select(
            "a_id",
            "a_s",
            "La",
            "Lb",
            "i",
            F.expr(f"CAST(({seg_len}) AS INT)").alias("slen"),
            F.expr(f"CAST(({seg_start}) AS INT)").alias("sstart"),
        )
        .filter(F.col("slen") <= F.col("La"))
        .select(
            "a_id",
            "a_s",
            "Lb",
            "i",
            "slen",
            F.explode(
                F.expr(
                    f"sequence(greatest(sstart - {d}, 0), "
                    f"least(sstart + {d}, La - slen))"
                )
            ).alias("p"),
        )
        # an inverted window makes sequence() run DESCENDING: those
        # positions are out-of-alignment, their substrings truncate to
        # < slen and can never equal a full-length segment — harmless
        # to correctness; p >= 0 cuts the bulk of them
        .filter(F.col("p") >= 0)
        .select(
            "a_id",
            "Lb",
            "i",
            F.expr("substring(a_s, p + 1, slen)").alias("seg"),
        )
    )


def _candidates(sa: DataFrame, sb: DataFrame, d: int, salt: int):
    """The candidate equi-join, optionally salted. Salting only
    balances if the join actually SHUFFLES on the salted key — a
    broadcast of the (small) index side would generate all candidate
    rows inside the probe's upstream partitions, where replica
    families are typically adjacent — so salt > 1 pins a sort-merge
    join (the hint forces co-partitioning by (Lb, i, seg, __salt))."""
    pa, ib = _probe(sa, d), _indexed(sb, d)
    keys = ["Lb", "i", "seg"]
    if salt > 1:
        pa = pa.withColumn("__salt", F.pmod(F.hash("a_id"), F.lit(salt)))
        ib = ib.withColumn(
            "__salt",
            F.explode(F.sequence(F.lit(0), F.lit(salt - 1))),
        )
        keys = keys + ["__salt"]
        pa = pa.hint("merge")
    return pa.join(ib, keys)


def _salted_equijoin(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int,
    spread_col: str,
):
    """Equi-join on ``key`` where ``left`` may hold a hot key with
    large multiplicity: shard left rows by ``spread_col``'s hash,
    replicate right rows across shards (each (left, right) pair still
    meets exactly once), and pin a sort-merge join so the spread
    happens in a shuffle."""
    if salt <= 1:
        return left.join(right, key)
    l = left.withColumn(
        "__xsalt", F.pmod(F.hash(spread_col), F.lit(salt))
    ).hint("merge")
    r = right.withColumn(
        "__xsalt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return l.join(r, [key, "__xsalt"]).drop("__xsalt")


def _collapsed_join(
    sa: DataFrame, sb: DataFrame, d: int, salt: int, self_mode: bool
) -> DataFrame:
    """The ``collapse_exact`` plan: run the segment join over DISTINCT
    strings only (one ``levenshtein`` per distinct pair, however many
    copies exist), then expand group memberships back to id pairs with
    salted joins. A replica family of H copies costs H index rows and
    ONE verification in rep space instead of ~H² candidate rows and
    ~H²/2 verifications; the H²/2 output pairs are the contract and
    are generated by pure expansion joins with no distinct and no
    per-pair verification."""
    reps_a = sa.select("s", "L").distinct()
    reps_b = reps_a if self_mode else sb.select("s", "L").distinct()
    # rep space: the string IS the id (least/greatest + != work on
    # strings, so the core candidate pipeline applies unchanged)
    ra = reps_a.select(F.col("s").alias("id"), "s", "L")
    rb = reps_b.select(F.col("s").alias("id"), "s", "L")
    raw = _candidates(ra, rb, d, salt)
    if self_mode:
        rp = (
            raw.filter(F.col("a_id") != F.col("b_id"))
            .select(
                F.least("a_id", "b_id").alias("s_x"),
                F.greatest("a_id", "b_id").alias("s_y"),
            )
            .distinct()
        )
    else:
        rp = raw.select(
            F.col("a_id").alias("s_x"), F.col("b_id").alias("s_y")
        ).distinct()
    rp = rp.withColumn("dist", F.levenshtein("s_x", "s_y")).filter(
        F.col("dist") <= d
    )

    la = sa.select(F.col("s").alias("s_x"), F.col("id").alias("ia"))
    lb = sb.select(F.col("s").alias("s_y"), F.col("id").alias("ib"))
    # expand: members of x first (la carries the hot multiplicity →
    # spread by member id), then members of y (left side now carries
    # |group_x| × partners rows → spread by ia)
    step1 = _salted_equijoin(la, rp, "s_x", salt, "ia")
    step2 = _salted_equijoin(step1, lb, "s_y", salt, "ia")
    if self_mode:
        # distinct-string groups are disjoint row sets, so ia != ib
        cross = step2.select(
            F.least("ia", "ib").alias("id_a"),
            F.greatest("ia", "ib").alias("id_b"),
            "dist",
        )
        # within-group pairs: identical strings, distance 0 by
        # definition — pure expansion, no verification
        wl = sa.select("s", F.col("id").alias("ia"))
        wr = sa.select("s", F.col("id").alias("ib"))
        within = (
            _salted_equijoin(wl, wr, "s", salt, "ia")
            .filter(F.col("ia") < F.col("ib"))
            .select(
                F.col("ia").alias("id_a"),
                F.col("ib").alias("id_b"),
                F.lit(0).alias("dist"),
            )
        )
        return cross.unionByName(within)
    return step2.select(
        F.col("ia").alias("id_a"), F.col("ib").alias("id_b"), "dist"
    )


def editdistance_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int,
    other: DataFrame | None = None,
    other_id_col: str | None = None,
    other_str_col: str | None = None,
    salt: int = 1,
    collapse_exact: bool = False,
) -> DataFrame:
    """Pairs whose strings are within Levenshtein distance
    ``max_dist``, with the exact distance, as (id_a, id_b, dist).

    Self-join (``other=None``): all unordered pairs (id_a < id_b)
    within ``df``. Two-table (``other`` given — the entity-resolution
    shape): id_a from ``df`` (probe records), id_b from ``other`` (the
    indexed master table); ids live in separate spaces and are NOT
    compared or deduped across tables.

    NULL strings are dropped; every string must be longer than
    ``max_dist`` (shorter strings cannot fill ``d + 1`` non-empty
    segments — the operator fails loud rather than silently missing
    pairs).

    ``salt > 1``: hot-key fallback for power-law replica families. A
    title with H near-identical copies makes its segment keys emit
    ~H² candidate rows from ONE reduce task — and AQE's skew-join
    split cannot help, because skew detection reads the shuffle's
    map-output (INPUT) sizes, which stay modest while the join OUTPUT
    explodes quadratically (measured: a 600-copy family leaves the
    plan un-split at 258× the median partition;
    experiments/editdist_skew.py). Salting splits each probe row to
    one of ``salt`` shards by id hash and replicates index rows
    across all shards, so every (probe, index) pair still meets
    exactly once while the hot key's candidate generation spreads
    over ``salt`` tasks. Costs ×salt index-side rows — leave at 1 for
    near-uniform data; results are identical either way (test-pinned).

    ``collapse_exact=True``: the duplicate-heavy posture. Exact
    duplicates collapse to one representative per distinct string
    BEFORE the segment join, so a family of H copies costs H index
    rows and ONE levenshtein instead of ~H² candidate rows and ~H²/2
    verifications; the contractually-required H²/2 output pairs are
    generated by pure salted expansion joins (no distinct, no
    verification). Identical results (test-pinned); costs one extra
    distinct plus two expansion joins — leave off for
    low-duplication data.
    """
    if max_dist < 1:
        raise ValueError(f"max_dist must be >= 1, got {max_dist}")
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    d = int(max_dist)

    sa = _normalized(df, id_col, str_col, d, "probe-side")
    if other is None:
        sb = sa
    else:
        sb = _normalized(
            other,
            other_id_col or id_col,
            other_str_col or str_col,
            d,
            "indexed-side",
        )

    if collapse_exact:
        return _collapsed_join(sa, sb, d, int(salt), self_mode=other is None)

    raw = _candidates(sa, sb, d, int(salt))
    if other is None:
        cands = (
            raw.filter(F.col("a_id") != F.col("b_id"))
            .select(
                F.least("a_id", "b_id").alias("id_a"),
                F.greatest("a_id", "b_id").alias("id_b"),
            )
            .distinct()
        )
    else:
        cands = raw.select(
            F.col("a_id").alias("id_a"), F.col("b_id").alias("id_b")
        ).distinct()

    left_names = sa.select(
        F.col("id").alias("id_a"), F.col("s").alias("s_a")
    )
    right_names = sb.select(
        F.col("id").alias("id_b"), F.col("s").alias("s_b")
    )
    return (
        cands.join(left_names, "id_a")
        .join(right_names, "id_b")
        .withColumn("dist", F.levenshtein("s_a", "s_b"))
        .filter(F.col("dist") <= d)
        .select("id_a", "id_b", "dist")
    )
