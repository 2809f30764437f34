"""Data-layout keys and co-occurrence mining lanes — split out of queries/selection.py in round 12
(verdict item 5). The registry (selection.QUERIES / selection.ORACLE)
and the driver's query ordering are unchanged: selection re-exports
every name defined here, so ``queries.selection.<name>`` keeps
resolving for tests, experiments and tools. Lane bodies are moved
VERBATIM — the full-sweep manifest gate pins value-hash equality."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.vectors import cosine
from ..sources.readers import load_table as t
from .vector import _embeddings, _query_vector
from ..operators.lineage import cut_lineage

ZORDER_BITS = 16


def layout_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order/Morton layout keys (operators/zorder.py — the
    Delta/Iceberg OPTIMIZE ZORDER clustering primitive; sorting by
    this key gives every parquet file a tight min/max bounding box in
    BOTH dimensions, the 100 TB scan-pruning lever): interleaved
    (p_size, int-cents price-bucket) bits for every part. Pure
    integer shift/mask arithmetic — the oracle re-derives the
    interleave with an unnest(range)-summed twin."""
    from ..operators.zorder import zvalue

    p = t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("long").alias("x"),
        # explicit floor on BOTH engines (the oracle's DuckDB `//`
        # floors): Spark `div` truncates toward zero, so a negative
        # price would land in a different bucket (round-12 ADVICE
        # fix; exact since cents << 2^53)
        F.expr(
            "CAST(floor(CAST(round(p_retailprice * 100) AS BIGINT)"
            " / 1000) AS BIGINT)"
        ).alias("y"),
    )
    return p.select(
        "p_partkey", "x", "y",
        zvalue(["x", "y"], bits=ZORDER_BITS).alias("zval"),
    )


ORACLE_ZORDER = f"""
WITH d AS (
  SELECT p_partkey, CAST(p_size AS BIGINT) AS x,
         CAST(round(p_retailprice * 100) AS BIGINT) // 1000 AS y
  FROM part
)
SELECT p_partkey, x, y,
       CAST(sum(((x >> i.i) & 1) * (CAST(1 AS BIGINT) << (2 * i.i))
              + ((y >> i.i) & 1) * (CAST(1 AS BIGINT) << (2 * i.i + 1)))
            AS BIGINT) AS zval
FROM d, unnest(range(0, {ZORDER_BITS})) i(i)
GROUP BY p_partkey, x, y
"""


# ---- Hilbert layout keys (round 11) ----
#
# The locality-preserving sibling of layout_zorder_keys (operators/
# hilbert.py): consecutive Hilbert indices are always grid-neighbors,
# so range predicates map to fewer, tighter file bounding boxes than
# Morton order gives (the reason liquid-clustering-style layouts
# prefer it). Same (size, price-bucket) dimensions as the z-order
# lane so the two layout keys are directly comparable. The unrolled
# per-level rotate/reflect chain is pure integer CASE/shift/xor
# arithmetic on BOTH engines, generated from one transform
# (operators/hilbert.py:hilbert_sql) — hash-exact.
HILBERT_BITS = 9  # grid 512x512: covers p_size <= 50, price bucket <= ~210


def layout_hilbert_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert d-index layout keys for every part on the z-order
    lane's (size, price-bucket) grid. Returns (p_partkey, x, y,
    hval)."""
    from ..operators.hilbert import with_hilbert

    p = t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("long").alias("x"),
        # explicit floor on BOTH engines (the oracle's DuckDB `//`
        # floors): Spark `div` truncates toward zero, so a negative
        # price would land in a different bucket (round-12 ADVICE
        # fix; exact since cents << 2^53)
        F.expr(
            "CAST(floor(CAST(round(p_retailprice * 100) AS BIGINT)"
            " / 1000) AS BIGINT)"
        ).alias("y"),
    )
    return with_hilbert(p, "x", "y", HILBERT_BITS, "hval")


def _hilbert_oracle() -> str:
    from ..operators.hilbert import hilbert_sql

    return f"""
WITH hsrc AS (
  SELECT p_partkey AS k, CAST(p_size AS BIGINT) AS sz,
         CAST(round(p_retailprice * 100) AS BIGINT) // 1000 AS pb
  FROM part
),
{hilbert_sql("sz", "pb", HILBERT_BITS)}
SELECT h.k AS p_partkey, h.sz AS x, h.pb AS y, l0.d AS hval
FROM l0 JOIN hsrc h ON h.k = l0.k
"""


ORACLE_HILBERT = _hilbert_oracle()


# ---- frequent-pair co-occurrence mining (rounds 11-12) ----
#
# The A-Priori L2 pass (Agrawal & Srikant, VLDB 1994 — market-basket
# association mining): part pairs co-occurring in >= minsup orders,
# with lift. Round 12 gives the lane its 100 TB posture (round-11
# verdict item 1):
#
# - L1 PREFILTER (anti-monotonicity): an item in fewer than minsup
#   baskets can never appear in a frequent pair, so the self-join
#   sides are semi-joined against the frequent-item set FIRST — exact,
#   output (and oracle) unchanged, and on a web-scale corpus where
#   most items are rare this is the difference between "runs" and the
#   plan you'd want. The frequent-item frame is broadcast here (it is
#   the minsup-survivor vocabulary, orders of magnitude smaller than
#   the fact); at a scale where even that side outgrows the broadcast
#   threshold, drop the hint and the same semi-join shuffles on p.
# - HOT-BASKET VALVE: one degenerate basket of n items emits n^2/2
#   pairs with no bound — the linkage family's max_block_pairs
#   problem wearing a different key. mine_frequent_pairs_capped drops
#   baskets larger than {MINE_MAX_BASKET_ITEMS} items BEFORE pair
#   generation, and mine_basket_census is the read-first number (the
#   link_block_census pattern: census -> pick cap -> capped run);
#   the oracle replays the cap as the identical HAVING.
# - The distinct basket frame feeds FOUR consumers (both self-join
#   sides, the per-part counts, the basket total); it is persisted
#   MEMORY_AND_DISK and materialized by the n_baskets count — unlike
#   round 11's localCheckpoint, the persisted blocks keep their
#   LINEAGE, so an executor loss on a real cluster recomputes the
#   partition instead of failing the job (localCheckpoint blocks are
#   non-replicated and unrecoverable).
#
# Pair mass after the valve is bounded by cap^2/2 per basket (linear
# in baskets); support counting is one partial-agg shuffle on the
# pair key. Support and the per-part counts are exact integers; the
# lift numerator/denominator PRODUCTS widen to decimal (Spark) /
# HUGEINT (DuckDB) BEFORE the one double division — the OLS-moments
# overflow class (round-12 verdict item 1): support * n_baskets as
# int64 with ANSI off silently wraps past ~1e18 (reachable at
# TPC-H >= SF10k basket counts), while the decimal(19,0)x(19,0)
# product lands in (38,0) — scale-0 precision adjustment loses
# nothing, any int64 x int64 product < 8.6e37 stays exact, and the
# decimal->double conversion of the same exact integer is the same
# round-to-nearest on both engines. (19,0), not the OLS lane's
# (18,0): counts here can legitimately fill int64, and an (18,0)
# operand would NULL at 1e18 — below int64's own ceiling.
MINE_MINSUP = 3
MINE_MAX_BASKET_ITEMS = 8  # valve; census shows 1..17-item baskets

# one persisted basket frame per (application, sf_dir), shared by the
# five mining lanes: per-invocation persists leaked a cached distinct
# frame per call over a long sweep session (round-12 ADVICE); the
# cache bounds the footprint at one frame per corpus per app
_BASKET_CACHE: dict[tuple[str, str], DataFrame] = {}


def _basket_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (order o, part p) basket frame, persisted
    MEMORY_AND_DISK (cluster-safe: recompute-on-loss lineage, not
    the unrecoverable localCheckpoint blocks); cached per
    (application, sf_dir) so repeated lane calls reuse one persist."""
    import os

    from pyspark import StorageLevel

    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    cached = _BASKET_CACHE.get(key)
    if cached is not None:
        return cached
    df = (
        t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _BASKET_CACHE[key] = df
    return df


def _mine_pairs(b: DataFrame, n_baskets: int) -> DataFrame:
    """A-Priori L2 over an already-materialized basket frame: L1
    item prefilter -> within-basket self-join -> support >= minsup
    -> exact-integer lift against the FULL frame item counts."""
    cnt = b.groupBy("p").agg(F.count(F.lit(1)).alias("cnt"))
    # L1: only items that can still reach pair support generate pairs
    l1 = cnt.filter(F.col("cnt") >= MINE_MINSUP).select("p")
    bf = b.join(F.broadcast(l1), "p", "semi")
    pairs = (
        bf.alias("x")
        .join(
            bf.alias("y"),
            (F.col("x.o") == F.col("y.o"))
            & (F.col("x.p") < F.col("y.p")),
        )
        .select(
            F.col("x.p").alias("part_a"), F.col("y.p").alias("part_b")
        )
    )
    sup = (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= MINE_MINSUP)
    )
    return (
        sup.join(
            F.broadcast(cnt.withColumnRenamed("p", "part_a")
                        .withColumnRenamed("cnt", "ca")),
            "part_a",
        )
        .join(
            F.broadcast(cnt.withColumnRenamed("p", "part_b")
                        .withColumnRenamed("cnt", "cb")),
            "part_b",
        )
        .select(
            "part_a", "part_b", "support",
            # products widen BEFORE the division (overflow-proof; see
            # the family comment above): (19,0)x(19,0) -> (38,0) exact
            (
                (
                    F.col("support").cast("decimal(19,0)")
                    * F.lit(n_baskets).cast("decimal(19,0)")
                ).cast("double")
                / (
                    F.col("ca").cast("decimal(19,0)")
                    * F.col("cb").cast("decimal(19,0)")
                ).cast("double")
            ).alias("lift"),
        )
    )


def mine_frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent part pairs across order baskets. Returns (part_a,
    part_b, support, lift) for pairs with support >= {MINE_MINSUP}."""
    b = _basket_frame(spark, sf_dir)
    n_baskets = b.select("o").distinct().count()  # materializes b
    return _mine_pairs(b, n_baskets)


def mine_basket_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The read-first number before picking MINE_MAX_BASKET_ITEMS
    (the link_block_census pattern): basket-size histogram with each
    size candidate-pair mass k*(k-1)/2 * n. Integers, hash-exact.
    Returns (basket_items, n_baskets, pair_mass)."""
    b = _basket_frame(spark, sf_dir)
    sizes = b.groupBy("o").agg(F.count(F.lit(1)).alias("basket_items"))
    # k*(k-1) div 2 is safe int64 (k = items per basket); the BIG
    # product is triangle * n_baskets — widened to decimal before the
    # long cast so a >2^63 mass NULLs loudly instead of wrapping
    # (round-12 verdict item 1; the census IS the read-at-scale
    # number). try_cast, not cast: the plain decimal->long cast with
    # ANSI off CLAMPS to Long.MIN — still a silent wrong value
    # (pinned in tests/test_mining_guard.py)
    tri = F.expr(
        "basket_items * (basket_items - 1) div 2"
    ).cast("decimal(19,0)")
    return (
        sizes.groupBy("basket_items")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
        .select(
            "basket_items",
            "n_baskets",
            (tri * F.col("n_baskets").cast("decimal(19,0)"))
            .try_cast("long")
            .alias("pair_mass"),
        )
    )


def mine_frequent_pairs_capped(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """mine_frequent_pairs with the hot-basket valve engaged: baskets
    larger than {MINE_MAX_BASKET_ITEMS} distinct items are dropped
    BEFORE pair generation (the degenerate-basket n^2 guard), and the
    whole computation — support, item counts, n_baskets — replays on
    the censored frame. Same output contract."""
    b = _basket_frame(spark, sf_dir)
    keep = (
        b.groupBy("o")
        .agg(F.count(F.lit(1)).alias("k"))
        .filter(F.col("k") <= MINE_MAX_BASKET_ITEMS)
        .select("o")
    )
    # semi-join shuffles on o, co-partitioned with the size groupBy —
    # the keep side is one row per surviving basket (NOT broadcast:
    # it scales with orders, unlike the L1 vocabulary)
    bc = b.join(keep, "o", "semi")
    n_baskets = bc.select("o").distinct().count()  # materializes b
    return _mine_pairs(bc, n_baskets)


ORACLE_FREQ_PAIRS = f"""
WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
nb AS (SELECT count(DISTINCT o) AS n FROM b),
pr AS (
  SELECT x.p AS part_a, y.p AS part_b
  FROM b x JOIN b y ON x.o = y.o AND x.p < y.p
),
sup AS (
  SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS support
  FROM pr GROUP BY part_a, part_b
  HAVING count(*) >= {MINE_MINSUP}
),
cnt AS (SELECT p, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY p)
SELECT s.part_a, s.part_b, s.support,
       -- products widen to HUGEINT before the double division
       -- (Spark widens to decimal(37,0) -- same exact integer)
       CAST(CAST(s.support AS HUGEINT) * nb.n AS DOUBLE)
       / CAST(CAST(ca.c AS HUGEINT) * cb.c AS DOUBLE) AS lift
FROM sup s
JOIN cnt ca ON ca.p = s.part_a
JOIN cnt cb ON cb.p = s.part_b, nb
"""


ORACLE_BASKET_CENSUS = """
WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
s AS (SELECT o, CAST(count(*) AS BIGINT) AS basket_items FROM b GROUP BY o)
SELECT basket_items, CAST(count(*) AS BIGINT) AS n_baskets,
       -- triangle is safe int64; triangle * n widens to HUGEINT, and
       -- the BIGINT cast errors loudly out of range (Spark: decimal
       -- product, NULL on long overflow) instead of wrapping
       CAST(CAST(basket_items * (basket_items - 1) // 2 AS HUGEINT)
            * count(*) AS BIGINT) AS pair_mass
FROM s GROUP BY basket_items
"""


ORACLE_FREQ_PAIRS_CAPPED = f"""
WITH b0 AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
keep AS (
  SELECT o FROM b0 GROUP BY o
  HAVING count(*) <= {MINE_MAX_BASKET_ITEMS}
),
b AS (SELECT * FROM b0 WHERE o IN (SELECT o FROM keep)),
nb AS (SELECT count(DISTINCT o) AS n FROM b),
pr AS (
  SELECT x.p AS part_a, y.p AS part_b
  FROM b x JOIN b y ON x.o = y.o AND x.p < y.p
),
sup AS (
  SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS support
  FROM pr GROUP BY part_a, part_b
  HAVING count(*) >= {MINE_MINSUP}
),
cnt AS (SELECT p, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY p)
SELECT s.part_a, s.part_b, s.support,
       -- products widen to HUGEINT before the double division
       -- (Spark widens to decimal(37,0) -- same exact integer)
       CAST(CAST(s.support AS HUGEINT) * nb.n AS DOUBLE)
       / CAST(CAST(ca.c AS HUGEINT) * cb.c AS DOUBLE) AS lift
FROM sup s
JOIN cnt ca ON ca.p = s.part_a
JOIN cnt cb ON cb.p = s.part_b, nb
"""


def mine_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rule-generation half of A-Priori (Agrawal & Srikant 1994 —
    the algorithm's actual OUTPUT is directed rules, not itemsets):
    every frequent pair emits both directions with exact-integer
    confidence = support(a,b) / count(antecedent) and the symmetric
    lift the pair lane already carries. One extra broadcast join of
    the vocabulary-sized item counts onto the (tiny) frequent-pair
    frame — no new fact scan, no new shuffle beyond the pair lane's.
    Returns (antecedent, consequent, support, confidence, lift)."""
    b = _basket_frame(spark, sf_dir)
    n_baskets = b.select("o").distinct().count()  # materializes b
    pairs = _mine_pairs(b, n_baskets)
    cnt = b.groupBy("p").agg(F.count(F.lit(1)).alias("cnt"))
    # both directions from ONE pass over the pair pipeline (explode of
    # a 2-struct array) — a union of two selects would recompute the
    # whole self-join + support aggregation per direction
    both = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("part_a").alias("antecedent"),
                    F.col("part_b").alias("consequent"),
                ),
                F.struct(
                    F.col("part_b").alias("antecedent"),
                    F.col("part_a").alias("consequent"),
                ),
            )
        ).alias("r"),
        "support",
        "lift",
    ).select("r.antecedent", "r.consequent", "support", "lift")
    return (
        both
        .join(
            F.broadcast(cnt.withColumnRenamed("p", "antecedent")),
            "antecedent",
        )
        .select(
            "antecedent", "consequent", "support",
            (F.col("support") / F.col("cnt") + F.lit(0.0)).alias(
                "confidence"
            ),
            "lift",
        )
    )


ORACLE_ASSOC_RULES = f"""
WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
nb AS (SELECT count(DISTINCT o) AS n FROM b),
pr AS (
  SELECT x.p AS part_a, y.p AS part_b
  FROM b x JOIN b y ON x.o = y.o AND x.p < y.p
),
sup AS (
  SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS support
  FROM pr GROUP BY part_a, part_b
  HAVING count(*) >= {MINE_MINSUP}
),
cnt AS (SELECT p, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY p),
pairs AS (
  SELECT s.part_a, s.part_b, s.support,
         CAST(CAST(s.support AS HUGEINT) * nb.n AS DOUBLE)
         / CAST(CAST(ca.c AS HUGEINT) * cb.c AS DOUBLE) AS lift
  FROM sup s
  JOIN cnt ca ON ca.p = s.part_a
  JOIN cnt cb ON cb.p = s.part_b, nb
),
rules AS (
  SELECT part_a AS antecedent, part_b AS consequent, support, lift
  FROM pairs
  UNION ALL
  SELECT part_b, part_a, support, lift FROM pairs
)
SELECT r.antecedent, r.consequent, r.support,
       (CAST(r.support AS DOUBLE) / c.c) + 0.0 AS confidence,
       r.lift
FROM rules r JOIN cnt c ON c.p = r.antecedent
"""


# ---- A-Priori L3: frequent triples + pair->item rules (round 13) ----
#
# Agrawal & Srikant 1994 iterates past L2 (verdict item 7); the L3
# pass here runs on the BRAND item domain because the partkey domain
# is provably triple-free at scale: the basket census shows zero
# partkey triples with support >= 2 at sf0.1 (the keyspace grows with
# SF while basket sizes stay ~4), so an L3 over partkeys would be a
# vacuous lane. Brand baskets (order x distinct p_brand, |vocab| = 25)
# keep the same valve posture (baskets > {MINE3_MAX_BASKET_ITEMS}
# dropped BEFORE enumeration) and use the literature's RELATIVE
# minsup — support >= {MINE3_MINSUP_BP} basis points of baskets —
# which stays selective at every SF where any absolute constant goes
# vacuous (probed: ~44%/40%/47% of candidate triples survive at the
# three fixture SFs).
#
# Anti-monotonic prune chain (exactness: a triple at support s has
# every subset at support >= s, so pruning to L1/L2 survivors drops
# only infrequent triples — output equals the oracle's unpruned
# HAVING): L1 semi-join on items -> pair occurrences semi-joined to
# the L2 SURVIVOR SET (broadcast: <= C(25,2) rows) -> third-item
# extension semi-joined to L2 on BOTH new faces (a,c) and (b,c) ->
# one partial-agg shuffle on the triple key. Triple mass after the
# valve is bounded by cap^3/6 per basket — linear in baskets.
# Thresholds cross-multiply (support * 10000 vs bp * n) with the
# family's widened decimal/HUGEINT products — no division, exact.
#
# The pair enumeration is deliberately evaluated TWICE (once under
# the support aggregation, once as the extension's occ2 input): both
# copies read the PERSISTED basket frame (its scan is the plan's
# InMemoryTableScan on every reference) and the valve bounds the
# enumeration, so recomputing it is a bounded map+join over cached
# blocks — persisting the (o, a, b) pair frame instead would
# materialize the full pair mass, a far larger footprint than the
# recompute at any scale where the valve is doing its job.
MINE3_MAX_BASKET_ITEMS = 8
MINE3_MINSUP_BP = 30  # 0.30% of baskets, in basis points

_BRAND_BASKET_CACHE: dict[tuple[str, str], DataFrame] = {}


def _brand_basket_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (order o, brand i) baskets with the hot-basket valve
    applied; persisted + cached like _basket_frame."""
    import os

    from pyspark import StorageLevel

    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    cached = _BRAND_BASKET_CACHE.get(key)
    if cached is not None:
        return cached
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), "l_partkey"
    )
    pt = t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), F.col("p_brand").alias("i")
    )
    b0 = li.join(pt, "l_partkey").select("o", "i").distinct()
    keep = (
        b0.groupBy("o")
        .agg(F.count(F.lit(1)).alias("k"))
        .filter(F.col("k") <= MINE3_MAX_BASKET_ITEMS)
        .select("o")
    )
    df = b0.join(keep, "o", "semi").persist(StorageLevel.MEMORY_AND_DISK)
    _BRAND_BASKET_CACHE[key] = df
    return df


def _minsup_filter(support_col, n_baskets: int):
    """support >= MINE3_MINSUP_BP bp of n_baskets, as a widened
    integer cross-multiplication (the family's overflow protocol)."""
    return (
        support_col.cast("decimal(19,0)") * F.lit(10000).cast("decimal(19,0)")
        >= F.lit(n_baskets).cast("decimal(19,0)")
        * F.lit(MINE3_MINSUP_BP).cast("decimal(19,0)")
    )


def _triple_support(
    b: DataFrame, n_baskets: int
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(L3 triple support, L2 pair support, L1 item counts) over an
    already-materialized capped basket frame — the shared spine of the
    triples and rules lanes."""
    cnt1 = b.groupBy("i").agg(F.count(F.lit(1)).alias("cnt"))
    l1 = cnt1.filter(_minsup_filter(F.col("cnt"), n_baskets)).select("i")
    bf = b.join(F.broadcast(l1), "i", "semi")
    # Lazy localCheckpoint: pair_occ feeds THREE consumers in one
    # action (the sup2 aggregation lineage, the broadcast L2 survivor
    # set derived from sup2, and the occ2 probe side), so without a
    # reuse boundary the basket self-join executes three times per
    # lane. The l2 broadcast job materializes the blocks first; the
    # other consumers read them (guide §2.4; measured interleaved A/B
    # at sf0.1: mine_closed_pairs med 3.37 -> 3.09 s,
    # mine_frequent_triples 1.78 -> 1.55 s, outputs row-identical).
    pair_occ = (
        bf.alias("x")
        .join(
            bf.alias("y"),
            (F.col("x.o") == F.col("y.o")) & (F.col("x.i") < F.col("y.i")),
        )
        .select(
            F.col("x.o").alias("o"),
            F.col("x.i").alias("a"),
            F.col("y.i").alias("b"),
        )
        .transform(cut_lineage)
    )
    sup2 = (
        pair_occ.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("pair_support"))
        .filter(_minsup_filter(F.col("pair_support"), n_baskets))
    )
    l2 = sup2.select("a", "b")
    # the L2-SURVIVOR semi-joins (plan-pinned in tests/test_mining_l3):
    # only pair occurrences whose pair is frequent extend to a third
    # item, and the two new faces (a,c) and (b,c) must be L2 too
    occ2 = pair_occ.join(F.broadcast(l2), ["a", "b"], "semi")
    occ3 = (
        occ2.alias("w")
        .join(
            bf.alias("z"),
            (F.col("w.o") == F.col("z.o"))
            & (F.col("z.i") > F.col("w.b")),
        )
        .select(
            F.col("w.o").alias("o"), F.col("w.a").alias("a"),
            F.col("w.b").alias("b"), F.col("z.i").alias("c"),
        )
        .join(
            F.broadcast(l2.select(F.col("a").alias("__fa"),
                                  F.col("b").alias("__fc"))),
            (F.col("a") == F.col("__fa")) & (F.col("c") == F.col("__fc")),
            "semi",
        )
        .join(
            F.broadcast(l2.select(F.col("a").alias("__fb"),
                                  F.col("b").alias("__fc2"))),
            (F.col("b") == F.col("__fb")) & (F.col("c") == F.col("__fc2")),
            "semi",
        )
    )
    sup3 = (
        occ3.groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(_minsup_filter(F.col("support"), n_baskets))
    )
    return sup3, sup2, cnt1


def mine_frequent_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent brand triples across order baskets (A-Priori L3 with
    the L1/L2 anti-monotonic prune). Returns (brand_a, brand_b,
    brand_c, support)."""
    b = _brand_basket_frame(spark, sf_dir)
    n_baskets = b.select("o").distinct().count()  # materializes b
    sup3, _, _ = _triple_support(b, n_baskets)
    return sup3.select(
        F.col("a").alias("brand_a"),
        F.col("b").alias("brand_b"),
        F.col("c").alias("brand_c"),
        "support",
    )


def mine_triple_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule generation over the frequent triples: every {x,y} -> z
    direction (3 per triple, one explode pass — the
    mine_association_rules pattern) with exact-integer confidence =
    support(xyz)/support({x,y}) and lift = support(xyz)*n /
    (support({x,y}) * count(z)). Returns (ant_a, ant_b, consequent,
    support, confidence, lift)."""
    b = _brand_basket_frame(spark, sf_dir)
    n_baskets = b.select("o").distinct().count()  # materializes b
    sup3, sup2, cnt1 = _triple_support(b, n_baskets)
    d = "decimal(19,0)"
    rules = sup3.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("a").alias("ant_a"), F.col("b").alias("ant_b"),
                    F.col("c").alias("consequent"),
                ),
                F.struct(
                    F.col("a").alias("ant_a"), F.col("c").alias("ant_b"),
                    F.col("b").alias("consequent"),
                ),
                F.struct(
                    F.col("b").alias("ant_a"), F.col("c").alias("ant_b"),
                    F.col("a").alias("consequent"),
                ),
            )
        ).alias("r"),
        "support",
    ).select("r.ant_a", "r.ant_b", "r.consequent", "support")
    return (
        rules.join(
            F.broadcast(
                sup2.select(
                    F.col("a").alias("ant_a"), F.col("b").alias("ant_b"),
                    "pair_support",
                )
            ),
            ["ant_a", "ant_b"],
        )
        .join(
            F.broadcast(cnt1.withColumnRenamed("i", "consequent")),
            "consequent",
        )
        .select(
            "ant_a", "ant_b", "consequent", "support",
            (F.col("support") / F.col("pair_support") + F.lit(0.0)).alias(
                "confidence"
            ),
            (
                (F.col("support").cast(d) * F.lit(n_baskets).cast(d))
                .cast("double")
                / (F.col("pair_support").cast(d) * F.col("cnt").cast(d))
                .cast("double")
            ).alias("lift"),
        )
    )


_BRAND_BASKET_SQL = f"""b0 AS (
  SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS i
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
keep AS (
  SELECT o FROM b0 GROUP BY o
  HAVING count(*) <= {MINE3_MAX_BASKET_ITEMS}
),
b AS (SELECT * FROM b0 WHERE o IN (SELECT o FROM keep)),
nb AS (SELECT count(DISTINCT o) AS n FROM b),
tr AS (
  SELECT x.i AS a, y.i AS b, z.i AS c, CAST(count(*) AS BIGINT) AS support
  FROM b x
  JOIN b y ON x.o = y.o AND x.i < y.i
  JOIN b z ON y.o = z.o AND y.i < z.i
  GROUP BY x.i, y.i, z.i
  HAVING CAST(count(*) AS HUGEINT) * 10000
         >= CAST({MINE3_MINSUP_BP} AS HUGEINT) * (SELECT n FROM nb)
)"""


ORACLE_FREQ_TRIPLES = f"""
WITH {_BRAND_BASKET_SQL}
SELECT a AS brand_a, b AS brand_b, c AS brand_c, support FROM tr
"""


ORACLE_TRIPLE_RULES = f"""
WITH {_BRAND_BASKET_SQL},
pr AS (
  SELECT x.i AS a, y.i AS b, CAST(count(*) AS BIGINT) AS pair_support
  FROM b x JOIN b y ON x.o = y.o AND x.i < y.i
  GROUP BY x.i, y.i
  HAVING CAST(count(*) AS HUGEINT) * 10000
         >= CAST({MINE3_MINSUP_BP} AS HUGEINT) * (SELECT n FROM nb)
),
cnt AS (SELECT i, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY i),
rules AS (
  SELECT a AS ant_a, b AS ant_b, c AS consequent, support FROM tr
  UNION ALL
  SELECT a, c, b, support FROM tr
  UNION ALL
  SELECT b, c, a, support FROM tr
)
SELECT r.ant_a, r.ant_b, r.consequent, r.support,
       (CAST(r.support AS DOUBLE) / p.pair_support) + 0.0 AS confidence,
       CAST(CAST(r.support AS HUGEINT) * (SELECT n FROM nb) AS DOUBLE)
       / CAST(CAST(p.pair_support AS HUGEINT) * c.c AS DOUBLE) AS lift
FROM rules r
JOIN pr p ON p.a = r.ant_a AND p.b = r.ant_b
JOIN cnt c ON c.i = r.consequent
"""


def mine_brand_basket_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The read-first number for the BRAND item domain (the
    link_block_census / mine_basket_census pattern, completing the
    census -> pick cap -> capped run discipline for the L3 family):
    PRE-valve brand-basket size histogram with each size's
    k*(k-1)*(k-2)/6 * n TRIPLE mass — the number that justifies
    MINE3_MAX_BASKET_ITEMS before any enumeration runs. Widened
    products per the family's overflow protocol. Returns
    (basket_items, n_baskets, pair_mass, triple_mass)."""
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), "l_partkey"
    )
    pt = t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), F.col("p_brand").alias("i")
    )
    sizes = (
        li.join(pt, "l_partkey")
        .select("o", "i")
        .distinct()
        .groupBy("o")
        .agg(F.count(F.lit(1)).alias("basket_items"))
    )
    d = "decimal(19,0)"
    tri2 = F.expr("basket_items * (basket_items - 1) div 2").cast(d)
    tri3 = F.expr(
        "basket_items * (basket_items - 1) * (basket_items - 2) div 6"
    ).cast(d)
    return (
        sizes.groupBy("basket_items")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
        .select(
            "basket_items",
            "n_baskets",
            (tri2 * F.col("n_baskets").cast(d))
            .try_cast("long")
            .alias("pair_mass"),
            (tri3 * F.col("n_baskets").cast(d))
            .try_cast("long")
            .alias("triple_mass"),
        )
    )


ORACLE_BRAND_CENSUS = """
WITH b0 AS (
  SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS i
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
s AS (SELECT o, CAST(count(*) AS BIGINT) AS basket_items FROM b0 GROUP BY o)
SELECT basket_items, CAST(count(*) AS BIGINT) AS n_baskets,
       CAST(CAST(basket_items * (basket_items - 1) // 2 AS HUGEINT)
            * count(*) AS BIGINT) AS pair_mass,
       CAST(CAST(basket_items * (basket_items - 1) * (basket_items - 2) // 6
                 AS HUGEINT)
            * count(*) AS BIGINT) AS triple_mass
FROM s GROUP BY basket_items
"""


MINE_ML_MAX_BASKET_ITEMS = 12  # multi-level baskets run larger


_ML_BASKET_CACHE: dict[tuple[str, str], DataFrame] = {}


def _multilevel_basket_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-LEVEL baskets (Srikant & Agrawal 1995, generalized
    association rules): each order's items are its distinct brands
    PLUS the derived brand LINE (the deterministic prefix family
    'Line#<first digit>' — a true functional dependency brand -> line,
    which is what makes closure analysis non-vacuous: an item implied
    by another is co-present in every basket, so pairs extend to
    equal-support triples). Valve at {MINE_ML_MAX_BASKET_ITEMS};
    persisted + cached like the other basket frames."""
    import os

    from pyspark import StorageLevel

    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    cached = _ML_BASKET_CACHE.get(key)
    if cached is not None:
        return cached
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), "l_partkey"
    )
    pt = t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    j = li.join(pt, "l_partkey")
    b0 = (
        j.select("o", F.col("p_brand").alias("i"))
        .unionByName(
            j.select(
                "o",
                F.concat(
                    F.lit("Line#"), F.substring("p_brand", 7, 1)
                ).alias("i"),
            )
        )
        .distinct()
    )
    keep = (
        b0.groupBy("o")
        .agg(F.count(F.lit(1)).alias("k"))
        .filter(F.col("k") <= MINE_ML_MAX_BASKET_ITEMS)
        .select("o")
    )
    df = b0.join(keep, "o", "semi").persist(StorageLevel.MEMORY_AND_DISK)
    _ML_BASKET_CACHE[key] = df
    return df


def mine_closed_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLOSED frequent pairs (Zaki & Hsiao 2002, CHARM — the lossless
    compression of the frequent-itemset output) over the MULTI-LEVEL
    brand/line item domain: a frequent pair is closed iff NO extension
    item keeps its support, i.e. no frequent triple containing the
    pair has EQUAL support. On a hierarchy most pairs are NOT closed
    (any pair containing a brand extends with that brand's implied
    line at identical support) — exactly the redundancy closed-set
    mining exists to strip; the closed survivors carry all the
    support information. Exactness: an equal-support witness triple
    necessarily clears the same relative minsup the pair cleared, so
    the threshold-filtered L3 frame provably contains every witness.
    Returns (item_a, item_b, support, closed).

    Plan: rides the shared _triple_support spine (cached multi-level
    basket frame, broadcast survivor gates); the closure test is one
    left join of the vocabulary-sized pair frame against the distinct
    face projection of the triple frame — broadcast-sized."""
    b = _multilevel_basket_frame(spark, sf_dir)
    n_baskets = b.select("o").distinct().count()  # materializes b
    sup3, sup2, _ = _triple_support(b, n_baskets)
    faces = (
        sup3.select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("fa"), F.col("b").alias("fb")),
                    F.struct(F.col("a").alias("fa"), F.col("c").alias("fb")),
                    F.struct(F.col("b").alias("fa"), F.col("c").alias("fb")),
                )
            ).alias("f"),
            F.col("support").alias("tsup"),
        )
        .select("f.fa", "f.fb", "tsup")
        .distinct()
    )
    return (
        sup2.join(
            F.broadcast(faces),
            (F.col("a") == F.col("fa"))
            & (F.col("b") == F.col("fb"))
            & (F.col("pair_support") == F.col("tsup")),
            "left",
        )
        .select(
            F.col("a").alias("item_a"),
            F.col("b").alias("item_b"),
            F.col("pair_support").alias("support"),
            F.col("fa").isNull().alias("closed"),
        )
    )


_ML_BASKET_SQL = f"""b0 AS (
  SELECT DISTINCT o, i FROM (
    SELECT l.l_orderkey AS o, p.p_brand AS i
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    UNION ALL
    SELECT l.l_orderkey, 'Line#' || substring(p.p_brand, 7, 1)
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  )
),
keep AS (
  SELECT o FROM b0 GROUP BY o
  HAVING count(*) <= {MINE_ML_MAX_BASKET_ITEMS}
),
b AS (SELECT * FROM b0 WHERE o IN (SELECT o FROM keep)),
nb AS (SELECT count(DISTINCT o) AS n FROM b)"""


ORACLE_CLOSED_PAIRS = f"""
WITH {_ML_BASKET_SQL},
pr AS (
  SELECT x.i AS a, y.i AS b, CAST(count(*) AS BIGINT) AS pair_support
  FROM b x JOIN b y ON x.o = y.o AND x.i < y.i
  GROUP BY x.i, y.i
  HAVING CAST(count(*) AS HUGEINT) * 10000
         >= CAST({MINE3_MINSUP_BP} AS HUGEINT) * (SELECT n FROM nb)
),
tr AS (
  SELECT x.i AS a, y.i AS b, z.i AS c, CAST(count(*) AS BIGINT) AS s
  FROM b x
  JOIN b y ON x.o = y.o AND x.i < y.i
  JOIN b z ON y.o = z.o AND y.i < z.i
  GROUP BY x.i, y.i, z.i
  HAVING CAST(count(*) AS HUGEINT) * 10000
         >= CAST({MINE3_MINSUP_BP} AS HUGEINT) * (SELECT n FROM nb)
),
faces AS (
  SELECT DISTINCT fa, fb, tsup FROM (
    SELECT a AS fa, b AS fb, s AS tsup FROM tr
    UNION ALL
    SELECT a, c, s FROM tr
    UNION ALL
    SELECT b, c, s FROM tr
  )
)
SELECT p.a AS item_a, p.b AS item_b, p.pair_support AS support,
       f.fa IS NULL AS closed
FROM pr p
LEFT JOIN faces f
  ON f.fa = p.a AND f.fb = p.b AND f.tsup = p.pair_support
"""


def mine_rule_interest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENERALIZED-rule interest (Srikant & Agrawal, VLDB 1995 §4 —
    multi-level association mining's pruning measure): a brand-level
    pair is only informative beyond its LINE-level ancestor if its
    support deviates from the ancestor-expected value
    sup(anc) * (sup(a)/sup(line_a)) * (sup(b)/sup(line_b)); the lane
    emits that ratio for every frequent cross-line brand pair
    (same-line pairs have no 2-item ancestor — their lines coincide).
    At fixture scale the ratios concentrate near 1.0 exactly as the
    independence model predicts for uniform TPC-H baskets — the
    MEASURE is the output contract, thresholding is the consumer's
    R knob (the paper's R-interest), so no boolean is emitted that
    would go vacuous as SF grows.

    Cross-engine exactness: the ratio is ONE division of two widened
    exact-integer products (decimal(38,0) / HUGEINT — the family's
    overflow protocol; a triple count product reaches ~3.4e33 at
    TPC-H-100TB basket counts, far past int64).

    Returns (item_a, item_b, support, anc_a, anc_b, anc_support,
    interest)."""
    b = _multilevel_basket_frame(spark, sf_dir)
    n_baskets = b.select("o").distinct().count()  # materializes b
    cnt1 = b.groupBy("i").agg(F.count(F.lit(1)).alias("cnt"))
    sup2 = (
        b.alias("x")
        .join(
            b.alias("y"),
            (F.col("x.o") == F.col("y.o")) & (F.col("x.i") < F.col("y.i")),
        )
        .select(F.col("x.i").alias("a"), F.col("y.i").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("s"))
        .filter(_minsup_filter(F.col("s"), n_baskets))
    )
    line = lambda c: F.concat(F.lit("Line#"), F.substring(c, 7, 1))
    bp = sup2.filter(
        F.col("a").startswith("Brand#")
        & F.col("b").startswith("Brand#")
        & (F.substring("a", 7, 1) != F.substring("b", 7, 1))
    ).select(
        "a", "b", "s",
        line(F.col("a")).alias("la"),
        line(F.col("b")).alias("lb"),
    )
    anc = sup2.select(
        F.col("a").alias("anc_a"), F.col("b").alias("anc_b"),
        F.col("s").alias("anc_s"),
    )
    d = "decimal(19,0)"

    def c(name, alias):
        return F.broadcast(
            cnt1.select(
                F.col("i").alias(name), F.col("cnt").alias(alias)
            )
        )

    j = (
        bp.withColumn("anc_a", F.least("la", "lb"))
        .withColumn("anc_b", F.greatest("la", "lb"))
        .join(F.broadcast(anc), ["anc_a", "anc_b"])
        .join(c("a", "c_a"), "a")
        .join(c("b", "c_b"), "b")
        .join(c("la", "c_la"), "la")
        .join(c("lb", "c_lb"), "lb")
    )
    num = (F.col("s").cast(d) * F.col("c_la").cast(d)) * F.col(
        "c_lb"
    ).cast(d)
    den = (F.col("anc_s").cast(d) * F.col("c_a").cast(d)) * F.col(
        "c_b"
    ).cast(d)
    return j.select(
        F.col("a").alias("item_a"),
        F.col("b").alias("item_b"),
        F.col("s").alias("support"),
        "anc_a",
        "anc_b",
        F.col("anc_s").alias("anc_support"),
        (num.cast("double") / den.cast("double")).alias("interest"),
    )


ORACLE_RULE_INTEREST = f"""
WITH {_ML_BASKET_SQL},
cnt AS (SELECT i, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY i),
pr AS (
  SELECT x.i AS a, y.i AS b, CAST(count(*) AS BIGINT) AS s
  FROM b x JOIN b y ON x.o = y.o AND x.i < y.i
  GROUP BY x.i, y.i
  HAVING CAST(count(*) AS HUGEINT) * 10000
         >= CAST({MINE3_MINSUP_BP} AS HUGEINT) * (SELECT n FROM nb)
),
bp AS (
  SELECT a, b, s,
         'Line#' || substring(a, 7, 1) AS la,
         'Line#' || substring(b, 7, 1) AS lb
  FROM pr
  WHERE a LIKE 'Brand#%' AND b LIKE 'Brand#%'
    AND substring(a, 7, 1) <> substring(b, 7, 1)
)
SELECT bp.a AS item_a, bp.b AS item_b, bp.s AS support,
       least(bp.la, bp.lb) AS anc_a, greatest(bp.la, bp.lb) AS anc_b,
       anc.s AS anc_support,
       CAST(CAST(bp.s AS HUGEINT) * cla.c * clb.c AS DOUBLE)
       / CAST(CAST(anc.s AS HUGEINT) * ca.c * cb.c AS DOUBLE)
         AS interest
FROM bp
JOIN pr anc ON anc.a = least(bp.la, bp.lb)
           AND anc.b = greatest(bp.la, bp.lb)
JOIN cnt ca ON ca.i = bp.a
JOIN cnt cb ON cb.i = bp.b
JOIN cnt cla ON cla.i = bp.la
JOIN cnt clb ON clb.i = bp.lb
"""


# ---- FP-Growth: candidate-generation-free mining (round 14) ----
#
# Round-13 verdict item 2: the A-Priori family's scale posture rests
# on the hot-basket valve bounding the within-basket self-join; the
# literature's answer to pair/triple candidate mass WITHOUT that
# join is FP-Growth (Han, Pei & Yin 2000), sharded as Parallel
# FP-Growth (Li et al. 2008) — operators/fpgrowth.py. The lane mines
# ALL frequent itemsets of size 1..3 over the SAME capped brand
# basket frame and relative minsup as the L3 tier, so its L2/L3
# slices provably EQUAL mine_frequent_pairs'/_triples' outputs
# (equality pinned in tests/test_fpgrowth.py; the shared
# _brand_basket_frame persist makes the inputs identical by
# construction). No within-basket self-join appears anywhere in the
# executed plan (plan-pinned): transactions project into per-group
# conditional prefixes map-side, ONE exchange groups them, and each
# group mines its conditional FP-tree locally.
#
# The minsup gate is the SAME relative threshold, materialized as an
# exact integer: support*10000 >= bp*n  <=>  support >= ceil(bp*n /
# 10000) — integer ceiling division, no float. Output is
# (itemset, size, support): pure integers + strings, so there is no
# cross-engine decision margin to probe anywhere in this lane.


def mine_fpgrowth_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All frequent brand itemsets (sizes 1..3) by FP-Growth over the
    capped brand baskets — candidate-generation-free; equals the
    A-Priori lanes level-by-level. Returns (itemset — lexicographic
    comma-joined, size, support)."""
    from ..operators.fpgrowth import fpgrowth_itemsets

    b = _brand_basket_frame(spark, sf_dir)
    n_baskets = b.select("o").distinct().count()  # materializes b
    minsup = -(-MINE3_MINSUP_BP * n_baskets // 10000)  # exact int ceil
    return fpgrowth_itemsets(b, minsup, max_len=3)


# The oracle enumerates each level relationally (the quadratic/cubic
# twin is the usual oracle posture — the Spark side is what must
# avoid it); brand strings compare bytewise in both engines, so the
# a < b < c chains emit the same lexicographically-sorted itemsets
# the lane's sorted-join produces.
ORACLE_FPGROWTH = f"""
WITH {_BRAND_BASKET_SQL},
l1 AS (
  SELECT i, CAST(count(*) AS BIGINT) AS support
  FROM b GROUP BY i
  HAVING CAST(count(*) AS HUGEINT) * 10000
         >= CAST({MINE3_MINSUP_BP} AS HUGEINT) * (SELECT n FROM nb)
),
l2 AS (
  SELECT x.i AS a, y.i AS b2, CAST(count(*) AS BIGINT) AS support
  FROM b x JOIN b y ON x.o = y.o AND x.i < y.i
  GROUP BY x.i, y.i
  HAVING CAST(count(*) AS HUGEINT) * 10000
         >= CAST({MINE3_MINSUP_BP} AS HUGEINT) * (SELECT n FROM nb)
)
SELECT i AS itemset, CAST(1 AS INT) AS size, support FROM l1
UNION ALL
SELECT a || ',' || b2, CAST(2 AS INT), support FROM l2
UNION ALL
SELECT a || ',' || b || ',' || c, CAST(3 AS INT), support FROM tr
"""
