"""FP-Growth frequent-itemset mining (Han, Pei & Yin 2000), sharded
Spark-first as Parallel FP-Growth (Li et al. 2008, PFP) — the
candidate-generation-FREE counterpart of the A-Priori lanes in
queries/lanes_layout.py (round-13 verdict item 2).

Why this exists alongside A-Priori: the L2/L3 lanes' scale posture
rests on the hot-basket valve bounding the within-basket self-join's
candidate mass. FP-Growth removes the candidate join entirely — each
transaction is projected into per-item-group CONDITIONAL transactions
(map-side explode), one shuffle groups them by item group, and each
group's partition mines its conditional FP-tree locally, emitting
only itemsets whose least-frequent item belongs to the group (so the
group outputs are disjoint by construction and no cross-partition
dedup is needed). No within-basket self-join exists anywhere in the
plan (plan-pinned in tests/test_fpgrowth.py).

100 TB posture:
- the f-list (item -> frequency rank) is O(vocabulary) MODEL STATE on
  the driver, exactly like the IVF centroids; PFP shards it when the
  vocabulary itself outgrows one machine;
- the projection shuffle carries, per transaction of k frequent
  items, its k group-prefixes (<= k(k+1)/2 item copies, bounded by
  the caller's basket valve) — comparable mass to the pair self-join
  but as ONE partial-free groupBy exchange with no join build sides;
- group mining is embarrassingly parallel across the item groups and
  touches only that group's conditional transactions (the PFP
  locality argument).

Everything is integer-exact: supports are counts, the minsup gate is
the caller's (absolute count or cross-multiplied relative threshold),
and the output (itemset string, size, support) involves no float —
there is NO cross-engine decision margin to probe.
"""

from __future__ import annotations

from collections import defaultdict

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mine_conditional(
    cond: list[tuple[tuple[int, ...], int]],
    minsup: int,
    suffix: tuple[int, ...],
    max_len: int,
    out: list[tuple[tuple[int, ...], int]],
) -> None:
    """Recursive FP-growth over a conditional pattern base: ``cond``
    is a list of (prefix-path items ordered by ascending f-rank,
    count). For every item frequent IN THIS CONDITIONAL BASE, emit
    suffix+{item} and recurse on the base projected below that item.
    Item iteration is bottom-up (descending rank = ascending
    frequency), the classic FP-growth order; output content is
    order-independent, so the order only fixes traversal cost."""
    cnt: dict[int, int] = defaultdict(int)
    for items, c in cond:
        for it in items:
            cnt[it] += c
    for it in sorted((i for i, c in cnt.items() if c >= minsup), reverse=True):
        new_suffix = (it, *suffix)
        out.append((new_suffix, cnt[it]))
        if len(new_suffix) >= max_len:
            continue
        # conditional base of `it`: the strict prefixes (ranks < it)
        # of every path containing it, compressed by identical prefix
        proj: dict[tuple[int, ...], int] = defaultdict(int)
        for items, c in cond:
            if it in items:
                pre = tuple(x for x in items if x < it)
                if pre:
                    proj[pre] += c
        if proj:
            _mine_conditional(
                list(proj.items()), minsup, new_suffix, max_len, out
            )


def fpgrowth_itemsets(
    baskets: DataFrame,
    minsup_count: int,
    max_len: int = 3,
    basket_col: str = "o",
    item_col: str = "i",
) -> DataFrame:
    """All frequent itemsets of size 1..max_len over a distinct
    (basket, item) frame, support >= ``minsup_count`` — FP-Growth,
    no candidate generation, no within-basket self-join.

    Returns (itemset string — items sorted lexicographically and
    comma-joined, size, support). The output SET is provably equal to
    A-Priori's at every level (both compute exact support over the
    same frame; pinned against _mine_pairs/_triple_support in
    tests/test_fpgrowth.py).

    Plan: one groupBy(basket) to form transactions (map-side
    collect_list), a map-side per-group prefix explode, ONE shuffle
    on the item group, then applyInPandas local tree mining per
    group. The f-list is collected to the driver (vocabulary-sized
    model state)."""
    if minsup_count < 1:
        raise ValueError("minsup_count must be >= 1")
    # f-list: frequency-ranked vocabulary of minsup survivors
    # (anti-monotonicity: an item below minsup is in no frequent
    # itemset). Rank ties break on the item value — any total order
    # works, the output set is order-invariant.
    flist = (
        baskets.groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= minsup_count)
        .orderBy(F.desc("cnt"), F.asc(item_col))
        .collect()
    )
    rank_of = {r[0]: j for j, r in enumerate(flist)}
    item_of = {j: r[0] for j, r in enumerate(flist)}
    if not rank_of:
        return baskets.sparkSession.createDataFrame(
            [], "itemset string, size int, support long"
        )
    rank_map = F.create_map(
        *[F.lit(v) for item, j in rank_of.items() for v in (item, j)]
    )
    # transactions as sorted rank arrays (infrequent items vanish
    # here — the only pruning FP-growth needs)
    tx = (
        baskets.select(
            basket_col, rank_map[F.col(item_col)].alias("r")
        )
        .filter(F.col("r").isNotNull())
        .groupBy(basket_col)
        .agg(F.array_sort(F.collect_list("r")).alias("tx"))
    )
    # PFP projection: one conditional prefix per (transaction, group);
    # group g receives the prefix ending at the transaction's item of
    # rank g. posexplode keeps the prefix = slice(1, pos+1) map-side.
    proj = tx.select(
        F.posexplode("tx").alias("pos", "grp"),
        F.slice("tx", 1, F.col("pos") + 1).alias("prefix"),
    ).select("grp", "prefix")

    def mine(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        # applyInPandas, NOT mapInPandas: the engine guarantees one
        # call per group with ALL its conditional transactions — an
        # Arrow-batch split mid-group would mine partial supports
        g = int(key[0])
        # compress identical prefixes (they are the tree's shared
        # paths), then mine itemsets ENDING at g: emit {g} itself,
        # recurse on the strict prefixes
        base: dict[tuple[int, ...], int] = defaultdict(int)
        n_g = 0
        for arr in pdf["prefix"]:
            items = tuple(int(x) for x in arr)
            assert items[-1] == g
            n_g += 1
            pre = items[:-1]
            if pre:
                base[pre] += 1
        found: list[tuple[tuple[int, ...], int]] = [((g,), n_g)]
        if max_len > 1 and base:
            _mine_conditional(
                list(base.items()), minsup_count, (g,), max_len, found
            )
        rows = [
            # stringify BEFORE the sort: itemset items are rendered
            # as strings and ordered bytewise, the same total order a
            # SQL twin's varchar `<` chain produces
            (
                ",".join(sorted(str(item_of[r]) for r in iset)),
                len(iset),
                sup,
            )
            for iset, sup in found
            if sup >= minsup_count
        ]
        return pd.DataFrame(rows, columns=["itemset", "size", "support"])

    return proj.groupBy("grp").applyInPandas(
        mine, schema="itemset string, size int, support long"
    )
