"""Snapshot diff / table reconciliation — the audit op an ETL engine
runs between two loads of the same dimension (regression-diff a
re-run, verify a backfill, drive an incremental publish). The
reference's medallion flow overwrites dims wholesale
(`SURVEY.md §3.2`), so "what changed since yesterday" is exactly the
operator it lacks.

One full-outer hash join on the key, all comparisons null-safe and
JVM-side. Output is keyed rows with ``diff_status`` in
{'added', 'removed', 'changed', 'unchanged'} and ``changed_cols`` — a
comma-joined, declaration-ordered list of the columns whose values
differ (empty for everything but 'changed').

Scale posture: one shuffle (the join); both sides prune to
key + compared columns before the exchange; the status/changed-cols
expressions are a flat CASE chain inside whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level diff of two snapshots keyed by ``key_cols``.

    ``compare_cols`` defaults to every shared non-key column. Returns
    one row per key present in either side: the key columns, each
    compared column's old/new pair (``<col>_old`` / ``<col>_new``),
    ``diff_status`` and ``changed_cols``.
    """
    keys = list(key_cols)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    cmp_cols = list(compare_cols)
    if not cmp_cols:
        raise ValueError("no columns to compare")

    o = old.select(
        *keys,
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"{c}_old") for c in cmp_cols],
    )
    n = new.select(
        *keys,
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"{c}_new") for c in cmp_cols],
    )
    j = o.join(n, keys, "full_outer")

    col_changed = {
        c: ~F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))
        for c in cmp_cols
    }
    any_changed = F.lit(False)
    for c in cmp_cols:
        any_changed = any_changed | col_changed[c]
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(any_changed, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    changed_list = F.concat_ws(
        ",",
        *[
            F.when(col_changed[c], F.lit(c)).otherwise(F.lit(None))
            for c in cmp_cols
        ],
    )
    return j.select(
        *keys,
        *[F.col(f"{c}_old") for c in cmp_cols],
        *[F.col(f"{c}_new") for c in cmp_cols],
        status.alias("diff_status"),
        F.when(status == "changed", changed_list)
        .otherwise(F.lit(""))
        .alias("changed_cols"),
    )
