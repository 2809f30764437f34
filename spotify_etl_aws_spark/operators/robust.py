"""Robust per-group outlier detection (north-star, SURVEY.md §2.11c
adjacent — the data-quality / monitoring primitive): flag values whose
deviation from their group's MEDIAN exceeds k times the group's MAD
(median absolute deviation). The median/MAD pair is the standard
robust alternative to mean/stddev — a single wild value cannot drag
the threshold the way it drags a z-score, which is exactly what makes
it the pipeline-monitoring default (Leys et al. 2013, JESP).

Exactness contract: medians are DISCRETE (percentile_disc semantics —
the element at 1-indexed rank ceil(n/2) of the sorted group), so on
integer inputs every comparison is exact int64 arithmetic and the
DuckDB twin matches bit-for-bit; no interpolation, no float margins.

Scale shape: exact per-group medians need one shuffle on the group
key; the operator does window-rank over (group, value) for the
median, joins back (same key — AQE reuses the exchange), repeats once
for the MAD, filters map-side. All JVM expressions, no UDF. At
warehouse scale the drop-in approximation is ``mad_outliers_approx``:
``percentile_approx`` per group (the Greenwald–Khanna summary —
sketch-mergeable, one PARTIAL-AGG pass per median, no window-rank
shuffle of the full rows), same output columns, so swapping is a
one-line change. The sketch guarantee is a RANK envelope (the
returned value is a group element whose rank is within n/accuracy of
the true median rank — exact whenever the group is smaller than
``accuracy``), pinned in tests and emitted as a deterministic
contract lane.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _group_disc_median(
    df: DataFrame, group_col: str, value_col: str, out_col: str
) -> DataFrame:
    """(group, <discrete median of value>) — the element at rank
    ceil(n/2) ascending (ties collapse to the same value, so the
    within-rank order is irrelevant)."""
    w = Window.partitionBy(group_col).orderBy(value_col)
    ranked = df.select(
        group_col,
        value_col,
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy(group_col)).alias("__n"),
    )
    return (
        ranked.filter(F.col("__rn") == F.ceil(F.col("__n") / 2))
        .select(
            F.col(group_col),
            F.col(value_col).alias(out_col),
            F.col("__n").alias("__group_n"),
        )
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    k: int = 3,
    min_group: int = 5,
) -> DataFrame:
    """Rows whose |value - median(group)| > k * MAD(group), for groups
    of at least ``min_group`` rows. Returns (group, id, value, med,
    mad, abs_dev) for the flagged rows only. Integer exact: MAD = 0
    (over half the group shares one value) flags ANY deviation — the
    conventional semantics, identical on both engines."""
    base = df.select(group_col, id_col, value_col)
    med = _group_disc_median(base, group_col, value_col, "med").filter(
        F.col("__group_n") >= min_group
    )
    dev = base.join(med, group_col).select(
        group_col,
        id_col,
        value_col,
        "med",
        F.abs(F.col(value_col) - F.col("med")).alias("abs_dev"),
    )
    mad = _group_disc_median(dev, group_col, "abs_dev", "mad").select(
        group_col, "mad"
    )
    return (
        dev.join(mad, group_col)
        .filter(F.col("abs_dev") > k * F.col("mad"))
        .select(group_col, id_col, value_col, "med", "mad", "abs_dev")
    )


def mad_outliers_approx(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    k: int = 3,
    min_group: int = 5,
    accuracy: int = 10_000,
) -> DataFrame:
    """Warehouse-scale twin of ``mad_outliers``: identical output
    columns, but each per-group median comes from
    ``percentile_approx`` (Greenwald–Khanna summaries that build
    map-side and MERGE — one partial-aggregating shuffle of sketch
    rows per median) instead of a window-rank over the full rows.

    Contract: the sketch returns an ACTUAL group element whose rank is
    within ``n / accuracy`` of the true median rank, so for every
    group smaller than ``accuracy`` the result is EXACT and equals
    ``mad_outliers`` row-for-row (pinned in tests); above that, med
    and mad each drift by at most the rank envelope and the flagged
    set shifts only for rows whose deviation sits within that margin
    of the k*MAD threshold."""
    base = df.select(group_col, id_col, value_col)
    med = (
        base.groupBy(group_col)
        .agg(
            F.percentile_approx(value_col, F.lit(0.5), F.lit(accuracy)).alias(
                "med"
            ),
            F.count(F.lit(1)).alias("__n"),
        )
        .filter(F.col("__n") >= min_group)
        .select(group_col, "med")
    )
    dev = base.join(med, group_col).select(
        group_col,
        id_col,
        value_col,
        "med",
        F.abs(F.col(value_col) - F.col("med")).alias("abs_dev"),
    )
    mad = dev.groupBy(group_col).agg(
        F.percentile_approx("abs_dev", F.lit(0.5), F.lit(accuracy)).alias(
            "mad"
        )
    )
    return (
        dev.join(mad, group_col)
        .filter(F.col("abs_dev") > k * F.col("mad"))
        .select(group_col, id_col, value_col, "med", "mad", "abs_dev")
    )
