"""Exponentially-weighted moving average over event series — the
monitoring/forecast-feature smoother (Hunter 1986, "The exponentially
weighted moving average", J. Quality Technology; pandas ``ewm``) —
re-expressed as a WINDOW expression instead of a sequential recurrence
so it distributes.

The classic form is the recurrence s_t = a*v_t + (1-a)*s_{t-1} — a
sequential scan, the one shape a shared-nothing engine can't fuse.
This operator uses the DYADIC truncated form:

    ewma_t = sum_{j=0..n-1} v_{t-j} * 2^-(j+1),   n = min(t, window)

i.e. alpha = 1/2 and the geometric tail truncated at ``window`` terms
(weight < 2^-window ~ already sub-cent at 8). Everything is INTEGER
arithmetic until one final division by a power of two: with cent
values |v| < 2^40 and window <= 12 the weighted numerator fits int64
exactly, and dividing an integer by 2^n is exact in IEEE double — so
both engines produce BIT-IDENTICAL results with no rounding contract,
no margins, no drift. That exactness is the point: a float recurrence
replayed in two engines never lands on the same bits; the dyadic
window form always does.

Scale shape: one window shuffle on the series key (the same exchange
every per-key window op pays), then pure map-side integer expressions
inside whole-stage codegen. The frame carries ``window`` int64s per
row — constant state, no UDF, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def ewma_dyadic(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    window: int = 8,
    out_col: str = "ewma",
) -> DataFrame:
    """Append the dyadic truncated EWMA of integer ``value_col`` per
    ``key_col`` series ordered by ``order_cols`` (include a unique
    tiebreaker — frame contents must be deterministic).

    ``value_col`` must be NON-NULL: collect_list silently DROPS nulls
    (shrinking the frame) while the SQL twin's list() keeps them —
    the two engines would disagree on frame contents, not just on one
    value. Rather than let that skew pass silently, the expression
    raises at execution time on the first null row (round-10 ADVICE
    item 3); callers with nullable series coalesce to an explicit
    sentinel first, on BOTH engines."""
    if not 1 <= window <= 12:
        # 12 keeps |v|*2^(window-1) summed over `window` rows inside
        # int64 for any plausible cent value; larger tails are < 1e-4
        raise ValueError(f"window must be in [1,12], got {window}")
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(-(window - 1), Window.currentRow)
    )
    # weight doubles toward the newest element (the frame list is in
    # frame order, oldest first): numerator = sum arr[i] * 2^(i-1),
    # denominator = 2^n. SQL-expression form because the DataFrame
    # shiftleft helper only takes a literal shift amount.
    # CASE is lazily evaluated per row, so raise_error fires only on an
    # actual null — zero cost in the non-null hot path (codegen branch)
    guarded = F.when(
        F.col(value_col).isNull(),
        F.raise_error(
            F.lit(
                f"ewma_dyadic: null in {value_col!r} — frame contents "
                "would diverge from the SQL twin (see docstring)"
            )
        ).cast("long"),
    ).otherwise(F.col(value_col))
    out = df.withColumn("__ewma_arr", F.collect_list(guarded).over(w))
    num = F.expr(
        "aggregate(zip_with(__ewma_arr, sequence(1, size(__ewma_arr)),"
        " (x, i) -> x * shiftleft(1L, i - 1)), 0L, (a, x) -> a + x)"
    )
    den = F.expr("shiftleft(1L, size(__ewma_arr))")
    return out.withColumn(out_col, num / den).drop("__ewma_arr")


def ewma_dyadic_sql(
    value_expr: str, key_expr: str, order_by: str, window: int = 8
) -> str:
    """DuckDB twin of the window expression, generated from the same
    weight layout so the two can never drift. Returns a SELECT-item
    fragment (alias it at the call site). Assumes ``value_expr`` is
    non-null, the same precondition ``ewma_dyadic`` enforces with its
    raise-on-null guard (list() here would KEEP a null where
    collect_list drops it — the divergence the guard exists to stop)."""
    arr = (
        f"list({value_expr}) OVER (PARTITION BY {key_expr} ORDER BY {order_by}"
        f" ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW)"
    )
    return (
        f"CAST(list_sum(list_transform({arr},"
        f" (x, i) -> x * (CAST(1 AS BIGINT) << (i - 1)))) AS DOUBLE)"
        f" / (CAST(1 AS BIGINT) << len({arr}))"
    )
