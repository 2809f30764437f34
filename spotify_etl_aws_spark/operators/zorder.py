"""Z-order (Morton) multi-column layout (north-star; the OPTIMIZE
ZORDER BY feature class from Delta/Iceberg, re-expressed as plain
Spark ops).

Why it matters at 100 TB: parquet scan pruning works off per-file
min/max statistics. A sort on ONE column makes that column's per-file
ranges tight but leaves every other column's ranges spanning the full
domain — filters on the second column prune nothing. Interleaving the
bits of k columns into one sort key (the Morton curve) makes ALL k
columns' per-file ranges tight simultaneously (each ~|domain| /
2^(file_bits/k)), so selective filters on ANY of them skip most files.
The layout test pins exactly that footer-stat property with pyarrow.

Everything is JVM expressions + one tiny min/max job per column
(driver scalar state, the MLlib-model pattern): normalize each column
to a ``bits``-wide integer rank, spread and interleave the bits with
shift/mask expressions (whole-stage-codegen friendly, no UDF), then
``repartitionByRange`` + ``sortWithinPartitions`` on the z-value — the
standard one-shuffle layout write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_TOTAL_BITS = 63  # z-value must fit a signed long


def interleave_bits(cols: list[Column], bits: int) -> Column:
    """Morton-interleave ``bits`` low bits of each (already
    [0, 2^bits)-normalized) column: bit ``b`` of column ``k`` lands at
    position ``b * n_cols + k``. Pure shift/mask JVM expressions."""
    n = len(cols)
    if n == 0:
        raise ValueError("interleave_bits needs at least one column")
    if n * bits > MAX_TOTAL_BITS:
        raise ValueError(
            f"{n} cols x {bits} bits = {n * bits} bits won't fit a long"
        )
    z = F.lit(0).cast("long")
    for k, c in enumerate(cols):
        c = c.cast("long")
        for b in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + k)
            )
    return z


def _column_ranges(
    df: DataFrame, cols: list[str]
) -> dict[str, tuple[float, float]]:
    """One aggregation job -> {col: (min, max)} as driver scalars.
    Date/timestamp columns ride through their numeric casts."""
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"__mn_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"__mx_{c}"))
    row = df.agg(*aggs).collect()[0]
    return {c: (row[f"__mn_{c}"], row[f"__mx_{c}"]) for c in cols}


def zvalue(
    df: DataFrame, cols: list[str], bits: int = 12
) -> tuple[DataFrame, str]:
    """Append the Morton key column ``__zvalue`` computed from
    ``cols``: min/max-normalize each column into [0, 2^bits) (the
    range-id binning Delta's OPTIMIZE uses), then interleave.
    Returns (df, key_col_name)."""
    ranges = _column_ranges(df, cols)
    top = float((1 << bits) - 1)
    binned = []
    for c in cols:
        mn, mx = ranges[c]
        if mn is None or mx is None or mx == mn:
            binned.append(F.lit(0).cast("long"))
        else:
            binned.append(
                F.least(
                    F.lit(top),
                    F.greatest(
                        F.lit(0.0),
                        (F.col(c).cast("double") - F.lit(mn))
                        * F.lit(top / (mx - mn)),
                    ),
                ).cast("long")
            )
    return df.withColumn("__zvalue", interleave_bits(binned, bits)), "__zvalue"


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    num_files: int = 32,
) -> None:
    """Write ``df`` as parquet laid out along the Morton curve of
    ``cols``: one range shuffle on the z-value (balanced files), sorted
    within partitions so row-group stats are tight too, key dropped on
    the way out. Filters on ANY of ``cols`` then prune most files from
    the footer stats alone."""
    zdf, key = zvalue(df, cols, bits)
    (
        zdf.repartitionByRange(num_files, F.col(key))
        .sortWithinPartitions(key)
        .drop(key)
        .write.mode("overwrite")
        .parquet(path)
    )
