"""Z-order (Morton) data layout — multi-dimensional clustering for
scan pruning (the Delta/Iceberg OPTIMIZE ZORDER technique; Morton
1966). The reference's engine scans whole tables (its only layout
lever is the medallion partition column); at 100 TB the difference
between "read 2% of files" and "read every file" for a 2-D predicate
IS the query time, and parquet min/max footer stats only prune when
rows with nearby values land in the same files.

``zvalue`` interleaves the low ``bits`` bits of N non-negative
integer columns into one long, JVM-side (a folded shift/mask/or
expression inside whole-stage codegen — no UDF). Sorting by the
z-value gives every file a tight bounding box in ALL interleaved
dimensions at once, where a lexicographic sort only bounds the first.

``zorder_layout`` is the writer posture: one range exchange on the
z-value (the same single shuffle any global sort pays), sorted within
partitions so parquet row-group stats are tight too.

Rank-normalize skewed/unbounded columns into the 2^bits grid first
(``ntile``-style) — the lane uses naturally small integers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: Sequence[Column | str], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of each column
    (non-negative integers; caller guarantees range — values >=
    2^bits alias into the grid). Bit i of column j lands at position
    ``i * n_cols + j``; total width must fit a signed long."""
    n = len(cols)
    if n < 1:
        raise ValueError("need at least one column")
    if bits < 1 or n * bits > 63:
        raise ValueError(
            f"{n} cols x {bits} bits = {n * bits} exceeds a signed long"
        )
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    z = F.lit(0).cast("long")
    for j, c in enumerate(cs):
        cl = c.cast("long")
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftright(cl, i).bitwiseAND(F.lit(1)), i * n + j
            )
    return z


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    num_files: int = 32,
) -> DataFrame:
    """The frame arranged for a z-ordered write: range-partitioned and
    sorted by the interleaved key (then dropped). Write the result
    with ``.write.parquet`` — each output file covers a compact
    hyper-rectangle of the interleaved dimensions, so min/max footer
    pruning works for predicates on ANY of them."""
    key = zvalue(list(cols), bits).alias("__z")
    return (
        df.withColumn("__z", key)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
