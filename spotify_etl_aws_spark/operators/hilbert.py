"""Hilbert-curve data layout — the locality-preserving upgrade of the
Morton/Z-order key (Hilbert 1891; the textbook xy2d walk, e.g. the
Wikipedia reference algorithm; what liquid-clustering-style layouts
prefer over Z-order when range locality matters). Unlike Morton
order, CONSECUTIVE Hilbert indices are always grid-neighbors (no
diagonal jumps across the plane at power-of-two boundaries), so range
predicates map to fewer, tighter file bounding boxes at 100 TB.

The classic xy2d algorithm is a per-level state loop (rotate/reflect
the quadrant frame while descending). The level count is the BIT
WIDTH (8-16), so it unrolls — but NOT as one nested expression: each
level reads the previous level's (x, y) TWICE, so a purely functional
unroll is a 4^bits expression tree that stalls both engines'
analyzers (measured: 9 levels timed out both Spark analysis and
DuckDB's CTE inliner). The fix is the same on both sides — NAME each
level's state:

- Spark: one narrow Project per level (``with_hilbert``) — the CASE
  expressions reference the previous projection's columns, the tree
  stays linear in ``bits``, and everything remains whole-stage-codegen
  integer arithmetic (no UDF);
- DuckDB: one ``AS MATERIALIZED`` CTE per level (``hilbert_sql``) —
  blocking the single-reference inliner that would otherwise
  re-expand the tree.

Both forms are generated from the SAME per-level transform, so the
engines cannot drift:

    d += s^2 * ((3*rx) XOR ry);  then rotate:
    ry=1 -> (x, y) unchanged
    ry=0, rx=0 -> swap:          (x, y) = (y, x)
    ry=0, rx=1 -> flip + swap:   (x, y) = (s-1-y, s-1-x)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_hilbert(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 8,
    out_col: str = "hval",
) -> DataFrame:
    """Append the Hilbert d-index of non-negative integer
    (``x_col``, ``y_col``), each < 2^bits (caller guarantees range,
    the zorder.zvalue contract). One narrow projection per level —
    pure JVM integer expressions; 2*bits result bits."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    collide = {out_col, "__hx", "__hy", "__hd"} & set(df.columns)
    if collide:
        # keep = df.columns below would silently duplicate these
        raise ValueError(
            f"with_hilbert: input already has column(s) {sorted(collide)}"
        )
    keep = df.columns
    cur = df.select(
        *keep,
        F.col(x_col).cast("long").alias("__hx"),
        F.col(y_col).cast("long").alias("__hy"),
        F.lit(0).cast("long").alias("__hd"),
    )
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = F.shiftright(F.col("__hx"), i).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col("__hy"), i).bitwiseAND(F.lit(1))
        cur = cur.select(
            *keep,
            (
                F.col("__hd")
                + F.lit(s).cast("long")
                * F.lit(s)
                * (F.lit(3) * rx).bitwiseXOR(ry)
            ).alias("__hd"),
            F.when(ry == 1, F.col("__hx"))
            .when(rx == 1, F.lit(s - 1) - F.col("__hy"))
            .otherwise(F.col("__hy"))
            .alias("__hx"),
            F.when(ry == 1, F.col("__hy"))
            .when(rx == 1, F.lit(s - 1) - F.col("__hx"))
            .otherwise(F.col("__hx"))
            .alias("__hy"),
        )
    return cur.select(*keep, F.col("__hd").alias(out_col))


def hilbert_sql(x_expr: str, y_expr: str, bits: int = 8) -> str:
    """DuckDB twin generated from the identical per-level transform:
    a chain of MATERIALIZED CTE levels l{bits} .. l0, each carrying
    (k, x, y, d). The caller supplies a CTE named ``hsrc`` with a key
    column ``k`` plus whatever ``x_expr``/``y_expr`` reference, then
    appends ``SELECT ... FROM l0`` (join back on k for the original
    coordinates)."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    parts = [
        f"l{bits} AS MATERIALIZED (SELECT k, CAST({x_expr} AS BIGINT) AS x,"
        f" CAST({y_expr} AS BIGINT) AS y, CAST(0 AS BIGINT) AS d FROM hsrc)"
    ]
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        parts.append(
            f"""l{i} AS MATERIALIZED (
  SELECT k,
    CASE WHEN (y >> {i}) & 1 = 1 THEN x
         WHEN (x >> {i}) & 1 = 1 THEN {s - 1} - y
         ELSE y END AS x,
    CASE WHEN (y >> {i}) & 1 = 1 THEN y
         WHEN (x >> {i}) & 1 = 1 THEN {s - 1} - x
         ELSE x END AS y,
    d + CAST({s} AS BIGINT) * {s}
        * xor(3 * ((x >> {i}) & 1), (y >> {i}) & 1) AS d
  FROM l{i + 1}
)"""
        )
    return ",\n".join(parts)


def hilbert_xy2d(x: int, y: int, bits: int = 8) -> int:
    """Scalar python reference (the textbook xy2d) — the independent
    cross-validation target for both generated forms."""
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def hilbert_layout(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 8,
    num_files: int = 32,
) -> DataFrame:
    """The frame arranged for a Hilbert-clustered write (the
    zorder.zorder_layout posture with the locality-preserving key):
    one range exchange on the Hilbert d-index — the same single
    shuffle any global sort pays — sorted within partitions so parquet
    ROW-GROUP stats are tight too, key dropped before the write. Each
    output file then covers a compact, CONNECTED region of the (x, y)
    grid (Morton files cover rectangles that can jump at power-of-two
    boundaries), so min/max footer pruning admits fewer files/row
    groups for 2-D range predicates — measured against linear and
    z-order layouts in experiments/layout_scale.py."""
    return (
        with_hilbert(df, x_col, y_col, bits, "__hilbert")
        .repartitionByRange(num_files, "__hilbert")
        .sortWithinPartitions("__hilbert")
        .drop("__hilbert")
    )
