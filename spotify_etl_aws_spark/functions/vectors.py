"""Vector math over ``array<float>`` embedding columns.

Built-in higher-order functions only (``zip_with`` + ``aggregate``) —
stays inside the JVM, no Arrow round-trip. Arithmetic is done in DOUBLE
on both engines (inputs cast from float) so the oracle comparison is a
same-precision comparison.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-to-right summed dot product (DuckDB twin: list_dot_product)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Per-ROW cosine (query-vector scoring, centroid assignment). For
    per-PAIR scoring inside a similarity self-join use the Arrow GEMM
    kernels in ``operators/vector_ops.py`` — interpreted HOF eval per
    pair is the measured bottleneck there (see that module docstring)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
