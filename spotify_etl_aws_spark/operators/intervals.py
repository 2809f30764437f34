"""Interval-overlap join — the temporal/genomic "both sides are
ranges" join (north-star §2.3 beyond `join_range_binned`'s
point-distance shape; the reference's engine has no range joins at
all, so this is gap inventory).

Two relations of ``[start, end]`` intervals (integers, inclusive)
joined on overlap (``a.start <= b.end AND b.start <= a.end``) plus
optional equality keys. A naive theta join is a per-key nested loop —
quadratic in the key group, the classic 100 TB killer. Binning makes
it an EQUI-join:

- every interval explodes to the bins it touches
  (``floor(start/B) .. floor(end/B)``) — expansion factor is
  ``len/B + 1``, so ``bin_size`` should sit near the typical
  interval length;
- overlapping pairs meet in every shared bin; the COUNT-ONCE filter
  keeps the pair only in ``floor(max(starts)/B)`` — the bin holding
  the overlap's first day, which both intervals necessarily cover —
  so no ``distinct`` (and its extra shuffle) is ever needed;
- the residual overlap predicate discards same-bin non-overlaps.

One hash join on (keys..., bin); skew is governed by bin occupancy,
which ``bin_size`` tunes independently of the data's key skew.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: Sequence[str] = (),
    bin_size: int = 32,
) -> DataFrame:
    """All (left, right) pairs whose inclusive integer intervals
    overlap, with equal ``on`` keys. Column names (other than ``on``)
    must be disjoint between the two frames. ``bin_size`` trades
    explosion factor (short intervals, big bins → ~1 row each)
    against per-bin candidate volume.
    """
    if bin_size < 1:
        raise ValueError(f"bin_size must be >= 1, got {bin_size}")
    ls, le = F.col(left_start), F.col(left_end)
    rs, re_ = F.col(right_start), F.col(right_end)

    # Exact-integer floor division: `floor(col / B)` is DOUBLE division,
    # which rounds for |bounds| > 2^53 and could place the explode bins
    # and the count-once bin differently (dropping/duplicating pairs).
    # `div` truncates toward zero, so adjust negative non-exact cases
    # down to get true floor semantics — pure int64 throughout.
    def fdiv(x_sql: str):
        x = f"CAST(({x_sql}) AS LONG)"
        return F.expr(
            f"(({x}) div {bin_size}) - "
            f"(CASE WHEN ({x}) % {bin_size} < 0 THEN 1 ELSE 0 END)"
        )

    def bins(start_name, end_name):
        return F.explode(
            F.sequence(fdiv(f"`{start_name}`"), fdiv(f"`{end_name}`"))
        ).alias("__jbin")

    lb = left.select("*", bins(left_start, left_end))
    rb = right.select("*", bins(right_start, right_end))
    keys = list(on) + ["__jbin"]
    return (
        lb.join(rb, keys)
        .filter((ls <= re_) & (rs <= le))
        .filter(
            F.col("__jbin")
            == fdiv(
                f"greatest(CAST(`{left_start}` AS LONG),"
                f" CAST(`{right_start}` AS LONG))"
            )
        )
        .drop("__jbin")
    )
