"""As-of join (SURVEY.md §2.3 J3 gap — an operator Spark lacks natively).

Semantics: for every left row, attach the payload of the latest right row
with the same key whose timestamp is at-or-before the left timestamp
(``backward`` as-of, inclusive).

Implementation is the shuffle-minimal *union + running last_value*
composition rather than the naive ``left.join(right, ts <= ts)`` +
argmax, which multiplies rows by the per-key right cardinality before
re-aggregating:

1. tag both inputs and union them on aligned columns;
2. one shuffle: window ``partitionBy(key).orderBy(ts, side)`` with
   ``last(payload, ignorenulls=True)`` over an unbounded-preceding frame
   carries the most recent right payload forward onto each left row;
3. keep the left rows.

Cost at scale: exactly one exchange + one sort over (left + right) —
the same as a sort-merge join — independent of per-key right
cardinality, and AQE-skew-splittable. Right rows sort *before* left
rows at equal timestamps, making the join inclusive.

Ties: among right rows sharing (key, ts), the carried payload is the one
latest in the residual sort order — pass ``tie_breakers`` for a
deterministic pick.

The right payload travels as ONE struct column filled by a single
``last(ignorenulls=True)``: every output cell comes from the same right
row (per-column carries could stitch cells from different rows when some
payload cells are legitimately NULL), and right rows with a NULL
timestamp are dropped up front — they can't satisfy ``ts <= ts`` but
would otherwise sort NULLS FIRST and leak payload onto every left row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_ATS = "__asof_ts"
_SIDE = "__asof_side"
_PAY = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    tie_breakers: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join, inclusive. ``direction='backward'`` (default)
    attaches the LATEST right row at-or-before the left timestamp;
    ``'forward'`` the EARLIEST right row at-or-after it (pandas
    merge_asof's directions). Forward is the same one-exchange
    composition with the scan order reversed — same cost. ``left``
    and ``right`` must share only the ``on`` key columns; right
    payload = every other right column (including ``right_ts`` itself,
    so callers can read the matched time).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be 'backward' or 'forward', got {direction!r}"
        )
    fwd = direction == "forward"
    on_cols = [on] if isinstance(on, str) else list(on)
    left_payload = [c for c in left.columns if c not in on_cols]
    right_payload = [c for c in right.columns if c not in on_cols]
    clash = set(left_payload) & set(right_payload)
    if clash:
        raise ValueError(f"left/right column clash outside join key: {clash}")

    left_types = {f.name: f.dataType for f in left.schema.fields}
    pay_type = StructType(
        [f for f in right.schema.fields if f.name in right_payload]
    )

    left_side = left.select(
        *on_cols,
        F.col(left_ts).alias(_ATS),
        F.lit(1).alias(_SIDE),
        *left_payload,
        F.lit(None).cast(pay_type).alias(_PAY),
    )
    right_side = right.filter(F.col(right_ts).isNotNull()).select(
        *on_cols,
        F.col(right_ts).alias(_ATS),
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(left_types[c]).alias(c) for c in left_payload],
        F.struct(*right_payload).alias(_PAY),
    )
    unioned = left_side.unionByName(right_side)

    def _tb(c: str):  # tie-breakers naming right payload live inside the struct
        return F.col(f"{_PAY}.{c}") if c in right_payload else F.col(c)

    # forward: scan timestamps descending so "last right seen" is the
    # EARLIEST right at-or-after; right still sorts before left at
    # equal timestamps (side asc) to keep the join inclusive. Among
    # tied right rows the carried payload is the latest in residual
    # order either way, so tie_breakers keep their meaning.
    ts_ord = F.col(_ATS).desc() if fwd else F.col(_ATS).asc()
    order = [ts_ord, F.col(_SIDE).asc()] + [
        _tb(c).asc() for c in (tie_breakers or [])
    ]
    w = (
        W.partitionBy(*on_cols)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.select(
        *on_cols,
        _SIDE,
        *left_payload,
        F.last(_PAY, ignorenulls=True).over(w).alias(_PAY),
    )
    return filled.filter(F.col(_SIDE) == 1).select(
        *on_cols,
        *left_payload,
        *[F.col(f"{_PAY}.{c}").alias(c) for c in right_payload],
    )
