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
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_ATS = "__asof_ts"
_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    tie_breakers: list[str] | None = None,
) -> DataFrame:
    """Backward (inclusive) as-of join. ``left`` and ``right`` must share
    only the ``on`` key columns; right payload = every other right column
    (including ``right_ts`` itself, so callers can read the matched time).
    """
    on_cols = [on] if isinstance(on, str) else list(on)
    left_payload = [c for c in left.columns if c not in on_cols]
    right_payload = [c for c in right.columns if c not in on_cols]
    clash = set(left_payload) & set(right_payload)
    if clash:
        raise ValueError(f"left/right column clash outside join key: {clash}")

    right_types = {f.name: f.dataType for f in right.schema.fields}
    left_types = {f.name: f.dataType for f in left.schema.fields}

    def side(df: DataFrame, ts: str, is_left: bool) -> DataFrame:
        own = left_payload if is_left else right_payload
        other = right_payload if is_left else left_payload
        other_types = right_types if is_left else left_types
        cols: list[Column] = [F.col(c) for c in on_cols]
        cols.append(F.col(ts).alias(_ATS))
        cols.append(F.lit(1 if is_left else 0).alias(_SIDE))
        cols += [F.col(c) for c in own]
        cols += [F.lit(None).cast(other_types[c]).alias(c) for c in other]
        return df.select(*cols)

    unioned = side(left, left_ts, True).unionByName(side(right, right_ts, False))

    order = [F.col(_ATS).asc(), F.col(_SIDE).asc()] + [
        F.col(c).asc() for c in (tie_breakers or [])
    ]
    w = (
        W.partitionBy(*on_cols)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.select(
        *on_cols,
        _ATS,
        _SIDE,
        *left_payload,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in right_payload],
    )
    return filled.filter(F.col(_SIDE) == 1).drop(_ATS, _SIDE)
