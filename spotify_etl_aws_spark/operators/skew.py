"""Skew mitigation: salted join (SURVEY.md §4 shuffle notes).

AQE's skew-join splitting handles sort-merge skew at runtime, but it
cannot help a shuffled join whose hot key lands in one reducer of a
HASH aggregation or a stream-stream join. Salting is the explicit fix:

- the SKEWED (large) side gets a random salt in ``[0, salt)`` appended
  to its key — the hot key's rows spread over ``salt`` reducers;
- the other side is REPLICATED ``salt`` times (explode over the salt
  range) so every salted partition still finds its match;
- join on (key, salt), then drop the salt.

Cost: the small side's shuffle volume multiplies by ``salt`` — choose
the side to replicate accordingly (here: the right side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"

# Joins where replicating the right side over all salt values is sound:
# every right row's copies either match the same salted left rows or
# drop out (no null-producing right copies).
_REPLICATE_RIGHT_HOW = {"inner", "left", "left_outer", "left_semi", "left_anti"}
# The mirror: the RIGHT side is the null-producing one, so it gets the
# salt (one copy per row) and the left side is replicated.
_REPLICATE_LEFT_HOW = {"right", "right_outer"}
_FULL_HOW = {"full", "full_outer", "outer"}


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join that spreads a hot key over ``salt`` reducers; result
    is row-identical to ``left.join(right, on, how)`` for EVERY join
    type:

    - inner/left/left_semi/left_anti: salt the left side, replicate the
      right — unmatched rights never surface, so replication is free.
    - right/right_outer: mirrored — salt the right side, replicate the
      left. Each right row exists exactly once (one salt value), so an
      unmatched right row emits exactly one null-left row.
    - full/full_outer: replication on either side would emit up to
      ``salt`` spurious null rows per unmatched row on the replicated
      side, so the full join is COMPOSED from sound parts: the salted
      inner join ∪ unmatched-left rows (salted left_anti, null right
      columns) ∪ unmatched-right rows (salted anti the other way, null
      left columns). Three salted shuffles, no spurious rows — and NULL
      join keys surface from both sides exactly as a plain full join.

    ``rand`` seeds deterministically per partition, so the salt only
    affects placement, never the result set.
    """
    on_cols = [on] if isinstance(on, str) else list(on)
    if how in _REPLICATE_RIGHT_HOW:
        salted_left = left.withColumn(_SALT, (F.rand(seed=42) * salt).cast("int"))
        replicated_right = right.withColumn(
            _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        )
        return salted_left.join(
            replicated_right, on_cols + [_SALT], how
        ).drop(_SALT)
    if how in _REPLICATE_LEFT_HOW:
        replicated_left = left.withColumn(
            _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        )
        salted_right = right.withColumn(
            _SALT, (F.rand(seed=42) * salt).cast("int")
        )
        return replicated_left.join(
            salted_right, on_cols + [_SALT], how
        ).drop(_SALT)
    if how in _FULL_HOW:
        l_rest = [c for c in left.columns if c not in on_cols]
        r_rest = [c for c in right.columns if c not in on_cols]
        l_types = {f.name: f.dataType for f in left.schema.fields}
        r_types = {f.name: f.dataType for f in right.schema.fields}
        matched = salted_join(left, right, on_cols, salt, "inner")
        left_only = salted_join(left, right, on_cols, salt, "left_anti").select(
            *on_cols,
            *l_rest,
            *[F.lit(None).cast(r_types[c]).alias(c) for c in r_rest],
        )
        right_only = salted_join(right, left, on_cols, salt, "left_anti").select(
            *on_cols,
            *[F.lit(None).cast(l_types[c]).alias(c) for c in l_rest],
            *r_rest,
        )
        # positional union: all three legs are built in the same
        # (on, left-rest, right-rest) order — and a plain full join may
        # legitimately output DUPLICATE column names when left and
        # right share a non-key name, which unionByName would reject
        return matched.union(left_only).union(right_only)
    raise ValueError(f"salted_join: unsupported join type {how!r}")
