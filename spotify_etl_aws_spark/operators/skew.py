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
# drop out. right/full outer would instead emit up to ``salt`` spurious
# null-left rows per unmatched right row (one per unmatched salt copy).
_SALTABLE_HOW = {"inner", "left", "left_outer", "left_semi", "left_anti"}


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left (skewed) side salted and the right side
    replicated. For ``how`` in inner/left/left_semi/left_anti the result
    is row-identical to ``left.join(right, on, how)``; right/full outer
    are rejected (salt those by replicating the LEFT side instead).

    ``rand`` seeds deterministically per partition, so the salt only
    affects placement, never the result set.
    """
    if how not in _SALTABLE_HOW:
        raise ValueError(
            f"salted_join supports how in {sorted(_SALTABLE_HOW)}, got {how!r}: "
            "replicating the right side over salt values would emit spurious "
            "null-left rows for right/full outer joins"
        )
    on_cols = [on] if isinstance(on, str) else list(on)
    salted_left = left.withColumn(
        _SALT, (F.rand(seed=42) * salt).cast("int")
    )
    replicated_right = right.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return salted_left.join(replicated_right, on_cols + [_SALT], how).drop(_SALT)
