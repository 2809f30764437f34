"""Slowly-changing-dimension history + CDC apply (warehouse temporal
ops the reference's medallion flow implies but never materializes —
its dims are latest-version full rewrites, `SURVEY.md §3.2`;
reference upsert seam: ingestion/ingestion/bronze/bronze.py, dbt gold
models keep no history).

Two operators:

- ``scd2_compress``: an observation stream (key, attrs, ts) →
  Type-2 versioned history — consecutive runs of identical attribute
  values collapse to one row with ``[valid_from, valid_to)`` and an
  ``is_current`` flag. This is the run-length encoding that turns an
  append-only snapshot/event feed into a point-in-time joinable
  dimension.
- ``apply_cdc``: a change feed (key, seq, op, payload) → the latest
  snapshot, deletes applied. Deliberately NOT the row_number-window
  formulation: ``max_by(struct(cols), struct(seq))`` is an aggregate
  with partial merge, so the per-key reduction happens map-side and
  the single shuffle carries one row per key per map task — no full
  sort of the change feed, which at 100 TB is the difference between
  a groupBy and a global window sort.

Scale posture (100 TB): ``scd2_compress`` is two window passes and a
groupBy that all share the same (key) hash partitioning and (key, ts)
ordering, so Spark plans ONE Exchange+Sort and reuses it; history
output is proportional to the number of CHANGES, not observations.
``apply_cdc`` is one partial-aggregating shuffle keyed by the
dimension key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def scd2_compress(
    df: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Observations → SCD Type-2 history.

    Returns one row per (key, version): the key columns, the attribute
    columns, ``version`` (1-based per key), ``valid_from`` (first ts
    the attribute combination was observed), ``valid_to`` (the next
    version's valid_from; NULL on the open version) and ``is_current``.

    Attribute comparison is null-safe — NULL → NULL is "no change",
    NULL → value is a change. ``tiebreak_cols`` disambiguate equal
    timestamps so the version sequence is deterministic.
    """
    if not attr_cols:
        raise ValueError("attr_cols must be non-empty")
    keys = [F.col(k) for k in key_cols]
    order = [F.col(ts_col)] + [F.col(c) for c in tiebreak_cols]
    w_obs = W.partitionBy(*keys).orderBy(*order)

    changed = F.lit(False)
    for a in attr_cols:
        prev = F.lag(F.col(a)).over(w_obs)
        changed = changed | ~F.col(a).eqNullSafe(prev)
    # the first observation of a key has lag() = NULL for every attr;
    # eqNullSafe makes a genuinely-NULL first attr look unchanged, so
    # anchor the first row explicitly
    first = F.lag(F.col(ts_col)).over(w_obs).isNull()
    flag = (first | changed).cast("long")

    versioned = df.withColumn("version", F.sum(flag).over(w_obs))
    hist = versioned.groupBy(
        *key_cols, "version", *attr_cols
    ).agg(F.min(ts_col).alias("valid_from"))

    w_ver = W.partitionBy(*keys).orderBy("version")
    return (
        hist.withColumn("valid_to", F.lead("valid_from").over(w_ver))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(
            *key_cols,
            *attr_cols,
            "version",
            "valid_from",
            "valid_to",
            "is_current",
        )
    )


def latest_by_key(
    df: DataFrame,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
) -> DataFrame:
    """The latest row per key (greatest ``seq_cols`` tuple), ALL
    columns kept — including any tombstone marker, which is what makes
    this the mergeable kernel of CDC folding: latest-of-latest equals
    latest-of-all (associative), so micro-batches can fold into a
    running state without resurrecting deleted keys.

    Implemented as ``max_by(struct(<all cols>), struct(seq_cols))`` —
    a partially-aggregating reduction (map-side combine), NOT a
    row_number window, so the change feed is never globally sorted.
    """
    if not seq_cols:
        raise ValueError("seq_cols must be non-empty")
    payload = [c for c in df.columns if c not in key_cols]
    latest = df.groupBy(*key_cols).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in payload]),
            F.struct(*[F.col(c) for c in seq_cols]),
        ).alias("__last")
    )
    return latest.select(
        *key_cols, *[F.col(f"__last.{c}").alias(c) for c in payload]
    )


def apply_cdc(
    df: DataFrame,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str,
    delete_op: str = "D",
) -> DataFrame:
    """Change feed → latest snapshot, deletes applied.

    Per key the row with the greatest ``seq_cols`` tuple wins; if its
    ``op_col`` equals ``delete_op`` the key is absent from the output.
    A NULL winning op is KEPT (null-safe inequality): a malformed feed
    must not silently lose keys — ``op != 'D'`` would yield NULL and
    drop them without signal. See ``latest_by_key`` for the shuffle
    posture.
    """
    out = latest_by_key(df, key_cols, seq_cols)
    return out.filter(~F.col(op_col).eqNullSafe(F.lit(delete_op))).drop(op_col)


def scd2_point_in_time(
    history: DataFrame,
    facts: DataFrame,
    key_cols: Sequence[str],
    fact_ts_col: str,
) -> DataFrame:
    """Join facts to the SCD2 version valid AT the fact's timestamp:
    ``valid_from <= ts AND (valid_to IS NULL OR ts < valid_to)``.

    The equi-part of the join is the dimension key, so this is a plain
    hash join with a residual range predicate — never a nested loop;
    each fact matches at most one version because versions partition
    the timeline.
    """
    cond = [F.col(f"h.{k}") == F.col(f"f.{k}") for k in key_cols]
    rng = (F.col("h.valid_from") <= F.col(f"f.{fact_ts_col}")) & (
        F.col("h.valid_to").isNull()
        | (F.col(f"f.{fact_ts_col}") < F.col("h.valid_to"))
    )
    h, f_ = history.alias("h"), facts.alias("f")
    joined = f_.join(h, cond + [rng], "left")
    keep = [F.col(f"f.{c}") for c in facts.columns] + [
        F.col(f"h.{c}")
        for c in history.columns
        if c not in set(key_cols)
    ]
    return joined.select(*keep)
