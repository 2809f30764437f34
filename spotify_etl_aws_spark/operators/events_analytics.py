"""Event/product analytics operators (north-star §2.11 — the
funnel/retention/flow family every event warehouse query layer ships;
the reference's Spotify events never get past raw landing, so these
generalize its event surface the way the window/agg lanes generalize
its SQL).

All three are pure DataFrame compositions — groupBy/window/join, no
UDFs — and all-integer outputs, so their oracles are exact:

- ``funnel``: strictly-ordered step conversion. Step k's timestamp is
  the user's EARLIEST step-k event AFTER their step-(k−1) time (the
  standard unbounded ordered funnel; the earliest-first greedy is
  optimal — taking the earliest feasible event at every step can
  never exclude a user a later choice would admit). One narrow
  (user, t) frame per step, chained through k−1 self-joins on user id
  — each join input is user-cardinality, not event-cardinality.
- ``retention_cohorts``: classic triangle retention — cohort = the
  user's first-activity period, activity at offset k = any event in
  cohort-period + k. Two aggregations and one join on user id.
- ``type_transitions``: the per-user event-flow bigram matrix
  (prev_type → type counts) via one lag window ordered by
  (ts, id) — the Markov-transition view sessionization feeds.

Scale posture: everything shuffles on user_id (the natural event
partition key) or on the tiny type×type / cohort×offset result grids;
no operator ever holds more than a per-user constant in window state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(step, step_type, users): how many users completed each ordered
    prefix of ``steps`` (strict ordering — step k must occur strictly
    AFTER the user's step-(k−1) conversion time)."""
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    if len(set(steps)) != len(steps):
        raise ValueError(f"duplicate step types: {steps}")
    spark = events.sparkSession
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__t"))
    )
    counts = [(1, steps[0], cur.count())]
    for k, step in enumerate(steps[1:], start=2):
        nxt = (
            events.filter(F.col(type_col) == step)
            .join(cur.select(user_col, "__t"), user_col)
            .filter(F.col(ts_col) > F.col("__t"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("__t"))
        )
        cur = nxt
        counts.append((k, step, cur.count()))
    return spark.createDataFrame(
        counts, "step int, step_type string, users bigint"
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """(cohort_start, offset, active_users): triangle retention.
    A user's cohort is the ``period_days`` bucket of their first
    event (buckets anchored at the GLOBAL first event date, so bucket
    edges are data-defined, not calendar-defined); they count as
    retained at offset k if any of their events lands in cohort + k
    periods. Offset 0 equals cohort size by construction."""
    if period_days < 1:
        raise ValueError(f"period_days must be >= 1, got {period_days}")
    anchor = events.agg(F.min(F.to_date(ts_col))).collect()[0][0]
    if anchor is None:
        return events.sparkSession.createDataFrame(
            [], "cohort_start date, offset int, active_users bigint"
        )
    period = (
        F.floor(
            F.datediff(F.to_date(ts_col), F.lit(anchor)) / period_days
        ).cast("int")
    )
    keyed = events.select(F.col(user_col).alias("u"), period.alias("p"))
    first = keyed.groupBy("u").agg(F.min("p").alias("cohort"))
    active = keyed.distinct()
    return (
        active.join(first, "u")
        .groupBy(
            "cohort", (F.col("p") - F.col("cohort")).alias("offset")
        )
        .agg(F.count_distinct("u").alias("active_users"))
        .select(
            F.date_add(
                F.lit(anchor), F.col("cohort") * period_days
            ).alias("cohort_start"),
            F.col("offset").cast("int").alias("offset"),
            "active_users",
        )
    )


def type_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """(prev_type, next_type, n): per-user event-flow bigram counts —
    consecutive events in (ts, id) order within each user. The first
    event of a user has no predecessor and contributes nothing."""
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    return (
        events.withColumn("__prev", F.lag(type_col).over(w))
        .filter(F.col("__prev").isNotNull())
        .groupBy(
            F.col("__prev").alias("prev_type"),
            F.col(type_col).alias("next_type"),
        )
        .agg(F.count("*").alias("n"))
    )
