"""Event analytics (operators/events_analytics.py): strict-funnel
ordering, retention triangle shape, transition bigrams — against
hand-computed fixtures."""

from __future__ import annotations

import datetime as dt

import pytest

from spotify_etl_aws_spark.operators.events_analytics import (
    funnel,
    retention_cohorts,
    type_transitions,
)


def _t(day, h=0):
    return dt.datetime(2024, 1, day, h)


@pytest.fixture()
def ev(spark):
    rows = [
        # u1: full ordered funnel view -> click -> purchase
        (1, 1, _t(1, 0), "view"),
        (2, 1, _t(1, 1), "click"),
        (3, 1, _t(1, 2), "purchase"),
        # u2: clicks BEFORE viewing — strict ordering rejects step 2
        (4, 2, _t(1, 0), "click"),
        (5, 2, _t(1, 1), "view"),
        (6, 2, _t(1, 2), "purchase"),  # but no click after view
        # u3: view then purchase, no click
        (7, 3, _t(2, 0), "view"),
        (8, 3, _t(2, 1), "purchase"),
        # u4: week-2 first activity, active again in week 3
        (9, 4, _t(9, 0), "view"),
        (10, 4, _t(16, 0), "view"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )


def test_funnel_strict_ordering(spark, ev):
    out = {
        r.step: (r.step_type, r.users)
        for r in funnel(ev, ["view", "click", "purchase"]).collect()
    }
    # u1,u2,u3,u4 viewed; only u1 clicked AFTER viewing; only u1 purchased
    assert out == {
        1: ("view", 4), 2: ("click", 1), 3: ("purchase", 1)
    }
    with pytest.raises(ValueError, match="duplicate"):
        funnel(ev, ["view", "view"])
    with pytest.raises(ValueError, match="at least one"):
        funnel(ev, [])


def test_retention_triangle(spark, ev):
    out = {
        (r.cohort_start, r.offset): r.active_users
        for r in retention_cohorts(ev, period_days=7).collect()
    }
    # anchor = 2024-01-01. cohort 0 (Jan 1-7): u1,u2,u3 — active only
    # offset 0. cohort 1 (Jan 8-14): u4, active at offsets 0 and 1.
    d = dt.date
    assert out == {
        (d(2024, 1, 1), 0): 3,
        (d(2024, 1, 8), 0): 1,
        (d(2024, 1, 8), 1): 1,
    }


def test_type_transitions_bigrams(spark, ev):
    out = {
        (r.prev_type, r.next_type): r.n
        for r in type_transitions(ev).collect()
    }
    assert out == {
        ("view", "click"): 1,      # u1
        ("click", "purchase"): 1,  # u1
        ("click", "view"): 1,      # u2
        ("view", "purchase"): 2,   # u2, u3
        ("view", "view"): 1,       # u4 across weeks
    }


def test_empty_inputs(spark):
    empty = spark.createDataFrame(
        [], "event_id long, user_id long, ts timestamp, event_type string"
    )
    assert funnel(empty, ["view"]).collect()[0].users == 0
    assert retention_cohorts(empty).count() == 0
    assert type_transitions(empty).count() == 0
