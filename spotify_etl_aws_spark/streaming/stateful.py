"""Custom stateful streaming operators (SURVEY.md §2.9/§2.10 —
``applyInPandasWithState``).

Where ``dropDuplicates``/windowed aggregation cover the built-in
stateful shapes, arbitrary per-key state machines (running profiles,
custom sessionizers, fraud counters) need the grouped-map-with-state
lane: each trigger, every key's new rows arrive as pandas frames along
with that key's persistent ``GroupState``; the function updates the
state and emits output rows.

Scale notes: state lives in the state store partitioned by key —
bounded by distinct keys, not stream length (set a timeout to expire
idle keys for unbounded key spaces). Data reaches Python via Arrow
batches; only the state value round-trips per key per trigger.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, total_value) maintained in GroupState;
    one row per user per trigger with the post-batch totals.

    Over a complete AvailableNow run this equals the batch groupBy
    aggregate — which is what makes the custom-stateful lane
    oracle-checkable end-to-end.
    """
    out_schema = "user_id bigint, n_events bigint, total_value double"
    state_schema = "n bigint, total double"

    def _update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        # total_value leaves unrounded: Python round() is banker's
        # rounding; SQL-semantics rounding (half away from zero) is
        # applied JVM-side by the caller via F.round.
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
