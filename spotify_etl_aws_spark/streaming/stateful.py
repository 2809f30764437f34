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


def user_type_profiles(events: DataFrame) -> DataFrame:
    """Per-user event-type profile via Spark 4's
    ``transformWithStateInPandas`` (the typed-state successor to
    ``applyInPandasWithState``): a ``ValueState`` row counter plus a
    ``MapState`` keyed by event_type — the composite-state surface the
    tuple-state API can't express without packing everything into one
    blob. Emits, per user per trigger, the post-batch
    (n_events, n_types, top_type); top_type breaks count ties on the
    lexicographically smallest type so the output is deterministic and
    a complete AvailableNow pass equals the batch aggregate.

    ENVIRONMENT SEAM: the transformWithState Python driver worker
    requires ``google.protobuf`` (its state-server protocol), which
    this container lacks — the query plan BUILDS but the stream
    crashes at driver-worker init (STREAMING_PYTHON_RUNNER_
    INITIALIZATION_FAILURE / ImportError google.protobuf). The
    declared oracle lane therefore runs the semantically identical
    ``user_type_profiles_gs`` below on ``applyInPandasWithState``;
    this function is kept (and schema-tested) so a protobuf-equipped
    deployment can switch APIs by swapping one call.

    Scale: state is partitioned by user in the state store; per-user
    cost is O(distinct types) (bounded — it's an enum), and only
    touched keys' state round-trips per trigger.
    """
    from pyspark.sql.streaming import StatefulProcessor

    out_schema = (
        "user_id bigint, n_events bigint, n_types bigint, top_type string"
    )

    class _Profile(StatefulProcessor):
        def init(self, handle) -> None:
            self._n = handle.getValueState("n", "n bigint")
            self._types = handle.getMapState("types", "t string", "c bigint")

        def handleInputRows(self, key, rows, timerValues):
            n = self._n.get()[0] if self._n.exists() else 0
            for pdf in rows:
                n += len(pdf)
                for t, c in pdf["event_type"].value_counts().items():
                    prev = (
                        self._types.getValue((t,))[0]
                        if self._types.containsKey((t,))
                        else 0
                    )
                    self._types.updateValue((t,), (prev + int(c),))
            self._n.update((n,))
            counts = [(k[0], v[0]) for k, v in self._types.iterator()]
            top = min(counts, key=lambda kv: (-kv[1], kv[0]))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "n_types": [len(counts)],
                    "top_type": [top[0]],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        _Profile(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def user_type_profiles_gs(events: DataFrame) -> DataFrame:
    """The ``user_type_profiles`` semantics on the GroupState API that
    THIS environment can execute: the composite state (row count +
    per-type counts) packs into one tuple — count as bigint, the type
    histogram as a JSON string (the packing transformWithState's
    MapState exists to avoid; both shapes are shown deliberately).
    Same deterministic contract: per user per trigger, post-batch
    (n_events, n_types, top_type), top_type tie-breaking on the
    smallest type string; a complete AvailableNow pass equals the
    batch aggregate.

    Scale: identical state-store posture (one row per user), and the
    JSON blob is O(distinct types) = O(enum), so packing costs bytes,
    not asymptotics.
    """
    import json

    out_schema = (
        "user_id bigint, n_events bigint, n_types bigint, top_type string"
    )
    state_schema = "n bigint, types_json string"

    def _update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, types_json = state.get
            counts = json.loads(types_json)
        else:
            n, counts = 0, {}
        for pdf in pdfs:
            n += len(pdf)
            for t, c in pdf["event_type"].value_counts().items():
                counts[t] = counts.get(t, 0) + int(c)
        state.update((n, json.dumps(counts, sort_keys=True)))
        top = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "n_types": [len(counts)],
                "top_type": [top[0]],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cusum_alarms_state(events: DataFrame, ref: int, h: int) -> DataFrame:
    """Per-key one-sided upper CUSUM (Page 1954) as a streaming state
    machine — the STREAMING posture of the batch window identity
    S_t = P_t - min(0, min_{j<=t} P_j) (queries: ts_cusum_alarms):
    the state carries exactly the identity's sufficient statistics,
    (P_t, min_j P_j), plus the last-seen (ts, event_id) so the fold is
    resumable across triggers. Per trigger each key's new rows sort by
    (ts, event_id) and fold with vectorized numpy prefix ops; rows
    whose cumulative exceedance crosses ``h`` emit as alarms.

    Ordering contract: the recurrence is only defined over the
    per-key (ts, event_id) order, so a trigger whose first row is not
    strictly after the state's last-seen key RAISES (out-of-order
    delivery across triggers — the file-source AvailableNow harness
    delivers everything in one trigger, where the in-trigger sort
    makes order unconditional; a production deployment feeds
    time-ordered file batches, the reference's daily-landing pattern).

    Scale: state is four int64s per key — bounded by distinct keys,
    not stream length; everything else is Arrow-batched numpy.
    """
    import numpy as np

    out_schema = (
        "event_id bigint, user_id bigint, cents bigint, cusum bigint"
    )
    state_schema = "pt bigint, mp bigint, last_ts bigint, last_eid bigint"
    far = 1 << 62  # mp sentinel: min(0, mp) clamps it away until set

    def _update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        pt, mp, last_ts, last_eid = (
            state.get if state.exists else (0, far, None, None)
        )
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(
            ["ts", "event_id"], kind="mergesort", ignore_index=True
        )
        ts_ns = pdf["ts"].astype("int64").to_numpy()
        eid = pdf["event_id"].to_numpy(np.int64)
        if last_ts is not None and (
            (int(ts_ns[0]), int(eid[0])) <= (last_ts, last_eid)
        ):
            raise ValueError(
                "cusum stream: trigger delivered rows at or before the "
                "already-folded (ts, event_id) frontier — the recurrence "
                "needs time-ordered trigger batches"
            )
        cents = pdf["cents"].to_numpy(np.int64)
        p = pt + np.cumsum(cents - ref)
        m = np.minimum.accumulate(np.minimum(p, mp))
        s = p - np.minimum(m, 0)
        state.update(
            (int(p[-1]), int(m[-1]), int(ts_ns[-1]), int(eid[-1]))
        )
        hit = s > h
        yield pd.DataFrame(
            {
                "event_id": eid[hit],
                "user_id": np.full(int(hit.sum()), key[0], np.int64),
                "cents": cents[hit],
                "cusum": s[hit],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
