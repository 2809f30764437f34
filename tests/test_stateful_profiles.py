"""Composite-state streaming profile operators
(``streaming/stateful.py``): the declared GroupState lane's fold
semantics, and the transformWithStateInPandas twin's documented
environment seam."""

from __future__ import annotations

import pytest

from spotify_etl_aws_spark.streaming.stateful import (
    user_type_profiles,
    user_type_profiles_gs,
)


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def test_gs_profiles_equal_batch_aggregate(spark, sf_dir):
    """A complete AvailableNow pass over the events stream must emit
    exactly the batch per-user profile (count, distinct types, modal
    type with smallest-string tie-break)."""
    from pyspark.sql import functions as F

    from spotify_etl_aws_spark.sources.readers import load_table
    from spotify_etl_aws_spark.streaming.pipeline import (
        read_table_stream,
        run_available_now,
    )

    src = read_table_stream(spark, sf_dir, "events").select(
        "user_id", "event_type"
    )
    got = {
        r["user_id"]: (r["n_events"], r["n_types"], r["top_type"])
        for r in run_available_now(
            user_type_profiles_gs(src), "tws_test", output_mode="update"
        ).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").count()
    want = {}
    for r in per_type.collect():
        n, ntypes, top = want.get(r["user_id"], (0, 0, None))
        cand = (r["count"], r["event_type"])
        if top is None or (-cand[0], cand[1]) < (-top[0], top[1]):
            top = cand
        want[r["user_id"]] = (n + r["count"], ntypes + 1, top)
    want = {u: (n, t, top[1]) for u, (n, t, top) in want.items()}
    assert got == want


def test_tws_twin_builds_plan(spark, sf_dir):
    """The transformWithStateInPandas twin must construct its lazy
    plan with the contracted schema in ANY environment — the protobuf
    requirement bites only at stream start (the documented seam)."""
    from spotify_etl_aws_spark.streaming.pipeline import read_table_stream

    src = read_table_stream(spark, sf_dir, "events").select(
        "user_id", "event_type"
    )
    df = user_type_profiles(src)
    assert [f.name for f in df.schema.fields] == [
        "user_id",
        "n_events",
        "n_types",
        "top_type",
    ]
    assert df.isStreaming


def test_tws_twin_executes_or_hits_documented_seam(spark, sf_dir):
    """With protobuf present the twin must produce the batch-equal
    profile; without it the stream must fail with EXACTLY the
    documented driver-worker init error — any other failure mode means
    the seam docstring is stale."""
    from spotify_etl_aws_spark.streaming.pipeline import (
        read_table_stream,
        run_available_now,
    )

    src = read_table_stream(spark, sf_dir, "events").select(
        "user_id", "event_type"
    )
    if _has_protobuf():
        out = run_available_now(
            user_type_profiles(src), "tws_real", output_mode="update"
        )
        assert out.count() > 0
    else:
        with pytest.raises(Exception) as exc:
            run_available_now(
                user_type_profiles(src), "tws_real", output_mode="update"
            )
        msg = str(exc.value)
        assert (
            "STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE" in msg
            or "TransformWithState" in msg
        ), msg[:500]
