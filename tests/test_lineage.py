"""operators/lineage.py — the centralized lineage-cut helper (r15).

Every mode must return the same rows as the frame it wraps, the
default mode must be the localCheckpoint the ~50 former direct call
sites used, and the mode switch must be a runtime conf (no session
restart). A misconfigured reliable mode must fail loudly, not fall
back silently.

Ordering note: the raise-without-dir test runs BEFORE any reliable-
mode success test because a successful reliable cut sets the session's
checkpoint dir for good.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spotify_etl_aws_spark.operators.lineage import (
    DIR_CONF,
    MODE_CONF,
    cut_lineage,
    cut_lineage_eager,
)


def _frame(spark):
    return (
        spark.range(0, 1000)
        .select(
            F.col("id"),
            (F.col("id") % 7).alias("k"),
            F.md5(F.col("id").cast("string")).alias("h"),
        )
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def reset_mode(spark):
    yield
    spark.conf.set(MODE_CONF, "local")


def test_reliable_mode_without_dir_raises(spark, reset_mode):
    if spark.sparkContext.getCheckpointDir() is not None:
        pytest.skip("session already has a checkpoint dir")
    spark.conf.set(MODE_CONF, "reliable")
    spark.conf.unset(DIR_CONF)
    with pytest.raises(ValueError, match=DIR_CONF):
        _frame(spark).transform(cut_lineage)


def test_unknown_mode_raises(spark, reset_mode):
    spark.conf.set(MODE_CONF, "quantum")
    with pytest.raises(ValueError, match="quantum"):
        _frame(spark).transform(cut_lineage)


def test_default_mode_is_local_checkpoint(spark, reset_mode):
    spark.conf.unset(MODE_CONF)
    out = _frame(spark).transform(cut_lineage)
    # lineage is cut: the plan scans materialized blocks, not range()
    assert "ExistingRDD" in out._jdf.queryExecution().executedPlan().toString()
    assert _rows(out) == _rows(_frame(spark))


@pytest.mark.parametrize("mode", ["local", "reliable", "persist"])
def test_modes_return_identical_rows(spark, tmp_path, mode, reset_mode):
    spark.conf.set(MODE_CONF, mode)
    if mode == "reliable":
        spark.conf.set(DIR_CONF, str(tmp_path / "ckpt"))
    want = _rows(_frame(spark))
    lazy = _frame(spark).transform(cut_lineage)
    eager = _frame(spark).transform(cut_lineage_eager)
    assert _rows(lazy) == want
    assert _rows(eager) == want
    if mode == "persist":
        lazy.unpersist()
        eager.unpersist()


def test_persist_mode_keeps_plan_statistics(spark, reset_mode):
    # the reason persist mode exists: unlike a checkpoint's ExistingRDD,
    # the persisted frame still reports size stats so downstream
    # broadcast-join planning survives (triangle_count lesson, r14)
    spark.conf.set(MODE_CONF, "persist")
    out = _frame(spark).transform(cut_lineage)
    assert "ExistingRDD" not in out._jdf.queryExecution().executedPlan().toString()
    out.unpersist()
