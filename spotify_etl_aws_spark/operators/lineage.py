"""Single-materialization lineage cuts, centrally managed (r15;
guide §5 "Caching", §8 "decide with small rows").

The engine's dominant optimization pattern is materializing a shared
proxy frame once (decode outputs, signatures, per-doc aggregates,
iteration states) so several consumers — or iterations — don't re-run
expensive lineage. Every such site routes through this module instead
of calling ``DataFrame.localCheckpoint`` directly, so the storage
policy is ONE deployment decision instead of ~50 scattered call sites.

Mode is read per-call from the Spark conf ``spark.graft.lineage.mode``
(runtime-settable, no session restart):

- ``local`` (default): ``localCheckpoint`` — executor-local blocks,
  cheapest, zero external storage. Two costs, measured in r14: the
  blocks die with their executor (spot kills / dynamic allocation make
  the frame unrecoverable mid-query), and an ExistingRDD scan has no
  size statistics, so Catalyst can demote downstream broadcast joins
  to sort-merge (triangle_count: 2.66 s -> 4.80 s when checkpointed —
  that operator deliberately does NOT cut lineage).
- ``reliable``: ``DataFrame.checkpoint`` to
  ``spark.graft.lineage.checkpointDir`` (HDFS/S3/DBFS) — survives
  executor loss; the right mode for long jobs under dynamic allocation
  at the 100 TB target. The directory conf must be set (or
  ``sparkContext.setCheckpointDir`` already called).
- ``persist``: ``persist(MEMORY_AND_DISK_2)`` — 2x-replicated blocks,
  survives single-executor loss, and KEEPS lineage + plan statistics
  (no ExistingRDD). Middle ground when external checkpoint storage is
  unavailable; re-derives from lineage only on double failure.

Eagerness stays a per-site decision (it is a scheduling property, not
a storage property): the lazy form defers materialization to the first
consumer so no dedicated job dispatches — the r14 rule that every
iterative operator relies on.

Usage (postfix, reads like the method call it replaces):

    frame = expensive.transform(cut_lineage)        # lazy
    frame = expensive.transform(cut_lineage_eager)  # materialize now
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

MODE_CONF = "spark.graft.lineage.mode"
DIR_CONF = "spark.graft.lineage.checkpointDir"


def _cut(df: DataFrame, eager: bool) -> DataFrame:
    spark = df.sparkSession
    mode = spark.conf.get(MODE_CONF, "local")
    if mode == "local":
        return df.localCheckpoint(eager=eager)
    if mode == "reliable":
        sc = spark.sparkContext
        if sc.getCheckpointDir() is None:
            ckpt_dir = spark.conf.get(DIR_CONF, None)
            if ckpt_dir is None:
                raise ValueError(
                    f"{MODE_CONF}=reliable requires {DIR_CONF} "
                    "(or an explicit sparkContext.setCheckpointDir)"
                )
            sc.setCheckpointDir(ckpt_dir)
        return df.checkpoint(eager=eager)
    if mode == "persist":
        out = df.persist(StorageLevel.MEMORY_AND_DISK_2)
        if eager:
            out.count()  # populate the replicated cache now
        return out
    raise ValueError(
        f"unknown {MODE_CONF}={mode!r}; expected local|reliable|persist"
    )


def cut_lineage(df: DataFrame) -> DataFrame:
    """Materialize ``df`` once for multi-consumer / iterative reuse,
    LAZILY — blocks are computed and stored by the first action that
    touches them (no dedicated job). Default mode: localCheckpoint."""
    return _cut(df, eager=False)


def cut_lineage_eager(df: DataFrame) -> DataFrame:
    """Materialize ``df`` NOW (runs a job). Use when the caller needs
    the frame's cost paid up front (e.g. before timing a consumer, or
    before the source frame's temp state dies)."""
    return _cut(df, eager=True)
