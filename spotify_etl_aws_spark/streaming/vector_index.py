"""Incremental IVF index maintenance: the streaming half of the ANN
lane (north-star §2.11b). The batch build (``queries/vector.py:
_ivf_index_path``) assigns the whole corpus once; real pipelines keep
INDEXING as embeddings land — this module appends each new wave into
the same cell-partitioned layout with exactly-once visibility.

Shape, reusing the engine's established postures:

- source: checkpointed AvailableNow parquet file stream — each FILE
  indexed once, the ``incremental_bronze`` pattern;
- assignment: the same Arrow GEMM kernel as the batch build
  (``operators/vector_ops.py:assign_cells_arrow``) against a FROZEN
  quantizer (the model is fit once, like the tokenizer — re-fitting
  per batch would silently shift cell boundaries between waves and
  make old and new assignments incomparable);
- sink: ``commit_epoch`` — each batch lands as
  ``ivf_index/epoch=N/cell=C/`` behind the manifest marker, so a
  crashed batch is invisible and a replayed one overwrites itself;
- search: ``read_committed_epochs`` + the probe-cell filter. Both
  ``epoch`` and ``cell`` are partition columns, so a probe reads
  nprobe/k of the files of committed epochs only — scan-time pruning
  on both axes.

The small-file cost of many epochs is the normal maintenance story:
``compact_dataset`` (sources/sinks.py) bin-packs old epochs; the
index stays a plain-parquet dataset throughout.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import cosine
from ..operators.vector_ops import assign_cells_arrow
from ..sources.sinks import commit_epoch, read_committed_epochs

INDEX_DATASET = "ivf_index"


def incremental_vector_index(
    spark: SparkSession,
    emb_dir: str,
    out_root: str,
    cents: list[tuple[int, list[float]]],
    checkpoint_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Drain all embedding files currently in ``emb_dir`` into the
    incremental index (AvailableNow), then stop. Re-running after new
    files land indexes ONLY the new files (checkpointed source);
    re-running after a crash replays the wedged batch idempotently
    (epoch commit). Zero-norm vectors are dropped by the assignment
    kernel — the documented index contract."""
    from ..schemas import TESTDATA_SCHEMAS

    stream = (
        spark.readStream.schema(TESTDATA_SCHEMAS["embeddings"])
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(emb_dir)
    )

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        assigned = assign_cells_arrow(
            batch_df.select(
                F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
            ),
            cents,
        ).select("vec_id", "v", "cell")

        def write_index(stage_path: str) -> None:
            assigned.write.mode("overwrite").partitionBy("cell").parquet(
                stage_path
            )

        commit_epoch(
            out_root,
            epoch_id,
            {f"{INDEX_DATASET}/epoch={epoch_id}": write_index},
        )

    (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def search_incremental_index(
    spark: SparkSession,
    out_root: str,
    cents: list[tuple[int, list[float]]],
    query_vec: list[float],
    topk: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """Top-k (vec_id, cosine) over every COMMITTED epoch of the
    incremental index: probe-cell selection is the same driver-side
    model-state math as the batch lane, the scan prunes on epoch
    (committed markers) AND cell (probe set), scoring is JVM
    expressions over the probed rows only, and the top-k is
    orderBy+limit (TakeOrderedAndProject). Ties order by vec_id for
    determinism."""
    from ..queries.vector import _probe_cells

    qn = math.sqrt(sum(x * x for x in query_vec))
    if qn == 0.0:
        raise ValueError("query vector has zero norm: cosine undefined")
    probe = _probe_cells(cents, query_vec, nprobe)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    idx = read_committed_epochs(spark, out_root, INDEX_DATASET).filter(
        F.col("cell").isin(probe)
    )
    return (
        idx.select(
            "vec_id",
            (F.round(cosine(F.col("v"), q), 4) + F.lit(0.0)).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(topk)
    )


def index_stats(spark: SparkSession, out_root: str) -> DataFrame:
    """(epoch, cell, n_vectors) — the maintenance view: which epochs
    are visible and how the cells fill up (feeds the compaction
    decision). One partial-agg pass over index FOOTER-cheap columns."""
    return (
        read_committed_epochs(spark, out_root, INDEX_DATASET)
        .groupBy("epoch", "cell")
        .agg(F.count("*").alias("n_vectors"))
    )
