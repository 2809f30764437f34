"""Training-order operators (north-star, SURVEY.md §2.11c): the step
between a curated corpus and the trainer's data loader — a
DETERMINISTIC global shuffle (epoch reproducibility, retry stability)
and domain interleaving (so a domain-grouped corpus doesn't feed the
model one domain at a time).

Same determinism doctrine as ``operators/splits.py``: ordering keys
are ``xxhash64(seed, id)`` — pure map-side expressions, reproducible
across runs/retries/partitionings, unlike ``rand()``. The only shuffle
is the one range-exchange any global order needs; at 100 TB that is
the unavoidable (and embarrassingly parallel) sort-by-key write.

A useful property of hash ordering, pinned in tests: appending new
documents to the corpus NEVER reorders existing ones relative to each
other (their keys don't change) — incremental corpus growth preserves
prior epoch order prefixes-modulo-insertions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def order_key(seed: int, id_col: str = "doc_id"):
    """The deterministic shuffle key: xxhash64(seed, id)."""
    return F.xxhash64(F.lit(seed), F.col(id_col))


def training_order(
    df: DataFrame, seed: int, id_col: str = "doc_id"
) -> DataFrame:
    """Rows in deterministic pseudo-random order for epoch ``seed``
    (ties on the hash broken by id, so the order is total)."""
    return df.orderBy(order_key(seed, id_col), F.col(id_col))


def write_training_shards(
    df: DataFrame,
    path: str,
    seed: int,
    num_shards: int = 32,
    id_col: str = "doc_id",
) -> None:
    """Materialize the epoch order as ``num_shards`` parquet files a
    sequential reader can stream in order: one range shuffle on the
    hash key (balanced shards), sorted within shards, key dropped."""
    key = order_key(seed, id_col).alias("__order")
    (
        df.withColumn("__order", key)
        .repartitionByRange(num_shards, "__order")
        .sortWithinPartitions("__order", id_col)
        .drop("__order")
        .write.mode("overwrite")
        .parquet(path)
    )


def interleave_domains(
    df: DataFrame,
    domain_col: str,
    seed: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Round-robin the domains: row r of every domain (in per-domain
    deterministic shuffle order) sorts before row r+1 of any domain, so
    a batch reader sees domains interleaved as evenly as their sizes
    allow instead of one domain's documents in a run. One window
    shuffle on the domain key + the final order."""
    w = Window.partitionBy(domain_col).orderBy(
        order_key(seed, id_col), F.col(id_col)
    )
    return (
        df.withColumn("__rr", F.row_number().over(w))
        .orderBy("__rr", order_key(seed, id_col), F.col(id_col))
        .drop("__rr")
    )
