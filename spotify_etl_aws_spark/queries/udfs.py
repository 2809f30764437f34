"""UDF-surface query inventory (SURVEY.md §2.10) — the Arrow batch lane.

Both queries have exact SQL oracles: the pandas_udf scorer is the
numeric twin of the built-in ``text_quality_score`` (same tokenization,
same punctuation class), and the applyInPandas z-score matches windowed
``avg``/``stddev_samp``. That the Python-lane results hash-match the
SQL oracle is the point — the Arrow path is semantically transparent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.pandas_ops import (
    quality_score_udf,
    weighted_mean_udf,
    zscore_by_group,
)
from ..sources.readers import load_table as t


def udf_pandas_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas_udf scalar over documents.text."""
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.round(quality_score_udf(F.col("text")), 4).alias("quality_score"),
    )


ORACLE_PANDAS_QUALITY = r"""
WITH x AS (
  SELECT doc_id, text,
         string_split_regex(lower(text), '\s+') AS w,
         length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS n_punct
  FROM documents
)
SELECT doc_id,
       round(least(1.0, len(w) / 100.0) * (1 - n_punct / length(text)), 4)
           AS quality_score
FROM x
"""


def udf_group_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas group-map: z-score of event value within
    (event_type, day). The composite key keeps every pandas group
    bounded by the day boundary — the group count grows with data
    volume while each group's size stays fixed, so no single task ever
    materializes an unbounded frame.

    HONESTY NOTE: this query exists to exercise the §2.10 UDTF lane —
    for THIS computation the production choice is the pure-JVM window
    twin (``avg``/``stddev_samp`` over a window partitioned by the same
    key, zero Python round-trips, ~5x faster at sf0.1). Reach for
    applyInPandas only when the per-group logic genuinely needs pandas
    (model scoring, scipy, stateful per-group algorithms); z-scores do
    not. ``tests/test_edge_cases.py::test_zscore_udtf_matches_jvm_window_twin``
    pins that both formulations produce identical rows.

    Rounding happens JVM-side (``F.round``) for SQL half-away-from-zero
    semantics; ``+ 0.0`` after the round normalizes IEEE negative zero
    on both engines — a tiny negative z rounds to -0.0 in DuckDB but
    0.0 in Spark, equal as floats yet different under the harness's
    string/hash compare (surfaced by the sf0.1 full sweep, two rows)."""
    ev = t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "value",
    )
    z = zscore_by_group(
        ev,
        group_cols=["event_type", "day"],
        group_schema="event_type string, day string",
        id_col="event_id",
        value_col="value",
    )
    return z.select(
        "event_id",
        "event_type",
        "day",
        (F.round("zscore", 4) + F.lit(0.0)).alias("zscore"),
    )


ORACLE_GROUP_ZSCORE = """
SELECT event_id, event_type,
       strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       round((value - avg(value) OVER (PARTITION BY event_type, date_trunc('day', ts)))
             / stddev_samp(value) OVER (PARTITION BY event_type, date_trunc('day', ts)), 4)
           + 0.0
           AS zscore
FROM events
"""


def udf_grouped_agg_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas_udf (UDAF lane): quantity-weighted mean price
    per (returnflag, linestatus)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(
                weighted_mean_udf(F.col("l_extendedprice"), F.col("l_quantity")), 4
            ).alias("weighted_avg_price")
        )
    )


ORACLE_WEIGHTED_MEAN = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
           AS weighted_avg_price
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


QUERIES = {
    "udf_pandas_quality_score": udf_pandas_quality_score,
    "udf_group_zscore": udf_group_zscore,
    "udf_grouped_agg_weighted_mean": udf_grouped_agg_weighted_mean,
}

ORACLE = {
    "udf_pandas_quality_score": ORACLE_PANDAS_QUALITY,
    "udf_group_zscore": ORACLE_GROUP_ZSCORE,
    "udf_grouped_agg_weighted_mean": ORACLE_WEIGHTED_MEAN,
}
