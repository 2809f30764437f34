"""Similarity-search query inventory (north-star, SURVEY.md §2.11) over
``embeddings`` (array<float>, 64-dim).

- ``vector_cosine_topk``: brute-force cosine top-k against one query
  vector — the correctness baseline. The query vector is a 1-row
  broadcast; the scan side is embarrassingly parallel (no shuffle until
  the final TakeOrderedAndProject).
- ``vector_ann_ivf_bucketed``: the scale path — IVF-style bucketed
  similarity join. ``label`` plays the coarse-quantizer cell id (at
  production scale this is a k-means assignment step); candidates only
  meet within a cell, turning the quadratic cross join into a per-bucket
  equi-join.

Arithmetic is double on both engines; scores rounded to 4 places so
summation-order ulp drift can't flip the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import as_double, cosine
from ..sources.readers import load_table as t

QUERY_VEC_ID = 0
TOPK = 10
IVF_THRESHOLD = 0.9


def vector_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    )
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("v").alias("qv"))
    return (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine(F.col("v"), F.col("qv")), 4).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOPK)
    )


ORACLE_COSINE_TOPK = f"""
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
),
e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE vec_id <> {QUERY_VEC_ID}
)
SELECT vec_id,
       round(list_dot_product(v, qv)
             / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 4)
           AS cosine
FROM e, q
ORDER BY cosine DESC, vec_id ASC
LIMIT {TOPK}
"""


def vector_ann_ivf_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double("embedding").alias("v")
    )
    a = emb.alias("a")
    b = emb.alias("b")
    cos = cosine(F.col("a.v"), F.col("b.v"))
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos >= IVF_THRESHOLD)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            F.round(cos, 4).alias("cosine"),
        )
    )


ORACLE_ANN_IVF = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4)
           AS cosine
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
      >= {IVF_THRESHOLD}
"""


QUERIES = {
    "vector_cosine_topk": vector_cosine_topk,
    "vector_ann_ivf_bucketed": vector_ann_ivf_bucketed,
}

ORACLE = {
    "vector_cosine_topk": ORACLE_COSINE_TOPK,
    "vector_ann_ivf_bucketed": ORACLE_ANN_IVF,
}
