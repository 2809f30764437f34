"""Similarity-search query inventory (north-star, SURVEY.md §2.11) over
``embeddings`` (array<float>, 64-dim).

- ``vector_cosine_topk``: brute-force cosine top-k against one query
  vector — the correctness baseline. The query vector is a 1-row
  broadcast; the scan side is embarrassingly parallel (no shuffle until
  the final TakeOrderedAndProject).
- ``vector_ann_ivf_bucketed``: the scale path — IVF-style bucketed
  similarity join with a *computed* coarse quantizer: the first
  ``NUM_CENTROIDS`` vectors act as centroids (deterministic stand-in for
  a k-means step at production scale), every vector is assigned to its
  argmax-cosine cell entirely map-side (centroids collapse to ONE
  broadcast array row; assignment is ``transform`` + ``array_max``, no
  shuffle), and candidates only meet within a cell — the quadratic cross
  join becomes a per-cell equi-join.

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
NUM_CENTROIDS = 8
IVF_THRESHOLD = 0.35


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
        "vec_id", as_double("embedding").alias("v")
    )
    # Coarse quantizer: centroids collapse to a single array row that is
    # broadcast to every task; cell assignment is a pure projection
    # (transform + array_max argmax, ties -> lowest cell id). Zero
    # shuffles until the per-cell candidate join.
    cents = (
        emb.filter(F.col("vec_id") < NUM_CENTROIDS)
        .select(F.struct(F.col("vec_id").alias("cell"), F.col("v").alias("cv")).alias("c"))
        .agg(F.collect_list("c").alias("cents"))
    )
    best = F.array_max(
        F.transform(
            F.col("cents"),
            lambda c: F.struct(
                cosine(F.col("v"), c["cv"]).alias("cs"),
                (-c["cell"]).alias("nc"),
            ),
        )
    )
    assign = (
        emb.crossJoin(F.broadcast(cents))
        .select("vec_id", "v", (-best["nc"]).alias("cell"))
    )
    a = assign.alias("a")
    b = assign.alias("b")
    cos = cosine(F.col("a.v"), F.col("b.v"))
    return (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos >= IVF_THRESHOLD)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.cell").alias("cell"),
            F.round(cos, 4).alias("cosine"),
        )
    )


ORACLE_ANN_IVF = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
c AS (
  SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < {NUM_CENTROIDS}
),
scored AS (
  SELECT e.vec_id, e.v, c.cell,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY list_dot_product(e.v, c.cv)
                    / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
                    c.cell ASC) AS rn
  FROM e, c
),
assign AS (
  SELECT vec_id, v, cell FROM scored WHERE rn = 1
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.cell AS cell,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4)
           AS cosine
FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
      >= {IVF_THRESHOLD}
"""


def vector_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise mean embedding per label — the k-means E-step /
    centroid-refresh building block behind a production IVF quantizer.

    posexplode flattens (vector, dim) pairs; the mean is one partial-
    aggregating shuffle on (label, dim) — dimension count scales the row
    volume linearly, never the shuffle count."""
    emb = t(spark, sf_dir, "embeddings").select(
        "label", as_double("embedding").alias("v")
    )
    return (
        emb.select("label", F.posexplode("v").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg("x"), 6).alias("centroid"))
    )


ORACLE_LABEL_CENTROIDS = """
WITH e AS (
  SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
flat AS (
  SELECT label, CAST(u.i - 1 AS INT) AS dim, v[u.i] AS x
  FROM e, unnest(generate_series(1, len(v))) AS u(i)
)
SELECT label, dim, round(avg(x), 6) AS centroid
FROM flat
GROUP BY label, dim
"""


QUERIES = {
    "vector_cosine_topk": vector_cosine_topk,
    "vector_ann_ivf_bucketed": vector_ann_ivf_bucketed,
    "vector_label_centroids": vector_label_centroids,
}

ORACLE = {
    "vector_cosine_topk": ORACLE_COSINE_TOPK,
    "vector_ann_ivf_bucketed": ORACLE_ANN_IVF,
    "vector_label_centroids": ORACLE_LABEL_CENTROIDS,
}
