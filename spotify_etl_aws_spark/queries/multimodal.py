"""Multimodal query inventory (north-star, SURVEY.md §2.11d).

``multimodal_images`` is the binary media column end-to-end: JVM-side
encode into bytes, mapInPandas decode back out, JVM-side feature
derivation, then video-style frame sampling plumbing — per-item frame
counts expanded to sampled frame indices with ``sequence`` + ``explode``
(pure JVM; a real pipeline would join these indices against a
frame-extract mapInPandas kernel). The DuckDB oracle recomputes the
metadata analytically, so a hash match proves the bytes round-tripped
through the Arrow decode lane intact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    HEIGHT_BASE,
    HEIGHT_MULT,
    HEIGHT_MOD,
    MEDIA_MAGIC,
    PAYLOAD_BYTES,
    WIDTH_BASE,
    WIDTH_MULT,
    WIDTH_MOD,
    fake_image_bytes,
    media_features,
    with_media_meta,
)
from ..sources.readers import load_table as t

FRAME_BASE = 10
FRAME_MOD = 50
FRAME_STEP = 5


def multimodal_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    with_media = docs.select(
        "doc_id", fake_image_bytes(F.col("doc_id"), F.col("text")).alias("media")
    )
    feats = media_features(with_media_meta(with_media))
    n_frames = F.lit(FRAME_BASE) + F.col("doc_id") % FRAME_MOD
    return feats.select(
        "*",
        n_frames.alias("n_frames"),
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), n_frames - 1, F.lit(FRAME_STEP))
        ).alias("frame_idx"),
    )


ORACLE_IMAGES = f"""
WITH m AS (
  SELECT doc_id,
         CAST({WIDTH_BASE} + (doc_id * {WIDTH_MULT}) % {WIDTH_MOD} AS INT) AS width,
         CAST({HEIGHT_BASE} + (doc_id * {HEIGHT_MULT}) % {HEIGHT_MOD} AS INT) AS height
  FROM documents
)
SELECT doc_id, '{MEDIA_MAGIC.lower()}' AS media_type, width, height,
       CAST(length('{MEDIA_MAGIC}:' || width || ':' || height || ':')
            + {PAYLOAD_BYTES} AS INT) AS n_bytes,
       round(width / height, 4) AS aspect_ratio,
       CAST(width * height AS INT) AS n_pixels,
       CASE WHEN width / height >= 1.0 THEN 'landscape' ELSE 'portrait' END
           AS orientation,
       {FRAME_BASE} + doc_id % {FRAME_MOD} AS n_frames,
       unnest(range(0, {FRAME_BASE} + doc_id % {FRAME_MOD}, {FRAME_STEP})) AS frame_idx
FROM m
"""


QUERIES = {
    "multimodal_images": multimodal_images,
}

ORACLE = {
    "multimodal_images": ORACLE_IMAGES,
}
