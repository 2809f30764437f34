"""Multimodal query inventory (north-star, SURVEY.md §2.11d).

``multimodal_images`` is the binary media column end-to-end with REAL
codecs over a MIXED-format corpus: a mapInPandas encode kernel writes
genuine uncompressed 24-bit BMP files (doc_id % 3 == 0, stdlib
``struct``), genuine truecolor 8-bit PNG files (% 3 == 1, stdlib
``zlib`` — real chunk CRCs and DEFLATE stream), and genuine JPEG
files (% 3 == 2, the pure-numpy T.81 codec in ``operators/jpeg.py`` —
baseline at doc_id % 6 == 2, PROGRESSIVE SOF2 at % 6 == 5, both
reporting media_type 'jpeg' with dims from the real SOF header), a
mapInPandas decode kernel parses the actual
file headers back out of the bytes, then
JVM-side feature derivation and video-style frame sampling plumbing —
per-item frame counts expanded to sampled frame indices with
``sequence`` + ``explode`` (pure JVM; a real pipeline would join these
indices against a frame-extract mapInPandas kernel). The DuckDB oracle
recomputes the metadata analytically from both format specs (BMP:
54-byte headers + 4-byte-aligned BGR rows; PNG: chunk framing + zlib
level-0 stored-block arithmetic), so a hash match proves the bytes
really are well-formed image files of the right format and
round-tripped through the Arrow decode lane intact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    BMP_HEADER_BYTES,
    encode_media,
    media_features,
    with_media_meta,
)
from ..sources.readers import load_table as t

FRAME_BASE = 10
FRAME_MOD = 50
FRAME_STEP = 5

# Deterministic image dimensions, affine in doc_id — small enough that
# real pixel buffers stay cheap (≤ 64x48x3 ≈ 9 KB/image), large enough
# that width/height/aspect vary across the corpus.
BMP_WIDTH_BASE, BMP_WIDTH_MULT, BMP_WIDTH_MOD = 16, 7, 48
BMP_HEIGHT_BASE, BMP_HEIGHT_MULT, BMP_HEIGHT_MOD = 12, 13, 36


def multimodal_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        (F.lit(BMP_WIDTH_BASE) + (F.col("doc_id") * BMP_WIDTH_MULT) % BMP_WIDTH_MOD)
        .cast("int")
        .alias("width"),
        (
            F.lit(BMP_HEIGHT_BASE)
            + (F.col("doc_id") * BMP_HEIGHT_MULT) % BMP_HEIGHT_MOD
        )
        .cast("int")
        .alias("height"),
        # pixel seed: md5(text) digest, computed JVM-side
        F.unhex(F.md5(F.col("text"))).alias("payload"),
        # mixed-format corpus: doc_id % 3 -> bmp / png / jpeg, with the
        # jpeg third split between REAL baseline (doc_id % 6 == 2) and
        # REAL progressive SOF2 (doc_id % 6 == 5) encodings — both
        # parse back as media_type 'jpeg' (dims from the actual SOF /
        # SOF2 header), so the metadata contract and oracle are
        # untouched while the corpus carries both profiles
        F.when(F.col("doc_id") % 3 == 0, F.lit("bmp"))
        .when(F.col("doc_id") % 3 == 1, F.lit("png"))
        .when(F.col("doc_id") % 6 == 5, F.lit("jpeg_prog"))
        .otherwise(F.lit("jpeg"))
        .alias("fmt"),
    )
    # The codec kernel is CPU-bound; a single-file scan would hand it
    # one partition. Repartition the 28-byte seed rows (doc_id, dims,
    # md5 payload — the image BYTES don't exist yet, so nothing heavy
    # shuffles) so encode runs on every core — the same fan-out a real
    # cluster wants for per-item media work.
    with_media = encode_media(
        staged.repartition(spark.sparkContext.defaultParallelism)
    )
    # JPEG's entropy-coded size has no closed form, so the oracle can't
    # recompute it — publish NULL there; width/height still come from
    # the REAL SOF header of the REAL encoded file, so the hash gate
    # proves the bytes are well-formed baseline JPEGs of the right dims.
    feats = media_features(
        with_media_meta(with_media).withColumn(
            "n_bytes",
            F.when(F.col("media_type") == "jpeg", F.lit(None).cast("int")).otherwise(
                F.col("n_bytes")
            ),
        )
    )
    n_frames = F.lit(FRAME_BASE) + F.col("doc_id") % FRAME_MOD
    return feats.select(
        "*",
        n_frames.alias("n_frames"),
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), n_frames - 1, F.lit(FRAME_STEP))
        ).alias("frame_idx"),
    )


# n_bytes is each format's own arithmetic. BMP: 54 header bytes +
# height rows of 3*width bytes padded to 4-byte alignment. PNG:
# 63 fixed bytes (signature + IHDR/IDAT/IEND framing + zlib header
# and adler) + raw filtered scanlines (height * (1 + 3*width)) +
# 5 bytes per stored DEFLATE block (level-0 zlib, 65535-byte blocks).
ORACLE_IMAGES = f"""
WITH m AS (
  SELECT doc_id,
         CAST({BMP_WIDTH_BASE} + (doc_id * {BMP_WIDTH_MULT}) % {BMP_WIDTH_MOD} AS INT) AS width,
         CAST({BMP_HEIGHT_BASE} + (doc_id * {BMP_HEIGHT_MULT}) % {BMP_HEIGHT_MOD} AS INT) AS height
  FROM documents
)
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'bmp'
            WHEN doc_id % 3 = 1 THEN 'png'
            ELSE 'jpeg' END AS media_type,
       width, height,
       CAST(CASE WHEN doc_id % 3 = 0
                 THEN {BMP_HEADER_BYTES} + height * (((3 * width + 3) // 4) * 4)
                 WHEN doc_id % 3 = 1
                 THEN 63 + height * (1 + 3 * width)
                      + 5 * ((height * (1 + 3 * width) + 65534) // 65535)
                 ELSE NULL  -- JPEG entropy size has no closed form
            END AS INT) AS n_bytes,
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
