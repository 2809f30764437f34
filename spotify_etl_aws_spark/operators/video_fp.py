"""Video clip near-duplicate detection (north-star, SURVEY.md
§2.11a/§2.11d intersection): find re-uploaded / lightly-edited clips
in a binary video column without an all-pairs scan.

The fingerprint is the standard frame-signature stack (the shape of
every production video-dedup system, e.g. the reference
implementations around TMK and frame-wise pHash): decode the clip,
perceptual-hash EVERY frame (the image lane's dHash —
``operators/phash.py:dhash_pixels``), then declare two clips
near-duplicates when at least ``min_frames`` temporally-ALIGNED frame
pairs match within Hamming ``frame_distance``. Temporal alignment is
the contract (same frame_idx compares against same frame_idx — the
re-encode/re-upload scenario); shifted/trimmed alignment is a
different operator (the DTW lane covers warped alignment for
sequences).

Scale shape:

- ``frame_hashes`` is a mapInPandas kernel: one clip in, F (frame_idx,
  56-bit hash) rows out. A million clips cost a million independent
  decodes across the cluster; only 16-byte rows shuffle.
- ``clip_near_pairs`` runs the SAME multi-probe banded join the
  image/audio lanes ride, with frame_idx in the join key — candidates
  only meet when the SAME temporal position collides, then one
  groupBy counts verified frame matches per (clip_a, clip_b).
  Pigeonhole gives exact recall PER FRAME (frame_distance <
  bands * (probe_radius+1)), and the count of exactly-found frame
  matches makes the clip-level predicate exact too.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .phash import HASH_BITS, dhash_pixels, id_ddl
from .lineage import cut_lineage


def clip_frame_pixels(data: bytes):
    """Yield (frame_idx, (h, w, 3) uint8 array) for one encoded clip —
    the container-dispatch seam: animated GIF (composited frames, via
    operators/gif.py) and RIFF/AVI carrying Motion-JPEG (index-seeked
    per-frame JPEG decode, via operators/video.py + operators/jpeg.py)
    both decode here; inter-frame codecs (H.264/VP9/AV1) raise inside
    ``parse_avi`` at the documented ffmpeg/PyAV seam."""
    import numpy as np

    if data[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import gif_frames, gif_scan_meta

        w, h, _nf, _loop = gif_scan_meta(data)
        for fi, (_delay, rgb) in enumerate(gif_frames(data)):
            yield fi, np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
    elif data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        from .jpeg import decode_jpeg
        from .video import extract_frame, parse_avi

        meta = parse_avi(data)
        for fi in range(meta.n_frames):
            jw, jh, rgb = decode_jpeg(extract_frame(data, meta, fi))
            yield fi, np.frombuffer(rgb, dtype=np.uint8).reshape(jh, jw, 3)
    else:
        raise ValueError(
            "clip_frame_pixels: unsupported container (need GIF87a/"
            "GIF89a or RIFF/AVI MJPG; inter-frame codecs plug in at "
            "the parse_avi seam)"
        )


def frame_hashes(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    rows: int = 8,
    cols: int = 8,
) -> DataFrame:
    """(id, media binary) -> (id, frame_idx, fhash) — one row per
    decoded frame of the clip (animated GIF or AVI/MJPEG — see
    ``clip_frame_pixels``), hashed with the image lane's dHash.
    Container parity is pinned in tests: the same frame content
    through either container yields identical hashes, so near-dup
    pairs survive a container re-mux."""
    import pandas as pd

    proj = df.select(F.col(id_col).alias("__id"), F.col(media_col).alias("__m"))

    def _hash(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, idxs, hs = [], [], []
            for did, blob in zip(pdf["__id"], pdf["__m"]):
                for fi, px in clip_frame_pixels(bytes(blob)):
                    ids.append(did)
                    idxs.append(fi)
                    hs.append(dhash_pixels(px, rows, cols))
            yield pd.DataFrame({"__id": ids, "frame_idx": idxs, "fhash": hs})

    out = proj.mapInPandas(
        _hash,
        schema=f"__id {id_ddl(df, id_col)}, frame_idx long, fhash long",
    )
    return out.select(F.col("__id").alias(id_col), "frame_idx", "fhash")


def clip_near_pairs(
    frames: DataFrame,
    id_col: str = "doc_id",
    frame_distance: int = 4,
    min_frames: int = 4,
    bits: int = HASH_BITS,
    bands: int = 4,
    probe_radius: int = 1,
) -> DataFrame:
    """All (id_a < id_b) clip pairs with >= ``min_frames`` temporally-
    aligned frames within Hamming ``frame_distance``. Input is
    ``frame_hashes`` output (id, frame_idx, fhash). Returns
    (id_a, id_b, matching_frames)."""
    if probe_radius not in (0, 1):
        raise ValueError(
            f"clip_near_pairs: probe_radius must be 0 or 1, got {probe_radius}"
        )
    if frame_distance >= bands * (probe_radius + 1):
        raise ValueError(
            f"clip_near_pairs: pigeonhole exactness needs frame_distance "
            f"({frame_distance}) < bands * (probe_radius+1) "
            f"({bands} * {probe_radius + 1})"
        )
    if bits % bands:
        raise ValueError(f"bits ({bits}) must divide into bands ({bands})")
    # single materialization of the per-frame hash frame: it is
    # referenced three times below (band index/probe, both temporal
    # verify sides) and its lineage is the full GIF/AVI decode + dHash
    # Python pipeline — without the checkpoint that pipeline executes
    # once per reference (r14: measured 5.2 s -> 2.4 s on
    # dedup_video_clips at sf0.1; guide §8 proxy pattern)
    frames = frames.transform(cut_lineage)
    width = bits // bands
    mask = (1 << width) - 1
    h = F.col("fhash")
    band_rows = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned(h, b * width)
            .bitwiseAND(F.lit(mask))
            .alias("band_val"),
        )
        for b in range(bands)
    ]
    bb = frames.select(
        F.col(id_col), "frame_idx", F.explode(F.array(*band_rows)).alias("bb")
    ).select(
        id_col,
        "frame_idx",
        F.col("bb.band").alias("band"),
        F.col("bb.band_val").alias("band_val"),
    )
    probe = bb
    if probe_radius == 1:
        variants = F.array(
            F.col("band_val"),
            *[
                F.col("band_val").bitwiseXOR(F.lit(1 << j))
                for j in range(width)
            ],
        )
        probe = bb.select(
            id_col, "frame_idx", "band", F.explode(variants).alias("band_val")
        )
    a = probe.select(
        F.col(id_col).alias("id_a"), "frame_idx", "band", "band_val"
    )
    b = bb.select(
        F.col(id_col).alias("id_b"), "frame_idx", "band", "band_val"
    )
    # candidates: same temporal position, colliding (possibly probed)
    # band. Without probing every collision surfaces symmetrically, so
    # id_a < id_b alone dedups orientations (the phash lane's cheap
    # branch); with probing a pair may surface only as probe->index,
    # so both orientations are kept, normalized, deduped.
    if probe_radius == 0:
        cand = (
            a.join(b, ["frame_idx", "band", "band_val"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("frame_idx", "id_a", "id_b")
            .distinct()
        )
    else:
        cand = (
            a.join(b, ["frame_idx", "band", "band_val"])
            .filter(F.col("id_a") != F.col("id_b"))
            .select(
                "frame_idx",
                F.least("id_a", "id_b").alias("id_a"),
                F.greatest("id_a", "id_b").alias("id_b"),
            )
            .distinct()
        )
    ha = frames.select(
        F.col(id_col).alias("id_a"),
        F.col("frame_idx"),
        F.col("fhash").alias("__ha"),
    )
    hb = frames.select(
        F.col(id_col).alias("id_b"),
        F.col("frame_idx"),
        F.col("fhash").alias("__hb"),
    )
    matched = (
        cand.join(ha, ["id_a", "frame_idx"])
        .join(hb, ["id_b", "frame_idx"])
        .filter(
            F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb")))
            <= frame_distance
        )
    )
    return (
        matched.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("matching_frames"))
        .filter(F.col("matching_frames") >= min_frames)
    )
