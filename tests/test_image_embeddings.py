"""Image embeddings (operators/multimodal.py:image_embeddings): the
block-mean fingerprint is stable across encodings and resizes, ranks
near-duplicate images first, and feeds the vector lane."""

from __future__ import annotations

import numpy as np
import pytest

from spotify_etl_aws_spark.operators.multimodal import (
    encode_bmp,
    encode_png,
    image_embeddings,
)


def _pixels(seed: int, w: int = 32, h: int = 24) -> bytes:
    """Structured like a photo, and structurally DISTINCT per seed:
    the gradient orientation, frequency and channel mix all derive
    from the seed (noise alone would average away under block means)."""
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 2 * np.pi, w)[None, :, None]
    y = np.linspace(0, 2 * np.pi, h)[:, None, None]
    fx, fy = 0.5 + (seed % 5), 0.5 + (seed % 3)
    mix = rng.uniform(0.2, 1.0, 3)[None, None, :]
    base = 128 + 100 * np.sin(fx * x + fy * y + seed) * mix
    img = np.clip(base + rng.normal(0, 12, (h, w, 3)), 0, 255)
    return img.astype(np.uint8).tobytes()


def test_same_frame_different_codecs_land_together(spark):
    px_a = _pixels(1)
    px_b = _pixels(99)
    # the same VISUAL frame: BMP payloads are BGR, PNG payloads RGB
    px_a_bgr = (
        np.frombuffer(px_a, np.uint8).reshape(24, 32, 3)[:, :, ::-1].tobytes()
    )
    rows = [
        (1, encode_bmp(32, 24, px_a_bgr)),
        (2, encode_png(32, 24, px_a)),   # same frame, different codec
        (3, encode_png(32, 24, px_b)),   # different frame
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, media binary")
    got = {
        r.doc_id: np.array(r.embedding, dtype=np.float64)
        for r in image_embeddings(df).collect()
    }
    assert all(v.shape == (48,) for v in got.values())
    assert all(abs(np.linalg.norm(v) - 1.0) < 1e-5 for v in got.values())
    # BMP stores BGR bottom-up; PNG RGB top-down — the kernel must
    # normalize both, so the same frame matches across codecs...
    cos_same = float(got[1] @ got[2])
    cos_diff = float(got[1] @ got[3])
    assert cos_same > 0.98 > cos_diff


def test_resized_copy_is_nearest_neighbor(spark):
    from spotify_etl_aws_spark.operators.multimodal import resize_media

    rows = [(i, encode_bmp(32, 24, _pixels(i))) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id bigint, media binary")
    # doc 100 = doc 7 resized to 16x12 (re-sampled, new bytes)
    small = resize_media(df.filter("doc_id = 7"), 16, 12).selectExpr(
        "cast(100 as bigint) as doc_id", "media"
    )
    emb = image_embeddings(df.unionByName(small))
    got = {
        r.doc_id: np.array(r.embedding, dtype=np.float64)
        for r in emb.collect()
    }
    q = got[100]
    sims = {k: float(q @ v) for k, v in got.items() if k != 100}
    assert max(sims, key=sims.get) == 7
    # nearest-neighbor downsampling aliases the pattern slightly; the
    # match must still be decisively closer than any other image
    others = sorted(v for k, v in sims.items() if k != 7)
    assert sims[7] > 0.8 and sims[7] > others[-1] + 0.2


def test_invalid_grid_raises(spark):
    df = spark.createDataFrame([(1, b"x")], "doc_id bigint, media binary")
    with pytest.raises(ValueError, match="grid"):
        image_embeddings(df, grid=0)


def test_tiny_images_never_emit_nan(spark):
    """Review fix: sub-grid images (1x1 tracking pixels) must embed as
    finite vectors, not NaNs that poison every cosine downstream."""
    rows = [
        (1, encode_bmp(1, 1, b"\x10\x20\x30")),
        (2, encode_png(2, 3, bytes(range(18)))),
        (3, encode_bmp(32, 24, _pixels(3))),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, media binary")
    got = {
        r.doc_id: np.array(r.embedding, dtype=np.float64)
        for r in image_embeddings(df).collect()
    }
    for v in got.values():
        assert np.isfinite(v).all()
        # unit norm (channel variation survives centering even for a
        # 1x1 image): the vector is usable, not degenerate
        assert abs(np.linalg.norm(v) - 1.0) < 1e-6
