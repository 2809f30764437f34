"""Audio/video embeddings (operators/audio.py, operators/video.py):
duration/rate-invariant audio fingerprints and frame-pooled video
fingerprints, both unit-norm vector-lane inputs."""

from __future__ import annotations

import numpy as np
import pytest

from spotify_etl_aws_spark.operators.audio import (
    audio_embeddings,
    encode_wav,
    resample_audio,
)
from spotify_etl_aws_spark.operators.video import (
    encode_avi_mjpeg,
    video_embeddings,
)


def _tone(seed: int, n: int = 8000, rate: int = 8000) -> bytes:
    """Seed-dependent BURST pattern: per time-segment on/off amplitude
    and low/high frequency chosen by seed bits — clips differ in
    exactly the energy-profile and ZCR features the embedding reads."""
    rng = np.random.default_rng(seed)
    segs = 16
    bits = rng.integers(0, 2, (segs, 2))
    x = np.zeros(n)
    for s in range(segs):
        lo, hi = s * n // segs, (s + 1) * n // segs
        t = np.arange(lo, hi) / rate
        freq = 200.0 if bits[s, 1] == 0 else 1600.0
        amp = 0.15 if bits[s, 0] == 0 else 0.95
        x[lo:hi] = amp * np.sin(2 * np.pi * freq * t)
    x = x + rng.normal(0, 0.02, n)
    return (np.clip(x, -1, 1) * 20000).astype("<i2").tobytes()


def test_audio_embedding_invariances(spark):
    rows = [(i, encode_wav(8000, 8000, _tone(i))) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id bigint, audio binary")
    got = {
        r.doc_id: np.array(r.embedding, dtype=np.float64)
        for r in audio_embeddings(df).collect()
    }
    assert all(v.shape == (32,) for v in got.values())
    assert all(abs(np.linalg.norm(v) - 1.0) < 1e-6 for v in got.values())
    # a resampled copy of clip 3 must rank clip 3 first: the profile is
    # a fraction-of-clip feature, not a sample-index feature
    res = resample_audio(
        df.filter("doc_id = 3"), 4000
    ).selectExpr("cast(100 as bigint) as doc_id", "audio")
    got2 = {
        r.doc_id: np.array(r.embedding, dtype=np.float64)
        for r in audio_embeddings(df.unionByName(res)).collect()
    }
    q = got2[100]
    sims = {k: float(q @ v) for k, v in got2.items() if k != 100}
    assert max(sims, key=sims.get) == 3
    assert sims[3] > 0.9


def test_video_embedding_pools_sampled_frames(spark):
    from spotify_etl_aws_spark.operators.jpeg import encode_jpeg

    def frames(seed, n=12):
        r = np.random.default_rng(seed)
        base = r.integers(0, 256, (16, 16, 3)).astype(np.int32)
        out = []
        for i in range(n):
            f = np.clip(base + i, 0, 255).astype(np.uint8)  # slow drift
            out.append(encode_jpeg(16, 16, f.tobytes()))
        return out

    vids = [
        (1, encode_avi_mjpeg(frames(10), 10, 16, 16)),
        (2, encode_avi_mjpeg(frames(10), 10, 16, 16)),  # same scene
        (3, encode_avi_mjpeg(frames(55), 10, 16, 16)),  # different
    ]
    df = spark.createDataFrame(vids, "doc_id bigint, video binary")
    got = {
        r.doc_id: np.array(r.embedding, dtype=np.float64)
        for r in video_embeddings(df, every=4).collect()
    }
    assert all(abs(np.linalg.norm(v) - 1.0) < 1e-6 for v in got.values())
    assert float(got[1] @ got[2]) > 0.95 > float(got[1] @ got[3])


def test_av_embedding_validation(spark):
    df = spark.createDataFrame([(1, b"x")], "doc_id bigint, audio binary")
    with pytest.raises(ValueError, match="frames"):
        audio_embeddings(df, frames=0)
    dfv = spark.createDataFrame([(1, b"x")], "doc_id bigint, video binary")
    with pytest.raises(ValueError, match="every"):
        video_embeddings(dfv, every=0)
