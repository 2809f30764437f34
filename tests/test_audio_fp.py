"""Audio energy fingerprint (operators/audio_fp.py): kernel parity
against a direct numpy reference over random block-structured clips,
robustness to amplitude scaling (the Haitsma-Kalker argument), the
frame-alignment and mono loud guards, and end-to-end WAV round trip
through the mapInPandas kernel."""

from __future__ import annotations

import random

import numpy as np
import pytest

from spotify_etl_aws_spark.operators.audio import encode_wav
from spotify_etl_aws_spark.operators.audio_fp import (
    FP_BITS,
    FP_BLOCKS,
    energy_fingerprint_bytes,
    fingerprint_media,
)


def _wav_from_amps(amps: np.ndarray, block: int = 32) -> bytes:
    pcm = np.repeat(amps.astype(np.int64), block).astype("<i2")
    return encode_wav(len(pcm), 8000, pcm.tobytes())


def _ref_fp(amps: np.ndarray) -> int:
    e = amps.astype(np.float64) ** 2
    bits = e[:-1] > e[1:]
    w = 1 << np.arange(len(amps) - 1, dtype=np.uint64)
    return int((bits.astype(np.uint64) * w).sum())


def test_fingerprint_matches_reference_on_random_clips():
    rng = random.Random(13)
    for _ in range(25):
        amps = np.array(
            [rng.randrange(-20000, 20000) for _ in range(FP_BLOCKS)],
            dtype=np.int64,
        )
        assert energy_fingerprint_bytes(_wav_from_amps(amps)) == _ref_fp(amps)


def test_fingerprint_survives_amplitude_halving():
    # energy contour SHAPE is what's signed: a uniformly attenuated
    # copy (every amp halved, no new sign flips on the strict > grid)
    # fingerprints identically — the robustness property the scheme
    # exists for
    rng = random.Random(17)
    amps = np.array(
        [rng.randrange(1000, 20000) * rng.choice([-1, 1]) for _ in range(FP_BLOCKS)],
        dtype=np.int64,
    )
    # even amplitudes so halving is exact and cannot create energy ties
    amps = (amps // 2) * 2
    assert energy_fingerprint_bytes(
        _wav_from_amps(amps)
    ) == energy_fingerprint_bytes(_wav_from_amps(amps // 2))


def test_fingerprint_rejects_unaligned_sample_count():
    pcm = np.zeros(FP_BLOCKS * 32 + 5, dtype="<i2")
    pcm[0] = 7
    wav = encode_wav(len(pcm), 8000, pcm.tobytes())
    with pytest.raises(ValueError, match="divide into"):
        energy_fingerprint_bytes(wav)


def test_fingerprint_rejects_stereo():
    pcm = np.ones(FP_BLOCKS * 32 * 2, dtype="<i2")
    wav = encode_wav(FP_BLOCKS * 32, 8000, pcm.tobytes(), channels=2)
    with pytest.raises(ValueError, match="mono"):
        energy_fingerprint_bytes(wav)


def test_fingerprint_bit_range():
    rng = random.Random(23)
    for _ in range(10):
        amps = np.array(
            [rng.randrange(-30000, 30000) for _ in range(FP_BLOCKS)],
            dtype=np.int64,
        )
        h = energy_fingerprint_bytes(_wav_from_amps(amps))
        assert 0 <= h < (1 << FP_BITS)


def test_fingerprint_media_end_to_end(spark):
    rng = random.Random(29)
    rows = []
    expect = {}
    for i in range(12):
        amps = np.array(
            [rng.randrange(-20000, 20000) for _ in range(FP_BLOCKS)],
            dtype=np.int64,
        )
        rows.append((i, bytearray(_wav_from_amps(amps))))
        expect[i] = _ref_fp(amps)
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    got = {r.doc_id: r.afp for r in fingerprint_media(df).collect()}
    assert got == expect


def test_fingerprint_media_preserves_string_ids(spark):
    from spotify_etl_aws_spark.operators.audio_fp import fingerprint_media

    amps = np.array(
        [random.Random(3).randrange(-20000, 20000) for _ in range(FP_BLOCKS)],
        dtype=np.int64,
    )
    blob = bytearray(_wav_from_amps(amps))
    df = spark.createDataFrame([("clip-1", blob)], "doc_id string, media binary")
    out = fingerprint_media(df)
    assert dict(out.dtypes)["doc_id"] == "string"
    row = out.collect()[0]
    assert (row.doc_id, row.afp) == ("clip-1", _ref_fp(amps))
