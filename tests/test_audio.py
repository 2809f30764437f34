"""Audio codec lane (operators/audio.py): real RIFF/WAVE PCM-16 files,
bit-exact round trips, closed-form sizes, signal features, and the
Spark mapInPandas kernels end-to-end."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from spotify_etl_aws_spark.operators.audio import (
    WAV_HEADER_BYTES,
    audio_quality_gate,
    decode_audio,
    encode_audio,
    encode_wav,
    resample_audio,
    wav_n_bytes,
    with_audio_meta,
)


def test_wav_roundtrip_bit_exact():
    rng = np.random.default_rng(3)
    x = rng.integers(-32768, 32768, 480, dtype=np.int16)
    b = encode_wav(480, 16000, x.astype("<i2").tobytes())
    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
    assert len(b) == wav_n_bytes(480)
    d = decode_audio(b)
    assert (d.n_samples, d.sample_rate, d.channels) == (480, 16000, 1)
    assert np.array_equal(np.frombuffer(d.samples, "<i2"), x)
    # stereo
    b2 = encode_wav(100, 44100, x[:400].astype("<i2").tobytes(), channels=2)
    d2 = decode_audio(b2)
    assert (d2.n_samples, d2.channels) == (100, 2)
    assert len(b2) == wav_n_bytes(100, channels=2)


def test_wav_foreign_chunk_order_and_rejects():
    # a foreign WAV with an unknown chunk before fmt/data still decodes
    x = np.arange(8, dtype="<i2").tobytes()
    junk = b"LIST" + struct.pack("<I", 4) + b"INFO"
    body = (
        b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(x)) + x
    )
    raw = b"RIFF" + struct.pack("<I", 4 + len(junk) + len(body)) + b"WAVE" + junk + body
    d = decode_audio(raw)
    assert d.n_samples == 8 and d.sample_rate == 8000

    with pytest.raises(NotImplementedError, match="PCM-16"):
        # float32 format code 3
        bad = raw.replace(
            struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16),
            struct.pack("<IHHIIHH", 16, 3, 1, 8000, 16000, 2, 16),
        )
        decode_audio(bad)
    with pytest.raises(NotImplementedError, match="compressed audio"):
        decode_audio(b"\xff\xfbMP3FRAME")
    with pytest.raises(ValueError):
        encode_wav(0, 8000, b"x")


def test_audio_features_hand_computed():
    # constant amplitude 1000 -> rms exactly 1000, peak 1000
    x = np.full(200, 1000, dtype="<i2")
    b = encode_wav(200, 8000, x.tobytes())
    d = decode_audio(b)
    s = np.frombuffer(d.samples, "<i2").astype(np.float64)
    assert np.sqrt((s**2).mean()) == 1000.0
    assert d.n_samples / d.sample_rate == pytest.approx(0.025)


def test_spark_audio_lane(spark):
    """encode -> meta/features -> quality gate -> resample, all through
    the Arrow kernels with real WAV bytes."""
    df = spark.range(6).select(
        F.col("id").alias("doc_id"),
        (F.lit(400) + F.col("id") * 100).cast("int").alias("n_samples"),
        F.lit(16000).alias("sample_rate"),
        # doc 0 is digital silence (zero payload) -> gated out by rms
        F.when(F.col("id") == 0, F.lit(bytearray(2)))
        .otherwise(F.unhex(F.md5(F.col("id").cast("string"))))
        .alias("payload"),
    )
    audio = encode_audio(df)
    meta = with_audio_meta(audio)
    rows = {r.doc_id: r for r in meta.collect()}
    assert set(rows) == set(range(6))
    for i in range(6):
        assert rows[i].n_samples == 400 + i * 100
        assert rows[i].n_bytes == wav_n_bytes(400 + i * 100)
        assert rows[i].duration_s == pytest.approx((400 + i * 100) / 16000)
    assert rows[0].rms == 0.0 and rows[0].peak == 0
    kept = {
        r.doc_id
        for r in audio_quality_gate(meta, min_duration_s=0.01).collect()
    }
    assert kept == set(range(1, 6))  # only the silent clip is gated

    # resample halves the rate -> half the samples, same duration
    half = resample_audio(audio, 8000)
    meta2 = {r.doc_id: r for r in with_audio_meta(half).collect()}
    for i in range(6):
        assert meta2[i].sample_rate == 8000
        assert meta2[i].n_samples == (400 + i * 100) // 2
        assert meta2[i].duration_s == pytest.approx(rows[i].duration_s)
    # bytes never shuffle: the meta plan has no Exchange
    plan = meta._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_header_constant_consistency():
    assert wav_n_bytes(1) == WAV_HEADER_BYTES + 2


def test_float32_wav_decodes_to_int16_grid():
    """IEEE-float WAV (format code 3): [-1, 1] floats land on the
    int16 grid exactly (clipped), so the feature kernels see one
    sample type regardless of source encoding."""
    x = np.array([0.0, 0.5, -0.5, 1.0, -1.0, 2.0, -2.0], dtype="<f4")
    body = (
        b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 8000, 32000, 4, 32)
        + b"data" + struct.pack("<I", x.nbytes) + x.tobytes()
    )
    raw = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    d = decode_audio(raw)
    assert (d.n_samples, d.sample_rate, d.channels) == (7, 8000, 1)
    got = np.frombuffer(d.samples, "<i2").tolist()
    assert got == [0, 16384, -16384, 32767, -32767, 32767, -32768]
