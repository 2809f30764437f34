"""Compressed-container metadata (operators/media_meta.py): synthetic
MP3 frame walks (CBR/VBR, ID3 tags) and ISO-BMFF box trees (64-bit
boxes, multi-track), plus the Spark dispatch lane."""

from __future__ import annotations

import struct

import pytest

from spotify_etl_aws_spark.operators.media_meta import (
    parse_mp3_meta,
    parse_mp4_meta,
    with_container_meta,
)


# ---- synthetic MP3 ----

_V1_BR = {32: 1, 40: 2, 48: 3, 56: 4, 64: 5, 80: 6, 96: 7, 112: 8,
          128: 9, 160: 10, 192: 11, 224: 12, 256: 13, 320: 14}


def _mp3_frame(kbps: int, rate: int = 44100, mono: bool = False) -> bytes:
    sr_idx = {44100: 0, 48000: 1, 32000: 2}[rate]
    h = bytes([
        0xFF,
        0xFB,  # sync + MPEG1 + Layer III + no CRC
        (_V1_BR[kbps] << 4) | (sr_idx << 2),
        0xC0 if mono else 0x00,
    ])
    frame_len = (1152 // 8) * kbps * 1000 // rate
    return h + b"\x00" * (frame_len - 4)


def _id3v2(payload_len: int = 200) -> bytes:
    size = payload_len
    ss = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                (size >> 7) & 0x7F, size & 0x7F])
    return b"ID3\x04\x00\x00" + ss + b"\x00" * payload_len


def test_mp3_cbr_walk():
    data = _id3v2() + _mp3_frame(128) * 40 + b"TAG" + b"\x00" * 125
    m = parse_mp3_meta(data)
    assert (m.version, m.sample_rate, m.channels) == ("1", 44100, 2)
    assert m.n_frames == 40 and not m.vbr
    assert m.duration_ms == pytest.approx(40 * 1152 / 44100 * 1000)
    assert m.bitrate_kbps == pytest.approx(128, rel=0.02)


def test_mp3_vbr_exact_average():
    frames = [_mp3_frame(64), _mp3_frame(192)] * 10
    m = parse_mp3_meta(b"".join(frames))
    assert m.vbr and m.n_frames == 20
    total_bits = sum(len(f) * 8 for f in frames)
    assert m.bitrate_kbps == pytest.approx(total_bits / m.duration_ms)


def test_mp3_mono_and_rejects():
    m = parse_mp3_meta(_mp3_frame(128, mono=True) * 3)
    assert m.channels == 1
    with pytest.raises(ValueError, match="no MPEG audio frames"):
        parse_mp3_meta(b"\x00" * 64)
    # Layer II header (layer bits = 2)
    bad = bytes([0xFF, 0xFD, 0x90, 0x00]) + b"\x00" * 100
    with pytest.raises(NotImplementedError, match="Layer III"):
        parse_mp3_meta(bad)


# ---- synthetic MP4 ----


def _box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + tag + body


def _mvhd(timescale: int, duration: int, v1: bool = False) -> bytes:
    if v1:
        body = b"\x01\x00\x00\x00" + b"\x00" * 16 + struct.pack(
            ">IQ", timescale, duration
        ) + b"\x00" * 80
    else:
        body = b"\x00" * 12 + struct.pack(">II", timescale, duration) + b"\x00" * 80
    return _box(b"mvhd", body)


def _trak(kind: bytes, codec: bytes, w: int, h: int, ts: int, dur: int,
          n_samples: int) -> bytes:
    tkhd = _box(b"tkhd", b"\x00" * 76 + struct.pack(">II", w << 16, h << 16))
    mdhd = _box(b"mdhd", b"\x00" * 12 + struct.pack(">II", ts, dur) + b"\x00" * 4)
    hdlr = _box(b"hdlr", b"\x00" * 8 + kind + b"\x00" * 12)
    stsd = _box(b"stsd", b"\x00\x00\x00\x00" + struct.pack(">I", 1)
                + struct.pack(">I", 16) + codec + b"\x00" * 8)
    stsz = _box(b"stsz", b"\x00" * 4 + struct.pack(">II", 0, n_samples))
    stbl = _box(b"stbl", stsd + stsz)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    return _box(b"trak", tkhd + mdia)


def _mp4(v1_mvhd: bool = False, large_mdat: bool = False) -> bytes:
    ftyp = _box(b"ftyp", b"isom" + b"\x00" * 4 + b"isomavc1")
    moov = _box(
        b"moov",
        _mvhd(1000, 90_000, v1=v1_mvhd)
        + _trak(b"vide", b"avc1", 640, 360, 30_000, 2_700_000, 2700)
        + _trak(b"soun", b"mp4a", 0, 0, 48_000, 4_320_000, 4219),
    )
    payload = b"\x00" * 32
    if large_mdat:
        mdat = struct.pack(">I", 1) + b"mdat" + struct.pack(
            ">Q", 16 + len(payload)
        ) + payload
    else:
        mdat = _box(b"mdat", payload)
    return ftyp + moov + mdat


@pytest.mark.parametrize("v1,large", [(False, False), (True, True)])
def test_mp4_box_tree(v1, large):
    m = parse_mp4_meta(_mp4(v1_mvhd=v1, large_mdat=large))
    assert m.brand == "isom"
    assert m.duration_ms == pytest.approx(90_000)
    assert len(m.tracks) == 2
    vid, aud = m.tracks
    assert (vid.kind, vid.codec, vid.width, vid.height) == (
        "vide", "avc1", 640, 360
    )
    assert vid.n_samples == 2700
    assert vid.duration_ms == pytest.approx(90_000)
    assert (aud.kind, aud.codec, aud.n_samples) == ("soun", "mp4a", 4219)


def test_mp4_rejects_non_bmff():
    with pytest.raises(ValueError, match="ftyp"):
        parse_mp4_meta(b"RIFF\x00\x00\x00\x00WAVE")


def test_spark_container_meta_lane(spark):
    rows = [
        (1, _id3v2() + _mp3_frame(128) * 20),
        (2, b"".join([_mp3_frame(64), _mp3_frame(192)] * 5)),
        (3, _mp4()),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, media binary")
    got = {r.doc_id: r for r in with_container_meta(df).collect()}
    assert got[1].container == "mp3/v1" and got[1].sample_rate == 44100
    assert got[2].bitrate_kbps > got[1].bitrate_kbps - 64  # vbr average sane
    assert got[3].container == "mp4/isom" and got[3].codec == "avc1"
    assert got[3].width == 640 and got[3].height == 360
    assert got[3].duration_ms == pytest.approx(90_000)
    # media bytes are gone from the output schema
    assert "media" not in with_container_meta(df).columns


def test_mp3_resyncs_over_sync_like_garbage():
    """Review fix: sync-looking bytes in leading garbage (e.g. a
    corrupt ID3 region containing 0xFF 0xF0) must resync, not raise."""
    garbage = b"\x00\xff\xf0\x12junk\xff\xe2more"
    m = parse_mp3_meta(garbage + _mp3_frame(128) * 5)
    assert m.n_frames == 5 and m.sample_rate == 44100
    # a genuinely Layer-II stream still reports the precise seam
    l2 = bytes([0xFF, 0xFD, 0x90, 0x00]) + b"\x00" * 100
    with pytest.raises(NotImplementedError, match="Layer III"):
        parse_mp3_meta(l2 * 3)


def test_free_format_lookalike_garbage_resyncs():
    """Review fix: a free-format-looking header in LEADING garbage
    resyncs; a genuinely free-format stream still gets the seam error."""
    junk = b"\x00\xff\xfb\x04\x00\x00junk"
    m = parse_mp3_meta(junk + _mp3_frame(128) * 4)
    assert m.n_frames == 4
    ff = bytes([0xFF, 0xFB, 0x00, 0x00]) + b"\x00" * 400
    with pytest.raises(NotImplementedError, match="free-format"):
        parse_mp3_meta(ff)


def test_mp3_trailing_layer2_sync_ends_walk():
    """ADVICE fix: after real Layer III frames, trailing garbage whose
    sync bits decode as Layer I/II ends the walk (like a trailing tag)
    instead of misclassifying the file as unsupported."""
    l2_tail = bytes([0xFF, 0xFD, 0x90, 0x00]) + b"\x00" * 50
    m = parse_mp3_meta(_mp3_frame(128) * 6 + l2_tail)
    assert m.n_frames == 6
    assert m.sample_rate == 44100


def test_container_lane_quarantines_unrecognized_bytes(spark):
    """ADVICE fix: a JPEG/garbage row in the media column lands as
    container='unknown' (codec-seam hits as 'unsupported'), never a
    ValueError that kills the whole Arrow batch."""
    l2 = bytes([0xFF, 0xFD, 0x90, 0x00]) + b"\x00" * 100  # Layer II seam
    rows = [
        (1, _id3v2() + _mp3_frame(128) * 20),       # good mp3
        (2, b"\xff\xd8\xff\xe0" + b"\x00" * 64),     # JPEG magic
        (3, b"complete garbage bytes"),               # nothing
        (4, l2 * 3),                                  # documented seam
        (5, _mp4()),                                  # good mp4
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, media binary")
    got = {r.doc_id: r for r in with_container_meta(df).collect()}
    assert len(got) == 5
    assert got[1].container == "mp3/v1"
    # JPEG starts 0xFF 0xD8: not an MPEG sync (0xFF 0xEx) -> unknown
    assert got[2].container == "unknown" and got[2].n_bytes == 68
    assert got[3].container == "unknown"
    assert got[4].container == "unsupported"
    assert got[5].container == "mp4/isom"


def test_mp3_trailing_free_format_sync_ends_walk():
    """Review fix: trailing bytes decoding as a free-format header
    after real frames end the walk (like Layer I/II trailing sync and
    trailing tags) — a genuinely free-format stream still raises."""
    ff_tail = bytes([0xFF, 0xFB, 0x00, 0x00]) + b"\x00" * 60
    m = parse_mp3_meta(_mp3_frame(128) * 5 + ff_tail)
    assert m.n_frames == 5


def test_container_lane_parses_mp3_with_leading_garbage(spark):
    """Review fix: a valid MP3 behind leading junk (no byte-0 magic)
    must still parse through the container lane — the old magic gate
    wrongly sent it to 'unknown'."""
    junky = b"\x00\x01junkjunk" + _mp3_frame(128) * 10
    df = spark.createDataFrame(
        [(1, junky)], "doc_id bigint, media binary"
    )
    got = with_container_meta(df).collect()[0]
    assert got.container == "mp3/v1"
    assert got.sample_rate == 44100


def test_container_lane_rejects_random_noise(spark):
    """Second-review fix: random binary blobs (which contain
    accidental sync-valid 4-byte patterns every ~100 KB) must land
    'unknown' — a single unchained frame is not evidence of MP3; a
    real 2-frame chain (even junk-prefixed) still is."""
    import random

    rng = random.Random(3)
    rows = [(i, rng.randbytes(200_000)) for i in range(6)]
    rows.append((100, b"\x00junk" + _mp3_frame(128) * 2))  # real, 2 frames
    df = spark.createDataFrame(rows, "doc_id bigint, media binary")
    got = {r.doc_id: r.container for r in with_container_meta(df).collect()}
    assert got[100] == "mp3/v1"
    for i in range(6):
        assert got[i] == "unknown", (i, got[i])


def test_mp3_resync_bound(spark=None):
    """The kernel's bounded resync: no frame within the bound raises
    (ValueError -> 'unknown' in the lane); unbounded API still scans."""
    blob = b"\x00" * 100_000 + _mp3_frame(128) * 3
    m = parse_mp3_meta(blob)  # unbounded: finds the frames
    assert m.n_frames == 3
    with pytest.raises(ValueError, match="resync bound"):
        parse_mp3_meta(blob, max_resync_bytes=65536)
