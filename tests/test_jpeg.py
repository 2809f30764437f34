"""Baseline JPEG codec tests (operators/jpeg.py) — the compressed-format
seam (SURVEY.md §2.11d) closed with a pure-numpy T.81 baseline codec.

No imaging library exists in this container to cross-check against, so
the suite leans on (a) spec-structure assertions (marker layout, Annex K
table counts, prefix-free canonical codes, byte stuffing), (b) numeric
inverses (DCT orthonormality, EXTEND), and (c) encode→decode round trips
whose error bound is the quantization error itself — any zigzag/Huffman/
DCT defect corrupts round trips catastrophically, not subtly.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spotify_etl_aws_spark.operators.jpeg import (
    AC_CHROM_BITS,
    AC_CHROM_VALS,
    AC_LUM_BITS,
    AC_LUM_VALS,
    DC_LUM_BITS,
    DC_LUM_VALS,
    DCT_M,
    UNZIGZAG,
    ZIGZAG,
    build_huffman_codes,
    decode_jpeg,
    encode_jpeg,
    jpeg_dimensions,
    rgb_to_ycbcr,
    scale_qtable,
    ycbcr_to_rgb,
)


def _gradient(w: int, h: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 // max(w - 1, 1),
            yy * 255 // max(h - 1, 1),
            (xx + yy) * 255 // max(w + h - 2, 1),
        ],
        axis=-1,
    ).astype(np.uint8)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 10 * np.log10(255**2 / max(mse, 1e-12))


def test_spec_tables_and_transforms():
    """Annex K table shapes, canonical prefix-free codes, zigzag
    permutation, DCT orthonormality, color-transform inverse."""
    # zigzag: the first 16 entries of the published scan + permutation
    assert list(ZIGZAG[:16]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5]
    assert sorted(ZIGZAG) == list(range(64))
    assert np.array_equal(ZIGZAG[UNZIGZAG], np.arange(64))

    # Annex K Huffman tables: 12 DC categories, 162 AC symbols
    assert sum(DC_LUM_BITS) == len(DC_LUM_VALS) == 12
    assert sum(AC_LUM_BITS) == len(AC_LUM_VALS) == 162
    assert sum(AC_CHROM_BITS) == len(AC_CHROM_VALS) == 162
    codes = build_huffman_codes(AC_LUM_BITS, AC_LUM_VALS)
    bitstrings = {format(c, f"0{ln}b") for c, ln in codes.values()}
    assert len(bitstrings) == 162  # injective assignment
    ordered = sorted(bitstrings)
    for a, b in zip(ordered, ordered[1:]):  # prefix-free
        assert not b.startswith(a)

    # orthonormal DCT: D D^T = I to machine precision
    assert np.allclose(DCT_M @ DCT_M.T, np.eye(8), atol=1e-12)

    # color transform round trip
    rng = np.random.default_rng(3)
    rgb = rng.uniform(0, 255, (16, 16, 3))
    # the spec's rounded constants are inverse to ~1e-3, not machine eps
    assert np.allclose(ycbcr_to_rgb(rgb_to_ycbcr(rgb)), rgb, atol=1e-2)

    # IJG quality scaling endpoints
    assert (scale_qtable(np.full(64, 16), 100) == 1).all()  # scale 0 -> clip 1
    assert scale_qtable(np.full(64, 16), 50)[0] == 16  # scale 100 -> identity


def test_file_structure_is_spec_conformant():
    """Marker walk: SOI..EOI, required segments present, and no bare
    0xFF byte inside the entropy-coded segment (stuffing works)."""
    img = _gradient(24, 16)
    b = encode_jpeg(24, 16, img.tobytes(), quality=85)
    assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
    # walk marker segments up to SOS
    pos, seen = 2, []
    while True:
        assert b[pos] == 0xFF
        marker = b[pos + 1]
        seen.append(marker)
        if marker == 0xDA:
            seglen = int.from_bytes(b[pos + 2 : pos + 4], "big")
            scan_start = pos + 2 + seglen
            break
        seglen = int.from_bytes(b[pos + 2 : pos + 4], "big")
        pos += 2 + seglen
    assert 0xE0 in seen and 0xDB in seen and 0xC0 in seen and 0xC4 in seen
    # entropy segment: every 0xFF is stuffed (followed by 0x00) except EOI
    scan = b[scan_start:-2]
    i = 0
    while i < len(scan):
        if scan[i] == 0xFF:
            assert scan[i + 1] == 0x00, f"unstuffed 0xFF at scan offset {i}"
            i += 2
        else:
            i += 1
    assert jpeg_dimensions(b) == (24, 16)


@pytest.mark.parametrize("sub", ["444", "420"])
def test_roundtrip_gradient(sub):
    """encode→decode lands within quantization error of the source; at
    4:4:4 q100 the only loss is DCT rounding (max error a few counts)."""
    img = _gradient(56, 40)
    for q, min_psnr in ((100, 40.0), (90, 33.0)):
        b = encode_jpeg(56, 40, img.tobytes(), quality=q, subsampling=sub)
        w, h, pix = decode_jpeg(b)
        assert (w, h) == (56, 40)
        out = np.frombuffer(pix, np.uint8).reshape(40, 56, 3)
        assert _psnr(out, img) > min_psnr
    if sub == "444":
        b = encode_jpeg(56, 40, img.tobytes(), quality=100, subsampling=sub)
        out = np.frombuffer(decode_jpeg(b)[2], np.uint8).reshape(40, 56, 3)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_roundtrip_edge_shapes():
    """Flat color is exact at q100; odd (non-multiple-of-8/16)
    dimensions pad and crop correctly; noise survives q100 within a
    couple of counts."""
    flat = np.full((16, 24, 3), 137, np.uint8)
    b = encode_jpeg(24, 16, flat.tobytes(), quality=100)
    assert decode_jpeg(b)[2] == flat.tobytes()

    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    out = np.frombuffer(
        decode_jpeg(encode_jpeg(24, 24, noise.tobytes(), quality=100))[2], np.uint8
    ).reshape(24, 24, 3)
    assert np.abs(out.astype(int) - noise.astype(int)).max() <= 3

    odd = rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
    for sub in ("444", "420"):
        w, h, pix = decode_jpeg(
            encode_jpeg(9, 13, odd.tobytes(), quality=95, subsampling=sub)
        )
        assert (w, h) == (9, 13) and len(pix) == 9 * 13 * 3


def test_restart_markers_roundtrip():
    """DRI + RSTn: markers actually appear in the stream, DC predictors
    reset, and decode resyncs to the same pixels."""
    img = _gradient(56, 40)
    plain = decode_jpeg(encode_jpeg(56, 40, img.tobytes(), quality=90))[2]
    b = encode_jpeg(56, 40, img.tobytes(), quality=90, restart_interval=3)
    nrst = sum(b.count(bytes((0xFF, 0xD0 + i))) for i in range(8))
    assert nrst > 0
    assert decode_jpeg(b)[2] == plain


def test_unsupported_sof_and_malformed_rejected():
    img = _gradient(8, 8)
    b = bytearray(encode_jpeg(8, 8, img.tobytes()))
    sof = b.find(b"\xff\xc0")
    b[sof + 1] = 0xC3  # rewrite SOF0 -> SOF3 (lossless)
    with pytest.raises(NotImplementedError, match="SOF0.*SOF2"):
        decode_jpeg(bytes(b))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01\x02")
    with pytest.raises(ValueError):
        encode_jpeg(0, 8, b"x")
    with pytest.raises(ValueError):
        encode_jpeg(8, 8, b"x", quality=0)


def test_progressive_roundtrip_matches_baseline():
    """encode_jpeg_progressive quantizes identically to encode_jpeg,
    so decoding either file must give the SAME pixels — across
    subsamplings, odd dimensions, and qualities (the q<100 cases
    exercise real dequantization)."""
    from spotify_etl_aws_spark.operators.jpeg import (
        encode_jpeg_progressive,
        jpeg_dimensions,
    )

    rng = np.random.default_rng(9)
    for w, h, sub, q in [
        (24, 16, "444", 90),
        (56, 40, "420", 75),
        (17, 9, "444", 100),
        (40, 24, "420", 90),
    ]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8).tobytes()
        prog = encode_jpeg_progressive(w, h, px, quality=q, subsampling=sub)
        base = encode_jpeg(w, h, px, quality=q, subsampling=sub)
        assert prog.find(b"\xff\xc2") > 0 and prog.count(b"\xff\xda") == 4
        assert jpeg_dimensions(prog) == (w, h)
        assert decode_jpeg(prog) == decode_jpeg(base)


def test_jpeg_through_spark_media_lane(spark):
    """The Spark seam end-to-end: mixed BMP+PNG+JPEG corpus through
    encode_media → with_media_meta → resize_media, with real headers
    parsed for metadata and a true decode→resample→re-encode resize."""
    from spotify_etl_aws_spark.operators.multimodal import (
        JPEG_SIG,
        decode_image,
        encode_media,
        resize_media,
        with_media_meta,
    )

    fmts = ["bmp", "png", "jpeg"]
    df = spark.range(9).select(
        F.col("id").alias("doc_id"),
        (F.col("id") + 8).cast("int").alias("width"),
        (F.col("id") + 6).cast("int").alias("height"),
        F.unhex(F.md5(F.col("id").cast("string"))).alias("payload"),
        F.element_at(
            F.array(*[F.lit(f) for f in fmts]), (F.col("id") % 3 + 1).cast("int")
        ).alias("fmt"),
    )
    media = encode_media(df)
    meta = {r.doc_id: r for r in with_media_meta(media).collect()}
    assert set(meta) == set(range(9))
    for i in range(9):
        assert meta[i].media_type == fmts[i % 3]
        assert (meta[i].width, meta[i].height) == (i + 8, i + 6)

    resized = {r.doc_id: bytes(r.media) for r in resize_media(media, 5, 4).collect()}
    for i in range(9):
        img = decode_image(resized[i])
        assert (img.width, img.height) == (5, 4)
        if fmts[i % 3] == "jpeg":
            assert resized[i][:2] == JPEG_SIG  # re-encoded in source format


def test_partial_scan_raises_precise_seam_error():
    """A baseline file whose first scan covers fewer than all SOF
    components (legal multi-scan layout) must raise the seam error,
    not a misleading truncated-stream ValueError."""
    import struct

    import numpy as np
    import pytest

    from spotify_etl_aws_spark.operators.jpeg import decode_jpeg, encode_jpeg

    jpg = encode_jpeg(
        16, 16, np.random.default_rng(3).integers(0, 256, 768, dtype=np.uint8).tobytes()
    )
    # find the SOS marker and rewrite its header to a 1-component scan
    at = jpg.find(b"\xff\xda")
    (seglen,) = struct.unpack_from(">H", jpg, at + 2)
    body = jpg[at + 4 : at + 2 + seglen]
    ns = body[0]
    assert ns == 3
    one_comp = bytes([1]) + body[1:3] + body[1 + 2 * ns :]
    patched = (
        jpg[:at]
        + b"\xff\xda"
        + struct.pack(">H", 2 + len(one_comp))
        + one_comp
        + jpg[at + 2 + seglen :]
    )
    with pytest.raises(NotImplementedError, match="single interleaved scan"):
        decode_jpeg(patched)


def test_decode_matches_independent_reconstruction_q75():
    """Exact coefficient-level parity at quality 75: decode must equal
    dequant(row-major) -> IDCT -> color-convert computed independently.
    Quality 100's all-ones table cannot catch a dequant-order bug —
    this q<100 check can (it found one)."""
    import numpy as np

    from spotify_etl_aws_spark.operators.jpeg import (
        DCT_M,
        QTBL_CHROM,
        QTBL_LUM,
        UNZIGZAG,
        _fdct_quant,
        decode_jpeg,
        encode_jpeg,
        rgb_to_ycbcr,
        scale_qtable,
        ycbcr_to_rgb,
    )

    rng = np.random.default_rng(5)
    # low-amplitude noise: no gamut clipping, so the reference is exact
    px = rng.integers(108, 148, (16, 8, 3)).astype(np.uint8)
    out = np.frombuffer(
        decode_jpeg(encode_jpeg(8, 16, px.tobytes(), quality=75))[2], np.uint8
    ).reshape(16, 8, 3)

    ycc = rgb_to_ycbcr(px.astype(np.float64))
    ql, qc = scale_qtable(QTBL_LUM, 75), scale_qtable(QTBL_CHROM, 75)
    planes = []
    for ch, q in ((0, ql), (1, qc), (2, qc)):
        zz = _fdct_quant(ycc[..., ch], q)
        blocks = [
            (DCT_M.T @ (z[UNZIGZAG] * q).reshape(8, 8) @ DCT_M) + 128.0
            for z in zz
        ]
        planes.append(np.vstack(blocks))
    ref = np.clip(np.round(ycbcr_to_rgb(np.stack(planes, axis=-1))), 0, 255)
    assert np.array_equal(ref.astype(np.uint8), out)


def test_progressive_successive_approximation_hand_stream():
    """A four-scan successive-approximation grayscale file whose
    entropy bits are derived BY HAND from T.81 G.1.2 (trivial custom
    Huffman tables, identity quant): DC first Al=1 -> DC refine ->
    AC first Al=1 -> AC refine with a newly-nonzero negative coef, a
    correction bit, and an EOB covering the band tail. Decode must
    reproduce the exact coefficient block [11, 3, -1, 0...]."""
    import struct

    import numpy as np

    from spotify_etl_aws_spark.operators.jpeg import (
        DCT_M,
        UNZIGZAG,
        decode_jpeg,
    )

    out = bytearray(b"\xff\xd8")
    # DQT id 0: all-ones table (identity dequant)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    # SOF2: 8x8 grayscale
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
    out += bytes((1, 0x11, 0))
    # DHT DC0: single symbol 3 -> code "0"
    out += b"\xff\xc4" + struct.pack(">H", 20) + b"\x00"
    out += bytes([1] + [0] * 15) + bytes([3])
    # DHT AC0: 0x01 -> "0", 0x00 (EOB) -> "10"
    out += b"\xff\xc4" + struct.pack(">H", 21) + b"\x10"
    out += bytes([1, 1] + [0] * 14) + bytes([0x01, 0x00])

    def sos(ss, se, ahal):
        return b"\xff\xda" + struct.pack(">H", 8) + bytes((1, 1, 0x00, ss, se, ahal))

    # scan 1 — DC first, Al=1: diff 5 = "0"(size 3) + "101"; pad -> 0x5F
    out += sos(0, 0, 0x01) + bytes([0x5F])
    # scan 2 — DC refine: bit 1 (11 & 1); pad -> 0xFF, stuffed
    out += sos(0, 0, 0x10) + bytes([0xFF, 0x00])
    # scan 3 — AC first, Al=1: (0,1)"0" + amp"1", EOB "10"; pad -> 0x6F
    out += sos(1, 63, 0x01) + bytes([0x6F])
    # scan 4 — AC refine: (0,1)"0" + sign"0"(neg) + corr"1"(3&1) +
    # EOB "10" covering the tail; pad -> 0x37
    out += sos(1, 63, 0x10) + bytes([0x37])
    out += b"\xff\xd9"

    w, h, rgb = decode_jpeg(bytes(out))
    assert (w, h) == (8, 8)
    zz = np.zeros(64, dtype=np.int32)
    zz[0], zz[1], zz[2] = 11, 3, -1
    spatial = DCT_M.T @ zz[UNZIGZAG].reshape(8, 8).astype(float) @ DCT_M + 128.0
    want = np.clip(np.round(spatial), 0, 255).astype(np.uint8)
    got = np.frombuffer(rgb, np.uint8).reshape(8, 8, 3)
    assert np.array_equal(got[..., 0], want)
    assert np.array_equal(got[..., 0], got[..., 1])
