"""Pure-numpy baseline JPEG codec (ITU-T T.81 baseline sequential DCT).

Closes the last format seam in the multimodal lane (SURVEY.md §2.11d):
the reference's declared models carry image URLs
(``/root/reference/models/model.py:10,19``,
``models/playlist_model.py:12-13``) and any real multimodal training
corpus is mostly JPEG — until now those bytes raised
``NotImplementedError`` at the codec seam because this container has no
imaging library. This module implements the baseline profile from the
public spec with stdlib + numpy only:

- ``encode_jpeg``: baseline sequential, JFIF container, standard Annex K
  quantization tables (IJG quality scaling) and Annex K Huffman tables,
  4:4:4 or 4:2:0 chroma subsampling, optional restart intervals.
- ``decode_jpeg``: baseline sequential decode — marker parse, Huffman
  entropy decode (with byte-unstuffing and restart-marker resync),
  dequantize, de-zigzag, IDCT, chroma upsample, YCbCr→RGB. SOF2 files
  route to the PROGRESSIVE decoder (full scan model: spectral
  selection, successive approximation incl. DC/AC refinement, EOBn
  runs, interleaved DC scans, restart intervals). Arithmetic / 12-bit
  inputs raise ``NotImplementedError`` with a precise message.
- ``encode_jpeg_progressive``: progressive (SOF2) encode with a
  spectral-selection scan script (interleaved DC scan + one AC band
  scan per component) — quantizes identically to ``encode_jpeg``, so
  both encodings decode pixel-identically.

Scale shape: this codec runs inside the same Arrow-batched
``mapInPandas`` seam as the BMP/PNG codecs — per-item Python cost on
thumbnail-sized media, bytes never cross a shuffle. In a real
deployment you would swap this module for libjpeg-turbo via PIL at the
same call sites; the point here is that the seam is *closed*, not
stubbed: encode→decode round-trips are pixel-accurate to quantization
error and the emitted files are spec-conformant baseline JFIF.

The DCT is the separable orthonormal 8x8 transform done as one einsum
over all blocks of an image (numpy BLAS); only the entropy coding is a
per-block Python loop, which is the part libjpeg replaces.
"""

from __future__ import annotations

import struct
from typing import NamedTuple

import numpy as np

# ---------------------------------------------------------------- tables

# Annex K.1 luminance / K.2 chrominance quantization tables (row-major).
QTBL_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)
QTBL_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)

# Annex K.3 "typical" Huffman tables: (BITS[1..16], HUFFVAL).
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _zigzag_order() -> np.ndarray:
    """Row-major index for each zigzag position, generated by the
    diagonal walk (no hand-transcribed table to get wrong)."""
    order = []
    for s in range(15):  # anti-diagonals r+c = s
        rng = range(min(s, 7), max(0, s - 7) - 1, -1)  # up-right (r desc)
        if s % 2 == 1:
            rng = reversed(list(rng))  # odd diagonals walk down-left
        for r in rng:
            order.append(r * 8 + (s - r))
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag_order()  # block.flat[ZIGZAG] -> zigzag vector
UNZIGZAG = np.argsort(ZIGZAG)  # zz[UNZIGZAG] -> row-major block

# Orthonormal DCT-II basis: D @ block @ D.T is the forward transform.
_k = np.arange(8)
DCT_M = np.sqrt(2.0 / 8.0) * np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16.0)
DCT_M[0, :] = np.sqrt(1.0 / 8.0)


def scale_qtable(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 → scaled table clipped to [1, 255]."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be in [1,100], got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def build_huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment per T.81 C.2: symbol -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# ---------------------------------------------- vectorized entropy coder
#
# The whole entropy stage is numpy: per-component token streams (Huffman
# code + bit-length arrays) built with repeat/cumsum expansion, then one
# batch bit-packer per restart segment. Python touches blocks only to
# gather slices in MCU order — never individual coefficients. This is
# what keeps encode at ~1-2 ms per thumbnail instead of ~8 ms.


def _code_arrays(codes: dict[int, tuple[int, int]], n: int) -> tuple[np.ndarray, np.ndarray]:
    """Dense symbol -> (code, length) lookup arrays."""
    carr = np.zeros(n, dtype=np.uint32)
    larr = np.zeros(n, dtype=np.int64)
    for sym, (c, ln) in codes.items():
        carr[sym] = c
        larr[sym] = ln
    return carr, larr


_ENC_TABLES: dict[str, tuple[np.ndarray, np.ndarray]] = {}


def _enc_tables() -> dict[str, tuple[np.ndarray, np.ndarray]]:
    """Standard-table code arrays, built once per process."""
    if not _ENC_TABLES:
        _ENC_TABLES["dc_l"] = _code_arrays(
            build_huffman_codes(DC_LUM_BITS, DC_LUM_VALS), 12
        )
        _ENC_TABLES["ac_l"] = _code_arrays(
            build_huffman_codes(AC_LUM_BITS, AC_LUM_VALS), 256
        )
        _ENC_TABLES["dc_c"] = _code_arrays(
            build_huffman_codes(DC_CHROM_BITS, DC_CHROM_VALS), 12
        )
        _ENC_TABLES["ac_c"] = _code_arrays(
            build_huffman_codes(AC_CHROM_BITS, AC_CHROM_VALS), 256
        )
    return _ENC_TABLES


def _bit_sizes(v: np.ndarray) -> np.ndarray:
    """Bit length of |v| per element (v != 0); exact for |v| < 2**24."""
    return (np.floor(np.log2(np.abs(v).astype(np.float64))) + 1).astype(np.int64)


def _amplitudes(v: np.ndarray, sizes: np.ndarray) -> np.ndarray:
    """T.81 amplitude bits: v if positive else v + 2**size - 1."""
    return np.where(v > 0, v, v + (1 << sizes) - 1).astype(np.uint32)


def _component_tokens(
    zzs: np.ndarray,
    tables: tuple[tuple[np.ndarray, np.ndarray], tuple[np.ndarray, np.ndarray]],
    reset_every: int,
) -> tuple[np.ndarray, np.ndarray, list[tuple[int, int]]]:
    """Token stream for one component's blocks in scan order.

    Returns (codes, lengths, spans): concatenated Huffman-code and
    bit-length arrays plus each block's [start, end) span, so the MCU
    interleave can gather per-block slices. ``reset_every`` > 0 resets
    the DC predictor every that many blocks (restart intervals)."""
    nb = zzs.shape[0]
    (dc_carr, dc_larr), (ac_carr, ac_larr) = tables

    # --- DC: DPCM diffs with per-segment predictor resets
    dc = zzs[:, 0].astype(np.int64)
    prev = np.concatenate([[0], dc[:-1]])
    if reset_every:
        prev[::reset_every] = 0
    diffs = dc - prev
    dsz = np.zeros(nb, dtype=np.int64)
    nzd = diffs != 0
    dsz[nzd] = _bit_sizes(diffs[nzd])
    damp = np.zeros(nb, dtype=np.uint32)
    damp[nzd] = _amplitudes(diffs[nzd], dsz[nzd])
    # per-block DC tokens: code always, amplitude only when size > 0
    dc_tok_codes = np.stack([dc_carr[dsz], damp], axis=1)
    dc_tok_lens = np.stack([dc_larr[dsz], dsz], axis=1)

    # --- AC: all nonzeros of all blocks at once
    rows, cols = np.nonzero(zzs[:, 1:])
    vals = zzs[rows, cols + 1].astype(np.int64)
    prev_col = np.concatenate([[-1], cols[:-1]])
    first_in_block = np.concatenate([[True], rows[1:] != rows[:-1]])
    prev_col[first_in_block] = -1
    runs = cols - prev_col - 1
    zrl = runs >> 4
    rem = runs & 15
    sizes = _bit_sizes(vals)
    syms = (rem << 4) | sizes
    amps = _amplitudes(vals, sizes)

    # expand each nonzero to (zrl + 2) tokens: ZRLs, symbol, amplitude
    counts = zrl + 2
    total = int(counts.sum())
    idx = np.repeat(np.arange(len(vals)), counts)
    starts = np.cumsum(counts) - counts
    within = np.arange(total) - starts[idx]
    is_sym = within == zrl[idx]
    is_amp = within == zrl[idx] + 1
    zrl_code, zrl_len = int(ac_carr[0xF0]), int(ac_larr[0xF0])
    ac_tok_codes = np.full(total, zrl_code, dtype=np.uint32)
    ac_tok_lens = np.full(total, zrl_len, dtype=np.int64)
    ac_tok_codes[is_sym] = ac_carr[syms[idx[is_sym]]]
    ac_tok_lens[is_sym] = ac_larr[syms[idx[is_sym]]]
    ac_tok_codes[is_amp] = amps[idx[is_amp]]
    ac_tok_lens[is_amp] = sizes[idx[is_amp]]

    # EOB per block whose last nonzero is before k=63 (or all-zero AC)
    last_col = np.full(nb, -1, dtype=np.int64)
    if len(rows):
        # rows is sorted; the last entry per block wins
        last_col[rows] = cols  # repeated assignment keeps the final one
    needs_eob = last_col < 62
    eob_code, eob_len = int(ac_carr[0x00]), int(ac_larr[0x00])

    # --- stitch per block: DC tokens + AC tokens + EOB
    ac_counts = np.bincount(rows, weights=counts, minlength=nb).astype(np.int64)
    blk_counts = (1 + (dsz > 0)) + ac_counts + needs_eob
    blk_starts = np.cumsum(blk_counts) - blk_counts
    grand = int(blk_counts.sum())
    codes = np.empty(grand, dtype=np.uint32)
    lens = np.empty(grand, dtype=np.int64)
    # DC slots
    dc_pos = blk_starts
    codes[dc_pos] = dc_tok_codes[:, 0]
    lens[dc_pos] = dc_tok_lens[:, 0]
    has_amp = dsz > 0
    codes[dc_pos[has_amp] + 1] = dc_tok_codes[has_amp, 1]
    lens[dc_pos[has_amp] + 1] = dc_tok_lens[has_amp, 1]
    # AC slots: offset each nonzero-token by its block's dc width
    ac_starts = np.cumsum(ac_counts) - ac_counts  # within the AC stream
    ac_dest0 = blk_starts + 1 + has_amp  # first AC slot per block
    dest = np.arange(total) - ac_starts[np.repeat(np.arange(nb), ac_counts.astype(np.int64))] + ac_dest0[
        np.repeat(np.arange(nb), ac_counts.astype(np.int64))
    ]
    codes[dest] = ac_tok_codes
    lens[dest] = ac_tok_lens
    # EOB slots
    eob_pos = (blk_starts + blk_counts - 1)[needs_eob]
    codes[eob_pos] = eob_code
    lens[eob_pos] = eob_len

    ends = blk_starts + blk_counts
    spans = list(zip(blk_starts.tolist(), ends.tolist()))
    return codes, lens, spans


def _pack_bits(codes: np.ndarray, lens: np.ndarray) -> bytes:
    """Pack (code, bit-length) tokens into a byte-stuffed, 1-padded
    entropy segment — the vectorized replacement for a bit writer."""
    total = int(lens.sum())
    if total == 0:
        return b""
    starts = np.cumsum(lens) - lens
    idx = np.repeat(np.arange(len(codes)), lens)
    within = np.arange(total) - starts[idx]
    shift = (lens[idx] - 1 - within).astype(np.int64)
    bits = ((codes[idx].astype(np.int64) >> shift) & 1).astype(np.uint8)
    pad = (-total) % 8
    if pad:
        bits = np.concatenate([bits, np.ones(pad, dtype=np.uint8)])
    by = np.packbits(bits)
    stuff = np.nonzero(by == 0xFF)[0]
    if len(stuff):
        by = np.insert(by, stuff + 1, 0x00)
    return by.tobytes()


# -------------------------------------------------------------- encoder


def _fdct_quant(plane: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    """All 8x8 blocks of a (H,W) plane → zigzagged quantized int32
    array of shape (H//8 * W//8, 64), blocks in raster order."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).astype(np.float64)
        - 128.0
    )
    coef = DCT_M @ blocks @ DCT_M.T  # broadcasted over (rows, cols) of blocks
    q = qtbl.reshape(8, 8).astype(np.float64)
    quant = np.round(coef / q).astype(np.int32)
    flat = quant.reshape(-1, 64)
    return flat[:, ZIGZAG]


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate pad a (H,W) plane to multiples of (mh, mw)."""
    h, w = plane.shape
    ph = (-h) % mh
    pw = (-w) % mw
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def encode_jpeg(
    width: int,
    height: int,
    payload: bytes,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """A REAL baseline JFIF file from an RGB pixel buffer.

    Same payload convention as ``encode_bmp`` / ``encode_png``: payload
    fills the 3*width*height RGB buffer (repeated / truncated), so an
    exactly-sized buffer encodes those pixels. ``subsampling`` is
    ``"444"`` (no chroma subsampling) or ``"420"`` (2x2);
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (the error-resilience feature real encoders use for streaming
    decode)."""
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid JPEG dimensions {width}x{height}")
    if not payload:
        raise ValueError("JPEG payload must be non-empty")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be '444' or '420', got {subsampling!r}")

    stride = 3 * width
    pix = (payload * (stride * height // len(payload) + 1))[: stride * height]
    rgb = np.frombuffer(pix, dtype=np.uint8).reshape(height, width, 3)
    ycc = rgb_to_ycbcr(rgb.astype(np.float64))

    qlum = scale_qtable(QTBL_LUM, quality)
    qchrom = scale_qtable(QTBL_CHROM, quality)

    if subsampling == "444":
        hmax = vmax = 1
        y_plane = _pad_to(ycc[..., 0], 8, 8)
        cb_plane = _pad_to(ycc[..., 1], 8, 8)
        cr_plane = _pad_to(ycc[..., 2], 8, 8)
    else:
        hmax = vmax = 2
        y_plane = _pad_to(ycc[..., 0], 16, 16)
        # chroma: average 2x2 then pad to 8x8 blocks
        ph, pw = y_plane.shape
        cb_full = _pad_to(ycc[..., 1], ph, pw)[:ph, :pw]
        cr_full = _pad_to(ycc[..., 2], ph, pw)[:ph, :pw]
        cb_plane = cb_full.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr_plane = cr_full.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

    zz_y = _fdct_quant(y_plane, qlum)
    zz_cb = _fdct_quant(cb_plane, qchrom)
    zz_cr = _fdct_quant(cr_plane, qchrom)

    tbl = _enc_tables()
    lum_tables = (tbl["dc_l"], tbl["ac_l"])
    chrom_tables = (tbl["dc_c"], tbl["ac_c"])

    yw = y_plane.shape[1] // 8  # luma blocks per row
    mcus_x = y_plane.shape[1] // (8 * hmax)
    mcus_y = y_plane.shape[0] // (8 * vmax)
    total_mcus = mcus_x * mcus_y
    nblk = hmax * vmax  # luma blocks per MCU

    # luma blocks reordered to scan order (per-MCU groups, row-major)
    mcu_i = np.arange(total_mcus)
    my, mx = mcu_i // mcus_x, mcu_i % mcus_x
    byx = np.array([(by, bx) for by in range(vmax) for bx in range(hmax)])
    y_order = (
        (my[:, None] * vmax + byx[None, :, 0]) * yw
        + (mx[:, None] * hmax + byx[None, :, 1])
    ).reshape(-1)

    reset_y = restart_interval * nblk if restart_interval else 0
    reset_c = restart_interval if restart_interval else 0
    y_codes, y_lens, y_spans = _component_tokens(zz_y[y_order], lum_tables, reset_y)
    cb_codes, cb_lens, cb_spans = _component_tokens(zz_cb, chrom_tables, reset_c)
    cr_codes, cr_lens, cr_spans = _component_tokens(zz_cr, chrom_tables, reset_c)

    # assemble per restart segment: gather MCU-interleaved token slices,
    # pack each segment independently (restarts are byte-aligned)
    seg_mcus = restart_interval if restart_interval else total_mcus
    chunks: list[bytes] = []
    rst = 0
    for seg_start in range(0, total_mcus, seg_mcus):
        seg_end = min(seg_start + seg_mcus, total_mcus)
        cparts, lparts = [], []
        for m in range(seg_start, seg_end):
            s0 = y_spans[m * nblk][0]
            e0 = y_spans[m * nblk + nblk - 1][1]
            cparts.append(y_codes[s0:e0])
            lparts.append(y_lens[s0:e0])
            s, e = cb_spans[m]
            cparts.append(cb_codes[s:e])
            lparts.append(cb_lens[s:e])
            s, e = cr_spans[m]
            cparts.append(cr_codes[s:e])
            lparts.append(cr_lens[s:e])
        if chunks:
            chunks.append(bytes((0xFF, 0xD0 + rst)))
            rst = (rst + 1) & 7
        chunks.append(_pack_bits(np.concatenate(cparts), np.concatenate(lparts)))
    entropy = b"".join(chunks)

    # ---- container
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(
        (1, 1, 0)
    ) + struct.pack(">HH", 1, 1) + bytes((0, 0))
    for tid, tbl in ((0, qlum), (1, qchrom)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes((tid,))
        out += bytes(int(v) for v in tbl[ZIGZAG])  # stored in zigzag order
    samp = (hmax << 4) | vmax
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, height, width, 3)
    out += bytes((1, samp, 0))  # Y
    out += bytes((2, 0x11, 1))  # Cb
    out += bytes((3, 0x11, 1))  # Cr
    for cls, tid, bits, vals in (
        (0, 0, DC_LUM_BITS, DC_LUM_VALS),
        (1, 0, AC_LUM_BITS, AC_LUM_VALS),
        (0, 1, DC_CHROM_BITS, DC_CHROM_VALS),
        (1, 1, AC_CHROM_BITS, AC_CHROM_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes(((cls << 4) | tid,)) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes((1, 0x00, 2, 0x11, 3, 0x11))  # comp id, (dc<<4|ac)
    out += bytes((0, 63, 0))  # Ss, Se, Ah/Al
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def jpeg_dimensions(data: bytes) -> tuple[int, int]:
    """(width, height) from the SOF header only — no entropy decode,
    the metadata-extraction fast path (PIL's lazy ``open()`` shape)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI marker")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at byte {pos}")
        marker = data[pos + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            _, height, width = struct.unpack_from(">BHH", data, pos + 4)
            return width, height
        pos += 2 + seglen
    raise ValueError("JPEG missing SOF header")


# -------------------------------------------------------------- decoder


class _Component(NamedTuple):
    cid: int
    h: int
    v: int
    qid: int


def _split_entropy(data: bytes, pos: int) -> list[bytes]:
    """Slice the entropy-coded data into restart segments, unstuffing
    0xFF00 -> 0xFF as it goes; stops at the first non-RST marker."""
    return _split_entropy_at(data, pos)[0]


def _split_entropy_at(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """``_split_entropy`` plus the byte offset of the marker that ended
    the scan — progressive decode resumes the marker walk there."""
    segs: list[bytes] = []
    cur = bytearray()
    i, n = pos, len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = data[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # EOI or any other marker: end of scan
            break
    segs.append(bytes(cur))
    return segs, i


class _SegReader:
    """Bit reader over one unstuffed restart segment: a precomputed
    32-bit byte-window array makes every 16-bit peek O(1), so Huffman
    decode is one LUT gather per SYMBOL instead of a per-bit loop."""

    __slots__ = ("win", "bitpos", "nbits")

    def __init__(self, seg: bytes) -> None:
        # pad with 1-bits: peeks past the segment end read the spec's
        # fill bits, and a malformed stream fails the LUT check instead
        # of indexing out of range
        buf = np.frombuffer(seg + b"\xff\xff\xff\xff", dtype=np.uint8).astype(
            np.int64
        )
        self.win = (buf[:-3] << 24) | (buf[1:-2] << 16) | (buf[2:-1] << 8) | buf[3:]
        self.bitpos = 0
        self.nbits = len(seg) * 8

    def peek16(self) -> int:
        byte, sh = self.bitpos >> 3, self.bitpos & 7
        return (int(self.win[byte]) >> (16 - sh)) & 0xFFFF

    def take(self, n: int) -> int:
        if self.bitpos + n > self.nbits:
            raise ValueError("truncated JPEG entropy stream")
        v = self.peek16() >> (16 - n)
        self.bitpos += n
        return v


_LUT_CACHE: dict[bytes, tuple[np.ndarray, np.ndarray]] = {}


def _build_lut(bits: list[int], vals: list[int]) -> tuple[np.ndarray, np.ndarray]:
    """16-bit-peek decode tables: for every 16-bit window, the symbol
    whose canonical code prefixes it and that code's length (0 = no
    valid code — corrupt stream). Cached by table content — nearly
    every real JPEG ships the Annex K tables, so a decode stream pays
    the 64K fill once per process, not once per image."""
    key = bytes(bits) + bytes(vals)
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    sym = np.zeros(1 << 16, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.uint8)
    for s, (code, length) in build_huffman_codes(bits, vals).items():
        lo = code << (16 - length)
        hi = lo + (1 << (16 - length))
        sym[lo:hi] = s
        ln[lo:hi] = length
    _LUT_CACHE[key] = (sym, ln)
    return sym, ln


def _decode_huff(reader: _SegReader, table: tuple[np.ndarray, np.ndarray]) -> int:
    sym, ln = table
    p = reader.peek16()
    length = int(ln[p])
    if length == 0:
        raise ValueError("invalid Huffman code in JPEG stream")
    if reader.bitpos + length > reader.nbits:
        raise ValueError("truncated JPEG entropy stream")
    reader.bitpos += length
    return int(sym[p])


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map `size`-bit raw value to signed."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> tuple[int, int, bytes]:
    """JFIF decode → (width, height, RGB bytes).

    Supports: 8-bit baseline (SOF0) — 1 or 3 components, sampling
    factors 1-2 (4:4:4, 4:2:2, 4:2:0), multiple DQT/DHT segments,
    restart intervals — and 8-bit progressive (SOF2), which routes to
    ``_decode_progressive`` (spectral selection + successive
    approximation). Arithmetic coding and 12-bit precision raise
    ``NotImplementedError``."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI marker")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[_Component] = []
    width = height = 0
    restart_interval = 0
    scan_comps: list[tuple[int, int, int]] = []

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at byte {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                zz = np.frombuffer(body[off + 1 : off + 65], dtype=np.uint8).astype(
                    np.int32
                )
                qtables[tq] = zz[UNZIGZAG]  # store row-major
                off += 65
        elif marker == 0xC2:  # SOF2: hand off to the progressive path
            return _decode_progressive(data)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline sequential (SOF0) and progressive (SOF2) "
                f"are supported, got SOF marker 0xFF{marker:02X} "
                f"(extended/arithmetic/lossless)"
            )
        elif marker == 0xC0:  # SOF0
            precision, height, width, ncomp = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise NotImplementedError("only 8-bit precision supported")
            for i in range(ncomp):
                cid, samp, qid = body[6 + 3 * i : 9 + 3 * i]
                h, v = samp >> 4, samp & 0xF
                if h not in (1, 2) or v not in (1, 2):
                    raise NotImplementedError(
                        f"sampling factors {h}x{v} unsupported (1-2 only)"
                    )
                comps.append(_Component(cid, h, v, qid))
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                cls, tid = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = list(body[off + 17 : off + 17 + n])
                htables[(cls, tid)] = _build_lut(bits, vals)
                off += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for i in range(ns):
                cid, tbl = body[1 + 2 * i : 3 + 2 * i]
                scan_comps.append((cid, tbl >> 4, tbl & 0xF))
            pos = pos + 2 + seglen
            break
        pos += 2 + seglen
    else:
        raise ValueError("JPEG missing SOS marker")

    if not comps or not width:
        raise ValueError("JPEG missing SOF0 before SOS")
    if len(scan_comps) < len(comps):
        # spec-legal baseline can carry one scan per component; this
        # decoder implements the single interleaved scan every common
        # encoder emits — raise the precise seam error, not a
        # misleading "truncated stream" further down
        raise NotImplementedError(
            f"decode_jpeg supports a single interleaved scan (got scan "
            f"with {len(scan_comps)} of {len(comps)} components; "
            "multi-scan / non-interleaved baseline is unsupported)"
        )
    if len(comps) == 1 and (comps[0].h != 1 or comps[0].v != 1):
        # a single-component scan is non-interleaved by definition:
        # its data units are plain 8x8 blocks, sampling factors do not
        # apply (T.81 A.2.2) — normalize so the MCU grid is per-block
        comps = [comps[0]._replace(h=1, v=1)]

    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    planes = []
    dims = []
    for c in comps:
        pw, ph = mcus_x * c.h * 8, mcus_y * c.v * 8
        planes.append(np.zeros((ph // 8, pw // 8, 8, 8), dtype=np.float64))
        dims.append((pw, ph))

    by_cid = {c.cid: i for i, c in enumerate(comps)}
    scan = [(by_cid[cid], dc, ac) for cid, dc, ac in scan_comps]

    segments = _split_entropy(data, pos)
    seg_idx = 0
    reader = _SegReader(segments[0])
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError("expected restart marker, hit end of stream")
                reader = _SegReader(segments[seg_idx])
                preds = [0] * len(comps)
            for ci, dc_id, ac_id in scan:
                c = comps[ci]
                dc_tbl = htables[(0, dc_id)]
                ac_tbl = htables[(1, ac_id)]
                q = qtables[c.qid]
                for by in range(c.v):
                    for bx in range(c.h):
                        zz = np.zeros(64, dtype=np.int32)
                        size = _decode_huff(reader, dc_tbl)
                        diff = _extend(reader.take(size), size) if size else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = _decode_huff(reader, ac_tbl)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0xF
                            if size == 0:
                                if run != 15:
                                    raise ValueError("bad AC symbol in JPEG stream")
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC coefficient index overflow")
                            zz[k] = _extend(reader.take(size), size)
                            k += 1
                        # un-zigzag FIRST, then dequantize row-major:
                        # (zz*q)[UNZIGZAG] would pair coefficient p
                        # with q[UNZIGZAG[p]] — a permuted table,
                        # invisible at q100 (all-ones table) but wrong
                        # for every q<100 file
                        block = (
                            (zz[UNZIGZAG] * q).reshape(8, 8).astype(np.float64)
                        )
                        planes[ci][my * c.v + by, mx * c.h + bx] = block
            mcu_count += 1

    # IDCT all blocks per component at once, assemble planes, upsample
    full = []
    for ci, c in enumerate(comps):
        coef = planes[ci]
        spatial = DCT_M.T @ coef @ DCT_M + 128.0
        br, bc = spatial.shape[0], spatial.shape[1]
        plane = spatial.transpose(0, 2, 1, 3).reshape(br * 8, bc * 8)
        # nearest upsample to the luma grid
        plane = np.repeat(np.repeat(plane, vmax // c.v, axis=0), hmax // c.h, axis=1)
        full.append(plane[:height, :width])

    if len(full) == 1:
        y = np.clip(full[0], 0, 255)
        rgb = np.stack([y, y, y], axis=-1)
    else:
        rgb = ycbcr_to_rgb(np.stack(full, axis=-1))
    return width, height, np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes()


# ---------------------------------------------------- progressive (SOF2)


class _ProgBitWriter:
    """Scalar MSB-first bit writer with 0xFF byte stuffing — the
    encode-side mirror of _SegReader (progressive scans are small and
    per-band, so scalar is fine; the vectorized packer stays on the
    baseline hot path)."""

    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.out)


def _comp_block_grid(
    width: int, height: int, c: "_Component", hmax: int, vmax: int
) -> tuple[int, int]:
    """Non-interleaved block grid of a component (T.81 A.2.2): blocks
    cover ceil(width*h/hmax) x ceil(height*v/vmax) samples — NOT the
    padded MCU grid interleaved scans use."""
    cw = -(-width * c.h // hmax)
    ch = -(-height * c.v // vmax)
    return -(-cw // 8), -(-ch // 8)


def _decode_progressive(data: bytes) -> tuple[int, int, bytes]:
    """Progressive JFIF decode (SOF2) → (width, height, RGB bytes).

    Full scan model: spectral selection (Ss..Se bands), successive
    approximation (Ah/Al bit planes, DC and AC refinement), EOBn run
    codes, interleaved DC scans, non-interleaved per-component scans,
    restart intervals, tables redefined between scans. Arithmetic
    coding and 12-bit precision still raise."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI marker")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    comps: list[_Component] = []
    width = height = 0
    restart_interval = 0
    coef: list[np.ndarray] = []  # per comp: (bh_pad, bw_pad, 64) zigzag ints
    hmax = vmax = 1
    mcus_x = mcus_y = 0

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at byte {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                zz = np.frombuffer(body[off + 1 : off + 65], dtype=np.uint8).astype(
                    np.int32
                )
                qtables[tq] = zz[UNZIGZAG]
                off += 65
        elif marker == 0xC4:
            off = 0
            while off < len(body):
                cls, tid = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = list(body[off + 17 : off + 17 + n])
                htables[(cls, tid)] = _build_lut(bits, vals)
                off += 17 + n
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xC2:
            precision, height, width, ncomp = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise NotImplementedError("only 8-bit precision supported")
            for i in range(ncomp):
                cid, samp, qid = body[6 + 3 * i : 9 + 3 * i]
                h, v = samp >> 4, samp & 0xF
                if h not in (1, 2) or v not in (1, 2):
                    raise NotImplementedError(
                        f"sampling factors {h}x{v} unsupported (1-2 only)"
                    )
                comps.append(_Component(cid, h, v, qid))
            if ncomp == 1 and (comps[0].h != 1 or comps[0].v != 1):
                comps = [comps[0]._replace(h=1, v=1)]
            hmax = max(c.h for c in comps)
            vmax = max(c.v for c in comps)
            mcus_x = -(-width // (8 * hmax))
            mcus_y = -(-height // (8 * vmax))
            coef = [
                np.zeros((mcus_y * c.v, mcus_x * c.h, 64), dtype=np.int32)
                for c in comps
            ]
        elif marker in (0xC0, 0xC1, 0xC3):
            raise ValueError("mixed SOF markers in progressive stream")
        elif marker == 0xDA:
            if not comps:
                raise ValueError("JPEG SOS before SOF2")
            ns = body[0]
            scan = []
            by_cid = {c.cid: i for i, c in enumerate(comps)}
            for i in range(ns):
                cid, tbl = body[1 + 2 * i : 3 + 2 * i]
                scan.append((by_cid[cid], tbl >> 4, tbl & 0xF))
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            segments, endpos = _split_entropy_at(data, pos + 2 + seglen)
            _decode_prog_scan(
                segments, scan, ss, se, ah, al, comps, coef,
                htables, restart_interval, width, height, hmax, vmax,
                mcus_x, mcus_y,
            )
            pos = endpos
            continue
        pos += 2 + seglen

    if not comps or not width:
        raise ValueError("progressive JPEG missing SOF2")

    # dequantize + IDCT the accumulated coefficient planes
    full = []
    for ci, c in enumerate(comps):
        q = qtables[c.qid]
        zz = coef[ci]  # (bh, bw, 64) zigzag order
        blocks = (zz[:, :, UNZIGZAG] * q).astype(np.float64).reshape(
            zz.shape[0], zz.shape[1], 8, 8
        )
        spatial = DCT_M.T @ blocks @ DCT_M + 128.0
        br, bc = spatial.shape[0], spatial.shape[1]
        plane = spatial.transpose(0, 2, 1, 3).reshape(br * 8, bc * 8)
        plane = np.repeat(np.repeat(plane, vmax // c.v, axis=0), hmax // c.h, axis=1)
        full.append(plane[:height, :width])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255)
        rgb = np.stack([y, y, y], axis=-1)
    else:
        rgb = ycbcr_to_rgb(np.stack(full, axis=-1))
    return width, height, np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes()


def _decode_prog_scan(
    segments: list[bytes],
    scan: list[tuple[int, int, int]],
    ss: int,
    se: int,
    ah: int,
    al: int,
    comps: list["_Component"],
    coef: list[np.ndarray],
    htables: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]],
    restart_interval: int,
    width: int,
    height: int,
    hmax: int,
    vmax: int,
    mcus_x: int,
    mcus_y: int,
) -> None:
    """One progressive scan into the coefficient store (T.81 G.2)."""
    if ss == 0 and se != 0:
        raise ValueError("progressive scan mixes DC and AC bands")
    if ss > 0 and len(scan) != 1:
        raise ValueError("progressive AC scans must be single-component")

    seg_idx = 0
    reader = _SegReader(segments[0])
    preds = [0] * len(comps)
    eobrun = 0

    def next_segment() -> "_SegReader":
        nonlocal seg_idx, preds, eobrun
        seg_idx += 1
        if seg_idx >= len(segments):
            raise ValueError("expected restart marker, hit end of stream")
        preds = [0] * len(comps)
        eobrun = 0
        return _SegReader(segments[seg_idx])

    def dc_first(ci: int, dc_tbl, by: int, bx: int) -> None:
        size = _decode_huff(reader, dc_tbl)
        diff = _extend(reader.take(size), size) if size else 0
        preds[ci] += diff
        coef[ci][by, bx, 0] = preds[ci] << al

    def dc_refine(ci: int, by: int, bx: int) -> None:
        if reader.take(1):
            coef[ci][by, bx, 0] |= 1 << al

    def ac_first(ci: int, ac_tbl, by: int, bx: int) -> None:
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        blk = coef[ci][by, bx]
        k = ss
        while k <= se:
            sym = _decode_huff(reader, ac_tbl)
            r, s = sym >> 4, sym & 0xF
            if s == 0:
                if r == 15:
                    k += 16  # ZRL
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.take(r)
                return
            k += r
            if k > se:
                raise ValueError("AC coefficient index past Se")
            blk[k] = _extend(reader.take(s), s) << al
            k += 1

    def _refine_nonzero(blk: np.ndarray, k: int) -> None:
        if reader.take(1) and (blk[k] & (1 << al)) == 0:
            blk[k] += (1 << al) if blk[k] > 0 else -(1 << al)

    def ac_refine(ci: int, ac_tbl, by: int, bx: int) -> None:
        nonlocal eobrun
        blk = coef[ci][by, bx]
        k = ss
        if eobrun == 0:
            while k <= se:
                sym = _decode_huff(reader, ac_tbl)
                r, s = sym >> 4, sym & 0xF
                if s == 0:
                    if r < 15:
                        # EOBn covers (1<<r)+bits blocks INCLUDING this
                        # one: the shared tail below reads this block's
                        # remaining correction bits, then decrements
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.take(r)
                        break
                    newval = 0  # ZRL: skip 16 zero-history positions
                else:
                    if s != 1:
                        raise ValueError("bad refinement magnitude in AC scan")
                    newval = (1 << al) if reader.take(1) else -(1 << al)
                # advance past r zero-history coefficients, emitting
                # correction bits for nonzero-history ones on the way
                while k <= se:
                    if blk[k] != 0:
                        _refine_nonzero(blk, k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if s and k <= se:
                    blk[k] = newval
                k += 1
        if eobrun > 0:
            while k <= se:
                if blk[k] != 0:
                    _refine_nonzero(blk, k)
                k += 1
            eobrun -= 1

    if len(scan) > 1 or (ss == 0 and len(scan) == len(comps) and len(comps) > 1):
        # interleaved (DC) scan over the MCU grid
        count = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and count and count % restart_interval == 0:
                    reader = next_segment()
                for ci, dc_id, _ac_id in scan:
                    c = comps[ci]
                    for by in range(c.v):
                        for bx in range(c.h):
                            row, col = my * c.v + by, mx * c.h + bx
                            if ah == 0:
                                dc_first(ci, htables[(0, dc_id)], row, col)
                            else:
                                dc_refine(ci, row, col)
                count += 1
    else:
        ci, dc_id, ac_id = scan[0]
        c = comps[ci]
        bw, bh = _comp_block_grid(width, height, c, hmax, vmax)
        count = 0
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and count and count % restart_interval == 0:
                    reader = next_segment()
                if ss == 0:
                    if ah == 0:
                        dc_first(ci, htables[(0, dc_id)], by, bx)
                    else:
                        dc_refine(ci, by, bx)
                else:
                    if ah == 0:
                        ac_first(ci, htables[(1, ac_id)], by, bx)
                    else:
                        ac_refine(ci, htables[(1, ac_id)], by, bx)
                count += 1


def _enc_zz_block(
    w: "_ProgBitWriter",
    zz: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    emit_dc: bool,
    emit_ac: bool,
) -> int:
    """Scalar baseline-style coding of one zigzag block into ``w`` —
    DC band, AC band 1..63, or both (the progressive encoder calls it
    per scan with one band enabled)."""
    if emit_dc:
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        mag = abs(diff)
        size = mag.bit_length()
        code, ln = dc_codes[size]
        w.put(code, ln)
        if size:
            amp = diff if diff >= 0 else diff + (1 << size) - 1
            w.put(amp, size)
    if emit_ac:
        run = 0
        last = 63
        while last >= 1 and zz[last] == 0:
            last -= 1
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                code, ln = ac_codes[0xF0]  # ZRL
                w.put(code, ln)
                run -= 16
            size = abs(v).bit_length()
            code, ln = ac_codes[(run << 4) | size]
            w.put(code, ln)
            amp = v if v >= 0 else v + (1 << size) - 1
            w.put(amp, size)
            run = 0
        if last < 63:
            code, ln = ac_codes[0x00]  # EOB (eobrun of exactly 1)
            w.put(code, ln)
    return pred


def encode_jpeg_progressive(
    width: int,
    height: int,
    payload: bytes,
    quality: int = 90,
    subsampling: str = "444",
) -> bytes:
    """A REAL progressive JFIF file (SOF2), spectral-selection scan
    script: one interleaved DC scan, then one full-band AC scan per
    component (Ss=1..63, Ah=Al=0, EOB runs of length 1 so the Annex K
    baseline Huffman tables apply verbatim). Quantized coefficients
    are IDENTICAL to ``encode_jpeg`` at the same settings, so both
    encodings of the same pixels must decode pixel-identically — the
    round-trip test's invariant."""
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid JPEG dimensions {width}x{height}")
    if not payload:
        raise ValueError("JPEG payload must be non-empty")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be '444' or '420', got {subsampling!r}")

    stride = 3 * width
    pix = (payload * (stride * height // len(payload) + 1))[: stride * height]
    rgb = np.frombuffer(pix, dtype=np.uint8).reshape(height, width, 3)
    ycc = rgb_to_ycbcr(rgb.astype(np.float64))
    qlum = scale_qtable(QTBL_LUM, quality)
    qchrom = scale_qtable(QTBL_CHROM, quality)

    if subsampling == "444":
        hmax = vmax = 1
        planes = [
            _pad_to(ycc[..., 0], 8, 8),
            _pad_to(ycc[..., 1], 8, 8),
            _pad_to(ycc[..., 2], 8, 8),
        ]
    else:
        hmax = vmax = 2
        y_plane = _pad_to(ycc[..., 0], 16, 16)
        ph, pw = y_plane.shape
        cb_full = _pad_to(ycc[..., 1], ph, pw)[:ph, :pw]
        cr_full = _pad_to(ycc[..., 2], ph, pw)[:ph, :pw]
        planes = [
            y_plane,
            cb_full.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)),
            cr_full.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)),
        ]
    samps = [(hmax, vmax), (1, 1), (1, 1)]
    qts = [qlum, qchrom, qchrom]
    zzs = [_fdct_quant(p, q) for p, q in zip(planes, qts)]
    grids = [(p.shape[1] // 8, p.shape[0] // 8) for p in planes]  # (bw_pad, bh_pad)

    tbl = {
        "dc_l": build_huffman_codes(DC_LUM_BITS, DC_LUM_VALS),
        "ac_l": build_huffman_codes(AC_LUM_BITS, AC_LUM_VALS),
        "dc_c": build_huffman_codes(DC_CHROM_BITS, DC_CHROM_VALS),
        "ac_c": build_huffman_codes(AC_CHROM_BITS, AC_CHROM_VALS),
    }

    # ---- container head (mirrors encode_jpeg, SOF2 instead of SOF0)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(
        (1, 1, 0)
    ) + struct.pack(">HH", 1, 1) + bytes((0, 0))
    for tid, qt in ((0, qlum), (1, qchrom)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes((tid,))
        out += bytes(int(v) for v in qt[ZIGZAG])
    out += b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, height, width, 3)
    out += bytes((1, (hmax << 4) | vmax, 0))
    out += bytes((2, 0x11, 1))
    out += bytes((3, 0x11, 1))
    for cls, tid, bits, vals in (
        (0, 0, DC_LUM_BITS, DC_LUM_VALS),
        (1, 0, AC_LUM_BITS, AC_LUM_VALS),
        (0, 1, DC_CHROM_BITS, DC_CHROM_VALS),
        (1, 1, AC_CHROM_BITS, AC_CHROM_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes((cls << 4 | tid,)) + bytes(bits) + bytes(vals)

    # ---- scan 1: interleaved DC, Ss=Se=0, Ah=Al=0
    out += b"\xff\xda" + struct.pack(">H", 12) + bytes(
        (3, 1, 0x00, 2, 0x10, 3, 0x10, 0, 0, 0)
    )
    w = _ProgBitWriter()
    mcus_x = planes[0].shape[1] // (8 * hmax)
    mcus_y = planes[0].shape[0] // (8 * vmax)
    preds = [0, 0, 0]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(3):
                h, v = samps[ci]
                bw_pad = grids[ci][0]
                dc = tbl["dc_l"] if ci == 0 else tbl["dc_c"]
                for by in range(v):
                    for bx in range(h):
                        bi = (my * v + by) * bw_pad + (mx * h + bx)
                        preds[ci] = _enc_zz_block(
                            w, zzs[ci][bi], preds[ci], dc, {}, True, False
                        )
    out += w.flush()

    # ---- scans 2-4: per-component AC band 1..63
    comps_meta = [(1, 0), (2, 1), (3, 1)]  # (component id, AC table id)
    for ci, (cid, tid) in enumerate(comps_meta):
        out += b"\xff\xda" + struct.pack(">H", 8) + bytes(
            (1, cid, tid, 1, 63, 0)
        )
        w = _ProgBitWriter()
        h, v = samps[ci]
        bw_pad, _bh_pad = grids[ci]
        c = _Component(cid, h, v, 0)
        bw, bh = _comp_block_grid(width, height, c, hmax, vmax)
        ac = tbl["ac_l"] if ci == 0 else tbl["ac_c"]
        for by in range(bh):
            for bx in range(bw):
                _enc_zz_block(
                    w, zzs[ci][by * bw_pad + bx], 0, {}, ac, False, True
                )
        out += w.flush()

    out += b"\xff\xd9"
    return bytes(out)
