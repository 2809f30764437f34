"""GIF codec (north-star, SURVEY.md §2.11d) — the fourth REAL image
format in the multimodal lane, stdlib-only like the others: GIF89a
with a fixed 6x6x6 web-safe palette and a full variable-width LZW
implementation (both directions, dictionary resets at 4096, the
spec's code-size growth schedule).

Like JPEG, GIF here is lossy at encode time (RGB quantizes onto the
216-color cube, max per-channel error 25) and exact at decode time;
pixels already on the cube round-trip bit-for-bit — that is what the
tests pin. Compressed size has no closed form (same note as JPEG's
``n_bytes``).

Decode handles global or local color tables, extension-block
skipping, and interlaced frames (four-pass row scatter).
``encode_gif_animation`` / ``gif_frames`` cover the animated case
(NETSCAPE loop, per-frame GCE delays, sub-rectangle delta frames
composited per disposal 0/1/2); disposal 3 (restore-previous) raises
at the seam.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_SIG = b"GIF8"  # followed by "7a" or "9a"

_LEVELS = np.array([0, 51, 102, 153, 204, 255], dtype=np.uint8)


def _palette() -> bytes:
    """The 6x6x6 cube in index order 36*r + 6*g + b, padded to 256
    entries (min LZW code size 8 needs a 256-slot table)."""
    out = bytearray()
    for r in _LEVELS:
        for g in _LEVELS:
            for b in _LEVELS:
                out += bytes((r, g, b))
    out += b"\x00" * (3 * (256 - 216))
    return bytes(out)


_PALETTE = _palette()


def quantize_rgb(rgb: np.ndarray) -> np.ndarray:
    """Nearest 6-level value per channel (uint8 in, uint8 out)."""
    return _LEVELS[((rgb.astype(np.uint16) + 25) // 51).clip(0, 5)]


def _rgb_to_indices(rgb: np.ndarray) -> np.ndarray:
    q = ((rgb.astype(np.uint16) + 25) // 51).clip(0, 5)
    return (36 * q[..., 0] + 6 * q[..., 1] + q[..., 2]).astype(np.uint8)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, size: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += size
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc, self.nbits = 0, 0
        return bytes(self.out)


def _lzw_encode(indices: bytes, min_code_size: int = 8) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    w = _BitWriter()

    def fresh() -> tuple[dict[bytes, int], int, int]:
        return (
            {bytes([i]): i for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    table, nxt, size = fresh()
    w.put(clear, size)
    run = b""
    for sym in indices:
        cand = run + bytes([sym])
        if cand in table:
            run = cand
            continue
        w.put(table[run], size)
        if nxt < 4096:
            table[cand] = nxt
            # grow AFTER assigning the code that first needs the wider
            # width: the decoder (which lags one entry) grows in
            # lockstep — see the paired rule in _lzw_decode
            if nxt == (1 << size) and size < 12:
                size += 1
            nxt += 1
        else:
            w.put(clear, size)
            table, nxt, size = fresh()
        run = bytes([sym])
    if run:
        w.put(table[run], size)
    w.put(eoi, size)
    return w.flush()


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table: dict[int, bytes] = {}
    size = min_code_size + 1
    nxt = eoi + 1
    prev: int | None = None
    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < size:
            if pos >= len(data):
                raise ValueError("LZW stream ended without EOI")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << size) - 1)
        acc >>= size
        nbits -= size
        if code == clear:
            table = {i: bytes([i]) for i in range(clear)}
            size = min_code_size + 1
            nxt = eoi + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            entry = table[code]
        else:
            if code in table:
                entry = table[code]
            elif code == nxt:
                entry = table[prev] + table[prev][:1]
            else:
                raise ValueError(f"corrupt LZW stream: code {code} > {nxt}")
            if nxt < 4096:
                table[nxt] = table[prev] + entry[:1]
                nxt += 1
                if nxt == (1 << size) and size < 12:
                    size += 1
        out += entry
        prev = code


def _sub_blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(width: int, height: int, payload: bytes) -> bytes:
    """A REAL single-frame GIF89a. Same payload convention as the
    other encoders: ``payload`` fills the 3*width*height RGB buffer
    (repeated / truncated), quantized onto the web-safe cube."""
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid GIF dimensions {width}x{height}")
    if not payload:
        raise ValueError("GIF payload must be non-empty")
    nbytes = 3 * width * height
    buf = (payload * (nbytes // len(payload) + 1))[:nbytes]
    rgb = np.frombuffer(buf, dtype=np.uint8).reshape(height, width, 3)
    indices = _rgb_to_indices(rgb).reshape(-1).tobytes()

    head = b"GIF89a" + struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    # 0xF7: global table present, 8-bit color resolution, 256 entries
    img = b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    lzw = _lzw_encode(indices)
    return head + _PALETTE + img + b"\x08" + _sub_blocks(lzw) + b"\x3b"


def decode_gif(data: bytes) -> tuple[int, int, bytes]:
    """FIRST-frame GIF decode -> (width, height, RGB bytes):
    chunk-walks the block stream (extensions skipped per spec), global
    or local color table, full LZW, interlace-aware. For every frame
    of an animation use ``gif_frames``."""
    if data[:4] != GIF_SIG or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF: missing GIF87a/GIF89a signature")
    width, height, packed, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    palette = b""
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = data[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        if block == 0x3B:  # trailer
            raise ValueError("GIF contains no image data")
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x} at {pos}")
        _l, _t, iw, ih, ipacked = struct.unpack_from("<HHHHB", data, pos + 1)
        pos += 10
        interlaced = bool(ipacked & 0x40)
        if ipacked & 0x80:  # local color table wins
            n = 2 << (ipacked & 0x07)
            palette = data[pos : pos + 3 * n]
            pos += 3 * n
        if not palette:
            raise ValueError("GIF image without any color table")
        min_code = data[pos]
        pos += 1
        payload = bytearray()
        while data[pos]:
            ln = data[pos]
            payload += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        indices = _lzw_decode(bytes(payload), min_code)
        if len(indices) < iw * ih:
            raise ValueError(
                f"GIF pixel data short: {len(indices)} < {iw * ih}"
            )
        pal = np.frombuffer(palette, dtype=np.uint8).reshape(-1, 3)
        idx = np.frombuffer(indices[: iw * ih], dtype=np.uint8)
        if idx.max(initial=0) >= len(pal):
            raise ValueError("GIF index outside color table")
        if interlaced:
            # rows arrive in the four spec passes (0::8, 4::8, 2::4,
            # 1::2); scatter them back to their display positions
            rows = idx.reshape(ih, iw)
            order = np.concatenate(
                [np.arange(s, ih, st) for s, st in ((0, 8), (4, 8), (2, 4), (1, 2))]
            )
            out = np.empty_like(rows)
            out[order] = rows
            idx = out.reshape(-1)
        return iw, ih, pal[idx].tobytes()
    raise ValueError("truncated GIF: no trailer")


# ---------------------------------------------------------- animation


def encode_gif_animation(
    frames_rgb: list[bytes],
    width: int,
    height: int,
    delay_cs: int = 10,
) -> bytes:
    """A REAL animated GIF89a: NETSCAPE2.0 loop extension, one Graphic
    Control Extension (delay, disposal=do-not-dispose) + full-canvas
    image descriptor per frame, shared global palette. Each element of
    ``frames_rgb`` is a 3*width*height RGB buffer (quantized onto the
    web-safe cube like ``encode_gif``)."""
    if not frames_rgb:
        raise ValueError("animation needs at least one frame")
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid GIF dimensions {width}x{height}")
    nbytes = 3 * width * height
    head = b"GIF89a" + struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    netscape = (
        b"\x21\xff\x0bNETSCAPE2.0" + b"\x03\x01\x00\x00" + b"\x00"
    )  # loop forever
    out = bytearray(head + _PALETTE + netscape)
    for buf in frames_rgb:
        if len(buf) != nbytes:
            raise ValueError(
                f"frame buffer must be exactly {nbytes} bytes, got {len(buf)}"
            )
        rgb = np.frombuffer(buf, dtype=np.uint8).reshape(height, width, 3)
        indices = _rgb_to_indices(rgb).reshape(-1).tobytes()
        gce = b"\x21\xf9\x04" + struct.pack("<BHB", 0x04, delay_cs, 0) + b"\x00"
        img = b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out += gce + img + b"\x08" + _sub_blocks(_lzw_encode(indices))
    out += b"\x3b"
    return bytes(out)


def gif_frames(data: bytes) -> list[tuple[int, bytes]]:
    """ALL frames of a (possibly animated) GIF as (delay_cs,
    full-canvas RGB bytes), composited per the GIF89a disposal model:
    a frame's own GCE disposal governs its region AFTER it is shown
    (0/1 = leave in place, 2 = restore the region to background before
    the next frame; 3 = restore-previous raises at the seam), and the
    GCE transparent index leaves underlying canvas pixels intact.
    Sub-rectangle frames are pasted at their (left, top) offsets — the
    delta-frame optimization real encoders emit."""
    if data[:4] != GIF_SIG or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF: missing GIF87a/GIF89a signature")
    width, height, packed, bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gpal = b""
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gpal = data[pos : pos + 3 * n]
        pos += 3 * n
    # background color comes from the GLOBAL table (the bg index is
    # only meaningful with one, per spec)
    if gpal and bg < len(gpal) // 3:
        bg_rgb = np.frombuffer(gpal, dtype=np.uint8)[3 * bg : 3 * bg + 3]
    else:
        bg_rgb = np.zeros(3, np.uint8)
    canvas = None
    delay = 0
    disposal = 0  # the CURRENT frame's disposal, applied after display
    transparent = -1
    pending: tuple[int, tuple[int, int, int, int]] | None = None
    frames: list[tuple[int, bytes]] = []
    while pos < len(data):
        block = data[pos]
        if block == 0x3B:
            break
        if block == 0x21:
            label = data[pos + 1]
            pos += 2
            if label == 0xF9:  # Graphic Control Extension
                flags, delay = struct.unpack_from("<BH", data, pos + 1)
                disposal = (flags >> 2) & 0x07
                transparent = data[pos + 4] if flags & 0x01 else -1
                if disposal == 3:
                    raise NotImplementedError(
                        "gif_frames: disposal method 3 (restore previous) "
                        "is unsupported"
                    )
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x} at {pos}")
        left, top, iw, ih, ipacked = struct.unpack_from("<HHHHB", data, pos + 1)
        pos += 10
        interlaced = bool(ipacked & 0x40)
        pal = gpal
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = data[pos : pos + 3 * n]
            pos += 3 * n
        if not pal:
            raise ValueError("GIF frame without any color table")
        min_code = data[pos]
        pos += 1
        payload = bytearray()
        while data[pos]:
            ln = data[pos]
            payload += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1  # block terminator
        idx = np.frombuffer(
            _lzw_decode(bytes(payload), min_code)[: iw * ih], dtype=np.uint8
        ).reshape(ih, iw)
        if interlaced:
            order = np.concatenate(
                [np.arange(s, ih, st) for s, st in ((0, 8), (4, 8), (2, 4), (1, 2))]
            )
            full = np.empty_like(idx)
            full[order] = idx
            idx = full
        p = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)
        if canvas is None:
            canvas = np.tile(bg_rgb, (height, width, 1)).astype(np.uint8)
        elif pending is not None and pending[0] == 2:
            # the PREVIOUS frame asked for restore-to-background of its
            # own region once its display time ended
            pl, pt, pw, ph = pending[1]
            canvas[pt : pt + ph, pl : pl + pw] = bg_rgb
        region = canvas[top : top + ih, left : left + iw]
        if 0 <= transparent < len(p):
            mask = idx != transparent
            region[mask] = p[idx][mask]
        else:
            region[:] = p[idx]
        frames.append((delay, canvas.tobytes()))
        pending = (disposal, (left, top, iw, ih))
        delay = 0  # a GCE governs only the single following image
        disposal = 0
        transparent = -1
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


def gif_scan_meta(data: bytes) -> tuple[int, int, int, int]:
    """(width, height, n_frames, total_delay_cs) by walking block
    headers ONLY — no LZW decode, the GIF analogue of the AVI header +
    idx1 fast path."""
    if data[:4] != GIF_SIG or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF: missing GIF87a/GIF89a signature")
    width, height, packed, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    n_frames = 0
    total_delay = 0
    while pos < len(data):
        block = data[pos]
        if block == 0x3B:
            break
        if block == 0x21:
            if data[pos + 1] == 0xF9:
                (delay,) = struct.unpack_from("<H", data, pos + 4)
                total_delay += delay
            pos += 2
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x} at {pos}")
        _l, _t, _iw, _ih, ipacked = struct.unpack_from("<HHHHB", data, pos + 1)
        pos += 10
        if ipacked & 0x80:
            pos += 3 * (2 << (ipacked & 0x07))
        pos += 1  # LZW min code size
        while data[pos]:  # skip data sub-blocks without decoding
            pos += 1 + data[pos]
        pos += 1
        n_frames += 1
    return width, height, n_frames, total_delay
