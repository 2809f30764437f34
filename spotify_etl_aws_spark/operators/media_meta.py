"""Header-only metadata for COMPRESSED media containers (north-star,
SURVEY.md §2.11d) — MP3 and MP4/ISO-BMFF.

The sample/pixel decode of lossy codecs (MP3 audio, H.264/AAC inside
MP4) needs libraries this container lacks and stays behind the
documented ``NotImplementedError`` seam in ``operators/audio.py`` /
``operators/video.py``. The container STRUCTURE, however, is plain
``struct`` parsing — and metadata is what a 100 TB curation pass
actually aggregates on (duration, codec, dimensions, bitrate), so it
gets the same real treatment as the AVI/WAV/GIF parsers:

- ``parse_mp3_meta`` skips an ID3v2 tag, then walks every MPEG audio
  frame header (Layer III, MPEG 1/2/2.5), summing exact per-frame
  sample counts — no Xing/Info estimate, the walk is authoritative and
  VBR-correct because each frame header carries its own bitrate.
- ``parse_mp4_meta`` walks the ISO-BMFF box tree (64-bit largesize
  boxes included): ftyp brand, mvhd movie duration, and per-track
  tkhd dimensions / mdhd timescale / hdlr kind / stsd codec fourcc /
  stsz sample count. Nothing inside ``mdat`` is touched.

``with_container_meta`` is the Spark lane: one Arrow pass, magic-byte
dispatch, binary column dropped on the way out so downstream shuffles
never carry media bytes (same rule as every other §2.11d kernel).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from typing import NamedTuple

import pandas as pd
from pyspark.sql import DataFrame

# ---- MP3 ----

_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
              0: (11025, 12000, 8000)}  # version bits -> sample rates
_MP3_BITRATES_V1L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                      224, 256, 320)
_MP3_BITRATES_V2L3 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                      144, 160)


class Mp3Meta(NamedTuple):
    version: str  # "1", "2", "2.5"
    sample_rate: int
    channels: int
    n_frames: int
    duration_ms: float
    bitrate_kbps: float  # exact average over the walked frames
    vbr: bool


def _id3v2_size(data: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 if none)."""
    if len(data) < 10 or data[:3] != b"ID3":
        return 0
    if any(b & 0x80 for b in data[6:10]):
        raise ValueError("ID3v2 size bytes must be syncsafe")
    size = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
    footer = 10 if data[5] & 0x10 else 0
    return 10 + size + footer


def parse_mp3_meta(
    data: bytes, max_resync_bytes: int | None = None
) -> Mp3Meta:
    """Walk every frame header of an MPEG Layer III stream. Exact for
    CBR and VBR alike (per-frame bitrates are summed, not estimated);
    Layer I/II and free-format bitrate raise at the seam.

    ``max_resync_bytes`` bounds the leading-garbage scan: if no frame
    is found within that many bytes past the ID3 tag, raise instead of
    walking the whole blob byte-by-byte — the corpus-kernel posture
    (``with_container_meta``) where the input may be a misfiled 100 MB
    binary that is not an MP3 at all."""
    pos = _id3v2_size(data)
    resync_limit = (
        len(data) if max_resync_bytes is None else pos + max_resync_bytes
    )
    n_frames, total_samples, total_bits = 0, 0, 0
    rate = channels = 0
    version = ""
    bitrates_seen: set[int] = set()
    other_layer_seen = free_format_seen = False
    while pos + 4 <= len(data):
        b0, b1, b2, b3 = data[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            if n_frames:
                break  # trailing tag (ID3v1 "TAG", APE) ends the walk
            if pos >= resync_limit:
                raise ValueError(
                    "no MPEG audio frames found within resync bound"
                )
            pos += 1  # resync: garbage before the first frame
            continue
        vbits = (b1 >> 3) & 3
        layer = (b1 >> 1) & 3
        br_idx = b2 >> 4
        sr_idx = (b2 >> 2) & 3
        free_format = vbits != 1 and layer == 1 and br_idx == 0 and sr_idx != 3
        if free_format and n_frames:
            # trailing bytes that happen to decode as a free-format
            # header after real frames are end-of-stream, exactly like
            # a trailing tag — a genuinely free-format STREAM (no real
            # frames ever) still reports the precise seam below
            break
        valid = vbits != 1 and 0 < br_idx < 15 and sr_idx != 3
        if not n_frames and (not valid or layer != 1):
            # sync-LOOKING bytes inside leading garbage: keep scanning
            # (raising here would let one corrupt ID3 region kill the
            # task for an otherwise-parseable stream); remember the
            # well-formed other-layer / free-format sightings for the
            # precise seam message if no real frame ever appears
            other_layer_seen |= valid and layer != 1
            free_format_seen |= free_format
            pos += 1
            continue
        if layer != 1:  # 1 == Layer III
            # only reachable with n_frames > 0 (the first-frame case is
            # consumed by the resync branch above): trailing garbage
            # carrying Layer I/II sync patterns is end-of-stream, same
            # treatment as a trailing tag — a genuinely Layer I/II
            # stream (no Layer III frame ever) reports its seam below
            break
        if not valid:
            break  # corrupt header mid-stream ends the walk
        v1 = vbits == 3
        kbps = (_MP3_BITRATES_V1L3 if v1 else _MP3_BITRATES_V2L3)[br_idx]
        rate = _MP3_RATES[vbits][sr_idx]
        spf = 1152 if v1 else 576
        padding = (b2 >> 1) & 1
        frame_len = (spf // 8) * kbps * 1000 // rate + padding
        if frame_len < 4 or pos + frame_len > len(data):
            break  # truncated final frame
        version = {3: "1", 2: "2", 0: "2.5"}[vbits]
        channels = 1 if (b3 >> 6) == 3 else 2
        n_frames += 1
        total_samples += spf
        total_bits += frame_len * 8
        bitrates_seen.add(kbps)
        pos += frame_len
    if not n_frames:
        if free_format_seen:
            raise NotImplementedError("free-format bitrate unsupported")
        if other_layer_seen:
            raise NotImplementedError(
                "parse_mp3_meta supports Layer III only"
            )
        raise ValueError("no MPEG audio frames found")
    duration_ms = total_samples / rate * 1000.0
    return Mp3Meta(
        version, rate, channels, n_frames, duration_ms,
        total_bits / (duration_ms or 1.0), len(bitrates_seen) > 1,
    )


# ---- MP4 / ISO-BMFF ----


class Mp4Track(NamedTuple):
    kind: str  # 'vide' / 'soun' / ...
    codec: str  # stsd entry fourcc, e.g. 'avc1', 'mp4a'
    width: int
    height: int
    n_samples: int
    duration_ms: float


class Mp4Meta(NamedTuple):
    brand: str
    duration_ms: float
    tracks: tuple[Mp4Track, ...]


def _boxes(data: bytes, pos: int, end: int):
    """Yield (tag, body_start, body_end); handles largesize (size==1)
    and to-end (size==0) boxes."""
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8].decode("latin-1")
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:
            size = end - pos
            body = pos + 8
        else:
            body = pos + 8
        if size < body - pos or pos + size > end:
            raise ValueError(f"invalid box size for '{tag}'")
        yield tag, body, pos + size
        pos += size


def _find(data: bytes, pos: int, end: int, tag: str) -> tuple[int, int] | None:
    for t, b, e in _boxes(data, pos, end):
        if t == tag:
            return b, e
    return None


def _mvhd_timescale_duration(data: bytes, b: int) -> tuple[int, int]:
    ver = data[b]
    if ver == 1:
        (ts,) = struct.unpack_from(">I", data, b + 20)
        (dur,) = struct.unpack_from(">Q", data, b + 24)
    else:
        (ts,) = struct.unpack_from(">I", data, b + 12)
        (dur,) = struct.unpack_from(">I", data, b + 16)
    return ts, dur


def parse_mp4_meta(data: bytes) -> Mp4Meta:
    """Box-tree walk of an ISO-BMFF (MP4/M4A/MOV) file: brand, movie
    duration, per-track kind/codec/dims/sample-count. Header-only —
    ``mdat`` payloads are never read."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF file: missing ftyp")
    brand = data[8:12].decode("latin-1")
    moov = _find(data, 0, len(data), "moov")
    if moov is None:
        raise ValueError("ISO-BMFF file has no moov box")
    mb, me = moov
    mvhd = _find(data, mb, me, "mvhd")
    if mvhd is None:
        raise ValueError("moov has no mvhd")
    ts, dur = _mvhd_timescale_duration(data, mvhd[0])
    movie_ms = dur / ts * 1000.0 if ts else 0.0
    tracks: list[Mp4Track] = []
    for t, b, e in _boxes(data, mb, me):
        if t != "trak":
            continue
        width = height = n_samples = 0
        kind = codec = ""
        trk_ms = 0.0
        tkhd = _find(data, b, e, "tkhd")
        if tkhd is not None:
            tb, te = tkhd
            # width/height are the trailing 16.16 fixed-point pair in
            # both tkhd versions
            w_fx, h_fx = struct.unpack_from(">II", data, te - 8)
            width, height = w_fx >> 16, h_fx >> 16
        mdia = _find(data, b, e, "mdia")
        if mdia is not None:
            db, de = mdia
            mdhd = _find(data, db, de, "mdhd")
            if mdhd is not None:
                mts, mdur = _mvhd_timescale_duration(data, mdhd[0])
                trk_ms = mdur / mts * 1000.0 if mts else 0.0
            hdlr = _find(data, db, de, "hdlr")
            if hdlr is not None:
                kind = data[hdlr[0] + 8 : hdlr[0] + 12].decode("latin-1")
            minf = _find(data, db, de, "minf")
            if minf is not None:
                stbl = _find(data, minf[0], minf[1], "stbl")
                if stbl is not None:
                    sb, se = stbl
                    stsd = _find(data, sb, se, "stsd")
                    if stsd is not None:
                        (n_entries,) = struct.unpack_from(
                            ">I", data, stsd[0] + 4
                        )
                        if n_entries:
                            codec = data[
                                stsd[0] + 12 : stsd[0] + 16
                            ].decode("latin-1")
                    stsz = _find(data, sb, se, "stsz")
                    if stsz is not None:
                        (n_samples,) = struct.unpack_from(
                            ">I", data, stsz[0] + 8
                        )
        tracks.append(
            Mp4Track(kind, codec, width, height, n_samples, trk_ms)
        )
    return Mp4Meta(brand, movie_ms, tuple(tracks))


# ---- Spark lane ----


def with_container_meta(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """Compressed-container metadata in one Arrow pass, magic-byte
    dispatch (MP3 vs ISO-BMFF): (id, container, codec, duration_ms,
    bitrate_kbps, sample_rate, channels, width, height, n_bytes).
    The binary column is dropped on the way out; for MP4 the first
    video track provides dims/codec, falling back to the first track.

    Rows whose parse throws land as ``container='unknown'`` (no MPEG
    frames / corrupt container — one JPEG misfiled into an audio
    column must cost one row, not the Arrow batch) or
    ``container='unsupported'`` (a documented codec seam: Layer I/II,
    free-format) with zeroed fields. Non-ISO-BMFF bytes go through the
    MP3 walk rather than a byte-0 magic gate so its leading-garbage
    resync keeps working."""
    schema = (
        f"{id_col} bigint, container string, codec string, "
        "duration_ms double, bitrate_kbps double, sample_rate int, "
        "channels int, width int, height int, n_bytes bigint"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, raw in zip(pdf[id_col], pdf[media_col]):
                raw = bytes(raw)
                try:
                    if len(raw) >= 12 and raw[4:8] == b"ftyp":
                        m = parse_mp4_meta(raw)
                        vids = [t for t in m.tracks if t.kind == "vide"]
                        pick = vids[0] if vids else (
                            m.tracks[0] if m.tracks else None
                        )
                        rows.append((
                            int(i), f"mp4/{m.brand}",
                            pick.codec if pick else "",
                            m.duration_ms,
                            len(raw) * 8 / m.duration_ms if m.duration_ms else 0.0,
                            0, 0,
                            pick.width if pick else 0,
                            pick.height if pick else 0,
                            len(raw),
                        ))
                    else:
                        # MP3 lane with EVIDENCE gating: the walk's
                        # leading-junk resync is bounded (64 KB) and a
                        # stream is accepted only on >= 2 chained
                        # frames or an explicit ID3 tag — a single
                        # accidental sync-valid 4-byte pattern (which
                        # random binaries contain every ~100 KB) is
                        # not an MP3, and must land 'unknown', not
                        # fabricate duration/bitrate metadata
                        tagged = raw[:3] == b"ID3"
                        a = parse_mp3_meta(raw, max_resync_bytes=65536)
                        if a.n_frames < 2 and not tagged:
                            raise ValueError("single-frame sync: no evidence")
                        rows.append((
                            int(i), f"mp3/v{a.version}", "mp3",
                            a.duration_ms, a.bitrate_kbps, a.sample_rate,
                            a.channels, 0, 0, len(raw),
                        ))
                except NotImplementedError:
                    # documented codec seam (Layer I/II, free-format) —
                    # but only with header evidence (ID3 tag or a sync
                    # word at byte 0); noise that merely CONTAINS
                    # seam-looking sync bytes is 'unknown', not a seam
                    attested = raw[:3] == b"ID3" or (
                        len(raw) >= 2
                        and raw[0] == 0xFF
                        and (raw[1] & 0xE0) == 0xE0
                    )
                    rows.append((
                        int(i),
                        "unsupported" if attested else "unknown",
                        "", 0.0, 0.0, 0, 0, 0, 0,
                        len(raw),
                    ))
                except Exception:
                    # one unparseable row (corrupt container, misfiled
                    # format) must not fail the Arrow batch
                    rows.append((
                        int(i), "unknown", "", 0.0, 0.0, 0, 0, 0, 0,
                        len(raw),
                    ))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "container", "codec", "duration_ms",
                    "bitrate_kbps", "sample_rate", "channels",
                    "width", "height", "n_bytes",
                ],
            )

    return df.select(id_col, media_col).mapInPandas(gen, schema=schema)
