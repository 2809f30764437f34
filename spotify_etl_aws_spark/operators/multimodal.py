"""Multimodal (binary) column operators (north-star, SURVEY.md §2.11d).

The reference carries image columns only as URLs in its declared models
(``/root/reference/models/model.py:10,19`` image_url/cover_image_url;
the raw playlist JSON has ``images[]``). A 100 TB training-data lake
carries the media itself: an opaque ``binary`` column plus a typed
metadata struct, with decode / feature-extraction running as
Arrow-batched Python over ``mapInPandas``.

The codec is REAL for uncompressed 24-bit BMP — ``encode_bmp`` /
``decode_image`` implement the actual file format with stdlib
``struct`` only (no imaging library needed), and resize is true
nearest-neighbor resampling over the decoded pixel grid. Compressed
formats (JPEG/PNG) still need a library this container lacks; bytes in
those formats raise ``NotImplementedError`` at the same seam — swap in
PIL/torchvision there in a real deployment. A legacy deterministic fake
(``IMG:<w>:<h>:`` header + 16-byte payload) is kept as a fallback so
the plumbing can be exercised with zero codec cost.

Scale notes: mapInPandas streams Arrow batches — memory is bounded by
batch size regardless of table size, the right lane for per-item C
decoders (PIL/ffmpeg) that are per-row calls anyway. Decode early,
project metadata, and drop the binary column before any shuffle: bytes
travel at most once (scan -> decode), never through an exchange.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from typing import NamedTuple

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MEDIA_MAGIC = "IMG"
PAYLOAD_BYTES = 16  # md5 digest length

BMP_HEADER_BYTES = 54  # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)


def bmp_row_bytes(width: int) -> int:
    """Bytes per stored BMP row: 3 bytes/pixel padded to 4-byte
    alignment — the file-format fact the analytic oracle reuses."""
    return (3 * width + 3) & ~3


def encode_bmp(width: int, height: int, payload: bytes) -> bytes:
    """A REAL uncompressed 24-bit BMP file (stdlib ``struct`` only):
    BITMAPFILEHEADER + BITMAPINFOHEADER + bottom-up BGR rows padded to
    4-byte alignment. ``payload`` fills the pixel buffer (repeated /
    truncated to 3*width*height bytes), so passing an exactly-sized
    buffer round-trips pixels bit-for-bit."""
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid BMP dimensions {width}x{height}")
    if not payload:
        raise ValueError("BMP payload must be non-empty")
    import numpy as np

    stride = 3 * width
    row = bmp_row_bytes(width)
    size = BMP_HEADER_BYTES + row * height
    file_header = b"BM" + struct.pack("<IHHI", size, 0, 0, BMP_HEADER_BYTES)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, row * height,
        2835, 2835, 0, 0,
    )
    pix = (payload * (stride * height // len(payload) + 1))[: stride * height]
    # vectorized row layout: rows reversed (positive biHeight = bottom-up
    # storage, the canonical layout) and padded to 4-byte alignment
    rows = np.zeros((height, row), dtype=np.uint8)
    rows[:, :stride] = np.frombuffer(pix, dtype=np.uint8).reshape(height, stride)[
        ::-1
    ]
    return file_header + info_header + rows.tobytes()


class DecodedImage(NamedTuple):
    """Decode result: dimensions plus the top-down unpadded BGR pixel
    buffer (3*width*height bytes)."""

    width: int
    height: int
    mode: str
    pixels: bytes

# Deterministic fake dimensions (any stand-in works; these keep the
# oracle analytic): width/height are affine in doc_id.
WIDTH_BASE, WIDTH_MULT, WIDTH_MOD = 64, 7, 512
HEIGHT_BASE, HEIGHT_MULT, HEIGHT_MOD = 48, 13, 384


def fake_image_bytes(id_col: Column, payload_src: Column) -> Column:
    """JVM-side synthetic media: ``IMG:<w>:<h>:`` header + 16 payload
    bytes (md5 of the source column). Stands in for real image bytes so
    the binary-column plumbing is exercised without a codec library."""
    w = (F.lit(WIDTH_BASE) + (id_col * WIDTH_MULT) % WIDTH_MOD).cast("int")
    h = (F.lit(HEIGHT_BASE) + (id_col * HEIGHT_MULT) % HEIGHT_MOD).cast("int")
    header = F.concat_ws(
        ":", F.lit(MEDIA_MAGIC), w.cast("string"), h.cast("string"), F.lit("")
    )
    return F.concat(header.cast("binary"), F.unhex(F.md5(payload_src)))


def decode_image(data: bytes) -> DecodedImage:
    """REAL image decode for uncompressed 24-bit BMP bytes (stdlib
    only): parses the actual file headers, validates the advertised
    sizes against the buffer, strips row padding, and flips bottom-up
    storage into a top-down pixel buffer. Compressed formats still
    require a library this container lacks — they raise at this seam
    (swap in PIL/torchvision in a real deployment); everything around
    it (mapInPandas batching, schema, column flow) is format-agnostic."""
    if len(data) < 2 or data[:2] != b"BM":
        raise NotImplementedError(
            "decode_image implements uncompressed 24-bit BMP; other "
            "formats (JPEG/PNG/...) need an imaging library (e.g. PIL) "
            "not present in this container"
        )
    if len(data) < BMP_HEADER_BYTES:
        raise ValueError("truncated BMP: missing headers")
    size, _, _, off = struct.unpack_from("<IHHI", data, 2)
    (hsz, width, biheight, planes, bpp, comp, _, _, _, _, _) = struct.unpack_from(
        "<IiiHHIIiiII", data, 14
    )
    if hsz < 40 or planes != 1:
        raise ValueError(f"unsupported BMP header (size={hsz}, planes={planes})")
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"decode_image supports uncompressed 24-bit BMP only "
            f"(got bpp={bpp}, compression={comp})"
        )
    height = abs(biheight)
    if width <= 0 or height == 0:
        raise ValueError(f"invalid BMP dimensions {width}x{biheight}")
    stride = 3 * width
    row = bmp_row_bytes(width)
    if len(data) < off + row * height:
        raise ValueError("truncated BMP: pixel array shorter than advertised")
    rows = [data[off + r * row : off + r * row + stride] for r in range(height)]
    if biheight > 0:  # bottom-up storage -> top-down buffer
        rows.reverse()
    return DecodedImage(width, height, "BGR", b"".join(rows))


def _parse_one(b: bytes) -> tuple[str, int, int, int]:
    """Per-item metadata extraction, dispatched on the actual bytes:
    real BMP header decode when the buffer is a BMP file (width/height
    read straight from the BITMAPINFOHEADER — metadata extraction does
    not build the pixel buffer, exactly like PIL's lazy open()), the
    legacy fake header otherwise."""
    if b[:2] == b"BM":
        width, biheight = struct.unpack_from("<ii", b, 18)
        return "bmp", width, abs(biheight), len(b)
    magic, w, h, _ = b.split(b":", 3)
    return magic.decode("ascii").lower(), int(w), int(h), len(b)


def encode_media_bmp(
    df: DataFrame,
    id_col: str = "doc_id",
    width_col: str = "width",
    height_col: str = "height",
    payload_col: str = "payload",
) -> DataFrame:
    """Encode real BMP media via mapInPandas: (id, width, height,
    payload) -> (id, media binary). This is the encode half of the codec
    seam — the same Arrow-batched lane a PIL/ffmpeg encoder runs in, but
    with the stdlib BMP writer, so the bytes leaving the kernel are a
    genuine image file format."""
    schema = f"{id_col} bigint, media binary"

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "media": [
                        encode_bmp(int(w), int(h), bytes(p))
                        for w, h, p in zip(
                            pdf[width_col], pdf[height_col], pdf[payload_col]
                        )
                    ],
                }
            )

    return df.select(id_col, width_col, height_col, payload_col).mapInPandas(
        _encode, schema=schema
    )


def with_media_meta(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """Decode media metadata out of the binary column via mapInPandas.

    Output: (id, media_type, width, height, n_bytes) — the binary column
    is dropped on the way out so downstream shuffles never carry bytes.
    The per-item parse mirrors how a real decoder runs (a C call per
    item inside an Arrow batch); header fields double as the "decoded"
    metadata.
    """
    schema = f"{id_col} bigint, media_type string, width int, height int, n_bytes int"

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = pdf[media_col].map(_parse_one)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "media_type": parsed.map(lambda t: t[0]),
                    "width": parsed.map(lambda t: t[1]),
                    "height": parsed.map(lambda t: t[2]),
                    "n_bytes": parsed.map(lambda t: t[3]),
                }
            )

    return df.select(id_col, media_col).mapInPandas(_decode, schema=schema)


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """Resize the media column to (width, height) — binary in, binary
    out, through the same codec seam as decode. BMP bytes get a REAL
    resize: decode -> nearest-neighbor resample over the pixel grid
    (numpy fancy indexing, the same arithmetic PIL's NEAREST uses) ->
    re-encode, so the output is a genuine BMP of the target dimensions
    whose pixels come from the source image. Legacy fake bytes get the
    header rewritten and a payload derived deterministically from the
    original payload + target.

    Scale shape: bytes flow scan -> kernel -> (sink); the resized
    column comes back as ``binary`` for writing, never into a shuffle —
    join/aggregate on the METADATA frames instead."""
    import hashlib

    import numpy as np

    schema = f"{id_col} bigint, {media_col} binary"
    suffix = f":{width}x{height}".encode("ascii")
    header = b"%s:%d:%d:" % (MEDIA_MAGIC.encode("ascii"), width, height)

    def _resize_bmp(b: bytes) -> bytes:
        img = decode_image(b)
        src = np.frombuffer(img.pixels, dtype=np.uint8).reshape(
            img.height, img.width, 3
        )
        yi = (np.arange(height) * img.height) // height
        xi = (np.arange(width) * img.width) // width
        out = src[yi][:, xi]
        return encode_bmp(width, height, out.tobytes())

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def one(b: bytes) -> bytes:
                if b[:2] == b"BM":
                    return _resize_bmp(b)
                _, _, _, payload = b.split(b":", 3)
                return header + hashlib.md5(payload + suffix).digest()

            yield pd.DataFrame(
                {id_col: pdf[id_col], media_col: pdf[media_col].map(one)}
            )

    return df.select(id_col, media_col).mapInPandas(_resize, schema=schema)


def media_features(meta: DataFrame) -> DataFrame:
    """Derived features over decoded metadata — back on the JVM lane
    (built-in functions) the moment the bytes are gone."""
    aspect = F.col("width") / F.col("height")
    return meta.select(
        "*",
        F.round(aspect, 4).alias("aspect_ratio"),
        (F.col("width") * F.col("height")).alias("n_pixels"),
        F.when(aspect >= 1.0, F.lit("landscape"))
        .otherwise(F.lit("portrait"))
        .alias("orientation"),
    )
