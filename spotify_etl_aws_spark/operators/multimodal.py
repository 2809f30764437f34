"""Multimodal (binary) column operators (north-star, SURVEY.md §2.11d).

The reference carries image columns only as URLs in its declared models
(``/root/reference/models/model.py:10,19`` image_url/cover_image_url;
the raw playlist JSON has ``images[]``). A 100 TB training-data lake
carries the media itself: an opaque ``binary`` column plus a typed
metadata struct, with decode / feature-extraction running as
Arrow-batched Python over ``mapInPandas``.

This container has no image/audio libraries, so the *codec* is a
deterministic fake — a self-describing header ``IMG:<w>:<h>:`` followed
by a 16-byte payload — while everything Spark-side is real and tested:
the binary column type, the JVM-side encode, the mapInPandas batch
iteration, the typed output schema, and the oracle round-trip (DuckDB
recomputes the metadata analytically and must hash-match what the
Python decoder parsed back out of the bytes).

Scale notes: mapInPandas streams Arrow batches — memory is bounded by
batch size regardless of table size, the right lane for per-item C
decoders (PIL/ffmpeg) that are per-row calls anyway. Decode early,
project metadata, and drop the binary column before any shuffle: bytes
travel at most once (scan -> decode), never through an exchange.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MEDIA_MAGIC = "IMG"
PAYLOAD_BYTES = 16  # md5 digest length

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


def decode_image(data: bytes) -> "object":
    """Real image decode — requires an imaging library absent from this
    environment. The engine's contract: swap this for PIL/torchvision in
    a real deployment; everything around it (mapInPandas batching,
    schema, column flow) is already wired."""
    raise NotImplementedError(
        "image decode requires an imaging library (e.g. PIL) not present "
        "in this container; metadata extraction uses the deterministic "
        "fake codec (parse_media_meta)"
    )


def _parse_one(b: bytes) -> tuple[str, int, int, int]:
    magic, w, h, _ = b.split(b":", 3)
    return magic.decode("ascii").lower(), int(w), int(h), len(b)


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
    out, through the same codec seam as decode: in a real deployment
    the Arrow batch body is PIL ``decode -> resize -> encode``; with
    the fake codec the header is rewritten to the target dimensions and
    the payload derived deterministically from the original payload +
    target (so output bytes are reproducible, differ from the input,
    and re-decoding yields exactly the requested dimensions).

    Scale shape: bytes flow scan -> kernel -> (sink); the resized
    column comes back as ``binary`` for writing, never into a shuffle —
    join/aggregate on the METADATA frames instead."""
    import hashlib

    schema = f"{id_col} bigint, {media_col} binary"
    suffix = f":{width}x{height}".encode("ascii")
    header = b"%s:%d:%d:" % (MEDIA_MAGIC.encode("ascii"), width, height)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def one(b: bytes) -> bytes:
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
