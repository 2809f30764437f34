"""Audio fingerprinting + Hamming near-duplicate join (north-star,
SURVEY.md §2.11a/§2.11d intersection): find perceptually-near-duplicate
audio clips in a binary media column without an all-pairs scan.

The fingerprint is the time-domain block-energy variant of the
Haitsma–Kalker scheme (ISMIR 2002): frame the PCM signal into
fixed-width blocks, compute per-block energy, and emit the SIGN of
each consecutive-block energy delta as one bit. (Haitsma–Kalker signs
band-energy deltas after an FFT; the time-domain form keeps the exact
same robustness argument — energy contour shape survives amplitude
scaling and small edits — while staying pure numpy. A deployment
swaps an FFT filterbank into the SAME kernel; only the energy vector
construction changes.)

Scale shape mirrors operators/phash.py exactly, and the candidate
machinery IS phash's: ``hamming_near_pairs`` does the banded-LSH
candidate join + JVM bit_count verify, so both media dedup lanes ride
one tested join operator. Decode + energy run per-clip inside an
Arrow-batched mapInPandas task; only the 8-byte fingerprint shuffles.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fingerprint geometry: BLOCKS energy blocks -> BLOCKS-1 = 56 sign
#: bits, the same 56-bit/8-band layout the image dHash uses so both
#: lanes share hamming_near_pairs' pigeonhole guarantee.
FP_BLOCKS = 57
FP_BITS = FP_BLOCKS - 1  # 56


def energy_fingerprint_bytes(data: bytes, blocks: int = FP_BLOCKS) -> int:
    """Fingerprint of one encoded WAV clip: decode (mono PCM-16),
    partition into ``blocks`` equal frames, per-frame mean energy,
    bit j set iff energy[j] > energy[j+1] (strict; ties -> 0 on both
    engines). Sample count must divide evenly into the frame grid so
    frame energies are true partition means — real pipelines resample
    first; this fails loud instead of silently truncating."""
    import numpy as np

    from .audio import decode_audio

    clip = decode_audio(data)
    if clip.channels != 1:
        raise ValueError(
            f"energy_fingerprint_bytes: expected mono, got "
            f"{clip.channels} channels (downmix first)"
        )
    if clip.n_samples % blocks:
        raise ValueError(
            f"energy_fingerprint_bytes: {clip.n_samples} samples do not "
            f"divide into {blocks} frames; resample first so frame "
            "energies are exact partition means"
        )
    pcm = np.frombuffer(clip.samples, dtype="<i2").astype(np.float64)
    frames = pcm.reshape(blocks, -1)
    energy = (frames * frames).mean(axis=1)
    bits = energy[:-1] > energy[1:]
    weights = 1 << np.arange(blocks - 1, dtype=np.uint64)
    return int((bits.astype(np.uint64) * weights).sum())


def fingerprint_media(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    blocks: int = FP_BLOCKS,
) -> DataFrame:
    """(id, media binary) -> (id, afp long) via an Arrow-batched
    mapInPandas kernel."""
    import pandas as pd

    proj = df.select(F.col(id_col).alias("__id"), F.col(media_col).alias("__m"))

    def _fp(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "__id": pdf["__id"],
                    "afp": [
                        energy_fingerprint_bytes(bytes(b), blocks)
                        for b in pdf["__m"]
                    ],
                }
            )

    from .phash import id_ddl

    out = proj.mapInPandas(_fp, schema=f"__id {id_ddl(df, id_col)}, afp long")
    return out.select(F.col("__id").alias(id_col), "afp")
