"""Feature-hashing document embeddings (north-star, SURVEY.md §2.11b/c)
— the hashing trick (Weinberger et al. 2009, sklearn
``HashingVectorizer`` semantics): each term updates one of ``dim``
buckets chosen by hash, with a second hash picking the sign so
collisions cancel in expectation. Produces an ``array<float>`` column
compatible with every vector-lane operator (cosine top-k, IVF, PQ,
embedding near-dup) WITHOUT an external model — the standard cheap
bridge from raw text to the similarity stack, and the only "embedding"
computable map-side at 100 TB with zero training state.

Pure JVM: explode terms -> bucket/sign from xxhash64 -> one
partial-aggregating shuffle on (doc, bucket) -> one doc-side
aggregation assembling the dense vector from at most ``dim`` entries.
No UDF anywhere; document text never shuffles (terms hash to 8-byte
keys before the exchange).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens, word_shingles


def hashed_embedding(
    docs: DataFrame,
    dim: int = 256,
    shingle_n: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = True,
) -> DataFrame:
    """(id, text) -> (id, embedding array<float>). ``shingle_n > 1``
    hashes word n-grams instead of unigrams (more positional signal,
    same cost shape). ``normalize`` scales to unit L2 norm so dot
    products are cosines; documents with no terms (or a zero vector
    after sign cancellation) come back all-zero rather than NaN."""
    if dim <= 0:
        raise ValueError(f"dim must be positive, got {dim}")
    toks = tokens(text_col)
    # distinct=False: the hashing trick accumulates COUNTS — the
    # dedup lanes' set semantics would binarize repeated shingles
    terms: Column = (
        toks
        if shingle_n == 1
        else word_shingles(toks, shingle_n, distinct=False)
    )
    # the whitespace tokenizer yields [""] on empty text (split
    # semantics); an empty term is not a feature
    terms = F.filter(terms, lambda t: t != "")
    term = F.explode(terms).alias("term")
    hashed = docs.select(F.col(id_col), term).select(
        id_col,
        F.pmod(F.xxhash64("term"), F.lit(dim)).cast("int").alias("bucket"),
        # independent second hash (seeded by a constant second column)
        # decides the sign, the collision-cancelling half of the trick
        F.when(
            F.pmod(F.xxhash64("term", F.lit(1)), F.lit(2)) == 0, F.lit(1.0)
        ).otherwise(F.lit(-1.0)).alias("sign"),
    )
    cells = hashed.groupBy(id_col, "bucket").agg(
        F.sum("sign").alias("val")
    )
    assembled = (
        cells.groupBy(id_col)
        .agg(
            F.map_from_arrays(
                F.collect_list("bucket"), F.collect_list("val")
            ).alias("m")
        )
        .select(
            id_col,
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(F.col("m")[i], F.lit(0.0)),
            ).alias("raw"),
        )
    )
    if normalize:
        norm = F.sqrt(
            F.aggregate(
                F.col("raw"), F.lit(0.0), lambda acc, x: acc + x * x
            )
        )
        vec = F.when(norm > 0, F.transform(
            F.col("raw"), lambda x: x / norm
        )).otherwise(F.col("raw"))
    else:
        vec = F.col("raw")
    out = assembled.select(
        id_col, vec.cast("array<float>").alias("embedding")
    )
    # termless documents drop out of the explode; restore them as
    # all-zero vectors so the output covers every input id
    zeros = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)), lambda _: F.lit(0.0)
    ).cast("array<float>")
    missing = docs.select(F.col(id_col)).join(
        out.select(id_col), id_col, "left_anti"
    ).select(id_col, zeros.alias("embedding"))
    return out.unionByName(missing)
