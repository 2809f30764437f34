"""Dedup query inventory (north-star, SURVEY.md §2.11) over ``documents``.

Every query here is fully oracle-checked: the md5-based MinHash is
portable SQL, so even the LSH banding has an exact DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..operators.dedup import (
    exact_dedup_groups,
    jaccard_pairs,
    lsh_verified_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    neardup_clusters,
    simhash_fingerprints,
    simhash_pairs,
)
from ..sources.readers import load_table as t
from ..operators.lineage import cut_lineage

NUM_HASHES = 8
BANDS = 4
SHINGLE_N = 3
JACCARD_THRESHOLD = 0.05
# Skew guard for the exact inverted-index path: shingles in more than
# this many documents are dropped from the effective shingle sets,
# bounding any one shingle's self-join expansion to max_df*(max_df-1)/2.
JACCARD_MAX_DF = 100
LSH_VERIFY_THRESHOLD = 0.5
SIMHASH_BITS = 32
SIMHASH_BANDS = 4
SIMHASH_MAX_HAMMING = 3

# Shared oracle CTE: tokens + distinct word n-gram shingles, the exact SQL
# twin of functions.text.tokens/word_shingles (same regex, same indices).
# Slice bounds derive from SHINGLE_N (DuckDB slices are 1-based inclusive)
# so retuning the constant moves both engines together.
_SHINGLE_CTE = rf"""
toks AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+{SHINGLE_N - 1}], ' ') AS shingle
  FROM (SELECT doc_id, w, unnest(range(1, len(w) - {SHINGLE_N - 2})) AS i FROM toks)
)
"""

_SIG_EXPRS = ",\n         ".join(
    f"min(md5(concat('{i}:', shingle))) AS sig{i}" for i in range(NUM_HASHES)
)
_SIG_CTE = f"""
sig AS (
  SELECT doc_id,
         {_SIG_EXPRS}
  FROM sh GROUP BY doc_id
)
"""

_BAND_CASES = "\n           ".join(
    f"WHEN {b} THEN md5(concat(sig{2 * b}, sig{2 * b + 1}))" for b in range(BANDS)
)


def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on normalized content."""
    return exact_dedup_groups(t(spark, sf_dir, "documents"))


ORACLE_EXACT = """
SELECT md5(lower(text)) AS text_hash,
       min(doc_id)      AS doc_id,
       count(*)         AS n_copies
FROM documents
GROUP BY md5(lower(text))
"""


def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature build (operators/dedup.py:minhash_signatures —
    its own internal stage, oracle-covered through this query's CTE
    chain) followed by banded LSH candidate generation."""
    sig = minhash_signatures(
        t(spark, sf_dir, "documents"), num_hashes=NUM_HASHES, shingle_n=SHINGLE_N
    )
    # the signature aggregation (shingle explode + k md5 mins) feeds
    # both sides of the band self-join; one lazy localCheckpoint
    # computes it once (r14: 0.77 -> 0.62 s interleaved A/B; the
    # checkpoint lives HERE, not inside minhash_lsh_pairs, because
    # lsh_verified_pairs passes an already-materialized projection)
    sig = sig.transform(cut_lineage)
    return minhash_lsh_pairs(sig, num_hashes=NUM_HASHES, bands=BANDS)


ORACLE_MINHASH_LSH = f"""
WITH {_SHINGLE_CTE.strip()},
{_SIG_CTE.strip()},
band AS (
  SELECT doc_id, b,
         CASE b
           {_BAND_CASES}
         END AS bh
  FROM (SELECT sig.*, unnest(range(0, {BANDS})) AS b FROM sig)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM band a JOIN band b
  ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
"""


def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact inverted-index Jaccard with the document-frequency skew
    guard on by default — the exposed operator is skew-safe; the
    uncapped form stays available via operators.dedup.jaccard_pairs
    (max_df=None) for verification on bounded corpora."""
    return jaccard_pairs(
        t(spark, sf_dir, "documents"),
        shingle_n=SHINGLE_N,
        threshold=JACCARD_THRESHOLD,
        max_df=JACCARD_MAX_DF,
    )


ORACLE_JACCARD = f"""
WITH {_SHINGLE_CTE.strip()},
keep AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {JACCARD_MAX_DF}),
shf AS (SELECT sh.* FROM sh JOIN keep USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shf GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(n_common / (sa.n_sh + sb.n_sh - n_common), 4) AS jaccard
FROM common
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= {JACCARD_THRESHOLD}
"""


_SIMHASH_BITSUMS = ", ".join(
    f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
    for j in range(SIMHASH_BITS)
)
_SIMHASH_FP = " + ".join(
    f"(CASE WHEN b{j} > 0 THEN {1 << j}::BIGINT ELSE 0 END)"
    for j in range(SIMHASH_BITS)
)
_SIMHASH_CTE = f"""
hh AS (
  SELECT doc_id,
         ('0x' || substr(md5(shingle), 1, {SIMHASH_BITS // 4}))::BIGINT AS h
  FROM sh
),
bs AS (SELECT doc_id, {_SIMHASH_BITSUMS} FROM hh GROUP BY doc_id),
fp AS (SELECT doc_id, ({_SIMHASH_FP}) AS simhash FROM bs)
"""


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded SimHash near-dup pairs with Hamming verification. The
    fingerprint build (operators/dedup.py:simhash_fingerprints) is this
    query's internal stage, oracle-covered through the CTE chain."""
    fps = simhash_fingerprints(
        t(spark, sf_dir, "documents"), shingle_n=SHINGLE_N, bits=SIMHASH_BITS
    )
    return simhash_pairs(
        fps,
        bits=SIMHASH_BITS,
        bands=SIMHASH_BANDS,
        max_hamming=SIMHASH_MAX_HAMMING,
    )


_SIMHASH_WIDTH = SIMHASH_BITS // SIMHASH_BANDS
ORACLE_SIMHASH_PAIRS = f"""
WITH {_SHINGLE_CTE.strip()},
{_SIMHASH_CTE.strip()},
banded AS (
  SELECT doc_id, simhash, b,
         (simhash >> (b * {_SIMHASH_WIDTH})) & {(1 << _SIMHASH_WIDTH) - 1} AS bb
  FROM (SELECT fp.*, unnest(range(0, {SIMHASH_BANDS})) AS b FROM fp)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM banded a JOIN banded b
  ON a.b = b.b AND a.bb = b.bb AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
"""


def dedup_lsh_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed near-dedup: LSH candidates -> exact Jaccard verify on
    candidates only (operators/dedup.py:lsh_verified_pairs)."""
    return lsh_verified_pairs(
        t(spark, sf_dir, "documents"),
        num_hashes=NUM_HASHES,
        bands=BANDS,
        shingle_n=SHINGLE_N,
        threshold=LSH_VERIFY_THRESHOLD,
    )


ORACLE_LSH_VERIFIED = f"""
WITH {_SHINGLE_CTE.strip()},
{_SIG_CTE.strip()},
band AS (
  SELECT doc_id, b,
         CASE b
           {_BAND_CASES}
         END AS bh
  FROM (SELECT sig.*, unnest(range(0, {BANDS})) AS b FROM sig)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM band a JOIN band b
    ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND a.shingle = b.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b,
       round(n_common / (sa.n_sh + sb.n_sh - n_common), 4) AS jaccard
FROM common
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= {LSH_VERIFY_THRESHOLD}
"""


def dedup_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-representative assignment over the verified near-dup
    graph (operators/dedup.py:neardup_clusters) — iterative min-label
    propagation; the oracle computes true connected components with a
    recursive CTE, so the fixpoint is checked exactly."""
    return neardup_clusters(
        t(spark, sf_dir, "documents"),
        num_hashes=NUM_HASHES,
        bands=BANDS,
        shingle_n=SHINGLE_N,
        threshold=LSH_VERIFY_THRESHOLD,
    )


ORACLE_NEARDUP_CLUSTERS = f"""
WITH RECURSIVE {_SHINGLE_CTE.strip()},
{_SIG_CTE.strip()},
band AS (
  SELECT doc_id, b,
         CASE b
           {_BAND_CASES}
         END AS bh
  FROM (SELECT sig.*, unnest(range(0, {BANDS})) AS b FROM sig)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM band a JOIN band b
    ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND a.shingle = b.shingle
  GROUP BY c.doc_a, c.doc_b
),
vp AS (
  SELECT doc_a, doc_b
  FROM common
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
  WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= {LSH_VERIFY_THRESHOLD}
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM vp
  UNION
  SELECT doc_b AS u, doc_a AS v FROM vp
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
)
SELECT d.doc_id,
       least(d.doc_id, coalesce(m.mv, d.doc_id)) AS cluster_rep
FROM documents d
LEFT JOIN (SELECT u, min(v) AS mv FROM reach GROUP BY u) m ON d.doc_id = m.u
"""


QUALITY_CUTOFF = 0.5


def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-data curation pipeline as ONE declared query:
    keep a document iff (a) it is its near-dup cluster's representative
    (min id of its connected component) and (b) its heuristic quality
    score clears the cutoff. Composes neardup_clusters with the
    text-quality expression — the shape of a real pre-training corpus
    filter, end-to-end oracle-checked."""
    from ..functions.text import quality_score

    docs = t(spark, sf_dir, "documents")
    reps = neardup_clusters(
        docs,
        num_hashes=NUM_HASHES,
        bands=BANDS,
        shingle_n=SHINGLE_N,
        threshold=LSH_VERIFY_THRESHOLD,
    ).filter(F.col("doc_id") == F.col("cluster_rep"))
    scored = docs.select(
        "doc_id", F.round(quality_score("text"), 4).alias("quality_score")
    )
    return (
        scored.join(reps.select("doc_id"), "doc_id", "left_semi")
        .filter(F.col("quality_score") >= QUALITY_CUTOFF)
    )


ORACLE_CURATION = f"""
WITH RECURSIVE {_SHINGLE_CTE.strip()},
{_SIG_CTE.strip()},
band AS (
  SELECT doc_id, b,
         CASE b
           {_BAND_CASES}
         END AS bh
  FROM (SELECT sig.*, unnest(range(0, {BANDS})) AS b FROM sig)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM band a JOIN band b
    ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND a.shingle = b.shingle
  GROUP BY c.doc_a, c.doc_b
),
vp AS (
  SELECT doc_a, doc_b
  FROM common
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
  WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= {LSH_VERIFY_THRESHOLD}
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM vp
  UNION
  SELECT doc_b AS u, doc_a AS v FROM vp
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
clusters AS (
  SELECT d.doc_id,
         least(d.doc_id, coalesce(m.mv, d.doc_id)) AS cluster_rep
  FROM documents d
  LEFT JOIN (SELECT u, min(v) AS mv FROM reach GROUP BY u) m ON d.doc_id = m.u
),
q AS (
  SELECT doc_id,
         round(least(1.0, len(string_split_regex(lower(text), '\\s+')) / 100.0)
               * (1 - length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
                      / length(text)), 4) AS quality_score
  FROM documents
)
SELECT q.doc_id, q.quality_score
FROM q
JOIN clusters c ON q.doc_id = c.doc_id AND c.doc_id = c.cluster_rep
WHERE q.quality_score >= {QUALITY_CUTOFF}
"""


def dedup_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup with a deterministic tiebreak (window row_number)
    — the scalable 'pick one representative per key' pattern."""
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id")
    )


ORACLE_FIRST_EVENT = """
SELECT user_id, event_type, event_id
FROM (
  SELECT user_id, event_type, event_id,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events
)
WHERE rn = 1
"""


QUERIES = {
    "dedup_exact_docs": dedup_exact_docs,
    "dedup_minhash_lsh_pairs": dedup_minhash_lsh_pairs,
    "dedup_jaccard_pairs": dedup_jaccard_pairs,
    "dedup_lsh_verified_pairs": dedup_lsh_verified_pairs,
    "dedup_simhash_pairs": dedup_simhash_pairs,
    "dedup_neardup_clusters": dedup_neardup_clusters,
    "corpus_curation": corpus_curation,
    "dedup_first_event": dedup_first_event,
}

ORACLE = {
    "dedup_exact_docs": ORACLE_EXACT,
    "dedup_minhash_lsh_pairs": ORACLE_MINHASH_LSH,
    "dedup_jaccard_pairs": ORACLE_JACCARD,
    "dedup_lsh_verified_pairs": ORACLE_LSH_VERIFIED,
    "dedup_simhash_pairs": ORACLE_SIMHASH_PAIRS,
    "dedup_neardup_clusters": ORACLE_NEARDUP_CLUSTERS,
    "corpus_curation": ORACLE_CURATION,
    "dedup_first_event": ORACLE_FIRST_EVENT,
}
