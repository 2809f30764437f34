"""Data-selection & retrieval query inventory (north-star, SURVEY.md
§2.11) — the round-6 operator lanes promoted into the oracle-checked
contract: BM25 ranking, hybrid RRF fusion, exact-substring dedup,
Gopher quality signals, temperature/UniMax mixing, and semantic
decontamination. Each query wraps the production operator and carries
an exact DuckDB twin (same rounding, same tie-breaks), extending the
50-query driver window with locally-verified entries (the driver
checks the first 50; ``tests/test_oracle.py`` checks ALL of these).

Determinism conventions follow ``queries/__init__``: every ranking
cuts on ROUNDED scores with an id tie-break so the k-boundary is
engine-independent, and every double column is rounded identically on
both sides (``+ 0.0`` normalizes IEEE -0.0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.vectors import cosine
from ..operators.bm25 import bm25_index, bm25_search, rrf_fuse
from ..operators.decontaminate import semantic_overlap
from ..operators.heuristics import (
    domain_mix_scaled,
    gopher_quality_stats,
    unimax_allocation,
)
from ..functions.text import tokens
from ..operators.sketches import (
    cm_estimate,
    count_min_sketch,
    misra_gries_topk,
)
from ..operators.substring_dedup import dedup_substrings
from ..sources.readers import load_table as t
from .vector import _embeddings, _query_vector

# ---- constants shared by Spark queries and their SQL twins ----
BM25_QUERY = "data quality filter"
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 15
RRF_K = 60
RRF_TOPK = 10
RRF_CAND = 20
RRF_QUERY_VEC = 7
SUBSTR_K = 8
MIX_TEMPERATURE = 0.5
UNIMAX_MAX_EPOCHS = 2.0
UNIMAX_BUDGET_FRAC = 0.5
SEM_BENCH_MOD = 25  # bench set = every 25th vec_id (20 vectors at sf0.01)

_BM25_TERMS = ", ".join(
    f"'{term}'" for term in sorted(set(BM25_QUERY.split()))
)

# Okapi BM25 (Lucene +1-idf form), the exact SQL twin of
# operators/bm25.py:_bm25_contrib — same association order so the
# doubles agree far below the 4dp rounding. Produces `scored`
# (doc_id, score) for the query's terms.
_BM25_SCORED_CTE = rf"""
toks AS (
  SELECT doc_id, t.term
  FROM documents, unnest(string_split_regex(lower(text), '\s+')) AS t(term)
  WHERE t.term <> ''
),
dl AS (
  -- per-ROW so empty/whitespace-only documents contribute dl=0, exactly
  -- as bm25_index's doc_lens does; an aggregate over toks would silently
  -- drop them and skew avgdl
  SELECT doc_id,
         len(list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '')) AS dl
  FROM documents
),
consts AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT avg(dl) FROM dl) AS avgdl
),
tf AS (
  SELECT term, doc_id, count(*) AS tf FROM toks
  WHERE term IN ({_BM25_TERMS}) GROUP BY 1, 2
),
df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM toks
  WHERE term IN ({_BM25_TERMS}) GROUP BY 1
),
scored AS (
  SELECT tf.doc_id,
         sum(
           ln((c.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * tf.tf * ({BM25_K1} + 1.0)
           / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl.dl / c.avgdl))
         ) AS score
  FROM tf
  JOIN df USING (term)
  JOIN dl USING (doc_id), consts c
  GROUP BY 1
)
"""


def text_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-k over the corpus for a fixed query
    (operators/bm25.py:bm25_index/bm25_search — bucket-pruned postings,
    TakeOrderedAndProject top-k). Ranks re-derived from the ROUNDED
    score (id tie-break) so the emitted ordering is engine-exact."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    postings, doc_lens, stats = bm25_index(docs)
    # score EVERY hit (topk = corpus size), then cut on the ROUNDED
    # score with the id tie-break — the k-boundary membership rule must
    # match the oracle's rounded cut, not the raw-score cut inside
    # bm25_search (a raw-score boundary can order two docs that round
    # to the same 4dp value differently across engines)
    hits = bm25_search(
        postings, doc_lens, stats, BM25_QUERY,
        topk=stats.n_docs, k1=BM25_K1, b=BM25_B,
    )
    w = W.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        hits.select(
            "doc_id", (F.round("score", 4) + F.lit(0.0)).alias("score")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOPK)
    )


ORACLE_BM25_RANK = f"""
WITH {_BM25_SCORED_CTE}
SELECT doc_id, round(score, 4) + 0.0 AS score,
       row_number() OVER (ORDER BY round(score, 4) + 0.0 DESC, doc_id) AS rank
FROM scored
ORDER BY rank
LIMIT {BM25_TOPK}
"""


def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 keyword candidates fused with an
    embedding-cosine retriever via reciprocal-rank fusion
    (operators/bm25.py:rrf_fuse). Each retriever contributes its
    top-{RRF_CAND} ranking (rounded-score cut, id tie-break); RRF needs
    only the ranks, so the BM25 score and the cosine never share a
    scale."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    postings, doc_lens, stats = bm25_index(docs)
    # full scoring, rounded-score candidate cut (see text_bm25_rank)
    lex = bm25_search(
        postings, doc_lens, stats, BM25_QUERY,
        topk=stats.n_docs, k1=BM25_K1, b=BM25_B,
    )
    wl = W.orderBy(F.desc("score_r"), F.asc("doc_id"))
    lex_rank = (
        lex.withColumn("score_r", F.round("score", 4) + F.lit(0.0))
        .select(
            F.lit("q0").alias("qid"),
            "doc_id",
            F.row_number().over(wl).alias("rank"),
        )
        .filter(F.col("rank") <= RRF_CAND)
    )
    qv = _query_vector(sf_dir, RRF_QUERY_VEC)
    q = F.array(*[F.lit(x) for x in qv])
    wv = W.orderBy(F.desc("cos_r"), F.asc("doc_id"))
    vec_rank = (
        _embeddings(spark, sf_dir)
        .select(
            F.col("vec_id").alias("doc_id"),
            (F.round(cosine(F.col("v"), q), 4) + F.lit(0.0)).alias("cos_r"),
        )
        .withColumn("rank", F.row_number().over(wv))
        .filter(F.col("rank") <= RRF_CAND)
        .select(F.lit("q0").alias("qid"), "doc_id", "rank")
    )
    fused = rrf_fuse([lex_rank, vec_rank], k=RRF_K, topk=RRF_TOPK)
    return fused.select(
        "qid",
        "doc_id",
        (F.round("rrf_score", 6) + F.lit(0.0)).alias("rrf_score"),
        "rank",
    )


ORACLE_HYBRID_RRF = f"""
WITH {_BM25_SCORED_CTE},
lex AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY round(score, 4) + 0.0 DESC, doc_id) AS rank
  FROM scored
  QUALIFY rank <= {RRF_CAND}
),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = {RRF_QUERY_VEC}),
vr AS (
  SELECT vec_id AS doc_id,
         row_number() OVER (
           ORDER BY round(list_dot_product(e.v, q.qv)
                    / (sqrt(list_dot_product(e.v, e.v))
                       * sqrt(list_dot_product(q.qv, q.qv))), 4) + 0.0 DESC,
                    vec_id
         ) AS rank
  FROM e, q
  QUALIFY rank <= {RRF_CAND}
),
un AS (
  SELECT doc_id, 1.0 / ({RRF_K}.0 + rank) AS rr FROM lex
  UNION ALL
  SELECT doc_id, 1.0 / ({RRF_K}.0 + rank) AS rr FROM vr
),
f AS (SELECT doc_id, sum(rr) AS s FROM un GROUP BY 1)
SELECT 'q0' AS qid, doc_id, round(s, 6) + 0.0 AS rrf_score,
       row_number() OVER (ORDER BY s DESC, doc_id) AS rank
FROM f
QUALIFY rank <= {RRF_TOPK}
"""


def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide exact-substring dedup
    (operators/substring_dedup.py:dedup_substrings): every >=
    {SUBSTR_K}-token span occurring more than once keeps its first
    (doc_id, pos) occurrence; other occurrences are cut. The oracle
    recomputes the whole pipeline relationally — windows grouped by
    CONTENT (the hash-free twin: xxhash64 keys are injective here),
    non-canonical occurrences cover [pos, pos+k) positions, and the
    surviving tokens re-join in position order."""
    docs = t(spark, sf_dir, "documents")
    out = dedup_substrings(docs, k=SUBSTR_K)
    return out.select(
        "doc_id", "n_tokens", "dup_tokens", "n_tokens_deduped", "text_deduped"
    )


ORACLE_SUBSTRING = rf"""
WITH low AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM documents
),
raw AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents
),
win AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(w[i:i+{SUBSTR_K - 1}], ' ') AS win
  FROM (SELECT doc_id, w, unnest(range(1, len(w) - {SUBSTR_K - 2})) AS i
        FROM low)
),
ranked AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY win ORDER BY doc_id, pos) AS rn
  FROM win
),
cov AS (
  SELECT DISTINCT doc_id, pos + j AS cp
  FROM ranked, unnest(range(0, {SUBSTR_K})) AS t(j)
  WHERE rn > 1
),
toks AS (
  SELECT doc_id, i - 1 AS p, w[i] AS tok
  FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i FROM raw)
),
kept AS (
  SELECT tk.doc_id, tk.p, tk.tok
  FROM toks tk LEFT JOIN cov c ON tk.doc_id = c.doc_id AND tk.p = c.cp
  WHERE c.doc_id IS NULL
),
agg AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text_deduped,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
),
base AS (
  SELECT doc_id, len(string_split_regex(text, '\s+')) AS n_tokens
  FROM documents
),
dup AS (SELECT doc_id, count(*) AS dup_tokens FROM cov GROUP BY doc_id)
SELECT b.doc_id, b.n_tokens,
       coalesce(d.dup_tokens, 0) AS dup_tokens,
       b.n_tokens - coalesce(d.dup_tokens, 0) AS n_tokens_deduped,
       coalesce(a.text_deduped, '') AS text_deduped
FROM base b
LEFT JOIN dup d USING (doc_id)
LEFT JOIN agg a USING (doc_id)
"""


def text_gopher_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher Table A1 document-quality signals
    (operators/heuristics.py:gopher_quality_stats — pure higher-order
    functions, no explode, no shuffle; the plan pin lives in
    tests/test_heuristics.py). Ratios rounded to 4dp on both engines."""
    stats = gopher_quality_stats(t(spark, sf_dir, "documents"))
    ratio_cols = [
        "mean_word_len",
        "symbol_word_ratio",
        "bullet_line_frac",
        "ellipsis_line_frac",
        "alpha_word_frac",
    ]
    return stats.select(
        "doc_id",
        "n_words",
        *[(F.round(c, 4) + F.lit(0.0)).alias(c) for c in ratio_cols],
        "required_word_hits",
    )


ORACLE_GOPHER = r"""
WITH base AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '\s+'),
                     t -> t <> '') AS words,
         list_filter(string_split(text, chr(10)),
                     l -> length(trim(l)) > 0) AS lines
  FROM documents
),
m AS (
  SELECT doc_id,
         len(words) AS n_words,
         len(lines) AS n_lines,
         coalesce(list_aggregate(list_transform(words, w -> length(w)),
                                 'sum'), 0) AS char_sum,
         length(text) - length(replace(text, '#', '')) AS n_hash,
         (length(text) - length(replace(text, '...', ''))) / 3
           + (length(text) - length(replace(text, '…', ''))) AS n_ellipsis,
         len(list_filter(lines,
             l -> left(ltrim(l), 1) IN ('•', '‣', '▪', '●', '-', '*')))
           AS bullet_lines,
         len(list_filter(lines,
             l -> ends_with(rtrim(l), '...') OR ends_with(rtrim(l), '…')))
           AS ellipsis_lines,
         len(list_filter(words, w -> regexp_matches(w, '[a-z]')))
           AS alpha_words,
         len(list_filter(['the', 'be', 'to', 'of', 'and', 'that',
                          'have', 'with'],
             w -> list_contains(words, w))) AS required_word_hits
  FROM base
)
SELECT doc_id, n_words,
       round(CASE WHEN n_words > 0 THEN char_sum / n_words ELSE 0.0 END, 4)
         + 0.0 AS mean_word_len,
       round(CASE WHEN n_words > 0 THEN (n_hash + n_ellipsis) / n_words
                  ELSE 0.0 END, 4) + 0.0 AS symbol_word_ratio,
       round(CASE WHEN n_lines > 0 THEN bullet_lines / n_lines
                  ELSE 0.0 END, 4) + 0.0 AS bullet_line_frac,
       round(CASE WHEN n_lines > 0 THEN ellipsis_lines / n_lines
                  ELSE 0.0 END, 4) + 0.0 AS ellipsis_line_frac,
       round(CASE WHEN n_words > 0 THEN alpha_words / n_words
                  ELSE 0.0 END, 4) + 0.0 AS alpha_word_frac,
       required_word_hits
FROM m
"""


def mix_domain_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature domain mixing at web-scale stratum cardinality
    (operators/heuristics.py:domain_mix_scaled): the per-stratum keep
    rates q_d ∝ p_d^T normalized by the peak relative upweight,
    computed with THREE scalars of driver state and applied via
    broadcast join. The oracle recomputes the closed form over the
    ``lang`` strata."""
    docs = t(spark, sf_dir, "documents")
    _, rates = domain_mix_scaled(
        docs, "lang", temperature=MIX_TEMPERATURE
    )
    return rates.select(
        "lang", (F.round("rate", 6) + F.lit(0.0)).alias("rate")
    )


ORACLE_MIX_RATES = f"""
WITH c AS (
  SELECT lang, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY 1
),
s AS (
  SELECT sum(n) AS total, sum(pow(n, {MIX_TEMPERATURE})) AS snt FROM c
),
r AS (
  SELECT lang,
         (pow(n, {MIX_TEMPERATURE}) / s.snt) * (s.total / n) AS rel
  FROM c, s
),
p AS (SELECT max(rel) AS peak FROM r)
SELECT lang, round(rel / p.peak, 6) + 0.0 AS rate FROM r, p
"""


def mix_unimax_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax budget water-filling over language strata
    (operators/heuristics.py:unimax_allocation): split half the corpus
    character budget as evenly as possible across languages, capping
    each at {UNIMAX_MAX_EPOCHS} epochs of its own tokens. The oracle
    solves the same water level λ (Σ min(cap_l, λ) = budget) in closed
    form with window functions — the recurrence and the closed form
    agree to fp noise far below the 4dp rounding."""
    docs = t(spark, sf_dir, "documents")
    rows = docs.groupBy("lang").agg(F.sum("n_chars").alias("n")).collect()
    counts = {r["lang"]: float(r["n"]) for r in rows}
    total = sum(sorted(counts.values()))  # sorted: order-stable fp sum
    alloc = unimax_allocation(
        counts,
        budget=UNIMAX_BUDGET_FRAC * total,
        max_epochs=UNIMAX_MAX_EPOCHS,
    )
    out = spark.createDataFrame(
        [(lang, int(counts[lang]), float(alloc[lang]))
         for lang in sorted(alloc)],
        "lang string, n_chars bigint, alloc double",
    )
    return out.select(
        "lang", "n_chars", (F.round("alloc", 4) + F.lit(0.0)).alias("alloc")
    )


ORACLE_UNIMAX = f"""
WITH c AS (
  SELECT lang, CAST(sum(n_chars) AS DOUBLE) AS n FROM documents GROUP BY 1
),
b AS (
  SELECT sum(n) * {UNIMAX_BUDGET_FRAC} AS budget, count(*) AS k FROM c
),
ord AS (
  SELECT lang, n, n * {UNIMAX_MAX_EPOCHS} AS cap,
         row_number() OVER (ORDER BY n * {UNIMAX_MAX_EPOCHS}, lang) AS j,
         sum(n * {UNIMAX_MAX_EPOCHS}) OVER (
           ORDER BY n * {UNIMAX_MAX_EPOCHS}, lang
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_j
  FROM c
),
-- stratum j is water-filled to its cap iff even splitting what remains
-- before it still covers the cap: cap_j * (k - j + 1) <= budget - S_(j-1)
flag AS (
  SELECT o.*, b.budget, b.k,
         (o.cap * (b.k - o.j + 1) <= b.budget - (o.s_j - o.cap)) AS capped
  FROM ord o, b
),
lvl AS (
  SELECT coalesce(max(j) FILTER (WHERE capped), 0) AS bigj,
         coalesce(max(s_j) FILTER (WHERE capped), 0.0) AS s_bigj
  FROM flag
),
lam AS (
  SELECT CASE WHEN l.bigj >= b.k THEN NULL
              ELSE (b.budget - l.s_bigj) / (b.k - l.bigj) END AS lam
  FROM lvl l, b
)
SELECT f.lang, CAST(f.n AS BIGINT) AS n_chars,
       round(CASE WHEN lam.lam IS NULL THEN f.cap
                  ELSE least(f.cap, lam.lam) END, 4) + 0.0 AS alloc
FROM flag f, lam
"""


def decon_semantic_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic decontamination evidence
    (operators/decontaminate.py:semantic_overlap): each corpus
    embedding's maximum cosine against a benchmark set (every
    {SEM_BENCH_MOD}th vector) via the closure-shipped normalized bench
    matrix and one shuffle-free Arrow kernel. Cosines are double on
    both engines; rounded to 4dp."""
    emb = t(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") % SEM_BENCH_MOD == 0)
    out = semantic_overlap(emb, bench, id_col="vec_id")
    return out.select(
        "vec_id", (F.round("max_cosine", 4) + F.lit(0.0)).alias("max_cosine")
    )


ORACLE_SEM_OVERLAP = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
b AS (SELECT v AS bv FROM e WHERE vec_id % {SEM_BENCH_MOD} = 0)
SELECT e.vec_id,
       round(max(list_dot_product(e.v, b.bv)
                 / (sqrt(list_dot_product(e.v, e.v))
                    * sqrt(list_dot_product(b.bv, b.bv)))), 4) + 0.0
         AS max_cosine
FROM e, b
GROUP BY 1
"""


HH_K = 20
HH_CAPACITY = 200_000  # >> per-partition distinct tokens at every SF
CM_DEPTH = 4
CM_WIDTH = 8192
CM_TOPN = 10


def _term_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "documents")
        .select(F.explode(tokens("text")).alias("term"))
        .filter(F.col("term") != "")
    )


def stats_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra–Gries heavy hitters over the corpus token stream
    (operators/sketches.py:misra_gries_topk — bounded per-task state,
    survivor-sized shuffle). At this capacity no task ever evicts, so
    ``max_undercount`` is 0 and the sketch counts are certified EXACT
    — which is precisely what the oracle (an exact count top-k) pins.
    The sketch-regime error bound is tested separately
    (tests/test_sketches.py::test_undercount_bound_holds_under_eviction)."""
    out = misra_gries_topk(
        _term_stream(spark, sf_dir), "term", k=HH_K, capacity=HH_CAPACITY
    )
    return out.select("term", "cnt", "max_undercount", "rank")


ORACLE_HEAVY_HITTERS = f"""
WITH toks AS (
  SELECT t.term
  FROM documents, unnest(string_split_regex(lower(text), '\\s+')) AS t(term)
  WHERE t.term <> ''
),
c AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1)
SELECT term, cnt, 0 AS max_undercount,
       row_number() OVER (ORDER BY cnt DESC, term) AS rank
FROM c
QUALIFY rank <= {HH_K}
"""


def stats_countmin_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min point estimates for the exact top-{CM_TOPN} tokens,
    emitted as a deterministic error-bound CONTRACT (the
    agg_approx_distinct pattern): est ≥ exact always (counters only
    overcount) and est ≤ exact + ⌈e/width · n⌉ — the CM guarantee at
    its standard confidence, deterministic on the fixed fixture+hash.
    The oracle reproduces the exact counts and the literal bounds."""
    import math

    terms = _term_stream(spark, sf_dir)
    sketch = count_min_sketch(terms, "term", depth=CM_DEPTH, width=CM_WIDTH)
    top = (
        terms.groupBy("term")
        .agg(F.count("*").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("term"))
        .limit(CM_TOPN)
    )
    est = cm_estimate(sketch, top, "term", depth=CM_DEPTH, width=CM_WIDTH)
    n_tokens = terms.count()
    slack = int(math.ceil(math.e / CM_WIDTH * n_tokens))
    return top.join(est, "term").select(
        "term",
        "exact_cnt",
        (F.col("est") >= F.col("exact_cnt")).alias("est_ge_exact"),
        (F.col("est") <= F.col("exact_cnt") + F.lit(slack)).alias(
            "est_within_eps"
        ),
    )


# NOTE: est_ge_exact / est_within_eps are hard-coded TRUE — they hold
# PROBABILISTICALLY (~1.8%/key failure odds at depth 4) and are
# deterministic only on the fixed fixture + xxhash64 + width. A
# fixture/width/hash change can flip one with no code bug; the margin
# guard (tests/test_sketches.py::TestProbabilisticOracleMargins)
# asserts the observed slack stays under HALF the bound so erosion
# surfaces there with numbers first. Same applies to
# ORACLE_HLL_DISTINCT and ORACLE_STREAMING_SKETCH below.
ORACLE_COUNTMIN = f"""
WITH toks AS (
  SELECT t.term
  FROM documents, unnest(string_split_regex(lower(text), '\\s+')) AS t(term)
  WHERE t.term <> ''
),
c AS (SELECT term, count(*) AS exact_cnt FROM toks GROUP BY 1),
top AS (
  SELECT term, exact_cnt,
         row_number() OVER (ORDER BY exact_cnt DESC, term) AS rk
  FROM c QUALIFY rk <= {CM_TOPN}
)
SELECT term, exact_cnt, TRUE AS est_ge_exact, TRUE AS est_within_eps
FROM top
"""


SK_DEPTH = 4
SK_WIDTH = 8192
SK_USERS = 10  # watchlist: user_ids 0..9 (present at every SF)


def streaming_sketch_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming windowed count-min
    (streaming/sketches.py:windowed_count_min_stream): per-hour
    sketches built in append mode with bounded depth×width state, then
    probed offline for a 10-user watchlist
    (cm_estimate_windowed). Emitted as the deterministic error-bound
    contract: est ≥ exact (counters only overcount) and
    est ≤ exact + ⌈e/width · n_window⌉. The oracle reproduces the
    exact per-window watchlist counts under the same append-mode
    watermark cutoff (window end ≤ ms-truncated max ts − 1h)."""
    import math

    from ..streaming.pipeline import read_table_stream, run_available_now
    from ..streaming.sketches import (
        cm_estimate_windowed,
        windowed_count_min_stream,
    )

    src = read_table_stream(spark, sf_dir, "events")
    sketch = run_available_now(
        windowed_count_min_stream(
            src, "ts", "user_id", "1 hour", "1 hour", SK_DEPTH, SK_WIDTH
        ),
        "cm_sketch",
        output_mode="append",
    )
    keys = spark.createDataFrame(
        [(i,) for i in range(SK_USERS)], "user_id long"
    )
    est = cm_estimate_windowed(sketch, keys, "user_id", SK_DEPTH, SK_WIDTH)

    ev = t(spark, sf_dir, "events").select(
        F.window("ts", "1 hour").alias("w"), "user_id"
    )
    exact = (
        ev.filter(F.col("user_id") < SK_USERS)
        .groupBy("w", "user_id")
        .agg(F.count("*").alias("exact_cnt"))
    )
    n_win = t(spark, sf_dir, "events").select(
        F.window("ts", "1 hour").alias("w")
    ).groupBy("w").agg(F.count("*").alias("n_w"))
    slack = F.ceil(F.lit(math.e / SK_WIDTH) * F.col("n_w"))
    return (
        est.join(exact, ["w", "user_id"], "left")
        .join(n_win, "w")
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "user_id",
            F.coalesce("exact_cnt", F.lit(0)).alias("exact_cnt"),
            (F.col("est") >= F.coalesce("exact_cnt", F.lit(0))).alias(
                "est_ge_exact"
            ),
            (
                F.col("est")
                <= F.coalesce("exact_cnt", F.lit(0)) + slack
            ).alias("est_within_eps"),
        )
    )


ORACLE_STREAMING_SKETCH = f"""
WITH wm AS (
  SELECT (epoch_us(max(ts)) // 1000 - 3600000) * 1000 AS wm_us FROM events
),
wins AS (
  SELECT DISTINCT date_trunc('hour', ts) AS w
  FROM events, wm
  WHERE epoch_us(date_trunc('hour', ts)) + 3600000000 <= wm_us
),
grid AS (
  SELECT w, u.u AS user_id FROM wins, unnest(range(0, {SK_USERS})) AS u(u)
),
ex AS (
  SELECT date_trunc('hour', ts) AS w, user_id, count(*) AS exact_cnt
  FROM events WHERE user_id < {SK_USERS} GROUP BY 1, 2
)
SELECT strftime(g.w, '%Y-%m-%d %H:%M:%S') AS window_start,
       g.user_id,
       coalesce(ex.exact_cnt, 0) AS exact_cnt,
       TRUE AS est_ge_exact,
       TRUE AS est_within_eps
FROM grid g
LEFT JOIN ex ON g.w = ex.w AND g.user_id = ex.user_id
"""


CHUNK_TOKENS = 64
CHUNK_OVERLAP = 16
_STRIDE = CHUNK_TOKENS - CHUNK_OVERLAP


def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length chunking (operators/chunking.py:chunk_documents
    — map-side Generate, zero shuffle, zero UDF): overlapping
    {CHUNK_TOKENS}-token windows at stride {_STRIDE}; the final window
    may run short and a short/empty document yields exactly one chunk.
    The oracle replays the same geometry with list slices."""
    from ..operators.chunking import chunk_documents

    out = chunk_documents(
        t(spark, sf_dir, "documents"), CHUNK_TOKENS, CHUNK_OVERLAP
    )
    return out.select(
        "doc_id", "chunk_idx", "n_chunks", "n_tokens", "chunk_text"
    )


ORACLE_CHUNKING = rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x <> '') AS w
  FROM documents
),
base AS (
  SELECT doc_id, w,
         greatest(CAST(ceil((len(w) - {CHUNK_OVERLAP}) / {_STRIDE}.0) AS INT),
                  1) AS n_chunks
  FROM toks
)
SELECT doc_id, i AS chunk_idx, n_chunks,
       len(w[i*{_STRIDE}+1 : i*{_STRIDE}+{CHUNK_TOKENS}]) AS n_tokens,
       array_to_string(w[i*{_STRIDE}+1 : i*{_STRIDE}+{CHUNK_TOKENS}], ' ')
         AS chunk_text
FROM base, unnest(range(0, n_chunks)) AS t(i)
"""


CONT_THRESHOLD = 0.7  # max-containment cut; fixture margin >= 0.3


def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup pairs
    (operators/dedup.py:containment_pairs): shingle containment in
    both directions over banded-MinHash candidates — the
    quote-inclusion/superset measure Jaccard dilutes away. The oracle
    replays candidates (same md5 MinHash bands as the LSH oracles) and
    verifies containment with exact intersection counts."""
    from ..operators.dedup import containment_pairs
    from .dedup import BANDS, NUM_HASHES, SHINGLE_N

    return containment_pairs(
        t(spark, sf_dir, "documents"),
        num_hashes=NUM_HASHES,
        bands=BANDS,
        shingle_n=SHINGLE_N,
        threshold=CONT_THRESHOLD,
    )


def _oracle_containment() -> str:
    from .dedup import _BAND_CASES, _SHINGLE_CTE, _SIG_CTE, BANDS

    return f"""
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
       round(n_common / sa.n_sh, 4) AS cont_a_in_b,
       round(n_common / sb.n_sh, 4) AS cont_b_in_a,
       round(n_common / (sa.n_sh + sb.n_sh - n_common), 4) AS jaccard
FROM common
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE greatest(n_common / sa.n_sh, n_common / sb.n_sh) >= {CONT_THRESHOLD}
"""


PREFIX_JOIN_THRESHOLD = 0.5


def dedup_jaccard_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard similarity join via prefix filtering
    (operators/dedup.py:jaccard_join_prefix — AllPairs candidate rule,
    rarest-shingle prefixes, size filter, map-side verification). The
    oracle is deliberately the BRUTE-FORCE all-pairs join: if the
    prefix pruning ever dropped a qualifying pair, the hash comparison
    would catch the missing row — completeness is the checked
    property, not just the scores."""
    from ..operators.dedup import jaccard_join_prefix
    from .dedup import SHINGLE_N

    return jaccard_join_prefix(
        t(spark, sf_dir, "documents"),
        shingle_n=SHINGLE_N,
        threshold=PREFIX_JOIN_THRESHOLD,
    )


def _oracle_prefix_join() -> str:
    from .dedup import _SHINGLE_CTE

    return f"""
WITH {_SHINGLE_CTE.strip()},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(n_common / (sa.n_sh + sb.n_sh - n_common), 4) AS jaccard
FROM common
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= {PREFIX_JOIN_THRESHOLD}
"""


SAMPLE_K = 5
SAMPLE_SALT = "v1"


def sample_k_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exact-k per-stratum sample
    (operators/splits.py:sample_exact_k_per_stratum): k documents per
    language, selected by salted-md5 order — portable across engines,
    so the oracle re-derives the identical sample."""
    from ..operators.splits import sample_exact_k_per_stratum

    out = sample_exact_k_per_stratum(
        t(spark, sf_dir, "documents").select("doc_id", "lang"),
        "lang",
        SAMPLE_K,
        salt=SAMPLE_SALT,
    )
    return out.select("doc_id", "lang")


ORACLE_SAMPLE_K = f"""
SELECT doc_id, lang
FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5('{SAMPLE_SALT}' || ':' || CAST(doc_id AS VARCHAR)),
                    doc_id
         ) AS rn
  FROM documents
)
WHERE rn <= {SAMPLE_K}
"""


def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-best near-dedup election
    (operators/dedup.py:neardup_keep_best): LSH → verify → connected
    components, then each cluster keeps its member maximizing
    ``n_chars`` (ties → smallest id) instead of the id-minimum. The
    oracle recomputes true components with a recursive CTE and elects
    with the same (quality DESC, id ASC) window."""
    from ..operators.dedup import neardup_keep_best
    from .dedup import BANDS, LSH_VERIFY_THRESHOLD, NUM_HASHES, SHINGLE_N

    out = neardup_keep_best(
        t(spark, sf_dir, "documents").select("doc_id", "text", "n_chars"),
        "n_chars",
        num_hashes=NUM_HASHES,
        bands=BANDS,
        shingle_n=SHINGLE_N,
        threshold=LSH_VERIFY_THRESHOLD,
    )
    return out.select("doc_id", "cluster_rep", "keep")


def _oracle_keep_best() -> str:
    from .dedup import (
        _BAND_CASES,
        _SHINGLE_CTE,
        _SIG_CTE,
        BANDS,
        LSH_VERIFY_THRESHOLD,
    )

    return f"""
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
  SELECT d.doc_id, d.n_chars,
         least(d.doc_id, coalesce(m.mv, d.doc_id)) AS cluster_rep
  FROM documents d
  LEFT JOIN (SELECT u, min(v) AS mv FROM reach GROUP BY u) m
    ON d.doc_id = m.u
)
SELECT doc_id, cluster_rep,
       row_number() OVER (
         PARTITION BY cluster_rep ORDER BY n_chars DESC, doc_id
       ) = 1 AS keep
FROM clusters
"""


def dedup_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT max-containment join
    (operators/dedup.py:containment_join_prefix — smaller-set prefix
    probes against a full inverted index; complete, unlike the
    MinHash-band candidates of dedup_containment_pairs). The oracle is
    the brute-force all-pairs containment join, so completeness is the
    hash-checked property."""
    from ..operators.dedup import containment_join_prefix
    from .dedup import SHINGLE_N

    return containment_join_prefix(
        t(spark, sf_dir, "documents"),
        shingle_n=SHINGLE_N,
        threshold=CONT_THRESHOLD,
    )


def _oracle_containment_join() -> str:
    from .dedup import _SHINGLE_CTE

    return f"""
WITH {_SHINGLE_CTE.strip()},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(n_common / sa.n_sh, 4) AS cont_a_in_b,
       round(n_common / sb.n_sh, 4) AS cont_b_in_a,
       round(n_common / (sa.n_sh + sb.n_sh - n_common), 4) AS jaccard
FROM common
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE greatest(n_common / sa.n_sh, n_common / sb.n_sh) >= {CONT_THRESHOLD}
"""


HLL_LG_K = 12
# 5 standard errors at lg_k=12 (sigma = 1.04/sqrt(2^12) ~ 1.63%)
HLL_REL_BOUND = 5 * 1.04 / (2 ** (HLL_LG_K / 2))


def stats_hll_distinct_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL distinct-token sketches per language
    (operators/sketches.py:hll_distinct_sketch/hll_estimate — the
    persistable, unionable state approx_count_distinct cannot give).
    Error-bound contract: the estimate must land within
    {HLL_REL_BOUND:.3f} relative of the exact per-language distinct
    count (5σ at lg_k={HLL_LG_K}); the oracle reproduces the exact
    counts and the literal bound."""
    from ..operators.sketches import hll_distinct_sketch, hll_estimate

    terms = (
        t(spark, sf_dir, "documents")
        .select("lang", F.explode(tokens("text")).alias("term"))
        .filter(F.col("term") != "")
    )
    est = hll_estimate(
        hll_distinct_sketch(terms, "term", by="lang", lg_k=HLL_LG_K)
    ).select("lang", "estimate")
    exact = terms.groupBy("lang").agg(
        F.count_distinct("term").alias("exact_distinct")
    )
    return est.join(exact, "lang").select(
        "lang",
        "exact_distinct",
        (
            F.abs(F.col("estimate") - F.col("exact_distinct"))
            <= F.lit(HLL_REL_BOUND) * F.col("exact_distinct")
        ).alias("within_bound"),
    )


ORACLE_HLL_DISTINCT = """
WITH toks AS (
  SELECT lang, t.term
  FROM documents, unnest(string_split_regex(lower(text), '\\s+')) AS t(term)
  WHERE t.term <> ''
)
SELECT lang, count(DISTINCT term) AS exact_distinct, TRUE AS within_bound
FROM toks GROUP BY lang
"""


SHARD_TOKENS = 5000
SHARD_SEED = 3


def _md5_order(seed: int, id_col: str):
    return F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )


def order_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced shard assignment
    (operators/ordering.py:assign_token_shards — distributed exact
    running sum: per-partition token totals prefix-summed on the
    driver, per-partition windows add the offsets; no single-partition
    global window). Ordered by a portable salted-md5 key so the oracle
    re-derives the identical cumulative sums with one window; token
    counts are whitespace-token sizes computed in the projection."""
    from ..operators.ordering import assign_token_shards

    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.filter(tokens("text"), lambda x: x != "")).alias(
            "n_tokens"
        ),
    )
    out = assign_token_shards(
        docs,
        SHARD_TOKENS,
        SHARD_SEED,
        order_fn=_md5_order,
    )
    return out.select("doc_id", "n_tokens", "shard_id")


ORACLE_TOKEN_SHARDS = rf"""
WITH d AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '')) AS n_tokens,
         md5('{SHARD_SEED}' || ':' || CAST(doc_id AS VARCHAR)) AS k
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (
           ORDER BY k, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cum_before
  FROM d
)
SELECT doc_id, n_tokens,
       CAST(cum_before // {SHARD_TOKENS} AS BIGINT) AS shard_id
FROM c
"""


BLOOM_M_BITS = 1 << 17
BLOOM_K = 5


def dedup_bloom_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered EXACT anti-join
    (operators/sketches.py:bloom_prefilter_antijoin): customers who
    never placed an 'F'-status order. Keys missing the broadcast word
    table bypass the join (Bloom misses are certain); only the
    maybe-seen sliver pays the exact anti-join — so the oracle is the
    plain NOT EXISTS, an exact contract, not an error bound."""
    from ..operators.sketches import bloom_prefilter_antijoin

    cust = t(spark, sf_dir, "customer")
    seen = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    out = bloom_prefilter_antijoin(cust, seen, "c_custkey", BLOOM_M_BITS, BLOOM_K)
    return out.select(F.col("c_custkey").cast("long").alias("c_custkey"))


ORACLE_BLOOM_ANTIJOIN = """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
"""


DSIR_BUCKETS = 4096
DSIR_NGRAM = 2
DSIR_ALPHA = 1.0
DSIR_TARGET_LANG = "en"
DSIR_K = 25
DSIR_SEED = "dsir-v1"
# min |frac(k·10^4) − 0.5| probed at 3.2e-4 / 7.4e-4 / 6.9e-5 grid
# units (sf0.001/0.01/0.1) — above the 1e-5 house precedent, vs
# ~1e-9-grid-unit cross-engine summation drift on the logw sums
DSIR_DECIMALS = 4
_GM = 1 << 20  # operators/dsir.py:_GUMBEL_M


def mix_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling, fit→score→Gumbel-top-k
    (operators/dsir.py): target = the '{DSIR_TARGET_LANG}' slice, raw
    = the whole corpus, hashed-bigram features under the PORTABLE md5
    featurizer (top 60 md5 bits — DuckDB replays the identical buckets
    via CAST('0x'||substr(md5(g),1,15) AS BIGINT)), and the Gumbel
    variates drawn from the same portable hash of (seed, doc_id). The
    oracle recomputes the entire pipeline relationally — per-bucket
    counts, add-α log ratios in the same association order, per-doc
    Σ ratio, Gumbel perturbation — and cuts the same top-{DSIR_K} on
    the ROUNDED key with the id tie-break."""
    from ..operators.dsir import _gumbel_key, fit_dsir, score_dsir

    docs = t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    target = docs.filter(F.col("lang") == DSIR_TARGET_LANG)
    model = fit_dsir(
        target,
        docs,
        n_buckets=DSIR_BUCKETS,
        ngram_max=DSIR_NGRAM,
        alpha=DSIR_ALPHA,
        hasher="md5",
    )
    scored = score_dsir(model, docs)
    key = _gumbel_key("dsir_logw", "doc_id", DSIR_SEED, method="md5")
    w = W.orderBy(F.desc("sel_key"), F.asc("doc_id"))
    return (
        scored.withColumn(
            "sel_key", F.round(key, DSIR_DECIMALS) + F.lit(0.0)
        )
        .select("doc_id", "sel_key")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= DSIR_K)
    )


# ln association order mirrors numpy's (log_p − log_q) elementwise:
# (ln(t_b+α) − ln(T)) − (ln(r_b+α) − ln(R)) — NOT re-associated, so the
# doubles agree to summation-order noise only
ORACLE_DSIR = rf"""
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x <> '') AS w
  FROM documents
),
uni AS (
  SELECT doc_id, w[i] AS gram
  FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i FROM toks)
),
bi AS (
  SELECT doc_id, w[i] || ' ' || w[i + 1] AS gram
  FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM toks)
),
grams AS (
  SELECT doc_id, gram FROM uni UNION ALL SELECT doc_id, gram FROM bi
),
gb AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(gram), 1, 15) AS BIGINT) % {DSIR_BUCKETS} AS b
  FROM grams
),
tgt AS (SELECT doc_id FROM documents WHERE lang = '{DSIR_TARGET_LANG}'),
tc AS (
  SELECT b, CAST(count(*) AS DOUBLE) AS c
  FROM gb JOIN tgt USING (doc_id) GROUP BY 1
),
rc AS (SELECT b, CAST(count(*) AS DOUBLE) AS c FROM gb GROUP BY 1),
tot AS (
  SELECT (SELECT coalesce(sum(c), 0.0) FROM tc) AS t_tot,
         (SELECT coalesce(sum(c), 0.0) FROM rc) AS r_tot
),
dw AS (
  SELECT g.doc_id,
         sum(
           (ln(coalesce(tc.c, 0.0) + {DSIR_ALPHA})
            - ln(t.t_tot + {DSIR_ALPHA} * {DSIR_BUCKETS}))
           - (ln(coalesce(rc.c, 0.0) + {DSIR_ALPHA})
              - ln(t.r_tot + {DSIR_ALPHA} * {DSIR_BUCKETS}))
         ) AS logw
  FROM gb g
  LEFT JOIN tc ON g.b = tc.b
  LEFT JOIN rc ON g.b = rc.b
  CROSS JOIN tot t
  GROUP BY 1
),
sel AS (
  SELECT d.doc_id,
         coalesce(dw.logw, 0.0)
         + (- ln(- ln(
             (CAST('0x' || substr(
                md5('{DSIR_SEED}:' || CAST(d.doc_id AS VARCHAR)), 1, 15)
              AS BIGINT) % {_GM} + 0.5) / {_GM}.0
           ))) AS k
  FROM documents d LEFT JOIN dw USING (doc_id)
)
SELECT doc_id, round(k, {DSIR_DECIMALS}) + 0.0 AS sel_key,
       row_number() OVER (
         ORDER BY round(k, {DSIR_DECIMALS}) + 0.0 DESC, doc_id
       ) AS rank
FROM sel
QUALIFY rank <= {DSIR_K}
"""


def streaming_static_enrich_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC join (the production enrichment shape §2.9 still
    lacked a declared lane for): the event stream inner-joins the
    static customer dimension — broadcast, so stream micro-batches
    never shuffle for the join — then windowed counts per market
    segment under the 1h watermark, append mode (each closed window
    emitted exactly once). The oracle replays the join and the
    append-mode cutoff (window end ≤ ms-truncated max ts − 1h)."""
    from ..streaming.pipeline import read_table_stream, run_available_now

    src = read_table_stream(spark, sf_dir, "events")
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("user_id"), "c_mktsegment"
    )
    agg = (
        src.withWatermark("ts", "1 hour")
        .join(F.broadcast(cust), "user_id")
        .groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
        .agg(F.count("*").alias("cnt"))
    )
    out = run_available_now(agg, "static_enrich", output_mode="append")
    return out.select(
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "c_mktsegment",
        "cnt",
    )


ORACLE_STATIC_ENRICH = """
WITH wm AS (
  SELECT (epoch_us(max(ts)) // 1000 - 3600000) * 1000 AS wm_us FROM events
),
j AS (
  SELECT date_trunc('hour', e.ts) AS w, c.c_mktsegment
  FROM events e JOIN customer c ON e.user_id = c.c_custkey, wm
  WHERE epoch_us(date_trunc('hour', e.ts)) + 3600000000 <= wm.wm_us
)
SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS window_start,
       c_mktsegment, CAST(count(*) AS BIGINT) AS cnt
FROM j GROUP BY 1, 2
"""


# sparse slice: at value > 200 the (type, hour) lattice is mostly
# holes at every SF (3585/3432/2231 empty cells of ~3600 at
# sf0.001/0.01/0.1), so both fill methods AND the NULL edges are
# genuinely exercised — threshold 30 left sf0.1 gap-free (vacuous)
GAPFILL_MIN_VALUE = 200.0

BFS_MAX_HOPS = 8

RH_BITS = 16
RH_BANDS = 4
RH_SEED = "rh-v1"
RH_THRESHOLD = 0.45  # EMB_DUP_THRESHOLD — the IVF lane's cut


def dedup_embedding_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH near-dup pairs
    (operators/embedding_lsh.py — the fit-free SimHash-for-vectors
    rung next to the learned-IVF lane, same 0.45 verify cut): md5-
    derived Rademacher planes (engine-regenerable), {RH_BITS}-bit
    signatures in {RH_BANDS} bands, exact-cosine verification. The
    oracle regenerates planes/signatures/bands relationally and
    verifies with list_dot_product. Sign margins probed
    (1.1e-4/3.2e-4/5.2e-5 min |⟨w,x⟩|, vs ~1e-14 drift); threshold
    margin ≥ 1.4e-4; 4dp rounding margin ≥ 1.8e-3 grid units."""
    from ..operators.embedding_lsh import embedding_lsh_pairs
    from .vector import _embeddings

    pairs = embedding_lsh_pairs(
        _embeddings(spark, sf_dir),
        RH_THRESHOLD,
        n_bits=RH_BITS,
        bands=RH_BANDS,
        seed=RH_SEED,
    )
    return pairs.select(
        "vec_a", "vec_b", (F.round("cosine", 4) + F.lit(0.0)).alias("cosine")
    )


ORACLE_EMB_LSH = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
w AS (
  SELECT i.i AS i, j.j AS j,
         CASE WHEN CAST('0x' || substr(md5('{RH_SEED}:' || i.i || ':' || j.j),
                         1, 15) AS BIGINT) % 2 = 0
              THEN 1.0 ELSE -1.0 END AS s
  FROM unnest(range(0, {RH_BITS})) i(i),
       unnest(range(0, 64)) j(j)
),
proj AS (
  SELECT e.vec_id, w.i, sum(w.s * e.v[w.j + 1]) AS p
  FROM e, w GROUP BY 1, 2
),
bandv AS (
  SELECT vec_id, i // {RH_BITS // RH_BANDS} AS band,
         string_agg(CASE WHEN p >= 0 THEN '1' ELSE '0' END, ''
                    ORDER BY i) AS bv
  FROM proj GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bandv a
  JOIN bandv b ON a.band = b.band AND a.bv = b.bv AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b,
       round(list_dot_product(ea.v, eb.v)
             / (sqrt(list_dot_product(ea.v, ea.v))
                * sqrt(list_dot_product(eb.v, eb.v))), 4) + 0.0 AS cosine
FROM cand
JOIN e ea ON vec_a = ea.vec_id
JOIN e eb ON vec_b = eb.vec_id
WHERE list_dot_product(ea.v, eb.v)
      / (sqrt(list_dot_product(ea.v, ea.v))
         * sqrt(list_dot_product(eb.v, eb.v))) >= {RH_THRESHOLD}
"""


FUNNEL_STEPS = ["view", "click", "purchase"]
RETENTION_PERIOD_DAYS = 7


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict ordered funnel (operators/events_analytics.py:funnel):
    users completing view → click → purchase, each step strictly
    after the previous conversion time. All-integer counts; the
    oracle chains the same min-after-previous self-joins."""
    from ..operators.events_analytics import funnel

    return funnel(t(spark, sf_dir, "events"), FUNNEL_STEPS)


ORACLE_FUNNEL = f"""
WITH s1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts > s1.t GROUP BY 1
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts > s2.t GROUP BY 1
)
SELECT 1 AS step, '{FUNNEL_STEPS[0]}' AS step_type,
       (SELECT count(*) FROM s1) AS users
UNION ALL SELECT 2, '{FUNNEL_STEPS[1]}', (SELECT count(*) FROM s2)
UNION ALL SELECT 3, '{FUNNEL_STEPS[2]}', (SELECT count(*) FROM s3)
"""


def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle retention (operators/events_analytics.py:
    retention_cohorts): {RETENTION_PERIOD_DAYS}-day cohorts anchored
    at the global first event date; active_users per (cohort,
    offset). All-integer; the oracle replays the same bucketing."""
    from ..operators.events_analytics import retention_cohorts

    return retention_cohorts(
        t(spark, sf_dir, "events"), period_days=RETENTION_PERIOD_DAYS
    )


ORACLE_RETENTION = f"""
WITH a AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
k AS (
  SELECT user_id AS u,
         CAST(floor(datediff('day', a.d0, CAST(ts AS DATE))
                    / {RETENTION_PERIOD_DAYS}) AS INT) AS p
  FROM events, a
),
f AS (SELECT u, min(p) AS cohort FROM k GROUP BY 1),
act AS (SELECT DISTINCT u, p FROM k)
SELECT (SELECT d0 FROM a) + f.cohort * {RETENTION_PERIOD_DAYS}
         AS cohort_start,
       act.p - f.cohort AS offset,
       count(DISTINCT act.u) AS active_users
FROM act JOIN f USING (u)
GROUP BY 1, 2
"""


def events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-flow bigram matrix (operators/events_analytics.py:
    type_transitions): consecutive per-user (prev_type, next_type)
    counts in (ts, event_id) order — deterministic because event_id
    breaks timestamp ties identically on both engines."""
    from ..operators.events_analytics import type_transitions

    return type_transitions(t(spark, sf_dir, "events"))


ORACLE_TRANSITIONS = """
WITH o AS (
  SELECT event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS prev
  FROM events
)
SELECT prev AS prev_type, event_type AS next_type,
       CAST(count(*) AS BIGINT) AS n
FROM o WHERE prev IS NOT NULL GROUP BY 1, 2
"""


def reshape_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt (DataFrame ``unpivot``, the wide→long reshape —
    agg_pivot's inverse surface): per-nation customer metrics
    (count, int-cents balance sum, min/max cents) melted to
    (nation, metric, val) long form. All-BIGINT measures so the melt
    is hash-exact; the oracle is the UNION ALL expansion."""
    cust = t(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    wide = cust.groupBy("c_nationkey").agg(
        F.count("*").alias("n_cust"),
        F.sum(cents).alias("sum_cents"),
        F.min(cents).alias("min_cents"),
        F.max(cents).alias("max_cents"),
    )
    return wide.unpivot(
        ["c_nationkey"],
        ["n_cust", "sum_cents", "min_cents", "max_cents"],
        "metric",
        "val",
    )


ORACLE_UNPIVOT = """
WITH w AS (
  SELECT c_nationkey,
         CAST(count(*) AS BIGINT) AS n_cust,
         CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
         CAST(min(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS min_cents,
         CAST(max(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS max_cents
  FROM customer GROUP BY 1
)
SELECT c_nationkey, 'n_cust' AS metric, n_cust AS val FROM w
UNION ALL SELECT c_nationkey, 'sum_cents', sum_cents FROM w
UNION ALL SELECT c_nationkey, 'min_cents', min_cents FROM w
UNION ALL SELECT c_nationkey, 'max_cents', max_cents FROM w
"""


def graph_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-hop BFS (operators/graph.py:bfs_levels — per-hop
    frontier⋈edges join + visited anti-join, O(1) driver state) over
    the part key-decade tree (parent ⌊k/10⌋ → child k, the
    sql_recursive_subtree_rollup hierarchy read downward), seeded at
    the single-digit roots: dist(p_k) = digits(k) − 1, depth ≤
    {BFS_MAX_HOPS}. All-integer result, so the recursive-CTE oracle
    (min dist per node) matches exactly."""
    from ..operators.graph import bfs_levels

    part = t(spark, sf_dir, "part").select("p_partkey")
    edges = part.filter(F.col("p_partkey") >= 10).select(
        F.concat(
            F.lit("p"), F.expr("p_partkey div 10").cast("string")
        ).alias("src"),
        F.concat(F.lit("p"), F.col("p_partkey").cast("string")).alias("dst"),
    )
    seeds = part.filter(F.col("p_partkey") < 10).select(
        F.concat(F.lit("p"), F.col("p_partkey").cast("string")).alias("node")
    )
    out = bfs_levels(edges, seeds, max_hops=BFS_MAX_HOPS)
    return out.select("node", F.col("dist").cast("int").alias("dist"))


ORACLE_BFS_LEVELS = f"""
WITH RECURSIVE e AS (
  SELECT 'p' || CAST(p_partkey // 10 AS VARCHAR) AS src,
         'p' || CAST(p_partkey AS VARCHAR) AS dst
  FROM part WHERE p_partkey >= 10
),
seeds AS (
  SELECT 'p' || CAST(p_partkey AS VARCHAR) AS node
  FROM part WHERE p_partkey < 10
),
r(node, dist) AS (
  SELECT node, 0 FROM seeds
  UNION ALL
  SELECT e.dst, r.dist + 1 FROM r JOIN e ON r.node = e.src
  WHERE r.dist < {BFS_MAX_HOPS}
)
SELECT node, CAST(min(dist) AS INT) AS dist FROM r GROUP BY node
"""


def _gapfill_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse per-(event_type, hour) int-cents sums — the aggregated
    series both gap-fill lanes densify."""
    ev = t(spark, sf_dir, "events").filter(F.col("value") > GAPFILL_MIN_VALUE)
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("bucket"), "event_type"
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )


def ts_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucket gap fill, last-observation-carried-forward
    (operators/gapfill.py — the TimescaleDB time_bucket_gapfill+locf
    shape): the sparse per-type hourly cents series densified to the
    global hour lattice; leading edges stay NULL. All-integer values,
    so the oracle (the same two-window fill-group trick, no IGNORE
    NULLS dependency) matches exactly."""
    from ..operators.gapfill import gapfill

    out = gapfill(
        _gapfill_series(spark, sf_dir),
        "bucket", ["event_type"], "cents", 3600, method="locf",
    )
    return out.select(
        "event_type",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.col("cents").alias("cents_locf"),
    )


_GAPFILL_BASE_CTE = f"""
s AS (
  SELECT date_trunc('hour', ts) AS bucket, event_type,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events WHERE value > {GAPFILL_MIN_VALUE} GROUP BY 1, 2
),
grid AS (
  -- the TABLE generate_series takes only constants; the LIST form
  -- accepts columns, so unnest it
  SELECT d.event_type,
         unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS bucket
  FROM (SELECT DISTINCT event_type FROM s) d,
       (SELECT min(bucket) AS lo, max(bucket) AS hi FROM s) b
),
dense AS (
  SELECT g.event_type, g.bucket, s.cents AS v
  FROM grid g
  LEFT JOIN s ON s.event_type = g.event_type AND s.bucket = g.bucket
)
"""

ORACLE_GAPFILL_LOCF = f"""
WITH {_GAPFILL_BASE_CTE.strip()},
grp AS (
  SELECT *,
         count(v) OVER (PARTITION BY event_type ORDER BY bucket) AS fg
  FROM dense
)
SELECT event_type,
       strftime(bucket, '%Y-%m-%d %H:%M:%S') AS window_start,
       CASE WHEN fg > 0 THEN
         first_value(v) OVER (PARTITION BY event_type, fg ORDER BY bucket)
       END AS cents_locf
FROM grp
"""


def ts_gapfill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap fill by linear interpolation between the bracketing
    observations (no extrapolation — range edges stay NULL). v_lin is
    emitted RAW, not rounded (the Q2 unit_cost precedent): midpoint
    interps of cent values land on EXACT half-cent decimal ties
    (probed: boundary distance 0 at 3-4dp), where the two engines'
    round() implementations legitimately disagree on the SAME double
    (BigDecimal-exact vs float-multiply) — but every operand chain
    (cents/100, diffs, the one exact-integer-delta division,
    multiply-add in identical association) is correctly rounded from
    identical operands, so the raw doubles are bit-equal and hash
    identically. (Time fractions from seconds vs microseconds are the
    same real scaled by 1e6, hence the same double.)"""
    from ..operators.gapfill import gapfill

    series = _gapfill_series(spark, sf_dir).select(
        "bucket",
        "event_type",
        (F.col("cents") / F.lit(100.0).cast("double")).alias("v"),
    )
    out = gapfill(
        series, "bucket", ["event_type"], "v", 3600, method="linear"
    )
    return out.select(
        "event_type",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        (F.col("v") + F.lit(0.0)).alias("v_lin"),
    )


ORACLE_GAPFILL_LINEAR = f"""
WITH {_GAPFILL_BASE_CTE.strip()},
dv AS (
  SELECT event_type, bucket, v / CAST(100.0 AS DOUBLE) AS v
  FROM dense
),
grp AS (
  SELECT *,
         count(v) OVER (PARTITION BY event_type ORDER BY bucket) AS fg,
         count(v) OVER (PARTITION BY event_type ORDER BY bucket DESC) AS fgn
  FROM dv
),
br AS (
  SELECT *,
         CASE WHEN fg > 0 THEN
           first_value(v) OVER (PARTITION BY event_type, fg ORDER BY bucket)
         END AS pv,
         CASE WHEN fg > 0 THEN
           first_value(bucket) OVER (PARTITION BY event_type, fg ORDER BY bucket)
         END AS pt,
         CASE WHEN fgn > 0 THEN
           first_value(v) OVER (PARTITION BY event_type, fgn ORDER BY bucket DESC)
         END AS nv,
         CASE WHEN fgn > 0 THEN
           first_value(bucket) OVER (PARTITION BY event_type, fgn ORDER BY bucket DESC)
         END AS nt
  FROM grp
)
SELECT event_type,
       strftime(bucket, '%Y-%m-%d %H:%M:%S') AS window_start,
       CASE WHEN v IS NOT NULL THEN v
            WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
              pv + (nv - pv) * ((epoch_us(bucket) - epoch_us(pt))
                                / (epoch_us(nt) - epoch_us(pt)))
       END + 0.0 AS v_lin
FROM br
"""


PPR_ITERATIONS = 5
PPR_DAMPING = 0.85
# 7dp: min boundary distance 5.5e-3 / 7.0e-5 / 1.1e-5 grid units at
# the three SFs (8dp sat at 1.9e-9 at sf0.001 — drift-order, rejected)
PPR_DECIMALS = 7


def graph_ppr_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED personalized PageRank (operators/graph.py:pagerank with
    weight_col + teleport): rank flows proportionally to lineitem
    volume per (supplier, customer) pair, and the restart/dangling
    mass returns to a seed supplier set (s_suppkey % 7 == 1, weights
    1 + suppkey % 3) — the topic-focused authority-prior shape. The
    oracle unrolls the identical weighted recurrence with the teleport
    vector as a CTE; 7dp rounded emit (margins probed per SF)."""
    from ..operators.graph import pagerank

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("dst"),
        F.lit(1.0).alias("w"),  # operator sums duplicates -> pair counts
    )
    seeds = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 7 == 1)
        .select(
            F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias(
                "node"
            ),
            (F.lit(1) + F.col("s_suppkey") % 3).cast("double").alias("weight"),
        )
    )
    ranks = pagerank(
        edges,
        iterations=PPR_ITERATIONS,
        damping=PPR_DAMPING,
        teleport=seeds,
        weight_col="w",
    )
    return ranks.select(
        "node", (F.round("pr", PPR_DECIMALS) + F.lit(0.0)).alias("pr")
    )


def _oracle_ppr_weighted() -> str:
    """The graph_pagerank unroll generalized to weighted flow
    (pr·w/Σ_out w) and a teleport-vector CTE — every CTE consumed more
    than once per level is MATERIALIZED (see _oracle_pagerank)."""
    parts = [
        f"""
WITH e AS MATERIALIZED (
  SELECT 's' || CAST(l_suppkey AS VARCHAR) AS src,
         'c' || CAST(o_custkey AS VARCHAR) AS dst,
         CAST(count(*) AS DOUBLE) AS w
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
od AS MATERIALIZED (SELECT src, sum(w) AS deg FROM e GROUP BY 1),
seeds AS (
  SELECT 's' || CAST(s_suppkey AS VARCHAR) AS node,
         CAST(1 + s_suppkey % 3 AS DOUBLE) AS wt
  FROM supplier WHERE s_suppkey % 7 = 1
),
tot AS (SELECT sum(wt) AS s FROM seeds JOIN nodes USING (node)),
tele AS MATERIALIZED (
  SELECT n.node, coalesce(se.wt, 0.0) / t.s AS t
  FROM nodes n LEFT JOIN seeds se USING (node), tot t
),
it0 AS MATERIALIZED (SELECT node, t AS pr FROM tele)"""
    ]
    for k in range(1, PPR_ITERATIONS + 1):
        p = k - 1
        parts.append(f""",
d{k} AS (
  SELECT coalesce(sum(pr), 0.0) AS dm FROM it{p}
  WHERE NOT EXISTS (SELECT 1 FROM od WHERE od.src = it{p}.node)
),
c{k} AS (
  SELECT e.dst AS node, sum(it{p}.pr * e.w / od.deg) AS contrib
  FROM e JOIN od USING (src) JOIN it{p} ON e.src = it{p}.node
  GROUP BY 1
),
it{k} AS MATERIALIZED (
  SELECT n.node,
         (1.0 - {PPR_DAMPING}) * tl.t
         + {PPR_DAMPING} * (coalesce(c.contrib, 0.0) + d.dm * tl.t) AS pr
  FROM nodes n
  JOIN tele tl USING (node)
  CROSS JOIN d{k} d
  LEFT JOIN c{k} c ON n.node = c.node
)""")
    parts.append(
        f"\nSELECT node, round(pr, {PPR_DECIMALS}) + 0.0 AS pr"
        f" FROM it{PPR_ITERATIONS}"
    )
    return "".join(parts)


SHH_BUCKETS = 8
SHH_CAPACITY = 4096  # >> per-bucket distinct users at every SF
SHH_K = 20


def streaming_heavy_hitters_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running heavy hitters over the replayed event stream
    (streaming/sketches.py:streaming_heavy_hitters — salted-bucket
    Misra–Gries in applyInPandasWithState GroupState, state ≤
    buckets×capacity however many keys flow). At this capacity no
    bucket ever evicts, so every count is certified EXACT
    (max_undercount 0) and the final summary is independent of the
    micro-batch split — which is precisely what the oracle (exact
    count top-k over the same events) pins, the batch
    stats_heavy_hitters recipe applied to the stream. The
    eviction-regime certificate is tested separately
    (tests/test_sketches.py::test_bounds_and_hot_guarantee_vs_exact)."""
    from ..streaming.pipeline import read_table_stream, run_available_now
    from ..streaming.sketches import latest_hh_summary, streaming_heavy_hitters

    src = read_table_stream(spark, sf_dir, "events")
    sink = run_available_now(
        streaming_heavy_hitters(src, "user_id", SHH_BUCKETS, SHH_CAPACITY),
        "hh_topk",
        output_mode="update",
    )
    summary = latest_hh_summary(sink)
    w = W.orderBy(F.desc("cnt"), F.asc("user_id"))
    return (
        summary.select(
            F.col("term").cast("long").alias("user_id"),
            "cnt",
            F.col("dec").alias("max_undercount"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= SHH_K)
    )


ORACLE_STREAMING_HH = f"""
WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1)
SELECT user_id, cnt, CAST(0 AS BIGINT) AS max_undercount,
       row_number() OVER (ORDER BY cnt DESC, user_id) AS rank
FROM c
QUALIFY rank <= {SHH_K}
"""


PR_ITERATIONS = 5
PR_DAMPING = 0.85
# 8dp: min |frac(pr·10^8) − 0.5| probed at 9.8e-2 / 3.4e-4 / 8.5e-5
# grid units (sf0.001/0.01/0.1) — all above the 1e-5 house precedent,
# vs ~1e-9-grid-unit cross-engine summation drift (9dp sat at 7e-7)
PR_DECIMALS = 8


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the supplier→customer fulfillment graph
    (operators/graph.py:pagerank — dangling-mass power iteration, one
    loop-invariant edge⋈outdeg probe build, one contrib shuffle per
    iteration). Customers never ship, so every 'c' node is dangling —
    the redistribution path carries most of the mass and the oracle
    replays it exactly: {PR_ITERATIONS} unrolled iterations of the
    identical recurrence. pr is rounded to {PR_DECIMALS}dp on both
    engines (boundary margin probed at all three SFs); node ids are
    's'/'c'-prefixed so supplier and customer keys can never collide."""
    from ..operators.graph import pagerank

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("dst"),
    )
    ranks = pagerank(edges, iterations=PR_ITERATIONS, damping=PR_DAMPING)
    return ranks.select(
        "node", (F.round("pr", PR_DECIMALS) + F.lit(0.0)).alias("pr")
    )


def _oracle_pagerank() -> str:
    """Fixed-iteration CTE unroll of the same dangling-mass recurrence
    (the k-means E+M-chain precedent from vector_ann_ivf_bucketed):
    every arithmetic step is the identical IEEE op sequence, so the
    only cross-engine drift is summation order — ~1e-17 absolute
    against a 1e-{PR_DECIMALS} grid. Every CTE that later levels
    reference more than once is MATERIALIZED: each it{{k}} feeds three
    consumers (dangling, contribs, next ranks), and letting the
    planner inline them compounds ~3× per unrolled level — at 10×
    amplified edges the un-hinted chain spilled past 80 GB of temp."""
    parts = [
        f"""
WITH e AS MATERIALIZED (
  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                  'c' || CAST(o_custkey AS VARCHAR) AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
od AS MATERIALIZED (
  SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM e GROUP BY 1
),
it0 AS MATERIALIZED (SELECT node, 1.0 / nn.n AS pr FROM nodes, nn)"""
    ]
    for k in range(1, PR_ITERATIONS + 1):
        p = k - 1
        parts.append(f""",
d{k} AS (
  SELECT coalesce(sum(pr), 0.0) AS dm FROM it{p}
  WHERE NOT EXISTS (SELECT 1 FROM od WHERE od.src = it{p}.node)
),
c{k} AS (
  SELECT e.dst AS node, sum(it{p}.pr / od.deg) AS contrib
  FROM e JOIN od USING (src) JOIN it{p} ON e.src = it{p}.node
  GROUP BY 1
),
it{k} AS MATERIALIZED (
  SELECT n.node,
         (1.0 - {PR_DAMPING}) / nn.n
         + {PR_DAMPING} * (coalesce(c.contrib, 0.0) + d.dm / nn.n) AS pr
  FROM nodes n CROSS JOIN nn CROSS JOIN d{k} d
  LEFT JOIN c{k} c ON n.node = c.node
)""")
    parts.append(
        f"\nSELECT node, round(pr, {PR_DECIMALS}) + 0.0 AS pr"
        f" FROM it{PR_ITERATIONS}"
    )
    return "".join(parts)


def dim_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension history (operators/scd.py:scd2_compress —
    the warehouse temporal op the reference's latest-only dims imply;
    SURVEY.md §3.2): per-user DAILY snapshot (last event_type of the
    day, (ts, event_id) tie-break) run-length-compressed into
    versioned [valid_from, valid_to) rows with an is_current flag.
    All columns integer/date/string/bool — hash-exact; the oracle
    replays snapshot → change-flag → version → min/lead relationally.
    """
    from ..operators.scd import scd2_compress

    ev = t(spark, sf_dir, "events")
    snap = (
        ev.withColumn("day", F.to_date("ts"))
        .groupBy("user_id", "day")
        .agg(
            F.max_by(
                "event_type", F.struct(F.col("ts"), F.col("event_id"))
            ).alias("event_type")
        )
    )
    return scd2_compress(snap, ["user_id"], ["event_type"], "day")


ORACLE_SCD2 = """
WITH r AS (
  SELECT user_id, CAST(ts AS DATE) AS day, event_type,
         row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
),
snap AS (SELECT user_id, day, event_type FROM r WHERE rn = 1),
v AS (
  SELECT user_id, day, event_type,
         CASE WHEN lag(day) OVER w IS NULL
                OR event_type IS DISTINCT FROM lag(event_type) OVER w
              THEN 1 ELSE 0 END AS flag
  FROM snap WINDOW w AS (PARTITION BY user_id ORDER BY day)
),
ver AS (
  SELECT user_id, day, event_type,
         CAST(sum(flag) OVER (PARTITION BY user_id ORDER BY day)
              AS BIGINT) AS version
  FROM v
),
hist AS (
  SELECT user_id, event_type, version, min(day) AS valid_from
  FROM ver GROUP BY user_id, event_type, version
)
SELECT user_id, event_type, version, valid_from,
       lead(valid_from) OVER w2 AS valid_to,
       lead(valid_from) OVER w2 IS NULL AS is_current
FROM hist WINDOW w2 AS (PARTITION BY user_id ORDER BY version)
"""


def cdc_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC latest-wins apply (operators/scd.py:apply_cdc): the events
    stream read as a change feed — 'error' rows are tombstones, every
    other event upserts the user's (event_type, int-cents value).
    max_by(struct, struct) partial aggregation, NO window sort (plan
    test pins it); users whose final event is a tombstone are absent.
    """
    from ..operators.scd import apply_cdc

    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("event_type"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return apply_cdc(ev, ["user_id"], ["ts", "event_id"], "op")


ORACLE_CDC = """
WITH r AS (
  SELECT user_id, ts, event_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, ts, event_id, event_type, cents
FROM r WHERE rn = 1 AND op <> 'D'
"""


IVL_BIN_DAYS = 32  # ~ the 1..30-day ship->receipt transit length
IVL_EPOCH = "1990-01-01"


def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-interval overlap join (operators/intervals.py — the
    big-big ranges-on-both-sides shape join_range_binned's point
    variant can't express): per supplier, the number of lineitem
    PAIRS whose ship->receipt transit windows overlap — a concurrency
    measure. Binned equi-join with the count-once filter (no
    distinct); the oracle runs the naive theta join. All-integer.
    The fixture carries no l_receiptdate, so the transit length is
    the deterministic 1 + iid % 30 days (TPC-H's receipt = ship +
    1..30 convention) — identical integer math on both engines.
    """
    from ..operators.intervals import interval_overlap_join

    day = lambda c: F.datediff(F.col(c), F.to_date(F.lit(IVL_EPOCH)))
    iv = (
        t(spark, sf_dir, "lineitem")
        .select(
            "l_suppkey",
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("iid"),
            day("l_shipdate").cast("long").alias("ds"),
        )
        .withColumn("de", F.col("ds") + 1 + F.col("iid") % 30)
    )
    a = iv.select("l_suppkey", F.col("iid").alias("id_a"),
                  F.col("ds").alias("s_a"), F.col("de").alias("e_a"))
    b = iv.select("l_suppkey", F.col("iid").alias("id_b"),
                  F.col("ds").alias("s_b"), F.col("de").alias("e_b"))
    pairs = interval_overlap_join(
        a, b, "s_a", "e_a", "s_b", "e_b",
        on=["l_suppkey"], bin_size=IVL_BIN_DAYS,
    ).filter(F.col("id_a") < F.col("id_b"))
    return pairs.groupBy("l_suppkey").agg(
        F.count("*").alias("n_overlaps")
    )


ORACLE_IVL_OVERLAP = f"""
WITH iv AS (
  SELECT l_suppkey, l_orderkey * 10 + l_linenumber AS iid,
         datediff('day', DATE '{IVL_EPOCH}', l_shipdate) AS s,
         datediff('day', DATE '{IVL_EPOCH}', l_shipdate)
           + 1 + (l_orderkey * 10 + l_linenumber) % 30 AS e
  FROM lineitem
)
SELECT a.l_suppkey AS l_suppkey, CAST(count(*) AS BIGINT) AS n_overlaps
FROM iv a JOIN iv b
  ON a.l_suppkey = b.l_suppkey AND a.iid < b.iid
 AND a.s <= b.e AND b.s <= a.e
GROUP BY 1
"""


RANGE_WINDOW_DAYS = 90


def window_time_range_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-RANGE window frame (§2.5 — the frame family the
    row-frame lanes don't cover): per order, the same customer's
    trailing-{RANGE_WINDOW_DAYS}-day order count and int-cents spend,
    RANGE BETWEEN N PRECEDING AND CURRENT ROW over epoch-day longs.
    RANGE frames include orderdate PEERS, so same-day orders agree on
    both engines regardless of intra-day order — no tie-break needed.
    All-integer.
    """
    day = F.datediff(
        F.to_date("o_orderdate"), F.to_date(F.lit(IVL_EPOCH))
    ).cast("long")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        day.alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    w = (
        W.partitionBy("o_custkey")
        .orderBy("d")
        .rangeBetween(-RANGE_WINDOW_DAYS, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "d",
        F.count("*").over(w).alias("n_win"),
        F.sum("cents").over(w).alias("cents_win"),
    )


ORACLE_RANGE_WINDOW = f"""
WITH o AS (
  SELECT o_orderkey, o_custkey,
         datediff('day', DATE '{IVL_EPOCH}', CAST(o_orderdate AS DATE)) AS d,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT o_orderkey, o_custkey, d,
       CAST(count(*) OVER w AS BIGINT) AS n_win,
       CAST(sum(cents) OVER w AS BIGINT) AS cents_win
FROM o
WINDOW w AS (PARTITION BY o_custkey ORDER BY d
             RANGE BETWEEN {RANGE_WINDOW_DAYS} PRECEDING AND CURRENT ROW)
"""


NB_DECIMALS = 4


def text_nb_lang_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier (operators/nb.py —
    the one-pass trainable stand-in for CCNet/fastText-style corpus
    filters; DSIR's supervised sibling): fit add-1 NB on (lang, text)
    over whitespace tokens, classify the same corpus, emit the
    arg-max lang and its {NB_DECIMALS}dp score. Ranking is on ROUNDED
    scores with a lang tie-break per house convention; the oracle
    refits the identical model relationally. Margins probed per
    fixture (top-2 gap and 4dp grid distance vs ~1e-12 drift)."""
    from ..operators.nb import nb_classify, nb_train

    docs = t(spark, sf_dir, "documents")
    token_logp, priors = nb_train(docs, text_col="text", label_col="lang")
    out = nb_classify(
        docs,
        token_logp,
        priors,
        id_col="doc_id",
        text_col="text",
        label_col="lang",
        score_decimals=NB_DECIMALS,
    )
    return out.select(
        "doc_id", F.col("lang").alias("pred_lang"), "score"
    )


ORACLE_NB = rf"""
WITH toks AS (
  SELECT doc_id, lang, t.term AS token
  FROM documents, unnest(string_split_regex(lower(text), '\s+')) AS t(term)
  WHERE t.term <> ''
),
counts AS (SELECT token, lang, count(*) AS cnt FROM toks GROUP BY 1, 2),
class_tot AS (SELECT lang, count(*) AS tot FROM toks GROUP BY 1),
vocab AS (SELECT DISTINCT token FROM counts),
v AS (SELECT CAST(count(*) AS DOUBLE) AS vs FROM vocab),
logp AS (
  SELECT g.token, g.lang,
         ln((coalesce(c.cnt, 0) + 1.0) / (g.tot + 1.0 * v.vs)) AS logp
  FROM (SELECT token, lang, tot FROM vocab CROSS JOIN class_tot) g
  LEFT JOIN counts c ON g.token = c.token AND g.lang = c.lang
  CROSS JOIN v
),
priors AS (
  SELECT lang,
         ln(count(*) / CAST((SELECT count(*) FROM documents) AS DOUBLE))
           AS logprior
  FROM documents GROUP BY 1
),
doc_toks AS (SELECT doc_id, token, count(*) AS n_t FROM toks GROUP BY 1, 2),
sc AS (
  SELECT dt.doc_id, lp.lang, sum(dt.n_t * lp.logp) AS ll
  FROM doc_toks dt JOIN logp lp ON dt.token = lp.token
  GROUP BY 1, 2
),
scf AS (
  SELECT sc.doc_id, sc.lang,
         round(sc.ll + p.logprior, {NB_DECIMALS}) + 0.0 AS score
  FROM sc JOIN priors p ON sc.lang = p.lang
),
r AS (
  SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, lang) AS rn
  FROM scf
)
SELECT doc_id, lang AS pred_lang, score FROM r WHERE rn = 1
"""


PACK_SEQ_LEN = 2048
PACK_SEED = 5


def order_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-split sequence packing
    (operators/ordering.py:pack_sequences): the document corpus laid
    end-to-end in portable-md5 epoch order and cut into
    {PACK_SEQ_LEN}-token training sequences — one row per (document,
    sequence spanned) with seq_start / doc_offset / n_in_seq span
    arithmetic. Same distributed exact prefix sum as
    order_token_shards; the oracle re-derives it with one window +
    unnest(range(...)). All-integer."""
    from ..operators.ordering import pack_sequences

    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.filter(tokens("text"), lambda x: x != "")).alias(
            "n_tokens"
        ),
    )
    out = pack_sequences(
        docs, PACK_SEQ_LEN, PACK_SEED, order_fn=_md5_order
    )
    return out.select(
        "doc_id", "n_tokens", "seq_id", "seq_start", "doc_offset",
        "n_in_seq",
    )


ORACLE_PACK_SEQ = rf"""
WITH d AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '')) AS n_tokens,
         md5('{PACK_SEED}' || ':' || CAST(doc_id AS VARCHAR)) AS k
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
           ORDER BY k, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS cum
  FROM d
),
x AS (
  SELECT doc_id, n_tokens, cum, s.seq_id
  FROM c, unnest(range(cum // {PACK_SEQ_LEN},
                       (cum + n_tokens - 1) // {PACK_SEQ_LEN} + 1))
         AS s(seq_id)
  WHERE n_tokens > 0
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(seq_id AS BIGINT) AS seq_id,
       CAST(greatest(cum, seq_id * {PACK_SEQ_LEN})
            - seq_id * {PACK_SEQ_LEN} AS BIGINT) AS seq_start,
       CAST(greatest(cum, seq_id * {PACK_SEQ_LEN}) - cum AS BIGINT)
         AS doc_offset,
       CAST(least(cum + n_tokens, (seq_id + 1) * {PACK_SEQ_LEN})
            - greatest(cum, seq_id * {PACK_SEQ_LEN}) AS BIGINT)
         AS n_in_seq
FROM x
"""


DIFF_REMOVE_MOD = 97  # keys absent from the OLD snapshot ('added')
DIFF_CHANGE_MOD = 13  # keys whose segment mutates in NEW ('changed')


def dim_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (operators/diff.py:snapshot_diff — the
    what-changed-since-yesterday audit the reference's overwrite-only
    dims can't answer): two deterministic customer snapshots — OLD
    drops custkey % {DIFF_REMOVE_MOD} == 0, NEW rewrites the segment
    of custkey % {DIFF_CHANGE_MOD} == 0 — full-outer diffed into
    added/removed/changed/unchanged plus per-row changed-column
    lists. One hash join; all string/int, hash-exact."""
    from ..operators.diff import snapshot_diff

    cust = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    old = cust.filter(F.col("c_custkey") % DIFF_REMOVE_MOD != 0)
    new = cust.withColumn(
        "c_mktsegment",
        F.when(
            F.col("c_custkey") % DIFF_CHANGE_MOD == 0, F.lit("CHANGED")
        ).otherwise(F.col("c_mktsegment")),
    )
    return snapshot_diff(
        old, new, ["c_custkey"], ["c_mktsegment", "c_nationkey"]
    )


ORACLE_SNAPSHOT_DIFF = f"""
WITH o AS (
  SELECT c_custkey, c_mktsegment, c_nationkey FROM customer
  WHERE c_custkey % {DIFF_REMOVE_MOD} <> 0
),
n AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % {DIFF_CHANGE_MOD} = 0 THEN 'CHANGED'
              ELSE c_mktsegment END AS c_mktsegment,
         c_nationkey
  FROM customer
),
j AS (
  SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
         o.c_mktsegment AS c_mktsegment_old,
         o.c_nationkey AS c_nationkey_old,
         n.c_mktsegment AS c_mktsegment_new,
         n.c_nationkey AS c_nationkey_new,
         o.c_custkey IS NULL AS is_added,
         n.c_custkey IS NULL AS is_removed,
         o.c_mktsegment IS DISTINCT FROM n.c_mktsegment AS seg_chg,
         o.c_nationkey IS DISTINCT FROM n.c_nationkey AS nat_chg
  FROM o FULL OUTER JOIN n ON o.c_custkey = n.c_custkey
)
SELECT c_custkey, c_mktsegment_old, c_nationkey_old,
       c_mktsegment_new, c_nationkey_new,
       CASE WHEN is_added THEN 'added'
            WHEN is_removed THEN 'removed'
            WHEN seg_chg OR nat_chg THEN 'changed'
            ELSE 'unchanged' END AS diff_status,
       CASE WHEN NOT is_added AND NOT is_removed AND (seg_chg OR nat_chg)
            THEN concat_ws(',',
                   CASE WHEN seg_chg THEN 'c_mktsegment' END,
                   CASE WHEN nat_chg THEN 'c_nationkey' END)
            ELSE '' END AS changed_cols
FROM j
"""


SESSION_WINDOW_GAP_MIN = 30


def agg_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native SESSION WINDOW aggregation (F.session_window — the
    SessionWindow exec node; the custom-state sessionize lanes cover
    the semantics, this covers Spark's BUILT-IN surface): per-user
    gap-merged sessions over events with count + int-cents value sum.
    Spark merges when the gap is <= {SESSION_WINDOW_GAP_MIN} min
    (verified empirically: an exactly-gap-sized step stays in the
    session), so the islands oracle breaks strictly-greater. Session
    end = last event + gap."""
    gap = f"{SESSION_WINDOW_GAP_MIN} minutes"
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    out = ev.groupBy("user_id", F.session_window("ts", gap)).agg(
        F.count("*").alias("n_events"),
        F.sum("cents").alias("cents_sum"),
    )
    return out.select(
        "user_id",
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "n_events",
        "cents_sum",
    )


ORACLE_SESSION_WINDOW = f"""
WITH o AS (
  SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS cents,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w
                   > INTERVAL {SESSION_WINDOW_GAP_MIN} MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts, cents,
         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts)
              AS BIGINT) AS sid
  FROM o
)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL {SESSION_WINDOW_GAP_MIN} MINUTE
         AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(cents) AS BIGINT) AS cents_sum
FROM s GROUP BY user_id, sid
"""


def streaming_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC upsert (streaming/cdc.py:run_cdc_upsert — the
    foreachBatch fold of cdc_latest_snapshot's change feed into a
    persisted latest-wins state, tombstones kept in state so replayed
    older changes can't resurrect deletes). The fold is associative,
    so the final snapshot must equal the batch apply_cdc — the oracle
    IS the batch lane's oracle."""
    from ..streaming.cdc import run_cdc_upsert
    from ..streaming.pipeline import read_table_stream

    src = read_table_stream(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("event_type"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return run_cdc_upsert(src, ["user_id"], ["ts", "event_id"], "op")


ZORDER_BITS = 16


def layout_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order/Morton layout keys (operators/zorder.py — the
    Delta/Iceberg OPTIMIZE ZORDER clustering primitive; sorting by
    this key gives every parquet file a tight min/max bounding box in
    BOTH dimensions, the 100 TB scan-pruning lever): interleaved
    (p_size, int-cents price-bucket) bits for every part. Pure
    integer shift/mask arithmetic — the oracle re-derives the
    interleave with an unnest(range)-summed twin."""
    from ..operators.zorder import zvalue

    p = t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("long").alias("x"),
        # explicit floor on BOTH engines (the oracle's DuckDB `//`
        # floors): Spark `div` truncates toward zero, so a negative
        # price would land in a different bucket (round-12 ADVICE
        # fix; exact since cents << 2^53)
        F.expr(
            "CAST(floor(CAST(round(p_retailprice * 100) AS BIGINT)"
            " / 1000) AS BIGINT)"
        ).alias("y"),
    )
    return p.select(
        "p_partkey", "x", "y",
        zvalue(["x", "y"], bits=ZORDER_BITS).alias("zval"),
    )


ORACLE_ZORDER = f"""
WITH d AS (
  SELECT p_partkey, CAST(p_size AS BIGINT) AS x,
         CAST(round(p_retailprice * 100) AS BIGINT) // 1000 AS y
  FROM part
)
SELECT p_partkey, x, y,
       CAST(sum(((x >> i.i) & 1) * (CAST(1 AS BIGINT) << (2 * i.i))
              + ((y >> i.i) & 1) * (CAST(1 AS BIGINT) << (2 * i.i + 1)))
            AS BIGINT) AS zval
FROM d, unnest(range(0, {ZORDER_BITS})) i(i)
GROUP BY p_partkey, x, y
"""


# ---- Hilbert layout keys (round 11) ----
#
# The locality-preserving sibling of layout_zorder_keys (operators/
# hilbert.py): consecutive Hilbert indices are always grid-neighbors,
# so range predicates map to fewer, tighter file bounding boxes than
# Morton order gives (the reason liquid-clustering-style layouts
# prefer it). Same (size, price-bucket) dimensions as the z-order
# lane so the two layout keys are directly comparable. The unrolled
# per-level rotate/reflect chain is pure integer CASE/shift/xor
# arithmetic on BOTH engines, generated from one transform
# (operators/hilbert.py:hilbert_sql) — hash-exact.
HILBERT_BITS = 9  # grid 512x512: covers p_size <= 50, price bucket <= ~210


def layout_hilbert_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert d-index layout keys for every part on the z-order
    lane's (size, price-bucket) grid. Returns (p_partkey, x, y,
    hval)."""
    from ..operators.hilbert import with_hilbert

    p = t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("long").alias("x"),
        # explicit floor on BOTH engines (the oracle's DuckDB `//`
        # floors): Spark `div` truncates toward zero, so a negative
        # price would land in a different bucket (round-12 ADVICE
        # fix; exact since cents << 2^53)
        F.expr(
            "CAST(floor(CAST(round(p_retailprice * 100) AS BIGINT)"
            " / 1000) AS BIGINT)"
        ).alias("y"),
    )
    return with_hilbert(p, "x", "y", HILBERT_BITS, "hval")


def _hilbert_oracle() -> str:
    from ..operators.hilbert import hilbert_sql

    return f"""
WITH hsrc AS (
  SELECT p_partkey AS k, CAST(p_size AS BIGINT) AS sz,
         CAST(round(p_retailprice * 100) AS BIGINT) // 1000 AS pb
  FROM part
),
{hilbert_sql("sz", "pb", HILBERT_BITS)}
SELECT h.k AS p_partkey, h.sz AS x, h.pb AS y, l0.d AS hval
FROM l0 JOIN hsrc h ON h.k = l0.k
"""


ORACLE_HILBERT = _hilbert_oracle()


QUANTILE_PROBES = {"p25": 0.25, "p50": 0.5, "p75": 0.75, "p90": 0.9,
                   "p99": 0.99}
QUANTILE_SAMPLES = 256


def stats_quantile_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile summary (operators/quantiles.py — the rank
    rung of the sketch ladder next to MG/CM/HLL/Bloom) emitted as a
    DETERMINISTIC two-sided rank contract over lineitem int-cents
    prices: count(x <= est) >= target and count(x < est) < target + B
    with B = sum_p (k_p - 1). Unlike the CM/HLL contracts the bound
    is worst-case (no failure probability) and holds for ANY physical
    partitioning, so the hard-coded-TRUE oracle is sound by theorem,
    not by fixture; the estimate itself is partitioning-dependent and
    deliberately NOT emitted."""
    from ..operators.quantiles import (
        estimate_quantiles,
        quantile_summary,
        summary_bounds,
    )

    li = t(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents")
    )
    rows = [
        r.asDict()
        for r in quantile_summary(
            li, "cents", samples=QUANTILE_SAMPLES
        ).collect()
    ]  # bounded driver state: partitions x samples rows
    est, n = estimate_quantiles(rows, list(QUANTILE_PROBES.values()))
    b, _ = summary_bounds(rows)
    import math

    probes = spark.createDataFrame(
        [
            (label, int(est[q]), max(1, math.ceil(q * n)))
            for label, q in QUANTILE_PROBES.items()
        ],
        "q_label string, est long, target long",
    )
    return (
        li.crossJoin(F.broadcast(probes))
        .groupBy("q_label", "target")
        .agg(
            F.sum((F.col("cents") <= F.col("est")).cast("long")).alias(
                "cnt_le"
            ),
            F.sum((F.col("cents") < F.col("est")).cast("long")).alias(
                "cnt_lt"
            ),
        )
        .select(
            "q_label",
            (F.col("cnt_le") >= F.col("target")).alias("est_not_too_small"),
            (F.col("cnt_lt") < F.col("target") + F.lit(b)).alias(
                "est_not_too_large"
            ),
        )
    )


# Unlike ORACLE_COUNTMIN's probabilistic TRUEs, these hold by the
# deterministic worst-case theorem for EVERY partitioning/fixture —
# a failure here is a code bug, full stop.
ORACLE_QUANTILE = """
SELECT t.q_label, TRUE AS est_not_too_small, TRUE AS est_not_too_large
FROM (VALUES ('p25'), ('p50'), ('p75'), ('p90'), ('p99')) AS t(q_label)
"""


def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (operators/asof.py direction='forward' —
    pandas merge_asof's other direction, same one-exchange union +
    running-last composition with the scan reversed): for each event,
    the customer's EARLIEST order date at-or-after the event time —
    the "next touchpoint" attribution shape. Oracle = the min()
    correlated twin of join_asof's max()."""
    from ..operators.asof import asof_join

    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("order_ts"),
    )
    joined = asof_join(
        ev, o, on="user_id", left_ts="ts", right_ts="order_ts",
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("order_ts").cast("date").alias("next_order_date"),
    )


ORACLE_ASOF_FORWARD = """
SELECT e.event_id, e.user_id,
       CAST((SELECT min(o.o_orderdate) FROM orders o
             WHERE o.o_custkey = e.user_id AND o.o_orderdate >= e.ts)
            AS DATE) AS next_order_date
FROM events e
"""


ES_SAMPLE_K = 200
ES_SALT = "es-v1"
ES_KEY_DECIMALS = 8


def sample_weighted_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement
    (operators/splits.py:sample_weighted_topk — Efraimidis–Spirakis
    2006 with portable-md5 uniforms; the quality-weighted corpus
    subsampling op next to the uniform exact-k stratum sampler):
    the {ES_SAMPLE_K} documents with the largest ln(u)/n_chars keys —
    inclusion odds rise with document length. Heap-based top-k
    (TakeOrderedAndProject, plan-pinned in tests), ranked on the
    {ES_KEY_DECIMALS}dp-rounded key with an id tie-break; grid
    margins probed at 3 SFs + 10× (≥ 3.0e-5 grid units vs ~1e-8
    drift)."""
    from ..operators.splits import sample_weighted_topk

    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return sample_weighted_topk(
        docs,
        ES_SAMPLE_K,
        "n_chars",
        salt=ES_SALT,
        key_decimals=ES_KEY_DECIMALS,
    )


ORACLE_ES_SAMPLE = f"""
WITH k AS (
  SELECT doc_id, n_chars,
         round(ln((CAST('0x' || substr(md5('{ES_SALT}:'
                         || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
                   + 0.5) / {float(1 << 60)!r}) / n_chars,
               {ES_KEY_DECIMALS}) + 0.0 AS es_key
  FROM documents
)
SELECT doc_id, n_chars, es_key
FROM k ORDER BY es_key DESC, doc_id LIMIT {ES_SAMPLE_K}
"""


ASOF_LOOKBACK_DAYS = 3


def dim_scd2_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup (operators/scd.py:
    scd2_point_in_time — the AS OF join every SCD2 warehouse dim
    exists to serve; the reference's latest-only dims can't answer
    it, SURVEY.md §3.2): the per-user event-type history from
    ``dim_scd2_history`` probed at each user's event days shifted
    back ``ASOF_LOOKBACK_DAYS`` — "what was this user's state three
    days before each activity day". Probes before the user's first
    version surface with NULL attributes (left join). Equi-join on
    the dimension key with a residual [valid_from, valid_to) range
    predicate — a plain hash join, never a nested loop; each probe
    matches at most one version because versions partition the
    timeline. All columns integer/date/string/bool — hash-exact.
    """
    from ..operators.scd import scd2_compress, scd2_point_in_time

    ev = t(spark, sf_dir, "events")
    snap = (
        ev.withColumn("day", F.to_date("ts"))
        .groupBy("user_id", "day")
        .agg(
            F.max_by(
                "event_type", F.struct(F.col("ts"), F.col("event_id"))
            ).alias("event_type")
        )
    )
    hist = scd2_compress(snap, ["user_id"], ["event_type"], "day")
    probes = (
        ev.select(
            "user_id",
            F.date_sub(F.to_date("ts"), ASOF_LOOKBACK_DAYS).alias(
                "probe_day"
            ),
        )
        .distinct()
    )
    return scd2_point_in_time(hist, probes, ["user_id"], "probe_day")


ORACLE_SCD2_ASOF = f"""
WITH r AS (
  SELECT user_id, CAST(ts AS DATE) AS day, event_type,
         row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
),
snap AS (SELECT user_id, day, event_type FROM r WHERE rn = 1),
v AS (
  SELECT user_id, day, event_type,
         CASE WHEN lag(day) OVER w IS NULL
                OR event_type IS DISTINCT FROM lag(event_type) OVER w
              THEN 1 ELSE 0 END AS flag
  FROM snap WINDOW w AS (PARTITION BY user_id ORDER BY day)
),
ver AS (
  SELECT user_id, day, event_type,
         CAST(sum(flag) OVER (PARTITION BY user_id ORDER BY day)
              AS BIGINT) AS version
  FROM v
),
hist AS (
  SELECT user_id, event_type, version, min(day) AS valid_from
  FROM ver GROUP BY user_id, event_type, version
),
h AS (
  SELECT user_id, event_type, version, valid_from,
         lead(valid_from) OVER w2 AS valid_to,
         lead(valid_from) OVER w2 IS NULL AS is_current
  FROM hist WINDOW w2 AS (PARTITION BY user_id ORDER BY version)
),
p AS (
  SELECT DISTINCT user_id,
         CAST(ts AS DATE) - {ASOF_LOOKBACK_DAYS} AS probe_day
  FROM events
)
SELECT p.user_id, p.probe_day, h.event_type, h.version, h.valid_from,
       h.valid_to, h.is_current
FROM p LEFT JOIN h ON h.user_id = p.user_id
  AND h.valid_from <= p.probe_day
  AND (h.valid_to IS NULL OR p.probe_day < h.valid_to)
"""


SKEW_SALT = 4


def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted equi-join (operators/skew.py:salted_join —
    the hot-key mitigation every 100 TB fact⋈dim join needs when one
    key owns a disproportionate share of the fact table): events
    LEFT-joined to the customer dimension with every fact row salted
    across ``SKEW_SALT`` reducers and the dimension replicated to
    match, then rolled up per (segment, event_type). The contract is
    ROW-IDENTITY with the plain join — the oracle is the unsalted SQL
    join, so the sweep proves salting never changes results (spurious
    replication or dropped unmatched rows would break the hash).
    Unmatched users land in the NULL-segment group with a NULL
    account sum; counts BIGINT, money int-cents — hash-exact.
    """
    from ..operators.skew import salted_join

    ev = t(spark, sf_dir, "events").select("user_id", "event_type")
    dim = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("acct_cents"),
    )
    joined = salted_join(ev, dim, "user_id", salt=SKEW_SALT, how="left")
    return joined.groupBy("segment", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("acct_cents").alias("acct_cents_sum"),
        F.countDistinct("user_id").alias("n_users"),
    )


ORACLE_SKEW_SALTED = """
SELECT c.c_mktsegment AS segment, e.event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS acct_cents_sum,
       count(DISTINCT e.user_id) AS n_users
FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id
GROUP BY 1, 2
"""


def streaming_python_dist_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PARTITION-PLANNED custom Python streaming source
    (sources/pysource.py:_PagesDistStreamReader — the executor-side
    half the Simple reader's docstring deferred to): the documents
    table staged as four parquet fragments, streamed through
    ``parquet_pages_dist`` where every micro-batch fans its offset
    range out to one task per (fragment, row-group) — reads run in
    EXECUTORS via pyarrow row-group pulls, the driver sees only footer
    metadata. Complete-mode per-(lang, source) aggregate into a memory
    sink, drained by Trigger.AvailableNow — which WORKS here, unlike
    the Simple reader (its one-prefetched-read() protocol caps an
    AvailableNow query at the first offset, hence that lane's polling
    loop; the full reader's ``latestOffset()`` is honored, test-pinned
    in ``tests/test_pysource_dist.py``). The whole feed crossing the
    distributed Python source boundary must hash-match the batch
    oracle."""
    import os
    import shutil
    import tempfile
    import uuid

    from ..sources.pysource import register

    register(spark)
    # uuid-suffixed scratch: keying on basename(sf_dir) alone raced
    # concurrent runs against same-basename fixtures (one run rmtree'd
    # the fragments another was still streaming); the checkpoint dir is
    # likewise per-run and removed in the same finally
    run_id = uuid.uuid4().hex[:8]
    scratch = os.path.join(
        tempfile.gettempdir(),
        f"pydist_{os.path.basename(os.path.normpath(sf_dir))}_{run_id}",
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_pydist_")
    t(spark, sf_dir, "documents").repartition(4).write.parquet(scratch)
    docs = spark.readStream.format("parquet_pages_dist").load(scratch)
    agg = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("chars_sum"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )
    name = f"py_dist_stream_{run_id}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(300):
            raise TimeoutError("availableNow run did not finish in 300s")
    finally:
        q.stop()
        shutil.rmtree(scratch, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


ORACLE_PY_DIST_STREAM = """
SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS chars_sum,
       CAST(min(doc_id) AS BIGINT) AS min_doc,
       CAST(max(doc_id) AS BIGINT) AS max_doc
FROM documents
GROUP BY lang, source
"""


EDITDIST_D = 2
EDITDIST_TITLE_LEN = 30


def dedup_editdistance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact edit-distance join (operators/editdist.py — PassJoin-style
    segment partitioning, Li et al. VLDB 2012): document pairs whose
    30-char title prefixes are within Levenshtein distance 2 — the
    entity-resolution / fuzzy-title dedup the shingle lanes can't
    express (they bound set overlap, not edit operations). The planted
    near-duplicate docs surface here as distance-0/1/2 title pairs at
    every SF. Candidates come from ONE equi-join on
    (partner_length, segment_index, segment) — pigeonhole over d+1
    segments guarantees completeness; ``F.levenshtein`` verifies
    exactly. The oracle replays the identical segmentation relationally
    (DuckDB generate_series + substr + levenshtein), and the operator
    is independently brute-force-parity-tested against a pure-Python
    DP over random strings (tests/test_editdist.py)."""
    from ..operators.editdist import editdistance_join

    titles = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"substring(text, 1, {EDITDIST_TITLE_LEN})").alias("title"),
    )
    out = editdistance_join(titles, "doc_id", "title", EDITDIST_D)
    return out.select(
        "id_a", "id_b", F.col("dist").cast("long").alias("dist")
    )


ORACLE_EDITDIST = f"""
WITH s AS MATERIALIZED (
  SELECT doc_id AS id, substr(text, 1, {EDITDIST_TITLE_LEN}) AS s,
         length(substr(text, 1, {EDITDIST_TITLE_LEN})) AS L
  FROM documents
),
si AS (  -- select-list unnest: lateral generate_series is unsupported
  SELECT id, s, L, unnest(generate_series(0, 2)) AS i FROM s
),
idx AS MATERIALIZED (
  SELECT id AS b_id, L AS Lb, i,
         substr(s, (i * (L // 3) + least(i, L % 3)) + 1,
                (L // 3) + (CASE WHEN i < L % 3 THEN 1 ELSE 0 END)) AS seg
  FROM si
),
pl AS (
  SELECT id, s, L,
         unnest(generate_series(greatest(L - 2, 3), L + 2)) AS Lb
  FROM s
),
pli AS (
  SELECT id, s, L, Lb, unnest(generate_series(0, 2)) AS i FROM pl
),
pp AS (
  SELECT id AS a_id, s AS a_s, L AS La, Lb, i,
         (Lb // 3) + (CASE WHEN i < Lb % 3 THEN 1 ELSE 0 END) AS slen,
         (i * (Lb // 3) + least(i, Lb % 3)) AS sstart
  FROM pli
  WHERE (Lb // 3) + (CASE WHEN i < Lb % 3 THEN 1 ELSE 0 END) <= L
),
probe AS (
  SELECT a_id, Lb, i, slen,
         unnest(generate_series(greatest(sstart - 2, 0),
                                least(sstart + 2, La - slen))) AS p,
         a_s
  FROM pp
  WHERE least(sstart + 2, La - slen) >= greatest(sstart - 2, 0)
),
cand AS (
  SELECT DISTINCT least(a_id, b_id) AS id_a, greatest(a_id, b_id) AS id_b
  FROM (SELECT a_id, Lb, i, substr(a_s, p + 1, slen) AS seg FROM probe) pr
  JOIN idx USING (Lb, i, seg)
  WHERE a_id <> b_id
)
SELECT c.id_a, c.id_b, CAST(levenshtein(sa.s, sb.s) AS BIGINT) AS dist
FROM cand c
JOIN s sa ON sa.id = c.id_a
JOIN s sb ON sb.id = c.id_b
WHERE levenshtein(sa.s, sb.s) <= 2
"""


DTW_K = 20


def ts_dtw_topk_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k DTW sequence similarity search (operators/dtw.py —
    REPOSE ICDE 2021 posture, Spark-idiomatic: parallel across series,
    exact integer DP within): every user's DAILY spend series
    (sum of int-cents per day, ordered by day) ranked by dynamic-time-
    warping distance to the minimum-user_id user's series; the
    {DTW_K} nearest (dist, user_id tie-break). Pure int64 arithmetic
    end to end, so the DP is bit-reproducible. The oracle replays the
    DP as a recursive CTE advancing every candidate ONE DP ROW per
    level, with the within-row recurrence
    ``cur[j] = c_j + min(b_j, cur[j-1])`` closed into window functions
    via the min-plus prefix scan
    ``cur[j] = S_j + min_{{k<=j}}(b_k − S_{{k-1}})`` (S = running sum
    of cell costs, b = min of the two previous-row predecessors)."""
    from ..operators.dtw import dtw_topk_search

    ev = t(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "user_id", F.to_date("ts").alias("day")
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("v")
        )
        .withColumn(
            "pos",
            F.row_number().over(
                W.partitionBy("user_id").orderBy("day")
            ),
        )
    )
    q_user = ev.agg(F.min("user_id")).collect()[0][0]
    query = [
        int(r.v)
        for r in daily.filter(F.col("user_id") == q_user)
        .orderBy("day")
        .collect()
    ]
    cands = daily.filter(F.col("user_id") != q_user)
    out = dtw_topk_search(
        cands, query, DTW_K, id_col="user_id", pos_col="pos", val_col="v"
    )
    return out.select(F.col("series_id").alias("user_id"), "dtw_dist")


_DTW_INF = 1 << 60

ORACLE_DTW = f"""
WITH RECURSIVE
daily AS MATERIALIZED (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
),
qu AS MATERIALIZED (SELECT min(user_id) AS quid FROM events),
q AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS j, v AS w
  FROM daily, qu WHERE user_id = quid
),
cand AS MATERIALIZED (
  SELECT user_id AS id,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
              AS BIGINT) AS i,
         v
  FROM daily, qu WHERE user_id <> quid
),
jj AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS j UNION ALL SELECT j FROM q),
dp AS (
  -- DP row i = 0: reachable only at j = 0
  SELECT c.id, CAST(0 AS BIGINT) AS i, jj.j,
         CASE WHEN jj.j = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST({_DTW_INF} AS BIGINT) END AS cost
  FROM (SELECT DISTINCT id FROM cand) c, jj
  UNION ALL
  -- advance every candidate one DP row: the sequential
  -- cur[j] = c_j + min(b_j, cur[j-1]) closes into
  -- S_j + running_min(b_k - S_(k-1))
  SELECT id, i, j,
         CASE WHEN j = 0 THEN CAST({_DTW_INF} AS BIGINT)
              ELSE s_run + m_run END AS cost
  FROM (
    SELECT id, i, j,
           sum(c) OVER (PARTITION BY id ORDER BY j
                        ROWS UNBOUNDED PRECEDING) AS s_run,
           min(b - s_prev) OVER (PARTITION BY id ORDER BY j
                                 ROWS UNBOUNDED PRECEDING) AS m_run
    FROM (
      SELECT id, i, j, c, b,
             coalesce(sum(c) OVER (PARTITION BY id ORDER BY j
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS s_prev
      FROM (
        SELECT d.id, d.i + 1 AS i, d.j,
               CASE WHEN d.j = 0 THEN NULL ELSE abs(a.v - q.w) END AS c,
               CASE WHEN d.j = 0 THEN NULL
                    ELSE least(d.cost,
                               lag(d.cost) OVER (PARTITION BY d.id
                                                 ORDER BY d.j)) END AS b
        FROM dp d
        JOIN cand a ON a.id = d.id AND a.i = d.i + 1
        LEFT JOIN q ON q.j = d.j
      )
    )
  )
),
n_s AS (SELECT id, max(i) AS n FROM cand GROUP BY 1),
mm AS (SELECT max(j) AS m FROM q)
SELECT dp.id AS user_id, dp.cost AS dtw_dist
FROM dp JOIN n_s ON n_s.id = dp.id, mm
WHERE dp.i = n_s.n AND dp.j = mm.m
ORDER BY dtw_dist, user_id
LIMIT {DTW_K}
"""


DTW_BAND = 7


def ts_dtw_banded_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sakoe-Chiba BANDED DTW top-k (operators/dtw.py, ``band=7``) —
    the practitioner form for sequence search: warping cells are
    restricted to ``|i − j| <= 7`` (a week of warp on daily series),
    which (a) bounds the DP to O(n·band) per candidate and (b)
    restores the positional structure that makes the LB_Keogh
    envelope bound admissible — the tighter prefilter the
    unconstrained lane measurably cannot have (BASELINE.md round 9).
    Candidates whose day-count differs from the query's by more than
    the band have no warping path and are dropped (search semantics;
    the direct ``dtw_distance`` call raises instead — both pinned in
    tests/test_dtw.py). The oracle replays the banded DP in the same
    recursive min-plus-scan CTE as the unconstrained lane, with
    out-of-band cells carrying a 2^50 penalty no feasible path can
    reach (the scan must run over every j, so forbidden cells are
    penalized rather than absent; for feasible candidates the DP
    minimum never touches one, making both engines' values exact
    banded DTW)."""
    from ..operators.dtw import dtw_topk_search

    ev = t(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "user_id", F.to_date("ts").alias("day")
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("v")
        )
        .withColumn(
            "pos",
            F.row_number().over(
                W.partitionBy("user_id").orderBy("day")
            ),
        )
    )
    q_user = ev.agg(F.min("user_id")).collect()[0][0]
    query = [
        int(r.v)
        for r in daily.filter(F.col("user_id") == q_user)
        .orderBy("day")
        .collect()
    ]
    cands = daily.filter(F.col("user_id") != q_user)
    out = dtw_topk_search(
        cands,
        query,
        DTW_K,
        id_col="user_id",
        pos_col="pos",
        val_col="v",
        band=DTW_BAND,
    )
    return out.select(F.col("series_id").alias("user_id"), "dtw_dist")


_DTW_CELL_INF = 1 << 50

ORACLE_DTW_BANDED = f"""
WITH RECURSIVE
daily AS MATERIALIZED (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
),
qu AS MATERIALIZED (SELECT min(user_id) AS quid FROM events),
q AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS j, v AS w
  FROM daily, qu WHERE user_id = quid
),
mm AS MATERIALIZED (SELECT max(j) AS m FROM q),
cand0 AS MATERIALIZED (
  SELECT user_id AS id,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
              AS BIGINT) AS i,
         v
  FROM daily, qu WHERE user_id <> quid
),
lens AS (SELECT id, max(i) AS n FROM cand0 GROUP BY 1),
cand AS MATERIALIZED (  -- band feasibility: |n - m| <= band
  SELECT c.* FROM cand0 c JOIN lens l ON l.id = c.id, mm
  WHERE abs(l.n - mm.m) <= {DTW_BAND}
),
jj AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS j UNION ALL SELECT j FROM q),
dp AS (
  -- DP row i = 0: reachable only at j = 0
  SELECT c.id, CAST(0 AS BIGINT) AS i, jj.j,
         CASE WHEN jj.j = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST({_DTW_INF} AS BIGINT) END AS cost
  FROM (SELECT DISTINCT id FROM cand) c, jj
  UNION ALL
  -- advance every candidate one DP row; out-of-band cells carry the
  -- 2^50 penalty (the scan runs over every j, so forbidden cells are
  -- penalized, not absent — no feasible minimum ever touches one)
  SELECT id, i, j,
         CASE WHEN j = 0 THEN CAST({_DTW_INF} AS BIGINT)
              ELSE s_run + m_run END AS cost
  FROM (
    SELECT id, i, j,
           sum(c) OVER (PARTITION BY id ORDER BY j
                        ROWS UNBOUNDED PRECEDING) AS s_run,
           min(b - s_prev) OVER (PARTITION BY id ORDER BY j
                                 ROWS UNBOUNDED PRECEDING) AS m_run
    FROM (
      SELECT id, i, j, c, b,
             coalesce(sum(c) OVER (PARTITION BY id ORDER BY j
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS s_prev
      FROM (
        SELECT d.id, d.i + 1 AS i, d.j,
               CASE WHEN d.j = 0 THEN NULL
                    WHEN abs((d.i + 1) - d.j) > {DTW_BAND}
                      THEN CAST({_DTW_CELL_INF} AS BIGINT)
                    ELSE abs(a.v - q.w) END AS c,
               CASE WHEN d.j = 0 THEN NULL
                    ELSE least(d.cost,
                               lag(d.cost) OVER (PARTITION BY d.id
                                                 ORDER BY d.j)) END AS b
        FROM dp d
        JOIN cand a ON a.id = d.id AND a.i = d.i + 1
        LEFT JOIN q ON q.j = d.j
      )
    )
  )
),
n_s AS (SELECT id, max(i) AS n FROM cand GROUP BY 1)
SELECT dp.id AS user_id, dp.cost AS dtw_dist
FROM dp JOIN n_s ON n_s.id = dp.id, mm
WHERE dp.i = n_s.n AND dp.j = mm.m
ORDER BY dtw_dist, user_id
LIMIT {DTW_K}
"""


def dedup_editdistance_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-table (entity-resolution) form of the exact edit-distance
    join (operators/editdist.py, ``other=`` path): dirty probe records
    matched against a canonical master table. Probe = odd-doc_id title
    prefixes, master = even-doc_id titles — the planted near-duplicate
    families span both parities, so every cross-parity family member
    surfaces as a (probe_id, master_id, dist<=2) match at every SF.
    Pigeonhole completeness needs only one direction: the master side
    is segmented (d+1 verbatim segments), the probe side enumerates
    ±d-shifted substrings, candidates meet on ONE equi-key
    (partner_length, segment_index, segment) and ``F.levenshtein``
    verifies exactly — ids live in separate spaces and are never
    compared or deduped across tables (asymmetric output, unlike the
    self-join lane's (lo, hi) normalization)."""
    from ..operators.editdist import editdistance_join

    titles = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"substring(text, 1, {EDITDIST_TITLE_LEN})").alias("title"),
    )
    probe = titles.filter(F.col("doc_id") % 2 == 1)
    master = titles.filter(F.col("doc_id") % 2 == 0)
    out = editdistance_join(
        probe, "doc_id", "title", EDITDIST_D, other=master
    )
    return out.select(
        "id_a", "id_b", F.col("dist").cast("long").alias("dist")
    )


ORACLE_EDITDIST_LOOKUP = f"""
WITH sp AS MATERIALIZED (  -- probe side: odd doc_ids
  SELECT doc_id AS id, substr(text, 1, {EDITDIST_TITLE_LEN}) AS s,
         length(substr(text, 1, {EDITDIST_TITLE_LEN})) AS L
  FROM documents WHERE doc_id % 2 = 1
),
sm AS MATERIALIZED (  -- master side: even doc_ids, segmented
  SELECT doc_id AS id, substr(text, 1, {EDITDIST_TITLE_LEN}) AS s,
         length(substr(text, 1, {EDITDIST_TITLE_LEN})) AS L
  FROM documents WHERE doc_id % 2 = 0
),
smi AS (
  SELECT id, s, L, unnest(generate_series(0, 2)) AS i FROM sm
),
idx AS MATERIALIZED (
  SELECT id AS b_id, L AS Lb, i,
         substr(s, (i * (L // 3) + least(i, L % 3)) + 1,
                (L // 3) + (CASE WHEN i < L % 3 THEN 1 ELSE 0 END)) AS seg
  FROM smi
),
pl AS (
  SELECT id, s, L,
         unnest(generate_series(greatest(L - 2, 3), L + 2)) AS Lb
  FROM sp
),
pli AS (
  SELECT id, s, L, Lb, unnest(generate_series(0, 2)) AS i FROM pl
),
pp AS (
  SELECT id AS a_id, s AS a_s, L AS La, Lb, i,
         (Lb // 3) + (CASE WHEN i < Lb % 3 THEN 1 ELSE 0 END) AS slen,
         (i * (Lb // 3) + least(i, Lb % 3)) AS sstart
  FROM pli
  WHERE (Lb // 3) + (CASE WHEN i < Lb % 3 THEN 1 ELSE 0 END) <= L
),
probe AS (
  SELECT a_id, Lb, i, slen,
         unnest(generate_series(greatest(sstart - 2, 0),
                                least(sstart + 2, La - slen))) AS p,
         a_s
  FROM pp
  WHERE least(sstart + 2, La - slen) >= greatest(sstart - 2, 0)
),
cand AS (
  SELECT DISTINCT a_id AS id_a, b_id AS id_b
  FROM (SELECT a_id, Lb, i, substr(a_s, p + 1, slen) AS seg FROM probe) pr
  JOIN idx USING (Lb, i, seg)
)
SELECT c.id_a, c.id_b, CAST(levenshtein(sa.s, sb.s) AS BIGINT) AS dist
FROM cand c
JOIN sp sa ON sa.id = c.id_a
JOIN sm sb ON sb.id = c.id_b
WHERE levenshtein(sa.s, sb.s) <= 2
"""


def dedup_editdistance_collapsed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The ``collapse_exact`` plan of the edit-distance self-join on
    real data (operators/editdist.py:_collapsed_join — the round-9
    duplicate-heavy posture, 22× faster than the direct path at 10^4
    replicas, BASELINE.md): exact-duplicate titles collapse to one
    representative per distinct string before the segment join (one
    levenshtein per distinct pair), and the id-level pairs come from
    pure expansion joins — the planted dist-0 title duplicates in the
    documents fixture exercise the within-group branch. Same contract
    and SAME ORACLE as ``dedup_editdistance_pairs``: the two plans
    must agree bit-for-bit, and the driver checks this one too."""
    from ..operators.editdist import editdistance_join

    titles = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"substring(text, 1, {EDITDIST_TITLE_LEN})").alias("title"),
    )
    out = editdistance_join(
        titles, "doc_id", "title", EDITDIST_D, collapse_exact=True
    )
    return out.select(
        "id_a", "id_b", F.col("dist").cast("long").alias("dist")
    )


# ---- perceptual-hash image near-dup (round 9) ----
#
# The image corpus is generated IN the lane (like multimodal_images):
# groups of 4 consecutive doc_ids share one base image; members 1-3
# perturb exactly one 8x8 block, moving the dHash by <= 4 bits (each
# changed cell touches at most its left and right gradient bit). Cell
# luminance rides a 2-round xorshift-interleaved 31-bit LCG mixer —
# pure int64 arithmetic both engines compute exactly, with enough
# avalanche that distinct groups land ~28 bits apart (a plain LCG or
# multiplicative hash leaves shift-lattice structure that made distinct
# groups collide at hamming <= 4; measured before this mixer was
# chosen). The Spark side never touches the formula after ENCODE: real
# BMP bytes are encoded, decoded, block-mean downsampled, and gradient
# -signed by the phash kernel — the oracle recomputes the expected
# hashes analytically and replays the same banded join, so a hash
# match proves the full encode -> decode -> downsample -> pack -> LSH
# pipeline preserved every luminance comparison.
PHASH_GROUP = 4          # docs per duplicate family
PHASH_MAXDIST = 4        # Hamming threshold (< bands=8: pigeonhole-exact)
_PHASH_MIX_SQL = """
mix1 AS (
  SELECT *, ((k * 64 + i + 12345) % 2147483648 * 1103515245 + 12345)
            % 2147483648 AS s1
  FROM cells
),
mix2 AS (SELECT *, xor(s1, s1 >> 16) AS s2 FROM mix1),
mix3 AS (SELECT *, (s2 * 65539 + 1013904223) % 2147483648 AS s3 FROM mix2),
mixed AS (SELECT doc_id, r, c, i, k, m, xor(s3, s3 >> 13) AS s4 FROM mix3)
"""


def _phash_cells(doc_id: int):
    """The shared analytic pixel formula: 8x8 block luminances for one
    doc — numpy int64, exactly what ORACLE_IMAGE_PHASH computes in SQL."""
    import numpy as np

    m31 = 2147483648
    g, m = doc_id // PHASH_GROUP, doc_id % PHASH_GROUP
    k = (g * 8191 + 2999) % 100003
    i = np.arange(64, dtype=np.int64)
    s1 = ((k * 64 + i + 12345) % m31 * 1103515245 + 12345) % m31
    s2 = s1 ^ (s1 >> 16)
    s3 = (s2 * 65539 + 1013904223) % m31
    v = 20 + (s3 ^ (s3 >> 13)) % 199
    if m > 0:
        p = (k + 17 * m) % 64
        v = v.copy()
        v[p] = v[p] + 80 if v[p] < 120 else v[p] - 80
    return v.reshape(8, 8)


def dedup_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate image pairs (operators/phash.py): real
    64x64 BMP encode (mapInPandas) -> real decode + block-mean dHash
    (mapInPandas, numpy) -> banded LSH Hamming join (JVM bit ops).
    Returns (doc_a, doc_b, hamming <= 4). The reference has no image
    dedup; this is the multimodal-corpus operator the training-data
    ladder needs (same cheap-filter->exact-verify shape as MinHash/
    SimHash/edit-distance)."""
    from ..operators.multimodal import encode_bmp
    from ..operators.phash import dhash_media, hamming_near_pairs

    docs = t(spark, sf_dir, "documents").select("doc_id")

    def _encode(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            media = []
            for did in pdf["doc_id"]:
                cells = _phash_cells(int(did)).astype(np.uint8)
                px = np.repeat(np.repeat(cells, 8, 0), 8, 1)  # 64x64 gray
                buf = np.repeat(px[:, :, None], 3, 2)  # B=G=R
                media.append(encode_bmp(64, 64, buf.tobytes()))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": media})

    media = docs.repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(_encode, "doc_id long, media binary")
    hashes = dhash_media(media)
    # multi-probe posture (4x14-bit bands, r=1): same exact recall at
    # d=4 as 8x7-bit bands (pigeonhole: d < bands*(r+1)) but collision
    # candidates scale with the 2^14 bucket space instead of 2^7 —
    # measured ~19x faster at 10x docs (experiments/media_dedup_scale)
    pairs = hamming_near_pairs(
        hashes, max_distance=PHASH_MAXDIST, bands=4, probe_radius=1
    )
    return pairs.select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        "hamming",
    )


# The oracle recomputes each doc's 56-bit dHash analytically from the
# pixel formula (block means are exact: blocks are constant), then runs
# the SAME banded join — subquadratic on both engines, so amplified
# sweeps stay viable.
ORACLE_IMAGE_PHASH = f"""
WITH grid AS (SELECT r.range AS r, c.range AS c FROM range(8) r, range(8) c),
cells AS (
  SELECT d.doc_id, g.r, g.c, g.r * 8 + g.c AS i,
         ((d.doc_id // {PHASH_GROUP}) * 8191 + 2999) % 100003 AS k,
         d.doc_id % {PHASH_GROUP} AS m
  FROM documents d, grid g
),
{_PHASH_MIX_SQL},
vals AS (
  SELECT doc_id, r, c,
    CASE WHEN m > 0 AND i = (k + 17 * m) % 64 THEN
      CASE WHEN 20 + s4 % 199 < 120
           THEN 20 + s4 % 199 + 80 ELSE 20 + s4 % 199 - 80 END
    ELSE 20 + s4 % 199 END AS v
  FROM mixed
),
bits AS (
  SELECT a.doc_id, a.r * 7 + a.c AS bit_idx
  FROM vals a JOIN vals b
    ON b.doc_id = a.doc_id AND b.r = a.r AND b.c = a.c + 1
  WHERE a.c < 7 AND a.v > b.v
),
hashes AS (
  SELECT d.doc_id, COALESCE(SUM(1::BIGINT << bit_idx), 0) AS phash
  FROM documents d LEFT JOIN bits USING (doc_id)
  GROUP BY d.doc_id
),
bb AS (
  SELECT doc_id, phash, b.range AS band,
         (phash >> (b.range * 7)) & 127 AS band_val
  FROM hashes, range(8) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bb a JOIN bb b
    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(bit_count(xor(ha.phash, hb.phash)) AS BIGINT) AS hamming
FROM cand c
JOIN hashes ha ON ha.doc_id = c.doc_a
JOIN hashes hb ON hb.doc_id = c.doc_b
WHERE bit_count(xor(ha.phash, hb.phash)) <= {PHASH_MAXDIST}
"""


# ---- audio-fingerprint near-dup (round 9) ----
#
# Sibling of dedup_image_phash on the audio column: groups of 4
# consecutive doc_ids share one clip (57 constant-amplitude blocks of
# 32 mono PCM-16 samples, amplitudes from the same xorshift mixer with
# audio-lane salts); members 1-3 perturb one block's amplitude, moving
# the 56-bit energy-sign fingerprint by <= 4 bits. The Spark side
# encodes real RIFF/WAVE bytes, decodes them, and fingerprints the
# actual PCM (operators/audio_fp.py); candidates ride the SAME
# hamming_near_pairs operator the image lane uses. The oracle
# recomputes the expected fingerprints analytically (block energies
# are exact: blocks are constant) and replays the banded join.
AFP_GROUP = 4
AFP_MAXDIST = 4
AFP_BLOCK_SAMPLES = 32


def _afp_amplitudes(doc_id: int):
    """Shared analytic amplitude formula: 57 block amplitudes for one
    doc — numpy int64, exactly what ORACLE_AUDIO_FP computes in SQL."""
    import numpy as np

    m31 = 2147483648
    g, m = doc_id // AFP_GROUP, doc_id % AFP_GROUP
    k = (g * 7919 + 4241) % 100003
    j = np.arange(57, dtype=np.int64)
    s1 = ((k * 57 + j + 12345) % m31 * 1103515245 + 12345) % m31
    s2 = s1 ^ (s1 >> 16)
    s3 = (s2 * 65539 + 1013904223) % m31
    a = 100 + (s3 ^ (s3 >> 13)) % 19997
    if m > 0:
        p = (k + 13 * m) % 57
        a = a.copy()
        a[p] = a[p] + 5000 if a[p] < 12000 else a[p] - 5000
    return a


def dedup_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptually-near-duplicate audio pairs (operators/audio_fp.py):
    real RIFF/WAVE encode (mapInPandas) -> real PCM decode + block-
    energy sign fingerprint (mapInPandas, numpy) -> the image lane's
    banded LSH Hamming join. Returns (doc_a, doc_b, hamming <= 4)."""
    from ..operators.audio import encode_wav
    from ..operators.audio_fp import fingerprint_media
    from ..operators.phash import hamming_near_pairs

    docs = t(spark, sf_dir, "documents").select("doc_id")

    def _encode(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            media = []
            for did in pdf["doc_id"]:
                amps = _afp_amplitudes(int(did))
                pcm = np.repeat(amps, AFP_BLOCK_SAMPLES).astype("<i2")
                media.append(
                    encode_wav(len(pcm), 8000, pcm.tobytes())
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": media})

    media = docs.repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(_encode, "doc_id long, media binary")
    fps = fingerprint_media(media)
    # same multi-probe posture as the image lane (see there)
    pairs = hamming_near_pairs(
        fps, hash_col="afp", max_distance=AFP_MAXDIST,
        bands=4, probe_radius=1,
    )
    return pairs.select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        "hamming",
    )


def dedup_image_phash_resized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail-stability composition: the SAME corpus as
    ``dedup_image_phash`` encoded at 128x128 (16-px blocks), pushed
    through the REAL resize kernel (operators/multimodal.py:
    resize_media — decode, nearest-neighbor resample, re-encode) down
    to 64x64 thumbnails, then hashed and joined identically. Block
    structure makes the resample exact, so this lane carries the SAME
    ORACLE as the direct lane — the driver itself verifies that
    dedup survives the thumbnail pipeline bit-for-bit (the
    dedup_editdistance_collapsed two-plans-one-oracle precedent)."""
    from ..operators.multimodal import encode_bmp, resize_media
    from ..operators.phash import dhash_media, hamming_near_pairs

    docs = t(spark, sf_dir, "documents").select("doc_id")

    def _encode(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            media = []
            for did in pdf["doc_id"]:
                cells = _phash_cells(int(did)).astype(np.uint8)
                px = np.repeat(np.repeat(cells, 16, 0), 16, 1)  # 128x128
                buf = np.repeat(px[:, :, None], 3, 2)
                media.append(encode_bmp(128, 128, buf.tobytes()))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": media})

    media = docs.repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(_encode, "doc_id long, media binary")
    thumbs = resize_media(media, 64, 64)
    hashes = dhash_media(thumbs)
    pairs = hamming_near_pairs(
        hashes, max_distance=PHASH_MAXDIST, bands=4, probe_radius=1
    )
    return pairs.select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        "hamming",
    )


# ---- Fellegi-Sunter record linkage (round 9) ----
#
# Probe side = a dirty copy of every customer, built in-lane with the
# same deterministic arithmetic on both engines: one-char name
# substitution at position custkey%8+2 (trailing block-key chars
# intact), a synthesized phone (nation prefix + multiplicative-hash
# digits) whose last digit flips for even custkeys, +37-cent balance
# drift for custkey%5==0 — and every 7th probe is CORRUPTED
# (name -> 'zz'||reverse(name), phone last digit flipped) so the
# scoring gate, not just blocking, decides. Blocking recall is the
# standard complementary-keys design: (nation, name-suffix-4) catches
# every intact-suffix perturbation; phone-prefix-6 catches everything
# else including the corrupted probes, which then FAIL the score
# threshold (max 30 < 45) — while intended matches score >= 50 even
# when the phone disagrees.
FS_THRESHOLD = 45


def _fs_frames(spark: SparkSession, sf_dir: str):
    cust = t(spark, sf_dir, "customer")
    phone = F.concat(
        (F.col("c_nationkey") + 10).cast("string"),
        F.lit("-"),
        F.lpad(
            ((F.col("c_custkey") * 7919) % 10000000).cast("string"), 7, "0"
        ),
    )
    master = cust.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        phone.alias("phone"),
        F.col("c_nationkey").alias("nation"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("acct_cents"),
        F.col("c_mktsegment").alias("segment"),
    )
    p = (F.col("c_custkey") % 8 + 2).cast("int")
    dirty_name = F.concat(
        F.substring(F.col("c_name"), F.lit(1), p - 1),
        F.lit("x"),
        F.col("c_name").substr(p + 1, F.lit(64)),
    )
    corrupt = F.col("c_custkey") % 7 == 0
    flip_last = F.concat(
        F.substring(phone, F.lit(1), F.length(phone) - 1), F.lit("9")
    )
    probe = cust.select(
        F.col("c_custkey").alias("probe_id"),
        F.when(corrupt, F.concat(F.lit("zz"), F.reverse(F.col("c_name"))))
        .otherwise(dirty_name)
        .alias("name"),
        F.when(corrupt | (F.col("c_custkey") % 2 == 0), flip_last)
        .otherwise(phone)
        .alias("phone"),
        F.col("c_nationkey").alias("nation"),
        (
            F.round(F.col("c_acctbal") * 100, 0).cast("long")
            + F.when(F.col("c_custkey") % 5 == 0, F.lit(37)).otherwise(
                F.lit(0)
            )
        ).alias("acct_cents"),
        F.col("c_mktsegment").alias("segment"),
    )
    return probe, master


#: per-field (agree, disagree) integer weights of the hand-set lane
_FS_HAND_WEIGHTS = {
    "name": (40, -25),
    "phone": (30, -15),
    "acct": (15, -10),
    "seg": (10, -10),
}


def _fs_blocking():
    suffix4 = lambda col: F.substring(col, -4, 4)  # noqa: E731
    return [
        (
            F.concat(F.col("p_nation").cast("string"), F.lit("|"),
                     suffix4(F.col("p_name"))),
            F.concat(F.col("m_nation").cast("string"), F.lit("|"),
                     suffix4(F.col("m_name"))),
        ),
        (
            F.substring(F.col("p_phone"), 1, 6),
            F.substring(F.col("m_phone"), 1, 6),
        ),
    ]


def _fs_comparators(weights: dict):
    """The four field comparators with (agree, disagree) weight pairs
    taken from ``weights`` — shared by the hand-weighted, candidate,
    and EM-learned lanes so the evidence model can never drift."""
    from ..operators.linkage import Comparator

    agree = {
        "name": F.levenshtein(F.col("p_name"), F.col("m_name")) <= 1,
        "phone": F.col("p_phone") == F.col("m_phone"),
        "acct": F.abs(F.col("p_acct_cents") - F.col("m_acct_cents")) <= 100,
        "seg": F.col("p_segment") == F.col("m_segment"),
    }
    return [
        Comparator(f, agree[f], wa, wd) for f, (wa, wd) in weights.items()
    ]


def link_customer_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage
    (operators/linkage.py): dirty customer records against the master
    table — two complementary blocking passes, four integer-weighted
    field comparators (name edit distance <= 1, phone exact, balance
    within a dollar, same market segment), threshold gate. Returns
    (probe_id, custkey, score, per-field agree flags)."""
    from ..operators.linkage import fs_link

    probe, master = _fs_frames(spark, sf_dir)
    out = fs_link(
        probe,
        master,
        "probe_id",
        "custkey",
        blocking=_fs_blocking(),
        comparators=_fs_comparators(_FS_HAND_WEIGHTS),
        threshold=FS_THRESHOLD,
    )
    return out.select(
        "probe_id", "custkey", "score",
        "name_agree", "phone_agree", "acct_agree", "seg_agree",
    )


# master/probe/cand CTEs shared by the three linkage oracles (the
# hand-weighted lane, the best-match lane, and the EM-learned lane)
_FS_BASE_CTES = """master AS (
  SELECT c_custkey AS custkey, c_name AS name,
         CAST(c_nationkey + 10 AS VARCHAR) || '-' ||
           lpad(CAST((c_custkey * 7919) % 10000000 AS VARCHAR), 7, '0')
           AS phone,
         c_nationkey AS nation,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS acct_cents,
         c_mktsegment AS segment
  FROM customer
),
probe AS (
  SELECT c_custkey AS probe_id,
         CASE WHEN c_custkey % 7 = 0 THEN 'zz' || reverse(c_name)
              ELSE substring(c_name, 1, CAST(c_custkey % 8 + 1 AS INT))
                   || 'x'
                   || substring(c_name, CAST(c_custkey % 8 + 3 AS INT), 64)
         END AS name,
         CASE WHEN c_custkey % 7 = 0 OR c_custkey % 2 = 0
              THEN substring(ph, 1, length(ph) - 1) || '9'
              ELSE ph END AS phone,
         c_nationkey AS nation,
         CAST(round(c_acctbal * 100, 0) AS BIGINT)
           + CASE WHEN c_custkey % 5 = 0 THEN 37 ELSE 0 END AS acct_cents,
         c_mktsegment AS segment
  FROM (
    SELECT *, CAST(c_nationkey + 10 AS VARCHAR) || '-' ||
              lpad(CAST((c_custkey * 7919) % 10000000 AS VARCHAR), 7, '0')
              AS ph
    FROM customer
  )
),
cand AS (
  SELECT DISTINCT p.probe_id, m.custkey
  FROM probe p JOIN master m
    ON p.nation = m.nation
   AND substring(p.name, length(p.name) - 3, 4)
       = substring(m.name, length(m.name) - 3, 4)
  UNION
  SELECT DISTINCT p.probe_id, m.custkey
  FROM probe p JOIN master m
    ON substring(p.phone, 1, 6) = substring(m.phone, 1, 6)
)"""

ORACLE_FS_LINK = f"""
WITH {_FS_BASE_CTES},
scored AS (
  SELECT c.probe_id, c.custkey,
         (CASE WHEN levenshtein(p.name, m.name) <= 1 THEN 40 ELSE -25 END
        + CASE WHEN p.phone = m.phone THEN 30 ELSE -15 END
        + CASE WHEN abs(p.acct_cents - m.acct_cents) <= 100 THEN 15 ELSE -10 END
        + CASE WHEN p.segment = m.segment THEN 10 ELSE -10 END)::BIGINT
           AS score,
         levenshtein(p.name, m.name) <= 1 AS name_agree,
         p.phone = m.phone AS phone_agree,
         abs(p.acct_cents - m.acct_cents) <= 100 AS acct_agree,
         p.segment = m.segment AS seg_agree
  FROM cand c
  JOIN probe p ON p.probe_id = c.probe_id
  JOIN master m ON m.custkey = c.custkey
)
SELECT * FROM scored WHERE score >= {FS_THRESHOLD}
"""


def link_customer_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-to-one resolution of the linkage lane
    (operators/linkage.py:fs_best_match): each dirty probe keeps only
    its highest-scoring master (ties -> smallest custkey) — the
    assignment a downstream MERGE consumes. On the amplified corpus
    (replica masters sharing names) this provably picks the smallest
    replica per probe; at base scale it is the identity on the
    linkage lane's output."""
    from ..operators.linkage import fs_best_match

    linked = link_customer_records(spark, sf_dir)
    return fs_best_match(linked, "probe_id", "custkey")


ORACLE_FS_BEST = (
    ORACLE_FS_LINK
    + """
QUALIFY row_number() OVER (
  PARTITION BY probe_id ORDER BY score DESC, custkey ASC
) = 1
"""
)


# ---- clerical-review bands (round 12) ----
#
# Splink's three-band decision output (the Fellegi-Sunter 1969 §4
# decision rule itself: two thresholds partition pairs into
# link / possible-link / non-link): pairs scoring >= FS_THRESHOLD
# auto-accept as matches, pairs in [FS_CLERICAL_LOW, FS_THRESHOLD)
# route to human clerical review, anything below is a non-match and
# is dropped (never materialized — the band that matters for volume
# is the one you do NOT emit). link_band_purity is the QA extension:
# per-band ground-truth purity from the fixture's built-in identity
# truth, validating that the match band is near-pure and the clerical
# band is genuinely ambiguous. Scores are exact int64 (same algebra
# as link_customer_records); purity divides identical integers once.
FS_CLERICAL_LOW = 20


def link_clerical_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-S decision bands over the customer linkage candidates.
    Returns (probe_id, custkey, score, band) for pairs at or above
    the clerical floor; band in {match, clerical}."""
    from ..operators.linkage import fs_link

    probe, master = _fs_frames(spark, sf_dir)
    out = fs_link(
        probe,
        master,
        "probe_id",
        "custkey",
        blocking=_fs_blocking(),
        comparators=_fs_comparators(_FS_HAND_WEIGHTS),
        threshold=FS_CLERICAL_LOW,
    )
    band = F.when(
        F.col("score") >= FS_THRESHOLD, F.lit("match")
    ).otherwise(F.lit("clerical"))
    return out.select("probe_id", "custkey", "score", band.alias("band"))


def link_band_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band-purity QA (the link_eval_metrics pattern applied per
    band): pair count, ground-truth hits, purity ratio. Returns
    (band, n_pairs, n_true, purity)."""
    b = link_clerical_bands(spark, sf_dir)
    return (
        b.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(
                F.when(
                    F.col("probe_id") == F.col("custkey"), 1
                ).otherwise(0)
            ).alias("n_true"),
        )
        .select(
            "band", "n_pairs", "n_true",
            (F.col("n_true") / F.col("n_pairs") + F.lit(0.0)).alias(
                "purity"
            ),
        )
    )


# reuse the hand-weighted oracle's master/probe/cand/scored CTEs
# verbatim (the _census_oracle split pattern) — only the decision
# tail differs
_FS_SCORED_HEAD = ORACLE_FS_LINK.rsplit("SELECT * FROM scored", 1)[0]

ORACLE_FS_BANDS = f"""{_FS_SCORED_HEAD}
SELECT probe_id, custkey, score,
       CASE WHEN score >= {FS_THRESHOLD} THEN 'match'
            ELSE 'clerical' END AS band
FROM scored WHERE score >= {FS_CLERICAL_LOW}
"""

ORACLE_BAND_PURITY = f"""{_FS_SCORED_HEAD}
SELECT CASE WHEN score >= {FS_THRESHOLD} THEN 'match'
            ELSE 'clerical' END AS band,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(CASE WHEN probe_id = custkey THEN 1 ELSE 0 END)
            AS BIGINT) AS n_true,
       (CAST(sum(CASE WHEN probe_id = custkey THEN 1 ELSE 0 END)
             AS DOUBLE) / count(*)) + 0.0 AS purity
FROM scored WHERE score >= {FS_CLERICAL_LOW}
GROUP BY 1
"""


# ---- EM-learned linkage (round 10) ----
#
# Closes the learn -> score loop: the SAME blocked candidates feed
# fs_learn_weights (Winkler-EM, operators/linkage.py), the fitted m/u
# become integer log-odds weights (fs_int_weights), and fs_link
# re-scores with them — the full Splink workflow, oracle-checked
# end-to-end. Cross-engine determinism rides two rounding grids: every
# EM iteration rounds p/m/u to EM_DECIMALS via floor-half-up (float-sum
# drift ~1e-12 cannot compound — the k-means CENTROID_DECIMALS trick),
# and the final weights round at EM_SCALE with the same floor formula,
# so DuckDB replaying the identical iteration chain (generated CTEs,
# one E-step + one M-step per iteration — the IVF oracle pattern)
# lands on bit-identical integers. Threshold = half the max attainable
# score, derived from the learned weights on both engines.
EM_FIELDS = ["name", "phone", "acct", "seg"]
EM_ITERS = 5
EM_DECIMALS = 6
EM_SCALE = 10

_FS_EM_CACHE: dict[str, dict] = {}


def _fs_learned_int_weights(spark: SparkSession, sf_dir: str) -> dict:
    """EM fit over the blocked candidates, memoized per corpus (the
    fit is k-scalar MODEL STATE like the IVF centroids; each EM
    iteration is one map-side E-step + one partial-agg job)."""
    cached = _FS_EM_CACHE.get(sf_dir)
    if cached is not None:
        return cached
    from ..operators.linkage import fs_int_weights, fs_learn_weights, fs_link

    probe, master = _fs_frames(spark, sf_dir)
    cand = fs_link(
        probe,
        master,
        "probe_id",
        "custkey",
        blocking=_fs_blocking(),
        comparators=_fs_comparators({f: (1, -1) for f in EM_FIELDS}),
        threshold=-(10**9),  # permissive: every blocked pair, with flags
    )
    fit = fs_learn_weights(cand, EM_FIELDS, iters=EM_ITERS, decimals=EM_DECIMALS)
    iw = fs_int_weights(fit, scale=EM_SCALE)
    _FS_EM_CACHE[sf_dir] = iw
    return iw


def link_customer_learned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linkage with EM-LEARNED weights (operators/linkage.py:
    fs_learn_weights -> fs_int_weights -> fs_link): unsupervised fit
    on the blocked candidate pairs, integer log-odds weights, re-score,
    threshold at half the maximum attainable score. Returns
    (probe_id, custkey, score)."""
    from ..operators.linkage import fs_link

    iw = _fs_learned_int_weights(spark, sf_dir)
    weights = {
        f: (iw["w_agree"][f], iw["w_disagree"][f]) for f in EM_FIELDS
    }
    thr = sum(iw["w_agree"].values()) // 2
    probe, master = _fs_frames(spark, sf_dir)
    out = fs_link(
        probe,
        master,
        "probe_id",
        "custkey",
        blocking=_fs_blocking(),
        comparators=_fs_comparators(weights),
        threshold=thr,
    )
    return out.select("probe_id", "custkey", "score")


def _oracle_fs_learned() -> str:
    """DuckDB twin of the learn -> score loop: the shared
    master/probe/cand CTEs, a flags CTE, then EM_ITERS generated
    (E-step, M-step) CTE pairs with the same clamp+round grid as
    fs_learn_weights, the same floor-half-up integer weights, and the
    same derived threshold."""
    agree = {
        "name": "levenshtein(p.name, m.name) <= 1",
        "phone": "p.phone = m.phone",
        "acct": "abs(p.acct_cents - m.acct_cents) <= 100",
        "seg": "p.segment = m.segment",
    }
    rnd = lambda x: (  # noqa: E731
        f"floor(({x}) * 1000000.0 + 0.5) / 1000000.0"
    )
    clamp = lambda x: f"least(greatest({x}, 1e-6), 1.0 - 1e-6)"  # noqa: E731
    parts = [
        _FS_BASE_CTES,
        "flags AS (\n  SELECT c.probe_id, c.custkey,\n"
        + ",\n".join(
            f"         ({agree[f]}) AS {f}_agree" for f in EM_FIELDS
        )
        + "\n  FROM cand c\n  JOIN probe p ON p.probe_id = c.probe_id\n"
        "  JOIN master m ON m.custkey = c.custkey\n)",
        "par0 AS (SELECT CAST(0.1 AS DOUBLE) AS p, "
        + ", ".join(
            f"CAST(0.9 AS DOUBLE) AS m_{f}, CAST(0.1 AS DOUBLE) AS u_{f}"
            for f in EM_FIELDS
        )
        + ")",
    ]
    for i in range(1, EM_ITERS + 1):
        lm = " + ".join(
            f"CASE WHEN f.{f}_agree THEN ln(par.m_{f}) "
            f"ELSE ln(1.0 - par.m_{f}) END"
            for f in EM_FIELDS
        )
        lu = " + ".join(
            f"CASE WHEN f.{f}_agree THEN ln(par.u_{f}) "
            f"ELSE ln(1.0 - par.u_{f}) END"
            for f in EM_FIELDS
        )
        parts.append(
            f"""e{i} AS (
  SELECT f.*, 1.0 / (1.0 + exp(
      (ln(1.0 - par.p) + {lu}) - (ln(par.p) + {lm}))) AS w
  FROM flags f, par{i - 1} par
)"""
        )
        sums = ", ".join(
            f"sum(CASE WHEN {f}_agree THEN w ELSE 0.0 END) AS mw_{f}, "
            f"sum(CASE WHEN {f}_agree THEN 1.0 - w ELSE 0.0 END) AS uw_{f}"
            for f in EM_FIELDS
        )
        parts.append(
            f"s{i} AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(w) AS sw,"
            f" {sums} FROM e{i})"
        )
        upd = ", ".join(
            f"{rnd(clamp(f'mw_{f} / swc'))} AS m_{f}, "
            f"{rnd(clamp(f'uw_{f} / (n - swc)'))} AS u_{f}"
            for f in EM_FIELDS
        )
        parts.append(
            f"par{i} AS (SELECT {rnd(clamp('swc / n'))} AS p, {upd} "
            f"FROM (SELECT *, least(greatest(sw, 1e-6), n - 1e-6) AS swc "
            f"FROM s{i}))"
        )
    wts = ", ".join(
        f"CAST(floor(log2(m_{f} / u_{f}) * {EM_SCALE} + 0.5) AS BIGINT)"
        f" AS wa_{f}, "
        f"CAST(floor(log2((1.0 - m_{f}) / (1.0 - u_{f})) * {EM_SCALE}"
        f" + 0.5) AS BIGINT) AS wd_{f}"
        for f in EM_FIELDS
    )
    parts.append(f"wts AS (SELECT {wts} FROM par{EM_ITERS})")
    total = " + ".join(f"wa_{f}" for f in EM_FIELDS)
    score = " + ".join(
        f"CASE WHEN f.{f}_agree THEN w.wa_{f} ELSE w.wd_{f} END"
        for f in EM_FIELDS
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT probe_id, custkey, score FROM (
  SELECT f.probe_id, f.custkey, CAST({score} AS BIGINT) AS score
  FROM flags f, wts w
)
WHERE score >= (SELECT CAST(floor(({total}) / 2.0) AS BIGINT) FROM wts)
"""
    )


ORACLE_FS_LEARNED = _oracle_fs_learned()


# ---- Jaro-Winkler comparator linkage (round 10) ----
#
# The comparator LADDER's missing rung: exact equality and
# edit-distance <= 1 (the records lane) bracket Jaro-Winkler — the
# Census-Bureau/Splink DEFAULT name comparator (Winkler 1990). The
# kernel (operators/strsim.py) matches DuckDB's
# jaro_winkler_similarity bit-for-bit (fuzz-pinned over 20k cases),
# and per-pair JW is a fixed sequential formula — no order-dependent
# float accumulation — so the threshold comparison needs no rounding
# grid. Threshold 0.95 probed at all 3 SFs: min |jw - 0.95| over every
# candidate pair = 1.852e-3 (lattice-adjacent value), >= 10^9 x any
# conceivable cross-engine drift. The UDF runs on blocked CANDIDATES
# only (never generation) — the documented Arrow seam where a
# deployment swaps in rapidfuzz.
JW_THRESHOLD = 0.95


def link_customer_jw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linkage with a Jaro-Winkler name comparator
    (operators/strsim.py:jaro_winkler_col >= 0.95) in place of the
    records lane's edit-distance comparator — same blocking, same
    hand weights, same threshold gate. Returns (probe_id, custkey,
    score, per-field agree flags)."""
    from ..operators.linkage import Comparator, fs_link
    from ..operators.strsim import jaro_winkler_col

    probe, master = _fs_frames(spark, sf_dir)
    comparators = [
        Comparator(
            "name",
            jaro_winkler_col(F.col("p_name"), F.col("m_name"))
            >= JW_THRESHOLD,
            *_FS_HAND_WEIGHTS["name"],
        ),
    ] + _fs_comparators(
        {f: w for f, w in _FS_HAND_WEIGHTS.items() if f != "name"}
    )
    out = fs_link(
        probe,
        master,
        "probe_id",
        "custkey",
        blocking=_fs_blocking(),
        comparators=comparators,
        threshold=FS_THRESHOLD,
    )
    return out.select(
        "probe_id", "custkey", "score",
        "name_agree", "phone_agree", "acct_agree", "seg_agree",
    )


ORACLE_FS_JW = f"""
WITH {_FS_BASE_CTES},
scored AS (
  SELECT c.probe_id, c.custkey,
         (CASE WHEN jaro_winkler_similarity(p.name, m.name)
                    >= {JW_THRESHOLD} THEN 40 ELSE -25 END
        + CASE WHEN p.phone = m.phone THEN 30 ELSE -15 END
        + CASE WHEN abs(p.acct_cents - m.acct_cents) <= 100 THEN 15 ELSE -10 END
        + CASE WHEN p.segment = m.segment THEN 10 ELSE -10 END)::BIGINT
           AS score,
         jaro_winkler_similarity(p.name, m.name) >= {JW_THRESHOLD}
           AS name_agree,
         p.phone = m.phone AS phone_agree,
         abs(p.acct_cents - m.acct_cents) <= 100 AS acct_agree,
         p.segment = m.segment AS seg_agree
  FROM cand c
  JOIN probe p ON p.probe_id = c.probe_id
  JOIN master m ON m.custkey = c.custkey
)
SELECT * FROM scored WHERE score >= {FS_THRESHOLD}
"""


# ---- robust MAD outliers (round 9) ----
MAD_K = 3
MAD_MIN_GROUP = 5


def stats_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order-price anomalies via median/MAD
    (operators/robust.py) — the robust data-quality monitor: flag
    orders whose price deviates from the customer's DISCRETE median by
    more than 3x the customer's MAD, integer-cent exact on both
    engines (percentile_disc semantics, no interpolation)."""
    from ..operators.robust import mad_outliers

    orders = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    return mad_outliers(
        orders, "custkey", "cents", "orderkey", k=MAD_K,
        min_group=MAD_MIN_GROUP,
    )


ORACLE_MAD_OUTLIERS = f"""
WITH base AS (
  SELECT o_custkey AS custkey, o_orderkey AS orderkey,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
),
g AS (
  SELECT custkey,
         percentile_disc(0.5) WITHIN GROUP (ORDER BY cents) AS med
  FROM base GROUP BY custkey
  HAVING count(*) >= {MAD_MIN_GROUP}
),
d AS (
  SELECT b.custkey, b.orderkey, b.cents, g.med,
         abs(b.cents - g.med) AS abs_dev
  FROM base b JOIN g USING (custkey)
),
m AS (
  SELECT custkey,
         percentile_disc(0.5) WITHIN GROUP (ORDER BY abs_dev) AS mad
  FROM d GROUP BY custkey
)
SELECT d.custkey, d.orderkey, d.cents, d.med, m.mad, d.abs_dev
FROM d JOIN m USING (custkey)
WHERE d.abs_dev > {MAD_K} * m.mad
"""


# ---- approx-MAD rank contract (round 10) ----
#
# The warehouse-scale posture of the MAD lane
# (operators/robust.py:mad_outliers_approx): percentile_approx per
# group — one partial-agg pass, NO window-rank shuffle (plan-pinned in
# tests/test_robust.py). Sketch VALUES are partition-order dependent,
# so like the CM/HLL/quantile lanes this emits the DETERMINISTIC
# rank-envelope contract instead: the returned med/mad must be actual
# group elements whose rank range intersects target ± ceil(n/accuracy)
# (+1 absorbs the engine's target-rank convention) — the
# Greenwald–Khanna worst-case theorem, true for ANY partitioning, so
# the hard-TRUE oracle is sound by theorem, not by fixture. Groups =
# order priorities (5 groups of n/5 rows — big enough that the sketch
# actually compresses at sf0.1, unlike per-customer groups).
MAD_APPROX_ACC = 100


def stats_mad_approx_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.robust import mad_outliers_approx  # noqa: F401  (doc link)

    acc = MAD_APPROX_ACC
    base = t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    med = base.groupBy("prio").agg(
        F.percentile_approx("cents", F.lit(0.5), F.lit(acc)).alias("med"),
        F.count(F.lit(1)).alias("n"),
    )

    def rank_ok(le, lt, n):
        target = F.ceil(n / 2)
        tol = F.ceil(n / acc) + 1
        return (
            (le >= target - tol) & (lt + 1 <= target + tol) & (le > lt)
        )

    dev = base.join(F.broadcast(med), "prio")
    med_stats = dev.groupBy("prio", "n").agg(
        F.sum((F.col("cents") <= F.col("med")).cast("long")).alias("le"),
        F.sum((F.col("cents") < F.col("med")).cast("long")).alias("lt"),
    )
    devs = dev.select(
        "prio", F.abs(F.col("cents") - F.col("med")).alias("ad")
    )
    mad = devs.groupBy("prio").agg(
        F.percentile_approx("ad", F.lit(0.5), F.lit(acc)).alias("mad")
    )
    mad_stats = (
        devs.join(F.broadcast(mad), "prio")
        .groupBy("prio")
        .agg(
            F.sum((F.col("ad") <= F.col("mad")).cast("long")).alias("le"),
            F.sum((F.col("ad") < F.col("mad")).cast("long")).alias("lt"),
        )
    )
    m_ok = med_stats.select(
        "prio",
        rank_ok(F.col("le"), F.col("lt"), F.col("n")).alias("med_rank_ok"),
    )
    d_ok = mad_stats.join(
        med_stats.select("prio", "n"), "prio"
    ).select(
        "prio",
        rank_ok(F.col("le"), F.col("lt"), F.col("n")).alias("mad_rank_ok"),
    )
    return m_ok.join(d_ok, "prio").select("prio", "med_rank_ok", "mad_rank_ok")


ORACLE_MAD_APPROX = """
SELECT DISTINCT o_orderpriority AS prio,
       TRUE AS med_rank_ok, TRUE AS mad_rank_ok
FROM orders
"""


# ---- video clip near-dup (round 9) ----
#
# Completes the media-dedup triad on the video column: groups of 4
# consecutive doc_ids share one 6-frame animated GIF89a clip (32x32,
# 8x8 grid of 4x4 blocks, luminances on the WEB-SAFE 6-level grid so
# the GIF palette quantization is exactly the identity and the oracle
# stays analytic); member m scrambles its first m frames entirely
# (distinct salts — the re-edit scenario), so temporally-aligned
# matching-frame counts are 6-max(m1,m2) by construction: rep-member
# pairs score 5/4/3, member-member 4/3/3, and the min_frames=4 gate
# keeps exactly 3 pairs per family (planted hist: 125x5, 250x4 at
# sf0.01). The Spark side really encodes/decodes the animated GIF
# (LZW both directions) and hashes actual composited frames; the
# oracle recomputes frame hashes analytically and replays the same
# frame-keyed multi-probe banded join.
VIDEO_FRAMES = 6
VIDEO_MIN_FRAMES = 4
VIDEO_FRAME_DIST = 4


def _video_levels(doc_id: int, frame: int):
    """Shared analytic 6-level luminance formula for one frame."""
    import numpy as np

    m31 = 2147483648
    g, m = doc_id // PHASH_GROUP, doc_id % PHASH_GROUP
    k = (g * 5407 + 7573) % 100003
    i = np.arange(64, dtype=np.int64)
    if m > 0 and frame < m:
        x = k * 1536 + m * 100000000 + frame * 256 + i
    else:
        x = k * 1536 + frame * 256 + i
    s1 = ((x + 12345) % m31 * 1103515245 + 12345) % m31
    s2 = s1 ^ (s1 >> 16)
    s3 = (s2 * 65539 + 1013904223) % m31
    return (s3 ^ (s3 >> 13)) % 6


def dedup_video_clips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate video clips (operators/video_fp.py): real
    animated-GIF encode (mapInPandas, LZW) -> real frame decode +
    per-frame dHash -> temporally-aligned multi-probe Hamming join ->
    matching-frame count gate. Returns (doc_a, doc_b,
    matching_frames >= 4 of 6)."""
    from ..operators.gif import encode_gif_animation
    from ..operators.video_fp import clip_near_pairs, frame_hashes

    docs = t(spark, sf_dir, "documents").select("doc_id")

    def _encode(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            media = []
            for did in pdf["doc_id"]:
                frames = []
                for f in range(VIDEO_FRAMES):
                    cells = (51 * _video_levels(int(did), f)).astype(
                        np.uint8
                    ).reshape(8, 8)
                    px = np.repeat(np.repeat(cells, 4, 0), 4, 1)
                    frames.append(
                        np.repeat(px[:, :, None], 3, 2).tobytes()
                    )
                media.append(encode_gif_animation(frames, 32, 32))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": media})

    media = docs.repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(_encode, "doc_id long, media binary")
    fh = frame_hashes(media)
    pairs = clip_near_pairs(
        fh,
        frame_distance=VIDEO_FRAME_DIST,
        min_frames=VIDEO_MIN_FRAMES,
        bands=4,
        probe_radius=1,
    )
    return pairs.select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        "matching_frames",
    )


_VID_FLIPS = ", ".join(str(1 << j) for j in range(14))
ORACLE_VIDEO_CLIPS = f"""
WITH fr AS (SELECT range AS f FROM range({VIDEO_FRAMES})),
grid AS (SELECT r.range AS r, c.range AS c FROM range(8) r, range(8) c),
cells AS (
  SELECT d.doc_id, fr.f, g.r, g.c, g.r * 8 + g.c AS i,
         ((d.doc_id // {PHASH_GROUP}) * 5407 + 7573) % 100003 AS k,
         d.doc_id % {PHASH_GROUP} AS m
  FROM documents d, fr, grid g
),
args AS (
  SELECT *, CASE WHEN m > 0 AND f < m
                 THEN k * 1536 + m * 100000000 + f * 256 + i
                 ELSE k * 1536 + f * 256 + i END AS x
  FROM cells
),
mix1 AS (
  SELECT *, ((x + 12345) % 2147483648 * 1103515245 + 12345)
            % 2147483648 AS s1
  FROM args
),
mix2 AS (SELECT *, xor(s1, s1 >> 16) AS s2 FROM mix1),
mix3 AS (SELECT *, (s2 * 65539 + 1013904223) % 2147483648 AS s3 FROM mix2),
vals AS (
  SELECT doc_id, f, r, c, 51 * (xor(s3, s3 >> 13) % 6) AS v FROM mix3
),
bits AS (
  SELECT a.doc_id, a.f, a.r * 7 + a.c AS bit_idx
  FROM vals a JOIN vals b
    ON b.doc_id = a.doc_id AND b.f = a.f AND b.r = a.r AND b.c = a.c + 1
  WHERE a.c < 7 AND a.v > b.v
),
base AS (SELECT d.doc_id, fr.f FROM documents d, fr),
hashes AS (
  SELECT base.doc_id, base.f,
         COALESCE(SUM(1::BIGINT << bit_idx), 0) AS fhash
  FROM base LEFT JOIN bits
    ON bits.doc_id = base.doc_id AND bits.f = base.f
  GROUP BY base.doc_id, base.f
),
bb AS (
  SELECT doc_id, f, fhash, b.range AS band,
         (fhash >> (b.range * 14)) & 16383 AS band_val
  FROM hashes, range(4) b
),
pr AS (
  SELECT doc_id, f, band, xor(band_val, fl) AS band_val
  FROM bb, unnest([0, {_VID_FLIPS}]) AS t(fl)
),
cand AS (
  SELECT DISTINCT x.f, least(x.doc_id, y.doc_id) AS doc_a,
                  greatest(x.doc_id, y.doc_id) AS doc_b
  FROM pr x JOIN bb y
    ON x.f = y.f AND x.band = y.band AND x.band_val = y.band_val
   AND x.doc_id <> y.doc_id
),
matched AS (
  SELECT c.doc_a, c.doc_b, c.f
  FROM cand c
  JOIN hashes a ON a.doc_id = c.doc_a AND a.f = c.f
  JOIN hashes b ON b.doc_id = c.doc_b AND b.f = c.f
  WHERE bit_count(xor(a.fhash, b.fhash)) <= {VIDEO_FRAME_DIST}
)
SELECT doc_a, doc_b, COUNT(*) AS matching_frames
FROM matched
GROUP BY doc_a, doc_b
HAVING COUNT(*) >= {VIDEO_MIN_FRAMES}
"""


# ---- 240-bit wide-hash image near-dup (round 9) ----
#
# The billion-image posture measured in experiments/media_dedup_scale:
# past ~10^5 docs any 56-bit banding drowns in same-bucket collision
# mass, so the wide variant hashes a 16x16 grid into 240 bits packed
# as 4x60-bit words — 8x30-bit bands + radius-1 probing guarantee
# d <= 15 recall with 2^30 bucket space (zero background collisions:
# the bucket census on this corpus maxes at the family size). Same
# group-of-4 corpus construction, wide-lane salts.
PHASH_WIDE_MAXDIST = 15


def _phash_wide_cells(doc_id: int):
    """16x16 block luminances — the wide lane's analytic formula."""
    import numpy as np

    m31 = 2147483648
    g, m = doc_id // PHASH_GROUP, doc_id % PHASH_GROUP
    k = (g * 6991 + 5557) % 100003
    i = np.arange(256, dtype=np.int64)
    s1 = ((k * 256 + i + 12345) % m31 * 1103515245 + 12345) % m31
    s2 = s1 ^ (s1 >> 16)
    s3 = (s2 * 65539 + 1013904223) % m31
    v = 20 + (s3 ^ (s3 >> 13)) % 199
    if m > 0:
        p = (k + 29 * m) % 256
        v = v.copy()
        v[p] = v[p] + 80 if v[p] < 120 else v[p] - 80
    return v.reshape(16, 16)


def dedup_image_phash_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """240-bit wide-hash image near-dup (operators/phash.py:
    dhash_media_wide + hamming_near_pairs_wide): real 64x64 BMPs on a
    16x16 grid, 4x60-bit word hashes, 8x30-bit bands with radius-1
    multi-probe, sum-of-bit_count verify. Runs the 100 TB posture
    DECLARED (round-10 verdict item 1): probe_prefilter="broadcast"
    semi-joins each probed band variant against the distinct index
    bucket set before the candidate shuffle — recall-LOSSLESS (it only
    drops variants that cannot join; output identity pinned in
    tests/test_phash.py), so the oracle is unchanged and the posture
    now rides the correctness gate instead of living only in
    experiments. Returns (doc_a, doc_b, hamming <= 15)."""
    from ..operators.multimodal import encode_bmp
    from ..operators.phash import dhash_media_wide, hamming_near_pairs_wide

    docs = t(spark, sf_dir, "documents").select("doc_id")

    def _encode(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            media = []
            for did in pdf["doc_id"]:
                cells = _phash_wide_cells(int(did)).astype(np.uint8)
                px = np.repeat(np.repeat(cells, 4, 0), 4, 1)  # 64x64 gray
                buf = np.repeat(px[:, :, None], 3, 2)
                media.append(encode_bmp(64, 64, buf.tobytes()))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": media})

    media = docs.repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(_encode, "doc_id long, media binary")
    hashes = dhash_media_wide(media)
    pairs = hamming_near_pairs_wide(
        hashes,
        max_distance=PHASH_WIDE_MAXDIST,
        probe_radius=1,
        probe_prefilter="broadcast",
    )
    return pairs.select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        "hamming",
    )


def dedup_image_phash_wide_bloom(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The BILLION-IMAGE posture of the wide lane: probe_prefilter=
    "bloom" — a k=1 Bloom word table over the index bucket set
    (broadcast as sparse int64 words) probed map-side, for when even
    the distinct bucket set outgrows the exact broadcast. False
    positives only re-admit fan rows the join then drops, never a
    false negative — recall-LOSSLESS, so the oracle is the identical
    ORACLE_IMAGE_PHASH_WIDE."""
    from ..operators.multimodal import encode_bmp
    from ..operators.phash import dhash_media_wide, hamming_near_pairs_wide

    docs = t(spark, sf_dir, "documents").select("doc_id")

    def _encode(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            media = []
            for did in pdf["doc_id"]:
                cells = _phash_wide_cells(int(did)).astype(np.uint8)
                px = np.repeat(np.repeat(cells, 4, 0), 4, 1)
                buf = np.repeat(px[:, :, None], 3, 2)
                media.append(encode_bmp(64, 64, buf.tobytes()))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": media})

    media = docs.repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(_encode, "doc_id long, media binary")
    hashes = dhash_media_wide(media)
    pairs = hamming_near_pairs_wide(
        hashes,
        max_distance=PHASH_WIDE_MAXDIST,
        probe_radius=1,
        probe_prefilter="bloom",
    )
    return pairs.select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        "hamming",
    )


# The oracle packs the same 240 analytic bits into 4 words and replays
# the multi-probe banded join (31 variants per 30-bit band — same
# pigeonhole contract, so both engines are exact at d <= 15).
_WIDE_FLIPS = ", ".join(str(1 << j) for j in range(30))
ORACLE_IMAGE_PHASH_WIDE = f"""
WITH grid AS (SELECT r.range AS r, c.range AS c FROM range(16) r, range(16) c),
cells AS (
  SELECT d.doc_id, g.r, g.c, g.r * 16 + g.c AS i,
         ((d.doc_id // {PHASH_GROUP}) * 6991 + 5557) % 100003 AS k,
         d.doc_id % {PHASH_GROUP} AS m
  FROM documents d, grid g
),
mix1 AS (
  SELECT *, ((k * 256 + i + 12345) % 2147483648 * 1103515245 + 12345)
            % 2147483648 AS s1
  FROM cells
),
mix2 AS (SELECT *, xor(s1, s1 >> 16) AS s2 FROM mix1),
mix3 AS (SELECT *, (s2 * 65539 + 1013904223) % 2147483648 AS s3 FROM mix2),
mixed AS (SELECT doc_id, r, c, i, k, m, xor(s3, s3 >> 13) AS s4 FROM mix3),
vals AS (
  SELECT doc_id, r, c,
    CASE WHEN m > 0 AND i = (k + 29 * m) % 256 THEN
      CASE WHEN 20 + s4 % 199 < 120
           THEN 20 + s4 % 199 + 80 ELSE 20 + s4 % 199 - 80 END
    ELSE 20 + s4 % 199 END AS v
  FROM mixed
),
bits AS (
  SELECT a.doc_id, a.r * 15 + a.c AS bit_idx
  FROM vals a JOIN vals b
    ON b.doc_id = a.doc_id AND b.r = a.r AND b.c = a.c + 1
  WHERE a.c < 15 AND a.v > b.v
),
hashes AS (
  SELECT d.doc_id,
    COALESCE(SUM(CASE WHEN bit_idx // 60 = 0
                      THEN 1::BIGINT << (bit_idx % 60) END), 0) AS w0,
    COALESCE(SUM(CASE WHEN bit_idx // 60 = 1
                      THEN 1::BIGINT << (bit_idx % 60) END), 0) AS w1,
    COALESCE(SUM(CASE WHEN bit_idx // 60 = 2
                      THEN 1::BIGINT << (bit_idx % 60) END), 0) AS w2,
    COALESCE(SUM(CASE WHEN bit_idx // 60 = 3
                      THEN 1::BIGINT << (bit_idx % 60) END), 0) AS w3
  FROM documents d LEFT JOIN bits USING (doc_id)
  GROUP BY d.doc_id
),
bb AS (
  SELECT doc_id, b.range AS band,
         (CASE b.range // 2 WHEN 0 THEN w0 WHEN 1 THEN w1
                            WHEN 2 THEN w2 ELSE w3 END
          >> (30 * (b.range % 2))) & 1073741823 AS band_val
  FROM hashes, range(8) b
),
pr AS (
  SELECT doc_id, band, xor(band_val, f) AS band_val
  FROM bb, unnest([0, {_WIDE_FLIPS}]) AS t(f)
),
cand AS (
  SELECT DISTINCT least(x.doc_id, y.doc_id) AS doc_a,
                  greatest(x.doc_id, y.doc_id) AS doc_b
  FROM pr x JOIN bb y
    ON x.band = y.band AND x.band_val = y.band_val
   AND x.doc_id <> y.doc_id
)
SELECT c.doc_a, c.doc_b,
       (CAST(bit_count(xor(a.w0, b.w0)) AS BIGINT)
      + CAST(bit_count(xor(a.w1, b.w1)) AS BIGINT)
      + CAST(bit_count(xor(a.w2, b.w2)) AS BIGINT)
      + CAST(bit_count(xor(a.w3, b.w3)) AS BIGINT)) AS hamming
FROM cand c
JOIN hashes a ON a.doc_id = c.doc_a
JOIN hashes b ON b.doc_id = c.doc_b
WHERE CAST(bit_count(xor(a.w0, b.w0)) AS BIGINT)
    + CAST(bit_count(xor(a.w1, b.w1)) AS BIGINT)
    + CAST(bit_count(xor(a.w2, b.w2)) AS BIGINT)
    + CAST(bit_count(xor(a.w3, b.w3)) AS BIGINT)
   <= {PHASH_WIDE_MAXDIST}
"""


ORACLE_AUDIO_FP = f"""
WITH grid AS (SELECT range AS j FROM range(57)),
cells AS (
  SELECT d.doc_id, g.j,
         ((d.doc_id // {AFP_GROUP}) * 7919 + 4241) % 100003 AS k,
         d.doc_id % {AFP_GROUP} AS m
  FROM documents d, grid g
),
mix1 AS (
  SELECT *, ((k * 57 + j + 12345) % 2147483648 * 1103515245 + 12345)
            % 2147483648 AS s1
  FROM cells
),
mix2 AS (SELECT *, xor(s1, s1 >> 16) AS s2 FROM mix1),
mix3 AS (SELECT *, (s2 * 65539 + 1013904223) % 2147483648 AS s3 FROM mix2),
mixed AS (
  SELECT doc_id, j, k, m, 100 + xor(s3, s3 >> 13) % 19997 AS a0 FROM mix3
),
vals AS (
  SELECT doc_id, j,
    CASE WHEN m > 0 AND j = (k + 13 * m) % 57 THEN
      CASE WHEN a0 < 12000 THEN a0 + 5000 ELSE a0 - 5000 END
    ELSE a0 END AS a
  FROM mixed
),
bits AS (
  SELECT x.doc_id, x.j AS bit_idx
  FROM vals x JOIN vals y ON y.doc_id = x.doc_id AND y.j = x.j + 1
  WHERE x.j < 56 AND x.a * x.a > y.a * y.a
),
hashes AS (
  SELECT d.doc_id, COALESCE(SUM(1::BIGINT << bit_idx), 0) AS afp
  FROM documents d LEFT JOIN bits USING (doc_id)
  GROUP BY d.doc_id
),
bb AS (
  SELECT doc_id, afp, b.range AS band,
         (afp >> (b.range * 7)) & 127 AS band_val
  FROM hashes, range(8) b
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bb x JOIN bb y
    ON x.band = y.band AND x.band_val = y.band_val AND x.doc_id < y.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(bit_count(xor(ha.afp, hb.afp)) AS BIGINT) AS hamming
FROM cand c
JOIN hashes ha ON ha.doc_id = c.doc_a
JOIN hashes hb ON hb.doc_id = c.doc_b
WHERE bit_count(xor(ha.afp, hb.afp)) <= {AFP_MAXDIST}
"""


# ---- product-quantized ADC search (round 10) ----
#
# The compressed-scan rung of the vector ladder (operators/pq.py —
# FAISS's IVF-PQ design re-expressed Spark-first): codebooks are
# learned on a bounded ORDER-BY-id sample with deterministic Lloyd
# iterations (M-step means rounded half-away-from-zero on the
# PQ_DECIMALS grid, exactly the IVF quantizer's cross-engine landing
# convention), the corpus is encoded to PQ_M-byte codes map-side, and
# the query scans CODES (m bytes/row, ~64x less I/O than full
# vectors) through an ADC lookup table. The oracle re-derives the
# ENTIRE pipeline relationally — per-subspace Lloyd chain, encode
# argmin, ADC sum — the same house pattern as the IVF k-means CTEs.
PQ_M = 8
PQ_K = 16
PQ_ITERS = 2
PQ_SAMPLE_N = 256
PQ_DECIMALS = 6
PQ_TOPK = 10

_PQ_CACHE: dict[str, object] = {}


def _pq_model(spark: SparkSession, sf_dir: str):
    """Memoized deterministic PQ fit per corpus (the build/query split:
    codebooks are O(m*k*dsub) MODEL STATE, exactly like the IVF
    centroids)."""
    model = _PQ_CACHE.get(sf_dir)
    if model is None:
        from ..operators.pq import fit_pq

        model = fit_pq(
            _embeddings(spark, sf_dir),
            m=PQ_M,
            k=PQ_K,
            iters=PQ_ITERS,
            sample_n=PQ_SAMPLE_N,
            decimals=PQ_DECIMALS,
        )
        _PQ_CACHE[sf_dir] = model
    return model


def vector_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-k (operators/pq.py): fit codebooks
    on the lowest-{PQ_SAMPLE_N} vec_ids, encode every other vector to
    {PQ_M} one-byte codes (mapInPandas sub-GEMM, map-side only), then
    scan the CODES with the query's ADC lookup table — squared-L2 on
    unit vectors, distances rounded to 4 places before the top-k cut
    so summation-order drift can't move the k boundary. Returns
    (vec_id, adc_dist) ascending."""
    from .vector import QUERY_VEC_ID
    from ..operators.pq import encode_pq, pq_topk

    emb = _embeddings(spark, sf_dir)
    model = _pq_model(spark, sf_dir)
    codes = encode_pq(emb.filter(F.col("vec_id") != QUERY_VEC_ID), model)
    q = _query_vector(sf_dir, QUERY_VEC_ID)
    return pq_topk(codes, model, q, top_k=PQ_TOPK, decimals=4)


def _pq_oracle(
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = PQ_ITERS,
    dsub: int = 64 // PQ_M,
) -> str:
    """SQL twin of fit_pq + encode_pq + pq_topk, GENERATED for any
    Lloyd iteration count (the _ivf_assign_ctes pattern): unit-
    normalize, slice into subspaces, seed c0 from the first k sample
    rows per subspace, run `iters` (assign, rounded-mean) CTE pairs
    with empty slots KEEPING their previous centroid (fit_pq's
    convention — unlike the IVF chain, where empty cells drop), then
    encode the full corpus under the final codebooks and scan with the
    relational ADC sum."""
    from .vector import QUERY_VEC_ID

    d2 = (
        "list_dot_product(c.cv, c.cv)"
        " - 2 * list_dot_product(p.sv, c.cv)"
    )
    parts = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        """u AS (
  SELECT vec_id,
         list_transform(v, x -> x / (CASE WHEN sqrt(list_dot_product(v, v)) = 0
                                          THEN 1.0
                                          ELSE sqrt(list_dot_product(v, v)) END)) AS uv
  FROM e
)""",
        f"""sub AS (
  SELECT u.vec_id, g.s AS s,
         list_slice(u.uv, g.s * {dsub} + 1, (g.s + 1) * {dsub}) AS sv
  FROM u, unnest(generate_series(0, {m - 1})) AS g(s)
)""",
        f"sampids AS (SELECT vec_id FROM e ORDER BY vec_id LIMIT {PQ_SAMPLE_N})",
        "samp AS (SELECT sub.* FROM sub JOIN sampids USING (vec_id))",
        f"""c0 AS (
  SELECT s, row_number() OVER (PARTITION BY s ORDER BY vec_id) - 1 AS cell,
         sv AS cv
  FROM samp
  QUALIFY row_number() OVER (PARTITION BY s ORDER BY vec_id) <= {k}
)""",
    ]
    for i in range(iters):
        parts.append(
            f"""s{i} AS (
  SELECT p.vec_id, p.s, c.cell,
         row_number() OVER (PARTITION BY p.vec_id, p.s
                            ORDER BY {d2} ASC, c.cell ASC) AS rn
  FROM samp p JOIN c{i} c ON c.s = p.s
)"""
        )
        parts.append(f"a{i} AS (SELECT vec_id, s, cell FROM s{i} WHERE rn = 1)")
        parts.append(
            f"""m{i + 1} AS (
  SELECT a.s, a.cell, g.i AS i, round(avg(p.sv[g.i]), {PQ_DECIMALS}) AS mv
  FROM a{i} a JOIN samp p ON p.vec_id = a.vec_id AND p.s = a.s,
       unnest(generate_series(1, {dsub})) AS g(i)
  GROUP BY a.s, a.cell, g.i
)"""
        )
        parts.append(
            f"""c{i + 1} AS (
  SELECT c.s, c.cell, coalesce(n.cv, c.cv) AS cv
  FROM c{i} c
  LEFT JOIN (SELECT s, cell, list(mv ORDER BY i) AS cv
             FROM m{i + 1} GROUP BY s, cell) n
    ON n.s = c.s AND n.cell = c.cell
)"""
        )
    parts.append(
        f"""enc AS (
  SELECT p.vec_id, p.s, c.cell,
         row_number() OVER (PARTITION BY p.vec_id, p.s
                            ORDER BY {d2} ASC, c.cell ASC) AS rn
  FROM sub p JOIN c{iters} c ON c.s = p.s
  WHERE p.vec_id <> {QUERY_VEC_ID}
)"""
    )
    parts.append("codes AS (SELECT vec_id, s, cell FROM enc WHERE rn = 1)")
    parts.append(
        f"q AS (SELECT s, sv AS qsv FROM sub WHERE vec_id = {QUERY_VEC_ID})"
    )
    parts.append(
        f"""dist AS (
  SELECT cd.vec_id,
         sum(list_dot_product(c.cv, c.cv)
             - 2 * list_dot_product(c.cv, q.qsv)
             + list_dot_product(q.qsv, q.qsv)) AS d
  FROM codes cd
  JOIN c{iters} c ON c.s = cd.s AND c.cell = cd.cell
  JOIN q ON q.s = cd.s
  GROUP BY cd.vec_id
)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT vec_id, round(d, 4) + 0.0 AS adc_dist
FROM dist
ORDER BY adc_dist ASC, vec_id ASC
LIMIT {PQ_TOPK}"""
    )


ORACLE_PQ_ADC = _pq_oracle()


# ---- phonetic-blocking linkage (round 10) ----
#
# The phonetic rung of the blocking-key catalogue (Christen, *Data
# Matching* 2012 §4.3; the functions/phonetic.py Soundex-lite spec):
# a dirty PRODUCT FEED matched against the part master. Probe names
# carry a NON-INITIAL vowel rotation (a->e->i->o->u->a on every
# character past each word's first) — lexically far (edit distance ~
# a third of the name) but phonetically INVARIANT, the exact failure
# mode suffix/prefix blocking keys can't survive. Non-initial is the
# operative word: the key keeps the literal first letter (the classic
# Soundex design choice, justified by errors clustering AFTER the
# first character — Christen 2012 §4.3), so an initial-letter edit
# legitimately changes the key. Every
# 7th probe is corrupted (first word reversed, unknown brand) so the
# score gate, not just blocking, decides. Complementary passes:
# (phonetic(word1), brand) catches intact-brand probes;
# (phonetic(word2), type, size) catches brand-corrupted rows — whose
# reversed first word then FAILS the phon1 comparator (max 40 < 55).
# Size-drifted probes (+1 for partkey%3==0) miss pass 2's exact-size
# key but survive pass 1 — the multi-pass recall story, measured.
PHON_FS_THRESHOLD = 55
_PHON_FS_WEIGHTS = {
    "phon1": (20, -15),
    "phon2": (25, -20),
    "size": (15, -10),
    "price": (15, -10),
}


def _phon_frames(spark: SparkSession, sf_dir: str):
    from ..functions.phonetic import phonetic_key

    part = t(spark, sf_dir, "part")
    price_cents = F.round(F.col("p_retailprice") * 100, 0).cast("long")
    master = (
        part.select(
            F.col("p_partkey").alias("partkey"),
            F.col("p_name").alias("name"),
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
            price_cents.alias("price_cents"),
        )
        .withColumn("phon1", phonetic_key(F.split(F.col("name"), " ")[0]))
        .withColumn("phon2", phonetic_key(F.split(F.col("name"), " ")[1]))
        .drop("name")
    )
    corrupt = F.col("p_partkey") % 7 == 0
    w1 = F.split(F.col("p_name"), " ")[0]
    w2 = F.split(F.col("p_name"), " ")[1]

    def rot_tail(w):  # rotate vowels past each word's first character
        return F.concat(
            F.substring(w, 1, 1),
            F.translate(F.substring(w, 2, 64), "aeiou", "eioua"),
        )

    probe = (
        part.select(
            F.col("p_partkey").alias("probe_id"),
            F.when(corrupt, F.concat(F.reverse(w1), F.lit(" "), w2))
            .otherwise(
                F.concat(rot_tail(w1), F.lit(" "), rot_tail(w2))
            )
            .alias("name"),
            F.when(corrupt, F.lit("Brand#99"))
            .otherwise(F.col("p_brand"))
            .alias("brand"),
            F.col("p_type").alias("type"),
            (
                F.col("p_size")
                + F.when(F.col("p_partkey") % 3 == 0, 1).otherwise(0)
            ).alias("size"),
            (
                price_cents
                + F.when(F.col("p_partkey") % 5 == 0, 37).otherwise(0)
            ).alias("price_cents"),
        )
        .withColumn("phon1", phonetic_key(F.split(F.col("name"), " ")[0]))
        .withColumn("phon2", phonetic_key(F.split(F.col("name"), " ")[1]))
        .drop("name")
    )
    return probe, master


def _phon_blocking():
    return [
        (
            F.concat(F.col("p_phon1"), F.lit("|"), F.col("p_brand")),
            F.concat(F.col("m_phon1"), F.lit("|"), F.col("m_brand")),
        ),
        (
            F.concat(
                F.col("p_phon2"), F.lit("|"), F.col("p_type"), F.lit("|"),
                F.col("p_size").cast("string"),
            ),
            F.concat(
                F.col("m_phon2"), F.lit("|"), F.col("m_type"), F.lit("|"),
                F.col("m_size").cast("string"),
            ),
        ),
    ]


def _phon_comparators():
    from ..operators.linkage import Comparator

    return [
        Comparator(
            "phon1", F.col("p_phon1") == F.col("m_phon1"),
            *_PHON_FS_WEIGHTS["phon1"],
        ),
        Comparator(
            "phon2", F.col("p_phon2") == F.col("m_phon2"),
            *_PHON_FS_WEIGHTS["phon2"],
        ),
        Comparator(
            "size", F.abs(F.col("p_size") - F.col("m_size")) <= 1,
            *_PHON_FS_WEIGHTS["size"],
        ),
        Comparator(
            "price",
            F.abs(F.col("p_price_cents") - F.col("m_price_cents")) <= 100,
            *_PHON_FS_WEIGHTS["price"],
        ),
    ]


def link_part_phonetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter linkage with PHONETIC blocking and comparators
    (functions/phonetic.py + operators/linkage.py): vowel-rotated
    part names block and score through their Soundex-lite keys — both
    passes are pure equi-joins on map-side string expressions (JVM
    codegen, no UDF). Returns (probe_id, partkey, score, per-field
    agree flags)."""
    from ..operators.linkage import fs_link

    probe, master = _phon_frames(spark, sf_dir)
    out = fs_link(
        probe,
        master,
        "probe_id",
        "partkey",
        blocking=_phon_blocking(),
        comparators=_phon_comparators(),
        threshold=PHON_FS_THRESHOLD,
    )
    return out.select(
        "probe_id", "partkey", "score",
        "phon1_agree", "phon2_agree", "size_agree", "price_agree",
    )


def _phon_oracle(cap: int | None = None) -> str:
    """DuckDB twin: the phonetic key expands from the SAME generator
    (functions/phonetic.py:phonetic_key_sql), computed ONCE per frame
    column; blocking and scoring then ride plain equalities.

    ``cap`` replays fs_link's ``max_block_pairs`` skew valve exactly:
    per pass, a block census (probe count x master count per key,
    inner-joined — a key absent on either side produces no pairs
    anyway) marks keys whose cross product exceeds the cap, and that
    pass's candidates exclude probes in hot keys via NOT EXISTS — the
    same drop-from-generation-only semantics (scoring still sees full
    rows; a pair also caught by the complementary pass still scores)."""
    from ..functions.phonetic import phonetic_key_sql

    agree = {
        "phon1": "p.phon1 = m.phon1",
        "phon2": "p.phon2 = m.phon2",
        "size": "abs(p.size - m.size) <= 1",
        "price": "abs(p.price_cents - m.price_cents) <= 100",
    }
    score = " + ".join(
        f"CASE WHEN {agree[f]} THEN {wa} ELSE {wd} END"
        for f, (wa, wd) in _PHON_FS_WEIGHTS.items()
    )
    flags = ",\n         ".join(
        f"{agree[f]} AS {f}_agree" for f in _PHON_FS_WEIGHTS
    )
    hot_ctes = ""
    w1 = w2 = ""
    if cap is not None:
        hot_ctes = f"""
hot1 AS (
  SELECT pc.phon1, pc.brand
  FROM (SELECT phon1, brand, count(*) AS np FROM probe GROUP BY 1, 2) pc
  JOIN (SELECT phon1, brand, count(*) AS nm FROM master GROUP BY 1, 2) mc
    ON pc.phon1 = mc.phon1 AND pc.brand = mc.brand
  WHERE pc.np * mc.nm > {cap}
),
hot2 AS (
  SELECT pc.phon2, pc.type, pc.size
  FROM (SELECT phon2, type, size, count(*) AS np
        FROM probe GROUP BY 1, 2, 3) pc
  JOIN (SELECT phon2, type, size, count(*) AS nm
        FROM master GROUP BY 1, 2, 3) mc
    ON pc.phon2 = mc.phon2 AND pc.type = mc.type AND pc.size = mc.size
  WHERE pc.np * mc.nm > {cap}
),"""
        w1 = (
            "\n  WHERE NOT EXISTS (SELECT 1 FROM hot1 h"
            " WHERE h.phon1 = p.phon1 AND h.brand = p.brand)"
        )
        w2 = (
            "\n  WHERE NOT EXISTS (SELECT 1 FROM hot2 h"
            " WHERE h.phon2 = p.phon2 AND h.type = p.type"
            " AND h.size = p.size)"
        )
    return f"""
WITH master AS (
  SELECT p_partkey AS partkey, p_brand AS brand, p_type AS type,
         p_size AS size,
         CAST(round(p_retailprice * 100, 0) AS BIGINT) AS price_cents,
         {phonetic_key_sql("split_part(p_name, ' ', 1)")} AS phon1,
         {phonetic_key_sql("split_part(p_name, ' ', 2)")} AS phon2
  FROM part
),
probe0 AS (
  SELECT p_partkey AS probe_id,
         CASE WHEN p_partkey % 7 = 0
              THEN reverse(split_part(p_name, ' ', 1)) || ' '
                   || split_part(p_name, ' ', 2)
              ELSE substring(split_part(p_name, ' ', 1), 1, 1)
                   || translate(substring(split_part(p_name, ' ', 1), 2, 64),
                                'aeiou', 'eioua')
                   || ' '
                   || substring(split_part(p_name, ' ', 2), 1, 1)
                   || translate(substring(split_part(p_name, ' ', 2), 2, 64),
                                'aeiou', 'eioua')
              END AS name,
         CASE WHEN p_partkey % 7 = 0 THEN 'Brand#99' ELSE p_brand END
           AS brand,
         p_type AS type,
         p_size + CASE WHEN p_partkey % 3 = 0 THEN 1 ELSE 0 END AS size,
         CAST(round(p_retailprice * 100, 0) AS BIGINT)
           + CASE WHEN p_partkey % 5 = 0 THEN 37 ELSE 0 END AS price_cents
  FROM part
),
probe AS (
  SELECT probe_id, brand, type, size, price_cents,
         {phonetic_key_sql("split_part(name, ' ', 1)")} AS phon1,
         {phonetic_key_sql("split_part(name, ' ', 2)")} AS phon2
  FROM probe0
),{hot_ctes}
cand AS (
  SELECT DISTINCT p.probe_id, m.partkey
  FROM probe p JOIN master m
    ON p.phon1 = m.phon1 AND p.brand = m.brand{w1}
  UNION
  SELECT DISTINCT p.probe_id, m.partkey
  FROM probe p JOIN master m
    ON p.phon2 = m.phon2 AND p.type = m.type AND p.size = m.size{w2}
),
scored AS (
  SELECT c.probe_id, c.partkey,
         CAST({score} AS BIGINT) AS score,
         {flags}
  FROM cand c
  JOIN probe p ON p.probe_id = c.probe_id
  JOIN master m ON m.partkey = c.partkey
)
SELECT * FROM scored WHERE score >= {PHON_FS_THRESHOLD}
"""


ORACLE_PHON_LINK = _phon_oracle()


# ---- phonetic linkage under the skew valve (round 11) ----
#
# The 100 TB posture of max_block_pairs, DECLARED (round-10 verdict
# item 1): the phonetic fixture is the natural degenerate-vocabulary
# host — Soundex-lite keys collapse the ~90-word part vocabulary so
# pass-1 (phon1 x brand) blocks carry a measured 256-pair hot tail at
# sf0.01 and ~13k-pair blocks at sf0.1 (exactly the degenerate-key
# regime the valve exists for; Splink's blocking-rule guidance bans
# such rules outright). Cap = 200 drops the hot tail from candidate
# GENERATION only: a pair also caught by the complementary
# (phon2, type, size) pass still scores on full rows, and nothing
# emitted is ever wrong — the oracle replays the identical census +
# HAVING, so the valve's exact semantics ride the correctness gate
# instead of living only in tests/experiments.
PHON_BLOCK_CAP = 200


def link_part_phonetic_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """link_part_phonetic with the max_block_pairs=PHON_BLOCK_CAP skew
    valve engaged (operators/linkage.py:fs_link / _hot_blocks). Same
    output contract; blocks whose probe x master cross product exceeds
    the cap are dropped per pass before the candidate join."""
    from ..operators.linkage import fs_link

    probe, master = _phon_frames(spark, sf_dir)
    out = fs_link(
        probe,
        master,
        "probe_id",
        "partkey",
        blocking=_phon_blocking(),
        comparators=_phon_comparators(),
        threshold=PHON_FS_THRESHOLD,
        max_block_pairs=PHON_BLOCK_CAP,
    )
    return out.select(
        "probe_id", "partkey", "score",
        "phon1_agree", "phon2_agree", "size_agree", "price_agree",
    )


ORACLE_PHON_LINK_CAPPED = _phon_oracle(cap=PHON_BLOCK_CAP)


def link_block_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The blocking-rule census DECLARED (operators/linkage.py:
    block_census — Splink's blocking-rule analysis step): per pass and
    block key of the phonetic fixture, probe count x master count =
    candidate pair mass. This is the number a caller reads before
    picking max_block_pairs; integers, hash-exact. Returns (pass_idx,
    block_key, n_probe, n_master, pairs)."""
    from ..operators.linkage import block_census

    probe, master = _phon_frames(spark, sf_dir)
    return block_census(
        probe, master, "probe_id", "partkey", blocking=_phon_blocking()
    )


def _census_oracle() -> str:
    from ..functions.phonetic import phonetic_key_sql  # noqa: F401

    base = _phon_oracle()
    # reuse the phonetic oracle's master/probe CTEs verbatim (everything
    # up to the cand CTE), then census both passes
    head = base.split(",\ncand AS")[0]
    return f"""{head}
,
c0 AS (
  SELECT 0 AS pass_idx, p.block_key, p.n_probe, m.n_master
  FROM (SELECT phon1 || '|' || brand AS block_key, count(*) AS n_probe
        FROM probe GROUP BY 1) p
  JOIN (SELECT phon1 || '|' || brand AS block_key, count(*) AS n_master
        FROM master GROUP BY 1) m USING (block_key)
),
c1 AS (
  SELECT 1 AS pass_idx, p.block_key, p.n_probe, m.n_master
  FROM (SELECT phon2 || '|' || type || '|' || CAST(size AS VARCHAR)
               AS block_key, count(*) AS n_probe
        FROM probe GROUP BY 1) p
  JOIN (SELECT phon2 || '|' || type || '|' || CAST(size AS VARCHAR)
               AS block_key, count(*) AS n_master
        FROM master GROUP BY 1) m USING (block_key)
)
SELECT CAST(pass_idx AS INT) AS pass_idx, block_key,
       CAST(n_probe AS BIGINT) AS n_probe,
       CAST(n_master AS BIGINT) AS n_master,
       CAST(n_probe * n_master AS BIGINT) AS pairs
FROM (SELECT * FROM c0 UNION ALL SELECT * FROM c1)
"""


ORACLE_BLOCK_CENSUS = _census_oracle()


# ---- term-frequency-adjusted linkage (round 11) ----
#
# Splink's term_frequency_adjustments, the remaining production-
# linkage feature: agreement on a COMMON value is weak evidence,
# agreement on a RARE one is strong — the u-probability of the phon1
# comparator varies per value, so its agreement weight becomes
# round(4 * log2(n_master / tf), 2) where tf = master frequency of the
# matched phonetic key (Fellegi-Sunter 1969 §5; Winkler's
# value-specific weights). The degenerate-vocabulary phonetic fixture
# is the natural host: tf spans two orders of magnitude across keys.
#
# Float protocol (probed this round at 3 SFs before shipping, the
# round-3 convention): the 2dp rounding grid margin of 4*log2(n/tf)
# is >= 0.042 grid units (>= 4.2e-4 absolute, ~1e10 x libm drift);
# score = ONE grid double + three exact-integer-valued doubles summed
# in a fixed expression order (bit-deterministic); threshold 55.0
# sits in the bimodal gap with min |score - T| >= 10.4 / 11.58 / 11.84
# at sf0.001/0.01/0.1. Matches: 173 / 1,725 / 17,789.
PHON_TF_THRESHOLD = 55.0
PHON_TF_SCALE = 4


def link_part_phonetic_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-adjusted phonetic linkage (operators/linkage.py:fs_link with
    a Column-weight comparator): phon1 agreement evidence scales with
    the rarity of the matched key; phon2/size/price keep their fixed
    weights. Returns (probe_id, partkey, score, tf_phon1, per-field
    agree flags)."""
    from ..operators.linkage import Comparator, fs_link

    probe, master = _phon_frames(spark, sf_dir)
    tf = master.groupBy("phon1").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.withColumn(
        "nm", F.sum("tf").over(W.partitionBy(F.lit(1)))
    )
    master2 = master.join(F.broadcast(tf), "phon1")
    tf_w = F.round(
        F.lit(float(PHON_TF_SCALE))
        * F.log2(F.col("m_nm") / F.col("m_tf")),
        2,
    )
    comps = [
        Comparator(
            "phon1",
            F.col("p_phon1") == F.col("m_phon1"),
            tf_w,
            F.lit(-15.0),
        ),
        Comparator(
            "phon2", F.col("p_phon2") == F.col("m_phon2"), F.lit(25.0),
            F.lit(-20.0),
        ),
        Comparator(
            "size", F.abs(F.col("p_size") - F.col("m_size")) <= 1,
            F.lit(15.0), F.lit(-10.0),
        ),
        Comparator(
            "price",
            F.abs(F.col("p_price_cents") - F.col("m_price_cents")) <= 100,
            F.lit(15.0), F.lit(-10.0),
        ),
    ]
    out = fs_link(
        probe,
        master2,
        "probe_id",
        "partkey",
        blocking=_phon_blocking(),
        comparators=comps,
        threshold=PHON_TF_THRESHOLD,
        score_type="double",
    )
    # re-attach the tf that scored (from the master side of the pair)
    m_tf = master2.select(
        F.col("partkey"), F.col("tf").alias("tf_phon1")
    )
    return out.join(m_tf, "partkey").select(
        "probe_id", "partkey",
        (F.col("score") + F.lit(0.0)).alias("score"),
        F.col("tf_phon1").cast("long").alias("tf_phon1"),
        "phon1_agree", "phon2_agree", "size_agree", "price_agree",
    )


def _phon_tf_oracle() -> str:
    head = _phon_oracle().split(",\ncand AS")[0]
    return f"""{head},
tf AS (
  SELECT phon1, count(*) AS tf,
         CAST(sum(count(*)) OVER () AS BIGINT) AS nm
  FROM master GROUP BY phon1
),
cand AS (
  SELECT DISTINCT p.probe_id, m.partkey
  FROM probe p JOIN master m
    ON p.phon1 = m.phon1 AND p.brand = m.brand
  UNION
  SELECT DISTINCT p.probe_id, m.partkey
  FROM probe p JOIN master m
    ON p.phon2 = m.phon2 AND p.type = m.type AND p.size = m.size
),
scored AS (
  SELECT c.probe_id, c.partkey,
         (CASE WHEN p.phon1 = m.phon1
               THEN round({PHON_TF_SCALE} * log2(t.nm / t.tf), 2)
               ELSE -15.0 END
        + CASE WHEN p.phon2 = m.phon2 THEN 25.0 ELSE -20.0 END
        + CASE WHEN abs(p.size - m.size) <= 1 THEN 15.0 ELSE -10.0 END
        + CASE WHEN abs(p.price_cents - m.price_cents) <= 100
               THEN 15.0 ELSE -10.0 END) AS score,
         CAST(t.tf AS BIGINT) AS tf_phon1,
         p.phon1 = m.phon1 AS phon1_agree,
         p.phon2 = m.phon2 AS phon2_agree,
         abs(p.size - m.size) <= 1 AS size_agree,
         abs(p.price_cents - m.price_cents) <= 100 AS price_agree
  FROM cand c
  JOIN probe p ON p.probe_id = c.probe_id
  JOIN master m ON m.partkey = c.partkey
  JOIN tf t ON t.phon1 = m.phon1
)
SELECT probe_id, partkey, score + 0.0 AS score, tf_phon1,
       phon1_agree, phon2_agree, size_agree, price_agree
FROM scored WHERE score >= {PHON_TF_THRESHOLD}
"""


ORACLE_PHON_TF = _phon_tf_oracle()


# ---- greedy k-center diversity selection (round 10) ----
KC_K = 8
KC_DECIMALS = 6


def select_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Farthest-first k-center selection (operators/coreset.py) over
    the embeddings corpus: {KC_K} maximally-diverse vectors, each
    annotated with its coverage (max cosine to the rows already
    chosen) at selection time. Returns (sel_rank, vec_id, coverage);
    the seed's coverage is NULL."""
    from ..operators.coreset import kcenter_select

    picks = kcenter_select(
        _embeddings(spark, sf_dir), KC_K, decimals=KC_DECIMALS
    )
    return spark.createDataFrame(
        picks, "sel_rank long, vec_id long, coverage double"
    )


def _kcenter_oracle(k: int = KC_K) -> str:
    """SQL twin: a generated chain of (coverage, pick) CTE pairs —
    d{j} folds the newest pick into the running max INCREMENTALLY
    (greatest of the previous rounded coverage and the new rounded
    cosine), which equals the Spark side's recompute-against-all
    because per-term rounding commutes with max. The zero-norm CASE
    mirrors the Spark side's _unit_rows convention (a zero vector
    unit-normalizes to all-zeros, so every cosine against it is
    exactly 0.0) instead of dividing by zero (round-10 ADVICE item 2)."""
    cos = (
        "CASE WHEN sqrt(list_dot_product(d.v, d.v))"
        " * sqrt(list_dot_product(p.v, p.v)) = 0 THEN 0.0"
        " ELSE list_dot_product(d.v, p.v)"
        " / (sqrt(list_dot_product(d.v, d.v))"
        " * sqrt(list_dot_product(p.v, p.v))) END"
    )
    parts = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        "p1 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1)",
        f"""d1 AS (
  SELECT d.vec_id, d.v, round({cos}, {KC_DECIMALS}) AS cov
  FROM e d, p1 p WHERE d.vec_id <> p.vec_id
)""",
    ]
    for j in range(2, k + 1):
        parts.append(
            f"p{j} AS (SELECT vec_id, v, cov FROM d{j - 1}"
            f" ORDER BY cov ASC, vec_id ASC LIMIT 1)"
        )
        if j < k:
            parts.append(
                f"""d{j} AS (
  SELECT d.vec_id, d.v,
         greatest(d.cov, round({cos}, {KC_DECIMALS})) AS cov
  FROM d{j - 1} d, p{j} p WHERE d.vec_id <> p.vec_id
)"""
            )
    rows = [
        "SELECT 1 AS sel_rank, vec_id, CAST(NULL AS DOUBLE) AS coverage FROM p1"
    ] + [
        f"SELECT {j} AS sel_rank, vec_id, cov + 0.0 AS coverage FROM p{j}"
        for j in range(2, k + 1)
    ]
    return (
        "WITH "
        + ",\n".join(parts)
        + "\nSELECT CAST(sel_rank AS BIGINT) AS sel_rank, vec_id, coverage FROM ("
        + "\nUNION ALL\n".join(rows)
        + ")"
    )


ORACLE_KCENTER = _kcenter_oracle()


# ---- maximal marginal relevance selection (round 10) ----
#
# The relevance-AND-diversity dual of the k-center lane (Carbonell &
# Goldstein SIGIR 1998 — the retrieval-reranking default): seed =
# argmax relevance to the query, each later pick maximizes
# lam*rel - mu*maxsim. lam/mu are INDEPENDENT literals (1 - 0.7 is
# not the double 0.3); rel and every pairwise cosine round to 6dp
# first, so the score is two IEEE multiplies and a subtract over
# grid-identical doubles — bit-deterministic across engines, emitted
# RAW (no output rounding needed or wanted: identical bits by
# construction, and an extra round would only ADD a midpoint risk).
MMR_K = 8
MMR_LAM = 0.7
MMR_MU = 0.3


def search_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR selection (operators/coreset.py:mmr_select) of {MMR_K}
    results for the corpus query vector, balancing query relevance
    against redundancy with already-picked results. Returns
    (sel_rank, vec_id, relevance, mmr_score); the seed's score is
    NULL (no diversity penalty yet)."""
    from ..operators.coreset import mmr_select
    from .vector import QUERY_VEC_ID

    emb = _embeddings(spark, sf_dir).filter(
        F.col("vec_id") != QUERY_VEC_ID
    )
    picks = mmr_select(
        emb,
        _query_vector(sf_dir, QUERY_VEC_ID),
        MMR_K,
        lam=MMR_LAM,
        mu=MMR_MU,
        decimals=KC_DECIMALS,
    )
    return spark.createDataFrame(
        picks,
        "sel_rank long, vec_id long, relevance double, mmr_score double",
    )


def _mmr_oracle(k: int = MMR_K) -> str:
    """SQL twin: rel CTE once, then a generated (score/pick, fold)
    chain — ms folds each new pick's rounded cosine into the running
    max, valid because per-term rounding commutes with max."""
    from .vector import QUERY_VEC_ID

    def cos(a: str, b: str) -> str:
        # zero-norm guard mirrors _unit_rows: zero vector -> cosine 0.0
        # (round-10 ADVICE item 2), never a divide-by-zero
        return (
            f"CASE WHEN sqrt(list_dot_product({a}, {a}))"
            f" * sqrt(list_dot_product({b}, {b})) = 0 THEN 0.0"
            f" ELSE list_dot_product({a}, {b})"
            f" / (sqrt(list_dot_product({a}, {a}))"
            f" * sqrt(list_dot_product({b}, {b}))) END"
        )

    parts = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        f"q AS (SELECT v AS qv FROM e WHERE vec_id = {QUERY_VEC_ID})",
        f"""rel AS (
  SELECT e.vec_id, e.v, round({cos("e.v", "q.qv")}, {KC_DECIMALS}) AS rel
  FROM e, q WHERE e.vec_id <> {QUERY_VEC_ID}
)""",
        "p1 AS (SELECT vec_id, v, rel FROM rel"
        " ORDER BY rel DESC, vec_id ASC LIMIT 1)",
        f"""d1 AS (
  SELECT r.vec_id, r.v, r.rel,
         round({cos("r.v", "p.v")}, {KC_DECIMALS}) AS ms
  FROM rel r, p1 p WHERE r.vec_id <> p.vec_id
)""",
    ]
    for j in range(2, k + 1):
        parts.append(
            f"p{j} AS (SELECT vec_id, v, rel,"
            f" {MMR_LAM} * rel - {MMR_MU} * ms AS score"
            f" FROM d{j - 1} ORDER BY score DESC, vec_id ASC LIMIT 1)"
        )
        if j < k:
            parts.append(
                f"""d{j} AS (
  SELECT d.vec_id, d.v, d.rel,
         greatest(d.ms, round({cos("d.v", "p.v")}, {KC_DECIMALS})) AS ms
  FROM d{j - 1} d, p{j} p WHERE d.vec_id <> p.vec_id
)"""
            )
    rows = [
        "SELECT 1 AS sel_rank, vec_id, rel AS relevance,"
        " CAST(NULL AS DOUBLE) AS mmr_score FROM p1"
    ] + [
        f"SELECT {j} AS sel_rank, vec_id, rel AS relevance,"
        f" score + 0.0 AS mmr_score FROM p{j}"
        for j in range(2, k + 1)
    ]
    return (
        "WITH "
        + ",\n".join(parts)
        + "\nSELECT CAST(sel_rank AS BIGINT) AS sel_rank, vec_id,"
        " relevance + 0.0 AS relevance, mmr_score FROM ("
        + "\nUNION ALL\n".join(rows)
        + ")"
    )


ORACLE_MMR = _mmr_oracle()


# ---- dyadic EWMA smoothing (round 10) ----
EWMA_WINDOW = 8


def ts_ewma_dyadic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-value EWMA (operators/smoothing.py): alpha=1/2,
    geometric tail truncated at {EWMA_WINDOW} terms, integer cents
    until one exact power-of-two division — bit-identical doubles on
    both engines by construction (no rounding contract needed).
    Returns (event_id, user_id, cents, ewma)."""
    from ..operators.smoothing import ewma_dyadic

    ev = t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    return ewma_dyadic(
        ev, "user_id", ["ts", "event_id"], "cents", window=EWMA_WINDOW
    ).select("event_id", "user_id", "cents", "ewma")


def _ewma_oracle() -> str:
    from ..operators.smoothing import ewma_dyadic_sql

    frag = ewma_dyadic_sql(
        "cents", "user_id", "ts, event_id", window=EWMA_WINDOW
    )
    return f"""
WITH base AS (
  SELECT event_id, user_id, ts,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id, cents, {frag} AS ewma
FROM base
"""


ORACLE_EWMA = _ewma_oracle()


# ---- exact-phrase containment search (round 10) ----
#
# The "benchmark quote probe" of the decontamination toolbox (the
# n-gram-overlap complement of decon_semantic_overlap; GPT-3 appendix
# C / PaLM-style 13-gram exact-match decontamination, scaled here to
# the fixture's short docs): find every corpus position containing an
# exact probe phrase via a positional n-gram join. Probe phrases are
# derived in-lane (first {PHRASE_N} tokens of every {PHRASE_EVERY}th
# doc), so each phrase provably matches its own source at pos 1 and
# the lane's output is its own recall witness.
#
# Scale shape: the corpus side is a map-side posexplode of positional
# n-grams; the probe side is small by construction and BROADCASTS, so
# the match is exchange-free — at 100 TB this is one linear scan, the
# same plan a Bloom-pushed quote scan would get. Content (the gram
# string) is the join key: no hash, no collisions to reason about;
# the xxhash64 variant is the documented swap once gram bytes dominate
# shuffle-free traffic.
PHRASE_N = 5
PHRASE_EVERY = 50


def decon_phrase_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase containment search (functions/text.py:tokens +
    word_shingles): positional {PHRASE_N}-gram index joined against
    broadcast probe phrases. Returns (phrase_id, doc_id, pos) for
    every exact occurrence, 1-based token position."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    from ..functions.text import word_shingles

    grams = docs.select(
        "doc_id",
        F.posexplode(
            word_shingles(F.col("toks"), PHRASE_N, distinct=False)
        ).alias("pos0", "gram"),
    ).select(
        "doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "gram"
    )
    probes = (
        docs.filter(
            (F.col("doc_id") % PHRASE_EVERY == 0)
            & (F.size("toks") >= PHRASE_N)
        )
        .select(
            F.col("doc_id").alias("phrase_id"),
            F.concat_ws(" ", F.slice("toks", 1, PHRASE_N)).alias("gram"),
        )
    )
    return (
        grams.join(F.broadcast(probes), "gram")
        .select("phrase_id", "doc_id", "pos")
    )


ORACLE_PHRASE = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w
  FROM documents
),
grams AS (
  SELECT doc_id, CAST(g.i AS BIGINT) AS pos,
         array_to_string(w[g.i:g.i + {PHRASE_N - 1}], ' ') AS gram
  FROM toks, unnest(generate_series(1, len(w) - {PHRASE_N - 1})) AS g(i)
  WHERE len(w) >= {PHRASE_N}
),
probes AS (
  SELECT doc_id AS phrase_id, array_to_string(w[1:{PHRASE_N}], ' ') AS gram
  FROM toks
  WHERE doc_id % {PHRASE_EVERY} = 0 AND len(w) >= {PHRASE_N}
)
SELECT p.phrase_id, g.doc_id, g.pos
FROM grams g JOIN probes p ON p.gram = g.gram
"""


# ---- linkage evaluation metrics (round 11) ----
#
# Splink's model-QA step: score the one-to-one resolution against
# ground truth. The fixture's truth is BUILT IN (probe i is customer
# i corrupted), so the confusion counts are exact integers and
# precision/recall/f1 are single fixed-order IEEE expressions over
# ratios of identical integers — bit-identical, guarded CASE for the
# empty edge. One count-aggregation over the best-match output; no
# extra scan beyond the linkage itself.


def link_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision / recall / F1 of link_customer_best against the
    fixture's identity ground truth. Returns one row: (n_truth,
    n_pred, tp, fp, precision, recall, f1)."""
    best = link_customer_best(spark, sf_dir)
    n_truth = t(spark, sf_dir, "customer").count()  # tiny dim count
    m = best.agg(
        F.count(F.lit(1)).alias("n_pred"),
        F.sum(
            F.when(F.col("probe_id") == F.col("custkey"), 1).otherwise(0)
        ).alias("tp"),
    )
    prec = F.when(
        F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")
    ).otherwise(F.lit(None).cast("double"))
    rec = F.col("tp") / F.lit(n_truth)
    f1 = F.when(
        (F.col("precision") + F.col("recall")) > 0,
        F.lit(2.0) * F.col("precision") * F.col("recall")
        / (F.col("precision") + F.col("recall")),
    ).otherwise(F.lit(None).cast("double"))
    return (
        m.select(
            F.lit(n_truth).cast("long").alias("n_truth"),
            "n_pred",
            "tp",
            (F.col("n_pred") - F.col("tp")).alias("fp"),
            prec.alias("precision"),
            rec.alias("recall"),
        )
        .withColumn("f1", f1)
    )


ORACLE_LINK_EVAL = f"""
WITH best AS ({ORACLE_FS_BEST}),
m AS (
  SELECT (SELECT count(*) FROM customer) AS n_truth,
         CAST(count(*) AS BIGINT) AS n_pred,
         CAST(sum(CASE WHEN probe_id = custkey THEN 1 ELSE 0 END)
              AS BIGINT) AS tp
  FROM best
)
SELECT CAST(n_truth AS BIGINT) AS n_truth, n_pred, tp,
       n_pred - tp AS fp,
       CASE WHEN n_pred > 0 THEN tp / n_pred END AS precision,
       tp / n_truth AS recall,
       CASE WHEN (CASE WHEN n_pred > 0 THEN tp / n_pred END
                  + tp / n_truth) > 0
            THEN 2.0 * (CASE WHEN n_pred > 0 THEN tp / n_pred END)
                 * (tp / n_truth)
                 / ((CASE WHEN n_pred > 0 THEN tp / n_pred END)
                    + tp / n_truth)
       END AS f1
FROM m
"""


# ---- transitive entity clustering over linkage matches (round 10) ----
#
# The Splink `cluster_pairwise_predictions_at_threshold` step: pairwise
# match decisions become ENTITIES via connected components, so a probe
# matching two masters merges them into one entity (the transitive
# semantics every MDM / householding pipeline wants, and the step the
# one-to-one best-match lane deliberately does NOT take). Probe and
# master keyspaces overlap (both are custkey integers), so probe nodes
# shift by LINK_PROBE_OFFSET into a disjoint namespace; unmatched rows
# of BOTH sides come back as singletons through the CC node list.
# Scale shape: matches are the blocked+scored fs_link output (never
# all-pairs); CC is the shared O(log diameter) pointer-halving
# operator whose shuffles carry only id pairs. TPC-H custkey tops out
# at 150_000 * SF, so the offset holds through SF < ~6.7; the lane
# GUARDS the invariant with a one-agg census (below) instead of
# silently colliding probe node ids with master custkeys at larger SFs
# (round-10 ADVICE item 1).
LINK_PROBE_OFFSET = 1_000_000


def _assert_probe_offset_disjoint(master: DataFrame) -> None:
    """Raise if the master keyspace reaches LINK_PROBE_OFFSET (probe
    nodes would collide with master custkeys and merges would be
    silently wrong). One partial-agg scan of the dim-sized master
    frame — the cheap price of a loud failure instead of corruption."""
    mx = master.agg(F.max("custkey").alias("mx")).collect()[0]["mx"]
    if mx is not None and mx >= LINK_PROBE_OFFSET:
        raise ValueError(
            f"link_entity_clusters: max master custkey {mx} >= "
            f"LINK_PROBE_OFFSET {LINK_PROBE_OFFSET}; probe node ids "
            "would collide — raise the offset (and its oracle twin) "
            "above the master keyspace"
        )


def link_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end (operators/linkage.py:fs_link ->
    operators/dedup.py:label_propagation): hand-weighted linkage
    matches clustered into transitive entities. Returns (node,
    entity_rep, kind) covering every probe and master row; the oracle
    checks the fixpoint against an exact recursive-CTE closure."""
    from ..operators.dedup import label_propagation
    from ..operators.linkage import fs_link

    probe, master = _fs_frames(spark, sf_dir)
    _assert_probe_offset_disjoint(master)
    matches = fs_link(
        probe,
        master,
        "probe_id",
        "custkey",
        blocking=_fs_blocking(),
        comparators=_fs_comparators(_FS_HAND_WEIGHTS),
        threshold=FS_THRESHOLD,
    )
    pairs = matches.select(
        (F.col("probe_id") + LINK_PROBE_OFFSET).alias("doc_a"),
        F.col("custkey").alias("doc_b"),
    )
    nodes = (
        probe.select(
            (F.col("probe_id") + LINK_PROBE_OFFSET).alias("node")
        )
        .unionByName(master.select(F.col("custkey").alias("node")))
    )
    labels = label_propagation(pairs, nodes)
    return labels.select(
        "node",
        F.col("label").alias("entity_rep"),
        F.when(F.col("node") >= LINK_PROBE_OFFSET, F.lit("probe"))
        .otherwise(F.lit("master"))
        .alias("kind"),
    )


# entity-closure CTE chain shared by the cluster lane and the golden-
# record lane (round 11): identical blocked+scored matches, identical
# exact recursive-CTE transitive closure, identical labeling
_ENTITY_CTES = f"""{_FS_BASE_CTES},
scored AS (
  SELECT c.probe_id, c.custkey,
         (CASE WHEN levenshtein(p.name, m.name) <= 1 THEN 40 ELSE -25 END
        + CASE WHEN p.phone = m.phone THEN 30 ELSE -15 END
        + CASE WHEN abs(p.acct_cents - m.acct_cents) <= 100 THEN 15 ELSE -10 END
        + CASE WHEN p.segment = m.segment THEN 10 ELSE -10 END)::BIGINT
           AS score
  FROM cand c
  JOIN probe p ON p.probe_id = c.probe_id
  JOIN master m ON m.custkey = c.custkey
),
m0 AS (
  SELECT probe_id + {LINK_PROBE_OFFSET} AS a, custkey AS b
  FROM scored WHERE score >= {FS_THRESHOLD}
),
edges AS (
  SELECT a AS u, b AS v FROM m0
  UNION
  SELECT b AS u, a AS v FROM m0
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
allnodes AS (
  SELECT probe_id + {LINK_PROBE_OFFSET} AS node FROM probe
  UNION ALL
  SELECT custkey AS node FROM master
),
labels AS (
  SELECT n.node,
         least(n.node, coalesce(mm.mv, n.node)) AS entity_rep,
         CASE WHEN n.node >= {LINK_PROBE_OFFSET} THEN 'probe'
              ELSE 'master' END AS kind
  FROM allnodes n
  LEFT JOIN (SELECT u, min(v) AS mv FROM reach GROUP BY u) mm
    ON mm.u = n.node
)"""

ORACLE_ENTITY_CLUSTERS = f"""
WITH RECURSIVE {_ENTITY_CTES}
SELECT node, entity_rep, kind FROM labels
"""


# ---- golden-record canonicalization (round 11) ----
#
# Splink's step AFTER clustering (round-10 verdict item 5): each
# transitive entity collapses to ONE canonical record by deterministic
# source precedence — master rows outrank probe rows (the system of
# record wins over dirty feeds), ties broken by lowest node id; a
# probe-only singleton canonicalizes to itself. This completes the
# linkage workflow: blocking -> comparators -> (EM) weights -> scoring
# -> clustering -> MERGE.
#
# Scale shape: one groupBy over the cluster assignment joined to the
# member attribute rows — min(struct(precedence, node, attrs)) is a
# partial-aggregable argmin (the (precedence, node) prefix is UNIQUE
# per member, so the string attributes never decide the comparison and
# both engines pick the identical row); counts ride the same agg. No
# window, no second shuffle beyond the entity key.


def link_entity_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden records over link_entity_clusters: per entity, member
    counts by kind plus the canonical attributes resolved by
    (master-first, lowest-node) precedence. Returns (entity_rep,
    n_members, n_probe, n_master, src_node, name, phone, segment,
    acct_cents)."""
    probe, master = _fs_frames(spark, sf_dir)
    attrs = probe.select(
        (F.col("probe_id") + LINK_PROBE_OFFSET).alias("node"),
        "name", "phone", "segment", "acct_cents",
    ).unionByName(
        master.select(
            F.col("custkey").alias("node"),
            "name", "phone", "segment", "acct_cents",
        )
    )
    members = link_entity_clusters(spark, sf_dir).join(attrs, "node")
    pick = F.min(
        F.struct(
            F.when(F.col("kind") == "master", F.lit(0))
            .otherwise(F.lit(1))
            .alias("prec"),
            F.col("node").alias("node"),
            F.col("name").alias("name"),
            F.col("phone").alias("phone"),
            F.col("segment").alias("segment"),
            F.col("acct_cents").alias("acct_cents"),
        )
    ).alias("g")
    return (
        members.groupBy("entity_rep")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum((F.col("kind") == "probe").cast("long")).alias("n_probe"),
            F.sum((F.col("kind") == "master").cast("long")).alias("n_master"),
            pick,
        )
        .select(
            "entity_rep", "n_members", "n_probe", "n_master",
            F.col("g.node").alias("src_node"),
            F.col("g.name").alias("name"),
            F.col("g.phone").alias("phone"),
            F.col("g.segment").alias("segment"),
            F.col("g.acct_cents").alias("acct_cents"),
        )
    )


ORACLE_ENTITY_GOLDEN = f"""
WITH RECURSIVE {_ENTITY_CTES},
attrs AS (
  SELECT probe_id + {LINK_PROBE_OFFSET} AS node,
         name, phone, segment, acct_cents
  FROM probe
  UNION ALL
  SELECT custkey AS node, name, phone, segment, acct_cents FROM master
),
members AS (
  SELECT l.node, l.entity_rep, l.kind,
         a.name, a.phone, a.segment, a.acct_cents
  FROM labels l JOIN attrs a ON a.node = l.node
),
ranked AS (
  SELECT *,
         row_number() OVER (
           PARTITION BY entity_rep
           ORDER BY CASE WHEN kind = 'master' THEN 0 ELSE 1 END, node
         ) AS rn
  FROM members
),
cnt AS (
  SELECT entity_rep, count(*) AS n_members,
         sum(CASE WHEN kind = 'probe' THEN 1 ELSE 0 END) AS n_probe,
         sum(CASE WHEN kind = 'master' THEN 1 ELSE 0 END) AS n_master
  FROM members GROUP BY entity_rep
)
SELECT c.entity_rep, CAST(c.n_members AS BIGINT) AS n_members,
       CAST(c.n_probe AS BIGINT) AS n_probe,
       CAST(c.n_master AS BIGINT) AS n_master,
       r.node AS src_node, r.name, r.phone, r.segment, r.acct_cents
FROM cnt c JOIN ranked r ON r.entity_rep = c.entity_rep AND r.rn = 1
"""


# ---- population-stability drift (round 10) ----
#
# DISTRIBUTION drift between two batch windows — the monitoring
# complement of the SCHEMA drift gate (operators/drift.py, which is
# driver-side metadata and correctly not a lane): the Population
# Stability Index (the credit-scoring / model-monitoring standard;
# Karakoulas 2004, "Empirical validation of retail credit-scoring
# models") per event type over FIXED equal-width value bins with
# add-one smoothing, so every one of the B bins contributes a finite
# term regardless of emptiness and the statistic is fully
# deterministic — no quantile fitting, no epsilon conventions.
#
# Scale shape: one partial-agg shuffle on (type, bin) with both window
# counts as conditional sums in the SAME pass (the data is read once),
# a tiny type x bin grid join (broadcast), and a per-type fold. The
# ln() sits on ratios of identical integers on both engines; psi
# rounds to 6dp and the margin is probed in tests (the ln-bearing
# EM-oracle protocol).
PSI_CUTOFF = "2024-01-08"
PSI_BINS = 20
PSI_BIN_CENTS = 2500


def stats_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI between the pre- and post-{PSI_CUTOFF} event-value
    distributions, per event type. Returns
    (event_type, n_ref, n_cur, psi)."""
    # clamp BOTH ends of the fixed grid (round-10 ADVICE item 4): the
    # top bin absorbs overflow and bin 0 absorbs any negative value, so
    # EVERY row is binned — nothing silently falls off the grid
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.least(
            F.greatest(
                F.floor(
                    F.round(F.col("value") * 100, 0).cast("long")
                    / F.lit(PSI_BIN_CENTS)
                ),
                F.lit(0),
            ),
            F.lit(PSI_BINS - 1),
        ).cast("long").alias("bin"),
        (F.col("ts") < F.lit(PSI_CUTOFF).cast("timestamp")).alias("is_ref"),
    )
    counts = ev.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("r"),
        F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).alias("c"),
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(spark.range(PSI_BINS).select(F.col("id").alias("bin")))
    )
    filled = grid.join(counts, ["event_type", "bin"], "left").select(
        "event_type",
        "bin",
        F.coalesce("r", F.lit(0)).alias("r"),
        F.coalesce("c", F.lit(0)).alias("c"),
    )
    # totals as a window over the (type x bin) frame — one lineage, so
    # the events table is scanned once (a second aggregation branch
    # would recompute the whole chain per branch)
    tw = W.partitionBy("event_type")
    j = filled.withColumn("n_ref", F.sum("r").over(tw)).withColumn(
        "n_cur", F.sum("c").over(tw)
    )
    p = (F.col("r") + 1) / (F.col("n_ref") + PSI_BINS)
    q = (F.col("c") + 1) / (F.col("n_cur") + PSI_BINS)
    term = (q - p) * F.log(q / p)
    return (
        j.select("event_type", "n_ref", "n_cur", term.alias("term"))
        .groupBy("event_type", "n_ref", "n_cur")
        .agg(F.round(F.sum("term"), 6).alias("psi"))
        .select("event_type", "n_ref", "n_cur", "psi")
    )


ORACLE_PSI = f"""
WITH ev AS (
  SELECT event_type,
         least(greatest(CAST(floor(CAST(round(value * 100, 0) AS BIGINT)
                                   / {PSI_BIN_CENTS}) AS BIGINT),
                        0),
               {PSI_BINS - 1}) AS bin,
         ts < TIMESTAMP '{PSI_CUTOFF}' AS is_ref
  FROM events
),
counts AS (
  SELECT event_type, bin,
         sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS r,
         sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS c
  FROM ev GROUP BY event_type, bin
),
grid AS (
  SELECT t.event_type, g.range AS bin
  FROM (SELECT DISTINCT event_type FROM ev) t, range({PSI_BINS}) g
),
filled AS (
  SELECT g.event_type, g.bin,
         coalesce(c.r, 0) AS r, coalesce(c.c, 0) AS c
  FROM grid g LEFT JOIN counts c
    ON c.event_type = g.event_type AND c.bin = g.bin
),
tot AS (
  SELECT event_type, sum(r) AS n_ref, sum(c) AS n_cur
  FROM filled GROUP BY event_type
)
SELECT f.event_type,
       CAST(t.n_ref AS BIGINT) AS n_ref,
       CAST(t.n_cur AS BIGINT) AS n_cur,
       round(sum(
         ((f.c + 1) / (t.n_cur + {PSI_BINS})
          - (f.r + 1) / (t.n_ref + {PSI_BINS}))
         * ln(((f.c + 1) / (t.n_cur + {PSI_BINS}))
              / ((f.r + 1) / (t.n_ref + {PSI_BINS})))
       ), 6) + 0.0 AS psi
FROM filled f JOIN tot t ON t.event_type = f.event_type
GROUP BY f.event_type, t.n_ref, t.n_cur
"""


# ---- streaming PSI drift (round 11) ----
#
# The monitoring stack's STREAMING posture: the current-window value
# histogram accumulates from a real Structured Streaming job (file
# source -> complete-mode groupBy -> memory sink via AvailableNow —
# the same harness as every §2.9 lane), the reference histogram is
# the static batch side, and the PSI fold is identical to the batch
# lane's — so the ORACLE IS ORACLE_PSI, byte-for-byte: batch/stream
# parity of the drift monitor is itself the checked contract. In
# production the complete-mode histogram is the continuously-updated
# counts table a monitor reads each trigger; counts are exact
# integers regardless of microbatch slicing (streaming aggregation is
# slice-invariant for sums), which is why parity holds.


def streaming_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stats_psi_drift with the current window computed by a real
    streaming job (stream-side histogram, static reference). Same
    output contract: (event_type, n_ref, n_cur, psi)."""
    from ..streaming.pipeline import read_table_stream, run_available_now

    def bin_col():
        return F.least(
            F.greatest(
                F.floor(
                    F.round(F.col("value") * 100, 0).cast("long")
                    / F.lit(PSI_BIN_CENTS)
                ),
                F.lit(0),
            ),
            F.lit(PSI_BINS - 1),
        ).cast("long").alias("bin")

    cutoff = F.lit(PSI_CUTOFF).cast("timestamp")
    cur = run_available_now(
        read_table_stream(spark, sf_dir, "events")
        .filter(F.col("ts") >= cutoff)
        .select("event_type", bin_col())
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("c")),
        "psi_cur_hist",
        output_mode="complete",
    )
    ref = (
        t(spark, sf_dir, "events")
        .filter(F.col("ts") < cutoff)
        .select("event_type", bin_col())
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("r"))
    )
    # identical fold to stats_psi_drift from here down (grid over the
    # types seen in EITHER window, add-one smoothing, 6dp round)
    types = (
        ref.select("event_type")
        .unionByName(cur.select("event_type"))
        .distinct()
    )
    grid = types.crossJoin(
        spark.range(PSI_BINS).select(F.col("id").alias("bin"))
    )
    filled = (
        grid.join(ref, ["event_type", "bin"], "left")
        .join(cur, ["event_type", "bin"], "left")
        .select(
            "event_type",
            "bin",
            F.coalesce("r", F.lit(0)).alias("r"),
            F.coalesce("c", F.lit(0)).alias("c"),
        )
    )
    tw = W.partitionBy("event_type")
    j = filled.withColumn("n_ref", F.sum("r").over(tw)).withColumn(
        "n_cur", F.sum("c").over(tw)
    )
    p = (F.col("r") + 1) / (F.col("n_ref") + PSI_BINS)
    q = (F.col("c") + 1) / (F.col("n_cur") + PSI_BINS)
    term = (q - p) * F.log(q / p)
    return (
        j.select("event_type", "n_ref", "n_cur", term.alias("term"))
        .groupBy("event_type", "n_ref", "n_cur")
        .agg(F.round(F.sum("term"), 6).alias("psi"))
        .select("event_type", "n_ref", "n_cur", "psi")
    )


# ---- streaming CUSUM control chart (round 12) ----
#
# The control-chart family's STREAMING posture (round-11 verdict item
# 3, the streaming_psi_drift pattern): the same one-sided upper CUSUM
# as ts_cusum_alarms, but folded incrementally by a per-user state
# machine (streaming/stateful.py:cusum_alarms_state — GroupState
# carries the window identity's sufficient statistics (P_t, min P_j)
# plus the last-seen order frontier). The ORACLE IS ORACLE_CUSUM,
# byte-for-byte: batch/stream parity of the alarm set is itself the
# checked contract. Parity holds because the fold is associative over
# time-ordered row blocks — each trigger resumes from the carried
# prefix state — and everything is int64, so both paths produce
# identical integers. Out-of-order delivery across triggers raises
# loudly instead of corrupting the recurrence (the lane's documented
# ordering contract; AvailableNow file batches satisfy it).


def streaming_cusum_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts_cusum_alarms with the fold run as a streaming stateful
    operator (applyInPandasWithState, per-user int64 state). Same
    output contract: (event_id, user_id, cents, cusum)."""
    from ..streaming.pipeline import read_table_stream, run_available_now
    from ..streaming.stateful import cusum_alarms_state

    src = read_table_stream(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    return run_available_now(
        cusum_alarms_state(src, ref=CUSUM_REF, h=CUSUM_H),
        "cusum_alarms",
        output_mode="update",
    )


# ---- quantile-binned PSI drift contract (round 11) ----
#
# Monitoring practice bins PSI by REFERENCE-window quantiles (equal
# expected mass per bin), not fixed equal-width cells — the decile
# convention of the credit-scoring literature. Quantile edges come
# from percentile_approx (one GK partial-agg pass, the warehouse
# posture); sketch VALUES are partition-order dependent, so like the
# MAD/CM/HLL lanes this emits the DETERMINISTIC contract instead of
# the edges themselves:
#
# - edges_rank_ok: every decile edge is an actual ref-window element
#   whose rank interval [lt+1, le] intersects target ± ceil(n/acc)+1 —
#   the Greenwald–Khanna worst-case theorem, true for ANY partitioning
#   (the stats_mad_approx_contract protocol, 9 deciles at once);
# - edges_sorted_ok: deciles from ONE sketch are monotone (query
#   targets increase over the same sorted sample sequence);
# - psi_nonneg: with add-one smoothing, every PSI term (q-p)*ln(q/p)
#   has both factors the same sign, and IEEE round-to-nearest cannot
#   push q/p across 1.0 against the sign of q-p — so the sum is >= 0
#   for ANY edge vector, hard-TRUE by theorem, not by fixture.
#
# n_ref/n_cur anchor deterministic values alongside the booleans.
# Types with zero reference rows have no quantiles to fit and are
# excluded on both engines (HAVING n_ref >= 1).
PSIQ_ACC = 100
PSIQ_DECILES = 9  # edges at 0.1 .. 0.9 -> 10 equal-mass bins


def stats_psi_quantile_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    pcts = [(i + 1) / 10 for i in range(PSIQ_DECILES)]
    nbins = PSIQ_DECILES + 1
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        (F.col("ts") < F.lit(PSI_CUTOFF).cast("timestamp")).alias("is_ref"),
    )
    ref = ev.filter(F.col("is_ref"))
    edges = ref.groupBy("event_type").agg(
        F.percentile_approx(
            "cents",
            F.array(*[F.lit(p) for p in pcts]),
            F.lit(PSIQ_ACC),
        ).alias("edges"),
        F.count(F.lit(1)).alias("n_ref"),
    )
    # GK rank envelope per decile: one conditional-sum pass over the
    # ref window joined to its (broadcast, tiny) edge vector
    ranked = ref.join(F.broadcast(edges), "event_type")
    stats = ranked.groupBy("event_type", "n_ref").agg(
        *[
            F.sum((F.col("cents") <= F.col("edges")[i]).cast("long")).alias(
                f"le{i}"
            )
            for i in range(PSIQ_DECILES)
        ],
        *[
            F.sum((F.col("cents") < F.col("edges")[i]).cast("long")).alias(
                f"lt{i}"
            )
            for i in range(PSIQ_DECILES)
        ],
    )
    tol = F.ceil(F.col("n_ref") / PSIQ_ACC) + 1
    rank_ok = None
    for i in range(PSIQ_DECILES):
        target = F.ceil(F.col("n_ref") * F.lit(i + 1) / 10)
        ok = (
            (F.col(f"le{i}") >= target - tol)
            & (F.col(f"lt{i}") + 1 <= target + tol)
            & (F.col(f"le{i}") > F.col(f"lt{i}"))
        )
        rank_ok = ok if rank_ok is None else rank_ok & ok
    contract = stats.select("event_type", rank_ok.alias("edges_rank_ok"))
    sorted_ok = edges.select(
        "event_type",
        (F.col("edges") == F.array_sort("edges")).alias("edges_sorted_ok"),
    )
    # searchsorted binning: bin = #edges strictly below the value
    # (0..9); both windows binned by the SAME ref-fitted edges
    binned = ev.join(
        F.broadcast(edges.select("event_type", "edges")), "event_type"
    ).select(
        "event_type",
        F.expr("size(filter(edges, e -> e < cents))").cast("long").alias(
            "bin"
        ),
        "is_ref",
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("r"),
        F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).alias("c"),
    )
    grid = edges.select("event_type").crossJoin(
        spark.range(nbins).select(F.col("id").alias("bin"))
    )
    filled = grid.join(counts, ["event_type", "bin"], "left").select(
        "event_type",
        "bin",
        F.coalesce("r", F.lit(0)).alias("r"),
        F.coalesce("c", F.lit(0)).alias("c"),
    )
    tw = W.partitionBy("event_type")
    j = filled.withColumn("nr", F.sum("r").over(tw)).withColumn(
        "nc", F.sum("c").over(tw)
    )
    p = (F.col("r") + 1) / (F.col("nr") + nbins)
    q = (F.col("c") + 1) / (F.col("nc") + nbins)
    term = (q - p) * F.log(q / p)
    psi = (
        j.select("event_type", F.col("nc").alias("n_cur"), term.alias("term"))
        .groupBy("event_type", "n_cur")
        .agg((F.sum("term") >= 0).alias("psi_nonneg"))
    )
    return (
        edges.select("event_type", "n_ref")
        .join(contract, "event_type")
        .join(sorted_ok, "event_type")
        .join(psi, "event_type")
        .select(
            "event_type", "n_ref", "n_cur",
            "edges_rank_ok", "edges_sorted_ok", "psi_nonneg",
        )
    )


ORACLE_PSI_QUANTILE = f"""
WITH ev AS (
  SELECT event_type, ts < TIMESTAMP '{PSI_CUTOFF}' AS is_ref FROM events
),
tot AS (
  SELECT event_type,
         sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref,
         sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS n_cur
  FROM ev GROUP BY event_type
  HAVING sum(CASE WHEN is_ref THEN 1 ELSE 0 END) >= 1
)
SELECT event_type, CAST(n_ref AS BIGINT) AS n_ref,
       CAST(n_cur AS BIGINT) AS n_cur,
       TRUE AS edges_rank_ok, TRUE AS edges_sorted_ok,
       TRUE AS psi_nonneg
FROM tot
"""


# ---- EWMA control-chart spikes (round 11) ----
#
# The monitoring USE of the dyadic EWMA (Hunter 1986's actual
# application — the EWMA control chart): an event is a SPIKE when its
# value deviates from the forecast (the previous row's EWMA) by more
# than a fixed control limit. Everything stays bit-exact without a
# contract: the EWMA is an exact dyadic rational (operators/
# smoothing.py), cents are integers <= ~2^23, so the deviation
# cents - ewma_prev needs <= 31 bits + 8 fraction bits — exactly
# representable — and the > comparison against an integer limit is a
# decision on identical doubles. First event per series has no
# forecast and is never a spike.
#
# Scale shape: the same ONE window exchange as ts_ewma_dyadic (the
# lag rides the identical (user, ts, event) ordering), then a map-side
# filter. Limit = 15000 cents keeps the declared result the ~2-3%
# tail at every SF (probed: p99 |dev| ~ 18.3k/18.7k/19.0k).
EWMA_SPIKE_LIMIT = 15000


def ts_ewma_spikes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control-chart spikes per user (operators/smoothing.py:
    ewma_dyadic + lag): events whose cent value deviates from the
    previous EWMA forecast by more than {EWMA_SPIKE_LIMIT}. Returns
    (event_id, user_id, cents, ewma_prev, dev)."""
    from ..operators.smoothing import ewma_dyadic

    ev = t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    sm = ewma_dyadic(
        ev, "user_id", ["ts", "event_id"], "cents", window=EWMA_WINDOW
    )
    lw = W.partitionBy("user_id").orderBy("ts", "event_id")
    out = sm.withColumn("ewma_prev", F.lag("ewma").over(lw))
    dev = F.col("cents") - F.col("ewma_prev")
    return (
        out.filter(
            F.col("ewma_prev").isNotNull()
            & (F.abs(dev) > EWMA_SPIKE_LIMIT)
        )
        .select(
            "event_id", "user_id", "cents",
            (F.col("ewma_prev") + F.lit(0.0)).alias("ewma_prev"),
            (dev + F.lit(0.0)).alias("dev"),
        )
    )


def _ewma_spike_oracle() -> str:
    from ..operators.smoothing import ewma_dyadic_sql

    expr = ewma_dyadic_sql("cents", "user_id", "ts, event_id", EWMA_WINDOW)
    return f"""
WITH ev AS (
  SELECT event_id, user_id, ts,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events
),
w AS (SELECT *, {expr} AS ewma FROM ev),
l AS (
  SELECT *, lag(ewma) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS ewma_prev
  FROM w
)
SELECT event_id, user_id, cents, ewma_prev + 0.0 AS ewma_prev,
       (cents - ewma_prev) + 0.0 AS dev
FROM l
WHERE ewma_prev IS NOT NULL
  AND abs(cents - ewma_prev) > {EWMA_SPIKE_LIMIT}
"""


ORACLE_EWMA_SPIKES = _ewma_spike_oracle()


# ---- CUSUM control chart (round 11) ----
#
# Page 1954 ("Continuous inspection schemes", Biometrika) — the
# change-point detector next to the EWMA chart in every monitoring
# stack: S_t = max(0, S_{t-1} + (x_t - target - slack)), alarm when
# S_t > h. The recurrence looks sequential (the one shape a
# shared-nothing engine can't fuse), but it has an EXACT window form:
#
#     S_t = P_t - min(0, min_{j<=t} P_j),   P = running sum of y
#
# (induction: max(0, P_{t-1} - m_{t-1} + y_t) = P_t - min(0, m_{t-1},
# P_t) — the dyadic-EWMA move, applied to max-recursion instead of a
# truncated tail, and this time with NO truncation: the rewrite is
# exact for the full history). Everything is int64 (cents minus an
# integer reference), so both engines produce identical integers —
# hash-exact, no contract, no rounding.
#
# Scale shape: ONE exchange + one sort on the series key; the two
# running aggregates (sum, then min-of-sum) share the same window
# spec, then a map-side filter. No UDF, no iteration, no state.
CUSUM_REF = 6000  # target + slack, cents (mean cents ~5005; probed)
CUSUM_H = 30000  # alarm threshold (non-empty at all three SFs)


def ts_cusum_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided upper CUSUM alarms per user over event values.
    Returns (event_id, user_id, cents, cusum) for events where the
    cumulative exceedance crosses {CUSUM_H}."""
    ev = t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    p = ev.withColumn(
        "pt", F.sum(F.col("cents") - CUSUM_REF).over(w)
    )
    s = p.withColumn(
        "cusum",
        F.col("pt") - F.least(F.lit(0), F.min("pt").over(w)),
    )
    return s.filter(F.col("cusum") > CUSUM_H).select(
        "event_id", "user_id", "cents", "cusum"
    )


ORACLE_CUSUM = f"""
WITH ev AS (
  SELECT event_id, user_id, ts,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events
),
p AS (
  SELECT event_id, user_id, ts, cents,
         sum(cents - {CUSUM_REF}) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS pt
  FROM ev
),
s AS (
  SELECT event_id, user_id, cents, pt,
         min(pt) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS mp
  FROM p
)
SELECT event_id, user_id, cents,
       CAST(pt - least(0, mp) AS BIGINT) AS cusum
FROM s
WHERE pt - least(0, mp) > {CUSUM_H}
"""


# ---- grouped OLS trend (round 11) ----
#
# Per-group least-squares trend fit — the "is spend drifting up?"
# analytics primitive — via SUFFICIENT STATISTICS, the only shape that
# distributes: ONE partial-agg pass collects (n, Sx, Sy, Sxx, Sxy).
# The moment PRODUCTS are summed as DECIMAL(38,0) on Spark / HUGEINT
# on DuckDB (x = epoch days <= ~2*10^4, y = cents <= ~6*10^7, so a
# single product is ~7*10^11 — an int64 sum silently wraps past
# ~10^7 rows per group with ANSI off, while the decimal sum is exact
# to 10^38 and NULLs loudly beyond; round-12 ADVICE fix).
# The closed form slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) multiplies
# the moments as DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — EXACT
# integers ~10^21 on both engines — then converts numerator and
# denominator to double (round-to-nearest of the same integer =
# identical bits) for ONE division. intercept = (Sy - slope*Sx)/n is
# two more fixed-order IEEE ops on identical doubles. Bit-identical,
# no rounding contract.


def stats_group_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order-priority OLS trend of order value (cents) over order
    date (epoch days). Returns (prio, n, slope, intercept)."""
    base = t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1970-01-01").cast("date")
        ).cast("long").alias("x"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("y"),
    )
    d = "decimal(38,0)"
    # moment products as decimal BEFORE the sum: each x*y fits int64,
    # but the per-group SUM does not past ~SF1-10 — decimal keeps the
    # sufficient statistics exact (= DuckDB's HUGEINT sum). Operands
    # at (18,0) so the product type (37,0) stays under Spark's
    # 38-precision cap with NO precision-loss rule engaged.
    dx = F.col("x").cast("decimal(18,0)")
    dy = F.col("y").cast("decimal(18,0)")
    m = base.groupBy("prio").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(dx * dx).alias("sxx"),
        F.sum(dx * dy).alias("sxy"),
    )
    num = (
        F.col("n").cast(d) * F.col("sxy").cast(d)
        - F.col("sx").cast(d) * F.col("sy").cast(d)
    )
    den = (
        F.col("n").cast(d) * F.col("sxx").cast(d)
        - F.col("sx").cast(d) * F.col("sx").cast(d)
    )
    slope = num.cast("double") / den.cast("double")
    out = m.select(
        "prio", "n", slope.alias("slope"), "sy", "sx"
    )
    intercept = (
        F.col("sy") - F.col("slope") * F.col("sx")
    ) / F.col("n")
    return out.select(
        "prio", "n",
        (F.col("slope") + F.lit(0.0)).alias("slope"),
        (intercept + F.lit(0.0)).alias("intercept"),
    )


ORACLE_OLS = """
WITH base AS (
  SELECT o_orderpriority AS prio,
         CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT)
           AS x,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS y
  FROM orders
),
m AS (
  SELECT prio, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(x AS HUGEINT) * y) AS sxy
  FROM base GROUP BY prio
),
s AS (
  SELECT prio, n, sx, sy,
         CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
              AS DOUBLE)
         / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
                AS DOUBLE) AS slope
  FROM m
)
SELECT prio, n, slope + 0.0 AS slope,
       ((sy - slope * sx) / n) + 0.0 AS intercept
FROM s
"""


# ---- OLS residual outliers (round 11) ----
#
# The SCORING half of the grouped-OLS pair — the production
# fit-then-score split: the 5-row model (bit-identical slope/
# intercept, see stats_group_ols_trend) broadcasts back onto the fact
# rows and each order scores its residual against the group trend.
# resid = y - (slope*x + intercept) is a fixed-order IEEE chain over
# bit-identical inputs, so the flagged set is exact on both engines
# with no rounding contract (the EWMA-spike argument, doubles
# identical rather than dyadic).
#
# Scale shape: ONE fact scan for the fit (partial agg to 5 rows) and
# one for the scoring join — the model side is broadcast, so scoring
# is map-side.
OLS_RESID_LIMIT = 24_500_000  # cents (~p99 of |resid|, probed at 3 SFs)


def stats_ols_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose value deviates from their priority group's OLS
    trend by more than {OLS_RESID_LIMIT} cents. Returns (o_orderkey,
    prio, x, y, resid)."""
    base = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("prio"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1970-01-01").cast("date")
        ).cast("long").alias("x"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("y"),
    )
    model = stats_group_ols_trend(spark, sf_dir).select(
        "prio", "slope", "intercept"
    )
    resid = F.col("y") - (
        F.col("slope") * F.col("x") + F.col("intercept")
    )
    return (
        base.join(F.broadcast(model), "prio")
        .withColumn("resid", resid + F.lit(0.0))
        .filter(F.abs(F.col("resid")) > OLS_RESID_LIMIT)
        .select("o_orderkey", "prio", "x", "y", "resid")
    )


ORACLE_OLS_OUTLIERS = f"""
WITH base AS (
  SELECT o_orderkey, o_orderpriority AS prio,
         CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT)
           AS x,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS y
  FROM orders
),
m AS (
  SELECT prio, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(x AS HUGEINT) * y) AS sxy
  FROM base GROUP BY prio
),
s AS (
  SELECT prio, n, sx, sy,
         CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
              AS DOUBLE)
         / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
                AS DOUBLE) AS slope
  FROM m
),
s2 AS (SELECT prio, slope, (sy - slope * sx) / n AS intercept FROM s)
SELECT b.o_orderkey, b.prio, b.x, b.y,
       (b.y - (s2.slope * b.x + s2.intercept)) + 0.0 AS resid
FROM base b JOIN s2 ON s2.prio = b.prio
WHERE abs(b.y - (s2.slope * b.x + s2.intercept)) > {OLS_RESID_LIMIT}
"""


# ---- Kolmogorov-Smirnov drift (round 11) ----
#
# The nonparametric complement of PSI (Massey 1951, JASA — the
# two-sample KS test every feature-monitoring stack ships next to
# PSI): D = max over the pooled support of |ECDF_ref - ECDF_cur|,
# computed EXACTLY — no bins, no smoothing, no sketch. Cross-engine
# exactness needs no rounding contract: each ECDF value is one
# int64/int64 IEEE division (identical bits), the difference and abs
# are single operations on identical doubles, and MAX is
# order-independent — so D is bit-identical by construction (the
# ordered-sum hazard that forces PSI's 6dp grid never arises).
#
# Scale shape: one partial-agg shuffle on (type, value) collapses the
# events to the distinct support (bounded by the value domain, not the
# row count), ONE window exchange on type builds both cumulative
# counts and both totals, and a per-type max folds it down. Types with
# an empty window have no ECDF to compare and drop on both engines.


def stats_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS statistic between the pre- and
    post-{PSI_CUTOFF} event-value distributions, per event type.
    Returns (event_type, n_ref, n_cur, ks_stat) — ks_stat bit-identical
    across engines (see section comment)."""
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        (F.col("ts") < F.lit(PSI_CUTOFF).cast("timestamp")).alias("is_ref"),
    )
    counts = ev.groupBy("event_type", "cents").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("r"),
        F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).alias("c"),
    )
    cw = W.partitionBy("event_type").orderBy("cents")
    tw = W.partitionBy("event_type")
    cum = counts.select(
        "event_type",
        F.sum("r").over(cw).alias("cr"),
        F.sum("c").over(cw).alias("cc"),
        F.sum("r").over(tw).alias("n_ref"),
        F.sum("c").over(tw).alias("n_cur"),
    )
    d = F.abs(
        F.col("cr") / F.col("n_ref") - F.col("cc") / F.col("n_cur")
    )
    return (
        cum.filter((F.col("n_ref") >= 1) & (F.col("n_cur") >= 1))
        .groupBy("event_type", "n_ref", "n_cur")
        .agg((F.max(d) + F.lit(0.0)).alias("ks_stat"))
    )


ORACLE_KS = f"""
WITH ev AS (
  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents,
         ts < TIMESTAMP '{PSI_CUTOFF}' AS is_ref
  FROM events
),
cnt AS (
  SELECT event_type, cents,
         sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS r,
         sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS c
  FROM ev GROUP BY event_type, cents
),
cum AS (
  SELECT event_type,
         CAST(sum(r) OVER (PARTITION BY event_type ORDER BY cents)
              AS BIGINT) AS cr,
         CAST(sum(c) OVER (PARTITION BY event_type ORDER BY cents)
              AS BIGINT) AS cc,
         CAST(sum(r) OVER (PARTITION BY event_type) AS BIGINT) AS n_ref,
         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n_cur
  FROM cnt
)
SELECT event_type, n_ref, n_cur,
       max(abs(cr / n_ref - cc / n_cur)) + 0.0 AS ks_stat
FROM cum
WHERE n_ref >= 1 AND n_cur >= 1
GROUP BY event_type, n_ref, n_cur
"""


# ---- Deequ-style expectation suite (round 11) ----
#
# Constraint VALIDATION on top of the profiling metrics — the Deequ
# Check / Great-Expectations expectation suite a lake gates every
# landed batch on: uniqueness, referential integrity, range, domain
# membership, completeness. Each check emits its violation COUNT (the
# actionable number), not just a boolean. All integers — hash-exact.
#
# Scale shape (plan-pinned in tests): ONE scan of each fact table.
# Every orders-side check INCLUDING the FK rides a single aggregation
# over orders LEFT JOIN the distinct parent keys (uniqueness = count
# vs count_distinct in the same agg; FK violation = parent key null);
# lineitem likewise (range + FK in one agg over a left join against
# distinct orderkeys). The one-row aggregates then UNPIVOT map-side
# (stack) into check rows — no per-check re-scan, no collect. Parent
# key sets are DISTINCT'd before the join so a duplicate parent key
# (itself a violation the suite reports) cannot multiply child rows
# and skew the child-side counts.
DQ_STATUS_DOMAIN = ("O", "F", "P")


def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite over orders/lineitem/customer.
    Returns (check_name, n_checked, n_violations, passed) — one row
    per check."""
    orders = t(spark, sf_dir, "orders")
    lineitem = t(spark, sf_dir, "lineitem")
    customer = t(spark, sf_dir, "customer")

    cust_keys = customer.select("c_custkey").distinct()
    oj = orders.join(
        cust_keys, orders["o_custkey"] == cust_keys["c_custkey"], "left"
    )
    o = oj.agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.count(F.lit(1)) - F.count_distinct("o_orderkey")
        ).alias("dup_keys"),
        F.sum(
            F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)
        ).alias("bad_price"),
        F.sum(
            F.when(
                ~F.col("o_orderstatus").isin(*DQ_STATUS_DOMAIN), 1
            ).otherwise(0)
        ).alias("bad_status"),
        F.sum(
            F.when(F.col("o_orderdate").isNull(), 1).otherwise(0)
        ).alias("null_date"),
        F.sum(
            F.when(F.col("c_custkey").isNull(), 1).otherwise(0)
        ).alias("fk_viol"),
    )
    ostack = o.select(
        F.col("n"),
        F.stack(
            F.lit(5),
            F.lit("orderkey_unique"), F.col("dup_keys"),
            F.lit("totalprice_positive"), F.col("bad_price"),
            F.lit("orderstatus_domain"), F.col("bad_status"),
            F.lit("orderdate_complete"), F.col("null_date"),
            F.lit("orders_custkey_fk"), F.col("fk_viol"),
        ).alias("check_name", "n_violations"),
    ).select("check_name", F.col("n").alias("n_checked"), "n_violations")

    order_keys = orders.select("o_orderkey").distinct()
    lj = lineitem.join(
        order_keys, lineitem["l_orderkey"] == order_keys["o_orderkey"],
        "left",
    )
    li = lj.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(
                (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1
            ).otherwise(0)
        ).alias("bad_qty"),
        F.sum(
            F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)
        ).alias("fk_viol"),
    )
    lstack = li.select(
        F.col("n"),
        F.stack(
            F.lit(2),
            F.lit("lineitem_orderkey_fk"), F.col("fk_viol"),
            F.lit("quantity_in_range"), F.col("bad_qty"),
        ).alias("check_name", "n_violations"),
    ).select("check_name", F.col("n").alias("n_checked"), "n_violations")

    return ostack.unionByName(lstack).select(
        "check_name",
        F.col("n_checked").cast("long").alias("n_checked"),
        F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )


_DQ_STATUS_SQL = ", ".join(f"'{s}'" for s in DQ_STATUS_DOMAIN)
ORACLE_DQ = f"""
WITH checks AS (
  SELECT 'orderkey_unique' AS check_name,
         count(*) AS n_checked,
         count(*) - count(DISTINCT o_orderkey) AS n_violations
  FROM orders
  UNION ALL
  SELECT 'totalprice_positive', count(*),
         sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
  FROM orders
  UNION ALL
  SELECT 'orderstatus_domain', count(*),
         sum(CASE WHEN o_orderstatus NOT IN ({_DQ_STATUS_SQL})
                  THEN 1 ELSE 0 END)
  FROM orders
  UNION ALL
  SELECT 'orderdate_complete', count(*),
         sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
  FROM orders
  UNION ALL
  SELECT 'orders_custkey_fk', count(*),
         sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
  FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
    ON c.c_custkey = o.o_custkey
  UNION ALL
  SELECT 'lineitem_orderkey_fk', count(*),
         sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
    ON o.o_orderkey = l.l_orderkey
  UNION ALL
  SELECT 'quantity_in_range', count(*),
         sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END)
  FROM lineitem
)
SELECT check_name, CAST(n_checked AS BIGINT) AS n_checked,
       CAST(n_violations AS BIGINT) AS n_violations,
       n_violations = 0 AS passed
FROM checks
"""


# ---- Deequ-style metric anomaly detection (round 12) ----
#
# The second half of Deequ (Schelter et al., VLDB 2018 §3.3 anomaly
# detection): where dq_expectations gates on STATIC constraints, this
# gates on metric DRIFT across ingest batches — today's row count vs
# yesterday's beyond a relative-rate-of-change band (Deequ's
# RelativeRateOfChangeStrategy). The fixture's arrival epochs are the
# order months (the reference lands one batch per Airflow day,
# raw_dag.py:42; a deployment persists each run's metric row via the
# medallion epoch-commit seam and this lane reads that history —
# months stand in for that history here so the lane is fully
# oracle-checkable from the static tables).
#
# Metrics per epoch: row count, value sum (cents), distinct customer
# count — Deequ's Size/Sum/ApproxCountDistinct triple, exact here.
# The band check cross-MULTIPLIES integers (value*100 vs prev*pct)
# instead of dividing, so the gate is integer-exact on both engines;
# the first epoch has no predecessor and never alarms (Deequ
# semantics). Output carries every (epoch, metric) with its flag so
# the lane is non-vacuous at every SF.
#
# Scale shape: ONE scan of orders -> one partial agg on the month key
# (epoch cardinality, ~84) -> map-side stack to long format -> one
# window exchange on the tiny metric keyspace. All integers + bool.
DQM_MIN_PCT = 60  # alarm if value < 60% of previous epoch
DQM_MAX_PCT = 167  # or > 167% (the reciprocal band)


def dq_metric_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ anomaly detection over the per-epoch metric history.
    Returns (epoch, metric, value, prev_value, anomalous) for every
    order month and metric in {n_rows, sum_cents, n_customers}."""
    m = (
        t(spark, sf_dir, "orders")
        .groupBy(F.trunc("o_orderdate", "month").alias("epoch"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("long")
            ).alias("sum_cents"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )
    hist = m.select(
        "epoch",
        F.expr(
            "stack(3, 'n_rows', n_rows, 'sum_cents', sum_cents,"
            " 'n_customers', n_customers) AS (metric, value)"
        ),
    )
    w = W.partitionBy("metric").orderBy("epoch")
    out = hist.withColumn("prev_value", F.lag("value").over(w))
    anomalous = F.col("prev_value").isNotNull() & (
        (F.col("value") * 100 > F.col("prev_value") * DQM_MAX_PCT)
        | (F.col("value") * 100 < F.col("prev_value") * DQM_MIN_PCT)
    )
    return out.select(
        "epoch", "metric", "value", "prev_value",
        anomalous.alias("anomalous"),
    )


ORACLE_DQ_ANOMALIES = f"""
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS epoch,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS sum_cents,
         CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
  FROM orders GROUP BY 1
),
hist AS (
  SELECT epoch, 'n_rows' AS metric, n_rows AS value FROM m
  UNION ALL
  SELECT epoch, 'sum_cents', sum_cents FROM m
  UNION ALL
  SELECT epoch, 'n_customers', n_customers FROM m
),
l AS (
  SELECT epoch, metric, value,
         lag(value) OVER (PARTITION BY metric ORDER BY epoch)
           AS prev_value
  FROM hist
)
SELECT epoch, metric, value, prev_value,
       prev_value IS NOT NULL AND (
         value * 100 > prev_value * {DQM_MAX_PCT}
         OR value * 100 < prev_value * {DQM_MIN_PCT}
       ) AS anomalous
FROM l
"""


# ---- frequent-pair co-occurrence mining (rounds 11-12) ----
#
# The A-Priori L2 pass (Agrawal & Srikant, VLDB 1994 — market-basket
# association mining): part pairs co-occurring in >= minsup orders,
# with lift. Round 12 gives the lane its 100 TB posture (round-11
# verdict item 1):
#
# - L1 PREFILTER (anti-monotonicity): an item in fewer than minsup
#   baskets can never appear in a frequent pair, so the self-join
#   sides are semi-joined against the frequent-item set FIRST — exact,
#   output (and oracle) unchanged, and on a web-scale corpus where
#   most items are rare this is the difference between "runs" and the
#   plan you'd want. The frequent-item frame is broadcast here (it is
#   the minsup-survivor vocabulary, orders of magnitude smaller than
#   the fact); at a scale where even that side outgrows the broadcast
#   threshold, drop the hint and the same semi-join shuffles on p.
# - HOT-BASKET VALVE: one degenerate basket of n items emits n^2/2
#   pairs with no bound — the linkage family's max_block_pairs
#   problem wearing a different key. mine_frequent_pairs_capped drops
#   baskets larger than {MINE_MAX_BASKET_ITEMS} items BEFORE pair
#   generation, and mine_basket_census is the read-first number (the
#   link_block_census pattern: census -> pick cap -> capped run);
#   the oracle replays the cap as the identical HAVING.
# - The distinct basket frame feeds FOUR consumers (both self-join
#   sides, the per-part counts, the basket total); it is persisted
#   MEMORY_AND_DISK and materialized by the n_baskets count — unlike
#   round 11's localCheckpoint, the persisted blocks keep their
#   LINEAGE, so an executor loss on a real cluster recomputes the
#   partition instead of failing the job (localCheckpoint blocks are
#   non-replicated and unrecoverable).
#
# Pair mass after the valve is bounded by cap^2/2 per basket (linear
# in baskets); support counting is one partial-agg shuffle on the
# pair key. Support and the per-part counts are exact integers; lift
# = (support * n_baskets) / (cnt_a * cnt_b) multiplies int64s exactly
# on both engines and divides once — bit-identical.
MINE_MINSUP = 3
MINE_MAX_BASKET_ITEMS = 8  # valve; census shows 1..17-item baskets


def _basket_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (order o, part p) basket frame, persisted
    MEMORY_AND_DISK (cluster-safe: recompute-on-loss lineage, not
    the unrecoverable localCheckpoint blocks)."""
    from pyspark import StorageLevel

    return (
        t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


def _mine_pairs(b: DataFrame, n_baskets: int) -> DataFrame:
    """A-Priori L2 over an already-materialized basket frame: L1
    item prefilter -> within-basket self-join -> support >= minsup
    -> exact-integer lift against the FULL frame item counts."""
    cnt = b.groupBy("p").agg(F.count(F.lit(1)).alias("cnt"))
    # L1: only items that can still reach pair support generate pairs
    l1 = cnt.filter(F.col("cnt") >= MINE_MINSUP).select("p")
    bf = b.join(F.broadcast(l1), "p", "semi")
    pairs = (
        bf.alias("x")
        .join(
            bf.alias("y"),
            (F.col("x.o") == F.col("y.o"))
            & (F.col("x.p") < F.col("y.p")),
        )
        .select(
            F.col("x.p").alias("part_a"), F.col("y.p").alias("part_b")
        )
    )
    sup = (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= MINE_MINSUP)
    )
    return (
        sup.join(
            F.broadcast(cnt.withColumnRenamed("p", "part_a")
                        .withColumnRenamed("cnt", "ca")),
            "part_a",
        )
        .join(
            F.broadcast(cnt.withColumnRenamed("p", "part_b")
                        .withColumnRenamed("cnt", "cb")),
            "part_b",
        )
        .select(
            "part_a", "part_b", "support",
            (
                (F.col("support") * F.lit(n_baskets))
                / (F.col("ca") * F.col("cb"))
            ).alias("lift"),
        )
    )


def mine_frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent part pairs across order baskets. Returns (part_a,
    part_b, support, lift) for pairs with support >= {MINE_MINSUP}."""
    b = _basket_frame(spark, sf_dir)
    n_baskets = b.select("o").distinct().count()  # materializes b
    return _mine_pairs(b, n_baskets)


def mine_basket_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The read-first number before picking MINE_MAX_BASKET_ITEMS
    (the link_block_census pattern): basket-size histogram with each
    size candidate-pair mass k*(k-1)/2 * n. Integers, hash-exact.
    Returns (basket_items, n_baskets, pair_mass)."""
    b = _basket_frame(spark, sf_dir)
    sizes = b.groupBy("o").agg(F.count(F.lit(1)).alias("basket_items"))
    return (
        sizes.groupBy("basket_items")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
        .select(
            "basket_items",
            "n_baskets",
            (
                F.col("basket_items")
                * (F.col("basket_items") - 1)
                / F.lit(2)
                * F.col("n_baskets")
            ).cast("long").alias("pair_mass"),
        )
    )


def mine_frequent_pairs_capped(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """mine_frequent_pairs with the hot-basket valve engaged: baskets
    larger than {MINE_MAX_BASKET_ITEMS} distinct items are dropped
    BEFORE pair generation (the degenerate-basket n^2 guard), and the
    whole computation — support, item counts, n_baskets — replays on
    the censored frame. Same output contract."""
    b = _basket_frame(spark, sf_dir)
    keep = (
        b.groupBy("o")
        .agg(F.count(F.lit(1)).alias("k"))
        .filter(F.col("k") <= MINE_MAX_BASKET_ITEMS)
        .select("o")
    )
    # semi-join shuffles on o, co-partitioned with the size groupBy —
    # the keep side is one row per surviving basket (NOT broadcast:
    # it scales with orders, unlike the L1 vocabulary)
    bc = b.join(keep, "o", "semi")
    n_baskets = bc.select("o").distinct().count()  # materializes b
    return _mine_pairs(bc, n_baskets)


ORACLE_FREQ_PAIRS = f"""
WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
nb AS (SELECT count(DISTINCT o) AS n FROM b),
pr AS (
  SELECT x.p AS part_a, y.p AS part_b
  FROM b x JOIN b y ON x.o = y.o AND x.p < y.p
),
sup AS (
  SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS support
  FROM pr GROUP BY part_a, part_b
  HAVING count(*) >= {MINE_MINSUP}
),
cnt AS (SELECT p, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY p)
SELECT s.part_a, s.part_b, s.support,
       CAST(s.support * nb.n AS BIGINT)
       / CAST(ca.c * cb.c AS BIGINT) AS lift
FROM sup s
JOIN cnt ca ON ca.p = s.part_a
JOIN cnt cb ON cb.p = s.part_b, nb
"""


ORACLE_BASKET_CENSUS = """
WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
s AS (SELECT o, CAST(count(*) AS BIGINT) AS basket_items FROM b GROUP BY o)
SELECT basket_items, CAST(count(*) AS BIGINT) AS n_baskets,
       CAST(basket_items * (basket_items - 1) / 2 * count(*) AS BIGINT)
         AS pair_mass
FROM s GROUP BY basket_items
"""


ORACLE_FREQ_PAIRS_CAPPED = f"""
WITH b0 AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
keep AS (
  SELECT o FROM b0 GROUP BY o
  HAVING count(*) <= {MINE_MAX_BASKET_ITEMS}
),
b AS (SELECT * FROM b0 WHERE o IN (SELECT o FROM keep)),
nb AS (SELECT count(DISTINCT o) AS n FROM b),
pr AS (
  SELECT x.p AS part_a, y.p AS part_b
  FROM b x JOIN b y ON x.o = y.o AND x.p < y.p
),
sup AS (
  SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS support
  FROM pr GROUP BY part_a, part_b
  HAVING count(*) >= {MINE_MINSUP}
),
cnt AS (SELECT p, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY p)
SELECT s.part_a, s.part_b, s.support,
       CAST(s.support * nb.n AS BIGINT)
       / CAST(ca.c * cb.c AS BIGINT) AS lift
FROM sup s
JOIN cnt ca ON ca.p = s.part_a
JOIN cnt cb ON cb.p = s.part_b, nb
"""


# ---- k-anonymity census (round 11) ----
#
# The privacy gate next to the DQ expectation suite (Sweeney 2002,
# "k-anonymity: a model for protecting privacy", IJUFKS — the
# data-release standard): a row is re-identifiable when its
# quasi-identifier combination is shared by fewer than k records.
# Census over (nation, market segment, $1000 balance band) — the
# released-attribute shape — with every combination's group size and
# its at-risk flag. All integers + one boolean: hash-exact.
#
# The balance band uses explicit floor(cents / width) on BOTH engines:
# Spark's integer `div` TRUNCATES toward zero while DuckDB's `//`
# FLOORS, so negative balances would land in different bands — the
# one semantic trap in this lane, made explicit instead of implicit.
#
# Scale shape: one partial-agg shuffle on the QI key; the census is
# bounded by the QI domain, not the row count.
KANON_K = 5
KANON_BAND_CENTS = 100000  # $1000 bands


def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity census of customer quasi-identifiers. Returns
    (nation, segment, bal_band, n, at_risk) for every observed
    combination; at_risk = group smaller than {KANON_K}."""
    qi = t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(
            F.round(F.col("c_acctbal") * 100, 0).cast("long")
            / F.lit(KANON_BAND_CENTS)
        ).cast("long").alias("bal_band"),
    )
    return (
        qi.groupBy("nation", "segment", "bal_band")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "nation", "segment", "bal_band", "n",
            (F.col("n") < KANON_K).alias("at_risk"),
        )
    )


ORACLE_KANON = f"""
WITH qi AS (
  SELECT c_nationkey AS nation, c_mktsegment AS segment,
         CAST(floor(CAST(round(c_acctbal * 100, 0) AS BIGINT)
                    / {KANON_BAND_CENTS}) AS BIGINT) AS bal_band
  FROM customer
)
SELECT nation, segment, bal_band, count(*) AS n,
       count(*) < {KANON_K} AS at_risk
FROM qi GROUP BY nation, segment, bal_band
"""


# l-diversity (Machanavajjhala 2007, TKDD): k-anonymity's companion —
# a group can be large yet still leak if every member shares the same
# SENSITIVE value. QI = (nation, balance band); sensitive = market
# segment; a group is diverse when it carries >= L distinct segments.
KANON_L = 2


def dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity census over (nation, bal_band) with segment as the
    sensitive attribute. Returns (nation, bal_band, n, n_sensitive,
    diverse)."""
    qi = t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nation"),
        F.floor(
            F.round(F.col("c_acctbal") * 100, 0).cast("long")
            / F.lit(KANON_BAND_CENTS)
        ).cast("long").alias("bal_band"),
        F.col("c_mktsegment").alias("segment"),
    )
    return (
        qi.groupBy("nation", "bal_band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("segment").alias("n_sensitive"),
        )
        .select(
            "nation", "bal_band", "n", "n_sensitive",
            (F.col("n_sensitive") >= KANON_L).alias("diverse"),
        )
    )


ORACLE_LDIV = f"""
WITH qi AS (
  SELECT c_nationkey AS nation,
         CAST(floor(CAST(round(c_acctbal * 100, 0) AS BIGINT)
                    / {KANON_BAND_CENTS}) AS BIGINT) AS bal_band,
         c_mktsegment AS segment
  FROM customer
)
SELECT nation, bal_band, count(*) AS n,
       count(DISTINCT segment) AS n_sensitive,
       count(DISTINCT segment) >= {KANON_L} AS diverse
FROM qi GROUP BY nation, bal_band
"""


# ---- column profiling (round 10) ----
#
# Deequ / Great-Expectations-style data-quality profiling: one pass
# over a table yielding per-column completeness and cardinality — the
# pre-ingest QA sweep a 100 TB lake runs on every landed batch. The
# melt (stack) is a map-side 6x row expansion of STRING CARRIERS
# (injective casts — two distinct source values never collide, so the
# per-engine distinct COUNT is engine-independent even though the
# renderings differ); the contract is all-BIGINT, immune to float/
# timestamp formatting divergence by construction. At warehouse scale
# the exact count(distinct) swaps for approx_count_distinct per the
# q16/HLL posture.
PROFILE_COLS = [
    "o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority",
]


def stats_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of the orders table: row count, null count,
    exact distinct count. Returns (col_name, n_rows, n_null,
    n_distinct) — one row per profiled column, all BIGINT."""
    pairs = ", ".join(
        f"'{c}', cast({c} as string)" for c in PROFILE_COLS
    )
    stacked = t(spark, sf_dir, "orders").select(
        F.expr(
            f"stack({len(PROFILE_COLS)}, {pairs}) as (col_name, val)"
        )
    )
    return stacked.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("val").isNull(), 1).otherwise(0)).alias("n_null"),
        F.countDistinct("val").alias("n_distinct"),
    )


ORACLE_PROFILE = (
    "SELECT col_name, count(*) AS n_rows,\n"
    "       CAST(sum(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
    " AS n_null,\n"
    "       count(DISTINCT val) AS n_distinct\n"
    "FROM (\n"
    + "\nUNION ALL\n".join(
        f"  SELECT '{c}' AS col_name, CAST({c} AS VARCHAR) AS val FROM orders"
        for c in PROFILE_COLS
    )
    + "\n)\nGROUP BY col_name"
)


# ---- numeric column profiling + HLL posture (round 11) ----
#
# The two extensions the round-10 profile documented but didn't ship
# (round-10 verdict item 4), both over the SAME one-stacked-pass shape
# (operators/profile.py):
#
# - stats_profile_numeric: Deequ-parity min/max/sum/mean per numeric
#   column on exact BIGINT carriers (cents for money, epoch-days for
#   dates) — min/max/sum exact int64, mean one IEEE division of
#   identical integers, so the whole row is hash-exact with no
#   rounding contract;
# - stats_profile_hll_contract: the warehouse-scale cardinality
#   posture — approx_count_distinct (HLL++) per column, gated by the
#   5-sigma relative-error contract (the stats_hll_distinct_contract
#   protocol) because sketch values are partition-order dependent.
PROFILE_NUM_CARRIERS = {
    "o_orderkey": "o_orderkey",
    "o_custkey": "o_custkey",
    "o_totalprice_cents": "CAST(round(o_totalprice * 100, 0) AS BIGINT)",
    "o_orderdate_days": "date_diff('day', DATE '1970-01-01', o_orderdate)",
}
PROFILE_HLL_RSD = 0.02
PROFILE_HLL_BOUND = 0.10  # 5 sigma at rsd = 0.02


def stats_profile_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric per-column profile of orders (operators/profile.py:
    profile_numeric): (col_name, n_rows, n_null, min_v, max_v, sum_v,
    mean_v) on exact BIGINT carriers."""
    from ..operators.profile import profile_numeric

    carriers = {
        "o_orderkey": F.col("o_orderkey"),
        "o_custkey": F.col("o_custkey"),
        "o_totalprice_cents": F.round(F.col("o_totalprice") * 100, 0).cast(
            "long"
        ),
        "o_orderdate_days": F.datediff(
            F.col("o_orderdate"), F.lit("1970-01-01").cast("date")
        ),
    }
    return profile_numeric(t(spark, sf_dir, "orders"), carriers)


ORACLE_PROFILE_NUMERIC = (
    "SELECT col_name, count(*) AS n_rows,\n"
    "       CAST(sum(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
    " AS n_null,\n"
    "       CAST(min(val) AS BIGINT) AS min_v,\n"
    "       CAST(max(val) AS BIGINT) AS max_v,\n"
    "       CAST(sum(val) AS BIGINT) AS sum_v,\n"
    "       CAST(sum(val) AS BIGINT) / CAST(count(val) AS BIGINT)"
    " AS mean_v\n"
    "FROM (\n"
    + "\nUNION ALL\n".join(
        f"  SELECT '{name}' AS col_name, CAST({expr} AS BIGINT) AS val"
        " FROM orders"
        for name, expr in PROFILE_NUM_CARRIERS.items()
    )
    + "\n)\nGROUP BY col_name"
)


def stats_profile_hll_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cardinality profile at the warehouse posture: HLL++ estimate
    per column (operators/profile.py:profile_completeness with
    approx_rsd={PROFILE_HLL_RSD}) must land within {PROFILE_HLL_BOUND}
    relative of the exact distinct count. Returns (col_name,
    exact_distinct, within_bound)."""
    from ..operators.profile import profile_completeness

    from ..operators.profile import stack_carriers

    orders = t(spark, sf_dir, "orders")
    carriers = {c: F.col(c).cast("string") for c in PROFILE_COLS}
    # estimate and exact ride the SAME aggregation over one stacked
    # pass — a second profile_completeness call would re-scan orders
    stacked = stack_carriers(orders, carriers, "string")
    both = stacked.groupBy("col_name").agg(
        F.count_distinct("val").alias("exact_distinct"),
        F.approx_count_distinct("val", PROFILE_HLL_RSD).alias("est"),
    )
    return both.select(
        "col_name",
        "exact_distinct",
        (
            F.abs(F.col("est") - F.col("exact_distinct"))
            <= F.lit(PROFILE_HLL_BOUND) * F.col("exact_distinct")
        ).alias("within_bound"),
    )


ORACLE_PROFILE_HLL = (
    "SELECT col_name, count(DISTINCT val) AS exact_distinct,"
    " TRUE AS within_bound\nFROM (\n"
    + "\nUNION ALL\n".join(
        f"  SELECT '{c}' AS col_name, CAST({c} AS VARCHAR) AS val FROM orders"
        for c in PROFILE_COLS
    )
    + "\n)\nGROUP BY col_name"
)


QUERIES = {
    "text_bm25_rank": text_bm25_rank,
    "search_hybrid_rrf": search_hybrid_rrf,
    "dedup_substring_spans": dedup_substring_spans,
    "text_gopher_signals": text_gopher_signals,
    "mix_domain_rates": mix_domain_rates,
    "mix_unimax_allocation": mix_unimax_allocation,
    "decon_semantic_overlap": decon_semantic_overlap,
    "stats_heavy_hitters": stats_heavy_hitters,
    "stats_countmin_contract": stats_countmin_contract,
    "streaming_sketch_contract": streaming_sketch_contract,
    "text_chunking": text_chunking,
    "dedup_containment_pairs": dedup_containment_pairs,
    "dedup_jaccard_prefix_join": dedup_jaccard_prefix_join,
    "sample_k_per_lang": sample_k_per_lang,
    "dedup_keep_best": dedup_keep_best,
    "dedup_containment_join": dedup_containment_join,
    "stats_hll_distinct_contract": stats_hll_distinct_contract,
    "order_token_shards": order_token_shards,
    "dedup_bloom_antijoin": dedup_bloom_antijoin,
    "graph_pagerank": graph_pagerank,
    "streaming_heavy_hitters_topk": streaming_heavy_hitters_topk,
    "mix_dsir_selection": mix_dsir_selection,
    "graph_ppr_weighted": graph_ppr_weighted,
    "streaming_static_enrich_counts": streaming_static_enrich_counts,
    "ts_gapfill_locf": ts_gapfill_locf,
    "ts_gapfill_linear": ts_gapfill_linear,
    "graph_bfs_levels": graph_bfs_levels,
    "reshape_unpivot_melt": reshape_unpivot_melt,
    "events_funnel": events_funnel,
    "events_retention": events_retention,
    "events_transitions": events_transitions,
    "dedup_embedding_lsh_pairs": dedup_embedding_lsh_pairs,
    "dim_scd2_history": dim_scd2_history,
    "cdc_latest_snapshot": cdc_latest_snapshot,
    "join_interval_overlap": join_interval_overlap,
    "window_time_range_agg": window_time_range_agg,
    "text_nb_lang_classifier": text_nb_lang_classifier,
    "order_pack_sequences": order_pack_sequences,
    "dim_snapshot_diff": dim_snapshot_diff,
    "agg_session_window": agg_session_window,
    "streaming_cdc_upsert": streaming_cdc_upsert,
    "layout_zorder_keys": layout_zorder_keys,
    "stats_quantile_contract": stats_quantile_contract,
    "join_asof_forward": join_asof_forward,
    "sample_weighted_docs": sample_weighted_docs,
    "dim_scd2_asof_lookup": dim_scd2_asof_lookup,
    "join_skew_salted": join_skew_salted,
    "streaming_python_dist_source": streaming_python_dist_source,
    "dedup_editdistance_pairs": dedup_editdistance_pairs,
    "ts_dtw_topk_similarity": ts_dtw_topk_similarity,
    "dedup_editdistance_lookup": dedup_editdistance_lookup,
    "ts_dtw_banded_topk": ts_dtw_banded_topk,
    "dedup_editdistance_collapsed": dedup_editdistance_collapsed,
    "dedup_image_phash": dedup_image_phash,
    "dedup_audio_fingerprint": dedup_audio_fingerprint,
    "dedup_image_phash_wide": dedup_image_phash_wide,
    "dedup_video_clips": dedup_video_clips,
    "dedup_image_phash_resized": dedup_image_phash_resized,
    "stats_mad_outliers": stats_mad_outliers,
    "stats_mad_approx_contract": stats_mad_approx_contract,
    "link_customer_records": link_customer_records,
    "link_customer_best": link_customer_best,
    "link_customer_learned": link_customer_learned,
    "link_customer_jw": link_customer_jw,
    "vector_pq_adc_topk": vector_pq_adc_topk,
    "link_part_phonetic": link_part_phonetic,
    "link_part_phonetic_capped": link_part_phonetic_capped,
    "select_kcenter_coreset": select_kcenter_coreset,
    "search_mmr_rerank": search_mmr_rerank,
    "ts_ewma_dyadic": ts_ewma_dyadic,
    "decon_phrase_matches": decon_phrase_matches,
    "stats_psi_drift": stats_psi_drift,
    "stats_column_profile": stats_column_profile,
    "link_entity_clusters": link_entity_clusters,
    "link_entity_golden": link_entity_golden,
    "stats_psi_quantile_contract": stats_psi_quantile_contract,
    "stats_profile_numeric": stats_profile_numeric,
    "stats_profile_hll_contract": stats_profile_hll_contract,
    "stats_ks_drift": stats_ks_drift,
    "dq_expectations": dq_expectations,
    "link_block_census": link_block_census,
    "dedup_image_phash_wide_bloom": dedup_image_phash_wide_bloom,
    "link_part_phonetic_tf": link_part_phonetic_tf,
    "ts_ewma_spikes": ts_ewma_spikes,
    "stats_group_ols_trend": stats_group_ols_trend,
    "ts_cusum_alarms": ts_cusum_alarms,
    "streaming_psi_drift": streaming_psi_drift,
    "layout_hilbert_keys": layout_hilbert_keys,
    "dq_k_anonymity": dq_k_anonymity,
    "dq_l_diversity": dq_l_diversity,
    "link_eval_metrics": link_eval_metrics,
    "mine_frequent_pairs": mine_frequent_pairs,
    "stats_ols_outliers": stats_ols_outliers,
    "mine_basket_census": mine_basket_census,
    "mine_frequent_pairs_capped": mine_frequent_pairs_capped,
    "streaming_cusum_alarms": streaming_cusum_alarms,
    "dq_metric_anomalies": dq_metric_anomalies,
    "link_clerical_bands": link_clerical_bands,
    "link_band_purity": link_band_purity,
}

ORACLE = {
    "text_bm25_rank": ORACLE_BM25_RANK,
    "search_hybrid_rrf": ORACLE_HYBRID_RRF,
    "dedup_substring_spans": ORACLE_SUBSTRING,
    "text_gopher_signals": ORACLE_GOPHER,
    "mix_domain_rates": ORACLE_MIX_RATES,
    "mix_unimax_allocation": ORACLE_UNIMAX,
    "decon_semantic_overlap": ORACLE_SEM_OVERLAP,
    "stats_heavy_hitters": ORACLE_HEAVY_HITTERS,
    "stats_countmin_contract": ORACLE_COUNTMIN,
    "streaming_sketch_contract": ORACLE_STREAMING_SKETCH,
    "text_chunking": ORACLE_CHUNKING,
    "dedup_containment_pairs": _oracle_containment(),
    "dedup_jaccard_prefix_join": _oracle_prefix_join(),
    "sample_k_per_lang": ORACLE_SAMPLE_K,
    "dedup_keep_best": _oracle_keep_best(),
    "dedup_containment_join": _oracle_containment_join(),
    "stats_hll_distinct_contract": ORACLE_HLL_DISTINCT,
    "order_token_shards": ORACLE_TOKEN_SHARDS,
    "dedup_bloom_antijoin": ORACLE_BLOOM_ANTIJOIN,
    "graph_pagerank": _oracle_pagerank(),
    "streaming_heavy_hitters_topk": ORACLE_STREAMING_HH,
    "mix_dsir_selection": ORACLE_DSIR,
    "graph_ppr_weighted": _oracle_ppr_weighted(),
    "streaming_static_enrich_counts": ORACLE_STATIC_ENRICH,
    "ts_gapfill_locf": ORACLE_GAPFILL_LOCF,
    "ts_gapfill_linear": ORACLE_GAPFILL_LINEAR,
    "graph_bfs_levels": ORACLE_BFS_LEVELS,
    "reshape_unpivot_melt": ORACLE_UNPIVOT,
    "events_funnel": ORACLE_FUNNEL,
    "events_retention": ORACLE_RETENTION,
    "events_transitions": ORACLE_TRANSITIONS,
    "dedup_embedding_lsh_pairs": ORACLE_EMB_LSH,
    "dim_scd2_history": ORACLE_SCD2,
    "cdc_latest_snapshot": ORACLE_CDC,
    "join_interval_overlap": ORACLE_IVL_OVERLAP,
    "window_time_range_agg": ORACLE_RANGE_WINDOW,
    "text_nb_lang_classifier": ORACLE_NB,
    "order_pack_sequences": ORACLE_PACK_SEQ,
    "dim_snapshot_diff": ORACLE_SNAPSHOT_DIFF,
    "agg_session_window": ORACLE_SESSION_WINDOW,
    "streaming_cdc_upsert": ORACLE_CDC,
    "layout_zorder_keys": ORACLE_ZORDER,
    "stats_quantile_contract": ORACLE_QUANTILE,
    "join_asof_forward": ORACLE_ASOF_FORWARD,
    "sample_weighted_docs": ORACLE_ES_SAMPLE,
    "dim_scd2_asof_lookup": ORACLE_SCD2_ASOF,
    "join_skew_salted": ORACLE_SKEW_SALTED,
    "streaming_python_dist_source": ORACLE_PY_DIST_STREAM,
    "dedup_editdistance_pairs": ORACLE_EDITDIST,
    "ts_dtw_topk_similarity": ORACLE_DTW,
    "dedup_editdistance_lookup": ORACLE_EDITDIST_LOOKUP,
    "ts_dtw_banded_topk": ORACLE_DTW_BANDED,
    "dedup_editdistance_collapsed": ORACLE_EDITDIST,
    "dedup_image_phash": ORACLE_IMAGE_PHASH,
    "dedup_audio_fingerprint": ORACLE_AUDIO_FP,
    "dedup_image_phash_wide": ORACLE_IMAGE_PHASH_WIDE,
    "dedup_video_clips": ORACLE_VIDEO_CLIPS,
    "dedup_image_phash_resized": ORACLE_IMAGE_PHASH,
    "stats_mad_outliers": ORACLE_MAD_OUTLIERS,
    "stats_mad_approx_contract": ORACLE_MAD_APPROX,
    "link_customer_records": ORACLE_FS_LINK,
    "link_customer_best": ORACLE_FS_BEST,
    "link_customer_learned": ORACLE_FS_LEARNED,
    "link_customer_jw": ORACLE_FS_JW,
    "vector_pq_adc_topk": ORACLE_PQ_ADC,
    "link_part_phonetic": ORACLE_PHON_LINK,
    "link_part_phonetic_capped": ORACLE_PHON_LINK_CAPPED,
    "select_kcenter_coreset": ORACLE_KCENTER,
    "search_mmr_rerank": ORACLE_MMR,
    "ts_ewma_dyadic": ORACLE_EWMA,
    "decon_phrase_matches": ORACLE_PHRASE,
    "stats_psi_drift": ORACLE_PSI,
    "stats_column_profile": ORACLE_PROFILE,
    "link_entity_clusters": ORACLE_ENTITY_CLUSTERS,
    "link_entity_golden": ORACLE_ENTITY_GOLDEN,
    "stats_psi_quantile_contract": ORACLE_PSI_QUANTILE,
    "stats_profile_numeric": ORACLE_PROFILE_NUMERIC,
    "stats_profile_hll_contract": ORACLE_PROFILE_HLL,
    "stats_ks_drift": ORACLE_KS,
    "dq_expectations": ORACLE_DQ,
    "link_block_census": ORACLE_BLOCK_CENSUS,
    "dedup_image_phash_wide_bloom": ORACLE_IMAGE_PHASH_WIDE,
    "link_part_phonetic_tf": ORACLE_PHON_TF,
    "ts_ewma_spikes": ORACLE_EWMA_SPIKES,
    "stats_group_ols_trend": ORACLE_OLS,
    "ts_cusum_alarms": ORACLE_CUSUM,
    "streaming_psi_drift": ORACLE_PSI,
    "layout_hilbert_keys": ORACLE_HILBERT,
    "dq_k_anonymity": ORACLE_KANON,
    "dq_l_diversity": ORACLE_LDIV,
    "link_eval_metrics": ORACLE_LINK_EVAL,
    "mine_frequent_pairs": ORACLE_FREQ_PAIRS,
    "stats_ols_outliers": ORACLE_OLS_OUTLIERS,
    "mine_basket_census": ORACLE_BASKET_CENSUS,
    "mine_frequent_pairs_capped": ORACLE_FREQ_PAIRS_CAPPED,
    "streaming_cusum_alarms": ORACLE_CUSUM,
    "dq_metric_anomalies": ORACLE_DQ_ANOMALIES,
    "link_clerical_bands": ORACLE_FS_BANDS,
    "link_band_purity": ORACLE_BAND_PURITY,
}
