"""Text-analysis query inventory (north-star, SURVEY.md §2.11) over
``documents``: token stats, quality scoring, n-gram language ID,
document fingerprinting. All built-in-function compositions with exact
DuckDB oracle twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    STOPWORDS,
    predicted_lang,
    QUALITY_PUNCT_RE as _PUNCT_RE,
    char_shingles,
    quality_score,
    stopword_hits,
    tokens,
)
from ..sources.readers import load_table as t
from ..sources.readers import widen_if_starved

# canonical stopword lists live in functions/text.py (shared with the
# curation language gate); imported above for the oracle twins
FINGERPRINT_NGRAM = 8
# BPE-ish pre-tokenizer: letter runs, digit runs, punctuation runs — the
# regex-split shape subword tokenizers apply before merges. Identical
# pattern semantics in Spark and DuckDB regexp_extract_all.
_BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]+"


def text_normalize_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus normalization + token counting in one projection — the
    first stage of every training-data pipeline: lowercase, strip
    non-alphanumerics to spaces, collapse whitespace runs, trim (pure
    regexp_replace chain, JVM codegen'd), alongside whitespace AND
    BPE-ish-regex token counts on the raw text so the reduction is
    measurable and a subword-budget estimate rides along for free."""
    docs = t(spark, sf_dir, "documents")
    toks = tokens("text")
    bpe = F.regexp_extract_all(F.lower(F.col("text")), F.lit(_BPE_RE), 0)
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9\\s]", " "),
            "\\s+",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        cleaned.alias("clean_text"),
        F.size(toks).alias("n_tokens"),
        F.size(bpe).alias("n_tokens_bpe"),
        F.length("text").cast("bigint").alias("n_chars_raw"),
        F.length(cleaned).cast("bigint").alias("n_chars_clean"),
        F.round(F.length("text") / F.size(toks), 4).alias("chars_per_token"),
    )


ORACLE_NORMALIZE_TOKENS = rf"""
WITH x AS (
  SELECT doc_id, text,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
                             '\s+', ' ', 'g')) AS clean_text,
         string_split_regex(lower(text), '\s+') AS w,
         regexp_extract_all(lower(text), '{_BPE_RE}') AS bpe
  FROM documents
)
SELECT doc_id,
       clean_text,
       CAST(len(w) AS INT) AS n_tokens,
       CAST(len(bpe) AS INT) AS n_tokens_bpe,
       CAST(length(text) AS BIGINT) AS n_chars_raw,
       CAST(length(clean_text) AS BIGINT) AS n_chars_clean,
       round(length(text) / len(w), 4) AS chars_per_token
FROM x
"""


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: length, punctuation ratio, stopword
    ratio — the pre-training corpus filter shape."""
    docs = t(spark, sf_dir, "documents")
    toks = tokens("text")
    n_tokens = F.size(toks)
    lower = F.lower(F.col("text"))
    n_punct = F.length(F.regexp_replace(lower, _PUNCT_RE, ""))
    punct_ratio = n_punct / F.length("text")
    stop_ratio = stopword_hits(toks, STOPWORDS["en"]) / n_tokens
    quality = quality_score("text")
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(quality, 4).alias("quality_score"),
    )


_EN_LIST = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
ORACLE_QUALITY = rf"""
WITH x AS (
  SELECT doc_id, text,
         string_split_regex(lower(text), '\s+') AS w,
         length(regexp_replace(lower(text), '{_PUNCT_RE}', '', 'g')) AS n_punct
  FROM documents
)
SELECT doc_id,
       CAST(len(w) AS INT) AS n_tokens,
       round(n_punct / length(text), 4) AS punct_ratio,
       round(len(list_filter(w, tok -> tok IN ({_EN_LIST}))) / len(w), 4)
           AS stopword_ratio,
       round(least(1.0, len(w) / 100.0) * (1 - n_punct / length(text)), 4)
           AS quality_score
FROM x
"""


def text_lang_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID + content fingerprint in one projection: stopword-hit
    language ID with a deterministic argmax tiebreak (first language in
    en > es > de > fr order wins ties), plus a min-hash over rolling
    character 8-grams (winnowing-style content signature, portable md5)."""
    # the fingerprint evaluates one md5 per rolling 8-gram — thousands
    # per document — and a single small parquet file scans as ONE task,
    # serializing all of it on one core. Spreading rows across the
    # cluster first costs one narrow shuffle of the text column and
    # buys full-width md5 throughput (r14: 3.0-3.5 s -> ~0.5 s at
    # sf0.1, row-identical; guide §2.5 "input skew: repartition
    # immediately after the read"). Conditional (r15): a production
    # corpus lands as many files and gets this parallelism from the
    # scan itself — then no Exchange is added.
    docs = widen_if_starved(t(spark, sf_dir, "documents"))
    toks = tokens("text")
    hits = {lang: stopword_hits(toks, words) for lang, words in STOPWORDS.items()}
    langs = list(STOPWORDS)
    pred = predicted_lang(toks, STOPWORDS)
    grams = char_shingles("text", FINGERPRINT_NGRAM)
    fp = F.array_min(F.transform(grams, F.md5))
    return docs.select(
        "doc_id",
        *[hits[lang].alias(f"{lang}_hits") for lang in langs],
        pred.alias("predicted_lang"),
        F.col("lang").alias("actual_lang"),
        fp.alias("fingerprint"),
    )


def _lang_hits_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"CAST(len(list_filter(w, tok -> tok IN ({words}))) AS INT)"


ORACLE_LANG_FINGERPRINT = rf"""
WITH x AS (
  SELECT doc_id, lang, text, string_split_regex(lower(text), '\s+') AS w
  FROM documents
),
h AS (
  SELECT doc_id, lang, text,
         {_lang_hits_sql("en")} AS en_hits,
         {_lang_hits_sql("es")} AS es_hits,
         {_lang_hits_sql("de")} AS de_hits,
         {_lang_hits_sql("fr")} AS fr_hits
  FROM x
)
SELECT doc_id, en_hits, es_hits, de_hits, fr_hits,
       CASE WHEN en_hits >= greatest(es_hits, de_hits, fr_hits) THEN 'en'
            WHEN es_hits >= greatest(de_hits, fr_hits) THEN 'es'
            WHEN de_hits >= fr_hits THEN 'de'
            ELSE 'fr' END AS predicted_lang,
       lang AS actual_lang,
       CASE WHEN length(text) >= {FINGERPRINT_NGRAM}
            THEN (SELECT min(md5(substr(text, i, {FINGERPRINT_NGRAM})))
                  FROM unnest(range(1, length(text) - {FINGERPRINT_NGRAM - 2})) AS t(i))
            ELSE md5(text) END AS fingerprint
FROM h
"""


def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document, pure built-ins: token counts ->
    doc lengths -> document frequencies -> tf*ln(N/df), ranked per doc.

    Ranking uses the integer pair (term count DESC, doc freq ASC) with a
    token tiebreak — the same ordering TF-IDF induces within a document,
    but immune to cross-engine libm drift in ln(); the tfidf value
    itself is emitted rounded.
    """
    docs = t(spark, sf_dir, "documents")
    n_docs = docs.count()  # scalar for the idf constant (one tiny job)
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf_raw"))
    doc_len = tf.groupBy("doc_id").agg(F.sum("tf_raw").alias("doc_len"))
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(
        F.desc("tf_raw"), F.asc("df"), F.asc("token")
    )
    tfidf = (F.col("tf_raw") / F.col("doc_len")) * F.log(F.lit(n_docs) / F.col("df"))
    return (
        tf.join(doc_len, "doc_id")
        .join(df_, "token")
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select(
            "doc_id",
            "token",
            "tf_raw",
            "df",
            F.round(tfidf, 4).alias("tfidf"),
            "rank",
        )
    )


ORACLE_TFIDF = r"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS token
  FROM documents
),
tf AS (
  SELECT doc_id, token, count(*) AS tf_raw FROM tok GROUP BY doc_id, token
),
dl AS (SELECT doc_id, sum(tf_raw) AS doc_len FROM tf GROUP BY doc_id),
df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
n AS (SELECT count(*) AS n_docs FROM documents),
ranked AS (
  SELECT tf.doc_id, tf.token, tf.tf_raw, df.df,
         round((tf.tf_raw / dl.doc_len) * ln(n.n_docs / df.df), 4) AS tfidf,
         CAST(row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf_raw DESC, df.df ASC, tf.token ASC) AS INT) AS rank
  FROM tf JOIN dl ON tf.doc_id = dl.doc_id
          JOIN df ON tf.token = df.token
          CROSS JOIN n
)
SELECT doc_id, token, tf_raw, df, tfidf, rank FROM ranked WHERE rank <= 3
"""


QUERIES = {
    "text_normalize_tokens": text_normalize_tokens,
    "text_quality_score": text_quality_score,
    "text_lang_fingerprint": text_lang_fingerprint,
    "text_tfidf_top_terms": text_tfidf_top_terms,
}

ORACLE = {
    "text_normalize_tokens": ORACLE_NORMALIZE_TOKENS,
    "text_quality_score": ORACLE_QUALITY,
    "text_lang_fingerprint": ORACLE_LANG_FINGERPRINT,
    "text_tfidf_top_terms": ORACLE_TFIDF,
}
