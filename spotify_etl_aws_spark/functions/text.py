"""Text-analysis expression builders (north-star ops, SURVEY.md §2.11).

All pure ``pyspark.sql.functions`` compositions — JVM-side, codegen'd,
no Python UDFs in the hot path. Each has an exact ANSI-SQL counterpart
(DuckDB) used by the oracle harness, so the cross-engine contract is:
same tokenization regex, same shingling indices, same hash (md5).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"

# Tiny per-language stopword lists for the stopword-hit language-ID
# heuristic — SQL-portable (plain IN lists on both engines). The
# canonical copy; queries/text.py re-exports it for the oracle twins.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "y", "que", "en", "los"],
    "de": ["der", "die", "das", "und", "zu", "ist", "ein"],
    "fr": ["le", "la", "de", "et", "les", "des", "est"],
}


def tokens(col: Column | str) -> Column:
    """Lowercased whitespace tokens. DuckDB twin:
    ``string_split_regex(lower(x), '\\s+')``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(c), TOKEN_SPLIT_RE)


def word_shingles(toks: Column, n: int, distinct: bool = True) -> Column:
    """N-gram word shingles joined with single spaces — distinct by
    default (the set-semantics the dedup/LSH lanes and their DuckDB
    twins use); ``distinct=False`` keeps every occurrence (the
    count-semantics the hashing-trick featurizer needs).

    DuckDB twin: ``array_to_string(w[i:i+n-1], ' ')`` over
    ``i in range(1, len(w) - n + 2)``. Documents with fewer than ``n``
    tokens produce an empty array (explode drops them).
    """
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    if distinct:
        grams = F.array_distinct(grams)
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def char_shingles(col: Column | str, n: int) -> Column:
    """Distinct character n-grams of the raw text (rolling fingerprint
    substrate). Texts shorter than ``n`` contribute themselves."""
    c = F.col(col) if isinstance(col, str) else col
    idx = F.sequence(F.lit(1), F.length(c) - (n - 1))
    grams = F.transform(idx, lambda i: F.substring(c, i, n))
    return F.when(F.length(c) >= n, F.array_distinct(grams)).otherwise(F.array(c))


def stopword_hits(toks: Column, stopwords: list[str]) -> Column:
    """Count of tokens that are in the stopword list (int)."""
    return F.size(F.filter(toks, lambda t: t.isin(*stopwords)))


# Characters that do NOT count as punctuation for the quality score
# (regexp_replace with this class leaves only the punctuation behind).
QUALITY_PUNCT_RE = "[a-z0-9 ]"


def quality_score(text_col: str = "text") -> Column:
    """The heuristic pre-training quality score — ONE definition shared
    by the oracle-checked query twins (queries/text.py, queries/dedup.py)
    and the curation plan, so the gate can never silently desynchronize
    from the checked formula: least(1, n_tokens/100) * (1 - punct_ratio).
    Raw (unrounded); round at presentation."""
    n_tokens = F.size(tokens(text_col))
    punct_ratio = F.length(
        F.regexp_replace(F.lower(F.col(text_col)), QUALITY_PUNCT_RE, "")
    ) / F.length(text_col)
    return F.least(F.lit(1.0), n_tokens / F.lit(100.0)) * (1 - punct_ratio)


def predicted_lang(
    toks: Column, stopword_map: dict[str, list[str]]
) -> Column:
    """Stopword-hit language ID with a deterministic argmax tiebreak
    (earlier key in ``stopword_map`` wins ties) — the expression behind
    the ``text_lang_fingerprint`` query, reusable as a curation-ladder
    language gate."""
    hits = {lang: stopword_hits(toks, words) for lang, words in stopword_map.items()}
    langs = list(stopword_map)
    pred = F.lit(langs[-1])
    for lang in reversed(langs[:-1]):
        later = [hits[other] for other in langs[langs.index(lang) + 1 :]]
        cond = (
            hits[lang] >= F.greatest(*later)
            if len(later) > 1
            else hits[lang] >= later[0]
        )
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return pred


def canonical_text(col: Column | str, strip_punct: bool = True) -> Column:
    """Dedup-canonical form (the Dolma/FineWeb-style fold): lowercase,
    optionally strip punctuation/symbols, collapse whitespace runs to
    single spaces, trim. Pure JVM expressions — the fold every exact
    hash can apply map-side so 'Hello,  World!' and 'hello world'
    collide. DuckDB twin: ``trim(regexp_replace(regexp_replace(
    lower(x), '[^a-z0-9\\s]+', '', 'g'), '\\s+', ' ', 'g'))``.

    Unicode compatibility normalization (NFKC) is NOT part of this
    fold — Spark SQL has no normalize builtin, and shipping every
    document through a Python kernel to fold ligatures is the wrong
    default at corpus scale; add it at the seam if a corpus needs it."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.lower(c)
    if strip_punct:
        out = F.regexp_replace(out, r"[^a-z0-9\s]+", "")
    return F.trim(F.regexp_replace(out, r"\s+", " "))
