"""Arrow-vectorized Python operators (SURVEY.md §2.10 UDF surface).

The reference has no UDFs at all (its Python runs before the database;
its SQL is pure DuckDB — see SURVEY §2.10), so this module defines the
engine's *policy* for when queries genuinely need Python:

- built-in ``pyspark.sql.functions`` first — ``queries/text.py`` holds
  the JVM-side twin of the scorer below, and the built-in form is what a
  pipeline should use when the logic is expressible;
- when Python is unavoidable (an external model, a tokenizer library, a
  custom numeric kernel), it enters ONLY through the Arrow batch lane:
  ``pandas_udf`` for scalar kernels, ``applyInPandas`` for group-map
  kernels, ``mapInPandas`` for partition-streaming kernels (see
  ``operators/multimodal.py``). Row-at-a-time ``F.udf`` is banned from
  hot paths — one Python call per row plus pickle round-trip is the
  10-100x slowdown Arrow batching exists to avoid.

Scale notes: a pandas_udf streams Arrow record batches (bounded memory,
any input size). ``applyInPandas`` materializes EACH GROUP as one pandas
frame — fine for bounded groups (here: event_type x day composites,
whose size is capped by the day boundary no matter how long the table
grows), but an unbounded group at 100 TB must either be salted or
rewritten as the two-pass built-in form (join against groupBy
aggregates).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

# Same contract as queries/text.py: keep [a-z0-9 ] as "clean" chars,
# tokens = whitespace split of the lowercased text.
PUNCT_KEEP_RE = "[a-z0-9 ]"


# Return type as a DataType instance, not a DDL string: string forms are
# parsed eagerly at decoration time and would require a live SparkSession
# at import.
@pandas_udf(DoubleType())
def quality_score_udf(text: pd.Series) -> pd.Series:
    """Vectorized heuristic quality score — the Arrow-lane twin of the
    built-in composition in queries/text.py:text_quality_score:
    ``least(1, n_tokens/100) * (1 - punct_ratio)``.

    Executes per Arrow batch: one pandas vector op per expression,
    zero per-row Python calls.
    """
    lower = text.str.lower()
    n_tokens = lower.str.split(r"\s+").str.len().astype("float64")
    n_punct = lower.str.replace(PUNCT_KEEP_RE, "", regex=True).str.len()
    punct_ratio = n_punct / text.str.len()
    return (n_tokens / 100.0).clip(upper=1.0) * (1.0 - punct_ratio)


@pandas_udf(DoubleType())
def weighted_mean_udf(value: pd.Series, weight: pd.Series) -> float:
    """Grouped-agg pandas_udf (the UDAF shape): whole group's columns
    arrive as Series, one scalar returns. Spark plans it like a native
    aggregate — partial batches stream through Arrow, no per-row calls."""
    return float((value * weight).sum() / weight.sum())


def zscore_by_group(
    df: DataFrame,
    group_cols: list[str],
    group_schema: str,
    id_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group z-score via ``applyInPandas`` (group-map "UDTF" shape):
    each group arrives as one pandas frame; mean/std (sample, ddof=1)
    are computed in-frame and every row leaves with its normalized value.

    Returns (id_col, *group_cols, zscore). Groups of size 1 emit NULL
    (sample std undefined), matching SQL ``stddev_samp`` semantics.

    Because each group materializes as ONE pandas frame, the caller must
    key on a BOUNDED composite (e.g. category x day) — an unbounded
    group is a single-task OOM at scale; that's the module-docstring
    rule. The zscore leaves UNROUNDED: rounding belongs on the JVM side
    (``F.round``) so results carry SQL half-away-from-zero semantics,
    not pandas banker's rounding.
    """
    schema = f"{id_col} bigint, {group_schema}, zscore double"

    def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col]
        z = (v - v.mean()) / v.std()  # ddof=1 == stddev_samp
        out = {id_col: pdf[id_col]}
        for g in group_cols:
            out[g] = pdf[g]
        out["zscore"] = z
        return pd.DataFrame(out)

    return df.groupBy(*group_cols).applyInPandas(_norm, schema=schema)
