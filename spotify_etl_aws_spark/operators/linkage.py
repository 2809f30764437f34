"""Probabilistic record linkage (north-star, SURVEY.md §2.11a
adjacent — the entity-resolution operator family): match dirty records
against a master table via the Fellegi–Sunter model (JASA 1969; the
Splink/dedupe.io production shape) — multi-pass BLOCKING for candidate
generation, per-field agreement/disagreement LOG-ODDS weights summed
into a match score, threshold gate.

This is the multi-field probabilistic generalization of the exact
edit-distance join (operators/editdist.py): one noisy field alone
cannot confirm a match, but agreement evidence ACROSS fields (name
within edit distance, phone exact, balance close, same nation) sums —
and disagreement subtracts — exactly like the log-likelihood ratio the
F-S model prescribes. Weights here are caller-supplied integers
(deterministic, cross-engine exact); learning them by EM over the
candidate set is the documented seam a deployment adds on top (the
scoring algebra is unchanged).

Scale shape:

- Each blocking pass is ONE equi-join on its key expression — never a
  theta join; the union of passes is deduped per (probe, master) pair
  before scoring, so a pair caught by both passes scores once.
  Blocking recall is the caller's contract (pick passes such that a
  true match survives at least one key intact — the standard
  complementary-keys design, e.g. name-prefix OR phone-prefix).
- Scoring is map-side JVM expression arithmetic on candidate rows
  only (levenshtein/abs/case-when — no UDF, no extra shuffle).
- Skewed blocking keys (a mega-city block) are the same hazard as
  every candidate-generation lane; the hot-key tools (salting,
  operators/skew.py; bucket caps, operators/phash.py) apply.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Comparator:
    """One field comparison: ``agree`` is a boolean Column over the
    joined candidate row (probe columns aliased ``p_*``, master
    columns ``m_*``); agreement adds ``w_agree``, disagreement adds
    ``w_disagree`` (negative). Integer weights keep the score exact
    int64 on both engines."""

    name: str
    agree: Column
    w_agree: int
    w_disagree: int


def fs_link(
    probe: DataFrame,
    master: DataFrame,
    probe_id: str,
    master_id: str,
    blocking: list[tuple[Column, Column]],
    comparators: list[Comparator],
    threshold: int,
) -> DataFrame:
    """Fellegi–Sunter linkage: probe rows against master rows.

    ``blocking``: list of (probe_key_expr, master_key_expr) passes —
    candidates are the UNION over passes of equi-join matches, deduped.
    ``comparators``: per-field evidence terms (see Comparator).
    Returns (probe_id, master_id, score, <name>_agree per comparator)
    for pairs with score >= threshold.
    """
    if not blocking:
        raise ValueError("fs_link: at least one blocking pass required")
    if not comparators:
        raise ValueError("fs_link: at least one comparator required")
    p = probe.select(
        F.col(probe_id).alias("p_id"),
        *[F.col(c).alias(f"p_{c}") for c in probe.columns if c != probe_id],
    )
    m = master.select(
        F.col(master_id).alias("m_id"),
        *[F.col(c).alias(f"m_{c}") for c in master.columns if c != master_id],
    )
    cand = None
    for pk, mk in blocking:
        pass_pairs = (
            p.withColumn("__bk", pk)
            .join(m.withColumn("__bk", mk), "__bk")
            .select("p_id", "m_id")
        )
        cand = pass_pairs if cand is None else cand.unionByName(pass_pairs)
    cand = cand.distinct()
    scored = cand.join(p, "p_id").join(m, "m_id")
    score = None
    agree_cols = []
    for c in comparators:
        flag = F.when(c.agree, F.lit(True)).otherwise(F.lit(False))
        term = F.when(c.agree, F.lit(c.w_agree)).otherwise(
            F.lit(c.w_disagree)
        )
        agree_cols.append(flag.alias(f"{c.name}_agree"))
        score = term if score is None else score + term
    return (
        scored.select(
            F.col("p_id").alias(probe_id),
            F.col("m_id").alias(master_id),
            score.cast("long").alias("score"),
            *agree_cols,
        )
        .filter(F.col("score") >= threshold)
    )
