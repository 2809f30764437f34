"""Amplified-scale probe for EXACT-SUBSTRING dedup (the span-level
pass, operators/substring_dedup.py): replicates sf0.1's documents R
times (exact copies — every window in a replica is a duplicate of the
original's) and times the full window-hash -> canonical-election ->
span-merge pipeline on both engines, cross-checking the corpus-wide
duplicated-token total. The window table is one row per corpus token,
so runtime should scale linearly with R; results go to BASELINE.md.

Run: python experiments/substring_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.common import compare_loop, timed_oracle

OUT = "/tmp/substring_scale"
K = 12
# occurrence order key: doc_id * 2^20 + pos (fixture docs are far below
# 2^20 tokens; amplified ids stay far below 2^43)
_POS_STRIDE = 1 << 20

ORACLE_SUBSTRING_DUP_TOKENS = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w
  FROM documents
),
wins AS (
  SELECT doc_id, s - 1 AS pos,
         doc_id * {_POS_STRIDE} + (s - 1) AS occ_key,
         array_to_string(w[s : s + {K} - 1], chr(31)) AS win
  FROM toks, UNNEST(range(1, len(w) - {K} + 2)) AS t(s)
  WHERE len(w) >= {K}
),
grp AS (
  SELECT win, count(*) AS n_occ, min(occ_key) AS canon_key
  FROM wins GROUP BY win
),
dup AS (
  SELECT w.doc_id, w.pos
  FROM wins w JOIN grp g USING (win)
  WHERE g.n_occ > 1 AND w.occ_key <> g.canon_key
),
spans AS (
  SELECT doc_id, pos,
         lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM dup
)
SELECT COALESCE(SUM(
  CASE WHEN prev IS NULL OR pos - prev >= {K} THEN {K}
       ELSE pos - prev END), 0)::BIGINT AS dup_tokens
FROM spans
"""


def spark_pipeline(docs_path: str) -> tuple[float, int]:
    import pyspark.sql.functions as F

    from spotify_etl_aws_spark.operators.substring_dedup import dedup_substrings

    t0 = time.perf_counter()
    docs = _SPARK.read.parquet(docs_path)
    out = dedup_substrings(docs, k=K)
    total = out.agg(F.sum("dup_tokens")).collect()[0][0]
    return time.perf_counter() - t0, int(total)


def duckdb_pipeline(docs_path: str) -> tuple[float, int]:
    dt, rows = timed_oracle(ORACLE_SUBSTRING_DUP_TOKENS, "documents", docs_path)
    return dt, int(rows[0][0])


def main() -> None:
    from spotify_etl_aws_spark.session import get_spark

    global _SPARK
    _SPARK = get_spark(app_name="substring-scale")
    _SPARK.sparkContext.setLogLevel("ERROR")
    compare_loop(
        "documents",
        "doc_id",
        OUT,
        reps_list=[1, 4, 10],
        duckdb_max_reps=4,
        spark_fn=spark_pipeline,
        duckdb_fn=duckdb_pipeline,
    )


if __name__ == "__main__":
    main()
