"""Amplified-scale probe for the EXACT prefix-filtered Jaccard join
(operators/dedup.py:jaccard_join_prefix) against (a) DuckDB's
brute-force all-pairs join — the completeness check at scale — and
(b) the repo's other two Jaccard lanes for the cost picture:
lsh_verified_pairs (probabilistic recall) and jaccard_pairs
(inverted-index exact, max_df-capped).

Replicating documents R times with shifted ids is the adversarial
case for exact joins: every replica is a perfect duplicate, so the
qualifying-pair count grows ~R²/2 per original and every prefix
shingle's document frequency grows R-fold. Linear-ish scaling here
means the prefix bound holds where it is weakest; results go to
BASELINE.md.

Run: python experiments/prefix_join_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.common import amplify, timed_oracle

OUT = "/tmp/prefix_join_scale"
THRESHOLD = 0.5
SHINGLE_N = 3

ORACLE_BRUTE = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+{SHINGLE_N - 1}], ' ') AS shingle
  FROM (SELECT doc_id, w, unnest(range(1, len(w) - {SHINGLE_N - 2})) AS i FROM toks)
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT count(*) AS n_pairs
FROM common
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= {THRESHOLD}
"""


def main() -> None:
    from spotify_etl_aws_spark.operators.dedup import (
        jaccard_join_prefix,
        jaccard_pairs,
        lsh_verified_pairs,
    )
    from spotify_etl_aws_spark.session import get_spark

    spark = get_spark(app_name="prefix-join-scale")
    spark.sparkContext.setLogLevel("ERROR")
    mismatched = False
    for reps in (1, 4, 10):
        path, n = amplify("documents", "doc_id", reps, OUT)
        docs = spark.read.parquet(path)

        t0 = time.perf_counter()
        n_prefix = jaccard_join_prefix(
            docs, shingle_n=SHINGLE_N, threshold=THRESHOLD
        ).count()
        t_prefix = time.perf_counter() - t0

        t0 = time.perf_counter()
        n_lsh = lsh_verified_pairs(
            docs, shingle_n=SHINGLE_N, threshold=THRESHOLD
        ).count()
        t_lsh = time.perf_counter() - t0

        t0 = time.perf_counter()
        n_quad = jaccard_pairs(
            docs, shingle_n=SHINGLE_N, threshold=THRESHOLD, max_df=100
        ).count()
        t_quad = time.perf_counter() - t0

        line = (
            f"n={n:>6}: prefix {t_prefix:6.2f}s/{n_prefix} pairs | "
            f"lsh {t_lsh:6.2f}s/{n_lsh} | quad(max_df=100) "
            f"{t_quad:6.2f}s/{n_quad}"
        )
        if reps <= 4:
            dwall, rows = timed_oracle(ORACLE_BRUTE, "documents", path)
            n_duck = int(rows[0][0])
            line += f" | duckdb-brute {dwall:6.2f}s/{n_duck}"
            if n_duck != n_prefix:
                print("COMPLETENESS MISMATCH: prefix join lost pairs!",
                      file=sys.stderr)
                mismatched = True
        print(line, flush=True)
    if mismatched:
        sys.exit(1)


if __name__ == "__main__":
    main()
