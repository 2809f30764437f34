"""Amplified-scale probe for DSIR importance resampling
(operators/dsir.py): replicate sf0.1's documents R times as the raw
corpus, fit the target-vs-raw log-ratio model against a fixed
synthetic target slice, then score + fraction-select. The design
claims under test:

- FIT cost grows with corpus size but stays shuffle-free (one
  B-length partial per partition, driver sum) — the per-row cost is
  the kernel's n-gram hashing, so wall time should scale ~linearly
  with R and never blow up on the driver (model state is O(B)
  regardless of R).
- SCORE + threshold SELECT are a map-side kernel plus one
  approxQuantile pass — also ~linear in R, no shuffle of the corpus.
- The kept fraction stays on target (±1%) at every R, and the kept
  set is replica-consistent: replica k of a document scores IDENTICAL
  log-weight (pure function of text), so selection differences across
  replicas come only from the per-(seed, doc_id) Gumbel noise — the
  designed behavior (resampling, not dedup).

Run: python experiments/dsir_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.common import amplify

OUT = "/tmp/dsir_scale"
B = 65_536
FRACTION = 0.25

MED_WORDS = (
    "clinical trial dosage patient symptom diagnosis therapy oncology "
    "biopsy remission protocol efficacy placebo cohort enrollment"
).split()


def main() -> None:
    import numpy as np
    from pyspark.sql import functions as F

    from spotify_etl_aws_spark.operators.dsir import (
        fit_dsir,
        resample_dsir_fraction,
        score_dsir,
    )
    from spotify_etl_aws_spark.session import get_spark

    spark = get_spark(app_name="dsir-scale")
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(11)
    target = spark.createDataFrame(
        [(i, " ".join(rng.choice(MED_WORDS, size=40))) for i in range(200)],
        "doc_id bigint, text string",
    ).cache()
    target.count()

    for reps in (1, 4, 10):
        path, n = amplify("documents", "doc_id", reps, OUT)
        raw = spark.read.parquet(path).select("doc_id", "text")

        t0 = time.perf_counter()
        model = fit_dsir(target, raw, n_buckets=B)
        fit_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        kept = resample_dsir_fraction(
            score_dsir(model, raw), FRACTION, seed="scale"
        )
        n_kept = kept.count()
        sel_s = time.perf_counter() - t0

        frac = n_kept / n
        # replica consistency: identical text ⇒ identical logw, so
        # the per-replica kept counts differ only by Gumbel noise
        base = kept.withColumn("__orig", F.pmod("doc_id", F.lit(n // reps)))
        per_replica = (
            base.groupBy(F.floor(F.col("doc_id") / (n // reps)).alias("r"))
            .count()
            .collect()
        )
        spread = (
            (max(r["count"] for r in per_replica)
             - min(r["count"] for r in per_replica))
            / (n_kept / reps)
            if reps > 1
            else 0.0
        )
        print(
            f"R={reps:>2} n={n:>7}: fit={fit_s:6.2f}s "
            f"score+select={sel_s:6.2f}s kept={n_kept} "
            f"({frac:.4f} vs target {FRACTION}) replica_spread={spread:.3f}",
            flush=True,
        )
        if abs(frac - FRACTION) > 0.01:
            print("kept fraction off target!", file=sys.stderr)
            sys.exit(1)


if __name__ == "__main__":
    main()
