"""Amplified-scale probe for the in-engine quality classifier
(operators/classifier.py): replicate sf0.1's documents R times as the
positive corpus, scale the synthetic-spam negatives with R so the
class RATIO stays fixed (the mean gradient is over the union — fixing
the ratio is what makes runs comparable across R), and time the full
training loop. The design claim under test: each iteration reduces
ONE partial-gradient row per partition, so per-iteration cost stays
near the dispatch floor while the corpus grows 10x, and the decision
quality (good-vs-spam margin) is stable across R.

Run: python experiments/classifier_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.common import amplify

OUT = "/tmp/classifier_scale"
DIM, ITERS = 128, 10

SPAM_WORDS = (
    "click buy cheap winner prize casino bonus free offer deal urgent "
    "limited guarantee cash"
).split()


def main() -> None:
    import numpy as np

    from spotify_etl_aws_spark.operators.classifier import (
        score_quality,
        train_quality_classifier,
    )
    from spotify_etl_aws_spark.session import get_spark

    spark = get_spark(app_name="classifier-scale")
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(3)

    prev_weights = None
    for reps in (1, 4, 10):
        path, n = amplify("documents", "doc_id", reps, OUT)
        pos = spark.read.parquet(path).select("doc_id", "text")
        # negatives scale with R: fixed 2.5:1 pos:neg ratio at every R
        neg = spark.createDataFrame(
            [
                (i, " ".join(rng.choice(SPAM_WORDS, size=25)))
                for i in range(n * 2 // 5)
            ],
            "doc_id bigint, text string",
        )
        t0 = time.perf_counter()
        model = train_quality_classifier(
            pos, neg, dim=DIM, iters=ITERS
        )
        total = time.perf_counter() - t0
        holdout = spark.createDataFrame(
            [(1, "the storage engine compacts sorted files on a schedule"),
             (2, " ".join(rng.choice(SPAM_WORDS, size=25)))],
            "doc_id bigint, text string",
        )
        s = {r.doc_id: r.quality_prob for r in score_quality(model, holdout).collect()}
        w = np.array(model.weights)
        drift = (
            float(np.abs(w - prev_weights).max()) if prev_weights is not None else 0.0
        )
        prev_weights = w
        print(
            f"pos_docs={n:>6}: total {total:6.2f}s "
            f"({total / ITERS:5.2f}s/iter)  good={s[1]:.3f} spam={s[2]:.3f} "
            f"max|dw| vs prev R = {drift:.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
