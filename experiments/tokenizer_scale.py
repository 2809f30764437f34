"""Scale probe for tokenizer TRAINING (operators/bpe.py,
operators/unigram.py): replicate sf0.1's documents table R times and
time `train_bpe` / `train_unigram` end-to-end, splitting the
corpus-sized Spark phase (word-frequency aggregation) from the
driver-side phase (merge loop / EM over the capped word table).

The claim this measures: the driver phase is INDEPENDENT of corpus
size — replication multiplies word COUNTS, not the distinct-word table
(exact copies add no new words), so only the one aggregation job
should scale with R. On a real corpus the distinct-word table grows
~Heaps-law sublinearly and the `max_words` cap bounds it regardless;
the replication design isolates the job-vs-loop split cleanly.

Run: python experiments/tokenizer_scale.py  (results -> BASELINE.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = [1, 4, 10]
NUM_MERGES = 200
VOCAB = 1000


def main() -> int:
    import pyspark.sql.functions as F

    from spotify_etl_aws_spark.operators.bpe import train_bpe, word_frequencies
    from spotify_etl_aws_spark.operators.unigram import train_unigram
    from spotify_etl_aws_spark.session import get_spark
    from spotify_etl_aws_spark.sources.readers import load_table

    spark = get_spark()
    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n_base = base.count()
    print(f"base corpus: {n_base} docs ({SF_DIR})")

    for r in REPLICAS:
        docs = base
        for k in range(1, r):
            docs = docs.unionByName(
                base.select(
                    (F.col("doc_id") + k * n_base).alias("doc_id"), "text"
                )
            )
        docs = docs.localCheckpoint(eager=True)  # isolate build cost

        word_frequencies(docs)  # JVM/codegen warmup off the timers
        t0 = time.perf_counter()
        wf = word_frequencies(docs)
        t_job = time.perf_counter() - t0

        t0 = time.perf_counter()
        bpe = train_bpe(docs, num_merges=NUM_MERGES)
        t_bpe = time.perf_counter() - t0

        t0 = time.perf_counter()
        uni = train_unigram(docs, vocab_size=VOCAB)
        t_uni = time.perf_counter() - t0

        print(
            f"R={r:2d} docs={n_base * r:7d} distinct_words={len(wf):6d} "
            f"word_job={t_job:6.2f}s bpe_total={t_bpe:6.2f}s "
            f"uni_total={t_uni:6.2f}s "
            f"merges={len(bpe.merges)} vocab={len(uni.log_probs)}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
