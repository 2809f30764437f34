"""End-to-end training-corpus build (north-star, SURVEY.md §2.11):
the full ladder a pre-training data pipeline runs, composed from the
engine's operators in the order real pipelines run them:

1. DECONTAMINATE — drop documents colliding with the benchmark set
   (broadcast n-gram semi-join, corpus text never shuffles);
2. NEAR-DEDUP — MinHash/LSH candidate pairs, exact-Jaccard verify,
   connected components; keep each cluster's representative;
3. PII SCRUB — C4-style email/IP/phone redaction (regexp chain,
   map-side) so no downstream artifact carries raw identifiers;
4. QUALITY GATE — heuristic score cutoff (token count, punctuation)
   AND the Gopher-style repetition gate (duplicate-line / top-n-gram /
   duplicate-n-gram char fractions, all HOF map-side);
5. SPLIT — deterministic hash assignment (train/val/test frozen under
   corpus growth);
6. PACK — per-split fixed-token-budget sequence packing (train packs
   feed the trainer; val/test pack separately so no window straddles
   a split).

Output: one parquet dataset partitioned by split, one row per kept
document with (doc_id, text, n_tokens, quality_score, split, pack_id,
pack_pos) — trainer-ready. Every stage is an operator tested/oracled
on its own; this runner pins their composition.
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    STOPWORDS,
    predicted_lang,
    quality_score,
    tokens,
)
from ..operators.bpe import BpeModel, encode_bpe
from ..operators.classifier import (
    LinearQualityModel,
    classifier_gate,
    score_quality,
)
from ..operators.decontaminate import decontaminate
from ..operators.dsir import DsirModel, resample_dsir_fraction, score_dsir
from ..operators.dedup import (
    minhash_signatures,
    neardup_against_store,
    neardup_clusters,
    neardup_keep_best,
)
from ..operators.heuristics import (
    gopher_quality_gate,
    gopher_quality_stats,
    repetition_gate,
    repetition_stats,
    scrub_pii,
)
from ..operators.lm import (
    CharLmModel,
    bucket_gate,
    perplexity_buckets,
    perplexity_gate,
    score_perplexity,
)
from ..operators.packing import pack_sequences
from ..operators.splits import assign_split
from ..operators.substring_dedup import dedup_substrings
from ..operators.unigram import UnigramModel, encode_unigram
from ..sources.sinks import commit_epoch
from ..operators.lineage import cut_lineage_eager


def curation_audit(
    docs: DataFrame, trail: list[tuple[str, DataFrame]]
) -> DataFrame:
    """Per-document drop attribution: (doc_id, status) for every INPUT
    document, where ``status`` is the first ladder stage that dropped
    it ('language', 'contaminated', 'near_duplicate', 'repetition', 'gopher',
    'perplexity', 'classifier', 'dsir', 'quality') or 'kept' — one status per
    stage the ladder actually ran, in ladder order.

    ``trail`` holds (stage_name, frame-with-ids-surviving-that-stage)
    in ladder order; survivors of stage i are a subset of stage i-1's,
    so each stage's casualties are one id-only anti-join — document
    text is never shuffled, and the whole audit is a union of narrow
    id frames.
    """
    remaining = docs.select("doc_id")
    parts: list[DataFrame] = []
    for name, survivors in trail:
        ids = survivors.select("doc_id")
        parts.append(
            remaining.join(ids, "doc_id", "left_anti").withColumn(
                "status", F.lit(name)
            )
        )
        remaining = ids
    parts.append(remaining.withColumn("status", F.lit("kept")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def build_training_corpus(
    spark: SparkSession,
    docs: DataFrame,
    bench: DataFrame | None,
    out_dir: str,
    quality_cutoff: float = 0.3,
    pack_budget: int = 2048,
    split_weights: dict[str, float] | None = None,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    dup_threshold: float = 0.5,
    decon_shingle_n: int = 8,
    pii_scrub: bool = True,
    repetition_filter: bool = True,
    gopher_filter: bool = False,
    lm_model: CharLmModel | None = None,
    lm_max_log_ppl: float = 8.0,
    lm_bucket_keep: tuple[str, ...] | None = None,
    quality_model: LinearQualityModel | None = None,
    quality_model_min: float = 0.5,
    dsir_model: DsirModel | None = None,
    dsir_fraction: float = 0.5,
    dsir_seed: str = "v1",
    tokenizer: BpeModel | UnigramModel | None = None,
    substring_dedup_k: int | None = None,
    substring_hot_max: int | None = 10_000,
    keep_langs: tuple[str, ...] | None = None,
    neardup_keep_best_col: str | None = None,
    shard_tokens: int | None = None,
    shard_seed: int = 0,
    audit: bool = False,
    metrics_out: dict | None = None,
) -> DataFrame:
    """Run the ladder over ``docs`` (doc_id, text) and write the packed
    corpus partitioned by split. Returns the re-read result frame.
    ``pii_scrub`` / ``repetition_filter`` toggle the C4-style redaction
    and the Gopher-style repetition gate (thresholds:
    ``operators.heuristics.repetition_gate`` defaults).

    ``lm_model`` adds the CCNet-style perplexity gate next to the
    heuristic quality cutoff: documents scoring above
    ``lm_max_log_ppl`` bits/char under the (clean-corpus-trained)
    char LM are dropped — the model-based filter that catches fluent-
    looking junk the surface heuristics pass. ``lm_bucket_keep`` (e.g.
    ``("head", "middle")``) switches the cut to CCNet's RELATIVE form:
    per-language perplexity terciles via ``perplexity_buckets``, so
    the gate tracks each language's own fluency distribution instead
    of one absolute bits/char number.

    ``audit=True`` additionally writes ``<out_dir>/audit`` — one row
    per INPUT document with the stage that dropped it (or ``kept``),
    the per-doc attribution file production pipelines publish next to
    the corpus (see ``curation_audit``).

    ``keep_langs`` adds the language gate (stopword-hit lang-ID,
    ``functions.text.predicted_lang``) ahead of every shuffling stage,
    so off-language documents never pay for dedup.

    ``metrics_out`` (a dict) receives per-stage surviving-row counts
    — ``{'input': n, 'near_duplicate': n, ..., 'quality': n}`` —
    gathered with ``df.observe`` accumulators DURING the corpus
    write, i.e. at zero extra jobs (counting via ``.count()`` per
    stage would re-run the ladder once per stage).

    ``quality_model`` adds the FineWeb-style model-based filter: a
    ``LinearQualityModel`` (trained in-engine on reference-vs-raw
    corpora, ``operators/classifier.py``) scores each doc and those
    below ``quality_model_min`` drop — the learned complement of the
    heuristic cutoff and the LM-perplexity gate.

    ``dsir_model`` adds DSIR importance resampling after the per-doc
    gates: score each survivor's target-vs-raw log importance weight
    (``operators/dsir.py``) and keep the Gumbel-perturbed top
    ``dsir_fraction`` via the approxQuantile threshold path — shaping
    the SURVIVING corpus toward the target distribution rather than
    dropping individually-bad docs. Deterministic per ``dsir_seed``.

    ``substring_dedup_k`` adds the Lee-et-al span-level pass after the
    document-level near-dedup: every >= k-token span repeated anywhere
    in the surviving corpus keeps only its first occurrence (the cut
    text continues down the ladder; husks die at the quality gate).
    ``substring_hot_max`` (default 10k) is the boilerplate policy: a
    span occurring more often than that is chrome/licence text by
    construction and is cut from EVERY occurrence — no canonical
    survives (None restores literal keep-first semantics).

    ``shard_tokens`` additionally assigns every output row a
    TOKEN-balanced ``shard_id`` over the deterministic epoch order
    (``operators/ordering.py:assign_token_shards``), computed PER
    SPLIT (each split's cumulative sum starts at 0), and partitions
    the corpus write by (split, shard_id) — so each (split, shard)
    file carries ``shard_tokens ± max_doc`` tokens of its own split:
    equal-work input files for the trainer's data loader regardless of
    document-length skew.

    ``neardup_keep_best_col`` switches the near-dup cluster election
    from keep-first (minimum doc_id) to keep-BEST: the cluster member
    maximizing that column (ties -> smallest id) survives — the
    keep-the-cleanest-copy policy production ladders use when a
    quality signal already exists on the input (e.g. a crawl score).
    The column must exist on ``docs``.

    ``tokenizer`` (a trained ``BpeModel`` or ``UnigramModel``) switches
    packing to REAL tokenizer counts: ``n_tokens`` becomes the length
    of the learned-subword encoding (carried in the output as
    ``tokens``), so pack budgets line up with what the trainer's
    tokenizer will actually produce instead of the whitespace
    estimate."""
    weights = split_weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    # (stage_name, ids-after-stage) checkpoints for the audit trail —
    # all lazy DataFrames: with audit off they are never executed
    trail: list[tuple[str, DataFrame]] = []

    # ``metrics_out``: per-stage row counters via ``df.observe`` —
    # accumulator-backed, collected DURING the one write action, so
    # observability costs ZERO extra jobs (the audit trail answers
    # "which doc died where", this answers "how many" for free)
    observations: list[tuple[str, object]] = []

    def observed(df: DataFrame, name: str) -> DataFrame:
        if metrics_out is None:
            return df
        from pyspark.sql import Observation

        ob = Observation(f"curation_{name}")
        observations.append((name, ob))
        return df.observe(ob, F.count(F.lit(1)).alias("rows"))

    stage = observed(docs.select("doc_id", "text"), "input")
    # language gate FIRST (the CCNet/FineWeb order): it is a pure
    # map-side filter, so running it before the shuffling stages means
    # off-language docs never pay for dedup
    if keep_langs is not None:
        unknown = set(keep_langs) - set(STOPWORDS)
        if unknown:
            raise ValueError(
                f"keep_langs {sorted(unknown)} not in the lang-ID "
                f"vocabulary {sorted(STOPWORDS)}"
            )
        toks_ = tokens("text")
        # the argmax alone defaults zero-hit docs (non-listed scripts,
        # code, numbers) to the first language — a reporting artifact
        # that would LEAK them through a filter; the gate additionally
        # requires at least one stopword hit in some listed language
        from ..functions.text import stopword_hits

        any_hit = (
            F.greatest(
                *[stopword_hits(toks_, w) for w in STOPWORDS.values()]
            )
            > 0
        )
        stage = observed(
            stage.filter(
                predicted_lang(toks_, STOPWORDS).isin(*keep_langs) & any_hit
            ),
            "language",
        )
        trail.append(("language", stage))
    if bench is not None:
        stage = observed(
            decontaminate(stage, bench, shingle_n=decon_shingle_n),
            "contaminated",
        )
        trail.append(("contaminated", stage))

    if neardup_keep_best_col is not None:
        if neardup_keep_best_col not in docs.columns:
            raise ValueError(
                f"neardup_keep_best_col {neardup_keep_best_col!r} not in "
                f"input columns {docs.columns}"
            )
        if neardup_keep_best_col in ("doc_id", "text"):
            # the ladder already carries these; joining them back in
            # would create an ambiguous duplicate column (and neither
            # is a quality signal)
            raise ValueError(
                "neardup_keep_best_col must be a dedicated quality "
                f"column, not {neardup_keep_best_col!r}"
            )
        # the ladder carries only (doc_id, text); the election score
        # rides in as an id-keyed narrow join from the original input
        kept = neardup_keep_best(
            stage.join(
                docs.select("doc_id", neardup_keep_best_col), "doc_id"
            ),
            neardup_keep_best_col,
            num_hashes=num_hashes,
            bands=bands,
            shingle_n=shingle_n,
            threshold=dup_threshold,
        ).filter(F.col("keep"))
        stage = observed(
            stage.join(kept.select("doc_id"), "doc_id", "left_semi"),
            "near_duplicate",
        )
    else:
        reps = neardup_clusters(
            stage,
            num_hashes=num_hashes,
            bands=bands,
            shingle_n=shingle_n,
            threshold=dup_threshold,
        ).filter(F.col("doc_id") == F.col("cluster_rep"))
        stage = observed(
            stage.join(reps.select("doc_id"), "doc_id", "left_semi"),
            "near_duplicate",
        )
    trail.append(("near_duplicate", stage))

    # span-level pass AFTER document-level dedup: whole-doc drops are
    # cheaper, so only survivors pay the window-hash shuffle; the cut
    # text flows on as `text` (empty husks die at the quality gate)
    if substring_dedup_k is not None:
        stage = dedup_substrings(
            stage, k=substring_dedup_k, hot_max_occurrences=substring_hot_max
        ).select("doc_id", F.col("text_deduped").alias("text"))

    if pii_scrub:
        stage = scrub_pii(stage).select("doc_id", "text")
    if repetition_filter:
        stage = observed(
            repetition_gate(
                repetition_stats(stage, extra_cols=("text",))
            ).select("doc_id", "text"),
            "repetition",
        )
        trail.append(("repetition", stage))

    if gopher_filter:
        # the document-level half of the Gopher Table A1 rules (word
        # count/length, symbol ratio, bullet/ellipsis lines, alpha
        # words, stopword floor) — map-side HOFs like the repetition
        # half. Off by default: the published 50-word floor is tuned
        # for web pages, not short-document corpora.
        stage = observed(
            gopher_quality_gate(
                gopher_quality_stats(stage, extra_cols=("text",))
            ).select("doc_id", "text"),
            "gopher",
        )
        trail.append(("gopher", stage))

    if lm_model is not None:
        ppl = score_perplexity(lm_model, stage)
        if lm_bucket_keep is not None:
            # CCNet's RELATIVE cut: per-language perplexity terciles
            # (head/middle/tail) instead of one absolute bits/char
            # threshold — a calibration that survives corpora whose
            # fluency distribution shifts. Language comes from the
            # same stopword-hit lang-ID the language gate uses.
            ppl = ppl.withColumn(
                "__lang", predicted_lang(tokens("text"), STOPWORDS)
            )
            stage = (
                bucket_gate(
                    perplexity_buckets(ppl, "__lang"), lm_bucket_keep
                )
                .drop("log_ppl", "ppl_bucket", "__lang")
            )
        else:
            stage = perplexity_gate(ppl, lm_max_log_ppl).drop("log_ppl")
        trail.append(("perplexity", stage))

    if quality_model is not None:
        stage = classifier_gate(
            score_quality(quality_model, stage), quality_model_min
        ).drop("quality_prob")
        trail.append(("classifier", stage))

    if dsir_model is not None:
        # DSIR importance resampling LAST among the model gates: the
        # gates above drop what is individually bad, DSIR then shapes
        # what remains toward the target distribution. The quantile
        # threshold runs as its own small job (like the CC loop);
        # scoring and the final cut are map-side.
        stage = observed(
            resample_dsir_fraction(
                score_dsir(dsir_model, stage), dsir_fraction, seed=dsir_seed
            ).drop("dsir_logw"),
            "dsir",
        )
        trail.append(("dsir", stage))

    if tokenizer is not None:
        if isinstance(tokenizer, BpeModel):
            stage = encode_bpe(tokenizer, stage, out_col="tokens")
        else:
            stage = encode_unigram(tokenizer, stage, out_col="tokens")
        n_tokens = F.size("tokens")
        carry = ["doc_id", "text", "tokens"]
    else:
        n_tokens = F.size(tokens("text"))
        carry = ["doc_id", "text"]

    scored = observed(
        stage.select(
            *carry,
            n_tokens.alias("n_tokens"),
            F.round(quality_score("text"), 4).alias("quality_score"),
        ).filter(F.col("quality_score") >= quality_cutoff),
        "quality",
    )
    trail.append(("quality", scored))

    if audit:
        # persist each stage's id frame: stage k's lineage embeds all
        # earlier stages, so without this the anti-join chain re-runs
        # the expensive ladder (near-dedup shuffle, model UDFs) once
        # per trail entry instead of once total
        cached = [
            (name, frame.select("doc_id").persist()) for name, frame in trail
        ]
        try:
            audit_path = os.path.join(out_dir, "audit")
            curation_audit(docs, cached).write.mode("overwrite").parquet(
                audit_path
            )
        finally:
            for _, frame in cached:
                frame.unpersist()

    split_docs = assign_split(scored, weights)

    # pack PER SPLIT in ONE job: the split index joins the packer's
    # grouping key, so no training window straddles a split boundary,
    # and the job count stays 1 regardless of how many splits/
    # partitions exist. Pack ids are globally unique because each pack
    # takes its FIRST doc's id and the splits partition the doc-id
    # space (a doc belongs to exactly one split). Token counts ride
    # alone through the packer (text joins back by id).
    split_names = sorted(weights)
    gidx = F.lit(None).cast("long")
    for i, name in enumerate(split_names):
        gidx = F.when(F.col("split") == name, i).otherwise(gidx)
    packs = pack_sequences(
        split_docs.select("doc_id", "n_tokens", gidx.alias("__gidx")),
        budget=pack_budget,
        group_col="__gidx",
    )
    out = split_docs.join(packs.select("doc_id", "pack_id", "pack_pos"), "doc_id")

    path = os.path.join(out_dir, "corpus")
    if shard_tokens is not None:
        from ..operators.ordering import assign_token_shards

        # shard PER SPLIT: each split's running token sum starts at 0,
        # so every (split, shard_id) file carries shard_tokens ±
        # max_doc tokens OF THAT SPLIT — the equal-work input-file
        # contract. (A single global assignment divides each global
        # shard's tokens among the splits it straddles, leaving
        # per-split files only statistically balanced.) Job count is
        # #splits, each over its own slice.
        sharded = None
        for name in split_names:
            part = assign_token_shards(
                out.filter(F.col("split") == name), shard_tokens, shard_seed
            )
            sharded = part if sharded is None else sharded.unionByName(part)
        out = sharded
        out.write.mode("overwrite").partitionBy("split", "shard_id").parquet(
            path
        )
    else:
        out.write.mode("overwrite").partitionBy("split").parquet(path)
    if metrics_out is not None:
        # the write above is the action the observe nodes rode on —
        # each get returns immediately with its accumulator value
        for name, ob in observations:
            metrics_out[name] = int(ob.get["rows"])
    return spark.read.parquet(path)


def incremental_curation(
    spark: SparkSession,
    docs_dir: str,
    bench: DataFrame | None,
    out_dir: str,
    checkpoint_dir: str,
    quality_cutoff: float = 0.3,
    split_weights: dict[str, float] | None = None,
    decon_shingle_n: int = 8,
    neardup_threshold: float = 0.7,
    neardup_num_hashes: int = 8,
    neardup_bands: int = 4,
    neardup_shingle_n: int = 3,
    content_dedup_retention: str | None = None,
) -> None:
    """The STREAMING lane of corpus curation: new document files land
    in ``docs_dir`` and each is curated exactly once — a checkpointed
    AvailableNow file source (each FILE processed once, same pattern as
    ``incremental_bronze``) plus CROSS-BATCH content dedup and an
    idempotent epoch-keyed sink (each ROW landed once even across
    crash-replays). Per batch: decontaminate against the benchmark set,
    quality-gate, assign the FROZEN hash split (hash assignment is what
    makes incremental splits sound — a document's split never depends
    on which batch delivered it), and overwrite this epoch's partition.

    Cross-batch dedup: ``dropDuplicates`` on the xxhash64 content hash
    runs INSIDE the stream graph, so its state store persists across
    runs via the checkpoint — a wave-2 duplicate of a wave-1 document
    (same text, any doc_id-bearing re-land of the same content) is
    dropped before curation. State is one 8-byte hash key per distinct
    document, unbounded by design: content identity never expires.
    (A watermarked variant bounds state when business rules allow
    re-admitting old content.)

    Idempotence: ``foreachBatch`` is at-least-once on replay, so the
    batch write targets ``epoch=<epoch_id>`` with mode=overwrite — a
    replayed batch overwrites its own partial output instead of
    appending duplicates (the standard foreachBatch idempotence
    pattern). Readers see ``epoch`` as one more partition column.

    Cross-batch NEAR-dedup (round 5): alongside the exact content-hash
    state, each batch's curated documents append their MinHash
    signatures (k hashes per doc — no text) to a parquet SIGNATURE
    STORE under ``out_dir``; incoming documents LSH-band-join against
    the store and are dropped when MinHash agreement estimates Jaccard
    >= ``neardup_threshold``. Store writes are epoch-keyed overwrites
    (idempotent under foreachBatch replay, same pattern as the corpus
    sink). So a wave-2 re-land of wave-1 content is dropped even after
    light edits, not just byte-identical ones.

    Deliberately NOT incremental: WITHIN-batch near-dedup clustering
    and packing. Cluster representatives need the global pair graph and
    packing is a corpus-order concern — both belong to the periodic
    batch rebuild (``build_training_corpus``), the standard
    incremental/batch split for training-data pipelines."""
    from ..schemas import TESTDATA_SCHEMAS

    weights = split_weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    stream = (
        spark.readStream.schema(TESTDATA_SCHEMAS["documents"])
        .option("pathGlobFilter", "*.parquet")
        # landed tables are directories of part files
        .option("recursiveFileLookup", "true")
        .parquet(docs_dir)
        # cross-batch exact dedup on content: checkpointed state store
        .withColumn("__content_hash", F.xxhash64("text"))
    )
    if content_dedup_retention is None:
        # content identity never expires: one 8-byte key per distinct
        # document, unbounded by design
        stream = stream.dropDuplicates(["__content_hash"]).drop(
            "__content_hash"
        )
    else:
        # BOUNDED-state variant: the file's landing time is the event
        # time (the file-metadata pseudo-column — the docs schema has
        # no timestamp of its own), and a content hash expires once
        # the watermark passes its landing time + retention. Trade-off
        # made explicit: a re-land of content older than the retention
        # IS re-admitted — choose this when business rules allow
        # re-admitting old content and state must stay finite.
        stream = (
            stream.withColumn(
                "__ingest_ts", F.col("_metadata.file_modification_time")
            )
            .withWatermark("__ingest_ts", content_dedup_retention)
            .dropDuplicatesWithinWatermark(["__content_hash"])
            .drop("__content_hash", "__ingest_ts")
        )

    sig_store = os.path.join(out_dir, "sig_store")

    def curate_batch(batch_df: DataFrame, epoch_id: int) -> None:
        stage = batch_df.select("doc_id", "text")
        if bench is not None:
            stage = decontaminate(stage, bench, shingle_n=decon_shingle_n)
        # same map-side scrub + repetition gate as the batch ladder:
        # per-batch application is exact (both are per-document)
        stage = scrub_pii(stage).select("doc_id", "text")
        stage = repetition_gate(
            repetition_stats(stage, extra_cols=("text",))
        ).select("doc_id", "text")
        kept = (
            stage.select(
                "doc_id",
                "text",
                F.size(tokens("text")).alias("n_tokens"),
                F.round(quality_score("text"), 4).alias("quality_score"),
            )
            .filter(F.col("quality_score") >= quality_cutoff)
        )
        # cross-batch NEAR-dedup against the signature store: light
        # edits of already-landed content are dropped, not just
        # byte-identical re-lands (those died at the content-hash
        # state). Signatures are computed AFTER the quality gate so the
        # store records exactly the curated corpus.
        sigs = minhash_signatures(
            kept,
            num_hashes=neardup_num_hashes,
            shingle_n=neardup_shingle_n,
        ).transform(cut_lineage_eager)
        spark = batch_df.sparkSession
        try:
            # partition-discovered read (epoch is a column) so THIS
            # epoch's own partition can be excluded: a foreachBatch
            # replay (or a fresh-checkpoint reprocess reusing epoch
            # ids) must not match the batch against its own previously
            # written signatures — that self-match would anti-join the
            # whole batch away and overwrite its partition EMPTY.
            stored = (
                spark.read.parquet(sig_store)
                .filter(F.col("epoch") != epoch_id)
                .drop("epoch")
            )
        except AnalysisException:
            stored = None  # first batch: no store yet
        if stored is not None and not stored.isEmpty():
            hits = neardup_against_store(
                sigs,
                stored,
                num_hashes=neardup_num_hashes,
                bands=neardup_bands,
                threshold=neardup_threshold,
            )
            kept = kept.join(hits, "doc_id", "left_anti")
            sigs = sigs.join(hits, "doc_id", "left_anti")
        # epoch-keyed ATOMIC commit (commit_epoch): both datasets stage
        # under a hidden dir, rename into place, and only then the
        # epoch marker lands — a crash mid-write can no longer expose
        # a sig-store/corpus mix or a half-written split layout, and a
        # replayed batch re-runs the same idempotent commit
        split_df = assign_split(kept, weights)
        commit_epoch(
            out_dir,
            epoch_id,
            {
                f"sig_store/epoch={epoch_id}": (
                    lambda p, df=sigs: df.write.mode("overwrite").parquet(p)
                ),
                f"corpus_incremental/epoch={epoch_id}": (
                    lambda p, df=split_df: df.write.mode("overwrite")
                    .partitionBy("split")
                    .parquet(p)
                ),
            },
        )

    q = (
        stream.writeStream.foreachBatch(curate_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
