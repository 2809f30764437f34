"""Deduplication operators (north-star, SURVEY.md §2.11).

The reference's only dedup is row-wise DISTINCT for the gold dims
(dim_artists.sql:4-10); a training-data pipeline needs the full ladder:

- exact dedup by content hash (``exact_dedup_groups``) — one shuffle on
  the hash, scales linearly;
- MinHash signatures + banded LSH candidate pairs
  (``minhash_signatures`` / ``minhash_lsh_pairs``) — near-dup at scale
  without the quadratic pair join: candidates only meet if a band
  collides;
- exact n-gram Jaccard verification (``jaccard_pairs``) — the
  inverted-index (explode + equi-join on shingle) formulation, used both
  standalone over the whole corpus and as the verify step after LSH.

Hashes are md5 (hex string), deliberately: identical and portable in
Spark and DuckDB, so every operator here is oracle-checkable end-to-end.
At production scale xxhash64 would be the cheaper choice; the structure
is hash-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens, word_shingles
from .lineage import cut_lineage


def exact_dedup_groups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: str = "lower",
) -> DataFrame:
    """Group identical normalized texts: representative = min id.
    Returns (text_hash, doc_id, n_copies).

    ``normalize``: ``"lower"`` (default — case-folded only, the
    declared-query contract) or ``"canonical"`` (the Dolma-style fold,
    ``functions.text.canonical_text``: punctuation stripped and
    whitespace collapsed too, so re-wrapped or re-punctuated copies of
    a page collide). Either way the hash is computed map-side and ONE
    partial-agg shuffle groups it."""
    if normalize == "lower":
        key = F.lower(F.col(text_col))
    elif normalize == "canonical":
        from ..functions.text import canonical_text

        key = canonical_text(text_col)
    else:
        raise ValueError(f"unknown normalize mode {normalize!r}")
    return (
        df.select(F.md5(key).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
    )


def spread_narrow_scan(df: DataFrame) -> DataFrame:
    """Re-distribute a low-parallelism scan before CPU-heavy derivation.

    A small/compact parquet input (one row group) arrives as one task; the
    shingle explode + k md5s per shingle then run on a single core while
    the rest of the cluster idles. Shuffling the *raw rows* (cheap: text
    only, pre-explosion) buys full parallelism for the expensive map work.
    At scale, inputs with enough splits pass through untouched — the
    round-robin repartition only fires when the scan can't feed the
    cluster.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def shingle_table(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, shingle) inverted-index rows; distinct word n-gram shingles."""
    return spread_narrow_scan(df).select(
        F.col(id_col),
        F.explode(word_shingles(tokens(text_col), n)).alias("shingle"),
    )


def signatures_from_shingles(
    sh: DataFrame, id_col: str = "doc_id", num_hashes: int = 8
) -> DataFrame:
    """MinHash signatures from an (id, shingle) table: sig_i = min over
    shingles of md5(i || ':' || shingle). One shuffle on id regardless
    of k (partial min map-side)."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"sig{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """One row per document: sig0..sig{k-1}, where sig_i = min over
    shingles of md5(i || ':' || shingle).

    A single explode + groupBy — the signature build is one shuffle on
    id regardless of k. Documents with < shingle_n tokens vanish
    (no shingles), mirroring the SQL oracle.
    """
    sh = shingle_table(df, id_col, text_col, shingle_n)
    return signatures_from_shingles(sh, id_col, num_hashes)


def band_table(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """(id, band, bh) LSH band-bucket rows of a signature frame — the
    shared substrate of the self-join (``minhash_lsh_pairs``) and the
    store-join (``neardup_against_store``) lanes."""
    if num_hashes % bands:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands}); "
            "trailing signature columns would be silently dropped"
        )
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"sig{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat(*parts)).alias("bh"))
        )
    return signatures.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))


def neardup_against_store(
    batch_sigs: DataFrame,
    store_sigs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.7,
) -> DataFrame:
    """Ids in ``batch_sigs`` that NEAR-match any signature in
    ``store_sigs`` — the cross-batch near-dedup probe.

    Candidates come from an LSH band-bucket join (batch bands against
    store bands — only colliding buckets meet, never all-pairs), then
    each candidate is verified by MinHash agreement: the fraction of
    equal signature components estimates Jaccard similarity, so no
    shingle or text storage is needed — the store carries k hashes per
    document, nothing else. Returns distinct matching batch ids.

    Scale shape: |batch| x bands rows shuffle-join against the store's
    band table; the store side can be pre-bucketed/partitioned by
    ``bh``. Verification touches candidates only, comparing 2k string
    columns map-side."""
    bb = band_table(batch_sigs, id_col, num_hashes, bands).alias("a")
    sb = band_table(store_sigs, id_col, num_hashes, bands).alias("b")
    cands = (
        bb.join(
            sb,
            (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh")),
        )
        .select(
            F.col(f"a.{id_col}").alias("batch_id"),
            F.col(f"b.{id_col}").alias("store_id"),
        )
        .distinct()
    )
    a = batch_sigs.alias("x")
    b = store_sigs.alias("y")
    agree = sum(
        F.when(F.col(f"x.sig{i}") == F.col(f"y.sig{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    ) / F.lit(float(num_hashes))
    return (
        cands.join(a, F.col("batch_id") == F.col(f"x.{id_col}"))
        .join(b, F.col("store_id") == F.col(f"y.{id_col}"))
        .filter(agree >= threshold)
        .select(F.col("batch_id").alias(id_col))
        .distinct()
    )


def minhash_lsh_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Banded LSH: hash each band of ``num_hashes/bands`` signature rows,
    self-join on (band_index, band_hash). Returns distinct candidate
    pairs (doc_a < doc_b).

    Scale shape: |docs| x bands rows shuffled on band_hash; only colliding
    buckets join. No quadratic blowup unless a bucket is hot (which is
    exactly the near-dup cluster you're looking for).
    """
    # NOTE (r14): deliberately no checkpoint HERE — lsh_verified_pairs
    # already hands this function a checkpointed projection, and a
    # second localCheckpoint re-materialized it (full-profile probe:
    # dedup_lsh_verified_pairs 1.15 s -> 2.42 s with the double
    # checkpoint). Callers whose signature input has expensive lineage
    # materialize it themselves (see dedup_minhash_lsh_pairs).
    banded = band_table(signatures, id_col, num_hashes, bands)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.05,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs via the inverted index:
    explode shingles, equi-join on shingle, count common, then
    |A ∩ B| / (|A| + |B| - |A ∩ B|) >= threshold.

    One wide shuffle on shingle; hot shingles are the skew risk at scale:
    a shingle in d documents emits d·(d-1)/2 join rows, so one stopword
    phrase in 1M docs is 5e11 rows through a single reducer. ``max_df``
    caps that: shingles appearing in more than ``max_df`` documents are
    dropped from the EFFECTIVE shingle sets (both the pair generation and
    the |A|/|B| sizes, keeping the Jaccard definition self-consistent),
    bounding any shingle's pair expansion to max_df·(max_df-1)/2. A
    near-stopword shingle carries no dedup signal, so the cap trades
    noise for a hard skew bound. The LSH route (``lsh_verified_pairs``)
    remains the declared scale path; this is the exact-verification twin.
    """
    sh = shingle_table(df, id_col, text_col, shingle_n)
    if max_df is not None:
        # df(shingle) = docs containing it (shingles are distinct per doc).
        # left_semi keeps the inverted index's (id, shingle) shape; the
        # shuffle on shingle is the same one the self-join needs anyway.
        keep = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_df)
            .select("shingle")
        )
        sh = sh.join(keep, "shingle", "left_semi")
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common") / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common"))
    return (
        common.join(sa, F.col("doc_a") == F.col(f"sa.{id_col}"))
        .join(sb, F.col("doc_b") == F.col(f"sb.{id_col}"))
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


def simhash_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    bits: int = 32,
) -> DataFrame:
    """SimHash document fingerprints: each shingle hashes to ``bits``
    bits (md5 prefix); per bit position the doc accumulates +1/-1 for
    set/unset; the fingerprint keeps the sign. Near-identical documents
    get fingerprints within a small Hamming distance.

    Scale shape: one explode + one groupBy shuffle on id with ``bits``
    partial-aggregating sums — same cost class as the MinHash build,
    but the output is a single 64-bit-packable integer per document.
    """
    sh = shingle_table(df, id_col, text_col, shingle_n)
    hex_digits = bits // 4
    h = F.conv(F.substring(F.md5(F.col("shingle")), 1, hex_digits), 16, 10).cast(
        "long"
    )
    shh = sh.select(id_col, h.alias("h"))
    bit_sums = [
        F.sum(
            F.when(F.shiftrightunsigned("h", j).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(bits)
    ]
    agg = shh.groupBy(id_col).agg(*bit_sums)
    fp = None
    for j in range(bits):
        term = F.when(F.col(f"b{j}") > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fp = term if fp is None else fp + term
    return agg.select(id_col, fp.alias("simhash"))


def simhash_pairs(
    fingerprints: DataFrame,
    id_col: str = "doc_id",
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the fingerprint into
    ``bands`` bit-slices and equi-join on (band, slice) — pigeonhole
    guarantees any pair within ``bands - 1`` Hamming distance collides
    on at least one clean band — then verify ``bit_count(xor) <=
    max_hamming``. Bucketed, never all-pairs."""
    if bits % bands:
        raise ValueError(f"bits ({bits}) must be divisible by bands ({bands})")
    # both self-join sides read the fingerprint frame; one lazy
    # localCheckpoint of the narrow (id, simhash) proxy computes the
    # token-hash aggregation once (r14; guide §8)
    fingerprints = fingerprints.transform(cut_lineage)
    width = bits // bands
    mask = (1 << width) - 1
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned("simhash", b * width).bitwiseAND(mask).alias("bb"),
        )
        for b in range(bands)
    ]
    banded = fingerprints.select(
        F.col(id_col), F.col("simhash"), F.explode(F.array(*band_cols)).alias("x")
    ).select(id_col, "simhash", F.col("x.band").alias("band"), F.col("x.bb").alias("bb"))
    a = banded.alias("a")
    b = banded.alias("b")
    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    ).cast("long")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bb") == F.col("b.bb"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter(hamming <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .distinct()
    )


def neardup_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_iters: int = 16,
) -> DataFrame:
    """The last step of near-dedup: assign every document the MINIMUM id
    of its connected component in the verified near-dup graph (the
    canonical "keep one representative per duplicate cluster" rule).

    Connected components via iterative min-label propagation: each round
    every node takes min(own label, neighbors' labels) — one join + one
    partial-min aggregation per round, converging in O(component
    diameter) rounds. Near-dup components are small by construction
    (they ARE duplicate clusters), so the loop exits almost immediately;
    ``localCheckpoint`` cuts plan lineage each round so the DAG doesn't
    grow with iterations. The convergence probe is an aggregate count —
    no data is collected to the driver.
    """
    pairs = lsh_verified_pairs(
        df, id_col, text_col, num_hashes, bands, shingle_n, threshold
    ).select("doc_a", "doc_b")
    nodes = df.select(F.col(id_col).alias("node"))
    labels = label_propagation(pairs, nodes, max_iters=max_iters)
    return labels.select(
        F.col("node").alias(id_col), F.col("label").alias("cluster_rep")
    )


def label_propagation(
    pairs: DataFrame, nodes: DataFrame, max_iters: int = 16
) -> DataFrame:
    """Connected components by iterative min-label propagation: each
    round every node takes min(own label, neighbors' labels) — one join
    + one partial-min aggregation per round, converging in O(component
    diameter) rounds. ``pairs`` is an undirected edge list (doc_a,
    doc_b); ``nodes`` is one ``node`` column. Returns (node, label)
    where label = the component's minimum node id.

    Each round is neighbor-min propagation followed by one pointer-
    halving step (label <- label(label), the path-compression half of
    pointer-jumping CC a la Shiloach-Vishkin): labels chase the chain
    two hops per round, so a path of diameter d converges in O(log d)
    rounds instead of O(d) — the difference between 6 and 60 shuffles
    on a 100-TB pair graph with one long chain. The default bound of 16
    therefore covers component diameters up to ~2^16; the loop breaks
    at the fixpoint, so a generous bound costs nothing on converged
    graphs.

    ``localCheckpoint(eager=False)`` cuts plan lineage each round so the
    DAG doesn't grow with iterations, and because the checkpoints are
    LAZY the convergence-probe count is the ONLY Spark job per round —
    it materializes that round's checkpoint blocks as a side effect
    (r14: the eager form paid three job dispatches per round — eager
    checkpoint of the neighbor-min frame, the probe count, eager
    checkpoint of the halving frame — and the per-job dispatch floor,
    not the tiny per-round shuffles, dominated every CC-based query at
    bench scale). No data is collected to the driver. The probe only
    watches the neighbor-min step: if that step changes nothing, every
    node's label already lower-bounds its neighborhood, which on an
    undirected graph means labels are constant per component (the
    fixpoint), and compression is a no-op. Raises if ``max_iters``
    rounds pass with labels still changing: returning silently would
    hand out WRONG labels for any component whose diameter exceeds the
    bound."""
    sym = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).transform(cut_lineage)
    # Iterate ONLY over edge-incident nodes: an isolated node's label is
    # trivially itself, and on a near-dup graph the duplicate clusters
    # are a sliver of the corpus — every round's joins then scale with
    # |V_edges|, not |V|. The full node set comes back via one left
    # join after convergence.
    #
    # The seed IS round 0 (r14): min(self, min neighbor) per incident
    # node comes out of one partial-min agg over sym — exactly what the
    # first neighbor-min round would compute from identity labels, for
    # the cost of the identity seed's own distinct. One fewer
    # join+count round for every caller (star/clique components — the
    # near-dup norm — then converge on the FIRST probe), and the
    # monotone-min invariant (label <= own id, label >= component min,
    # label always an incident node's id) holds from the start.
    labels = (
        sym.groupBy("doc_a")
        .agg(F.least(F.col("doc_a"), F.min("doc_b")).alias("label"))
        .select(F.col("doc_a").alias("node"), "label")
        .transform(cut_lineage)
    )
    changed = 0
    for _ in range(max_iters):
        neigh = (
            sym.join(labels, sym.doc_b == labels.node)
            .groupBy("doc_a")
            .agg(F.min("label").alias("nlabel"))
        )
        # the changed flag rides along in the same checkpointed pass —
        # the probe count below is the round's ONE job: it computes and
        # stores the lazy checkpoint's blocks while counting, so no
        # separate materialization job ever runs
        new_label = F.least(
            F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
        )
        flagged = (
            labels.join(neigh, labels.node == neigh.doc_a, "left")
            .select(
                "node",
                new_label.alias("label"),
                (new_label != F.col("label")).alias("chg"),
            )
            .transform(cut_lineage)
        )
        changed = flagged.filter(F.col("chg")).count()
        labels = flagged.drop("chg")
        if changed == 0:
            break
        # pointer halving: every label is an existing node id, so its
        # own label exists; least() keeps the monotone-min invariant
        hop = labels.select(
            F.col("node").alias("pnode"), F.col("label").alias("plabel")
        )
        # lazy: the halving frame's blocks are computed and stored by
        # the NEXT round's probe count (or by the consumer's action on
        # the final result), never by a dedicated job
        labels = (
            labels.join(hop, labels.label == hop.pnode)
            .select("node", F.least("label", "plabel").alias("label"))
            .transform(cut_lineage)
        )
    if changed:
        # `changed` was counted BEFORE the last round's pointer-halving
        # step, so a graph that lands on the fixpoint exactly at the
        # max_iters boundary would raise spuriously. Re-probe against
        # the post-halving labels (one more neighbor-min comparison)
        # and only raise if a label would still move.
        neigh = (
            sym.join(labels, sym.doc_b == labels.node)
            .groupBy("doc_a")
            .agg(F.min("label").alias("nlabel"))
        )
        still = (
            labels.join(neigh, labels.node == neigh.doc_a, "left")
            .filter(F.coalesce(F.col("nlabel"), F.col("label")) < F.col("label"))
            .count()
        )
        if still:
            raise RuntimeError(
                f"label_propagation did not converge within max_iters={max_iters} "
                f"({still} labels still changing); a component's diameter "
                "exceeds the iteration bound — raise max_iters"
            )
    prop = labels.select(
        F.col("node").alias("enode"), F.col("label").alias("elabel")
    )
    return nodes.select("node").join(
        prop, nodes["node"] == prop["enode"], "left"
    ).select("node", F.coalesce("elabel", "node").alias("label"))


def jaccard_join_prefix(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT Jaccard similarity join via prefix filtering (AllPairs,
    Bayardo et al. 2007; the PPJoin candidate rule without positional
    refinement): every pair with J(A, B) ≥ ``threshold`` is returned —
    no LSH false negatives, no quadratic hot-shingle risk.

    The prefix principle: order all shingles by one GLOBAL total order
    (ascending document frequency, rarest first; ties by shingle text).
    If J(A,B) ≥ t then A and B must share at least one shingle among
    each one's first ``|X| - ⌈t·|X|⌉ + 1`` shingles under that order —
    so candidates are pairs co-occurring in a PREFIX, and everything
    else is provably below threshold. Because prefixes consist of the
    RAREST shingles, corpus boilerplate (the hot keys that make the
    inverted-index self-join quadratic) almost never lands in one: a
    shingle with document frequency d contributes at most d²/2
    candidates and the prefix keeps d small. A size filter
    (t·|A| ≤ |B| ≤ |A|/t, necessary for J ≥ t) prunes the rest before
    verification.

    Shape: one df-count aggregation, ONE per-doc aggregation whose
    sorted (df, shingle) array serves triple duty — prefix slice, set
    size, and the verification set (no separate window, no separate
    sizes agg, no second collect_set shuffle) — then a shingle-keyed
    candidate join and the same map-side ``array_intersect``
    verification as ``lsh_verified_pairs``. This is the exact-join
    complement of the LSH lane: use LSH when approximate recall is
    acceptable and the corpus is huge, this when the answer must be
    complete (compliance-grade dedup, evaluation of the LSH lane's
    recall).

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    sh = shingle_table(df, id_col, text_col, shingle_n)
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("__df"))
    # ONE per-doc agg: the lexicographically sorted (df, shingle)
    # structs realize the global rarest-first order per document
    # per_doc (the rarest-first ordered shingle list per document) is
    # referenced several times below (prefix probes, index, both
    # verification sides); without materialization the shingle explode
    # + document-frequency join + collect_list sort re-runs per
    # reference. One lazy localCheckpoint computes it once (r14:
    # 4.5-6.1 s -> 2.5-4.4 s interleaved A/B on dedup_containment_join
    # at sf0.1, row-identical; guide §8 proxy pattern)
    per_doc = (
        sh.join(dfreq, "shingle")
        .groupBy(id_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct("__df", "shingle"))
            ).alias("__ordered")
        )
        .withColumn("__n", F.size("__ordered"))
        .transform(cut_lineage)
    )
    # the -1e-9 guards fp: t*n landing a hair ABOVE an exact integer
    # would over-ceil, shortening the prefix and silently dropping a
    # legitimate pair — the one failure an "exact" join cannot have.
    # (A hair UNDER only lengthens the prefix: extra candidates, the
    # verify step discards them.)
    prefix_len = F.col("__n") - F.ceil(
        F.lit(threshold) * F.col("__n") - F.lit(1e-9)
    ).cast("int") + 1
    pref = per_doc.select(
        F.col(id_col),
        F.col("__n"),
        F.posexplode(F.slice("__ordered", 1, prefix_len)).alias(
            "__pos", "__p"
        ),
    ).select(id_col, "__n", "__pos", F.col("__p.shingle").alias("shingle"))
    pa = pref.alias("pa")
    pb = pref.alias("pb")
    # PPJoin positional filter: J >= t forces an overlap of at least
    # alpha = ceil(t/(1+t) * (|A|+|B|)). For the pair's order-MINIMAL
    # common shingle (positions i_a, i_b, 0-based) every common element
    # lies in the suffixes, so overlap <= min(|A|-i_a, |B|-i_b); rows
    # failing that bound cannot be the minimal witness and the minimal
    # one always survives — distinct() after the filter keeps the pair
    # exactly once. Same -1e-9 fp guard as everywhere: never over-prune.
    alpha = F.ceil(
        F.lit(threshold / (1.0 + threshold))
        * (F.col("pa.__n") + F.col("pb.__n"))
        - F.lit(1e-9)
    )
    cand = (
        pa.join(
            pb,
            (F.col("pa.shingle") == F.col("pb.shingle"))
            & (F.col(f"pa.{id_col}") < F.col(f"pb.{id_col}"))
            # size filter: J >= t forces min(|A|,|B|) >= t * max(|A|,|B|)
            # (same -1e-9 fp guard as the prefix length: never prune a
            # boundary-exact pair)
            & (F.col("pb.__n") * F.lit(threshold) - F.lit(1e-9)
               <= F.col("pa.__n"))
            & (F.col("pa.__n") * F.lit(threshold) - F.lit(1e-9)
               <= F.col("pb.__n"))
            & (
                F.least(
                    F.col("pa.__n") - F.col("pa.__pos"),
                    F.col("pb.__n") - F.col("pb.__pos"),
                )
                >= alpha
            ),
        )
        .select(
            F.col(f"pa.{id_col}").alias("doc_a"),
            F.col(f"pb.{id_col}").alias("doc_b"),
        )
        .distinct()
    )
    sets = per_doc.select(
        F.col(id_col),
        F.transform("__ordered", lambda x: x["shingle"]).alias("shs"),
    )
    sa = sets.alias("sa")
    sb = sets.alias("sb")
    n_common = F.size(F.array_intersect(F.col("sa.shs"), F.col("sb.shs")))
    n_union = F.size(F.col("sa.shs")) + F.size(F.col("sb.shs")) - n_common
    jac = n_common / n_union
    return (
        cand.join(sa, F.col("doc_a") == F.col(f"sa.{id_col}"))
        .join(sb, F.col("doc_b") == F.col(f"sb.{id_col}"))
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


def containment_join_prefix(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """EXACT max-containment join: every pair with
    max(c(A→B), c(B→A)) = |A∩B| / min(|A|, |B|) ≥ ``threshold`` —
    the complete answer to the asymmetric case ``containment_pairs``
    serves approximately (MinHash bands collide on JACCARD, so a tiny
    document quoted inside a huge one may never become an LSH
    candidate; here it must).

    Candidate rule (the probe/index asymmetry of set-containment
    joins): max-containment ≥ t forces overlap ≥ t·|X| for the
    SMALLER set X, so X's order-minimal common shingle sits inside
    X's Jaccard-style prefix (first |X| − ⌈t·|X|⌉ + 1 under the
    global rarest-first order — same argument as
    ``jaccard_join_prefix``); the larger side indexes ALL its
    shingles, so the witness is always found. Orientation
    (smaller probes larger, ids break size ties) keeps each pair
    generated once before the distinct.

    Cost note: the index side is the full inverted list, so a
    globally-rare shingle shared by one small and many large
    documents fans out — candidate volume is
    Σ_s probe_df(s)·index_df(s), bounded in practice because probes
    carry only each document's rarest shingles. Corpus boilerplate
    in the INDEX side is harmless: it joins only probes that carry
    it, and hot shingles are (by construction) almost never in a
    prefix.

    Returns (doc_a, doc_b, cont_a_in_b, cont_b_in_a, jaccard) with
    doc_a < doc_b, same shape as ``containment_pairs``.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    sh = shingle_table(df, id_col, text_col, shingle_n)
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("__df"))
    # per_doc (the rarest-first ordered shingle list per document) is
    # referenced several times below (prefix probes, index, both
    # verification sides); without materialization the shingle explode
    # + document-frequency join + collect_list sort re-runs per
    # reference. One lazy localCheckpoint computes it once (r14:
    # 4.5-6.1 s -> 2.5-4.4 s interleaved A/B on dedup_containment_join
    # at sf0.1, row-identical; guide §8 proxy pattern)
    per_doc = (
        sh.join(dfreq, "shingle")
        .groupBy(id_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct("__df", "shingle"))
            ).alias("__ordered")
        )
        .withColumn("__n", F.size("__ordered"))
        .transform(cut_lineage)
    )
    prefix_len = F.col("__n") - F.ceil(
        F.lit(threshold) * F.col("__n") - F.lit(1e-9)
    ).cast("int") + 1
    probes = per_doc.select(
        F.col(id_col),
        F.col("__n"),
        F.explode(F.slice("__ordered", 1, prefix_len)).alias("__p"),
    ).select(id_col, "__n", F.col("__p.shingle").alias("shingle"))
    index = per_doc.select(
        F.col(id_col),
        F.col("__n"),
        F.explode("__ordered").alias("__p"),
    ).select(id_col, "__n", F.col("__p.shingle").alias("shingle"))
    p, i = probes.alias("p"), index.alias("i")
    cand = (
        p.join(
            i,
            (F.col("p.shingle") == F.col("i.shingle"))
            # probe side is the smaller set; ids break size ties
            & (
                (F.col("p.__n") < F.col("i.__n"))
                | (
                    (F.col("p.__n") == F.col("i.__n"))
                    & (F.col(f"p.{id_col}") < F.col(f"i.{id_col}"))
                )
            ),
        )
        .select(
            F.least(
                F.col(f"p.{id_col}"), F.col(f"i.{id_col}")
            ).alias("doc_a"),
            F.greatest(
                F.col(f"p.{id_col}"), F.col(f"i.{id_col}")
            ).alias("doc_b"),
        )
        .distinct()
    )
    sets = per_doc.select(
        F.col(id_col),
        F.transform("__ordered", lambda x: x["shingle"]).alias("shs"),
    )
    sa = sets.alias("sa")
    sb = sets.alias("sb")
    n_common = F.size(F.array_intersect(F.col("sa.shs"), F.col("sb.shs")))
    n_a = F.size(F.col("sa.shs"))
    n_b = F.size(F.col("sb.shs"))
    cont_ab = n_common / n_a
    cont_ba = n_common / n_b
    jac = n_common / (n_a + n_b - n_common)
    return (
        cand.join(sa, F.col("doc_a") == F.col(f"sa.{id_col}"))
        .join(sb, F.col("doc_b") == F.col(f"sb.{id_col}"))
        .filter(F.greatest(cont_ab, cont_ba) >= threshold)
        .select(
            "doc_a",
            "doc_b",
            F.round(cont_ab, 4).alias("cont_a_in_b"),
            F.round(cont_ba, 4).alias("cont_b_in_a"),
            F.round(jac, 4).alias("jaccard"),
        )
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Asymmetric near-dup detection: shingle CONTAINMENT
    c(A→B) = |A ∩ B| / |A| over LSH candidate pairs — the measure that
    catches quote-inclusion and superset duplication (one document
    embedding another), where Jaccard dilutes toward 0 as the size
    ratio grows. Returns (doc_a, doc_b, cont_a_in_b, cont_b_in_a,
    jaccard) for pairs whose MAX directional containment ≥
    ``threshold``.

    Same scale posture as ``lsh_verified_pairs``: banded-MinHash
    candidates, map-side ``array_intersect`` verification — linear in
    candidates, immune to hot-shingle skew. Honest recall caveat:
    MinHash bands collide on JACCARD, so a high-containment pair with
    tiny Jaccard (a tweet inside a book) may never become a candidate;
    a corpus where that asymmetry dominates wants an LSH-Ensemble-style
    partition-by-size band plan at the candidate step (documented seam
    — the verify step here is already containment-correct)."""
    if not 0.0 <= threshold <= 1.0:
        raise ValueError(f"threshold must be in [0, 1], got {threshold}")
    sh = shingle_table(df, id_col, text_col, shingle_n)
    sig = signatures_from_shingles(sh, id_col, num_hashes)
    cand = minhash_lsh_pairs(sig, id_col, num_hashes, bands)
    sets = sh.groupBy(id_col).agg(F.collect_set("shingle").alias("shs"))
    sa = sets.alias("sa")
    sb = sets.alias("sb")
    n_common = F.size(F.array_intersect(F.col("sa.shs"), F.col("sb.shs")))
    n_a = F.size(F.col("sa.shs"))
    n_b = F.size(F.col("sb.shs"))
    cont_ab = n_common / n_a
    cont_ba = n_common / n_b
    jac = n_common / (n_a + n_b - n_common)
    return (
        cand.join(sa, F.col("doc_a") == F.col(f"sa.{id_col}"))
        .join(sb, F.col("doc_b") == F.col(f"sb.{id_col}"))
        .filter(F.greatest(cont_ab, cont_ba) >= threshold)
        .select(
            "doc_a",
            "doc_b",
            F.round(cont_ab, 4).alias("cont_a_in_b"),
            F.round(cont_ba, 4).alias("cont_b_in_a"),
            F.round(jac, 4).alias("jaccard"),
        )
    )


def neardup_keep_best(
    df: DataFrame,
    quality_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_iters: int = 16,
) -> DataFrame:
    """Near-dedup that keeps the BEST document of each duplicate
    cluster instead of the first: cluster via ``neardup_clusters``
    (LSH → verify → connected components), then elect per cluster the
    row maximizing ``quality_col`` (ties → smallest id, so the
    election is deterministic). Returns the input rows plus
    (cluster_rep, keep) — callers filter ``keep`` or inspect the
    losers for the audit trail.

    This is the production policy (keep the cleanest copy, not the
    accidental id-minimum); cost over keep-first is ONE extra window
    over the cluster assignment — the corpus text never re-shuffles
    (the window runs on (id, cluster, quality) columns only)."""
    from pyspark.sql import Window as W

    clusters = neardup_clusters(
        df, id_col, text_col, num_hashes, bands, shingle_n, threshold,
        max_iters,
    )
    slim = df.select(id_col, quality_col).join(clusters, id_col)
    w = W.partitionBy("cluster_rep").orderBy(
        F.desc(quality_col), F.asc(id_col)
    )
    elected = slim.withColumn("__rn", F.row_number().over(w)).select(
        id_col, "cluster_rep", (F.col("__rn") == 1).alias("keep")
    )
    return df.join(elected, id_col)


def lsh_verified_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """The 100 TB near-dedup shape: banded-LSH candidate generation, then
    exact Jaccard verification of ONLY the candidates.

    Unlike ``jaccard_pairs`` (inverted-index self-join — quadratic on hot
    shingles), the verify step here joins the small candidate-pair set to
    per-document shingle sets and computes |A ∩ B| map-side with
    ``array_intersect`` — cost is linear in candidates, immune to
    shingle-frequency skew.

    The signature build and the shingle-set build share ONE aggregation
    (r14): the k partial mins and ``collect_set`` ride the same
    groupBy(id) exchange, and the result is lazily localCheckpoint-ed so
    the band self-join and both verification joins read the stored
    blocks instead of re-running the explode + shuffle per reference.
    Before, the two aggs had different partial-agg subtrees, so Spark's
    ReuseExchange could not share them and the shingle explode (tokens +
    n-grams + k md5s per shingle — the dominant map work of the whole
    near-dedup family) executed twice per query. Cost of the trade: the
    per-doc shingle sets are stored once (memory-and-disk blocks, same
    class as the eventual collect_set shuffle both plans pay) instead of
    recomputed. The checkpointed frame keeps its hash partitioning on
    ``id_col``, so the verification joins exchange only the (small)
    candidate side.
    """
    sh = shingle_table(df, id_col, text_col, shingle_n)
    sig_aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"sig{i}")
        for i in range(num_hashes)
    ]
    feat = (
        sh.groupBy(id_col)
        .agg(*sig_aggs, F.collect_set("shingle").alias("shs"))
        .transform(cut_lineage)
    )
    sig = feat.select(id_col, *[f"sig{i}" for i in range(num_hashes)])
    cand = minhash_lsh_pairs(sig, id_col, num_hashes, bands)
    sets = feat.select(id_col, "shs")
    sa = sets.alias("sa")
    sb = sets.alias("sb")
    n_common = F.size(F.array_intersect(F.col("sa.shs"), F.col("sb.shs")))
    n_union = F.size(F.col("sa.shs")) + F.size(F.col("sb.shs")) - n_common
    jac = n_common / n_union
    return (
        cand.join(sa, F.col("doc_a") == F.col(f"sa.{id_col}"))
        .join(sb, F.col("doc_b") == F.col(f"sb.{id_col}"))
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )
