"""Similarity-search query inventory (north-star, SURVEY.md §2.11) over
``embeddings`` (array<float>, 64-dim).

- ``vector_cosine_topk``: similarity search, both lanes tagged in one
  result — ``exact`` brute-force top-k (the correctness baseline; the
  query vector is an inlined literal, the scan embarrassingly parallel)
  and ``ivf_probe`` (probe the NPROBE nearest quantizer cells only —
  the scan prunes to ~NPROBE/k of the data, the 100-TB path).
- ``vector_ann_ivf_bucketed``: the scale path — IVF-style bucketed
  similarity join with a LEARNED coarse quantizer: deterministic k-means
  (fixed init = the first ``NUM_CENTROIDS`` vectors, exactly
  ``KMEANS_ITERS`` Lloyd iteration(s); components rounded to 6 decimals
  each M-step so cross-engine summation-order drift cannot move a
  boundary assignment), every vector assigned to its argmax-cosine cell
  entirely map-side (centroids collapse to ONE broadcast array row;
  assignment is ``transform`` + ``array_max``, no shuffle), and
  candidates only meet within a cell — the quadratic cross join becomes
  a per-cell equi-join. Each E-step is one broadcast projection; each
  M-step is one posexplode + (cell, dim) partial-aggregating shuffle —
  per iteration cost is linear in rows x dims, never pairwise.
- ``dedup_embedding_cosine``: embedding-cosine near-dup — the semantic
  lane of the dedup ladder. Same learned quantizer, higher threshold,
  then connected-components representatives (shared min-label
  propagation operator); oracle checks the fixpoint against an exact
  recursive-CTE transitive closure.

Arithmetic is double on both engines; scores rounded to 4 places so
summation-order ulp drift can't flip the hash.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import as_double, cosine, l2_norm
from ..sources.readers import load_table as t

QUERY_VEC_ID = 0
TOPK = 10
NUM_CENTROIDS = 8
NPROBE = 2
IVF_THRESHOLD = 0.35
KMEANS_ITERS = 2
CENTROID_DECIMALS = 6
# Embedding near-dup threshold. Raw (unrounded) cosine is compared on
# both engines: verified safe because the test fixture's closest pair to
# the boundary sits >= 1e-4 away at every SF (ulp drift is ~1e-15).
EMB_DUP_THRESHOLD = 0.45


def _query_vector(sf_dir: str, vec_id: int) -> list[float]:
    """Driver-side parameter fetch: the query vector is an INPUT to the
    search (in production it arrives with the request), not distributed
    data — read it with pyarrow on the driver, no Spark job. float32 ->
    Python float is the exact same widening Spark's float->double cast
    performs, so literals match the scan-side arithmetic bit-for-bit."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "==", vec_id)],
    )
    return [float(x) for x in tbl.column("embedding")[0].as_py()]


def vector_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity SEARCH, both lanes in one result (tagged by
    ``method``):

    - ``exact``: brute-force cosine top-k — the correctness baseline.
      The 1-row query vector is fetched once driver-side and inlined as
      an array LITERAL (same policy as the IDF scalar in
      queries/text.py): a single scan -> project ->
      TakeOrderedAndProject job, no broadcast-build job, no join.
    - ``ivf_probe``: probe only the NPROBE quantizer cells whose
      centroids are nearest the query vector, then score just those
      vectors. Probe selection is a k-by-1 driver-side argsort over
      MODEL STATE (margins to the next cell >= 0.014 on the fixture,
      far above cross-engine drift). The lane scans the cell-partitioned
      INDEX (built once per corpus by ``_ivf_index_path``), so the
      ``cell IN (probed)`` filter is PartitionFilters-level pruning —
      only the NPROBE probed cells' files are ever read (plan-pinned in
      tests/test_plans.py). At 100 TB that is the difference between
      touching every vector and touching ~nprobe/k of the files.

    Both lanes order by (rounded cosine desc, vec_id) so the k-boundary
    cut is engine-deterministic."""
    qv = _query_vector(sf_dir, QUERY_VEC_ID)
    q = F.array(*[F.lit(x) for x in qv])
    emb = _embeddings(spark, sf_dir).filter(F.col("vec_id") != QUERY_VEC_ID)

    def topk(df, tag):
        # + 0.0 normalizes IEEE -0.0 (a negative cosine rounding to
        # zero would hash differently across engines)
        return (
            df.select(
                "vec_id",
                (F.round(cosine(F.col("v"), q), 4) + F.lit(0.0)).alias(
                    "cosine"
                ),
            )
            .orderBy(F.desc("cosine"), F.asc("vec_id"))
            .limit(TOPK)
            .withColumn("method", F.lit(tag))
        )

    exact = topk(emb, "exact")

    cents = _learned_centroids(spark, sf_dir)
    probe = _probe_cells(cents, qv, NPROBE)
    # Scan the cell-partitioned index: `cell IN (probed)` prunes at the
    # file level, so the k - nprobe unprobed cells are never read.
    probed = (
        spark.read.parquet(_ivf_index_path(spark, sf_dir))
        .filter(F.col("cell").isin(probe))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", "v")
    )
    return exact.unionAll(topk(probed, "ivf_probe"))


def _probe_cells(
    cents: list[tuple[int, list[float]]], qv: list[float], nprobe: int
) -> list[int]:
    """The ``nprobe`` cells whose centroids are cosine-nearest the
    query vector (ties -> lowest cell id). Pure model-state x
    query-parameter math — runs on the driver like every ANN system's
    probe-selection step. A zero query vector has no direction to
    search along — rejected loudly; a zero-norm centroid (possible if
    a cell's rounded means collapse) is simply never probed."""
    import math

    qn = math.sqrt(sum(x * x for x in qv))
    if qn == 0.0:
        raise ValueError("probe query vector has zero norm: cosine undefined")
    scored = sorted(
        (
            -sum(a * b for a, b in zip(cv, qv)) / (cn * qn),
            cell,
        )
        for cell, cv in cents
        if (cn := math.sqrt(sum(a * a for a in cv))) > 0.0
    )
    return [cell for _, cell in scored[:nprobe]]


# ORACLE_COSINE_TOPK is defined below _IVF_ASSIGN_CTES (the ivf_probe
# lane shares the quantizer CTE chain).


def _assign_cells(emb: DataFrame, cents: list[tuple[int, list[float]]]) -> DataFrame:
    """E-step: argmax-cosine cell assignment as a pure projection. The
    centroid set is inlined as an array-of-structs LITERAL, so the
    assignment is map-side only — no broadcast-build job, no crossJoin,
    zero shuffles; argmax via transform + array_max (ties -> lowest
    cell id). Zero-norm vectors are dropped — the same index contract
    as the Arrow kernel (operators/vector_ops.py), so the two
    formulations stay pair-for-pair comparable. The SQL oracle twins do
    NOT replicate the drop (they'd order NULL cosines arbitrarily);
    that contract is safe because the fixture contains no zero vectors,
    asserted by tests/test_edge_cases.py::test_fixture_has_no_zero_vectors."""
    arr = F.array(
        *[
            F.struct(
                F.lit(cell).alias("cell"),
                F.array(*[F.lit(x) for x in cv]).alias("cv"),
            )
            for cell, cv in cents
        ]
    )
    best = F.array_max(
        F.transform(
            arr,
            lambda c: F.struct(
                cosine(F.col("v"), c["cv"]).alias("cs"),
                (-c["cell"]).alias("nc"),
            ),
        )
    )
    return (
        emb.filter(l2_norm(F.col("v")) > 0)
        .select("vec_id", "v", (-best["nc"]).alias("cell"))
    )


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    )


_CENTROID_CACHE: dict[str, list[tuple[int, list[float]]]] = {}


def _learned_centroids(
    spark: SparkSession, sf_dir: str
) -> list[tuple[int, list[float]]]:
    """Deterministic k-means centroids: init = the first NUM_CENTROIDS
    vectors, then KMEANS_ITERS Lloyd iteration(s). The centroid set is
    O(k x d) MODEL STATE, not data — it lives on the driver between
    iterations (exactly how Spark MLlib's KMeans runs Lloyd's
    algorithm) and is inlined into each E-step as a literal, so
    assignment is a pure map-side projection. Each M-step is one
    posexplode + (cell, dim) partial-aggregating shuffle over the DATA,
    which never leaves the executors. Means are rounded so the DuckDB
    twin lands on bit-identical centroids; empty cells drop out
    identically in both engines (they simply have no mean rows).

    The fit is memoized per sf_dir: an IVF index is built once and
    probed many times (the build/query split every ANN system has), so
    the three vector queries sharing one quantizer re-fit it exactly
    once per process. The cached value is plain Python data derived
    deterministically from the parquet files — it is session-free and
    safe across SparkSession restarts."""
    cached = _CENTROID_CACHE.get(sf_dir)
    if cached is not None:
        return cached
    cents = _fit_centroids(_embeddings(spark, sf_dir))
    _CENTROID_CACHE[sf_dir] = cents
    return cents


def _fit_centroids(emb: DataFrame) -> list[tuple[int, list[float]]]:
    """The uncached Lloyd fit over an arbitrary (vec_id, v) frame —
    shared by the declared queries (via _learned_centroids) and the
    amplified-scale experiment, so the two can never desynchronize."""
    from ..operators.vector_ops import assign_cells_arrow

    cents = sorted(
        (r.vec_id, list(r.v))
        for r in emb.filter(F.col("vec_id") < NUM_CENTROIDS).collect()
    )
    for _ in range(KMEANS_ITERS):
        assigned = assign_cells_arrow(emb, cents)
        mean_rows = (
            assigned.select("cell", F.posexplode("v").alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(F.round(F.avg("x"), CENTROID_DECIMALS).alias("m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in mean_rows:
            by_cell.setdefault(r.cell, {})[r.dim] = r.m
        cents = sorted(
            (cell, [dims[d] for d in sorted(dims)])
            for cell, dims in by_cell.items()
        )
    return cents


def _ivf_index_path(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per corpus per process) the IVF INDEX: quantizer-cell
    assignments written as parquet PARTITIONED BY ``cell``. This is the
    build/query split every ANN system has — the build pays one linear
    assignment pass (the Arrow kernel, zero shuffles before the write),
    and every probe afterwards prunes at SCAN time through the
    Hive-style ``cell=<n>/`` directories: a probe's ``cell IN (...)``
    touches nprobe of k partitions' files instead of the whole corpus.

    The index lives in the system temp dir (same policy as the
    streaming checkpoints) keyed by corpus path, row count, and the
    quantizer config, so a changed fixture or constant can never serve
    a stale index. Only (vec_id, v) ride in the files — the unit
    vector is recomputed where needed, keeping the index bytes
    minimal.

    The content key (size+mtime of every part) is recomputed on EVERY
    call — a fixture regenerated mid-process changes the tag and misses
    to a rebuild, never serving a stale index. Builds land in a unique
    temp dir that is atomically renamed into place, so two concurrent
    processes racing the same build can't interleave part files: the
    loser's rename fails against the winner's directory and its build
    is discarded."""
    import hashlib
    import tempfile

    import pyarrow.parquet as pq

    from ..operators.vector_ops import assign_cells_arrow

    src = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.isdir(src):  # multi-file layout: sum the part footers
        parts = [
            os.path.join(src, f)
            for f in sorted(os.listdir(src))
            if f.endswith(".parquet")
        ]
        n = sum(pq.ParquetFile(p).metadata.num_rows for p in parts)
    else:
        parts = [src]
        n = pq.ParquetFile(src).metadata.num_rows
    # size+mtime make the key content-sensitive: a regenerated fixture
    # with the SAME row count must not serve a stale index
    stat = ";".join(
        f"{os.path.getsize(p)}:{os.path.getmtime(p):.0f}" for p in parts
    )
    key = (
        f"{os.path.abspath(sf_dir)}|{n}|{stat}|{NUM_CENTROIDS}"
        f"|{KMEANS_ITERS}|{CENTROID_DECIMALS}"
    )
    tag = hashlib.md5(key.encode()).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_ivf_{tag}")
    # a bare directory is NOT a complete index: Spark creates the dir
    # before writing part files, so an interrupted build leaves a
    # partial tree. Only the _SUCCESS marker certifies completeness;
    # anything else is rebuilt (into a private tmp dir, renamed into
    # place atomically).
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        import shutil
        import uuid

        tmp = f"{path}.build-{uuid.uuid4().hex[:8]}"
        cents = _learned_centroids(spark, sf_dir)
        (
            assign_cells_arrow(_embeddings(spark, sf_dir), cents)
            .select("vec_id", "v", "cell")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(tmp)
        )
        try:
            if os.path.exists(path):  # stale partial from a dead build
                shutil.rmtree(path)
            os.rename(tmp, path)
        except OSError:
            # a concurrent build won the rename; its index is complete
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.exists(os.path.join(path, "_SUCCESS")):
                raise
    return path


def _ivf_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned-quantizer cell assignment (vec_id, v, cell) shared by the
    ANN join and the embedding near-dup query."""
    return _assign_cells(
        _embeddings(spark, sf_dir), _learned_centroids(spark, sf_dir)
    )


def _cell_pairs(assign: DataFrame, threshold: float) -> DataFrame:
    """Within-cell candidate pairs above a cosine threshold as a JVM
    expression join. This is the independent REFERENCE formulation of
    the Arrow GEMM kernel (operators/vector_ops.py) — kept for the
    cross-validation tests, which assert both paths produce the same
    pair set; the declared queries use the kernel (8-14x faster, see
    the kernel module docstring)."""
    a = assign.alias("a")
    b = assign.alias("b")
    cos = cosine(F.col("a.v"), F.col("b.v"))
    return (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos >= threshold)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.cell").alias("cell"),
            F.round(cos, 4).alias("cosine"),
        )
    )


def vector_ann_ivf_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.vector_ops import assign_cells_arrow, cell_cosine_pairs_arrow

    cents = _learned_centroids(spark, sf_dir)
    pairs = cell_cosine_pairs_arrow(
        assign_cells_arrow(_embeddings(spark, sf_dir), cents),
        IVF_THRESHOLD,
        with_score=True,
    )
    # rounding stays JVM-side: the kernel emits the raw cosine
    return pairs.select(
        F.col("doc_a").alias("vec_a"),
        F.col("doc_b").alias("vec_b"),
        "cell",
        F.round("cosine", 4).alias("cosine"),
    )


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection — the semantic-dedup
    lane of the curation ladder (exact / MinHash-LSH / SimHash / Jaccard
    live in queries/dedup.py). Candidate pairs meet only inside their
    learned IVF cell (same quantizer as ``vector_ann_ivf_bucketed``),
    verified pairs (cosine >= EMB_DUP_THRESHOLD) feed the same
    connected-components min-label propagation as the text near-dup
    path, and every vector gets its cluster representative (minimum
    vec_id of its component). Per-vector output, so downstream curation
    is one semi-join on ``vec_id == cluster_rep``.

    Scale shape: quantizer cost is linear in rows x dims; candidate
    generation is per-cell bucketed (never all-pairs) and runs as an
    Arrow GEMM kernel (``operators/vector_ops.py`` — measured 8-14x
    over the JVM expression join, which can't codegen a 64-term dot per
    pair); CC label propagation is O(log diameter) pointer-halving
    rounds and near-dup components are small by construction.
    Bytes/vectors never ride the CC shuffles — edges carry only id
    pairs."""
    from ..operators.dedup import label_propagation
    from ..operators.vector_ops import assign_cells_arrow, cell_cosine_pairs_arrow

    cents = _learned_centroids(spark, sf_dir)
    emb = _embeddings(spark, sf_dir)
    pairs = cell_cosine_pairs_arrow(
        assign_cells_arrow(emb, cents), EMB_DUP_THRESHOLD
    )
    nodes = emb.select(F.col("vec_id").alias("node"))
    labels = label_propagation(pairs, nodes)
    return labels.select(
        F.col("node").alias("vec_id"), F.col("label").alias("cluster_rep")
    )


_COS_EC = """list_dot_product(e.v, c.cv)
                    / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv)))"""

def _ivf_assign_ctes(iters: int = KMEANS_ITERS) -> str:
    """SQL twin of ``_fit_centroids`` + ``_ivf_assignments``, GENERATED
    for any Lloyd iteration count so the oracle can never freeze the
    quantizer quality at one hand-unrolled iteration: ``c0`` seeds from
    the first NUM_CENTROIDS vectors, then each iteration i contributes
    an assignment (``s{i}``/``a{i}``) and a rounded mean refresh
    (``m{i+1}``/``c{i+1}``); the chain ends at ``assign`` — the
    assignment under the FINAL centroids ``c{iters}``. Empty cells
    simply have no mean rows and drop out, exactly as in the Python
    fit."""

    def assign_cte(name: str, cents: str) -> str:
        return f"""{name} AS (
  SELECT e.vec_id, e.v, c.cell,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY {_COS_EC} DESC,
                    c.cell ASC) AS rn
  FROM e, {cents} c
)"""

    parts = [
        "e AS (\n  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings\n)",
        f"c0 AS (\n  SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < {NUM_CENTROIDS}\n)",
    ]
    for i in range(iters):
        parts.append(assign_cte(f"s{i}", f"c{i}"))
        parts.append(f"a{i} AS (SELECT vec_id, v, cell FROM s{i} WHERE rn = 1)")
        parts.append(
            f"""m{i + 1} AS (
  SELECT cell, u.i AS i, round(avg(v[u.i]), {CENTROID_DECIMALS}) AS m
  FROM a{i}, unnest(generate_series(1, len(v))) AS u(i)
  GROUP BY cell, u.i
)"""
        )
        parts.append(
            f"c{i + 1} AS (SELECT cell, list(m ORDER BY i) AS cv"
            f" FROM m{i + 1} GROUP BY cell)"
        )
    parts.append(assign_cte(f"s{iters}", f"c{iters}"))
    parts.append(f"assign AS (SELECT vec_id, v, cell FROM s{iters} WHERE rn = 1)")
    return ",\n".join(parts)


# Shared quantizer CTE chain (ends at `assign`) — reused by the ANN
# oracle and the near-dup oracle. _FINAL_CENTS names the CTE holding the
# final learned centroids (the probe-selection input).
_IVF_ASSIGN_CTES = _ivf_assign_ctes()
_FINAL_CENTS = f"c{KMEANS_ITERS}"

_COS_EQ = """list_dot_product(x.v, q.qv)
             / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(q.qv, q.qv)))"""

ORACLE_COSINE_TOPK = f"""
WITH {_IVF_ASSIGN_CTES},
q AS (SELECT v AS qv FROM e WHERE vec_id = {QUERY_VEC_ID}),
pcells AS (
  SELECT c.cell
  FROM {_FINAL_CENTS} c, q
  -- mirror _probe_cells' zero-norm exclusion: a collapsed centroid's
  -- NaN cosine would sort greatest in DuckDB and be probed first
  WHERE list_dot_product(c.cv, c.cv) > 0
  ORDER BY list_dot_product(c.cv, q.qv)
           / (sqrt(list_dot_product(c.cv, c.cv)) * sqrt(list_dot_product(q.qv, q.qv))) DESC,
           c.cell ASC
  LIMIT {NPROBE}
),
ex AS (
  SELECT x.vec_id, round({_COS_EQ}, 4) + 0.0 AS cosine, 'exact' AS method
  FROM e x, q
  WHERE x.vec_id <> {QUERY_VEC_ID}
  ORDER BY cosine DESC, x.vec_id ASC
  LIMIT {TOPK}
),
iv AS (
  SELECT x.vec_id, round({_COS_EQ}, 4) + 0.0 AS cosine, 'ivf_probe' AS method
  FROM assign x, q
  WHERE x.cell IN (SELECT cell FROM pcells) AND x.vec_id <> {QUERY_VEC_ID}
  ORDER BY cosine DESC, x.vec_id ASC
  LIMIT {TOPK}
)
SELECT * FROM ex
UNION ALL
SELECT * FROM iv
"""

ORACLE_ANN_IVF = f"""
WITH {_IVF_ASSIGN_CTES}
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.cell AS cell,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4)
           AS cosine
FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
      >= {IVF_THRESHOLD}
"""

# Near-dup oracle: same quantizer CTEs, higher threshold, then TRUE
# connected components via a recursive CTE — the Spark side's iterative
# min-label fixpoint is checked against an exact transitive closure.
ORACLE_EMB_DEDUP = f"""
WITH RECURSIVE {_IVF_ASSIGN_CTES},
au AS (
  SELECT vec_id, cell,
         list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS u
  FROM assign
),
vp AS (
  SELECT a.vec_id AS u, b.vec_id AS v
  FROM au a JOIN au b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.u, b.u) >= {EMB_DUP_THRESHOLD}
),
edges AS (
  SELECT u, v FROM vp
  UNION
  SELECT v AS u, u AS v FROM vp
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e2.v FROM reach r JOIN edges e2 ON r.v = e2.u
)
SELECT emb.vec_id,
       least(emb.vec_id, coalesce(m.mv, emb.vec_id)) AS cluster_rep
FROM embeddings emb
LEFT JOIN (SELECT u, min(v) AS mv FROM reach GROUP BY u) m ON emb.vec_id = m.u
"""


def vector_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise mean embedding per label — the k-means E-step /
    centroid-refresh building block behind a production IVF quantizer.

    posexplode flattens (vector, dim) pairs; the mean is one partial-
    aggregating shuffle on (label, dim) — dimension count scales the row
    volume linearly, never the shuffle count."""
    emb = t(spark, sf_dir, "embeddings").select(
        "label", as_double("embedding").alias("v")
    )
    return (
        emb.select("label", F.posexplode("v").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg((F.round(F.avg("x"), 6) + F.lit(0.0)).alias("centroid"))
    )


ORACLE_LABEL_CENTROIDS = """
WITH e AS (
  SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
flat AS (
  SELECT label, CAST(u.i - 1 AS INT) AS dim, v[u.i] AS x
  FROM e, unnest(generate_series(1, len(v))) AS u(i)
)
SELECT label, dim, round(avg(x), 6) + 0.0 AS centroid
FROM flat
GROUP BY label, dim
"""


QUERIES = {
    "vector_cosine_topk": vector_cosine_topk,
    "vector_ann_ivf_bucketed": vector_ann_ivf_bucketed,
    "dedup_embedding_cosine": dedup_embedding_cosine,
    "vector_label_centroids": vector_label_centroids,
}

ORACLE = {
    "vector_cosine_topk": ORACLE_COSINE_TOPK,
    "vector_ann_ivf_bucketed": ORACLE_ANN_IVF,
    "dedup_embedding_cosine": ORACLE_EMB_DEDUP,
    "vector_label_centroids": ORACLE_LABEL_CENTROIDS,
}
