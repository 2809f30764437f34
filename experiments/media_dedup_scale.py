"""Scale probe for the media-dedup lanes (`operators/phash.py`,
`operators/audio_fp.py`): Spark vs the DuckDB banded twin at
1x/10x/30x document counts, plus the two 100 TB knobs measured head
to head:

1. **Band-width trade.** A 56-bit hash split into 8x7-bit bands
   guarantees recall at Hamming d <= 7 but buckets collapse to only
   128 values, so cross-family candidates grow ~N^2 * bands / 2^width.
   The same operator with 4x14-bit bands (d <= 3 pigeonhole — still
   covering this corpus, whose near-dups sit at <= 4... so we probe
   BOTH d=3/4-band and d=4/8-band postures) cuts bucket collision
   mass by ~2^7: the probe prints candidate-pair counts and walls for
   both configurations so the knob's cost model is measured, not
   asserted.
2. **Wide hash.** Past the 56-bit breaking point the answer is more
   bits, not more bands: the 240-bit variant (16x16 grid, 4x60-bit
   words, 8x30-bit bands + r=1 probe, d <= 15) keeps candidate mass
   equal to TRUE duplicate mass (2^30 buckets — zero background
   collisions), measured to 500k docs on both engines.
3. **Skew valve.** `max_band_bucket` drops oversized buckets from
   candidate generation only (recall valve, never precision). The
   probe plants 2,000 all-identical images (one mega-family: every
   band bucket holds all 2,000) inside the corpus and shows the capped
   run's wall vs the uncapped run, and that pairs OUTSIDE the hot
   family are byte-identical.

The per-image hashing stage is embarrassingly parallel (mapInPandas
over real encoded bytes); the join stage is where scale lives, so the
probe hashes once and re-times only the join under each knob.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import numpy as np  # noqa: E402

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


M31 = 2147483648


def mix(x):
    s0 = (x + 12345) % M31
    s1 = (s0 * 1103515245 + 12345) % M31
    s2 = s1 ^ (s1 >> 16)
    s3 = (s2 * 65539 + 1013904223) % M31
    return s3 ^ (s3 >> 13)


def phash_vec(n_docs: int) -> np.ndarray:
    """Analytic dHash values for doc_ids 0..n-1 (the lane's formula,
    vectorized) — the probe times the JOIN, not the codec, so hashes
    come straight from the formula both engines agree on (the codec
    path is oracle-checked in the lane itself)."""
    doc = np.arange(n_docs, dtype=np.int64)[:, None]
    i = np.arange(64, dtype=np.int64)[None, :]
    g, m = doc // 4, doc % 4
    k = (g * 8191 + 2999) % 100003
    v = 20 + mix(k * 64 + i) % 199
    p = (k + 17 * m) % 64
    pert = (m > 0) & (i == p)
    v = np.where(pert, np.where(v < 120, v + 80, v - 80), v)
    cells = v.reshape(n_docs, 8, 8)
    bits = (cells[:, :, :-1] > cells[:, :, 1:]).astype(np.uint64)
    w = (1 << np.arange(56, dtype=np.uint64)).reshape(8, 7)
    return (bits * w).sum(axis=(1, 2)).astype(np.int64)


def spark_join(spark, hashes: np.ndarray, bands: int, d: int,
               cap: int | None = None, probe: int = 0):
    from spotify_etl_aws_spark.operators.phash import hamming_near_pairs

    df = spark.createDataFrame(
        [(int(i), int(h)) for i, h in enumerate(hashes)],
        "doc_id long, phash long",
    ).repartition(32).cache()
    df.count()
    t0 = time.time()
    out = hamming_near_pairs(
        df, max_distance=d, bands=bands, max_band_bucket=cap,
        probe_radius=probe,
    )
    n = out.count()
    wall = time.time() - t0
    df.unpersist()
    return wall, n


def duck_join(hashes: np.ndarray, bands: int, d: int, probe: int = 0):
    width = 56 // bands
    mask = (1 << width) - 1
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    import pyarrow as pa

    tbl = pa.table({"doc_id": np.arange(len(hashes), dtype=np.int64),
                    "phash": hashes})
    con.register("hashes", tbl)
    if probe == 0:
        probe_src = "SELECT doc_id, band, band_val FROM bb"
        pair_pred = "x.doc_id < y.doc_id"
        sel = "x.doc_id AS a, y.doc_id AS b"
    else:
        flips = ", ".join(str(1 << j) for j in range(width))
        probe_src = f"""
          SELECT doc_id, band, xor(band_val, f) AS band_val
          FROM bb, unnest([0, {flips}]) AS t(f)
        """
        pair_pred = "x.doc_id <> y.doc_id"
        sel = ("least(x.doc_id, y.doc_id) AS a, "
               "greatest(x.doc_id, y.doc_id) AS b")
    t0 = time.time()
    n = con.execute(f"""
        WITH bb AS (
          SELECT doc_id, phash, b.range AS band,
                 (phash >> (b.range * {width})) & {mask} AS band_val
          FROM hashes, range({bands}) b
        ),
        pr AS ({probe_src}),
        cand AS (
          SELECT DISTINCT a, b
          FROM (
            SELECT {sel}
            FROM pr x JOIN bb y
              ON x.band = y.band AND x.band_val = y.band_val
             AND {pair_pred}
          )
        )
        SELECT count(*) FROM cand
        JOIN hashes hx ON hx.doc_id = cand.a
        JOIN hashes hy ON hy.doc_id = cand.b
        WHERE bit_count(xor(hx.phash, hy.phash)) <= {d}
    """).fetchone()[0]
    return time.time() - t0, n


def wide_vec(n_docs: int) -> np.ndarray:
    """Analytic 240-bit hashes (wide-lane formula), as an (n, 4) int64
    array of 60-bit words."""
    doc = np.arange(n_docs, dtype=np.int64)[:, None]
    i = np.arange(256, dtype=np.int64)[None, :]
    g, m = doc // 4, doc % 4
    k = (g * 6991 + 5557) % 100003
    v = 20 + mix(k * 256 + i) % 199
    p = (k + 29 * m) % 256
    pert = (m > 0) & (i == p)
    v = np.where(pert, np.where(v < 120, v + 80, v - 80), v)
    cells = v.reshape(n_docs, 16, 16)
    bits = (cells[:, :, :-1] > cells[:, :, 1:]).reshape(n_docs, 240)
    out = np.zeros((n_docs, 4), dtype=np.int64)
    idx = np.arange(240)
    for w in range(4):
        sel = (idx // 60) == w
        weights = (1 << (idx[sel] % 60).astype(np.uint64))
        out[:, w] = (bits[:, sel].astype(np.uint64) * weights).sum(axis=1).astype(np.int64)
    return out


def spark_wide_join(spark, words: np.ndarray, prefilter: str | None = None):
    from spotify_etl_aws_spark.operators.phash import hamming_near_pairs_wide

    df = spark.createDataFrame(
        [(int(i), int(r[0]), int(r[1]), int(r[2]), int(r[3]))
         for i, r in enumerate(words)],
        "doc_id long, w0 long, w1 long, w2 long, w3 long",
    ).repartition(32).cache()
    df.count()
    t0 = time.time()
    n = hamming_near_pairs_wide(
        df, max_distance=15, probe_radius=1, probe_prefilter=prefilter
    ).count()
    wall = time.time() - t0
    df.unpersist()
    return wall, n


def duck_wide_join(words: np.ndarray):
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    import pyarrow as pa

    tbl = pa.table({
        "doc_id": np.arange(len(words), dtype=np.int64),
        **{f"w{k}": words[:, k] for k in range(4)},
    })
    con.register("hashes", tbl)
    flips = ", ".join(str(1 << j) for j in range(30))
    ham = " + ".join(
        f"CAST(bit_count(xor(a.w{k}, b.w{k})) AS BIGINT)" for k in range(4)
    )
    t0 = time.time()
    n = con.execute(f"""
        WITH bb AS (
          SELECT doc_id, b.range AS band,
                 (CASE b.range // 2 WHEN 0 THEN w0 WHEN 1 THEN w1
                                    WHEN 2 THEN w2 ELSE w3 END
                  >> (30 * (b.range % 2))) & 1073741823 AS band_val
          FROM hashes, range(8) b
        ),
        pr AS (
          SELECT doc_id, band, xor(band_val, f) AS band_val
          FROM bb, unnest([0, {flips}]) AS t(f)
        ),
        cand AS (
          SELECT DISTINCT least(x.doc_id, y.doc_id) AS ia,
                          greatest(x.doc_id, y.doc_id) AS ib
          FROM pr x JOIN bb y
            ON x.band = y.band AND x.band_val = y.band_val
           AND x.doc_id <> y.doc_id
        )
        SELECT count(*) FROM cand
        JOIN hashes a ON a.doc_id = cand.ia
        JOIN hashes b ON b.doc_id = cand.ib
        WHERE {ham} <= 15
    """).fetchone()[0]
    return time.time() - t0, n


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .appName("media-dedup-scale")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    print("== scenario 1: band-width trade at 1x/10x/30x (uniform corpus)", flush=True)
    for n in (5_000, 50_000, 150_000):
        hs = phash_vec(n)
        for bands, d, probe in ((8, 4, 0), (4, 3, 0), (4, 4, 1)):
            if bands == 8 and n > 50_000:
                # 8x7-bit bands at 150k: ~700M candidate pairs before
                # verify — the exact blow-up the 4x14-bit posture
                # exists to avoid; measured up to 50k, extrapolation
                # is the printed quadratic
                print(f"  n={n:>7} bands=8 d=4: skipped (candidate mass ~N^2/32; see 4-band row)", flush=True)
                continue
            sw, sn = spark_join(spark, hs, bands, d, probe=probe)
            # duck twin replays the SAME candidate scheme — and any
            # exact-recall scheme must emit identical pairs, which the
            # (8,4,0)-vs-(4,4,1) rows cross-check at matching d
            dw, dn = duck_join(hs, bands, d, probe=probe)
            assert sn == dn, f"ENGINE DISAGREEMENT n={n} bands={bands} r={probe}: {sn} vs {dn}"
            print(
                f"  n={n:>7} bands={bands} d={d} r={probe}: pairs={sn:>8} "
                f"spark={sw:6.2f}s duck={dw:6.2f}s ratio={sw/dw:5.2f}x",
                flush=True,
            )

    print("== scenario 3: 240-bit wide hash at the 56-bit breaking point", flush=True)
    # the 150k point where every 56-bit geometry has gone quadratic:
    # 30-bit buckets keep candidate mass == true-duplicate mass
    for n in (50_000, 150_000, 500_000):
        ws = wide_vec(n)
        sw, sn = spark_wide_join(spark, ws)
        dw, dn = duck_wide_join(ws)
        assert sn == dn, f"ENGINE DISAGREEMENT wide n={n}: {sn} vs {dn}"
        print(
            f"  n={n:>7} wide 8x30-bit r=1 d=15: pairs={sn:>8} "
            f"spark={sw:6.2f}s duck={dw:6.2f}s ratio={sw/dw:5.2f}x",
            flush=True,
        )

    print("== scenario 2: skew valve (2,000-replica mega-family planted)", flush=True)
    n = 50_000
    hs = phash_vec(n).copy()
    hs[:2000] = hs[0]  # one flat image family: every band collides
    results = {}
    for cap in (None, 1500):
        sw, sn = spark_join(spark, hs, 8, 4, cap=cap)
        results[cap] = sn
        print(f"  cap={str(cap):>5}: pairs={sn:>9} spark={sw:6.2f}s", flush=True)
    # contract: capped pairs = uncapped minus the hot family's pairs
    # (members 1-3 of the absorbed groups also hash identically here,
    # so the family is exactly ids 0..1999)
    hot = 2000 * 1999 // 2
    print(
        f"  hot-family arithmetic: {results[None]} - {hot} = "
        f"{results[None] - hot}, capped = {results[1500]} "
        f"({'OK' if results[None] - hot == results[1500] else 'DRIFT — read bucket census'})",
        flush=True,
    )

    spark.stop()


def widefan():
    """Round-9 verdict item 5: the wide lane's radius-1 probe fan is a
    fixed 31x row multiplier (124M rows at 500k docs) even though a
    flipped 30-bit bucket almost never exists on the index side. The
    prefilter (`probe_prefilter` on hamming_near_pairs_wide) drops
    no-partner variants BEFORE the candidate shuffle — this probe
    measures all three modes at the 150k/500k points and asserts the
    outputs identical in-run."""
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .appName("media-dedup-widefan")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in (150_000, 500_000):
        ws = wide_vec(n)
        counts = {}
        for mode in (None, "broadcast", "bloom"):
            sw, sn = spark_wide_join(spark, ws, prefilter=mode)
            counts[mode] = sn
            print(
                f"  n={n:>7} prefilter={str(mode):>9}: pairs={sn:>8} "
                f"spark={sw:6.2f}s",
                flush=True,
            )
        assert len(set(counts.values())) == 1, counts
        print(f"  n={n:>7}: all three modes emit identical pairs", flush=True)
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "widefan":
        widefan()
    else:
        main()
