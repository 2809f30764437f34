"""Scale probe for the Fellegi-Sunter linkage lane
(`operators/linkage.py`): candidate-census and wall at 1x/10x/30x
master sizes, Spark vs the DuckDB twin running the identical blocking
+ scoring SQL (counts asserted equal in-run).

What the probe answers:

1. **Does blocking keep candidates linear?** Each pass is an equi-join
   whose candidate mass is sum-of-bucket-squared. The name-suffix pass
   keys on 10^4 suffixes and the phone pass on ~25 * 10^3 prefixes, so
   bucket sizes grow linearly with replicas (amplified corpora REUSE
   names) — the probe prints candidates/master-row so the quadratic
   creep of replica families is visible, mirroring the edit-distance
   lane's replica analysis.
2. **Where does Spark overtake the single box?** Scoring is map-side
   expression arithmetic on candidates; the crossover tracks candidate
   volume like every candidate-generation lane in BASELINE.md.

`python experiments/linkage_scale.py skew` runs the planted
mega-block probe instead (round-9 verdict item 1): one blocking key
holding 10^4 masters x 10^3 probes (10^7 candidate pairs in ONE
reduce task — the shape AQE cannot split, same structural argument as
experiments/editdist_skew.py) through `fs_link` uncapped vs
`max_block_pairs`-capped. Prints the blocking-join partition balance
and end-to-end walls, and asserts the valve's EXACT contract in-run:
capped output == uncapped output minus the pairs whose only
generating block is the hot one (complementary phone-pass rescues
survive, scores unchanged).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"

LINK_SQL_TEMPLATE = None  # filled from the lane's oracle at runtime


def duck_run(con, sql):
    t0 = time.time()
    n = con.execute(f"SELECT count(*) FROM ({sql})").fetchone()[0]
    return time.time() - t0, n


def main():
    from pyspark.sql import SparkSession

    from spotify_etl_aws_spark.queries.selection import (
        ORACLE_FS_LINK,
        link_customer_records,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .appName("linkage-scale")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import os

    src = pq.read_table(os.path.join(SF_DIR, "customer.parquet"))
    n0 = src.num_rows
    for reps in (1, 10, 30):
        # replicate with shifted custkeys (names/balances reused — the
        # duplicate-master regime the 10x sweep already exercises)
        chunks = []
        for r in range(reps):
            chunks.append(
                src.set_column(
                    src.schema.get_field_index("c_custkey"),
                    "c_custkey",
                    pc.add(src.column("c_custkey"), r * n0),
                )
            )
        amp = pa.concat_tables(chunks)
        path = f"/tmp/linkage_amp_{reps}"
        pq.write_table(amp, f"{path}.parquet")
        os.makedirs(path, exist_ok=True)
        pq.write_table(amp, f"{path}/customer.parquet")

        t0 = time.time()
        sdf = link_customer_records(spark, path)
        sn = sdf.count()
        sw = time.time() - t0

        con = duckdb.connect()
        con.execute("SET threads TO 32")
        con.execute(
            f"CREATE VIEW customer AS SELECT * FROM '{path}/customer.parquet'"
        )
        dw, dn = duck_run(con, ORACLE_FS_LINK)
        assert sn == dn, f"ENGINE DISAGREEMENT reps={reps}: {sn} vs {dn}"
        rows = n0 * reps
        print(
            f"reps={reps:>2} masters={rows:>7} matches={sn:>9} "
            f"({sn / rows:.1f}/probe) spark={sw:6.2f}s duck={dw:6.2f}s "
            f"ratio={sw / dw:4.2f}x",
            flush=True,
        )

    spark.stop()


def skew_probe(h_m: int = 10_000, h_p: int = 1_000) -> None:
    import statistics

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from spotify_etl_aws_spark.operators.linkage import (
        Comparator,
        block_census,
        fs_link,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .appName("linkage-skew")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # 100 TB shape: neither side broadcastable (a broadcast join would
    # smear the hot block over the probe side's layout by accident)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    u_m, u_p = 200_000, 20_000
    # masters: h_m rows in block 'HOT', u_m cold rows over 20k keys
    master = spark.range(h_m + u_m).select(
        F.col("id").alias("mid"),
        F.when(F.col("id") < h_m, F.lit("HOT"))
        .otherwise(F.concat(F.lit("blk"), (F.col("id") % 20_000).cast("string")))
        .alias("blk"),
        F.concat(F.lit("nm"), (F.col("id") % 50_000).cast("string")).alias("name"),
        F.concat(F.lit("ph"), F.col("id").cast("string")).alias("phone"),
    ).repartition(32)
    # probes: h_p hot (every 5th shares a hot master's phone — the
    # complementary-pass rescue), u_p cold with matching names
    probe = spark.range(h_p + u_p).select(
        F.col("id").alias("pid"),
        F.when(F.col("id") < h_p, F.lit("HOT"))
        .otherwise(F.concat(F.lit("blk"), (F.col("id") % 20_000).cast("string")))
        .alias("blk"),
        F.concat(F.lit("nm"), ((F.col("id") * 7) % 50_000).cast("string")).alias("name"),
        F.when(
            (F.col("id") < h_p) & (F.col("id") % 5 == 0),
            F.concat(F.lit("ph"), (F.col("id") * 3).cast("string")),
        )
        .otherwise(F.concat(F.lit("phx"), F.col("id").cast("string")))
        .alias("phone"),
    ).repartition(32)
    master.write.mode("overwrite").parquet("/tmp/linkage_skew_m")
    probe.write.mode("overwrite").parquet("/tmp/linkage_skew_p")
    master = spark.read.parquet("/tmp/linkage_skew_m")
    probe = spark.read.parquet("/tmp/linkage_skew_p")

    blocking = [
        (F.col("p_blk"), F.col("m_blk")),
        (F.col("p_phone"), F.col("m_phone")),
    ]
    comparators = [
        Comparator(
            "name", F.levenshtein(F.col("p_name"), F.col("m_name")) <= 1, 40, -25
        ),
        Comparator("phone", F.col("p_phone") == F.col("m_phone"), 30, -15),
    ]
    kw = dict(blocking=blocking, comparators=comparators, threshold=10)
    cap = 1_000_000  # HOT: 10^7 pairs; largest cold block ~ 10*2 = 20

    top = block_census(probe, master, "pid", "mid", blocking).limit(3).collect()
    print("census top blocks:", [(r.pass_idx, r.block_key, r.pairs) for r in top],
          flush=True)

    # blocking-join partition balance, capped vs not (AQE coalescing
    # off so partition ids reflect the raw shuffle distribution)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    p_keyed = probe.select(F.col("pid"), F.col("blk").alias("__bk"))
    m_keyed = master.select(F.col("mid"), F.col("blk").alias("__bk"))
    for name, pk in (
        ("uncapped", p_keyed),
        ("capped", p_keyed.join(
            F.broadcast(
                p_keyed.groupBy("__bk").count().withColumnRenamed("count", "np")
                .join(m_keyed.groupBy("__bk").count()
                      .withColumnRenamed("count", "nm"), "__bk")
                .filter(F.col("np") * F.col("nm") > cap).select("__bk")
            ),
            "__bk", "left_anti",
        )),
    ):
        cs = sorted(
            r["count"]
            for r in pk.join(m_keyed, "__bk")
            .groupBy(F.spark_partition_id())
            .count()
            .collect()
        )
        med = statistics.median(cs) if cs else 0
        print(
            f"block-join balance {name:9s}: partitions={len(cs)} "
            f"median={med:,.0f} max={cs[-1]:,} ratio={cs[-1] / max(med, 1):,.1f}x",
            flush=True,
        )
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")

    t0 = time.time()
    full = fs_link(probe, master, "pid", "mid", **kw).cache()
    n_full = full.count()
    w_full = time.time() - t0
    print(f"end-to-end uncapped: pairs={n_full:,} wall={w_full:,.1f}s", flush=True)

    t0 = time.time()
    capped = fs_link(probe, master, "pid", "mid", max_block_pairs=cap, **kw).cache()
    n_cap = capped.count()
    w_cap = time.time() - t0
    print(f"end-to-end capped:   pairs={n_cap:,} wall={w_cap:,.1f}s", flush=True)

    # EXACT contract: capped == uncapped minus hot-only pairs (a pair
    # survives iff phone agrees — pass 2 — or its block key is cold)
    hot_pids = h_p
    expected = full.filter(
        F.col("phone_agree") | (F.col("pid") >= hot_pids)
    )
    assert capped.exceptAll(expected).count() == 0
    assert expected.exceptAll(capped).count() == 0
    rescued = capped.filter(F.col("pid") < hot_pids).count()
    print(
        f"identity holds: capped == uncapped - hot-only "
        f"(dropped={n_full - n_cap:,}, hot rescues kept={rescued:,})",
        flush=True,
    )
    spark.stop()


def jw_kernel_probe():
    """Batch-vs-scalar Jaro-Winkler kernel wall (round-10 verdict item
    6): the length-bucketed numpy batch path against the per-pair
    scalar reference on 2M blocked-candidate-shaped name pairs, with
    bit-equality asserted in-run. The scalar kernel is what the
    link_customer_jw lane shipped through round 10; the batch kernel
    is the round-11 production column path."""
    import random
    import time as _t

    import numpy as np

    from spotify_etl_aws_spark.operators.strsim import (
        jaro_winkler,
        jaro_winkler_batch,
    )

    rng = random.Random(11)
    names = [
        "Customer#%09d" % rng.randrange(10**9) for _ in range(200_000)
    ]
    xs, ys = [], []
    for _ in range(2_000_000):
        a = names[rng.randrange(len(names))]
        b = list(a)
        for _k in range(rng.randrange(0, 3)):  # 0-2 char corruptions
            b[rng.randrange(len(b))] = rng.choice("abcdefgh")
        xs.append(a)
        ys.append("".join(b))

    t0 = _t.time()
    got_b = jaro_winkler_batch(xs, ys)
    w_batch = _t.time() - t0
    print(f"batch kernel : {len(xs):,} pairs in {w_batch:,.2f}s "
          f"({len(xs) / w_batch:,.0f} pairs/s)", flush=True)

    t0 = _t.time()
    got_s = np.array([jaro_winkler(a, b) for a, b in zip(xs, ys)])
    w_scalar = _t.time() - t0
    print(f"scalar kernel: {len(xs):,} pairs in {w_scalar:,.2f}s "
          f"({len(xs) / w_scalar:,.0f} pairs/s)", flush=True)

    assert (got_b == got_s).all()  # bit-equal, asserted in-run
    print(f"bit-equal on all {len(xs):,} pairs; "
          f"speedup = {w_scalar / w_batch:,.1f}x", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "skew":
        skew_probe()
    elif len(sys.argv) > 1 and sys.argv[1] == "jw":
        jw_kernel_probe()
    else:
        main()
