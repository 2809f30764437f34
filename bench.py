"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].

Prints exactly ONE JSON line to stdout:
    {"metric": "bench_total_sec", "value": N, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1}

Each query is forced end-to-end with a noop-format write (full
materialization on the executors, nothing collected to the driver), so
the timing covers scan -> shuffle -> sink exactly as a cluster run
would. The headline set spans every operator family: joins/aggs,
windows, as-of, sessionization, near-dedup (MinHash-LSH), text scoring,
vector top-k, the Arrow UDF lane, and multimodal decode.

Each query runs RUNS times and reports the fastest (warm) run:
whole-stage-codegen compiles per distinct plan on first execution, and
that one-time JIT cost — amortized to nothing over a real workload —
would otherwise dominate sub-second queries at this scale factor.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from spotify_etl_aws_spark.session import get_spark

HEADLINE = [
    "flagship_revenue",
    "fact_order_lineitems",
    "q1_pricing_summary",
    "window_rank_topk",
    "join_asof",
    "sessionize_events",
    "dedup_minhash_lsh_pairs",
    "text_quality_score",
    "vector_cosine_topk",
    "udf_group_zscore",
    "multimodal_images",
    # inventory tail: the heavy composite/iterative queries whose
    # regressions matter most (q5 join tree, binned self-join, iterative
    # connected components, end-to-end curation)
    "q5_regional_revenue",
    "join_range_binned",
    "dedup_neardup_clusters",
    "corpus_curation",
    "dedup_embedding_cosine",
]

RUNS = 3

# The three floor-bound tiny-result aggregates (see BASELINE.md): their
# sf0.1 time IS Spark's per-job dispatch floor (~0.3 s), which is paid
# serially in the default mode. The amortized mode measures the
# realistic cluster posture instead: a session keeps many queries in
# flight, dispatch overlaps, and the effective per-query cost is
# throughput-bound, not floor-bound.
FLOOR_BOUND = ["flagship_revenue", "q1_pricing_summary", "q5_regional_revenue"]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_amortized(spark, queries, sf_dir: str, repeats: int = 8, threads: int = 8):
    """One-session-many-queries: submit ``repeats`` copies of each
    floor-bound query onto a thread pool (Spark schedules concurrent
    jobs from separate submitter threads), measure ONE wall interval,
    and report effective seconds per query run. This is the number a
    1000-executor cluster session actually experiences for small
    aggregates — the 0.3 s dispatch floor is per-job and overlappable,
    not per-byte."""
    from concurrent.futures import ThreadPoolExecutor

    work = [name for name in FLOOR_BOUND for _ in range(repeats)]
    # warm once per distinct plan outside the timer
    for name in FLOOR_BOUND:
        materialize(queries[name](spark, sf_dir))
    spark.sparkContext._jvm.System.gc()
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=threads) as pool:
        list(pool.map(lambda n: materialize(queries[n](spark, sf_dir)), work))
    wall = time.perf_counter() - t0
    return {
        "metric": "bench_amortized_sec",
        "value": round(wall, 3),
        "unit": "sec",
        "queries": {
            name: round(wall / len(work), 3) for name in FLOOR_BOUND
        },
        "runs_total": len(work),
        "effective_sec_per_query": round(wall / len(work), 3),
        "threads": threads,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mode = os.environ.get("SPARK_GRAFT_BENCH_MODE", "")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # Bench-session tuning (measured, see BASELINE.md): at sf<=0.5 in
    # one JVM every input is a single parquet row group, so AQE has
    # nothing to re-plan — its per-stage re-optimization barrier just
    # adds ~50-100 ms to every sub-second query — and 32-way shuffles
    # cost more in task dispatch than they buy in parallelism. The
    # bench pins static plans with shuffles sized to the fixture. At
    # AMPLIFIED scale (sf>0.5: tools/amplify_all.py fixtures) that
    # pinning is exactly wrong — shuffles carry tens of millions of
    # rows — so the session reverts to the cluster posture (AQE on,
    # shuffle=cores), the same confs session.py defaults to.
    small = sf is not None and sf <= 0.5
    spark = get_spark(
        app_name="bench",
        shuffle_partitions=8 if small else None,
        extra_conf=(
            {"spark.sql.adaptive.enabled": "false"} if small else None
        ),
    )
    spark.sparkContext.setLogLevel("ERROR")

    from spotify_etl_aws_spark.queries import all_queries

    queries = all_queries()

    if mode == "amortized":
        out = run_amortized(spark, queries, sf_dir)
        out["sf"] = sf
        print(json.dumps(out))
        return

    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    headline = only.split(",") if only else HEADLINE

    # Same-session DuckDB denominator, INTERLEAVED per query (round-10
    # verdict item 2): with the old phase order (all Spark timings,
    # then all DuckDB timings) a host-noise burst lands on ONE engine's
    # whole phase and moves the ratio without any code change —
    # measured on an idle-protocol pair this round: two back-to-back
    # identical runs spanned 0.77x..1.06x purely from outside-VM load.
    # Timing each query's twin in the same few seconds as its Spark run
    # makes the ratio a paired statistic. SPARK_GRAFT_BENCH_DUCK=0
    # skips the twin entirely.
    duck_con = None
    duck: dict[str, float | None] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_DUCK", "1") != "0":
        try:
            sys.path.insert(
                0,
                os.path.join(
                    os.path.dirname(os.path.abspath(__file__)), "tools"
                ),
            )
            import __spark_entry__ as E
            from duckbench import duck_connect, duck_time_one

            duck_oracles = E.oracle_sql()
            duck_con = duck_connect(sf_dir)
        except Exception as exc:  # denominator is advisory, never fatal
            print(f"  duckdb twin unavailable: {exc}", file=sys.stderr)
            duck_con = None

    # Warm pass: run every headline query once outside timing. Whole-
    # stage codegen JIT-compiles per distinct plan (the iterative CC
    # query alone generates ~10 distinct stage plans) and the first
    # execution pays 5-10x; a real workload amortizes that to nothing,
    # so timed runs measure steady state.
    for name in headline:
        try:
            materialize(queries[name](spark, sf_dir))
        except Exception:
            pass  # the timed loop below reports the failure
    # settle: collect the warm pass's garbage so the first timed queries
    # don't absorb its GC pauses
    spark.sparkContext._jvm.System.gc()

    timings: dict[str, float] = {}
    failed = 0
    for name in headline:
        best = float("inf")
        try:
            for _ in range(RUNS):
                t0 = time.perf_counter()
                materialize(queries[name](spark, sf_dir))
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
        except Exception as exc:  # one broken query must not zero the bench
            print(f"  {name}: FAILED {exc}", file=sys.stderr)
            timings[name] = None
            failed += 1
            continue
        print(f"  {name}: {timings[name]}s", file=sys.stderr)
        if duck_con is not None:
            sql = duck_oracles.get(name)
            try:
                duck[name] = (
                    duck_time_one(duck_con, sql, RUNS)
                    if sql is not None
                    else None
                )
            except Exception as exc:
                print(f"  duckdb {name}: FAILED {exc}", file=sys.stderr)
                duck[name] = None
            if duck[name] is not None:
                print(f"  duckdb {name}: {duck[name]}s", file=sys.stderr)
        # settle between queries (off the timer): collect this query's
        # garbage so a heavy query's GC debt isn't billed to the next
        # one — round-3's +25-30% swings on mid-list queries tracked
        # bench-session pressure, not plan changes
        spark.sparkContext._jvm.System.gc()
    if duck_con is not None:
        duck_con.close()

    # A failed query would silently shrink the total and make the round
    # look faster than the last one — publish the failure count and void
    # the headline total so rounds are only compared like-for-like.
    total = (
        None
        if failed
        else round(sum(v for v in timings.values() if v is not None), 3)
    )
    out = {
        "metric": "bench_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "failed": failed,
        "sf": sf,
        "runs_per_query": RUNS,
    }

    # Denominator summary (the per-query twins were measured
    # INTERLEAVED above — same box, same minute, same noise as each
    # Spark timing; round-5 lesson now applied per query, not per run).
    if duck_con is not None:
        paired = [
            (timings[n], duck[n])
            for n in headline
            if timings.get(n) is not None and duck.get(n) is not None
        ]
        duck_total = round(sum(d for _, d in paired), 3)
        spark_paired = round(sum(s for s, _ in paired), 3)
        out["duckdb"] = {
            "queries": duck,
            "total_sec": duck_total,
            "paired_spark_sec": spark_paired,
            "protocol": "interleaved",
        }
        out["vs_duckdb_ratio"] = (
            round(spark_paired / duck_total, 3) if duck_total else None
        )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
