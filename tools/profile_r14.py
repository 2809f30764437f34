"""Round-14 optimization profiler: time ANY subset of the declared
inventory at a given SF with the bench methodology (warm pass + best-of-N
noop materialization, GC settle between queries, labeled jobs).

The bench's 16 headliners cover the families, but the optimization round
must examine EVERY query path — this tool produces the full-inventory
timing table that picks the targets.

Usage:
    python tools/profile_r14.py                       # all queries, sf0.1
    python tools/profile_r14.py -q a,b,c              # subset
    python tools/profile_r14.py --sf /root/testdata/sf0.01
    python tools/profile_r14.py --runs 3 --out /tmp/profile.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spotify_etl_aws_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("-q", "--queries", default=None)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import re

    m = re.search(r"sf([0-9.]+)", args.sf)
    sf = float(m.group(1)) if m else None
    small = sf is not None and sf <= 0.5
    spark = get_spark(
        app_name="profile_r14",
        shuffle_partitions=8 if small else None,
        extra_conf=({"spark.sql.adaptive.enabled": "false"} if small else None),
    )
    spark.sparkContext.setLogLevel("ERROR")

    from spotify_etl_aws_spark.queries import all_queries

    queries = all_queries()
    names = args.queries.split(",") if args.queries else list(queries)

    timings: dict[str, float | None] = {}
    for name in names:
        fn = queries[name]
        sc = spark.sparkContext
        try:
            sc.setJobDescription(f"warm:{name}")
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            sc._jvm.System.gc()
            best = float("inf")
            for r in range(args.runs):
                sc.setJobDescription(f"timed:{name}:{r}")
                t0 = time.perf_counter()
                fn(spark, args.sf).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
            print(f"  {name}: {timings[name]}s", file=sys.stderr, flush=True)
        except Exception as exc:
            timings[name] = None
            print(f"  {name}: FAILED {exc}", file=sys.stderr, flush=True)
        finally:
            sc.setJobDescription(None)
        sc._jvm.System.gc()

    ranked = dict(
        sorted(timings.items(), key=lambda kv: -(kv[1] or 0.0))
    )
    out = {
        "sf": sf,
        "runs": args.runs,
        "total_sec": round(sum(v for v in timings.values() if v), 3),
        "queries": ranked,
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
