"""One-shot DuckDB twin timings for the sf1 bench artifact (round-13
verdict item 6).

The regular bench interleaves warm + best-of-3 twins per query — the
right protocol at sf0.1 where everything is sub-second. At the 10x
fixture single twin executions of the heavy self-join/recursive
oracles exceed 20 minutes (observed: join_range_binned's twin alone
>20 min at 94% of one core and 65 GB RSS), so this script times each
twin ONCE in a fresh subprocess with a hard wall timeout; a timeout
is recorded as null + a note (and is itself the data point: Spark
holds the query at seconds while the oracle engine cannot).

Usage: python tools/duck_sf1_once.py /tmp/sf1-amp [timeout_sec] > out.json
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import queue
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

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
    "q5_regional_revenue",
    "join_range_binned",
    "dedup_neardup_clusters",
    "corpus_curation",
    "dedup_embedding_cosine",
]


def _run_one(sf_dir: str, name: str, q):
    import __spark_entry__ as E
    from duckbench import duck_connect

    sql = E.oracle_sql().get(name)
    if sql is None:
        q.put(None)
        return
    con = duck_connect(sf_dir)
    t0 = time.perf_counter()
    con.execute(sql).fetchall()
    q.put(round(time.perf_counter() - t0, 3))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1-amp"
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    out: dict[str, float | None] = {}
    notes: dict[str, str] = {}
    for name in HEADLINE:
        q: mp.Queue = mp.Queue()
        p = mp.Process(target=_run_one, args=(sf_dir, name, q))
        t0 = time.perf_counter()
        p.start()
        p.join(budget)
        if p.is_alive():
            p.terminate()
            p.join()
            out[name] = None
            notes[name] = f"timeout>{budget}s"
            print(f"  duckdb {name}: TIMEOUT >{budget}s", file=sys.stderr)
            continue
        # q.get with a timeout, not q.empty() polling: after join()
        # the child's queue feeder thread may still be flushing the
        # pipe, and a transient empty() would mislabel a timed run
        # as failed (round-13 ADVICE)
        try:
            val = q.get(timeout=5)
        except queue.Empty:
            val = None
        out[name] = val
        if val is None:
            notes[name] = "failed"
        print(f"  duckdb {name}: {val}s "
              f"(wall {round(time.perf_counter()-t0,1)}s)", file=sys.stderr)
    print(json.dumps({"queries": out, "notes": notes,
                      "protocol": "single run, fresh process, "
                                  f"{budget}s hard timeout"}))


if __name__ == "__main__":
    main()
