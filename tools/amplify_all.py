"""Amplify a whole testdata SF dir R times with FK-consistent key
shifts — the "business grew 10x" dataset for full-inventory scale
probes.

Every table is replicated R times; each replica r shifts every key
column by r * keyspace_size(its domain), so foreign keys keep matching
their shifted parents and per-entity distributions (events per user,
lineitems per order) keep their shape. Fixed reference dims
(region/nation) are NOT amplified — their keys are never shifted, like
a real lake where the country list doesn't grow with the fact data.

    python tools/amplify_all.py /root/testdata/sf0.1 /tmp/sf1-amp 10 32

writes ~sf1 data as 32-part-file tables, so the result doubles as a
cluster-like-layout fixture. Both engines can then run the full
inventory on it:

    SPARK_GRAFT_SF_DIR=/tmp/sf1-amp python bench.py
    SPARK_GRAFT_SF_DIR=/tmp/sf1-amp python tools/duckbench.py
    python tools/sweep.py /tmp/sf1-amp        # cross-engine correctness
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key column -> the table whose row count defines its keyspace stride.
# (events.user_id has its own synthetic domain; its stride is the
# distinct-user count so replicas get disjoint user populations.)
KEY_DOMAINS: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "@events_users"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
FIXED_DIMS = ["region", "nation"]
AMPLIFIED = list(KEY_DOMAINS)


def amplify_all(src_dir: str, out_dir: str, reps: int, n_files: int) -> None:
    tables = {
        t: pq.read_table(os.path.join(src_dir, f"{t}.parquet"))
        for t in FIXED_DIMS + AMPLIFIED
    }
    strides = {t: tables[t].num_rows for t in AMPLIFIED}
    strides["@events_users"] = pc.count_distinct(
        tables["events"].column("user_id")
    ).as_py()

    # replica key shifts are collision-free only if every key column is
    # dense in [0, stride): on a sparse-key fixture (TPC-H-style sparse
    # orderkeys) replicas would silently overlap. Fail loudly instead.
    for t in AMPLIFIED:
        for col, domain in KEY_DOMAINS[t].items():
            mx = pc.max(tables[t].column(col)).as_py()
            if mx is not None and mx >= strides[domain]:
                raise SystemExit(
                    f"{t}.{col}: max key {mx} >= stride {strides[domain]} "
                    f"({domain}) — sparse key space, amplification would "
                    f"collide replica keys"
                )

    for t in FIXED_DIMS:
        dst = os.path.join(out_dir, f"{t}.parquet")
        os.makedirs(dst, exist_ok=True)
        pq.write_table(tables[t], os.path.join(dst, "part-00000.parquet"))
        print(f"{t}: fixed dim, {tables[t].num_rows} rows", flush=True)

    for t in AMPLIFIED:
        src = tables[t]
        chunks = []
        for r in range(reps):
            rep = src
            for col, domain in KEY_DOMAINS[t].items():
                idx = rep.schema.get_field_index(col)
                shifted = pc.add(rep.column(col), r * strides[domain])
                rep = rep.set_column(
                    idx, rep.schema.field(idx), shifted.cast(rep.schema.field(idx).type)
                )
            chunks.append(rep)
        big = pa.concat_tables(chunks)
        dst = os.path.join(out_dir, f"{t}.parquet")
        os.makedirs(dst, exist_ok=True)
        n = big.num_rows
        parts = 1 if n < 10_000 else n_files
        step = -(-n // parts)
        for i in range(parts):
            chunk = big.slice(i * step, step)
            if chunk.num_rows == 0:
                break
            pq.write_table(chunk, os.path.join(dst, f"part-{i:05d}.parquet"))
        print(f"{t}: {src.num_rows} -> {n} rows, {parts} file(s)", flush=True)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1-amp"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    n_files = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    amplify_all(src, out, reps, n_files)


if __name__ == "__main__":
    main()
