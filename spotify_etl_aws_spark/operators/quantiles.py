"""Mergeable deterministic quantile summaries — the missing rung of
the sketch ladder (MG heavy hitters / count-min / HLL / Bloom cover
frequency, membership and cardinality; this covers rank statistics —
the p50/p95/p99 every pipeline SLO and length-filter threshold
needs at 100 TB without a global sort).

Per partition: sort the partition's values (one in-memory sort of a
~128 MB task, the same budget any shuffle spill uses) and keep every
k-th element, k = ceil(n_p / samples); each kept element's weight is
the number of elements it closes over, so the summary's cumulative
weight at a kept element is that element's EXACT within-partition
rank. Summaries are tiny ((<= samples + 1) rows per partition),
mergeable by concatenation, and persistable — the HLL-sketch posture.

DETERMINISTIC worst-case bound (no failure probability, unlike CM):
between kept elements a rank is known within k_p - 1, so for the
merged summary

    |true_rank(v) - summary_rank(v)| <= B = sum_p (k_p - 1)

and the quantile estimate (first kept element whose merged cumulative
weight reaches target = ceil(q * n)) satisfies the duplicate-safe
two-sided contract

    count(x <= est) >= target        (est is not too small)
    count(x <  est) <  target + B    (est is not too large)

— stated on the rank INTERVAL of the estimate because with heavy
duplicates count(x <= est) legitimately includes every tie.

The estimate itself depends on the physical partitioning (which
elements are k-th), so lanes emit the CONTRACT (bounds checked
against exact pass-through counts), not the estimate — the
stats_countmin_contract pattern, with a deterministic guarantee.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantile_summary(
    df: DataFrame, value_col: str, samples: int = 256
) -> DataFrame:
    """(pid, value, weight): the per-partition mergeable summary.
    ``sum(weight)`` equals the number of non-null input rows exactly
    (and cumulative weight at a kept element is its exact
    within-partition rank);
    the per-partition max is always kept (so the global max is
    recoverable). NULLs are excluded (rank statistics over values)."""
    if samples < 1:
        raise ValueError(f"samples must be >= 1, got {samples}")
    vtype = dict(df.dtypes)[value_col]
    schema = f"pid int, value {vtype}, weight long"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vals = []
        pid = None
        for pdf in batches:
            if len(pdf):
                if pid is None:
                    pid = int(pdf["__pid"].iloc[0])
                v = pdf[value_col]
                vals.append(v[v.notna()])
        if not vals:
            return
        import numpy as np

        v = np.sort(pd.concat(vals).to_numpy())
        n_p = len(v)
        if not n_p:
            return
        k = -(-n_p // samples)  # ceil
        pos = list(range(k - 1, n_p, k))
        if pos[-1] != n_p - 1:
            pos.append(n_p - 1)
        prev = -1
        out_v, out_w = [], []
        for j in pos:
            out_v.append(v[j])
            out_w.append(j - prev)
            prev = j
        yield pd.DataFrame(
            {"pid": pid, "value": out_v, "weight": out_w}
        )

    return (
        df.select(value_col)
        .withColumn("__pid", F.spark_partition_id())
        .mapInPandas(gen, schema)
    )


def summary_bounds(rows) -> tuple[int, int]:
    """(B, max_k) from collected summary rows: B = sum over
    partitions of (k_p - 1), k_p = the partition's largest weight."""
    per_pid: dict[int, int] = {}
    for r in rows:
        per_pid[r["pid"]] = max(per_pid.get(r["pid"], 1), int(r["weight"]))
    b = sum(k - 1 for k in per_pid.values())
    return b, (max(per_pid.values()) if per_pid else 1)


def estimate_quantiles(
    rows, qs: Sequence[float]
) -> tuple[dict[float, object], int]:
    """Merge collected summary rows (bounded driver state: partitions
    x samples) and return ({q: estimate}, n). The estimate for q is
    the first kept element whose merged cumulative weight reaches
    ceil(q * n) — see the module docstring for the two-sided
    duplicate-safe rank contract."""
    srt = sorted(rows, key=lambda r: r["value"])
    n = sum(int(r["weight"]) for r in srt)
    if not n:
        raise ValueError("empty summary")
    import math

    out: dict[float, object] = {}
    for q in qs:
        if not 0 < q <= 1:
            raise ValueError(f"quantile must be in (0, 1], got {q}")
        target = max(1, math.ceil(q * n))
        cum = 0
        for r in srt:
            cum += int(r["weight"])
            if cum >= target:
                out[q] = r["value"]
                break
    return out, n
