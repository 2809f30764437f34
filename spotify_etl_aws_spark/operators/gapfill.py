"""Time-series gap filling (north-star §2.11 time-series lane — the
``time_bucket_gapfill`` + ``locf``/``interpolate`` family TimescaleDB
ships and plain SQL engines lack).

An aggregated series (bucket_ts, dims..., value) usually has holes:
hours where a (dim) emitted nothing produce NO row, and every
downstream consumer (charts, rate-of-change, joins against other
series) wants the DENSE grid. ``gapfill`` densifies and fills:

- **grid**: the complete per-dim bucket lattice over [start, end] —
  ``sequence()`` + ``explode`` (map-side Generate) cross-joined with
  the DISTINCT dim combinations (dim-cardinality rows, broadcast);
- **locf**: last observation carried forward. Implemented with the
  engine-portable two-window trick (a cumulative ``count(value)``
  assigns every row to the fill-group opened by the last non-null
  observation; ``first_value`` within (dims, group) recovers it) —
  no IGNORE NULLS dependency, so the DuckDB oracle can replay it
  verbatim;
- **linear**: interpolation between the bracketing observations,
  ``prev + (next − prev) · (t − t_prev)/(t_next − t_prev)`` on epoch
  seconds — exact integer time deltas, one double division. Points
  outside the observed range stay NULL (no extrapolation; locf's
  trailing carry is the deliberate difference).

Scale posture: the filled frame is series-cardinality × bucket-count
rows — the SMALL, post-aggregation side of a pipeline (the raw events
were already reduced by the upstream groupBy). Both fill methods are
window functions partitioned on the dims: ONE hash exchange of the
aggregated series, no self-joins, no per-gap probes. The grid build
never touches the fact table (distinct dims come from the aggregated
frame itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_grid(
    series: DataFrame,
    ts_col: str,
    by: list[str],
    step_seconds: int,
    start=None,
    end=None,
) -> DataFrame:
    """The dense (dims × buckets) lattice: one row per dim combination
    per bucket in [start, end] (inclusive; defaults = the series'
    global min/max bucket). ``step_seconds`` must match the upstream
    bucketing. Left-join the sparse series onto this to expose gaps
    as NULLs."""
    if step_seconds < 1:
        raise ValueError(f"step_seconds must be >= 1, got {step_seconds}")
    if start is None or end is None:
        row = series.agg(
            F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi")
        ).collect()[0]
        start = start if start is not None else row["lo"]
        end = end if end is not None else row["hi"]
    if start is None:  # empty series
        return series.select(*by, ts_col).limit(0)
    buckets = F.explode(
        F.sequence(
            F.lit(start).cast("timestamp"),
            F.lit(end).cast("timestamp"),
            F.expr(f"INTERVAL {int(step_seconds)} SECOND"),
        )
    ).alias(ts_col)
    dims = series.select(*by).distinct()
    return dims.crossJoin(series.sparkSession.range(1).select(buckets))


def gapfill(
    series: DataFrame,
    ts_col: str,
    by: list[str],
    value_col: str,
    step_seconds: int,
    method: str = "locf",
    start=None,
    end=None,
    out_col: str | None = None,
) -> DataFrame:
    """Densify ``series`` to the full time grid and fill ``value_col``
    gaps per dim group. Returns the grid columns plus ``out_col``
    (default ``value_col``): observed values verbatim, gaps filled by
    ``method`` ('locf' or 'linear'), unfillable edges NULL."""
    if method not in ("locf", "linear"):
        raise ValueError(f"method must be 'locf' or 'linear', got {method!r}")
    out_col = out_col or value_col
    grid = time_grid(series, ts_col, by, step_seconds, start, end)
    dense = grid.join(
        series.select(*by, ts_col, F.col(value_col).alias("__v")),
        [*by, ts_col],
        "left",
    )
    asc = Window.partitionBy(*by).orderBy(F.col(ts_col).asc())
    # cumulative non-null count: every row belongs to the fill group
    # opened by the last observation at or before it (group 0 = the
    # leading all-NULL prefix, which must stay NULL)
    dense = dense.withColumn("__grp", F.count("__v").over(asc))
    prev_w = Window.partitionBy(*by, "__grp").orderBy(F.col(ts_col).asc())
    prev_v = F.when(
        F.col("__grp") > 0, F.first("__v").over(prev_w)
    )
    if method == "locf":
        out = dense.withColumn(out_col, prev_v)
        return out.select(*by, ts_col, out_col)
    desc = Window.partitionBy(*by).orderBy(F.col(ts_col).desc())
    dense = dense.withColumn("__grp_n", F.count("__v").over(desc))
    next_w = Window.partitionBy(*by, "__grp_n").orderBy(F.col(ts_col).desc())
    prev_t = F.when(
        F.col("__grp") > 0, F.first(F.when(F.col("__v").isNotNull(), F.col(ts_col))).over(prev_w)
    )
    next_v = F.when(F.col("__grp_n") > 0, F.first("__v").over(next_w))
    next_t = F.when(
        F.col("__grp_n") > 0,
        F.first(F.when(F.col("__v").isNotNull(), F.col(ts_col))).over(next_w),
    )
    frac = (
        (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_t))
        / (F.unix_timestamp(next_t) - F.unix_timestamp(prev_t))
    )
    interp = prev_v + (next_v - prev_v) * frac
    out = dense.withColumn(
        out_col,
        F.when(F.col("__v").isNotNull(), F.col("__v")).otherwise(
            F.when(prev_v.isNotNull() & next_v.isNotNull(), interp)
        ),
    )
    return out.select(*by, ts_col, out_col)


def lttb_downsample(
    df,
    series_col: str,
    x_col: str,
    y_col: str,
    n_out: int,
    order_cols: list[str] | None = None,
    max_series_points: int = 50_000_000,
):
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013 —
    the visualization/observability reducer: keep ``n_out`` points per
    series preserving visual shape). First and last points are always
    kept; the middle points split into ``n_out − 2`` equal-count
    buckets, and each bucket keeps the point forming the largest
    triangle with the PREVIOUSLY selected point and the NEXT bucket's
    centroid — a sequential recurrence, so each series packs inside
    one Arrow batch (parallel ACROSS series, sequential within, the
    same distributed shape as ``pack_sequences``).

    Determinism contract: ``x_col``/``y_col`` must be integer columns
    (epoch-millis / int-cents in the declared lane); the triangle
    comparison uses the centroid-scaled cross product — pure int64
    arithmetic, no division anywhere — with ties broken on the
    smallest row number, so the selection is bit-reproducible and
    oracle-checkable (the DuckDB twin replays the recurrence as a
    recursive CTE advancing every series one bucket per level).
    Series with ≤ ``n_out`` points are excluded (nothing to reduce).

    Returns (series, rn, x, y, step): ``rn`` the 1-based position in
    the series, ``step`` the selection order (0 = first point,
    n_out − 1 = last point).

    ``max_series_points`` bounds the per-series Arrow buffer: a single
    series longer than this fails FAST with a sized error instead of
    silently buffering unbounded pandas memory in one straggler task
    (same posture as ``decontaminate.max_bench``). Pre-bucket a longer
    series (e.g. two-level LTTB: coarse epoch split, then LTTB per
    split) before calling.
    """
    import pandas as pd
    from pyspark.sql import Window

    if n_out < 3:
        raise ValueError(f"n_out must be >= 3, got {n_out}")
    # x_col/y_col are renamed to __x/__y by the select below, so order
    # refs to them must follow the rename (order_cols=None means "by x").
    rename = {x_col: "__x", y_col: "__y"}
    order = [rename.get(c, c) for c in (order_cols or [x_col])]
    prepared = (
        df.select(
            F.col(series_col).alias("__s"),
            F.col(x_col).cast("long").alias("__x"),
            F.col(y_col).cast("long").alias("__y"),
            *[F.col(c) for c in (order_cols or []) if c not in (x_col, y_col)],
        )
        .withColumn("__rn", F.row_number().over(
            Window.partitionBy("__s").orderBy(*order)))
        .withColumn("__n", F.count(F.lit(1)).over(
            Window.partitionBy("__s")))
        .filter(F.col("__n") > n_out)
        .select("__s", "__rn", "__x", "__y", "__n")
    )
    B = n_out - 2
    limit = int(max_series_points)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > limit:
            raise ValueError(
                f"lttb_downsample: series {pdf['__s'].iloc[0]!r} has "
                f"{len(pdf)} points > max_series_points={limit}; "
                "pre-bucket the series (two-level LTTB) or raise the "
                "guard explicitly"
            )
        pdf = pdf.sort_values("__rn")
        xs = [int(v) for v in pdf["__x"]]
        ys = [int(v) for v in pdf["__y"]]
        n = len(pdf)
        # middle array index i in [1, n-2] -> bucket (i-1)*B // (n-2)
        buckets: list[list[int]] = [[] for _ in range(B)]
        for i in range(1, n - 1):
            buckets[(i - 1) * B // (n - 2)].append(i)
        sel = [0]
        for b in range(B):
            if b < B - 1:
                nxt = buckets[b + 1]
            else:
                nxt = [n - 1]
            cnt = len(nxt)
            sx = sum(xs[j] for j in nxt)
            sy = sum(ys[j] for j in nxt)
            x0, y0 = xs[sel[-1]], ys[sel[-1]]
            best = None
            for i in buckets[b]:
                area2 = abs(
                    (xs[i] - x0) * (sy - cnt * y0)
                    - (sx - cnt * x0) * (ys[i] - y0)
                )
                key = (-area2, i)
                if best is None or key < best[0]:
                    best = (key, i)
            sel.append(best[1])
        sel.append(n - 1)
        s = pdf["__s"].iloc[0]
        return pd.DataFrame(
            {
                "series": [s] * len(sel),
                "rn": [i + 1 for i in sel],
                "x": [xs[i] for i in sel],
                "y": [ys[i] for i in sel],
                "step": list(range(len(sel))),
            }
        )

    return prepared.groupBy("__s").applyInPandas(
        kernel, "series bigint, rn bigint, x bigint, y bigint, step int"
    )
