"""Prometheus-style counter semantics and M4 visual downsampling.

numalogic's input IS Prometheus range data (its connector wraps
`query_range`, /root/reference/numalogic/connectors/prometheus.py) but it
consumes pre-computed gauge values and leaves counter math to PromQL on
the server. A standalone engine over raw scraped samples needs that math
itself — the counter family (`increase` / `rate` / `resets` with
counter-RESET correction) is the single most-used PromQL construct and
the canonical "you can't just sum the column" time-series trap.

Semantics (TimescaleDB `counter_agg` / InfluxDB style, documented vs
PromQL): per series ordered by time,

    delta_i   = v_i - v_{i-1}
    adjusted  = delta_i               if delta_i >= 0
              = v_i                   if delta_i <  0   (reset: counter
                                       restarted near 0, the post-reset
                                       value is the best increase bound)
    increase(bucket) = sum(adjusted over samples IN the bucket)
    resets(bucket)   = count(delta_i < 0)
    rate(bucket)     = increase / bucket_seconds

Unlike PromQL's `rate()` we do NOT extrapolate to the window edges
(PromQL's lookbehind-window extrapolation is a visual-smoothing heuristic
that makes results non-reproducible across step alignments); bucketed
adjusted-delta sums are exact, associative, and re-aggregable — the same
property the rollup tiers rely on.

M4 downsampling (Jugel et al., VLDB 2014): the error-free line-chart
reduction — per (series, pixel bucket) keep the first / last / min / max
points with their timestamps. Four struct-extremes in ONE
map-side-combinable aggregation; at 10^12 rows this is the only shuffle
(and it is a partial-agg shuffle of 4 structs per bucket, not rows).

Cross-engine exactness: deltas and sums are decimal(15,6) (2-dp inputs →
exact); struct extremes compare lexicographically identically on Spark
and DuckDB (`min(struct(v, ts, id))` ≡ `min(row(v, ts, id))`).

Scale shape:
- counter ops: one exchange + sort per series (the lag window), then a
  map-side-combinable groupBy on (series, bucket) that reuses the same
  partitioning. Per-series sort parallelism = series cardinality; the
  windows.py salted-chunk note applies (lag-1 state crosses chunk
  boundaries by exactly one row).
- m4: one partial-aggregated shuffle, no sort, no window. Output is
  4 points per (series, pixel) regardless of input density.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(15,6)"


def _bucket_start(ts_s: Column, width_s: int) -> Column:
    """Integral-second bucket start: ts - (ts % width). Both engines
    floor-divide positive ints identically."""
    return ts_s - (ts_s % F.lit(width_s))


def counter_deltas(
    df: DataFrame,
    value_col: str = "value",
    source_col: str = "source",
    order_cols: Sequence[str] = ("ts_s", "event_id"),
) -> DataFrame:
    """Per-sample reset-adjusted counter deltas.

    Adds `adjusted` (decimal increase contribution; NULL for each
    series' first sample — no preceding interval) and `is_reset`.
    One exchange + sort per series; everything downstream of the lag is
    a projection.
    """
    w = Window.partitionBy(source_col).orderBy(*order_cols)
    v = F.col(value_col).cast(_DEC)
    prev = F.lag(v).over(w)
    delta = v - prev
    return df.withColumn(
        "adjusted",
        F.when(prev.isNull(), F.lit(None).cast("decimal(16,6)"))
        .when(delta >= 0, delta.cast("decimal(16,6)"))
        .otherwise(v.cast("decimal(16,6)")),
    ).withColumn("is_reset", (prev.isNotNull() & (delta < 0)).cast("int"))


def counter_rate(
    df: DataFrame,
    bucket_s: int = 3600,
    value_col: str = "value",
    source_col: str = "source",
    ts_col: str = "ts_s",
    order_cols: Sequence[str] = ("ts_s", "event_id"),
) -> DataFrame:
    """Bucketed increase / rate / resets over a (possibly resetting)
    counter column.

    Returns (source, bucket_s, n_samples, increase, rate_per_s, resets).
    `increase` sums the reset-adjusted deltas of samples whose timestamp
    falls in the bucket (each sample's delta is attributed to ITS bucket,
    so bucket sums re-aggregate exactly to coarser tiers — the rollup
    cascade property). rate_per_s = increase / bucket_s.
    """
    d = counter_deltas(df, value_col, source_col, order_cols)
    out = (
        d.groupBy(
            F.col(source_col).alias("source"),
            _bucket_start(F.col(ts_col), bucket_s).alias("bucket_s"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.sum("adjusted").alias("increase_dec"),
            F.sum("is_reset").alias("resets"),
        )
        .select(
            "source",
            "bucket_s",
            "n_samples",
            F.coalesce(F.col("increase_dec"), F.lit(0).cast("decimal(16,6)"))
            .cast("double")
            .alias("increase"),
            _r6(
                F.coalesce(F.col("increase_dec"), F.lit(0).cast("decimal(16,6)")).cast(
                    "double"
                )
                / F.lit(float(bucket_s))
            ).alias("rate_per_s"),
            F.col("resets").cast("bigint").alias("resets"),
        )
    )
    return out


def _r6(c: Column) -> Column:
    from numalogic_spark.functions.exprs import round6

    return round6(c)


def m4_downsample(
    df: DataFrame,
    bucket_s: int = 3600,
    value_col: str = "value",
    source_col: str = "source",
    ts_col: str = "ts_s",
    id_col: str = "event_id",
) -> DataFrame:
    """M4 reduction: per (series, pixel bucket) the first/last/min/max
    points with their timestamps — the error-free line-chart downsample
    (rendering these 4 points per pixel column reproduces the exact
    pixel-perfect polyline of the full series).

    One map-side-combinable aggregation of four struct extremes; ties on
    value break deterministically by (ts, id) — min takes the earliest
    minimal point, max the latest maximal point (lexicographic struct
    order on both engines).
    """
    v, t, i = F.col(value_col), F.col(ts_col), F.col(id_col)
    by_time = F.struct(t.alias("t"), i.alias("i"), v.alias("v"))
    by_val = F.struct(v.alias("v"), t.alias("t"), i.alias("i"))
    return (
        df.groupBy(
            F.col(source_col).alias("source"),
            _bucket_start(t, bucket_s).alias("bucket_s"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(by_time).alias("first_p"),
            F.max(by_time).alias("last_p"),
            F.min(by_val).alias("min_p"),
            F.max(by_val).alias("max_p"),
        )
        .select(
            "source",
            "bucket_s",
            "n",
            F.col("first_p.t").alias("t_first"),
            F.col("first_p.v").alias("v_first"),
            F.col("last_p.t").alias("t_last"),
            F.col("last_p.v").alias("v_last"),
            F.col("min_p.t").alias("t_min"),
            F.col("min_p.v").alias("v_min"),
            F.col("max_p.t").alias("t_max"),
            F.col("max_p.v").alias("v_max"),
        )
    )


def _lttb_np(ts, vs, threshold: int):
    """LTTB point selection for one series (Steinarsson 2013), oracle-
    replayable: integer bucket split, scaled-integer bucket means, raw
    IEEE doubles in the triangle areas, first-max tie-break.

    Returns (sel_idx, ts, value) arrays of length min(threshold, n).
    """
    import numpy as np

    n = len(ts)
    ts = np.asarray(ts, dtype=np.float64)
    vs = np.asarray(vs, dtype=np.float64)
    if threshold >= n or n <= 2:
        return np.arange(n), ts, vs
    t = threshold
    # middle points rn = 1..n-2 → bucket floor((rn-1)(t-2)/(n-2)); with
    # t-2 <= n-2 every bucket is non-empty (monotone surjection), so the
    # selection never stalls
    rn = np.arange(1, n - 1)
    bk = (rn - 1) * (t - 2) // (n - 2)
    sel_i = np.empty(t, dtype=np.int64)
    sel_i[0] = 0
    sel_i[-1] = n - 1
    ax, ay = ts[0], vs[0]
    for i in range(t - 2):
        members = rn[bk == i]
        if i + 1 <= t - 3:
            nxt = rn[bk == i + 1]
            cnt = float(len(nxt))
            cx = ts[nxt].sum() / cnt
            # 2-dp values → exact integer cents: the sum is order-free
            # exact, matching the oracle's decimal-free BIGINT sum
            cy = np.rint(vs[nxt] * 100.0).sum() / 100.0 / cnt
        else:
            cx, cy = ts[n - 1], vs[n - 1]
        bx, by = ts[members], vs[members]
        areas = np.abs((ax - cx) * (by - ay) - (ax - bx) * (cy - ay))
        pick = members[int(np.argmax(areas))]  # first max, like the oracle
        sel_i[i + 1] = pick
        ax, ay = ts[pick], vs[pick]
    return np.arange(t), ts[sel_i], vs[sel_i]


def lttb_downsample(
    df: DataFrame,
    threshold: int = 20,
    value_col: str = "value",
    source_col: str = "source",
    ts_col: str = "ts_s",
    id_col: str = "event_id",
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsample to `threshold` points
    per series — the perceptual companion to `m4_downsample` (M4 is
    pixel-exact for rendering at a known width; LTTB picks the
    shape-preserving polyline at any width).

    The selection is inherently sequential (each bucket's pick depends
    on the previous pick), so it runs per series in one applyInPandas
    task over numpy — the same design point as Holt/Kalman recursions
    (windows.py salted-chunk caveat applies for few-series corpora; at
    the 100-source design point parallelism = series count). Each
    series is first reduced to (ts, value) pairs, so the task carries
    two float64 arrays per series, not rows.

    Exactness contract (the recursive-CTE oracle replays it): integer
    bucket assignment, bucket means from exact integer sums (timestamps
    are integral seconds; 2-dp values scale to integer cents), triangle
    areas as raw IEEE doubles in one fixed expression shape, ties to
    the first maximal point.
    """
    if threshold < 3:
        raise ValueError(
            f"LTTB needs threshold >= 3 (first + last + >=1 bucket), got {threshold}"
        )
    import pandas as pd

    out_schema = (
        f"{source_col} string, sel_idx bigint, {ts_col} bigint, "
        f"{value_col} double"
    )

    def fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values([ts_col, id_col], ignore_index=True)
        idx, sts, svs = _lttb_np(
            pdf[ts_col].to_numpy(), pdf[value_col].to_numpy(), threshold
        )
        return pd.DataFrame(
            {
                source_col: pdf[source_col].iloc[0],
                "sel_idx": idx,
                ts_col: sts.astype("int64"),
                value_col: svs,
            }
        )

    cols = [source_col, ts_col, id_col, value_col]
    return (
        df.select(*cols).groupBy(source_col).applyInPandas(fn, schema=out_schema)
    )


def fixed_histogram(
    df: DataFrame,
    les: Sequence[float],
    bucket_s: int = 3600,
    value_col: str = "value",
    source_col: str = "source",
    ts_col: str = "ts_s",
) -> DataFrame:
    """Prometheus-style cumulative fixed-bucket histogram per (series,
    time bucket): one row per `le` upper bound (plus +Inf) with the
    CUMULATIVE count of values <= le.

    Each input row increments exactly one raw bucket (its smallest
    containing le, found by a nested CASE fold over the literal bounds —
    up to len(les) comparisons per row, linear but branch-only and
    codegen'd; fine for the small fixed bucket lists histograms use,
    and never a les-sized row explode);
    the cumulative view is a running sum over the tiny per-group bucket
    rows. Cumulative fixed buckets are the mergeable quantile state:
    O(buckets) per group, re-aggregable across retention tiers by plain
    addition — the scale story PromQL histograms exist for.
    """
    fins = sorted(float(x) for x in les)
    # smallest le >= value, else +Inf: a fold over the literal bounds
    idx_expr = F.lit(float("inf"))
    for b in reversed(fins):
        idx_expr = F.when(F.col(value_col) <= F.lit(b), F.lit(b)).otherwise(idx_expr)
    raw = (
        df.groupBy(
            F.col(source_col).alias("source"),
            _bucket_start(F.col(ts_col), bucket_s).alias("bucket_s"),
            idx_expr.alias("le"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # raw feeds BOTH the group-distinct grid and the densify join; cut
    # the diamond (Spark does not dedup identical subtrees — without
    # this the full-input bucket aggregation runs twice). raw is
    # (groups × ≤ les+1) rows — model-sized.
    raw = raw.localCheckpoint(eager=False)
    # densify to the FULL configured bucket grid (a Prometheus histogram
    # always carries every le, counted or not — quantile interpolation
    # depends on the empty buckets being present): observed groups ×
    # broadcast le literals, raw counts left-joined in
    spark = df.sparkSession
    les_df = spark.createDataFrame(
        [(float(b),) for b in fins + [float("inf")]], "le double"
    )
    grid = (
        raw.select("source", "bucket_s").distinct().crossJoin(F.broadcast(les_df))
    )
    dense = grid.join(raw, ["source", "bucket_s", "le"], "left").na.fill({"cnt": 0})
    w = (
        Window.partitionBy("source", "bucket_s")
        .orderBy("le")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dense.select(
        "source", "bucket_s", "le", F.sum("cnt").over(w).alias("cum_count")
    )


def histogram_quantile(
    hist: DataFrame,
    q: float = 0.9,
) -> DataFrame:
    """PromQL `histogram_quantile(q, ...)` over a cumulative fixed-bucket
    histogram frame (source, bucket_s, le, cum_count): linear
    interpolation inside the first bucket whose cumulative count reaches
    rank = q·total; the +Inf bucket returns the largest finite bound and
    the lowest bucket interpolates from 0 (the PromQL conventions).

    Implementation is one lag window + one struct-min aggregation over
    the (tiny) bucket rows — never touches raw samples.

    `q` must lie in (0, 1]: q > 1 would silently drop every group (no
    bucket reaches rank) and q = 0 hits 0/0 — both rejected here rather
    than silently diverging from PromQL's ±Inf conventions.
    """
    if not 0.0 < q <= 1.0:
        raise ValueError(f"q must be in (0, 1], got {q}")
    w_ord = Window.partitionBy("source", "bucket_s").orderBy("le")
    w_all = Window.partitionBy("source", "bucket_s")
    cum_d = F.col("cum_count").cast("double")
    h = (
        hist.withColumn("prev_cum", F.lag(cum_d, 1, 0.0).over(w_ord))
        .withColumn("prev_le", F.lag(F.col("le"), 1, 0.0).over(w_ord))
        .withColumn("total", F.max(cum_d).over(w_all))
        .withColumn(
            "maxfin",
            F.max(F.when(F.col("le") != float("inf"), F.col("le"))).over(w_all),
        )
        .withColumn("rank", F.lit(float(q)) * F.col("total"))
    )
    cand = h.filter(cum_d >= F.col("rank"))
    sel = cand.groupBy("source", "bucket_s").agg(
        F.min(
            F.struct(
                F.col("le").alias("le"),
                F.col("prev_le").alias("prev_le"),
                cum_d.alias("cum"),
                F.col("prev_cum").alias("prev_cum"),
                F.col("rank").alias("rank"),
                F.col("maxfin").alias("maxfin"),
                F.col("total").alias("total"),
            )
        ).alias("s")
    )
    phi = F.when(F.col("s.le") == float("inf"), F.col("s.maxfin")).otherwise(
        F.col("s.prev_le")
        + (F.col("s.le") - F.col("s.prev_le"))
        * (F.col("s.rank") - F.col("s.prev_cum"))
        / (F.col("s.cum") - F.col("s.prev_cum"))
    )
    return sel.select(
        "source",
        "bucket_s",
        F.col("s.total").cast("bigint").alias("total"),
        _r6(phi).alias("phi"),
    )


def sessionize(
    df: DataFrame,
    gap_s: int = 1800,
    key_cols: Sequence[str] = ("user_id",),
    ts_col: str = "ts_s",
    order_cols: Sequence[str] = ("ts_s", "event_id"),
    value_col: str | None = "value",
) -> DataFrame:
    """Gap-based sessionization: per key, events closer than `gap_s`
    seconds to their predecessor share a session; a larger gap opens a
    new one. Returns one row per session: (keys..., session_idx,
    start_s, end_s, n_events, duration_s[, value_sum]).

    The classic two-window composition — boundary flag from lag(ts),
    session id as the running sum of boundaries — BOTH windows share
    one exchange + one sort per key (same partitioning, same ordering),
    then the per-session aggregate is map-side combinable. This is the
    batch twin of Structured Streaming's session_window; at 10^12
    events it is one shuffle, never an iterative merge.

    value_sum uses a decimal cast (2-dp inputs ⇒ exact,
    order-independent — the engine's cross-engine sum discipline).
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    boundary = (
        prev_ts.isNull() | (F.col(ts_col) - prev_ts > F.lit(int(gap_s)))
    ).cast("bigint")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = df.withColumn("session_idx", F.sum(boundary).over(wrun))
    aggs = [
        F.min(F.col(ts_col)).alias("start_s"),
        F.max(F.col(ts_col)).alias("end_s"),
        F.count(F.lit(1)).alias("n_events"),
        (F.max(F.col(ts_col)) - F.min(F.col(ts_col))).alias("duration_s"),
    ]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast(_DEC)).cast("double").alias("value_sum")
        )
    return sess.groupBy(*keys, "session_idx").agg(*aggs)
