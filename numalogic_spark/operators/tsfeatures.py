"""Per-series time-series feature operators: autocorrelation (ACF),
CUSUM change-point detection, Hampel (rolling-median/MAD) outlier
filtering, and a classical-decomposition "STL-lite" (trend / seasonal /
remainder). These extend the engine's diagnostics family (rollups,
forecast baselines, EWM) with the standard exploratory statistics an
anomaly-detection user runs before configuring thresholds — numalogic
itself leaves them to pandas/statsmodels notebooks (its `tools/`
aggregators stop at window MAX/MEAN/EXP, numalogic/tools/aggregators.py);
here they are first-class distributed operators.

Cross-engine exactness (the hash-gate discipline): every statistic is
built from decimal moments of the RAW values — Σx, Σx², Σx·lag(x) as
decimal(15,6) sums, order-independent and exact for 2-dp inputs — and
the means/variances/correlations derive from those scalars with
identical double expressions on both engines. Where a COMPUTED double
must be re-aggregated (STL's detrended series), it is first rounded to
6 dp with the engine-identical `floor(x*1e6+0.5)/1e6` so the decimal
cast is exact on both sides. decimal(15,6) not (20,6): Spark rounds a
(20,6)×(20,6) product's scale down to 7 while DuckDB keeps 12
(forecast.py:199 precedent); (15,6)×(15,6)→(31,12) is exact on both.

Scale shape (the 100-TB story):
- ACF/CUSUM/Hampel/STL all ride ONE exchange + sort per series window;
  the per-lag columns, running sums and rolling arrays reuse the same
  sort. Aggregations are map-side-combinable groupBys on the series key.
- Per-series sorting parallelism = series cardinality — the same design
  point as windows.py; for few-series corpora the salted-chunk machinery
  (windows.salted docstring) applies since lag-k / rolling-L state only
  crosses chunk boundaries by k (resp. L) rows.
- STL's seasonal fit is a tiny (source × phase) table joined back via
  broadcast; no second full shuffle.
- No Python in the hot path: everything is Catalyst expressions
  (lag/window sums/sorted-array medians via JVM higher-order functions).
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(15,6)"


def _r6c(c: Column) -> Column:
    """floor(x*1e6+0.5)/1e6 — deterministic 6-dp rounding, identical on
    Spark and DuckDB (HALF_UP vs half-even round() would diverge)."""
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def acf(
    df: DataFrame,
    value_col: str = "value",
    source_col: str = "source",
    order_cols: Sequence[str] = ("ts_s", "event_id"),
    lags: Sequence[int] = (1, 2, 3, 6, 12),
) -> DataFrame:
    """Per-series autocorrelation at the given lags, statsmodels-style:

        r_k = Σ_{t>k} (x_t - x̄)(x_{t-k} - x̄) / Σ_t (x_t - x̄)²

    with x̄ the FULL-series mean in both factors (the standard ACF
    estimator, biased-but-consistent denominator over all n). Expanded
    into raw decimal moments so no computed double is ever re-summed:

        num_k = Σx·lag_k − x̄·(Σ_{T_k}x + Σ_{T_k}lag_k) + n_k·x̄²
        den   = Σx² − (Σx)²/n

    One window sort produces every lag column; one groupBy produces all
    moments; a stack() unpivots to (source, lag, n_used, acf_value).
    Series with zero variance yield acf_value = 0.0 (defined, matching
    the oracle's guarded division).
    """
    lags = sorted(set(int(k) for k in lags))
    if not lags or lags[0] < 1:
        raise ValueError(f"lags must be positive ints, got {lags}")
    w = Window.partitionBy(source_col).orderBy(*[F.col(c) for c in order_cols])
    x = F.col(value_col)
    xd = x.cast(_DEC)
    cols = [F.col(source_col).alias("source"), x.alias("_x"), xd.alias("_xd")]
    for k in lags:
        cols.append(F.lag(x, k).over(w).alias(f"_l{k}"))
    lagged = df.select(*cols)

    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("_xd").cast("double").alias("sx"),
        F.sum(F.col("_xd") * F.col("_xd")).cast("double").alias("sxx"),
    ]
    for k in lags:
        lk = F.col(f"_l{k}")
        lkd = lk.cast(_DEC)
        ok = lk.isNotNull()
        aggs += [
            F.sum(F.when(ok, 1).otherwise(0)).alias(f"nk{k}"),
            F.sum(F.when(ok, F.col("_xd") * lkd)).cast("double").alias(f"sxl{k}"),
            F.sum(F.when(ok, F.col("_xd"))).cast("double").alias(f"sxk{k}"),
            F.sum(F.when(ok, lkd)).cast("double").alias(f"slk{k}"),
        ]
    m = lagged.groupBy("source").agg(*aggs)

    nd = F.col("n").cast("double")
    mu = F.col("sx") / nd
    den = F.col("sxx") - (F.col("sx") * F.col("sx")) / nd
    acf_cols = []
    for k in lags:
        num = (
            F.col(f"sxl{k}")
            - mu * (F.col(f"sxk{k}") + F.col(f"slk{k}"))
            + F.col(f"nk{k}").cast("double") * mu * mu
        )
        acf_cols.append(
            F.when(
                (den > F.lit(0.0)) & (F.col(f"nk{k}") > 0), num / den
            ).otherwise(F.lit(0.0)).alias(f"acf{k}")
        )
    wide = m.select("source", "n", *[F.col(f"nk{k}") for k in lags], *acf_cols)
    stack = ", ".join(f"{k}, nk{k}, acf{k}" for k in lags)
    return wide.selectExpr(
        "source",
        f"stack({len(lags)}, {stack}) AS (lag, n_used, acf_value)",
    )


def cusum_changepoint(
    df: DataFrame,
    value_col: str = "value",
    source_col: str = "source",
    order_cols: Sequence[str] = ("ts_s", "event_id"),
) -> DataFrame:
    """Per-series CUSUM change-point: the standardized cumulative sum

        s_t = (S_t - t·x̄) / σ,   S_t = Σ_{i≤t} x_i,   σ = √(den/n)

    peaks (in |s|) where the series mean shifts; the detected
    change-point is the EARLIEST row attaining max|s_t| (ties broken by
    the series order). S_t is a running DECIMAL sum (exact,
    order-independent); x̄ and σ come from the same decimal moments, so
    s_t is bit-identical across engines. Output: one row per series —
    (source, n, cp_<order cols...>, cp_pos, s_abs_max).

    Zero-variance series are reported with s_abs_max = 0.0 and the first
    row as the change-point (the guarded division's fixed point)."""
    w = Window.partitionBy(source_col).orderBy(*[F.col(c) for c in order_cols])
    x = F.col(value_col)
    run = (
        F.sum(x.cast(_DEC)).over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
    )
    pos = F.row_number().over(w)
    base = df.select(
        F.col(source_col).alias("source"),
        *[F.col(c) for c in order_cols],
        run.alias("_run"),
        pos.alias("_pos"),
        x.cast(_DEC).alias("_xd"),
    )
    mom = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_xd").cast("double").alias("sx"),
        F.sum(F.col("_xd") * F.col("_xd")).cast("double").alias("sxx"),
    )
    nd = F.col("n").cast("double")
    mu = F.col("sx") / nd
    var = (F.col("sxx") - (F.col("sx") * F.col("sx")) / nd) / nd
    stats = mom.select(
        "source", "n", mu.alias("_mu"),
        F.when(var > F.lit(0.0), F.sqrt(var)).otherwise(F.lit(0.0)).alias("_sd"),
    )
    scored = base.join(F.broadcast(stats), "source").select(
        "source", "n", *order_cols, "_pos",
        F.when(
            F.col("_sd") > F.lit(0.0),
            F.abs(
                (F.col("_run") - F.col("_pos").cast("double") * F.col("_mu"))
                / F.col("_sd")
            ),
        ).otherwise(F.lit(0.0)).alias("_s_abs"),
    )
    pick = Window.partitionBy("source").orderBy(F.desc("_s_abs"), F.asc("_pos"))
    return (
        scored.withColumn("_rk", F.row_number().over(pick))
        .filter(F.col("_rk") == 1)
        .select(
            "source", "n",
            *[F.col(c).alias(f"cp_{c}") for c in order_cols],
            F.col("_pos").alias("cp_pos"),
            _r6c(F.col("_s_abs")).alias("s_abs_max"),
        )
    )


def psi_drift(
    bucketed: DataFrame,
    value_col: str = "val",
    source_col: str = "source",
    order_col: str = "bucket_s",
    n_bins: int = 10,
    scale: int = 100,
) -> DataFrame:
    """Population Stability Index per series between the FIRST and
    SECOND time halves — the standard ML-monitoring drift score
    ("has this metric's distribution moved since the reference
    window?"):

        bins  = `n_bins` quantile buckets of the FIRST half (type-1
                edges off the value histogram — exact, engine-neutral)
        p_b,q_b = Laplace-smoothed bin shares ((c+½)/(n+B/2)) of each half
        PSI   = Σ_b (q_b − p_b)·ln(q_b / p_b)

    Rule-of-thumb: <0.1 stable, 0.1–0.25 moderate shift, >0.25 drifted.
    The time split is by per-series row rank (first ⌊n/2⌋ buckets);
    edges come from the same distinct-value histogram machinery as
    series_summary, ride back as a broadcast, and the final fold is a
    sorted sum of ≤ n_bins terms — everything engine-exact.

    Output: (source, n_first, n_second, psi)."""
    if not (2 <= n_bins <= 100):
        raise ValueError(f"n_bins must be in [2, 100], got {n_bins}")
    sc = float(scale)
    w = Window.partitionBy(source_col).orderBy(F.col(order_col))
    base = bucketed.select(
        F.col(source_col).alias("source"),
        F.col(value_col).alias("v"),
        F.row_number().over(w).alias("_pos"),
        F.count(F.lit(1)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("_n"),
    ).select(
        "source", "v",
        F.when(F.col("_pos") <= F.floor(F.col("_n") / F.lit(2)), F.lit(1))
        .otherwise(F.lit(2)).alias("half"),
    )

    # quantile edges of the FIRST half (k-space, exact)
    qv = F.floor(F.col("v") * F.lit(sc) + F.lit(0.5)).cast("long")
    h1 = (
        base.filter(F.col("half") == 1)
        .groupBy("source", qv.alias("k"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cw = Window.partitionBy("source").orderBy("k")
    cum = h1.select(
        "source", "k",
        F.sum("c").over(cw.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("c").over(
            cw.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n1"),
    )
    edge_aggs = []
    for j in range(1, n_bins):
        qj = j / n_bins  # python float — emitted identically in the oracle
        rank = F.ceil(F.lit(qj) * F.col("n1").cast("double"))
        edge_aggs.append(
            (F.min(F.when(F.col("cum") >= rank, F.col("k"))).cast("double")
             / F.lit(sc)).alias(f"e{j}")
        )
    edges = cum.groupBy("source").agg(*edge_aggs)

    binned = base.join(F.broadcast(edges), "source")
    bin_col = F.lit(0)
    for j in range(1, n_bins):
        bin_col = bin_col + F.when(F.col("v") > F.col(f"e{j}"), 1).otherwise(0)
    counts = binned.select("source", "half", bin_col.alias("b")).groupBy(
        "source", "half", "b"
    ).agg(F.count(F.lit(1)).alias("c"))

    halves = base.groupBy("source", "half").agg(F.count(F.lit(1)).alias("hn"))
    grid = (
        halves.crossJoin(
            F.broadcast(
                bucketed.sparkSession.range(n_bins).select(
                    F.col("id").cast("int").alias("b")
                )
            )
        )
        .join(counts, ["source", "half", "b"], "left")
        .select(
            "source", "half", "b", "hn",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
    )
    share = (F.col("c").cast("double") + F.lit(0.5)) / (
        F.col("hn").cast("double") + F.lit(float(n_bins) / 2.0)
    )
    pq = grid.select("source", "half", "b", "hn", share.alias("sh"))
    p = pq.filter(F.col("half") == 1).select(
        "source", "b", F.col("sh").alias("p"), F.col("hn").alias("n_first")
    )
    q = pq.filter(F.col("half") == 2).select(
        "source", "b", F.col("sh").alias("q"), F.col("hn").alias("n_second")
    )
    terms = p.join(q, ["source", "b"]).select(
        "source", "n_first", "n_second",
        ((F.col("q") - F.col("p")) * F.log(F.col("q") / F.col("p"))).alias("t"),
    )
    return terms.groupBy("source", "n_first", "n_second").agg(
        F.aggregate(
            F.array_sort(F.collect_list("t")), F.lit(0.0), lambda acc, t: acc + t
        ).alias("psi")
    )


def page_hinkley(
    bucketed: DataFrame,
    value_col: str = "val",
    source_col: str = "source",
    order_col: str = "bucket_s",
    delta: float = 0.0,
    lam: float = 50.0,
) -> DataFrame:
    """Page–Hinkley drift test per series (the online mean-shift
    detector CUSUM's sibling — Page 1954; the streaming-drift staple in
    river/MOA): with x̄_t the running mean,

        m_t  = m_{t-1} + (x_t − x̄_t − δ),   m_0 = 0
        PH_t = m_t − min_{i≤t} m_i,          alarm when PH_t > λ

    Genuinely sequential (the running mean couples every step), so it
    runs as a scalar python loop in applyInPandas — parallelism = series
    cardinality, series length bounded by the time range (the Holt
    design point). Every step is a fixed IEEE op sequence, replayed
    bit-for-bit by the driver's recursive-CTE oracle.

    Output: (source, <order>, val, ph, alarm)."""
    d = float(delta)
    lam = float(lam)
    schema = (
        f"{source_col} string, {order_col} long, val double, "
        "ph double, alarm boolean"
    )

    def _run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, ignore_index=True)
        xs = [float(v) for v in pdf[value_col]]
        s = 0.0
        m = 0.0
        mmin = float("inf")
        phs, alarms = [], []
        for i, x in enumerate(xs, start=1):
            s += x
            mean = s / i
            m = m + (x - mean - d)
            if m < mmin:
                mmin = m
            ph = m - mmin
            phs.append(ph)
            alarms.append(ph > lam)
        return pd.DataFrame(
            {
                source_col: pdf[source_col],
                order_col: pdf[order_col],
                "val": xs,
                "ph": phs,
                "alarm": alarms,
            }
        )

    return bucketed.groupBy(source_col).applyInPandas(_run, schema=schema)


def _sorted_median(arr: Column) -> Column:
    """Median of a sorted array: mean of the two middle elements (equal
    for odd length) — element_at is 1-based on both engines."""
    n = F.size(arr)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, ((n + 2) / 2).cast("int"))
    return (lo + hi) / F.lit(2.0)


def hampel_filter(
    df: DataFrame,
    value_col: str = "value",
    source_col: str = "source",
    order_cols: Sequence[str] = ("ts_s", "event_id"),
    window: int = 11,
    n_sigmas: float = 3.0,
) -> DataFrame:
    """Hampel identifier over a TRAILING window of `window` rows per
    series: rolling exact median, rolling MAD (median absolute deviation
    from that median), and the outlier flag

        |x_t - med_t| > n_sigmas · 1.4826 · mad_t

    (1.4826 ≈ 1/Φ⁻¹(3/4), the Gaussian consistency constant). Trailing
    (not centered) so the same operator is streaming-compatible — the
    flag at t depends only on rows ≤ t. Medians are computed from the
    sorted window array with the identical mean-of-middles expression on
    both engines; inputs are raw values so no double is re-aggregated.
    Warm-up rows (fewer than `window` rows available) are still scored
    over the partial window, like pandas `rolling(min_periods=1)`.

    Output: (source, <order cols...>, value, med, mad, is_outlier)."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    w = (
        Window.partitionBy(source_col)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(-(window - 1), 0)
    )
    arr = F.array_sort(F.collect_list(F.col(value_col)).over(w))
    base = df.select(
        F.col(source_col).alias("source"),
        *[F.col(c) for c in order_cols],
        F.col(value_col).alias("value"),
        arr.alias("_arr"),
    )
    med = _sorted_median(F.col("_arr"))
    scored = base.withColumn("med", med).withColumn(
        "mad",
        _sorted_median(
            F.array_sort(
                F.transform(F.col("_arr"), lambda a: F.abs(a - F.col("med")))
            )
        ),
    )
    dev = F.abs(F.col("value") - F.col("med"))
    return scored.select(
        "source", *order_cols, "value",
        _r6c(F.col("med")).alias("med"),
        _r6c(F.col("mad")).alias("mad"),
        (dev > F.lit(float(n_sigmas)) * F.lit(1.4826) * F.col("mad")).alias(
            "is_outlier"
        ),
    )


def series_summary(
    df: DataFrame,
    value_col: str = "value",
    source_col: str = "source",
    quantiles: Sequence[float] = (0.25, 0.5, 0.75, 0.95, 0.99),
    scale: int = 100,
) -> DataFrame:
    """Exact per-series describe — count/min/quantiles/max/mean/std —
    via the VALUE-HISTOGRAM trick (the rollup-p95 discipline): quantize
    each value to an integer key (`floor(v·scale + 0.5)`, the identity
    for inputs with ≤ log10(scale) decimals), aggregate counts per
    (series, key), and read every statistic off the histogram:

      quantile q = smallest key whose cumulative count ≥ ceil(q·n)
                   (type-1 / lower quantile — integer logic, engine-exact)
      mean/std from decimal Σkey·c and Σkey²·c moments

    Unlike sort- or collect-based describes, the state per series is the
    DISTINCT-VALUE histogram (bounded by value resolution, not row
    count), so a trillion-row series costs one groupBy + one tiny
    window. `summary()`/approxQuantile trade exactness for rank error;
    this is exact at 1/scale resolution.

    Output: (source, n, vmin, q25..., vmax, mean, std)."""
    qv = F.floor(F.col(value_col) * F.lit(float(scale)) + F.lit(0.5)).cast("long")
    h = df.groupBy(F.col(source_col).alias("source"), qv.alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("source").orderBy("k")
    cum = h.select(
        "source", "k", "c",
        F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("c").over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n"),
    )
    # scale-0 decimals: Σk·c and Σk²·c are INTEGER moments — a (38,0)
    # product can only overflow (it never silently rounds the way
    # fractional-scale precision capping does), and k²·c ≤ 1e24 ≪ 1e38
    kd = F.col("k").cast("decimal(18,0)")
    kkd = (F.col("k") * F.col("k")).cast("decimal(19,0)")
    cd = F.col("c").cast("decimal(19,0)")
    nd = F.col("n").cast("double")
    sc = float(scale)
    aggs = [
        F.first("n").alias("n"),
        (F.min("k").cast("double") / F.lit(sc)).alias("vmin"),
    ]
    for q in quantiles:
        rank = F.ceil(F.lit(float(q)) * nd)
        name = f"q{int(round(q * 100)):02d}"
        aggs.append(
            (
                F.min(F.when(F.col("cum") >= rank, F.col("k"))).cast("double")
                / F.lit(sc)
            ).alias(name)
        )
    aggs += [
        (F.max("k").cast("double") / F.lit(sc)).alias("vmax"),
        F.sum(kd * cd).cast("double").alias("_sk"),
        F.sum(kkd * cd).cast("double").alias("_skk"),
    ]
    m = cum.groupBy("source").agg(*aggs)
    nd2 = F.col("n").cast("double")
    mean = (F.col("_sk") / nd2) / F.lit(sc)
    var = (F.col("_skk") - (F.col("_sk") * F.col("_sk")) / nd2) / nd2
    std = F.when(var > F.lit(0.0), F.sqrt(var) / F.lit(sc)).otherwise(F.lit(0.0))
    keep = [c for c in m.columns if not c.startswith("_")]
    return m.select(*keep, mean.alias("mean"), std.alias("std"))


def pot_threshold(
    df: DataFrame,
    value_col: str = "value",
    source_col: str = "source",
    u_quantile: float = 0.95,
    target_prob: float = 1e-4,
    scale: int = 100,
) -> DataFrame:
    """Peaks-over-threshold extreme-value threshold per series (the SPOT
    recipe, Siffer et al. KDD'17): fit a Generalized Pareto to the
    exceedances over an initial high quantile u, then extrapolate the
    anomaly threshold at a far-tail probability no empirical quantile
    can reach:

        u        = exact type-1 quantile at `u_quantile` (histogram trick)
        ξ  (MoM) = ½·(1 − m²/v)          m, v: mean/variance of (x − u), x > u
        σ  (MoM) = ½·m·(m²/v + 1)
        z_q      = u + (σ/ξ)·((p·n/n_u)^(−ξ) − 1)    [ξ→0: u − σ·ln(p·n/n_u)]

    Method-of-moments instead of MLE keeps the fit a CLOSED FORM over
    decimal moments — no per-series iteration, one aggregation, and the
    DuckDB oracle replays it exactly. Exceedances x−u are exact at the
    input's decimal resolution (both 2-dp), so their decimal moments are
    exact. Series with no exceedances or zero exceedance variance yield
    NULL fit columns.

    Output: (source, n, u, n_exceed, xi, sigma, z_q)."""
    if not (0.0 < u_quantile < 1.0) or not (0.0 < target_prob < 1.0):
        raise ValueError("u_quantile and target_prob must be in (0, 1)")
    sc = float(scale)
    qv = F.floor(F.col(value_col) * F.lit(sc) + F.lit(0.5)).cast("long")
    h = df.groupBy(F.col(source_col).alias("source"), qv.alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("source").orderBy("k")
    cum = h.select(
        "source", "k", "c",
        F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("c").over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n"),
    )
    rank = F.ceil(F.lit(float(u_quantile)) * F.col("n").cast("double"))
    uk = cum.groupBy("source").agg(
        F.first("n").alias("n"),
        F.min(F.when(F.col("cum") >= rank, F.col("k"))).alias("_uk"),
    )
    us = uk.select(
        "source", "n", (F.col("_uk").cast("double") / F.lit(sc)).alias("u")
    )
    joined = df.select(
        F.col(source_col).alias("source"), F.col(value_col).alias("x")
    ).join(F.broadcast(us), "source")
    exc = joined.filter(F.col("x") > F.col("u")).select(
        "source", (F.col("x") - F.col("u")).cast(_DEC).alias("ed")
    )
    mom = exc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_exceed"),
        F.sum("ed").cast("double").alias("se"),
        F.sum(F.col("ed") * F.col("ed")).cast("double").alias("see"),
    )
    out = us.join(mom, "source", "left")
    ned = F.col("n_exceed").cast("double")
    m = F.col("se") / ned
    v = (F.col("see") - (F.col("se") * F.col("se")) / ned) / ned
    m2v = (m * m) / v
    xi = F.lit(0.5) * (F.lit(1.0) - m2v)
    sigma = F.lit(0.5) * m * (m2v + F.lit(1.0))
    r = (F.lit(float(target_prob)) * F.col("n").cast("double")) / ned
    zq = F.when(
        F.abs(xi) < F.lit(1e-9), F.col("u") - sigma * F.log(r)
    ).otherwise(F.col("u") + (sigma / xi) * (F.pow(r, -xi) - F.lit(1.0)))
    ok = (F.col("n_exceed") > F.lit(1)) & (v > F.lit(0.0))
    return out.select(
        "source", "n", "u",
        F.coalesce(F.col("n_exceed"), F.lit(0)).alias("n_exceed"),
        F.when(ok, xi).alias("xi"),
        F.when(ok, sigma).alias("sigma"),
        F.when(ok, zq).alias("z_q"),
    )


def trend_slope(
    df: DataFrame,
    value_col: str = "value",
    source_col: str = "source",
    order_cols: Sequence[str] = ("ts_s", "event_id"),
) -> DataFrame:
    """Per-series OLS trend: regress the value on its 1-based position,

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
        intercept = (Σy − slope·Σx) / n
        r² = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))

    from decimal raw moments (position ≤ 10⁹ and 2-dp values keep every
    product exact in decimal(15,6)² → (31,12)). Regressing on POSITION
    rather than the raw epoch keeps the moments inside decimal range and
    makes the slope "per step", which is what a regular series wants.
    One sort + one agg per series. Zero-variance series (either side)
    report slope/r2 = 0.0 and intercept = mean.

    Output: (source, n, slope, intercept, r2)."""
    w = Window.partitionBy(source_col).orderBy(*[F.col(c) for c in order_cols])
    pos = F.row_number().over(w).cast(_DEC)
    yd = F.col(value_col).cast(_DEC)
    base = df.select(
        F.col(source_col).alias("source"), pos.alias("xd"), yd.alias("yd")
    )
    m = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xd").cast("double").alias("sx"),
        F.sum("yd").cast("double").alias("sy"),
        F.sum(F.col("xd") * F.col("xd")).cast("double").alias("sxx"),
        F.sum(F.col("yd") * F.col("yd")).cast("double").alias("syy"),
        F.sum(F.col("xd") * F.col("yd")).cast("double").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = nd * F.col("syy") - F.col("sy") * F.col("sy")
    slope = F.when(vx > F.lit(0.0), num / vx).otherwise(F.lit(0.0))
    return m.select(
        "source",
        "n",
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / nd).alias("intercept"),
        F.when(
            (vx > F.lit(0.0)) & (vy > F.lit(0.0)), (num * num) / (vx * vy)
        ).otherwise(F.lit(0.0)).alias("r2"),
    )


def seasonal_anomalies(
    decomposed: DataFrame,
    remainder_col: str = "remainder",
    source_col: str = "source",
    n_sigmas: float = 3.0,
) -> DataFrame:
    """Seasonal-robust anomaly flags on an STL-lite output: a point is
    anomalous when its remainder deviates from the series' remainder
    median by more than n_sigmas·1.4826·MAD — the non-iterative core of
    S-H-ESD (Twitter's seasonal ESD): decompose seasonality away, then
    median/MAD-test the residual, so level shifts and seasonal swings
    don't inflate the threshold the way a mean/stddev test would.

    The per-series median/MAD come from one sorted collect_list
    (bounded: one element per BUCKET, i.e. by the series' time range,
    not the corpus size) and join back via broadcast. Remainders are
    6-dp doubles, so the sorted-array middles are engine-exact.

    Output: input columns + rem_med, rem_mad, is_anomaly."""
    stats = (
        decomposed.groupBy(source_col)
        .agg(F.array_sort(F.collect_list(F.col(remainder_col))).alias("_arr"))
        .select(
            source_col,
            _sorted_median(F.col("_arr")).alias("rem_med"),
            F.col("_arr").alias("_arr"),
        )
        .select(
            source_col,
            "rem_med",
            _sorted_median(
                F.array_sort(
                    F.transform(F.col("_arr"), lambda a: F.abs(a - F.col("rem_med")))
                )
            ).alias("rem_mad"),
        )
    )
    dev = F.abs(F.col(remainder_col) - F.col("rem_med"))
    return decomposed.join(F.broadcast(stats), source_col).select(
        *decomposed.columns,
        _r6c(F.col("rem_med")).alias("rem_med"),
        _r6c(F.col("rem_mad")).alias("rem_mad"),
        (dev > F.lit(float(n_sigmas)) * F.lit(1.4826) * F.col("rem_mad")).alias(
            "is_anomaly"
        ),
    )


def rolling_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    key_cols: Sequence[str] = (),
    order_col: str = "bucket_s",
    window: int = 24,
) -> DataFrame:
    """Rolling Pearson correlation between two aligned metric columns
    over a trailing window of `window` rows:

        r = (n·Σxy − Σx·Σy) / √((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))

    with every Σ a DECIMAL window sum (exact, order-independent) so r is
    bit-identical across engines. The standard co-movement diagnostic
    for multi-metric anomaly setups (e.g. "error rate decorrelated from
    traffic"). Rows with fewer than 2 window rows, or with a
    zero-variance side, yield NULL. One sort per key; no Python.

    Output: input keys + order + x/y + `corr` (unrounded; callers round
    for hashing)."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    w = (
        Window.partitionBy(*[F.col(c) for c in key_cols])
        .orderBy(F.col(order_col))
        .rowsBetween(-(window - 1), 0)
    )
    xd = F.col(x_col).cast(_DEC)
    yd = F.col(y_col).cast(_DEC)
    n = F.count(F.lit(1)).over(w).cast("double")
    sx = F.sum(xd).over(w).cast("double")
    sy = F.sum(yd).over(w).cast("double")
    sxx = F.sum(xd * xd).over(w).cast("double")
    syy = F.sum(yd * yd).over(w).cast("double")
    sxy = F.sum(xd * yd).over(w).cast("double")
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    num = n * sxy - sx * sy
    r = F.when(
        (n > F.lit(1.0)) & (vx > F.lit(0.0)) & (vy > F.lit(0.0)),
        num / F.sqrt(vx * vy),
    )
    return df.select(
        *[F.col(c) for c in key_cols],
        F.col(order_col),
        F.col(x_col),
        F.col(y_col),
        r.alias("corr"),
    )


def aligned_pair_series(
    bucketed: DataFrame,
    value_col: str = "val",
    source_col: str = "source",
    bucket_col: str = "bucket_s",
    pairs: "DataFrame | Sequence[tuple[str, str]] | None" = None,
    top_k_by_variance: int | None = None,
) -> DataFrame:
    """Aligned (src_a, src_b, bucket, x, y) rows for pairwise diagnostics
    (rolling_corr input): src_a < src_b, one row per bucket where both
    sides exist. Same candidate limiting as ccf_pairs — `pairs` gives an
    O(|pairs|·T) broadcast-bounded build, `top_k_by_variance` caps the
    source set; default (both None) is the all-pairs grid, fine for
    dashboard-scale source counts only."""
    if top_k_by_variance is not None and pairs is None:
        keep = top_variance_sources(
            bucketed, top_k_by_variance, value_col, source_col
        )
        bucketed = bucketed.join(F.broadcast(keep), source_col, "left_semi")
    a = bucketed.select(
        F.col(source_col).alias("src_a"),
        F.col(bucket_col).alias("bucket_s"),
        F.col(value_col).alias("x"),
    )
    b = bucketed.select(
        F.col(source_col).alias("src_b"),
        F.col(bucket_col).alias("bucket_s"),
        F.col(value_col).alias("y"),
    )
    if pairs is not None:
        pair_df = _as_pairs_df(bucketed, pairs)
        return a.join(F.broadcast(pair_df), "src_a").join(
            b, ["src_b", "bucket_s"]
        ).select("src_a", "src_b", "bucket_s", "x", "y")
    return (
        a.join(b, "bucket_s")
        .filter(F.col("src_a") < F.col("src_b"))
        .select("src_a", "src_b", "bucket_s", "x", "y")
    )


def top_variance_sources(
    bucketed: DataFrame,
    k: int,
    value_col: str = "val",
    source_col: str = "source",
) -> DataFrame:
    """The k sources with the highest series variance — the standard
    candidate prefilter for pairwise diagnostics (flat series correlate
    with nothing interesting; the variance rank is one cheap map-side
    aggregation). Ties break on source name for determinism. Returns a
    1-column frame (`source_col`) suitable for a broadcast semi-join."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    xd = F.col(value_col).cast(_DEC)
    stats = bucketed.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(xd).cast("double").alias("_sx"),
        F.sum(xd * xd).cast("double").alias("_sxx"),
    )
    nd = F.col("_n").cast("double")
    var = (F.col("_sxx") - F.col("_sx") * F.col("_sx") / nd) / nd
    ranked = stats.select(
        source_col, F.when(nd > 0, var).otherwise(F.lit(0.0)).alias("_var")
    ).orderBy(F.col("_var").desc(), F.col(source_col)).limit(k)
    return ranked.select(source_col)


def _as_pairs_df(
    bucketed: DataFrame, pairs: "DataFrame | Sequence[tuple[str, str]]"
) -> DataFrame:
    """Normalize an explicit candidate pair list to a deduped
    (src_a, src_b) DataFrame with src_a < src_b (the orientation the
    pairwise operators emit — the mirror is derivable)."""
    if isinstance(pairs, DataFrame):
        pdf = pairs.select("src_a", "src_b")
    else:
        pdf = bucketed.sparkSession.createDataFrame(
            [(str(a), str(b)) for a, b in pairs], "src_a string, src_b string"
        )
    lo = F.least("src_a", "src_b")
    hi = F.greatest("src_a", "src_b")
    return (
        pdf.filter(F.col("src_a") != F.col("src_b"))
        .select(lo.alias("src_a"), hi.alias("src_b"))
        .dropDuplicates(["src_a", "src_b"])
    )


def ccf_pairs(
    bucketed: DataFrame,
    value_col: str = "val",
    source_col: str = "source",
    bucket_col: str = "bucket_s",
    lags: Sequence[int] = (-3, -2, -1, 0, 1, 2, 3),
    bucket_seconds: int = 3600,
    pairs: "DataFrame | Sequence[tuple[str, str]] | None" = None,
    top_k_by_variance: int | None = None,
) -> DataFrame:
    """Cross-correlation function between every source pair on a regular
    bucket grid: ccf(a, b, k) = corr(a_t, b_{t−k}) over the buckets
    where both sides exist — "does b lead a by k steps?". The lead/lag
    diagnostic behind alert root-causing (error rate trails deploys) and
    feature selection for forecasters.

    Spark-native shape: instead of per-series sorts and positional lags,
    the b side is EXPLODED once over the lag list with its bucket
    time-SHIFTED (the seasonal_naive trick) and equi-joined back on the
    bucket — shuffle-on-key only, naturally gap-aware, one join for all
    lags. Pairs are a_source < b_source (the −k row carries the mirror).
    Moments are decimal sums (exact); pairs with fewer than 2 aligned
    buckets or a zero-variance side yield NULL.

    CANDIDATE LIMITING (the 100k-series story): the default bucket-only
    join enumerates every co-bucketed source pair — O(S²·T·lags) rows,
    fine for dashboards over dozens of series, a scale-killer at 10⁵+.
    Two bounds, composable with the same downstream math:
    * `pairs` — an explicit candidate list ((src_a, src_b) tuples or a
      DataFrame); the a side broadcast-joins the pair list FIRST, so
      the b join becomes an equi-join on (src_b, bucket) — candidate
      rows are O(|pairs|·T·lags), never S². The production path (pair
      lists come from topology, ownership, or a sketch prefilter).
    * `top_k_by_variance` — keep only the k highest-variance sources
      (one map-side agg + broadcast semi-join) and enumerate pairs
      among those: O(k²·T·lags) with k chosen by the caller. Flat
      series correlate with nothing actionable.

    Output: (src_a, src_b, lag, n, ccf)."""
    lags = sorted(set(int(k) for k in lags))
    step = int(bucket_seconds)
    if top_k_by_variance is not None and pairs is None:
        keep = top_variance_sources(
            bucketed, top_k_by_variance, value_col, source_col
        )
        bucketed = bucketed.join(F.broadcast(keep), source_col, "left_semi")
    a = bucketed.select(
        F.col(source_col).alias("src_a"),
        F.col(bucket_col).alias("bucket_s"),
        F.col(value_col).cast(_DEC).alias("xd"),
    )
    lag_arr = F.array(*[F.lit(k) for k in lags])
    b = bucketed.select(
        F.col(source_col).alias("src_b"),
        F.explode(lag_arr).alias("lag"),
        F.col(bucket_col).alias("_bs"),
        F.col(value_col).cast(_DEC).alias("yd"),
    ).select(
        "src_b", "lag",
        (F.col("_bs") + F.col("lag").cast("long") * F.lit(step)).alias("bucket_s"),
        "yd",
    )
    if pairs is not None:
        pair_df = _as_pairs_df(bucketed, pairs)
        # stamp each a row with its candidate partners, then join b on
        # BOTH (src_b, bucket_s) — the S² bucket grid never materializes
        a = a.join(F.broadcast(pair_df), "src_a")
        j = a.join(b, ["src_b", "bucket_s"])
    else:
        j = a.join(b, "bucket_s").filter(F.col("src_a") < F.col("src_b"))
    m = j.groupBy("src_a", "src_b", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xd").cast("double").alias("sx"),
        F.sum("yd").cast("double").alias("sy"),
        F.sum(F.col("xd") * F.col("xd")).cast("double").alias("sxx"),
        F.sum(F.col("yd") * F.col("yd")).cast("double").alias("syy"),
        F.sum(F.col("xd") * F.col("yd")).cast("double").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    vx = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = nd * F.col("syy") - F.col("sy") * F.col("sy")
    num = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    ccf = F.when(
        (nd > F.lit(1.0)) & (vx > F.lit(0.0)) & (vy > F.lit(0.0)),
        num / F.sqrt(vx * vy),
    )
    return m.select("src_a", "src_b", "lag", "n", ccf.alias("ccf"))


def stl_lite(
    bucketed: DataFrame,
    value_col: str = "val",
    source_col: str = "source",
    bucket_col: str = "bucket_s",
    period: int = 24,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Classical additive decomposition (the moving-average core of STL,
    without loess robustness passes) on a regular bucketed series:

      trend_t    = 2×p MA: (Σ_{j=-p/2..p/2} x_{t+j} − ½x_{t−p/2} − ½x_{t+p/2}) / p
      seasonal_φ = mean of (x − trend) per phase φ = (bucket/period) mod p,
                   centered so Σ_φ seasonal_φ = 0
      remainder  = x − trend − seasonal

    `period` must be even (the classical 2×p MA); rows whose centered MA
    window is incomplete (series edges) are dropped, as in
    statsmodels' `seasonal_decompose`. The detrended doubles are rounded
    to 6 dp (engine-identical floor rounding) before the decimal seasonal
    means so every re-aggregation stays exact; the (source × period)
    seasonal table and its per-source centering are broadcast joins.

    Output: (source, bucket_s, val, trend, seasonal, remainder)."""
    if period < 2 or period % 2:
        raise ValueError(f"period must be even and >= 2, got {period}")
    half = period // 2
    w = Window.partitionBy(source_col).orderBy(F.col(bucket_col))
    xd = F.col(value_col).cast(_DEC)
    full = F.sum(xd).over(w.rowsBetween(-half, half))
    lo = F.lag(xd, half).over(w)
    hi = F.lead(xd, half).over(w)
    cnt = F.count(F.lit(1)).over(w.rowsBetween(-half, half))
    trend = (
        (full - F.lit(0.5).cast("decimal(2,1)") * lo
         - F.lit(0.5).cast("decimal(2,1)") * hi).cast("double")
        / F.lit(float(period))
    )
    t = bucketed.select(
        F.col(source_col).alias("source"),
        F.col(bucket_col).alias("bucket_s"),
        F.col(value_col).alias("val"),
        F.when(
            lo.isNotNull() & hi.isNotNull() & (cnt == F.lit(period + 1)), trend
        ).alias("trend"),
    ).filter(F.col("trend").isNotNull())
    phase = (
        (F.col("bucket_s") / F.lit(bucket_seconds)).cast("long") % F.lit(period)
    ).alias("phase")
    det = t.select(
        "source", "bucket_s", "val", "trend", phase,
        _r6c(F.col("val") - F.col("trend")).cast(_DEC).alias("_dd"),
    )
    seas = det.groupBy("source", "phase").agg(
        (F.sum("_dd").cast("double") / F.count(F.lit(1)).cast("double")).alias("_sraw")
    )
    seas = seas.select(
        "source", "phase", _r6c(F.col("_sraw")).cast(_DEC).alias("_sr6")
    )
    center = seas.groupBy("source").agg(
        (F.sum("_sr6").cast("double") / F.count(F.lit(1)).cast("double")).alias("_c")
    )
    seas = (
        seas.join(F.broadcast(center), "source")
        .select(
            "source", "phase",
            (F.col("_sr6").cast("double") - F.col("_c")).alias("seasonal"),
        )
    )
    return det.join(F.broadcast(seas), ["source", "phase"]).select(
        "source", "bucket_s", "val",
        _r6c(F.col("trend")).alias("trend"),
        _r6c(F.col("seasonal")).alias("seasonal"),
        _r6c(F.col("val") - F.col("trend") - F.col("seasonal")).alias("remainder"),
    )


# Gaussian equiprobable breakpoints for SAX alphabets 3..8 (Lin et al.,
# "A Symbolic Representation of Time Series", DMKD 2003, Table 3),
# pre-rounded to 6 dp so both engines compare against identical literals.
_SAX_BREAKPOINTS: dict[int, tuple[float, ...]] = {
    3: (-0.430727, 0.430727),
    4: (-0.674490, 0.0, 0.674490),
    5: (-0.841621, -0.253347, 0.253347, 0.841621),
    6: (-0.967422, -0.430727, 0.0, 0.430727, 0.967422),
    7: (-1.067571, -0.565949, -0.180012, 0.180012, 0.565949, 1.067571),
    8: (-1.150349, -0.674490, -0.318639, 0.0, 0.318639, 0.674490, 1.150349),
}
_SAX_LETTERS = "abcdefgh"


def sax_symbols(
    df: DataFrame,
    segment: int = 16,
    alphabet: int = 4,
    value_col: str = "value",
    source_col: str = "source",
    order_cols: Sequence[str] = ("ts_s", "event_id"),
) -> DataFrame:
    """SAX symbolization (Lin et al. 2003): per series, PAA over
    fixed-width `segment`-point windows, z-normalized by the SERIES
    mean/std, mapped to `alphabet` letters at the Gaussian equiprobable
    breakpoints — the standard discretization feeding motif discovery /
    sequitur-style anomaly mining over metric streams.

    Cross-engine exactness: PAA means come from decimal sums; the series
    mean/std come from decimal raw moments (population std, the SAX
    convention); z is rounded to 6 dp before comparing against the 6-dp
    breakpoint literals, so the letter assignment is deterministic on
    both engines. Zero-variance series map every segment to the middle
    letter (z = 0).

    Scale shape: ONE pass over the input — one exchange + sort per
    series for the position row_number, then the (series, segment)
    groupBy carries decimal Σx and Σx² partials; the per-series moments
    are RE-AGGREGATED from the (tiny, segment-level) partials rather
    than a second scan of the raw table — exact, because decimal sums
    are associative. The segment frame is localCheckpointed so its two
    consumers (PAA rows, moments) don't each replay the window scan.
    Ragged tails (final segment shorter than `segment`) keep their true
    count in the PAA divisor.
    """
    if alphabet not in _SAX_BREAKPOINTS:
        raise ValueError(f"alphabet must be one of {sorted(_SAX_BREAKPOINTS)}")
    w = Window.partitionBy(source_col).orderBy(*[F.col(c) for c in order_cols])
    vd = F.col(value_col).cast(_DEC)
    pos = df.select(
        F.col(source_col).alias("source"),
        vd.alias("vd"),
        ((F.row_number().over(w) - 1) / F.lit(segment))
        .cast("bigint")
        .alias("segment"),
    )
    vdc = F.col("vd")
    seg = pos.groupBy("source", "segment").agg(
        F.count(F.lit(1)).alias("n_in_segment"),
        F.sum("vd").alias("_svd"),
        F.sum((vdc * vdc).cast("decimal(31,12)")).alias("_svd2"),
    )
    # segment-level partials are (series × segments) rows — model-sized;
    # cut the diamond so PAA and moments don't both replay the scan+sort
    seg = seg.localCheckpoint(eager=False)
    paa = seg.select(
        "source",
        "segment",
        "n_in_segment",
        (F.col("_svd").cast("double") / F.col("n_in_segment").cast("double")).alias(
            "_paa"
        ),
    )
    mom = seg.groupBy("source").agg(
        F.sum("n_in_segment").alias("_n"),
        F.sum("_svd").cast("double").alias("_sx"),
        F.sum("_svd2").cast("double").alias("_sxx"),
    )
    # population variance from raw moments; guard <= 0 (constant series)
    mu = F.col("_sx") / F.col("_n").cast("double")
    var = F.col("_sxx") / F.col("_n").cast("double") - mu * mu
    joined = paa.join(F.broadcast(mom), "source").withColumn(
        "z",
        _r6c(
            F.when(var > 0, (F.col("_paa") - mu) / F.sqrt(var)).otherwise(F.lit(0.0))
        ),
    )
    bps = _SAX_BREAKPOINTS[alphabet]
    idx = sum((F.col("z") >= F.lit(b)).cast("int") for b in bps)
    return joined.select(
        "source",
        "segment",
        "n_in_segment",
        _r6c(F.col("_paa")).alias("paa"),
        "z",
        F.substring(F.lit(_SAX_LETTERS[:alphabet]), idx + 1, 1).alias("symbol"),
    )
