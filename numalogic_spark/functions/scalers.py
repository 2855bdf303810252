"""Fitted (stateful) scalers and threshold models as DataFrame plans.

The reference fits sklearn-style estimators on a training matrix and stores
them in a registry (redis_registry.py); the Spark-native equivalent is:
fit = one aggregation producing a small stats DataFrame, transform/score =
broadcast-join the stats back and apply the closed-form column expression.
Fit statistics are computed ONCE and broadcast (never re-derived per
partition) so distributed aggregation order cannot perturb results —
SURVEY §7.2 "hard parts (a)".

Ports (formula citations):
- TanhScaler            transforms/_scaler.py:27-74
- PercentileScaler      transforms/_scaler.py:77-141
- StdDevThreshold       models/threshold/_std.py:19-73
- MaxPercentileThreshold models/threshold/_median.py:13-66
- MahalanobisThreshold  models/threshold/_mahalanobis.py:28-185
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _join_stats(df: DataFrame, stats: DataFrame, by: list[str] | None) -> DataFrame:
    """Broadcast the (tiny) fitted-stats frame back onto the data."""
    if by:
        return df.join(F.broadcast(stats), by)
    return df.crossJoin(F.broadcast(stats))


def _decimal_moments(c: str):
    """(mean, std_pop) agg expressions from exact decimal(20,4) sums —
    order-independent under distributed aggregation, so fitted stats are
    bit-reproducible across engines/runs (the cross-engine hash-gate
    discipline). The greatest(...,0) clamp: constant series cancel to a
    tiny NEGATIVE variance in float math, which would sqrt to NaN.
    Shared by every decimal-stat fit so a precision change (e.g. widening
    the decimal) cannot silently diverge one of them."""
    d = F.col(c).cast("decimal(20,4)")
    n = F.count(d)  # non-null count, like avg/stddev_pop
    s1 = F.sum(d).cast("double")
    s2 = F.sum(d * d).cast("double")
    mu = s1 / n
    sigma = F.sqrt(F.greatest(s2 / n - (s1 / n) * (s1 / n), F.lit(0.0)))
    return mu, sigma


# --------------------------------------------------------------------------
# TanhScaler: 0.5 * (tanh(coeff * (x - mean) / std) + 1); std := 1 where
# max(x)-min(x) < eps (constant feature guard, _scaler.py:72-74)
# --------------------------------------------------------------------------

def fit_tanh_scaler(
    df: DataFrame, cols: list[str], by: list[str] | None = None, eps: float = 1e-10
) -> DataFrame:
    aggs = []
    for c in cols:
        std = F.when(F.max(c) - F.min(c) < F.lit(eps), F.lit(1.0)).otherwise(F.stddev_pop(c))
        aggs += [F.avg(c).alias(f"{c}__mean"), std.alias(f"{c}__std")]
    return df.groupBy(*(by or [])).agg(*aggs)


def transform_tanh_scaler(
    df: DataFrame, stats: DataFrame, cols: list[str], by: list[str] | None = None, coeff: float = 0.2
) -> DataFrame:
    out = _join_stats(df, stats, by)
    for c in cols:
        z = (F.col(c) - F.col(f"{c}__mean")) / F.col(f"{c}__std")
        out = out.withColumn(f"{c}__scaled", F.lit(0.5) * (F.tanh(F.lit(coeff) * z) + F.lit(1.0)))
    return out.drop(*[f"{c}__mean" for c in cols], *[f"{c}__std" for c in cols])


# --------------------------------------------------------------------------
# PercentileScaler: fit clips to [p_min, p_max] percentiles (upper falls back
# to max when the range <= eps), then MinMax-scales; transform does NOT clip
# (tx.transform on raw x, _scaler.py:140-141 — faithful to the reference).
# --------------------------------------------------------------------------

def fit_percentile_scaler(
    df: DataFrame,
    cols: list[str],
    by: list[str] | None = None,
    max_percentile: float = 99.0,
    min_percentile: float | None = None,
    eps: float = 1e-2,
) -> DataFrame:
    aggs = []
    for c in cols:
        hi_px = F.percentile(F.col(c), F.lit(max_percentile / 100.0))
        lo = (
            F.min(c)
            if min_percentile is None
            else F.percentile(F.col(c), F.lit(min_percentile / 100.0))
        )
        hi = F.when(hi_px - lo <= F.lit(eps), F.max(c)).otherwise(hi_px)
        aggs += [lo.alias(f"{c}__lo"), hi.alias(f"{c}__hi")]
    return df.groupBy(*(by or [])).agg(*aggs)


def transform_percentile_scaler(
    df: DataFrame, stats: DataFrame, cols: list[str], by: list[str] | None = None
) -> DataFrame:
    out = _join_stats(df, stats, by)
    for c in cols:
        rng = F.col(f"{c}__hi") - F.col(f"{c}__lo")
        # sklearn MinMaxScaler: zero range → scale 1 (shift only)
        scaled = F.when(rng == 0, F.col(c) - F.col(f"{c}__lo")).otherwise(
            (F.col(c) - F.col(f"{c}__lo")) / rng
        )
        out = out.withColumn(f"{c}__scaled", scaled)
    return out.drop(*[f"{c}__lo" for c in cols], *[f"{c}__hi" for c in cols])


# --------------------------------------------------------------------------
# sklearn-preprocessing scalers (PreprocessFactory names the four directly,
# config/factory.py:45,59-63, and reference configs use them:
# tests/udfs/resources/_config2.yaml). All are affine per-column maps
# out = (x - center)/scale + offset with a 2-stat (or 0/1-stat) fit, so one
# generic transform applies them all; fitted frames stay model-sized and
# broadcast. Zero-spread features map scale -> 1 (shift-only), sklearn's
# _handle_zeros_in_scale behavior for exactly-constant columns.
# --------------------------------------------------------------------------

def _affine_cols(c: str) -> tuple[str, str, str]:
    return f"{c}__center", f"{c}__scale", f"{c}__offset"


def _nz(scale):
    """sklearn _handle_zeros_in_scale for exactly-constant features."""
    return F.when(scale == 0.0, F.lit(1.0)).otherwise(scale)


def fit_standard_scaler(
    df: DataFrame,
    cols: list[str],
    by: list[str] | None = None,
    with_mean: bool = True,
    with_std: bool = True,
    decimal_stats: bool = False,
) -> DataFrame:
    """sklearn StandardScaler: center = mean, scale = std_pop (ddof=0).

    `decimal_stats` computes the moments from exact decimal(20,4) sums —
    order-independent under distributed aggregation, the discipline the
    oracle-gated queries need (same trick as fit_stddev_threshold)."""
    aggs = []
    for c in cols:
        mu, sigma = _decimal_moments(c) if decimal_stats else (F.avg(c), F.stddev_pop(c))
        ctr, scl, off = _affine_cols(c)
        aggs += [
            (mu if with_mean else F.lit(0.0)).alias(ctr),
            (_nz(sigma) if with_std else F.lit(1.0)).alias(scl),
            F.lit(0.0).alias(off),
        ]
    return df.groupBy(*(by or [])).agg(*aggs)


def fit_minmax_scaler(
    df: DataFrame,
    cols: list[str],
    by: list[str] | None = None,
    feature_range: tuple[float, float] = (0.0, 1.0),
) -> DataFrame:
    """sklearn MinMaxScaler: x -> (x - min)·(b-a)/(max-min) + a, expressed
    in divide form as center = min, scale = (max-min)/(b-a), offset = a."""
    a, b = float(feature_range[0]), float(feature_range[1])
    if b <= a:
        raise ValueError(f"feature_range max must exceed min, got {feature_range}")
    aggs = []
    for c in cols:
        ctr, scl, off = _affine_cols(c)
        aggs += [
            F.min(c).alias(ctr),
            (_nz(F.max(c) - F.min(c)) / F.lit(b - a)).alias(scl),
            F.lit(a).alias(off),
        ]
    return df.groupBy(*(by or [])).agg(*aggs)


def fit_maxabs_scaler(
    df: DataFrame, cols: list[str], by: list[str] | None = None
) -> DataFrame:
    """sklearn MaxAbsScaler: x -> x / max(|x|); no centering (sparse-safe
    in sklearn; here it just means center = 0)."""
    aggs = []
    for c in cols:
        ctr, scl, off = _affine_cols(c)
        aggs += [
            F.lit(0.0).alias(ctr),
            _nz(F.max(F.abs(F.col(c)))).alias(scl),
            F.lit(0.0).alias(off),
        ]
    return df.groupBy(*(by or [])).agg(*aggs)


def fit_robust_scaler(
    df: DataFrame,
    cols: list[str],
    by: list[str] | None = None,
    with_centering: bool = True,
    with_scaling: bool = True,
    quantile_range: tuple[float, float] = (25.0, 75.0),
) -> DataFrame:
    """sklearn RobustScaler: center = median, scale = IQR (q_hi - q_lo).

    Percentiles via Spark's exact `percentile` (linear interpolation —
    numpy/np.percentile and DuckDB quantile_cont semantics), NOT
    percentile_approx: the fitted stats must be engine-reproducible for the
    hash gate, and an exact single-pass percentile over a per-group
    aggregation is cheap at any corpus size (the stats frame stays tiny)."""
    q_lo, q_hi = float(quantile_range[0]) / 100.0, float(quantile_range[1]) / 100.0
    if not 0.0 <= q_lo < q_hi <= 1.0:
        raise ValueError(f"invalid quantile_range {quantile_range}")
    aggs = []
    for c in cols:
        ctr, scl, off = _affine_cols(c)
        med = F.percentile(F.col(c), F.lit(0.5))
        iqr = F.percentile(F.col(c), F.lit(q_hi)) - F.percentile(F.col(c), F.lit(q_lo))
        aggs += [
            (med if with_centering else F.lit(0.0)).alias(ctr),
            (_nz(iqr) if with_scaling else F.lit(1.0)).alias(scl),
            F.lit(0.0).alias(off),
        ]
    return df.groupBy(*(by or [])).agg(*aggs)


def transform_affine_scaler(
    df: DataFrame,
    stats: DataFrame,
    cols: list[str],
    by: list[str] | None = None,
    suffix: str = "__scaled",
) -> DataFrame:
    """Apply any fitted affine scaler: out = (x - center)/scale + offset.
    One broadcast join + one projection regardless of how many columns or
    which scaler produced the stats."""
    out = _join_stats(df, stats, by)
    drop = []
    for c in cols:
        ctr, scl, off = _affine_cols(c)
        out = out.withColumn(
            f"{c}{suffix}", (F.col(c) - F.col(ctr)) / F.col(scl) + F.col(off)
        )
        drop += [ctr, scl, off]
    return out.drop(*drop)


def inverse_affine_scaler(
    df: DataFrame,
    stats: DataFrame,
    cols: list[str],
    by: list[str] | None = None,
    suffix: str = "__orig",
) -> DataFrame:
    """Inverse map x = (y - offset)·scale + center (sklearn
    inverse_transform parity; reference pipelines invert scalers after
    reconstruction, e.g. transforms/_scaler.py round-trips)."""
    out = _join_stats(df, stats, by)
    drop = []
    for c in cols:
        ctr, scl, off = _affine_cols(c)
        out = out.withColumn(
            f"{c}{suffix}", (F.col(c) - F.col(off)) * F.col(scl) + F.col(ctr)
        )
        drop += [ctr, scl, off]
    return out.drop(*drop)


# --------------------------------------------------------------------------
# StdDevThreshold: thr = mean + k*std_pop (>= min_threshold); score = x/thr;
# predict = x >= thr
# --------------------------------------------------------------------------

def fit_stddev_threshold(
    df: DataFrame,
    cols: list[str],
    by: list[str] | None = None,
    std_factor: float = 3.0,
    min_threshold: float = 0.0,
    decimal_stats: bool = False,
) -> DataFrame:
    """thr = mean + k·std_pop (floored at min_threshold) per group.

    `decimal_stats` computes the moments via exact decimal(20,4) sums —
    order-independent under distributed aggregation, so the fitted
    threshold is bit-reproducible across engines/runs (the oracle-gated
    backtest path); the default uses Spark's native avg/stddev_pop."""
    aggs = []
    for c in cols:
        mu, sigma = _decimal_moments(c) if decimal_stats else (F.avg(c), F.stddev_pop(c))
        aggs.append(
            F.greatest(mu + F.lit(std_factor) * sigma, F.lit(float(min_threshold))).alias(
                f"{c}__thr"
            )
        )
    return df.groupBy(*(by or [])).agg(*aggs)


def score_threshold(
    df: DataFrame, stats: DataFrame, cols: list[str], by: list[str] | None = None
) -> DataFrame:
    """score = x / thr, predict = int(x >= thr) — shared by StdDev /
    MaxPercentile threshold models.

    The divisor is floored at 1e-12: with min_threshold=0 a constant-zero
    series fits thr=0 and x/thr would silently emit NULL/NaN scores; the
    floor makes such a series score 0 (x=0) instead of NaN while leaving
    every realistic threshold untouched."""
    out = _join_stats(df, stats, by)
    for c in cols:
        thr = F.greatest(F.col(f"{c}__thr"), F.lit(1e-12))
        out = out.withColumn(f"{c}__score", F.col(c) / thr)
        out = out.withColumn(f"{c}__pred", (F.col(c) >= F.col(f"{c}__thr")).cast("int"))
    return out.drop(*[f"{c}__thr" for c in cols])


# --------------------------------------------------------------------------
# MaxPercentileThreshold: thr = percentile(x, p) (>= min_threshold)
# --------------------------------------------------------------------------

def fit_max_percentile_threshold(
    df: DataFrame,
    cols: list[str],
    by: list[str] | None = None,
    max_inlier_percentile: float = 96.0,
    min_threshold: float = 1e-4,
) -> DataFrame:
    aggs = [
        F.greatest(
            F.percentile(F.col(c), F.lit(max_inlier_percentile / 100.0)),
            F.lit(float(min_threshold)),
        ).alias(f"{c}__thr")
        for c in cols
    ]
    return df.groupBy(*(by or [])).agg(*aggs)


def mahalanobis_scores_2f(
    df: DataFrame,
    f0_col: str,
    f1_col: str,
    by: str = "source",
    max_outlier_prob: float = 0.1,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Closed-form 2-feature Mahalanobis fit-and-score as pure column
    expressions — the d=2 lowering of `mahalanobis_scores` (2×2 covariance
    inverts in closed form, so no applyInPandas task per series and no
    Python anywhere; the scale unit stops being "one series per task").

    Determinism contract (what makes this DuckDB-oracle-exact):
    - f0/f1 must be INTEGER-valued columns (quantize upstream) so every
      moment is an exact integer sum — order-independent under distributed
      aggregation;
    - distances are quantized to 6dp integers before the threshold fit, so
      the mean/std of md are exact sums too;
    - every double expression is written in one canonical form replicated
      verbatim by the oracle SQL.

    Same statistical contract as the kernel path: cov with ddof=1,
    thr = mean(md) + k·std_pop(md), k = 1/sqrt(max_outlier_prob)
    (ref: models/threshold/_mahalanobis.py:28-185).
    """
    import math

    if not 0.0 < max_outlier_prob < 1.0:
        raise ValueError("max_outlier_prob should be in range (0, 1)")
    k = 1.0 / math.sqrt(max_outlier_prob)
    keep_cols = keep_cols or []
    x0, x1 = F.col(f0_col).cast("long"), F.col(f1_col).cast("long")
    stats = df.groupBy(by).agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum(x0).cast("double").alias("_s1"),
        F.sum(x1).cast("double").alias("_s2"),
        F.sum(x0 * x0).cast("double").alias("_s11"),
        F.sum(x0 * x1).cast("double").alias("_s12"),
        F.sum(x1 * x1).cast("double").alias("_s22"),
    ).filter(F.col("_n") >= 2)
    j = df.join(F.broadcast(stats), by)
    n, s1, s2 = F.col("_n"), F.col("_s1"), F.col("_s2")
    c00 = (F.col("_s11") - s1 * s1 / n) / (n - F.lit(1.0))
    c01 = (F.col("_s12") - s1 * s2 / n) / (n - F.lit(1.0))
    c11 = (F.col("_s22") - s2 * s2 / n) / (n - F.lit(1.0))
    d0 = x0.cast("double") - s1 / n
    d1 = x1.cast("double") - s2 / n
    det = c00 * c11 - c01 * c01
    md2 = (d0 * d0 * c11 - F.lit(2.0) * d0 * d1 * c01 + d1 * d1 * c00) / det
    md = F.when(det <= F.lit(0.0), F.lit(0.0)).otherwise(
        F.sqrt(F.greatest(md2, F.lit(0.0)))
    )
    scored = j.select(by, *keep_cols, md.alias("md")).withColumn(
        "_q", F.floor(F.col("md") * F.lit(1000000.0) + F.lit(0.5))
    )
    thr_stats = scored.groupBy(by).agg(
        F.count(F.lit(1)).cast("double").alias("_qn"),
        F.sum("_q").cast("double").alias("_q1"),
        F.sum(F.col("_q") * F.col("_q")).cast("double").alias("_q2"),
    )
    out = scored.join(F.broadcast(thr_stats), by)
    qn, q1, q2 = F.col("_qn"), F.col("_q1"), F.col("_q2")
    thr = (
        q1 / qn + F.lit(k) * F.sqrt(F.greatest(q2 / qn - (q1 / qn) * (q1 / qn), F.lit(0.0)))
    ) / F.lit(1000000.0)
    # score divisor floored at 1e-12: a fully degenerate series (det<=0 on
    # every row → md=0 everywhere) fits thr=0 and md/thr would be NULL
    return out.select(
        by,
        *keep_cols,
        "md",
        (F.col("md") / F.greatest(thr, F.lit(1e-12))).alias("md_score"),
        (F.col("md") >= thr).cast("long").alias("md_pred"),
    )


# --------------------------------------------------------------------------
# MahalanobisThreshold — needs matrix math per series → applyInPandas kernel
# (vectorized numpy; one task per series, the reference's own unit of work).
# --------------------------------------------------------------------------

def mahalanobis_scores(
    df: DataFrame,
    feature_cols: list[str],
    by: str = "source",
    max_outlier_prob: float = 0.1,
    id_col: str = "event_ts",
) -> DataFrame:
    """Fit-and-score per group: md = sqrt(diag((x-μ) Σ⁺ (x-μ)ᵀ)),
    thr = mean(md) + k·std_pop(md) with k = 1/sqrt(p) (Chebyshev),
    score = md/thr, predict = md >= thr.
    """
    if not 0.0 < max_outlier_prob < 1.0:
        raise ValueError("max_outlier_prob should be in range (0, 1)")
    k = 1.0 / np.sqrt(max_outlier_prob)
    schema = T.StructType(
        [
            T.StructField(by, T.StringType()),
            T.StructField(id_col, T.TimestampType()),
            T.StructField("md", T.DoubleType()),
            T.StructField("md_score", T.DoubleType()),
            T.StructField("md_pred", T.IntegerType()),
        ]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[feature_cols].to_numpy(dtype=float)
        if len(x) < 2:
            # a 1-row series has no covariance (np.cov ddof=1 → NaN → pinv
            # LinAlgError would kill the whole stage); emit nothing, the
            # engine-level analog of the min-size guard (P5)
            return pd.DataFrame(
                {
                    by: pd.Series([], dtype=object),
                    id_col: pd.Series([], dtype="datetime64[ns]"),
                    "md": pd.Series([], dtype=float),
                    "md_score": pd.Series([], dtype=float),
                    "md_pred": pd.Series([], dtype="int32"),
                }
            )
        mu = x.mean(axis=0)
        cov = np.cov(x, rowvar=False)
        cov_inv = np.linalg.pinv(np.atleast_2d(cov))
        d = x - mu
        md = np.sqrt(np.einsum("ij,jk,ik->i", d, cov_inv, d))
        thr = md.mean() + k * md.std()
        return pd.DataFrame(
            {
                by: pdf[by].to_numpy(),
                id_col: pdf[id_col].to_numpy(),
                "md": md,
                "md_score": md / thr,
                "md_pred": (md >= thr).astype(np.int32),
            }
        )

    return df.groupBy(by).applyInPandas(kernel, schema)
