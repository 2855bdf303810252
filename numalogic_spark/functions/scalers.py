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
# StdDevThreshold: thr = mean + k*std_pop (>= min_threshold); score = x/thr;
# predict = x >= thr
# --------------------------------------------------------------------------

def fit_stddev_threshold(
    df: DataFrame,
    cols: list[str],
    by: list[str] | None = None,
    std_factor: float = 3.0,
    min_threshold: float = 0.0,
) -> DataFrame:
    aggs = [
        F.greatest(
            F.avg(c) + F.lit(std_factor) * F.stddev_pop(c), F.lit(float(min_threshold))
        ).alias(f"{c}__thr")
        for c in cols
    ]
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
