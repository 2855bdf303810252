"""Column-expression ports of numalogic's stateless transforms & thresholds.

Each function reproduces the exact closed form of the reference class
(citations per function) as a JVM-side Catalyst expression — whole-stage
codegen, no Python in the hot path. Stateful (fitted) scalers live in
``functions/scalers.py``; shape-changing window kernels in
``operators/windows.py``.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, Window
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def log_transform(col: Column | str, add_factor: float = 2.0) -> Column:
    """log(x + k). Ref: transforms/_stateless.py:22-40 (LogTransformer)."""
    return F.log(_c(col) + F.lit(float(add_factor)))


def log_inverse(col: Column | str, add_factor: float = 2.0) -> Column:
    return F.exp(_c(col)) - F.lit(float(add_factor))


def static_power_transform(col: Column | str, n: float, add_factor: float = 0.0) -> Column:
    """(x + k)^n. Ref: transforms/_stateless.py:43-61 (StaticPowerTransformer)."""
    return F.pow(_c(col) + F.lit(float(add_factor)), F.lit(float(n)))


def static_power_inverse(col: Column | str, n: float, add_factor: float = 0.0) -> Column:
    return F.pow(_c(col), F.lit(1.0 / n)) - F.lit(float(add_factor))


def data_clipper(col: Column | str, lower: float | None = None, upper: float | None = None) -> Column:
    """Clip to [lower, upper]. Ref: transforms/_stateless.py:64-107 (DataClipper)."""
    if lower is None and upper is None:
        raise ValueError("At least one of lower or upper should be provided.")
    if lower is not None and upper is not None and lower > upper:
        raise ValueError("lower value should be less than or equal to upper value")
    out = _c(col)
    if lower is not None:
        out = F.greatest(out, F.lit(float(lower)))
    if upper is not None:
        out = F.least(out, F.lit(float(upper)))
    return out


def tanh_norm(col: Column | str, scale_factor: float = 10.0, smooth_factor: float = 10.0) -> Column:
    """scale * tanh(x / smooth). Ref: transforms/_postprocess.py:18-50 (TanhNorm)."""
    return F.lit(float(scale_factor)) * F.tanh(_c(col) / F.lit(float(smooth_factor)))


def sigmoid_norm(col: Column | str, scale_factor: float = 10.0, smooth_factor: float = 0.5) -> Column:
    """scale / (1 + exp(5 - smooth*x)). Ref: transforms/_postprocess.py:53-60 (SigmoidNorm)."""
    return F.lit(float(scale_factor)) / (
        F.lit(1.0) + F.exp(F.lit(5.0) - F.lit(float(smooth_factor)) * _c(col))
    )


def static_threshold_score(
    col: Column | str, upper_limit: float, outlier_score: float = 10.0, inlier_score: float = 0.5
) -> Column:
    """x >= limit → outlier_score else inlier_score.
    Ref: models/threshold/_static.py:18-65 (StaticThreshold.score_samples)."""
    if outlier_score < inlier_score:
        raise ValueError("Outlier score needs to be greater than inlier score")
    return F.when(_c(col) >= F.lit(float(upper_limit)), F.lit(float(outlier_score))).otherwise(
        F.lit(float(inlier_score))
    )


def sigmoid_threshold_score(
    col: Column | str, upper_limit: float, slope_factor: float = 5.0, score_limit: float = 10.0
) -> Column:
    """score_limit / (1 + exp(clip(-slope*pi*(x-limit), ±88.72))).
    Ref: models/threshold/_static.py:68-126 incl. the exact ±88.72 clip at :124-125."""
    coeff = slope_factor * math.pi
    exp_arg = -F.lit(coeff) * (_c(col) - F.lit(float(upper_limit)))
    clipped = F.least(F.greatest(exp_arg, F.lit(-88.72)), F.lit(88.72))
    return F.lit(float(score_limit)) / (F.lit(1.0) + F.exp(clipped))


def difference_transform(col: Column | str, order_by: list, partition_by: list | None = None) -> Column:
    """x[i] - x[i-1], first value backfilled with first non-null diff.
    Ref: transforms/_stateless.py:136-145 (DifferenceTransform: diff().bfill())."""
    w = Window.partitionBy(*(partition_by or [])).orderBy(*order_by)
    d = _c(col) - F.lag(_c(col)).over(w)
    bfill = F.first(d, ignorenulls=True).over(w.rowsBetween(0, Window.unboundedFollowing))
    return F.coalesce(d, bfill)


def tail_n(df, n: int, order_by: list, partition_by: list):
    """Keep last n rows per series (reference `.tail(window_size)`,
    udfs/tools.py:50-54). Per-group top-k via ranking window."""
    w = Window.partitionBy(*partition_by).orderBy(*[F.col(c).desc() for c in order_by])
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= n).drop("_rn")


def key_concat(*cols, sep: str = ":") -> Column:
    """Composite-key string, ':'.join(keys). Ref: udfs/preprocess.py:119."""
    return F.concat_ws(sep, *[_c(c) for c in cols])


def epoch_ms(ts_col: Column | str) -> Column:
    """Canonical epoch-ms int64 wire format. Ref: connectors/druid/_druid.py:195."""
    return (F.unix_timestamp(_c(ts_col)) * F.lit(1000)).cast("long")


def seeded_gaussian_noise(
    col: Column | str,
    id_col: Column | str,
    scale: float = 1e-8,
    positive_only: bool = True,
    seed: int = 42,
) -> Column:
    """x + |N(0, scale)| with row-stable randomness.
    Ref: transforms/_stateless.py:110-133 (GaussianNoiseAdder, seeded rng).

    Spark's randn(seed) depends on partitioning/row order, so exact
    reproducibility needs counter-based randomness: two uniforms from
    xxhash64(id, seed) → Box-Muller. Deterministic per row id under ANY
    shuffle — the distributed analog of the reference's seeded rng.
    """
    c, idc = _c(col), _c(id_col)
    h1 = F.xxhash64(idc, F.lit(seed))
    h2 = F.xxhash64(idc, F.lit(seed + 1))
    # map int64 hash → uniform (0,1]; shift into positive range first
    u1 = (F.shiftrightunsigned(h1, 11).cast("double") + F.lit(1.0)) / F.lit(float(1 << 53))
    u2 = F.shiftrightunsigned(h2, 11).cast("double") / F.lit(float(1 << 53))
    z = F.sqrt(F.lit(-2.0) * F.log(u1)) * F.cos(F.lit(2.0 * math.pi) * u2)
    noise = F.lit(float(scale)) * z
    if positive_only:
        noise = F.abs(noise)
    return c + noise


def impute_nan_inf(col: Column | str, fill: float = 0.0) -> Column:
    """fillna + replace(±inf). Ref: udfs/tools.py:52, trainer/_base.py:390-400."""
    c = _c(col)
    bad = F.isnan(c) | c.isNull() | (c == F.lit(float("inf"))) | (c == F.lit(float("-inf")))
    return F.when(bad, F.lit(float(fill))).otherwise(c)
