"""Robust covariance (deterministic FastMCD) + RobustMahalanobisThreshold.

Spark-first reimplementation of the reference's RobustMahalanobisThreshold
(models/threshold/_mahalanobis.py:188-230, registered in ThresholdFactory,
config/factory.py:112-119), which wraps sklearn.covariance.MinCovDet.

Design:
- **Fit is per-series and driver-free**: one `applyInPandas` task per
  series runs a DETERMINISTIC FastMCD (Rousseeuw & Van Driessen 1999:
  seeded PCG64 elemental subsets + C-steps to convergence, keep the
  lowest-determinant h-subset), then sklearn's two post-steps —
  chi2-median consistency correction and 97.5 %-quantile reweighting — so
  the estimate matches MinCovDet's statistical contract. Rows are sorted
  by an explicit order column inside the kernel, so the fit is
  order-independent under any shuffle and replayable bit-exactly by an
  oracle running the same numpy function on the same rows.
- **Scoring is relational**: the fitted (location, precision, threshold)
  frame is tiny (one row per series) and broadcast back; the Mahalanobis
  quadratic form expands to a d² -term column expression (d = number of
  features, known at plan time), one projection, no Python — the same
  lowering discipline as mahalanobis_scores_2f.
- chi2 quantiles come from a pure-numpy regularized incomplete gamma
  (series + continued fraction) + bisection — no scipy in the image.

The threshold contract matches the base MahalanobisThreshold:
thr = mean(md) + k·std_pop(md) on the training distances with
k = 1/sqrt(max_outlier_prob) (Chebyshev), score = md/thr, predict =
md >= thr (_mahalanobis.py:60-185).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# chi-squared quantiles without scipy
# ---------------------------------------------------------------------------


def _gammainc_p(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a, x) — series for x < a+1,
    continued fraction (Lentz) otherwise. Numerical Recipes 6.2 shapes."""
    if x <= 0.0:
        return 0.0
    lg = math.lgamma(a)
    if x < a + 1.0:
        term = 1.0 / a
        total = term
        n = a
        for _ in range(500):
            n += 1.0
            term *= x / n
            total += term
            if abs(term) < abs(total) * 1e-16:
                break
        return total * math.exp(-x + a * math.log(x) - lg)
    # continued fraction for Q(a, x)
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-16:
            break
    q = math.exp(-x + a * math.log(x) - lg) * h
    return 1.0 - q


def chi2_ppf(p: float, dof: int) -> float:
    """Inverse chi2 CDF by bisection on P(dof/2, x/2) — deterministic,
    ~1e-12 relative, plenty for MCD's correction/reweight cutoffs."""
    if not 0.0 < p < 1.0:
        raise ValueError("p must be in (0, 1)")
    a = dof / 2.0
    lo, hi = 0.0, float(dof) + 10.0
    while _gammainc_p(a, hi / 2.0) < p:
        hi *= 2.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if _gammainc_p(a, mid / 2.0) < p:
            lo = mid
        else:
            hi = mid
        if hi - lo <= 1e-13 * max(hi, 1.0):
            break
    return 0.5 * (lo + hi)


# ---------------------------------------------------------------------------
# deterministic FastMCD
# ---------------------------------------------------------------------------


def _moments(xs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """ML (ddof=0) mean/cov — sklearn's empirical_covariance inside MCD."""
    mu = xs.mean(axis=0)
    d = xs - mu
    return mu, d.T @ d / len(xs)


def _sq_dists(x: np.ndarray, mu: np.ndarray, cov: np.ndarray) -> np.ndarray:
    prec = np.linalg.pinv(np.atleast_2d(cov))
    d = x - mu
    return np.einsum("ij,jk,ik->i", d, prec, d)


def mincovdet_fit(
    x: np.ndarray,
    support_fraction: float | None = 0.7,
    seed: int = 42,
    n_trials: int = 30,
    max_csteps: int = 100,
) -> dict:
    """Deterministic MinCovDet: FastMCD raw estimate + consistency
    correction + reweighting (sklearn.covariance.MinCovDet's pipeline with
    a seeded, platform-stable subset search instead of sklearn's RNG).

    Returns dict(location, covariance, precision, support, raw_location,
    raw_covariance). `x` must be (n, d) with n > d; callers are expected
    to pass rows in a canonical order (the Spark kernel sorts first) so
    the fit is replayable.
    """
    x = np.asarray(x, dtype=np.float64)
    n, d = x.shape
    if n <= d:
        raise ValueError(f"need more samples ({n}) than features ({d})")
    if support_fraction is None:
        h = (n + d + 1) // 2
    else:
        if not 0.0 < support_fraction <= 1.0:
            raise ValueError("support_fraction must be in (0, 1]")
        h = int(math.ceil(support_fraction * n))
    h = min(max(h, d + 1), n)

    if h == n:  # degenerate request: plain ML moments
        mu, cov = _moments(x)
        best = (0.0, mu, cov, np.arange(n))
    else:
        rng = np.random.default_rng(seed)
        best: tuple | None = None
        for _ in range(n_trials):
            idx = rng.choice(n, size=d + 1, replace=False)
            mu, cov = _moments(x[idx])
            prev_logdet = math.inf
            support = idx
            for _ in range(max_csteps):
                dist = _sq_dists(x, mu, cov)
                # stable argsort: ties resolve by row index → deterministic
                support = np.argsort(dist, kind="stable")[:h]
                mu, cov = _moments(x[support])
                sign, logdet = np.linalg.slogdet(cov)
                cur = logdet if sign > 0 else -math.inf
                if cur == -math.inf or prev_logdet - cur < 1e-12:
                    prev_logdet = min(prev_logdet, cur)
                    break
                prev_logdet = cur
            if best is None or prev_logdet < best[0]:
                best = (prev_logdet, mu, cov, support)
            if best[0] == -math.inf:  # exact fit — cannot improve
                break

    _, raw_loc, raw_cov, support = best
    # consistency correction (sklearn correct_covariance): scale so the
    # median squared distance matches the chi2 median
    dist = _sq_dists(x, raw_loc, raw_cov)
    med = float(np.median(dist))
    corr = med / chi2_ppf(0.5, d) if med > 0 else 1.0
    cov_c = raw_cov * corr
    dist_c = dist / corr if corr > 0 else dist
    # reweighting (sklearn reweight_covariance): keep points inside the
    # 97.5% chi2 ball, refit ML moments on them
    mask = dist_c < chi2_ppf(0.975, d)
    if int(mask.sum()) > d:
        loc, cov = _moments(x[mask])
    else:  # pathological series: fall back to the corrected raw estimate
        loc, cov, mask = raw_loc, cov_c, np.zeros(n, dtype=bool)
    return {
        "location": loc,
        "covariance": cov,
        "precision": np.linalg.pinv(np.atleast_2d(cov)),
        "support": mask,
        "raw_location": raw_loc,
        "raw_covariance": raw_cov,
    }


def robust_mahalanobis_fit_np(
    x: np.ndarray,
    max_outlier_prob: float = 0.1,
    support_fraction: float | None = 0.7,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray, float]:
    """(location, precision, md_threshold) — the full
    RobustMahalanobisThreshold.fit (_mahalanobis.py:203-239): MCD fit,
    md = sqrt((x-loc)ᵀ P (x-loc)), thr = mean(md) + k·std_pop(md).
    Shared verbatim by the Spark kernel and the DuckDB oracle generator,
    which is what makes the driver hash gate exact."""
    if not 0.0 < max_outlier_prob < 1.0:
        raise ValueError("max_outlier_prob should be in range (0, 1)")
    k = 1.0 / math.sqrt(max_outlier_prob)
    mcd = mincovdet_fit(x, support_fraction=support_fraction, seed=seed)
    loc, prec = mcd["location"], mcd["precision"]
    d = np.asarray(x, dtype=np.float64) - loc
    md = np.sqrt(np.maximum(np.einsum("ij,jk,ik->i", d, prec, d), 0.0))
    thr = float(md.mean() + k * md.std())
    return loc, prec, thr


# ---------------------------------------------------------------------------
# Spark fit / score
# ---------------------------------------------------------------------------


def fit_robust_mahalanobis(
    df: DataFrame,
    cols: list[str],
    by: list[str] | None = None,
    max_outlier_prob: float = 0.1,
    support_fraction: float | None = 0.7,
    seed: int = 42,
    order_by: list[str] | None = None,
) -> DataFrame:
    """Per-group MCD fit → one tiny stats row per group:
    (by..., loc array<double>[d], prec array<double>[d·d] row-major,
    md_thresh). Groups with n <= d rows emit nothing (covariance
    undefined — the P5 min-size guard discipline).

    `order_by` fixes the row order the kernel fits over (default: the
    feature columns themselves) so the result is independent of shuffle
    order; at 10^12 rows the fit parallelism is the series count, the
    same unit of work as every per-series kernel in this engine."""
    if not by:  # global fit: constant group key, dropped on the way out
        return fit_robust_mahalanobis(
            df.withColumn("__g", F.lit(0)), cols, by=["__g"],
            max_outlier_prob=max_outlier_prob,
            support_fraction=support_fraction, seed=seed, order_by=order_by,
        ).drop("__g")
    keys = list(by)
    order_cols = list(order_by or cols)
    fields = [T.StructField(f.name, f.dataType) for f in df.select(*keys).schema.fields]
    fields += [
        T.StructField("loc", T.ArrayType(T.DoubleType())),
        T.StructField("prec", T.ArrayType(T.DoubleType())),
        T.StructField("md_thresh", T.DoubleType()),
    ]
    schema = T.StructType(fields)
    d = len(cols)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        x = pdf[cols].to_numpy(dtype=np.float64)
        if len(x) <= d:
            if keys == ["__g"]:
                # global fit over a too-small input: raise like the
                # reference's fit validation instead of emitting an empty
                # model that would silently score zero rows
                raise ValueError(
                    f"need more samples ({len(x)}) than features ({d})"
                )
            return pd.DataFrame({f.name: pd.Series([], dtype=object) for f in fields})
        loc, prec, thr = robust_mahalanobis_fit_np(
            x, max_outlier_prob=max_outlier_prob,
            support_fraction=support_fraction, seed=seed,
        )
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row["loc"] = [loc.tolist()]
        row["prec"] = [prec.reshape(-1).tolist()]
        row["md_thresh"] = [thr]
        return pd.DataFrame(row)

    return df.groupBy(*keys).applyInPandas(kernel, schema)


def score_robust_mahalanobis(
    df: DataFrame, stats: DataFrame, cols: list[str], by: list[str] | None = None
) -> DataFrame:
    """Broadcast the fitted stats and expand the quadratic form to a d²
    -term expression: md = sqrt(max(Σᵢⱼ Pᵢⱼ·dcᵢ·dcⱼ, 0)), score = md/thr,
    pred = md >= thr. i-major left-to-right summation — the canonical
    association an oracle replicates for bit-identical doubles.

    Grouped scoring uses a LEFT join: a series too small to fit (n <= d —
    the fit emits no stats row) keeps its rows with NULL md/score/pred
    instead of silently vanishing from the output (an inner join would
    shrink downstream counts with no error). With by=None an unfittable
    input raises in fit, so the cross join never sees empty stats."""
    if by:
        out = df.join(F.broadcast(stats), by, "left")
    else:
        out = df.crossJoin(F.broadcast(stats))
    d = len(cols)
    dc = [
        F.col(c).cast("double") - F.element_at(F.col("loc"), i + 1)
        for i, c in enumerate(cols)
    ]
    md2 = None
    for i in range(d):
        for j in range(d):
            term = F.element_at(F.col("prec"), i * d + j + 1) * dc[i] * dc[j]
            md2 = term if md2 is None else md2 + term
    # explicit unfitted guard: greatest(NULL, 0.0) is 0.0 in Spark (greatest
    # skips nulls), so without it an unfitted series would score md=0 — a
    # perfect inlier — instead of NULL
    fitted = F.col("md_thresh").isNotNull()
    md = F.when(fitted, F.sqrt(F.greatest(md2, F.lit(0.0))))
    thr = F.col("md_thresh")
    return (
        out.withColumn("md", md)
        .withColumn(
            "md_score",
            F.when(fitted, F.col("md") / F.greatest(thr, F.lit(1e-12))),
        )
        .withColumn("md_pred", (F.col("md") >= thr).cast("long"))
        .drop("loc", "prec", "md_thresh")
    )
