"""Window- and feature-aggregation kernels.

Ports of /root/reference/numalogic/tools/aggregators.py (aggregate_window,
aggregate_features), the EWM aggregator closed form
(transforms/_movavg.py:31-71), and the aggregation-method registry
(config/_config.py:103-112 AggMethod, config/factory.py:213-238).

Two forms are provided:
- numpy kernels (exact reference math) for use inside window pipelines;
- Column-expression builders for aggregating a Spark `array<float>` window
  column JVM-side (no Python) where a closed form exists.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# numpy kernels (reference-exact)
# --------------------------------------------------------------------------

def expmov_avg_np(arr: np.ndarray, beta: float, bias_correction: bool = True) -> float:
    """V = (1-β)·Σ β^(n-1-i)·x_i, optionally / (1-β^n).

    Ref: transforms/_movavg.py:31-71 (weights via decreasing powers of β).
    """
    if beta <= 0.0 or beta >= 1.0:
        raise ValueError("beta only accepts values between 0 and 1 (not inclusive)")
    arr = np.asarray(arr, dtype=float).reshape(-1)
    n = len(arr)
    weights = np.power(beta, np.arange(n - 1, -1, -1))
    v = (1.0 - beta) * float(weights @ arr)
    if bias_correction:
        v /= 1.0 - beta**n
    return v


_WINDOW_AGG_NP = {
    "MAX": lambda a, **k: np.max(a, axis=0),
    "MIN": lambda a, **k: np.min(a, axis=0),
    "MEAN": lambda a, **k: np.mean(a, axis=0),
    "EXP": lambda a, **k: np.apply_along_axis(expmov_avg_np, 0, a, **k),
    "WEIGHTED_AVG": lambda a, weights=None, **k: np.average(a, axis=0, weights=weights),
}


def aggregate_window_np(y: np.ndarray, method: str = "EXP", **kw) -> np.ndarray:
    """(seq_len, f) → (f,). Ref: tools/aggregators.py:9-13 + factory map."""
    if method not in _WINDOW_AGG_NP:
        raise ValueError(f"unknown window agg method: {method}")
    return np.asarray(_WINDOW_AGG_NP[method](y, **kw)).reshape(-1)


def aggregate_features_np(y: np.ndarray, method: str = "MEAN") -> np.ndarray:
    """(n, f) → (n, 1). Ref: tools/aggregators.py:16-20 (np.mean axis=1)."""
    fn = {"MEAN": np.mean, "MAX": np.max, "MIN": np.min}[method]
    return fn(y, axis=1, keepdims=True)


# --------------------------------------------------------------------------
# Column-expression forms over array<float> windows (JVM-side)
# --------------------------------------------------------------------------

def window_agg_expr(window_col: Column | str, method: str, beta: float = 0.5) -> Column:
    """Aggregate a 1-feature array<double> window column to a scalar.

    EXP uses the closed form via higher-order functions:
    (1-β) · Σ β^(n-1-i)·x_i / (1-β^n) — no UDF, stays in codegen.
    """
    c = F.col(window_col) if isinstance(window_col, str) else window_col
    if method == "MAX":
        return F.array_max(c)
    if method == "MIN":
        return F.array_min(c)
    if method == "MEAN":
        return F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x) / F.size(c)
    if method == "EXP":
        n = F.size(c)
        # Σ β^(n-1-i)·x_i via zip_with on the index sequence
        idx = F.sequence(F.lit(0), n - 1)
        weighted = F.zip_with(c, idx, lambda x, i: x * F.pow(F.lit(beta), (n - 1 - i).cast("double")))
        s = F.aggregate(weighted, F.lit(0.0), lambda acc, x: acc + x)
        return F.lit(1.0 - beta) * s / (F.lit(1.0) - F.pow(F.lit(beta), n.cast("double")))
    raise ValueError(f"unknown window agg method: {method}")


def feature_agg_expr(cols: list[Column | str], method: str = "MEAN") -> Column:
    """Unified score across feature columns (reference aggregate_features).

    MEAN/MAX/MIN over a row's feature values → one scalar column.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    arr = F.array(*cs)
    if method == "MEAN":
        return F.aggregate(arr, F.lit(0.0), lambda a, x: a + x) / F.lit(float(len(cs)))
    if method == "MAX":
        return F.greatest(*cs) if len(cs) > 1 else cs[0]
    if method == "MIN":
        return F.least(*cs) if len(cs) > 1 else cs[0]
    raise ValueError(f"unknown feature agg method: {method}")
