"""Synthetic time-series + anomaly injection (reference parity).

Ports the semantics of numalogic's synthetic subsystem:
- SyntheticTSGenerator: seeded trend + seasonality + noise per series
  (synthetic/timeseries.py:76-112, seeded rng at :74)
- AnomalyGenerator: scale a contiguous window of a series by an impact
  factor (synthetic/anomalies.py, injected anomalies are multiplicative
  bumps over `anomaly_ratio` of the rows; merge at :137-141)

Deterministic (seed param) and vectorized; emits a Spark DataFrame via the
same pandas/Arrow path as datagen.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def gen_timeseries_pandas(
    n_rows: int = 1000,
    n_series: int = 3,
    freq_s: int = 60,
    seed: int = 42,
    trend: float = 0.01,
    season_period: int = 288,
    noise: float = 0.5,
) -> pd.DataFrame:
    """(series, event_ts, value): trend + sinusoid seasonality + gaussian
    noise, per-series phase — the reference's generator shape."""
    rng = np.random.default_rng(seed)
    out = []
    t = np.arange(n_rows)
    ts = pd.date_range("2024-01-01", periods=n_rows, freq=f"{freq_s}s")
    for k in range(n_series):
        phase = rng.uniform(0, 2 * np.pi)
        amp = rng.uniform(2, 6)
        base = rng.uniform(10, 20)
        v = base + trend * t + amp * np.sin(2 * np.pi * t / season_period + phase)
        v = v + rng.normal(0, noise, n_rows)
        out.append(pd.DataFrame({"series": f"ts_{k}", "event_ts": ts, "value": v}))
    return pd.concat(out, ignore_index=True)


def inject_anomalies_pandas(
    pdf: pd.DataFrame,
    anomaly_ratio: float = 0.05,
    impact: float = 3.0,
    seed: int = 42,
    series_col: str = "series",
    value_col: str = "value",
) -> pd.DataFrame:
    """Multiplicative window anomalies: per series, one contiguous window of
    length ratio·n scaled by `impact`; adds `is_anomaly` labels."""
    rng = np.random.default_rng(seed)
    out = pdf.copy()
    out["is_anomaly"] = False
    for _, idx in out.groupby(series_col).groups.items():
        idx = np.asarray(idx)
        n = len(idx)
        w = max(int(n * anomaly_ratio), 1)
        start = int(rng.integers(0, n - w + 1))
        sel = idx[start : start + w]
        out.loc[sel, value_col] = out.loc[sel, value_col] * impact
        out.loc[sel, "is_anomaly"] = True
    return out


def gen_timeseries_spark(spark: SparkSession, **kw) -> DataFrame:
    return spark.createDataFrame(gen_timeseries_pandas(**kw))
