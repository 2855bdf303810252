"""Synthetic time-series + anomaly injection (reference parity).

Ports the semantics of numalogic's synthetic subsystem:
- SyntheticTSGenerator: seeded trend + seasonality + noise per series
  (synthetic/timeseries.py:76-112, seeded rng at :74)
- AnomalyGenerator: the FULL variant set — global / contextual /
  collective / causal, positive/negative sign, seeded rng, standard-scaled
  injection space with is_anomaly labels (synthetic/anomalies.py:21-300);
  plus the simpler long-format multiplicative injector used by the engine
  fixtures (inject_anomalies_pandas)

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


# ---------------------------------------------------------------------------
# Multivariate wide-format generator + AnomalyGenerator (full variant port)
# ---------------------------------------------------------------------------


class SyntheticTSGenerator:
    """Full port of the reference generator (synthetic/timeseries.py:22-120):
    per-series baseline + slope trend + gaussian noise + (with probability
    seasonal_ts_prob) a primary and amplitude-reduced secondary cos/linear
    seasonal pattern, seeded rng, wide frame s1..sN on a DatetimeIndex."""

    def __init__(
        self,
        seq_len: int,
        num_series: int,
        freq: str = "min",
        primary_period: int = 1440,
        secondary_period: int = 10080,
        seasonal_ts_prob: float = 0.7,
        baseline_range: tuple[float, float] = (200.0, 350.0),
        slope_range: tuple[float, float] = (-0.001, 0.01),
        amplitude_range: tuple[float, float] = (10, 40),
        cosine_ratio_range: tuple[float, float] = (0.5, 0.9),
        noise_range: tuple[float, float] = (5, 15),
        phase_shift_range: tuple[int, int] | None = None,
        random_seed: int = 42,
    ):
        self.seq_len = seq_len
        self.num_series = num_series
        self.dt_index = pd.DatetimeIndex(
            pd.date_range(end=pd.Timestamp.today().normalize(), periods=seq_len, freq=freq)
        )
        self.time_steps = np.arange(seq_len, dtype="float32")
        self.baseline_range = baseline_range
        self.slope_range = slope_range
        self.amplitude_range = amplitude_range
        self.cos_ratio_range = cosine_ratio_range
        self.noise_range = noise_range
        self.phase_range = phase_shift_range
        self.primary_period = primary_period
        self.secondary_period = secondary_period
        self.seasonal_ts_prob = seasonal_ts_prob
        self._rnd_gen = np.random.default_rng(random_seed)

    def gen_tseries(self) -> pd.DataFrame:
        all_series = {}
        is_seasonal = self._rnd_gen.binomial(1, self.seasonal_ts_prob, self.num_series)
        for s_idx in range(self.num_series):
            if is_seasonal[s_idx]:
                seasonality = self.seasonality(self.primary_period)
                if self.secondary_period:
                    seasonality += self.seasonality(
                        self.secondary_period, amp_reduction_factor=3
                    )
            else:
                seasonality = np.zeros(self.seq_len)
            all_series[f"s{s_idx + 1}"] = (
                self.baseline() + self.trend() + self.noise() + seasonality
            )
        return pd.DataFrame(all_series, index=self.dt_index)

    def baseline(self) -> float:
        return self._rnd_gen.uniform(*self.baseline_range)

    def trend(self) -> np.ndarray:
        slope = self._rnd_gen.uniform(*self.slope_range)
        return slope * self.time_steps

    def seasonality(self, period: int, amp_reduction_factor: int = 1) -> np.ndarray:
        phase = self._rnd_gen.uniform(*self.phase_range) if self.phase_range else 0
        cosine_ratio = self._rnd_gen.uniform(*self.cos_ratio_range)
        amplitude = self._rnd_gen.uniform(*self.amplitude_range) / amp_reduction_factor
        season_time = ((self.time_steps + phase) % period) / period
        # cos wave for the first cosine_ratio of the period, linear ramp after
        seasonal_pattern = np.where(
            season_time < cosine_ratio, np.cos(season_time * 2 * np.pi), season_time
        )
        return amplitude * seasonal_pattern

    def noise(self) -> np.ndarray:
        noise_level = self._rnd_gen.uniform(*self.noise_range)
        return self._rnd_gen.standard_normal(self.seq_len) * noise_level

    @classmethod
    def train_test_split(
        cls, df: pd.DataFrame, test_size: int
    ) -> tuple[pd.DataFrame, pd.DataFrame]:
        return df[:-test_size], df[-test_size:]


class SparsityGenerator:
    """Port of synthetic/sparsity.py:16-42: zero out a sparse_ratio
    fraction of rows, and within each chosen row a sparse_ratio fraction
    of columns. The reference samples via the global `random` module; this
    port takes a seed for reproducibility (None = nondeterministic, like
    the reference)."""

    def __init__(self, data: pd.DataFrame, sparse_ratio: float = 0.2,
                 random_seed: int | None = 42):
        self.sparse_ratio = sparse_ratio
        self._data = data
        self._rng = np.random.default_rng(random_seed)

    def generate_sparsity(self) -> None:
        shape = self._data.shape
        n_rows = int(shape[0] * self.sparse_ratio)
        rows = self._rng.choice(shape[0], size=n_rows, replace=False)
        n_cols = int(shape[1] * self.sparse_ratio)
        for row in rows:
            columns = self._rng.choice(shape[1], size=n_cols, replace=False)
            self._data.iloc[row, columns] = 0

    @property
    def data(self) -> pd.DataFrame:
        return self._data


def gen_multivariate_pandas(
    seq_len: int = 7200,
    num_series: int = 5,
    freq: str = "min",
    seed: int = 42,
    season_period: int = 1440,
    noise: float = 0.3,
) -> pd.DataFrame:
    """Wide multivariate frame (columns s1..sN, DatetimeIndex with freq) —
    the SyntheticTSGenerator shape (synthetic/timeseries.py:76-112) the
    reference's anomaly tests build on."""
    rng = np.random.default_rng(seed)
    t = np.arange(seq_len)
    idx = pd.date_range("2024-01-01", periods=seq_len, freq=freq)
    data = {}
    for k in range(1, num_series + 1):
        phase = rng.uniform(0, 2 * np.pi)
        amp = rng.uniform(2, 6)
        base = rng.uniform(10, 20)
        trend = rng.uniform(-0.002, 0.002)
        v = base + trend * t + amp * np.sin(2 * np.pi * t / season_period + phase)
        data[f"s{k}"] = v + rng.normal(0, noise, seq_len)
    return pd.DataFrame(data, index=idx)


def train_test_split_wide(
    df: pd.DataFrame, test_size: int
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Tail split (synthetic/timeseries.py train_test_split)."""
    return df.iloc[:-test_size], df.iloc[-test_size:]


class AnomalyGenerator:
    """Full port of the reference AnomalyGenerator
    (synthetic/anomalies.py:21-300): global / contextual / collective /
    causal variants, positive/negative sign, seeded rng, standard-scaled
    injection space, is_anomaly labels.

    Differences from the reference, both deliberate:
    - the internal StandardScaler is a two-line numpy closed form (no
      sklearn in the image); identical math (ddof=0, zero-std -> 1);
    - only the INJECTED columns round-trip through the scaler; untouched
      columns are copied verbatim, which guarantees the reference tests'
      exact-equality contract on non-injected columns instead of relying
      on (x-m)/s*s+m FP round-tripping.
    """

    _MIN_COLUMNS = {"global": 1, "contextual": 1, "causal": 2, "collective": 2}

    def __init__(
        self,
        ref_df: pd.DataFrame,
        anomaly_type: str = "global",
        anomaly_ratio: float = 0.1,
        anomaly_sign: str = "positive",
        mu: float = 0.1,
        sigma: float = 0.01,
        random_seed: int = 42,
    ):
        self.anomaly_type = anomaly_type
        self.anomaly_ratio = anomaly_ratio
        self.anomaly_sign = anomaly_sign
        self.mu, self.sigma = mu, sigma
        try:
            self.freq = ref_df.index.freq
        except AttributeError:
            self.freq = None
        x = ref_df.to_numpy(dtype=float)
        self._mean = x.mean(axis=0)
        std = x.std(axis=0)
        self._std = np.where(std == 0.0, 1.0, std)
        scaled = (x - self._mean) / self._std
        # describe() stats of the SCALED reference — min/max drive factors
        self._ref_min = pd.Series(scaled.min(axis=0), index=ref_df.columns)
        self._ref_max = pd.Series(scaled.max(axis=0), index=ref_df.columns)
        self._cols = list(ref_df.columns)
        self.__injected_cols: list[str] = []
        self.block_size: int | None = None
        self._rnd_gen = np.random.default_rng(random_seed)

    @property
    def injected_cols(self) -> list[str]:
        return self.__injected_cols

    def add_impact_sign(self) -> int:
        if self.anomaly_sign == "positive":
            return 1
        if self.anomaly_sign == "negative":
            return -1
        raise ValueError(f"Invalid anomaly sign provided: {self.anomaly_sign}")

    # -- helpers ------------------------------------------------------------

    def _scale_col(self, s: pd.Series, col: str) -> np.ndarray:
        i = self._cols.index(col)
        return (s.to_numpy(dtype=float) - self._mean[i]) / self._std[i]

    def _unscale_col(self, v: np.ndarray, col: str) -> np.ndarray:
        i = self._cols.index(col)
        return v * self._std[i] + self._mean[i]

    def _prepare(self, target_df: pd.DataFrame, cols):
        self.block_size = int(np.ceil(target_df.shape[0] * self.anomaly_ratio))
        if not cols:
            cols = list(
                self._rnd_gen.choice(
                    target_df.columns, self._MIN_COLUMNS[self.anomaly_type]
                )
            )
        self.__injected_cols = list(cols)
        return self.__injected_cols

    def _find_start_idx(self, anomaly_start_idx, n: int) -> int:
        if anomaly_start_idx is None:
            return int(self._rnd_gen.integers(0, n - self.block_size))
        return int(anomaly_start_idx)

    def _directional_bump(self, block: np.ndarray, col: str, impact: float,
                          toward_min: bool) -> np.ndarray:
        noise = self._rnd_gen.normal(self.mu, self.sigma, block.shape)
        if toward_min:
            factor = abs(self._ref_min[col] - block.mean())
            return block - (noise + impact * factor * np.abs(block) * self.add_impact_sign())
        factor = abs(block.mean() - self._ref_max[col])
        return block + (noise + impact * factor * np.abs(block) * self.add_impact_sign())

    def _toward_min(self, block: np.ndarray, col: str) -> bool:
        dist_min = np.linalg.norm(block - self._ref_min[col])
        dist_max = np.linalg.norm(block - self._ref_max[col])
        return dist_min > dist_max

    def _emit(self, target_df: pd.DataFrame, scaled: dict[str, np.ndarray],
              labels: np.ndarray) -> pd.DataFrame:
        out = target_df.copy()
        for col, v in scaled.items():
            out[col] = self._unscale_col(v, col)
        out["is_anomaly"] = labels
        return out

    # -- injectors ----------------------------------------------------------

    def inject_anomalies(self, target_df: pd.DataFrame, cols=None, **kw) -> pd.DataFrame:
        if self.anomaly_type == "global":
            return self._inject_global(target_df, cols, **kw)
        if self.anomaly_type == "contextual":
            return self._inject_contextual(target_df, cols, **kw)
        if self.anomaly_type == "collective":
            return self._inject_collective(target_df, cols, **kw)
        if self.anomaly_type == "causal":
            return self._inject_causal(target_df, cols, **kw)
        raise AttributeError(f"Invalid anomaly type provided: {self.anomaly_type}")

    def _inject_global(self, target_df, cols, impact=3, anomaly_start_idx=None):
        cols = self._prepare(target_df, cols)
        labels = np.zeros(len(target_df), dtype=int)
        scaled = {}
        for col in cols:
            # compound on the shared scaled state: a duplicate column
            # pick (rng.choice samples WITH replacement, like the
            # reference) must inject on top of the earlier block, not
            # re-read the raw column and discard it
            v = scaled[col] if col in scaled else self._scale_col(target_df[col], col)
            i0 = self._find_start_idx(anomaly_start_idx, len(v))
            i1 = i0 + self.block_size
            block = v[i0:i1]
            noise = self._rnd_gen.normal(self.mu, self.sigma, block.shape)
            factor = abs(self._ref_max[col] - block.mean())
            v[i0:i1] = block + noise + impact * factor * np.abs(block) * self.add_impact_sign()
            labels[i0:i1] += self.add_impact_sign()
            scaled[col] = v
        return self._emit(target_df, scaled, labels)

    def _inject_contextual(self, target_df, cols, impact=1):
        cols = self._prepare(target_df, cols)
        labels = np.zeros(len(target_df), dtype=int)
        scaled = {}
        for col in cols:
            # compound on the shared scaled state: a duplicate column
            # pick (rng.choice samples WITH replacement, like the
            # reference) must inject on top of the earlier block, not
            # re-read the raw column and discard it
            v = scaled[col] if col in scaled else self._scale_col(target_df[col], col)
            i0 = self._find_start_idx(None, len(v))
            i1 = i0 + self.block_size
            v[i0:i1] = self._directional_bump(
                v[i0:i1], col, impact, self._toward_min(v[i0:i1], col)
            )
            labels[i0:i1] += self.add_impact_sign()
            scaled[col] = v
        return self._emit(target_df, scaled, labels)

    def _inject_collective(self, target_df, cols, impact=0.8, anomaly_start_idx=None):
        cols = self._prepare(target_df, cols)
        labels = np.zeros(len(target_df), dtype=int)
        # ONE shared window across every injected column — the defining
        # property of a collective anomaly
        i0 = self._find_start_idx(anomaly_start_idx, len(target_df))
        i1 = i0 + self.block_size
        scaled = {}
        for col in cols:
            # compound on the shared scaled state: a duplicate column
            # pick (rng.choice samples WITH replacement, like the
            # reference) must inject on top of the earlier block, not
            # re-read the raw column and discard it
            v = scaled[col] if col in scaled else self._scale_col(target_df[col], col)
            v[i0:i1] = self._directional_bump(
                v[i0:i1], col, impact, self._toward_min(v[i0:i1], col)
            )
            labels[i0:i1] += self.add_impact_sign()
            scaled[col] = v
        return self._emit(target_df, scaled, labels)

    def _inject_causal(self, target_df, cols, impact=2, gap_range=(5, 20)):
        cols = self._prepare(target_df, cols)
        n = len(target_df)
        labels = np.zeros(n, dtype=int)
        # staggered blocks: each column's anomaly STARTS after the previous
        # column's block plus a random gap (temporal causality chain)
        i0 = int(
            self._rnd_gen.integers(0, max(n - len(cols) * self.block_size, 1))
        )
        scaled = {}
        for col in cols:
            i1 = min(i0 + self.block_size, n)
            # compound on the shared scaled state: a duplicate column
            # pick (rng.choice samples WITH replacement, like the
            # reference) must inject on top of the earlier block, not
            # re-read the raw column and discard it
            v = scaled[col] if col in scaled else self._scale_col(target_df[col], col)
            toward_min = bool(self._rnd_gen.binomial(1, 0.5))
            v[i0:i1] = self._directional_bump(v[i0:i1], col, impact, toward_min)
            labels[i0:i1] += self.add_impact_sign()
            scaled[col] = v
            gap = int(self._rnd_gen.integers(*gap_range))
            i0 = min(i1 + gap, n - 1)
        return self._emit(target_df, scaled, labels)
