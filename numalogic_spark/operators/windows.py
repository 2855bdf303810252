"""Strided sliding-window kernels (the reference's StreamingDataset contract).

Semantics ported from /root/reference/numalogic/tools/data.py:
- window i covers rows [i*stride, i*stride + seq_len)            (data.py:194)
- window count = (n - seq_len) // stride + 1                      (data.py:178)
- stride must be < seq_len; groups shorter than seq_len yield no
  windows (the engine analog of the payload guard udfs/preprocess.py:130)
- values are computed in float32, like the reference (data.py:128)
- inverse_window keep_first / keep_last                           (data.py:29-91)

Implementation: `applyInPandas` per series — each group becomes one numpy
matrix and windows come from `sliding_window_view` (zero-copy strided view),
mirroring the reference's "whole window as one matrix" contract with no
per-row Python. Skewed/hot sources should be salted upstream only for
stateless kernels; windowing itself needs the full series per task, so the
scale unit is the (source) partition — at 10^12 rows the series count is the
parallelism axis, and each series' window batch stays bounded by retention.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _window_matrix(x: np.ndarray, seq_len: int, stride: int) -> np.ndarray:
    """(n, f) float32 → (n_win, seq_len, f) strided windows (copy-free view)."""
    if stride >= seq_len:
        raise ValueError(f"Stride: {stride} should be less than sequence length: {seq_len}")
    v = np.lib.stride_tricks.sliding_window_view(x, (seq_len, x.shape[1]))[::stride, 0]
    return v  # shape (n_win, seq_len, f)


def window_count(n: int, seq_len: int, stride: int) -> int:
    return (n - seq_len) // stride + 1 if n >= seq_len else 0


def sliding_windows(
    df: DataFrame,
    value_cols: list[str],
    seq_len: int,
    stride: int = 1,
    source_col: str = "source",
    ts_col: str = "event_ts",
) -> DataFrame:
    """Per-series overlapping windows.

    Output: (source, win_id, start_ts, end_ts, window: array<array<float>>)
    where window[t][f] is feature f at window-relative time t and end_ts is
    the window's last timestamp (the reference's output timestamp,
    udfs/entities.py:80-82).
    """
    if stride >= seq_len:
        raise ValueError(f"Stride: {stride} should be less than sequence length: {seq_len}")
    schema = T.StructType(
        [
            T.StructField("source", T.StringType()),
            T.StructField("win_id", T.LongType()),
            T.StructField("start_ts", T.TimestampType()),
            T.StructField("end_ts", T.TimestampType()),
            T.StructField(
                "window", T.ArrayType(T.ArrayType(T.FloatType(), False), False), False
            ),
        ]
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        n = len(pdf)
        if n < seq_len:
            return pd.DataFrame(
                {
                    "source": pd.Series([], dtype=object),
                    "win_id": pd.Series([], dtype="int64"),
                    "start_ts": pd.Series([], dtype="datetime64[ns]"),
                    "end_ts": pd.Series([], dtype="datetime64[ns]"),
                    "window": pd.Series([], dtype=object),
                }
            )
        x = pdf[value_cols].to_numpy(dtype=np.float32)
        w = _window_matrix(x, seq_len, stride)
        ts = pdf[ts_col].to_numpy()
        n_win = w.shape[0]
        starts = ts[np.arange(n_win) * stride]
        ends = ts[np.arange(n_win) * stride + seq_len - 1]
        return pd.DataFrame(
            {
                "source": pdf[source_col].iloc[0],
                "win_id": np.arange(n_win, dtype=np.int64),
                "start_ts": starts,
                "end_ts": ends,
                "window": [w[i] for i in range(n_win)],
            }
        )

    return df.groupBy(source_col).applyInPandas(build, schema)


def inverse_window_np(batched: np.ndarray, method: str = "keep_first") -> np.ndarray:
    """(batch, seq_len, f) → (batch + seq_len - 1, f); stride-1 inverse.

    keep_first: first element of each window, then the tail of the last
    window (data.py:50-68). keep_last: head of the first window, then the
    last element of each window (data.py:71-91).
    """
    if method == "keep_first":
        return np.vstack([batched[:, 0, :], batched[-1, 1:]])
    if method == "keep_last":
        return np.vstack([batched[0, :-1, :], batched[:, -1, :]])
    raise ValueError(f"Invalid method: {method}")


def inverse_windows(
    windows_df: DataFrame, method: str = "keep_first", n_features: int = 1
) -> DataFrame:
    """Reconstitute the 2-D series from stride-1 windows per source.

    Output: (source, row_id, values: array<float>).
    """
    schema = T.StructType(
        [
            T.StructField("source", T.StringType()),
            T.StructField("row_id", T.LongType()),
            T.StructField("values", T.ArrayType(T.FloatType(), False), False),
        ]
    )

    def rebuild(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("win_id", kind="mergesort")
        batched = np.asarray(
            [np.asarray([np.asarray(r, dtype=np.float32) for r in w]) for w in pdf["window"]]
        )
        out = inverse_window_np(batched, method)
        return pd.DataFrame(
            {
                "source": pdf["source"].iloc[0],
                "row_id": np.arange(out.shape[0], dtype=np.int64),
                "values": [out[i] for i in range(out.shape[0])],
            }
        )

    return windows_df.groupBy("source").applyInPandas(rebuild, schema)


def stride2_feature_recovery_np(x: np.ndarray, seq_len: int) -> np.ndarray:
    """W3: de-interleave a stride-2-flattened window batch and reconstruct
    the original two-feature series.

    Port of the reference backtest recovery (backtest/_prom.py:167-197):
    the model output interleaves two features along seq_len
    (x[:, ::2] / x[:, 1::2]); each half is inverse-windowed (keep_first)
    and the halves are hstacked back into (n, 2).

    Input: (batch, seq_len) windows whose columns interleave f0,f1,...
    """
    if seq_len % 2:
        raise ValueError("stride-2 recovery needs an even seq_len")
    a = x[:, 0::2][:, :, None]  # (batch, seq_len/2, 1)
    b = x[:, 1::2][:, :, None]
    ra = inverse_window_np(a, "keep_first")
    rb = inverse_window_np(b, "keep_first")
    return np.hstack([ra, rb])


def ewm_smooth_windowed(
    df: DataFrame,
    value_col: str,
    seq_len: int = 12,
    beta: float = 0.5,
    source_col: str = "source",
    order_cols: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Trailing-window EWM smoothing: bias-corrected EXP aggregation (A7
    closed form) over each row's last min(rn, seq_len) values per series.

    The bounded-state sibling of `ewm_smooth` (which reproduces pandas'
    full-history ewm exactly): state per series is seq_len values, so it
    maps 1:1 onto the streaming EWM operator and onto a DuckDB
    lag-expansion oracle — full-history float32 recursion can do neither.
    With beta=β the two differ by at most β^seq_len relative weight.
    All JVM-side: one sort per series, zero Python."""
    from pyspark.sql import Window

    from numalogic_spark.functions.aggregators import window_agg_expr

    order_cols = order_cols or ["event_ts"]
    out_col = out_col or f"{value_col}_ewm"
    w = Window.partitionBy(source_col).orderBy(*order_cols)
    frame = w.rowsBetween(-(seq_len - 1), 0)
    return df.withColumn(
        out_col, window_agg_expr(F.collect_list(F.col(value_col)).over(frame), "EXP", beta)
    )


def ewm_smooth(
    df: DataFrame,
    value_cols: list[str],
    beta: float = 0.5,
    source_col: str = "source",
    ts_col: str = "event_ts",
) -> DataFrame:
    """Per-series pandas-style exponentially weighted mean, same shape out.

    Port of ExpMovingAverage.transform (transforms/_movavg.py:100-113):
    x.ewm(alpha=1-beta).mean() column-wise in float32.

    Every NON-value column of the input passes through untouched (value
    columns come back float32) — the stage must not eat id/provenance
    columns a downstream join needs (a prior version emitted only
    source/ts/metrics and silently dropped the rest).
    """
    alpha = 1.0 - beta
    if not 0.0 < alpha < 1.0:
        raise ValueError("beta only accepts values between 0 and 1 (not inclusive)")
    value_set = set(value_cols)
    out_fields = [
        T.StructField(f.name, T.FloatType() if f.name in value_set else f.dataType)
        for f in df.schema.fields
    ]
    schema = T.StructType(out_fields)

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort", ignore_index=True)
        sm = (
            pdf[value_cols]
            .astype(np.float32)
            .ewm(alpha=alpha)
            .mean()
            .astype(np.float32)
        )
        out = pdf.copy()
        for c in value_cols:
            out[c] = sm[c].to_numpy()
        return out

    return df.groupBy(source_col).applyInPandas(smooth, schema)
