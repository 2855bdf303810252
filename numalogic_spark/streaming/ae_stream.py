"""Streaming autoencoder inference: the reference's scoring vertex as a
stateful Structured Streaming operator.

The reference runs AE inference as a streaming UDF: each message carries
the latest `window_size` values for a series, the fitted artifact is
fetched from the registry, and the forward pass emits reconstruction
errors (/root/reference/numalogic/udfs/inference.py:62-110). The batch
twin here is the gated `*_ae_inference_events` query family (strided
trailing windows → per-window z-score → Arrow forward-pass kernel).
This module is the streaming twin: per-series state carries the last
seq_len − 1 values and the absolute row position, so every stride-th
arriving event closes a window and scores it — across arbitrary
micro-batch boundaries, with output bit-identical to the batch kernel
on the concatenated stream (tests/test_ae_stream.py).

Window/z arithmetic is shared with the batch path via
`functions.ae.zscore_windows_np` and the family-dispatched
`operators.score.score_windows_np` (the exact left-to-right 6-dp
discipline of `__spark_entry__._ae_z_exprs`), so batch ≡ stream is an
identity of code paths, not a tolerance — for EVERY model family
(`family=` picks the kernel; vanilla is the default and unchanged).

State is O(seq_len) doubles per series — the same bounded-state shape
as the reference's LRU'd window cache (udfs/_base.py) and safe at
millions of series. Like the other stateful twins (streaming_ewm,
streaming_counter_deltas), events are assumed to arrive in event-time
order across micro-batches (a file/log source replaying history);
within a batch they are sorted.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from numalogic_spark.functions.ae import zscore_windows_np

_AE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("tail", T.ArrayType(T.DoubleType()), True),
        T.StructField("pos", T.LongType(), True),
    ]
)
_AE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("event_ts", T.TimestampType()),
        T.StructField("err_mean", T.DoubleType()),
        T.StructField("err_max", T.DoubleType()),
    ]
)


def streaming_ae_scores(
    stream_df: DataFrame,
    weights,  # any family's frozen artifact (exposes validate()/seq_len)
    stride: int = 4,
    source_col: str = "source",
    ts_col: str = "event_ts",
    value_col: str = "value",
    id_col: str | None = None,
    state_ttl: str | None = None,
    family: str = "vanilla",
) -> DataFrame:
    """Per-series stateful AE scoring: emit (err_mean, err_max) at every
    window close — absolute position p (1-based) with p ≥ seq_len and
    (p − seq_len) % stride == 0, the exact window grid of the batch
    queries. Values are assumed non-null (impute upstream, like the
    reference's fillna at udfs/tools.py:52).

    ``id_col``: optional tie-break column for equal timestamps — the
    batch plan orders by (ts_s, event_id), so pass the same key when
    timestamps can tie (e.g. second-granular ts); without it, tied rows
    enter windows in arrival order. ``state_ttl``: e.g. ``"30 minutes"``
    — expire a series' state after that much processing-time silence
    (bounds total state under series churn; an expired series restarts
    its window grid from position 0 on its next event).

    ``family``: which forward-pass kernel scores the windows — any of
    `operators.score.FAMILIES` ("vanilla" default keeps the original
    behavior bit-for-bit; `weights` must be that family's artifact).
    The reference's streaming vertex likewise scores whatever artifact
    the registry returns (udfs/inference.py:62-110) — the model family
    is the artifact's business, not the vertex's."""
    from numalogic_spark.operators.score import errors_np, score_windows_np

    errors_np(family)  # fail fast on an unknown family, driver-side
    weights.validate()
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    L = weights.seq_len
    sort_cols = [ts_col] if id_col is None else [ts_col, id_col]

    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (source,) = key
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            tail_list, pos = state.get
            tail = np.asarray(tail_list, dtype=np.float64)
        else:
            tail, pos = np.empty(0, dtype=np.float64), 0
        whole = pd.concat(list(pdfs), ignore_index=True)
        out_ts, out_mean, out_max = [], [], []
        if len(whole):
            whole = whole.sort_values(sort_cols, kind="mergesort")
            vals = whole[value_col].astype(float).to_numpy()
            ts = whole[ts_col].to_numpy()
            combined = np.concatenate([tail, vals])
            # vectorized window-close grid (no per-row Python): new value
            # j sits at 1-based absolute position p = pos + j + 1 (the
            # batch plan's row_number) and closes a window iff p >= L and
            # (p - L) % stride == 0; its end index in `combined` is
            # j + len(tail)
            j_arr = np.arange(len(vals))
            p = pos + j_arr + 1
            keep = j_arr[(p >= L) & ((p - L) % stride == 0)]
            if len(keep):
                view = np.lib.stride_tricks.sliding_window_view(combined, L)
                wins = view[keep + len(tail) - (L - 1)]
                z = zscore_windows_np(wins)
                mean6, emax = score_windows_np(family, weights, z)
                out_ts = list(ts[keep])
                out_mean = list(mean6)
                out_max = list(emax)
            pos += len(vals)
            tail = combined[len(combined) - min(L - 1, len(combined)):]
        state.update(([float(v) for v in tail], int(pos)))
        if state_ttl is not None:
            state.setTimeoutDuration(state_ttl)
        yield pd.DataFrame(
            {
                "source": source,
                "event_ts": pd.Series(out_ts, dtype="datetime64[ns]"),
                "err_mean": pd.Series(out_mean, dtype=float),
                "err_max": pd.Series(out_max, dtype=float),
            }
        )

    return stream_df.groupBy(source_col).applyInPandasWithState(
        fn,
        outputStructType=_AE_OUT_SCHEMA,
        stateStructType=_AE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if state_ttl is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
