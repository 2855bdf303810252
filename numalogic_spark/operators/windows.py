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
per-row Python. The scale unit of the plain path is the (source) partition —
fine while series count ≥ cores. For LOW series cardinality (one giant
series), `sliding_windows_salted` replicates the seq_len-1 boundary rows
into the previous chunk and windows each (series, chunk) in parallel,
byte-identical to the sequential path; `add_series_positions` supplies the
global per-series row positions it needs without a one-task-per-series
rank (distributed two-phase ranking: range partition → per-partition
counts → exclusive-prefix offsets broadcast back).
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

    # applyInArrow, not applyInPandas: the window column is a nested
    # list<list<float>>, and the pandas path serializes it by iterating a
    # 250k-element object Series of numpy matrices row by row. Building
    # the Arrow ListArrays directly from the flat float32 buffer (one
    # offsets array per nesting level — pure arange arithmetic) removes
    # every per-row Python/Arrow conversion; values are the identical
    # float32 bytes the strided view produced.
    def build(table):
        import pyarrow as pa

        return _windows_arrow_table(
            table, value_cols, seq_len, stride, source_col, ts_col, pa
        )

    return df.groupBy(source_col).applyInArrow(build, schema)


def _emit_windows_arrow(pa, table, x, order, sel, win_ids, seq_len, source_col, ts_col):
    """Shared Arrow output builder for the window kernels: gather the
    selected windows out of the (n, f) float32 matrix `x` (rows already
    in `order`), and emit (source, win_id, start_ts, end_ts, window) as
    a pyarrow Table whose nested list column is built from ONE flat
    float32 buffer + two arithmetic offset arrays — no per-row Python.
    `sel` holds the ORDERED row index of each window start (empty → an
    empty, correctly-typed table)."""
    import pyarrow.compute as pc

    f = x.shape[1]
    n_win = len(sel)
    sel = np.asarray(sel, dtype=np.int64)
    gather = (sel[:, None] + np.arange(seq_len, dtype=np.int64)[None, :]).reshape(-1)
    flat = np.ascontiguousarray(x[gather]).reshape(-1)
    inner_off = pa.array(np.arange(n_win * seq_len + 1, dtype=np.int32) * np.int32(f))
    inner = pa.ListArray.from_arrays(inner_off, pa.array(flat, type=pa.float32()))
    outer_off = pa.array(np.arange(n_win + 1, dtype=np.int32) * np.int32(seq_len))
    # cast to the non-null element fields the Spark schema declares
    # (containsNull=False twice) — layout-only, no data copy
    window = pa.ListArray.from_arrays(outer_off, inner).cast(
        pa.list_(
            pa.field(
                "element",
                pa.list_(pa.field("element", pa.float32(), nullable=False)),
                nullable=False,
            )
        )
    )

    ts_sorted = pc.take(table.column(ts_col).combine_chunks(), pa.array(order))
    starts = pc.take(ts_sorted, pa.array(sel))
    ends = pc.take(ts_sorted, pa.array(sel + np.int64(seq_len - 1)))
    if pa.types.is_timestamp(starts.type) and starts.type.tz is None:
        # Spark hands the worker session-localized NAIVE timestamps but
        # expects tz-aware ones back; the session tz is pinned UTC
        # (session.py), so the cast is a metadata-only reinterpretation
        # of the same epoch micros.
        target = pa.timestamp(starts.type.unit, tz="UTC")
        starts = starts.cast(target)
        ends = ends.cast(target)
    src0 = table.column(source_col).combine_chunks().slice(0, 1)
    source = pc.take(src0, pa.array(np.zeros(n_win, dtype=np.int32)))
    return pa.table(
        {
            "source": source,
            "win_id": pa.array(win_ids, type=pa.int64()),
            "start_ts": starts,
            "end_ts": ends,
            "window": window,
        }
    )


def _windows_arrow_table(table, value_cols, seq_len, stride, source_col, ts_col, pa):
    """sliding_windows' per-group kernel body (sequential numbering)."""
    n = table.num_rows
    ts_np = table.column(ts_col).combine_chunks().to_numpy(zero_copy_only=False)
    order = np.argsort(ts_np, kind="stable")
    x = np.column_stack(
        [
            table.column(c).combine_chunks().to_numpy(zero_copy_only=False)
            for c in value_cols
        ]
    ).astype(np.float32, copy=False)[order]
    if n < seq_len:
        sel = np.empty(0, dtype=np.int64)
    else:
        sel = np.arange(window_count(n, seq_len, stride), dtype=np.int64) * stride
    return _emit_windows_arrow(
        pa, table, x, order, sel, np.arange(len(sel), dtype=np.int64),
        seq_len, source_col, ts_col,
    )


def add_series_positions(
    df: DataFrame,
    source_col: str = "source",
    order_cols: list[str] | None = None,
    pos_col: str = "pos",
    n_parts: int | None = None,
) -> DataFrame:
    """Global 0-based position of every row within its series, WITHOUT a
    one-task-per-series rank.

    `row_number() OVER (PARTITION BY source ORDER BY ts)` funnels each
    series through a single task — exactly the bottleneck a
    low-source-cardinality table hits at scale. Instead, the classic
    two-phase distributed rank:

      1. range-partition by (source, *order_cols) — equal keys land in one
         partition, partition ids are ordered by the sort key;
      2. count rows per (partition, series): a tiny aggregate (≤ n_parts ×
         n_series rows) turned into exclusive-prefix offsets by a window
         over the counts themselves — never collected to the driver;
      3. broadcast-join the offsets back and add the partition-local
         row_number (each window group is one partition's slice of one
         series, bounded by partition size — not the series).

    The ranked frame is localCheckpointed (engine-wide convention, see
    pack_greedy_no_split) because both the counts branch and the output
    branch consume the range exchange and RangePartitioner's sampled
    boundaries must not be recomputed between them. Ties in
    (source, *order_cols) get an arbitrary-but-valid order, same as any
    rank; pass tie-breaking columns for full determinism.
    """
    from pyspark.sql import Window

    order_cols = list(order_cols or ["event_ts"])
    n_parts = n_parts or df.sparkSession.sparkContext.defaultParallelism
    p = (
        df.repartitionByRange(n_parts, source_col, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = p.groupBy("__pid", source_col).agg(F.count(F.lit(1)).alias("__cnt"))
    wo = (
        Window.partitionBy(source_col)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__cnt").over(wo), F.lit(0)).cast("long")
    ).drop("__cnt")
    wl = Window.partitionBy("__pid", source_col).orderBy(*order_cols)
    return (
        p.join(F.broadcast(offsets), ["__pid", source_col])
        .withColumn(pos_col, (F.row_number().over(wl) - 1 + F.col("__off")).cast("long"))
        .drop("__pid", "__off")
    )


def sliding_windows_salted(
    df: DataFrame,
    value_cols: list[str],
    seq_len: int,
    stride: int = 1,
    chunk_rows: int = 100_000,
    source_col: str = "source",
    ts_col: str = "event_ts",
    pos_col: str | None = None,
) -> DataFrame:
    """`sliding_windows` for LOW series cardinality: byte-identical output,
    but a single giant series windows in parallel across chunk_rows-sized
    chunks instead of one task.

    Chunk c owns windows STARTING at global positions [c·C, (c+1)·C); a
    window starting near the chunk end needs up to seq_len-1 rows of chunk
    c+1, so exactly those boundary rows are replicated into chunk c (an
    explode over 1-or-2 chunk ids — replication factor 1 + (L-1)/C, ~1 at
    real chunk sizes). win_id = start_pos // stride reproduces the
    sequential numbering, so the two paths are equality-testable.

    pos_col: column with each row's global 0-based series position, if the
    caller already has one (after gap-fill the grid makes it pure
    arithmetic: (ts - series_start) / interval — zero extra jobs). When
    None, `add_series_positions` computes it distributedly.
    """
    if stride >= seq_len:
        raise ValueError(f"Stride: {stride} should be less than sequence length: {seq_len}")
    if chunk_rows < seq_len:
        raise ValueError(f"chunk_rows ({chunk_rows}) must be >= seq_len ({seq_len})")
    if pos_col is None:
        df = add_series_positions(df, source_col, [ts_col])
        pos_col = "pos"
    C = int(chunk_rows)
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
    chunk = F.expr(f"`{pos_col}` div {C}")
    owners = F.when(
        (F.col(pos_col) % C < seq_len - 1) & (chunk > 0),
        F.array(chunk, chunk - 1),
    ).otherwise(F.array(chunk))
    exploded = df.withColumn("__own", F.explode(owners))

    def build(table):
        import pyarrow as pa

        n = table.num_rows
        pos_np = table.column(pos_col).combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(pos_np, kind="stable")
        x = np.column_stack(
            [
                table.column(c).combine_chunks().to_numpy(zero_copy_only=False)
                for c in value_cols
            ]
        ).astype(np.float32, copy=False)[order]
        if n < seq_len:
            sel = np.empty(0, dtype=np.int64)
            win_ids = sel
        else:
            base = int(table.column("__own").combine_chunks()[0].as_py()) * C
            starts_local = np.arange(n - seq_len + 1, dtype=np.int64)
            sel = np.nonzero(
                ((base + starts_local) % stride == 0) & (starts_local < C)
            )[0].astype(np.int64)
            win_ids = (base + sel) // stride
        return _emit_windows_arrow(
            pa, table, x, order, sel, win_ids, seq_len, source_col, ts_col
        )

    return exploded.groupBy(source_col, "__own").applyInArrow(build, schema)


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
