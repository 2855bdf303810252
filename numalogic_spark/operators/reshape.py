"""Shape operators: pivot/unpivot, flatten-vector kernels, train/val split.

Ports:
- J1/J2 multi-metric join & pivot-concat (prometheus.py:113-118,
  druid/_druid.py:202-211) → groupBy().pivot() / unpivot (stack)
- W6 train/val tail split (tools/data.py:254-261, backtest/_prom.py:380-382)
- F9 FlattenVector / F10 FlattenVectorWithPadding
  (transforms/_stateless.py:148-217) as numpy kernels + array-column exprs
- P5 window-size guard (udfs/preprocess.py:130-142)
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pivot_metrics(
    df: DataFrame,
    index_cols: list[str],
    pivot_col: str,
    value_col: str,
    agg: str = "sum",
    values: list[str] | None = None,
) -> DataFrame:
    """Long → wide: one column per pivot value (the reference's per-metric
    frame join / pivot_table). Passing `values` avoids the extra distinct
    scan Spark otherwise needs to discover the pivot domain."""
    g = df.groupBy(*index_cols)
    p = g.pivot(pivot_col, values) if values else g.pivot(pivot_col)
    return p.agg(F.expr(f"{agg}({value_col})"))


def unpivot_metrics(
    df: DataFrame, index_cols: list[str], metric_cols: list[str],
    name_col: str = "metric", value_col: str = "value",
) -> DataFrame:
    """Wide → long via stack (the inverse of J2)."""
    return df.unpivot(index_cols, metric_cols, name_col, value_col)


def train_val_split(
    df: DataFrame,
    val_split_ratio: float,
    source_col: str = "source",
    ts_col: str = "event_ts",
    order_cols: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Last ratio·n rows per series = validation (tail split, W6)."""
    if not 0.0 < val_split_ratio < 1.0:
        raise ValueError("val_split_ratio should be in range (0, 1)")
    order_cols = order_cols or [ts_col]
    w = Window.partitionBy(source_col).orderBy(*[F.col(c).desc() for c in order_cols])
    total = Window.partitionBy(source_col)
    ranked = df.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(total)
    )
    val_size = F.floor(F.col("_n") * val_split_ratio)
    val = ranked.filter(F.col("_rn") <= val_size).drop("_rn", "_n")
    train = ranked.filter(F.col("_rn") > val_size).drop("_rn", "_n")
    return train, val


def min_train_size_guard(df: DataFrame, min_train_size: int, source_col: str = "source") -> DataFrame:
    """Drop series with insufficient rows (trainer/_base.py:356-367)."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    ok = counts.filter(F.col("_n") >= min_train_size).select(source_col)
    return df.join(F.broadcast(ok), source_col, "left_semi")


# --------------------------------------------------------------------------
# FlattenVector kernels (numpy, window-matrix shaped)
# --------------------------------------------------------------------------

def flatten_vector_np(x: np.ndarray) -> np.ndarray:
    """(n, f) → (n·f, 1) row-major. Ref: _stateless.py:160-161."""
    return x.flatten().reshape(-1, 1)


def flatten_vector_inverse_np(x: np.ndarray, n_features: int) -> np.ndarray:
    return x.reshape(-1, n_features)


def flatten_vector_with_padding_np(
    x: np.ndarray, flatten_idx: list[int], padding_idx: list[int], padding_with: float = 0.0
) -> np.ndarray:
    """Ref: _stateless.py:202-211 — flatten chosen columns, zero-pad the
    rest to the flattened length, concat."""
    x_flat = x[:, flatten_idx].flatten().reshape(-1, 1)
    pad_len = x_flat.shape[0] - x.shape[0]
    x_pad = np.pad(x[:, padding_idx], ((0, pad_len), (0, 0)), constant_values=padding_with)
    return np.concatenate([x_flat, x_pad], axis=1)


def flatten_array_expr(cols: list[Column | str]) -> Column:
    """Row-wise (f columns) → array; with posexplode this is the
    DataFrame-level FlattenVector: n rows × f cols → n·f rows × 1 col."""
    return F.array(*[F.col(c) if isinstance(c, str) else c for c in cols])


def flatten_rows(df: DataFrame, id_cols: list[str], metric_cols: list[str]) -> DataFrame:
    """(n, f) → (n·f, 1) as rows, keeping provenance (row id, feature pos)."""
    arr = flatten_array_expr(metric_cols)
    return df.select(*id_cols, F.posexplode(arr).alias("feature_pos", "value"))


def flatten_rows_with_padding(
    df: DataFrame,
    order_by: list[str],
    flatten_cols: list[str],
    padding_cols: list[str],
    partition_by: list[str] | None = None,
    padding_with: float = 0.0,
) -> DataFrame:
    """DataFrame-level FlattenVectorWithPadding (F10): flatten chosen
    columns row-major into a single `value` column (n·f rows) and pad the
    remaining columns from n to n·f rows with ``padding_with``, exactly the
    reference's matrix semantics (transforms/_stateless.py:167-215 —
    X[:, flat].flatten() next to zero-padded X[:, pad]).

    Relationally: out_pos = row_idx·f + feature_idx; the padding columns
    survive at out_pos < n via an equi-join on (partition, out_pos) and
    take ``padding_with`` beyond. The row index is a per-partition
    row_number — pass ``partition_by`` (e.g. the series key) so the sort
    and join parallelize across series; the unpartitioned default is the
    single-matrix small-data path, matching the reference's in-memory use.
    """
    if not padding_cols:
        raise ValueError("At least one feature should be left for padding.")
    nf = len(flatten_cols)
    part = list(partition_by or [])
    w = Window.partitionBy(*part).orderBy(*order_by)
    base = df.withColumn("_idx", F.row_number().over(w) - F.lit(1))
    flat = base.select(
        *part,
        "_idx",
        F.posexplode(flatten_array_expr(flatten_cols)).alias("_j", "value"),
    ).select(
        *part,
        (F.col("_idx") * nf + F.col("_j")).cast("long").alias("out_pos"),
        "value",
    )
    pads = base.select(
        *part,
        F.col("_idx").cast("long").alias("out_pos"),
        *[F.col(p) for p in padding_cols],
    )
    out = flat.join(pads, [*part, "out_pos"], "left")
    for p in padding_cols:
        out = out.withColumn(p, F.coalesce(F.col(p), F.lit(float(padding_with))))
    return out.select(*part, "out_pos", "value", *padding_cols)
