"""End-to-end scoring pipeline — the reference's postprocess chain as
declarative DataFrame stages.

Reference flow (udfs/postprocess.py:301-348 `compute`, and the per-window
python loop in backtest/_prom.py:257-277 that this engine replaces):
  threshold.score_samples (elementwise)             → F11 x/thr
  → aggregate_window over seq_len (A6, EXP default) → EWM closed form A7
  → aggregate_features (A8, mean)                   → unified score
  → postprocess transform (F7 TanhNorm)             → normalized score
  → optional static-threshold adjust max(a, y)      → O3 greatest()

Everything stays in Catalyst: the sliding window is collect_list over a
rowsBetween frame; the EWM aggregation is the zip_with closed form — one
shuffle (the fit stats), one sort per series, zero Python.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from numalogic_spark.functions.aggregators import feature_agg_expr, window_agg_expr
from numalogic_spark.functions.scalers import fit_stddev_threshold
from numalogic_spark.functions.transforms import static_threshold_score, tanh_norm


@dataclass(frozen=True)
class ScoreConfig:
    metrics: list[str] = field(default_factory=lambda: ["value"])
    seq_len: int = 12
    beta: float = 0.5                 # EXP window-agg weight
    window_agg: str = "EXP"           # A6 method
    feature_agg: str = "MEAN"         # A8 method
    std_factor: float = 3.0           # F11 threshold fit
    min_threshold: float = 0.0
    scale_factor: float = 10.0        # F7 TanhNorm
    smooth_factor: float = 10.0
    static_limit: float | None = None  # O3 adjust when set
    static_outlier: float = 10.0
    static_inlier: float = 0.5
    decimal_fit: bool = False          # exact-decimal threshold moments (A9)


def score_pipeline(
    df: DataFrame,
    cfg: ScoreConfig | None = None,
    source_col: str = "source",
    ts_col: str = "event_ts",
    order_cols: list[str] | None = None,
    fit_df: DataFrame | None = None,
) -> DataFrame:
    """Returns one row per full window (rn ≥ seq_len) per series:
    (source, end_ts, <m>_score per feature, unified_raw, unified_score[,
    adjusted_score]). `fit_df` lets threshold stats come from a training
    split (the backtest path) instead of the scored data itself."""
    cfg = cfg or ScoreConfig()
    order_cols = order_cols or [ts_col]

    # 1. fit per-series thresholds once, broadcast back (A9 discipline)
    stats = fit_stddev_threshold(
        fit_df if fit_df is not None else df,
        cfg.metrics, by=[source_col], std_factor=cfg.std_factor,
        min_threshold=cfg.min_threshold, decimal_stats=cfg.decimal_fit,
    )
    scored = df.join(F.broadcast(stats), source_col)
    for m in cfg.metrics:
        # divisor floored at 1e-12: a constant-zero train series fits thr=0
        # (with min_threshold=0) and x/thr would throw under ANSI / emit NaN
        scored = scored.withColumn(
            f"{m}__score", F.col(m) / F.greatest(F.col(f"{m}__thr"), F.lit(1e-12))
        )

    # 2. sliding window of scores + EWM aggregation per feature (W1 + A6/A7)
    w = Window.partitionBy(source_col).orderBy(*order_cols)
    frame = w.rowsBetween(-(cfg.seq_len - 1), 0)
    out = scored.withColumn("_rn", F.row_number().over(w))
    agg_cols = []
    for m in cfg.metrics:
        out = out.withColumn(
            f"{m}__wagg",
            window_agg_expr(
                F.collect_list(F.col(f"{m}__score")).over(frame), cfg.window_agg, cfg.beta
            ),
        )
        agg_cols.append(f"{m}__wagg")
    out = out.filter(F.col("_rn") >= cfg.seq_len)  # full windows only (P5 guard)

    # 3. feature aggregation → unified score (A8), postprocess norm (F7)
    unified = feature_agg_expr(agg_cols, cfg.feature_agg)
    out = out.withColumn("unified_raw", unified).withColumn(
        "unified_score", tanh_norm("unified_raw", cfg.scale_factor, cfg.smooth_factor)
    )

    # 4. optional static-threshold adjust: max(static, trained) (O3)
    if cfg.static_limit is not None:
        static = static_threshold_score(
            F.col(cfg.metrics[0]), cfg.static_limit, cfg.static_outlier, cfg.static_inlier
        )
        out = out.withColumn("adjusted_score", F.greatest(static, F.col("unified_score")))

    keep = [source_col, F.col(ts_col).alias("end_ts")]
    keep += [F.col(f"{m}__score").alias(f"{m}_score") for m in cfg.metrics]
    keep += [F.col(f"{m}__wagg").alias(f"{m}_wagg") for m in cfg.metrics]
    keep += ["unified_raw", "unified_score"]
    if cfg.static_limit is not None:
        keep.append("adjusted_score")
    return out.select(*keep)


def score_pipeline_oracle(pdf, cfg: ScoreConfig, source_col="source", ts_col="event_ts"):
    """numpy/pandas oracle implementing the reference loop literally
    (backtest/_prom.py:257-277): for each window, threshold-score → EWM
    window agg (bias-corrected) → feature mean → tanh norm."""
    import numpy as np
    import pandas as pd

    from numalogic_spark.functions.aggregators import aggregate_window_np, expmov_avg_np

    rows = []
    for src, g in pdf.groupby(source_col):
        g = g.sort_values(ts_col)
        x = g[cfg.metrics].to_numpy(dtype=float)
        thr = np.maximum(x.mean(axis=0) + cfg.std_factor * x.std(axis=0), cfg.min_threshold)
        scores = x / thr
        n = len(g)
        for end in range(cfg.seq_len - 1, n):
            win = scores[end - cfg.seq_len + 1 : end + 1]
            wagg = aggregate_window_np(win, cfg.window_agg, beta=cfg.beta) if cfg.window_agg == "EXP" else aggregate_window_np(win, cfg.window_agg)
            unified = float(np.mean(wagg))
            tn = cfg.scale_factor * np.tanh(unified / cfg.smooth_factor)
            row = {
                source_col: src,
                "end_ts": g[ts_col].iloc[end],
                "unified_raw": unified,
                "unified_score": tn,
            }
            if cfg.static_limit is not None:
                s = cfg.static_outlier if x[end, 0] >= cfg.static_limit else cfg.static_inlier
                row["adjusted_score"] = max(s, tn)
            rows.append(row)
    return pd.DataFrame(rows)
