"""Offline backtest — the engine analog of the reference's PromBacktester
(backtest/_prom.py: read_data :360-378 → train_models :116-165 →
generate_scores :199-309).

train = head of each series, test = tail; thresholds fit on train only
(never on the scored window — the reference's train/score separation),
then the declarative score pipeline replaces its per-window Python loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from numalogic_spark.operators.pipeline import ScoreConfig, score_pipeline
from numalogic_spark.operators.reshape import min_train_size_guard, train_val_split


def backtest(
    df: DataFrame,
    cfg: ScoreConfig | None = None,
    test_ratio: float = 0.33,
    min_train_size: int = 30,
    source_col: str = "source",
    ts_col: str = "event_ts",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Scores the tail `test_ratio` of every (sufficiently long) series
    using thresholds fitted on the head — one row per full test window."""
    cfg = cfg or ScoreConfig()
    df = min_train_size_guard(df, min_train_size, source_col)
    train, test = train_val_split(df, test_ratio, source_col, ts_col, order_cols)
    return score_pipeline(
        test, cfg, source_col=source_col, ts_col=ts_col, order_cols=order_cols, fit_df=train
    )
