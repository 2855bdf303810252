"""Config-driven dispatch: name → kernel, the engine analog of the
reference's factories (PreprocessFactory/PostprocessFactory/
ThresholdFactory config/factory.py:42-119, AggregatorFactory :213-238) and
its OmegaConf pipeline tree (udfs/_config.py:21-83).

A pipeline is declared as data (name + kwargs per stage) and compiled onto
a DataFrame column — chains compose into ONE Catalyst projection, so a
multi-stage preprocess costs no extra passes (the reference's
sklearn.pipeline.make_pipeline analog, udfs/preprocess.py:70-75).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame

from numalogic_spark.functions import transforms as TX

# stateless transforms + score functions: name → Column-expr builder
TRANSFORM_FACTORY = {
    "LogTransformer": TX.log_transform,
    "StaticPowerTransformer": TX.static_power_transform,
    "DataClipper": TX.data_clipper,
    "TanhNorm": TX.tanh_norm,
    "SigmoidNorm": TX.sigmoid_norm,
    "StaticThreshold": TX.static_threshold_score,
    "SigmoidThreshold": TX.sigmoid_threshold_score,
    "ImputeNanInf": TX.impute_nan_inf,
}

# fitted estimators: name → (fit_fn, transform/score_fn)
def _scaler_factory():
    from numalogic_spark.functions import scalers as SC

    return {
        "TanhScaler": (SC.fit_tanh_scaler, SC.transform_tanh_scaler),
        "PercentileScaler": (SC.fit_percentile_scaler, SC.transform_percentile_scaler),
        "StdDevThreshold": (SC.fit_stddev_threshold, SC.score_threshold),
        "MaxPercentileThreshold": (SC.fit_max_percentile_threshold, SC.score_threshold),
    }


@dataclass(frozen=True)
class StageConf:
    name: str
    conf: dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class PipelineConf:
    """Mirrors the reference's MLPipelineConf shape: a metric set plus
    named stage chains (udfs/_config.py:27-41)."""

    metrics: list[str]
    preprocess: list[StageConf] = field(default_factory=list)
    threshold: StageConf | None = None
    postprocess: StageConf | None = None


def compile_transform_chain(col: Column | str, stages: list[StageConf]) -> Column:
    """Fold named stateless stages into one Column expression."""
    out = TX._c(col)
    for st in stages:
        try:
            fn = TRANSFORM_FACTORY[st.name]
        except KeyError:
            raise ValueError(
                f"unknown transform: {st.name!r}; available: {sorted(TRANSFORM_FACTORY)}"
            ) from None
        out = fn(out, **st.conf)
    return out


def apply_preprocess(df: DataFrame, cfg: PipelineConf, suffix: str = "__pre") -> DataFrame:
    for m in cfg.metrics:
        df = df.withColumn(f"{m}{suffix}", compile_transform_chain(m, cfg.preprocess))
    return df


def fit_and_score(
    df: DataFrame, cfg: PipelineConf, by: list[str] | None = None, train_df: DataFrame | None = None
) -> DataFrame:
    """Fit the configured threshold model (on train_df if given, else df)
    and score df — the registry save/load hop of the reference collapses
    into a broadcast join of the fitted-stats frame."""
    if cfg.threshold is None:
        return df
    factory = _scaler_factory()
    try:
        fit_fn, apply_fn = factory[cfg.threshold.name]
    except KeyError:
        raise ValueError(
            f"unknown threshold/scaler: {cfg.threshold.name!r}; available: {sorted(factory)}"
        ) from None
    stats = fit_fn(train_df if train_df is not None else df, cfg.metrics, by=by, **cfg.threshold.conf)
    return apply_fn(df, stats, cfg.metrics, by=by)
