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

# stateless transforms + score functions: name → Column-expr builder.
# DifferenceTransform/GaussianNoiseAdder are column exprs too — their conf
# carries the context the closed forms need (order_by/partition_by resp.
# id_col for counter-based seeded noise).
TRANSFORM_FACTORY = {
    "LogTransformer": TX.log_transform,
    "StaticPowerTransformer": TX.static_power_transform,
    "DataClipper": TX.data_clipper,
    "TanhNorm": TX.tanh_norm,
    "SigmoidNorm": TX.sigmoid_norm,
    "StaticThreshold": TX.static_threshold_score,
    "SigmoidThreshold": TX.sigmoid_threshold_score,
    "ImputeNanInf": TX.impute_nan_inf,
    "DifferenceTransform": TX.difference_transform,
    "GaussianNoiseAdder": TX.seeded_gaussian_noise,
}

# fitted estimators: name → (fit_fn, transform/score_fn); covers every
# PreprocessFactory/ThresholdFactory scaler the reference dispatches by
# name (config/factory.py:45,59-63,100-119) that has a closed-form fit.
# _SCALER_OUT declares each estimator's OUTPUT naming so callers never
# guess: a per-metric suffix string, or a literal column list for
# estimators that replace the metric set (RobustMahalanobis emits
# md/md_score/md_pred regardless of how many features went in).
_SCALER_OUT: dict[str, object] = {
    "StdDevThreshold": "__score",
    "MaxPercentileThreshold": "__score",
    "RobustMahalanobisThreshold": ["md_score"],
}


def _scaler_out_metrics(
    name: str, metrics: list[str], suffix: str | None = None
) -> list[str]:
    out = _SCALER_OUT.get(name, "__scaled")
    if isinstance(out, list):
        return list(out)
    # a transform-time suffix= conf overrides the default naming — the
    # tracked metric names must follow the columns the transform actually
    # writes, or the next stage references phantom columns
    if suffix is not None:
        out = suffix
    return [f"{m}{out}" for m in metrics]


def _split_estimator_conf(fit_fn, tx_fn, conf: dict):
    """Route StageConf kwargs to fit vs transform by the functions' actual
    signatures (a TanhScaler `coeff` is a transform-time param, a
    `std_factor` is fit-time; name-based guessing broke both)."""
    import inspect

    shared = {"df", "stats", "cols", "by"}
    tx_params = {
        p for p in inspect.signature(tx_fn).parameters if p not in shared
    }
    fit_params = {
        p for p in inspect.signature(fit_fn).parameters if p not in shared
    }
    fit_kw, tx_kw = {}, {}
    for k, v in conf.items():
        if k in fit_params:
            fit_kw[k] = v
        elif k in tx_params:
            tx_kw[k] = v
        else:
            raise ValueError(
                f"unknown estimator param {k!r}; fit takes {sorted(fit_params)}, "
                f"transform takes {sorted(tx_params)}"
            )
    return fit_kw, tx_kw


def _scaler_factory():
    from numalogic_spark.functions import robust as RB
    from numalogic_spark.functions import scalers as SC

    return {
        "RobustMahalanobisThreshold": (
            RB.fit_robust_mahalanobis,
            RB.score_robust_mahalanobis,
        ),
        "TanhScaler": (SC.fit_tanh_scaler, SC.transform_tanh_scaler),
        "PercentileScaler": (SC.fit_percentile_scaler, SC.transform_percentile_scaler),
        "StdDevThreshold": (SC.fit_stddev_threshold, SC.score_threshold),
        "MaxPercentileThreshold": (SC.fit_max_percentile_threshold, SC.score_threshold),
        "StandardScaler": (SC.fit_standard_scaler, SC.transform_affine_scaler),
        "MinMaxScaler": (SC.fit_minmax_scaler, SC.transform_affine_scaler),
        "MaxAbsScaler": (SC.fit_maxabs_scaler, SC.transform_affine_scaler),
        "RobustScaler": (SC.fit_robust_scaler, SC.transform_affine_scaler),
    }


# frame-level transforms: name → callable(df, metrics, **conf) returning
# (DataFrame, new_metric_cols). These reshape the frame or need a per-series
# sort, so they cannot fold into a single Column projection; apply_preprocess
# flushes the pending column chain before running one.
def _df_transform_factory():
    from numalogic_spark.operators import reshape as RS
    from numalogic_spark.operators import windows as W

    def exp_moving_average(df, metrics, *, beta=0.5, source_col="source",
                           ts_col="event_ts"):
        return W.ewm_smooth(df, metrics, beta=beta, source_col=source_col,
                            ts_col=ts_col), metrics

    def flatten_vector(df, metrics, *, id_cols):
        return RS.flatten_rows(df, id_cols, metrics), ["value"]

    def flatten_vector_with_padding(df, metrics, *, flatten_features, order_by,
                                    partition_by=None, padding_with=0.0):
        pads = [m for m in metrics if m not in set(flatten_features)]
        out = RS.flatten_rows_with_padding(
            df, order_by, list(flatten_features), pads,
            partition_by=partition_by, padding_with=padding_with,
        )
        return out, ["value", *pads]

    return {
        "ExpMovingAverage": exp_moving_average,
        "FlattenVector": flatten_vector,
        "FlattenVectorWithPadding": flatten_vector_with_padding,
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


def apply_preprocess(
    df: DataFrame,
    cfg: PipelineConf,
    suffix: str = "__pre",
    by: list[str] | None = None,
) -> DataFrame:
    """Run cfg.preprocess in declared order. Consecutive Column-expr stages
    fold into ONE projection (the make_pipeline analog); a fitted-scaler
    stage becomes fit-aggregate + broadcast-join transform; a frame-level
    stage (EWM smoothing, flatten reshapes) runs via _df_transform_factory
    and may rename the working metric columns. The first transforming
    flush writes `{metric}{suffix}` so callers keep the raw columns;
    later stages chain on the transformed names."""
    df_factory = _df_transform_factory()
    scalers = _scaler_factory()
    metrics = list(cfg.metrics)
    pending: list[StageConf] = []
    suffixed = False

    def flush(frame, cols):
        nonlocal pending, suffixed
        if not pending:
            return frame, cols
        out_cols = cols if suffixed else [f"{m}{suffix}" for m in cols]
        for m, om in zip(cols, out_cols):
            frame = frame.withColumn(om, compile_transform_chain(m, pending))
        pending, suffixed = [], True
        return frame, out_cols

    for st in cfg.preprocess:
        if st.name in TRANSFORM_FACTORY:
            pending.append(st)
        elif st.name in scalers:
            df, metrics = flush(df, metrics)
            fit_fn, tx_fn = scalers[st.name]
            fit_kw, tx_kw = _split_estimator_conf(fit_fn, tx_fn, st.conf)
            stats = fit_fn(df, metrics, by=by, **fit_kw)
            df = tx_fn(df, stats, metrics, by=by, **tx_kw)
            metrics = _scaler_out_metrics(st.name, metrics, tx_kw.get("suffix"))
            suffixed = True
        elif st.name in df_factory:
            df, metrics = flush(df, metrics)
            df, metrics = df_factory[st.name](df, metrics, **st.conf)
            suffixed = True
        else:
            raise ValueError(
                f"unknown transform: {st.name!r}; available: "
                f"{sorted({*TRANSFORM_FACTORY, *scalers, *df_factory})}"
            )
    df, metrics = flush(df, metrics)
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
    fit_kw, tx_kw = _split_estimator_conf(fit_fn, apply_fn, cfg.threshold.conf)
    stats = fit_fn(train_df if train_df is not None else df, cfg.metrics, by=by, **fit_kw)
    return apply_fn(df, stats, cfg.metrics, by=by, **tx_kw)


# --------------------------------------------------------------------------
# corpus (training-data) pipelines as data
# --------------------------------------------------------------------------

def _doc_stage_factory():
    """name → callable(df, *, text_col, id_col, **conf) -> DataFrame, each
    mapping a document corpus to a document corpus (filters) or to its
    terminal representation (Tokenize/SequencePack). The training-data
    analog of TRANSFORM_FACTORY: jobs declare the corpus pipeline as data
    (jobs/prep_job.py is the hand-written equivalent)."""
    from pyspark.sql import functions as F

    from numalogic_spark.operators import dedup as DD
    from numalogic_spark.operators import textstats as TS
    from numalogic_spark.operators import tokens as TK

    def quality_filter(df, *, text_col, id_col, min_words=5, max_word_len=25.0):
        stats = TS.text_stats(df, text_col, id_col)
        ok = stats.filter(
            (F.col("n_words") >= min_words) & (F.col("mean_word_len") <= max_word_len)
        ).select(id_col)
        return df.join(ok, id_col, "left_semi")

    def lang_filter(df, *, text_col, id_col, langs):
        lids = TS.lang_id(df, text_col, id_col)
        keep = lids.filter(F.col("lang_pred").isin(list(langs))).select(id_col)
        return df.join(keep, id_col, "left_semi")

    def repetition_filter(df, *, text_col, id_col, max_dup_trigram_frac=0.5,
                          max_top_word_frac=0.5):
        rep = TS.repetition_stats(df, text_col, id_col)
        ok = rep.filter(
            (F.col("dup_trigram_frac") <= max_dup_trigram_frac)
            & (F.col("top_word_frac") <= max_top_word_frac)
        ).select(id_col)
        return df.join(ok, id_col, "left_semi")

    def exact_dedup(df, *, text_col, id_col):
        return DD.drop_exact_dups(df, text_col, id_col)

    def near_dedup(df, *, text_col, id_col, threshold=0.8):
        pairs = DD.minhash_lsh_pairs(df, text_col, id_col, threshold=threshold)
        clusters = DD.near_dup_clusters(pairs)
        drop = clusters.filter(F.col("id") != F.col("cluster_id")).select(
            F.col("id").alias(id_col)
        )
        return df.join(drop, id_col, "left_anti")

    def decontaminate(df, *, text_col, id_col, against, n=13, max_contamination=0.1):
        scores = DD.ngram_contamination(df, against, text_col, id_col, n=n)
        ok = scores.filter(F.col("contamination") <= max_contamination).select(id_col)
        return df.join(ok, id_col, "left_semi")

    def normalize(df, *, text_col, id_col):
        # row-local rewrite: control chars stripped, whitespace collapsed,
        # line structure preserved (BoilerplateFilter still sees lines)
        return df.withColumn(text_col, TS.normalize_text_expr(text_col))

    def scrub_pii(df, *, text_col, id_col):
        # row-local rewrite: ONE projection, no join/shuffle, NULL text
        # passes through, duplicate ids cannot multiply
        return df.withColumn(text_col, TS.scrub_pii_expr(text_col))

    def boilerplate_filter(df, *, text_col, id_col, min_docs=3, min_line_chars=5):
        # reserved temp name (never clobbers a caller column) + LEFT join:
        # a NULL-text doc has no lines and no aggregate row — it must pass
        # through unchanged, not be silently dropped by an inner join
        tmp = "__boilerplate_cleaned"
        out = TS.remove_boilerplate_lines(
            df, text_col, id_col, min_docs=min_docs, min_line_chars=min_line_chars
        ).select(F.col("id").alias(id_col), F.col("cleaned").alias(tmp))
        return (
            df.join(out, id_col, "left")
            .withColumn(
                text_col,
                F.when(F.col(text_col).isNull(), F.col(text_col)).otherwise(F.col(tmp)),
            )
            .drop(tmp)
        )

    def sample(df, *, text_col, id_col, rate, salt=0):
        from numalogic_spark.operators.sampling import deterministic_sample

        return deterministic_sample(df, rate, id_col=id_col, salt=salt)

    def tokenize(df, *, text_col, id_col, source_col="source", method="hash",
                 vocab_path=None, n_merges=4096, max_words=100_000,
                 sample_fraction=None, save_vocab_path=None):
        if method == "bpe":
            from numalogic_spark.functions.bpe import (
                BpeVocab,
                tokenize_corpus,
                train_bpe,
            )

            if vocab_path:
                vocab = BpeVocab.load_hadoop(df.sparkSession, vocab_path)
            else:
                # trains on THIS corpus, every run — pass save_vocab_path
                # to persist the replayable artifact (and vocab_path on
                # later runs to reuse it); untracked retraining gives two
                # runs over drifted corpora different token-id spaces
                vocab = train_bpe(df, n_merges, text_col=text_col,
                                  max_words=max_words,
                                  sample_fraction=sample_fraction)
                if save_vocab_path:
                    vocab.save_hadoop(df.sparkSession, save_vocab_path)
            return tokenize_corpus(df, vocab, text_col=text_col,
                                   id_col=id_col, source_col=source_col)
        return df.select(
            id_col,
            F.col(source_col).alias("source"),
            F.transform(
                F.array_remove(F.split(F.lower(text_col), r"\s+"), ""),
                lambda w: F.xxhash64(w),
            ).alias("tokens"),
        ).withColumn("n_tok", F.size("tokens"))

    def sequence_pack(df, *, text_col, id_col, max_tokens=2048):
        return TK.pack_tokens(df, max_tokens, id_col=id_col)

    def training_order(df, *, text_col, id_col, n_shards, salt=0, key_cols=None):
        from numalogic_spark.operators.sampling import training_order as _to

        # after SequencePack the natural key is (source, pack_id); over a
        # raw/tokenized corpus pass key_cols=[id_col] (or any unique key)
        return _to(df, n_shards, key_cols or ["source", "pack_id"], salt=salt)

    return {
        "QualityFilter": quality_filter,
        "LangFilter": lang_filter,
        "RepetitionFilter": repetition_filter,
        "Normalize": normalize,
        "PiiScrub": scrub_pii,
        "BoilerplateFilter": boilerplate_filter,
        "ExactDedup": exact_dedup,
        "NearDedup": near_dedup,
        "Decontaminate": decontaminate,
        "Sample": sample,
        "Tokenize": tokenize,
        "SequencePack": sequence_pack,
        "TrainingOrder": training_order,
    }


def run_doc_pipeline(
    df: DataFrame,
    stages: list[StageConf],
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Run a declared corpus pipeline stage by stage, yielding
    (stage_name, DataFrame) after each stage so callers can count funnels
    or persist between stages. Unknown names raise with the available set."""
    factory = _doc_stage_factory()
    for st in stages:
        try:
            fn = factory[st.name]
        except KeyError:
            raise ValueError(
                f"unknown corpus stage: {st.name!r}; available: {sorted(factory)}"
            ) from None
        df = fn(df, text_col=text_col, id_col=id_col, **st.conf)
        yield st.name, df
