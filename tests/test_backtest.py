"""Backtest end-to-end vs a literal python re-implementation of the
reference flow (fit on train head, per-window loop on test tail)."""

import numpy as np
import pandas as pd

from numalogic_spark.functions.aggregators import expmov_avg_np
from numalogic_spark.operators.backtest import backtest
from numalogic_spark.operators.pipeline import ScoreConfig
from numalogic_spark.synthetic import gen_timeseries_pandas, inject_anomalies_pandas


def _oracle(pdf, cfg, test_ratio):
    rows = []
    for src, g in pdf.groupby("series"):
        g = g.sort_values("event_ts")
        n = len(g)
        n_test = int(np.floor(n * test_ratio))
        train, test = g.iloc[: n - n_test], g.iloc[n - n_test :]
        x_tr = train[["value"]].to_numpy(dtype=float)
        # 1e-12 floor mirrors the engine's constant-zero-series guard
        thr = max(x_tr.mean() + cfg.std_factor * x_tr.std(), cfg.min_threshold, 1e-12)
        s = test["value"].to_numpy(dtype=float) / thr
        for end in range(cfg.seq_len - 1, len(test)):
            win = s[end - cfg.seq_len + 1 : end + 1]
            unified = expmov_avg_np(win, cfg.beta)
            rows.append(
                {
                    "source": src,
                    "end_ts": test["event_ts"].iloc[end],
                    "unified_score": cfg.scale_factor * np.tanh(unified / cfg.smooth_factor),
                }
            )
    return pd.DataFrame(rows)


def test_backtest_matches_reference_flow(spark):
    pdf = gen_timeseries_pandas(n_rows=300, n_series=3, seed=11).rename(columns={"series": "series"})
    pdf = inject_anomalies_pandas(pdf, anomaly_ratio=0.1, impact=4.0, seed=11)
    cfg = ScoreConfig(metrics=["value"], seq_len=12, beta=0.5)
    df = spark.createDataFrame(pdf.rename(columns={"series": "source"}))
    got = (
        backtest(df, cfg, test_ratio=0.33, min_train_size=50)
        .orderBy("source", "end_ts")
        .toPandas()
    )
    exp = _oracle(pdf.rename(columns={"series": "source"}).rename(columns={"source": "series"}), cfg, 0.33)
    exp = exp.sort_values(["source", "end_ts"], ignore_index=True)
    assert len(got) == len(exp)
    np.testing.assert_allclose(got["unified_score"], exp["unified_score"], rtol=1e-9)
    # anomalous windows score higher than clean ones on average
    m = got.merge(
        pdf.rename(columns={"series": "source", "event_ts": "end_ts"})[["source", "end_ts", "is_anomaly"]],
        on=["source", "end_ts"],
    )
    assert m[m.is_anomaly]["unified_score"].mean() > m[~m.is_anomaly]["unified_score"].mean()


def test_backtest_reference_golden_csv(spark):
    """Backtest over the reference's own multivariate golden fixture
    (numalogic tests/resources/data/prom_mv.csv, Apache-2.0; the reference
    drives PromBacktester over it in tests/test_backtest.py). Asserts the
    reference test's structural contract — scores cover the test tail —
    plus exact score parity with the literal per-window reference loop on
    real (not synthetic) data, multi-metric."""
    import os

    csv = os.path.join(os.path.dirname(__file__), "resources", "prom_mv.csv")
    pdf = pd.read_csv(csv, parse_dates=["timestamp"])
    metrics = [c for c in pdf.columns if c != "timestamp"]
    long = pdf.melt(id_vars=["timestamp"], value_vars=metrics,
                    var_name="source", value_name="value").rename(
        columns={"timestamp": "event_ts"})
    cfg = ScoreConfig(metrics=["value"], seq_len=12, beta=0.5)
    test_ratio = 0.33
    df = spark.createDataFrame(long)
    got = backtest(df, cfg, test_ratio=test_ratio, min_train_size=50).orderBy(
        "source", "end_ts").toPandas()
    n = (pdf.shape[0] // 1)
    n_test = int(np.floor(n * test_ratio))
    # one row per full window per metric series (reference: scores span the
    # test tail; our window pipeline drops the first seq_len-1 partials)
    assert len(got) == len(metrics) * (n_test - cfg.seq_len + 1)
    exp = _oracle(long.rename(columns={"source": "series"}), cfg, test_ratio)
    exp = exp.sort_values(["source", "end_ts"], ignore_index=True)
    np.testing.assert_allclose(got["unified_score"], exp["unified_score"], rtol=1e-9)


def test_backtest_short_series_dropped(spark):
    pdf = gen_timeseries_pandas(n_rows=20, n_series=1, seed=3).rename(columns={"series": "source"})
    df = spark.createDataFrame(pdf)
    assert backtest(df, ScoreConfig(metrics=["value"]), min_train_size=50).count() == 0
