"""score_pipeline vs the literal reference-loop oracle (backtest analog)."""

import numpy as np
import pandas as pd
import pytest

from numalogic_spark.operators.pipeline import ScoreConfig, score_pipeline, score_pipeline_oracle


@pytest.fixture(scope="module")
def series(spark):
    rng = np.random.default_rng(42)
    rows = []
    for src in ("s1", "s2"):
        ts = pd.date_range("2024-01-01", periods=120, freq="min")
        rows.append(
            pd.DataFrame(
                {
                    "source": src,
                    "event_ts": ts,
                    "m0": rng.random(120) * 10 + (5 if src == "s2" else 0),
                    "m1": rng.random(120) * 2,
                }
            )
        )
    pdf = pd.concat(rows, ignore_index=True)
    return spark.createDataFrame(pdf), pdf


def test_pipeline_matches_reference_loop(spark, series):
    df, pdf = series
    cfg = ScoreConfig(metrics=["m0", "m1"], seq_len=12, beta=0.5, static_limit=None)
    got = score_pipeline(df, cfg).orderBy("source", "end_ts").toPandas()
    exp = score_pipeline_oracle(pdf, cfg).sort_values(["source", "end_ts"], ignore_index=True)
    assert len(got) == len(exp) == 2 * (120 - 11)
    np.testing.assert_allclose(got["unified_raw"], exp["unified_raw"], rtol=1e-9)
    np.testing.assert_allclose(got["unified_score"], exp["unified_score"], rtol=1e-9)


def test_pipeline_static_adjust(spark, series):
    df, pdf = series
    cfg = ScoreConfig(metrics=["m0"], seq_len=12, static_limit=9.0)
    got = score_pipeline(df, cfg).orderBy("source", "end_ts").toPandas()
    exp = score_pipeline_oracle(pdf, cfg).sort_values(["source", "end_ts"], ignore_index=True)
    np.testing.assert_allclose(got["adjusted_score"], exp["adjusted_score"], rtol=1e-9)
    # adjust is max(static, trained) — never below the trained score (O3)
    assert (got["adjusted_score"] >= got["unified_score"] - 1e-12).all()


def test_pipeline_window_agg_variants(spark, series):
    df, pdf = series
    for method in ("MEAN", "MAX", "MIN"):
        cfg = ScoreConfig(metrics=["m0"], seq_len=8, window_agg=method)
        got = score_pipeline(df, cfg).orderBy("source", "end_ts").toPandas()
        exp = score_pipeline_oracle(pdf, cfg).sort_values(["source", "end_ts"], ignore_index=True)
        np.testing.assert_allclose(got["unified_raw"], exp["unified_raw"], rtol=1e-9, err_msg=method)
