"""Forecast baselines: ports of tests/models/forecast/test_naive.py plus
Spark seasonal-naive operator parity vs a pandas oracle."""

import numpy as np
import pandas as pd
import pytest

from numalogic_spark.operators.forecast import (
    BaselineForecaster,
    SeasonalNaiveForecaster,
    _r2_np,
    forecast_metrics,
    seasonal_naive,
)
from numalogic_spark.synthetic import SyntheticTSGenerator


@pytest.fixture(scope="module")
def split():
    gen = SyntheticTSGenerator(seq_len=7200, num_series=3, freq="min")
    ts_df = gen.gen_tseries()
    return gen.train_test_split(ts_df, test_size=1440)


def test_baseline_forecaster(split):
    train_df, test_df = split
    model = BaselineForecaster()
    model.fit(train_df)
    pred_df = model.predict(test_df)
    assert pred_df.shape == test_df.shape
    # constant-mean forecast: each column is a single repeated value
    assert (pred_df.nunique() == 1).all()
    r2 = model.r2_score(test_df)
    assert isinstance(r2, float)
    anomaly_df = model.score(test_df)
    assert anomaly_df.shape == test_df.shape
    # tanh-normalized scores live in [0, 10)
    assert (anomaly_df.to_numpy() >= 0).all() and (anomaly_df.to_numpy() < 10).all()
    with pytest.raises(ValueError, match="not fitted"):
        BaselineForecaster().predict(test_df)


def test_seasonal_naive_forecaster(split):
    train_df, test_df = split
    model = SeasonalNaiveForecaster()  # daily, period 1440
    model.fit(train_df)
    pred_df = model.predict(test_df)
    assert pred_df.shape == test_df.shape
    # the prediction IS the train tail (z round-trip), per the reference
    np.testing.assert_allclose(
        pred_df.to_numpy(), train_df.iloc[-1440:].to_numpy(), rtol=1e-9
    )
    assert isinstance(model.r2_score(test_df), float)
    # shorter test window takes the leading slice of the final period
    short = model.predict(test_df.iloc[:100])
    np.testing.assert_allclose(
        short.to_numpy(), train_df.iloc[-1440:-1340].to_numpy(), rtol=1e-9
    )
    with pytest.raises(RuntimeError):
        model.predict(pd.concat([test_df, test_df]))
    with pytest.raises(ValueError, match="too small"):
        SeasonalNaiveForecaster("weekly").fit(train_df)
    with pytest.raises(NotImplementedError):
        SeasonalNaiveForecaster("hourly")


def test_r2_matches_sklearn_formula():
    rng = np.random.default_rng(0)
    y = rng.random((50, 2))
    p = y + rng.normal(0, 0.1, (50, 2))
    got = _r2_np(y, p)
    exp = np.mean(
        [1 - ((y[:, i] - p[:, i]) ** 2).sum() / ((y[:, i] - y[:, i].mean()) ** 2).sum()
         for i in range(2)]
    )
    np.testing.assert_allclose(got, exp, rtol=1e-12)
    sk = pytest.importorskip("sklearn.metrics")
    np.testing.assert_allclose(got, sk.r2_score(y, p), rtol=1e-12)


def test_spark_seasonal_naive_and_metrics(spark):
    """Time-shift join == pandas groupby-shift oracle, gaps yield NULL
    forecasts, and the metrics aggregation matches numpy."""
    rng = np.random.default_rng(8)
    buckets = pd.date_range("2024-01-01", periods=96, freq="1h")
    rows = []
    for s in ("a", "b"):
        vals = rng.random(96) * 50 + (10 if s == "a" else 200)
        for i, (t, v) in enumerate(zip(buckets, vals)):
            if s == "b" and i == 30:
                continue  # gap: bucket 30 missing for series b
            rows.append((s, t, float(v)))
    pdf = pd.DataFrame(rows, columns=["source", "bucket_ts", "value"])
    df = spark.createDataFrame(pdf)
    out = seasonal_naive(df, period_s=86400, value_col="value").toPandas()

    oracle = pdf.copy()
    prior = pdf.copy()
    prior["bucket_ts"] = prior["bucket_ts"] + pd.Timedelta(seconds=86400)
    oracle = oracle.merge(
        prior.rename(columns={"value": "forecast"}), on=["source", "bucket_ts"], how="left"
    )
    merged = out.sort_values(["source", "bucket_ts"], ignore_index=True)
    oracle = oracle.sort_values(["source", "bucket_ts"], ignore_index=True)
    pd.testing.assert_frame_equal(
        merged[["source", "bucket_ts", "value", "forecast"]],
        oracle[["source", "bucket_ts", "value", "forecast"]],
    )
    # series b: bucket 30+24h exists but has no prior -> NULL forecast
    b = merged[merged["source"] == "b"]
    gap_target = buckets[30] + pd.Timedelta(seconds=86400)
    assert np.isnan(b[b["bucket_ts"] == gap_target]["forecast"].iloc[0])

    mets = forecast_metrics(seasonal_naive(df, 86400, value_col="value")).toPandas()
    for s in ("a", "b"):
        sub = oracle[(oracle["source"] == s) & oracle["forecast"].notna()]
        y, f = sub["value"].to_numpy(), sub["forecast"].to_numpy()
        row = mets[mets["source"] == s].iloc[0]
        np.testing.assert_allclose(row["mae"], np.abs(y - f).mean(), rtol=1e-6)
        np.testing.assert_allclose(row["rmse"], np.sqrt(((y - f) ** 2).mean()), rtol=1e-6)
        np.testing.assert_allclose(row["r2"], _r2_np(y, f), rtol=1e-5)


def test_r2_constant_column_sklearn_convention():
    """ss_tot==0: perfectly predicted constant -> 1.0, imperfect -> 0.0."""
    y = np.full(10, 5.0)
    np.testing.assert_allclose(_r2_np(y, y.copy()), 1.0)
    np.testing.assert_allclose(_r2_np(y, y + 1.0), 0.0)


class TestHoltLinear:
    def _oracle(self, xs, a=0.5, b=0.25):
        oa, ob = 1.0 - a, 1.0 - b
        lev, tr = xs[0], xs[1] - xs[0]
        rows = [(lev, tr, None)]
        for t in range(1, len(xs)):
            f = lev + tr
            ln = a * xs[t] + oa * (lev + tr)
            tr = b * (ln - lev) + ob * tr
            lev = ln
            rows.append((lev, tr, f))
        return rows

    def test_matches_python_recursion(self, spark):
        from numalogic_spark.operators.forecast import holt_linear

        rng = np.random.default_rng(11)
        rows = []
        series = {}
        for s in range(3):
            xs = np.round(10 + 0.3 * np.arange(50) + rng.normal(0, 1, 50), 2)
            series[f"s{s}"] = [float(v) for v in xs]
            rows += [(f"s{s}", i * 3600, float(v)) for i, v in enumerate(xs)]
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["source", "bucket_s", "val"])
        )
        got = holt_linear(df, alpha=0.5, beta=0.25).collect()
        by = {(r["source"], r["bucket_s"] // 3600): r for r in got}
        assert len(by) == 150
        for s, xs in series.items():
            want = self._oracle(xs)
            for i, (lev, tr, f) in enumerate(want):
                r = by[(s, i)]
                assert r["level"] == lev and r["trend"] == tr, (s, i)
                assert (r["fitted"] is None) == (f is None)
                if f is not None:
                    assert r["fitted"] == f
        # trend tracks the injected +0.3/step slope once warmed up
        tail_trends = [by[(s, 49)]["trend"] for s in series]
        assert all(0.1 < t < 0.5 for t in tail_trends)

    def test_short_series_dropped_and_validation(self, spark):
        from numalogic_spark.operators.forecast import holt_linear

        df = spark.createDataFrame(
            pd.DataFrame(
                [("one", 0, 1.0), ("two", 0, 1.0), ("two", 3600, 2.0)],
                columns=["source", "bucket_s", "val"],
            )
        )
        out = holt_linear(df).collect()
        assert {r["source"] for r in out} == {"two"}
        with pytest.raises(ValueError):
            holt_linear(df, alpha=0.0)


class TestKalmanLevel:
    def test_matches_python_recursion_and_tracks_shift(self, spark):
        from numalogic_spark.operators.forecast import kalman_level

        rng = np.random.default_rng(53)
        x = 10 + rng.normal(0, 2, 120)
        x[60:] += 15.0
        pdf = pd.DataFrame(
            [("a", i * 3600, float(round(v, 2))) for i, v in enumerate(x)],
            columns=["source", "bucket_s", "val"],
        )
        got = (
            kalman_level(spark.createDataFrame(pdf), q=1.0, r=4.0)
            .toPandas()
            .sort_values("bucket_s", ignore_index=True)
        )
        zs = pdf["val"].to_list()
        xh, p = zs[0], 4.0
        assert got.loc[0, "level"] == xh and pd.isna(got.loc[0, "gain"])
        for t in range(1, len(zs)):
            pp = p + 1.0
            k = pp / (pp + 4.0)
            innov = zs[t] - xh
            xh = xh + k * innov
            p = (1.0 - k) * pp
            assert got.loc[t, "level"] == xh, t
            assert got.loc[t, "gain"] == k, t
            assert got.loc[t, "innovation"] == innov, t
        # gain converges to the steady state k* = (sqrt(q^2+4qr)-q+... )
        # for q=1, r=4: k* solves k = (p+1)/(p+5), p = (1-k)(p+1) -> ~0.39
        tail_gain = got["gain"].iloc[-1]
        assert abs(tail_gain - got["gain"].iloc[-2]) < 1e-9
        assert 0.3 < tail_gain < 0.5
        # level catches the +15 shift within ~6 steps
        assert abs(got.loc[66, "level"] - x[60:].mean()) < 3.0
        with pytest.raises(ValueError):
            kalman_level(spark.createDataFrame(pdf), q=0.0)
