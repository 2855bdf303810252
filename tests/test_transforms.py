"""Closed-form transform parity vs numpy oracles — ports of
/root/reference/tests/transforms/test_transforms.py:29-204 and
test_postprocess.py:14-56 (golden scalar + EWM consistency)."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from numalogic_spark.functions import transforms as TX
from numalogic_spark.functions.aggregators import expmov_avg_np, window_agg_expr


@pytest.fixture(scope="module")
def xdf(spark):
    rng = np.random.default_rng(42)
    x = rng.random(200) * 10.0
    pdf = pd.DataFrame({"i": np.arange(200), "x": x})
    return spark.createDataFrame(pdf), x


def _col(spark_df, expr, x=None):
    return spark_df.select(expr.alias("y")).orderBy(F.col("y").isNull()).toPandas()["y"].to_numpy()


def test_log_and_inverse(xdf):
    df, x = xdf
    got = df.select(TX.log_transform("x", 2.0).alias("y"), "i").orderBy("i").toPandas()["y"]
    np.testing.assert_allclose(got, np.log(x + 2.0), rtol=1e-12)
    back = df.select(TX.log_inverse(TX.log_transform("x", 2.0), 2.0).alias("y"), "i").orderBy("i").toPandas()["y"]
    np.testing.assert_allclose(back, x, rtol=1e-9)


def test_power_and_inverse(xdf):
    df, x = xdf
    got = df.select(TX.static_power_transform("x", 3.0, 1.0).alias("y"), "i").orderBy("i").toPandas()["y"]
    np.testing.assert_allclose(got, np.power(x + 1.0, 3.0), rtol=1e-12)
    back = df.select(
        TX.static_power_inverse(TX.static_power_transform("x", 3.0, 1.0), 3.0, 1.0).alias("y"), "i"
    ).orderBy("i").toPandas()["y"]
    np.testing.assert_allclose(back, x, rtol=1e-9)


def test_clipper(xdf):
    df, x = xdf
    got = df.select(TX.data_clipper("x", 2.0, 8.0).alias("y"), "i").orderBy("i").toPandas()["y"]
    np.testing.assert_allclose(got, np.clip(x, 2.0, 8.0), rtol=0)
    with pytest.raises(ValueError):
        TX.data_clipper("x")
    with pytest.raises(ValueError):
        TX.data_clipper("x", 5.0, 1.0)


def test_tanh_norm_golden(spark):
    """sum(tanh_norm(arange(10))) ≈ 39.52 — test_postprocess.py:14-17."""
    df = spark.createDataFrame(pd.DataFrame({"x": np.arange(10, dtype=float)}))
    s = df.select(F.sum(TX.tanh_norm("x")).alias("s")).collect()[0]["s"]
    assert round(s, 2) == 39.52


def test_sigmoid_norm(xdf):
    df, x = xdf
    got = df.select(TX.sigmoid_norm("x").alias("y"), "i").orderBy("i").toPandas()["y"]
    np.testing.assert_allclose(got, 10.0 / (1.0 + np.exp(5.0 - 0.5 * x)), rtol=1e-12)


def test_static_threshold(xdf):
    df, x = xdf
    got = df.select(TX.static_threshold_score("x", 5.0, 10.0, 0.5).alias("y"), "i").orderBy("i").toPandas()["y"]
    exp = np.where(x >= 5.0, 10.0, 0.5)
    np.testing.assert_array_equal(got, exp)
    with pytest.raises(ValueError):
        TX.static_threshold_score("x", 5.0, outlier_score=0.1, inlier_score=0.5)


def test_sigmoid_threshold(xdf):
    df, x = xdf
    got = df.select(TX.sigmoid_threshold_score("x", 5.0).alias("y"), "i").orderBy("i").toPandas()["y"]
    arg = np.clip(-(5.0 * math.pi) * (x - 5.0), -88.72, 88.72)  # _static.py:124-125
    np.testing.assert_allclose(got, 10.0 / (1.0 + np.exp(arg)), rtol=1e-12)


def test_difference_transform(spark):
    """Literal diff matrix — test_transforms.py:161-173 analog."""
    pdf = pd.DataFrame(
        {"g": "a", "i": range(5), "x": [1.0, 4.0, 2.0, 2.0, 10.0]}
    )
    df = spark.createDataFrame(pdf)
    got = (
        df.select("i", TX.difference_transform("x", order_by=["i"], partition_by=["g"]).alias("d"))
        .orderBy("i")
        .toPandas()["d"]
        .to_numpy()
    )
    exp = pd.DataFrame({"x": pdf["x"]}).diff().bfill().to_numpy().reshape(-1)
    np.testing.assert_allclose(got, exp)


def test_impute_nan_inf(spark):
    pdf = pd.DataFrame({"x": [1.0, np.nan, np.inf, -np.inf, 2.0]})
    df = spark.createDataFrame(pdf)
    got = df.select(TX.impute_nan_inf("x").alias("y")).toPandas()["y"].to_numpy()
    assert sorted(got.tolist()) == [0.0, 0.0, 0.0, 1.0, 2.0]


def test_expmov_avg_matches_pandas_ewm():
    """Aggregator == last element of pandas ewm (adjust=True) —
    test_postprocess.py:29-38 consistency check."""
    x = np.arange(10, dtype=float)
    for beta in (0.3, 0.5, 0.9):
        agg = expmov_avg_np(x, beta)
        ewm_last = pd.Series(x).ewm(alpha=1.0 - beta).mean().iloc[-1]
        np.testing.assert_allclose(agg, ewm_last, rtol=1e-12)
    with pytest.raises(ValueError):
        expmov_avg_np(x, 1.5)


def test_expmov_avg_bias_correction_flag():
    """bias_correction=False: V = (1-β)·Σ β^(n-1-i)·x_i without the
    /(1-β^n) correction (_movavg.py:66-71)."""
    x = np.arange(1, 8, dtype=float)
    beta = 0.4
    w = np.power(beta, np.arange(len(x) - 1, -1, -1))
    raw = (1 - beta) * float(w @ x)
    np.testing.assert_allclose(expmov_avg_np(x, beta, bias_correction=False), raw, rtol=1e-12)
    np.testing.assert_allclose(expmov_avg_np(x, beta, True), raw / (1 - beta ** len(x)), rtol=1e-12)


def test_percentile_scaler_with_min_percentile(spark):
    """PercentileScaler with explicit min_percentile (the _scaler.py:115-118
    branch): lo = percentile(x, p_min) instead of min(x)."""
    from numalogic_spark.functions.scalers import fit_percentile_scaler, transform_percentile_scaler

    rng = np.random.default_rng(5)
    x = rng.random(300) * 50
    df = spark.createDataFrame(pd.DataFrame({"i": np.arange(300), "a": x}))
    stats = fit_percentile_scaler(df, ["a"], max_percentile=98.0, min_percentile=5.0)
    out = transform_percentile_scaler(df, stats, ["a"]).orderBy("i").toPandas()
    lo, hi = np.percentile(x, 5.0), np.percentile(x, 98.0)
    np.testing.assert_allclose(out["a__scaled"], (x - lo) / (hi - lo), rtol=1e-9)
    assert out["a__scaled"].min() < 0  # values below p5 go negative — faithful


def test_window_agg_expr_exp(spark):
    x = np.arange(1, 13, dtype=float)
    df = spark.createDataFrame(pd.DataFrame({"w": [x.tolist()]}))
    for method, exp in [
        ("MAX", x.max()),
        ("MIN", x.min()),
        ("MEAN", x.mean()),
        ("EXP", expmov_avg_np(x, 0.6)),
    ]:
        got = df.select(window_agg_expr("w", method, beta=0.6).alias("y")).collect()[0]["y"]
        np.testing.assert_allclose(got, exp, rtol=1e-12, err_msg=method)
