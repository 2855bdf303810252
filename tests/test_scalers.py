"""Fitted scaler/threshold parity vs the reference formulas (numpy oracle).

Oracles re-implement the math from transforms/_scaler.py and
models/threshold/* directly (float64); Spark fit-stats must reproduce them.
"""

import numpy as np
import pandas as pd
import pytest

from numalogic_spark.functions.scalers import (
    fit_max_percentile_threshold,
    fit_percentile_scaler,
    fit_stddev_threshold,
    fit_tanh_scaler,
    mahalanobis_scores,
    score_threshold,
    transform_percentile_scaler,
    transform_tanh_scaler,
)


@pytest.fixture(scope="module")
def mat(spark):
    rng = np.random.default_rng(42)
    x = rng.random((300, 2)) * 10.0
    x[:, 1] = x[:, 1] * 0 + 5.0  # constant column → std guard path
    pdf = pd.DataFrame({"i": np.arange(300), "a": x[:, 0], "b": x[:, 1]})
    return spark.createDataFrame(pdf), x, pdf


def test_tanh_scaler(mat):
    df, x, pdf = mat
    stats = fit_tanh_scaler(df, ["a", "b"])
    out = transform_tanh_scaler(df, stats, ["a", "b"]).orderBy("i").toPandas()
    mean, std = x[:, 0].mean(), x[:, 0].std()
    exp_a = 0.5 * (np.tanh(0.2 * (x[:, 0] - mean) / std) + 1)
    np.testing.assert_allclose(out["a__scaled"], exp_a, rtol=1e-9)
    # constant column: std := 1 (_scaler.py:72-74) → all values 0.5*(tanh(0)+1)=0.5
    np.testing.assert_allclose(out["b__scaled"], 0.5, rtol=1e-12)
    # mean of scaled data ~0.5 (docstring property, _scaler.py:31)
    assert abs(out["a__scaled"].mean() - 0.5) < 0.05


def test_percentile_scaler(mat):
    df, x, pdf = mat
    stats = fit_percentile_scaler(df, ["a"], max_percentile=99.0)
    out = transform_percentile_scaler(df, stats, ["a"]).orderBy("i").toPandas()
    lo = x[:, 0].min()
    hi = np.percentile(x[:, 0], 99.0)
    exp = (x[:, 0] - lo) / (hi - lo)  # transform does NOT clip (_scaler.py:140-141)
    np.testing.assert_allclose(out["a__scaled"], exp, rtol=1e-9)
    assert out["a__scaled"].max() > 1.0  # values above p99 exceed 1 — faithful


def test_stddev_threshold(mat):
    df, x, pdf = mat
    stats = fit_stddev_threshold(df, ["a"], std_factor=3.0)
    out = score_threshold(df, stats, ["a"]).orderBy("i").toPandas()
    thr = x[:, 0].mean() + 3.0 * x[:, 0].std()
    np.testing.assert_allclose(out["a__score"], x[:, 0] / thr, rtol=1e-9)
    np.testing.assert_array_equal(out["a__pred"], (x[:, 0] >= thr).astype(int))


def test_max_percentile_threshold(mat):
    df, x, pdf = mat
    stats = fit_max_percentile_threshold(df, ["a"], max_inlier_percentile=96.0)
    out = score_threshold(df, stats, ["a"]).orderBy("i").toPandas()
    thr = max(np.percentile(x[:, 0], 96.0), 1e-4)
    np.testing.assert_allclose(out["a__score"], x[:, 0] / thr, rtol=1e-9)


def test_mahalanobis(spark):
    rng = np.random.default_rng(42)
    x = rng.normal(size=(100, 4))
    pdf = pd.DataFrame(
        {
            "source": "s1",
            "event_ts": pd.date_range("2024-01-01", periods=100, freq="min"),
            **{f"f{j}": x[:, j] for j in range(4)},
        }
    )
    df = spark.createDataFrame(pdf)
    out = mahalanobis_scores(df, [f"f{j}" for j in range(4)], id_col="event_ts").orderBy("event_ts").toPandas()
    mu = x.mean(axis=0)
    cov_inv = np.linalg.pinv(np.cov(x, rowvar=False))
    d = x - mu
    md = np.sqrt(np.diagonal(d @ cov_inv @ d.T))
    thr = md.mean() + (1.0 / np.sqrt(0.1)) * md.std()
    np.testing.assert_allclose(out["md"], md, rtol=1e-9)
    np.testing.assert_allclose(out["md_score"], md / thr, rtol=1e-9)
    np.testing.assert_array_equal(out["md_pred"], (md >= thr).astype(int))
    with pytest.raises(ValueError):
        mahalanobis_scores(df, ["f0"], max_outlier_prob=2.0)


def test_per_group_fit(spark):
    """Stats fitted per source stay per source (registry-keyed analog)."""
    rng = np.random.default_rng(1)
    pdf = pd.DataFrame(
        {
            "source": ["g1"] * 100 + ["g2"] * 100,
            "i": list(range(100)) * 2,
            "a": np.concatenate([rng.random(100), rng.random(100) * 100]),
        }
    )
    df = spark.createDataFrame(pdf)
    stats = fit_stddev_threshold(df, ["a"], by=["source"])
    out = score_threshold(df, stats, ["a"], by=["source"]).toPandas()
    for g in ("g1", "g2"):
        xs = pdf[pdf["source"] == g]["a"].to_numpy()
        thr = xs.mean() + 3.0 * xs.std()
        got = out[out["source"] == g].sort_values("i")["a__score"].to_numpy()
        np.testing.assert_allclose(got, xs / thr, rtol=1e-9)


def test_decimal_fit_constant_and_null_series(spark):
    """Regressions: decimal_stats must clamp FP-cancelled negative variance
    (constant series -> NaN sigma otherwise) and count only non-null rows
    like avg/stddev_pop."""
    pdf = pd.DataFrame(
        {
            "source": ["c"] * 10 + ["n"] * 10,
            "a": [0.1] * 10 + [float(i) for i in range(5)] + [None] * 5,
        }
    )
    df = spark.createDataFrame(pdf)
    stats = fit_stddev_threshold(df, ["a"], by=["source"], decimal_stats=True).toPandas()
    stats = stats.set_index("source")["a__thr"]
    assert np.isfinite(stats["c"]) and stats["c"] == pytest.approx(0.1)
    xs = np.arange(5, dtype=float)
    assert stats["n"] == pytest.approx(xs.mean() + 3.0 * xs.std())


def test_mahalanobis_2f_degenerate_series(spark):
    """Perfectly collinear features (det = 0 on every row) must yield
    md=0 / score=0 / finite outputs, not NULL scores."""
    from numalogic_spark.functions.scalers import mahalanobis_scores_2f

    pdf = pd.DataFrame({"source": ["s"] * 20, "i": range(20),
                        "f0": list(range(20)), "f1": list(range(20))})
    out = mahalanobis_scores_2f(
        spark.createDataFrame(pdf), "f0", "f1", by="source", keep_cols=["i"]
    ).toPandas()
    assert len(out) == 20
    assert (out["md"] == 0.0).all()
    assert np.isfinite(out["md_score"]).all() and (out["md_score"] == 0.0).all()


def test_mahalanobis_2f_matches_kernel(spark):
    """The d=2 closed-form expression path must agree with the general-d
    pinv kernel on a well-conditioned series (same cov ddof=1, same
    Chebyshev threshold rule, modulo the 6dp distance quantization)."""
    from numalogic_spark.functions.scalers import mahalanobis_scores, mahalanobis_scores_2f

    rng = np.random.default_rng(8)
    n = 400
    f0 = rng.integers(0, 1000, n)
    f1 = (f0 + rng.integers(0, 500, n)) % 997
    pdf = pd.DataFrame({
        "source": ["s"] * n,
        "event_ts": pd.date_range("2024-01-01", periods=n, freq="min"),
        "f0": f0.astype(float), "f1": f1.astype(float),
    })
    df = spark.createDataFrame(pdf)
    closed = mahalanobis_scores_2f(df, "f0", "f1", by="source", keep_cols=["event_ts"]) \
        .orderBy("event_ts").toPandas()
    kernel = mahalanobis_scores(df, ["f0", "f1"], by="source", id_col="event_ts") \
        .orderBy("event_ts").toPandas()
    np.testing.assert_allclose(closed["md"], kernel["md"], rtol=1e-9)
    np.testing.assert_allclose(closed["md_score"], kernel["md_score"], rtol=1e-5)


def test_max_percentile_threshold_golden_csv(spark):
    """Port of the reference's MaxPercentileThreshold fixture test
    (reference tests/models/threshold/test_median.py:11-39) on its own
    golden CSV: same split (train = all but last 50), p=75,
    min_threshold=1e-3; fitted thresholds must equal
    np.percentile(train, 75, axis=0) floored at 1e-3 (the reference
    asserts feature 1 hits the floor), and scores = x / threshold."""
    import os

    import numpy as np
    import pandas as pd

    from numalogic_spark.functions.scalers import (
        fit_max_percentile_threshold,
        score_threshold,
    )

    csv = os.path.join(os.path.dirname(__file__), "resources", "prom_mv.csv")
    x = pd.read_csv(csv, index_col="timestamp").astype("float32")
    cols = list(x.columns)
    train, test = x[:-50], x[-50:]
    stats = fit_max_percentile_threshold(
        spark.createDataFrame(train.astype(float)), cols,
        max_inlier_percentile=75, min_threshold=1e-3,
    )
    got_thr = stats.collect()[0]
    exp_thr = np.percentile(train.to_numpy(dtype=np.float64), 75, axis=0)
    exp_thr[exp_thr < 1e-3] = 1e-3
    assert len(cols) == 3
    for c, e in zip(cols, exp_thr):
        assert abs(got_thr[f"{c}__thr"] - e) < 1e-9, c
    assert got_thr[f"{cols[1]}__thr"] == 1e-3  # reference: threshold[1] == 1e-3

    scored = score_threshold(
        spark.createDataFrame(test.astype(float).reset_index()), stats, cols
    ).toPandas().set_index("timestamp").sort_index()
    assert scored.shape[0] == 50
    for i, c in enumerate(cols):
        np.testing.assert_allclose(
            scored[f"{c}__score"].to_numpy(),
            test[c].to_numpy(dtype=np.float64) / exp_thr[i],
            rtol=1e-6,
        )


# --------------------------------------------------------------------------
# sklearn-preprocessing scalers (Standard/MinMax/MaxAbs/Robust) — numpy
# oracle replicates sklearn's fit math (ddof=0, linear-interp percentiles,
# zero-scale -> 1); when sklearn is importable the same assertions run
# against the real estimators on float32 fixtures (the reference's own
# test discipline, tests/udfs/test_preprocess.py).
# --------------------------------------------------------------------------

def _sk(name, **kw):
    try:
        import sklearn.preprocessing as P
    except ImportError:
        return None
    return getattr(P, name)(**kw)


def test_standard_scaler(mat):
    from numalogic_spark.functions.scalers import fit_standard_scaler, transform_affine_scaler

    df, x, pdf = mat
    stats = fit_standard_scaler(df, ["a", "b"])
    out = transform_affine_scaler(df, stats, ["a", "b"]).orderBy("i").toPandas()
    exp = (x[:, 0] - x[:, 0].mean()) / x[:, 0].std()
    np.testing.assert_allclose(out["a__scaled"], exp, rtol=1e-9)
    # constant column: scale -> 1 (sklearn _handle_zeros_in_scale) => all 0
    np.testing.assert_allclose(out["b__scaled"], 0.0, atol=1e-12)
    est = _sk("StandardScaler")
    if est is not None:
        sk = est.fit_transform(x.astype(np.float32).astype(np.float64))
        np.testing.assert_allclose(out[["a__scaled", "b__scaled"]].to_numpy(), sk, rtol=1e-5)


def test_standard_scaler_decimal_stats_and_flags(mat):
    from numalogic_spark.functions.scalers import fit_standard_scaler, transform_affine_scaler

    df, x, pdf = mat
    stats = fit_standard_scaler(df, ["a"], decimal_stats=True)
    out = transform_affine_scaler(df, stats, ["a"]).orderBy("i").toPandas()
    exp = (x[:, 0] - x[:, 0].mean()) / x[:, 0].std()
    # decimal stats quantize inputs to 4dp (order-independent exactness for
    # fixed-dp telemetry) — full-precision random doubles land within ~1e-4
    np.testing.assert_allclose(out["a__scaled"], exp, rtol=1e-4, atol=1e-4)
    # with_mean=False keeps location, with_std=False keeps spread
    s2 = fit_standard_scaler(df, ["a"], with_mean=False)
    o2 = transform_affine_scaler(df, s2, ["a"]).orderBy("i").toPandas()
    np.testing.assert_allclose(o2["a__scaled"], x[:, 0] / x[:, 0].std(), rtol=1e-9)
    s3 = fit_standard_scaler(df, ["a"], with_std=False)
    o3 = transform_affine_scaler(df, s3, ["a"]).orderBy("i").toPandas()
    np.testing.assert_allclose(o3["a__scaled"], x[:, 0] - x[:, 0].mean(), rtol=1e-9)


def test_minmax_scaler(mat):
    from numalogic_spark.functions.scalers import fit_minmax_scaler, transform_affine_scaler

    df, x, pdf = mat
    stats = fit_minmax_scaler(df, ["a", "b"])
    out = transform_affine_scaler(df, stats, ["a", "b"]).orderBy("i").toPandas()
    exp = (x[:, 0] - x[:, 0].min()) / (x[:, 0].max() - x[:, 0].min())
    np.testing.assert_allclose(out["a__scaled"], exp, rtol=1e-9)
    # constant column: range -> 1 => x - min == 0
    np.testing.assert_allclose(out["b__scaled"], 0.0, atol=1e-12)
    # non-default feature_range (sklearn: X_std*(b-a)+a)
    s2 = fit_minmax_scaler(df, ["a"], feature_range=(-1.0, 3.0))
    o2 = transform_affine_scaler(df, s2, ["a"]).orderBy("i").toPandas()
    np.testing.assert_allclose(o2["a__scaled"], exp * 4.0 - 1.0, rtol=1e-9)
    est = _sk("MinMaxScaler", feature_range=(-1, 3))
    if est is not None:
        sk = est.fit_transform(x[:, :1])
        np.testing.assert_allclose(o2["a__scaled"].to_numpy(), sk[:, 0], rtol=1e-6)
    with pytest.raises(ValueError, match="feature_range"):
        fit_minmax_scaler(df, ["a"], feature_range=(2.0, 1.0))


def test_maxabs_scaler(spark):
    from numalogic_spark.functions.scalers import fit_maxabs_scaler, transform_affine_scaler

    x = np.array([-4.0, -1.0, 0.0, 2.0])
    df = spark.createDataFrame(pd.DataFrame({"i": range(4), "a": x, "z": 0.0}))
    stats = fit_maxabs_scaler(df, ["a", "z"])
    out = transform_affine_scaler(df, stats, ["a", "z"]).orderBy("i").toPandas()
    np.testing.assert_allclose(out["a__scaled"], x / 4.0, rtol=1e-12)
    # all-zero column: scale -> 1 => unchanged
    np.testing.assert_allclose(out["z__scaled"], 0.0, atol=1e-15)
    est = _sk("MaxAbsScaler")
    if est is not None:
        sk = est.fit_transform(x.reshape(-1, 1))
        np.testing.assert_allclose(out["a__scaled"].to_numpy(), sk[:, 0], rtol=1e-12)


def test_robust_scaler(mat):
    from numalogic_spark.functions.scalers import fit_robust_scaler, transform_affine_scaler

    df, x, pdf = mat
    stats = fit_robust_scaler(df, ["a", "b"])
    out = transform_affine_scaler(df, stats, ["a", "b"]).orderBy("i").toPandas()
    med = np.percentile(x[:, 0], 50.0)
    iqr = np.percentile(x[:, 0], 75.0) - np.percentile(x[:, 0], 25.0)
    np.testing.assert_allclose(out["a__scaled"], (x[:, 0] - med) / iqr, rtol=1e-9)
    # constant column: IQR -> 1 => centered zeros
    np.testing.assert_allclose(out["b__scaled"], 0.0, atol=1e-12)
    est = _sk("RobustScaler")
    if est is not None:
        sk = est.fit_transform(x)
        np.testing.assert_allclose(out[["a__scaled", "b__scaled"]].to_numpy(), sk, rtol=1e-7)
    # custom quantile range + flags
    s2 = fit_robust_scaler(df, ["a"], quantile_range=(10.0, 90.0), with_centering=False)
    o2 = transform_affine_scaler(df, s2, ["a"]).orderBy("i").toPandas()
    dr = np.percentile(x[:, 0], 90.0) - np.percentile(x[:, 0], 10.0)
    np.testing.assert_allclose(o2["a__scaled"], x[:, 0] / dr, rtol=1e-9)
    with pytest.raises(ValueError, match="quantile_range"):
        fit_robust_scaler(df, ["a"], quantile_range=(80.0, 20.0))


def test_affine_inverse_roundtrip(mat):
    from numalogic_spark.functions.scalers import (
        fit_robust_scaler,
        fit_standard_scaler,
        inverse_affine_scaler,
        transform_affine_scaler,
    )

    from pyspark.sql import functions as F

    df, x, pdf = mat
    for fit in (fit_standard_scaler, fit_robust_scaler):
        stats = fit(df, ["a"])
        # stats prefixes are keyed by column name: feed the scaled values
        # back under the fitted name "a" for the inverse map
        fwd = transform_affine_scaler(df.select("i", "a"), stats, ["a"]).select(
            "i", F.col("a__scaled").alias("a")
        )
        back = inverse_affine_scaler(fwd, stats, ["a"]).orderBy("i").toPandas()
        np.testing.assert_allclose(back["a__orig"], x[:, 0], rtol=1e-9)


def test_affine_scalers_per_group(spark):
    from numalogic_spark.functions.scalers import fit_standard_scaler, transform_affine_scaler

    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "i": np.arange(200),
            "g": np.repeat(["p", "q"], 100),
            "v": np.concatenate([rng.random(100) * 3, rng.random(100) * 50 + 10]),
        }
    )
    df = spark.createDataFrame(pdf)
    stats = fit_standard_scaler(df, ["v"], by=["g"])
    out = transform_affine_scaler(df, stats, ["v"], by=["g"]).orderBy("i").toPandas()
    for g in ("p", "q"):
        vals = pdf[pdf["g"] == g]["v"].to_numpy()
        exp = (vals - vals.mean()) / vals.std()
        np.testing.assert_allclose(out[out["g"] == g]["v__scaled"], exp, rtol=1e-9)
