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
