"""RobustMahalanobisThreshold (deterministic MinCovDet) parity tests.

Oracle = the shared numpy fit (robust_mahalanobis_fit_np) — the same
function the DuckDB oracle generator replays; sklearn.covariance.MinCovDet
parity asserts run when sklearn is importable (the reference's dependency,
_mahalanobis.py:16)."""

import numpy as np
import pandas as pd
import pytest

from numalogic_spark.functions.robust import (
    chi2_ppf,
    fit_robust_mahalanobis,
    mincovdet_fit,
    robust_mahalanobis_fit_np,
    score_robust_mahalanobis,
)


def test_chi2_ppf_known_values():
    # scipy.stats.chi2.ppf references
    np.testing.assert_allclose(chi2_ppf(0.5, 2), 1.3862943611198906, rtol=1e-9)
    np.testing.assert_allclose(chi2_ppf(0.975, 1), 5.023886187314888, rtol=1e-9)
    np.testing.assert_allclose(chi2_ppf(0.975, 2), 7.377758908227871, rtol=1e-9)
    np.testing.assert_allclose(chi2_ppf(0.95, 2), 5.991464547107979, rtol=1e-9)
    np.testing.assert_allclose(chi2_ppf(0.5, 1), 0.45493642311957305, rtol=1e-9)
    with pytest.raises(ValueError):
        chi2_ppf(1.5, 2)


@pytest.fixture(scope="module")
def contaminated():
    rng = np.random.default_rng(7)
    clean = rng.multivariate_normal([10.0, -4.0], [[2.0, 0.8], [0.8, 1.5]], size=270)
    outliers = rng.multivariate_normal([60.0, 50.0], [[1.0, 0.0], [0.0, 1.0]], size=30)
    return np.vstack([clean, outliers]), clean


def test_mincovdet_resists_contamination(contaminated):
    x, clean = contaminated
    fit = mincovdet_fit(x, support_fraction=0.7, seed=42)
    # classical mean is dragged ~5 units toward the outlier cloud; the MCD
    # location must stay near the clean center
    assert np.linalg.norm(x.mean(axis=0) - [10.0, -4.0]) > 3.0
    assert np.linalg.norm(fit["location"] - clean.mean(axis=0)) < 0.5
    # covariance close to the clean empirical covariance, not the inflated one
    clean_cov = np.cov(clean, rowvar=False)
    assert np.linalg.norm(fit["covariance"] - clean_cov) < 1.5
    assert np.linalg.norm(np.cov(x, rowvar=False) - clean_cov) > 50.0
    # precision is PSD and the support excludes the outlier block
    eigs = np.linalg.eigvalsh(fit["precision"])
    assert (eigs >= -1e-12).all()
    assert fit["support"][270:].sum() == 0


def test_mincovdet_deterministic(contaminated):
    x, _ = contaminated
    a = mincovdet_fit(x, seed=42)
    b = mincovdet_fit(x, seed=42)
    np.testing.assert_array_equal(a["location"], b["location"])
    np.testing.assert_array_equal(a["precision"], b["precision"])
    # permuting rows then sorting back to canonical order reproduces the fit
    perm = np.random.default_rng(0).permutation(len(x))
    xs = x[perm]
    order = np.lexsort((xs[:, 1], xs[:, 0]))
    x_sorted = xs[order]
    ref_order = np.lexsort((x[:, 1], x[:, 0]))
    c = mincovdet_fit(x[ref_order], seed=42)
    d_ = mincovdet_fit(x_sorted, seed=42)
    np.testing.assert_array_equal(c["location"], d_["location"])


def test_mincovdet_validations():
    with pytest.raises(ValueError, match="support_fraction"):
        mincovdet_fit(np.zeros((10, 2)), support_fraction=1.5)
    with pytest.raises(ValueError, match="more samples"):
        mincovdet_fit(np.zeros((2, 2)))
    with pytest.raises(ValueError, match="max_outlier_prob"):
        robust_mahalanobis_fit_np(np.zeros((10, 2)) + np.arange(10)[:, None], max_outlier_prob=2.0)


def test_sklearn_mincovdet_parity(contaminated):
    sklearn_cov = pytest.importorskip("sklearn.covariance")
    x, _ = contaminated
    sk = sklearn_cov.MinCovDet(support_fraction=0.7, random_state=0).fit(x)
    fit = mincovdet_fit(x, support_fraction=0.7, seed=42)
    # different random subset searches converge to the same robust optimum
    # on well-separated contamination — statistical, not bit, parity
    np.testing.assert_allclose(fit["location"], sk.location_, rtol=0.05, atol=0.1)
    np.testing.assert_allclose(fit["covariance"], sk.covariance_, rtol=0.25, atol=0.3)


def test_threshold_contract(contaminated):
    x, _ = contaminated
    loc, prec, thr = robust_mahalanobis_fit_np(x, max_outlier_prob=0.1, seed=42)
    d = x - loc
    md = np.sqrt(np.maximum(np.einsum("ij,jk,ik->i", d, prec, d), 0.0))
    k = 1.0 / np.sqrt(0.1)
    np.testing.assert_allclose(thr, md.mean() + k * md.std(), rtol=1e-12)
    # robust distances separate the outlier block from the clean bulk by
    # an order of magnitude (the property the classical fit loses)
    assert md[270:].min() > 10 * md[:270].max()
    assert (md[:270] / thr < 1.0).all()


def test_spark_fit_and_score_match_numpy(spark, contaminated):
    x, _ = contaminated
    rng = np.random.default_rng(3)
    # two series with different geometry
    x2 = rng.multivariate_normal([0.0, 0.0], [[1.0, -0.4], [-0.4, 2.0]], size=150)
    pdf = pd.DataFrame(
        {
            "source": ["a"] * len(x) + ["b"] * len(x2),
            "i": list(range(len(x))) + list(range(len(x2))),
            "f0": np.concatenate([x[:, 0], x2[:, 0]]),
            "f1": np.concatenate([x[:, 1], x2[:, 1]]),
        }
    )
    df = spark.createDataFrame(pdf)
    stats = fit_robust_mahalanobis(
        df, ["f0", "f1"], by=["source"], order_by=["i"], seed=42
    )
    got_stats = {r["source"]: r for r in stats.collect()}
    for key, mat in (("a", x), ("b", x2)):
        loc, prec, thr = robust_mahalanobis_fit_np(mat, seed=42)
        np.testing.assert_array_equal(got_stats[key]["loc"], loc)
        np.testing.assert_array_equal(got_stats[key]["prec"], prec.reshape(-1))
        np.testing.assert_allclose(got_stats[key]["md_thresh"], thr, rtol=0)

    out = (
        score_robust_mahalanobis(df, stats, ["f0", "f1"], by=["source"])
        .orderBy("source", "i")
        .toPandas()
    )
    for key, mat in (("a", x), ("b", x2)):
        loc, prec, thr = robust_mahalanobis_fit_np(mat, seed=42)
        d = mat - loc
        md = np.sqrt(np.maximum(np.einsum("ij,jk,ik->i", d, prec, d), 0.0))
        sub = out[out["source"] == key]
        np.testing.assert_allclose(sub["md"], md, rtol=1e-9)
        np.testing.assert_allclose(sub["md_score"], md / thr, rtol=1e-9)
        np.testing.assert_array_equal(sub["md_pred"], (md >= thr).astype(int))


def test_spark_small_group_dropped_and_global_fit(spark):
    rng = np.random.default_rng(1)
    big = rng.normal(size=(50, 2)) + 5.0
    pdf = pd.DataFrame(
        {
            "source": ["big"] * 50 + ["tiny"] * 2,
            "i": list(range(50)) + [0, 1],
            "f0": np.concatenate([big[:, 0], [0.0, 1.0]]),
            "f1": np.concatenate([big[:, 1], [0.0, 1.0]]),
        }
    )
    df = spark.createDataFrame(pdf)
    stats = fit_robust_mahalanobis(df, ["f0", "f1"], by=["source"], order_by=["i"])
    assert [r["source"] for r in stats.collect()] == ["big"]
    # grouped scoring LEFT-joins: unfitted series keep their rows with
    # NULL scores instead of silently vanishing
    grouped = score_robust_mahalanobis(df, stats, ["f0", "f1"], by=["source"]).toPandas()
    assert len(grouped) == 52
    tiny = grouped[grouped["source"] == "tiny"]
    assert len(tiny) == 2 and tiny["md"].isna().all()
    assert grouped[grouped["source"] == "big"]["md"].notna().all()
    # by=None: one global fit, cross-join scoring
    gstats = fit_robust_mahalanobis(df, ["f0", "f1"], order_by=["source", "i"])
    assert gstats.count() == 1
    scored = score_robust_mahalanobis(df, gstats, ["f0", "f1"])
    assert scored.count() == 52
    # a global fit over a too-small input raises (reference fit contract)
    tiny_df = spark.createDataFrame(
        pdf.iloc[:2][["source", "i", "f0", "f1"]]
    )
    with pytest.raises(Exception, match="more samples"):
        fit_robust_mahalanobis(tiny_df, ["f0", "f1"], order_by=["i"]).collect()


def test_factory_dispatch(spark):
    from numalogic_spark.config import PipelineConf, StageConf, fit_and_score

    rng = np.random.default_rng(5)
    pdf = pd.DataFrame(
        {
            "source": "s",
            "i": range(120),
            "f0": rng.normal(size=120),
            "f1": rng.normal(size=120),
        }
    )
    df = spark.createDataFrame(pdf)
    cfg = PipelineConf(
        metrics=["f0", "f1"],
        threshold=StageConf(
            "RobustMahalanobisThreshold", {"seed": 7, "order_by": ["i"]}
        ),
    )
    out = fit_and_score(df, cfg, by=["source"]).toPandas()
    assert {"md", "md_score", "md_pred"} <= set(out.columns)
    assert len(out) == 120
