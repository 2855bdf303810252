"""tsfeatures operators vs independent numpy oracles (statsmodels-style
ACF, brute-force CUSUM, pandas-free Hampel, classical decomposition)."""

import numpy as np
import pandas as pd
import pytest

from numalogic_spark.operators.tsfeatures import (
    acf,
    cusum_changepoint,
    hampel_filter,
    stl_lite,
)


def _frame(spark, n=240, n_src=3, seed=7, shift_at=None):
    rng = np.random.default_rng(seed)
    rows = []
    for s in range(n_src):
        base = 10.0 + 2.0 * np.sin(2 * np.pi * np.arange(n) / 24.0)
        x = base + rng.normal(0, 0.5, n)
        if shift_at is not None:
            x[shift_at:] += 4.0
        x = np.round(x, 2)
        for i in range(n):
            rows.append((f"s{s}", i * 60, i, float(x[i])))
    pdf = pd.DataFrame(rows, columns=["source", "ts_s", "event_id", "value"])
    return spark.createDataFrame(pdf), pdf


def _acf_np(x, k):
    x = np.asarray(x, dtype=float)
    mu = x.mean()
    d = x - mu
    den = (d * d).sum()
    if den <= 0 or len(x) <= k:
        return 0.0
    return float((d[k:] * d[:-k]).sum() / den)


def test_acf_matches_numpy(spark):
    df, pdf = _frame(spark, n=200)
    got = {
        (r["source"], r["lag"]): (r["acf_value"], r["n_used"])
        for r in acf(df, lags=(1, 2, 24)).collect()
    }
    for s, g in pdf.groupby("source"):
        x = g.sort_values(["ts_s", "event_id"])["value"].to_numpy()
        for k in (1, 2, 24):
            a, n_used = got[(s, k)]
            assert n_used == len(x) - k
            np.testing.assert_allclose(a, _acf_np(x, k), rtol=1e-9, err_msg=f"{s} lag{k}")
    # seasonal signal: lag-24 autocorrelation beats lag-2
    for s in ("s0", "s1", "s2"):
        assert got[(s, 24)][0] > got[(s, 2)][0]


def test_acf_constant_series(spark):
    pdf = pd.DataFrame(
        [("c", i, i, 5.0) for i in range(10)],
        columns=["source", "ts_s", "event_id", "value"],
    )
    out = acf(spark.createDataFrame(pdf), lags=(1,)).collect()
    assert out[0]["acf_value"] == 0.0


def test_acf_validates_lags(spark):
    df, _ = _frame(spark, n=10, n_src=1)
    with pytest.raises(ValueError):
        acf(df, lags=(0,))


def test_cusum_finds_injected_shift(spark):
    df, pdf = _frame(spark, n=300, shift_at=180)
    got = {r["source"]: r for r in cusum_changepoint(df).collect()}
    for s, g in pdf.groupby("source"):
        x = g.sort_values(["ts_s", "event_id"])["value"].to_numpy()
        mu, sd = x.mean(), x.std()
        s_path = np.abs(np.cumsum(x - mu) / sd)
        want_pos = int(np.argmax(s_path)) + 1
        r = got[s]
        assert r["cp_pos"] == want_pos
        np.testing.assert_allclose(r["s_abs_max"], s_path.max(), atol=1e-6)
        # the detected change-point is near the injected one
        assert abs(r["cp_pos"] - 180) <= 3
        assert r["cp_ts_s"] == (r["cp_pos"] - 1) * 60


def test_cusum_constant_series(spark):
    pdf = pd.DataFrame(
        [("c", i, i, 5.0) for i in range(8)],
        columns=["source", "ts_s", "event_id", "value"],
    )
    r = cusum_changepoint(spark.createDataFrame(pdf)).collect()[0]
    assert r["s_abs_max"] == 0.0 and r["cp_pos"] == 1


def _hampel_np(x, window, n_sigmas):
    out = []
    for t in range(len(x)):
        win = np.asarray(x[max(0, t - window + 1) : t + 1])
        sw = np.sort(win)
        n = len(sw)
        med = (sw[(n - 1) // 2] + sw[n // 2]) / 2.0
        dev = np.sort(np.abs(win - med))
        mad = (dev[(n - 1) // 2] + dev[n // 2]) / 2.0
        out.append((med, mad, abs(x[t] - med) > n_sigmas * 1.4826 * mad))
    return out


def test_hampel_matches_numpy(spark):
    df, pdf = _frame(spark, n=120, n_src=2)
    got = hampel_filter(df, window=11, n_sigmas=3.0).collect()
    by_key = {(r["source"], r["event_id"]): r for r in got}
    for s, g in pdf.groupby("source"):
        x = g.sort_values(["ts_s", "event_id"])["value"].to_list()
        want = _hampel_np(x, 11, 3.0)
        for i, (med, mad, flag) in enumerate(want):
            r = by_key[(s, i)]
            np.testing.assert_allclose(r["med"], med, atol=1e-6)
            np.testing.assert_allclose(r["mad"], mad, atol=1e-6)
            assert r["is_outlier"] == bool(flag), (s, i)


def test_hampel_flags_spike(spark):
    vals = [10.0] * 30
    vals[17] = 99.0
    pdf = pd.DataFrame(
        [("a", i, i, v) for i, v in enumerate(vals)],
        columns=["source", "ts_s", "event_id", "value"],
    )
    got = {r["event_id"]: r for r in hampel_filter(spark.createDataFrame(pdf)).collect()}
    assert got[17]["is_outlier"]
    assert sum(1 for r in got.values() if r["is_outlier"]) == 1


def _stl_np(x, period):
    """Classical decomposition: 2×p centered MA trend, phase-mean
    seasonal (of 6-dp-rounded detrended, matching the engine's decimal
    discipline), centered."""
    x = np.asarray(x, dtype=float)
    half = period // 2
    n = len(x)
    trend = np.full(n, np.nan)
    for t in range(half, n - half):
        w = x[t - half : t + half + 1]
        trend[t] = (w.sum() - 0.5 * w[0] - 0.5 * w[-1]) / period
    det = np.floor((x - trend) * 1e6 + 0.5) / 1e6
    phases = np.arange(n) % period
    sraw = np.array([
        np.nanmean(det[phases == p]) for p in range(period)
    ])
    sraw = np.floor(sraw * 1e6 + 0.5) / 1e6
    seasonal_by_phase = sraw - sraw.mean()
    seasonal = seasonal_by_phase[phases]
    return trend, seasonal


def test_stl_lite_matches_numpy(spark):
    n, period = 24 * 8, 24
    rng = np.random.default_rng(3)
    x = np.round(
        50.0
        + 0.05 * np.arange(n)
        + 6.0 * np.sin(2 * np.pi * np.arange(n) / period)
        + rng.normal(0, 0.4, n),
        2,
    )
    pdf = pd.DataFrame(
        [("m", i * 3600, float(v)) for i, v in enumerate(x)],
        columns=["source", "bucket_s", "val"],
    )
    out = stl_lite(spark.createDataFrame(pdf), period=period).collect()
    trend, seasonal = _stl_np(x, period)
    got = {int(r["bucket_s"] // 3600): r for r in out}
    half = period // 2
    assert set(got) == set(range(half, n - half))
    for t in range(half, n - half):
        r = got[t]
        np.testing.assert_allclose(r["trend"], trend[t], atol=2e-6)
        np.testing.assert_allclose(r["seasonal"], seasonal[t], atol=2e-6)
        np.testing.assert_allclose(
            r["remainder"], x[t] - trend[t] - seasonal[t], atol=4e-6
        )
    # the fitted seasonal recovers the injected sine ordering: phase of the
    # max seasonal ≈ phase of the sine peak (hour 6)
    seas_by_phase = {}
    for t in range(half, n - half):
        seas_by_phase.setdefault(t % period, got[t]["seasonal"])
    assert max(seas_by_phase, key=seas_by_phase.get) == 6


def test_stl_lite_validates_period(spark):
    pdf = pd.DataFrame(
        [("m", i * 3600, 1.0) for i in range(10)],
        columns=["source", "bucket_s", "val"],
    )
    with pytest.raises(ValueError):
        stl_lite(spark.createDataFrame(pdf), period=5)


def test_rolling_corr_matches_pandas(spark):
    from numalogic_spark.operators.tsfeatures import rolling_corr

    rng = np.random.default_rng(5)
    n = 80
    x = np.round(10 + np.cumsum(rng.normal(0, 1, n)), 2)
    y = np.round(x * 0.5 + rng.normal(0, 2, n), 2)
    pdf = pd.DataFrame(
        {"pair": "ab", "bucket_s": np.arange(n) * 3600, "x": x, "y": y}
    )
    out = rolling_corr(
        spark.createDataFrame(pdf), "x", "y", key_cols=("pair",), window=12
    ).collect()
    got = {r["bucket_s"] // 3600: r["corr"] for r in out}
    want = pd.Series(x).rolling(12, min_periods=2).corr(pd.Series(y))
    assert got[0] is None  # single-row window
    for t in range(1, n):
        if np.isnan(want[t]):
            assert got[t] is None, t
        else:
            np.testing.assert_allclose(got[t], want[t], atol=1e-9, err_msg=str(t))


def test_rolling_corr_constant_side_null(spark):
    from numalogic_spark.operators.tsfeatures import rolling_corr

    pdf = pd.DataFrame(
        {"pair": "ab", "bucket_s": np.arange(10) * 3600,
         "x": 5.0, "y": np.arange(10).astype(float)}
    )
    out = rolling_corr(
        spark.createDataFrame(pdf), "x", "y", key_cols=("pair",), window=5
    ).collect()
    assert all(r["corr"] is None for r in out)
    with pytest.raises(ValueError):
        rolling_corr(spark.createDataFrame(pdf), "x", "y", window=1)


def test_trend_slope_matches_numpy(spark):
    from numalogic_spark.operators.tsfeatures import trend_slope

    rng = np.random.default_rng(9)
    rows = []
    slopes = {"up": 0.25, "down": -0.4, "flat": 0.0}
    for s, sl in slopes.items():
        x = np.round(20 + sl * np.arange(100) + rng.normal(0, 0.5, 100), 2)
        rows += [(s, i, i, float(v)) for i, v in enumerate(x)]
    pdf = pd.DataFrame(rows, columns=["source", "ts_s", "event_id", "value"])
    got = {r["source"]: r for r in trend_slope(spark.createDataFrame(pdf)).collect()}
    for s in slopes:
        y = pdf[pdf["source"] == s].sort_values("ts_s")["value"].to_numpy()
        x = np.arange(1, len(y) + 1, dtype=float)
        want_slope, want_icept = np.polyfit(x, y, 1)
        r = got[s]
        assert r["n"] == 100
        np.testing.assert_allclose(r["slope"], want_slope, atol=1e-9)
        np.testing.assert_allclose(r["intercept"], want_icept, atol=1e-8)
        want_r2 = float(np.corrcoef(x, y)[0, 1] ** 2)
        np.testing.assert_allclose(r["r2"], want_r2, atol=1e-9)
    assert got["up"]["slope"] > 0.2 and got["down"]["slope"] < -0.3
    assert got["flat"]["r2"] < 0.1 < got["up"]["r2"]


def test_trend_slope_constant_series(spark):
    from numalogic_spark.operators.tsfeatures import trend_slope

    pdf = pd.DataFrame(
        [("c", i, i, 7.5) for i in range(10)],
        columns=["source", "ts_s", "event_id", "value"],
    )
    r = trend_slope(spark.createDataFrame(pdf)).collect()[0]
    assert r["slope"] == 0.0 and r["r2"] == 0.0
    np.testing.assert_allclose(r["intercept"], 7.5)


def test_seasonal_anomalies_flags_injected(spark):
    from numalogic_spark.operators.tsfeatures import seasonal_anomalies, stl_lite

    # 30 periods + moderate spikes: classical (mean-based) seasonal fit
    # smears a spike by spike/n_periods into its phase and spike/period
    # into neighbor trends — sized here to stay under the 3-sigma MAD
    # threshold so only the true anomalies flag
    n, period = 24 * 30, 24
    rng = np.random.default_rng(13)
    x = 100 + 10 * np.sin(2 * np.pi * np.arange(n) / period) + rng.normal(0, 0.5, n)
    spikes = {60: 12.0, 300: -11.0}
    for t, d in spikes.items():
        x[t] += d
    pdf = pd.DataFrame(
        [("m", i * 3600, float(round(v, 2))) for i, v in enumerate(x)],
        columns=["source", "bucket_s", "val"],
    )
    dec = stl_lite(spark.createDataFrame(pdf), period=period)
    out = seasonal_anomalies(dec, n_sigmas=3.0).collect()
    flagged = {int(r["bucket_s"] // 3600) for r in out if r["is_anomaly"]}
    for t in spikes:
        assert t in flagged
    # the +-10 seasonal swing itself is NOT flagged (robust threshold);
    # tolerate the ~0.3% gaussian tail but nothing systematic
    assert len(flagged) <= 6


def test_series_summary_matches_numpy(spark):
    from numalogic_spark.operators.tsfeatures import series_summary

    rng = np.random.default_rng(17)
    rows = []
    series = {}
    for s in range(3):
        x = np.round(rng.normal(50, 15, 500), 2)
        series[f"s{s}"] = x
        rows += [(f"s{s}", i, i, float(v)) for i, v in enumerate(x)]
    pdf = pd.DataFrame(rows, columns=["source", "ts_s", "event_id", "value"])
    got = {r["source"]: r for r in series_summary(spark.createDataFrame(pdf)).collect()}
    for s, x in series.items():
        r = got[s]
        assert r["n"] == 500
        np.testing.assert_allclose(r["vmin"], x.min())
        np.testing.assert_allclose(r["vmax"], x.max())
        # type-1 (lower) quantile: smallest value with cum count >= ceil(q*n)
        xs = np.sort(x)
        for q, col in ((0.25, "q25"), (0.5, "q50"), (0.75, "q75"),
                       (0.95, "q95"), (0.99, "q99")):
            want = xs[int(np.ceil(q * len(xs))) - 1]
            np.testing.assert_allclose(r[col], want, err_msg=f"{s} {col}")
        np.testing.assert_allclose(r["mean"], x.mean(), atol=1e-6)
        np.testing.assert_allclose(r["std"], x.std(), atol=1e-6)
    # duplicate-heavy series: histogram state is tiny and quantiles exact
    dup = pd.DataFrame(
        [("d", i, i, float(v)) for i, v in enumerate([1.0] * 90 + [9.0] * 10)],
        columns=["source", "ts_s", "event_id", "value"],
    )
    r = series_summary(spark.createDataFrame(dup)).collect()[0]
    assert r["q50"] == 1.0 and r["q95"] == 9.0 and r["q75"] == 1.0


def test_pot_threshold_matches_numpy(spark):
    from numalogic_spark.operators.tsfeatures import pot_threshold

    rng = np.random.default_rng(31)
    rows = []
    series = {}
    for s in range(2):
        # heavy-ish tail: lognormal
        x = np.round(np.exp(rng.normal(2, 0.6, 2000)), 2)
        series[f"s{s}"] = x
        rows += [(f"s{s}", i, i, float(v)) for i, v in enumerate(x)]
    pdf = pd.DataFrame(rows, columns=["source", "ts_s", "event_id", "value"])
    got = {
        r["source"]: r
        for r in pot_threshold(
            spark.createDataFrame(pdf), u_quantile=0.95, target_prob=1e-3
        ).collect()
    }
    for s, x in series.items():
        xs = np.sort(x)
        n = len(xs)
        u = xs[int(np.ceil(0.95 * n)) - 1]
        e = x[x > u] - u
        m, v = e.mean(), e.var()
        m2v = m * m / v
        xi = 0.5 * (1 - m2v)
        sigma = 0.5 * m * (m2v + 1)
        rr = 1e-3 * n / len(e)
        zq = u + (sigma / xi) * (rr ** (-xi) - 1)
        r = got[s]
        assert r["n"] == n and r["u"] == u and r["n_exceed"] == len(e)
        np.testing.assert_allclose(r["xi"], xi, atol=2e-6)
        np.testing.assert_allclose(r["sigma"], sigma, atol=2e-6)
        np.testing.assert_allclose(r["z_q"], zq, atol=1e-4)
        # the extrapolated threshold sits beyond u and is tail-consistent:
        # the empirical exceedance probability at z_q is near target
        assert r["z_q"] > u
        emp = float((x > r["z_q"]).mean())
        assert emp <= 0.005


def test_pot_threshold_degenerate(spark):
    from numalogic_spark.operators.tsfeatures import pot_threshold

    pdf = pd.DataFrame(
        [("c", i, i, 5.0) for i in range(50)],
        columns=["source", "ts_s", "event_id", "value"],
    )
    r = pot_threshold(spark.createDataFrame(pdf)).collect()[0]
    # constant series: u = max, no exceedances, fit undefined
    assert r["n_exceed"] == 0
    assert r["xi"] is None and r["sigma"] is None and r["z_q"] is None
    with pytest.raises(ValueError):
        pot_threshold(spark.createDataFrame(pdf), u_quantile=1.5)


def test_ccf_detects_lead_lag(spark):
    from numalogic_spark.operators.tsfeatures import ccf_pairs

    rng = np.random.default_rng(41)
    n = 300
    driver = np.cumsum(rng.normal(0, 1, n + 5))
    rows = []
    # "b" follows "a" with a 2-step delay
    for i in range(n):
        rows.append(("a", i * 3600, float(round(driver[i + 2], 2))))
        rows.append(("b", i * 3600, float(round(driver[i] + rng.normal(0, 0.1), 2))))
    pdf = pd.DataFrame(rows, columns=["source", "bucket_s", "val"])
    out = ccf_pairs(spark.createDataFrame(pdf), lags=(-3, -2, -1, 0, 1, 2, 3)).collect()
    got = {r["lag"]: r["ccf"] for r in out}
    assert set(got) == {-3, -2, -1, 0, 1, 2, 3}
    # ccf(a, b, k) = corr(a_t, b_{t-k}); b trails a by 2 -> peak at k = -2
    assert max(got, key=lambda k: got[k]) == -2
    assert got[-2] > 0.99

    # numeric parity with numpy at the peak
    a_vals = pdf[pdf.source == "a"].sort_values("bucket_s")["val"].to_numpy()
    b_vals = pdf[pdf.source == "b"].sort_values("bucket_s")["val"].to_numpy()
    want = np.corrcoef(a_vals[:-2], b_vals[2:])[0, 1]
    np.testing.assert_allclose(got[-2], want, atol=1e-6)


def test_page_hinkley_batch_oracle_and_shift(spark):
    from numalogic_spark.operators.tsfeatures import page_hinkley

    rng = np.random.default_rng(37)
    x = 10 + rng.normal(0, 1, 200)
    x[120:] += 6.0
    pdf = pd.DataFrame(
        [("a", i, float(round(v, 2))) for i, v in enumerate(x)],
        columns=["source", "bucket_s", "val"],
    )
    got = (
        page_hinkley(spark.createDataFrame(pdf), delta=0.0, lam=40.0)
        .toPandas()
        .sort_values("bucket_s", ignore_index=True)
    )
    # python oracle
    s = m = 0.0
    mmin = float("inf")
    for i, v in enumerate(pdf["val"], start=1):
        s += v
        mean = s / i
        m = m + (v - mean - 0.0)
        mmin = min(mmin, m)
        assert got.loc[i - 1, "ph"] == m - mmin, i
    first = got.index[got["alarm"]].min()
    assert 120 <= first <= 160
    assert not got.loc[: first - 1, "alarm"].any()


def test_psi_drift_matches_numpy_and_detects_shift(spark):
    from numalogic_spark.operators.tsfeatures import psi_drift

    rng = np.random.default_rng(43)
    rows = []
    # "stable": same distribution both halves; "shifted": mean jump
    for s, shift in (("stable", 0.0), ("shifted", 10.0)):
        x = np.round(50 + rng.normal(0, 3, 400), 2)
        x[200:] += shift
        rows += [(s, i, float(v)) for i, v in enumerate(x)]
    pdf = pd.DataFrame(rows, columns=["source", "bucket_s", "val"])
    got = {r["source"]: r for r in psi_drift(spark.createDataFrame(pdf)).collect()}

    def psi_np(x, n_bins=10):
        first, second = x[:200], x[200:]
        edges = [np.sort(first)[int(np.ceil(j / n_bins * len(first))) - 1]
                 for j in range(1, n_bins)]
        def shares(h):
            b = np.zeros(len(h), dtype=int)
            for e in edges:
                b += (h > e).astype(int)
            c = np.bincount(b, minlength=n_bins)
            return (c + 0.5) / (len(h) + n_bins / 2.0)
        p, q = shares(first), shares(second)
        return float(sum(sorted((q - p) * np.log(q / p))))

    for s in ("stable", "shifted"):
        x = pdf[pdf.source == s].sort_values("bucket_s")["val"].to_numpy()
        r = got[s]
        assert r["n_first"] == 200 and r["n_second"] == 200
        np.testing.assert_allclose(r["psi"], psi_np(x), atol=2e-6, err_msg=s)
    assert got["stable"]["psi"] < 0.1
    assert got["shifted"]["psi"] > 0.25
    with pytest.raises(ValueError):
        psi_drift(spark.createDataFrame(pdf), n_bins=1)


def test_dominant_period_recovers_injected_cycle(spark):
    """Composition check: argmax-ACF over a lag range recovers the true
    period of synthetic seasonal series (the STL/SeasonalNaive
    auto-config helper in __spark_entry__)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from numalogic_spark.operators.tsfeatures import acf

    rng = np.random.default_rng(47)
    rows = []
    for s, period in (("daily", 24), ("halfday", 12)):
        x = np.round(
            100 + 20 * np.sin(2 * np.pi * np.arange(24 * 14) / period)
            + rng.normal(0, 1, 24 * 14),
            2,
        )
        rows += [(s, i * 3600, float(v)) for i, v in enumerate(x)]
    pdf = pd.DataFrame(rows, columns=["source", "bucket_s", "val"])
    scored = acf(
        spark.createDataFrame(pdf), value_col="val",
        order_cols=("bucket_s",), lags=tuple(range(2, 37)),
    )
    pick = Window.partitionBy("source").orderBy(F.desc("acf_value"), F.asc("lag"))
    best = {
        r["source"]: r["lag"]
        for r in scored.withColumn("rk", F.row_number().over(pick))
        .filter("rk = 1")
        .collect()
    }
    assert best == {"daily": 24, "halfday": 12}


def _pairgrid_fixture(n_sources=12, n_buckets=60, seed=11):
    rng = np.random.default_rng(seed)
    rows = []
    for s in range(n_sources):
        vals = np.cumsum(rng.normal(0, 1 + s * 0.3, n_buckets))
        for i in range(n_buckets):
            rows.append((f"s{s:03d}", i * 3600, float(round(vals[i], 2))))
    return pd.DataFrame(rows, columns=["source", "bucket_s", "val"])


def test_ccf_explicit_pairs_matches_allpairs_subset(spark):
    """The pairs-limited path must return exactly the all-pairs rows for
    the requested pairs — same math, bounded candidate generation."""
    from numalogic_spark.operators.tsfeatures import ccf_pairs

    pdf = _pairgrid_fixture()
    df = spark.createDataFrame(pdf)
    want_pairs = [("s000", "s001"), ("s003", "s002"), ("s010", "s011")]
    full = ccf_pairs(df, lags=(-1, 0, 1)).toPandas()
    got = ccf_pairs(df, lags=(-1, 0, 1), pairs=want_pairs).toPandas()
    norm = {(min(a, b), max(a, b)) for a, b in want_pairs}
    sub = full[
        full.apply(lambda r: (r.src_a, r.src_b) in norm, axis=1)
    ].sort_values(["src_a", "src_b", "lag"], ignore_index=True)
    got = got.sort_values(["src_a", "src_b", "lag"], ignore_index=True)
    assert len(got) == len(norm) * 3
    pd.testing.assert_frame_equal(got, sub, check_like=True)


def test_ccf_pairs_plan_has_no_bucket_only_join(spark):
    """Plan assert (the scale guarantee): with an explicit pair list the
    b-side join keys include src_b — the S² bucket-only theta grid never
    appears in the physical plan."""
    from numalogic_spark.operators.tsfeatures import ccf_pairs

    df = spark.createDataFrame(_pairgrid_fixture(n_sources=6, n_buckets=10))
    bounded = ccf_pairs(df, lags=(0,), pairs=[("s000", "s001")])
    plan = bounded._jdf.queryExecution().executedPlan().toString()
    import re

    # every equi-join on bucket_s must also key on src_b; the unbounded
    # path (control) shows a bucket-only join
    for line in plan.splitlines():
        if "Join" in line and "bucket_s" in line:
            assert "src_b" in line, line


def test_ccf_top_k_by_variance_limits_sources(spark):
    from numalogic_spark.operators.tsfeatures import (
        ccf_pairs,
        top_variance_sources,
    )

    pdf = _pairgrid_fixture()
    df = spark.createDataFrame(pdf)
    keep = {
        r["source"] for r in top_variance_sources(df, 4).collect()
    }
    assert len(keep) == 4
    # matches the pandas population-variance ranking of the fixture
    want = set(
        pdf.groupby("source")["val"]
        .var(ddof=0)
        .sort_values(ascending=False)
        .head(4)
        .index
    )
    assert keep == want
    out = ccf_pairs(df, lags=(0,), top_k_by_variance=4).toPandas()
    assert set(out.src_a) | set(out.src_b) <= keep
    assert len(out) == 6  # C(4,2) pairs at lag 0


def test_aligned_pair_series_bounded_matches_manual(spark):
    from numalogic_spark.operators.tsfeatures import aligned_pair_series

    pdf = _pairgrid_fixture(n_sources=5, n_buckets=20)
    df = spark.createDataFrame(pdf)
    got = (
        aligned_pair_series(df, pairs=[("s001", "s000")])
        .toPandas()
        .sort_values("bucket_s", ignore_index=True)
    )
    a = pdf[pdf.source == "s000"].set_index("bucket_s")["val"]
    b = pdf[pdf.source == "s001"].set_index("bucket_s")["val"]
    assert (got.src_a == "s000").all() and (got.src_b == "s001").all()
    np.testing.assert_allclose(got.x.to_numpy(), a[got.bucket_s].to_numpy())
    np.testing.assert_allclose(got.y.to_numpy(), b[got.bucket_s].to_numpy())
