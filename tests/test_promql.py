"""Counter semantics (increase/rate/resets with reset correction), M4
downsampling, and retention-policy enforcement vs brute-force numpy/pandas
oracles."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from numalogic_spark.operators.promql import counter_deltas, counter_rate, m4_downsample
from numalogic_spark.operators.retention import (
    DEFAULT_POLICY,
    apply_retention,
    retention_summary,
)


def _counter_frame(spark, n=500, n_src=3, seed=11, wrap=200.0):
    """Monotone-increment counters that wrap at `wrap` (hard resets)."""
    rng = np.random.default_rng(seed)
    rows = []
    for s in range(n_src):
        c = 0.0
        for i in range(n):
            c += float(np.round(rng.uniform(0.5, 9.5), 2))
            if c >= wrap:
                c -= wrap  # scrape-style reset: counter restarts low
            rows.append((f"s{s}", i * 30, i, round(c, 2)))
    pdf = pd.DataFrame(rows, columns=["source", "ts_s", "event_id", "value"])
    return spark.createDataFrame(pdf), pdf


def _increase_np(vals):
    """Brute-force reset-adjusted increase per sample."""
    out, resets = [], []
    prev = None
    for v in vals:
        if prev is None:
            out.append(None)
            resets.append(0)
        else:
            d = round(v - prev, 6)
            out.append(d if d >= 0 else v)
            resets.append(1 if d < 0 else 0)
        prev = v
    return out, resets


def test_counter_deltas_match_bruteforce(spark):
    df, pdf = _counter_frame(spark)
    got = (
        counter_deltas(df)
        .select("source", "event_id", F.col("adjusted").cast("double"), "is_reset")
        .toPandas()
        .sort_values(["source", "event_id"], ignore_index=True)
    )
    for s, grp in pdf.groupby("source"):
        exp_adj, exp_rst = _increase_np(list(grp["value"]))
        g = got[got["source"] == s].reset_index(drop=True)
        for i, (ea, er) in enumerate(zip(exp_adj, exp_rst)):
            if ea is None:
                assert pd.isna(g.loc[i, "adjusted"])
            else:
                assert g.loc[i, "adjusted"] == pytest.approx(ea, abs=1e-9)
            assert g.loc[i, "is_reset"] == er


def test_counter_rate_bucket_sums(spark):
    df, pdf = _counter_frame(spark)
    out = counter_rate(df, bucket_s=600).toPandas()
    # buckets re-aggregate: total increase == sum of adjusted deltas
    for s, grp in pdf.groupby("source"):
        exp_adj, exp_rst = _increase_np(list(grp["value"]))
        total = sum(a for a in exp_adj if a is not None)
        g = out[out["source"] == s]
        assert g["increase"].sum() == pytest.approx(total, abs=1e-6)
        assert int(g["resets"].sum()) == sum(exp_rst)
        assert int(g["n_samples"].sum()) == len(grp)
    # rate = increase / bucket width
    assert (
        out["rate_per_s"]
        - np.floor(out["increase"] / 600.0 * 1e6 + 0.5) / 1e6
    ).abs().max() <= 1e-12


def test_counter_monotone_equals_plain_delta(spark):
    """Without resets, bucketed increase == last - first of the counter
    (telescoping sum) per series."""
    pdf = pd.DataFrame(
        {
            "source": ["a"] * 100,
            "ts_s": np.arange(100) * 10,
            "event_id": np.arange(100),
            "value": np.round(np.cumsum(np.full(100, 1.25)), 2),
        }
    )
    df = spark.createDataFrame(pdf)
    out = counter_rate(df, bucket_s=10_000_000).toPandas()
    assert len(out) == 1
    assert out.loc[0, "increase"] == pytest.approx(
        pdf["value"].iloc[-1] - pdf["value"].iloc[0]
    )
    assert out.loc[0, "resets"] == 0


def test_m4_matches_pandas(spark):
    rng = np.random.default_rng(3)
    n = 1000
    pdf = pd.DataFrame(
        {
            "source": np.repeat(["a", "b"], n // 2),
            "ts_s": np.tile(np.arange(n // 2) * 7, 2),
            "event_id": np.arange(n),
            "value": np.round(rng.normal(50, 10, n), 2),
        }
    )
    df = spark.createDataFrame(pdf)
    out = m4_downsample(df, bucket_s=300).toPandas()
    pdf["bucket_s"] = pdf["ts_s"] - pdf["ts_s"] % 300
    for (s, b), grp in pdf.groupby(["source", "bucket_s"]):
        row = out[(out["source"] == s) & (out["bucket_s"] == b)].iloc[0]
        assert row["n"] == len(grp)
        srt = grp.sort_values(["ts_s", "event_id"])
        assert row["t_first"] == srt["ts_s"].iloc[0]
        assert row["v_first"] == srt["value"].iloc[0]
        assert row["t_last"] == srt["ts_s"].iloc[-1]
        assert row["v_last"] == srt["value"].iloc[-1]
        assert row["v_min"] == grp["value"].min()
        assert row["v_max"] == grp["value"].max()
        # min point tie-break: earliest (ts, id) among minima
        minima = grp[grp["value"] == grp["value"].min()].sort_values(
            ["ts_s", "event_id"]
        )
        assert row["t_min"] == minima["ts_s"].iloc[0]
        # max point: latest among maxima (lexicographic struct max)
        maxima = grp[grp["value"] == grp["value"].max()].sort_values(
            ["ts_s", "event_id"]
        )
        assert row["t_max"] == maxima["ts_s"].iloc[-1]


def test_m4_bounds_output_size(spark):
    pdf = pd.DataFrame(
        {
            "source": ["a"] * 10_000,
            "ts_s": np.arange(10_000),
            "event_id": np.arange(10_000),
            "value": np.round(np.sin(np.arange(10_000) * 0.01) * 100, 2),
        }
    )
    out = m4_downsample(spark.createDataFrame(pdf), bucket_s=1000)
    assert out.count() == 10  # 10 pixel buckets regardless of density


def _tier_frame(spark):
    rows = []
    day = 86400
    for tier, step, n in (("1m", 60, 3000), ("1h", 3600, 600), ("1d", day, 40)):
        for i in range(n):
            rows.append((tier, "s0", pd.Timestamp(1700000000 + i * step, unit="s")))
    pdf = pd.DataFrame(rows, columns=["tier", "source", "bucket_ts"])
    return spark.createDataFrame(pdf), pdf


def test_retention_horizons(spark):
    df, pdf = _tier_frame(spark)
    pol = {"1m": 86400, "1h": 7 * 86400, "1d": None}
    now = int(pdf["bucket_ts"].astype("int64").max() // 10**9)
    kept = apply_retention(df, pol).toPandas()
    pdf["age"] = now - pdf["bucket_ts"].astype("int64") // 10**9
    for tier, horizon in pol.items():
        exp = pdf[pdf["tier"] == tier]
        if horizon is not None:
            exp = exp[exp["age"] < horizon]
        assert len(kept[kept["tier"] == tier]) == len(exp)
    # schema untouched
    assert kept.columns.tolist() == ["tier", "source", "bucket_ts"]


def test_retention_summary_counts(spark):
    df, pdf = _tier_frame(spark)
    pol = {"1m": 86400, "1h": 7 * 86400, "1d": None}
    summ = retention_summary(df, pol).toPandas().set_index("tier")
    now = int(pdf["bucket_ts"].astype("int64").max() // 10**9)
    for tier, horizon in pol.items():
        grp = pdf[pdf["tier"] == tier]
        age = now - grp["bucket_ts"].astype("int64") // 10**9
        exp_kept = int((age < horizon).sum()) if horizon is not None else len(grp)
        assert summ.loc[tier, "kept"] == exp_kept
        assert summ.loc[tier, "expired"] == len(grp) - exp_kept
        if horizon is None:
            assert pd.isna(summ.loc[tier, "horizon_s"])
        else:
            assert summ.loc[tier, "horizon_s"] == horizon
    # kept + expired covers every row
    assert int(summ["kept"].sum() + summ["expired"].sum()) == len(pdf)


def test_retention_unknown_tier_fail_open(spark):
    df, _ = _tier_frame(spark)
    from datetime import datetime, timezone

    extra = df.union(
        df.sparkSession.createDataFrame(
            [("raw", "s0", datetime.fromtimestamp(1, tz=timezone.utc))], df.schema
        )
    )
    kept = apply_retention(extra, DEFAULT_POLICY).toPandas()
    # a tier the policy does not know is never dropped
    assert (kept["tier"] == "raw").sum() == 1


def test_retention_explicit_now(spark):
    df, pdf = _tier_frame(spark)
    far_future = int(pdf["bucket_ts"].astype("int64").max() // 10**9) + 10**9
    kept = apply_retention(df, {"1m": 60, "1h": 60, "1d": 60}, now_s=far_future)
    assert kept.count() == 0


def test_lttb_basic_properties(spark):
    from numalogic_spark.operators.promql import lttb_downsample

    rng = np.random.default_rng(9)
    n = 500
    pdf = pd.DataFrame(
        {
            "source": ["a"] * n + ["b"] * n,
            "ts_s": np.tile(np.arange(n) * 60, 2),
            "event_id": np.arange(2 * n),
            "value": np.round(rng.normal(10, 3, 2 * n), 2),
        }
    )
    out = lttb_downsample(spark.createDataFrame(pdf), threshold=25).toPandas()
    for s, grp in pdf.groupby("source"):
        g = out[out["source"] == s].sort_values("sel_idx").reset_index(drop=True)
        assert len(g) == 25
        srt = grp.sort_values(["ts_s", "event_id"])
        # endpoints always kept
        assert g.loc[0, "ts_s"] == srt["ts_s"].iloc[0]
        assert g.loc[24, "ts_s"] == srt["ts_s"].iloc[-1]
        # strictly increasing timestamps (one pick per bucket, in order)
        assert (np.diff(g["ts_s"].to_numpy()) > 0).all()
        # every selected point is a real input point
        merged = g.merge(srt, on=["ts_s", "value"], how="left", indicator=True)
        assert (merged["_merge"] == "both").all()


def test_lttb_small_series_passthrough(spark):
    from numalogic_spark.operators.promql import lttb_downsample

    pdf = pd.DataFrame(
        {
            "source": ["s"] * 6,
            "ts_s": np.arange(6) * 10,
            "event_id": np.arange(6),
            "value": [1.0, 2.0, 3.0, 2.0, 1.0, 0.5],
        }
    )
    out = (
        lttb_downsample(spark.createDataFrame(pdf), threshold=20)
        .toPandas()
        .sort_values("sel_idx")
    )
    assert out["value"].tolist() == pdf["value"].tolist()
    assert out["sel_idx"].tolist() == list(range(6))


def test_lttb_keeps_spike(spark):
    from numalogic_spark.operators.promql import lttb_downsample

    n = 400
    vals = np.full(n, 5.0)
    vals[137] = 500.0  # a huge spike must survive any sane downsample
    pdf = pd.DataFrame(
        {
            "source": ["s"] * n,
            "ts_s": np.arange(n) * 10,
            "event_id": np.arange(n),
            "value": vals,
        }
    )
    out = lttb_downsample(spark.createDataFrame(pdf), threshold=10).toPandas()
    assert (out["value"] == 500.0).any()


def test_fixed_histogram_cumulative(spark):
    from numalogic_spark.operators.promql import fixed_histogram

    pdf = pd.DataFrame(
        {
            "source": ["a"] * 8,
            "ts_s": [0, 1, 2, 3, 4, 5, 6, 7],
            "event_id": range(8),
            "value": [0.5, 1.5, 2.5, 2.5, 9.0, 9.5, 100.0, 3.0],
        }
    )
    out = (
        fixed_histogram(spark.createDataFrame(pdf), les=[1, 3, 10], bucket_s=3600)
        .toPandas()
        .sort_values("le")
        .reset_index(drop=True)
    )
    # full grid including +Inf, cumulative counts
    assert out["le"].tolist() == [1.0, 3.0, 10.0, np.inf]
    assert out["cum_count"].tolist() == [1, 5, 7, 8]


def test_histogram_quantile_interpolation(spark):
    from numalogic_spark.operators.promql import fixed_histogram, histogram_quantile

    # 10 values uniform in (0, 10]; buckets at 5 and 10: median rank=5
    # falls exactly at cum(le=5)=5 -> phi = 0 + 5 * (5-0)/(5-0) = 5
    pdf = pd.DataFrame(
        {
            "source": ["a"] * 10,
            "ts_s": range(10),
            "event_id": range(10),
            "value": [float(i) for i in range(1, 11)],
        }
    )
    hist = fixed_histogram(spark.createDataFrame(pdf), les=[5, 10], bucket_s=3600)
    out = histogram_quantile(hist, q=0.5).toPandas()
    assert out.loc[0, "total"] == 10
    assert out.loc[0, "phi"] == pytest.approx(5.0)
    # q=0.75 -> rank 7.5 inside (5,10] bucket: 5 + 5*(7.5-5)/(10-5) = 7.5
    out75 = histogram_quantile(hist, q=0.75).toPandas()
    assert out75.loc[0, "phi"] == pytest.approx(7.5)


def test_histogram_quantile_inf_bucket(spark):
    from numalogic_spark.operators.promql import fixed_histogram, histogram_quantile

    # all mass above the largest finite le -> PromQL returns maxfin
    pdf = pd.DataFrame(
        {
            "source": ["a"] * 4,
            "ts_s": range(4),
            "event_id": range(4),
            "value": [50.0, 60.0, 70.0, 80.0],
        }
    )
    hist = fixed_histogram(spark.createDataFrame(pdf), les=[1, 10], bucket_s=3600)
    out = histogram_quantile(hist, q=0.9).toPandas()
    assert out.loc[0, "phi"] == pytest.approx(10.0)


def test_histogram_quantile_lowest_bucket_from_zero(spark):
    from numalogic_spark.operators.promql import fixed_histogram, histogram_quantile

    # all mass in the first bucket -> interpolate from lower bound 0
    pdf = pd.DataFrame(
        {
            "source": ["a"] * 4,
            "ts_s": range(4),
            "event_id": range(4),
            "value": [0.5, 1.0, 1.5, 2.0],
        }
    )
    hist = fixed_histogram(spark.createDataFrame(pdf), les=[2, 10], bucket_s=3600)
    out = histogram_quantile(hist, q=0.5).toPandas()
    # rank=2, bucket (0,2]: 0 + 2*(2-0)/(4-0) = 1.0
    assert out.loc[0, "phi"] == pytest.approx(1.0)


def test_sessionize_bruteforce(spark):
    from numalogic_spark.operators.promql import sessionize

    rng = np.random.default_rng(13)
    rows = []
    for u in range(5):
        t = 0
        eid = 0
        for _ in range(60):
            t += int(rng.choice([10, 60, 300, 2500], p=[0.4, 0.3, 0.2, 0.1]))
            rows.append((u, t, u * 1000 + eid, float(np.round(rng.uniform(0, 9), 2))))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["user_id", "ts_s", "event_id", "value"])
    out = (
        sessionize(spark.createDataFrame(pdf), gap_s=1800)
        .toPandas()
        .sort_values(["user_id", "session_idx"], ignore_index=True)
    )
    for u, grp in pdf.groupby("user_id"):
        srt = grp.sort_values(["ts_s", "event_id"])
        sessions, cur = [], []
        prev = None
        for _, r in srt.iterrows():
            if prev is not None and r["ts_s"] - prev <= 1800:
                cur.append(r)
            else:
                if cur:
                    sessions.append(cur)
                cur = [r]
            prev = r["ts_s"]
        sessions.append(cur)
        g = out[out["user_id"] == u].reset_index(drop=True)
        assert len(g) == len(sessions)
        for i, sess in enumerate(sessions):
            assert g.loc[i, "session_idx"] == i + 1
            assert g.loc[i, "start_s"] == sess[0]["ts_s"]
            assert g.loc[i, "end_s"] == sess[-1]["ts_s"]
            assert g.loc[i, "n_events"] == len(sess)
            assert g.loc[i, "duration_s"] == sess[-1]["ts_s"] - sess[0]["ts_s"]
            assert g.loc[i, "value_sum"] == pytest.approx(
                round(sum(r["value"] for r in sess), 6)
            )


def test_sessionize_single_event_sessions(spark):
    pdf = pd.DataFrame(
        {
            "user_id": [1, 1, 1],
            "ts_s": [0, 10_000, 20_000],   # every gap > 1800
            "event_id": [0, 1, 2],
            "value": [1.0, 2.0, 3.0],
        }
    )
    from numalogic_spark.operators.promql import sessionize

    out = sessionize(spark.createDataFrame(pdf), gap_s=1800).toPandas()
    assert len(out) == 3
    assert (out["n_events"] == 1).all()
    assert (out["duration_s"] == 0).all()


def test_counter_rate_reaggregates_across_tiers(spark):
    """Minute-level increase/resets sum EXACTLY to the hourly ones —
    the property that lets counter rollups ride the tier cascade."""
    df, _ = _counter_frame(spark, n=400, n_src=2)
    fine = counter_rate(df, bucket_s=60).toPandas()
    coarse = counter_rate(df, bucket_s=3600).toPandas()
    fine["h"] = fine["bucket_s"] - fine["bucket_s"] % 3600
    re_agg = (
        fine.groupby(["source", "h"])
        .agg(increase=("increase", "sum"), resets=("resets", "sum"),
             n_samples=("n_samples", "sum"))
        .reset_index()
        .rename(columns={"h": "bucket_s"})
        .sort_values(["source", "bucket_s"], ignore_index=True)
    )
    coarse = coarse.sort_values(["source", "bucket_s"], ignore_index=True)
    assert (re_agg["resets"].to_numpy() == coarse["resets"].to_numpy()).all()
    assert (re_agg["n_samples"].to_numpy() == coarse["n_samples"].to_numpy()).all()
    assert np.allclose(re_agg["increase"], coarse["increase"], atol=1e-6)


def test_staleness_report_bruteforce(spark):
    from numalogic_spark.operators.retention import staleness_report

    rows = []
    # series a reports every 30s up to t=10000; series b stops at t=5000
    for t in range(0, 10001, 30):
        rows.append(("a", t, t, 1.0))
    for t in range(0, 5001, 30):
        rows.append(("b", t, 100000 + t, 1.0))
    pdf = pd.DataFrame(rows, columns=["source", "ts_s", "event_id", "value"])
    out = (
        staleness_report(
            spark.createDataFrame(pdf), bucket_s=60, lookback_s=600
        )
        .toPandas()
        .set_index("source")
    )
    wm = pdf["ts_s"].max()
    assert out.loc["a", "last_seen_s"] == wm
    assert out.loc["a", "staleness_s"] == 0
    # compute expected per brute force
    for s in ("a", "b"):
        grp = pdf[pdf["source"] == s]
        last = grp["ts_s"].max()
        assert out.loc[s, "last_seen_s"] == last
        assert out.loc[s, "staleness_s"] == wm - last
        buckets = set(t - t % 60 for t in grp["ts_s"])
        observed = sum(1 for bkt in buckets if wm - 600 < bkt <= wm)
        assert out.loc[s, "buckets_observed"] == observed
        assert out.loc[s, "buckets_missing"] == 10 - observed
    # b stopped reporting: every lookback bucket missing
    assert out.loc["b", "buckets_observed"] == 0
