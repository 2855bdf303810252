"""Backward as-of join vs pandas.merge_asof (the independent oracle)."""

import numpy as np
import pandas as pd
import pytest

from numalogic_spark.operators.joins import asof_join_backward


def _frames(spark, seed=17, n_left=400, n_right=60, n_src=3):
    rng = np.random.default_rng(seed)
    lrows, rrows = [], []
    for s in range(n_src):
        lts = np.sort(rng.choice(np.arange(100_000), n_left, replace=False))
        for i, t in enumerate(lts):
            lrows.append((f"s{s}", int(t), i, float(np.round(rng.normal(5, 2), 2))))
        rts = np.sort(rng.choice(np.arange(100_000), n_right, replace=False))
        for t in rts:
            rrows.append((f"s{s}", int(t), float(np.round(rng.uniform(0, 1), 4))))
    lpdf = pd.DataFrame(lrows, columns=["source", "ts_s", "event_id", "value"])
    rpdf = pd.DataFrame(rrows, columns=["source", "rt", "stat"])
    return (
        spark.createDataFrame(lpdf),
        spark.createDataFrame(rpdf),
        lpdf,
        rpdf,
    )


def _expected(lpdf, rpdf, tolerance=None):
    kw = {}
    if tolerance is not None:
        kw["tolerance"] = tolerance
    return pd.merge_asof(
        lpdf.sort_values("ts_s", kind="mergesort"),
        rpdf.sort_values("rt", kind="mergesort").rename(columns={"rt": "ts_s"}),
        on="ts_s",
        by="source",
        direction="backward",
        allow_exact_matches=True,
        **kw,
    )


def test_asof_matches_pandas(spark):
    ldf, rdf, lpdf, rpdf = _frames(spark)
    got = (
        asof_join_backward(ldf, rdf, right_ts="rt")
        .toPandas()
        .sort_values(["source", "ts_s", "event_id"], ignore_index=True)
    )
    exp = _expected(lpdf, rpdf).sort_values(
        ["source", "ts_s", "event_id"], ignore_index=True
    )
    assert len(got) == len(exp)
    both_nan = got["asof_stat"].isna() & exp["stat"].isna()
    assert (both_nan | (got["asof_stat"] == exp["stat"])).all()
    # matched timestamp is the greatest rt <= ts
    for _, row in got.dropna(subset=["asof_ts"]).head(50).iterrows():
        cand = rpdf[(rpdf["source"] == row["source"]) & (rpdf["rt"] <= row["ts_s"])]
        assert row["asof_ts"] == cand["rt"].max()


def test_asof_exact_timestamp_matches(spark):
    lpdf = pd.DataFrame(
        {"source": ["a"] * 3, "ts_s": [10, 20, 30], "event_id": [0, 1, 2],
         "value": [1.0, 2.0, 3.0]}
    )
    rpdf = pd.DataFrame({"source": ["a"] * 2, "rt": [20, 25], "stat": [0.5, 0.7]})
    got = (
        asof_join_backward(
            spark.createDataFrame(lpdf), spark.createDataFrame(rpdf), right_ts="rt"
        )
        .toPandas()
        .sort_values("ts_s", ignore_index=True)
    )
    # ts=10: nothing before; ts=20: exact match takes the rt=20 row;
    # ts=30: latest is rt=25
    assert pd.isna(got.loc[0, "asof_ts"])
    assert got.loc[1, "asof_ts"] == 20 and got.loc[1, "asof_stat"] == 0.5
    assert got.loc[2, "asof_ts"] == 25 and got.loc[2, "asof_stat"] == 0.7


def test_asof_tolerance(spark):
    ldf, rdf, lpdf, rpdf = _frames(spark, seed=23)
    tol = 500
    got = (
        asof_join_backward(ldf, rdf, right_ts="rt", tolerance_s=tol)
        .toPandas()
        .sort_values(["source", "ts_s", "event_id"], ignore_index=True)
    )
    exp = _expected(lpdf, rpdf, tolerance=tol).sort_values(
        ["source", "ts_s", "event_id"], ignore_index=True
    )
    both_nan = got["asof_stat"].isna() & exp["stat"].isna()
    assert (both_nan | (got["asof_stat"] == exp["stat"])).all()
    assert got["asof_stat"].isna().sum() > 0  # tolerance actually pruned


def test_asof_collision_guard(spark):
    ldf, rdf, _, _ = _frames(spark, n_left=5, n_right=3)
    bad_left = ldf.withColumnRenamed("value", "asof_stat")
    with pytest.raises(ValueError):
        asof_join_backward(bad_left, rdf, right_ts="rt")


def test_interval_overlap_join_bruteforce(spark):
    from numalogic_spark.operators.joins import interval_overlap_join

    rng = np.random.default_rng(29)
    lrows, rrows = [], []
    for u in range(4):
        for i in range(25):
            s = int(rng.integers(0, 500_000))
            lrows.append((u, i, s, s + int(rng.integers(10, 20_000))))
        for j in range(25):
            s = int(rng.integers(0, 500_000))
            rrows.append((u, j, s, s + int(rng.integers(10, 20_000))))
    lpdf = pd.DataFrame(lrows, columns=["user_id", "lid", "start_s", "end_s"])
    rpdf = pd.DataFrame(rrows, columns=["user_id", "rid", "start_s", "end_s"])
    got = (
        interval_overlap_join(
            spark.createDataFrame(lpdf),
            spark.createDataFrame(rpdf),
            l_id="lid",
            r_id="rid",
            grid_s=7000,
        )
        .toPandas()
        .sort_values(["user_id", "lid", "rid"], ignore_index=True)
    )
    exp = []
    for u in range(4):
        for _, l in lpdf[lpdf["user_id"] == u].iterrows():
            for _, r in rpdf[rpdf["user_id"] == u].iterrows():
                if l["start_s"] <= r["end_s"] and r["start_s"] <= l["end_s"]:
                    exp.append((u, l["lid"], r["rid"]))
    exp = sorted(exp)
    assert list(map(tuple, got[["user_id", "lid", "rid"]].to_numpy())) == exp
    assert len(exp) > 50  # fixture actually exercises overlaps


def test_interval_overlap_no_cross_key_pairs(spark):
    from numalogic_spark.operators.joins import interval_overlap_join

    lpdf = pd.DataFrame({"user_id": [1], "lid": [0], "start_s": [0], "end_s": [100]})
    rpdf = pd.DataFrame({"user_id": [2], "rid": [0], "start_s": [0], "end_s": [100]})
    out = interval_overlap_join(
        spark.createDataFrame(lpdf), spark.createDataFrame(rpdf),
        l_id="lid", r_id="rid", grid_s=50,
    )
    assert out.count() == 0
