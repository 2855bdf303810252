import numpy as np
import pandas as pd
import pytest

from numalogic_spark.operators.reshape import (
    flatten_rows,
    flatten_vector_inverse_np,
    flatten_vector_np,
    flatten_vector_with_padding_np,
    min_train_size_guard,
    pivot_metrics,
    train_val_split,
    unpivot_metrics,
)
from numalogic_spark.synthetic import gen_timeseries_pandas, inject_anomalies_pandas


@pytest.fixture(scope="module")
def long_df(spark):
    pdf = pd.DataFrame(
        {
            "ts": list(pd.date_range("2024-01-01", periods=4, freq="min")) * 3,
            "metric": ["m0"] * 4 + ["m1"] * 4 + ["m2"] * 4,
            "value": np.arange(12, dtype=float),
        }
    )
    return spark.createDataFrame(pdf), pdf


def test_pivot_and_unpivot_roundtrip(spark, long_df):
    df, pdf = long_df
    wide = pivot_metrics(df, ["ts"], "metric", "value", values=["m0", "m1", "m2"])
    wp = wide.orderBy("ts").toPandas()
    exp = pdf.pivot_table(index="ts", columns="metric", values="value", aggfunc="sum")
    np.testing.assert_array_equal(wp[["m0", "m1", "m2"]].to_numpy(), exp.to_numpy())
    back = unpivot_metrics(wide, ["ts"], ["m0", "m1", "m2"]).orderBy("metric", "ts").toPandas()
    assert len(back) == 12
    np.testing.assert_array_equal(
        back["value"].to_numpy(), pdf.sort_values(["metric", "ts"])["value"].to_numpy()
    )


def test_train_val_split(spark):
    pdf = pd.DataFrame(
        {
            "source": ["a"] * 100 + ["b"] * 50,
            "event_ts": list(pd.date_range("2024-01-01", periods=100, freq="min"))
            + list(pd.date_range("2024-01-01", periods=50, freq="min")),
            "v": range(150),
        }
    )
    df = spark.createDataFrame(pdf)
    train, val = train_val_split(df, 0.2)
    tp, vp = train.toPandas(), val.toPandas()
    assert len(vp[vp.source == "a"]) == 20 and len(vp[vp.source == "b"]) == 10
    # validation = the TAIL rows (largest timestamps) per series
    assert vp[vp.source == "a"]["v"].min() == 80
    assert tp[tp.source == "a"]["v"].max() == 79
    with pytest.raises(ValueError):
        train_val_split(df, 1.5)


def test_min_train_size_guard(spark):
    pdf = pd.DataFrame({"source": ["a"] * 30 + ["b"] * 5, "v": range(35)})
    df = spark.createDataFrame(pdf)
    kept = min_train_size_guard(df, 10).toPandas()
    assert set(kept["source"]) == {"a"}


def test_flatten_vector_kernels():
    x = np.arange(12, dtype=np.float32).reshape(4, 3)
    f = flatten_vector_np(x)
    assert f.shape == (12, 1)
    np.testing.assert_array_equal(flatten_vector_inverse_np(f, 3), x)
    # padding variant: literal check per _stateless.py:202-211 semantics
    out = flatten_vector_with_padding_np(x, flatten_idx=[0, 1], padding_idx=[2], padding_with=0.0)
    assert out.shape == (8, 2)
    np.testing.assert_array_equal(out[:, 0], x[:, [0, 1]].flatten())
    np.testing.assert_array_equal(out[:4, 1], x[:, 2])
    np.testing.assert_array_equal(out[4:, 1], np.zeros(4))


def test_flatten_rows_spark(spark):
    pdf = pd.DataFrame({"id": [1, 2], "m0": [1.0, 3.0], "m1": [2.0, 4.0]})
    df = spark.createDataFrame(pdf)
    out = flatten_rows(df, ["id"], ["m0", "m1"]).orderBy("id", "feature_pos").toPandas()
    assert out["value"].tolist() == [1.0, 2.0, 3.0, 4.0]  # row-major like numpy flatten


def test_synthetic_and_anomalies(spark):
    pdf = gen_timeseries_pandas(n_rows=500, n_series=2, seed=7)
    assert pdf.equals(gen_timeseries_pandas(n_rows=500, n_series=2, seed=7))  # deterministic
    inj = inject_anomalies_pandas(pdf, anomaly_ratio=0.05, impact=5.0, seed=7)
    assert inj["is_anomaly"].sum() == 2 * 25  # one 5% window per series
    # anomalous rows are exactly impact× the originals
    sel = inj["is_anomaly"]
    np.testing.assert_allclose(inj.loc[sel, "value"], pdf.loc[sel, "value"] * 5.0, rtol=1e-12)
    # contiguity: anomaly indices form one run per series
    for srs, g in inj.groupby("series"):
        pos = np.flatnonzero(g["is_anomaly"].to_numpy())
        assert (np.diff(pos) == 1).all()


def test_flatten_rows_with_padding_matches_np_kernel(spark):
    """DataFrame-level FlattenVectorWithPadding reproduces the numpy
    matrix kernel exactly, per series."""
    import pandas as pd
    from numalogic_spark.operators.reshape import flatten_rows_with_padding

    rng = np.random.default_rng(11)
    x = rng.random((6, 3))
    pdf = pd.DataFrame(
        {"s": "g", "i": range(6), "a": x[:, 0], "b": x[:, 1], "c": x[:, 2]}
    )
    df = spark.createDataFrame(pdf)
    out = (
        flatten_rows_with_padding(
            df, order_by=["i"], flatten_cols=["a", "b"], padding_cols=["c"],
            partition_by=["s"], padding_with=0.5,
        )
        .orderBy("out_pos")
        .toPandas()
    )
    exp = flatten_vector_with_padding_np(x, flatten_idx=[0, 1], padding_idx=[2], padding_with=0.5)
    assert len(out) == 12
    np.testing.assert_allclose(out["value"], exp[:, 0], rtol=1e-12)
    np.testing.assert_allclose(out["c"], exp[:, 1], rtol=1e-12)
    with pytest.raises(ValueError, match="padding"):
        flatten_rows_with_padding(df, ["i"], ["a", "b", "c"], [])
