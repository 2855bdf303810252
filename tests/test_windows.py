"""Ports of the reference's StreamingDataset tests
(/root/reference/tests/tools/test_data.py:33-124) onto the Spark window
kernels, plus inverse-window reconstruction (test_data.py:196-221)."""

import numpy as np
import pandas as pd
import pytest

from numalogic_spark.operators.windows import (
    ewm_smooth,
    inverse_window_np,
    inverse_windows,
    sliding_windows,
    window_count,
    _window_matrix,
)

SEQ_LEN = 12


def _fixture_pdf(m=30, f=3):
    """The exact array from tests/tools/test_data.py:27-29 with timestamps."""
    data = np.arange(m * f).reshape(m, f).astype(np.float32)
    return pd.DataFrame(
        {
            "source": "s1",
            "event_ts": pd.date_range("2024-01-01", periods=m, freq="min"),
            **{f"m{j}": data[:, j] for j in range(f)},
        }
    ), data


def test_window_count_and_content_numpy():
    _, data = _fixture_pdf()
    for stride in (1, 2, 4):
        w = _window_matrix(data, SEQ_LEN, stride)
        assert w.shape[0] == (len(data) - SEQ_LEN) // stride + 1  # data.py:178
        for i in range(w.shape[0]):
            np.testing.assert_array_equal(w[i], data[i * stride : i * stride + SEQ_LEN])


def test_stride_validation():
    _, data = _fixture_pdf()
    with pytest.raises(ValueError):
        _window_matrix(data, SEQ_LEN, stride=SEQ_LEN)  # data.py:119-120


def test_sliding_windows_spark(spark):
    pdf, data = _fixture_pdf()
    df = spark.createDataFrame(pdf)
    for stride in (1, 2, 4):
        out = (
            sliding_windows(df, ["m0", "m1", "m2"], SEQ_LEN, stride)
            .orderBy("win_id")
            .toPandas()
        )
        assert len(out) == window_count(30, SEQ_LEN, stride)
        for _, row in out.iterrows():
            i = row["win_id"]
            got = np.asarray([np.asarray(r) for r in row["window"]])
            np.testing.assert_array_equal(got, data[i * stride : i * stride + SEQ_LEN])
        # end_ts is the window's last timestamp (entities.py:80-82)
        assert out["end_ts"].iloc[0] == pdf["event_ts"].iloc[SEQ_LEN - 1]


def test_short_group_dropped(spark):
    pdf, _ = _fixture_pdf(m=5)
    df = spark.createDataFrame(pdf)
    assert sliding_windows(df, ["m0"], SEQ_LEN, 1).count() == 0  # preprocess.py:130 guard


def test_inverse_window_numpy():
    _, data = _fixture_pdf()
    w = _window_matrix(data, SEQ_LEN, 1)
    np.testing.assert_array_equal(inverse_window_np(w, "keep_first"), data)
    np.testing.assert_array_equal(inverse_window_np(w, "keep_last"), data)
    with pytest.raises(ValueError):
        inverse_window_np(w, "nope")


def test_inverse_windows_spark(spark):
    pdf, data = _fixture_pdf()
    df = spark.createDataFrame(pdf)
    wins = sliding_windows(df, ["m0", "m1", "m2"], SEQ_LEN, 1)
    back = inverse_windows(wins, "keep_first").orderBy("row_id").toPandas()
    got = np.asarray([np.asarray(v) for v in back["values"]])
    np.testing.assert_array_equal(got, data)


def test_stride2_feature_recovery():
    """W3 (backtest/_prom.py:167-197): interleave two features into stride-2
    windows, recover the original 2-feature series exactly."""
    from numalogic_spark.operators.windows import stride2_feature_recovery_np

    n, L = 20, 8
    orig = np.arange(n * 2, dtype=np.float32).reshape(n, 2)
    interleaved = orig.reshape(-1, 1)  # (2n, 1): f0,f1,f0,f1,... stride-2 flat
    wins = _window_matrix(interleaved, 2 * L, 2)[:, :, 0]  # windows step 1 orig row
    rec = stride2_feature_recovery_np(wins, 2 * L)
    np.testing.assert_array_equal(rec, orig)
    with pytest.raises(ValueError):
        stride2_feature_recovery_np(wins, 2 * L + 1)


def test_ewm_smooth_matches_pandas(spark):
    pdf, data = _fixture_pdf()
    df = spark.createDataFrame(pdf)
    out = ewm_smooth(df, ["m0", "m1"], beta=0.5).orderBy("event_ts").toPandas()
    exp = pdf[["m0", "m1"]].astype(np.float32).ewm(alpha=0.5).mean().astype(np.float32)
    np.testing.assert_allclose(out["m0"].to_numpy(), exp["m0"].to_numpy(), rtol=1e-6)
    np.testing.assert_allclose(out["m1"].to_numpy(), exp["m1"].to_numpy(), rtol=1e-6)


def test_ewm_smooth_windowed_matches_numpy(spark):
    """Trailing-L bias-corrected EWM (the bounded-state oracle-exact
    variant): per row, EXP window agg of the last min(rn, L) values."""
    import pandas as pd

    from numalogic_spark.functions.aggregators import expmov_avg_np
    from numalogic_spark.operators.windows import ewm_smooth_windowed

    rng = np.random.default_rng(4)
    n, L, beta = 100, 12, 0.5
    pdf = pd.DataFrame(
        {
            "source": ["s"] * n,
            "event_ts": pd.date_range("2024-01-01", periods=n, freq="min"),
            "value": rng.random(n) * 50,
        }
    )
    got = (
        ewm_smooth_windowed(spark.createDataFrame(pdf), "value", seq_len=L, beta=beta)
        .orderBy("event_ts")
        .toPandas()
    )
    x = pdf["value"].to_numpy()
    exp = [expmov_avg_np(x[max(0, i - L + 1) : i + 1], beta) for i in range(n)]
    np.testing.assert_allclose(got["value_ewm"], exp, rtol=1e-12)


# ---------------------------------------------------------------------------
# Salted windowing (low-series-cardinality scale path)


def _multi_series_pdf(sizes, f=2, seed=7):
    rng = np.random.default_rng(seed)
    frames = []
    for k, m in enumerate(sizes):
        frames.append(
            pd.DataFrame(
                {
                    "source": f"s{k}",
                    "event_ts": pd.date_range("2024-03-01", periods=m, freq="30s"),
                    **{
                        f"m{j}": rng.normal(size=m).astype(np.float32)
                        for j in range(f)
                    },
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def _canon(out: pd.DataFrame) -> pd.DataFrame:
    out = out.sort_values(["source", "win_id"], ignore_index=True)
    out["window"] = out["window"].map(
        lambda w: tuple(tuple(float(v) for v in r) for r in w)
    )
    return out


def test_add_series_positions_matches_row_number(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from numalogic_spark.operators.windows import add_series_positions

    pdf = _multi_series_pdf([257, 64, 11, 3])
    df = spark.createDataFrame(pdf).repartition(8)  # scramble layout
    got = add_series_positions(df, "source", ["event_ts"]).toPandas()
    w = Window.partitionBy("source").orderBy("event_ts")
    exp = (
        df.withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .toPandas()
    )
    key = ["source", "event_ts"]
    got = got.sort_values(key, ignore_index=True)
    exp = exp.sort_values(key, ignore_index=True)
    np.testing.assert_array_equal(got["pos"], exp["pos"])
    assert set(got.columns) == set(exp.columns)


@pytest.mark.parametrize("stride,chunk_rows", [(1, 12), (4, 17), (5, 100), (4, 64)])
def test_salted_equals_sequential(spark, stride, chunk_rows):
    from numalogic_spark.operators.windows import sliding_windows_salted

    # sizes hit: many chunks, exactly-one-chunk, shorter-than-seq_len,
    # boundary landing mid-replication
    pdf = _multi_series_pdf([157, chunk_rows, 7, chunk_rows + SEQ_LEN - 2])
    df = spark.createDataFrame(pdf).repartition(8)
    cols = ["m0", "m1"]
    seq = _canon(sliding_windows(df, cols, SEQ_LEN, stride).toPandas())
    sal = _canon(
        sliding_windows_salted(
            df, cols, SEQ_LEN, stride, chunk_rows=chunk_rows
        ).toPandas()
    )
    pd.testing.assert_frame_equal(seq, sal)


def test_salted_with_caller_positions(spark):
    from pyspark.sql import functions as F

    from numalogic_spark.operators.windows import sliding_windows_salted

    # post-gapfill regular grid: position is pure arithmetic, no rank job
    pdf = _multi_series_pdf([300])
    df = spark.createDataFrame(pdf).withColumn(
        "p",
        ((F.unix_timestamp("event_ts") - F.unix_timestamp(F.lit("2024-03-01 00:00:00"))) / 30).cast("long"),
    )
    seq = _canon(sliding_windows(df, ["m0"], SEQ_LEN, 2).toPandas())
    sal = _canon(
        sliding_windows_salted(
            df, ["m0"], SEQ_LEN, 2, chunk_rows=50, pos_col="p"
        ).toPandas()
    )
    pd.testing.assert_frame_equal(seq, sal)


def test_salted_validation(spark):
    from numalogic_spark.operators.windows import sliding_windows_salted

    df = spark.createDataFrame(_multi_series_pdf([20]))
    with pytest.raises(ValueError, match="chunk_rows"):
        sliding_windows_salted(df, ["m0"], SEQ_LEN, 1, chunk_rows=SEQ_LEN - 1)
    with pytest.raises(ValueError, match="Stride"):
        sliding_windows_salted(df, ["m0"], SEQ_LEN, SEQ_LEN, chunk_rows=100)
