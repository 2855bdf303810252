"""Streaming AE scoring ≡ the batch kernel across micro-batch splits
(streaming/ae_stream.py).

The stream twin's novel logic is the per-series state carry: the last
seq_len − 1 values + absolute position must thread window construction
seamlessly across arbitrary micro-batch boundaries. The test forces one
file per micro-batch and asserts the streamed (err_mean, err_max) rows
are BIT-IDENTICAL to the batch kernel run on each concatenated series
(shared arithmetic: functions.ae.zscore_windows_np / window_scores_np),
and independently sanity-checks the z/score arithmetic against a
from-scratch vectorized implementation."""

import numpy as np
import pandas as pd
import pytest

from numalogic_spark.datagen import TOKEN_SCHEMA, gen_tokens_pandas
from numalogic_spark.functions.ae import (
    make_demo_weights,
    reconstruction_errors_np,
    window_scores_np,
    zscore_windows_np,
)
from numalogic_spark.streaming.ae_stream import streaming_ae_scores

L, STRIDE = 8, 4


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("ae_stream_src")
    pdf = gen_tokens_pandas(3_000, n_sources=4)
    for i, chunk in enumerate(np.array_split(np.arange(len(pdf)), 4)):
        spark.createDataFrame(pdf.iloc[chunk], TOKEN_SCHEMA).repartition(1).write.parquet(
            str(d / f"part{i}")
        )
    return str(d), pdf


def _expected(pdf: pd.DataFrame, weights) -> pd.DataFrame:
    rows = []
    for src, g in pdf.groupby("source"):
        g = g.sort_values("event_ts")
        vals = g["n_tok"].astype(float).to_numpy()
        ts = g["event_ts"].to_numpy()
        wins, ends = [], []
        for p in range(1, len(vals) + 1):
            if p >= L and (p - L) % STRIDE == 0:
                wins.append(vals[p - L : p])
                ends.append(p - 1)
        if not wins:
            continue
        mean6, emax = window_scores_np(weights, zscore_windows_np(np.asarray(wins)))
        rows.append(
            pd.DataFrame(
                {
                    "source": src,
                    "event_ts": ts[ends],
                    "err_mean": mean6,
                    "err_max": emax,
                }
            )
        )
    return pd.concat(rows).sort_values(["source", "event_ts"], ignore_index=True)


def test_streaming_ae_matches_batch_kernel(spark, stream_dir):
    d, pdf = stream_dir
    weights = make_demo_weights(seq_len=L)
    stream = (
        spark.readStream.schema(TOKEN_SCHEMA)
        .option("maxFilesPerTrigger", "1")  # force multiple micro-batches
        .parquet(d + "/part*")
        .selectExpr("source", "event_ts", "cast(n_tok as double) as value")
    )
    out = streaming_ae_scores(stream, weights, stride=STRIDE)
    q = (
        out.writeStream.format("memory")
        .queryName("aestream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = (
        spark.sql("select * from aestream")
        .toPandas()
        .sort_values(["source", "event_ts"], ignore_index=True)
    )
    exp = _expected(pdf, weights)
    assert len(got) == len(exp)
    # bit-identical: batch and stream share one arithmetic code path,
    # so any difference is a state-carry bug, not float noise
    np.testing.assert_array_equal(got["err_mean"].to_numpy(), exp["err_mean"].to_numpy())
    np.testing.assert_array_equal(got["err_max"].to_numpy(), exp["err_max"].to_numpy())
    # every series emits ((n - L) // stride) + 1 windows
    counts = got.groupby("source").size()
    for src, g in pdf.groupby("source"):
        assert counts[src] == (len(g) - L) // STRIDE + 1


def test_streaming_ae_matches_real_batch_plan(spark, stream_dir, tmp_path):
    """Non-circular batch ≡ stream: run the ACTUAL gated batch pipeline
    (__spark_entry__._ae_wins window/z plan + ae_window_scores kernel)
    on the same rows written as an events table, and assert the streamed
    scores equal it exactly. This pins the stream twin to the driver-
    gated plan itself, not to the shared numpy helpers."""
    import __spark_entry__ as E
    from numalogic_spark.functions.ae import ae_window_scores

    d, pdf = stream_dir
    weights = make_demo_weights(seq_len=L)
    ev = pdf.sort_values(["source", "event_ts"], ignore_index=True)
    ev = pd.DataFrame(
        {
            "event_id": np.arange(len(ev), dtype=np.int64),
            "ts": ev["event_ts"],
            "event_type": ev["source"],
            "value": ev["n_tok"].astype(float),
        }
    )
    spark.createDataFrame(ev).write.parquet(str(tmp_path / "events.parquet"))
    # _ae_wins is stride-_AE_STRIDE; only comparable when they match
    assert E._AE_STRIDE == STRIDE and E._AE_L == L
    batch = (
        ae_window_scores(E._ae_wins(spark, str(tmp_path)), weights)
        .selectExpr("source", "ts_s", "err_mean", "err_max")
        .toPandas()
        .sort_values(["source", "ts_s"], ignore_index=True)
    )

    stream = (
        spark.readStream.schema(TOKEN_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(d + "/part*")
        .selectExpr("source", "event_ts", "cast(n_tok as double) as value")
    )
    out = streaming_ae_scores(stream, weights, stride=STRIDE)
    q = (
        out.writeStream.format("memory")
        .queryName("aestream_vs_batch")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("select * from aestream_vs_batch").toPandas()
    got["ts_s"] = (got["event_ts"].astype("datetime64[ns]").astype("int64") // 10**9)
    got = got.sort_values(["source", "ts_s"], ignore_index=True)
    assert len(got) == len(batch)
    np.testing.assert_array_equal(got["source"].to_numpy(), batch["source"].to_numpy())
    np.testing.assert_array_equal(got["ts_s"].to_numpy(), batch["ts_s"].to_numpy())
    np.testing.assert_array_equal(got["err_mean"].to_numpy(), batch["err_mean"].to_numpy())
    np.testing.assert_array_equal(got["err_max"].to_numpy(), batch["err_max"].to_numpy())


def test_tied_timestamps_follow_id_tiebreak(spark, tmp_path):
    """With second-granular duplicate timestamps, id_col must define the
    window order (the batch plan's (ts_s, event_id) contract)."""
    weights = make_demo_weights(seq_len=L)
    n = 40
    ts0 = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame(
        {
            "source": "s0",
            # pairs of rows share a timestamp: ties at every other row
            "event_ts": [ts0 + pd.Timedelta(seconds=i // 2) for i in range(n)],
            "event_id": np.arange(n, dtype=np.int64),
            "value": np.linspace(0.0, 20.0, n),
        }
    )
    d = tmp_path / "tied"
    for i, chunk in enumerate(np.array_split(np.arange(n), 3)):
        spark.createDataFrame(pdf.iloc[chunk]).repartition(1).write.parquet(
            str(d / f"part{i}")
        )
    schema = spark.createDataFrame(pdf).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d) + "/part*")
    )
    out = streaming_ae_scores(stream, weights, stride=STRIDE, id_col="event_id")
    q = (
        out.writeStream.format("memory")
        .queryName("aestream_tied")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("select * from aestream_tied")
        .toPandas()
        .sort_values("event_ts", ignore_index=True)
    )
    # expected: windows over the event_id order (== value order here)
    vals = pdf["value"].to_numpy()
    wins = [vals[p - L : p] for p in range(1, n + 1) if p >= L and (p - L) % STRIDE == 0]
    mean6, emax = window_scores_np(weights, zscore_windows_np(np.asarray(wins)))
    assert len(got) == len(wins)
    np.testing.assert_array_equal(got["err_mean"].to_numpy(), mean6)
    np.testing.assert_array_equal(got["err_max"].to_numpy(), emax)


def test_zscore_matches_independent_vectorized():
    """zscore_windows_np's explicit folds vs plain vectorized numpy —
    same arithmetic up to fold-order ULPs, crushed by the 6-dp snap."""
    rng = np.random.RandomState(5)
    x = rng.normal(0, 3.0, size=(500, L))
    got = zscore_windows_np(x)
    m = x.mean(axis=1, keepdims=True)
    sd = np.sqrt(((x - m) ** 2).mean(axis=1, keepdims=True))
    want = (x - m) / (sd + 1e-6)
    np.testing.assert_allclose(got, want, atol=1.1e-6, rtol=0)


def test_window_scores_match_errors():
    rng = np.random.RandomState(6)
    w = make_demo_weights(seq_len=L)
    z = zscore_windows_np(rng.normal(0, 2.0, size=(100, L)))
    mean6, emax = window_scores_np(w, z)
    errs = reconstruction_errors_np(w, z)
    np.testing.assert_array_equal(emax, errs.max(axis=1))
    np.testing.assert_allclose(mean6, errs.mean(axis=1), atol=1e-6)


def test_stride_one_emits_every_position(spark, stream_dir):
    d, pdf = stream_dir
    weights = make_demo_weights(seq_len=L)
    stream = (
        spark.readStream.schema(TOKEN_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(d + "/part*")
        .selectExpr("source", "event_ts", "cast(n_tok as double) as value")
    )
    out = streaming_ae_scores(stream, weights, stride=1)
    q = (
        out.writeStream.format("memory")
        .queryName("aestream1")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("select * from aestream1").toPandas()
    counts = got.groupby("source").size()
    for src, g in pdf.groupby("source"):
        assert counts[src] == len(g) - L + 1


def test_bad_stride_rejected():
    with pytest.raises(ValueError, match="stride"):
        streaming_ae_scores(None, make_demo_weights(), stride=0)


# ---------------------------------------------------------------------
# family dispatch: the streaming vertex scores ANY frozen artifact
# ---------------------------------------------------------------------

def test_score_windows_np_dispatch_matches_family_kernels():
    """operators.score.score_windows_np(family, ...) reproduces each
    family module's reconstruction_errors_np + the shared mean/max fold
    exactly (vanilla also pins against ae.window_scores_np)."""
    from numalogic_spark.operators.score import (
        demo_weights,
        errors_np,
        score_windows_np,
    )

    rng = np.random.default_rng(7)
    z = np.round(rng.normal(size=(23, L)), 6)
    for family in ("vanilla", "sparse", "conv", "lstm", "transformer", "vae"):
        w = demo_weights(family, L)
        errs = errors_np(family)(w, z)
        s = errs[:, 0].copy()
        for k in range(1, L):
            s = s + errs[:, k]
        mean_exp = np.floor(s / float(L) * 1e6 + 0.5) / 1e6
        mean6, emax = score_windows_np(family, w, z)
        np.testing.assert_array_equal(mean6, mean_exp)
        np.testing.assert_array_equal(emax, errs.max(axis=1))
    w = make_demo_weights(seq_len=L)
    m_ref, x_ref = window_scores_np(w, z)
    m_got, x_got = score_windows_np("vanilla", w, z)
    np.testing.assert_array_equal(m_got, m_ref)
    np.testing.assert_array_equal(x_got, x_ref)


@pytest.mark.parametrize(
    "family", ["sparse", "conv", "lstm", "transformer", "vae"]
)
def test_streaming_family_matches_batch_kernel(spark, stream_dir, family):
    """Stream twin with family= scores bit-identical to the family's
    batch kernel across forced micro-batch splits, for every non-default
    family (vanilla is the default path and has its own batch-plan
    bit-identity test above)."""
    from numalogic_spark.operators.score import demo_weights, score_windows_np

    d, pdf = stream_dir
    weights = demo_weights(family, L)
    stream = (
        spark.readStream.schema(TOKEN_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(d + "/part*")
        .selectExpr("source", "event_ts", "cast(n_tok as double) as value")
    )
    out = streaming_ae_scores(stream, weights, stride=STRIDE, family=family)
    name = f"aestream_{family}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = (
        spark.sql(f"select * from {name}")
        .toPandas()
        .sort_values(["source", "event_ts"], ignore_index=True)
    )
    rows = []
    for src, g in pdf.groupby("source"):
        g = g.sort_values("event_ts")
        vals = g["n_tok"].astype(float).to_numpy()
        ts = g["event_ts"].to_numpy()
        wins = [
            vals[p - L : p]
            for p in range(1, len(vals) + 1)
            if p >= L and (p - L) % STRIDE == 0
        ]
        ends = [
            p - 1
            for p in range(1, len(vals) + 1)
            if p >= L and (p - L) % STRIDE == 0
        ]
        mean6, emax = score_windows_np(
            family, weights, zscore_windows_np(np.asarray(wins))
        )
        rows.append(
            pd.DataFrame(
                {"source": src, "event_ts": ts[ends], "err_mean": mean6, "err_max": emax}
            )
        )
    exp = pd.concat(rows).sort_values(["source", "event_ts"], ignore_index=True)
    assert len(got) == len(exp)
    np.testing.assert_array_equal(got["err_mean"].to_numpy(), exp["err_mean"].to_numpy())
    np.testing.assert_array_equal(got["err_max"].to_numpy(), exp["err_max"].to_numpy())


def test_streaming_unknown_family_rejected():
    with pytest.raises(ValueError, match="unknown model family"):
        streaming_ae_scores(None, make_demo_weights(), family="gru")
