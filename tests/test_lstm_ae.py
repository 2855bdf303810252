"""LSTMAE forward-pass inference kernel (functions/lstm_ae.py).

Parity targets (mirrors tests/test_ae.py / test_conv_ae.py):
  * semantic parity with an INDEPENDENT matrix-form eval-mode LSTM
    (fused (4H, F) gate matrices in torch's i,f,g,o order, np.tanh /
    closed-form sigmoid, no fixed-point snapping) replaying the
    reference topology: encoder final hidden state -> repeat ->
    decoder LSTM -> per-step Linear (lstm.py:47-49,83-86);
  * EXACT replay parity — kernel errors must equal the unrolled SQL
    level grid evaluated by Spark SQL (DuckDB exactness is exercised
    by the driver gate / selfcheck);
  * artifact round-trip, shape validation, hand-checked single-step
    recurrence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from numalogic_spark.functions.lstm_ae import (
    GATES,
    LSTMAEWeights,
    LSTMCell,
    forward_np,
    lstm_ae_reconstruction_error,
    lstm_ae_window_scores,
    make_demo_lstm_weights,
    reconstruction_errors_np,
    sql_error_exprs,
    sql_forward_exprs,
)


# ---------------------------------------------------------------------
# independent reference implementation (fused matrices, no snapping)
# ---------------------------------------------------------------------

def _sig(a):
    return 1.0 / (1.0 + np.exp(-a))


def _fused(cell: LSTMCell):
    wx = np.concatenate([cell.wx[g] for g in GATES], axis=0)  # (4H, F)
    wh = np.concatenate([cell.wh[g] for g in GATES], axis=0)  # (4H, H)
    b = np.concatenate([cell.b[g] for g in GATES])  # (4H,)
    return wx, wh, b


def _ref_lstm(cell: LSTMCell, xs: np.ndarray) -> np.ndarray:
    """xs: (n, T, F) -> all hidden states (n, T, H)."""
    wx, wh, b = _fused(cell)
    n, T, _ = xs.shape
    H = cell.hidden
    h = np.zeros((n, H))
    c = np.zeros((n, H))
    outs = []
    for t in range(T):
        z = xs[:, t, :] @ wx.T + h @ wh.T + b
        i, f, g, o = (
            _sig(z[:, :H]),
            _sig(z[:, H : 2 * H]),
            np.tanh(z[:, 2 * H : 3 * H]),
            _sig(z[:, 3 * H :]),
        )
        c = f * c + i * g
        h = o * np.tanh(c)
        outs.append(h)
    return np.stack(outs, axis=1)


def _ref_forward(w: LSTMAEWeights, x: np.ndarray) -> np.ndarray:
    xs = np.asarray(x, dtype=np.float64)[:, :, None]
    emb = _ref_lstm(w.encoder, xs)[:, -1, :]  # final hidden state
    rep = np.repeat(emb[:, None, :], w.seq_len, axis=1)
    hs = _ref_lstm(w.decoder, rep)
    return hs @ w.fc_w.T[:, 0] + w.fc_b[0]


def _ref_errors(w, x):
    d = x - _ref_forward(w, x)
    return np.where(np.abs(d) <= 1.0, 0.5 * d * d, np.abs(d) - 0.5)


@pytest.fixture(scope="module")
def weights() -> LSTMAEWeights:
    return make_demo_lstm_weights()


@pytest.fixture(scope="module")
def batch() -> np.ndarray:
    rng = np.random.RandomState(77)
    return np.round(rng.normal(0.0, 1.5, size=(300, 8)), 6)


def test_kernel_matches_reference_semantics(weights, batch):
    got = reconstruction_errors_np(weights, batch)
    ref = _ref_errors(weights, batch)
    # 16 snapped recurrence steps; sigmoid/tanh are contractions, so the
    # 6-dp per-column snap drift stays within a few e-5
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=0)


def test_single_step_hand_case():
    """seq_len=1, H=1: the whole recurrence collapses to the closed
    form h = sig(o_pre) * tanh(sig(i_pre) * tanh(g_pre))."""
    one = {g: np.array([[0.5]]) for g in GATES}
    hh = {g: np.array([[0.25]]) for g in GATES}
    b = {g: np.array([0.1]) for g in GATES}
    cell = LSTMCell(wx=one, wh=hh, b=b)
    w = LSTMAEWeights(
        seq_len=1,
        encoder=cell,
        decoder=cell,
        fc_w=np.array([[2.0]]),
        fc_b=np.array([0.3]),
    )
    x = np.array([[0.8]])
    got = forward_np(w, x)
    pre = 0.1 + 0.5 * 0.8  # no h_prev taps at t=0
    i = _sig(pre)
    g = np.tanh(pre)
    h_enc = _sig(pre) * np.tanh(i * g)
    pre_d = 0.1 + 0.5 * h_enc
    h_dec = _sig(pre_d) * np.tanh(_sig(pre_d) * np.tanh(pre_d))
    want = 0.3 + 2.0 * h_dec
    np.testing.assert_allclose(got, [[want]], atol=5e-6, rtol=0)


def test_forward_shape_and_determinism(weights, batch):
    a = forward_np(weights, batch)
    assert a.shape == batch.shape
    assert np.array_equal(a, forward_np(weights, batch))


def test_artifact_roundtrip(weights, batch):
    w2 = LSTMAEWeights.from_json(weights.to_json())
    np.testing.assert_array_equal(
        reconstruction_errors_np(w2, batch),
        reconstruction_errors_np(weights, batch),
    )


def test_validate_rejects_bad_shapes(weights):
    with pytest.raises(ValueError):
        LSTMAEWeights(
            seq_len=8,
            encoder=weights.encoder,
            decoder=weights.decoder,
            fc_w=np.zeros((1, 5)),  # decoder hidden is 3
            fc_b=np.zeros(1),
        ).validate()
    with pytest.raises(ValueError):
        # decoder fed raw inputs instead of the embedding
        LSTMAEWeights(
            seq_len=8,
            encoder=weights.encoder,
            decoder=make_demo_lstm_weights(embedding_dim=2).decoder,
            fc_w=np.zeros((1, 2)),
            fc_b=np.zeros(1),
        ).validate()
    with pytest.raises(ValueError):
        forward_np(weights, np.zeros((4, 7)))  # wrong window length


def test_spark_kernel_matches_numpy(spark, weights, batch):
    pdf = pd.DataFrame({"window": [list(map(float, r)) for r in batch]})
    got = (
        lstm_ae_reconstruction_error(spark.createDataFrame(pdf), weights)
        .select("recon_err")
        .toPandas()["recon_err"]
    )
    got = np.asarray([np.asarray(r) for r in got])
    np.testing.assert_array_equal(
        got, reconstruction_errors_np(weights, batch)
    )


def test_spark_sql_replay_exact(spark, weights, batch):
    """The unrolled SQL level grid (what the DuckDB oracle runs) must
    reproduce the Arrow kernel bit-for-bit under Spark SQL too."""
    xcols = [f"x{i}" for i in range(8)]
    pdf = pd.DataFrame(batch[:120], columns=xcols)
    pdf["rid"] = np.arange(len(pdf))
    spark.createDataFrame(pdf).createOrReplaceTempView("lae_xs")
    # the recurrence unrolls to ~90 chained CTE levels; Spark's analyzer
    # default fixed-point cap (100 iterations) is sized for ~shallower
    # trees. Driver-facing production never runs this SQL on Spark (the
    # oracle is DuckDB-side; Spark runs the Arrow kernel) — raise the
    # cap only for this parity check.
    spark.conf.set("spark.sql.analyzer.maxIterations", "800")
    levels, recon = sql_forward_exprs(weights, xcols)
    sql = "WITH c0 AS (SELECT * FROM lae_xs)"
    prev = "c0"
    for t, exprs in enumerate(levels):
        sql += f", c{t + 1} AS (SELECT *, {', '.join(exprs)} FROM {prev})"
        prev = f"c{t + 1}"
    sql += (
        f" SELECT rid, {', '.join(sql_error_exprs(weights, xcols, recon))}"
        f" FROM {prev}"
    )
    got = spark.sql(sql).toPandas().sort_values("rid", ignore_index=True)
    np.testing.assert_array_equal(
        got[[f"e{k}" for k in range(8)]].to_numpy(),
        reconstruction_errors_np(weights, batch[:120]),
    )


def test_window_scores_columns(spark, weights, batch):
    pdf = pd.DataFrame({"window": [list(map(float, r)) for r in batch[:40]]})
    out = lstm_ae_window_scores(spark.createDataFrame(pdf), weights).toPandas()
    errs = reconstruction_errors_np(weights, batch[:40])
    np.testing.assert_array_equal(out["err_max"].to_numpy(), errs.max(axis=1))
    want = np.floor(np.add.reduce(errs, axis=1) / 8.0 * 1e6 + 0.5) / 1e6
    np.testing.assert_allclose(out["err_mean"].to_numpy(), want, atol=2e-6)
