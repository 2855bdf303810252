"""Conv1dVAE mean-latent inference kernel (functions/vae.py).

Parity targets (mirrors tests/test_conv_ae.py):
  * semantic parity with an INDEPENDENT vectorized eval-mode
    implementation of the reference topology (vae/variants/conv.py
    causal conv / dense heads / strided ConvTranspose1d semantics,
    z = mu) built from numpy einsum/matmul, no fixed-point snapping;
  * EXACT replay parity — kernel errors must equal the unrolled SQL
    grid evaluated by Spark SQL (DuckDB exactness is exercised by the
    selfcheck gate);
  * artifact round-trip, shape validation, hand-computed strided
    conv/convT cases.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from numalogic_spark.functions.vae import (
    VAEWeights,
    VOp,
    forward_np,
    make_demo_vae_weights,
    reconstruction_errors_np,
    sql_error_exprs,
    sql_forward_exprs,
    vae_reconstruction_error,
    vae_window_scores,
)


# ---------------------------------------------------------------------
# independent reference implementation (vectorized, no snapping)
# ---------------------------------------------------------------------

def _ref_cconv(h, w, b, s, dil):
    n, _, ln = h.shape
    out_ch, in_ch, k = w.shape
    lpad = (k - 1) * dil
    hp = np.pad(h, ((0, 0), (0, 0), (lpad, 0)))
    out_len = (ln - 1) // s + 1
    windows = np.stack(
        [hp[:, :, s * p : s * p + (k - 1) * dil + 1 : dil]
         for p in range(out_len)],
        axis=2,
    )
    return np.einsum("ncpk,ock->nop", windows, w) + b[None, :, None]


def _ref_convt(h, w, b, s, pad, outpad):
    n, in_ch, ln = h.shape
    out_ch, _, k = w.shape
    out_len = (ln - 1) * s - 2 * pad + k + outpad
    out = np.zeros((n, out_ch, out_len))
    for t in range(ln):
        for j in range(k):
            p = t * s - pad + j
            if 0 <= p < out_len:
                out[:, :, p] += np.einsum("nc,oc->no", h[:, :, t], w[:, :, j])
    return out + b[None, :, None]


def _ref_forward(weights: VAEWeights, x: np.ndarray) -> np.ndarray:
    h = np.asarray(x, dtype=np.float64)[:, None, :]
    for op in weights.ops:
        if op.kind == "cconv":
            h = _ref_cconv(h, op.w, op.b, op.s, op.dil)
        elif op.kind == "convt":
            h = _ref_convt(h, op.w, op.b, op.s, op.pad, op.outpad)
        elif op.kind == "dense":
            flat = h.reshape(h.shape[0], -1)
            h = (flat @ op.w.T + op.b).reshape(
                h.shape[0], op.rows, op.cols
            )
        elif op.kind == "affine":
            h = h * op.scale[None, :, None] + op.shift[None, :, None]
        else:
            h = np.maximum(h, 0.0)
    return h[:, 0, :]


def _ref_errors(weights, x):
    d = x - _ref_forward(weights, x)
    return d * d


@pytest.fixture(scope="module")
def weights() -> VAEWeights:
    return make_demo_vae_weights()


@pytest.fixture(scope="module")
def batch() -> np.ndarray:
    rng = np.random.RandomState(99)
    return np.round(rng.normal(0.0, 1.5, size=(300, 8)), 6)


def test_kernel_matches_reference_semantics(weights, batch):
    got = reconstruction_errors_np(weights, batch)
    ref = _ref_errors(weights, batch)
    # 14 snapped stages; 6-dp per-stage snap bounds drift to a few e-5
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=0)


def test_two_block_dilated_encoder_matches_reference(batch):
    # conv_channels=(4, 3): second CausalConvBlock gets dilation 2
    # (conv.py:63-72) — exercises the dilated strided tap geometry
    w = make_demo_vae_weights(seq_len=8, conv_channels=(4, 3), seed=31)
    np.testing.assert_allclose(
        reconstruction_errors_np(w, batch[:80]),
        _ref_errors(w, batch[:80]),
        atol=5e-5,
        rtol=0,
    )


def test_forward_shape_and_determinism(weights, batch):
    a = forward_np(weights, batch)
    assert a.shape == batch.shape
    assert np.array_equal(a, forward_np(weights, batch))


def test_artifact_roundtrip(weights, batch):
    w2 = VAEWeights.from_json(weights.to_json())
    np.testing.assert_array_equal(
        reconstruction_errors_np(w2, batch),
        reconstruction_errors_np(weights, batch),
    )


def test_validate_rejects_bad_shapes(weights):
    with pytest.raises(ValueError):
        VAEWeights(seq_len=9, ops=weights.ops).validate()
    with pytest.raises(ValueError):
        # dangling channel count: cconv expects in_ch=1 but gets 4
        VAEWeights(seq_len=8, ops=(weights.ops[0], weights.ops[0])).validate()


def test_strided_conv_and_convt_hand_cases():
    from numalogic_spark.functions.vae import _apply_np

    # causal conv k=2, s=2, w=[1,10] (w[...,0]=1 left tap, w[...,1]=10
    # current), left pad 1: input [1,2,3,4] -> positions 0,2
    #   p=0: 10*x[0] + 1*pad0 = 10 ; p=1: 1*x[1] + 10*x[2] = 32
    op = VOp(kind="cconv", w=np.array([[[1.0, 10.0]]]),
             b=np.zeros(1), s=2, dil=1)
    h = np.array([[[1.0, 2.0, 3.0, 4.0]]])
    np.testing.assert_array_equal(_apply_np(op, h), [[[10.0, 32.0]]])
    # convT k=3, s=2, pad=1, outpad=1 of [a,b]: out_len = 2+3+1-2 = 4
    #   p: sum of w[j]*x[t] with t=(p+1-j)/2 integral
    #   p0: j=1,t=0 -> w1*a ; p1: j=0,t=1 -> w0*b , j=2,t=0 -> w2*a
    #   p2: j=1,t=1 -> w1*b ; p3: j=2,t=1 -> w2*b
    opt = VOp(kind="convt", w=np.array([[[1.0, 10.0, 100.0]]]),
              b=np.zeros(1), s=2, pad=1, outpad=1)
    h2 = np.array([[[2.0, 3.0]]])
    np.testing.assert_array_equal(
        _apply_np(opt, h2), [[[20.0, 203.0, 30.0, 300.0]]]
    )


def test_spark_kernel_matches_numpy(spark, weights, batch):
    pdf = pd.DataFrame({"window": [list(map(float, r)) for r in batch]})
    got = (
        vae_reconstruction_error(spark.createDataFrame(pdf), weights)
        .select("recon_err")
        .toPandas()["recon_err"]
    )
    got = np.asarray([np.asarray(r) for r in got])
    np.testing.assert_array_equal(
        got, reconstruction_errors_np(weights, batch)
    )


def test_spark_sql_replay_exact(spark, weights, batch):
    """The unrolled SQL grid (what the DuckDB oracle runs) must
    reproduce the Arrow kernel bit-for-bit under Spark SQL too."""
    xcols = [f"x{i}" for i in range(8)]
    pdf = pd.DataFrame(batch[:120], columns=xcols)
    pdf["rid"] = np.arange(len(pdf))
    spark.createDataFrame(pdf).createOrReplaceTempView("vae_xs")
    layers, recon = sql_forward_exprs(weights, xcols)
    sql = "WITH c0 AS (SELECT * FROM vae_xs)"
    prev = "c0"
    for t, exprs in enumerate(layers):
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
    out = vae_window_scores(spark.createDataFrame(pdf), weights).toPandas()
    errs = reconstruction_errors_np(weights, batch[:40])
    np.testing.assert_array_equal(out["err_max"].to_numpy(), errs.max(axis=1))
    want = np.floor(np.add.reduce(errs, axis=1) / 8.0 * 1e6 + 0.5) / 1e6
    np.testing.assert_allclose(out["err_mean"].to_numpy(), want, atol=2e-6)
