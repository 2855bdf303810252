"""Conv1dAE forward-pass inference kernel (functions/conv_ae.py).

Parity targets (mirrors tests/test_ae.py):
  * semantic parity with an INDEPENDENT vectorized eval-mode
    implementation of the reference topology (conv.py ConvBlock /
    ConvTransposeBlock / MaxPool1d / linear Upsample semantics) built
    from numpy slicing + libm, no fixed-point snapping;
  * EXACT replay parity — kernel errors must equal the unrolled SQL
    grid evaluated by Spark SQL (DuckDB exactness is exercised by the
    driver gate / selfcheck);
  * artifact round-trip, shape validation, structural op checks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from numalogic_spark.functions.conv_ae import (
    ConvAEWeights,
    ConvOp,
    conv_ae_reconstruction_error,
    conv_ae_window_scores,
    forward_np,
    make_demo_conv_weights,
    reconstruction_errors_np,
    sql_error_exprs,
    sql_forward_exprs,
)


# ---------------------------------------------------------------------
# independent reference implementation (vectorized, no snapping)
# ---------------------------------------------------------------------

def _ref_conv(h, w, b, pad):
    n, _, ln = h.shape
    out_ch, in_ch, k = w.shape
    hp = np.pad(h, ((0, 0), (0, 0), (pad, pad)))
    out_len = ln + 2 * pad - k + 1
    windows = np.stack([hp[:, :, p : p + k] for p in range(out_len)], axis=2)
    return np.einsum("ncpk,ock->nop", windows, w) + b[None, :, None]


def _ref_convT(h, w, b, pad):
    # stride-1 ConvTranspose1d == correlation with the index-reversed
    # kernel over an input padded by (k-1-pad) on each side
    return _ref_conv(h, w[:, :, ::-1], b, w.shape[2] - 1 - pad)


def _ref_upsample(h, s):
    n, c, ln = h.shape
    pos = (np.arange(ln * s) + 0.5) / s - 0.5
    i0 = np.floor(pos).astype(int)
    f = pos - i0
    a = np.clip(i0, 0, ln - 1)
    b = np.clip(i0 + 1, 0, ln - 1)
    return (1 - f)[None, None, :] * h[:, :, a] + f[None, None, :] * h[:, :, b]


def _ref_forward(weights: ConvAEWeights, x: np.ndarray) -> np.ndarray:
    h = np.asarray(x, dtype=np.float64)[:, None, :]
    for op in weights.ops:
        if op.kind == "conv":
            h = _ref_conv(h, op.w, op.b, op.pad)
        elif op.kind == "convT":
            h = _ref_convT(h, op.w, op.b, op.pad)
        elif op.kind == "affine":
            h = h * op.scale[None, :, None] + op.shift[None, :, None]
        elif op.kind == "act":
            h = {
                "relu": lambda v: np.maximum(v, 0.0),
                "tanh": np.tanh,
                "sigmoid": lambda v: 1.0 / (1.0 + np.exp(-v)),
            }[op.name](h)
        elif op.kind == "pool":
            ln = h.shape[2] // op.k
            h = h[:, :, : ln * op.k].reshape(*h.shape[:2], ln, op.k).max(3)
        else:
            h = _ref_upsample(h, op.k)
    return h[:, 0, :]


def _ref_errors(weights, x):
    d = x - _ref_forward(weights, x)
    return np.where(np.abs(d) <= 1.0, 0.5 * d * d, np.abs(d) - 0.5)


@pytest.fixture(scope="module")
def weights() -> ConvAEWeights:
    return make_demo_conv_weights()


@pytest.fixture(scope="module")
def batch() -> np.ndarray:
    rng = np.random.RandomState(99)
    return np.round(rng.normal(0.0, 1.5, size=(300, 8)), 6)


def test_kernel_matches_reference_semantics(weights, batch):
    got = reconstruction_errors_np(weights, batch)
    ref = _ref_errors(weights, batch)
    # 11 snapped stages, all Lipschitz <= max|w|·k·ch ~ small: the 6-dp
    # per-stage snap bounds the drift to a few e-5
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=0)


def test_kernel_matches_reference_with_tanh_and_sigmoid(batch):
    for act in ("tanh", "sigmoid"):
        w = make_demo_conv_weights(dec_activation=act, seed=31)
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
    w2 = ConvAEWeights.from_json(weights.to_json())
    np.testing.assert_array_equal(
        reconstruction_errors_np(w2, batch),
        reconstruction_errors_np(weights, batch),
    )


def test_validate_rejects_bad_shapes(weights):
    with pytest.raises(ValueError):
        ConvAEWeights(seq_len=9, in_channels=1, ops=weights.ops).validate()
    with pytest.raises(ValueError):
        # dangling channel count: conv expects in_ch=1 grid but gets 4
        ConvAEWeights(
            seq_len=8,
            in_channels=1,
            ops=(weights.ops[0], weights.ops[0]),
        ).validate()


def test_maxpool_and_upsample_hand_cases():
    # pool(2) of [1,9,3,4] -> [9,4]; upsample(2) of [2,4] with
    # align_corners=False -> [2, 2.5, 3.5, 4]
    pool = ConvAEWeights(
        seq_len=4,
        in_channels=1,
        ops=(ConvOp(kind="pool", k=2),),
    )
    with pytest.raises(ValueError):
        pool.validate()  # 4 -> 2 != 4: shape must not silently thread
    from numalogic_spark.functions.conv_ae import _apply_np

    h = np.array([[[1.0, 9.0, 3.0, 4.0]]])
    np.testing.assert_array_equal(
        _apply_np(ConvOp(kind="pool", k=2), h), [[[9.0, 4.0]]]
    )
    h2 = np.array([[[2.0, 4.0]]])
    np.testing.assert_array_equal(
        _apply_np(ConvOp(kind="upsample", k=2), h2),
        [[[2.0, 2.5, 3.5, 4.0]]],
    )


def test_spark_kernel_matches_numpy(spark, weights, batch):
    pdf = pd.DataFrame({"window": [list(map(float, r)) for r in batch]})
    got = (
        conv_ae_reconstruction_error(spark.createDataFrame(pdf), weights)
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
    spark.createDataFrame(pdf).createOrReplaceTempView("cae_xs")
    layers, recon = sql_forward_exprs(weights, xcols)
    sql = "WITH c0 AS (SELECT * FROM cae_xs)"
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
    out = conv_ae_window_scores(spark.createDataFrame(pdf), weights).toPandas()
    errs = reconstruction_errors_np(weights, batch[:40])
    np.testing.assert_array_equal(out["err_max"].to_numpy(), errs.max(axis=1))
    want = np.floor(np.add.reduce(errs, axis=1) / 8.0 * 1e6 + 0.5) / 1e6
    np.testing.assert_allclose(out["err_mean"].to_numpy(), want, atol=2e-6)
