"""Vanilla-AE forward-pass inference kernel (functions/ae.py).

Parity targets:
  * semantic parity with the reference forward pass — an independent
    np.dot/np.tanh implementation of VanillaAE eval-mode inference
    (vanilla.py Flatten→Linear/Tanh stack, huber reduction="none" per
    base.py:60-62) must agree with the snapped kernel to ~1e-6 (the
    declared fixed-point granularity);
  * EXACT replay parity — the kernel's errors must equal the unrolled
    SQL expressions evaluated by Spark SQL (DuckDB exactness is proven
    by the driver gate itself; Spark SQL exercises the identical
    strings through a second parser/engine here);
  * artifact round-trip and shape validation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from numalogic_spark.functions.ae import (
    AELayer,
    AEWeights,
    ae_reconstruction_error,
    ae_window_scores,
    forward_np,
    make_demo_weights,
    make_sparse_demo_weights,
    reconstruction_errors_np,
    sql_error_exprs,
    sql_forward_exprs,
)


def _reference_forward(weights: AEWeights, x: np.ndarray) -> np.ndarray:
    """Independent eval-mode VanillaAE forward: BLAS matmul + libm tanh,
    no fixed-point snapping — the semantics the kernel approximates."""
    h = np.asarray(x, dtype=np.float64)
    for ly in weights.layers:
        h = h @ ly.w.T + ly.b
        if ly.act == "tanh":
            h = np.tanh(h)
        elif ly.act == "relu":
            h = np.maximum(h, 0.0)
    return h


def _reference_errors(weights: AEWeights, x: np.ndarray) -> np.ndarray:
    d = x - _reference_forward(weights, x)
    return np.where(np.abs(d) <= 1.0, 0.5 * d * d, np.abs(d) - 0.5)


@pytest.fixture(scope="module")
def weights() -> AEWeights:
    return make_demo_weights()


@pytest.fixture(scope="module")
def batch() -> np.ndarray:
    rng = np.random.RandomState(42)
    return np.round(rng.normal(0.0, 1.5, size=(400, 8)), 6)


def test_kernel_matches_reference_semantics(weights, batch):
    got = reconstruction_errors_np(weights, batch)
    ref = _reference_errors(weights, batch)
    # per-layer 6-dp snapping bounds the drift: 4 snapped layers, tanh
    # Lipschitz 1, so worst-case ~ a few ULPs of 1e-6 per layer
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=0)


def test_forward_shape_and_determinism(weights, batch):
    a = forward_np(weights, batch)
    b = forward_np(weights, batch)
    assert a.shape == batch.shape
    assert np.array_equal(a, b)


def test_artifact_roundtrip(weights, batch):
    w2 = AEWeights.from_json(weights.to_json())
    assert w2.seq_len == weights.seq_len
    np.testing.assert_array_equal(
        reconstruction_errors_np(w2, batch),
        reconstruction_errors_np(weights, batch),
    )


def test_validate_rejects_bad_shapes(weights):
    bad = AEWeights(seq_len=9, layers=weights.layers)
    with pytest.raises(ValueError):
        bad.validate()
    with pytest.raises(ValueError):
        make_demo_weights(encoder_layersizes=(16, 8), decoder_layersizes=(4, 16))


def test_tanh_clamp_saturates_without_nan(weights):
    x = np.full((2, 8), 1e6)
    errs = reconstruction_errors_np(weights, x)
    assert np.isfinite(errs).all()


def test_spark_kernel_matches_numpy(spark, weights, batch):
    pdf = pd.DataFrame({"window": [list(map(float, r)) for r in batch]})
    df = spark.createDataFrame(pdf)
    got = (
        ae_reconstruction_error(df, weights)
        .select("recon_err")
        .toPandas()["recon_err"]
    )
    got = np.asarray([np.asarray(r) for r in got])
    # row order is preserved for a narrow no-shuffle plan
    np.testing.assert_array_equal(got, reconstruction_errors_np(weights, batch))


def test_spark_sql_replay_exact(spark, weights, batch):
    """The unrolled SQL expressions (what the DuckDB oracle runs) must
    reproduce the Arrow kernel bit-for-bit when evaluated by Spark SQL."""
    xcols = [f"x{i}" for i in range(8)]
    pdf = pd.DataFrame(batch, columns=xcols)
    pdf["rid"] = np.arange(len(pdf))
    spark.createDataFrame(pdf).createOrReplaceTempView("ae_xs")
    layers = sql_forward_exprs(weights, xcols)
    sql = "WITH c0 AS (SELECT * FROM ae_xs)"
    prev = "c0"
    for t, exprs in enumerate(layers):
        sql += f", c{t + 1} AS (SELECT *, {', '.join(exprs)} FROM {prev})"
        prev = f"c{t + 1}"
    recon = [f"h{len(layers) - 1}_{j}" for j in range(8)]
    sql += (
        f" SELECT rid, {', '.join(sql_error_exprs(weights, xcols, recon))}"
        f" FROM {prev}"
    )
    got = spark.sql(sql).toPandas().sort_values("rid", ignore_index=True)
    got = got[[f"e{k}" for k in range(8)]].to_numpy()
    np.testing.assert_array_equal(
        got, reconstruction_errors_np(weights, batch)
    )


# ---------------------------------------------------------------------
# SparseVanillaAE: the vanilla grid with the encoder's final act = relu
# (_SparseVanillaEncoder, vanilla.py:305-331; the KL sparsity penalty is
# train-time only, so eval-mode inference is the same kernel)
# ---------------------------------------------------------------------

@pytest.fixture(scope="module")
def sparse_weights() -> AEWeights:
    return make_sparse_demo_weights()


def test_sparse_topology_matches_reference(sparse_weights):
    # encoder (16, 8): hidden tanh, final relu; decoder (8, 16): hidden
    # tanh, output linear — vanilla.py:305-331 / 84-135
    assert [ly.act for ly in sparse_weights.layers] == [
        "tanh", "relu", "tanh", "linear",
    ]


def test_sparse_kernel_matches_reference_semantics(sparse_weights, batch):
    got = reconstruction_errors_np(sparse_weights, batch)
    ref = _reference_errors(sparse_weights, batch)
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=0)


def test_sparse_differs_from_vanilla_seeded_alike(batch):
    # same seed → identical weights, so any output difference is the
    # relu act alone; it must actually bite on this batch
    v = make_demo_weights(seed=77)
    s = make_sparse_demo_weights(seed=77)
    assert not np.array_equal(
        reconstruction_errors_np(v, batch),
        reconstruction_errors_np(s, batch),
    )


def test_sparse_spark_sql_replay_exact(spark, sparse_weights, batch):
    xcols = [f"x{i}" for i in range(8)]
    pdf = pd.DataFrame(batch, columns=xcols)
    pdf["rid"] = np.arange(len(pdf))
    spark.createDataFrame(pdf).createOrReplaceTempView("sae_xs")
    layers = sql_forward_exprs(sparse_weights, xcols)
    sql = "WITH c0 AS (SELECT * FROM sae_xs)"
    prev = "c0"
    for t, exprs in enumerate(layers):
        sql += f", c{t + 1} AS (SELECT *, {', '.join(exprs)} FROM {prev})"
        prev = f"c{t + 1}"
    recon = [f"h{len(layers) - 1}_{j}" for j in range(8)]
    sql += (
        f" SELECT rid, {', '.join(sql_error_exprs(sparse_weights, xcols, recon))}"
        f" FROM {prev}"
    )
    got = spark.sql(sql).toPandas().sort_values("rid", ignore_index=True)
    got = got[[f"e{k}" for k in range(8)]].to_numpy()
    np.testing.assert_array_equal(
        got, reconstruction_errors_np(sparse_weights, batch)
    )


def test_unknown_act_rejected(weights):
    ly0 = weights.layers[0]
    bad = AEWeights(
        seq_len=weights.seq_len,
        layers=(AELayer(w=ly0.w, b=ly0.b, act="gelu"), *weights.layers[1:]),
    )
    with pytest.raises(ValueError, match="unknown act"):
        bad.validate()


def test_window_scores_columns(spark, weights, batch):
    pdf = pd.DataFrame({"window": [list(map(float, r)) for r in batch[:50]]})
    out = ae_window_scores(spark.createDataFrame(pdf), weights).toPandas()
    errs = reconstruction_errors_np(weights, batch[:50])
    np.testing.assert_array_equal(out["err_max"].to_numpy(), errs.max(axis=1))
    # mean is 6-dp snapped from a left-to-right sum
    want = np.floor(
        np.add.reduce(errs, axis=1) / 8.0 * 1e6 + 0.5
    ) / 1e6
    np.testing.assert_allclose(out["err_mean"].to_numpy(), want, atol=2e-6)
