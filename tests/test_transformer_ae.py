"""TransformerAE forward-pass inference kernel (functions/transformer_ae.py).

Parity targets (mirrors tests/test_ae.py / test_lstm_ae.py):
  * semantic parity with an INDEPENDENT matrix-form eval-mode
    transformer (BLAS matmuls, true np softmax/LayerNorm, no
    fixed-point snapping) replaying the reference topology at
    n_features = 1 — including the FULL attention with explicit
    query/key projections and the singleton softmax, to prove the
    kernel's query/key-cancellation collapse is exact, not an
    approximation (transformer.py:19-33,93-137);
  * EXACT replay parity — kernel errors must equal the unrolled SQL
    level grid evaluated by Spark SQL (DuckDB exactness is exercised
    by the driver gate / selfcheck);
  * artifact round-trip, shape validation, positional-encoding shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from numalogic_spark.functions.ae import sql_error_exprs
from numalogic_spark.functions.transformer_ae import (
    AttnBlock,
    TransformerAEWeights,
    forward_np,
    make_demo_transformer_weights,
    positional_encoding,
    reconstruction_errors_np,
    sql_forward_exprs,
    transformer_ae_reconstruction_error,
    transformer_ae_window_scores,
)

LN_EPS = 1e-5


# ---------------------------------------------------------------------
# independent reference implementation (full attention incl. the
# query/key path the kernel proves redundant; no snapping)
# ---------------------------------------------------------------------

def _softmax(a: np.ndarray, axis: int = -1) -> np.ndarray:
    e = np.exp(a - a.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _full_attn(block: AttnBlock, q_src: np.ndarray, kv_src: np.ndarray,
               rng: np.random.RandomState) -> np.ndarray:
    """The reference MultiHeadAttention at n_features = 1 with RANDOM
    query/key projections: src rows are single tokens, so the scaled
    dot product is a (n, 1, 1) matrix and its softmax is exactly 1 —
    the output must equal the value projection no matter what the
    query/key weights are."""
    outs = []
    for wv, bv in zip(block.wv, block.bv):
        dim_k = wv.shape[0]
        wq = rng.uniform(-5, 5, size=(dim_k, q_src.shape[1]))
        wk = rng.uniform(-5, 5, size=(dim_k, kv_src.shape[1]))
        q = q_src @ wq.T  # (n, dim_k) — one token per row
        k = kv_src @ wk.T
        v = kv_src @ wv.T + bv
        scores = (q * k).sum(axis=1, keepdims=True) / np.sqrt(dim_k)
        weights = _softmax(scores[:, :, None], axis=-1)[:, :, 0]  # == 1
        outs.append(weights * v)
    return np.concatenate(outs, axis=1) @ block.wo.T + block.bo


def _ln(g, b, r):
    m = r.mean(axis=1, keepdims=True)
    v = r.var(axis=1, keepdims=True)  # biased, like torch
    return (r - m) / np.sqrt(v + LN_EPS) * g + b


def _ff(f, h):
    return np.maximum(h @ f.w1.T + f.b1, 0.0) @ f.w2.T + f.b2


def _ref_forward(w: TransformerAEWeights, x: np.ndarray) -> np.ndarray:
    rng = np.random.RandomState(99)  # query/key weights: arbitrary
    pe = positional_encoding(w.seq_len)
    u = x + pe
    for ly in w.encoder:
        u = _ln(ly.ln1.g, ly.ln1.b, u + _full_attn(ly.attn, u, u, rng))
        u = _ln(ly.ln2.g, ly.ln2.b, u + _ff(ly.ff, u))
    mem = u
    t = x + pe
    for ly in w.decoder:
        t = _ln(ly.ln1.g, ly.ln1.b, t + _full_attn(ly.self_attn, t, t, rng))
        t = _ln(ly.ln2.g, ly.ln2.b, t + _full_attn(ly.cross_attn, t, mem, rng))
        t = _ln(ly.ln3.g, ly.ln3.b, t + _ff(ly.ff, t))
    return _softmax(t @ w.wf.T + w.bf, axis=1)


def _ref_errors(w: TransformerAEWeights, x: np.ndarray) -> np.ndarray:
    d = x - _ref_forward(w, x)
    return np.where(np.abs(d) <= 1.0, 0.5 * d * d, np.abs(d) - 0.5)


@pytest.fixture(scope="module")
def weights() -> TransformerAEWeights:
    return make_demo_transformer_weights()


@pytest.fixture(scope="module")
def batch() -> np.ndarray:
    rng = np.random.RandomState(42)
    return np.round(rng.normal(0.0, 1.5, size=(300, 8)), 6)


def test_positional_encoding_alternates():
    np.testing.assert_array_equal(
        positional_encoding(8), [0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0]
    )


def test_kernel_matches_reference_semantics(weights, batch):
    """Includes the query/key path: random q/k weights in the reference
    must not move the output, proving the collapse is exact."""
    got = reconstruction_errors_np(weights, batch)
    ref = _ref_errors(weights, batch)
    # ~66 snapped levels; LayerNorm contracts drift every block, so the
    # accumulated error stays within a few fixed-point grains
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=0)


def test_forward_is_softmax_row(weights, batch):
    y = forward_np(weights, batch[:64])
    assert y.shape == (64, 8)
    assert (y >= 0).all()
    # rows sum to 1 up to the 6-dp snap of each term
    np.testing.assert_allclose(y.sum(axis=1), 1.0, atol=1e-5)


def test_artifact_roundtrip(weights, batch):
    w2 = TransformerAEWeights.from_json(weights.to_json())
    np.testing.assert_array_equal(
        reconstruction_errors_np(w2, batch),
        reconstruction_errors_np(weights, batch),
    )


def test_validate_rejects_bad_shapes(weights):
    bad = TransformerAEWeights(
        seq_len=9,
        encoder=weights.encoder,
        decoder=weights.decoder,
        wf=weights.wf,
        bf=weights.bf,
    )
    with pytest.raises(ValueError):
        bad.validate()
    with pytest.raises(ValueError):
        TransformerAEWeights(
            seq_len=8, encoder=(), decoder=weights.decoder,
            wf=weights.wf, bf=weights.bf,
        ).validate()


def test_spark_kernel_matches_numpy(spark, weights, batch):
    pdf = pd.DataFrame({"window": [list(map(float, r)) for r in batch]})
    got = (
        transformer_ae_reconstruction_error(spark.createDataFrame(pdf), weights)
        .select("recon_err")
        .toPandas()["recon_err"]
    )
    got = np.asarray([np.asarray(r) for r in got])
    np.testing.assert_array_equal(got, reconstruction_errors_np(weights, batch))


def test_spark_sql_replay_exact(spark, weights, batch):
    """The unrolled SQL level grid (what the DuckDB oracle runs) must
    reproduce the Arrow kernel bit-for-bit under Spark SQL."""
    # 66 chained CTEs × ~400 accumulated columns exceed Catalyst's
    # default 100 resolution iterations; 200 resolves (and the replay
    # is exact there). The production oracle runs only in DuckDB, which
    # has no such ceiling — this is a test-session knob, not a contract.
    spark.conf.set("spark.sql.analyzer.maxIterations", "200")
    xcols = [f"x{i}" for i in range(8)]
    pdf = pd.DataFrame(batch[:150], columns=xcols)
    pdf["rid"] = np.arange(len(pdf))
    spark.createDataFrame(pdf).createOrReplaceTempView("tae_xs")
    levels, recon = sql_forward_exprs(weights, xcols)
    sql = "WITH c0 AS (SELECT * FROM tae_xs)"
    prev = "c0"
    for t, exprs in enumerate(levels):
        sql += f", c{t + 1} AS (SELECT *, {', '.join(exprs)} FROM {prev})"
        prev = f"c{t + 1}"
    sql += (
        f" SELECT rid, {', '.join(sql_error_exprs(weights, xcols, recon))}"
        f" FROM {prev}"
    )
    try:
        got = spark.sql(sql).toPandas().sort_values("rid", ignore_index=True)
    finally:
        spark.conf.unset("spark.sql.analyzer.maxIterations")
    got = got[[f"e{k}" for k in range(8)]].to_numpy()
    np.testing.assert_array_equal(
        got, reconstruction_errors_np(weights, batch[:150])
    )


def test_window_scores_columns(spark, weights, batch):
    pdf = pd.DataFrame({"window": [list(map(float, r)) for r in batch[:50]]})
    out = transformer_ae_window_scores(spark.createDataFrame(pdf), weights).toPandas()
    errs = reconstruction_errors_np(weights, batch[:50])
    np.testing.assert_array_equal(out["err_max"].to_numpy(), errs.max(axis=1))
    want = np.floor(np.add.reduce(errs, axis=1) / 8.0 * 1e6 + 0.5) / 1e6
    np.testing.assert_allclose(out["err_mean"].to_numpy(), want, atol=2e-6)
