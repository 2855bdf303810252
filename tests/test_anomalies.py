"""Port of the reference's AnomalyGenerator test suite
(tests/synthetic/test_anomalies.py) over the full variant set."""

import numpy as np
import pandas as pd
import pytest

from numalogic_spark.synthetic import (
    AnomalyGenerator,
    gen_multivariate_pandas,
    train_test_split_wide,
)


@pytest.fixture(scope="module")
def split():
    ts_df = gen_multivariate_pandas(7200, 5)
    return train_test_split_wide(ts_df, 1440)


def _check_common(test_df, outlier_df, cols):
    # ref asserts: shape differs (extra label col), frames differ,
    # non-injected columns EXACTLY equal
    assert test_df.shape != outlier_df.shape
    assert not test_df.equals(outlier_df)
    other_cols = test_df.columns.difference(cols)
    assert test_df[other_cols].equals(outlier_df[other_cols])
    assert "is_anomaly" in outlier_df.columns


def test_inject_global_anomalies(split):
    train_df, test_df = split
    gen = AnomalyGenerator(train_df)
    cols = ["s1", "s2"]
    out = gen.inject_anomalies(test_df, cols=cols)
    _check_common(test_df, out, cols)
    # positive global anomalies push the block ABOVE the series range
    n_anom = int(np.ceil(len(test_df) * 0.1))
    assert (out["is_anomaly"] > 0).sum() >= n_anom
    for c in cols:
        assert out[c].max() > test_df[c].max()


def test_inject_contextual_anomalies(split):
    train_df, test_df = split
    gen = AnomalyGenerator(
        train_df, anomaly_type="contextual", anomaly_sign="negative", mu=1, sigma=0.5
    )
    cols = ["s1", "s2"]
    out = gen.inject_anomalies(test_df, cols=cols)
    _check_common(test_df, out, cols)
    # negative sign labels are negative (ref label contract: += sign)
    assert (out["is_anomaly"] < 0).any()


def test_inject_collective_anomalies(split):
    train_df, test_df = split
    gen = AnomalyGenerator(train_df, anomaly_type="collective")
    cols = ["s1", "s2"]
    out = gen.inject_anomalies(test_df, cols=cols)
    _check_common(test_df, out, cols)
    # collective: ONE shared window — every labeled row carries BOTH
    # columns' contributions (label == 2 with two injected cols)
    lab = out["is_anomaly"].to_numpy()
    assert set(np.unique(lab)) == {0, 2}
    window = np.flatnonzero(lab)
    assert (np.diff(window) == 1).all()  # contiguous
    for c in cols:
        assert not np.allclose(out[c].to_numpy()[window], test_df[c].to_numpy()[window])


def test_inject_causal_anomalies(split):
    train_df, test_df = split
    gen = AnomalyGenerator(train_df, anomaly_type="causal")
    cols = ["s1", "s2", "s3"]
    out = gen.inject_anomalies(test_df, cols=cols)
    _check_common(test_df, out, cols)
    # causal: blocks are staggered, never all-overlapping → labels stay 1
    lab = out["is_anomaly"].to_numpy()
    assert lab.max() == 1
    # one block per column, separated by gaps
    runs = np.flatnonzero(np.diff(np.concatenate([[0], (lab > 0).astype(int), [0]])) == 1)
    assert len(runs) == len(cols)


def test_injected_cols(split):
    train_df, test_df = split
    gen = AnomalyGenerator(train_df)
    cols = ["s1", "s2"]
    gen.inject_anomalies(test_df, cols=cols)
    assert gen.injected_cols == cols


def test_injected_no_cols(split):
    train_df, test_df = split
    gen = AnomalyGenerator(train_df, anomaly_type="causal")
    out = gen.inject_anomalies(test_df)
    assert test_df.shape != out.shape
    assert not test_df.equals(out)
    assert len(gen.injected_cols) == 2  # causal MIN_COLUMNS


def test_invalid_anomaly_type(split):
    train_df, test_df = split
    gen = AnomalyGenerator(train_df, anomaly_type="Hahaha")
    with pytest.raises(AttributeError):
        gen.inject_anomalies(test_df)


def test_invalid_anomaly_sign(split):
    train_df, test_df = split
    gen = AnomalyGenerator(train_df, anomaly_sign="random")
    with pytest.raises(ValueError):
        gen.inject_anomalies(test_df)


def test_seeded_determinism(split):
    train_df, test_df = split
    a = AnomalyGenerator(train_df, random_seed=7).inject_anomalies(test_df, cols=["s1"])
    b = AnomalyGenerator(train_df, random_seed=7).inject_anomalies(test_df, cols=["s1"])
    pd.testing.assert_frame_equal(a, b)
    c = AnomalyGenerator(train_df, random_seed=8).inject_anomalies(test_df, cols=["s1"])
    assert not a["s1"].equals(c["s1"])


def test_duplicate_column_pick_compounds(split):
    """Review fix: rng.choice samples WITH replacement; when the same
    column is picked twice the second block must inject on top of the
    first (shared scaled state), so every labeled row is actually
    anomalous."""
    train_df, test_df = split
    # force the duplicate explicitly — same contract as a duplicate pick
    gen = AnomalyGenerator(train_df, anomaly_type="causal", random_seed=1)
    out = gen.inject_anomalies(test_df, cols=["s2", "s2"])
    lab = out["is_anomaly"].to_numpy()
    changed = out["s2"].to_numpy() != test_df["s2"].to_numpy()
    # every labeled row carries a real modification
    assert changed[lab > 0].all()


def test_synthetic_ts_generator_port():
    """Port of tests/synthetic/test_timeseries.py."""
    from numalogic_spark.synthetic import SyntheticTSGenerator

    gen = SyntheticTSGenerator(12000, 10)
    df = gen.gen_tseries()
    assert df.shape == (12000, 10)
    assert gen.baseline()
    assert gen.trend().shape == (12000,)
    assert SyntheticTSGenerator(1000, 10).seasonality(1440).shape == (1000,)
    assert gen.noise().shape == (12000,)
    g2 = SyntheticTSGenerator(10080, 10)
    tr, te = g2.train_test_split(g2.gen_tseries(), 1440)
    assert tr.shape == (8640, 10) and te.shape == (1440, 10)
    # seeded determinism (engine addition)
    a = SyntheticTSGenerator(500, 3, random_seed=5).gen_tseries()
    b = SyntheticTSGenerator(500, 3, random_seed=5).gen_tseries()
    pd.testing.assert_frame_equal(a, b)


def test_sparsity_generator_port():
    """Port of tests/synthetic/test_sparsity.py."""
    import copy

    from numalogic_spark.synthetic import SparsityGenerator, SyntheticTSGenerator

    ts_df = SyntheticTSGenerator(12000, 10).gen_tseries()
    data = copy.deepcopy(ts_df)
    g0 = SparsityGenerator(data, sparse_ratio=0)
    g0.generate_sparsity()
    assert g0.data.equals(ts_df)
    data = copy.deepcopy(ts_df)
    g1 = SparsityGenerator(data, sparse_ratio=1)
    g1.generate_sparsity()
    assert not g1.data.equals(ts_df)
    assert g1.data.shape == ts_df.shape
    # ratio 1 zeroes everything; ratio 0.2 zeroes ~20% of rows
    assert (g1.data.to_numpy() == 0).all()
    data = copy.deepcopy(ts_df)
    g2 = SparsityGenerator(data, sparse_ratio=0.2)
    g2.generate_sparsity()
    zero_rows = (g2.data == 0).any(axis=1).sum()
    assert zero_rows == int(12000 * 0.2)
