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
