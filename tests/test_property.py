"""Property-based robustness: hypothesis-driven round-trips for the
compression codecs and the histogram percentile math (no Spark needed —
pure kernel properties)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from numalogic_spark.functions.compression import (
    decode_timestamps,
    decode_values,
    encode_timestamps,
    encode_values,
)


@settings(max_examples=60, deadline=None)
@given(
    arrays(
        np.int64,
        st.integers(0, 300),
        elements=st.integers(min_value=0, max_value=2**40),
    )
)
def test_ts_codec_roundtrip_any_timeline(deltas):
    ts = 1_700_000_000 + np.concatenate([[0], np.cumsum(np.abs(deltas))]).astype(np.int64)
    np.testing.assert_array_equal(decode_timestamps(encode_timestamps(ts)), ts)


@settings(max_examples=60, deadline=None)
@given(
    arrays(
        np.float64,
        st.integers(0, 300),
        elements=st.floats(allow_nan=True, allow_infinity=True, width=64),
    )
)
def test_val_codec_roundtrip_any_floats(v):
    got = decode_values(encode_values(v))
    np.testing.assert_array_equal(got.view(np.uint64), v.view(np.uint64))


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=200),
    st.floats(min_value=0.01, max_value=0.99),
)
def test_histogram_percentile_matches_numpy(values, p):
    """The window-function percentile formula (rollup._percentile_cols)
    re-implemented in numpy over a (value, count) histogram must equal
    numpy.percentile(linear) over the expanded multiset."""
    vals = np.asarray(values, dtype=float)
    uniq, cnt = np.unique(vals, return_counts=True)
    total = cnt.sum()
    cum = np.cumsum(cnt)
    pos = p * (total - 1)
    lo = int(np.floor(pos))
    hi = min(lo + 1, total - 1)
    frac = pos - lo
    v_lo = uniq[np.searchsorted(cum, lo, side="right")]
    v_hi = uniq[np.searchsorted(cum, hi, side="right")]
    got = v_lo + frac * (v_hi - v_lo)
    exp = np.percentile(vals, p * 100)
    np.testing.assert_allclose(got, exp, rtol=1e-12, atol=1e-12)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=700), min_size=1, max_size=40),
    st.integers(min_value=1, max_value=512),
)
def test_pack_plan_numpy_oracle(lens, max_tokens):
    """Pure-python twin of sequence_pack_plan's arithmetic: conservation,
    pack-size bound, and slice bounds hold for ANY length multiset —
    including zero-length docs and docs longer than a whole pack."""
    offsets, off = [], 0
    rows = []
    for i, ln in enumerate(lens):
        if ln <= 0:
            continue
        p0, p1 = off // max_tokens, (off + ln - 1) // max_tokens
        for pk in range(p0, p1 + 1):
            ts = max(pk * max_tokens - off, 0)
            te = min((pk + 1) * max_tokens - off, ln)
            rows.append((i, pk, ts, te))
            assert 0 <= ts < te <= ln
        off += ln
    total = sum(l for l in lens if l > 0)
    assert sum(te - ts for _, _, ts, te in rows) == total
    sizes = {}
    for _, pk, ts, te in rows:
        sizes[pk] = sizes.get(pk, 0) + (te - ts)
    if sizes:
        last = max(sizes)
        for pk, sz in sizes.items():
            assert sz == max_tokens if pk < last else 0 < sz <= max_tokens
