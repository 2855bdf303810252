"""Rollup cascade vs pandas/numpy oracle — exact-match gate.

Ports the reference's aggregation semantics checks (Druid granularity
rollup, /root/reference/tests/connectors/test_druid.py:39-140) onto the
token table: counts/sums exact, mean = sum/count, p95 == numpy.percentile
(linear) at EVERY tier including cascaded ones.
"""

import numpy as np

from numalogic_spark.operators.rollup import RollupConfig, rollup_cascade
from numalogic_spark.oracle import rollup_oracle
from tests.conftest import assert_frames_match


def test_cascade_matches_oracle(spark, tokens_df, tokens_pdf):
    tiers = rollup_cascade(tokens_df, RollupConfig())
    for tier in ("1m", "1h", "1d"):
        got = tiers[tier].toPandas()
        exp = rollup_oracle(tokens_pdf, tier)
        assert_frames_match(
            got,
            exp,
            sort_cols=["source", "bucket_ts"],
            float_cols=("n_tok_mean", "n_tok_p95", "token_rate"),
            atol=1e-9,
        )


def test_cascade_consistency(spark, tokens_df):
    """1h re-aggregation must equal direct-from-raw 1h (lossless merge)."""
    tiers = rollup_cascade(tokens_df)
    t1m = tiers["1m"].toPandas()
    t1h = tiers["1h"].toPandas()
    # count/sum at 1h == sum of 1m members
    t1m["h"] = t1m["bucket_ts"].dt.floor("h")
    agg = t1m.groupby(["source", "h"])[["count", "n_tok_sum"]].sum().reset_index()
    m = t1h.merge(agg, left_on=["source", "bucket_ts"], right_on=["source", "h"])
    assert len(m) == len(t1h)
    np.testing.assert_array_equal(m["count_x"].to_numpy(), m["count_y"].to_numpy())
    np.testing.assert_array_equal(m["n_tok_sum_x"].to_numpy(), m["n_tok_sum_y"].to_numpy())


def test_token_array_invariant(spark, tokens_df):
    """Per-row invariant vs source: token arrays pass through unchanged."""
    from numalogic_spark.operators.rollup import raw_tier

    out = raw_tier(tokens_df)
    bad = (
        tokens_df.alias("s")
        .join(out.alias("o"), "doc_id")
        .filter("s.tokens != o.tokens")
        .count()
    )
    assert bad == 0
    assert out.count() == tokens_df.count()


def test_fused_tiers_equal_cascade(spark, tokens_df):
    """rollup_tiers_fused must be row-identical to the cascade's tier union
    (same exact histogram → same exact percentiles), just computed in one
    exchange + one window chain."""
    import pandas as pd

    from numalogic_spark.operators.rollup import histogram, rollup_tiers_fused

    cfg = RollupConfig()
    fused = rollup_tiers_fused(histogram(tokens_df, cfg, "minute"), cfg).toPandas()
    tiers = rollup_cascade(tokens_df, cfg)
    casc = pd.concat(
        [tiers[t].toPandas() for t in ("1m", "1h", "1d")], ignore_index=True
    )
    assert_frames_match(
        fused,
        casc,
        sort_cols=["tier", "source", "bucket_ts"],
        float_cols=("n_tok_mean", "n_tok_p95", "token_rate"),
        atol=0.0,
    )


def test_fingerprinted_histogram(spark, tokens_df):
    """histogram_with_fingerprint: same histogram as histogram(), and the
    derived global invariant equals a direct raw-tier aggregation."""
    from pyspark.sql import functions as F

    from numalogic_spark.operators.rollup import (
        histogram,
        histogram_with_fingerprint,
        invariant_from_histogram,
    )

    cfg = RollupConfig()
    hf = histogram_with_fingerprint(tokens_df, cfg, "minute")
    assert_frames_match(
        hf.drop("fp").toPandas(),
        histogram(tokens_df, cfg, "minute").toPandas(),
        sort_cols=["source", "bucket_ts", "v"],
        float_cols=("v",),
        atol=0.0,
    )
    got = invariant_from_histogram(hf).collect()[0]
    exp = tokens_df.select(
        F.bit_xor(F.xxhash64("tokens")).alias("fp"),
        F.count(F.lit(1)).alias("rows"),
        F.sum("n_tok").alias("tokens"),
    ).collect()[0]
    assert (got["fp"], got["rows"], got["tokens"]) == (exp["fp"], exp["rows"], exp["tokens"])
