from numalogic_spark.operators.gapfill import gapfill_linear
from numalogic_spark.operators.rollup import rollup_cascade
from numalogic_spark.oracle import gapfill_oracle, rollup_oracle
from tests.conftest import assert_frames_match


def test_gapfill_matches_oracle(spark, tokens_df, tokens_pdf):
    tiers = rollup_cascade(tokens_df)
    got = gapfill_linear(tiers["1m"], "1m").toPandas()
    exp = gapfill_oracle(rollup_oracle(tokens_pdf, "1m"), "1m")
    assert got["is_interpolated"].any(), "datagen gaps should produce interpolated buckets"
    assert_frames_match(
        got,
        exp,
        sort_cols=["source", "bucket_ts"],
        float_cols=("count", "n_tok_sum", "n_tok_mean", "n_tok_p95", "token_rate"),
        atol=1e-9,
    )


def test_gapfill_no_extrapolation(spark, tokens_df):
    tiers = rollup_cascade(tokens_df)
    gf = gapfill_linear(tiers["1m"], "1m").toPandas()
    # boundaries are real rows; every interpolated row has finite values
    for src, g in gf.groupby("source"):
        g = g.sort_values("bucket_ts")
        assert not g.iloc[0]["is_interpolated"]
        assert not g.iloc[-1]["is_interpolated"]
    assert gf[["count", "n_tok_mean"]].notna().all().all()
