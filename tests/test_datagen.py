import numpy as np

from numalogic_spark.datagen import TokenGenSpec, gen_tokens_pandas, gen_tokens_spark


def test_deterministic_and_invariant():
    a = gen_tokens_pandas(5_000, n_sources=10)
    b = gen_tokens_pandas(5_000, n_sources=10)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    # invariant: n_tok == len(tokens)
    assert (a["tokens"].map(len).to_numpy() == a["n_tok"].to_numpy()).all()
    assert a["n_tok"].min() >= 16 and a["n_tok"].max() < 2048
    assert int(a["tokens"].iloc[0].max()) < 50257


def test_hot_source_skew():
    a = gen_tokens_pandas(20_000, n_sources=20)
    share = (a["source"] == "src_000").mean()
    assert 0.25 < share < 0.35  # ~30% hot source


def test_gaps_exist():
    a = gen_tokens_pandas(20_000, n_sources=10)
    g = a[a["source"] == "src_000"].sort_values("event_ts")
    spec = TokenGenSpec(10)
    step = spec.step_s[0]
    deltas = g["event_ts"].diff().dropna().dt.total_seconds().to_numpy()
    assert (deltas > step).any()  # gaps were injected
    assert (deltas % step == 0).all()  # on the source's grid


def test_spark_matches_pandas(spark):
    pdf = gen_tokens_pandas(3_000, n_sources=8)
    sdf = gen_tokens_spark(spark, 3_000, n_sources=8, partitions=5).toPandas()
    pdf = pdf.sort_values("doc_id", ignore_index=True)
    sdf = sdf.sort_values("doc_id", ignore_index=True)
    assert pdf["doc_id"].tolist() == sdf["doc_id"].tolist()
    assert pdf["n_tok"].tolist() == sdf["n_tok"].tolist()
    assert (pdf["event_ts"] == sdf["event_ts"]).all()
    for x, y in zip(pdf["tokens"].iloc[:50], sdf["tokens"].iloc[:50]):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
