import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from numalogic_spark.functions.transforms import seeded_gaussian_noise
from numalogic_spark.operators.rollup import RollupConfig, rollup_cascade_multi
from numalogic_spark.oracle import rollup_oracle


def test_multi_metric_cascade_matches_oracle(spark, tokens_pdf):
    pdf = tokens_pdf.copy()
    pdf["m_a"] = pdf["n_tok"].astype(float)
    pdf["m_b"] = (pdf["n_tok"] % 97).astype(float)
    df = spark.createDataFrame(pdf[["source", "event_ts", "m_a", "m_b"]])
    tiers = rollup_cascade_multi(
        df, ["m_a", "m_b"], RollupConfig(integral_values=False)
    )
    got = tiers["1h"].toPandas()
    for metric in ("m_a", "m_b"):
        g = got[got["metric"] == metric].drop(columns="metric")
        exp = rollup_oracle(pdf.rename(columns={metric: "v"}), "1h", value_col="v")
        g = g.sort_values(["source", "bucket_ts"], ignore_index=True)
        exp = exp.sort_values(["source", "bucket_ts"], ignore_index=True)
        assert len(g) == len(exp)
        np.testing.assert_array_equal(g["count"].to_numpy(), exp["count"].to_numpy())
        np.testing.assert_allclose(g["n_tok_sum"], exp["n_tok_sum"], rtol=1e-12)
        np.testing.assert_allclose(g["n_tok_p95"], exp["n_tok_p95"], rtol=1e-9)


def test_seeded_noise_deterministic_any_partitioning(spark):
    pdf = pd.DataFrame({"id": [f"d{i}" for i in range(500)], "x": np.zeros(500)})
    df1 = spark.createDataFrame(pdf).repartition(3)
    df2 = spark.createDataFrame(pdf).repartition(11)
    a = df1.select("id", seeded_gaussian_noise("x", "id", scale=1.0).alias("y")).orderBy("id").toPandas()
    b = df2.select("id", seeded_gaussian_noise("x", "id", scale=1.0).alias("y")).orderBy("id").toPandas()
    np.testing.assert_array_equal(a["y"].to_numpy(), b["y"].to_numpy())  # shuffle-invariant
    # positive_only → |noise| ≥ 0 added to zeros
    assert (a["y"] >= 0).all()
    # roughly half-normal with scale 1: mean ≈ 0.798
    assert 0.7 < a["y"].mean() < 0.9
    # different seeds decorrelate
    c = df1.select(seeded_gaussian_noise("x", "id", scale=1.0, seed=7).alias("y")).toPandas()
    assert not np.allclose(np.sort(a["y"]), np.sort(c["y"]))
