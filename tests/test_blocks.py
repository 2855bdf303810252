"""BlockPipeline analog parity (reference blocks/pipeline.py:23-174):
chained fit/run, blockname__param routing, stateful artifact round-trip
through the JSON registry."""

import numpy as np
import pandas as pd
import pytest

from numalogic_spark.blocks import (
    BlockPipeline,
    JsonBlockRegistry,
    SparkBlock,
    TransformBlock,
)
from numalogic_spark.config import StageConf


@pytest.fixture(scope="module")
def df(spark):
    rng = np.random.default_rng(11)
    return spark.createDataFrame(
        pd.DataFrame(
            {"i": range(200), "source": "s", "x": rng.random(200) * 8 + 2}
        )
    )


def test_fit_chains_and_matches_manual(spark, df):
    """log transform -> StandardScaler fit on the transformed column ==
    hand-computed chain; fit output == run output on the same frame."""
    pipe = BlockPipeline(
        TransformBlock([StageConf("LogTransformer", {"add_factor": 1.0})], ["x"],
                       name="log"),
        SparkBlock("StandardScaler", ["x"], name="std"),
    )
    fitted = pipe.fit(df).orderBy("i").toPandas()
    x = df.orderBy("i").toPandas()["x"].to_numpy()
    lx = np.log(x + 1.0)
    exp = (lx - lx.mean()) / lx.std()
    np.testing.assert_allclose(fitted["x__scaled"], exp, rtol=1e-9)
    rerun = pipe.run(df).orderBy("i").toPandas()
    np.testing.assert_array_equal(fitted["x__scaled"], rerun["x__scaled"])


def test_block_params_routing(spark, df):
    pipe = BlockPipeline(SparkBlock("StdDevThreshold", ["x"], name="thr"))
    out = pipe.fit(df, thr__std_factor=2.0).orderBy("i").toPandas()
    x = df.orderBy("i").toPandas()["x"].to_numpy()
    thr = x.mean() + 2.0 * x.std()
    np.testing.assert_allclose(out["x__score"], x / thr, rtol=1e-9)
    with pytest.raises(ValueError, match="blockname__parameter"):
        pipe.fit(df, std_factor=2.0)
    with pytest.raises(ValueError, match="unknown estimator"):
        SparkBlock("NopeScaler", ["x"])
    with pytest.raises(ValueError, match="not fitted"):
        SparkBlock("StandardScaler", ["x"]).run(df)


def test_registry_roundtrip(spark, df, tmp_path):
    """save() serializes every stateful block's stats; a FRESH pipeline
    load()s them and scores identically without refitting."""
    reg = JsonBlockRegistry(spark, f"file://{tmp_path}/registry")
    pipe = BlockPipeline(
        SparkBlock("MinMaxScaler", ["x"], name="mm"),
        registry=reg,
    )
    fitted = pipe.fit(df).orderBy("i").toPandas()
    path = pipe.save(["events", "v1"], ["mm"])
    assert "events__v1__mm-" in path and path.endswith(".json")
    # distinct (skeys, dkeys) STRUCTURES never collide (flattening alone
    # would map (['events','v1'],['mm']) and (['events'],['v1','mm']) to
    # one file)
    assert reg._path(["events", "v1"], ["mm"]) != reg._path(["events"], ["v1", "mm"])

    fresh = BlockPipeline(
        SparkBlock("MinMaxScaler", ["x"], name="mm"), registry=reg
    )
    fresh.load(["events", "v1"], ["mm"])
    scored = fresh.run(df).orderBy("i").toPandas()
    np.testing.assert_array_equal(fitted["x__scaled"], scored["x__scaled"])
    # stateless blocks are excluded from the artifact
    pipe2 = BlockPipeline(
        TransformBlock([StageConf("TanhNorm")], ["x"], name="t"),
        SparkBlock("MaxAbsScaler", ["x"], name="ma"),
        registry=reg,
    )
    pipe2.fit(df)
    pipe2.save(["events", "v1"], ["ma"])
    arts = reg.load(["events", "v1"], ["ma"])
    assert set(arts) == {"ma"}
    with pytest.raises(ValueError, match="No registry"):
        BlockPipeline(SparkBlock("MaxAbsScaler", ["x"])).save(["a"], ["b"])


def test_sequence_protocol(spark, df):
    b1 = TransformBlock([StageConf("TanhNorm")], ["x"], name="t")
    b2 = SparkBlock("MaxAbsScaler", ["x"], name="ma")
    pipe = BlockPipeline(b1, b2)
    assert len(pipe) == 2
    assert pipe[0] is b1
    assert [n for n, _ in pipe.named_blocks()] == ["t", "ma"]
    assert list(iter(pipe)) == [b1, b2]


def test_per_group_fitted_block_roundtrip(spark, tmp_path):
    """Per-series fit state (by=source) survives the registry round-trip
    with group alignment intact."""
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {
            "i": range(120),
            "source": ["p"] * 60 + ["q"] * 60,
            "x": np.concatenate([rng.random(60) * 2, rng.random(60) * 90 + 5]),
        }
    )
    df = spark.createDataFrame(pdf)
    reg = JsonBlockRegistry(spark, f"file://{tmp_path}/reg2")
    pipe = BlockPipeline(
        SparkBlock("StandardScaler", ["x"], name="std", by=["source"]),
        registry=reg,
    )
    fitted = pipe.fit(df).orderBy("i").toPandas()
    pipe.save(["grp"], ["std"])
    fresh = BlockPipeline(
        SparkBlock("StandardScaler", ["x"], name="std", by=["source"]),
        registry=reg,
    )
    fresh.load(["grp"], ["std"])
    scored = fresh.run(df).orderBy("i").toPandas()
    np.testing.assert_array_equal(fitted["x__scaled"], scored["x__scaled"])
    for g in ("p", "q"):
        v = pdf[pdf["source"] == g]["x"].to_numpy()
        exp = (v - v.mean()) / v.std()
        np.testing.assert_allclose(
            scored[scored["source"] == g]["x__scaled"], exp, rtol=1e-9
        )


def test_block_guards_and_tx_param_routing(spark, df):
    """Review fixes: duplicate block names rejected; fit params addressed
    to unknown blocks raise ValueError; transform-time estimator params
    (TanhScaler coeff) reach the transform function."""
    with pytest.raises(ValueError, match="duplicate block names"):
        BlockPipeline(SparkBlock("StandardScaler", ["x"]),
                      SparkBlock("StandardScaler", ["x"]))
    pipe = BlockPipeline(SparkBlock("StandardScaler", ["x"], name="std"))
    with pytest.raises(ValueError, match="unknown block"):
        pipe.fit(df, nn__max_epochs=50)

    tanh = BlockPipeline(
        SparkBlock("TanhScaler", ["x"], name="t", conf={"coeff": 0.3})
    )
    got = tanh.fit(df).orderBy("i").toPandas()
    x = df.orderBy("i").toPandas()["x"].to_numpy()
    exp = 0.5 * (np.tanh(0.3 * (x - x.mean()) / x.std()) + 1)
    np.testing.assert_allclose(got["x__scaled"], exp, rtol=1e-9)
    with pytest.raises(ValueError, match="unknown estimator param"):
        SparkBlock("TanhScaler", ["x"], conf={"bogus": 1})


def test_fit_params_not_sticky_and_stateless_probe(spark, df):
    """Per-call transform params apply to that fit only; probing a
    stateless block's artifact_state raises the documented ValueError."""
    block = SparkBlock("TanhScaler", ["x"], name="t")
    pipe = BlockPipeline(block)
    with_override = pipe.fit(df, t__coeff=0.5).orderBy("i").toPandas()
    x = df.orderBy("i").toPandas()["x"].to_numpy()
    exp05 = 0.5 * (np.tanh(0.5 * (x - x.mean()) / x.std()) + 1)
    np.testing.assert_allclose(with_override["x__scaled"], exp05, rtol=1e-9)
    # a later bare run uses the block's configured default (0.2), not 0.5
    rerun = pipe.run(df).orderBy("i").toPandas()
    exp02 = 0.5 * (np.tanh(0.2 * (x - x.mean()) / x.std()) + 1)
    np.testing.assert_allclose(rerun["x__scaled"], exp02, rtol=1e-9)

    t = TransformBlock([StageConf("TanhNorm")], ["x"], name="tn")
    with pytest.raises(ValueError, match="not fitted"):
        _ = t.artifact_state
