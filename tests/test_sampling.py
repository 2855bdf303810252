"""Deterministic sampling + mixture planning: reproducibility, rate
accuracy, python-oracle parity of the hash, and budget math."""

import numpy as np

from numalogic_spark.operators.dedup import MERSENNE31
from numalogic_spark.operators.sampling import (
    _CHAR_MULT,
    _SAMPLE_A,
    _SAMPLE_B,
    deterministic_sample,
    mixture_plan,
    uniform_hash_unit,
)


def _unit_py(doc_id: str, salt: int = 0) -> float:
    acc = salt % MERSENNE31
    for ch in str(doc_id):
        acc = (acc * _CHAR_MULT + ord(ch)) % MERSENNE31
    return ((_SAMPLE_A * acc + _SAMPLE_B) % MERSENNE31) / MERSENNE31


def test_uniform_hash_matches_python_oracle(spark, tokens_df):
    got = (
        tokens_df.select("doc_id", uniform_hash_unit("doc_id").alias("u"))
        .limit(200)
        .toPandas()
    )
    exp = got["doc_id"].map(_unit_py).to_numpy()
    np.testing.assert_allclose(got["u"].to_numpy(), exp, rtol=0, atol=1e-15)


def test_deterministic_sample_reproducible_and_calibrated(spark, tokens_df):
    a = deterministic_sample(tokens_df, 0.3).select("doc_id").toPandas()
    b = deterministic_sample(tokens_df, 0.3).select("doc_id").toPandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])  # bitwise reproducible
    n = tokens_df.count()
    assert abs(len(a) / n - 0.3) < 0.02  # calibrated within 2pp on 20k rows
    # salt decorrelates
    c = deterministic_sample(tokens_df, 0.3, salt=7).select("doc_id").toPandas()
    assert sorted(c["doc_id"]) != sorted(a["doc_id"])


def test_mixture_plan_budget_math(spark, tokens_df):
    sources = [r["source"] for r in tokens_df.select("source").distinct().collect()]
    big, small = sources[0], sources[1]
    totals = {
        r["source"]: r["t"]
        for r in tokens_df.groupBy("source").agg({"n_tok": "sum"}).withColumnRenamed("sum(n_tok)", "t").collect()
    }
    budget = int(totals[big] * 0.5)
    plan = mixture_plan(tokens_df, {big: 3.0, small: 1.0}, budget).toPandas().set_index("source")
    # weights normalized
    assert abs(plan.loc[big, "weight"] - 0.75) < 1e-12
    # rate = min(1, target/available); expected = rate*available
    for s in (big, small):
        t = plan.loc[s, "target_tokens"]
        assert abs(t - plan.loc[s, "weight"] * budget) < 1e-6
        exp_rate = min(1.0, t / totals[s])
        assert abs(plan.loc[s, "rate"] - exp_rate) < 1e-12
        assert abs(plan.loc[s, "expected_tokens"] - exp_rate * totals[s]) < 1e-6
    # applying the plan lands near the budget for non-capped sources
    sampled = deterministic_sample(tokens_df, plan.reset_index()[["source", "rate"]].pipe(spark.createDataFrame))
    got_tokens = {
        r["source"]: r["t"]
        for r in sampled.groupBy("source").agg({"n_tok": "sum"}).withColumnRenamed("sum(n_tok)", "t").collect()
    }
    for s in (big, small):
        if plan.loc[s, "rate"] < 1.0:
            assert abs(got_tokens[s] / plan.loc[s, "expected_tokens"] - 1.0) < 0.1


def test_mixture_plan_absent_source_reports_shortfall(spark, tokens_df):
    """A weighted source with NO data must appear in the plan with
    n_tok_total 0, rate 0 and its full target as shortfall — not vanish."""
    present = tokens_df.select("source").distinct().collect()[0]["source"]
    plan = (
        mixture_plan(tokens_df.filter(f"source = '{present}'"),
                     {present: 1.0, "ghost_source": 1.0}, 1000)
        .toPandas()
        .set_index("source")
    )
    g = plan.loc["ghost_source"]
    assert g["n_tok_total"] == 0 and g["rate"] == 0.0
    assert abs(g["shortfall"] - 500.0) < 1e-9  # full half-budget target
    assert abs(g["expected_tokens"]) < 1e-9


def test_training_order_deterministic_shuffle(spark, tokens_df):
    from numalogic_spark.operators.sampling import training_order

    small = tokens_df.limit(2000).select("doc_id", "source")
    a = training_order(small, 4, ["doc_id"]).toPandas().sort_values("doc_id", ignore_index=True)
    b = training_order(small, 4, ["doc_id"]).toPandas().sort_values("doc_id", ignore_index=True)
    assert a.equals(b)  # reproducible across runs
    # every row lands in exactly one shard; ords are 0..n_s-1 per shard
    assert len(a) == 2000
    for s, g in a.groupby("shard"):
        assert sorted(g["ord"]) == list(range(len(g)))
    # shards are balanced-ish (hash uniformity)
    sizes = a.groupby("shard").size()
    assert len(sizes) == 4 and sizes.min() > 2000 / 4 * 0.8
    # a different salt produces a different permutation
    c = training_order(small, 4, ["doc_id"], salt=9).toPandas().sort_values("doc_id", ignore_index=True)
    assert not c[["shard", "ord"]].equals(a[["shard", "ord"]])
    # the order is independent of input partitioning
    d = (
        training_order(small.repartition(13), 4, ["doc_id"])
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert d.equals(a)


def test_curriculum_order(spark):
    """Quality-curriculum ordering: quartile tiers by score (tier 1 =
    best), balanced ntile sizes, reproducible within-tier shuffle that is
    layout-independent and salt-sensitive."""
    import numpy as np
    import pandas as pd

    from numalogic_spark.operators.sampling import curriculum_order

    rng = np.random.default_rng(12)
    pdf = pd.DataFrame(
        {
            "doc_id": [f"d{i:03d}" for i in range(80)],
            "score": rng.uniform(size=80).round(6),
        }
    )
    df = spark.createDataFrame(pdf)
    got = curriculum_order(df, "score", n_tiers=4).toPandas()
    # balanced quartiles
    assert sorted(got.groupby("tier").size().tolist()) == [20, 20, 20, 20]
    # tier 1 holds the best scores: min(tier1) >= max(tier2)
    t = got.groupby("tier")["score"]
    assert t.min()[1] >= t.max()[2] >= 0
    # ord is a dense 0..n-1 permutation inside each tier
    for _, g in got.groupby("tier"):
        assert sorted(g["ord"]) == list(range(len(g)))
    # layout-independent: a repartitioned input gives identical output
    got2 = curriculum_order(df.repartition(7), "score", n_tiers=4).toPandas()
    k = ["doc_id"]
    pd.testing.assert_frame_equal(
        got.sort_values(k, ignore_index=True)[["doc_id", "tier", "ord"]],
        got2.sort_values(k, ignore_index=True)[["doc_id", "tier", "ord"]],
    )
    # a different salt permutes within tiers but keeps tier membership
    got3 = curriculum_order(df, "score", n_tiers=4, salt=9).toPandas()
    m = got.merge(got3, on="doc_id", suffixes=("", "_s"))
    assert (m["tier"] == m["tier_s"]).all()
    assert (m["ord"] != m["ord_s"]).any()
