"""Deterministic sampling + mixture planning: reproducibility, rate
accuracy, python-oracle parity of the hash, and budget math."""

import numpy as np
import pytest

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


def test_dsir_importance_direction(spark):
    """Docs made of target-only words score positive; anti-target docs
    negative; the empty doc scores 0 with 0 tokens."""
    import pandas as pd
    from pyspark.sql import functions as F

    from numalogic_spark.operators.sampling import dsir_importance

    rows = []
    # target corpus says "alpha beta", the rest says "gamma delta"
    for i in range(40):
        rows.append((i, "alpha beta alpha beta", "en"))
    for i in range(40, 80):
        rows.append((i, "gamma delta gamma delta", "de"))
    rows.append((80, "alpha alpha alpha", "de"))   # target-like outlier
    rows.append((81, "gamma gamma gamma", "en"))   # anti-target outlier
    rows.append((82, "", "en"))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    out = (
        dsir_importance(spark.createDataFrame(pdf), F.col("lang") == "en")
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[80, "log_weight"] > 0       # target-like text
    assert out.loc[81, "log_weight"] < 0       # anti-target text
    assert out.loc[0, "log_weight"] > out.loc[40, "log_weight"]
    assert out.loc[82, "n_tokens"] == 0 and out.loc[82, "log_weight"] == 0.0
    assert len(out) == 83


def test_dsir_matches_numpy_model(spark):
    """Log-weights equal the brute-force smoothed unigram ratio (with the
    engine's 6dp per-word quantization)."""
    import numpy as np
    import pandas as pd
    from collections import Counter
    from pyspark.sql import functions as F

    from numalogic_spark.operators.sampling import dsir_importance

    rng = np.random.default_rng(41)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(60):
        is_t = i % 3 == 0
        probs = np.ones(30)
        probs[:10] += 3.0 if is_t else 0.0   # target skews to first 10 words
        probs /= probs.sum()
        text = " ".join(rng.choice(vocab, size=25, p=probs))
        rows.append((i, text, "en" if is_t else "de"))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    out = (
        dsir_importance(spark.createDataFrame(pdf), F.col("lang") == "en")
        .toPandas()
        .set_index("doc_id")
    )

    raw = Counter()
    tgt = Counter()
    for _, r in pdf.iterrows():
        ws = r["text"].lower().split()
        raw.update(ws)
        if r["lang"] == "en":
            tgt.update(ws)
    V = len(raw)  # < max_vocab, all words in vocab
    t_raw, t_tgt = sum(raw.values()), sum(tgt.values())
    q6 = lambda x: np.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731

    def lr(w):
        a = q6(np.log((tgt[w] + 1.0) / (t_tgt + 1.0 * (V + 1))))
        b = q6(np.log((raw[w] + 1.0) / (t_raw + 1.0 * (V + 1))))
        return a - b

    for i in (0, 1, 30, 59):
        ws = pdf.loc[i, "text"].lower().split()
        exp = round(sum(lr(w) for w in ws), 6)
        assert out.loc[i, "log_weight"] == pytest.approx(exp, abs=2e-6)


def test_quantile_transform_properties(spark):
    import pandas as pd
    from numalogic_spark.operators.sampling import quantile_transform

    rng = np.random.default_rng(19)
    pdf = pd.DataFrame(
        {
            "source": np.repeat(["a", "b"], 50),
            "doc_id": range(100),
            # source b has a shifted scale — calibration must erase it
            # (distinct values per group: ties would legitimately give
            # the two groups different rank multisets)
            "score": np.concatenate(
                [rng.permutation(np.linspace(0, 1, 50)),
                 rng.permutation(np.linspace(10, 11, 50))]
            ),
        }
    )
    out = (
        quantile_transform(spark.createDataFrame(pdf), "score", ("source",))
        .toPandas()
    )
    for s, grp in out.groupby("source"):
        g = grp.sort_values("score")
        # endpoints exact, monotone in score, uniform coverage
        assert g["q_unit"].iloc[0] == 0.0
        assert g["q_unit"].iloc[-1] == 1.0
        assert (np.diff(g["q_unit"].to_numpy()) >= 0).all()
    # the two sources' calibrated distributions coincide despite scales
    qa = np.sort(out[out["source"] == "a"]["q_unit"].to_numpy())
    qb = np.sort(out[out["source"] == "b"]["q_unit"].to_numpy())
    assert np.allclose(qa, qb)


def test_quantile_transform_ties_share_rank(spark):
    import pandas as pd
    from numalogic_spark.operators.sampling import quantile_transform

    pdf = pd.DataFrame(
        {"source": ["a"] * 5, "doc_id": range(5), "score": [1.0, 2.0, 2.0, 2.0, 3.0]}
    )
    out = (
        quantile_transform(spark.createDataFrame(pdf), "score", ("source",))
        .toPandas()
        .sort_values("doc_id")
    )
    assert out["q_unit"].tolist() == [0.0, 0.25, 0.25, 0.25, 1.0]
