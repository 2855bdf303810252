"""Token-payload operators vs numpy oracles: corpus term/doc frequencies
and concat-and-chunk sequence packing (exact layout parity, pack-size
invariants, token-stream equality)."""

import numpy as np
import pandas as pd

from numalogic_spark.operators.tokens import (
    pack_tokens,
    sequence_pack_plan,
    token_frequencies,
)

MAX_TOKENS = 512


def test_token_frequencies_matches_oracle(spark, tokens_df, tokens_pdf):
    got = token_frequencies(tokens_df).toPandas().set_index("token").sort_index()

    from collections import Counter

    tf, dfq = Counter(), Counter()
    for toks in tokens_pdf["tokens"]:
        tf.update(toks)
        dfq.update(set(toks))
    assert got["term_freq"].to_dict() == dict(tf)
    assert got["doc_freq"].to_dict() == dict(dfq)


def test_pack_plan_invariants(spark, tokens_df, tokens_pdf):
    plan = sequence_pack_plan(tokens_df, MAX_TOKENS).toPandas()
    # conservation: every token is placed exactly once
    assert (plan["tok_end"] - plan["tok_start"]).sum() == tokens_pdf["n_tok"].sum()
    # each pack holds exactly MAX_TOKENS except the last pack per source
    sizes = (
        plan.assign(sz=plan["tok_end"] - plan["tok_start"])
        .groupby(["source", "pack_id"])["sz"]
        .sum()
        .reset_index()
    )
    last = sizes.groupby("source")["pack_id"].max().to_dict()
    for _, r in sizes.iterrows():
        if r["pack_id"] < last[r["source"]]:
            assert r["sz"] == MAX_TOKENS, r
        else:
            assert 0 < r["sz"] <= MAX_TOKENS
    # slices are doc-local and within bounds
    n_tok = tokens_pdf.set_index("doc_id")["n_tok"]
    assert (plan["tok_start"] >= 0).all()
    assert (plan["tok_end"].to_numpy() <= n_tok.loc[plan["doc_id"]].to_numpy()).all()


def test_pack_tokens_exact_stream(spark, tokens_df, tokens_pdf):
    """Concatenating each source's packs in pack order must reproduce the
    source's documents concatenated in doc_id order, token for token."""
    packs = pack_tokens(tokens_df, MAX_TOKENS).toPandas()
    for source, g in packs.groupby("source"):
        g = g.sort_values("pack_id")
        got = np.concatenate([np.asarray(t) for t in g["tokens"]])
        docs = tokens_pdf[tokens_pdf["source"] == source].sort_values("doc_id")
        exp = np.concatenate([np.asarray(t) for t in docs["tokens"]])
        np.testing.assert_array_equal(got, exp)
    # all packs full except the last per source
    full = packs.sort_values(["source", "pack_id"]).groupby("source")["n_tok"].apply(
        lambda s: (s.iloc[:-1] == MAX_TOKENS).all() and 0 < s.iloc[-1] <= MAX_TOKENS
    )
    assert full.all()


def test_tf_idf_topk_matches_oracle(spark, tokens_df, tokens_pdf):
    import math
    from collections import Counter

    from numalogic_spark.operators.tokens import tf_idf_topk

    got = tf_idf_topk(tokens_df, top_k=3).toPandas()
    n = len(tokens_pdf)
    dfq = Counter()
    for toks in tokens_pdf["tokens"]:
        dfq.update(set(toks))
    for doc_id, g in got.groupby("doc_id"):
        toks = tokens_pdf.set_index("doc_id").loc[doc_id, "tokens"]
        tf = Counter(toks)
        exp = sorted(
            ((t, c, c * (math.log((n + 1) / (dfq[t] + 1)) + 1)) for t, c in tf.items()),
            key=lambda x: (-x[2], x[0]),
        )[:3]
        rows = g.sort_values("rank")
        assert list(rows["token"]) == [t for t, _, _ in exp]
        np.testing.assert_allclose(rows["score"].to_numpy(), [s for _, _, s in exp], rtol=1e-12)


def test_pack_plan_tied_order_keys(spark):
    """Tied order keys (e.g. equal timestamps) must still yield strictly
    increasing offsets — a RANGE running frame would hand ties the same
    offset and silently drop token spans."""
    import pandas as pd

    from numalogic_spark.operators.tokens import sequence_pack_plan

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": ["a", "b", "c"],
                "source": "s",
                "ts": [1, 1, 1],  # all tied
                "n_tok": [300, 300, 300],
            }
        )
    )
    plan = sequence_pack_plan(df, 512, order_cols=["ts", "doc_id"]).toPandas()
    assert sorted(plan["offset"].unique()) == [0, 300, 600]
    assert (plan["tok_end"] - plan["tok_start"]).sum() == 900


def test_pack_greedy_no_split_invariants(spark):
    """No-split packing: docs whole, greedy fill per source — per-pack sums
    bounded, mass conserved, greedy property exact vs a python reference."""
    import numpy as np
    import pandas as pd

    from numalogic_spark.operators.tokens import pack_greedy_no_split

    rng = np.random.default_rng(4)
    rows = []
    for s in range(3):
        for i in range(40):
            n = int(rng.integers(1, 90))
            if i % 17 == 0:
                n = 300  # oversized: must land alone in its own pack
            rows.append({"source": f"s{s}", "doc_id": s * 1000 + i, "n_tok": n})
    rows.append({"source": "s0", "doc_id": 99999, "n_tok": 0})  # dropped
    pdf = pd.DataFrame(rows)
    df = spark.createDataFrame(pdf)
    cap = 128
    got = pack_greedy_no_split(df, cap).toPandas()

    # python reference
    exp_rows = []
    for s, g in pdf[pdf["n_tok"] > 0].groupby("source"):
        g = g.sort_values("doc_id")
        pack, off = 0, 0
        for r in g.itertuples():
            if off > 0 and off + r.n_tok > cap:
                pack, off = pack + 1, 0
            exp_rows.append((s, pack, r.doc_id, off, r.n_tok))
            off += r.n_tok
    exp = pd.DataFrame(exp_rows, columns=["source", "pack_id", "doc_id", "pack_offset", "n_tok"])
    key = ["source", "doc_id"]
    got_s = got.sort_values(key, ignore_index=True)
    exp_s = exp.sort_values(key, ignore_index=True)
    pd.testing.assert_frame_equal(got_s, exp_s, check_dtype=False)

    # invariants: mass conserved; packs ≤ cap unless a singleton oversize
    assert got["n_tok"].sum() == pdf[pdf["n_tok"] > 0]["n_tok"].sum()
    per_pack = got.groupby(["source", "pack_id"]).agg(tot=("n_tok", "sum"), cnt=("n_tok", "size"))
    over = per_pack[per_pack["tot"] > cap]
    assert (over["cnt"] == 1).all()  # only oversized singletons exceed cap
