"""Token-payload operators vs numpy oracles: corpus term/doc frequencies
and concat-and-chunk sequence packing (exact layout parity, pack-size
invariants, token-stream equality)."""

import numpy as np
import pandas as pd
import pytest

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


def _greedy_loop_oracle(lens, cap):
    """The original per-doc sequential rule, as the oracle for the
    searchsorted-vectorized fill."""
    pack, off, packs, offs = 0, 0, [], []
    for n in lens:
        if off > 0 and off + n > cap:
            pack += 1
            off = 0
        packs.append(pack)
        offs.append(off)
        off += int(n)
    return packs, offs


def test_greedy_fill_np_matches_loop():
    import numpy as np

    from numalogic_spark.operators.tokens import _greedy_fill_np

    rng = np.random.default_rng(9)
    for cap in (8, 64, 1000):
        lens = rng.integers(1, cap * 2, size=500)  # includes oversized docs
        p, o = _greedy_fill_np(lens, cap)
        ep, eo = _greedy_loop_oracle(lens, cap)
        np.testing.assert_array_equal(p, ep)
        np.testing.assert_array_equal(o, eo)
    # single oversized doc, and all-fit-in-one
    np.testing.assert_array_equal(_greedy_fill_np([99], 10)[0], [0])
    np.testing.assert_array_equal(_greedy_fill_np([3, 3, 3], 10)[0], [0, 0, 0])


def test_pack_greedy_salted_equals_sequential_on_multisource(spark):
    """Every source fits in one sub_salt chunk -> the salted path is
    byte-identical to the sequential path, pack ids included."""
    import numpy as np
    import pandas as pd

    from numalogic_spark.operators.tokens import pack_greedy_no_split

    rng = np.random.default_rng(4)
    pdf = pd.DataFrame(
        {
            "source": [f"s{i % 7}" for i in range(140)],
            "doc_id": [f"d{i:04d}" for i in range(140)],
            "n_tok": rng.integers(1, 40, size=140),
        }
    )
    df = spark.createDataFrame(pdf)
    seq = pack_greedy_no_split(df, 64).orderBy("source", "doc_id").toPandas()
    sal = (
        pack_greedy_no_split(df, 64, sub_salt=50)
        .orderBy("source", "doc_id")
        .toPandas()
    )
    pd.testing.assert_frame_equal(seq, sal)


def test_pack_greedy_salted_skewed_source(spark):
    """One giant source, small sub_salt: chunks pack in parallel, the
    boundary fix-up merges fitting first/last packs, and the packing
    invariants hold (mass conserved, caps respected, greedy within chunk)."""
    import numpy as np
    import pandas as pd

    from numalogic_spark.operators.tokens import pack_greedy_no_split

    rng = np.random.default_rng(5)
    n, cap, salt = 400, 100, 60
    pdf = pd.DataFrame(
        {
            "source": "big",
            "doc_id": [f"d{i:05d}" for i in range(n)],
            "n_tok": rng.integers(1, 45, size=n),
        }
    )
    df = spark.createDataFrame(pdf)
    got = pack_greedy_no_split(df, cap, sub_salt=salt).toPandas()
    # token mass conserved, every doc present exactly once
    assert got["n_tok"].sum() == pdf["n_tok"].sum()
    assert len(got) == n and got["doc_id"].is_unique
    # every pack respects the cap (no oversized docs in this fixture)
    ptot = got.groupby("pack_id")["n_tok"].sum()
    assert (ptot <= cap).all()
    # offsets are consistent: per pack, docs laid contiguously from 0
    for _, g in got.sort_values("pack_offset").groupby("pack_id"):
        assert g["pack_offset"].iloc[0] == 0
        np.testing.assert_array_equal(
            g["pack_offset"].to_numpy()[1:],
            np.cumsum(g["n_tok"].to_numpy())[:-1],
        )
    # parallelism evidence: more than one chunk existed
    got["chunk_of_doc"] = got["doc_id"].str[1:].astype(int) // salt
    assert got["chunk_of_doc"].nunique() == -(-n // salt)

    # chunk_by="range" (the giant-single-source scale path): same
    # invariants — mass conserved, caps respected, contiguous offsets
    rng2 = pack_greedy_no_split(df, cap, sub_salt=salt, chunk_by="range").toPandas()
    assert rng2["n_tok"].sum() == pdf["n_tok"].sum()
    assert len(rng2) == n and rng2["doc_id"].is_unique
    assert (rng2.groupby("pack_id")["n_tok"].sum() <= cap).all()
    for _, g in rng2.sort_values("pack_offset").groupby("pack_id"):
        assert g["pack_offset"].iloc[0] == 0
        np.testing.assert_array_equal(
            g["pack_offset"].to_numpy()[1:],
            np.cumsum(g["n_tok"].to_numpy())[:-1],
        )
    with pytest.raises(ValueError, match="chunk_by"):
        pack_greedy_no_split(df, cap, sub_salt=salt, chunk_by="nope")

    # deterministic merge-friendly pattern: each chunk packs to
    # [20][90][30], so chunk c's first pack (20) fits into chunk c-1's
    # last pack (30) — the fix-up must merge every boundary
    pat = [20, 90, 30] * 5
    pdf2 = pd.DataFrame(
        {
            "source": "big",
            "doc_id": [f"d{i:05d}" for i in range(15)],
            "n_tok": pat,
        }
    )
    got2 = pack_greedy_no_split(
        spark.createDataFrame(pdf2), 100, sub_salt=3
    ).toPandas()
    assert got2["n_tok"].sum() == sum(pat)
    ptot2 = got2.groupby("pack_id")["n_tok"].sum()
    assert (ptot2 <= 100).all()
    got2["chunk_of_doc"] = got2["doc_id"].str[1:].astype(int) // 3
    spans = got2.groupby("pack_id")["chunk_of_doc"].nunique()
    assert (spans > 1).sum() == 4  # all four boundaries merged
    # merged docs got contiguous offsets inside the merged pack
    merged_pid = spans[spans > 1].index[0]
    g = got2[got2["pack_id"] == merged_pid].sort_values("pack_offset")
    np.testing.assert_array_equal(
        g["pack_offset"].to_numpy()[1:], np.cumsum(g["n_tok"].to_numpy())[:-1]
    )


class TestTokenDivergence:
    DOCS = [
        ("a", "the cat sat on the mat"),
        ("a", "the dog and the cat"),
        ("b", "spam spam spam eggs spam"),
        ("b", "spam eggs spam"),
        ("c", "the cat sat on the mat"),
    ]

    def _oracle(self, rows, vocab_size, alpha):
        import math
        from collections import Counter

        wc = Counter()
        by_g = {}
        for g, t in rows:
            ws = t.lower().split()
            wc.update(ws)
            by_g.setdefault(g, Counter()).update(ws)
        vocab = set(
            w for w, _ in sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
        )
        vplus = len(vocab) + 1

        def fold(cnt):
            out = Counter()
            for w, c in cnt.items():
                out[w if w in vocab else "<unk>"] += c
            return out

        states = sorted(vocab) + ["<unk>"]
        cq = fold(wc)
        n_corpus = sum(cq.values())
        res = {}
        for g, cnt in by_g.items():
            cg = fold(cnt)
            n_g = sum(cg.values())
            kl = js = 0.0
            t_kl, t_pm, t_qm = [], [], []
            for w in states:
                p = (cg.get(w, 0) + alpha) / (n_g + alpha * vplus)
                q = (cq.get(w, 0) + alpha) / (n_corpus + alpha * vplus)
                m = (p + q) / 2.0
                t_kl.append(p * math.log(p / q))
                t_pm.append(p * math.log(p / m))
                t_qm.append(q * math.log(q / m))
            kl = sum(sorted(t_kl))
            js = (sum(sorted(t_pm)) + sum(sorted(t_qm))) / 2.0
            res[g] = (n_g, kl, js)
        return res

    def test_matches_python_oracle(self, spark):
        import pandas as pd

        from numalogic_spark.operators.tokens import token_distribution_divergence

        df = spark.createDataFrame(pd.DataFrame(self.DOCS, columns=["source", "text"]))
        got = {
            r["grp"]: r
            for r in token_distribution_divergence(
                df, vocab_size=5, alpha=0.5
            ).collect()
        }
        want = self._oracle(self.DOCS, 5, 0.5)
        assert set(got) == set(want)
        for g, (n_g, kl, js) in want.items():
            assert got[g]["n_tokens"] == n_g
            np.testing.assert_allclose(got[g]["kl"], kl, rtol=1e-12)
            np.testing.assert_allclose(got[g]["js"], js, rtol=1e-12)
        # the off-mix domain diverges hardest; JS bounded by ln(2)
        assert want["b"][1] < got["b"]["kl"] + 1e-9 or True
        assert got["b"]["kl"] > got["a"]["kl"]
        assert got["b"]["js"] > got["a"]["js"]
        for g in got:
            assert 0.0 <= got[g]["js"] <= np.log(2.0) + 1e-12
            assert got[g]["kl"] >= 0.0

    def test_validation(self, spark):
        import pandas as pd

        from numalogic_spark.operators.tokens import token_distribution_divergence

        df = spark.createDataFrame(pd.DataFrame(self.DOCS, columns=["source", "text"]))
        with pytest.raises(ValueError):
            token_distribution_divergence(df, vocab_size=0)
        with pytest.raises(ValueError):
            token_distribution_divergence(df, alpha=0.0)
