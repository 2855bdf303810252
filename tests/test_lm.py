"""Bigram-LM perplexity vs an independent python/numpy oracle that
re-implements the semantics from the docstring (top-V vocab with
deterministic ties, <unk> mapping, add-one smoothing, sorted-fold sum)."""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from numalogic_spark.operators.lm import UNK, bigram_perplexity

DOCS = [
    ("d0", "the cat sat on the mat"),
    ("d1", "the dog sat on the log"),
    ("d2", "spam spam spam spam spam spam spam spam"),
    ("d3", "the cat and the dog and the mat"),
    ("d4", "zyx wvu tsr qpo nml"),  # all rare → all <unk>
    ("d5", "single"),
    ("d6", ""),
    ("d7", "The CAT sat ON the mat"),  # case folding
]


def _ppl_oracle(rows, vocab_size):
    words = {d: t.lower().split() for d, t in rows}
    wc = Counter(w for ws in words.values() for w in ws)
    vocab = set(
        w for w, _ in sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    )
    v_sm = len(vocab) + 1

    def m(w):
        return w if w in vocab else UNK

    c12 = Counter()
    for ws in words.values():
        for a, b in zip(ws, ws[1:]):
            c12[(m(a), m(b))] += 1
    c1 = Counter()
    for (a, _b), c in c12.items():
        c1[a] += c
    out = {}
    for d, ws in words.items():
        k = Counter((m(a), m(b)) for a, b in zip(ws, ws[1:]))
        mtot = sum(k.values())
        if mtot == 0:
            out[d] = (0.0, 0)
            continue
        terms = sorted(
            cnt * (math.log(c12[bg] + 1.0) - math.log(c1[bg[0]] + float(v_sm)))
            for bg, cnt in k.items()
        )
        s = 0.0
        for t in terms:
            s += t
        out[d] = (math.exp(-s / mtot), mtot)
    return out


@pytest.mark.parametrize("vocab_size", [4, 8, 50000])
def test_matches_python_oracle(spark, vocab_size):
    df = spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    got = {
        r["doc_id"]: (r["ppl"], r["n_bigrams"])
        for r in bigram_perplexity(df, vocab_size=vocab_size).collect()
    }
    want = _ppl_oracle(DOCS, vocab_size)
    assert set(got) == set(want)
    for d in want:
        assert got[d][1] == want[d][1], d
        np.testing.assert_allclose(got[d][0], want[d][0], rtol=1e-12, err_msg=d)


def test_properties(spark):
    df = spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    got = {r["doc_id"]: r for r in bigram_perplexity(df, vocab_size=6).collect()}
    # degenerate docs: <2 words → ppl 0, no bigrams
    for d in ("d5", "d6"):
        assert got[d]["ppl"] == 0.0 and got[d]["n_bigrams"] == 0
    # pure repetition is maximally predictable → lowest nonzero perplexity
    nonzero = {d: r["ppl"] for d, r in got.items() if r["n_bigrams"] > 0}
    assert min(nonzero, key=nonzero.get) == "d2"
    # case folding: d7 ≡ d0
    assert got["d7"]["ppl"] == got["d0"]["ppl"]
    # all-OOV doc still scores (through the <unk> state)
    assert got["d4"]["ppl"] > 0.0
    # shuffle-join path produces identical numbers
    noncast = {
        r["doc_id"]: r["ppl"]
        for r in bigram_perplexity(df, vocab_size=6, broadcast_model=False).collect()
    }
    for d in got:
        assert noncast[d] == got[d]["ppl"], d


def test_perplexity_buckets(spark):
    from numalogic_spark.operators.lm import perplexity_buckets

    df = spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    out = perplexity_buckets(bigram_perplexity(df, vocab_size=6)).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
    # 8 docs -> 3/3/2 equal-count split, lowest ppl first
    assert [len(by_bucket[b]) for b in ("head", "middle", "tail")] == [3, 3, 2]
    assert max(r["ppl"] for r in by_bucket["head"]) <= min(
        r["ppl"] for r in by_bucket["middle"]
    )
    assert max(r["ppl"] for r in by_bucket["middle"]) <= min(
        r["ppl"] for r in by_bucket["tail"]
    )


def test_vocab_size_validation(spark):
    df = spark.createDataFrame(pd.DataFrame(DOCS[:2], columns=["doc_id", "text"]))
    with pytest.raises(ValueError, match="vocab_size"):
        bigram_perplexity(df, vocab_size=0)
    with pytest.raises(ValueError, match="vocab_size"):
        bigram_perplexity(df, vocab_size=100_000)


def test_pmi_collocations_bruteforce(spark):
    """PMI values and ranking match a pure-python computation over the
    same bigram-position counts (marginals of the unfiltered joint)."""
    import math
    from collections import Counter

    import pandas as pd

    from numalogic_spark.operators.lm import pmi_collocations

    texts = [
        "new york is a big city",
        "new york has new parks",
        "big city big dreams in new york",
        "the city of new york",
        "york new is not a phrase anyone says",
        "a b a b a b a b a b",
    ] * 3
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = (
        pmi_collocations(spark.createDataFrame(pdf), min_count=3, top_k=25)
        .toPandas()
        .sort_values("rnk", ignore_index=True)
    )

    joint, ca, cb = Counter(), Counter(), Counter()
    for t in texts:
        ws = t.lower().split()
        for x, y in zip(ws, ws[1:]):
            joint[(x, y)] += 1
            ca[x] += 1
            cb[y] += 1
    n = sum(joint.values())
    exp = []
    for (x, y), c in joint.items():
        if c >= 3:
            pmi = math.floor(math.log(n * c / (ca[x] * cb[y])) * 1e6 + 0.5) / 1e6
            exp.append((x, y, c, pmi))
    exp.sort(key=lambda r: (-r[3], r[0], r[1]))
    exp = exp[:25]
    assert len(got) == len(exp)
    for i, (x, y, c, pmi) in enumerate(exp):
        assert got.loc[i, "a"] == x and got.loc[i, "b"] == y
        assert got.loc[i, "c_ab"] == c
        assert got.loc[i, "pmi"] == pytest.approx(pmi, abs=2e-6)
    # "new york" is a real collocation in this corpus: positive PMI
    ny = got[(got["a"] == "new") & (got["b"] == "york")]
    assert len(ny) == 1 and ny["pmi"].iloc[0] > 0
