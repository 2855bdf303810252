"""Naive Bayes classifier: exact parity with a pure-python reference of the
same quantized math, held-out accuracy on separable corpora, OOV and
zero-word handling."""

import math

import pandas as pd
import pytest

from numalogic_spark.operators.classify import nb_score, nb_train

TRAIN = [
    ("t0", "sports", "the team won the match with a late goal in the game"),
    ("t1", "sports", "the coach praised the players after the match and the season"),
    ("t2", "sports", "a fast striker scored twice and the team won again"),
    ("t3", "tech", "the compiler optimizes the query plan before execution begins"),
    ("t4", "tech", "distributed executors shuffle partitions across the cluster network"),
    ("t5", "tech", "the profiler showed the query spent time in the shuffle stage"),
    ("t6", "food", "simmer the sauce with garlic basil and olive oil slowly"),
    ("t7", "food", "knead the dough rest it then bake the bread until golden"),
]
TEST = [
    ("x0", "sports", "the players won the final match of the season"),
    ("x1", "tech", "the cluster executes the plan with distributed partitions"),
    ("x2", "food", "bake the bread with olive oil and garlic"),
    ("x3", None, ""),  # zero-word: prior-only argmax
]


def _py_nb(train_rows, test_rows, max_vocab=1000, alpha=1.0):
    """Independent reference of the exact quantized pipeline."""
    q6 = lambda x: math.floor(x * 1_000_000 + 0.5) / 1_000_000

    tok = [(lab, w) for _, lab, t in train_rows for w in t.lower().split()]
    wc: dict[str, int] = {}
    for _, w in tok:
        wc[w] = wc.get(w, 0) + 1
    vocab = [w for w, _ in sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:max_vocab]]
    vset = set(vocab)
    labels = sorted({lab for _, lab, _ in train_rows})
    totals = {l: 0 for l in labels}
    wl: dict[tuple[str, str], int] = {}
    for lab, w in tok:
        if w in vset:
            totals[lab] += 1
            wl[(w, lab)] = wl.get((w, lab), 0) + 1
    V = len(vocab)
    n_docs = len(train_rows)
    n_lab = {l: sum(1 for _, lab, _ in train_rows if lab == l) for l in labels}
    pri = {l: q6(math.log(n_lab[l] / float(n_docs))) for l in labels}
    unk = {l: q6(math.log(alpha / (totals[l] + alpha * (V + 1)))) for l in labels}
    lp = {
        (w, l): q6(math.log((wl.get((w, l), 0) + alpha) / (totals[l] + alpha * (V + 1))))
        for w in vocab
        for l in labels
    }
    out = {}
    for doc_id, _, text in test_rows:
        best = None
        for l in labels:
            # decimal(,6) sums == exact integer-micro arithmetic
            s = round(pri[l] * 1e6)
            for w in text.lower().split():
                s += round(lp.get((w, l), unk[l]) * 1e6)
            score = s / 1e6
            if best is None or score > best[1] or (score == best[1] and l < best[0]):
                best = (l, score)
        out[doc_id] = best
    return out


def test_nb_matches_python_reference_exactly(spark):
    tr = spark.createDataFrame(
        pd.DataFrame(TRAIN, columns=["doc_id", "label", "text"])
    )
    te = spark.createDataFrame(
        pd.DataFrame(TEST, columns=["doc_id", "label", "text"]),
        "doc_id string, label string, text string",
    )
    priors, lik = nb_train(tr, max_vocab=1000)
    got = {
        r["doc_id"]: (r["pred"], r["score"])
        for r in nb_score(te, priors, lik).collect()
    }
    exp = _py_nb(TRAIN, TEST)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0], (k, got[k], exp[k])
        assert got[k][1] == pytest.approx(exp[k][1], abs=0), (k, got[k], exp[k])


def test_nb_held_out_accuracy(spark):
    tr = spark.createDataFrame(pd.DataFrame(TRAIN, columns=["doc_id", "label", "text"]))
    te = spark.createDataFrame(
        pd.DataFrame(TEST[:3], columns=["doc_id", "label", "text"])
    )
    priors, lik = nb_train(tr)
    got = nb_score(te, priors, lik).toPandas().set_index("doc_id")["pred"]
    assert got["x0"] == "sports" and got["x1"] == "tech" and got["x2"] == "food"


def test_nb_vocab_cap_and_oov(spark):
    """max_vocab=3 keeps only the 3 hottest words; everything else scores
    through the OOV mass and the pipeline still runs end to end."""
    tr = spark.createDataFrame(pd.DataFrame(TRAIN, columns=["doc_id", "label", "text"]))
    te = spark.createDataFrame(pd.DataFrame(TEST, columns=["doc_id", "label", "text"]),
                               "doc_id string, label string, text string")
    priors, lik = nb_train(tr, max_vocab=3)
    assert lik.select("word").distinct().count() == 3
    got = nb_score(te, priors, lik).toPandas()
    assert len(got) == len(TEST)  # zero-word doc included
    exp = _py_nb(TRAIN, TEST, max_vocab=3)
    for r in got.itertuples():
        assert (r.pred, r.score) == exp[r.doc_id]
