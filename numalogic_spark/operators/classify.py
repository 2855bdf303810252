"""Distributed multinomial Naive Bayes text classifier — the trainable
domain/quality-classifier stage of a training-data pipeline (the role
fastText/CCNet-style filters play at corpus scale), built closed-form:

- **Training is two aggregations over ONE tokenization pass** (no
  iterative optimizer): the word-array frame is persisted once; corpus
  word counts pick a capped vocabulary (top-K by frequency — Zipf makes
  the cap nearly lossless), then per-(word, label) counts become
  add-alpha log-likelihoods. Both are map-side-combining groupBys; the
  model is a small (V·L) table — localCheckpointed and broadcastable at
  any corpus size; label totals and the doc-count prior derive from the
  model counts / a label-column-only scan, never a second corpus pass.
- **Scoring is relational**: explode doc words (multiplicity kept), LEFT
  broadcast-join the per-word log-likelihood row (OOV words fall back to
  the per-label unknown mass), per-doc decimal sum per label + prior,
  argmax with deterministic label-order tie-break.

Cross-engine exactness (the driver hash gate): every log-probability is
QUANTIZED to 6 decimals (floor(x·1e6+0.5)/1e6) at train time and summed
as DECIMAL — order-independent and bit-identical between Spark and the
DuckDB oracle, the same discipline as the rollup/entropy oracles.

No reference analog (numalogic's domain is metric streams); this covers
the "text analysis / quality scoring" capability of the build brief with
a *trainable* model rather than fixed heuristics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_Q = 1_000_000  # 6-dp quantization for cross-engine exact sums


def _q6(col):
    return F.floor(col * _Q + F.lit(0.5)) / _Q


def _words(text_col: str):
    return F.array_remove(F.split(F.lower(F.col(text_col)), r"\s+"), "")


def nb_train(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    max_vocab: int = 50_000,
    alpha: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Fit the model; returns (priors, likelihoods).

    priors: (label, log_prior, log_unk) — log_unk is the smoothed mass for
    out-of-vocabulary words under that label.
    likelihoods: (word, label, log_p) for the top-``max_vocab`` corpus
    words (ties broken by word asc — deterministic across engines).

    log_p(w|l) = ln((c_{w,l} + alpha) / (T_l + alpha·(V+1))) where T_l is
    the label's total IN-VOCAB token count and V the realized vocabulary
    size; the +1 reserves one smoothing slot for the OOV bucket, whose
    mass is ln(alpha / (T_l + alpha·(V+1))). All three are quantized to
    6dp at train time so score sums are engine-exact.
    """
    # Tokenize the corpus EXACTLY ONCE: persist the word-array frame (the
    # regex split/lower is the expensive part; explode from cache is cheap)
    # so the vocabulary pass and the per-(word,label) count pass share it.
    # The earlier shape re-ran full tokenization three times (wc, in_vocab,
    # totals) — at 100 TB that is three corpus jobs instead of one.
    warr = df.select(F.col(label_col).alias("label"), _words(text_col).alias("ws"))
    warr = warr.persist()
    wc = (
        warr.select(F.explode("ws").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # collect the capped vocabulary ONCE (≤ max_vocab strings — driver-sized
    # by construction) and rebuild it as a literal frame: leaving it as a
    # lazy TakeOrdered subtree would re-run the full corpus tokenization
    # under every downstream lineage (vocab.count, in_vocab, grid).
    vocab_words = [
        r["word"]
        for r in wc.orderBy(F.col("cnt").desc(), F.col("word"))
        .limit(int(max_vocab))
        .collect()
    ]
    v_size = len(vocab_words)
    vocab = df.sparkSession.createDataFrame(
        [(w,) for w in vocab_words], "word string"
    )
    tok = warr.select("label", F.explode("ws").alias("word"))
    in_vocab = tok.join(F.broadcast(vocab), "word")
    wl = in_vocab.groupBy("word", "label").agg(F.count(F.lit(1)).alias("c"))
    # Materialize wl eagerly (≤ V·L rows — model-sized, tiny) and release
    # the token cache; every downstream consumer (totals, grid, likelihoods,
    # the returned frames) now reads the checkpointed counts, never the
    # corpus.
    wl = wl.localCheckpoint()
    warr.unpersist()
    # totals is derivable from wl (Σ c per label == in-vocab token count) —
    # the earlier separate in_vocab aggregation was a whole corpus pass for
    # a value already present in the model counts.
    totals = wl.groupBy("label").agg(F.sum("c").alias("t"))
    denom = F.col("t") + F.lit(alpha) * F.lit(float(v_size + 1))

    # n_docs as a window total over the per-label doc counts (L rows) —
    # avoids a separate df.count() corpus pass; this scan reads only the
    # label column.
    label_counts = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n")
    )
    label_counts = label_counts.withColumn(
        "n_docs", F.sum("n").over(Window.partitionBy())
    )
    priors = (
        label_counts.join(totals, "label", "left")
        .na.fill({"t": 0})
        .select(
            "label",
            _q6(F.log(F.col("n") / F.col("n_docs").cast("double"))).alias("log_prior"),
            _q6(F.log(F.lit(alpha) / denom)).alias("log_unk"),
        )
    )
    # full (word × label) grid so a word unseen under one label still gets
    # its smoothed alpha mass there (not the OOV mass)
    grid = vocab.crossJoin(totals.select("label"))
    likelihoods = (
        grid.join(wl, ["word", "label"], "left")
        .na.fill({"c": 0})
        .join(totals, "label")
        .select(
            "word",
            "label",
            _q6(F.log((F.col("c") + F.lit(alpha)) / denom)).alias("log_p"),
        )
    )
    return priors, likelihoods


def nb_score(
    df: DataFrame,
    priors: DataFrame,
    likelihoods: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents: (id, pred, score) — score is the winning label's
    decimal joint log-probability (prior + Σ per-word quantized log-p),
    pred breaks score ties by label asc. Zero-word docs fall back to the
    prior-only argmax. Labels come from the model, not the data.

    Shape: the model is label-PIVOTED at plan-build time (the label list
    is model-sized, collected once), so the scoring aggregation carries
    one row per (doc, distinct word) with L decimal columns instead of
    exploding every word occurrence × L labels through the shuffle — the
    per-doc groupBy's map-side combine then ships ~n_docs rows. The sums
    are exact decimal arithmetic either way (k·lp ≡ k summands of lp),
    so scores are bit-identical to the occurrence-exploded form."""
    pr = sorted(
        priors.select("label", "log_prior", "log_unk").collect(),
        key=lambda r: r["label"],
    )
    labels = [r["label"] for r in pr]
    dec = "decimal(28,6)"
    lik_w = likelihoods.groupBy("word").pivot("label", labels).agg(F.first("log_p"))

    tok = df.select(F.col(id_col).alias("id"), F.explode(_words(text_col)).alias("word"))
    wcnt = tok.groupBy("id", "word").agg(F.count(F.lit(1)).alias("k"))
    contribs = [
        (
            F.col("k")
            * F.coalesce(
                F.col(f"`{lbl}`").cast(dec), F.lit(r["log_unk"]).cast(dec)
            )
        ).alias(f"_c{i}")
        for i, (lbl, r) in enumerate(zip(labels, pr))
    ]
    sums = (
        wcnt.join(F.broadcast(lik_w), "word", "left")
        .select("id", *contribs)
        .groupBy("id")
        .agg(*[F.sum(f"_c{i}").cast(dec).alias(f"_s{i}") for i in range(len(labels))])
    )
    # prior-only arms keep zero-word docs scoreable
    arms = F.array(
        *[
            F.struct(
                F.lit(lbl).alias("label"),
                (
                    F.lit(r["log_prior"]).cast(dec)
                    + F.coalesce(F.col(f"_s{i}"), F.lit(0).cast(dec))
                ).alias("score"),
            )
            for i, (lbl, r) in enumerate(zip(labels, pr))
        ]
    )
    scored = (
        df.select(F.col(id_col).alias("id"))
        .join(sums, "id", "left")
        .select("id", F.explode(arms).alias("x"))
        .select("id", F.col("x.label").alias("label"), F.col("x.score").alias("score"))
    )
    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("label"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("id").alias(id_col),
            F.col("label").alias("pred"),
            F.col("score").cast("double").alias("score"),
        )
    )
