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
    # ONE token-stream aggregation total: per-(word, label) counts. The
    # vocabulary derives from them (Σ_l c_{w,l} IS the corpus word count,
    # same (cnt desc, word asc) tie-break), so the earlier separate
    # vocabulary pass — a second shuffle of the full token stream plus a
    # persisted word-array cache — is gone; at 100 TB that is one corpus
    # shuffle instead of two and no corpus-sized cache write. The
    # aggregated (word, label) table is realized-vocabulary-sized, stays
    # in executor cache only until the capped model is cut from it.
    wl_all = (
        df.select(F.col(label_col).alias("label"), F.explode(_words(text_col)).alias("word"))
        .groupBy("word", "label")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    # collect the capped vocabulary ONCE (≤ max_vocab strings — driver-sized
    # by construction) and rebuild it as a literal frame: leaving it as a
    # lazy TakeOrdered subtree would re-run the full corpus aggregation
    # under every downstream lineage (in_vocab filter, grid).
    vocab_words = [
        r["word"]
        for r in wl_all.groupBy("word")
        .agg(F.sum("c").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word"))
        .limit(int(max_vocab))
        .collect()
    ]
    v_size = len(vocab_words)
    vocab = df.sparkSession.createDataFrame(
        [(w,) for w in vocab_words], "word string"
    )
    # Materialize the capped model eagerly (≤ V·L rows — model-sized,
    # tiny) and release the full count cache; every downstream consumer
    # (totals, grid, likelihoods, the returned frames) now reads the
    # checkpointed counts, never the corpus.
    wl = wl_all.join(F.broadcast(vocab), "word").localCheckpoint()
    wl_all.unpersist()
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
    is model-sized, collected once), so scoring is ONE exchange over the
    token stream: exploded words broadcast-join their L-column
    log-likelihood row (map-side, no shuffle) and flow straight into the
    per-doc groupBy, whose map-side combine ships ~n_docs rows. Decimal
    addition is exact and order-independent, so summing each occurrence
    is bit-identical to the earlier (doc, word)-pre-aggregated k·lp form
    — which cost a second full exchange of the token stream for nothing
    the combiner wasn't already doing. The argmax is an inline
    fixed-arity `greatest` over (score, label-priority) structs — no
    label explode, no rank window (that shape re-shuffled and sorted
    n_docs·L rows just to pick each row's max)."""
    pr = sorted(
        priors.select("label", "log_prior", "log_unk").collect(),
        key=lambda r: r["label"],
    )
    labels = [r["label"] for r in pr]
    dec = "decimal(28,6)"
    lik_w = likelihoods.groupBy("word").pivot("label", labels).agg(F.first("log_p"))

    tok = df.select(F.col(id_col).alias("id"), F.explode(_words(text_col)).alias("word"))
    contribs = [
        F.coalesce(F.col(f"`{lbl}`").cast(dec), F.lit(r["log_unk"]).cast(dec)).alias(
            f"_c{i}"
        )
        for i, (lbl, r) in enumerate(zip(labels, pr))
    ]
    sums = (
        tok.join(F.broadcast(lik_w), "word", "left")
        .select("id", *contribs)
        .groupBy("id")
        .agg(*[F.sum(f"_c{i}").cast(dec).alias(f"_s{i}") for i in range(len(labels))])
    )
    # prior-only arms keep zero-word docs scoreable; `pri` = reversed
    # label index so the lexicographic struct max realizes the
    # (score desc, label asc) tie-break: equal scores pick the higher
    # priority = the earlier (smaller) label. Labels are distinct, so
    # (score, pri) is always decisive.
    arms = [
        F.struct(
            (
                F.lit(r["log_prior"]).cast(dec)
                + F.coalesce(F.col(f"_s{i}"), F.lit(0).cast(dec))
            ).alias("score"),
            F.lit(len(labels) - 1 - i).alias("pri"),
            F.lit(lbl).alias("label"),
        )
        for i, (lbl, r) in enumerate(zip(labels, pr))
    ]
    best = F.greatest(*arms) if len(arms) > 1 else arms[0]
    return (
        df.select(F.col(id_col).alias("id"))
        .join(sums, "id", "left")
        .select(
            F.col("id").alias(id_col),
            best["label"].alias("pred"),
            best["score"].cast("double").alias("score"),
        )
    )
