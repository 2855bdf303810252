"""N-gram language-model perplexity scoring — the CCNet-style quality
filter (Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data", 2019): score each document by the
perplexity of a small LM; very-high-perplexity docs are noise, and
perplexity buckets drive corpus curation. CCNet uses a KenLM 5-gram; the
engine implements the same scoring shape with an add-one-smoothed bigram
model whose training is itself a Spark aggregation, so model fitting
scales with the corpus instead of being a driver-side artifact.

Scale shape (the 100-TB story):
- ONE tokenize pass: the word-array frame is persisted and feeds both the
  vocabulary count and bigram formation (the NB-classifier lesson), then
  is released as soon as the per-doc bigram counts materialize.
- Bigrams are formed JVM-side (`transform` over the word array) — no
  per-word explode+window shuffle; the explode happens at bigram
  granularity and immediately partial-aggregates into per-doc counts.
- The vocabulary is collected ONCE as a ≤`vocab_size` literal frame (the
  NB/BPE discipline — bounded by contract at 50k) and broadcast for OOV
  mapping, never shuffled.
- The corpus model (c12/c1) derives from the per-doc counts — no second
  corpus pass — and is localCheckpointed at model size when
  `broadcast_model=True` (realized bigrams over a capped vocab; pass
  False for corpora where distinct bigrams outgrow a broadcast and the
  scoring join becomes a shuffle join instead).
- The per-doc log-prob sum folds over a SORTED value array so float
  addition order is deterministic and the DuckDB oracle replays it
  exactly (the trigram-entropy discipline).
- The result is localCheckpointed executor-locally (partitioned, not
  driver-side) so every cached input can be released eagerly; callers
  compose filters after scoring, which is the normal CCNet flow.

Reference parity: numalogic has no text LM; this is a training-data
curation operator in the dedup/textstats family. The `<unk>` sentinel
assumes the corpus has no literal '<unk>' token (true for the synthetic
tables; real corpora normalize it away first).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

UNK = "<unk>"


def perplexity_buckets(
    scored: DataFrame,
    ppl_col: str = "ppl",
    id_col: str = "doc_id",
    labels: Sequence[str] = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet's corpus partition: equal-count perplexity buckets, lowest
    perplexity first ("head" is the cleanest third; CCNet trains on
    head+middle). Deterministic total order (ppl asc, id asc) so the
    bucket assignment is engine-exact.

    Scale note: ntile is a GLOBAL sort — correct and exact at oracle
    scale, but at 100 TB the swap is approxQuantile cut points broadcast
    into a comparison (one pass, no global exchange); only boundary ties
    move between buckets. The exact form is kept as the gate because the
    cut-point form's interpolated quantiles are not bit-portable across
    engines."""
    n = len(labels)
    w = Window.orderBy(F.col(ppl_col).asc(), F.col(id_col).asc())
    tile = F.ntile(n).over(w)
    label = F.element_at(F.array(*[F.lit(x) for x in labels]), tile)
    return scored.select(*scored.columns, label.alias("bucket"))


def bigram_perplexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 20000,
    broadcast_model: bool = True,
    checkpoint: bool = True,
) -> DataFrame:
    """Per-doc bigram perplexity under an add-one-smoothed LM trained on
    the same corpus: ppl = exp(-(Σ k·ln p(w2|w1)) / m) over the doc's m
    bigrams (k = per-doc multiplicity of each distinct bigram), with
    p(w2|w1) = (c12+1)/(c1 + V+1), OOV words mapped to `<unk>`, and the
    vocabulary = top-`vocab_size` corpus words by frequency (ties broken
    by word asc — deterministic across engines). c1 is the left-position
    count Σ_w2 c12, so the model is fully derivable from bigram counts.
    Docs with fewer than two words score 0.0.

    Output: (doc_id, ppl, n_bigrams)."""
    from numalogic_spark.operators.textstats import words_expr

    if not (0 < vocab_size <= 50_000):
        raise ValueError(f"vocab_size must be in (0, 50000], got {vocab_size}")

    spark = df.sparkSession
    warr = df.select(F.col(id_col).alias("doc_id"), words_expr(text_col).alias("ws"))
    warr = warr.persist()
    try:
        # top-V vocabulary, collected once as a driver-sized literal frame
        # (a lazy TakeOrdered subtree would re-run tokenization under every
        # consumer lineage)
        vocab_words = [
            r["word"]
            for r in warr.select(F.explode("ws").alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.desc("c"), F.asc("word"))
            .limit(int(vocab_size))
            .collect()
        ]
        v_sm = float(len(vocab_words) + 1)  # smoothing denominator: vocab + <unk>
        vocab = spark.createDataFrame([(w,) for w in vocab_words], "word string")

        # bigrams JVM-side: pair array → explode → OOV-map via two
        # broadcast joins (no exchange) → ONE per-doc mapped-count
        # aggregation. Folding to <unk> BEFORE the first groupBy collapses
        # what used to be two count exchanges (raw counts, then mapped
        # re-counts) into one — counting mapped pairs directly is
        # identical to summing raw counts per mapped key.
        pairs = F.expr(
            "transform(slice(ws, 1, greatest(size(ws) - 1, 0)), "
            "(w, i) -> struct(w AS w1, element_at(ws, i + 2) AS w2))"
        )
        v1 = F.broadcast(vocab.withColumnRenamed("word", "w1r").withColumn("in1", F.lit(True)))
        v2 = F.broadcast(vocab.withColumnRenamed("word", "w2r").withColumn("in2", F.lit(True)))
        docb = (
            warr.select("doc_id", F.explode(pairs).alias("p"))
            .select(
                "doc_id",
                F.col("p.w1").alias("w1r"),
                F.col("p.w2").alias("w2r"),
            )
            .join(v1, "w1r", "left")
            .join(v2, "w2r", "left")
            .select(
                "doc_id",
                F.when(F.col("in1"), F.col("w1r")).otherwise(F.lit(UNK)).alias("w1"),
                F.when(F.col("in2"), F.col("w2r")).otherwise(F.lit(UNK)).alias("w2"),
            )
            .groupBy("doc_id", "w1", "w2")
            .agg(F.count(F.lit(1)).alias("k"))
            .persist()
        )
        docb.count()  # materialize from the tokenize cache, then drop it
        warr.unpersist()

        # corpus model from the per-doc counts — no extra corpus pass
        c12 = docb.groupBy("w1", "w2").agg(F.sum("k").alias("c12"))
        model = c12.join(c12.groupBy("w1").agg(F.sum("c12").alias("c1")), "w1")
        if broadcast_model:
            model = F.broadcast(model.localCheckpoint(eager=True))

        term = (
            F.col("k").cast("double")
            * (
                F.log(F.col("c12").cast("double") + F.lit(1.0))
                - F.log(F.col("c1").cast("double") + F.lit(v_sm))
            )
        ).alias("term")
        agg = (
            docb.join(model, ["w1", "w2"])
            .select("doc_id", "k", term)
            .groupBy("doc_id")
            .agg(
                F.aggregate(
                    F.array_sort(F.collect_list("term")),
                    F.lit(0.0),
                    lambda acc, t: acc + t,
                ).alias("s"),
                F.sum("k").alias("m"),
            )
        )
        out = (
            df.select(F.col(id_col).alias("doc_id"))
            .join(agg, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce(F.exp(-F.col("s") / F.col("m")), F.lit(0.0)).alias("ppl"),
                F.coalesce(F.col("m"), F.lit(0)).cast("long").alias("n_bigrams"),
            )
        )
        # executor-local checkpoint (partitioned) lets every cache below
        # release now; the scored frame is what callers filter/bucket on.
        # checkpoint=False keeps the full lineage visible (plan audits).
        return out.localCheckpoint(eager=True) if checkpoint else out
    finally:
        warr.unpersist()
        try:
            docb.unpersist()
        except NameError:
            pass


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Corpus-level collocation mining: adjacent word pairs ranked by
    pointwise mutual information, PMI(a,b) = ln(N·c(a,b) / (c(a)·c(b)))
    over bigram-position counts — the classic phrase detector (Church &
    Hanks 1990; the word2phrase preprocessing step of word2vec). Only
    pairs seen ≥ `min_count` times qualify (raw PMI is dominated by
    hapax noise); top_k by (PMI desc, pair asc) is deterministic.

    Scale shape: word and bigram counts are two map-side-combinable
    aggregations over ONE tokenize pass. The marginal tables are
    computed over the UNFILTERED joint (PMI's denominator must not be
    truncated by min_count) but then left-semi-restricted to the words
    that actually appear in a min_count-surviving pair before joining —
    marginal VALUES are final at aggregation time, so dropping rows for
    never-reported words is lossless and shrinks each marginal from
    full-vocabulary size to qualifying-pair size. No broadcast hint is
    forced on the marginal joins: at 10^12 bigrams even the restricted
    marginals can exceed the broadcast ceiling, so AQE picks broadcast
    vs shuffle from the runtime size (only the 1-row N total is hinted).
    N (bigram positions) is re-aggregated from the bigram counts, never
    a second corpus pass. The top-k selection is a parallel
    TakeOrderedAndProject (orderBy + limit), NEVER an unpartitioned
    rank window — rnk is stamped on the already-tiny top_k frame. PMI
    itself is 6-dp-rounded for the cross-engine gate.
    """
    from numalogic_spark.functions.exprs import round6

    words = F.array_remove(F.split(F.lower(F.col(text_col)), r"\s+"), "")
    warr = df.select(words.alias("ws")).persist()
    try:
        # bigram positions: ws[i], ws[i+1] for i in 1..len-1
        bigrams = warr.select(
            F.explode(
                F.when(
                    F.size("ws") >= 2,
                    F.expr(
                        "transform(sequence(1, size(ws) - 1),"
                        " i -> struct(ws[i - 1] AS a, ws[i] AS b))"
                    ),
                ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
            ).alias("bg")
        ).select(F.col("bg.a").alias("a"), F.col("bg.b").alias("b"))
        # full joint counts persist across FOUR consumers (marginals a
        # and b, total N, the min_count filter) — distinct-bigram-sized,
        # one tokenize pass total; the nested finally owns its release
        # even when the materializing count fails
        bc_all = (
            bigrams.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
        ).persist()
        try:
            bc_all.count()  # materialize; warr not needed past this point
            # marginals over ALL bigram positions — the PMI denominator
            # must be marginals of the (unfiltered) joint; min_count
            # restricts only which pairs are REPORTED, or rare-word
            # marginals would be truncated and every surviving PMI
            # inflated
            bc = bc_all.filter(F.col("c_ab") >= min_count)
            # restrict marginal ROWS (not values) to words appearing in a
            # surviving pair — lossless, and bounds the join inputs by the
            # qualifying-pair count instead of the full vocabulary
            ca = (
                bc_all.groupBy("a")
                .agg(F.sum("c_ab").alias("c_a"))
                .join(bc.select("a").distinct(), "a", "left_semi")
            )
            cb = (
                bc_all.groupBy("b")
                .agg(F.sum("c_ab").alias("c_b"))
                .join(bc.select("b").distinct(), "b", "left_semi")
            )
            n_tot = bc_all.agg(F.sum("c_ab").alias("n"))
            scored = (
                bc.join(ca, "a")
                .join(cb, "b")
                .crossJoin(F.broadcast(n_tot))
                .select(
                    "a",
                    "b",
                    "c_ab",
                    round6(
                        F.log(
                            F.col("n").cast("double")
                            * F.col("c_ab").cast("double")
                            / (
                                F.col("c_a").cast("double")
                                * F.col("c_b").cast("double")
                            )
                        )
                    ).alias("pmi"),
                )
            )
            top = scored.orderBy(
                F.col("pmi").desc(), F.col("a"), F.col("b")
            ).limit(top_k)
            w = Window.orderBy(F.col("pmi").desc(), F.col("a"), F.col("b"))
            out = top.withColumn("rnk", F.row_number().over(w)).select(
                "a", "b", "c_ab", "pmi", "rnk"
            )
            return out.localCheckpoint(eager=True)  # top_k rows
        finally:
            bc_all.unpersist()
    finally:
        warr.unpersist()
