"""Token-array-native corpus operators.

The engine's input is pre-tokenized sequences ((doc_id, tokens:array,
n_tok, source) — BASELINE.json input_hint); these operators work on the
token payload itself, the part of a training-data pipeline the reference
(metric time series only) never touches:

- ``token_frequencies``: corpus-level term/document frequencies — the
  trillion-scale wordcount. Map-side partial aggregation collapses each
  task's counts into a bounded vocabulary hash map before the shuffle, so
  shuffle volume is O(vocab per task), not O(total tokens).
- ``sequence_pack_plan`` / ``pack_tokens``: concat-and-chunk packing of
  documents into fixed-size training sequences (each source's documents
  are concatenated in a deterministic order and split every ``max_tokens``
  tokens, documents straddling pack boundaries — the standard LLM
  pretraining layout). The plan is pure window-cumsum + sequence/explode
  arithmetic: one exchange per source partition, no Python, and fully
  replayable in ANSI SQL (DuckDB oracle in __spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def token_frequencies(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> DataFrame:
    """(token, term_freq, doc_freq) over the whole corpus.

    term_freq counts occurrences (multiplicity), doc_freq counts documents
    containing the token at least once (via per-doc array_distinct BEFORE
    the explode — the two-level aggregation that keeps a count-distinct
    off the shuffle)."""
    tf = (
        df.select(F.explode(tokens_col).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("term_freq"))
    )
    dfq = (
        df.select(F.explode(F.array_distinct(tokens_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
    )
    out = tf.join(dfq, "token")
    if min_count > 1:
        out = out.filter(F.col("term_freq") >= min_count)
    return out


def tf_idf_topk(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    top_k: int = 5,
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF:
    score = tf · (ln((N+1)/(df+1)) + 1)  (sklearn's smooth_idf form).

    (doc_id, token, tf, score, rank). Ties break on token order so the
    result is deterministic under any execution plan. Plan: one explode +
    per-doc count, a token-keyed join against the corpus doc-frequency
    table (broadcastable when the vocabulary is bounded), one window for
    the per-doc top-k."""
    per_doc = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(tokens_col).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # n_docs rides along as a 1-row crossJoin (broadcast literal at run
    # time) — an eager collect() here would fire a full corpus scan merely
    # to CONSTRUCT the plan
    n_docs = df.select(F.count(F.lit(1)).alias("_n_docs"))
    dfq = (
        df.select(F.explode(F.array_distinct(tokens_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .crossJoin(F.broadcast(n_docs))
    )
    idf = F.log((F.col("_n_docs") + 1.0) / (F.col("doc_freq") + 1)) + 1.0
    scored = per_doc.join(dfq, "token").select(
        "doc_id", "token", "tf", (F.col("tf") * idf).alias("score")
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("doc_id", "token", "tf", "score", "rank")
    )


def sequence_pack_plan(
    df: DataFrame,
    max_tokens: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    len_col: str = "n_tok",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Concat-and-chunk pack assignment:
    (source, pack_id, doc_id, offset, tok_start, tok_end).

    Per source, documents are laid out contiguously in ``order_cols`` order
    (default: id order — deterministic under any shuffle) at offset =
    running sum of previous lengths; pack k owns the token span
    [k·max_tokens, (k+1)·max_tokens). A document overlapping several spans
    emits one row per pack with its doc-local slice [tok_start, tok_end).
    Zero-length documents contribute no rows.

    sum(tok_end - tok_start) == sum(n_tok) and each pack's total is
    exactly max_tokens except the final pack per source (invariants in
    tests/test_tokens.py)."""
    order = order_cols or [id_col]
    # ROWS frame, not the default RANGE frame: RANGE includes ALL peer rows
    # of a tied order key in the running sum, which would hand tied docs the
    # same offset and silently drop token spans (the SQL oracle uses ROWS).
    w = (
        Window.partitionBy(source_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = F.lit(max_tokens)
    base = df.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("doc_id"),
        F.col(len_col).cast("long").alias("n_tok"),
        (F.sum(F.col(len_col).cast("long")).over(w) - F.col(len_col)).alias("offset"),
    ).filter(F.col("n_tok") > 0)
    p0 = F.floor(F.col("offset") / m)
    p1 = F.floor((F.col("offset") + F.col("n_tok") - 1) / m)
    exploded = base.select(
        "source",
        "doc_id",
        "n_tok",
        "offset",
        F.explode(F.sequence(p0, p1)).alias("pack_id"),
    )
    return exploded.select(
        "source",
        "pack_id",
        "doc_id",
        "offset",
        F.greatest(F.col("pack_id") * m - F.col("offset"), F.lit(0)).alias("tok_start"),
        F.least((F.col("pack_id") + 1) * m - F.col("offset"), F.col("n_tok")).alias("tok_end"),
    )


def pack_tokens(
    df: DataFrame,
    max_tokens: int,
    tokens_col: str = "tokens",
    source_col: str = "source",
    id_col: str = "doc_id",
    len_col: str = "n_tok",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Materialized packs: (source, pack_id, tokens, n_tok).

    Joins the pack plan back to the token arrays, slices each document's
    contribution JVM-side, and reassembles each pack with an order-safe
    array_sort-by-offset + flatten — no Python, no assumption about
    which task delivers which slice first. Every pack has exactly
    max_tokens tokens except the last pack of each source."""
    plan = sequence_pack_plan(df, max_tokens, source_col, id_col, len_col, order_cols)
    src = df.select(
        F.col(id_col).alias("doc_id"), F.col(tokens_col).alias("_toks")
    )
    sliced = plan.join(src, "doc_id").select(
        "source",
        "pack_id",
        F.struct(
            F.col("offset").alias("o"),
            F.slice(
                F.col("_toks"),
                (F.col("tok_start") + 1).cast("int"),
                (F.col("tok_end") - F.col("tok_start")).cast("int"),
            ).alias("t"),
        ).alias("piece"),
    )
    return (
        sliced.groupBy("source", "pack_id")
        .agg(F.array_sort(F.collect_list("piece")).alias("pieces"))
        .select(
            "source",
            "pack_id",
            F.flatten(F.transform("pieces", lambda p: p["t"])).alias("tokens"),
        )
        .withColumn("n_tok", F.size("tokens"))
    )


def _greedy_fill_np(lens, max_tokens: int):
    """Vectorized greedy no-split fill: (pack_idx, pack_offset) for doc
    lengths in order. The successor of EVERY candidate pack start is
    precomputed in one vectorized searchsorted over the cumulative sums
    (nxt[i] = first doc that does NOT fit in a pack starting at doc i);
    the sequential recurrence then collapses to walking the orbit of 0
    through a plain Python list — one list index + append per PACK
    (~100 ns) instead of one interpreted searchsorted call per pack
    (~2 µs), the former hot spot when one source holds millions of docs.
    Semantics identical to the sequential rule: append while it fits,
    else new pack; an oversized doc at offset 0 keeps its pack.
    """
    import numpy as np

    lens = np.asarray(lens, dtype=np.int64)
    n = len(lens)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    cum = np.cumsum(lens)
    base = np.concatenate([[0], cum[:-1]])
    nxt = np.searchsorted(cum, base + max_tokens, side="right")
    # a doc alone exceeding max_tokens gets its own pack: successor i+1
    np.maximum(nxt, np.arange(1, n + 1), out=nxt)
    nxt_l = nxt.tolist()
    starts = [0]
    append = starts.append
    s = nxt_l[0]
    while s < n:
        append(s)
        s = nxt_l[s]
    starts = np.asarray(starts, dtype=np.int64)
    sizes = np.diff(starts, append=np.int64(n))
    pack_idx = np.repeat(np.arange(len(starts), dtype=np.int64), sizes)
    pack_base = np.where(starts > 0, cum[starts - 1], 0)[pack_idx]
    offsets = base - pack_base
    return pack_idx, offsets


def pack_greedy_no_split(
    df: DataFrame,
    max_tokens: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    len_col: str = "n_tok",
    sub_salt: int | None = None,
    chunk_by: str = "rank",
) -> DataFrame:
    """NO-SPLIT greedy packing: documents are kept whole; per source, docs
    are taken in id order and appended to the current pack while they fit,
    else a new pack starts — the packing variant used when training
    sequences must not straddle document boundaries (vs sequence_pack_plan's
    concat-and-chunk, which splits). Docs longer than max_tokens get a pack
    of their own (truncation is the caller's policy decision).

    Returns (source, pack_id, doc_id, pack_offset, n_tok). Invariants
    (tests/test_tokens.py): per-pack sums ≤ max_tokens (except singleton
    oversized docs), token mass conserved, and the greedy property — a doc
    opens a new pack iff it did not fit in the current one.

    Scale shape: the fill state is a sequential recurrence per source, so
    the kernel is applyInPandas keyed by source (the same per-series unit
    of work as gap-fill); the fill itself is searchsorted-vectorized
    (_greedy_fill_np — python steps scale with PACKS, not docs). Skewed /
    low-cardinality corpora (one giant source would serialize into one
    task) opt into ``sub_salt``: each source is cut into positional chunks
    of ``sub_salt`` docs, chunks pack independently in parallel, and a
    windowed BOUNDARY FIX-UP merges a chunk's first pack into the previous
    chunk's final pack when the two fit together (guarded to multi-pack
    chunks so merge decisions never cascade — one window pass, no
    recurrence). Any source with ≤ sub_salt docs takes the single-chunk
    path and produces OUTPUT IDENTICAL to the sequential variant (pack ids
    included); salted pack ids are unique but sparse ((chunk << 40) +
    local). Waste bound: ≤ one under-full pack per unmergeable boundary.

    ``chunk_by`` picks how positional chunks are cut:
    - "rank" (default): row_number per source — deterministic and
      byte-stable, but ranking ONE giant source is a single-reducer sort;
      right when sources are plentiful or groups modest.
    - "range": repartitionByRange(source, id) and use the partition id as
      the chunk — the fully scalable path for a single 10^12-doc source
      (range partitions sort in parallel and are contiguous in id order,
      so chunks are still positional runs and the same fix-up applies).
      Chunk sizes follow partition sizing (``sub_salt`` is ignored except
      as the >=2 validity check), and pack numbering can shift if the
      partitioner's sampled boundaries change — packing validity and the
      invariants hold regardless.
    """
    import numpy as np

    from pyspark.sql import types as T

    src = df.select(source_col, id_col, len_col).filter(F.col(len_col) > 0)

    key_cols = ["source"] if sub_salt is None else ["source", "_chunk"]
    out_fields = [T.StructField("source", df.schema[source_col].dataType)]
    if sub_salt is not None:
        out_fields.append(T.StructField("_chunk", T.LongType()))
    out_fields += [
        T.StructField("pack_id", T.LongType()),
        T.StructField("doc_id", df.schema[id_col].dataType),
        T.StructField("pack_offset", T.LongType()),
        T.StructField("n_tok", T.LongType()),
    ]
    out_schema = T.StructType(out_fields)

    # applyInArrow, not applyInPandas: a multi-million-doc group pays for
    # the id sort and the column round-trip, and pandas does both through
    # per-row PyObjects (a 3M-string sort_values alone was ~6 s). Arrow's
    # sort_indices/take are vectorized C over the id column (UTF-8 byte
    # order == code-point order, the same ordering pandas used), and the
    # fill maths is numpy either way.
    def fill(table):
        import pyarrow as pa
        import pyarrow.compute as pc

        ids_col = table.column(id_col).combine_chunks()
        order = pc.sort_indices(ids_col)
        ids = pc.take(ids_col, order)
        lens = (
            pc.take(table.column(len_col).combine_chunks(), order)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64, copy=False)
        )
        packs, offs = _greedy_fill_np(lens, max_tokens)
        source = pc.take(table.column(source_col).combine_chunks(), order)
        cols = {"source": source}
        if sub_salt is not None:
            chunk = int(table.column("_chunk")[0].as_py())
            cols["_chunk"] = pa.array(
                np.full(len(lens), chunk, dtype=np.int64), type=pa.int64()
            )
            # globally unique, sparse, order-preserving; chunk 0 keeps the
            # sequential numbering (the multi-source equality contract)
            packs = packs + (chunk << 40)
        cols.update(
            {
                "pack_id": pa.array(packs, type=pa.int64()),
                "doc_id": ids,
                "pack_offset": pa.array(offs, type=pa.int64()),
                "n_tok": pa.array(lens, type=pa.int64()),
            }
        )
        return pa.table(cols)

    if sub_salt is None:
        return src.groupBy(source_col).applyInArrow(fill, out_schema)

    if sub_salt < 2:
        raise ValueError("sub_salt must be >= 2 (1 doc per chunk packs nothing)")
    if chunk_by == "range":
        p = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        salted = src.repartitionByRange(
            p, F.col(source_col), F.col(id_col)
        ).withColumn("_chunk", F.spark_partition_id().cast("long"))
    elif chunk_by == "rank":
        rn_w = Window.partitionBy(source_col).orderBy(id_col)
        salted = src.withColumn(
            "_chunk", ((F.row_number().over(rn_w) - 1) / F.lit(sub_salt)).cast("long")
        )
    else:
        raise ValueError(f"chunk_by must be 'rank' or 'range', got {chunk_by!r}")
    plan = salted.groupBy(source_col, "_chunk").applyInArrow(fill, out_schema)
    # the plan feeds both the chunk-stats aggregation and the fix-up join
    # (a diamond): eager localCheckpoint materializes the fill ONCE and
    # cuts lineage; unlike a bare persist() the checkpointed blocks are
    # released by the ContextCleaner when the result frame is dropped, so
    # repeated calls don't pin cache for the session lifetime. Tradeoff
    # (engine-wide convention, same as the minhash pipeline): local
    # checkpoints are NON-reliable — losing an executor mid-job cannot be
    # recomputed from the truncated lineage. On preemptible clusters use
    # reliable checkpointing or accept job retry.
    plan = plan.localCheckpoint(eager=True)

    # ---- boundary fix-up: merge chunk c's FIRST pack into chunk c-1's
    # LAST pack when their totals fit together. Guard n_packs >= 2 on the
    # merging chunk: its own last pack is then untouched by the merge, so
    # every chunk's decision reads stable prev-chunk stats — one window
    # pass, no cascade.
    ptot = plan.groupBy("source", "_chunk", "pack_id").agg(
        F.sum("n_tok").alias("_ptot")
    )
    stats = ptot.groupBy("source", "_chunk").agg(
        F.min("pack_id").alias("_first_pid"),
        F.max("pack_id").alias("_last_pid"),
        F.count(F.lit(1)).alias("_n_packs"),
        F.min_by("_ptot", "pack_id").alias("_first_tot"),
        F.max_by("_ptot", "pack_id").alias("_last_tot"),
    )
    cw = Window.partitionBy("source").orderBy("_chunk")
    merge = stats.select(
        "source",
        "_chunk",
        "_first_pid",
        F.lag("_last_pid").over(cw).alias("_prev_last_pid"),
        F.lag("_last_tot").over(cw).alias("_prev_last_tot"),
        (
            (F.col("_n_packs") >= 2)
            & (F.lag("_last_tot").over(cw) + F.col("_first_tot") <= F.lit(max_tokens))
        ).alias("_merge"),
    )
    fixed = (
        plan.join(merge, ["source", "_chunk"], "left")
        .withColumn(
            "_is_merged",
            F.coalesce(F.col("_merge"), F.lit(False))
            & (F.col("pack_id") == F.col("_first_pid")),
        )
        .select(
            "source",
            F.when(F.col("_is_merged"), F.col("_prev_last_pid"))
            .otherwise(F.col("pack_id"))
            .alias("pack_id"),
            "doc_id",
            F.when(F.col("_is_merged"), F.col("pack_offset") + F.col("_prev_last_tot"))
            .otherwise(F.col("pack_offset"))
            .alias("pack_offset"),
            "n_tok",
        )
    )
    return fixed


def token_distribution_divergence(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    vocab_size: int = 20000,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-group token-distribution drift vs the whole corpus: KL(p‖q)
    and Jensen–Shannon divergence (natural log), where p is the group's
    add-α-smoothed unigram distribution over the top-`vocab_size` corpus
    vocabulary (+ an ``<unk>`` OOV state) and q is the corpus-wide
    distribution smoothed the same way. The standard domain-mixture
    monitor: "is this source's token profile diverging from the
    training mix?" — rising JS flags domains to re-weight.

        p_g(w) = (c_g(w) + α) / (n_g + α·V⁺)     (V⁺ = |vocab| + 1)
        kl_g   = Σ_w p_g ln(p_g / q)
        js_g   = ½ Σ_w p_g ln(p_g/m) + ½ Σ_w q ln(q/m),  m = (p_g+q)/2

    Scale shape: one tokenize pass; counts partial-aggregate map-side on
    (group, word); the (group × V⁺) probability grid is built by joining
    group counts onto the broadcast vocabulary (grid rows bounded by
    contract: groups × 50k); each divergence is a sorted-fold over the
    group's term array, so the double sum is engine-exact (the lm.py
    discipline). Output: (group, n_tokens, kl, js)."""
    from numalogic_spark.operators.lm import UNK
    from numalogic_spark.operators.textstats import words_expr

    if not (0 < vocab_size <= 50_000):
        raise ValueError(f"vocab_size must be in (0, 50000], got {vocab_size}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    a = float(alpha)

    spark = df.sparkSession
    toks = df.select(
        F.col(group_col).alias("grp"),
        F.explode(words_expr(text_col)).alias("word"),
    )
    wc = toks.groupBy("grp", "word").agg(F.count(F.lit(1)).alias("c")).persist()
    try:
        corpus = wc.groupBy("word").agg(F.sum("c").alias("cc"))
        vocab_rows = (
            corpus.orderBy(F.desc("cc"), F.asc("word")).limit(int(vocab_size)).collect()
        )
        vocab_words = {r["word"] for r in vocab_rows}
        v_states = len(vocab_words) + 1  # + <unk>
        vocab = spark.createDataFrame(
            [(w,) for w in sorted(vocab_words)] + [(UNK,)], "word string"
        )

        # OOV-fold group counts onto the vocab states
        folded = (
            wc.join(
                F.broadcast(vocab.withColumn("inv", F.lit(True))), "word", "left"
            )
            .select(
                "grp",
                F.when(F.col("inv"), F.col("word")).otherwise(F.lit(UNK)).alias("w"),
                "c",
            )
            .groupBy("grp", "w")
            .agg(F.sum("c").alias("c"))
        )
        groups = folded.groupBy("grp").agg(F.sum("c").alias("n_tokens"))
        corpus_folded = folded.groupBy("w").agg(F.sum("c").alias("cq"))
        n_corpus = folded.agg(F.sum("c")).collect()[0][0]
        if n_corpus is None:
            raise ValueError("empty corpus: no tokens to fit a distribution on")

        # full (group × vocab-state) grid so never-seen words still carry
        # their smoothed mass — bounded at groups × (V+1)
        grid = (
            groups.crossJoin(F.broadcast(vocab))
            .join(folded.withColumnRenamed("w", "word"), ["grp", "word"], "left")
            .join(
                F.broadcast(corpus_folded.withColumnRenamed("w", "word")),
                "word",
                "left",
            )
            .select(
                "grp",
                "n_tokens",
                F.coalesce(F.col("c"), F.lit(0)).alias("cg"),
                F.coalesce(F.col("cq"), F.lit(0)).alias("cq"),
            )
        )
        p = (F.col("cg").cast("double") + F.lit(a)) / (
            F.col("n_tokens").cast("double") + F.lit(a) * F.lit(float(v_states))
        )
        q = (F.col("cq").cast("double") + F.lit(a)) / (
            F.lit(float(n_corpus)) + F.lit(a) * F.lit(float(v_states))
        )
        m = (p + q) / F.lit(2.0)
        terms = grid.select(
            "grp",
            "n_tokens",
            (p * F.log(p / q)).alias("t_kl"),
            (p * F.log(p / m)).alias("t_pm"),
            (q * F.log(q / m)).alias("t_qm"),
        )

        def _fold(c: str) -> Column:
            return F.aggregate(
                F.array_sort(F.collect_list(F.col(c))),
                F.lit(0.0),
                lambda acc, t: acc + t,
            )

        out = terms.groupBy("grp", "n_tokens").agg(
            _fold("t_kl").alias("kl"),
            ((_fold("t_pm") + _fold("t_qm")) / F.lit(2.0)).alias("js"),
        )
        # group-count-sized result; eager checkpoint materializes it off
        # the wc cache BEFORE the finally releases it (the lm.py
        # discipline — a lazy return would re-tokenize per consumer)
        return out.localCheckpoint(eager=True)
    finally:
        wc.unpersist()


def heavy_hitters_per_group(
    df: DataFrame,
    group_col: str = "source",
    tokens_col: str = "tokens",
    k: int = 10,
) -> DataFrame:
    """Exact top-k heavy-hitter tokens per group: (group, token, cnt,
    rnk), ties broken by token ascending (deterministic cross-engine).

    The group column keeps its input name.

    Two-level shape: the (group, token) count is ONE map-side-combinable
    groupBy (partial aggregation absorbs the Zipf head before the
    shuffle — the hot token contributes one partial row per input
    partition, not one row per occurrence), then the rank window runs
    over groups of vocabulary size, never corpus size. At 100 TB this is
    the exact counterpart of a SpaceSaving sketch — exactness costs one
    shuffle of the (group × vocab) grid, which Zipf keeps far below the
    row count."""
    counts = (
        df.select(F.col(group_col), F.explode(tokens_col).alias("token"))
        .groupBy(group_col, "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy(group_col).orderBy(F.col("cnt").desc(), F.col("token"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(group_col, "token", "cnt", "rnk")
    )
