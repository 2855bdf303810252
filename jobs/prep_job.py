"""spark-submit entrypoint: end-to-end TRAINING-DATA PREPARATION.

The full path from a raw document corpus to packed training sequences —
the pipeline the rollup engine's training-data layer exists for:

    1. text statistics + quality filter   (textstats.text_stats)
    2. language filter                    (textstats.lang_id, optional)
    3. exact dedup                        (dedup.drop_exact_dups)
    4. MinHash-LSH near-dup pruning       (dedup.minhash_lsh_pairs +
                                           near_dup_clusters, keep canonical)
    5. tokenize (byte-level BPE — functions/bpe.py — or legacy word-hash)
    6. concat-and-chunk sequence packing  (tokens.pack_tokens)

Usage:

    zip -r dist/numalogic_spark.zip numalogic_spark
    spark-submit --master local[8] \
        --py-files dist/numalogic_spark.zip \
        jobs/prep_job.py --input <documents path> --output <packs path> \
        [--max-tokens 2048] [--langs en,de] [--min-words 5] \
        [--near-threshold 0.8] [--report <json path>]

Writes packed sequences (source, pack_id, tokens, n_tok) partitioned by
source, plus a per-stage funnel report (docs in/out of every stage — the
lineage a 100-TB run needs to audit what the filters discarded). Prints
the funnel as one JSON line.

Dedup is a global decision, so like dedup_job this runs as a full job
(atomic overwrite), not under the bucket manifest; the rollup job remains
the bucket-resumable path.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import functions as F

from numalogic_spark.operators.dedup import (
    drop_exact_dups,
    minhash_lsh_pairs,
    near_dup_clusters,
)
from numalogic_spark.operators.textstats import lang_id, text_stats
from numalogic_spark.operators.tokens import pack_tokens
from numalogic_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--report", default=None)
    ap.add_argument("--max-tokens", type=int, default=2048)
    ap.add_argument("--shards", type=int, default=0,
                    help="assign packs a deterministic (shard, ord) training order")
    ap.add_argument("--langs", default=None, help="comma list; omit to keep all")
    ap.add_argument("--min-words", type=int, default=5)
    ap.add_argument("--max-word-len", type=float, default=25.0,
                    help="drop docs whose mean word length exceeds this (garbage filter)")
    ap.add_argument("--near-threshold", type=float, default=0.8)
    ap.add_argument("--scrub-pii", action="store_true",
                    help="redact emails/IPv4s/phones in place before any filter")
    ap.add_argument("--boilerplate-min-docs", type=int, default=0,
                    help="> 0: remove lines recurring in >= N distinct docs "
                         "(corpus-wide boilerplate dedup) before quality filtering")
    ap.add_argument("--tokenizer", choices=["bpe", "hash"], default="bpe",
                    help="bpe: byte-level BPE (train on the filtered corpus "
                         "or load --bpe-vocab); hash: legacy word-hash ids")
    ap.add_argument("--bpe-merges", type=int, default=4096)
    ap.add_argument("--bpe-vocab", default=None,
                    help="path to a saved BPE vocab JSON; if absent one is "
                         "trained on the filtered corpus and saved to "
                         "<output>.bpe_vocab.json (replayable artifact)")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--source-col", default="source")
    args = ap.parse_args()

    spark = get_spark("prep_job")
    t0 = time.time()
    funnel: dict[str, int] = {}
    docs = spark.read.parquet(args.input)
    funnel["input_docs"] = docs.count()

    # 0. optional text cleanup BEFORE any filtering (C4 ordering: scrub and
    # de-boilerplate first so the quality stats judge the retained text)
    if args.scrub_pii:
        from numalogic_spark.operators.textstats import scrub_pii_expr

        docs = docs.withColumn(args.text_col, scrub_pii_expr(args.text_col))
    if args.boilerplate_min_docs > 0:
        from numalogic_spark.operators.textstats import remove_boilerplate_lines

        cleaned = remove_boilerplate_lines(
            docs, args.text_col, args.id_col, min_docs=args.boilerplate_min_docs
        ).select(F.col("id").alias(args.id_col), "cleaned")
        docs = (
            docs.join(cleaned, args.id_col, "left")
            .withColumn(
                args.text_col,
                F.coalesce(F.col("cleaned"), F.col(args.text_col)),
            )
            .drop("cleaned")
        )

    # 1. quality filter: word count + mean word length bounds (JVM-only)
    stats = text_stats(docs, args.text_col, args.id_col)
    ok = stats.filter(
        (F.col("n_words") >= args.min_words)
        & (F.col("mean_word_len") <= args.max_word_len)
    ).select(args.id_col)
    # persist here: the funnel counts plus the lang/dedup stages would
    # otherwise re-run text_stats over the raw corpus several times
    docs = docs.join(ok, args.id_col, "left_semi").persist()
    funnel["after_quality"] = docs.count()

    # 2. language filter
    if args.langs:
        keep_langs = [s.strip() for s in args.langs.split(",") if s.strip()]
        lids = lang_id(docs, args.text_col, args.id_col)
        keep = lids.filter(F.col("lang_pred").isin(keep_langs)).select(args.id_col)
        docs = docs.join(keep, args.id_col, "left_semi")
    funnel["after_lang"] = docs.count()

    # 3. exact dedup (persist: feeds near-dup pair generation AND the
    # final anti-join AND counts)
    docs = drop_exact_dups(docs, args.text_col, args.id_col).persist()
    funnel["after_exact_dedup"] = docs.count()

    # 4. near-dup pruning: keep each cluster's canonical doc (min id)
    pairs = minhash_lsh_pairs(
        docs, args.text_col, args.id_col, threshold=args.near_threshold
    )
    clusters = near_dup_clusters(pairs)
    drop = clusters.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(args.id_col)
    )
    docs = docs.join(drop, args.id_col, "left_anti").persist()
    funnel["after_near_dedup"] = docs.count()

    # 5. tokenize. Default: byte-level BPE (functions/bpe.py) — distributed
    # word counts + bounded driver merge training, Arrow-batched encode;
    # the vocab is saved as a replayable artifact. --tokenizer hash keeps
    # the legacy whitespace-word→xxhash64 ids (packing is tokenizer-
    # agnostic either way).
    if args.tokenizer == "bpe":
        from numalogic_spark.functions.bpe import BpeVocab, tokenize_corpus, train_bpe

        if args.bpe_vocab:
            vocab = BpeVocab.load_hadoop(spark, args.bpe_vocab)
        else:
            vocab = train_bpe(docs, args.bpe_merges, text_col=args.text_col)
            # through the Hadoop FS API: --output may be s3a/hdfs
            vocab.save_hadoop(spark, args.output.rstrip("/") + ".bpe_vocab.json")
        funnel["bpe_merges"] = len(vocab.merges)
        tokenized = tokenize_corpus(
            docs, vocab, text_col=args.text_col, id_col=args.id_col,
            source_col=args.source_col,
        )
    else:
        tokenized = docs.select(
            args.id_col,
            F.col(args.source_col).alias("source"),
            F.transform(
                F.array_remove(F.split(F.lower(args.text_col), r"\s+"), ""),
                lambda w: F.xxhash64(w),
            ).alias("tokens"),
        ).withColumn("n_tok", F.size("tokens"))
    funnel["total_tokens"] = tokenized.select(F.sum("n_tok")).collect()[0][0] or 0

    # 6. pack into fixed-size training sequences (+ optional deterministic
    # training order: shard + within-shard rank from the portable hash)
    packs = pack_tokens(tokenized, args.max_tokens, id_col=args.id_col)
    if args.shards:
        from numalogic_spark.operators.sampling import training_order

        packs = training_order(packs, args.shards, ["source", "pack_id"])
    packs.write.mode("overwrite").partitionBy("source").parquet(args.output)
    out = spark.read.parquet(args.output)
    funnel["packs"] = out.count()
    funnel["packed_tokens"] = out.select(F.sum("n_tok")).collect()[0][0] or 0
    funnel["wall_sec"] = round(time.time() - t0, 2)

    line = json.dumps(funnel)
    if args.report:
        with open(args.report, "w") as f:
            f.write(line + "\n")
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
