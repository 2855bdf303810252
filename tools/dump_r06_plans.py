"""Dump `.explain("formatted")` for every round-6-touched query/operator
to <outdir>/<name>_<suffix>.txt. Usage:
    python tools/dump_r06_plans.py <outdir> <suffix>
Run from the tree whose plans you want (round-5 worktree → before,
current tree → after)."""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from numalogic_spark.session import get_spark

OUT = sys.argv[1]
SUFFIX = sys.argv[2]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def grab(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(
        "plans_r06", cores=4, shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    import __spark_entry__ as E

    qs = E.queries()
    targets = [
        "semdedup_prune_embeddings",
        "dup_ngram_spans_documents",
        "lm_perplexity_documents",
        "nb_classify_documents",
        "hll_distinct_events",
        "asof_join_events",
        "interval_overlap_join_events",
        "sliding_window_stats",
        "sliding_window_salted_stats",
        "pack_greedy_documents",
        "simhash_near_dup_documents",
        "minhash_near_dup_documents",
    ]
    for name in targets:
        try:
            txt = grab(qs[name](spark, SF_DIR))
        except Exception as ex:  # noqa: BLE001
            txt = f"ERROR: {ex}"
        with open(os.path.join(OUT, f"{name}_{SUFFIX}.txt"), "w") as f:
            f.write(txt)
        print("dumped", name, flush=True)

    # lm / dup_ngram return eagerly-checkpointed frames whose explain is
    # just the checkpoint scan — re-dump with lineage kept
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    from numalogic_spark.operators.lm import bigram_perplexity

    try:
        with open(
            os.path.join(OUT, f"lm_perplexity_lineage_{SUFFIX}.txt"), "w"
        ) as f:
            f.write(grab(bigram_perplexity(docs, vocab_size=20000, checkpoint=False)))
    except Exception as ex:  # noqa: BLE001
        print("lm lineage dump skipped:", ex, flush=True)
    from numalogic_spark.operators.dedup import duplicate_ngram_spans

    try:
        with open(
            os.path.join(OUT, f"dup_ngram_spans_lineage_{SUFFIX}.txt"), "w"
        ) as f:
            f.write(
                grab(
                    duplicate_ngram_spans(
                        docs, n=8, min_docs=2, hash_mode="md5", checkpoint=False
                    )
                )
            )
    except TypeError:
        print("dup_ngram lineage dump skipped (no checkpoint kwarg)", flush=True)

    # operator-level bench rows (no declared query)
    from numalogic_spark.operators.tokens import pack_greedy_no_split
    from numalogic_spark.operators.tsfeatures import ccf_pairs
    from numalogic_spark.operators.windows import sliding_windows, sliding_windows_salted

    tok = spark.range(10_000).select(
        F.lit("s0").alias("source"),
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        (F.col("id") % 2000 + 16).alias("n_tok"),
    )
    ops = {
        "pack_greedy_skewed_seq": pack_greedy_no_split(tok, 2048),
        "pack_greedy_skewed_salted": pack_greedy_no_split(
            tok, 2048, sub_salt=1000, chunk_by="range"
        ),
    }
    one = spark.range(100_000).select(
        F.lit("s0").alias("source"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("event_ts"),
        F.sin(F.col("id") * 0.001).cast("float").alias("value"),
    )
    ops["windows_single_series_seq"] = sliding_windows(one, ["value"], 12, 4)
    ops["windows_single_series_salted"] = sliding_windows_salted(
        one, ["value"], 12, 4, chunk_rows=15_625
    )
    grid = spark.range(50 * 720).select(
        F.concat(F.lit("src"), (F.col("id") % 50)).alias("source"),
        ((F.col("id") / 50).cast("long") * 3600).alias("bucket_s"),
        (F.sin(F.col("id") * 0.01) * 10).alias("val"),
    )
    chain = [(f"src{i}", f"src{i + 1}") for i in range(49)]
    ops["ccf_pairs_bounded"] = ccf_pairs(grid, lags=(-2, -1, 0, 1, 2), pairs=chain)
    for name, df in ops.items():
        with open(os.path.join(OUT, f"{name}_{SUFFIX}.txt"), "w") as f:
            f.write(grab(df))
        print("dumped", name, flush=True)


if __name__ == "__main__":
    main()
