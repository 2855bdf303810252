"""Streaming exact deduplication — stateful first-seen-wins.

The batch layer dedups a corpus with one hash-groupBy
(operators/dedup.exact_dedup); a TRAINING-DATA INGEST stream needs the
same guarantee incrementally: of all documents sharing a text hash, only
the first to ARRIVE passes through, whatever micro-batch the duplicates
land in. State is one tiny record per distinct hash (first doc_id, seen
count), partitioned by the hash itself — exactly the key the stream
shuffles on, so a hot duplicated document never concentrates on one task
beyond its own hash bucket.

At 10^12-document scale the state store bounds memory per executor; the
optional processing-time TTL (``state_ttl``) expires hashes not seen for
the configured duration — the streaming analog of a sliding dedup window
(trades cross-window duplicates for bounded state, the standard choice for
unbounded corpora).

The reference has no streaming dedup (its Numaflow vertices are stateless
per-payload, SURVEY §2.9); this is new capability required by the
training-data brief.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_DEDUP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("first_id", T.StringType()),
        T.StructField("n_seen", T.LongType()),
    ]
)

_DEDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("text_hash", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("event_ts", T.TimestampType()),
        T.StructField("n_dups_in_batch", T.LongType()),
    ]
)


def streaming_exact_dedup(
    stream_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "event_ts",
    state_ttl: str | None = None,
) -> DataFrame:
    """First-seen-wins exact dedup across micro-batches.

    Emits one row per NEWLY seen text hash (the earliest (ts, id) row of
    its first batch — deterministic within a batch); later occurrences in
    the same or any later micro-batch are absorbed into the state's seen
    count. Equivalent to batch ``drop_exact_dups`` over the concatenated
    stream when arrival order matches the batch keeper order (verified in
    tests/test_streaming.py).

    ``state_ttl``: e.g. ``"30 minutes"`` — expire a hash's state after
    that much processing time without new occurrences (bounded state for
    unbounded corpora; duplicates farther apart than the TTL pass again).
    """

    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (text_hash,) = key
        if state.hasTimedOut:
            state.remove()
            return
        whole = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            first_id, n_seen = state.get
            out = whole.iloc[0:0]
        else:
            whole = whole.sort_values([ts_col, id_col], kind="mergesort")
            first_id, n_seen = whole.iloc[0][id_col], 0
            out = whole.iloc[0:1]
        n_seen += len(whole)
        state.update((str(first_id), int(n_seen)))
        if state_ttl is not None:
            state.setTimeoutDuration(state_ttl)
        if len(out):
            yield pd.DataFrame(
                {
                    "text_hash": text_hash,
                    "doc_id": out[id_col].to_numpy(),
                    "text": out[text_col].to_numpy(),
                    "event_ts": out[ts_col].to_numpy(),
                    "n_dups_in_batch": len(whole),
                }
            )

    keyed = stream_df.withColumn("text_hash", F.md5(F.col(text_col)))
    return keyed.groupBy("text_hash").applyInPandasWithState(
        fn,
        outputStructType=_DEDUP_OUT_SCHEMA,
        stateStructType=_DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if state_ttl is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


# --------------------------------------------------------------------------
# streaming MinHash-LSH near-dup candidates
# --------------------------------------------------------------------------

_LSH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.StringType())),
        T.StructField("sigs", T.ArrayType(T.LongType())),  # flattened, num_hashes per id
    ]
)

_LSH_OUT_SCHEMA = T.StructType(
    [
        T.StructField("id_a", T.StringType()),
        T.StructField("id_b", T.StringType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("est_jaccard", T.DoubleType()),
    ]
)


def streaming_minhash_candidates(
    stream_df,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 60,
    bands: int = 12,
    threshold: float = 0.8,
    est_margin: float = 0.1,
    max_bucket: int = 64,
    state_ttl: str | None = None,
):
    """Incremental near-dup candidate generation: as documents arrive, each
    is banded with the SAME JVM expressions as the batch pipeline
    (char-shingle codes → Carter-Wegman MinHash → band folding), the
    stream shuffles on (band, band-hash), and a stateful kernel keeps each
    bucket's previously-seen (id, signature) list — a new arrival emits a
    candidate pair against every bucket member whose signature-estimated
    Jaccard clears threshold − est_margin.

    Exactly the batch candidate stage of minhash_lsh_pairs, made
    incremental; the (cheap, exact) shingle-Jaccard verification remains a
    batch join over the candidate ids. A pair colliding in several bands
    is emitted once per band — `dropDuplicates(["id_a","id_b"])`
    downstream. State per bucket is capped at ``max_bucket`` signatures
    (beyond it the oldest stay; new ids still emit pairs against stored
    members and against earlier rows of their OWN batch, but two
    post-saturation arrivals in DIFFERENT batches are not paired — the
    recall cost of bounding a hot template bucket's state; raise
    ``max_bucket`` or fall back to the batch pipeline on saturated
    buckets). Re-delivered ids (at-least-once sources) never burn a second
    state slot. ``state_ttl`` expires idle buckets.
    """
    from numalogic_spark.operators.dedup import (
        band_structs_expr,
        char_shingle_codes,
        minhash_signature,
    )

    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be a multiple of bands")
    rows_per_band = num_hashes // bands
    est_floor = max(threshold - est_margin, 0.0)
    k = num_hashes

    slim = stream_df.select(
        F.col(id_col).alias("id"),
        F.explode(
            band_structs_expr(
                minhash_signature(char_shingle_codes(text_col), num_hashes),
                bands,
                rows_per_band,
                include_sig=True,
            )
        ).alias("bb"),
    ).select(
        "id",
        F.col("bb.band").alias("band"),
        F.col("bb.bh").alias("bh"),
        F.col("bb.sig").alias("sig"),
    )

    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        import numpy as np

        band, _bh = key
        if state.hasTimedOut:
            state.remove()
            return
        whole = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            ids, flat = state.get
            ids = list(ids)
            sigs = [np.asarray(flat[i * k : (i + 1) * k], dtype=np.int64) for i in range(len(ids))]
        else:
            ids, sigs = [], []
        out_a, out_b, out_e = [], [], []
        # compare against stored state AND this batch's earlier rows (kept
        # separately): two post-saturation arrivals in one batch still
        # pair with each other even when neither can enter state
        batch_ids: list = []
        batch_sigs: list = []
        for _, row in whole.sort_values("id").iterrows():
            rid = row["id"]
            # at-least-once replay guard, BEFORE any comparison: an id that
            # is already represented (state from an earlier batch, or an
            # earlier duplicate row of this batch) must neither re-compare
            # (its pairs were emitted when it was first seen) nor occupy a
            # second slot — otherwise a later matching row would iterate
            # over both copies and emit the pair twice per band.
            if rid in ids or rid in batch_ids:
                continue
            sig = np.asarray(row["sig"], dtype=np.int64)
            for seen_id, seen_sig in zip(ids + batch_ids, sigs + batch_sigs):
                est = float((sig == seen_sig).sum()) / k
                if est >= est_floor:
                    a, b = sorted((seen_id, rid))
                    out_a.append(a)
                    out_b.append(b)
                    out_e.append(est)
            if len(ids) < max_bucket:
                ids.append(rid)
                sigs.append(sig)
            else:  # post-saturation arrival: visible within this batch only
                batch_ids.append(rid)
                batch_sigs.append(sig)
        state.update((ids, [int(x) for s in sigs for x in s]))
        if state_ttl is not None:
            state.setTimeoutDuration(state_ttl)
        if out_a:
            yield pd.DataFrame(
                {"id_a": out_a, "id_b": out_b, "band": int(band), "est_jaccard": out_e}
            )

    return slim.groupBy("band", "bh").applyInPandasWithState(
        fn,
        outputStructType=_LSH_OUT_SCHEMA,
        stateStructType=_LSH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if state_ttl is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
