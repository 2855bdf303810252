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
