"""Trainer-message dedup gate — the reference's retrain-frequency /
in-flight / insufficient-data acknowledgment protocol as a distributed
operator.

The reference serializes training triggers through Redis-backed
per-series metadata (`TrainMsgDeduplicator`,
/root/reference/numalogic/udfs/tools.py:220-370): `ack_read` admits a
train request only when (checked in this order)

  1. no insufficient-data backoff is active — after a fetch found
     `train_records < min_train_records` rows, retries are deferred by
     (min_train_records − train_records) · data_freq seconds from the
     last admitted read (tools.py:312-330);
  2. no read is in flight — another process admitted a read less than
     `retry` seconds ago (tools.py:332-335);
  3. the model is stale — the last successful train (`ack_train`) is at
     least `retrain_freq` hours old (tools.py:337-343);

and then stamps the read timestamp. `ack_train` stamps the train
timestamp; `ack_insufficient_data` stores the observed record count.
Nothing ever clears `_msg_train_records` — faithful here too.

Here the same protocol is a fold over a per-series EVENT-TIME-ordered
message log — deterministic and replayable, where the reference uses
wall-clock `time.time()` (an external effect this engine deliberately
avoids; see synthetic.py for the same discipline). Three event kinds:

  kind = "read"          → a train request; emits a decision row
  kind = "train_done"    → ack_train (stamps train_ts)
  kind = "insufficient"  → ack_insufficient_data (stores train_records)

Two physical forms share ONE fold (`_fold_events`):
  * `batch_trainer_gate` — applyInPandas over the full history, one
    sort per series (backtests, replays);
  * `streaming_trainer_gate` — applyInPandasWithState keyed by series,
    state = (read_ts, train_ts, train_records) — three scalars per
    series, the O(1)-state shape that survives unbounded streams.
    Batch ≡ stream is pytest-gated (tests/test_streaming.py pattern).

Scale shape: state is 3 longs per series; each micro-batch shuffles
only its own rows on the series key. Micro-batch rows for one key are
folded in event-time order; ACROSS micro-batches the protocol assumes
the stream is per-key time-ordered (true of the reference's pipeline,
where one vertex owns a key) — a late read that time-travels behind an
already-admitted read would be admitted twice there as well (two
processes racing `hset` have the same window).
"""

from __future__ import annotations

from typing import Iterable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

KIND_READ = "read"
KIND_TRAIN_DONE = "train_done"
KIND_INSUFFICIENT = "insufficient"

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("ts_s", T.LongType()),
        T.StructField("do_train", T.BooleanType()),
        T.StructField("reason", T.StringType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("read_ts", T.LongType()),
        T.StructField("train_ts", T.LongType()),
        T.StructField("train_records", T.LongType()),
    ]
)


def _fold_events(
    events: pd.DataFrame,
    state: tuple[Optional[int], Optional[int], Optional[int]],
    retrain_freq_h: int,
    retry_s: int,
    min_train_records: int,
    data_freq_s: int,
) -> tuple[pd.DataFrame, tuple[Optional[int], Optional[int], Optional[int]]]:
    """The ack protocol over time-ordered events for ONE series; returns
    (decision rows for 'read' events, final state). Check order matches
    ack_read exactly: backoff → in-flight → retrain-freq → admit."""
    read_ts, train_ts, train_records = state
    out_ts: list[int] = []
    out_ok: list[bool] = []
    out_why: list[str] = []
    # malformed events must not poison the fold (in streaming an exception
    # fails EVERY retry of the micro-batch, wedging the query on one bad
    # row): rows with a null/negative timestamp or null kind are dropped —
    # event time is non-negative epoch seconds by contract (negative
    # values would also collide with the streaming state's -1 "unset"
    # sentinel); a null train_records on an 'insufficient' event counts
    # as 0 records (the most conservative backoff)
    events = events[
        events["ts_s"].notna() & (events["ts_s"] >= 0) & events["kind"].notna()
    ]
    for ts, kind, recs in zip(
        events["ts_s"].astype("int64"),
        events["kind"],
        events["train_records"],
    ):
        ts = int(ts)
        if kind == KIND_TRAIN_DONE:
            train_ts = ts
            continue
        if kind == KIND_INSUFFICIENT:
            train_records = 0 if pd.isna(recs) else int(recs)
            continue
        if kind != KIND_READ:
            # unknown kinds are IGNORED (no decision, no state change) —
            # falling through to the read path would let a typo'd event
            # admit/block trainers silently
            continue
        if (
            train_records is not None
            and read_ts is not None
            and ts - read_ts
            < (min_train_records - train_records) * data_freq_s
        ):
            ok, why = False, "insufficient_backoff"
        elif read_ts is not None and ts - read_ts < retry_s:
            ok, why = False, "in_flight"
        elif train_ts is not None and ts - train_ts < retrain_freq_h * 3600:
            ok, why = False, "retrain_freq"
        else:
            ok, why = True, "admitted"
            read_ts = ts
        out_ts.append(ts)
        out_ok.append(ok)
        out_why.append(why)
    dec = pd.DataFrame({"ts_s": out_ts, "do_train": out_ok, "reason": out_why})
    return dec, (read_ts, train_ts, train_records)


def batch_trainer_gate(
    df: DataFrame,
    source_col: str = "source",
    retrain_freq_h: int = 24,
    retry_s: int = 600,
    min_train_records: int = 180,
    data_freq_s: int = 60,
) -> DataFrame:
    """Replay the gate over a full event log: one decision row per 'read'
    event. Input columns: source, ts_s (bigint), kind, train_records
    (nullable bigint). Ties at equal ts_s fold in (kind, train_records)
    order for determinism."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["ts_s", "kind", "train_records"], kind="mergesort"
        )
        dec, _ = _fold_events(
            pdf, (None, None, None),
            retrain_freq_h, retry_s, min_train_records, data_freq_s,
        )
        # the select below aliased the key column to "source" — indexing
        # pdf[source_col] would KeyError for any non-default source_col
        dec.insert(0, "source", pdf["source"].iloc[0] if len(pdf) else "")
        return dec

    return (
        df.select(
            F.col(source_col).alias("source"),
            F.col("ts_s").cast("long").alias("ts_s"),
            "kind",
            F.col("train_records").cast("long").alias("train_records"),
        )
        .groupBy("source")
        .applyInPandas(fn, _OUT_SCHEMA)
    )


def streaming_trainer_gate(
    stream_df: DataFrame,
    source_col: str = "source",
    retrain_freq_h: int = 24,
    retry_s: int = 600,
    min_train_records: int = 180,
    data_freq_s: int = 60,
    state_ttl: str | None = None,
) -> DataFrame:
    """Stateful streaming form: per-series (read_ts, train_ts,
    train_records) carried across micro-batches. `state_ttl` expires idle
    series state (bounded state for unbounded key universes; an expired
    series starts from a clean slate, i.e. its next read is admitted —
    the conservative direction for a trainer)."""

    def fn(
        key, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        if state.hasTimedOut:
            state.remove()
            return
        whole = pd.concat(list(pdfs), ignore_index=True)
        whole = whole.sort_values(
            ["ts_s", "kind", "train_records"], kind="mergesort"
        )
        prev = state.get if state.exists else (None, None, None)
        prev = tuple(None if v is not None and v < 0 else v for v in prev)
        dec, (r, t, n) = _fold_events(
            whole, prev,
            retrain_freq_h, retry_s, min_train_records, data_freq_s,
        )
        # GroupState tuples are typed non-null longs; -1 encodes "unset"
        state.update((
            -1 if r is None else int(r),
            -1 if t is None else int(t),
            -1 if n is None else int(n),
        ))
        if state_ttl is not None:
            state.setTimeoutDuration(state_ttl)
        if len(dec):
            dec.insert(0, "source", source)
            yield dec

    keyed = stream_df.select(
        F.col(source_col).alias("source"),
        F.col("ts_s").cast("long").alias("ts_s"),
        "kind",
        F.col("train_records").cast("long").alias("train_records"),
    )
    return keyed.groupBy("source").applyInPandasWithState(
        fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if state_ttl is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
