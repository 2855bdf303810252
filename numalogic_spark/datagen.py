"""Deterministic synthetic token-sequence table generator.

Produces the engine's source table per BASELINE.json input_hint:
    (doc_id: string, tokens: array<int32>, n_tok: int32, source: string)
plus derived ``event_ts: timestamp`` (FIXTURES.md §1).

Every column is a pure function of the global row id, so generation is
embarrassingly parallel: the Spark path is ``spark.range(n)`` →
``mapInPandas`` over the same numpy kernel the pandas path uses — both
produce bit-identical rows, which is what lets the pandas oracle and the
Spark engine consume *the same* input.

Randomness is counter-based (splitmix64 streams), not stateful RNG, so any
row can be regenerated independently — the distributed analog of the
reference's per-call seeded rng (/root/reference/numalogic/synthetic/
timeseries.py:74) and sparsity injector (synthetic/sparsity.py:16-43).

Layout: sources are assigned by a fixed integer-weight cycle so that the
per-source sequence index is a closed form of the global id (no shuffle
needed to number rows within a source). Source src_000 is hot (~30% of
rows) to exercise skew handling; the rest follow a Zipf-ish tail.
Gaps: seeded runs of 2–50 consecutive per-source indices are dropped
(timestamps keep counting), exercising linear-interpolation gap-fill.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

SEED = 42
VOCAB = 50257
N_TOK_MIN = 16
N_TOK_MAX = 2048  # exclusive
EPOCH0_S = 1704067200  # 2024-01-01T00:00:00Z
STEPS_S = np.array([1, 5, 30, 60], dtype=np.int64)

TOKEN_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("event_ts", T.TimestampType(), False),
    ]
)

_U64 = np.uint64


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant mix)."""
    if getattr(x, "dtype", None) != np.uint64:
        x = np.asarray(x).astype(_U64)
    z = x + _U64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    return z ^ (z >> _U64(31))


def _source_weights(n_sources: int) -> np.ndarray:
    """Integer weights per source over one assignment cycle.

    src_000 gets ~30% of the cycle; the remainder is Zipf(1.05) over the
    other sources, apportioned with the largest-remainder method so weights
    are always non-negative and sum exactly (the old max(floor,1) clamp
    drove the hot weight NEGATIVE for n_sources ≳ 700, silently corrupting
    the closed-form index math). The cycle scales with n_sources.
    """
    cycle = max(1000, 4 * n_sources)
    hot = int(cycle * 0.30)
    if n_sources == 1:
        return np.array([cycle], dtype=np.int64)
    k = np.arange(1, n_sources, dtype=np.float64)
    z = 1.0 / np.power(k, 1.05)
    target = z / z.sum() * (cycle - hot)
    rest = np.floor(target).astype(np.int64)
    deficit = (cycle - hot) - int(rest.sum())
    if deficit > 0:  # give the remainder to the largest fractional parts
        order = np.argsort(-(target - rest), kind="stable")[:deficit]
        rest[order] += 1
    w = np.concatenate([[hot], rest]).astype(np.int64)
    assert w.sum() == cycle and (w >= 0).all()
    return w


class TokenGenSpec:
    """Frozen derived constants for a (n_rows, n_sources) generation run."""

    def __init__(self, n_sources: int = 50, seed: int = SEED):
        self.n_sources = n_sources
        self.seed = seed
        self.weights = _source_weights(n_sources)
        self.cycle = int(self.weights.sum())
        self.cum = np.concatenate([[0], np.cumsum(self.weights)])  # len K+1
        # per-source step seconds, seeded by source index
        src_seed = splitmix64(np.arange(n_sources, dtype=np.uint64) ^ _U64(seed))
        self.src_seed = src_seed
        self.step_s = STEPS_S[(src_seed % _U64(4)).astype(np.int64)]
        self.names = np.array([f"src_{i:03d}" for i in range(n_sources)])


def _rows_for_ids(gid: np.ndarray, spec: TokenGenSpec) -> pd.DataFrame:
    """Pure kernel: global ids → token-table rows (gap rows dropped)."""
    gid = gid.astype(np.int64)
    c, r = np.divmod(gid, spec.cycle)
    src = np.searchsorted(spec.cum, r, side="right") - 1  # source index
    idx = c * spec.weights[src] + (r - spec.cum[src])  # per-source seq index

    # gap injection: per 64-index block, sometimes drop a 2-50 run prefix
    block = idx >> 6
    rblk = splitmix64(spec.src_seed[src] ^ splitmix64(block.astype(np.uint64)))
    gap_block = (rblk % _U64(100)) < _U64(12)
    gap_len = (_U64(2) + ((rblk >> _U64(8)) % _U64(49))).astype(np.int64)
    keep = ~(gap_block & ((idx & 63) < gap_len))

    gid, src, idx = gid[keep], src[keep], idx[keep]
    names = spec.names[src]
    doc_id = np.char.add(np.char.add(names, "-"), np.char.zfill(idx.astype(str), 12))

    # row seed ~ hash64(doc_id) ^ seed, realized as a mix of (source, idx)
    row_seed = splitmix64(
        splitmix64(src.astype(np.uint64) ^ _U64(0xD0C5EED)) ^ idx.astype(np.uint64) ^ _U64(spec.seed)
    )
    n_tok = (N_TOK_MIN + (row_seed % _U64(N_TOK_MAX - N_TOK_MIN))).astype(np.int32)

    # flat counter-based token stream: tokens[i][j] = reduce(mix(seed_i + j + 1)).
    # Identity used: seed_i + within + 1 == (seed_i + 1 - offs_i) + flat_pos,
    # so ONE np.repeat + ONE arange covers the whole stream; the mix runs
    # in-place (uint64 wraparound is the intended modular arithmetic) —
    # fresh-allocation page faults, not ALU, dominate at ~10^8 elements.
    # Range reduction via multiply-shift ((h>>32)*VOCAB)>>32: no 64-bit
    # division; bias < 2^-32.
    total = int(n_tok.sum())
    offs = np.concatenate([[0], np.cumsum(n_tok.astype(np.int64))])
    base = row_seed + _U64(1) - offs[:-1].astype(np.uint64)
    z = np.repeat(base, n_tok)
    z += np.arange(total, dtype=np.uint64)
    t = np.empty_like(z)
    z += _U64(0x9E3779B97F4A7C15)
    np.right_shift(z, _U64(30), out=t); z ^= t; z *= _U64(0xBF58476D1CE4E5B9)
    np.right_shift(z, _U64(27), out=t); z ^= t; z *= _U64(0x94D049BB133111EB)
    np.right_shift(z, _U64(31), out=t); z ^= t
    z >>= _U64(32); z *= _U64(VOCAB); z >>= _U64(32)
    flat = z.astype(np.int32)
    tokens = np.split(flat, offs[1:-1]) if len(n_tok) else []

    ts_s = EPOCH0_S + idx * spec.step_s[src]
    return pd.DataFrame(
        {
            "doc_id": doc_id,
            "tokens": tokens,
            "n_tok": n_tok,
            "source": names,
            "event_ts": pd.to_datetime(ts_s, unit="s"),
        }
    )


def gen_tokens_pandas(n_rows: int, n_sources: int = 50, seed: int = SEED) -> pd.DataFrame:
    """Single-process generation (tests / oracle input)."""
    spec = TokenGenSpec(n_sources, seed)
    return _rows_for_ids(np.arange(n_rows, dtype=np.int64), spec)


def gen_tokens_spark(
    spark: SparkSession, n_rows: int, n_sources: int = 50, seed: int = SEED, partitions: int | None = None
) -> DataFrame:
    """Distributed generation — identical rows to :func:`gen_tokens_pandas`.

    spark.range gives each task a contiguous id slice; the kernel is a pure
    function of the id, so this scales to any cluster width with zero
    shuffle (the 100-TB datagen story: one narrow stage).
    """
    spec = TokenGenSpec(n_sources, seed)
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)

    # Sub-chunk each incoming id batch: the input rows are 8-byte ids, so
    # neither Arrow batch cap protects this kernel's memory — the byte cap
    # (spark.sql.execution.arrow.maxBytesPerBatch, input-side) sees ~800 KB
    # where the kernel then materializes ~4 KB of tokens PER ID (a 100k-id
    # batch peaked at ~4 GB transient per worker and the kernel OOM-killer
    # shot 32 parallel workers). Chunking inside the kernel bounds the
    # expansion at ~40 MB per yield regardless of the session's record cap;
    # chunks are consecutive slices yielded in order, so the row stream per
    # partition is byte-identical to the unchunked form.
    CHUNK_IDS = 10_000

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            for lo in range(0, len(ids), CHUNK_IDS):
                out = _rows_for_ids(ids[lo : lo + CHUNK_IDS], spec)
                if len(out):
                    yield out

    return spark.range(0, n_rows, numPartitions=partitions).mapInPandas(gen, TOKEN_SCHEMA)


def write_tokens(
    spark: SparkSession, path: str, n_rows: int, n_sources: int = 50, seed: int = SEED
) -> None:
    """Materialize the token table as parquet (bench/test fixture cache)."""
    gen_tokens_spark(spark, n_rows, n_sources, seed).write.mode("overwrite").parquet(path)
