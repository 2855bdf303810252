"""Gorilla-style compression kernels (vectorized numpy, Arrow-friendly).

BASELINE.json requires downsampled points stored with Gorilla-style XOR
float encoding and delta-of-delta timestamp compression "implemented as
vectorized Arrow kernels — no per-row Python anywhere". The classic Gorilla
bitstream (Facebook's "Gorilla: A Fast, Scalable, In-Memory Time Series
Database", VLDB 2015) interleaves control and payload bits, which forces
sequential decode. We keep Gorilla's *encodings* (delta-of-delta buckets,
XOR leading-zero/significant-bits) but lay the block out columnarly:

    ts block : [n:u32][first_ts:i64][first_delta:i64]
               [class codes: 3-bit packed][payloads: var-bit packed]
    val block: [n:u32][first_val:f64]
               [zero flags: 1-bit packed][(lz:6,sl:6): 12-bit packed]
               [sig bits: var-bit packed]

Fixed-width control streams + cumsum'd payload offsets make both encode and
decode pure numpy gather/scatter — O(n) with no Python-level loop, exactly
the property needed inside mapInArrow/applyInPandas at 10^12 scale.
Round-trip is bit-exact (tests/test_compression.py).

The reference itself has no compression (Druid handles storage,
SURVEY §4 "Compression" row) — this module is new capability.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame

_U64 = np.uint64

# delta-of-delta bucket classes: (bias, payload_bits); class 0 = dod == 0
_DOD_CLASSES = [(0, 0), (63, 7), (255, 9), (2047, 12), (0, 64)]


# --------------------------------------------------------------------------
# vectorized bit packing
# --------------------------------------------------------------------------

def _pack_varbits(values: np.ndarray, lengths: np.ndarray) -> bytes:
    """Pack values[i]'s low lengths[i] bits, MSB-first, into a byte string."""
    values = values.astype(np.uint64)
    lengths = lengths.astype(np.int64)
    total = int(lengths.sum())
    if total == 0:
        return b""
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    entry = np.repeat(np.arange(len(values)), lengths)
    within = np.arange(total, dtype=np.int64) - np.repeat(offsets, lengths)
    shift = (lengths[entry] - 1 - within).astype(np.uint64)
    bits = ((values[entry] >> shift) & _U64(1)).astype(np.uint8)
    return np.packbits(bits).tobytes()


def _unpack_varbits(buf: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Inverse of _pack_varbits: buf is a uint8 array of the packed bytes."""
    lengths = lengths.astype(np.int64)
    n = len(lengths)
    out = np.zeros(n, dtype=np.uint64)
    total = int(lengths.sum())
    if total == 0:
        return out
    bits = np.unpackbits(buf)[:total].astype(np.uint64)
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    entry = np.repeat(np.arange(n), lengths)
    within = np.arange(total, dtype=np.int64) - np.repeat(offsets, lengths)
    shift = (lengths[entry] - 1 - within).astype(np.uint64)
    contrib = bits << shift
    nz = lengths > 0
    # sum of distinct powers of two == OR; reduceat per entry segment
    seg_starts = offsets[nz]
    out[nz] = np.add.reduceat(contrib, seg_starts) if len(seg_starts) else 0
    return out


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (x > 0): binary search by
    left-shifting the empty top half into oblivion."""
    x = x.astype(np.uint64).copy()
    n = np.zeros(x.shape, dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        mask = x < (_U64(1) << _U64(64 - shift))  # top `shift` bits are zero
        n[mask] += shift
        x[mask] <<= _U64(shift)
    return n


# --------------------------------------------------------------------------
# timestamp codec: delta-of-delta
# --------------------------------------------------------------------------

def encode_timestamps(ts_s: np.ndarray) -> bytes:
    """Encode int64 epoch-second timestamps; delta-of-delta bucketed."""
    ts = np.asarray(ts_s, dtype=np.int64)
    n = len(ts)
    head = np.empty(1, dtype=[("n", "<u4"), ("t0", "<i8"), ("d0", "<i8")])
    head["n"] = n
    head["t0"] = ts[0] if n else 0
    head["d0"] = (ts[1] - ts[0]) if n > 1 else 0
    if n <= 2:
        return head.tobytes()
    deltas = np.diff(ts)
    dod = np.diff(deltas)  # length n-2
    cls = np.full(dod.shape, 4, dtype=np.uint8)
    cls[(dod >= -2047) & (dod <= 2048)] = 3
    cls[(dod >= -255) & (dod <= 256)] = 2
    cls[(dod >= -63) & (dod <= 64)] = 1
    cls[dod == 0] = 0
    bias = np.array([c[0] for c in _DOD_CLASSES], dtype=np.int64)[cls]
    bits = np.array([c[1] for c in _DOD_CLASSES], dtype=np.int64)[cls]
    payload = (dod + bias).astype(np.int64).view(np.uint64)  # two's complement for cls 4
    cls_packed = _pack_varbits(cls.astype(np.uint64), np.full(len(cls), 3))
    pay_packed = _pack_varbits(payload, bits)
    return head.tobytes() + np.array([len(cls_packed)], dtype="<u4").tobytes() + cls_packed + pay_packed


def decode_timestamps(buf: bytes) -> np.ndarray:
    b = np.frombuffer(buf, dtype=np.uint8)
    head = np.frombuffer(b[:20], dtype=[("n", "<u4"), ("t0", "<i8"), ("d0", "<i8")])[0]
    n, t0, d0 = int(head["n"]), int(head["t0"]), int(head["d0"])
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n == 1:
        return np.array([t0], dtype=np.int64)
    if n == 2:
        return np.array([t0, t0 + d0], dtype=np.int64)
    cls_len = int(np.frombuffer(b[20:24], dtype="<u4")[0])
    cls = _unpack_varbits(b[24 : 24 + cls_len], np.full(n - 2, 3)).astype(np.int64)
    bias = np.array([c[0] for c in _DOD_CLASSES], dtype=np.int64)[cls]
    bits = np.array([c[1] for c in _DOD_CLASSES], dtype=np.int64)[cls]
    payload = _unpack_varbits(b[24 + cls_len :], bits)
    # class-4 payloads are full 64-bit two's complement
    dod = np.where(cls == 4, payload.astype(np.uint64).view(np.int64), payload.astype(np.int64) - bias)
    deltas = np.concatenate([[d0], d0 + np.cumsum(dod)])
    return t0 + np.concatenate([[0], np.cumsum(deltas)])


# --------------------------------------------------------------------------
# value codec: XOR floats
# --------------------------------------------------------------------------

def encode_values(vals: np.ndarray) -> bytes:
    """Encode float64 values with XOR-vs-previous leading/significant bits."""
    v = np.ascontiguousarray(np.asarray(vals, dtype=np.float64)).view(np.uint64)
    n = len(v)
    head = np.empty(1, dtype=[("n", "<u4"), ("v0", "<u8")])
    head["n"] = n
    head["v0"] = v[0] if n else 0
    if n <= 1:
        return head.tobytes()
    x = v[1:] ^ v[:-1]
    zero = x == 0
    nz = ~zero
    lz = np.zeros(len(x), dtype=np.int64)
    tz = np.zeros(len(x), dtype=np.int64)
    if nz.any():
        xn = x[nz]
        lz[nz] = _clz64(xn)
        low = xn & (~xn + _U64(1))  # isolate lowest set bit
        tz[nz] = 63 - _clz64(low)
    sl = np.where(nz, 64 - lz - tz, 0)  # significant bits length
    sig = np.where(nz, x >> tz.astype(np.uint64), _U64(0))
    flags = _pack_varbits(nz.astype(np.uint64), np.full(len(x), 1))
    # 12-bit (lz:6, sl-1:6) pairs for nonzero entries only
    meta = ((lz[nz].astype(np.uint64) << _U64(6)) | (sl[nz] - 1).astype(np.uint64))
    meta_packed = _pack_varbits(meta, np.full(int(nz.sum()), 12))
    sig_packed = _pack_varbits(sig[nz], sl[nz])
    lens = np.array([len(flags), len(meta_packed)], dtype="<u4").tobytes()
    return head.tobytes() + lens + flags + meta_packed + sig_packed


def decode_values(buf: bytes) -> np.ndarray:
    b = np.frombuffer(buf, dtype=np.uint8)
    head = np.frombuffer(b[:12], dtype=[("n", "<u4"), ("v0", "<u8")])[0]
    n = int(head["n"])
    if n == 0:
        return np.empty(0, dtype=np.float64)
    v0 = np.uint64(head["v0"])
    if n == 1:
        return np.array([v0], dtype=np.uint64).view(np.float64)
    flags_len, meta_len = np.frombuffer(b[12:20], dtype="<u4")
    p = 20
    flags = _unpack_varbits(b[p : p + int(flags_len)], np.full(n - 1, 1)).astype(bool)
    p += int(flags_len)
    k = int(flags.sum())
    meta = _unpack_varbits(b[p : p + int(meta_len)], np.full(k, 12))
    p += int(meta_len)
    lz = (meta >> _U64(6)).astype(np.int64)
    sl = (meta & _U64(0x3F)).astype(np.int64) + 1
    sig = _unpack_varbits(b[p:], sl)
    tz = 64 - lz - sl
    x = np.zeros(n - 1, dtype=np.uint64)
    x[flags] = sig << tz.astype(np.uint64)
    # XOR prefix-scan: v[i] = v0 ^ x[0] ^ ... ^ x[i-1]; no ufunc.accumulate
    # for XOR on uint64 → do it via reduction over bit-planes? np.bitwise_xor
    # has accumulate:
    vx = np.bitwise_xor.accumulate(x)
    out = np.empty(n, dtype=np.uint64)
    out[0] = v0
    out[1:] = v0 ^ vx
    return out.view(np.float64)


# --------------------------------------------------------------------------
# Spark integration: compress tier tables into per-(source, chunk) blocks
# --------------------------------------------------------------------------

BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("tier", T.StringType()),
        T.StructField("chunk_id", T.LongType()),
        T.StructField("n_points", T.IntegerType()),
        T.StructField("min_ts", T.TimestampType()),
        T.StructField("max_ts", T.TimestampType()),
        T.StructField("ts_block", T.BinaryType()),
        T.StructField("val_block", T.BinaryType()),
    ]
)

CHUNK_POINTS = 4096


def compress_tier(
    tier_df: DataFrame,
    value_col: str = "n_tok_mean",
    extra_group_cols: list[str] | None = None,
) -> DataFrame:
    """Tier table → compressed (source, tier, chunk) blocks.

    One applyInPandas over (source, tier, *extra_group_cols); each group's
    bucket timeline is chunked to ≤4096 points and encoded with the two
    codecs above. ``extra_group_cols`` (string columns, e.g. a date
    partition key) reset chunk boundaries per extra group and pass through
    to the output — ONE shuffle covers every group, which is how the
    incremental path compresses many touched dates in a single pass.
    """
    extra_group_cols = extra_group_cols or []
    out_schema = T.StructType(
        BLOCK_SCHEMA.fields
        + [T.StructField(c, T.StringType()) for c in extra_group_cols]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_ts", kind="mergesort")
        ts = (pdf["bucket_ts"].astype("datetime64[ns]").astype("int64") // 10**9).to_numpy()
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        rows = []
        for c in range(0, len(pdf), CHUNK_POINTS):
            t, v = ts[c : c + CHUNK_POINTS], vals[c : c + CHUNK_POINTS]
            rows.append(
                {
                    "source": pdf["source"].iloc[0],
                    "tier": pdf["tier"].iloc[0],
                    "chunk_id": c // CHUNK_POINTS,
                    "n_points": len(t),
                    "min_ts": pd.Timestamp(t[0], unit="s"),
                    "max_ts": pd.Timestamp(t[-1], unit="s"),
                    "ts_block": encode_timestamps(t),
                    "val_block": encode_values(v),
                    **{c: pdf[c].iloc[0] for c in extra_group_cols},
                }
            )
        return pd.DataFrame(rows)

    return tier_df.groupBy("source", "tier", *extra_group_cols).applyInPandas(
        kernel, out_schema
    )


POINT_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("tier", T.StringType()),
        T.StructField("bucket_ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def decompress_blocks(blocks_df: DataFrame) -> DataFrame:
    """Blocks → (source, tier, bucket_ts, value) points (exact round-trip).

    Each block decodes independently, so this is mapInPandas — zero shuffle
    (a groupBy-based kernel would exchange the whole compressed dataset for
    nothing)."""

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            outs = []
            for src, tier, tsb, valb in zip(
                pdf["source"], pdf["tier"], pdf["ts_block"], pdf["val_block"]
            ):
                ts = decode_timestamps(bytes(tsb))
                vals = decode_values(bytes(valb))
                outs.append(
                    pd.DataFrame(
                        {
                            "source": src,
                            "tier": tier,
                            "bucket_ts": pd.to_datetime(ts, unit="s"),
                            "value": vals,
                        }
                    )
                )
            yield pd.concat(outs, ignore_index=True)

    return blocks_df.select("source", "tier", "ts_block", "val_block").mapInPandas(
        kernel, POINT_SCHEMA
    )
