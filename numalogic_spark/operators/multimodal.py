"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video are treated as `binary` columns with a metadata struct;
decode/feature-extraction run as Arrow-batched kernels over mapInPandas.
The actual media decode is STUBBED (codec libraries are not available in
this container): `decode_stub` raises NotImplementedError unless
`fake=True`, in which case it produces deterministic hash-derived features
so the Spark-side plumbing — schema, batching, partitioning, UDF signature
— is real and testable end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("payload_bytes", T.IntegerType(), False),
        T.StructField("features", T.ArrayType(T.FloatType(), False), False),
    ]
)


def attach_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Test fixture: wrap each doc's text bytes as a fake media payload."""
    return df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.lit("image").alias("modality"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_features(payloads: pd.Series) -> list[np.ndarray]:
    """Deterministic stand-in for a real encoder: sha256 → 16 floats."""
    out = []
    for p in payloads:
        h = hashlib.sha256(bytes(p)).digest()
        v = np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
        out.append(v / np.float32(65535.0))
    return out


def decode_stub(payload: bytes, modality: str):
    """Real media decode would go here (PIL/torchaudio/ffmpeg). Not
    available in this environment — see module docstring."""
    raise NotImplementedError(
        f"media decode for {modality} requires codec libraries not present in this container"
    )


def extract_features(media_df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, fixed-dim float
    vectors out. Batch shape and schema are the real contract; swap
    `_fake_features` for a real encoder on a cluster with codecs."""

    def kernel(batches):
        for pdf in batches:
            if not fake:
                decode_stub(b"", str(pdf["modality"].iloc[0]) if len(pdf) else "unknown")
            if len(pdf) == 0:
                continue
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "payload_bytes": pdf["payload"].map(len).astype("int32"),
                    "features": _fake_features(pdf["payload"]),
                }
            )

    return media_df.mapInPandas(kernel, FEATURE_SCHEMA)


def frame_sample_plan(media_df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (doc, frame_ts) via
    sequence+explode on metadata duration — the decode of each frame is the
    stubbed step; the fan-out and partitioning are real."""
    return media_df.filter(F.col("meta.duration_ms").isNotNull()).select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
        ).alias("frame_ms"),
    )
