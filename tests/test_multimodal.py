import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from numalogic_spark.operators.multimodal import (
    FEATURE_DIM,
    attach_media,
    decode_stub,
    extract_features,
    frame_sample_plan,
)


@pytest.fixture(scope="module")
def media(spark):
    pdf = pd.DataFrame({"doc_id": [f"m{i}" for i in range(10)], "text": [f"payload {i}" for i in range(10)]})
    return attach_media(spark.createDataFrame(pdf))


def test_media_schema_and_features(spark, media):
    feats = extract_features(media, encoder="fake").orderBy("doc_id").toPandas()
    assert len(feats) == 10
    assert all(len(v) == FEATURE_DIM for v in feats["features"])
    assert (feats["payload_bytes"] == [len(f"payload {i}") for i in range(10)]).all()
    # deterministic: same payload → same features across runs
    again = extract_features(media, encoder="fake").orderBy("doc_id").toPandas()
    for a, b in zip(feats["features"], again["features"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # features are normalized to [0, 1]
    allv = np.concatenate([np.asarray(v) for v in feats["features"]])
    assert allv.min() >= 0.0 and allv.max() <= 1.0


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_stub(b"\x00", "image")


def _ppm_bytes(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return b"P6\n# test\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def _bmp_bytes(img: np.ndarray) -> bytes:
    import struct

    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = b""
    for r in range(h - 1, -1, -1):  # bottom-up, BGR
        row = img[r, :, ::-1].astype(np.uint8).tobytes()
        rows += row + b"\x00" * (stride - len(row))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(rows), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    return header + info + rows


def _wav_bytes(samples: np.ndarray, rate: int = 8000) -> bytes:
    import struct

    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_real_decoders_roundtrip():
    from numalogic_spark.operators.multimodal import (
        decode_bmp,
        decode_ppm,
        decode_wav_pcm16,
        image_features,
        resize_nearest,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_ppm(_ppm_bytes(img)), img)
    np.testing.assert_array_equal(decode_bmp(_bmp_bytes(img)), img)
    samples = (np.sin(np.arange(800) * 0.1) * 20000).astype(np.int16)
    dec, rate = decode_wav_pcm16(_wav_bytes(samples))
    assert rate == 8000
    np.testing.assert_array_equal(dec, samples)
    small = resize_nearest(img, 2, 2)
    assert small.shape == (2, 2, 3)
    f = image_features(img)
    assert f.shape == (FEATURE_DIM,) and np.isfinite(f).all()


def test_real_feature_extraction_spark(spark):
    """End-to-end: PPM image + WAV audio payloads through the mapInPandas
    kernel with the REAL decoder, verified against the local decode."""
    from numalogic_spark.operators.multimodal import decode_features

    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    wav = (np.sin(np.arange(400) * 0.05) * 15000).astype(np.int16)
    rows = [
        ("img1", "image", bytearray(_ppm_bytes(img)), ("image/ppm", 8, 8, None)),
        ("aud1", "audio", bytearray(_wav_bytes(wav)), ("audio/wav", None, None, 50)),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, modality string, payload binary, "
        "meta struct<mime: string, width: int, height: int, duration_ms: int>",
    )
    got = extract_features(df, encoder="real").orderBy("doc_id").toPandas()
    assert len(got) == 2
    exp_audio = decode_features(_wav_bytes(wav), "audio/wav")
    exp_img = decode_features(_ppm_bytes(img), "image/ppm")
    np.testing.assert_allclose(np.asarray(got["features"][0]), exp_audio, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got["features"][1]), exp_img, rtol=1e-6)


def test_frame_sample_plan(spark):
    pdf = pd.DataFrame({"doc_id": ["v1"], "text": ["vid"]})
    media = attach_media(spark.createDataFrame(pdf)).withColumn(
        "meta",
        F.struct(
            F.lit("video/fake").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(5000).cast("int").alias("duration_ms"),
        ),
    )
    frames = frame_sample_plan(media, every_ms=1000).toPandas()
    assert frames["frame_ms"].tolist() == [0, 1000, 2000, 3000, 4000, 5000]
