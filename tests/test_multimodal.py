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


# ---------------------------------------------------------------------------
# PNG decode (VERDICT.md round-2 task 5): encoder implemented here from the
# PNG spec, independently of the decoder under test.
# ---------------------------------------------------------------------------

import struct as _struct
import zlib as _zlib


def _png_chunk(cid: bytes, body: bytes) -> bytes:
    return (
        _struct.pack(">I", len(body)) + cid + body
        + _struct.pack(">I", _zlib.crc32(cid + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(img: np.ndarray, filter_type: int, ctype: int = 2,
               palette: np.ndarray | None = None) -> bytes:
    """Minimal spec-faithful PNG writer: every row uses `filter_type`."""
    h, w = img.shape[:2]
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    flat = img.reshape(h, w * ch).astype(np.int32)
    lines = []
    prev = np.zeros(w * ch, dtype=np.int32)
    for r in range(h):
        cur = flat[r]
        if filter_type == 0:
            out = cur
        elif filter_type == 1:
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            out = (cur - left) & 255
        elif filter_type == 2:
            out = (cur - prev) & 255
        elif filter_type == 3:
            out = np.empty_like(cur)
            for x in range(w * ch):
                left = cur[x - ch] if x >= ch else 0
                out[x] = (cur[x] - ((left + prev[x]) >> 1)) & 255
        elif filter_type == 4:
            out = np.empty_like(cur)
            for x in range(w * ch):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                out[x] = (cur[x] - _paeth(a, b, c)) & 255
        lines.append(bytes([filter_type]) + bytes(out.astype(np.uint8)))
        prev = cur
    ihdr = _struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    chunks = [_png_chunk(b"IHDR", ihdr)]
    if ctype == 3:
        chunks.append(_png_chunk(b"PLTE", bytes(palette.astype(np.uint8).reshape(-1))))
    chunks.append(_png_chunk(b"IDAT", _zlib.compress(b"".join(lines))))
    chunks.append(_png_chunk(b"IEND", b""))
    return b"\x89PNG\r\n\x1a\n" + b"".join(chunks)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters(filter_type):
    from numalogic_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(10 + filter_type)
    img = rng.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)
    got = decode_png(encode_png(img, filter_type, ctype=2))
    np.testing.assert_array_equal(got, img)


def test_png_color_types():
    from numalogic_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(77)
    # grayscale -> replicated channels
    g = rng.integers(0, 256, size=(6, 5, 1), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_png(encode_png(g, 4, ctype=0)), np.repeat(g, 3, axis=2)
    )
    # gray+alpha -> alpha dropped
    ga = rng.integers(0, 256, size=(6, 5, 2), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_png(encode_png(ga, 1, ctype=4)), np.repeat(ga[:, :, :1], 3, axis=2)
    )
    # RGBA -> alpha dropped
    rgba = rng.integers(0, 256, size=(4, 7, 4), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_png(encode_png(rgba, 3, ctype=6)), rgba[:, :, :3]
    )
    # palette
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(8, 8, 1), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_png(encode_png(idx, 2, ctype=3, palette=pal)), pal[idx[:, :, 0]]
    )


def test_png_rejects_malformed():
    from numalogic_spark.operators.multimodal import decode_png

    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JFIF....")
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    good = encode_png(img, 0)
    with pytest.raises(ValueError):
        decode_png(good[:40])  # truncated: missing IDAT


def test_png_features_flow_through_spark(spark):
    """PNG payloads run the REAL encoder path end-to-end in extract_features."""
    from numalogic_spark.operators.multimodal import (
        decode_png,
        extract_features,
        image_features,
    )

    rng = np.random.default_rng(5)
    rows = []
    for i, f in enumerate([0, 1, 2, 3, 4]):
        img = rng.integers(0, 256, size=(16, 12, 3), dtype=np.uint8)
        rows.append(
            {
                "doc_id": f"png{i}",
                "modality": "image",
                "payload": bytearray(encode_png(img, f)),
                "meta": {"mime": "image/png", "width": 12, "height": 16,
                         "duration_ms": None},
            }
        )
    from numalogic_spark.operators.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame(pd.DataFrame(rows), MEDIA_SCHEMA)
    got = {r["doc_id"]: np.array(r["features"]) for r in extract_features(df).collect()}
    for i, row in enumerate(rows):
        exp = image_features(decode_png(bytes(row["payload"])))
        np.testing.assert_allclose(got[f"png{i}"], exp, rtol=1e-6)


def test_jpeg_features_flow_through_spark(spark):
    """JPEG payloads run the REAL decoder end-to-end in extract_features."""
    from tests.test_jpeg import encode_jpeg

    from numalogic_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        image_features,
    )
    from numalogic_spark.operators.jpeg import decode_jpeg

    yy, xx = np.mgrid[0:24, 0:32]
    rows = []
    for i, sub in enumerate(["444", "420"]):
        img = np.stack(
            [128 + 70 * np.sin(xx / (7 + i)), 128 + 50 * np.cos(yy / 6.0),
             128 + 60 * np.sin((xx + yy) / 9.0)], axis=2
        ).clip(0, 255).astype(np.uint8)
        rows.append(
            {
                "doc_id": f"jpg{i}",
                "modality": "image",
                "payload": bytearray(encode_jpeg(img, subsample=sub)),
                "meta": {"mime": "image/jpeg", "width": 32, "height": 24,
                         "duration_ms": None},
            }
        )
    df = spark.createDataFrame(pd.DataFrame(rows), MEDIA_SCHEMA)
    got = {r["doc_id"]: np.array(r["features"]) for r in extract_features(df).collect()}
    for i, row in enumerate(rows):
        exp = image_features(decode_jpeg(bytes(row["payload"])))
        np.testing.assert_allclose(got[f"jpg{i}"], exp, rtol=1e-6)


# ---------------------------------------------------------------------------
# uncompressed AVI (video modality): writer built from the RIFF spec,
# independent of the decoder under test.
# ---------------------------------------------------------------------------


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return cid + _struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi(frames, fps=10) -> bytes:
    """Minimal spec-faithful uncompressed AVI: avih header + raw bottom-up
    BGR '00db' frames with 4-byte row padding."""
    h, w = frames[0].shape[:2]
    stride = (w * 3 + 3) & ~3
    avih = _struct.pack(
        "<IIIIIIIIIIIIII",
        int(1e6 / fps), 0, 0, 0, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    movi = b""
    for f in frames:
        bgr = f[::-1, :, ::-1]  # bottom-up, BGR
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        movi += _chunk(b"00db", rows.tobytes())
    hdrl = _list(b"hdrl", _chunk(b"avih", avih))
    body = b"AVI " + hdrl + _list(b"movi", movi)
    return _chunk(b"RIFF", body)


def test_avi_roundtrip_and_sampling():
    from numalogic_spark.operators.multimodal import decode_avi_frames

    rng = np.random.default_rng(21)
    frames = [rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8) for _ in range(7)]
    payload = encode_avi(frames, fps=25)
    got, fps = decode_avi_frames(payload)
    assert fps == pytest.approx(25, rel=1e-4)
    assert len(got) == 7
    for a, b in zip(got, frames):
        np.testing.assert_array_equal(a, b)
    # fused frame sampling: every 3rd frame only
    sampled, _ = decode_avi_frames(payload, every_n=3)
    assert len(sampled) == 3
    np.testing.assert_array_equal(sampled[1], frames[3])


def test_avi_rejects_compressed_and_garbage():
    from numalogic_spark.operators.multimodal import decode_avi_frames

    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        decode_avi_frames(b"\x00" * 32)
    comp = _chunk(
        b"RIFF",
        b"AVI "
        + _list(b"hdrl", _chunk(b"avih", b"\x00" * 56))
        + _list(b"movi", _chunk(b"00dc", b"\x01\x02")),
    )
    with pytest.raises(ValueError, match="codec"):
        decode_avi_frames(comp)


def test_avi_features_flow_through_spark(spark):
    from numalogic_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_avi_frames,
        extract_features,
        video_features,
    )

    rng = np.random.default_rng(5)
    frames = [
        (np.full((8, 8, 3), 20 * i, dtype=np.uint8)) for i in range(5)
    ]  # monotone brightness ramp -> nonzero motion
    payload = encode_avi(frames, fps=4)
    df = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "doc_id": "v0",
                    "modality": "video",
                    "payload": bytearray(payload),
                    "meta": {"mime": "video/avi", "width": 8, "height": 8,
                             "duration_ms": 1250},
                }
            ]
        ),
        MEDIA_SCHEMA,
    )
    got = np.array(extract_features(df).collect()[0]["features"])
    exp = video_features(*decode_avi_frames(payload))
    np.testing.assert_allclose(got, exp, rtol=1e-6)
    assert got[6] > 0  # motion proxy sees the brightness ramp


def test_sample_encoded_frames_mp4(spark):
    """MP4 frame sampling end-to-end through Spark: demux inside
    mapInPandas, one row per sampled encoded access unit."""
    from numalogic_spark.operators.multimodal import sample_encoded_frames
    from tests.test_mp4 import _frames, _mux

    rng = np.random.default_rng(9)
    payloads = {f"v{i}": _frames(rng) for i in range(3)}
    rows = [
        {
            "doc_id": k,
            "modality": "video",
            "payload": _mux(frames),
            "meta": {"mime": "video/mp4", "width": 64, "height": 48, "duration_ms": 1000},
        }
        for k, frames in payloads.items()
    ]
    # plus one non-mp4 row that must be filtered out, not crash the kernel
    rows.append(
        {
            "doc_id": "x0",
            "modality": "image",
            "payload": b"\x89PNG1234",
            "meta": {"mime": "image/png", "width": 1, "height": 1, "duration_ms": None},
        }
    )
    from numalogic_spark.operators.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    out = sample_encoded_frames(media, keyframes_only=True).orderBy("doc_id", "frame_idx").toPandas()
    assert len(out) == 9  # 3 docs × 3 keyframes
    assert set(out["doc_id"]) == set(payloads)
    assert out["is_key"].all()
    assert (out["codec"] == "avc1").all()
    for doc_id, grp in out.groupby("doc_id"):
        frames = payloads[doc_id]
        got = [bytes(b) for b in grp.sort_values("frame_idx")["frame"]]
        assert got == [frames[0], frames[4], frames[8]]
    # pts at timescale 1200: keyframes 0/4/8 → dts 0, 400, 900
    np.testing.assert_array_equal(
        sorted(out["pts_ms"].unique()), [0, 333, 750]
    )
    # every_n thinning across all frames
    thin = sample_encoded_frames(media, every_n=5).toPandas()
    assert len(thin) == 6  # 3 docs × frames {0, 5}


def test_mp4_container_features_routing(spark):
    from numalogic_spark.operators.multimodal import MEDIA_SCHEMA
    from tests.test_mp4 import _frames, _mux

    rng = np.random.default_rng(10)
    media = spark.createDataFrame(
        [
            {
                "doc_id": "v0",
                "modality": "video",
                "payload": _mux(_frames(rng)),
                "meta": {"mime": "video/mp4", "width": 64, "height": 48, "duration_ms": 1000},
            }
        ],
        schema=MEDIA_SCHEMA,
    )
    feats = extract_features(media, encoder="real").toPandas()
    v = np.asarray(feats["features"][0])
    assert v.shape == (FEATURE_DIM,)
    assert v[0] == 10.0 and v[3] == 64.0 and v[4] == 48.0
