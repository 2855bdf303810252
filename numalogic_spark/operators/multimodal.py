"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video are treated as `binary` columns with a metadata struct;
decode/feature-extraction run as Arrow-batched kernels over mapInPandas.

Decode support (pure numpy + stdlib, no codec libraries needed):
- image/jpeg — baseline sequential AND progressive JFIF
  (operators/jpeg.py: huffman + dequant + IDCT + 4:2:0/4:2:2/4:4:4 +
  restart markers; SOF2 spectral-selection/successive-approximation
  scans per T.81 Annex G)
- image/png  — 8-bit gray/gray+alpha/palette/RGB/RGBA, all 5 row filters
- image/ppm  — binary PPM (P6), any maxval ≤ 255
- image/bmp  — uncompressed 24-bit BITMAPINFOHEADER
- audio/wav  — RIFF PCM 16-bit
- video/avi  — uncompressed RIFF AVI (raw 24-bit DIB frames) with fused
  every-n frame sampling
- video/mp4  — ISO BMFF demux (operators/mp4.py): full sample tables,
  avcC config, container-level features, and `sample_encoded_frames`
  (per-frame ENCODED access units + pts + keyframe flags — everything
  short of the H.264 pixel decode itself)

The one remaining codec-bound step (H.264/VP9/... pixel decode) goes
through `decode_stub`, which raises NotImplementedError — swap in
PIL/ffmpeg on a cluster that has them. `extract_features(..., encoder="fake")` keeps a
deterministic hash-derived path for plumbing tests that don't care about
pixels.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

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
    """Codec-bound container decode (H.264/MP4, ...) would go here
    (PIL/torchaudio/ffmpeg) — not available in this environment. JPEG
    (baseline + progressive), PNG and the uncompressed formats decode for
    real (see the module docstring)."""
    raise NotImplementedError(
        f"media decode for {modality} requires codec libraries not present in this container"
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """PNG → (h, w, 3) uint8 RGB. Stdlib zlib inflate + numpy filter
    reconstruction (PNG spec §9: None/Sub/Up/Average/Paeth), 8-bit
    depth, color types 0/2/3/4/6, non-interlaced. Sub rows reconstruct as
    a mod-256 prefix sum (vectorized); Average/Paeth scan pixels
    left-to-right vectorized across channels. Alpha is dropped, gray is
    replicated, palettes are resolved via PLTE."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    i, idat, plte = 8, [], None
    w = h = depth = ctype = interlace = None
    while i + 8 <= len(payload):
        (size,) = struct.unpack_from(">I", payload, i)
        cid = payload[i + 4 : i + 8]
        body = payload[i + 8 : i + 8 + size]
        if cid == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(">IIBBBBB", body)
        elif cid == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif cid == b"IDAT":
            idat.append(body)
        elif cid == b"IEND":
            break
        i += 12 + size  # len + type + crc
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    if depth != 8:
        raise ValueError(f"only 8-bit PNG supported (depth={depth})")
    if interlace:
        raise ValueError("interlaced PNG not supported")
    if ctype not in _PNG_CHANNELS:
        raise ValueError(f"unknown PNG color type {ctype}")
    ch = _PNG_CHANNELS[ctype]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * ch
    if raw.size != h * (stride + 1):
        raise ValueError("PNG scanline size mismatch")
    rows = raw.reshape(h, stride + 1)
    filters, data = rows[:, 0], rows[:, 1:]
    recon = np.zeros((h, stride), dtype=np.uint8)
    zero_row = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        f = int(filters[r])
        line = data[r].astype(np.int32)
        up = recon[r - 1].astype(np.int32) if r else zero_row
        if f == 0:  # None
            recon[r] = line
        elif f == 1:  # Sub: mod-256 prefix sum per channel lane
            recon[r] = (np.cumsum(line.reshape(w, ch), axis=0, dtype=np.int64) & 255).reshape(-1)
        elif f == 2:  # Up
            recon[r] = (line + up) & 255
        elif f == 3:  # Average
            cur = np.empty((w, ch), dtype=np.int32)
            lw, uw = line.reshape(w, ch), up.reshape(w, ch)
            left = np.zeros(ch, dtype=np.int32)
            for x in range(w):
                left = (lw[x] + ((left + uw[x]) >> 1)) & 255
                cur[x] = left
            recon[r] = cur.reshape(-1)
        elif f == 4:  # Paeth
            cur = np.empty((w, ch), dtype=np.int32)
            lw, uw = line.reshape(w, ch), up.reshape(w, ch)
            left = np.zeros(ch, dtype=np.int32)
            ul = np.zeros(ch, dtype=np.int32)
            for x in range(w):
                p = left + uw[x] - ul
                pa, pb, pc = np.abs(p - left), np.abs(p - uw[x]), np.abs(p - ul)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, uw[x], ul)
                )
                left = (lw[x] + pred) & 255
                cur[x] = left
                ul = uw[x]
            recon[r] = cur.reshape(-1)
        else:
            raise ValueError(f"unknown PNG filter {f}")
    img = recon.reshape(h, w, ch)
    if ctype == 3:  # palette
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return plte[img[:, :, 0]]
    if ctype == 0:
        return np.repeat(img, 3, axis=2)
    if ctype == 4:
        return np.repeat(img[:, :, :1], 3, axis=2)
    if ctype == 6:
        return img[:, :, :3].copy()
    return img


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8. Pure numpy; handles comments and
    arbitrary header whitespace per the netpbm spec."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # tokenize header: magic, width, height, maxval; '#' starts a comment
    tokens, i = [], 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    return data.reshape(h, w, 3)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER) → (h, w, 3) uint8 RGB.
    Rows are 4-byte padded and stored bottom-up, channels BGR."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp}, comp={comp})")
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * abs(h), offset=data_off)
    img = rows.reshape(abs(h), stride)[:, : w * 3].reshape(abs(h), w, 3)
    if h > 0:  # bottom-up storage
        img = img[::-1]
    return img[:, :, ::-1].copy()  # BGR → RGB


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF WAV with 16-bit PCM → (samples[int16, mono-mixed], sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, channels, rate, bits, data = 12, None, None, None, None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = struct.unpack_from("<I", payload, i + 4)[0]
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack_from("<HHI", payload, i + 8)
            bits = struct.unpack_from("<H", payload, i + 22)[0]
            if fmt != 1 or bits != 16:
                raise ValueError("only PCM 16-bit WAV supported")
        elif cid == b"data":
            data = np.frombuffer(payload, dtype="<i2", count=size // 2, offset=i + 8)
        i += 8 + size + (size & 1)
    if data is None or rate is None:
        raise ValueError("missing fmt/data chunk")
    if channels and channels > 1:
        data = data[: len(data) // channels * channels].reshape(-1, channels).mean(axis=1)
        data = data.astype(np.int16)
    return data, rate


def decode_avi_frames(payload: bytes, every_n: int = 1) -> tuple[list[np.ndarray], float]:
    """Uncompressed AVI (RIFF 'AVI ' with raw 24-bit DIB '00db' frames) →
    (frames [(h, w, 3) uint8 RGB], fps). The codec-free video container —
    the video analog of the BMP/WAV decoders; compressed codecs (H.264 in
    MP4/AVI '00dc') stay behind decode_stub. ``every_n`` keeps every n-th
    frame (the frame-sampling step fused into the decode so untouched
    frames are never materialized)."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    w = h = None
    us_per_frame = 0
    frames: list[np.ndarray] = []
    idx = 0

    def walk(start: int, end: int) -> None:
        nonlocal w, h, us_per_frame, idx
        i = start
        while i + 8 <= end:
            cid = payload[i : i + 4]
            (size,) = struct.unpack_from("<I", payload, i + 4)
            body_at = i + 8
            if cid in (b"RIFF", b"LIST"):
                walk(body_at + 4, body_at + size)  # skip the list type tag
            elif cid == b"avih":
                (us_per_frame,) = struct.unpack_from("<I", payload, body_at)
                w, h = struct.unpack_from("<II", payload, body_at + 32)
            elif cid == b"00db":  # uncompressed DIB frame (bottom-up BGR)
                if w is None:
                    raise ValueError("AVI frame before avih header")
                if not w or not h:
                    raise ValueError(
                        "avih declares zero dimensions — dims-in-strf-only "
                        "AVIs are not supported"
                    )
                if idx % every_n == 0:
                    stride = (w * 3 + 3) & ~3
                    if size < stride * h:
                        raise ValueError(
                            f"'00db' chunk holds {size} bytes but a padded "
                            f"24-bpp {w}x{h} frame needs {stride * h} — "
                            "unpadded or non-24-bpp DIB frames unsupported"
                        )
                    rows = np.frombuffer(
                        payload, dtype=np.uint8, count=stride * h, offset=body_at
                    )
                    img = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
                    frames.append(img[::-1, :, ::-1].copy())  # flip + BGR→RGB
                idx += 1
            elif cid == b"00dc":
                raise ValueError(
                    "compressed AVI stream ('00dc') requires a codec — "
                    "only raw DIB ('00db') decodes here"
                )
            i = body_at + size + (size & 1)

    walk(12, len(payload))
    fps = 1e6 / us_per_frame if us_per_frame else 0.0
    return frames, fps


def video_features(frames: list[np.ndarray], fps: float) -> np.ndarray:
    """16-dim video descriptor: first/mid/last frame luminance stats,
    mean inter-frame absolute difference (motion proxy), frame count/fps."""
    if not frames:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    lum = [f.astype(np.float64).mean(axis=2) / 255.0 for f in frames]
    first, mid, last = lum[0], lum[len(lum) // 2], lum[-1]
    if len(lum) > 1:
        motion = float(np.mean([np.abs(b - a).mean() for a, b in zip(lum, lum[1:])]))
    else:
        motion = 0.0
    h, w = first.shape
    feats = np.array(
        [
            first.mean(), first.std(),
            mid.mean(), mid.std(),
            last.mean(), last.std(),
            motion,
            float(np.abs(last - first).mean()),
            min(len(frames), 4096) / 4096.0,
            min(fps, 120.0) / 120.0,
            min(h, 4096) / 4096.0,
            min(w, 4096) / 4096.0,
            h / w if w else 0.0,
            float(np.mean([f.std() for f in lum])),
            float(min(f.min() for f in lum)),
            float(max(f.max() for f in lum)),
        ],
        dtype=np.float32,
    )
    return feats


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via index gather (no interpolation libs)."""
    h, w = img.shape[:2]
    ri = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    ci = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ri][:, ci]


def image_features(img: np.ndarray) -> np.ndarray:
    """16-dim deterministic image descriptor: per-channel mean/std,
    luminance mean/std, 2×2 grid luminance means, shape stats."""
    x = img.astype(np.float64) / 255.0
    lum = x @ np.array([0.299, 0.587, 0.114])
    h, w = lum.shape
    g = resize_nearest(lum[:, :, None], 2, 2)[:, :, 0] if min(h, w) >= 1 else np.zeros((2, 2))
    grid = [
        lum[: max(h // 2, 1), : max(w // 2, 1)].mean(),
        lum[: max(h // 2, 1), max(w // 2, 1) :].mean() if w > 1 else g[0, 1],
        lum[max(h // 2, 1) :, : max(w // 2, 1)].mean() if h > 1 else g[1, 0],
        lum[max(h // 2, 1) :, max(w // 2, 1) :].mean() if h > 1 and w > 1 else g[1, 1],
    ]
    feats = np.array(
        [
            *x.reshape(-1, 3).mean(axis=0),
            *x.reshape(-1, 3).std(axis=0),
            lum.mean(),
            lum.std(),
            *[v if np.isfinite(v) else 0.0 for v in grid],
            min(h, 4096) / 4096.0,
            min(w, 4096) / 4096.0,
            h / w if w else 0.0,
            1.0,
        ],
        dtype=np.float32,
    )
    return feats


def audio_features(samples: np.ndarray, rate: int) -> np.ndarray:
    """16-dim audio descriptor: amplitude stats, zero-crossing rate, and a
    10-band coarse log-magnitude spectrum."""
    x = samples.astype(np.float64) / 32768.0
    if len(x) == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))))) if len(x) > 1 else 0.0
    spec = np.abs(np.fft.rfft(x))
    bands = np.array_split(spec, 10)
    band_feats = [float(np.log1p(b.mean())) if len(b) else 0.0 for b in bands]
    feats = np.array(
        [
            x.mean(),
            x.std(),
            float(np.sqrt(np.mean(x * x))),
            zcr,
            x.min(),
            x.max(),
            *band_feats,
        ],
        dtype=np.float32,
    )
    return feats


def decode_features(payload: bytes, mime: str) -> np.ndarray:
    """Dispatch a real decode + feature extraction by mime type."""
    if mime in ("image/jpeg", "image/jpg"):
        from numalogic_spark.operators.jpeg import decode_jpeg

        return image_features(decode_jpeg(bytes(payload)))
    if mime == "image/png":
        return image_features(decode_png(bytes(payload)))
    if mime in ("image/ppm", "image/x-portable-pixmap"):
        return image_features(decode_ppm(bytes(payload)))
    if mime == "image/bmp":
        return image_features(decode_bmp(bytes(payload)))
    if mime in ("audio/wav", "audio/x-wav"):
        return audio_features(*decode_wav_pcm16(bytes(payload)))
    if mime in ("video/avi", "video/x-msvideo"):
        return video_features(*decode_avi_frames(bytes(payload)))
    if mime == "video/mp4":
        # container-level features (duration/fps/dims/sample-size stats from
        # the demuxed ISO BMFF tables) — H.264 pixel decode itself would
        # need a codec library; see operators/mp4.py
        from numalogic_spark.operators.mp4 import mp4_container_features

        return mp4_container_features(bytes(payload))
    return decode_stub(bytes(payload), mime)


def extract_features(media_df: DataFrame, encoder: str = "real") -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, fixed-dim float
    vectors out.

    encoder="real" decodes payloads by meta.mime (PPM/BMP/WAV natively;
    compressed containers raise via decode_stub). encoder="fake" keeps the
    deterministic hash-derived features for plumbing tests."""

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if encoder == "fake":
                feats = _fake_features(pdf["payload"])
            else:
                feats = [
                    decode_features(p, m)
                    for p, m in zip(pdf["payload"], pdf["meta"].map(lambda s: s["mime"]))
                ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "payload_bytes": pdf["payload"].map(len).astype("int32"),
                    "features": feats,
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


ENCODED_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("pts_ms", T.LongType(), False),
        T.StructField("is_key", T.BooleanType(), False),
        T.StructField("codec", T.StringType(), True),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def sample_encoded_frames(
    media_df: DataFrame,
    every_n: int = 1,
    keyframes_only: bool = False,
    max_frames: int | None = None,
) -> DataFrame:
    """Container-level video frame sampling over mapInPandas: each
    video/mp4 payload is demuxed (operators/mp4.py) and emits one row per
    selected frame with the ENCODED access unit, pts and keyframe flag —
    the exact slice a downstream codec/GPU stage needs, without decoding
    pixels here. Non-mp4 rows are filtered Spark-side so the kernel only
    ever sees demuxable payloads; parallelism is per-document (a 100-TB
    corpus has millions of docs per partition-hour, so the fan-out is in
    the data, not the kernel)."""

    vids = media_df.filter(F.col("meta.mime") == "video/mp4")

    def kernel(batches):
        from numalogic_spark.operators.mp4 import mp4_frame_samples

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "pts_ms": [],
                "is_key": [], "codec": [], "frame": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                s = mp4_frame_samples(
                    bytes(payload), every_n=every_n,
                    keyframes_only=keyframes_only, max_frames=max_frames,
                )
                n = len(s["frames"])
                rows["doc_id"].extend([doc_id] * n)
                rows["frame_idx"].extend(int(i) for i in s["frame_index"])
                rows["pts_ms"].extend(int(round(t * 1000.0)) for t in s["pts_s"])
                rows["is_key"].extend(bool(k) for k in s["is_key"])
                rows["codec"].extend([s["codec"]] * n)
                rows["frame"].extend(s["frames"])
            yield pd.DataFrame(rows)

    return vids.mapInPandas(kernel, ENCODED_FRAME_SCHEMA)
