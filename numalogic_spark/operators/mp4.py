"""ISO BMFF (MP4) container demuxer — pure stdlib + numpy, no codec libs.

Parses the box tree (ISO/IEC 14496-12): moov/trak/mdia/minf/stbl with the
sample tables stts (decode times), stsz (sizes), stsc (sample→chunk),
stco/co64 (chunk offsets) and stss (sync samples), plus tkhd/mdhd/hdlr
and the stsd sample description (avc1/hvc1/mp4a 4CCs; avcC SPS/PPS for
H.264). From these it reconstructs every sample's absolute file offset,
size, decode timestamp and keyframe flag — which is everything a
training-data pipeline needs for container-level frame sampling: pick
every-nth frame or keyframes only, slice the encoded access units out of
mdat, and hand them to a GPU/codec fleet downstream. Pixel decode of the
H.264 bitstream itself stays behind operators/multimodal.decode_stub
(codec libraries are not present in this environment); everything up to
the encoded-frame boundary is real and tested against a synthetic muxer.

Reference parity: numalogic has no media handling; this follows the
public ISO/IEC 14496-12 structure (same tables ffmpeg/mp4box read).
"""

from __future__ import annotations

import struct

import numpy as np

_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"udta", b"dinf",
}

_FULLBOX_CONTAINERS = {b"meta"}  # container boxes that carry a version/flags word


def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for the boxes in [start, end)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", buf, pos)
        btype = buf[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("corrupt MP4: truncated largesize box")
            (size,) = struct.unpack_from(">Q", buf, pos + 8)
            hdr = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"corrupt MP4: box {btype!r} overruns its parent")
        yield btype, pos + hdr, pos + size
        pos += size


def _parse_stsd(buf: bytes, s: int, e: int) -> dict:
    (count,) = struct.unpack_from(">I", buf, s + 4)
    out: dict = {"codec": None, "width": 0, "height": 0, "sps": [], "pps": []}
    pos = s + 8
    for _ in range(count):
        (esize,) = struct.unpack_from(">I", buf, pos)
        fourcc = buf[pos + 4 : pos + 8]
        out["codec"] = fourcc.decode("latin-1")
        if fourcc in (b"avc1", b"avc3", b"hvc1", b"hev1", b"mp4v"):
            # VisualSampleEntry: 6 reserved + 2 data_ref, 16 predefined,
            # then width/height (ISO 14496-12 §12.1.3)
            w, h = struct.unpack_from(">HH", buf, pos + 8 + 8 + 16)
            out["width"], out["height"] = w, h
            # sub-boxes start after the 78-byte fixed VisualSampleEntry
            for sub, ss, se in _iter_boxes(buf, pos + 8 + 78, pos + esize):
                if sub == b"avcC":
                    out.update(_parse_avcc(buf, ss, se))
        elif fourcc in (b"mp4a", b"opus", b"flac"):
            # AudioSampleEntry: 6+2 then 8 reserved, channelcount/samplesize
            ch, bits = struct.unpack_from(">HH", buf, pos + 8 + 8 + 8)
            (rate,) = struct.unpack_from(">I", buf, pos + 8 + 8 + 8 + 8)
            out["channels"], out["sample_bits"] = ch, bits
            out["sample_rate"] = rate >> 16  # 16.16 fixed
        pos += esize
    return out


def _parse_avcc(buf: bytes, s: int, e: int) -> dict:
    """AVCDecoderConfigurationRecord (ISO 14496-15): profile/level and the
    out-of-band SPS/PPS NAL units the decoder needs before any frame."""
    profile, compat, level = buf[s + 1], buf[s + 2], buf[s + 3]
    nal_len = (buf[s + 4] & 0x03) + 1
    n_sps = buf[s + 5] & 0x1F
    pos = s + 6
    sps = []
    for _ in range(n_sps):
        (ln,) = struct.unpack_from(">H", buf, pos)
        sps.append(buf[pos + 2 : pos + 2 + ln])
        pos += 2 + ln
    n_pps = buf[pos]
    pos += 1
    pps = []
    for _ in range(n_pps):
        (ln,) = struct.unpack_from(">H", buf, pos)
        pps.append(buf[pos + 2 : pos + 2 + ln])
        pos += 2 + ln
    return {
        "avc_profile": profile, "avc_compat": compat, "avc_level": level,
        "nal_length_size": nal_len, "sps": sps, "pps": pps,
    }


def _full(buf: bytes, s: int) -> tuple[int, int]:
    """(version, body offset past the version/flags word)."""
    return buf[s], s + 4


def _parse_track(buf: bytes, s: int, e: int) -> dict | None:
    trk: dict = {
        "handler": None, "timescale": 1, "duration": 0,
        "width": 0, "height": 0, "desc": {},
        "stts": [], "stsz": None, "stsc": [], "chunk_offsets": None,
        "stss": None, "ctts": [],
    }
    for btype, bs, be in _iter_boxes(buf, s, e):
        if btype == b"tkhd":
            ver, p = _full(buf, bs)
            # width/height are the LAST two 16.16 words of tkhd
            w, h = struct.unpack_from(">II", buf, be - 8)
            trk["width"] = trk["width"] or (w >> 16)
            trk["height"] = trk["height"] or (h >> 16)
        elif btype == b"mdia":
            for m, ms, me in _iter_boxes(buf, bs, be):
                if m == b"mdhd":
                    ver, p = _full(buf, ms)
                    if ver == 1:
                        trk["timescale"], trk["duration"] = struct.unpack_from(">IQ", buf, p + 16)
                    else:
                        trk["timescale"], trk["duration"] = struct.unpack_from(">II", buf, p + 8)
                elif m == b"hdlr":
                    trk["handler"] = buf[ms + 8 : ms + 12].decode("latin-1")
                elif m == b"minf":
                    for n, ns, ne in _iter_boxes(buf, ms, me):
                        if n == b"stbl":
                            _parse_stbl(buf, ns, ne, trk)
    if trk["handler"] is None:
        return None
    return trk


def _parse_stbl(buf: bytes, s: int, e: int, trk: dict) -> None:
    for btype, bs, be in _iter_boxes(buf, s, e):
        ver, p = _full(buf, bs)
        if btype == b"stsd":
            trk["desc"] = _parse_stsd(buf, p - 4, be)  # stsd parses its own count
            if trk["desc"].get("width"):
                trk["width"] = trk["desc"]["width"]
                trk["height"] = trk["desc"]["height"]
        elif btype == b"stts":
            (n,) = struct.unpack_from(">I", buf, p)
            trk["stts"] = [struct.unpack_from(">II", buf, p + 4 + 8 * i) for i in range(n)]
        elif btype == b"ctts":
            (n,) = struct.unpack_from(">I", buf, p)
            trk["ctts"] = [struct.unpack_from(">Ii", buf, p + 4 + 8 * i) for i in range(n)]
        elif btype == b"stsz":
            uniform, n = struct.unpack_from(">II", buf, p)
            if uniform:
                trk["stsz"] = ("uniform", uniform, n)
            else:
                trk["stsz"] = (
                    "table",
                    np.frombuffer(buf, dtype=">u4", count=n, offset=p + 8).astype(np.int64),
                    n,
                )
        elif btype == b"stsc":
            (n,) = struct.unpack_from(">I", buf, p)
            trk["stsc"] = [struct.unpack_from(">III", buf, p + 12 * i + 4) for i in range(n)]
        elif btype == b"stco":
            (n,) = struct.unpack_from(">I", buf, p)
            trk["chunk_offsets"] = np.frombuffer(buf, dtype=">u4", count=n, offset=p + 4).astype(np.int64)
        elif btype == b"co64":
            (n,) = struct.unpack_from(">I", buf, p)
            trk["chunk_offsets"] = np.frombuffer(buf, dtype=">u8", count=n, offset=p + 4).astype(np.int64)
        elif btype == b"stss":
            (n,) = struct.unpack_from(">I", buf, p)
            trk["stss"] = np.frombuffer(buf, dtype=">u4", count=n, offset=p + 4).astype(np.int64)


def _sample_table(trk: dict) -> dict:
    """Resolve the four-table indirection into flat per-sample arrays:
    offset, size, dts (track timescale), keyframe."""
    kind = trk["stsz"]
    if kind is None or trk["chunk_offsets"] is None or not trk["stsc"]:
        raise ValueError("corrupt MP4: missing stsz/stsc/stco sample tables")
    if kind[0] == "uniform":
        n = kind[2]
        sizes = np.full(n, kind[1], dtype=np.int64)
    else:
        sizes = kind[1]
        n = kind[2]
    chunk_offsets = trk["chunk_offsets"]
    n_chunks = len(chunk_offsets)
    # expand stsc runs → samples-per-chunk for every chunk
    spc = np.empty(n_chunks, dtype=np.int64)
    stsc = trk["stsc"]
    for i, (first, per, _desc) in enumerate(stsc):
        last = stsc[i + 1][0] - 1 if i + 1 < len(stsc) else n_chunks
        spc[first - 1 : last] = per
    # absolute offset of every sample: chunk base + prefix sum of sizes
    offsets = np.empty(n, dtype=np.int64)
    si = 0
    for ci in range(n_chunks):
        cnt = int(spc[ci])
        cnt = min(cnt, n - si)
        if cnt <= 0:
            continue
        csizes = sizes[si : si + cnt]
        offsets[si : si + cnt] = chunk_offsets[ci] + np.concatenate(
            ([0], np.cumsum(csizes[:-1]))
        )
        si += cnt
    if si != n:
        raise ValueError(f"corrupt MP4: stsc expands to {si} samples, stsz declares {n}")
    # decode timestamps from stts runs
    dts = np.zeros(n, dtype=np.int64)
    t = 0
    si = 0
    for cnt, delta in trk["stts"]:
        cnt = min(cnt, n - si)
        dts[si : si + cnt] = t + np.arange(cnt, dtype=np.int64) * delta
        t += cnt * delta
        si += cnt
    key = np.zeros(n, dtype=bool)
    if trk["stss"] is None:
        key[:] = True  # no sync table → every sample is a keyframe (spec)
    else:
        key[trk["stss"] - 1] = True
    return {"n": n, "offsets": offsets, "sizes": sizes, "dts": dts, "key": key}


def parse_mp4(payload: bytes) -> dict:
    """Demux an MP4: brands + per-track metadata and flat sample tables."""
    if len(payload) < 12:
        raise ValueError("not an MP4 payload (too short)")
    first = payload[4:8]
    if first not in (b"ftyp", b"styp", b"moov", b"mdat", b"free", b"skip", b"wide", b"sidx", b"pdin", b"uuid"):
        raise ValueError(f"not an MP4 payload (first box {first!r})")
    info: dict = {"brand": None, "tracks": []}
    saw_known = False
    for btype, bs, be in _iter_boxes(payload, 0, len(payload)):
        if btype == b"ftyp":
            info["brand"] = payload[bs : bs + 4].decode("latin-1")
            saw_known = True
        elif btype == b"moov":
            saw_known = True
            for m, ms, me in _iter_boxes(payload, bs, be):
                if m == b"mvhd":
                    ver, p = _full(payload, ms)
                    if ver == 1:
                        ts, dur = struct.unpack_from(">IQ", payload, p + 16)
                    else:
                        ts, dur = struct.unpack_from(">II", payload, p + 8)
                    info["timescale"], info["duration"] = ts, dur
                elif m == b"trak":
                    trk = _parse_track(payload, ms, me)
                    if trk is not None:
                        trk["samples"] = _sample_table(trk)
                        info["tracks"].append(trk)
    if not saw_known:
        raise ValueError("not an MP4 payload (no ftyp/moov box)")
    return info


def video_track(info: dict) -> dict:
    for trk in info["tracks"]:
        if trk["handler"] == "vide":
            return trk
    raise ValueError("MP4 has no video track")


def mp4_frame_samples(
    payload: bytes,
    every_n: int = 1,
    keyframes_only: bool = False,
    max_frames: int | None = None,
) -> dict:
    """Container-level frame sampling: return the ENCODED access units of
    the selected frames (bytes sliced straight out of mdat — for avc1
    that's length-prefixed NAL units), plus pts seconds and keyframe
    flags. No pixel decode happens here; the output feeds a downstream
    codec stage. ``every_n`` thins after the keyframe filter."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    info = parse_mp4(payload)
    trk = video_track(info)
    st = trk["samples"]
    idx = np.nonzero(st["key"])[0] if keyframes_only else np.arange(st["n"])
    idx = idx[::every_n]
    if max_frames is not None:
        idx = idx[:max_frames]
    frames = [
        bytes(payload[int(o) : int(o) + int(sz)])
        for o, sz in zip(st["offsets"][idx], st["sizes"][idx])
    ]
    ts = float(trk["timescale"]) or 1.0
    return {
        "codec": trk["desc"].get("codec"),
        "width": trk["width"],
        "height": trk["height"],
        "sps": trk["desc"].get("sps", []),
        "pps": trk["desc"].get("pps", []),
        "frame_index": idx.astype(np.int64),
        "pts_s": st["dts"][idx] / ts,
        "is_key": st["key"][idx],
        "frames": frames,
    }


def mp4_container_features(payload: bytes) -> np.ndarray:
    """16-dim container-level descriptor (no pixel decode): duration, fps,
    dims, sample-size stats, keyframe cadence. Mirrors video_features'
    shape so mp4 rows can flow through the same feature column; a real
    codec stage would replace this with pixel features."""
    info = parse_mp4(payload)
    trk = video_track(info)
    st = trk["samples"]
    ts = float(trk["timescale"]) or 1.0
    dur = trk["duration"] / ts if trk["duration"] else (
        float(st["dts"][-1]) / ts if st["n"] else 0.0
    )
    fps = st["n"] / dur if dur > 0 else 0.0
    sizes = st["sizes"].astype(np.float64)
    key_idx = np.nonzero(st["key"])[0]
    key_gap = float(np.diff(key_idx).mean()) if len(key_idx) > 1 else float(st["n"])
    vec = np.array(
        [
            float(st["n"]), dur, fps,
            float(trk["width"]), float(trk["height"]),
            sizes.mean() if st["n"] else 0.0,
            sizes.max(initial=0.0), sizes.min(initial=0.0) if st["n"] else 0.0,
            float(sizes.sum()),
            float(len(key_idx)), key_gap,
            float(len(trk["desc"].get("sps", []))),
            float(len(trk["desc"].get("pps", []))),
            float(trk["desc"].get("avc_level", 0)),
            float(trk["desc"].get("nal_length_size", 0)),
            float(len(info["tracks"])),
        ],
        dtype=np.float32,
    )
    return vec
