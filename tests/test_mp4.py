"""MP4 demuxer vs an independent synthetic muxer: the muxer writes real
ISO BMFF boxes (ftyp/mdat/moov with stts/stsz/stsc/stco|co64/stss and an
avc1+avcC sample description) around known frame payloads; the demuxer
must recover every sample's exact bytes, timing and keyframe flags."""

import struct

import numpy as np
import pytest

from numalogic_spark.operators.mp4 import (
    mp4_container_features,
    mp4_frame_samples,
    parse_mp4,
    video_track,
)


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _full_box(btype: bytes, body: bytes, version: int = 0) -> bytes:
    return _box(btype, bytes([version, 0, 0, 0]) + body)


SPS = b"\x67\x42\x00\x1e\xab"  # arbitrary SPS-shaped bytes
PPS = b"\x68\xce\x06\xe2"


def _avc1_entry(width: int, height: int) -> bytes:
    avcc = _box(
        b"avcC",
        bytes([1, 0x42, 0x00, 0x1E, 0xFF, 0xE1])
        + struct.pack(">H", len(SPS)) + SPS
        + bytes([1]) + struct.pack(">H", len(PPS)) + PPS,
    )
    body = (
        b"\x00" * 6 + struct.pack(">H", 1)       # reserved + data_ref_index
        + b"\x00" * 16                            # predefined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4 + struct.pack(">H", 1)      # reserved + frame_count
        + b"\x00" * 32                            # compressorname
        + struct.pack(">Hh", 24, -1)              # depth, predefined
    )
    return _box(b"avc1", body + avcc)


def _mux(
    frames,
    chunk_split=4,
    timescale=1200,
    stts_runs=((6, 100), (4, 150)),
    keyframes=(1, 5, 9),
    include_stss=True,
    use_co64=False,
    uniform_size=None,
    width=64,
    height=48,
):
    """Write ftyp + mdat + moov for a single video track. Frames are split
    into two chunks with junk bytes between them so offsets must be
    honored, not inferred."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomavc1")
    junk = b"\xde\xad\xbe\xef\x00"
    chunk0 = b"".join(frames[:chunk_split])
    chunk1 = b"".join(frames[chunk_split:])
    mdat_body = chunk0 + junk + chunk1
    mdat = _box(b"mdat", mdat_body)
    c0_off = len(ftyp) + 8
    c1_off = c0_off + len(chunk0) + len(junk)

    n = len(frames)
    duration = sum(cnt * delta for cnt, delta in stts_runs)
    mvhd = _full_box(
        b"mvhd",
        struct.pack(">II", 0, 0) + struct.pack(">II", timescale, duration)
        + b"\x00" * 80,
    )
    tkhd = _full_box(
        b"tkhd",
        struct.pack(">III", 0, 0, 1) + b"\x00" * 4 + struct.pack(">I", duration)
        + b"\x00" * 52
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full_box(
        b"mdhd", struct.pack(">II", 0, 0) + struct.pack(">II", timescale, duration) + b"\x00" * 4
    )
    hdlr = _full_box(b"hdlr", b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"demo\x00")
    stsd = _full_box(b"stsd", struct.pack(">I", 1) + _avc1_entry(width, height))
    stts = _full_box(
        b"stts",
        struct.pack(">I", len(stts_runs))
        + b"".join(struct.pack(">II", c, d) for c, d in stts_runs),
    )
    if uniform_size is not None:
        stsz = _full_box(b"stsz", struct.pack(">II", uniform_size, n))
    else:
        stsz = _full_box(
            b"stsz",
            struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(f)) for f in frames),
        )
    stsc = _full_box(
        b"stsc",
        struct.pack(">I", 2)
        + struct.pack(">III", 1, chunk_split, 1)
        + struct.pack(">III", 2, n - chunk_split, 1),
    )
    if use_co64:
        stco = _full_box(b"co64", struct.pack(">I", 2) + struct.pack(">QQ", c0_off, c1_off))
    else:
        stco = _full_box(b"stco", struct.pack(">I", 2) + struct.pack(">II", c0_off, c1_off))
    stss = b""
    if include_stss:
        stss = _full_box(
            b"stss",
            struct.pack(">I", len(keyframes)) + b"".join(struct.pack(">I", k) for k in keyframes),
        )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco + stss)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _frames(rng, n=10):
    return [bytes(rng.integers(0, 256, size=int(sz), dtype=np.uint8)) for sz in rng.integers(20, 90, size=n)]


def test_parse_and_sample_table_exact():
    rng = np.random.default_rng(0)
    frames = _frames(rng)
    payload = _mux(frames)
    info = parse_mp4(payload)
    assert info["brand"] == "isom"
    trk = video_track(info)
    assert trk["desc"]["codec"] == "avc1"
    assert (trk["width"], trk["height"]) == (64, 48)
    assert trk["desc"]["sps"] == [SPS] and trk["desc"]["pps"] == [PPS]
    st = trk["samples"]
    assert st["n"] == 10
    for i, f in enumerate(frames):
        o, sz = int(st["offsets"][i]), int(st["sizes"][i])
        assert payload[o : o + sz] == f, f"sample {i} bytes mismatch"
    # stts: 6 samples at delta 100 then 4 at 150
    np.testing.assert_array_equal(
        st["dts"], [0, 100, 200, 300, 400, 500, 600, 750, 900, 1050]
    )
    np.testing.assert_array_equal(np.nonzero(st["key"])[0], [0, 4, 8])


def test_co64_and_uniform_sizes():
    rng = np.random.default_rng(1)
    frames = [bytes(rng.integers(0, 256, size=40, dtype=np.uint8)) for _ in range(10)]
    payload = _mux(frames, use_co64=True, uniform_size=40)
    st = video_track(parse_mp4(payload))["samples"]
    assert int(st["sizes"].sum()) == 400
    for i, f in enumerate(frames):
        o = int(st["offsets"][i])
        assert payload[o : o + 40] == f


def test_frame_sampling_modes():
    rng = np.random.default_rng(2)
    frames = _frames(rng)
    payload = _mux(frames)
    allf = mp4_frame_samples(payload)
    assert allf["codec"] == "avc1" and len(allf["frames"]) == 10
    keys = mp4_frame_samples(payload, keyframes_only=True)
    assert [bytes(f) for f in keys["frames"]] == [frames[0], frames[4], frames[8]]
    np.testing.assert_array_equal(keys["frame_index"], [0, 4, 8])
    assert keys["is_key"].all()
    thinned = mp4_frame_samples(payload, every_n=3)
    np.testing.assert_array_equal(thinned["frame_index"], [0, 3, 6, 9])
    capped = mp4_frame_samples(payload, every_n=1, max_frames=2)
    assert len(capped["frames"]) == 2
    # pts in seconds at timescale 1200
    np.testing.assert_allclose(keys["pts_s"], [0.0, 400 / 1200, 900 / 1200])


def test_container_features_and_errors():
    rng = np.random.default_rng(3)
    payload = _mux(_frames(rng))
    vec = mp4_container_features(payload)
    assert vec.shape == (16,) and vec.dtype == np.float32
    assert vec[0] == 10.0          # n frames
    assert vec[9] == 3.0           # n keyframes
    assert vec[3] == 64.0 and vec[4] == 48.0
    with pytest.raises(ValueError, match="not an MP4"):
        parse_mp4(b"RIFF" + b"\x00" * 64)
    with pytest.raises(ValueError, match="every_n"):
        mp4_frame_samples(payload, every_n=0)


def test_stss_presence_and_absence():
    rng = np.random.default_rng(4)
    frames = _frames(rng, 6)
    # no stss box at all → every sample is a sync sample (spec default)
    no_stss = _mux(frames, chunk_split=3, stts_runs=((6, 100),), include_stss=False)
    st = video_track(parse_mp4(no_stss))["samples"]
    assert st["key"].all()
    # explicit single-entry stss → only that sample is a keyframe
    one_key = _mux(frames, chunk_split=3, stts_runs=((6, 100),), keyframes=(1,))
    st = video_track(parse_mp4(one_key))["samples"]
    assert st["key"][0] and not st["key"][1:].any()
