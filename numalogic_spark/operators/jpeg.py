"""Baseline + progressive JPEG (JFIF) decoder — pure numpy + stdlib.

Covers the baseline sequential DCT process (ITU-T T.81): DQT/DHT/SOF0/SOS
marker parsing, byte-stuffed Huffman entropy decoding with DC prediction
and restart markers, dequantization, 8×8 inverse DCT (orthonormal basis
matmul), chroma upsampling for 4:4:4 / 4:2:2 / 4:2:0, and BT.601
YCbCr→RGB. Progressive DCT (SOF2, T.81 Annex G) is fully supported:
spectral-selection scans (Ss..Se bands with EOB-run coding) and
successive-approximation scans (DC bit refinement, the AC
correction-bit algorithm of G.1.2.3) accumulate into per-component
coefficient planes that are dequantized + IDCTed once at EOI.
Arithmetic coding and the hierarchical/lossless processes are rejected
with a clear error.

Consumed by operators/multimodal.decode_features for mime image/jpeg; the
test suite cross-checks against an independent spec-faithful encoder
(tests/test_jpeg.py) block-by-block and end-to-end (JPEG is lossy, so the
end-to-end gate is exact-match against the decoder's OWN arithmetic and
PSNR vs the source image).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: index = zigzag position, value = row-major position
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)


def _dct_basis() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis D: spatial = D.T @ freq @ D."""
    n = np.arange(8)
    k = n[:, None]
    d = np.cos((2 * n[None, :] + 1) * k * np.pi / 16) / 2.0
    d[0, :] *= 1 / np.sqrt(2)
    return d


_D = _dct_basis()


def idct2_blocks(freq: np.ndarray) -> np.ndarray:
    """(n, 8, 8) frequency blocks → spatial, one einsum (vectorized)."""
    return np.einsum("ki,nkl,lj->nij", _D, freq, _D, optimize=True)


def dct2_blocks(spatial: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial → frequency (the encoder's forward transform)."""
    return np.einsum("ik,nkl,jl->nij", _D, spatial, _D, optimize=True)


class HuffTable:
    """Canonical Huffman table from the DHT (bits, values) spec form,
    decoded via the standard mincode/maxcode/valptr walk (T.81 F.2.2.3)."""

    def __init__(self, bits: list[int], values: bytes):
        self.values = np.frombuffer(bytes(values), dtype=np.uint8)
        code = 0
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        p = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = p
                self.mincode[length] = code
                code += bits[length - 1]
                p += bits[length - 1]
                self.maxcode[length] = code - 1
            else:
                self.maxcode[length] = -1
            code <<= 1


class BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    byte-unstuffing; restart markers are consumed via `restart()`."""

    def __init__(self, data: bytes, start: int):
        self.data = data
        self.pos = start
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0  # pad past end (spec allows)
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    break  # restart marker: stop filling, handled explicitly
                else:
                    break  # EOI or next segment
                self.acc = (self.acc << 8) | b
                self.nbits += 8
            else:
                self.pos += 1
                self.acc = (self.acc << 8) | b
                self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                return 0
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume one RSTn marker; reset bit state."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected restart marker")

    def decode_symbol(self, t: HuffTable) -> int:
        code = self.read_bit()
        length = 1
        while code > t.maxcode[length]:
            code = (code << 1) | self.read_bit()
            length += 1
            if length > 16:
                raise ValueError("corrupt JPEG: huffman code longer than 16 bits")
        return int(t.values[t.valptr[length] + code - t.mincode[length]])


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline or progressive JFIF → (h, w, 3) uint8 RGB (grayscale
    replicated)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], HuffTable] = {}
    restart_interval = 0
    frame = None
    prog = None
    i = 2
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF fill
        # bytes — skip them so the marker id is the first non-FF byte
        while i + 1 < len(payload) and payload[i + 1] == 0xFF:
            i += 1
        marker = payload[i + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, i + 2)
        body = payload[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 15
                j += 1
                if pq:
                    tbl = np.frombuffer(body[j : j + 128], dtype=">u2").astype(np.int32)
                    j += 128
                else:
                    tbl = np.frombuffer(body[j : j + 64], dtype=np.uint8).astype(np.int32)
                    j += 64
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 15
                bits = list(body[j + 1 : j + 17])
                nv = sum(bits)
                huff[(tc, th)] = HuffTable(bits, body[j + 17 : j + 17 + nv])
                j += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c], body[7 + 3 * c], body[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline (SOF0/1) or progressive (SOF2) DCT supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = {}
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                scan[cid] = (tabs >> 4, tabs & 15)
            data_start = i + 2 + seglen
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            if not frame["progressive"]:
                return _decode_scan(payload, data_start, frame, scan, qt, huff, restart_interval)
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            if prog is None:
                prog = _init_prog_state(frame)
            i = _decode_prog_scan(
                payload, data_start, frame, prog, scan, huff,
                restart_interval, ss, se, ahal >> 4, ahal & 15,
            )
            continue
        i += 2 + seglen
    if prog is not None:
        return _finalize_progressive(frame, prog, qt)
    raise ValueError("corrupt JPEG: no SOS segment")


def _mcu_geometry(frame):
    """(hmax, vmax, mcux, mcuy) for a frame — the ONE place the padded
    MCU-grid rounding lives, shared by the baseline and progressive
    decoders so they can never disagree on plane sizes."""
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    return hmax, vmax, -(-w // (8 * hmax)), -(-h // (8 * vmax))


def _decode_scan(payload, start, frame, scan, qt, huff, restart_interval):
    if frame is None:
        raise ValueError("corrupt JPEG: SOS before SOF")
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    if len(scan) != len(comps):
        raise ValueError(
            "only a single interleaved scan is supported "
            f"(SOS covers {len(scan)} of {len(comps)} components)"
        )
    hmax, vmax, mcux, mcuy = _mcu_geometry(frame)
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    reader = BitReader(payload, start)
    pred = [0] * len(comps)
    # de-zigzagged quant table per component (coef is stored de-zigzagged)
    dezig_q = []
    for c in comps:
        dq = np.zeros(64, dtype=np.int64)
        dq[ZIGZAG] = qt[c["tq"]]
        dezig_q.append(dq)
    # collect dequantized frequency blocks, IDCT them all at once at the end
    blocks: list[list[tuple[int, int, np.ndarray]]] = [[] for _ in comps]
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_t, ac_t = scan[c["id"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int64)
                        t = reader.decode_symbol(huff[(0, dc_t)])
                        diff = _extend(reader.receive(t), t)
                        pred[ci] += diff
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(huff[(1, ac_t)])
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("corrupt JPEG: AC index overflow")
                            coef[ZIGZAG[k]] = _extend(reader.receive(s), s)
                            k += 1
                        blocks[ci].append(
                            (
                                (my * c["v"] + by) * 8,
                                (mx * c["h"] + bx) * 8,
                                coef * dezig_q[ci],
                            )
                        )
            mcu_count += 1
    for ci, c in enumerate(comps):
        if not blocks[ci]:
            continue
        freqs = np.stack([b[2].reshape(8, 8) for b in blocks[ci]])
        spatial = idct2_blocks(freqs.astype(np.float64)) + 128.0
        for (y0, x0, _), sp in zip(blocks[ci], spatial):
            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = sp
    return _planes_to_rgb(planes, comps, hmax, vmax, h, w)


def _planes_to_rgb(planes, comps, hmax, vmax, h, w):
    """Upsample each spatial component plane to full (mcu-padded)
    resolution, crop to (h, w), and color-convert — shared by the
    baseline and progressive paths."""
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        # +0.5 rounding like the color path (astype alone truncates and
        # would bias every grayscale sample -0.5 LSB)
        y = np.clip(full[0] + 0.5, 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    if len(full) != 3:
        raise ValueError(f"unsupported component count {len(full)}")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2) + 0.5, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Progressive DCT (SOF2) — T.81 Annex G. Coefficients accumulate across
# scans into per-component zigzag-order planes; dequant + IDCT happen once
# at EOI. Spectral selection uses EOB-run coding; successive approximation
# refines one bit per scan (DC: bit OR; AC: the G.1.2.3 correction-bit
# walk).


def _init_prog_state(frame):
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax, vmax, mcux, mcuy = _mcu_geometry(frame)
    st = {
        "hmax": hmax, "vmax": vmax, "mcux": mcux, "mcuy": mcuy,
        "bwpad": [], "bhpad": [], "bw": [], "bh": [], "coef": [],
    }
    for c in comps:
        bwpad, bhpad = mcux * c["h"], mcuy * c["v"]
        # real (coded-in-non-interleaved-scans) block dims: T.81 A.2.2
        cw = -(-(w * c["h"]) // hmax)
        ch = -(-(h * c["v"]) // vmax)
        st["bwpad"].append(bwpad)
        st["bhpad"].append(bhpad)
        st["bw"].append(-(-cw // 8))
        st["bh"].append(-(-ch // 8))
        st["coef"].append(np.zeros((bhpad * bwpad, 64), dtype=np.int32))
    return st


def _ac_first_block(reader, czz, ss, se, al, tab, eobrun):
    """One block of a first AC scan (Ah=0): T.81 G.1.2.2 with EOBRUN."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_symbol(tab)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL: 16 zero coefficients
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.receive(r)
            break
        k += r
        if k > se:
            raise ValueError("corrupt JPEG: AC index overflow in progressive scan")
        czz[k] = _extend(reader.receive(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(reader, czz, ss, se, al, tab, eobrun):
    """One block of an AC refinement scan (Ah>0): T.81 G.1.2.3. Each
    already-nonzero coefficient in the band consumes one correction bit;
    newly-nonzero coefficients arrive as ±1 at bit position Al."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_symbol(tab)
            r, s = rs >> 4, rs & 15
            newval = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.receive(r)
                    break
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("corrupt JPEG: refinement magnitude > 1")
                newval = p1 if reader.read_bit() else -p1
            while k <= se:
                if czz[k] != 0:
                    if reader.read_bit() and (int(czz[k]) & p1) == 0:
                        czz[k] += p1 if czz[k] > 0 else -p1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval:
                if k > se:
                    # the decoded zero-run walked past the band end with a
                    # newly-nonzero coefficient pending — its sign bit is
                    # already consumed, so continuing would desynchronize
                    # the reader and silently decode garbage; fail loudly
                    # like the first-scan path's overflow check
                    raise ValueError(
                        "corrupt JPEG: AC index overflow in refinement scan"
                    )
                czz[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if czz[k] != 0:
                if reader.read_bit() and (int(czz[k]) & p1) == 0:
                    czz[k] += p1 if czz[k] > 0 else -p1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_prog_scan(payload, start, frame, prog, scan, huff, restart_interval, ss, se, ah, al):
    """Decode one progressive SOS into the accumulated coefficient planes;
    returns the payload index of the next marker."""
    comps = frame["comps"]
    cid_to_ix = {c["id"]: ix for ix, c in enumerate(comps)}
    members = [cid_to_ix[cid] for cid in scan]
    is_dc = ss == 0
    if is_dc and se != 0:
        raise ValueError("corrupt JPEG: DC scan with Se != 0")
    if not is_dc and len(members) != 1:
        raise ValueError("corrupt JPEG: progressive AC scan must cover exactly one component")
    reader = BitReader(payload, start)
    pred = [0] * len(comps)
    eobrun = 0

    def dc_unit(ci, czz):
        nonlocal eobrun
        if ah == 0:
            t = reader.decode_symbol(huff[(0, scan[comps[ci]["id"]][0])])
            pred[ci] += _extend(reader.receive(t), t)
            czz[0] = pred[ci] << al
        elif reader.read_bit():
            czz[0] = int(czz[0]) | (1 << al)

    def ac_unit(ci, czz):
        nonlocal eobrun
        tab = huff[(1, scan[comps[ci]["id"]][1])]
        if ah == 0:
            eobrun = _ac_first_block(reader, czz, ss, se, al, tab, eobrun)
        else:
            eobrun = _ac_refine_block(reader, czz, ss, se, al, tab, eobrun)

    unit = dc_unit if is_dc else ac_unit
    count = 0
    if len(members) > 1:  # interleaved (DC scans only): MCU traversal
        for my in range(prog["mcuy"]):
            for mx in range(prog["mcux"]):
                if restart_interval and count and count % restart_interval == 0:
                    reader.restart()
                    pred = [0] * len(comps)
                    eobrun = 0
                for ci in members:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            bidx = (my * c["v"] + by) * prog["bwpad"][ci] + (mx * c["h"] + bx)
                            unit(ci, prog["coef"][ci][bidx])
                count += 1
    else:  # non-interleaved: the component's real blocks, row-major
        ci = members[0]
        for by in range(prog["bh"][ci]):
            for bx in range(prog["bw"][ci]):
                if restart_interval and count and count % restart_interval == 0:
                    reader.restart()
                    pred = [0] * len(comps)
                    eobrun = 0
                unit(ci, prog["coef"][ci][by * prog["bwpad"][ci] + bx])
                count += 1

    # skip to the next marker (past any padding bits and stray RSTn)
    pos = reader.pos
    n = len(payload)
    while pos + 1 < n:
        if payload[pos] == 0xFF:
            nxt = payload[pos + 1]
            if nxt != 0x00 and nxt != 0xFF and not (0xD0 <= nxt <= 0xD7):
                return pos
        pos += 1
    return n


def _finalize_progressive(frame, prog, qt):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    planes = []
    for ci, c in enumerate(comps):
        q = np.asarray(qt[c["tq"]], dtype=np.int64)  # zigzag order, as stored
        vals = prog["coef"][ci].astype(np.int64) * q[None, :]
        nat = np.zeros_like(vals)
        nat[:, ZIGZAG] = vals  # de-zigzag every block at once
        spatial = idct2_blocks(nat.reshape(-1, 8, 8).astype(np.float64)) + 128.0
        bhp, bwp = prog["bhpad"][ci], prog["bwpad"][ci]
        planes.append(
            spatial.reshape(bhp, bwp, 8, 8).transpose(0, 2, 1, 3).reshape(bhp * 8, bwp * 8)
        )
    return _planes_to_rgb(planes, comps, prog["hmax"], prog["vmax"], h, w)
