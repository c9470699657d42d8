"""Dependency-free baseline JPEG codec.

Completes the web-corpus image story next to ``sources/png.py``:
baseline sequential DCT JPEG (SOF0) decode — Huffman entropy coding,
byte unstuffing + restart markers, dequantize, exact matrix IDCT,
4:4:4 / 4:2:2 / 4:2:0 chroma upsampling, JFIF YCbCr -> RGB — plus a
baseline encoder (Annex K standard tables, libjpeg-style quality
scaling, 4:4:4) used for roundtrip testing and thumbnail sinks.
Everything is from the public ITU T.81 spec.

The entropy loop is pure Python (bit-serial Huffman has no vector
form); this codec is the no-dependency fallback —
``multimodal/blobs.decode_pixels`` prefers PIL when installed. The
DCT itself is exact float via the 8x8 DCT-II basis matrix, fully
numpy.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag index: zigzag[k] = (row, col) of the k-th coefficient
_ZZ = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

# Annex K base quantization tables
_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)
_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

# Annex K standard Huffman specs: (bits[1..16], values)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# 8x8 DCT-II orthonormal basis: A @ block @ A.T is the forward DCT
_A = np.array(
    [
        [
            float(np.sqrt(1 / 8)) if u == 0 else float(np.sqrt(2 / 8))
            * float(np.cos((2 * x + 1) * u * np.pi / 16))
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _build_codes(bits, values):
    """(length, code) assignments in spec order."""
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[values[k]] = (ln, code)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits, values):
    return {lc: sym for sym, lc in _build_codes(bits, values).items()}


class _BitReader:
    """MSB-first reader over the entropy-coded segment with 0xFF00
    unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0
        self.marker = None

    def _fill(self):
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated entropy stream")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = nxt
                raise _MarkerHit()
        else:
            self.pos += 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.bits >> self.nbits) & ((1 << n) - 1)
        self.bits &= (1 << self.nbits) - 1
        return v

    def align(self):
        self.bits = 0
        self.nbits = 0

    def huff(self, table) -> int:
        ln, code = 0, 0
        while ln <= 16:
            code = (code << 1) | self.read(1)
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("bad Huffman code")


class _MarkerHit(Exception):
    pass


def _extend(v: int, n: int) -> int:
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Decode baseline JPEG to (H, W, C) uint8 (C = 1 or 3)."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps = None
    h = w = 0
    restart = 0
    while pos < len(blob):
        if blob[pos] != 0xFF:
            pos += 1
            continue
        marker = blob[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", blob[pos : pos + 2])
        seg = blob[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros((8, 8), np.int32)
                for k in range(64):
                    tbl[_ZZ[k]] = seg[sp + 1 + k]
                qt[tq] = tbl
                sp += 65
        elif marker == 0xC0:  # SOF0 baseline
            _prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
        elif marker in (0xC1, 0xC2, 0xC3):
            raise ValueError("only baseline (SOF0) JPEG is supported")
        elif marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 0xF
                bits = list(seg[sp + 1 : sp + 17])
                nv = sum(bits)
                values = list(seg[sp + 17 : sp + 17 + nv])
                tbl = _decode_table(bits, values)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
                sp += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in comps if c["id"] == cs)
                scan.append((comp, tt >> 4, tt & 0xF))
            pos += seglen
            return _decode_scan(
                blob, pos, h, w, comps, scan, qt, huff_dc, huff_ac, restart
            )
        pos += seglen
    raise ValueError("no SOS marker found")


def _decode_scan(blob, pos, h, w, comps, scan, qt, huff_dc, huff_ac, restart):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), np.float64)
        for c in comps
    ]
    rdr = _BitReader(blob, pos)
    pred = [0] * len(comps)
    n_mcu = 0
    try:
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and n_mcu and n_mcu % restart == 0:
                    # byte-align and swallow the RSTn marker
                    rdr.align()
                    while blob[rdr.pos] != 0xFF:
                        rdr.pos += 1
                    rdr.pos += 2
                    pred = [0] * len(comps)
                n_mcu += 1
                for ci, (comp, tdc, tac) in enumerate(scan):
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            coef = np.zeros((8, 8), np.float64)
                            s = rdr.huff(huff_dc[tdc])
                            diff = _extend(rdr.read(s), s)
                            pred[ci] += diff
                            coef[0, 0] = pred[ci]
                            k = 1
                            while k < 64:
                                rs = rdr.huff(huff_ac[tac])
                                r, sz = rs >> 4, rs & 0xF
                                if sz == 0:
                                    if r == 15:
                                        k += 16
                                        continue
                                    break  # EOB
                                k += r
                                coef[_ZZ[k]] = _extend(rdr.read(sz), sz)
                                k += 1
                            block = _A.T @ (coef * qt[comp["tq"]]) @ _A
                            y0 = (my * comp["v"] + by) * 8
                            x0 = (mx * comp["h"] + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
    except _MarkerHit:
        pass
    out = []
    for ci, comp in enumerate(comps):
        p = planes[ci] + 128.0
        # nearest-neighbor upsample to full resolution
        p = np.repeat(
            np.repeat(p, hmax // comp["h"], axis=1), vmax // comp["v"], axis=0
        )
        out.append(p[:h, :w])
    if len(out) == 1:
        return np.clip(out[0], 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder (baseline, 4:4:4, Annex K tables)
# ---------------------------------------------------------------------------
class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, code: int, n: int):
        self.acc = (self.acc << n) | code
        self.nacc += n
        while self.nacc >= 8:
            self.nacc -= 8
            b = (self.acc >> self.nacc) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # stuffing
        self.acc &= (1 << self.nacc) - 1

    def flush(self):
        if self.nacc:
            self.write((1 << (8 - self.nacc)) - 1, 8 - self.nacc)


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((tbl * scale + 50) // 100, 1, 255).astype(np.int32)


def _mag_cat(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def encode_jpeg(arr: np.ndarray, quality: int = 90) -> bytes:
    """Encode (H, W) / (H, W, 1) grayscale or (H, W, 3) RGB uint8."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    if c == 3:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    elif c == 1:
        planes = [a[:, :, 0]]
    else:
        raise ValueError("encode_jpeg expects 1 or 3 channels")
    qtabs = [_quality_scale(_Q_LUMA, quality)]
    if c == 3:
        qtabs.append(_quality_scale(_Q_CHROMA, quality))
    dc_codes = [_build_codes(*_DC_LUMA), _build_codes(*_DC_CHROMA)]
    ac_codes = [_build_codes(*_AC_LUMA), _build_codes(*_AC_CHROMA)]

    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    wr = _BitWriter()
    pred = [0] * len(planes)
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for ci, plane in enumerate(planes):
                ti = 0 if ci == 0 else 1
                blk = np.empty((8, 8))
                ys, xs = by * 8, bx * 8
                src = plane[
                    min(ys, h - 1) : ys + 8, min(xs, w - 1) : xs + 8
                ]
                blk[: src.shape[0], : src.shape[1]] = src
                if src.shape[0] < 8:
                    blk[src.shape[0] :, :] = blk[src.shape[0] - 1, :]
                if src.shape[1] < 8:
                    blk[:, src.shape[1] :] = blk[:, src.shape[1] - 1 : src.shape[1]]
                coef = _A @ (blk - 128.0) @ _A.T
                qc = np.round(coef / qtabs[ti]).astype(np.int32)
                diff = int(qc[0, 0]) - pred[ci]
                pred[ci] = int(qc[0, 0])
                s = _mag_cat(diff)
                ln, code = dc_codes[ti][s]
                wr.write(code, ln)
                if s:
                    wr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
                zz = [int(qc[_ZZ[k]]) for k in range(64)]
                k = 1
                while k < 64:
                    run = 0
                    while k < 64 and zz[k] == 0:
                        run += 1
                        k += 1
                    if k == 64:
                        ln, code = ac_codes[ti][0x00]  # EOB
                        wr.write(code, ln)
                        break
                    while run > 15:
                        ln, code = ac_codes[ti][0xF0]  # ZRL
                        wr.write(code, ln)
                        run -= 16
                    v = zz[k]
                    s = _mag_cat(v)
                    ln, code = ac_codes[ti][(run << 4) | s]
                    wr.write(code, ln)
                    wr.write(v if v > 0 else v + (1 << s) - 1, s)
                    k += 1
    wr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    for ti, tbl in enumerate(qtabs):
        zzt = bytes([tbl[_ZZ[k]] for k in range(64)])
        out += seg(0xDB, bytes([ti]) + zzt)
    ncomp = len(planes)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    for tc, specs in ((0, (_DC_LUMA, _DC_CHROMA)), (1, (_AC_LUMA, _AC_CHROMA))):
        for ti in range(1 if ncomp == 1 else 2):
            bits, values = specs[ti]
            out += seg(
                0xC4, bytes([(tc << 4) | ti]) + bytes(bits) + bytes(values)
            )
    sos = bytes([ncomp])
    for ci in range(ncomp):
        ti = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (ti << 4) | ti])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += wr.buf
    out += b"\xff\xd9"
    return bytes(out)
