"""Dependency-free PNG codec (8-bit, non-interlaced).

Same role as the TIFF / NetCDF-3 / HDF5 / WAV codecs in this package:
make the multimodal decode path REAL in a container without
PIL/Pillow, for the format web corpora actually contain. Covers what
training-data scrapes overwhelmingly hold: 8-bit grayscale / RGB /
RGBA / palette, non-interlaced, all five scanline filters on decode
(None/Sub/Up/Average/Paeth per the public PNG spec, RFC 2083);
encode emits filter-0 scanlines with zlib default compression.

Scanline unfiltering for Sub/Average/Paeth is byte-sequential by
definition; this pure-Python inner loop is the price of zero
dependencies and is documented as the fallback — ``decode_pixels``
prefers PIL when installed. Up/None rows stay vectorized.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_COLOR_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(blob: bytes) -> np.ndarray:
    """Decode to an (H, W, C) uint8 array (palette expanded to RGB)."""
    if blob[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG stream")
    pos = 8
    idat = bytearray()
    plte: np.ndarray | None = None
    header = None
    while pos + 8 <= len(blob):
        (ln,) = struct.unpack(">I", blob[pos : pos + 4])
        typ = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            header = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.extend(data)
        elif typ == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IEND":
            break
    if header is None:
        raise ValueError("missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = header
    if depth != 8 or interlace != 0:
        raise ValueError("only 8-bit non-interlaced PNG is supported")
    if color not in _COLOR_CHANNELS:
        raise ValueError(f"unsupported color type {color}")
    bpp = _COLOR_CHANNELS[color]
    stride = w * bpp
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    rpos = 0
    for y in range(h):
        f = raw[rpos]
        line = np.frombuffer(raw, np.uint8, stride, rpos + 1).astype(np.int32)
        rpos += 1 + stride
        if f == 0:
            cur = line
        elif f == 2:  # Up — vectorized
            cur = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth — byte-sequential
            cur = line
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                if f == 1:
                    cur[i] = (cur[i] + a) & 0xFF
                elif f == 3:
                    cur[i] = (cur[i] + ((a + b) >> 1)) & 0xFF
                else:
                    c = int(prev[i - bpp]) if i >= bpp else 0
                    cur[i] = (cur[i] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad filter byte {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(h, w, bpp)
    if color == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        px = plte[px[:, :, 0]]
    return px


def encode_png(arr: np.ndarray) -> bytes:
    """Encode an (H, W) or (H, W, C) uint8 array (C in 1/2/3/4)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = bytearray()
    for y in range(h):
        raw.append(0)  # filter 0
        raw.extend(a[y].tobytes())
    comp = zlib.compress(bytes(raw))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", comp)
        + chunk(b"IEND", b"")
    )
