"""Dependency-free TIFF / GeoTIFF codec (numpy + struct only).

The reference's ingest starts at GeoTIFF -> pixel rows
(presto-tolbi/presto/dataops/pipelines/ee_pipeline.py:34-54
``resample_and_flatten_tif``) and its eval side writes rasters back
(src/test.py:103-107). This container has no rasterio, so this module
implements the subset of TIFF 6.0 + the GeoTIFF geo-transform tags
needed to make those paths real rather than gated fakes:

- decode: baseline uncompressed TIFF, little- or big-endian, strip- or
  tile-organized, chunky (pixel-interleaved) or planar layout, sample
  formats uint8/16/32, int8/16/32, float32/64 — the format plain
  EarthEngine exports use (uncompressed or after a ``gdal_translate
  -co COMPRESS=NONE``).
- encode: little-endian, single-strip, chunky, float32/float64/uint8/
  uint16/int16/int32, with ModelPixelScaleTag (33550) +
  ModelTiepointTag (33922) carrying the affine geo-transform.

Geo-transform convention throughout the repo: ``(origin_lon, px_w,
origin_lat, px_h)`` with ``px_h`` negative for north-up rasters, i.e.
``lon = origin_lon + px_w * col`` and ``lat = origin_lat + px_h * row``
(pixel-corner anchored, matching GDAL's default).

Compressed TIFFs (LZW/deflate/JPEG) are out of scope and raise a
clear error naming the compression code.
"""

from __future__ import annotations

import struct

import numpy as np

# TIFF tag ids (public TIFF 6.0 / GeoTIFF spec constants)
_T_WIDTH = 256
_T_HEIGHT = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SAMPLES_PER_PIXEL = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_BYTECOUNTS = 279
_T_PLANAR_CONFIG = 284
_T_SAMPLE_FORMAT = 339
_T_TILE_WIDTH = 322
_T_TILE_LENGTH = 323
_T_TILE_OFFSETS = 324
_T_TILE_BYTECOUNTS = 325
_T_MODEL_PIXEL_SCALE = 33550
_T_MODEL_TIEPOINT = 33922

# TIFF field types -> (struct fmt char, byte size)
_FIELD_TYPES = {
    1: ("B", 1),   # BYTE
    2: ("c", 1),   # ASCII
    3: ("H", 2),   # SHORT
    4: ("I", 4),   # LONG
    5: ("II", 8),  # RATIONAL (2x LONG)
    6: ("b", 1),   # SBYTE
    8: ("h", 2),   # SSHORT
    9: ("i", 4),   # SLONG
    11: ("f", 4),  # FLOAT
    12: ("d", 8),  # DOUBLE
}

# (SampleFormat, BitsPerSample) -> numpy dtype char
_SAMPLE_DTYPES = {
    (1, 8): "u1", (1, 16): "u2", (1, 32): "u4",
    (2, 8): "i1", (2, 16): "i2", (2, 32): "i4",
    (3, 32): "f4", (3, 64): "f8",
}
_DTYPE_TO_SF = {v: k for k, v in _SAMPLE_DTYPES.items()}


def _read_ifd_entries(buf: bytes, e: str, ifd_off: int) -> dict[int, list]:
    (n_entries,) = struct.unpack_from(e + "H", buf, ifd_off)
    tags: dict[int, list] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        tag, ftype, count = struct.unpack_from(e + "HHI", buf, off)
        if ftype not in _FIELD_TYPES:
            continue
        fmt, size = _FIELD_TYPES[ftype]
        total = size * count
        if total <= 4:
            data_off = off + 8
        else:
            (data_off,) = struct.unpack_from(e + "I", buf, off + 8)
        if ftype == 5:  # RATIONAL
            vals = []
            for j in range(count):
                num, den = struct.unpack_from(e + "II", buf, data_off + 8 * j)
                vals.append(num / den if den else float("nan"))
        elif ftype == 2:  # ASCII
            vals = [buf[data_off : data_off + count].rstrip(b"\0").decode("latin1")]
        else:
            vals = list(struct.unpack_from(e + fmt * count, buf, data_off))
        tags[tag] = vals
    return tags


def decode_tiff(content: bytes):
    """TIFF bytes -> (array[bands, H, W] float64, geo-transform tuple).

    Geo-transform is ``(origin_lon, px_w, origin_lat, px_h)``; when the
    file carries no GeoTIFF tags a unit grid ``(0, 1, 0, -1)`` is
    returned (matching the repo's fake-decode default).
    """
    if len(content) < 8 or content[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF: bad byte-order mark")
    e = "<" if content[:2] == b"II" else ">"
    magic, ifd_off = struct.unpack_from(e + "HI", content, 2)
    if magic != 42:
        raise ValueError(f"not a classic TIFF (magic={magic})")
    tags = _read_ifd_entries(content, e, ifd_off)

    width = int(tags[_T_WIDTH][0])
    height = int(tags[_T_HEIGHT][0])
    spp = int(tags.get(_T_SAMPLES_PER_PIXEL, [1])[0])
    bits = int(tags.get(_T_BITS, [1])[0])
    comp = int(tags.get(_T_COMPRESSION, [1])[0])
    sfmt = int(tags.get(_T_SAMPLE_FORMAT, [1])[0])
    planar = int(tags.get(_T_PLANAR_CONFIG, [1])[0])
    if comp != 1:
        raise NotImplementedError(
            f"TIFF compression {comp} unsupported (only 1=uncompressed); "
            "re-export with COMPRESS=NONE or install rasterio"
        )
    key = (sfmt, bits)
    if key not in _SAMPLE_DTYPES:
        raise NotImplementedError(f"unsupported (SampleFormat, Bits)={key}")
    dt = np.dtype(e + _SAMPLE_DTYPES[key])

    if _T_TILE_OFFSETS in tags:
        tw = int(tags[_T_TILE_WIDTH][0])
        th = int(tags[_T_TILE_LENGTH][0])
        offsets = tags[_T_TILE_OFFSETS]
        tiles_x = (width + tw - 1) // tw
        tiles_y = (height + th - 1) // th
        if planar == 1:
            arr = np.zeros((height, width, spp), dtype=dt)
            for idx, off in enumerate(offsets):
                ty, tx = divmod(idx, tiles_x)
                tile = np.frombuffer(
                    content, dtype=dt, count=tw * th * spp, offset=int(off)
                ).reshape(th, tw, spp)
                y0, x0 = ty * th, tx * tw
                ys, xs = min(th, height - y0), min(tw, width - x0)
                arr[y0 : y0 + ys, x0 : x0 + xs] = tile[:ys, :xs]
            out = arr.transpose(2, 0, 1)
        else:  # planar=2: tiles iterate per-plane
            out = np.zeros((spp, height, width), dtype=dt)
            per_plane = tiles_x * tiles_y
            for idx, off in enumerate(offsets):
                b, rem = divmod(idx, per_plane)
                ty, tx = divmod(rem, tiles_x)
                tile = np.frombuffer(
                    content, dtype=dt, count=tw * th, offset=int(off)
                ).reshape(th, tw)
                y0, x0 = ty * th, tx * tw
                ys, xs = min(th, height - y0), min(tw, width - x0)
                out[b, y0 : y0 + ys, x0 : x0 + xs] = tile[:ys, :xs]
    else:
        offsets = tags[_T_STRIP_OFFSETS]
        counts = tags.get(_T_STRIP_BYTECOUNTS)
        rps = int(tags.get(_T_ROWS_PER_STRIP, [height])[0])
        if planar == 1:
            raw = b"".join(
                content[int(o) : int(o) + int(c)]
                for o, c in zip(
                    offsets,
                    counts
                    if counts
                    else [min(rps, height) * width * spp * dt.itemsize]
                    * len(offsets),
                )
            )
            arr = np.frombuffer(raw, dtype=dt, count=height * width * spp)
            out = arr.reshape(height, width, spp).transpose(2, 0, 1)
        else:  # planar=2: strips per plane, plane-major order
            strips_per_plane = (height + rps - 1) // rps
            planes = []
            for b in range(spp):
                raw = b"".join(
                    content[int(o) : int(o) + int(c)]
                    for o, c in zip(
                        offsets[b * strips_per_plane : (b + 1) * strips_per_plane],
                        (counts or [rps * width * dt.itemsize] * len(offsets))[
                            b * strips_per_plane : (b + 1) * strips_per_plane
                        ],
                    )
                )
                planes.append(
                    np.frombuffer(raw, dtype=dt, count=height * width).reshape(
                        height, width
                    )
                )
            out = np.stack(planes)

    if _T_MODEL_PIXEL_SCALE in tags and _T_MODEL_TIEPOINT in tags:
        sx, sy = tags[_T_MODEL_PIXEL_SCALE][0], tags[_T_MODEL_PIXEL_SCALE][1]
        tp = tags[_T_MODEL_TIEPOINT]
        # tiepoint: (i, j, k, x, y, z) — raster (i,j) pinned to model (x,y)
        origin_lon = tp[3] - tp[0] * sx
        origin_lat = tp[4] + tp[1] * sy
        geo = (origin_lon, sx, origin_lat, -sy)
    else:
        geo = (0.0, 1.0, 0.0, -1.0)
    return out.astype("float64"), geo


def encode_tiff(arr: np.ndarray, geo=None) -> bytes:
    """array[bands, H, W] (or [H, W]) -> single-strip chunky TIFF bytes.

    ``geo`` is the repo-wide ``(origin_lon, px_w, origin_lat, px_h)``
    tuple; when given, GeoTIFF ModelPixelScale/ModelTiepoint tags are
    written (px_h must be negative, the north-up convention).
    """
    if arr.ndim == 2:
        arr = arr[np.newaxis]
    if arr.ndim != 3:
        raise ValueError("expected [bands, H, W] or [H, W]")
    dt = arr.dtype.newbyteorder("<")
    if dt.str[1:] not in _DTYPE_TO_SF:
        arr = arr.astype("float64")
        dt = arr.dtype.newbyteorder("<")
    sfmt, bits = _DTYPE_TO_SF[dt.str[1:]]
    bands, height, width = arr.shape
    pixel_data = np.ascontiguousarray(arr.transpose(1, 2, 0), dtype=dt).tobytes()

    entries: list[tuple[int, int, int, bytes]] = []  # (tag, type, count, payload)

    def short(tag: int, *vals: int) -> None:
        entries.append((tag, 3, len(vals), struct.pack(f"<{len(vals)}H", *vals)))

    def long_(tag: int, *vals: int) -> None:
        entries.append((tag, 4, len(vals), struct.pack(f"<{len(vals)}I", *vals)))

    def dbl(tag: int, *vals: float) -> None:
        entries.append((tag, 12, len(vals), struct.pack(f"<{len(vals)}d", *vals)))

    short(_T_WIDTH, width)
    short(_T_HEIGHT, height)
    short(_T_BITS, *([bits] * bands))
    short(_T_COMPRESSION, 1)
    short(_T_PHOTOMETRIC, 1)  # BlackIsZero
    long_(_T_STRIP_OFFSETS, 0)  # patched below
    short(_T_SAMPLES_PER_PIXEL, bands)
    short(_T_ROWS_PER_STRIP, height)
    long_(_T_STRIP_BYTECOUNTS, len(pixel_data))
    short(_T_PLANAR_CONFIG, 1)
    short(_T_SAMPLE_FORMAT, *([sfmt] * bands))
    if geo is not None:
        origin_lon, px_w, origin_lat, px_h = geo
        dbl(_T_MODEL_PIXEL_SCALE, abs(px_w), abs(px_h), 0.0)
        dbl(_T_MODEL_TIEPOINT, 0.0, 0.0, 0.0, origin_lon, origin_lat, 0.0)
    entries.sort(key=lambda t: t[0])

    # layout: header(8) | IFD | overflow payloads | pixel data
    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    overflow_off = ifd_off + ifd_size
    overflow: list[bytes] = []
    packed = []
    for tag, ftype, count, payload in entries:
        if len(payload) <= 4:
            inline = payload + b"\0" * (4 - len(payload))
            packed.append(struct.pack("<HHI", tag, ftype, count) + inline)
        else:
            packed.append(
                struct.pack("<HHII", tag, ftype, count, overflow_off)
            )
            overflow.append(payload)
            overflow_off += len(payload)
    data_off = overflow_off
    # patch StripOffsets (type LONG count 1 -> inline)
    for i, (tag, _, _, _) in enumerate(entries):
        if tag == _T_STRIP_OFFSETS:
            packed[i] = struct.pack("<HHII", tag, 4, 1, data_off)

    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, ifd_off)
    out += struct.pack("<H", len(entries))
    out += b"".join(packed)
    out += struct.pack("<I", 0)  # next-IFD pointer
    out += b"".join(overflow)
    out += pixel_data
    return bytes(out)
