"""PNG codec tests: roundtrip, all five scanline filters, Spark path."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from model_presto_spark.sources.png import (
    PNG_SIGNATURE,
    decode_png,
    encode_png,
)


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _png_with_filters(px: np.ndarray, filters: list[int]) -> bytes:
    """Reference encoder applying a given filter per scanline."""
    h, w, c = px.shape
    raw = bytearray()
    prev = np.zeros(w * c, np.int32)
    for y, f in zip(range(h), filters):
        line = px[y].reshape(-1).astype(np.int32)
        out = line.copy()
        for i in range(len(line)):
            a = int(line[i - c]) if i >= c else 0
            b = int(prev[i])
            cc = int(prev[i - c]) if i >= c else 0
            if f == 1:
                out[i] = (line[i] - a) & 0xFF
            elif f == 2:
                out[i] = (line[i] - b) & 0xFF
            elif f == 3:
                out[i] = (line[i] - ((a + b) >> 1)) & 0xFF
            elif f == 4:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                out[i] = (line[i] - pred) & 0xFF
        raw.append(f)
        raw.extend(out.astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2 if c == 3 else 0, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("shape", [(9, 7, 1), (6, 5, 3), (4, 4, 4)])
def test_png_roundtrip(shape):
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    got = decode_png(encode_png(px))
    assert got.shape == shape
    assert np.array_equal(got, px)


def test_png_all_filters_decode():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    blob = _png_with_filters(px, [0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(blob), px)


def test_png_rejects_non_png():
    with pytest.raises(ValueError):
        decode_png(b"notapng" * 4)


def test_decode_pixels_dispatches_png():
    from model_presto_spark.multimodal.blobs import decode_pixels

    px = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(4, 3, 3)
    got = decode_pixels(encode_png(px), 4, 3, 3)
    assert got.shape == (4, 3, 3)
    assert np.array_equal(got.astype(np.uint8), px)


def test_image_stats_over_png_blobs(spark):
    from model_presto_spark.multimodal.blobs import decode_image_stats

    rng = np.random.default_rng(3)
    rows, truth = [], {}
    for i in range(4):
        px = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
        rows.append((i, encode_png(px), (8, 8, 3)))
        truth[i] = px.mean(axis=(0, 1))
    df = spark.createDataFrame(
        rows,
        schema="media_id long, blob binary, "
        "meta struct<height:int,width:int,channels:int>",
    )
    out = {r.media_id: r for r in decode_image_stats(df).collect()}
    for i, means in truth.items():
        assert out[i].width == 8 and out[i].height == 8
        assert np.allclose(out[i].channel_mean, means, atol=1e-9)
