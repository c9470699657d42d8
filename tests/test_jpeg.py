"""Baseline JPEG codec tests: roundtrips, gray path, dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from model_presto_spark.sources.jpeg import decode_jpeg, encode_jpeg


def _gradient(h, w, c):
    y = np.linspace(0, 255, h)[:, None]
    x = np.linspace(0, 255, w)[None, :]
    base = (y + x) / 2
    if c == 1:
        return base[:, :, None].astype(np.uint8)
    chans = [base, base[::-1, :], base[:, ::-1]]
    return np.stack(chans[:c], axis=2).astype(np.uint8)


def test_jpeg_uniform_roundtrip_near_exact():
    px = np.full((16, 16, 3), 120, np.uint8)
    got = decode_jpeg(encode_jpeg(px, quality=90))
    assert got.shape == (16, 16, 3)
    assert np.abs(got.astype(int) - 120).max() <= 2


def test_jpeg_gradient_roundtrip_rgb():
    px = _gradient(24, 17, 3)  # non-multiple-of-8 width exercises crop
    got = decode_jpeg(encode_jpeg(px, quality=95))
    assert got.shape == px.shape
    err = np.abs(got.astype(int) - px.astype(int))
    assert err.mean() < 3.0 and err.max() <= 35


def test_jpeg_grayscale_roundtrip():
    px = _gradient(19, 16, 1)
    got = decode_jpeg(encode_jpeg(px, quality=95))
    assert got.shape == px.shape
    assert np.abs(got.astype(int) - px.astype(int)).mean() < 2.0


def test_jpeg_quality_tradeoff():
    px = _gradient(32, 32, 3)
    hi = decode_jpeg(encode_jpeg(px, quality=95)).astype(int)
    lo = decode_jpeg(encode_jpeg(px, quality=20)).astype(int)
    e_hi = np.abs(hi - px.astype(int)).mean()
    e_lo = np.abs(lo - px.astype(int)).mean()
    assert e_hi <= e_lo  # lower quality cannot beat higher quality


def test_jpeg_rejects_non_jpeg():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\nxxxx")


def test_decode_pixels_dispatches_jpeg():
    from model_presto_spark.multimodal.blobs import decode_pixels

    px = _gradient(16, 16, 3)
    got = decode_pixels(encode_jpeg(px, quality=95), 16, 16, 3)
    assert got.shape == (16, 16, 3)
    assert np.abs(got - px.astype(float)).mean() < 3.0
