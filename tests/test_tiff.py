"""Pure-numpy TIFF codec + real GeoTIFF scan/sink roundtrips (S3/S10)."""

from __future__ import annotations

import struct

import numpy as np
import pytest


def test_encode_decode_roundtrip_dtypes():
    from model_presto_spark.sources.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(7)
    for dt in ("float64", "float32", "uint8", "uint16", "int16", "int32"):
        arr = (rng.uniform(0, 100, size=(3, 5, 4))).astype(dt)
        out, geo = decode_tiff(encode_tiff(arr))
        np.testing.assert_array_equal(out, arr.astype("float64"))
        assert geo == (0.0, 1.0, 0.0, -1.0)


def test_geotransform_tags_roundtrip():
    from model_presto_spark.sources.tiff import decode_tiff, encode_tiff

    arr = np.arange(24, dtype="float64").reshape(2, 3, 4)
    geo = (-17.5, 0.25, 14.75, -0.25)
    out, got = decode_tiff(encode_tiff(arr, geo=geo))
    np.testing.assert_array_equal(out, arr)
    assert got == pytest.approx(geo)


def test_single_band_2d_input():
    from model_presto_spark.sources.tiff import decode_tiff, encode_tiff

    arr = np.eye(4)
    out, _ = decode_tiff(encode_tiff(arr))
    np.testing.assert_array_equal(out, arr[np.newaxis])


def test_big_endian_decode():
    """Handcrafted MM (big-endian) single-band 2x2 uint16 strip TIFF."""
    from model_presto_spark.sources.tiff import decode_tiff

    entries = [
        (256, 3, 1, 2),  # width
        (257, 3, 1, 2),  # height
        (258, 3, 1, 16),  # bits
        (259, 3, 1, 1),  # uncompressed
        (262, 3, 1, 1),
        (273, 4, 1, 0),  # strip offset, patched below
        (277, 3, 1, 1),
        (278, 3, 1, 2),
        (279, 4, 1, 8),
        (339, 3, 1, 1),
    ]
    ifd = struct.pack(">H", len(entries))
    data_off = 8 + 2 + 12 * len(entries) + 4
    for tag, ftype, count, val in entries:
        if tag == 273:
            val = data_off
        ifd += struct.pack(">HHII", tag, ftype, count, val if ftype == 4 else val << 16)
    buf = struct.pack(">2sHI", b"MM", 42, 8) + ifd + struct.pack(">I", 0)
    buf += struct.pack(">4H", 100, 200, 300, 400)
    out, _ = decode_tiff(buf)
    np.testing.assert_array_equal(out, [[[100, 200], [300, 400]]])


def test_compressed_raises_clear_error():
    from model_presto_spark.sources.tiff import decode_tiff, encode_tiff

    buf = bytearray(encode_tiff(np.zeros((1, 2, 2))))
    # patch Compression tag (259) value to 5 (LZW): find its IFD slot
    n = struct.unpack_from("<H", buf, 8)[0]
    for i in range(n):
        off = 10 + 12 * i
        if struct.unpack_from("<H", buf, off)[0] == 259:
            struct.pack_into("<H", buf, off + 8, 5)
    with pytest.raises(NotImplementedError, match="compression 5"):
        decode_tiff(bytes(buf))


def test_not_a_tiff_raises():
    from model_presto_spark.sources.tiff import decode_tiff

    with pytest.raises(ValueError):
        decode_tiff(b"PNG\x00garbage")


@pytest.fixture()
def tif_dir(tmp_path):
    from model_presto_spark.sources.tiff import encode_tiff

    rng = np.random.default_rng(42)
    for i in range(2):
        arr = rng.uniform(0, 1, size=(2, 8, 8))
        geo = (10.0 * i, 0.1, 50.0, -0.1)
        (tmp_path / f"tile_{i}.tif").write_bytes(encode_tiff(arr, geo=geo))
    return str(tmp_path)


def test_read_raster_pixels_real_tiff(spark, tif_dir):
    """S3 with real bytes: the scan decodes actual TIFF pixels (no fake)."""
    from model_presto_spark.sources.raster import read_raster_pixels
    from model_presto_spark.sources.tiff import decode_tiff

    df = read_raster_pixels(spark, tif_dir, n_bands=2, height=8, width=8)
    rows = df.collect()
    assert len(rows) == 2 * 2 * 8 * 8
    # spot-check one pixel against a direct decode
    raw = open(f"{tif_dir}/tile_0.tif", "rb").read()
    arr, (olon, pw, olat, ph) = decode_tiff(raw)
    got = {
        (r.tile_id, r.band, r.row, r.col): (r.value, r.lat, r.lon)
        for r in rows
    }
    v, lat, lon = got[("tile_0.tif", 1, 3, 5)]
    assert v == pytest.approx(arr[1, 3, 5])
    assert lat == pytest.approx(olat + ph * 3)
    assert lon == pytest.approx(olon + pw * 5)


def test_write_raster_tiles_roundtrip(spark, tif_dir, tmp_path):
    """S10 roundtrip: scan -> sink -> scan reproduces values + transform."""
    from model_presto_spark.sources.raster import (
        read_raster_pixels,
        write_raster_tiles,
    )

    df = read_raster_pixels(spark, tif_dir, n_bands=2, height=8, width=8)
    out_dir = str(tmp_path / "out")
    manifest = write_raster_tiles(df, out_dir)
    assert sorted(m.tile_id for m in manifest) == ["tile_0.tif", "tile_1.tif"]
    assert all(m.bands == 2 and m.height == 8 and m.width == 8 for m in manifest)

    back = read_raster_pixels(spark, out_dir, n_bands=2, height=8, width=8)
    orig = {
        (r.tile_id, r.band, r.row, r.col): (r.value, r.lat, r.lon)
        for r in df.collect()
    }
    for r in back.collect():
        v, lat, lon = orig[(r.tile_id, r.band, r.row, r.col)]
        assert r.value == pytest.approx(v)
        assert r.lat == pytest.approx(lat)
        assert r.lon == pytest.approx(lon)
