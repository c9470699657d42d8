"""HDF5 codec (sources/hdf5lite.py) + S6 scan / S14 sink.

Validates the encoder's byte layout against the public format spec
(superblock v0 field offsets, B-tree/SNOD/HEAP signatures), the
encode->decode roundtrip across dtypes/shapes, and the Spark
scan/sink paths end to end.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from model_presto_spark.sources.hdf5lite import decode_hdf5, encode_hdf5, is_hdf5


def test_roundtrip_dtypes_shapes():
    vars_in = {
        "temp": np.arange(24, dtype="f8").reshape(2, 3, 4),
        "cnt": np.array([1, -2, 3], dtype="i4"),
        "u": np.array([7, 8], dtype="u2"),
        "f32": np.linspace(0, 1, 7).astype("f4"),
        "big": np.arange(10000, dtype="i8"),
    }
    buf = encode_hdf5(vars_in)
    assert is_hdf5(buf)
    out = decode_hdf5(buf)
    assert sorted(out) == sorted(vars_in)
    for k, want in vars_in.items():
        assert out[k].shape == want.shape
        assert out[k].dtype == want.dtype.newbyteorder("=")
        assert np.array_equal(out[k], want)


def test_spec_layout_fields():
    """Superblock v0 and structure signatures sit exactly where the
    public spec places them."""
    buf = encode_hdf5({"x": np.array([1.0, 2.0])})
    assert buf[:8] == b"\x89HDF\r\n\x1a\n"
    assert buf[8] == 0  # superblock version 0
    assert buf[13] == 8 and buf[14] == 8  # offset/length sizes
    eof = struct.unpack_from("<Q", buf, 40)[0]
    assert eof == len(buf)  # end-of-file address
    root_oh = struct.unpack_from("<Q", buf, 56 + 8)[0]
    assert buf[root_oh] == 1  # v1 object header
    assert b"TREE" in buf and b"SNOD" in buf and b"HEAP" in buf


def test_big_endian_input_normalized():
    buf = encode_hdf5({"be": np.array([1, 2, 3], dtype=">i4")})
    out = decode_hdf5(buf)
    assert list(out["be"]) == [1, 2, 3]


def test_unsupported_rejected():
    with pytest.raises(ValueError, match="signature"):
        decode_hdf5(b"not an hdf5 file" + b"\x00" * 64)
    buf = bytearray(encode_hdf5({"x": np.array([1.0])}))
    buf[8] = 2  # pretend superblock v2
    with pytest.raises(ValueError, match="superblock"):
        decode_hdf5(bytes(buf))


def test_spark_scan_s6(spark, tmp_path):
    from model_presto_spark.sources.scientific import read_hdf5

    d = tmp_path / "h5"
    d.mkdir()
    for i in range(2):
        buf = encode_hdf5(
            {
                "feats": np.arange(8, dtype="f8") * (i + 1),
                "other": np.array([9, 9], dtype="i4"),
            }
        )
        (d / f"part{i}.h5").write_bytes(buf)
    out = read_hdf5(spark, str(d), "feats")
    agg = out.agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")
    ).collect()[0]
    assert agg.n == 16
    assert agg.s == sum(range(8)) * 3.0  # 1x + 2x


def test_spark_sink_s14_roundtrip(spark, tmp_path):
    from model_presto_spark.sources.scientific import read_hdf5, write_hdf5

    long_form = spark.createDataFrame(
        [
            ("g1", "a", 0, 1.5), ("g1", "a", 1, 2.5),
            ("g2", "a", 0, -4.0),
        ],
        "path string, variable string, index long, value double",
    )
    manifest = write_hdf5(long_form, str(tmp_path / "out"), group_col="path")
    assert {m.group for m in manifest} == {"g1", "g2"}
    back = read_hdf5(spark, str(tmp_path / "out"), "a")
    vals = {
        (r.path.rsplit("/", 1)[-1], r["index"]): r.value for r in back.collect()
    }
    assert vals[("g1.h5", 0)] == 1.5 and vals[("g1.h5", 1)] == 2.5
    assert vals[("g2.h5", 0)] == -4.0
