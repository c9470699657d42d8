"""NetCDF-3 classic codec (sources/netcdf3.py) + S5 scan / S13 sink.

The codec is validated two ways: encode->decode roundtrip across all
supported dtypes, and a hand-assembled byte fixture built straight
from the public classic-format spec (record dimension, two record
variables with slab padding, one fixed variable) — so the reader is
checked independently of the writer.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from model_presto_spark.sources.netcdf3 import (
    decode_netcdf3,
    encode_netcdf3,
    is_netcdf3,
)


def test_roundtrip_all_dtypes():
    vars_in = {
        "temp": np.arange(12, dtype="f8").reshape(3, 4),
        "cnt": np.array([1, 2, 3], dtype="i4"),
        "f": np.linspace(0, 1, 5).astype("f4"),
        "b": np.array([1, -2], dtype="i1"),
        "s": np.array([100, -200], dtype="i2"),
        "scalar": np.float64(7.5),
    }
    buf = encode_netcdf3(vars_in)
    assert is_netcdf3(buf)
    out = decode_netcdf3(buf)
    for k, want in vars_in.items():
        got = np.asarray(out[k], dtype="f8")
        want = np.asarray(want, dtype="f8")
        assert got.shape == want.shape
        assert np.allclose(got, want)


def _name(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">i", len(b)) + b + b"\x00" * ((-len(b)) % 4)


def test_spec_fixture_record_vars():
    """Hand-built CDF-1 bytes: record dim t (numrecs=2), fixed dim x=3,
    fixed var base(x) double, record vars a(t,x) float and c(t) short
    (slab 2 -> padded to 4 because there are two record variables)."""
    hdr = b"CDF\x01" + struct.pack(">i", 2)
    hdr += struct.pack(">ii", 0x0A, 2)
    hdr += _name("t") + struct.pack(">i", 0)
    hdr += _name("x") + struct.pack(">i", 3)
    hdr += struct.pack(">ii", 0, 0)  # no global attrs
    hdr += struct.pack(">ii", 0x0B, 3)
    e_fixed = (
        _name("base") + struct.pack(">i", 1) + struct.pack(">i", 1)
        + struct.pack(">ii", 0, 0) + struct.pack(">ii", 6, 24)
    )
    e_a = (
        _name("a") + struct.pack(">i", 2) + struct.pack(">ii", 0, 1)
        + struct.pack(">ii", 0, 0) + struct.pack(">ii", 5, 12)
    )
    e_c = (
        _name("c") + struct.pack(">i", 1) + struct.pack(">i", 0)
        + struct.pack(">ii", 0, 0) + struct.pack(">ii", 3, 4)
    )
    hlen = len(hdr) + len(e_fixed) + 4 + len(e_a) + 4 + len(e_c) + 4
    b_fixed, b_a = hlen, hlen + 24
    b_c = b_a + 12
    buf = (
        hdr
        + e_fixed + struct.pack(">i", b_fixed)
        + e_a + struct.pack(">i", b_a)
        + e_c + struct.pack(">i", b_c)
        + np.array([9.0, 8.0, 7.0]).astype(">f8").tobytes()
        + np.array([1, 2, 3], ">f4").tobytes() + struct.pack(">h", 10) + b"\x00\x00"
        + np.array([4, 5, 6], ">f4").tobytes() + struct.pack(">h", 20) + b"\x00\x00"
    )
    out = decode_netcdf3(buf)
    assert np.allclose(out["base"], [9, 8, 7])
    assert out["a"].shape == (2, 3)
    assert np.allclose(out["a"], [[1, 2, 3], [4, 5, 6]])
    assert list(out["c"]) == [10, 20]


def test_rejects_netcdf4_magic():
    with pytest.raises(ValueError, match="classic"):
        decode_netcdf3(b"\x89HDF\r\n\x1a\n" + b"\x00" * 64)


def test_spark_scan_s5(spark, tmp_path):
    from model_presto_spark.sources.scientific import read_netcdf

    d = tmp_path / "nc"
    d.mkdir()
    for i, scale in enumerate([1.0, 10.0]):
        buf = encode_netcdf3(
            {
                "ndvi": np.arange(6, dtype="f8").reshape(2, 3) * scale,
                "qa": np.array([0, 1, 2], dtype="i2"),
            }
        )
        (d / f"part{i}.nc").write_bytes(buf)
    out = read_netcdf(spark, str(d), ["ndvi", "qa"])
    rows = out.collect()
    assert len(rows) == 2 * (6 + 3)
    by_var = (
        out.groupBy("variable")
        .agg(F.sum("value").alias("s"), F.count("*").alias("n"))
        .collect()
    )
    stats = {r.variable: (r.s, r.n) for r in by_var}
    assert stats["ndvi"] == (15.0 + 150.0, 12)
    assert stats["qa"] == (6.0, 6)


def test_spark_sink_s13_roundtrip(spark, tmp_path):
    from model_presto_spark.sources.scientific import read_netcdf, write_netcdf

    long_form = spark.createDataFrame(
        [
            ("g1", "a", 0, 1.5), ("g1", "a", 1, 2.5),
            ("g1", "b", 0, -1.0),
            ("g2", "a", 0, 9.0), ("g2", "a", 1, 8.0),
        ],
        "path string, variable string, index long, value double",
    )
    manifest = write_netcdf(long_form, str(tmp_path / "out"), group_col="path")
    assert {m.group for m in manifest} == {"g1", "g2"}
    back = read_netcdf(spark, str(tmp_path / "out"), ["a"])
    vals = {
        (r.path.rsplit("/", 1)[-1], r["index"]): r.value for r in back.collect()
    }
    assert vals[("g1.nc", 0)] == 1.5 and vals[("g1.nc", 1)] == 2.5
    assert vals[("g2.nc", 0)] == 9.0 and vals[("g2.nc", 1)] == 8.0
