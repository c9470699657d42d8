"""Property-based roundtrip tests for the three dependency-free
binary codecs (TIFF, NetCDF-3 classic, HDF5 subset): encode(decode)
is the identity for random shapes and dtypes. Pure numpy — no Spark
session, so examples are cheap and counts can be high."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

DTYPES = st.sampled_from(["u1", "i2", "i4", "f4", "f8"])
PURE = settings(max_examples=40, deadline=None)


def _elements(dtype: str):
    if dtype in ("f4", "f8"):
        return st.floats(
            -1e6, 1e6, allow_nan=False, width=32 if dtype == "f4" else 64
        )
    info = np.iinfo(np.dtype(dtype))
    return st.integers(int(info.min), int(info.max))


@st.composite
def band_arrays(draw):
    dtype = draw(DTYPES)
    bands = draw(st.integers(1, 3))
    h = draw(st.integers(1, 8))
    w = draw(st.integers(1, 8))
    return draw(
        arrays(np.dtype(dtype), (bands, h, w), elements=_elements(dtype))
    )


@given(arr=band_arrays())
@PURE
def test_tiff_roundtrip(arr):
    from model_presto_spark.sources.tiff import decode_tiff, encode_tiff

    geo = (-10.0, 0.5, 45.0, -0.5)
    out, got_geo = decode_tiff(encode_tiff(arr, geo=geo))
    assert out.shape == arr.shape
    assert np.array_equal(np.asarray(out, dtype=arr.dtype), arr)
    assert got_geo is not None
    assert np.allclose(got_geo, geo)


@st.composite
def var_dicts(draw):
    n = draw(st.integers(1, 3))
    out = {}
    for i in range(n):
        dtype = draw(DTYPES)
        shape = tuple(
            draw(st.integers(1, 6))
            for _ in range(draw(st.integers(1, 3)))
        )
        out[f"v{i}"] = draw(
            arrays(np.dtype(dtype), shape, elements=_elements(dtype))
        )
    return out


@given(variables=var_dicts())
@PURE
def test_netcdf3_roundtrip(variables):
    from model_presto_spark.sources.netcdf3 import (
        decode_netcdf3,
        encode_netcdf3,
    )

    got = decode_netcdf3(encode_netcdf3(variables))
    assert set(got) == set(variables)
    for name, arr in variables.items():
        # classic NetCDF has no u1/i8: encoder may widen — compare values
        assert got[name].shape == arr.shape
        assert np.array_equal(got[name].astype("f8"), arr.astype("f8"))


@given(variables=var_dicts())
@PURE
def test_hdf5_roundtrip(variables):
    from model_presto_spark.sources.hdf5lite import decode_hdf5, encode_hdf5

    got = decode_hdf5(encode_hdf5(variables))
    assert set(got) == set(variables)
    for name, arr in variables.items():
        assert got[name].shape == arr.shape
        assert np.array_equal(got[name].astype("f8"), arr.astype("f8"))
        # the subset codec preserves these dtypes exactly
        assert got[name].dtype == arr.dtype


# --- WAV -------------------------------------------------------------------

@st.composite
def wave_arrays(draw):
    n = draw(st.integers(1, 500))
    ch = draw(st.integers(1, 4))
    fmt = draw(st.sampled_from(["int16", "float32"]))
    rate = draw(st.sampled_from([4000, 8000, 16000, 44100]))
    x = draw(
        arrays(
            "f8", (n, ch),
            elements=st.floats(-1.0, 1.0, allow_nan=False, width=32),
        )
    )
    return x, ch, fmt, rate


@PURE
@given(wave_arrays())
def test_wav_roundtrip_property(case):
    from model_presto_spark.sources.wav import decode_wav, encode_wav

    x, ch, fmt, rate = case
    y, got_rate = decode_wav(encode_wav(x, rate, fmt))
    assert got_rate == rate and y.shape == x.shape
    tol = 1.0 / 32000 if fmt == "int16" else 1e-6
    assert np.max(np.abs(y - x)) <= tol
