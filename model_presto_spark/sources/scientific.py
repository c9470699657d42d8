"""Scientific-format scans/sinks: NetCDF (S5/S13), HDF5 (S6/S14),
HTTP-fetched split lists (S9).

Reference semantics: xarray NetCDF reads (src/optimization.py:64,100,
presto-tolbi/presto/eval/cropharvest_eval.py:216-217), h5py reads
(presto-tolbi/presto/eval/cropharvest_extensions.py:489-499), netCDF
combine-and-save (cropharvest_eval.py:213-214), HDF5 append sinks
(cropharvest_extensions.py:340-344), and split files fetched over
HTTP (presto-tolbi/presto/eval/eurosat_eval.py:97-100).

NetCDF classic (CDF-1/CDF-2) is decoded/encoded by the dependency-free
pure-numpy codec in sources/netcdf3.py, and HDF5 by sources/hdf5lite.py
(libhdf5-default subset: superblock v0, contiguous numeric datasets) —
all four scan/sink paths are REAL and tested in this container.
xarray/h5py are used only as fallbacks for files outside those
subsets (NetCDF-4, chunked/compressed HDF5) when installed. The
binaryFile + mapInPandas distributed shape is shared with raster.py.
The HTTP text-list scan is fully real (urllib is stdlib; the fetch
runs on the driver — split lists are tiny — then parallelizes).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
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
    via binaryFile + mapInPandas (reference xarray reads,
    src/optimization.py:64,100). Classic CDF-1/CDF-2 files decode with
    the pure-numpy codec (sources/netcdf3.py) — no dependency; HDF5-
    backed NetCDF-4 files fall back to xarray when available."""
    from model_presto_spark.sources.netcdf3 import decode_netcdf3, is_netcdf3

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in it:
            frames = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"])
                if is_netcdf3(content):
                    data = decode_netcdf3(content)
                elif HAVE_XARRAY:  # pragma: no cover - lib absent in image
                    ds = xarray.open_dataset(io.BytesIO(content))
                    data = {v: ds[v].values for v in variables}
                else:
                    raise NotImplementedError(
                        f"{r['path']}: NetCDF-4/HDF5-backed file needs "
                        "xarray (not installed in this image); classic "
                        "CDF-1/CDF-2 decodes natively"
                    )
                for v in variables:
                    flat = np.asarray(data[v], dtype="float64").ravel()
                    frames.append(
                        pd.DataFrame(
                            {
                                "path": r["path"],
                                "variable": v,
                                "index": np.arange(flat.size, dtype="int64"),
                                "value": flat,
                            }
                        )
                    )
            yield pd.concat(frames) if frames else pd.DataFrame(
                columns=["path", "variable", "index", "value"]
            )

    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
        .mapInPandas(decode, "path string, variable string, index long, value double")
    )


def read_hdf5(spark: SparkSession, path: str, dataset: str) -> DataFrame:
    """HDF5 scan (S6): binaryFile + mapInPandas decode to long-form
    (path, dataset, index, value) rows (reference h5py reads,
    cropharvest_extensions.py:489-499). The libhdf5-default subset
    (superblock v0, contiguous numeric datasets) decodes with the
    pure-numpy codec (sources/hdf5lite.py); chunked/compressed or
    v2+ files fall back to h5py when available."""
    from model_presto_spark.sources.hdf5lite import decode_hdf5

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in it:
            frames = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"])
                try:
                    flat = np.asarray(
                        decode_hdf5(content)[dataset], dtype="float64"
                    ).ravel()
                except ValueError as err:
                    if not HAVE_H5PY:
                        raise NotImplementedError(
                            f"{r['path']}: outside the native HDF5 subset "
                            f"({err}); full decode needs h5py (not "
                            "installed in this image)"
                        ) from err
                    with h5py.File(io.BytesIO(content), "r") as f:  # pragma: no cover
                        flat = np.asarray(f[dataset][...], dtype="float64").ravel()
                frames.append(
                    pd.DataFrame(
                        {
                            "path": r["path"],
                            "dataset": dataset,
                            "index": np.arange(flat.size, dtype="int64"),
                            "value": flat,
                        }
                    )
                )
            yield pd.concat(frames) if frames else pd.DataFrame(
                columns=["path", "dataset", "index", "value"]
            )

    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
        .mapInPandas(decode, "path string, dataset string, index long, value double")
    )


def write_netcdf(
    df: DataFrame, out_dir: str, group_col: str = "path"
) -> list:
    """NetCDF sink (S13): one .nc per ``group_col`` group via
    applyInPandas (reference combine-and-save,
    cropharvest_eval.py:213-214). Input is the long-form
    (variable, index, value) layout read_netcdf produces; each group
    task pivots to 1-D variables and writes a classic CDF-1 file with
    the pure-numpy codec (sources/netcdf3.py — no dependency).
    Returns the manifest rows."""
    os.makedirs(out_dir, exist_ok=True)

    def write_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from model_presto_spark.sources.netcdf3 import encode_netcdf3

        name = os.path.basename(str(key[0])) or "out"
        if not name.endswith(".nc"):
            name += ".nc"
        target = os.path.join(out_dir, name)
        data = {}
        for v, sub in pdf.groupby("variable"):
            sub = sub.sort_values("index")
            data[str(v)] = sub["value"].to_numpy()
        with open(target, "wb") as f:
            f.write(encode_netcdf3(data))
        return pd.DataFrame(
            {"group": [str(key[0])], "path": [target], "n_values": [len(pdf)]}
        )

    return (
        df.groupBy(group_col)
        .applyInPandas(write_group, "group string, path string, n_values long")
        .collect()
    )


def write_hdf5(
    df: DataFrame, out_dir: str, group_col: str = "path"
) -> list:
    """HDF5 sink (S14): one .h5 per group, one contiguous dataset per
    variable (reference append sink, cropharvest_extensions.py:340-344),
    written with the pure-numpy codec (sources/hdf5lite.py — no
    dependency). Same manifest contract as
    write_netcdf/write_raster_tiles."""
    os.makedirs(out_dir, exist_ok=True)

    def write_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from model_presto_spark.sources.hdf5lite import encode_hdf5

        name = os.path.basename(str(key[0])) or "out"
        if not name.endswith((".h5", ".hdf5")):
            name += ".h5"
        target = os.path.join(out_dir, name)
        col = "variable" if "variable" in pdf.columns else "dataset"
        data = {}
        for v, sub in pdf.groupby(col):
            sub = sub.sort_values("index")
            data[str(v)] = sub["value"].to_numpy()
        with open(target, "wb") as f:
            f.write(encode_hdf5(data))
        return pd.DataFrame(
            {"group": [str(key[0])], "path": [target], "n_values": [len(pdf)]}
        )

    return (
        df.groupBy(group_col)
        .applyInPandas(write_group, "group string, path string, n_values long")
        .collect()
    )


def read_http_text_list(spark: SparkSession, url: str) -> DataFrame:
    """Split-file list fetched over HTTP (S9, eurosat_eval.py:97-100):
    tiny driver-side fetch, parallelized as a one-column DataFrame.
    file:// URLs work too (tests)."""
    from urllib.request import urlopen

    with urlopen(url) as resp:  # noqa: S310 - caller controls the URL
        lines = [l.strip() for l in resp.read().decode().splitlines() if l.strip()]
    return spark.createDataFrame([(l,) for l in lines], "value string")
