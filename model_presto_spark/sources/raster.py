"""Raster (GeoTIFF) scan: binary files -> pixel rows (S3/S10).

Reference semantics: each exported GeoTIFF is opened, optionally
strided (every 10th row/col), flattened to pixel rows with a lat/lon
meshgrid, and yielded as (pixel, band, value) records (reference:
presto-tolbi/presto/dataops/pipelines/ee_pipeline.py:18,34-54
``resample_and_flatten_tif`` + meshgrid; chip loop
src/process_data.py:64-82; eval-side variant
presto-tolbi/presto/eval/treesat_eval.py:111-146).

Spark-first: ``spark.read.format("binaryFile")`` scans the files
(path glob + partition parallelism); decode happens in
``mapInPandas`` — one Arrow batch of (path, content) in, a flat
pixel-row frame out. Real TIFF bytes decode through the
dependency-free codec in ``sources/tiff.py`` (uncompressed strip or
tile TIFF 6.0 + GeoTIFF transform tags — the format plain
EarthEngine exports use); compressed TIFFs fall back to rasterio
when installed. Non-TIFF bytes keep the deterministic fake decoder
so plumbing tests have stable goldens without fixture files.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PIXEL_SCHEMA = (
    "tile_id string, row int, col int, lat double, lon double, "
    "band int, value double"
)

try:  # pragma: no cover - not installed in this container
    import rasterio  # type: ignore

    HAVE_RASTERIO = True
except ImportError:
    rasterio = None
    HAVE_RASTERIO = False


def _decode_tif(content: bytes, n_bands: int, height: int, width: int):
    """Decode raster bytes -> (array[bands,H,W], transform).

    Real TIFF bytes (II*/MM* magic) decode through the pure-numpy
    codec; compressed variants it can't handle fall back to rasterio
    when present. Non-TIFF bytes use the deterministic fake (array
    derived from the content digest) so tests exercise the full
    distributed pipeline with stable goldens and no fixture deps.
    """
    if content[:2] in (b"II", b"MM") and content[:4] != b"FAKE":
        from model_presto_spark.sources.tiff import decode_tiff

        try:
            return decode_tiff(content)
        except NotImplementedError:
            if not HAVE_RASTERIO:
                raise
        if HAVE_RASTERIO:  # pragma: no cover - rasterio absent here
            import io

            with rasterio.open(io.BytesIO(content)) as src:
                arr = src.read().astype("float64")
                t = src.transform
                return arr, (t.c, t.a, t.f, t.e)
    # Deterministic fake: seed from content digest; geo-transform
    # (origin_lon, px_w, origin_lat, px_h) parsed from a header the
    # test fixture writes, else a unit grid.
    digest = hashlib.md5(content).digest()
    seed = int.from_bytes(digest[:8], "big") % (2**31)
    if content[:4] == b"FAKE" and len(content) >= 36:
        origin_lon, px_w, origin_lat, px_h = struct.unpack(">dddd", content[4:36])
    else:
        origin_lon, px_w, origin_lat, px_h = 0.0, 1.0, 0.0, -1.0
    rng = np.random.default_rng(seed)
    arr = rng.uniform(0.0, 1.0, size=(n_bands, height, width))
    return arr, (origin_lon, px_w, origin_lat, px_h)


def read_raster_pixels(
    spark: SparkSession,
    path: str,
    n_bands: int = 3,
    height: int = 32,
    width: int = 32,
    sample_every: int = 1,
) -> DataFrame:
    """GeoTIFF files -> flat pixel-row DataFrame.

    ``sample_every`` is the reference's stride subsampling
    (SAMPLE_EVERY=10, ee_pipeline.py:18) applied *inside the decode*
    so only 1/N² of pixels ever materialize.
    """
    binary = spark.read.format("binaryFile").load(path)

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            frames = []
            for _, r in pdf.iterrows():
                arr, (olon, pw, olat, ph) = _decode_tif(
                    bytes(r["content"]), n_bands, height, width
                )
                rows = np.arange(0, arr.shape[1], sample_every)
                cols = np.arange(0, arr.shape[2], sample_every)
                rr, cc = np.meshgrid(rows, cols, indexing="ij")
                rr, cc = rr.ravel(), cc.ravel()
                lat = olat + ph * rr
                lon = olon + pw * cc
                tile = r["path"].rsplit("/", 1)[-1]
                for b in range(arr.shape[0]):
                    frames.append(
                        pd.DataFrame(
                            {
                                "tile_id": tile,
                                "row": rr.astype("int32"),
                                "col": cc.astype("int32"),
                                "lat": lat,
                                "lon": lon,
                                "band": np.int32(b),
                                "value": arr[b, rr, cc],
                            }
                        )
                    )
            yield pd.concat(frames) if frames else pd.DataFrame(
                columns=[
                    "tile_id", "row", "col", "lat", "lon", "band", "value"
                ]
            )

    return binary.select("path", "content").mapInPandas(decode, PIXEL_SCHEMA)


def write_raster_tiles(df: DataFrame, out_dir: str) -> list:
    """GeoTIFF sink (S10): per-tile export, dependency-free.

    Input is the pixel-row layout ``read_raster_pixels`` produces
    (tile_id, row, col, band, value, optionally lat/lon). Each tile is
    one ``applyInPandas`` group — the group boundary IS the tile
    boundary, so every task assembles and writes whole tiles
    (the reference's per-tile download loop inverted,
    src/test.py:103-107, ..._monthly.py:518-521). Pixels are written
    as an uncompressed chunky GeoTIFF via ``sources/tiff.py``; the
    affine transform is re-derived from the lat/lon columns when
    present. Stride-sampled inputs write the compacted grid.

    Executes eagerly; returns the manifest rows (tile_id, path,
    bands, height, width, n_pixels) — one per written tile.
    """
    import os

    from model_presto_spark.sources.tiff import encode_tiff

    os.makedirs(out_dir, exist_ok=True)
    has_geo = "lat" in df.columns and "lon" in df.columns

    def _axis(vals: np.ndarray, coords: np.ndarray | None, sign: float):
        """unique sorted axis + (origin, step) for the COMPACTED grid.

        The tile array indexes pixels 0..len(ax)-1 (searchsorted
        positions), so the affine transform must be per *written*
        pixel: origin = coord of the first axis value, step =
        (last - first) / (len(ax) - 1). Deriving step per original
        row/col index instead would mis-georeference stride-sampled
        inputs by the stride factor. (Non-uniformly-gapped axes are
        not affine-expressible; the uniform-stride case is exact.)
        """
        ax = np.unique(vals)
        if coords is None or len(ax) < 2:
            return ax, (float(coords[0]) if coords is not None else 0.0, sign)
        order = np.argsort(vals, kind="stable")
        first, last = order[vals[order] == ax[0]][0], order[vals[order] == ax[-1]][0]
        step = (float(coords[last]) - float(coords[first])) / (len(ax) - 1)
        return ax, (float(coords[first]), step)

    def write_tile(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tile_id = str(key[0])
        rows_v = pdf["row"].to_numpy()
        cols_v = pdf["col"].to_numpy()
        bands_ax = np.unique(pdf["band"].to_numpy())
        rows_ax, (olat, ph) = _axis(
            rows_v, pdf["lat"].to_numpy() if has_geo else None, -1.0
        )
        cols_ax, (olon, pw) = _axis(
            cols_v, pdf["lon"].to_numpy() if has_geo else None, 1.0
        )
        arr = np.full((len(bands_ax), len(rows_ax), len(cols_ax)), np.nan)
        arr[
            np.searchsorted(bands_ax, pdf["band"].to_numpy()),
            np.searchsorted(rows_ax, rows_v),
            np.searchsorted(cols_ax, cols_v),
        ] = pdf["value"].to_numpy()
        name = tile_id if tile_id.endswith((".tif", ".tiff")) else tile_id + ".tif"
        path = os.path.join(out_dir, name)
        with open(path, "wb") as f:
            f.write(encode_tiff(arr, geo=(olon, pw, olat, ph)))
        return pd.DataFrame(
            {
                "tile_id": [tile_id],
                "path": [path],
                "bands": [np.int32(arr.shape[0])],
                "height": [np.int32(arr.shape[1])],
                "width": [np.int32(arr.shape[2])],
                "n_pixels": [len(pdf)],
            }
        )

    manifest = df.groupBy("tile_id").applyInPandas(
        write_tile,
        "tile_id string, path string, bands int, height int, width int, "
        "n_pixels long",
    )
    return manifest.collect()
