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
pixel-row frame out. The decode itself needs rasterio, which is NOT
in this container: it is gated behind an import-try with a
deterministic fake decoder so the distributed plumbing — schema,
batching, stride, meshgrid flatten — is fully real and tested. Swap
``_decode_tif`` for the rasterio body in a geo-enabled image.
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

    Real path requires rasterio (absent here). The fake path derives
    a deterministic array from the byte content's digest so tests
    exercise the full distributed pipeline with stable goldens.
    """
    if HAVE_RASTERIO:  # pragma: no cover
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


def write_raster_tiles(df: DataFrame, out_dir: str) -> None:  # pragma: no cover
    """GeoTIFF sink (S10): per-tile export via foreachPartition.

    Requires rasterio; raises cleanly where absent. The partition
    boundary IS the tile boundary — repartition by tile_id first so
    each task writes whole tiles (the reference's per-tile download
    loop inverted, ..._monthly.py:42-146).
    """
    if not HAVE_RASTERIO:
        raise NotImplementedError(
            "GeoTIFF sink requires rasterio (not installed in this image)"
        )
