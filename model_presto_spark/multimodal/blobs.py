"""Opaque-binary media columns with typed metadata (training-data
pipeline surface for a 100 TB multimodal corpus).

Data model: media rows are ``(media_id, kind, blob binary,
meta struct)`` — the blob is never interpreted relationally; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. Image decode is REAL for TIFF (the
dependency-free codec in sources/tiff.py) and binary PPM/PGM (pure
numpy below); other formats (JPEG/PNG) fall back to PIL when
installed, else a clearly-marked digest-seeded fake — the Spark
plumbing (schema, batch shape, partitioning, UDF signatures) is the
same on every path.

The reference's raster decode pipeline (S3,
presto-tolbi/presto/dataops/pipelines/ee_pipeline.py:34-54) is the
same shape: binary in, typed rows out, batched.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, blob binary, "
    "meta struct<width:int, height:int, channels:int, "
    "sample_rate:int, duration_ms:int, codec:string>"
)

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # type: ignore

    HAVE_PIL = True
except ImportError:
    Image = None
    HAVE_PIL = False


def _fake_pixels(blob: bytes, h: int, w: int, c: int) -> np.ndarray:
    """Deterministic stand-in decode: digest-seeded uniform pixels.
    Last-resort path for formats with no native or PIL codec."""
    seed = int.from_bytes(hashlib.md5(blob).digest()[:8], "big") % (2**31)
    return np.random.default_rng(seed).uniform(0, 255, size=(h, w, c))


def _decode_ppm(blob: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5) decode — pure numpy, real.

    Header tokens are walked with a cursor (never ``bytes.index`` on
    a token value: the maxval digits can also appear inside the width
    or height, which would mis-place the pixel offset)."""
    pos = 0
    toks = []
    while len(toks) < 4:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        toks.append(blob[start:pos])
    pos += 1  # exactly one whitespace byte separates maxval from pixels
    magic, w, h, maxval = toks[0], int(toks[1]), int(toks[2]), int(toks[3])
    c = 3 if magic == b"P6" else 1
    dt = np.uint8 if maxval < 256 else np.dtype(">u2")
    arr = np.frombuffer(blob, dtype=dt, offset=pos, count=h * w * c)
    return arr.reshape(h, w, c).astype(np.float64)


def decode_pixels(blob: bytes, h: int, w: int, c: int) -> np.ndarray:
    """Decode an image blob to (H, W, C) float pixels.

    REAL decode for TIFF (sources/tiff.py codec) and binary PPM/PGM;
    PIL fallback for other formats when installed; digest-seeded fake
    as the marked last resort (same shape/dtype contract on every
    path, so downstream stages are codec-agnostic).
    """
    if blob[:4] in (b"II*\x00", b"MM\x00*"):
        from model_presto_spark.sources.tiff import decode_tiff

        arr, _geo = decode_tiff(blob)  # (bands, H, W)
        return np.ascontiguousarray(
            np.asarray(arr, dtype=np.float64).transpose(1, 2, 0)
        )
    if blob[:2] in (b"P6", b"P5"):
        return _decode_ppm(blob)
    if HAVE_PIL:  # pragma: no cover - PIL absent in this container
        # PIL first for PNG/JPEG when installed: the native codecs
        # below are real but their filter/Huffman inner loops are
        # Python — PIL is the C-speed production path.
        import io

        arr = np.asarray(Image.open(io.BytesIO(blob)))
        return arr.reshape(arr.shape[0], arr.shape[1], -1).astype(np.float64)
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        from model_presto_spark.sources.png import decode_png

        return decode_png(blob).astype(np.float64)
    if blob[:2] == b"\xff\xd8":
        from model_presto_spark.sources.jpeg import decode_jpeg

        return decode_jpeg(blob).astype(np.float64)
    return _fake_pixels(blob, h, w, c)


def decode_image_stats(df: DataFrame) -> DataFrame:
    """blob -> per-image channel means/stds.

    Output: (media_id, width, height, channel_mean array, channel_std
    array). Real decode for TIFF/PPM/PGM (native codecs), PIL for
    other formats when present, marked fake as last resort.
    """

    def go(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for _, r in pdf.iterrows():
                m = r["meta"]
                h, w, c = int(m["height"]), int(m["width"]), int(m["channels"])
                arr = decode_pixels(bytes(r["blob"]), h, w, c)
                h, w = arr.shape[0], arr.shape[1]  # trust the decoded shape
                out.append(
                    {
                        "media_id": int(r["media_id"]),
                        "width": w,
                        "height": h,
                        "channel_mean": arr.mean(axis=(0, 1)).tolist(),
                        "channel_std": arr.std(axis=(0, 1)).tolist(),
                    }
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "width", "height", "channel_mean", "channel_std"],
            )

    return df.select("media_id", "blob", "meta").mapInPandas(
        go,
        "media_id bigint, width int, height int, "
        "channel_mean array<double>, channel_std array<double>",
    )


def resize_images(df: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """blob -> resized pixel tensor rows (media_id, pixels flat
    array, shape). Nearest-neighbor on the decoded array; decode is
    real for TIFF/PPM/PGM (see ``decode_pixels``)."""

    def go(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for _, r in pdf.iterrows():
                m = r["meta"]
                h, w, c = int(m["height"]), int(m["width"]), int(m["channels"])
                arr = decode_pixels(bytes(r["blob"]), h, w, c)
                h, w, c = arr.shape
                ri = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                ci = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                res = arr[np.ix_(ri, ci)]
                out.append(
                    {
                        "media_id": int(r["media_id"]),
                        "shape": [out_h, out_w, c],
                        "pixels": res.ravel().tolist(),
                    }
                )
            yield pd.DataFrame(out, columns=["media_id", "shape", "pixels"])

    return df.select("media_id", "blob", "meta").mapInPandas(
        go, "media_id bigint, shape array<int>, pixels array<double>"
    )


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video blob -> one row per sampled frame
    (media_id, frame_ts_ms, frame_digest, n_bytes, demuxed).

    REAL for AVI containers (sources/avi.py): the RIFF chunk walk
    yields true frame boundaries and bytes; sampling keeps the first
    frame of each every_ms window and digests the actual frame
    payload (the digest an exact-dedup pass would key on). Other
    containers fall back to the duration-grid fake with
    ``demuxed=false`` — same schema contract as the image/audio
    fallbacks."""
    from model_presto_spark.sources.avi import extract_frames, is_avi

    def go(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for _, r in pdf.iterrows():
                blob = bytes(r["blob"])
                mid = int(r["media_id"])
                if is_avi(blob):
                    next_emit = 0.0
                    for _i, ts, fb in extract_frames(blob, "video"):
                        if ts + 1e-9 < next_emit:
                            continue
                        next_emit = ts + every_ms
                        out.append(
                            {
                                "media_id": mid,
                                "frame_ts_ms": int(round(ts)),
                                "frame_digest": hashlib.md5(fb).hexdigest(),
                                "n_bytes": len(fb),
                                "demuxed": True,
                            }
                        )
                    continue
                dur = int(r["meta"]["duration_ms"] or 0)
                for ts in range(0, max(dur, 1), every_ms):
                    digest = hashlib.md5(blob + ts.to_bytes(8, "big")).hexdigest()
                    out.append(
                        {
                            "media_id": mid,
                            "frame_ts_ms": ts,
                            "frame_digest": digest,
                            "n_bytes": len(blob),
                            "demuxed": False,
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=["media_id", "frame_ts_ms", "frame_digest",
                         "n_bytes", "demuxed"],
            )

    return df.select("media_id", "blob", "meta").mapInPandas(
        go,
        "media_id bigint, frame_ts_ms int, frame_digest string, "
        "n_bytes int, demuxed boolean",
    )


def blob_features(df: DataFrame, dim: int = 64) -> DataFrame:
    """blob -> fixed-width feature vector via byte-histogram +
    digest-seeded projection (a real, deterministic, codec-free
    featurizer — byte histograms are a legitimate cheap signal for
    dedup/clustering even before decode)."""

    def go(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for _, r in pdf.iterrows():
                blob = np.frombuffer(bytes(r["blob"]), dtype=np.uint8)
                hist = np.bincount(blob, minlength=256).astype(np.float64)
                hist /= max(hist.sum(), 1.0)
                rng = np.random.default_rng(12345)
                proj = rng.standard_normal((256, dim))
                out.append(
                    {
                        "media_id": int(r["media_id"]),
                        "features": (hist @ proj).tolist(),
                    }
                )
            yield pd.DataFrame(out, columns=["media_id", "features"])

    return df.select("media_id", "blob").mapInPandas(
        go, "media_id bigint, features array<double>"
    )
