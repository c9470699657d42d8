"""Audio blob operators — REAL decode via the dependency-free WAV
codec (sources/wav.py), Arrow-batched ``mapInPandas`` execution.

Same design as the image path in multimodal/blobs.py: the blob is an
opaque ``binary`` column, decode runs batched in Python workers, and
every operator keeps a codec-agnostic schema contract so a corpus can
mix real WAV rows with rows whose codec this container cannot decode
(MP3/AAC...) — those fall back to a digest-seeded fake synthesized
from the typed metadata, clearly marked by ``decoded=false``.

At 100 TB the blobs dominate; every operator projects only
``(media_id, blob[, meta])`` before the Python stage so Parquet scans
stay narrow, and output rows carry stats/features only (bytes are
never re-shipped unless the operator's purpose is transcoding).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from model_presto_spark.sources.wav import decode_wav, encode_wav, is_wav


def _decode_any(
    blob: bytes, meta_rate: int, meta_duration_ms: int
) -> tuple[np.ndarray, int, bool]:
    """(samples (n, ch), rate, decoded_for_real). Non-WAV blobs get a
    digest-seeded fake sized from the metadata so downstream shapes
    stay honest."""
    if is_wav(blob):
        samples, rate = decode_wav(blob)
        return samples, rate, True
    rate = int(meta_rate or 16000)
    n = max(int(rate * (meta_duration_ms or 1000) / 1000), 1)
    seed = int.from_bytes(hashlib.md5(blob).digest()[:8], "big") % (2**31)
    rng = np.random.default_rng(seed)
    return rng.uniform(-1.0, 1.0, size=(n, 1)), rate, False


def decode_audio_stats(df: DataFrame) -> DataFrame:
    """blob -> per-clip signal stats: sample_rate, channels, n_frames,
    duration_ms, rms, peak, zero-crossing rate (mono mix)."""

    def go(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for _, r in pdf.iterrows():
                meta = r["meta"]
                samples, rate, real = _decode_any(
                    bytes(r["blob"]), meta["sample_rate"], meta["duration_ms"]
                )
                mono = samples.mean(axis=1)
                zc = (
                    float(np.count_nonzero(np.diff(np.signbit(mono)))) / len(mono)
                    if len(mono) > 1
                    else 0.0
                )
                out.append(
                    {
                        "media_id": int(r["media_id"]),
                        "sample_rate": rate,
                        "channels": int(samples.shape[1]),
                        "n_frames": int(samples.shape[0]),
                        "duration_ms": int(round(samples.shape[0] * 1000.0 / rate)),
                        "rms": float(np.sqrt(np.mean(mono**2))),
                        "peak": float(np.max(np.abs(samples))),
                        "zcr": zc,
                        "decoded": bool(real),
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "sample_rate", "channels", "n_frames",
                    "duration_ms", "rms", "peak", "zcr", "decoded",
                ],
            )

    return df.select("media_id", "blob", "meta").mapInPandas(
        go,
        "media_id bigint, sample_rate int, channels int, n_frames int, "
        "duration_ms int, rms double, peak double, zcr double, decoded boolean",
    )


def resample_audio(
    df: DataFrame, target_rate: int, sample_format: str = "float32"
) -> DataFrame:
    """Transcode every clip to ``target_rate`` via per-channel linear
    interpolation; emits a new WAV blob + refreshed meta. This is the
    one audio operator that re-ships bytes — it IS a transcoder."""

    def go(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for _, r in pdf.iterrows():
                meta = r["meta"]
                samples, rate, _real = _decode_any(
                    bytes(r["blob"]), meta["sample_rate"], meta["duration_ms"]
                )
                n_out = max(int(round(samples.shape[0] * target_rate / rate)), 1)
                t_out = np.arange(n_out) * (rate / target_rate)
                t_in = np.arange(samples.shape[0])
                res = np.stack(
                    [np.interp(t_out, t_in, samples[:, c]) for c in range(samples.shape[1])],
                    axis=1,
                )
                out.append(
                    {
                        "media_id": int(r["media_id"]),
                        "blob": encode_wav(res, target_rate, sample_format),
                        "sample_rate": int(target_rate),
                        "n_frames": int(n_out),
                        "duration_ms": int(round(n_out * 1000.0 / target_rate)),
                    }
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "blob", "sample_rate", "n_frames", "duration_ms"],
            )

    return df.select("media_id", "blob", "meta").mapInPandas(
        go,
        "media_id bigint, blob binary, sample_rate int, n_frames int, "
        "duration_ms int",
    )


def spectral_features(
    df: DataFrame, n_bands: int = 32, frame: int = 1024, hop: int = 512
) -> DataFrame:
    """blob -> fixed-width log-energy spectrum: Hann-windowed rFFT
    frames, magnitudes pooled into ``n_bands`` linear bands, averaged
    over frames. The audio analogue of decode_image_stats — a real,
    deterministic featurizer for clustering/dedup over audio corpora."""

    def go(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        win = np.hanning(frame)
        for pdf in it:
            out = []
            for _, r in pdf.iterrows():
                meta = r["meta"]
                samples, rate, _real = _decode_any(
                    bytes(r["blob"]), meta["sample_rate"], meta["duration_ms"]
                )
                mono = samples.mean(axis=1)
                if len(mono) < frame:
                    mono = np.pad(mono, (0, frame - len(mono)))
                starts = range(0, len(mono) - frame + 1, hop)
                acc = np.zeros(n_bands)
                count = 0
                for s in starts:
                    mag = np.abs(np.fft.rfft(mono[s : s + frame] * win))
                    # Pool |rfft| bins into n_bands equal-width bands.
                    bands = np.add.reduceat(
                        mag**2, np.linspace(0, len(mag), n_bands, endpoint=False).astype(int)
                    )
                    acc += np.log1p(bands)
                    count += 1
                feats = acc / max(count, 1)
                out.append(
                    {
                        "media_id": int(r["media_id"]),
                        "sample_rate": rate,
                        "features": feats.tolist(),
                    }
                )
            yield pd.DataFrame(out, columns=["media_id", "sample_rate", "features"])

    return df.select("media_id", "blob", "meta").mapInPandas(
        go, "media_id bigint, sample_rate int, features array<double>"
    )
