"""Dependency-free RIFF/WAVE codec (numpy + struct only).

The reference treats media as opaque blobs with typed metadata; the
multimodal pipeline (SURVEY §2 multimodal rows) needs a REAL audio
decode path the way sources/tiff.py makes the image path real. This
container has no soundfile/librosa/ffmpeg, so this module implements
the subset of the WAVE spec a training-data pipeline actually meets:

- decode: PCM integer (8-bit unsigned, 16/24/32-bit signed) and
  IEEE float32/float64 sample formats, mono or multi-channel,
  including WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrappers; unknown RIFF
  chunks (LIST/fact/cue/bext...) are skipped by the chunk walk.
- encode: canonical 44-byte-header PCM int16 / float32 writer.

Samples are exchanged as float64 in [-1, 1], shaped ``(n_frames,
channels)`` — the shape/dtype contract downstream audio operators
(multimodal/audio.py) rely on regardless of on-disk sample format.

Compressed codecs (MP3/AAC/ADPCM...) are out of scope and raise a
clear error naming the format tag.
"""

from __future__ import annotations

import struct

import numpy as np

_WAVE_FORMAT_PCM = 0x0001
_WAVE_FORMAT_IEEE_FLOAT = 0x0003
_WAVE_FORMAT_EXTENSIBLE = 0xFFFE


class WavFormatError(ValueError):
    pass


def is_wav(blob: bytes) -> bool:
    return len(blob) >= 12 and blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """Decode a WAVE blob -> (samples float64 (n_frames, channels) in
    [-1, 1], sample_rate)."""
    if not is_wav(blob):
        raise WavFormatError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    data = None
    # Chunk walk: chunks are (4-byte id, uint32 size, payload, pad to
    # even). Unknown chunks are skipped, so broadcast-WAV metadata
    # (bext, LIST) does not break the decode.
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise WavFormatError("missing fmt or data chunk")
    tag, channels, rate, _brate, _align, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if tag == _WAVE_FORMAT_EXTENSIBLE:
        if len(fmt) < 26:
            raise WavFormatError("truncated WAVE_FORMAT_EXTENSIBLE fmt chunk")
        # SubFormat GUID's first two bytes are the real format tag.
        (tag,) = struct.unpack_from("<H", fmt, 24)
    if channels < 1 or rate < 1:
        raise WavFormatError(f"bad fmt: channels={channels} rate={rate}")
    if tag == _WAVE_FORMAT_IEEE_FLOAT:
        if bits == 32:
            arr = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bits == 64:
            arr = np.frombuffer(data, dtype="<f8").astype(np.float64)
        else:
            raise WavFormatError(f"IEEE float with {bits} bits")
    elif tag == _WAVE_FORMAT_PCM:
        if bits == 8:
            arr = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
        elif bits == 16:
            arr = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(data, dtype=np.uint8)
            raw = raw[: (len(raw) // 3) * 3].reshape(-1, 3).astype(np.uint32)
            val = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
            signed = val.astype(np.int32)
            signed[signed >= 1 << 23] -= 1 << 24
            arr = signed.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            arr = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
        else:
            raise WavFormatError(f"PCM with {bits} bits")
    else:
        raise WavFormatError(f"unsupported WAVE format tag 0x{tag:04x}")
    n = (len(arr) // channels) * channels
    return arr[:n].reshape(-1, channels), int(rate)


def encode_wav(
    samples: np.ndarray, sample_rate: int, sample_format: str = "int16"
) -> bytes:
    """Encode float samples in [-1, 1] (``(n,)`` or ``(n, channels)``)
    to a canonical WAVE blob. ``sample_format``: 'int16' | 'float32'."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise WavFormatError(f"samples must be 1-D or 2-D, got shape {arr.shape}")
    channels = arr.shape[1]
    if sample_format == "int16":
        tag, bits = _WAVE_FORMAT_PCM, 16
        payload = (
            np.clip(np.rint(arr * 32768.0), -32768, 32767)
            .astype("<i2")
            .tobytes()
        )
    elif sample_format == "float32":
        tag, bits = _WAVE_FORMAT_IEEE_FLOAT, 32
        payload = arr.astype("<f4").tobytes()
    else:
        raise WavFormatError(f"unsupported sample_format {sample_format!r}")
    block = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", tag, channels, sample_rate, sample_rate * block, block, bits
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", len(body)) + body
