"""WAV codec + audio operator tests: codec roundtrips, known-signal
stats (sine RMS/ZCR), resample length math, spectral peak location,
and the Spark mapInPandas end-to-end path."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from model_presto_spark.sources.wav import (
    WavFormatError,
    decode_wav,
    encode_wav,
    is_wav,
)


def _sine(freq, rate, seconds, amp=0.5):
    t = np.arange(int(rate * seconds)) / rate
    return amp * np.sin(2 * np.pi * freq * t)


# --- codec ------------------------------------------------------------------


def test_wav_roundtrip_int16_mono():
    x = _sine(440, 8000, 0.5)
    blob = encode_wav(x, 8000, "int16")
    assert is_wav(blob)
    y, rate = decode_wav(blob)
    assert rate == 8000 and y.shape == (4000, 1)
    assert np.max(np.abs(y[:, 0] - x)) < 1.0 / 32000


def test_wav_roundtrip_float32_stereo():
    x = np.stack([_sine(440, 16000, 0.25), _sine(880, 16000, 0.25)], axis=1)
    y, rate = decode_wav(encode_wav(x, 16000, "float32"))
    assert rate == 16000 and y.shape == x.shape
    assert np.max(np.abs(y - x)) < 1e-6


def test_wav_skips_unknown_chunks_and_extensible():
    import struct

    x = _sine(100, 4000, 0.1)
    blob = encode_wav(x, 4000, "int16")
    # Rebuild with a LIST chunk before fmt and an EXTENSIBLE fmt tag.
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 4000, 8000, 2, 16)
    # cbSize=22, validBits=16, channelMask, then the SubFormat GUID
    # whose first two bytes are the real tag (PCM=1).
    fmt += struct.pack("<HHI", 22, 16, 0x4) + struct.pack("<H", 1) + b"\x00" * 14
    data = blob[44:]
    body = (
        b"WAVE"
        + b"LIST" + struct.pack("<I", 4) + b"INFO"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    wrapped = b"RIFF" + struct.pack("<I", len(body)) + body
    y, rate = decode_wav(wrapped)
    assert rate == 4000 and len(y) == len(x)


def test_wav_rejects_compressed_tag():
    import struct

    fmt = struct.pack("<HHIIHH", 0x0055, 1, 8000, 8000, 1, 16)  # MP3 tag
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 2) + b"\x00\x00"
    )
    with pytest.raises(WavFormatError, match="0x0055"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_wav_24bit_pcm_decode():
    import struct

    # Hand-build a 24-bit PCM data chunk with known values.
    vals = [0, 1 << 22, -(1 << 22), (1 << 23) - 1]
    payload = b"".join(
        (v & 0xFFFFFF).to_bytes(3, "little") for v in vals
    )
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 24000, 3, 24)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    y, _ = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    expect = np.array(vals, dtype=np.float64) / (1 << 23)
    assert np.allclose(y[:, 0], expect, atol=1e-9)


# --- Spark operators --------------------------------------------------------


@pytest.fixture()
def audio_df(spark):
    rows = [
        Row(
            media_id=1,
            kind="audio",
            blob=encode_wav(_sine(440, 8000, 1.0), 8000, "int16"),
            meta=Row(width=0, height=0, channels=1, sample_rate=8000,
                     duration_ms=1000, codec="wav"),
        ),
        Row(
            media_id=2,
            kind="audio",
            blob=b"\xffNOTAWAV" * 40,  # undecodable -> marked fake
            meta=Row(width=0, height=0, channels=1, sample_rate=4000,
                     duration_ms=500, codec="mp3"),
        ),
    ]
    return spark.createDataFrame(rows)


def test_decode_audio_stats(spark, audio_df):
    from model_presto_spark.multimodal.audio import decode_audio_stats

    out = {r.media_id: r for r in decode_audio_stats(audio_df).collect()}
    s = out[1]
    assert s.decoded and s.sample_rate == 8000 and s.n_frames == 8000
    assert s.duration_ms == 1000
    # sine RMS = amp/sqrt(2); int16 quantization keeps it within 1e-3
    assert abs(s.rms - 0.5 / np.sqrt(2)) < 1e-3
    # ZCR of a sine ~ 2f/rate crossings per sample
    assert abs(s.zcr - 2 * 440 / 8000) < 0.01
    f = out[2]
    assert not f.decoded and f.sample_rate == 4000 and f.n_frames == 2000


def test_resample_audio_roundtrip(spark, audio_df):
    from model_presto_spark.multimodal.audio import resample_audio

    out = {r.media_id: r for r in resample_audio(audio_df, 4000).collect()}
    r = out[1]
    assert r.sample_rate == 4000 and r.n_frames == 4000 and r.duration_ms == 1000
    y, rate = decode_wav(bytes(r.blob))
    assert rate == 4000
    # Downsampled sine keeps its RMS
    assert abs(np.sqrt(np.mean(y**2)) - 0.5 / np.sqrt(2)) < 5e-3


def test_spectral_features_peak_band(spark, audio_df):
    from model_presto_spark.multimodal.audio import spectral_features

    out = {
        r.media_id: r.features
        for r in spectral_features(audio_df, n_bands=16, frame=512, hop=256).collect()
    }
    feats = np.array(out[1])
    assert feats.shape == (16,)
    # 440 Hz at rate 8000, frame 512: bin = 440/8000*512 ~ 28.2 of 257
    # rfft bins -> band floor(28.2/(257/16)) = 1
    assert int(np.argmax(feats)) == 1
    assert len(out[2]) == 16  # fake path keeps the schema contract


# --- AVI demux (video container) -------------------------------------------


def test_avi_roundtrip_demux():
    import hashlib

    from model_presto_spark.sources.avi import (
        demux_avi,
        encode_avi_mjpeg,
        extract_frames,
        is_avi,
    )

    frames = [b"\xff\xd8FRAME%d\xff\xd9" % i * (i + 1) for i in range(10)]
    blob = encode_avi_mjpeg(frames, fps=10.0, width=64, height=48)
    assert is_avi(blob)
    meta = demux_avi(blob)
    assert abs(meta["fps"] - 10.0) < 1e-6 and meta["n_streams"] == 1
    got = extract_frames(blob, "video")
    assert len(got) == 10
    for i, (idx, ts, fb) in enumerate(got):
        assert idx == i and abs(ts - i * 100.0) < 1e-6
        assert fb == frames[i]
        assert hashlib.md5(fb).hexdigest() == hashlib.md5(frames[i]).hexdigest()


def test_sample_frames_real_avi(spark):
    from pyspark.sql import Row

    from model_presto_spark.multimodal.blobs import sample_frames
    from model_presto_spark.sources.avi import encode_avi_mjpeg

    import hashlib

    frames = [b"\xff\xd8JPEGDATA%02d\xff\xd9" % i for i in range(10)]
    blob = encode_avi_mjpeg(frames, fps=10.0)  # 100ms per frame
    rows = [
        Row(
            media_id=7,
            kind="video",
            blob=blob,
            meta=Row(width=0, height=0, channels=0, sample_rate=0,
                     duration_ms=1000, codec="mjpeg"),
        )
    ]
    df = spark.createDataFrame(rows)
    got = sorted(
        sample_frames(df, every_ms=300).collect(),
        key=lambda r: r.frame_ts_ms,
    )
    # frames at 0,100,...,900ms; 300ms sampling keeps 0,300,600,900
    assert [r.frame_ts_ms for r in got] == [0, 300, 600, 900]
    assert all(r.demuxed for r in got)
    # digests are of the ACTUAL frame payloads
    assert got[1].frame_digest == hashlib.md5(frames[3]).hexdigest()
    assert got[0].n_bytes == len(frames[0])
