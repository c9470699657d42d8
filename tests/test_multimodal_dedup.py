"""Multimodal dedup: planted duplicate videos (shared frames) and
duplicate audio clips (same signal re-encoded) surface — and only
they do."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row


def _meta(duration_ms=0, rate=0):
    return Row(width=0, height=0, channels=0, sample_rate=rate,
               duration_ms=duration_ms, codec="x")


@pytest.fixture()
def video_corpus(spark):
    from model_presto_spark.sources.avi import encode_avi_mjpeg

    def clip(tag, n, start=0):
        return [b"\xff\xd8%s%04d\xff\xd9" % (tag, start + i) for i in range(n)]

    a = clip(b"A", 10)
    rows = [
        Row(media_id=1, kind="video", blob=encode_avi_mjpeg(a, 10.0),
            meta=_meta(1000)),
        # exact re-mux of the same frames -> jaccard 1.0
        Row(media_id=2, kind="video", blob=encode_avi_mjpeg(a, 10.0),
            meta=_meta(1000)),
        # half-overlap: last 5 frames of A + 5 new
        Row(media_id=3, kind="video",
            blob=encode_avi_mjpeg(a[5:] + clip(b"C", 5), 10.0),
            meta=_meta(1000)),
        # unrelated
        Row(media_id=4, kind="video", blob=encode_avi_mjpeg(clip(b"D", 10), 10.0),
            meta=_meta(1000)),
    ]
    return spark.createDataFrame(rows)


def test_video_dup_pairs(spark, video_corpus):
    from model_presto_spark.multimodal.dedup import video_dup_pairs

    # every_ms=100 at 10fps keeps every frame
    pairs = {
        (r.id_a, r.id_b): round(r.jaccard_sim, 4)
        for r in video_dup_pairs(video_corpus, every_ms=100,
                                 threshold=0.3).collect()
    }
    assert pairs[(1, 2)] == 1.0
    # 5 shared of (10 + 10 - 5) = 1/3
    assert abs(pairs[(1, 3)] - 1 / 3) < 1e-4
    assert abs(pairs[(2, 3)] - 1 / 3) < 1e-4
    assert all(4 not in p for p in pairs)


def test_audio_dup_pairs(spark):
    from model_presto_spark.multimodal.dedup import audio_dup_pairs
    from model_presto_spark.sources.wav import encode_wav

    def sine(freq, rate=8000, secs=1.0, amp=0.5):
        t = np.arange(int(rate * secs)) / rate
        return amp * np.sin(2 * np.pi * freq * t)

    rows = [
        # 440 Hz clip, int16 and float32 encodings of the same signal
        Row(media_id=1, kind="audio",
            blob=encode_wav(sine(440), 8000, "int16"), meta=_meta(1000, 8000)),
        Row(media_id=2, kind="audio",
            blob=encode_wav(sine(440), 8000, "float32"),
            meta=_meta(1000, 8000)),
        # different content
        Row(media_id=3, kind="audio",
            blob=encode_wav(sine(1800), 8000, "int16"), meta=_meta(1000, 8000)),
    ]
    df = spark.createDataFrame(rows)
    pairs = {
        (r.id_a, r.id_b)
        for r in audio_dup_pairs(df, threshold=0.995).collect()
    }
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def _ppm(gray: "np.ndarray") -> bytes:
    h, w = gray.shape
    return b"P5 %d %d 255\n" % (w, h) + gray.astype(np.uint8).tobytes()


def test_image_dup_pairs_phash(spark):
    from model_presto_spark.multimodal.dedup import image_dup_pairs, image_phash

    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, size=(32, 32))
    rows = [
        Row(media_id=1, kind="image", blob=_ppm(base), meta=_meta()),
        # brightness-scaled copy: aHash thresholds at the mean, so the
        # bit pattern survives affine scaling -> tiny hamming
        Row(media_id=2, kind="image", blob=_ppm((base * 0.8)), meta=_meta()),
        Row(media_id=3, kind="image",
            blob=_ppm(rng.integers(0, 256, size=(32, 32))), meta=_meta()),
    ]
    df = spark.createDataFrame(rows)
    hashes = {r.media_id: r.phash for r in image_phash(df).collect()}
    assert bin(hashes[1] ^ hashes[2]).count("1") <= 4
    assert bin(hashes[1] ^ hashes[3]).count("1") > 10

    pairs = {(r.id_a, r.id_b): r.hamming
             for r in image_dup_pairs(df, max_hamming=6).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 4
    assert all(3 not in p for p in pairs)

    import pytest as _pt
    with _pt.raises(ValueError, match="pigeonhole"):
        image_dup_pairs(df, max_hamming=8, bands=8)
