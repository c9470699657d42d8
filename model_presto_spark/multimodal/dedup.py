"""Multimodal near-duplicate detection — the video/audio twins of
the text dedup stack, built on the REAL decode paths:

- ``video_dup_pairs``: sampled-frame digests (true payload digests
  for AVI via sources/avi.py) feed the same inverted-index +
  pair-expansion shape as text n-gram Jaccard — one shuffle of
  (digest, id) postings, document-frequency cutoff as the skew
  guard, Jaccard over per-video distinct frame sets. A re-encoded
  copy with identical frames scores 1.0; partial overlaps (clips,
  concatenations) score their shared-frame fraction.
- ``audio_dup_pairs``: spectral-feature vectors (Hann rFFT band
  log-energies, multimodal/audio.py) compared by cosine through the
  hyperplane-LSH ANN join — the same bucketed, crossJoin-free plan
  as embedding dedup (knn.ann_lsh_join).

Both compose operators that are individually oracle/unit-verified;
tests plant duplicate media and assert the planted pairs (and only
those) surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def video_dup_pairs(
    media: DataFrame,
    every_ms: int = 500,
    threshold: float = 0.5,
    max_frame_freq: int = 1000,
) -> DataFrame:
    """(id_a, id_b, jaccard_sim) over sampled-frame digest sets.
    ``max_frame_freq`` drops frames shared by too many videos (test
    cards, black frames) before pair expansion — the d² skew guard."""
    from model_presto_spark.multimodal.blobs import sample_frames
    from model_presto_spark.operators.dedup import _pairs_within

    frames = sample_frames(media, every_ms=every_ms).select(
        F.col("media_id").alias("id"), F.col("frame_digest").alias("d")
    ).distinct()
    sizes = frames.groupBy("id").agg(F.count(F.lit(1)).alias("n_frames"))
    buckets = (
        frames.groupBy("d")
        .agg(F.array_sort(F.collect_list("id")).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_frame_freq))
    )
    common = (
        buckets.select(F.explode_outer(_pairs_within("ids")).alias("pr"))
        .groupBy(F.col("pr.id_a").alias("id_a"), F.col("pr.id_b").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_frames").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_frames").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast(
                    "double"
                )
            ).alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") >= threshold)
    )


def audio_dup_pairs(
    media: DataFrame,
    threshold: float = 0.99,
    n_bands: int = 32,
    planes: int = 10,
    k: int = 3,
) -> DataFrame:
    """(id_a, id_b, cosine_sim) for near-identical audio via
    spectral fingerprints + hyperplane-LSH candidate buckets (no
    crossJoin). Re-encoded/resampled copies of a clip keep nearly
    identical band-energy profiles -> cosine ~ 1."""
    from model_presto_spark.multimodal.audio import spectral_features
    from model_presto_spark.operators.knn import ann_lsh_join

    feats = spectral_features(media, n_bands=n_bands).select(
        F.col("media_id").alias("fid"), F.col("features").alias("vec")
    )
    probes = feats.select(F.col("fid").alias("pid"), "vec")
    cands = feats.select(F.col("fid").alias("cid"), "vec")
    ann = ann_lsh_join(
        probes, cands, "pid", "cid", probe_vec="vec", cand_vec="vec",
        k=k, dim=n_bands, planes=planes,
    )
    pairs = ann.select(
        F.least("pid", "cid").alias("id_a"),
        F.greatest("pid", "cid").alias("id_b"),
        "cosine_sim",
    ).filter(F.col("cosine_sim") >= threshold)
    return pairs.dropDuplicates(["id_a", "id_b"])
