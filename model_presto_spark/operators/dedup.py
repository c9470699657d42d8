"""Deduplication operators for training-data pipelines.

Four families, all shuffle-frugal by construction:

- **Exact**: hash-groupBy on a normalized fingerprint. One shuffle of
  (60-bit key, id) pairs, never document bodies.
- **MinHash + LSH**: shingle → O(num_hashes) signature per doc →
  band keys → bucket equi-join for candidates → exact Jaccard verify
  on the candidates only. The bucket join is the scale path: no
  O(n²) pair enumeration; skewed buckets are split by AQE.
- **SimHash**: 60-bit signature; near-dup candidates share a band of
  the signature (Hamming-style blocking).
- **n-gram Jaccard**: inverted-index join (explode n-grams → postings
  → pairs within a posting), with a document-frequency cutoff so
  stop-grams don't explode the join.

Reference: the reference system has no dedup (its records are keyed
by construction); these operators extend the engine for the
100 TB training-corpus use-case. Compare reference's idempotent
materialization keys (presto-tolbi/presto/dataops/dataset.py:63-117)
for the exact-key pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from model_presto_spark.functions.text import (
    char_shingles,
    fingerprint60,
    jaccard,
    lsh_band_keys,
    minhash_signature,
    simhash60_expr,
    word_ngrams,
)


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the min-id representative per normalized-text fingerprint.

    Adds ``fingerprint`` and ``dup_count`` columns; one row per
    distinct fingerprint.
    """
    fp = df.select(F.col(id_col), fingerprint60(F.col(text_col)).alias("fingerprint"))
    return fp.groupBy("fingerprint").agg(
        F.min(id_col).alias(id_col),
        F.count(F.lit(1)).alias("dup_count"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash LSH, verified with
    exact Jaccard over shingle sets.

    Returns (id_a, id_b, jaccard_sim) with id_a < id_b and
    jaccard_sim >= threshold. Only bucket-collision candidates are
    verified — the exact-Jaccard step touches a tiny fraction of the
    pair space.
    """
    rows_per_band = num_hashes // bands
    sh = df.select(
        F.col(id_col).alias("id"),
        char_shingles(F.col(text_col), shingle_k).alias("shingles"),
    )
    sig = sh.select(
        "id", "shingles", minhash_signature(F.col("shingles"), num_hashes).alias("sig")
    )
    banded = sig.select(
        "id",
        "shingles",
        F.explode(lsh_band_keys(F.col("sig"), bands, rows_per_band)).alias("bk"),
    ).select("id", "shingles", F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket"))

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.select(
            "id_a", "id_b", jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard_sim")
        )
        .filter(F.col("jaccard_sim") >= threshold)
    )


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document 60-bit SimHash over whitespace tokens."""
    return df.select(F.col(id_col), simhash60_expr(text_col).alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.3,
    max_doc_freq: int = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard pairs via an inverted-index join.

    explode(ngrams) → drop grams with document frequency >
    ``max_doc_freq`` (stop-gram cutoff — the skew guard at scale) →
    self-join postings → per-pair common-gram count → Jaccard from
    per-doc distinct counts.
    """
    grams = df.select(
        F.col(id_col).alias("id"), word_ngrams(F.col(text_col), n).alias("grams")
    )
    sizes = grams.select("id", F.size("grams").alias("n_grams"))
    posting = grams.select("id", F.explode("grams").alias("gram"))
    df_counts = posting.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    posting = posting.join(
        df_counts.filter(F.col("df") <= max_doc_freq).select("gram"), "gram"
    )
    a = posting.alias("a")
    b = posting.alias("b")
    common = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_grams").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_grams").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double")
            ).alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") >= threshold)
    )


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (brute-force O(n²) —
    correctness baseline; use LSH/IVF variants at scale)."""
    from model_presto_spark.functions.vectors import cosine_similarity

    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine_similarity(F.col("va"), F.col("vb")).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def keep_representatives(
    df: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Drop every doc that appears as the larger id of a dup pair.

    Single-link 'min-id wins within a pair' policy: cheap, one
    anti-join, and deterministic. (Full transitive clustering would
    need iterative connected components — see operators/graph.py.)
    """
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")
