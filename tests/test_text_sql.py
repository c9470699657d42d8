"""Pin the SQL-string text/dedup expression twins to the Column forms.

Round-9 converted the dedup builders (minhash_lsh_pairs,
ngram_jaccard_pairs, ngram_containment_pairs grams, simhash) to
SQL-string expression construction (guide §7.3 — q32's Column build
cost ~1,430 py4j round-trips). The twins must render the IDENTICAL
Catalyst trees: this test evaluates Column vs SQL side by side on real
text (including empty strings, short docs, unicode) and asserts exact
equality — hashes, signatures, band keys, pair expansions and jaccard
values, element-wise, no tolerance.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from model_presto_spark.functions import text as T
from model_presto_spark.operators.dedup import (
    _chain_pairs,
    _chain_pairs_sql,
    _pairs_within,
    _pairs_within_sql,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, ""),
        (4, "a"),
        (5, "  mixed   Whitespace\tand UPPER case  "),
        (6, "héllo wörld ünicode text für tests"),
        (7, "repeat repeat repeat repeat repeat repeat"),
        (8, "the quick brown fox jumps over the lazy dog"),
    ]
    return spark.createDataFrame(rows, "id INT, text STRING")


def _assert_equal(df, col_expr, sql_expr):
    both = df.select(
        col_expr.alias("col_built"), F.expr(sql_expr).alias("sql_built")
    )
    bad = both.where("col_built IS DISTINCT FROM sql_built").count()
    assert bad == 0


def test_h60_twins(docs):
    _assert_equal(docs, T.h60(F.col("text")), T.h60_sql("text"))
    _assert_equal(docs, T.h60(F.col("text"), seed=7), T.h60_sql("text", seed=7))
    _assert_equal(docs, T.h60_fast(F.col("text")), T.h60_fast_sql("text"))


def test_tokens_and_ngrams_twins(docs):
    _assert_equal(docs, T.tokens(F.col("text")), T.tokens_sql("text"))
    toksed = docs.select("id", T.tokens(F.col("text")).alias("toks"))
    _assert_equal(
        toksed, T.word_ngrams(F.col("toks"), 3), T.word_ngrams_sql("toks", 3)
    )


def test_shingles_and_hash_twins(docs):
    low = docs.select("id", F.lower(F.col("text")).alias("lc"))
    _assert_equal(
        low, T.char_shingles(F.col("lc"), 5), T.char_shingles_sql("lc", 5)
    )
    sh = low.select(T.char_shingles(F.col("lc"), 5).alias("s"))
    _assert_equal(sh, T.hash_array(F.col("s")), T.hash_array_sql("s"))
    _assert_equal(
        sh, T.hash_array(F.col("s"), fast=True), T.hash_array_sql("s", fast=True)
    )


def test_signature_band_jaccard_twins(docs):
    low = docs.select("id", F.lower(F.col("text")).alias("lc"))
    hs = low.select(
        "id", T.hash_array(T.char_shingles(F.col("lc"), 5)).alias("hs")
    )
    _assert_equal(
        hs,
        T.minhash_signature(F.col("hs"), 16),
        T.minhash_signature_sql("hs", 16),
    )
    sig = hs.select("id", T.minhash_signature(F.col("hs"), 16).alias("sig"))
    _assert_equal(
        sig, T.lsh_band_keys(F.col("sig"), 4, 4), T.lsh_band_keys_sql("sig", 4, 4)
    )
    # jaccard over two hash-set columns (incl. self-pair and disjoint)
    pairs = hs.toDF("id_a", "a").crossJoin(hs.toDF("id_b", "b"))
    _assert_equal(
        pairs, T.jaccard(F.col("a"), F.col("b")), T.jaccard_sql("a", "b")
    )


def test_lang_score_and_quality_twins(docs):
    toksed = docs.select(
        "text", T.tokens(F.col("text")).alias("toks")
    )
    for lang in T.LANG_STOPWORDS:
        _assert_equal(
            toksed,
            T.lang_scores(F.col("toks"))[lang],
            T.lang_score_sql("toks", lang),
        )
    col_feats = T.quality_features(F.col("text"), F.col("toks"))
    sql_feats = T.quality_features_sql("text", "toks")
    for k in col_feats:
        _assert_equal(toksed, col_feats[k], sql_feats[k])


def test_pair_expansion_twins(spark):
    df = spark.createDataFrame(
        [([1, 2, 3, 4, 5],), ([10, 20],), ([7],)], "ids ARRAY<BIGINT>"
    )
    _assert_equal(df, _pairs_within("ids"), _pairs_within_sql("ids"))
    _assert_equal(df, _chain_pairs("ids"), _chain_pairs_sql("ids"))
