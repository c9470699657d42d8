"""Unit tests for the round-5 operators: character-class census,
Flesch readability, cross-source overlap. (Oracle parity of the
q130-q132 query forms is covered by test_queries_oracle.py; these
pin operator semantics on hand-computed fixtures.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_charclass_counts_exact(spark):
    from model_presto_spark.functions.text import charclass_counts

    df = spark.createDataFrame([("Ab1. x\ty\n",)], "text string")
    cc = charclass_counts(F.col("text"))
    row = df.select(
        cc["n_chars"].alias("c"),
        cc["n_upper"].alias("u"),
        cc["n_digit"].alias("d"),
        cc["n_punct"].alias("p"),
        cc["n_space"].alias("s"),
    ).first()
    assert (row.c, row.u, row.d, row.p, row.s) == (9, 1, 1, 1, 3)


def test_charclass_empty_text_has_zero_ratios(spark):
    from model_presto_spark.functions.text import charclass_counts

    df = spark.createDataFrame([("",)], "text string")
    cc = charclass_counts(F.col("text"))
    row = df.select(cc["upper_ratio"].alias("r")).first()
    assert row.r == 0.0


def test_readability_counts(spark):
    from model_presto_spark.functions.text import readability_features

    # 4 words, 2 sentence runs ("." and "!?"), syllable groups:
    # "the"->e(1), "cat"->a(1), "ran"->a(1), "away"->a,ay(2) = 5
    df = spark.createDataFrame([("The cat ran. away!?",)], "text string")
    rf = readability_features(F.col("text"))
    row = df.select(
        rf["n_words"].alias("w"),
        rf["n_sentences"].alias("s"),
        rf["n_syllables"].alias("y"),
        rf["flesch"].alias("f"),
    ).first()
    assert (row.w, row.s, row.y) == (4, 2, 5)
    expected = 206.835 - 1.015 * (4 / 2) - 84.6 * (5 / 4)
    assert abs(row.f - expected) < 1e-9


def test_readability_min_one_sentence(spark):
    from model_presto_spark.functions.text import readability_features

    df = spark.createDataFrame([("no terminator here",)], "text string")
    rf = readability_features(F.col("text"))
    assert df.select(rf["n_sentences"].alias("s")).first().s == 1


def test_source_overlap_jaccard(spark):
    from model_presto_spark.operators.dedup import source_overlap

    rows = [
        ("a", "shared doc one"),
        ("a", "only in a"),
        ("b", "Shared   doc ONE"),  # normalizes equal to a's first doc
        ("b", "only in b"),
        ("b", "also only b"),
        ("c", "nothing common"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {
        (r.source_a, r.source_b): r
        for r in source_overlap(df, "source", "text").collect()
    }
    assert set(out) == {("a", "b")}
    r = out[("a", "b")]
    # |A|=2, |B|=3, shared=1 -> jaccard = 1/4
    assert (r.n_shared, r.n_a, r.n_b) == (1, 2, 3)
    assert abs(r.jaccard - 0.25) < 1e-12


def test_source_overlap_prefix_tokens(spark):
    from model_presto_spark.operators.dedup import source_overlap

    rows = [
        ("a", "alpha beta gamma TAIL-A unique"),
        ("b", "alpha beta gamma other tail entirely"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    full = source_overlap(df, "source", "text").count()
    lead = source_overlap(df, "source", "text", prefix_tokens=3).collect()
    assert full == 0  # full bodies differ
    assert len(lead) == 1 and lead[0].n_shared == 1
