"""Bloom prefilter join, count-min sketch, and CIDR LPM operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def test_bloom_join_equals_plain_join(spark):
    from model_presto_spark.operators.bloom import bloom_prefilter_join

    probe = spark.range(3000).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("v")
    )
    build = spark.range(100).select(
        (F.col("id") * 3).alias("k"), F.lit("x").alias("tag")
    )
    got = bloom_prefilter_join(probe, build, on="k", num_bits=1 << 12)
    plain = probe.join(build, "k")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, plain.collect()))


def test_bloom_no_false_negatives_and_low_fpr(spark):
    from model_presto_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )

    build = spark.range(1000).select(F.col("id").alias("k"))
    words = bloom_build(build, "k", num_bits=1 << 14, num_hashes=3)
    # members: every one of the 1000 keys must pass (no false negatives)
    members = spark.range(1000).select(F.col("id").alias("k"))
    n_members = members.where(
        bloom_might_contain(F.col("k"), words)
    ).count()
    assert n_members == 1000
    # non-members (disjoint range): false-positive rate stays small
    others = spark.range(1000, 11000).select(F.col("id").alias("k"))
    n_fp = others.where(bloom_might_contain(F.col("k"), words)).count()
    # theoretical fpr at m=16384, n=1000, k=3 is ~0.4%; allow 5x slack
    assert n_fp / 10000 < 0.02


def test_bloom_rejects_outer_join(spark):
    from model_presto_spark.operators.bloom import bloom_prefilter_join

    df = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        bloom_prefilter_join(df, df, on="k", how="left")


def test_cms_never_undercounts_and_merges(spark):
    from model_presto_spark.operators.cms import (
        cms_build,
        cms_estimate,
        cms_merge,
    )

    # zipf-ish: key i appears (50 - i) times
    rows = [Row(k=f"key{i}") for i in range(50) for _ in range(50 - i)]
    df = spark.createDataFrame(rows)
    sketch = cms_build(df, "k", depth=4, width=256)
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("exact"))
    est = cms_estimate(exact, sketch, "k", depth=4, width=256)
    n_total = df.count()
    for r in est.collect():
        assert r.cms_est >= r.exact
        assert r.cms_est <= r.exact + 4.0 * n_total / 256
    # merge of two halves == sketch of the union, cell for cell
    s1 = cms_build(df.where(F.col("k") < "key3"), "k", depth=4, width=256)
    s2 = cms_build(df.where(~(F.col("k") < "key3")), "k", depth=4, width=256)
    merged = cms_merge(s1, s2)
    full = cms_build(df, "k", depth=4, width=256)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_lpm_join_longest_prefix_wins(spark):
    from model_presto_spark.operators.net import lpm_join

    blocks = spark.createDataFrame(
        [
            ("wide", 8, 10),  # 10.0.0.0/8
            ("narrow", 16, 10 * 256 + 1),  # 10.1.0.0/16 (inside wide)
        ],
        schema="label string, plen int, prefix long",
    )
    probe = spark.createDataFrame(
        [
            Row(id=1, ip=(10 << 24) + (1 << 16) + 5),  # in 10.1/16 -> narrow
            Row(id=2, ip=(10 << 24) + (2 << 16) + 5),  # only 10/8 -> wide
            Row(id=3, ip=(11 << 24) + 5),  # unrouted
        ]
    )
    got = {
        r.id: (r.label, r.matched_plen)
        for r in lpm_join(
            probe, blocks, ip_col="ip", id_cols=["id"], label_cols=["label"]
        ).collect()
    }
    assert got[1] == ("narrow", 16)
    assert got[2] == ("wide", 8)
    assert got[3] == (None, None)
