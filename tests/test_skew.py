"""Skew-mitigation operator tests."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_salted_count_matches_plain(spark):
    from model_presto_spark.operators.skew import salted_count

    # one pathologically hot key
    df = spark.range(5000).select(
        F.when(F.col("id") < 4500, "hot").otherwise(F.col("id").cast("string")).alias("k")
    )
    got = {r.k: r.n for r in salted_count(df, "k", buckets=8).collect()}
    assert got["hot"] == 4500
    assert sum(got.values()) == 5000


def test_salted_join_matches_plain(spark):
    from model_presto_spark.operators.skew import salted_join

    big = spark.range(2000).select(
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame([Row(k="a", tag=1), Row(k="b", tag=2)])
    out = salted_join(big, small, "k", buckets=4)
    assert out.count() == 2000
    plain = big.join(small, "k")
    assert (
        out.groupBy("k").agg(F.sum("v").alias("s")).orderBy("k").collect()
        == plain.groupBy("k").agg(F.sum("v").alias("s")).orderBy("k").collect()
    )
