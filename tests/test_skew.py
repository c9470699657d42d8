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


def test_skew_stats(spark):
    from model_presto_spark.operators.skew import skew_stats

    from pyspark.sql import functions as F

    # 1000 rows: key 'hot' holds 40%, the rest spread over 60 keys
    df = spark.range(1000).select(
        F.when(F.col("id") < 400, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 60).cast("string")))
        .alias("key")
    )
    s = skew_stats(df, "key", top=3).collect()[0]
    assert s.n_rows == 1000 and s.n_keys == 61
    assert abs(s.max_share - 0.4) < 1e-9
    assert s.top_keys[0].k == "hot" and s.top_keys[0].n == 400
    assert len(s.top_keys) == 3
