"""Bucketed co-located join: the join plan must contain no shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bucketed_join_elides_shuffle(spark, tmp_path):
    from model_presto_spark.operators.bucketing import (
        bucketed_join,
        plan_has_shuffle,
        write_bucketed,
    )

    a = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed(a, "bk_a", "k", num_buckets=8, path=str(tmp_path / "bk_a"))
    write_bucketed(b, "bk_b", "k", num_buckets=8, path=str(tmp_path / "bk_b"))

    # At test scale the optimizer (correctly) prefers broadcast, which
    # also has no data shuffle; disable it to exercise the big-big
    # path bucketing exists for.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "bk_a", "bk_b", "k")
        assert joined.count() == 10_000
        assert not plan_has_shuffle(joined), (
            "bucketed join must not shuffle:\n"
            + joined._jdf.queryExecution().executedPlan().toString()
        )

        # the same join on plain (non-bucketed) frames DOES shuffle
        plain = a.join(b, "k")
        assert plan_has_shuffle(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")
