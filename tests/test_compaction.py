"""Small-file compaction: plan math, row-identical rewrite, file
count reduction, clustered rewrite; equi-depth histogram shape."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_compaction_roundtrip(spark, tmp_path):
    from model_presto_spark.operators.compaction import (
        compact_parquet,
        compaction_stats,
        plan_compaction,
    )

    src = str(tmp_path / "small_files")
    out = str(tmp_path / "compacted")
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 97).alias("k"),
        F.sha1(F.col("id").cast("string")).alias("payload"),
    )
    df.repartition(40).write.parquet(src)  # 40 small files

    stats = compaction_stats(spark, src).collect()[0]
    assert stats.n_files >= 40

    plan = compact_parquet(spark, src, out, target_bytes=max(
        stats.total_bytes // 4, 1
    ))
    assert plan["n_files"] >= 40
    assert plan["n_bins"] < plan["n_files"]
    assert plan["n_files_out"] <= plan["n_bins"] + 1

    a = spark.read.parquet(src)
    b = spark.read.parquet(out)
    assert a.count() == b.count() == 10_000
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_compaction_sorted_rewrite_clusters(spark, tmp_path):
    from model_presto_spark.operators.compaction import compact_parquet

    src = str(tmp_path / "src2")
    out = str(tmp_path / "out2")
    spark.range(5_000).select(
        (F.col("id") % 50).alias("k"), F.col("id")
    ).repartition(20).write.parquet(src)
    compact_parquet(spark, src, out, target_bytes=1 << 20, sort_cols=["k"])
    got = spark.read.parquet(out)
    # clustered: each k lands in exactly one file
    per_k = (
        got.select("k", F.input_file_name().alias("f"))
        .groupBy("k").agg(F.countDistinct("f").alias("nf"))
        .agg(F.max("nf").alias("m")).collect()[0].m
    )
    assert per_k == 1


def test_equi_depth_histogram(spark):
    from model_presto_spark.operators.compaction import equi_depth_histogram

    # skewed: 90% of mass at small values
    df = spark.range(1_000).select(
        F.when(F.col("id") < 900, F.col("id") % 10)
        .otherwise(F.col("id")).cast("double").alias("x")
    )
    hist = {r.bucket: r for r in equi_depth_histogram(df, "x", 10).collect()}
    n_total = sum(r.n for r in hist.values())
    assert n_total == 1_000
    # equi-depth: most buckets hold ~100 rows despite the skew...
    close = [b for b, r in hist.items() if r.n <= 300]
    assert len(close) >= 8
    # ...and the last bucket's range is wide (skew exposed as spacing)
    assert hist[max(hist)].hi - hist[max(hist)].lo > 50
