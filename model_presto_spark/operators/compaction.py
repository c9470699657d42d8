"""Small-file compaction — the table-maintenance operator every
long-running ingest needs: streaming/incremental appends produce
many small parquet files, and at 100 TB the resulting
file-per-task scheduling + footer overhead dominates scan cost.

``plan_compaction`` is metadata-only: it lists the table's data
files through the Hadoop FileSystem API (driver-side — file *counts*
are small even when data is not), first-fit bins them toward a
target size, and returns the plan as data. ``compact_parquet``
executes the plan with one job: read -> coalesce to the planned bin
count -> rewrite to a staging dir, then swap. Row-identical by
construction (no shuffle — coalesce only narrows partitioning);
``sort_cols`` optionally range-repartitions instead, restoring a
clustered layout (the Z-order/layout.py write path) at the cost of
one shuffle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _list_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) for every data file under ``path`` (driver-side
    Hadoop FS listing — metadata only)."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    out = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        out.append((st.getPath().toString(), int(st.getLen())))
    return sorted(out)


def plan_compaction(
    spark: SparkSession, path: str, target_bytes: int = 128 * 1024 * 1024
) -> dict:
    """First-fit-decreasing bin plan: {n_files, total_bytes, n_bins,
    bins: [[paths...]...]}. A table already at ~target sizing yields
    n_bins == n_files and compaction can be skipped."""
    files = _list_files(spark, path)
    bins: list[tuple[int, list[str]]] = []
    for fp, sz in sorted(files, key=lambda t: -t[1]):
        placed = False
        for i, (used, members) in enumerate(bins):
            if used + sz <= target_bytes:
                bins[i] = (used + sz, members + [fp])
                placed = True
                break
        if not placed:
            bins.append((sz, [fp]))
    return {
        "n_files": len(files),
        "total_bytes": sum(sz for _, sz in files),
        "n_bins": len(bins),
        "bins": [members for _, members in bins],
    }


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> dict:
    """Rewrite ``path`` into ``out_path`` with ~target-sized files.
    Returns the plan actually used. Without ``sort_cols`` the rewrite
    is a pure coalesce (no shuffle); with them it range-repartitions
    on the sort key, restoring clustering for pruning."""
    plan = plan_compaction(spark, path, target_bytes)
    n_out = max(plan["n_bins"], 1)
    df = spark.read.parquet(path)
    if sort_cols:
        out_df: DataFrame = df.repartitionByRange(
            n_out, *[F.col(c) for c in sort_cols]
        ).sortWithinPartitions(*sort_cols)
    else:
        out_df = df.coalesce(n_out)
    out_df.write.mode("overwrite").parquet(out_path)
    plan["n_files_out"] = len(_list_files(spark, out_path))
    return plan


def compaction_stats(spark: SparkSession, path: str) -> DataFrame:
    """File-size distribution of a table as a DataFrame — the
    monitoring feed that decides when to trigger compaction."""
    files = _list_files(spark, path)
    df = spark.createDataFrame(
        [(p, s) for p, s in files], "file string, bytes bigint"
    )
    return df.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("bytes").alias("total_bytes"),
        F.min("bytes").alias("min_bytes"),
        F.max("bytes").alias("max_bytes"),
        F.round(F.avg("bytes"), 1).alias("avg_bytes"),
    )


def equi_depth_histogram(
    df: DataFrame, col: str, n_buckets: int = 10
) -> DataFrame:
    """Equi-depth (equal-height) histogram: bucket boundaries at the
    exact 1/n quantiles, then per-bucket counts + min/max. The
    statistic a cost-based optimizer keeps per column; also the
    right monitoring shape for skewed value distributions (equi-width
    histograms hide skew, equi-depth exposes it as boundary
    spacing). Two jobs: one percentile aggregation (boundaries are a
    broadcast-sized array literal in the second pass), one bucket
    count."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    qs = df.agg(
        F.expr(
            f"percentile({col}, array({', '.join(f'{p}D' for p in probs)}))"
        ).alias("qs")
    ).collect()[0]["qs"]
    c = F.col(col)
    # bucket i (1-based): count of boundaries strictly below the value
    bucket = F.lit(1)
    for q in qs:
        bucket = bucket + (c > F.lit(float(q))).cast("int")
    return (
        df.where(c.isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(c).cast("double").alias("lo"),
            F.max(c).cast("double").alias("hi"),
        )
    )
