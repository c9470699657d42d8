"""SparkSession bootstrap with scale-oriented defaults.

Design notes (100 TB north star):
- AQE on: runtime coalescing of shuffle partitions, skew-join
  splitting, and dynamic join-strategy demotion replace any
  hand-tuned partition counts when the same plans run on a real
  cluster against much larger inputs.
- Arrow on: every pandas-UDF hop (raster decode, model inference)
  moves columnar batches, not pickled rows.
- Session timezone pinned to UTC so date/timestamp semantics are
  identical across executors and match the DuckDB oracle.
- shuffle.partitions defaults to the local core count for tests;
  on a cluster AQE coalesces from a deliberately high initial
  number, so the local default is not load-bearing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "model-presto-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Honors $SPARK_GRAFT_CPUS for local parallelism so the bench
    driver controls core count.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst deliberately left at its default (true): an
        # A/B at sf0.1 showed size-first coalescing wins ~100ms on a
        # dozen small-shuffle queries but costs 2-3x on the CPU-bound
        # dedup paths (md5 per gram downstream of a small-by-bytes
        # shuffle needs cores, not fewer tasks)
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
