"""Partition-layout write + pruning proof (SURVEY §7 item 8).

The point of the (year, month) hive layout is that a month-filtered
read must neither scan nor even LIST the other months' files — the
scan's PartitionFilters carries the predicate and partitionsRead
collapses to the matching directories.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_write_partitioned_prunes(spark, tmp_path):
    from model_presto_spark.io import load_table, write_partitioned
    from model_presto_spark.streaming.pipeline import monthly_partitioned

    events = monthly_partitioned(
        load_table(spark, "/root/testdata/sf0.001", "events"), "ts"
    ).withColumn("day", F.dayofmonth("ts"))
    out = str(tmp_path / "events_part")
    write_partitioned(events, out, partition_cols=("month", "day"))

    # hive directory layout exists (sf0.001 events span one month,
    # 30 days)
    months = [d for d in os.listdir(out) if d.startswith("month=")]
    assert months, "expected month=... partition directories"
    days = [
        d
        for d in os.listdir(os.path.join(out, months[0]))
        if d.startswith("day=")
    ]
    assert len(days) > 1, "need >1 day partition to prove pruning"

    back = spark.read.parquet(out)
    one_day = back.filter((F.col("month") == 1) & (F.col("day") == 7))

    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "day" in plan.split("PartitionFilters")[1][:200]

    # pruned scan reads strictly fewer files than the full scan
    def n_files(df):
        return df.select(F.input_file_name()).distinct().count()

    assert n_files(one_day) < n_files(back)
    # and the data is intact for the selected day
    got = one_day.count()
    want = events.filter(
        (F.col("month") == 1) & (F.col("day") == 7)
    ).count()
    assert got == want > 0
