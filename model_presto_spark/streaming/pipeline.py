"""Incremental file-arrival pipelines (T1-T6).

Reference semantics: a Cloud Function fires per new GeoTIFF landing
in a bucket, routes by path, converts tif -> npy, with existence
checks making every step idempotent and a <=3000-task in-flight cap
(reference: presto-tolbi/presto/dataops/main.py:24-43 trigger;
ee_pipeline.py:96-110,125-163 worker + cap; dataset.py:63-68,151-153
idempotence; monthly dated artifacts ..._monthly.py:722-733).

Spark-first mapping:
- file-arrival trigger  -> Structured Streaming file source
- per-file conversion   -> foreachBatch transform + write
- idempotence/exactly-once -> streaming checkpoint + deterministic
  partitioned output paths (re-running a batch overwrites the same
  partition, never duplicates)
- in-flight cap         -> maxFilesPerTrigger backpressure
- monthly append        -> partitionBy(year, month) on the sink
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def incremental_convert(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    max_files_per_trigger: int = 3000,
    available_now: bool = True,
    partition_cols: list[str] | None = None,
) -> StreamingQuery:
    """Watch ``landing_dir`` for new parquet files, transform each
    micro-batch, append to a partitioned parquet sink.

    The checkpoint is the exactly-once ledger (T2): a restarted query
    resumes after the last committed batch and never reprocesses a
    file — the streaming-native version of the reference's
    "blob exists? skip" checks. ``max_files_per_trigger`` is the
    backpressure cap (T3: <=3000 in-flight conversions).
    ``available_now=True`` drains the current backlog then stops
    (batch-over-stream), matching the reference's cron-style runs;
    False runs continuously.
    """
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_dir)
    )
    if transform is not None:
        stream = transform(stream)

    writer = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def monthly_partitioned(df: DataFrame, ts_col: str) -> DataFrame:
    """Add (year, month) partition columns for the dated-artifact
    append layout (T6, ..._monthly.py:722-733)."""
    return df.withColumn("year", F.year(ts_col)).withColumn(
        "month", F.month(ts_col)
    )


def windowed_counts(
    stream: DataFrame,
    ts_col: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    extra_keys: list[str] | None = None,
    slide: str | None = None,
) -> DataFrame:
    """Tumbling — or, with ``slide``, hopping — window aggregate with
    late-data watermark (W1 on a stream; the reference has no stream
    processor — this is the Spark-native upgrade of its monthly batch
    loop). A slide shorter than the window emits every covering
    window per event (q141's batch shape, run continuously)."""
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    keys = [win.alias("win")] + [F.col(k) for k in (extra_keys or [])]
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .select(
            F.col("win.start").alias("window_start"),
            *[F.col(k) for k in (extra_keys or [])],
            "n",
            "total",
        )
    )


def dedup_stream(stream: DataFrame, key_cols: list[str], watermark_col: str,
                 watermark: str = "1 hour") -> DataFrame:
    """Stateful exactly-once dedup by key within the watermark (T4
    retry-suffix merge semantics: duplicates from retries collapse
    onto the canonical key)."""
    return stream.withWatermark(watermark_col, watermark).dropDuplicates(
        [*key_cols, watermark_col]
    )


def session_aggregate(
    stream: DataFrame,
    ts_col: str,
    entity_col: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based session aggregation on a stream: Spark's native
    session_window merges events of one entity whose gaps stay under
    ``gap`` into one growing window, finalized once the watermark
    passes the session end. The streaming counterpart of
    operators/temporal.sessionize (which exposes per-row session
    indexes for batch); state per open session is O(1) and evicted at
    finalization, so state-store size tracks concurrent sessions, not
    history — the shape that survives an unbounded stream."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), F.col(entity_col))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total"))
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            entity_col,
            "n_events",
            "total",
        )
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: list[tuple[str, str]],
    left_ts: str,
    right_ts: str,
    within: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream equi-join with a time-interval bound:
    right rows match left rows with the same key(s) and
    ``left_ts <= right_ts <= left_ts + within``.

    The watermark + time-range condition is what makes this run on an
    unbounded stream: Spark derives a state-eviction bound from them,
    so each side buffers only ``watermark + within`` of history per
    key instead of the whole stream — state is O(arrival rate x
    window), not O(stream length). ``how`` may be 'inner' or
    'leftOuter' (outer emission waits for the watermark to prove no
    match can still arrive). Column names must be disjoint across the
    two sides (rename before joining) — the usual streaming-join
    hygiene that keeps the output schema unambiguous.

    Batch counterpart: the identical join condition on static frames
    (or operators/temporal.interval_join for the banded shuffle plan);
    parity is asserted in tests/test_streaming_parity.py.
    """
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (F.col(right_ts) >= F.col(left_ts)) & (
        F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {within}")
    )
    for lk, rk in on:
        cond = cond & (F.col(lk) == F.col(rk))
    return l.join(r, cond, how)
