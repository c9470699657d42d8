"""Conformance queries: sessionization, banded interval join, and
deterministic hash-rank sampling (round 3).

All three are oracle-checked against DuckDB on identical semantics:
- q63: gap-based sessionization == lag + cumulative-sum windows.
- q64: banded interval equi-join == naive range LEFT JOIN (the
  oracle states the O(n·m) definition; the Spark plan is the
  scale-safe banded rewrite — same result set by construction).
- q65: md5-derived hash-rank sampling, the cross-engine-stable
  downsampling primitive (same DD_H60 convention as the dedup
  oracles).

Integer SUM columns are cast to BIGINT on the oracle side (DuckDB
SUM(int) returns HUGEINT; Spark returns BIGINT — see the round-1
verdict's type-divergence note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# Q63 — gap-based sessionization (events, 4h gap)
# ---------------------------------------------------------------------------
_Q63_ORACLE = """
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM events
    ), flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) > 14400000000
                  THEN 1 ELSE 0 END AS new_s
      FROM ordered
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS session_idx
      FROM flagged
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           COUNT(*) AS n_events,
           MIN(ts) AS first_ts, MAX(ts) AS last_ts
    FROM sess GROUP BY user_id, session_idx
"""


@register(
    "q63_sessionize",
    _Q63_ORACLE,
    doc="Gap-based sessionization (4h inactivity gap) over the events "
    "stream: per-session event count and span, per user. Spark side is "
    "operators/temporal.session_stats (lag + cumulative-sum windows, "
    "one shuffle on the entity key); oracle is the identical window "
    "program in ANSI SQL.",
)
def q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    from model_presto_spark.operators.temporal import session_stats

    ev = _t(spark, sf_dir, "events")
    return session_stats(
        ev, "user_id", "ts", gap_seconds=14400, order_tiebreak="event_id"
    ).select("user_id", "session_idx", "n_events", "first_ts", "last_ts")


# ---------------------------------------------------------------------------
# Q64 — banded interval join: clicks within ±15min of each error event
# ---------------------------------------------------------------------------
_Q64_ORACLE = """
    WITH errors AS (
      SELECT event_id AS err_id, ts FROM events WHERE event_type = 'error'
    ), clicks AS (
      SELECT ts FROM events WHERE event_type = 'click'
    )
    SELECT e.err_id, COUNT(c.ts) AS n_clicks
    FROM errors e LEFT JOIN clicks c
      ON c.ts BETWEEN e.ts - INTERVAL 15 MINUTE
                  AND e.ts + INTERVAL 15 MINUTE
    GROUP BY e.err_id
"""


@register(
    "q64_range_join",
    _Q64_ORACLE,
    doc="Interval containment join: click events falling in the "
    "±15-minute window around each error event, counted per error "
    "(zero-count windows kept). The oracle states the naive range "
    "join; the Spark plan is operators/temporal.interval_join — a "
    "banded equi-join (points shuffle on a 15-min time band, windows "
    "replicate to overlapped bands) that replaces the O(n·m) "
    "broadcast-nested-loop plan a raw range predicate would get.",
)
def q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    from model_presto_spark.operators.temporal import interval_join

    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        (F.col("ts") - F.expr("INTERVAL 15 MINUTES")).alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 15 MINUTES")).alias("w_end"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("ts").alias("click_ts")
    )
    pairs = interval_join(
        clicks, errors, "click_ts", "w_start", "w_end", band_seconds=900
    )
    counts = pairs.groupBy("err_id").agg(F.count(F.lit(1)).alias("n_clicks"))
    return (
        errors.select("err_id")
        .join(counts, "err_id", "left")
        .select(
            "err_id", F.coalesce(F.col("n_clicks"), F.lit(0)).alias("n_clicks")
        )
    )


# ---------------------------------------------------------------------------
# Q65 — deterministic hash-rank stratified sample (20 docs per lang)
# ---------------------------------------------------------------------------
_Q65_ORACLE = """
    WITH h AS (
      SELECT doc_id, lang, n_chars,
             CAST(('0x' || substr(md5('smp#' || CAST(doc_id AS VARCHAR)),
                                  1, 15)) AS BIGINT) AS hk
      FROM documents
    ), r AS (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rn
      FROM h
    )
    SELECT doc_id, lang, n_chars FROM r WHERE rn <= 20
"""


@register(
    "q65_hash_sample",
    _Q65_ORACLE,
    doc="Deterministic stratified downsample: 20 documents per lang, "
    "chosen by md5-derived 60-bit hash rank (splits.hash_rank_sample). "
    "RNG-free, cluster-size-invariant, and stable under corpus growth "
    "— the reproducible-sampling primitive for training-data "
    "pipelines. Same DD_H60 md5 convention as the dedup oracles.",
)
def q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    from model_presto_spark.operators.splits import hash_rank_sample

    docs = _t(spark, sf_dir, "documents")
    return hash_rank_sample(
        docs, "doc_id", 20, strata_cols=["lang"]
    ).select("doc_id", "lang", "n_chars")
