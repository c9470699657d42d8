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


# ---------------------------------------------------------------------------
# Q68 — in-session conversion sequencing (view -> click -> purchase)
# ---------------------------------------------------------------------------
_Q68_GAP_US = 8 * 3600 * 1_000_000

_Q68_ORACLE = f"""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM events
    ), flagged AS (
      SELECT *, CASE WHEN prev_ts IS NULL
                          OR epoch_us(ts) - epoch_us(prev_ts) > {_Q68_GAP_US}
                     THEN 1 ELSE 0 END AS new_s
      FROM ordered
    ), sess AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    ), s1 AS (
      SELECT *, MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
                  OVER (PARTITION BY user_id, sid) AS mv
      FROM sess
    ), s2 AS (
      SELECT *, MIN(CASE WHEN event_type = 'click' AND epoch_us(ts) > mv
                         THEN epoch_us(ts) END)
                  OVER (PARTITION BY user_id, sid) AS mc
      FROM s1
    ), s3 AS (
      SELECT *, MIN(CASE WHEN event_type = 'purchase' AND epoch_us(ts) > mc
                         THEN epoch_us(ts) END)
                  OVER (PARTITION BY user_id, sid) AS mp
      FROM s2
    ), per_sess AS (
      SELECT user_id, sid,
             MAX(CASE WHEN mp IS NOT NULL THEN 1 ELSE 0 END) AS conv
      FROM s3 GROUP BY user_id, sid
    )
    SELECT user_id,
           COUNT(*) AS n_sessions,
           CAST(SUM(conv) AS BIGINT) AS n_converted
    FROM per_sess GROUP BY user_id
"""


@register(
    "q68_session_conversion",
    _Q68_ORACLE,
    doc="In-session conversion sequencing: a session converts iff it "
    "contains a view, then a strictly-later click, then a "
    "strictly-later purchase (chained conditional window minima over "
    "the sessionized stream — three same-partition window passes, "
    "one underlying sort). Per-user session and conversion counts.",
)
def q68(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from model_presto_spark.operators.temporal import _epoch_us, sessionize

    ev = _t(spark, sf_dir, "events")
    sess = sessionize(
        ev, "user_id", "ts", gap_seconds=8 * 3600, order_tiebreak="event_id"
    )
    us = _epoch_us("ts")
    w = Window.partitionBy("user_id", "session_idx")
    s1 = sess.withColumn(
        "mv", F.min(F.when(F.col("event_type") == "view", us)).over(w)
    )
    s2 = s1.withColumn(
        "mc",
        F.min(
            F.when((F.col("event_type") == "click") & (us > F.col("mv")), us)
        ).over(w),
    )
    s3 = s2.withColumn(
        "mp",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (us > F.col("mc")), us
            )
        ).over(w),
    )
    per_sess = s3.groupBy("user_id", "session_idx").agg(
        F.max(F.when(F.col("mp").isNotNull(), 1).otherwise(0)).alias("conv")
    )
    return per_sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("conv").alias("n_converted"),
    )


# ---------------------------------------------------------------------------
# Q69 — TPC-H Q3 shape: three-table join, revenue rollup (J2/A3 composed)
# ---------------------------------------------------------------------------
_Q69_ORACLE = """
    SELECT o.o_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) + 5e-10, 2)
             AS revenue,
           MIN(o.o_orderdate) AS o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY o.o_orderkey
    HAVING SUM(l.l_extendedprice * (1 - l.l_discount)) > 100000
"""


@register(
    "q69_tpch_q3",
    _Q69_ORACLE,
    doc="TPC-H Q3 shape adapted to the synthetic star schema: "
    "segment-filtered customer -> orders -> lineitem three-table "
    "join, per-order revenue rollup with a HAVING threshold (the "
    "deterministic stand-in for Q3's float top-k). Catalyst gets the "
    "join order; the dimension side broadcasts.",
)
def q69(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-01-01"
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    rev = F.sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
    return (
        li.join(
            orders.join(cust, orders.o_custkey == cust.c_custkey).select(
                "o_orderkey", "o_orderdate"
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey")
        .agg(
            rev.alias("__rev"),
            F.min("o_orderdate").alias("o_orderdate"),
        )
        .filter(F.col("__rev") > 100000)
        .select(
            "o_orderkey",
            F.round(F.col("__rev") + 5e-10, 2).alias("revenue"),
            "o_orderdate",
        )
    )


# ---------------------------------------------------------------------------
# Q79 — spine join + linear gap-fill (timeseries.interpolate_series)
# ---------------------------------------------------------------------------
_Q79_ORACLE = """
    WITH days AS (
      SELECT unnest(generate_series(0, 29)) AS day_idx
    ), users AS (
      SELECT DISTINCT user_id FROM events WHERE user_id < 20
    ), spine AS (
      SELECT u.user_id, d.day_idx FROM users u CROSS JOIN days d
    ), daily AS (
      SELECT user_id,
             date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx,
             AVG(value) AS v
      FROM events WHERE user_id < 20
      GROUP BY 1, 2
    ), joined AS (
      SELECT s.user_id, s.day_idx, d.v
      FROM spine s LEFT JOIN daily d USING (user_id, day_idx)
    ), neigh AS (
      SELECT user_id, day_idx, v,
        LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day_idx
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        LAST_VALUE(CASE WHEN v IS NOT NULL THEN day_idx END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY day_idx
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pi,
        FIRST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day_idx
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        FIRST_VALUE(CASE WHEN v IS NOT NULL THEN day_idx END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY day_idx
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ni
      FROM joined
    )
    SELECT user_id, CAST(day_idx AS INT) AS day_idx,
           CAST(v IS NULL AS BOOLEAN) AS was_gap,
           ROUND(CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL
               THEN pv + (nv - pv) * (day_idx - pi) / (ni - pi)
             ELSE COALESCE(pv, nv)
           END + 5e-10, 4) AS value_filled
    FROM neigh
"""


@register(
    "q79_gap_fill",
    _Q79_ORACLE,
    doc="Daily spine join + linear interpolation of missing days per "
    "user (timeseries.interpolate_series): nearest non-null neighbors "
    "via IGNORE NULLS windows in one shuffle on the entity key; "
    "ffill/bfill at the edges; was_gap marks synthesized rows.",
)
def q79(spark: SparkSession, sf_dir: str) -> DataFrame:
    from model_presto_spark.operators.timeseries import interpolate_series

    ev = _t(spark, sf_dir, "events").where(F.col("user_id") < 20)
    daily = (
        ev.withColumn(
            "day_idx",
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")),
        )
        .groupBy("user_id", "day_idx")
        .agg(F.avg("value").alias("v"))
    )
    spine = (
        daily.select("user_id")
        .distinct()
        .crossJoin(
            _t(spark, sf_dir, "events")
            .sparkSession.range(0, 30)
            .select(F.col("id").cast("int").alias("day_idx"))
        )
    )
    joined = spine.join(daily, ["user_id", "day_idx"], "left")
    filled = interpolate_series(joined, "user_id", "day_idx", "v", "vf")
    return filled.select(
        "user_id",
        F.col("day_idx").cast("int").alias("day_idx"),
        F.col("v").isNull().alias("was_gap"),
        F.round(F.col("vf") + 5e-10, 4).alias("value_filled"),
    )
