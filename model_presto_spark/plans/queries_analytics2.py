"""Conformance queries: window-algebra analytics family #2 (q133+)
— weighted median, exact EWMA, sweep-line interval concurrency, and
geohash-style interleaved grid bucketing. Oracle conventions as
everywhere; every float that crosses the compare boundary is rounded
to 6 dp with the +5e-12 nudge unless it is a value read verbatim
from the table (q133's median, compared bit-for-bit)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import R6_SQL, _t, r6, register

_R6 = R6_SQL
_r6 = r6


# ---------------------------------------------------------------------------
# Q133 — weighted median (lower) of price weighted by quantity
# ---------------------------------------------------------------------------
_Q133_ORACLE = """
    WITH cum AS (
      SELECT l_returnflag,
             l_extendedprice AS v,
             SUM(l_quantity) OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice ASC, l_quantity ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
      FROM lineitem
    )
    SELECT l_returnflag,
           MIN(CASE WHEN cw * 2 >= tw THEN v END) AS weighted_median
    FROM cum
    GROUP BY l_returnflag
"""


@register(
    "q133_weighted_median",
    _Q133_ORACLE,
    doc="Per-flag weighted median of extendedprice weighted by "
    "quantity (operators/stats.py weighted_median): running weight "
    "sum + threshold min, one shuffle on the group key. Integer-"
    "valued weights keep every cumulative sum exact in doubles, so "
    "the selected value compares bit-for-bit.",
)
def q133(spark: SparkSession, sf_dir: str) -> DataFrame:
    from model_presto_spark.operators.stats import weighted_median

    li = _t(spark, sf_dir, "lineitem")
    return weighted_median(
        li, "l_returnflag", "l_extendedprice", "l_quantity"
    )


# ---------------------------------------------------------------------------
# Q134 — exact EWMA per user (pandas ewm(adjust=True) semantics)
# ---------------------------------------------------------------------------
_Q134_ALPHA = 0.3
_Q134_BETA = 1.0 - _Q134_ALPHA

_Q134_ORACLE = f"""
    WITH pos AS (
      SELECT user_id, ts, event_id, value,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) - 1
               AS DOUBLE) AS p
      FROM events
    ), run AS (
      SELECT user_id, ts, event_id, p,
             SUM(value * pow({_Q134_BETA}, -p)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS num,
             SUM(pow({_Q134_BETA}, -p)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS den
      FROM pos
    ), last AS (
      SELECT user_id,
             (num * pow({_Q134_BETA}, p)) / (den * pow({_Q134_BETA}, p))
               AS ew,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n_events
      FROM run
    )
    SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
           {_R6.format(x='ew')} AS ewma_last
    FROM last WHERE rn = 1
"""


@register(
    "q134_ewma",
    _Q134_ORACLE,
    doc="Exact exponentially-weighted moving average per user "
    "(operators/timeseries.py ewma — the (1-a)^(-i) running-sum "
    "factorization, no recursion/UDF); the query reports each "
    "user's final smoothed value.",
)
def q134(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from model_presto_spark.operators.timeseries import ewma

    ev = _t(spark, sf_dir, "events")
    sm = ewma(ev, "user_id", ["ts", "event_id"], "value", alpha=_Q134_ALPHA)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    wc = Window.partitionBy("user_id")
    return (
        sm.withColumn("rn", F.row_number().over(w))
        .withColumn("n_events", F.count(F.lit(1)).over(wc))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("n_events").cast("bigint").alias("n_events"),
            _r6(F.col("ewma")).alias("ewma_last"),
        )
    )


# ---------------------------------------------------------------------------
# Q135 — peak interval concurrency per day (sweep line)
# ---------------------------------------------------------------------------
_Q135_ORACLE = """
    WITH iv AS (
      SELECT CAST(ts AS DATE) AS day, event_id, ts AS s,
             ts + INTERVAL 30 MINUTE AS e
      FROM events
    ), ev AS (
      SELECT day, s AS t, 1 AS delta, event_id FROM iv
      UNION ALL
      SELECT day, e AS t, -1 AS delta, event_id FROM iv
    ), swept AS (
      SELECT day,
             SUM(delta) OVER (
               PARTITION BY day ORDER BY t ASC, delta ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open
      FROM ev
    )
    SELECT day, CAST(MAX(open) AS BIGINT) AS peak_concurrency
    FROM swept GROUP BY day
"""


@register(
    "q135_concurrency",
    _Q135_ORACLE,
    doc="Peak simultaneously-open 30-min event intervals per day "
    "(operators/temporal.py max_concurrency): +1/-1 sweep-line "
    "events, running sum, max — ends sort before starts at equal "
    "timestamps (exclusive end). One shuffle on the day key.",
)
def q135(spark: SparkSession, sf_dir: str) -> DataFrame:
    from model_presto_spark.operators.temporal import max_concurrency

    ev = _t(spark, sf_dir, "events")
    iv = ev.select(
        F.col("ts").cast("date").alias("day"),
        "event_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
    )
    out = max_concurrency(
        iv, "s", "e", group_cols=["day"], tie_cols=["event_id"]
    )
    return out.select(
        "day", F.col("peak_concurrency").cast("bigint").alias("peak_concurrency")
    )


# ---------------------------------------------------------------------------
# Q136 — geohash-style interleaved grid bucketing (hot cells)
# ---------------------------------------------------------------------------
_Q136_BITS = 8


def _interleave_sql(qlat: str, qlon: str, bits: int = _Q136_BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({qlon}) >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((({qlat}) >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


_Q136_ORACLE = f"""
    WITH q AS (
      SELECT ((user_id * 7919 + event_id) % 256) AS qlat,
             ((event_id * 104729 + user_id) % 256) AS qlon,
             value
      FROM events
    ), cells AS (
      SELECT {_interleave_sql('qlat', 'qlon')} AS cell, value FROM q
    ), agg AS (
      SELECT cell, CAST(COUNT(*) AS BIGINT) AS n,
             {_R6.format(x='SUM(value)')} AS total_value
      FROM cells GROUP BY cell
    )
    SELECT cell, n, total_value FROM agg
    ORDER BY n DESC, cell ASC LIMIT 20
"""


@register(
    "q136_geohash_grid",
    _Q136_ORACLE,
    doc="Geohash-style Z-interleaved grid cells over quantized "
    "coordinates (functions/geo.py grid_cell16 — pure integer bit "
    "algebra, bit-identical across engines), hot-cell top-20. The "
    "cell id clusters spatial neighbors for range pruning, same "
    "property operators/layout.py exploits for Z-order writes.",
)
def q136(spark: SparkSession, sf_dir: str) -> DataFrame:
    from model_presto_spark.functions.geo import grid_cell16

    ev = _t(spark, sf_dir, "events")
    q = ev.select(
        ((F.col("user_id") * 7919 + F.col("event_id")) % 256).alias("qlat"),
        ((F.col("event_id") * 104729 + F.col("user_id")) % 256).alias("qlon"),
        "value",
    )
    cells = q.select(
        grid_cell16(F.col("qlat"), F.col("qlon"), bits=_Q136_BITS).alias("cell"),
        "value",
    )
    agg = cells.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n"),
        _r6(F.sum("value")).alias("total_value"),
    )
    return agg.orderBy(F.col("n").desc(), F.col("cell").asc()).limit(20)


# ---------------------------------------------------------------------------
# Q139 — weekly + cumulative VWAP per returnflag
# ---------------------------------------------------------------------------
_Q139_RUN = (
    "SUM(pv) OVER (PARTITION BY l_returnflag ORDER BY week "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / "
    "SUM(vol) OVER (PARTITION BY l_returnflag ORDER BY week "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
)

_Q139_ORACLE = f"""
    WITH wk AS (
      SELECT l_returnflag,
             strftime(date_trunc('week', l_shipdate), '%Y-%m-%d') AS week,
             SUM(l_extendedprice * l_quantity) AS pv,
             SUM(l_quantity) AS vol
      FROM lineitem
      GROUP BY 1, 2
    )
    SELECT l_returnflag, week,
           {_R6.format(x='pv / vol')} AS vwap_week,
           {_R6.format(x=_Q139_RUN)} AS vwap_cum
    FROM wk
"""


@register(
    "q139_vwap",
    _Q139_ORACLE,
    doc="Weekly and cumulative volume-weighted average price per "
    "returnflag: one partial-aggregated groupBy to weekly moments, "
    "then running-ratio windows over the (tiny) weekly relation — "
    "the raw stream never enters a window.",
)
def q139(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    wk = (
        li.groupBy(
            "l_returnflag",
            F.date_format(F.date_trunc("week", "l_shipdate"), "yyyy-MM-dd").alias(
                "week"
            ),
        )
        .agg(
            F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("pv"),
            F.sum("l_quantity").alias("vol"),
        )
    )
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("week")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return wk.select(
        "l_returnflag",
        "week",
        _r6(F.col("pv") / F.col("vol")).alias("vwap_week"),
        _r6(F.sum("pv").over(w) / F.sum("vol").over(w)).alias("vwap_cum"),
    )


# ---------------------------------------------------------------------------
# Q140 — non-negative running balance (closed-form clamp)
# ---------------------------------------------------------------------------
_Q140_ORACLE = f"""
    WITH d AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type IN ('purchase', 'signup') THEN value
                  ELSE -value END AS delta
      FROM events
    ), pre AS (
      SELECT user_id, ts, event_id,
             SUM(delta) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
      FROM d
    ), bal AS (
      SELECT user_id,
             p - LEAST(0.0, MIN(p) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS b
      FROM pre
    )
    SELECT user_id,
           {_R6.format(x='MAX(b)')} AS peak_balance
    FROM bal GROUP BY user_id
"""


@register(
    "q140_clamped_balance",
    _Q140_ORACLE,
    doc="Non-negative running ledger balance b_t = max(0, b_(t-1) + "
    "delta_t) in closed form (operators/stats.py "
    "clamped_running_balance): prefix sum minus clamped running min "
    "— the recursion SQL cannot express, as two windows.",
)
def q140(spark: SparkSession, sf_dir: str) -> DataFrame:
    from model_presto_spark.operators.stats import clamped_running_balance

    ev = _t(spark, sf_dir, "events")
    d = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.col("event_type").isin("purchase", "signup"), F.col("value")
        )
        .otherwise(-F.col("value"))
        .alias("delta"),
    )
    bal = clamped_running_balance(d, "user_id", ["ts", "event_id"], "delta")
    return bal.groupBy("user_id").agg(
        _r6(F.max("balance")).alias("peak_balance")
    )


# ---------------------------------------------------------------------------
# Q141 — hopping (sliding) event-time windows, native F.window
# ---------------------------------------------------------------------------
_Q141_ORACLE = f"""
    WITH hop AS (
      SELECT e.value, e.event_type,
             (CAST(floor(epoch(e.ts) / 600) AS BIGINT) * 600 - k.k * 600)
               AS ws
      FROM events e
      CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS k) k
    )
    SELECT strftime(make_timestamp(ws * 1000000), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n,
           {_R6.format(x='SUM(value)')} AS total_value
    FROM hop
    GROUP BY ws
"""


@register(
    "q141_hopping_window",
    _Q141_ORACLE,
    doc="30-min hopping windows with 10-min hop via native F.window "
    "(slideDuration) — Catalyst's window generator emits the 3 "
    "covering windows per event; epoch-aligned starts match the "
    "oracle's floor arithmetic. The Structured Streaming windowed-agg "
    "shape, run batch.",
)
def q141(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "30 minutes", "10 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            _r6(F.sum("value")).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n",
            "total_value",
        )
    )
