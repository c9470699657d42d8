"""Conformance queries for the 'free built-ins' the reference never
used but the engine exposes (SURVEY §2 'absent' notes): JSON
functions (F20), ROLLUP grouping sets, INTERSECT/EXCEPT, running
window frames."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# Q50 — JSON extraction (F20) on events.props
# ---------------------------------------------------------------------------
@register(
    "q50_json",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
           event_type,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
    doc="JSON field extraction (F20: to_json/get_json_object layer, "
    "..._monthly.py:415-458) grouped.",
)
def q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            (
                F.get_json_object(F.col("props"), "$.k").cast("bigint") % 10
            ).alias("k_mod"),
            "event_type",
        )
        .groupBy("k_mod", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Q51 — ROLLUP grouping sets (engine free built-in)
# ---------------------------------------------------------------------------
@register(
    "q51_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           ROUND(SUM(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    doc="ROLLUP subtotal hierarchy — stock Catalyst grouping sets.",
)
def q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("qty"),
    )


# ---------------------------------------------------------------------------
# Q52 — INTERSECT / EXCEPT set ops (engine free built-in)
# ---------------------------------------------------------------------------
@register(
    "q52_setops",
    """
    WITH a AS (SELECT c_nationkey FROM customer WHERE c_acctbal > 5000),
         b AS (SELECT c_nationkey FROM customer WHERE c_acctbal < 1000),
         i AS (SELECT c_nationkey FROM a INTERSECT SELECT c_nationkey FROM b),
         e AS (SELECT c_nationkey FROM a EXCEPT SELECT c_nationkey FROM b)
    SELECT 'intersect' AS op, COUNT(*) AS n FROM i
    UNION ALL
    SELECT 'except' AS op, COUNT(*) AS n FROM e
    """,
    doc="INTERSECT/EXCEPT distinct set semantics.",
)
def q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_acctbal") > 5000).select("c_nationkey")
    b = cust.filter(F.col("c_acctbal") < 1000).select("c_nationkey")
    i = a.intersect(b).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("intersect").alias("op"), "n"
    )
    e = a.subtract(b).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("except").alias("op"), "n"
    )
    return i.unionByName(e)


# ---------------------------------------------------------------------------
# Q53 — running/cumulative window frames (engine free built-in)
# ---------------------------------------------------------------------------
@register(
    "q53_running_window",
    """
    WITH daily AS (
      SELECT user_id, date_trunc('day', ts)::DATE AS day,
             SUM(value) AS v
      FROM events GROUP BY 1, 2
    )
    SELECT user_id, day,
           ROUND(SUM(v) OVER (PARTITION BY user_id ORDER BY day
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 + 5e-12, 4) AS running_total,
           ROUND(COALESCE(LAG(v) OVER (PARTITION BY user_id ORDER BY day), 0.0)
                 + 5e-12, 4) AS prev_day
    FROM daily
    """,
    doc="Cumulative sum + lag over per-user daily series (running "
    "frames; absent from reference, exposed free).",
)
def q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "user_id",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
            "value",
        )
        .groupBy("user_id", "day")
        .agg(F.sum("value").alias("v"))
    )
    w = Window.partitionBy("user_id").orderBy("day")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "user_id",
        "day",
        F.round(F.sum("v").over(running) + 5e-12, 4).alias("running_total"),
        F.round(
            F.coalesce(F.lag("v").over(w), F.lit(0.0)) + 5e-12, 4
        ).alias("prev_day"),
    )


# ---------------------------------------------------------------------------
# Q76 — pivot (wide conditional aggregation) of the events stream
# ---------------------------------------------------------------------------
_Q76_TYPES = ("click", "error", "purchase", "signup", "view")

_Q76_ORACLE = """
    SELECT CAST(ts AS DATE) AS day,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
           CAST(COUNT(*) AS BIGINT) AS total
    FROM events
    GROUP BY 1
"""


@register(
    "q76_pivot",
    _Q76_ORACLE,
    doc="Relational pivot: one row per day, one count column per "
    "event_type (explicit value list so the output schema is static "
    "- the Spark pivot plans as a single wide conditional "
    "aggregation, no second pass to discover values). Missing "
    "(day, type) combos coalesce to 0.",
)
def q76(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    wide = (
        ev.withColumn("day", F.col("ts").cast("date"))
        .groupBy("day")
        .pivot("event_type", list(_Q76_TYPES))
        .agg(F.count(F.lit(1)))
    )
    cols = [
        F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(t)
        for t in _Q76_TYPES
    ]
    total = sum(
        (F.coalesce(F.col(t), F.lit(0)) for t in _Q76_TYPES), F.lit(0)
    )
    return wide.select("day", *cols, total.cast("bigint").alias("total"))


# ---------------------------------------------------------------------------
# Q77 — CUBE grouping sets with GROUPING() provenance flags
# ---------------------------------------------------------------------------
@register(
    "q77_cube",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
           COUNT(*) AS n,
           ROUND(SUM(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    doc="CUBE over (returnflag, linestatus) with per-column GROUPING "
    "flags disambiguating subtotal rows from real NULL groups - all "
    "2^2 grouping sets in one pass (Catalyst Expand).",
)
def q77(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_rf"),
        F.grouping("l_linestatus").cast("int").alias("g_ls"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("qty"),
    )
