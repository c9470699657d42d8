"""Conformance queries: SQL-surface batch #3 (q180+) — ranking-window
suite (ntile/percent_rank/cume_dist/nth_value), explicit GROUPING
SETS, string-function suite, and three-valued-logic / null-ordering
semantics. These pin the engine's ANSI surface against the oracle the
way q50-q53 pinned JSON/ROLLUP/set-ops. Oracle conventions as
everywhere."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import R6_SQL, _t, r6, register

_R6 = R6_SQL


# ---------------------------------------------------------------------------
# Q180 — ranking-window suite over the weekly series
# ---------------------------------------------------------------------------
# The windowed measure is the integer line count (exact in both
# engines), so every output is integer-deterministic except the two
# rank ratios, which are identical k/(n-1)-style divisions.
_Q180_FULL = (
    "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"
)

_Q180_ORACLE = f"""
    WITH wk AS (
      SELECT l_returnflag AS flag,
             strftime(date_trunc('week', l_shipdate), '%Y-%m-%d') AS week,
             CAST(COUNT(*) AS BIGINT) AS n_lines
      FROM lineitem GROUP BY 1, 2
    )
    SELECT flag, week, n_lines,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           {_R6.format(x='percent_rank() OVER w')} AS pct_rank,
           {_R6.format(x='cume_dist() OVER w')} AS cume,
           first_value(n_lines) OVER (PARTITION BY flag ORDER BY week
             {_Q180_FULL}) AS first_n,
           last_value(n_lines) OVER (PARTITION BY flag ORDER BY week
             {_Q180_FULL}) AS last_n,
           nth_value(n_lines, 2) OVER (PARTITION BY flag ORDER BY week
             {_Q180_FULL}) AS second_n,
           lag(n_lines, 1, CAST(0 AS BIGINT)) OVER w AS prev_n,
           lead(n_lines, 1, CAST(0 AS BIGINT)) OVER w AS next_n
    FROM wk
    WINDOW w AS (PARTITION BY flag ORDER BY week)
    ORDER BY flag, week
"""


@register(
    "q180_window_suite",
    _Q180_ORACLE,
    doc="Ranking-window conformance: ntile(4), percent_rank, "
    "cume_dist, first/last/nth_value over explicit full frames, "
    "lag/lead with defaults — one window stage on the pre-aggregated "
    "weekly relation (all frames share the (flag, week) sort). The "
    "measure is the integer line count, so only the two rank ratios "
    "touch floats.",
)
def q180(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    wk = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.date_format(F.date_trunc("week", "l_shipdate"), "yyyy-MM-dd").alias(
            "week"
        ),
    ).agg(F.count(F.lit(1)).alias("n_lines"))
    w = Window.partitionBy("flag").orderBy("week")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return wk.select(
        "flag",
        "week",
        "n_lines",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        r6(F.percent_rank().over(w)).alias("pct_rank"),
        r6(F.cume_dist().over(w)).alias("cume"),
        F.first("n_lines").over(wfull).alias("first_n"),
        F.last("n_lines").over(wfull).alias("last_n"),
        F.nth_value("n_lines", 2).over(wfull).alias("second_n"),
        F.lag("n_lines", 1, 0).over(w).cast("bigint").alias("prev_n"),
        F.lead("n_lines", 1, 0).over(w).cast("bigint").alias("next_n"),
    ).orderBy("flag", "week")


# ---------------------------------------------------------------------------
# Q181 — explicit GROUPING SETS with provenance flags
# ---------------------------------------------------------------------------
_Q181_ORACLE = """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), ())
    ORDER BY g_flag, g_status, l_returnflag, l_linestatus
"""


@register(
    "q181_grouping_sets",
    _Q181_ORACLE,
    doc="Explicit GROUPING SETS ((flag,status),(flag),()) with "
    "GROUPING() provenance flags — the mixed-set sibling of q51 "
    "ROLLUP / q77 CUBE, planned as ONE Expand pass (DataFrame "
    "groupingSets API), not a union of scans. Integer-exact "
    "aggregates.",
)
def q181(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    gs = li.groupingSets(
        [
            [F.col("l_returnflag"), F.col("l_linestatus")],
            [F.col("l_returnflag")],
            [],
        ],
        F.col("l_returnflag"),
        F.col("l_linestatus"),
    ).agg(
        F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
        F.grouping("l_linestatus").cast("bigint").alias("g_status"),
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").cast("double").alias("sum_qty"),
    )
    return gs.select(
        "l_returnflag", "l_linestatus", "g_flag", "g_status", "n", "sum_qty"
    ).orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus")


# ---------------------------------------------------------------------------
# Q182 — string-function suite
# ---------------------------------------------------------------------------
_Q182_ORACLE = """
    SELECT c_custkey,
           upper(c_name) AS up,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
           rpad(c_mktsegment, 12, '.') AS rpadded,
           translate(c_name, '#0', '_x') AS translated,
           reverse(c_mktsegment) AS rev,
           repeat(left(c_mktsegment, 2), 3) AS rep2,
           substr(c_name, 10, 5) AS midkey,
           CAST(strpos(c_name, '#') AS BIGINT) AS hashpos,
           CAST(levenshtein(c_mktsegment, 'BUILDING') AS BIGINT) AS lev,
           concat_ws('|', c_mktsegment, CAST(c_custkey % 7 AS VARCHAR))
             AS joined
    FROM customer
    WHERE c_custkey < 300
    ORDER BY c_custkey
"""


@register(
    "q182_string_suite",
    _Q182_ORACLE,
    doc="String-function conformance: upper, lpad/rpad, translate, "
    "reverse, repeat, left, substr, strpos/instr, levenshtein, "
    "concat_ws — all JVM expressions, byte-exact cross-engine on "
    "ASCII inputs. The F1-F4 normalize/split layer's wider surface.",
)
def q182(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
        F.rpad("c_mktsegment", 12, ".").alias("rpadded"),
        F.translate("c_name", "#0", "_x").alias("translated"),
        F.reverse("c_mktsegment").alias("rev"),
        F.repeat(F.substring("c_mktsegment", 1, 2), 3).alias("rep2"),
        F.substring("c_name", 10, 5).alias("midkey"),
        F.instr("c_name", "#").cast("bigint").alias("hashpos"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING"))
        .cast("bigint")
        .alias("lev"),
        F.concat_ws(
            "|", F.col("c_mktsegment"), (F.col("c_custkey") % 7).cast("string")
        ).alias("joined"),
    ).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# Q183 — three-valued logic and null-ordering semantics
# ---------------------------------------------------------------------------
# Nulls are synthesized with NULLIF; the query pins COALESCE/NULLIF,
# IS (NOT) DISTINCT FROM, count(col) vs count(*), null-group
# membership, and EXPLICIT null ordering (Spark defaults NULLS FIRST
# on ASC where DuckDB defaults NULLS LAST — the query spells it out
# on both sides).
_Q183_ORACLE = """
    WITH v AS (
      SELECT event_id,
             NULLIF(event_type, 'error') AS etype,
             CASE WHEN value < 10 THEN NULL ELSE value END AS val
      FROM events
    )
    SELECT etype,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(val) AS BIGINT) AS n_val,
           CAST(SUM(CASE WHEN val IS DISTINCT FROM NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_distinct_null,
           CAST(SUM(CASE WHEN etype IS NOT DISTINCT FROM 'click'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
           ROUND(COALESCE(AVG(val), -1.0) + 5e-10, 4) AS avg_val
    FROM v
    GROUP BY etype
    ORDER BY etype NULLS FIRST
"""


@register(
    "q183_null_semantics",
    _Q183_ORACLE,
    doc="Three-valued-logic conformance: NULLIF-synthesized nulls, "
    "count(col) vs count(*), IS [NOT] DISTINCT FROM (null-safe "
    "comparison), COALESCE fallbacks, the null GROUP, and EXPLICIT "
    "null ordering (Spark ASC defaults NULLS FIRST, DuckDB NULLS "
    "LAST — left implicit this query would silently diverge; both "
    "sides state it).",
)
def q183(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    v = ev.select(
        "event_id",
        F.nullif(F.col("event_type"), F.lit("error")).alias("etype"),
        F.when(F.col("value") < 10, F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("val"),
    )
    return (
        v.groupBy("etype")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("val").alias("n_val"),
            F.sum(
                F.when(F.col("val").isNotNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_distinct_null"),
            F.sum(
                F.when(F.col("etype").eqNullSafe(F.lit("click")), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_click"),
            F.round(F.coalesce(F.avg("val"), F.lit(-1.0)) + 5e-10, 4).alias(
                "avg_val"
            ),
        )
        .orderBy(F.col("etype").asc_nulls_first())
    )
