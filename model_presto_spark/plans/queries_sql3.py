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


# ---------------------------------------------------------------------------
# Q184 — correlated-subquery semantics (EXISTS / NOT EXISTS / scalar)
# ---------------------------------------------------------------------------
# The oracle states the query with correlated subqueries; the Spark
# side states the SAME semantics as decorrelated joins (left-join
# count, conditional max, anti-join) — exactly the rewrite Catalyst
# performs internally, so the conformance check pins the
# decorrelation, not just the syntax.
_Q184_ORACLE = """
    SELECT c.c_custkey,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
            WHERE o.o_custkey = c.c_custkey) AS n_orders,
           CAST((CASE WHEN EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_custkey = c.c_custkey
                                     AND o.o_totalprice > 300000)
                      THEN 1 ELSE 0 END) AS BIGINT) AS has_big
    FROM customer c
    WHERE c.c_custkey < 400
      AND EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F'
                        AND o.o_totalprice < 1000)
    ORDER BY c.c_custkey
"""


@register(
    "q184_correlated_subqueries",
    _Q184_ORACLE,
    doc="Correlated-subquery semantics: scalar COUNT subquery, "
    "EXISTS filter, NOT EXISTS exclusion, and an EXISTS-derived "
    "flag. Oracle states the correlated form; the Spark side states "
    "the decorrelated plan (per-customer aggregate + semi/anti "
    "joins) — the rewrite Catalyst itself applies, so both engines "
    "execute join plans and the conformance pins the decorrelation "
    "semantics (empty-group counts, null-safe anti join).",
)
def q184(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 400)
    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.max(
            F.when(F.col("o_totalprice") > 300000, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("has_big"),
    )
    bad = o.filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") < 1000)
    ).select(F.col("o_custkey").alias("c_custkey"))
    return (
        c.join(per_cust, "c_custkey")  # inner join == EXISTS(any order)
        .join(bad, "c_custkey", "left_anti")  # NOT EXISTS
        .select("c_custkey", "n_orders", "has_big")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Q185 — exact-money aggregation (integer cents)
# ---------------------------------------------------------------------------
# Money sums in double are order-dependent in the last ulps — the
# root of every float-ordering hazard in this suite. The engine
# pattern: round each line to integer CENTS once (the true value is
# integral, fp error ~1e-10, so the .5-boundary rounding divergence
# between engines is unreachable), then aggregate BIGINTs — exact,
# associative, engine- and partition-order-independent.
_Q185_ORACLE = """
    SELECT l_returnflag,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                AS BIGINT) AS gross_cents,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                         AS BIGINT)) AS BIGINT) AS net_cents,
           ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                          AS BIGINT)) / 100.0, 2) AS net_dollars
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""


@register(
    "q185_exact_money",
    _Q185_ORACLE,
    doc="Exact-money aggregation: per-line rounding to integer cents "
    "(ROUND before CAST so DuckDB's rounding cast and Spark's "
    "truncating cast agree on the already-integral double), then "
    "BIGINT sums — exact and summation-order-independent, the "
    "pattern that removes the float-ordering hazard from every "
    "revenue rollup. No epsilon nudges needed: the output is "
    "integer-deterministic.",
)
def q185(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    gross_c = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    net_c = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("bigint")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(gross_c).cast("bigint").alias("gross_cents"),
            F.sum(net_c).cast("bigint").alias("net_cents"),
        )
        .select(
            "l_returnflag",
            "gross_cents",
            "net_cents",
            F.round(F.col("net_cents") / 100.0, 2).alias("net_dollars"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Q186 — UNION BY NAME with missing columns
# ---------------------------------------------------------------------------
_Q186_ORACLE = """
    WITH a AS (
      SELECT o_custkey AS entity, o_totalprice AS amount
      FROM orders WHERE o_custkey < 100
    ), b AS (
      SELECT c_custkey AS entity, c_mktsegment AS segment
      FROM customer WHERE c_custkey < 100
    ), u AS (
      SELECT * FROM a UNION ALL BY NAME SELECT * FROM b
    )
    SELECT entity,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(amount) AS BIGINT) AS n_amount,
           CAST(COUNT(segment) AS BIGINT) AS n_segment
    FROM u
    GROUP BY entity
    ORDER BY entity
"""


@register(
    "q186_union_by_name",
    _Q186_ORACLE,
    doc="Schema-evolving union: two relations with only the entity "
    "key in common, merged positionally-by-NAME with missing columns "
    "null-filled (Spark unionByName(allowMissingColumns) == DuckDB "
    "UNION ALL BY NAME) — the append path when a source adds or "
    "drops columns mid-stream. Null counts per side prove the fill "
    "semantics.",
)
def q186(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    a = o.select(
        F.col("o_custkey").alias("entity"), F.col("o_totalprice").alias("amount")
    )
    b = c.select(
        F.col("c_custkey").alias("entity"), F.col("c_mktsegment").alias("segment")
    )
    u = a.unionByName(b, allowMissingColumns=True)
    return (
        u.groupBy("entity")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("amount").alias("n_amount"),
            F.count("segment").alias("n_segment"),
        )
        .orderBy("entity")
    )
