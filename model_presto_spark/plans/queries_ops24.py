"""Conformance queries: round-7 operator batch #18 (q301+) —
ABC/XYZ inventory classification, session entry/exit analysis,
latency SLO burn, functional-dependency discovery, histogram bin
planning.

Parity: classifications and violation counts are exact integers;
CV/percentile thresholds share both engines' arithmetic."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import R6_SQL, _t, r6, register

_R6 = R6_SQL


# ---------------------------------------------------------------------------
# Q301 — ABC/XYZ inventory classification
# ---------------------------------------------------------------------------
# Two-axis part classification: ABC by cumulative revenue share
# (80/95 cuts on the ranked prefix) x XYZ by monthly demand
# variability (CV cuts at 0.5/1.0).  Revenue/quantity moments are
# exact; output is the 9-cell class matrix with counts and value.
_Q301_ORACLE = """
    WITH rev AS (
      SELECT l_partkey AS pk,
             CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)) * 100,
                        0) AS BIGINT) AS cents
      FROM lineitem GROUP BY pk
    ), monthly AS (
      SELECT l_partkey AS pk,
             strftime(date_trunc('month', l_shipdate), '%Y-%m') AS m,
             CAST(SUM(l_quantity) AS BIGINT) AS q
      FROM lineitem GROUP BY pk, m
    ), cv AS (
      SELECT pk,
             SQRT(GREATEST(
               (CAST(COUNT(*) AS DOUBLE) * SUM(q * q)
                - CAST(SUM(q) AS DOUBLE) * SUM(q))
               / (CAST(COUNT(*) AS DOUBLE) * (COUNT(*) - 1)), 0.0))
             / (CAST(SUM(q) AS DOUBLE) / COUNT(*)) AS cv
      FROM monthly GROUP BY pk HAVING COUNT(*) > 1
    ), ranked AS (
      SELECT r.pk, r.cents, c.cv,
             SUM(r.cents) OVER (ORDER BY r.cents DESC, r.pk
                                ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(r.cents) OVER () AS tot
      FROM rev r JOIN cv c ON c.pk = r.pk
    ), classed AS (
      SELECT pk, cents, cv,
             CASE WHEN CAST(cum AS DOUBLE) / tot <= 0.8 THEN 'A'
                  WHEN CAST(cum AS DOUBLE) / tot <= 0.95 THEN 'B'
                  ELSE 'C' END AS abc,
             CASE WHEN cv <= 0.5 THEN 'X'
                  WHEN cv <= 1.0 THEN 'Y'
                  ELSE 'Z' END AS xyz
      FROM ranked
    )
    SELECT abc, xyz,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(SUM(cents) / 100.0 + 5e-10, 2) AS revenue,
           {MCV} AS mean_cv
    FROM classed
    GROUP BY abc, xyz
    ORDER BY abc, xyz
""".replace("{MCV}", R6_SQL.format(x="AVG(cv)"))


@register(
    "q301_abc_xyz",
    _Q301_ORACLE,
    doc="ABC/XYZ classification matrix: parts ranked by cumulative "
    "revenue share (A<=80%, B<=95%) crossed with monthly-demand "
    "coefficient of variation (X<=0.5, Y<=1.0).  Revenue prefix "
    "sums are exact cents; CV from exact quantity moments.  The "
    "inventory-policy segmentation classic.",
)
def q301(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            * 100,
            0,
        )
        .cast("bigint")
        .alias("cents")
    )
    monthly = li.groupBy(
        F.col("l_partkey").alias("mpk"),
        F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias(
            "m"
        ),
    ).agg(F.sum("l_quantity").cast("bigint").alias("q"))
    nd = F.count(F.lit(1)).cast("double")
    cv = (
        monthly.groupBy("mpk")
        .agg(
            (
                F.sqrt(
                    F.greatest(
                        (
                            nd * F.sum(F.col("q") * F.col("q"))
                            - F.sum("q").cast("double") * F.sum("q")
                        )
                        / (nd * (F.count(F.lit(1)) - 1)),
                        F.lit(0.0),
                    )
                )
                / (F.sum("q").cast("double") / F.count(F.lit(1)))
            ).alias("cv"),
            F.count(F.lit(1)).alias("n_months"),
        )
        .where(F.col("n_months") > 1)
    )
    w = Window.orderBy(F.col("cents").desc(), "pk").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = rev.join(cv, rev.pk == cv.mpk).select(
        "pk",
        "cents",
        "cv",
        F.sum("cents").over(w).alias("cum"),
        F.sum("cents").over(Window.partitionBy()).alias("tot"),
    )
    share = F.col("cum").cast("double") / F.col("tot")
    abc = (
        F.when(share <= 0.8, "A").when(share <= 0.95, "B").otherwise("C")
    )
    xyz = (
        F.when(F.col("cv") <= 0.5, "X")
        .when(F.col("cv") <= 1.0, "Y")
        .otherwise("Z")
    )
    return (
        ranked.select(
            "cents", "cv", abc.alias("abc"), xyz.alias("xyz")
        )
        .groupBy("abc", "xyz")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.sum("cents") / 100.0 + 5e-10, 2).alias("revenue"),
            r6(F.avg("cv")).alias("mean_cv"),
        )
        .orderBy("abc", "xyz")
    )


# ---------------------------------------------------------------------------
# Q302 — Session entry/exit analysis
# ---------------------------------------------------------------------------
# Gap-based sessions (30-minute timeout) per user; which event
# types open and close sessions, their bounce share (single-event
# sessions), and mean session length.  One window pass to session
# ids (q63's machinery inline), exact integer counts.
_Q302_GAP_US = 30 * 60 * 1_000_000

_Q302_BR = R6_SQL.format(
    x=(
        "CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)"
        " AS DOUBLE) / COUNT(*)"
    )
)
_Q302_ML = R6_SQL.format(x="AVG(CAST(n_events AS DOUBLE))")

_Q302_ORACLE = f"""
    WITH ev2 AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN epoch_us(ts)
                       - LAG(epoch_us(ts))
                         OVER (PARTITION BY user_id
                               ORDER BY ts, event_id)
                       > {_Q302_GAP_US}
                    OR LAG(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), sess AS (
      SELECT user_id, event_type, ts, event_id,
             SUM(is_new) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM ev2
    ), bounds AS (
      SELECT user_id, sid,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             MIN_BY(event_type, ts) AS entry_type,
             MAX_BY(event_type, ts) AS exit_type
      FROM sess GROUP BY user_id, sid
    )
    SELECT entry_type,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bounce,
           {_Q302_BR} AS bounce_rate,
           {_Q302_ML} AS mean_len,
           CAST(SUM(CASE WHEN exit_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchase_exit
    FROM bounds
    GROUP BY entry_type
    ORDER BY entry_type
"""


@register(
    "q302_entry_exit",
    _Q302_ORACLE,
    doc="Session entry/exit analysis over 30-minute gap sessions: "
    "per entry event type, session count, bounce share "
    "(single-event sessions), mean length, and purchase-exit "
    "count.  One user-keyed window pass to session ids, min_by/"
    "max_by for the boundary events.",
)
def q302(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ev2 = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            (us - F.lag(us).over(w) > _Q302_GAP_US)
            | F.lag("ts").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    sess = ev2.withColumn(
        "sid",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    bounds = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min_by("event_type", F.col("ts")).alias("entry_type"),
        F.max_by("event_type", F.col("ts")).alias("exit_type"),
    )
    return (
        bounds.groupBy("entry_type")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum(
                F.when(F.col("n_events") == 1, 1).otherwise(0)
            ).alias("n_bounce"),
            r6(
                F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
                .cast("double")
                / F.count(F.lit(1))
            ).alias("bounce_rate"),
            r6(F.avg(F.col("n_events").cast("double"))).alias(
                "mean_len"
            ),
            F.sum(
                F.when(F.col("exit_type") == "purchase", 1).otherwise(0)
            ).alias("n_purchase_exit"),
        )
        .orderBy("entry_type")
    )


# ---------------------------------------------------------------------------
# Q303 — Latency SLO burn (p95 targets on inter-event gaps)
# ---------------------------------------------------------------------------
# Treat per-user inter-event gaps as request latencies per event
# type: p50/p95/p99 (exact integer-microsecond order statistics
# via interpolated percentile), plus the daily burn rate against a
# fixed 20-minute p95 SLO.
_Q303_SLO_US = 20 * 60 * 1_000_000

_Q303_P50 = R6_SQL.format(x="p50 / 60.0e6")
_Q303_P95 = R6_SQL.format(x="p95 / 60.0e6")
_Q303_P99 = R6_SQL.format(x="p99 / 60.0e6")
_Q303_BURN = R6_SQL.format(x="CAST(b.n_breach AS DOUBLE) / b.n_gaps")

_Q303_ORACLE = f"""
    WITH gaps AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             epoch_us(ts) - LAG(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS g
      FROM events
    ), gg AS MATERIALIZED (
      SELECT event_type, day, g FROM gaps WHERE g IS NOT NULL
    ), pct AS (
      SELECT event_type,
             quantile_cont(g, 0.50) AS p50,
             quantile_cont(g, 0.95) AS p95,
             quantile_cont(g, 0.99) AS p99
      FROM gg GROUP BY event_type
    ), burn AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_gaps,
             CAST(SUM(CASE WHEN g > {_Q303_SLO_US} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_breach
      FROM gg GROUP BY event_type
    )
    SELECT p.event_type,
           {_Q303_P50} AS p50_min,
           {_Q303_P95} AS p95_min,
           {_Q303_P99} AS p99_min,
           b.n_gaps, b.n_breach,
           {_Q303_BURN} AS breach_rate
    FROM pct p JOIN burn b ON b.event_type = p.event_type
    ORDER BY p.event_type
"""


@register(
    "q303_slo_burn",
    _Q303_ORACLE,
    doc="Latency-style SLO audit on per-user inter-event gaps by "
    "event type: p50/p95/p99 in minutes (shared interpolation "
    "arithmetic over exact integer micros) and the breach rate "
    "against a 20-minute target.  The SRE percentile dashboard as "
    "one windowed pass + two aggregations.",
)
def q303(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gg = ev.select(
        "event_type",
        F.to_date("ts").alias("day"),
        (us - F.lag(us).over(w)).alias("g"),
    ).where(F.col("g").isNotNull()).localCheckpoint(
        eager=False
    )  # pct + burn
    pct = gg.groupBy("event_type").agg(
        F.percentile("g", F.lit(0.50)).alias("p50"),
        F.percentile("g", F.lit(0.95)).alias("p95"),
        F.percentile("g", F.lit(0.99)).alias("p99"),
    )
    burn = gg.groupBy(F.col("event_type").alias("be")).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum(
            F.when(F.col("g") > _Q303_SLO_US, 1).otherwise(0)
        ).alias("n_breach"),
    )
    return (
        pct.join(burn, F.col("event_type") == F.col("be"))
        .select(
            "event_type",
            r6(F.col("p50") / 60.0e6).alias("p50_min"),
            r6(F.col("p95") / 60.0e6).alias("p95_min"),
            r6(F.col("p99") / 60.0e6).alias("p99_min"),
            "n_gaps",
            "n_breach",
            r6(
                F.col("n_breach").cast("double") / F.col("n_gaps")
            ).alias("breach_rate"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Q304 — Functional-dependency discovery
# ---------------------------------------------------------------------------
# Audit candidate FDs A -> B by exact violation counting: a
# determinant value violates when it maps to >1 dependent value;
# strength = 1 - (extra pairs)/(distinct determinants).  Four
# candidates across orders/lineitem checked from integer
# distinct counts in one pass each.
_Q304_ORACLE = """
    WITH cands AS (
      SELECT 'o_orderkey->o_custkey' AS fd,
             CAST(COUNT(*) AS BIGINT) AS n_det,
             CAST(SUM(n_vals - 1) AS BIGINT) AS extra,
             CAST(SUM(CASE WHEN n_vals > 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS violating
      FROM (
        SELECT o_orderkey,
               COUNT(DISTINCT o_custkey) AS n_vals
        FROM orders GROUP BY o_orderkey
      )
      UNION ALL
      SELECT 'l_orderkey->l_suppkey',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(n_vals - 1) AS BIGINT),
             CAST(SUM(CASE WHEN n_vals > 1 THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM (
        SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_vals
        FROM lineitem GROUP BY l_orderkey
      )
      UNION ALL
      SELECT 'l_partkey->l_suppkey',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(n_vals - 1) AS BIGINT),
             CAST(SUM(CASE WHEN n_vals > 1 THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM (
        SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS n_vals
        FROM lineitem GROUP BY l_partkey
      )
      UNION ALL
      SELECT 'o_custkey->o_orderpriority',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(n_vals - 1) AS BIGINT),
             CAST(SUM(CASE WHEN n_vals > 1 THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM (
        SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS n_vals
        FROM orders GROUP BY o_custkey
      )
    )
    SELECT fd, n_det, violating,
           {STRENGTH} AS fd_strength,
           violating = 0 AS holds
    FROM cands
    ORDER BY fd
""".replace(
    "{STRENGTH}",
    R6_SQL.format(
        x="1.0 - CAST(extra AS DOUBLE) / n_det"
    ),
)


@register(
    "q304_fd_discovery",
    _Q304_ORACLE,
    doc="Functional-dependency audit: four candidate A->B rules "
    "checked by exact violation counts (determinants mapping to "
    ">1 dependent), FD strength = 1 - extra/n_det, boolean holds.  "
    "The schema-inference / data-quality primitive, one "
    "distinct-count aggregation per candidate.",
)
def q304(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")

    def fd(df: DataFrame, name: str, det: str, dep: str) -> DataFrame:
        per = df.groupBy(det).agg(
            F.count_distinct(dep).alias("n_vals")
        )
        return per.agg(
            F.lit(name).alias("fd"),
            F.count(F.lit(1)).alias("n_det"),
            F.sum(F.col("n_vals") - 1).alias("extra"),
            F.sum(
                F.when(F.col("n_vals") > 1, 1).otherwise(0)
            ).alias("violating"),
        )

    cands = (
        fd(o, "o_orderkey->o_custkey", "o_orderkey", "o_custkey")
        .unionAll(
            fd(li, "l_orderkey->l_suppkey", "l_orderkey", "l_suppkey")
        )
        .unionAll(
            fd(li, "l_partkey->l_suppkey", "l_partkey", "l_suppkey")
        )
        .unionAll(
            fd(
                o,
                "o_custkey->o_orderpriority",
                "o_custkey",
                "o_orderpriority",
            )
        )
    )
    return cands.select(
        "fd",
        "n_det",
        "violating",
        r6(
            1.0 - F.col("extra").cast("double") / F.col("n_det")
        ).alias("fd_strength"),
        (F.col("violating") == 0).alias("holds"),
    ).orderBy("fd")


# ---------------------------------------------------------------------------
# Q305 — Histogram bin planning (Sturges / Scott / Freedman-Diaconis)
# ---------------------------------------------------------------------------
# The three classic bin-width rules for the event-value
# distribution, from exact moments and interpolated quartiles:
# Sturges k = ceil(log2 n)+1, Scott h = 3.49 s n^(-1/3), FD
# h = 2 IQR n^(-1/3) — plus the implied bin counts.
_Q305_ORACLE = """
    WITH s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             MIN(value) AS lo, MAX(value) AS hi,
             SUM(value) AS sv, SUM(value * value) AS svv,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.75) AS q3
      FROM events
    ), d AS (
      SELECT n, lo, hi, q3 - q1 AS iqr,
             SQRT((CAST(n AS DOUBLE) * svv - sv * sv)
                  / (CAST(n AS DOUBLE) * (n - 1))) AS sd
      FROM s
    )
    SELECT n,
           CAST(CEIL(ln(CAST(n AS DOUBLE)) / ln(2.0)) + 1 AS BIGINT)
             AS sturges_bins,
           {SCOTT_H} AS scott_width,
           CAST(CEIL((hi - lo)
                     / (3.49 * sd / POW(CAST(n AS DOUBLE), 1.0 / 3)))
                AS BIGINT) AS scott_bins,
           {FD_H} AS fd_width,
           CAST(CEIL((hi - lo)
                     / (2.0 * iqr / POW(CAST(n AS DOUBLE), 1.0 / 3)))
                AS BIGINT) AS fd_bins
    FROM d
""".replace(
    "{SCOTT_H}",
    R6_SQL.format(x="3.49 * sd / POW(CAST(n AS DOUBLE), 1.0 / 3)"),
).replace(
    "{FD_H}",
    R6_SQL.format(x="2.0 * iqr / POW(CAST(n AS DOUBLE), 1.0 / 3)"),
)


@register(
    "q305_bin_planner",
    _Q305_ORACLE,
    doc="Histogram bin planning: Sturges, Scott, and "
    "Freedman-Diaconis widths/counts for the value distribution "
    "from exact moments + interpolated quartiles.  The q18 "
    "histogram's principled-width companion.",
)
def q305(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    s = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.sum("value").alias("sv"),
        F.sum(F.col("value") * F.col("value")).alias("svv"),
        F.percentile("value", F.lit(0.25)).alias("q1"),
        F.percentile("value", F.lit(0.75)).alias("q3"),
    )
    nd = F.col("n").cast("double")
    sd = F.sqrt(
        (nd * F.col("svv") - F.col("sv") * F.col("sv"))
        / (nd * (F.col("n") - 1))
    )
    iqr = F.col("q3") - F.col("q1")
    cube = F.pow(nd, 1.0 / 3)
    scott_h = 3.49 * sd / cube
    fd_h = 2.0 * iqr / cube
    return s.select(
        "n",
        (F.ceil(F.log(nd) / F.log(F.lit(2.0))) + 1)
        .cast("bigint")
        .alias("sturges_bins"),
        r6(scott_h).alias("scott_width"),
        F.ceil((F.col("hi") - F.col("lo")) / scott_h)
        .cast("bigint")
        .alias("scott_bins"),
        r6(fd_h).alias("fd_width"),
        F.ceil((F.col("hi") - F.col("lo")) / fd_h)
        .cast("bigint")
        .alias("fd_bins"),
    )
