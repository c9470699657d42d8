"""Conformance queries batch #92 (q654+) — mean-reversion
calibration, discrete-choice IIA diagnostics, Erlang-B blocking,
panel Mundlak device, and income-mobility indices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q654 — Ornstein-Uhlenbeck calibration and mean-reversion half-life
# ---------------------------------------------------------------------------
# Daily revenue fit as AR(1) by exact-moment OLS on lag pairs; the
# exact OU discretization maps rho to the reversion speed theta =
# -ln(rho), half-life ln(2)/theta, long-run mean a/(1-rho), and the
# stationary sd resid_sd/sqrt(1-rho^2) — the pairs-trading
# calibration behind every mean-reversion strategy.
_Q654_ORACLE = """
    WITH daily AS MATERIALIZED (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t, x
      FROM (SELECT EXTRACT(day FROM ts) AS d,
                   ROUND(SUM(ROUND(value * 100)) / 1000.0) AS x
            FROM events GROUP BY EXTRACT(day FROM ts))
    ), pairs AS MATERIALIZED (
      SELECT x, LAG(x) OVER (ORDER BY t) AS xl FROM daily
    ), p AS MATERIALIZED (
      SELECT x, xl FROM pairs WHERE xl IS NOT NULL
    ), fit AS (
      SELECT COUNT(*) AS n,
             (SUM(x * xl) - COUNT(*) * AVG(x) * AVG(xl))
               / (SUM(xl * xl) - COUNT(*) * AVG(xl) * AVG(xl)) AS rho,
             AVG(x) AS mx, AVG(xl) AS mxl
      FROM p
    ), resid AS (
      SELECT f.rho, f.mx - f.rho * f.mxl AS a,
             SQRT(AVG(POW(p.x - (f.mx - f.rho * f.mxl)
                          - f.rho * p.xl, 2))) AS se
      FROM p, fit f
      GROUP BY f.rho, f.mx, f.mxl
    )
    SELECT ROUND(rho + 5e-12, 6) AS ar1_rho,
           ROUND(CASE WHEN rho > 0 AND rho < 1
                      THEN -LN(rho) END + 5e-12, 6) AS theta,
           ROUND(CASE WHEN rho > 0 AND rho < 1
                      THEN LN(2) / (-LN(rho)) END + 5e-12, 6)
             AS half_life_days,
           ROUND(a / (1 - rho) + 5e-12, 6) AS long_run_mean,
           ROUND(CASE WHEN rho * rho < 1
                      THEN se / SQRT(1 - rho * rho) END + 5e-12, 6)
             AS stationary_sd,
           rho > 0 AND rho < 1 AS mean_reverting
    FROM resid
"""


@register(
    "q654_ou_halflife",
    _Q654_ORACLE,
    doc="Ornstein-Uhlenbeck calibration: AR(1) rho from lagged daily "
    "revenue, exact-discretization theta = -ln(rho), half-life "
    "ln2/theta, long-run mean and stationary sd — mean-reversion "
    "speed on top of autocorrelation (q149) and AR order selection "
    "(q321).",
)
def q654(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    base = e.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.round(F.sum(F.round(F.col("value") * 100)) / 1000.0).alias("x")
    )
    daily = base.select(
        F.row_number().over(Window.orderBy("d")).alias("t"), "x"
    )
    p = daily.select(
        "x", F.lag("x").over(Window.orderBy("t")).alias("xl")
    ).filter(F.col("xl").isNotNull()).localCheckpoint(eager=False)
    n = F.count(F.lit(1))
    fit = p.agg(
        (
            (F.sum(F.col("x") * F.col("xl")) - n * F.avg("x") * F.avg("xl"))
            / (F.sum(F.col("xl") * F.col("xl")) - n * F.avg("xl") * F.avg("xl"))
        ).alias("rho"),
        F.avg("x").alias("mx"),
        F.avg("xl").alias("mxl"),
    )
    resid = (
        p.crossJoin(F.broadcast(fit))
        .groupBy("rho", "mx", "mxl")
        .agg(
            F.sqrt(
                F.avg(
                    F.pow(
                        F.col("x")
                        - (F.col("mx") - F.col("rho") * F.col("mxl"))
                        - F.col("rho") * F.col("xl"),
                        2,
                    )
                )
            ).alias("se")
        )
        .select(
            "rho",
            (F.col("mx") - F.col("rho") * F.col("mxl")).alias("a"),
            "se",
        )
    )
    rho = F.col("rho")
    rev = (rho > 0) & (rho < 1)
    return resid.select(
        r6(rho).alias("ar1_rho"),
        r6(F.when(rev, -F.log(rho))).alias("theta"),
        r6(F.when(rev, F.log(F.lit(2.0)) / (-F.log(rho)))).alias(
            "half_life_days"
        ),
        r6(F.col("a") / (1 - rho)).alias("long_run_mean"),
        r6(
            F.when(rho * rho < 1, F.col("se") / F.sqrt(1 - rho * rho))
        ).alias("stationary_sd"),
        rev.alias("mean_reverting"),
    )


# ---------------------------------------------------------------------------
# Q655 — IIA diagnostic: share-ratio invariance under set reduction
# ---------------------------------------------------------------------------
# Multinomial logit assumes the share ratio between two brands is
# unchanged when a third leaves the choice set. Empirically: shares
# of brands 2-5 conditional on choosing among them, vs their shares
# among customers who never bought brand 1 — the per-brand
# distortion is the Hausman-McFadden red flag for MNL (q506).
_Q655_ORACLE = """
    WITH top5 AS MATERIALIZED (
      SELECT p.p_brand AS b,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, p.p_brand) AS rk
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand ORDER BY COUNT(*) DESC, p.p_brand LIMIT 5
    ), li AS MATERIALIZED (
      SELECT o.o_custkey AS ck, t.b, t.rk
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN top5 t ON t.b = p.p_brand
      JOIN orders o ON o.o_orderkey = l.l_orderkey
    ), b1_custs AS MATERIALIZED (
      SELECT DISTINCT ck FROM li WHERE rk = 1
    ), cond AS (
      SELECT b, COUNT(*) * 1.0
               / SUM(COUNT(*)) OVER () AS s_cond
      FROM li WHERE rk > 1 GROUP BY b
    ), restr AS (
      SELECT li.b, COUNT(*) * 1.0
               / SUM(COUNT(*)) OVER () AS s_restr
      FROM li
      WHERE li.rk > 1
        AND NOT EXISTS (SELECT 1 FROM b1_custs c WHERE c.ck = li.ck)
      GROUP BY li.b
    )
    SELECT c.b AS brand,
           ROUND(c.s_cond + 5e-12, 6) AS share_conditional,
           ROUND(r.s_restr + 5e-12, 6) AS share_restricted,
           ROUND(ABS(r.s_restr / c.s_cond - 1) + 5e-12, 6) AS iia_distortion
    FROM cond c JOIN restr r ON r.b = c.b
    ORDER BY c.b
"""


@register(
    "q655_iia_check",
    _Q655_ORACLE,
    doc="IIA diagnostic: shares of brands 2-5 conditional on choosing "
    "among them vs the same shares restricted to customers who "
    "never bought brand 1 — share-ratio invariance is what MNL "
    "(q506) assumes; the per-brand distortion is the "
    "Hausman-McFadden warning.",
)
def q655(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lp = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    top5 = (
        lp.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "p_brand")
        .limit(5)
        .select(
            F.col("p_brand").alias("b"),
            F.row_number().over(Window.orderBy(F.desc("n"), "p_brand")).alias(
                "rk"
            ),
        )
    )
    lij = (
        lp.join(F.broadcast(top5), lp.p_brand == top5.b)
        .join(o, lp.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("ck"), "b", "rk")
        # lineage cut: lij feeds the buyer set + the conditional and
        # restricted share branches (plan audit: 20 scans with
        # persist-only lineage)
        .localCheckpoint(eager=False)
    )
    b1 = lij.filter(F.col("rk") == 1).select("ck").distinct()
    wall = Window.partitionBy()
    cond = (
        lij.filter(F.col("rk") > 1)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "b",
            (F.col("cnt") * 1.0 / F.sum("cnt").over(wall)).alias("s_cond"),
        )
    )
    restr = (
        lij.filter(F.col("rk") > 1)
        .join(b1.withColumnRenamed("ck", "ck1"),
              F.col("ck") == F.col("ck1"), "left_anti")
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "b",
            (F.col("cnt") * 1.0 / F.sum("cnt").over(wall)).alias("s_restr"),
        )
    )
    return (
        cond.join(restr, "b")
        .select(
            F.col("b").alias("brand"),
            r6(F.col("s_cond")).alias("share_conditional"),
            r6(F.col("s_restr")).alias("share_restricted"),
            r6(F.abs(F.col("s_restr") / F.col("s_cond") - 1)).alias(
                "iia_distortion"
            ),
        )
        .orderBy("brand")
    )


# ---------------------------------------------------------------------------
# Q656 — Erlang-B blocking probabilities by the classic recursion
# ---------------------------------------------------------------------------
# Offered load E = purchase arrival rate x 0.1h mean service, then
# the numerically stable Erlang-B recursion B_k = E B_{k-1} / (k +
# E B_{k-1}) folded over k = 1..10 — the loss-system complement of
# Erlang-C waiting (q457), sized straight from the event stream.
_Q656_ORACLE = f"""
    WITH load AS (
      SELECT COUNT(*) * 1.0
               / ((MAX(epoch_us(CAST(ts AS TIMESTAMP)))
                   - MIN(epoch_us(CAST(ts AS TIMESTAMP)))) / 3.6e9)
               * CAST(0.1 AS DOUBLE) AS e
      FROM events WHERE event_type = 'purchase'
    ), folded AS (
      SELECT e,
             list_reduce(
               list_prepend([CAST(1 AS DOUBLE)],
                            list_transform(range(1, 11),
                                           k -> [CAST(k AS DOUBLE)])),
               (acc, x) -> [e * acc[1] / (x[1] + e * acc[1])]
             )[1] AS b10,
             list_reduce(
               list_prepend([CAST(1 AS DOUBLE)],
                            list_transform(range(1, 6),
                                           k -> [CAST(k AS DOUBLE)])),
               (acc, x) -> [e * acc[1] / (x[1] + e * acc[1])]
             )[1] AS b5,
             list_reduce(
               list_prepend([CAST(1 AS DOUBLE)],
                            list_transform(range(1, 3),
                                           k -> [CAST(k AS DOUBLE)])),
               (acc, x) -> [e * acc[1] / (x[1] + e * acc[1])]
             )[1] AS b2,
             e / (1 + e) AS b1
      FROM load
    )
    SELECT ROUND(e + 5e-12, 6) AS offered_erlangs,
           ROUND(b1 + 5e-12, 6) AS blocking_1,
           ROUND(b2 + 5e-12, 6) AS blocking_2,
           ROUND(b5 + 5e-12, 6) AS blocking_5,
           ROUND(b10 + 5e-12, 6) AS blocking_10
    FROM folded
"""


@register(
    "q656_erlang_b",
    _Q656_ORACLE,
    doc="Erlang-B loss probabilities via the stable recursion B_k = "
    "E B_(k-1) / (k + E B_(k-1)) folded to k = 1, 2, 5, 10 servers, "
    "offered load from the purchase arrival rate x 0.1h service — "
    "the blocking complement of Erlang-C waiting (q457).",
)
def q656(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    load = e.agg(
        (
            F.count(F.lit(1))
            * 1.0
            / ((F.max(us) - F.min(us)) / 3.6e9)
            * 0.1
        ).alias("e")
    )

    def erlb(k: int) -> str:
        return (
            f"aggregate(sequence(1, {k}), CAST(1 AS DOUBLE), "
            "(acc, x) -> e * acc / (CAST(x AS DOUBLE) + e * acc))"
        )

    return load.select(
        r6(F.col("e")).alias("offered_erlangs"),
        r6(F.col("e") / (1 + F.col("e"))).alias("blocking_1"),
        r6(F.expr(erlb(2))).alias("blocking_2"),
        r6(F.expr(erlb(5))).alias("blocking_5"),
        r6(F.expr(erlb(10))).alias("blocking_10"),
    )


# ---------------------------------------------------------------------------
# Q657 — Mundlak device: within vs between slopes in a panel
# ---------------------------------------------------------------------------
# Customers nested in nations, spend on balance: the pooled, within
# (nation-demeaned), and between (nation means) slopes, and the
# Mundlak contrast gamma = between - within that signals correlated
# group effects — the panel diagnostic behind the fixed-vs-random
# choice, extending the within estimator (q239).
_Q657_ORACLE = """
    WITH u AS MATERIALIZED (
      SELECT c.c_nationkey AS g,
             ROUND(c.c_acctbal * 100) / 1e5 AS x,
             COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0) / 1e6 AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_nationkey, c.c_acctbal
    ), gm AS MATERIALIZED (
      SELECT g, AVG(x) AS gx, AVG(y) AS gy, COUNT(*) AS ng
      FROM u GROUP BY g
    ), pooled AS (
      SELECT (SUM(x * y) - COUNT(*) * AVG(x) * AVG(y))
               / (SUM(x * x) - COUNT(*) * AVG(x) * AVG(x)) AS b_pool
      FROM u
    ), within AS (
      SELECT SUM((u.x - m.gx) * (u.y - m.gy))
               / SUM((u.x - m.gx) * (u.x - m.gx)) AS b_within
      FROM u JOIN gm m ON m.g = u.g
    ), between_f AS (
      SELECT (SUM(gx * gy) - COUNT(*) * AVG(gx) * AVG(gy))
               / (SUM(gx * gx) - COUNT(*) * AVG(gx) * AVG(gx)) AS b_between
      FROM gm
    )
    SELECT ROUND(p.b_pool + 5e-12, 6) AS slope_pooled,
           ROUND(w.b_within + 5e-12, 6) AS slope_within,
           ROUND(b.b_between + 5e-12, 6) AS slope_between,
           ROUND(b.b_between - w.b_within + 5e-12, 6) AS mundlak_gamma,
           ABS(b.b_between - w.b_within) > 0.1 AS correlated_effects
    FROM pooled p, within w, between_f b
"""


@register(
    "q657_mundlak_device",
    _Q657_ORACLE,
    doc="Mundlak device: pooled, within (nation-demeaned), and "
    "between (nation-means) spend-on-balance slopes, gamma = "
    "between - within flagging correlated group effects — the "
    "fixed-vs-random-effects diagnostic extending the within "
    "estimator (q239).",
)
def q657(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    u = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_nationkey", "c_acctbal")
        .agg(
            (
                F.coalesce(F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0))
                / 1e6
            ).alias("y")
        )
        .select(
            F.col("c_nationkey").alias("g"),
            (F.round(F.col("c_acctbal") * 100) / 1e5).alias("x"),
            "y",
        )
        .localCheckpoint(eager=False)
    )
    gm = u.groupBy("g").agg(
        F.avg("x").alias("gx"), F.avg("y").alias("gy")
    )
    n = F.count(F.lit(1))
    pooled = u.agg(
        (
            (F.sum(F.col("x") * F.col("y")) - n * F.avg("x") * F.avg("y"))
            / (F.sum(F.col("x") * F.col("x")) - n * F.avg("x") * F.avg("x"))
        ).alias("b_pool")
    )
    within = (
        u.join(F.broadcast(gm), "g")
        .agg(
            (
                F.sum((F.col("x") - F.col("gx")) * (F.col("y") - F.col("gy")))
                / F.sum(
                    (F.col("x") - F.col("gx")) * (F.col("x") - F.col("gx"))
                )
            ).alias("b_within")
        )
    )
    between = gm.agg(
        (
            (F.sum(F.col("gx") * F.col("gy")) - n * F.avg("gx") * F.avg("gy"))
            / (F.sum(F.col("gx") * F.col("gx")) - n * F.avg("gx") * F.avg("gx"))
        ).alias("b_between")
    )
    return (
        pooled.crossJoin(F.broadcast(within))
        .crossJoin(F.broadcast(between))
        .select(
            r6(F.col("b_pool")).alias("slope_pooled"),
            r6(F.col("b_within")).alias("slope_within"),
            r6(F.col("b_between")).alias("slope_between"),
            r6(F.col("b_between") - F.col("b_within")).alias("mundlak_gamma"),
            (F.abs(F.col("b_between") - F.col("b_within")) > 0.1).alias(
                "correlated_effects"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Q658 — Shorrocks and Bartholomew income-mobility indices
# ---------------------------------------------------------------------------
# Customer spend quintiles in the first vs second half of the month
# form a 5x5 transition matrix: the Shorrocks trace index (k -
# sum p_ii)/(k-1) and Bartholomew's expected rank jump summarize
# mobility in two numbers — the index layer above raw migration
# matrices (q361/q367).
_Q658_ORACLE = """
    WITH halves AS MATERIALIZED (
      SELECT user_id AS ck,
             SUM(CASE WHEN EXTRACT(day FROM ts) <= 15
                      THEN ROUND(value * 100) ELSE 0 END) AS h1,
             SUM(CASE WHEN EXTRACT(day FROM ts) > 15
                      THEN ROUND(value * 100) ELSE 0 END) AS h2
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
      HAVING SUM(CASE WHEN EXTRACT(day FROM ts) <= 15
                      THEN 1 ELSE 0 END) > 0
         AND SUM(CASE WHEN EXTRACT(day FROM ts) > 15
                      THEN 1 ELSE 0 END) > 0
    ), q AS MATERIALIZED (
      SELECT ck,
             NTILE(5) OVER (ORDER BY h1, ck) AS q1,
             NTILE(5) OVER (ORDER BY h2, ck) AS q2
      FROM halves
    ), cell AS MATERIALIZED (
      SELECT q1, q2, COUNT(*) AS n FROM q GROUP BY q1, q2
    ), rows_t AS (
      SELECT q1, SUM(n) AS rn FROM cell GROUP BY q1
    ), norm AS (
      SELECT c.q1, c.q2, c.n * 1.0 / r.rn AS p
      FROM cell c JOIN rows_t r ON r.q1 = c.q1
    )
    SELECT CAST((SELECT SUM(n) FROM cell) AS BIGINT) AS n_customers,
           ROUND(SUM(CASE WHEN q1 = q2 THEN p ELSE 0 END) / 5
                 + 5e-12, 6) AS trace_share,
           ROUND((5 - SUM(CASE WHEN q1 = q2 THEN p ELSE 0 END)) / 4
                 + 5e-12, 6) AS shorrocks_index,
           ROUND(SUM(p * ABS(q1 - q2)) / 5 + 5e-12, 6) AS bartholomew_index
    FROM norm
"""


@register(
    "q658_shorrocks_mobility",
    _Q658_ORACLE,
    doc="Income-mobility indices: first-half vs second-half spend "
    "quintile transitions, Shorrocks trace index (k - tr P)/(k-1) "
    "and Bartholomew's expected rank jump — the scalar mobility "
    "layer above migration matrices (q361/q367).",
)
def q658(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    halves = (
        e.groupBy(F.col("user_id").alias("ck"))
        .agg(
            F.sum(
                F.when(
                    F.dayofmonth("ts") <= 15, F.round(F.col("value") * 100)
                ).otherwise(0)
            ).alias("h1"),
            F.sum(
                F.when(
                    F.dayofmonth("ts") > 15, F.round(F.col("value") * 100)
                ).otherwise(0)
            ).alias("h2"),
            F.sum(F.when(F.dayofmonth("ts") <= 15, 1).otherwise(0)).alias(
                "c1"
            ),
            F.sum(F.when(F.dayofmonth("ts") > 15, 1).otherwise(0)).alias(
                "c2"
            ),
        )
        .filter((F.col("c1") > 0) & (F.col("c2") > 0))
    )
    q = halves.select(
        "ck",
        F.ntile(5).over(Window.orderBy("h1", "ck")).alias("q1"),
        F.ntile(5).over(Window.orderBy("h2", "ck")).alias("q2"),
    )
    cell = q.groupBy("q1", "q2").agg(F.count(F.lit(1)).alias("n")).localCheckpoint(eager=False)
    rows_t = cell.groupBy("q1").agg(F.sum("n").alias("rn"))
    norm = cell.join(rows_t, "q1").select(
        "q1", "q2", (F.col("n") * 1.0 / F.col("rn")).alias("p")
    )
    tot = cell.agg(F.sum("n").alias("nc"))
    trace = F.sum(F.when(F.col("q1") == F.col("q2"), F.col("p")).otherwise(0.0))
    return norm.agg(
        trace.alias("tr"),
        F.sum(F.col("p") * F.abs(F.col("q1") - F.col("q2"))).alias("jump"),
    ).crossJoin(F.broadcast(tot)).select(
        F.col("nc").cast("bigint").alias("n_customers"),
        r6(F.col("tr") / 5).alias("trace_share"),
        r6((5 - F.col("tr")) / 4).alias("shorrocks_index"),
        r6(F.col("jump") / 5).alias("bartholomew_index"),
    )
