"""Conformance queries batch #44 (q414+) — geometric-churn LTV,
weighted-graph node disparity, second-price auction revenue,
newsvendor stocking, and the empirical copula.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q414 — geometric-churn customer lifetime value
# ---------------------------------------------------------------------------
# Weekly-cohort churn MLE (active in week w, absent in w+1, over
# all exposures) and revenue per active user-week give the
# geometric-model LTV = m / p in closed form — the scalar the
# discounted-LTV queries (q311) parameterize.  One self-join on
# the (user, week) activity relation + two aggregations.
_Q414_ORACLE = """
    WITH act AS (
      SELECT DISTINCT user_id,
             CAST(CEIL(EXTRACT(day FROM ts) / 7.0) AS BIGINT) AS wk
      FROM events WHERE event_type = 'purchase' AND EXTRACT(day FROM ts) <= 28
    ), expo AS (
      SELECT a.user_id, a.wk,
             CASE WHEN b.user_id IS NULL THEN 1 ELSE 0 END AS churned
      FROM act a LEFT JOIN act b
        ON b.user_id = a.user_id AND b.wk = a.wk + 1
      WHERE a.wk < 4
    ), rate AS (
      SELECT SUM(churned) * 1.0 / COUNT(*) AS p, COUNT(*) AS n_expo FROM expo
    ), rev AS (
      SELECT SUM(ROUND(value*100)) * 1.0
             / COUNT(DISTINCT user_id || '#'
                     || CAST(CEIL(EXTRACT(day FROM ts)/7.0) AS VARCHAR)) AS m_c
      FROM events WHERE event_type = 'purchase' AND EXTRACT(day FROM ts) <= 28
    )
    SELECT ROUND(r.p + 5e-12, 6) AS churn_rate,
           CAST(r.n_expo AS BIGINT) AS n_exposures,
           ROUND(v.m_c + 5e-12, 6) AS rev_per_active_week_c,
           ROUND(v.m_c / r.p + 5e-12, 6) AS ltv_c
    FROM rate r CROSS JOIN rev v
"""


@register(
    "q414_geometric_ltv",
    _Q414_ORACLE,
    doc="Geometric-churn LTV: weekly churn MLE from (week, week+1) "
    "activity self-join exposures, revenue per active user-week, "
    "LTV = m/p closed form — the cohort-economics scalar in three "
    "entity-keyed aggregations.",
)
def q414(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.dayofmonth("ts") <= 28)
    )
    wk = F.ceil(F.dayofmonth("ts") / 7.0).cast("bigint")
    act = ev.select("user_id", wk.alias("wk")).distinct()
    nxt = act.select(
        F.col("user_id").alias("b_user"), (F.col("wk") - 1).alias("b_wk")
    )
    expo = (
        act.filter(F.col("wk") < 4)
        .join(
            nxt,
            (F.col("user_id") == F.col("b_user")) & (F.col("wk") == F.col("b_wk")),
            "left",
        )
        .select(
            F.when(F.col("b_user").isNull(), 1).otherwise(0).alias("churned")
        )
    )
    rate = expo.agg(
        (F.sum("churned") * 1.0 / F.count(F.lit(1))).alias("p"),
        F.count(F.lit(1)).alias("n_expo"),
    )
    rev = ev.agg(
        (
            F.sum(F.round(F.col("value") * 100))
            * 1.0
            / F.count_distinct(
                F.concat(
                    F.col("user_id").cast("string"),
                    F.lit("#"),
                    wk.cast("string"),
                )
            )
        ).alias("m_c")
    )
    return rate.crossJoin(F.broadcast(rev)).select(
        r6(F.col("p")).alias("churn_rate"),
        F.col("n_expo").cast("bigint").alias("n_exposures"),
        r6(F.col("m_c")).alias("rev_per_active_week_c"),
        r6(F.col("m_c") / F.col("p")).alias("ltv_c"),
    )


# ---------------------------------------------------------------------------
# Q415 — weighted-graph node disparity
# ---------------------------------------------------------------------------
# Barthelemy disparity Y(i) = sum_j (w_ij / s_i)^2: does a node's
# strength concentrate on few edges (Y ~ 1) or spread evenly
# (Y ~ 1/k)?  k*Y beside it reads the concentration directly.
# Strengths broadcast back onto the edge relation — the weighted
# complement of the degree-based graph family.
_Q415_ORACLE = """
    WITH e AS (
      SELECT CAST(o_custkey % 200 AS BIGINT) AS u,
             CAST(o_orderkey % 200 AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM orders WHERE o_custkey % 200 <> o_orderkey % 200
      GROUP BY 1, 2
    ), sym AS (SELECT u, v, w FROM e UNION ALL SELECT v AS u, u AS v, w FROM e),
    st AS (SELECT u, SUM(w) AS s, COUNT(*) AS d FROM sym GROUP BY u),
    disp AS (
      SELECT sym.u, SUM((sym.w * 1.0 / st.s) * (sym.w * 1.0 / st.s)) AS y
      FROM sym JOIN st ON st.u = sym.u GROUP BY sym.u
    )
    SELECT st.u AS node, CAST(st.s AS BIGINT) AS strength,
           CAST(st.d AS BIGINT) AS degree,
           ROUND(disp.y + 5e-12, 6) AS disparity,
           ROUND(disp.y * st.d + 5e-12, 6) AS k_times_y
    FROM st JOIN disp ON disp.u = st.u
    ORDER BY strength DESC, node LIMIT 30
"""


@register(
    "q415_node_disparity",
    _Q415_ORACLE,
    doc="Weighted-edge disparity Y(i) = sum (w/s)^2 per node with "
    "k*Y concentration: edge multiplicities as weights, strengths "
    "joined back co-partitioned — the weighted-network measure "
    "beside the unweighted degree family (assortativity q222, "
    "rich-club q236).",
)
def q415(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    e = (
        o.select(
            (F.col("o_custkey") % 200).cast("bigint").alias("u"),
            (F.col("o_orderkey") % 200).cast("bigint").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"), F.col("w"))
    )
    st = sym.groupBy(F.col("u").alias("s_u")).agg(
        F.sum("w").alias("s"), F.count(F.lit(1)).alias("d")
    )
    joined = sym.join(F.broadcast(st), F.col("u") == F.col("s_u"))
    disp = joined.groupBy("u", "s", "d").agg(
        F.sum(
            (F.col("w") * 1.0 / F.col("s")) * (F.col("w") * 1.0 / F.col("s"))
        ).alias("y")
    )
    return (
        disp.select(
            F.col("u").alias("node"),
            F.col("s").cast("bigint").alias("strength"),
            F.col("d").cast("bigint").alias("degree"),
            r6(F.col("y")).alias("disparity"),
            r6(F.col("y") * F.col("d")).alias("k_times_y"),
        )
        .orderBy(F.col("strength").desc(), "node")
        .limit(30)
    )


# ---------------------------------------------------------------------------
# Q416 — second-price auction revenue
# ---------------------------------------------------------------------------
# Daily purchase values as bids in per-day auctions: winner (top
# bid) pays the SECOND price — first- vs second-price revenue from
# one ranking window, the Vickrey mechanism's revenue gap measured
# in integer cents.
_Q416_ORACLE = """
    WITH bids AS (
      SELECT CAST(ROUND(value*100) AS BIGINT) AS b,
             ROW_NUMBER() OVER (
               PARTITION BY CAST(EXTRACT(day FROM ts) AS BIGINT)
               ORDER BY ROUND(value*100) DESC, event_id) AS rk
      FROM events WHERE event_type = 'purchase'
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_auctions,
           CAST(SUM(CASE WHEN rk = 1 THEN b ELSE 0 END) AS BIGINT)
             AS first_price_rev_c,
           CAST(SUM(CASE WHEN rk = 2 THEN b ELSE 0 END) AS BIGINT)
             AS second_price_rev_c
    FROM bids WHERE rk <= 2
"""


@register(
    "q416_second_price_auction",
    _Q416_ORACLE,
    doc="Vickrey mechanics: per-day auctions over purchase bids, "
    "first- vs second-price revenue from one ranking window "
    "(integer cents, id tiebreak) — the auction-analytics shape "
    "(top-2 per group) in a single pass.",
)
def q416(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    b = F.round(F.col("value") * 100).cast("bigint")
    w = Window.partitionBy(F.dayofmonth("ts").cast("bigint")).orderBy(
        F.round(F.col("value") * 100).desc(), "event_id"
    )
    bids = ev.select(b.alias("b"), F.row_number().over(w).alias("rk")).filter(
        F.col("rk") <= 2
    )
    return bids.agg(
        F.count(F.lit(1)).alias("n_auctions"),
        F.sum(F.when(F.col("rk") == 1, F.col("b")).otherwise(0))
        .cast("bigint")
        .alias("first_price_rev_c"),
        F.sum(F.when(F.col("rk") == 2, F.col("b")).otherwise(0))
        .cast("bigint")
        .alias("second_price_rev_c"),
    )


# ---------------------------------------------------------------------------
# Q417 — newsvendor stocking with expected-cost evaluation
# ---------------------------------------------------------------------------
# Critical ratio cu/(cu+co) = 3/4 puts the optimal stock at the
# 75th demand percentile; the query evaluates the expected overage/
# underage and total cost AT that stock against the empirical
# demand — the OR prescription plus its audit in one plan (exact
# per-group percentile broadcast back, q383's cut-point shape).
_Q417_ORACLE = """
    WITH dd AS (
      SELECT event_type, CAST(EXTRACT(day FROM ts) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS demand
      FROM events GROUP BY 1, 2
    ), qq AS (
      SELECT event_type, quantile_cont(demand, 0.75) AS qstar
      FROM dd GROUP BY 1
    )
    SELECT d.event_type,
           ROUND(q.qstar + 5e-12, 6) AS q_star,
           ROUND(AVG(GREATEST(q.qstar - d.demand, 0)) + 5e-12, 6)
             AS exp_overage,
           ROUND(AVG(GREATEST(d.demand - q.qstar, 0)) + 5e-12, 6)
             AS exp_underage,
           ROUND(1 * AVG(GREATEST(q.qstar - d.demand, 0))
                 + 3 * AVG(GREATEST(d.demand - q.qstar, 0)) + 5e-12, 6)
             AS exp_cost
    FROM dd d JOIN qq q ON q.event_type = d.event_type
    GROUP BY d.event_type, q.qstar ORDER BY d.event_type
"""


@register(
    "q417_newsvendor",
    _Q417_ORACLE,
    doc="Newsvendor stocking: critical ratio 3/(3+1) -> 75th-"
    "percentile stock per event type, expected overage/underage/"
    "cost evaluated against the empirical daily demand (exact "
    "percentile broadcast back) — prescription + audit in one "
    "plan.",
)
def q417(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    dd = ev.groupBy(
        "event_type", F.dayofmonth("ts").cast("bigint").alias("d")
    ).agg(F.count(F.lit(1)).alias("demand"))
    qq = dd.groupBy(F.col("event_type").alias("q_type")).agg(
        F.percentile(F.col("demand"), F.lit(0.75)).alias("qstar")
    )
    over = F.greatest(F.col("qstar") - F.col("demand"), F.lit(0.0))
    under = F.greatest(F.col("demand") - F.col("qstar"), F.lit(0.0))
    return (
        dd.join(F.broadcast(qq), F.col("event_type") == F.col("q_type"))
        .groupBy("event_type", "qstar")
        .agg(
            r6(F.avg(over)).alias("exp_overage"),
            r6(F.avg(under)).alias("exp_underage"),
            r6(1 * F.avg(over) + 3 * F.avg(under)).alias("exp_cost"),
        )
        .select(
            "event_type",
            r6(F.col("qstar")).alias("q_star"),
            "exp_overage",
            "exp_underage",
            "exp_cost",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Q418 — empirical copula (dependence beyond correlation)
# ---------------------------------------------------------------------------
# C(u, v) at the 3x3 quartile grid over the joint daily (clicks,
# purchases) ranks, with the independence gap C - u*v — the
# distribution-free dependence surface behind tau (q376) and
# MI (q151): where in the joint distribution the dependence lives.
_Q418_ORACLE = """
    WITH daily AS (
      SELECT CAST(EXTRACT(day FROM ts) AS BIGINT) AS d,
             SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS x,
             SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS y
      FROM events GROUP BY 1
    ), rk AS (
      SELECT ROW_NUMBER() OVER (ORDER BY x, d) * 1.0
               / COUNT(*) OVER () AS u,
             ROW_NUMBER() OVER (ORDER BY y, d) * 1.0
               / COUNT(*) OVER () AS v
      FROM daily
    ), grid AS (SELECT CAST(unnest([0.25, 0.5, 0.75]) AS DOUBLE) AS gu),
    cop AS (
      SELECT g1.gu AS pu, g2.gu AS pv,
             SUM(CASE WHEN rk.u <= g1.gu AND rk.v <= g2.gu
                      THEN 1.0 ELSE 0 END) / (SELECT COUNT(*) FROM rk) AS c
      FROM grid g1 CROSS JOIN grid g2 CROSS JOIN rk
      GROUP BY 1, 2
    )
    SELECT pu, pv, ROUND(c + 5e-12, 6) AS copula,
           ROUND(c - pu * pv + 5e-12, 6) AS dependence_gap
    FROM cop ORDER BY pu, pv
"""


@register(
    "q418_empirical_copula",
    _Q418_ORACLE,
    doc="Empirical copula at the quartile grid over joint daily "
    "ranks, with the independence gap C - uv — the distribution-"
    "free dependence SURFACE behind scalar tau (q376) and MI "
    "(q151); two rank windows on the collapsed daily relation x a "
    "9-point literal grid.",
)
def q418(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.dayofmonth("ts").cast("bigint").alias("d")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "y"
        ),
    ).coalesce(1)
    nwin = Window.partitionBy()
    rk = daily.select(
        (
            F.row_number().over(Window.orderBy("x", "d"))
            * 1.0
            / F.count(F.lit(1)).over(nwin)
        ).alias("u"),
        (
            F.row_number().over(Window.orderBy("y", "d"))
            * 1.0
            / F.count(F.lit(1)).over(nwin)
        ).alias("v"),
    )
    gs = (0.25, 0.5, 0.75)
    cells = rk.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(
                F.when((F.col("u") <= a) & (F.col("v") <= b), 1).otherwise(0)
            ).alias(f"c_{i}_{j}")
            for i, a in enumerate(gs)
            for j, b in enumerate(gs)
        ],
    )
    stack = ", ".join(
        f"{a!r}D, {b!r}D, c_{i}_{j}"
        for i, a in enumerate(gs)
        for j, b in enumerate(gs)
    )
    cop = cells.select(
        F.expr(f"stack(9, {stack}) AS (pu, pv, cnt)"), F.col("n")
    )
    return cop.select(
        "pu",
        "pv",
        r6(F.col("cnt") * 1.0 / F.col("n")).alias("copula"),
        r6(F.col("cnt") * 1.0 / F.col("n") - F.col("pu") * F.col("pv")).alias(
            "dependence_gap"
        ),
    ).orderBy("pu", "pv")
