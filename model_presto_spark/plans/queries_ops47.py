"""Conformance queries batch #47 (q429+) — zone-map pruning audit,
conjunct-correlation cardinality check, Deming regression, loan
amortization schedule, and Black-Scholes option pricing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q429 — zone-map (min/max) pruning effectiveness
# ---------------------------------------------------------------------------
# Group rows into fixed key-range blocks (the physical-layout proxy:
# l_orderkey div 2048), keep per-block min/max "small materialized
# aggregates" for shipdate and quantity, then measure how many
# blocks three real predicates could skip.  Key-clustered predicates
# prune; value-uncorrelated ones don't — the observable that drives
# sort-key / partition-layout choices.
_Q429_ORACLE = """
    WITH blocks AS (
      SELECT CAST(l_orderkey // 2048 AS BIGINT) AS b,
             COUNT(*) AS n_rows,
             MIN(l_shipdate) AS d_min, MAX(l_shipdate) AS d_max,
             MIN(l_quantity) AS q_min, MAX(l_quantity) AS q_max
      FROM lineitem GROUP BY 1
    ), tot AS (
      SELECT COUNT(*) AS n_blocks, SUM(n_rows) AS n_rows FROM blocks
    ), sel AS (
      SELECT
        SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1996-07-01'
                 THEN 1 ELSE 0 END) AS m1,
        SUM(CASE WHEN l_quantity < 5 THEN 1 ELSE 0 END) AS m2,
        SUM(CASE WHEN l_quantity >= 45 THEN 1 ELSE 0 END) AS m3
      FROM lineitem
    ), pr AS (
      SELECT
        SUM(CASE WHEN d_max < TIMESTAMP '1996-01-01'
                   OR d_min >= TIMESTAMP '1996-07-01'
                 THEN 1 ELSE 0 END) AS p1,
        SUM(CASE WHEN q_min >= 5 THEN 1 ELSE 0 END) AS p2,
        SUM(CASE WHEN q_max < 45 THEN 1 ELSE 0 END) AS p3
      FROM blocks
    )
    SELECT pred, CAST(t.n_blocks AS BIGINT) AS n_blocks,
           CAST(prunable AS BIGINT) AS prunable_blocks,
           ROUND(prunable * 1.0 / t.n_blocks + 5e-12, 6) AS prune_frac,
           ROUND(matches * 1.0 / t.n_rows + 5e-12, 6) AS selectivity
    FROM (
      SELECT 'shipdate_h1_1996' AS pred, pr.p1 AS prunable, sel.m1 AS matches
      FROM pr, sel
      UNION ALL
      SELECT 'quantity_lt_5', pr.p2, sel.m2 FROM pr, sel
      UNION ALL
      SELECT 'quantity_ge_45', pr.p3, sel.m3 FROM pr, sel
    ) u, tot t
    ORDER BY pred
"""


@register(
    "q429_zone_map_pruning",
    _Q429_ORACLE,
    doc="Zone-map pruning audit: per 2048-key block min/max "
    "aggregates for shipdate/quantity, skip-fraction of three real "
    "predicates vs their row selectivity — low-selectivity "
    "predicates on unclustered columns prune nothing, the signal "
    "that motivates sort-key choice (bloom q300/q401 and bin q305 "
    "planners' layout sibling).",
)
def q429(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    d1 = F.lit("1996-01-01").cast("timestamp")
    d2 = F.lit("1996-07-01").cast("timestamp")
    blocks = li.groupBy(
        (F.col("l_orderkey") / 2048).cast("bigint").alias("b")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_shipdate").alias("d_min"),
        F.max("l_shipdate").alias("d_max"),
        F.min("l_quantity").alias("q_min"),
        F.max("l_quantity").alias("q_max"),
    )
    tot = blocks.agg(
        F.count(F.lit(1)).alias("n_blocks"), F.sum("n_rows").alias("n_rows")
    )
    sel = li.agg(
        F.sum(
            F.when((F.col("l_shipdate") >= d1) & (F.col("l_shipdate") < d2), 1)
            .otherwise(0)
        ).alias("m1"),
        F.sum(F.when(F.col("l_quantity") < 5, 1).otherwise(0)).alias("m2"),
        F.sum(F.when(F.col("l_quantity") >= 45, 1).otherwise(0)).alias("m3"),
    )
    pr = blocks.agg(
        F.sum(
            F.when((F.col("d_max") < d1) | (F.col("d_min") >= d2), 1).otherwise(0)
        ).alias("p1"),
        F.sum(F.when(F.col("q_min") >= 5, 1).otherwise(0)).alias("p2"),
        F.sum(F.when(F.col("q_max") < 45, 1).otherwise(0)).alias("p3"),
    )
    base = pr.crossJoin(F.broadcast(sel))
    rows = (
        base.select(
            F.lit("shipdate_h1_1996").alias("pred"),
            F.col("p1").alias("prunable"),
            F.col("m1").alias("matches"),
        )
        .unionAll(
            base.select(
                F.lit("quantity_lt_5"), F.col("p2"), F.col("m2")
            )
        )
        .unionAll(
            base.select(
                F.lit("quantity_ge_45"), F.col("p3"), F.col("m3")
            )
        )
    )
    return (
        rows.crossJoin(F.broadcast(tot))
        .select(
            "pred",
            F.col("n_blocks").cast("bigint").alias("n_blocks"),
            F.col("prunable").cast("bigint").alias("prunable_blocks"),
            r6(F.col("prunable") * 1.0 / F.col("n_blocks")).alias("prune_frac"),
            r6(F.col("matches") * 1.0 / F.col("n_rows")).alias("selectivity"),
        )
        .orderBy("pred")
    )


# ---------------------------------------------------------------------------
# Q430 — conjunct-correlation audit (CORDS-style)
# ---------------------------------------------------------------------------
# The optimizer's independence assumption prices P(A AND B) as
# sel(A)*sel(B); correlated column pairs break it by orders of
# magnitude.  For three conjunct pairs, compare the actual joint
# selectivity to the independence estimate and report the q-error —
# exactly the statistic a CORDS-style correlation detector stores.
_Q430_ORACLE = """
    WITH f AS (
      SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS a1,
             CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END AS b1,
             CASE WHEN l_shipdate < TIMESTAMP '1996-01-01' THEN 1 ELSE 0 END
               AS a2,
             CASE WHEN l_quantity < 25 THEN 1 ELSE 0 END AS a3,
             CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END AS b3
      FROM lineitem
    ), m AS (
      SELECT COUNT(*) AS n,
             SUM(a1) AS ca1, SUM(b1) AS cb1, SUM(a1 * b1) AS cab1,
             SUM(a2) AS ca2, SUM(a2 * b1) AS cab2,
             SUM(a3) AS ca3, SUM(b3) AS cb3, SUM(a3 * b3) AS cab3
      FROM f
    )
    SELECT pair,
           ROUND(sa + 5e-12, 6) AS sel_a,
           ROUND(sb + 5e-12, 6) AS sel_b,
           ROUND(sab + 5e-12, 6) AS sel_joint,
           ROUND(sa * sb + 5e-12, 6) AS indep_est,
           ROUND(GREATEST((sa * sb) / NULLIF(sab, 0),
                          sab / NULLIF(sa * sb, 0)) + 5e-12, 6) AS q_error
    FROM (
      SELECT 'returnflag_x_linestatus' AS pair,
             ca1 * 1.0 / n AS sa, cb1 * 1.0 / n AS sb, cab1 * 1.0 / n AS sab
      FROM m
      UNION ALL
      SELECT 'shipdate_x_linestatus',
             ca2 * 1.0 / n, cb1 * 1.0 / n, cab2 * 1.0 / n FROM m
      UNION ALL
      SELECT 'quantity_x_discount',
             ca3 * 1.0 / n, cb3 * 1.0 / n, cab3 * 1.0 / n FROM m
    ) ORDER BY pair
"""


@register(
    "q430_cords_correlation",
    _Q430_ORACLE,
    doc="Independence-assumption audit for conjunctive predicates: "
    "actual joint selectivity vs sel(A)*sel(B) with the q-error, "
    "for a causally-correlated pair (returnflag x linestatus), a "
    "temporally-entangled pair, and a near-independent pair — the "
    "CORDS statistic behind correlated-column CE (join-size q402's "
    "single-table sibling).",
)
def q430(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    f = li.select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("a1"),
        F.when(F.col("l_linestatus") == "F", 1).otherwise(0).alias("b1"),
        F.when(
            F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"), 1
        )
        .otherwise(0)
        .alias("a2"),
        F.when(F.col("l_quantity") < 25, 1).otherwise(0).alias("a3"),
        F.when(F.col("l_discount") > 0.05, 1).otherwise(0).alias("b3"),
    )
    m = f.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("a1").alias("ca1"),
        F.sum("b1").alias("cb1"),
        F.sum(F.col("a1") * F.col("b1")).alias("cab1"),
        F.sum("a2").alias("ca2"),
        F.sum(F.col("a2") * F.col("b1")).alias("cab2"),
        F.sum("a3").alias("ca3"),
        F.sum("b3").alias("cb3"),
        F.sum(F.col("a3") * F.col("b3")).alias("cab3"),
    )
    n = F.col("n")
    rows = (
        m.select(
            F.lit("returnflag_x_linestatus").alias("pair"),
            (F.col("ca1") * 1.0 / n).alias("sa"),
            (F.col("cb1") * 1.0 / n).alias("sb"),
            (F.col("cab1") * 1.0 / n).alias("sab"),
        )
        .unionAll(
            m.select(
                F.lit("shipdate_x_linestatus"),
                F.col("ca2") * 1.0 / n,
                F.col("cb1") * 1.0 / n,
                F.col("cab2") * 1.0 / n,
            )
        )
        .unionAll(
            m.select(
                F.lit("quantity_x_discount"),
                F.col("ca3") * 1.0 / n,
                F.col("cb3") * 1.0 / n,
                F.col("cab3") * 1.0 / n,
            )
        )
    )
    indep = F.col("sa") * F.col("sb")
    qerr = F.greatest(
        indep / F.nullif(F.col("sab"), F.lit(0)),
        F.col("sab") / F.nullif(indep, F.lit(0)),
    )
    return rows.select(
        "pair",
        r6(F.col("sa")).alias("sel_a"),
        r6(F.col("sb")).alias("sel_b"),
        r6(F.col("sab")).alias("sel_joint"),
        r6(indep).alias("indep_est"),
        r6(qerr).alias("q_error"),
    ).orderBy("pair")


# ---------------------------------------------------------------------------
# Q431 — Deming (errors-in-both-variables) regression
# ---------------------------------------------------------------------------
# Order header price vs the lineitem-reconstructed charge: both
# sides carry "measurement" noise, so the OLS slopes of y-on-x and
# x-on-y bracket the truth and Deming (delta = 1) lands between:
# slope = (syy - sxx + sqrt((syy-sxx)^2 + 4 sxy^2)) / (2 sxy) on
# centered moments.  The method-comparison regression beside OLS
# (q122), Theil-Sen (q145), and RANSAC (q412).
_Q431_ORACLE = """
    WITH pairs AS (
      SELECT o.o_orderkey,
             ROUND(o.o_totalprice * 100) AS x,
             ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                       * (1 + l.l_tax)) * 100) AS y
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_totalprice
    ), mom AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM pairs
    ), c AS (
      SELECT n,
             (sxx - sx * sx * 1.0 / n) / n AS vx,
             (syy - sy * sy * 1.0 / n) / n AS vy,
             (sxy - sx * sy * 1.0 / n) / n AS cxy,
             sx * 1.0 / n AS mx, sy * 1.0 / n AS my
      FROM mom
    )
    SELECT CAST(n AS BIGINT) AS n_orders,
           ROUND(cxy / vx + 5e-12, 6) AS ols_y_on_x,
           ROUND(vy / cxy + 5e-12, 6) AS ols_x_on_y_inv,
           ROUND((vy - vx + SQRT((vy - vx) * (vy - vx) + 4 * cxy * cxy))
                 / (2 * cxy) + 5e-12, 6) AS deming_slope,
           ROUND((my - (vy - vx + SQRT((vy - vx) * (vy - vx) + 4 * cxy * cxy))
                        / (2 * cxy) * mx) / 100.0 + 5e-10, 4)
             AS deming_intercept_usd
    FROM c
"""


@register(
    "q431_deming_regression",
    _Q431_ORACLE,
    doc="Deming errors-in-both regression (delta = 1) of header price "
    "vs lineitem-reconstructed charge: the two OLS slopes bracket "
    "the Deming slope computed in closed form from centered cents "
    "moments — attenuation bias made visible.",
)
def q431(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                )
                * 100
            ).alias("y")
        )
        .select(F.round(F.col("o_totalprice") * 100).alias("x"), "y")
    )
    mom = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    c = mom.select(
        "n",
        ((F.col("sxx") - F.col("sx") * F.col("sx") * 1.0 / n) / n).alias("vx"),
        ((F.col("syy") - F.col("sy") * F.col("sy") * 1.0 / n) / n).alias("vy"),
        ((F.col("sxy") - F.col("sx") * F.col("sy") * 1.0 / n) / n).alias("cxy"),
        (F.col("sx") * 1.0 / n).alias("mx"),
        (F.col("sy") * 1.0 / n).alias("my"),
    )
    dem = (
        F.col("vy")
        - F.col("vx")
        + F.sqrt(
            (F.col("vy") - F.col("vx")) * (F.col("vy") - F.col("vx"))
            + 4 * F.col("cxy") * F.col("cxy")
        )
    ) / (2 * F.col("cxy"))
    return c.select(
        F.col("n").cast("bigint").alias("n_orders"),
        r6(F.col("cxy") / F.col("vx")).alias("ols_y_on_x"),
        r6(F.col("vy") / F.col("cxy")).alias("ols_x_on_y_inv"),
        r6(dem).alias("deming_slope"),
        F.round(
            (F.col("my") - dem * F.col("mx")) / 100.0 + F.lit(5e-10), 4
        ).alias("deming_intercept_usd"),
    )


# ---------------------------------------------------------------------------
# Q432 — loan amortization schedule (closed-form annuity)
# ---------------------------------------------------------------------------
# Every 1000th order's total as a 24-month 0.5%/month loan: the
# annuity payment and the CLOSED-FORM balance recurrence
# B_k = P(1+r)^k - A((1+r)^k - 1)/r turn schedule generation into a
# months x loans fan-out with no iteration.  Portfolio-level
# interest/principal split per month.
_Q432_ORACLE = """
    WITH loans AS (
      SELECT o_orderkey, ROUND(o_totalprice * 100) AS p
      FROM orders WHERE o_orderkey % 1000 = 0
    ), sched AS (
      SELECT g.k,
             l.p * 0.005 * POW(1.005, 24) / (POW(1.005, 24) - 1) AS pay,
             l.p * POW(1.005, g.k - 1)
               - (l.p * 0.005 * POW(1.005, 24) / (POW(1.005, 24) - 1))
                 * (POW(1.005, g.k - 1) - 1) / 0.005 AS bal_prev
      FROM loans l, generate_series(1, 24) g(k)
    )
    SELECT k AS month,
           ROUND(SUM(bal_prev * 0.005) / 100.0 + 5e-10, 4)
             AS interest_usd,
           ROUND(SUM(pay - bal_prev * 0.005) / 100.0 + 5e-10, 4)
             AS principal_usd,
           ROUND(SUM(bal_prev * 1.005 - pay) / 100.0 + 5e-10, 4)
             AS outstanding_usd
    FROM sched GROUP BY k ORDER BY k
"""


@register(
    "q432_amortization",
    _Q432_ORACLE,
    doc="Portfolio amortization schedule: annuity payment and the "
    "closed-form balance B_k = P(1+r)^k - A((1+r)^k-1)/r expand "
    "each loan into 24 month-rows with exact interest/principal "
    "split — schedule generation as a generate_series fan-out, "
    "zero recursion.",
)
def q432(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 1000 == 0)
    loans = o.select(F.round(F.col("o_totalprice") * 100).alias("p"))
    months = spark.range(1, 25).select(F.col("id").alias("k"))
    r = F.lit(0.005)
    gn = F.pow(F.lit(1.005), F.lit(24))
    pay = F.col("p") * r * gn / (gn - 1)
    gk1 = F.pow(F.lit(1.005), F.col("k") - 1)
    bal_prev = F.col("p") * gk1 - pay * (gk1 - 1) / r
    sched = loans.crossJoin(F.broadcast(months)).select(
        "k",
        pay.alias("pay"),
        bal_prev.alias("bal_prev"),
    )
    return (
        sched.groupBy("k")
        .agg(
            F.round(
                F.sum(F.col("bal_prev") * 0.005) / 100.0 + F.lit(5e-10), 4
            ).alias("interest_usd"),
            F.round(
                F.sum(F.col("pay") - F.col("bal_prev") * 0.005) / 100.0
                + F.lit(5e-10),
                4,
            ).alias("principal_usd"),
            F.round(
                F.sum(F.col("bal_prev") * 1.005 - F.col("pay")) / 100.0
                + F.lit(5e-10),
                4,
            ).alias("outstanding_usd"),
        )
        .select(F.col("k").alias("month"), "interest_usd", "principal_usd", "outstanding_usd")
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# Q433 — Black-Scholes pricing with a polynomial normal CDF
# ---------------------------------------------------------------------------
# European call/put on S = o_totalprice/1000 at moneyness 0.9/1.0/1.1
# (sigma 0.3, r 5%, T 0.5y).  The normal CDF is the Abramowitz-
# Stegun 26.2.17 polynomial written identically in both engines, so
# pricing is pure column arithmetic; the put-call parity residual
# C - P - (S - K e^{-rT}) is the built-in correctness audit (zero up
# to the CDF's sign-reflection symmetry).
_Q433_CDF = """
    (CASE WHEN {x} >= 0 THEN
       1 - EXP(-({x}) * ({x}) / 2) * 0.3989422804014327
           * ((((1.330274429 / (1 + 0.2316419 * ({x})) - 1.821255978)
                / (1 + 0.2316419 * ({x})) + 1.781477937)
               / (1 + 0.2316419 * ({x})) - 0.356563782)
              / (1 + 0.2316419 * ({x})) + 0.319381530)
           / (1 + 0.2316419 * ({x}))
     ELSE
       EXP(-({x}) * ({x}) / 2) * 0.3989422804014327
           * ((((1.330274429 / (1 - 0.2316419 * ({x})) - 1.821255978)
                / (1 - 0.2316419 * ({x})) + 1.781477937)
               / (1 - 0.2316419 * ({x})) - 0.356563782)
              / (1 - 0.2316419 * ({x})) + 0.319381530)
           / (1 - 0.2316419 * ({x}))
     END)
"""

_Q433_ORACLE = f"""
    WITH base AS (
      SELECT o_totalprice / 1000.0 AS s, m.mny
      FROM orders, (VALUES (CAST(0.9 AS DOUBLE)), (CAST(1.0 AS DOUBLE)),
                    (CAST(1.1 AS DOUBLE))) m(mny)
    ), d AS (
      SELECT s, mny, s * mny AS k,
             (LN(1.0 / mny) + (0.05 + 0.045) * 0.5)
               / (0.3 * SQRT(0.5)) AS d1,
             (LN(1.0 / mny) + (0.05 + 0.045) * 0.5)
               / (0.3 * SQRT(0.5)) - 0.3 * SQRT(0.5) AS d2
      FROM base
    ), px AS (
      SELECT s, mny, k,
             s * {_Q433_CDF.format(x='d1')}
               - k * EXP(-0.025) * {_Q433_CDF.format(x='d2')} AS call,
             k * EXP(-0.025) * {_Q433_CDF.format(x='(-d2)')}
               - s * {_Q433_CDF.format(x='(-d1)')} AS put
      FROM d
    )
    SELECT mny AS moneyness,
           ROUND(AVG(call) + 5e-12, 6) AS mean_call,
           ROUND(AVG(put) + 5e-12, 6) AS mean_put,
           ROUND(AVG(call - put - (s - k * EXP(-0.025))) + 5e-12, 6)
             AS parity_gap
    FROM px GROUP BY mny ORDER BY mny
"""


def _ncdf(x):
    """Abramowitz-Stegun 26.2.17 polynomial normal CDF (column expr),
    mirrored literally in the SQL oracle so both engines agree."""
    ax = F.abs(x)
    t = 1 / (1 + 0.2316419 * ax)
    poly = (
        (((1.330274429 * t - 1.821255978) * t + 1.781477937) * t - 0.356563782)
        * t
        + 0.319381530
    ) * t
    upper = 1 - F.exp(-ax * ax / 2) * 0.3989422804014327 * poly
    return F.when(x >= 0, upper).otherwise(1 - upper)


@register(
    "q433_black_scholes",
    _Q433_ORACLE,
    doc="Black-Scholes call/put pricing at three moneyness levels with "
    "an Abramowitz-Stegun polynomial normal CDF written identically "
    "in both engines; the put-call parity residual is the in-query "
    "correctness audit.  Pure column arithmetic over a 3-way literal "
    "fan-out.",
)
def q433(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    mny = spark.createDataFrame([(0.9,), (1.0,), (1.1,)], "mny double")
    base = o.select((F.col("o_totalprice") / 1000.0).alias("s")).crossJoin(
        F.broadcast(mny)
    )
    sq = F.sqrt(F.lit(0.5))
    d1 = (F.log(1.0 / F.col("mny")) + (0.05 + 0.045) * 0.5) / (0.3 * sq)
    d2 = d1 - 0.3 * sq
    k = F.col("s") * F.col("mny")
    disc = F.exp(F.lit(-0.025))
    call = F.col("s") * _ncdf(d1) - k * disc * _ncdf(d2)
    put = k * disc * _ncdf(-d2) - F.col("s") * _ncdf(-d1)
    px = base.select(
        "mny",
        "s",
        k.alias("k"),
        call.alias("call"),
        put.alias("put"),
    )
    return (
        px.groupBy("mny")
        .agg(
            r6(F.avg("call")).alias("mean_call"),
            r6(F.avg("put")).alias("mean_put"),
            r6(
                F.avg(
                    F.col("call")
                    - F.col("put")
                    - (F.col("s") - F.col("k") * disc)
                )
            ).alias("parity_gap"),
        )
        .select(F.col("mny").alias("moneyness"), "mean_call", "mean_put", "parity_gap")
        .orderBy("moneyness")
    )
