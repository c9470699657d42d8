"""Conformance queries batch #61 (q499+) — Cramer multiple
regression, implied volatility by Newton, double-auction clearing,
balanced interleaving evaluation, and the epidemic threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q499 — two-regressor OLS by Cramer's rule
# ---------------------------------------------------------------------------
# log-spend regressed on log-balance and log-order-count: the 3x3
# normal equations solved in closed form (Cramer determinants over
# the moment sums), plus R^2 — multiple regression without a solver,
# generalizing the single-regressor OLS family (q122/q145/q431).
_Q499_ORACLE = """
    WITH u AS (
      SELECT LN(1 + COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0)) AS y,
             LN(c.c_acctbal + 10000.0) AS x1,
             LN(1.0 + COUNT(o.o_orderkey)) AS x2
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_acctbal
    ), m AS (
      SELECT COUNT(*) AS n, SUM(x1) AS s1, SUM(x2) AS s2, SUM(y) AS sy,
             SUM(x1 * x1) AS s11, SUM(x1 * x2) AS s12, SUM(x2 * x2) AS s22,
             SUM(x1 * y) AS s1y, SUM(x2 * y) AS s2y, SUM(y * y) AS syy
      FROM u
    ), det AS (
      SELECT n, s1, s2, sy, s11, s12, s22, s1y, s2y, syy,
             n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
               + s2 * (s1 * s12 - s11 * s2) AS d,
             sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
               + s2 * (s1y * s12 - s11 * s2y) AS d0,
             n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
               + s2 * (s1 * s2y - s1y * s2) AS d1,
             n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
               + sy * (s1 * s12 - s11 * s2) AS d2
      FROM m
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           ROUND(d0 / d + 5e-12, 6) AS intercept,
           ROUND(d1 / d + 5e-12, 6) AS beta_log_balance,
           ROUND(d2 / d + 5e-12, 6) AS beta_log_orders,
           ROUND(1 - (syy - (d0 / d) * sy - (d1 / d) * s1y - (d2 / d) * s2y)
                 / (syy - sy * sy / n) + 5e-12, 6) AS r2
    FROM det
"""


@register(
    "q499_cramer_regression",
    _Q499_ORACLE,
    doc="Multiple regression (log-spend on log-balance + log-order-"
    "count) solved by Cramer's rule on the 3x3 normal equations — "
    "determinants over moment sums, R^2 from the quadratic-form "
    "identity; closed-form multivariate OLS beside the univariate "
    "family (q122/q145/q431).",
)
def q499(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    u = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            F.log(
                1
                + F.coalesce(
                    F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0)
                )
            ).alias("y"),
            F.log(1.0 + F.count("o_orderkey")).alias("x2"),
        )
        .select("y", F.log(F.col("c_acctbal") + 10000.0).alias("x1"), "x2")
    )
    m = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, s1, s2, sy = F.col("n"), F.col("s1"), F.col("s2"), F.col("sy")
    s11, s12, s22 = F.col("s11"), F.col("s12"), F.col("s22")
    s1y, s2y, syy = F.col("s1y"), F.col("s2y"), F.col("syy")
    d = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    d0 = (
        sy * (s11 * s22 - s12 * s12)
        - s1 * (s1y * s22 - s12 * s2y)
        + s2 * (s1y * s12 - s11 * s2y)
    )
    d1 = (
        n * (s1y * s22 - s12 * s2y)
        - sy * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s2y - s1y * s2)
    )
    d2 = (
        n * (s11 * s2y - s1y * s12)
        - s1 * (s1 * s2y - s1y * s2)
        + sy * (s1 * s12 - s11 * s2)
    )
    return m.select(
        n.cast("bigint").alias("n_customers"),
        r6(d0 / d).alias("intercept"),
        r6(d1 / d).alias("beta_log_balance"),
        r6(d2 / d).alias("beta_log_orders"),
        r6(
            1
            - (syy - (d0 / d) * sy - (d1 / d) * s1y - (d2 / d) * s2y)
            / (syy - sy * sy / n)
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Q500 — implied volatility by Newton-Raphson
# ---------------------------------------------------------------------------
# Invert q433's Black-Scholes: the observed price is the mean call
# priced at sigma = 0.3; eight Newton steps from sigma = 0.5 with the
# analytic vega recover the volatility — root-finding as a fold, the
# residual and the 0.3 recovery are the built-in audit.  Since d1
# depends only on moneyness, the solve runs on one scalar per
# moneyness row.
_Q500_ORACLE = """
    WITH base AS (
      SELECT m.mny, AVG(o_totalprice / 1000.0) AS sbar
      FROM orders, (VALUES (CAST(0.9 AS DOUBLE)), (CAST(1.0 AS DOUBLE)),
                    (CAST(1.1 AS DOUBLE))) m(mny)
      GROUP BY m.mny
    ), solved AS (
      SELECT mny, sbar,
        list_reduce(
          list_prepend([CAST(0.5 AS DOUBLE)],
            list_transform(generate_series(1, 8),
                           z -> [CAST(z AS DOUBLE)])),
          (sg, z) -> [sg[1] - (((CASE WHEN (((LN(1.0/mny) + (0.05 + sg[1]*sg[1]/2) * 0.5) / (sg[1] * SQRT(0.5)))) >= 0 THEN (1 - EXP(-(((LN(1.0/mny) + (0.05 + sg[1]*sg[1]/2) * 0.5) / (sg[1] * SQRT(0.5))))*(((LN(1.0/mny) + (0.05 + sg[1]*sg[1]/2) * 0.5) / (sg[1] * SQRT(0.5))))/2) * 0.3989422804014327 * ((((1.330274429 * (1.0/(1.0 + 0.2316419*ABS(((LN(1.0/mny) + (0.05 + sg[1]*sg[1]/2) * 0.5) / (sg[1] * SQRT(0.5)))))) - 1.821255978) * (1.0/(1.0 + 0.2316419*ABS(((LN(1.0/mny) + (0.05 + sg[1]*sg[1]/2) * 0.5) / (sg[1] * SQRT(0.5)))))) + 1.781477937) * (1.0/(1.0 + 0.2316419*ABS(((LN(1.0/mny) + (0.05 + sg[1]*sg[1]/2) * 0.5) / (sg[1] * SQRT(0.5)))))) - 0.356563782) * (1.0/(1.0 + 0.2316419*ABS(((LN(1.0/mny) + (0.05 + sg[1]*sg[1]/2) * 0.5) / (sg[1] * SQRT(0.5)))))) + 0.319381530) * (1.0/(1.0 + 0.2316419*ABS(((LN(1.0/mny) + (0.05 + sg[1]*sg[1]/2) * 0.5) / (sg[1] * SQRT(0.5))))))) ELSE 1 - (1 - EXP(-(((LN(1.0/mny) + (0.05 + sg[1]*sg[1]/2) * 0.5) / (sg[1] * SQRT(0.5))))*(((LN(1.0/mny) + (0.05 + sg[1]*sg[1]/2) * 0.5) / (sg[1] * SQRT(0.5))))/2) * 0.3989422804014327 * ((((1.330274429 * (1.0/(1.0 + 0.2316419*ABS(((LN(1.0/mny) + (0.05 + sg[1]*sg[1]/2) * 0.5) / (sg[1] * SQRT(0.5)))))) - 1.821255978) * (1.0/(1.0 + 0.2316419*ABS(((LN(1.0/mny) + (0.05 + sg[1]*sg[1]/2) * 0.5) / (sg[1] * SQRT(0.5)))))) + 1.781477937) * (1.0/(1.0 + 0.2316419*ABS(((LN(1.0/mny) + (0.05 + sg[1]*sg[1]/2) * 0.5) / (sg[1] * SQRT(0.5)))))) - 0.356563782) * (1.0/(1.0 + 0.2316419*ABS(((LN(1.0/mny) + (0.05 + sg[1]*sg[1]/2) * 0.5) / (sg[1] * SQRT(0.5)))))) + 0.319381530) * (1.0/(1.0 + 0.2316419*ABS(((LN(1.0/mny) + (0.05 + sg[1]*sg[1]/2) * 0.5) / (sg[1] * SQRT(0.5))))))) END) - mny * EXP(-0.025) * (CASE WHEN ((((LN(1.0/mny) + (0.05 + sg[1]*sg[1]/2) * 0.5) / (sg[1] * SQRT(0.5))) - sg[1] * SQRT(0.5))) >= 0 THEN (1 - EXP(-((((LN(1.0/mny) + (0.05 + sg[1]*sg[1]/2) * 0.5) / (sg[1] * SQRT(0.5))) - sg[1] * SQRT(0.5)))*((((LN(1.0/mny) + (0.05 + sg[1]*sg[1]/2) * 0.5) / (sg[1] * SQRT(0.5))) - sg[1] * SQRT(0.5)))/2) * 0.3989422804014327 * ((((1.330274429 * (1.0/(1.0 + 0.2316419*ABS((((LN(1.0/mny) + (0.05 + sg[1]*sg[1]/2) * 0.5) / (sg[1] * SQRT(0.5))) - sg[1] * SQRT(0.5))))) - 1.821255978) * (1.0/(1.0 + 0.2316419*ABS((((LN(1.0/mny) + (0.05 + sg[1]*sg[1]/2) * 0.5) / (sg[1] * SQRT(0.5))) - sg[1] * SQRT(0.5))))) + 1.781477937) * (1.0/(1.0 + 0.2316419*ABS((((LN(1.0/mny) + (0.05 + sg[1]*sg[1]/2) * 0.5) / (sg[1] * SQRT(0.5))) - sg[1] * SQRT(0.5))))) - 0.356563782) * (1.0/(1.0 + 0.2316419*ABS((((LN(1.0/mny) + (0.05 + sg[1]*sg[1]/2) * 0.5) / (sg[1] * SQRT(0.5))) - sg[1] * SQRT(0.5))))) + 0.319381530) * (1.0/(1.0 + 0.2316419*ABS((((LN(1.0/mny) + (0.05 + sg[1]*sg[1]/2) * 0.5) / (sg[1] * SQRT(0.5))) - sg[1] * SQRT(0.5)))))) ELSE 1 - (1 - EXP(-((((LN(1.0/mny) + (0.05 + sg[1]*sg[1]/2) * 0.5) / (sg[1] * SQRT(0.5))) - sg[1] * SQRT(0.5)))*((((LN(1.0/mny) + (0.05 + sg[1]*sg[1]/2) * 0.5) / (sg[1] * SQRT(0.5))) - sg[1] * SQRT(0.5)))/2) * 0.3989422804014327 * ((((1.330274429 * (1.0/(1.0 + 0.2316419*ABS((((LN(1.0/mny) + (0.05 + sg[1]*sg[1]/2) * 0.5) / (sg[1] * SQRT(0.5))) - sg[1] * SQRT(0.5))))) - 1.821255978) * (1.0/(1.0 + 0.2316419*ABS((((LN(1.0/mny) + (0.05 + sg[1]*sg[1]/2) * 0.5) / (sg[1] * SQRT(0.5))) - sg[1] * SQRT(0.5))))) + 1.781477937) * (1.0/(1.0 + 0.2316419*ABS((((LN(1.0/mny) + (0.05 + sg[1]*sg[1]/2) * 0.5) / (sg[1] * SQRT(0.5))) - sg[1] * SQRT(0.5))))) - 0.356563782) * (1.0/(1.0 + 0.2316419*ABS((((LN(1.0/mny) + (0.05 + sg[1]*sg[1]/2) * 0.5) / (sg[1] * SQRT(0.5))) - sg[1] * SQRT(0.5))))) + 0.319381530) * (1.0/(1.0 + 0.2316419*ABS((((LN(1.0/mny) + (0.05 + sg[1]*sg[1]/2) * 0.5) / (sg[1] * SQRT(0.5))) - sg[1] * SQRT(0.5)))))) END)) - ((CASE WHEN (((LN(1.0/mny) + (0.05 + 0.045) * 0.5) / (0.3 * SQRT(0.5)))) >= 0 THEN (1 - EXP(-(((LN(1.0/mny) + (0.05 + 0.045) * 0.5) / (0.3 * SQRT(0.5))))*(((LN(1.0/mny) + (0.05 + 0.045) * 0.5) / (0.3 * SQRT(0.5))))/2) * 0.3989422804014327 * ((((1.330274429 * (1.0/(1.0 + 0.2316419*ABS(((LN(1.0/mny) + (0.05 + 0.045) * 0.5) / (0.3 * SQRT(0.5)))))) - 1.821255978) * (1.0/(1.0 + 0.2316419*ABS(((LN(1.0/mny) + (0.05 + 0.045) * 0.5) / (0.3 * SQRT(0.5)))))) + 1.781477937) * (1.0/(1.0 + 0.2316419*ABS(((LN(1.0/mny) + (0.05 + 0.045) * 0.5) / (0.3 * SQRT(0.5)))))) - 0.356563782) * (1.0/(1.0 + 0.2316419*ABS(((LN(1.0/mny) + (0.05 + 0.045) * 0.5) / (0.3 * SQRT(0.5)))))) + 0.319381530) * (1.0/(1.0 + 0.2316419*ABS(((LN(1.0/mny) + (0.05 + 0.045) * 0.5) / (0.3 * SQRT(0.5))))))) ELSE 1 - (1 - EXP(-(((LN(1.0/mny) + (0.05 + 0.045) * 0.5) / (0.3 * SQRT(0.5))))*(((LN(1.0/mny) + (0.05 + 0.045) * 0.5) / (0.3 * SQRT(0.5))))/2) * 0.3989422804014327 * ((((1.330274429 * (1.0/(1.0 + 0.2316419*ABS(((LN(1.0/mny) + (0.05 + 0.045) * 0.5) / (0.3 * SQRT(0.5)))))) - 1.821255978) * (1.0/(1.0 + 0.2316419*ABS(((LN(1.0/mny) + (0.05 + 0.045) * 0.5) / (0.3 * SQRT(0.5)))))) + 1.781477937) * (1.0/(1.0 + 0.2316419*ABS(((LN(1.0/mny) + (0.05 + 0.045) * 0.5) / (0.3 * SQRT(0.5)))))) - 0.356563782) * (1.0/(1.0 + 0.2316419*ABS(((LN(1.0/mny) + (0.05 + 0.045) * 0.5) / (0.3 * SQRT(0.5)))))) + 0.319381530) * (1.0/(1.0 + 0.2316419*ABS(((LN(1.0/mny) + (0.05 + 0.045) * 0.5) / (0.3 * SQRT(0.5))))))) END) - mny * EXP(-0.025) * (CASE WHEN ((((LN(1.0/mny) + (0.05 + 0.045) * 0.5) / (0.3 * SQRT(0.5))) - 0.3 * SQRT(0.5))) >= 0 THEN (1 - EXP(-((((LN(1.0/mny) + (0.05 + 0.045) * 0.5) / (0.3 * SQRT(0.5))) - 0.3 * SQRT(0.5)))*((((LN(1.0/mny) + (0.05 + 0.045) * 0.5) / (0.3 * SQRT(0.5))) - 0.3 * SQRT(0.5)))/2) * 0.3989422804014327 * ((((1.330274429 * (1.0/(1.0 + 0.2316419*ABS((((LN(1.0/mny) + (0.05 + 0.045) * 0.5) / (0.3 * SQRT(0.5))) - 0.3 * SQRT(0.5))))) - 1.821255978) * (1.0/(1.0 + 0.2316419*ABS((((LN(1.0/mny) + (0.05 + 0.045) * 0.5) / (0.3 * SQRT(0.5))) - 0.3 * SQRT(0.5))))) + 1.781477937) * (1.0/(1.0 + 0.2316419*ABS((((LN(1.0/mny) + (0.05 + 0.045) * 0.5) / (0.3 * SQRT(0.5))) - 0.3 * SQRT(0.5))))) - 0.356563782) * (1.0/(1.0 + 0.2316419*ABS((((LN(1.0/mny) + (0.05 + 0.045) * 0.5) / (0.3 * SQRT(0.5))) - 0.3 * SQRT(0.5))))) + 0.319381530) * (1.0/(1.0 + 0.2316419*ABS((((LN(1.0/mny) + (0.05 + 0.045) * 0.5) / (0.3 * SQRT(0.5))) - 0.3 * SQRT(0.5)))))) ELSE 1 - (1 - EXP(-((((LN(1.0/mny) + (0.05 + 0.045) * 0.5) / (0.3 * SQRT(0.5))) - 0.3 * SQRT(0.5)))*((((LN(1.0/mny) + (0.05 + 0.045) * 0.5) / (0.3 * SQRT(0.5))) - 0.3 * SQRT(0.5)))/2) * 0.3989422804014327 * ((((1.330274429 * (1.0/(1.0 + 0.2316419*ABS((((LN(1.0/mny) + (0.05 + 0.045) * 0.5) / (0.3 * SQRT(0.5))) - 0.3 * SQRT(0.5))))) - 1.821255978) * (1.0/(1.0 + 0.2316419*ABS((((LN(1.0/mny) + (0.05 + 0.045) * 0.5) / (0.3 * SQRT(0.5))) - 0.3 * SQRT(0.5))))) + 1.781477937) * (1.0/(1.0 + 0.2316419*ABS((((LN(1.0/mny) + (0.05 + 0.045) * 0.5) / (0.3 * SQRT(0.5))) - 0.3 * SQRT(0.5))))) - 0.356563782) * (1.0/(1.0 + 0.2316419*ABS((((LN(1.0/mny) + (0.05 + 0.045) * 0.5) / (0.3 * SQRT(0.5))) - 0.3 * SQRT(0.5))))) + 0.319381530) * (1.0/(1.0 + 0.2316419*ABS((((LN(1.0/mny) + (0.05 + 0.045) * 0.5) / (0.3 * SQRT(0.5))) - 0.3 * SQRT(0.5)))))) END))) / (EXP(-(((LN(1.0/mny) + (0.05 + sg[1]*sg[1]/2) * 0.5) / (sg[1] * SQRT(0.5))))*(((LN(1.0/mny) + (0.05 + sg[1]*sg[1]/2) * 0.5) / (sg[1] * SQRT(0.5))))/2) * 0.3989422804014327 * SQRT(0.5))]
        )[1] AS iv
      FROM base
    )
    SELECT mny AS moneyness,
           ROUND(iv + 5e-12, 6) AS implied_vol,
           ROUND(ABS(iv - 0.3) + 5e-12, 6) AS recovery_error
    FROM solved ORDER BY moneyness
"""


def _ncdf500(x):
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
    "q500_implied_volatility",
    _Q500_ORACLE,
    doc="Implied volatility by eight Newton-Raphson steps inverting "
    "the q433 Black-Scholes pricer (analytic vega, fold-carried "
    "sigma): recovers the generating sigma = 0.3 per moneyness with "
    "the recovery error as the audit — root finding inside the "
    "engine.",
)
def q500(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    mny = spark.createDataFrame(
        [(0.9,), (1.0,), (1.1,)], "mny double"
    )
    base = (
        o.crossJoin(F.broadcast(mny))
        .groupBy("mny")
        .agg(F.avg(F.col("o_totalprice") / 1000.0).alias("sbar"))
    )
    sq = F.sqrt(F.lit(0.5))

    def unit_call(sigma):
        d1 = (F.log(1.0 / F.col("mny")) + (0.05 + sigma * sigma / 2) * 0.5) / (
            sigma * sq
        )
        d2 = d1 - sigma * sq
        return _ncdf500(d1) - F.col("mny") * F.exp(F.lit(-0.025)) * _ncdf500(d2)

    def vega_unit(sigma):
        d1 = (F.log(1.0 / F.col("mny")) + (0.05 + sigma * sigma / 2) * 0.5) / (
            sigma * sq
        )
        return F.exp(-d1 * d1 / 2) * 0.3989422804014327 * sq

    target = unit_call(F.lit(0.3))

    def step(sg, z):
        sigma = F.element_at(sg, 1)
        return F.array(sigma - (unit_call(sigma) - target) / vega_unit(sigma))

    solved = base.select(
        "mny",
        F.element_at(
            F.aggregate(
                F.transform(
                    F.sequence(F.lit(1), F.lit(8)),
                    lambda z: F.array(z.cast("double")),
                ),
                F.array(F.lit(0.5)),
                step,
            ),
            1,
        ).alias("iv"),
    )
    return solved.select(
        F.col("mny").alias("moneyness"),
        r6(F.col("iv")).alias("implied_vol"),
        r6(F.abs(F.col("iv") - 0.3)).alias("recovery_error"),
    ).orderBy("moneyness")


# ---------------------------------------------------------------------------
# Q501 — double-auction market clearing
# ---------------------------------------------------------------------------
# AUTOMOBILE-segment order prices as bids (demand: buyers pay >= p),
# BUILDING-segment prices as asks (supply: sellers sell at <= p);
# at each decile price the crossing of the two monotone curves gives
# the clearing volume, and the argmax is the market-clearing price —
# the Walrasian tatonnement table (reserve pricing q496's two-sided
# sibling).
_Q501_ORACLE = """
    WITH bids AS (
      SELECT o.o_totalprice AS p
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE c.c_mktsegment = 'AUTOMOBILE'
    ), asks AS (
      SELECT o.o_totalprice AS p
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE c.c_mktsegment = 'BUILDING'
    ), qarr AS (
      SELECT quantile_cont(p, list_transform(generate_series(1, 19),
                                             i -> i / 20.0)) AS qa
      FROM (SELECT p FROM bids UNION ALL SELECT p FROM asks)
    ), grid AS (
      SELECT g.i, qarr.qa[g.i] AS price
      FROM generate_series(1, 19) g(i), qarr
    ), curves AS (
      SELECT grid.i, grid.price,
             (SELECT COUNT(*) FROM bids WHERE bids.p >= grid.price) AS demand,
             (SELECT COUNT(*) FROM asks WHERE asks.p <= grid.price) AS supply
      FROM grid
    ), vol AS (
      SELECT i, price, demand, supply, LEAST(demand, supply) AS volume
      FROM curves
    )
    SELECT CAST(i AS BIGINT) AS grid_idx,
           ROUND(price + 5e-8, 2) AS price_usd,
           CAST(demand AS BIGINT) AS demand,
           CAST(supply AS BIGINT) AS supply,
           CAST(volume AS BIGINT) AS volume,
           volume = (SELECT MAX(volume) FROM vol) AS is_clearing
    FROM vol ORDER BY grid_idx
"""


@register(
    "q501_market_clearing",
    _Q501_ORACLE,
    doc="Double-auction clearing: bid curve (AUTOMOBILE prices, pay "
    ">= p) against ask curve (BUILDING prices, sell <= p) on a "
    "19-point price grid; max of min(demand, supply) marks the "
    "clearing price — two-sided market equilibrium beside the "
    "one-sided reserve sweep (q496).",
)
def q501(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    # lineage cut: bids/asks feed the quantile grid, demand, and
    # supply branches (plan audit: 28 scans with persist-only lineage)
    bids = j.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        F.col("o_totalprice").alias("p")
    ).localCheckpoint(eager=False)
    asks = j.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("o_totalprice").alias("p")
    ).localCheckpoint(eager=False)
    both = bids.unionAll(asks)
    qarr = both.agg(
        F.percentile(
            "p", F.array(*[F.lit(i / 20.0) for i in range(1, 20)])
        ).alias("qa")
    )
    grid = (
        spark.range(1, 20)
        .select(F.col("id").cast("int").alias("i"))
        .crossJoin(F.broadcast(qarr))
        .select("i", F.element_at("qa", F.col("i")).alias("price"))
    )
    demand = (
        grid.crossJoin(bids)
        .groupBy("i", "price")
        .agg(F.sum(F.when(F.col("p") >= F.col("price"), 1).otherwise(0)).alias("demand"))
    )
    supply = (
        grid.crossJoin(asks)
        .groupBy("i")
        .agg(F.sum(F.when(F.col("p") <= F.col("price"), 1).otherwise(0)).alias("supply"))
    )
    vol = demand.join(supply, "i").select(
        "i",
        "price",
        "demand",
        "supply",
        F.least("demand", "supply").alias("volume"),
    )
    best = vol.agg(F.max("volume").alias("bv"))
    return (
        vol.crossJoin(F.broadcast(best))
        .select(
            F.col("i").cast("bigint").alias("grid_idx"),
            F.round(F.col("price") + F.lit(5e-8), 2).alias("price_usd"),
            F.col("demand").cast("bigint").alias("demand"),
            F.col("supply").cast("bigint").alias("supply"),
            F.col("volume").cast("bigint").alias("volume"),
            (F.col("volume") == F.col("bv")).alias("is_clearing"),
        )
        .orderBy("grid_idx")
    )


# ---------------------------------------------------------------------------
# Q502 — balanced interleaving for ranker comparison
# ---------------------------------------------------------------------------
# Rankers A (price desc) and B (recency desc) over the same corpus;
# balanced interleaving assigns each item the position
# min(2 rank_A - 1, 2 rank_B) with team = whichever was smaller, and
# clicks (relevance proxy: above-median price of the interleaved
# pool) credit the contributing team — the online ranker-comparison
# protocol beside the offline rank metrics (q83/q377).
_Q502_ORACLE = """
    WITH ranked AS (
      SELECT o_orderkey AS id, o_totalprice AS price,
             ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey)
               AS ra,
             ROW_NUMBER() OVER (ORDER BY o_orderdate DESC, o_orderkey)
               AS rb
      FROM orders
    ), pool AS (
      SELECT id, price,
             LEAST(2 * ra - 1, 2 * rb) AS pos,
             CASE WHEN 2 * ra - 1 <= 2 * rb THEN 'A' ELSE 'B' END AS team
      FROM ranked WHERE ra <= 20 OR rb <= 20
    ), inter AS (
      SELECT id, price, team,
             ROW_NUMBER() OVER (ORDER BY pos, id) AS ipos
      FROM pool
    ), top AS (
      SELECT * FROM inter WHERE ipos <= 20
    ), med AS (
      SELECT quantile_cont(price, 0.5) AS m FROM top
    ), clicks AS (
      SELECT team, COUNT(*) AS n_items,
             SUM(CASE WHEN price > (SELECT m FROM med) THEN 1 ELSE 0 END)
               AS n_clicks
      FROM top GROUP BY team
    )
    SELECT team, CAST(n_items AS BIGINT) AS n_items,
           CAST(n_clicks AS BIGINT) AS n_clicks,
           ROUND(n_clicks * 1.0 / n_items + 5e-12, 6) AS ctr,
           n_clicks = (SELECT MAX(n_clicks) FROM clicks) AS wins
    FROM clicks ORDER BY team
"""


@register(
    "q502_balanced_interleave",
    _Q502_ORACLE,
    doc="Balanced interleaving of two rankers (price vs recency): "
    "merged position min(2rA-1, 2rB) with contributing-team "
    "attribution, clicks simulated as above-median relevance on the "
    "interleaved top-20, per-team CTR and the win flag — the online "
    "A/B protocol for rankers (offline metrics q83/q377's live "
    "sibling).",
)
def q502(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    ranked = o.select(
        F.col("o_orderkey").alias("id"),
        F.col("o_totalprice").alias("price"),
        F.row_number()
        .over(Window.orderBy(F.desc("o_totalprice"), "o_orderkey"))
        .alias("ra"),
        F.row_number()
        .over(Window.orderBy(F.desc("o_orderdate"), "o_orderkey"))
        .alias("rb"),
    )
    pool = ranked.filter((F.col("ra") <= 20) | (F.col("rb") <= 20)).select(
        "id",
        "price",
        F.least(2 * F.col("ra") - 1, 2 * F.col("rb")).alias("pos"),
        F.when(2 * F.col("ra") - 1 <= 2 * F.col("rb"), "A")
        .otherwise("B")
        .alias("team"),
    )
    top = (
        pool.select(
            "id",
            "price",
            "team",
            F.row_number().over(Window.orderBy("pos", "id")).alias("ipos"),
        )
        .filter(F.col("ipos") <= 20)
        .localCheckpoint(eager=False)
    )
    med = top.agg(F.percentile("price", F.lit(0.5)).alias("m"))
    clicks = (
        top.crossJoin(F.broadcast(med))
        .groupBy("team")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.when(F.col("price") > F.col("m"), 1).otherwise(0)).alias(
                "n_clicks"
            ),
        )
    )
    best = clicks.agg(F.max("n_clicks").alias("bc"))
    return (
        clicks.crossJoin(F.broadcast(best))
        .select(
            "team",
            F.col("n_items").cast("bigint").alias("n_items"),
            F.col("n_clicks").cast("bigint").alias("n_clicks"),
            r6(F.col("n_clicks") * 1.0 / F.col("n_items")).alias("ctr"),
            (F.col("n_clicks") == F.col("bc")).alias("wins"),
        )
        .orderBy("team")
    )


# ---------------------------------------------------------------------------
# Q503 — epidemic threshold from the adjacency spectral radius
# ---------------------------------------------------------------------------
# The symmetric modulo contact graph's largest adjacency eigenvalue
# (eight power-iteration rounds, q434's machinery pointed at a
# graph) sets the SIS epidemic threshold beta/gamma > 1/lambda1;
# the Molloy-Reed degree proxy <k^2>/<k> rides along to show how
# degree heterogeneity lowers the threshold below 1/<k>.
_Q503_ORACLE = """
    WITH e0 AS (
      SELECT DISTINCT CAST(o_custkey % 30 AS BIGINT) AS u,
             CAST(o_orderkey % 30 AS BIGINT) AS v
      FROM orders WHERE o_custkey % 30 <> o_orderkey % 30
    ), e AS MATERIALIZED (
      SELECT u, v FROM e0 UNION SELECT v, u FROM e0
    ), deg AS (
      SELECT u, COUNT(*) AS k FROM e GROUP BY u
    ), v0 AS (
      SELECT g.i AS u, CAST(1.0 AS DOUBLE) / SQRT(30.0) AS x
      FROM generate_series(0, 29) g(i)
    ), w1 AS MATERIALIZED (
      SELECT e.u, SUM(v0.x) AS w FROM e JOIN v0 ON v0.u = e.v GROUP BY e.u
    ), v1 AS MATERIALIZED (
      SELECT u, w / (SELECT SQRT(SUM(w * w)) FROM w1) AS x FROM w1
    ), w2 AS MATERIALIZED (
      SELECT e.u, SUM(v1.x) AS w FROM e JOIN v1 ON v1.u = e.v GROUP BY e.u
    ), v2 AS MATERIALIZED (
      SELECT u, w / (SELECT SQRT(SUM(w * w)) FROM w2) AS x FROM w2
    ), w3 AS MATERIALIZED (
      SELECT e.u, SUM(v2.x) AS w FROM e JOIN v2 ON v2.u = e.v GROUP BY e.u
    ), v3 AS MATERIALIZED (
      SELECT u, w / (SELECT SQRT(SUM(w * w)) FROM w3) AS x FROM w3
    ), w4 AS MATERIALIZED (
      SELECT e.u, SUM(v3.x) AS w FROM e JOIN v3 ON v3.u = e.v GROUP BY e.u
    ), v4 AS MATERIALIZED (
      SELECT u, w / (SELECT SQRT(SUM(w * w)) FROM w4) AS x FROM w4
    ), w5 AS MATERIALIZED (
      SELECT e.u, SUM(v4.x) AS w FROM e JOIN v4 ON v4.u = e.v GROUP BY e.u
    ), lam AS (
      SELECT SUM(v4.x * w5.w) AS l1
      FROM v4 JOIN w5 ON w5.u = v4.u
    ), mr AS (
      SELECT SUM(k * k) * 1.0 / SUM(k) AS k2_over_k,
             AVG(k * 1.0) AS kbar, COUNT(*) AS n_nodes
      FROM deg
    )
    SELECT CAST(mr.n_nodes AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_directed_edges,
           ROUND(lam.l1 + 5e-12, 6) AS lambda1,
           ROUND(1.0 / lam.l1 + 5e-12, 6) AS epidemic_threshold,
           ROUND(mr.kbar + 5e-12, 6) AS mean_degree,
           ROUND(mr.k2_over_k + 5e-12, 6) AS molloy_reed_k2_over_k
    FROM lam, mr
"""


@register(
    "q503_epidemic_threshold",
    _Q503_ORACLE,
    doc="SIS epidemic threshold 1/lambda1 from five power-iteration "
    "rounds on the symmetric modulo contact graph's adjacency "
    "(q434's relational matvec pointed at a graph), with the "
    "Molloy-Reed <k^2>/<k> heterogeneity proxy — spectral "
    "epidemiology over the cascade family (q404/q405/q489).",
)
def q503(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    e0 = (
        o.select(
            (F.col("o_custkey") % 30).cast("bigint").alias("u"),
            (F.col("o_orderkey") % 30).cast("bigint").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    e = e0.unionAll(e0.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct().localCheckpoint(eager=False)
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("k"))
    allw = Window.partitionBy()
    # four normalize rounds produce v4; w5 = A v4; lambda1 = v4 . w5
    vv = spark.range(0, 30).select(
        F.col("id").alias("u"), (F.lit(1.0) / F.sqrt(F.lit(30.0))).alias("x")
    )
    for _ in range(4):
        w_df = (
            e.join(vv.select(F.col("u").alias("v"), "x"), "v")
            .groupBy("u")
            .agg(F.sum("x").alias("w"))
        )
        vv = w_df.select(
            "u",
            (F.col("w") / F.sqrt(F.sum(F.col("w") * F.col("w")).over(allw))).alias(
                "x"
            ),
        ).localCheckpoint(eager=False)
    w5 = (
        e.join(vv.select(F.col("u").alias("v"), "x"), "v")
        .groupBy("u")
        .agg(F.sum("x").alias("w"))
    )
    lam = vv.join(w5, "u").agg(F.sum(F.col("x") * F.col("w")).alias("l1"))
    mr = deg.agg(
        (F.sum(F.col("k") * F.col("k")) * 1.0 / F.sum("k")).alias("k2_over_k"),
        F.avg(F.col("k") * 1.0).alias("kbar"),
        F.count(F.lit(1)).alias("n_nodes"),
    )
    ne = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        lam.crossJoin(F.broadcast(mr))
        .crossJoin(F.broadcast(ne))
        .select(
            F.col("n_nodes").cast("bigint").alias("n_nodes"),
            F.col("n_edges").cast("bigint").alias("n_directed_edges"),
            r6(F.col("l1")).alias("lambda1"),
            r6(1.0 / F.col("l1")).alias("epidemic_threshold"),
            r6(F.col("kbar")).alias("mean_degree"),
            r6(F.col("k2_over_k")).alias("molloy_reed_k2_over_k"),
        )
    )
