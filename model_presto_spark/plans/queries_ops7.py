"""Conformance queries: experimentation-platform operators (q209+).

Ratio-metric inference needs the delta method (a per-user ratio is
not an average of i.i.d. rows), and production A/B platforms run
CUPED variance reduction before the test. Both are single-pass
moment aggregations — the 100 TB shape is one groupBy over users
then scalar algebra on a handful of doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import R6_SQL, _t, r6, register

_R6 = R6_SQL

_HASH_VARIANT = (
    "CAST(('0x' || substr(md5('ab#' || CAST(user_id AS VARCHAR)), 1, 15)) "
    "AS BIGINT) % 2"
)

# ---------------------------------------------------------------------------
# Q209 — delta-method ratio-metric A/B test
# ---------------------------------------------------------------------------
# Metric: value per event, as the ratio of per-user sums R = X̄/Ȳ.
# Var(R) ~ (s_x² - 2R s_xy + R² s_y²) / (n ȳ²) — the delta method;
# naive per-row variance would be wrong because the denominator is
# random too. One aggregation to per-user (x, y), one to per-variant
# moments, scalar algebra after.
_Q209_ORACLE = f"""
    WITH per_user AS (
      SELECT user_id, {_HASH_VARIANT} AS variant,
             SUM(COALESCE(value, 0.0)) AS x,
             CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY user_id
    ), mom AS (
      SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_users,
             AVG(x) AS mx, AVG(y) AS my,
             (SUM(x * x) - COUNT(*) * AVG(x) * AVG(x)) / (COUNT(*) - 1) AS sxx,
             (SUM(y * y) - COUNT(*) * AVG(y) * AVG(y)) / (COUNT(*) - 1) AS syy,
             (SUM(x * y) - COUNT(*) * AVG(x) * AVG(y)) / (COUNT(*) - 1) AS sxy
      FROM per_user GROUP BY variant
    )
    SELECT variant, n_users,
           {_R6.format(x='mx / my')} AS ratio,
           {_R6.format(
               x='(sxx - 2 * (mx / my) * sxy '
                 '+ (mx / my) * (mx / my) * syy) '
                 '/ (n_users * my * my)')} AS var_ratio
    FROM mom ORDER BY variant
"""


@register(
    "q209_delta_method",
    _Q209_ORACLE,
    doc="Delta-method ratio-metric A/B readout: value-per-event as "
    "the ratio of per-user sums, with the linearized variance "
    "(s_xx - 2R s_xy + R^2 s_yy)/(n my^2) — the correct SE for a "
    "ratio whose denominator is random. Two aggregations total; "
    "variants assigned by the deterministic md5 coin.",
)
def q209(spark: SparkSession, sf_dir: str) -> DataFrame:
    from model_presto_spark.functions.text import h60

    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("x"),
        F.count(F.lit(1)).cast("double").alias("y"),
    )
    variant = F.pmod(
        h60(F.concat(F.lit("ab#"), F.col("user_id").cast("string"))),
        F.lit(2),
    ).alias("variant")
    n = F.count(F.lit(1))
    mom = (
        per_user.select(variant, "x", "y")
        .groupBy("variant")
        .agg(
            n.cast("bigint").alias("n_users"),
            F.avg("x").alias("mx"),
            F.avg("y").alias("my"),
            (
                (F.sum(F.col("x") * F.col("x")) - n * F.avg("x") * F.avg("x"))
                / (n - 1)
            ).alias("sxx"),
            (
                (F.sum(F.col("y") * F.col("y")) - n * F.avg("y") * F.avg("y"))
                / (n - 1)
            ).alias("syy"),
            (
                (F.sum(F.col("x") * F.col("y")) - n * F.avg("x") * F.avg("y"))
                / (n - 1)
            ).alias("sxy"),
        )
    )
    ratio = F.col("mx") / F.col("my")
    return mom.select(
        "variant",
        "n_users",
        r6(ratio).alias("ratio"),
        r6(
            (
                F.col("sxx")
                - 2 * ratio * F.col("sxy")
                + ratio * ratio * F.col("syy")
            )
            / (F.col("n_users") * F.col("my") * F.col("my"))
        ).alias("var_ratio"),
    ).orderBy("variant")


# ---------------------------------------------------------------------------
# Q210 — CUPED variance reduction
# ---------------------------------------------------------------------------
# Pre-period covariate x (first half of the month), experiment
# metric y (second half); theta = cov(x,y)/var(x) fitted on ALL
# users (the unbiased CUPED recipe), adjusted metric
# y - theta*(x - mean(x)). Reports per-variant means and the
# variance reduction the adjustment buys.
_Q210_ORACLE = f"""
    WITH per_user AS (
      SELECT user_id, {_HASH_VARIANT} AS variant,
             SUM(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                      THEN COALESCE(value, 0.0) ELSE 0.0 END) AS x,
             SUM(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                      THEN COALESCE(value, 0.0) ELSE 0.0 END) AS y
      FROM events GROUP BY user_id
    ), theta AS (
      SELECT (SUM(x * y) - COUNT(*) * AVG(x) * AVG(y))
               / (SUM(x * x) - COUNT(*) * AVG(x) * AVG(x)) AS th,
             AVG(x) AS gmx
      FROM per_user
    ), adj AS (
      SELECT p.variant, p.y,
             p.y - t.th * (p.x - t.gmx) AS y_adj
      FROM per_user p CROSS JOIN theta t
    )
    SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_users,
           {_R6.format(x='AVG(y)')} AS mean_y,
           {_R6.format(x='AVG(y_adj)')} AS mean_y_adj,
           {_R6.format(
               x='(SUM(y * y) - COUNT(*) * AVG(y) * AVG(y)) / (COUNT(*) - 1)')}
             AS var_y,
           {_R6.format(
               x='(SUM(y_adj * y_adj) - COUNT(*) * AVG(y_adj) * AVG(y_adj)) '
                 '/ (COUNT(*) - 1)')}
             AS var_y_adj
    FROM adj GROUP BY variant ORDER BY variant
"""


@register(
    "q210_cuped",
    _Q210_ORACLE,
    doc="CUPED variance reduction: pre-period covariate (first half "
    "of the month) against the experiment metric (second half), "
    "theta = cov/var fitted once on all users, adjusted metric "
    "y - theta*(x - mean x). Per-variant raw vs adjusted means and "
    "variances — the adjustment's whole point is var_y_adj < var_y "
    "at an unchanged treatment-effect estimate.",
)
def q210(spark: SparkSession, sf_dir: str) -> DataFrame:
    from model_presto_spark.functions.text import h60

    ev = _t(spark, sf_dir, "events")
    pre = F.col("ts").cast("date") < F.lit("2024-01-16").cast("date")
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.sum(
                F.when(pre, F.coalesce(F.col("value"), F.lit(0.0))).otherwise(
                    0.0
                )
            ).alias("x"),
            F.sum(
                F.when(~pre, F.coalesce(F.col("value"), F.lit(0.0))).otherwise(
                    0.0
                )
            ).alias("y"),
        )
        .select(
            F.pmod(
                h60(F.concat(F.lit("ab#"), F.col("user_id").cast("string"))),
                F.lit(2),
            ).alias("variant"),
            "x",
            "y",
        )
        .localCheckpoint(eager=False)  # referenced by theta AND adj
    )
    n = F.count(F.lit(1))
    theta = per_user.agg(
        (
            (F.sum(F.col("x") * F.col("y")) - n * F.avg("x") * F.avg("y"))
            / (F.sum(F.col("x") * F.col("x")) - n * F.avg("x") * F.avg("x"))
        ).alias("th"),
        F.avg("x").alias("gmx"),
    )
    adj = per_user.crossJoin(F.broadcast(theta)).select(
        "variant",
        "y",
        (F.col("y") - F.col("th") * (F.col("x") - F.col("gmx"))).alias(
            "y_adj"
        ),
    )
    var_of = lambda c: (
        F.sum(F.col(c) * F.col(c)) - n * F.avg(c) * F.avg(c)
    ) / (n - 1)
    return (
        adj.groupBy("variant")
        .agg(
            n.cast("bigint").alias("n_users"),
            r6(F.avg("y")).alias("mean_y"),
            r6(F.avg("y_adj")).alias("mean_y_adj"),
            r6(var_of("y")).alias("var_y"),
            r6(var_of("y_adj")).alias("var_y_adj"),
        )
        .orderBy("variant")
    )
