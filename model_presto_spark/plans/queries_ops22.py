"""Conformance queries: round-7 operator batch #16 (q291+) — IV
two-stage least squares, two-proportion power analysis, shard
balancing, multiplicative growth decomposition, rolling-origin
forecast cross-validation.

Parity: all estimators reduce to exact integer moment ratios and
shared double constants; per-fold error tables are integer cents."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import R6_SQL, _t, r6, register

_R6 = R6_SQL


# ---------------------------------------------------------------------------
# Q291 — Instrumental-variable 2SLS (single instrument)
# ---------------------------------------------------------------------------
# Effect of daily click revenue (x) on purchase revenue (y) using
# day-before click revenue (z) as the instrument:
# beta_IV = S_zy / S_zx (Wald/ratio form), vs naive OLS S_xy/S_xx.
# Every covariation comes from exact integer cent moments on the
# common lagged sample.
_Q291_ORACLE = """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(ROUND(SUM(CASE WHEN event_type = 'click'
                                 THEN value ELSE 0 END) * 100, 0)
                  AS BIGINT) AS kc,
             CAST(ROUND(SUM(CASE WHEN event_type = 'purchase'
                                 THEN value ELSE 0 END) * 100, 0)
                  AS BIGINT) AS pc
      FROM events GROUP BY day
    ), lagged AS (
      SELECT pc AS y, kc AS x,
             LAG(kc) OVER (ORDER BY day) AS z
      FROM daily
    ), mom AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(z) AS DOUBLE) AS sz,
             CAST(SUM(x * x) AS DOUBLE) AS sxx,
             CAST(SUM(z * x) AS DOUBLE) AS szx,
             CAST(SUM(z * y) AS DOUBLE) AS szy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy,
             CAST(SUM(z * z) AS DOUBLE) AS szz
      FROM lagged WHERE z IS NOT NULL
    )
    SELECT CAST(n AS BIGINT) AS n,
           {B_OLS} AS beta_ols,
           {B_IV} AS beta_iv,
           {F_STAGE1} AS stage1_f
    FROM mom
""".replace(
    "{B_OLS}",
    R6_SQL.format(x="(n * sxy - sx * sy) / (n * sxx - sx * sx)"),
).replace(
    "{B_IV}",
    R6_SQL.format(x="(n * szy - sz * sy) / (n * szx - sz * sx)"),
).replace(
    "{F_STAGE1}",
    R6_SQL.format(
        x=(
            "((n * szx - sz * sx) * (n * szx - sz * sx)"
            " / (n * szz - sz * sz))"
            " / (((n * sxx - sx * sx)"
            " - (n * szx - sz * sx) * (n * szx - sz * sx)"
            " / (n * szz - sz * sz)) / (n - 2))"
        )
    ),
)


@register(
    "q291_iv_2sls",
    _Q291_ORACLE,
    doc="Single-instrument 2SLS: beta_IV = S_zy/S_zx with "
    "yesterday's clicks instrumenting today's, vs the naive OLS "
    "slope, plus the stage-1 F (weak-instrument check).  One "
    "integer-moment pass on the lagged sample.",
)
def q291(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.round(
            F.sum(
                F.when(
                    F.col("event_type") == "click", F.col("value")
                ).otherwise(0.0)
            )
            * 100,
            0,
        )
        .cast("bigint")
        .alias("kc"),
        F.round(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", F.col("value")
                ).otherwise(0.0)
            )
            * 100,
            0,
        )
        .cast("bigint")
        .alias("pc"),
    )
    lagged = daily.select(
        F.col("pc").alias("y"),
        F.col("kc").alias("x"),
        F.lag("kc").over(Window.orderBy("day")).alias("z"),
    ).where(F.col("z").isNotNull())
    mom = lagged.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum("z").cast("double").alias("sz"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("z") * F.col("x")).cast("double").alias("szx"),
        F.sum(F.col("z") * F.col("y")).cast("double").alias("szy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("z") * F.col("z")).cast("double").alias("szz"),
    )
    c = F.col
    szx_c = c("n") * c("szx") - c("sz") * c("sx")
    szz_c = c("n") * c("szz") - c("sz") * c("sz")
    sxx_c = c("n") * c("sxx") - c("sx") * c("sx")
    return mom.select(
        F.col("n").cast("bigint").alias("n"),
        r6(
            (c("n") * c("sxy") - c("sx") * c("sy")) / sxx_c
        ).alias("beta_ols"),
        r6(
            (c("n") * c("szy") - c("sz") * c("sy")) / szx_c
        ).alias("beta_iv"),
        r6(
            (szx_c * szx_c / szz_c)
            / ((sxx_c - szx_c * szx_c / szz_c) / (c("n") - 2))
        ).alias("stage1_f"),
    )


# ---------------------------------------------------------------------------
# Q292 — Two-proportion power analysis (required sample size)
# ---------------------------------------------------------------------------
# Given the observed variant conversion rates, the classical
# required n per arm to detect that gap at alpha=0.05, power=0.8:
# n = (z_a sqrt(2 p_bar q_bar) + z_b sqrt(p1 q1 + p2 q2))^2 /
# delta^2.  Rates from exact integer counts; z constants shared.
_Q292_ZA = 1.959963984540054   # Phi^-1(0.975)
_Q292_ZB = 0.8416212335729143  # Phi^-1(0.8)

_Q292_NUM = (
    "({za} * SQRT(2.0 * pbar * (1.0 - pbar))"
    " + {zb} * SQRT(p1 * (1.0 - p1) + p2 * (1.0 - p2)))"
).format(za=_Q292_ZA, zb=_Q292_ZB)

# explicit square, not POW: libm pow can differ in the last ulp
# between engines
_Q292_N = f"({_Q292_NUM} * {_Q292_NUM}) / ((p1 - p2) * (p1 - p2))"

_Q292_ORACLE = f"""
    WITH arms AS (
      SELECT user_id % 2 AS variant,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                  AS BIGINT) AS k
      FROM events GROUP BY variant
    ), rates AS (
      SELECT MAX(CASE WHEN variant = 0 THEN CAST(k AS DOUBLE) / n END)
               AS p1,
             MAX(CASE WHEN variant = 1 THEN CAST(k AS DOUBLE) / n END)
               AS p2,
             CAST(SUM(k) AS DOUBLE) / SUM(n) AS pbar,
             CAST(MIN(n) AS BIGINT) AS n_obs
      FROM arms
    )
    SELECT {_R6.format(x='p1')} AS p_control,
           {_R6.format(x='p2')} AS p_treat,
           {_R6.format(x='p2 - p1')} AS delta,
           {_R6.format(x=_Q292_N)} AS n_required_per_arm,
           n_obs,
           CAST(CEIL(({_Q292_N}) / n_obs) AS BIGINT) AS times_current
    FROM rates
"""


@register(
    "q292_power",
    _Q292_ORACLE,
    doc="Two-proportion power analysis on the observed variant "
    "conversion gap: required n per arm at alpha=0.05/power=0.8 "
    "in closed form from integer counts, and how many multiples "
    "of the current sample that is.  The is-this-test-even-"
    "feasible planning number.",
)
def q292(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    arms = ev.groupBy((F.col("user_id") % 2).alias("variant")).agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
            "k"
        ),
    )
    rates = arms.agg(
        F.max(
            F.when(
                F.col("variant") == 0,
                F.col("k").cast("double") / F.col("n"),
            )
        ).alias("p1"),
        F.max(
            F.when(
                F.col("variant") == 1,
                F.col("k").cast("double") / F.col("n"),
            )
        ).alias("p2"),
        (F.sum("k").cast("double") / F.sum("n")).alias("pbar"),
        F.min("n").alias("n_obs"),
    )
    za, zb = _Q292_ZA, _Q292_ZB
    p1, p2, pbar = F.col("p1"), F.col("p2"), F.col("pbar")
    num = za * F.sqrt(2.0 * pbar * (1.0 - pbar)) + zb * F.sqrt(
        p1 * (1.0 - p1) + p2 * (1.0 - p2)
    )
    n_req = (num * num) / ((p1 - p2) * (p1 - p2))
    return rates.select(
        r6(p1).alias("p_control"),
        r6(p2).alias("p_treat"),
        r6(p2 - p1).alias("delta"),
        r6(n_req).alias("n_required_per_arm"),
        F.col("n_obs").cast("bigint").alias("n_obs"),
        F.ceil(n_req / F.col("n_obs")).cast("bigint").alias(
            "times_current"
        ),
    )


# ---------------------------------------------------------------------------
# Q293 — Shard balancing (sorted round-robin vs lower bound)
# ---------------------------------------------------------------------------
# Assign documents to 8 workers by size-sorted round-robin (the
# deterministic, shuffle-friendly LPT stand-in) and report each
# worker's byte load and the makespan ratio vs the perfect-split
# lower bound.  All exact integer bytes.
_Q293_W = 8

_Q293_ORACLE = f"""
    WITH ranked AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS sz,
             ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS rk
      FROM documents
    ), assigned AS (
      SELECT (rk - 1) % {_Q293_W} AS worker, sz FROM ranked
    ), loads AS (
      SELECT worker, CAST(SUM(sz) AS BIGINT) AS load,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM assigned GROUP BY worker
    ), tot AS (
      SELECT CAST(SUM(load) AS BIGINT) AS total,
             CAST(MAX(load) AS BIGINT) AS makespan
      FROM loads
    )
    SELECT CAST(l.worker AS BIGINT) AS worker, l.n_docs, l.load,
           {_R6.format(
               x=f'CAST(l.load AS DOUBLE) * {_Q293_W} / t.total'
           )} AS balance_ratio,
           {_R6.format(
               x=f'CAST(t.makespan AS DOUBLE) * {_Q293_W} / t.total'
           )} AS makespan_ratio
    FROM loads l CROSS JOIN tot t
    ORDER BY worker
"""


@register(
    "q293_shard_balance",
    _Q293_ORACLE,
    doc="Shard-balancing audit: size-sorted round-robin assignment "
    "of documents to 8 workers (the deterministic LPT stand-in "
    "that needs only a rank, no sequential greedy), per-worker "
    "load and makespan ratio vs the perfect-split lower bound.  "
    "The pre-flight check for any partitioned batch job.",
)
def q293(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    ranked = docs.select(
        F.col("n_chars").cast("bigint").alias("sz"),
        F.row_number()
        .over(Window.orderBy(F.col("n_chars").desc(), "doc_id"))
        .alias("rk"),
    )
    loads = (
        ranked.select(
            ((F.col("rk") - 1) % _Q293_W).alias("worker"), "sz"
        )
        .groupBy("worker")
        .agg(
            F.sum("sz").alias("load"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )
    tot = loads.agg(
        F.sum("load").alias("total"), F.max("load").alias("makespan")
    )
    return (
        loads.crossJoin(F.broadcast(tot))
        .select(
            F.col("worker").cast("bigint").alias("worker"),
            "n_docs",
            "load",
            r6(
                F.col("load").cast("double") * _Q293_W / F.col("total")
            ).alias("balance_ratio"),
            r6(
                F.col("makespan").cast("double")
                * _Q293_W
                / F.col("total")
            ).alias("makespan_ratio"),
        )
        .orderBy("worker")
    )


# ---------------------------------------------------------------------------
# Q294 — Multiplicative growth decomposition (users x freq x AOV)
# ---------------------------------------------------------------------------
# Week-over-week purchase revenue growth split into log-additive
# drivers: Δln(revenue) = Δln(active users) + Δln(purchases/user)
# + Δln(revenue/purchase).  Counts and cents are exact integers;
# the decomposition identity closes by construction.
_Q294_ORACLE = """
    WITH wk AS (
      SELECT CAST(FLOOR((CAST(ts AS DATE) - DATE '2024-01-01') / 7)
                  AS BIGINT) AS week,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users,
             CAST(COUNT(*) AS BIGINT) AS purchases,
             CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
      GROUP BY week
    ), lagged AS (
      SELECT week, users, purchases, cents,
             LAG(users) OVER w AS u0,
             LAG(purchases) OVER w AS p0,
             LAG(cents) OVER w AS c0
      FROM wk WINDOW w AS (ORDER BY week)
    )
    SELECT week,
           {G_REV} AS dln_revenue,
           {G_USERS} AS dln_users,
           {G_FREQ} AS dln_freq,
           {G_AOV} AS dln_aov
    FROM lagged WHERE u0 IS NOT NULL
    ORDER BY week
""".replace(
    "{G_REV}", R6_SQL.format(x="ln(CAST(cents AS DOUBLE) / c0)")
).replace(
    "{G_USERS}", R6_SQL.format(x="ln(CAST(users AS DOUBLE) / u0)")
).replace(
    "{G_FREQ}",
    R6_SQL.format(
        x=(
            "ln((CAST(purchases AS DOUBLE) / users)"
            " / (CAST(p0 AS DOUBLE) / u0))"
        )
    ),
).replace(
    "{G_AOV}",
    R6_SQL.format(
        x=(
            "ln((CAST(cents AS DOUBLE) / purchases)"
            " / (CAST(c0 AS DOUBLE) / p0))"
        )
    ),
)


@register(
    "q294_growth_decomp",
    _Q294_ORACLE,
    doc="Multiplicative growth decomposition of weekly purchase "
    "revenue: Δln(revenue) = Δln(users) + Δln(freq) + Δln(AOV), "
    "every term from exact integer counts/cents — the identity "
    "closes by construction, so the drivers always reconcile.  "
    "The growth-accounting sibling of q192.",
)
def q294(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    wk = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(
            F.floor(
                F.datediff(F.to_date("ts"), F.lit("2024-01-01")) / 7
            )
            .cast("bigint")
            .alias("week")
        )
        .agg(
            F.count_distinct("user_id").alias("users"),
            F.count(F.lit(1)).alias("purchases"),
            F.round(F.sum("value") * 100, 0)
            .cast("bigint")
            .alias("cents"),
        )
    )
    w = Window.orderBy("week")
    lagged = wk.select(
        "week",
        "users",
        "purchases",
        "cents",
        F.lag("users").over(w).alias("u0"),
        F.lag("purchases").over(w).alias("p0"),
        F.lag("cents").over(w).alias("c0"),
    ).where(F.col("u0").isNotNull())
    return lagged.select(
        "week",
        r6(
            F.log(F.col("cents").cast("double") / F.col("c0"))
        ).alias("dln_revenue"),
        r6(
            F.log(F.col("users").cast("double") / F.col("u0"))
        ).alias("dln_users"),
        r6(
            F.log(
                (F.col("purchases").cast("double") / F.col("users"))
                / (F.col("p0").cast("double") / F.col("u0"))
            )
        ).alias("dln_freq"),
        r6(
            F.log(
                (F.col("cents").cast("double") / F.col("purchases"))
                / (F.col("c0").cast("double") / F.col("p0"))
            )
        ).alias("dln_aov"),
    ).orderBy("week")


# ---------------------------------------------------------------------------
# Q295 — Rolling-origin forecast cross-validation
# ---------------------------------------------------------------------------
# Expanding-origin backtest comparing seasonal-naive (lag 7) vs
# drift (last + mean historical diff) one-step forecasts at 4
# origins x 3 horizons per series.  All forecasts and errors are
# exact integer/rational cents from window moments; per-model MAE
# decides the winner per series.
_Q295_ORACLE = """
    WITH daily AS MATERIALIZED (
      SELECT event_type,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY CAST(ts AS DATE))
                  AS BIGINT) AS t,
             y
      FROM (
        SELECT event_type, CAST(ts AS DATE) AS ts,
               CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS y
        FROM events GROUP BY event_type, CAST(ts AS DATE)
      )
    ), origins AS (
      SELECT UNNEST([18, 21, 24, 27]) AS o
    ), folds AS (
      SELECT d.event_type, og.o, h.h, d.t, d.y AS actual
      FROM daily d
      CROSS JOIN origins og
      CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS h) h
      WHERE d.t = og.o + h.h
    ), snaive AS (
      SELECT f.event_type, f.o, f.h, f.actual,
             d.y AS fc_snaive
      FROM folds f JOIN daily d
        ON d.event_type = f.event_type AND d.t = f.o + f.h - 7
    ), drift AS (
      SELECT f.event_type, f.o, f.h,
             MAX(CASE WHEN d.t = f.o THEN d.y END)
             + f.h * (MAX(CASE WHEN d.t = f.o THEN d.y END)
                      - MAX(CASE WHEN d.t = 1 THEN d.y END))
                   / CAST(f.o - 1 AS DOUBLE) AS fc_drift
      FROM folds f JOIN daily d
        ON d.event_type = f.event_type AND d.t IN (1, f.o)
      GROUP BY f.event_type, f.o, f.h
    ), err AS (
      SELECT s.event_type,
             AVG(ABS(CAST(s.actual - s.fc_snaive AS DOUBLE))) / 100.0
               AS mae_snaive,
             AVG(ABS(s.actual - dr.fc_drift)) / 100.0 AS mae_drift
      FROM snaive s
      JOIN drift dr ON dr.event_type = s.event_type
                   AND dr.o = s.o AND dr.h = s.h
      GROUP BY s.event_type
    )
    SELECT event_type,
           {MAE_S} AS mae_snaive,
           {MAE_D} AS mae_drift,
           CASE WHEN mae_snaive < mae_drift THEN 'seasonal_naive'
                ELSE 'drift' END AS winner
    FROM err ORDER BY event_type
""".replace(
    "{MAE_S}", R6_SQL.format(x="mae_snaive")
).replace(
    "{MAE_D}", R6_SQL.format(x="mae_drift")
)


@register(
    "q295_rolling_origin",
    _Q295_ORACLE,
    doc="Rolling-origin cross-validation: seasonal-naive vs drift "
    "one-step-to-3-step forecasts at 4 expanding origins per "
    "series, per-model MAE and the winner.  Forecast errors are "
    "exact cents (drift slope is a rational); the honest "
    "out-of-sample model-selection table.",
)
def q295(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.round(F.sum("value") * 100, 0).cast("bigint").alias("y"))
        .select(
            "event_type",
            F.row_number()
            .over(Window.partitionBy("event_type").orderBy("day"))
            .cast("bigint")
            .alias("t"),
            "y",
        )
        .localCheckpoint(eager=False)  # folds + snaive + drift
    )
    spark_sess = daily.sparkSession
    origins = spark_sess.range(0, 4).select(
        (18 + F.col("id") * 3).alias("o")
    )
    horizons = spark_sess.range(1, 4).select(F.col("id").alias("h"))
    folds = (
        daily.crossJoin(F.broadcast(origins))
        .crossJoin(F.broadcast(horizons))
        .where(F.col("t") == F.col("o") + F.col("h"))
        .select("event_type", "o", "h", F.col("y").alias("actual"))
    )
    dn = daily.select(
        F.col("event_type").alias("de"),
        F.col("t").alias("dt"),
        F.col("y").alias("dy"),
    )
    snaive = folds.join(
        dn,
        (F.col("de") == F.col("event_type"))
        & (F.col("dt") == F.col("o") + F.col("h") - 7),
    ).select(
        "event_type", "o", "h", "actual", F.col("dy").alias("fc_snaive")
    )
    drift = (
        folds.join(
            dn,
            (F.col("de") == F.col("event_type"))
            & (F.col("dt").isin(1) | (F.col("dt") == F.col("o"))),
        )
        .groupBy("event_type", "o", "h")
        .agg(
            (
                F.max(F.when(F.col("dt") == F.col("o"), F.col("dy")))
                + F.col("h").cast("double")
                * (
                    F.max(
                        F.when(F.col("dt") == F.col("o"), F.col("dy"))
                    )
                    - F.max(F.when(F.col("dt") == 1, F.col("dy")))
                )
                / (F.col("o") - 1).cast("double")
            ).alias("fc_drift")
        )
    )
    err = (
        snaive.join(drift, ["event_type", "o", "h"])
        .groupBy("event_type")
        .agg(
            (
                F.avg(
                    F.abs(
                        (F.col("actual") - F.col("fc_snaive")).cast(
                            "double"
                        )
                    )
                )
                / 100.0
            ).alias("mae_snaive"),
            (
                F.avg(F.abs(F.col("actual") - F.col("fc_drift")))
                / 100.0
            ).alias("mae_drift"),
        )
    )
    return err.select(
        "event_type",
        r6(F.col("mae_snaive")).alias("mae_snaive"),
        r6(F.col("mae_drift")).alias("mae_drift"),
        F.when(
            F.col("mae_snaive") < F.col("mae_drift"), "seasonal_naive"
        )
        .otherwise("drift")
        .alias("winner"),
    ).orderBy("event_type")
