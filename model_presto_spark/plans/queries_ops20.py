"""Conformance queries: round-7 operator batch #14 (q281+) —
Granger-lite nested OLS F-test, Engle-Granger cointegration probe,
1-D constant-velocity Kalman filter, seasonal/trend strength,
outlier-rule ensemble.

Parity: regressions and variances come from exact integer cent/
count moments (the Cramer pattern); the Kalman fold carries a
5-double struct replayed identically WITH RECURSIVE in the oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import R6_SQL, _t, r6, register

_R6 = R6_SQL

_DAILY_CP = """
      SELECT CAST(ts AS DATE) AS day,
             CAST(ROUND(SUM(CASE WHEN event_type = 'click'
                                 THEN value ELSE 0 END) * 100, 0)
                  AS BIGINT) AS kc,
             CAST(ROUND(SUM(CASE WHEN event_type = 'purchase'
                                 THEN value ELSE 0 END) * 100, 0)
                  AS BIGINT) AS pc
      FROM events GROUP BY day
"""


def _daily_cp(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(F.to_date("ts").alias("day")).agg(
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


# ---------------------------------------------------------------------------
# Q281 — Granger-lite causality test (nested OLS F)
# ---------------------------------------------------------------------------
# Does yesterday's click revenue help predict today's purchase
# revenue beyond its own lag?  Restricted p_t ~ p_{t-1} vs
# unrestricted + k_{t-1}; both SSEs from ONE set of exact integer
# moments (SSE = Syy - beta'X'y), F = (SSE_r - SSE_u)/(SSE_u/(n-3)).
_Q281_DEN3 = (
    "(n * (sx11 * sx22 - sx12 * sx12)"
    " - sx1 * (sx1 * sx22 - sx12 * sx2)"
    " + sx2 * (sx1 * sx12 - sx11 * sx2))"
)
_Q281_A = (
    "((sy * (sx11 * sx22 - sx12 * sx12)"
    " - sx1 * (sx1y * sx22 - sx12 * sx2y)"
    " + sx2 * (sx1y * sx12 - sx11 * sx2y)) / " + _Q281_DEN3 + ")"
)
_Q281_B = (
    "((n * (sx1y * sx22 - sx12 * sx2y)"
    " - sy * (sx1 * sx22 - sx12 * sx2)"
    " + sx2 * (sx1 * sx2y - sx1y * sx2)) / " + _Q281_DEN3 + ")"
)
_Q281_C = (
    "((n * (sx11 * sx2y - sx1y * sx12)"
    " - sx1 * (sx1 * sx2y - sx1y * sx2)"
    " + sy * (sx1 * sx12 - sx11 * sx2)) / " + _Q281_DEN3 + ")"
)
_Q281_BR = "((n * sx1y - sx1 * sy) / (n * sx11 - sx1 * sx1))"
_Q281_AR = "((sy - " + _Q281_BR + " * sx1) / n)"
_Q281_SSE_R = (
    "(syy - " + _Q281_AR + " * sy - " + _Q281_BR + " * sx1y)"
)
_Q281_SSE_U = (
    "(syy - "
    + _Q281_A
    + " * sy - "
    + _Q281_B
    + " * sx1y - "
    + _Q281_C
    + " * sx2y)"
)

_Q281_ORACLE = f"""
    WITH daily AS ({_DAILY_CP}),
    lagged AS (
      SELECT pc AS y,
             LAG(pc) OVER (ORDER BY day) AS x1,
             LAG(kc) OVER (ORDER BY day) AS x2
      FROM daily
    ), mom AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x1) AS DOUBLE) AS sx1,
             CAST(SUM(x2) AS DOUBLE) AS sx2,
             CAST(SUM(y * y) AS DOUBLE) AS syy,
             CAST(SUM(x1 * x1) AS DOUBLE) AS sx11,
             CAST(SUM(x2 * x2) AS DOUBLE) AS sx22,
             CAST(SUM(x1 * x2) AS DOUBLE) AS sx12,
             CAST(SUM(x1 * y) AS DOUBLE) AS sx1y,
             CAST(SUM(x2 * y) AS DOUBLE) AS sx2y
      FROM lagged WHERE x1 IS NOT NULL
    )
    SELECT CAST(n AS BIGINT) AS n,
           {_R6.format(x=_Q281_C + " / 100.0 * 100.0")} AS beta_cross,
           {_R6.format(x=_Q281_SSE_R + " / 1e8")} AS sse_restricted,
           {_R6.format(x=_Q281_SSE_U + " / 1e8")} AS sse_unrestricted,
           {_R6.format(
               x="(" + _Q281_SSE_R + " - " + _Q281_SSE_U + ")"
                 " / (" + _Q281_SSE_U + " / (n - 3))"
           )} AS granger_f
    FROM mom
"""


@register(
    "q281_granger",
    _Q281_ORACLE,
    doc="Granger-lite test clicks->purchases: restricted AR(1) vs "
    "unrestricted +lagged-clicks OLS, both SSEs from one exact "
    "integer-moment pass (SSE = Syy - beta'X'y), nested F "
    "statistic.  The does-X-predict-Y screen without any solver.",
)
def q281(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_cp(spark, sf_dir)
    w = Window.orderBy("day")
    lagged = daily.select(
        F.col("pc").alias("y"),
        F.lag("pc").over(w).alias("x1"),
        F.lag("kc").over(w).alias("x2"),
    ).where(F.col("x1").isNotNull())
    mom = lagged.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("y").cast("double").alias("sy"),
        F.sum("x1").cast("double").alias("sx1"),
        F.sum("x2").cast("double").alias("sx2"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x1") * F.col("x1")).cast("double").alias("sx11"),
        F.sum(F.col("x2") * F.col("x2")).cast("double").alias("sx22"),
        F.sum(F.col("x1") * F.col("x2")).cast("double").alias("sx12"),
        F.sum(F.col("x1") * F.col("y")).cast("double").alias("sx1y"),
        F.sum(F.col("x2") * F.col("y")).cast("double").alias("sx2y"),
    )
    c = F.col
    den3 = (
        c("n") * (c("sx11") * c("sx22") - c("sx12") * c("sx12"))
        - c("sx1") * (c("sx1") * c("sx22") - c("sx12") * c("sx2"))
        + c("sx2") * (c("sx1") * c("sx12") - c("sx11") * c("sx2"))
    )
    a3 = (
        c("sy") * (c("sx11") * c("sx22") - c("sx12") * c("sx12"))
        - c("sx1") * (c("sx1y") * c("sx22") - c("sx12") * c("sx2y"))
        + c("sx2") * (c("sx1y") * c("sx12") - c("sx11") * c("sx2y"))
    ) / den3
    b3 = (
        c("n") * (c("sx1y") * c("sx22") - c("sx12") * c("sx2y"))
        - c("sy") * (c("sx1") * c("sx22") - c("sx12") * c("sx2"))
        + c("sx2") * (c("sx1") * c("sx2y") - c("sx1y") * c("sx2"))
    ) / den3
    c3 = (
        c("n") * (c("sx11") * c("sx2y") - c("sx1y") * c("sx12"))
        - c("sx1") * (c("sx1") * c("sx2y") - c("sx1y") * c("sx2"))
        + c("sy") * (c("sx1") * c("sx12") - c("sx11") * c("sx2"))
    ) / den3
    br = (c("n") * c("sx1y") - c("sx1") * c("sy")) / (
        c("n") * c("sx11") - c("sx1") * c("sx1")
    )
    ar = (c("sy") - br * c("sx1")) / c("n")
    sse_r = c("syy") - ar * c("sy") - br * c("sx1y")
    sse_u = (
        c("syy") - a3 * c("sy") - b3 * c("sx1y") - c3 * c("sx2y")
    )
    return mom.select(
        F.col("n").cast("bigint").alias("n"),
        r6(c3 / 100.0 * 100.0).alias("beta_cross"),
        r6(sse_r / 1e8).alias("sse_restricted"),
        r6(sse_u / 1e8).alias("sse_unrestricted"),
        r6((sse_r - sse_u) / (sse_u / (c("n") - 3))).alias("granger_f"),
    )


# ---------------------------------------------------------------------------
# Q282 — Engle-Granger cointegration probe
# ---------------------------------------------------------------------------
# Stage 1: OLS purchases ~ clicks (levels, exact moments); stage
# 2: Dickey-Fuller on the residual — rho from sum(e_{t-1} de_t)/
# sum(e^2_{t-1}) with its t statistic.  Residuals are identical
# doubles in both engines because alpha/beta are moment ratios.
_Q282_DF_T = (
    "(num / den) / SQRT(((sdd - (num / den) * num) / (m - 1)) / den)"
)

_Q282_ORACLE = f"""
    WITH daily AS ({_DAILY_CP}),
    mom AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(kc) AS DOUBLE) AS sx,
             CAST(SUM(pc) AS DOUBLE) AS sy,
             CAST(SUM(kc * kc) AS DOUBLE) AS sxx,
             CAST(SUM(kc * pc) AS DOUBLE) AS sxy
      FROM daily
    ), beta AS (
      SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
             (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
               AS a
      FROM mom
    ), resid AS (
      SELECT d.day, d.pc - b.a - b.b * d.kc AS e
      FROM daily d CROSS JOIN beta b
    ), lagged AS (
      SELECT e, LAG(e) OVER (ORDER BY day) AS e1
      FROM resid
    ), df AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS m,
             SUM(e1 * (e - e1)) AS num,
             SUM(e1 * e1) AS den,
             SUM((e - e1) * (e - e1)) AS sdd
      FROM lagged WHERE e1 IS NOT NULL
    )
    SELECT CAST(m AS BIGINT) AS n_diffs,
           {_R6.format(x='num / den')} AS rho,
           {_R6.format(x=_Q282_DF_T)} AS df_t
    FROM df
"""


@register(
    "q282_engle_granger",
    _Q282_ORACLE,
    doc="Engle-Granger cointegration probe clicks/purchases: "
    "levels OLS from integer moments, Dickey-Fuller rho and t on "
    "the residual series (rho << 0 = residuals mean-revert = "
    "series co-move).  Two window-free moment passes plus one lag "
    "window.",
)
def q282(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_cp(spark, sf_dir).localCheckpoint(
        eager=False
    )  # moments + residual pass
    mom = daily.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("kc").cast("double").alias("sx"),
        F.sum("pc").cast("double").alias("sy"),
        F.sum(F.col("kc") * F.col("kc")).cast("double").alias("sxx"),
        F.sum(F.col("kc") * F.col("pc")).cast("double").alias("sxy"),
    )
    b = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    beta = mom.select(
        b.alias("b"),
        ((F.col("sy") - b * F.col("sx")) / F.col("n")).alias("a"),
    )
    resid = daily.crossJoin(F.broadcast(beta)).select(
        "day",
        (
            F.col("pc") - F.col("a") - F.col("b") * F.col("kc")
        ).alias("e"),
    )
    lagged = resid.select(
        "e", F.lag("e").over(Window.orderBy("day")).alias("e1")
    ).where(F.col("e1").isNotNull())
    df = lagged.agg(
        F.count(F.lit(1)).cast("double").alias("m"),
        F.sum(F.col("e1") * (F.col("e") - F.col("e1"))).alias("num"),
        F.sum(F.col("e1") * F.col("e1")).alias("den"),
        F.sum(
            (F.col("e") - F.col("e1")) * (F.col("e") - F.col("e1"))
        ).alias("sdd"),
    )
    rho = F.col("num") / F.col("den")
    se = F.sqrt(
        ((F.col("sdd") - rho * F.col("num")) / (F.col("m") - 1))
        / F.col("den")
    )
    return df.select(
        F.col("m").cast("bigint").alias("n_diffs"),
        r6(rho).alias("rho"),
        r6(rho / se).alias("df_t"),
    )


# ---------------------------------------------------------------------------
# Q283 — 1-D constant-velocity Kalman filter
# ---------------------------------------------------------------------------
# Level+velocity Kalman over daily revenue dollars per series:
# predict/update with fixed Q/R, state struct (x, v, p11, p12,
# p22, sse) folded over the cent-exact day array; the oracle
# replays the identical recurrence WITH RECURSIVE.
_Q283_Q = 0.5       # process noise (dollars^2)
_Q283_R = 10000.0   # measurement noise (dollars^2)

_Q283_PRED = """
      SELECT s.event_type, s.ys, s.tmax, s.t + 1 AS t,
             s.x + s.v AS xp, s.v AS vp,
             s.p11 + 2 * s.p12 + s.p22 + {q} AS q11,
             s.p12 + s.p22 AS q12,
             s.p22 + {q} AS q22,
             s.ys[s.t + 1] AS z, s.sse
      FROM state s WHERE s.t < s.tmax
"""

_Q283_ORACLE = f"""
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             ROUND(SUM(value), 2) AS y
      FROM events GROUP BY event_type, day
    ), ser AS (
      SELECT event_type, list(y ORDER BY day) AS ys,
             CAST(COUNT(*) AS BIGINT) AS tmax
      FROM daily GROUP BY event_type
    ), state AS (
      SELECT event_type, ys, tmax, 1 AS t,
             ys[1] AS x, CAST(0.0 AS DOUBLE) AS v,
             CAST(1e6 AS DOUBLE) AS p11,
             CAST(0.0 AS DOUBLE) AS p12,
             CAST(1e6 AS DOUBLE) AS p22,
             CAST(0.0 AS DOUBLE) AS sse
      FROM ser
      UNION ALL
      SELECT p.event_type, p.ys, p.tmax, p.t,
             p.xp + (p.q11 / (p.q11 + {_Q283_R})) * (p.z - p.xp) AS x,
             p.vp + (p.q12 / (p.q11 + {_Q283_R})) * (p.z - p.xp) AS v,
             (1 - p.q11 / (p.q11 + {_Q283_R})) * p.q11 AS p11,
             (1 - p.q11 / (p.q11 + {_Q283_R})) * p.q12 AS p12,
             p.q22 - (p.q12 / (p.q11 + {_Q283_R})) * p.q12 AS p22,
             p.sse + (p.z - p.xp) * (p.z - p.xp) AS sse
      FROM ({_Q283_PRED.format(q=_Q283_Q)}) p
    )
    SELECT event_type, CAST(tmax AS BIGINT) AS n_days,
           {_R6.format(x='x')} AS level,
           {_R6.format(x='v')} AS velocity,
           {_R6.format(x='SQRT(sse / (tmax - 1))')} AS innovation_rmse
    FROM state WHERE t = tmax
    ORDER BY event_type
"""


@register(
    "q283_kalman",
    _Q283_ORACLE,
    doc="1-D constant-velocity Kalman filter on daily revenue per "
    "series: predict/update recurrence with fixed Q/R folded as a "
    "(x, v, P, sse) struct over the cent-exact bounded day array; "
    "final level/velocity and innovation RMSE.  The optimal linear "
    "tracker without any matrix library.",
)
def q283(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value"), 2).alias("y")
    )
    ser = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "y"))).alias("pts")
    )
    ys = F.transform(F.col("pts"), lambda s: s["y"])
    q, r = _Q283_Q, _Q283_R
    init = F.struct(
        F.element_at(ys, 1).alias("x"),
        F.lit(0.0).alias("v"),
        F.lit(1e6).alias("p11"),
        F.lit(0.0).alias("p12"),
        F.lit(1e6).alias("p22"),
        F.lit(0.0).alias("sse"),
    )

    def _merge(acc, z):
        xp = acc["x"] + acc["v"]
        q11 = acc["p11"] + 2 * acc["p12"] + acc["p22"] + q
        q12 = acc["p12"] + acc["p22"]
        q22 = acc["p22"] + q
        k1 = q11 / (q11 + r)
        k2 = q12 / (q11 + r)
        innov = z - xp
        return F.struct(
            (xp + k1 * innov).alias("x"),
            (acc["v"] + k2 * innov).alias("v"),
            ((F.lit(1.0) - k1) * q11).alias("p11"),
            ((F.lit(1.0) - k1) * q12).alias("p12"),
            (q22 - k2 * q12).alias("p22"),
            (acc["sse"] + innov * innov).alias("sse"),
        )

    st = F.aggregate(
        F.slice(ys, 2, F.size(ys) - 1), init, _merge
    )
    return (
        ser.select(
            "event_type",
            F.size("pts").cast("bigint").alias("n_days"),
            st.alias("st"),
        )
        .select(
            "event_type",
            "n_days",
            r6(F.col("st.x")).alias("level"),
            r6(F.col("st.v")).alias("velocity"),
            r6(
                F.sqrt(
                    F.col("st.sse")
                    / (F.col("n_days") - 1).cast("double")
                )
            ).alias("innovation_rmse"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Q284 — Seasonal and trend strength (decomposition F-measures)
# ---------------------------------------------------------------------------
# Centered 7-day moving-average trend (full windows only),
# weekday-mean seasonal of the detrended series, residual — then
# F_seasonal = max(0, 1 - var(R)/var(S+R)) and the trend analogue.
# Cent-exact inputs; variances from sums over the bounded daily
# relation.
_Q284_ORACLE = """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS y
      FROM events GROUP BY event_type, day
    ), tr AS (
      SELECT event_type, day, y,
             CASE WHEN COUNT(*) OVER w7 = 7
                  THEN SUM(y) OVER w7 / 7.0 END AS trend
      FROM daily
      WINDOW w7 AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), det AS MATERIALIZED (
      SELECT event_type, day, y, trend,
             y - trend AS detr,
             CAST(EXTRACT(isodow FROM day) AS BIGINT) AS dow
      FROM tr WHERE trend IS NOT NULL
    ), seas AS (
      SELECT event_type, dow, AVG(detr) AS s
      FROM det GROUP BY event_type, dow
    ), parts AS (
      SELECT d.event_type, d.detr, d.detr - s.s AS resid,
             d.y - s.s AS deseason
      FROM det d JOIN seas s
        ON s.event_type = d.event_type AND s.dow = d.dow
    ), v AS (
      SELECT event_type,
             CAST(COUNT(*) AS DOUBLE) AS n,
             SUM(resid * resid) / COUNT(*)
               - (SUM(resid) / COUNT(*)) * (SUM(resid) / COUNT(*))
               AS var_r,
             SUM(detr * detr) / COUNT(*)
               - (SUM(detr) / COUNT(*)) * (SUM(detr) / COUNT(*))
               AS var_sr,
             SUM(deseason * deseason) / COUNT(*)
               - (SUM(deseason) / COUNT(*)) * (SUM(deseason) / COUNT(*))
               AS var_tr
      FROM parts GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           {F_SEAS} AS f_seasonal,
           {F_TREND} AS f_trend
    FROM v ORDER BY event_type
""".replace(
    "{F_SEAS}", R6_SQL.format(x="GREATEST(0.0, 1.0 - var_r / var_sr)")
).replace(
    "{F_TREND}", R6_SQL.format(x="GREATEST(0.0, 1.0 - var_r / var_tr)")
)


@register(
    "q284_seasonal_strength",
    _Q284_ORACLE,
    doc="Seasonal and trend strength per series: centered 7-day MA "
    "trend (full windows), weekday-mean seasonal of the detrended "
    "series, F = max(0, 1 - var(residual)/var(component+residual)) "
    "— the model-free 'is there a weekly cycle / a trend' "
    "quantifier pair.",
)
def q284(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value") * 100, 0).cast("bigint").alias("y")
    )
    w7 = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    )
    tr = daily.select(
        "event_type",
        "day",
        "y",
        F.when(
            F.count(F.lit(1)).over(w7) == 7, F.sum("y").over(w7) / 7.0
        ).alias("trend"),
    )
    det = tr.where(F.col("trend").isNotNull()).select(
        "event_type",
        "y",
        (F.col("y") - F.col("trend")).alias("detr"),
        F.dayofweek("day").alias("dow0"),
    ).localCheckpoint(eager=False)  # seasonal means + parts
    seas = det.groupBy(
        F.col("event_type").alias("se"), F.col("dow0").alias("sdow")
    ).agg(F.avg("detr").alias("s"))
    parts = det.join(
        F.broadcast(seas),
        (F.col("event_type") == F.col("se"))
        & (F.col("dow0") == F.col("sdow")),
    ).select(
        "event_type",
        "detr",
        (F.col("detr") - F.col("s")).alias("resid"),
        (F.col("y") - F.col("s")).alias("deseason"),
    )

    def pvar(cname: str):
        return F.sum(F.col(cname) * F.col(cname)) / F.count(
            F.lit(1)
        ) - (F.sum(cname) / F.count(F.lit(1))) * (
            F.sum(cname) / F.count(F.lit(1))
        )

    v = parts.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        pvar("resid").alias("var_r"),
        pvar("detr").alias("var_sr"),
        pvar("deseason").alias("var_tr"),
    )
    return v.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        r6(
            F.greatest(
                F.lit(0.0), 1.0 - F.col("var_r") / F.col("var_sr")
            )
        ).alias("f_seasonal"),
        r6(
            F.greatest(
                F.lit(0.0), 1.0 - F.col("var_r") / F.col("var_tr")
            )
        ).alias("f_trend"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Q285 — Outlier-rule ensemble (z / MAD / IQR votes)
# ---------------------------------------------------------------------------
# Three classic univariate outlier rules vote on each day's
# revenue: |z| > 2 (moment-based), |y - median|/MAD > 2.5 (robust),
# outside 1.5*IQR fences (quartile-based).  Days with >= 2 votes
# are flagged — the ensemble screen that survives any single
# rule's failure mode.
_Q285_ORACLE = """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS y
      FROM events GROUP BY event_type, day
    ), stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(y) AS sy, SUM(y * y) AS syy,
             quantile_cont(y, 0.25) AS q1,
             quantile_cont(y, 0.5) AS med,
             quantile_cont(y, 0.75) AS q3
      FROM daily GROUP BY event_type
    ), mad AS (
      SELECT d.event_type,
             quantile_cont(ABS(d.y - s.med), 0.5) AS mad
      FROM daily d JOIN stats s ON s.event_type = d.event_type
      GROUP BY d.event_type
    ), votes AS (
      SELECT d.event_type, d.day, d.y,
             CASE WHEN ABS(d.y - CAST(s.sy AS DOUBLE) / s.n)
                       / SQRT((CAST(s.n AS DOUBLE) * s.syy
                               - CAST(s.sy AS DOUBLE) * s.sy)
                              / (CAST(s.n AS DOUBLE) * (s.n - 1)))
                       > 2.0
                  THEN 1 ELSE 0 END
             + CASE WHEN ABS(d.y - s.med) / m.mad > 2.5
                    THEN 1 ELSE 0 END
             + CASE WHEN d.y < s.q1 - 1.5 * (s.q3 - s.q1)
                      OR d.y > s.q3 + 1.5 * (s.q3 - s.q1)
                    THEN 1 ELSE 0 END AS votes
      FROM daily d
      JOIN stats s ON s.event_type = d.event_type
      JOIN mad m ON m.event_type = d.event_type
    )
    SELECT event_type, day,
           ROUND(y / 100.0 + 5e-10, 2) AS revenue,
           CAST(votes AS BIGINT) AS votes
    FROM votes WHERE votes >= 2
    ORDER BY event_type, day
"""


@register(
    "q285_outlier_votes",
    _Q285_ORACLE,
    doc="Univariate outlier ensemble on daily revenue: z-score, "
    "MAD, and IQR-fence rules each vote, days with >= 2 votes "
    "flagged.  Exact cent inputs; the quantile thresholds share "
    "both engines' interpolation arithmetic.  The screen that "
    "survives any single rule's failure mode.",
)
def q285(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value") * 100, 0).cast("bigint").alias("y")
    ).localCheckpoint(eager=False)  # stats + mad + votes
    stats = daily.groupBy(F.col("event_type").alias("se")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.percentile("y", F.lit(0.25)).alias("q1"),
        F.percentile("y", F.lit(0.5)).alias("med"),
        F.percentile("y", F.lit(0.75)).alias("q3"),
    )
    mad = (
        daily.join(
            F.broadcast(stats), F.col("event_type") == F.col("se")
        )
        .groupBy(F.col("event_type").alias("me"))
        .agg(
            F.percentile(
                F.abs(F.col("y") - F.col("med")), F.lit(0.5)
            ).alias("mad")
        )
    )
    nd = F.col("n").cast("double")
    sigma = F.sqrt(
        (nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
        / (nd * (F.col("n") - 1))
    )
    v_z = F.when(
        F.abs(F.col("y") - F.col("sy").cast("double") / F.col("n"))
        / sigma
        > 2.0,
        1,
    ).otherwise(0)
    v_mad = F.when(
        F.abs(F.col("y") - F.col("med")) / F.col("mad") > 2.5, 1
    ).otherwise(0)
    iqr = F.col("q3") - F.col("q1")
    v_iqr = F.when(
        (F.col("y") < F.col("q1") - 1.5 * iqr)
        | (F.col("y") > F.col("q3") + 1.5 * iqr),
        1,
    ).otherwise(0)
    votes = (
        daily.join(
            F.broadcast(stats), F.col("event_type") == F.col("se")
        )
        .join(F.broadcast(mad), F.col("event_type") == F.col("me"))
        .select(
            "event_type",
            "day",
            "y",
            (v_z + v_mad + v_iqr).alias("votes"),
        )
    )
    return (
        votes.where(F.col("votes") >= 2)
        .select(
            "event_type",
            "day",
            F.round(F.col("y") / 100.0 + 5e-10, 2).alias("revenue"),
            F.col("votes").cast("bigint").alias("votes"),
        )
        .orderBy("event_type", "day")
    )
