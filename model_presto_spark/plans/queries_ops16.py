"""Conformance queries: round-7 operator batch #10 (q261+) —
advanced time-series diagnostics: Bass diffusion fit, runs test,
permutation entropy, Hurst exponent (R/S), periodogram probe.

Parity: every series is first reduced to exact integers (daily
counts / cents); regressions use the Cramer-on-integer-moments
pattern (q237); trig/log expressions are written
operation-for-operation identically in both engines."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import R6_SQL, _t, r6, register

_R6 = R6_SQL


# ---------------------------------------------------------------------------
# Q261 — Bass diffusion model fit (adoption forecasting)
# ---------------------------------------------------------------------------
# Fit n_t = a + b N_{t-1} + c N_{t-1}^2 (the discrete Bass model)
# on daily signup counts by 3-param OLS — Cramer's rule on exact
# integer moments (cumulative adopters N are integers) — then
# recover market size m (root of c m^2 + b m + a), innovation
# p = a/m, imitation q = b + p.
_Q261_ORACLE = """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n_t
      FROM events WHERE event_type = 'signup' GROUP BY day
    ), cum AS (
      SELECT day, n_t,
             COALESCE(SUM(n_t) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_prev
      FROM daily
    ), mom AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(n_prev) AS DOUBLE) AS sx1,
             CAST(SUM(n_prev * n_prev) AS DOUBLE) AS sx2,
             CAST(SUM(n_prev * n_prev) AS DOUBLE) AS sx11,
             CAST(SUM(n_prev * n_prev * n_prev) AS DOUBLE) AS sx12,
             CAST(SUM(n_prev * n_prev * n_prev * n_prev) AS DOUBLE)
               AS sx22,
             CAST(SUM(n_t) AS DOUBLE) AS sy,
             CAST(SUM(n_prev * n_t) AS DOUBLE) AS sx1y,
             CAST(SUM(n_prev * n_prev * n_t) AS DOUBLE) AS sx2y
      FROM cum
    ), beta AS (
      SELECT
        (sy * (sx11 * sx22 - sx12 * sx12)
         - sx1 * (sx1y * sx22 - sx12 * sx2y)
         + sx2 * (sx1y * sx12 - sx11 * sx2y))
        / (n * (sx11 * sx22 - sx12 * sx12)
           - sx1 * (sx1 * sx22 - sx12 * sx2)
           + sx2 * (sx1 * sx12 - sx11 * sx2)) AS a,
        (n * (sx1y * sx22 - sx12 * sx2y)
         - sy * (sx1 * sx22 - sx12 * sx2)
         + sx2 * (sx1 * sx2y - sx1y * sx2))
        / (n * (sx11 * sx22 - sx12 * sx12)
           - sx1 * (sx1 * sx22 - sx12 * sx2)
           + sx2 * (sx1 * sx12 - sx11 * sx2)) AS b,
        (n * (sx11 * sx2y - sx1y * sx12)
         - sx1 * (sx1 * sx2y - sx1y * sx2)
         + sy * (sx1 * sx12 - sx11 * sx2))
        / (n * (sx11 * sx22 - sx12 * sx12)
           - sx1 * (sx1 * sx22 - sx12 * sx2)
           + sx2 * (sx1 * sx12 - sx11 * sx2)) AS c
      FROM mom
    )
    , root AS (
      SELECT a, b, c,
             CASE WHEN b * b - 4 * a * c >= 0
                  THEN (-b - SQRT(b * b - 4 * a * c)) / (2 * c)
             END AS m
      FROM beta
    )
    SELECT ROUND(a + 5e-12, 6) AS coef_a,
           ROUND(b + 5e-12, 6) AS coef_b,
           ROUND(c + 5e-12, 6) AS coef_c,
           ROUND(m + 5e-12, 6) AS market_size_m,
           ROUND(a / m + 5e-12, 6) AS p_innovation,
           ROUND(b + a / m + 5e-12, 6) AS q_imitation
    FROM root
"""


@register(
    "q261_bass_diffusion",
    _Q261_ORACLE,
    doc="Bass diffusion fit on daily signups: n_t = a + b N + c N^2 "
    "by Cramer's rule on exact integer cumulative-adopter moments, "
    "market size from the quadratic root, p/q innovation-imitation "
    "split.  The adoption-forecasting classic as one aggregation + "
    "scalar algebra.",
)
def q261(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("event_type") == "signup")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_t"))
    )
    w = Window.orderBy("day")
    cum = daily.select(
        "n_t",
        F.coalesce(
            F.sum("n_t").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("n_prev"),
    )
    np_ = F.col("n_prev")
    mom = cum.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(np_).cast("double").alias("sx1"),
        F.sum(np_ * np_).cast("double").alias("sx2"),
        F.sum(np_ * np_).cast("double").alias("sx11"),
        F.sum(np_ * np_ * np_).cast("double").alias("sx12"),
        F.sum(np_ * np_ * np_ * np_).cast("double").alias("sx22"),
        F.sum("n_t").cast("double").alias("sy"),
        F.sum(np_ * F.col("n_t")).cast("double").alias("sx1y"),
        F.sum(np_ * np_ * F.col("n_t")).cast("double").alias("sx2y"),
    )
    c_ = F.col
    det = (
        c_("n") * (c_("sx11") * c_("sx22") - c_("sx12") * c_("sx12"))
        - c_("sx1") * (c_("sx1") * c_("sx22") - c_("sx12") * c_("sx2"))
        + c_("sx2") * (c_("sx1") * c_("sx12") - c_("sx11") * c_("sx2"))
    )
    a = (
        c_("sy") * (c_("sx11") * c_("sx22") - c_("sx12") * c_("sx12"))
        - c_("sx1") * (c_("sx1y") * c_("sx22") - c_("sx12") * c_("sx2y"))
        + c_("sx2") * (c_("sx1y") * c_("sx12") - c_("sx11") * c_("sx2y"))
    ) / det
    b = (
        c_("n") * (c_("sx1y") * c_("sx22") - c_("sx12") * c_("sx2y"))
        - c_("sy") * (c_("sx1") * c_("sx22") - c_("sx12") * c_("sx2"))
        + c_("sx2") * (c_("sx1") * c_("sx2y") - c_("sx1y") * c_("sx2"))
    ) / det
    cc = (
        c_("n") * (c_("sx11") * c_("sx2y") - c_("sx1y") * c_("sx12"))
        - c_("sx1") * (c_("sx1") * c_("sx2y") - c_("sx1y") * c_("sx2"))
        + c_("sy") * (c_("sx1") * c_("sx12") - c_("sx11") * c_("sx2"))
    ) / det
    beta = mom.select(a.alias("a"), b.alias("b"), cc.alias("c"))
    # Degenerate (pre-saturation) series have a negative discriminant:
    # NULL the Bass parameters then — DuckDB raises on sqrt(<0) where
    # Spark would return NaN, so the guard must live in BOTH plans.
    disc = F.col("b") * F.col("b") - 4 * F.col("a") * F.col("c")
    m = F.when(
        disc >= 0, (-F.col("b") - F.sqrt(disc)) / (2 * F.col("c"))
    )
    return beta.select(
        r6(F.col("a")).alias("coef_a"),
        r6(F.col("b")).alias("coef_b"),
        r6(F.col("c")).alias("coef_c"),
        r6(m).alias("market_size_m"),
        r6(F.col("a") / m).alias("p_innovation"),
        r6(F.col("b") + F.col("a") / m).alias("q_imitation"),
    )


# ---------------------------------------------------------------------------
# Q262 — Wald-Wolfowitz runs test (randomness of up/down days)
# ---------------------------------------------------------------------------
# Is the daily revenue direction sequence random?  Runs of +/-
# signs counted by a lag window, exact mean/variance of the run
# count from integer (n_plus, n_minus), normal z.
_Q262_ORACLE = """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS cents
      FROM events GROUP BY event_type, day
    ), chg AS (
      SELECT event_type, day,
             CASE WHEN cents - LAG(cents) OVER w > 0 THEN 1 ELSE 0 END
               AS up,
             LAG(cents) OVER w IS NOT NULL AS has_prev
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ), signs AS (
      SELECT event_type, day, up,
             CASE WHEN LAG(up) OVER (PARTITION BY event_type
                                     ORDER BY day) IS DISTINCT FROM up
                  THEN 1 ELSE 0 END AS new_run
      FROM chg WHERE has_prev
    ), stat AS (
      SELECT event_type,
             CAST(SUM(new_run) AS BIGINT) AS runs,
             CAST(SUM(up) AS BIGINT) AS n1,
             CAST(SUM(1 - up) AS BIGINT) AS n2
      FROM signs GROUP BY event_type
    )
    SELECT event_type, runs, n1, n2,
           ROUND(1.0 + 2.0 * n1 * n2 / (n1 + n2) + 5e-12, 6)
             AS expected_runs,
           ROUND((runs - (1.0 + 2.0 * n1 * n2 / (n1 + n2)))
                 / SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / ((CAST(n1 + n2 AS DOUBLE))
                           * (n1 + n2) * (n1 + n2 - 1)))
                 + 5e-12, 6) AS runs_z
    FROM stat ORDER BY event_type
"""


@register(
    "q262_runs_test",
    _Q262_ORACLE,
    doc="Wald-Wolfowitz runs test on daily up/down revenue "
    "directions per series: run count via a lag window, exact "
    "integer n_plus/n_minus, closed-form mean/variance, normal z. "
    "The is-the-sequence-random check.",
)
def q262(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value") * 100, 0).cast("bigint").alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    chg = daily.select(
        "event_type",
        "day",
        F.when(F.col("cents") - F.lag("cents").over(w) > 0, 1)
        .otherwise(0)
        .alias("up"),
        F.lag("cents").over(w).isNotNull().alias("has_prev"),
    )
    signs = chg.where(F.col("has_prev")).select(
        "event_type",
        "up",
        F.when(
            ~F.lag("up")
            .over(Window.partitionBy("event_type").orderBy("day"))
            .eqNullSafe(F.col("up")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    stat = signs.groupBy("event_type").agg(
        F.sum("new_run").alias("runs"),
        F.sum("up").alias("n1"),
        F.sum(1 - F.col("up")).alias("n2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    mu = 1.0 + 2.0 * n1 * n2 / (n1 + n2)
    var = (
        2.0
        * n1
        * n2
        * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2).cast("double") * (n1 + n2) * (n1 + n2 - 1))
    )
    return stat.select(
        "event_type",
        "runs",
        "n1",
        "n2",
        r6(mu).alias("expected_runs"),
        r6((F.col("runs") - mu) / F.sqrt(var)).alias("runs_z"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Q263 — Permutation entropy (order-3 ordinal patterns)
# ---------------------------------------------------------------------------
# Complexity of each daily series: classify every sliding window
# of 3 days into one of 6 ordinal patterns (exact integer
# comparisons, lexicographic tie rule), normalized Shannon entropy
# of the pattern distribution.
_Q263_PAT = (
    "CASE WHEN y0 <= y1 AND y1 <= y2 THEN '012' "
    "WHEN y0 <= y2 AND y2 < y1 THEN '021' "
    "WHEN y1 < y0 AND y0 <= y2 THEN '102' "
    "WHEN y1 <= y2 AND y2 < y0 THEN '120' "
    "WHEN y2 < y0 AND y0 <= y1 THEN '201' "
    "ELSE '210' END"
)

_Q263_ORACLE = f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS y0
      FROM events GROUP BY event_type, day
    ), win AS (
      SELECT event_type, y0,
             LEAD(y0, 1) OVER w AS y1,
             LEAD(y0, 2) OVER w AS y2
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ), pat AS (
      SELECT event_type, {_Q263_PAT} AS pattern
      FROM win WHERE y2 IS NOT NULL
    ), cnt AS (
      SELECT event_type, pattern, CAST(COUNT(*) AS BIGINT) AS c
      FROM pat GROUP BY event_type, pattern
    ), shr AS (
      SELECT event_type, c,
             SUM(c) OVER (PARTITION BY event_type) AS nw
      FROM cnt
    ), ent AS (
      SELECT event_type,
             CAST(MAX(nw) AS BIGINT) AS n_windows,
             CAST(COUNT(*) AS BIGINT) AS n_patterns,
             -SUM((CAST(c AS DOUBLE) / nw)
                  * ln(CAST(c AS DOUBLE) / nw)) AS h
      FROM shr GROUP BY event_type
    )
    SELECT event_type, n_windows, n_patterns,
           {_R6.format(x='h / ln(6.0)')} AS perm_entropy
    FROM ent ORDER BY event_type
"""


@register(
    "q263_permutation_entropy",
    _Q263_ORACLE,
    doc="Order-3 permutation entropy per daily series: every "
    "3-window classified into an ordinal pattern by exact integer "
    "comparisons, normalized Shannon entropy of the 6-pattern "
    "distribution.  High = noise-like, low = structured — the "
    "complexity screen.",
)
def q263(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value") * 100, 0).cast("bigint").alias("y0")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    win = daily.select(
        "event_type",
        "y0",
        F.lead("y0", 1).over(w).alias("y1"),
        F.lead("y0", 2).over(w).alias("y2"),
    ).where(F.col("y2").isNotNull())
    y0, y1, y2 = F.col("y0"), F.col("y1"), F.col("y2")
    pattern = (
        F.when((y0 <= y1) & (y1 <= y2), "012")
        .when((y0 <= y2) & (y2 < y1), "021")
        .when((y1 < y0) & (y0 <= y2), "102")
        .when((y1 <= y2) & (y2 < y0), "120")
        .when((y2 < y0) & (y0 <= y1), "201")
        .otherwise("210")
    )
    cnt = win.select("event_type", pattern.alias("pattern")).groupBy(
        "event_type", "pattern"
    ).agg(F.count(F.lit(1)).alias("c"))
    wp = Window.partitionBy("event_type")
    p = F.col("c").cast("double") / F.sum("c").over(wp)
    ent = cnt.select(
        "event_type", "c", (-p * F.log(p)).alias("term")
    ).groupBy("event_type").agg(
        F.sum("c").alias("n_windows"),
        F.count(F.lit(1)).alias("n_patterns"),
        F.sum("term").alias("h"),
    )
    import math

    return ent.select(
        "event_type",
        "n_windows",
        "n_patterns",
        r6(F.col("h") / math.log(6.0)).alias("perm_entropy"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Q264 — Hurst exponent via rescaled range (R/S) analysis
# ---------------------------------------------------------------------------
# Long-memory estimate per series: for block sizes {5, 10, 15},
# split the 30-day series into blocks, compute the rescaled range
# R/S per block from cumulative deviations, average per size,
# then the log-log slope over the three sizes.  Cents are exact;
# the per-block windows run over the tiny daily relation.
_Q264_SIZES = (5, 10, 15)

_Q264_ORACLE = """
    WITH daily AS MATERIALIZED (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS y
      FROM events GROUP BY event_type, day
    ), idx AS MATERIALIZED (
      SELECT event_type, y,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
               - 1 AS t
      FROM daily
    ), sized AS (
      SELECT i.event_type, s.m, CAST(FLOOR(i.t / s.m) AS BIGINT) AS blk,
             i.t, i.y
      FROM idx i, (SELECT UNNEST([5, 10, 15]) AS m) s
      WHERE i.t < s.m * FLOOR(30 / s.m)
    ), bstat AS (
      SELECT event_type, m, blk,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM sized GROUP BY event_type, m, blk
    ), dev AS (
      SELECT s.event_type, s.m, s.blk,
             SUM(s.y - CAST(b.sy AS DOUBLE) / b.n)
               OVER (PARTITION BY s.event_type, s.m, s.blk
                     ORDER BY s.t ROWS UNBOUNDED PRECEDING) AS cdev,
             CAST(b.n AS BIGINT) AS n,
             CAST(b.sy AS BIGINT) AS sy, CAST(b.syy AS BIGINT) AS syy
      FROM sized s JOIN bstat b
        ON b.event_type = s.event_type AND b.m = s.m AND b.blk = s.blk
    ), rs AS (
      SELECT event_type, m, blk,
             (MAX(cdev) - MIN(cdev))
             / SQRT(CAST(MAX(syy) AS DOUBLE) / MAX(n)
                    - (CAST(MAX(sy) AS DOUBLE) / MAX(n))
                      * (CAST(MAX(sy) AS DOUBLE) / MAX(n))) AS rs_b
      FROM dev GROUP BY event_type, m, blk
    ), per_size AS (
      SELECT event_type, m,
             ln(AVG(rs_b)) AS ly, ln(CAST(m AS DOUBLE)) AS lx
      FROM rs GROUP BY event_type, m
    ), fit AS (
      SELECT event_type,
             CAST(COUNT(*) AS DOUBLE) AS k,
             SUM(lx) AS sx, SUM(ly) AS sy2,
             SUM(lx * lx) AS sxx, SUM(lx * ly) AS sxy
      FROM per_size GROUP BY event_type
    )
    SELECT event_type,
           ROUND((k * sxy - sx * sy2) / (k * sxx - sx * sx) + 5e-12, 6)
             AS hurst
    FROM fit ORDER BY event_type
"""


@register(
    "q264_hurst",
    _Q264_ORACLE,
    doc="Hurst exponent by rescaled-range analysis: block sizes "
    "{5,10,15} over the daily-cents series, R/S per block from "
    "cumulative-deviation windows, log-log slope of the mean R/S. "
    "H>0.5 = trending, <0.5 = mean-reverting — the long-memory "
    "diagnostic.",
)
def q264(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value") * 100, 0).cast("bigint").alias("y")
    )
    idx = daily.select(
        "event_type",
        "y",
        (
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("day")
            )
            - 1
        ).alias("t"),
    ).localCheckpoint(eager=False)  # the 3-size fan-out reuse
    sizes = idx.sparkSession.range(0, 3).select(
        F.element_at(
            F.array(*[F.lit(m) for m in _Q264_SIZES]), F.col("id").cast("int") + 1
        ).alias("m")
    )
    sized = (
        idx.crossJoin(F.broadcast(sizes))
        .where(F.col("t") < F.col("m") * F.floor(30 / F.col("m")))
        .select(
            "event_type",
            "m",
            F.floor(F.col("t") / F.col("m")).cast("bigint").alias("blk"),
            "t",
            "y",
        )
    )
    bstat = sized.groupBy("event_type", "m", "blk").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    dev = sized.join(
        bstat.select(
            F.col("event_type").alias("be"),
            F.col("m").alias("bm"),
            F.col("blk").alias("bb"),
            "n",
            "sy",
            "syy",
        ),
        (F.col("event_type") == F.col("be"))
        & (F.col("m") == F.col("bm"))
        & (F.col("blk") == F.col("bb")),
    ).select(
        "event_type",
        "m",
        "blk",
        "t",
        (F.col("y") - F.col("sy").cast("double") / F.col("n")).alias(
            "d"
        ),
        "n",
        "sy",
        "syy",
    )
    wc = (
        Window.partitionBy("event_type", "m", "blk")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cdev = dev.select(
        "event_type",
        "m",
        "blk",
        F.sum("d").over(wc).alias("cdev"),
        "n",
        "sy",
        "syy",
    )
    rng = F.max("cdev") - F.min("cdev")
    std = F.sqrt(
        F.max("syy").cast("double") / F.max("n")
        - (F.max("sy").cast("double") / F.max("n"))
        * (F.max("sy").cast("double") / F.max("n"))
    )
    rs = cdev.groupBy("event_type", "m", "blk").agg(
        (rng / std).alias("rs_b")
    )
    per_size = rs.groupBy("event_type", "m").agg(
        F.log(F.avg("rs_b")).alias("ly"),
        F.log(F.max(F.col("m").cast("double"))).alias("lx"),
    )
    fit = per_size.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy2"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
    )
    hurst = (
        F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy2")
    ) / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return fit.select(
        "event_type", r6(hurst).alias("hurst")
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Q265 — Periodogram probe (DFT power at candidate periods)
# ---------------------------------------------------------------------------
# Detect the weekly cycle: DFT power at periods {7, 3.5, 2} days
# via cos/sin projections of the centered daily-cents series —
# trig of identical doubles, moments exact.  Power normalized by
# total variance.
_Q265_PERIODS = (7.0, 3.5, 2.0)
_Q265_PI = 3.141592653589793

_Q265_ORACLE = f"""
    WITH daily AS MATERIALIZED (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS y
      FROM events GROUP BY event_type, day
    ), idx AS (
      SELECT event_type, y,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY day) - 1 AS BIGINT) AS t
      FROM daily
    ), proj AS (
      SELECT i.event_type, p.period,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(i.y * cos(2 * {_Q265_PI} * i.t / p.period)) AS sc,
             SUM(i.y * sin(2 * {_Q265_PI} * i.t / p.period)) AS ss,
             SUM(i.y) AS sy, SUM(i.y * i.y) AS syy
      FROM idx i, (SELECT UNNEST([7.0, 3.5, 2.0]) AS period) p
      GROUP BY i.event_type, p.period
    )
    SELECT event_type, CAST(period AS DOUBLE) AS period,
           ROUND((sc * sc + ss * ss) / (CAST(n AS DOUBLE) * n) / 10000.0
                 + 5e-10, 2) AS power,
           ROUND(((sc * sc + ss * ss) / (CAST(n AS DOUBLE) * n))
                 / ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)
                    / n)
                 + 5e-12, 6) AS power_share
    FROM proj ORDER BY event_type, period
"""


@register(
    "q265_periodogram",
    _Q265_ORACLE,
    doc="Periodogram probe at candidate periods {7, 3.5, 2} days: "
    "cos/sin projections of the daily-cents series in the same "
    "aggregation that collects the variance moments (one pass), "
    "power normalized by variance.  Finds the weekly cycle without "
    "an FFT.",
)
def q265(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value") * 100, 0).cast("bigint").alias("y")
    )
    idx = daily.select(
        "event_type",
        "y",
        (
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("day")
            )
            - 1
        ).cast("bigint").alias("t"),
    )
    periods = idx.sparkSession.range(0, 3).select(
        F.element_at(
            F.array(*[F.lit(p) for p in _Q265_PERIODS]),
            F.col("id").cast("int") + 1,
        ).alias("period")
    )
    ang = 2 * _Q265_PI * F.col("t") / F.col("period")
    proj = (
        idx.crossJoin(F.broadcast(periods))
        .groupBy("event_type", "period")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("y") * F.cos(ang)).alias("sc"),
            F.sum(F.col("y") * F.sin(ang)).alias("ss"),
            F.sum("y").alias("sy"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
    )
    nd = F.col("n").cast("double")
    power = (F.col("sc") * F.col("sc") + F.col("ss") * F.col("ss")) / (
        nd * F.col("n")
    )
    var = (
        F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy") / F.col("n")
    ) / F.col("n")
    return proj.select(
        "event_type",
        F.col("period").cast("double").alias("period"),
        F.round(power / 10000.0 + 5e-10, 2).alias("power"),
        r6(power / var).alias("power_share"),
    ).orderBy("event_type", "period")
