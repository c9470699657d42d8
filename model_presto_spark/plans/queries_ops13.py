"""Conformance queries: round-7 operator batch #7 (q246+) — one-way
ANOVA + Levene + ICC, 1-D Wasserstein distance, Mann-Kendall trend
test, binary-segmentation changepoint, quantile treatment effects.

Parity: ANOVA/Mann-Kendall/changepoint are derived from exact
integer moments (cents / counts / pairwise sign sums); Wasserstein
integrates |CDF difference| over the quantized support with
rational CDFs; QTE uses the engines' shared linear-interpolation
percentile arithmetic (q14 precedent)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import R6_SQL, _t, r6, register

_R6 = R6_SQL


# ---------------------------------------------------------------------------
# Q246 — One-way ANOVA F, Levene's W, and ICC(1) across event types
# ---------------------------------------------------------------------------
# Are per-event-type value distributions distinguishable?  F and
# ICC come from exact integer cent moments (SSB/SSW via
# n*Sxx - Sx^2 algebra); Levene's W re-runs the same ANOVA on
# |y - group mean| deviations (rational means -> identical doubles).
_Q246_ORACLE = """
    WITH obs AS (
      SELECT event_type AS g,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS y
      FROM events
    ), grp AS MATERIALIZED (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
             SUM(y) AS s_g, SUM(y * y) AS ss_g
      FROM obs GROUP BY g
    ), tot AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             SUM(s_g) AS s, SUM(ss_g) AS ss,
             SUM(CAST(s_g AS DOUBLE) * s_g / n_g) AS sb_raw
      FROM grp
    ), dev AS (
      SELECT o.g, ABS(o.y - CAST(gr.s_g AS DOUBLE) / gr.n_g) AS z
      FROM obs o JOIN grp gr ON gr.g = o.g
    ), zgrp AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
             SUM(z) AS sz_g, SUM(z * z) AS ssz_g
      FROM dev GROUP BY g
    ), ztot AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             SUM(sz_g) AS s, SUM(ssz_g) AS ss,
             SUM(sz_g * sz_g / n_g) AS sb_raw
      FROM zgrp
    )
    SELECT t.n, t.k,
           ROUND(((t.sb_raw - CAST(t.s AS DOUBLE) * t.s / t.n)
                  / (t.k - 1))
                 / ((CAST(t.ss AS DOUBLE) - t.sb_raw) / (t.n - t.k))
                 + 5e-12, 6) AS anova_f,
           ROUND(((z.sb_raw - z.s * z.s / z.n) / (z.k - 1))
                 / ((z.ss - z.sb_raw) / (z.n - z.k))
                 + 5e-12, 6) AS levene_w,
           ROUND((((t.sb_raw - CAST(t.s AS DOUBLE) * t.s / t.n)
                   / (t.k - 1))
                  - ((CAST(t.ss AS DOUBLE) - t.sb_raw) / (t.n - t.k)))
                 / (((t.sb_raw - CAST(t.s AS DOUBLE) * t.s / t.n)
                     / (t.k - 1))
                    + (CAST(t.n AS DOUBLE) / t.k - 1)
                      * ((CAST(t.ss AS DOUBLE) - t.sb_raw)
                         / (t.n - t.k)))
                 + 5e-12, 6) AS icc1
    FROM tot t CROSS JOIN ztot z
"""


@register(
    "q246_anova_levene",
    _Q246_ORACLE,
    doc="One-way ANOVA F, Levene's W (ANOVA on absolute deviations "
    "from group means), and ICC(1) across event types on value "
    "cents.  Group integer moments in one shuffle; Levene adds one "
    "broadcast join + a second moment pass.  The "
    "do-the-groups-differ triple.",
)
def q246(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    obs = ev.select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("y"),
    )
    grp = obs.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("y").alias("s_g"),
        F.sum(F.col("y") * F.col("y")).alias("ss_g"),
    ).localCheckpoint(eager=False)  # tot + the Levene join

    def _anova(gdf, cast_first: bool):
        s = (
            F.col("s_g").cast("double")
            if cast_first
            else F.col("s_g")
        )
        return gdf.agg(
            F.sum("n_g").alias("n"),
            F.count(F.lit(1)).alias("k"),
            F.sum("s_g").alias("s"),
            F.sum("ss_g").alias("ss"),
            F.sum(s * F.col("s_g") / F.col("n_g")).alias("sb_raw"),
        )

    tot = _anova(grp, True)
    dev = obs.join(
        F.broadcast(
            grp.select(
                F.col("g").alias("gg"),
                (F.col("s_g").cast("double") / F.col("n_g")).alias("mu"),
            )
        ),
        F.col("g") == F.col("gg"),
    ).select("g", F.abs(F.col("y") - F.col("mu")).alias("z"))
    zgrp = dev.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("z").alias("s_g"),
        F.sum(F.col("z") * F.col("z")).alias("ss_g"),
    )
    ztot = _anova(zgrp, False)

    def _f_stat(prefix_cast: bool):
        s = F.col("s").cast("double") if prefix_cast else F.col("s")
        ss = F.col("ss").cast("double") if prefix_cast else F.col("ss")
        msb = (F.col("sb_raw") - s * F.col("s") / F.col("n")) / (
            F.col("k") - 1
        )
        msw = (ss - F.col("sb_raw")) / (F.col("n") - F.col("k"))
        return msb, msw

    msb_t, msw_t = _f_stat(True)
    t = tot.select(
        "n",
        "k",
        (msb_t / msw_t).alias("anova_f"),
        (
            (msb_t - msw_t)
            / (
                msb_t
                + (F.col("n").cast("double") / F.col("k") - 1) * msw_t
            )
        ).alias("icc1"),
    )
    msb_z, msw_z = _f_stat(False)
    z = ztot.select((msb_z / msw_z).alias("levene_w"))
    return t.crossJoin(z).select(
        "n",
        "k",
        r6(F.col("anova_f")).alias("anova_f"),
        r6(F.col("levene_w")).alias("levene_w"),
        r6(F.col("icc1")).alias("icc1"),
    )


# ---------------------------------------------------------------------------
# Q247 — 1-D Wasserstein distance between variant distributions
# ---------------------------------------------------------------------------
# W1 between the two user-parity variants' value distributions =
# integral of |CDF_a - CDF_b| over the dollar-quantized support.
# Exact rational CDFs from integer counts; the window runs over
# the tiny distinct-support relation.
_Q247_ORACLE = """
    WITH q AS (
      SELECT user_id % 2 AS variant,
             CAST(FLOOR(value) AS BIGINT) AS v
      FROM events
    ), cnt AS (
      SELECT v,
             CAST(COUNT(CASE WHEN variant = 0 THEN 1 END) AS BIGINT)
               AS c0,
             CAST(COUNT(CASE WHEN variant = 1 THEN 1 END) AS BIGINT)
               AS c1
      FROM q GROUP BY v
    ), tot AS (
      SELECT SUM(c0) AS n0, SUM(c1) AS n1 FROM cnt
    ), cdf AS (
      SELECT v,
             SUM(c0) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS a0,
             SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS a1,
             LEAD(v) OVER (ORDER BY v) AS v_next
      FROM cnt
    )
    SELECT CAST(t.n0 AS BIGINT) AS n0, CAST(t.n1 AS BIGINT) AS n1,
           ROUND(SUM(ABS(CAST(c.a0 AS DOUBLE) / t.n0
                         - CAST(c.a1 AS DOUBLE) / t.n1)
                     * (c.v_next - c.v)) + 5e-12, 6) AS wasserstein_1
    FROM cdf c CROSS JOIN tot t
    WHERE c.v_next IS NOT NULL
    GROUP BY t.n0, t.n1
"""


@register(
    "q247_wasserstein",
    _Q247_ORACLE,
    doc="1-D Wasserstein (earth-mover) distance between the two "
    "user-parity variants' value distributions: integral of "
    "|CDF difference| over the dollar-quantized support.  One "
    "shuffle to the support histogram; windows run on the tiny "
    "distinct-value relation.  The drift metric that sees shape, "
    "not just mean.",
)
def q247(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    q = ev.select(
        (F.col("user_id") % 2).alias("variant"),
        F.floor("value").cast("bigint").alias("v"),
    )
    cnt = q.groupBy("v").agg(
        F.count(F.when(F.col("variant") == 0, 1)).alias("c0"),
        F.count(F.when(F.col("variant") == 1, 1)).alias("c1"),
    ).localCheckpoint(eager=False)  # totals + cdf
    tot = cnt.agg(
        F.sum("c0").alias("n0"), F.sum("c1").alias("n1")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cdf = cnt.select(
        "v",
        F.sum("c0").over(w).alias("a0"),
        F.sum("c1").over(w).alias("a1"),
        F.lead("v").over(Window.orderBy("v")).alias("v_next"),
    )
    return (
        cdf.where(F.col("v_next").isNotNull())
        .crossJoin(F.broadcast(tot))
        .groupBy("n0", "n1")
        .agg(
            F.round(
                F.sum(
                    F.abs(
                        F.col("a0").cast("double") / F.col("n0")
                        - F.col("a1").cast("double") / F.col("n1")
                    )
                    * (F.col("v_next") - F.col("v"))
                )
                + 5e-12,
                6,
            ).alias("wasserstein_1")
        )
        .select(
            F.col("n0").cast("bigint").alias("n0"),
            F.col("n1").cast("bigint").alias("n1"),
            "wasserstein_1",
        )
    )


# ---------------------------------------------------------------------------
# Q248 — Mann-Kendall trend test per series
# ---------------------------------------------------------------------------
# Nonparametric monotone-trend test on daily cents: S = sum of
# pairwise sign(y_j - y_i), variance with tie correction, normal
# z with continuity correction.  The O(d^2) pair join runs on the
# ~30-row daily relation per series — integer S and tie counts.
_Q248_Z = (
    "CASE WHEN s > 0 THEN (s - 1) / SQRT(var_s) "
    "WHEN s < 0 THEN (s + 1) / SQRT(var_s) "
    "ELSE 0.0 END"
)

_Q248_ORACLE = f"""
    WITH daily AS MATERIALIZED (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS y
      FROM events GROUP BY event_type, day
    ), pairs AS (
      SELECT a.event_type,
             CAST(SUM(CASE WHEN b.y > a.y THEN 1
                           WHEN b.y < a.y THEN -1 ELSE 0 END)
                  AS BIGINT) AS s
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type AND b.day > a.day
      GROUP BY a.event_type
    ), nn AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM daily GROUP BY event_type
    ), ties AS (
      SELECT event_type,
             CAST(COALESCE(SUM(tj * (tj - 1) * (2 * tj + 5)), 0)
                  AS BIGINT) AS tie_term
      FROM (
        SELECT event_type, y, CAST(COUNT(*) AS BIGINT) AS tj
        FROM daily GROUP BY event_type, y
        HAVING COUNT(*) > 1
      ) GROUP BY event_type
    ), stat AS (
      SELECT p.event_type, p.s, n.n,
             (CAST(n.n AS DOUBLE) * (n.n - 1) * (2 * n.n + 5)
              - COALESCE(t.tie_term, 0)) / 18.0 AS var_s
      FROM pairs p
      JOIN nn n ON n.event_type = p.event_type
      LEFT JOIN ties t ON t.event_type = p.event_type
    )
    SELECT event_type, s, n,
           {_R6.format(x='var_s')} AS var_s,
           {_R6.format(x=_Q248_Z)} AS mk_z
    FROM stat ORDER BY event_type
"""


@register(
    "q248_mann_kendall",
    _Q248_ORACLE,
    doc="Mann-Kendall monotone-trend test per event-type series: "
    "pairwise sign sum S over the bounded daily relation, "
    "tie-corrected variance, continuity-corrected z.  Integer S "
    "and tie counts; the d^2 pair join is per-series over ~30 "
    "rows, never over raw events.",
)
def q248(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value") * 100, 0).cast("bigint").alias("y")
    ).localCheckpoint(eager=False)  # pairs (2x), nn, ties
    a = daily.select(
        F.col("event_type").alias("et"),
        F.col("day").alias("da"),
        F.col("y").alias("ya"),
    )
    b = daily.select(
        F.col("event_type").alias("et2"),
        F.col("day").alias("db"),
        F.col("y").alias("yb"),
    )
    pairs = (
        a.join(
            b,
            (F.col("et") == F.col("et2")) & (F.col("db") > F.col("da")),
        )
        .groupBy(F.col("et").alias("event_type"))
        .agg(
            F.sum(
                F.when(F.col("yb") > F.col("ya"), 1)
                .when(F.col("yb") < F.col("ya"), -1)
                .otherwise(0)
            ).alias("s")
        )
    )
    nn = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    ties = (
        daily.groupBy("event_type", "y")
        .agg(F.count(F.lit(1)).alias("tj"))
        .where(F.col("tj") > 1)
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("tj") * (F.col("tj") - 1) * (2 * F.col("tj") + 5)
            ).alias("tie_term")
        )
    )
    stat = (
        pairs.join(nn, "event_type")
        .join(ties, "event_type", "left")
        .select(
            "event_type",
            "s",
            "n",
            (
                (
                    F.col("n").cast("double")
                    * (F.col("n") - 1)
                    * (2 * F.col("n") + 5)
                    - F.coalesce("tie_term", F.lit(0))
                )
                / 18.0
            ).alias("var_s"),
        )
    )
    z = (
        F.when(
            F.col("s") > 0, (F.col("s") - 1) / F.sqrt(F.col("var_s"))
        )
        .when(F.col("s") < 0, (F.col("s") + 1) / F.sqrt(F.col("var_s")))
        .otherwise(0.0)
    )
    return stat.select(
        "event_type",
        "s",
        "n",
        r6(F.col("var_s")).alias("var_s"),
        r6(z).alias("mk_z"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Q249 — Binary-segmentation changepoint (best single split)
# ---------------------------------------------------------------------------
# The split day minimizing SSE_left + SSE_right of daily cents —
# computed for ALL candidate splits in one pass from prefix/suffix
# integer moments (no per-split rescan), then argmin with a
# deterministic tiebreak.  First step of binary segmentation /
# the exact CUSUM-location estimate.
_Q249_ORACLE = """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS y
      FROM events GROUP BY event_type, day
    ), pre AS (
      SELECT event_type, day,
             ROW_NUMBER() OVER w AS t,
             COUNT(*) OVER (PARTITION BY event_type) AS n,
             SUM(y) OVER (w ROWS UNBOUNDED PRECEDING) AS ps,
             SUM(y * y) OVER (w ROWS UNBOUNDED PRECEDING) AS pss,
             SUM(y) OVER (PARTITION BY event_type) AS s,
             SUM(y * y) OVER (PARTITION BY event_type) AS ss
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ), cost AS (
      SELECT event_type, day, t, n,
             (CAST(pss AS DOUBLE)
              - CAST(ps AS DOUBLE) * ps / t)
             + (CAST(ss - pss AS DOUBLE)
                - CAST(s - ps AS DOUBLE) * (s - ps) / (n - t))
               AS sse_split,
             CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n AS sse_null
      FROM pre WHERE t < n
    ), best AS (
      SELECT event_type, day, t, sse_split, sse_null,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY sse_split, day) AS rk
      FROM cost
    )
    SELECT event_type, day AS split_day, CAST(t AS BIGINT) AS split_t,
           ROUND(sse_split / 10000.0 + 5e-10, 2) AS sse_split,
           ROUND(sse_null / 10000.0 + 5e-10, 2) AS sse_null,
           ROUND((1.0 - sse_split / sse_null) + 5e-12, 6) AS gain
    FROM best WHERE rk = 1
    ORDER BY event_type
"""


@register(
    "q249_best_split",
    _Q249_ORACLE,
    doc="Exact best single changepoint per series: SSE of every "
    "candidate split from prefix/suffix integer moments in one "
    "window pass (no per-split rescan), argmin with day tiebreak, "
    "variance-explained gain vs the no-split model.  Binary "
    "segmentation's O(n) step, Spark-shaped.",
)
def q249(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value") * 100, 0).cast("bigint").alias("y")
    )
    ws = Window.partitionBy("event_type").orderBy("day")
    wp = Window.partitionBy("event_type")
    pre = daily.select(
        "event_type",
        "day",
        F.row_number().over(ws).alias("t"),
        F.count(F.lit(1)).over(wp).alias("n"),
        F.sum("y")
        .over(ws.rowsBetween(Window.unboundedPreceding, 0))
        .alias("ps"),
        F.sum(F.col("y") * F.col("y"))
        .over(ws.rowsBetween(Window.unboundedPreceding, 0))
        .alias("pss"),
        F.sum("y").over(wp).alias("s"),
        F.sum(F.col("y") * F.col("y")).over(wp).alias("ss"),
    )
    cost = pre.where(F.col("t") < F.col("n")).select(
        "event_type",
        "day",
        "t",
        "n",
        (
            (
                F.col("pss").cast("double")
                - F.col("ps").cast("double") * F.col("ps") / F.col("t")
            )
            + (
                (F.col("ss") - F.col("pss")).cast("double")
                - (F.col("s") - F.col("ps")).cast("double")
                * (F.col("s") - F.col("ps"))
                / (F.col("n") - F.col("t"))
            )
        ).alias("sse_split"),
        (
            F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s") / F.col("n")
        ).alias("sse_null"),
    )
    best = cost.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy("sse_split", "day")
        ),
    )
    return (
        best.where(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("day").alias("split_day"),
            F.col("t").cast("bigint").alias("split_t"),
            F.round(F.col("sse_split") / 10000.0 + 5e-10, 2).alias(
                "sse_split"
            ),
            F.round(F.col("sse_null") / 10000.0 + 5e-10, 2).alias(
                "sse_null"
            ),
            F.round(
                (1.0 - F.col("sse_split") / F.col("sse_null")) + 5e-12, 6
            ).alias("gain"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Q250 — Quantile treatment effects (variant quantile gaps)
# ---------------------------------------------------------------------------
# Per-decile value gap between the two user-parity variants:
# linear-interpolation percentiles per variant (the engines share
# the interpolation arithmetic — q14/q17 precedent), QTE = q1 - q0.
_Q250_ORACLE = """
    WITH q AS (
      SELECT user_id % 2 AS variant, value FROM events
    ), g AS (
      SELECT variant,
             quantile_cont(value, [0.1, 0.25, 0.5, 0.75, 0.9]) AS qs
      FROM q GROUP BY variant
    ), long AS (
      SELECT variant,
             ([0.1, 0.25, 0.5, 0.75, 0.9])[t.i] AS p,
             qs[t.i] AS q
      FROM g, generate_series(1, 5) t(i)
    )
    SELECT CAST(a.p AS DOUBLE) AS p,
           ROUND(a.q + 5e-12, 6) AS q_control,
           ROUND(b.q + 5e-12, 6) AS q_treat,
           ROUND(b.q - a.q + 5e-12, 6) AS qte
    FROM (SELECT p, q FROM long WHERE variant = 0) a
    JOIN (SELECT p, q FROM long WHERE variant = 1) b ON b.p = a.p
    ORDER BY p
"""


@register(
    "q250_qte",
    _Q250_ORACLE,
    doc="Quantile treatment effects between user-parity variants: "
    "exact linear-interpolation percentiles at 5 probes per "
    "variant (one sort-based aggregation each), per-quantile gap.  "
    "Distributional effect readout where the mean hides the "
    "story.",
)
def q250(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    probes = [0.1, 0.25, 0.5, 0.75, 0.9]
    g = ev.groupBy((F.col("user_id") % 2).alias("variant")).agg(
        F.percentile(
            "value", F.array(*[F.lit(p) for p in probes])
        ).alias("qs")
    )
    long = g.select(
        "variant",
        F.posexplode("qs").alias("i", "q"),
    ).select(
        "variant",
        F.element_at(
            F.array(*[F.lit(p) for p in probes]), F.col("i") + 1
        ).alias("p"),
        "q",
    )
    a = long.where(F.col("variant") == 0).select(
        F.col("p").alias("pa"), F.col("q").alias("q_control")
    )
    b = long.where(F.col("variant") == 1).select(
        F.col("p").alias("pb"), F.col("q").alias("q_treat")
    )
    return (
        a.join(b, F.col("pa") == F.col("pb"))
        .select(
            F.col("pa").cast("double").alias("p"),
            r6(F.col("q_control")).alias("q_control"),
            r6(F.col("q_treat")).alias("q_treat"),
            r6(F.col("q_treat") - F.col("q_control")).alias("qte"),
        )
        .orderBy("p")
    )
