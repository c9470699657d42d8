"""Conformance queries: round-7 operator batch #23 (q324+) —
Cochran's Q, McNemar's test, partial correlation, Yuen's trimmed
t, and the log-rank survival-curve comparison.

Parity: binary tables, risk sets, and trimmed moments are exact
integers (cents/counts); percentile trim cuts share both engines'
interpolation arithmetic."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import R6_SQL, _t, r6, register

_R6 = R6_SQL


# ---------------------------------------------------------------------------
# Q324 — Cochran's Q (k matched binary treatments)
# ---------------------------------------------------------------------------
# Blocks = users, treatments = event types, outcome = "user did
# that type in week 1": Q = k(k-1) sum_j (C_j - T/k)^2 /
# (k T - sum_i R_i^2) — every count an exact integer.  The
# matched-binary generalization of McNemar.
_Q324_ORACLE = """
    WITH x AS (
      SELECT user_id, event_type,
             MAX(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-08'
                      THEN 1 ELSE 0 END) AS hit
      FROM events GROUP BY user_id, event_type
    ), rows_ AS (
      SELECT user_id, CAST(SUM(hit) AS BIGINT) AS r_i
      FROM x GROUP BY user_id
    ), cols AS (
      SELECT event_type, CAST(SUM(hit) AS BIGINT) AS c_j
      FROM x GROUP BY event_type
    ), s AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cols) AS k,
             (SELECT CAST(SUM(r_i) AS BIGINT) FROM rows_) AS t,
             (SELECT SUM(CAST(r_i AS DOUBLE) * r_i) FROM rows_)
               AS sr2,
             (SELECT SUM(CAST(c_j AS DOUBLE) * c_j) FROM cols)
               AS sc2
    )
    SELECT k AS n_treatments, t AS total_hits,
           {Q} AS cochran_q
    FROM s
""".replace(
    "{Q}",
    R6_SQL.format(
        x=(
            "CAST(k AS DOUBLE) * (k - 1)"
            " * (sc2 - CAST(t AS DOUBLE) * t / k)"
            " / (CAST(k AS DOUBLE) * t - sr2)"
        )
    ),
)


@register(
    "q324_cochran_q",
    _Q324_ORACLE,
    doc="Cochran's Q with users as blocks and event types as "
    "matched binary treatments (did the user do the type in week "
    "1): Q = k(k-1)(sum C_j^2 - T^2/k)/(kT - sum R_i^2), exact "
    "integer row/column sums.  The k-treatment McNemar.",
)
def q324(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    x = ev.groupBy("user_id", "event_type").agg(
        F.max(
            F.when(F.to_date("ts") < "2024-01-08", 1).otherwise(0)
        ).alias("hit")
    ).localCheckpoint(eager=False)  # rows + cols
    rows_ = x.groupBy("user_id").agg(F.sum("hit").alias("r_i"))
    cols = x.groupBy("event_type").agg(F.sum("hit").alias("c_j"))
    rstat = rows_.agg(
        F.sum("r_i").alias("t"),
        F.sum(F.col("r_i").cast("double") * F.col("r_i")).alias("sr2"),
    )
    cstat = cols.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("c_j").cast("double") * F.col("c_j")).alias("sc2"),
    )
    s = rstat.crossJoin(cstat)
    kd = F.col("k").cast("double")
    q = (
        kd
        * (F.col("k") - 1)
        * (F.col("sc2") - F.col("t").cast("double") * F.col("t") / F.col("k"))
        / (kd * F.col("t") - F.col("sr2"))
    )
    return s.select(
        F.col("k").alias("n_treatments"),
        F.col("t").alias("total_hits"),
        r6(q).alias("cochran_q"),
    )


# ---------------------------------------------------------------------------
# Q325 — McNemar's test (paired binary, week 1 vs week 4)
# ---------------------------------------------------------------------------
# Did per-user purchasing switch on or off between week 1 and week
# 4?  Discordant counts b (on->off) and c (off->on), continuity-
# corrected chi2 = (|b-c|-1)^2/(b+c).  The paired-proportion test
# from one user aggregation.
_Q325_ORACLE = """
    WITH marks AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase'
                       AND CAST(ts AS DATE) < DATE '2024-01-08'
                      THEN 1 ELSE 0 END) AS w1,
             MAX(CASE WHEN event_type = 'purchase'
                       AND CAST(ts AS DATE) >= DATE '2024-01-22'
                       AND CAST(ts AS DATE) < DATE '2024-01-29'
                      THEN 1 ELSE 0 END) AS w4
      FROM events GROUP BY user_id
    ), tab AS (
      SELECT CAST(SUM(w1 * (1 - w4)) AS BIGINT) AS b,
             CAST(SUM((1 - w1) * w4) AS BIGINT) AS c,
             CAST(SUM(w1 * w4) AS BIGINT) AS both_,
             CAST(SUM((1 - w1) * (1 - w4)) AS BIGINT) AS neither
      FROM marks
    )
    SELECT b AS on_to_off, c AS off_to_on, both_ AS stayed_on,
           neither AS stayed_off,
           {CHI} AS mcnemar_chi2
    FROM tab
""".replace(
    "{CHI}",
    R6_SQL.format(
        x=(
            "CASE WHEN b + c > 0 THEN"
            " (ABS(CAST(b AS DOUBLE) - c) - 1.0)"
            " * (ABS(CAST(b AS DOUBLE) - c) - 1.0)"
            " / (CAST(b AS DOUBLE) + c) END"
        )
    ),
)


@register(
    "q325_mcnemar",
    _Q325_ORACLE,
    doc="McNemar's paired test on per-user purchasing week 1 vs "
    "week 4: discordant integer counts, continuity-corrected "
    "chi2 = (|b-c|-1)^2/(b+c).  The did-behavior-switch test that "
    "two independent proportions would get wrong.",
)
def q325(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    d = F.to_date("ts")
    purch = F.col("event_type") == "purchase"
    marks = ev.groupBy("user_id").agg(
        F.max(
            F.when(purch & (d < "2024-01-08"), 1).otherwise(0)
        ).alias("w1"),
        F.max(
            F.when(
                purch & (d >= "2024-01-22") & (d < "2024-01-29"), 1
            ).otherwise(0)
        ).alias("w4"),
    )
    tab = marks.agg(
        F.sum(F.col("w1") * (1 - F.col("w4"))).alias("b"),
        F.sum((1 - F.col("w1")) * F.col("w4")).alias("c"),
        F.sum(F.col("w1") * F.col("w4")).alias("both_"),
        F.sum((1 - F.col("w1")) * (1 - F.col("w4"))).alias("neither"),
    )
    diff = F.abs(F.col("b").cast("double") - F.col("c")) - 1.0
    # no discordant pairs at tiny scale: NULL, not a divide-by-zero
    chi = F.when(
        F.col("b") + F.col("c") > 0,
        diff * diff / (F.col("b").cast("double") + F.col("c")),
    )
    return tab.select(
        F.col("b").alias("on_to_off"),
        F.col("c").alias("off_to_on"),
        F.col("both_").alias("stayed_on"),
        F.col("neither").alias("stayed_off"),
        r6(chi).alias("mcnemar_chi2"),
    )


# ---------------------------------------------------------------------------
# Q326 — Partial correlation (clicks ~ purchases | signups)
# ---------------------------------------------------------------------------
# First-order partial r_xy.z between daily click and purchase
# revenue controlling for signup revenue:
# (r_xy - r_xz r_zy)/sqrt((1-r_xz^2)(1-r_zy^2)) — all three
# pairwise correlations from one exact integer-moment pass.
_Q326_CORR = (
    "(n * s{a}{b} - s{a} * s{b})"
    " / (SQRT(n * s{a}{a} - s{a} * s{a})"
    " * SQRT(n * s{b}{b} - s{b} * s{b}))"
)

_Q326_ORACLE = """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(ROUND(SUM(CASE WHEN event_type = 'click'
                                 THEN value ELSE 0 END) * 100, 0)
                  AS BIGINT) AS xc,
             CAST(ROUND(SUM(CASE WHEN event_type = 'purchase'
                                 THEN value ELSE 0 END) * 100, 0)
                  AS BIGINT) AS yc,
             CAST(ROUND(SUM(CASE WHEN event_type = 'signup'
                                 THEN value ELSE 0 END) * 100, 0)
                  AS BIGINT) AS zc
      FROM events GROUP BY day
    ), mom AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(xc) AS DOUBLE) AS sx,
             CAST(SUM(yc) AS DOUBLE) AS sy,
             CAST(SUM(zc) AS DOUBLE) AS sz,
             CAST(SUM(xc * xc) AS DOUBLE) AS sxx,
             CAST(SUM(yc * yc) AS DOUBLE) AS syy,
             CAST(SUM(zc * zc) AS DOUBLE) AS szz,
             CAST(SUM(xc * yc) AS DOUBLE) AS sxy,
             CAST(SUM(xc * zc) AS DOUBLE) AS sxz,
             CAST(SUM(yc * zc) AS DOUBLE) AS szy
      FROM daily
    ), corrs AS (
      SELECT {RXY} AS rxy, {RXZ} AS rxz, {RZY} AS rzy
      FROM mom
    )
    SELECT {RXY2} AS r_xy,
           {PART} AS r_xy_given_z
    FROM corrs
""".replace(
    "{RXY}", _Q326_CORR.format(a="x", b="y")
).replace(
    "{RXZ}", _Q326_CORR.format(a="x", b="z")
).replace(
    "{RZY}", _Q326_CORR.format(a="z", b="y")
).replace(
    "{RXY2}", R6_SQL.format(x="rxy")
).replace(
    "{PART}",
    R6_SQL.format(
        x=(
            "(rxy - rxz * rzy)"
            " / SQRT((1.0 - rxz * rxz) * (1.0 - rzy * rzy))"
        )
    ),
)


@register(
    "q326_partial_corr",
    _Q326_ORACLE,
    doc="First-order partial correlation of daily click and "
    "purchase revenue controlling for signups: three pairwise "
    "Pearson r from one exact integer-moment pass, "
    "(r_xy - r_xz r_zy)/sqrt((1-r_xz^2)(1-r_zy^2)).  The "
    "confounder-removal one-liner.",
)
def q326(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")

    def cents(t: str):
        return (
            F.round(
                F.sum(
                    F.when(
                        F.col("event_type") == t, F.col("value")
                    ).otherwise(0.0)
                )
                * 100,
                0,
            )
            .cast("bigint")
        )

    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        cents("click").alias("xc"),
        cents("purchase").alias("yc"),
        cents("signup").alias("zc"),
    )
    mom = daily.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("xc").cast("double").alias("sx"),
        F.sum("yc").cast("double").alias("sy"),
        F.sum("zc").cast("double").alias("sz"),
        F.sum(F.col("xc") * F.col("xc")).cast("double").alias("sxx"),
        F.sum(F.col("yc") * F.col("yc")).cast("double").alias("syy"),
        F.sum(F.col("zc") * F.col("zc")).cast("double").alias("szz"),
        F.sum(F.col("xc") * F.col("yc")).cast("double").alias("sxy"),
        F.sum(F.col("xc") * F.col("zc")).cast("double").alias("sxz"),
        F.sum(F.col("yc") * F.col("zc")).cast("double").alias("szy"),
    )
    c = F.col

    def corr(sab, sa, sb, saa, sbb):
        return (c("n") * c(sab) - c(sa) * c(sb)) / (
            F.sqrt(c("n") * c(saa) - c(sa) * c(sa))
            * F.sqrt(c("n") * c(sbb) - c(sb) * c(sb))
        )

    corrs = mom.select(
        corr("sxy", "sx", "sy", "sxx", "syy").alias("rxy"),
        corr("sxz", "sx", "sz", "sxx", "szz").alias("rxz"),
        corr("szy", "sz", "sy", "szz", "syy").alias("rzy"),
    )
    part = (F.col("rxy") - F.col("rxz") * F.col("rzy")) / F.sqrt(
        (1.0 - F.col("rxz") * F.col("rxz"))
        * (1.0 - F.col("rzy") * F.col("rzy"))
    )
    return corrs.select(
        r6(F.col("rxy")).alias("r_xy"),
        r6(part).alias("r_xy_given_z"),
    )


# ---------------------------------------------------------------------------
# Q327 — Yuen's trimmed-mean t (20% trimming)
# ---------------------------------------------------------------------------
# Robust two-sample comparison of variant purchase values: 20%
# trimmed means (conditional moments inside the p20-p80 band of
# each arm) and winsorized variances, Yuen t.  Percentile cuts
# share the engines' interpolation; everything else is exact
# cents.
_Q327_ORACLE = """
    WITH p AS (
      SELECT user_id % 2 AS variant,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS y
      FROM events WHERE event_type = 'purchase'
    ), cuts AS MATERIALIZED (
      SELECT variant,
             quantile_cont(y, 0.2) AS lo,
             quantile_cont(y, 0.8) AS hi,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM p GROUP BY variant
    ), wins AS (
      SELECT p.variant, c.n,
             LEAST(GREATEST(CAST(p.y AS DOUBLE), c.lo), c.hi) AS wy,
             CASE WHEN p.y >= c.lo AND p.y <= c.hi THEN p.y END AS ty
      FROM p JOIN cuts c ON c.variant = p.variant
    ), stat AS (
      SELECT variant, MAX(n) AS n,
             CAST(COUNT(ty) AS BIGINT) AS n_trim,
             SUM(CAST(ty AS DOUBLE)) / COUNT(ty) AS tmean,
             (CAST(COUNT(*) AS DOUBLE) * SUM(wy * wy)
              - SUM(wy) * SUM(wy))
             / (CAST(COUNT(*) AS DOUBLE) * (COUNT(*) - 1)) AS wvar
      FROM wins GROUP BY variant
    ), sides AS (
      SELECT
        MAX(CASE WHEN variant = 0 THEN tmean END) AS m0,
        MAX(CASE WHEN variant = 1 THEN tmean END) AS m1,
        MAX(CASE WHEN variant = 0 THEN wvar END) AS v0,
        MAX(CASE WHEN variant = 1 THEN wvar END) AS v1,
        MAX(CASE WHEN variant = 0 THEN n END) AS n0,
        MAX(CASE WHEN variant = 1 THEN n END) AS n1,
        MAX(CASE WHEN variant = 0 THEN n_trim END) AS h0,
        MAX(CASE WHEN variant = 1 THEN n_trim END) AS h1
      FROM stat
    )
    SELECT CAST(h0 AS BIGINT) AS n_trim_control,
           CAST(h1 AS BIGINT) AS n_trim_treat,
           {M0} AS trimmed_mean_control,
           {M1} AS trimmed_mean_treat,
           {T} AS yuen_t
    FROM sides
""".replace(
    "{M0}", R6_SQL.format(x="m0 / 100.0")
).replace(
    "{M1}", R6_SQL.format(x="m1 / 100.0")
).replace(
    "{T}",
    R6_SQL.format(
        x=(
            "(m1 - m0) / SQRT("
            "(CAST(n0 AS DOUBLE) - 1) * v0 / (h0 * (h0 - 1))"
            " + (CAST(n1 AS DOUBLE) - 1) * v1 / (h1 * (h1 - 1)))"
        )
    ),
)


@register(
    "q327_yuen_test",
    _Q327_ORACLE,
    doc="Yuen's 20%-trimmed t between variant purchase values: "
    "trimmed means from conditional moments inside each arm's "
    "p20-p80 band, winsorized variances, "
    "t = dm / sqrt(sum (n-1) s_w^2 / (h(h-1))).  The outlier-"
    "robust two-sample test.",
)
def q327(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        (F.col("user_id") % 2).alias("variant"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("y"),
    )
    cuts = p.groupBy(F.col("variant").alias("cv")).agg(
        F.percentile("y", F.lit(0.2)).alias("lo"),
        F.percentile("y", F.lit(0.8)).alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    wins = p.join(
        F.broadcast(cuts), F.col("variant") == F.col("cv")
    ).select(
        "variant",
        "n",
        F.least(
            F.greatest(F.col("y").cast("double"), F.col("lo")),
            F.col("hi"),
        ).alias("wy"),
        F.when(
            (F.col("y") >= F.col("lo")) & (F.col("y") <= F.col("hi")),
            F.col("y"),
        ).alias("ty"),
    )
    nd = F.count(F.lit(1)).cast("double")
    stat = wins.groupBy("variant").agg(
        F.max("n").alias("n"),
        F.count("ty").alias("n_trim"),
        (F.sum(F.col("ty").cast("double")) / F.count("ty")).alias(
            "tmean"
        ),
        (
            (nd * F.sum(F.col("wy") * F.col("wy")) - F.sum("wy") * F.sum("wy"))
            / (nd * (F.count(F.lit(1)) - 1))
        ).alias("wvar"),
    )

    def side(v, col, alias):
        return F.max(
            F.when(F.col("variant") == v, F.col(col))
        ).alias(alias)

    sides = stat.agg(
        side(0, "tmean", "m0"),
        side(1, "tmean", "m1"),
        side(0, "wvar", "v0"),
        side(1, "wvar", "v1"),
        side(0, "n", "n0"),
        side(1, "n", "n1"),
        side(0, "n_trim", "h0"),
        side(1, "n_trim", "h1"),
    )
    t = (F.col("m1") - F.col("m0")) / F.sqrt(
        (F.col("n0").cast("double") - 1)
        * F.col("v0")
        / (F.col("h0") * (F.col("h0") - 1))
        + (F.col("n1").cast("double") - 1)
        * F.col("v1")
        / (F.col("h1") * (F.col("h1") - 1))
    )
    return sides.select(
        F.col("h0").cast("bigint").alias("n_trim_control"),
        F.col("h1").cast("bigint").alias("n_trim_treat"),
        r6(F.col("m0") / 100.0).alias("trimmed_mean_control"),
        r6(F.col("m1") / 100.0).alias("trimmed_mean_treat"),
        r6(t).alias("yuen_t"),
    )


# ---------------------------------------------------------------------------
# Q328 — Log-rank test (time to first purchase, variant A vs B)
# ---------------------------------------------------------------------------
# Survival-curve comparison: event time = each user's hours to
# first purchase (all users convert here, so no censoring); at
# every distinct event time the risk sets and observed/expected
# deaths come from exact integer counts via suffix windows,
# chi2 = (sum(O-E))^2 / sum(V).  The canonical two-group
# survival test, q108's comparator.
_Q328_ORACLE = """
    WITH first_p AS (
      SELECT user_id, user_id % 2 AS grp,
             CAST(FLOOR((epoch_us(MIN(ts))
                         - epoch_us(TIMESTAMP '2024-01-01 00:00:00'))
                        / 3600.0e6) AS BIGINT) AS t_hr
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ), times AS (
      SELECT t_hr,
             CAST(COUNT(CASE WHEN grp = 0 THEN 1 END) AS BIGINT) AS d0,
             CAST(COUNT(CASE WHEN grp = 1 THEN 1 END) AS BIGINT) AS d1
      FROM first_p GROUP BY t_hr
    ), risk AS (
      SELECT t_hr, d0, d1, d0 + d1 AS d,
             SUM(d0) OVER (ORDER BY t_hr DESC
                           ROWS UNBOUNDED PRECEDING) AS r0,
             SUM(d0 + d1) OVER (ORDER BY t_hr DESC
                                ROWS UNBOUNDED PRECEDING) AS r
      FROM times
    ), terms AS (
      SELECT d0 - CAST(d AS DOUBLE) * r0 / r AS o_minus_e,
             CASE WHEN r > 1
                  THEN CAST(d AS DOUBLE) * (r0 * 1.0 / r)
                       * (1.0 - r0 * 1.0 / r) * (r - d) / (r - 1)
                  ELSE 0.0 END AS v
      FROM risk
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_event_times,
           {OE} AS sum_o_minus_e,
           {CHI} AS logrank_chi2
    FROM terms
""".replace(
    "{OE}", R6_SQL.format(x="SUM(o_minus_e)")
).replace(
    "{CHI}",
    R6_SQL.format(
        x="SUM(o_minus_e) * SUM(o_minus_e) / SUM(v)"
    ),
)


@register(
    "q328_log_rank",
    _Q328_ORACLE,
    doc="Log-rank test comparing variants' time-to-first-purchase "
    "curves: hourly event times, risk sets by suffix windows over "
    "exact integer counts, chi2 = (sum(O-E))^2/sum(V).  The "
    "canonical survival comparison (q108's two-group companion).",
)
def q328(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    base_us = F.unix_micros(
        F.lit("2024-01-01 00:00:00").cast("timestamp")
    )
    first_p = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fts"))
        .select(
            (F.col("user_id") % 2).alias("grp"),
            F.floor(
                (
                    F.unix_micros(F.col("fts").cast("timestamp"))
                    - base_us
                )
                / 3600.0e6
            )
            .cast("bigint")
            .alias("t_hr"),
        )
    )
    times = first_p.groupBy("t_hr").agg(
        F.count(F.when(F.col("grp") == 0, 1)).alias("d0"),
        F.count(F.when(F.col("grp") == 1, 1)).alias("d1"),
    )
    wdesc = Window.orderBy(F.col("t_hr").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = times.select(
        "t_hr",
        "d0",
        "d1",
        (F.col("d0") + F.col("d1")).alias("d"),
        F.sum("d0").over(wdesc).alias("r0"),
        F.sum(F.col("d0") + F.col("d1")).over(wdesc).alias("r"),
    )
    share = F.col("r0") * 1.0 / F.col("r")
    terms = risk.select(
        (
            F.col("d0")
            - F.col("d").cast("double") * F.col("r0") / F.col("r")
        ).alias("o_minus_e"),
        F.when(
            F.col("r") > 1,
            F.col("d").cast("double")
            * share
            * (1.0 - share)
            * (F.col("r") - F.col("d"))
            / (F.col("r") - 1),
        )
        .otherwise(0.0)
        .alias("v"),
    )
    return terms.agg(
        F.count(F.lit(1)).alias("n_event_times"),
        r6(F.sum("o_minus_e")).alias("sum_o_minus_e"),
        r6(
            F.sum("o_minus_e") * F.sum("o_minus_e") / F.sum("v")
        ).alias("logrank_chi2"),
    )
