"""Conformance queries batch #100 (q695+) — X-bar/R control charts,
Fisher discriminant analysis, survival concordance, lexical
richness, and digit forensics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q695 — X-bar / R chart with n=5 subgroups
# ---------------------------------------------------------------------------
# Each day's five nation-bloc revenues form a rational subgroup:
# X-bar and R per day, control limits from the classical n=5
# constants (A2 = 0.577, D4 = 2.114, D3 = 0), out-of-control days
# counted on both charts — the variables-chart pair that the
# individuals chart (q272) and WE rules (q649) build on.
_Q695_ORACLE = """
    WITH cells AS MATERIALIZED (
      SELECT EXTRACT(day FROM e.ts) AS d, c.c_nationkey % 5 AS g,
             SUM(ROUND(e.value * 100)) / 1000.0 AS y
      FROM events e JOIN customer c ON c.c_custkey = e.user_id
      WHERE e.event_type = 'purchase'
      GROUP BY EXTRACT(day FROM e.ts), c.c_nationkey % 5
    ), sub AS MATERIALIZED (
      SELECT d, AVG(y) AS xbar, MAX(y) - MIN(y) AS r, COUNT(*) AS k
      FROM cells GROUP BY d HAVING COUNT(*) = 5
    ), lim AS (
      SELECT AVG(xbar) AS gx, AVG(r) AS gr FROM sub
    ), flags AS (
      SELECT s.d,
             CASE WHEN s.xbar > l.gx + 0.577 * l.gr
                    OR s.xbar < l.gx - 0.577 * l.gr THEN 1 ELSE 0 END AS fx,
             CASE WHEN s.r > 2.114 * l.gr THEN 1 ELSE 0 END AS fr
      FROM sub s, lim l
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_subgroups,
           ROUND((SELECT gx FROM lim) + 5e-12, 6) AS grand_mean,
           ROUND((SELECT gr FROM lim) + 5e-12, 6) AS mean_range,
           CAST(SUM(fx) AS BIGINT) AS xbar_violations,
           CAST(SUM(fr) AS BIGINT) AS range_violations,
           CAST(MIN(CASE WHEN fx + fr > 0 THEN d END) AS BIGINT)
             AS first_ooc_day
    FROM flags
"""


@register(
    "q695_xbar_r_chart",
    _Q695_ORACLE,
    doc="X-bar/R chart: daily 5-bloc revenue subgroups, limits from "
    "the n=5 constants A2 = 0.577 and D4 = 2.114, out-of-control "
    "days counted on the mean and range charts — the rational-"
    "subgroup SPC pair above the individuals chart (q272) and WE "
    "rules (q649).",
)
def q695(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cells = (
        ev.join(F.broadcast(c), ev.user_id == c.c_custkey)
        .groupBy(
            F.dayofmonth("ts").alias("d"),
            (F.col("c_nationkey") % 5).alias("g"),
        )
        .agg((F.sum(F.round(F.col("value") * 100)) / 1000.0).alias("y"))
    )
    sub = (
        cells.groupBy("d")
        .agg(
            F.avg("y").alias("xbar"),
            (F.max("y") - F.min("y")).alias("r"),
            F.count(F.lit(1)).alias("k"),
        )
        .filter(F.col("k") == 5)
        .localCheckpoint(eager=False)
    )
    lim = sub.agg(F.avg("xbar").alias("gx"), F.avg("r").alias("gr"))
    flags = sub.crossJoin(F.broadcast(lim)).select(
        "d",
        "gx",
        "gr",
        F.when(
            (F.col("xbar") > F.col("gx") + 0.577 * F.col("gr"))
            | (F.col("xbar") < F.col("gx") - 0.577 * F.col("gr")),
            1,
        )
        .otherwise(0)
        .alias("fx"),
        F.when(F.col("r") > 2.114 * F.col("gr"), 1).otherwise(0).alias("fr"),
    )
    return flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_subgroups"),
        r6(F.max("gx")).alias("grand_mean"),
        r6(F.max("gr")).alias("mean_range"),
        F.sum("fx").cast("bigint").alias("xbar_violations"),
        F.sum("fr").cast("bigint").alias("range_violations"),
        F.min(F.when(F.col("fx") + F.col("fr") > 0, F.col("d")))
        .cast("bigint")
        .alias("first_ooc_day"),
    )


# ---------------------------------------------------------------------------
# Q696 — Fisher linear discriminant, closed form in 2D
# ---------------------------------------------------------------------------
# AUTOMOBILE vs rest on (balance, order count): class means, pooled
# within-class scatter, discriminant direction w = S_w^-1 (mu1 -
# mu0) by 2x2 inversion, and the Fisher criterion J = d' S_w^-1 d —
# the optimal linear boundary naive Bayes (q274) and kNN (q45)
# don't give in closed form.
_Q696_ORACLE = """
    WITH u AS MATERIALIZED (
      SELECT CASE WHEN c.c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS t,
             ROUND(c.c_acctbal * 100) / 1e5 AS x1,
             COUNT(o.o_orderkey) * 1.0 AS x2
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_mktsegment, c.c_acctbal
    ), mu AS MATERIALIZED (
      SELECT t, AVG(x1) AS m1, AVG(x2) AS m2, COUNT(*) AS n
      FROM u GROUP BY t
    ), sw AS (
      SELECT SUM((u.x1 - m.m1) * (u.x1 - m.m1)) AS s11,
             SUM((u.x1 - m.m1) * (u.x2 - m.m2)) AS s12,
             SUM((u.x2 - m.m2) * (u.x2 - m.m2)) AS s22,
             SUM(1) - 2 AS dof
      FROM u JOIN mu m ON m.t = u.t
    ), d AS (
      SELECT (SELECT m1 FROM mu WHERE t = 1)
               - (SELECT m1 FROM mu WHERE t = 0) AS d1,
             (SELECT m2 FROM mu WHERE t = 1)
               - (SELECT m2 FROM mu WHERE t = 0) AS d2,
             s11 / dof AS c11, s12 / dof AS c12, s22 / dof AS c22
      FROM sw
    ), w AS (
      SELECT d1, d2, c11, c12, c22,
             (c22 * d1 - c12 * d2) / (c11 * c22 - c12 * c12) AS w1,
             (c11 * d2 - c12 * d1) / (c11 * c22 - c12 * c12) AS w2
      FROM d
    )
    SELECT ROUND(w1 / SQRT(w1 * w1 + w2 * w2) + 5e-12, 6) AS w_balance,
           ROUND(w2 / SQRT(w1 * w1 + w2 * w2) + 5e-12, 6) AS w_orders,
           ROUND(w1 * d1 + w2 * d2 + 5e-12, 6) AS fisher_criterion,
           ROUND(SQRT(w1 * d1 + w2 * d2) + 5e-12, 6)
             AS mahalanobis_gap,
           w1 * d1 + w2 * d2 < 0.1 AS weak_separation
    FROM w
"""


@register(
    "q696_fisher_lda",
    _Q696_ORACLE,
    doc="Fisher LDA in closed form: AUTOMOBILE vs rest on (balance, "
    "order count), pooled within-class covariance inverted 2x2, "
    "discriminant direction and the Fisher criterion d' Sw^-1 d "
    "(squared Mahalanobis class gap) — the optimal linear boundary "
    "beside naive Bayes (q274) and Mahalanobis distance (q270).",
)
def q696(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    u = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment", "c_acctbal")
        .agg(F.count("o_orderkey").alias("no"))
        .select(
            F.when(F.col("c_mktsegment") == "AUTOMOBILE", 1)
            .otherwise(0)
            .alias("t"),
            (F.round(F.col("c_acctbal") * 100) / 1e5).alias("x1"),
            (F.col("no") * 1.0).alias("x2"),
        )
        .localCheckpoint(eager=False)
    )
    mu = u.groupBy("t").agg(
        F.avg("x1").alias("m1"), F.avg("x2").alias("m2")
    )
    sw = (
        u.join(F.broadcast(mu), "t")
        .agg(
            F.sum(
                (F.col("x1") - F.col("m1")) * (F.col("x1") - F.col("m1"))
            ).alias("s11"),
            F.sum(
                (F.col("x1") - F.col("m1")) * (F.col("x2") - F.col("m2"))
            ).alias("s12"),
            F.sum(
                (F.col("x2") - F.col("m2")) * (F.col("x2") - F.col("m2"))
            ).alias("s22"),
            (F.count(F.lit(1)) - 2).alias("dof"),
        )
    )
    mw = mu.agg(
        (
            F.max(F.when(F.col("t") == 1, F.col("m1")))
            - F.max(F.when(F.col("t") == 0, F.col("m1")))
        ).alias("d1"),
        (
            F.max(F.when(F.col("t") == 1, F.col("m2")))
            - F.max(F.when(F.col("t") == 0, F.col("m2")))
        ).alias("d2"),
    )
    d = sw.crossJoin(F.broadcast(mw)).select(
        "d1",
        "d2",
        (F.col("s11") / F.col("dof")).alias("c11"),
        (F.col("s12") / F.col("dof")).alias("c12"),
        (F.col("s22") / F.col("dof")).alias("c22"),
    )
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    w = d.select(
        "d1",
        "d2",
        ((F.col("c22") * F.col("d1") - F.col("c12") * F.col("d2")) / det).alias(
            "w1"
        ),
        ((F.col("c11") * F.col("d2") - F.col("c12") * F.col("d1")) / det).alias(
            "w2"
        ),
    )
    nrm = F.sqrt(F.col("w1") * F.col("w1") + F.col("w2") * F.col("w2"))
    j = F.col("w1") * F.col("d1") + F.col("w2") * F.col("d2")
    return w.select(
        r6(F.col("w1") / nrm).alias("w_balance"),
        r6(F.col("w2") / nrm).alias("w_orders"),
        r6(j).alias("fisher_criterion"),
        r6(F.sqrt(j)).alias("mahalanobis_gap"),
        (j < 0.1).alias("weak_separation"),
    )


# ---------------------------------------------------------------------------
# Q697 — Harrell's C-index for a survival risk score
# ---------------------------------------------------------------------------
# Balance as a risk score for time-to-first-purchase (day of first
# purchase event, censored at 31): over comparable pairs (the
# earlier time is an observed event), concordance counts score
# agreement with ordering, ties scoring half — the survival-world
# AUC that plain AUC (q75) cannot compute under censoring.
_Q697_ORACLE = """
    WITH firsts AS MATERIALIZED (
      SELECT user_id AS ck,
             MIN(CASE WHEN event_type = 'purchase'
                      THEN EXTRACT(day FROM ts) END) AS fp
      FROM events GROUP BY user_id
    ), pop AS MATERIALIZED (
      SELECT c.c_custkey AS ck,
             ROUND(c.c_acctbal * 100) AS score,
             COALESCE(f.fp, 31) AS t,
             CASE WHEN f.fp IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM (SELECT c_custkey, c_acctbal,
                   ROW_NUMBER() OVER (ORDER BY c_custkey) AS rn
            FROM customer) c
      LEFT JOIN firsts f ON f.ck = c.c_custkey
      WHERE c.rn <= 300
    ), pairs AS (
      SELECT a.score AS sa, b.score AS sb
      FROM pop a JOIN pop b
        ON a.ev = 1 AND (a.t < b.t OR (a.t = b.t AND b.ev = 0))
        AND a.ck <> b.ck
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS comparable_pairs,
           CAST(SUM(CASE WHEN sa > sb THEN 1 ELSE 0 END) AS BIGINT)
             AS concordant,
           CAST(SUM(CASE WHEN sa = sb THEN 1 ELSE 0 END) AS BIGINT)
             AS tied_score,
           ROUND((SUM(CASE WHEN sa > sb THEN 1 ELSE 0 END)
                  + 0.5 * SUM(CASE WHEN sa = sb THEN 1 ELSE 0 END))
                 / COUNT(*) + 5e-12, 6) AS c_index
    FROM pairs
"""


@register(
    "q697_harrell_c",
    _Q697_ORACLE,
    doc="Harrell's C-index: balance scoring time-to-first-purchase "
    "with censoring at day 31, concordance over comparable pairs "
    "(earlier time observed), score ties counting half — the "
    "censoring-aware AUC above plain AUC (q75) and the KM stack "
    "(q108/q640).",
)
def q697(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    c = _t(spark, sf_dir, "customer")
    firsts = e.groupBy(F.col("user_id").alias("ck")).agg(
        F.min(
            F.when(F.col("event_type") == "purchase", F.dayofmonth("ts"))
        ).alias("fp")
    )
    pop = (
        # first-300-by-key via TakeOrderedAndProject, not a global window
        c.select("c_custkey", "c_acctbal")
        .orderBy("c_custkey")
        .limit(300)
        .join(firsts, F.col("c_custkey") == F.col("ck"), "left")
        .select(
            F.col("c_custkey").alias("u"),
            F.round(F.col("c_acctbal") * 100).alias("score"),
            F.coalesce(F.col("fp"), F.lit(31)).alias("t"),
            F.when(F.col("fp").isNotNull(), 1).otherwise(0).alias("ev"),
        )
        .localCheckpoint(eager=False)
    )
    a = pop.select(
        F.col("u").alias("ua"),
        F.col("score").alias("sa"),
        F.col("t").alias("ta"),
        F.col("ev").alias("eva"),
    )
    b = pop.select(
        F.col("u").alias("ub"),
        F.col("score").alias("sb"),
        F.col("t").alias("tb"),
        F.col("ev").alias("evb"),
    )
    pairs = a.join(
        b,
        (F.col("eva") == 1)
        & (
            (F.col("ta") < F.col("tb"))
            | ((F.col("ta") == F.col("tb")) & (F.col("evb") == 0))
        )
        & (F.col("ua") != F.col("ub")),
    )
    conc = F.sum(F.when(F.col("sa") > F.col("sb"), 1).otherwise(0))
    tie = F.sum(F.when(F.col("sa") == F.col("sb"), 1).otherwise(0))
    return pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("comparable_pairs"),
        conc.cast("bigint").alias("concordant"),
        tie.cast("bigint").alias("tied_score"),
        r6((conc + 0.5 * tie) / F.count(F.lit(1))).alias("c_index"),
    )


# ---------------------------------------------------------------------------
# Q698 — Yule's K and companions: lexical richness constants
# ---------------------------------------------------------------------------
# English-corpus token frequency spectrum: Yule's K = 1e4 (sum m^2
# V_m - N) / N^2, lexical Simpson's D, and Herdan's C = ln V / ln N
# — the length-robust richness constants beyond Heaps' law (q225)
# and vocabulary coverage (q386).
_Q698_ORACLE = """
    WITH toks AS MATERIALIZED (
      SELECT unnest(regexp_extract_all(LOWER(text), '[a-z]{2,}')) AS tok
      FROM documents WHERE lang = 'en'
    ), types AS MATERIALIZED (
      SELECT tok, COUNT(*) AS m FROM toks GROUP BY tok
    ), spectrum AS (
      SELECT m, COUNT(*) AS vm FROM types GROUP BY m
    ), agg AS (
      SELECT SUM(m * vm) AS n, SUM(vm) AS v,
             SUM(m * m * vm * 1.0) AS m2,
             SUM(m * (m - 1) * vm * 1.0) AS mm1
      FROM spectrum
    )
    SELECT CAST(n AS BIGINT) AS n_tokens,
           CAST(v AS BIGINT) AS n_types,
           ROUND(1e4 * (m2 - n) / (n * n * 1.0) + 5e-12, 6) AS yule_k,
           ROUND(mm1 / (n * (n - 1.0)) + 5e-12, 6) AS simpson_d,
           ROUND(LN(v) / LN(n) + 5e-12, 6) AS herdan_c
    FROM agg
"""


@register(
    "q698_yule_k",
    _Q698_ORACLE,
    doc="Lexical richness constants from the frequency spectrum: "
    "Yule's K, lexical Simpson's D and Herdan's C over the English "
    "corpus — the length-robust vocabulary measures beyond Heaps' "
    "law (q225), vocab coverage (q386) and Zipf (q125).",
)
def q698(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    toks = d.select(
        F.explode_outer(
            F.expr("regexp_extract_all(lower(text), '[a-z]{2,}', 0)")
        ).alias("tok")
    ).filter(F.col("tok").isNotNull())
    types = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("m"))
    spectrum = types.groupBy("m").agg(F.count(F.lit(1)).alias("vm"))
    agg = spectrum.agg(
        F.sum(F.col("m") * F.col("vm")).alias("n"),
        F.sum("vm").alias("v"),
        F.sum(F.col("m") * F.col("m") * F.col("vm") * 1.0).alias("m2"),
        F.sum(F.col("m") * (F.col("m") - 1) * F.col("vm") * 1.0).alias("mm1"),
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n_tokens"),
        F.col("v").cast("bigint").alias("n_types"),
        r6(1e4 * (F.col("m2") - F.col("n")) / (F.col("n") * F.col("n") * 1.0)).alias(
            "yule_k"
        ),
        r6(F.col("mm1") / (F.col("n") * (F.col("n") - 1.0))).alias("simpson_d"),
        r6(F.log("v") / F.log("n")).alias("herdan_c"),
    )


# ---------------------------------------------------------------------------
# Q699 — last-digit forensics on order prices
# ---------------------------------------------------------------------------
# Under clean generation the final digits of whole-dollar prices
# are uniform: chi-square of the last and second-to-last digits
# against uniformity and the repeated-digit-pair rate vs its 10%
# expectation — the election-forensics digit tests that complement
# Benford's first-digit law (q121) and price endings (q331).
_Q699_ORACLE = """
    WITH digits AS MATERIALIZED (
      SELECT CAST(ROUND(o_totalprice) AS BIGINT) % 10 AS d1,
             CAST(FLOOR(ROUND(o_totalprice) / 10) AS BIGINT) % 10 AS d2
      FROM orders
    ), n_tot AS (
      SELECT COUNT(*) AS n FROM digits
    ), c1 AS (
      SELECT d1 AS dig, COUNT(*) AS c FROM digits GROUP BY d1
    ), c2 AS (
      SELECT d2 AS dig, COUNT(*) AS c FROM digits GROUP BY d2
    ), chi AS (
      SELECT (SELECT SUM(POW(c - n.n / 10.0, 2) / (n.n / 10.0))
              FROM c1, n_tot n) AS chi_last,
             (SELECT SUM(POW(c - n.n / 10.0, 2) / (n.n / 10.0))
              FROM c2, n_tot n) AS chi_second,
             (SELECT AVG(CASE WHEN d1 = d2 THEN 1.0 ELSE 0 END)
              FROM digits) AS rep_rate,
             (SELECT n FROM n_tot) AS n
    )
    SELECT CAST(n AS BIGINT) AS n_prices,
           ROUND(chi_last + 5e-10, 4) AS chi2_last_digit,
           ROUND(chi_second + 5e-10, 4) AS chi2_second_digit,
           chi_last < 16.919 AND chi_second < 16.919 AS digits_uniform,
           ROUND(rep_rate + 5e-12, 6) AS repeated_pair_rate,
           ROUND(rep_rate - 0.1 + 5e-12, 6) AS repetition_excess
    FROM chi
"""


@register(
    "q699_digit_forensics",
    _Q699_ORACLE,
    doc="Last-digit forensics: chi-square uniformity of the final "
    "and penultimate whole-dollar digits (df 9 cutoff 16.919) and "
    "the repeated-pair rate vs 10% — the election-forensics digit "
    "tests beside Benford (q121) and price endings (q331).",
)
def q699(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    digits = o.select(
        (F.round("o_totalprice").cast("bigint") % 10).alias("d1"),
        (
            F.floor(F.round("o_totalprice") / 10).cast("bigint") % 10
        ).alias("d2"),
    ).localCheckpoint(eager=False)
    n_tot = digits.agg(F.count(F.lit(1)).alias("n"))
    chi_of = lambda col: (  # noqa: E731
        digits.groupBy(F.col(col).alias("dig"))
        .agg(F.count(F.lit(1)).alias("c"))
        .crossJoin(F.broadcast(n_tot))
        .agg(
            F.sum(
                F.pow(F.col("c") - F.col("n") / 10.0, 2) / (F.col("n") / 10.0)
            ).alias("chi")
        )
    )
    c1 = chi_of("d1").select(F.col("chi").alias("chi_last"))
    c2 = chi_of("d2").select(F.col("chi").alias("chi_second"))
    rep = digits.agg(
        F.avg(F.when(F.col("d1") == F.col("d2"), 1.0).otherwise(0.0)).alias(
            "rep_rate"
        )
    )
    return (
        n_tot.crossJoin(F.broadcast(c1))
        .crossJoin(F.broadcast(c2))
        .crossJoin(F.broadcast(rep))
        .select(
            F.col("n").cast("bigint").alias("n_prices"),
            F.round(F.col("chi_last") + F.lit(5e-10), 4).alias(
                "chi2_last_digit"
            ),
            F.round(F.col("chi_second") + F.lit(5e-10), 4).alias(
                "chi2_second_digit"
            ),
            (
                (F.col("chi_last") < 16.919) & (F.col("chi_second") < 16.919)
            ).alias("digits_uniform"),
            r6(F.col("rep_rate")).alias("repeated_pair_rate"),
            r6(F.col("rep_rate") - 0.1).alias("repetition_excess"),
        )
    )
