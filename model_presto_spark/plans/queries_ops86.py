"""Conformance queries batch #86 (q624+) — Breusch-Pagan test, DIF
detection, Ledoit-Wolf shrinkage, positivity checking, and multiple
testing procedures compared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q624 — Breusch-Pagan heteroskedasticity test
# ---------------------------------------------------------------------------
# Residuals of the spend-on-balance OLS, squared, regressed back on
# the regressor: BP = n R^2 of that auxiliary fit is chi-square(1)
# under homoskedasticity — the diagnostic that decides between the
# naive and robust (q530) standard errors.
_Q624_ORACLE = """
    WITH u AS MATERIALIZED (
      SELECT ROUND(c.c_acctbal * 100) / 1e5 AS x,
             COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0) / 1e6 AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_acctbal
    ), fit AS (
      SELECT COUNT(*) AS n, AVG(x) AS mx, AVG(y) AS my,
             (SUM(x * y) - COUNT(*) * AVG(x) * AVG(y))
               / (SUM(x * x) - COUNT(*) * AVG(x) * AVG(x)) AS b1
      FROM u
    ), resid AS (
      SELECT u.x,
             POW((u.y - f.my) - f.b1 * (u.x - f.mx), 2) AS e2
      FROM u, fit f
    ), aux AS (
      SELECT COUNT(*) AS n,
             POW(SUM(x * e2) - COUNT(*) * AVG(x) * AVG(e2), 2)
               / ((SUM(x * x) - COUNT(*) * AVG(x) * AVG(x))
                  * (SUM(e2 * e2) - COUNT(*) * AVG(e2) * AVG(e2))) AS r2
      FROM resid
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           ROUND(r2 + 5e-12, 6) AS aux_r2,
           ROUND(n * r2 + 5e-10, 4) AS bp_statistic,
           n * r2 > 3.841 AS heteroskedastic_at_5pct
    FROM aux
"""


@register(
    "q624_breusch_pagan",
    _Q624_ORACLE,
    doc="Breusch-Pagan test: squared OLS residuals regressed on the "
    "regressor, BP = n R^2 against the chi-square(1) 3.841 cutoff — "
    "the heteroskedasticity diagnostic that arbitrates between "
    "naive and cluster/robust standard errors (q530).",
)
def q624(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    u = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            (
                F.coalesce(F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0))
                / 1e6
            ).alias("y")
        )
        .select((F.round(F.col("c_acctbal") * 100) / 1e5).alias("x"), "y")
        .localCheckpoint(eager=False)
    )
    n = F.count(F.lit(1))
    fit = u.agg(
        n.alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        (
            (F.sum(F.col("x") * F.col("y")) - n * F.avg("x") * F.avg("y"))
            / (F.sum(F.col("x") * F.col("x")) - n * F.avg("x") * F.avg("x"))
        ).alias("b1"),
    )
    resid = u.crossJoin(F.broadcast(fit)).select(
        "x",
        F.pow(
            (F.col("y") - F.col("my")) - F.col("b1") * (F.col("x") - F.col("mx")),
            2,
        ).alias("e2"),
    )
    aux = resid.agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.pow(
                F.sum(F.col("x") * F.col("e2"))
                - F.count(F.lit(1)) * F.avg("x") * F.avg("e2"),
                2,
            )
            / (
                (
                    F.sum(F.col("x") * F.col("x"))
                    - F.count(F.lit(1)) * F.avg("x") * F.avg("x")
                )
                * (
                    F.sum(F.col("e2") * F.col("e2"))
                    - F.count(F.lit(1)) * F.avg("e2") * F.avg("e2")
                )
            )
        ).alias("r2"),
    )
    return aux.select(
        F.col("n").cast("bigint").alias("n_customers"),
        r6(F.col("r2")).alias("aux_r2"),
        F.round(F.col("n") * F.col("r2") + F.lit(5e-10), 4).alias(
            "bp_statistic"
        ),
        (F.col("n") * F.col("r2") > 3.841).alias("heteroskedastic_at_5pct"),
    )


# ---------------------------------------------------------------------------
# Q625 — differential item functioning via Mantel-Haenszel strata
# ---------------------------------------------------------------------------
# Does the top brand "item" behave differently for the two nation-
# parity groups at the SAME ability (total bought-brand score)?
# The Mantel-Haenszel common odds ratio across score strata is the
# DIF statistic — fairness for test items (Rasch q534 / CTT q623's
# required audit, CMH q227's psychometric application).
_Q625_ORACLE = """
    WITH items AS MATERIALIZED (
      SELECT p.p_brand AS brand
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand ORDER BY COUNT(*) DESC, brand LIMIT 8
    ), resp AS MATERIALIZED (
      SELECT o.o_custkey AS person,
             MAX(o.o_custkey % 2) AS grp,
             i.brand,
             MAX(CASE WHEN p.p_brand = i.brand THEN 1 ELSE 0 END) AS x
      FROM orders o
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      CROSS JOIN items i
      GROUP BY o.o_custkey, i.brand
    ), focal AS (
      SELECT brand FROM items ORDER BY brand LIMIT 1
    ), scored AS MATERIALIZED (
      SELECT r.person, r.grp,
             MAX(CASE WHEN r.brand = (SELECT brand FROM focal)
                      THEN r.x END) AS item_x,
             SUM(CASE WHEN r.brand <> (SELECT brand FROM focal)
                      THEN r.x ELSE 0 END) AS rest
      FROM resp r GROUP BY r.person, r.grp
    ), strata AS (
      SELECT rest AS s,
             SUM(CASE WHEN grp = 0 AND item_x = 1 THEN 1 ELSE 0 END) AS a,
             SUM(CASE WHEN grp = 0 AND item_x = 0 THEN 1 ELSE 0 END) AS b,
             SUM(CASE WHEN grp = 1 AND item_x = 1 THEN 1 ELSE 0 END) AS c,
             SUM(CASE WHEN grp = 1 AND item_x = 0 THEN 1 ELSE 0 END) AS d
      FROM scored GROUP BY rest
      HAVING COUNT(*) >= 10
    ), mh AS (
      SELECT SUM(a * d * 1.0 / (a + b + c + d)) AS num,
             SUM(b * c * 1.0 / (a + b + c + d)) AS den,
             COUNT(*) AS n_strata
      FROM strata
    )
    SELECT (SELECT brand FROM focal) AS focal_item,
           CAST(n_strata AS BIGINT) AS n_strata,
           ROUND(num / den + 5e-12, 6) AS mh_odds_ratio,
           ROUND(LN(num / den) + 5e-12, 6) AS log_mh_or,
           ABS(LN(num / den)) > 0.43 AS flagged_dif
    FROM mh
"""


@register(
    "q625_dif_detection",
    _Q625_ORACLE,
    doc="Differential item functioning: Mantel-Haenszel common odds "
    "ratio for the focal brand-item across rest-score strata "
    "between parity groups (|log OR| > 0.43 = ETS level-B flag) — "
    "item fairness auditing on the CTT/Rasch stack (q623/q534), "
    "CMH (q227) applied where it was invented.",
)
def q625(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lp = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).join(
        o, li.l_orderkey == o.o_orderkey
    ).localCheckpoint(eager=False)
    items = (
        lp.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "p_brand")
        .limit(8)
        .select(F.col("p_brand").alias("brand"))
        .localCheckpoint(eager=False)
    )
    focal = items.orderBy("brand").limit(1).select(
        F.col("brand").alias("fb")
    )
    # sparse ownership + dense persons x items grid — the
    # crossJoin(items) form shuffled |lp| x 8 rows just to materialize
    # the x=0 cells (same rewrite as q623)
    owned = (
        lp.join(F.broadcast(items), lp.p_brand == F.col("brand"))
        .groupBy(F.col("o_custkey").alias("person"), "brand")
        .agg(F.lit(1).alias("x1"))
    )
    persons_all = lp.select(F.col("o_custkey").alias("person")).distinct()
    resp = (
        persons_all.crossJoin(F.broadcast(items))
        .join(owned, ["person", "brand"], "left")
        .select("person", "brand", F.coalesce("x1", F.lit(0)).alias("x"))
    )
    scored = (
        resp.crossJoin(F.broadcast(focal))
        .groupBy("person")
        .agg(
            F.max(
                F.when(F.col("brand") == F.col("fb"), F.col("x"))
            ).alias("item_x"),
            F.sum(
                F.when(F.col("brand") != F.col("fb"), F.col("x")).otherwise(0)
            ).alias("rest"),
        )
        .select(
            (F.col("person") % 2).alias("grp"), "item_x", "rest"
        )
    )
    strata = (
        scored.groupBy(F.col("rest").alias("s"))
        .agg(
            F.sum(
                F.when((F.col("grp") == 0) & (F.col("item_x") == 1), 1).otherwise(0)
            ).alias("a"),
            F.sum(
                F.when((F.col("grp") == 0) & (F.col("item_x") == 0), 1).otherwise(0)
            ).alias("b"),
            F.sum(
                F.when((F.col("grp") == 1) & (F.col("item_x") == 1), 1).otherwise(0)
            ).alias("c"),
            F.sum(
                F.when((F.col("grp") == 1) & (F.col("item_x") == 0), 1).otherwise(0)
            ).alias("d"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .filter(F.col("cnt") >= 10)
    )
    tot = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    mh = strata.agg(
        F.sum(F.col("a") * F.col("d") * 1.0 / tot).alias("num"),
        F.sum(F.col("b") * F.col("c") * 1.0 / tot).alias("den"),
        F.count(F.lit(1)).alias("n_strata"),
    )
    orr = F.col("num") / F.col("den")
    return mh.crossJoin(F.broadcast(focal)).select(
        F.col("fb").alias("focal_item"),
        F.col("n_strata").cast("bigint").alias("n_strata"),
        r6(orr).alias("mh_odds_ratio"),
        r6(F.log(orr)).alias("log_mh_or"),
        (F.abs(F.log(orr)) > 0.43).alias("flagged_dif"),
    )


# ---------------------------------------------------------------------------
# Q626 — Ledoit-Wolf shrinkage toward the identity
# ---------------------------------------------------------------------------
# Five nation-bloc daily return series: the sample correlation
# matrix's off-diagonal energy vs its estimation noise gives the
# closed-form shrinkage intensity (a Ledoit-Wolf-style ratio), and
# the shrunk average correlation — the covariance regularization a
# min-variance portfolio (q403) needs before inverting anything.
_Q626_ORACLE = """
    WITH nd AS MATERIALIZED (
      SELECT c.c_nationkey % 5 AS a, EXTRACT(day FROM e.ts) AS d,
             SUM(ROUND(e.value * 100)) AS rev
      FROM events e JOIN customer c ON c.c_custkey = e.user_id
      WHERE e.event_type = 'purchase'
      GROUP BY c.c_nationkey % 5, EXTRACT(day FROM e.ts)
    ), rets AS MATERIALIZED (
      SELECT a, d,
             rev * 1.0 / LAG(rev) OVER (PARTITION BY a ORDER BY d) - 1 AS r
      FROM nd
    ), rr AS MATERIALIZED (
      SELECT a, d, r FROM rets WHERE r IS NOT NULL
    ), pairs AS MATERIALIZED (
      SELECT x.a AS i, y.a AS j, corr(x.r, y.r) AS rho,
             COUNT(*) AS n
      FROM rr x JOIN rr y ON y.d = x.d AND y.a > x.a
      GROUP BY x.a, y.a
    ), lw AS (
      SELECT AVG(rho) AS rbar,
             AVG(rho * rho) AS r2bar,
             AVG((1 - rho * rho) * (1 - rho * rho) / (n - 1.0)) AS noise,
             COUNT(*) AS n_pairs
      FROM pairs
    )
    SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
           ROUND(rbar + 5e-12, 6) AS mean_correlation,
           ROUND(LEAST(1.0, GREATEST(0.0, noise / r2bar)) + 5e-12, 6)
             AS shrinkage_intensity,
           ROUND(rbar * (1 - LEAST(1.0, GREATEST(0.0, noise / r2bar)))
                 + 5e-12, 6) AS shrunk_mean_correlation
    FROM lw
"""


@register(
    "q626_ledoit_wolf",
    _Q626_ORACLE,
    doc="Ledoit-Wolf-style shrinkage: pairwise return correlations of "
    "five nation blocs, estimation noise (1-rho^2)^2/(n-1) over "
    "signal rho^2 gives the intensity, off-diagonals shrunk toward "
    "zero — the covariance regularization minimum-variance weights "
    "(q403) should consume.",
)
def q626(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nd = (
        ev.join(F.broadcast(c), ev.user_id == c.c_custkey)
        .groupBy(
            (F.col("c_nationkey") % 5).alias("a"), F.dayofmonth("ts").alias("d")
        )
        .agg(F.sum(F.round(F.col("value") * 100)).alias("rev"))
    )
    w = Window.partitionBy("a").orderBy("d")
    rr = nd.select(
        "a",
        "d",
        (F.col("rev") * 1.0 / F.lag("rev").over(w) - 1).alias("r"),
    ).filter(F.col("r").isNotNull()).localCheckpoint(eager=False)
    x = rr.select(F.col("a").alias("i"), "d", F.col("r").alias("ri"))
    y = rr.select(F.col("a").alias("j"), "d", F.col("r").alias("rj"))
    pairs = (
        x.join(y, "d")
        .filter(F.col("j") > F.col("i"))
        .groupBy("i", "j")
        .agg(F.corr("ri", "rj").alias("rho"), F.count(F.lit(1)).alias("n"))
    )
    lw = pairs.agg(
        F.avg("rho").alias("rbar"),
        F.avg(F.col("rho") * F.col("rho")).alias("r2bar"),
        F.avg(
            (1 - F.col("rho") * F.col("rho"))
            * (1 - F.col("rho") * F.col("rho"))
            / (F.col("n") - 1.0)
        ).alias("noise"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    inten = F.least(
        F.lit(1.0), F.greatest(F.lit(0.0), F.col("noise") / F.col("r2bar"))
    )
    return lw.select(
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        r6(F.col("rbar")).alias("mean_correlation"),
        r6(inten).alias("shrinkage_intensity"),
        r6(F.col("rbar") * (1 - inten)).alias("shrunk_mean_correlation"),
    )


# ---------------------------------------------------------------------------
# Q627 — positivity / common support check
# ---------------------------------------------------------------------------
# IPW (q360) and matching (q509) require every stratum to contain
# BOTH arms: the balance-decile propensity table shows the share of
# strata with common support, the extreme-propensity population
# (> 0.9 or < 0.1), and the effective sample after trimming — the
# positivity diagnostic that must precede any weighting estimate.
_Q627_ORACLE = """
    WITH u AS MATERIALIZED (
      SELECT CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS t,
             NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS dec
      FROM customer
    ), strata AS (
      SELECT dec, COUNT(*) AS n, AVG(t * 1.0) AS pscore
      FROM u GROUP BY dec
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
           CAST(SUM(CASE WHEN pscore > 0 AND pscore < 1
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS strata_with_support,
           ROUND(MIN(pscore) + 5e-12, 6) AS min_propensity,
           ROUND(MAX(pscore) + 5e-12, 6) AS max_propensity,
           ROUND(SUM(CASE WHEN pscore BETWEEN 0.1 AND 0.9
                          THEN n ELSE 0 END) * 1.0 / SUM(n) + 5e-12, 6)
             AS trimmed_sample_share
    FROM strata
"""


@register(
    "q627_positivity_check",
    _Q627_ORACLE,
    doc="Positivity / common-support diagnostic: balance-decile "
    "propensity table with the both-arms share, extreme-propensity "
    "bounds and the 0.1-0.9 trimmed sample share — the overlap "
    "check that licenses IPW (q360), matching (q509) and backdoor "
    "(q481) in the first place.",
)
def q627(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    u = c.select(
        F.when(F.col("c_mktsegment") == "AUTOMOBILE", 1).otherwise(0).alias("t"),
        F.ntile(10).over(Window.orderBy("c_acctbal", "c_custkey")).alias("dec"),
    )
    strata = u.groupBy("dec").agg(
        F.count(F.lit(1)).alias("n"), F.avg(F.col("t") * 1.0).alias("pscore")
    )
    return strata.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum(
            F.when((F.col("pscore") > 0) & (F.col("pscore") < 1), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("strata_with_support"),
        r6(F.min("pscore")).alias("min_propensity"),
        r6(F.max("pscore")).alias("max_propensity"),
        r6(
            F.sum(
                F.when(
                    F.col("pscore").between(0.1, 0.9), F.col("n")
                ).otherwise(0)
            )
            * 1.0
            / F.sum("n")
        ).alias("trimmed_sample_share"),
    )


# ---------------------------------------------------------------------------
# Q628 — multiple-testing procedures, compared on the same tests
# ---------------------------------------------------------------------------
# Twenty-five one-vs-rest nation mean-spend z-tests: rejections
# uncorrected, Bonferroni (alpha/m) and Benjamini-Hochberg (q373's
# procedure) counted side by side with the smallest surviving
# z-cutoffs — the FWER-vs-FDR tradeoff as one table (p-values via
# the A&S normal CDF both engines share).
_Q628_ORACLE = """
    WITH u AS MATERIALIZED (
      SELECT c.c_nationkey AS g,
             COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0) / 1e5 AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_nationkey
    ), tot AS (
      SELECT AVG(y) AS mu, stddev_pop(y) AS sd, COUNT(*) AS n FROM u
    ), per AS (
      SELECT g, COUNT(*) AS ng, AVG(y) AS mg FROM u GROUP BY g
    ), z AS (
      SELECT p.g,
             ABS(p.mg - t.mu) / (t.sd / SQRT(p.ng)) AS az
      FROM per p, tot t
    ), pv AS (
      SELECT g, az,
             2 * (CASE WHEN az >= 0 THEN
               EXP(-az * az / 2) * 0.3989422804014327
               * ((((1.330274429 / (1 + 0.2316419 * az) - 1.821255978)
                    / (1 + 0.2316419 * az) + 1.781477937)
                   / (1 + 0.2316419 * az) - 0.356563782)
                  / (1 + 0.2316419 * az) + 0.319381530)
               / (1 + 0.2316419 * az) ELSE 0.5 END) AS p
      FROM z
    ), ranked AS (
      SELECT g, p, ROW_NUMBER() OVER (ORDER BY p, g) AS rk,
             COUNT(*) OVER () AS m
      FROM pv
    ), bh AS (
      SELECT MAX(CASE WHEN p <= 0.05 * rk / m THEN rk ELSE 0 END) AS kmax
      FROM ranked
    )
    SELECT CAST((SELECT MAX(m) FROM ranked) AS BIGINT) AS n_tests,
           CAST((SELECT COUNT(*) FROM ranked WHERE p <= 0.05) AS BIGINT)
             AS uncorrected_rejections,
           CAST((SELECT COUNT(*) FROM ranked, (SELECT MAX(m) AS m2
                 FROM ranked) mm WHERE p <= 0.05 / mm.m2) AS BIGINT)
             AS bonferroni_rejections,
           CAST((SELECT kmax FROM bh) AS BIGINT) AS bh_rejections
"""


@register(
    "q628_multiple_testing",
    _Q628_ORACLE,
    doc="Multiple-testing procedures on the same 25 one-vs-rest "
    "nation z-tests (A&S normal CDF p-values): uncorrected vs "
    "Bonferroni vs Benjamini-Hochberg rejection counts — the "
    "FWER/FDR tradeoff as one table, generalizing the single BH "
    "pass (q373).",
)
def q628(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    u = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_nationkey")
        .agg(
            (
                F.coalesce(F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0))
                / 1e5
            ).alias("y")
        )
        .select(F.col("c_nationkey").alias("g"), "y")
        .localCheckpoint(eager=False)
    )
    tot = u.agg(
        F.avg("y").alias("mu"),
        F.stddev_pop("y").alias("sd"),
    )
    per = u.groupBy("g").agg(
        F.count(F.lit(1)).alias("ng"), F.avg("y").alias("mg")
    )
    z = per.crossJoin(F.broadcast(tot)).select(
        "g",
        (
            F.abs(F.col("mg") - F.col("mu"))
            / (F.col("sd") / F.sqrt(F.col("ng")))
        ).alias("az"),
    )
    az = F.col("az")
    t = 1 / (1 + 0.2316419 * az)
    poly = (
        (((1.330274429 * t - 1.821255978) * t + 1.781477937) * t - 0.356563782)
        * t
        + 0.319381530
    ) * t
    pval = 2 * (F.exp(-az * az / 2) * 0.3989422804014327 * poly)
    pv = z.select("g", pval.alias("p"))
    ranked = pv.select(
        "g",
        "p",
        F.row_number().over(Window.orderBy("p", "g")).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("m"),
    ).localCheckpoint(eager=False)
    bh = ranked.agg(
        F.max(
            F.when(
                F.col("p") <= 0.05 * F.col("rk") / F.col("m"), F.col("rk")
            ).otherwise(0)
        ).alias("kmax")
    )
    stats = ranked.agg(
        F.max("m").alias("n_tests"),
        F.sum(F.when(F.col("p") <= 0.05, 1).otherwise(0)).alias("unc"),
        F.sum(
            F.when(F.col("p") <= 0.05 / F.col("m"), 1).otherwise(0)
        ).alias("bonf"),
    )
    return stats.crossJoin(F.broadcast(bh)).select(
        F.col("n_tests").cast("bigint").alias("n_tests"),
        F.col("unc").cast("bigint").alias("uncorrected_rejections"),
        F.col("bonf").cast("bigint").alias("bonferroni_rejections"),
        F.col("kmax").cast("bigint").alias("bh_rejections"),
    )
