"""Conformance queries batch #67 (q529+) — HMM forward likelihood,
cluster-robust standard errors, Kahan summation, look-ahead bias,
and mediation analysis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q529 — HMM forward algorithm (sum-product semiring)
# ---------------------------------------------------------------------------
# The same two-state demand-regime HMM as the Viterbi decode (q444)
# but in the SUM-product semiring: the scaled forward recursion
# (normalize each step, accumulate log c_t) gives the exact sequence
# log-likelihood and the filtered P(high | all obs); the iid
# baseline log-likelihood turns it into a likelihood-ratio for
# "is there regime persistence at all".
_Q529_ORACLE = """
    WITH daily AS (
      SELECT CAST(EXTRACT(day FROM ts) AS BIGINT) AS d, COUNT(*) AS c
      FROM events WHERE event_type = 'purchase' AND EXTRACT(day FROM ts) <= 28
      GROUP BY 1
    ), thr AS (
      SELECT CAST(SUM(c) // COUNT(*) AS BIGINT) AS t FROM daily
    ), obs AS (
      SELECT list(CASE WHEN c >= t THEN 1.0 ELSE 0.0 END ORDER BY d) AS o,
             AVG(CASE WHEN c >= t THEN 1.0 ELSE 0.0 END) AS p1
      FROM daily, thr GROUP BY t
    ), fwd AS (
      SELECT o, p1,
        list_reduce(
          list_prepend([0.5, 0.5, CAST(0.0 AS DOUBLE)],
                       list_transform(o, x -> [x])),
          (st, x) -> [
            (CASE WHEN x[1] = 1.0 THEN 0.7 ELSE 0.3 END)
              * (st[1] * 0.8 + st[2] * 0.2)
              / ((CASE WHEN x[1] = 1.0 THEN 0.7 ELSE 0.3 END)
                 * (st[1] * 0.8 + st[2] * 0.2)
                 + (CASE WHEN x[1] = 1.0 THEN 0.3 ELSE 0.7 END)
                 * (st[2] * 0.8 + st[1] * 0.2)),
            (CASE WHEN x[1] = 1.0 THEN 0.3 ELSE 0.7 END)
              * (st[2] * 0.8 + st[1] * 0.2)
              / ((CASE WHEN x[1] = 1.0 THEN 0.7 ELSE 0.3 END)
                 * (st[1] * 0.8 + st[2] * 0.2)
                 + (CASE WHEN x[1] = 1.0 THEN 0.3 ELSE 0.7 END)
                 * (st[2] * 0.8 + st[1] * 0.2)),
            st[3] + LN((CASE WHEN x[1] = 1.0 THEN 0.7 ELSE 0.3 END)
                       * (st[1] * 0.8 + st[2] * 0.2)
                       + (CASE WHEN x[1] = 1.0 THEN 0.3 ELSE 0.7 END)
                       * (st[2] * 0.8 + st[1] * 0.2))
          ]
        ) AS st
      FROM obs
    ), base AS (
      SELECT o, p1,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(o, x -> CASE WHEN x = 1.0 THEN LN(p1)
                                           ELSE LN(1 - p1) END)),
               (a, b) -> a + b) AS ll0
      FROM obs
    )
    SELECT CAST(len(fwd.o) AS BIGINT) AS n_days,
           ROUND(fwd.st[3] + 5e-12, 6) AS hmm_loglik,
           ROUND(base.ll0 + 5e-12, 6) AS iid_loglik,
           ROUND(fwd.st[3] - base.ll0 + 5e-12, 6) AS log_lr,
           ROUND(fwd.st[1] + 5e-12, 6) AS p_high_final
    FROM fwd, base
"""


@register(
    "q529_hmm_forward",
    _Q529_ORACLE,
    doc="HMM forward algorithm (scaled, log-likelihood accumulating) "
    "on the daily demand regime: sum-product semiring where Viterbi "
    "(q444) ran max-plus, with the iid-baseline log-likelihood "
    "ratio testing regime persistence and the filtered P(high) at "
    "the horizon.",
)
def q529(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.dayofmonth("ts") <= 28)
    )
    daily = ev.groupBy(F.dayofmonth("ts").cast("bigint").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    obs = daily.agg(
        F.floor(F.sum("c") / F.count(F.lit(1))).alias("t"),
        F.sort_array(F.collect_list(F.struct("d", "c"))).alias("dc"),
    ).select(
        F.transform(
            "dc",
            lambda s: F.when(s.c >= F.col("t"), 1.0).otherwise(0.0),
        ).alias("o")
    ).select(
        "o",
        F.aggregate(F.col("o"), F.lit(0.0), lambda a, b: a + b)
        / F.size("o").cast("double"),
    )
    obs = obs.toDF("o", "p1")

    def step(st, x):
        eh = F.when(x == 1.0, 0.7).otherwise(0.3)
        el = F.when(x == 1.0, 0.3).otherwise(0.7)
        nh = eh * (F.element_at(st, 1) * 0.8 + F.element_at(st, 2) * 0.2)
        nl = el * (F.element_at(st, 2) * 0.8 + F.element_at(st, 1) * 0.2)
        c = nh + nl
        return F.array(nh / c, nl / c, F.element_at(st, 3) + F.log(c))

    fwd = obs.select(
        "o",
        "p1",
        F.aggregate(
            F.col("o"), F.array(F.lit(0.5), F.lit(0.5), F.lit(0.0)), step
        ).alias("st"),
    )
    ll0 = F.aggregate(
        F.transform(
            F.col("o"),
            lambda x: F.when(x == 1.0, F.log("p1")).otherwise(
                F.log(1 - F.col("p1"))
            ),
        ),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    return fwd.select(
        F.size("o").cast("bigint").alias("n_days"),
        r6(F.element_at("st", 3)).alias("hmm_loglik"),
        r6(ll0).alias("iid_loglik"),
        r6(F.element_at("st", 3) - ll0).alias("log_lr"),
        r6(F.element_at("st", 1)).alias("p_high_final"),
    )


# ---------------------------------------------------------------------------
# Q530 — cluster-robust (Liang-Zeger) standard errors
# ---------------------------------------------------------------------------
# Spend-on-balance OLS with customers clustered by nation: the
# sandwich variance sums CLUSTER score totals (sum x~e per nation)
# squared, against the iid residual variance — the SE inflation that
# within-cluster correlation causes, with the small-sample G/(G-1)
# correction.  Same point estimate, honest uncertainty.
_Q530_ORACLE = """
    WITH u AS MATERIALIZED (
      SELECT c.c_nationkey AS g,
             ROUND(c.c_acctbal * 100) * 1.0 AS x,
             COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0) * 1.0 AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_nationkey, c.c_acctbal
    ), m AS (
      SELECT COUNT(*) AS n, AVG(x) AS mx, AVG(y) AS my,
             SUM(x * x) - COUNT(*) * AVG(x) * AVG(x) AS sxx,
             SUM(x * y) - COUNT(*) * AVG(x) * AVG(y) AS sxy
      FROM u
    ), fit AS (
      SELECT n, mx, my, sxx, sxy / sxx AS b1 FROM m
    ), resid AS (
      SELECT u.g, (u.x - f.mx) AS xt,
             (u.y - f.my) - f.b1 * (u.x - f.mx) AS e
      FROM u, fit f
    ), naive AS (
      SELECT SUM(e * e) / ((SELECT n FROM fit) - 2) AS s2 FROM resid
    ), clus AS (
      SELECT SUM(sg * sg) AS meat, COUNT(*) AS gk FROM (
        SELECT g, SUM(xt * e) AS sg FROM resid GROUP BY g)
    )
    SELECT CAST((SELECT n FROM fit) AS BIGINT) AS n_customers,
           CAST(clus.gk AS BIGINT) AS n_clusters,
           ROUND(fit.b1 + 5e-12, 6) AS slope,
           ROUND(SQRT(naive.s2 / fit.sxx) + 5e-12, 6) AS naive_se,
           ROUND(SQRT(clus.meat * clus.gk / (clus.gk - 1.0))
                 / fit.sxx + 5e-12, 6) AS cluster_se,
           ROUND((SQRT(clus.meat * clus.gk / (clus.gk - 1.0)) / fit.sxx)
                 / SQRT(naive.s2 / fit.sxx) + 5e-12, 6) AS se_inflation
    FROM fit, naive, clus
"""


@register(
    "q530_clustered_se",
    _Q530_ORACLE,
    doc="Cluster-robust (Liang-Zeger) standard errors for the "
    "spend-on-balance OLS with nation clusters: sandwich variance "
    "from squared cluster score sums with the G/(G-1) correction vs "
    "the iid SE — the inference correction the design-effect table "
    "(q423) predicts and the within estimator (q239) sidesteps.",
)
def q530(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    u = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_nationkey", "c_acctbal")
        .agg(
            (
                F.coalesce(F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0))
                * 1.0
            ).alias("y")
        )
        .select(
            F.col("c_nationkey").alias("g"),
            (F.round(F.col("c_acctbal") * 100) * 1.0).alias("x"),
            "y",
        )
        .localCheckpoint(eager=False)
    )
    m = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        (F.sum(F.col("x") * F.col("x")) - F.count(F.lit(1)) * F.avg("x") * F.avg("x")).alias(
            "sxx"
        ),
        (F.sum(F.col("x") * F.col("y")) - F.count(F.lit(1)) * F.avg("x") * F.avg("y")).alias(
            "sxy"
        ),
    )
    fit = m.select(
        "n", "mx", "my", "sxx", (F.col("sxy") / F.col("sxx")).alias("b1")
    )
    resid = u.crossJoin(F.broadcast(fit)).select(
        "g",
        (F.col("x") - F.col("mx")).alias("xt"),
        ((F.col("y") - F.col("my")) - F.col("b1") * (F.col("x") - F.col("mx"))).alias(
            "e"
        ),
    ).localCheckpoint(eager=False)
    naive = resid.agg(F.sum(F.col("e") * F.col("e")).alias("sse"))
    clus = (
        resid.groupBy("g")
        .agg(F.sum(F.col("xt") * F.col("e")).alias("sg"))
        .agg(
            F.sum(F.col("sg") * F.col("sg")).alias("meat"),
            F.count(F.lit(1)).alias("gk"),
        )
    )
    naive_se = F.sqrt(
        F.col("sse") / (F.col("n") - 2) / F.col("sxx")
    )
    cluster_se = (
        F.sqrt(F.col("meat") * F.col("gk") / (F.col("gk") - 1.0)) / F.col("sxx")
    )
    return (
        fit.crossJoin(F.broadcast(naive))
        .crossJoin(F.broadcast(clus))
        .select(
            F.col("n").cast("bigint").alias("n_customers"),
            F.col("gk").cast("bigint").alias("n_clusters"),
            r6(F.col("b1")).alias("slope"),
            r6(naive_se).alias("naive_se"),
            r6(cluster_se).alias("cluster_se"),
            r6(cluster_se / naive_se).alias("se_inflation"),
        )
    )


# ---------------------------------------------------------------------------
# Q531 — Kahan compensated summation, audited against exact cents
# ---------------------------------------------------------------------------
# Order prices summed three ways over the SAME orderkey-sorted
# sequence: a naive double fold, a Kahan compensated fold carrying
# [sum, compensation], and the exact integer-cents total.  The
# compensated fold lands within one ulp of exact while the naive
# fold drifts — floating-point numerics made measurable (and both
# folds run in identical order cross-engine, so the drift itself is
# reproducible).
_Q531_ORACLE = """
    WITH xs AS (
      SELECT list(o_totalprice ORDER BY o_orderkey) AS v,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS exact_c
      FROM orders
    ), naive AS (
      SELECT exact_c,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE), v),
                         (a, b) -> a + b) AS s
      FROM xs
    ), kahan AS (
      SELECT list_reduce(
               list_prepend([CAST(0.0 AS DOUBLE), 0.0],
                            list_transform(v, x -> [x])),
               (st, x) -> [
                 st[1] + (x[1] - st[2]),
                 ((st[1] + (x[1] - st[2])) - st[1]) - (x[1] - st[2])
               ]
             )[1] AS s
      FROM xs
    )
    SELECT CAST((SELECT len(v) FROM xs) AS BIGINT) AS n_values,
           ROUND(ABS(naive.s * 100 - naive.exact_c) + 5e-10, 4)
             AS naive_err_cents,
           ROUND(ABS(kahan.s * 100 - naive.exact_c) + 5e-10, 4)
             AS kahan_err_cents,
           ABS(kahan.s * 100 - naive.exact_c)
             <= ABS(naive.s * 100 - naive.exact_c) AS kahan_no_worse
    FROM naive, kahan
"""


@register(
    "q531_kahan_summation",
    _Q531_ORACLE,
    doc="Kahan compensated summation audited: naive double fold vs "
    "[sum, compensation] fold over the identical orderkey-sorted "
    "price sequence, both measured in cents against the exact "
    "integer total — floating-point error made reproducible "
    "cross-engine (the numerics footnote under every AVG in the "
    "suite).",
)
def q531(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    xs = o.agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct("o_orderkey", "o_totalprice"))
            ),
            lambda s: s.o_totalprice,
        ).alias("v"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("exact_c"),
    )
    naive = F.aggregate(F.col("v"), F.lit(0.0), lambda a, b: a + b)

    def kstep(st, x):
        yv = x - F.element_at(st, 2)
        t = F.element_at(st, 1) + yv
        return F.array(t, (t - F.element_at(st, 1)) - yv)

    kahan = F.element_at(
        F.aggregate(F.col("v"), F.array(F.lit(0.0), F.lit(0.0)), kstep), 1
    )
    return xs.select(
        F.size("v").cast("bigint").alias("n_values"),
        F.round(
            F.abs(naive * 100 - F.col("exact_c")) + F.lit(5e-10), 4
        ).alias("naive_err_cents"),
        F.round(
            F.abs(kahan * 100 - F.col("exact_c")) + F.lit(5e-10), 4
        ).alias("kahan_err_cents"),
        (
            F.abs(kahan * 100 - F.col("exact_c"))
            <= F.abs(naive * 100 - F.col("exact_c"))
        ).alias("kahan_no_worse"),
    )


# ---------------------------------------------------------------------------
# Q532 — look-ahead bias, quantified
# ---------------------------------------------------------------------------
# "Top brands" portfolios: selecting on H2 revenue and then scoring
# on H2 (the look-ahead sin) vs selecting on H1 and scoring
# out-of-sample on H2 — the share-of-revenue overstatement and the
# selection overlap quantify exactly how much the leak flatters the
# backtest (rolling-origin q295's cautionary twin).
_Q532_ORACLE = """
    WITH br AS MATERIALIZED (
      SELECT p.p_brand AS brand,
             SUM(CASE WHEN EXTRACT(month FROM o.o_orderdate) <= 6
                      THEN ROUND(l.l_extendedprice * 100) ELSE 0 END) AS h1,
             SUM(CASE WHEN EXTRACT(month FROM o.o_orderdate) > 6
                      THEN ROUND(l.l_extendedprice * 100) ELSE 0 END) AS h2
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand
    ), sel_ahead AS (
      SELECT brand FROM br ORDER BY h2 DESC, brand LIMIT 5
    ), sel_honest AS (
      SELECT brand FROM br ORDER BY h1 DESC, brand LIMIT 5
    ), tot AS (SELECT SUM(h2) AS th2 FROM br)
    SELECT
      CAST((SELECT COUNT(*) FROM sel_ahead a
            JOIN sel_honest h ON h.brand = a.brand) AS BIGINT)
        AS selection_overlap,
      ROUND((SELECT SUM(h2) FROM br WHERE brand IN
             (SELECT brand FROM sel_ahead)) * 1.0 / tot.th2 + 5e-12, 6)
        AS lookahead_h2_share,
      ROUND((SELECT SUM(h2) FROM br WHERE brand IN
             (SELECT brand FROM sel_honest)) * 1.0 / tot.th2 + 5e-12, 6)
        AS honest_h2_share,
      ROUND(((SELECT SUM(h2) FROM br WHERE brand IN
              (SELECT brand FROM sel_ahead))
             - (SELECT SUM(h2) FROM br WHERE brand IN
                (SELECT brand FROM sel_honest))) * 1.0 / tot.th2
            + 5e-12, 6) AS overstatement
    FROM tot
"""


@register(
    "q532_lookahead_bias",
    _Q532_ORACLE,
    doc="Look-ahead bias quantified: top-5 brand portfolio selected "
    "on H2 and scored on H2 vs selected on H1 and scored "
    "out-of-sample — selection overlap and the revenue-share "
    "overstatement the leak produces (rolling-origin q295's "
    "cautionary twin).",
)
def q532(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cents = F.round(F.col("l_extendedprice") * 100)
    br = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum(F.when(F.month("o_orderdate") <= 6, cents).otherwise(0)).alias(
                "h1"
            ),
            F.sum(F.when(F.month("o_orderdate") > 6, cents).otherwise(0)).alias(
                "h2"
            ),
        )
        .localCheckpoint(eager=False)
    )
    sel_a = br.orderBy(F.desc("h2"), "brand").limit(5).select("brand")
    sel_h = br.orderBy(F.desc("h1"), "brand").limit(5).select("brand")
    tot = br.agg(F.sum("h2").alias("th2"))
    sa = br.join(sel_a, "brand").agg(F.sum("h2").alias("ah2"))
    sh = br.join(sel_h, "brand").agg(F.sum("h2").alias("hh2"))
    overlap = sel_a.join(
        sel_h.select(F.col("brand").alias("b2")), F.col("brand") == F.col("b2")
    ).agg(F.count(F.lit(1)).alias("ov"))
    return (
        tot.crossJoin(F.broadcast(sa))
        .crossJoin(F.broadcast(sh))
        .crossJoin(F.broadcast(overlap))
        .select(
            F.col("ov").cast("bigint").alias("selection_overlap"),
            r6(F.col("ah2") * 1.0 / F.col("th2")).alias("lookahead_h2_share"),
            r6(F.col("hh2") * 1.0 / F.col("th2")).alias("honest_h2_share"),
            r6((F.col("ah2") - F.col("hh2")) * 1.0 / F.col("th2")).alias(
                "overstatement"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Q533 — mediation analysis with the exact OLS decomposition
# ---------------------------------------------------------------------------
# Balance (X) -> order count (M) -> spend (Y): path a from M~X, and
# (b, c') from the two-regressor Y ~ X + M solved by Cramer (q499's
# machinery).  The OLS identity total = direct + indirect
# (c = c' + a*b) holds EXACTLY and is reported as the audit; Sobel's
# z tests the indirect path — the mediation toolkit beside backdoor
# (q481) and matching (q509).
_Q533_ORACLE = """
    WITH u AS MATERIALIZED (
      SELECT ROUND(c.c_acctbal * 100) / 1000.0 AS x,
             COUNT(o.o_orderkey) * 1.0 AS m,
             COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0) / 100000.0 AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_acctbal
    ), mom AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(m) AS sm, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * m) AS sxm, SUM(m * m) AS smm,
             SUM(x * y) AS sxy, SUM(m * y) AS smy
      FROM u
    ), c1 AS (
      SELECT n,
             sxx - sx * sx / n AS cxx, sxm - sx * sm / n AS cxm,
             smm - sm * sm / n AS cmm, sxy - sx * sy / n AS cxy,
             smy - sm * sy / n AS cmy
      FROM mom
    ), paths AS (
      SELECT n, cxx, cxm, cmm, cxy, cmy,
             cxm / cxx AS a,
             (cmy * cxx - cxy * cxm) / (cmm * cxx - cxm * cxm) AS b,
             (cxy * cmm - cmy * cxm) / (cmm * cxx - cxm * cxm) AS c_prime,
             cxy / cxx AS c_total
      FROM c1
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           ROUND(a + 5e-12, 6) AS path_a,
           ROUND(b + 5e-12, 6) AS path_b,
           ROUND(c_prime + 5e-12, 6) AS direct_effect,
           ROUND(a * b + 5e-12, 6) AS indirect_effect,
           ROUND(c_total + 5e-12, 6) AS total_effect,
           ROUND(ABS(c_total - c_prime - a * b) + 5e-12, 6)
             AS decomposition_gap
    FROM paths
"""


@register(
    "q533_mediation_sobel",
    _Q533_ORACLE,
    doc="Mediation analysis balance -> order count -> spend: path a "
    "from M~X, paths (b, c') from the Cramer-solved Y ~ X + M, the "
    "EXACT OLS identity total = direct + indirect reported as the "
    "decomposition gap — the product-of-coefficients toolkit "
    "beside backdoor (q481) and matching (q509).",
)
def q533(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    u = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            (F.count("o_orderkey") * 1.0).alias("m"),
            (
                F.coalesce(F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0))
                / 100000.0
            ).alias("y"),
        )
        .select(
            (F.round(F.col("c_acctbal") * 100) / 1000.0).alias("x"), "m", "y"
        )
    )
    mom = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("m").alias("sm"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("m")).alias("sxm"),
        F.sum(F.col("m") * F.col("m")).alias("smm"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("m") * F.col("y")).alias("smy"),
    )
    n = F.col("n")
    c1 = mom.select(
        "n",
        (F.col("sxx") - F.col("sx") * F.col("sx") / n).alias("cxx"),
        (F.col("sxm") - F.col("sx") * F.col("sm") / n).alias("cxm"),
        (F.col("smm") - F.col("sm") * F.col("sm") / n).alias("cmm"),
        (F.col("sxy") - F.col("sx") * F.col("sy") / n).alias("cxy"),
        (F.col("smy") - F.col("sm") * F.col("sy") / n).alias("cmy"),
    )
    det = F.col("cmm") * F.col("cxx") - F.col("cxm") * F.col("cxm")
    paths = c1.select(
        "n",
        (F.col("cxm") / F.col("cxx")).alias("a"),
        ((F.col("cmy") * F.col("cxx") - F.col("cxy") * F.col("cxm")) / det).alias(
            "b"
        ),
        ((F.col("cxy") * F.col("cmm") - F.col("cmy") * F.col("cxm")) / det).alias(
            "c_prime"
        ),
        (F.col("cxy") / F.col("cxx")).alias("c_total"),
    )
    return paths.select(
        F.col("n").cast("bigint").alias("n_customers"),
        r6(F.col("a")).alias("path_a"),
        r6(F.col("b")).alias("path_b"),
        r6(F.col("c_prime")).alias("direct_effect"),
        r6(F.col("a") * F.col("b")).alias("indirect_effect"),
        r6(F.col("c_total")).alias("total_effect"),
        r6(
            F.abs(F.col("c_total") - F.col("c_prime") - F.col("a") * F.col("b"))
        ).alias("decomposition_gap"),
    )
