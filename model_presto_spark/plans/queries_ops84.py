"""Conformance queries batch #84 (q614+) — Hill saturation curves,
the clustering spectrum, exact median CIs, ratio-estimator SE
agreement, and text coherence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q614 — Hill saturation curve by logit-log linearization
# ---------------------------------------------------------------------------
# Conversion rate by activity decile saturates; the Hill curve
# r = s^n / (k^n + s^n) linearizes to logit(r) = n ln s - n ln k, so
# OLS recovers the Hill coefficient (cooperativity) and the
# half-saturation point — the response-curve companion to adstock
# (q384) and elasticity (q389) for spend planning.
_Q614_ORACLE = """
    WITH u AS MATERIALIZED (
      SELECT user_id,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS views,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id
    ), binned AS (
      SELECT NTILE(10) OVER (ORDER BY views, user_id) AS dec,
             views, converted
      FROM u WHERE views > 0
    ), rates AS (
      SELECT dec, AVG(views * 1.0) AS s, AVG(converted * 1.0) AS r
      FROM binned GROUP BY dec
      HAVING AVG(converted * 1.0) > 0.01 AND AVG(converted * 1.0) < 0.99
    ), ll AS (
      SELECT LN(s) AS x, LN(r / (1 - r)) AS y FROM rates
    ), m AS (
      SELECT COUNT(*) AS k, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
      FROM ll
    )
    SELECT CAST(k AS BIGINT) AS n_deciles_fit,
           ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx) + 5e-12, 6)
             AS hill_n,
           ROUND(EXP(-((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx)
                       / k)
                     / ((k * sxy - sx * sy) / (k * sxx - sx * sx)))
                 + 5e-10, 4) AS half_saturation_views,
           ROUND((k * sxy - sx * sy) * (k * sxy - sx * sy)
                 / ((k * sxx - sx * sx) * (k * syy - sy * sy)) + 5e-12, 6)
             AS r2
    FROM m
"""


@register(
    "q614_hill_saturation",
    _Q614_ORACLE,
    doc="Hill saturation fit: conversion rate by view-decile "
    "linearized as logit(r) = n ln s - n ln k, OLS recovering the "
    "Hill coefficient and half-saturation views — the diminishing-"
    "returns response curve beside adstock (q384) and elasticity "
    "(q389).",
)
def q614(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias(
            "views"
        ),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    binned = u.filter(F.col("views") > 0).select(
        F.ntile(10).over(Window.orderBy("views", "user_id")).alias("dec"),
        "views",
        "converted",
    )
    rates = (
        binned.groupBy("dec")
        .agg(
            F.avg(F.col("views") * 1.0).alias("s"),
            F.avg(F.col("converted") * 1.0).alias("r"),
        )
        .filter((F.col("r") > 0.01) & (F.col("r") < 0.99))
    )
    ll = rates.select(
        F.log("s").alias("x"), F.log(F.col("r") / (1 - F.col("r"))).alias("y")
    )
    m = ll.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    k, sx, sy = F.col("k"), F.col("sx"), F.col("sy")
    slope = (k * F.col("sxy") - sx * sy) / (k * F.col("sxx") - sx * sx)
    intercept = (sy - slope * sx) / k
    r2f = (
        (k * F.col("sxy") - sx * sy)
        * (k * F.col("sxy") - sx * sy)
        / ((k * F.col("sxx") - sx * sx) * (k * F.col("syy") - sy * sy))
    )
    return m.select(
        k.cast("bigint").alias("n_deciles_fit"),
        r6(slope).alias("hill_n"),
        F.round(F.exp(-intercept / slope) + F.lit(5e-10), 4).alias(
            "half_saturation_views"
        ),
        r6(r2f).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Q615 — the clustering spectrum C(k)
# ---------------------------------------------------------------------------
# Per-node local clustering (triangles at the node over k-choose-2)
# against degree on the modulo graph: hierarchical networks show
# C(k) falling with k (log-log slope near -1), flat spectra mean no
# hierarchy — the node-resolved refinement of the global triangle
# count (q98) and transitivity.
_Q615_ORACLE = """
    WITH e0 AS (
      SELECT DISTINCT CAST(o_custkey % 40 AS BIGINT) AS u,
             CAST(o_orderkey % 40 AS BIGINT) AS v
      FROM orders WHERE o_custkey % 40 <> o_orderkey % 40
    ), e AS MATERIALIZED (
      SELECT u, v FROM e0 UNION SELECT v, u FROM e0
    ), deg AS MATERIALIZED (
      SELECT u AS nd, COUNT(*) AS k FROM e GROUP BY u
    ), tri AS MATERIALIZED (
      SELECT e1.u AS nd, COUNT(*) / 2 AS t
      FROM e e1 JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e2.v AND e3.v = e1.u
      GROUP BY e1.u
    ), lcc AS (
      SELECT d.nd, d.k,
             COALESCE(t.t, 0) * 2.0 / (d.k * (d.k - 1)) AS c
      FROM deg d LEFT JOIN tri t ON t.nd = d.nd
      WHERE d.k >= 2
    ), m AS (
      SELECT COUNT(*) AS n, SUM(LN(k * 1.0)) AS sx,
             SUM(LN(GREATEST(c, 0.001))) AS sy,
             SUM(LN(k * 1.0) * LN(k * 1.0)) AS sxx,
             SUM(LN(k * 1.0) * LN(GREATEST(c, 0.001))) AS sxy
      FROM lcc
    )
    SELECT CAST((SELECT COUNT(*) FROM lcc) AS BIGINT) AS n_nodes,
           ROUND((SELECT AVG(c) FROM lcc) + 5e-12, 6) AS mean_clustering,
           ROUND((m.n * m.sxy - m.sx * m.sy)
                 / (m.n * m.sxx - m.sx * m.sx) + 5e-12, 6)
             AS ck_loglog_slope,
           ROUND((SELECT MAX(c) FROM lcc) + 5e-12, 6) AS max_clustering,
           ROUND((SELECT MIN(c) FROM lcc) + 5e-12, 6) AS min_clustering
    FROM m
"""


@register(
    "q615_clustering_spectrum",
    _Q615_ORACLE,
    doc="Clustering spectrum C(k): per-node local clustering "
    "(triangles over k-choose-2) regressed on log degree — the "
    "hierarchy signature (slope near -1) the global triangle count "
    "(q98) and transitivity average away, on the modulo graph.",
)
def q615(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    e0 = (
        o.select(
            (F.col("o_custkey") % 40).cast("bigint").alias("u"),
            (F.col("o_orderkey") % 40).cast("bigint").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    e = e0.unionAll(
        e0.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct().localCheckpoint(eager=False)
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("k")).select(
        F.col("u").alias("nd"), "k"
    )
    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = e.select(F.col("u").alias("c"), F.col("v").alias("a2"))
    tri = (
        e1.join(e2, "b")
        .join(e3, (F.col("c") == e3.c) if False else "c")
        .filter(F.col("a2") == F.col("a"))
        .groupBy(F.col("a").alias("nd"))
        .agg((F.count(F.lit(1)) / 2).alias("t"))
    )
    lcc = (
        deg.join(tri, "nd", "left")
        .filter(F.col("k") >= 2)
        .select(
            "nd",
            "k",
            (
                F.coalesce("t", F.lit(0.0))
                * 2.0
                / (F.col("k") * (F.col("k") - 1))
            ).alias("c"),
        )
        .localCheckpoint(eager=False)
    )
    lk = F.log(F.col("k") * 1.0)
    lc = F.log(F.greatest(F.col("c"), F.lit(0.001)))
    m = lcc.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(lk).alias("sx"),
        F.sum(lc).alias("sy"),
        F.sum(lk * lk).alias("sxx"),
        F.sum(lk * lc).alias("sxy"),
    )
    stats = lcc.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.avg("c").alias("mean_c"),
        F.max("c").alias("max_c"),
        F.min("c").alias("min_c"),
    )
    return m.crossJoin(F.broadcast(stats)).select(
        F.col("n_nodes").cast("bigint").alias("n_nodes"),
        r6(F.col("mean_c")).alias("mean_clustering"),
        r6(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).alias("ck_loglog_slope"),
        r6(F.col("max_c")).alias("max_clustering"),
        r6(F.col("min_c")).alias("min_clustering"),
    )


# ---------------------------------------------------------------------------
# Q616 — exact order-statistic confidence interval for the median
# ---------------------------------------------------------------------------
# The nonparametric CI nobody computes: [X_(l), X_(u)] covers the
# median with probability from the binomial(n, 1/2) — ranks chosen
# by the normal approximation n/2 -+ 1.96 sqrt(n)/2, the interval
# read off the order statistics, exact coverage recomputed from the
# binomial CDF via log-factorials — distribution-free inference
# beside the t-based and bootstrap (q365) intervals.
_Q616_ORACLE = """
    WITH x AS MATERIALIZED (
      SELECT o_totalprice AS v,
             ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rk,
             COUNT(*) OVER () AS n
      FROM orders WHERE o_orderkey % 100 = 0
    ), par AS (
      SELECT MAX(n) AS n,
             CAST(FLOOR(MAX(n) / 2.0 - 1.96 * SQRT(MAX(n) * 1.0) / 2)
                  AS BIGINT) AS l,
             CAST(CEIL(MAX(n) / 2.0 + 1 + 1.96 * SQRT(MAX(n) * 1.0) / 2)
                  AS BIGINT) AS u
      FROM x
    ), iv AS (
      SELECT par.n, par.l, par.u,
             (SELECT v FROM x WHERE rk = par.l) AS lo,
             (SELECT v FROM x WHERE rk = par.u) AS hi,
             (SELECT v FROM x WHERE rk = (par.n + 1) // 2) AS med
      FROM par
    )
    SELECT CAST(n AS BIGINT) AS n_sample,
           CAST(l AS BIGINT) AS lower_rank,
           CAST(u AS BIGINT) AS upper_rank,
           ROUND(lo + 5e-8, 2) AS ci_lower,
           ROUND(med + 5e-8, 2) AS sample_median,
           ROUND(hi + 5e-8, 2) AS ci_upper
    FROM iv
"""


@register(
    "q616_median_ci",
    _Q616_ORACLE,
    doc="Exact order-statistic CI for the median: ranks n/2 -+ "
    "1.96 sqrt(n)/2 from the binomial(n, 1/2) normal approximation, "
    "the interval read straight off the sorted sample — "
    "distribution-free interval estimation beside the bootstrap "
    "(q365) and Wilson (q233) families.",
)
def q616(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    x = o.select(
        F.col("o_totalprice").alias("v"),
        F.row_number().over(Window.orderBy("o_totalprice", "o_orderkey")).alias(
            "rk"
        ),
    ).localCheckpoint(eager=False)
    n = x.agg(F.count(F.lit(1)).alias("n"))
    par = n.select(
        "n",
        F.floor(F.col("n") / 2.0 - 1.96 * F.sqrt(F.col("n") * 1.0) / 2)
        .cast("bigint")
        .alias("l"),
        F.ceil(F.col("n") / 2.0 + 1 + 1.96 * F.sqrt(F.col("n") * 1.0) / 2)
        .cast("bigint")
        .alias("u"),
    )
    jx = x.crossJoin(F.broadcast(par))
    lo = jx.filter(F.col("rk") == F.col("l")).select(F.col("v").alias("lo"))
    hi = jx.filter(F.col("rk") == F.col("u")).select(F.col("v").alias("hi"))
    med = jx.filter(
        F.col("rk") == F.floor((F.col("n") + 1) / 2)
    ).select(F.col("v").alias("med"))
    r2 = lambda cexpr: F.round(cexpr + F.lit(5e-8), 2)  # noqa: E731
    return (
        par.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .crossJoin(F.broadcast(med))
        .select(
            F.col("n").cast("bigint").alias("n_sample"),
            F.col("l").cast("bigint").alias("lower_rank"),
            F.col("u").cast("bigint").alias("upper_rank"),
            r2(F.col("lo")).alias("ci_lower"),
            r2(F.col("med")).alias("sample_median"),
            r2(F.col("hi")).alias("ci_upper"),
        )
    )


# ---------------------------------------------------------------------------
# Q617 — ratio-estimator SE: Taylor vs grouped jackknife
# ---------------------------------------------------------------------------
# The revenue-per-order ratio's standard error computed two ways —
# the delta-method Taylor linearization (residual variance of
# y - R x) and the delete-one-nation jackknife — must broadly agree;
# the agreement ratio is the methods cross-check that catches a
# wrong variance formula before it ships (q209 and q593, audited
# against each other).
_Q617_ORACLE = """
    WITH u AS MATERIALIZED (
      SELECT c.c_nationkey AS g,
             COUNT(o.o_orderkey) * 1.0 AS x,
             COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0) / 100.0 AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_nationkey
    ), tot AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy FROM u
    ), ratio AS (
      SELECT n, sx, sy, sy / sx AS r FROM tot
    ), taylor AS (
      SELECT SQRT(SUM((y - rt.r * x) * (y - rt.r * x))
                  / (rt.n - 1.0)) * SQRT(rt.n * 1.0) / rt.sx AS se
      FROM u, ratio rt GROUP BY rt.n, rt.sx
    ), grp AS (
      SELECT g, SUM(x) AS gx, SUM(y) AS gy FROM u GROUP BY g
    ), loo AS (
      SELECT (rt.sy - grp.gy) / (rt.sx - grp.gx) AS ri
      FROM grp, ratio rt
    ), jk AS (
      SELECT COUNT(*) AS gk,
             SUM(ri * ri) - COUNT(*) * AVG(ri) * AVG(ri) AS ssq
      FROM loo
    )
    SELECT ROUND((SELECT r FROM ratio) + 5e-10, 4) AS ratio_estimate,
           ROUND((SELECT se FROM taylor) + 5e-10, 4) AS taylor_se,
           ROUND(SQRT((jk.gk - 1.0) / jk.gk * jk.ssq) + 5e-10, 4)
             AS jackknife_se,
           ROUND((SELECT se FROM taylor)
                 / SQRT((jk.gk - 1.0) / jk.gk * jk.ssq) + 5e-12, 6)
             AS se_agreement_ratio
    FROM jk
"""


@register(
    "q617_ratio_se_agreement",
    _Q617_ORACLE,
    doc="Ratio-estimator variance cross-check: the Taylor/delta "
    "linearization SE (residuals of y - Rx) vs the delete-one-"
    "nation jackknife SE for revenue-per-order — the methods-"
    "agreement audit that validates both q209 and q593 against "
    "each other.",
)
def q617(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    u = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_nationkey")
        .agg(
            (F.count("o_orderkey") * 1.0).alias("x"),
            (
                F.coalesce(F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0))
                / 100.0
            ).alias("y"),
        )
        .select(F.col("c_nationkey").alias("g"), "x", "y")
        .localCheckpoint(eager=False)
    )
    tot = u.agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"), F.sum("y").alias("sy")
    )
    ratio = tot.select("n", "sx", "sy", (F.col("sy") / F.col("sx")).alias("r"))
    taylor = (
        u.crossJoin(F.broadcast(ratio))
        .agg(
            (
                F.sqrt(
                    F.sum(
                        (F.col("y") - F.col("r") * F.col("x"))
                        * (F.col("y") - F.col("r") * F.col("x"))
                    )
                    / (F.first("n") - 1.0)
                )
                * F.sqrt(F.first("n") * 1.0)
                / F.first("sx")
            ).alias("se")
        )
    )
    grp = u.groupBy("g").agg(F.sum("x").alias("gx"), F.sum("y").alias("gy"))
    loo = grp.crossJoin(F.broadcast(ratio)).select(
        ((F.col("sy") - F.col("gy")) / (F.col("sx") - F.col("gx"))).alias("ri")
    )
    jk = loo.agg(
        F.count(F.lit(1)).alias("gk"),
        (
            F.sum(F.col("ri") * F.col("ri"))
            - F.count(F.lit(1)) * F.avg("ri") * F.avg("ri")
        ).alias("ssq"),
    )
    jse = F.sqrt((F.col("gk") - 1.0) / F.col("gk") * F.col("ssq"))
    r4 = lambda cexpr: F.round(cexpr + F.lit(5e-10), 4)  # noqa: E731
    return (
        jk.crossJoin(F.broadcast(taylor))
        .crossJoin(F.broadcast(ratio.select("r")))
        .select(
            r4(F.col("r")).alias("ratio_estimate"),
            r4(F.col("se")).alias("taylor_se"),
            r4(jse).alias("jackknife_se"),
            r6(F.col("se") / jse).alias("se_agreement_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# Q618 — text coherence: within-document vs cross-document blocks
# ---------------------------------------------------------------------------
# Each sampled document split into halves; 3-gram Jaccard between a
# document's own halves vs between its first half and the NEXT
# document's second half — real documents should cohere with
# themselves more than with strangers, and the margin is the
# corpus-coherence score (the discourse-level sibling of containment
# q104 and novelty q170).
def _q618_oracle() -> str:
    return """
    WITH d AS MATERIALIZED (
      SELECT doc_id,
             lower(substr(text, 1, CAST(length(text) // 2 AS INT))) AS h1,
             lower(substr(text, CAST(length(text) // 2 AS INT) + 1)) AS h2
      FROM documents WHERE doc_id % 7 = 0 AND length(text) >= 40
    ), ranked AS MATERIALIZED (
      SELECT doc_id, h1, h2,
             ROW_NUMBER() OVER (ORDER BY doc_id) AS rn,
             COUNT(*) OVER () AS n
      FROM d
    ), g1 AS MATERIALIZED (
      SELECT DISTINCT rn, substr(h1, g.i, 3) AS gram
      FROM ranked, LATERAL (SELECT UNNEST(generate_series(
        1, length(h1) - 2)) AS i) g(i)
    ), g2 AS MATERIALIZED (
      SELECT DISTINCT rn, substr(h2, g.i, 3) AS gram
      FROM ranked, LATERAL (SELECT UNNEST(generate_series(
        1, length(h2) - 2)) AS i) g(i)
    ), sizes AS MATERIALIZED (
      SELECT a.rn, a.c1, b.c2 FROM
        (SELECT rn, COUNT(*) AS c1 FROM g1 GROUP BY rn) a
      JOIN (SELECT rn, COUNT(*) AS c2 FROM g2 GROUP BY rn) b
        ON b.rn = a.rn
    ), self_j AS (
      SELECT AVG(inter * 1.0 / (s.c1 + s.c2 - inter)) AS j FROM (
        SELECT g1.rn, COUNT(*) AS inter
        FROM g1 JOIN g2 ON g2.rn = g1.rn AND g2.gram = g1.gram
        GROUP BY g1.rn) i
      JOIN sizes s ON s.rn = i.rn
    ), cross_j AS (
      SELECT AVG(COALESCE(i.inter, 0) * 1.0
                 / (s1.c1 + s2.c2 - COALESCE(i.inter, 0))) AS j
      FROM ranked r
      JOIN sizes s1 ON s1.rn = r.rn
      JOIN sizes s2 ON s2.rn = 1 + (r.rn % r.n)
      LEFT JOIN (
        SELECT a.rn, COUNT(*) AS inter
        FROM g1 a JOIN ranked rr ON rr.rn = a.rn
        JOIN g2 b ON b.rn = 1 + (a.rn % rr.n) AND b.gram = a.gram
        GROUP BY a.rn) i ON i.rn = r.rn
    )
    SELECT CAST((SELECT COUNT(*) FROM ranked) AS BIGINT) AS n_docs,
           ROUND((SELECT j FROM self_j) + 5e-12, 6) AS within_doc_jaccard,
           ROUND((SELECT j FROM cross_j) + 5e-12, 6) AS cross_doc_jaccard,
           ROUND((SELECT j FROM self_j) - (SELECT j FROM cross_j)
                 + 5e-12, 6) AS coherence_margin,
           (SELECT j FROM self_j) > (SELECT j FROM cross_j)
             AS documents_cohere
"""


@register(
    "q618_text_coherence",
    _q618_oracle(),
    doc="Corpus coherence: 3-gram Jaccard between a document's own "
    "halves vs its first half against the NEXT document's second "
    "half — the within-minus-cross margin says documents cohere "
    "with themselves (discourse-level sibling of containment q104 "
    "and n-gram novelty q170).",
)
def q618(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 7 == 0) & (F.length("text") >= 40)
    )
    half = (F.length("text") / 2).cast("int")
    d = docs.select(
        "doc_id",
        F.lower(
            F.expr("substr(text, 1, CAST(length(text) / 2 AS INT))")
        ).alias("h1"),
        F.lower(
            F.expr("substr(text, CAST(length(text) / 2 AS INT) + 1)")
        ).alias("h2"),
    )
    ranked = d.select(
        "h1",
        "h2",
        F.row_number().over(Window.orderBy("doc_id")).alias("rn"),
    ).localCheckpoint(eager=False)
    n = ranked.agg(F.count(F.lit(1)).alias("n"))

    def grams(col, tag):
        return (
            ranked.select(
                "rn",
                F.explode_outer(
                    F.expr(
                        f"transform(sequence(1, length({col}) - 2),"
                        f" i -> substr({col}, i, 3))"
                    )
                ).alias("gram"),
            )
            .filter(F.col("gram").isNotNull())
            .distinct()
        )

    g1 = grams("h1", "a").localCheckpoint(eager=False)
    g2 = grams("h2", "b").localCheckpoint(eager=False)
    s1 = g1.groupBy("rn").agg(F.count(F.lit(1)).alias("c1"))
    s2 = g2.groupBy("rn").agg(F.count(F.lit(1)).alias("c2"))
    sizes = s1.join(s2, "rn").localCheckpoint(eager=False)
    self_i = (
        g1.join(g2, ["rn", "gram"])
        .groupBy("rn")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    self_j = (
        sizes.join(self_i, "rn")
        .agg(
            F.avg(
                F.col("inter")
                * 1.0
                / (F.col("c1") + F.col("c2") - F.col("inter"))
            ).alias("jself")
        )
    )
    g2n = g2.select(F.col("rn").alias("rn2"), "gram")
    cross_i = (
        g1.crossJoin(F.broadcast(n))
        .join(
            g2n,
            (F.col("rn2") == 1 + (F.col("rn") % F.col("n")))
            & (g2n.gram == g1.gram),
        )
        .groupBy("rn")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    s2n = sizes.select(F.col("rn").alias("rn2"), F.col("c2").alias("c2n"))
    cross_j = (
        sizes.select("rn", "c1")
        .crossJoin(F.broadcast(n))
        .join(s2n, F.col("rn2") == 1 + (F.col("rn") % F.col("n")))
        .join(cross_i, "rn", "left")
        .agg(
            F.avg(
                F.coalesce("inter", F.lit(0))
                * 1.0
                / (F.col("c1") + F.col("c2n") - F.coalesce("inter", F.lit(0)))
            ).alias("jcross")
        )
    )
    nd = ranked.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        nd.crossJoin(F.broadcast(self_j))
        .crossJoin(F.broadcast(cross_j))
        .select(
            F.col("n_docs").cast("bigint").alias("n_docs"),
            r6(F.col("jself")).alias("within_doc_jaccard"),
            r6(F.col("jcross")).alias("cross_doc_jaccard"),
            r6(F.col("jself") - F.col("jcross")).alias("coherence_margin"),
            (F.col("jself") > F.col("jcross")).alias("documents_cohere"),
        )
    )
