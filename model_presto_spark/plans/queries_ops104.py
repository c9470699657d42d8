"""Conformance queries batch #104 (q716+) — variance reduction,
priority queueing, graph-based keyword extraction, publication-bias
tests, and profile-likelihood inference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q716 — antithetic variates: variance reduction audited
# ---------------------------------------------------------------------------
# Monte Carlo for E[exp(theta U)] with hash-deterministic uniforms:
# the plain 500-draw estimator vs 250 antithetic pairs (u, 1-u),
# both against the closed form (e^theta - 1)/theta — the variance
# reduction factor that negative coupling buys on monotone
# integrands, beside quasi-Monte Carlo (q473).
_Q716_ORACLE = """
    WITH theta_t AS (
      SELECT 1 + (COUNT(*) % 3) * CAST(0.5 AS DOUBLE) AS th FROM orders
    ), draws AS MATERIALIZED (
      SELECT g.i,
             ((g.i * 2654435761) % 4294967296) / 4294967296.0 AS u
      FROM (SELECT UNNEST(range(1, 501)) AS i) g
    ), fx AS MATERIALIZED (
      SELECT d.i, EXP(t.th * d.u) AS f,
             (EXP(t.th * d.u) + EXP(t.th * (1 - d.u))) / 2 AS fa
      FROM draws d, theta_t t
    ), est AS (
      SELECT AVG(f) AS est_plain,
             AVG(f * f) - AVG(f) * AVG(f) AS var_plain,
             AVG(CASE WHEN i <= 250 THEN fa END) AS est_anti,
             AVG(CASE WHEN i <= 250 THEN fa * fa END)
               - AVG(CASE WHEN i <= 250 THEN fa END)
                 * AVG(CASE WHEN i <= 250 THEN fa END) AS var_anti
      FROM fx
    )
    SELECT ROUND(t.th + 5e-12, 6) AS theta,
           ROUND((EXP(t.th) - 1) / t.th + 5e-12, 6) AS true_value,
           ROUND(e.est_plain + 5e-12, 6) AS estimate_plain,
           ROUND(e.est_anti + 5e-12, 6) AS estimate_antithetic,
           ROUND((e.var_plain / 500) / (e.var_anti / 250) + 5e-12, 6)
             AS variance_reduction_factor,
           e.var_anti / 250 < e.var_plain / 500 AS antithetic_wins
    FROM est e, theta_t t
"""


@register(
    "q716_antithetic_variates",
    _Q716_ORACLE,
    doc="Antithetic variates: hash-uniform Monte Carlo for "
    "E[exp(theta U)], plain 500 draws vs 250 (u, 1-u) pairs against "
    "the closed form, with the standard-error-based variance "
    "reduction factor — the coupling trick beside quasi-Monte "
    "Carlo (q473) and Poisson bootstrap (q162).",
)
def q716(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    theta = o.agg((1 + (F.count(F.lit(1)) % 3) * 0.5).alias("th"))
    draws = spark.range(1, 501).select(
        F.col("id").alias("i"),
        (((F.col("id") * 2654435761) % 4294967296) / 4294967296.0).alias("u"),
    )
    fx = draws.crossJoin(F.broadcast(theta)).select(
        "i",
        "th",
        F.exp(F.col("th") * F.col("u")).alias("f"),
        (
            (
                F.exp(F.col("th") * F.col("u"))
                + F.exp(F.col("th") * (1 - F.col("u")))
            )
            / 2
        ).alias("fa"),
    )
    est = fx.agg(
        F.avg("f").alias("est_plain"),
        (F.avg(F.col("f") * F.col("f")) - F.avg("f") * F.avg("f")).alias(
            "var_plain"
        ),
        F.avg(F.when(F.col("i") <= 250, F.col("fa"))).alias("est_anti"),
        (
            F.avg(F.when(F.col("i") <= 250, F.col("fa") * F.col("fa")))
            - F.avg(F.when(F.col("i") <= 250, F.col("fa")))
            * F.avg(F.when(F.col("i") <= 250, F.col("fa")))
        ).alias("var_anti"),
        F.max("th").alias("th"),
    )
    return est.select(
        r6(F.col("th")).alias("theta"),
        r6((F.exp(F.col("th")) - 1) / F.col("th")).alias("true_value"),
        r6(F.col("est_plain")).alias("estimate_plain"),
        r6(F.col("est_anti")).alias("estimate_antithetic"),
        r6(
            (F.col("var_plain") / 500) / (F.col("var_anti") / 250)
        ).alias("variance_reduction_factor"),
        (F.col("var_anti") / 250 < F.col("var_plain") / 500).alias(
            "antithetic_wins"
        ),
    )


# ---------------------------------------------------------------------------
# Q717 — non-preemptive priority M/G/1 waits by class
# ---------------------------------------------------------------------------
# Lineitem quantities as service times at total rho = 0.9, URGENT
# orders as class 1: W0 = lambda E[S^2]/2 in front of everyone,
# class-1 wait W0/(1-rho1), class-2 wait W0/((1-rho1)(1-rho)) —
# the head-of-line priority formulas quantifying how much the
# urgent class buys at the low class's expense, extending P-K
# (q672).
_Q717_ORACLE = """
    WITH svc AS (
      SELECT AVG(l_quantity) AS es,
             AVG(l_quantity * l_quantity) AS es2
      FROM lineitem
    ), share AS (
      SELECT AVG(CASE WHEN o_orderpriority = '1-URGENT'
                      THEN 1.0 ELSE 0 END) AS pi1
      FROM orders
    ), derived AS (
      SELECT s.es, s.es2, h.pi1,
             0.9 / s.es AS lam,
             0.9 * h.pi1 AS rho1,
             (0.9 / s.es) * s.es2 / 2 AS w0
      FROM svc s, share h
    )
    SELECT ROUND(pi1 + 5e-12, 6) AS urgent_share,
           ROUND(w0 + 5e-12, 6) AS residual_work_w0,
           ROUND(w0 / (1 - 0.9) + 5e-12, 6) AS wait_fifo,
           ROUND(w0 / (1 - rho1) + 5e-12, 6) AS wait_urgent,
           ROUND(w0 / ((1 - rho1) * (1 - 0.9)) + 5e-12, 6) AS wait_low,
           ROUND((w0 / (1 - 0.9)) / (w0 / (1 - rho1)) + 5e-12, 6)
             AS urgent_speedup
    FROM derived
"""


@register(
    "q717_priority_queues",
    _Q717_ORACLE,
    doc="Non-preemptive priority M/G/1 at rho = 0.9: residual work "
    "W0 = lambda E[S^2]/2, class waits W0/(1-rho1) and "
    "W0/((1-rho1)(1-rho)) with URGENT as class 1 — how much "
    "priority buys and who pays, extending Pollaczek-Khinchine "
    "(q672) and the scheduling comparisons (q597).",
)
def q717(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    svc = li.agg(
        F.avg("l_quantity").alias("es"),
        F.avg(F.col("l_quantity") * F.col("l_quantity")).alias("es2"),
    )
    share = o.agg(
        F.avg(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1.0).otherwise(0.0)
        ).alias("pi1")
    )
    derived = svc.crossJoin(F.broadcast(share)).select(
        "pi1",
        (0.9 * F.col("pi1")).alias("rho1"),
        ((0.9 / F.col("es")) * F.col("es2") / 2).alias("w0"),
    )
    return derived.select(
        r6(F.col("pi1")).alias("urgent_share"),
        r6(F.col("w0")).alias("residual_work_w0"),
        r6(F.col("w0") / (1 - 0.9)).alias("wait_fifo"),
        r6(F.col("w0") / (1 - F.col("rho1"))).alias("wait_urgent"),
        r6(F.col("w0") / ((1 - F.col("rho1")) * (1 - 0.9))).alias("wait_low"),
        r6(
            (F.col("w0") / (1 - 0.9)) / (F.col("w0") / (1 - F.col("rho1")))
        ).alias("urgent_speedup"),
    )


# ---------------------------------------------------------------------------
# Q718 — TextRank keywords on the co-occurrence graph
# ---------------------------------------------------------------------------
# The 30 most frequent English words form a graph weighted by
# adjacent co-occurrence; three damped rounds of s <- 0.15 + 0.85
# sum w_ij/deg_j s_j (unrolled, exact) rank keywords by graph
# centrality rather than raw frequency — TextRank, PageRank's
# (q87) NLP application.
_Q718_ORACLE = """
    WITH toks AS MATERIALIZED (
      SELECT d.doc_id, d.ts[CAST(g.i AS BIGINT)] AS tok, g.i
      FROM (SELECT doc_id,
                   regexp_extract_all(LOWER(text), '[a-z]{3,}') AS ts
            FROM documents WHERE lang = 'en') d
      CROSS JOIN (SELECT UNNEST(range(1, 5001)) AS i) g
      WHERE g.i <= len(d.ts)
    ), vocab AS MATERIALIZED (
      SELECT tok, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS vid
      FROM toks GROUP BY tok
      ORDER BY COUNT(*) DESC, tok LIMIT 30
    ), edges0 AS MATERIALIZED (
      SELECT va.vid AS u, vb.vid AS v, COUNT(*) AS w
      FROM toks a
      JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      JOIN vocab va ON va.tok = a.tok
      JOIN vocab vb ON vb.tok = b.tok
      WHERE va.vid <> vb.vid
      GROUP BY va.vid, vb.vid
    ), edges AS MATERIALIZED (
      SELECT u, v, SUM(w) AS w FROM (
        SELECT u, v, w FROM edges0
        UNION ALL SELECT v, u, w FROM edges0
      ) GROUP BY u, v
    ), deg AS MATERIALIZED (
      SELECT u AS nd, SUM(w) AS dg FROM edges GROUP BY u
    ), s0 AS (
      SELECT vid AS nd, CAST(1 AS DOUBLE) AS s FROM vocab
    ), s1 AS MATERIALIZED (
      SELECT n.vid AS nd,
             0.15 + 0.85 * COALESCE(SUM(e.w * 1.0 / d1.dg * p.s), 0) AS s
      FROM vocab n
      LEFT JOIN edges e ON e.u = n.vid
      LEFT JOIN deg d1 ON d1.nd = e.v
      LEFT JOIN s0 p ON p.nd = e.v
      GROUP BY n.vid
    ), s2 AS MATERIALIZED (
      SELECT n.vid AS nd,
             0.15 + 0.85 * COALESCE(SUM(e.w * 1.0 / d1.dg * p.s), 0) AS s
      FROM vocab n
      LEFT JOIN edges e ON e.u = n.vid
      LEFT JOIN deg d1 ON d1.nd = e.v
      LEFT JOIN s1 p ON p.nd = e.v
      GROUP BY n.vid
    ), s3 AS MATERIALIZED (
      SELECT n.vid AS nd,
             0.15 + 0.85 * COALESCE(SUM(e.w * 1.0 / d1.dg * p.s), 0) AS s
      FROM vocab n
      LEFT JOIN edges e ON e.u = n.vid
      LEFT JOIN deg d1 ON d1.nd = e.v
      LEFT JOIN s2 p ON p.nd = e.v
      GROUP BY n.vid
    )
    SELECT v.tok AS keyword,
           ROUND(s3.s + 5e-12, 6) AS textrank_score,
           CAST(COALESCE(d.dg, 0) AS BIGINT) AS cooccurrence_degree
    FROM s3
    JOIN vocab v ON v.vid = s3.nd
    LEFT JOIN deg d ON d.nd = s3.nd
    ORDER BY ROUND(s3.s + 5e-12, 6) DESC, v.tok
    LIMIT 10
"""


@register(
    "q718_textrank_keywords",
    _Q718_ORACLE,
    doc="TextRank: the 30 most frequent English words linked by "
    "adjacent co-occurrence, three unrolled damped rounds of "
    "s <- 0.15 + 0.85 sum(w/deg) s, top-10 keywords by graph "
    "centrality — PageRank (q87) applied to text, beyond raw "
    "frequency and tf-idf (q73).",
)
def q718(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    toks = d.select(
        "doc_id",
        F.posexplode(
            F.expr("regexp_extract_all(lower(text), '[a-z]{3,}', 0)")
        ).alias("i", "tok"),
        # lineage cut: tokens feed the vocab top-30 plus both sides of
        # the bigram self-join (plan audit: 27 scans persist-only)
    ).localCheckpoint(eager=False)
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(30)
        .select(
            "tok",
            F.row_number().over(Window.orderBy(F.desc("n"), "tok")).alias(
                "vid"
            ),
        )
        .localCheckpoint(eager=False)
    )
    a = toks.select("doc_id", F.col("i").alias("ia"), F.col("tok").alias("ta"))
    b = toks.select(
        F.col("doc_id").alias("doc2"),
        F.col("i").alias("ib"),
        F.col("tok").alias("tb"),
    )
    va = vocab.select(F.col("tok").alias("ta"), F.col("vid").alias("u"))
    vb = vocab.select(F.col("tok").alias("tb"), F.col("vid").alias("v"))
    edges0 = (
        a.join(b, (F.col("doc2") == F.col("doc_id"))
               & (F.col("ib") == F.col("ia") + 1))
        .join(F.broadcast(va), "ta")
        .join(F.broadcast(vb), "tb")
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    edges = (
        edges0.select("u", "v", "w")
        .unionAll(
            edges0.select(
                F.col("v").alias("u"), F.col("u").alias("v"), "w"
            )
        )
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=False)
    )
    deg = edges.groupBy(F.col("u").alias("nd")).agg(F.sum("w").alias("dg"))
    s = vocab.select(F.col("vid").alias("nd"), F.lit(1.0).alias("s"))
    for _ in range(3):
        contrib = (
            edges.join(
                deg.select(F.col("nd").alias("v"), "dg"), "v"
            )
            .join(s.select(F.col("nd").alias("v"), F.col("s").alias("ps")), "v")
            .groupBy("u")
            .agg(
                F.sum(F.col("w") * 1.0 / F.col("dg") * F.col("ps")).alias(
                    "inc"
                )
            )
        )
        s = (
            vocab.select(F.col("vid").alias("nd"))
            .join(contrib.select(F.col("u").alias("nd"), "inc"), "nd", "left")
            .select(
                "nd",
                (0.15 + 0.85 * F.coalesce(F.col("inc"), F.lit(0.0))).alias(
                    "s"
                ),
            )
            .localCheckpoint(eager=False)
        )
    return (
        s.join(vocab.select(F.col("vid").alias("nd"), "tok"), "nd")
        .join(deg, "nd", "left")
        .select(
            F.col("tok").alias("keyword"),
            r6(F.col("s")).alias("textrank_score"),
            F.coalesce(F.col("dg"), F.lit(0))
            .cast("bigint")
            .alias("cooccurrence_degree"),
        )
        .orderBy(F.desc("textrank_score"), "keyword")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q719 — Egger's test for funnel-plot asymmetry
# ---------------------------------------------------------------------------
# Each nation is a "study" estimating the AUTOMOBILE-vs-rest spend
# gap with its own standard error; Egger's regression of the
# standardized effect on precision flags small-study asymmetry via
# a nonzero intercept — the publication-bias diagnostic that a
# pooled meta-analysis (q259) must pass first.
_Q719_ORACLE = """
    WITH u AS MATERIALIZED (
      SELECT c.c_nationkey AS nk,
             CASE WHEN c.c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS t,
             COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0) / 1e6 AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_nationkey, c.c_mktsegment
    ), studies AS MATERIALIZED (
      SELECT nk,
             AVG(CASE WHEN t = 1 THEN y END)
               - AVG(CASE WHEN t = 0 THEN y END) AS d,
             SQRT((AVG(CASE WHEN t = 1 THEN y * y END)
                   - AVG(CASE WHEN t = 1 THEN y END)
                     * AVG(CASE WHEN t = 1 THEN y END))
                  / SUM(t)
                  + (AVG(CASE WHEN t = 0 THEN y * y END)
                     - AVG(CASE WHEN t = 0 THEN y END)
                       * AVG(CASE WHEN t = 0 THEN y END))
                  / SUM(1 - t)) AS se
      FROM u GROUP BY nk
      HAVING SUM(t) >= 2 AND SUM(1 - t) >= 2
    ), reg AS MATERIALIZED (
      SELECT d / se AS z, 1 / se AS prec FROM studies WHERE se > 0
    ), fit AS (
      SELECT COUNT(*) AS n, AVG(z) AS mz, AVG(prec) AS mp,
             (SUM(prec * z) - COUNT(*) * AVG(prec) * AVG(z))
               / (SUM(prec * prec)
                  - COUNT(*) * AVG(prec) * AVG(prec)) AS slope
      FROM reg
    ), intc AS (
      SELECT f.n, f.slope, f.mz - f.slope * f.mp AS b0,
             SQRT(SUM(POW(r.z - (f.mz - f.slope * f.mp)
                          - f.slope * r.prec, 2))
                  / (f.n - 2)
                  * (1.0 / f.n + f.mp * f.mp
                     / (SUM(r.prec * r.prec)
                        - f.n * f.mp * f.mp))) AS se_b0
      FROM reg r, fit f
      GROUP BY f.n, f.slope, f.mz, f.mp
    )
    SELECT CAST(n AS BIGINT) AS n_studies,
           ROUND(b0 + 5e-12, 6) AS egger_intercept,
           ROUND(slope + 5e-12, 6) AS precision_slope,
           ROUND(b0 / se_b0 + 5e-12, 6) AS intercept_t,
           ABS(b0 / se_b0) > 2 AS asymmetry_flagged
    FROM intc
"""


@register(
    "q719_egger_test",
    _Q719_ORACLE,
    doc="Egger's funnel-plot test: per-nation AUTOMOBILE-vs-rest "
    "spend gaps with their standard errors, standardized effect "
    "regressed on precision, intercept t-ratio flagging small-"
    "study asymmetry — the publication-bias gate before pooling "
    "(q259's meta-analysis).",
)
def q719(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    u = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_nationkey", "c_mktsegment")
        .agg(
            (
                F.coalesce(F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0))
                / 1e6
            ).alias("y")
        )
        .select(
            F.col("c_nationkey").alias("nk"),
            F.when(F.col("c_mktsegment") == "AUTOMOBILE", 1)
            .otherwise(0)
            .alias("t"),
            "y",
        )
    )
    m1 = F.avg(F.when(F.col("t") == 1, F.col("y")))
    m0 = F.avg(F.when(F.col("t") == 0, F.col("y")))
    v1 = F.avg(F.when(F.col("t") == 1, F.col("y") * F.col("y"))) - m1 * m1
    v0 = F.avg(F.when(F.col("t") == 0, F.col("y") * F.col("y"))) - m0 * m0
    studies = (
        u.groupBy("nk")
        .agg(
            (m1 - m0).alias("d"),
            F.sqrt(v1 / F.sum("t") + v0 / F.sum(1 - F.col("t"))).alias("se"),
            F.sum("t").alias("n1"),
            F.sum(1 - F.col("t")).alias("n0"),
        )
        .filter((F.col("n1") >= 2) & (F.col("n0") >= 2))
    )
    reg = studies.filter(F.col("se") > 0).select(
        (F.col("d") / F.col("se")).alias("z"),
        (1 / F.col("se")).alias("prec"),
    ).localCheckpoint(eager=False)
    n = F.count(F.lit(1))
    fit = reg.agg(
        n.alias("n"),
        F.avg("z").alias("mz"),
        F.avg("prec").alias("mp"),
        (
            (F.sum(F.col("prec") * F.col("z")) - n * F.avg("prec") * F.avg("z"))
            / (
                F.sum(F.col("prec") * F.col("prec"))
                - n * F.avg("prec") * F.avg("prec")
            )
        ).alias("slope"),
    )
    b0 = F.col("mz") - F.col("slope") * F.col("mp")
    intc = (
        reg.crossJoin(F.broadcast(fit))
        .groupBy("n", "slope", "mz", "mp")
        .agg(
            F.sqrt(
                F.sum(
                    F.pow(
                        F.col("z")
                        - (F.col("mz") - F.col("slope") * F.col("mp"))
                        - F.col("slope") * F.col("prec"),
                        2,
                    )
                )
                / (F.col("n") - 2)
                * (
                    1.0 / F.col("n")
                    + F.col("mp")
                    * F.col("mp")
                    / (
                        F.sum(F.col("prec") * F.col("prec"))
                        - F.col("n") * F.col("mp") * F.col("mp")
                    )
                )
            ).alias("se_b0")
        )
    )
    return intc.select(
        F.col("n").cast("bigint").alias("n_studies"),
        r6(b0).alias("egger_intercept"),
        r6(F.col("slope")).alias("precision_slope"),
        r6(b0 / F.col("se_b0")).alias("intercept_t"),
        (F.abs(b0 / F.col("se_b0")) > 2).alias("asymmetry_flagged"),
    )


# ---------------------------------------------------------------------------
# Q720 — profile-likelihood vs Wald CI for a Poisson rate
# ---------------------------------------------------------------------------
# Daily purchase counts as Poisson(lambda T): the profile interval
# is every lambda on a 201-point grid whose log-likelihood K ln
# lambda - T lambda stays within 1.92 of the maximum, vs the
# symmetric Wald lambda_hat +/- 1.96 sqrt(lambda_hat/T) — the
# likelihood-shaped interval that respects the asymmetry Wald
# ignores.
_Q720_ORACLE = """
    WITH counts AS (
      SELECT COUNT(*) AS k,
             COUNT(DISTINCT EXTRACT(day FROM ts)) AS t
      FROM events WHERE event_type = 'purchase'
    ), grid AS MATERIALIZED (
      SELECT c.k, c.t,
             (c.k * 1.0 / c.t)
               * (CAST(0.8 AS DOUBLE) + g.i * CAST(0.4 AS DOUBLE) / 200)
               AS lam
      FROM counts c, (SELECT UNNEST(range(0, 201)) AS i) g
    ), ll AS MATERIALIZED (
      SELECT k, t, lam,
             k * LN(lam) - t * lam AS logl,
             k * LN(k * 1.0 / t) - t * (k * 1.0 / t) AS logl_max
      FROM grid
    ), prof AS (
      SELECT MAX(k) AS k, MAX(t) AS t,
             MIN(CASE WHEN logl >= logl_max - 1.92 THEN lam END) AS lo,
             MAX(CASE WHEN logl >= logl_max - 1.92 THEN lam END) AS hi
      FROM ll
    )
    SELECT ROUND(k * 1.0 / t + 5e-12, 6) AS lambda_hat,
           ROUND(lo + 5e-12, 6) AS profile_lower,
           ROUND(hi + 5e-12, 6) AS profile_upper,
           ROUND(k * 1.0 / t - 1.96 * SQRT(k * 1.0 / t / t) + 5e-12, 6)
             AS wald_lower,
           ROUND(k * 1.0 / t + 1.96 * SQRT(k * 1.0 / t / t) + 5e-12, 6)
             AS wald_upper,
           hi - (k * 1.0 / t) > (k * 1.0 / t) - lo
             AS profile_right_skewed
    FROM prof
"""


@register(
    "q720_profile_likelihood",
    _Q720_ORACLE,
    doc="Profile-likelihood CI for the daily purchase Poisson rate: "
    "the 201-point lambda grid kept within 1.92 log-likelihood of "
    "the MLE vs the symmetric Wald interval, with the right-skew "
    "check — likelihood-shaped inference beside the Wilson CI "
    "(q233) and bootstrap (q365).",
)
def q720(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    counts = e.agg(
        F.count(F.lit(1)).alias("k"),
        F.countDistinct(F.dayofmonth("ts")).alias("t"),
    )
    grid = counts.crossJoin(
        F.broadcast(spark.range(0, 201).select(F.col("id").alias("i")))
    ).select(
        "k",
        "t",
        (
            (F.col("k") * 1.0 / F.col("t"))
            * (0.8 + F.col("i") * 0.4 / 200)
        ).alias("lam"),
    )
    lhat = F.col("k") * 1.0 / F.col("t")
    ll = grid.select(
        "k",
        "t",
        "lam",
        (F.col("k") * F.log("lam") - F.col("t") * F.col("lam")).alias("logl"),
        (F.col("k") * F.log(lhat) - F.col("t") * lhat).alias("logl_max"),
    )
    prof = ll.agg(
        F.max("k").alias("k"),
        F.max("t").alias("t"),
        F.min(
            F.when(F.col("logl") >= F.col("logl_max") - 1.92, F.col("lam"))
        ).alias("lo"),
        F.max(
            F.when(F.col("logl") >= F.col("logl_max") - 1.92, F.col("lam"))
        ).alias("hi"),
    )
    return prof.select(
        r6(lhat).alias("lambda_hat"),
        r6(F.col("lo")).alias("profile_lower"),
        r6(F.col("hi")).alias("profile_upper"),
        r6(lhat - 1.96 * F.sqrt(lhat / F.col("t"))).alias("wald_lower"),
        r6(lhat + 1.96 * F.sqrt(lhat / F.col("t"))).alias("wald_upper"),
        (F.col("hi") - lhat > lhat - F.col("lo")).alias(
            "profile_right_skewed"
        ),
    )
