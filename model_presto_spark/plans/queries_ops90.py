"""Conformance queries batch #90 (q644+) — streaming PCA, serially
correlated regression correction, TURF reach planning, VaR
backtesting, and optimal-vs-LRU cache replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q644 — Oja's rule: streaming first principal component
# ---------------------------------------------------------------------------
# Two hundred standardized (balance, spend) observations streamed
# through Oja's update w <- normalize(w + 0.05 (x.w) x): the online
# PC1 estimate, checked against the closed-form 2x2 eigenvector via
# |cos| alignment — streaming PCA next to the batch power iteration
# (q434), with exact-integer standardization both engines share.
def _oja_fold(el, u: str, v: str) -> str:
    dot = f"({el(1)} * {u} + {el(2)} * {v})"
    w1 = f"({el(1)} + 0.05 * {dot} * {u})"
    w2 = f"({el(2)} + 0.05 * {dot} * {v})"
    nrm = f"SQRT({w1} * {w1} + {w2} * {w2})"
    return f"{w1} / {nrm}, {w2} / {nrm}"


_Q644_ORACLE = f"""
    WITH raw AS MATERIALIZED (
      SELECT ROUND(c.c_acctbal * 100) AS xa,
             ROUND(COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0) / 1e4) AS xb,
             c.c_custkey AS ck
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_acctbal
      ORDER BY c.c_custkey LIMIT 200
    ), mom AS (
      SELECT COUNT(*) AS n, SUM(xa) AS sa, SUM(xb) AS sb,
             SUM(xa * xa) AS saa, SUM(xb * xb) AS sbb
      FROM raw
    ), std AS MATERIALIZED (
      SELECT r.ck,
             (r.xa - m.sa * 1.0 / m.n)
               / SQRT((m.saa - m.sa * m.sa * 1.0 / m.n) / m.n) AS u,
             (r.xb - m.sb * 1.0 / m.n)
               / SQRT((m.sbb - m.sb * m.sb * 1.0 / m.n) / m.n) AS v
      FROM raw r, mom m
    ), folded AS (
      SELECT list_reduce(
               list_prepend([CAST(0.8 AS DOUBLE), 0.6],
                            list([u, v] ORDER BY ck)),
               (acc, x) -> [{_oja_fold(lambda k: f'acc[{k}]',
                                       'x[1]', 'x[2]')}]
             ) AS w
      FROM std
    ), cov AS (
      SELECT SUM(u * u) / COUNT(*) AS sxx,
             SUM(u * v) / COUNT(*) AS sxy,
             SUM(v * v) / COUNT(*) AS syy
      FROM std
    ), eig AS (
      SELECT ((sxx + syy) + SQRT((sxx - syy) * (sxx - syy)
                                 + 4 * sxy * sxy)) / 2 AS lam,
             sxy, sxx, syy
      FROM cov
    ), pc AS (
      SELECT lam, sxx, syy,
             sxy / SQRT(sxy * sxy + (lam - sxx) * (lam - sxx)) AS e1,
             (lam - sxx) / SQRT(sxy * sxy + (lam - sxx) * (lam - sxx)) AS e2
      FROM eig
    )
    SELECT ROUND(f.w[1] + 5e-12, 6) AS oja_w1,
           ROUND(f.w[2] + 5e-12, 6) AS oja_w2,
           ROUND(ABS(f.w[1] * p.e1 + f.w[2] * p.e2) + 5e-12, 6)
             AS alignment,
           ROUND(p.lam / (p.sxx + p.syy) + 5e-12, 6) AS pc1_var_share
    FROM folded f, pc p
"""

_OJA_SPARK_FOLD = (
    "aggregate(xs, array(CAST(0.8 AS DOUBLE), 0.6), (acc, x) -> array("
    + _oja_fold(
        lambda k: f"element_at(acc, {k})",
        "element_at(x, 1)",
        "element_at(x, 2)",
    )
    + "))"
)


@register(
    "q644_oja_pca",
    _Q644_ORACLE,
    doc="Oja's rule streaming PCA: 200 standardized (balance, spend) "
    "points folded through w <- normalize(w + eta (x.w) x), aligned "
    "(|cos|) against the closed-form 2x2 covariance eigenvector — "
    "the online counterpart of batch power iteration (q434).",
)
def q644(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    raw = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            F.round(
                F.coalesce(
                    F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0)
                )
                / 1e4
            ).alias("xb")
        )
        .select(
            F.col("c_custkey").alias("ck"),
            F.round(F.col("c_acctbal") * 100).alias("xa"),
            "xb",
        )
        .orderBy("ck")
        .limit(200)
        .localCheckpoint(eager=False)
    )
    n = F.count(F.lit(1))
    mom = raw.agg(
        n.alias("n"),
        F.sum("xa").alias("sa"),
        F.sum("xb").alias("sb"),
        F.sum(F.col("xa") * F.col("xa")).alias("saa"),
        F.sum(F.col("xb") * F.col("xb")).alias("sbb"),
    )
    std = raw.crossJoin(F.broadcast(mom)).select(
        "ck",
        (
            (F.col("xa") - F.col("sa") * 1.0 / F.col("n"))
            / F.sqrt(
                (F.col("saa") - F.col("sa") * F.col("sa") * 1.0 / F.col("n"))
                / F.col("n")
            )
        ).alias("u"),
        (
            (F.col("xb") - F.col("sb") * 1.0 / F.col("n"))
            / F.sqrt(
                (F.col("sbb") - F.col("sb") * F.col("sb") * 1.0 / F.col("n"))
                / F.col("n")
            )
        ).alias("v"),
    ).localCheckpoint(eager=False)
    folded = std.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ck", "u", "v"))),
            lambda s: F.array(s["u"], s["v"]),
        ).alias("xs")
    ).select(F.expr(_OJA_SPARK_FOLD).alias("w"))
    cov = std.agg(
        (F.sum(F.col("u") * F.col("u")) / F.count(F.lit(1))).alias("sxx"),
        (F.sum(F.col("u") * F.col("v")) / F.count(F.lit(1))).alias("sxy"),
        (F.sum(F.col("v") * F.col("v")) / F.count(F.lit(1))).alias("syy"),
    )
    lam = (
        (F.col("sxx") + F.col("syy"))
        + F.sqrt(
            (F.col("sxx") - F.col("syy")) * (F.col("sxx") - F.col("syy"))
            + 4 * F.col("sxy") * F.col("sxy")
        )
    ) / 2
    pc = cov.select(
        lam.alias("lam"), "sxy", "sxx", "syy"
    ).select(
        "lam",
        "sxx",
        "syy",
        (
            F.col("sxy")
            / F.sqrt(
                F.col("sxy") * F.col("sxy")
                + (F.col("lam") - F.col("sxx")) * (F.col("lam") - F.col("sxx"))
            )
        ).alias("e1"),
        (
            (F.col("lam") - F.col("sxx"))
            / F.sqrt(
                F.col("sxy") * F.col("sxy")
                + (F.col("lam") - F.col("sxx")) * (F.col("lam") - F.col("sxx"))
            )
        ).alias("e2"),
    )
    we = lambda k: F.element_at("w", k)  # noqa: E731
    return folded.crossJoin(F.broadcast(pc)).select(
        r6(we(1)).alias("oja_w1"),
        r6(we(2)).alias("oja_w2"),
        r6(F.abs(we(1) * F.col("e1") + we(2) * F.col("e2"))).alias(
            "alignment"
        ),
        r6(F.col("lam") / (F.col("sxx") + F.col("syy"))).alias(
            "pc1_var_share"
        ),
    )


# ---------------------------------------------------------------------------
# Q645 — Cochrane-Orcutt correction for AR(1) errors
# ---------------------------------------------------------------------------
# Daily revenue regressed on the day index: Durbin-Watson (q362's
# statistic) shows serial correlation, rho is estimated from lagged
# residuals, and the quasi-differenced regression y_t - rho y_{t-1}
# on x_t - rho x_{t-1} re-estimates the trend — the classic two-step
# fix for autocorrelated errors.
_Q645_ORACLE = """
    WITH daily AS MATERIALIZED (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY d) AS DOUBLE) AS t, x
      FROM (SELECT EXTRACT(day FROM ts) AS d,
                   ROUND(SUM(ROUND(value * 100)) / 1000.0) AS x
            FROM events GROUP BY EXTRACT(day FROM ts))
    ), fit AS (
      SELECT COUNT(*) AS n, AVG(t) AS mt, AVG(x) AS mx,
             (SUM(t * x) - COUNT(*) * AVG(t) * AVG(x))
               / (SUM(t * t) - COUNT(*) * AVG(t) * AVG(t)) AS b1
      FROM daily
    ), resid AS MATERIALIZED (
      SELECT d.t, d.x,
             (d.x - f.mx) - f.b1 * (d.t - f.mt) AS e,
             f.b1 AS slope_ols
      FROM daily d, fit f
    ), lagd AS MATERIALIZED (
      SELECT t, x, e, slope_ols,
             LAG(e) OVER (ORDER BY t) AS el,
             LAG(x) OVER (ORDER BY t) AS xl,
             LAG(t) OVER (ORDER BY t) AS tl
      FROM resid
    ), rho AS (
      SELECT SUM(e * el) / SUM(el * el) AS r,
             SUM((e - el) * (e - el)) / SUM(e * e) AS dw
      FROM lagd WHERE el IS NOT NULL
    ), quasi AS MATERIALIZED (
      SELECT l.x - r.r * l.xl AS ys, l.t - r.r * l.tl AS xs,
             l.slope_ols, r.r, r.dw
      FROM lagd l, rho r WHERE l.xl IS NOT NULL
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_quasi,
           ROUND(MAX(r) + 5e-12, 6) AS rho,
           ROUND(MAX(dw) + 5e-12, 6) AS durbin_watson,
           ROUND(MAX(slope_ols) + 5e-12, 6) AS slope_ols,
           ROUND((SUM(xs * ys) - COUNT(*) * AVG(xs) * AVG(ys))
                 / (SUM(xs * xs) - COUNT(*) * AVG(xs) * AVG(xs))
                 + 5e-12, 6) AS slope_corrected
    FROM quasi
"""


@register(
    "q645_cochrane_orcutt",
    _Q645_ORACLE,
    doc="Cochrane-Orcutt two-step: OLS trend on daily revenue, rho "
    "from lagged residuals (with Durbin-Watson alongside, cf. "
    "q362), then the quasi-differenced regression re-estimating the "
    "slope under AR(1) errors — the textbook serial-correlation "
    "correction.",
)
def q645(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    base = e.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.round(F.sum(F.round(F.col("value") * 100)) / 1000.0).alias("x")
    )
    daily = base.select(
        F.row_number().over(Window.orderBy("d")).cast("double").alias("t"),
        "x",
    ).localCheckpoint(eager=False)
    n = F.count(F.lit(1))
    fit = daily.agg(
        n.alias("n"),
        F.avg("t").alias("mt"),
        F.avg("x").alias("mx"),
        (
            (F.sum(F.col("t") * F.col("x")) - n * F.avg("t") * F.avg("x"))
            / (F.sum(F.col("t") * F.col("t")) - n * F.avg("t") * F.avg("t"))
        ).alias("b1"),
    )
    resid = daily.crossJoin(F.broadcast(fit)).select(
        "t",
        "x",
        (
            (F.col("x") - F.col("mx")) - F.col("b1") * (F.col("t") - F.col("mt"))
        ).alias("e"),
        F.col("b1").alias("slope_ols"),
    )
    wo = Window.orderBy("t")
    lagd = resid.select(
        "t",
        "x",
        "e",
        "slope_ols",
        F.lag("e").over(wo).alias("el"),
        F.lag("x").over(wo).alias("xl"),
        F.lag("t").over(wo).alias("tl"),
    ).localCheckpoint(eager=False)
    rho = lagd.filter(F.col("el").isNotNull()).agg(
        (F.sum(F.col("e") * F.col("el")) / F.sum(F.col("el") * F.col("el"))).alias(
            "r"
        ),
        (
            F.sum((F.col("e") - F.col("el")) * (F.col("e") - F.col("el")))
            / F.sum(F.col("e") * F.col("e"))
        ).alias("dw"),
    )
    quasi = (
        lagd.filter(F.col("xl").isNotNull())
        .crossJoin(F.broadcast(rho))
        .select(
            (F.col("x") - F.col("r") * F.col("xl")).alias("ys"),
            (F.col("t") - F.col("r") * F.col("tl")).alias("xs"),
            "slope_ols",
            "r",
            "dw",
        )
    )
    nq = F.count(F.lit(1))
    return quasi.agg(
        nq.cast("bigint").alias("n_quasi"),
        r6(F.max("r")).alias("rho"),
        r6(F.max("dw")).alias("durbin_watson"),
        r6(F.max("slope_ols")).alias("slope_ols"),
        r6(
            (F.sum(F.col("xs") * F.col("ys")) - nq * F.avg("xs") * F.avg("ys"))
            / (F.sum(F.col("xs") * F.col("xs")) - nq * F.avg("xs") * F.avg("xs"))
        ).alias("slope_corrected"),
    )


# ---------------------------------------------------------------------------
# Q646 — TURF analysis: greedy unduplicated reach
# ---------------------------------------------------------------------------
# Among the top 8 brands, pick 3 greedily so each addition maximizes
# total unduplicated customer reach — the marketing line-planning
# optimizer (a submodular-coverage greedy, so within 1-1/e of
# optimal), all counts exact integers.
_Q646_ORACLE = """
    WITH top8 AS MATERIALIZED (
      SELECT p2.p_brand AS b FROM lineitem l2
      JOIN part p2 ON p2.p_partkey = l2.l_partkey
      GROUP BY p2.p_brand ORDER BY COUNT(*) DESC, p2.p_brand LIMIT 8
    ), cb AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey AS ck, p.p_brand AS b
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN top8 t ON t.b = p.p_brand
    ), tot AS (
      SELECT COUNT(DISTINCT ck) AS nc FROM cb
    ), r1 AS MATERIALIZED (
      SELECT b AS b1, COUNT(DISTINCT ck) AS reach1 FROM cb
      GROUP BY b ORDER BY COUNT(DISTINCT ck) DESC, b LIMIT 1
    ), cov1 AS MATERIALIZED (
      SELECT DISTINCT cb.ck FROM cb, r1 WHERE cb.b = r1.b1
    ), pick2 AS (
      SELECT cb.b AS b2, COUNT(DISTINCT cb.ck) AS inc2
      FROM cb, r1
      WHERE cb.b <> r1.b1
        AND NOT EXISTS (SELECT 1 FROM cov1 c WHERE c.ck = cb.ck)
      GROUP BY cb.b ORDER BY COUNT(DISTINCT cb.ck) DESC, cb.b LIMIT 1
    )
    SELECT r1.b1 AS first_brand,
           CAST(r1.reach1 AS BIGINT) AS reach_1,
           p2.b2 AS second_brand,
           CAST(r1.reach1 + p2.inc2 AS BIGINT) AS reach_2,
           ROUND((r1.reach1 + p2.inc2) * 1.0 / tot.nc + 5e-12, 6)
             AS reach_2_pct
    FROM r1, pick2 p2, tot
"""


@register(
    "q646_turf_reach",
    _Q646_ORACLE,
    doc="TURF analysis: greedy 2-step unduplicated-reach maximization "
    "over the top-8 brands (pick the widest brand, then the brand "
    "adding the most new customers) — the submodular-coverage "
    "greedy of assortment planning, kin to knapsack curation "
    "(q298) and assortment MNL (q506).",
)
def q646(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lp = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).join(
        o, li.l_orderkey == o.o_orderkey
    )
    top8 = (
        lp.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "p_brand")
        .limit(8)
        .select("p_brand")
    )
    cb = (
        lp.join(F.broadcast(top8), "p_brand")
        .select(F.col("o_custkey").alias("ck"), F.col("p_brand").alias("b"))
        .distinct()
        # lineage cut: TURF greedy rounds re-reference the basket per
        # pick (plan audit: 39 scans with persist-only lineage)
        .localCheckpoint(eager=False)
    )
    tot = cb.agg(F.countDistinct("ck").alias("nc"))
    r1 = (
        cb.groupBy("b")
        .agg(F.countDistinct("ck").alias("reach1"))
        .orderBy(F.desc("reach1"), "b")
        .limit(1)
        .select(F.col("b").alias("b1"), "reach1")
        .localCheckpoint(eager=True)
    )
    covered1 = cb.crossJoin(F.broadcast(r1)).filter(
        F.col("b") == F.col("b1")
    ).select("ck").distinct()
    incr = (
        cb.crossJoin(F.broadcast(r1))
        .filter(F.col("b") != F.col("b1"))
        .join(covered1.withColumnRenamed("ck", "ck2"),
              F.col("ck") == F.col("ck2"), "left_anti")
        .groupBy("b")
        .agg(F.countDistinct("ck").alias("inc"))
        .orderBy(F.desc("inc"), "b")
        .limit(1)
        .select(F.col("b").alias("b2"), F.col("inc").alias("inc2"))
    )
    return (
        r1.crossJoin(F.broadcast(incr))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("b1").alias("first_brand"),
            F.col("reach1").cast("bigint").alias("reach_1"),
            F.col("b2").alias("second_brand"),
            (F.col("reach1") + F.col("inc2")).cast("bigint").alias("reach_2"),
            r6(
                (F.col("reach1") + F.col("inc2")) * 1.0 / F.col("nc")
            ).alias("reach_2_pct"),
        )
    )


# ---------------------------------------------------------------------------
# Q647 — Kupiec proportion-of-failures VaR backtest
# ---------------------------------------------------------------------------
# Historical 5% VaR from the first 20 daily returns, then the
# out-of-sample exception count against Kupiec's likelihood-ratio
# test LR = -2 ln[(1-p)^(n-x) p^x] + 2 ln[(1-x/n)^(n-x) (x/n)^x] ~
# chi-square(1) — the regulatory backtest that VaR (q557) must pass.
_Q647_ORACLE = """
    WITH daily AS MATERIALIZED (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t, x
      FROM (SELECT EXTRACT(day FROM ts) AS d,
                   SUM(ROUND(value * 100)) AS x
            FROM events GROUP BY EXTRACT(day FROM ts))
    ), rets AS MATERIALIZED (
      SELECT t, x * 1.0 / LAG(x) OVER (ORDER BY t) - 1 AS r
      FROM daily
    ), var_est AS (
      SELECT quantile_cont(r, CAST(0.05 AS DOUBLE)) AS var5
      FROM rets WHERE r IS NOT NULL AND t <= 21
    ), test AS (
      SELECT COUNT(*) AS n,
             SUM(CASE WHEN rets.r < v.var5 THEN 1 ELSE 0 END) AS x
      FROM rets, var_est v
      WHERE rets.r IS NOT NULL AND rets.t > 21
    )
    SELECT ROUND(v.var5 + 5e-12, 6) AS var_5pct,
           CAST(t.n AS BIGINT) AS n_test_days,
           CAST(t.x AS BIGINT) AS exceptions,
           ROUND(t.x * 1.0 / t.n + 5e-12, 6) AS exception_rate,
           ROUND(
             -2 * ((t.n - t.x) * LN(0.95) + t.x * LN(0.05))
             + 2 * (CASE WHEN t.x > 0 AND t.x < t.n THEN
                      (t.n - t.x) * LN(1 - t.x * 1.0 / t.n)
                      + t.x * LN(t.x * 1.0 / t.n)
                    WHEN t.x = 0 THEN t.n * LN(1.0)
                    ELSE t.x * LN(1.0) END)
             + 5e-12, 6) AS kupiec_lr,
           -2 * ((t.n - t.x) * LN(0.95) + t.x * LN(0.05))
             + 2 * (CASE WHEN t.x > 0 AND t.x < t.n THEN
                      (t.n - t.x) * LN(1 - t.x * 1.0 / t.n)
                      + t.x * LN(t.x * 1.0 / t.n)
                    ELSE 0 END) > 3.841 AS reject_model
    FROM test t, var_est v
"""


@register(
    "q647_var_backtest",
    _Q647_ORACLE,
    doc="Kupiec proportion-of-failures backtest: historical 5% VaR "
    "from the first 20 daily returns, out-of-sample exception count "
    "and the likelihood ratio against chi-square(1) — the Basel "
    "traffic-light check on top of VaR/CVaR (q557).",
)
def q647(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    base = e.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100)).alias("x")
    )
    daily = base.select(
        F.row_number().over(Window.orderBy("d")).cast("bigint").alias("t"),
        "x",
    )
    rets = daily.select(
        "t",
        (
            F.col("x") * 1.0 / F.lag("x").over(Window.orderBy("t")) - 1
        ).alias("r"),
    ).filter(F.col("r").isNotNull()).localCheckpoint(eager=False)
    var_est = rets.filter(F.col("t") <= 21).agg(
        F.expr("percentile(r, CAST(0.05 AS DOUBLE))").alias("var5")
    )
    test = (
        rets.filter(F.col("t") > 21)
        .crossJoin(F.broadcast(var_est))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("r") < F.col("var5"), 1).otherwise(0)
            ).alias("x"),
            F.max("var5").alias("var5"),
        )
    )
    nn, xx = F.col("n"), F.col("x")
    rate = xx * 1.0 / nn
    alt = F.when(
        (xx > 0) & (xx < nn),
        (nn - xx) * F.log(1 - rate) + xx * F.log(rate),
    ).otherwise(0.0)
    lr = -2 * ((nn - xx) * F.log(F.lit(0.95)) + xx * F.log(F.lit(0.05))) + 2 * alt
    return test.select(
        r6(F.col("var5")).alias("var_5pct"),
        nn.cast("bigint").alias("n_test_days"),
        xx.cast("bigint").alias("exceptions"),
        r6(rate).alias("exception_rate"),
        r6(lr).alias("kupiec_lr"),
        (lr > 3.841).alias("reject_model"),
    )


# ---------------------------------------------------------------------------
# Q648 — Belady's optimal cache vs LRU, replayed as folds
# ---------------------------------------------------------------------------
# The first 400 orders' customer buckets (mod 8) replayed through a
# 3-slot cache twice: OPT evicts the entry whose next use (LEAD over
# the stream) is farthest, LRU evicts the least recently used. OPT's
# hit rate upper-bounds every online policy — the gap is the price
# of not knowing the future, cf. stack distances (q424).
def _opt_fold(el, xv: str, nx: str) -> str:
    m = (
        f"CASE WHEN {el(2)}={xv} THEN 1 WHEN {el(4)}={xv} THEN 2 "
        f"WHEN {el(6)}={xv} THEN 3 ELSE 0 END"
    )
    z = (
        f"CASE WHEN {el(2)}=-1 THEN 1 WHEN {el(4)}=-1 THEN 2 "
        f"WHEN {el(6)}=-1 THEN 3 ELSE 0 END"
    )
    ev = (
        f"CASE WHEN {el(3)}>={el(5)} AND {el(3)}>={el(7)} THEN 1 "
        f"WHEN {el(5)}>={el(7)} THEN 2 ELSE 3 END"
    )
    tgt = (
        f"CASE WHEN ({m})>0 THEN ({m}) WHEN ({z})>0 THEN ({z}) "
        f"ELSE ({ev}) END"
    )
    parts = [f"{el(1)} + (CASE WHEN ({m})>0 THEN 1 ELSE 0 END)"]
    for slot in (1, 2, 3):
        kp, np_ = 2 * slot, 2 * slot + 1
        parts.append(f"CASE WHEN ({tgt})={slot} THEN {xv} ELSE {el(kp)} END")
        parts.append(f"CASE WHEN ({tgt})={slot} THEN {nx} ELSE {el(np_)} END")
    return ", ".join(parts)


def _lru_fold(el, xv: str) -> str:
    m = (
        f"CASE WHEN {el(2)}={xv} THEN 1 WHEN {el(3)}={xv} THEN 2 "
        f"WHEN {el(4)}={xv} THEN 3 ELSE 0 END"
    )
    return ", ".join(
        [
            f"{el(1)} + (CASE WHEN ({m})>0 THEN 1 ELSE 0 END)",
            f"{xv}",
            f"CASE WHEN ({m})=1 THEN {el(3)} ELSE {el(2)} END",
            f"CASE WHEN ({m})=1 OR ({m})=2 THEN {el(4)} ELSE {el(3)} END",
        ]
    )


_Q648_ORACLE = f"""
    WITH stream AS MATERIALIZED (
      SELECT rn, CAST(o_custkey % 8 AS DOUBLE) AS k
      FROM (SELECT o_custkey,
                   ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
            FROM orders)
      WHERE rn <= 400
    ), nxt AS MATERIALIZED (
      SELECT rn, k,
             CAST(COALESCE(LEAD(rn) OVER (PARTITION BY k ORDER BY rn),
                           999999) AS DOUBLE) AS nx
      FROM stream
    ), folded AS (
      SELECT COUNT(*) AS n,
             list_reduce(
               list_prepend([CAST(0 AS DOUBLE), -1, 999999, -1, 999999,
                             -1, 999999],
                            list([k, nx] ORDER BY rn)),
               (acc, x) -> [{_opt_fold(lambda i: f'acc[{i}]',
                                       'x[1]', 'x[2]')}]
             ) AS fo,
             list_reduce(
               list_prepend([CAST(0 AS DOUBLE), -1, -2, -3],
                            list([k, nx] ORDER BY rn)),
               (acc, x) -> [{_lru_fold(lambda i: f'acc[{i}]', 'x[1]')}]
             ) AS fl
      FROM nxt
    )
    SELECT CAST(n AS BIGINT) AS n_accesses,
           CAST(fo[1] AS BIGINT) AS opt_hits,
           CAST(fl[1] AS BIGINT) AS lru_hits,
           ROUND(fo[1] / n + 5e-12, 6) AS opt_hit_rate,
           ROUND(fl[1] / n + 5e-12, 6) AS lru_hit_rate,
           fo[1] >= fl[1] AS opt_dominates
    FROM folded
"""

_OPT_SPARK = (
    "aggregate(xs, array(CAST(0 AS DOUBLE), -1, 999999, -1, 999999, "
    "-1, 999999), (acc, x) -> array("
    + _opt_fold(
        lambda i: f"element_at(acc, {i})",
        "element_at(x, 1)",
        "element_at(x, 2)",
    )
    + "))"
)
_LRU_SPARK = (
    "aggregate(xs, array(CAST(0 AS DOUBLE), -1, -2, -3), "
    "(acc, x) -> array("
    + _lru_fold(lambda i: f"element_at(acc, {i})", "element_at(x, 1)")
    + "))"
)


@register(
    "q648_belady_opt",
    _Q648_ORACLE,
    doc="Belady's OPT vs LRU: the first 400 orders' customer buckets "
    "through a 3-slot cache, OPT evicting the farthest-next-use "
    "entry (LEAD-precomputed future) and LRU the least recent, both "
    "as folds — the clairvoyant upper bound that prices online "
    "caching, extending stack distances (q424).",
)
def q648(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    stream = o.select(
        F.row_number().over(Window.orderBy("o_orderkey")).alias("rn"),
        (F.col("o_custkey") % 8).cast("double").alias("k"),
    ).filter(F.col("rn") <= 400)
    nxt = stream.select(
        "rn",
        "k",
        F.coalesce(
            F.lead("rn").over(Window.partitionBy("k").orderBy("rn")),
            F.lit(999999),
        )
        .cast("double")
        .alias("nx"),
    )
    folded = nxt.agg(
        F.count(F.lit(1)).alias("n"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("rn", "k", "nx"))),
            lambda s: F.array(s["k"], s["nx"]),
        ).alias("xs"),
    ).select(
        "n", F.expr(_OPT_SPARK).alias("fo"), F.expr(_LRU_SPARK).alias("fl")
    )
    return folded.select(
        F.col("n").cast("bigint").alias("n_accesses"),
        F.element_at("fo", 1).cast("bigint").alias("opt_hits"),
        F.element_at("fl", 1).cast("bigint").alias("lru_hits"),
        r6(F.element_at("fo", 1) / F.col("n")).alias("opt_hit_rate"),
        r6(F.element_at("fl", 1) / F.col("n")).alias("lru_hit_rate"),
        (F.element_at("fo", 1) >= F.element_at("fl", 1)).alias(
            "opt_dominates"
        ),
    )
