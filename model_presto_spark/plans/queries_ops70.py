"""Conformance queries batch #70 (q544+) — AIC model selection,
birthday-bound collision audit, micro-batch sizing, tornado
sensitivity, and priority-queue waiting times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q544 — nested model selection by AIC
# ---------------------------------------------------------------------------
# Three nested regressions of log-spend (intercept-only, +log
# balance, +log order count) with RSS in closed form (Cramer
# machinery) and AIC = n ln(RSS/n) + 2k: the delta-AIC table picks
# the model — information-criterion selection on top of the q499
# fit, where R^2 alone would always say "bigger".
_Q544_ORACLE = """
    WITH u AS MATERIALIZED (
      SELECT LN(1 + COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0)) AS y,
             LN(c.c_acctbal + 10000.0) AS x1,
             LN(1.0 + COUNT(o.o_orderkey)) AS x2
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_acctbal
    ), m AS (
      SELECT COUNT(*) AS n, SUM(y) AS sy, SUM(y * y) AS syy,
             SUM(x1) AS s1, SUM(x1 * x1) AS s11, SUM(x1 * y) AS s1y,
             SUM(x2) AS s2, SUM(x2 * x2) AS s22, SUM(x2 * y) AS s2y,
             SUM(x1 * x2) AS s12
      FROM u
    ), c0 AS (
      SELECT n,
             syy - sy * sy / n AS tss,
             s11 - s1 * s1 / n AS c11, s22 - s2 * s2 / n AS c22,
             s12 - s1 * s2 / n AS c12, s1y - s1 * sy / n AS c1y,
             s2y - s2 * sy / n AS c2y
      FROM m
    ), rss AS (
      SELECT n, tss AS rss0,
             tss - c1y * c1y / c11 AS rss1,
             tss - (c1y * (c1y * c22 - c2y * c12)
                    + c2y * (c2y * c11 - c1y * c12))
                   / (c11 * c22 - c12 * c12) AS rss2
      FROM c0
    ), models AS (
      SELECT 'intercept_only' AS model, 1 AS k, rss0 AS rss, n FROM rss
      UNION ALL SELECT 'plus_balance', 2, rss1, n FROM rss
      UNION ALL SELECT 'plus_balance_orders', 3, rss2, n FROM rss
    ), aic AS (
      SELECT model, k, rss, n,
             n * LN(rss / n) + 2 * k AS aic
      FROM models
    )
    SELECT model, CAST(k AS BIGINT) AS n_params,
           ROUND(rss + 5e-10, 4) AS rss,
           ROUND(aic + 5e-10, 4) AS aic,
           ROUND(aic - (SELECT MIN(aic) FROM aic) + 5e-10, 4) AS delta_aic,
           aic = (SELECT MIN(aic) FROM aic) AS is_best
    FROM aic ORDER BY aic
"""


@register(
    "q544_aic_selection",
    _Q544_ORACLE,
    doc="Nested-model selection by AIC: intercept-only vs +balance vs "
    "+balance+orders with closed-form RSS (Cramer partials), "
    "AIC = n ln(RSS/n) + 2k and the delta table — the "
    "information-criterion discipline R^2 lacks, on top of the "
    "q499/q537 regression machinery.",
)
def q544(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    u = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            F.log(
                1
                + F.coalesce(
                    F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0)
                )
            ).alias("y"),
            F.log(1.0 + F.count("o_orderkey")).alias("x2"),
        )
        .select("y", F.log(F.col("c_acctbal") + 10000.0).alias("x1"), "x2")
    )
    m = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum("x1").alias("s1"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum("x2").alias("s2"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        # one-row moment frame feeding three nested-model branches:
        # cut lineage (plan audit: 24 scans un-materialized)
    ).localCheckpoint(eager=True)
    n = F.col("n")
    c0 = m.select(
        "n",
        (F.col("syy") - F.col("sy") * F.col("sy") / n).alias("tss"),
        (F.col("s11") - F.col("s1") * F.col("s1") / n).alias("c11"),
        (F.col("s22") - F.col("s2") * F.col("s2") / n).alias("c22"),
        (F.col("s12") - F.col("s1") * F.col("s2") / n).alias("c12"),
        (F.col("s1y") - F.col("s1") * F.col("sy") / n).alias("c1y"),
        (F.col("s2y") - F.col("s2") * F.col("sy") / n).alias("c2y"),
    )
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    rss = c0.select(
        "n",
        F.col("tss").alias("rss0"),
        (F.col("tss") - F.col("c1y") * F.col("c1y") / F.col("c11")).alias("rss1"),
        (
            F.col("tss")
            - (
                F.col("c1y") * (F.col("c1y") * F.col("c22") - F.col("c2y") * F.col("c12"))
                + F.col("c2y")
                * (F.col("c2y") * F.col("c11") - F.col("c1y") * F.col("c12"))
            )
            / det
        ).alias("rss2"),
    )
    models = (
        rss.select(
            F.lit("intercept_only").alias("model"),
            F.lit(1).alias("k"),
            F.col("rss0").alias("rss"),
            "n",
        )
        .unionAll(
            rss.select(F.lit("plus_balance"), F.lit(2), F.col("rss1"), "n")
        )
        .unionAll(
            rss.select(
                F.lit("plus_balance_orders"), F.lit(3), F.col("rss2"), "n"
            )
        )
    )
    aic = models.select(
        "model",
        "k",
        "rss",
        (F.col("n") * F.log(F.col("rss") / F.col("n")) + 2 * F.col("k")).alias(
            "aic"
        ),
    )
    best = aic.agg(F.min("aic").alias("ba"))
    r4 = lambda cexpr: F.round(cexpr + F.lit(5e-10), 4)  # noqa: E731
    return (
        aic.crossJoin(F.broadcast(best))
        .select(
            "model",
            F.col("k").cast("bigint").alias("n_params"),
            r4(F.col("rss")).alias("rss"),
            r4(F.col("aic")).alias("aic"),
            r4(F.col("aic") - F.col("ba")).alias("delta_aic"),
            (F.col("aic") == F.col("ba")).alias("is_best"),
        )
        .orderBy("aic")
    )


# ---------------------------------------------------------------------------
# Q545 — birthday-bound hash collision audit
# ---------------------------------------------------------------------------
# Multiplicative hashes of the order keys folded into 2^20 and 2^24
# buckets: the measured colliding-pair counts against the birthday
# approximation n(n-1)/(2m) — the capacity-planning number behind
# every hash join, fingerprint table and dedup key (hash quality
# q465 measured balance; this measures collisions).
_Q545_ORACLE = """
    WITH ks AS MATERIALIZED (
      SELECT DISTINCT o_orderkey AS k FROM orders
    ), h AS MATERIALIZED (
      SELECT ((k * 2654435761) % 4294967296) % 1048576 AS h20,
             ((k * 2654435761) % 4294967296) % 16777216 AS h24
      FROM ks
    ), n AS (SELECT COUNT(*) AS n FROM ks
    ), c20 AS (
      SELECT SUM(c * (c - 1) / 2) AS pairs FROM (
        SELECT h20, COUNT(*) AS c FROM h GROUP BY h20)
    ), c24 AS (
      SELECT SUM(c * (c - 1) / 2) AS pairs FROM (
        SELECT h24, COUNT(*) AS c FROM h GROUP BY h24)
    )
    SELECT CAST(n.n AS BIGINT) AS n_keys,
           CAST(c20.pairs AS BIGINT) AS collisions_2pow20,
           ROUND(n.n * (n.n - 1) / 2.0 / 1048576 + 5e-10, 4)
             AS birthday_2pow20,
           CAST(c24.pairs AS BIGINT) AS collisions_2pow24,
           ROUND(n.n * (n.n - 1) / 2.0 / 16777216 + 5e-10, 4)
             AS birthday_2pow24
    FROM n, c20, c24
"""


@register(
    "q545_birthday_collisions",
    _Q545_ORACLE,
    doc="Birthday-bound audit: measured colliding pairs of the "
    "multiplicative hash at 2^20 and 2^24 buckets vs the "
    "n(n-1)/(2m) approximation — the collision budget behind "
    "fingerprints (q31), Bloom sizing (q300) and hash balance "
    "(q465).",
)
def q545(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    ks = o.select(F.col("o_orderkey").alias("k")).distinct()
    hv = ((F.col("k") * 2654435761) % 4294967296)
    h = ks.select(
        (hv % 1048576).alias("h20"), (hv % 16777216).alias("h24")
    ).localCheckpoint(eager=False)
    n = ks.agg(F.count(F.lit(1)).alias("n"))
    c20 = (
        h.groupBy("h20")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("p20"))
    )
    c24 = (
        h.groupBy("h24")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("p24"))
    )
    r4 = lambda cexpr: F.round(cexpr + F.lit(5e-10), 4)  # noqa: E731
    return (
        n.crossJoin(F.broadcast(c20))
        .crossJoin(F.broadcast(c24))
        .select(
            F.col("n").cast("bigint").alias("n_keys"),
            F.col("p20").cast("bigint").alias("collisions_2pow20"),
            r4(F.col("n") * (F.col("n") - 1) / 2.0 / 1048576).alias(
                "birthday_2pow20"
            ),
            F.col("p24").cast("bigint").alias("collisions_2pow24"),
            r4(F.col("n") * (F.col("n") - 1) / 2.0 / 16777216).alias(
                "birthday_2pow24"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Q546 — micro-batch sizing: latency vs batch count
# ---------------------------------------------------------------------------
# Events grouped into arrival-order batches of B = 1/8/64: each
# event waits until its batch completes (batch max timestamp), so
# bigger batches buy fewer batches at the cost of added latency —
# the micro-batching tradeoff measured (mean and p95 wait per B),
# i.e. the knob behind trigger intervals and maxFilesPerTrigger in
# the streaming layer (T1-T3).
_Q546_ORACLE = """
    WITH ev AS MATERIALIZED (
      SELECT epoch_us(ts) AS t,
             ROW_NUMBER() OVER (ORDER BY ts, event_id) - 1 AS rn
      FROM events WHERE EXTRACT(day FROM ts) <= 7
    ), bs AS (
      SELECT * FROM (VALUES (1), (8), (64)) b(b)
    ), batched AS (
      SELECT bs.b, ev.rn // bs.b AS batch, ev.t
      FROM ev, bs
    ), waits AS (
      SELECT b, batch, t,
             MAX(t) OVER (PARTITION BY b, batch) - t AS wait_us
      FROM batched
    )
    SELECT CAST(b AS BIGINT) AS batch_size,
           CAST(COUNT(DISTINCT batch) AS BIGINT) AS n_batches,
           ROUND(AVG(wait_us / 1e6) + 5e-10, 4) AS mean_wait_s,
           ROUND(quantile_cont(wait_us / 1e6, 0.95) + 5e-10, 4)
             AS p95_wait_s
    FROM waits GROUP BY b ORDER BY batch_size
"""


@register(
    "q546_microbatch_sizing",
    _Q546_ORACLE,
    doc="Micro-batch sizing measured: events in arrival-order batches "
    "of 1/8/64 wait for their batch max timestamp — mean and p95 "
    "added latency vs batch count, the empirical tradeoff behind "
    "streaming trigger intervals (T1-T3) and the Lindley waits "
    "(q538).",
)
def q546(spark: SparkSession, sf_dir: str) -> DataFrame:
    evt = _t(spark, sf_dir, "events").filter(F.dayofmonth("ts") <= 7)
    ev = evt.select(
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        (F.row_number().over(Window.orderBy("ts", "event_id")) - 1).alias("rn"),
    )
    bs = spark.createDataFrame([(1,), (8,), (64,)], "b int")
    batched = ev.crossJoin(F.broadcast(bs)).select(
        "b", F.floor(F.col("rn") / F.col("b")).alias("batch"), "t"
    )
    waits = batched.select(
        "b",
        "batch",
        (
            F.max("t").over(Window.partitionBy("b", "batch")) - F.col("t")
        ).alias("wait_us"),
    )
    return (
        waits.groupBy("b")
        .agg(
            F.count_distinct("batch").cast("bigint").alias("n_batches"),
            F.round(F.avg(F.col("wait_us") / 1e6) + F.lit(5e-10), 4).alias(
                "mean_wait_s"
            ),
            F.round(
                F.percentile(F.col("wait_us") / 1e6, F.lit(0.95))
                + F.lit(5e-10),
                4,
            ).alias("p95_wait_s"),
        )
        .select(
            F.col("b").cast("bigint").alias("batch_size"),
            "n_batches",
            "mean_wait_s",
            "p95_wait_s",
        )
        .orderBy("batch_size")
    )


# ---------------------------------------------------------------------------
# Q547 — tornado sensitivity of the newsvendor profit
# ---------------------------------------------------------------------------
# One-way sensitivity: the q417-style newsvendor profit at the
# critical-fractile stock recomputed under +-20% swings of price,
# cost, and demand — the six scenario deltas sorted by |impact|
# (the tornado diagram's table), showing which parameter the
# decision actually hinges on.
_Q547_ORACLE = """
    WITH dem AS MATERIALIZED (
      SELECT CAST(EXTRACT(day FROM ts) AS BIGINT) AS d, COUNT(*) AS q
      FROM events WHERE event_type = 'purchase' AND EXTRACT(day FROM ts) <= 28
      GROUP BY 1
    ), scen AS (
      SELECT * FROM (VALUES
        ('baseline', 1.0, 1.0, 1.0), ('price_up', 1.2, 1.0, 1.0),
        ('price_dn', 0.8, 1.0, 1.0), ('cost_up', 1.0, 1.2, 1.0),
        ('cost_dn', 1.0, 0.8, 1.0), ('demand_up', 1.0, 1.0, 1.2),
        ('demand_dn', 1.0, 1.0, 0.8)) s(scenario, pf, cf, df)
    ), par AS (
      SELECT s.scenario, 10.0 * s.pf AS price, 6.0 * s.cf AS cost,
             s.df AS df
      FROM scen s
    ), qarr AS (
      SELECT quantile_cont(CAST(q AS DOUBLE),
               [0.4, 0.5, 0.25, 0.28, 0.52]) AS qa
      FROM dem
    ), stock AS (
      SELECT p.scenario, p.price, p.cost, p.df,
             p.df * qarr.qa[CASE p.scenario
               WHEN 'price_up' THEN 2 WHEN 'price_dn' THEN 3
               WHEN 'cost_up' THEN 4 WHEN 'cost_dn' THEN 5
               ELSE 1 END] AS s_opt
      FROM par p, qarr
    ), profit AS (
      SELECT st.scenario, st.price, st.cost, st.s_opt,
             AVG(st.price * LEAST(d.q * st.df, st.s_opt)
                 - st.cost * st.s_opt) AS exp_profit
      FROM stock st, dem d
      GROUP BY st.scenario, st.price, st.cost, st.s_opt
    ), base AS (
      SELECT exp_profit AS p0 FROM profit WHERE scenario = 'baseline'
    )
    SELECT p.scenario,
           ROUND(p.s_opt + 5e-10, 4) AS optimal_stock,
           ROUND(p.exp_profit + 5e-10, 4) AS expected_profit,
           ROUND(p.exp_profit - b.p0 + 5e-10, 4) AS delta_vs_baseline
    FROM profit p, base b
    ORDER BY ABS(p.exp_profit - b.p0) DESC, p.scenario
"""


@register(
    "q547_tornado_sensitivity",
    _Q547_ORACLE,
    doc="Tornado (one-way) sensitivity of the newsvendor decision: "
    "critical-fractile stock and expected profit recomputed under "
    "+-20% price/cost/demand swings, deltas sorted by impact — "
    "which parameter the q417 decision actually hinges on.",
)
def q547(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.dayofmonth("ts") <= 28)
    )
    dem = ev.groupBy(F.dayofmonth("ts").cast("bigint").alias("d")).agg(
        F.count(F.lit(1)).alias("q")
    ).localCheckpoint(eager=False)
    scen = spark.createDataFrame(
        [
            ("baseline", 1.0, 1.0, 1.0), ("price_up", 1.2, 1.0, 1.0),
            ("price_dn", 0.8, 1.0, 1.0), ("cost_up", 1.0, 1.2, 1.0),
            ("cost_dn", 1.0, 0.8, 1.0), ("demand_up", 1.0, 1.0, 1.2),
            ("demand_dn", 1.0, 1.0, 0.8),
        ],
        "scenario string, pf double, cf double, df double",
    )
    par = scen.select(
        "scenario",
        (10.0 * F.col("pf")).alias("price"),
        (6.0 * F.col("cf")).alias("cost"),
        "df",
    )
    fracs = [0.4, 0.5, 0.25, 1.0 - 7.2 / 10.0, 1.0 - 4.8 / 10.0]
    qarr = dem.agg(
        F.percentile(
            F.col("q") * 1.0, F.array(*[F.lit(fr) for fr in fracs])
        ).alias("qa")
    )
    frac_idx = (
        F.when(F.col("scenario") == "price_up", 2)
        .when(F.col("scenario") == "price_dn", 3)
        .when(F.col("scenario") == "cost_up", 4)
        .when(F.col("scenario") == "cost_dn", 5)
        .otherwise(1)
    )
    stock = par.crossJoin(F.broadcast(qarr)).select(
        "scenario",
        "price",
        "cost",
        "df",
        (F.col("df") * F.element_at("qa", frac_idx)).alias("s_opt"),
    )
    profit = (
        stock.crossJoin(dem)
        .groupBy("scenario", "price", "cost", "s_opt")
        .agg(
            F.avg(
                F.col("price") * F.least(F.col("q") * F.col("df"), F.col("s_opt"))
                - F.col("cost") * F.col("s_opt")
            ).alias("exp_profit")
        )
    )
    base = profit.filter(F.col("scenario") == "baseline").select(
        F.col("exp_profit").alias("p0")
    )
    r4 = lambda cexpr: F.round(cexpr + F.lit(5e-10), 4)  # noqa: E731
    return (
        profit.crossJoin(F.broadcast(base))
        .select(
            "scenario",
            r4(F.col("s_opt")).alias("optimal_stock"),
            r4(F.col("exp_profit")).alias("expected_profit"),
            r4(F.col("exp_profit") - F.col("p0")).alias("delta_vs_baseline"),
            F.abs(F.col("exp_profit") - F.col("p0")).alias("imp"),
        )
        .orderBy(F.desc("imp"), "scenario")
        .drop("imp")
    )


# ---------------------------------------------------------------------------
# Q548 — two-class priority queue (Cobham's formula)
# ---------------------------------------------------------------------------
# Purchases (high priority) and clicks (low) with value-proportional
# service: non-preemptive M/G/1 priority waits from measured
# moments — residual work R = sum lambda_i E[S_i^2] / 2, then
# W_hi = R/(1-rho_hi), W_lo = R/((1-rho_hi)(1-rho_hi-rho_lo)) —
# what prioritization buys the fast class and costs the slow one
# (the class-structured counterpart of Erlang-C q457 and the
# Lindley replay q538).
_Q548_ORACLE = """
    WITH base AS MATERIALIZED (
      SELECT event_type,
             CAST(ROUND(value * 100) AS BIGINT) * 500 / 1e6 AS s_sec,
             epoch_us(ts) AS t
      FROM events WHERE event_type IN ('purchase', 'click')
    ), span AS (
      SELECT (MAX(t) - MIN(t)) / 1e6 AS t_sec FROM base
    ), cls AS (
      SELECT event_type, COUNT(*) AS n, AVG(s_sec) AS es,
             AVG(s_sec * s_sec) AS es2
      FROM base GROUP BY event_type
    ), rates AS (
      SELECT c.event_type, c.n / sp.t_sec AS lam, c.es, c.es2,
             c.n / sp.t_sec * c.es AS rho
      FROM cls c, span sp
    ), r AS (
      SELECT SUM(lam * es2) / 2 AS resid FROM rates
    ), hi AS (SELECT rho FROM rates WHERE event_type = 'purchase'
    ), lo AS (SELECT rho FROM rates WHERE event_type = 'click')
    SELECT ROUND((SELECT rho FROM hi) + 5e-12, 6) AS rho_high,
           ROUND((SELECT rho FROM lo) + 5e-12, 6) AS rho_low,
           ROUND(r.resid + 5e-12, 6) AS residual_work_s,
           ROUND(r.resid / (1 - (SELECT rho FROM hi)) + 5e-10, 4)
             AS wait_high_s,
           ROUND(r.resid / ((1 - (SELECT rho FROM hi))
                 * (1 - (SELECT rho FROM hi) - (SELECT rho FROM lo)))
                 + 5e-10, 4) AS wait_low_s,
           ROUND((r.resid / ((1 - (SELECT rho FROM hi))
                 * (1 - (SELECT rho FROM hi) - (SELECT rho FROM lo))))
                 / (r.resid / (1 - (SELECT rho FROM hi))) + 5e-10, 4)
             AS priority_ratio
    FROM r
"""


@register(
    "q548_priority_queue",
    _Q548_ORACLE,
    doc="Cobham's non-preemptive priority formula from measured "
    "moments: purchases (high) vs clicks (low) with value-"
    "proportional service — residual work, per-class waits and the "
    "low/high wait ratio, quantifying what prioritization buys "
    "(Erlang-C q457 and Lindley q538's class-structured sibling).",
)
def q548(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    base = ev.select(
        "event_type",
        (F.round(F.col("value") * 100).cast("bigint") * 500 / 1e6).alias("s_sec"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
    ).localCheckpoint(eager=False)
    span = base.agg(((F.max("t") - F.min("t")) / 1e6).alias("t_sec"))
    cls = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("s_sec").alias("es"),
        F.avg(F.col("s_sec") * F.col("s_sec")).alias("es2"),
    )
    rates = cls.crossJoin(F.broadcast(span)).select(
        "event_type",
        (F.col("n") / F.col("t_sec")).alias("lam"),
        "es",
        "es2",
        (F.col("n") / F.col("t_sec") * F.col("es")).alias("rho"),
    ).localCheckpoint(eager=False)
    r = rates.agg((F.sum(F.col("lam") * F.col("es2")) / 2).alias("resid"))
    hi = rates.filter(F.col("event_type") == "purchase").select(
        F.col("rho").alias("rho_hi")
    )
    lo = rates.filter(F.col("event_type") == "click").select(
        F.col("rho").alias("rho_lo")
    )
    w_hi = F.col("resid") / (1 - F.col("rho_hi"))
    w_lo = F.col("resid") / (
        (1 - F.col("rho_hi")) * (1 - F.col("rho_hi") - F.col("rho_lo"))
    )
    r4 = lambda cexpr: F.round(cexpr + F.lit(5e-10), 4)  # noqa: E731
    return (
        r.crossJoin(F.broadcast(hi))
        .crossJoin(F.broadcast(lo))
        .select(
            r6(F.col("rho_hi")).alias("rho_high"),
            r6(F.col("rho_lo")).alias("rho_low"),
            r6(F.col("resid")).alias("residual_work_s"),
            r4(w_hi).alias("wait_high_s"),
            r4(w_lo).alias("wait_low_s"),
            r4(w_lo / w_hi).alias("priority_ratio"),
        )
    )
