"""Conformance queries batch #64 (q514+) — Poisson GLM by IRLS,
canary rollout gates, SIR epidemic dynamics, monopoly pricing, and
HyperLogLog set algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q514 — Poisson regression by three unrolled IRLS rounds
# ---------------------------------------------------------------------------
# Order count per customer on log-balance: each IRLS round computes
# the mu = exp(eta) weights and working response z = eta + (y-mu)/mu
# as row expressions, then solves the weighted 2x2 normal equations
# in closed form — the GLM companion to the Gaussian EM (q490),
# with the Poisson deviance as the fit statistic.
_Q514_ORACLE = """
    WITH u AS MATERIALIZED (
      SELECT COUNT(o.o_orderkey) * 1.0 AS y,
             LN(c.c_acctbal + 10000.0) AS x
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_acctbal
    ), p0 AS (
      SELECT LN(AVG(y)) AS b0, CAST(0.0 AS DOUBLE) AS b1 FROM u
    ), i1 AS MATERIALIZED (
      SELECT SUM(mu) AS sw, SUM(mu * x) AS swx, SUM(mu * x * x) AS swxx,
             SUM(mu * z) AS swz, SUM(mu * x * z) AS swxz
      FROM (
        SELECT x, EXP(b0 + b1 * x) AS mu,
               (b0 + b1 * x) + (y - EXP(b0 + b1 * x)) / EXP(b0 + b1 * x) AS z
        FROM u, p0)
    ), p1 AS (
      SELECT (swz * swxx - swxz * swx) / (sw * swxx - swx * swx) AS b0,
             (sw * swxz - swx * swz) / (sw * swxx - swx * swx) AS b1
      FROM i1
    ), i2 AS MATERIALIZED (
      SELECT SUM(mu) AS sw, SUM(mu * x) AS swx, SUM(mu * x * x) AS swxx,
             SUM(mu * z) AS swz, SUM(mu * x * z) AS swxz
      FROM (
        SELECT x, EXP(b0 + b1 * x) AS mu,
               (b0 + b1 * x) + (y - EXP(b0 + b1 * x)) / EXP(b0 + b1 * x) AS z
        FROM u, p1)
    ), p2 AS (
      SELECT (swz * swxx - swxz * swx) / (sw * swxx - swx * swx) AS b0,
             (sw * swxz - swx * swz) / (sw * swxx - swx * swx) AS b1
      FROM i2
    ), i3 AS MATERIALIZED (
      SELECT SUM(mu) AS sw, SUM(mu * x) AS swx, SUM(mu * x * x) AS swxx,
             SUM(mu * z) AS swz, SUM(mu * x * z) AS swxz
      FROM (
        SELECT x, EXP(b0 + b1 * x) AS mu,
               (b0 + b1 * x) + (y - EXP(b0 + b1 * x)) / EXP(b0 + b1 * x) AS z
        FROM u, p2)
    ), p3 AS (
      SELECT (swz * swxx - swxz * swx) / (sw * swxx - swx * swx) AS b0,
             (sw * swxz - swx * swz) / (sw * swxx - swx * swx) AS b1
      FROM i3
    ), dev AS (
      SELECT SUM(2 * (CASE WHEN y > 0 THEN y * LN(y / EXP(b0 + b1 * x))
                           ELSE 0 END
                      - (y - EXP(b0 + b1 * x)))) AS deviance,
             COUNT(*) AS n
      FROM u, p3
    )
    SELECT CAST(dev.n AS BIGINT) AS n_customers,
           ROUND(p3.b0 + 5e-12, 6) AS intercept,
           ROUND(p3.b1 + 5e-12, 6) AS beta_log_balance,
           ROUND(dev.deviance + 5e-10, 4) AS deviance
    FROM p3, dev
"""


@register(
    "q514_poisson_glm",
    _Q514_ORACLE,
    doc="Poisson GLM (order count on log-balance) by three unrolled "
    "IRLS rounds: exp-link weights and working response as row "
    "expressions, weighted 2x2 normal equations in closed form, "
    "Poisson deviance out — the count-data GLM beside Gaussian EM "
    "(q490) and OLS by Cramer (q499).",
)
def q514(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    u = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg((F.count("o_orderkey") * 1.0).alias("y"))
        .select("y", F.log(F.col("c_acctbal") + 10000.0).alias("x"))
        .localCheckpoint(eager=False)
    )
    params = u.agg(F.log(F.avg("y")).alias("b0")).select(
        "b0", F.lit(0.0).alias("b1")
    )
    for _ in range(3):
        eta = F.col("b0") + F.col("b1") * F.col("x")
        mu = F.exp(eta)
        z = eta + (F.col("y") - mu) / mu
        i = (
            u.crossJoin(F.broadcast(params))
            .select("x", mu.alias("mu"), z.alias("z"))
            .agg(
                F.sum("mu").alias("sw"),
                F.sum(F.col("mu") * F.col("x")).alias("swx"),
                F.sum(F.col("mu") * F.col("x") * F.col("x")).alias("swxx"),
                F.sum(F.col("mu") * F.col("z")).alias("swz"),
                F.sum(F.col("mu") * F.col("x") * F.col("z")).alias("swxz"),
            )
        )
        det = F.col("sw") * F.col("swxx") - F.col("swx") * F.col("swx")
        params = i.select(
            ((F.col("swz") * F.col("swxx") - F.col("swxz") * F.col("swx")) / det).alias(
                "b0"
            ),
            ((F.col("sw") * F.col("swxz") - F.col("swx") * F.col("swz")) / det).alias(
                "b1"
            ),
        )
    eta = F.col("b0") + F.col("b1") * F.col("x")
    mu = F.exp(eta)
    dev = u.crossJoin(F.broadcast(params)).agg(
        F.sum(
            2
            * (
                F.when(F.col("y") > 0, F.col("y") * F.log(F.col("y") / mu)).otherwise(
                    0.0
                )
                - (F.col("y") - mu)
            )
        ).alias("deviance"),
        F.count(F.lit(1)).alias("n"),
        F.first("b0").alias("b0"),
        F.first("b1").alias("b1"),
    )
    return dev.select(
        F.col("n").cast("bigint").alias("n_customers"),
        r6(F.col("b0")).alias("intercept"),
        r6(F.col("b1")).alias("beta_log_balance"),
        F.round(F.col("deviance") + F.lit(5e-10), 4).alias("deviance"),
    )


# ---------------------------------------------------------------------------
# Q515 — canary rollout gate replay
# ---------------------------------------------------------------------------
# Release stages expose 1% / 5% / 25% / 100% of users (multiplicative
# hash buckets, cumulative); each stage's error-event rate gets a
# Wilson upper bound and the gate passes while the bound stays under
# 22% — "promoted" is the cumulative AND down the ladder, exactly
# how a progressive-delivery controller decides (Wilson q233 put to
# work, SRM q437 is the sibling integrity check).
_Q515_ORACLE = """
    WITH asg AS (
      SELECT DISTINCT user_id,
             (user_id * 2654435761) % 4294967296 % 100 AS bucket
      FROM events
    ), stages AS (
      SELECT * FROM (VALUES (1, 1), (2, 5), (3, 25), (4, 100)) s(stage, pct)
    ), err AS (
      SELECT s.stage, s.pct,
             COUNT(*) AS n_events,
             COUNT(DISTINCT e.user_id) AS n_users,
             SUM(CASE WHEN e.event_type = 'error' THEN 1 ELSE 0 END)
               AS n_err
      FROM events e
      JOIN asg a ON a.user_id = e.user_id
      JOIN stages s ON a.bucket < s.pct
      WHERE EXTRACT(day FROM e.ts) <= 7
      GROUP BY s.stage, s.pct
    ), wil AS (
      SELECT stage, pct, n_users, n_events, n_err,
             n_err * 1.0 / n_events AS rate,
             (n_err * 1.0 / n_events + 1.96 * 1.96 / (2 * n_events)
              + 1.96 * SQRT((n_err * 1.0 / n_events)
                            * (1 - n_err * 1.0 / n_events) / n_events
                            + 1.96 * 1.96 / (4.0 * n_events * n_events)))
             / (1 + 1.96 * 1.96 / n_events) AS upper
      FROM err
    ), gated AS (
      SELECT *,
             CASE WHEN upper < 0.22 THEN 1 ELSE 0 END AS gate_pass,
             MIN(CASE WHEN upper < 0.22 THEN 1 ELSE 0 END)
               OVER (ORDER BY stage) AS promoted
      FROM wil
    )
    SELECT CAST(stage AS BIGINT) AS stage,
           CAST(pct AS BIGINT) AS exposure_pct,
           CAST(n_users AS BIGINT) AS n_users,
           ROUND(rate + 5e-12, 6) AS error_rate,
           ROUND(upper + 5e-12, 6) AS wilson_upper,
           gate_pass = 1 AS gate_pass,
           promoted = 1 AS promoted
    FROM gated ORDER BY stage
"""


@register(
    "q515_canary_rollout",
    _Q515_ORACLE,
    doc="Progressive-delivery canary replay: hash-bucket exposure "
    "ladder 1/5/25/100%, per-stage error rate with Wilson upper "
    "bound, gate at 22% and cumulative promotion down the ladder — "
    "the rollout controller's decision table (Wilson q233 applied, "
    "SRM q437 the integrity sibling).",
)
def q515(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.dayofmonth("ts") <= 7)
    asg = ev.select("user_id").distinct().select(
        "user_id",
        ((F.col("user_id") * 2654435761) % 4294967296 % 100).alias("bucket"),
    )
    stages = spark.createDataFrame(
        [(1, 1), (2, 5), (3, 25), (4, 100)], "stage int, pct int"
    )
    err = (
        ev.join(asg, "user_id")
        .join(F.broadcast(stages), F.col("bucket") < F.col("pct"))
        .groupBy("stage", "pct")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
                "n_err"
            ),
        )
    )
    rate = F.col("n_err") * 1.0 / F.col("n_events")
    z2 = 1.96 * 1.96
    upper = (
        rate
        + z2 / (2 * F.col("n_events"))
        + 1.96
        * F.sqrt(
            rate * (1 - rate) / F.col("n_events")
            + z2 / (4.0 * F.col("n_events") * F.col("n_events"))
        )
    ) / (1 + z2 / F.col("n_events"))
    wil = err.select(
        "stage", "pct", "n_users", rate.alias("rate"), upper.alias("upper")
    )
    from pyspark.sql import Window

    gated = wil.select(
        "*",
        F.when(F.col("upper") < 0.22, 1).otherwise(0).alias("gate_pass"),
        F.min(F.when(F.col("upper") < 0.22, 1).otherwise(0))
        .over(Window.orderBy("stage"))
        .alias("promoted"),
    )
    return gated.select(
        F.col("stage").cast("bigint").alias("stage"),
        F.col("pct").cast("bigint").alias("exposure_pct"),
        F.col("n_users").cast("bigint").alias("n_users"),
        r6(F.col("rate")).alias("error_rate"),
        r6(F.col("upper")).alias("wilson_upper"),
        (F.col("gate_pass") == 1).alias("gate_pass"),
        (F.col("promoted") == 1).alias("promoted"),
    ).orderBy("stage")


# ---------------------------------------------------------------------------
# Q516 — SIR epidemic dynamics and the final-size equation
# ---------------------------------------------------------------------------
# Discrete SIR at beta 0.4 / gamma 0.2 seeded with the measured
# day-1 purchaser share: fifty difference-equation steps in one fold
# tracking peak prevalence and its day, then the implicit final-size
# equation R_inf = 1 - exp(-R0 R_inf) solved by a second fixed-point
# fold — simulated mass vs the theoretical attractor, closing the
# loop with the spectral threshold (q503) and branching extinction
# (q489).
_Q516_ORACLE = """
    WITH seed AS (
      SELECT COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                  AND EXTRACT(day FROM ts) = 1
                                 THEN user_id END) * 1.0
               / COUNT(DISTINCT user_id) AS i0
      FROM events
    ), sim AS (
      SELECT i0,
        list_reduce(
          list_prepend([1.0 - i0, i0, CAST(0.0 AS DOUBLE), i0, 0.0],
            list_transform(generate_series(1, 50),
                           z -> [CAST(z AS DOUBLE)])),
          (st, z) -> [
            st[1] - 0.4 * st[1] * st[2],
            st[2] + 0.4 * st[1] * st[2] - 0.2 * st[2],
            st[3] + 0.2 * st[2],
            CASE WHEN st[2] + 0.4 * st[1] * st[2] - 0.2 * st[2] > st[4]
                 THEN st[2] + 0.4 * st[1] * st[2] - 0.2 * st[2]
                 ELSE st[4] END,
            CASE WHEN st[2] + 0.4 * st[1] * st[2] - 0.2 * st[2] > st[4]
                 THEN z[1] ELSE st[5] END
          ]
        ) AS st
      FROM seed
    ), theory AS (
      SELECT list_reduce(
               list_prepend([CAST(0.5 AS DOUBLE)],
                 list_transform(generate_series(1, 40),
                                z -> [CAST(z AS DOUBLE)])),
               (r, z) -> [1 - EXP(-2.0 * r[1])]
             )[1] AS r_inf
    )
    SELECT ROUND(sim.i0 + 5e-12, 6) AS i0,
           CAST(2.0 AS DOUBLE) AS r0,
           ROUND(sim.st[4] + 5e-12, 6) AS peak_prevalence,
           CAST(sim.st[5] AS BIGINT) AS peak_day,
           ROUND(sim.st[3] + sim.st[2] + 5e-12, 6) AS final_attack_sim,
           ROUND(theory.r_inf + 5e-12, 6) AS final_size_theory,
           ROUND(ABS(sim.st[3] + sim.st[2] - theory.r_inf) + 5e-12, 6)
             AS gap
    FROM sim, theory
"""


@register(
    "q516_sir_dynamics",
    _Q516_ORACLE,
    doc="Discrete SIR (beta 0.4, gamma 0.2, R0 = 2) seeded with the "
    "measured day-1 purchaser share: 50 difference-equation steps "
    "in one fold tracking peak prevalence and day, vs the implicit "
    "final-size equation solved by a fixed-point fold — epidemic "
    "dynamics closing the loop with the spectral threshold (q503) "
    "and extinction probability (q489).",
)
def q516(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    seed = ev.agg(
        (
            F.count_distinct(
                F.when(
                    (F.col("event_type") == "purchase") & (F.dayofmonth("ts") == 1),
                    F.col("user_id"),
                )
            )
            * 1.0
            / F.count_distinct("user_id")
        ).alias("i0")
    )

    def step(st, z):
        s = F.element_at(st, 1)
        i = F.element_at(st, 2)
        r = F.element_at(st, 3)
        newi = i + 0.4 * s * i - 0.2 * i
        return F.array(
            s - 0.4 * s * i,
            newi,
            r + 0.2 * i,
            F.when(newi > F.element_at(st, 4), newi).otherwise(
                F.element_at(st, 4)
            ),
            F.when(newi > F.element_at(st, 4), z).otherwise(F.element_at(st, 5)),
        )

    sim = seed.select(
        "i0",
        F.aggregate(
            F.transform(
                F.sequence(F.lit(1), F.lit(50)), lambda z: z.cast("double")
            ),
            F.array(
                1.0 - F.col("i0"), F.col("i0"), F.lit(0.0), F.col("i0"), F.lit(0.0)
            ),
            step,
        ).alias("st"),
    )
    theory = F.element_at(
        F.aggregate(
            F.transform(F.sequence(F.lit(1), F.lit(40)), lambda z: z.cast("double")),
            F.array(F.lit(0.5)),
            lambda r, z: F.array(1 - F.exp(-2.0 * F.element_at(r, 1))),
        ),
        1,
    )
    final_sim = F.element_at("st", 3) + F.element_at("st", 2)
    return sim.select(
        r6(F.col("i0")).alias("i0"),
        F.lit(2.0).alias("r0"),
        r6(F.element_at("st", 4)).alias("peak_prevalence"),
        F.element_at("st", 5).cast("bigint").alias("peak_day"),
        r6(final_sim).alias("final_attack_sim"),
        r6(theory).alias("final_size_theory"),
        r6(F.abs(final_sim - theory)).alias("gap"),
    )


# ---------------------------------------------------------------------------
# Q517 — monopoly pricing on the empirical demand curve
# ---------------------------------------------------------------------------
# Order prices as willingness-to-pay: demand D(p) = buyers at price
# >= p, revenue p * D(p) over the decile grid, the revenue-maximizing
# price flagged, and the centered-difference elasticity at each grid
# point — the optimum sits where elasticity crosses -1, the
# textbook FOC as an in-query audit (elasticity-by-regression q389's
# optimization counterpart).
_Q517_ORACLE = """
    WITH x AS MATERIALIZED (
      SELECT o_totalprice AS p FROM orders
    ), qarr AS (
      SELECT quantile_cont(p, list_transform(generate_series(1, 9),
                                             i -> i / 10.0)) AS qa
      FROM x
    ), grid AS (
      SELECT g.i, qarr.qa[g.i] AS price
      FROM generate_series(1, 9) g(i), qarr
    ), dem AS (
      SELECT grid.i, grid.price,
             (SELECT COUNT(*) FROM x WHERE x.p >= grid.price) AS d
      FROM grid
    ), el AS (
      SELECT i, price, d, price * d AS revenue,
             (LN(LEAD(d) OVER (ORDER BY i) * 1.0)
              - LN(LAG(d) OVER (ORDER BY i) * 1.0))
             / (LN(LEAD(price) OVER (ORDER BY i))
                - LN(LAG(price) OVER (ORDER BY i))) AS elasticity
      FROM dem
    )
    SELECT CAST(i AS BIGINT) AS decile,
           ROUND(price + 5e-8, 2) AS price_usd,
           CAST(d AS BIGINT) AS demand,
           ROUND(revenue / 1e6 + 5e-10, 4) AS revenue_musd,
           ROUND(elasticity + 5e-12, 6) AS elasticity,
           revenue = (SELECT MAX(revenue) FROM el) AS is_optimal
    FROM el ORDER BY decile
"""


@register(
    "q517_monopoly_price",
    _Q517_ORACLE,
    doc="Monopoly pricing on the empirical willingness-to-pay curve: "
    "demand D(p), revenue p*D(p) over the decile grid with the "
    "optimum flagged, and centered log-log elasticity per point — "
    "the revenue peak sits where elasticity crosses -1, the "
    "textbook FOC as an audit (q389's optimization counterpart).",
)
def q517(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    x = o.select(F.col("o_totalprice").alias("p")).localCheckpoint(eager=False)
    qarr = x.agg(
        F.percentile(
            "p", F.array(*[F.lit(i / 10.0) for i in range(1, 10)])
        ).alias("qa")
    )
    grid = (
        spark.range(1, 10)
        .select(F.col("id").cast("int").alias("i"))
        .crossJoin(F.broadcast(qarr))
        .select("i", F.element_at("qa", F.col("i")).alias("price"))
    )
    dem = (
        grid.crossJoin(x)
        .groupBy("i", "price")
        .agg(F.sum(F.when(F.col("p") >= F.col("price"), 1).otherwise(0)).alias("d"))
    )
    from pyspark.sql import Window

    w = Window.orderBy("i")
    el = dem.select(
        "i",
        "price",
        "d",
        (F.col("price") * F.col("d")).alias("revenue"),
        (
            (F.log(F.lead("d").over(w) * 1.0) - F.log(F.lag("d").over(w) * 1.0))
            / (F.log(F.lead("price").over(w)) - F.log(F.lag("price").over(w)))
        ).alias("elasticity"),
    )
    best = el.agg(F.max("revenue").alias("br"))
    return (
        el.crossJoin(F.broadcast(best))
        .select(
            F.col("i").cast("bigint").alias("decile"),
            F.round(F.col("price") + F.lit(5e-8), 2).alias("price_usd"),
            F.col("d").cast("bigint").alias("demand"),
            F.round(F.col("revenue") / 1e6 + F.lit(5e-10), 4).alias(
                "revenue_musd"
            ),
            r6(F.col("elasticity")).alias("elasticity"),
            (F.col("revenue") == F.col("br")).alias("is_optimal"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# Q518 — HyperLogLog set algebra (union by register max)
# ---------------------------------------------------------------------------
# Two customer sets (first-half vs second-half-year buyers) as
# 64-register HLLs (q454's construction): the union sketch is the
# element-wise register MAX — the mergeability that makes sketches
# distributed — and the intersection comes by inclusion-exclusion,
# both audited against exact distinct counts.
_Q518_ORACLE = """
    WITH a AS (
      SELECT DISTINCT o_custkey AS k FROM orders
      WHERE EXTRACT(month FROM o_orderdate) <= 6
    ), b AS (
      SELECT DISTINCT o_custkey AS k FROM orders
      WHERE EXTRACT(month FROM o_orderdate) > 6
    ), ra AS (
      SELECT hv % 64 AS r,
             MAX(CASE WHEN hv // 64 = 0 THEN 27
                 ELSE 27 - length(bin(hv // 64)) END) AS rho
      FROM (SELECT (k * 2654435761) % 4294967296 AS hv FROM a)
      GROUP BY hv % 64
    ), rb AS (
      SELECT hv % 64 AS r,
             MAX(CASE WHEN hv // 64 = 0 THEN 27
                 ELSE 27 - length(bin(hv // 64)) END) AS rho
      FROM (SELECT (k * 2654435761) % 4294967296 AS hv FROM b)
      GROUP BY hv % 64
    ), ru AS (
      SELECT COALESCE(ra.r, rb.r) AS r,
             GREATEST(COALESCE(ra.rho, 0), COALESCE(rb.rho, 0)) AS rho
      FROM ra FULL JOIN rb ON rb.r = ra.r
    ), est AS (
      SELECT 'a' AS s, COUNT(*) AS v, SUM(POW(2.0, -rho)) AS sm FROM ra
      UNION ALL SELECT 'b', COUNT(*), SUM(POW(2.0, -rho)) FROM rb
      UNION ALL SELECT 'u', COUNT(*), SUM(POW(2.0, -rho)) FROM ru
    ), hll AS (
      SELECT s,
             CASE WHEN 0.709 * 64 * 64 / (sm + (64 - v)) <= 2.5 * 64
                   AND v < 64
                  THEN 64 * LN(64.0 / (64 - v))
                  ELSE 0.709 * 64 * 64 / (sm + (64 - v)) END AS e
      FROM est
    ), ex AS (
      SELECT (SELECT COUNT(*) FROM a) AS na,
             (SELECT COUNT(*) FROM b) AS nb,
             (SELECT COUNT(*) FROM a JOIN b ON b.k = a.k) AS ni
    )
    SELECT CAST(ex.na AS BIGINT) AS exact_a,
           CAST(ex.nb AS BIGINT) AS exact_b,
           CAST(ex.ni AS BIGINT) AS exact_intersection,
           CAST(ROUND((SELECT e FROM hll WHERE s = 'a')) AS BIGINT) AS hll_a,
           CAST(ROUND((SELECT e FROM hll WHERE s = 'b')) AS BIGINT) AS hll_b,
           CAST(ROUND((SELECT e FROM hll WHERE s = 'u')) AS BIGINT)
             AS hll_union,
           CAST(ROUND((SELECT e FROM hll WHERE s = 'a')
                      + (SELECT e FROM hll WHERE s = 'b')
                      - (SELECT e FROM hll WHERE s = 'u')) AS BIGINT)
             AS hll_intersection,
           ROUND(ABS((SELECT e FROM hll WHERE s = 'a')
                     + (SELECT e FROM hll WHERE s = 'b')
                     - (SELECT e FROM hll WHERE s = 'u') - ex.ni)
                 / NULLIF(ex.ni, 0) + 5e-12, 6) AS intersection_rel_err
    FROM ex
"""


@register(
    "q518_hll_set_algebra",
    _Q518_ORACLE,
    doc="HyperLogLog set algebra: first-half vs second-half-year "
    "buyer sketches (64 registers, q454's construction), union by "
    "element-wise register max — the mergeability property — and "
    "intersection by inclusion-exclusion, audited against exact "
    "counts with the relative error the I-E subtraction amplifies.",
)
def q518(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")

    def regs(df):
        h = df.select(
            ((F.col("k") * 2654435761) % 4294967296).alias("hv")
        )
        w = F.floor(F.col("hv") / 64).cast("bigint")
        return h.groupBy((F.col("hv") % 64).alias("r")).agg(
            F.max(
                F.when(w == 0, 27).otherwise(27 - F.length(F.bin(w)))
            ).alias("rho")
        )

    a = o.filter(F.month("o_orderdate") <= 6).select(
        F.col("o_custkey").alias("k")
    ).distinct().localCheckpoint(eager=False)
    b = o.filter(F.month("o_orderdate") > 6).select(
        F.col("o_custkey").alias("k")
    ).distinct().localCheckpoint(eager=False)
    ra = regs(a)
    rb = regs(b)
    ru = (
        ra.select(F.col("r"), F.col("rho").alias("rho_a"))
        .join(rb.select(F.col("r"), F.col("rho").alias("rho_b")), "r", "full")
        .select(
            "r",
            F.greatest(
                F.coalesce("rho_a", F.lit(0)), F.coalesce("rho_b", F.lit(0))
            ).alias("rho"),
        )
    )

    def est(df, name):
        return df.agg(
            F.lit(name).alias("s"),
            F.count(F.lit(1)).alias("v"),
            F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("sm"),
        )

    es = est(ra, "a").unionAll(est(rb, "b")).unionAll(est(ru, "u"))
    raw = 0.709 * 64 * 64 / (F.col("sm") + (64 - F.col("v")))
    e = F.when(
        (raw <= 2.5 * 64) & (F.col("v") < 64),
        64 * F.log(64.0 / (64 - F.col("v"))),
    ).otherwise(raw)
    hll = es.select("s", e.alias("e"))
    ha = hll.filter(F.col("s") == "a").select(F.col("e").alias("ea"))
    hb = hll.filter(F.col("s") == "b").select(F.col("e").alias("eb"))
    hu = hll.filter(F.col("s") == "u").select(F.col("e").alias("eu"))
    ex = (
        a.agg(F.count(F.lit(1)).alias("na"))
        .crossJoin(b.agg(F.count(F.lit(1)).alias("nb")))
        .crossJoin(
            a.join(b, "k").agg(F.count(F.lit(1)).alias("ni"))
        )
    )
    inter = F.col("ea") + F.col("eb") - F.col("eu")
    return (
        ex.crossJoin(F.broadcast(ha))
        .crossJoin(F.broadcast(hb))
        .crossJoin(F.broadcast(hu))
        .select(
            F.col("na").cast("bigint").alias("exact_a"),
            F.col("nb").cast("bigint").alias("exact_b"),
            F.col("ni").cast("bigint").alias("exact_intersection"),
            F.round("ea").cast("bigint").alias("hll_a"),
            F.round("eb").cast("bigint").alias("hll_b"),
            F.round("eu").cast("bigint").alias("hll_union"),
            F.round(inter).cast("bigint").alias("hll_intersection"),
            r6(
                F.abs(inter - F.col("ni"))
                / F.nullif(F.col("ni").cast("double"), F.lit(0.0))
            ).alias("intersection_rel_err"),
        )
    )
