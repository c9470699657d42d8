"""Conformance queries batch #66 (q524+) — shift-share growth
decomposition, error-diffusion integer allocation, rarefaction
curves, rebalancing policy replay, and retry-backoff coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q524 — shift-share decomposition of regional growth
# ---------------------------------------------------------------------------
# Nation-level H1->H2 revenue growth split into the national tide,
# the segment-mix effect, and the local competitive effect —
# sum_s e_ns*g + sum_s e_ns*(g_s - g) + sum_s e_ns*(g_ns - g_s) —
# with the exact reconstruction gap per nation as the audit (the
# regional-economics decomposition beside growth accounting q192 and
# price-volume-mix q330).
_Q524_ORACLE = """
    WITH cell AS MATERIALIZED (
      SELECT c.c_nationkey AS nat, c.c_mktsegment AS seg,
             SUM(CASE WHEN EXTRACT(month FROM o.o_orderdate) <= 6
                      THEN ROUND(o.o_totalprice * 100) ELSE 0 END) AS h1,
             SUM(CASE WHEN EXTRACT(month FROM o.o_orderdate) > 6
                      THEN ROUND(o.o_totalprice * 100) ELSE 0 END) AS h2
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ), segr AS MATERIALIZED (
      SELECT seg, SUM(h2) * 1.0 / SUM(h1) - 1 AS g_s FROM cell GROUP BY seg
    ), natr AS (
      SELECT SUM(h2) * 1.0 / SUM(h1) - 1 AS g FROM cell
    ), dec AS (
      SELECT cl.nat,
             SUM(cl.h2 - cl.h1) AS actual,
             SUM(cl.h1 * nr.g) AS national_eff,
             SUM(cl.h1 * (sr.g_s - nr.g)) AS mix_eff,
             SUM(cl.h1 * ((cl.h2 * 1.0 / NULLIF(cl.h1, 0) - 1) - sr.g_s))
               AS competitive_eff
      FROM cell cl JOIN segr sr ON sr.seg = cl.seg CROSS JOIN natr nr
      WHERE cl.h1 > 0
      GROUP BY cl.nat
    )
    SELECT CAST(nat AS BIGINT) AS nation,
           ROUND(actual / 100.0 + 5e-8, 2) AS actual_growth_usd,
           ROUND(national_eff / 100.0 + 5e-8, 2) AS national_usd,
           ROUND(mix_eff / 100.0 + 5e-8, 2) AS mix_usd,
           ROUND(competitive_eff / 100.0 + 5e-8, 2) AS competitive_usd,
           ROUND(ABS(actual - national_eff - mix_eff - competitive_eff)
                 / 100.0 + 5e-8, 2) AS identity_gap_usd
    FROM dec ORDER BY actual_growth_usd DESC, nation LIMIT 10
"""


@register(
    "q524_shift_share",
    _Q524_ORACLE,
    doc="Shift-share decomposition of nation revenue growth: national "
    "tide + segment-mix + competitive effects from H1 bases and "
    "H1->H2 growth rates, exact reconstruction gap per nation — the "
    "regional-economics split beside growth accounting (q192) and "
    "price-volume-mix (q330).",
)
def q524(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_mktsegment")
    cents = F.round(F.col("o_totalprice") * 100)
    cell = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nat"), F.col("c_mktsegment").alias("seg")
        )
        .agg(
            F.sum(
                F.when(F.month("o_orderdate") <= 6, cents).otherwise(0)
            ).alias("h1"),
            F.sum(
                F.when(F.month("o_orderdate") > 6, cents).otherwise(0)
            ).alias("h2"),
        )
        .localCheckpoint(eager=False)
    )
    segr = cell.groupBy("seg").agg(
        (F.sum("h2") * 1.0 / F.sum("h1") - 1).alias("g_s")
    )
    natr = cell.agg((F.sum("h2") * 1.0 / F.sum("h1") - 1).alias("g"))
    dec = (
        cell.filter(F.col("h1") > 0)
        .join(F.broadcast(segr), "seg")
        .crossJoin(F.broadcast(natr))
        .groupBy("nat")
        .agg(
            F.sum(F.col("h2") - F.col("h1")).alias("actual"),
            F.sum(F.col("h1") * F.col("g")).alias("national_eff"),
            F.sum(F.col("h1") * (F.col("g_s") - F.col("g"))).alias("mix_eff"),
            F.sum(
                F.col("h1")
                * (
                    (F.col("h2") * 1.0 / F.nullif(F.col("h1"), F.lit(0)) - 1)
                    - F.col("g_s")
                )
            ).alias("competitive_eff"),
        )
    )
    r2 = lambda cexpr: F.round(cexpr + F.lit(5e-8), 2)  # noqa: E731
    return (
        dec.select(
            F.col("nat").cast("bigint").alias("nation"),
            r2(F.col("actual") / 100.0).alias("actual_growth_usd"),
            r2(F.col("national_eff") / 100.0).alias("national_usd"),
            r2(F.col("mix_eff") / 100.0).alias("mix_usd"),
            r2(F.col("competitive_eff") / 100.0).alias("competitive_usd"),
            r2(
                F.abs(
                    F.col("actual")
                    - F.col("national_eff")
                    - F.col("mix_eff")
                    - F.col("competitive_eff")
                )
                / 100.0
            ).alias("identity_gap_usd"),
        )
        .orderBy(F.desc("actual_growth_usd"), "nation")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q525 — error-diffusion integer allocation
# ---------------------------------------------------------------------------
# Distribute exactly 1000 integer tokens over 28 days proportionally
# to revenue: Floyd-Steinberg-style 1-D error diffusion (carry the
# fractional residual into the next day) keeps every carry in
# (-0.5, 0.5] and lands the exact total, where independent rounding
# drifts — the temporal twin of largest-remainder apportionment
# (q266), with the drift bound as the certificate.
_Q525_ORACLE = """
    WITH daily AS (
      SELECT CAST(EXTRACT(day FROM ts) AS BIGINT) AS d,
             CAST(SUM(ROUND(value * 100)) AS DOUBLE) AS v
      FROM events WHERE event_type = 'purchase' AND EXTRACT(day FROM ts) <= 28
      GROUP BY 1
    ), tot AS (SELECT SUM(v) AS tv FROM daily
    ), quota AS (
      SELECT d, v * 1000.0 / tv AS q
      FROM daily, tot
    ), ser AS (
      SELECT list([q] ORDER BY d) AS qs FROM quota
    ), sim AS (
      SELECT
        list_reduce(
          list_prepend([CAST(0.0 AS DOUBLE), 0.0, 0.0], qs),
          (st, x) -> [
            x[1] + st[1] - FLOOR(x[1] + st[1] + 0.5),
            st[2] + FLOOR(x[1] + st[1] + 0.5),
            GREATEST(st[3], ABS(x[1] + st[1] - FLOOR(x[1] + st[1] + 0.5)))
          ]
        ) AS st
      FROM ser
    ), naive AS (
      SELECT SUM(FLOOR(q + 0.5)) AS n_total FROM quota
    )
    SELECT CAST(sim.st[2] AS BIGINT) AS diffused_total,
           CAST(naive.n_total AS BIGINT) AS naive_rounded_total,
           ROUND(sim.st[1] + 5e-12, 6) AS final_carry,
           ROUND(sim.st[3] + 5e-12, 6) AS max_abs_carry,
           sim.st[3] <= 0.5 + 1e-9 AS carry_bounded
    FROM sim, naive
"""


@register(
    "q525_error_diffusion",
    _Q525_ORACLE,
    doc="Error-diffusion integer allocation: 1000 tokens over 28 days "
    "proportional to revenue, carrying the fractional residual "
    "forward — the diffused total is exact and every carry stays in "
    "(-0.5, 0.5] (certificate column) while independent rounding "
    "drifts; the temporal twin of apportionment (q266).",
)
def q525(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.dayofmonth("ts") <= 28)
    )
    daily = ev.groupBy(F.dayofmonth("ts").cast("bigint").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100)).cast("double").alias("v")
    )
    quota = daily.crossJoin(
        F.broadcast(daily.agg(F.sum("v").alias("tv")))
    ).select("d", (F.col("v") * 1000.0 / F.col("tv")).alias("q"))
    ser = quota.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("d", "q"))), lambda s: s.q
        ).alias("qs")
    )

    def step(st, x):
        carry = F.element_at(st, 1)
        val = x + carry
        alloc = F.floor(val + 0.5)
        return F.array(
            val - alloc,
            F.element_at(st, 2) + alloc,
            F.greatest(F.element_at(st, 3), F.abs(val - alloc)),
        )

    sim = ser.select(
        F.aggregate(
            F.col("qs"), F.array(F.lit(0.0), F.lit(0.0), F.lit(0.0)), step
        ).alias("st")
    )
    naive = quota.agg(F.sum(F.floor(F.col("q") + 0.5)).alias("n_total"))
    return sim.crossJoin(F.broadcast(naive)).select(
        F.element_at("st", 2).cast("bigint").alias("diffused_total"),
        F.col("n_total").cast("bigint").alias("naive_rounded_total"),
        r6(F.element_at("st", 1)).alias("final_carry"),
        r6(F.element_at("st", 3)).alias("max_abs_carry"),
        (F.element_at("st", 3) <= 0.5 + 1e-9).alias("carry_bounded"),
    )


# ---------------------------------------------------------------------------
# Q526 — rarefaction: exact expected species accumulation
# ---------------------------------------------------------------------------
# Expected distinct sources in a uniform n-document subsample,
# exactly: E[S_n] = sum_src (1 - C(N - N_src, n) / C(N, n)) from
# log-factorial prefix sums, at n = N/4, N/2, 3N/4 — against the
# observed accumulation under the doc-id scan order.  The exact
# finite-sample version of the Heaps/Chao richness family
# (q225/q213) and the coupon collector (q495).
_Q526_ORACLE = """
    WITH src AS MATERIALIZED (
      SELECT source, COUNT(*) AS ns FROM documents GROUP BY source
    ), tot AS (
      SELECT CAST(SUM(ns) AS BIGINT) AS n FROM src
    ), lf AS MATERIALIZED (
      SELECT g.k, SUM(LN(g.k)) OVER (ORDER BY g.k) AS lfact
      FROM (SELECT UNNEST(generate_series(
              1, (SELECT CAST(n AS BIGINT) FROM tot))) AS k) g
    ), lf0 AS MATERIALIZED (
      SELECT k, lfact FROM lf UNION ALL SELECT 0, 0.0
    ), grid AS (
      SELECT CAST(tot.n * g.i / 4 AS BIGINT) AS nn
      FROM tot, generate_series(1, 3) g(i)
    ), expd AS (
      SELECT grid.nn,
             SUM(1 - CASE WHEN tot.n - src.ns >= grid.nn
                 THEN EXP((la.lfact - lb.lfact)
                          - (lc.lfact - ld.lfact))
                 ELSE 0 END) AS e_species
      FROM grid, src, tot
      JOIN lf0 la ON la.k = tot.n - (SELECT ns FROM src s2
                                     WHERE s2.source = src.source)
      JOIN lf0 lb ON lb.k = GREATEST(tot.n - src.ns - grid.nn, 0)
      JOIN lf0 lc ON lc.k = tot.n
      JOIN lf0 ld ON ld.k = tot.n - grid.nn
      GROUP BY grid.nn
    ), obs AS (
      SELECT g2.nn,
             (SELECT COUNT(DISTINCT source) FROM (
                SELECT source, ROW_NUMBER() OVER (ORDER BY doc_id) AS r
                FROM documents) t
              WHERE t.r <= g2.nn) AS s_obs
      FROM (SELECT DISTINCT nn FROM grid) g2
    )
    SELECT CAST(e.nn AS BIGINT) AS sample_size,
           ROUND(e.e_species + 5e-10, 4) AS expected_sources,
           CAST(o.s_obs AS BIGINT) AS observed_sources,
           ROUND(o.s_obs - e.e_species + 5e-10, 4) AS gap
    FROM expd e JOIN obs o ON o.nn = e.nn
    ORDER BY sample_size
"""


@register(
    "q526_rarefaction",
    _Q526_ORACLE,
    doc="Exact rarefaction curve: E[distinct sources in an n-doc "
    "subsample] = sum (1 - C(N-N_s, n)/C(N, n)) via log-factorial "
    "prefix sums at n = N/4, N/2, 3N/4, against the observed "
    "id-order accumulation — the finite-sample richness expectation "
    "behind Heaps (q225), Chao1 (q213) and the coupon collector "
    "(q495).",
)
def q526(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(F.count(F.lit(1)).alias("ns")).localCheckpoint(eager=False)
    n_val = docs.count()
    lf = (
        spark.range(1, n_val + 1)
        .select(F.col("id").alias("k"), F.log(F.col("id").cast("double")).alias("l"))
        .select("k", F.sum("l").over(Window.orderBy("k")).alias("lfact"))
    )
    lf0 = lf.unionAll(
        spark.range(0, 1).select(F.col("id").alias("k"), F.lit(0.0).alias("lfact"))
    ).localCheckpoint(eager=False)
    grid = spark.createDataFrame(
        [(n_val * i // 4,) for i in (1, 2, 3)], "nn long"
    )

    def lj(df, key_expr, alias):
        return df.join(
            F.broadcast(
                lf0.select(F.col("k").alias(alias + "_k"), F.col("lfact").alias(alias))
            ),
            key_expr == F.col(alias + "_k"),
        ).drop(alias + "_k")

    g = src.crossJoin(F.broadcast(grid)).select(
        "source", "ns", "nn", F.lit(n_val).alias("n")
    )
    g = lj(g, F.col("n") - F.col("ns"), "la")
    g = lj(g, F.greatest(F.col("n") - F.col("ns") - F.col("nn"), F.lit(0)), "lb")
    g = lj(g, F.col("n"), "lc")
    g = lj(g, F.col("n") - F.col("nn"), "ld")
    expd = g.groupBy("nn").agg(
        F.sum(
            1
            - F.when(
                F.col("n") - F.col("ns") >= F.col("nn"),
                F.exp(
                    (F.col("la") - F.col("lb")) - (F.col("lc") - F.col("ld"))
                ),
            ).otherwise(0.0)
        ).alias("e_species")
    )
    seq = docs.select(
        "source", F.row_number().over(Window.orderBy("doc_id")).alias("r")
    )
    obs = (
        grid.crossJoin(seq)
        .filter(F.col("r") <= F.col("nn"))
        .groupBy("nn")
        .agg(F.count_distinct("source").alias("s_obs"))
    )
    return (
        expd.join(obs, "nn")
        .select(
            F.col("nn").cast("bigint").alias("sample_size"),
            F.round(F.col("e_species") + F.lit(5e-10), 4).alias(
                "expected_sources"
            ),
            F.col("s_obs").cast("bigint").alias("observed_sources"),
            F.round(
                F.col("s_obs") - F.col("e_species") + F.lit(5e-10), 4
            ).alias("gap"),
        )
        .orderBy("sample_size")
    )


# ---------------------------------------------------------------------------
# Q527 — rebalancing policy replay: threshold vs calendar
# ---------------------------------------------------------------------------
# A 50/50 two-stream portfolio (purchase vs click daily revenue
# growth as returns, clipped) replayed under two policies in ONE
# fold: threshold (rebalance when a weight drifts past 60%) and
# calendar (every 7 days).  Final values, rebalance counts and
# turnover per policy — the ops layer above the min-variance weights
# (q403) and drawdown (q219).
_Q527_ORACLE = """
    WITH daily AS (
      SELECT CAST(EXTRACT(day FROM ts) AS BIGINT) AS d,
             SUM(CASE WHEN event_type = 'purchase'
                      THEN ROUND(value * 100) ELSE 0 END) * 1.0 AS vp,
             SUM(CASE WHEN event_type = 'click'
                      THEN ROUND(value * 100) ELSE 0 END) * 1.0 AS vc
      FROM events WHERE EXTRACT(day FROM ts) <= 28 GROUP BY 1
    ), rets AS (
      SELECT d,
             GREATEST(LEAST(vp / LAG(vp) OVER (ORDER BY d) - 1, 0.5), -0.5)
               AS r1,
             GREATEST(LEAST(vc / LAG(vc) OVER (ORDER BY d) - 1, 0.5), -0.5)
               AS r2
      FROM daily
    ), ser AS (
      SELECT list([d * 1.0, r1, r2] ORDER BY d) AS rs
      FROM rets WHERE r1 IS NOT NULL
    ), sim AS (
      SELECT
        list_reduce(
          list_prepend([0.5, 0.5, CAST(0.0 AS DOUBLE), 0.0, 0.5, 0.5, 0.0,
                        0.0],
                       rs),
          (st, x) -> [
            -- threshold policy: grow, then rebalance if w1 outside
            -- [0.4, 0.6]
            CASE WHEN st[1] * (1 + x[2])
                      / (st[1] * (1 + x[2]) + st[2] * (1 + x[3])) > 0.6
                   OR st[1] * (1 + x[2])
                      / (st[1] * (1 + x[2]) + st[2] * (1 + x[3])) < 0.4
                 THEN (st[1] * (1 + x[2]) + st[2] * (1 + x[3])) / 2
                 ELSE st[1] * (1 + x[2]) END,
            CASE WHEN st[1] * (1 + x[2])
                      / (st[1] * (1 + x[2]) + st[2] * (1 + x[3])) > 0.6
                   OR st[1] * (1 + x[2])
                      / (st[1] * (1 + x[2]) + st[2] * (1 + x[3])) < 0.4
                 THEN (st[1] * (1 + x[2]) + st[2] * (1 + x[3])) / 2
                 ELSE st[2] * (1 + x[3]) END,
            st[3] + CASE WHEN st[1] * (1 + x[2])
                      / (st[1] * (1 + x[2]) + st[2] * (1 + x[3])) > 0.6
                   OR st[1] * (1 + x[2])
                      / (st[1] * (1 + x[2]) + st[2] * (1 + x[3])) < 0.4
                 THEN 1 ELSE 0 END,
            st[4] + CASE WHEN st[1] * (1 + x[2])
                      / (st[1] * (1 + x[2]) + st[2] * (1 + x[3])) > 0.6
                   OR st[1] * (1 + x[2])
                      / (st[1] * (1 + x[2]) + st[2] * (1 + x[3])) < 0.4
                 THEN ABS(st[1] * (1 + x[2])
                          - (st[1] * (1 + x[2]) + st[2] * (1 + x[3])) / 2)
                 ELSE 0 END,
            -- calendar policy: rebalance when day mod 7 = 0
            CASE WHEN CAST(x[1] AS BIGINT) % 7 = 0
                 THEN (st[5] * (1 + x[2]) + st[6] * (1 + x[3])) / 2
                 ELSE st[5] * (1 + x[2]) END,
            CASE WHEN CAST(x[1] AS BIGINT) % 7 = 0
                 THEN (st[5] * (1 + x[2]) + st[6] * (1 + x[3])) / 2
                 ELSE st[6] * (1 + x[3]) END,
            st[7] + CASE WHEN CAST(x[1] AS BIGINT) % 7 = 0
                         THEN 1 ELSE 0 END,
            st[8] + CASE WHEN CAST(x[1] AS BIGINT) % 7 = 0
                 THEN ABS(st[5] * (1 + x[2])
                          - (st[5] * (1 + x[2]) + st[6] * (1 + x[3])) / 2)
                 ELSE 0 END
          ]
        ) AS st
      FROM ser
    )
    SELECT ROUND(st[1] + st[2] + 5e-12, 6) AS threshold_final,
           CAST(st[3] AS BIGINT) AS threshold_rebalances,
           ROUND(st[4] + 5e-12, 6) AS threshold_turnover,
           ROUND(st[5] + st[6] + 5e-12, 6) AS calendar_final,
           CAST(st[7] AS BIGINT) AS calendar_rebalances,
           ROUND(st[8] + 5e-12, 6) AS calendar_turnover
    FROM sim
"""


@register(
    "q527_rebalance_policy",
    _Q527_ORACLE,
    doc="Rebalancing policy replay in one fold carrying BOTH policies' "
    "portfolios: threshold (rebalance outside 40-60%) vs calendar "
    "(every 7 days) on clipped two-stream daily returns — final "
    "values, trade counts and turnover side by side; the policy "
    "layer above min-variance weights (q403).",
)
def q527(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.dayofmonth("ts") <= 28)
    daily = ev.groupBy(F.dayofmonth("ts").cast("bigint").alias("d")).agg(
        (
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", F.round(F.col("value") * 100)
                ).otherwise(0)
            )
            * 1.0
        ).alias("vp"),
        (
            F.sum(
                F.when(
                    F.col("event_type") == "click", F.round(F.col("value") * 100)
                ).otherwise(0)
            )
            * 1.0
        ).alias("vc"),
    )
    w = Window.orderBy("d")
    rets = daily.select(
        "d",
        F.greatest(
            F.least(F.col("vp") / F.lag("vp").over(w) - 1, F.lit(0.5)), F.lit(-0.5)
        ).alias("r1"),
        F.greatest(
            F.least(F.col("vc") / F.lag("vc").over(w) - 1, F.lit(0.5)), F.lit(-0.5)
        ).alias("r2"),
    ).filter(F.col("r1").isNotNull())
    ser = rets.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("d", "r1", "r2"))),
            lambda s: F.array(s.d.cast("double"), s.r1, s.r2),
        ).alias("rs")
    )

    def step(st, x):
        day = F.element_at(x, 1)
        r1 = F.element_at(x, 2)
        r2 = F.element_at(x, 3)
        # threshold policy
        a1 = F.element_at(st, 1) * (1 + r1)
        a2 = F.element_at(st, 2) * (1 + r2)
        wgt = a1 / (a1 + a2)
        treb = (wgt > 0.6) | (wgt < 0.4)
        half = (a1 + a2) / 2
        # calendar policy
        b1 = F.element_at(st, 5) * (1 + r1)
        b2 = F.element_at(st, 6) * (1 + r2)
        creb = day.cast("bigint") % 7 == 0
        halfb = (b1 + b2) / 2
        return F.array(
            F.when(treb, half).otherwise(a1),
            F.when(treb, half).otherwise(a2),
            F.element_at(st, 3) + F.when(treb, 1.0).otherwise(0.0),
            F.element_at(st, 4) + F.when(treb, F.abs(a1 - half)).otherwise(0.0),
            F.when(creb, halfb).otherwise(b1),
            F.when(creb, halfb).otherwise(b2),
            F.element_at(st, 7) + F.when(creb, 1.0).otherwise(0.0),
            F.element_at(st, 8) + F.when(creb, F.abs(b1 - halfb)).otherwise(0.0),
        )

    init = F.array(
        F.lit(0.5), F.lit(0.5), F.lit(0.0), F.lit(0.0),
        F.lit(0.5), F.lit(0.5), F.lit(0.0), F.lit(0.0),
    )
    sim = ser.select(F.aggregate(F.col("rs"), init, step).alias("st"))
    return sim.select(
        r6(F.element_at("st", 1) + F.element_at("st", 2)).alias(
            "threshold_final"
        ),
        F.element_at("st", 3).cast("bigint").alias("threshold_rebalances"),
        r6(F.element_at("st", 4)).alias("threshold_turnover"),
        r6(F.element_at("st", 5) + F.element_at("st", 6)).alias(
            "calendar_final"
        ),
        F.element_at("st", 7).cast("bigint").alias("calendar_rebalances"),
        r6(F.element_at("st", 8)).alias("calendar_turnover"),
    )


# ---------------------------------------------------------------------------
# Q528 — retry backoff schedule coverage
# ---------------------------------------------------------------------------
# Per error event, the time until the same user's next non-error
# event is the recovery latency; two 4-attempt probe schedules with
# the same 900s budget — exponential (60/180/420/900) and uniform
# (225/450/675/900) — are scored by recovery coverage per attempt
# and mean detection latency — the retry-policy table behind
# debounce (q396) and the token bucket (q267).
_Q528_ORACLE = """
    WITH seq AS (
      SELECT user_id, event_type, epoch_us(ts) AS t,
             LEAD(CASE WHEN event_type <> 'error' THEN epoch_us(ts) END
                  IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ok
      FROM events
    ), rec AS (
      SELECT (next_ok - t) / 1e6 AS gap_s
      FROM seq WHERE event_type = 'error' AND next_ok IS NOT NULL
    ), sched AS (
      SELECT * FROM (VALUES
        ('exponential', 1, 60.0), ('exponential', 2, 180.0),
        ('exponential', 3, 420.0), ('exponential', 4, 900.0),
        ('uniform', 1, 225.0), ('uniform', 2, 450.0),
        ('uniform', 3, 675.0), ('uniform', 4, 900.0)) s(name, attempt, probe)
    ), cov AS (
      SELECT s.name, s.attempt, s.probe,
             AVG(CASE WHEN r.gap_s <= s.probe THEN 1.0 ELSE 0 END) AS covered
      FROM sched s, rec r GROUP BY s.name, s.attempt, s.probe
    )
    SELECT name AS schedule, CAST(attempt AS BIGINT) AS attempt,
           ROUND(probe + 5e-10, 4) AS probe_at_s,
           ROUND(covered + 5e-12, 6) AS recovery_coverage
    FROM cov ORDER BY schedule, attempt
"""


@register(
    "q528_retry_backoff",
    _Q528_ORACLE,
    doc="Retry-backoff coverage on measured recovery latencies (error "
    "event to the user's next healthy event via IGNORE NULLS lead): "
    "exponential vs uniform 4-probe schedules on the same 900s "
    "budget, coverage per attempt — the retry-policy evidence "
    "behind debounce (q396) and token bucket (q267).",
)
def q528(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # "next ok" as a growing frame on the reversed per-user total
    # order ((ts, event_id) is unique): an (1, unboundedFollowing)
    # frame rescans to the partition end per row — O(rows²) per user —
    # while the reversed growing frame updates incrementally.
    wd = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    ).rowsBetween(Window.unboundedPreceding, -1)
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    seq = ev.select(
        "event_type",
        t.alias("t"),
        F.last(
            F.when(F.col("event_type") != "error", t), ignorenulls=True
        )
        .over(wd)
        .alias("next_ok"),
    )
    rec = seq.filter(
        (F.col("event_type") == "error") & F.col("next_ok").isNotNull()
    ).select(((F.col("next_ok") - F.col("t")) / 1e6).alias("gap_s")).localCheckpoint(eager=False)
    sched = spark.createDataFrame(
        [
            ("exponential", 1, 60.0), ("exponential", 2, 180.0),
            ("exponential", 3, 420.0), ("exponential", 4, 900.0),
            ("uniform", 1, 225.0), ("uniform", 2, 450.0),
            ("uniform", 3, 675.0), ("uniform", 4, 900.0),
        ],
        "name string, attempt int, probe double",
    )
    cov = (
        # literal schedule on the BROADCAST side, gaps streamed — and
        # no coalesce(1) on the literal: pyspark literals are
        # RDD-backed, and Coalesce(1) makes the broadcast job pull all
        # default-parallelism slices sequentially through one task
        # (one Python-worker roundtrip per slice, ~5 s vs ~0.2 s
        # materialized in parallel)
        rec.crossJoin(F.broadcast(sched))
        .groupBy("name", "attempt", "probe")
        .agg(
            F.avg(
                F.when(F.col("gap_s") <= F.col("probe"), 1.0).otherwise(0.0)
            ).alias("covered")
        )
    )
    return cov.select(
        F.col("name").alias("schedule"),
        F.col("attempt").cast("bigint").alias("attempt"),
        F.round(F.col("probe") + F.lit(5e-10), 4).alias("probe_at_s"),
        r6(F.col("covered")).alias("recovery_coverage"),
    ).orderBy("schedule", "attempt")
