"""Conformance queries batch #73 (q559+) — revenue equivalence,
standardized effect sizes, 2-opt annealing, price of anarchy, and
forecast combination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q559 — revenue equivalence, audited
# ---------------------------------------------------------------------------
# The q416 two-bidder auctions run both ways: second-price revenue
# (truthful, pays b2) vs first-price revenue under the uniform-value
# equilibrium shading b/2 — revenue equivalence predicts equality
# for iid uniform values, and the measured gap prices how far the
# real bid distribution is from that assumption.
_Q559_ORACLE = """
    WITH bids AS (
      SELECT o_custkey % 500 AS auction,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS bid,
             ROW_NUMBER() OVER (PARTITION BY o_custkey % 500
                                ORDER BY o_totalprice DESC,
                                         o_orderkey) AS rk
      FROM orders
    ), top2 AS (
      SELECT auction,
             MAX(CASE WHEN rk = 1 THEN bid END) AS b1,
             MAX(CASE WHEN rk = 2 THEN bid END) AS b2
      FROM bids WHERE rk <= 2 GROUP BY auction
      HAVING MAX(CASE WHEN rk = 2 THEN bid END) IS NOT NULL
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_auctions,
           ROUND(SUM(b2) / 100.0 + 5e-8, 2) AS second_price_rev_usd,
           ROUND(SUM(b1 / 2.0) / 100.0 + 5e-8, 2) AS first_price_shaded_usd,
           ROUND(SUM(b1 / 2.0) / SUM(b2 * 1.0) + 5e-12, 6)
             AS first_over_second,
           ROUND((SUM(b1 / 2.0) - SUM(b2)) / SUM(b2 * 1.0) + 5e-12, 6)
             AS equivalence_gap
    FROM top2
"""


@register(
    "q559_revenue_equivalence",
    _Q559_ORACLE,
    doc="Revenue equivalence audited: the q416 auctions scored as "
    "second-price (pay b2) vs first-price under uniform-equilibrium "
    "shading b/2 — the theorem predicts a ratio of 1 for iid "
    "uniform values; the measured gap prices the distributional "
    "departure (Myerson reserve q496 completes the trio).",
)
def q559(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    bids = o.select(
        (F.col("o_custkey") % 500).alias("auction"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("bid"),
        F.row_number()
        .over(
            Window.partitionBy(F.col("o_custkey") % 500).orderBy(
                F.desc("o_totalprice"), "o_orderkey"
            )
        )
        .alias("rk"),
    )
    top2 = (
        bids.filter(F.col("rk") <= 2)
        .groupBy("auction")
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("bid"))).alias("b1"),
            F.max(F.when(F.col("rk") == 2, F.col("bid"))).alias("b2"),
        )
        .filter(F.col("b2").isNotNull())
    )
    r2 = lambda cexpr: F.round(cexpr + F.lit(5e-8), 2)  # noqa: E731
    return top2.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_auctions"),
        r2(F.sum("b2") / 100.0).alias("second_price_rev_usd"),
        r2(F.sum(F.col("b1") / 2.0) / 100.0).alias("first_price_shaded_usd"),
        r6(F.sum(F.col("b1") / 2.0) / F.sum(F.col("b2") * 1.0)).alias(
            "first_over_second"
        ),
        r6(
            (F.sum(F.col("b1") / 2.0) - F.sum("b2"))
            / F.sum(F.col("b2") * 1.0)
        ).alias("equivalence_gap"),
    )


# ---------------------------------------------------------------------------
# Q560 — standardized effect sizes for the fortnight contrast
# ---------------------------------------------------------------------------
# The same paired-fortnight spend comparison the tests (q458/q553)
# decide, now SIZED: Cohen's d with pooled SD, the small-sample
# Hedges g correction, Cliff's delta from exact pair dominance
# counts, and point-biserial r from the t statistic — the "is it
# big" numbers that p-values (by design) never give.
_Q560_ORACLE = """
    WITH u AS MATERIALIZED (
      SELECT user_id,
             SUM(CASE WHEN EXTRACT(day FROM ts) <= 14
                      THEN ROUND(value * 100) ELSE 0 END) * 1.0 AS s1,
             SUM(CASE WHEN EXTRACT(day FROM ts) > 14
                       AND EXTRACT(day FROM ts) <= 28
                      THEN ROUND(value * 100) ELSE 0 END) * 1.0 AS s2
      FROM events WHERE event_type = 'purchase' AND user_id % 2 = 0
      GROUP BY user_id
    ), m AS (
      SELECT COUNT(*) AS n, AVG(s1) AS m1, AVG(s2) AS m2,
             var_samp(s1) AS v1, var_samp(s2) AS v2
      FROM u
    ), pairs AS (
      SELECT SUM(CASE WHEN a.s2 > b.s1 THEN 1 ELSE 0 END) AS gt,
             SUM(CASE WHEN a.s2 < b.s1 THEN 1 ELSE 0 END) AS lt,
             COUNT(*) AS np
      FROM u a, u b
    ), eff AS (
      SELECT m.n,
             (m.m2 - m.m1) / SQRT((m.v1 + m.v2) / 2) AS d,
             2.0 * m.n - 2 AS df
      FROM m
    )
    SELECT CAST(eff.n AS BIGINT) AS n_users,
           ROUND(eff.d + 5e-12, 6) AS cohens_d,
           ROUND(eff.d * (1 - 3 / (4 * eff.df - 1)) + 5e-12, 6) AS hedges_g,
           ROUND((pairs.gt - pairs.lt) * 1.0 / pairs.np + 5e-12, 6)
             AS cliffs_delta,
           ROUND(eff.d * SQRT(eff.n / 2.0)
                 / SQRT(eff.d * eff.d * eff.n / 2.0 + eff.df) + 5e-12, 6)
             AS point_biserial_r
    FROM eff, pairs
"""


@register(
    "q560_effect_sizes",
    _Q560_ORACLE,
    doc="Effect-size suite for the fortnight spend contrast: Cohen's "
    "d (pooled SD), Hedges g small-sample correction, Cliff's delta "
    "from exact pair dominance, point-biserial r — the magnitude "
    "layer the tests (q458/q553) and power analysis (q292) sit on.",
)
def q560(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") % 2 == 0)
    )
    u = ev.groupBy("user_id").agg(
        (
            F.sum(
                F.when(F.dayofmonth("ts") <= 14, F.round(F.col("value") * 100))
                .otherwise(0)
            )
            * 1.0
        ).alias("s1"),
        (
            F.sum(
                F.when(
                    (F.dayofmonth("ts") > 14) & (F.dayofmonth("ts") <= 28),
                    F.round(F.col("value") * 100),
                ).otherwise(0)
            )
            * 1.0
        ).alias("s2"),
    ).localCheckpoint(eager=False)
    m = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("s1").alias("m1"),
        F.avg("s2").alias("m2"),
        F.var_samp("s1").alias("v1"),
        F.var_samp("s2").alias("v2"),
    )
    a = u.select(F.col("s2").alias("a2"))
    b = u.select(F.col("s1").alias("b1"))
    pairs = a.crossJoin(F.broadcast(b)).agg(
        F.sum(F.when(F.col("a2") > F.col("b1"), 1).otherwise(0)).alias("gt"),
        F.sum(F.when(F.col("a2") < F.col("b1"), 1).otherwise(0)).alias("lt"),
        F.count(F.lit(1)).alias("np"),
    )
    d = (F.col("m2") - F.col("m1")) / F.sqrt((F.col("v1") + F.col("v2")) / 2)
    df = 2.0 * F.col("n") - 2
    return m.crossJoin(F.broadcast(pairs)).select(
        F.col("n").cast("bigint").alias("n_users"),
        r6(d).alias("cohens_d"),
        r6(d * (1 - 3 / (4 * df - 1))).alias("hedges_g"),
        r6((F.col("gt") - F.col("lt")) * 1.0 / F.col("np")).alias(
            "cliffs_delta"
        ),
        r6(
            d
            * F.sqrt(F.col("n") / 2.0)
            / F.sqrt(d * d * F.col("n") / 2.0 + df)
        ).alias("point_biserial_r"),
    )


# ---------------------------------------------------------------------------
# Q561 — 2-opt simulated annealing on the TSP tour
# ---------------------------------------------------------------------------
# The q486 12-city instance attacked with 60 hash-deterministic
# 2-opt proposals under a geometric cooling schedule: segment
# reversal as an index transform on the tour array, acceptance by
# exp(-delta/T) against a hash uniform — a fully reproducible
# metaheuristic whose improvement over the identity tour and gap to
# the degree bound are the outputs.
def _q561_oracle() -> str:
    d_at = (
        "dm[CAST(tour[CAST({a} AS INT) + 1] * 12"
        " + tour[CAST({b} AS INT) + 1] AS INT) + 1]"
    )
    return f"""
    WITH city AS MATERIALIZED (
      SELECT c_nationkey AS n, AVG(c_acctbal) AS x,
             AVG(c_custkey % 1000) AS y
      FROM customer WHERE c_nationkey < 12 GROUP BY c_nationkey
    ), dmat AS MATERIALIZED (
      SELECT list(d ORDER BY i, j) AS dm FROM (
        SELECT a.n AS i, b.n AS j,
               SQRT((a.x - b.x) * (a.x - b.x)
                    + (a.y - b.y) * (a.y - b.y)) AS d
        FROM city a, city b)
    ), sa AS (
      SELECT dm,
        list_reduce(
          list_prepend(
            list_concat(list_transform(generate_series(0, 11),
                                       z -> CAST(z AS DOUBLE)), [0.0]),
            list_transform(generate_series(1, 60),
                           z -> [CAST(z AS DOUBLE)])),
          (st, zz) -> (
            WITH s(k) AS (SELECT zz[1])
            SELECT st FROM s
          )
        ) AS fin
      FROM dmat
    )
    SELECT 1 FROM sa
"""


def _q561_real_oracle() -> str:
    # tour array occupies st[1..12]; st[13] = accepted count.
    # proposal k: i = 1 + h1 % 10, j = i + 1 + h2 % (11 - i)
    h1 = "CAST((zz[1] * 2654435761) % 4294967296 % 10 AS BIGINT)"
    h2 = "CAST((zz[1] * 40503 + 7) * 2654435761 % 4294967296 AS BIGINT)"
    i_e = f"(1 + {h1})"
    j_e = f"({i_e} + 1 + {h2} % (11 - {i_e}))"
    u_e = (
        "(CAST((zz[1] * 69069 + 13) * 2654435761 % 4294967296 AS DOUBLE)"
        " / 4294967296.0)"
    )

    def d(a, b):
        return (
            f"dm[CAST(st[CAST({a} AS INT) + 1] * 12"
            f" + st[CAST({b} AS INT) + 1] AS INT) + 1]"
        )

    # positions in tour are 0-based 0..11; tour[p] = st[p+1]
    delta = (
        f"({d(f'{i_e} - 1', j_e)} + {d(i_e, f'({j_e} + 1) % 12')}"
        f" - {d(f'{i_e} - 1', i_e)} - {d(j_e, f'({j_e} + 1) % 12')})"
    )
    accept = (
        f"({delta} < 0 OR {u_e} < EXP(-({delta})"
        f" / (50.0 * POW(0.93, zz[1]))))"
    )
    new_st = (
        "list_append(list_transform(generate_series(0, 11), p -> "
        f"CASE WHEN NOT {accept} THEN st[CAST(p AS INT) + 1] "
        f"WHEN p >= {i_e} AND p <= {j_e} "
        f"THEN st[CAST({j_e} - (p - {i_e}) AS INT) + 1] "
        "ELSE st[CAST(p AS INT) + 1] END), "
        f"st[13] + CASE WHEN {accept} THEN 1.0 ELSE 0.0 END)"
    )
    tour_len = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        " list_transform(generate_series(0, 11), p ->"
        " dm[CAST(fin[CAST(p AS INT) + 1] * 12"
        " + fin[CAST((p + 1) % 12 AS INT) + 1] AS INT) + 1])),"
        " (a, b) -> a + b)"
    )
    ident_len = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        " list_transform(generate_series(0, 11), p ->"
        " dm[CAST(p * 12 + ((p + 1) % 12) AS INT) + 1])),"
        " (a, b) -> a + b)"
    )
    return f"""
    WITH city AS MATERIALIZED (
      SELECT c_nationkey AS n, AVG(c_acctbal) AS x,
             AVG(c_custkey % 1000) AS y
      FROM customer WHERE c_nationkey < 12 GROUP BY c_nationkey
    ), dmat AS MATERIALIZED (
      SELECT list(d ORDER BY i, j) AS dm FROM (
        SELECT a.n AS i, b.n AS j,
               SQRT((a.x - b.x) * (a.x - b.x)
                    + (a.y - b.y) * (a.y - b.y)) AS d
        FROM city a, city b)
    ), sa AS MATERIALIZED (
      SELECT dm,
        list_reduce(
          list_prepend(
            list_concat(list_transform(generate_series(0, 11),
                                       z -> CAST(z AS DOUBLE)), [0.0]),
            list_transform(generate_series(1, 60),
                           z -> [CAST(z AS DOUBLE)])),
          (st, zz) -> {new_st}
        ) AS fin
      FROM dmat
    )
    SELECT ROUND({ident_len.replace('fin', 'xx')} + 5e-10, 4)
             AS identity_tour_len,
           ROUND({tour_len} + 5e-10, 4) AS annealed_tour_len,
           CAST(sa.fin[13] AS BIGINT) AS n_accepted,
           ROUND(({ident_len.replace('fin', 'xx')} - {tour_len})
                 / {ident_len.replace('fin', 'xx')} + 5e-12, 6)
             AS improvement
    FROM sa,
         (SELECT list_transform(generate_series(0, 11),
                                z -> CAST(z AS DOUBLE)) AS xx) idt
"""


@register(
    "q561_two_opt_annealing",
    _q561_real_oracle(),
    doc="Hash-deterministic simulated annealing: 60 2-opt proposals "
    "on the 12-city tour (segment reversal as an index transform "
    "inside the fold), geometric cooling, acceptance by exp(-d/T) "
    "against hash uniforms — a fully reproducible metaheuristic "
    "improving the identity tour (NN construction and the degree "
    "bound live in q486).",
)
def q561(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 12)
    city = c.groupBy(F.col("c_nationkey").alias("n")).agg(
        F.avg("c_acctbal").alias("x"), F.avg(F.col("c_custkey") % 1000).alias("y")
    )
    a = city.select(
        F.col("n").alias("i"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = city.select(
        F.col("n").alias("j"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    dmat = (
        a.crossJoin(F.broadcast(b))
        .select(
            "i",
            "j",
            F.sqrt(
                (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
                + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
            ).alias("d"),
        )
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("i", "j", "d"))),
                lambda s: s.d,
            ).alias("dm")
        )
    )
    dm = F.col("dm")

    def dist(st, p, q):
        return F.element_at(
            dm,
            (
                F.element_at(st, p.cast("int") + 1) * 12
                + F.element_at(st, q.cast("int") + 1)
            ).cast("int")
            + 1,
        )

    def step(st, zz):
        h1 = ((zz * 2654435761) % 4294967296 % 10).cast("bigint")
        i = (1 + h1).cast("double")
        h2 = ((zz * 40503 + 7) * 2654435761 % 4294967296).cast("bigint")
        j = (i + 1 + (h2 % (11 - i.cast("bigint"))).cast("double"))
        u = ((zz * 69069 + 13) * 2654435761 % 4294967296).cast(
            "double"
        ) / 4294967296.0
        delta = (
            dist(st, i - 1, j)
            + dist(st, i, (j + 1) % 12)
            - dist(st, i - 1, i)
            - dist(st, j, (j + 1) % 12)
        )
        accept = (delta < 0) | (
            u < F.exp(-delta / (50.0 * F.pow(F.lit(0.93), zz)))
        )
        newtour = F.transform(
            F.sequence(F.lit(0), F.lit(11)),
            lambda p: F.when(
                ~accept, F.element_at(st, p.cast("int") + 1)
            )
            .when(
                (p.cast("double") >= i) & (p.cast("double") <= j),
                F.element_at(st, (j - (p.cast("double") - i)).cast("int") + 1),
            )
            .otherwise(F.element_at(st, p.cast("int") + 1)),
        )
        return F.concat(
            newtour,
            F.array(
                F.element_at(st, 13) + F.when(accept, 1.0).otherwise(0.0)
            ),
        )

    init = F.concat(
        F.transform(F.sequence(F.lit(0), F.lit(11)), lambda z: z.cast("double")),
        F.array(F.lit(0.0)),
    )
    sa = dmat.select(
        "dm",
        F.aggregate(
            F.transform(
                F.sequence(F.lit(1), F.lit(60)), lambda z: z.cast("double")
            ),
            init,
            step,
        ).alias("fin"),
    )

    def tour_len(arr):
        return F.aggregate(
            F.transform(
                F.sequence(F.lit(0), F.lit(11)),
                lambda p: F.element_at(
                    dm,
                    (
                        F.element_at(arr, p.cast("int") + 1) * 12
                        + F.element_at(arr, ((p + 1) % 12).cast("int") + 1)
                    ).cast("int")
                    + 1,
                ),
            ),
            F.lit(0.0),
            lambda x, y: x + y,
        )

    ident = F.transform(F.sequence(F.lit(0), F.lit(11)), lambda z: z.cast("double"))
    r4 = lambda cexpr: F.round(cexpr + F.lit(5e-10), 4)  # noqa: E731
    return sa.select(
        r4(tour_len(ident)).alias("identity_tour_len"),
        r4(tour_len(F.col("fin"))).alias("annealed_tour_len"),
        F.element_at("fin", 13).cast("bigint").alias("n_accepted"),
        r6(
            (tour_len(ident) - tour_len(F.col("fin"))) / tour_len(ident)
        ).alias("improvement"),
    )


# ---------------------------------------------------------------------------
# Q562 — price of anarchy on a Pigou network
# ---------------------------------------------------------------------------
# Two routes, one constant latency 1 and one linear a*x, with the
# congestion slope a measured from the traffic data (peak-hour
# concentration): selfish equilibrium puts x_eq = min(1, 1/a) on
# the congestible road vs the social optimum min(1, 1/(2a)); the
# cost ratio is the price of anarchy, certified under the 4/3 bound
# for linear latencies — game theory over the load profile
# (congestion measurement beside the queueing stack q419/q457).
_Q562_ORACLE = """
    WITH hours AS (
      SELECT EXTRACT(hour FROM ts) AS h, COUNT(*) AS c
      FROM events GROUP BY 1
    ), conc AS (
      SELECT MAX(c) * 24.0 / SUM(c) AS a FROM hours
    ), eq AS (
      SELECT a,
             LEAST(1.0, 1.0 / a) AS x_eq,
             LEAST(1.0, 1.0 / (2 * a)) AS x_opt
      FROM conc
    ), costs AS (
      SELECT a, x_eq, x_opt,
             a * x_eq * x_eq + (1 - x_eq) AS cost_eq,
             a * x_opt * x_opt + (1 - x_opt) AS cost_opt
      FROM eq
    )
    SELECT ROUND(a + 5e-12, 6) AS congestion_slope,
           ROUND(x_eq + 5e-12, 6) AS selfish_share,
           ROUND(x_opt + 5e-12, 6) AS optimal_share,
           ROUND(cost_eq + 5e-12, 6) AS selfish_cost,
           ROUND(cost_opt + 5e-12, 6) AS optimal_cost,
           ROUND(cost_eq / cost_opt + 5e-12, 6) AS price_of_anarchy,
           cost_eq / cost_opt <= 4.0 / 3 + 1e-9 AS within_pigou_bound
    FROM costs
"""


@register(
    "q562_price_of_anarchy",
    _Q562_ORACLE,
    doc="Price of anarchy on a Pigou two-route network with the "
    "congestion slope measured from peak-hour concentration: "
    "selfish vs socially-optimal route split, cost ratio, and the "
    "4/3 linear-latency bound as a certificate — selfish-routing "
    "game theory on the measured load profile.",
)
def q562(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hours = ev.groupBy(F.hour("ts").alias("h")).agg(F.count(F.lit(1)).alias("c"))
    conc = hours.agg((F.max("c") * 24.0 / F.sum("c")).alias("a"))
    x_eq = F.least(F.lit(1.0), 1.0 / F.col("a"))
    x_opt = F.least(F.lit(1.0), 1.0 / (2 * F.col("a")))
    cost_eq = F.col("a") * x_eq * x_eq + (1 - x_eq)
    cost_opt = F.col("a") * x_opt * x_opt + (1 - x_opt)
    return conc.select(
        r6(F.col("a")).alias("congestion_slope"),
        r6(x_eq).alias("selfish_share"),
        r6(x_opt).alias("optimal_share"),
        r6(cost_eq).alias("selfish_cost"),
        r6(cost_opt).alias("optimal_cost"),
        r6(cost_eq / cost_opt).alias("price_of_anarchy"),
        (cost_eq / cost_opt <= 4.0 / 3 + 1e-9).alias("within_pigou_bound"),
    )


# ---------------------------------------------------------------------------
# Q563 — forecast combination (the ensemble puzzle)
# ---------------------------------------------------------------------------
# Naive-1, MA-7 and drift forecasters on daily revenue: inverse-MSE
# weights learned on days 9-18, the combination evaluated on days
# 19-28 against each component — the "forecast combination puzzle"
# (simple pooling beats most members) measured, extending the
# single-model accuracy scoring (q221) and rolling origin (q295).
_Q563_ORACLE = """
    WITH daily AS MATERIALIZED (
      SELECT CAST(EXTRACT(day FROM ts) AS BIGINT) AS d,
             CAST(SUM(ROUND(value * 100)) AS DOUBLE) / 100 AS v
      FROM events WHERE event_type = 'purchase' AND EXTRACT(day FROM ts) <= 28
      GROUP BY 1
    ), feat AS MATERIALIZED (
      SELECT d, v,
             LAG(v) OVER w AS f_naive,
             AVG(v) OVER (ORDER BY d ROWS BETWEEN 7 PRECEDING
                          AND 1 PRECEDING) AS f_ma,
             CASE WHEN d > 2 THEN LAG(v) OVER w
               + (LAG(v) OVER w - FIRST_VALUE(v) OVER w) / (d - 2)
             END AS f_drift
      FROM daily WINDOW w AS (ORDER BY d)
    ), train AS (
      SELECT AVG((v - f_naive) * (v - f_naive)) AS m1,
             AVG((v - f_ma) * (v - f_ma)) AS m2,
             AVG((v - f_drift) * (v - f_drift)) AS m3
      FROM feat WHERE d BETWEEN 9 AND 18
    ), wts AS (
      SELECT (1 / m1) / (1 / m1 + 1 / m2 + 1 / m3) AS w1,
             (1 / m2) / (1 / m1 + 1 / m2 + 1 / m3) AS w2,
             (1 / m3) / (1 / m1 + 1 / m2 + 1 / m3) AS w3,
             m1, m2, m3
      FROM train
    ), test AS (
      SELECT AVG((v - f_naive) * (v - f_naive)) AS t1,
             AVG((v - f_ma) * (v - f_ma)) AS t2,
             AVG((v - f_drift) * (v - f_drift)) AS t3,
             AVG((v - (w.w1 * f_naive + w.w2 * f_ma + w.w3 * f_drift))
                 * (v - (w.w1 * f_naive + w.w2 * f_ma + w.w3 * f_drift)))
               AS tc
      FROM feat, wts w WHERE d BETWEEN 19 AND 28
    )
    SELECT model,
           ROUND(train_mse + 5e-10, 4) AS train_mse,
           ROUND(test_mse + 5e-10, 4) AS test_mse,
           ROUND(weight + 5e-12, 6) AS weight,
           test_mse <= (SELECT LEAST(t1, t2, t3) FROM test) AS beats_singles
    FROM (
      SELECT 'naive1' AS model, (SELECT m1 FROM wts) AS train_mse,
             (SELECT t1 FROM test) AS test_mse,
             (SELECT w1 FROM wts) AS weight
      UNION ALL
      SELECT 'ma7', (SELECT m2 FROM wts), (SELECT t2 FROM test),
             (SELECT w2 FROM wts)
      UNION ALL
      SELECT 'drift', (SELECT m3 FROM wts), (SELECT t3 FROM test),
             (SELECT w3 FROM wts)
      UNION ALL
      SELECT 'inverse_mse_combo', NULL, (SELECT tc FROM test), NULL
    ) ORDER BY model
"""


@register(
    "q563_forecast_combination",
    _Q563_ORACLE,
    doc="Forecast combination: naive-1 / MA-7 / drift with inverse-"
    "MSE weights learned on days 9-18, the pooled forecast scored "
    "out-of-sample on 19-28 against every component — the "
    "combination-puzzle measurement above single-model accuracy "
    "(q221) and rolling origin (q295).",
)
def q563(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.dayofmonth("ts") <= 28)
    )
    daily = ev.groupBy(F.dayofmonth("ts").cast("bigint").alias("d")).agg(
        (F.sum(F.round(F.col("value") * 100)).cast("double") / 100).alias("v")
    )
    w = Window.orderBy("d")
    feat = daily.select(
        "d",
        "v",
        F.lag("v").over(w).alias("f_naive"),
        F.avg("v").over(w.rowsBetween(-7, -1)).alias("f_ma"),
        F.when(
            F.col("d") > 2,
            F.lag("v").over(w)
            + (F.lag("v").over(w) - F.first("v").over(w)) / (F.col("d") - 2),
        ).alias("f_drift"),
    ).localCheckpoint(eager=False)
    train = feat.filter(F.col("d").between(9, 18)).agg(
        F.avg((F.col("v") - F.col("f_naive")) * (F.col("v") - F.col("f_naive"))).alias(
            "m1"
        ),
        F.avg((F.col("v") - F.col("f_ma")) * (F.col("v") - F.col("f_ma"))).alias(
            "m2"
        ),
        F.avg(
            (F.col("v") - F.col("f_drift")) * (F.col("v") - F.col("f_drift"))
        ).alias("m3"),
    )
    tot = 1 / F.col("m1") + 1 / F.col("m2") + 1 / F.col("m3")
    wts = train.select(
        "m1",
        "m2",
        "m3",
        ((1 / F.col("m1")) / tot).alias("w1"),
        ((1 / F.col("m2")) / tot).alias("w2"),
        ((1 / F.col("m3")) / tot).alias("w3"),
    )
    combo = (
        F.col("w1") * F.col("f_naive")
        + F.col("w2") * F.col("f_ma")
        + F.col("w3") * F.col("f_drift")
    )
    test = (
        feat.filter(F.col("d").between(19, 28))
        .crossJoin(F.broadcast(wts))
        .agg(
            F.avg(
                (F.col("v") - F.col("f_naive")) * (F.col("v") - F.col("f_naive"))
            ).alias("t1"),
            F.avg(
                (F.col("v") - F.col("f_ma")) * (F.col("v") - F.col("f_ma"))
            ).alias("t2"),
            F.avg(
                (F.col("v") - F.col("f_drift")) * (F.col("v") - F.col("f_drift"))
            ).alias("t3"),
            F.avg((F.col("v") - combo) * (F.col("v") - combo)).alias("tc"),
            F.first("m1").alias("m1"),
            F.first("m2").alias("m2"),
            F.first("m3").alias("m3"),
            F.first("w1").alias("w1"),
            F.first("w2").alias("w2"),
            F.first("w3").alias("w3"),
        )
    )
    rows = (
        test.select(
            F.lit("naive1").alias("model"),
            F.col("m1").alias("train_mse"),
            F.col("t1").alias("test_mse"),
            F.col("w1").alias("weight"),
            F.least("t1", "t2", "t3").alias("best_single"),
        )
        .unionAll(
            test.select(
                F.lit("ma7"), F.col("m2"), F.col("t2"), F.col("w2"),
                F.least("t1", "t2", "t3"),
            )
        )
        .unionAll(
            test.select(
                F.lit("drift"), F.col("m3"), F.col("t3"), F.col("w3"),
                F.least("t1", "t2", "t3"),
            )
        )
        .unionAll(
            test.select(
                F.lit("inverse_mse_combo"),
                F.lit(None).cast("double"),
                F.col("tc"),
                F.lit(None).cast("double"),
                F.least("t1", "t2", "t3"),
            )
        )
    )
    r4 = lambda cexpr: F.round(cexpr + F.lit(5e-10), 4)  # noqa: E731
    return rows.select(
        "model",
        r4(F.col("train_mse")).alias("train_mse"),
        r4(F.col("test_mse")).alias("test_mse"),
        r6(F.col("weight")).alias("weight"),
        (F.col("test_mse") <= F.col("best_single")).alias("beats_singles"),
    ).orderBy("model")
