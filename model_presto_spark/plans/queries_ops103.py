"""Conformance queries batch #103 (q711+) — Poisson-binomial exact
distributions, spatial interpolation, tolerance intervals, record
statistics, and nonlinear pricing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q711 — exact Poisson-binomial distribution by DP fold
# ---------------------------------------------------------------------------
# Each nation's purchase-conversion rate is a heterogeneous
# Bernoulli; the exact distribution of how many nations convert
# comes from the DP new[k] = old[k](1-p) + old[k-1] p folded over
# the 25 probabilities — the exact law behind k-of-n reliability
# and cohort-count forecasts that a normal approximation mangles.
def _pb_fold(dialect: str) -> str:
    if dialect == "duck":
        return (
            "list_reduce(list_prepend("
            "list_concat([CAST(1 AS DOUBLE)], "
            "list_transform(range(1, 26), z -> CAST(0 AS DOUBLE))), "
            "list_transform(ps, p -> [p])), "
            "(acc, x) -> list_transform(range(1, 27), "
            "j -> acc[CAST(j AS BIGINT)] * (1 - x[1]) "
            "+ (CASE WHEN j > 1 THEN acc[CAST(j AS BIGINT) - 1] "
            "ELSE 0 END) * x[1]))"
        )
    return (
        "aggregate(transform(ps, p -> array(p)), "
        "concat(array(CAST(1 AS DOUBLE)), "
        "transform(sequence(1, 25), z -> CAST(0 AS DOUBLE))), "
        "(acc, x) -> transform(sequence(1, 26), "
        "j -> element_at(acc, j) * (1 - element_at(x, 1)) "
        "+ (CASE WHEN j > 1 THEN element_at(acc, j - 1) "
        "ELSE CAST(0 AS DOUBLE) END) * element_at(x, 1)))"
    )


_Q711_ORACLE = f"""
    WITH conv AS MATERIALIZED (
      SELECT c.c_nationkey AS nk,
             AVG(CASE WHEN p.u IS NOT NULL THEN 1.0 ELSE 0 END) AS pr
      FROM customer c
      LEFT JOIN (SELECT DISTINCT user_id AS u FROM events
                 WHERE event_type = 'purchase') p ON p.u = c.c_custkey
      GROUP BY c.c_nationkey
    ), arr AS (
      SELECT list(pr ORDER BY nk) AS ps,
             SUM(pr) AS mu, SUM(pr * (1 - pr)) AS vr
      FROM conv
    ), dist AS MATERIALIZED (
      SELECT mu, vr, {_pb_fold('duck')} AS d
      FROM arr
    ), modal AS (
      SELECT g.k, dist.d[g.k + 1] AS pk
      FROM dist CROSS JOIN (SELECT UNNEST(range(0, 26)) AS k) g
      ORDER BY ROUND(dist.d[g.k + 1] + 5e-12, 6) DESC, g.k LIMIT 1
    )
    SELECT ROUND(dist.mu + 5e-12, 6) AS mean_conversions,
           ROUND(dist.vr + 5e-12, 6) AS variance,
           ROUND({" + ".join(f"dist.d[{k}]" for k in range(14, 27))}
                 + 5e-12, 6) AS p_at_least_13,
           CAST(m.k AS BIGINT) AS modal_count,
           ROUND(m.pk + 5e-12, 6) AS modal_probability,
           ABS({" + ".join(f"dist.d[{k}]" for k in range(1, 27))} - 1)
             < 1e-9 AS distribution_sums_to_one
    FROM dist, modal m
"""


@register(
    "q711_poisson_binomial",
    _Q711_ORACLE,
    doc="Exact Poisson-binomial: 25 nation conversion rates folded "
    "through the DP new[k] = old[k](1-p) + old[k-1]p, tail "
    "P(K >= 13), mode, and the sums-to-one invariant — the exact "
    "heterogeneous-trials law behind k-of-n reliability, beyond "
    "the binomial tails of q669.",
)
def q711(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    e = _t(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select(F.col("user_id").alias("u")).distinct()
    conv = (
        c.join(e, c.c_custkey == e.u, "left")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.avg(
                F.when(F.col("u").isNotNull(), 1.0).otherwise(0.0)
            ).alias("pr")
        )
    )
    arr = conv.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("nk", "pr"))),
            lambda s: s["pr"],
        ).alias("ps"),
        F.sum("pr").alias("mu"),
        F.sum(F.col("pr") * (1 - F.col("pr"))).alias("vr"),
    )
    dist = arr.select(
        "mu", "vr", F.expr(_pb_fold("spark")).alias("d")
    ).localCheckpoint(eager=False)
    grid = spark.range(0, 26).select(F.col("id").cast("int").alias("k"))
    modal = (
        dist.crossJoin(F.broadcast(grid))
        .select(
            "k", F.element_at("d", F.col("k") + 1).alias("pk")
        )
        .orderBy(r6(F.col("pk")).desc(), "k")
        .limit(1)
    )
    de = lambda k: F.element_at("d", k)  # noqa: E731
    tail = sum((de(k) for k in range(15, 27)), de(14))
    total = sum((de(k) for k in range(2, 27)), de(1))
    return dist.crossJoin(F.broadcast(modal)).select(
        r6(F.col("mu")).alias("mean_conversions"),
        r6(F.col("vr")).alias("variance"),
        r6(tail).alias("p_at_least_13"),
        F.col("k").cast("bigint").alias("modal_count"),
        r6(F.col("pk")).alias("modal_probability"),
        (F.abs(total - 1) < 1e-9).alias("distribution_sums_to_one"),
    )


# ---------------------------------------------------------------------------
# Q712 — inverse-distance-weighted spatial interpolation
# ---------------------------------------------------------------------------
# Twenty customer "stations" on a 10x10 grid (balance decile x key
# digit) with spend as the field value, interpolated at four fixed
# query points by IDW with w = 1/(d^2 + 0.01); the participation
# ratio (sum w)^2 / sum w^2 reports how many stations effectively
# contribute — the baseline spatial interpolator under hexbins
# (q228) and grid pipelines (q57).
_Q712_ORACLE = """
    WITH sta AS MATERIALIZED (
      SELECT CAST(NTILE(10) OVER (ORDER BY c.c_acctbal, c.c_custkey) - 1
                  AS DOUBLE) AS x,
             CAST(c.c_custkey % 10 AS DOUBLE) AS y,
             COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0) / 1e6 AS v
      FROM (SELECT c_custkey, c_acctbal,
                   ROW_NUMBER() OVER (ORDER BY c_custkey) AS rn
            FROM customer) c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      WHERE c.rn <= 20
      GROUP BY c.c_custkey, c.c_acctbal
    ), qpts AS (
      SELECT * FROM (VALUES
        (CAST(2.5 AS DOUBLE), CAST(2.5 AS DOUBLE)),
        (2.5, 7.5), (7.5, 2.5), (7.5, 7.5)) AS t(qx, qy)
    ), wgt AS (
      SELECT q.qx, q.qy,
             SUM(s.v / (POW(s.x - q.qx, 2) + POW(s.y - q.qy, 2) + 0.01))
               AS num,
             SUM(1 / (POW(s.x - q.qx, 2) + POW(s.y - q.qy, 2) + 0.01))
               AS den,
             POW(SUM(1 / (POW(s.x - q.qx, 2) + POW(s.y - q.qy, 2)
                          + 0.01)), 2)
               / SUM(POW(1 / (POW(s.x - q.qx, 2) + POW(s.y - q.qy, 2)
                              + 0.01), 2)) AS eff_n
      FROM qpts q CROSS JOIN sta s
      GROUP BY q.qx, q.qy
    )
    SELECT ROUND(qx + 5e-12, 6) AS qx,
           ROUND(qy + 5e-12, 6) AS qy,
           ROUND(num / den + 5e-12, 6) AS idw_estimate,
           ROUND(eff_n + 5e-12, 6) AS effective_stations
    FROM wgt
    ORDER BY qx, qy
"""


@register(
    "q712_idw_interpolation",
    _Q712_ORACLE,
    doc="Inverse-distance-weighted interpolation: 20 customer "
    "stations on a (balance decile, key digit) grid, spend field "
    "interpolated at four query points with w = 1/(d^2 + 0.01) and "
    "the effective-station participation ratio — the baseline "
    "spatial estimator beside hexbin (q228) and terrain (q47).",
)
def q712(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    sta = (
        # first-20-by-key via TakeOrderedAndProject, not a global window
        c.select("c_custkey", "c_acctbal")
        .orderBy("c_custkey")
        .limit(20)
        .join(o, F.col("c_custkey") == o.o_custkey, "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            (
                F.coalesce(F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0))
                / 1e6
            ).alias("v")
        )
        .select(
            (
                F.ntile(10).over(Window.orderBy("c_acctbal", "c_custkey")) - 1
            )
            .cast("double")
            .alias("x"),
            (F.col("c_custkey") % 10).cast("double").alias("y"),
            "v",
        )
    )
    qpts = spark.createDataFrame(
        [(2.5, 2.5), (2.5, 7.5), (7.5, 2.5), (7.5, 7.5)], ["qx", "qy"]
    )
    d2 = (
        F.pow(F.col("x") - F.col("qx"), 2)
        + F.pow(F.col("y") - F.col("qy"), 2)
        + 0.01
    )
    wgt = (
        F.broadcast(qpts)
        .crossJoin(sta)
        .groupBy("qx", "qy")
        .agg(
            F.sum(F.col("v") / d2).alias("num"),
            F.sum(1 / d2).alias("den"),
            (
                F.pow(F.sum(1 / d2), 2) / F.sum(F.pow(1 / d2, 2))
            ).alias("eff_n"),
        )
    )
    return wgt.select(
        r6(F.col("qx")).alias("qx"),
        r6(F.col("qy")).alias("qy"),
        r6(F.col("num") / F.col("den")).alias("idw_estimate"),
        r6(F.col("eff_n")).alias("effective_stations"),
    ).orderBy("qx", "qy")


# ---------------------------------------------------------------------------
# Q713 — nonparametric tolerance interval from order statistics
# ---------------------------------------------------------------------------
# The first 500 order prices: [min, max] is a distribution-free
# tolerance interval whose confidence of covering 90% of the
# population is exactly 1 - n p^(n-1) + (n-1) p^n; the one-sided
# max covers the 90th percentile with confidence 1 - p^n —
# guarantees about the POPULATION, which a confidence interval
# (q365) never gives.
_Q713_ORACLE = """
    WITH v AS MATERIALIZED (
      SELECT ROUND(o_totalprice * 100) / 100 AS x
      FROM (SELECT o_totalprice,
                   ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
            FROM orders)
      WHERE rn <= 500
    ), s AS (
      SELECT COUNT(*) AS n, MIN(x) AS lo, MAX(x) AS hi FROM v
    )
    SELECT CAST(n AS BIGINT) AS n_sample,
           ROUND(lo + 5e-10, 4) AS tolerance_lower,
           ROUND(hi + 5e-10, 4) AS tolerance_upper,
           ROUND(CAST(0.9 AS DOUBLE) + 5e-12, 6) AS content,
           ROUND(1 - n * POW(0.9, n - 1) + (n - 1) * POW(0.9, n)
                 + 5e-12, 6) AS conf_two_sided,
           ROUND(1 - POW(0.9, n) + 5e-12, 6) AS conf_one_sided_upper,
           1 - n * POW(0.9, n - 1) + (n - 1) * POW(0.9, n) > 0.95
             AS meets_95pct_confidence
    FROM s
"""


@register(
    "q713_tolerance_interval",
    _Q713_ORACLE,
    doc="Distribution-free tolerance interval: [min, max] of 500 "
    "order prices covers 90% of the population with exact "
    "confidence 1 - n p^(n-1) + (n-1) p^n (one-sided 1 - p^n) — "
    "population-content guarantees beside the parameter-targeting "
    "bootstrap CI (q365) and DKW bands (q271).",
)
def q713(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    v = (
        # first-500-by-key via TakeOrderedAndProject, not a global window
        o.select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(500)
        .select((F.round(F.col("o_totalprice") * 100) / 100).alias("x"))
    )
    s = v.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("x").alias("lo"),
        F.max("x").alias("hi"),
    )
    n = F.col("n")
    conf2 = 1 - n * F.pow(F.lit(0.9), n - 1) + (n - 1) * F.pow(F.lit(0.9), n)
    return s.select(
        n.cast("bigint").alias("n_sample"),
        F.round(F.col("lo") + F.lit(5e-10), 4).alias("tolerance_lower"),
        F.round(F.col("hi") + F.lit(5e-10), 4).alias("tolerance_upper"),
        r6(F.lit(0.9)).alias("content"),
        r6(conf2).alias("conf_two_sided"),
        r6(1 - F.pow(F.lit(0.9), n)).alias("conf_one_sided_upper"),
        (conf2 > 0.95).alias("meets_95pct_confidence"),
    )


# ---------------------------------------------------------------------------
# Q714 — record-breaking statistics of daily revenue
# ---------------------------------------------------------------------------
# Under exchangeability the t-th day is a running record with
# probability 1/t, so records total H_n in expectation with
# variance H_n - H_n^(2): the observed record count z-scored
# against that law tests for trend without any distributional
# assumption — record theory beside Mann-Kendall (q248) and
# streaks (q116).
_Q714_ORACLE = """
    WITH daily AS MATERIALIZED (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t, x, d
      FROM (SELECT EXTRACT(day FROM ts) AS d,
                   SUM(ROUND(value * 100)) AS x
            FROM events GROUP BY EXTRACT(day FROM ts))
    ), rec AS MATERIALIZED (
      SELECT t, d, x,
             CASE WHEN x > COALESCE(MAX(x) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), -1e18) THEN 1 ELSE 0 END AS is_rec
      FROM daily
    ), harm AS (
      SELECT SUM(1.0 / g.i) AS h1, SUM(1.0 / (g.i * g.i)) AS h2
      FROM (SELECT UNNEST(range(1, 1 + (SELECT COUNT(*) FROM daily)))
              AS i) g
    )
    SELECT CAST(nd.nn AS BIGINT) AS n_days,
           CAST(SUM(is_rec) AS BIGINT) AS records_observed,
           ROUND(h.h1 + 5e-12, 6) AS records_expected,
           ROUND(h.h1 - h.h2 + 5e-12, 6) AS records_variance,
           ROUND((SUM(is_rec) - h.h1) / SQRT(h.h1 - h.h2) + 5e-12, 6)
             AS z_score,
           CAST(MAX(CASE WHEN is_rec = 1 THEN d END) AS BIGINT)
             AS last_record_day,
           ABS((SUM(is_rec) - h.h1) / SQRT(h.h1 - h.h2)) < 2
             AS consistent_with_iid
    FROM rec, harm h, (SELECT COUNT(*) AS nn FROM daily) nd
    GROUP BY h.h1, h.h2, nd.nn
"""


@register(
    "q714_record_counts",
    _Q714_ORACLE,
    doc="Record-breaking statistics: running-max records of daily "
    "revenue vs the exchangeable law (expectation H_n, variance "
    "H_n - H_n^(2)), z-scored — the assumption-free trend test "
    "beside Mann-Kendall (q248), streaks (q116) and Gumbel maxima "
    "(q238).",
)
def q714(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100)).alias("x")
    ).select(
        F.row_number().over(Window.orderBy("d")).alias("t"), "x", "d"
    ).localCheckpoint(eager=False)
    wprev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    rec = daily.select(
        "t",
        "d",
        F.when(
            F.col("x")
            > F.coalesce(F.max("x").over(wprev), F.lit(-1e18)),
            1,
        )
        .otherwise(0)
        .alias("is_rec"),
    )
    nd = daily.agg(F.count(F.lit(1)).alias("nn"))
    harm = (
        spark.range(1, 200)
        .select(F.col("id").alias("i"))
        .crossJoin(F.broadcast(nd))
        .filter(F.col("i") <= F.col("nn"))
        .agg(
            F.sum(1.0 / F.col("i")).alias("h1"),
            F.sum(1.0 / (F.col("i") * F.col("i"))).alias("h2"),
        )
    )
    z = (F.sum("is_rec") - F.col("h1")) / F.sqrt(F.col("h1") - F.col("h2"))
    return (
        rec.crossJoin(F.broadcast(harm))
        .crossJoin(F.broadcast(nd))
        .groupBy("h1", "h2", "nn")
        .agg(
            F.sum("is_rec").cast("bigint").alias("records_observed"),
            F.max(F.when(F.col("is_rec") == 1, F.col("d")))
            .cast("bigint")
            .alias("last_record_day"),
        )
        .select(
            F.col("nn").cast("bigint").alias("n_days"),
            "records_observed",
            r6(F.col("h1")).alias("records_expected"),
            r6(F.col("h1") - F.col("h2")).alias("records_variance"),
            r6(
                (F.col("records_observed") - F.col("h1"))
                / F.sqrt(F.col("h1") - F.col("h2"))
            ).alias("z_score"),
            "last_record_day",
            (
                F.abs(
                    (F.col("records_observed") - F.col("h1"))
                    / F.sqrt(F.col("h1") - F.col("h2"))
                )
                < 2
            ).alias("consistent_with_iid"),
        )
        .select(
            "n_days",
            "records_observed",
            "records_expected",
            "records_variance",
            "z_score",
            "last_record_day",
            "consistent_with_iid",
        )
    )


# ---------------------------------------------------------------------------
# Q715 — two-part tariff vs linear monopoly pricing
# ---------------------------------------------------------------------------
# On the q690 linear demand fit with marginal cost 0.6 of the mean
# price: the linear monopoly price (bc - a)/(2b) and its profit vs
# the two-part tariff that prices at cost and charges the full
# consumer surplus as an entry fee — why subscriptions beat
# markups, completing the welfare triangle (q690) and monopoly
# price (q517).
_Q715_ORACLE = """
    WITH dem AS MATERIALIZED (
      SELECT ROUND(p.p_retailprice) AS price, SUM(l.l_quantity) AS q
      FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
      GROUP BY ROUND(p.p_retailprice)
    ), fit AS (
      SELECT AVG(price) AS mp, AVG(q) AS mq,
             (SUM(price * q) - COUNT(*) * AVG(price) * AVG(q))
               / (SUM(price * price)
                  - COUNT(*) * AVG(price) * AVG(price)) AS b
      FROM dem
    ), econ AS (
      SELECT mp, b, mq - b * mp AS a, 0.6 * mp AS c
      FROM fit
    ), prices AS (
      SELECT a, b, c,
             CASE WHEN b < 0 THEN (b * c - a) / (2 * b) END AS p_lin,
             CASE WHEN b < 0 THEN a + b * c END AS q_cost
      FROM econ
    )
    SELECT ROUND(c + 5e-10, 4) AS marginal_cost,
           ROUND(p_lin + 5e-10, 4) AS linear_price,
           ROUND(CASE WHEN b < 0
                      THEN (p_lin - c) * (a + b * p_lin) END + 5e-10, 4)
             AS linear_profit,
           ROUND(CASE WHEN b < 0
                      THEN q_cost * q_cost / (2 * (-b)) END + 5e-10, 4)
             AS twopart_profit,
           ROUND(CASE WHEN b < 0 AND (p_lin - c) * (a + b * p_lin) > 0
                      THEN q_cost * q_cost / (2 * (-b))
                           / ((p_lin - c) * (a + b * p_lin)) END
                 + 5e-12, 6) AS profit_ratio,
           b < 0 AS demand_admissible
    FROM prices
"""


@register(
    "q715_two_part_tariff",
    _Q715_ORACLE,
    doc="Two-part tariff vs linear monopoly on the fitted linear "
    "demand: monopoly price (bc - a)/(2b) and profit vs pricing at "
    "marginal cost and charging consumer surplus as the fee (the "
    "2x profit bound for linear demand) — why subscriptions beat "
    "markups, completing q690's welfare triangle and q517's "
    "monopoly price.",
)
def q715(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    dem = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.round("p_retailprice").alias("price"))
        .agg(F.sum("l_quantity").alias("q"))
    )
    n = F.count(F.lit(1))
    fit = dem.agg(
        F.avg("price").alias("mp"),
        F.avg("q").alias("mq"),
        (
            (F.sum(F.col("price") * F.col("q")) - n * F.avg("price") * F.avg("q"))
            / (
                F.sum(F.col("price") * F.col("price"))
                - n * F.avg("price") * F.avg("price")
            )
        ).alias("b"),
    )
    econ = fit.select(
        "mp",
        "b",
        (F.col("mq") - F.col("b") * F.col("mp")).alias("a"),
        (0.6 * F.col("mp")).alias("c"),
    )
    down = F.col("b") < 0
    prices = econ.select(
        "a",
        "b",
        "c",
        F.when(
            down, (F.col("b") * F.col("c") - F.col("a")) / (2 * F.col("b"))
        ).alias("p_lin"),
        F.when(down, F.col("a") + F.col("b") * F.col("c")).alias("q_cost"),
    )
    lin_profit = F.when(
        down,
        (F.col("p_lin") - F.col("c"))
        * (F.col("a") + F.col("b") * F.col("p_lin")),
    )
    tp_profit = F.when(
        down, F.col("q_cost") * F.col("q_cost") / (2 * (-F.col("b")))
    )
    return prices.select(
        F.round(F.col("c") + F.lit(5e-10), 4).alias("marginal_cost"),
        F.round(F.col("p_lin") + F.lit(5e-10), 4).alias("linear_price"),
        F.round(lin_profit + F.lit(5e-10), 4).alias("linear_profit"),
        F.round(tp_profit + F.lit(5e-10), 4).alias("twopart_profit"),
        r6(
            F.when(
                down
                & (
                    (F.col("p_lin") - F.col("c"))
                    * (F.col("a") + F.col("b") * F.col("p_lin"))
                    > 0
                ),
                (F.col("q_cost") * F.col("q_cost") / (2 * (-F.col("b"))))
                / (
                    (F.col("p_lin") - F.col("c"))
                    * (F.col("a") + F.col("b") * F.col("p_lin"))
                ),
            )
        ).alias("profit_ratio"),
        down.alias("demand_admissible"),
    )
