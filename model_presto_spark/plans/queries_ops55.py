"""Conformance queries batch #55 (q469+) — item-item collaborative
filtering, (s,S) inventory simulation, Hopkins clustering tendency,
triangular arbitrage detection, and quasi-Monte-Carlo integration.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q469 — item-item collaborative filtering (cosine co-purchase)
# ---------------------------------------------------------------------------
# Brand-level item-item CF: binary customer x brand baskets, cosine
# similarity from co-purchase counts (inverted-index pair join over
# shared customers, never an item cross product), then top-3
# recommendations for sampled customers by summed similarity to
# their basket, owned brands excluded.  The neighborhood-method
# recommender beside popularity (q382) and ALS (q277).
_Q469_ORACLE = """
    WITH basket AS (
      SELECT DISTINCT o.o_custkey AS u, p.p_brand AS i
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
    ), pop AS (
      SELECT i, COUNT(*) AS n FROM basket GROUP BY i
    ), sim AS (
      SELECT a.i AS i1, b.i AS i2,
             COUNT(*) / SQRT(pa.n * 1.0 * pb.n) AS s
      FROM basket a
      JOIN basket b ON b.u = a.u AND b.i <> a.i
      JOIN pop pa ON pa.i = a.i
      JOIN pop pb ON pb.i = b.i
      GROUP BY a.i, b.i, pa.n, pb.n
    ), sample_users AS (
      SELECT DISTINCT u FROM basket WHERE u % 1000 = 1
    ), scores AS (
      SELECT su.u, s.i2 AS rec, SUM(s.s) AS score
      FROM sample_users su
      JOIN basket b ON b.u = su.u
      JOIN sim s ON s.i1 = b.i
      WHERE NOT EXISTS (SELECT 1 FROM basket o
                        WHERE o.u = su.u AND o.i = s.i2)
      GROUP BY su.u, s.i2
    ), ranked AS (
      SELECT u, rec, score,
             ROW_NUMBER() OVER (PARTITION BY u
                                ORDER BY score DESC, rec) AS rk
      FROM scores
    )
    SELECT CAST(u AS BIGINT) AS custkey, CAST(rk AS BIGINT) AS rec_rank,
           rec AS brand, ROUND(score + 5e-12, 6) AS score
    FROM ranked WHERE rk <= 3 ORDER BY custkey, rec_rank
"""


@register(
    "q469_item_item_cf",
    _Q469_ORACLE,
    doc="Item-item collaborative filtering on customer x brand "
    "baskets: cosine similarities from an inverted-index co-purchase "
    "join (no item cross product), top-3 unowned recommendations "
    "per sampled customer by summed neighborhood similarity — the "
    "classic kNN recommender beside popularity (q382) and the ALS "
    "step (q277).",
)
def q469(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    basket = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(F.col("o_custkey").alias("u"), F.col("p_brand").alias("i"))
        .distinct()
        # lineage cut: basket feeds popularity, both co-occurrence
        # sides, the seed users, and the owned anti-join (plan audit:
        # 21 scans with persist-only lineage)
        .localCheckpoint(eager=False)
    )
    pop = basket.groupBy("i").agg(F.count(F.lit(1)).alias("n"))
    a = basket.select(F.col("u"), F.col("i").alias("i1"))
    b = basket.select(F.col("u"), F.col("i").alias("i2"))
    sim = (
        a.join(b, ["u"])
        .filter(F.col("i1") != F.col("i2"))
        .groupBy("i1", "i2")
        .agg(F.count(F.lit(1)).alias("co"))
        .join(F.broadcast(pop.select(F.col("i").alias("i1"), F.col("n").alias("na"))), "i1")
        .join(F.broadcast(pop.select(F.col("i").alias("i2"), F.col("n").alias("nb"))), "i2")
        .select(
            "i1",
            "i2",
            (F.col("co") / F.sqrt(F.col("na") * 1.0 * F.col("nb"))).alias("s"),
        )
    )
    su = basket.filter(F.col("u") % 1000 == 1)
    owned = basket.select(F.col("u").alias("ou"), F.col("i").alias("oi"))
    scores = (
        su.join(sim, su.i == sim.i1)
        .join(
            owned,
            (F.col("ou") == F.col("u")) & (F.col("oi") == F.col("i2")),
            "left_anti",
        )
        .groupBy("u", "i2")
        .agg(F.sum("s").alias("score"))
    )
    from pyspark.sql import Window

    ranked = scores.select(
        "u",
        F.col("i2").alias("rec"),
        "score",
        F.row_number()
        .over(Window.partitionBy("u").orderBy(F.desc("score"), "i2"))
        .alias("rk"),
    )
    return (
        ranked.filter(F.col("rk") <= 3)
        .select(
            F.col("u").cast("bigint").alias("custkey"),
            F.col("rk").cast("bigint").alias("rec_rank"),
            F.col("rec").alias("brand"),
            r6(F.col("score")).alias("score"),
        )
        .orderBy("custkey", "rec_rank")
    )


# ---------------------------------------------------------------------------
# Q470 — (s, S) inventory replenishment simulation
# ---------------------------------------------------------------------------
# Daily purchase demand replayed through a reorder-point policy:
# start at S, sell min(stock, demand), reorder back to S whenever
# the day ends below s.  One integer fold over the 28 day rows
# carrying [stock, orders, lost, sold, stock-days]; fill rate and
# average position come out exact — inventory dynamics without a
# simulator (newsvendor q417 sets the single-period bar).
_Q470_ORACLE = """
    WITH daily AS (
      SELECT CAST(EXTRACT(day FROM ts) AS BIGINT) AS d, COUNT(*) AS dem
      FROM events WHERE event_type = 'purchase' AND EXTRACT(day FROM ts) <= 28
      GROUP BY 1
    ), pol AS (
      SELECT CAST(SUM(dem) // COUNT(*) AS BIGINT) AS s,
             CAST(3 * (SUM(dem) // COUNT(*)) AS BIGINT) AS cap
      FROM daily
    ), ser AS (
      SELECT list([d, dem] ORDER BY d) AS days, pol.s, pol.cap
      FROM daily, pol GROUP BY pol.s, pol.cap
    ), sim AS (
      SELECT s, cap,
        list_reduce(
          list_prepend([cap, CAST(0 AS BIGINT), 0, 0, 0], days),
          (a, x) -> [
            CASE WHEN a[1] - LEAST(a[1], x[2]) < s THEN cap
                 ELSE a[1] - LEAST(a[1], x[2]) END,
            a[2] + CASE WHEN a[1] - LEAST(a[1], x[2]) < s THEN 1 ELSE 0 END,
            a[3] + x[2] - LEAST(a[1], x[2]),
            a[4] + LEAST(a[1], x[2]),
            a[5] + CASE WHEN a[1] - LEAST(a[1], x[2]) < s THEN cap
                        ELSE a[1] - LEAST(a[1], x[2]) END
          ]
        ) AS st
      FROM ser
    )
    SELECT CAST(s AS BIGINT) AS reorder_point,
           CAST(cap AS BIGINT) AS order_up_to,
           CAST(st[2] AS BIGINT) AS n_reorders,
           CAST(st[4] AS BIGINT) AS units_sold,
           CAST(st[3] AS BIGINT) AS units_lost,
           ROUND(st[4] * 1.0 / (st[4] + st[3]) + 5e-12, 6) AS fill_rate,
           ROUND(st[5] / 28.0 + 5e-10, 4) AS avg_end_stock
    FROM sim
"""


@register(
    "q470_inventory_policy_sim",
    _Q470_ORACLE,
    doc="(s, S) inventory policy replayed over daily demand as one "
    "integer fold (stock, reorders, lost, sold, stock-days in the "
    "accumulator): fill rate and average position exact — the "
    "multi-period inventory dynamics beside single-period "
    "newsvendor (q417) and EOQ-style aging (q345).",
)
def q470(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.dayofmonth("ts") <= 28)
    )
    daily = ev.groupBy(F.dayofmonth("ts").cast("bigint").alias("d")).agg(
        F.count(F.lit(1)).alias("dem")
    )
    ser = daily.agg(
        F.floor(F.sum("dem") / F.count(F.lit(1))).cast("bigint").alias("s"),
        F.sort_array(F.collect_list(F.struct("d", "dem"))).alias("days"),
    ).select("s", (3 * F.col("s")).alias("cap"), "days")
    zero = F.lit(0).cast("bigint")

    def step(a, x):
        stock = F.element_at(a, 1)
        sold = F.least(stock, x.dem)
        end = stock - sold
        reorder = end < F.col("s")
        newstock = F.when(reorder, F.col("cap")).otherwise(end)
        return F.array(
            newstock,
            F.element_at(a, 2) + F.when(reorder, 1).otherwise(0),
            F.element_at(a, 3) + x.dem - sold,
            F.element_at(a, 4) + sold,
            F.element_at(a, 5) + newstock,
        )

    sim = ser.select(
        "s",
        "cap",
        F.aggregate(
            F.col("days"),
            F.array(F.col("cap"), zero, zero, zero, zero),
            step,
        ).alias("st"),
    )
    return sim.select(
        F.col("s").cast("bigint").alias("reorder_point"),
        F.col("cap").cast("bigint").alias("order_up_to"),
        F.element_at("st", 2).cast("bigint").alias("n_reorders"),
        F.element_at("st", 4).cast("bigint").alias("units_sold"),
        F.element_at("st", 3).cast("bigint").alias("units_lost"),
        r6(
            F.element_at("st", 4)
            * 1.0
            / (F.element_at("st", 4) + F.element_at("st", 3))
        ).alias("fill_rate"),
        F.round(F.element_at("st", 5) / 28.0 + F.lit(5e-10), 4).alias(
            "avg_end_stock"
        ),
    )


# ---------------------------------------------------------------------------
# Q471 — Hopkins statistic (clustering tendency)
# ---------------------------------------------------------------------------
# Before clustering, test whether the (balance, spend) cloud differs
# from spatial randomness: nearest-real-neighbor distances from m
# hash-deterministic uniform probes (w) vs from m real points (x);
# H = w/(w+x) — 0.5 means Poisson-random, near 1 means clustered.
# Probes are multiplicative-hash uniforms in the bounding box, so
# the "random" half is reproducible in both engines.
_Q471_ORACLE = """
    WITH pts AS (
      SELECT c.c_custkey AS id, ROUND(c.c_acctbal * 100) AS x,
             COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0) / 1000.0 AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_acctbal
    ), bb AS (
      SELECT MIN(x) AS x0, MAX(x) AS x1, MIN(y) AS y0, MAX(y) AS y1 FROM pts
    ), probes AS (
      SELECT g.i,
             bb.x0 + (bb.x1 - bb.x0)
               * (((g.i * 2654435761) % 4294967296) / 4294967296.0) AS px,
             bb.y0 + (bb.y1 - bb.y0)
               * (((g.i * 40503 + 7) * 2654435761 % 4294967296)
                  / 4294967296.0) AS py
      FROM generate_series(1, 100) g(i), bb
    ), samp AS (
      SELECT id, x, y FROM pts WHERE id % 15 = 0
    ), w AS (
      SELECT SUM(mind) AS w FROM (
        SELECT p.i, MIN(SQRT((p.px - t.x) * (p.px - t.x)
                             + (p.py - t.y) * (p.py - t.y))) AS mind
        FROM probes p, pts t GROUP BY p.i
      )
    ), x AS (
      SELECT SUM(mind) AS x FROM (
        SELECT s.id, MIN(SQRT((s.x - t.x) * (s.x - t.x)
                              + (s.y - t.y) * (s.y - t.y))) AS mind
        FROM samp s JOIN pts t ON t.id <> s.id GROUP BY s.id
      )
    )
    SELECT CAST((SELECT COUNT(*) FROM pts) AS BIGINT) AS n_points,
           CAST((SELECT COUNT(*) FROM samp) AS BIGINT) AS n_sample,
           ROUND(w.w / 100.0 + 5e-10, 4) AS probe_nn_sum,
           ROUND(x.x / 100.0 + 5e-10, 4) AS real_nn_sum,
           ROUND(w.w / (w.w + x.x) + 5e-12, 6) AS hopkins_h
    FROM w, x
"""


@register(
    "q471_hopkins_statistic",
    _Q471_ORACLE,
    doc="Hopkins clustering-tendency statistic on the (balance, "
    "spend) cloud: nearest-real-neighbor sums from 100 hash-"
    "deterministic uniform probes vs 100 real points, H = w/(w+x) "
    "— the should-I-even-cluster pre-test for silhouette (q269) "
    "and DBSCAN (q142), with a reproducible 'random' half.",
)
def q471(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    pts = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            (
                F.coalesce(F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0))
                / 1000.0
            ).alias("y")
        )
        .select(
            F.col("c_custkey").alias("id"),
            F.round(F.col("c_acctbal") * 100).alias("x"),
            "y",
        )
        .localCheckpoint(eager=False)
    )
    bb = pts.agg(
        F.min("x").alias("x0"),
        F.max("x").alias("x1"),
        F.min("y").alias("y0"),
        F.max("y").alias("y1"),
    )
    g = spark.range(1, 101).select(F.col("id").alias("i"))
    probes = g.crossJoin(F.broadcast(bb)).select(
        "i",
        (
            F.col("x0")
            + (F.col("x1") - F.col("x0"))
            * (((F.col("i") * 2654435761) % 4294967296) / 4294967296.0)
        ).alias("px"),
        (
            F.col("y0")
            + (F.col("y1") - F.col("y0"))
            * (((F.col("i") * 40503 + 7) * 2654435761 % 4294967296) / 4294967296.0)
        ).alias("py"),
    )
    w = (
        probes.crossJoin(pts)
        .groupBy("i")
        .agg(
            F.min(
                F.sqrt(
                    (F.col("px") - F.col("x")) * (F.col("px") - F.col("x"))
                    + (F.col("py") - F.col("y")) * (F.col("py") - F.col("y"))
                )
            ).alias("mind")
        )
        .agg(F.sum("mind").alias("w"))
    )
    samp = pts.filter(F.col("id") % 15 == 0).select(
        F.col("id").alias("sid"), F.col("x").alias("sx"), F.col("y").alias("sy")
    )
    x = (
        samp.crossJoin(pts)
        .filter(F.col("id") != F.col("sid"))
        .groupBy("sid")
        .agg(
            F.min(
                F.sqrt(
                    (F.col("sx") - F.col("x")) * (F.col("sx") - F.col("x"))
                    + (F.col("sy") - F.col("y")) * (F.col("sy") - F.col("y"))
                )
            ).alias("mind")
        )
        .agg(F.sum("mind").alias("x"))
    )
    np_ = pts.agg(F.count(F.lit(1)).alias("n_points"))
    ns = samp.agg(F.count(F.lit(1)).alias("n_sample"))
    return (
        w.crossJoin(F.broadcast(x))
        .crossJoin(F.broadcast(np_))
        .crossJoin(F.broadcast(ns))
        .select(
            F.col("n_points").cast("bigint").alias("n_points"),
            F.col("n_sample").cast("bigint").alias("n_sample"),
            F.round(F.col("w") / 100.0 + F.lit(5e-10), 4).alias("probe_nn_sum"),
            F.round(F.col("x") / 100.0 + F.lit(5e-10), 4).alias("real_nn_sum"),
            r6(F.col("w") / (F.col("w") + F.col("x"))).alias("hopkins_h"),
        )
    )


# ---------------------------------------------------------------------------
# Q472 — triangular arbitrage detection on inconsistent rates
# ---------------------------------------------------------------------------
# Five nation "currencies" with asymmetric quote rules (balance
# ratios one way, spend ratios the other) generate an inconsistent
# rate matrix; summing log rates around every ordered 3-cycle after
# a 20bp fee finds the profitable triangles — negative-cycle
# detection (the Bellman-Ford arbitrage trick) as one triple join.
_Q472_ORACLE = """
    WITH nat AS (
      SELECT c.c_nationkey AS n,
             AVG(c.c_acctbal) AS bal,
             SUM(ROUND(o.o_totalprice * 100)) * 1.0 / COUNT(DISTINCT c.c_custkey)
               AS spend
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      WHERE c.c_nationkey < 5 GROUP BY c.c_nationkey
    ), rate AS (
      SELECT a.n AS i, b.n AS j,
             CASE WHEN a.n < b.n THEN a.bal / b.bal
                  ELSE a.spend / b.spend END * 0.998 AS r
      FROM nat a JOIN nat b ON b.n <> a.n
    ), tri AS (
      SELECT r1.i, r1.j, r2.j AS k,
             LN(r1.r) + LN(r2.r) + LN(r3.r) AS logp
      FROM rate r1
      JOIN rate r2 ON r2.i = r1.j AND r2.j <> r1.i
      JOIN rate r3 ON r3.i = r2.j AND r3.j = r1.i
    )
    SELECT CAST(i AS BIGINT) AS c1, CAST(j AS BIGINT) AS c2,
           CAST(k AS BIGINT) AS c3,
           ROUND(logp + 5e-12, 6) AS log_profit,
           ROUND((EXP(logp) - 1) * 10000 + 5e-10, 4) AS profit_bps
    FROM tri WHERE logp > 0
    ORDER BY log_profit DESC, c1, c2, c3 LIMIT 10
"""


@register(
    "q472_triangular_arbitrage",
    _Q472_ORACLE,
    doc="Triangular arbitrage on a deliberately inconsistent 5-"
    "currency rate matrix (balance-ratio quotes one way, spend-"
    "ratio the other, 20bp fee): log rates summed around all "
    "ordered 3-cycles, profitable triangles in bps — the negative-"
    "cycle arbitrage detection trick as a triple self-join.",
)
def q472(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 5)
    o = _t(spark, sf_dir, "orders")
    nat = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy(F.col("c_nationkey").alias("n"))
        .agg(
            F.avg("c_acctbal").alias("bal"),
            (
                F.sum(F.round(F.col("o_totalprice") * 100))
                * 1.0
                / F.count_distinct("c_custkey")
            ).alias("spend"),
        )
        # lineage cut: nat feeds both cross sides; rate feeds three
        # triangle legs (plan audit: 24 scans un-materialized)
        .localCheckpoint(eager=True)
    )
    a = nat.select(
        F.col("n").alias("i"), F.col("bal").alias("ba"), F.col("spend").alias("sa")
    )
    b = nat.select(
        F.col("n").alias("j"), F.col("bal").alias("bb"), F.col("spend").alias("sb")
    )
    rate = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("i") != F.col("j"))
        .select(
            "i",
            "j",
            (
                F.when(
                    F.col("i") < F.col("j"), F.col("ba") / F.col("bb")
                ).otherwise(F.col("sa") / F.col("sb"))
                * 0.998
            ).alias("r"),
        )
        .localCheckpoint(eager=True)
    )
    r1 = rate.select(F.col("i"), F.col("j"), F.col("r").alias("ra"))
    r2 = rate.select(
        F.col("i").alias("j2"), F.col("j").alias("k"), F.col("r").alias("rb")
    )
    r3 = rate.select(
        F.col("i").alias("k3"), F.col("j").alias("i3"), F.col("r").alias("rc")
    )
    tri = (
        r1.join(F.broadcast(r2), (F.col("j2") == F.col("j")) & (F.col("k") != F.col("i")))
        .join(
            F.broadcast(r3),
            (F.col("k3") == F.col("k")) & (F.col("i3") == F.col("i")),
        )
        .select(
            "i",
            "j",
            "k",
            (F.log("ra") + F.log("rb") + F.log("rc")).alias("logp"),
        )
    )
    return (
        tri.filter(F.col("logp") > 0)
        .select(
            F.col("i").cast("bigint").alias("c1"),
            F.col("j").cast("bigint").alias("c2"),
            F.col("k").cast("bigint").alias("c3"),
            r6(F.col("logp")).alias("log_profit"),
            F.round((F.exp("logp") - 1) * 10000 + F.lit(5e-10), 4).alias(
                "profit_bps"
            ),
        )
        .orderBy(F.desc("log_profit"), "c1", "c2", "c3")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q473 — quasi-Monte-Carlo integration (Hammersley / bit reversal)
# ---------------------------------------------------------------------------
# pi/4 estimated from the deterministic Hammersley point set
# (x = n/N, y = 20-bit van-der-Corput radical inverse of n, i.e. a
# bit reversal — unrolled shift/mask arithmetic): the error at
# N = 1k/16k/128k shrinks near O(log N / N), visibly beating the
# O(N^-1/2) Monte-Carlo rate, and every "random" point is exactly
# reproducible in both engines.
_Q473_VDC = " + ".join(
    f"(((n >> {i}) & 1) * {2.0 ** -(i + 1)!r})" for i in range(20)
)

_Q473_ORACLE = f"""
    WITH sizes AS (SELECT unnest([1024, 16384, 131072]) AS nn),
    pts AS (
      SELECT s.nn, g.n * 1.0 / s.nn AS x, ({_Q473_VDC}) AS y
      FROM sizes s, generate_series(0, 131071) g(n)
      WHERE g.n < s.nn
    ), est AS (
      SELECT nn,
             4.0 * SUM(CASE WHEN x * x + y * y <= 1.0 THEN 1 ELSE 0 END)
               / nn AS pi_est
      FROM pts GROUP BY nn
    )
    SELECT CAST(nn AS BIGINT) AS n_points,
           ROUND(pi_est + 5e-12, 6) AS pi_estimate,
           ROUND(ABS(pi_est - PI()) + 5e-12, 6) AS abs_error,
           ROUND(ABS(pi_est - PI()) * nn + 5e-10, 4) AS error_times_n
    FROM est ORDER BY n_points
"""


@register(
    "q473_quasi_monte_carlo",
    _Q473_ORACLE,
    doc="Quasi-Monte-Carlo pi from the Hammersley set: y = 20-bit "
    "van-der-Corput radical inverse as unrolled shift/mask bit "
    "reversal, quarter-circle indicator summed at N = 1k/16k/128k "
    "— error*N stays near O(log N), beating the sqrt-N Monte Carlo "
    "rate with fully deterministic 'random' points.",
)
def q473(spark: SparkSession, sf_dir: str) -> DataFrame:
    sizes = spark.createDataFrame(
        [(1024,), (16384,), (131072,)], "nn long"
    )
    g = spark.range(0, 131072).select(F.col("id").alias("n"))
    vdc = sum(
        F.shiftright(F.col("n"), i).bitwiseAND(1) * F.lit(2.0 ** -(i + 1))
        for i in range(20)
    )
    pts = g.crossJoin(F.broadcast(sizes)).filter(F.col("n") < F.col("nn")).select(
        "nn", (F.col("n") * 1.0 / F.col("nn")).alias("x"), vdc.alias("y")
    )
    est = pts.groupBy("nn").agg(
        (
            4.0
            * F.sum(
                F.when(F.col("x") * F.col("x") + F.col("y") * F.col("y") <= 1.0, 1)
                .otherwise(0)
            )
            / F.col("nn")
        ).alias("pi_est")
    )
    pi = F.lit(math.pi)
    return est.select(
        F.col("nn").cast("bigint").alias("n_points"),
        r6(F.col("pi_est")).alias("pi_estimate"),
        r6(F.abs(F.col("pi_est") - pi)).alias("abs_error"),
        F.round(F.abs(F.col("pi_est") - pi) * F.col("nn") + F.lit(5e-10), 4).alias(
            "error_times_n"
        ),
    ).orderBy("n_points")
