"""Conformance queries batch #105 (q721+) — merger screening,
Procrustes alignment, importance sampling, curve similarity, and
supply-chain variance amplification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q721 — merger screen: diversion ratios, GUPPI and delta-HHI
# ---------------------------------------------------------------------------
# If the two biggest brands merged: diversion ratio from the
# second-choice shares of each brand's customers, GUPPI = diversion
# x margin x price ratio at a 40% gross margin, plus the HHI change
# — the antitrust first screen built on market shares (q275's HHI)
# and choice data (q506).
_Q721_ORACLE = """
    WITH li AS MATERIALIZED (
      SELECT o.o_custkey AS ck, p.p_brand AS b,
             ROUND(l.l_extendedprice * 100) AS rev
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
    ), shares AS MATERIALIZED (
      SELECT b, SUM(rev) AS r,
             SUM(rev) * 1.0 / SUM(SUM(rev)) OVER () AS s,
             ROW_NUMBER() OVER (ORDER BY SUM(rev) DESC, b) AS rk
      FROM li GROUP BY b
    ), top2 AS (
      SELECT MAX(CASE WHEN rk = 1 THEN b END) AS b1,
             MAX(CASE WHEN rk = 2 THEN b END) AS b2,
             MAX(CASE WHEN rk = 1 THEN s END) AS s1,
             MAX(CASE WHEN rk = 2 THEN s END) AS s2
      FROM shares
    ), cust1 AS MATERIALIZED (
      SELECT DISTINCT li.ck FROM li, top2 WHERE li.b = top2.b1
    ), div1 AS (
      SELECT SUM(CASE WHEN li.b = t.b2 THEN li.rev ELSE 0 END) * 1.0
               / SUM(CASE WHEN li.b <> t.b1 THEN li.rev ELSE 0 END) AS d12
      FROM li JOIN cust1 c ON c.ck = li.ck CROSS JOIN top2 t
    )
    SELECT t.b1 AS acquirer, t.b2 AS target,
           ROUND(t.s1 + 5e-12, 6) AS share_1,
           ROUND(t.s2 + 5e-12, 6) AS share_2,
           ROUND(d.d12 + 5e-12, 6) AS diversion_1_to_2,
           ROUND(d.d12 * CAST(0.4 AS DOUBLE) + 5e-12, 6) AS guppi_1,
           ROUND(2 * t.s1 * t.s2 * 1e4 + 5e-10, 4) AS delta_hhi,
           2 * t.s1 * t.s2 * 1e4 > 200 AS presumption_flag
    FROM top2 t, div1 d
"""


@register(
    "q721_merger_guppi",
    _Q721_ORACLE,
    doc="Merger screen for the two biggest brands: revenue shares, "
    "the diversion ratio from brand-1 customers' spending on brand "
    "2 among substitutes, GUPPI at 40% margin, and delta-HHI = "
    "2 s1 s2 against the 200-point presumption — antitrust's first "
    "pass on top of HHI (q275) and collusion screens (q621).",
)
def q721(spark: SparkSession, sf_dir: str) -> DataFrame:
    li0 = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (
        li0.join(F.broadcast(p), li0.l_partkey == p.p_partkey)
        .join(o, li0.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("ck"),
            F.col("p_brand").alias("b"),
            F.round(F.col("l_extendedprice") * 100).alias("rev"),
        )
        .localCheckpoint(eager=False)
    )
    wall = Window.partitionBy()
    shares = (
        li.groupBy("b")
        .agg(F.sum("rev").alias("r"))
        .select(
            "b",
            (F.col("r") * 1.0 / F.sum("r").over(wall)).alias("s"),
            F.row_number().over(Window.orderBy(F.desc("r"), "b")).alias("rk"),
        )
    )
    top2 = shares.agg(
        F.max(F.when(F.col("rk") == 1, F.col("b"))).alias("b1"),
        F.max(F.when(F.col("rk") == 2, F.col("b"))).alias("b2"),
        F.max(F.when(F.col("rk") == 1, F.col("s"))).alias("s1"),
        F.max(F.when(F.col("rk") == 2, F.col("s"))).alias("s2"),
    )
    cust1 = (
        li.crossJoin(F.broadcast(top2.select("b1")))
        .filter(F.col("b") == F.col("b1"))
        .select("ck")
        .distinct()
    )
    div1 = (
        li.join(cust1, "ck")
        .crossJoin(F.broadcast(top2))
        .agg(
            (
                F.sum(
                    F.when(F.col("b") == F.col("b2"), F.col("rev")).otherwise(0)
                )
                * 1.0
                / F.sum(
                    F.when(F.col("b") != F.col("b1"), F.col("rev")).otherwise(0)
                )
            ).alias("d12")
        )
    )
    return top2.crossJoin(F.broadcast(div1)).select(
        F.col("b1").alias("acquirer"),
        F.col("b2").alias("target"),
        r6(F.col("s1")).alias("share_1"),
        r6(F.col("s2")).alias("share_2"),
        r6(F.col("d12")).alias("diversion_1_to_2"),
        r6(F.col("d12") * 0.4).alias("guppi_1"),
        F.round(
            2 * F.col("s1") * F.col("s2") * 1e4 + F.lit(5e-10), 4
        ).alias("delta_hhi"),
        (2 * F.col("s1") * F.col("s2") * 1e4 > 200).alias(
            "presumption_flag"
        ),
    )


# ---------------------------------------------------------------------------
# Q722 — 2D orthogonal Procrustes on embedding coordinates
# ---------------------------------------------------------------------------
# Dimensions (1,2) of the first 200 embeddings aligned onto
# dimensions (3,4): the optimal 2D rotation has the closed form
# theta = atan2(sum(x1 y2 - x2 y1), sum(x1 y1 + x2 y2)) on centered
# coordinates, with the optimal scale and residual RMS — the
# alignment step of embedding-space comparison, beside JL
# projection (q491) and quantization (q493).
_Q722_ORACLE = """
    WITH pts AS MATERIALIZED (
      SELECT CAST(embedding[1] AS DOUBLE) AS x1,
             CAST(embedding[2] AS DOUBLE) AS x2,
             CAST(embedding[3] AS DOUBLE) AS y1,
             CAST(embedding[4] AS DOUBLE) AS y2
      FROM embeddings WHERE vec_id < 200
    ), m AS (
      SELECT AVG(x1) AS mx1, AVG(x2) AS mx2,
             AVG(y1) AS my1, AVG(y2) AS my2
      FROM pts
    ), cross_t AS (
      SELECT SUM((x1 - m.mx1) * (y1 - m.my1)
                 + (x2 - m.mx2) * (y2 - m.my2)) AS a,
             SUM((x1 - m.mx1) * (y2 - m.my2)
                 - (x2 - m.mx2) * (y1 - m.my1)) AS b,
             SUM(POW(x1 - m.mx1, 2) + POW(x2 - m.mx2, 2)) AS sx,
             SUM(POW(y1 - m.my1, 2) + POW(y2 - m.my2, 2)) AS sy,
             COUNT(*) AS n
      FROM pts, m GROUP BY m.mx1, m.mx2, m.my1, m.my2
    )
    SELECT CAST(n AS BIGINT) AS n_points,
           ROUND(ATAN2(b, a) + 5e-12, 6) AS rotation_radians,
           ROUND(SQRT(a * a + b * b) / sx + 5e-12, 6) AS optimal_scale,
           ROUND(SQRT(GREATEST(sy - (a * a + b * b) / sx, 0) / n)
                 + 5e-12, 6) AS residual_rms,
           ROUND(SQRT(a * a + b * b) / SQRT(sx * sy) + 5e-12, 6)
             AS alignment_correlation
    FROM cross_t
"""


@register(
    "q722_procrustes_2d",
    _Q722_ORACLE,
    doc="2D orthogonal Procrustes: embedding dims (1,2) aligned onto "
    "(3,4) with the closed-form rotation atan2(sum cross, sum dot) "
    "on centered points, optimal scale, residual RMS and the "
    "alignment correlation — the embedding-space comparison step "
    "beside JL projection (q491) and semantic dedup (q110).",
)
def q722(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    pts = emb.select(
        F.element_at("embedding", 1).cast("double").alias("x1"),
        F.element_at("embedding", 2).cast("double").alias("x2"),
        F.element_at("embedding", 3).cast("double").alias("y1"),
        F.element_at("embedding", 4).cast("double").alias("y2"),
    ).localCheckpoint(eager=False)
    m = pts.agg(
        F.avg("x1").alias("mx1"),
        F.avg("x2").alias("mx2"),
        F.avg("y1").alias("my1"),
        F.avg("y2").alias("my2"),
    )
    x1c = F.col("x1") - F.col("mx1")
    x2c = F.col("x2") - F.col("mx2")
    y1c = F.col("y1") - F.col("my1")
    y2c = F.col("y2") - F.col("my2")
    cross_t = pts.crossJoin(F.broadcast(m)).agg(
        F.sum(x1c * y1c + x2c * y2c).alias("a"),
        F.sum(x1c * y2c - x2c * y1c).alias("b"),
        F.sum(F.pow(x1c, 2) + F.pow(x2c, 2)).alias("sx"),
        F.sum(F.pow(y1c, 2) + F.pow(y2c, 2)).alias("sy"),
        F.count(F.lit(1)).alias("n"),
    )
    mag = F.sqrt(F.col("a") * F.col("a") + F.col("b") * F.col("b"))
    return cross_t.select(
        F.col("n").cast("bigint").alias("n_points"),
        r6(F.atan2(F.col("b"), F.col("a"))).alias("rotation_radians"),
        r6(mag / F.col("sx")).alias("optimal_scale"),
        r6(
            F.sqrt(
                F.greatest(
                    F.col("sy") - mag * mag / F.col("sx"), F.lit(0.0)
                )
                / F.col("n")
            )
        ).alias("residual_rms"),
        r6(mag / F.sqrt(F.col("sx") * F.col("sy"))).alias(
            "alignment_correlation"
        ),
    )


# ---------------------------------------------------------------------------
# Q723 — importance sampling for a rare tail probability
# ---------------------------------------------------------------------------
# P(U > 0.99) estimated two ways from 500 hash uniforms: the naive
# indicator average (a handful of hits) vs importance sampling from
# the proposal V = 0.99 + 0.01 U with constant weight 0.01 (exact
# density ratio) — same truth 0.01, two orders of magnitude less
# variance, the tilting trick beside antithetic pairs (q716).
_Q723_ORACLE = """
    WITH draws AS MATERIALIZED (
      SELECT g.i,
             ((g.i * 2654435761) % 4294967296) / 4294967296.0 AS u
      FROM (SELECT UNNEST(range(1, 501)) AS i) g
    ), est AS (
      SELECT AVG(CASE WHEN u > 0.99 THEN 1.0 ELSE 0 END) AS p_naive,
             AVG(CASE WHEN u > 0.99 THEN 1.0 ELSE 0 END)
               - AVG(CASE WHEN u > 0.99 THEN 1.0 ELSE 0 END)
                 * AVG(CASE WHEN u > 0.99 THEN 1.0 ELSE 0 END) AS var_naive,
             AVG(CASE WHEN 0.99 + 0.01 * u > 0.99
                      THEN CAST(0.01 AS DOUBLE) ELSE 0 END) AS p_is,
             COUNT(*) AS n
      FROM draws
    )
    SELECT CAST(n AS BIGINT) AS n_draws,
           ROUND(CAST(0.01 AS DOUBLE) + 5e-12, 6) AS true_probability,
           ROUND(p_naive + 5e-12, 6) AS estimate_naive,
           ROUND(p_is + 5e-12, 6) AS estimate_importance,
           ROUND(var_naive / n + 5e-12, 6) AS naive_variance,
           ABS(p_is - 0.01) < ABS(p_naive - 0.01) + 1e-12
             AS importance_at_least_as_close
    FROM est
"""


@register(
    "q723_importance_sampling",
    _Q723_ORACLE,
    doc="Importance sampling: P(U > 0.99) by naive indicators vs the "
    "tilted proposal 0.99 + 0.01U with exact constant weight 0.01 "
    "(zero-variance here), against truth 0.01 — the rare-event "
    "estimator beside antithetic variates (q716) and QMC (q473).",
)
def q723(spark: SparkSession, sf_dir: str) -> DataFrame:
    draws = spark.range(1, 501).select(
        F.col("id").alias("i"),
        (((F.col("id") * 2654435761) % 4294967296) / 4294967296.0).alias("u"),
    )
    hit = F.when(F.col("u") > 0.99, 1.0).otherwise(0.0)
    est = draws.agg(
        F.avg(hit).alias("p_naive"),
        (F.avg(hit) - F.avg(hit) * F.avg(hit)).alias("var_naive"),
        F.avg(
            F.when(0.99 + 0.01 * F.col("u") > 0.99, 0.01).otherwise(0.0)
        ).alias("p_is"),
        F.count(F.lit(1)).alias("n"),
    )
    return est.select(
        F.col("n").cast("bigint").alias("n_draws"),
        r6(F.lit(0.01)).alias("true_probability"),
        r6(F.col("p_naive")).alias("estimate_naive"),
        r6(F.col("p_is")).alias("estimate_importance"),
        r6(F.col("var_naive") / F.col("n")).alias("naive_variance"),
        (
            F.abs(F.col("p_is") - 0.01)
            < F.abs(F.col("p_naive") - 0.01) + 1e-12
        ).alias("importance_at_least_as_close"),
    )


# ---------------------------------------------------------------------------
# Q724 — discrete Fréchet distance between two revenue curves
# ---------------------------------------------------------------------------
# Nation blocs 0 and 1 as normalized daily revenue curves: the
# discrete Fréchet distance d[i][j] = max(|a_i - b_j|,
# min(d[i-1][j], d[i][j-1], d[i-1][j-1])) as a nested DP-row fold —
# the dog-walking curve metric whose max-min coupling DTW (q439)
# relaxes to a sum.
_Q724_ORACLE = """
    WITH nd AS MATERIALIZED (
      SELECT c.c_nationkey % 5 AS a, EXTRACT(day FROM e.ts) AS d,
             SUM(ROUND(e.value * 100)) AS rev
      FROM events e JOIN customer c ON c.c_custkey = e.user_id
      WHERE e.event_type = 'purchase' AND c.c_nationkey % 5 IN (0, 1)
      GROUP BY c.c_nationkey % 5, EXTRACT(day FROM e.ts)
    ), norm AS MATERIALIZED (
      SELECT a, d, rev * 1.0 / SUM(rev) OVER (PARTITION BY a) AS v
      FROM nd
    ), arrs AS (
      SELECT list(CASE WHEN a = 0 THEN v END ORDER BY d)
               FILTER (WHERE a = 0) AS asq,
             list(CASE WHEN a = 1 THEN v END ORDER BY d)
               FILTER (WHERE a = 1) AS bs
      FROM norm
    ), folded AS (
      SELECT len(asq) AS na, len(bs) AS nb,
             list_reduce(
               list_prepend(
                 list_concat([CAST(0 AS DOUBLE)],
                   list_transform(range(1, 1 + len(bs)),
                                  j -> CAST(1e18 AS DOUBLE))),
                 list_transform(asq, a -> [a])),
               (prev, xa) -> list_reduce(
                 list_prepend([CAST(1e18 AS DOUBLE)],
                   list_transform(range(1, 1 + len(bs)),
                                  j -> [CAST(j AS DOUBLE)])),
                 (row, xj) -> list_append(row,
                   GREATEST(ABS(xa[1] - bs[CAST(xj[1] AS BIGINT)]),
                     LEAST(prev[CAST(xj[1] AS BIGINT)],
                           prev[CAST(xj[1] AS BIGINT) + 1],
                           row[CAST(xj[1] AS BIGINT)]))))
             ) AS frow
      FROM arrs
    )
    SELECT CAST(na AS BIGINT) AS len_a,
           CAST(nb AS BIGINT) AS len_b,
           ROUND(frow[nb + 1] + 5e-12, 6) AS frechet_distance,
           ROUND(frow[nb + 1] * 30 + 5e-10, 4) AS frechet_x30
    FROM folded
"""


@register(
    "q724_frechet_curve",
    _Q724_ORACLE,
    doc="Discrete Fréchet distance between bloc-0 and bloc-1 "
    "normalized daily revenue curves: the max-min coupling DP as a "
    "nested row fold (first row seeded from the origin, 1e18 "
    "sentinels elsewhere) — the dog-walk curve metric that DTW "
    "(q439) relaxes, beside matrix profile (q287).",
)
def q724(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nd = (
        ev.join(F.broadcast(c), ev.user_id == c.c_custkey)
        .filter((F.col("c_nationkey") % 5).isin(0, 1))
        .groupBy(
            (F.col("c_nationkey") % 5).alias("a"), F.dayofmonth("ts").alias("d")
        )
        .agg(F.sum(F.round(F.col("value") * 100)).alias("rev"))
    )
    norm = nd.select(
        "a",
        "d",
        (
            F.col("rev") * 1.0 / F.sum("rev").over(Window.partitionBy("a"))
        ).alias("v"),
    )
    arrs = norm.agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("a") == 0, F.struct("d", "v"))
                )
            ),
            lambda s: s["v"],
        ).alias("asq"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("a") == 1, F.struct("d", "v"))
                )
            ),
            lambda s: s["v"],
        ).alias("bs"),
    )
    fold = (
        "aggregate(transform(asq, a -> array(a)), "
        "concat(array(CAST(0 AS DOUBLE)), "
        "transform(sequence(1, size(bs)), j -> CAST(1e18 AS DOUBLE))), "
        "(prev, xa) -> aggregate("
        "transform(sequence(1, size(bs)), j -> array(CAST(j AS DOUBLE))), "
        "array(CAST(1e18 AS DOUBLE)), "
        "(row, xj) -> concat(row, array("
        "greatest(abs(element_at(xa, 1) "
        "- element_at(bs, CAST(element_at(xj, 1) AS INT))), "
        "least(element_at(prev, CAST(element_at(xj, 1) AS INT)), "
        "element_at(prev, CAST(element_at(xj, 1) AS INT) + 1), "
        "element_at(row, CAST(element_at(xj, 1) AS INT))))))))"
    )
    folded = arrs.select(
        F.size("asq").alias("na"),
        F.size("bs").alias("nb"),
        F.expr(fold).alias("frow"),
    )
    fd = F.element_at("frow", F.col("nb") + 1)
    return folded.select(
        F.col("na").cast("bigint").alias("len_a"),
        F.col("nb").cast("bigint").alias("len_b"),
        r6(fd).alias("frechet_distance"),
        F.round(fd * 30 + F.lit(5e-10), 4).alias("frechet_x30"),
    )


# ---------------------------------------------------------------------------
# Q725 — bullwhip effect: variance amplification up the chain
# ---------------------------------------------------------------------------
# Daily purchase counts as consumer demand; a retailer ordering in
# 3-day batches and a distributor in 6-day batches: per-day variance
# of each stage's order stream over demand variance is the bullwhip
# ratio — Forrester's amplification, measured rather than simulated,
# beside inventory policy (q470) and risk pooling (q613).
_Q725_ORACLE = """
    WITH demand AS MATERIALIZED (
      SELECT CAST(EXTRACT(day FROM ts) AS BIGINT) AS d, COUNT(*) AS q
      FROM events WHERE event_type = 'purchase'
      GROUP BY EXTRACT(day FROM ts)
    ), staged AS MATERIALIZED (
      SELECT d, q,
             CAST(FLOOR((d - 1) / 3) AS BIGINT) AS w3,
             CAST(FLOOR((d - 1) / 6) AS BIGINT) AS w6
      FROM demand
    ), retail AS (
      SELECT w3, SUM(q) * 1.0 / COUNT(*) AS per_day FROM staged GROUP BY w3
    ), distrib AS (
      SELECT w6, SUM(q) * 1.0 / COUNT(*) AS per_day FROM staged GROUP BY w6
    ), vars AS (
      SELECT (SELECT AVG(q * q * 1.0) - AVG(q * 1.0) * AVG(q * 1.0)
              FROM demand) AS v0,
             (SELECT AVG(per_day * per_day) - AVG(per_day) * AVG(per_day)
              FROM retail) AS v3,
             (SELECT AVG(per_day * per_day) - AVG(per_day) * AVG(per_day)
              FROM distrib) AS v6
    )
    SELECT ROUND(v0 + 5e-10, 4) AS demand_variance,
           ROUND(v3 + 5e-10, 4) AS retail_batch_variance,
           ROUND(v6 + 5e-10, 4) AS distributor_batch_variance,
           ROUND(v3 / v0 + 5e-12, 6) AS bullwhip_retail,
           ROUND(v6 / v0 + 5e-12, 6) AS bullwhip_distributor,
           v3 / v0 < 1 AND v6 / v0 < v3 / v0 + 1
             AS batching_smooths_here
    FROM vars
"""


@register(
    "q725_bullwhip_ratio",
    _Q725_ORACLE,
    doc="Bullwhip measurement: daily purchase demand vs 3-day retail "
    "and 6-day distributor batch orders (per-day normalized), "
    "variance ratios up the chain — Forrester's amplification "
    "metric beside inventory policy (q470), risk pooling (q613) "
    "and EOQ (q586).",
)
def q725(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    demand = e.groupBy(
        F.dayofmonth("ts").cast("bigint").alias("d")
    ).agg(F.count(F.lit(1)).alias("q")).localCheckpoint(eager=False)
    staged = demand.select(
        "d",
        "q",
        F.floor((F.col("d") - 1) / 3).alias("w3"),
        F.floor((F.col("d") - 1) / 6).alias("w6"),
    )

    def stage_var(col: str):
        return (
            staged.groupBy(col)
            .agg((F.sum("q") * 1.0 / F.count(F.lit(1))).alias("per_day"))
            .agg(
                (
                    F.avg(F.col("per_day") * F.col("per_day"))
                    - F.avg("per_day") * F.avg("per_day")
                ).alias(f"v_{col}")
            )
        )

    v0 = demand.agg(
        (
            F.avg(F.col("q") * F.col("q") * 1.0)
            - F.avg(F.col("q") * 1.0) * F.avg(F.col("q") * 1.0)
        ).alias("v0")
    )
    v3 = stage_var("w3")
    v6 = stage_var("w6")
    return (
        v0.crossJoin(F.broadcast(v3))
        .crossJoin(F.broadcast(v6))
        .select(
            F.round(F.col("v0") + F.lit(5e-10), 4).alias("demand_variance"),
            F.round(F.col("v_w3") + F.lit(5e-10), 4).alias(
                "retail_batch_variance"
            ),
            F.round(F.col("v_w6") + F.lit(5e-10), 4).alias(
                "distributor_batch_variance"
            ),
            r6(F.col("v_w3") / F.col("v0")).alias("bullwhip_retail"),
            r6(F.col("v_w6") / F.col("v0")).alias("bullwhip_distributor"),
            (
                (F.col("v_w3") / F.col("v0") < 1)
                & (
                    F.col("v_w6") / F.col("v0")
                    < F.col("v_w3") / F.col("v0") + 1
                )
            ).alias("batching_smooths_here"),
        )
    )
