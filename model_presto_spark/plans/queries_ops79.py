"""Conformance queries batch #79 (q589+) — Gompertz growth fitting,
uneven-sampling periodogram, spectral bisection, the PC skeleton,
and the grouped jackknife.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q589 — Gompertz growth by double-log linearization
# ---------------------------------------------------------------------------
# Cumulative distinct purchasers by day as the adoption curve F(t):
# the Gompertz law F = exp(-b e^{-ct}) linearizes to
# ln(-ln F) = ln b - c t, fitted by OLS on interior days — growth
# law fitting beside Bass diffusion (q261), with R^2 and the
# implied inflection day ln(b)/c.
_Q589_ORACLE = """
    WITH firsts AS (
      SELECT user_id, MIN(EXTRACT(day FROM ts)) AS d0
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ), tot AS (SELECT COUNT(*) AS n FROM firsts
    ), curve AS (
      SELECT d0 AS d,
             SUM(COUNT(*)) OVER (ORDER BY d0) * 1.0
               / (SELECT n FROM tot) AS frac
      FROM firsts GROUP BY d0
    ), ll AS (
      SELECT d * 1.0 AS x, LN(-LN(frac)) AS y
      FROM curve WHERE frac > 0.01 AND frac < 0.99
    ), m AS (
      SELECT COUNT(*) AS k, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
      FROM ll
    )
    SELECT CAST(k AS BIGINT) AS n_days_fit,
           ROUND(-(k * sxy - sx * sy) / (k * sxx - sx * sx) + 5e-12, 6)
             AS gompertz_c,
           ROUND(EXP((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx)
                     / k) + 5e-12, 6) AS gompertz_b,
           ROUND((k * sxy - sx * sy) * (k * sxy - sx * sy)
                 / ((k * sxx - sx * sx) * (k * syy - sy * sy)) + 5e-12, 6)
             AS r2,
           ROUND(LN(EXP((sy - (k * sxy - sx * sy)
                         / (k * sxx - sx * sx) * sx) / k))
                 / (-(k * sxy - sx * sy) / (k * sxx - sx * sx))
                 + 5e-10, 4) AS inflection_day
    FROM m
"""


@register(
    "q589_gompertz_growth",
    _Q589_ORACLE,
    doc="Gompertz adoption fit: cumulative purchaser share linearized "
    "as ln(-ln F) = ln b - c t on interior days, OLS slope and "
    "intercept recovering (b, c), R^2 and the implied inflection "
    "day — the asymmetric-growth law beside Bass diffusion (q261).",
)
def q589(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.dayofmonth("ts")).alias("d0")
    )
    tot = firsts.agg(F.count(F.lit(1)).alias("n"))
    curve = (
        firsts.groupBy("d0")
        .agg(F.count(F.lit(1)).alias("c"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("d0").alias("d"),
            (
                F.sum("c").over(Window.orderBy("d0")) * 1.0 / F.col("n")
            ).alias("frac"),
        )
    )
    ll = curve.filter((F.col("frac") > 0.01) & (F.col("frac") < 0.99)).select(
        (F.col("d") * 1.0).alias("x"), F.log(-F.log("frac")).alias("y")
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
    b = F.exp((sy - slope * sx) / k)
    r2f = (
        (k * F.col("sxy") - sx * sy)
        * (k * F.col("sxy") - sx * sy)
        / ((k * F.col("sxx") - sx * sx) * (k * F.col("syy") - sy * sy))
    )
    return m.select(
        k.cast("bigint").alias("n_days_fit"),
        r6(-slope).alias("gompertz_c"),
        r6(b).alias("gompertz_b"),
        r6(r2f).alias("r2"),
        F.round(F.log(b) / (-slope) + F.lit(5e-10), 4).alias("inflection_day"),
    )


# ---------------------------------------------------------------------------
# Q590 — periodogram on unevenly sampled times (Deeming)
# ---------------------------------------------------------------------------
# Purchase timestamps are irregular, which breaks the evenly-spaced
# periodogram (q265); the Deeming power P(f) = (sum cos)^2 +
# (sum sin)^2 over the raw event times handles gaps natively —
# tested at 1/day, 2/day, 1/week and a non-harmonic control
# frequency, normalized per point.
_Q590_ORACLE = """
    WITH pts AS MATERIALIZED (
      SELECT epoch_us(ts) / 1e6 / 86400 AS t
      FROM events WHERE event_type = 'purchase' AND user_id % 4 = 0
    ), freqs AS (
      SELECT * FROM (VALUES ('daily', CAST(1.0 AS DOUBLE)),
                            ('twice_daily', 2.0),
                            ('weekly', 1.0 / 7),
                            ('control', 0.37)) f(name, f)
    ), power AS (
      SELECT f.name, f.f,
             POW(SUM(COS(2 * PI() * f.f * p.t)), 2)
               + POW(SUM(SIN(2 * PI() * f.f * p.t)), 2) AS raw,
             COUNT(*) AS n
      FROM freqs f, pts p GROUP BY f.name, f.f
    )
    SELECT name AS frequency,
           ROUND(f + 5e-12, 6) AS cycles_per_day,
           ROUND(raw / (n * 1.0) + 5e-8, 2) AS deeming_power,
           CAST(n AS BIGINT) AS n_points
    FROM power ORDER BY name
"""


@register(
    "q590_uneven_periodogram",
    _Q590_ORACLE,
    doc="Deeming periodogram for unevenly sampled purchase times: "
    "power (sum cos)^2 + (sum sin)^2 at daily / twice-daily / "
    "weekly and a non-harmonic control frequency, normalized per "
    "point — the gap-tolerant spectral probe the even-grid "
    "periodogram (q265) cannot be.",
)
def q590(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    ev = _t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") % 4 == 0)
    )
    pts = ev.select(
        (F.unix_micros(F.col("ts").cast("timestamp")) / 1e6 / 86400).alias("t")
    )
    freqs = spark.createDataFrame(
        [
            ("daily", 1.0), ("twice_daily", 2.0),
            ("weekly", 1.0 / 7), ("control", 0.37),
        ],
        "name string, f double",
    )
    tau = 2 * math.pi
    power = (
        # literal on the BROADCAST side: freqs.crossJoin(pts) made
        # Spark build-right on the event points — broadcasting the
        # fact table (audit-caught; catastrophic at scale)
        pts.crossJoin(F.broadcast(freqs))
        .groupBy("name", "f")
        .agg(
            (
                F.pow(F.sum(F.cos(tau * F.col("f") * F.col("t"))), 2)
                + F.pow(F.sum(F.sin(tau * F.col("f") * F.col("t"))), 2)
            ).alias("raw"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return power.select(
        F.col("name").alias("frequency"),
        r6(F.col("f")).alias("cycles_per_day"),
        F.round(F.col("raw") / (F.col("n") * 1.0) + F.lit(5e-8), 2).alias(
            "deeming_power"
        ),
        F.col("n").cast("bigint").alias("n_points"),
    ).orderBy("frequency")


# ---------------------------------------------------------------------------
# Q591 — spectral bisection via the Fiedler vector
# ---------------------------------------------------------------------------
# The modulo contact graph's Laplacian L = D - A: eight rounds of
# x <- (cI - L) x with mean-centering each round (deflating the
# constant trivial eigenvector) converge to the Fiedler vector; the
# sign split bisects the graph and the relational cut-size /
# balance audit scores it — spectral clustering joining the
# eigen-stack (q434/q503) to the partition stack (q243/q556).
_Q591_ORACLE = """
    WITH e0 AS (
      SELECT DISTINCT CAST(o_custkey % 24 AS BIGINT) AS u,
             CAST(o_orderkey % 24 AS BIGINT) AS v
      FROM orders WHERE o_custkey % 24 <> o_orderkey % 24
    ), e AS MATERIALIZED (
      SELECT u, v FROM e0 UNION SELECT v, u FROM e0
    ), deg AS MATERIALIZED (
      SELECT u AS nd, COUNT(*) AS k FROM e GROUP BY u
    ), x0 AS (
      SELECT g.i AS nd,
             CAST(((g.i * 2654435761) % 4294967296)
                  / 4294967296.0 - 0.5 AS DOUBLE) AS x
      FROM generate_series(0, 23) g(i)
    ), it1 AS MATERIALIZED (
      SELECT nd, x - (SELECT AVG(x) FROM (
        SELECT n.nd, (48 - COALESCE(d.k, 0)) * n.x
               + COALESCE(nb.s, 0) AS x
        FROM x0 n LEFT JOIN deg d ON d.nd = n.nd
        LEFT JOIN (SELECT e.u, SUM(x0.x) AS s FROM e
                   JOIN x0 ON x0.nd = e.v GROUP BY e.u) nb
          ON nb.u = n.nd)) AS x
      FROM (
        SELECT n.nd, (48 - COALESCE(d.k, 0)) * n.x
               + COALESCE(nb.s, 0) AS x
        FROM x0 n LEFT JOIN deg d ON d.nd = n.nd
        LEFT JOIN (SELECT e.u, SUM(x0.x) AS s FROM e
                   JOIN x0 ON x0.nd = e.v GROUP BY e.u) nb
          ON nb.u = n.nd)
    ), it2 AS MATERIALIZED (
      SELECT nd, x - (SELECT AVG(x) FROM (
        SELECT n.nd, (48 - COALESCE(d.k, 0)) * n.x
               + COALESCE(nb.s, 0) AS x
        FROM it1 n LEFT JOIN deg d ON d.nd = n.nd
        LEFT JOIN (SELECT e.u, SUM(it1.x) AS s FROM e
                   JOIN it1 ON it1.nd = e.v GROUP BY e.u) nb
          ON nb.u = n.nd)) AS x
      FROM (
        SELECT n.nd, (48 - COALESCE(d.k, 0)) * n.x
               + COALESCE(nb.s, 0) AS x
        FROM it1 n LEFT JOIN deg d ON d.nd = n.nd
        LEFT JOIN (SELECT e.u, SUM(it1.x) AS s FROM e
                   JOIN it1 ON it1.nd = e.v GROUP BY e.u) nb
          ON nb.u = n.nd)
    ), it3 AS MATERIALIZED (
      SELECT nd, x - (SELECT AVG(x) FROM (
        SELECT n.nd, (48 - COALESCE(d.k, 0)) * n.x
               + COALESCE(nb.s, 0) AS x
        FROM it2 n LEFT JOIN deg d ON d.nd = n.nd
        LEFT JOIN (SELECT e.u, SUM(it2.x) AS s FROM e
                   JOIN it2 ON it2.nd = e.v GROUP BY e.u) nb
          ON nb.u = n.nd)) AS x
      FROM (
        SELECT n.nd, (48 - COALESCE(d.k, 0)) * n.x
               + COALESCE(nb.s, 0) AS x
        FROM it2 n LEFT JOIN deg d ON d.nd = n.nd
        LEFT JOIN (SELECT e.u, SUM(it2.x) AS s FROM e
                   JOIN it2 ON it2.nd = e.v GROUP BY e.u) nb
          ON nb.u = n.nd)
    ), part AS (
      SELECT nd, CASE WHEN x >= 0 THEN 1 ELSE 0 END AS side FROM it3
    ), cut AS (
      SELECT COUNT(*) / 2 AS cut_edges
      FROM e JOIN part pa ON pa.nd = e.u JOIN part pb ON pb.nd = e.v
      WHERE pa.side <> pb.side
    )
    SELECT CAST((SELECT SUM(side) FROM part) AS BIGINT) AS side1_nodes,
           CAST((SELECT COUNT(*) - SUM(side) FROM part) AS BIGINT)
             AS side0_nodes,
           CAST(cut.cut_edges AS BIGINT) AS cut_edges,
           CAST((SELECT COUNT(*) / 2 FROM e) AS BIGINT) AS total_edges,
           ROUND(cut.cut_edges * 1.0 / (SELECT COUNT(*) / 2 FROM e)
                 + 5e-12, 6) AS cut_fraction
    FROM cut
"""


@register(
    "q591_spectral_bisection",
    _Q591_ORACLE,
    doc="Spectral bisection: three (cI - L) power rounds with mean-"
    "centering deflate the trivial eigenvector and approximate the "
    "Fiedler vector on the modulo graph; the sign split's cut size "
    "and balance are audited relationally — spectral clustering "
    "joining the eigen stack (q434/q503) to partitions (q243/q556).",
)
def q591(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    e0 = (
        o.select(
            (F.col("o_custkey") % 24).cast("bigint").alias("u"),
            (F.col("o_orderkey") % 24).cast("bigint").alias("v"),
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
    x = spark.range(0, 24).select(
        F.col("nd").alias("nd") if False else F.col("id").alias("nd"),
        (
            ((F.col("id") * 2654435761) % 4294967296) / 4294967296.0 - 0.5
        ).alias("x"),
    )
    allw = Window.partitionBy()
    for _ in range(3):
        nb = (
            e.join(x.select(F.col("nd").alias("v"), "x"), "v")
            .groupBy("u")
            .agg(F.sum("x").alias("s"))
            .select(F.col("u").alias("nd"), "s")
        )
        y = (
            x.join(nb, "nd", "left")
            .join(F.broadcast(deg), "nd", "left")
            .select(
                "nd",
                (
                    (48 - F.coalesce("k", F.lit(0))) * F.col("x")
                    + F.coalesce("s", F.lit(0.0))
                ).alias("x"),
            )
        )
        x = y.select(
            "nd", (F.col("x") - F.avg("x").over(allw)).alias("x")
        ).localCheckpoint(eager=False)
    part = x.select(
        "nd", F.when(F.col("x") >= 0, 1).otherwise(0).alias("side")
    ).localCheckpoint(eager=False)
    pa = part.select(F.col("nd").alias("u"), F.col("side").alias("sa"))
    pb = part.select(F.col("nd").alias("v"), F.col("side").alias("sb"))
    cut = (
        e.join(F.broadcast(pa), "u")
        .join(F.broadcast(pb), "v")
        .filter(F.col("sa") != F.col("sb"))
        .agg((F.count(F.lit(1)) / 2).cast("bigint").alias("cut_edges"))
    )
    sides = part.agg(
        F.sum("side").alias("s1"),
        (F.count(F.lit(1)) - F.sum("side")).alias("s0"),
    )
    te = e.agg((F.count(F.lit(1)) / 2).cast("bigint").alias("total_edges"))
    return (
        sides.crossJoin(F.broadcast(cut))
        .crossJoin(F.broadcast(te))
        .select(
            F.col("s1").cast("bigint").alias("side1_nodes"),
            F.col("s0").cast("bigint").alias("side0_nodes"),
            F.col("cut_edges"),
            F.col("total_edges"),
            r6(F.col("cut_edges") * 1.0 / F.col("total_edges")).alias(
                "cut_fraction"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Q592 — PC-algorithm skeleton on three variables
# ---------------------------------------------------------------------------
# Balance (X), order count (M), spend (Y): marginal and partial
# correlations (q326's machinery) thresholded at |rho| > 0.05 decide
# which edges survive conditioning — the constraint-based causal
# discovery step that precedes every do-calculus query (backdoor "
# q481, mediation q533), reported as the three edge verdicts.
_Q592_ORACLE = """
    WITH u AS (
      SELECT LN(c.c_acctbal + 10000.0) AS x,
             LN(1.0 + COUNT(o.o_orderkey)) AS m,
             LN(1 + COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0)) AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_acctbal
    ), mo AS (
      SELECT corr(x, m) AS rxm, corr(x, y) AS rxy, corr(m, y) AS rmy
      FROM u
    ), pc AS (
      SELECT rxm, rxy, rmy,
             (rxy - rxm * rmy) / SQRT((1 - rxm * rxm) * (1 - rmy * rmy))
               AS rxy_m,
             (rxm - rxy * rmy) / SQRT((1 - rxy * rxy) * (1 - rmy * rmy))
               AS rxm_y,
             (rmy - rxm * rxy) / SQRT((1 - rxm * rxm) * (1 - rxy * rxy))
               AS rmy_x
      FROM mo
    )
    SELECT ROUND(rxm + 5e-12, 6) AS corr_xm,
           ROUND(rmy + 5e-12, 6) AS corr_my,
           ROUND(rxy + 5e-12, 6) AS corr_xy,
           ROUND(rxy_m + 5e-12, 6) AS partial_xy_given_m,
           ABS(rxm) > 0.05 AND ABS(rxm_y) > 0.05 AS edge_xm,
           ABS(rmy) > 0.05 AND ABS(rmy_x) > 0.05 AS edge_my,
           ABS(rxy) > 0.05 AND ABS(rxy_m) > 0.05 AS edge_xy
    FROM pc
"""


@register(
    "q592_pc_skeleton",
    _Q592_ORACLE,
    doc="PC-algorithm skeleton on (balance, order count, spend): "
    "marginal correlations and order-1 partials (q326's formula) "
    "thresholded at 0.05 — which edges survive conditioning, e.g. "
    "X-Y vanishing given M reveals mediation (q533) — the discovery "
    "step before identification (q481).",
)
def q592(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    u = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            F.log(1.0 + F.count("o_orderkey")).alias("m"),
            F.log(
                1
                + F.coalesce(
                    F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0)
                )
            ).alias("y"),
        )
        .select(F.log(F.col("c_acctbal") + 10000.0).alias("x"), "m", "y")
    )
    mo = u.agg(
        F.corr("x", "m").alias("rxm"),
        F.corr("x", "y").alias("rxy"),
        F.corr("m", "y").alias("rmy"),
    )
    rxm, rxy, rmy = F.col("rxm"), F.col("rxy"), F.col("rmy")
    rxy_m = (rxy - rxm * rmy) / F.sqrt((1 - rxm * rxm) * (1 - rmy * rmy))
    rxm_y = (rxm - rxy * rmy) / F.sqrt((1 - rxy * rxy) * (1 - rmy * rmy))
    rmy_x = (rmy - rxm * rxy) / F.sqrt((1 - rxm * rxm) * (1 - rxy * rxy))
    return mo.select(
        r6(rxm).alias("corr_xm"),
        r6(rmy).alias("corr_my"),
        r6(rxy).alias("corr_xy"),
        r6(rxy_m).alias("partial_xy_given_m"),
        ((F.abs(rxm) > 0.05) & (F.abs(rxm_y) > 0.05)).alias("edge_xm"),
        ((F.abs(rmy) > 0.05) & (F.abs(rmy_x) > 0.05)).alias("edge_my"),
        ((F.abs(rxy) > 0.05) & (F.abs(rxy_m) > 0.05)).alias("edge_xy"),
    )


# ---------------------------------------------------------------------------
# Q593 — grouped (delete-one-nation) jackknife
# ---------------------------------------------------------------------------
# The jackknife without randomness: delete-one-GROUP estimates of
# the mean spend come free from group sums (leave-nation-out mean =
# (S - S_g)/(N - n_g)), pseudo-value variance gives the SE — the
# deterministic resampling counterpart of the hash bootstrap (q365),
# honest about cluster structure like q530.
_Q593_ORACLE = """
    WITH u AS (
      SELECT c.c_nationkey AS g,
             COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0) * 1.0 AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_nationkey
    ), grp AS (
      SELECT g, COUNT(*) AS ng, SUM(y) AS sg FROM u GROUP BY g
    ), tot AS (
      SELECT SUM(ng) AS n, SUM(sg) AS s, COUNT(*) AS gk FROM grp
    ), loo AS (
      SELECT grp.g,
             (tot.s - grp.sg) / (tot.n - grp.ng) AS theta_i,
             tot.s / tot.n AS theta
      FROM grp, tot
    ), jk AS (
      SELECT COUNT(*) AS gk, AVG(theta_i) AS tbar,
             SUM(theta_i * theta_i)
               - COUNT(*) * AVG(theta_i) * AVG(theta_i) AS ssq,
             MAX(theta) AS theta
      FROM loo
    )
    SELECT CAST(gk AS BIGINT) AS n_groups,
           ROUND(theta / 100.0 + 5e-8, 2) AS mean_spend_usd,
           ROUND(SQRT((gk - 1.0) / gk * ssq) / 100.0 + 5e-8, 2)
             AS jackknife_se_usd,
           ROUND((theta - tbar) * (gk - 1) / 100.0 + 5e-8, 2)
             AS bias_estimate_usd
    FROM jk
"""


@register(
    "q593_grouped_jackknife",
    _Q593_ORACLE,
    doc="Delete-one-nation jackknife of the mean spend: leave-group-"
    "out estimates free from group sums, SE from pseudo-value "
    "spread with the (g-1)/g factor, and the jackknife bias "
    "estimate — deterministic resampling beside the hash bootstrap "
    "(q365) and cluster-robust SEs (q530).",
)
def q593(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    u = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_nationkey")
        .agg(
            (
                F.coalesce(F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0))
                * 1.0
            ).alias("y")
        )
        .select(F.col("c_nationkey").alias("g"), "y")
    )
    grp = u.groupBy("g").agg(
        F.count(F.lit(1)).alias("ng"), F.sum("y").alias("sg")
    )
    tot = grp.agg(
        F.sum("ng").alias("n"), F.sum("sg").alias("s"), F.count(F.lit(1)).alias("gk")
    )
    loo = grp.crossJoin(F.broadcast(tot)).select(
        "g",
        ((F.col("s") - F.col("sg")) / (F.col("n") - F.col("ng"))).alias(
            "theta_i"
        ),
        (F.col("s") / F.col("n")).alias("theta"),
    )
    jk = loo.agg(
        F.count(F.lit(1)).alias("gk"),
        F.avg("theta_i").alias("tbar"),
        (
            F.sum(F.col("theta_i") * F.col("theta_i"))
            - F.count(F.lit(1)) * F.avg("theta_i") * F.avg("theta_i")
        ).alias("ssq"),
        F.max("theta").alias("theta"),
    )
    r2 = lambda cexpr: F.round(cexpr + F.lit(5e-8), 2)  # noqa: E731
    return jk.select(
        F.col("gk").cast("bigint").alias("n_groups"),
        r2(F.col("theta") / 100.0).alias("mean_spend_usd"),
        r2(
            F.sqrt((F.col("gk") - 1.0) / F.col("gk") * F.col("ssq")) / 100.0
        ).alias("jackknife_se_usd"),
        r2((F.col("theta") - F.col("tbar")) * (F.col("gk") - 1) / 100.0).alias(
            "bias_estimate_usd"
        ),
    )
