"""Conformance queries batch #82 (q604+) — the KMV sketch, SUTVA
spillover, the winner's curse, Silverman KDE, and placebo DiD.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q604 — K-minimum-values distinct estimation
# ---------------------------------------------------------------------------
# The OTHER classical distinct sketch: keep the k smallest hash
# values; (k-1)/kth_min (hashes normalized to (0,1)) estimates the
# cardinality.  At k = 16/64/256 the error shrinks like 1/sqrt(k) —
# the order-statistics counterpart of HyperLogLog (q454), one rank
# window instead of register maxima.
_Q604_ORACLE = """
    WITH h AS MATERIALIZED (
      SELECT DISTINCT ((o_custkey * 2654435761) % 4294967296)
               / 4294967296.0 AS hv
      FROM orders
    ), ex AS (
      SELECT COUNT(DISTINCT o_custkey) AS exact_n FROM orders
    ), ranked AS (
      SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rk FROM h
    ), est AS (
      SELECT k.k, (k.k - 1) / r.hv AS e
      FROM (VALUES (16), (64), (256)) k(k)
      JOIN ranked r ON r.rk = k.k
    )
    SELECT CAST(est.k AS BIGINT) AS k,
           CAST(ROUND(est.e) AS BIGINT) AS kmv_estimate,
           CAST(ex.exact_n AS BIGINT) AS exact_distinct,
           ROUND(ABS(est.e - ex.exact_n) / ex.exact_n + 5e-12, 6)
             AS rel_error,
           ROUND(1.0 / SQRT(est.k - 2) + 5e-12, 6) AS theory_rse
    FROM est, ex ORDER BY k
"""


@register(
    "q604_kmv_sketch",
    _Q604_ORACLE,
    doc="K-minimum-values distinct sketch: the k-th smallest "
    "normalized hash gives (k-1)/kth as the cardinality estimate at "
    "k = 16/64/256 with the 1/sqrt(k-2) error law — the order-"
    "statistics sibling of HyperLogLog (q454/q518), one rank window "
    "instead of register maxima.",
)
def q604(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    h = (
        o.select(
            (
                ((F.col("o_custkey") * 2654435761) % 4294967296) / 4294967296.0
            ).alias("hv")
        )
        .distinct()
    )
    ex = o.agg(F.count_distinct("o_custkey").alias("exact_n"))
    ranked = h.select(
        "hv", F.row_number().over(Window.orderBy("hv")).alias("rk")
    )
    ks = spark.createDataFrame([(16,), (64,), (256,)], "k int")
    est = ks.join(ranked, F.col("rk") == F.col("k")).select(
        "k", ((F.col("k") - 1) / F.col("hv")).alias("e")
    )
    return (
        est.crossJoin(F.broadcast(ex))
        .select(
            F.col("k").cast("bigint").alias("k"),
            F.round("e").cast("bigint").alias("kmv_estimate"),
            F.col("exact_n").cast("bigint").alias("exact_distinct"),
            r6(F.abs(F.col("e") - F.col("exact_n")) / F.col("exact_n")).alias(
                "rel_error"
            ),
            r6(1.0 / F.sqrt(F.col("k") - 2)).alias("theory_rse"),
        )
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# Q605 — SUTVA spillover audit
# ---------------------------------------------------------------------------
# If treating a customer (AUTOMOBILE segment) affects their graph
# neighbors, every no-interference analysis (q360/q481/q509) is
# biased: among CONTROL customers, those adjacent to treated nodes
# on the modulo contact graph are compared to the isolated controls
# — the spillover gap is the SUTVA violation estimate.
_Q605_ORACLE = """
    WITH u AS MATERIALIZED (
      SELECT c.c_custkey AS id, c.c_custkey % 40 AS nd,
             CASE WHEN c.c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS t,
             COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0) / 100.0 AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_mktsegment
    ), e0 AS (
      SELECT DISTINCT CAST(o_custkey % 40 AS BIGINT) AS a,
             CAST(o_orderkey % 40 AS BIGINT) AS b
      FROM orders WHERE o_custkey % 40 <> o_orderkey % 40
    ), e AS MATERIALIZED (
      SELECT a, b FROM e0 UNION SELECT b, a FROM e0
    ), treated_nodes AS (
      SELECT DISTINCT nd FROM u WHERE t = 1
    ), exposed AS (
      SELECT DISTINCT e.a AS nd FROM e
      JOIN treated_nodes tn ON tn.nd = e.b
    ), ctl AS (
      SELECT u.y,
             CASE WHEN ex.nd IS NOT NULL THEN 1 ELSE 0 END AS exposed
      FROM u LEFT JOIN exposed ex ON ex.nd = u.nd
      WHERE u.t = 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_controls,
           CAST(SUM(exposed) AS BIGINT) AS n_exposed_controls,
           ROUND(AVG(CASE WHEN exposed = 1 THEN y END) + 5e-8, 2)
             AS exposed_control_mean,
           ROUND(AVG(CASE WHEN exposed = 0 THEN y END) + 5e-8, 2)
             AS isolated_control_mean,
           ROUND(AVG(CASE WHEN exposed = 1 THEN y END)
                 - AVG(CASE WHEN exposed = 0 THEN y END) + 5e-8, 2)
             AS spillover_gap
    FROM ctl
"""


@register(
    "q605_sutva_spillover",
    _Q605_ORACLE,
    doc="SUTVA audit: control customers adjacent to treated nodes on "
    "the contact graph vs isolated controls — a nonzero spillover "
    "gap breaks the no-interference assumption every ATT estimator "
    "(q360/q481/q509) relies on; the falsification sibling of the "
    "E-value (q508).",
)
def q605(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    u = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            (
                F.coalesce(F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0))
                / 100.0
            ).alias("y")
        )
        .select(
            (F.col("c_custkey") % 40).alias("nd"),
            F.when(F.col("c_mktsegment") == "AUTOMOBILE", 1).otherwise(0).alias(
                "t"
            ),
            "y",
        )
        .localCheckpoint(eager=False)
    )
    e0 = (
        o.select(
            (F.col("o_custkey") % 40).cast("bigint").alias("a"),
            (F.col("o_orderkey") % 40).cast("bigint").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    e = e0.unionAll(
        e0.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    treated_nodes = u.filter(F.col("t") == 1).select(
        F.col("nd").alias("b")
    ).distinct()
    exposed = (
        e.join(F.broadcast(treated_nodes), "b")
        .select(F.col("a").alias("nd"))
        .distinct()
        .select("nd", F.lit(1).alias("ex"))
    )
    ctl = (
        u.filter(F.col("t") == 0)
        .join(F.broadcast(exposed), "nd", "left")
        .select("y", F.coalesce("ex", F.lit(0)).alias("exposed"))
    )
    r2 = lambda cexpr: F.round(cexpr + F.lit(5e-8), 2)  # noqa: E731
    return ctl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_controls"),
        F.sum("exposed").cast("bigint").alias("n_exposed_controls"),
        r2(F.avg(F.when(F.col("exposed") == 1, F.col("y")))).alias(
            "exposed_control_mean"
        ),
        r2(F.avg(F.when(F.col("exposed") == 0, F.col("y")))).alias(
            "isolated_control_mean"
        ),
        r2(
            F.avg(F.when(F.col("exposed") == 1, F.col("y")))
            - F.avg(F.when(F.col("exposed") == 0, F.col("y")))
        ).alias("spillover_gap"),
    )


# ---------------------------------------------------------------------------
# Q606 — the winner's curse: how far do group maxima overshoot?
# ---------------------------------------------------------------------------
# Per nation, the top supplier's revenue z-score (within-nation
# standardization): maxima of n draws sit near sqrt(2 ln n) even
# when nothing is special — the measured mean max-z against that
# Gumbel-order-statistic benchmark quantifies the selection bias
# every "top performer" readout carries (look-ahead q532's
# cross-sectional twin).
_Q606_ORACLE = """
    WITH sup AS MATERIALIZED (
      SELECT s.s_nationkey AS nat, l.l_suppkey AS sk,
             SUM(ROUND(l.l_extendedprice * 100)) / 1e5 AS rev
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY s.s_nationkey, l.l_suppkey
    ), gstat AS (
      SELECT nat, COUNT(*) AS n, AVG(rev) AS mu, stddev_pop(rev) AS sd
      FROM sup GROUP BY nat
      HAVING COUNT(*) >= 5 AND stddev_pop(rev) > 0
    ), mx AS (
      SELECT s.nat, MAX((s.rev - g.mu) / g.sd) AS max_z, MAX(g.n) AS n
      FROM sup s JOIN gstat g ON g.nat = s.nat
      GROUP BY s.nat
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_nations,
           ROUND(AVG(max_z) + 5e-12, 6) AS mean_max_z,
           ROUND(AVG(SQRT(2 * LN(n * 1.0))) + 5e-12, 6)
             AS gumbel_benchmark,
           ROUND(AVG(max_z) - AVG(SQRT(2 * LN(n * 1.0))) + 5e-12, 6)
             AS excess_over_benchmark,
           ROUND(AVG(n * 1.0) + 5e-10, 4) AS mean_group_size
    FROM mx
"""


@register(
    "q606_winners_curse",
    _Q606_ORACLE,
    doc="Winner's curse measured: each nation's top-supplier z-score "
    "vs the sqrt(2 ln n) order-statistic benchmark — maxima look "
    "exceptional by construction, and the excess over the benchmark "
    "is the only real signal (Gumbel maxima q238's inferential "
    "lesson, look-ahead bias q532's cross-sectional twin).",
)
def q606(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sup = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nat"), F.col("l_suppkey").alias("sk"))
        .agg((F.sum(F.round(F.col("l_extendedprice") * 100)) / 1e5).alias("rev"))
    )
    gstat = (
        sup.groupBy("nat")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("rev").alias("mu"),
            F.stddev_pop("rev").alias("sd"),
        )
        .filter((F.col("n") >= 5) & (F.col("sd") > 0))
    )
    mx = (
        sup.join(F.broadcast(gstat), "nat")
        .groupBy("nat")
        .agg(
            F.max((F.col("rev") - F.col("mu")) / F.col("sd")).alias("max_z"),
            F.max("n").alias("n"),
        )
    )
    return mx.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nations"),
        r6(F.avg("max_z")).alias("mean_max_z"),
        r6(F.avg(F.sqrt(2 * F.log(F.col("n") * 1.0)))).alias(
            "gumbel_benchmark"
        ),
        r6(
            F.avg("max_z") - F.avg(F.sqrt(2 * F.log(F.col("n") * 1.0)))
        ).alias("excess_over_benchmark"),
        F.round(F.avg(F.col("n") * 1.0) + F.lit(5e-10), 4).alias(
            "mean_group_size"
        ),
    )


# ---------------------------------------------------------------------------
# Q607 — Gaussian KDE with Silverman's bandwidth
# ---------------------------------------------------------------------------
# The density estimate the histogram family (q18/q305/q436) has been
# approximating: Silverman's h = 0.9 min(sd, IQR/1.34) n^{-1/5} on a
# deterministic sample of order prices, Gaussian kernel evaluated at
# nine grid points — smooth density, no bin-edge artifacts.
_Q607_ORACLE = """
    WITH x AS MATERIALIZED (
      SELECT o_totalprice / 1000.0 AS v FROM orders
      WHERE o_orderkey % 10 = 0
    ), par AS (
      SELECT COUNT(*) AS n, stddev_samp(v) AS sd,
             quantile_cont(v, 0.75) - quantile_cont(v, 0.25) AS iqr,
             MIN(v) AS lo, MAX(v) AS hi
      FROM x
    ), bw AS (
      SELECT n, lo, hi,
             0.9 * LEAST(sd, iqr / 1.34) * POW(n, -0.2) AS h
      FROM par
    ), grid AS (
      SELECT bw.lo + g.i * (bw.hi - bw.lo) / 10.0 AS gx, bw.h, bw.n
      FROM generate_series(1, 9) g(i), bw
    ), kde AS (
      SELECT gr.gx,
             SUM(EXP(-POW((x.v - gr.gx) / gr.h, 2) / 2))
               / (gr.n * gr.h * SQRT(2 * PI())) AS f
      FROM grid gr, x GROUP BY gr.gx, gr.h, gr.n
    )
    SELECT ROUND(gx + 5e-10, 4) AS grid_point_kusd,
           ROUND(f + 5e-12, 6) AS density
    FROM kde ORDER BY gx
"""


@register(
    "q607_kde_silverman",
    _Q607_ORACLE,
    doc="Gaussian kernel density estimate with Silverman's rule "
    "(0.9 min(sd, IQR/1.34) n^-0.2) on sampled order prices, "
    "evaluated at nine grid points — the smooth density the "
    "histogram stack (q18/q305/q436) discretizes, one kernel-sum "
    "aggregation per grid point.",
)
def q607(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    x = o.select((F.col("o_totalprice") / 1000.0).alias("v")).localCheckpoint(eager=False)
    par = x.agg(
        F.count(F.lit(1)).alias("n"),
        F.stddev_samp("v").alias("sd"),
        (
            F.percentile("v", F.lit(0.75)) - F.percentile("v", F.lit(0.25))
        ).alias("iqr"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
    bw = par.select(
        "n",
        "lo",
        "hi",
        (
            0.9 * F.least(F.col("sd"), F.col("iqr") / 1.34) * F.pow(F.col("n"), -0.2)
        ).alias("h"),
    )
    grid = (
        spark.range(1, 10)
        .select(F.col("id").alias("i"))
        .crossJoin(F.broadcast(bw))
        .select(
            (
                F.col("lo") + F.col("i") * (F.col("hi") - F.col("lo")) / 10.0
            ).alias("gx"),
            "h",
            "n",
        )
    )
    kde = (
        grid.crossJoin(x)
        .groupBy("gx", "h", "n")
        .agg(
            (
                F.sum(
                    F.exp(-F.pow((F.col("v") - F.col("gx")) / F.col("h"), 2) / 2)
                )
                / (F.col("n") * F.col("h") * math.sqrt(2 * math.pi))
            ).alias("f")
        )
    )
    return kde.select(
        F.round(F.col("gx") + F.lit(5e-10), 4).alias("grid_point_kusd"),
        r6(F.col("f")).alias("density"),
    ).orderBy("grid_point_kusd")


# ---------------------------------------------------------------------------
# Q608 — difference-in-differences with placebo dates
# ---------------------------------------------------------------------------
# The q235-style DiD effect (AUTOMOBILE vs rest, before/after day
# 15) re-estimated at three placebo cut dates (8, 11, 22): a
# credible design needs the true-date effect to stand out from the
# placebo distribution — the falsification test reported as the
# effect's rank among placebos (randomization inference in
# miniature).
_Q608_ORACLE = """
    WITH base AS MATERIALIZED (
      SELECT CASE WHEN c.c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS g,
             CAST(EXTRACT(day FROM e.ts) AS BIGINT) AS d,
             ROUND(e.value * 100) AS v
      FROM events e JOIN customer c ON c.c_custkey = e.user_id
      WHERE e.event_type = 'purchase'
    ), cuts AS (
      SELECT * FROM (VALUES ('true_day15', 15), ('placebo_day8', 8),
                            ('placebo_day11', 11), ('placebo_day22', 22))
             c(name, cut)
    ), did AS (
      SELECT c.name, c.cut,
             (AVG(CASE WHEN g = 1 AND d > c.cut THEN v END)
              - AVG(CASE WHEN g = 1 AND d <= c.cut THEN v END))
             - (AVG(CASE WHEN g = 0 AND d > c.cut THEN v END)
                - AVG(CASE WHEN g = 0 AND d <= c.cut THEN v END)) AS eff
      FROM cuts c, base GROUP BY c.name, c.cut
    )
    SELECT name AS cut_name,
           CAST(cut AS BIGINT) AS cut_day,
           ROUND(eff / 100.0 + 5e-8, 2) AS did_effect_usd,
           RANK() OVER (ORDER BY ABS(eff) DESC) AS abs_rank,
           name = 'true_day15'
             AND RANK() OVER (ORDER BY ABS(eff) DESC) = 1
             AS true_effect_dominates
    FROM did ORDER BY cut_day
"""


@register(
    "q608_placebo_did",
    _Q608_ORACLE,
    doc="Difference-in-differences with placebo cut dates: the "
    "AUTOMOBILE-vs-rest purchase-value DiD at the true day-15 cut "
    "re-estimated at days 8/11/22 — the true effect's |rank| among "
    "placebos is the miniature randomization-inference "
    "falsification every DiD (q235) and event study (q571) should "
    "ship with.",
)
def q608(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = ev.join(F.broadcast(c), ev.user_id == c.c_custkey).select(
        F.when(F.col("c_mktsegment") == "AUTOMOBILE", 1).otherwise(0).alias("g"),
        F.dayofmonth("ts").cast("bigint").alias("d"),
        F.round(F.col("value") * 100).alias("v"),
    ).localCheckpoint(eager=False)
    cuts = spark.createDataFrame(
        [
            ("true_day15", 15), ("placebo_day8", 8),
            ("placebo_day11", 11), ("placebo_day22", 22),
        ],
        "name string, cut int",
    )
    did = (
        # literal cut list on the BROADCAST side, panel streamed
        base.crossJoin(F.broadcast(cuts))
        .groupBy("name", "cut")
        .agg(
            (
                (
                    F.avg(
                        F.when(
                            (F.col("g") == 1) & (F.col("d") > F.col("cut")),
                            F.col("v"),
                        )
                    )
                    - F.avg(
                        F.when(
                            (F.col("g") == 1) & (F.col("d") <= F.col("cut")),
                            F.col("v"),
                        )
                    )
                )
                - (
                    F.avg(
                        F.when(
                            (F.col("g") == 0) & (F.col("d") > F.col("cut")),
                            F.col("v"),
                        )
                    )
                    - F.avg(
                        F.when(
                            (F.col("g") == 0) & (F.col("d") <= F.col("cut")),
                            F.col("v"),
                        )
                    )
                )
            ).alias("eff")
        )
    )
    w = Window.orderBy(F.desc(F.abs(F.col("eff"))))
    return did.select(
        F.col("name").alias("cut_name"),
        F.col("cut").cast("bigint").alias("cut_day"),
        F.round(F.col("eff") / 100.0 + F.lit(5e-8), 2).alias("did_effect_usd"),
        F.rank().over(w).alias("abs_rank"),
        ((F.col("name") == "true_day15") & (F.rank().over(w) == 1)).alias(
            "true_effect_dominates"
        ),
    ).orderBy("cut_day")
