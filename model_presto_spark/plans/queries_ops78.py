"""Conformance queries batch #78 (q584+) — weighted fair queueing,
threshold contagion, the EOQ, exact small LP, and negative binomial
fitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q584 — weighted fair queueing vs FIFO
# ---------------------------------------------------------------------------
# Events as packets in three flows (purchase weight 4, click 2,
# other 1; size = value cents): WFQ's virtual finish time is the
# per-flow cumulative size/weight (one window), service order sorts
# by it — the count of order inversions vs FIFO and the mean
# positional gain of the heavy flow measure what fair queueing
# reorders (packet scheduling beside EDF q579 and priority queues
# q548).
_Q584_ORACLE = """
    WITH pk AS MATERIALIZED (
      SELECT event_id,
             CASE WHEN event_type = 'purchase' THEN 'hi'
                  WHEN event_type = 'click' THEN 'mid'
                  ELSE 'lo' END AS flow,
             CASE WHEN event_type = 'purchase' THEN 4.0
                  WHEN event_type = 'click' THEN 2.0 ELSE 1.0 END AS w,
             COALESCE(ROUND(value * 100), 50) AS sz,
             ROW_NUMBER() OVER (ORDER BY ts, event_id) AS fifo
      FROM events WHERE EXTRACT(day FROM ts) = 1
    ), vf AS MATERIALIZED (
      SELECT event_id, flow, fifo,
             SUM(sz / w) OVER (PARTITION BY flow ORDER BY fifo) AS vfin
      FROM pk
    ), ordered AS (
      SELECT flow, fifo,
             ROW_NUMBER() OVER (ORDER BY vfin, fifo) AS wfq
      FROM vf
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_packets,
           ROUND(AVG(CASE WHEN flow = 'hi'
                          THEN fifo - wfq END) + 5e-10, 4)
             AS hi_mean_position_gain,
           ROUND(AVG(CASE WHEN flow = 'lo'
                          THEN fifo - wfq END) + 5e-10, 4)
             AS lo_mean_position_gain,
           ROUND(AVG(ABS(fifo - wfq) * 1.0) + 5e-10, 4)
             AS mean_displacement,
           CAST(SUM(CASE WHEN fifo <> wfq THEN 1 ELSE 0 END) AS BIGINT)
             AS n_reordered
    FROM ordered
"""


@register(
    "q584_wfq_schedule",
    _Q584_ORACLE,
    doc="Weighted fair queueing vs FIFO on a day of events (flows = "
    "type, weights 4/2/1, size = value): virtual finish = per-flow "
    "cumulative size/weight window, service order by it — the heavy "
    "flow's positional gain and the displacement WFQ causes "
    "(packet scheduling beside EDF q579 and Cobham priorities q548).",
)
def q584(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.dayofmonth("ts") == 1)
    pk = ev.select(
        "event_id",
        F.when(F.col("event_type") == "purchase", "hi")
        .when(F.col("event_type") == "click", "mid")
        .otherwise("lo")
        .alias("flow"),
        F.when(F.col("event_type") == "purchase", 4.0)
        .when(F.col("event_type") == "click", 2.0)
        .otherwise(1.0)
        .alias("w"),
        F.coalesce(F.round(F.col("value") * 100), F.lit(50)).alias("sz"),
        F.row_number().over(Window.orderBy("ts", "event_id")).alias("fifo"),
    )
    vf = pk.select(
        "flow",
        "fifo",
        F.sum(F.col("sz") / F.col("w"))
        .over(Window.partitionBy("flow").orderBy("fifo"))
        .alias("vfin"),
    )
    ordered = vf.select(
        "flow",
        "fifo",
        F.row_number().over(Window.orderBy("vfin", "fifo")).alias("wfq"),
    )
    r4 = lambda cexpr: F.round(cexpr + F.lit(5e-10), 4)  # noqa: E731
    return ordered.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_packets"),
        r4(
            F.avg(
                F.when(F.col("flow") == "hi", F.col("fifo") - F.col("wfq"))
            )
        ).alias("hi_mean_position_gain"),
        r4(
            F.avg(
                F.when(F.col("flow") == "lo", F.col("fifo") - F.col("wfq"))
            )
        ).alias("lo_mean_position_gain"),
        r4(F.avg(F.abs(F.col("fifo") - F.col("wfq")) * 1.0)).alias(
            "mean_displacement"
        ),
        F.sum(F.when(F.col("fifo") != F.col("wfq"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_reordered"),
    )


# ---------------------------------------------------------------------------
# Q585 — Watts threshold contagion (complex vs simple spreading)
# ---------------------------------------------------------------------------
# On the modulo contact graph, a node adopts when at least phi of
# its neighbors have adopted: six unrolled rounds from seed node 0
# at phi = 0.2 and 0.4 — fragile global cascades at low thresholds,
# arrested spread at high ones.  Complex contagion beside the
# probabilistic SIR (q516) and independent cascade (q405).
_Q585_ORACLE = """
    WITH e0 AS (
      SELECT DISTINCT CAST(o_custkey % 30 AS BIGINT) AS u,
             CAST(o_orderkey % 30 AS BIGINT) AS v
      FROM orders WHERE o_custkey % 30 <> o_orderkey % 30
    ), e AS MATERIALIZED (
      SELECT u, v FROM e0 UNION SELECT v, u FROM e0
    ), deg AS MATERIALIZED (
      SELECT u AS nd, COUNT(*) AS k FROM e GROUP BY u
    ), phis AS (SELECT UNNEST([CAST(0.2 AS DOUBLE),
                               CAST(0.4 AS DOUBLE)]) AS phi
    ), a0 AS (
      SELECT p.phi, g.i AS nd,
             CASE WHEN g.i = 0 THEN 1 ELSE 0 END AS a
      FROM generate_series(0, 29) g(i), phis p
    ), a1 AS MATERIALIZED (
      SELECT c.phi, c.nd,
             CASE WHEN c.a = 1 THEN 1
                  WHEN COALESCE(nb.na, 0) * 1.0
                       / COALESCE(d.k, 1) >= c.phi THEN 1
                  ELSE 0 END AS a
      FROM a0 c
      LEFT JOIN deg d ON d.nd = c.nd
      LEFT JOIN (SELECT a0.phi, e.u, SUM(a0.a) AS na
                 FROM e JOIN a0 ON a0.nd = e.v GROUP BY a0.phi, e.u) nb
        ON nb.phi = c.phi AND nb.u = c.nd
    ), a2 AS MATERIALIZED (
      SELECT c.phi, c.nd,
             CASE WHEN c.a = 1 THEN 1
                  WHEN COALESCE(nb.na, 0) * 1.0
                       / COALESCE(d.k, 1) >= c.phi THEN 1
                  ELSE 0 END AS a
      FROM a1 c
      LEFT JOIN deg d ON d.nd = c.nd
      LEFT JOIN (SELECT a1.phi, e.u, SUM(a1.a) AS na
                 FROM e JOIN a1 ON a1.nd = e.v GROUP BY a1.phi, e.u) nb
        ON nb.phi = c.phi AND nb.u = c.nd
    ), a3 AS MATERIALIZED (
      SELECT c.phi, c.nd,
             CASE WHEN c.a = 1 THEN 1
                  WHEN COALESCE(nb.na, 0) * 1.0
                       / COALESCE(d.k, 1) >= c.phi THEN 1
                  ELSE 0 END AS a
      FROM a2 c
      LEFT JOIN deg d ON d.nd = c.nd
      LEFT JOIN (SELECT a2.phi, e.u, SUM(a2.a) AS na
                 FROM e JOIN a2 ON a2.nd = e.v GROUP BY a2.phi, e.u) nb
        ON nb.phi = c.phi AND nb.u = c.nd
    ), a4 AS MATERIALIZED (
      SELECT c.phi, c.nd,
             CASE WHEN c.a = 1 THEN 1
                  WHEN COALESCE(nb.na, 0) * 1.0
                       / COALESCE(d.k, 1) >= c.phi THEN 1
                  ELSE 0 END AS a
      FROM a3 c
      LEFT JOIN deg d ON d.nd = c.nd
      LEFT JOIN (SELECT a3.phi, e.u, SUM(a3.a) AS na
                 FROM e JOIN a3 ON a3.nd = e.v GROUP BY a3.phi, e.u) nb
        ON nb.phi = c.phi AND nb.u = c.nd
    )
    SELECT phi AS threshold,
           CAST(SUM(a) AS BIGINT) AS adopters,
           ROUND(SUM(a) / 30.0 + 5e-12, 6) AS adoption_share
    FROM a4 GROUP BY phi ORDER BY threshold
"""


@register(
    "q585_threshold_contagion",
    _Q585_ORACLE,
    doc="Watts threshold contagion: adopt when >= phi of neighbors "
    "have, four unrolled rounds from one seed at phi = 0.2 / 0.4 — "
    "the complex-contagion cascade whose fragility contrasts with "
    "probabilistic SIR (q516) and independent cascade (q405).",
)
def q585(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    e0 = (
        o.select(
            (F.col("o_custkey") % 30).cast("bigint").alias("u"),
            (F.col("o_orderkey") % 30).cast("bigint").alias("v"),
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
    phis = spark.createDataFrame([(0.2,), (0.4,)], "phi double")
    nodes = spark.range(0, 30).select(F.col("id").alias("nd"))
    a = phis.crossJoin(F.broadcast(nodes)).select(
        "phi", "nd", F.when(F.col("nd") == 0, 1).otherwise(0).alias("a")
    )
    for _ in range(4):
        nb = (
            e.join(a.select("phi", F.col("nd").alias("v"), "a"), "v")
            .groupBy("phi", "u")
            .agg(F.sum("a").alias("na"))
            .select("phi", F.col("u").alias("nd"), "na")
        )
        a = (
            a.join(nb, ["phi", "nd"], "left")
            .join(F.broadcast(deg), "nd", "left")
            .select(
                "phi",
                "nd",
                F.when(F.col("a") == 1, 1)
                .when(
                    F.coalesce("na", F.lit(0)) * 1.0
                    / F.coalesce("k", F.lit(1))
                    >= F.col("phi"),
                    1,
                )
                .otherwise(0)
                .alias("a"),
            )
            .localCheckpoint(eager=False)
        )
    return (
        a.groupBy("phi")
        .agg(F.sum("a").alias("adopters"))
        .select(
            F.col("phi").alias("threshold"),
            F.col("adopters").cast("bigint").alias("adopters"),
            r6(F.col("adopters") / 30.0).alias("adoption_share"),
        )
        .orderBy("threshold")
    )


# ---------------------------------------------------------------------------
# Q586 — economic order quantity with the robustness certificate
# ---------------------------------------------------------------------------
# Annualized demand from the purchase counts, a fixed order cost and
# value-derived holding cost: EOQ = sqrt(2DK/h), cycle metrics, and
# the famous insensitivity — ordering at 2x EOQ costs only 25% more,
# verified as a column — the deterministic-inventory pillar beside
# newsvendor (q417) and (s,S) (q470).
_Q586_ORACLE = """
    WITH d AS (
      SELECT COUNT(*) * 365.0 / 30 AS annual_demand,
             AVG(value) * 0.2 AS holding_cost
      FROM events WHERE event_type = 'purchase'
    ), eoq AS (
      SELECT annual_demand, holding_cost,
             SQRT(2 * annual_demand * 50.0 / holding_cost) AS q
      FROM d
    )
    SELECT ROUND(annual_demand + 5e-10, 4) AS annual_demand,
           ROUND(holding_cost + 5e-10, 4) AS holding_cost,
           ROUND(q + 5e-10, 4) AS eoq,
           ROUND(annual_demand / q + 5e-10, 4) AS orders_per_year,
           ROUND(annual_demand * 50.0 / q + holding_cost * q / 2
                 + 5e-10, 4) AS optimal_cost,
           ROUND((annual_demand * 50.0 / (2 * q)
                  + holding_cost * (2 * q) / 2)
                 / (annual_demand * 50.0 / q + holding_cost * q / 2)
                 + 5e-12, 6) AS cost_ratio_at_2x
    FROM eoq
"""


@register(
    "q586_eoq",
    _Q586_ORACLE,
    doc="Economic order quantity from measured demand and value-"
    "derived holding cost: EOQ, order frequency, optimal cost, and "
    "the insensitivity certificate (cost at 2x EOQ = 1.25x optimal, "
    "exactly) — the deterministic-inventory pillar beside "
    "newsvendor (q417) and the (s,S) replay (q470).",
)
def q586(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    d = ev.agg(
        (F.count(F.lit(1)) * 365.0 / 30).alias("annual_demand"),
        (F.avg("value") * 0.2).alias("holding_cost"),
    )
    q = F.sqrt(2 * F.col("annual_demand") * 50.0 / F.col("holding_cost"))
    cost = lambda qq: (  # noqa: E731
        F.col("annual_demand") * 50.0 / qq + F.col("holding_cost") * qq / 2
    )
    r4 = lambda cexpr: F.round(cexpr + F.lit(5e-10), 4)  # noqa: E731
    return d.select(
        r4(F.col("annual_demand")).alias("annual_demand"),
        r4(F.col("holding_cost")).alias("holding_cost"),
        r4(q).alias("eoq"),
        r4(F.col("annual_demand") / q).alias("orders_per_year"),
        r4(cost(q)).alias("optimal_cost"),
        r6(cost(2 * q) / cost(q)).alias("cost_ratio_at_2x"),
    )


# ---------------------------------------------------------------------------
# Q587 — exact 2-variable LP by vertex enumeration
# ---------------------------------------------------------------------------
# maximize 3x + 5y s.t. x <= A, y <= B, x + 2y <= C, x,y >= 0 with
# A/B/C measured from segment demands: every vertex of the feasible
# polygon is the intersection of two active constraints (10
# candidate pairs enumerated relationally), feasibility filtered,
# objective maximized — the fundamental theorem of LP (optimum at a
# vertex) executed, the optimization class the suite lacked.
_Q587_ORACLE = """
    WITH par AS (
      SELECT SUM(CASE WHEN c.c_mktsegment = 'AUTOMOBILE'
                      THEN 1 ELSE 0 END) / 100.0 AS a,
             SUM(CASE WHEN c.c_mktsegment = 'BUILDING'
                      THEN 1 ELSE 0 END) / 100.0 AS b,
             COUNT(*) / 120.0 AS cc
      FROM customer c
    ), verts AS (
      SELECT 'origin' AS v, 0.0 AS x, 0.0 AS y FROM par
      UNION ALL SELECT 'x_axis_A', a, 0.0 FROM par
      UNION ALL SELECT 'y_axis_B', 0.0, b FROM par
      UNION ALL SELECT 'cap_x_axis', cc, 0.0 FROM par
      UNION ALL SELECT 'cap_y_axis', 0.0, cc / 2 FROM par
      UNION ALL SELECT 'A_and_B', a, b FROM par
      UNION ALL SELECT 'A_and_cap', a, (cc - a) / 2 FROM par
      UNION ALL SELECT 'B_and_cap', cc - 2 * b, b FROM par
    ), feas AS (
      SELECT v.v, v.x, v.y, 3 * v.x + 5 * v.y AS obj
      FROM verts v, par p
      WHERE v.x >= -1e-9 AND v.y >= -1e-9
        AND v.x <= p.a + 1e-9 AND v.y <= p.b + 1e-9
        AND v.x + 2 * v.y <= p.cc + 1e-9
    )
    SELECT v AS vertex,
           ROUND(x + 5e-10, 4) AS x,
           ROUND(y + 5e-10, 4) AS y,
           ROUND(obj + 5e-10, 4) AS objective,
           obj = (SELECT MAX(obj) FROM feas) AS is_optimal
    FROM feas ORDER BY obj DESC, v LIMIT 5
"""


@register(
    "q587_lp_vertex_enum",
    _Q587_ORACLE,
    doc="Exact 2-variable LP by vertex enumeration: maximize 3x + 5y "
    "under measured demand caps and a shared capacity, all "
    "constraint-pair intersections generated, feasibility filtered, "
    "optimum flagged — the fundamental theorem of LP executed "
    "relationally (the optimization class missing between the "
    "greedy/DP folds and the grid searches).",
)
def q587(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    par = c.agg(
        (
            F.sum(F.when(F.col("c_mktsegment") == "AUTOMOBILE", 1).otherwise(0))
            / 100.0
        ).alias("a"),
        (
            F.sum(F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0))
            / 100.0
        ).alias("b"),
        (F.count(F.lit(1)) / 120.0).alias("cc"),
        # one-row LP parameter frame referenced by 8 vertex branches:
        # cut lineage (plan audit: 32 scans un-materialized)
    ).localCheckpoint(eager=True)
    verts = None
    defs = [
        ("origin", F.lit(0.0), F.lit(0.0)),
        ("x_axis_A", F.col("a"), F.lit(0.0)),
        ("y_axis_B", F.lit(0.0), F.col("b")),
        ("cap_x_axis", F.col("cc"), F.lit(0.0)),
        ("cap_y_axis", F.lit(0.0), F.col("cc") / 2),
        ("A_and_B", F.col("a"), F.col("b")),
        ("A_and_cap", F.col("a"), (F.col("cc") - F.col("a")) / 2),
        ("B_and_cap", F.col("cc") - 2 * F.col("b"), F.col("b")),
    ]
    for name, x, y in defs:
        row = par.select(
            F.lit(name).alias("v"), x.alias("x"), y.alias("y"), "a", "b", "cc"
        )
        verts = row if verts is None else verts.unionAll(row)
    feas = verts.filter(
        (F.col("x") >= -1e-9)
        & (F.col("y") >= -1e-9)
        & (F.col("x") <= F.col("a") + 1e-9)
        & (F.col("y") <= F.col("b") + 1e-9)
        & (F.col("x") + 2 * F.col("y") <= F.col("cc") + 1e-9)
    ).select("v", "x", "y", (3 * F.col("x") + 5 * F.col("y")).alias("obj"))
    best = feas.agg(F.max("obj").alias("bo"))
    r4 = lambda cexpr: F.round(cexpr + F.lit(5e-10), 4)  # noqa: E731
    return (
        feas.crossJoin(F.broadcast(best))
        .select(
            F.col("v").alias("vertex"),
            r4(F.col("x")).alias("x"),
            r4(F.col("y")).alias("y"),
            r4(F.col("obj")).alias("objective"),
            (F.col("obj") == F.col("bo")).alias("is_optimal"),
        )
        .orderBy(F.desc("objective"), "vertex")
        .limit(5)
    )


# ---------------------------------------------------------------------------
# Q588 — negative binomial fit with the zero-inflation check
# ---------------------------------------------------------------------------
# Per-user weekly purchase counts: method-of-moments NB fit
# (r = mu^2/(var - mu), p = mu/var), the variance-to-mean
# overdispersion ratio that rules Poisson out, and observed vs
# NB-predicted zero shares — count modeling closing the family
# (Poisson GLM q514, overdispersion q258).
_Q588_ORACLE = """
    WITH u AS (
      SELECT a.user_id, COALESCE(p.c, 0) AS k
      FROM (SELECT DISTINCT user_id FROM events) a
      LEFT JOIN (
        SELECT user_id, COUNT(*) AS c FROM events
        WHERE event_type = 'purchase' AND EXTRACT(day FROM ts) <= 7
        GROUP BY user_id) p ON p.user_id = a.user_id
    ), m AS (
      SELECT COUNT(*) AS n, AVG(k * 1.0) AS mu, var_pop(k * 1.0) AS vr,
             AVG(CASE WHEN k = 0 THEN 1.0 ELSE 0 END) AS p0_obs
      FROM u
    ), fit AS (
      SELECT n, mu, vr, p0_obs,
             mu * mu / (vr - mu) AS r,
             mu / vr AS p
      FROM m
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           ROUND(mu + 5e-12, 6) AS mean_count,
           ROUND(vr / mu + 5e-12, 6) AS dispersion_ratio,
           ROUND(r + 5e-12, 6) AS nb_r,
           ROUND(p + 5e-12, 6) AS nb_p,
           ROUND(p0_obs + 5e-12, 6) AS zero_share_observed,
           ROUND(POW(p, r) + 5e-12, 6) AS zero_share_negbin,
           ROUND(EXP(-mu) + 5e-12, 6) AS zero_share_poisson
    FROM fit
"""


@register(
    "q588_negbin_fit",
    _Q588_ORACLE,
    doc="Negative binomial method-of-moments fit on weekly purchase "
    "counts: dispersion ratio (Poisson ruled out when > 1), NB "
    "(r, p), and the observed zero share against both the NB and "
    "Poisson predictions — count-model selection closing the "
    "family with the Poisson GLM (q514) and overdispersion test "
    "(q258).",
)
def q588(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    allu = ev.select("user_id").distinct()
    p = (
        ev.filter(
            (F.col("event_type") == "purchase") & (F.dayofmonth("ts") <= 7)
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    u = allu.join(p, "user_id", "left").select(
        F.coalesce("c", F.lit(0)).alias("k")
    )
    m = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.col("k") * 1.0).alias("mu"),
        F.var_pop(F.col("k") * 1.0).alias("vr"),
        F.avg(F.when(F.col("k") == 0, 1.0).otherwise(0.0)).alias("p0_obs"),
    )
    r = F.col("mu") * F.col("mu") / (F.col("vr") - F.col("mu"))
    pp = F.col("mu") / F.col("vr")
    return m.select(
        F.col("n").cast("bigint").alias("n_users"),
        r6(F.col("mu")).alias("mean_count"),
        r6(F.col("vr") / F.col("mu")).alias("dispersion_ratio"),
        r6(r).alias("nb_r"),
        r6(pp).alias("nb_p"),
        r6(F.col("p0_obs")).alias("zero_share_observed"),
        r6(F.pow(pp, r)).alias("zero_share_negbin"),
        r6(F.exp(-F.col("mu"))).alias("zero_share_poisson"),
    )
