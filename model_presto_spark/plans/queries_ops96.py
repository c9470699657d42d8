"""Conformance queries batch #96 (q674+) — exact rank aggregation,
dependence bounds, option greeks, earned-value management, and
histogram bin-width rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q674 — exact Kemeny consensus over four brands
# ---------------------------------------------------------------------------
# Customers rank the top four brands by their own purchase counts;
# the pairwise preference matrix scores all 24 permutations and the
# Kemeny-optimal order minimizes total disagreement — the exact,
# NP-hard-in-general consensus that Borda and ranked choice (q448,
# q520) only approximate, tractable here by brute force.
_PERMS4 = [
    (a, b, c, d)
    for a in range(1, 5)
    for b in range(1, 5)
    for c in range(1, 5)
    for d in range(1, 5)
    if len({a, b, c, d}) == 4
]


def _kemeny_values(dialect: str) -> str:
    rows = []
    for i, p in enumerate(_PERMS4):
        if dialect == "duck" and i == 0:
            rows.append(
                f"(CAST({p[0]} AS BIGINT), CAST({p[1]} AS BIGINT), "
                f"CAST({p[2]} AS BIGINT), CAST({p[3]} AS BIGINT))"
            )
        else:
            rows.append(f"({p[0]}, {p[1]}, {p[2]}, {p[3]})")
    return ", ".join(rows)


_Q674_ORACLE = f"""
    WITH top4 AS MATERIALIZED (
      SELECT p.p_brand AS b,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, p.p_brand) AS bi
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand ORDER BY COUNT(*) DESC, p.p_brand LIMIT 4
    ), cnt AS MATERIALIZED (
      SELECT o.o_custkey AS ck, t.bi, COUNT(*) AS n
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN top4 t ON t.b = p.p_brand
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY o.o_custkey, t.bi
    ), pref AS MATERIALIZED (
      SELECT a.bi AS i, b.bi AS j,
             SUM(CASE WHEN a.n > b.n
                      OR (a.n = b.n AND a.bi < b.bi) THEN 1 ELSE 0 END) AS w
      FROM cnt a JOIN cnt b ON b.ck = a.ck AND b.bi <> a.bi
      GROUP BY a.bi, b.bi
    ), perms AS (
      SELECT * FROM (VALUES {_kemeny_values('duck')})
        AS t(p1, p2, p3, p4)
    ), scored AS (
      SELECT pm.p1, pm.p2, pm.p3, pm.p4,
             SUM(CASE
               WHEN (CASE pf.i WHEN pm.p1 THEN 1 WHEN pm.p2 THEN 2
                     WHEN pm.p3 THEN 3 ELSE 4 END)
                 > (CASE pf.j WHEN pm.p1 THEN 1 WHEN pm.p2 THEN 2
                    WHEN pm.p3 THEN 3 ELSE 4 END)
               THEN pf.w ELSE 0 END) AS cost
      FROM perms pm CROSS JOIN pref pf
      GROUP BY pm.p1, pm.p2, pm.p3, pm.p4
    ), best AS (
      SELECT * FROM scored ORDER BY cost, p1, p2, p3, p4 LIMIT 1
    )
    SELECT t1.b AS rank1, t2.b AS rank2, t3.b AS rank3, t4.b AS rank4,
           CAST(best.cost AS BIGINT) AS kemeny_cost,
           CAST((SELECT SUM(w) FROM pref) AS BIGINT) AS total_pairs
    FROM best
    JOIN top4 t1 ON t1.bi = best.p1
    JOIN top4 t2 ON t2.bi = best.p2
    JOIN top4 t3 ON t3.bi = best.p3
    JOIN top4 t4 ON t4.bi = best.p4
"""


@register(
    "q674_kemeny_consensus",
    _Q674_ORACLE,
    doc="Exact Kemeny rank aggregation over the top four brands: "
    "customer-level pairwise preferences score all 24 permutations, "
    "the argmin is the consensus order — the exact criterion that "
    "Borda (q448) and ranked choice (q520) approximate.",
)
def q674(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lp = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    top4 = (
        lp.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "p_brand")
        .limit(4)
        .select(
            F.col("p_brand").alias("b"),
            F.row_number().over(Window.orderBy(F.desc("n"), "p_brand")).alias(
                "bi"
            ),
        )
        # lineage cut: top4 feeds the count join + four rank decodes
        # (plan audit: 36 scans with persist-only lineage)
        .localCheckpoint(eager=False)
    )
    cnt = (
        lp.join(F.broadcast(top4), lp.p_brand == top4.b)
        .join(o, lp.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_custkey").alias("ck"), "bi")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a = cnt.select(F.col("ck"), F.col("bi").alias("i"), F.col("n").alias("ni"))
    b = cnt.select(
        F.col("ck").alias("ck2"), F.col("bi").alias("j"), F.col("n").alias("nj")
    )
    pref = (
        a.join(b, (F.col("ck") == F.col("ck2")) & (F.col("i") != F.col("j")))
        .groupBy("i", "j")
        .agg(
            F.sum(
                F.when(
                    (F.col("ni") > F.col("nj"))
                    | ((F.col("ni") == F.col("nj")) & (F.col("i") < F.col("j"))),
                    1,
                ).otherwise(0)
            ).alias("w")
        )
        .localCheckpoint(eager=False)
    )
    perms = spark.createDataFrame(_PERMS4, ["p1", "p2", "p3", "p4"])
    pos = lambda col: (  # noqa: E731
        F.when(col == F.col("p1"), 1)
        .when(col == F.col("p2"), 2)
        .when(col == F.col("p3"), 3)
        .otherwise(4)
    )
    scored = (
        F.broadcast(perms)
        .crossJoin(pref)
        .groupBy("p1", "p2", "p3", "p4")
        .agg(
            F.sum(
                F.when(pos(F.col("i")) > pos(F.col("j")), F.col("w")).otherwise(0)
            ).alias("cost")
        )
    )
    best = scored.orderBy("cost", "p1", "p2", "p3", "p4").limit(1)
    tot = pref.agg(F.sum("w").alias("tw"))
    t = lambda k: top4.select(  # noqa: E731
        F.col("bi").alias(f"bi{k}"), F.col("b").alias(f"rank{k}")
    )
    return (
        best.join(F.broadcast(t(1)), F.col("p1") == F.col("bi1"))
        .join(F.broadcast(t(2)), F.col("p2") == F.col("bi2"))
        .join(F.broadcast(t(3)), F.col("p3") == F.col("bi3"))
        .join(F.broadcast(t(4)), F.col("p4") == F.col("bi4"))
        .crossJoin(F.broadcast(tot))
        .select(
            "rank1",
            "rank2",
            "rank3",
            "rank4",
            F.col("cost").cast("bigint").alias("kemeny_cost"),
            F.col("tw").cast("bigint").alias("total_pairs"),
        )
    )


# ---------------------------------------------------------------------------
# Q675 — Fréchet-Hoeffding bounds on joint probabilities
# ---------------------------------------------------------------------------
# For three behavior pairs (high balance & buyer, urgent-buyer &
# multi-order, auto-segment & high spend) the marginals pin the
# joint to [max(0, pa+pb-1), min(pa, pb)]; the observed joint's
# normalized position in that interval is a bounded dependence
# measure — the copula bounds (q418) in raw probability form.
_Q675_ORACLE = """
    WITH u AS MATERIALIZED (
      SELECT c.c_custkey AS ck,
             CASE WHEN c.c_acctbal > 0 THEN 1 ELSE 0 END AS a1,
             CASE WHEN COUNT(o.o_orderkey) > 0 THEN 1 ELSE 0 END AS b1,
             CASE WHEN SUM(CASE WHEN o.o_orderpriority = '1-URGENT'
                               THEN 1 ELSE 0 END) > 0 THEN 1 ELSE 0 END AS a2,
             CASE WHEN COUNT(o.o_orderkey) >= 2 THEN 1 ELSE 0 END AS b2,
             CASE WHEN c.c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS a3,
             CASE WHEN COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0)
                       > 10000000 THEN 1 ELSE 0 END AS b3
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_acctbal, c.c_mktsegment
    ), pairs AS (
      SELECT 1 AS pair_id, AVG(a1 * 1.0) AS pa, AVG(b1 * 1.0) AS pb,
             AVG(a1 * b1 * 1.0) AS pab FROM u
      UNION ALL
      SELECT 2, AVG(a2 * 1.0), AVG(b2 * 1.0), AVG(a2 * b2 * 1.0) FROM u
      UNION ALL
      SELECT 3, AVG(a3 * 1.0), AVG(b3 * 1.0), AVG(a3 * b3 * 1.0) FROM u
    )
    SELECT pair_id,
           ROUND(pa + 5e-12, 6) AS p_a,
           ROUND(pb + 5e-12, 6) AS p_b,
           ROUND(pab + 5e-12, 6) AS p_joint,
           ROUND(GREATEST(0, pa + pb - 1) + 5e-12, 6) AS frechet_lower,
           ROUND(LEAST(pa, pb) + 5e-12, 6) AS frechet_upper,
           ROUND(CASE WHEN LEAST(pa, pb) > GREATEST(0, pa + pb - 1)
                      THEN (pab - GREATEST(0, pa + pb - 1))
                           / (LEAST(pa, pb) - GREATEST(0, pa + pb - 1))
                 END + 5e-12, 6) AS dependence_position
    FROM pairs
    ORDER BY pair_id
"""


@register(
    "q675_frechet_bounds",
    _Q675_ORACLE,
    doc="Fréchet-Hoeffding bounds: three behavior pairs' joint "
    "probabilities located inside [max(0, pa+pb-1), min(pa, pb)], "
    "the normalized position as a bounded dependence measure — the "
    "probability-space face of the copula bounds (q418).",
)
def q675(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    u = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_acctbal", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("no"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("nu"),
            F.coalesce(
                F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0)
            ).alias("sp"),
        )
        .select(
            F.when(F.col("c_acctbal") > 0, 1).otherwise(0).alias("a1"),
            F.when(F.col("no") > 0, 1).otherwise(0).alias("b1"),
            F.when(F.col("nu") > 0, 1).otherwise(0).alias("a2"),
            F.when(F.col("no") >= 2, 1).otherwise(0).alias("b2"),
            F.when(F.col("c_mktsegment") == "AUTOMOBILE", 1)
            .otherwise(0)
            .alias("a3"),
            F.when(F.col("sp") > 10000000, 1).otherwise(0).alias("b3"),
        )
        .localCheckpoint(eager=False)
    )

    def pair(i: int):
        return u.agg(
            F.lit(i).alias("pair_id"),
            F.avg(F.col(f"a{i}") * 1.0).alias("pa"),
            F.avg(F.col(f"b{i}") * 1.0).alias("pb"),
            F.avg(F.col(f"a{i}") * F.col(f"b{i}") * 1.0).alias("pab"),
        )

    pairs = pair(1).unionAll(pair(2)).unionAll(pair(3))
    lo = F.greatest(F.lit(0.0), F.col("pa") + F.col("pb") - 1)
    hi = F.least(F.col("pa"), F.col("pb"))
    return pairs.select(
        "pair_id",
        r6(F.col("pa")).alias("p_a"),
        r6(F.col("pb")).alias("p_b"),
        r6(F.col("pab")).alias("p_joint"),
        r6(lo).alias("frechet_lower"),
        r6(hi).alias("frechet_upper"),
        r6(
            F.when(hi > lo, (F.col("pab") - lo) / (hi - lo))
        ).alias("dependence_position"),
    ).orderBy("pair_id")


# ---------------------------------------------------------------------------
# Q676 — Black-Scholes greeks via the shared A&S normal functions
# ---------------------------------------------------------------------------
# The q433 option re-priced for risk: delta = N(d1), gamma =
# phi(d1)/(S sigma sqrt(T)), vega = S phi(d1) sqrt(T), theta — all
# closed-form from the same Abramowitz-Stegun CDF both engines
# share, with data-derived spot, strike and volatility.
_Q676_CDF = """
             CASE WHEN {z} >= 0 THEN
               1 - EXP(-{z} * {z} / 2) * 0.3989422804014327
                 * ((((1.330274429 / (1 + 0.2316419 * {z}) - 1.821255978)
                      / (1 + 0.2316419 * {z}) + 1.781477937)
                     / (1 + 0.2316419 * {z}) - 0.356563782)
                    / (1 + 0.2316419 * {z}) + 0.319381530)
                 / (1 + 0.2316419 * {z})
             ELSE
               EXP(-{z} * {z} / 2) * 0.3989422804014327
                 * ((((1.330274429 / (1 - 0.2316419 * {z}) - 1.821255978)
                      / (1 - 0.2316419 * {z}) + 1.781477937)
                     / (1 - 0.2316419 * {z}) - 0.356563782)
                    / (1 - 0.2316419 * {z}) + 0.319381530)
                 / (1 - 0.2316419 * {z})
             END
"""

_Q676_ORACLE = f"""
    WITH params AS (
      SELECT AVG(ROUND(o_totalprice)) AS s,
             AVG(ROUND(o_totalprice)) * 1.05 AS k,
             GREATEST(0.15, LEAST(0.6,
               SQRT(AVG(ROUND(o_totalprice) * ROUND(o_totalprice))
                    - AVG(ROUND(o_totalprice)) * AVG(ROUND(o_totalprice)))
               / AVG(ROUND(o_totalprice)))) AS sig,
             CAST(0.25 AS DOUBLE) AS tt, CAST(0.03 AS DOUBLE) AS r
      FROM orders
    ), d AS (
      SELECT s, k, sig, tt, r,
             (LN(s / k) + (r + sig * sig / 2) * tt)
               / (sig * SQRT(tt)) AS d1,
             (LN(s / k) + (r - sig * sig / 2) * tt)
               / (sig * SQRT(tt)) AS d2
      FROM params
    ), g AS (
      SELECT s, k, sig, tt, r, d1, d2,
             ({_Q676_CDF.format(z='d1')}) AS nd1,
             ({_Q676_CDF.format(z='d2')}) AS nd2,
             EXP(-d1 * d1 / 2) * 0.3989422804014327 AS pd1
      FROM d
    )
    SELECT ROUND(nd1 + 5e-12, 6) AS delta,
           ROUND(pd1 / (s * sig * SQRT(tt)) * 1e4 + 5e-12, 6)
             AS gamma_x1e4,
           ROUND(s * pd1 * SQRT(tt) / 100 + 5e-10, 4) AS vega_per_pct,
           ROUND((-s * pd1 * sig / (2 * SQRT(tt))
                  - r * k * EXP(-r * tt) * nd2) / 365 + 5e-10, 4)
             AS theta_per_day,
           ROUND((s * nd1 - k * EXP(-r * tt) * nd2) + 5e-10, 4)
             AS call_price
    FROM g
"""


@register(
    "q676_bs_greeks",
    _Q676_ORACLE,
    doc="Black-Scholes greeks (delta, gamma, vega, theta) from the "
    "shared A&S normal CDF/pdf with data-derived spot, 5% OTM "
    "strike and clamped empirical volatility — the risk "
    "sensitivities beside the q433 price and q500 implied vol.",
)
def q676(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    rp = F.round("o_totalprice")
    params = o.agg(
        F.avg(rp).alias("s"),
        (F.avg(rp) * 1.05).alias("k"),
        F.greatest(
            F.lit(0.15),
            F.least(
                F.lit(0.6),
                F.sqrt(F.avg(rp * rp) - F.avg(rp) * F.avg(rp)) / F.avg(rp),
            ),
        ).alias("sig"),
        F.lit(0.25).alias("tt"),
        F.lit(0.03).alias("r"),
    )
    s, k, sig, tt, r = (
        F.col("s"),
        F.col("k"),
        F.col("sig"),
        F.col("tt"),
        F.col("r"),
    )
    d = params.select(
        "s",
        "k",
        "sig",
        "tt",
        "r",
        ((F.log(s / k) + (r + sig * sig / 2) * tt) / (sig * F.sqrt(tt))).alias(
            "d1"
        ),
        ((F.log(s / k) + (r - sig * sig / 2) * tt) / (sig * F.sqrt(tt))).alias(
            "d2"
        ),
    )

    def cdf(z):
        az = F.abs(z)
        t = 1 / (1 + 0.2316419 * az)
        poly = (
            (
                ((1.330274429 * t - 1.821255978) * t + 1.781477937) * t
                - 0.356563782
            )
            * t
            + 0.319381530
        ) * t
        tail = F.exp(-az * az / 2) * 0.3989422804014327 * poly
        return F.when(z >= 0, 1 - tail).otherwise(tail)

    g = d.select(
        "s",
        "k",
        "sig",
        "tt",
        "r",
        "d1",
        "d2",
        cdf(F.col("d1")).alias("nd1"),
        cdf(F.col("d2")).alias("nd2"),
        (
            F.exp(-F.col("d1") * F.col("d1") / 2) * 0.3989422804014327
        ).alias("pd1"),
    )
    return g.select(
        r6(F.col("nd1")).alias("delta"),
        r6(
            F.col("pd1") / (s * sig * F.sqrt(tt)) * 1e4
        ).alias("gamma_x1e4"),
        F.round(s * F.col("pd1") * F.sqrt(tt) / 100 + F.lit(5e-10), 4).alias(
            "vega_per_pct"
        ),
        F.round(
            (
                -s * F.col("pd1") * sig / (2 * F.sqrt(tt))
                - r * k * F.exp(-r * tt) * F.col("nd2")
            )
            / 365
            + F.lit(5e-10),
            4,
        ).alias("theta_per_day"),
        F.round(
            (s * F.col("nd1") - k * F.exp(-r * tt) * F.col("nd2"))
            + F.lit(5e-10),
            4,
        ).alias("call_price"),
    )


# ---------------------------------------------------------------------------
# Q677 — earned value management at the portfolio cutoff
# ---------------------------------------------------------------------------
# Each order is a project: plan says line j ships j days after the
# order date, actuals are l_shipdate. At the global median ship
# date, planned value, earned value and actual cost (tax-inflated)
# give SPI, CPI and the estimate-at-completion — the PM control
# panel, entirely from the schedule data.
_Q677_ORACLE = """
    WITH tasks AS MATERIALIZED (
      SELECT l.l_quantity AS q,
             l.l_quantity * (1 + l.l_tax) AS cost,
             CAST(o.o_orderdate AS DATE)
               + CAST(l.l_linenumber AS INTEGER) AS plan_d,
             CAST(l.l_shipdate AS DATE) AS ship_d
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ), cutoff AS (
      SELECT ship_d AS cut
      FROM (SELECT ship_d,
                   ROW_NUMBER() OVER (ORDER BY ship_d) AS rn,
                   COUNT(*) OVER () AS nn
            FROM tasks)
      WHERE rn = CAST(FLOOR((nn + 1) / 2) AS BIGINT)
    ), ev AS (
      SELECT SUM(CASE WHEN t.plan_d <= c.cut THEN t.q ELSE 0 END) AS pv,
             SUM(CASE WHEN t.ship_d <= c.cut THEN t.q ELSE 0 END) AS evv,
             SUM(CASE WHEN t.ship_d <= c.cut THEN t.cost ELSE 0 END) AS ac,
             SUM(t.q) AS bac
      FROM tasks t, cutoff c
    )
    SELECT ROUND(pv + 5e-10, 4) AS planned_value,
           ROUND(evv + 5e-10, 4) AS earned_value,
           ROUND(ac + 5e-10, 4) AS actual_cost,
           ROUND(evv / pv + 5e-12, 6) AS spi,
           ROUND(evv / ac + 5e-12, 6) AS cpi,
           ROUND(bac / (evv / ac) + 5e-10, 4) AS estimate_at_completion
    FROM ev
"""


@register(
    "q677_earned_value",
    _Q677_ORACLE,
    doc="Earned value management: plan = order date + line number, "
    "actual = ship date, cost = tax-inflated quantity; PV/EV/AC at "
    "the median ship date give SPI, CPI and EAC = BAC/CPI — the "
    "project-control panel next to CPM (q629) and PERT (q652).",
)
def q677(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    tasks = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("l_quantity").alias("q"),
        (F.col("l_quantity") * (1 + F.col("l_tax"))).alias("cost"),
        F.date_add(
            F.col("o_orderdate").cast("date"), F.col("l_linenumber")
        ).alias("plan_d"),
        F.col("l_shipdate").cast("date").alias("ship_d"),
    ).localCheckpoint(eager=False)
    cutoff = (
        tasks.select(
            "ship_d",
            F.row_number().over(Window.orderBy("ship_d")).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("nn"),
        )
        .filter(
            F.col("rn") == F.floor((F.col("nn") + 1) / 2).cast("bigint")
        )
        .select(F.col("ship_d").alias("cut"))
    )
    ev = tasks.crossJoin(F.broadcast(cutoff)).agg(
        F.sum(
            F.when(F.col("plan_d") <= F.col("cut"), F.col("q")).otherwise(0.0)
        ).alias("pv"),
        F.sum(
            F.when(F.col("ship_d") <= F.col("cut"), F.col("q")).otherwise(0.0)
        ).alias("evv"),
        F.sum(
            F.when(F.col("ship_d") <= F.col("cut"), F.col("cost")).otherwise(
                0.0
            )
        ).alias("ac"),
        F.sum("q").alias("bac"),
    )
    return ev.select(
        F.round(F.col("pv") + F.lit(5e-10), 4).alias("planned_value"),
        F.round(F.col("evv") + F.lit(5e-10), 4).alias("earned_value"),
        F.round(F.col("ac") + F.lit(5e-10), 4).alias("actual_cost"),
        r6(F.col("evv") / F.col("pv")).alias("spi"),
        r6(F.col("evv") / F.col("ac")).alias("cpi"),
        F.round(
            F.col("bac") / (F.col("evv") / F.col("ac")) + F.lit(5e-10), 4
        ).alias("estimate_at_completion"),
    )


# ---------------------------------------------------------------------------
# Q678 — histogram bin-width selection rules compared
# ---------------------------------------------------------------------------
# Sturges, Scott and Freedman-Diaconis bin counts for the order
# value distribution — the auto-binning rules every engine's
# histogram operator must choose among, with the IQR and sigma they
# depend on computed to match exactly.
_Q678_ORACLE = """
    WITH v AS MATERIALIZED (
      SELECT ROUND(o_totalprice * 100) / 100 AS x,
             o_orderkey AS ok
      FROM orders
    ), stats AS (
      SELECT COUNT(*) AS n,
             MAX(x) - MIN(x) AS rng,
             SQRT(AVG(x * x) - AVG(x) * AVG(x)) AS sd,
             quantile_cont(x, CAST(0.75 AS DOUBLE))
               - quantile_cont(x, CAST(0.25 AS DOUBLE)) AS iqr
      FROM v
    )
    SELECT CAST(n AS BIGINT) AS n_values,
           ROUND(rng + 5e-10, 4) AS value_range,
           CAST(CEIL(1 + LN(n) / LN(2)) AS BIGINT) AS sturges_bins,
           CAST(CEIL(rng / (3.49 * sd / POW(n, 1.0 / 3)))
                AS BIGINT) AS scott_bins,
           CAST(CEIL(rng / (2 * iqr / POW(n, 1.0 / 3)))
                AS BIGINT) AS fd_bins,
           ROUND(3.49 * sd / POW(n, 1.0 / 3) + 5e-10, 4) AS scott_width,
           ROUND(2 * iqr / POW(n, 1.0 / 3) + 5e-10, 4) AS fd_width
    FROM stats
"""


@register(
    "q678_bin_width_rules",
    _Q678_ORACLE,
    doc="Histogram auto-binning rules on order values: Sturges "
    "(1 + log2 n), Scott (3.49 sigma n^-1/3) and Freedman-Diaconis "
    "(2 IQR n^-1/3) bin counts and widths — the selector every "
    "histogram operator (q18) needs, with exact-matched sigma/IQR.",
)
def q678(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    v = o.select(
        (F.round(F.col("o_totalprice") * 100) / 100).alias("x")
    )
    stats = v.agg(
        F.count(F.lit(1)).alias("n"),
        (F.max("x") - F.min("x")).alias("rng"),
        F.sqrt(F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x")).alias(
            "sd"
        ),
        (
            F.expr("percentile(x, CAST(0.75 AS DOUBLE))")
            - F.expr("percentile(x, CAST(0.25 AS DOUBLE))")
        ).alias("iqr"),
    )
    n, rng, sd, iqr = F.col("n"), F.col("rng"), F.col("sd"), F.col("iqr")
    scott_w = 3.49 * sd / F.pow(n, 1.0 / 3)
    fd_w = 2 * iqr / F.pow(n, 1.0 / 3)
    return stats.select(
        n.cast("bigint").alias("n_values"),
        F.round(rng + F.lit(5e-10), 4).alias("value_range"),
        F.ceil(1 + F.log(n) / F.log(F.lit(2.0))).cast("bigint").alias(
            "sturges_bins"
        ),
        F.ceil(rng / scott_w).cast("bigint").alias("scott_bins"),
        F.ceil(rng / fd_w).cast("bigint").alias("fd_bins"),
        F.round(scott_w + F.lit(5e-10), 4).alias("scott_width"),
        F.round(fd_w + F.lit(5e-10), 4).alias("fd_width"),
    )
