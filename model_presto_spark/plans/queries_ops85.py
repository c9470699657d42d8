"""Conformance queries batch #85 (q619+) — omitted-variable bias,
two-part decomposition, collusion screens, Duane reliability
growth, and classical item analysis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q619 — omitted-variable bias, the exact identity
# ---------------------------------------------------------------------------
# Short regression (spend on balance) vs long (adding order count):
# the OVB formula says beta_short - beta_long = beta_omitted *
# slope(omitted ~ included) EXACTLY in OLS — both sides computed
# from the moment matrix and the gap reported as the certificate,
# the algebra behind every confounding story (q481/q533).
_Q619_ORACLE = """
    WITH u AS (
      SELECT LN(c.c_acctbal + 10000.0) AS x1,
             LN(1.0 + COUNT(o.o_orderkey)) AS x2,
             LN(1 + COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0)) AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_acctbal
    ), m AS (
      SELECT COUNT(*) AS n,
             SUM(x1) AS s1, SUM(x2) AS s2, SUM(y) AS sy,
             SUM(x1 * x1) AS s11, SUM(x1 * x2) AS s12,
             SUM(x2 * x2) AS s22, SUM(x1 * y) AS s1y, SUM(x2 * y) AS s2y
      FROM u
    ), c0 AS (
      SELECT s11 - s1 * s1 / n AS c11, s12 - s1 * s2 / n AS c12,
             s22 - s2 * s2 / n AS c22, s1y - s1 * sy / n AS c1y,
             s2y - s2 * sy / n AS c2y
      FROM m
    ), fits AS (
      SELECT c1y / c11 AS beta_short,
             (c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) AS beta_long,
             (c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12)
               AS beta_omitted,
             c12 / c11 AS aux_slope
      FROM c0
    )
    SELECT ROUND(beta_short + 5e-12, 6) AS beta_short,
           ROUND(beta_long + 5e-12, 6) AS beta_long,
           ROUND(beta_short - beta_long + 5e-12, 6) AS measured_bias,
           ROUND(beta_omitted * aux_slope + 5e-12, 6) AS formula_bias,
           ROUND(ABS(beta_short - beta_long - beta_omitted * aux_slope)
                 + 5e-12, 6) AS identity_gap
    FROM fits
"""


@register(
    "q619_omitted_variable",
    _Q619_ORACLE,
    doc="Omitted-variable bias as an exact identity: beta_short - "
    "beta_long == beta_omitted * slope(omitted ~ included), both "
    "sides from one moment matrix with the gap as the certificate "
    "— the algebra under every confounding claim (backdoor q481, "
    "mediation q533, E-value q508).",
)
def q619(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    u = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            F.log(1.0 + F.count("o_orderkey")).alias("x2"),
            F.log(
                1
                + F.coalesce(
                    F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0)
                )
            ).alias("y"),
        )
        .select(F.log(F.col("c_acctbal") + 10000.0).alias("x1"), "x2", "y")
    )
    m = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
    )
    n = F.col("n")
    c0 = m.select(
        (F.col("s11") - F.col("s1") * F.col("s1") / n).alias("c11"),
        (F.col("s12") - F.col("s1") * F.col("s2") / n).alias("c12"),
        (F.col("s22") - F.col("s2") * F.col("s2") / n).alias("c22"),
        (F.col("s1y") - F.col("s1") * F.col("sy") / n).alias("c1y"),
        (F.col("s2y") - F.col("s2") * F.col("sy") / n).alias("c2y"),
    )
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    beta_short = F.col("c1y") / F.col("c11")
    beta_long = (F.col("c1y") * F.col("c22") - F.col("c2y") * F.col("c12")) / det
    beta_om = (F.col("c2y") * F.col("c11") - F.col("c1y") * F.col("c12")) / det
    aux = F.col("c12") / F.col("c11")
    return c0.select(
        r6(beta_short).alias("beta_short"),
        r6(beta_long).alias("beta_long"),
        r6(beta_short - beta_long).alias("measured_bias"),
        r6(beta_om * aux).alias("formula_bias"),
        r6(F.abs(beta_short - beta_long - beta_om * aux)).alias(
            "identity_gap"
        ),
    )


# ---------------------------------------------------------------------------
# Q620 — two-part (hurdle) decomposition of a spend gap
# ---------------------------------------------------------------------------
# The AUTOMOBILE-vs-rest mean spend difference split EXACTLY into
# the participation margin (who buys at all) and the intensity
# margin (how much buyers spend):
# dE[Y] = dP * E[Y|buy, T] + P_C * dE[Y|buy] — the zero-heavy-
# outcome decomposition that one-part models blur (the identity is
# checked to the cent).
_Q620_ORACLE = """
    WITH u AS (
      SELECT CASE WHEN c.c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS t,
             COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0) AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_mktsegment
    ), parts AS (
      SELECT t, COUNT(*) AS n,
             AVG(CASE WHEN y > 0 THEN 1.0 ELSE 0 END) AS p_buy,
             AVG(y * 1.0) AS mean_all,
             AVG(CASE WHEN y > 0 THEN y * 1.0 END) AS mean_buyers
      FROM u GROUP BY t
    ), w AS (
      SELECT
        MAX(CASE WHEN t = 1 THEN mean_all END)
          - MAX(CASE WHEN t = 0 THEN mean_all END) AS total_gap,
        (MAX(CASE WHEN t = 1 THEN p_buy END)
         - MAX(CASE WHEN t = 0 THEN p_buy END))
          * MAX(CASE WHEN t = 1 THEN mean_buyers END) AS participation,
        MAX(CASE WHEN t = 0 THEN p_buy END)
          * (MAX(CASE WHEN t = 1 THEN mean_buyers END)
             - MAX(CASE WHEN t = 0 THEN mean_buyers END)) AS intensity
      FROM parts
    )
    SELECT ROUND(total_gap / 100.0 + 5e-8, 2) AS total_gap_usd,
           ROUND(participation / 100.0 + 5e-8, 2) AS participation_usd,
           ROUND(intensity / 100.0 + 5e-8, 2) AS intensity_usd,
           ROUND(ABS(total_gap - participation - intensity) / 100.0
                 + 5e-8, 2) AS identity_gap_usd
    FROM w
"""


@register(
    "q620_two_part_decomposition",
    _Q620_ORACLE,
    doc="Two-part (hurdle) decomposition: the segment spend gap split "
    "exactly into participation (extensive) and intensity "
    "(intensive) margins, identity checked to the cent — the "
    "zero-heavy-outcome lens beside the negbin fit (q588) and the "
    "Oaxaca-flavored waterfalls (q406).",
)
def q620(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    u = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.coalesce(F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0)).alias(
                "y"
            )
        )
        .select(
            F.when(F.col("c_mktsegment") == "AUTOMOBILE", 1).otherwise(0).alias(
                "t"
            ),
            "y",
        )
    )
    parts = u.groupBy("t").agg(
        F.avg(F.when(F.col("y") > 0, 1.0).otherwise(0.0)).alias("p_buy"),
        F.avg(F.col("y") * 1.0).alias("mean_all"),
        F.avg(F.when(F.col("y") > 0, F.col("y") * 1.0)).alias("mean_buyers"),
    )
    w = parts.agg(
        (
            F.max(F.when(F.col("t") == 1, F.col("mean_all")))
            - F.max(F.when(F.col("t") == 0, F.col("mean_all")))
        ).alias("total_gap"),
        (
            (
                F.max(F.when(F.col("t") == 1, F.col("p_buy")))
                - F.max(F.when(F.col("t") == 0, F.col("p_buy")))
            )
            * F.max(F.when(F.col("t") == 1, F.col("mean_buyers")))
        ).alias("participation"),
        (
            F.max(F.when(F.col("t") == 0, F.col("p_buy")))
            * (
                F.max(F.when(F.col("t") == 1, F.col("mean_buyers")))
                - F.max(F.when(F.col("t") == 0, F.col("mean_buyers")))
            )
        ).alias("intensity"),
    )
    r2 = lambda cexpr: F.round(cexpr + F.lit(5e-8), 2)  # noqa: E731
    return w.select(
        r2(F.col("total_gap") / 100.0).alias("total_gap_usd"),
        r2(F.col("participation") / 100.0).alias("participation_usd"),
        r2(F.col("intensity") / 100.0).alias("intensity_usd"),
        r2(
            F.abs(
                F.col("total_gap") - F.col("participation") - F.col("intensity")
            )
            / 100.0
        ).alias("identity_gap_usd"),
    )


# ---------------------------------------------------------------------------
# Q621 — bid-rigging screens on the auction groups
# ---------------------------------------------------------------------------
# Forensic-economics screens over the q416 auctions: the coefficient
# of variation of bids within each auction (suspiciously LOW spread
# flags coordination), the relative distance between the top two
# bids, and the share of auctions failing both screens — the
# variance screen literature as three aggregations.
_Q621_ORACLE = """
    WITH bids AS (
      SELECT o_custkey % 300 AS auction, o_totalprice AS bid
      FROM orders
    ), per AS (
      SELECT auction, COUNT(*) AS n, AVG(bid) AS mu,
             stddev_pop(bid) AS sd,
             MAX(bid) AS b1
      FROM bids GROUP BY auction HAVING COUNT(*) >= 5
    ), top2 AS (
      SELECT auction,
             MAX(CASE WHEN rk = 1 THEN bid END) AS b1,
             MAX(CASE WHEN rk = 2 THEN bid END) AS b2
      FROM (
        SELECT auction, bid,
               ROW_NUMBER() OVER (PARTITION BY auction
                                  ORDER BY bid DESC) AS rk
        FROM bids) WHERE rk <= 2 GROUP BY auction
    ), screens AS (
      SELECT p.auction, p.sd / p.mu AS cv,
             (t.b1 - t.b2) / t.b1 AS top_gap
      FROM per p JOIN top2 t ON t.auction = p.auction
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_auctions,
           ROUND(AVG(cv) + 5e-12, 6) AS mean_bid_cv,
           ROUND(quantile_cont(cv, 0.1) + 5e-12, 6) AS p10_bid_cv,
           ROUND(AVG(top_gap) + 5e-12, 6) AS mean_top_gap,
           ROUND(AVG(CASE WHEN cv < 0.3 AND top_gap < 0.02
                          THEN 1.0 ELSE 0 END) + 5e-12, 6)
             AS flagged_share
    FROM screens
"""


@register(
    "q621_collusion_screen",
    _Q621_ORACLE,
    doc="Bid-rigging screens: within-auction bid CV (low spread flags "
    "coordination), the relative top-two gap, and the share of "
    "auctions failing both — forensic-economics variance screens "
    "over the auction stack (q416/q496/q559).",
)
def q621(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    bids = o.select(
        (F.col("o_custkey") % 300).alias("auction"),
        F.col("o_totalprice").alias("bid"),
    ).localCheckpoint(eager=False)
    per = (
        bids.groupBy("auction")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("bid").alias("mu"),
            F.stddev_pop("bid").alias("sd"),
        )
        .filter(F.col("n") >= 5)
    )
    ranked = bids.select(
        "auction",
        "bid",
        F.row_number()
        .over(Window.partitionBy("auction").orderBy(F.desc("bid")))
        .alias("rk"),
    )
    top2 = (
        ranked.filter(F.col("rk") <= 2)
        .groupBy("auction")
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("bid"))).alias("b1"),
            F.max(F.when(F.col("rk") == 2, F.col("bid"))).alias("b2"),
        )
    )
    screens = per.join(top2, "auction").select(
        (F.col("sd") / F.col("mu")).alias("cv"),
        ((F.col("b1") - F.col("b2")) / F.col("b1")).alias("top_gap"),
    )
    return screens.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_auctions"),
        r6(F.avg("cv")).alias("mean_bid_cv"),
        r6(F.percentile("cv", F.lit(0.1))).alias("p10_bid_cv"),
        r6(F.avg("top_gap")).alias("mean_top_gap"),
        r6(
            F.avg(
                F.when(
                    (F.col("cv") < 0.3) & (F.col("top_gap") < 0.02), 1.0
                ).otherwise(0.0)
            )
        ).alias("flagged_share"),
    )


# ---------------------------------------------------------------------------
# Q622 — Duane reliability growth
# ---------------------------------------------------------------------------
# Cumulative error count vs operating time in log-log: the Duane
# model says cumulative MTBF grows as t^alpha under reliability
# improvement, so the log-log slope of N(t)/t diagnoses whether the
# system is actually getting better (alpha > 0) — the growth view
# beside the Weibull hazard fit (q421) and MTBF point estimate
# (q602).
_Q622_ORACLE = """
    WITH errs AS (
      SELECT epoch_us(ts) / 1e6 AS t,
             ROW_NUMBER() OVER (ORDER BY ts, event_id) AS n
      FROM events WHERE event_type = 'error'
    ), t0 AS (SELECT MIN(t) AS t0 FROM errs
    ), pts AS (
      SELECT LN(e.t - t0.t0 + 1) AS x,
             LN((e.t - t0.t0 + 1) / e.n) AS y
      FROM errs e, t0 WHERE e.n % 50 = 0
    ), m AS (
      SELECT COUNT(*) AS k, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
      FROM pts
    )
    SELECT CAST(k AS BIGINT) AS n_points,
           ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx) + 5e-12, 6)
             AS duane_alpha,
           ROUND((k * sxy - sx * sy) * (k * sxy - sx * sy)
                 / ((k * sxx - sx * sx) * (k * syy - sy * sy)) + 5e-12, 6)
             AS r2,
           (k * sxy - sx * sy) / (k * sxx - sx * sx) > 0
             AS reliability_growing
    FROM m
"""


@register(
    "q622_duane_growth",
    _Q622_ORACLE,
    doc="Duane reliability growth: cumulative MTBF t/N(t) vs t in "
    "log-log at every 50th failure — a positive slope alpha means "
    "the system improves with operating time; the growth-curve "
    "complement to the Weibull fit (q421) and Young-Daly MTBF "
    "(q602).",
)
def q622(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    errs = ev.select(
        (F.unix_micros(F.col("ts").cast("timestamp")) / 1e6).alias("t"),
        F.row_number().over(Window.orderBy("ts", "event_id")).alias("n"),
    )
    t0 = errs.agg(F.min("t").alias("t0"))
    pts = (
        errs.filter(F.col("n") % 50 == 0)
        .crossJoin(F.broadcast(t0))
        .select(
            F.log(F.col("t") - F.col("t0") + 1).alias("x"),
            F.log((F.col("t") - F.col("t0") + 1) / F.col("n")).alias("y"),
        )
    )
    m = pts.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    k, sx, sy = F.col("k"), F.col("sx"), F.col("sy")
    slope = (k * F.col("sxy") - sx * sy) / (k * F.col("sxx") - sx * sx)
    r2f = (
        (k * F.col("sxy") - sx * sy)
        * (k * F.col("sxy") - sx * sy)
        / ((k * F.col("sxx") - sx * sx) * (k * F.col("syy") - sy * sy))
    )
    return m.select(
        k.cast("bigint").alias("n_points"),
        r6(slope).alias("duane_alpha"),
        r6(r2f).alias("r2"),
        (slope > 0).alias("reliability_growing"),
    )


# ---------------------------------------------------------------------------
# Q623 — classical test theory: item difficulty and discrimination
# ---------------------------------------------------------------------------
# Brands as test items (bought = correct): item difficulty p and the
# corrected item-rest discrimination (correlation with the total
# score EXCLUDING the item — uncorrected item-total is inflated by
# construction) — the CTT item-analysis table that precedes the
# Rasch calibration (q534), with Cronbach alpha's ingredients
# (q232) visible per item.
_Q623_ORACLE = """
    WITH items AS MATERIALIZED (
      SELECT p.p_brand AS brand
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand ORDER BY COUNT(*) DESC, brand LIMIT 8
    ), resp AS MATERIALIZED (
      SELECT o.o_custkey AS person, i.brand,
             MAX(CASE WHEN p.p_brand = i.brand THEN 1 ELSE 0 END) AS x
      FROM orders o
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      CROSS JOIN items i
      GROUP BY o.o_custkey, i.brand
    ), tot AS MATERIALIZED (
      SELECT person, SUM(x) AS score FROM resp GROUP BY person
    ), joined AS MATERIALIZED (
      SELECT r.brand, r.x, t.score - r.x AS rest
      FROM resp r JOIN tot t ON t.person = r.person
    )
    SELECT brand,
           ROUND(AVG(x * 1.0) + 5e-12, 6) AS difficulty_p,
           ROUND(corr(x * 1.0, rest * 1.0) + 5e-12, 6)
             AS item_rest_discrimination,
           CAST(COUNT(*) AS BIGINT) AS n_persons
    FROM joined GROUP BY brand
    ORDER BY item_rest_discrimination DESC, brand
"""


@register(
    "q623_item_discrimination",
    _Q623_ORACLE,
    doc="Classical test theory item analysis: difficulty p and the "
    "CORRECTED item-rest discrimination (correlation with the total "
    "minus the item, avoiding the part-whole inflation) for the "
    "8-brand response matrix — the screening table before Rasch "
    "calibration (q534), Cronbach alpha's (q232) per-item view.",
)
def q623(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lp = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).join(
        o, li.l_orderkey == o.o_orderkey
    ).localCheckpoint(eager=False)
    items = (
        lp.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "p_brand")
        .limit(8)
        .select(F.col("p_brand").alias("brand"))
    )
    # Sparse ownership + dense reconstruction instead of the
    # crossJoin(items) blow-up: the old shape shuffled
    # |lp| x |items| rows (4.8M at sf0.1) through the groupBy just to
    # mark x=0 cells. Only actual (person, brand) matches shuffle now
    # (~190k), and the zero cells come from the persons x items grid
    # left-joined to them (80k rows). Same respondent matrix;
    # 3.2 s -> ~1.3 s steady at sf0.1.
    owned = (
        lp.join(F.broadcast(items), lp.p_brand == F.col("brand"))
        .groupBy(F.col("o_custkey").alias("person"), "brand")
        .agg(F.lit(1).alias("x1"))
    )
    persons = lp.select(F.col("o_custkey").alias("person")).distinct()
    resp = (
        persons.crossJoin(F.broadcast(items))
        .join(owned, ["person", "brand"], "left")
        .select("person", "brand", F.coalesce("x1", F.lit(0)).alias("x"))
        .localCheckpoint(eager=False)
    )
    tot = resp.groupBy("person").agg(F.sum("x").alias("score"))
    joined = resp.join(tot, "person").select(
        "brand", "x", (F.col("score") - F.col("x")).alias("rest")
    )
    return (
        joined.groupBy("brand")
        .agg(
            r6(F.avg(F.col("x") * 1.0)).alias("difficulty_p"),
            r6(F.corr(F.col("x") * 1.0, F.col("rest") * 1.0)).alias(
                "item_rest_discrimination"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_persons"),
        )
        .orderBy(F.desc("item_rest_discrimination"), "brand")
    )
