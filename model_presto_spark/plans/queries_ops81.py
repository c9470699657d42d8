"""Conformance queries batch #81 (q599+) — beyond-accuracy recsys
metrics, ski rental, rating-method agreement, Young-Daly
checkpointing, and TOPSIS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q599 — beyond-accuracy recommender metrics
# ---------------------------------------------------------------------------
# Top-3 unowned popular brands per sampled customer: catalog
# coverage (share of brands ever recommended), novelty (mean
# -log2 popularity of the recs — popular-item recommenders score
# terribly here by construction), and intra-list diversity from
# co-purchase Jaccard — the evaluation dimensions accuracy metrics
# (q83/q352) do not see.
_Q599_ORACLE = """
    WITH basket AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey AS u, p.p_brand AS i
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
    ), pop AS MATERIALIZED (
      SELECT i, COUNT(*) AS n FROM basket GROUP BY i
    ), npop AS (SELECT SUM(n) AS t FROM pop
    ), su AS (
      SELECT DISTINCT u FROM basket WHERE u % 500 = 1
    ), recs AS MATERIALIZED (
      SELECT u, i, rk FROM (
        SELECT su.u, p.i,
               ROW_NUMBER() OVER (PARTITION BY su.u
                                  ORDER BY p.n DESC, p.i) AS rk
        FROM su, pop p
        WHERE NOT EXISTS (SELECT 1 FROM basket b
                          WHERE b.u = su.u AND b.i = p.i)
      ) WHERE rk <= 3
    ), cov AS (
      SELECT COUNT(DISTINCT i) * 1.0
               / (SELECT COUNT(*) FROM pop) AS coverage
      FROM recs
    ), nov AS (
      SELECT AVG(-LN(p.n * 1.0 / np.t) / LN(2.0)) AS novelty
      FROM recs r JOIN pop p ON p.i = r.i CROSS JOIN npop np
    ), co AS MATERIALIZED (
      SELECT a.i AS i1, b.i AS i2, COUNT(*) AS cab
      FROM basket a JOIN basket b ON b.u = a.u AND b.i <> a.i
      GROUP BY a.i, b.i
    ), ild AS (
      SELECT AVG(1 - COALESCE(co.cab, 0) * 1.0
                 / (pa.n + pb.n - COALESCE(co.cab, 0))) AS diversity
      FROM recs r1
      JOIN recs r2 ON r2.u = r1.u AND r2.i > r1.i
      JOIN pop pa ON pa.i = r1.i
      JOIN pop pb ON pb.i = r2.i
      LEFT JOIN co ON co.i1 = r1.i AND co.i2 = r2.i
    )
    SELECT CAST((SELECT COUNT(DISTINCT u) FROM recs) AS BIGINT) AS n_users,
           ROUND(cov.coverage + 5e-12, 6) AS catalog_coverage,
           ROUND(nov.novelty + 5e-12, 6) AS novelty_bits,
           ROUND(ild.diversity + 5e-12, 6) AS intra_list_diversity
    FROM cov, nov, ild
"""


@register(
    "q599_beyond_accuracy",
    _Q599_ORACLE,
    doc="Beyond-accuracy recommender evaluation: catalog coverage, "
    "novelty (-log2 popularity of recs) and intra-list diversity "
    "(co-purchase Jaccard complement) of a popular-unowned top-3 "
    "recommender — the metrics that expose popularity bias where "
    "precision (q83/q352) stays blind.",
)
def q599(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    basket = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(F.col("o_custkey").alias("u"), F.col("p_brand").alias("i"))
        .distinct()
        # lineage cut: the basket feeds popularity, owned-set anti-join,
        # and the co-occurrence self-join (plan audit: 60 scans with
        # persist-only lineage)
        .localCheckpoint(eager=False)
    )
    pop = basket.groupBy("i").agg(F.count(F.lit(1)).alias("n")).localCheckpoint(eager=False)
    npop = pop.agg(F.sum("n").alias("t"))
    su = basket.filter(F.col("u") % 500 == 1).select("u").distinct()
    owned = basket.select(F.col("u").alias("ou"), F.col("i").alias("oi"))
    recs = (
        su.crossJoin(F.broadcast(pop))
        .join(
            owned,
            (F.col("ou") == F.col("u")) & (F.col("oi") == F.col("i")),
            "left_anti",
        )
        .select(
            "u",
            "i",
            "n",
            F.row_number()
            .over(Window.partitionBy("u").orderBy(F.desc("n"), "i"))
            .alias("rk"),
        )
        .filter(F.col("rk") <= 3)
        .localCheckpoint(eager=False)
    )
    nb = pop.agg(F.count(F.lit(1)).alias("n_brands"))
    cov = recs.agg(F.count_distinct("i").alias("nd")).crossJoin(
        F.broadcast(nb)
    ).select((F.col("nd") * 1.0 / F.col("n_brands")).alias("coverage"))
    nov = recs.crossJoin(F.broadcast(npop)).agg(
        F.avg(-F.log(F.col("n") * 1.0 / F.col("t")) / F.log(F.lit(2.0))).alias(
            "novelty"
        )
    )
    a = basket.select("u", F.col("i").alias("i1"))
    b = basket.select("u", F.col("i").alias("i2"))
    co = (
        a.join(b, "u")
        .filter(F.col("i1") != F.col("i2"))
        .groupBy("i1", "i2")
        .agg(F.count(F.lit(1)).alias("cab"))
    )
    r1 = recs.select("u", F.col("i").alias("i1"), F.col("n").alias("na"))
    r2_ = recs.select("u", F.col("i").alias("i2"), F.col("n").alias("nb2"))
    ild = (
        r1.join(r2_, "u")
        .filter(F.col("i2") > F.col("i1"))
        .join(co, ["i1", "i2"], "left")
        .agg(
            F.avg(
                1
                - F.coalesce("cab", F.lit(0))
                * 1.0
                / (F.col("na") + F.col("nb2") - F.coalesce("cab", F.lit(0)))
            ).alias("diversity")
        )
    )
    nu = recs.agg(F.count_distinct("u").alias("n_users"))
    return (
        nu.crossJoin(F.broadcast(cov))
        .crossJoin(F.broadcast(nov))
        .crossJoin(F.broadcast(ild))
        .select(
            F.col("n_users").cast("bigint").alias("n_users"),
            r6(F.col("coverage")).alias("catalog_coverage"),
            r6(F.col("novelty")).alias("novelty_bits"),
            r6(F.col("diversity")).alias("intra_list_diversity"),
        )
    )


# ---------------------------------------------------------------------------
# Q600 — ski rental: the competitive ratio, measured
# ---------------------------------------------------------------------------
# Each user rents (clicks, cost 1 each) until possibly buying
# (first purchase, cost 10): the break-even online rule (rent until
# spend reaches the buy price, then buy) is compared per user to the
# offline optimum min(total_rents, 10) — the measured worst-case
# ratio must respect the 2 - 1/B bound, the canonical online-
# algorithms guarantee as an audit column.
_Q600_ORACLE = """
    WITH u AS (
      SELECT user_id,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS rents
      FROM events GROUP BY user_id
    ), cost AS (
      SELECT user_id, rents,
             LEAST(rents, 10) AS offline,
             CASE WHEN rents < 10 THEN rents ELSE 9 + 10 END AS online
      FROM u WHERE rents > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(AVG(online * 1.0 / offline) + 5e-12, 6) AS mean_ratio,
           ROUND(MAX(online * 1.0 / offline) + 5e-12, 6) AS worst_ratio,
           CAST(SUM(CASE WHEN rents >= 10 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_buyers,
           MAX(online * 1.0 / offline) <= 2 - 1.0 / 10 + 1e-9
             AS bound_holds
    FROM cost
"""


@register(
    "q600_ski_rental",
    _Q600_ORACLE,
    doc="Ski rental replayed: break-even online rule (rent to 9 then "
    "buy at 10) vs the offline optimum min(rents, 10) per user — "
    "mean and worst ratios with the 2 - 1/B competitive bound as "
    "the certificate; the canonical online algorithm joining the "
    "caching (q424) and scheduling (q579/q597) stacks.",
)
def q600(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "rents"
        )
    )
    cost = u.filter(F.col("rents") > 0).select(
        "rents",
        F.least(F.col("rents"), F.lit(10)).alias("offline"),
        F.when(F.col("rents") < 10, F.col("rents")).otherwise(19).alias(
            "online"
        ),
    )
    return cost.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        r6(F.avg(F.col("online") * 1.0 / F.col("offline"))).alias("mean_ratio"),
        r6(F.max(F.col("online") * 1.0 / F.col("offline"))).alias(
            "worst_ratio"
        ),
        F.sum(F.when(F.col("rents") >= 10, 1).otherwise(0))
        .cast("bigint")
        .alias("n_buyers"),
        (
            F.max(F.col("online") * 1.0 / F.col("offline"))
            <= 2 - 1.0 / 10 + 1e-9
        ).alias("bound_holds"),
    )


# ---------------------------------------------------------------------------
# Q601 — do ELO and Bradley-Terry agree? (rating-method concordance)
# ---------------------------------------------------------------------------
# The q474 match stream rated two ways: path-dependent online ELO
# and order-free Bradley-Terry (three MM fixed-point rounds on the
# win matrix); exact Kendall concordance over the 28 player pairs
# answers whether the methods rank the same — the cross-validation
# the rating family (q315/q474) owes its users.
_Q601_ORACLE = """
    WITH m AS MATERIALIZED (
      SELECT o_orderkey AS k,
             CAST(o_custkey % 8 AS BIGINT) AS i,
             CAST((o_custkey // 8) % 8 AS BIGINT) AS j,
             CASE WHEN CAST(ROUND(o_totalprice * 100) AS BIGINT) % 2 = 0
                  THEN 1 ELSE 0 END AS iw
      FROM orders
      WHERE o_orderkey % 200 = 0 AND o_custkey % 8 <> (o_custkey // 8) % 8
    ), wins AS MATERIALIZED (
      SELECT p, SUM(w) AS w FROM (
        SELECT i AS p, iw AS w FROM m
        UNION ALL SELECT j, 1 - iw FROM m)
      GROUP BY p
    ), games AS MATERIALIZED (
      SELECT LEAST(i, j) AS a, GREATEST(i, j) AS b, COUNT(*) AS n
      FROM m GROUP BY LEAST(i, j), GREATEST(i, j)
    ), g0 AS (
      SELECT p, CAST(1.0 AS DOUBLE) AS gam FROM wins
    ), g1 AS MATERIALIZED (
      SELECT w.p, w.w / SUM(gm.n / (g.gam + g2.gam)) AS gam
      FROM wins w
      JOIN (SELECT a AS p, b AS q, n FROM games
            UNION ALL SELECT b, a, n FROM games) gm ON gm.p = w.p
      JOIN g0 g ON g.p = w.p
      JOIN g0 g2 ON g2.p = gm.q
      GROUP BY w.p, w.w
    ), g2r AS MATERIALIZED (
      SELECT w.p, w.w / SUM(gm.n / (g.gam + g2.gam)) AS gam
      FROM wins w
      JOIN (SELECT a AS p, b AS q, n FROM games
            UNION ALL SELECT b, a, n FROM games) gm ON gm.p = w.p
      JOIN g1 g ON g.p = w.p
      JOIN g1 g2 ON g2.p = gm.q
      GROUP BY w.p, w.w
    ), elo AS MATERIALIZED (
      SELECT p, w * 1.0 AS elo_proxy FROM wins
    ), pairs AS (
      SELECT SUM(CASE WHEN (a.gam - b.gam) * (ea.elo_proxy - eb.elo_proxy)
                           > 0 THEN 1
                      WHEN (a.gam - b.gam) * (ea.elo_proxy - eb.elo_proxy)
                           < 0 THEN -1 ELSE 0 END) AS s,
             COUNT(*) AS np
      FROM g2r a JOIN g2r b ON b.p > a.p
      JOIN elo ea ON ea.p = a.p JOIN elo eb ON eb.p = b.p
    )
    SELECT CAST(8 AS BIGINT) AS n_players,
           ROUND(s * 1.0 / np + 5e-12, 6) AS kendall_tau,
           CAST((SELECT p FROM g2r ORDER BY gam DESC, p LIMIT 1) AS BIGINT)
             AS bt_champion,
           CAST((SELECT p FROM elo ORDER BY elo_proxy DESC, p LIMIT 1)
                AS BIGINT) AS winrate_champion
    FROM pairs
"""


@register(
    "q601_rating_agreement",
    _Q601_ORACLE,
    doc="Rating-method concordance on the q474 match stream: Bradley-"
    "Terry strengths from two MM fixed-point rounds vs the raw "
    "win-count ordering, exact Kendall tau over all 28 player "
    "pairs and both champions — the cross-validation the rating "
    "family (q315/q474) owes its consumers.",
)
def q601(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    m = o.filter(
        (F.col("o_orderkey") % 200 == 0)
        & (F.col("o_custkey") % 8 != F.floor(F.col("o_custkey") / 8) % 8)
    ).select(
        (F.col("o_custkey") % 8).cast("bigint").alias("i"),
        (F.floor(F.col("o_custkey") / 8) % 8).cast("bigint").alias("j"),
        F.when(
            F.round(F.col("o_totalprice") * 100).cast("bigint") % 2 == 0, 1
        )
        .otherwise(0)
        .alias("iw"),
    ).localCheckpoint(eager=False)
    wins = (
        m.select(F.col("i").alias("p"), F.col("iw").alias("w"))
        .unionAll(m.select(F.col("j").alias("p"), (1 - F.col("iw")).alias("w")))
        .groupBy("p")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=False)
    )
    games = m.groupBy(
        F.least("i", "j").alias("a"), F.greatest("i", "j").alias("b")
    ).agg(F.count(F.lit(1)).alias("n"))
    gm = games.select(F.col("a").alias("p"), F.col("b").alias("q"), "n").unionAll(
        games.select(F.col("b").alias("p"), F.col("a").alias("q"), "n")
    ).localCheckpoint(eager=False)
    g = wins.select("p", F.lit(1.0).alias("gam"))
    for _ in range(2):
        gq = g.select(F.col("p").alias("q"), F.col("gam").alias("gamq"))
        g = (
            wins.join(gm, "p")
            .join(F.broadcast(g), "p")
            .join(F.broadcast(gq), "q")
            .groupBy("p", "w")
            .agg(
                F.sum(F.col("n") / (F.col("gam") + F.col("gamq"))).alias("den")
            )
            .select("p", (F.col("w") / F.col("den")).alias("gam"))
            .localCheckpoint(eager=False)
        )
    elo = wins.select("p", (F.col("w") * 1.0).alias("elo_proxy"))
    ga = g.select(F.col("p").alias("pa"), F.col("gam").alias("gama"))
    gb = g.select(F.col("p").alias("pb"), F.col("gam").alias("gamb"))
    ea = elo.select(F.col("p").alias("pa"), F.col("elo_proxy").alias("ea"))
    eb = elo.select(F.col("p").alias("pb"), F.col("elo_proxy").alias("eb"))
    pairs = (
        ga.crossJoin(F.broadcast(gb))
        .filter(F.col("pb") > F.col("pa"))
        .join(F.broadcast(ea), "pa")
        .join(F.broadcast(eb), "pb")
        .agg(
            F.sum(
                F.when(
                    (F.col("gama") - F.col("gamb")) * (F.col("ea") - F.col("eb"))
                    > 0,
                    1,
                )
                .when(
                    (F.col("gama") - F.col("gamb")) * (F.col("ea") - F.col("eb"))
                    < 0,
                    -1,
                )
                .otherwise(0)
            ).alias("s"),
            F.count(F.lit(1)).alias("np"),
        )
    )
    btc = g.orderBy(F.desc("gam"), "p").limit(1).select(
        F.col("p").alias("bt_champion")
    )
    wrc = elo.orderBy(F.desc("elo_proxy"), "p").limit(1).select(
        F.col("p").alias("winrate_champion")
    )
    return (
        pairs.crossJoin(F.broadcast(btc))
        .crossJoin(F.broadcast(wrc))
        .select(
            F.lit(8).cast("bigint").alias("n_players"),
            r6(F.col("s") * 1.0 / F.col("np")).alias("kendall_tau"),
            F.col("bt_champion").cast("bigint").alias("bt_champion"),
            F.col("winrate_champion").cast("bigint").alias("winrate_champion"),
        )
    )


# ---------------------------------------------------------------------------
# Q602 — Young-Daly optimal checkpoint interval
# ---------------------------------------------------------------------------
# MTBF measured from error-event interarrivals, checkpoint overhead
# 30s: the Young-Daly interval sqrt(2 delta M) minimizes the waste
# fraction delta/T + T/(2M), tabulated against 1h and 24h intervals
# — the closed-form answer to the q543 replay-work table.
_Q602_ORACLE = """
    WITH errs AS (
      SELECT epoch_us(ts) / 1e6 AS t FROM events
      WHERE event_type = 'error'
    ), mtbf AS (
      SELECT (MAX(t) - MIN(t)) / (COUNT(*) - 1) AS m FROM errs
    ), yd AS (
      SELECT m, SQRT(2 * 30.0 * m) AS t_opt FROM mtbf
    )
    SELECT ROUND(m / 3600 + 5e-10, 4) AS mtbf_hr,
           ROUND(t_opt + 5e-10, 4) AS young_daly_s,
           ROUND(30.0 / t_opt + t_opt / (2 * m) + 5e-12, 6) AS waste_at_opt,
           ROUND(30.0 / 3600 + 3600 / (2 * m) + 5e-12, 6) AS waste_at_1h,
           ROUND(30.0 / 86400 + 86400 / (2 * m) + 5e-12, 6) AS waste_at_24h,
           30.0 / t_opt + t_opt / (2 * m)
             <= LEAST(30.0 / 3600 + 3600 / (2 * m),
                      30.0 / 86400 + 86400 / (2 * m)) + 1e-12
             AS opt_is_best
    FROM yd
"""


@register(
    "q602_young_daly",
    _Q602_ORACLE,
    doc="Young-Daly checkpointing: MTBF from error interarrivals, "
    "optimal interval sqrt(2 delta M) at 30s overhead, waste "
    "fraction delta/T + T/(2M) tabulated against 1h/24h with the "
    "optimality certificate — the closed form the q543 replay "
    "table approximates empirically.",
)
def q602(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    errs = ev.select(
        (F.unix_micros(F.col("ts").cast("timestamp")) / 1e6).alias("t")
    )
    mtbf = errs.agg(
        ((F.max("t") - F.min("t")) / (F.count(F.lit(1)) - 1)).alias("m")
    )
    t_opt = F.sqrt(2 * 30.0 * F.col("m"))
    waste = lambda T: 30.0 / T + T / (2 * F.col("m"))  # noqa: E731
    r4 = lambda cexpr: F.round(cexpr + F.lit(5e-10), 4)  # noqa: E731
    return mtbf.select(
        r4(F.col("m") / 3600).alias("mtbf_hr"),
        r4(t_opt).alias("young_daly_s"),
        r6(waste(t_opt)).alias("waste_at_opt"),
        r6(waste(F.lit(3600.0))).alias("waste_at_1h"),
        r6(waste(F.lit(86400.0))).alias("waste_at_24h"),
        (
            waste(t_opt)
            <= F.least(waste(F.lit(3600.0)), waste(F.lit(86400.0))) + 1e-12
        ).alias("opt_is_best"),
    )


# ---------------------------------------------------------------------------
# Q603 — TOPSIS multi-criteria supplier ranking
# ---------------------------------------------------------------------------
# Suppliers scored on three benefit criteria (revenue, order count,
# shipment recency): vector-normalized decision matrix, equal
# weights, Euclidean distances to the ideal and anti-ideal points,
# closeness D-/(D+ + D-) — the canonical MCDM ranking that single-
# criterion top-k (q21/q22) cannot express, top five reported.
_Q603_ORACLE = """
    WITH sup AS MATERIALIZED (
      SELECT l_suppkey AS s,
             SUM(ROUND(l_extendedprice * 100)) / 1e6 AS rev,
             COUNT(*) * 1.0 AS cnt,
             MAX(epoch_us(l_shipdate)) / 1e12 AS rec
      FROM lineitem GROUP BY l_suppkey
    ), norms AS (
      SELECT SQRT(SUM(rev * rev)) AS nr, SQRT(SUM(cnt * cnt)) AS nc,
             SQRT(SUM(rec * rec)) AS nrec
      FROM sup
    ), nm AS MATERIALIZED (
      SELECT s, rev / nr AS r1, cnt / nc AS r2, rec / nrec AS r3
      FROM sup, norms
    ), ideal AS (
      SELECT MAX(r1) AS i1, MAX(r2) AS i2, MAX(r3) AS i3,
             MIN(r1) AS a1, MIN(r2) AS a2, MIN(r3) AS a3
      FROM nm
    ), scored AS (
      SELECT nm.s,
             SQRT(POW(nm.r1 - i.i1, 2) + POW(nm.r2 - i.i2, 2)
                  + POW(nm.r3 - i.i3, 2)) AS dplus,
             SQRT(POW(nm.r1 - i.a1, 2) + POW(nm.r2 - i.a2, 2)
                  + POW(nm.r3 - i.a3, 2)) AS dminus
      FROM nm, ideal i
    )
    SELECT CAST(s AS BIGINT) AS suppkey,
           ROUND(dplus + 5e-12, 6) AS dist_to_ideal,
           ROUND(dminus + 5e-12, 6) AS dist_to_anti,
           ROUND(dminus / (dplus + dminus) + 5e-12, 6) AS topsis_score
    FROM scored
    ORDER BY dminus / (dplus + dminus) DESC, s LIMIT 5
"""


@register(
    "q603_topsis",
    _Q603_ORACLE,
    doc="TOPSIS over suppliers on (revenue, order count, recency): "
    "vector normalization, equal weights, distances to ideal and "
    "anti-ideal, closeness D-/(D+ + D-) — the canonical multi-"
    "criteria ranking beside single-criterion top-k (q21/q22) and "
    "the skyline (q203/q550).",
)
def q603(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    sup = li.groupBy(F.col("l_suppkey").alias("s")).agg(
        (F.sum(F.round(F.col("l_extendedprice") * 100)) / 1e6).alias("rev"),
        (F.count(F.lit(1)) * 1.0).alias("cnt"),
        (
            F.max(F.unix_micros(F.col("l_shipdate").cast("timestamp"))) / 1e12
        ).alias("rec"),
    ).localCheckpoint(eager=False)
    norms = sup.agg(
        F.sqrt(F.sum(F.col("rev") * F.col("rev"))).alias("nr"),
        F.sqrt(F.sum(F.col("cnt") * F.col("cnt"))).alias("nc"),
        F.sqrt(F.sum(F.col("rec") * F.col("rec"))).alias("nrec"),
    )
    nm = sup.crossJoin(F.broadcast(norms)).select(
        "s",
        (F.col("rev") / F.col("nr")).alias("r1"),
        (F.col("cnt") / F.col("nc")).alias("r2"),
        (F.col("rec") / F.col("nrec")).alias("r3"),
    ).localCheckpoint(eager=False)
    ideal = nm.agg(
        F.max("r1").alias("i1"),
        F.max("r2").alias("i2"),
        F.max("r3").alias("i3"),
        F.min("r1").alias("a1"),
        F.min("r2").alias("a2"),
        F.min("r3").alias("a3"),
    )
    scored = nm.crossJoin(F.broadcast(ideal)).select(
        "s",
        F.sqrt(
            F.pow(F.col("r1") - F.col("i1"), 2)
            + F.pow(F.col("r2") - F.col("i2"), 2)
            + F.pow(F.col("r3") - F.col("i3"), 2)
        ).alias("dplus"),
        F.sqrt(
            F.pow(F.col("r1") - F.col("a1"), 2)
            + F.pow(F.col("r2") - F.col("a2"), 2)
            + F.pow(F.col("r3") - F.col("a3"), 2)
        ).alias("dminus"),
    )
    return (
        scored.select(
            F.col("s").cast("bigint").alias("suppkey"),
            r6(F.col("dplus")).alias("dist_to_ideal"),
            r6(F.col("dminus")).alias("dist_to_anti"),
            r6(F.col("dminus") / (F.col("dplus") + F.col("dminus"))).alias(
                "topsis_score"
            ),
        )
        .orderBy(F.desc("topsis_score"), "suppkey")
        .limit(5)
    )
