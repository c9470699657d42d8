"""Conformance queries batch #72 (q554+) — price dispersion,
weighted interval scheduling, percolation thresholds, VaR/CVaR, and
the German tank estimator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q554 — price dispersion (law of one price, violated)
# ---------------------------------------------------------------------------
# Unit prices (extendedprice/quantity) of the same part across
# lineitems: per-part coefficient of variation and max/min ratio,
# the five most dispersed parts with the market-wide dispersion
# summary — the price-dispersion measurement beside price endings
# (q331) and elasticity (q389).
_Q554_ORACLE = """
    WITH up AS (
      SELECT l_partkey AS pk, l_extendedprice / l_quantity AS u
      FROM lineitem
    ), per AS (
      SELECT pk, COUNT(*) AS n, AVG(u) AS mu,
             stddev_pop(u) AS sd, MAX(u) / MIN(u) AS rng
      FROM up GROUP BY pk HAVING COUNT(*) >= 3
    ), summ AS (
      SELECT AVG(sd / mu) AS mean_cv,
             AVG(CASE WHEN sd / mu > 0.05 THEN 1.0 ELSE 0 END)
               AS frac_dispersed,
             COUNT(*) AS n_parts
      FROM per
    )
    SELECT CAST(p.pk AS BIGINT) AS partkey,
           CAST(p.n AS BIGINT) AS n_sales,
           ROUND(p.sd / p.mu + 5e-12, 6) AS cv,
           ROUND(p.rng + 5e-12, 6) AS max_min_ratio,
           ROUND(s.mean_cv + 5e-12, 6) AS market_mean_cv,
           ROUND(s.frac_dispersed + 5e-12, 6) AS market_frac_dispersed
    FROM per p, summ s
    ORDER BY p.sd / p.mu DESC, p.pk LIMIT 5
"""


@register(
    "q554_price_dispersion",
    _Q554_ORACLE,
    doc="Price dispersion: per-part unit-price coefficient of "
    "variation and max/min ratio (law-of-one-price violations), "
    "five most dispersed parts with the market-wide dispersion "
    "summary — the search-cost economics measurement beside price "
    "endings (q331) and elasticity (q389).",
)
def q554(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    up = li.select(
        F.col("l_partkey").alias("pk"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("u"),
    )
    per = (
        up.groupBy("pk")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("u").alias("mu"),
            F.stddev_pop("u").alias("sd"),
            (F.max("u") / F.min("u")).alias("rng"),
        )
        .filter(F.col("n") >= 3)
        .localCheckpoint(eager=False)
    )
    summ = per.agg(
        F.avg(F.col("sd") / F.col("mu")).alias("mean_cv"),
        F.avg(
            F.when(F.col("sd") / F.col("mu") > 0.05, 1.0).otherwise(0.0)
        ).alias("frac_dispersed"),
    )
    return (
        per.crossJoin(F.broadcast(summ))
        .select(
            F.col("pk").cast("bigint").alias("partkey"),
            F.col("n").cast("bigint").alias("n_sales"),
            r6(F.col("sd") / F.col("mu")).alias("cv"),
            r6(F.col("rng")).alias("max_min_ratio"),
            r6(F.col("mean_cv")).alias("market_mean_cv"),
            r6(F.col("frac_dispersed")).alias("market_frac_dispersed"),
            (F.col("sd") / F.col("mu")).alias("ord"),
        )
        .orderBy(F.desc("ord"), "partkey")
        .limit(5)
        .drop("ord")
    )


# ---------------------------------------------------------------------------
# Q555 — weighted interval scheduling (the DP upgrade of q542)
# ---------------------------------------------------------------------------
# User-day activity spans weighted by their event counts: the
# compatible-predecessor index p(i) comes from a count join (how
# many intervals end at or before my start), then the classic DP
# dp[i] = max(dp[i-1], w_i + dp[p_i]) runs as a fold with the
# growing dp array as the accumulator — and the earliest-finish
# greedy (optimal for COUNT, q542) is scored on weight to show the
# gap DP closes.
_Q555_ORACLE = """
    WITH spans AS MATERIALIZED (
      SELECT user_id, EXTRACT(day FROM ts) AS dy,
             MIN(epoch_us(ts)) AS s, MAX(epoch_us(ts)) AS e,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM events
      WHERE EXTRACT(day FROM ts) <= 7 AND user_id % 3 = 0
      GROUP BY user_id, EXTRACT(day FROM ts)
      HAVING MIN(epoch_us(ts)) < MAX(epoch_us(ts))
    ), ordered AS MATERIALIZED (
      SELECT s, e, w,
             ROW_NUMBER() OVER (ORDER BY e, s, user_id, dy) AS i
      FROM spans
    ), pred AS MATERIALIZED (
      SELECT a.i, a.s, a.e, a.w,
             (SELECT COUNT(*) FROM ordered b WHERE b.e <= a.s) AS p
      FROM ordered a
    ), ser AS (
      SELECT list([w, p] ORDER BY i) AS xs, COUNT(*) AS n FROM pred
    ), dp AS (
      SELECT n,
        list_reduce(
          list_prepend([CAST(0 AS BIGINT)], list_transform(xs, x -> x)),
          (acc, x) -> list_append(acc,
            GREATEST(acc[len(acc)], x[1] + acc[CAST(x[2] AS INT) + 1]))
        ) AS dparr
      FROM ser
    ), greedy AS (
      SELECT list_reduce(
               list_prepend([CAST(-1 AS BIGINT), 0],
                 (SELECT list([s, e, w] ORDER BY e, s, user_id, dy)
                  FROM spans)),
               (st, x) -> CASE WHEN x[1] >= st[1]
                               THEN [x[2], st[2] + x[3]]
                               ELSE st END
             )[2] AS gw
    )
    SELECT CAST(dp.n AS BIGINT) AS n_intervals,
           CAST(dp.dparr[CAST(dp.n AS INT) + 1] AS BIGINT)
             AS dp_optimal_weight,
           CAST(greedy.gw AS BIGINT) AS greedy_weight,
           ROUND(dp.dparr[CAST(dp.n AS INT) + 1] * 1.0
                 / greedy.gw + 5e-12, 6) AS dp_over_greedy
    FROM dp, greedy
"""


@register(
    "q555_weighted_intervals",
    _Q555_ORACLE,
    doc="Weighted interval scheduling: predecessor indices from a "
    "count join over end-sorted spans, then dp[i] = max(dp[i-1], "
    "w_i + dp[p_i]) as a fold with the growing dp array — optimal "
    "weight vs the earliest-finish greedy's weight (q542's "
    "count-optimal rule is weight-suboptimal, and the ratio shows "
    "by how much).",
)
def q555(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        (F.dayofmonth("ts") <= 7) & (F.col("user_id") % 3 == 0)
    )
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    spans = (
        ev.groupBy("user_id", F.dayofmonth("ts").alias("dy"))
        .agg(
            F.min(t).alias("s"),
            F.max(t).alias("e"),
            F.count(F.lit(1)).cast("bigint").alias("w"),
        )
        .filter(F.col("s") < F.col("e"))
        .localCheckpoint(eager=False)
    )
    ordered = spans.select(
        "s",
        "e",
        "w",
        F.row_number()
        .over(Window.orderBy("e", "s", "user_id", "dy"))
        .alias("i"),
    ).localCheckpoint(eager=False)
    ends = ordered.select(F.col("e").alias("be"))
    pred = (
        ordered.join(F.broadcast(ends), F.col("be") <= F.col("s"), "left")
        .groupBy("i", "s", "e", "w")
        .agg(F.count("be").alias("p"))
    )
    ser = pred.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("i", "w", "p"))),
            lambda r: F.array(r.w, r.p),
        ).alias("xs"),
        F.count(F.lit(1)).alias("n"),
    )
    zero = F.lit(0).cast("bigint")

    def step(acc, x):
        return F.concat(
            acc,
            F.array(
                F.greatest(
                    F.element_at(acc, F.size(acc)),
                    F.element_at(x, 1)
                    + F.element_at(acc, F.element_at(x, 2).cast("int") + 1),
                )
            ),
        )

    dp = ser.select(
        "n",
        F.aggregate(F.col("xs"), F.array(zero), step).alias("dparr"),
    )
    gser = spans.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("e", "s", "user_id", "dy", "w"))),
            lambda r: F.array(r.s, r.e, r.w),
        ).alias("gs")
    )
    neg1 = F.lit(-1).cast("bigint")

    def gstep(st, x):
        return F.when(
            F.element_at(x, 1) >= F.element_at(st, 1),
            F.array(F.element_at(x, 2), F.element_at(st, 2) + F.element_at(x, 3)),
        ).otherwise(st)

    greedy = gser.select(
        F.element_at(
            F.aggregate(F.col("gs"), F.array(neg1, zero), gstep), 2
        ).alias("gw")
    )
    return dp.crossJoin(F.broadcast(greedy)).select(
        F.col("n").cast("bigint").alias("n_intervals"),
        F.element_at("dparr", F.col("n").cast("int") + 1)
        .cast("bigint")
        .alias("dp_optimal_weight"),
        F.col("gw").cast("bigint").alias("greedy_weight"),
        r6(
            F.element_at("dparr", F.col("n").cast("int") + 1)
            * 1.0
            / F.col("gw")
        ).alias("dp_over_greedy"),
    )


# ---------------------------------------------------------------------------
# Q556 — percolation: largest component vs edge-weight threshold
# ---------------------------------------------------------------------------
# The 25-node modulo graph with edge weights = order multiplicity,
# thresholded at >1, >3, >8: eight unrolled min-label propagation
# rounds find the components, and the giant-component share per
# threshold traces the percolation transition (connected components
# q55 does the unbounded version; the epidemic threshold q503 is
# the spectral shadow of this curve).
_Q556_ORACLE = """
    WITH cell AS MATERIALIZED (
      SELECT CAST(o_custkey % 25 AS BIGINT) AS u,
             CAST(o_orderkey % 25 AS BIGINT) AS v, COUNT(*) AS wt
      FROM orders WHERE o_custkey % 25 <> o_orderkey % 25
      GROUP BY 1, 2
    ), th AS (
      SELECT * FROM (VALUES (1), (3), (8)) t(thr)
    ), edges AS MATERIALIZED (
      SELECT th.thr, c.u, c.v FROM cell c, th WHERE c.wt > th.thr
      UNION SELECT th.thr, c.v, c.u FROM cell c, th WHERE c.wt > th.thr
    ), l0 AS (
      SELECT th.thr, g.i AS nd, CAST(g.i AS BIGINT) AS lbl
      FROM generate_series(0, 24) g(i), th
    ), l1 AS MATERIALIZED (
      SELECT l.thr, l.nd, LEAST(l.lbl, COALESCE(MIN(r.lbl), l.lbl)) AS lbl
      FROM l0 l LEFT JOIN (
        SELECT e.thr, e.u, l2.lbl FROM edges e
        JOIN l0 l2 ON l2.thr = e.thr AND l2.nd = e.v) r
        ON r.thr = l.thr AND r.u = l.nd
      GROUP BY l.thr, l.nd, l.lbl
    ), l2 AS MATERIALIZED (
      SELECT l.thr, l.nd, LEAST(l.lbl, COALESCE(MIN(r.lbl), l.lbl)) AS lbl
      FROM l1 l LEFT JOIN (
        SELECT e.thr, e.u, lx.lbl FROM edges e
        JOIN l1 lx ON lx.thr = e.thr AND lx.nd = e.v) r
        ON r.thr = l.thr AND r.u = l.nd
      GROUP BY l.thr, l.nd, l.lbl
    ), l3 AS MATERIALIZED (
      SELECT l.thr, l.nd, LEAST(l.lbl, COALESCE(MIN(r.lbl), l.lbl)) AS lbl
      FROM l2 l LEFT JOIN (
        SELECT e.thr, e.u, lx.lbl FROM edges e
        JOIN l2 lx ON lx.thr = e.thr AND lx.nd = e.v) r
        ON r.thr = l.thr AND r.u = l.nd
      GROUP BY l.thr, l.nd, l.lbl
    ), l4 AS MATERIALIZED (
      SELECT l.thr, l.nd, LEAST(l.lbl, COALESCE(MIN(r.lbl), l.lbl)) AS lbl
      FROM l3 l LEFT JOIN (
        SELECT e.thr, e.u, lx.lbl FROM edges e
        JOIN l3 lx ON lx.thr = e.thr AND lx.nd = e.v) r
        ON r.thr = l.thr AND r.u = l.nd
      GROUP BY l.thr, l.nd, l.lbl
    ), l5 AS MATERIALIZED (
      SELECT l.thr, l.nd, LEAST(l.lbl, COALESCE(MIN(r.lbl), l.lbl)) AS lbl
      FROM l4 l LEFT JOIN (
        SELECT e.thr, e.u, lx.lbl FROM edges e
        JOIN l4 lx ON lx.thr = e.thr AND lx.nd = e.v) r
        ON r.thr = l.thr AND r.u = l.nd
      GROUP BY l.thr, l.nd, l.lbl
    ), comp AS (
      SELECT thr, lbl, COUNT(*) AS sz FROM l5 GROUP BY thr, lbl
    ), ecount AS (
      SELECT thr, COUNT(*) / 2 AS n_edges FROM edges GROUP BY thr
    )
    SELECT CAST(c.thr AS BIGINT) AS weight_threshold,
           CAST(ec.n_edges AS BIGINT) AS n_edges,
           CAST(MAX(c.sz) AS BIGINT) AS giant_component,
           ROUND(MAX(c.sz) / 25.0 + 5e-12, 6) AS giant_share,
           CAST(COUNT(*) AS BIGINT) AS n_components
    FROM comp c JOIN ecount ec ON ec.thr = c.thr
    GROUP BY c.thr, ec.n_edges ORDER BY weight_threshold
"""


@register(
    "q556_percolation",
    _Q556_ORACLE,
    doc="Bond percolation on the weighted modulo graph: edges kept "
    "above weight thresholds 1/3/8, components by five unrolled "
    "min-label propagation rounds, giant-component share per "
    "threshold — the percolation transition whose spectral shadow "
    "is the epidemic threshold (q503), with full CC machinery at "
    "scale living in q55.",
)
def q556(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cell = (
        o.select(
            (F.col("o_custkey") % 25).cast("bigint").alias("u"),
            (F.col("o_orderkey") % 25).cast("bigint").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("wt"))
    )
    th = spark.createDataFrame([(1,), (3,), (8,)], "thr int")
    e_dir = cell.crossJoin(F.broadcast(th)).filter(F.col("wt") > F.col("thr"))
    edges = (
        e_dir.select("thr", "u", "v")
        .unionAll(e_dir.select("thr", F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
    )
    # The graph is a FIXED 25-node modulo graph regardless of input
    # scale — only the edge-weight aggregation above grows with data.
    # So collapse each threshold's edge list to one array row and run
    # the five min-label rounds as a single F.aggregate fold over the
    # round counter (HOF lambdas bind at RUNTIME, so unlike unrolled
    # per-round DataFrame joins the plan neither nests nor re-shuffles:
    # the previous version spent ~13 s at sf0.1 scheduling 5 rounds x
    # 3 stages of 32 tasks over 75 label rows; this runs the same
    # propagation in one projection, measured ~0.15 s from the grouped
    # edges). Thresholds with zero surviving edges vanish in the
    # groupBy, matching the oracle's inner join against ecount.
    g = edges.groupBy("thr").agg(
        F.collect_list(F.struct("u", "v")).alias("ed"),
        (F.count(F.lit(1)) / 2).cast("bigint").alias("n_edges"),
    )
    init = F.transform(F.sequence(F.lit(0), F.lit(24)), lambda i: i.cast("bigint"))

    def one_round(lbls, _r):
        return F.transform(
            F.sequence(F.lit(0), F.lit(24)),
            lambda u: F.aggregate(
                F.filter(F.col("ed"), lambda e: e["u"] == u.cast("bigint")),
                F.element_at(lbls, (u + 1).cast("int")),
                lambda acc, e: F.least(
                    acc, F.element_at(lbls, (e["v"] + 1).cast("int"))
                ),
            ),
        )

    lbls = F.aggregate(F.sequence(F.lit(1), F.lit(5)), init, one_round)
    return (
        g.select("thr", "n_edges", lbls.alias("lbls"))
        .select(
            F.col("thr").cast("bigint").alias("weight_threshold"),
            "n_edges",
            F.aggregate(
                F.array_distinct("lbls"),
                F.lit(0).cast("bigint"),
                lambda m, l: F.greatest(
                    m,
                    F.size(F.filter(F.col("lbls"), lambda x: x == l)).cast(
                        "bigint"
                    ),
                ),
            ).alias("giant_component"),
            F.size(F.array_distinct("lbls")).cast("bigint").alias("n_components"),
        )
        .select(
            "weight_threshold",
            "n_edges",
            "giant_component",
            r6(F.col("giant_component") / 25.0).alias("giant_share"),
            "n_components",
        )
        .orderBy("weight_threshold")
    )


# ---------------------------------------------------------------------------
# Q557 — historical VaR and expected shortfall
# ---------------------------------------------------------------------------
# Nation-day revenue log-changes as the P&L distribution: historical
# Value-at-Risk (left-tail quantile) and CVaR / expected shortfall
# (mean beyond VaR) at 95% and 99%, with tail counts — the risk
# numbers the drawdown (q219) and GPD tail (q312) views feed into.
_Q557_ORACLE = """
    WITH nd AS (
      SELECT c.c_nationkey AS nat, CAST(EXTRACT(day FROM o.o_orderdate)
             + 31 * EXTRACT(month FROM o.o_orderdate) AS BIGINT) AS d,
             SUM(ROUND(o.o_totalprice * 100)) AS rev
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE EXTRACT(year FROM o.o_orderdate) = 1995
      GROUP BY 1, 2
    ), rets AS (
      SELECT LN(rev * 1.0 / LAG(rev) OVER (PARTITION BY nat ORDER BY d))
               AS r
      FROM nd
    ), rr AS (
      SELECT r FROM rets WHERE r IS NOT NULL
    ), q AS (
      SELECT quantile_cont(r, [0.05, 0.01]) AS qs, COUNT(*) AS n FROM rr
    ), lvl AS (
      SELECT 95 AS level, qs[1] AS var_q, n FROM q
      UNION ALL SELECT 99, qs[2], n FROM q
    )
    SELECT CAST(l.level AS BIGINT) AS level,
           CAST(l.n AS BIGINT) AS n_returns,
           ROUND(-l.var_q + 5e-12, 6) AS var_loss,
           ROUND(-(SELECT AVG(r) FROM rr WHERE r <= l.var_q) + 5e-12, 6)
             AS cvar_loss,
           CAST((SELECT COUNT(*) FROM rr WHERE r <= l.var_q) AS BIGINT)
             AS n_tail
    FROM lvl l ORDER BY level
"""


@register(
    "q557_var_cvar",
    _Q557_ORACLE,
    doc="Historical VaR and expected shortfall at 95/99% on "
    "nation-day revenue log-changes: left-tail quantiles and the "
    "conditional tail means with tail counts — the coherent risk "
    "pair above drawdown (q219) and the GPD tail fit (q312).",
)
def q557(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1995)
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nd = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nat"),
            (
                F.dayofmonth("o_orderdate") + 31 * F.month("o_orderdate")
            ).cast("bigint").alias("d"),
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100)).alias("rev"))
    )
    w = Window.partitionBy("nat").orderBy("d")
    rr = nd.select(
        F.log(F.col("rev") * 1.0 / F.lag("rev").over(w)).alias("r")
    ).filter(F.col("r").isNotNull()).localCheckpoint(eager=False)
    q = rr.agg(
        F.percentile("r", F.array(F.lit(0.05), F.lit(0.01))).alias("qs"),
        F.count(F.lit(1)).alias("n"),
    )
    lvl = q.select(
        F.lit(95).alias("level"), F.element_at("qs", 1).alias("var_q"), "n"
    ).unionAll(
        q.select(F.lit(99), F.element_at("qs", 2), "n")
    )
    tail = lvl.crossJoin(rr).filter(F.col("r") <= F.col("var_q")).groupBy(
        "level", "var_q", "n"
    ).agg(F.avg("r").alias("tail_mean"), F.count(F.lit(1)).alias("n_tail"))
    return tail.select(
        F.col("level").cast("bigint").alias("level"),
        F.col("n").cast("bigint").alias("n_returns"),
        r6(-F.col("var_q")).alias("var_loss"),
        r6(-F.col("tail_mean")).alias("cvar_loss"),
        F.col("n_tail").cast("bigint").alias("n_tail"),
    ).orderBy("level")


# ---------------------------------------------------------------------------
# Q558 — the German tank problem on order serials
# ---------------------------------------------------------------------------
# A deterministic ~1% hash sample of order keys plays the captured
# serial numbers: the frequentist MVUE m(1 + 1/k) - 1 and the
# moment estimator 2*mean - 1 both estimate the maximum serial,
# audited against the true maximum — the serial-number estimation
# classic, and a capture-style population audit beside
# capture-recapture (q322).
_Q558_ORACLE = """
    WITH samp AS (
      SELECT o_orderkey AS k FROM orders
      WHERE (o_orderkey * 2654435761) % 4294967296 < 42949673
    ), est AS (
      SELECT COUNT(*) AS k, MAX(k) AS m, AVG(k * 1.0) AS mean_k
      FROM samp
    ), truth AS (
      SELECT MAX(o_orderkey) AS n_true FROM orders
    )
    SELECT CAST(est.k AS BIGINT) AS sample_size,
           CAST(est.m AS BIGINT) AS max_serial_seen,
           ROUND(est.m * (1 + 1.0 / est.k) - 1 + 5e-10, 4) AS mvue_estimate,
           ROUND(2 * est.mean_k - 1 + 5e-10, 4) AS moment_estimate,
           CAST(truth.n_true AS BIGINT) AS true_max,
           ROUND((est.m * (1 + 1.0 / est.k) - 1 - truth.n_true)
                 / truth.n_true + 5e-12, 6) AS mvue_rel_error
    FROM est, truth
"""


@register(
    "q558_german_tank",
    _Q558_ORACLE,
    doc="German tank estimation on a deterministic 1% hash sample of "
    "order serials: MVUE m(1+1/k)-1 and the moment estimator "
    "2*mean-1 vs the true maximum — the serial-number population "
    "classic beside capture-recapture (q322) and rarefaction "
    "(q526).",
)
def q558(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    samp = o.filter(
        (F.col("o_orderkey") * 2654435761) % 4294967296 < 42949673
    ).select(F.col("o_orderkey").alias("k"))
    est = samp.agg(
        F.count(F.lit(1)).alias("k"),
        F.max("k").alias("m"),
        F.avg(F.col("k") * 1.0).alias("mean_k"),
    )
    truth = o.agg(F.max("o_orderkey").alias("n_true"))
    mvue = F.col("m") * (1 + 1.0 / F.col("k")) - 1
    return est.crossJoin(F.broadcast(truth)).select(
        F.col("k").cast("bigint").alias("sample_size"),
        F.col("m").cast("bigint").alias("max_serial_seen"),
        F.round(mvue + F.lit(5e-10), 4).alias("mvue_estimate"),
        F.round(2 * F.col("mean_k") - 1 + F.lit(5e-10), 4).alias(
            "moment_estimate"
        ),
        F.col("n_true").cast("bigint").alias("true_max"),
        r6((mvue - F.col("n_true")) / F.col("n_true")).alias("mvue_rel_error"),
    )
