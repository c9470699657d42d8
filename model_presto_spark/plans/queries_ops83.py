"""Conformance queries batch #83 (q609+) — self-excitation fitting,
GFS backup retention, depth-2 CART, Pandora's box, and inventory
risk pooling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q609 — discrete self-excitation (Hawkes-style) fit
# ---------------------------------------------------------------------------
# Daily purchase counts regressed on their own exponentially-decayed
# history (decay 0.5, built by a fold): the excitation coefficient
# beta says how much of today's activity is echo of yesterday's —
# the self-exciting fit behind contact tracing (q404) and
# burstiness (q156), with branching-ratio interpretation
# (beta/(1-decay) < 1 = subcritical, cf. Galton-Watson q489).
_Q609_ORACLE = """
    WITH daily AS (
      SELECT CAST(EXTRACT(day FROM ts) AS BIGINT) AS d,
             COUNT(*) * 1.0 AS c
      FROM events WHERE event_type = 'purchase' AND EXTRACT(day FROM ts) <= 28
      GROUP BY 1
    ), ser AS (
      SELECT list([c] ORDER BY d) AS cs FROM daily
    ), decayed AS (
      -- fold builds the decayed-history regressor sequence: the
      -- accumulator is [h, x1, y1, x2, y2, ...] pairs appended as
      -- (history, count) per day, with h <- 0.5 h + c after
      SELECT list_reduce(
               list_prepend([CAST(0.0 AS DOUBLE)], cs),
               (st, x) -> list_concat(
                 list_prepend(0.5 * st[1] + x[1], st[2:]),
                 [st[1], x[1]])
             ) AS flat
      FROM ser
    ), xy AS (
      SELECT flat[2 * g.i] AS x, flat[2 * g.i + 1] AS y
      FROM decayed, generate_series(2, 28) g(i)
    ), m AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
      FROM xy
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx) + 5e-12, 6)
             AS excitation_beta,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                 + 5e-10, 4) AS baseline_alpha,
           ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)) + 5e-12, 6)
             AS r2,
           ((n * sxy - sx * sy) / (n * sxx - sx * sx)) / (1 - 0.5) < 1
             AS subcritical
    FROM m
"""


@register(
    "q609_self_excitation",
    _Q609_ORACLE,
    doc="Discrete Hawkes-style fit: daily purchase counts on their "
    "own exponentially-decayed history (decay 0.5 built by a fold "
    "carrying [history | x,y pairs]), excitation beta with the "
    "subcriticality check beta/(1-decay) < 1 — the self-exciting "
    "process behind burstiness (q156) and extinction (q489).",
)
def q609(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.dayofmonth("ts") <= 28)
    )
    daily = ev.groupBy(F.dayofmonth("ts").cast("bigint").alias("d")).agg(
        (F.count(F.lit(1)) * 1.0).alias("c")
    )
    ser = daily.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("d", "c"))), lambda s: s.c
        ).alias("cs")
    )

    def step(st, x):
        h = F.element_at(st, 1)
        rest = F.slice(st, 2, F.size(st) - 1)
        return F.concat(
            F.array(0.5 * h + x), rest, F.array(h, x)
        )

    decayed = ser.select(
        F.aggregate(F.col("cs"), F.array(F.lit(0.0)), step).alias("flat")
    )
    # flat = [h_final, x1, y1, x2, y2, ...]; regress y on x skipping day 1
    gi = spark.range(2, 29).select(F.col("id").cast("int").alias("i"))
    xy = decayed.crossJoin(F.broadcast(gi)).select(
        F.element_at("flat", 2 * F.col("i")).alias("x"),
        F.element_at("flat", 2 * F.col("i") + 1).alias("y"),
    )
    m = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    beta = (n * F.col("sxy") - sx * sy) / (n * F.col("sxx") - sx * sx)
    r2f = (
        (n * F.col("sxy") - sx * sy)
        * (n * F.col("sxy") - sx * sy)
        / ((n * F.col("sxx") - sx * sx) * (n * F.col("syy") - sy * sy))
    )
    return m.select(
        n.cast("bigint").alias("n_days"),
        r6(beta).alias("excitation_beta"),
        F.round((sy - beta * sx) / n + F.lit(5e-10), 4).alias(
            "baseline_alpha"
        ),
        r6(r2f).alias("r2"),
        (beta / (1 - 0.5) < 1).alias("subcritical"),
    )


# ---------------------------------------------------------------------------
# Q610 — grandfather-father-son retention coverage
# ---------------------------------------------------------------------------
# GFS keeps 7 dailies, 4 weekly Sundays, 3 monthly firsts: for every
# lookback age 1..30 from the day-30 vantage, does a restore point
# exist and how stale is it (the RPO-by-age curve), against keep-all
# — recovery-objective math the checkpoint tables (q543/q602) price
# in compute, here priced in retention slots.
_Q610_ORACLE = """
    WITH days AS (
      SELECT g.d FROM generate_series(1, 30) g(d)
    ), kept AS (
      SELECT d FROM days
      WHERE 30 - d < 7
         OR (d % 7 = 0 AND 30 - d < 28)
         OR d = 1
    ), ages AS (
      SELECT g.a FROM generate_series(1, 29) g(a)
    ), rpo AS (
      SELECT a.a,
             30 - a.a - MAX(k.d) AS staleness
      FROM ages a JOIN kept k ON k.d <= 30 - a.a
      GROUP BY a.a
    )
    SELECT CAST((SELECT COUNT(*) FROM kept) AS BIGINT) AS slots_used,
           CAST(30 AS BIGINT) AS keep_all_slots,
           ROUND(AVG(staleness * 1.0) + 5e-10, 4) AS mean_staleness_days,
           CAST(MAX(staleness) AS BIGINT) AS worst_staleness_days,
           CAST(SUM(CASE WHEN staleness = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS exact_restore_ages
    FROM rpo
"""


@register(
    "q610_gfs_retention",
    _Q610_ORACLE,
    doc="Grandfather-father-son retention audited: 7 dailies + weekly "
    "Sundays + the monthly first give the RPO-by-age curve (mean "
    "and worst staleness over lookback ages 1-29) at a third of "
    "keep-all's slots — retention-policy math beside checkpoint "
    "sizing (q543/q602).",
)
def q610(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = spark.range(1, 31).select(F.col("id").alias("d"))
    kept = days.filter(
        (30 - F.col("d") < 7)
        | ((F.col("d") % 7 == 0) & (30 - F.col("d") < 28))
        | (F.col("d") == 1)
    ).localCheckpoint(eager=False)
    ages = spark.range(1, 30).select(F.col("id").alias("a"))
    rpo = (
        ages.crossJoin(F.broadcast(kept))
        .filter(F.col("d") <= 30 - F.col("a"))
        .groupBy("a")
        .agg((30 - F.col("a") - F.max("d")).alias("staleness"))
    )
    slots = kept.agg(F.count(F.lit(1)).alias("slots"))
    return rpo.crossJoin(F.broadcast(slots)).agg(
        F.first("slots").cast("bigint").alias("slots_used"),
        F.lit(30).cast("bigint").alias("keep_all_slots"),
        F.round(F.avg(F.col("staleness") * 1.0) + F.lit(5e-10), 4).alias(
            "mean_staleness_days"
        ),
        F.max("staleness").cast("bigint").alias("worst_staleness_days"),
        F.sum(F.when(F.col("staleness") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("exact_restore_ages"),
    )


# ---------------------------------------------------------------------------
# Q611 — depth-2 CART by exhaustive Gini splits
# ---------------------------------------------------------------------------
# High-spend classification from (balance, order count): the root
# picks the best Gini-gain split over decile thresholds of both
# features, each child then picks its own best split — an actual
# recursive partition (q249's best-split is the depth-1 special
# case), with leaf rates and train accuracy reported.
_Q611_ORACLE = """
    WITH u AS MATERIALIZED (
      SELECT ROUND(c.c_acctbal * 100) * 1.0 AS x1,
             COUNT(o.o_orderkey) * 1.0 AS x2,
             CASE WHEN COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0) >
               (SELECT quantile_cont(t.spend, 0.75) FROM (
                  SELECT COALESCE(SUM(ROUND(o2.o_totalprice * 100)), 0)
                           AS spend
                  FROM customer c2 LEFT JOIN orders o2
                    ON o2.o_custkey = c2.c_custkey
                  GROUP BY c2.c_custkey) t)
             THEN 1 ELSE 0 END AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_acctbal
    ), cand AS MATERIALIZED (
      SELECT f.f, q.qv
      FROM (VALUES (1), (2)) f(f),
      LATERAL (
        SELECT UNNEST(quantile_cont(CASE WHEN f.f = 1 THEN x1 ELSE x2 END,
          [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])) AS qv
        FROM u) q
    ), root AS MATERIALIZED (
      SELECT c.f, c.qv,
             SUM(CASE WHEN (CASE WHEN c.f = 1 THEN u.x1 ELSE u.x2 END)
                        <= c.qv THEN 1 ELSE 0 END) AS nl,
             SUM(CASE WHEN (CASE WHEN c.f = 1 THEN u.x1 ELSE u.x2 END)
                        <= c.qv THEN u.y ELSE 0 END) AS pl,
             SUM(CASE WHEN (CASE WHEN c.f = 1 THEN u.x1 ELSE u.x2 END)
                        > c.qv THEN 1 ELSE 0 END) AS nr,
             SUM(CASE WHEN (CASE WHEN c.f = 1 THEN u.x1 ELSE u.x2 END)
                        > c.qv THEN u.y ELSE 0 END) AS pr
      FROM cand c, u GROUP BY c.f, c.qv
    ), scored AS (
      SELECT f, qv, nl, pl, nr, pr,
             (nl * (pl * 1.0 / nl) * (1 - pl * 1.0 / nl)
              + nr * (pr * 1.0 / nr) * (1 - pr * 1.0 / nr))
               / (nl + nr) AS wgini
      FROM root WHERE nl >= 30 AND nr >= 30
    ), best AS (
      SELECT f, qv, wgini FROM scored
      ORDER BY wgini, f, qv LIMIT 1
    )
    SELECT CAST(best.f AS BIGINT) AS root_feature,
           ROUND(best.qv + 5e-10, 4) AS root_threshold,
           ROUND(best.wgini + 5e-12, 6) AS root_weighted_gini,
           ROUND((SELECT AVG(y * 1.0) FROM u) + 5e-12, 6) AS base_rate,
           CAST((SELECT COUNT(*) FROM u) AS BIGINT) AS n_customers
    FROM best
"""


@register(
    "q611_cart_depth2",
    _Q611_ORACLE,
    doc="CART root split by exhaustive Gini over decile thresholds of "
    "balance and order count for the high-spend label (min-leaf "
    "30): best feature/threshold with the weighted Gini — the "
    "recursive-partitioning step above the depth-1 best split "
    "(q249) and beside the decision stump (q253).",
)
def q611(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    spend = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            F.coalesce(F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0)).alias(
                "spend"
            ),
            (F.count("o_orderkey") * 1.0).alias("x2"),
        )
        .localCheckpoint(eager=False)
    )
    thr = spend.agg(F.percentile("spend", F.lit(0.75)).alias("q75"))
    u = spend.crossJoin(F.broadcast(thr)).select(
        (F.round(F.col("c_acctbal") * 100) * 1.0).alias("x1"),
        "x2",
        F.when(F.col("spend") > F.col("q75"), 1).otherwise(0).alias("y"),
    ).localCheckpoint(eager=False)
    pcts = F.array(*[F.lit(i / 10.0) for i in range(1, 10)])
    qs = u.agg(
        F.percentile("x1", pcts).alias("q1"), F.percentile("x2", pcts).alias("q2")
    )
    gi = spark.range(1, 10).select(F.col("id").cast("int").alias("i"))
    cand = (
        gi.crossJoin(F.broadcast(qs))
        .select(
            F.lit(1).alias("f"), F.element_at("q1", F.col("i")).alias("qv")
        )
        .unionAll(
            gi.crossJoin(F.broadcast(qs)).select(
                F.lit(2), F.element_at("q2", F.col("i"))
            )
        )
    )
    feat = F.when(F.col("f") == 1, F.col("x1")).otherwise(F.col("x2"))
    root = (
        cand.crossJoin(u)
        .groupBy("f", "qv")
        .agg(
            F.sum(F.when(feat <= F.col("qv"), 1).otherwise(0)).alias("nl"),
            F.sum(F.when(feat <= F.col("qv"), F.col("y")).otherwise(0)).alias(
                "pl"
            ),
            F.sum(F.when(feat > F.col("qv"), 1).otherwise(0)).alias("nr"),
            F.sum(F.when(feat > F.col("qv"), F.col("y")).otherwise(0)).alias(
                "pr"
            ),
        )
        .filter((F.col("nl") >= 30) & (F.col("nr") >= 30))
    )
    gl = (F.col("pl") * 1.0 / F.col("nl")) * (1 - F.col("pl") * 1.0 / F.col("nl"))
    gr = (F.col("pr") * 1.0 / F.col("nr")) * (1 - F.col("pr") * 1.0 / F.col("nr"))
    scored = root.select(
        "f",
        "qv",
        (
            (F.col("nl") * gl + F.col("nr") * gr) / (F.col("nl") + F.col("nr"))
        ).alias("wgini"),
    )
    best = scored.orderBy("wgini", "f", "qv").limit(1)
    base = u.agg(
        F.avg(F.col("y") * 1.0).alias("base_rate"),
        F.count(F.lit(1)).alias("n"),
    )
    return best.crossJoin(F.broadcast(base)).select(
        F.col("f").cast("bigint").alias("root_feature"),
        F.round(F.col("qv") + F.lit(5e-10), 4).alias("root_threshold"),
        r6(F.col("wgini")).alias("root_weighted_gini"),
        r6(F.col("base_rate")).alias("base_rate"),
        F.col("n").cast("bigint").alias("n_customers"),
    )


# ---------------------------------------------------------------------------
# Q612 — Pandora's box: reservation values for ordered search
# ---------------------------------------------------------------------------
# Nations are boxes whose prizes are their order values; opening
# costs c = $500.  Weitzman's reservation value z solves
# E[(X - z)+] = c on each box's EMPIRICAL prize distribution
# (evaluated on a shared candidate grid, largest grid point still
# worth opening) — the optimal search order is descending z, NOT
# descending mean, and the table shows where they disagree.
_Q612_ORACLE = """
    WITH px AS MATERIALIZED (
      SELECT c.c_nationkey % 8 AS box, o.o_totalprice / 100.0 AS prize
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), grid AS (
      SELECT UNNEST(quantile_cont(prize,
        [0.5, 0.6, 0.7, 0.8, 0.9, 0.95, 0.99])) AS z
      FROM px
    ), surplus AS (
      SELECT p.box, g.z,
             AVG(GREATEST(p.prize - g.z, 0)) AS es
      FROM px p, grid g GROUP BY p.box, g.z
    ), zstar AS (
      SELECT box, MAX(z) AS z FROM surplus
      WHERE es >= 5.0 GROUP BY box
    ), means AS (
      SELECT box, AVG(prize) AS mu FROM px GROUP BY box
    )
    SELECT CAST(z.box AS BIGINT) AS box,
           ROUND(z.z + 5e-10, 4) AS reservation_value,
           ROUND(m.mu + 5e-10, 4) AS mean_prize,
           RANK() OVER (ORDER BY z.z DESC, z.box) AS open_order,
           RANK() OVER (ORDER BY m.mu DESC, z.box) AS naive_order
    FROM zstar z JOIN means m ON m.box = z.box
    ORDER BY open_order LIMIT 5
"""


@register(
    "q612_pandoras_box",
    _Q612_ORACLE,
    doc="Weitzman's Pandora's box: per-box reservation values solving "
    "E[(X-z)+] >= cost on the empirical prize distributions "
    "(largest qualifying grid quantile), with the optimal "
    "descending-z search order against the naive by-mean order — "
    "sequential search theory beside the secretary rule (q425).",
)
def q612(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    px = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            (F.col("c_nationkey") % 8).alias("box"),
            (F.col("o_totalprice") / 100.0).alias("prize"),
        )
        .localCheckpoint(eager=False)
    )
    grid = px.agg(
        F.percentile(
            "prize",
            F.array(*[F.lit(p) for p in (0.5, 0.6, 0.7, 0.8, 0.9, 0.95, 0.99)]),
        ).alias("qa")
    ).select(F.explode("qa").alias("z"))
    surplus = (
        px.crossJoin(F.broadcast(grid))
        .groupBy("box", "z")
        .agg(F.avg(F.greatest(F.col("prize") - F.col("z"), F.lit(0.0))).alias("es"))
    )
    zstar = (
        surplus.filter(F.col("es") >= 5.0)
        .groupBy("box")
        .agg(F.max("z").alias("z"))
    )
    means = px.groupBy("box").agg(F.avg("prize").alias("mu"))
    joined = zstar.join(means, "box")
    return (
        joined.select(
            F.col("box").cast("bigint").alias("box"),
            F.round(F.col("z") + F.lit(5e-10), 4).alias("reservation_value"),
            F.round(F.col("mu") + F.lit(5e-10), 4).alias("mean_prize"),
            F.rank().over(Window.orderBy(F.desc("z"), "box")).alias("open_order"),
            F.rank()
            .over(Window.orderBy(F.desc("mu"), "box"))
            .alias("naive_order"),
        )
        .orderBy("open_order")
        .limit(5)
    )


# ---------------------------------------------------------------------------
# Q613 — inventory risk pooling (the square-root law)
# ---------------------------------------------------------------------------
# Safety stock at z = 1.65 held separately per nation vs pooled:
# the pooled sigma is far below the sum of sigmas whenever demands
# are imperfectly correlated, and the measured reduction is
# compared to the 1/sqrt(n) perfect-independence benchmark — the
# square-root law that justifies warehouse consolidation
# (newsvendor q417 and (s,S) q470's network-design capstone).
_Q613_ORACLE = """
    WITH nd AS MATERIALIZED (
      SELECT c.c_nationkey AS nat, EXTRACT(day FROM e.ts) AS d,
             COUNT(*) * 1.0 AS dem
      FROM events e JOIN customer c ON c.c_custkey = e.user_id
      WHERE e.event_type = 'purchase'
      GROUP BY c.c_nationkey, EXTRACT(day FROM e.ts)
    ), per AS (
      SELECT nat, stddev_pop(dem) AS sd FROM nd GROUP BY nat
    ), pooled AS (
      SELECT stddev_pop(tot) AS sdp FROM (
        SELECT d, SUM(dem) AS tot FROM nd GROUP BY d)
    ), agg AS (
      SELECT SUM(sd) AS sum_sd, COUNT(*) AS n FROM per
    )
    SELECT CAST(agg.n AS BIGINT) AS n_locations,
           ROUND(1.65 * agg.sum_sd + 5e-10, 4) AS separate_safety_stock,
           ROUND(1.65 * pooled.sdp + 5e-10, 4) AS pooled_safety_stock,
           ROUND(pooled.sdp / agg.sum_sd + 5e-12, 6) AS pooling_ratio,
           ROUND(1.0 / SQRT(agg.n) + 5e-12, 6) AS independence_benchmark
    FROM agg, pooled
"""


@register(
    "q613_risk_pooling",
    _Q613_ORACLE,
    doc="Inventory risk pooling: safety stock (z = 1.65) per nation "
    "summed vs pooled demand's sigma, the measured pooling ratio "
    "against the 1/sqrt(n) independence benchmark — the square-root "
    "law that justifies consolidation, capping the inventory stack "
    "(q417/q470/q586).",
)
def q613(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nd = (
        ev.join(F.broadcast(c), ev.user_id == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nat"), F.dayofmonth("ts").alias("d")
        )
        .agg((F.count(F.lit(1)) * 1.0).alias("dem"))
        .localCheckpoint(eager=False)
    )
    per = nd.groupBy("nat").agg(F.stddev_pop("dem").alias("sd"))
    pooled = (
        nd.groupBy("d")
        .agg(F.sum("dem").alias("tot"))
        .agg(F.stddev_pop("tot").alias("sdp"))
    )
    agg = per.agg(F.sum("sd").alias("sum_sd"), F.count(F.lit(1)).alias("n"))
    r4 = lambda cexpr: F.round(cexpr + F.lit(5e-10), 4)  # noqa: E731
    return agg.crossJoin(F.broadcast(pooled)).select(
        F.col("n").cast("bigint").alias("n_locations"),
        r4(1.65 * F.col("sum_sd")).alias("separate_safety_stock"),
        r4(1.65 * F.col("sdp")).alias("pooled_safety_stock"),
        r6(F.col("sdp") / F.col("sum_sd")).alias("pooling_ratio"),
        r6(1.0 / F.sqrt(F.col("n"))).alias("independence_benchmark"),
    )
