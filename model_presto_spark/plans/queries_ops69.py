"""Conformance queries batch #69 (q539+) — chi-square residual
decomposition, ranking exposure fairness, network-value law fitting,
greedy interval scheduling, and checkpoint policy sizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q539 — standardized Pearson residuals (who drives the chi-square?)
# ---------------------------------------------------------------------------
# The nation x segment contingency table's association decomposed to
# cells: standardized residual (O - E) / sqrt(E (1-rp)(1-cp)) per
# cell, the eight largest |residual| cells — the mosaic-plot numbers
# that tell you WHERE the q155-style chi-square significance comes
# from.
_Q539_ORACLE = """
    WITH t AS (
      SELECT c_nationkey AS r, c_mktsegment AS s, COUNT(*) AS o
      FROM customer GROUP BY 1, 2
    ), marg AS (
      SELECT r, SUM(o) AS rt FROM t GROUP BY r
    ), cmarg AS (
      SELECT s, SUM(o) AS ct FROM t GROUP BY s
    ), n AS (SELECT SUM(o) AS n FROM t
    ), res AS (
      SELECT t.r, t.s, t.o,
             marg.rt * cmarg.ct * 1.0 / n.n AS e,
             (t.o - marg.rt * cmarg.ct * 1.0 / n.n)
               / SQRT(marg.rt * cmarg.ct * 1.0 / n.n
                      * (1 - marg.rt * 1.0 / n.n)
                      * (1 - cmarg.ct * 1.0 / n.n)) AS z
      FROM t JOIN marg ON marg.r = t.r
      JOIN cmarg ON cmarg.s = t.s CROSS JOIN n
    )
    SELECT CAST(r AS BIGINT) AS nation, s AS segment,
           CAST(o AS BIGINT) AS observed,
           ROUND(e + 5e-10, 4) AS expected,
           ROUND(z + 5e-12, 6) AS std_residual
    FROM res ORDER BY ABS(z) DESC, nation, segment LIMIT 8
"""


@register(
    "q539_chisq_residuals",
    _Q539_ORACLE,
    doc="Standardized Pearson residuals of the nation x segment "
    "table — (O-E)/sqrt(E(1-rp)(1-cp)) per cell, eight largest "
    "drivers — the cell-level post-hoc that locates a chi-square "
    "association (q155's where-does-it-come-from companion).",
)
def q539(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    t = c.groupBy(
        F.col("c_nationkey").alias("r"), F.col("c_mktsegment").alias("s")
    ).agg(F.count(F.lit(1)).alias("o"))
    marg = t.groupBy("r").agg(F.sum("o").alias("rt"))
    cmarg = t.groupBy("s").agg(F.sum("o").alias("ct"))
    n = t.agg(F.sum("o").alias("n"))
    e = F.col("rt") * F.col("ct") * 1.0 / F.col("n")
    z = (F.col("o") - e) / F.sqrt(
        e
        * (1 - F.col("rt") * 1.0 / F.col("n"))
        * (1 - F.col("ct") * 1.0 / F.col("n"))
    )
    res = (
        t.join(F.broadcast(marg), "r")
        .join(F.broadcast(cmarg), "s")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("r").cast("bigint").alias("nation"),
            F.col("s").alias("segment"),
            F.col("o").cast("bigint").alias("observed"),
            F.round(e + F.lit(5e-10), 4).alias("expected"),
            r6(z).alias("std_residual"),
            F.abs(z).alias("az"),
        )
    )
    return (
        res.orderBy(F.desc("az"), "nation", "segment")
        .limit(8)
        .drop("az")
    )


# ---------------------------------------------------------------------------
# Q540 — exposure fairness of a ranking
# ---------------------------------------------------------------------------
# Suppliers ranked by revenue; exposure follows the DCG position
# curve 1/log2(1+rank).  Per nation-parity group: exposure share vs
# merit (revenue) share and their ratio — equity-of-attention
# disparity, the fairness audit for every top-k surface (position
# CTR q359 measures the bias, this scores its group impact).
_Q540_ORACLE = """
    WITH sup AS (
      SELECT s.s_suppkey, s.s_nationkey % 2 AS grp,
             SUM(ROUND(l.l_extendedprice * 100)) AS rev
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY s.s_suppkey, s.s_nationkey % 2
    ), ranked AS (
      SELECT grp, rev,
             ROW_NUMBER() OVER (ORDER BY rev DESC, s_suppkey) AS rk
      FROM sup
    ), agg AS (
      SELECT grp,
             SUM(1.0 / (LN(1 + rk) / LN(2.0))) AS exposure,
             SUM(rev) AS rev,
             COUNT(*) AS n
      FROM ranked GROUP BY grp
    ), tot AS (
      SELECT SUM(exposure) AS te, SUM(rev) AS tr FROM agg
    )
    SELECT CAST(a.grp AS BIGINT) AS grp,
           CAST(a.n AS BIGINT) AS n_suppliers,
           ROUND(a.exposure / t.te + 5e-12, 6) AS exposure_share,
           ROUND(a.rev * 1.0 / t.tr + 5e-12, 6) AS merit_share,
           ROUND((a.exposure / t.te) / (a.rev * 1.0 / t.tr) + 5e-12, 6)
             AS exposure_merit_ratio
    FROM agg a, tot t ORDER BY grp
"""


@register(
    "q540_exposure_fairness",
    _Q540_ORACLE,
    doc="Equity-of-attention audit: DCG-curve exposure share vs "
    "revenue merit share per supplier parity group under the "
    "revenue ranking — the group-fairness number for top-k "
    "surfaces (position bias q359's impact side).",
)
def q540(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sup = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", (F.col("s_nationkey") % 2).alias("grp"))
        .agg(F.sum(F.round(F.col("l_extendedprice") * 100)).alias("rev"))
    )
    ranked = sup.select(
        "grp",
        "rev",
        F.row_number().over(Window.orderBy(F.desc("rev"), "s_suppkey")).alias("rk"),
    )
    agg = ranked.groupBy("grp").agg(
        F.sum(1.0 / (F.log(1 + F.col("rk")) / F.log(F.lit(2.0)))).alias(
            "exposure"
        ),
        F.sum("rev").alias("rev"),
        F.count(F.lit(1)).alias("n"),
    )
    tot = agg.agg(F.sum("exposure").alias("te"), F.sum("rev").alias("tr"))
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            F.col("grp").cast("bigint").alias("grp"),
            F.col("n").cast("bigint").alias("n_suppliers"),
            r6(F.col("exposure") / F.col("te")).alias("exposure_share"),
            r6(F.col("rev") * 1.0 / F.col("tr")).alias("merit_share"),
            r6(
                (F.col("exposure") / F.col("te"))
                / (F.col("rev") * 1.0 / F.col("tr"))
            ).alias("exposure_merit_ratio"),
        )
        .orderBy("grp")
    )


# ---------------------------------------------------------------------------
# Q541 — which network-value law fits? (Metcalfe exponent)
# ---------------------------------------------------------------------------
# Daily (active users, revenue) pairs in log-log OLS: the fitted
# exponent arbitrates Sarnoff (value ~ n), Metcalfe (~ n^2) and
# Odlyzko (~ n log n, tested via the residual comparison of the
# competing regressors) — an empirical-law test in the q225
# (Heaps) / q125 (Zipf) family, on network value.
_Q541_ORACLE = """
    WITH daily AS (
      SELECT CAST(EXTRACT(day FROM ts) AS BIGINT) AS d,
             COUNT(DISTINCT user_id) * 1.0 AS n,
             SUM(CASE WHEN event_type = 'purchase'
                      THEN ROUND(value * 100) ELSE 0 END) * 1.0 AS v
      FROM events GROUP BY 1
    ), ll AS (
      SELECT LN(n) AS x, LN(v) AS y, LN(n * LN(n)) AS x_od FROM daily
      WHERE v > 0
    ), m AS (
      SELECT COUNT(*) AS k, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy,
             SUM(x_od) AS so, SUM(x_od * x_od) AS soo, SUM(x_od * y) AS soy
      FROM ll
    )
    SELECT CAST(k AS BIGINT) AS n_days,
           ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx) + 5e-12, 6)
             AS metcalfe_exponent,
           ROUND((k * sxy - sx * sy) * (k * sxy - sx * sy)
                 / ((k * sxx - sx * sx) * (k * syy - sy * sy)) + 5e-12, 6)
             AS r2_power_law,
           ROUND((k * soy - so * sy) * (k * soy - so * sy)
                 / ((k * soo - so * so) * (k * syy - sy * sy)) + 5e-12, 6)
             AS r2_nlogn,
           ABS((k * sxy - sx * sy) / (k * sxx - sx * sx) - 2)
             < ABS((k * sxy - sx * sy) / (k * sxx - sx * sx) - 1)
             AS closer_to_metcalfe
    FROM m
"""


@register(
    "q541_metcalfe_fit",
    _Q541_ORACLE,
    doc="Network-value law fitting: log-log exponent of daily revenue "
    "on daily active users (Sarnoff 1 vs Metcalfe 2), with the "
    "n log n regressor's R^2 as the Odlyzko alternative — the "
    "empirical scaling-law test in the Heaps (q225) / Zipf (q125) "
    "family.",
)
def q541(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.dayofmonth("ts").cast("bigint").alias("d")).agg(
        (F.count_distinct("user_id") * 1.0).alias("n"),
        (
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", F.round(F.col("value") * 100)
                ).otherwise(0)
            )
            * 1.0
        ).alias("v"),
    )
    ll = daily.filter(F.col("v") > 0).select(
        F.log("n").alias("x"),
        F.log("v").alias("y"),
        F.log(F.col("n") * F.log("n")).alias("x_od"),
    )
    m = ll.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum("x_od").alias("so"),
        F.sum(F.col("x_od") * F.col("x_od")).alias("soo"),
        F.sum(F.col("x_od") * F.col("y")).alias("soy"),
    )
    k, sx, sy = F.col("k"), F.col("sx"), F.col("sy")
    slope = (k * F.col("sxy") - sx * sy) / (k * F.col("sxx") - sx * sx)
    r2p = (
        (k * F.col("sxy") - sx * sy)
        * (k * F.col("sxy") - sx * sy)
        / ((k * F.col("sxx") - sx * sx) * (k * F.col("syy") - sy * sy))
    )
    r2o = (
        (k * F.col("soy") - F.col("so") * sy)
        * (k * F.col("soy") - F.col("so") * sy)
        / (
            (k * F.col("soo") - F.col("so") * F.col("so"))
            * (k * F.col("syy") - sy * sy)
        )
    )
    return m.select(
        k.cast("bigint").alias("n_days"),
        r6(slope).alias("metcalfe_exponent"),
        r6(r2p).alias("r2_power_law"),
        r6(r2o).alias("r2_nlogn"),
        (F.abs(slope - 2) < F.abs(slope - 1)).alias("closer_to_metcalfe"),
    )


# ---------------------------------------------------------------------------
# Q542 — greedy interval scheduling with a disjointness certificate
# ---------------------------------------------------------------------------
# User-day activity spans as intervals; earliest-finish-first greedy
# (provably optimal for interval scheduling) selects a maximum
# non-overlapping set in one fold over the end-sorted spans carrying
# [last_end, count] — the scheduling primitive behind q158 (coverage)
# and q135 (concurrency).
_Q542_ORACLE = """
    WITH spans AS (
      SELECT user_id, EXTRACT(day FROM ts) AS d,
             MIN(epoch_us(ts)) AS s, MAX(epoch_us(ts)) AS e
      FROM events GROUP BY user_id, EXTRACT(day FROM ts)
      HAVING MIN(epoch_us(ts)) < MAX(epoch_us(ts))
    ), ser AS (
      SELECT list([s, e] ORDER BY e, s, user_id) AS xs, COUNT(*) AS n
      FROM spans
    ), greedy AS (
      SELECT n,
        list_reduce(
          list_prepend([CAST(-1 AS BIGINT), 0], xs),
          (st, x) -> CASE WHEN x[1] >= st[1]
                          THEN [x[2], st[2] + 1]
                          ELSE st END
        ) AS st
      FROM ser
    )
    SELECT CAST(n AS BIGINT) AS n_intervals,
           CAST(st[2] AS BIGINT) AS n_selected,
           ROUND(st[2] * 1.0 / n + 5e-12, 6) AS selectivity
    FROM greedy
"""


@register(
    "q542_interval_scheduling",
    _Q542_ORACLE,
    doc="Earliest-finish-first interval scheduling (provably optimal) "
    "over user-day activity spans: one fold over the end-sorted "
    "intervals carrying [last_end, count] — the maximum "
    "non-overlapping meeting set beside interval coverage (q158) "
    "and the concurrency sweep (q135).",
)
def q542(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    spans = (
        ev.groupBy("user_id", F.dayofmonth("ts").alias("d"))
        .agg(F.min(t).alias("s"), F.max(t).alias("e"))
        .filter(F.col("s") < F.col("e"))
    )
    ser = spans.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("e", "s", "user_id"))),
            lambda r: F.array(r.s, r.e),
        ).alias("xs"),
        F.count(F.lit(1)).alias("n"),
    )
    neg1 = F.lit(-1).cast("bigint")
    zero = F.lit(0).cast("bigint")

    def step(st, x):
        return F.when(
            F.element_at(x, 1) >= F.element_at(st, 1),
            F.array(F.element_at(x, 2), F.element_at(st, 2) + 1),
        ).otherwise(st)

    greedy = ser.select(
        "n", F.aggregate(F.col("xs"), F.array(neg1, zero), step).alias("st")
    )
    return greedy.select(
        F.col("n").cast("bigint").alias("n_intervals"),
        F.element_at("st", 2).cast("bigint").alias("n_selected"),
        r6(F.element_at("st", 2) * 1.0 / F.col("n")).alias("selectivity"),
    )


# ---------------------------------------------------------------------------
# Q543 — checkpoint policy sizing (replay work vs interval)
# ---------------------------------------------------------------------------
# If the log checkpoints every W, a crash replays everything since
# the last checkpoint boundary: for W in 1h/6h/24h, the mean and
# worst-case replay work measured at every event (events since the
# floor(t/W) boundary) plus the checkpoint count — the RPO/RTO
# sizing table for streaming state (q453) and idempotent
# materialization (T2).
_Q543_ORACLE = """
    WITH ev AS (
      SELECT epoch_us(ts) // 1000000 AS t FROM events
      WHERE EXTRACT(day FROM ts) <= 7
    ), ws AS (
      SELECT * FROM (VALUES (1, 3600), (6, 21600), (24, 86400)) w(w_hr, w_s)
    ), pos AS (
      SELECT w.w_hr, w.w_s, e.t,
             ROW_NUMBER() OVER (PARTITION BY w.w_hr ORDER BY e.t) AS rn,
             e.t // w.w_s AS ck
      FROM ev e, ws w
    ), firsts AS (
      SELECT w_hr, ck, MIN(rn) AS rn0 FROM pos GROUP BY w_hr, ck
    ), work AS (
      SELECT p.w_hr, p.rn - f.rn0 AS replay
      FROM pos p JOIN firsts f ON f.w_hr = p.w_hr AND f.ck = p.ck
    )
    SELECT CAST(w_hr AS BIGINT) AS checkpoint_hr,
           CAST((SELECT COUNT(DISTINCT ck) FROM pos p2
                 WHERE p2.w_hr = work.w_hr) AS BIGINT) AS n_checkpoints,
           ROUND(AVG(replay * 1.0) + 5e-10, 4) AS mean_replay_events,
           CAST(MAX(replay) AS BIGINT) AS worst_replay_events
    FROM work GROUP BY w_hr ORDER BY checkpoint_hr
"""


@register(
    "q543_checkpoint_policy",
    _Q543_ORACLE,
    doc="Checkpoint-interval sizing: replay work at every possible "
    "crash point (events since the floor(t/W) boundary) for W = "
    "1h/6h/24h — mean and worst-case replay vs checkpoint count, "
    "the RPO/RTO table behind streaming state (q453) and idempotent "
    "materialization.",
)
def q543(spark: SparkSession, sf_dir: str) -> DataFrame:
    evt = _t(spark, sf_dir, "events").filter(F.dayofmonth("ts") <= 7)
    ev = evt.select(
        F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1000000).alias("t")
    )
    ws = spark.createDataFrame(
        [(1, 3600), (6, 21600), (24, 86400)], "w_hr int, w_s long"
    )
    pos = ev.crossJoin(F.broadcast(ws)).select(
        "w_hr",
        "t",
        F.row_number()
        .over(Window.partitionBy("w_hr").orderBy("t"))
        .alias("rn"),
        F.floor(F.col("t") / F.col("w_s")).alias("ck"),
    )
    firsts = pos.groupBy("w_hr", "ck").agg(F.min("rn").alias("rn0"))
    work = pos.join(firsts, ["w_hr", "ck"]).select(
        "w_hr", "ck", (F.col("rn") - F.col("rn0")).alias("replay")
    )
    nck = pos.groupBy("w_hr").agg(F.count_distinct("ck").alias("n_checkpoints"))
    return (
        work.groupBy("w_hr")
        .agg(
            F.round(F.avg(F.col("replay") * 1.0) + F.lit(5e-10), 4).alias(
                "mean_replay_events"
            ),
            F.max("replay").cast("bigint").alias("worst_replay_events"),
        )
        .join(nck, "w_hr")
        .select(
            F.col("w_hr").cast("bigint").alias("checkpoint_hr"),
            F.col("n_checkpoints").cast("bigint").alias("n_checkpoints"),
            "mean_replay_events",
            "worst_replay_events",
        )
        .orderBy("checkpoint_hr")
    )
