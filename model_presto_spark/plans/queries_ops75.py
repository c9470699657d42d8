"""Conformance queries batch #75 (q569+) — wavelet denoising, linear
probing, event-study coefficients, post-stratification, and
attribution-window sensitivity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q569 — Haar soft-threshold denoising with full reconstruction
# ---------------------------------------------------------------------------
# The q440 decomposition closed into a denoiser: noise scale from
# the MAD of the finest details, the universal threshold
# sigma sqrt(2 ln n), soft-thresholded details inverted level by
# level (odd = (a+d)/2, even = (a-d)/2 as pair joins) back to a
# smoothed 16-day series — detail energy removed and reconstruction
# RMSE as the outputs.
_Q569_ORACLE = """
    WITH d0 AS MATERIALIZED (
      SELECT CAST(EXTRACT(day FROM ts) AS BIGINT) AS i,
             CAST(SUM(ROUND(value * 100)) AS DOUBLE) AS v
      FROM events WHERE event_type = 'purchase' AND EXTRACT(day FROM ts) <= 16
      GROUP BY 1
    ), l1 AS MATERIALIZED (
      SELECT CAST(CEIL(i / 2.0) AS BIGINT) AS i,
             SUM(CASE WHEN i % 2 = 1 THEN v ELSE 0 END)
               + SUM(CASE WHEN i % 2 = 0 THEN v ELSE 0 END) AS a,
             SUM(CASE WHEN i % 2 = 1 THEN v ELSE 0 END)
               - SUM(CASE WHEN i % 2 = 0 THEN v ELSE 0 END) AS d
      FROM d0 GROUP BY 1
    ), l2 AS MATERIALIZED (
      SELECT CAST(CEIL(i / 2.0) AS BIGINT) AS i,
             SUM(CASE WHEN i % 2 = 1 THEN a ELSE 0 END)
               + SUM(CASE WHEN i % 2 = 0 THEN a ELSE 0 END) AS a,
             SUM(CASE WHEN i % 2 = 1 THEN a ELSE 0 END)
               - SUM(CASE WHEN i % 2 = 0 THEN a ELSE 0 END) AS d
      FROM l1 GROUP BY 1
    ), lam AS (
      SELECT quantile_cont(ABS(d), 0.5) / 0.6745
               * SQRT(2 * LN(16.0)) AS lam
      FROM l1
    ), s1 AS MATERIALIZED (
      SELECT l1.i, l1.a,
             SIGN(l1.d) * GREATEST(ABS(l1.d) - lam.lam, 0) AS d
      FROM l1, lam
    ), s2 AS MATERIALIZED (
      SELECT l2.i, l2.a,
             SIGN(l2.d) * GREATEST(ABS(l2.d) - lam.lam, 0) AS d
      FROM l2, lam
    ), r1 AS MATERIALIZED (
      -- invert level 2: a1_hat(2i-1) = (a2+d2)/2, a1_hat(2i) = (a2-d2)/2
      SELECT 2 * i - 1 AS i, (a + d) / 2 AS a FROM s2
      UNION ALL SELECT 2 * i, (a - d) / 2 FROM s2
    ), r0 AS MATERIALIZED (
      SELECT 2 * r1.i - 1 AS i, (r1.a + s1.d) / 2 AS v
      FROM r1 JOIN s1 ON s1.i = r1.i
      UNION ALL
      SELECT 2 * r1.i, (r1.a - s1.d) / 2
      FROM r1 JOIN s1 ON s1.i = r1.i
    ), err AS (
      SELECT SQRT(AVG((d0.v - r0.v) * (d0.v - r0.v))) AS rmse,
             MAX(ABS(d0.v - r0.v)) AS maxerr
      FROM d0 JOIN r0 ON r0.i = d0.i
    )
    SELECT ROUND((SELECT lam FROM lam) / 100.0 + 5e-8, 2) AS threshold_usd,
           ROUND(err.rmse / 100.0 + 5e-8, 2) AS rmse_usd,
           ROUND(err.maxerr / 100.0 + 5e-8, 2) AS max_err_usd,
           CAST((SELECT COUNT(*) FROM s1 WHERE d = 0) AS BIGINT)
             AS zeroed_details_l1,
           CAST((SELECT COUNT(*) FROM s2 WHERE d = 0) AS BIGINT)
             AS zeroed_details_l2
    FROM err
"""


@register(
    "q569_wavelet_denoise",
    _Q569_ORACLE,
    doc="Haar soft-threshold denoising of the 16-day revenue series: "
    "MAD noise scale from finest details, universal threshold "
    "sigma sqrt(2 ln n), two-level shrink-and-invert (pair joins "
    "both ways), RMSE and zeroed-coefficient counts — the denoiser "
    "the q440 energy analysis builds toward.",
)
def q569(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.dayofmonth("ts") <= 16)
    )
    d0 = ev.groupBy(F.dayofmonth("ts").cast("bigint").alias("i")).agg(
        F.sum(F.round(F.col("value") * 100)).cast("double").alias("v")
    ).localCheckpoint(eager=False)

    def level(df, vcol):
        odd = F.sum(F.when(F.col("i") % 2 == 1, F.col(vcol)).otherwise(0.0))
        even = F.sum(F.when(F.col("i") % 2 == 0, F.col(vcol)).otherwise(0.0))
        return df.groupBy(
            F.ceil(F.col("i") / 2.0).cast("bigint").alias("i")
        ).agg((odd + even).alias("a"), (odd - even).alias("d"))

    l1 = level(d0, "v").localCheckpoint(eager=False)
    l2 = level(l1.select("i", F.col("a")), "a").localCheckpoint(eager=False)
    lam = l1.agg(
        (
            F.percentile(F.abs("d"), F.lit(0.5))
            / 0.6745
            * F.sqrt(2 * F.log(F.lit(16.0)))
        ).alias("lam")
    )

    def shrink(df):
        return df.crossJoin(F.broadcast(lam)).select(
            "i",
            "a",
            (
                F.signum("d") * F.greatest(F.abs("d") - F.col("lam"), F.lit(0.0))
            ).alias("d"),
        )

    s1 = shrink(l1).localCheckpoint(eager=False)
    s2 = shrink(l2).localCheckpoint(eager=False)
    r1 = s2.select(
        (2 * F.col("i") - 1).alias("i"), ((F.col("a") + F.col("d")) / 2).alias("a")
    ).unionAll(
        s2.select((2 * F.col("i")).alias("i"), ((F.col("a") - F.col("d")) / 2))
    )
    s1j = s1.select(F.col("i").alias("j"), F.col("d").alias("d1"))
    r0 = (
        r1.join(s1j, r1.i == F.col("j"))
        .select(
            (2 * F.col("i") - 1).alias("i"),
            ((F.col("a") + F.col("d1")) / 2).alias("vr"),
        )
        .unionAll(
            r1.join(s1j, r1.i == F.col("j")).select(
                (2 * F.col("i")).alias("i"),
                ((F.col("a") - F.col("d1")) / 2),
            )
        )
    )
    err = d0.join(r0, "i").agg(
        F.sqrt(F.avg((F.col("v") - F.col("vr")) * (F.col("v") - F.col("vr")))).alias(
            "rmse"
        ),
        F.max(F.abs(F.col("v") - F.col("vr"))).alias("maxerr"),
    )
    z1 = s1.filter(F.col("d") == 0).agg(F.count(F.lit(1)).alias("z1"))
    z2 = s2.filter(F.col("d") == 0).agg(F.count(F.lit(1)).alias("z2"))
    r2 = lambda cexpr: F.round(cexpr + F.lit(5e-8), 2)  # noqa: E731
    return (
        err.crossJoin(F.broadcast(lam))
        .crossJoin(F.broadcast(z1))
        .crossJoin(F.broadcast(z2))
        .select(
            r2(F.col("lam") / 100.0).alias("threshold_usd"),
            r2(F.col("rmse") / 100.0).alias("rmse_usd"),
            r2(F.col("maxerr") / 100.0).alias("max_err_usd"),
            F.col("z1").cast("bigint").alias("zeroed_details_l1"),
            F.col("z2").cast("bigint").alias("zeroed_details_l2"),
        )
    )


# ---------------------------------------------------------------------------
# Q570 — linear probing displacement (Knuth's parking problem)
# ---------------------------------------------------------------------------
# 750 order keys inserted into a 1024-slot open-addressing table in
# key order: the fold carries the occupancy array, the inner probe
# is a capped scan for the first empty slot — mean and max probe
# lengths against Knuth's (1 + 1/(1-alpha))/2 successful-search
# expectation at load 0.73; same n at every SF so the load factor is
# pinned (hash-table internals beside hash quality q465 and birthday
# collisions q545).
def _q570_oracle() -> str:
    probe = "list_reduce(list_prepend([CAST(-1 AS BIGINT)], list_transform(generate_series(0, 63), p -> [CAST(p AS BIGINT)])), (b, p) -> CASE WHEN b[1] >= 0 THEN b WHEN st[CAST((h[1] + p[1]) % 1024 AS INT) + 3] = 0 THEN [p[1]] ELSE b END)[1]"
    step = (
        "list_concat([st[1] + " + probe + ", GREATEST(st[2], " + probe + ")],"
        " list_transform(st[3:], (slot, idx) -> CASE WHEN idx - 1"
        " = CAST((h[1] + " + probe + ") % 1024 AS BIGINT)"
        " THEN CAST(1 AS BIGINT) ELSE slot END))"
    )
    return """
    WITH ks AS (
      SELECT k FROM (
        SELECT o_orderkey AS k,
               ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
        FROM orders) WHERE rn <= 750
    ), hashed AS (
      SELECT list(CAST((k * 2654435761) % 4294967296 % 1024 AS BIGINT)
                  ORDER BY k) AS hs
      FROM ks
    ), sim AS (
      SELECT
        list_reduce(
          list_prepend(
            list_concat([CAST(0 AS BIGINT), 0],
              list_transform(generate_series(1, 1024),
                             z -> CAST(0 AS BIGINT))),
            list_transform(hs, h -> [h])),
          (st, h) -> """ + step + """
        ) AS st
      FROM hashed
    )
    SELECT CAST(750 AS BIGINT) AS n_keys,
           CAST(1024 AS BIGINT) AS table_size,
           ROUND(750 / 1024.0 + 5e-12, 6) AS load_factor,
           ROUND(st[1] / 750.0 + 1 + 5e-10, 4) AS mean_probes,
           CAST(st[2] + 1 AS BIGINT) AS max_probes,
           ROUND((1 + 1 / (1 - 750 / 1024.0)) / 2 + 5e-10, 4)
             AS knuth_expectation
    FROM sim
"""


@register(
    "q570_linear_probing",
    _q570_oracle(),
    doc="Linear probing measured: 750 keys into a 1024-slot table "
    "(load 0.73 pinned across SFs), occupancy array carried by the "
    "fold, first-empty-slot probe as an inner capped scan — mean "
    "and max probe lengths vs Knuth's (1 + 1/(1-a))/2 — the "
    "open-addressing half of the hash story (q465 balance, q545 "
    "collisions).",
)
def q570(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    # smallest 750 orderkeys via TakeOrderedAndProject — a global
    # row_number would sort the whole relation through one task just
    # to throw away all but the head (the collect_list below re-sorts
    # anyway, so limit-after-orderBy is order-equivalent here)
    ks = o.select(F.col("o_orderkey").alias("k")).orderBy("k").limit(750)
    hashed = ks.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("k"))),
            lambda s: ((s.k * 2654435761) % 4294967296 % 1024).cast("bigint"),
        ).alias("hs")
    )
    zero = F.lit(0).cast("bigint")
    neg1 = F.lit(-1).cast("bigint")
    # Occupancy as a 1024-BIT mask in 16 longs (state = [sum_probes,
    # max_probe, w0..w15], 18 elements) instead of 1024 slot elements:
    # the fold copies its whole state array every step, so shrinking
    # the state 64x is the lever (5.9 s -> sub-second steady; HOFs
    # run interpreted, never codegen). Bit masks come from a literal
    # power-of-two table because shiftleft takes only literal shift
    # amounts and F.expr cannot reference lambda variables.
    pow2 = F.array(
        *[
            F.lit(1 << b if b < 63 else -(2**63)).cast("bigint")
            for b in range(64)
        ]
    )
    init = F.concat(
        F.array(zero, zero),
        F.transform(F.sequence(F.lit(1), F.lit(16)), lambda z: zero),
    )

    def occupied(st, slot):
        word = F.element_at(st, F.floor(slot / 64).cast("int") + 3)
        mask = F.element_at(pow2, (slot % 64).cast("int") + 1)
        return word.bitwiseAND(mask) != 0

    def probe_of(st, h):
        return F.element_at(
            F.aggregate(
                F.transform(
                    F.sequence(F.lit(0), F.lit(63)), lambda p: p.cast("bigint")
                ),
                F.array(neg1),
                lambda b, p: F.when(F.element_at(b, 1) >= 0, b)
                .when(~occupied(st, (h + p) % 1024), F.array(p))
                .otherwise(b),
            ),
            1,
        )

    def step(st, h):
        # evaluate the 64-iteration probe scan ONCE per insert: bind
        # it as the single element of an inner aggregate (Catalyst
        # inlines a `pr` subexpression at EVERY reference otherwise —
        # three probe scans per step)
        return F.aggregate(
            F.transform(F.array(h), lambda hh: probe_of(st, hh)),
            st,
            lambda acc, pr: F.concat(
                F.array(
                    F.element_at(acc, 1) + pr,
                    F.greatest(F.element_at(acc, 2), pr),
                ),
                F.transform(
                    F.slice(acc, 3, 16),
                    lambda word, idx: F.when(
                        idx.cast("bigint")
                        == F.floor(((h + pr) % 1024) / 64),
                        word.bitwiseOR(
                            F.element_at(
                                pow2, (((h + pr) % 1024) % 64).cast("int") + 1
                            )
                        ),
                    ).otherwise(word),
                ),
            ),
        )

    sim = hashed.select(F.aggregate(F.col("hs"), init, step).alias("st"))
    r4 = lambda cexpr: F.round(cexpr + F.lit(5e-10), 4)  # noqa: E731
    return sim.select(
        F.lit(750).cast("bigint").alias("n_keys"),
        F.lit(1024).cast("bigint").alias("table_size"),
        r6(F.lit(750 / 1024.0)).alias("load_factor"),
        r4(F.element_at("st", 1) / 750.0 + 1).alias("mean_probes"),
        (F.element_at("st", 2) + 1).cast("bigint").alias("max_probes"),
        r4(F.lit((1 + 1 / (1 - 750 / 1024.0)) / 2)).alias(
            "knuth_expectation"
        ),
    )


# ---------------------------------------------------------------------------
# Q571 — event study around adoption (staggered first purchase)
# ---------------------------------------------------------------------------
# Each user's first purchase day is their adoption event; daily
# click counts at event time -3..+3 (relative to each user's own
# adoption) trace the dynamic response, with the pre-period
# flatness the identification check — the event-study plot that
# generalizes DiD (q235) to staggered timing.
_Q571_ORACLE = """
    WITH adopt AS MATERIALIZED (
      SELECT user_id, MIN(EXTRACT(day FROM ts)) AS a_day
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ), clicks AS (
      SELECT user_id, EXTRACT(day FROM ts) AS d, COUNT(*) AS c
      FROM events WHERE event_type = 'click' GROUP BY user_id,
        EXTRACT(day FROM ts)
    ), spine AS (
      SELECT a.user_id, a.a_day + et.e AS d, et.e
      FROM adopt a, (SELECT UNNEST(generate_series(-3, 3)) AS e) et
      WHERE a.a_day + et.e BETWEEN 1 AND 30
    ), panel AS (
      SELECT s.e, COALESCE(c.c, 0) AS clicks
      FROM spine s LEFT JOIN clicks c
        ON c.user_id = s.user_id AND c.d = s.d
    )
    SELECT CAST(e AS BIGINT) AS event_time,
           CAST(COUNT(*) AS BIGINT) AS n_user_days,
           ROUND(AVG(clicks * 1.0) + 5e-10, 4) AS mean_clicks,
           ROUND(AVG(clicks * 1.0)
                 - (SELECT AVG(clicks * 1.0) FROM panel WHERE e = -1)
                 + 5e-10, 4) AS vs_baseline
    FROM panel GROUP BY e ORDER BY event_time
"""


@register(
    "q571_event_study",
    _Q571_ORACLE,
    doc="Staggered-adoption event study: daily click counts at event "
    "time -3..+3 around each user's first purchase, normalized to "
    "the t = -1 baseline — the dynamic-response plot (and pre-trend "
    "check) that generalizes DiD (q235) to staggered timing.",
)
def q571(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    adopt = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.dayofmonth("ts")).alias("a_day"))
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.dayofmonth("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    et = spark.range(-3, 4).select(F.col("id").cast("int").alias("e"))
    spine = (
        adopt.crossJoin(F.broadcast(et))
        .select("user_id", (F.col("a_day") + F.col("e")).alias("d"), "e")
        .filter(F.col("d").between(1, 30))
    )
    panel = spine.join(clicks, ["user_id", "d"], "left").select(
        "e", F.coalesce("c", F.lit(0)).alias("clicks")
    ).localCheckpoint(eager=False)
    base = panel.filter(F.col("e") == -1).agg(
        F.avg(F.col("clicks") * 1.0).alias("b")
    )
    r4 = lambda cexpr: F.round(cexpr + F.lit(5e-10), 4)  # noqa: E731
    return (
        panel.groupBy("e")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_user_days"),
            F.avg(F.col("clicks") * 1.0).alias("mc"),
        )
        .crossJoin(F.broadcast(base))
        .select(
            F.col("e").cast("bigint").alias("event_time"),
            "n_user_days",
            r4(F.col("mc")).alias("mean_clicks"),
            r4(F.col("mc") - F.col("b")).alias("vs_baseline"),
        )
        .orderBy("event_time")
    )


# ---------------------------------------------------------------------------
# Q572 — post-stratification weighting with the Kish penalty
# ---------------------------------------------------------------------------
# A deliberately biased sample (all of nations 0-4 oversampled 3x)
# reweighted to nation population shares: unweighted vs weighted vs
# true means, and Kish's effective-sample penalty 1 + cv^2(weights)
# — the simplest bias-correction in the survey stack (raking q278
# handles two margins, Neyman q205 the allocation).
_Q572_ORACLE = """
    WITH pop AS MATERIALIZED (
      SELECT c_nationkey AS g, COUNT(*) AS np, AVG(c_acctbal) AS true_mu
      FROM customer GROUP BY c_nationkey
    ), samp AS MATERIALIZED (
      SELECT c_nationkey AS g, c_acctbal AS y
      FROM customer
      WHERE c_custkey % 7 = 0
         OR (c_nationkey < 5 AND c_custkey % 3 = 0)
    ), scount AS (
      SELECT g, COUNT(*) AS ns FROM samp GROUP BY g
    ), wts AS (
      SELECT s.g,
             (p.np * 1.0 / (SELECT SUM(np) FROM pop))
               / (s.ns * 1.0 / (SELECT SUM(ns) FROM scount)) AS w
      FROM scount s JOIN pop p ON p.g = s.g
    ), joined AS (
      SELECT sa.y, w.w FROM samp sa JOIN wts w ON w.g = sa.g
    )
    SELECT CAST((SELECT COUNT(*) FROM samp) AS BIGINT) AS n_sample,
           ROUND(AVG(y) + 5e-10, 4) AS unweighted_mean,
           ROUND(SUM(w * y) / SUM(w) + 5e-10, 4) AS weighted_mean,
           ROUND((SELECT SUM(np * true_mu) / SUM(np) FROM pop) + 5e-10, 4)
             AS true_mean,
           ROUND(1 + (AVG(w * w) - AVG(w) * AVG(w)) / (AVG(w) * AVG(w))
                 + 5e-12, 6) AS kish_deff
    FROM joined
"""


@register(
    "q572_poststratification",
    _Q572_ORACLE,
    doc="Post-stratification: a deliberately nation-biased sample "
    "reweighted to population shares — unweighted vs weighted vs "
    "true means with Kish's 1 + cv^2(w) effective-sample penalty — "
    "the one-margin survey correction under raking (q278) and "
    "Neyman allocation (q205).",
)
def q572(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    pop = c.groupBy(F.col("c_nationkey").alias("g")).agg(
        F.count(F.lit(1)).alias("np"), F.avg("c_acctbal").alias("true_mu")
    ).localCheckpoint(eager=False)
    samp = c.filter(
        (F.col("c_custkey") % 7 == 0)
        | ((F.col("c_nationkey") < 5) & (F.col("c_custkey") % 3 == 0))
    ).select(F.col("c_nationkey").alias("g"), F.col("c_acctbal").alias("y")).localCheckpoint(eager=False)
    scount = samp.groupBy("g").agg(F.count(F.lit(1)).alias("ns"))
    ptot = pop.agg(F.sum("np").alias("tp"))
    stot = scount.agg(F.sum("ns").alias("ts"))
    wts = (
        scount.join(pop, "g")
        .crossJoin(F.broadcast(ptot))
        .crossJoin(F.broadcast(stot))
        .select(
            "g",
            (
                (F.col("np") * 1.0 / F.col("tp"))
                / (F.col("ns") * 1.0 / F.col("ts"))
            ).alias("w"),
        )
    )
    joined = samp.join(F.broadcast(wts), "g")
    true_mean = pop.agg(
        (F.sum(F.col("np") * F.col("true_mu")) / F.sum("np")).alias("tm")
    )
    r4 = lambda cexpr: F.round(cexpr + F.lit(5e-10), 4)  # noqa: E731
    return joined.crossJoin(F.broadcast(true_mean)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sample"),
        r4(F.avg("y")).alias("unweighted_mean"),
        r4(F.sum(F.col("w") * F.col("y")) / F.sum("w")).alias("weighted_mean"),
        r4(F.first("tm")).alias("true_mean"),
        r6(
            1
            + (F.avg(F.col("w") * F.col("w")) - F.avg("w") * F.avg("w"))
            / (F.avg("w") * F.avg("w"))
        ).alias("kish_deff"),
    )


# ---------------------------------------------------------------------------
# Q573 — attribution-window sensitivity
# ---------------------------------------------------------------------------
# Each purchase's gap to the user's most recent prior click (IGNORE
# NULLS carry): the share of purchases a click-attribution model
# credits at 1h / 24h / 72h windows — the measurement-definition
# sensitivity every conversion dashboard hides (last-touch q120 and
# the funnel q118 assume a window; this prices the choice).
_Q573_ORACLE = """
    WITH seq AS (
      SELECT user_id, event_type, epoch_us(ts) AS t,
             MAX(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_click
      FROM events
    ), pur AS (
      SELECT (t - last_click) / 1e6 AS gap_s
      FROM seq WHERE event_type = 'purchase'
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_purchases,
           ROUND(AVG(CASE WHEN gap_s <= 3600 THEN 1.0 ELSE 0 END)
                 + 5e-12, 6) AS credited_1h,
           ROUND(AVG(CASE WHEN gap_s <= 86400 THEN 1.0 ELSE 0 END)
                 + 5e-12, 6) AS credited_24h,
           ROUND(AVG(CASE WHEN gap_s <= 259200 THEN 1.0 ELSE 0 END)
                 + 5e-12, 6) AS credited_72h,
           ROUND(AVG(CASE WHEN gap_s IS NULL THEN 1.0 ELSE 0 END)
                 + 5e-12, 6) AS never_clicked
    FROM pur
"""


@register(
    "q573_attribution_window",
    _Q573_ORACLE,
    doc="Attribution-window sensitivity: share of purchases credited "
    "to a prior click at 1h/24h/72h windows (last-click gap via a "
    "windowed running max), plus the never-clicked share — pricing "
    "the definitional knob under last-touch (q120) and funnels "
    "(q118).",
)
def q573(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    seq = ev.select(
        "event_type",
        t.alias("t"),
        F.max(F.when(F.col("event_type") == "click", t)).over(w).alias(
            "last_click"
        ),
    )
    pur = seq.filter(F.col("event_type") == "purchase").select(
        ((F.col("t") - F.col("last_click")) / 1e6).alias("gap_s")
    )
    return pur.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        r6(
            F.avg(F.when(F.col("gap_s") <= 3600, 1.0).otherwise(0.0))
        ).alias("credited_1h"),
        r6(
            F.avg(F.when(F.col("gap_s") <= 86400, 1.0).otherwise(0.0))
        ).alias("credited_24h"),
        r6(
            F.avg(F.when(F.col("gap_s") <= 259200, 1.0).otherwise(0.0))
        ).alias("credited_72h"),
        r6(
            F.avg(F.when(F.col("gap_s").isNull(), 1.0).otherwise(0.0))
        ).alias("never_clicked"),
    )
