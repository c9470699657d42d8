"""Conformance queries batch #63 (q509+) — 1-NN matching estimator,
polyline simplification, decision-curve analysis, gambler's ruin,
and rate-limiter window semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q509 — 1-NN covariate matching (ATT)
# ---------------------------------------------------------------------------
# Treatment = AUTOMOBILE segment; each treated customer is matched to
# the balance-nearest control via the union-sort trick (previous and
# next control on the sorted balance axis through IGNORE NULLS window
# carries — exact nearest neighbor, no band join).  ATT vs the naive
# contrast shows the covariate imbalance that matching removes — the
# fifth identification strategy beside IPW (q360), backdoor (q481),
# DiD (q235) and RDD (q388).
_Q509_ORACLE = """
    WITH u AS (
      SELECT c.c_custkey AS id,
             CASE WHEN c.c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS t,
             CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS bal,
             COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0) AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_mktsegment, c.c_acctbal
    ), s AS (
      SELECT id, t, bal, y,
             LAG(CASE WHEN t = 0 THEN y END IGNORE NULLS)
               OVER (ORDER BY bal, id) AS prev_y,
             LAG(CASE WHEN t = 0 THEN bal END IGNORE NULLS)
               OVER (ORDER BY bal, id) AS prev_bal,
             LEAD(CASE WHEN t = 0 THEN y END IGNORE NULLS)
               OVER (ORDER BY bal, id) AS next_y,
             LEAD(CASE WHEN t = 0 THEN bal END IGNORE NULLS)
               OVER (ORDER BY bal, id) AS next_bal
      FROM u
    ), m AS (
      SELECT id, bal, y,
             CASE WHEN next_bal IS NULL THEN prev_y
                  WHEN prev_bal IS NULL THEN next_y
                  WHEN bal - prev_bal <= next_bal - bal THEN prev_y
                  ELSE next_y END AS ym,
             CASE WHEN next_bal IS NULL THEN bal - prev_bal
                  WHEN prev_bal IS NULL THEN next_bal - bal
                  ELSE LEAST(bal - prev_bal, next_bal - bal) END AS mdist
      FROM s WHERE t = 1
    ), naive AS (
      SELECT AVG(CASE WHEN t = 1 THEN y * 1.0 END)
               - AVG(CASE WHEN t = 0 THEN y * 1.0 END) AS nd
      FROM u
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_treated,
           ROUND(AVG(y * 1.0 - ym) / 100.0 + 5e-8, 2) AS att_usd,
           ROUND((SELECT nd FROM naive) / 100.0 + 5e-8, 2) AS naive_usd,
           ROUND(AVG(mdist * 1.0) / 100.0 + 5e-8, 2) AS mean_match_dist_usd
    FROM m
"""


@register(
    "q509_matching_att",
    _Q509_ORACLE,
    doc="1-NN covariate matching ATT: treated customers matched to "
    "the balance-nearest control by the union-sort trick (IGNORE "
    "NULLS carries of the previous/next control — exact nearest, "
    "one sort, no band join); ATT vs naive contrast and mean match "
    "distance — the matching identification strategy beside IPW "
    "(q360) and backdoor (q481).",
)
def q509(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    u = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment", "c_acctbal")
        .agg(
            F.coalesce(F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0)).alias(
                "y"
            )
        )
        .select(
            F.col("c_custkey").alias("id"),
            F.when(F.col("c_mktsegment") == "AUTOMOBILE", 1).otherwise(0).alias("t"),
            F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal"),
            "y",
        )
    )
    # Both carry directions as GROWING frames: Spark evaluates an
    # (x, unboundedFollowing) frame by rescanning to the partition end
    # for every row — O(n²) in the window (measured ~5 s at sf0.1 for
    # 15k customers) — while (unboundedPreceding, y) frames update
    # incrementally. "Next control in ascending (bal, id) order" ==
    # "previous control in descending order", and the order is a total
    # order (id unique), so the reversed-sort growing frame is
    # row-identical (set-compared at sf0.1): ~0.5 s.
    wa = Window.orderBy("bal", "id").rowsBetween(Window.unboundedPreceding, -1)
    wd = Window.orderBy(F.desc("bal"), F.desc("id")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    ctrl_y = F.when(F.col("t") == 0, F.col("y"))
    ctrl_b = F.when(F.col("t") == 0, F.col("bal"))
    s = u.select(
        "id",
        "t",
        "bal",
        "y",
        F.last(ctrl_y, ignorenulls=True).over(wa).alias("prev_y"),
        F.last(ctrl_b, ignorenulls=True).over(wa).alias("prev_bal"),
        F.last(ctrl_y, ignorenulls=True).over(wd).alias("next_y"),
        F.last(ctrl_b, ignorenulls=True).over(wd).alias("next_bal"),
    )
    m = s.filter(F.col("t") == 1).select(
        "y",
        F.when(F.col("next_bal").isNull(), F.col("prev_y"))
        .when(F.col("prev_bal").isNull(), F.col("next_y"))
        .when(
            F.col("bal") - F.col("prev_bal") <= F.col("next_bal") - F.col("bal"),
            F.col("prev_y"),
        )
        .otherwise(F.col("next_y"))
        .alias("ym"),
        F.when(F.col("next_bal").isNull(), F.col("bal") - F.col("prev_bal"))
        .when(F.col("prev_bal").isNull(), F.col("next_bal") - F.col("bal"))
        .otherwise(
            F.least(
                F.col("bal") - F.col("prev_bal"), F.col("next_bal") - F.col("bal")
            )
        )
        .alias("mdist"),
    )
    naive = u.agg(
        (
            F.avg(F.when(F.col("t") == 1, F.col("y") * 1.0))
            - F.avg(F.when(F.col("t") == 0, F.col("y") * 1.0))
        ).alias("nd")
    )
    r2 = lambda cexpr: F.round(cexpr + F.lit(5e-8), 2)  # noqa: E731
    return m.crossJoin(F.broadcast(naive)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_treated"),
        r2(F.avg(F.col("y") * 1.0 - F.col("ym")) / 100.0).alias("att_usd"),
        r2(F.first("nd") / 100.0).alias("naive_usd"),
        r2(F.avg(F.col("mdist") * 1.0) / 100.0).alias("mean_match_dist_usd"),
    )


# ---------------------------------------------------------------------------
# Q510 — Visvalingam polyline simplification (one pass)
# ---------------------------------------------------------------------------
# The daily revenue polyline simplified by effective area: each
# interior point's doubled triangle area with its neighbors (exact
# integers on (day, cents)), keep endpoints plus the top half by
# area, then linearly interpolate the dropped days from the kept
# neighbors (IGNORE NULLS carries) and score the reconstruction —
# the dashboard-downsampling primitive with a measured error bar.
_Q510_ORACLE = """
    WITH daily AS (
      SELECT CAST(EXTRACT(day FROM ts) AS BIGINT) AS d,
             CAST(SUM(ROUND(value * 100)) AS BIGINT) AS v
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), area AS (
      SELECT d, v,
             ABS(LAG(d) OVER w * (v - LEAD(v) OVER w)
                 + d * (LEAD(v) OVER w - LAG(v) OVER w)
                 + LEAD(d) OVER w * (LAG(v) OVER w - v)) AS a2
      FROM daily WINDOW w AS (ORDER BY d)
    ), med AS (
      SELECT quantile_cont(a2, 0.5) AS m FROM area WHERE a2 IS NOT NULL
    ), keepers AS (
      SELECT d, v,
             CASE WHEN a2 IS NULL OR a2 > (SELECT m FROM med)
                  THEN 1 ELSE 0 END AS keep
      FROM area
    ), filled AS (
      SELECT d, v, keep,
             LAST_VALUE(CASE WHEN keep = 1 THEN v END IGNORE NULLS)
               OVER (ORDER BY d) AS pv,
             LAST_VALUE(CASE WHEN keep = 1 THEN d END IGNORE NULLS)
               OVER (ORDER BY d) AS pd,
             FIRST_VALUE(CASE WHEN keep = 1 THEN v END IGNORE NULLS)
               OVER (ORDER BY d ROWS BETWEEN CURRENT ROW
                     AND UNBOUNDED FOLLOWING) AS nv,
             FIRST_VALUE(CASE WHEN keep = 1 THEN d END IGNORE NULLS)
               OVER (ORDER BY d ROWS BETWEEN CURRENT ROW
                     AND UNBOUNDED FOLLOWING) AS nd
      FROM keepers
    ), err AS (
      SELECT d, v, keep,
             CASE WHEN keep = 1 THEN v * 1.0
                  ELSE pv + (nv - pv) * (d - pd) * 1.0 / (nd - pd) END
               AS recon
      FROM filled
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(keep) AS BIGINT) AS n_kept,
           ROUND(AVG(ABS(v - recon)) / 100.0 + 5e-8, 2) AS mae_usd,
           ROUND(MAX(ABS(v - recon)) / 100.0 + 5e-8, 2) AS max_err_usd,
           ROUND(COUNT(*) * 1.0 / SUM(keep) + 5e-12, 6) AS compression
    FROM err
"""


@register(
    "q510_polyline_simplify",
    _Q510_ORACLE,
    doc="Visvalingam effective-area simplification of the daily "
    "revenue polyline: exact integer doubled-triangle areas, keep "
    "endpoints + above-median-area points, reconstruct dropped days "
    "by linear interpolation between kept neighbors (IGNORE NULLS "
    "carries), MAE/max error and compression — chart downsampling "
    "with a certificate.",
)
def q510(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = ev.groupBy(F.dayofmonth("ts").cast("bigint").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100)).cast("bigint").alias("v")
    )
    w = Window.orderBy("d")
    area = daily.select(
        "d",
        "v",
        F.abs(
            F.lag("d").over(w) * (F.col("v") - F.lead("v").over(w))
            + F.col("d") * (F.lead("v").over(w) - F.lag("v").over(w))
            + F.lead("d").over(w) * (F.lag("v").over(w) - F.col("v"))
        ).alias("a2"),
    )
    med = area.filter(F.col("a2").isNotNull()).agg(
        F.percentile("a2", F.lit(0.5)).alias("m")
    )
    keepers = area.crossJoin(F.broadcast(med)).select(
        "d",
        "v",
        F.when(F.col("a2").isNull() | (F.col("a2") > F.col("m")), 1)
        .otherwise(0)
        .alias("keep"),
    )
    kv = F.when(F.col("keep") == 1, F.col("v"))
    kd = F.when(F.col("keep") == 1, F.col("d"))
    filled = keepers.select(
        "d",
        "v",
        "keep",
        F.last(kv, ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("pv"),
        F.last(kd, ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("pd"),
        # forward carries as growing frames on the reversed total
        # order (d unique): an (0, unboundedFollowing) frame rescans
        # to the end per row, the reversed growing frame is O(n)
        F.last(kv, ignorenulls=True)
        .over(
            Window.orderBy(F.desc("d")).rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .alias("nv"),
        F.last(kd, ignorenulls=True)
        .over(
            Window.orderBy(F.desc("d")).rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .alias("nd"),
    )
    recon = F.when(F.col("keep") == 1, F.col("v") * 1.0).otherwise(
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * (F.col("d") - F.col("pd"))
        * 1.0
        / (F.col("nd") - F.col("pd"))
    )
    err = filled.select("v", "keep", recon.alias("recon"))
    r2 = lambda cexpr: F.round(cexpr + F.lit(5e-8), 2)  # noqa: E731
    return err.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.sum("keep").cast("bigint").alias("n_kept"),
        r2(F.avg(F.abs(F.col("v") - F.col("recon"))) / 100.0).alias("mae_usd"),
        r2(F.max(F.abs(F.col("v") - F.col("recon"))) / 100.0).alias(
            "max_err_usd"
        ),
        r6(F.count(F.lit(1)) * 1.0 / F.sum("keep")).alias("compression"),
    )


# ---------------------------------------------------------------------------
# Q511 — decision curve analysis (net benefit vs threshold)
# ---------------------------------------------------------------------------
# A balance-percentile score predicting top-quartile spend: at each
# decision threshold pt the net benefit TP/n - FP/n * pt/(1-pt) is
# compared with treat-all and treat-none — the clinical-decision
# evaluation that AUC (q75) and calibration (q92) cannot answer
# ("should anyone act on this model, and at what threshold?").
_Q511_ORACLE = """
    WITH u AS (
      SELECT c.c_custkey,
             PERCENT_RANK() OVER (ORDER BY c.c_acctbal, c.c_custkey) AS score,
             COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0) AS spend
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_acctbal
    ), thr AS (
      SELECT quantile_cont(spend, 0.75) AS q75 FROM u
    ), lab AS (
      SELECT score, CASE WHEN spend > (SELECT q75 FROM thr)
                         THEN 1 ELSE 0 END AS y
      FROM u
    ), pts AS (
      SELECT g.i * 0.05 AS pt FROM generate_series(1, 10) g(i)
    ), nb AS (
      SELECT p.pt,
             SUM(CASE WHEN l.score >= 1 - p.pt AND l.y = 1 THEN 1 ELSE 0 END)
               * 1.0 / COUNT(*) AS tp_rate,
             SUM(CASE WHEN l.score >= 1 - p.pt AND l.y = 0 THEN 1 ELSE 0 END)
               * 1.0 / COUNT(*) AS fp_rate,
             AVG(l.y * 1.0) AS prev
      FROM pts p, lab l GROUP BY p.pt
    )
    SELECT ROUND(pt + 5e-12, 6) AS threshold,
           ROUND(tp_rate - fp_rate * pt / (1 - pt) + 5e-12, 6)
             AS nb_model,
           ROUND(prev - (1 - prev) * pt / (1 - pt) + 5e-12, 6)
             AS nb_treat_all,
           CAST(0.0 AS DOUBLE) AS nb_treat_none,
           (tp_rate - fp_rate * pt / (1 - pt))
             > GREATEST(prev - (1 - prev) * pt / (1 - pt), 0)
             AS model_wins
    FROM nb ORDER BY threshold
"""


@register(
    "q511_decision_curve",
    _Q511_ORACLE,
    doc="Decision-curve analysis: net benefit TP/n - FP/n * pt/(1-pt) "
    "of a balance-percentile score for top-quartile spend across "
    "ten thresholds vs treat-all / treat-none — the act-on-it "
    "evaluation beside AUC (q75) and calibration (q92).",
)
def q511(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    u = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            F.coalesce(F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0)).alias(
                "spend"
            )
        )
        .select(
            F.percent_rank()
            .over(Window.orderBy("c_acctbal", "c_custkey"))
            .alias("score"),
            "spend",
        )
    )
    thr = u.agg(F.percentile("spend", F.lit(0.75)).alias("q75"))
    lab = u.crossJoin(F.broadcast(thr)).select(
        "score",
        F.when(F.col("spend") > F.col("q75"), 1).otherwise(0).alias("y"),
    ).localCheckpoint(eager=False)
    pts = spark.range(1, 11).select((F.col("id") * 0.05).alias("pt"))
    nb = (
        pts.crossJoin(lab)
        .groupBy("pt")
        .agg(
            (
                F.sum(
                    F.when(
                        (F.col("score") >= 1 - F.col("pt")) & (F.col("y") == 1), 1
                    ).otherwise(0)
                )
                * 1.0
                / F.count(F.lit(1))
            ).alias("tp_rate"),
            (
                F.sum(
                    F.when(
                        (F.col("score") >= 1 - F.col("pt")) & (F.col("y") == 0), 1
                    ).otherwise(0)
                )
                * 1.0
                / F.count(F.lit(1))
            ).alias("fp_rate"),
            F.avg(F.col("y") * 1.0).alias("prev"),
        )
    )
    nbm = F.col("tp_rate") - F.col("fp_rate") * F.col("pt") / (1 - F.col("pt"))
    nba = F.col("prev") - (1 - F.col("prev")) * F.col("pt") / (1 - F.col("pt"))
    return nb.select(
        r6(F.col("pt")).alias("threshold"),
        r6(nbm).alias("nb_model"),
        r6(nba).alias("nb_treat_all"),
        F.lit(0.0).alias("nb_treat_none"),
        (nbm > F.greatest(nba, F.lit(0.0))).alias("model_wins"),
    ).orderBy("threshold")


# ---------------------------------------------------------------------------
# Q512 — gambler's ruin: first passage of real walks vs closed form
# ---------------------------------------------------------------------------
# Per-user +-1 walks (purchase up, click down, in time order); first
# passage to +3 or -3 measured per walk, against the closed-form
# ruin probability (1 - (q/p)^3) / (1 - (q/p)^6) at the measured
# step-up probability — random-walk theory audited on real event
# sequences (inspection paradox q483's walk sibling).
_Q512_ORACLE = """
    WITH steps AS (
      SELECT user_id,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END AS s,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS pos
      FROM events WHERE event_type IN ('purchase', 'click')
    ), cum AS (
      SELECT user_id, pos,
             SUM(s) OVER (PARTITION BY user_id ORDER BY pos) AS c
      FROM steps
    ), hits AS (
      SELECT user_id,
             MIN(CASE WHEN c = 3 THEN pos END) AS up_pos,
             MIN(CASE WHEN c = -3 THEN pos END) AS dn_pos
      FROM cum GROUP BY user_id
    ), resolved AS (
      SELECT user_id,
             CASE WHEN up_pos IS NOT NULL
                   AND (dn_pos IS NULL OR up_pos < dn_pos) THEN 1
                  WHEN dn_pos IS NOT NULL THEN 0 END AS hit_up
      FROM hits
      WHERE up_pos IS NOT NULL OR dn_pos IS NOT NULL
    ), p AS (
      SELECT AVG(CASE WHEN s = 1 THEN 1.0 ELSE 0 END) AS pu FROM steps
    ), theory AS (
      SELECT pu, (1 - POW((1 - pu) / pu, 3))
                 / (1 - POW((1 - pu) / pu, 6)) AS p_up
      FROM p
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_resolved_walks,
           ROUND((SELECT pu FROM theory) + 5e-12, 6) AS p_step_up,
           ROUND(AVG(hit_up * 1.0) + 5e-12, 6) AS empirical_up_rate,
           ROUND((SELECT p_up FROM theory) + 5e-12, 6) AS theory_up_rate,
           ROUND(AVG(hit_up * 1.0) - (SELECT p_up FROM theory) + 5e-12, 6)
             AS gap
    FROM resolved
"""


@register(
    "q512_gamblers_ruin",
    _Q512_ORACLE,
    doc="Gambler's ruin on real event walks: per-user +-1 sequences "
    "(purchase/click), first passage to +-3 via windowed cumulative "
    "sums and min crossing positions, empirical up-rate vs the "
    "closed form (1-(q/p)^3)/(1-(q/p)^6) at the measured step "
    "probability — random-walk theory with a data audit.",
)
def q512(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    steps = ev.select(
        "user_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(-1).alias("s"),
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("pos"),
    ).localCheckpoint(eager=False)
    cw = Window.partitionBy("user_id").orderBy("pos")
    cum = steps.select("user_id", "pos", F.sum("s").over(cw).alias("c"))
    hits = cum.groupBy("user_id").agg(
        F.min(F.when(F.col("c") == 3, F.col("pos"))).alias("up_pos"),
        F.min(F.when(F.col("c") == -3, F.col("pos"))).alias("dn_pos"),
    )
    resolved = hits.filter(
        F.col("up_pos").isNotNull() | F.col("dn_pos").isNotNull()
    ).select(
        F.when(
            F.col("up_pos").isNotNull()
            & (F.col("dn_pos").isNull() | (F.col("up_pos") < F.col("dn_pos"))),
            1,
        )
        .when(F.col("dn_pos").isNotNull(), 0)
        .alias("hit_up")
    )
    p = steps.agg(
        F.avg(F.when(F.col("s") == 1, 1.0).otherwise(0.0)).alias("pu")
    )
    ratio = (1 - F.col("pu")) / F.col("pu")
    theory = p.select(
        "pu",
        ((1 - F.pow(ratio, 3)) / (1 - F.pow(ratio, 6))).alias("p_up"),
    )
    return resolved.crossJoin(F.broadcast(theory)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_resolved_walks"),
        r6(F.first("pu")).alias("p_step_up"),
        r6(F.avg(F.col("hit_up") * 1.0)).alias("empirical_up_rate"),
        r6(F.first("p_up")).alias("theory_up_rate"),
        r6(F.avg(F.col("hit_up") * 1.0) - F.first("p_up")).alias("gap"),
    )


# ---------------------------------------------------------------------------
# Q513 — rate limiter semantics: fixed vs sliding windows
# ---------------------------------------------------------------------------
# The classic API-gateway gotcha measured: per user, the max request
# count in any SLIDING 6h window (RANGE frame over epoch seconds)
# vs the max in FIXED 6h buckets.  Users whose sliding max breaches
# the limit while every fixed bucket stays legal are the burst leak
# a fixed-window counter silently admits (token bucket q267 is the
# fix; stream-state q453 sizes the cost).
_Q513_ORACLE = """
    WITH ev AS (
      SELECT user_id, CAST(epoch_us(ts) // 1000000 AS BIGINT) AS t
      FROM events WHERE EXTRACT(day FROM ts) <= 7
    ), sliding AS (
      SELECT user_id,
             MAX(cnt) AS smax
      FROM (
        SELECT user_id,
               COUNT(*) OVER (PARTITION BY user_id ORDER BY t
                              RANGE BETWEEN 21599 PRECEDING AND CURRENT ROW)
                 AS cnt
        FROM ev
      ) GROUP BY user_id
    ), fixed AS (
      SELECT user_id, MAX(cnt) AS fmax
      FROM (
        SELECT user_id, t // 21600 AS b, COUNT(*) AS cnt
        FROM ev GROUP BY user_id, t // 21600
      ) GROUP BY user_id
    ), joined AS (
      SELECT s.user_id, s.smax, f.fmax
      FROM sliding s JOIN fixed f ON f.user_id = s.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN smax > 8 THEN 1 ELSE 0 END) AS BIGINT)
             AS sliding_violators,
           CAST(SUM(CASE WHEN fmax > 8 THEN 1 ELSE 0 END) AS BIGINT)
             AS fixed_violators,
           CAST(SUM(CASE WHEN smax > 8 AND fmax <= 8 THEN 1 ELSE 0 END)
                AS BIGINT) AS burst_leak_users,
           ROUND(AVG(smax * 1.0 / fmax) + 5e-12, 6) AS mean_burst_ratio,
           CAST(MAX(smax) AS BIGINT) AS worst_sliding_burst
    FROM joined
"""


@register(
    "q513_rate_limiter_windows",
    _Q513_ORACLE,
    doc="Fixed vs sliding rate-limit windows measured on real "
    "traffic: per-user max in any sliding 6h RANGE frame vs max "
    "fixed 6h bucket at limit 8 — the burst-leak population a "
    "fixed-window counter admits, with the mean burst ratio (token "
    "bucket q267's motivation, stream-state q453's cost side).",
)
def q513(spark: SparkSession, sf_dir: str) -> DataFrame:
    evt = _t(spark, sf_dir, "events").filter(F.dayofmonth("ts") <= 7)
    ev = evt.select(
        "user_id",
        F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1000000).alias("t"),
    )
    sw = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rangeBetween(-21599, Window.currentRow)
    )
    sliding = (
        ev.select("user_id", F.count(F.lit(1)).over(sw).alias("cnt"))
        .groupBy("user_id")
        .agg(F.max("cnt").alias("smax"))
    )
    fixed = (
        ev.groupBy("user_id", F.floor(F.col("t") / 21600).alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("user_id")
        .agg(F.max("cnt").alias("fmax"))
    )
    joined = sliding.join(fixed, "user_id")
    return joined.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(F.when(F.col("smax") > 8, 1).otherwise(0))
        .cast("bigint")
        .alias("sliding_violators"),
        F.sum(F.when(F.col("fmax") > 8, 1).otherwise(0))
        .cast("bigint")
        .alias("fixed_violators"),
        F.sum(F.when((F.col("smax") > 8) & (F.col("fmax") <= 8), 1).otherwise(0))
        .cast("bigint")
        .alias("burst_leak_users"),
        r6(F.avg(F.col("smax") * 1.0 / F.col("fmax"))).alias("mean_burst_ratio"),
        F.max("smax").cast("bigint").alias("worst_sliding_burst"),
    )
