"""Conformance queries batch #37 (q379+) — offline policy replay,
restricted mean survival time, hierarchical forecast
reconciliation, popularity-recommender hold-out evaluation, and
winsorized/trimmed robust means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q379 — offline policy evaluation by replay
# ---------------------------------------------------------------------------
# The Li et al. replay estimator: a candidate policy (deterministic
# hour-of-day -> action map) is scored on logged data by averaging
# reward over exactly the events where the logged action equals the
# policy's choice.  One conditional aggregation; reported beside
# the logging-policy baseline and the match rate (the estimator's
# effective sample).
_Q379_ORACLE = """
    WITH base AS (
      SELECT event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS r_c,
             CASE WHEN EXTRACT(hour FROM ts) < 6 THEN 'view'
                  WHEN EXTRACT(hour FROM ts) < 12 THEN 'click'
                  WHEN EXTRACT(hour FROM ts) < 18 THEN 'purchase'
                  ELSE 'signup' END AS pi_action
      FROM events
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_logged,
           CAST(SUM(CASE WHEN event_type = pi_action THEN 1 ELSE 0 END)
                AS BIGINT) AS n_matched,
           ROUND(SUM(CASE WHEN event_type = pi_action THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*) + 5e-12, 6) AS match_rate,
           ROUND(SUM(CASE WHEN event_type = pi_action THEN r_c ELSE 0 END)
                 * 1.0
                 / SUM(CASE WHEN event_type = pi_action THEN 1 ELSE 0 END)
                 + 5e-12, 6) AS policy_value_c,
           ROUND(AVG(r_c) + 5e-12, 6) AS logging_value_c
    FROM base
"""


@register(
    "q379_policy_replay",
    _Q379_ORACLE,
    doc="Offline bandit policy evaluation by replay: a deterministic "
    "hour->action policy scored on the events where the logged "
    "action agrees (unbiased under uniform logging), beside the "
    "logging baseline and match rate.  One conditional "
    "aggregation — the evaluation loop of recommendation policy "
    "changes without an online test.",
)
def q379(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pi = (
        F.when(F.hour("ts") < 6, "view")
        .when(F.hour("ts") < 12, "click")
        .when(F.hour("ts") < 18, "purchase")
        .otherwise("signup")
    )
    base = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("r_c"),
        pi.alias("pi_action"),
    )
    m = F.col("event_type") == F.col("pi_action")
    return base.agg(
        F.count(F.lit(1)).alias("n_logged"),
        F.sum(F.when(m, 1).otherwise(0)).cast("bigint").alias("n_matched"),
        r6(F.sum(F.when(m, 1).otherwise(0)) * 1.0 / F.count(F.lit(1))).alias(
            "match_rate"
        ),
        r6(
            F.sum(F.when(m, F.col("r_c")).otherwise(0))
            * 1.0
            / F.sum(F.when(m, 1).otherwise(0))
        ).alias("policy_value_c"),
        r6(F.avg("r_c")).alias("logging_value_c"),
    )


# ---------------------------------------------------------------------------
# Q380 — restricted mean survival time (area under the KM curve)
# ---------------------------------------------------------------------------
# RMST(tau) = integral of S(t) from 0 to tau — "expected days until
# conversion, capped at tau", the clinically-preferred scalar
# summary when hazards aren't proportional.  Reuses q108's KM
# subjects (first event -> first high-value purchase, censored at
# horizon); the integral is one lead() over the tiny step curve
# plus the S=1 segment before the first event time.
_Q380_TAU = 29
_KM_TH = 150

_Q380_ORACLE = f"""
    WITH first_e AS (
      SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY 1
    ), conv AS (
      SELECT user_id, MIN(ts) AS conv_ts
      FROM events WHERE event_type = 'purchase' AND value > {_KM_TH}
      GROUP BY 1
    ), horizon AS (SELECT MAX(ts) AS m FROM events),
    subj AS (
      SELECT CASE WHEN cv.conv_ts IS NOT NULL
                  THEN datediff('day', CAST(fe.first_ts AS DATE),
                                CAST(cv.conv_ts AS DATE))
                  ELSE datediff('day', CAST(fe.first_ts AS DATE),
                                CAST((SELECT m FROM horizon) AS DATE))
             END AS dur,
             CASE WHEN cv.conv_ts IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM first_e fe LEFT JOIN conv cv ON cv.user_id = fe.user_id
    ), per_t AS (
      SELECT dur AS t, SUM(ev) AS d, SUM(1 - ev) AS c FROM subj GROUP BY 1
    ), staged AS (
      SELECT t, d,
             SUM(d + c) OVER ()
               - COALESCE(SUM(d + c) OVER (
                   ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS n_risk
      FROM per_t
    ), curve AS (
      SELECT t,
             exp(SUM(ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)))
                 OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW)) AS s
      FROM staged WHERE d > 0 AND d < n_risk
    ), segs AS (
      SELECT t, s,
             LEAST(COALESCE(LEAD(t) OVER (ORDER BY t), {_Q380_TAU}),
                   {_Q380_TAU}) AS t_next
      FROM curve WHERE t < {_Q380_TAU}
    )
    SELECT CAST({_Q380_TAU} AS BIGINT) AS tau,
           CAST(COUNT(*) AS BIGINT) AS n_steps,
           ROUND(MIN(t) * 1.0 + SUM(s * (t_next - t)) + 5e-12, 6) AS rmst_days
    FROM segs
"""


@register(
    "q380_rmst",
    _Q380_ORACLE,
    doc=f"Restricted mean survival time at tau={_Q380_TAU} days: "
    "area under q108's KM step curve — the collapsed per-duration "
    "relation windows once for the curve, one lead() caps segment "
    "ends at tau, plus the S=1 head segment.  The scalar survival "
    "summary that stays valid when hazards cross.",
)
def q380(spark: SparkSession, sf_dir: str) -> DataFrame:
    from model_presto_spark.operators.temporal import kaplan_meier

    events = _t(spark, sf_dir, "events")
    first_e = events.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    conv = (
        events.where(
            (F.col("event_type") == "purchase") & (F.col("value") > _KM_TH)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("conv_ts"))
    )
    horizon = events.agg(F.max("ts").alias("m"))
    subj = (
        first_e.join(conv, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(
                F.col("conv_ts").isNotNull(),
                F.datediff(
                    F.col("conv_ts").cast("date"), F.col("first_ts").cast("date")
                ),
            )
            .otherwise(
                F.datediff(
                    F.col("m").cast("date"), F.col("first_ts").cast("date")
                )
            )
            .alias("dur"),
            F.when(F.col("conv_ts").isNotNull(), 1).otherwise(0).alias("ev"),
        )
    )
    km = kaplan_meier(subj, "dur", "ev")
    curve = km.filter(
        (F.col("n_events") > 0) & (F.col("n_events") < F.col("n_risk"))
    ).select("t", "survival")
    w = Window.orderBy("t")
    segs = curve.filter(F.col("t") < _Q380_TAU).select(
        "t",
        "survival",
        F.least(
            F.coalesce(F.lead("t").over(w), F.lit(_Q380_TAU)),
            F.lit(_Q380_TAU),
        ).alias("t_next"),
    )
    return segs.agg(
        F.lit(_Q380_TAU).cast("bigint").alias("tau"),
        F.count(F.lit(1)).alias("n_steps"),
        r6(
            F.min("t") * 1.0
            + F.sum(F.col("survival") * (F.col("t_next") - F.col("t")))
        ).alias("rmst_days"),
    )


# ---------------------------------------------------------------------------
# Q381 — hierarchical forecast reconciliation (bottom-up vs top-down)
# ---------------------------------------------------------------------------
# Seasonal-naive (day-7 lag) daily order-count forecasts for one
# target week, produced at the region level (bottom-up) and at the
# total level allocated down by trailing 4-week region shares
# (top-down).  Coherence: BU totals equal the direct total forecast
# by linearity; what differs — and what the query scores — is the
# REGION-level MAE of each approach.
_Q381_ORACLE = """
    WITH daily AS (
      SELECT r.r_name, CAST(o.o_orderdate AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE o.o_orderdate >= TIMESTAMP '2001-06-11'
        AND o.o_orderdate <  TIMESTAMP '2001-07-16'
      GROUP BY 1, 2
    ), target AS (
      SELECT * FROM daily
      WHERE d >= DATE '2001-07-09' AND d < DATE '2001-07-16'
    ), bu AS (
      SELECT r_name, d + INTERVAL 7 DAY AS d, y AS f
      FROM daily WHERE d >= DATE '2001-07-02' AND d < DATE '2001-07-09'
    ), tot_hist AS (
      SELECT d, SUM(y) AS yt FROM daily GROUP BY d
    ), tot_fc AS (
      SELECT d + INTERVAL 7 DAY AS d, yt AS ft
      FROM tot_hist WHERE d >= DATE '2001-07-02' AND d < DATE '2001-07-09'
    ), shares AS (
      SELECT r_name, SUM(y) * 1.0 / (SELECT SUM(y) FROM daily
             WHERE d < DATE '2001-07-09') AS w
      FROM daily WHERE d < DATE '2001-07-09' GROUP BY r_name
    ), td AS (
      SELECT s.r_name, t.d, t.ft * s.w AS f
      FROM tot_fc t CROSS JOIN shares s
    )
    SELECT 'bottom_up' AS approach,
           ROUND(AVG(abs(tg.y - b.f)) + 5e-12, 6) AS region_mae
    FROM target tg JOIN bu b ON b.r_name = tg.r_name AND b.d = tg.d
    UNION ALL
    SELECT 'top_down' AS approach,
           ROUND(AVG(abs(tg.y - t.f)) + 5e-12, 6) AS region_mae
    FROM target tg JOIN td t ON t.r_name = tg.r_name AND t.d = tg.d
    ORDER BY approach
"""


@register(
    "q381_forecast_reconciliation",
    _Q381_ORACLE,
    doc="Hierarchical forecast reconciliation scored at the region "
    "level: seasonal-naive day-7 forecasts bottom-up (per region) "
    "vs top-down (total forecast x trailing region shares).  All "
    "relations collapse to (region x day) before any join; shares "
    "and the total forecast broadcast.  The question grouped "
    "forecasting systems must answer: forecast low and aggregate, "
    "or forecast high and allocate.",
)
def q381(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "2001-06-11")
        & (F.col("o_orderdate") < "2001-07-16")
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    daily = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("y"))
        # lineage cut: daily feeds target/bottom-up/top-down/history
        # branches (plan audit: 48 scans un-materialized)
        .localCheckpoint(eager=False)
    )
    target = daily.filter(
        (F.col("d") >= "2001-07-09") & (F.col("d") < "2001-07-16")
    ).select(
        F.col("r_name").alias("t_region"),
        F.col("d").alias("t_d"),
        F.col("y").alias("y_act"),
    )
    bu = daily.filter(
        (F.col("d") >= "2001-07-02") & (F.col("d") < "2001-07-09")
    ).select(
        F.col("r_name").alias("b_region"),
        F.date_add(F.col("d"), 7).alias("b_d"),
        F.col("y").cast("double").alias("f_bu"),
    )
    tot_fc = (
        daily.filter(
            (F.col("d") >= "2001-07-02") & (F.col("d") < "2001-07-09")
        )
        .groupBy(F.date_add(F.col("d"), 7).alias("f_d"))
        .agg(F.sum("y").cast("double").alias("ft"))
    )
    hist = daily.filter(F.col("d") < "2001-07-09")
    hist_tot = hist.agg(F.sum("y").alias("ht"))
    shares = (
        hist.groupBy(F.col("r_name").alias("s_region"))
        .agg(F.sum("y").alias("sy"))
        .crossJoin(F.broadcast(hist_tot))
        .select("s_region", (F.col("sy") * 1.0 / F.col("ht")).alias("w"))
    )
    td = tot_fc.crossJoin(F.broadcast(shares)).select(
        F.col("s_region").alias("d_region"),
        F.col("f_d").alias("d_d"),
        (F.col("ft") * F.col("w")).alias("f_td"),
    )
    mae_bu = (
        target.join(
            bu,
            (F.col("t_region") == F.col("b_region"))
            & (F.col("t_d") == F.col("b_d")),
        )
        .agg(r6(F.avg(F.abs(F.col("y_act") - F.col("f_bu")))).alias("region_mae"))
        .select(F.lit("bottom_up").alias("approach"), "region_mae")
    )
    mae_td = (
        target.join(
            td,
            (F.col("t_region") == F.col("d_region"))
            & (F.col("t_d") == F.col("d_d")),
        )
        .agg(r6(F.avg(F.abs(F.col("y_act") - F.col("f_td")))).alias("region_mae"))
        .select(F.lit("top_down").alias("approach"), "region_mae")
    )
    return mae_bu.unionByName(mae_td).orderBy("approach")


# ---------------------------------------------------------------------------
# Q382 — popularity recommender with hold-out evaluation
# ---------------------------------------------------------------------------
# The recsys baseline every model must beat: hold out each
# customer's LAST order, build the global popularity top-10 from
# the remaining (training) lineitems, score hit@10 = did the
# held-out order contain any top-10 part.  Train/test split, model
# build, and evaluation — all in one plan, leakage-free by
# construction (held-out orders are anti-joined out of training).
_Q382_K = 10

_Q382_ORACLE = f"""
    WITH last_ord AS (
      SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC)
               AS rn
      FROM orders
    ), test_orders AS (
      SELECT o_custkey, o_orderkey FROM last_ord WHERE rn = 1
    ), train_li AS (
      SELECT l.l_partkey FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM test_orders t
                        WHERE t.o_orderkey = l.l_orderkey)
    ), pop AS (
      SELECT l_partkey,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, l_partkey) AS rnk
      FROM train_li GROUP BY l_partkey
    ), topk AS (SELECT l_partkey FROM pop WHERE rnk <= {_Q382_K}),
    hits AS (
      SELECT t.o_custkey,
             MAX(CASE WHEN EXISTS (SELECT 1 FROM topk k
                                   WHERE k.l_partkey = l.l_partkey)
                      THEN 1 ELSE 0 END) AS hit
      FROM test_orders t JOIN lineitem l ON l.l_orderkey = t.o_orderkey
      GROUP BY t.o_custkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(hit) AS BIGINT) AS n_hits,
           ROUND(SUM(hit) * 1.0 / COUNT(*) + 5e-12, 6) AS hit_rate
    FROM hits
"""


@register(
    "q382_popularity_recsys",
    _Q382_ORACLE,
    doc=f"Popularity-baseline recommender evaluated leave-last-"
    f"order-out: test = each customer's latest order (one window), "
    f"training = lineitems anti-joined against test orders, model = "
    f"global top-{_Q382_K} parts (broadcast), metric = hit@"
    f"{_Q382_K} per customer.  The leakage-free split/train/eval "
    "loop as one plan — the baseline every recsys ablation needs.",
)
def q382(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    test_orders = (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey")
    )
    train_li = li.join(
        test_orders.select(F.col("o_orderkey").alias("t_key")),
        li.l_orderkey == F.col("t_key"),
        "left_anti",
    )
    pop = train_li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    topk = (
        pop.withColumn(
            "rnk",
            F.row_number().over(Window.orderBy(F.col("n").desc(), "l_partkey")),
        )
        .filter(F.col("rnk") <= _Q382_K)
        .select(F.col("l_partkey").alias("k_part"))
    )
    hits = (
        test_orders.join(li, li.l_orderkey == test_orders.o_orderkey)
        .join(F.broadcast(topk), li.l_partkey == F.col("k_part"), "left")
        .groupBy("o_custkey")
        .agg(
            F.max(
                F.when(F.col("k_part").isNotNull(), 1).otherwise(0)
            ).alias("hit")
        )
    )
    return hits.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("hit").cast("bigint").alias("n_hits"),
        r6(F.sum("hit") * 1.0 / F.count(F.lit(1))).alias("hit_rate"),
    )


# ---------------------------------------------------------------------------
# Q383 — winsorized and trimmed means
# ---------------------------------------------------------------------------
# Robust location per event type: the raw mean beside the 5%-
# winsorized mean (tails CLAMPED to the exact p05/p95) and the
# 5%-trimmed mean (tails DROPPED) — the standard robustness ladder,
# with the exact percentile cut-points computed once per group and
# broadcast back.
_Q383_ORACLE = """
    WITH base AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS y FROM events
    ), cuts AS (
      SELECT event_type,
             quantile_cont(y, 0.05) AS p05,
             quantile_cont(y, 0.95) AS p95
      FROM base GROUP BY event_type
    )
    SELECT b.event_type,
           ROUND(AVG(b.y) + 5e-12, 6) AS raw_mean,
           ROUND(AVG(CASE WHEN b.y < c.p05 THEN c.p05
                          WHEN b.y > c.p95 THEN c.p95
                          ELSE b.y END) + 5e-12, 6) AS winsorized_mean,
           ROUND(AVG(CASE WHEN b.y >= c.p05 AND b.y <= c.p95
                          THEN CAST(b.y AS DOUBLE) END) + 5e-12, 6)
             AS trimmed_mean
    FROM base b JOIN cuts c ON c.event_type = b.event_type
    GROUP BY b.event_type ORDER BY b.event_type
"""


@register(
    "q383_winsorized_means",
    _Q383_ORACLE,
    doc="Robust-location ladder per event type: raw vs 5%-winsorized "
    "(tails clamped to exact p05/p95) vs 5%-trimmed (tails "
    "dropped) means — exact per-group percentile cut-points "
    "broadcast back, one conditional aggregation.  Integer cents "
    "keep the clamp boundaries deterministic.",
)
def q383(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("y")
    )
    cuts = base.groupBy(F.col("event_type").alias("c_type")).agg(
        F.percentile(F.col("y"), F.lit(0.05)).alias("p05"),
        F.percentile(F.col("y"), F.lit(0.95)).alias("p95"),
    )
    clamped = (
        F.when(F.col("y") < F.col("p05"), F.col("p05"))
        .when(F.col("y") > F.col("p95"), F.col("p95"))
        .otherwise(F.col("y"))
    )
    trimmed = F.when(
        (F.col("y") >= F.col("p05")) & (F.col("y") <= F.col("p95")),
        F.col("y").cast("double"),
    )
    return (
        base.join(F.broadcast(cuts), F.col("event_type") == F.col("c_type"))
        .groupBy("event_type")
        .agg(
            r6(F.avg("y")).alias("raw_mean"),
            r6(F.avg(clamped)).alias("winsorized_mean"),
            r6(F.avg(trimmed)).alias("trimmed_mean"),
        )
        .orderBy("event_type")
    )
