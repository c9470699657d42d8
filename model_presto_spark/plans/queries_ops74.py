"""Conformance queries batch #74 (q564+) — peak-load pricing, the
Kelly criterion, sparse-matrix format sizing, Shapley channel
attribution, and the hot-hand measurement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q564 — peak-load pricing under shared capacity
# ---------------------------------------------------------------------------
# Peak (day) vs off-peak (night) demand curves from event willingness
# proxies; a 9x9 price grid prices both periods subject to the
# shared capacity binding only at peak — revenue-optimal pair
# flagged, showing the peak premium that capacity scarcity justifies
# (monopoly q517's two-period extension).
_Q564_ORACLE = """
    WITH ev AS MATERIALIZED (
      SELECT CASE WHEN EXTRACT(hour FROM ts) BETWEEN 8 AND 19
                  THEN 'peak' ELSE 'off' END AS period,
             value AS wtp
      FROM events WHERE event_type = 'purchase'
    ), qarr AS (
      SELECT quantile_cont(wtp, list_transform(generate_series(1, 9),
                                               i -> i / 10.0)) AS qa
      FROM ev
    ), grid AS (
      SELECT gp.i AS ip, go_.j AS io, q.qa[gp.i] AS p_peak,
             q.qa[go_.j] AS p_off
      FROM generate_series(1, 9) gp(i), generate_series(1, 9) go_(j), qarr q
    ), dem AS (
      SELECT g.ip, g.io, g.p_peak, g.p_off,
             SUM(CASE WHEN e.period = 'peak' AND e.wtp >= g.p_peak
                      THEN 1 ELSE 0 END) AS d_peak,
             SUM(CASE WHEN e.period = 'off' AND e.wtp >= g.p_off
                      THEN 1 ELSE 0 END) AS d_off
      FROM grid g, ev e GROUP BY g.ip, g.io, g.p_peak, g.p_off
    ), cap AS (
      SELECT CAST(0.6 * MAX(d_peak) AS BIGINT) AS k FROM dem
    ), rev AS (
      SELECT d.ip, d.io, d.p_peak, d.p_off,
             LEAST(d.d_peak, c.k) AS q_peak, d.d_off AS q_off,
             d.p_peak * LEAST(d.d_peak, c.k) + d.p_off * d.d_off AS r
      FROM dem d, cap c
    )
    SELECT ROUND(p_peak + 5e-8, 2) AS peak_price,
           ROUND(p_off + 5e-8, 2) AS off_price,
           CAST(q_peak AS BIGINT) AS peak_sold,
           CAST(q_off AS BIGINT) AS off_sold,
           ROUND(r / 100.0 + 5e-8, 2) AS revenue_usd,
           r = (SELECT MAX(r) FROM rev) AS is_optimal
    FROM rev ORDER BY r DESC, ip, io LIMIT 5
"""


@register(
    "q564_peak_load_pricing",
    _Q564_ORACLE,
    doc="Peak-load pricing: day/night demand curves from purchase "
    "willingness proxies, a 9x9 decile price grid with shared "
    "capacity binding at peak (60% of max peak demand), top-5 "
    "revenue pairs with the optimum flagged — the two-period "
    "capacity-scarcity extension of monopoly pricing (q517).",
)
def q564(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.when(F.hour("ts").between(8, 19), "peak")
            .otherwise("off")
            .alias("period"),
            F.col("value").alias("wtp"),
        )
        # lineage cut: ev feeds the quantile grid + the demand
        # cross-join (plan audit: 21 scans with persist-only lineage)
        .localCheckpoint(eager=False)
    )
    qarr = ev.agg(
        F.percentile(
            "wtp", F.array(*[F.lit(i / 10.0) for i in range(1, 10)])
        ).alias("qa")
    )
    gi = spark.range(1, 10).select(F.col("id").cast("int").alias("ip"))
    gj = spark.range(1, 10).select(F.col("id").cast("int").alias("io"))
    grid = (
        gi.crossJoin(F.broadcast(gj))
        .crossJoin(F.broadcast(qarr))
        .select(
            "ip",
            "io",
            F.element_at("qa", F.col("ip")).alias("p_peak"),
            F.element_at("qa", F.col("io")).alias("p_off"),
        )
    )
    dem = (
        grid.crossJoin(ev)
        .groupBy("ip", "io", "p_peak", "p_off")
        .agg(
            F.sum(
                F.when(
                    (F.col("period") == "peak") & (F.col("wtp") >= F.col("p_peak")),
                    1,
                ).otherwise(0)
            ).alias("d_peak"),
            F.sum(
                F.when(
                    (F.col("period") == "off") & (F.col("wtp") >= F.col("p_off")),
                    1,
                ).otherwise(0)
            ).alias("d_off"),
        )
        .localCheckpoint(eager=False)
    )
    cap = dem.agg((0.6 * F.max("d_peak")).cast("bigint").alias("k"))
    rev = dem.crossJoin(F.broadcast(cap)).select(
        "ip",
        "io",
        "p_peak",
        "p_off",
        F.least("d_peak", "k").alias("q_peak"),
        F.col("d_off").alias("q_off"),
        (
            F.col("p_peak") * F.least("d_peak", "k")
            + F.col("p_off") * F.col("d_off")
        ).alias("r"),
    )
    best = rev.agg(F.max("r").alias("br"))
    r2 = lambda cexpr: F.round(cexpr + F.lit(5e-8), 2)  # noqa: E731
    return (
        rev.crossJoin(F.broadcast(best))
        .select(
            r2(F.col("p_peak")).alias("peak_price"),
            r2(F.col("p_off")).alias("off_price"),
            F.col("q_peak").cast("bigint").alias("peak_sold"),
            F.col("q_off").cast("bigint").alias("off_sold"),
            r2(F.col("r") / 100.0).alias("revenue_usd"),
            (F.col("r") == F.col("br")).alias("is_optimal"),
            F.col("r").alias("ord"),
            "ip",
            "io",
        )
        .orderBy(F.desc("ord"), "ip", "io")
        .limit(5)
        .drop("ord", "ip", "io")
    )


# ---------------------------------------------------------------------------
# Q565 — Kelly criterion with the overbetting penalty
# ---------------------------------------------------------------------------
# Daily revenue up/down moves as the binary bet (win prob p, win/loss
# payoff ratio b from mean magnitudes): Kelly fraction f* = p - q/b,
# then the REALIZED log-growth of betting f*/2, f* and 2f* on the
# actual return sequence — the asymmetric penalty (half-Kelly nearly
# optimal, double-Kelly ruinous) measured, beside portfolio sizing
# (q403) and drawdown (q219).
_Q565_ORACLE = """
    WITH daily AS (
      SELECT CAST(EXTRACT(day FROM ts) AS BIGINT) AS d,
             CAST(SUM(ROUND(value * 100)) AS DOUBLE) AS v
      FROM events WHERE event_type = 'purchase' AND EXTRACT(day FROM ts) <= 28
      GROUP BY 1
    ), rets AS (
      SELECT v / LAG(v) OVER (ORDER BY d) - 1 AS r
      FROM daily
    ), rr AS (SELECT r FROM rets WHERE r IS NOT NULL
    ), par AS (
      SELECT AVG(CASE WHEN r > 0 THEN 1.0 ELSE 0 END) AS p,
             AVG(CASE WHEN r > 0 THEN r END)
               / ABS(AVG(CASE WHEN r <= 0 THEN r END)) AS b
      FROM rr
    ), kelly AS (
      SELECT p, b, p - (1 - p) / b AS f FROM par
    ), growth AS (
      SELECT k.f,
             (SELECT SUM(LN(1 + GREATEST(k.f * 0.5, 0) * r.r)) FROM rr r)
               AS g_half,
             (SELECT SUM(LN(1 + GREATEST(k.f, 0) * r.r)) FROM rr r)
               AS g_full,
             (SELECT SUM(LN(GREATEST(1 + GREATEST(k.f, 0) * 2 * r.r,
                                     0.01))) FROM rr r) AS g_double
      FROM kelly k
    )
    SELECT ROUND((SELECT p FROM par) + 5e-12, 6) AS win_prob,
           ROUND((SELECT b FROM par) + 5e-12, 6) AS payoff_ratio,
           ROUND(g.f + 5e-12, 6) AS kelly_fraction,
           ROUND(g.g_half + 5e-12, 6) AS log_growth_half_kelly,
           ROUND(g.g_full + 5e-12, 6) AS log_growth_full_kelly,
           ROUND(g.g_double + 5e-12, 6) AS log_growth_double_kelly
    FROM growth g
"""


@register(
    "q565_kelly_criterion",
    _Q565_ORACLE,
    doc="Kelly criterion on daily revenue moves: f* = p - q/b from "
    "measured win probability and payoff ratio, realized log-growth "
    "at half/full/double Kelly on the actual return path (floored "
    "to avoid log of ruin) — the overbetting asymmetry measured "
    "(position sizing beside min-variance q403 and drawdown q219).",
)
def q565(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.dayofmonth("ts") <= 28)
    )
    daily = ev.groupBy(F.dayofmonth("ts").cast("bigint").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100)).cast("double").alias("v")
    )
    w = Window.orderBy("d")
    rr = daily.select(
        (F.col("v") / F.lag("v").over(w) - 1).alias("r")
    ).filter(F.col("r").isNotNull()).localCheckpoint(eager=False)
    par = rr.agg(
        F.avg(F.when(F.col("r") > 0, 1.0).otherwise(0.0)).alias("p"),
        (
            F.avg(F.when(F.col("r") > 0, F.col("r")))
            / F.abs(F.avg(F.when(F.col("r") <= 0, F.col("r"))))
        ).alias("b"),
    )
    kelly = par.select(
        "p", "b", (F.col("p") - (1 - F.col("p")) / F.col("b")).alias("f")
    )
    g = rr.crossJoin(F.broadcast(kelly)).agg(
        F.first("p").alias("p"),
        F.first("b").alias("b"),
        F.first("f").alias("f"),
        F.sum(
            F.log(1 + F.greatest(F.col("f") * 0.5, F.lit(0.0)) * F.col("r"))
        ).alias("g_half"),
        F.sum(
            F.log(1 + F.greatest(F.col("f"), F.lit(0.0)) * F.col("r"))
        ).alias("g_full"),
        F.sum(
            F.log(
                F.greatest(
                    1 + F.greatest(F.col("f"), F.lit(0.0)) * 2 * F.col("r"),
                    F.lit(0.01),
                )
            )
        ).alias("g_double"),
    )
    return g.select(
        r6(F.col("p")).alias("win_prob"),
        r6(F.col("b")).alias("payoff_ratio"),
        r6(F.col("f")).alias("kelly_fraction"),
        r6(F.col("g_half")).alias("log_growth_half_kelly"),
        r6(F.col("g_full")).alias("log_growth_full_kelly"),
        r6(F.col("g_double")).alias("log_growth_double_kelly"),
    )


# ---------------------------------------------------------------------------
# Q566 — sparse matrix format sizing (COO / CSR / bitmap)
# ---------------------------------------------------------------------------
# The customer x brand interaction matrix priced under three storage
# layouts: COO (8+4 bytes per nnz), CSR (4 bytes per nnz + 8 per
# row), and a dense bitmap (rows x cols / 8 bytes) — density decides
# the winner, the storage-planning choice under every feature matrix
# (varint postings q443 / Gorilla q467's linear-algebra sibling).
_Q566_ORACLE = """
    WITH m AS MATERIALIZED (
      SELECT o.o_custkey AS r, p.p_brand AS c
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY o.o_custkey, p.p_brand
    ), dims AS (
      SELECT COUNT(*) AS nnz,
             COUNT(DISTINCT r) AS n_rows,
             COUNT(DISTINCT c) AS n_cols
      FROM m
    )
    SELECT CAST(nnz AS BIGINT) AS nnz,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_cols AS BIGINT) AS n_cols,
           ROUND(nnz * 1.0 / (n_rows * n_cols) + 5e-12, 6) AS density,
           CAST(nnz * 12 AS BIGINT) AS coo_bytes,
           CAST(nnz * 4 + n_rows * 8 AS BIGINT) AS csr_bytes,
           CAST(CEIL(n_rows * n_cols / 8.0) AS BIGINT) AS bitmap_bytes,
           CASE WHEN CEIL(n_rows * n_cols / 8.0) < nnz * 4 + n_rows * 8
                THEN 'bitmap' ELSE 'csr' END AS best_format
    FROM dims
"""


@register(
    "q566_sparse_formats",
    _Q566_ORACLE,
    doc="Sparse-format sizing for the customer x brand interaction "
    "matrix: COO vs CSR vs dense bitmap byte costs from nnz and "
    "dimensions, density-driven winner — the storage decision under "
    "feature matrices (q443/q467's linear-algebra sibling).",
)
def q566(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    m = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(F.col("o_custkey").alias("r"), F.col("p_brand").alias("c"))
        .distinct()
    )
    dims = m.agg(
        F.count(F.lit(1)).alias("nnz"),
        F.count_distinct("r").alias("n_rows"),
        F.count_distinct("c").alias("n_cols"),
    )
    return dims.select(
        F.col("nnz").cast("bigint").alias("nnz"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_cols").cast("bigint").alias("n_cols"),
        r6(F.col("nnz") * 1.0 / (F.col("n_rows") * F.col("n_cols"))).alias(
            "density"
        ),
        (F.col("nnz") * 12).cast("bigint").alias("coo_bytes"),
        (F.col("nnz") * 4 + F.col("n_rows") * 8).cast("bigint").alias(
            "csr_bytes"
        ),
        F.ceil(F.col("n_rows") * F.col("n_cols") / 8.0)
        .cast("bigint")
        .alias("bitmap_bytes"),
        F.when(
            F.ceil(F.col("n_rows") * F.col("n_cols") / 8.0)
            < F.col("nnz") * 4 + F.col("n_rows") * 8,
            "bitmap",
        )
        .otherwise("csr")
        .alias("best_format"),
    )


# ---------------------------------------------------------------------------
# Q567 — exact Shapley channel attribution from measured coalitions
# ---------------------------------------------------------------------------
# Channels = view / click / signup touches before purchase; the
# coalition value v(S) = revenue of purchasers touched by at least
# one channel in S is MEASURED for all 8 subsets, then the exact
# 3-player Shapley value splits credit — the game-theoretic
# attribution beside last-touch (q120) and Markov removal (q242),
# with efficiency (shares sum to v(grand)) as the certificate.
_Q567_ORACLE = """
    WITH touch AS MATERIALIZED (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS tv,
             MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS tc,
             MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS tsg,
             SUM(CASE WHEN event_type = 'purchase'
                      THEN ROUND(value * 100) ELSE 0 END) AS rev
      FROM events GROUP BY user_id
    ), buyers AS MATERIALIZED (
      SELECT * FROM touch WHERE rev > 0
    ), v AS (
      SELECT
        SUM(CASE WHEN tv = 1 THEN rev ELSE 0 END) AS v_v,
        SUM(CASE WHEN tc = 1 THEN rev ELSE 0 END) AS v_c,
        SUM(CASE WHEN tsg = 1 THEN rev ELSE 0 END) AS v_s,
        SUM(CASE WHEN tv = 1 OR tc = 1 THEN rev ELSE 0 END) AS v_vc,
        SUM(CASE WHEN tv = 1 OR tsg = 1 THEN rev ELSE 0 END) AS v_vs,
        SUM(CASE WHEN tc = 1 OR tsg = 1 THEN rev ELSE 0 END) AS v_cs,
        SUM(CASE WHEN tv = 1 OR tc = 1 OR tsg = 1 THEN rev ELSE 0 END)
          AS v_vcs
      FROM buyers
    ), shap AS (
      SELECT
        (2 * v_v + (v_vc - v_c) + (v_vs - v_s) + 2 * (v_vcs - v_cs)) / 6.0
          AS s_view,
        (2 * v_c + (v_vc - v_v) + (v_cs - v_s) + 2 * (v_vcs - v_vs)) / 6.0
          AS s_click,
        (2 * v_s + (v_vs - v_v) + (v_cs - v_c) + 2 * (v_vcs - v_vc)) / 6.0
          AS s_signup,
        v_vcs
      FROM v
    )
    SELECT channel,
           ROUND(share / 100.0 + 5e-8, 2) AS shapley_usd,
           ROUND(share / total + 5e-12, 6) AS credit_share,
           ROUND((s_view + s_click + s_signup - total) / 100.0 + 5e-8, 2)
             AS efficiency_gap_usd
    FROM (
      SELECT 'view' AS channel, s_view AS share, v_vcs AS total,
             s_view, s_click, s_signup FROM shap
      UNION ALL
      SELECT 'click', s_click, v_vcs, s_view, s_click, s_signup FROM shap
      UNION ALL
      SELECT 'signup', s_signup, v_vcs, s_view, s_click, s_signup FROM shap
    ) ORDER BY channel
"""


@register(
    "q567_shapley_attribution",
    _Q567_ORACLE,
    doc="Exact 3-channel Shapley attribution with MEASURED coalition "
    "values (revenue reached by any channel in S, all 8 subsets): "
    "closed-form Shapley shares with the efficiency identity "
    "(shares sum to the grand coalition) as certificate — the "
    "game-theoretic member of the attribution family "
    "(last-touch q120, Markov q242).",
)
def q567(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    touch = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("tv"),
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("tc"),
        F.max(F.when(F.col("event_type") == "signup", 1).otherwise(0)).alias(
            "tsg"
        ),
        F.sum(
            F.when(
                F.col("event_type") == "purchase", F.round(F.col("value") * 100)
            ).otherwise(0)
        ).alias("rev"),
    )
    buyers = touch.filter(F.col("rev") > 0)
    v = buyers.agg(
        F.sum(F.when(F.col("tv") == 1, F.col("rev")).otherwise(0)).alias("v_v"),
        F.sum(F.when(F.col("tc") == 1, F.col("rev")).otherwise(0)).alias("v_c"),
        F.sum(F.when(F.col("tsg") == 1, F.col("rev")).otherwise(0)).alias("v_s"),
        F.sum(
            F.when((F.col("tv") == 1) | (F.col("tc") == 1), F.col("rev")).otherwise(
                0
            )
        ).alias("v_vc"),
        F.sum(
            F.when(
                (F.col("tv") == 1) | (F.col("tsg") == 1), F.col("rev")
            ).otherwise(0)
        ).alias("v_vs"),
        F.sum(
            F.when(
                (F.col("tc") == 1) | (F.col("tsg") == 1), F.col("rev")
            ).otherwise(0)
        ).alias("v_cs"),
        F.sum(
            F.when(
                (F.col("tv") == 1) | (F.col("tc") == 1) | (F.col("tsg") == 1),
                F.col("rev"),
            ).otherwise(0)
        ).alias("v_vcs"),
    )
    s_view = (
        2 * F.col("v_v")
        + (F.col("v_vc") - F.col("v_c"))
        + (F.col("v_vs") - F.col("v_s"))
        + 2 * (F.col("v_vcs") - F.col("v_cs"))
    ) / 6.0
    s_click = (
        2 * F.col("v_c")
        + (F.col("v_vc") - F.col("v_v"))
        + (F.col("v_cs") - F.col("v_s"))
        + 2 * (F.col("v_vcs") - F.col("v_vs"))
    ) / 6.0
    s_signup = (
        2 * F.col("v_s")
        + (F.col("v_vs") - F.col("v_v"))
        + (F.col("v_cs") - F.col("v_c"))
        + 2 * (F.col("v_vcs") - F.col("v_vc"))
    ) / 6.0
    shap = v.select(
        s_view.alias("s_view"),
        s_click.alias("s_click"),
        s_signup.alias("s_signup"),
        F.col("v_vcs").alias("total"),
    )
    rows = (
        shap.select(
            F.lit("view").alias("channel"),
            F.col("s_view").alias("share"),
            "total",
            "s_view",
            "s_click",
            "s_signup",
        )
        .unionAll(
            shap.select(
                F.lit("click"), F.col("s_click"), "total", "s_view", "s_click",
                "s_signup",
            )
        )
        .unionAll(
            shap.select(
                F.lit("signup"), F.col("s_signup"), "total", "s_view",
                "s_click", "s_signup",
            )
        )
    )
    r2 = lambda cexpr: F.round(cexpr + F.lit(5e-8), 2)  # noqa: E731
    return rows.select(
        "channel",
        r2(F.col("share") / 100.0).alias("shapley_usd"),
        r6(F.col("share") / F.col("total")).alias("credit_share"),
        r2(
            (F.col("s_view") + F.col("s_click") + F.col("s_signup") - F.col("total"))
            / 100.0
        ).alias("efficiency_gap_usd"),
    ).orderBy("channel")


# ---------------------------------------------------------------------------
# Q568 — the hot hand, measured against a deterministic null
# ---------------------------------------------------------------------------
# P(purchase | two consecutive purchases) vs the unconditional rate
# per user stream — and the SAME statistic recomputed with events
# re-ordered by a hash permutation as the exchangeable null (the
# Miller-Sanjurjo point: conditional rates on finite sequences are
# biased even under the null, so the null must be measured, not
# assumed).
_Q568_ORACLE = """
    WITH seq AS MATERIALIZED (
      SELECT user_id,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS x,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS pos,
             ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY (event_id * 2654435761) % 4294967296, event_id)
               AS hpos
      FROM events
    ), real_t AS (
      SELECT AVG(CASE WHEN l1 = 1 AND l2 = 1 THEN x * 1.0 END) AS p_hh,
             AVG(x * 1.0) AS p_all
      FROM (
        SELECT x,
               LAG(x, 1) OVER (PARTITION BY user_id ORDER BY pos) AS l1,
               LAG(x, 2) OVER (PARTITION BY user_id ORDER BY pos) AS l2
        FROM seq)
    ), null_t AS (
      SELECT AVG(CASE WHEN l1 = 1 AND l2 = 1 THEN x * 1.0 END) AS p_hh
      FROM (
        SELECT x,
               LAG(x, 1) OVER (PARTITION BY user_id ORDER BY hpos) AS l1,
               LAG(x, 2) OVER (PARTITION BY user_id ORDER BY hpos) AS l2
        FROM seq)
    )
    SELECT ROUND(r.p_all + 5e-12, 6) AS p_unconditional,
           ROUND(r.p_hh + 5e-12, 6) AS p_after_two_hits,
           ROUND(n.p_hh + 5e-12, 6) AS p_after_two_hits_null,
           ROUND(r.p_hh - n.p_hh + 5e-12, 6) AS hot_hand_effect,
           ROUND(n.p_hh - r.p_all + 5e-12, 6) AS finite_sample_bias
    FROM real_t r, null_t n
"""


@register(
    "q568_hot_hand",
    _Q568_ORACLE,
    doc="Hot-hand measurement with a measured null: P(purchase | two "
    "consecutive purchases) in real time-order vs the same statistic "
    "under a hash-permutation re-ordering (the Miller-Sanjurjo "
    "finite-sample bias made visible as its own column) — streak "
    "inference done right (streaks q116 / runs test q262's "
    "inferential capstone).",
)
def q568(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    seq = ev.select(
        "user_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("x"),
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("pos"),
        F.row_number()
        .over(
            Window.partitionBy("user_id").orderBy(
                (F.col("event_id") * 2654435761) % 4294967296, "event_id"
            )
        )
        .alias("hpos"),
    ).localCheckpoint(eager=False)

    def cond(order_col):
        w = Window.partitionBy("user_id").orderBy(order_col)
        lagged = seq.select(
            "x",
            F.lag("x", 1).over(w).alias("l1"),
            F.lag("x", 2).over(w).alias("l2"),
        )
        return lagged.agg(
            F.avg(
                F.when(
                    (F.col("l1") == 1) & (F.col("l2") == 1), F.col("x") * 1.0
                )
            ).alias("p_hh"),
            F.avg(F.col("x") * 1.0).alias("p_all"),
        )

    real_t = cond("pos")
    null_t = cond("hpos").select(F.col("p_hh").alias("p_hh_null"))
    return real_t.crossJoin(F.broadcast(null_t)).select(
        r6(F.col("p_all")).alias("p_unconditional"),
        r6(F.col("p_hh")).alias("p_after_two_hits"),
        r6(F.col("p_hh_null")).alias("p_after_two_hits_null"),
        r6(F.col("p_hh") - F.col("p_hh_null")).alias("hot_hand_effect"),
        r6(F.col("p_hh_null") - F.col("p_all")).alias("finite_sample_bias"),
    )
