"""Conformance queries batch #45 (q419+) — Little's-law truncation
audit, Theil inequality decomposition, Weibull median-rank fit,
isotonic (PAVA) calibration, and clustered-sampling design effect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q419 — Little's-law audit with window truncation
# ---------------------------------------------------------------------------
# Each user's [first event, last event] span is a job in the system.
# Over a fixed 20-day observation window, the time-average
# concurrency L (endpoint sweep over clipped intervals) is compared
# to lambda*W from arrivals-in-window and their FULL sojourns —
# the gap is exactly the censoring bias Little's law hides when
# sojourns straddle the window.  Sweep = one groupBy on distinct
# endpoints + a prefix sum; everything else is scalar aggregates.
_Q419_ORACLE = """
    WITH iv AS (
      SELECT user_id, epoch_us(MIN(ts)) AS a, epoch_us(MAX(ts)) AS d
      FROM events GROUP BY user_id HAVING COUNT(*) >= 2
    ), win AS (
      SELECT epoch_us(date_trunc('day', MIN(ts)) + INTERVAL 4 DAY) AS w0,
             epoch_us(date_trunc('day', MIN(ts)) + INTERVAL 24 DAY) AS w1
      FROM events
    ), arr AS (
      SELECT COUNT(*) AS n, SUM(d - a) AS sumdur
      FROM iv, win WHERE a >= w0 AND a < w1
    ), clip AS (
      SELECT GREATEST(a, w0) AS a2, LEAST(d, w1) AS d2
      FROM iv, win WHERE GREATEST(a, w0) < LEAST(d, w1)
    ), pts AS (
      SELECT a2 AS t, 1 AS delta FROM clip
      UNION ALL SELECT d2, -1 FROM clip
    ), stp AS (
      SELECT t, SUM(delta) AS dsum FROM pts GROUP BY t
    ), sw AS (
      SELECT SUM(dsum) OVER (ORDER BY t) AS conc,
             LEAD(t) OVER (ORDER BY t) - t AS dt
      FROM stp
    ), l AS (
      SELECT SUM(conc * dt) AS area FROM sw WHERE dt IS NOT NULL
    )
    SELECT CAST(arr.n AS BIGINT) AS n_jobs,
           ROUND(arr.n / ((w1 - w0) / 3.6e9) + 5e-12, 6) AS lambda_per_hr,
           ROUND(arr.sumdur / arr.n / 3.6e9 + 5e-12, 6) AS w_hr,
           ROUND(l.area * 1.0 / (w1 - w0) + 5e-12, 6) AS l_timeavg,
           ROUND(arr.sumdur * 1.0 / (w1 - w0) + 5e-12, 6) AS l_littles,
           ROUND((l.area * 1.0 - arr.sumdur) / (w1 - w0) + 5e-12, 6)
             AS truncation_bias
    FROM arr, win, l
"""


@register(
    "q419_little_law",
    _Q419_ORACLE,
    doc="Little's law L = lambda*W audited against an endpoint-sweep "
    "time-average over a fixed 20-day window: clipped-interval "
    "concurrency integral vs arrivals x full sojourns — the "
    "censoring-bias contract for queue metrics (concurrency q135, "
    "sojourn q159 are the unaudited halves).",
)
def q419(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    iv = (
        ev.groupBy("user_id")
        .agg(
            F.unix_micros(F.min("ts").cast("timestamp")).alias("a"),
            F.unix_micros(F.max("ts").cast("timestamp")).alias("d"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .filter(F.col("cnt") >= 2)
        .drop("cnt")
    )
    day0 = F.date_trunc("day", F.min("ts"))
    win = ev.agg(
        F.unix_micros((day0 + F.expr("INTERVAL 4 DAY")).cast("timestamp")).alias("w0"),
        F.unix_micros((day0 + F.expr("INTERVAL 24 DAY")).cast("timestamp")).alias("w1"),
    )
    ivw = iv.crossJoin(F.broadcast(win))
    arr = ivw.filter((F.col("a") >= F.col("w0")) & (F.col("a") < F.col("w1"))).agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("d") - F.col("a")).alias("sumdur")
    )
    clip = ivw.select(
        F.greatest("a", "w0").alias("a2"), F.least("d", "w1").alias("d2")
    ).filter(F.col("a2") < F.col("d2"))
    pts = clip.select(F.col("a2").alias("t"), F.lit(1).alias("delta")).unionAll(
        clip.select(F.col("d2").alias("t"), F.lit(-1).alias("delta"))
    )
    stp = pts.groupBy("t").agg(F.sum("delta").alias("dsum"))
    w = Window.orderBy("t")
    sw = stp.select(
        F.sum("dsum").over(w).alias("conc"),
        (F.lead("t").over(w) - F.col("t")).alias("dt"),
    )
    area = sw.filter(F.col("dt").isNotNull()).agg(
        F.sum(F.col("conc") * F.col("dt")).alias("area")
    )
    t_us = F.col("w1") - F.col("w0")
    return (
        arr.crossJoin(F.broadcast(win))
        .crossJoin(F.broadcast(area))
        .select(
            F.col("n").cast("bigint").alias("n_jobs"),
            r6(F.col("n") / (t_us / F.lit(3.6e9))).alias("lambda_per_hr"),
            r6(F.col("sumdur") / F.col("n") / F.lit(3.6e9)).alias("w_hr"),
            r6(F.col("area") * 1.0 / t_us).alias("l_timeavg"),
            r6(F.col("sumdur") * 1.0 / t_us).alias("l_littles"),
            r6((F.col("area") * 1.0 - F.col("sumdur")) / t_us).alias(
                "truncation_bias"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Q420 — Theil-T inequality decomposition (between / within nations)
# ---------------------------------------------------------------------------
# Customer lifetime spend in cents as the income variable; the Theil
# T index decomposes EXACTLY into between-group + within-group terms
# (p_g * r_g * ln r_g  +  p_g * r_g * T_g), and the query reports
# both plus the reconstruction gap as the algebraic contract.  Two
# aggregation levels (customer -> nation -> scalar), no windows.
_Q420_ORACLE = """
    WITH inc AS (
      SELECT c.c_nationkey AS g,
             CAST(SUM(ROUND(o.o_totalprice * 100)) AS BIGINT) AS x
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY o.o_custkey, c.c_nationkey
    ), grp AS (
      SELECT g, COUNT(*) AS n_g, SUM(x) AS s_g,
             SUM(x * ln(CAST(x AS DOUBLE))) AS t_g
      FROM inc GROUP BY g
    ), tot AS (
      SELECT SUM(n_g) AS n, SUM(s_g) AS s, SUM(t_g) AS t,
             COUNT(*) AS n_grp
      FROM grp
    ), gterm AS (
      SELECT
        SUM((n_g * 1.0 / n) * ((s_g * 1.0 / n_g) / (s * 1.0 / n))
            * ln((s_g * 1.0 / n_g) / (s * 1.0 / n))) AS between_t,
        SUM((n_g * 1.0 / n) * ((s_g * 1.0 / n_g) / (s * 1.0 / n))
            * (t_g / (n_g * (s_g * 1.0 / n_g)) - ln(s_g * 1.0 / n_g)))
          AS within_t
      FROM grp, tot
    )
    SELECT CAST(tot.n AS BIGINT) AS n_customers,
           CAST(tot.n_grp AS BIGINT) AS n_groups,
           ROUND(tot.t / (tot.n * (tot.s * 1.0 / tot.n))
                 - ln(tot.s * 1.0 / tot.n) + 5e-12, 6) AS theil_total,
           ROUND(gterm.between_t + 5e-12, 6) AS theil_between,
           ROUND(gterm.within_t + 5e-12, 6) AS theil_within,
           ROUND(tot.t / (tot.n * (tot.s * 1.0 / tot.n))
                 - ln(tot.s * 1.0 / tot.n)
                 - gterm.between_t - gterm.within_t + 5e-12, 6) AS decomp_gap
    FROM tot, gterm
"""


@register(
    "q420_theil_decomposition",
    _Q420_ORACLE,
    doc="Theil-T inequality index over customer spend decomposed into "
    "between-nation and within-nation components with the exact "
    "reconstruction gap — the additive-decomposability property "
    "Gini (q148) lacks, as two aggregation levels.",
)
def q420(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    inc = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_custkey", "c_nationkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100)).cast("bigint").alias("x"))
        .select(F.col("c_nationkey").alias("g"), "x")
    )
    grp = inc.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("x").alias("s_g"),
        F.sum(F.col("x") * F.log(F.col("x").cast("double"))).alias("t_g"),
    )
    tot = grp.agg(
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("t_g").alias("t"),
        F.count(F.lit(1)).alias("n_grp"),
    )
    gt = grp.crossJoin(F.broadcast(tot))
    mu = F.col("s") * 1.0 / F.col("n")
    mu_g = F.col("s_g") * 1.0 / F.col("n_g")
    p_r = (F.col("n_g") * 1.0 / F.col("n")) * (mu_g / mu)
    gterm = gt.agg(
        F.sum(p_r * F.log(mu_g / mu)).alias("between_t"),
        F.sum(p_r * (F.col("t_g") / (F.col("n_g") * mu_g) - F.log(mu_g))).alias(
            "within_t"
        ),
    )
    total_t = F.col("t") / (F.col("n") * mu) - F.log(mu)
    return tot.crossJoin(F.broadcast(gterm)).select(
        F.col("n").cast("bigint").alias("n_customers"),
        F.col("n_grp").cast("bigint").alias("n_groups"),
        r6(total_t).alias("theil_total"),
        r6(F.col("between_t")).alias("theil_between"),
        r6(F.col("within_t")).alias("theil_within"),
        r6(total_t - F.col("between_t") - F.col("within_t")).alias("decomp_gap"),
    )


# ---------------------------------------------------------------------------
# Q421 — Weibull fit by median-rank regression
# ---------------------------------------------------------------------------
# Inter-purchase gaps (sampled users) fitted to a Weibull via the
# classic reliability-engineering recipe: Bernard's median ranks
# F_i = (i-0.3)/(n+0.4) on the sorted gaps, then OLS of
# ln(-ln(1-F)) on ln(t) gives shape k as the slope and
# scale = exp(-intercept/k).  Rank assignment is tie-safe: equal
# gaps contribute identical x, so the moment sums are permutation-
# invariant within ties.
_Q421_ORACLE = """
    WITH g AS (
      SELECT user_id, epoch_us(ts) AS t_us,
             epoch_us(ts) - LAG(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events WHERE event_type = 'purchase' AND user_id % 17 = 3
    ), gg AS (
      SELECT gap_us,
             ROW_NUMBER() OVER (ORDER BY gap_us, user_id, t_us) AS i
      FROM g WHERE gap_us IS NOT NULL AND gap_us > 0
    ), xy AS (
      SELECT ln(gap_us / 3.6e9) AS x,
             ln(-ln(1.0 - (i - 0.3) / ((SELECT COUNT(*) FROM gg) + 0.4))) AS y
      FROM gg
    ), mom AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy, SUM(x*x) AS sxx,
             SUM(y*y) AS syy, SUM(x*y) AS sxy
      FROM xy
    )
    SELECT CAST(n AS BIGINT) AS n_gaps,
           ROUND((n*sxy - sx*sy) / (n*sxx - sx*sx) + 5e-12, 6) AS shape_k,
           ROUND(exp(-((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n)
                     / ((n*sxy - sx*sy) / (n*sxx - sx*sx))) + 5e-12, 6)
             AS scale_hr,
           ROUND((n*sxy - sx*sy) * (n*sxy - sx*sy)
                 / ((n*sxx - sx*sx) * (n*syy - sy*sy)) + 5e-12, 6) AS r2
    FROM mom
"""


@register(
    "q421_weibull_mrr",
    _Q421_ORACLE,
    doc="Weibull shape/scale by median-rank regression: Bernard "
    "ranks on sorted inter-purchase gaps, OLS on the "
    "ln(-ln(1-F)) vs ln(t) plot — the reliability-curve fit "
    "beside the exponential interarrival test (q255).",
)
def q421(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") % 17 == 3)
    )
    uw = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    g = ev.select(
        "user_id",
        t_us.alias("t_us"),
        (t_us - F.lag(t_us).over(uw)).alias("gap_us"),
    ).filter(F.col("gap_us") > 0)
    from model_presto_spark.operators.layout import ordered_positions

    # global gap ranks via layout.ordered_positions (log-bucketed —
    # monotone in the gap_us leading key) instead of a single-task
    # global row_number over every event gap in the corpus
    gg = ordered_positions(
        g.select("gap_us", "user_id", "t_us"),
        ["gap_us", "user_id", "t_us"],
        F.floor(F.log10("gap_us") * 8),
        pos_col="i",
    ).select("gap_us", "i")
    n_tot = gg.agg(F.count(F.lit(1)).alias("n_all"))
    xy = gg.crossJoin(F.broadcast(n_tot)).select(
        F.log(F.col("gap_us") / F.lit(3.6e9)).alias("x"),
        F.log(
            -F.log(1.0 - (F.col("i") - 0.3) / (F.col("n_all") + 0.4))
        ).alias("y"),
    )
    mom = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    k = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    b = (F.col("sy") - k * F.col("sx")) / F.col("n")
    r2 = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        * (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        )
    )
    return mom.select(
        F.col("n").cast("bigint").alias("n_gaps"),
        r6(k).alias("shape_k"),
        r6(F.exp(-b / k)).alias("scale_hr"),
        r6(r2).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Q422 — isotonic (PAVA) calibration via the minimax identity
# ---------------------------------------------------------------------------
# Return-flag rate by extended-price bin, pooled to a monotone
# non-decreasing fit.  Instead of the sequential pool-adjacent-
# violators scan, the closed-form minimax identity
#   iso(i) = max_{j<=i} min_{l>=i} weightedAvg(j..l)
# turns PAVA into three relational steps on the (tiny) bin relation:
# prefix sums, an interval-average pair relation, and a grouped
# min-then-max.  Fully distributed-safe because the bin relation is
# bounded (20 rows) regardless of input size.
_Q422_ORACLE = """
    WITH mm AS (
      SELECT MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx
      FROM lineitem
    ), binned AS (
      SELECT LEAST(CAST(FLOOR((l_extendedprice - mn) * 20.0 / (mx - mn))
                        AS INT), 19) AS bin,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS lab
      FROM lineitem, mm
    ), b AS (
      SELECT bin, COUNT(*) AS w, SUM(lab) AS sy FROM binned GROUP BY bin
    ), cb AS (
      SELECT bin, w, sy,
             SUM(w) OVER (ORDER BY bin) AS cw,
             SUM(sy) OVER (ORDER BY bin) AS cy
      FROM b
    ), pair AS (
      SELECT j.bin AS jb, l.bin AS lb,
             (l.cy - j.cy + j.sy) * 1.0 / (l.cw - j.cw + j.w) AS avg_jl
      FROM cb j JOIN cb l ON j.bin <= l.bin
    ), inner_min AS (
      SELECT i.bin AS ib, p.jb, MIN(p.avg_jl) AS m
      FROM cb i JOIN pair p ON p.jb <= i.bin AND p.lb >= i.bin
      GROUP BY i.bin, p.jb
    ), fit AS (
      SELECT ib AS bin, MAX(m) AS iso FROM inner_min GROUP BY ib
    )
    SELECT b.bin, CAST(b.w AS BIGINT) AS n_b,
           ROUND(b.sy * 1.0 / b.w + 5e-12, 6) AS raw_rate,
           ROUND(fit.iso + 5e-12, 6) AS iso_rate
    FROM b JOIN fit ON fit.bin = b.bin
    ORDER BY b.bin
"""


@register(
    "q422_isotonic_calibration",
    _Q422_ORACLE,
    doc="Isotonic calibration by the PAVA minimax identity "
    "iso(i) = max_{j<=i} min_{l>=i} avg(j..l) on a bounded bin "
    "relation: prefix sums + interval-average pairs + grouped "
    "min/max replace the sequential scan — monotone recalibration "
    "beside the raw reliability curve (q92).",
)
def q422(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    mm = li.agg(
        F.min("l_extendedprice").alias("mn"), F.max("l_extendedprice").alias("mx")
    )
    binned = li.crossJoin(F.broadcast(mm)).select(
        F.least(
            F.floor(
                (F.col("l_extendedprice") - F.col("mn"))
                * 20.0
                / (F.col("mx") - F.col("mn"))
            ).cast("int"),
            F.lit(19),
        ).alias("bin"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("lab"),
    )
    b = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("w"), F.sum("lab").alias("sy")
        # lineage cut: b feeds the cumulative relation and the final
        # join (plan audit: 16 scans un-materialized)
    ).localCheckpoint(eager=False)
    cw_win = Window.orderBy("bin")
    cb = b.select(
        "bin",
        "w",
        "sy",
        F.sum("w").over(cw_win).alias("cw"),
        F.sum("sy").over(cw_win).alias("cy"),
    ).localCheckpoint(eager=False)
    j = cb.select(
        F.col("bin").alias("jb"),
        F.col("w").alias("jw"),
        F.col("sy").alias("jsy"),
        F.col("cw").alias("jcw"),
        F.col("cy").alias("jcy"),
    )
    l = cb.select(
        F.col("bin").alias("lb"), F.col("cw").alias("lcw"), F.col("cy").alias("lcy")
    )
    pair = j.join(l, F.col("jb") <= F.col("lb")).select(
        "jb",
        "lb",
        (
            (F.col("lcy") - F.col("jcy") + F.col("jsy"))
            * 1.0
            / (F.col("lcw") - F.col("jcw") + F.col("jw"))
        ).alias("avg_jl"),
    )
    i = cb.select(F.col("bin").alias("ib"))
    inner_min = (
        i.join(pair, (F.col("jb") <= F.col("ib")) & (F.col("lb") >= F.col("ib")))
        .groupBy("ib", "jb")
        .agg(F.min("avg_jl").alias("m"))
    )
    fit = inner_min.groupBy("ib").agg(F.max("m").alias("iso"))
    return (
        b.join(fit, b.bin == fit.ib)
        .select(
            "bin",
            F.col("w").cast("bigint").alias("n_b"),
            r6(F.col("sy") * 1.0 / F.col("w")).alias("raw_rate"),
            r6(F.col("iso")).alias("iso_rate"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# Q423 — intraclass correlation and survey design effect
# ---------------------------------------------------------------------------
# Customers clustered by nation: the one-way-ANOVA ICC estimator
# (MSB, MSW with the unequal-cluster-size n0 correction) and the
# Kish design effect DEFF = 1 + (m_bar - 1) * ICC — how much a
# cluster sample inflates variance vs SRS.  Pure two-level integer
# moment aggregation (sums and sums of squares stay BIGINT).
_Q423_ORACLE = """
    WITH y AS (
      SELECT c_nationkey AS g, CAST(ROUND(c_acctbal * 100) AS BIGINT) AS v
      FROM customer
    ), grp AS (
      SELECT g, COUNT(*) AS n_g, SUM(v) AS s_g, SUM(v * v) AS ss_g
      FROM y GROUP BY g
    ), tot AS (
      SELECT SUM(n_g) AS n, COUNT(*) AS gk, SUM(s_g) AS s,
             SUM(ss_g - s_g * s_g * 1.0 / n_g) AS ssw,
             SUM(n_g * n_g) AS sn2
      FROM grp
    ), ssb AS (
      SELECT SUM(n_g * (s_g * 1.0 / n_g - (SELECT s * 1.0 / n FROM tot))
                     * (s_g * 1.0 / n_g - (SELECT s * 1.0 / n FROM tot)))
               AS ssb
      FROM grp
    ), m AS (
      SELECT n, gk,
             ssb.ssb / (gk - 1) AS msb,
             ssw / (n - gk) AS msw,
             (n - sn2 * 1.0 / n) / (gk - 1) AS n0
      FROM tot, ssb
    )
    SELECT CAST(n AS BIGINT) AS n_units, CAST(gk AS BIGINT) AS n_clusters,
           ROUND(msb / 10000 + 5e-8, 2) AS msb_usd2,
           ROUND(msw / 10000 + 5e-8, 2) AS msw_usd2,
           ROUND(n0 + 5e-12, 6) AS n0,
           ROUND((msb - msw) / (msb + (n0 - 1) * msw) + 5e-12, 6) AS icc,
           ROUND(1 + (n * 1.0 / gk - 1)
                 * ((msb - msw) / (msb + (n0 - 1) * msw)) + 5e-12, 6) AS deff
    FROM m
"""


@register(
    "q423_design_effect",
    _Q423_ORACLE,
    doc="One-way-ANOVA intraclass correlation (unequal-size n0 "
    "correction) and Kish design effect over nation-clustered "
    "account balances — the cluster-sampling variance-inflation "
    "audit beside Neyman allocation (q205).",
)
def q423(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("g"),
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("v"),
    )
    grp = c.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("v").alias("s_g"),
        F.sum(F.col("v") * F.col("v")).alias("ss_g"),
    )
    tot = grp.agg(
        F.sum("n_g").alias("n"),
        F.count(F.lit(1)).alias("gk"),
        F.sum("s_g").alias("s"),
        F.sum(F.col("ss_g") - F.col("s_g") * F.col("s_g") * 1.0 / F.col("n_g")).alias(
            "ssw"
        ),
        F.sum(F.col("n_g") * F.col("n_g")).alias("sn2"),
    )
    gt = grp.crossJoin(F.broadcast(tot))
    gmean = F.col("s") * 1.0 / F.col("n")
    dev = F.col("s_g") * 1.0 / F.col("n_g") - gmean
    ssb = gt.agg(F.sum(F.col("n_g") * dev * dev).alias("ssb"))
    m = tot.crossJoin(F.broadcast(ssb)).select(
        "n",
        "gk",
        (F.col("ssb") / (F.col("gk") - 1)).alias("msb"),
        (F.col("ssw") / (F.col("n") - F.col("gk"))).alias("msw"),
        ((F.col("n") - F.col("sn2") * 1.0 / F.col("n")) / (F.col("gk") - 1)).alias(
            "n0"
        ),
    )
    icc = (F.col("msb") - F.col("msw")) / (
        F.col("msb") + (F.col("n0") - 1) * F.col("msw")
    )
    return m.select(
        F.col("n").cast("bigint").alias("n_units"),
        F.col("gk").cast("bigint").alias("n_clusters"),
        F.round(F.col("msb") / 10000 + 5e-8, 2).alias("msb_usd2"),
        F.round(F.col("msw") / 10000 + 5e-8, 2).alias("msw_usd2"),
        r6(F.col("n0")).alias("n0"),
        r6(icc).alias("icc"),
        r6(F.lit(1) + (F.col("n") * 1.0 / F.col("gk") - 1) * icc).alias("deff"),
    )
