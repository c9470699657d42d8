"""Conformance queries batch #102 (q706+) — Luhn check digits, Chow
structural breaks, Hotelling's T-squared, max-flow by min-cut
enumeration, and price stickiness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q706 — Luhn check digits on synthetic account numbers
# ---------------------------------------------------------------------------
# Eight-digit account numbers derived from customer keys: the Luhn
# sum doubles every second digit from the right (subtracting 9 past
# 9), the check digit completes to a multiple of ten, and every
# extended number re-validates — the payment-card checksum beside
# CRC (q666) and Hamming (q681).
def _luhn_terms(xcol: str, engine: str) -> str:
    # digits d0 (rightmost) .. d7; doubling applies to odd positions
    # (d1, d3, d5, d7) when a check digit will be appended.
    terms = []
    for k in range(8):
        d = f"(CAST(FLOOR({xcol} / {10 ** k}) AS BIGINT) % 10)"
        if k % 2 == 0:
            dd = f"(2 * {d})"
            terms.append(
                f"(CASE WHEN {dd} > 9 THEN {dd} - 9 ELSE {dd} END)"
            )
        else:
            terms.append(d)
    return " + ".join(terms)


_Q706_ORACLE = f"""
    WITH nums AS MATERIALIZED (
      SELECT (c_custkey * 13 + 7) % 100000000 AS x
      FROM customer
    ), luhn AS MATERIALIZED (
      SELECT x, ({_luhn_terms('x', 'duck')}) AS s
      FROM nums
    ), withcheck AS MATERIALIZED (
      SELECT x, s, (10 - s % 10) % 10 AS cd,
             (s + (10 - s % 10) % 10) % 10 AS residual
      FROM luhn
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_numbers,
           CAST(SUM(CASE WHEN residual = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_valid,
           MIN(CASE WHEN residual = 0 THEN 1 ELSE 0 END) = 1
             AS all_valid,
           ROUND(AVG(cd * 1.0) + 5e-12, 6) AS mean_check_digit,
           CAST((SELECT cd FROM withcheck GROUP BY cd
                 ORDER BY COUNT(*) DESC, cd LIMIT 1) AS BIGINT)
             AS modal_check_digit
    FROM withcheck
"""


@register(
    "q706_luhn_check",
    _Q706_ORACLE,
    doc="Luhn mod-10: 8-digit account numbers from customer keys, "
    "double-every-second-digit sums, appended check digits that "
    "make every number re-validate — the payment-card checksum "
    "beside CRC-8 (q666) and Hamming codes (q681).",
)
def q706(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    nums = c.select(
        ((F.col("c_custkey") * 13 + 7) % 100000000).alias("x")
    )
    luhn = nums.select("x", F.expr(_luhn_terms("x", "spark")).alias("s"))
    withcheck = luhn.select(
        "x",
        "s",
        ((10 - F.col("s") % 10) % 10).alias("cd"),
        ((F.col("s") + (10 - F.col("s") % 10) % 10) % 10).alias("residual"),
    ).localCheckpoint(eager=False)
    modal = (
        withcheck.groupBy("cd")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "cd")
        .limit(1)
        .select(F.col("cd").alias("modal"))
    )
    return withcheck.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_numbers"),
        F.sum(F.when(F.col("residual") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_valid"),
        (F.min(F.when(F.col("residual") == 0, 1).otherwise(0)) == 1).alias(
            "all_valid"
        ),
        r6(F.avg(F.col("cd") * 1.0)).alias("mean_check_digit"),
    ).crossJoin(F.broadcast(modal)).select(
        "n_numbers",
        "n_valid",
        "all_valid",
        "mean_check_digit",
        F.col("modal").cast("bigint").alias("modal_check_digit"),
    )


# ---------------------------------------------------------------------------
# Q707 — Chow test for a structural break at mid-month
# ---------------------------------------------------------------------------
# Daily revenue on a time trend: pooled RSS vs the sum of per-half
# RSS from separate fits, F = ((RSSr - RSSu)/2) / (RSSu/(n-4)) —
# the known-breakpoint test that complements the searched break of
# binary segmentation (q636).
_Q707_ORACLE = """
    WITH daily AS MATERIALIZED (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY d) AS DOUBLE) AS t, x,
             CASE WHEN ROW_NUMBER() OVER (ORDER BY d) <= 15
                  THEN 0 ELSE 1 END AS h
      FROM (SELECT EXTRACT(day FROM ts) AS d,
                   ROUND(SUM(ROUND(value * 100)) / 1000.0) AS x
            FROM events GROUP BY EXTRACT(day FROM ts))
    ), seg AS MATERIALIZED (
      SELECT h, COUNT(*) AS n, AVG(t) AS mt, AVG(x) AS mx,
             SUM(t * x) - COUNT(*) * AVG(t) * AVG(x) AS sxy,
             SUM(t * t) - COUNT(*) * AVG(t) * AVG(t) AS sxx,
             SUM(x * x) - COUNT(*) * AVG(x) * AVG(x) AS syy
      FROM daily GROUP BY h
    ), pool AS (
      SELECT COUNT(*) AS n,
             SUM(x * x) - COUNT(*) * AVG(x) * AVG(x)
               - POW(SUM(t * x) - COUNT(*) * AVG(t) * AVG(x), 2)
                 / (SUM(t * t) - COUNT(*) * AVG(t) * AVG(t)) AS rss_r
      FROM daily
    ), unres AS (
      SELECT SUM(syy - sxy * sxy / sxx) AS rss_u FROM seg
    )
    SELECT CAST(p.n AS BIGINT) AS n_days,
           ROUND(p.rss_r + 5e-10, 4) AS rss_restricted,
           ROUND(u.rss_u + 5e-10, 4) AS rss_unrestricted,
           ROUND(((p.rss_r - u.rss_u) / 2) / (u.rss_u / (p.n - 4))
                 + 5e-12, 6) AS chow_f,
           ((p.rss_r - u.rss_u) / 2) / (u.rss_u / (p.n - 4)) > 3.369
             AS structural_break
    FROM pool p, unres u
"""


@register(
    "q707_chow_test",
    _Q707_ORACLE,
    doc="Chow test at the mid-month breakpoint: pooled trend RSS vs "
    "per-half fits, F = ((RSSr - RSSu)/2)/(RSSu/(n-4)) against the "
    "F(2, n-4) 5% cutoff — the known-break test pairing with the "
    "searched break of binary segmentation (q636) and segmented "
    "trend (q237).",
)
def q707(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    base = e.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.round(F.sum(F.round(F.col("value") * 100)) / 1000.0).alias("x")
    )
    daily = base.select(
        F.row_number().over(Window.orderBy("d")).cast("double").alias("t"),
        "x",
    ).select(
        "t", "x", F.when(F.col("t") <= 15, 0).otherwise(1).alias("h")
    ).localCheckpoint(eager=False)
    n = F.count(F.lit(1))
    seg = daily.groupBy("h").agg(
        (F.sum(F.col("t") * F.col("x")) - n * F.avg("t") * F.avg("x")).alias(
            "sxy"
        ),
        (F.sum(F.col("t") * F.col("t")) - n * F.avg("t") * F.avg("t")).alias(
            "sxx"
        ),
        (F.sum(F.col("x") * F.col("x")) - n * F.avg("x") * F.avg("x")).alias(
            "syy"
        ),
    )
    pool = daily.agg(
        n.alias("n"),
        (
            F.sum(F.col("x") * F.col("x"))
            - n * F.avg("x") * F.avg("x")
            - F.pow(
                F.sum(F.col("t") * F.col("x")) - n * F.avg("t") * F.avg("x"), 2
            )
            / (F.sum(F.col("t") * F.col("t")) - n * F.avg("t") * F.avg("t"))
        ).alias("rss_r"),
    )
    unres = seg.agg(
        F.sum(
            F.col("syy") - F.col("sxy") * F.col("sxy") / F.col("sxx")
        ).alias("rss_u")
    )
    f = ((F.col("rss_r") - F.col("rss_u")) / 2) / (
        F.col("rss_u") / (F.col("n") - 4)
    )
    return pool.crossJoin(F.broadcast(unres)).select(
        F.col("n").cast("bigint").alias("n_days"),
        F.round(F.col("rss_r") + F.lit(5e-10), 4).alias("rss_restricted"),
        F.round(F.col("rss_u") + F.lit(5e-10), 4).alias("rss_unrestricted"),
        r6(f).alias("chow_f"),
        (f > 3.369).alias("structural_break"),
    )


# ---------------------------------------------------------------------------
# Q708 — Hotelling's T-squared two-sample test
# ---------------------------------------------------------------------------
# AUTOMOBILE vs rest jointly on (balance, spend): pooled 2x2
# covariance inverted in closed form, T^2 = (n1 n2 / n) d' S^-1 d
# and its exact F(2, n-3) conversion — the multivariate mean test
# that two marginal t-tests cannot replace, sharing machinery with
# Fisher LDA (q696) and Mahalanobis (q270).
_Q708_ORACLE = """
    WITH u AS MATERIALIZED (
      SELECT CASE WHEN c.c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS t,
             ROUND(c.c_acctbal * 100) / 1e5 AS x1,
             COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0) / 1e6 AS x2
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_mktsegment, c.c_acctbal
    ), mu AS MATERIALIZED (
      SELECT t, AVG(x1) AS m1, AVG(x2) AS m2, COUNT(*) AS n
      FROM u GROUP BY t
    ), sw AS (
      SELECT SUM((u.x1 - m.m1) * (u.x1 - m.m1)) AS s11,
             SUM((u.x1 - m.m1) * (u.x2 - m.m2)) AS s12,
             SUM((u.x2 - m.m2) * (u.x2 - m.m2)) AS s22,
             SUM(1) - 2 AS dof
      FROM u JOIN mu m ON m.t = u.t
    ), parts AS (
      SELECT (SELECT m1 FROM mu WHERE t = 1)
               - (SELECT m1 FROM mu WHERE t = 0) AS d1,
             (SELECT m2 FROM mu WHERE t = 1)
               - (SELECT m2 FROM mu WHERE t = 0) AS d2,
             (SELECT n FROM mu WHERE t = 1) AS n1,
             (SELECT n FROM mu WHERE t = 0) AS n0,
             s11 / dof AS c11, s12 / dof AS c12, s22 / dof AS c22
      FROM sw
    ), t2 AS (
      SELECT n1, n0, d1, d2,
             (n1 * n0 * 1.0 / (n1 + n0))
               * (d1 * (c22 * d1 - c12 * d2)
                  + d2 * (c11 * d2 - c12 * d1))
               / (c11 * c22 - c12 * c12) AS tsq
      FROM parts
    )
    SELECT CAST(n1 AS BIGINT) AS n_treated,
           CAST(n0 AS BIGINT) AS n_control,
           ROUND(d1 + 5e-12, 6) AS mean_gap_balance,
           ROUND(d2 + 5e-12, 6) AS mean_gap_spend,
           ROUND(tsq + 5e-12, 6) AS hotelling_t2,
           ROUND(tsq * (n1 + n0 - 3) / (2.0 * (n1 + n0 - 2))
                 + 5e-12, 6) AS f_statistic,
           tsq * (n1 + n0 - 3) / (2.0 * (n1 + n0 - 2)) > 3.0
             AS reject_equal_means
    FROM t2
"""


@register(
    "q708_hotelling_t2",
    _Q708_ORACLE,
    doc="Hotelling's T-squared: AUTOMOBILE vs rest jointly on "
    "(balance, spend), pooled 2x2 covariance inverted exactly, "
    "T^2 = (n1 n0/n) d' S^-1 d with the F(2, n-3) conversion — the "
    "multivariate mean test above two marginal t-tests, sharing "
    "machinery with Fisher LDA (q696) and Mahalanobis (q270).",
)
def q708(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    u = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment", "c_acctbal")
        .agg(
            (
                F.coalesce(F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0))
                / 1e6
            ).alias("x2")
        )
        .select(
            F.when(F.col("c_mktsegment") == "AUTOMOBILE", 1)
            .otherwise(0)
            .alias("t"),
            (F.round(F.col("c_acctbal") * 100) / 1e5).alias("x1"),
            "x2",
        )
        .localCheckpoint(eager=False)
    )
    mu = u.groupBy("t").agg(
        F.avg("x1").alias("m1"),
        F.avg("x2").alias("m2"),
        F.count(F.lit(1)).alias("n"),
    )
    sw = u.join(F.broadcast(mu), "t").agg(
        F.sum((F.col("x1") - F.col("m1")) * (F.col("x1") - F.col("m1"))).alias(
            "s11"
        ),
        F.sum((F.col("x1") - F.col("m1")) * (F.col("x2") - F.col("m2"))).alias(
            "s12"
        ),
        F.sum((F.col("x2") - F.col("m2")) * (F.col("x2") - F.col("m2"))).alias(
            "s22"
        ),
        (F.count(F.lit(1)) - 2).alias("dof"),
    )
    mw = mu.agg(
        (
            F.max(F.when(F.col("t") == 1, F.col("m1")))
            - F.max(F.when(F.col("t") == 0, F.col("m1")))
        ).alias("d1"),
        (
            F.max(F.when(F.col("t") == 1, F.col("m2")))
            - F.max(F.when(F.col("t") == 0, F.col("m2")))
        ).alias("d2"),
        F.max(F.when(F.col("t") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("t") == 0, F.col("n"))).alias("n0"),
    )
    parts = sw.crossJoin(F.broadcast(mw)).select(
        "d1",
        "d2",
        "n1",
        "n0",
        (F.col("s11") / F.col("dof")).alias("c11"),
        (F.col("s12") / F.col("dof")).alias("c12"),
        (F.col("s22") / F.col("dof")).alias("c22"),
    )
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    tsq = (
        (F.col("n1") * F.col("n0") * 1.0 / (F.col("n1") + F.col("n0")))
        * (
            F.col("d1") * (F.col("c22") * F.col("d1") - F.col("c12") * F.col("d2"))
            + F.col("d2")
            * (F.col("c11") * F.col("d2") - F.col("c12") * F.col("d1"))
        )
        / det
    )
    t2 = parts.select("n1", "n0", "d1", "d2", tsq.alias("tsq"))
    fstat = F.col("tsq") * (F.col("n1") + F.col("n0") - 3) / (
        2.0 * (F.col("n1") + F.col("n0") - 2)
    )
    return t2.select(
        F.col("n1").cast("bigint").alias("n_treated"),
        F.col("n0").cast("bigint").alias("n_control"),
        r6(F.col("d1")).alias("mean_gap_balance"),
        r6(F.col("d2")).alias("mean_gap_spend"),
        r6(F.col("tsq")).alias("hotelling_t2"),
        r6(fstat).alias("f_statistic"),
        (fstat > 3.0).alias("reject_equal_means"),
    )


# ---------------------------------------------------------------------------
# Q709 — max-flow by exhaustive min-cut on a 6-node layered network
# ---------------------------------------------------------------------------
# A source, two mid layers of two nodes each, and a sink, with edge
# capacities from inter-bloc trade revenue: all 16 s-t cuts are
# enumerated (subsets of the four interior nodes) and the minimum
# cut capacity IS the max flow (strong duality) — network-flow
# optimization made exact and relational, beside MST (q577) and
# SSSP (q350).
_Q709_ORACLE = """
    WITH flows AS MATERIALIZED (
      SELECT s.s_nationkey % 5 AS i, c.c_nationkey % 5 AS j,
             ROUND(SUM(ROUND(l.l_extendedprice * 100)) / 1e8) AS f
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY s.s_nationkey % 5, c.c_nationkey % 5
    ), caps AS (
      SELECT
        COALESCE(MAX(CASE WHEN i = 0 AND j = 1 THEN f END), 0) AS sa,
        COALESCE(MAX(CASE WHEN i = 0 AND j = 2 THEN f END), 0) AS sb,
        COALESCE(MAX(CASE WHEN i = 1 AND j = 3 THEN f END), 0) AS ac,
        COALESCE(MAX(CASE WHEN i = 1 AND j = 4 THEN f END), 0) AS ad,
        COALESCE(MAX(CASE WHEN i = 2 AND j = 3 THEN f END), 0) AS bc,
        COALESCE(MAX(CASE WHEN i = 2 AND j = 4 THEN f END), 0) AS bd,
        COALESCE(MAX(CASE WHEN i = 3 AND j = 0 THEN f END), 0) AS ct,
        COALESCE(MAX(CASE WHEN i = 4 AND j = 0 THEN f END), 0) AS dt
      FROM flows
    ), cuts AS (
      SELECT g.m,
             CAST(FLOOR(g.m / 8) AS BIGINT) % 2 AS ina,
             CAST(FLOOR(g.m / 4) AS BIGINT) % 2 AS inb,
             CAST(FLOOR(g.m / 2) AS BIGINT) % 2 AS inc_,
             g.m % 2 AS ind_
      FROM (SELECT UNNEST(range(0, 16)) AS m) g
    ), scored AS (
      SELECT c2.m,
             (1 - c2.ina) * k.sa + (1 - c2.inb) * k.sb
             + c2.ina * (1 - c2.inc_) * k.ac
             + c2.ina * (1 - c2.ind_) * k.ad
             + c2.inb * (1 - c2.inc_) * k.bc
             + c2.inb * (1 - c2.ind_) * k.bd
             + c2.inc_ * k.ct + c2.ind_ * k.dt AS cutcap
      FROM cuts c2, caps k
    ), best AS (
      SELECT m, cutcap FROM scored ORDER BY cutcap, m LIMIT 1
    )
    SELECT ROUND(b.cutcap + 5e-10, 4) AS max_flow,
           CAST(b.m AS BIGINT) AS min_cut_mask,
           CAST(16 AS BIGINT) AS cuts_enumerated,
           ROUND((SELECT MIN(cutcap) FROM scored WHERE m <> b.m)
                 + 5e-10, 4) AS second_best_cut,
           ROUND(k.sa + k.sb + 5e-10, 4) AS source_capacity,
           b.cutcap <= k.sa + k.sb AS respects_source_bound
    FROM best b, caps k
"""


@register(
    "q709_min_cut",
    _Q709_ORACLE,
    doc="Max-flow = min-cut on a 6-node layered network with "
    "inter-bloc trade capacities: all 16 s-t cuts enumerated "
    "relationally, the minimum is the max flow by strong duality, "
    "with the second-best cut as sensitivity — exact network flow "
    "beside MST (q577), SSSP (q350) and matching (q504).",
)
def q709(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    flows = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            (F.col("s_nationkey") % 5).alias("i"),
            (F.col("c_nationkey") % 5).alias("j"),
        )
        .agg(
            F.round(
                F.sum(F.round(F.col("l_extendedprice") * 100)) / 1e8
            ).alias("f")
        )
    )
    pick = lambda i, j, nm: F.coalesce(  # noqa: E731
        F.max(F.when((F.col("i") == i) & (F.col("j") == j), F.col("f"))),
        F.lit(0.0),
    ).alias(nm)
    caps = flows.agg(
        pick(0, 1, "sa"),
        pick(0, 2, "sb"),
        pick(1, 3, "ac"),
        pick(1, 4, "ad"),
        pick(2, 3, "bc"),
        pick(2, 4, "bd"),
        pick(3, 0, "ct"),
        pick(4, 0, "dt"),
        # one-row capacity frame feeding every cut branch (plan audit:
        # 24 scans un-materialized)
    ).localCheckpoint(eager=True)
    masks = spark.range(0, 16).select(F.col("id").alias("m"))
    cuts = masks.select(
        "m",
        (F.floor(F.col("m") / 8) % 2).alias("ina"),
        (F.floor(F.col("m") / 4) % 2).alias("inb"),
        (F.floor(F.col("m") / 2) % 2).alias("inc_"),
        (F.col("m") % 2).alias("ind_"),
    )
    scored = cuts.crossJoin(F.broadcast(caps)).select(
        "m",
        (
            (1 - F.col("ina")) * F.col("sa")
            + (1 - F.col("inb")) * F.col("sb")
            + F.col("ina") * (1 - F.col("inc_")) * F.col("ac")
            + F.col("ina") * (1 - F.col("ind_")) * F.col("ad")
            + F.col("inb") * (1 - F.col("inc_")) * F.col("bc")
            + F.col("inb") * (1 - F.col("ind_")) * F.col("bd")
            + F.col("inc_") * F.col("ct")
            + F.col("ind_") * F.col("dt")
        ).alias("cutcap"),
    ).localCheckpoint(eager=False)
    best = scored.orderBy("cutcap", "m").limit(1)
    second = (
        best.select(F.col("m").alias("bm"))
        .crossJoin(scored)
        .filter(F.col("m") != F.col("bm"))
        .agg(F.min("cutcap").alias("second"))
    )
    return (
        best.crossJoin(F.broadcast(second))
        .crossJoin(F.broadcast(caps.select("sa", "sb")))
        .select(
            F.round(F.col("cutcap") + F.lit(5e-10), 4).alias("max_flow"),
            F.col("m").cast("bigint").alias("min_cut_mask"),
            F.lit(16).cast("bigint").alias("cuts_enumerated"),
            F.round(F.col("second") + F.lit(5e-10), 4).alias(
                "second_best_cut"
            ),
            F.round(F.col("sa") + F.col("sb") + F.lit(5e-10), 4).alias(
                "source_capacity"
            ),
            (F.col("cutcap") <= F.col("sa") + F.col("sb")).alias(
                "respects_source_bound"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Q710 — price stickiness and spell lengths per part
# ---------------------------------------------------------------------------
# Each part's unit prices in order-date sequence: the share of
# consecutive sales with unchanged price, fully sticky parts, and
# the mean spell length n/(changes+1) — menu-cost economics' core
# facts beside price dispersion (q554) and endings (q331).
_Q710_ORACLE = """
    WITH sales AS MATERIALIZED (
      SELECT l.l_partkey AS pk,
             ROUND(l.l_extendedprice / l.l_quantity * 100) AS up,
             LAG(ROUND(l.l_extendedprice / l.l_quantity * 100)) OVER (
               PARTITION BY l.l_partkey
               ORDER BY o.o_orderdate, l.l_orderkey, l.l_linenumber)
               AS up_prev
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ), per AS MATERIALIZED (
      SELECT pk, COUNT(*) AS n,
             SUM(CASE WHEN up_prev IS NOT NULL AND up <> up_prev
                      THEN 1 ELSE 0 END) AS changes,
             SUM(CASE WHEN up_prev IS NOT NULL THEN 1 ELSE 0 END) AS trans
      FROM sales GROUP BY pk
      HAVING COUNT(*) >= 5
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(AVG(changes * 1.0 / trans) + 5e-12, 6)
             AS mean_change_rate,
           ROUND(AVG(CASE WHEN changes = 0 THEN 1.0 ELSE 0 END)
                 + 5e-12, 6) AS share_fully_sticky,
           ROUND(AVG(n * 1.0 / (changes + 1)) + 5e-12, 6)
             AS mean_spell_length,
           ROUND(SUM(changes) * 1.0 / SUM(trans) + 5e-12, 6)
             AS pooled_change_rate
    FROM per
"""


@register(
    "q710_price_stickiness",
    _Q710_ORACLE,
    doc="Price stickiness: per-part unit prices in order-date "
    "sequence, the per-part and pooled price-change rates, fully "
    "sticky share, and mean spell length n/(changes+1) — the "
    "menu-cost facts beside price dispersion (q554), endings "
    "(q331) and indices (q273).",
)
def q710(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    w = Window.partitionBy("l_partkey").orderBy(
        "o_orderdate", "l_orderkey", "l_linenumber"
    )
    up = F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100)
    sales = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("l_partkey").alias("pk"),
        up.alias("up"),
        F.lag(up).over(w).alias("up_prev"),
    )
    per = (
        sales.groupBy("pk")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    F.col("up_prev").isNotNull()
                    & (F.col("up") != F.col("up_prev")),
                    1,
                ).otherwise(0)
            ).alias("changes"),
            F.sum(
                F.when(F.col("up_prev").isNotNull(), 1).otherwise(0)
            ).alias("trans"),
        )
        .filter(F.col("n") >= 5)
    )
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        r6(F.avg(F.col("changes") * 1.0 / F.col("trans"))).alias(
            "mean_change_rate"
        ),
        r6(
            F.avg(F.when(F.col("changes") == 0, 1.0).otherwise(0.0))
        ).alias("share_fully_sticky"),
        r6(F.avg(F.col("n") * 1.0 / (F.col("changes") + 1))).alias(
            "mean_spell_length"
        ),
        r6(F.sum("changes") * 1.0 / F.sum("trans")).alias(
            "pooled_change_rate"
        ),
    )
