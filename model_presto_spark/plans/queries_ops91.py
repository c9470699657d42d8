"""Conformance queries batch #91 (q649+) — SPC run rules, polynomial
trend contrasts, the Burrows-Wheeler transform, PERT scheduling, and
wage-gap style decomposition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q649 — Western Electric run rules on a control chart
# ---------------------------------------------------------------------------
# Daily revenue z-scored against the first-15-day baseline, then the
# four classic WE rules: beyond 3-sigma; 2-of-3 beyond 2-sigma same
# side; 4-of-5 beyond 1-sigma same side; 8 consecutive same side —
# the pattern alarms that a plain Shewhart chart (q272) misses.
_Q649_ORACLE = """
    WITH daily AS MATERIALIZED (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t, x
      FROM (SELECT EXTRACT(day FROM ts) AS d,
                   ROUND(SUM(ROUND(value * 100)) / 1000.0) AS x
            FROM events GROUP BY EXTRACT(day FROM ts))
    ), base AS (
      SELECT AVG(x) AS mu,
             SQRT(AVG(x * x) - AVG(x) * AVG(x)) AS sd
      FROM daily WHERE t <= 15
    ), z AS MATERIALIZED (
      SELECT d.t, (d.x - b.mu) / b.sd AS z,
             CASE WHEN d.x > b.mu THEN 1
                  WHEN d.x < b.mu THEN -1 ELSE 0 END AS s
      FROM daily d, base b
    ), flags AS (
      SELECT t,
             CASE WHEN ABS(z) > 3 THEN 1 ELSE 0 END AS r1,
             CASE WHEN SUM(CASE WHEN z > 2 THEN 1 ELSE 0 END)
                    OVER (ORDER BY t ROWS 2 PRECEDING) >= 2
                  OR SUM(CASE WHEN z < -2 THEN 1 ELSE 0 END)
                    OVER (ORDER BY t ROWS 2 PRECEDING) >= 2
                  THEN 1 ELSE 0 END AS r2,
             CASE WHEN SUM(CASE WHEN z > 1 THEN 1 ELSE 0 END)
                    OVER (ORDER BY t ROWS 4 PRECEDING) >= 4
                  OR SUM(CASE WHEN z < -1 THEN 1 ELSE 0 END)
                    OVER (ORDER BY t ROWS 4 PRECEDING) >= 4
                  THEN 1 ELSE 0 END AS r3,
             CASE WHEN COUNT(*) OVER (ORDER BY t ROWS 7 PRECEDING) = 8
                  AND ABS(SUM(s) OVER (ORDER BY t ROWS 7 PRECEDING)) = 8
                  THEN 1 ELSE 0 END AS r4
      FROM z
    )
    SELECT CAST(SUM(r1) AS BIGINT) AS rule1_3sigma,
           CAST(SUM(r2) AS BIGINT) AS rule2_2of3,
           CAST(SUM(r3) AS BIGINT) AS rule3_4of5,
           CAST(SUM(r4) AS BIGINT) AS rule4_8run,
           CAST(SUM(CASE WHEN r1 + r2 + r3 + r4 > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS flagged_days,
           CAST(MIN(CASE WHEN r1 + r2 + r3 + r4 > 0 THEN t END)
                AS BIGINT) AS first_alarm_day
    FROM flags
"""


@register(
    "q649_western_electric",
    _Q649_ORACLE,
    doc="Western Electric run rules: daily revenue z-scored against "
    "the first-15-day baseline, rules 1-4 (3-sigma point, 2-of-3 "
    "past 2-sigma, 4-of-5 past 1-sigma, 8-run same side) via "
    "rolling indicator sums — the SPC pattern alarms beyond the "
    "plain control chart (q272) and CUSUM (q97).",
)
def q649(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    base_rows = e.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.round(F.sum(F.round(F.col("value") * 100)) / 1000.0).alias("x")
    )
    daily = base_rows.select(
        F.row_number().over(Window.orderBy("d")).cast("bigint").alias("t"),
        "x",
    ).localCheckpoint(eager=False)
    base = daily.filter(F.col("t") <= 15).agg(
        F.avg("x").alias("mu"),
        F.sqrt(
            F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x")
        ).alias("sd"),
    )
    z = daily.crossJoin(F.broadcast(base)).select(
        "t",
        ((F.col("x") - F.col("mu")) / F.col("sd")).alias("z"),
        F.when(F.col("x") > F.col("mu"), 1)
        .when(F.col("x") < F.col("mu"), -1)
        .otherwise(0)
        .alias("s"),
    )
    w3 = Window.orderBy("t").rowsBetween(-2, 0)
    w5 = Window.orderBy("t").rowsBetween(-4, 0)
    w8 = Window.orderBy("t").rowsBetween(-7, 0)
    hi = lambda thr: F.sum(F.when(F.col("z") > thr, 1).otherwise(0))  # noqa: E731
    lo = lambda thr: F.sum(F.when(F.col("z") < -thr, 1).otherwise(0))  # noqa: E731
    flags = z.select(
        "t",
        F.when(F.abs("z") > 3, 1).otherwise(0).alias("r1"),
        F.when(
            (hi(2).over(w3) >= 2) | (lo(2).over(w3) >= 2), 1
        ).otherwise(0).alias("r2"),
        F.when(
            (hi(1).over(w5) >= 4) | (lo(1).over(w5) >= 4), 1
        ).otherwise(0).alias("r3"),
        F.when(
            (F.count(F.lit(1)).over(w8) == 8)
            & (F.abs(F.sum("s").over(w8)) == 8),
            1,
        ).otherwise(0).alias("r4"),
    )
    any_flag = F.col("r1") + F.col("r2") + F.col("r3") + F.col("r4") > 0
    return flags.agg(
        F.sum("r1").cast("bigint").alias("rule1_3sigma"),
        F.sum("r2").cast("bigint").alias("rule2_2of3"),
        F.sum("r3").cast("bigint").alias("rule3_4of5"),
        F.sum("r4").cast("bigint").alias("rule4_8run"),
        F.sum(F.when(any_flag, 1).otherwise(0)).cast("bigint").alias(
            "flagged_days"
        ),
        F.min(F.when(any_flag, F.col("t"))).cast("bigint").alias(
            "first_alarm_day"
        ),
    )


# ---------------------------------------------------------------------------
# Q650 — orthogonal polynomial contrasts across ordered levels
# ---------------------------------------------------------------------------
# The five order priorities as equally spaced ordered levels: the
# classical linear/quadratic/cubic/quartic contrast coefficients
# decompose the between-group variation of mean order value into
# trend shapes, each contrast's sum of squares L^2 / sum(c^2/n) as
# its share — ANOVA's trend decomposition (cf. Page's test, q642).
_Q650_ORACLE = """
    WITH cells AS MATERIALIZED (
      SELECT CAST(SUBSTR(o_orderpriority, 1, 1) AS BIGINT) AS lvl,
             COUNT(*) AS n,
             AVG(ROUND(o_totalprice * 100)) / 1e5 AS m
      FROM orders GROUP BY SUBSTR(o_orderpriority, 1, 1)
    ), contrasts AS (
      SELECT * FROM (VALUES
        ('1_linear',    CAST(-2 AS DOUBLE), -1, 0, 1, 2),
        ('2_quadratic', CAST(2 AS DOUBLE), -1, -2, -1, 2),
        ('3_cubic',     CAST(-1 AS DOUBLE), 2, 0, -2, 1),
        ('4_quartic',   CAST(1 AS DOUBLE), -4, 6, -4, 1)
      ) AS t(nm, c1, c2, c3, c4, c5)
    ), gmean AS (
      SELECT SUM(n * m) / SUM(n) AS gm FROM cells
    ), wide AS (
      SELECT MAX(CASE WHEN lvl = 1 THEN m END) AS m1,
             MAX(CASE WHEN lvl = 2 THEN m END) AS m2,
             MAX(CASE WHEN lvl = 3 THEN m END) AS m3,
             MAX(CASE WHEN lvl = 4 THEN m END) AS m4,
             MAX(CASE WHEN lvl = 5 THEN m END) AS m5,
             MAX(CASE WHEN lvl = 1 THEN n END) AS n1,
             MAX(CASE WHEN lvl = 2 THEN n END) AS n2,
             MAX(CASE WHEN lvl = 3 THEN n END) AS n3,
             MAX(CASE WHEN lvl = 4 THEN n END) AS n4,
             MAX(CASE WHEN lvl = 5 THEN n END) AS n5,
             SUM(n * (m - g.gm) * (m - g.gm)) AS ssb
      FROM cells, gmean g GROUP BY g.gm
    ), est AS (
      SELECT k.nm,
             k.c1 * w.m1 + k.c2 * w.m2 + k.c3 * w.m3
               + k.c4 * w.m4 + k.c5 * w.m5 AS l,
             k.c1 * k.c1 / w.n1 + k.c2 * k.c2 / w.n2 + k.c3 * k.c3 / w.n3
               + k.c4 * k.c4 / w.n4 + k.c5 * k.c5 / w.n5 AS denom,
             w.ssb
      FROM contrasts k, wide w
    )
    SELECT nm AS contrast,
           ROUND(l + 5e-12, 6) AS estimate,
           ROUND(l * l / denom + 5e-12, 6) AS contrast_ss,
           ROUND(l * l / denom / ssb + 5e-12, 6) AS share_of_between
    FROM est ORDER BY nm
"""


@register(
    "q650_polynomial_contrasts",
    _Q650_ORACLE,
    doc="Orthogonal polynomial contrasts: the five priority levels' "
    "mean order values decomposed into linear/quadratic/cubic/"
    "quartic trend components, each contrast SS = L^2/sum(c^2/n) "
    "as a share of the between-group SS — ANOVA trend analysis "
    "refining the omnibus tests (q246, q642).",
)
def q650(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("lvl")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (F.avg(F.round(F.col("o_totalprice") * 100)) / 1e5).alias("m"),
    ).localCheckpoint(eager=False)
    gm = cells.agg(
        (F.sum(F.col("n") * F.col("m")) / F.sum("n")).alias("gm")
    )
    ssb = (
        cells.crossJoin(F.broadcast(gm))
        .agg(
            F.sum(
                F.col("n")
                * (F.col("m") - F.col("gm"))
                * (F.col("m") - F.col("gm"))
            ).alias("ssb")
        )
    )
    wide = cells.agg(
        *[
            F.max(F.when(F.col("lvl") == i, F.col("m"))).alias(f"m{i}")
            for i in range(1, 6)
        ],
        *[
            F.max(F.when(F.col("lvl") == i, F.col("n"))).alias(f"n{i}")
            for i in range(1, 6)
        ],
    ).crossJoin(F.broadcast(ssb))
    contrasts = spark.createDataFrame(
        [
            ("1_linear", -2.0, -1.0, 0.0, 1.0, 2.0),
            ("2_quadratic", 2.0, -1.0, -2.0, -1.0, 2.0),
            ("3_cubic", -1.0, 2.0, 0.0, -2.0, 1.0),
            ("4_quartic", 1.0, -4.0, 6.0, -4.0, 1.0),
        ],
        ["nm", "c1", "c2", "c3", "c4", "c5"],
    )
    est = F.broadcast(contrasts).crossJoin(F.broadcast(wide)).select(
        "nm",
        sum(
            (F.col(f"c{i}") * F.col(f"m{i}") for i in range(2, 6)),
            F.col("c1") * F.col("m1"),
        ).alias("l"),
        sum(
            (F.col(f"c{i}") * F.col(f"c{i}") / F.col(f"n{i}") for i in range(2, 6)),
            F.col("c1") * F.col("c1") / F.col("n1"),
        ).alias("denom"),
        "ssb",
    )
    return est.select(
        F.col("nm").alias("contrast"),
        r6(F.col("l")).alias("estimate"),
        r6(F.col("l") * F.col("l") / F.col("denom")).alias("contrast_ss"),
        r6(F.col("l") * F.col("l") / F.col("denom") / F.col("ssb")).alias(
            "share_of_between"
        ),
    ).orderBy("contrast")


# ---------------------------------------------------------------------------
# Q651 — Burrows-Wheeler transform, relationally
# ---------------------------------------------------------------------------
# The first 40 letters of the lowest-id document (plus the '$'
# terminator) rotated 41 ways, rotations sorted lexicographically,
# last characters concatenated: the BWT. Its run count versus the
# original's measures the clustering that makes bzip2-style
# compression work — complementing LZ complexity (q447) and RLE
# sort advising (q488).
_Q651_ORACLE = """
    WITH doc AS MATERIALIZED (
      SELECT SUBSTR(REGEXP_REPLACE(LOWER(text), '[^a-z]', '', 'g'),
                    1, 40) || '$' AS s
      FROM documents ORDER BY doc_id LIMIT 1
    ), rot AS MATERIALIZED (
      SELECT d.s,
             SUBSTR(d.s, g.i, LENGTH(d.s) - g.i + 1)
               || SUBSTR(d.s, 1, g.i - 1) AS r
      FROM doc d CROSS JOIN (
        SELECT UNNEST(range(1, 42)) AS i) g
      WHERE g.i <= LENGTH(d.s)
    ), bwt AS (
      SELECT s, STRING_AGG(SUBSTR(r, LENGTH(r), 1), '' ORDER BY r) AS b
      FROM rot GROUP BY s
    ), runs AS (
      SELECT s AS orig, b,
             1 + list_sum(list_transform(range(1, LENGTH(b)),
               i -> CASE WHEN SUBSTR(b, CAST(i AS BIGINT), 1)
                           <> SUBSTR(b, CAST(i AS BIGINT) + 1, 1)
                    THEN 1 ELSE 0 END)) AS runs_b,
             1 + list_sum(list_transform(range(1, LENGTH(s)),
               i -> CASE WHEN SUBSTR(s, CAST(i AS BIGINT), 1)
                           <> SUBSTR(s, CAST(i AS BIGINT) + 1, 1)
                    THEN 1 ELSE 0 END)) AS runs_o
      FROM bwt
    )
    SELECT b AS bwt_string,
           CAST(runs_b AS BIGINT) AS runs_bwt,
           CAST(runs_o AS BIGINT) AS runs_original,
           ROUND(runs_o * 1.0 / runs_b + 5e-12, 6) AS run_compression_gain
    FROM runs
"""


@register(
    "q651_burrows_wheeler",
    _Q651_ORACLE,
    doc="Burrows-Wheeler transform done relationally: 41 rotations of "
    "a terminated 40-letter document prefix sorted lexicographically, "
    "last column concatenated, run counts before/after — the "
    "character-clustering transform behind bzip2, next to LZ "
    "complexity (q447) and RLE advising (q488).",
)
def q651(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    doc = (
        d.orderBy("doc_id")
        .limit(1)
        .select(
            F.concat(
                F.substring(
                    F.regexp_replace(F.lower("text"), "[^a-z]", ""), 1, 40
                ),
                F.lit("$"),
            ).alias("s")
        )
    )
    idx = spark.range(1, 42).select(F.col("id").cast("int").alias("i"))
    rot = (
        doc.crossJoin(F.broadcast(idx))
        .filter(F.col("i") <= F.length("s"))
        .select(
            F.concat(
                F.expr("substr(s, i, length(s) - i + 1)"),
                F.expr("substr(s, 1, i - 1)"),
            ).alias("r"),
            "s",
        )
    )
    bwt = rot.groupBy("s").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("r"),
                            F.expr("substr(r, length(r), 1)").alias("c"),
                        )
                    )
                ),
                lambda t: t["c"],
            ),
            "",
        ).alias("b")
    )
    def runs(col: str):
        return F.expr(
            f"1 + aggregate(transform(sequence(1, length({col}) - 1), "
            f"i -> CASE WHEN substr({col}, i, 1) <> substr({col}, i + 1, 1) "
            f"THEN 1 ELSE 0 END), 0, (a, x) -> a + x)"
        )

    return bwt.select(
        F.col("b").alias("bwt_string"),
        runs("b").cast("bigint").alias("runs_bwt"),
        runs("s").cast("bigint").alias("runs_original"),
        r6(runs("s") * 1.0 / runs("b")).alias("run_compression_gain"),
    )


# ---------------------------------------------------------------------------
# Q652 — PERT three-point estimation with deadline probability
# ---------------------------------------------------------------------------
# Each order is a serial project of lineitem tasks with three-point
# estimates (optimistic 0.6q, most-likely q, pessimistic 1.8q): PERT
# means (a+4m+b)/6 and variances ((b-a)/6)^2 sum along the chain,
# and the A&S normal CDF gives the probability of beating a 20%
# buffered deadline — CPM's (q629) stochastic sibling.
_Q652_ORACLE = """
    WITH tasks AS MATERIALIZED (
      SELECT l_orderkey AS ok,
             SUM((l_quantity * CAST(0.6 AS DOUBLE)
                  + 4 * l_quantity
                  + l_quantity * CAST(1.8 AS DOUBLE)) / 6) AS mean_d,
             SUM(POW((l_quantity * CAST(1.8 AS DOUBLE)
                      - l_quantity * CAST(0.6 AS DOUBLE)) / 6, 2)) AS var_d,
             SUM(l_quantity) * CAST(1.2 AS DOUBLE) AS deadline
      FROM lineitem GROUP BY l_orderkey
    ), prob AS (
      SELECT ok,
             (deadline - mean_d) / SQRT(var_d) AS zz
      FROM tasks
    ), cdf AS (
      SELECT ok, zz,
             CASE WHEN zz >= 0 THEN
               1 - EXP(-zz * zz / 2) * 0.3989422804014327
                 * ((((1.330274429 / (1 + 0.2316419 * zz) - 1.821255978)
                      / (1 + 0.2316419 * zz) + 1.781477937)
                     / (1 + 0.2316419 * zz) - 0.356563782)
                    / (1 + 0.2316419 * zz) + 0.319381530)
                 / (1 + 0.2316419 * zz)
             ELSE
               EXP(-zz * zz / 2) * 0.3989422804014327
                 * ((((1.330274429 / (1 - 0.2316419 * zz) - 1.821255978)
                      / (1 - 0.2316419 * zz) + 1.781477937)
                     / (1 - 0.2316419 * zz) - 0.356563782)
                    / (1 - 0.2316419 * zz) + 0.319381530)
                 / (1 - 0.2316419 * zz)
             END AS p
      FROM prob
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_projects,
           ROUND(AVG(p) + 5e-12, 6) AS avg_completion_prob,
           ROUND(SUM(CASE WHEN p >= 0.95 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*) + 5e-12, 6) AS share_safe,
           ROUND(AVG(zz) + 5e-12, 6) AS avg_buffer_sigmas
    FROM cdf
"""


@register(
    "q652_pert_estimate",
    _Q652_ORACLE,
    doc="PERT three-point estimation: per-order serial chains of "
    "(0.6q, q, 1.8q) tasks, beta-PERT means and variances summed, "
    "probability of meeting a 20%-buffered deadline via the shared "
    "A&S normal CDF — stochastic scheduling beside deterministic "
    "CPM (q629).",
)
def q652(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    tasks = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.sum((q * 0.6 + 4 * q + q * 1.8) / 6).alias("mean_d"),
        F.sum(F.pow((q * 1.8 - q * 0.6) / 6, 2)).alias("var_d"),
        (F.sum(q) * 1.2).alias("deadline"),
    )
    prob = tasks.select(
        "ok",
        (
            (F.col("deadline") - F.col("mean_d")) / F.sqrt(F.col("var_d"))
        ).alias("zz"),
    )
    zz = F.col("zz")
    az = F.abs(zz)
    t = 1 / (1 + 0.2316419 * az)
    poly = (
        (((1.330274429 * t - 1.821255978) * t + 1.781477937) * t - 0.356563782)
        * t
        + 0.319381530
    ) * t
    tail = F.exp(-az * az / 2) * 0.3989422804014327 * poly
    p = F.when(zz >= 0, 1 - tail).otherwise(tail)
    cdf = prob.select("ok", "zz", p.alias("p"))
    return cdf.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_projects"),
        r6(F.avg("p")).alias("avg_completion_prob"),
        r6(
            F.sum(F.when(F.col("p") >= 0.95, 1).otherwise(0))
            * 1.0
            / F.count(F.lit(1))
        ).alias("share_safe"),
        r6(F.avg("zz")).alias("avg_buffer_sigmas"),
    )


# ---------------------------------------------------------------------------
# Q653 — Oaxaca-Blinder decomposition of a group gap
# ---------------------------------------------------------------------------
# The BUILDING-segment vs rest gap in mean customer spend, split by
# group-specific spend-on-balance OLS fits into endowment (different
# balances), coefficient (different returns), and interaction terms
# — the wage-gap decomposition, threefold form with the comparison
# group as reference.
_Q653_ORACLE = """
    WITH u AS MATERIALIZED (
      SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g,
             ROUND(c.c_acctbal * 100) / 1e5 AS x,
             COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0) / 1e6 AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_mktsegment, c.c_acctbal
    ), fits AS (
      SELECT g, COUNT(*) AS n, AVG(x) AS mx, AVG(y) AS my,
             (SUM(x * y) - COUNT(*) * AVG(x) * AVG(y))
               / (SUM(x * x) - COUNT(*) * AVG(x) * AVG(x)) AS b
      FROM u GROUP BY g
    ), wide AS (
      SELECT MAX(CASE WHEN g = 1 THEN mx END) AS mxa,
             MAX(CASE WHEN g = 0 THEN mx END) AS mxb,
             MAX(CASE WHEN g = 1 THEN my END) AS mya,
             MAX(CASE WHEN g = 0 THEN my END) AS myb,
             MAX(CASE WHEN g = 1 THEN b END) AS ba,
             MAX(CASE WHEN g = 0 THEN b END) AS bb
      FROM fits
    )
    SELECT ROUND(mya - myb + 5e-12, 6) AS total_gap,
           ROUND((mxa - mxb) * bb + 5e-12, 6) AS endowment,
           ROUND((mya - ba * mxa) - (myb - bb * mxb)
                 + mxb * (ba - bb) + 5e-12, 6) AS coefficients,
           ROUND((mxa - mxb) * (ba - bb) + 5e-12, 6) AS interaction,
           ABS((mya - myb)
               - ((mxa - mxb) * bb
                  + (mya - ba * mxa) - (myb - bb * mxb)
                  + mxb * (ba - bb)
                  + (mxa - mxb) * (ba - bb))) < 1e-9 AS decomposition_exact
    FROM wide
"""


@register(
    "q653_oaxaca_blinder",
    _Q653_ORACLE,
    doc="Oaxaca-Blinder threefold decomposition: the BUILDING-vs-rest "
    "spend gap split via group-specific OLS into endowment "
    "(balance differences at reference returns), coefficient "
    "(slope and intercept differences), and interaction terms, "
    "with the exact-identity check — the wage-gap workhorse next "
    "to shift-share (q524) and Theil (q420).",
)
def q653(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    u = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment", "c_acctbal")
        .agg(
            (
                F.coalesce(F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0))
                / 1e6
            ).alias("y")
        )
        .select(
            F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias(
                "g"
            ),
            (F.round(F.col("c_acctbal") * 100) / 1e5).alias("x"),
            "y",
        )
    )
    n = F.count(F.lit(1))
    fits = u.groupBy("g").agg(
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        (
            (F.sum(F.col("x") * F.col("y")) - n * F.avg("x") * F.avg("y"))
            / (F.sum(F.col("x") * F.col("x")) - n * F.avg("x") * F.avg("x"))
        ).alias("b"),
    )
    wide = fits.agg(
        F.max(F.when(F.col("g") == 1, F.col("mx"))).alias("mxa"),
        F.max(F.when(F.col("g") == 0, F.col("mx"))).alias("mxb"),
        F.max(F.when(F.col("g") == 1, F.col("my"))).alias("mya"),
        F.max(F.when(F.col("g") == 0, F.col("my"))).alias("myb"),
        F.max(F.when(F.col("g") == 1, F.col("b"))).alias("ba"),
        F.max(F.when(F.col("g") == 0, F.col("b"))).alias("bb"),
    )
    mxa, mxb = F.col("mxa"), F.col("mxb")
    mya, myb = F.col("mya"), F.col("myb")
    ba, bb = F.col("ba"), F.col("bb")
    endow = (mxa - mxb) * bb
    coefs = (mya - ba * mxa) - (myb - bb * mxb) + mxb * (ba - bb)
    inter = (mxa - mxb) * (ba - bb)
    return wide.select(
        r6(mya - myb).alias("total_gap"),
        r6(endow).alias("endowment"),
        r6(coefs).alias("coefficients"),
        r6(inter).alias("interaction"),
        (F.abs((mya - myb) - (endow + coefs + inter)) < 1e-9).alias(
            "decomposition_exact"
        ),
    )
