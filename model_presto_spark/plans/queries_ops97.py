"""Conformance queries batch #97 (q679+) — staggered-adoption DiD
decomposition, dynamic lot sizing, error-correcting codes, ridge
shrinkage paths, and ROC convex hulls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q679 — staggered adoption: the 2x2 DDs inside TWFE (Bacon-style)
# ---------------------------------------------------------------------------
# Three nation blocs adopt at day 11, day 21, or never; the pooled
# two-way fixed-effects coefficient (double-demeaned closed form)
# is decomposed into its four canonical 2x2 difference-in-
# differences — early-vs-never, late-vs-never, early-vs-late, and
# the "forbidden" late-vs-early whose control is already treated —
# the Goodman-Bacon anatomy of staggered DiD (q235/q608).
_Q679_ORACLE = """
    WITH panel AS MATERIALIZED (
      SELECT c.c_nationkey % 3 AS g, EXTRACT(day FROM e.ts) AS d,
             SUM(ROUND(e.value * 100)) / 1000.0 AS y
      FROM events e JOIN customer c ON c.c_custkey = e.user_id
      WHERE e.event_type = 'purchase'
      GROUP BY c.c_nationkey % 3, EXTRACT(day FROM e.ts)
    ), cells AS MATERIALIZED (
      SELECT g, d, y,
             CASE WHEN (g = 0 AND d >= 11) OR (g = 1 AND d >= 21)
                  THEN 1.0 ELSE 0 END AS tr
      FROM panel
    ), means AS (
      SELECT g,
             AVG(CASE WHEN d <= 10 THEN y END) AS w1,
             AVG(CASE WHEN d BETWEEN 11 AND 20 THEN y END) AS w2,
             AVG(CASE WHEN d >= 21 THEN y END) AS w3,
             AVG(CASE WHEN d >= 11 THEN y END) AS w23,
             AVG(CASE WHEN d <= 20 THEN y END) AS w12
      FROM cells GROUP BY g
    ), wide AS (
      SELECT MAX(CASE WHEN g = 0 THEN w1 END) AS e1,
             MAX(CASE WHEN g = 0 THEN w2 END) AS e2,
             MAX(CASE WHEN g = 0 THEN w3 END) AS e3,
             MAX(CASE WHEN g = 0 THEN w23 END) AS e23,
             MAX(CASE WHEN g = 1 THEN w1 END) AS l1,
             MAX(CASE WHEN g = 1 THEN w2 END) AS l2,
             MAX(CASE WHEN g = 1 THEN w3 END) AS l3,
             MAX(CASE WHEN g = 1 THEN w12 END) AS l12,
             MAX(CASE WHEN g = 2 THEN w1 END) AS n1,
             MAX(CASE WHEN g = 2 THEN w3 END) AS n3,
             MAX(CASE WHEN g = 2 THEN w23 END) AS n23,
             MAX(CASE WHEN g = 2 THEN w12 END) AS n12
      FROM means
    ), gm AS (
      SELECT AVG(y) AS my, AVG(tr) AS mt FROM cells
    ), fe AS (
      SELECT c.g, c.d, c.y, c.tr,
             AVG(c.y) OVER (PARTITION BY c.g) AS yg,
             AVG(c.y) OVER (PARTITION BY c.d) AS yd,
             AVG(c.tr) OVER (PARTITION BY c.g) AS tg,
             AVG(c.tr) OVER (PARTITION BY c.d) AS td
      FROM cells c
    ), twfe AS (
      SELECT SUM((f.y - f.yg - f.yd + g.my)
                 * (f.tr - f.tg - f.td + g.mt))
               / SUM((f.tr - f.tg - f.td + g.mt)
                     * (f.tr - f.tg - f.td + g.mt)) AS b
      FROM fe f, gm g
    )
    SELECT ROUND((w.e23 - w.e1) - (w.n23 - w.n1) + 5e-12, 6)
             AS dd_early_vs_never,
           ROUND((w.l3 - w.l12) - (w.n3 - w.n12) + 5e-12, 6)
             AS dd_late_vs_never,
           ROUND((w.e2 - w.e1) - (w.l2 - w.l1) + 5e-12, 6)
             AS dd_early_vs_late,
           ROUND((w.l3 - w.l2) - (w.e3 - w.e2) + 5e-12, 6)
             AS dd_late_vs_early_forbidden,
           ROUND(t.b + 5e-12, 6) AS twfe_coefficient
    FROM wide w, twfe t
"""


@register(
    "q679_bacon_decomposition",
    _Q679_ORACLE,
    doc="Goodman-Bacon anatomy of staggered DiD: blocs adopting at "
    "day 11 / day 21 / never give four canonical 2x2 DDs (including "
    "the forbidden already-treated control) alongside the exact "
    "double-demeaned TWFE coefficient they compose — why staggered "
    "two-way FE can mislead, extending DiD (q235) and placebo "
    "checks (q608).",
)
def q679(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    panel = (
        ev.join(F.broadcast(c), ev.user_id == c.c_custkey)
        .groupBy(
            (F.col("c_nationkey") % 3).alias("g"),
            F.dayofmonth("ts").alias("d"),
        )
        .agg((F.sum(F.round(F.col("value") * 100)) / 1000.0).alias("y"))
    )
    cells = panel.select(
        "g",
        "d",
        "y",
        F.when(
            ((F.col("g") == 0) & (F.col("d") >= 11))
            | ((F.col("g") == 1) & (F.col("d") >= 21)),
            1.0,
        )
        .otherwise(0.0)
        .alias("tr"),
    ).localCheckpoint(eager=False)
    means = cells.groupBy("g").agg(
        F.avg(F.when(F.col("d") <= 10, F.col("y"))).alias("w1"),
        F.avg(F.when(F.col("d").between(11, 20), F.col("y"))).alias("w2"),
        F.avg(F.when(F.col("d") >= 21, F.col("y"))).alias("w3"),
        F.avg(F.when(F.col("d") >= 11, F.col("y"))).alias("w23"),
        F.avg(F.when(F.col("d") <= 20, F.col("y"))).alias("w12"),
    )
    pick = lambda g, col, nm: F.max(  # noqa: E731
        F.when(F.col("g") == g, F.col(col))
    ).alias(nm)
    wide = means.agg(
        pick(0, "w1", "e1"),
        pick(0, "w2", "e2"),
        pick(0, "w3", "e3"),
        pick(0, "w23", "e23"),
        pick(1, "w1", "l1"),
        pick(1, "w2", "l2"),
        pick(1, "w3", "l3"),
        pick(1, "w12", "l12"),
        pick(2, "w1", "n1"),
        pick(2, "w3", "n3"),
        pick(2, "w23", "n23"),
        pick(2, "w12", "n12"),
    )
    gm = cells.agg(F.avg("y").alias("my"), F.avg("tr").alias("mt"))
    wg = Window.partitionBy("g")
    wd = Window.partitionBy("d")
    fe = cells.select(
        "y",
        "tr",
        F.avg("y").over(wg).alias("yg"),
        F.avg("y").over(wd).alias("yd"),
        F.avg("tr").over(wg).alias("tg"),
        F.avg("tr").over(wd).alias("td"),
    )
    ydd = F.col("y") - F.col("yg") - F.col("yd") + F.col("my")
    tdd = F.col("tr") - F.col("tg") - F.col("td") + F.col("mt")
    twfe = fe.crossJoin(F.broadcast(gm)).agg(
        (F.sum(ydd * tdd) / F.sum(tdd * tdd)).alias("b")
    )
    w = lambda nm: F.col(nm)  # noqa: E731
    return wide.crossJoin(F.broadcast(twfe)).select(
        r6((w("e23") - w("e1")) - (w("n23") - w("n1"))).alias(
            "dd_early_vs_never"
        ),
        r6((w("l3") - w("l12")) - (w("n3") - w("n12"))).alias(
            "dd_late_vs_never"
        ),
        r6((w("e2") - w("e1")) - (w("l2") - w("l1"))).alias(
            "dd_early_vs_late"
        ),
        r6((w("l3") - w("l2")) - (w("e3") - w("e2"))).alias(
            "dd_late_vs_early_forbidden"
        ),
        r6(F.col("b")).alias("twfe_coefficient"),
    )


# ---------------------------------------------------------------------------
# Q680 — Wagner-Whitin dynamic lot sizing
# ---------------------------------------------------------------------------
# Daily order counts as demand, setup cost 50, holding cost 0.1 per
# unit-day: the O(T^2) DP f(t) = min_j f(j-1) + K + h * carried
# units, run as a fold whose inner min uses prefix sums of d and
# t*d — the optimal ordering plan vs order-daily and order-once
# policies, the economics EOQ (q586) approximates.
_WW_INNER_DUCK = (
    "list_reduce(list_prepend(CAST(1e18 AS DOUBLE), "
    "list_transform(range(1, CAST(x[1] AS BIGINT) + 1), "
    "j -> CAST(j AS DOUBLE))), "
    "(mn, j) -> LEAST(mn, acc[CAST(j AS BIGINT)] + 50 + "
    "((sud[CAST(x[1] AS BIGINT) + 1] - sud[CAST(j AS BIGINT)]) "
    "- j * (sd[CAST(x[1] AS BIGINT) + 1] - sd[CAST(j AS BIGINT)])) / 10))"
)

_WW_DUCK = (
    "list_reduce(list_prepend([CAST(0 AS DOUBLE)], "
    "list_transform(range(1, nn + 1), t -> [CAST(t AS DOUBLE)])), "
    "(acc, x) -> list_append(acc, " + _WW_INNER_DUCK + "))"
)

_WW_INNER_SPARK = (
    "aggregate(sequence(1, CAST(element_at(x, 1) AS INT)), "
    "CAST(1e18 AS DOUBLE), "
    "(mn, j) -> LEAST(mn, element_at(acc, j) + 50 + "
    "((element_at(sud, CAST(element_at(x, 1) AS INT) + 1) "
    "- element_at(sud, j)) "
    "- j * (element_at(sd, CAST(element_at(x, 1) AS INT) + 1) "
    "- element_at(sd, j))) / 10))"
)

_WW_SPARK = (
    "aggregate(transform(sequence(1, nn), t -> array(CAST(t AS DOUBLE))), "
    "array(CAST(0 AS DOUBLE)), "
    "(acc, x) -> concat(acc, array(" + _WW_INNER_SPARK + ")))"
)

_Q680_ORACLE = f"""
    WITH daily AS MATERIALIZED (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t,
             CAST(n AS DOUBLE) AS dem
      FROM (SELECT EXTRACT(day FROM ts) AS d, COUNT(*) AS n
            FROM events GROUP BY EXTRACT(day FROM ts))
    ), arrs AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS INTEGER) AS nn,
             list_prepend(CAST(0 AS DOUBLE),
                          list(cd ORDER BY t)) AS sd,
             list_prepend(CAST(0 AS DOUBLE),
                          list(cud ORDER BY t)) AS sud
      FROM (SELECT t, dem,
                   SUM(dem) OVER (ORDER BY t) AS cd,
                   SUM(t * dem) OVER (ORDER BY t) AS cud
            FROM daily)
    ), folded AS (
      SELECT nn, sd, sud,
             {_WW_DUCK} AS f
      FROM arrs
    )
    SELECT CAST(nn AS BIGINT) AS n_days,
           ROUND(f[nn + 1] + 5e-10, 4) AS optimal_cost,
           ROUND(nn * 50.0 + 5e-10, 4) AS order_daily_cost,
           ROUND(50 + (sud[nn + 1] - sd[nn + 1]) / 10 + 5e-10, 4)
             AS order_once_cost,
           ROUND(f[nn + 1] / (nn * 50.0) + 5e-12, 6) AS vs_daily_ratio
    FROM folded
"""


@register(
    "q680_wagner_whitin",
    _Q680_ORACLE,
    doc="Wagner-Whitin dynamic lot sizing: daily demand, setup 50, "
    "holding 0.1/unit-day, the O(T^2) DP as a fold whose inner min "
    "runs on prefix sums of d and t*d — the exact plan that EOQ "
    "(q586) and the newsvendor (q417) approximate.",
)
def q680(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("dem")
    ).select(
        F.row_number().over(Window.orderBy("d")).alias("t"), "dem"
    )
    wo = Window.orderBy("t")
    cums = daily.select(
        "t",
        F.sum("dem").over(wo).alias("cd"),
        F.sum(F.col("t") * F.col("dem")).over(wo).alias("cud"),
    )
    arrs = cums.agg(
        F.count(F.lit(1)).cast("int").alias("nn"),
        F.concat(
            F.array(F.lit(0.0)),
            F.transform(
                F.array_sort(F.collect_list(F.struct("t", "cd"))),
                lambda s: s["cd"],
            ),
        ).alias("sd"),
        F.concat(
            F.array(F.lit(0.0)),
            F.transform(
                F.array_sort(F.collect_list(F.struct("t", "cud"))),
                lambda s: s["cud"],
            ),
        ).alias("sud"),
    )
    folded = arrs.select("nn", "sd", "sud", F.expr(_WW_SPARK).alias("f"))
    fT = F.element_at("f", F.col("nn") + 1)
    return folded.select(
        F.col("nn").cast("bigint").alias("n_days"),
        F.round(fT + F.lit(5e-10), 4).alias("optimal_cost"),
        F.round(F.col("nn") * 50.0 + F.lit(5e-10), 4).alias(
            "order_daily_cost"
        ),
        F.round(
            50
            + (
                F.element_at("sud", F.col("nn") + 1)
                - F.element_at("sd", F.col("nn") + 1)
            )
            / 10
            + F.lit(5e-10),
            4,
        ).alias("order_once_cost"),
        r6(fT / (F.col("nn") * 50.0)).alias("vs_daily_ratio"),
    )


# ---------------------------------------------------------------------------
# Q681 — Hamming(7,4) encode, corrupt, syndrome-decode
# ---------------------------------------------------------------------------
# Customer-key nibbles encoded as Hamming(7,4) codewords, one bit
# flipped at a hash-chosen position, then syndrome decoding locates
# and corrects the flip — parity arithmetic mod 2 end to end, the
# ECC layer under every storage format, verified to recover 100%
# of single-bit errors.
_Q681_ORACLE = """
    WITH nib AS MATERIALIZED (
      SELECT c_custkey AS ck,
             CAST(FLOOR(c_custkey / 8) % 2 AS BIGINT) AS d1,
             CAST(FLOOR(c_custkey / 4) % 2 AS BIGINT) AS d2,
             CAST(FLOOR(c_custkey / 2) % 2 AS BIGINT) AS d3,
             CAST(c_custkey % 2 AS BIGINT) AS d4,
             1 + ((c_custkey * 2654435761) % 4294967296) % 7 AS epos
      FROM (SELECT c_custkey,
                   ROW_NUMBER() OVER (ORDER BY c_custkey) AS rn
            FROM customer)
      WHERE rn <= 200
    ), enc AS MATERIALIZED (
      SELECT ck, d1, d2, d3, d4, epos,
             (d1 + d2 + d4) % 2 AS p1,
             (d1 + d3 + d4) % 2 AS p2,
             (d2 + d3 + d4) % 2 AS p3
      FROM nib
    ), corrupted AS MATERIALIZED (
      SELECT ck, d1, d2, d3, d4, epos,
             (p1 + CASE WHEN epos = 1 THEN 1 ELSE 0 END) % 2 AS c1,
             (p2 + CASE WHEN epos = 2 THEN 1 ELSE 0 END) % 2 AS c2,
             (d1 + CASE WHEN epos = 3 THEN 1 ELSE 0 END) % 2 AS c3,
             (p3 + CASE WHEN epos = 4 THEN 1 ELSE 0 END) % 2 AS c4,
             (d2 + CASE WHEN epos = 5 THEN 1 ELSE 0 END) % 2 AS c5,
             (d3 + CASE WHEN epos = 6 THEN 1 ELSE 0 END) % 2 AS c6,
             (d4 + CASE WHEN epos = 7 THEN 1 ELSE 0 END) % 2 AS c7
      FROM enc
    ), decoded AS (
      SELECT ck, d1, d2, d3, d4, epos,
             (c1 + c3 + c5 + c7) % 2
               + 2 * ((c2 + c3 + c6 + c7) % 2)
               + 4 * ((c4 + c5 + c6 + c7) % 2) AS syndrome,
             c3, c5, c6, c7
      FROM corrupted
    ), fixed AS (
      SELECT ck, d1, d2, d3, d4, epos, syndrome,
             (c3 + CASE WHEN syndrome = 3 THEN 1 ELSE 0 END) % 2 AS f1,
             (c5 + CASE WHEN syndrome = 5 THEN 1 ELSE 0 END) % 2 AS f2,
             (c6 + CASE WHEN syndrome = 6 THEN 1 ELSE 0 END) % 2 AS f3,
             (c7 + CASE WHEN syndrome = 7 THEN 1 ELSE 0 END) % 2 AS f4
      FROM decoded
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_codewords,
           CAST(SUM(CASE WHEN f1 = d1 AND f2 = d2 AND f3 = d3
                          AND f4 = d4 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_corrected,
           CAST(SUM(CASE WHEN syndrome = epos THEN 1 ELSE 0 END)
                AS BIGINT) AS n_syndrome_located,
           MIN(CASE WHEN f1 = d1 AND f2 = d2 AND f3 = d3 AND f4 = d4
                    THEN 1 ELSE 0 END) = 1 AS all_recovered,
           CAST(COUNT(DISTINCT epos) AS BIGINT) AS distinct_error_positions
    FROM fixed
"""


@register(
    "q681_hamming_code",
    _Q681_ORACLE,
    doc="Hamming(7,4) round trip: customer-key nibbles encoded with "
    "three parity bits, one hash-chosen bit flipped, syndrome "
    "decoding locating and correcting every single-bit error — "
    "mod-2 parity arithmetic end to end, the ECC under storage "
    "formats beside CRC (q666) and checksums (q208).",
)
def q681(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    nib = (
        c.select(
            "c_custkey",
            F.row_number().over(Window.orderBy("c_custkey")).alias("rn"),
        )
        .filter(F.col("rn") <= 200)
        .select(
            F.col("c_custkey").alias("ck"),
            (F.floor(F.col("c_custkey") / 8) % 2).cast("bigint").alias("d1"),
            (F.floor(F.col("c_custkey") / 4) % 2).cast("bigint").alias("d2"),
            (F.floor(F.col("c_custkey") / 2) % 2).cast("bigint").alias("d3"),
            (F.col("c_custkey") % 2).cast("bigint").alias("d4"),
            (
                1 + ((F.col("c_custkey") * 2654435761) % 4294967296) % 7
            ).alias("epos"),
        )
    )
    enc = nib.select(
        "*",
        ((F.col("d1") + F.col("d2") + F.col("d4")) % 2).alias("p1"),
        ((F.col("d1") + F.col("d3") + F.col("d4")) % 2).alias("p2"),
        ((F.col("d2") + F.col("d3") + F.col("d4")) % 2).alias("p3"),
    )
    flip = lambda col, pos: (  # noqa: E731
        (col + F.when(F.col("epos") == pos, 1).otherwise(0)) % 2
    )
    corrupted = enc.select(
        "ck",
        "d1",
        "d2",
        "d3",
        "d4",
        "epos",
        flip(F.col("p1"), 1).alias("c1"),
        flip(F.col("p2"), 2).alias("c2"),
        flip(F.col("d1"), 3).alias("c3"),
        flip(F.col("p3"), 4).alias("c4"),
        flip(F.col("d2"), 5).alias("c5"),
        flip(F.col("d3"), 6).alias("c6"),
        flip(F.col("d4"), 7).alias("c7"),
    )
    syn = (
        (F.col("c1") + F.col("c3") + F.col("c5") + F.col("c7")) % 2
        + 2 * ((F.col("c2") + F.col("c3") + F.col("c6") + F.col("c7")) % 2)
        + 4 * ((F.col("c4") + F.col("c5") + F.col("c6") + F.col("c7")) % 2)
    )
    decoded = corrupted.select(
        "ck", "d1", "d2", "d3", "d4", "epos", syn.alias("syndrome"),
        "c3", "c5", "c6", "c7",
    )
    unflip = lambda col, pos: (  # noqa: E731
        (col + F.when(F.col("syndrome") == pos, 1).otherwise(0)) % 2
    )
    fixed = decoded.select(
        "d1",
        "d2",
        "d3",
        "d4",
        "epos",
        "syndrome",
        unflip(F.col("c3"), 3).alias("f1"),
        unflip(F.col("c5"), 5).alias("f2"),
        unflip(F.col("c6"), 6).alias("f3"),
        unflip(F.col("c7"), 7).alias("f4"),
    )
    ok = (
        (F.col("f1") == F.col("d1"))
        & (F.col("f2") == F.col("d2"))
        & (F.col("f3") == F.col("d3"))
        & (F.col("f4") == F.col("d4"))
    )
    return fixed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_codewords"),
        F.sum(F.when(ok, 1).otherwise(0)).cast("bigint").alias("n_corrected"),
        F.sum(F.when(F.col("syndrome") == F.col("epos"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_syndrome_located"),
        (F.min(F.when(ok, 1).otherwise(0)) == 1).alias("all_recovered"),
        F.countDistinct("epos").cast("bigint").alias(
            "distinct_error_positions"
        ),
    )


# ---------------------------------------------------------------------------
# Q682 — ridge regression shrinkage path (closed form, 2 regressors)
# ---------------------------------------------------------------------------
# The q659 two-regressor system solved with an L2 penalty: b(lam) =
# (S + lam I)^-1 s_y by exact 2x2 inversion for lam in {0, 1, 10,
# 100} — the shrinkage path showing coefficients contracting toward
# zero, the regression face of Ledoit-Wolf covariance shrinkage
# (q626).
_Q682_ORACLE = """
    WITH u AS MATERIALIZED (
      SELECT ROUND(c.c_acctbal * 100) / 1e5 AS x1,
             CAST(c.c_nationkey % 5 AS DOUBLE) AS x2,
             COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0) / 1e6 AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_nationkey, c.c_acctbal
    ), m AS (
      SELECT AVG(x1) AS mx1, AVG(x2) AS mx2, AVG(y) AS my FROM u
    ), s AS (
      SELECT SUM((x1 - m.mx1) * (x1 - m.mx1)) AS s11,
             SUM((x2 - m.mx2) * (x2 - m.mx2)) AS s22,
             SUM((x1 - m.mx1) * (x2 - m.mx2)) AS s12,
             SUM((x1 - m.mx1) * (y - m.my)) AS s1y,
             SUM((x2 - m.mx2) * (y - m.my)) AS s2y,
             COUNT(*) AS n
      FROM u, m GROUP BY m.mx1, m.mx2, m.my
    ), lams AS (
      SELECT UNNEST([CAST(0 AS DOUBLE), 1, 10, 100]) AS lam
    ), path AS (
      SELECT l.lam,
             ((s.s22 + l.lam * s.n) * s.s1y - s.s12 * s.s2y)
               / ((s.s11 + l.lam * s.n) * (s.s22 + l.lam * s.n)
                  - s.s12 * s.s12) AS b1,
             ((s.s11 + l.lam * s.n) * s.s2y - s.s12 * s.s1y)
               / ((s.s11 + l.lam * s.n) * (s.s22 + l.lam * s.n)
                  - s.s12 * s.s12) AS b2
      FROM lams l, s
    ), base AS (
      SELECT SQRT(b1 * b1 + b2 * b2) AS norm0 FROM path WHERE lam = 0
    )
    SELECT ROUND(p.lam + 5e-12, 6) AS lam,
           ROUND(p.b1 + 5e-12, 6) AS beta_balance,
           ROUND(p.b2 + 5e-12, 6) AS beta_bloc,
           ROUND(SQRT(p.b1 * p.b1 + p.b2 * p.b2) / b.norm0 + 5e-12, 6)
             AS shrinkage_ratio
    FROM path p, base b
    ORDER BY p.lam
"""


@register(
    "q682_ridge_path",
    _Q682_ORACLE,
    doc="Ridge shrinkage path: the two-regressor normal equations "
    "solved with (S + lam n I)^-1 by exact 2x2 inversion for lam = "
    "0, 1, 10, 100 — coefficients contracting toward zero, the "
    "regression counterpart of Ledoit-Wolf shrinkage (q626) over "
    "the OLS of q659.",
)
def q682(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    u = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_nationkey", "c_acctbal")
        .agg(
            (
                F.coalesce(F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0))
                / 1e6
            ).alias("y")
        )
        .select(
            (F.round(F.col("c_acctbal") * 100) / 1e5).alias("x1"),
            (F.col("c_nationkey") % 5).cast("double").alias("x2"),
            "y",
        )
    )
    m = u.agg(
        F.avg("x1").alias("mx1"), F.avg("x2").alias("mx2"), F.avg("y").alias("my")
    )
    um = u.crossJoin(F.broadcast(m))
    s = um.agg(
        F.sum((F.col("x1") - F.col("mx1")) * (F.col("x1") - F.col("mx1"))).alias(
            "s11"
        ),
        F.sum((F.col("x2") - F.col("mx2")) * (F.col("x2") - F.col("mx2"))).alias(
            "s22"
        ),
        F.sum((F.col("x1") - F.col("mx1")) * (F.col("x2") - F.col("mx2"))).alias(
            "s12"
        ),
        F.sum((F.col("x1") - F.col("mx1")) * (F.col("y") - F.col("my"))).alias(
            "s1y"
        ),
        F.sum((F.col("x2") - F.col("mx2")) * (F.col("y") - F.col("my"))).alias(
            "s2y"
        ),
        F.count(F.lit(1)).alias("n"),
    )
    lams = spark.createDataFrame(
        [(0.0,), (1.0,), (10.0,), (100.0,)], ["lam"]
    )
    a11 = F.col("s11") + F.col("lam") * F.col("n")
    a22 = F.col("s22") + F.col("lam") * F.col("n")
    det = a11 * a22 - F.col("s12") * F.col("s12")
    path = F.broadcast(lams).crossJoin(F.broadcast(s)).select(
        "lam",
        ((a22 * F.col("s1y") - F.col("s12") * F.col("s2y")) / det).alias("b1"),
        ((a11 * F.col("s2y") - F.col("s12") * F.col("s1y")) / det).alias("b2"),
    ).localCheckpoint(eager=False)
    base = path.filter(F.col("lam") == 0).select(
        F.sqrt(F.col("b1") * F.col("b1") + F.col("b2") * F.col("b2")).alias(
            "norm0"
        )
    )
    return (
        path.crossJoin(F.broadcast(base))
        .select(
            r6(F.col("lam")).alias("lam"),
            r6(F.col("b1")).alias("beta_balance"),
            r6(F.col("b2")).alias("beta_bloc"),
            r6(
                F.sqrt(F.col("b1") * F.col("b1") + F.col("b2") * F.col("b2"))
                / F.col("norm0")
            ).alias("shrinkage_ratio"),
        )
        .orderBy("lam")
    )


# ---------------------------------------------------------------------------
# Q683 — ROC convex hull and cost-sensitive operating point
# ---------------------------------------------------------------------------
# Balance scoring above-median spenders: 21 ROC points,
# hull membership decided by the no-point-above-any-chord test
# (O(n^3), exact), trapezoid AUC, and the operating point
# maximizing tpr - 2 fpr — the cost-sensitive selection the raw
# AUC (q75) can't make.
_Q683_ORACLE = """
    WITH base AS MATERIALIZED (
      SELECT c.c_custkey AS ck, c.c_acctbal AS bal,
             COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0) AS sp
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_acctbal
    ), scored AS MATERIALIZED (
      SELECT NTILE(20) OVER (ORDER BY bal DESC, ck) AS ventile,
             CASE WHEN NTILE(2) OVER (ORDER BY sp, ck) = 2
                  THEN 1 ELSE 0 END AS pos
      FROM base
    ), tot AS (
      SELECT SUM(pos) AS np, SUM(1 - pos) AS nn FROM scored
    ), roc AS MATERIALIZED (
      SELECT g.v AS thr,
             SUM(CASE WHEN s.ventile <= g.v AND s.pos = 1
                      THEN 1 ELSE 0 END) * 1.0 / t.np AS tpr,
             SUM(CASE WHEN s.ventile <= g.v AND s.pos = 0
                      THEN 1 ELSE 0 END) * 1.0 / t.nn AS fpr
      FROM scored s, tot t,
           (SELECT UNNEST(range(0, 21)) AS v) g
      GROUP BY g.v, t.np, t.nn
    ), hull AS MATERIALIZED (
      SELECT r.thr, r.tpr, r.fpr,
             NOT EXISTS (
               SELECT 1 FROM roc a, roc b
               WHERE a.fpr < r.fpr AND b.fpr > r.fpr
                 AND (r.tpr - a.tpr) * (b.fpr - a.fpr)
                     < (b.tpr - a.tpr) * (r.fpr - a.fpr)
                       - 1e-12 * (b.fpr - a.fpr)
             ) AS on_hull
      FROM roc r
    ), strips AS (
      SELECT (fpr - LAG(fpr) OVER (ORDER BY fpr, tpr))
               * (tpr + LAG(tpr) OVER (ORDER BY fpr, tpr)) / 2 AS st
      FROM roc
    ), auc AS (
      SELECT SUM(st) AS a FROM strips
    ), best AS (
      SELECT thr, tpr, fpr FROM roc
      ORDER BY ROUND(tpr - 2 * fpr + 5e-12, 6) DESC, thr LIMIT 1
    )
    SELECT CAST((SELECT COUNT(*) FROM roc) AS BIGINT) AS n_points,
           CAST((SELECT SUM(CASE WHEN on_hull THEN 1 ELSE 0 END)
                 FROM hull) AS BIGINT) AS hull_size,
           ROUND((SELECT a FROM auc) + 5e-12, 6) AS auc_trapezoid,
           CAST(b.thr AS BIGINT) AS best_threshold_ventile,
           ROUND(b.tpr + 5e-12, 6) AS best_tpr,
           ROUND(b.fpr + 5e-12, 6) AS best_fpr
    FROM best b
"""


@register(
    "q683_roc_hull",
    _Q683_ORACLE,
    doc="ROC convex hull: 21 threshold points from balance scoring "
    "'above-median spender', hull membership by the exact no-point-above-"
    "chord test, trapezoid AUC, and the tpr - 2 fpr cost-optimal "
    "operating point — the cost-sensitive layer above AUC (q75) "
    "and calibration (q92).",
)
def q683(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    scored = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            F.coalesce(
                F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0)
            ).alias("sp")
        )
        .select(
            F.ntile(20)
            .over(Window.orderBy(F.desc("c_acctbal"), F.col("c_custkey")))
            .alias("ventile"),
            F.when(
                F.ntile(2).over(Window.orderBy("sp", "c_custkey")) == 2, 1
            )
            .otherwise(0)
            .alias("pos"),
        )
        # lineage cut (plan audit: 30 scans with persist-only lineage)
        .localCheckpoint(eager=False)
    )
    tot = scored.agg(
        F.sum("pos").alias("np"), F.sum(1 - F.col("pos")).alias("nn")
    )
    grid = spark.range(0, 21).select(F.col("id").alias("v"))
    roc = (
        scored.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(grid))
        .groupBy("v", "np", "nn")
        .agg(
            (
                F.sum(
                    F.when(
                        (F.col("ventile") <= F.col("v")) & (F.col("pos") == 1),
                        1,
                    ).otherwise(0)
                )
                * 1.0
                / F.col("np")
            ).alias("tpr"),
            (
                F.sum(
                    F.when(
                        (F.col("ventile") <= F.col("v")) & (F.col("pos") == 0),
                        1,
                    ).otherwise(0)
                )
                * 1.0
                / F.col("nn")
            ).alias("fpr"),
        )
        .select(F.col("v").alias("thr"), "tpr", "fpr")
        .localCheckpoint(eager=False)
    )
    a = roc.select(
        F.col("fpr").alias("afpr"), F.col("tpr").alias("atpr")
    )
    b = roc.select(
        F.col("fpr").alias("bfpr"), F.col("tpr").alias("btpr")
    )
    viol = (
        roc.join(a, F.col("afpr") < F.col("fpr"))
        .join(b, F.col("bfpr") > F.col("fpr"))
        .filter(
            (F.col("tpr") - F.col("atpr")) * (F.col("bfpr") - F.col("afpr"))
            < (F.col("btpr") - F.col("atpr"))
            * (F.col("fpr") - F.col("afpr"))
            - 1e-12 * (F.col("bfpr") - F.col("afpr"))
        )
        .select("thr")
        .distinct()
    )
    hull_size = roc.join(viol, "thr", "left_anti").agg(
        F.count(F.lit(1)).alias("hs")
    )
    wroc = Window.orderBy("fpr", "tpr")
    auc = roc.select(
        (
            (F.col("fpr") - F.lag("fpr").over(wroc))
            * (F.col("tpr") + F.lag("tpr").over(wroc))
            / 2
        ).alias("strip")
    ).agg(F.sum("strip").alias("a"))
    best = (
        roc.select(
            "thr",
            "tpr",
            "fpr",
            r6(F.col("tpr") - 2 * F.col("fpr")).alias("m"),
        )
        .orderBy(F.desc("m"), "thr")
        .limit(1)
    )
    npts = roc.agg(F.count(F.lit(1)).alias("np_"))
    return (
        best.crossJoin(F.broadcast(npts))
        .crossJoin(F.broadcast(hull_size))
        .crossJoin(F.broadcast(auc))
        .select(
            F.col("np_").cast("bigint").alias("n_points"),
            F.col("hs").cast("bigint").alias("hull_size"),
            r6(F.col("a")).alias("auc_trapezoid"),
            F.col("thr").cast("bigint").alias("best_threshold_ventile"),
            r6(F.col("tpr")).alias("best_tpr"),
            r6(F.col("fpr")).alias("best_fpr"),
        )
    )
