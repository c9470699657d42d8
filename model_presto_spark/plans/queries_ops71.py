"""Conformance queries batch #71 (q549+) — statistical disclosure
control, skyline onion layers, subword complexity, Moran's I, and
the exact sign test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q549 — cell suppression for statistical disclosure control
# ---------------------------------------------------------------------------
# Publishing the nation x segment count table with margins: cells
# under 5 are primary-suppressed, but any row or column left with
# EXACTLY ONE suppressed cell leaks it back through the margin, so a
# complementary cell (the smallest surviving one) must go too — the
# SDC audit counts both waves and the information destroyed, the
# publication-side privacy lever beside k-anonymity (q89) and
# t-closeness (q461).
_Q549_ORACLE = """
    WITH t AS MATERIALIZED (
      SELECT c_nationkey AS r, c_mktsegment AS s, COUNT(*) AS o
      FROM customer GROUP BY 1, 2
    ), prim AS MATERIALIZED (
      SELECT r, s, o, CASE WHEN o < 5 THEN 1 ELSE 0 END AS sup
      FROM t
    ), rowrisk AS (
      SELECT r FROM prim GROUP BY r HAVING SUM(sup) = 1
    ), colrisk AS (
      SELECT s FROM prim GROUP BY s HAVING SUM(sup) = 1
    ), comp AS (
      SELECT r, s FROM (
        SELECT p.r, p.s,
               ROW_NUMBER() OVER (PARTITION BY p.r
                                  ORDER BY p.o, p.s) AS rk
        FROM prim p JOIN rowrisk rr ON rr.r = p.r
        WHERE p.sup = 0
      ) WHERE rk = 1
      UNION
      SELECT r, s FROM (
        SELECT p.r, p.s,
               ROW_NUMBER() OVER (PARTITION BY p.s
                                  ORDER BY p.o, p.r) AS rk
        FROM prim p JOIN colrisk cr ON cr.s = p.s
        WHERE p.sup = 0
      ) WHERE rk = 1
    )
    SELECT CAST((SELECT COUNT(*) FROM t) AS BIGINT) AS n_cells,
           CAST((SELECT SUM(sup) FROM prim) AS BIGINT) AS n_primary,
           CAST((SELECT COUNT(*) FROM rowrisk) AS BIGINT) AS rows_at_risk,
           CAST((SELECT COUNT(*) FROM colrisk) AS BIGINT) AS cols_at_risk,
           CAST((SELECT COUNT(*) FROM comp) AS BIGINT) AS n_complementary,
           ROUND(((SELECT SUM(sup) FROM prim)
                  + (SELECT COUNT(*) FROM comp)) * 1.0
                 / (SELECT COUNT(*) FROM t) + 5e-12, 6) AS suppressed_frac
"""


@register(
    "q549_cell_suppression",
    _Q549_ORACLE,
    doc="Cell suppression for published count tables: primary-"
    "suppress cells under 5, then complementary-suppress the "
    "smallest surviving cell in every row/column a margin would "
    "otherwise reveal (exactly one suppression) — the disclosure-"
    "control wave count beside k-anonymity (q89) and t-closeness "
    "(q461).",
)
def q549(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    t = c.groupBy(
        F.col("c_nationkey").alias("r"), F.col("c_mktsegment").alias("s")
    ).agg(F.count(F.lit(1)).alias("o"))
    prim = t.select(
        "r", "s", "o", F.when(F.col("o") < 5, 1).otherwise(0).alias("sup")
    ).localCheckpoint(eager=False)
    rowrisk = prim.groupBy("r").agg(F.sum("sup").alias("ns")).filter(
        F.col("ns") == 1
    ).select("r")
    colrisk = prim.groupBy("s").agg(F.sum("sup").alias("ns")).filter(
        F.col("ns") == 1
    ).select("s")
    comp_r = (
        prim.join(rowrisk, "r")
        .filter(F.col("sup") == 0)
        .select(
            "r",
            "s",
            F.row_number()
            .over(Window.partitionBy("r").orderBy("o", "s"))
            .alias("rk"),
        )
        .filter(F.col("rk") == 1)
        .select("r", "s")
    )
    comp_c = (
        prim.join(colrisk, "s")
        .filter(F.col("sup") == 0)
        .select(
            "r",
            "s",
            F.row_number()
            .over(Window.partitionBy("s").orderBy("o", "r"))
            .alias("rk"),
        )
        .filter(F.col("rk") == 1)
        .select("r", "s")
    )
    comp = comp_r.unionAll(comp_c).distinct()
    stats = (
        t.agg(F.count(F.lit(1)).alias("n_cells"))
        .crossJoin(prim.agg(F.sum("sup").alias("n_primary")))
        .crossJoin(rowrisk.agg(F.count(F.lit(1)).alias("rows_at_risk")))
        .crossJoin(colrisk.agg(F.count(F.lit(1)).alias("cols_at_risk")))
        .crossJoin(comp.agg(F.count(F.lit(1)).alias("n_complementary")))
    )
    return stats.select(
        F.col("n_cells").cast("bigint").alias("n_cells"),
        F.col("n_primary").cast("bigint").alias("n_primary"),
        F.col("rows_at_risk").cast("bigint").alias("rows_at_risk"),
        F.col("cols_at_risk").cast("bigint").alias("cols_at_risk"),
        F.col("n_complementary").cast("bigint").alias("n_complementary"),
        r6(
            (F.col("n_primary") + F.col("n_complementary"))
            * 1.0
            / F.col("n_cells")
        ).alias("suppressed_frac"),
    )


# ---------------------------------------------------------------------------
# Q550 — skyline onion layers (multi-criteria depth)
# ---------------------------------------------------------------------------
# "Cheap AND early" orders on a deterministic sample: layer 1 is the
# classic skyline (q203), layers 2 and 3 peel after removing the
# previous layer — the onion depth that multi-criteria ranking and
# progressive recommendation use.  Dominance = both dims <=, one
# strict; anti-join per layer.
_Q550_ORACLE = """
    WITH pts AS MATERIALIZED (
      SELECT o_orderkey AS id,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS p,
             epoch_us(o_orderdate) AS d
      FROM orders WHERE o_orderkey % 200 = 0
    ), l1 AS MATERIALIZED (
      SELECT a.* FROM pts a
      WHERE NOT EXISTS (
        SELECT 1 FROM pts b
        WHERE b.p <= a.p AND b.d <= a.d AND (b.p < a.p OR b.d < a.d))
    ), r1 AS MATERIALIZED (
      SELECT p.* FROM pts p
      WHERE NOT EXISTS (SELECT 1 FROM l1 WHERE l1.id = p.id)
    ), l2 AS MATERIALIZED (
      SELECT a.* FROM r1 a
      WHERE NOT EXISTS (
        SELECT 1 FROM r1 b
        WHERE b.p <= a.p AND b.d <= a.d AND (b.p < a.p OR b.d < a.d))
    ), r2 AS MATERIALIZED (
      SELECT p.* FROM r1 p
      WHERE NOT EXISTS (SELECT 1 FROM l2 WHERE l2.id = p.id)
    ), l3 AS (
      SELECT a.* FROM r2 a
      WHERE NOT EXISTS (
        SELECT 1 FROM r2 b
        WHERE b.p <= a.p AND b.d <= a.d AND (b.p < a.p OR b.d < a.d))
    ), layers AS (
      SELECT 1 AS layer, COUNT(*) AS n, MIN(p) AS min_price
      FROM l1
      UNION ALL SELECT 2, COUNT(*), MIN(p) FROM l2
      UNION ALL SELECT 3, COUNT(*), MIN(p) FROM l3
    )
    SELECT CAST(layer AS BIGINT) AS layer,
           CAST(n AS BIGINT) AS n_points,
           ROUND(min_price / 100.0 + 5e-8, 2) AS min_price_usd,
           CAST((SELECT COUNT(*) FROM pts) AS BIGINT) AS n_sample
    FROM layers ORDER BY layer
"""


@register(
    "q550_skyline_layers",
    _Q550_ORACLE,
    doc="Skyline onion peeling: three successive non-dominated layers "
    "of (price, date)-minimal orders via anti-joins on the "
    "dominance relation — the multi-criteria depth structure that "
    "extends the single skyline (q203) the way k-core (q126) "
    "extends degree.",
)
def q550(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 200 == 0)
    pts = o.select(
        F.col("o_orderkey").alias("id"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("p"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("d"),
        # lineage cut: each skyline layer peels the previous layer off,
        # so persist() lineage re-nests the base per layer (plan audit:
        # 65 scans)
    ).localCheckpoint(eager=False)

    def skyline(df):
        b = df.select(
            F.col("p").alias("bp"), F.col("d").alias("bd")
        )
        dominated = df.join(
            F.broadcast(b),
            (F.col("bp") <= F.col("p"))
            & (F.col("bd") <= F.col("d"))
            & ((F.col("bp") < F.col("p")) | (F.col("bd") < F.col("d"))),
            "left_semi",
        )
        return df.join(dominated.select("id"), "id", "left_anti")

    l1 = skyline(pts).localCheckpoint(eager=True)
    r1 = pts.join(l1.select("id"), "id", "left_anti").localCheckpoint(eager=True)
    l2 = skyline(r1).localCheckpoint(eager=True)
    r2 = r1.join(l2.select("id"), "id", "left_anti").localCheckpoint(eager=True)
    l3 = skyline(r2)
    ns = pts.agg(F.count(F.lit(1)).alias("n_sample"))

    def srow(df, layer):
        return df.agg(
            F.lit(layer).alias("layer"),
            F.count(F.lit(1)).alias("n"),
            F.min("p").alias("min_price"),
        )

    layers = srow(l1, 1).unionAll(srow(l2, 2)).unionAll(srow(l3, 3))
    return (
        layers.crossJoin(F.broadcast(ns))
        .select(
            F.col("layer").cast("bigint").alias("layer"),
            F.col("n").cast("bigint").alias("n_points"),
            F.round(F.col("min_price") / 100.0 + F.lit(5e-8), 2).alias(
                "min_price_usd"
            ),
            F.col("n_sample").cast("bigint").alias("n_sample"),
        )
        .orderBy("layer")
    )


# ---------------------------------------------------------------------------
# Q551 — subword complexity profile (distinct k-grams)
# ---------------------------------------------------------------------------
# Distinct character k-grams of the sampled corpus for k = 1..4 and
# the growth ratio ln(D_k / D_{k-1}) — the (topological-entropy)
# complexity profile that separates repetitive from rich text,
# complementing LZ78 (q447) and Shannon entropy (q143) at the
# sequence level.
_Q551_ORACLE = """
    WITH docs AS MATERIALIZED (
      SELECT lower(text) AS t FROM documents WHERE doc_id % 11 = 0
    ), grams AS MATERIALIZED (
      SELECT k.k, substr(d.t, g.i, k.k) AS gram
      FROM docs d,
           (SELECT UNNEST(generate_series(1, 4)) AS k) k,
           LATERAL (SELECT UNNEST(generate_series(
             1, GREATEST(length(d.t) - k.k + 1, 0))) AS i) g
    ), dcount AS (
      SELECT k, COUNT(DISTINCT gram) AS dk, COUNT(*) AS total
      FROM grams GROUP BY k
    )
    SELECT CAST(k AS BIGINT) AS k,
           CAST(dk AS BIGINT) AS distinct_kgrams,
           CAST(total AS BIGINT) AS total_kgrams,
           ROUND(LN(dk * 1.0) / k + 5e-12, 6) AS entropy_rate_bound,
           ROUND(LN(dk * 1.0 / LAG(dk) OVER (ORDER BY k)) + 5e-12, 6)
             AS log_growth
    FROM dcount ORDER BY k
"""


@register(
    "q551_subword_complexity",
    _Q551_ORACLE,
    doc="Subword complexity profile: distinct character k-grams for "
    "k = 1..4 with ln(D_k)/k entropy-rate bounds and consecutive "
    "log growth — the sequence-complexity curve beside LZ78 (q447) "
    "and character entropy (q143), flat growth = templated text.",
)
def q551(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 11 == 0)
    t = docs.select(F.lower("text").alias("t"))
    ks = spark.range(1, 5).select(F.col("id").cast("int").alias("k"))
    # Build grams via a position sequence sliced with expr
    grams = (
        t.crossJoin(F.broadcast(ks))
        .filter(F.length("t") >= F.col("k"))
        .select(
            "k",
            F.explode_outer(
                F.expr(
                    "transform(sequence(1, length(t) - k + 1),"
                    " i -> substr(t, i, k))"
                )
            ).alias("gram"),
        )
    )
    dcount = grams.groupBy("k").agg(
        F.count_distinct("gram").alias("dk"), F.count(F.lit(1)).alias("total")
    )
    w = Window.orderBy("k")
    return dcount.select(
        F.col("k").cast("bigint").alias("k"),
        F.col("dk").cast("bigint").alias("distinct_kgrams"),
        F.col("total").cast("bigint").alias("total_kgrams"),
        r6(F.log(F.col("dk") * 1.0) / F.col("k")).alias("entropy_rate_bound"),
        r6(F.log(F.col("dk") * 1.0 / F.lag("dk").over(w))).alias("log_growth"),
    ).orderBy("k")


# ---------------------------------------------------------------------------
# Q552 — Moran's I spatial autocorrelation on the contact graph
# ---------------------------------------------------------------------------
# Mean customer balance per nation as the variable, the 25-node
# modulo graph as the spatial weight matrix: global Moran's I
# (n/W) sum w z_i z_j / sum z^2 against its null expectation
# -1/(n-1), plus the five strongest local Moran hotspots — spatial
# autocorrelation joining the geo stack (q48/q56) to the statistics
# stack.
_Q552_ORACLE = """
    WITH val AS MATERIALIZED (
      SELECT c_nationkey % 25 AS nd, AVG(c_acctbal) AS v
      FROM customer GROUP BY c_nationkey % 25
    ), z AS MATERIALIZED (
      SELECT nd, v - (SELECT AVG(v) FROM val) AS z FROM val
    ), e0 AS (
      SELECT DISTINCT CAST(o_custkey % 25 AS BIGINT) AS u,
             CAST(o_orderkey % 25 AS BIGINT) AS w
      FROM orders WHERE o_custkey % 25 <> o_orderkey % 25
    ), e AS MATERIALIZED (
      SELECT u, w FROM e0 UNION SELECT w, u FROM e0
    ), cross_term AS (
      SELECT SUM(za.z * zb.z) AS num, COUNT(*) AS wsum
      FROM e JOIN z za ON za.nd = e.u JOIN z zb ON zb.nd = e.w
    ), m2 AS (
      SELECT SUM(z * z) AS ss, COUNT(*) AS n FROM z
    ), loc AS (
      SELECT za.nd, za.z,
             za.z * SUM(zb.z) * (SELECT n FROM m2)
               / (SELECT ss FROM m2) AS local_i
      FROM e JOIN z za ON za.nd = e.u JOIN z zb ON zb.nd = e.w
      GROUP BY za.nd, za.z
    )
    SELECT CAST(loc.nd AS BIGINT) AS node,
           ROUND(loc.local_i + 5e-12, 6) AS local_moran,
           ROUND((SELECT n FROM m2) * ct.num
                 / (ct.wsum * (SELECT ss FROM m2)) + 5e-12, 6)
             AS global_moran_i,
           ROUND(-1.0 / ((SELECT n FROM m2) - 1) + 5e-12, 6)
             AS null_expectation
    FROM loc, cross_term ct
    ORDER BY ABS(loc.local_i) DESC, loc.nd LIMIT 5
"""


@register(
    "q552_morans_i",
    _Q552_ORACLE,
    doc="Moran's I on the modulo contact graph with nation mean "
    "balances: global I vs the -1/(n-1) null and the five strongest "
    "local Moran values — spatial autocorrelation connecting the "
    "geo stack (q48/q56) to the dependence stack (q418/q376).",
)
def q552(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    val = c.groupBy((F.col("c_nationkey") % 25).alias("nd")).agg(
        F.avg("c_acctbal").alias("v")
    )
    mu = val.agg(F.avg("v").alias("mu"))
    z = val.crossJoin(F.broadcast(mu)).select(
        "nd", (F.col("v") - F.col("mu")).alias("z")
    ).localCheckpoint(eager=False)
    e0 = (
        o.select(
            (F.col("o_custkey") % 25).cast("bigint").alias("u"),
            (F.col("o_orderkey") % 25).cast("bigint").alias("w"),
        )
        .filter(F.col("u") != F.col("w"))
        .distinct()
    )
    e = e0.unionAll(
        e0.select(F.col("w").alias("u"), F.col("u").alias("w"))
    ).distinct()
    za = z.select(F.col("nd").alias("u"), F.col("z").alias("zu"))
    zb = z.select(F.col("nd").alias("w"), F.col("z").alias("zw"))
    ej = e.join(F.broadcast(za), "u").join(F.broadcast(zb), "w").localCheckpoint(eager=False)
    ct = ej.agg(
        F.sum(F.col("zu") * F.col("zw")).alias("num"),
        F.count(F.lit(1)).alias("wsum"),
    )
    m2 = z.agg(F.sum(F.col("z") * F.col("z")).alias("ss"), F.count(F.lit(1)).alias("n"))
    loc = (
        ej.groupBy("u", "zu")
        .agg(F.sum("zw").alias("szw"))
        .crossJoin(F.broadcast(m2))
        .select(
            F.col("u").alias("node"),
            (
                F.col("zu") * F.col("szw") * F.col("n") / F.col("ss")
            ).alias("local_i"),
        )
    )
    gi = (
        ct.crossJoin(F.broadcast(m2))
        .select(
            (
                F.col("n") * F.col("num") / (F.col("wsum") * F.col("ss"))
            ).alias("global_i"),
            (-1.0 / (F.col("n") - 1)).alias("null_e"),
        )
    )
    return (
        loc.crossJoin(F.broadcast(gi))
        .select(
            F.col("node").cast("bigint").alias("node"),
            r6(F.col("local_i")).alias("local_moran"),
            r6(F.col("global_i")).alias("global_moran_i"),
            r6(F.col("null_e")).alias("null_expectation"),
            F.abs(F.col("local_i")).alias("ord"),
        )
        .orderBy(F.desc("ord"), "node")
        .limit(5)
        .drop("ord")
    )


# ---------------------------------------------------------------------------
# Q553 — exact sign test on paired fortnights
# ---------------------------------------------------------------------------
# The distribution-free-est test there is: signs of per-user spend
# changes between fortnights, exact two-sided binomial tail at
# p = 1/2 via log-factorial prefix sums with a max-shifted
# log-sum-exp — the assumption-free baseline under Wilcoxon (q458)
# and the t-family.
_Q553_ORACLE = """
    WITH u AS (
      SELECT user_id,
             SUM(CASE WHEN EXTRACT(day FROM ts) <= 14
                      THEN ROUND(value * 100) ELSE 0 END) AS s1,
             SUM(CASE WHEN EXTRACT(day FROM ts) > 14
                       AND EXTRACT(day FROM ts) <= 28
                      THEN ROUND(value * 100) ELSE 0 END) AS s2
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ), d AS (
      SELECT CASE WHEN s2 > s1 THEN 1 ELSE 0 END AS plus
      FROM u WHERE s2 <> s1
    ), cnt AS (
      SELECT COUNT(*) AS n, SUM(plus) AS np FROM d
    ), lf AS MATERIALIZED (
      SELECT g.k, SUM(LN(g.k)) OVER (ORDER BY g.k) AS lfact
      FROM (SELECT UNNEST(generate_series(
              1, (SELECT CAST(n AS BIGINT) FROM cnt))) AS k) g
    ), lf0 AS MATERIALIZED (
      SELECT k, lfact FROM lf UNION ALL SELECT 0, 0.0
    ), kmin AS (
      SELECT n, np, LEAST(np, n - np) AS km FROM cnt
    ), terms AS (
      SELECT la.lfact - lb.lfact - lc.lfact - kmin.n * LN(2.0) AS lt
      FROM kmin,
           (SELECT UNNEST(generate_series(
              0, (SELECT CAST(km AS BIGINT) FROM kmin))) AS x) xs
      JOIN lf0 la ON la.k = kmin.n
      JOIN lf0 lb ON lb.k = xs.x
      JOIN lf0 lc ON lc.k = kmin.n - xs.x
    ), lse AS (
      SELECT MAX(lt) AS m FROM terms
    ), pv AS (
      SELECT LEAST(2 * EXP(lse.m + LN(SUM(EXP(t.lt - lse.m)))), 1.0) AS p
      FROM terms t, lse GROUP BY lse.m
    )
    SELECT CAST(kmin.n AS BIGINT) AS n_nonzero,
           CAST(kmin.np AS BIGINT) AS n_plus,
           ROUND(kmin.np * 1.0 / kmin.n + 5e-12, 6) AS plus_share,
           ROUND((SELECT p FROM pv) + 5e-12, 6) AS p_two_sided
    FROM kmin
"""


@register(
    "q553_sign_test",
    _Q553_ORACLE,
    doc="Exact sign test on paired fortnight spends: two-sided "
    "binomial tail at p = 1/2 from log-factorial prefix sums "
    "(max-shifted log-sum-exp) — the assumption-free baseline "
    "beneath Wilcoxon (q458) and the paired t machinery.",
)
def q553(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.dayofmonth("ts") <= 14, F.round(F.col("value") * 100))
            .otherwise(0)
        ).alias("s1"),
        F.sum(
            F.when(
                (F.dayofmonth("ts") > 14) & (F.dayofmonth("ts") <= 28),
                F.round(F.col("value") * 100),
            ).otherwise(0)
        ).alias("s2"),
    )
    d = u.filter(F.col("s2") != F.col("s1")).select(
        F.when(F.col("s2") > F.col("s1"), 1).otherwise(0).alias("plus")
    )
    cnt = d.agg(F.count(F.lit(1)).alias("n"), F.sum("plus").alias("np")).localCheckpoint(eager=False)
    n_val = cnt.first()["n"]
    lf = (
        spark.range(1, n_val + 1)
        .select(F.col("id").alias("k"), F.log(F.col("id").cast("double")).alias("l"))
        .select("k", F.sum("l").over(Window.orderBy("k")).alias("lfact"))
    )
    lf0 = lf.unionAll(
        spark.range(0, 1).select(F.col("id").alias("k"), F.lit(0.0).alias("lfact"))
    ).localCheckpoint(eager=False)
    kmin = cnt.select(
        "n", "np", F.least(F.col("np"), F.col("n") - F.col("np")).alias("km")
    )
    xs = spark.range(0, n_val + 1).select(F.col("id").alias("x"))
    grid = xs.crossJoin(F.broadcast(kmin)).filter(F.col("x") <= F.col("km"))

    def lj(df, key_expr, alias):
        return df.join(
            F.broadcast(
                lf0.select(F.col("k").alias(alias + "_k"), F.col("lfact").alias(alias))
            ),
            key_expr == F.col(alias + "_k"),
        ).drop(alias + "_k")

    g = lj(grid, F.col("n"), "la")
    g = lj(g, F.col("x"), "lb")
    g = lj(g, F.col("n") - F.col("x"), "lc")
    terms = g.select(
        (
            F.col("la")
            - F.col("lb")
            - F.col("lc")
            - F.col("n") * F.log(F.lit(2.0))
        ).alias("lt")
    )
    lse = terms.agg(F.max("lt").alias("m"))
    pv = terms.crossJoin(F.broadcast(lse)).agg(
        F.least(
            2 * F.exp(F.first("m") + F.log(F.sum(F.exp(F.col("lt") - F.col("m"))))),
            F.lit(1.0),
        ).alias("p")
    )
    return kmin.crossJoin(F.broadcast(pv)).select(
        F.col("n").cast("bigint").alias("n_nonzero"),
        F.col("np").cast("bigint").alias("n_plus"),
        r6(F.col("np") * 1.0 / F.col("n")).alias("plus_share"),
        r6(F.col("p")).alias("p_two_sided"),
    )
