"""Conformance queries batch #94 (q664+) — doubly robust causal
estimation, regional concentration, CRC checksums as folds, R^2
importance decomposition, and the Cramér-von Mises test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q664 — AIPW: the doubly robust treatment-effect estimator
# ---------------------------------------------------------------------------
# AUTOMOBILE membership as treatment, spend as outcome, balance
# deciles as confounder strata: regression adjustment, IPW (q360's
# estimator), and the augmented-IPW combination m1-m0 + T(Y-m1)/e -
# (1-T)(Y-m0)/(1-e) that stays consistent if either the propensity
# or the outcome model is right — the estimator modern causal
# pipelines default to.
_Q664_ORACLE = """
    WITH u AS MATERIALIZED (
      SELECT CASE WHEN c.c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS t,
             NTILE(10) OVER (ORDER BY c.c_acctbal, c.c_custkey) AS dec,
             COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0) / 1e6 AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_mktsegment, c.c_acctbal
    ), strata AS MATERIALIZED (
      SELECT dec,
             AVG(t * 1.0) AS e,
             AVG(CASE WHEN t = 1 THEN y END) AS m1,
             AVG(CASE WHEN t = 0 THEN y END) AS m0
      FROM u GROUP BY dec
    ), joined AS MATERIALIZED (
      SELECT u.t, u.y, s.e, s.m1, s.m0
      FROM u JOIN strata s ON s.dec = u.dec
      WHERE s.e > 0 AND s.e < 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
           ROUND(AVG(m1 - m0) + 5e-12, 6) AS ate_regression,
           ROUND(AVG(t * y / e - (1 - t) * y / (1 - e)) + 5e-12, 6)
             AS ate_ipw,
           ROUND(AVG(m1 - m0
                     + t * (y - m1) / e
                     - (1 - t) * (y - m0) / (1 - e)) + 5e-12, 6)
             AS ate_aipw
    FROM joined
"""


@register(
    "q664_aipw_doubly_robust",
    _Q664_ORACLE,
    doc="Augmented IPW: regression adjustment, IPW (q360) and the "
    "doubly robust combination over balance-decile strata — "
    "consistent if either the stratified propensity or the "
    "stratified outcome means are right, gated by the positivity "
    "check (q627).",
)
def q664(spark: SparkSession, sf_dir: str) -> DataFrame:
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
            F.when(F.col("c_mktsegment") == "AUTOMOBILE", 1)
            .otherwise(0)
            .alias("t"),
            F.ntile(10)
            .over(Window.orderBy("c_acctbal", "c_custkey"))
            .alias("dec"),
            "y",
        )
        .localCheckpoint(eager=False)
    )
    strata = u.groupBy("dec").agg(
        F.avg(F.col("t") * 1.0).alias("e"),
        F.avg(F.when(F.col("t") == 1, F.col("y"))).alias("m1"),
        F.avg(F.when(F.col("t") == 0, F.col("y"))).alias("m0"),
    )
    joined = u.join(F.broadcast(strata), "dec").filter(
        (F.col("e") > 0) & (F.col("e") < 1)
    )
    t, y, e, m1, m0 = (
        F.col("t"),
        F.col("y"),
        F.col("e"),
        F.col("m1"),
        F.col("m0"),
    )
    return joined.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_units"),
        r6(F.avg(m1 - m0)).alias("ate_regression"),
        r6(F.avg(t * y / e - (1 - t) * y / (1 - e))).alias("ate_ipw"),
        r6(
            F.avg(m1 - m0 + t * (y - m1) / e - (1 - t) * (y - m0) / (1 - e))
        ).alias("ate_aipw"),
    )


# ---------------------------------------------------------------------------
# Q665 — location quotients and regional concentration
# ---------------------------------------------------------------------------
# Customer counts on the nation x segment grid: the location
# quotient LQ = (share of segment within nation) / (share of
# segment overall) flags regional specialization; the top-8 cells
# plus a Herfindahl-style concentration of each top segment across
# nations — regional economics' first diagnostic.
_Q665_ORACLE = """
    WITH cells AS MATERIALIZED (
      SELECT c_nationkey AS nk, c_mktsegment AS seg, COUNT(*) AS n
      FROM customer GROUP BY c_nationkey, c_mktsegment
    ), tot AS (
      SELECT SUM(n) AS nn FROM cells
    ), lq AS (
      SELECT c.nk, c.seg, c.n,
             (c.n * 1.0 / SUM(c.n) OVER (PARTITION BY c.nk))
               / (SUM(c.n) OVER (PARTITION BY c.seg) * 1.0
                  / (SELECT nn FROM tot)) AS lq,
             SUM(c.n) OVER (PARTITION BY c.seg) AS seg_n
      FROM cells c
    )
    SELECT nk AS nation, seg AS segment,
           CAST(n AS BIGINT) AS customers,
           ROUND(lq + 5e-12, 6) AS location_quotient,
           ROUND(n * 1.0 / seg_n + 5e-12, 6) AS share_of_segment
    FROM lq
    ORDER BY ROUND(lq + 5e-12, 6) DESC, nk, seg
    LIMIT 8
"""


@register(
    "q665_location_quotient",
    _Q665_ORACLE,
    doc="Location quotients on the nation x segment customer grid: "
    "LQ = within-nation segment share over overall segment share, "
    "top-8 specialized cells with each cell's share of its segment "
    "— the regional-concentration diagnostic beside HHI (q275) and "
    "shift-share (q524).",
)
def q665(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    cells = c.groupBy(
        F.col("c_nationkey").alias("nk"), F.col("c_mktsegment").alias("seg")
    ).agg(F.count(F.lit(1)).alias("n")).localCheckpoint(eager=False)
    tot = cells.agg(F.sum("n").alias("nn"))
    wn = Window.partitionBy("nk")
    ws = Window.partitionBy("seg")
    lq = cells.crossJoin(F.broadcast(tot)).select(
        "nk",
        "seg",
        "n",
        (
            (F.col("n") * 1.0 / F.sum("n").over(wn))
            / (F.sum("n").over(ws) * 1.0 / F.col("nn"))
        ).alias("lq"),
        F.sum("n").over(ws).alias("seg_n"),
    )
    return (
        lq.select(
            F.col("nk").alias("nation"),
            F.col("seg").alias("segment"),
            F.col("n").cast("bigint").alias("customers"),
            r6(F.col("lq")).alias("location_quotient"),
            r6(F.col("n") * 1.0 / F.col("seg_n")).alias("share_of_segment"),
        )
        .orderBy(F.desc("location_quotient"), "nation", "segment")
        .limit(8)
    )


# ---------------------------------------------------------------------------
# Q666 — CRC-8 checksums as a nested bitwise fold
# ---------------------------------------------------------------------------
# CRC-8 (polynomial 0x07) of the first five part names: the outer
# fold walks bytes (ascii of each character), the inner fold runs
# the eight shift-xor steps entirely in integer arithmetic — the
# rolling hardware checksum, bit-exact across engines, beside table
# checksums (q208) and Merkle diffs (q455).
def _crc8_expr(dialect: str) -> str:
    if dialect == "duck":
        step = (
            "CASE WHEN a2 >= 128 THEN xor((a2 * 2) % 256, 7) "
            "ELSE a2 * 2 END"
        )
        return (
            "list_reduce(list_prepend(CAST(0 AS BIGINT), "
            "list_transform(range(1, LENGTH(nm) + 1), "
            "i -> CAST(ascii(SUBSTR(nm, CAST(i AS BIGINT), 1)) AS BIGINT))), "
            "(acc, c) -> list_reduce(list_prepend(xor(acc, c), "
            "list_transform(range(1, 9), b -> CAST(b AS BIGINT))), "
            f"(a2, b) -> {step}))"
        )
    step = (
        "CASE WHEN a2 >= 128 THEN ((a2 * 2) % 256) ^ 7 ELSE a2 * 2 END"
    )
    return (
        "aggregate(transform(sequence(1, length(nm)), "
        "i -> CAST(ascii(substr(nm, i, 1)) AS BIGINT)), "
        "CAST(0 AS BIGINT), "
        "(acc, c) -> aggregate(sequence(1, 8), acc ^ c, "
        f"(a2, b) -> {step}))"
    )


_Q666_ORACLE = f"""
    WITH parts AS MATERIALIZED (
      SELECT p_partkey, p_name AS nm
      FROM part ORDER BY p_partkey LIMIT 5
    )
    SELECT p_partkey,
           CAST(LENGTH(nm) AS BIGINT) AS name_len,
           CAST({_crc8_expr('duck')} AS BIGINT) AS crc8
    FROM parts
    ORDER BY p_partkey
"""


@register(
    "q666_crc8_fold",
    _Q666_ORACLE,
    doc="CRC-8 (poly 0x07) of the first five part names as a nested "
    "integer fold: outer over ascii bytes, inner over the eight "
    "shift-xor steps — the hardware rolling checksum, bit-exact in "
    "both engines, beside table checksums (q208) and Merkle trees "
    "(q455).",
)
def q666(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    parts = p.orderBy("p_partkey").limit(5).select(
        "p_partkey", F.col("p_name").alias("nm")
    )
    return parts.select(
        "p_partkey",
        F.length("nm").cast("bigint").alias("name_len"),
        F.expr(_crc8_expr("spark")).cast("bigint").alias("crc8"),
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# Q667 — LMG relative importance: Shapley decomposition of R^2
# ---------------------------------------------------------------------------
# Spend on (balance, nation bloc): with two regressors the LMG /
# Shapley decomposition of the full R^2 is closed form — each
# regressor gets the average of its solo R^2 and its marginal
# contribution after the other — and the two shares sum exactly to
# the two-regressor R^2.
_Q667_ORACLE = """
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
             SUM((y - m.my) * (y - m.my)) AS syy
      FROM u, m GROUP BY m.mx1, m.mx2, m.my
    ), r2 AS (
      SELECT s1y * s1y / (s11 * syy) AS r2_1,
             s2y * s2y / (s22 * syy) AS r2_2,
             ((s22 * s1y - s12 * s2y) * s1y
              + (s11 * s2y - s12 * s1y) * s2y)
               / ((s11 * s22 - s12 * s12) * syy) AS r2_12
      FROM s
    )
    SELECT ROUND(r2_12 + 5e-12, 6) AS r2_full,
           ROUND((r2_1 + (r2_12 - r2_2)) / 2 + 5e-12, 6) AS lmg_balance,
           ROUND((r2_2 + (r2_12 - r2_1)) / 2 + 5e-12, 6) AS lmg_bloc,
           ABS((r2_1 + (r2_12 - r2_2)) / 2
               + (r2_2 + (r2_12 - r2_1)) / 2 - r2_12) < 1e-9
             AS shares_sum_to_r2
    FROM r2
"""


@register(
    "q667_lmg_importance",
    _Q667_ORACLE,
    doc="LMG/Shapley decomposition of R^2 for two regressors, closed "
    "form: each gets the average of its solo R^2 and its marginal "
    "after the other, shares summing exactly to the full R^2 — "
    "relative importance for regressions, the R^2 counterpart of "
    "linear SHAP (q537).",
)
def q667(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        .localCheckpoint(eager=False)
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
        F.sum((F.col("y") - F.col("my")) * (F.col("y") - F.col("my"))).alias(
            "syy"
        ),
    )
    r2_1 = F.col("s1y") * F.col("s1y") / (F.col("s11") * F.col("syy"))
    r2_2 = F.col("s2y") * F.col("s2y") / (F.col("s22") * F.col("syy"))
    r2_12 = (
        (F.col("s22") * F.col("s1y") - F.col("s12") * F.col("s2y")) * F.col("s1y")
        + (F.col("s11") * F.col("s2y") - F.col("s12") * F.col("s1y"))
        * F.col("s2y")
    ) / ((F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")) * F.col("syy"))
    r2 = s.select(
        r2_1.alias("r2_1"), r2_2.alias("r2_2"), r2_12.alias("r2_12")
    )
    lmg1 = (F.col("r2_1") + (F.col("r2_12") - F.col("r2_2"))) / 2
    lmg2 = (F.col("r2_2") + (F.col("r2_12") - F.col("r2_1"))) / 2
    return r2.select(
        r6(F.col("r2_12")).alias("r2_full"),
        r6(lmg1).alias("lmg_balance"),
        r6(lmg2).alias("lmg_bloc"),
        (F.abs(lmg1 + lmg2 - F.col("r2_12")) < 1e-9).alias(
            "shares_sum_to_r2"
        ),
    )


# ---------------------------------------------------------------------------
# Q668 — Cramér-von Mises two-sample test
# ---------------------------------------------------------------------------
# URGENT vs LOW order values compared by the Cramér-von Mises
# criterion via the rank formula T = [n sum(r_i - i)^2 + m sum(s_j
# - j)^2] / (nm(n+m)) - (4mn-1)/(6(m+n)) with deterministic
# tie-breaking — integrating the whole ECDF gap where KS (q147)
# takes only its supremum.
_Q668_ORACLE = """
    WITH pool AS MATERIALIZED (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 2 END AS grp,
             ROUND(o_totalprice * 100) AS v,
             o_orderkey AS ok
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ), ranked AS MATERIALIZED (
      SELECT grp,
             ROW_NUMBER() OVER (ORDER BY v, grp, ok) AS r,
             ROW_NUMBER() OVER (PARTITION BY grp ORDER BY v, grp, ok) AS i
      FROM pool
    ), sums AS (
      SELECT SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS n,
             SUM(CASE WHEN grp = 2 THEN 1 ELSE 0 END) AS m,
             SUM(CASE WHEN grp = 1
                      THEN (r - i) * (r - i) * 1.0 END) AS u1,
             SUM(CASE WHEN grp = 2
                      THEN (r - i) * (r - i) * 1.0 END) AS u2
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_urgent,
           CAST(m AS BIGINT) AS m_low,
           ROUND((n * u1 + m * u2) / (n * m * (n + m) * 1.0)
                 - (4.0 * m * n - 1) / (6.0 * (m + n)) + 5e-12, 6)
             AS cvm_statistic,
           (n * u1 + m * u2) / (n * m * (n + m) * 1.0)
             - (4.0 * m * n - 1) / (6.0 * (m + n)) > 0.461
             AS reject_at_5pct
    FROM sums
"""


@register(
    "q668_cramer_von_mises",
    _Q668_ORACLE,
    doc="Cramér-von Mises two-sample criterion via the rank formula "
    "on URGENT vs LOW order values (deterministic tie order) — the "
    "integrated-ECDF-gap test that out-powers the supremum-based "
    "KS (q147) against spread differences.",
)
def q668(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    pool = o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(2).alias(
            "grp"
        ),
        F.round(F.col("o_totalprice") * 100).alias("v"),
        F.col("o_orderkey").alias("ok"),
    )
    ranked = pool.select(
        "grp",
        F.row_number().over(Window.orderBy("v", "grp", "ok")).alias("r"),
        F.row_number()
        .over(Window.partitionBy("grp").orderBy("v", "grp", "ok"))
        .alias("i"),
    )
    d2 = (F.col("r") - F.col("i")) * (F.col("r") - F.col("i")) * 1.0
    sums = ranked.agg(
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("n"),
        F.sum(F.when(F.col("grp") == 2, 1).otherwise(0)).alias("m"),
        F.sum(F.when(F.col("grp") == 1, d2)).alias("u1"),
        F.sum(F.when(F.col("grp") == 2, d2)).alias("u2"),
    )
    n, m = F.col("n"), F.col("m")
    t = (n * F.col("u1") + m * F.col("u2")) / (n * m * (n + m) * 1.0) - (
        4.0 * m * n - 1
    ) / (6.0 * (m + n))
    return sums.select(
        n.cast("bigint").alias("n_urgent"),
        m.cast("bigint").alias("m_low"),
        r6(t).alias("cvm_statistic"),
        (t > 0.461).alias("reject_at_5pct"),
    )
