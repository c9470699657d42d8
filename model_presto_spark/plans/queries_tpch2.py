"""Conformance queries: TPC-H classics batch #2 (q175+) — Q5 local
supplier volume, Q10 returned-item report, Q14 promo share, Q8
national market share, Q19-style disjunctive predicate pushdown.
These are the canonical multi-join OLAP shapes the reference's SQL
surface implies (SURVEY §2.13 relational core); Catalyst owns join
ordering/broadcast — the Spark side states the joins flat and lets
the optimizer plan them. Oracle conventions as everywhere."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, register

_REV = "l_extendedprice * (1 - l_discount)"


# ---------------------------------------------------------------------------
# Q175 — TPC-H Q5: local supplier volume per nation (6-table join)
# ---------------------------------------------------------------------------
_Q175_ORACLE = f"""
    SELECT n.n_name,
           ROUND(SUM({_REV}) + 5e-10, 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY n.n_name
"""


@register(
    "q175_tpch_q5",
    _Q175_ORACLE,
    doc="TPC-H Q5: revenue from LOCAL suppliers (customer and "
    "supplier share a nation) per nation of one region, 6-table "
    "join with a date band. The canonical join-ordering benchmark: "
    "region/nation broadcast, the c_nationkey = s_nationkey "
    "residual rides the fact join. Catalyst plans the order; no "
    "hints.",
)
def q175(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(rev + 5e-10, 2).alias("revenue"))
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# Q176 — TPC-H Q10: returned-item revenue report (top 20 customers)
# ---------------------------------------------------------------------------
# Revenue is rounded to cents BEFORE ranking so the top-20 cutoff is
# decided on engine-identical values (ulp-divergent raw float sums
# near the cutoff would otherwise make the SET nondeterministic);
# (revenue, custkey) is a total order.
_Q176_ORACLE = f"""
    WITH per_cust AS (
      SELECT c.c_custkey, c.c_name, n.n_name,
             ROUND(SUM({_REV}) + 5e-10, 2) AS revenue
      FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01'
        AND l.l_returnflag = 'R'
      GROUP BY c.c_custkey, c.c_name, n.n_name
    )
    SELECT c_custkey, c_name, n_name, revenue
    FROM per_cust
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
"""


@register(
    "q176_tpch_q10",
    _Q176_ORACLE,
    doc="TPC-H Q10: top-20 customers by returned-item revenue in one "
    "year — fact joins + a dimension broadcast + deterministic "
    "float-safe top-k (revenue rounded to cents before ranking, "
    "custkey tiebreak).",
)
def q176(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(rev + 5e-10, 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select("c_custkey", "c_name", "n_name", "revenue")
    )


# ---------------------------------------------------------------------------
# Q177 — TPC-H Q14: promo revenue share in one month
# ---------------------------------------------------------------------------
_Q177_ORACLE = f"""
    SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                                  THEN {_REV} ELSE 0 END)
                 / SUM({_REV}) + 5e-10, 4) AS promo_share,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
      AND l.l_shipdate <  TIMESTAMP '1997-04-01'
"""


@register(
    "q177_tpch_q14",
    _Q177_ORACLE,
    doc="TPC-H Q14: percentage of one month's revenue from PROMO "
    "parts — conditional aggregate ratio over a fact-dimension join; "
    "the shipdate band prunes the scan before the join.",
)
def q177(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-03-01")
        & (F.col("l_shipdate") < "1997-04-01")
    )
    p = _t(spark, sf_dir, "part")
    ext = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", ext).otherwise(0.0))
                / F.sum(ext)
                + 5e-10,
                4,
            ).alias("promo_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q178 — TPC-H Q8: national market share per year
# ---------------------------------------------------------------------------
# Share of supplier-nation NATION_7 in the revenue delivered to
# EUROPE-region customers, per order year.
_Q178_ORACLE = f"""
    WITH base AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS yr,
             {_REV} AS vol,
             ns.n_name AS supp_nation
      FROM customer c
      JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
      JOIN region r   ON nc.n_regionkey = r.r_regionkey
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT yr,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_7' THEN vol ELSE 0 END)
                 / SUM(vol) + 5e-10, 6) AS mkt_share
    FROM base
    GROUP BY yr
    ORDER BY yr
"""


@register(
    "q178_tpch_q8",
    _Q178_ORACLE,
    doc="TPC-H Q8: NATION_7 suppliers' share of revenue delivered to "
    "EUROPE customers per order year — the double-nation-role join "
    "(nation joined twice under different keys) + conditional share "
    "aggregate. Both nation sides and region broadcast.",
)
def q178(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    nc = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_reg")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    ns = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        c.join(nc, c.c_nationkey == F.col("nc_key"))
        .join(r, F.col("nc_reg") == r.r_regionkey)
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(ns, s.s_nationkey == F.col("ns_key"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("yr"),
            vol.alias("vol"),
            "supp_nation",
        )
    )
    return (
        base.groupBy("yr")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_7", F.col("vol"))
                    .otherwise(0.0)
                )
                / F.sum("vol")
                + 5e-10,
                6,
            ).alias("mkt_share")
        )
        .orderBy("yr")
    )


# ---------------------------------------------------------------------------
# Q179 — TPC-H Q19 shape: disjunction of conjunctive bands
# ---------------------------------------------------------------------------
_Q179_ORACLE = f"""
    SELECT ROUND(SUM({_REV}) + 5e-10, 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 40)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
"""


@register(
    "q179_tpch_q19",
    _Q179_ORACLE,
    doc="TPC-H Q19 shape: OR of per-brand (size-band AND "
    "quantity-band) conjunctions across the part join — the "
    "disjunctive-pushdown benchmark: the common l_quantity/p_size "
    "bounds are extractable to the scans, the residual rides the "
    "join.",
)
def q179(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 15) & q.between(1, 20))
        | (
            (F.col("p_brand") == "Brand#2")
            & sz.between(10, 30)
            & q.between(10, 40)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & sz.between(20, 50)
            & q.between(20, 50)
        )
    )
    ext = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            F.round(F.sum(ext) + 5e-10, 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
