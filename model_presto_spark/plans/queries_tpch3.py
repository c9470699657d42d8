"""Conformance queries: TPC-H classics batch #3 (q214+) — Q7 volume
shipping, Q13 customer order-count distribution, Q17 small-quantity
revenue, Q18 large-volume orders, Q22 dormant high-balance
customers.  Shapes adapted to the reduced synthetic schema (no
partsupp / commitdate / phone): the join topology, subquery
correlation, and anti-join semantics are the TPC-H ones, the
predicates use columns that exist here.  Oracle conventions as
everywhere (ROUND(+eps) money, CAST BIGINT counts)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, register

_REV = "l_extendedprice * (1 - l_discount)"


# ---------------------------------------------------------------------------
# Q214 — TPC-H Q7: volume shipping between two nations
# ---------------------------------------------------------------------------
# Revenue flowing NATION_1 -> NATION_2 and NATION_2 -> NATION_1 per
# ship year.  The classic two-role dimension join: nation is joined
# twice (supplier side, customer side) with a symmetric pair
# predicate; both sides broadcast, the residual disjunction rides
# the fact join.  Group keys are tiny (2 pairs x years).
_Q214_ORACLE = f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
           ROUND(SUM({_REV}) + 5e-10, 2) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
"""


@register(
    "q214_tpch_q7",
    _Q214_ORACLE,
    doc="TPC-H Q7: shipping volume between two nations per ship "
    "year.  Nation joined twice under different roles with a "
    "symmetric pair disjunction; both dimension copies broadcast, "
    "one shuffle for the 3-way fact join, final agg on a "
    "(2 pairs x years) key space.",
)
def q214(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("cust_nation"),
    )
    pair = (
        (F.col("supp_nation") == "NATION_1")
        & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2")
        & (F.col("cust_nation") == "NATION_1")
    )
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.round(rev + 5e-10, 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q215 — TPC-H Q13: customer distribution by order count
# ---------------------------------------------------------------------------
# How many customers placed exactly k qualifying orders — INCLUDING
# k = 0, which is why the filter must live in the LEFT JOIN
# condition, not a WHERE (a WHERE would silently drop the
# zero-order customers the query exists to count).  Two
# aggregations, both with tiny key spaces after the first.
_Q215_ORACLE = """
    WITH per_cust AS (
      SELECT c.c_custkey,
             CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey
    )
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""


@register(
    "q215_tpch_q13",
    _Q215_ORACLE,
    doc="TPC-H Q13: distribution of customers by qualifying-order "
    "count, zero-order customers preserved by keeping the order "
    "predicate in the LEFT JOIN condition (the canonical "
    "filter-in-ON vs filter-in-WHERE semantics test).  Two "
    "aggregations; the second key space is O(max order count).",
)
def q215(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# Q216 — TPC-H Q17: small-quantity-order revenue (correlated avg)
# ---------------------------------------------------------------------------
# Average yearly revenue lost if orders below 20% of a part's mean
# quantity were no longer taken.  The correlated scalar subquery
# decorrelates to a per-part aggregate joined back to lineitem —
# stated that way directly here (one extra shuffle on l_partkey,
# which is the decorrelation Catalyst/DuckDB both perform anyway).
_Q216_ORACLE = f"""
    WITH part_avg AS (
      SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_cut
      FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(SUM({_REV}) / 7.0 + 5e-10, 2) AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_small
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN part_avg pa ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < pa.qty_cut
"""


@register(
    "q216_tpch_q17",
    _Q216_ORACLE,
    doc="TPC-H Q17: revenue from lineitems below 20% of their "
    "part's average quantity, one brand.  Correlated scalar "
    "subquery decorrelated to a per-part aggregate + equi-join "
    "(the plan both optimizers produce); quantities are "
    "integer-valued doubles so the 0.2*avg cut is bit-identical "
    "across engines.",
)
def q216(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    part_avg = li.groupBy(F.col("l_partkey").alias("pa_key")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(part_avg, li.l_partkey == F.col("pa_key"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                / 7.0
                + 5e-10,
                2,
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


# ---------------------------------------------------------------------------
# Q217 — TPC-H Q18: large-volume orders (HAVING over a fact rollup)
# ---------------------------------------------------------------------------
# Orders whose total quantity exceeds 250 (p99 here), with customer
# attribution.  The rollup-then-semi-join shape: aggregate lineitem
# once, HAVING-filter the tiny survivor set, then join orders +
# customer to it — never the other way around (joining first would
# shuffle the full fact table against orders before any reduction).
_Q217_QTY = 250

_Q217_ORACLE = f"""
    WITH big AS (
      SELECT l_orderkey, SUM(l_quantity) AS total_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(l_quantity) > {_Q217_QTY}
    )
    SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate,
           ROUND(o.o_totalprice + 5e-10, 2) AS o_totalprice,
           ROUND(b.total_qty + 5e-10, 2) AS total_qty
    FROM big b
    JOIN orders o   ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o_totalprice DESC, o.o_orderdate, o.o_orderkey
    LIMIT 100
"""


@register(
    "q217_tpch_q18",
    _Q217_ORACLE,
    doc="TPC-H Q18: orders with total quantity > 250 plus customer "
    "attribution, top-100 by price.  Aggregate-then-join: the "
    "HAVING survivor set is ~1% of orders, so the orders/customer "
    "joins see a few hundred rows instead of the fact table; "
    "o_orderkey tiebreak makes the LIMIT deterministic.",
)
def q217(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > _Q217_QTY)
    )
    return (
        big.join(o, o.o_orderkey == big.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .select(
            "c_name",
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("o_totalprice") + 5e-10, 2).alias("o_totalprice"),
            F.round(F.col("total_qty") + 5e-10, 2).alias("total_qty"),
        )
        .orderBy(
            F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey"
        )
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q218 — TPC-H Q22: dormant high-balance customers (anti-join)
# ---------------------------------------------------------------------------
# Customers with above-average positive balance and NO recent
# urgent order, counted per region.  Uncorrelated scalar subquery
# (global avg, a broadcast scalar) + NOT EXISTS (left_anti join on
# the pre-filtered orders side) + broadcast dimension rollup.
_Q218_ORACLE = """
    WITH cut AS (
      SELECT AVG(c_acctbal) AS bal_cut FROM customer WHERE c_acctbal > 0
    )
    SELECT r.r_name,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(c.c_acctbal) + 5e-10, 2) AS totacctbal
    FROM customer c
    CROSS JOIN cut
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE c.c_acctbal > cut.bal_cut
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderpriority = '1-URGENT'
          AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY r.r_name
    ORDER BY r.r_name
"""


@register(
    "q218_tpch_q22",
    _Q218_ORACLE,
    doc="TPC-H Q22 shape: above-average-balance customers with no "
    "urgent order since 2000, rolled up per region.  Global-avg "
    "scalar broadcast, left_anti join against the pre-filtered "
    "orders projection (filter pushed below the anti-join), "
    "broadcast nation/region rollup.",
)
def q218(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    urgent = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= "2000-01-01")
        )
        .select("o_custkey")
    )
    cut = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("bal_cut")
    )
    return (
        c.crossJoin(F.broadcast(cut))
        .filter(F.col("c_acctbal") > F.col("bal_cut"))
        .join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal") + 5e-10, 2).alias("totacctbal"),
        )
        .orderBy("r_name")
    )
