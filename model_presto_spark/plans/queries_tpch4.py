"""Conformance queries: TPC-H classics batch #4 (q335+) — the nine
shapes not yet covered: Q2 min-cost supplier, Q4 order-priority
checking, Q9 product-type profit, Q11 important stock, Q12 shipmode
priority split, Q15 top supplier, Q16 supplier counts with NOT IN,
Q20 excess-supply suppliers, Q21 suppliers who kept orders waiting.

The synthetic schema has no partsupp / l_commitdate / l_receiptdate /
l_shipmode, so the shapes adapt (documented per query): the supply
relation derives from lineitem (part,supplier) pairs, "late" means
l_shipdate > o_orderdate + 60 days, and l_returnflag stands in for
the shipmode category.  Join topology, subquery correlation, and
semi/anti-join semantics are the TPC-H ones.

Oracle conventions as everywhere: money ROUND(+5e-10, 2), unit-price
scores rounded to 6dp (+5e-12) BEFORE any argmin/equality so engines
agree at boundaries, counts CAST BIGINT.

Reference anchors: the reference's query surface is relational
selection/join/aggregate over its shard tables
(presto-tolbi/presto/dataops/dataset.py, eval/eval.py); TPC-H shapes
are the standard OLAP restatement of that surface at engine scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, register

_REV = "l_extendedprice * (1 - l_discount)"
_LATE = "l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY"


# ---------------------------------------------------------------------------
# Q335 — TPC-H Q2: min-cost supplier per part
# ---------------------------------------------------------------------------
# For every LARGE part in a size band, the EUROPE supplier(s) with
# the minimum unit cost.  partsupp does not exist here, so the
# supply relation derives from lineitem: cost(part, supplier) =
# avg unit price ever charged.  The correlated MIN subquery
# decorrelates to a per-part aggregate joined back on equality of
# the 6dp-ROUNDED cost (both engines round before comparing, so
# summation-order noise cannot flip the argmin).
_Q335_ORACLE = """
    WITH supply AS (
      SELECT l_partkey, l_suppkey,
             ROUND(AVG(l_extendedprice / l_quantity) + 5e-12, 6) AS cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), eligible AS (
      SELECT sp.l_partkey, sp.l_suppkey, sp.cost
      FROM supply sp
      JOIN supplier s ON s.s_suppkey = sp.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ), mincost AS (
      SELECT l_partkey, MIN(cost) AS min_cost FROM eligible GROUP BY l_partkey
    )
    SELECT ROUND(s.s_acctbal + 5e-10, 2) AS s_acctbal, s.s_name, n.n_name,
           p.p_partkey, p.p_type, e.cost
    FROM eligible e
    JOIN mincost m ON m.l_partkey = e.l_partkey AND e.cost = m.min_cost
    JOIN part p ON p.p_partkey = e.l_partkey
    JOIN supplier s ON s.s_suppkey = e.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size BETWEEN 10 AND 15 AND p.p_type = 'LARGE'
    ORDER BY s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
"""


@register(
    "q335_tpch_q2",
    _Q335_ORACLE,
    doc="TPC-H Q2: minimum-cost EUROPE supplier per filtered part. "
    "Supply relation derived from lineitem (one groupBy on the "
    "composite key, map-side combined); the correlated MIN "
    "decorrelates to a whole-partition window argmin on the "
    "ROUNDED cost (one partkey shuffle — the aggregate+join-back "
    "form would scan lineitem twice); dimensions broadcast.",
)
def q335(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 15) & (F.col("p_type") == "LARGE")
    )
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(
            F.avg(F.col("l_extendedprice") / F.col("l_quantity")) + 5e-12, 6
        ).alias("cost")
    )
    euro_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eligible = supply.join(
        F.broadcast(euro_supp), supply.l_suppkey == F.col("s_suppkey")
    )
    # Argmin as a whole-partition window MIN: one shuffle on partkey
    # instead of aggregate + join-back (which would re-scan lineitem
    # — Catalyst does not share the subtree and plan-time exchange
    # reuse does not apply across the two consumers).
    w_part = Window.partitionBy("l_partkey")
    return (
        eligible.withColumn("min_cost", F.min("cost").over(w_part))
        .filter(F.col("cost") == F.col("min_cost"))
        .join(F.broadcast(p), eligible.l_partkey == p.p_partkey)
        .select(
            F.round(F.col("s_acctbal") + 5e-10, 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            "cost",
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q336 — TPC-H Q4: order priority checking
# ---------------------------------------------------------------------------
# How many orders per priority, in one quarter, had at least one
# lineitem shipped more than 60 days after the order date (the
# commitdate-vs-receiptdate lateness test restated on the columns
# that exist).  EXISTS = left-semi join with the correlated date
# predicate riding the equi-join as a residual.
_Q336_ORACLE = f"""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
      AND o.o_orderdate <  TIMESTAMP '1997-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND {_LATE}
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@register(
    "q336_tpch_q4",
    _Q336_ORACLE,
    doc="TPC-H Q4: per-priority count of one quarter's orders with a "
    "late lineitem.  Left-semi join on o_orderkey with the "
    "late-shipment residual; the orderdate filter prunes orders "
    "before the join and the 5-row group key aggregates map-side.",
)
def q336(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-07-01")
        & (F.col("o_orderdate") < "1997-10-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    late = (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    return (
        o.join(li, (o.o_orderkey == li.l_orderkey) & late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q337 — TPC-H Q9: product-type profit per nation and year
# ---------------------------------------------------------------------------
# Profit on widget-family parts attributed to the supplier's nation
# per order year.  ps_supplycost does not exist; the cost leg uses
# 60% of the part's retail price (a plan-literal multiplier), which
# preserves the query's five-table join topology exactly.
_Q337_ORACLE = """
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                     - 0.6 * p.p_retailprice * l.l_quantity) + 5e-10, 2)
             AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
"""


@register(
    "q337_tpch_q9",
    _Q337_ORACLE,
    doc="TPC-H Q9: profit per supplier nation per order year on a "
    "part-name family.  part/supplier/nation broadcast (the name "
    "filter shrinks part first); one shuffle joins lineitem to "
    "orders on orderkey; the (25 nations x 7 years) rollup is "
    "map-side combined.",
)
def q337(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.round(F.sum(profit) + 5e-10, 2).alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# Q338 — TPC-H Q11: important stock (global-scalar HAVING)
# ---------------------------------------------------------------------------
# Parts whose supply value from ASIA suppliers exceeds 1.6x the
# mean per-part value (the spec's fraction scales with 1/SF; a mean
# multiple is the same test made scale-invariant).  The signature
# shape: an aggregate compared against a scalar aggregate of the
# SAME relation — computed once and broadcast, never recomputed per
# group.
_Q338_ORACLE = """
    WITH val AS (
      SELECT l.l_partkey, SUM(l.l_extendedprice * (1 - l.l_discount)) AS v
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'ASIA'
      GROUP BY l.l_partkey
    ), tot AS (SELECT AVG(v) AS mean_v FROM val)
    SELECT v.l_partkey AS p_partkey, ROUND(v.v + 5e-10, 2) AS part_value
    FROM val v CROSS JOIN tot
    WHERE v.v > 1.6 * tot.mean_v
    ORDER BY part_value DESC, p_partkey
"""


@register(
    "q338_tpch_q11",
    _Q338_ORACLE,
    doc="TPC-H Q11: parts above a fraction of total regional supply "
    "value.  Per-part aggregate built once; its global total is a "
    "1-row broadcast crossJoin (the decorrelated HAVING-scalar "
    "plan); ASIA suppliers broadcast into the fact scan.",
)
def q338(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    val = (
        li.join(F.broadcast(asia), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("v")
        )
    )
    tot = val.agg(F.avg("v").alias("mean_v"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("v") > 1.6 * F.col("mean_v"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("v") + 5e-10, 2).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


# ---------------------------------------------------------------------------
# Q339 — TPC-H Q12: shipmode priority split
# ---------------------------------------------------------------------------
# Per category (l_returnflag stands in for l_shipmode), how many of
# one year's late-shipped lineitems belonged to high- vs low-
# priority orders.  The orders<->lineitem join carries the lateness
# residual; the split is one conditional aggregation.
_Q339_ORACLE = f"""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1998-01-01'
      AND l.l_shipdate <  TIMESTAMP '1999-01-01'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
"""


@register(
    "q339_tpch_q12",
    _Q339_ORACLE,
    doc="TPC-H Q12 shape: high- vs low-priority lineitem counts per "
    "category for one ship year (returnflag stands in for "
    "shipmode).  Ship-year filter pushes to the lineitem scan; one "
    "orderkey shuffle; the CASE split aggregates map-side onto a "
    "3-row key space.",
)
def q339(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1998-01-01")
        & (F.col("l_shipdate") < "1999-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    late = (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
    return (
        o.join(li, (o.o_orderkey == li.l_orderkey) & late)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Q340 — TPC-H Q15: top supplier by quarterly revenue
# ---------------------------------------------------------------------------
# The supplier(s) whose revenue over one quarter equals the maximum
# over all suppliers.  The view + scalar-MAX shape: the revenue
# relation is built once; its max is a 1-row broadcast joined back
# on equality of the ROUNDED revenue (ties kept, like the spec).
_Q340_ORACLE = """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(l_extendedprice * (1 - l_discount)) + 5e-10, 2)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        AND l_shipdate <  TIMESTAMP '1998-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
"""


@register(
    "q340_tpch_q15",
    _Q340_ORACLE,
    doc="TPC-H Q15: supplier(s) achieving the maximum one-quarter "
    "revenue.  Revenue view computed once (date filter on the "
    "scan, suppkey rollup); MAX is a 1-row broadcast crossJoin; "
    "equality on the rounded total keeps ties and cross-engine "
    "agreement.",
)
def q340(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1998-01-01")
        & (F.col("l_shipdate") < "1998-04-01")
    )
    s = _t(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) + 5e-10,
            2,
        ).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q341 — TPC-H Q16: supplier counts with a NOT IN exclusion
# ---------------------------------------------------------------------------
# Distinct suppliers able to supply each (brand, type, size) combo,
# excluding one brand, one type family, off-list sizes, and
# "complaint" suppliers (negative balance stands in for the comment
# pattern).  The (part, supplier) relation derives from lineitem;
# NOT IN = left-anti join against the tiny exclusion list.
_Q341_ORACLE = """
    WITH pairs AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    )
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT pr.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM pairs pr
    JOIN part p ON p.p_partkey = pr.l_partkey
    WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
      AND pr.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
"""


@register(
    "q341_tpch_q16",
    _Q341_ORACLE,
    doc="TPC-H Q16: distinct-supplier counts per (brand, type, size) "
    "with brand/type/size exclusions and a NOT IN supplier "
    "blacklist.  Pair relation is one distinct over (partkey, "
    "suppkey) 16-byte keys; the blacklist anti-join and the part "
    "filter both broadcast; COUNT DISTINCT runs on the pruned "
    "pairs.",
)
def q341(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(F.broadcast(bad), pairs.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), pairs.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q342 — TPC-H Q20: suppliers with excess recent shipments
# ---------------------------------------------------------------------------
# EUROPE suppliers for whom SOME small-family part had 1998
# shipments exceeding 30% of their all-time quantity of that part
# (availqty does not exist; the excess test restates Q20's
# "availqty > half of one year's demand" on shipment history).
# The doubly nested IN chain: parts by name -> (supplier, part)
# rollup with the HAVING -> supplier semi-join.
_Q342_ORACLE = """
    SELECT s.s_name, n.n_name
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(CASE WHEN l_shipdate >= TIMESTAMP '1998-01-01'
                       AND l_shipdate < TIMESTAMP '1999-01-01'
                      THEN l_quantity ELSE 0 END) > 0.3 * SUM(l_quantity)
    )
    AND n.n_regionkey = (SELECT r_regionkey FROM region WHERE r_name = 'EUROPE')
    ORDER BY s.s_name
"""


@register(
    "q342_tpch_q20",
    _Q342_ORACLE,
    doc="TPC-H Q20: suppliers whose recent shipments of a part "
    "family exceed 30% of their all-time quantity.  Inner IN = "
    "broadcast part-name filter into the fact scan; the "
    "(suppkey, partkey) rollup HAVING-filters, collapses to "
    "distinct suppkeys, and semi-joins the 100-row supplier "
    "dimension; region scalar broadcast.",
)
def q342(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    small = _t(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE").select(
        "r_regionkey"
    )
    in98 = (F.col("l_shipdate") >= "1998-01-01") & (
        F.col("l_shipdate") < "1999-01-01"
    )
    excess = (
        li.join(F.broadcast(small), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in98, F.col("l_quantity")).otherwise(0.0)).alias("q98"),
            F.sum("l_quantity").alias("q_all"),
        )
        .filter(F.col("q98") > 0.3 * F.col("q_all"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(excess, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"), "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# Q343 — TPC-H Q21: suppliers who kept orders waiting
# ---------------------------------------------------------------------------
# For two nations' suppliers: late lineitems (shipped >60 days after
# the order date) in finished multi-supplier orders where NO OTHER
# supplier was late.  EXISTS decorrelates to a per-order distinct-
# supplier count; NOT EXISTS to a per-order distinct-LATE-supplier
# count of exactly 1 — both computed as aggregates, never as
# correlated rescans.
_Q343_ORACLE = f"""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND n.n_name IN ('NATION_3', 'NATION_4')
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
"""


@register(
    "q343_tpch_q21",
    _Q343_ORACLE,
    doc="TPC-H Q21: suppliers solely responsible for late finished "
    "orders.  The EXISTS/NOT-EXISTS pair decorrelates to two "
    "per-order aggregates (distinct suppliers >= 2, distinct LATE "
    "suppliers == 1) joined back on orderkey — three orderkey-"
    "co-partitioned shuffles instead of correlated rescans; "
    "supplier/nation broadcast.",
)
def q343(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_4")
    )
    late = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).select("l_orderkey", "l_suppkey")
    n_supp = li.groupBy(F.col("l_orderkey").alias("ns_orderkey")).agg(
        F.count_distinct(F.col("l_suppkey")).alias("n_supp")
    )
    n_late = late.groupBy(F.col("l_orderkey").alias("nl_orderkey")).agg(
        F.count_distinct(F.col("l_suppkey")).alias("n_late_supp")
    )
    return (
        late.join(n_supp, late.l_orderkey == F.col("ns_orderkey"))
        .join(n_late, late.l_orderkey == F.col("nl_orderkey"))
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(s), late.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
