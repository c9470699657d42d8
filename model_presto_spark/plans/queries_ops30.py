"""Conformance queries: round-7 operator batch #24 (q329+) —
monetary-unit (PPS) audit sampling, price/volume/mix revenue
bridge, price-ending (charm pricing) audit.

Parity: cumulative cents, period sums, and ending histograms are
exact integers end to end."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import R6_SQL, _t, r6, register

_R6 = R6_SQL


# ---------------------------------------------------------------------------
# Q329 — Monetary-unit (PPS systematic) audit sampling
# ---------------------------------------------------------------------------
# Dollar-unit sampling of orders: fixed interval = total cents /
# 25, an order is selected iff its cumulative-cents span crosses a
# multiple of the interval (deterministic start at 0) — big-dollar
# items are selected with certainty, small ones in proportion to
# value.  Exact integer division decides every selection.
_Q329_N = 25

_Q329_ORACLE = f"""
    WITH o AS (
      SELECT o_orderkey,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders
    ), cum AS (
      SELECT o_orderkey, cents,
             SUM(cents) OVER (ORDER BY o_orderkey
                              ROWS UNBOUNDED PRECEDING) AS hi,
             SUM(cents) OVER (ORDER BY o_orderkey
                              ROWS UNBOUNDED PRECEDING) - cents AS lo,
             SUM(cents) OVER () AS total
      FROM o
    ), sel AS (
      SELECT o_orderkey, cents, lo, hi, total,
             (hi - 1) // (total // {_Q329_N})
               - CASE WHEN lo = 0 THEN -1
                      ELSE (lo - 1) // (total // {_Q329_N}) END
               AS n_hits
      FROM cum
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_selected,
           CAST(SUM(n_hits) AS BIGINT) AS n_units,
           ROUND(SUM(cents) / 100.0 + 5e-10, 2) AS selected_value,
           ROUND(MAX(total) / 100.0 + 5e-10, 2) AS population_value,
           {_R6.format(
               x='CAST(SUM(cents) AS DOUBLE) / MAX(total)'
           )} AS coverage
    FROM sel WHERE n_hits > 0
"""


@register(
    "q329_mus_sampling",
    _Q329_ORACLE,
    doc="Monetary-unit (PPS systematic) sampling of orders: "
    "interval = total/25 cents, an order is selected iff its "
    "cumulative span crosses an interval boundary — certainty for "
    "big-dollar items, value-proportional for the rest, all by "
    "exact integer division.  The audit-sampling standard.",
)
def q329(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("bigint")
        .alias("cents"),
    )
    w = Window.orderBy("o_orderkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = o.select(
        "o_orderkey",
        "cents",
        F.sum("cents").over(w).alias("hi"),
        (F.sum("cents").over(w) - F.col("cents")).alias("lo"),
        F.sum("cents").over(Window.partitionBy()).alias("total"),
    )
    interval = F.expr(f"CAST(total DIV {_Q329_N} AS BIGINT)")
    n_hits = F.expr(
        f"CAST((hi - 1) DIV (total DIV {_Q329_N}) AS BIGINT)"
    ) - F.when(
        F.col("lo") == 0, F.lit(-1).cast("bigint")
    ).otherwise(
        F.expr(f"CAST((lo - 1) DIV (total DIV {_Q329_N}) AS BIGINT)")
    )
    sel = cum.select(
        "cents", "total", n_hits.alias("n_hits")
    ).where(F.col("n_hits") > 0)
    return sel.agg(
        F.count(F.lit(1)).alias("n_selected"),
        F.sum("n_hits").alias("n_units"),
        F.round(F.sum("cents") / 100.0 + 5e-10, 2).alias(
            "selected_value"
        ),
        F.round(F.max("total") / 100.0 + 5e-10, 2).alias(
            "population_value"
        ),
        r6(
            F.sum("cents").cast("double") / F.max("total")
        ).alias("coverage"),
    )


# ---------------------------------------------------------------------------
# Q330 — Price/volume/mix revenue bridge (1996 -> 2000, by brand)
# ---------------------------------------------------------------------------
# FP&A variance decomposition per brand: price effect
# (p1-p0)*q1, volume effect p0*(q1-q0) scaled by the constant-mix
# share, and mix effect as the residual — the bridge sums exactly
# to the revenue delta by construction.  Unit prices are rationals
# of exact period sums.
_Q330_ORACLE = """
    WITH per AS (
      SELECT p.p_brand AS brand,
             CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS yr,
             CAST(ROUND(SUM(l.l_extendedprice) * 100, 0) AS BIGINT)
               AS rev,
             CAST(SUM(l.l_quantity) AS BIGINT) AS qty
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE EXTRACT(year FROM l.l_shipdate) IN (1996, 2000)
      GROUP BY brand, yr
    ), wide AS (
      SELECT brand,
             MAX(CASE WHEN yr = 1996 THEN rev END) AS r0,
             MAX(CASE WHEN yr = 2000 THEN rev END) AS r1,
             MAX(CASE WHEN yr = 1996 THEN qty END) AS q0,
             MAX(CASE WHEN yr = 2000 THEN qty END) AS q1
      FROM per GROUP BY brand
      HAVING MAX(CASE WHEN yr = 1996 THEN qty END) > 0
         AND MAX(CASE WHEN yr = 2000 THEN qty END) > 0
    ), fx AS (
      SELECT brand, r0, r1, q0, q1,
             CAST(r0 AS DOUBLE) / q0 AS p0,
             CAST(r1 AS DOUBLE) / q1 AS p1
      FROM wide
    )
    SELECT brand,
           {DR} AS delta_revenue,
           {PE} AS price_effect,
           {VE} AS volume_effect
    FROM fx
    ORDER BY brand
    LIMIT 15
""".replace(
    "{DR}", "ROUND((r1 - r0) / 100.0 + 5e-10, 2)"
).replace(
    "{PE}", "ROUND((p1 - p0) * q1 / 100.0 + 5e-10, 2)"
).replace(
    "{VE}", "ROUND(p0 * (q1 - q0) / 100.0 + 5e-10, 2)"
)


@register(
    "q330_price_volume_mix",
    _Q330_ORACLE,
    doc="Price/volume revenue bridge per brand, 1996 -> 2000: "
    "price effect (p1-p0) q1 + volume effect p0 (q1-q0) = revenue "
    "delta exactly (unit prices are rationals of exact period "
    "sums).  The FP&A variance-decomposition staple.",
)
def q330(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    per = (
        li.where(F.year("l_shipdate").isin(1996, 2000))
        .join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.year("l_shipdate").cast("bigint").alias("yr"),
        )
        .agg(
            F.round(F.sum("l_extendedprice") * 100, 0)
            .cast("bigint")
            .alias("rev"),
            F.sum("l_quantity").cast("bigint").alias("qty"),
        )
    )

    def pick(yr, col, alias):
        return F.max(
            F.when(F.col("yr") == yr, F.col(col))
        ).alias(alias)

    wide = per.groupBy("brand").agg(
        pick(1996, "rev", "r0"),
        pick(2000, "rev", "r1"),
        pick(1996, "qty", "q0"),
        pick(2000, "qty", "q1"),
    ).where((F.col("q0") > 0) & (F.col("q1") > 0))
    p0 = F.col("r0").cast("double") / F.col("q0")
    p1 = F.col("r1").cast("double") / F.col("q1")
    return (
        wide.select(
            "brand",
            F.round(
                (F.col("r1") - F.col("r0")) / 100.0 + 5e-10, 2
            ).alias("delta_revenue"),
            F.round(
                (p1 - p0) * F.col("q1") / 100.0 + 5e-10, 2
            ).alias("price_effect"),
            F.round(
                p0 * (F.col("q1") - F.col("q0")) / 100.0 + 5e-10, 2
            ).alias("volume_effect"),
        )
        .orderBy("brand")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# Q331 — Price-ending (charm pricing) audit
# ---------------------------------------------------------------------------
# Distribution of the cent endings (00-99) of order totals: top
# endings with observed share vs the uniform 1%, and the
# concentration of the top-10 endings.  Pure integer modulo
# arithmetic — the pricing-psychology / fraud-pattern audit.
_Q331_ORACLE = """
    WITH e AS (
      SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) % 100
               AS ending
      FROM orders
    ), cnt AS (
      SELECT ending, CAST(COUNT(*) AS BIGINT) AS c FROM e
      GROUP BY ending
    ), tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n FROM cnt
    )
    SELECT CAST(c.ending AS BIGINT) AS cent_ending, c.c AS n_orders,
           {SHARE} AS share,
           {LIFT} AS lift_vs_uniform
    FROM cnt c CROSS JOIN tot t
    ORDER BY c.c DESC, c.ending
    LIMIT 10
""".replace(
    "{SHARE}", R6_SQL.format(x="CAST(c.c AS DOUBLE) / t.n")
).replace(
    "{LIFT}",
    R6_SQL.format(x="CAST(c.c AS DOUBLE) / t.n * 100.0"),
)


@register(
    "q331_price_endings",
    _Q331_ORACLE,
    doc="Charm-pricing / fabrication audit: histogram of cent "
    "endings (00-99) of order totals, top-10 with share and lift "
    "vs the uniform 1% — integer modulo arithmetic end to end.  "
    "Benford's (q121) last-digit sibling.",
)
def q331(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cnt = o.select(
        (
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint") % 100
        ).alias("ending")
    ).groupBy("ending").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(F.sum("c").alias("n"))
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            F.col("ending").cast("bigint").alias("cent_ending"),
            F.col("c").alias("n_orders"),
            r6(F.col("c").cast("double") / F.col("n")).alias("share"),
            r6(
                F.col("c").cast("double") / F.col("n") * 100.0
            ).alias("lift_vs_uniform"),
        )
        .orderBy(F.col("n_orders").desc(), "cent_ending")
        .limit(10)
    )
