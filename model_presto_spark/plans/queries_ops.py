"""Conformance queries for the band-math, split, and time-series
operator layers (SURVEY.md §2.2 P4-P6, §2.5 W1/W4, §2.9 R-family).

Spectral indices run on TPC-H numeric columns as stand-in bands —
the expressions (guarded ratios, sqrt discriminants) are exactly the
reference's; only the inputs differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from model_presto_spark.functions import bands as B
from model_presto_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# Q41 — spectral-index expressions (P4): guarded ratios + sqrt form
# ---------------------------------------------------------------------------
_Q41_ORACLE = """
    WITH b AS (
      SELECT l_orderkey, l_linenumber,
             CAST(l_quantity AS DOUBLE) AS nir,
             l_discount * 100.0 AS red,
             l_tax * 100.0 AS blue
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber,
           ROUND(CASE WHEN nir + red != 0 THEN (nir - red) / (nir + red)
                      ELSE 0.0 END + 5e-12, 6) AS ndvi,
           ROUND(CASE WHEN nir + 6.0*red - 7.5*blue + 1.0 != 0
                      THEN 2.5 * (nir - red) / (nir + 6.0*red - 7.5*blue + 1.0)
                      ELSE 0.0 END + 5e-12, 6) AS evi,
           ROUND((2.0*nir + 1.0
                  - sqrt((2.0*nir + 1.0)*(2.0*nir + 1.0) - 8.0*(nir - red))) / 2.0
                 + 5e-12, 6) AS msavi,
           ROUND(nir / 10000.0 + 5e-12, 6) AS s2_scaled
    FROM b
    ORDER BY l_orderkey, l_linenumber
    LIMIT 500
"""


@register(
    "q41_spectral",
    _Q41_ORACLE,
    doc="Spectral-index layer: NDVI/EVI guarded ratios, MSAVI sqrt "
    "discriminant, S2 scale factor — pure codegen arithmetic (P4-P6).",
)
def q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    nir = F.col("l_quantity").cast("double")
    red = F.col("l_discount") * 100.0
    blue = F.col("l_tax") * 100.0
    return (
        li.orderBy("l_orderkey", "l_linenumber")
        .limit(500)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(B.ndvi(nir, red) + 5e-12, 6).alias("ndvi"),
            F.round(B.evi(nir, red, blue) + 5e-12, 6).alias("evi"),
            F.round(B.msavi(nir, red) + 5e-12, 6).alias("msavi"),
            F.round(B.scale_s2_sr(nir) + 5e-12, 6).alias("s2_scaled"),
        )
    )


# ---------------------------------------------------------------------------
# Q42 — per-class capped split assignment (W4/R-family)
# ---------------------------------------------------------------------------
_Q42_ORACLE = """
    WITH ranked AS (
      SELECT c_nationkey,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn
      FROM customer
    )
    SELECT c_nationkey,
           CASE WHEN rn <= 5 THEN 'train'
                WHEN rn <= 10 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n
    FROM ranked
    GROUP BY 1, 2
"""


@register(
    "q42_capped_split",
    _Q42_ORACLE,
    doc="Per-class capped train/val/test assignment (first-N rule, "
    "croptype_france_eval.py:151-162 shape) — counts per (class, split).",
)
def q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    from model_presto_spark.operators.splits import per_class_capped_split

    cust = _t(spark, sf_dir, "customer")
    assigned = per_class_capped_split(cust, "c_nationkey", "c_custkey", 5, 5)
    return assigned.groupBy("c_nationkey", "split").agg(
        F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# Q43 — monthly median composite with constant fallback (P21/A1/W1)
# ---------------------------------------------------------------------------
_Q43_ORACLE = """
    WITH months AS (
      SELECT UNNEST(generate_series(DATE '2024-01-01', DATE '2024-12-01',
                                    INTERVAL 1 MONTH))::DATE AS month_start
    ), users AS (
      SELECT DISTINCT user_id FROM events
    ), facts AS (
      SELECT user_id, date_trunc('month', ts)::DATE AS month_start,
             median(value) AS agg
      FROM events
      GROUP BY 1, 2
    )
    SELECT u.user_id, m.month_start,
           ROUND(COALESCE(f.agg, -1.0) + 5e-12, 6) AS composite
    FROM users u
    CROSS JOIN months m
    LEFT JOIN facts f ON f.user_id = u.user_id AND f.month_start = m.month_start
"""


@register(
    "q43_monthly_composite",
    _Q43_ORACLE,
    doc="Month-spine composite with constant(-1) fallback for empty "
    "months — the reference's ee.Algorithms.If(size>0, median, -1) "
    "pattern as spine cross-join + left join + coalesce.",
)
def q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    from model_presto_spark.operators.timeseries import monthly_composite

    ev = _t(spark, sf_dir, "events")
    out = monthly_composite(
        ev,
        keys=["user_id"],
        ts_col="ts",
        value_col="value",
        agg="median",
        fill=-1.0,
        spine_start="2024-01-01",
        spine_end="2024-12-01",
    )
    return out.select(
        "user_id",
        "month_start",
        F.round(F.col("composite") + 5e-12, 6).alias("composite"),
    )
