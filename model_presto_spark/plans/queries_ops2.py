"""Conformance queries upgrading previously unit-test-only operators
to oracle-checked: grid windowing (W7/W8/W9/W10), positional concat +
pagination (J4/T5), and the raster<->vector spatial join (P11/J8/J9).

Float parity notes: every expression tree is spelled identically in
Spark and DuckDB (same IEEE double ops in the same order); aggregate
outputs are epsilon-rounded per house style; integer division uses
FLOOR on the DuckDB side because DuckDB CAST rounds where Spark
truncates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# Q57 — grid pipeline: stride subsample (W9) -> chip tiling (W8) ->
# cyclic month shift (W10) -> patch pooling (W7)
# ---------------------------------------------------------------------------
# Synthetic 200x200 grid from events (bijective r/c from event_id);
# keep every 2nd row/col, keep checkerboard chips of 16x16, shift the
# observation month by 7 mod 12, mean-pool 8x8 patches.

_Q57_ORACLE = """
    WITH grid AS (
      SELECT event_id % 200 AS r,
             CAST(FLOOR(event_id / 200.0) AS BIGINT) % 200 AS c,
             value AS v, month(ts) AS m
      FROM events
    ),
    sub AS (SELECT * FROM grid WHERE r % 2 = 0 AND c % 2 = 0),
    keep AS (
      SELECT *, CAST(FLOOR(r / 16.0) AS BIGINT) AS chip_row,
                CAST(FLOOR(c / 16.0) AS BIGINT) AS chip_col
      FROM sub
    ),
    shifted AS (
      SELECT r, c, v + ((m - 1 + 7) % 12) AS vm
      FROM keep WHERE (chip_row + chip_col) % 2 = 0
    )
    SELECT CAST(FLOOR(r / 8.0) AS BIGINT) AS patch_i,
           CAST(FLOOR(c / 8.0) AS BIGINT) AS patch_j,
           ROUND(AVG(vm) + 5e-10, 6) AS pooled
    FROM shifted GROUP BY patch_i, patch_j
"""


@register(
    "q57_grid_pipeline",
    _Q57_ORACLE,
    doc="Stride subsample -> checkerboard chip filter -> cyclic month "
    "shift -> 8x8 mean patch pooling, all pushdown-friendly filters "
    "then a single shuffle (the patch groupBy).",
)
def q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    from model_presto_spark.operators.grid import chip_key
    from model_presto_spark.operators.timeseries import (
        cyclic_month,
        patch_pool,
        stride_sample,
    )

    ev = _t(spark, sf_dir, "events")
    grid = ev.select(
        F.pmod(F.col("event_id"), F.lit(200)).alias("r"),
        F.pmod(F.floor(F.col("event_id") / 200), F.lit(200)).alias("c"),
        F.col("value").alias("v"),
        F.month("ts").alias("m"),
    )
    sub = stride_sample(grid, "r", "c", 2)
    chipped = sub.withColumn(
        "ck", chip_key(F.col("r"), F.col("c"), 16)
    ).filter(F.pmod(F.col("ck.chip_row") + F.col("ck.chip_col"), F.lit(2)) == 0)
    shifted = chipped.withColumn(
        "vm", F.col("v") + cyclic_month(F.col("m") - 1, F.lit(7))
    )
    out = patch_pool(shifted, "r", "c", "vm", patch=8, agg="mean")
    return out.select(
        "patch_i", "patch_j", F.round(F.col("pooled") + 5e-10, 6).alias("pooled")
    )


# ---------------------------------------------------------------------------
# Q58 — positional concat (J4) + chunked pagination (T5)
# ---------------------------------------------------------------------------
# Zip customers ascending-by-key with customers descending-by-key
# (pd.concat(axis=1) semantics), then page the zipped rows in chunks
# of 100 and aggregate per page.

_Q58_ORACLE = """
    WITH a AS (
      SELECT c_custkey, c_acctbal,
             ROW_NUMBER() OVER (ORDER BY c_custkey, c_acctbal) AS pos
      FROM customer
    ),
    b AS (
      SELECT -c_custkey AS key2, c_name,
             ROW_NUMBER() OVER (ORDER BY key2, c_name) AS pos
      FROM customer
    ),
    z AS (
      SELECT a.c_custkey, a.c_acctbal, b.key2, b.c_name
      FROM a JOIN b ON a.pos = b.pos
    ),
    p AS (
      SELECT *, CAST(FLOOR((ROW_NUMBER() OVER (ORDER BY c_custkey) - 1)
                           / 100.0) AS INT) AS page
      FROM z
    )
    SELECT page, COUNT(*) AS n, CAST(SUM(key2) AS BIGINT) AS sum_key2,
           ROUND(SUM(c_acctbal) + 5e-10, 2) AS sum_bal,
           MIN(c_name) AS first_name
    FROM p GROUP BY page
"""


@register(
    "q58_zip_pages",
    _Q58_ORACLE,
    doc="Row-position zip of two deterministic orderings (row_number "
    "over explicit sort + equi-join on position) chunked into fixed "
    "pages; exercises J4 positional concat and T5 pagination.",
)
def q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    from model_presto_spark.operators.grid import positional_concat
    from model_presto_spark.operators.splits import paginate

    cust = _t(spark, sf_dir, "customer")
    a = cust.select("c_custkey", "c_acctbal")
    b = cust.select((-F.col("c_custkey")).alias("key2"), "c_name")
    z = positional_concat(a, b)
    p = paginate(z, ["c_custkey"], 100)
    return p.groupBy("page").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("key2").alias("sum_key2"),
        F.round(F.sum("c_acctbal") + 5e-10, 2).alias("sum_bal"),
        F.min("c_name").alias("first_name"),
    )


# ---------------------------------------------------------------------------
# Q59 — raster<->vector spatial join (J8/J9) with bbox prefilter (P11)
# ---------------------------------------------------------------------------
# Points on a 73x61 pseudo-random lattice from customer keys; two
# disjoint literal polygons (a pentagon and a concave quad, no
# horizontal edges so the ray-cast never divides by zero). The oracle
# unrolls the identical even-odd crossing test over a VALUES edge
# table — same IEEE arithmetic, term for term.

_GEO_A = (
    '{"type":"Polygon","coordinates":[[[0.0,0.1],[5.3,2.2],[8.1,7.4],'
    "[2.6,9.3],[-2.2,5.1],[0.0,0.1]]]}"
)
_GEO_B = (
    '{"type":"Polygon","coordinates":[[[-14.0,-8.9],[-6.2,-7.8],'
    "[-9.5,-3.1],[-12.7,-5.9],[-14.0,-8.9]]]}"
)

_Q59_ORACLE = """
    WITH pts AS (
      SELECT c_custkey,
             (c_custkey % 73) * 0.4 - 14.463 AS lon,
             (c_custkey % 61) * 0.3 - 9.039 AS lat
      FROM customer
    ),
    edges(label, x1, y1, x2, y2) AS (VALUES
      ('A', 0.0, 0.1, 5.3, 2.2), ('A', 5.3, 2.2, 8.1, 7.4),
      ('A', 8.1, 7.4, 2.6, 9.3), ('A', 2.6, 9.3, -2.2, 5.1),
      ('A', -2.2, 5.1, 0.0, 0.1),
      ('B', -14.0, -8.9, -6.2, -7.8), ('B', -6.2, -7.8, -9.5, -3.1),
      ('B', -9.5, -3.1, -12.7, -5.9), ('B', -12.7, -5.9, -14.0, -8.9)
    ),
    cr AS (
      SELECT p.c_custkey, e.label,
             CASE WHEN ((e.y1 > p.lat AND e.y2 <= p.lat)
                        OR (e.y2 > p.lat AND e.y1 <= p.lat))
                  AND (e.x1 + (p.lat - e.y1) / (e.y2 - e.y1)
                       * (e.x2 - e.x1) > p.lon)
             THEN 1 ELSE 0 END AS c
      FROM pts p CROSS JOIN edges e
    ),
    hit AS (
      SELECT c_custkey, label FROM cr
      GROUP BY c_custkey, label HAVING SUM(c) % 2 = 1
    ),
    lab AS (
      SELECT p.c_custkey, COALESCE(h.label, 'none') AS zone
      FROM pts p LEFT JOIN hit h ON p.c_custkey = h.c_custkey
    )
    SELECT zone, COUNT(*) AS n_pts, CAST(SUM(c_custkey) AS BIGINT) AS sum_key
    FROM lab GROUP BY zone
"""


@register(
    "q59_spatial_join",
    _Q59_ORACLE,
    doc="Point-in-polygon label join: broadcast polygon dim with "
    "precomputed bboxes, bbox prefilter, exact even-odd ray-cast as "
    "pure array expressions — big side never shuffles.",
)
def q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    from model_presto_spark.sources.vector import spatial_label_join

    cust = _t(spark, sf_dir, "customer")
    pts = cust.select(
        "c_custkey",
        ((F.col("c_custkey") % 73) * 0.4 - 14.463).alias("lon"),
        ((F.col("c_custkey") % 61) * 0.3 - 9.039).alias("lat"),
    )
    polys = spark.createDataFrame(
        [(_GEO_A, "A"), (_GEO_B, "B")], "geometry_json string, label string"
    )
    labeled = spatial_label_join(pts, polys, "lon", "lat")
    return labeled.groupBy(
        F.coalesce(F.col("label"), F.lit("none")).alias("zone")
    ).agg(
        F.count(F.lit(1)).alias("n_pts"),
        F.sum("c_custkey").alias("sum_key"),
    )
