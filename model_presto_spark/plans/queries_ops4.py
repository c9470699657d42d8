"""Conformance queries: operator promotions #4 (q188+) — bilinear
grid resampling (F24) and deterministic two-stream interleave (U5),
both previously unit-test-only, restated against full SQL oracles.
Oracle conventions as everywhere."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import R6_SQL, _t, r6, register

_R6 = R6_SQL


# ---------------------------------------------------------------------------
# Q188 — bilinear resample of an elevation grid (F24) + chip keys (W8)
# ---------------------------------------------------------------------------
# Source grid from customer keys (the q47 terrain convention); output
# 40x40 at scale 1.6 so the top edge exercises the clamp path. The
# oracle restates the exact four-corner plan: output grid cross
# join, four (i0,j0)-keyed left joins, coalesce edge clamps,
# fractional-weight blend.
_Q188_SCALE = 1.6
_Q188_OUT = 40

_Q188_ORACLE = f"""
    WITH px AS (
      SELECT CAST(c_custkey % 25 AS INT) AS pi,
             CAST(floor(c_custkey / 25.0) AS INT) AS pj,
             CAST(c_acctbal AS DOUBLE) AS pv
      FROM customer
    ), grid AS (
      SELECT a.i AS oi, b.j AS oj,
             CAST(floor(a.i / {_Q188_SCALE}) AS INT) AS i0,
             CAST(floor(b.j / {_Q188_SCALE}) AS INT) AS j0,
             a.i / {_Q188_SCALE} - floor(a.i / {_Q188_SCALE}) AS fi,
             b.j / {_Q188_SCALE} - floor(b.j / {_Q188_SCALE}) AS fj
      FROM (SELECT UNNEST(generate_series(0, {_Q188_OUT - 1})) AS i) a
      CROSS JOIN (SELECT UNNEST(generate_series(0, {_Q188_OUT - 1})) AS j) b
    ), joined AS (
      SELECT g.oi, g.oj, g.fi, g.fj,
             p00.pv AS v00, p01.pv AS v01, p10.pv AS v10, p11.pv AS v11
      FROM grid g
      LEFT JOIN px p00 ON p00.pi = g.i0     AND p00.pj = g.j0
      LEFT JOIN px p01 ON p01.pi = g.i0     AND p01.pj = g.j0 + 1
      LEFT JOIN px p10 ON p10.pi = g.i0 + 1 AND p10.pj = g.j0
      LEFT JOIN px p11 ON p11.pi = g.i0 + 1 AND p11.pj = g.j0 + 1
    ), clamped AS (
      SELECT oi, oj, fi, fj,
             COALESCE(v00, v01, v10, v11) AS c00,
             COALESCE(v01, v00, v11, v10) AS c01,
             COALESCE(v10, v11, v00, v01) AS c10,
             COALESCE(v11, v10, v01, v00) AS c11
      FROM joined
    )
    SELECT oi AS row, oj AS col,
           CAST(floor(oi / 8.0) AS BIGINT) AS chip_row,
           CAST(floor(oj / 8.0) AS BIGINT) AS chip_col,
           {_R6.format(x='c00 * (1 - fi) * (1 - fj) + c01 * (1 - fi) * fj '
                         '+ c10 * fi * (1 - fj) + c11 * fi * fj')} AS value
    FROM clamped
    ORDER BY oi, oj
"""


@register(
    "q188_bilinear_resample",
    _Q188_ORACLE,
    doc="Bilinear grid resample (operators/grid.bilinear_resample, "
    "F24): tiny output grid broadcasts, four (i0,j0) equi-joins "
    "fetch the corner pixels, coalesce chains clamp edges, "
    "fractional weights blend — no window, no UDF. Chip keys (W8) "
    "ride along as integer floor arithmetic. Promoted from "
    "unit-test-only to oracle-checked.",
)
def q188(spark: SparkSession, sf_dir: str) -> DataFrame:
    from model_presto_spark.operators.grid import bilinear_resample, chip_key

    cust = _t(spark, sf_dir, "customer")
    px = cust.select(
        (F.col("c_custkey") % 25).cast("int").alias("r"),
        F.floor(F.col("c_custkey") / 25.0).cast("int").alias("c"),
        F.col("c_acctbal").cast("double").alias("elev"),
    )
    out = bilinear_resample(
        px, "r", "c", "elev",
        scale=_Q188_SCALE, out_rows=_Q188_OUT, out_cols=_Q188_OUT,
    )
    ck = chip_key(F.col("row"), F.col("col"), 8)
    return out.select(
        "row",
        "col",
        ck["chip_row"].cast("bigint").alias("chip_row"),
        ck["chip_col"].cast("bigint").alias("chip_col"),
        r6(F.col("value")).alias("value"),
    ).orderBy("row", "col")


# ---------------------------------------------------------------------------
# Q189 — deterministic two-stream interleave (U5)
# ---------------------------------------------------------------------------
_Q189_ORACLE = """
    WITH a AS (
      SELECT event_id, value,
             ROW_NUMBER() OVER (ORDER BY event_id, value) AS r, 0 AS s
      FROM events WHERE event_type = 'click'
    ), b AS (
      SELECT event_id, value,
             ROW_NUMBER() OVER (ORDER BY event_id, value) AS r, 1 AS s
      FROM events WHERE event_type = 'purchase'
    ), u AS (
      SELECT * FROM a UNION ALL SELECT * FROM b
    )
    SELECT ROW_NUMBER() OVER (ORDER BY r, s) AS pos,
           event_id,
           CAST(s AS BIGINT) AS side
    FROM u
    ORDER BY pos
    LIMIT 400
"""


@register(
    "q189_interleave",
    _Q189_ORACLE,
    doc="Deterministic a0 b0 a1 b1 interleave of two event streams "
    "(operators/splits.interleave, the reference's pos/neg "
    "alternation): per-side rank + (rank, side) sort key — one "
    "union, no driver loop. The oracle restates it and pins the "
    "emitted POSITION, not just the row multiset.",
)
def q189(spark: SparkSession, sf_dir: str) -> DataFrame:
    # splits.interleave's algorithm restated with the side tag kept
    # (the operator itself drops its sort keys, so the conformance
    # output rebuilds them the same way; t:test_splits_extra pins the
    # operator's own row order)
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    a = (
        ev.filter(F.col("event_type") == "click")
        .select("event_id", "value")
        .withColumn(
            "r", F.row_number().over(Window.orderBy("event_id", "value"))
        )
        .withColumn("s", F.lit(0))
    )
    b = (
        ev.filter(F.col("event_type") == "purchase")
        .select("event_id", "value")
        .withColumn(
            "r", F.row_number().over(Window.orderBy("event_id", "value"))
        )
        .withColumn("s", F.lit(1))
    )
    u = a.unionByName(b)
    return (
        u.select(
            F.row_number().over(Window.orderBy("r", "s")).alias("pos"),
            "event_id",
            F.col("s").cast("bigint").alias("side"),
        )
        .orderBy("pos")
        .limit(400)
    )
