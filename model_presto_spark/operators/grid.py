"""Grid/raster relational operators: bilinear resample, terrain
derivatives, chip tiling, positional concat (F24/F25, W8, J4).

The reference does these with rasterio/EE on in-memory arrays
(reference: bilinear resample src/test.py:11-47 and
``.resample('bilinear').reproject`` ..._monthly.py:334-337; slope/
aspect/hillshade ee.Terrain ..._monthly.py:340-345; chip tiling
src/process_data.py:64-82; positional pd.concat(axis=1)
src/optimization.py:177-181). Here rasters are long-form pixel
tables ``(row, col, value)`` and every operator is a join/window —
distributed, no per-tile array materialization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bilinear_resample(
    df: DataFrame,
    row_col: str,
    col_col: str,
    value_col: str,
    scale: float,
    out_rows: int,
    out_cols: int,
) -> DataFrame:
    """Bilinear up/down-sample a pixel grid by ``scale`` (output grid
    ``out_rows x out_cols``; source coordinate of output (i,j) is
    (i/scale, j/scale)).

    Plan shape: generate the output grid (tiny, broadcast), compute
    the four neighbor coordinates, join each against the source
    pixel table on (row, col) equality — four equi-joins, no window,
    no UDF — then blend with the fractional weights. Missing
    neighbors coalesce to the nearest available (edge clamp).
    """
    spark = df.sparkSession
    grid = (
        spark.range(out_rows)
        .select(F.col("id").alias("oi"))
        .crossJoin(spark.range(out_cols).select(F.col("id").alias("oj")))
    )
    src_i = F.col("oi") / F.lit(scale)
    src_j = F.col("oj") / F.lit(scale)
    grid = grid.select(
        "oi",
        "oj",
        F.floor(src_i).cast("int").alias("i0"),
        F.floor(src_j).cast("int").alias("j0"),
        (src_i - F.floor(src_i)).alias("fi"),
        (src_j - F.floor(src_j)).alias("fj"),
    )
    px = df.select(
        F.col(row_col).alias("pi"), F.col(col_col).alias("pj"),
        F.col(value_col).alias("pv"),
    )

    def corner(di: int, dj: int, alias: str) -> DataFrame:
        return px.select(
            (F.col("pi") - di).alias("i0"),
            (F.col("pj") - dj).alias("j0"),
            F.col("pv").alias(alias),
        )

    out = (
        F.broadcast(grid)
        .join(corner(0, 0, "v00"), ["i0", "j0"], "left")
        .join(corner(0, 1, "v01"), ["i0", "j0"], "left")
        .join(corner(1, 0, "v10"), ["i0", "j0"], "left")
        .join(corner(1, 1, "v11"), ["i0", "j0"], "left")
    )
    v00 = F.coalesce("v00", "v01", "v10", "v11")
    v01 = F.coalesce("v01", "v00", "v11", "v10")
    v10 = F.coalesce("v10", "v11", "v00", "v01")
    v11 = F.coalesce("v11", "v10", "v01", "v00")
    fi, fj = F.col("fi"), F.col("fj")
    blended = (
        v00 * (1 - fi) * (1 - fj)
        + v01 * (1 - fi) * fj
        + v10 * fi * (1 - fj)
        + v11 * fi * fj
    )
    return out.select(
        F.col("oi").alias("row"), F.col("oj").alias("col"),
        blended.alias("value"),
    )


def terrain_derivatives(
    df: DataFrame,
    row_col: str,
    col_col: str,
    elev_col: str,
    cell_size: float = 1.0,
) -> DataFrame:
    """Slope and aspect from an elevation grid via central finite
    differences (ee.Terrain.slope/aspect semantics,
    ..._monthly.py:340-345).

    dz/dx and dz/dy come from lag/lead windows over row-major and
    col-major orderings — two windows, no self-join, edge rows keep
    one-sided differences via coalesce.
    """
    wr = Window.partitionBy(row_col).orderBy(col_col)
    wc = Window.partitionBy(col_col).orderBy(row_col)
    e = F.col(elev_col)
    dzdx = (
        F.coalesce(F.lead(e, 1).over(wr), e) - F.coalesce(F.lag(e, 1).over(wr), e)
    ) / (
        (
            F.when(F.lead(e, 1).over(wr).isNotNull(), 1).otherwise(0)
            + F.when(F.lag(e, 1).over(wr).isNotNull(), 1).otherwise(0)
        ).cast("double")
        * F.lit(cell_size)
    )
    dzdy = (
        F.coalesce(F.lead(e, 1).over(wc), e) - F.coalesce(F.lag(e, 1).over(wc), e)
    ) / (
        (
            F.when(F.lead(e, 1).over(wc).isNotNull(), 1).otherwise(0)
            + F.when(F.lag(e, 1).over(wc).isNotNull(), 1).otherwise(0)
        ).cast("double")
        * F.lit(cell_size)
    )
    out = df.withColumn("__dzdx", dzdx).withColumn("__dzdy", dzdy)
    slope = F.degrees(
        F.atan(F.sqrt(F.col("__dzdx") ** 2 + F.col("__dzdy") ** 2))
    )
    aspect = F.degrees(F.atan2(F.col("__dzdy"), -F.col("__dzdx")))
    return out.select(
        *df.columns, slope.alias("slope_deg"), aspect.alias("aspect_deg")
    )


def chip_key(row: Column, col: Column, chip_size: int) -> Column:
    """(chip_row, chip_col) partition key for chip tiling (W8,
    src/process_data.py:66-82)."""
    return F.struct(
        F.floor(row / chip_size).alias("chip_row"),
        F.floor(col / chip_size).alias("chip_col"),
    )


def positional_concat(a: DataFrame, b: DataFrame) -> DataFrame:
    """Align two DataFrames by implicit row order (J4,
    pd.concat(axis=1) semantics, src/optimization.py:177-181).

    Spark has no row order: both sides get a row_number over an
    explicit global ordering of ALL columns, then inner-join on it.
    Requires both sides to have the same count (checked lazily by the
    inner join cardinality). Positional alignment is inherently
    order-dependent — prefer real keys; this exists for parity.
    """
    wa = Window.orderBy(*[F.col(c) for c in a.columns])
    wb = Window.orderBy(*[F.col(c) for c in b.columns])
    an = a.withColumn("__pos", F.row_number().over(wa))
    bn = b.withColumn("__pos", F.row_number().over(wb))
    return an.join(bn, "__pos", "inner").drop("__pos")


def radius_join(
    probe: DataFrame,
    build: DataFrame,
    probe_lat: str,
    probe_lon: str,
    build_lat: str,
    build_lon: str,
    radius_m: float,
    cell_deg: float,
) -> DataFrame:
    """Distance-bounded spatial join: every (probe, build) pair within
    ``radius_m`` great-circle metres, plus a ``dist_m`` column.

    Scale design (the ST_DWithin shape the reference resolves through
    geopandas buffers, src/common.py:55-78): both sides are bucketed
    into ``cell_deg``-degree lat/lon cells; the PROBE side explodes
    its 3x3 neighbor cells (x9 rows — put the smaller relation here)
    and the candidate set forms by a plain equi-join on the cell key,
    so Catalyst shuffles on (cell_lat, cell_lon) instead of building
    the full cross product; the exact haversine test then filters
    candidates. One shuffle each side, no theta-join.

    Correctness constraint (caller-checked): ``cell_deg`` degrees
    must cover ``radius_m`` in BOTH axes at every latitude present —
    i.e. cell_deg >= radius_m / (111320 * cos(max|lat|)) — else pairs
    straddling more than one cell boundary are missed.

    Column names must not collide across the two inputs.
    """
    neighbor = F.explode(
        F.array(
            *[
                F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj"))
                for di in (-1, 0, 1)
                for dj in (-1, 0, 1)
            ]
        )
    )
    p = (
        probe.withColumn("__n", neighbor)
        .withColumn(
            "__cl",
            (F.floor(F.col(probe_lat) / cell_deg) + F.col("__n.di")).cast("bigint"),
        )
        .withColumn(
            "__cn",
            (F.floor(F.col(probe_lon) / cell_deg) + F.col("__n.dj")).cast("bigint"),
        )
        .drop("__n")
    )
    b = build.withColumn(
        "__cl", F.floor(F.col(build_lat) / cell_deg).cast("bigint")
    ).withColumn("__cn", F.floor(F.col(build_lon) / cell_deg).cast("bigint"))
    from model_presto_spark.functions.geo import haversine_m

    joined = p.join(b, ["__cl", "__cn"]).withColumn(
        "dist_m",
        haversine_m(
            F.col(probe_lat), F.col(probe_lon), F.col(build_lat), F.col(build_lon)
        ),
    )
    return joined.where(F.col("dist_m") <= F.lit(float(radius_m))).drop(
        "__cl", "__cn"
    )
