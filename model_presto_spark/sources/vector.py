"""GeoJSON vector scans (S1/S2) and geometry helpers.

Reference semantics: label tables arrive as GeoJSON feature
collections — geometry + class attributes — read via geopandas
(reference: src/crop_mapping_processing_data_collection_monthly.py:166-193,
src/common.py:55-78, presto-tolbi/presto/eval/fuel_moisture_eval.py:69;
GCS variant ..._monthly.py:745-749).

Spark-first: ``spark.read.json(multiLine)`` parses the collection;
``explode(features)`` yields one row per feature with the geometry
kept as a JSON string column (WKT-free: no geo lib in the hot path)
plus typed property columns. Object-store paths (s3://, gs://) work
unchanged through the Hadoop filesystem layer. Geometry math that
needs shapely/pyproj stays in clearly-marked UDF modules, keeping
the relational core pure.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def read_geojson(spark: SparkSession, path: str) -> DataFrame:
    """One row per feature: (geometry_type, geometry_json,
    properties as map<string,string>).

    Property typing is left to the caller (cast columns out of the
    map) because GeoJSON properties are schemaless; the reference
    normalizes/filters them immediately after load
    (..._monthly.py:669-684).
    """
    raw = spark.read.option("multiLine", "true").json(path)
    feats = raw.select(F.explode("features").alias("f"))
    return feats.select(
        F.col("f.geometry.type").alias("geometry_type"),
        F.to_json(F.col("f.geometry")).alias("geometry_json"),
        F.col("f.properties").alias("properties"),
    )


def geojson_polygon_bbox(geometry_json: Column) -> Column:
    """(min_lon, min_lat, max_lon, max_lat) struct from a GeoJSON
    Polygon's JSON string — the bbox prefilter the spatial join uses
    before exact point-in-polygon (SURVEY §4 custom work #4).

    Pure JSON/array expressions: from_json to a nested array, then
    array min/max over the outer ring. No geometry library.
    """
    coords = F.from_json(
        F.get_json_object(geometry_json, "$.coordinates"),
        "array<array<array<double>>>",
    )
    ring = F.element_at(coords, 1)
    lons = F.transform(ring, lambda p: F.element_at(p, 1))
    lats = F.transform(ring, lambda p: F.element_at(p, 2))
    return F.struct(
        F.array_min(lons).alias("min_lon"),
        F.array_min(lats).alias("min_lat"),
        F.array_max(lons).alias("max_lon"),
        F.array_max(lats).alias("max_lat"),
    )


def bbox_contains(bbox: Column, lon: Column, lat: Column) -> Column:
    """Point-in-bbox predicate (P11 spatial bounds)."""
    return (
        (lon >= bbox["min_lon"])
        & (lon <= bbox["max_lon"])
        & (lat >= bbox["min_lat"])
        & (lat <= bbox["max_lat"])
    )


def geojson_outer_ring(geometry_json: Column) -> Column:
    """Parse a GeoJSON Polygon's outer ring to array<array<double>>.

    Parse ONCE on the (small) polygon side, before broadcast — never
    inside a join condition, where it would re-run per row pair.
    """
    coords = F.from_json(
        F.get_json_object(geometry_json, "$.coordinates"),
        "array<array<array<double>>>",
    )
    return F.element_at(coords, 1)


def point_in_polygon(geometry_json: Column, lon: Column, lat: Column) -> Column:
    """Exact even-odd point-in-polygon test against a GeoJSON Polygon
    outer ring (J8 raster<->vector join), as pure array expressions.
    Parses per call — prefer ``point_in_ring`` over a pre-parsed ring
    column in join conditions."""
    return point_in_ring(geojson_outer_ring(geometry_json), lon, lat)


def point_in_ring(ring: Column, lon: Column, lat: Column) -> Column:
    """Even-odd ray-cast against a pre-parsed ring (closed: last ==
    first vertex). Counts ring edges crossing the horizontal ray from
    (lon, lat) via aggregate over consecutive vertex pairs —
    JVM-side, no shapely. Combine with ``bbox_contains`` as the cheap
    prefilter so the exact test runs only on bbox-surviving pairs.
    """
    n = F.size(ring)
    # edges i -> i+1 (ring is closed: last == first in GeoJSON)
    crossings = F.aggregate(
        F.sequence(F.lit(1), n - 1),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            _edge_crosses(
                F.element_at(ring, i), F.element_at(ring, i + 1), lon, lat
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    odd = F.pmod(crossings, F.lit(2)) == 1
    # lon/lat must ALSO appear outside the lambda body: Catalyst
    # computes this conjunct's references from the top-level tree
    # only, and when lon/lat are captured solely inside the HOF
    # lambda a join using this predicate can mis-classify it as
    # single-sided and push it to the polygon side (observed as an
    # intermittent INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND under AQE
    # re-optimization). The CASE WHEN is one non-splittable conjunct
    # referencing both sides; for non-null inputs it is identical.
    return F.when(lat.isNotNull() & lon.isNotNull(), odd).otherwise(F.lit(False))


def _edge_crosses(p1: Column, p2: Column, lon: Column, lat: Column) -> Column:
    x1, y1 = F.element_at(p1, 1), F.element_at(p1, 2)
    x2, y2 = F.element_at(p2, 1), F.element_at(p2, 2)
    straddles = ((y1 > lat) & (y2 <= lat)) | ((y2 > lat) & (y1 <= lat))
    x_at = x1 + (lat - y1) / (y2 - y1) * (x2 - x1)
    return straddles & (x_at > lon)


def spatial_label_join(
    points: DataFrame,
    polygons: DataFrame,
    lon_col: str,
    lat_col: str,
    geometry_col: str = "geometry_json",
    label_col: str = "label",
) -> DataFrame:
    """Assign each point the label of a containing polygon (J8
    rasterize semantics: ..._monthly.py:490-525).

    Plan shape: broadcast the (small) polygon table with precomputed
    bboxes, bbox-prefilter the cross join (cheap comparisons), then
    the exact ray-cast only on survivors. Points table stays fully
    distributed; no shuffle of the big side.
    """
    # Parse rings/bboxes ONCE and materialize (localCheckpoint) the
    # tiny polygon dim. This is both the scale plan (parsing must not
    # re-run per point-polygon pair inside the join condition) and a
    # correctness guard: letting the optimizer collapse this projection
    # into the nested-loop join condition intermittently mis-binds the
    # HOF lambda attributes (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND).
    polys = polygons.select(
        F.col(label_col).alias(label_col),
        geojson_outer_ring(F.col(geometry_col)).alias("__ring"),
        geojson_polygon_bbox(F.col(geometry_col)).alias("__bbox"),
    ).localCheckpoint(eager=False)
    lon, lat = F.col(lon_col), F.col(lat_col)
    joined = points.join(
        F.broadcast(polys),
        bbox_contains(F.col("__bbox"), lon, lat)
        & point_in_ring(F.col("__ring"), lon, lat),
        "left",
    )
    return joined.drop("__ring", "__bbox")
