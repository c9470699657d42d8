"""Geodesic/projection expressions (F16/F22/F23) — native column
arithmetic, no pyproj/shapely in the hot path.

Reference semantics: lat/lon -> unit-sphere xyz for the model's
location encoding (reference: presto-tolbi/presto/presto.py:299-309
``cartesian``), metres-per-degree local scaling
(presto-tolbi/presto/eval/croptype_france_eval.py:167-184), CRS
reprojection via pyproj (src/common.py:32-49,
presto-tolbi/presto/eval/treesat_eval.py:115-117) and centroid/buffer
geometry helpers (src/common.py:55-78,
..._monthly.py:147-161).

The projections implemented natively here (Web Mercator, local
equirectangular metres) are closed-form trig — exactly the kind of
expression whole-stage codegen eats. A general pyproj UDF is the
escape hatch for exotic CRSs and is deliberately NOT provided: keep
the relational core pure, decode at the edges.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

WGS84_RADIUS_M = 6378137.0
DEG_LAT_M = 111_320.0  # metres per degree latitude (spherical approx)


def latlon_to_unit_sphere(lat: Column, lon: Column) -> Column:
    """(lat, lon) degrees -> [x, y, z] on the unit sphere
    (presto.py:299-309 cartesian encoding)."""
    la, lo = F.radians(lat), F.radians(lon)
    return F.array(
        F.cos(la) * F.cos(lo),
        F.cos(la) * F.sin(lo),
        F.sin(la),
    )


def web_mercator(lat: Column, lon: Column) -> Column:
    """EPSG:3857 metres as struct(x, y) — the closed-form spherical
    Mercator projection (F22 for the web-tiling CRS)."""
    x = F.radians(lon) * WGS84_RADIUS_M
    y = F.log(F.tan(F.lit(math.pi / 4.0) + F.radians(lat) / 2.0)) * WGS84_RADIUS_M
    return F.struct(x.alias("x"), y.alias("y"))


def local_metres(lat: Column, lon: Column, lat0: Column, lon0: Column) -> Column:
    """Equirectangular local metres offsets from (lat0, lon0) —
    the reference's metres-per-degree trick for neighborhood math
    (croptype_france_eval.py:167-184)."""
    dx = (lon - lon0) * F.lit(DEG_LAT_M) * F.cos(F.radians(lat0))
    dy = (lat - lat0) * F.lit(DEG_LAT_M)
    return F.struct(dx.alias("dx_m"), dy.alias("dy_m"))


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in metres."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dp = F.radians(lat2 - lat1) / 2.0
    dl = F.radians(lon2 - lon1) / 2.0
    a = F.sin(dp) * F.sin(dp) + F.cos(p1) * F.cos(p2) * F.sin(dl) * F.sin(dl)
    return 2.0 * F.lit(WGS84_RADIUS_M) * F.asin(F.sqrt(a))


def square_buffer_bbox(lat: Column, lon: Column, half_side_m: Column) -> Column:
    """Square buffer around a point as a bbox struct (F23: the
    reference buffers label centroids into square EE regions,
    src/common.py:55-78). Pure arithmetic inverse of local_metres."""
    dlat = half_side_m / F.lit(DEG_LAT_M)
    dlon = half_side_m / (F.lit(DEG_LAT_M) * F.cos(F.radians(lat)))
    return F.struct(
        (lon - dlon).alias("min_lon"),
        (lat - dlat).alias("min_lat"),
        (lon + dlon).alias("max_lon"),
        (lat + dlat).alias("max_lat"),
    )
