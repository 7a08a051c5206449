"""Geometry scalar functions — Spark analogs of geometry-ops.lisp.

- ``haversine_m``: geodesic distance in meters (geometry-ops.lisp:19-31) as a
  pure Column expression — stays inside whole-stage codegen, no UDF.
- ``point_in_polygon``: ray-casting refine test (geometry-ops.lisp:32-66) as
  a vectorized pandas UDF (the refine stage runs on candidate sets already
  cut down by the geohash cell filter, so the Python cost is bounded).
- ``bbox_overlap``: cheap bbox prefilter (geometry-ops.lisp:67-78).
- Exact-topology ops (GEOS add-on, geometry-ops.lisp:94-190) keep the same
  optional seam: Shapely-backed if available, dependency-free fallbacks else.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

EARTH_RADIUS_M = 6_371_000.0  # mean radius, matches geometry-ops.lisp:19


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters, all-JVM expression."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = (F.sin(dlat) ** 2
         + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) ** 2)
    return F.lit(2 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def haversine_py(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    """Driver-side twin of :func:`haversine_m` (same formula, same radius)."""
    rlat1, rlat2 = math.radians(lat1), math.radians(lat2)
    dlat = math.radians(lat2 - lat1) / 2
    dlon = math.radians(lon2 - lon1) / 2
    a = math.sin(dlat) ** 2 + math.cos(rlat1) * math.cos(rlat2) * math.sin(dlon) ** 2
    return 2 * EARTH_RADIUS_M * math.asin(math.sqrt(a))


def point_in_ring(lat: float, lon: float, ring: list[tuple[float, float]]) -> bool:
    """Ray casting, ring = [(lon, lat), ...] closed or open
    (point-in-ring-p, geometry-ops.lisp:32-47)."""
    inside = False
    n = len(ring)
    j = n - 1
    for i in range(n):
        xi, yi = ring[i]
        xj, yj = ring[j]
        if ((yi > lat) != (yj > lat)) and (
                lon < (xj - xi) * (lat - yi) / (yj - yi) + xi):
            inside = not inside
        j = i
    return inside


def point_in_polygon_udf(polygon: list[list[tuple[float, float]]]):
    """Vectorized membership test against a fixed polygon (outer ring +
    holes, geometry-ops.lisp:48-66). Returns a pandas UDF(lat, lon)->bool."""
    rings = [[(float(x), float(y)) for x, y in ring] for ring in polygon]

    @pandas_udf(BooleanType())
    def _pip(lat, lon):
        import pandas as pd

        def test(la, lo):
            if not point_in_ring(la, lo, rings[0]):
                return False
            return not any(point_in_ring(la, lo, hole) for hole in rings[1:])

        return pd.Series([test(la, lo) for la, lo in zip(lat, lon)])

    return _pip


def bbox_overlap(lat_min1, lat_max1, lon_min1, lon_max1,
                 lat_min2, lat_max2, lon_min2, lon_max2) -> bool:
    """bbox-overlap-p (geometry-ops.lisp:67-78)."""
    return not (lat_max1 < lat_min2 or lat_max2 < lat_min1
                or lon_max1 < lon_min2 or lon_max2 < lon_min1)


def polygon_bbox(polygon) -> tuple[float, float, float, float]:
    """(lat_min, lat_max, lon_min, lon_max) of an outer ring."""
    lats = [p[1] for p in polygon[0]]
    lons = [p[0] for p in polygon[0]]
    return min(lats), max(lats), min(lons), max(lons)


# Optional exact-topology seam (GEOS add-on parity, geometry-ops.lisp:94-190):
try:  # pragma: no cover - shapely not in this container
    import shapely  # noqa: F401

    HAVE_SHAPELY = True
except ImportError:
    HAVE_SHAPELY = False


def geometry_intersects(poly_a, poly_b) -> bool:
    """Exact if shapely present; bbox-overlap fallback otherwise (the same
    degradation contract as the reference's dependency-free fallbacks)."""
    if HAVE_SHAPELY:  # pragma: no cover
        from shapely.geometry import Polygon

        return Polygon(poly_a[0]).intersects(Polygon(poly_b[0]))
    return bbox_overlap(*polygon_bbox(poly_a), *polygon_bbox(poly_b))
