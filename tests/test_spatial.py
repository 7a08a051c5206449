"""Spatial filter/refine vs brute-force oracle — mirrors
tests/spatial-query-tests.lisp over deterministic synthetic coordinates
derived from customer keys (no external data needed)."""

import pytest
from pyspark.sql import functions as F

from vivace_graph_v3_spark.functions.geohash import (
    geohash_encode, geohash_decode, geohash_bbox, geohash_neighbors,
    geohash_covering)
from vivace_graph_v3_spark.functions.geometry import haversine_py, point_in_ring
from vivace_graph_v3_spark.operators.spatial import (
    with_geohash, find_nodes_near, find_nearest_k, find_nodes_within)

CENTER = (49.2020, 37.1724)  # the example.lisp:94-101 disc center


@pytest.fixture(scope="module")
def geo_df(spark, tpch):
    # deterministic coords in a ~0.5 degree box around CENTER
    df = (tpch.scan_vertices("customer", columns=["id", "c_custkey"])
          .withColumn("lat", F.lit(CENTER[0]) + (F.col("c_custkey") % 100 - 50) / 100.0)
          .withColumn("lon", F.lit(CENTER[1]) + ((F.col("c_custkey") * 7) % 100 - 50) / 100.0))
    return with_geohash(df, precision=6).cache()


def test_geohash_roundtrip_known_value():
    # public test vector: ezs42 = (42.6, -5.6)
    assert geohash_encode(42.6, -5.6, 5) == "ezs42"
    lat, lon = geohash_decode("ezs42")
    assert abs(lat - 42.6) < 0.03 and abs(lon + 5.6) < 0.03


def test_geohash_bbox_contains_point():
    gh = geohash_encode(*CENTER, 7)
    lat_lo, lat_hi, lon_lo, lon_hi = geohash_bbox(gh)
    assert lat_lo <= CENTER[0] <= lat_hi
    assert lon_lo <= CENTER[1] <= lon_hi


def test_geohash_neighbors():
    n = geohash_neighbors("ezs42")
    assert len(n) == 8 and "ezs42" not in n
    # all neighbors share scale; adjacency: each neighbor's bbox touches ours
    lat_lo, lat_hi, lon_lo, lon_hi = geohash_bbox("ezs42")
    for g in n:
        a, b, c, d = geohash_bbox(g)
        assert not (b < lat_lo - 1e-9 or a > lat_hi + 1e-9
                    or d < lon_lo - 1e-9 or c > lon_hi + 1e-9)


def test_geohash_prefix_range():
    from vivace_graph_v3_spark.functions import geohash_prefix_range

    lo, hi = geohash_prefix_range("ezs")
    assert (lo, hi) == ("ezs", "ezt")
    # every hash with the prefix falls in [lo, hi); siblings don't
    assert lo <= "ezs42" < hi
    assert not (lo <= "ezt00" < hi) and not (lo <= "ezr99" < hi)
    # carry through trailing 'z'
    assert geohash_prefix_range("ezz") == ("ezz", "f")
    assert geohash_prefix_range("zz")[1] > "zzzzzzzzzzzz"


def test_covering_covers():
    cells = geohash_covering(49.0, 49.4, 37.0, 37.4, 5)
    for lat, lon in [(49.0, 37.0), (49.4, 37.4), (49.2, 37.2)]:
        assert geohash_encode(lat, lon, 5) in cells


def test_find_nodes_near_matches_bruteforce(geo_df):
    radius = 20_000.0
    got = {r["id"] for r in
           find_nodes_near(geo_df, CENTER[0], CENTER[1], radius).collect()}
    rows = geo_df.select("id", "lat", "lon").collect()
    want = {r["id"] for r in rows
            if haversine_py(r["lat"], r["lon"], *CENTER) <= radius}
    assert got == want and len(want) > 0


def test_find_nearest_k(geo_df):
    k = 5
    got = [r["id"] for r in
           find_nearest_k(geo_df, CENTER[0], CENTER[1], k,
                          max_radius_m=200_000).collect()]
    rows = geo_df.select("id", "lat", "lon").collect()
    want = sorted(rows, key=lambda r: (haversine_py(r["lat"], r["lon"], *CENTER),
                                       r["id"]))[:k]
    assert got == [r["id"] for r in want]


def test_find_nodes_within_polygon(geo_df):
    # rectangle (lon, lat) ring around the center
    poly = [[(37.0, 49.0), (37.3, 49.0), (37.3, 49.3), (37.0, 49.3),
             (37.0, 49.0)]]
    got = {r["id"] for r in find_nodes_within(geo_df, poly).collect()}
    rows = geo_df.select("id", "lat", "lon").collect()
    want = {r["id"] for r in rows
            if point_in_ring(r["lat"], r["lon"], poly[0])}
    assert got == want and len(want) > 0
