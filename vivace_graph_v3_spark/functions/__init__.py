from vivace_graph_v3_spark.functions.geometry import haversine_m
from vivace_graph_v3_spark.functions.geohash import (
    geohash_encode, geohash_decode, geohash_bbox, geohash_neighbors,
    geohash_covering, geohash_prefix_range)
from vivace_graph_v3_spark.functions.term_order import (
    variant_key, variant_lit, variant_sort_key)

__all__ = [
    "haversine_m",
    "geohash_encode",
    "geohash_decode",
    "geohash_bbox",
    "geohash_neighbors",
    "geohash_covering",
    "geohash_prefix_range",
    "variant_key",
    "variant_lit",
    "variant_sort_key",
]
