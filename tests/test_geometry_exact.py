"""Exact-geometry kernel parity tests (geometry-ops.lisp:94-190 surface):
hand-computable polygons, checked against closed-form answers.  These are the
dependency-free fallbacks the reference only *signals* for — here every op
returns a working result (documented approximations: buffer on concave rings,
epsilon-perturbed degenerate clipping)."""

import math

import pytest

from vivace_graph_v3_spark.functions.geometry_exact import (
    GeosRequiredForOperation, clip_polygons, convex_hull, make_valid,
    point_in_polygon, polygon_area, polygon_buffer, polygon_difference,
    polygon_distance, polygon_intersection, polygon_intersects,
    polygon_perimeter, polygon_union, ring_area, segments_intersect,
)

SQ = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]          # 4x4 square
SQ_SHIFT = [(2.0, 2.0), (6.0, 2.0), (6.0, 6.0), (2.0, 6.0)]    # overlaps 2x2
SQ_FAR = [(10.0, 10.0), (11.0, 10.0), (11.0, 11.0), (10.0, 11.0)]
TRI = [(0.0, 0.0), (6.0, 0.0), (0.0, 6.0)]


def test_shoelace_area_and_perimeter():
    assert ring_area(SQ) == 16.0
    assert ring_area(list(reversed(SQ))) == -16.0
    assert polygon_area([SQ]) == 16.0
    assert polygon_area([TRI]) == 18.0
    # square with a 1x1 hole
    hole = [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0)]
    assert polygon_area([SQ, hole]) == 15.0
    assert polygon_perimeter([SQ]) == 16.0
    assert polygon_perimeter([TRI]) == pytest.approx(12 + math.sqrt(72))


def test_segment_intersection_cases():
    assert segments_intersect((0, 0), (4, 4), (0, 4), (4, 0))      # cross
    assert segments_intersect((0, 0), (4, 0), (2, 0), (6, 0))      # collinear
    assert segments_intersect((0, 0), (4, 0), (4, 0), (4, 4))      # endpoint
    assert not segments_intersect((0, 0), (4, 0), (0, 1), (4, 1))  # parallel
    assert not segments_intersect((0, 0), (1, 1), (2, 2.5), (3, 4))


def test_polygon_intersects_exact_not_bbox():
    # bboxes overlap but polygons don't: two diagonal slivers
    a = [[(0.0, 0.0), (10.0, 10.0), (9.0, 10.0)]]
    b = [[(10.0, 0.0), (1.0, 0.5), (10.0, 1.0)]]
    assert polygon_intersects(a, b) is False    # bbox test would say True
    assert polygon_intersects([SQ], [SQ_SHIFT]) is True
    assert polygon_intersects([SQ], [SQ_FAR]) is False
    # containment without edge crossing
    inner = [[(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0)]]
    assert polygon_intersects([SQ], inner) is True
    # ... but inside a hole = disjoint
    hole = [(0.5, 0.5), (3.0, 0.5), (3.0, 3.0), (0.5, 3.0)]
    assert polygon_intersects([SQ, hole], inner) is False


def test_clip_intersection_union_difference_areas():
    inter = polygon_intersection([SQ], [SQ_SHIFT])
    assert len(inter) == 1
    assert abs(ring_area(inter[0])) == pytest.approx(4.0)       # 2x2 overlap
    union = polygon_union([SQ], [SQ_SHIFT])
    assert sum(abs(ring_area(r)) for r in union) == pytest.approx(28.0)
    diff = polygon_difference([SQ], [SQ_SHIFT])
    assert sum(abs(ring_area(r)) for r in diff) == pytest.approx(12.0)


def test_clip_disjoint_and_nested():
    assert polygon_intersection([SQ], [SQ_FAR]) == []
    u = polygon_union([SQ], [SQ_FAR])
    assert sum(abs(ring_area(r)) for r in u) == pytest.approx(17.0)
    inner = [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0)]
    inter = polygon_intersection([SQ], [inner])
    assert abs(ring_area(inter[0])) == pytest.approx(1.0)
    # A - nested B = outer ring + hole ring
    diff = polygon_difference([SQ], [inner])
    assert abs(ring_area(diff[0])) == pytest.approx(16.0)
    assert abs(ring_area(diff[1])) == pytest.approx(1.0)


def test_clip_degenerate_shared_vertex():
    # shares corner (4,4) — degenerate for classic GH; epsilon path
    touching = [(4.0, 4.0), (8.0, 4.0), (8.0, 8.0), (4.0, 8.0)]
    inter = polygon_intersection([SQ], [touching])
    got = sum(abs(ring_area(r)) for r in inter)
    assert got == pytest.approx(0.0, abs=1e-6)


def test_triangle_square_clip():
    inter = polygon_intersection([TRI], [SQ])
    # triangle x=0..6,y<=6-x clipped to 4x4 square: area 18 - 2 = 16? no:
    # overlap = square minus the corner above x+y=6 => 16 - 2 = 14
    assert sum(abs(ring_area(r)) for r in inter) == pytest.approx(14.0)


def test_convex_hull_and_buffer():
    pts = [(0, 0), (4, 0), (4, 4), (0, 4), (2, 2), (1, 1)]
    hull = convex_hull(pts)
    assert abs(ring_area(hull)) == 16.0
    buf = polygon_buffer([SQ], 1.0, quadrant_segments=64)
    # buffered square area -> 16 + perimeter*w + pi*w^2
    want = 16.0 + 16.0 * 1.0 + math.pi
    assert abs(ring_area(buf[0])) == pytest.approx(want, rel=1e-3)
    with pytest.raises(GeosRequiredForOperation):
        polygon_buffer([SQ], -1.0)


def test_make_valid_cleanup_and_refusal():
    messy = [(0.0, 0.0), (2.0, 0.0), (4.0, 0.0), (4.0, 0.0), (4.0, 4.0),
             (0.0, 4.0), (0.0, 0.0)]  # collinear + dup + explicit closure
    fixed = make_valid([list(reversed(messy))])  # also cw -> ccw
    ring = fixed[0]
    start = ring.index(min(ring))
    assert ring[start:] + ring[:start] == [
        (0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]
    assert ring_area(ring) > 0
    bowtie = [(0.0, 0.0), (4.0, 4.0), (4.0, 0.0), (0.0, 4.0)]
    with pytest.raises(GeosRequiredForOperation):
        make_valid([bowtie])


def test_polygon_distance():
    assert polygon_distance([SQ], [SQ_SHIFT]) == 0.0
    # unit square at (10,10): closest approach is corner-to-corner
    assert polygon_distance([SQ], [SQ_FAR]) == pytest.approx(
        math.dist((4, 4), (10, 10)))
    # edge-facing squares: axis distance
    right = [[(6.0, 0.0), (8.0, 0.0), (8.0, 4.0), (6.0, 4.0)]]
    assert polygon_distance([SQ], right) == pytest.approx(2.0)


def test_point_in_polygon_with_hole():
    hole = [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0)]
    assert point_in_polygon((3.0, 3.0), [SQ, hole])
    assert not point_in_polygon((1.5, 1.5), [SQ, hole])
    assert point_in_polygon((0.0, 2.0), [SQ])       # boundary counts
    assert not point_in_polygon((5.0, 5.0), [SQ])


# -- property-based invariants (hypothesis) ---------------------------------

from hypothesis import given, settings, strategies as st

_coord = st.floats(min_value=-50, max_value=50, allow_nan=False,
                   allow_infinity=False).map(lambda x: round(x, 3))


def _random_convex(points):
    """Convex polygon from arbitrary points via hull; None if degenerate."""
    hull = convex_hull(points)
    if len(hull) < 3 or abs(ring_area(hull)) < 1e-6:
        return None
    return [hull]


_convex_poly = (st.lists(st.tuples(_coord, _coord), min_size=4, max_size=10)
                .map(_random_convex).filter(lambda p: p is not None))

_FAST = settings(max_examples=60, deadline=None)


@_FAST
@given(a=_convex_poly, b=_convex_poly)
def test_clip_area_invariants(a, b):
    """For arbitrary convex polygons: area(a∩b) <= min areas,
    area(a∪b) = area(a) + area(b) - area(a∩b) (inclusion-exclusion), and
    area(a\\b) = area(a) - area(a∩b)."""
    from vivace_graph_v3_spark.functions.geometry_exact import rings_area

    area_a, area_b = polygon_area(a), polygon_area(b)
    ai = rings_area(polygon_intersection(a, b))
    au = rings_area(polygon_union(a, b))
    ad = rings_area(polygon_difference(a, b))
    tol = 1e-4 * max(area_a, area_b, 1.0)
    assert ai <= min(area_a, area_b) + tol
    assert abs(au - (area_a + area_b - ai)) < tol
    assert abs(ad - (area_a - ai)) < tol


@_FAST
@given(a=_convex_poly, b=_convex_poly)
def test_intersects_symmetric_and_consistent_with_clip(a, b):
    """intersects(a,b) == intersects(b,a); positive-area intersection
    implies intersects."""
    from vivace_graph_v3_spark.functions.geometry_exact import rings_area

    assert polygon_intersects(a, b) == polygon_intersects(b, a)
    if rings_area(polygon_intersection(a, b)) > 1e-6:
        assert polygon_intersects(a, b)


@_FAST
@given(p=_convex_poly, w=st.floats(min_value=0.1, max_value=5.0))
def test_buffer_grows_and_contains(p, w):
    """buffer(p, w) has area >= area(p) and contains every vertex of p."""
    buf = polygon_buffer(p, w)
    assert polygon_area(buf) >= polygon_area(p) - 1e-9
    for v in p[0]:
        assert point_in_polygon(v, buf) or any(
            abs(v[0]-q[0]) + abs(v[1]-q[1]) < 1e-9 for q in buf[0])
