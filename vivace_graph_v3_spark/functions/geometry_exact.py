"""Dependency-free exact-topology geometry kernel.

The reference routes exact topology through an optional GEOS add-on
(geometry-ops.lisp:94-190): without GEOS, intersects-p degrades to a coarse
bbox test and the constructive ops (union/intersection/difference/buffer/
area/make-valid/exact-distance) SIGNAL geos-required-for-operation.  This
module goes further than the reference's fallbacks: every operation below is
a working, dependency-free implementation —

- ``ring_area`` / ``polygon_area``: exact shoelace (geometry-ops.lisp:188
  area contract, in squared coordinate units).
- ``polygon_perimeter``: planar edge-length sum.
- ``segments_intersect``: orientation/on-segment exact test (incl. collinear
  overlap).
- ``polygon_intersects``: EXACT simple-polygon intersection test (edge
  crossing or containment, holes honored) — replaces the reference's coarse
  bbox over-approximation (geometry-ops.lisp:94-113).
- ``clip_polygons``: Greiner-Hormann boolean clipping — ``intersection``,
  ``union``, ``difference`` of simple polygons (geometry-ops.lisp:165-180
  surface).  Degenerate inputs (shared vertices / vertex-on-edge) are
  handled by an epsilon perturbation of the clip polygon, documented below.
- ``polygon_buffer``: outward offset with round (arc-segmented) corners —
  exact for convex rings, convex-hull-first for concave ones (documented
  over-approximation; the reference signals instead,
  geometry-ops.lisp:181-186).
- ``make_valid``: ring cleanup (dedup/collinear removal, closure,
  orientation normalization) — the repairable subset of GEOSMakeValid
  (geometry-ops.lisp:134-139); genuinely self-intersecting rings raise
  ``GeosRequiredForOperation`` as the reference does.
- ``polygon_distance``: exact planar boundary distance
  (geometry-ops.lisp:141-148).

Representation: a *ring* is ``[(x, y), ...]`` (lon, lat order, open — the
closing edge is implicit); a *polygon* is ``[outer_ring, hole1, ...]``; a
*multipolygon* is a list of polygons.  All ops are driver/executor-side pure
Python intended for the refine stage of spatial operators (candidate sets
already cut down by geohash-cell / bbox prefilters, the same two-phase shape
as spatial-query.lisp) — batched through pandas UDFs, never row-at-a-time
in a hot path.

If Shapely is importable the wrappers in :mod:`.geometry` may route to it;
this kernel is the always-available contract.
"""

from __future__ import annotations

import math


class GeosRequiredForOperation(Exception):
    """Raised when an input falls outside the dependency-free algorithms
    (the analog of the reference's geos-required-for-operation condition)."""


# -- area / perimeter --------------------------------------------------------------

def ring_area(ring) -> float:
    """Signed shoelace area (positive = counter-clockwise)."""
    n = len(ring)
    s = 0.0
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        s += x1 * y2 - x2 * y1
    return s / 2.0


def polygon_area(polygon) -> float:
    """|outer| minus the hole areas, in squared coordinate units."""
    return abs(ring_area(polygon[0])) - sum(
        abs(ring_area(h)) for h in polygon[1:])


def polygon_perimeter(polygon) -> float:
    """Planar length of the outer ring boundary."""
    ring = polygon[0]
    n = len(ring)
    return sum(math.dist(ring[i], ring[(i + 1) % n]) for i in range(n))


# -- exact segment / polygon predicates --------------------------------------------

def _orient(a, b, c) -> float:
    """Twice the signed area of triangle abc (>0 = ccw turn)."""
    return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])


def _on_segment(a, b, p) -> bool:
    """p collinear with ab: is p within the ab bbox?"""
    return (min(a[0], b[0]) <= p[0] <= max(a[0], b[0])
            and min(a[1], b[1]) <= p[1] <= max(a[1], b[1]))


def segments_intersect(p1, p2, p3, p4) -> bool:
    """Closed-segment intersection, collinear overlaps included."""
    d1 = _orient(p3, p4, p1)
    d2 = _orient(p3, p4, p2)
    d3 = _orient(p1, p2, p3)
    d4 = _orient(p1, p2, p4)
    if ((d1 > 0) != (d2 > 0) or d1 == 0 or d2 == 0) and \
       ((d3 > 0) != (d4 > 0) or d3 == 0 or d4 == 0):
        if d1 == 0 and _on_segment(p3, p4, p1):
            return True
        if d2 == 0 and _on_segment(p3, p4, p2):
            return True
        if d3 == 0 and _on_segment(p1, p2, p3):
            return True
        if d4 == 0 and _on_segment(p1, p2, p4):
            return True
        return (d1 > 0) != (d2 > 0) and (d3 > 0) != (d4 > 0)
    return False


def point_in_ring(p, ring) -> bool:
    """Ray casting; boundary points count as inside (closed containment)."""
    x, y = p
    n = len(ring)
    inside = False
    j = n - 1
    for i in range(n):
        xi, yi = ring[i]
        xj, yj = ring[j]
        if _orient(ring[i], ring[j], p) == 0 and \
                _on_segment(ring[i], ring[j], p):
            return True  # on the boundary
        if (yi > y) != (yj > y) and \
                x < (xj - xi) * (y - yi) / (yj - yi) + xi:
            inside = not inside
        j = i
    return inside


def point_in_polygon(p, polygon) -> bool:
    if not point_in_ring(p, polygon[0]):
        return False
    return not any(
        point_in_ring(p, hole) and not _point_on_ring(p, hole)
        for hole in polygon[1:])


def _point_on_ring(p, ring) -> bool:
    n = len(ring)
    for i in range(n):
        a, b = ring[i], ring[(i + 1) % n]
        if _orient(a, b, p) == 0 and _on_segment(a, b, p):
            return True
    return False


def _ring_edges(ring):
    n = len(ring)
    for i in range(n):
        yield ring[i], ring[(i + 1) % n]


def polygon_intersects(poly_a, poly_b) -> bool:
    """EXACT intersects test for simple polygons with holes: any boundary
    crossing, or containment of one inside the other (and not inside a
    hole).  Replaces the reference's no-GEOS bbox over-approximation."""
    # cheap reject first — the prefilter the refine stage would have applied
    (aminx, aminy, amaxx, amaxy) = _bbox(poly_a)
    (bminx, bminy, bmaxx, bmaxy) = _bbox(poly_b)
    if amaxx < bminx or bmaxx < aminx or amaxy < bminy or bmaxy < aminy:
        return False
    for ring_a in poly_a:
        for ring_b in poly_b:
            for ea in _ring_edges(ring_a):
                for eb in _ring_edges(ring_b):
                    if segments_intersect(*ea, *eb):
                        return True
    # no boundary crossing: containment (a vertex of one strictly inside
    # the other's polygon-with-holes, or vice versa)
    return (point_in_polygon(poly_b[0][0], poly_a)
            or point_in_polygon(poly_a[0][0], poly_b))


def _bbox(polygon):
    xs = [p[0] for p in polygon[0]]
    ys = [p[1] for p in polygon[0]]
    return min(xs), min(ys), max(xs), max(ys)


# -- Greiner-Hormann boolean clipping ----------------------------------------------

class _GHNode:
    __slots__ = ("pt", "nxt", "prv", "neighbor", "entry", "is_intersection",
                 "alpha", "visited")

    def __init__(self, pt, alpha=0.0, is_intersection=False):
        self.pt = pt
        self.nxt = self.prv = self.neighbor = None
        self.entry = False
        self.is_intersection = is_intersection
        self.alpha = alpha
        self.visited = False


def _build_ring(points):
    nodes = [_GHNode(p) for p in points]
    for i, nd in enumerate(nodes):
        nd.nxt = nodes[(i + 1) % len(nodes)]
        nd.prv = nodes[i - 1]
    return nodes[0]


def _iter_ring(head):
    nd = head
    while True:
        yield nd
        nd = nd.nxt
        if nd is head:
            break


def _seg_intersection(p1, p2, q1, q2):
    """Proper (interior) intersection point + alphas, or None."""
    d = (p2[0] - p1[0]) * (q2[1] - q1[1]) - (p2[1] - p1[1]) * (q2[0] - q1[0])
    if d == 0:
        return None
    ua = ((q1[0] - p1[0]) * (q2[1] - q1[1])
          - (q1[1] - p1[1]) * (q2[0] - q1[0])) / d
    ub = ((q1[0] - p1[0]) * (p2[1] - p1[1])
          - (q1[1] - p1[1]) * (p2[0] - p1[0])) / d
    if 0.0 < ua < 1.0 and 0.0 < ub < 1.0:
        return ((p1[0] + ua * (p2[0] - p1[0]),
                 p1[1] + ua * (p2[1] - p1[1])), ua, ub)
    return None


def _insert_sorted(edge_start, node):
    """Insert an intersection node after edge_start, keeping alpha order."""
    cur = edge_start
    while (cur.nxt.is_intersection and cur.nxt.alpha < node.alpha):
        cur = cur.nxt
    node.nxt = cur.nxt
    node.prv = cur
    cur.nxt.prv = node
    cur.nxt = node


def _degenerate(subj, clip) -> bool:
    """Any shared vertex or vertex-on-edge between the two rings?"""
    sset = set(subj)
    if sset & set(clip):
        return True
    for ring1, ring2 in ((subj, clip), (clip, subj)):
        for v in ring1:
            for a, b in _ring_edges(ring2):
                if _orient(a, b, v) == 0 and _on_segment(a, b, v):
                    return True
    return False


_EPS = 1e-9


def clip_polygons(subject, clip, op: str):
    """Greiner-Hormann boolean op on two simple rings (no holes):
    op in {'intersection', 'union', 'difference'} (A op B).  Returns a list
    of result rings (a multipolygon's outer rings).

    Degeneracies (shared vertices, vertex-on-edge, collinear overlapping
    edges) break the entry/exit pairing of the classic algorithm; they are
    resolved by nudging the CLIP ring by a 1e-9 epsilon — exact topology up
    to that tolerance, documented contract of the dependency-free kernel."""
    if op not in ("intersection", "union", "difference"):
        raise ValueError(f"unknown boolean op: {op}")
    subj = [tuple(map(float, p)) for p in subject]
    clp = [tuple(map(float, p)) for p in clip]
    if _degenerate(subj, clp):
        # Nudge the clip ring off the degenerate configuration. Two
        # numerical requirements: (1) the magnitude must scale with the
        # geometry's extent, or orientation determinants drown in float
        # noise; (2) the direction must not be parallel to ANY edge of
        # either ring — a parallel shift keeps a vertex ON the edge line
        # (identical rings, shared diagonals) and the entry/exit pairing
        # still breaks. Accept a candidate only when every vertex has real
        # clearance from the other ring's edges.
        ext = max(max(abs(c) for p in subj + clp for c in p), 1.0)
        eps = 1e-7 * ext
        for dx, dy in ((0.7071, 0.7071), (0.4472, 0.8944),
                       (0.8944, 0.4472), (0.3162, 0.9487),
                       (0.9487, 0.3162), (0.3714, 0.9285),
                       (0.9285, 0.3714)):
            cand = [(x + eps * dx, y + eps * dy) for x, y in clp]
            if (not _degenerate(subj, cand)
                    and _vertex_edge_clearance(subj, cand) > eps * 0.05):
                clp = cand
                break
        else:
            clp = [(x + eps, y + eps) for x, y in clp]

    s_head = _build_ring(subj)
    c_head = _build_ring(clp)

    # phase 1: find pairwise edge intersections, insert into both rings
    found = False
    for s_node in list(_iter_ring(s_head)):
        if s_node.is_intersection:
            continue
        s_next = s_node.nxt
        while s_next.is_intersection:
            s_next = s_next.nxt
        for c_node in list(_iter_ring(c_head)):
            if c_node.is_intersection:
                continue
            c_next = c_node.nxt
            while c_next.is_intersection:
                c_next = c_next.nxt
            hit = _seg_intersection(s_node.pt, s_next.pt,
                                    c_node.pt, c_next.pt)
            if hit is None:
                continue
            pt, ua, ub = hit
            a = _GHNode(pt, ua, True)
            b = _GHNode(pt, ub, True)
            a.neighbor, b.neighbor = b, a
            _insert_sorted(s_node, a)
            _insert_sorted(c_node, b)
            found = True

    if not found:
        # disjoint or nested: resolve by containment
        a_in_b = point_in_ring(subj[0], clp)
        b_in_a = point_in_ring(clp[0], subj)
        if op == "intersection":
            return _normalize_rings(
                [subj] if a_in_b else ([clp] if b_in_a else []))
        if op == "union":
            if a_in_b:
                return _normalize_rings([clp])
            if b_in_a:
                return _normalize_rings([subj])
            return _normalize_rings([subj, clp])
        # difference A - B
        if a_in_b:
            return []
        # B inside A: emit outer + hole (normalized to CW below)
        if b_in_a:
            return _normalize_rings([subj, clp])
        return _normalize_rings([subj])

    # phase 2: mark entry/exit by parity, starting from containment of the
    # first non-intersection vertex
    for head, other in ((s_head, clp), (c_head, subj)):
        inside = point_in_ring(head.pt, other)
        entry = not inside
        for nd in _iter_ring(head):
            if nd.is_intersection:
                nd.entry = entry
                entry = not entry

    # traversal rules: intersection follows entry->forward; union follows
    # exit->forward; difference alternates direction
    results = []
    unvisited = [nd for nd in _iter_ring(s_head)
                 if nd.is_intersection and not nd.visited]
    while unvisited:
        start = unvisited[0]
        ring = []
        cur = start
        if op == "intersection":
            forward_on_entry = True
        elif op == "union":
            forward_on_entry = False
        else:  # difference
            forward_on_entry = False
        _ = forward_on_entry
        on_subject = True
        # canonical GH walk
        while not cur.visited:
            cur.visited = True
            if cur.neighbor is not None:
                cur.neighbor.visited = True
            if op == "intersection":
                go_forward = cur.entry
            elif op == "union":
                go_forward = not cur.entry
            else:  # difference: forward on subject-exit, backward on clip
                go_forward = (not cur.entry) if on_subject else cur.entry
            nd = cur
            while True:
                ring.append(nd.pt)
                nd = nd.nxt if go_forward else nd.prv
                if nd.is_intersection:
                    break
            cur = nd.neighbor
            on_subject = not on_subject
        if len(ring) >= 3:
            results.append(_dedup_ring(ring))
        unvisited = [nd for nd in _iter_ring(s_head)
                     if nd.is_intersection and not nd.visited]
    return _normalize_rings([r for r in results if len(r) >= 3])


def _vertex_edge_clearance(ring_a, ring_b) -> float:
    """Minimum distance from any vertex of one ring to any edge of the
    other (both directions) — the safety margin the degeneracy nudge must
    establish before Greiner-Hormann pairing is numerically trustworthy."""
    best = float("inf")
    for verts, edges_of in ((ring_a, ring_b), (ring_b, ring_a)):
        for v in verts:
            for e1, e2 in _ring_edges(edges_of):
                d = _point_segment_dist(v, e1, e2)
                if d < best:
                    best = d
    return best


def _ring_contains_ring(outer, inner) -> bool:
    return all(point_in_ring(p, outer) or _point_on_ring(p, outer)
               for p in inner)


def _normalize_rings(rings):
    """Orient clip results so sign carries topology: outer rings CCW
    (positive shoelace), rings contained in another result ring CW
    (negative) — holes. ``rings_area`` is then a plain signed sum, and a
    consumer can tell a hole from a disjoint piece without re-running
    containment."""
    out = []
    for i, r in enumerate(rings):
        hole = any(j != i and _ring_contains_ring(rings[j], r)
                   for j in range(len(rings)))
        a = ring_area(r)
        if (a > 0) == hole:  # CCW hole or CW outer: flip
            r = list(reversed(r))
        out.append(r)
    return out


def rings_area(rings) -> float:
    """Total area of a clip_polygons result: signed sum over oriented
    rings (outer CCW positive, holes CW negative)."""
    return sum(ring_area(r) for r in rings)


def _dedup_ring(ring):
    out = []
    for p in ring:
        if not out or (abs(p[0] - out[-1][0]) > 1e-12
                       or abs(p[1] - out[-1][1]) > 1e-12):
            out.append(p)
    if len(out) > 1 and (abs(out[0][0] - out[-1][0]) <= 1e-12
                         and abs(out[0][1] - out[-1][1]) <= 1e-12):
        out.pop()
    return out


def polygon_intersection(poly_a, poly_b):
    """Intersection rings of two simple polygons (outer rings only)."""
    return clip_polygons(poly_a[0], poly_b[0], "intersection")


def polygon_union(poly_a, poly_b):
    """Union rings of two simple polygons (outer rings only)."""
    return clip_polygons(poly_a[0], poly_b[0], "union")


def polygon_difference(poly_a, poly_b):
    """A minus B rings (outer rings only; a fully-nested B yields
    [outer, hole])."""
    return clip_polygons(poly_a[0], poly_b[0], "difference")


# -- convex hull / buffer ----------------------------------------------------------

def convex_hull(points):
    """Andrew's monotone chain; returns ccw hull ring (no repeated last
    point)."""
    pts = sorted(set((float(x), float(y)) for x, y in points))
    if len(pts) <= 2:
        return list(pts)
    lower, upper = [], []
    for p in pts:
        while len(lower) >= 2 and _orient(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    for p in reversed(pts):
        while len(upper) >= 2 and _orient(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return lower[:-1] + upper[:-1]


def _is_convex(ring) -> bool:
    n = len(ring)
    sign = 0
    for i in range(n):
        o = _orient(ring[i], ring[(i + 1) % n], ring[(i + 2) % n])
        if o != 0:
            if sign == 0:
                sign = 1 if o > 0 else -1
            elif (o > 0) != (sign > 0):
                return False
    return True


def polygon_buffer(polygon, width: float, quadrant_segments: int = 8):
    """Outward round-cornered buffer of the outer ring by ``width``
    coordinate units (degrees for lon/lat, matching the reference's GEOS
    contract, geometry-ops.lisp:181-186).  Exact offset for convex rings:
    each edge shifts outward along its normal and adjacent edges connect by
    a circular arc approximated with ``quadrant_segments`` segments per
    quarter turn.  Concave rings are convex-hulled first (documented
    over-approximation — still a working result where the reference
    signals).  width <= 0 raises (inward offsetting needs a full straight
    skeleton)."""
    if width <= 0:
        raise GeosRequiredForOperation("negative/zero buffer width")
    ring = list(polygon[0])
    # drop zero-length edges (consecutive duplicate vertices, incl. the
    # wraparound pair) BEFORE computing normals — a degenerate edge has no
    # normal and would divide by zero
    ring = [p for i, p in enumerate(ring) if p != ring[(i + 1) % len(ring)]]
    if len(ring) < 3:
        raise GeosRequiredForOperation("degenerate ring (needs >= 3 "
                                       "distinct vertices)")
    if ring_area(ring) < 0:
        ring.reverse()  # normalize ccw
    if not _is_convex(ring):
        ring = convex_hull(ring)
    n = len(ring)
    out = []
    for i in range(n):
        prev_p, p, next_p = ring[i - 1], ring[i], ring[(i + 1) % n]
        # outward normals (ccw ring: outward = right of direction = (dy,-dx))
        nx1, ny1 = _unit_normal(prev_p, p)
        nx2, ny2 = _unit_normal(p, next_p)
        ang1 = math.atan2(ny1, nx1)
        ang2 = math.atan2(ny2, nx2)
        sweep = (ang2 - ang1) % (2 * math.pi)
        steps = max(1, int(math.ceil(sweep / (math.pi / 2)
                                     * quadrant_segments)))
        for s in range(steps + 1):
            ang = ang1 + sweep * s / steps
            out.append((p[0] + width * math.cos(ang),
                        p[1] + width * math.sin(ang)))
    return [_dedup_ring(out)]


def _unit_normal(a, b):
    dx, dy = b[0] - a[0], b[1] - a[1]
    ln = math.hypot(dx, dy)
    return dy / ln, -dx / ln


# -- validity / distance -----------------------------------------------------------

def _self_intersects(ring) -> bool:
    n = len(ring)
    edges = list(_ring_edges(ring))
    for i in range(n):
        for j in range(i + 1, n):
            if j == i + 1 or (i == 0 and j == n - 1):
                continue  # adjacent edges share a vertex by construction
            if segments_intersect(*edges[i], *edges[j]):
                return True
    return False


def make_valid(polygon):
    """Repairable cleanup: drop consecutive duplicates and collinear spikes,
    strip an explicit closing point, orient outer ccw / holes cw.  Rings
    still self-intersecting after cleanup raise GeosRequiredForOperation
    (the reference's no-GEOS contract, geometry-ops.lisp:134-139)."""
    out = []
    for idx, ring in enumerate(polygon):
        r = _dedup_ring([tuple(map(float, p)) for p in ring])
        # drop collinear middle points (zero-area spikes)
        changed = True
        while changed and len(r) > 3:
            changed = False
            for i in range(len(r)):
                if _orient(r[i - 1], r[i], r[(i + 1) % len(r)]) == 0:
                    r.pop(i)
                    changed = True
                    break
        if len(r) < 3:
            raise GeosRequiredForOperation("degenerate ring (< 3 points)")
        if _self_intersects(r):
            raise GeosRequiredForOperation(
                "self-intersecting ring (needs GEOSMakeValid/Shapely)")
        ccw = ring_area(r) > 0
        if idx == 0 and not ccw:
            r.reverse()
        elif idx > 0 and ccw:
            r.reverse()
        out.append(r)
    return out


def _point_segment_dist(p, a, b) -> float:
    ax, ay = a
    bx, by = b
    px, py = p
    dx, dy = bx - ax, by - ay
    ln2 = dx * dx + dy * dy
    if ln2 == 0:
        return math.dist(p, a)
    t = max(0.0, min(1.0, ((px - ax) * dx + (py - ay) * dy) / ln2))
    return math.dist(p, (ax + t * dx, ay + t * dy))


def polygon_distance(poly_a, poly_b) -> float:
    """Exact planar distance between two polygons in coordinate units
    (geometry-ops.lisp:141-148): 0 when they intersect, else the min
    vertex-to-edge distance across both boundaries."""
    if polygon_intersects(poly_a, poly_b):
        return 0.0
    best = math.inf
    for ra, rb in ((poly_a[0], poly_b[0]), (poly_b[0], poly_a[0])):
        for p in ra:
            for a, b in _ring_edges(rb):
                d = _point_segment_dist(p, a, b)
                if d < best:
                    best = d
    return best
