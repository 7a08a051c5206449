"""Pure-Python geohash — the engine's spatial cell scheme.

Re-expresses the reference's geohash library (geohash.lisp:16-130: encode,
decode, bbox, cell-size, neighbors, covering, prefix-range) from the public
geohash algorithm (Niemeyer 2008, base-32 interleaved bit encoding). No
external dependency; the Spark side uses these via pandas UDFs
(functions.geometry / operators.spatial) so the per-batch work is vectorized
Arrow transfer, not per-row pickling.
"""

from __future__ import annotations

import math

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_DECODE = {c: i for i, c in enumerate(_BASE32)}


def geohash_encode(lat: float, lon: float, precision: int = 7) -> str:
    """Standard geohash (geohash.lisp:16-50 semantics)."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits, bit, even = 0, 0, True
    out = []
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits = (bits << 1) | 1
                lon_lo = mid
            else:
                bits <<= 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits = (bits << 1) | 1
                lat_lo = mid
            else:
                bits <<= 1
                lat_hi = mid
        even = not even
        bit += 1
        if bit == 5:
            out.append(_BASE32[bits])
            bits, bit = 0, 0
    return "".join(out)


def geohash_bbox(gh: str) -> tuple[float, float, float, float]:
    """(lat_lo, lat_hi, lon_lo, lon_hi) of a cell (geohash.lisp bbox)."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    even = True
    for c in gh:
        d = _DECODE[c]
        for shift in range(4, -1, -1):
            bit = (d >> shift) & 1
            if even:
                mid = (lon_lo + lon_hi) / 2
                if bit:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if bit:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return lat_lo, lat_hi, lon_lo, lon_hi


def geohash_decode(gh: str) -> tuple[float, float]:
    """Cell-center (lat, lon)."""
    lat_lo, lat_hi, lon_lo, lon_hi = geohash_bbox(gh)
    return (lat_lo + lat_hi) / 2, (lon_lo + lon_hi) / 2


def geohash_cell_size(gh: str) -> tuple[float, float]:
    """(lat_degrees, lon_degrees) extent of a cell (geohash.lisp cell-size)."""
    lat_lo, lat_hi, lon_lo, lon_hi = geohash_bbox(gh)
    return lat_hi - lat_lo, lon_hi - lon_lo


def geohash_neighbors(gh: str) -> list[str]:
    """The 8 surrounding cells (geohash.lisp neighbor/neighbors), computed by
    re-encoding offset centers — robust at meridian/pole wrap."""
    lat, lon = geohash_decode(gh)
    dlat, dlon = geohash_cell_size(gh)
    out = []
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            if di == 0 and dj == 0:
                continue
            nlat = min(max(lat + di * dlat, -90.0), 90.0)
            nlon = ((lon + dj * dlon + 180.0) % 360.0) - 180.0
            n = geohash_encode(nlat, nlon, len(gh))
            if n != gh and n not in out:
                out.append(n)
    return out


def geohash_prefix_range(prefix: str) -> tuple[str, str]:
    """Half-open string range [lo, hi) containing exactly the geohashes with
    ``prefix`` (geohash.lisp prefix-range) — drives BETWEEN-style pruned range
    scans over a geohash-sorted column: ``col >= lo AND col < hi``. ``hi`` is
    the prefix with its last base-32 digit incremented (carrying through a
    trailing 'z'); an all-'z' prefix has no upper sibling and hi is the
    prefix plus a sentinel past every base-32 digit."""
    if not prefix:
        raise ValueError("empty geohash prefix")
    chars = list(prefix)
    i = len(chars) - 1
    while i >= 0 and chars[i] == _BASE32[-1]:
        chars.pop()
        i -= 1
    if i < 0:
        return prefix, prefix + "~"  # '~' > 'z': open-ended upper bound
    chars[i] = _BASE32[_DECODE[chars[i]] + 1]
    return prefix, "".join(chars)


def geohash_covering(lat_min: float, lat_max: float, lon_min: float,
                     lon_max: float, precision: int) -> list[str]:
    """All cells at ``precision`` intersecting a bbox (geohash.lisp:102-130
    covering) — the filter stage of filter/refine spatial queries."""
    probe = geohash_encode((lat_min + lat_max) / 2, (lon_min + lon_max) / 2,
                           precision)
    dlat, dlon = geohash_cell_size(probe)
    # Geohash cells tile the globe aligned to (-90, -180); iterate the cell
    # centers of every grid cell intersecting the bbox.
    i_lo, i_hi = math.floor((lat_min + 90.0) / dlat), math.floor((lat_max + 90.0) / dlat)
    j_lo, j_hi = math.floor((lon_min + 180.0) / dlon), math.floor((lon_max + 180.0) / dlon)
    out: list[str] = []
    seen: set[str] = set()
    for i in range(i_lo, i_hi + 1):
        lat = min(max(-90.0 + (i + 0.5) * dlat, -90.0), 90.0)
        for j in range(j_lo, j_hi + 1):
            lon = ((-180.0 + (j + 0.5) * dlon + 180.0) % 360.0) - 180.0
            gh = geohash_encode(lat, lon, precision)
            if gh not in seen:
                seen.add(gh)
                out.append(gh)
    return out


def covering_for_radius(lat: float, lon: float, radius_m: float,
                        precision: int | None = None) -> list[str]:
    """Cells covering a radius around a point (spatial-index.lisp:111-160
    filter stage). Picks a precision whose cell edge is >= radius/4 when not
    given, so the candidate set stays small."""
    dlat_deg = radius_m / 111_320.0
    dlon_deg = radius_m / (111_320.0 * max(math.cos(math.radians(lat)), 1e-6))
    if precision is None:
        precision = _pick_precision(max(dlat_deg, dlon_deg))
    return geohash_covering(lat - dlat_deg, lat + dlat_deg,
                            lon - dlon_deg, lon + dlon_deg, precision)


def _pick_precision(extent_deg: float) -> int:
    # cell lat extents: p1=45, p2=11.25, p3=1.40625, p4=0.3516, p5=0.0439,
    # p6=0.01099, p7=0.001373 ...
    size = 45.0
    for p in range(1, 12):
        if size <= extent_deg:
            return p
        size /= 8 if p % 2 else 4  # alternating lat splits per char
    return 12
