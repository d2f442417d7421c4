"""Evaluator for MQL ``find()``-style match documents.

Executable spec for the filter dialect our pushdown compiler emits
(compare reference compiler /root/reference/src/mongo_filter_pushdown.cpp:
50-318 — ours is the consumer side, written from the public MongoDB query
docs, not ported code).

Supported: equality, $eq $ne $lt $lte $gt $gte $in $nin $exists $type
$regex $elemMatch $size $not $and $or $nor $expr, dotted paths, and
MongoDB's missing-field/null-equality semantics. Geo predicates:
$geoWithin ($box/$center/$centerSphere/$polygon/$geometry),
$geoIntersects (point vs polygon), and $near/$nearSphere as
*filters* (min/max distance honored; the distance ORDERING of a
mongod $near cursor needs the $geoNear aggregation stage here).
"""

from __future__ import annotations

import datetime as _dt
import re
from decimal import Decimal

from duckdb_mongo_spark.bsonlike import ObjectId

_MISSING = object()

EARTH_RADIUS_M = 6378100.0  # mongod's kRadiusOfEarthInMeters (equatorial)


def parse_point(v):
    """Parse a GeoJSON Point / legacy coordinate pair.

    Returns ``(x, y, is_geojson)`` — ``(lng, lat, True)`` for GeoJSON —
    or ``None`` when the value is not point-shaped."""
    if isinstance(v, dict):
        if v.get("type") == "Point":
            c = v.get("coordinates")
            if isinstance(c, (list, tuple)) and len(c) == 2:
                return float(c[0]), float(c[1]), True
            return None
        nums = [x for x in v.values() if isinstance(x, (int, float))
                and not isinstance(x, bool)]
        if len(nums) == 2 and len(v) == 2:
            return float(nums[0]), float(nums[1]), False
        return None
    if (isinstance(v, (list, tuple)) and len(v) == 2
            and all(isinstance(x, (int, float)) and not isinstance(x, bool)
                    for x in v)):
        return float(v[0]), float(v[1]), False
    return None


def haversine_rad(lng1, lat1, lng2, lat2):
    """Central angle (radians) between two (degree) lng/lat points."""
    import math
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp = p2 - p1
    dl = math.radians(lng2 - lng1)
    a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * math.asin(min(1.0, math.sqrt(a)))


def _point_in_ring(x, y, ring) -> bool:
    """Ray-casting point-in-polygon for one linear ring (closed or open).
    Planar on the coordinate plane — correct for GeoJSON polygons that
    don't cross the antimeridian or enclose a pole (mongod runs the full
    S2 spherical test; documented approximation)."""
    inside = False
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i][0], ring[i][1]
        x2, y2 = ring[(i + 1) % n][0], ring[(i + 1) % n][1]
        if (y1 > y) != (y2 > y):
            xin = (x2 - x1) * (y - y1) / (y2 - y1) + x1
            if x < xin:
                inside = not inside
    return inside


def _point_in_polygon_coords(x, y, coords) -> bool:
    """GeoJSON Polygon coordinates: ring 0 is the shell, rest are holes."""
    if not coords or not _point_in_ring(x, y, coords[0]):
        return False
    return not any(_point_in_ring(x, y, hole) for hole in coords[1:])


def _point_in_geometry(x, y, geometry: dict) -> bool:
    gtype = geometry.get("type")
    coords = geometry.get("coordinates")
    if gtype == "Polygon":
        return _point_in_polygon_coords(x, y, coords)
    if gtype == "MultiPolygon":
        return any(_point_in_polygon_coords(x, y, poly) for poly in coords)
    raise ValueError(f"unsupported $geometry type for point test: {gtype!r}")


def _geo_within(actual, shape: dict) -> bool:
    pt = parse_point(actual)
    if pt is None:
        return False
    x, y, _ = pt
    if "$geometry" in shape:
        return _point_in_geometry(x, y, shape["$geometry"])
    if "$box" in shape:
        (x1, y1), (x2, y2) = shape["$box"]
        return (min(x1, x2) <= x <= max(x1, x2)
                and min(y1, y2) <= y <= max(y1, y2))
    if "$polygon" in shape:
        return _point_in_ring(x, y, shape["$polygon"])
    if "$center" in shape:
        (cx, cy), r = shape["$center"]
        return (x - cx) ** 2 + (y - cy) ** 2 <= r * r
    if "$centerSphere" in shape:
        (cx, cy), r = shape["$centerSphere"]
        return haversine_rad(cx, cy, x, y) <= r  # radius in radians
    raise ValueError(f"unsupported $geoWithin shape: {sorted(shape)}")


def _geo_near_match(actual, arg, op: str, min_d=None, max_d=None) -> bool:
    """$near / $nearSphere as a predicate: distance bounds only.

    GeoJSON form ``{$geometry: point, $maxDistance: m, $minDistance: m}``
    measures meters on the sphere; legacy ``[x, y]`` (bounds arrive as
    sibling operators via ``min_d``/``max_d``) is planar for $near and
    radians for $nearSphere (matching $geoNear's unit rules). The
    result-ordering a mongod $near cursor adds requires the $geoNear
    aggregation stage (interpreter.py), which this predicate cannot
    express — without bounds every located document matches."""
    pt = parse_point(actual)
    if pt is None:
        return False
    x, y, _ = pt
    if isinstance(arg, dict) and "$geometry" in arg:
        near = parse_point(arg["$geometry"])
        if near is None:
            raise ValueError(f"{op}: $geometry must be a GeoJSON Point")
        nx, ny, _ = near
        dist = haversine_rad(nx, ny, x, y) * EARTH_RADIUS_M
        min_d = arg.get("$minDistance", min_d)
        max_d = arg.get("$maxDistance", max_d)
    else:
        near = parse_point(arg)
        if near is None:
            raise ValueError(f"{op}: expected a point or {{$geometry: ...}}")
        nx, ny, _ = near
        if op == "$nearSphere":
            dist = haversine_rad(nx, ny, x, y)  # radians, legacy spherical
        else:
            import math
            dist = math.hypot(x - nx, y - ny)   # planar units
    if min_d is not None and dist < min_d:
        return False
    if max_d is not None and dist > max_d:
        return False
    return True


def get_path(doc, path: str):
    """Navigate a dotted path; returns _MISSING when absent.

    Arrays: navigating a field through an array yields the list of
    per-element values (MongoDB multikey behavior, simplified).
    """
    cur = doc
    for part in path.split("."):
        if isinstance(cur, dict):
            if part not in cur:
                return _MISSING
            cur = cur[part]
        elif isinstance(cur, list):
            if part.isdigit():
                idx = int(part)
                if idx >= len(cur):
                    return _MISSING
                cur = cur[idx]
            else:
                sub = [get_path(el, part) for el in cur if isinstance(el, dict)]
                sub = [s for s in sub if s is not _MISSING]
                if not sub:
                    return _MISSING
                cur = sub
        else:
            return _MISSING
    return cur


def _is_number(v):
    return isinstance(v, (int, float, Decimal)) and not isinstance(v, bool)


def _coerce_dt(v):
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v
    if isinstance(v, _dt.date):
        return _dt.datetime(v.year, v.month, v.day)
    return v


def compare_values(a, b):
    """Three-way compare within a comparable type family; None if incomparable."""
    if _is_number(a) and _is_number(b):
        fa, fb = float(a), float(b)
        return (fa > fb) - (fa < fb)
    if isinstance(a, bool) and isinstance(b, bool):
        return (a > b) - (a < b)
    if isinstance(a, str) and isinstance(b, str):
        return (a > b) - (a < b)
    if isinstance(a, ObjectId) and isinstance(b, ObjectId):
        return (str(a) > str(b)) - (str(a) < str(b))
    if isinstance(a, (_dt.date, _dt.datetime)) and isinstance(b, (_dt.date, _dt.datetime)):
        da, db = _coerce_dt(a), _coerce_dt(b)
        return (da > db) - (da < db)
    if isinstance(a, (bytes, bytearray)) and isinstance(b, (bytes, bytearray)):
        ba, bb = bytes(a), bytes(b)
        return (ba > bb) - (ba < bb)
    return None


def values_equal(a, b):
    if a is None and b is None:
        return True
    c = compare_values(a, b)
    if c is not None:
        return c == 0
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(values_equal(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return list(a.keys()) == list(b.keys()) and all(
            values_equal(a[k], b[k]) for k in a
        )
    return False


def _eq_match(actual, expected):
    """MongoDB equality: missing matches null; array matches if any element matches."""
    if actual is _MISSING:
        return expected is None
    if values_equal(actual, expected):
        return True
    if isinstance(actual, list) and not isinstance(expected, list):
        return any(values_equal(el, expected) for el in actual)
    return False


def _ordered_match(actual, expected, op):
    vals = actual if isinstance(actual, list) else [actual]
    for v in vals:
        c = compare_values(v, expected)
        if c is None:
            continue
        if (
            (op == "$lt" and c < 0)
            or (op == "$lte" and c <= 0)
            or (op == "$gt" and c > 0)
            or (op == "$gte" and c >= 0)
        ):
            return True
    return False


def _apply_op(actual, op, arg, doc):
    from duckdb_mongo_spark.mql.expr import eval_expr  # cycle guard

    if op == "$eq":
        return _eq_match(actual, arg)
    if op == "$ne":
        return not _eq_match(actual, arg)
    if op in ("$lt", "$lte", "$gt", "$gte"):
        if actual is _MISSING:
            return False
        return _ordered_match(actual, arg, op)
    if op == "$in":
        if actual is _MISSING:
            return any(x is None for x in arg)
        return any(_eq_match(actual, x) for x in arg)
    if op == "$nin":
        return not _apply_op(actual, "$in", arg, doc)
    if op == "$exists":
        present = actual is not _MISSING
        return present if arg else not present
    if op == "$type":
        from duckdb_mongo_spark.bsonlike import bson_type_name

        if actual is _MISSING:
            return False
        names = arg if isinstance(arg, list) else [arg]
        t = bson_type_name(actual)
        alias = {"int": "int64", "long": "int64", "decimal": "decimal128"}
        return any(t == alias.get(n, n) for n in names)
    if op == "$regex":
        if not isinstance(actual, str):
            return False
        pattern = arg.pattern if isinstance(arg, re.Pattern) else str(arg)
        return re.search(pattern, actual) is not None
    if op == "$size":
        return isinstance(actual, list) and len(actual) == int(arg)
    if op == "$elemMatch":
        if not isinstance(actual, list):
            return False
        return any(
            matches_filter(el, arg)
            if isinstance(el, dict)
            else _scalar_elem_match(el, arg)
            for el in actual
        )
    if op == "$not":
        if isinstance(arg, re.Pattern) or isinstance(arg, str):
            return not _apply_op(actual, "$regex", arg, doc)
        return not _operator_doc_match(actual, arg, doc)
    if op == "$all":
        if not isinstance(actual, list):
            # scalar matches iff it equals every required element
            return all(_eq_match(actual, x) for x in arg)
        return all(any(values_equal(x, el) for el in actual) for x in arg)
    if op == "$geoWithin":
        return _geo_within(actual, arg)
    if op == "$geoIntersects":
        if not (isinstance(arg, dict) and "$geometry" in arg):
            raise ValueError("$geoIntersects requires {$geometry: ...}")
        pt = parse_point(actual)
        if pt is None:
            return False
        geom = arg["$geometry"]
        if geom.get("type") == "Point":
            other = parse_point(geom)
            return other is not None and pt[:2] == other[:2]
        return _point_in_geometry(pt[0], pt[1], geom)
    if op in ("$near", "$nearSphere"):
        return _geo_near_match(actual, arg, op)
    if op == "$mod":
        # mongod: [divisor, remainder] over numeric values; non-integer
        # operands TRUNCATE (server behavior); divide-by-zero errors
        if not isinstance(arg, (list, tuple)) or len(arg) != 2:
            raise ValueError("$mod requires [divisor, remainder]")
        div, rem = int(arg[0]), int(arg[1])
        if div == 0:
            raise ValueError("$mod: divisor cannot be 0")
        vals = actual if isinstance(actual, list) else [actual]
        out = False
        for v in vals:
            if isinstance(v, bool) or not isinstance(v, (int, float)):
                continue
            # C-style truncated remainder (mongod), not Python's floored
            out = out or (int(v) - int(int(v) / div) * div) == rem
        return out
    if op in ("$bitsAllSet", "$bitsAnySet", "$bitsAllClear",
              "$bitsAnyClear"):
        # mask forms: int mask or list of bit POSITIONS; numeric values
        # only (whole numbers — mongod rejects fractional), arrays
        # match per-element like every other operator here
        if isinstance(arg, (list, tuple)):
            mask = 0
            for p in arg:
                mask |= 1 << int(p)
        else:
            mask = int(arg)
        vals = actual if isinstance(actual, list) else [actual]
        for v in vals:
            if isinstance(v, bool) or not isinstance(v, (int, float)) \
                    or v != int(v):
                continue
            bits = int(v)
            if op == "$bitsAllSet" and (bits & mask) == mask:
                return True
            if op == "$bitsAnySet" and (bits & mask) != 0:
                return True
            if op == "$bitsAllClear" and (bits & mask) == 0:
                return True
            if op == "$bitsAnyClear" and (bits & mask) != mask:
                return True
        return False
    if op == "$comment":
        return True  # metadata: matches everything, like the server
    raise ValueError(f"unsupported match operator: {op}")


def _scalar_elem_match(el, cond: dict) -> bool:
    return all(_apply_op(el, op, arg, {}) for op, arg in cond.items())


def _is_operator_doc(v) -> bool:
    return isinstance(v, dict) and bool(v) and all(
        isinstance(k, str) and k.startswith("$") for k in v
    )


def _operator_doc_match(actual, opdoc, doc) -> bool:
    if "$near" in opdoc or "$nearSphere" in opdoc:
        # legacy form puts $minDistance/$maxDistance as SIBLING operators
        # of $near ({loc: {$near: [x,y], $maxDistance: d}}) — fold them in
        op = "$near" if "$near" in opdoc else "$nearSphere"
        if not _geo_near_match(actual, opdoc[op], op,
                               min_d=opdoc.get("$minDistance"),
                               max_d=opdoc.get("$maxDistance")):
            return False
        opdoc = {k: v for k, v in opdoc.items()
                 if k not in (op, "$minDistance", "$maxDistance")}
    return all(_apply_op(actual, op, arg, doc) for op, arg in opdoc.items())


def matches_filter(doc: dict, filt: dict) -> bool:
    """True iff ``doc`` matches the MQL filter document ``filt``."""
    from duckdb_mongo_spark.mql.expr import eval_expr

    if not filt:
        return True
    for key, cond in filt.items():
        if key == "$and":
            if not all(matches_filter(doc, sub) for sub in cond):
                return False
        elif key == "$or":
            if not any(matches_filter(doc, sub) for sub in cond):
                return False
        elif key == "$nor":
            if any(matches_filter(doc, sub) for sub in cond):
                return False
        elif key == "$expr":
            if not _truthy(eval_expr(cond, doc)):
                return False
        elif key == "$comment":
            pass  # query metadata: no match effect, like the server
        elif key.startswith("$"):
            raise ValueError(f"unsupported top-level operator: {key}")
        else:
            actual = get_path(doc, key)
            if _is_operator_doc(cond):
                if not _operator_doc_match(actual, cond, doc):
                    return False
            elif isinstance(cond, re.Pattern):
                if not _apply_op(actual, "$regex", cond, doc):
                    return False
            else:
                if not _eq_match(actual, cond):
                    return False
    return True


def _truthy(v) -> bool:
    return not (v is None or v is False or v == 0)


MISSING = _MISSING
