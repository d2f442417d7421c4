"""Evaluator for MQL ``find()``-style match documents.

Executable spec for the filter dialect our pushdown compiler emits
(compare reference compiler /root/reference/src/mongo_filter_pushdown.cpp:
50-318 — ours is the consumer side, written from the public MongoDB query
docs, not ported code).

Supported: equality, $eq $ne $lt $lte $gt $gte $in $nin $exists $type
$regex $elemMatch $size $not $and $or $nor $expr, dotted paths, and
MongoDB's missing-field/null-equality semantics.
"""

from __future__ import annotations

import datetime as _dt
import re
from decimal import Decimal

from duckdb_mongo_spark.bsonlike import ObjectId

_MISSING = object()


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
    raise ValueError(f"unsupported match operator: {op}")


def _scalar_elem_match(el, cond: dict) -> bool:
    return all(_apply_op(el, op, arg, {}) for op, arg in cond.items())


def _is_operator_doc(v) -> bool:
    return isinstance(v, dict) and bool(v) and all(
        isinstance(k, str) and k.startswith("$") for k in v
    )


def _operator_doc_match(actual, opdoc, doc) -> bool:
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
