"""Evaluator for MQL aggregation expressions (``$expr`` and pipeline stages).

Executable spec for the ``$expr`` dialect emitted by our complex-predicate
compiler (reference emitter: /root/reference/src/mongo_expr_pushdown.cpp:
103-421; written here from public MongoDB aggregation docs).

Field paths: ``"$col"`` / ``"$a.b"``. Literals pass through; ``$literal``
escapes. Operators cover comparison, boolean, arithmetic, string
($strLenCP/$substrCP used by the LENGTH/SUBSTRING pushdowns A13/A14),
conditionals, date parts, and accumulator-free array helpers.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

from duckdb_mongo_spark.mql.match import MISSING, compare_values, get_path, values_equal


import threading as _threading

_TL = _threading.local()  # per-thread $map/$filter/$reduce variable frames


def _var_frames() -> list:
    frames = getattr(_TL, "frames", None)
    if frames is None:
        frames = _TL.frames = []
    return frames


def _var_lookup(name_path: str, doc):
    """Resolve a ``$$var`` / ``$$var.path`` reference against the active
    variable frames (innermost wins). ``$$CURRENT``/``$$ROOT`` resolve to
    the document (expressions here never rebind CURRENT)."""
    name, _, rest = name_path.partition(".")
    if name in ("CURRENT", "ROOT"):
        base = doc
    else:
        for frame in reversed(_var_frames()):
            if name in frame:
                base = frame[name]
                break
        else:
            raise ValueError(f"undefined aggregation variable $${name}")
    if rest:
        got = get_path(base, rest) if isinstance(base, dict) else MISSING
        return None if got is MISSING else got
    return base


def _resolve(v, doc):
    """Resolve an expression operand: field path, literal, operator doc, array."""
    if isinstance(v, str) and v.startswith("$$"):
        return _var_lookup(v[2:], doc)
    if isinstance(v, str) and v.startswith("$"):
        got = get_path(doc, v[1:])
        return None if got is MISSING else got
    if isinstance(v, dict):
        return eval_expr(v, doc)
    if isinstance(v, list):
        return [_resolve(x, doc) for x in v]
    return v


def _num(v):
    if v is None:
        return None
    if isinstance(v, bool):
        raise TypeError("bool in arithmetic")
    if isinstance(v, (int, float)):
        return v
    if isinstance(v, Decimal):
        return float(v)
    raise TypeError(f"non-numeric operand: {v!r}")


def _convert_scalar(v, to, on_error_null: bool):
    """Shared kernel for $convert / $toInt / $toLong / $toDouble /
    $toString. ``on_error_null=True`` yields None on conversion failure
    (the $convert onError:null behavior our Cast compiler requests,
    matching SQL CAST); ``False`` raises so $convert can honor an
    explicit onError operand."""
    if v is None:
        return None
    try:
        if to in ("int", "long"):
            if isinstance(v, bool):
                return int(v)
            if isinstance(v, int):
                return v
            return int(float(v))
        if to == "double":
            return float(v)
        if to == "string":
            if isinstance(v, bool):
                return "true" if v else "false"
            return str(v)
        if to == "bool":
            return bool(v)
        return v
    except (TypeError, ValueError):
        if on_error_null:
            return None
        raise


class _sort_total:
    """Total-order sort key over MQL values (BSON type order tie-break) —
    used to make set-operator output deterministic."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __lt__(self, other):
        return _cmp(self.v, other.v) < 0


def _cmp(a, b):
    """MongoDB $cmp: total order incl. cross-type via BSON type order."""
    c = compare_values(a, b)
    if c is not None:
        return c
    if values_equal(a, b):
        return 0
    return -1 if _type_rank(a) < _type_rank(b) else 1


def _type_rank(v):
    # BSON canonical sort order (public docs): null < numbers < string <
    # object < array < binary < objectid < bool < date
    from duckdb_mongo_spark.bsonlike import ObjectId

    if v is None:
        return 0
    if isinstance(v, bool):
        return 7
    if isinstance(v, (int, float, Decimal)):
        return 1
    if isinstance(v, str):
        return 2
    if isinstance(v, dict):
        return 3
    if isinstance(v, list):
        return 4
    if isinstance(v, (bytes, bytearray)):
        return 5
    if isinstance(v, ObjectId):
        return 6
    if isinstance(v, (_dt.date, _dt.datetime)):
        return 8
    return 9


def eval_expr(expr, doc):
    """Evaluate an aggregation expression against one document."""
    if isinstance(expr, str) and expr.startswith("$$"):
        return _var_lookup(expr[2:], doc)
    if isinstance(expr, str) and expr.startswith("$"):
        got = get_path(doc, expr[1:])
        return None if got is MISSING else got
    if not isinstance(expr, dict):
        return expr
    if len(expr) != 1:
        # expression object literal: {a: <expr>, b: <expr>} builds a doc
        return {k: _resolve(v, doc) for k, v in expr.items()}
    (op, raw), = expr.items()
    if not op.startswith("$"):
        return {op: _resolve(raw, doc)}

    if op == "$literal":
        return raw

    args = raw if isinstance(raw, list) else [raw]

    if op in ("$eq", "$ne", "$lt", "$lte", "$gt", "$gte", "$cmp"):
        a, b = _resolve(args[0], doc), _resolve(args[1], doc)
        c = _cmp(a, b)
        return {
            "$eq": c == 0, "$ne": c != 0, "$lt": c < 0, "$lte": c <= 0,
            "$gt": c > 0, "$gte": c >= 0, "$cmp": c,
        }[op]
    if op == "$and":
        return all(_truthy(_resolve(a, doc)) for a in args)
    if op == "$or":
        return any(_truthy(_resolve(a, doc)) for a in args)
    if op == "$not":
        return not _truthy(_resolve(args[0], doc))
    if op in ("$add", "$subtract", "$multiply", "$divide", "$mod"):
        vals = [_resolve(a, doc) for a in args]
        if any(v is None for v in vals):
            return None
        if op == "$add":
            if any(isinstance(v, (_dt.date, _dt.datetime)) for v in vals):
                base = next(v for v in vals if isinstance(v, (_dt.date, _dt.datetime)))
                ms = sum(_num(v) for v in vals if not isinstance(v, (_dt.date, _dt.datetime)))
                if not isinstance(base, _dt.datetime):
                    base = _dt.datetime(base.year, base.month, base.day)
                return base + _dt.timedelta(milliseconds=ms)
            return sum(_num(v) for v in vals)
        a, b = _num(vals[0]), _num(vals[1])
        if op == "$subtract":
            return a - b
        if op == "$multiply":
            r = 1
            for v in vals:
                r *= _num(v)
            return r
        if op == "$divide":
            return a / b if b != 0 else None
        return math.fmod(a, b) if isinstance(a, float) or isinstance(b, float) else a % b
    if op == "$abs":
        v = _resolve(args[0], doc)
        return None if v is None else abs(_num(v))
    if op in ("$floor", "$ceil", "$round", "$trunc", "$sqrt", "$ln", "$log10", "$exp", "$pow"):
        v = _resolve(args[0], doc)
        if v is None:
            return None
        n = _num(v)
        if op == "$floor":
            return math.floor(n)
        if op == "$ceil":
            return math.ceil(n)
        if op == "$round":
            p = int(_resolve(args[1], doc)) if len(args) > 1 else 0
            return round(n, p)
        if op == "$trunc":
            return math.trunc(n)
        if op == "$sqrt":
            return math.sqrt(n)
        if op == "$ln":
            return math.log(n)
        if op == "$log10":
            return math.log10(n)
        if op == "$exp":
            return math.exp(n)
        return n ** _num(_resolve(args[1], doc))
    if op == "$strLenCP":
        v = _resolve(args[0], doc)
        return None if v is None else len(str(v))
    if op == "$substrCP":
        s = _resolve(args[0], doc)
        if s is None:
            return None
        start = int(_resolve(args[1], doc))
        length = int(_resolve(args[2], doc))
        return str(s)[start : start + max(length, 0)]
    if op == "$toLower":
        v = _resolve(args[0], doc)
        return "" if v is None else str(v).lower()
    if op == "$toUpper":
        v = _resolve(args[0], doc)
        return "" if v is None else str(v).upper()
    if op == "$concat":
        vals = [_resolve(a, doc) for a in args]
        if any(v is None for v in vals):
            return None
        return "".join(str(v) for v in vals)
    if op == "$split":
        s, sep = _resolve(args[0], doc), _resolve(args[1], doc)
        return None if s is None else str(s).split(str(sep))
    if op == "$trim":
        spec = raw if isinstance(raw, dict) else {"input": args[0]}
        s = _resolve(spec["input"], doc)
        chars = spec.get("chars")
        return None if s is None else str(s).strip(chars)
    if op == "$cond":
        if isinstance(raw, dict):
            cond, then, els = raw["if"], raw["then"], raw["else"]
        else:
            cond, then, els = args
        return _resolve(then, doc) if _truthy(_resolve(cond, doc)) else _resolve(els, doc)
    if op == "$ifNull":
        for a in args:
            v = _resolve(a, doc)
            if v is not None:
                return v
        return None
    if op == "$in":
        v, arr = _resolve(args[0], doc), _resolve(args[1], doc)
        return any(values_equal(v, x) for x in (arr or []))
    if op == "$size":
        v = _resolve(args[0], doc)
        return None if v is None else len(v)
    if op == "$arrayElemAt":
        arr, idx = _resolve(args[0], doc), int(_resolve(args[1], doc))
        if arr is None:
            return None
        if -len(arr) <= idx < len(arr):
            return arr[idx]
        return None
    if op == "$concatArrays":
        parts = [_resolve(a, doc) for a in args]
        if any(p is None for p in parts):
            return None  # mongod: null operand -> null result
        out = []
        for p in parts:
            if not isinstance(p, list):
                raise ValueError("$concatArrays operand is not an array")
            out.extend(p)
        return out
    if op == "$map":
        arr = _resolve(raw["input"], doc)
        if arr is None:
            return None
        var = raw.get("as", "this")
        frames = _var_frames()
        out = []
        for el in arr:
            frames.append({var: el})
            try:
                out.append(eval_expr(raw["in"], doc))
            finally:
                frames.pop()
        return out
    if op == "$filter":
        arr = _resolve(raw["input"], doc)
        if arr is None:
            return None
        var = raw.get("as", "this")
        limit = raw.get("limit")
        if limit is not None:
            limit = int(_resolve(limit, doc))
        frames = _var_frames()
        out = []
        for el in arr:
            frames.append({var: el})
            try:
                keep = _truthy(eval_expr(raw["cond"], doc))
            finally:
                frames.pop()
            if keep:
                out.append(el)
                if limit is not None and len(out) >= limit:
                    break
        return out
    if op == "$reduce":
        arr = _resolve(raw["input"], doc)
        if arr is None:
            return None
        acc = _resolve(raw["initialValue"], doc)
        frames = _var_frames()
        for el in arr:
            frames.append({"value": acc, "this": el})
            try:
                acc = eval_expr(raw["in"], doc)
            finally:
                frames.pop()
        return acc
    if op == "$range":
        start = int(_num(_resolve(args[0], doc)))
        end = int(_num(_resolve(args[1], doc)))
        step = int(_num(_resolve(args[2], doc))) if len(args) > 2 else 1
        if step == 0:
            raise ValueError("$range step must be non-zero")
        return list(range(start, end, step))
    if op == "$zip":
        inputs = [_resolve(a, doc) for a in raw["inputs"]]
        if any(x is None for x in inputs):
            return None
        if raw.get("useLongestLength"):
            defaults = raw.get("defaults") or [None] * len(inputs)
            defaults = [_resolve(d, doc) for d in defaults]
            longest = max(len(x) for x in inputs)
            return [
                [x[i] if i < len(x) else defaults[j]
                 for j, x in enumerate(inputs)]
                for i in range(longest)
            ]
        return [list(t) for t in zip(*inputs)]
    if op == "$slice":
        arr = _resolve(args[0], doc)
        if arr is None:
            return None
        if len(args) == 2:
            n = int(_num(_resolve(args[1], doc)))
            return arr[n:] if n < 0 else arr[:n]
        pos = int(_num(_resolve(args[1], doc)))
        n = int(_num(_resolve(args[2], doc)))
        if n <= 0:
            raise ValueError("$slice count must be positive with a position")
        if pos < 0:
            pos = max(0, len(arr) + pos)
        return arr[pos:pos + n]
    if op == "$indexOfArray":
        arr = _resolve(args[0], doc)
        if arr is None:
            return None
        target = _resolve(args[1], doc)
        start = int(_num(_resolve(args[2], doc))) if len(args) > 2 else 0
        end = int(_num(_resolve(args[3], doc))) if len(args) > 3 else len(arr)
        for i in range(max(0, start), min(end, len(arr))):
            if values_equal(arr[i], target):
                return i
        return -1
    if op == "$isArray":
        return isinstance(_resolve(args[0], doc), list)
    if op == "$isNumber":
        v = _resolve(args[0], doc)
        return isinstance(v, (int, float, Decimal)) and not isinstance(v, bool)
    if op in ("$setUnion", "$setIntersection", "$setDifference"):
        sets = [_resolve(a, doc) for a in args]
        if any(s is None for s in sets):
            return None
        # set semantics over MQL equality; output sorted by BSON order for
        # determinism (mongod's output order is unspecified)
        def _dedup(xs):
            out = []
            for x in xs:
                if not any(values_equal(x, y) for y in out):
                    out.append(x)
            return out

        if op == "$setUnion":
            merged = _dedup([x for s in sets for x in s])
        elif op == "$setIntersection":
            merged = [
                x for x in _dedup(sets[0])
                if all(any(values_equal(x, y) for y in s) for s in sets[1:])
            ]
        else:
            a, b = sets[0], sets[1]
            merged = [
                x for x in _dedup(a)
                if not any(values_equal(x, y) for y in b)
            ]
        return sorted(merged, key=_sort_total)
    if op == "$objectToArray":
        v = _resolve(args[0], doc)
        if v is None:
            return None
        if not isinstance(v, dict):
            raise ValueError("$objectToArray operand is not a document")
        return [{"k": k, "v": x} for k, x in v.items()]
    if op == "$arrayToObject":
        v = _resolve(args[0], doc)
        if v is None:
            return None
        out = {}
        for el in v:
            if isinstance(el, dict):
                out[el["k"]] = el.get("v")
            else:  # [k, v] pair form
                out[el[0]] = el[1]
        return out
    if op == "$switch":
        for br in raw["branches"]:
            if _truthy(eval_expr(br["case"], doc)):
                return eval_expr(br["then"], doc)
        if "default" in raw:
            return eval_expr(raw["default"], doc)
        raise ValueError("$switch: no branch matched and no default")
    if op in ("$year", "$month", "$dayOfMonth", "$hour", "$minute", "$second"):
        v = _resolve(args[0], doc)
        if v is None:
            return None
        if isinstance(v, _dt.datetime):
            pass
        elif isinstance(v, _dt.date):
            v = _dt.datetime(v.year, v.month, v.day)
        attr = {
            "$year": "year", "$month": "month", "$dayOfMonth": "day",
            "$hour": "hour", "$minute": "minute", "$second": "second",
        }[op]
        return getattr(v, attr)
    if op == "$dateToString":
        v = _resolve(raw["date"], doc)
        fmt = raw.get("format", "%Y-%m-%dT%H:%M:%S.%LZ")
        if v is None:
            return None
        if not isinstance(v, _dt.datetime):
            v = _dt.datetime(v.year, v.month, v.day)
        fmt = fmt.replace("%L", f"{v.microsecond // 1000:03d}")
        return v.strftime(fmt)
    if op == "$toString":
        v = _resolve(args[0], doc)
        if v is None:
            return None
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)
    if op in ("$toInt", "$toLong"):
        v = _resolve(args[0], doc)
        # null on conversion failure (matches the compiled $convert
        # onError:null form and SQL CAST semantics, not mongod's
        # throwing bare $toLong — the compiler only emits $convert)
        return _convert_scalar(v, "long", on_error_null=True)
    if op == "$toDouble":
        v = _resolve(args[0], doc)
        return _convert_scalar(v, "double", on_error_null=True)
    if op == "$convert":
        spec = raw
        v = _resolve(spec["input"], doc)
        if v is None:
            return _resolve(spec["onNull"], doc) if "onNull" in spec else None
        try:
            return _convert_scalar(v, spec.get("to"), on_error_null=False)
        except (TypeError, ValueError):
            if "onError" in spec:
                return _resolve(spec["onError"], doc)
            raise
    if op == "$type":
        from duckdb_mongo_spark.bsonlike import bson_type_name

        v = _resolve(args[0], doc)
        name = bson_type_name(v)
        return {"int64": "long", "decimal128": "decimal"}.get(name, name)
    raise ValueError(f"unsupported aggregation expression operator: {op}")


def _truthy(v) -> bool:
    return not (v is None or v is False or v == 0)
