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

# hidden per-doc metadata slot written by $geoNear/$search/$vectorSearch and
# read by {$meta: ...}; single source of truth, re-exported by interpreter.py
META_KEY = "__mql_meta__"

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
        # mongod keeps query metadata out-of-document: $$ROOT/$$CURRENT
        # materialized as a VALUE must never carry the hidden meta slot
        # (it is readable only through {$meta: ...})
        if not rest and isinstance(doc, dict) and META_KEY in doc:
            return {k: v for k, v in doc.items() if k != META_KEY}
        base = doc
    elif name in ("DESCEND", "PRUNE", "KEEP"):
        return f"$${name}"  # $redact action sentinels
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


_FIXED_UNIT_MS = {
    "millisecond": 1, "second": 1000, "minute": 60_000, "hour": 3_600_000,
    "day": 86_400_000, "week": 604_800_000,
}
_MONTH_UNITS = {"month": 1, "quarter": 3, "year": 12}
# mongod's bin anchor for $dateTrunc fixed units
_TRUNC_ANCHOR = _dt.datetime(2000, 1, 1)
_WEEKDAYS = {
    "monday": 0, "mon": 0, "tuesday": 1, "tue": 1, "wednesday": 2, "wed": 2,
    "thursday": 3, "thu": 3, "friday": 4, "fri": 4, "saturday": 5, "sat": 5,
    "sunday": 6, "sun": 6,
}


def _as_datetime(v):
    if isinstance(v, _dt.datetime):
        return v
    if isinstance(v, _dt.date):
        return _dt.datetime(v.year, v.month, v.day)
    raise ValueError(f"expected a date, got {type(v).__name__}")


def date_add_unit(v, amount, unit):
    """Date arithmetic shared by ``$dateAdd``/``$dateSubtract`` and the
    interpreter's ``$densify`` grid: fixed units via timedelta,
    month/quarter/year via calendar math with end-of-month clamping."""
    import calendar

    v = _as_datetime(v)
    if unit in _FIXED_UNIT_MS:
        return v + _dt.timedelta(milliseconds=amount * _FIXED_UNIT_MS[unit])
    if unit not in _MONTH_UNITS:
        raise ValueError(f"unsupported date unit {unit!r}")
    months = _MONTH_UNITS[unit] * int(amount)
    m = v.month - 1 + months
    y, m = v.year + m // 12, m % 12 + 1
    return v.replace(year=y, month=m, day=min(v.day, calendar.monthrange(y, m)[1]))


def _date_trunc(v, unit, bin_size=1, start_of_week="sunday"):
    v = _as_datetime(v)
    bin_size = int(bin_size)
    if bin_size < 1:
        raise ValueError("binSize must be >= 1")
    if unit in _FIXED_UNIT_MS and unit != "week":
        step = _FIXED_UNIT_MS[unit] * bin_size
        ms = int((v - _TRUNC_ANCHOR).total_seconds() * 1000)
        floored = (ms // step) * step  # Python floor div: correct pre-2000
        return _TRUNC_ANCHOR + _dt.timedelta(milliseconds=floored)
    if unit == "week":
        dow = _WEEKDAYS[str(start_of_week).lower()]
        day = _dt.datetime(v.year, v.month, v.day)
        back = (day.weekday() - dow) % 7
        week_start = day - _dt.timedelta(days=back)
        if bin_size == 1:
            return week_start
        anchor = _TRUNC_ANCHOR - _dt.timedelta(
            days=(_TRUNC_ANCHOR.weekday() - dow) % 7
        )
        weeks = (week_start - anchor).days // 7
        return anchor + _dt.timedelta(weeks=(weeks // bin_size) * bin_size)
    if unit in _MONTH_UNITS:
        per = _MONTH_UNITS[unit] * bin_size
        months = (v.year - 2000) * 12 + (v.month - 1)
        floored = (months // per) * per
        return _dt.datetime(2000 + floored // 12, floored % 12 + 1, 1)
    raise ValueError(f"unsupported $dateTrunc unit {unit!r}")


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

    if op == "$meta":
        # query-execution metadata attached by $geoNear / $vectorSearch;
        # the interpreter stashes it in a hidden per-document slot that is
        # stripped from pipeline output (mongod keeps it out-of-document)
        meta = doc.get(META_KEY) if isinstance(doc, dict) else None
        return (meta or {}).get(raw)

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
    if op in ("$millisecond", "$dayOfWeek", "$isoDayOfWeek", "$dayOfYear",
              "$week", "$isoWeek", "$isoWeekYear"):
        v = _resolve(args[0], doc)
        if v is None:
            return None
        v = _as_datetime(v)
        if op == "$millisecond":
            return v.microsecond // 1000
        if op == "$dayOfWeek":  # 1 = Sunday .. 7 = Saturday
            return (v.weekday() + 1) % 7 + 1
        if op == "$isoDayOfWeek":  # 1 = Monday .. 7 = Sunday
            return v.weekday() + 1
        if op == "$dayOfYear":
            return v.timetuple().tm_yday
        if op == "$week":  # weeks start Sunday; days before it are week 0
            return int(v.strftime("%U"))
        if op == "$isoWeek":
            return v.isocalendar()[1]
        return v.isocalendar()[0]
    if op in ("$dateAdd", "$dateSubtract"):
        start = _resolve(raw["startDate"], doc)
        amount = _resolve(raw["amount"], doc)
        if start is None or amount is None:
            return None
        if op == "$dateSubtract":
            amount = -_num(amount)
        return date_add_unit(start, _num(amount), raw["unit"])
    if op == "$dateTrunc":
        v = _resolve(raw["date"], doc)
        if v is None:
            return None
        return _date_trunc(
            v, raw["unit"],
            bin_size=_num(_resolve(raw.get("binSize", 1), doc)),
            start_of_week=raw.get("startOfWeek", "sunday"),
        )
    if op == "$dateDiff":
        a = _resolve(raw["startDate"], doc)
        b = _resolve(raw["endDate"], doc)
        if a is None or b is None:
            return None
        unit = raw["unit"]
        sow = raw.get("startOfWeek", "sunday")
        # mongod counts unit BOUNDARIES crossed, not elapsed full units
        ta = _date_trunc(a, unit, start_of_week=sow)
        tb = _date_trunc(b, unit, start_of_week=sow)
        if unit in _MONTH_UNITS:
            months = (tb.year - ta.year) * 12 + (tb.month - ta.month)
            return months // _MONTH_UNITS[unit]
        ms = int((tb - ta).total_seconds() * 1000)
        return ms // _FIXED_UNIT_MS[unit]
    if op == "$toDate":
        v = _resolve(args[0], doc)
        if v is None:
            return None
        if isinstance(v, (_dt.date, _dt.datetime)):
            return _as_datetime(v)
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            return _dt.datetime(1970, 1, 1) + _dt.timedelta(milliseconds=_num(v))
        s = str(v).replace("Z", "+00:00")
        out = _dt.datetime.fromisoformat(s)
        return out.replace(tzinfo=None) if out.tzinfo else out
    if op == "$dateFromString":
        s = _resolve(raw["dateString"], doc)
        if s is None:
            return _resolve(raw["onNull"], doc) if "onNull" in raw else None
        try:
            fmt = raw.get("format")
            if fmt is None:
                iso = str(s).replace("Z", "+00:00")
                out = _dt.datetime.fromisoformat(iso)
            else:
                # %L (milliseconds) maps onto strptime's %f microseconds
                out = _dt.datetime.strptime(str(s), fmt.replace("%L", "%f"))
            return out.replace(tzinfo=None) if out.tzinfo else out
        except ValueError:
            if "onError" in raw:
                return _resolve(raw["onError"], doc)
            raise
    if op in ("$sum", "$avg", "$min", "$max", "$stdDevPop", "$stdDevSamp"):
        # EXPRESSION form (array / varargs), distinct from the $group
        # accumulators of the same names
        vals = [_resolve(a, doc) for a in args]
        if len(vals) == 1 and isinstance(vals[0], list):
            vals = vals[0]
        nums = [
            _num(v) for v in vals
            if isinstance(v, (int, float, Decimal)) and not isinstance(v, bool)
        ]
        if op == "$sum":
            return sum(nums) if nums else 0
        if op == "$avg":
            return sum(nums) / len(nums) if nums else None
        if op in ("$min", "$max"):
            cmp_vals = [v for v in vals if v is not None]
            if not cmp_vals:
                return None
            pick = min if op == "$min" else max
            return pick(cmp_vals, key=_sort_total)
        if not nums or (op == "$stdDevSamp" and len(nums) < 2):
            return None
        mean = sum(nums) / len(nums)
        m2 = sum((x - mean) ** 2 for x in nums)
        return math.sqrt(m2 / (len(nums) if op == "$stdDevPop" else len(nums) - 1))
    if op in ("$first", "$last"):
        v = _resolve(args[0], doc)
        if v is None:
            return None
        if not isinstance(v, list):
            raise ValueError(f"{op} operand is not an array")
        if not v:
            return None
        return v[0] if op == "$first" else v[-1]
    if op == "$reverseArray":
        v = _resolve(args[0], doc)
        return None if v is None else list(reversed(v))
    if op == "$sortArray":
        arr = _resolve(raw["input"], doc)
        if arr is None:
            return None
        sort_by = raw["sortBy"]
        if isinstance(sort_by, dict):
            out = list(arr)
            for field, direction in reversed(list(sort_by.items())):
                out.sort(
                    key=lambda d, f=field: _sort_total(
                        get_path(d, f) if isinstance(d, dict) else None
                    ),
                    reverse=(direction == -1),
                )
            return out
        return sorted(arr, key=_sort_total, reverse=(sort_by == -1))
    if op == "$mergeObjects":
        out = {}
        for a in args:
            v = _resolve(a, doc)
            if v is None:
                continue
            if not isinstance(v, dict):
                raise ValueError("$mergeObjects operand is not a document")
            out.update(v)
        return out
    if op == "$getField":
        spec = raw if isinstance(raw, dict) else {"field": raw}
        target = _resolve(spec["input"], doc) if "input" in spec else doc
        if target is None:
            return None
        got = target.get(spec["field"], MISSING) if isinstance(target, dict) else MISSING
        return None if got is MISSING else got
    if op in ("$setField", "$unsetField"):
        target = _resolve(raw["input"], doc)
        if target is None:
            return None
        if not isinstance(target, dict):
            raise ValueError(f"{op} input is not a document")
        out = dict(target)
        if op == "$unsetField":
            out.pop(raw["field"], None)
        else:
            out[raw["field"]] = _resolve(raw["value"], doc)
        return out
    if op == "$regexMatch":
        import re as _re

        s = _resolve(raw["input"], doc)
        if s is None:
            return False
        pattern = _resolve(raw["regex"], doc)
        flags = 0
        for ch in raw.get("options", ""):
            flags |= {"i": _re.IGNORECASE, "m": _re.MULTILINE,
                      "s": _re.DOTALL, "x": _re.VERBOSE}[ch]
        return _re.search(pattern, str(s), flags) is not None
    if op in ("$replaceOne", "$replaceAll"):
        s = _resolve(raw["input"], doc)
        find = _resolve(raw["find"], doc)
        repl = _resolve(raw["replacement"], doc)
        if s is None or find is None or repl is None:
            return None
        return str(s).replace(str(find), str(repl),
                              1 if op == "$replaceOne" else -1)
    if op == "$indexOfCP":
        s = _resolve(args[0], doc)
        if s is None:
            return None
        sub = str(_resolve(args[1], doc))
        start = int(_num(_resolve(args[2], doc))) if len(args) > 2 else 0
        end = int(_num(_resolve(args[3], doc))) if len(args) > 3 else len(str(s))
        return str(s).find(sub, start, end)
    if op in ("$ltrim", "$rtrim"):
        s = _resolve(raw["input"], doc)
        chars = raw.get("chars")
        if s is None:
            return None
        return str(s).lstrip(chars) if op == "$ltrim" else str(s).rstrip(chars)
    if op == "$toBool":
        v = _resolve(args[0], doc)
        if v is None:
            return None
        if isinstance(v, bool):
            return v
        if isinstance(v, (int, float, Decimal)):
            return v != 0
        return True  # mongod: any string/date/etc. converts to true
    if op in ("$setEquals", "$setIsSubset"):
        sets = [_resolve(a, doc) for a in args]
        if any(s is None or not isinstance(s, list) for s in sets):
            raise ValueError(f"{op} operands must be arrays")

        def member(x, xs):
            return any(values_equal(x, y) for y in xs)

        if op == "$setIsSubset":
            a, b = sets
            return all(member(x, b) for x in a)
        first = sets[0]
        return all(
            all(member(x, s) for x in first) and all(member(x, first) for x in s)
            for s in sets[1:]
        )
    if op in ("$anyElementTrue", "$allElementsTrue"):
        arr = _resolve(args[0], doc)
        if not isinstance(arr, list):
            raise ValueError(f"{op} operand must be an array")
        test = any if op == "$anyElementTrue" else all
        return test(_truthy(x) for x in arr)
    if op == "$log":
        v, base = _resolve(args[0], doc), _resolve(args[1], doc)
        if v is None or base is None:
            return None
        return math.log(_num(v), _num(base))
    if op in ("$sin", "$cos", "$tan", "$asin", "$acos", "$atan", "$sinh",
              "$cosh", "$tanh", "$degreesToRadians", "$radiansToDegrees"):
        v = _resolve(args[0], doc)
        if v is None:
            return None
        fn = {
            "$sin": math.sin, "$cos": math.cos, "$tan": math.tan,
            "$asin": math.asin, "$acos": math.acos, "$atan": math.atan,
            "$sinh": math.sinh, "$cosh": math.cosh, "$tanh": math.tanh,
            "$degreesToRadians": math.radians, "$radiansToDegrees": math.degrees,
        }[op]
        return fn(_num(v))
    if op == "$dateToParts":
        spec = raw if isinstance(raw, dict) else {"date": raw}
        v = _resolve(spec["date"], doc)
        if v is None:
            return None
        v = _as_datetime(v)
        if spec.get("iso8601"):
            iso = v.isocalendar()
            return {
                "isoWeekYear": iso[0], "isoWeek": iso[1],
                "isoDayOfWeek": iso[2], "hour": v.hour, "minute": v.minute,
                "second": v.second, "millisecond": v.microsecond // 1000,
            }
        return {
            "year": v.year, "month": v.month, "day": v.day, "hour": v.hour,
            "minute": v.minute, "second": v.second,
            "millisecond": v.microsecond // 1000,
        }
    if op == "$dateFromParts":
        def part(name, default):
            if name not in raw:
                return default
            v = _resolve(raw[name], doc)
            return default if v is None else int(_num(v))

        if "isoWeekYear" not in raw and "year" not in raw:
            # mongod requires 'year' (or 'isoWeekYear'); no silent 1970 default
            raise ValueError(
                "$dateFromParts requires 'year' or 'isoWeekYear'")
        if "isoWeekYear" in raw:
            base = _dt.datetime.fromisocalendar(
                part("isoWeekYear", 1970), part("isoWeek", 1),
                part("isoDayOfWeek", 1),
            )
        else:
            # mongod carries out-of-range parts into the next unit
            # (month 13 -> January next year, day 0 -> last of previous
            # month); build at month granularity then add day/time deltas
            y, m = part("year", 1970), part("month", 1)
            mm = m - 1
            y, mm = y + mm // 12, mm % 12
            base = _dt.datetime(y, mm + 1, 1) + _dt.timedelta(
                days=part("day", 1) - 1
            )
        return base + _dt.timedelta(
            hours=part("hour", 0), minutes=part("minute", 0),
            seconds=part("second", 0), milliseconds=part("millisecond", 0),
        )
    if op == "$atan2":
        a, b = _resolve(args[0], doc), _resolve(args[1], doc)
        if a is None or b is None:
            return None
        return math.atan2(_num(a), _num(b))
    raise ValueError(f"unsupported aggregation expression operator: {op}")


def _truthy(v) -> bool:
    return not (v is None or v is False or v == 0)
