"""Local aggregation-pipeline interpreter.

Executes the pipeline dialect our pushdown planner emits —
``$match $project $addFields $group $sort $skip $limit $count $sample
$unwind $lookup $graphLookup $replaceRoot/$replaceWith $sortByCount
$facet $bucket $bucketAuto $setWindowFields $densify $fill $unset
$unionWith $redact $geoNear $vectorSearch $out $merge`` — against an
iterable of Python-dict documents. This is the
hermetic stand-in for mongod: the reference ships pipelines to a real
server (/root/reference/src/mongo_table_function.cpp:326-366); we execute
the same dialect locally so every pushdown has an executable oracle.

Determinism: ``$sample`` takes an optional ``seed`` (extension to the
public dialect) so schema inference is reproducible in tests.
"""

from __future__ import annotations

import random
from decimal import Decimal as _Decimal

from duckdb_mongo_spark.mql.expr import (
    _FIXED_UNIT_MS,
    _MONTH_UNITS,
    META_KEY as _META_KEY,
    _type_rank,
    date_add_unit,
    eval_expr,
)
from duckdb_mongo_spark.mql.match import (
    EARTH_RADIUS_M as _EARTH_RADIUS_M,
    MISSING,
    compare_values,
    get_path,
    haversine_rad as _haversine_rad,
    matches_filter,
    parse_point as _parse_point,
    values_equal,
)


def _sort_key(doc, field):
    v = get_path(doc, field)
    if v is MISSING:
        v = None
    return _OrderedVal(v)


class _OrderedVal:
    """Total order over mixed-type values per BSON canonical sort order."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __lt__(self, other):
        a, b = self.v, other.v
        c = compare_values(a, b)
        if c is not None:
            return c < 0
        ra, rb = _type_rank(a), _type_rank(b)
        if ra != rb:
            return ra < rb
        return str(a) < str(b)

    def __eq__(self, other):
        c = compare_values(self.v, other.v)
        return c == 0 if c is not None else str(self.v) == str(other.v)


def _project(docs, spec):
    inclusion = None
    computed = {}
    excluded = set()
    include_id = True
    for k, v in spec.items():
        if k == "_id" and v in (0, False):
            include_id = False
        elif v in (1, True):
            inclusion = True
        elif v in (0, False):
            excluded.add(k)
            inclusion = False if inclusion is None else inclusion
        else:
            computed[k] = v
            inclusion = True
    for doc in docs:
        if inclusion is False or (inclusion is None and not computed):
            out = {k: v for k, v in doc.items() if k not in excluded}
            if not include_id:
                out.pop("_id", None)
        else:
            out = {}
            if include_id and "_id" in doc:
                out["_id"] = doc["_id"]
            if _META_KEY in doc:
                # metadata survives projection (mongod keeps it out-of-doc)
                out[_META_KEY] = doc[_META_KEY]
            for k, v in spec.items():
                if k == "_id":
                    continue
                if v in (1, True):
                    got = get_path(doc, k)
                    if got is not MISSING:
                        # dotted inclusions rebuild the nested structure
                        # mongod returns ({"a.b": 1} → {a: {b: v}}), so
                        # flatten_document's dotted-path navigation works
                        # on locally-interpreted results too
                        if "." in k:
                            _set_path(out, k, got)
                        else:
                            out[k] = got
                elif k in computed:
                    val = eval_expr(v, doc)
                    if "." in k:
                        _set_path(out, k, val)
                    else:
                        out[k] = val
        yield out


_ACCUMULATORS = {
    "$sum", "$min", "$max", "$avg", "$first", "$last", "$push", "$addToSet",
    "$count", "$stdDevPop", "$stdDevSamp", "$mergeObjects",
}


def _group(docs, spec):
    id_expr = spec["_id"]
    accs = {k: v for k, v in spec.items() if k != "_id"}
    groups: dict = {}
    order: list = []
    for doc in docs:
        gid = eval_expr(id_expr, doc) if id_expr is not None else None
        key = _freeze(gid)
        if key not in groups:
            groups[key] = {"_gid": gid, "_state": {k: None for k in accs}, "_n": {k: 0 for k in accs}}
            order.append(key)
        g = groups[key]
        for name, accdoc in accs.items():
            (op, arg), = accdoc.items()
            if op == "$count":
                g["_state"][name] = (g["_state"][name] or 0) + 1
                continue
            val = eval_expr(arg, doc)
            if isinstance(val, _Decimal):
                # decimal128 → double contract (SURVEY §1.2)
                val = float(val)
            st = g["_state"][name]
            if op == "$sum":
                if isinstance(val, bool) or not isinstance(val, (int, float)):
                    val = 0
                g["_state"][name] = (st or 0) + val
            elif op == "$avg":
                if isinstance(val, (int, float)) and not isinstance(val, bool):
                    g["_state"][name] = (st or 0) + val
                    g["_n"][name] += 1
            elif op == "$min":
                if val is not None and (st is None or compare_values(val, st) == -1):
                    g["_state"][name] = val
            elif op == "$max":
                if val is not None and (st is None or compare_values(val, st) == 1):
                    g["_state"][name] = val
            elif op == "$first":
                if g["_n"][name] == 0:
                    g["_state"][name] = val
                    g["_n"][name] = 1
            elif op == "$last":
                g["_state"][name] = val
            elif op == "$push":
                g["_state"][name] = (st or []) + [val]
            elif op == "$addToSet":
                cur = st or []
                if not any(_freeze(val) == _freeze(x) for x in cur):
                    cur = cur + [val]
                g["_state"][name] = cur
            elif op in ("$stdDevPop", "$stdDevSamp"):
                # Welford online state (n, mean, M2): Σx² − n·mean² suffers
                # catastrophic cancellation for large-magnitude, small-
                # variance inputs; M2 is non-negative by construction.
                # Non-numeric values ignored, as mongod documents.
                if isinstance(val, (int, float)) and not isinstance(val, bool):
                    n_, mean, m2 = st or (0, 0.0, 0.0)
                    n_ += 1
                    delta = val - mean
                    mean += delta / n_
                    m2 += delta * (val - mean)
                    g["_state"][name] = (n_, mean, m2)
            elif op == "$mergeObjects":
                if isinstance(val, dict):
                    merged = dict(st or {})
                    merged.update(val)  # later docs win, per mongod
                    g["_state"][name] = merged
                elif st is None and val is None:
                    g["_state"][name] = None
            else:
                raise ValueError(f"unsupported accumulator: {op}")
    for key in order:
        g = groups[key]
        out = {"_id": g["_gid"]}
        for name, accdoc in accs.items():
            (op, _), = accdoc.items()
            v = g["_state"][name]
            if op == "$avg":
                v = (v / g["_n"][name]) if g["_n"][name] else None
            elif op in ("$sum", "$count") and v is None:
                v = 0
            elif op in ("$stdDevPop", "$stdDevSamp"):
                if v is None:
                    v = None
                else:
                    n_, _mean, m2 = v
                    denom = n_ if op == "$stdDevPop" else n_ - 1
                    if denom <= 0:
                        # pop of 1 value = 0.0; samp of 1 value = null (mongod)
                        v = 0.0 if op == "$stdDevPop" and n_ == 1 else None
                    else:
                        v = (m2 / denom) ** 0.5
            elif op == "$mergeObjects" and v is None:
                v = {}
            out[name] = v
        yield out


def _freeze(v):
    if isinstance(v, dict):
        return ("d",) + tuple((k, _freeze(x)) for k, x in v.items())
    if isinstance(v, list):
        return ("l",) + tuple(_freeze(x) for x in v)
    if isinstance(v, (int, float, _Decimal)) and not isinstance(v, bool):
        # mongod groups / $addToSet-dedups numerics by VALUE across types
        # (1, 1.0 and NumberDecimal("1") are one group key); share
        # _canon_key's exact-int canonicalization
        return _canon_key(v)
    return (type(v).__name__, v)


def _unwind(docs, spec):
    if isinstance(spec, str):
        path, keep_empty = spec, False
    else:
        path, keep_empty = spec["path"], spec.get("preserveNullAndEmptyArrays", False)
    field = path[1:] if path.startswith("$") else path
    for doc in docs:
        val = get_path(doc, field)
        if val is MISSING or val is None or (isinstance(val, list) and not val):
            if keep_empty:
                # MongoDB preserveNullAndEmptyArrays: null/missing values
                # pass through unchanged; only EMPTY ARRAYS have the leaf
                # removed (dotted-path aware)
                out = dict(doc)
                if isinstance(val, list):
                    _del_path(out, field)
                yield out
            continue
        if not isinstance(val, list):
            yield doc
            continue
        for el in val:
            out = dict(doc)
            _set_path(out, field, el)
            yield out


def _del_path(doc, path):
    parts = path.split(".")
    cur = doc
    for p in parts[:-1]:
        nxt = cur.get(p)
        if not isinstance(nxt, dict):
            return
        nxt = dict(nxt)
        cur[p] = nxt
        cur = nxt
    cur.pop(parts[-1], None)


def _set_path(doc, path, value):
    parts = path.split(".")
    cur = doc
    for p in parts[:-1]:
        nxt = cur.get(p)
        if not isinstance(nxt, dict):
            nxt = {}
            cur[p] = nxt
        else:
            nxt = dict(nxt)
            cur[p] = nxt
        cur = nxt
    cur[parts[-1]] = value


def _canon_key(v):
    """Hashable canonical form implementing MQL equality for the
    ``$lookup`` hash index: numerics compare cross-type (1 == 1.0),
    arrays/documents structurally, null and missing identically."""
    if v is MISSING or v is None:
        return ("z",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, (int, float, _Decimal)):
        # Integral values canonicalize to exact int: collapsing every
        # numeric to float would falsely equate int64 keys that differ
        # only beyond 2^53 (mongod compares numerics exactly across
        # types). Non-integral values go to float, keeping 1 == 1.0.
        try:
            i = int(v)
            if v == i:
                return ("n", i)
        except (OverflowError, ValueError):
            pass  # inf / nan
        return ("n", float(v))
    if isinstance(v, dict):
        return ("d", tuple((k, _canon_key(x)) for k, x in sorted(v.items())))
    if isinstance(v, list):
        return ("l", tuple(_canon_key(x) for x in v))
    return (type(v).__name__, v)


def _lookup(docs, spec, collections, seed):
    """``$lookup`` equality form (localField/foreignField), per the
    public MongoDB semantics: the joined array holds every foreign doc
    whose foreignField equals the local value; an array on either side
    matches on any element (or the whole array); null matches null AND
    missing. The pipeline form is supported without ``let`` (the
    sub-pipeline is then independent of the outer doc and runs once).
    """
    if collections is None:
        raise ValueError(
            "$lookup needs a collections resolver (run_pipeline(..., "
            "collections=...)); backend aggregate() wires this automatically"
        )
    out_field = spec["as"]
    foreign = list(collections(spec["from"]))
    if "pipeline" in spec:
        if spec.get("let"):
            raise ValueError("$lookup with let-bound pipeline variables is not supported")
        matched = run_pipeline(foreign, spec["pipeline"], seed=seed, collections=collections)
        for doc in docs:
            out = dict(doc)
            out[out_field] = list(matched)
            yield out
        return
    local_f, foreign_f = spec["localField"], spec["foreignField"]
    index: dict = {}
    for i, fdoc in enumerate(foreign):
        fv = get_path(fdoc, foreign_f)
        keys = {_canon_key(fv)}
        if isinstance(fv, list):
            keys.update(_canon_key(el) for el in fv)
        for k in keys:
            index.setdefault(k, []).append((i, fdoc))
    for doc in docs:
        lv = get_path(doc, local_f)
        probes = [_canon_key(lv)]
        if isinstance(lv, list):
            probes.extend(_canon_key(el) for el in lv)
        hits: dict[int, dict] = {}
        for p in probes:
            for i, fdoc in index.get(p, ()):
                hits.setdefault(i, fdoc)
        out = dict(doc)
        # foreign-collection natural order, each doc at most once
        out[out_field] = [hits[i] for i in sorted(hits)]
        yield out


_WINDOW_ACCS = {"$sum", "$avg", "$min", "$max", "$push", "$count", "$first",
                "$last", "$addToSet", "$stdDevPop", "$stdDevSamp"}
_RANK_OPS = {"$rank", "$denseRank", "$documentNumber"}


def _range_window_bounds(values, i: int, window, nn: int = 0) -> tuple[int, int]:
    """Resolve a ``range: [lo, hi]`` window (bounds relative to the
    current document's sortBy VALUE, inclusive both ends; ``unit`` maps
    numeric deltas onto time sortBy fields) to [start, end) indexes over
    the ascending-sorted ``values``. ``nn`` is the index of the first
    non-null value (nulls sort first); null docs get the documented
    empty-window identity and are excluded from every non-null doc's
    window, so the bisect never compares against None."""
    import bisect

    lo, hi = window["range"]
    unit = window.get("unit")
    x = values[i]
    if x is None:
        return i, i  # null sort value: empty window (comparisons fail)

    def edge(v):
        if v == "current":
            return x
        if unit is not None:
            return _densify_add(x, v, unit)
        return x + v

    start = nn if lo == "unbounded" else bisect.bisect_left(values, edge(lo), nn)
    end = (len(values) if hi == "unbounded"
           else bisect.bisect_right(values, edge(hi), nn))
    return start, max(start, end)


def _window_bounds(window, i: int, n: int) -> tuple[int, int]:
    """Resolve a ``documents: [lo, hi]`` window to [start, end) row
    indexes around position ``i`` (defaults to the whole partition,
    mongod's behavior when no window is given)."""
    if not window:
        return 0, n
    lo, hi = window.get("documents", ["unbounded", "unbounded"])

    def _edge(v, default):
        if v == "unbounded":
            return default
        if v == "current":
            return i
        return i + int(v)

    # clamp start into [0, n] BEFORE resolving the empty-window case: a
    # window lying entirely past the partition end (e.g. documents [2,5]
    # at the last row) must yield an EMPTY range, not a negative one
    # (mongod returns 0 for $count there, not -1)
    start = min(max(0, _edge(lo, 0)), n)
    end = min(n, _edge(hi, n - 1) + 1)
    return start, max(start, end)


def _set_window_fields(docs: list, spec: dict) -> list:
    """``$setWindowFields`` subset: partitionBy expression, sortBy doc,
    document-based AND range-based windows (range bounds relative to
    the current doc's single ascending sortBy value, optional time
    ``unit``), the common accumulators plus $rank / $denseRank /
    $documentNumber / $shift. Output order: partitions in
    first-appearance order of
    their key, documents sorted by sortBy within each (mongod guarantees
    sort only within the partition)."""
    part_by = spec.get("partitionBy")
    sort_by = spec.get("sortBy")
    output = spec["output"]
    parts: dict = {}
    order: list = []
    for doc in docs:
        key = _freeze(eval_expr(part_by, doc)) if part_by is not None else None
        if key not in parts:
            parts[key] = []
            order.append(key)
        parts[key].append(doc)
    out_docs = []
    for key in order:
        group = parts[key]
        if sort_by:
            for field, direction in reversed(list(sort_by.items())):
                group.sort(key=lambda d, f=field: _sort_key(d, f),
                           reverse=(direction == -1))
        n = len(group)
        new_fields: list[dict] = [dict() for _ in range(n)]
        for out_name, accdoc in output.items():
            acc = {k: v for k, v in accdoc.items() if k != "window"}
            window = accdoc.get("window")
            (op, arg), = acc.items()
            if op in _RANK_OPS:
                if not sort_by:
                    raise ValueError(f"{op} requires sortBy")
                if window:
                    raise ValueError(f"{op} does not accept a window")
                sort_fields = list(sort_by.items())
                rank = dense = 0
                prev = None
                for i, d in enumerate(group):
                    cur = tuple(_sort_key(d, f) for f, _ in sort_fields)
                    if op == "$documentNumber":
                        new_fields[i][out_name] = i + 1
                        continue
                    if prev is None or cur != prev:
                        dense += 1
                        rank = i + 1
                        prev = cur
                    new_fields[i][out_name] = rank if op == "$rank" else dense
            elif op == "$shift":
                by = int(arg.get("by", 0))
                default = arg.get("default")
                path = arg["output"]
                for i in range(n):
                    j = i + by
                    if 0 <= j < n:
                        v = eval_expr(path, group[j])
                    else:
                        v = eval_expr(default, group[i]) if default is not None else None
                    new_fields[i][out_name] = v
            elif op in _WINDOW_ACCS:
                is_range = bool(window) and "range" in window
                if is_range:
                    if not sort_by or len(sort_by) != 1:
                        raise ValueError(
                            "range window requires a single sortBy field")
                    (sfield, sdir), = sort_by.items()
                    if sdir != 1:
                        raise ValueError("range window requires ascending sortBy")
                    svals = [
                        None if (v := get_path(d, sfield)) is MISSING else v
                        for d in group
                    ]
                    # nulls sort first: first non-null index bounds the bisect
                    first_nn = next(
                        (j for j, v in enumerate(svals) if v is not None), n)
                for i in range(n):
                    if is_range:
                        start, end = _range_window_bounds(
                            svals, i, window, first_nn)
                    else:
                        start, end = _window_bounds(window, i, n)
                    if op == "$count":
                        # $count takes {} — rows in window
                        new_fields[i][out_name] = end - start
                        continue
                    sub = list(_group(group[start:end],
                                      {"_id": None, out_name: {op: arg}}))
                    if sub:
                        new_fields[i][out_name] = sub[0][out_name]
                    elif op == "$sum":
                        # mongod's empty-window identities: 0 for $sum,
                        # [] for $push/$addToSet, null otherwise
                        new_fields[i][out_name] = 0
                    elif op in ("$push", "$addToSet"):
                        new_fields[i][out_name] = []
                    else:
                        new_fields[i][out_name] = None
            else:
                raise ValueError(f"unsupported window operator: {op}")
        for d, extra in zip(group, new_fields):
            merged = dict(d)
            for k, v in extra.items():
                _set_path(merged, k, v)
            out_docs.append(merged)
    return out_docs


def _densify_add(v, step, unit):
    """Advance a densify grid value by one step (numeric, or the shared
    date arithmetic used by $dateAdd — fixed units via timedelta,
    month/quarter/year with day clamping)."""
    if unit is None:
        return v + step
    return date_add_unit(v, step, unit)


def _densify(docs, spec):
    """``$densify``: generate documents on a step grid of ``field`` so
    gaps close. bounds: "full" (grid spans the global [min, max] in
    every partition), "partition" (per-partition [min, max]), or an
    explicit half-open [lo, hi). Generated docs carry only the partition
    fields + the grid value; documents lacking the field pass through
    first in input order. Output: partitions in first-appearance order,
    docs sorted by the densify field within each."""
    field = spec["field"]
    rng = spec["range"]
    step = rng["step"]
    unit = rng.get("unit")
    if unit is not None and unit not in _FIXED_UNIT_MS and unit not in _MONTH_UNITS:
        raise ValueError(f"$densify: unsupported unit {unit!r}")
    bounds = rng["bounds"]
    part_fields = list(spec.get("partitionByFields") or [])
    if (unit is None and not step > 0) or (unit is not None and int(step) <= 0):
        raise ValueError("$densify: step must be positive")
    docs = list(docs)
    parts: dict = {}
    part_vals: dict = {}
    order: list = []
    no_field: list = []
    for d in docs:
        v = get_path(d, field)
        if v is MISSING or v is None:
            no_field.append(d)
            continue
        pv = [get_path(d, f) for f in part_fields]
        key = _freeze(pv)
        if key not in parts:
            parts[key] = []
            part_vals[key] = pv
            order.append(key)
        parts[key].append(d)
    all_vals = [
        get_path(d, field) for ds in parts.values() for d in ds
    ]
    out = list(no_field)
    explicit = isinstance(bounds, (list, tuple))
    for key in order:
        group = sorted(parts[key], key=lambda d: _OrderedVal(get_path(d, field)))
        vals = [get_path(d, field) for d in group]
        if explicit:
            lo, hi = bounds
        elif bounds == "full":
            lo = min(all_vals, key=_OrderedVal)
            hi = max(all_vals, key=_OrderedVal)
        elif bounds == "partition":
            lo, hi = vals[0], vals[-1]
        else:
            raise ValueError(f"$densify: invalid bounds {bounds!r}")
        present = {_freeze(v) for v in vals}
        generated = []
        v = lo
        # explicit bounds are half-open [lo, hi); computed bounds close
        # at the existing max (which is itself a document)
        while (compare_values(v, hi) or 0) < 0 or (not explicit and values_equal(v, hi)):
            if _freeze(v) not in present:
                g: dict = {}
                for pf, pv in zip(part_fields, part_vals[key]):
                    _set_path(g, pf, pv)
                _set_path(g, field, v)
                generated.append(g)
            v = _densify_add(v, step, unit)
        merged = group + generated
        merged.sort(key=lambda d: _OrderedVal(get_path(d, field)))
        out.extend(merged)
    return out


def _fill(docs, spec):
    """``$fill``: fill null/missing output fields per partition —
    constant/expression ``value``, ``locf`` (last observation carried
    forward), or ``linear`` (interpolation over the single numeric
    sortBy field). Output order: partitions in first-appearance order,
    sortBy order within each (input order when no sortBy)."""
    part_expr = spec.get("partitionBy")
    part_fields = spec.get("partitionByFields")
    sort_by = spec.get("sortBy")
    output = spec["output"]
    methods = {k: v for k, v in output.items()}
    needs_sort = any("method" in c for c in methods.values())
    if needs_sort and not sort_by:
        raise ValueError("$fill: locf/linear require sortBy")
    docs = list(docs)
    parts: dict = {}
    order: list = []
    for d in docs:
        if part_expr is not None:
            key = _freeze(eval_expr(part_expr, d))
        elif part_fields:
            key = _freeze([get_path(d, f) for f in part_fields])
        else:
            key = None
        if key not in parts:
            parts[key] = []
            order.append(key)
        parts[key].append(d)
    out_docs = []
    for key in order:
        group = [dict(d) for d in parts[key]]
        if sort_by:
            for field, direction in reversed(list(sort_by.items())):
                group.sort(key=lambda d, f=field: _sort_key(d, f),
                           reverse=(direction == -1))
        for out_field, conf in methods.items():
            if "value" in conf:
                for d in group:
                    cur = get_path(d, out_field)
                    if cur is MISSING or cur is None:
                        _set_path(d, out_field, eval_expr(conf["value"], d))
            elif conf.get("method") == "locf":
                last = None
                for d in group:
                    cur = get_path(d, out_field)
                    if cur is MISSING or cur is None:
                        if last is not None:
                            _set_path(d, out_field, last)
                    else:
                        last = cur
            elif conf.get("method") == "linear":
                if len(sort_by) != 1:
                    raise ValueError("$fill linear requires a single sortBy field")
                (x_field, _), = sort_by.items()
                xs = [get_path(d, x_field) for d in group]
                known = [
                    (i, float(get_path(d, out_field)))
                    for i, d in enumerate(group)
                    if get_path(d, out_field) is not MISSING
                    and get_path(d, out_field) is not None
                ]
                for j, (i1, y1) in enumerate(known[1:], start=1):
                    i0, y0 = known[j - 1]
                    x0, x1 = float(xs[i0]), float(xs[i1])
                    for i in range(i0 + 1, i1):
                        if x1 == x0:
                            continue
                        y = y0 + (y1 - y0) * (float(xs[i]) - x0) / (x1 - x0)
                        _set_path(group[i], out_field, y)
                # nulls before the first / after the last known stay null
            else:
                raise ValueError(f"$fill: unsupported method in {conf!r}")
        out_docs.extend(group)
    return out_docs


def _graph_lookup(docs, spec, collections):
    """``$graphLookup``: breadth-first traversal over ``from``.
    startWith values match ``connectToField`` at depth 0; each matched
    doc's ``connectFromField`` values feed the next frontier. Results
    are each foreign doc at its MINIMUM depth, ordered (depth, foreign
    natural order) — a deterministic refinement of mongod's unspecified
    order. ``restrictSearchWithMatch`` filters the foreign collection
    up front; ``maxDepth`` bounds traversal; ``depthField`` annotates."""
    if collections is None:
        raise ValueError("$graphLookup requires a collection resolver")
    from_docs = list(collections(spec["from"]))
    restrict = spec.get("restrictSearchWithMatch")
    if restrict:
        from_docs = [d for d in from_docs if matches_filter(d, restrict)]
    connect_to = spec["connectToField"]
    connect_from = spec["connectFromField"]
    as_field = spec["as"]
    max_depth = spec.get("maxDepth")
    depth_field = spec.get("depthField")
    index: dict = {}
    for i, fd in enumerate(from_docs):
        tv = get_path(fd, connect_to)
        if tv is MISSING:
            continue
        probes = [tv]
        if isinstance(tv, list):
            probes.extend(tv)
        for p in probes:
            index.setdefault(_canon_key(p), []).append(i)

    def frontier_values(v):
        if v is MISSING:
            return []
        return list(v) if isinstance(v, list) else [v]

    out = []
    for doc in docs:
        start = eval_expr(spec["startWith"], doc)
        frontier = frontier_values(start)
        found: dict[int, int] = {}  # foreign index -> min depth
        depth = 0
        while frontier and (max_depth is None or depth <= max_depth):
            hits = set()
            for v in frontier:
                hits.update(index.get(_canon_key(v), ()))
            fresh = [i for i in sorted(hits) if i not in found]
            if not fresh:
                break
            for i in fresh:
                found[i] = depth
            frontier = [
                v for i in fresh for v in frontier_values(
                    get_path(from_docs[i], connect_from)
                )
            ]
            depth += 1
        results = []
        for i in sorted(found, key=lambda i: (found[i], i)):
            fd = dict(from_docs[i])
            if depth_field:
                _set_path(fd, depth_field, found[i])
            results.append(fd)
        merged = dict(doc)
        merged[as_field] = results
        out.append(merged)
    return out


def _redact_doc(node: dict, spec):
    """``$redact`` on one (sub)document: evaluate the expression with
    the subdocument as $$CURRENT; $$PRUNE drops the subtree, $$KEEP
    keeps it without further evaluation, $$DESCEND keeps this level and
    recurses into embedded documents (including docs inside arrays —
    non-document array elements always survive a descend)."""
    action = eval_expr(spec, node)
    if action == "$$PRUNE":
        return None
    if action == "$$KEEP":
        return dict(node)
    if action != "$$DESCEND":
        raise ValueError(
            "$redact expression must resolve to $$DESCEND, $$PRUNE or $$KEEP,"
            f" got {action!r}"
        )
    out = {}
    for k, v in node.items():
        if isinstance(v, dict):
            sub = _redact_doc(v, spec)
            if sub is not None:
                out[k] = sub
        elif isinstance(v, list):
            kept = []
            for el in v:
                if isinstance(el, dict):
                    sub = _redact_doc(el, spec)
                    if sub is not None:
                        kept.append(sub)
                else:
                    kept.append(el)
            out[k] = kept
        else:
            out[k] = v
    return out


def _merge_stage(stream, spec, collections, collection_sink):
    """``$merge``: upsert the pipeline's output into a target collection.
    on-key default ``_id``; whenMatched replace|keepExisting|merge|fail;
    whenNotMatched insert|discard|fail. Returns the full post-merge
    collection content, which is written through ``collection_sink``."""
    if collection_sink is None:
        raise ValueError("$merge requires a collection sink (writable store)")
    into = spec["into"] if isinstance(spec, dict) else spec
    if isinstance(into, dict):
        into = into["coll"]
    on = (spec.get("on", "_id") if isinstance(spec, dict) else "_id")
    on_fields = [on] if isinstance(on, str) else list(on)
    when_matched = spec.get("whenMatched", "merge") if isinstance(spec, dict) else "merge"
    when_not = spec.get("whenNotMatched", "insert") if isinstance(spec, dict) else "insert"
    if when_matched not in ("replace", "keepExisting", "merge", "fail"):
        raise ValueError(f"$merge: unsupported whenMatched {when_matched!r}")
    if when_not not in ("insert", "discard", "fail"):
        raise ValueError(f"$merge: unsupported whenNotMatched {when_not!r}")
    try:
        existing = [dict(d) for d in collections(into)] if collections else []
    except KeyError:
        existing = []
    def key_of(d):
        return tuple(_canon_key(get_path(d, f)) for f in on_fields)
    index: dict = {}
    dup_keys: set = set()
    for i, d in enumerate(existing):
        k = key_of(d)
        if k in index:
            # mongod requires the on-fields to be backed by a unique
            # index, which prevents this state server-side; a store built
            # without one only fails when an incoming document actually
            # matches multiple targets (ambiguous merge), not eagerly
            dup_keys.add(k)
        index[k] = i
    for doc in stream:
        if _META_KEY in doc:
            doc = {k: v for k, v in doc.items() if k != _META_KEY}
        k = key_of(doc)
        if k in dup_keys:
            raise ValueError(
                "$merge: on fields must uniquely identify documents "
                f"(incoming document matches duplicate key {k!r} "
                "in target collection)")
        i = index.get(k)
        if i is None:
            if when_not == "insert":
                index[k] = len(existing)
                existing.append(dict(doc))
            elif when_not == "fail":
                raise ValueError("$merge: no match for document (whenNotMatched: fail)")
        else:
            if when_matched == "replace":
                existing[i] = dict(doc)
            elif when_matched == "merge":
                merged = dict(existing[i])
                merged.update(doc)
                existing[i] = merged
            elif when_matched == "fail":
                raise ValueError("$merge: matched existing document (whenMatched: fail)")
            # keepExisting: no-op
    collection_sink(into, existing)
    return existing




def _geo_near(docs, spec):
    """``$geoNear``: distance-sorted proximity search (must be stage 1).

    Unit semantics follow mongod (docs.mongodb.com/manual/reference/
    operator/aggregation/geoNear): GeoJSON ``near`` → spherical meters;
    legacy ``near`` + ``spherical: true`` → radians; legacy planar →
    coordinate units. ``minDistance``/``maxDistance`` are in those same
    units; ``distanceMultiplier`` scales only the reported distance.
    ``key`` names the location field; when omitted we use the unique
    point-shaped top-level field (the interpreter's stand-in for "the
    only geospatial index"). The reference ships this stage to mongod
    verbatim (/root/reference/src/mongo_table_function.cpp:326-366).
    """
    import math
    near = _parse_point(spec["near"])
    if near is None:
        raise ValueError("$geoNear: 'near' must be a GeoJSON Point or [x, y]")
    nx, ny, near_geojson = near
    dist_field = spec.get("distanceField")
    if not dist_field:
        raise ValueError("$geoNear requires 'distanceField'")
    spherical = bool(spec.get("spherical", False)) or near_geojson
    multiplier = float(spec.get("distanceMultiplier", 1.0))
    min_d = spec.get("minDistance")
    max_d = spec.get("maxDistance")
    query = spec.get("query")
    include_locs = spec.get("includeLocs")
    key = spec.get("key")
    materialized = list(docs)
    if key is None:
        candidates = set()
        for d in materialized:
            for k, v in d.items():
                if _parse_point(v) is not None:
                    candidates.add(k)
        if len(candidates) != 1:
            raise ValueError(
                "$geoNear: ambiguous location field — pass 'key' "
                f"(point-shaped fields: {sorted(candidates)})")
        key = candidates.pop()
    out = []
    for d in materialized:
        loc_raw = get_path(d, key)
        pt = None if loc_raw is MISSING else _parse_point(loc_raw)
        if pt is None:
            continue  # documents without an indexable location are not returned
        if query is not None and not matches_filter(d, query):
            continue
        x, y, _ = pt
        if spherical:
            rad = _haversine_rad(nx, ny, x, y)
            dist = rad * _EARTH_RADIUS_M if near_geojson else rad
        else:
            dist = math.hypot(x - nx, y - ny)
        if min_d is not None and dist < min_d:
            continue
        if max_d is not None and dist > max_d:
            continue
        nd = dict(d)
        _set_path(nd, dist_field, dist * multiplier)
        if include_locs:
            _set_path(nd, include_locs, loc_raw)
        meta = dict(nd.get(_META_KEY) or {})
        meta["geoNearDistance"] = dist * multiplier
        meta["geoNearPoint"] = loc_raw
        nd[_META_KEY] = meta
        out.append((dist, nd))
    out.sort(key=lambda t: t[0])
    return [d for _, d in out]


def parse_vector_search_spec(spec) -> tuple[str, list[float], int, str, dict | None]:
    """Validate a ``$vectorSearch`` spec and return
    ``(path, query_vector, limit, similarity, filter)``. Shared by the
    single-stream interpreter below and the distributed routed path
    (``frame.MongoFrame._try_routed_pipeline``) so both enforce identical
    argument semantics."""
    path = spec["path"]
    qv = [float(x) for x in spec["queryVector"]]
    limit = int(spec["limit"])
    exact = bool(spec.get("exact", False))
    num_candidates = spec.get("numCandidates")
    if exact and num_candidates is not None:
        raise ValueError("$vectorSearch: numCandidates not allowed with exact: true")
    if not exact:
        if num_candidates is None:
            raise ValueError("$vectorSearch: numCandidates required unless exact: true")
        if int(num_candidates) < limit:
            raise ValueError("$vectorSearch: numCandidates must be >= limit")
    similarity = spec.get("similarity", "cosine")
    if similarity not in ("cosine", "dotProduct", "euclidean"):
        raise ValueError(f"$vectorSearch: unsupported similarity {similarity!r}")
    return path, qv, limit, similarity, spec.get("filter")


def _vector_search(docs, spec):
    """``$vectorSearch`` (Atlas Vector Search): top-``limit`` documents by
    vector similarity over ``path`` (must be stage 1).

    Scores follow the published Atlas formulas: cosine/dotProduct →
    ``(1 + sim) / 2``, euclidean → ``1 / (1 + d)``; read them downstream
    via ``{$meta: "vectorSearchScore"}``. The similarity function lives
    in the index definition server-side, so the interpreter takes an
    optional ``similarity`` field (default ``cosine``) — a documented
    extension. ``filter`` is a pre-filter ($match semantics). This is
    the exact-scan semantics oracle; the distributed ANN path is
    ``ops/similarity.py`` (lsh_topk / pq_topk / ivf_pq_topk).
    """
    import math
    path, qv, limit, similarity, vfilter = parse_vector_search_spec(spec)
    scored = []
    for d in docs:
        if vfilter is not None and not matches_filter(d, vfilter):
            continue
        vec = get_path(d, path)
        if (vec is MISSING or not isinstance(vec, (list, tuple))
                or len(vec) != len(qv)):
            continue  # unindexable value: not a candidate
        try:
            v = [float(x) for x in vec]
        except (TypeError, ValueError):
            continue
        dot = sum(a * b for a, b in zip(qv, v))
        if similarity == "cosine":
            na = math.sqrt(sum(a * a for a in qv))
            nb = math.sqrt(sum(b * b for b in v))
            sim = dot / (na * nb) if na and nb else 0.0
            score = (1.0 + sim) / 2.0
        elif similarity == "dotProduct":
            score = (1.0 + dot) / 2.0
        else:
            dist = math.sqrt(sum((a - b) ** 2 for a, b in zip(qv, v)))
            score = 1.0 / (1.0 + dist)
        nd = dict(d)
        meta = dict(nd.get(_META_KEY) or {})
        meta["vectorSearchScore"] = score
        nd[_META_KEY] = meta
        scored.append((score, nd))
    scored.sort(key=lambda t: -t[0])
    return [d for _, d in scored[:limit]]


def run_pipeline(docs, pipeline, seed: int | None = None, collections=None,
                 collection_sink=None):
    """Run an aggregation pipeline over an iterable of dict documents.

    Returns a list of result documents. ``seed`` makes ``$sample``
    deterministic (used by schema inference). ``collections`` resolves
    a collection name to an iterable of documents for ``$lookup``
    (same-database lookups, as in mongod). ``collection_sink(name,
    docs)`` — when provided — gives ``$out``/``$merge`` a writable
    store; like mongod, both must be the LAST stage and the pipeline
    then returns no documents.
    """
    stream = iter(docs)
    for stage_idx, stage in enumerate(pipeline):
        (op, spec), = stage.items()
        if op in ("$out", "$merge") and stage_idx != len(pipeline) - 1:
            raise ValueError(f"{op} must be the last pipeline stage")
        if op in ("$geoNear", "$vectorSearch", "$search", "$searchMeta") and any(
                next(iter(s)) != "$match" for s in pipeline[:stage_idx]):
            # mongod requires these index-backed stages first; the engine
            # prepends an internal sentinel-excluding $match (scan.py,
            # datasource._result_docs), and a leading $match is equivalent
            # to merging it into query/filter — so only $match may precede
            raise ValueError(f"{op} must be the first pipeline stage")
        if op == "$match":
            def _match(ds, sp=spec):
                for d in ds:
                    if matches_filter(d, sp):
                        yield d
            stream = _match(stream)
        elif op == "$project":
            stream = _project(stream, spec)
        elif op == "$addFields" or op == "$set":
            def _add(ds, sp=spec):
                for d in ds:
                    out = dict(d)
                    for k, v in sp.items():
                        out[k] = eval_expr(v, d)
                    yield out
            stream = _add(stream)
        elif op == "$group":
            stream = _group(stream, spec)
        elif op == "$sort":
            materialized = list(stream)
            for field, direction in reversed(list(spec.items())):
                materialized.sort(
                    key=lambda d, f=field: _sort_key(d, f),
                    reverse=(direction == -1),
                )
            stream = iter(materialized)
        elif op == "$skip":
            def _skip(ds, n=int(spec)):
                for i, d in enumerate(ds):
                    if i >= n:
                        yield d
            stream = _skip(stream)
        elif op == "$limit":
            def _limit(ds, n=int(spec)):
                for i, d in enumerate(ds):
                    if i >= n:
                        return
                    yield d
            stream = _limit(stream)
        elif op == "$count":
            n = sum(1 for _ in stream)
            # mongod emits NO document when input is empty; the engine's
            # COUNT fast path turns that into a single 0 row
            # (reference: src/mongo_table_function.cpp:669-683).
            stream = iter([{spec: n}] if n > 0 else [])
        elif op == "$sample":
            size = spec["size"]
            materialized = list(stream)
            rng = random.Random(seed if seed is not None else spec.get("seed"))
            if size >= len(materialized):
                stream = iter(materialized)
            else:
                idx = sorted(rng.sample(range(len(materialized)), size))
                stream = iter([materialized[i] for i in idx])
        elif op == "$unwind":
            stream = _unwind(stream, spec)
        elif op == "$lookup":
            stream = _lookup(stream, spec, collections, seed)
        elif op in ("$replaceRoot", "$replaceWith"):
            expr = spec["newRoot"] if op == "$replaceRoot" else spec
            def _replace(ds, e=expr):
                for d in ds:
                    nr = eval_expr(e, d)
                    if not isinstance(nr, dict):
                        raise ValueError(
                            f"$replaceRoot newRoot must resolve to a document, got {type(nr).__name__}"
                        )
                    yield dict(nr)
            stream = _replace(stream)
        elif op == "$facet":
            materialized = list(stream)
            facet_doc = {
                name: run_pipeline(materialized, sub, seed=seed, collections=collections)
                for name, sub in spec.items()
            }
            stream = iter([facet_doc])
        elif op == "$bucket":
            import bisect

            boundaries = spec["boundaries"]
            if sorted(boundaries, key=_OrderedVal) != list(boundaries) or len(boundaries) < 2:
                raise ValueError("$bucket boundaries must be ascending, length >= 2")
            has_default = "default" in spec
            binned = []
            for d in stream:
                v = eval_expr(spec["groupBy"], d)
                # bin i covers [boundaries[i], boundaries[i+1])
                i = (
                    bisect.bisect_right(boundaries, _OrderedVal(v), key=_OrderedVal) - 1
                    if v is not None
                    else -1
                )
                if i < 0 or i >= len(boundaries) - 1:
                    if not has_default:
                        raise ValueError(
                            f"$bucket value {v!r} outside boundaries and no default given"
                        )
                    bucket_id = spec["default"]
                else:
                    bucket_id = boundaries[i]
                binned.append({**d, "__bucket": bucket_id})
            out_spec = spec.get("output") or {"count": {"$sum": 1}}
            grouped = _group(binned, {"_id": "$__bucket", **out_spec})
            stream = iter(sorted(grouped, key=lambda g: _OrderedVal(g["_id"])))
        elif op == "$sortByCount":
            grouped = _group(stream, {"_id": spec, "count": {"$sum": 1}})
            materialized = sorted(
                grouped,
                key=lambda d: (-d["count"], _OrderedVal(d["_id"])),
                # count desc; _id asc tie-break is OUR determinism
                # extension (mongod leaves ties unspecified)
            )
            stream = iter(materialized)
        elif op == "$unset":
            fields = [spec] if isinstance(spec, str) else list(spec)

            def _unset(ds, fs=tuple(fields)):
                for d in ds:
                    out = dict(d)
                    for f in fs:
                        _del_path(out, f)
                    yield out
            stream = _unset(stream)
        elif op == "$unionWith":
            if isinstance(spec, str):
                cname, sub = spec, []
            else:
                cname, sub = spec["coll"], spec.get("pipeline", [])
            if collections is None:
                raise ValueError(
                    "$unionWith needs a collections resolver (run_pipeline("
                    "..., collections=...)); backend aggregate() wires this"
                )
            extra = run_pipeline(
                list(collections(cname)), sub, seed=seed, collections=collections
            )

            def _union(ds, ex=extra):
                yield from ds
                yield from ex
            stream = _union(stream)
        elif op == "$bucketAuto":
            n_buckets = int(spec["buckets"])
            if n_buckets < 1:
                raise ValueError("$bucketAuto buckets must be >= 1")
            if spec.get("granularity"):
                raise ValueError("$bucketAuto granularity series not supported")
            # null/missing groupBy values are KEPT: BSON sort order ranks
            # null lowest (_OrderedVal), so they sort first and land in
            # bucket 0 with min=null — mongod includes them in the first
            # bucket rather than dropping them
            pairs = [(eval_expr(spec["groupBy"], d), d) for d in stream]
            keyed = sorted(pairs, key=lambda p: _OrderedVal(p[0]))
            # even split into <= n buckets; adjacent equal groupBy values
            # never straddle a boundary (documents with equal keys land in
            # one bucket, per the documented $bucketAuto behavior)
            n = len(keyed)
            binned = []
            if n:
                per = n / min(n_buckets, n)
                bucket_of_idx = [min(int(i / per), min(n_buckets, n) - 1) for i in range(n)]
                for i in range(1, n):
                    if values_equal(keyed[i][0], keyed[i - 1][0]):
                        bucket_of_idx[i] = bucket_of_idx[i - 1]
                # bucket bounds: min inclusive, max = next bucket's min
                # (last bucket's max inclusive = max value), per mongod docs
                mins: dict[int, object] = {}
                for i, b in enumerate(bucket_of_idx):
                    if b not in mins:
                        mins[b] = keyed[i][0]
                order = sorted(mins)
                maxs = {
                    b: (mins[order[j + 1]] if j + 1 < len(order) else keyed[-1][0])
                    for j, b in enumerate(order)
                }
                for i, b in enumerate(bucket_of_idx):
                    binned.append({
                        **keyed[i][1],
                        "__bucket": {"min": mins[b], "max": maxs[b]},
                    })
            out_spec = spec.get("output") or {"count": {"$sum": 1}}
            grouped = _group(binned, {"_id": "$__bucket", **out_spec})
            stream = iter(sorted(grouped, key=lambda g: _OrderedVal(g["_id"]["min"])))
        elif op == "$setWindowFields":
            stream = iter(_set_window_fields(list(stream), spec))
        elif op == "$densify":
            stream = iter(_densify(stream, spec))
        elif op == "$fill":
            stream = iter(_fill(stream, spec))
        elif op == "$graphLookup":
            stream = iter(_graph_lookup(list(stream), spec, collections))
        elif op == "$geoNear":
            stream = iter(_geo_near(stream, spec))
        elif op == "$vectorSearch":
            stream = iter(_vector_search(stream, spec))
        elif op == "$search":
            from duckdb_mongo_spark.mql.search import search_stage
            stream = iter(search_stage(stream, spec, _META_KEY))
        elif op == "$searchMeta":
            from duckdb_mongo_spark.mql.search import facet_meta, search_stage
            body = dict(spec)
            body.pop("index", None)
            idx_payload = body.pop("__indexDefinition__", None)
            if set(body) == {"facet"}:
                stream = iter([facet_meta(stream, body["facet"], _META_KEY,
                                          index_payload=idx_payload)])
            else:
                hits = search_stage(stream, spec, _META_KEY)
                stream = iter([{"count": {"total": len(hits)}}])
        elif op == "$redact":
            def _redact(ds, sp=spec):
                for d in ds:
                    r = _redact_doc(d, sp)
                    if r is not None:
                        yield r
            stream = _redact(stream)
        elif op == "$out":
            if collection_sink is None:
                raise ValueError("$out requires a collection sink (writable store)")
            target = spec if isinstance(spec, str) else spec["coll"]
            collection_sink(
                target,
                [{k: v for k, v in d.items() if k != _META_KEY} for d in stream],
            )
            stream = iter(())  # $out returns no documents
        elif op == "$merge":
            _merge_stage(stream, spec, collections, collection_sink)
            stream = iter(())  # $merge returns no documents
        else:
            raise ValueError(f"unsupported pipeline stage: {op}")
    result = list(stream)
    # metadata ($geoNear distance, $vectorSearch score) is not part of the
    # document in mongod — strip the hidden slot from whatever survives
    for d in result:
        if isinstance(d, dict) and _META_KEY in d:
            d.pop(_META_KEY)
    return result
