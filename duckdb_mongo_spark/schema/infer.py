"""Three-tier schema resolution + sampling-based inference.

Semantics (SURVEY.md §1.3; reference src/mongo_schema_inference.cpp — not
ported):

1. user-provided ``columns`` parameter
2. ``__schema`` document in the collection (``_id: "__schema"``)
3. automatic inference over a ``$sample`` of ``sample_size`` docs (default
   100), with: MAX_DEPTH=5 flattening (``_``-joined names, true dotted
   path retained), nested docs yielding both child columns and a parent
   JSON VARCHAR column, type-conflict voting, case-insensitive column
   dedup (first-seen name wins, types merged), ``_id`` always present and
   first, and a one-document ObjectId probe for filter-pushdown coercion.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field
from decimal import Decimal

from duckdb_mongo_spark.bsonlike import ObjectId, bson_type_name, is_midnight_utc
from duckdb_mongo_spark.errors import BinderError
from duckdb_mongo_spark.schema.types import (
    LIST,
    STRUCT,
    is_list,
    is_struct,
    list_depth,
    parse_type_name,
)

MAX_DEPTH = 5
ARRAY_STRUCT_MERGE_ELEMENTS = 10
DEFAULT_SAMPLE_SIZE = 100
SCHEMA_DOC_ID = "__schema"


@dataclass
class FieldSpec:
    name: str                 # flattened column name (underscore-joined)
    type: object              # type AST (schema.types)
    mongo_path: str           # true dotted path in the document
    user_declared: bool = False


@dataclass
class CollectionSchema:
    fields: list[FieldSpec] = field(default_factory=list)
    objectid_columns: set[str] = field(default_factory=set)
    source: str = "inferred"  # inferred | columns | __schema

    def field_map(self) -> dict[str, FieldSpec]:
        return {f.name: f for f in self.fields}

    def names(self) -> list[str]:
        return [f.name for f in self.fields]


# ---------------------------------------------------------------------------
# per-value type inference


def infer_value_type(v, depth: int = 1):
    """Type AST for one value, or None for null/missing (refined later)."""
    t = bson_type_name(v)
    if t == "null":
        return None
    if t == "string" or t == "objectid":
        return "VARCHAR"
    if t == "bool":
        return "BOOLEAN"
    if t == "int64":
        return "BIGINT"
    if t in ("double", "decimal128"):
        return "DOUBLE"
    if t == "date":
        return "DATE" if is_midnight_utc(v) else "TIMESTAMP"
    if t == "binary":
        return "BLOB"
    if t == "document":
        return "VARCHAR"  # JSON rendering (depth handling done by caller)
    if t == "array":
        return _infer_array_type(v, depth)
    return "VARCHAR"


def _infer_array_type(arr: list, depth: int):
    if not arr:
        return LIST("VARCHAR")
    kinds = {bson_type_name(el) for el in arr}
    if "array" in kinds:
        if depth >= MAX_DEPTH:
            return LIST("VARCHAR")
        elem_types = [
            _infer_array_type(el, depth + 1)
            for el in arr
            if isinstance(el, list)
        ]
        return LIST(_vote(elem_types))
    if "document" in kinds:
        # merge struct fields across the first N elements; nested docs
        # inside array elements render as JSON VARCHAR (SURVEY §1.2)
        merged: dict[str, list] = {}
        order: list[str] = []
        for el in arr[:ARRAY_STRUCT_MERGE_ELEMENTS]:
            if not isinstance(el, dict):
                continue
            for k, v in el.items():
                if isinstance(v, dict):
                    ft = "VARCHAR"
                elif isinstance(v, list):
                    ft = _infer_array_type(v, depth + 1)
                else:
                    ft = infer_value_type(v, depth + 1)
                if k not in merged:
                    merged[k] = []
                    order.append(k)
                if ft is not None:
                    merged[k].append(ft)
        fields = [(k, _vote(merged[k]) if merged[k] else "VARCHAR") for k in order]
        return LIST(STRUCT(fields))
    elem_types = [infer_value_type(el, depth + 1) for el in arr]
    return LIST(_vote([t for t in elem_types if t is not None]))


# ---------------------------------------------------------------------------
# type-conflict voting (reference ResolveTypeConflict, inference.cpp:63-226)


def _merge_structs(structs: list):
    merged: dict[str, list] = {}
    order: list[str] = []
    for s in structs:
        for name, ft in s[1]:
            if name not in merged:
                merged[name] = []
                order.append(name)
            merged[name].append(ft)
    return STRUCT([(n, _vote(merged[n])) for n in order])


def _vote(types: list):
    """Resolve conflicting observed types for one column."""
    types = [t for t in types if t is not None]
    if not types:
        return "VARCHAR"
    first = types[0]
    if all(t == first for t in types):
        return first
    lists = [t for t in types if is_list(t)]
    if lists:
        max_d = max(list_depth(t) for t in lists)
        deepest = [t for t in lists if list_depth(t) == max_d]
        # element voting at each level; struct elements merge fields
        def elem_at(t, level):
            for _ in range(level):
                t = t[1]
            return t
        elems = [elem_at(t, max_d) for t in deepest]
        structs = [e for e in elems if is_struct(e)]
        if structs:
            core = _merge_structs(structs)
        else:
            core = _vote(elems)
        out = core
        for _ in range(max_d):
            out = LIST(out)
        return out
    n = len(types)
    counts: dict[str, int] = {}
    for t in types:
        counts[t] = counts.get(t, 0) + 1
    temporal = counts.get("DATE", 0) + counts.get("TIMESTAMP", 0)
    if counts.get("VARCHAR", 0) / n > 0.7:
        return "VARCHAR"
    if counts.get("DOUBLE", 0) / n >= 0.3:
        return "DOUBLE"
    if counts.get("BIGINT", 0) / n >= 0.3:
        return "BIGINT"
    if counts.get("BOOLEAN", 0) / n >= 0.7:
        return "BOOLEAN"
    if temporal / n >= 0.7:
        return "DATE" if counts.get("TIMESTAMP", 0) == 0 else "TIMESTAMP"
    for t in ("DOUBLE", "BIGINT", "BOOLEAN"):
        if counts.get(t, 0):
            return t
    if temporal:
        return "DATE" if counts.get("TIMESTAMP", 0) == 0 else "TIMESTAMP"
    if counts.get("BLOB", 0):
        return "BLOB"
    return "VARCHAR"


# ---------------------------------------------------------------------------
# field-path collection (reference CollectFieldPaths, inference.cpp:228-308)


def _collect_paths(doc: dict, out: dict, order: list, prefix_name="", prefix_path="", depth=1):
    for key, value in doc.items():
        name = f"{prefix_name}_{key}" if prefix_name else key
        path = f"{prefix_path}.{key}" if prefix_path else key
        if isinstance(value, dict):
            # parent JSON VARCHAR column always recorded
            _record(out, order, name, path, "VARCHAR")
            if depth < MAX_DEPTH:
                _collect_paths(value, out, order, name, path, depth + 1)
            # at MAX_DEPTH the parent column already captures the JSON
        else:
            t = infer_value_type(value, depth)
            _record(out, order, name, path, t)


def _record(out: dict, order: list, name: str, path: str, t):
    lower = name.lower()
    if lower not in out:
        out[lower] = {"name": name, "path": path, "types": []}
        order.append(lower)
    if t is not None:
        out[lower]["types"].append(t)


def infer_schema_from_docs(
    docs: list[dict], force_id: bool = True, source: str = "inferred"
) -> CollectionSchema:
    """Sample-vote inference over an in-hand document list.

    ``force_id=False`` skips the _id-always-first rule — used for
    pipeline-output schemas, where stages like ``$count`` legitimately
    emit documents without ``_id`` and a phantom always-NULL column
    would be wrong."""
    docs = [d for d in docs if d.get("_id") != SCHEMA_DOC_ID]
    out: dict = {}
    order: list = []
    for doc in docs:
        _collect_paths(doc, out, order)
    fields: list[FieldSpec] = []
    for lower in order:
        info = out[lower]
        fields.append(FieldSpec(info["name"], _vote(info["types"]), info["path"]))
    if force_id:
        # _id always present and always first (inference.cpp:530-551)
        fields = _put_id_first(fields)
    elif any(f.name.lower() == "_id" for f in fields):
        fields = _put_id_first(fields)
    oid_cols = _objectid_probe(docs, fields)
    return CollectionSchema(fields=fields, objectid_columns=oid_cols, source=source)


def infer_schema(
    backend, db: str, coll: str, sample_size: int = DEFAULT_SAMPLE_SIZE, seed: int = 42
) -> CollectionSchema:
    docs = backend.sample(db, coll, sample_size, seed=seed)
    return infer_schema_from_docs(docs)


def _put_id_first(fields: list[FieldSpec]) -> list[FieldSpec]:
    id_field = next((f for f in fields if f.name.lower() == "_id"), None)
    if id_field is None:
        id_field = FieldSpec("_id", "VARCHAR", "_id")
    rest = [f for f in fields if f.name.lower() != "_id"]
    return [id_field] + rest


def _objectid_probe(docs: list[dict], fields: list[FieldSpec]) -> set[str]:
    """Record which columns hold true BSON ObjectIds (one-doc probe in the
    reference, inference.cpp:585-608; we check the sample's first doc per
    field for robustness with the same contract)."""
    from duckdb_mongo_spark.mql.match import MISSING, get_path

    oid: set[str] = set()
    for f in fields:
        for doc in docs:
            v = get_path(doc, f.mongo_path)
            if v is MISSING or v is None:
                continue
            if isinstance(v, ObjectId):
                oid.add(f.name)
            break
    return oid


# ---------------------------------------------------------------------------
# tier 1: user-provided columns param; tier 2: __schema document


def schema_from_columns_param(columns: dict) -> CollectionSchema:
    """``columns := {name: 'TYPE'}`` or ``{name: {'type': 'T', 'path': 'a.b'}}``."""
    fields: list[FieldSpec] = []
    for name, spec in columns.items():
        if isinstance(spec, str):
            fields.append(FieldSpec(name, parse_type_name(spec), name, user_declared=True))
        elif isinstance(spec, dict):
            if "type" not in spec:
                raise BinderError(f"columns entry {name!r} missing 'type'")
            path = spec.get("path", name)
            fields.append(
                FieldSpec(name, parse_type_name(spec["type"]), path, user_declared=True)
            )
        else:
            raise BinderError(f"bad columns entry for {name!r}: {spec!r}")
    return CollectionSchema(fields=_put_id_first(fields), source="columns")


def schema_from_schema_doc(doc: dict) -> CollectionSchema | None:
    """Parse a ``__schema`` document (simple / nested / path-mapping formats,
    Atlas-SQL compatible; reference inference.cpp:318-401)."""
    body = doc.get("schema") if isinstance(doc.get("schema"), dict) else None
    if body is None:
        body = {k: v for k, v in doc.items() if k != "_id"}
    if not body:
        return None
    fields: list[FieldSpec] = []
    for name, spec in body.items():
        if isinstance(spec, str):
            fields.append(FieldSpec(name, parse_type_name(spec), name, user_declared=True))
        elif isinstance(spec, dict) and "type" in spec:
            fields.append(
                FieldSpec(
                    name, parse_type_name(spec["type"]), spec.get("path", name),
                    user_declared=True,
                )
            )
        else:
            raise BinderError(f"bad __schema entry for {name!r}: {spec!r}")
    return CollectionSchema(fields=_put_id_first(fields), source="__schema")


def resolve_schema(
    backend,
    db: str,
    coll: str,
    columns: dict | None = None,
    sample_size: int = DEFAULT_SAMPLE_SIZE,
    seed: int = 42,
) -> CollectionSchema:
    """Three-tier resolution (mongo_table_function.cpp:134-161)."""
    if columns:
        schema = schema_from_columns_param(columns)
    else:
        schema_doc = backend.find_schema_doc(db, coll)
        schema = schema_from_schema_doc(schema_doc) if schema_doc else None
        if schema is None:
            return infer_schema(backend, db, coll, sample_size=sample_size, seed=seed)
    # probe ObjectId columns for declared schemas too (filter coercion)
    sample = [
        d for d in backend.sample(db, coll, 10, seed=seed)
        if d.get("_id") != SCHEMA_DOC_ID
    ]
    schema.objectid_columns = _objectid_probe(sample, schema.fields)
    return schema
