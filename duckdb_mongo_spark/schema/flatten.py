"""Document → row conversion with schema enforcement.

Per SURVEY.md §1.4-1.5 (reference FlattenDocument,
src/mongo_schema_inference.cpp:685-1213 — semantics only, no code):

- dotted-path navigation with underscore-path fallback
- numeric widening (int → DOUBLE ok; Decimal128 → DOUBLE)
- nested docs render as JSON when the target column is VARCHAR
- arrays shallower than the declared LIST depth are wrapped
- enforcement (explicit schemas only): PERMISSIVE nulls the field,
  DROPMALFORMED drops the row, FAILFAST raises with the offending _id
"""

from __future__ import annotations

import datetime as _dt
import enum
import json
from decimal import Decimal

from duckdb_mongo_spark.bsonlike import ObjectId, bson_type_name, to_utc_naive
from duckdb_mongo_spark.errors import SchemaEnforcementError
from duckdb_mongo_spark.mql.match import MISSING, get_path
from duckdb_mongo_spark.schema.types import is_list, is_struct, list_depth


class SchemaMode(enum.Enum):
    PERMISSIVE = "PERMISSIVE"
    DROPMALFORMED = "DROPMALFORMED"
    FAILFAST = "FAILFAST"

    @classmethod
    def parse(cls, s) -> "SchemaMode":
        if isinstance(s, SchemaMode):
            return s
        return cls[str(s).upper()]


_DROPPED = object()


def _json_default(v):
    if isinstance(v, ObjectId):
        return str(v)
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def render_json(v) -> str:
    return json.dumps(v, default=_json_default, separators=(", ", ": "))


# compatibility matrix (reference IsBSONTypeCompatible, helpers.cpp:567-603)
_COMPAT = {
    "VARCHAR": {"string", "objectid", "document", "null", "array"},
    "BIGINT": {"int64", "null"},
    "HUGEINT": {"int64", "null"},
    "DOUBLE": {"int64", "double", "decimal128", "null"},
    "BOOLEAN": {"bool", "null"},
    "DATE": {"date", "null"},
    "TIMESTAMP": {"date", "null"},
    "BLOB": {"binary", "null"},
}


def _compatible(target, value) -> bool:
    t = bson_type_name(value)
    if is_list(target):
        return t in ("array", "null")
    if is_struct(target):
        return t in ("document", "null")
    allowed = _COMPAT.get(target, {"null"})
    if target == "VARCHAR":
        # strings absorb most scalar renderings except containers
        return t in allowed or t in ("bool",) or t in ("date",) or t in ("int64", "double", "decimal128")
    return t in allowed


def _wrap_to_depth(arr, expected_depth: int):
    """Wrap a shallower array to the declared LIST depth by wrapping each
    ELEMENT (not the whole array) depth_diff times — reference
    BSONArrayToList, helpers.cpp:374-460: ``[[1,2],[3,4]]`` at expected
    depth 3 becomes ``[[[1,2]],[[3,4]]]``, preserving the outer row
    structure (README.md "Mixed Array Depths")."""
    def actual_depth(v):
        d = 0
        while isinstance(v, list):
            d += 1
            v = v[0] if v else None
        return d

    diff = expected_depth - actual_depth(arr)
    if diff <= 0:
        return arr

    def wrap_elem(el, times):
        for _ in range(times):
            el = [el]
        return el

    return [wrap_elem(el, diff) for el in arr]


def convert_value(value, target):
    """Convert one document value to the target logical type.

    Returns the converted Python value (Spark-compatible), or raises
    ValueError when genuinely inconvertible (caller applies the mode).
    """
    if value is None or value is MISSING:
        return None
    t = bson_type_name(value)
    if is_list(target):
        if t != "array":
            raise ValueError(f"expected array, got {t}")
        value = _wrap_to_depth(value, list_depth(target))
        elem_t = target[1]
        return [None if el is None else convert_value(el, elem_t) for el in value]
    if is_struct(target):
        if t != "document":
            raise ValueError(f"expected document, got {t}")
        return {
            name: (
                None
                if (got := value.get(name)) is None
                else _lenient(got, ft)
            )
            for name, ft in target[1]
        }
    if target == "VARCHAR":
        if t == "document":
            return render_json(value)
        if t == "array":
            return render_json(value)
        if t == "objectid":
            return str(value)
        if t == "string":
            return value
        if t == "bool":
            return "true" if value else "false"
        if t == "date":
            return value.isoformat()
        if t == "binary":
            return bytes(value).hex()
        return str(value)
    if target == "BIGINT" or target == "HUGEINT":
        if t == "int64":
            out = int(value)
        elif t in ("double", "decimal128") and float(value) == int(float(value)):
            out = int(float(value))
        else:
            raise ValueError(f"cannot convert {t} to BIGINT")
        # HUGEINT surfaces as Decimal(38,0): Spark's non-Arrow row path
        # requires decimal.Decimal for DecimalType (Arrow accepts int too)
        return Decimal(out) if target == "HUGEINT" else out
    if target == "DOUBLE":
        if t in ("int64", "double"):
            return float(value)
        if t == "decimal128":
            # reference parses Decimal128 via string → double (accepting
            # precision loss), inference.cpp:1076-1148
            return float(str(value))
        raise ValueError(f"cannot convert {t} to DOUBLE")
    if target == "BOOLEAN":
        if t == "bool":
            return bool(value)
        raise ValueError(f"cannot convert {t} to BOOLEAN")
    if target == "DATE":
        if isinstance(value, _dt.datetime):
            return to_utc_naive(value).date()
        if isinstance(value, _dt.date):
            return value
        raise ValueError(f"cannot convert {t} to DATE")
    if target == "TIMESTAMP":
        if isinstance(value, _dt.datetime):
            return to_utc_naive(value)
        if isinstance(value, _dt.date):
            return _dt.datetime(value.year, value.month, value.day)
        raise ValueError(f"cannot convert {t} to TIMESTAMP")
    if target == "BLOB":
        if t == "binary":
            return bytes(value)
        raise ValueError(f"cannot convert {t} to BLOB")
    raise ValueError(f"unknown target type {target!r}")


def _lenient(value, target):
    try:
        return convert_value(value, target)
    except ValueError:
        return None


def lookup_field(doc: dict, mongo_path: str, flat_name: str):
    """Dotted-path navigation with underscore-name fallback
    (inference.cpp:729-816)."""
    v = get_path(doc, mongo_path)
    if v is not MISSING:
        return v
    if flat_name in doc:
        return doc[flat_name]
    return MISSING


def flatten_document(doc: dict, schema, mode: SchemaMode = SchemaMode.PERMISSIVE):
    """Convert one document into a row list ordered per schema.fields.

    Returns the row, or None when DROPMALFORMED drops it; raises
    SchemaEnforcementError under FAILFAST. Enforcement applies only to
    user-declared fields (explicit schemas), matching the reference.
    """
    row = []
    enforced = any(f.user_declared for f in schema.fields)
    for f in schema.fields:
        v = lookup_field(doc, f.mongo_path, f.name)
        if v is MISSING or v is None:
            row.append(None)
            continue
        if enforced and f.user_declared and not _compatible(f.type, v):
            if mode is SchemaMode.FAILFAST:
                raise SchemaEnforcementError(
                    doc.get("_id"), f.name, f.type, bson_type_name(v)
                )
            if mode is SchemaMode.DROPMALFORMED:
                return None
            row.append(None)
            continue
        try:
            row.append(convert_value(v, f.type))
        except ValueError:
            if enforced and f.user_declared:
                if mode is SchemaMode.FAILFAST:
                    raise SchemaEnforcementError(
                        doc.get("_id"), f.name, f.type, bson_type_name(v)
                    )
                if mode is SchemaMode.DROPMALFORMED:
                    return None
            row.append(None)
    return row
