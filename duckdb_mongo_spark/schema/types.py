"""Engine logical types and their Spark equivalents.

Type AST: scalar types are strings ("VARCHAR", "BIGINT", "DOUBLE",
"BOOLEAN", "DATE", "TIMESTAMP", "BLOB", "HUGEINT"); containers are tuples
("LIST", elem) and ("STRUCT", ((name, type), ...)).

Mapping table per SURVEY.md §1.2 (reference:
src/include/.../mongo_schema_inference_internal.hpp:15-62).
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

from duckdb_mongo_spark.errors import BinderError

SCALARS = {"VARCHAR", "BIGINT", "DOUBLE", "BOOLEAN", "DATE", "TIMESTAMP", "BLOB", "HUGEINT"}

_ALIASES = {
    "STRING": "VARCHAR", "TEXT": "VARCHAR", "CHAR": "VARCHAR",
    "INT": "BIGINT", "INTEGER": "BIGINT", "INT64": "BIGINT", "LONG": "BIGINT",
    "INT32": "BIGINT", "SMALLINT": "BIGINT", "TINYINT": "BIGINT",
    "FLOAT": "DOUBLE", "REAL": "DOUBLE", "DECIMAL": "DOUBLE", "NUMERIC": "DOUBLE",
    "BOOL": "BOOLEAN",
    "DATETIME": "TIMESTAMP",
    "BYTEA": "BLOB", "BINARY": "BLOB",
}


def LIST(elem):
    return ("LIST", elem)


def STRUCT(fields):
    return ("STRUCT", tuple((n, t) for n, t in fields))


def is_list(t):
    return isinstance(t, tuple) and t[0] == "LIST"


def is_struct(t):
    return isinstance(t, tuple) and t[0] == "STRUCT"


def list_depth(t) -> int:
    d = 0
    while is_list(t):
        d += 1
        t = t[1]
    return d


def parse_type_name(name: str):
    """Parse a user-facing type name ('VARCHAR', 'LIST<BIGINT>', ...)."""
    s = name.strip().upper()
    m = re.match(r"\A(?:LIST|ARRAY)\s*<(.*)>\Z", s, re.S)
    if not m:
        m2 = re.match(r"\A(.*)\[\]\Z", s)
        if m2:
            return LIST(parse_type_name(m2.group(1)))
    if m:
        return LIST(parse_type_name(m.group(1)))
    s = _ALIASES.get(s, s)
    if s not in SCALARS:
        raise BinderError(f"unknown type name: {name!r}")
    return s


def render_type_name(t) -> str:
    if is_list(t):
        return f"LIST<{render_type_name(t[1])}>"
    if is_struct(t):
        inner = ", ".join(f"{n} {render_type_name(ft)}" for n, ft in t[1])
        return f"STRUCT<{inner}>"
    return t


def to_spark_type(t):
    if is_list(t):
        return T.ArrayType(to_spark_type(t[1]))
    if is_struct(t):
        return T.StructType(
            [T.StructField(n, to_spark_type(ft), True) for n, ft in t[1]]
        )
    return {
        "VARCHAR": T.StringType(),
        "BIGINT": T.LongType(),
        "DOUBLE": T.DoubleType(),
        "BOOLEAN": T.BooleanType(),
        "DATE": T.DateType(),
        "TIMESTAMP": T.TimestampType(),
        "BLOB": T.BinaryType(),
        "HUGEINT": T.DecimalType(38, 0),
    }[t]


def to_spark_schema(fields) -> T.StructType:
    """fields: iterable of FieldSpec -> Spark StructType."""
    return T.StructType(
        [T.StructField(f.name, to_spark_type(f.type), True) for f in fields]
    )
