"""Schema subsystem: three-tier resolution, sampling inference with
type-conflict voting, document flattening, enforcement modes.

Semantics per SURVEY.md §1.2-1.5; reference implementation (not ported):
/root/reference/src/mongo_schema_inference.cpp and
src/schema/mongo_schema_inference_helpers.cpp.
"""

from duckdb_mongo_spark.schema.types import (
    LIST,
    STRUCT,
    to_spark_type,
    to_spark_schema,
    parse_type_name,
    render_type_name,
)
from duckdb_mongo_spark.schema.infer import (
    CollectionSchema,
    FieldSpec,
    infer_schema,
    resolve_schema,
    schema_from_columns_param,
    schema_from_schema_doc,
)
from duckdb_mongo_spark.schema.flatten import SchemaMode, flatten_document

__all__ = [
    "LIST", "STRUCT", "to_spark_type", "to_spark_schema", "parse_type_name",
    "render_type_name", "CollectionSchema", "FieldSpec", "infer_schema",
    "resolve_schema", "schema_from_columns_param", "schema_from_schema_doc",
    "SchemaMode", "flatten_document",
]
