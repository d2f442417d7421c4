"""Schema-system tests, mirroring the reference's test/sql/schema/ suite
(inference, provided, mode, array_items, object_container_inference,
case_variant_fields). No SparkSession needed — inference is driver-side.
"""

from __future__ import annotations

import pytest

from corpus import DB
from duckdb_mongo_spark.schema.infer import infer_schema, resolve_schema
from duckdb_mongo_spark.schema.types import LIST, STRUCT


def field(schema, name):
    return schema.field_map()[name]


def names(schema):
    return schema.names()


class TestInference:
    def test_users_baseline(self, backend):
        s = infer_schema(backend, DB, "users")
        # _id always present and always first
        assert names(s)[0] == "_id"
        assert field(s, "_id").type == "VARCHAR"
        assert field(s, "name").type == "VARCHAR"
        assert field(s, "age").type == "BIGINT"
        assert field(s, "active").type == "BOOLEAN"
        assert field(s, "balance").type == "DOUBLE"
        assert field(s, "tags").type == LIST("VARCHAR")
        # nested doc → flattened children + parent JSON VARCHAR
        assert field(s, "address").type == "VARCHAR"
        assert field(s, "address_city").type == "VARCHAR"
        assert field(s, "address_city").mongo_path == "address.city"
        # midnight-UTC rule: all created_at are midnight → DATE
        assert field(s, "created_at").type == "DATE"

    def test_objectid_probe(self, backend):
        s = infer_schema(backend, DB, "users")
        assert "_id" in s.objectid_columns
        s2 = infer_schema(backend, DB, "string_id_test")
        # 24-hex strings that are NOT ObjectIds must not be marked
        assert "_id" not in s2.objectid_columns
        assert "ref_id" not in s2.objectid_columns

    def test_products_doubly_nested(self, backend):
        s = infer_schema(backend, DB, "products")
        # union of specs_* across heterogeneous docs
        for child in ("specs_cpu", "specs_type", "specs_material"):
            assert field(s, child).type == "VARCHAR"
        assert field(s, "specs_dpi").type == "BIGINT"
        # depth-3 nested doc
        assert field(s, "specs_dimensions_width").type == "BIGINT"
        assert field(s, "specs_dimensions_width").mongo_path == "specs.dimensions.width"

    def test_orders_array_of_structs(self, backend):
        s = infer_schema(backend, DB, "orders")
        t = field(s, "items").type
        assert t[0] == "LIST"
        elem = t[1]
        assert elem[0] == "STRUCT"
        fields = dict(elem[1])
        # merged across elements and docs; ORD-004 item has no price
        assert fields["product"] == "VARCHAR"
        assert fields["quantity"] == "BIGINT"
        assert fields["price"] == "DOUBLE"

    def test_matrix_deepest_depth_wins(self, backend):
        s = infer_schema(backend, DB, "matrix")
        assert field(s, "data").type == LIST(LIST(LIST("BIGINT")))

    def test_decimal128_to_double(self, backend):
        s = infer_schema(backend, DB, "decimal_test")
        assert field(s, "amount").type == "DOUBLE"

    def test_empty_collection(self, backend):
        s = infer_schema(backend, DB, "empty_collection")
        assert names(s) == ["_id"]

    def test_type_conflict_voting(self, backend):
        s = infer_schema(backend, DB, "type_conflicts")
        # 1/3 string, 1/3 int, 1/3 bool → BIGINT (≥30% ints beats bool)
        assert field(s, "id").type == "BIGINT"
        assert field(s, "value").type == "BIGINT"

    def test_deeply_nested_max_depth(self, backend):
        s = infer_schema(backend, DB, "deeply_nested")
        # levels ≤5 flattened; level5 is a JSON VARCHAR parent, level6 not split
        assert "level1_level2_level3_level4_level5" in names(s)
        assert "level1_level2_level3_level4_level5_level6_value" not in names(s)

    def test_case_variant_merge(self, backend):
        s = infer_schema(backend, DB, "case_variant_fields_test")
        # case-insensitive dedup: first-seen name wins
        matches = [n for n in names(s) if n.lower() == "case_data_clientfullname"]
        assert matches == ["case_data_clientFullname"]

    def test_object_container_sparse_wide(self, backend):
        # FIXTURES §10: inference over sparse/wide nested business docs
        s = infer_schema(backend, DB, "object_container_test")
        assert field(s, "case_data_case_id").type == "VARCHAR"
        assert field(s, "case_data_unprocessed_case_data_confidence").type == "DOUBLE"
        assert field(s, "case_data_unprocessed_case_data_flags").type == LIST("VARCHAR")
        assert field(s, "case_data_case_metadata_reviewed").type == "BOOLEAN"
        # null-only nested field refines to VARCHAR
        assert field(s, "case_data_case_metadata_notes").type == "VARCHAR"
        # ObjectId-typed NESTED field is probed for filter coercion
        assert "case_data_channel_meta_data_channel_id" in s.objectid_columns
        # parent JSON columns exist at each nesting level
        for parent in ("case_data", "case_data_case_metadata"):
            assert field(s, parent).type == "VARCHAR"

    def test_nested_scalars_missing_paths(self, backend):
        s = infer_schema(backend, DB, "nested_scalars_test")
        assert field(s, "Parent_Object_Child_String").type == "VARCHAR"
        assert field(s, "Parent_Object_Child_Int").type == "BIGINT"
        assert field(s, "Parent_Object_Child_Date").type == "TIMESTAMP"
        assert field(s, "Level1_Level2_Level3_Number").type == "DOUBLE"


class TestProvidedSchema:
    def test_columns_param(self, backend):
        s = resolve_schema(backend, DB, "users",
                           columns={"name": "VARCHAR", "age": "BIGINT"})
        assert s.source == "columns"
        assert names(s) == ["_id", "name", "age"]

    def test_columns_param_with_path(self, backend):
        s = resolve_schema(
            backend, DB, "users",
            columns={"city": {"type": "VARCHAR", "path": "address.city"}})
        assert s.field_map()["city"].mongo_path == "address.city"

    def test_schema_doc_simple(self, backend):
        s = resolve_schema(backend, DB, "schema_test_simple")
        assert s.source == "__schema"
        assert names(s) == ["_id", "name", "age", "email"]
        assert s.field_map()["age"].type == "BIGINT"

    def test_schema_doc_nested_format(self, backend):
        s = resolve_schema(backend, DB, "schema_test_nested")
        assert names(s) == ["_id", "name", "email", "active"]
        assert s.field_map()["active"].type == "BOOLEAN"

    def test_schema_doc_path_format(self, backend):
        s = resolve_schema(backend, DB, "schema_test_paths")
        assert s.field_map()["city"].mongo_path == "address.city"

    def test_columns_take_precedence_over_schema_doc(self, backend):
        s = resolve_schema(backend, DB, "schema_test_simple",
                           columns={"name": "VARCHAR"})
        assert s.source == "columns"
        assert names(s) == ["_id", "name"]


class TestVoting:
    def test_varchar_majority(self):
        from duckdb_mongo_spark.schema.infer import _vote

        assert _vote(["VARCHAR"] * 8 + ["BIGINT"] * 2) == "VARCHAR"

    def test_double_threshold(self):
        from duckdb_mongo_spark.schema.infer import _vote

        assert _vote(["DOUBLE"] * 2 + ["VARCHAR"] * 8) == "VARCHAR"  # >70% strings
        assert _vote(["DOUBLE"] * 3 + ["BIGINT"] * 7) == "DOUBLE"    # ≥30% doubles

    def test_list_deepest_wins(self):
        from duckdb_mongo_spark.schema.infer import _vote

        got = _vote([LIST("BIGINT"), LIST(LIST("BIGINT"))])
        assert got == LIST(LIST("BIGINT"))

    def test_list_struct_field_merge(self):
        from duckdb_mongo_spark.schema.infer import _vote

        a = LIST(STRUCT([("x", "BIGINT")]))
        b = LIST(STRUCT([("y", "VARCHAR")]))
        got = _vote([a, b])
        assert dict(got[1][1]) == {"x": "BIGINT", "y": "VARCHAR"}
