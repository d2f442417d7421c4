"""Fixture corpus mirroring the reference's adversarial collections
(FIXTURES.md, extracted from /root/reference/test/create-mongo-tables.sh).

Built as a MemoryBackend so every pushdown/schema test is hermetic —
MemoryBackend plays mongod's role (pushdown_profile="remote").
"""

from __future__ import annotations

import datetime as dt

from duckdb_mongo_spark.backends import MemoryBackend
from duckdb_mongo_spark.bsonlike import ObjectId

DB = "duckdb_mongo_test"


def oid(h: str) -> ObjectId:
    return ObjectId(h)


USERS = [
    {"_id": oid("507f1f77bcf86cd799439011"), "name": "Alice",
     "email": "alice@example.com", "age": 30, "active": True, "balance": 1000.50,
     "tags": ["admin", "user"],
     "address": {"street": "123 Main St", "city": "New York", "zip": "10001",
                 "country": "USA"},
     "created_at": dt.datetime(2023, 1, 1)},
    {"_id": oid("507f1f77bcf86cd799439012"), "name": "Bob",
     "email": "bob@example.com", "age": 25, "active": True, "balance": 2500.75,
     "tags": ["user"],
     "address": {"street": "456 Oak Ave", "city": "San Francisco", "zip": "94102",
                 "country": "USA"},
     "created_at": dt.datetime(2023, 2, 15)},
    {"_id": oid("507f1f77bcf86cd799439013"), "name": "Charlie",
     "email": "charlie@example.com", "age": 35, "active": False, "balance": 500.25,
     "tags": ["user", "premium"],
     "address": {"street": "789 Pine Rd", "city": "Chicago", "zip": "60601",
                 "country": "USA"},
     "created_at": dt.datetime(2023, 3, 20)},
    # Diana: auto ObjectId (no explicit _id)
    {"name": "Diana", "email": "diana@example.com", "age": 28, "active": True,
     "balance": 250.0, "tags": [],
     "address": {"street": "321 Elm St", "city": "Boston", "zip": "02101",
                 "country": "USA"},
     "created_at": dt.datetime(2023, 4, 10)},
]

PRODUCTS = [
    {"name": "Laptop", "category": "Electronics", "price": 999.99, "in_stock": True,
     "quantity": 50,
     "specs": {"cpu": "Intel i7", "ram": "16GB", "storage": "512GB SSD"},
     "tags": ["computer", "portable"]},
    {"name": "Mouse", "category": "Electronics", "price": 29.99, "in_stock": True,
     "quantity": 200,
     "specs": {"type": "Wireless", "dpi": 1600},
     "tags": ["accessory"]},
    {"name": "Desk", "category": "Furniture", "price": 299.99, "in_stock": False,
     "quantity": 0,
     "specs": {"material": "Wood",
               "dimensions": {"width": 120, "height": 75, "depth": 60}},
     "tags": ["furniture", "office"]},
]

ORDERS = [
    {"order_id": "ORD-001", "customer_id": oid("507f1f77bcf86cd799439011"),
     "items": [{"product": "Laptop", "quantity": 1, "price": 999.99},
               {"product": "Mouse", "quantity": 2, "price": 29.99}],
     "total": 1059.97, "status": "completed",
     "order_date": dt.datetime(2023, 5, 1)},
    {"order_id": "ORD-002", "customer_id": oid("507f1f77bcf86cd799439012"),
     "items": [{"product": "Desk", "quantity": 1, "price": 299.99}],
     "total": 299.99, "status": "pending",
     "order_date": dt.datetime(2023, 5, 2)},
    {"order_id": "ORD-003", "customer_id": oid("507f1f77bcf86cd799439013"),
     "items": [], "total": 0.0, "status": "cancelled",
     "order_date": dt.datetime(2023, 5, 3)},
    {"order_id": "ORD-004", "customer_id": oid("507f1f77bcf86cd799439011"),
     "items": [{"product": "Keyboard", "quantity": 1}],
     "total": 79.99, "status": "completed", "notes": ["urgent", "gift"],
     "order_date": dt.datetime(2023, 5, 4)},
]

MATRIX = [
    {"_id": "MAT-001", "name": "2D Matrix", "data": [[1, 2, 3], [4, 5, 6], [7, 8, 9]]},
    {"_id": "MAT-002", "name": "3D Matrix",
     "data": [[[1, 2], [3, 4]], [[5, 6], [7, 8]]]},
    {"_id": "MAT-003", "name": "Mixed Matrix", "data": [[10, 20], [30, 40], [50, 60]]},
]

from decimal import Decimal  # noqa: E402

DECIMAL_TEST = [
    {"name": "item1", "amount": Decimal("123.45"), "category": "A"},
    {"name": "item2", "amount": Decimal("999.99"), "category": "A"},
    {"name": "item3", "amount": Decimal("50.00"), "category": "B"},
]

TYPE_CONFLICTS = [
    {"_id": "tc1", "id": "123", "value": "string"},
    {"_id": "tc2", "id": 456, "value": 789},
    {"_id": "tc3", "id": True, "value": False},
]

DEEPLY_NESTED = [
    {"level1": {"level2": {"level3": {"level4": {"level5": {"level6": {
        "value": "deep value"}}}}}}},
]

NESTED_SCALARS = [
    {"Parent": {"Object": {"Child": {"String": "hello", "Int": 42, "Bool": True,
                                     "Date": dt.datetime(2023, 6, 1, 12, 30)}}}},
    {"Parent": {"Object": {"Child": {"String": "world", "Int": 7, "Bool": False,
                                     "OptionalField": "present"}}}},
    {"Level1": {"Level2": {"Level3": {"Value": "nested", "Number": 3.14}}}},
    {"Parent": {"Object": {"Child": {"String": None, "Int": None}}}},
]

STRING_ID_TEST = [
    {"_id": "aaaaaaaaaaaaaaaaaaaaaaaa", "name": "Doc1", "value": 100,
     "ref_id": "bbbbbbbbbbbbbbbbbbbbbbbb"},
    {"_id": "cccccccccccccccccccccccc", "name": "Doc2", "value": 200,
     "ref_id": "dddddddddddddddddddddddd"},
    {"_id": "eeeeeeeeeeeeeeeeeeeeeeee", "name": "Doc3", "value": 300,
     "ref_id": "ffffffffffffffffffffffff"},
]

SCHEMA_TEST_SIMPLE = [
    {"_id": "__schema", "name": "VARCHAR", "age": "BIGINT", "email": "VARCHAR"},
    {"name": "Eve", "age": 22, "email": "eve@example.com", "extra": "ignored"},
    {"name": "Frank", "age": 41, "email": "frank@example.com"},
]

SCHEMA_TEST_NESTED = [
    {"_id": "__schema",
     "schema": {"name": "VARCHAR", "email": "VARCHAR", "active": "BOOLEAN"}},
    {"name": "Gina", "email": "gina@example.com", "active": True},
]

SCHEMA_TEST_PATHS = [
    {"_id": "__schema",
     "schema": {"name": "VARCHAR",
                "city": {"type": "VARCHAR", "path": "address.city"}}},
    {"name": "Hank", "address": {"city": "Denver", "zip": "80201"}},
]

CASE_VARIANT_FIELDS = [
    {"case_data": {"clientFullname": "Ann Lee"}},
    {"case_data": {"ClientFullname": "Bo Chen"}},
]

# sparse/wide realistic business docs (FIXTURES §10): deep nested
# sub-docs, nulls inside nested docs, ObjectId-typed nested field,
# second doc carries only a sparse subset of the fields
OBJECT_CONTAINER = [
    {"case_data": {
        "case_id": "CASE-001",
        "unprocessed_case_data": {
            "raw_text": "full transcription here",
            "confidence": 0.93,
            "flags": ["review", "priority"],
        },
        "case_metadata": {
            "created_by": "agent-7",
            "reviewed": False,
            "notes": None,
        },
        "channel_meta_data": {"channel_id": oid("6a7d000000000000000000aa"),
                              "channel": "email"},
    }},
    {"case_data": {
        "case_id": "CASE-002",
        "case_metadata": {"created_by": "agent-9"},
    }},
]


def build_backend() -> MemoryBackend:
    be = MemoryBackend()
    be.insert_many(DB, "users", USERS)
    be.insert_many(DB, "products", PRODUCTS)
    be.insert_many(DB, "orders", ORDERS)
    be.insert_many(DB, "matrix", MATRIX)
    be.insert_many(DB, "decimal_test", DECIMAL_TEST)
    be.create_collection(DB, "empty_collection")
    be.insert_many(DB, "type_conflicts", TYPE_CONFLICTS)
    be.insert_many(DB, "deeply_nested", DEEPLY_NESTED)
    be.insert_many(DB, "nested_scalars_test", NESTED_SCALARS)
    be.insert_many(DB, "string_id_test", STRING_ID_TEST)
    be.insert_many(DB, "schema_test_simple", SCHEMA_TEST_SIMPLE)
    be.insert_many(DB, "schema_test_nested", SCHEMA_TEST_NESTED)
    be.insert_many(DB, "schema_test_paths", SCHEMA_TEST_PATHS)
    be.insert_many(DB, "case_variant_fields_test", CASE_VARIANT_FIELDS)
    be.insert_many(DB, "object_container_test", OBJECT_CONTAINER)
    return be
