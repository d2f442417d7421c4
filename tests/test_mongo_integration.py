"""MongoDB-backend integration tests — live server OR in-process fake.

With MONGODB_TEST_DATABASE_AVAILABLE set (optionally MONGODB_TEST_URI,
default mongodb://localhost:27017) these run against a real mongod —
mirroring the reference's gated live tests (test/run-tests-with-mongo.sh
+ require-env MONGODB_TEST_DATABASE_AVAILABLE in test/sql/*/*.test).
WITHOUT the env var they run against the wire-compatible in-process fake
(``duckdb_mongo_spark.testing.fake_mongo``), so the server-side branches
execute in every pytest run instead of skipping:

- PymongoBackend.find/aggregate (server-side cursor, datasource.py
  _result_docs is_remote branches)
- find_partition/aggregate_partition (_id-range partitioned server scans)
- sentinel-aware count(), $sample-based schema inference
"""

from __future__ import annotations

import os

import pytest

DB = "duckdb_mongo_spark_it"
COLL = "users_it"

FIXTURE_DOCS = [
    {"_id": f"u{i:03d}", "name": f"user{i}", "age": 20 + (i % 30),
     "address": {"city": "Oslo" if i % 2 else "Bergen"}}
    for i in range(200)
] + [{"_id": "__schema", "name": "string", "age": "bigint"}]


@pytest.fixture(scope="module")
def backend():
    if os.environ.get("MONGODB_TEST_DATABASE_AVAILABLE"):
        from duckdb_mongo_spark.backends.mongo import HAVE_PYMONGO, PymongoBackend

        if not HAVE_PYMONGO:
            pytest.skip("pymongo not installed")
        uri = os.environ.get("MONGODB_TEST_URI", "mongodb://localhost:27017")
        be = PymongoBackend(uri)
        try:
            be.client.admin.command("ping")
        except Exception as e:  # noqa: BLE001
            pytest.skip(f"cannot reach mongod at {uri}: {e}")
        coll = be.client[DB][COLL]
        coll.drop()
        coll.insert_many(FIXTURE_DOCS)
        yield be
        coll.drop()
        return
    from duckdb_mongo_spark.testing.fake_mongo import FakeMongoBackend

    be = FakeMongoBackend()
    be.client.admin.command("ping")
    be.client[DB][COLL].insert_many(FIXTURE_DOCS)
    yield be


def test_count_excludes_schema_sentinel(backend):
    assert backend.count(DB, COLL) == 200
    assert backend.count(DB, COLL, {"age": {"$gte": 40}}) == sum(
        1 for i in range(200) if 20 + (i % 30) >= 40
    )


def test_server_side_find_partitions_cover_collection(backend):
    parts = backend.partitions(DB, COLL, 4)
    seen = []
    for p in parts:
        seen += [d["_id"] for d in backend.find_partition(p, filter=None)]
    assert sorted(x for x in seen if x != "__schema") == [
        f"u{i:03d}" for i in range(200)
    ]


def test_server_side_filtered_partition_scan(backend):
    parts = backend.partitions(DB, COLL, 4)
    got = []
    for p in parts:
        got += list(backend.find_partition(p, filter={"age": {"$gt": 45}}))
    assert got and all(d["age"] > 45 for d in got)


def test_server_side_aggregate(backend):
    out = list(
        backend.aggregate(
            DB, COLL,
            [{"$match": {"_id": {"$ne": "__schema"}}},
             {"$group": {"_id": None, "n": {"$sum": 1}}}],
        )
    )
    assert out[0]["n"] == 200


def test_server_side_in_filter(backend):
    """The semi-join runtime filter (A11) ships as a server-side $in
    merged with each partition's _id range."""
    parts = backend.partitions(DB, COLL, 2)
    got = []
    for p in parts:
        got += list(backend.find_partition(
            p, filter={"_id": {"$in": ["u001", "u100", "nope"]}}))
    assert sorted(d["_id"] for d in got) == ["u001", "u100"]


def test_aggregate_partition_record_wise(backend):
    parts = backend.partitions(DB, COLL, 3)
    pipeline = [{"$match": {"_id": {"$ne": "__schema"}}},
                {"$project": {"_id": 1, "age": 1}}]
    got = []
    for p in parts:
        got += list(backend.aggregate_partition(p, pipeline))
    assert sorted(d["_id"] for d in got) == [f"u{i:03d}" for i in range(200)]


def test_catalog_listing(backend):
    assert DB in backend.list_databases()
    assert COLL in backend.list_collections(DB)


def test_find_schema_doc(backend):
    doc = backend.find_schema_doc(DB, COLL)
    assert doc and doc["name"] == "string" and doc["age"] == "bigint"


def test_engine_end_to_end_on_live_server(backend):
    """Full path: schema inference ($sample) → mongo_scan → filter/
    projection pushdown → server-side partitioned cursors → DataFrame."""
    from duckdb_mongo_spark import mongo_scan
    from duckdb_mongo_spark.pushdown import C
    from duckdb_mongo_spark.session import get_spark

    spark = get_spark("mongo-it")
    mf = mongo_scan(spark, backend, DB, COLL)
    desc = mf.filter(C("age") > 40).scan_description()
    assert "scan_method=find" in desc and "$gt" in desc
    rows = mf.filter(C("age") > 40).select("name", "age").df().collect()
    assert rows and all(r.age > 40 for r in rows)
    # aggregate pushdown runs ON the server (remote profile)
    agg = mf.group_by("address.city").agg(("count_star", None, "n")).df().collect()
    assert sorted((r[0], r[1]) for r in agg) == [("Bergen", 100), ("Oslo", 100)]
