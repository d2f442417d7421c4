"""Scan-planner plan assertions, mirroring the reference's EXPLAIN-regex
tests (test/sql/query/{count,groupby,topn}_pushdown.test,
pushdown_negative.test, filter_pushdown_plan.test). The engine's
``scan_description()`` is the EXPLAIN surface (reference
MongoScanToString, src/mongo_table_function.cpp:45-73).
"""

from __future__ import annotations

import re

import pytest

from corpus import DB
from duckdb_mongo_spark.frame import MongoFrame
from duckdb_mongo_spark.pushdown import C
from duckdb_mongo_spark.schema.infer import resolve_schema


@pytest.fixture(scope="module")
def users(backend):
    schema = resolve_schema(backend, DB, "users")
    return MongoFrame(spark=None, backend=backend, db=DB, coll="users", schema=schema)


class TestFindPlans:
    def test_plain_scan_is_find(self, users):
        d = users.scan_description()
        assert "scan_method=find" in d
        assert "filter=" not in d

    def test_filter_pushed(self, users):
        d = users.filter(C("age") > 28).scan_description()
        assert 'filter={"age": {"$gt": 28}}' in d

    def test_projection_includes_id_and_collapses(self, users):
        d = users.select("name", "address_city", "address").scan_description()
        # parent "address" covers child "address.city"
        assert re.search(r'projection=\{[^}]*"address": 1', d)
        assert '"address.city"' not in d
        assert '"_id": 1' in d

    def test_limit_pushed(self, users):
        d = users.filter(C("age") > 20).limit(5).scan_description()
        assert "limit=5" in d

    def test_limit_not_pushed_under_residual(self, users):
        # residual filter in Spark → limit must NOT reach the source
        d = users.filter(C("name").substring(C("x"), 3) == "Ali").limit(5).scan_description()
        assert "limit=5" not in d

    def test_manual_filter_merged(self, backend):
        schema = resolve_schema(backend, DB, "users")
        mf = MongoFrame(spark=None, backend=backend, db=DB, coll="users",
                        schema=schema, manual_filter={"tags": {"$elemMatch": {"$eq": "admin"}}})
        d = mf.filter(C("age") > 20).scan_description()
        assert "$elemMatch" in d and "$gt" in d


class TestTopNPlans:
    def test_topn_rewrite(self, users):
        d = users.order_by_id().limit(3).scan_description()
        assert "scan_method=aggregate" in d
        assert '{"$sort": {"_id": 1}}' in d
        assert '{"$limit": 3}' in d

    def test_topn_desc(self, users):
        d = users.order_by_id(descending=True).limit(3).scan_description()
        assert '{"$sort": {"_id": -1}}' in d

    def test_order_without_limit_not_pushed(self, users):
        d = users.order_by_id().scan_description()
        assert "scan_method=find" in d

    def test_topn_with_match(self, users):
        d = users.filter(C("age") > 20).order_by_id().limit(2).scan_description()
        assert '"$match"' in d and '"$sort"' in d


class TestAggregatePlans:
    def test_count_star(self, users):
        d = users.count_rows().scan_description()
        assert "scan_method=aggregate" in d
        assert '{"$count": "count"}' in d

    def test_count_with_filter(self, users):
        d = users.filter(C("active") == True).count_rows().scan_description()  # noqa: E712
        assert '"$match"' in d and '"$count"' in d

    def test_group_by_agg(self, users):
        d = (users.group_by("active")
             .agg(("count_star", None, "n"), ("avg", "age", "avg_age"))
             .scan_description())
        assert "scan_method=aggregate" in d
        assert '"$group"' in d
        assert '"__agg0": {"$sum": 1}' in d
        assert '"__agg1": {"$avg": "$age"}' in d
        # $project flattens group keys and renames __aggN to aliases
        assert '"n": "$__agg0"' in d
        assert '"avg_age": "$__agg1"' in d

    def test_count_col_non_null(self, users):
        d = users.group_by("active").agg(("count", "email", "n_email")).scan_description()
        assert '"$cond"' in d and '"$ne"' in d

    def test_nested_group_key_uses_dotted_path(self, users):
        d = (users.group_by("address_city")
             .agg(("count_star", None, "n")).scan_description())
        assert '"$address.city"' in d


class TestNegativeSpace:
    """Aggregate pushdown guards (A22): unsupported shapes stay in Spark."""

    def test_unsupported_agg_op(self, users):
        d = users.group_by("active").agg(("stddev", "age", "sd")).scan_description()
        assert "scan_method=find" in d

    def test_enforcement_mode_disables_agg_pushdown(self, backend):
        schema = resolve_schema(backend, DB, "users",
                                columns={"name": "VARCHAR", "age": "BIGINT"})
        mf = MongoFrame(spark=None, backend=backend, db=DB, coll="users",
                        schema=schema, schema_mode="DROPMALFORMED")
        d = mf.group_by("name").agg(("avg", "age", "a")).scan_description()
        assert "scan_method=find" in d

    def test_enforcement_mode_fetches_all_columns(self, backend):
        # enforcement requires fetching every schema column
        # (mongo_table_function.cpp:531-550) → no projection doc
        schema = resolve_schema(backend, DB, "users",
                                columns={"name": "VARCHAR", "age": "BIGINT"})
        mf = MongoFrame(spark=None, backend=backend, db=DB, coll="users",
                        schema=schema, schema_mode="DROPMALFORMED")
        d = mf.select("name").scan_description()
        assert "projection=" not in d


class TestManualPipeline:
    def test_pipeline_param_switches_to_aggregate(self, backend):
        schema = resolve_schema(backend, DB, "users")
        mf = MongoFrame(spark=None, backend=backend, db=DB, coll="users",
                        schema=schema,
                        manual_pipeline=[{"$match": {"active": True}}])
        d = mf.scan_description()
        assert "scan_method=aggregate" in d

    def test_shape_changing_pipeline_infers_output_schema(self, backend):
        # the reference binds the BASE collection schema and requires
        # columns= for shape-changing pipelines
        # (mongo_table_function.cpp:324-326); we additionally infer from
        # the pipeline's own output when columns is absent
        from duckdb_mongo_spark.scan import mongo_scan

        mf = mongo_scan(None, backend, DB, "users",
                        pipeline=[{"$count": "n_users"}])
        assert [f.name for f in mf.schema.fields] == ["n_users"]

    def test_explicit_columns_beats_pipeline_inference(self, backend):
        from duckdb_mongo_spark.scan import mongo_scan

        mf = mongo_scan(None, backend, DB, "users",
                        pipeline=[{"$count": "n_users"}],
                        columns={"n_users": "BIGINT"})
        assert mf.schema.source == "columns"

    def test_pipeline_inference_excludes_schema_sentinel(self):
        # The __schema sentinel doc must not flow through the inference
        # pipeline: $max over a sentinel-bearing collection would ingest
        # the sentinel's type-name STRING ('double' beats any number in
        # MQL's type bracket ordering), typing the output column VARCHAR.
        from duckdb_mongo_spark.backends import MemoryBackend
        from duckdb_mongo_spark.scan import mongo_scan

        be = MemoryBackend()
        be.insert_many("db", "m", [
            {"_id": "__schema", "v": "double"},
            {"_id": 1, "v": 1.5},
            {"_id": 2, "v": 2.5},
        ])
        mf = mongo_scan(None, be, "db", "m",
                        pipeline=[{"$group": {"_id": None, "mx": {"$max": "$v"}}}])
        fields = {f.name: str(f.type) for f in mf.schema.fields}
        assert fields["mx"] == "DOUBLE", fields

    def test_pipeline_inference_ignores_sentinel_when_id_dropped(self):
        # $project {_id: 0} defeats infer_schema_from_docs' post-filter —
        # the sentinel must already be excluded inside the pipeline.
        from duckdb_mongo_spark.backends import MemoryBackend
        from duckdb_mongo_spark.scan import mongo_scan

        be = MemoryBackend()
        be.insert_many("db", "m", [
            {"_id": "__schema", "v": "double"},
            {"_id": 1, "v": 1.5},
        ])
        mf = mongo_scan(None, be, "db", "m",
                        pipeline=[{"$project": {"_id": 0, "v": 1}}])
        fields = {f.name: str(f.type) for f in mf.schema.fields}
        assert fields["v"] == "DOUBLE", fields
