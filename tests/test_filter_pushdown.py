"""Filter-pushdown compiler tests, mirroring the reference's
test/sql/query/{filters,complex_filters,objectid_filter,
substr_filter_pushdown,pushdown_negative}.test. Driver-side only.
"""

from __future__ import annotations

import datetime as dt

import pytest

from corpus import DB
from duckdb_mongo_spark.bsonlike import ObjectId
from duckdb_mongo_spark.pushdown import C, lit
from duckdb_mongo_spark.pushdown.filters import compile_filter, merge_match
from duckdb_mongo_spark.schema.infer import infer_schema


class TestSimpleFilters:
    def test_comparisons(self):
        assert compile_filter(C("age") > 28).match == {"age": {"$gt": 28}}
        assert compile_filter(C("age") >= 28).match == {"age": {"$gte": 28}}
        assert compile_filter(C("age") < 28).match == {"age": {"$lt": 28}}
        assert compile_filter(C("age") <= 28).match == {"age": {"$lte": 28}}
        assert compile_filter(C("age") == 28).match == {"age": {"$eq": 28}}
        # != carries the SQL non-null guard (MQL $ne alone matches
        # missing fields, which SQL != must not)
        assert compile_filter(C("age") != 28).match == {
            "$and": [{"age": {"$ne": 28}}, {"age": {"$ne": None}}]
        }

    def test_flipped_comparison(self):
        # 28 < age → age > 28
        assert compile_filter(lit(28) < C("age")).match == {"age": {"$gt": 28}}

    def test_in(self):
        got = compile_filter(C("city").isin("NYC", "SF")).match
        assert got == {"city": {"$in": ["NYC", "SF"]}}

    def test_null_checks(self):
        assert compile_filter(C("email").is_null()).match == {"email": None}
        assert compile_filter(C("email").is_not_null()).match == {"email": {"$ne": None}}

    def test_and_merges_one_doc(self):
        got = compile_filter((C("age") > 20) & (C("age") < 40)).match
        assert got == {"age": {"$gt": 20, "$lt": 40}}

    def test_and_distinct_columns(self):
        got = compile_filter((C("age") > 20) & (C("name") == "Bob")).match
        assert got == {"age": {"$gt": 20}, "name": {"$eq": "Bob"}}

    def test_and_colliding_ops_falls_back(self):
        got = compile_filter((C("age") > 20) & (C("age") > 30)).match
        assert got == {"$and": [{"age": {"$gt": 20}}, {"age": {"$gt": 30}}]}

    def test_or(self):
        got = compile_filter((C("age") > 40) | (C("name") == "Ann")).match
        assert got == {"$or": [{"age": {"$gt": 40}}, {"name": {"$eq": "Ann"}}]}

    def test_nested_dotted_path(self, backend):
        s = infer_schema(backend, DB, "users")
        got = compile_filter(C("address.city") == "Chicago", s).match
        assert got == {"address.city": {"$eq": "Chicago"}}

    def test_flattened_name_maps_to_dotted_path(self, backend):
        s = infer_schema(backend, DB, "users")
        got = compile_filter(C("address_city") == "Chicago", s).match
        assert got == {"address.city": {"$eq": "Chicago"}}

    def test_date_encoded_as_datetime(self):
        got = compile_filter(C("d") == dt.date(2023, 5, 1)).match
        assert got == {"d": {"$eq": dt.datetime(2023, 5, 1)}}


class TestObjectIdCoercion:
    def test_oid_column_coerced(self, backend):
        s = infer_schema(backend, DB, "users")
        got = compile_filter(C("_id") == "507f1f77bcf86cd799439011", s).match
        assert isinstance(got["_id"]["$eq"], ObjectId)

    def test_string_id_not_coerced(self, backend):
        # string_id_test regression: 24-hex strings that are NOT ObjectIds
        s = infer_schema(backend, DB, "string_id_test")
        got = compile_filter(C("_id") == "aaaaaaaaaaaaaaaaaaaaaaaa", s).match
        assert got == {"_id": {"$eq": "aaaaaaaaaaaaaaaaaaaaaaaa"}}
        got = compile_filter(C("ref_id") == "bbbbbbbbbbbbbbbbbbbbbbbb", s).match
        assert got["ref_id"]["$eq"] == "bbbbbbbbbbbbbbbbbbbbbbbb"

    def test_in_list_coerced(self, backend):
        s = infer_schema(backend, DB, "users")
        got = compile_filter(
            C("_id").isin("507f1f77bcf86cd799439011", "507f1f77bcf86cd799439012"), s
        ).match
        assert all(isinstance(v, ObjectId) for v in got["_id"]["$in"])


class TestExprPushdown:
    """Complex predicates → $expr (reference src/mongo_expr_pushdown.cpp)."""

    def test_length_function(self):
        plan = compile_filter(C("name").length() > 4)
        assert plan.fully_pushed
        fn = {"$strLenCP": "$name"}
        assert plan.match == {
            "$expr": {"$and": [{"$gt": ["$name", None]}, {"$gt": [fn, 4]}]}
        }

    def test_substring_1based_to_0based(self):
        plan = compile_filter(C("name").substring(1, 3) == "Ali")
        assert plan.fully_pushed
        fn = {"$substrCP": ["$name", 0, 3]}
        assert plan.match == {
            "$expr": {"$and": [{"$gt": ["$name", None]}, {"$eq": [fn, "Ali"]}]}
        }

    def test_col_to_col_comparison(self):
        plan = compile_filter(C("age") > C("balance"))
        assert plan.fully_pushed
        assert plan.match == {
            "$expr": {"$and": [
                {"$gt": ["$age", None]},
                {"$gt": ["$balance", None]},
                {"$gt": ["$age", "$balance"]},
            ]}
        }

    def test_arithmetic(self):
        plan = compile_filter(C("age") + 5 > C("balance"))
        assert plan.fully_pushed
        lhs = {"$add": ["$age", 5]}
        assert plan.match == {
            "$expr": {"$and": [
                {"$gt": ["$age", None]},
                {"$gt": ["$balance", None]},
                {"$gt": [lhs, "$balance"]},
            ]}
        }


class TestExprNullSemantics:
    """SQL NULL semantics in $expr pushdown: MQL's $cmp total order sorts
    null/missing lowest, so unguarded comparisons would match docs a Spark
    residual excludes — results must not depend on pushability (ADVICE r1)."""

    DOCS = [
        {"_id": 1, "a": 3, "b": 1, "name": "xx"},
        {"_id": 2, "name": "x"},               # a, b missing
        {"_id": 3, "a": None, "b": None, "name": None},
        {"_id": 4, "a": 10, "b": 20, "name": "Zed"},
    ]

    def _match(self, pred):
        from duckdb_mongo_spark.mql.match import matches_filter

        plan = compile_filter(pred)
        assert plan.fully_pushed
        return [d["_id"] for d in self.DOCS if matches_filter(d, plan.match)]

    def test_expr_lt_excludes_missing_and_null(self):
        assert self._match(C("a") + 1 < 5) == [1]

    def test_expr_ne_excludes_missing_and_null(self):
        assert self._match(C("name").lower() != "x") == [1, 4]

    def test_col_col_eq_excludes_missing_and_null(self):
        assert self._match(C("a") == C("b")) == []
        assert self._match(C("a") <= C("b")) == [4]

    def test_not_keeps_guards_outside_negation(self):
        # SQL: NOT(a = 3) is false for null/missing a, not true
        assert self._match(~((C("a") + 0) == 3)) == [4]

    def test_not_in_with_null_matches_nothing(self):
        assert self._match(~(C("a") + 0).isin([3, None])) == []

    def test_cmp_with_null_literal_matches_nothing(self):
        assert self._match(C("a") == None) == []  # noqa: E711
        assert self._match(C("a") != None) == []  # noqa: E711
        assert self._match((C("a") + 1) > None) == []

    def test_is_null_over_propagating_expr_checks_columns(self):
        # (a + b) IS NULL ⟺ a IS NULL OR b IS NULL in SQL
        assert self._match((C("a") + C("b")).is_null()) == [2, 3]
        assert self._match((C("a") + C("b")).is_not_null()) == [1, 4]

    def test_cast_comparison_excludes_unconvertible_strings(self):
        """CAST('abc' AS BIGINT) is NULL in Spark (ANSI off), so a pushed
        cast-comparison must exclude rows where the conversion fails —
        the compiled $convert carries onError:null and the whole-expr
        guard filters it (ADVICE r2)."""
        docs = [
            {"_id": 1, "s": "5"},
            {"_id": 2, "s": "abc"},   # cast → NULL → excluded
            {"_id": 3, "s": None},
            {"_id": 4, "s": "9.5"},
        ]
        from duckdb_mongo_spark.mql.match import matches_filter

        plan = compile_filter(C("s").cast("BIGINT") > 4)
        assert plan.fully_pushed
        got = [d["_id"] for d in docs if matches_filter(d, plan.match)]
        assert got == [1, 4]

    def test_is_null_over_numeric_cast_is_residual(self):
        # CAST to a numeric type can manufacture NULL from a non-null
        # input, so IS [NOT] NULL over it is outside the structural
        # null rule → Spark residual (ADVICE r2)
        plan = compile_filter(C("s").cast("BIGINT").is_not_null())
        assert not plan.fully_pushed and plan.residual is not None
        plan = compile_filter(C("s").cast("BIGINT").is_null())
        assert not plan.fully_pushed and plan.residual is not None
        # cast-to-string is total: nullness passes through, stays pushable
        plan = compile_filter(C("a").cast("VARCHAR").is_null())
        assert plan.fully_pushed

    def test_is_null_over_masking_expr_is_residual(self):
        # $toLower maps null→"" so lower(name) IS NULL cannot be pushed;
        # it must fall back to a Spark residual (always correct), never a
        # fully-pushed wrong filter
        plan = compile_filter(C("name").lower().is_null())
        assert not plan.fully_pushed and plan.residual is not None
        plan = compile_filter(C("name").lower().is_not_null())
        assert not plan.fully_pushed and plan.residual is not None


class TestResidualSplit:
    def test_unpushable_conjunct_split(self):
        # SUBSTRING with non-constant start is outside the pushdown
        # dialect (reference src/mongo_expr_pushdown.cpp:153-187); the
        # pushable conjunct still reaches the source
        pred = C("name").regex("^A") & (C("name").substring(C("x"), 3) == "Ali")
        plan = compile_filter(pred)
        assert plan.match == {"name": {"$regex": "^A"}}
        assert plan.residual is not None

    def test_dynamic_substring_unpushable(self):
        plan = compile_filter(C("name").substring(C("x"), 3) == "Ali")
        assert plan.match is None
        assert plan.residual is not None

    def test_merge_match(self):
        assert merge_match({"a": 1}, None) == {"a": 1}
        assert merge_match(None, {"b": 2}) == {"b": 2}
        assert merge_match({"a": {"$gt": 1}}, {"b": {"$eq": 2}}) == {
            "a": {"$gt": 1}, "b": {"$eq": 2}
        }


class TestDatePartAndTrimPushdown:
    """r5 _FUNC_MAP growth: date parts + trim family. All are
    null-propagating in both SQL and MQL, so the standard raw-column
    null guards suffice (no masking entries)."""

    def test_hour_compiles_with_guard(self):
        plan = compile_filter(C("ts").hour() >= 12)
        assert plan.fully_pushed
        assert plan.match == {
            "$expr": {"$and": [{"$gt": ["$ts", None]},
                               {"$gte": [{"$hour": "$ts"}, 12]}]}
        }

    def test_trim_spec_shape(self):
        plan = compile_filter(C("name").trim() == "Ali")
        assert plan.fully_pushed
        assert plan.match == {
            "$expr": {"$and": [
                {"$gt": ["$name", None]},
                {"$eq": [{"$trim": {"input": "$name"}}, "Ali"]},
            ]}
        }

    def test_semantics_agree_with_interpreter(self):
        import datetime as dt

        from duckdb_mongo_spark.mql.match import matches_filter

        docs = [
            {"_id": 1, "ts": dt.datetime(2024, 3, 10, 14, 30), "name": "  x "},
            {"_id": 2, "ts": dt.datetime(2024, 3, 10, 8, 0), "name": "y"},
            {"_id": 3, "name": None},  # ts missing, name null
        ]
        plan = compile_filter(C("ts").hour() >= 12)
        got = [d["_id"] for d in docs if matches_filter(d, plan.match)]
        assert got == [1]  # missing ts excluded by the guard, like SQL
        plan = compile_filter(C("name").trim() == "x")
        got = [d["_id"] for d in docs if matches_filter(d, plan.match)]
        assert got == [1]
        plan = compile_filter(C("ts").day_of_week() == 1)  # Sunday
        got = [d["_id"] for d in docs if matches_filter(d, plan.match)]
        assert got == [1, 2]
        plan = compile_filter(C("ts").week_of_year() == 10)
        got = [d["_id"] for d in docs if matches_filter(d, plan.match)]
        assert got == [1, 2]


class TestGeoPredicates:
    """r6: geo query predicates through the pushdown surface — the
    engine-path analog of the interpreter's $geoWithin/$geoIntersects/
    $near(Sphere) (mql/match.py). Always source-evaluated: compile into
    the pushed $match (shipped verbatim on a remote profile, evaluated by
    matches_filter locally); no Spark residual form exists."""

    def test_geo_within_compiles(self):
        got = compile_filter(
            C("loc").geo_within({"$box": [[-1, -1], [3, 3]]})).match
        assert got == {"loc": {"$geoWithin": {"$box": [[-1, -1], [3, 3]]}}}

    def test_geo_intersects_wraps_geometry(self):
        g = {"type": "Point", "coordinates": [1.0, 2.0]}
        got = compile_filter(C("loc").geo_intersects(g)).match
        assert got == {"loc": {"$geoIntersects": {"$geometry": g}}}

    def test_near_geojson_nests_bounds(self):
        pt = {"type": "Point", "coordinates": [2.35, 48.85]}
        got = compile_filter(
            C("loc").near(pt, max_distance=1000.0)).match
        assert got == {"loc": {"$near": {
            "$geometry": pt, "$maxDistance": 1000.0}}}

    def test_near_legacy_sibling_bounds(self):
        got = compile_filter(
            C("loc").near([0, 0], min_distance=1.0, max_distance=6.0,
                          spherical=True)).match
        assert got == {"loc": {"$nearSphere": [0, 0],
                               "$minDistance": 1.0, "$maxDistance": 6.0}}

    def test_geo_merges_with_plain_conjuncts(self):
        plan = compile_filter(
            (C("kind") == "poi")
            & C("loc").geo_within({"$center": [[0, 0], 5]}))
        assert plan.fully_pushed
        assert plan.match == {
            "kind": {"$eq": "poi"},
            "loc": {"$geoWithin": {"$center": [[0, 0], 5]}},
        }

    def test_negated_geo_raises_clearly(self):
        from duckdb_mongo_spark.frame import _pred_to_column
        from duckdb_mongo_spark.pushdown import predicates as P

        plan = compile_filter(~C("loc").geo_within({"$box": [[0, 0], [1, 1]]}))
        assert plan.match is None and plan.residual is not None
        with pytest.raises(ValueError, match="source-evaluated"):
            _pred_to_column(plan.residual, None)


class TestGeoPredicateExecution:
    """Round-trip: the pushed geo $match evaluated by the local
    interpreter path returns the same rows mql/match.py returns, and the
    scan annotation (EXPLAIN surface) renders the geo operator."""

    DOCS = [
        {"_id": 1, "loc": [0.0, 0.0], "kind": "poi"},
        {"_id": 2, "loc": [2.0, 2.0], "kind": "poi"},
        {"_id": 3, "loc": [5.0, 5.0], "kind": "poi"},
        {"_id": 4, "loc": None, "kind": "none"},
    ]

    def _backend(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table({
                "_id": [d["_id"] for d in self.DOCS],
                "loc": pa.array([d["loc"] for d in self.DOCS],
                                type=pa.list_(pa.float64())),
                "kind": [d["kind"] for d in self.DOCS],
            }),
            str(tmp_path / "places.parquet"))
        from duckdb_mongo_spark.backends import ParquetBackend

        return ParquetBackend(str(tmp_path), db_name="main")

    def test_geo_within_box_roundtrip(self, spark, tmp_path):
        from duckdb_mongo_spark.scan import mongo_scan

        be = self._backend(tmp_path)
        mf = mongo_scan(spark, be, "main", "places").filter(
            C("loc").geo_within({"$box": [[-1.0, -1.0], [3.0, 3.0]]}))
        desc = mf.scan_description()
        assert "$geoWithin" in desc
        ids = sorted(r["_id"] for r in mf.df().collect())
        assert ids == [1, 2]

    def test_near_legacy_roundtrip(self, spark, tmp_path):
        from duckdb_mongo_spark.scan import mongo_scan

        be = self._backend(tmp_path)
        mf = mongo_scan(spark, be, "main", "places").filter(
            C("loc").near([0.0, 0.0], max_distance=3.0))
        assert "$near" in mf.scan_description()
        # $near sorts by distance: origin first
        ids = [r["_id"] for r in mf.df().collect()]
        assert sorted(ids) == [1, 2]
