"""Local MQL interpreter tests — the hermetic mongod stand-in must agree
with MongoDB's documented semantics, since pushed plans execute on it in
tests (the reference trusts mongod for the same role).
"""

from __future__ import annotations

import datetime as dt

import pytest

from duckdb_mongo_spark.mql import run_pipeline
from duckdb_mongo_spark.mql.match import matches_filter

DOCS = [
    {"_id": 1, "a": 5, "b": "x", "tags": ["p", "q"], "n": {"c": 1}},
    {"_id": 2, "a": 15, "b": "y", "tags": ["q"], "n": {"c": 2}},
    {"_id": 3, "a": 25, "b": "x", "tags": [], "n": {}},
    {"_id": 4, "a": None, "b": "z"},
]


def run(pipeline, docs=DOCS):
    return list(run_pipeline(docs, pipeline))


class TestMatch:
    def test_ops(self):
        assert matches_filter({"a": 5}, {"a": {"$gt": 3}})
        assert not matches_filter({"a": 5}, {"a": {"$gt": 5}})
        assert matches_filter({"a": 5}, {"a": {"$gte": 5, "$lte": 5}})
        assert matches_filter({"a": 5}, {"a": 5})
        assert matches_filter({"a": 5}, {"a": {"$in": [1, 5]}})
        assert matches_filter({"a": 5}, {"a": {"$ne": 6}})

    def test_missing_vs_null(self):
        # {col: null} matches both null and missing (MongoDB semantics)
        assert matches_filter({"b": 1}, {"a": None})
        assert matches_filter({"a": None}, {"a": None})
        assert not matches_filter({"a": 5}, {"a": None})
        # $ne: null matches only present non-null
        assert matches_filter({"a": 5}, {"a": {"$ne": None}})
        assert not matches_filter({}, {"a": {"$ne": None}})

    def test_dotted_path(self):
        assert matches_filter({"n": {"c": 3}}, {"n.c": {"$gt": 2}})
        assert not matches_filter({"n": {}}, {"n.c": {"$gt": 2}})

    def test_array_contains(self):
        # equality on an array matches if any element equals (Mongo rule)
        assert matches_filter({"tags": ["p", "q"]}, {"tags": "p"})
        assert not matches_filter({"tags": ["q"]}, {"tags": "p"})

    def test_elem_match(self):
        doc = {"items": [{"q": 1}, {"q": 5}]}
        assert matches_filter(doc, {"items": {"$elemMatch": {"q": {"$gt": 3}}}})
        assert not matches_filter(doc, {"items": {"$elemMatch": {"q": {"$gt": 9}}}})

    def test_all(self):
        assert matches_filter({"tags": ["p", "q", "r"]}, {"tags": {"$all": ["p", "r"]}})
        assert not matches_filter({"tags": ["p"]}, {"tags": {"$all": ["p", "r"]}})
        assert matches_filter({"x": 5}, {"x": {"$all": [5]}})

    def test_and_or(self):
        f = {"$or": [{"a": {"$gt": 20}}, {"b": "y"}]}
        assert matches_filter({"a": 25, "b": "x"}, f)
        assert matches_filter({"a": 1, "b": "y"}, f)
        assert not matches_filter({"a": 1, "b": "x"}, f)

    def test_comparison_ignores_missing(self):
        # range ops never match missing/null (BSON type ordering)
        assert not matches_filter({}, {"a": {"$gt": 0}})
        assert not matches_filter({"a": None}, {"a": {"$gt": 0}})

    def test_mod(self):
        # mongod $mod: C-style TRUNCATED remainder, operands truncate,
        # arrays match per element, divisor 0 errors (r8)
        assert matches_filter({"a": 10}, {"a": {"$mod": [4, 2]}})
        assert not matches_filter({"a": 10}, {"a": {"$mod": [4, 1]}})
        assert matches_filter({"a": -10}, {"a": {"$mod": [4, -2]}})
        assert matches_filter({"a": 10.7}, {"a": {"$mod": [4, 2]}})
        assert matches_filter({"a": [3, 10]}, {"a": {"$mod": [5, 0]}})
        assert not matches_filter({"a": "x"}, {"a": {"$mod": [4, 0]}})
        with pytest.raises(ValueError, match="divisor"):
            matches_filter({"a": 1}, {"a": {"$mod": [0, 1]}})

    def test_bitwise_operators(self):
        # masks as int or bit-position lists; fractional values never
        # match; arrays per element (r8)
        d = {"a": 54}  # 0b110110
        assert matches_filter(d, {"a": {"$bitsAllSet": [1, 5]}})
        assert matches_filter(d, {"a": {"$bitsAllSet": 50}})
        assert not matches_filter(d, {"a": {"$bitsAllSet": [0, 1]}})
        assert matches_filter(d, {"a": {"$bitsAnySet": [0, 1]}})
        assert matches_filter(d, {"a": {"$bitsAllClear": [0, 3]}})
        assert matches_filter(d, {"a": {"$bitsAnyClear": [1, 0]}})
        assert not matches_filter(d, {"a": {"$bitsAnyClear": [1, 5]}})
        assert not matches_filter({"a": 2.5}, {"a": {"$bitsAnySet": 3}})
        assert matches_filter({"a": [2, 8]}, {"a": {"$bitsAllSet": 8}})

    def test_comment_is_metadata(self):
        assert matches_filter({"a": 1}, {"a": 1, "$comment": "why"})
        assert matches_filter(
            {"a": 1}, {"a": {"$eq": 1, "$comment": "inline"}})
        assert not matches_filter(
            {"a": 2}, {"a": 1, "$comment": "still filters"})


class TestPipeline:
    def test_match_project_limit(self):
        out = run([
            {"$match": {"a": {"$gte": 15}}},
            {"$project": {"a": 1}},
            {"$limit": 1},
        ])
        assert out == [{"_id": 2, "a": 15}]

    def test_project_exclude_id(self):
        out = run([{"$project": {"_id": 0, "a": 1}}, {"$limit": 1}])
        assert out == [{"a": 5}]

    def test_project_computed(self):
        out = run([{"$project": {"_id": 0, "twice": {"$multiply": ["$a", 2]}}},
                   {"$limit": 1}])
        assert out == [{"twice": 10}]

    def test_sort_limit(self):
        out = run([{"$sort": {"a": -1}}, {"$limit": 2}, {"$project": {"_id": 1}}])
        assert [d["_id"] for d in out] == [3, 2]  # nulls sort first asc → last desc? no: desc puts high first

    def test_count(self):
        assert run([{"$count": "n"}]) == [{"n": 4}]
        assert run([{"$match": {"a": {"$gt": 999}}}, {"$count": "n"}]) == []

    def test_group_accumulators(self):
        out = run([
            {"$group": {"_id": "$b",
                        "total": {"$sum": "$a"},
                        "mx": {"$max": "$a"},
                        "n": {"$sum": 1}}},
            {"$sort": {"_id": 1}},
        ])
        by = {d["_id"]: d for d in out}
        assert by["x"]["total"] == 30 and by["x"]["mx"] == 25 and by["x"]["n"] == 2
        assert by["y"]["total"] == 15
        # $sum over null-only group → 0 (Mongo), $max → None
        assert by["z"]["total"] == 0 and by["z"]["mx"] is None

    def test_group_null_id(self):
        out = run([{"$group": {"_id": None, "n": {"$sum": 1}}}])
        assert out == [{"_id": None, "n": 4}]

    def test_avg_skips_nulls(self):
        out = run([{"$group": {"_id": None, "m": {"$avg": "$a"}}}])
        assert out[0]["m"] == pytest.approx(15.0)

    def test_unwind(self):
        out = run([{"$unwind": "$tags"}, {"$project": {"_id": 1, "tags": 1}}])
        # empty/missing arrays drop the doc
        assert [(d["_id"], d["tags"]) for d in out] == [(1, "p"), (1, "q"), (2, "q")]

    def test_sample_deterministic_with_seed(self):
        a = list(run_pipeline(DOCS, [{"$sample": {"size": 2}}], seed=7))
        b = list(run_pipeline(DOCS, [{"$sample": {"size": 2}}], seed=7))
        assert a == b and len(a) == 2

    def test_expr_in_match(self):
        out = run([{"$match": {"$expr": {"$gt": [{"$strLenCP": "$b"}, 0]}}}])
        assert len(out) == 4

    def test_skip(self):
        out = run([{"$sort": {"_id": 1}}, {"$skip": 2}, {"$project": {"_id": 1}}])
        assert [d["_id"] for d in out] == [3, 4]

    def test_dates_compare(self):
        docs = [{"_id": 1, "d": dt.datetime(2023, 1, 1)},
                {"_id": 2, "d": dt.datetime(2024, 1, 1)}]
        out = run([{"$match": {"d": {"$gt": dt.datetime(2023, 6, 1)}}}], docs)
        assert [d["_id"] for d in out] == [2]


ORDERS = [
    {"_id": 1, "cust": 10, "total": 5.0},
    {"_id": 2, "cust": 20, "total": 7.0},
    {"_id": 3, "cust": 10, "total": 1.0},
    {"_id": 4, "cust": None, "total": 0.0},
    {"_id": 5, "total": 9.0},  # cust missing
]
CUSTOMERS = [
    {"_id": 10, "name": "ann"},
    {"_id": 20, "name": "bob"},
    {"_id": 30, "name": "cid", "alt": [10, 20]},
    {"_id": 40, "name": "nul", "flag": None},
]


def _colls(name):
    return {"orders": ORDERS, "customers": CUSTOMERS}[name]


class TestLookupStages:
    def test_lookup_basic_equality(self):
        out = run_pipeline(
            ORDERS,
            [{"$lookup": {"from": "customers", "localField": "cust",
                          "foreignField": "_id", "as": "c"}}],
            collections=_colls,
        )
        by_id = {d["_id"]: d for d in out}
        assert [c["name"] for c in by_id[1]["c"]] == ["ann"]
        assert [c["name"] for c in by_id[2]["c"]] == ["bob"]

    def test_lookup_null_matches_null_and_missing(self):
        out = run_pipeline(
            ORDERS,
            [{"$lookup": {"from": "customers", "localField": "cust",
                          "foreignField": "flag", "as": "c"}}],
            collections=_colls,
        )
        by_id = {d["_id"]: d for d in out}
        # cust=None and cust-missing both equality-match flag=None AND
        # flag-missing foreign docs (MongoDB null/missing rule)
        assert {c["_id"] for c in by_id[4]["c"]} == {10, 20, 30, 40}
        assert {c["_id"] for c in by_id[5]["c"]} == {10, 20, 30, 40}
        assert by_id[1]["c"] == []  # cust=10 matches no flag

    def test_lookup_array_foreign_field_matches_elements(self):
        out = run_pipeline(
            [{"_id": 1, "k": 10}],
            [{"$lookup": {"from": "customers", "localField": "k",
                          "foreignField": "alt", "as": "c"}}],
            collections=_colls,
        )
        assert [c["_id"] for c in out[0]["c"]] == [30]  # alt contains 10

    def test_lookup_numeric_cross_type(self):
        out = run_pipeline(
            [{"_id": 1, "k": 10.0}],
            [{"$lookup": {"from": "customers", "localField": "k",
                          "foreignField": "_id", "as": "c"}}],
            collections=_colls,
        )
        assert [c["name"] for c in out[0]["c"]] == ["ann"]  # 10.0 == 10

    def test_lookup_then_unwind_join_shape(self):
        out = run_pipeline(
            ORDERS,
            [
                {"$lookup": {"from": "customers", "localField": "cust",
                             "foreignField": "_id", "as": "c"}},
                {"$unwind": "$c"},
                {"$project": {"_id": 1, "name": "$c.name", "total": 1}},
                {"$sort": {"_id": 1}},
            ],
            collections=_colls,
        )
        assert [(d["_id"], d["name"]) for d in out] == [
            (1, "ann"), (2, "bob"), (3, "ann")]

    def test_lookup_pipeline_form_no_let(self):
        out = run_pipeline(
            [{"_id": 1}],
            [{"$lookup": {"from": "customers", "as": "big",
                          "pipeline": [{"$match": {"_id": {"$gt": 15}}},
                                       {"$sort": {"_id": 1}}]}}],
            collections=_colls,
        )
        assert [c["_id"] for c in out[0]["big"]] == [20, 30, 40]

    def test_lookup_requires_resolver(self):
        with pytest.raises(ValueError, match="collections resolver"):
            run([{"$lookup": {"from": "x", "localField": "a",
                              "foreignField": "b", "as": "j"}}])

    def test_replace_root_and_with(self):
        docs = [{"_id": 1, "n": {"c": 1, "d": 2}}]
        out = run([{"$replaceRoot": {"newRoot": "$n"}}], docs)
        assert out == [{"c": 1, "d": 2}]
        out = run([{"$replaceWith": "$n"}], docs)
        assert out == [{"c": 1, "d": 2}]
        with pytest.raises(ValueError, match="document"):
            run([{"$replaceRoot": {"newRoot": "$_id"}}], docs)

    def test_sort_by_count(self):
        out = run([{"$sortByCount": "$b"}])
        assert out == [
            {"_id": "x", "count": 2},
            {"_id": "y", "count": 1},
            {"_id": "z", "count": 1},
        ]

    def test_facet_runs_sub_pipelines_over_same_input(self):
        out = run([{"$facet": {
            "by_b": [{"$sortByCount": "$b"}],
            "big_a": [{"$match": {"a": {"$gt": 10}}},
                      {"$project": {"_id": 1}}, {"$sort": {"_id": 1}}],
        }}])
        assert len(out) == 1
        assert out[0]["by_b"][0] == {"_id": "x", "count": 2}
        assert out[0]["big_a"] == [{"_id": 2}, {"_id": 3}]

    def test_bucket_boundaries_inclusive_exclusive(self):
        out = run([{"$bucket": {
            "groupBy": "$a", "boundaries": [0, 10, 20], "default": "other",
            "output": {"count": {"$sum": 1}, "avg_a": {"$avg": "$a"}},
        }}])
        by_id = {d["_id"]: d for d in out}
        assert by_id[0]["count"] == 1 and by_id[0]["avg_a"] == 5     # a=5
        assert by_id[10]["count"] == 1 and by_id[10]["avg_a"] == 15  # a=15
        assert by_id["other"]["count"] == 2  # a=25 (>= upper), a=None

    def test_bucket_no_default_raises_on_out_of_range(self):
        with pytest.raises(ValueError, match="outside boundaries"):
            run([{"$bucket": {"groupBy": "$a", "boundaries": [0, 10]}}])

    def test_bucket_boundary_value_goes_to_lower_bin(self):
        out = run(
            [{"$bucket": {"groupBy": "$v", "boundaries": [0, 10, 20]}}],
            [{"v": 10}, {"v": 0}, {"v": 19}],
        )
        assert out == [{"_id": 0, "count": 1}, {"_id": 10, "count": 2}]

    def test_stddev_accumulators(self):
        import statistics

        docs = [{"g": 1, "v": x} for x in (2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0)]
        docs += [{"g": 2, "v": 3.0}, {"g": 2, "v": "skip-me"}, {"g": 3}]
        out = {d["_id"]: d for d in run(
            [{"$group": {"_id": "$g",
                         "sp": {"$stdDevPop": "$v"},
                         "ss": {"$stdDevSamp": "$v"}}}], docs)}
        vals = [2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0]
        assert out[1]["sp"] == pytest.approx(statistics.pstdev(vals))
        assert out[1]["ss"] == pytest.approx(statistics.stdev(vals))
        assert out[2]["sp"] == 0.0 and out[2]["ss"] is None  # single value
        assert out[3]["sp"] is None and out[3]["ss"] is None  # no numerics

    def test_merge_objects_accumulator(self):
        docs = [
            {"g": 1, "m": {"a": 1, "b": 2}},
            {"g": 1, "m": {"b": 9, "c": 3}},
            {"g": 1, "m": None},
            {"g": 2},
        ]
        out = {d["_id"]: d for d in run(
            [{"$group": {"_id": "$g", "m": {"$mergeObjects": "$m"}}}], docs)}
        assert out[1]["m"] == {"a": 1, "b": 9, "c": 3}  # later docs win
        assert out[2]["m"] == {}  # nothing merged -> empty doc

    def test_fake_mongo_client_resolves_lookup(self):
        from duckdb_mongo_spark.testing.fake_mongo import FakeMongoClient

        client = FakeMongoClient()
        client["db"]["orders"].insert_many([dict(d) for d in ORDERS])
        client["db"]["customers"].insert_many([dict(d) for d in CUSTOMERS])
        out = list(client["db"]["orders"].aggregate([
            {"$match": {"cust": {"$ne": None}}},
            {"$lookup": {"from": "customers", "localField": "cust",
                         "foreignField": "_id", "as": "c"}},
            {"$unwind": "$c"},
            {"$sortByCount": "$c.name"},
        ]))
        assert out == [{"_id": "ann", "count": 2}, {"_id": "bob", "count": 1}]

    def test_backend_aggregate_wires_lookup(self):
        from duckdb_mongo_spark.backends import MemoryBackend

        be = MemoryBackend()
        be.insert_many("db", "orders", [dict(d) for d in ORDERS])
        be.insert_many("db", "customers", [dict(d) for d in CUSTOMERS])
        out = list(be.aggregate("db", "orders", [
            {"$match": {"cust": {"$ne": None}}},
            {"$lookup": {"from": "customers", "localField": "cust",
                         "foreignField": "_id", "as": "c"}},
            {"$unwind": "$c"},
            {"$sortByCount": "$c.name"},
        ]))
        assert out == [{"_id": "ann", "count": 2}, {"_id": "bob", "count": 1}]


class TestAdviceFixes:
    """Regressions from round-1 ADVICE: dotted $project nesting and
    $unwind preserveNullAndEmptyArrays MongoDB parity."""

    def test_project_dotted_inclusion_rebuilds_nesting(self):
        docs = [{"_id": 1, "address": {"city": "Oslo", "zip": "0150"}}]
        out = run_pipeline(docs, [{"$project": {"address.city": 1}}])
        # mongod returns nested structure, not a literal dotted key
        assert out == [{"_id": 1, "address": {"city": "Oslo"}}]

    def test_project_dotted_computed_rebuilds_nesting(self):
        docs = [{"_id": 1, "a": 2}]
        out = run_pipeline(docs, [{"$project": {"x.y": {"$add": ["$a", 1]}}}])
        assert out == [{"_id": 1, "x": {"y": 3}}]

    def test_unwind_preserve_keeps_null_value(self):
        docs = [{"_id": 1, "tags": None}, {"_id": 2, "tags": ["a"]}]
        out = run_pipeline(
            docs,
            [{"$unwind": {"path": "$tags", "preserveNullAndEmptyArrays": True}}],
        )
        # MongoDB keeps null as-is (the old behavior dropped the field)
        assert out == [{"_id": 1, "tags": None}, {"_id": 2, "tags": "a"}]

    def test_unwind_preserve_removes_empty_array_leaf_dotted(self):
        docs = [{"_id": 1, "a": {"b": [], "c": 9}}]
        out = run_pipeline(
            docs,
            [{"$unwind": {"path": "$a.b", "preserveNullAndEmptyArrays": True}}],
        )
        # empty array: leaf removed (dotted-path aware), siblings kept
        assert out == [{"_id": 1, "a": {"c": 9}}]

    def test_unwind_preserve_keeps_missing(self):
        docs = [{"_id": 1}]
        out = run_pipeline(
            docs,
            [{"$unwind": {"path": "$tags", "preserveNullAndEmptyArrays": True}}],
        )
        assert out == [{"_id": 1}]

    def test_convert_on_error_null(self):
        """$convert honors onError/onNull; $toLong/$toInt/$toDouble yield
        null on conversion failure (the $convert onError:null behavior the
        Cast compiler emits) instead of raising (ADVICE r2)."""
        from duckdb_mongo_spark.mql.expr import eval_expr

        conv = {"$convert": {"input": "$s", "to": "long", "onError": None}}
        assert eval_expr(conv, {"s": "5"}) == 5
        assert eval_expr(conv, {"s": "9.9"}) == 9        # truncates like CAST
        assert eval_expr(conv, {"s": "abc"}) is None
        assert eval_expr(conv, {"s": None}) is None
        assert eval_expr(
            {"$convert": {"input": "$s", "to": "long", "onError": -1}},
            {"s": "abc"},
        ) == -1
        assert eval_expr(
            {"$convert": {"input": "$s", "to": "long", "onNull": 0}}, {}
        ) == 0
        with pytest.raises((TypeError, ValueError)):
            eval_expr({"$convert": {"input": "$s", "to": "long"}}, {"s": "abc"})

    def test_to_numeric_null_on_failure(self):
        from duckdb_mongo_spark.mql.expr import eval_expr

        assert eval_expr({"$toLong": "$s"}, {"s": "abc"}) is None
        assert eval_expr({"$toInt": "$s"}, {"s": "x"}) is None
        assert eval_expr({"$toDouble": "$s"}, {"s": "x"}) is None
        assert eval_expr({"$toLong": "$s"}, {"s": "7"}) == 7
        assert eval_expr({"$toDouble": "$s"}, {"s": "2.5"}) == 2.5


class TestRound4AdviceFixes:
    """Round-3 ADVICE regressions: $lookup big-int64 key exactness,
    Welford stddev stability, cross-type numeric group keys."""

    def test_lookup_big_int64_keys_do_not_collapse(self):
        # 2^60 and 2^60+1 differ beyond float53 precision; a float-based
        # hash key would falsely join both. mongod compares exactly.
        big = 2 ** 60
        local = [{"_id": 1, "k": big}, {"_id": 2, "k": big + 1}]
        foreign = [{"_id": "a", "fk": big}, {"_id": "b", "fk": big + 1}]
        out = run_pipeline(
            local,
            [{"$lookup": {"from": "f", "localField": "k",
                          "foreignField": "fk", "as": "m"}}],
            collections=lambda name: foreign,
        )
        assert [[m["_id"] for m in d["m"]] for d in out] == [["a"], ["b"]]

    def test_lookup_cross_type_numeric_equality_kept(self):
        local = [{"_id": 1, "k": 1}, {"_id": 2, "k": 2.5}]
        foreign = [{"_id": "i", "fk": 1.0}, {"_id": "f", "fk": 2.5}]
        out = run_pipeline(
            local,
            [{"$lookup": {"from": "f", "localField": "k",
                          "foreignField": "fk", "as": "m"}}],
            collections=lambda name: foreign,
        )
        assert [[m["_id"] for m in d["m"]] for d in out] == [["i"], ["f"]]

    def test_stddev_no_catastrophic_cancellation(self):
        import statistics

        # mean 1e9, stdev 0.5: sum-of-squares form loses ~all precision
        vals = [1e9 + 0.5, 1e9 - 0.5] * 50
        docs = [{"g": 1, "v": v} for v in vals]
        out = run([{"$group": {"_id": "$g",
                               "sp": {"$stdDevPop": "$v"},
                               "ss": {"$stdDevSamp": "$v"}}}], docs)
        assert out[0]["sp"] == pytest.approx(statistics.pstdev(vals), rel=1e-9)
        assert out[0]["ss"] == pytest.approx(statistics.stdev(vals), rel=1e-9)

    def test_group_key_cross_type_numeric(self):
        # mongod groups 1 and 1.0 (and Decimal 1) into ONE group
        from decimal import Decimal

        docs = [{"k": 1, "v": 1}, {"k": 1.0, "v": 2}, {"k": Decimal("1"), "v": 4}]
        out = run([{"$group": {"_id": "$k", "s": {"$sum": "$v"}}}], docs)
        assert len(out) == 1 and out[0]["s"] == 7

    def test_add_to_set_cross_type_numeric_dedup(self):
        docs = [{"g": 1, "v": 1}, {"g": 1, "v": 1.0}, {"g": 1, "v": 2}]
        out = run([{"$group": {"_id": "$g", "s": {"$addToSet": "$v"}}}], docs)
        assert sorted(out[0]["s"], key=float) == [1, 2]


class TestArrayExpressionOperators:
    """r4 additions: $map/$filter/$reduce/$concatArrays with $$-variable
    frames (the operators the $facet-flattening ledger entry executes)."""

    def test_map_with_variable(self):
        from duckdb_mongo_spark.mql.expr import eval_expr

        doc = {"xs": [1, 2, 3]}
        assert eval_expr(
            {"$map": {"input": "$xs", "as": "x",
                      "in": {"$multiply": ["$$x", 10]}}}, doc
        ) == [10, 20, 30]
        # default variable name is `this`
        assert eval_expr(
            {"$map": {"input": "$xs", "in": {"$add": ["$$this", 1]}}}, doc
        ) == [2, 3, 4]

    def test_map_builds_documents_with_dotted_var_paths(self):
        from duckdb_mongo_spark.mql.expr import eval_expr

        doc = {"ys": [{"k": "a", "n": 1}, {"k": "b", "n": 2}]}
        assert eval_expr(
            {"$map": {"input": "$ys", "as": "d",
                      "in": {"key": "$$d.k", "n2": {"$add": ["$$d.n", 1]}}}},
            doc,
        ) == [{"key": "a", "n2": 2}, {"key": "b", "n2": 3}]

    def test_nested_map_rebinds_innermost(self):
        from duckdb_mongo_spark.mql.expr import eval_expr

        doc = {"xs": [1, 2]}
        out = eval_expr(
            {"$map": {"input": "$xs", "as": "o",
                      "in": {"$map": {"input": "$xs", "as": "i",
                                      "in": {"$add": ["$$o", "$$i"]}}}}},
            doc,
        )
        assert out == [[2, 3], [3, 4]]

    def test_undefined_variable_raises(self):
        from duckdb_mongo_spark.mql.expr import eval_expr

        with pytest.raises(ValueError, match="undefined"):
            eval_expr({"$map": {"input": "$xs", "as": "x", "in": "$$nope"}},
                      {"xs": [1]})

    def test_concat_arrays_and_null(self):
        from duckdb_mongo_spark.mql.expr import eval_expr

        doc = {"a": [1], "b": [2, 3]}
        assert eval_expr({"$concatArrays": ["$a", "$b", [4]]}, doc) == [1, 2, 3, 4]
        assert eval_expr({"$concatArrays": ["$a", "$missing"]}, doc) is None

    def test_filter_with_limit(self):
        from duckdb_mongo_spark.mql.expr import eval_expr

        doc = {"xs": [5, 1, 6, 7]}
        assert eval_expr(
            {"$filter": {"input": "$xs", "as": "x",
                         "cond": {"$gte": ["$$x", 5]}}}, doc
        ) == [5, 6, 7]
        assert eval_expr(
            {"$filter": {"input": "$xs", "cond": {"$gte": ["$$this", 5]},
                         "limit": 2}}, doc
        ) == [5, 6]

    def test_reduce(self):
        from duckdb_mongo_spark.mql.expr import eval_expr

        doc = {"words": ["a", "b", "c"]}
        assert eval_expr(
            {"$reduce": {"input": "$words", "initialValue": "",
                         "in": {"$concat": ["$$value", "$$this"]}}}, doc
        ) == "abc"

    def test_root_and_current(self):
        from duckdb_mongo_spark.mql.expr import eval_expr

        assert eval_expr("$$ROOT", {"a": 1}) == {"a": 1}
        assert eval_expr("$$CURRENT.a", {"a": 1}) == 1

    def test_facet_flattening_pipeline(self):
        # the exact stage composition the mongo_pipeline_facet ledger
        # entry runs: $facet -> $project($concatArrays($map)) -> $unwind
        # -> $replaceRoot
        docs = [{"s": "A", "v": 5}, {"s": "A", "v": 15}, {"s": "B", "v": 25}]
        out = run_pipeline(docs, [
            {"$facet": {
                "by_s": [{"$sortByCount": "$s"}],
                "bins": [{"$bucket": {"groupBy": "$v",
                                      "boundaries": [0, 10, 20],
                                      "default": "other"}}],
            }},
            {"$project": {"_id": 0, "rows": {"$concatArrays": [
                {"$map": {"input": "$by_s", "as": "d",
                          "in": {"facet": "by_s",
                                 "key": {"$toString": "$$d._id"},
                                 "n": "$$d.count"}}},
                {"$map": {"input": "$bins", "as": "d",
                          "in": {"facet": "bins",
                                 "key": {"$toString": "$$d._id"},
                                 "n": "$$d.count"}}},
            ]}}},
            {"$unwind": "$rows"},
            {"$replaceRoot": {"newRoot": "$rows"}},
        ])
        assert sorted(out, key=lambda d: (d["facet"], d["key"])) == [
            {"facet": "bins", "key": "0", "n": 1},
            {"facet": "bins", "key": "10", "n": 1},
            {"facet": "bins", "key": "other", "n": 1},
            {"facet": "by_s", "key": "A", "n": 2},
            {"facet": "by_s", "key": "B", "n": 1},
        ]


class TestRound4DialectBatch:
    """$unset/$unionWith/$bucketAuto stages + the array/set/object/switch
    expression batch."""

    def test_unset_stage(self):
        docs = [{"_id": 1, "a": 1, "n": {"x": 1, "y": 2}}]
        assert run_pipeline(docs, [{"$unset": "a"}]) == [{"_id": 1, "n": {"x": 1, "y": 2}}]
        assert run_pipeline(docs, [{"$unset": ["a", "n.x"]}]) == [{"_id": 1, "n": {"y": 2}}]

    def test_union_with(self):
        out = run_pipeline(
            [{"a": 1}],
            [{"$unionWith": {"coll": "other", "pipeline": [{"$match": {"b": {"$gt": 1}}}]}}],
            collections=lambda n: [{"b": 1}, {"b": 2}],
        )
        assert out == [{"a": 1}, {"b": 2}]
        # bare string form unions the whole collection
        out = run_pipeline([{"a": 1}], [{"$unionWith": "other"}],
                           collections=lambda n: [{"b": 9}])
        assert out == [{"a": 1}, {"b": 9}]

    def test_union_with_requires_resolver(self):
        with pytest.raises(ValueError, match="resolver"):
            run_pipeline([{"a": 1}], [{"$unionWith": "other"}])

    def test_bucket_auto_even_split(self):
        docs = [{"v": i} for i in range(10)]
        out = run_pipeline(docs, [{"$bucketAuto": {"groupBy": "$v", "buckets": 3}}])
        assert [d["count"] for d in out] == [4, 3, 3]
        assert out[0]["_id"] == {"min": 0, "max": 4}
        assert out[-1]["_id"]["max"] == 9  # last max inclusive = max value

    def test_bucket_auto_equal_keys_stay_together(self):
        docs = [{"v": x} for x in [1, 1, 1, 1, 2, 3]]
        out = run_pipeline(docs, [{"$bucketAuto": {"groupBy": "$v", "buckets": 3}}])
        assert [d["count"] for d in out] == [4, 2]

    def test_bucket_auto_null_keys_go_to_first_bucket(self):
        # r4 advice (low): mongod INCLUDES null/missing groupBy values —
        # they sort lowest (BSON order) and land in the first bucket,
        # whose min is then null; previously they were silently dropped
        docs = [{"v": None}, {"w": 1}, {"v": 1}, {"v": 2}, {"v": 3}, {"v": 4}]
        out = run_pipeline(docs, [{"$bucketAuto": {"groupBy": "$v", "buckets": 3}}])
        assert [d["count"] for d in out] == [2, 2, 2]
        assert out[0]["_id"] == {"min": None, "max": 1}
        assert out[-1]["_id"]["max"] == 4

    def test_bucket_auto_output_spec(self):
        docs = [{"v": i, "w": 10 * i} for i in range(4)]
        out = run_pipeline(docs, [{"$bucketAuto": {
            "groupBy": "$v", "buckets": 2, "output": {"s": {"$sum": "$w"}}}}])
        assert [d["s"] for d in out] == [10, 50]

    def test_expression_batch(self):
        from duckdb_mongo_spark.mql.expr import eval_expr

        d = {"xs": [3, 1, 2, 1], "ys": [2, 4], "m": {"a": 1}}
        assert eval_expr({"$range": [0, 6, 2]}, d) == [0, 2, 4]
        assert eval_expr({"$zip": {"inputs": ["$xs", "$ys"]}}, d) == [[3, 2], [1, 4]]
        assert eval_expr({"$slice": ["$xs", -2]}, d) == [2, 1]
        assert eval_expr({"$slice": ["$xs", 1, 2]}, d) == [1, 2]
        assert eval_expr({"$indexOfArray": ["$xs", 1]}, d) == 1
        assert eval_expr({"$indexOfArray": ["$xs", 9]}, d) == -1
        assert eval_expr({"$isArray": "$xs"}, d) is True
        assert eval_expr({"$isNumber": 1.5}, d) is True
        assert eval_expr({"$isNumber": True}, d) is False

    def test_set_operators_mql_equality(self):
        from duckdb_mongo_spark.mql.expr import eval_expr

        # 1 and 1.0 are ONE set member under MQL equality
        d = {"a": [1, 1.0, 2], "b": [2.0, 3]}
        assert eval_expr({"$setUnion": ["$a", "$b"]}, d) == [1, 2, 3]
        assert eval_expr({"$setIntersection": ["$a", "$b"]}, d) == [2]
        assert eval_expr({"$setDifference": ["$a", "$b"]}, d) == [1]
        assert eval_expr({"$setUnion": ["$a", "$missing"]}, d) is None

    def test_object_array_round_trip(self):
        from duckdb_mongo_spark.mql.expr import eval_expr

        d = {"m": {"a": 1, "b": 2}}
        arr = eval_expr({"$objectToArray": "$m"}, d)
        assert arr == [{"k": "a", "v": 1}, {"k": "b", "v": 2}]
        assert eval_expr({"$arrayToObject": [arr]}, {}) == {"a": 1, "b": 2}

    def test_switch(self):
        from duckdb_mongo_spark.mql.expr import eval_expr

        sw = {"$switch": {
            "branches": [
                {"case": {"$lt": ["$v", 10]}, "then": "small"},
                {"case": {"$lt": ["$v", 100]}, "then": "medium"},
            ],
            "default": "large",
        }}
        assert eval_expr(sw, {"v": 5}) == "small"
        assert eval_expr(sw, {"v": 50}) == "medium"
        assert eval_expr(sw, {"v": 500}) == "large"
        with pytest.raises(ValueError, match="no branch"):
            eval_expr({"$switch": {"branches": [
                {"case": False, "then": 1}]}}, {})


class TestSetWindowFields:
    DOCS = [
        {"_id": 1, "g": "a", "v": 10}, {"_id": 2, "g": "a", "v": 30},
        {"_id": 3, "g": "a", "v": 20}, {"_id": 4, "g": "b", "v": 5},
        {"_id": 5, "g": "b", "v": 5},
    ]

    def test_running_and_total_sums(self):
        out = run_pipeline(self.DOCS, [{"$setWindowFields": {
            "partitionBy": "$g", "sortBy": {"v": 1},
            "output": {
                "running": {"$sum": "$v",
                            "window": {"documents": ["unbounded", "current"]}},
                "total": {"$sum": "$v"},
            }}}])
        a = [d for d in out if d["g"] == "a"]
        assert [d["running"] for d in a] == [10, 30, 60]
        assert all(d["total"] == 60 for d in a)
        b = [d for d in out if d["g"] == "b"]
        assert [d["running"] for d in b] == [5, 10] and all(d["total"] == 10 for d in b)

    def test_rank_dense_rank_document_number_ties(self):
        out = run_pipeline(self.DOCS, [{"$setWindowFields": {
            "partitionBy": "$g", "sortBy": {"v": 1},
            "output": {"r": {"$rank": {}}, "dr": {"$denseRank": {}},
                       "n": {"$documentNumber": {}}}}}])
        b = [d for d in out if d["g"] == "b"]
        assert [(d["r"], d["dr"], d["n"]) for d in b] == [(1, 1, 1), (1, 1, 2)]
        docs = [{"g": 1, "v": x} for x in (1, 2, 2, 3)]
        out = run_pipeline(docs, [{"$setWindowFields": {
            "sortBy": {"v": 1},
            "output": {"r": {"$rank": {}}, "dr": {"$denseRank": {}}}}}])
        assert [d["r"] for d in out] == [1, 2, 2, 4]
        assert [d["dr"] for d in out] == [1, 2, 2, 3]

    def test_shift_and_moving_average(self):
        out = run_pipeline(self.DOCS, [{"$setWindowFields": {
            "partitionBy": "$g", "sortBy": {"v": 1},
            "output": {
                "prev": {"$shift": {"output": "$v", "by": -1, "default": -1}},
                "mavg": {"$avg": "$v", "window": {"documents": [-1, 1]}},
            }}}])
        a = [d for d in out if d["g"] == "a"]
        assert [d["prev"] for d in a] == [-1, 10, 20]
        assert [d["mavg"] for d in a] == [15.0, 20.0, 25.0]

    def test_count_window_and_no_partition(self):
        docs = [{"v": i} for i in range(4)]
        out = run_pipeline(docs, [{"$setWindowFields": {
            "sortBy": {"v": 1},
            "output": {"c": {"$count": {},
                             "window": {"documents": ["unbounded", "current"]}}},
        }}])
        assert [d["c"] for d in out] == [1, 2, 3, 4]

    def test_window_entirely_past_partition_end(self):
        # r4 advice (medium): a documents window lying wholly past the
        # partition end must be EMPTY — $count returned -1 on the last
        # row ([2,5] at i=3 of 4) when start wasn't clamped before the
        # max(start, end) resolution; mongod returns 0 there
        docs = [{"v": i} for i in range(4)]
        out = run_pipeline(docs, [{"$setWindowFields": {
            "sortBy": {"v": 1},
            "output": {
                "c": {"$count": {}, "window": {"documents": [2, 5]}},
                "s": {"$sum": "$v", "window": {"documents": [2, 5]}},
            },
        }}])
        assert [d["c"] for d in out] == [2, 1, 0, 0]
        assert [d["s"] for d in out] == [5, 3, 0, 0]
        # same for a window wholly BEFORE the partition start
        out = run_pipeline(docs, [{"$setWindowFields": {
            "sortBy": {"v": 1},
            "output": {"c": {"$count": {},
                             "window": {"documents": [-5, -2]}}},
        }}])
        assert [d["c"] for d in out] == [0, 0, 1, 2]

    def test_empty_window_accumulator_identities(self):
        # r4 advice (low): mongod's empty-window identities are 0 for
        # $sum, [] for $push/$addToSet, null for the rest
        docs = [{"v": i} for i in range(3)]
        out = run_pipeline(docs, [{"$setWindowFields": {
            "sortBy": {"v": 1},
            "output": {
                "s": {"$sum": "$v", "window": {"documents": [1, 2]}},
                "p": {"$push": "$v", "window": {"documents": [1, 2]}},
                "st": {"$addToSet": "$v", "window": {"documents": [1, 2]}},
                "a": {"$avg": "$v", "window": {"documents": [1, 2]}},
                "mx": {"$max": "$v", "window": {"documents": [1, 2]}},
            },
        }}])
        last = out[-1]
        assert last["s"] == 0
        assert last["p"] == [] and last["st"] == []
        assert last["a"] is None and last["mx"] is None
        assert out[0]["p"] == [1, 2]

    def test_rank_requires_sort_by(self):
        with pytest.raises(ValueError, match="requires sortBy"):
            run_pipeline([{"v": 1}], [{"$setWindowFields": {
                "output": {"r": {"$rank": {}}}}}])

    def test_dotted_output_path(self):
        out = run_pipeline([{"v": 1}], [{"$setWindowFields": {
            "sortBy": {"v": 1}, "output": {"stats.total": {"$sum": "$v"}}}}])
        assert out == [{"v": 1, "stats": {"total": 1}}]


class TestDensifyFillGraphLookup:
    """r5 dialect growth: $densify / $fill / $graphLookup (public mongod
    stage semantics; deterministic order refinements documented in the
    implementations)."""

    def test_densify_numeric_partition_bounds(self):
        docs = [
            {"k": "a", "x": 0}, {"k": "a", "x": 3},
            {"k": "b", "x": 10}, {"k": "b", "x": 12},
        ]
        out = run_pipeline(docs, [{"$densify": {
            "field": "x", "partitionByFields": ["k"],
            "range": {"step": 1, "bounds": "partition"},
        }}])
        got = [(d["k"], d["x"]) for d in out]
        assert got == [("a", 0), ("a", 1), ("a", 2), ("a", 3),
                       ("b", 10), ("b", 11), ("b", 12)]
        # generated docs carry ONLY partition fields + the grid value
        gen = [d for d in out if d["x"] == 1]
        assert gen == [{"k": "a", "x": 1}]

    def test_densify_full_bounds_spans_partitions(self):
        docs = [{"k": "a", "x": 0}, {"k": "b", "x": 2}]
        out = run_pipeline(docs, [{"$densify": {
            "field": "x", "partitionByFields": ["k"],
            "range": {"step": 1, "bounds": "full"},
        }}])
        got = sorted((d["k"], d["x"]) for d in out)
        assert got == [("a", 0), ("a", 1), ("a", 2),
                       ("b", 0), ("b", 1), ("b", 2)]

    def test_densify_explicit_bounds_half_open(self):
        docs = [{"x": 5}]
        out = run_pipeline(docs, [{"$densify": {
            "field": "x", "range": {"step": 2, "bounds": [0, 7]},
        }}])
        assert [d["x"] for d in out] == [0, 2, 4, 5, 6]  # 7 excluded

    def test_densify_time_units(self):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 31)
        docs = [{"t": t0}, {"t": dt.datetime(2024, 4, 30)}]
        out = run_pipeline(docs, [{"$densify": {
            "field": "t", "range": {"step": 1, "unit": "month",
                                    "bounds": "partition"},
        }}])
        # day clamps: Jan 31 -> Feb 29 (leap) -> Mar 29 -> Apr 29 + Apr 30 doc
        assert [d["t"].strftime("%m-%d") for d in out] == [
            "01-31", "02-29", "03-29", "04-29", "04-30"]
        docs = [{"t": dt.datetime(2024, 1, 1, 0, 0, 0)},
                {"t": dt.datetime(2024, 1, 1, 0, 3, 0)}]
        out = run_pipeline(docs, [{"$densify": {
            "field": "t", "range": {"step": 90, "unit": "second",
                                    "bounds": "partition"},
        }}])
        assert [d["t"].strftime("%M:%S") for d in out] == ["00:00", "01:30", "03:00"]

    def test_densify_missing_field_passes_through(self):
        docs = [{"y": 1}, {"x": 0}, {"x": 2}]
        out = run_pipeline(docs, [{"$densify": {
            "field": "x", "range": {"step": 1, "bounds": "partition"}}}])
        assert out[0] == {"y": 1}
        assert [d["x"] for d in out[1:]] == [0, 1, 2]
        with pytest.raises(ValueError, match="step"):
            run_pipeline(docs, [{"$densify": {
                "field": "x", "range": {"step": 0, "bounds": "partition"}}}])

    def test_fill_value_and_locf(self):
        docs = [
            {"k": "a", "t": 1, "v": 5, "w": None},
            {"k": "a", "t": 2, "v": None, "w": None},
            {"k": "a", "t": 3, "v": 8, "w": 1},
            {"k": "b", "t": 1, "v": None, "w": None},
        ]
        out = run_pipeline(docs, [{"$fill": {
            "partitionByFields": ["k"], "sortBy": {"t": 1},
            "output": {"v": {"method": "locf"}, "w": {"value": -1}},
        }}])
        a = [d for d in out if d["k"] == "a"]
        assert [d["v"] for d in a] == [5, 5, 8]  # carried forward
        assert [d["w"] for d in a] == [-1, -1, 1]
        b = [d for d in out if d["k"] == "b"]
        assert b[0]["v"] is None  # nothing observed yet stays null

    def test_fill_linear_interpolation(self):
        docs = [
            {"t": 0, "v": 0.0}, {"t": 1, "v": None}, {"t": 3, "v": None},
            {"t": 4, "v": 8.0}, {"t": 5, "v": None},
        ]
        out = run_pipeline(docs, [{"$fill": {
            "sortBy": {"t": 1}, "output": {"v": {"method": "linear"}},
        }}])
        assert [d["v"] for d in out] == [0.0, 2.0, 6.0, 8.0, None]
        with pytest.raises(ValueError, match="sortBy"):
            run_pipeline(docs, [{"$fill": {
                "output": {"v": {"method": "locf"}}}}])

    GRAPH = [
        {"_id": 1, "name": "root", "reports_to": None},
        {"_id": 2, "name": "mid", "reports_to": "root"},
        {"_id": 3, "name": "leaf_a", "reports_to": "mid"},
        {"_id": 4, "name": "leaf_b", "reports_to": "mid"},
        {"_id": 5, "name": "other", "reports_to": "stranger"},
    ]

    def _resolver(self):
        return lambda name: {"people": [dict(d) for d in self.GRAPH]}[name]

    def test_graph_lookup_bfs_with_depth(self):
        out = run_pipeline(
            [{"start": "mid"}],
            [{"$graphLookup": {
                "from": "people", "startWith": "$start",
                "connectFromField": "reports_to", "connectToField": "name",
                "as": "chain", "depthField": "d",
            }}],
            collections=self._resolver(),
        )
        chain = [(c["name"], c["d"]) for c in out[0]["chain"]]
        assert chain == [("mid", 0), ("root", 1)]

    def test_graph_lookup_downward_fanout_and_max_depth(self):
        # reversed direction: who (transitively) reports to root?
        base = [{"start": "root"}]
        spec = {
            "from": "people", "startWith": "$start",
            "connectFromField": "name", "connectToField": "reports_to",
            "as": "subs",
        }
        out = run_pipeline(base, [{"$graphLookup": dict(spec)}],
                           collections=self._resolver())
        assert [c["name"] for c in out[0]["subs"]] == ["mid", "leaf_a", "leaf_b"]
        out = run_pipeline(
            base, [{"$graphLookup": {**spec, "maxDepth": 0}}],
            collections=self._resolver(),
        )
        assert [c["name"] for c in out[0]["subs"]] == ["mid"]

    def test_graph_lookup_restrict_and_array_start(self):
        out = run_pipeline(
            [{"s": ["leaf_a", "stranger"]}],
            [{"$graphLookup": {
                "from": "people", "startWith": "$s",
                "connectFromField": "reports_to", "connectToField": "name",
                "as": "found",
                "restrictSearchWithMatch": {"name": {"$ne": "root"}},
            }}],
            collections=self._resolver(),
        )
        assert [c["name"] for c in out[0]["found"]] == ["leaf_a", "mid"]

    def test_graph_lookup_requires_resolver(self):
        with pytest.raises(ValueError, match="resolver"):
            run_pipeline([{"s": 1}], [{"$graphLookup": {
                "from": "x", "startWith": "$s", "connectFromField": "a",
                "connectToField": "b", "as": "out"}}])


class TestRangeWindows:
    def test_numeric_range_window(self):
        docs = [{"v": x} for x in (1, 2, 4, 7, 8)]
        out = run_pipeline(docs, [{"$setWindowFields": {
            "sortBy": {"v": 1},
            "output": {"s": {"$sum": "$v", "window": {"range": [-1, 1]}}},
        }}])
        # inclusive both ends relative to each value
        assert [d["s"] for d in out] == [3, 3, 4, 15, 15]

    def test_range_window_current_and_unbounded(self):
        docs = [{"v": x} for x in (1, 1, 2, 3)]
        out = run_pipeline(docs, [{"$setWindowFields": {
            "sortBy": {"v": 1},
            "output": {
                "peers": {"$count": {}, "window": {"range": ["current", "current"]}},
                "cum": {"$sum": "$v", "window": {"range": ["unbounded", "current"]}},
            },
        }}])
        assert [d["peers"] for d in out] == [2, 2, 1, 1]  # ties share a window
        assert [d["cum"] for d in out] == [2, 2, 4, 7]

    def test_time_unit_range_window(self):
        t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
        docs = [{"t": t0 + dt.timedelta(minutes=m)} for m in (0, 1, 5, 6)]
        out = run_pipeline(docs, [{"$setWindowFields": {
            "sortBy": {"t": 1},
            "output": {"c": {"$count": {},
                             "window": {"range": [-2, 0], "unit": "minute"}}},
        }}])
        assert [d["c"] for d in out] == [1, 2, 1, 2]

    def test_range_window_validation(self):
        docs = [{"v": 1, "w": 2}]
        with pytest.raises(ValueError, match="single sortBy"):
            run_pipeline(docs, [{"$setWindowFields": {
                "sortBy": {"v": 1, "w": 1},
                "output": {"s": {"$sum": "$v", "window": {"range": [0, 1]}}}}}])
        with pytest.raises(ValueError, match="ascending"):
            run_pipeline(docs, [{"$setWindowFields": {
                "sortBy": {"v": -1},
                "output": {"s": {"$sum": "$v", "window": {"range": [0, 1]}}}}}])


class TestExpressionBatchR5:
    """r5 expression-operator growth: date arithmetic, array aggregates,
    regex/string ops, set predicates, trig/log."""

    def _e(self, expr, doc=None):
        from duckdb_mongo_spark.mql.expr import eval_expr
        return eval_expr(expr, doc or {})

    def test_date_parts(self):
        d = {"t": dt.datetime(2024, 3, 10, 8, 30, 15, 250_000)}  # a Sunday
        assert self._e({"$millisecond": "$t"}, d) == 250
        assert self._e({"$dayOfWeek": "$t"}, d) == 1       # Sunday = 1
        assert self._e({"$isoDayOfWeek": "$t"}, d) == 7    # Sunday = 7
        assert self._e({"$dayOfYear": "$t"}, d) == 70
        assert self._e({"$isoWeek": "$t"}, d) == 10
        assert self._e({"$isoWeekYear": "$t"}, d) == 2024
        assert self._e({"$week": "$t"}, d) == 10

    def test_date_add_subtract(self):
        d = {"t": dt.datetime(2024, 1, 31)}
        assert self._e({"$dateAdd": {"startDate": "$t", "unit": "month",
                                     "amount": 1}}, d) == dt.datetime(2024, 2, 29)
        assert self._e({"$dateSubtract": {"startDate": "$t", "unit": "day",
                                          "amount": 31}}, d) == dt.datetime(2023, 12, 31)
        assert self._e({"$dateAdd": {"startDate": "$t", "unit": "hour",
                                     "amount": 2}}, d) == dt.datetime(2024, 1, 31, 2)

    def test_date_trunc_and_diff_boundary_semantics(self):
        t = dt.datetime(2024, 5, 17, 14, 47, 3)
        assert self._e({"$dateTrunc": {"date": t, "unit": "hour"}}) == \
            dt.datetime(2024, 5, 17, 14)
        assert self._e({"$dateTrunc": {"date": t, "unit": "quarter"}}) == \
            dt.datetime(2024, 4, 1)
        # 15-minute bins anchor at 2000-01-01 (mongod's anchor)
        assert self._e({"$dateTrunc": {"date": t, "unit": "minute",
                                       "binSize": 15}}) == \
            dt.datetime(2024, 5, 17, 14, 45)
        # week trunc, Monday start
        assert self._e({"$dateTrunc": {"date": t, "unit": "week",
                                       "startOfWeek": "monday"}}) == \
            dt.datetime(2024, 5, 13)
        # $dateDiff counts BOUNDARIES crossed, not elapsed periods
        a, b = dt.datetime(2023, 12, 31, 23, 59), dt.datetime(2024, 1, 1, 0, 1)
        assert self._e({"$dateDiff": {"startDate": a, "endDate": b,
                                      "unit": "year"}}) == 1
        assert self._e({"$dateDiff": {"startDate": a, "endDate": b,
                                      "unit": "minute"}}) == 2

    def test_to_date_and_date_from_string(self):
        assert self._e({"$toDate": "2024-02-29T12:00:00Z"}) == \
            dt.datetime(2024, 2, 29, 12)
        assert self._e({"$toDate": 86_400_000}) == dt.datetime(1970, 1, 2)
        assert self._e({"$dateFromString": {
            "dateString": "17/05/2024", "format": "%d/%m/%Y"}}) == \
            dt.datetime(2024, 5, 17)
        assert self._e({"$dateFromString": {
            "dateString": "bogus", "onError": None}}) is None

    def test_array_aggregate_expressions(self):
        d = {"xs": [3, 1, None, "skip", 2]}
        assert self._e({"$sum": "$xs"}, d) == 6
        assert self._e({"$avg": "$xs"}, d) == pytest.approx(2.0)
        assert self._e({"$min": "$xs"}, d) == 1  # nulls ignored
        assert self._e({"$max": "$xs"}, d) == "skip"  # strings rank above numbers
        assert self._e({"$sum": [1, 2, 3]}) == 6  # varargs form
        assert self._e({"$stdDevPop": [2.0, 4.0]}) == pytest.approx(1.0)
        assert self._e({"$stdDevSamp": [2.0]}) is None
        assert self._e({"$first": "$xs"}, d) == 3
        assert self._e({"$last": "$xs"}, d) == 2
        assert self._e({"$reverseArray": [[1, 2]]}) == [2, 1]

    def test_sort_array(self):
        assert self._e({"$sortArray": {"input": [3, 1, 2], "sortBy": 1}}) == [1, 2, 3]
        assert self._e({"$sortArray": {"input": [3, 1, 2], "sortBy": -1}}) == [3, 2, 1]
        docs = [{"a": 2}, {"a": 1}]
        assert self._e({"$sortArray": {"input": docs, "sortBy": {"a": 1}}}) == \
            [{"a": 1}, {"a": 2}]

    def test_object_field_ops(self):
        d = {"o": {"a": 1, "b": 2}}
        assert self._e({"$mergeObjects": [{"a": 1}, {"b": 2}, {"a": 9}]}) == \
            {"a": 9, "b": 2}
        assert self._e({"$getField": {"field": "a", "input": "$o"}}, d) == 1
        assert self._e({"$setField": {"field": "c", "input": "$o",
                                      "value": 3}}, d) == {"a": 1, "b": 2, "c": 3}
        assert self._e({"$unsetField": {"field": "a", "input": "$o"}}, d) == {"b": 2}

    def test_string_ops(self):
        assert self._e({"$regexMatch": {"input": "Hello", "regex": "^h",
                                        "options": "i"}}) is True
        assert self._e({"$regexMatch": {"input": "Hello", "regex": "^h"}}) is False
        assert self._e({"$replaceOne": {"input": "aaa", "find": "a",
                                        "replacement": "b"}}) == "baa"
        assert self._e({"$replaceAll": {"input": "aaa", "find": "a",
                                        "replacement": "b"}}) == "bbb"
        assert self._e({"$indexOfCP": ["abcb", "b"]}) == 1
        assert self._e({"$indexOfCP": ["abcb", "b", 2]}) == 3
        assert self._e({"$indexOfCP": ["abc", "z"]}) == -1
        assert self._e({"$ltrim": {"input": "xxab", "chars": "x"}}) == "ab"
        assert self._e({"$rtrim": {"input": "abxx", "chars": "x"}}) == "ab"

    def test_to_bool_and_set_predicates(self):
        assert self._e({"$toBool": 0}) is False
        assert self._e({"$toBool": 2.5}) is True
        assert self._e({"$toBool": "false"}) is True  # any string -> true
        assert self._e({"$toBool": None}) is None
        assert self._e({"$setEquals": [[1, 2, 2], [2, 1]]}) is True
        assert self._e({"$setEquals": [[1], [2, 1]]}) is False
        assert self._e({"$setIsSubset": [[1, 2], [3, 2, 1]]}) is True
        assert self._e({"$setIsSubset": [[4], [1]]}) is False
        assert self._e({"$anyElementTrue": [[0, False, 1]]}) is True
        assert self._e({"$allElementsTrue": [[1, True, "x"]]}) is True
        assert self._e({"$allElementsTrue": [[1, 0]]}) is False

    def test_math_batch(self):
        import math
        assert self._e({"$log": [8, 2]}) == pytest.approx(3.0)
        assert self._e({"$sin": 0}) == 0.0
        assert self._e({"$cos": 0}) == 1.0
        assert self._e({"$atan2": [1, 1]}) == pytest.approx(math.pi / 4)
        assert self._e({"$degreesToRadians": 180}) == pytest.approx(math.pi)
        assert self._e({"$radiansToDegrees": math.pi}) == pytest.approx(180.0)


class TestOutAndMerge:
    """$out / $merge write stages (r5): last-stage-only, return no
    documents, write through the collection_sink protocol (the wire fake
    supplies a real write-back to its stores)."""

    def _store(self):
        store = {"target": [{"_id": 1, "v": "old", "keep": True},
                            {"_id": 2, "v": "old2"}]}
        resolver = lambda name: [dict(d) for d in store[name]]
        sink = lambda name, docs: store.__setitem__(name, docs)
        return store, resolver, sink

    def test_out_replaces_collection(self):
        store, resolver, sink = self._store()
        out = run_pipeline(
            [{"_id": 9, "v": "new"}], [{"$out": "target"}],
            collections=resolver, collection_sink=sink,
        )
        assert out == []  # $out emits nothing
        assert store["target"] == [{"_id": 9, "v": "new"}]

    def test_merge_default_merge_insert(self):
        store, resolver, sink = self._store()
        run_pipeline(
            [{"_id": 1, "v": "NEW"}, {"_id": 3, "v": "ins"}],
            [{"$merge": {"into": "target"}}],
            collections=resolver, collection_sink=sink,
        )
        by_id = {d["_id"]: d for d in store["target"]}
        # matched doc field-merged (existing fields survive), new inserted
        assert by_id[1] == {"_id": 1, "v": "NEW", "keep": True}
        assert by_id[2]["v"] == "old2"
        assert by_id[3] == {"_id": 3, "v": "ins"}

    def test_merge_modes(self):
        store, resolver, sink = self._store()
        run_pipeline(
            [{"_id": 1, "v": "NEW"}, {"_id": 3, "v": "dropme"}],
            [{"$merge": {"into": "target", "whenMatched": "replace",
                         "whenNotMatched": "discard"}}],
            collections=resolver, collection_sink=sink,
        )
        by_id = {d["_id"]: d for d in store["target"]}
        assert by_id[1] == {"_id": 1, "v": "NEW"}  # replaced wholesale
        assert 3 not in by_id  # discarded
        store, resolver, sink = self._store()
        run_pipeline(
            [{"_id": 1, "v": "X"}],
            [{"$merge": {"into": "target", "whenMatched": "keepExisting"}}],
            collections=resolver, collection_sink=sink,
        )
        assert {d["_id"]: d for d in store["target"]}[1]["v"] == "old"
        with pytest.raises(ValueError, match="whenMatched: fail"):
            run_pipeline([{"_id": 1}], [{"$merge": {
                "into": "target", "whenMatched": "fail"}}],
                collections=resolver, collection_sink=sink)

    def test_merge_custom_on_key_and_validation(self):
        store, resolver, sink = self._store()
        store["target"] = [{"k": "a", "n": 1}]
        run_pipeline(
            [{"k": "a", "n": 10}, {"k": "b", "n": 2}],
            [{"$merge": {"into": "target", "on": "k"}}],
            collections=resolver, collection_sink=sink,
        )
        assert sorted((d["k"], d["n"]) for d in store["target"]) == [("a", 10), ("b", 2)]
        with pytest.raises(ValueError, match="last"):
            run_pipeline([], [{"$out": "t"}, {"$limit": 1}],
                         collections=resolver, collection_sink=sink)
        with pytest.raises(ValueError, match="sink"):
            run_pipeline([], [{"$out": "t"}])

    def test_merge_duplicate_on_key_deferred_to_match_time(self):
        # mongod only fails when a source document actually matches
        # multiple targets; pre-existing duplicates an incoming doc never
        # touches must not fail the merge (round-6 advice item)
        store, resolver, sink = self._store()
        store["target"] = [{"k": "dup", "n": 1}, {"k": "dup", "n": 2},
                           {"k": "a", "n": 3}]
        run_pipeline(
            [{"k": "a", "n": 30}, {"k": "b", "n": 4}],
            [{"$merge": {"into": "target", "on": "k"}}],
            collections=resolver, collection_sink=sink,
        )
        assert sorted((d["k"], d["n"]) for d in store["target"]) == \
            [("a", 30), ("b", 4), ("dup", 1), ("dup", 2)]
        store["target"] = [{"k": "dup", "n": 1}, {"k": "dup", "n": 2}]
        with pytest.raises(ValueError, match="uniquely identify"):
            run_pipeline([{"k": "dup", "n": 9}],
                         [{"$merge": {"into": "target", "on": "k"}}],
                         collections=resolver, collection_sink=sink)

    def test_out_through_wire_fake(self):
        from duckdb_mongo_spark.testing.fake_mongo import FakeMongoClient

        client = FakeMongoClient()
        src = client["db"]["src"]
        src.insert_many([{"_id": i, "v": i * 2} for i in range(4)])
        out = list(src.aggregate([
            {"$match": {"v": {"$gte": 4}}}, {"$out": "derived"}]))
        assert out == []
        derived = client["db"]["derived"]
        assert sorted(d["_id"] for d in derived.find()) == [2, 3]
        # $merge back into the SAME database, upserting
        list(src.aggregate([{"$match": {"_id": 0}},
                            {"$merge": {"into": "derived"}}]))
        assert sorted(d["_id"] for d in derived.find()) == [0, 2, 3]


class TestDateParts:
    def _e(self, expr, doc=None):
        from duckdb_mongo_spark.mql.expr import eval_expr
        return eval_expr(expr, doc or {})

    def test_date_to_parts_round_trip(self):
        t = dt.datetime(2024, 2, 29, 23, 59, 58, 789_000)
        parts = self._e({"$dateToParts": {"date": t}})
        assert parts == {"year": 2024, "month": 2, "day": 29, "hour": 23,
                         "minute": 59, "second": 58, "millisecond": 789}
        assert self._e({"$dateFromParts": parts}) == t
        iso = self._e({"$dateToParts": {"date": t, "iso8601": True}})
        assert iso["isoWeek"] == 9 and iso["isoDayOfWeek"] == 4
        assert self._e({"$dateFromParts": iso}) == t

    def test_date_from_parts_carries_overflow(self):
        # mongod carries out-of-range parts: month 13 -> next January,
        # day 0 -> last day of the previous month
        assert self._e({"$dateFromParts": {"year": 2023, "month": 13,
                                           "day": 1}}) == dt.datetime(2024, 1, 1)
        assert self._e({"$dateFromParts": {"year": 2024, "month": 3,
                                           "day": 0}}) == dt.datetime(2024, 2, 29)
        assert self._e({"$dateFromParts": {"year": 2024, "month": 1, "day": 1,
                                           "hour": 25}}) == dt.datetime(2024, 1, 2, 1)

    def test_date_to_parts_null(self):
        assert self._e({"$dateToParts": {"date": None}}) is None


class TestRedact:
    DOCS = [{
        "_id": 1, "level": 1, "title": "report",
        "sections": [
            {"level": 1, "body": "public", "notes": {"level": 5, "body": "secret"}},
            {"level": 5, "body": "classified"},
        ],
    }]

    def test_redact_descend_prunes_subtrees_by_level(self):
        out = run_pipeline(self.DOCS, [{"$redact": {
            "$cond": {"if": {"$lte": ["$level", 1]},
                      "then": "$$DESCEND", "else": "$$PRUNE"}}}])
        assert len(out) == 1
        d = out[0]
        assert d["title"] == "report"
        assert len(d["sections"]) == 1
        assert d["sections"][0]["body"] == "public"
        assert "notes" not in d["sections"][0]  # nested level-5 pruned

    def test_redact_keep_stops_descending(self):
        out = run_pipeline(self.DOCS, [{"$redact": {
            "$cond": {"if": {"$lte": ["$level", 1]},
                      "then": "$$KEEP", "else": "$$PRUNE"}}}])
        # KEEP at the root keeps EVERYTHING, nested level-5 included
        assert out[0]["sections"][0]["notes"]["body"] == "secret"
        assert out[0]["sections"][1]["body"] == "classified"

    def test_redact_prune_root_drops_document(self):
        out = run_pipeline(self.DOCS, [{"$redact": {
            "$cond": {"if": {"$gte": ["$level", 5]},
                      "then": "$$DESCEND", "else": "$$PRUNE"}}}])
        assert out == []

    def test_redact_invalid_action_raises(self):
        with pytest.raises(ValueError, match="DESCEND"):
            run_pipeline([{"a": 1}], [{"$redact": "$a"}])


class TestGeoNear:
    # Known city coordinates [lng, lat]; distances cross-checked against
    # the haversine formula with mongod's earth radius (6378100 m).
    CITIES = [
        {"_id": "paris", "loc": {"type": "Point", "coordinates": [2.3522, 48.8566]}},
        {"_id": "london", "loc": {"type": "Point", "coordinates": [-0.1276, 51.5072]}},
        {"_id": "berlin", "loc": {"type": "Point", "coordinates": [13.4050, 52.5200]}},
        {"_id": "madrid", "loc": {"type": "Point", "coordinates": [-3.7038, 40.4168]}},
        {"_id": "no_loc", "x": 1},
    ]

    def test_geojson_sorted_meters(self):
        out = run_pipeline(self.CITIES, [{"$geoNear": {
            "near": {"type": "Point", "coordinates": [2.3522, 48.8566]},
            "distanceField": "d", "key": "loc",
        }}])
        assert [d["_id"] for d in out] == ["paris", "london", "berlin", "madrid"]
        assert out[0]["d"] == 0.0
        # Paris->London great-circle ~344 km (6378.1 km radius)
        assert 330_000 < out[1]["d"] < 360_000

    def test_max_min_distance_and_query(self):
        near = {"type": "Point", "coordinates": [2.3522, 48.8566]}
        out = run_pipeline(self.CITIES, [{"$geoNear": {
            "near": near, "distanceField": "d", "key": "loc",
            "minDistance": 1.0, "maxDistance": 400_000,
        }}])
        assert [d["_id"] for d in out] == ["london"]  # paris excluded by min
        out = run_pipeline(self.CITIES, [{"$geoNear": {
            "near": near, "distanceField": "d", "key": "loc",
            "query": {"_id": {"$ne": "london"}}, "maxDistance": 1_200_000,
        }}])
        assert [d["_id"] for d in out] == ["paris", "berlin", "madrid"]

    def test_distance_multiplier_and_include_locs(self):
        out = run_pipeline(self.CITIES, [{"$geoNear": {
            "near": {"type": "Point", "coordinates": [2.3522, 48.8566]},
            "distanceField": "d.km", "key": "loc",
            "distanceMultiplier": 0.001, "includeLocs": "matched",
        }}])
        assert 330 < out[1]["d"]["km"] < 360  # km now
        assert out[1]["matched"] == self.CITIES[1]["loc"]

    def test_legacy_planar_and_spherical(self):
        docs = [{"_id": i, "p": [float(i), 0.0]} for i in range(4)]
        out = run_pipeline(docs, [{"$geoNear": {
            "near": [0.0, 4.0], "distanceField": "d", "key": "p"}}])
        assert out[0]["_id"] == 0 and out[0]["d"] == 4.0  # Euclidean units
        out = run_pipeline(docs, [{"$geoNear": {
            "near": [0.0, 0.0], "distanceField": "d", "key": "p",
            "spherical": True}}])
        # legacy + spherical => radians: 1 degree of longitude at equator
        assert abs(out[1]["d"] - 0.017453292519943295) < 1e-12

    def test_key_autodetect_unique_point_field(self):
        out = run_pipeline(self.CITIES[:2], [{"$geoNear": {
            "near": {"type": "Point", "coordinates": [0, 0]},
            "distanceField": "d"}}])
        assert len(out) == 2  # 'loc' is the only point-shaped field

    def test_key_ambiguous_raises(self):
        docs = [{"a": [0, 0], "b": [1, 1]}]
        with pytest.raises(ValueError, match="ambiguous"):
            run_pipeline(docs, [{"$geoNear": {
                "near": [0, 0], "distanceField": "d"}}])

    def test_must_be_first_stage(self):
        with pytest.raises(ValueError, match="first"):
            run_pipeline(self.CITIES, [
                {"$limit": 10},
                {"$geoNear": {"near": [0, 0], "distanceField": "d", "key": "loc"}},
            ])
        # a leading $match IS allowed: the engine prepends its internal
        # sentinel-excluding $match to manual pipelines (scan.py), and
        # $match-then-geoNear == geoNear with the match merged into query
        out = run_pipeline(self.CITIES, [
            {"$match": {"_id": {"$ne": "london"}}},
            {"$geoNear": {"near": {"type": "Point", "coordinates": [0, 0]},
                          "distanceField": "d", "key": "loc"}},
        ])
        assert {d["_id"] for d in out} == {"paris", "berlin", "madrid"}

    def test_meta_distance_via_project(self):
        out = run_pipeline(self.CITIES, [
            {"$geoNear": {"near": {"type": "Point", "coordinates": [2.3522, 48.8566]},
                          "distanceField": "d", "key": "loc"}},
            {"$project": {"dist": {"$meta": "geoNearDistance"}}},
        ])
        assert out[0]["dist"] == 0.0
        assert 330_000 < out[1]["dist"] < 360_000
        assert all("__mql_meta__" not in d for d in out)


class TestVectorSearch:
    DOCS = [
        {"_id": 1, "v": [1.0, 0.0], "cat": "a"},
        {"_id": 2, "v": [0.8, 0.6], "cat": "b"},
        {"_id": 3, "v": [0.0, 1.0], "cat": "a"},
        {"_id": 4, "v": [-1.0, 0.0], "cat": "a"},
        {"_id": 5, "x": "no vector"},
        {"_id": 6, "v": [1.0, 0.0, 0.0]},  # wrong dimension
    ]

    def test_cosine_topk_and_score(self):
        out = run_pipeline(self.DOCS, [
            {"$vectorSearch": {"index": "i", "path": "v",
                               "queryVector": [1.0, 0.0],
                               "numCandidates": 10, "limit": 3}},
            {"$addFields": {"score": {"$meta": "vectorSearchScore"}}},
        ])
        assert [d["_id"] for d in out] == [1, 2, 3]
        assert abs(out[0]["score"] - 1.0) < 1e-12          # cos=1 -> 1
        assert abs(out[1]["score"] - 0.9) < 1e-12          # cos=0.8 -> 0.9
        assert abs(out[2]["score"] - 0.5) < 1e-12          # cos=0 -> 0.5

    def test_filter_prefilters(self):
        out = run_pipeline(self.DOCS, [{"$vectorSearch": {
            "index": "i", "path": "v", "queryVector": [1.0, 0.0],
            "numCandidates": 10, "limit": 10, "filter": {"cat": "a"}}}])
        assert [d["_id"] for d in out] == [1, 3, 4]

    def test_euclidean_and_dot_product(self):
        out = run_pipeline(self.DOCS, [{"$vectorSearch": {
            "index": "i", "path": "v", "queryVector": [1.0, 0.0],
            "limit": 2, "exact": True, "similarity": "euclidean"}},
            {"$project": {"s": {"$meta": "vectorSearchScore"}}}])
        assert out[0]["_id"] == 1 and abs(out[0]["s"] - 1.0) < 1e-12
        out = run_pipeline(self.DOCS, [{"$vectorSearch": {
            "index": "i", "path": "v", "queryVector": [2.0, 0.0],
            "limit": 1, "exact": True, "similarity": "dotProduct"}}])
        assert out[0]["_id"] == 1  # dot=2 -> score 1.5

    def test_validation(self):
        base = {"index": "i", "path": "v", "queryVector": [1.0, 0.0], "limit": 5}
        with pytest.raises(ValueError, match="numCandidates required"):
            run_pipeline(self.DOCS, [{"$vectorSearch": dict(base)}])
        with pytest.raises(ValueError, match=">= limit"):
            run_pipeline(self.DOCS, [{"$vectorSearch": dict(base, numCandidates=2)}])
        with pytest.raises(ValueError, match="not allowed with exact"):
            run_pipeline(self.DOCS, [{"$vectorSearch": dict(
                base, exact=True, numCandidates=10)}])
        with pytest.raises(ValueError, match="first"):
            run_pipeline(self.DOCS, [
                {"$limit": 10},
                {"$vectorSearch": dict(base, numCandidates=10)}])

    def test_skips_unindexable_vectors(self):
        out = run_pipeline(self.DOCS, [{"$vectorSearch": {
            "index": "i", "path": "v", "queryVector": [1.0, 0.0],
            "numCandidates": 10, "limit": 10}}])
        assert {d["_id"] for d in out} == {1, 2, 3, 4}  # 5 & 6 skipped


class TestGeoMatchOperators:
    DOCS = [
        {"_id": "origin", "loc": [0.0, 0.0]},
        {"_id": "ne", "loc": [3.0, 4.0]},
        {"_id": "far", "loc": [10.0, 10.0]},
        {"_id": "gj", "loc": {"type": "Point", "coordinates": [2.3522, 48.8566]}},
        {"_id": "none"},
    ]

    def run_match(self, filt):
        return [d["_id"] for d in run_pipeline(self.DOCS, [{"$match": filt}])]

    def test_geo_within_box(self):
        got = self.run_match({"loc": {"$geoWithin": {"$box": [[-1, -1], [5, 5]]}}})
        assert got == ["origin", "ne"]

    def test_geo_within_center_planar(self):
        got = self.run_match({"loc": {"$geoWithin": {"$center": [[0, 0], 5]}}})
        assert got == ["origin", "ne"]  # (3,4) is exactly r=5

    def test_geo_within_center_sphere(self):
        # cap of 0.1 rad (~637 km) around Paris catches only the Paris point
        got = self.run_match({"loc": {"$geoWithin": {
            "$centerSphere": [[2.3522, 48.8566], 0.1]}}})
        assert got == ["gj"]

    def test_geo_within_polygon_legacy(self):
        tri = [[-1, -1], [8, -1], [0, 9]]  # edge at y=4 crosses x=4 > 3
        got = self.run_match({"loc": {"$geoWithin": {"$polygon": tri}}})
        assert got == ["origin", "ne"]

    def test_geo_within_geojson_polygon_with_hole(self):
        donut = {"type": "Polygon", "coordinates": [
            [[-5, -5], [15, -5], [15, 15], [-5, 15], [-5, -5]],   # shell
            [[9, 9], [11, 9], [11, 11], [9, 11], [9, 9]],          # hole @ (10,10)
        ]}
        got = self.run_match({"loc": {"$geoWithin": {"$geometry": donut}}})
        assert got == ["origin", "ne"]  # 'far' fell into the hole

    def test_geo_intersects_point_vs_polygon(self):
        sq = {"type": "Polygon",
              "coordinates": [[[2, 48], [3, 48], [3, 49], [2, 49], [2, 48]]]}
        got = self.run_match({"loc": {"$geoIntersects": {"$geometry": sq}}})
        assert got == ["gj"]

    def test_near_geojson_meters(self):
        got = self.run_match({"loc": {"$near": {
            "$geometry": {"type": "Point", "coordinates": [2.3522, 48.8566]},
            "$maxDistance": 1000}}})
        assert got == ["gj"]

    def test_near_legacy_sibling_bounds(self):
        got = self.run_match({"loc": {"$near": [0, 0], "$maxDistance": 5.0}})
        assert got == ["origin", "ne"]
        got = self.run_match(
            {"loc": {"$near": [0, 0], "$minDistance": 1.0, "$maxDistance": 6.0}})
        assert got == ["ne"]

    def test_near_sphere_legacy_radians(self):
        # 1 degree of longitude at the equator = pi/180 radians
        got = self.run_match(
            {"loc": {"$nearSphere": [0.1, 0.0], "$maxDistance": 0.0175}})
        assert got == ["origin"]

    def test_missing_location_never_matches(self):
        assert "none" not in self.run_match(
            {"loc": {"$geoWithin": {"$box": [[-90, -90], [90, 90]]}}})


class TestRound5AdviceFixes:
    """Round-5 advisor items: range-window null sortBy crash, metadata
    leaking into nested $$ROOT output, $dateFromParts year requirement,
    $merge ambiguous on-key detection."""

    def test_range_window_with_null_sortby_docs(self):
        # nulls sort first; the bisect must never compare None < edge.
        # Null docs keep the documented empty-window identity ($sum -> 0)
        # and are excluded from every non-null doc's window.
        out = run_pipeline(
            [{"x": None}, {"x": 1}, {"x": 2}],
            [{"$setWindowFields": {
                "sortBy": {"x": 1},
                "output": {"s": {"$sum": "$x",
                                 "window": {"range": [-1, 0]}}}}}])
        assert [d["s"] for d in out] == [0, 1, 3]

    def test_range_window_unbounded_excludes_null_docs(self):
        out = run_pipeline(
            [{"x": None}, {"x": 1}, {"x": 2}],
            [{"$setWindowFields": {
                "sortBy": {"x": 1},
                "output": {"c": {"$count": {},
                                 "window": {"range": ["unbounded", "unbounded"]}}}}}])
        # null doc: empty window; non-null docs: only the 2 non-null rows
        assert [d["c"] for d in out] == [0, 2, 2]

    def test_meta_not_leaked_into_pushed_root(self):
        # mongod keeps metadata out-of-document: $$ROOT materialized as a
        # value (e.g. $push) must not carry the hidden slot
        out = run_pipeline(
            [{"_id": 1, "v": [1.0, 0.0]}, {"_id": 2, "v": [0.0, 1.0]}],
            [
                {"$vectorSearch": {"index": "i", "path": "v",
                                   "queryVector": [1.0, 0.0],
                                   "numCandidates": 10, "limit": 2}},
                {"$group": {"_id": None, "all": {"$push": "$$ROOT"}}},
            ])
        assert len(out) == 1
        for d in out[0]["all"]:
            assert "__mql_meta__" not in d

    def test_meta_still_readable_before_materialization(self):
        out = run_pipeline(
            [{"_id": 1, "v": [1.0, 0.0]}],
            [
                {"$vectorSearch": {"index": "i", "path": "v",
                                   "queryVector": [1.0, 0.0],
                                   "numCandidates": 10, "limit": 1}},
                {"$addFields": {"score": {"$meta": "vectorSearchScore"}}},
            ])
        assert abs(out[0]["score"] - 1.0) < 1e-12

    def test_date_from_parts_requires_year(self):
        from duckdb_mongo_spark.mql.expr import eval_expr
        with pytest.raises(ValueError, match="year"):
            eval_expr({"$dateFromParts": {"month": 3, "day": 4}}, {})
        # isoWeekYear alone is a valid anchor
        assert eval_expr(
            {"$dateFromParts": {"isoWeekYear": 2024}}, {}) is not None

    def test_merge_ambiguous_on_key_fails(self):
        store = {"target": [{"_id": 1, "k": "dup"}, {"_id": 2, "k": "dup"}]}
        resolver = lambda name: [dict(d) for d in store[name]]
        sink = lambda name, docs: store.__setitem__(name, docs)
        with pytest.raises(ValueError, match="uniquely identify"):
            run_pipeline(
                [{"k": "dup", "v": 1}],
                [{"$merge": {"into": "target", "on": "k"}}],
                collections=resolver, collection_sink=sink,
            )
