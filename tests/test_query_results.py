"""End-to-end golden-result tests over the fixture corpus, mirroring the
reference's result assertions (test/sql/query/basic.test,
aggregations.test, pushdown_comprehensive.test, schema/mode.test,
edge_cases/empty_collections.test). Runs real Spark jobs.
"""

from __future__ import annotations

import pytest

from corpus import DB
from duckdb_mongo_spark.frame import MongoFrame
from duckdb_mongo_spark.pushdown import C
from duckdb_mongo_spark.schema.infer import resolve_schema


@pytest.fixture(scope="module")
def users(spark, backend):
    return MongoFrame(spark=spark, backend=backend, db=DB, coll="users",
                      schema=resolve_schema(backend, DB, "users"))


def frame(spark, backend, coll, **kw):
    schema = resolve_schema(backend, DB, coll,
                            columns=kw.pop("columns", None))
    return MongoFrame(spark=spark, backend=backend, db=DB, coll=coll,
                      schema=schema, **kw)


class TestBasicQueries:
    def test_count(self, users):
        assert users.df().count() == 4

    def test_filter_pushed_result(self, users):
        rows = users.filter(C("age") > 28).select("name", "age").collect()
        assert sorted((r["name"], r["age"]) for r in rows) == [
            ("Alice", 30), ("Charlie", 35)]

    def test_nested_column_filter(self, users):
        rows = users.filter(C("address.city") == "Chicago").select("name").collect()
        assert [r["name"] for r in rows] == ["Charlie"]

    def test_parent_json_column(self, users):
        import json

        row = users.filter(C("name") == "Alice").select("address").collect()[0]
        assert json.loads(row["address"])["city"] == "New York"

    def test_array_column(self, users):
        rows = users.select("name", "tags").collect()
        tags = {r["name"]: r["tags"] for r in rows}
        assert tags["Alice"] == ["admin", "user"]
        assert tags["Diana"] == []

    def test_objectid_filter_roundtrip(self, users):
        rows = users.filter(C("_id") == "507f1f77bcf86cd799439011").collect()
        assert len(rows) == 1 and rows[0]["name"] == "Alice"

    def test_aggregate_pushdown_result(self, users):
        rows = (users.group_by("active")
                .agg(("count_star", None, "n"), ("avg", "age", "avg_age"))
                .collect())
        by = {r["active"]: r for r in rows}
        assert by[True]["n"] == 3 and by[False]["n"] == 1
        assert by[True]["avg_age"] == pytest.approx((30 + 25 + 28) / 3)

    def test_ungrouped_sum(self, users):
        rows = users.group_by().agg(("sum", "balance", "total")).collect()
        assert rows[0]["total"] == pytest.approx(4251.5)

    def test_count_star_pushed(self, users):
        rows = users.count_rows().collect()
        assert rows[0]["count"] == 4

    def test_count_on_empty_match_is_zero(self, users):
        # COUNT(*) on empty match → one row 0 (mongo_table_function.cpp:669-683)
        rows = users.filter(C("age") > 999).count_rows().collect()
        assert len(rows) == 1 and rows[0]["count"] == 0

    def test_topn(self, users):
        rows = users.order_by_id().limit(2).select("name").collect()
        assert [r["name"] for r in rows] == ["Alice", "Bob"]

    def test_min_max(self, users):
        rows = users.group_by().agg(("min", "age", "lo"), ("max", "age", "hi")).collect()
        assert rows[0]["lo"] == 25 and rows[0]["hi"] == 35


class TestCollections:
    def test_products_group_by_in_stock(self, spark, backend):
        p = frame(spark, backend, "products")
        rows = (p.group_by("in_stock")
                .agg(("count_star", None, "n"), ("avg", "price", "avg_price"))
                .collect())
        by = {r["in_stock"]: r for r in rows}
        assert by[False]["n"] == 1 and by[True]["n"] == 2
        assert by[False]["avg_price"] == pytest.approx(299.99)
        assert by[True]["avg_price"] == pytest.approx(514.99)

    def test_orders_explode_items(self, spark, backend):
        from pyspark.sql import functions as F

        o = frame(spark, backend, "orders")
        df = o.df().select("order_id", F.explode("items").alias("item"))
        rows = df.select("order_id", "item.product", "item.price").collect()
        got = sorted((r["order_id"], r["product"]) for r in rows)
        assert got == [("ORD-001", "Laptop"), ("ORD-001", "Mouse"),
                       ("ORD-002", "Desk"), ("ORD-004", "Keyboard")]
        # missing price in ORD-004 item → NULL
        assert [r["price"] for r in rows if r["order_id"] == "ORD-004"] == [None]

    def test_orders_element_at_1based(self, spark, backend):
        from pyspark.sql import functions as F

        o = frame(spark, backend, "orders")
        # try_element_at = DuckDB list_extract semantics (NULL out of
        # bounds); plain element_at throws under Spark 4 ANSI mode
        df = o.df().select("order_id",
                           F.try_element_at("items", F.lit(1))["product"].alias("first"))
        by = {r["order_id"]: r["first"] for r in df.collect()}
        assert by["ORD-001"] == "Laptop"
        assert by["ORD-003"] is None  # empty array

    def test_matrix_mixed_depth_wrapping(self, spark, backend):
        m = frame(spark, backend, "matrix")
        rows = {r["_id"]: r["data"] for r in m.df().collect()}
        # 2D docs wrapped to the inferred 3D type (helpers.cpp:362-565)
        assert rows["MAT-001"][0] == [[1, 2, 3]]
        assert rows["MAT-002"][0] == [[1, 2], [3, 4]]
        assert rows["MAT-003"][1] == [[30, 40]]

    def test_decimal_to_double(self, spark, backend):
        d = frame(spark, backend, "decimal_test")
        rows = (d.group_by("category").agg(("sum", "amount", "s")).collect())
        by = {r["category"]: r["s"] for r in rows}
        assert by["A"] == pytest.approx(1123.44)
        assert by["B"] == pytest.approx(50.0)

    def test_empty_collection(self, spark, backend):
        e = frame(spark, backend, "empty_collection")
        df = e.df()
        assert df.columns == ["_id"]
        assert df.count() == 0

    def test_deeply_nested_json_leaf(self, spark, backend):
        import json

        d = frame(spark, backend, "deeply_nested")
        row = d.df().select("level1_level2_level3_level4_level5").collect()[0]
        payload = json.loads(row[0])
        assert payload["level6"]["value"] == "deep value"

    def test_schema_doc_excluded_from_results(self, spark, backend):
        s = frame(spark, backend, "schema_test_simple")
        names = [r["name"] for r in s.df().collect()]
        assert sorted(names) == ["Eve", "Frank"]  # __schema doc filtered out

    def test_case_variant_merged_column(self, spark, backend):
        # reference semantics (case_variant_fields.test): one merged
        # column; only the doc matching the kept path is non-NULL
        cv = frame(spark, backend, "case_variant_fields_test")
        df = cv.df()
        assert df.count() == 2
        vals = [r["case_data_clientFullname"] for r in df.collect()]
        assert sorted(v is None for v in vals) == [False, True]
        assert "Ann Lee" in vals


class TestIntegerSumWidening:
    """Pushed SUM over an integer column widens to HUGEINT/Decimal(38,0),
    matching DuckDB's SUM(BIGINT)->HUGEINT (the reference preserves the
    engine's aggregate type, src/mongo_optimizer.cpp:589). A BIGINT
    accumulator would overflow silently at 100 TB."""

    def test_pushed_int_sum_exceeds_int64(self, spark):
        from decimal import Decimal

        from duckdb_mongo_spark.backends.memory import MemoryBackend

        be = MemoryBackend()
        big = 2 ** 62
        be.insert_many(DB, "bigsum", [{"_id": i, "v": big} for i in range(8)])
        f = frame(spark, be, "bigsum")
        q = f.group_by().agg(("sum", "v", "total"))
        [fld] = [x for x in q.df().schema.fields if x.name == "total"]
        assert fld.dataType.simpleString() == "decimal(38,0)"
        rows = q.collect()
        assert rows[0]["total"] == Decimal(8 * big)  # 2**65 > int64 max

    def test_grouped_int_sum_widened(self, spark):
        from decimal import Decimal

        from duckdb_mongo_spark.backends.memory import MemoryBackend

        be = MemoryBackend()
        be.insert_many(DB, "bigsum_g", [
            {"_id": i, "k": "a" if i % 2 else "b", "v": 2 ** 61 + i}
            for i in range(6)
        ])
        f = frame(spark, be, "bigsum_g")
        rows = f.group_by("k").agg(("sum", "v", "total")).collect()
        by = {r["k"]: r["total"] for r in rows}
        assert by["a"] == Decimal(3 * 2 ** 61 + 1 + 3 + 5)
        assert by["b"] == Decimal(3 * 2 ** 61 + 0 + 2 + 4)


class TestSchemaModes:
    COLS = {"id": "VARCHAR", "value": "BIGINT"}

    def test_permissive_nulls_mismatches(self, spark, backend):
        tc = frame(spark, backend, "type_conflicts", columns=self.COLS)
        rows = {r["_id"]: r for r in tc.df().collect()}
        assert rows["tc1"]["id"] == "123" and rows["tc1"]["value"] is None
        assert rows["tc2"]["value"] == 789
        assert rows["tc3"]["value"] is None

    def test_dropmalformed_drops_rows(self, spark, backend):
        tc = frame(spark, backend, "type_conflicts", columns=self.COLS,
                   schema_mode="DROPMALFORMED")
        rows = tc.df().collect()
        assert [r["_id"] for r in rows] == ["tc2"]

    def test_failfast_raises_with_offender(self, spark, backend):
        from py4j.protocol import Py4JJavaError

        tc = frame(spark, backend, "type_conflicts", columns=self.COLS,
                   schema_mode="FAILFAST")
        with pytest.raises(Exception) as exc:
            tc.df().collect()
        assert "tc1" in str(exc.value) or "tc3" in str(exc.value)


class TestSqlSurface:
    def test_register_views_and_sql(self, spark, backend):
        import duckdb_mongo_spark as dms

        cat = dms.attach(backend, alias="m", spark=spark)
        created = cat.register_views(db=DB)
        assert "m_users" in created
        out = spark.sql(
            "SELECT name FROM m_users WHERE age > 28 ORDER BY age"
        ).collect()
        assert [r["name"] for r in out] == ["Alice", "Charlie"]

    def test_explain_extended_includes_physical_plan(self, spark, backend):
        users = frame(spark, backend, "users")
        out = users.filter(C("age") > 28).explain(extended=True)
        assert "MONGO_SCAN" in out and "scan_method=find" in out
        assert "Physical Plan" in out

    def test_catalyst_filters_reach_reader(self, spark, backend):
        """Catalyst pushdown proof for the SQL path: the WHERE clause is
        consumed by the reader (PushedFilters), no residual Filter node
        — reference plan-assertion style (filter_pushdown_plan.test)."""
        import io
        from contextlib import redirect_stdout

        import duckdb_mongo_spark as dms

        cat = dms.attach(backend, alias="pf", spark=spark)
        cat.register_views(db=DB)
        df = spark.sql("SELECT name FROM pf_users WHERE age > 28")
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain(mode="formatted")
        plan = buf.getvalue()
        assert "PushedFilters" in plan
        assert "GreaterThan(age,28)" in plan
        assert "+- Filter" not in plan

    def test_semi_join_in_pushdown(self, spark, backend):
        """A11: build side materialized, key set pushed as $in."""
        from duckdb_mongo_spark.frame import MongoFrame

        users = frame(spark, backend, "users")
        orders = frame(spark, backend, "orders")
        completed = orders.filter(C("status") == "completed").df() \
            .select("customer_id")
        out = users.semi_join_in(completed, on="_id", build_col="customer_id")
        assert isinstance(out, MongoFrame)
        d = out.scan_description()
        assert "$in" in d
        rows = sorted(r["name"] for r in out.select("name").collect())
        assert rows == ["Alice"]  # ORD-001 + ORD-004 both Alice

    def test_semi_join_in_direct_build_path(self, spark, backend):
        """Passing the build side as a MongoFrame fetches keys straight
        from the backend (no second Spark round-trip) — results must be
        IDENTICAL to the DataFrame-build Spark path."""
        from duckdb_mongo_spark.frame import MongoFrame

        users = frame(spark, backend, "users")
        orders = frame(spark, backend, "orders")
        build_mf = orders.filter(C("status") == "completed").select("customer_id")
        direct = users.semi_join_in(build_mf, on="_id", build_col="customer_id")
        assert isinstance(direct, MongoFrame)
        via_spark = users.semi_join_in(
            build_mf.df(), on="_id", build_col="customer_id"
        )
        assert direct.scan_description() == via_spark.scan_description()
        a = sorted(r["name"] for r in direct.select("name").collect())
        b = sorted(r["name"] for r in via_spark.select("name").collect())
        assert a == b == ["Alice"]

    def test_semi_join_in_direct_build_overflow_falls_back(self, spark, backend):
        from pyspark.sql import DataFrame

        users = frame(spark, backend, "users")
        orders = frame(spark, backend, "orders")
        out = users.semi_join_in(
            orders.select("customer_id"), on="_id",
            build_col="customer_id", max_keys=1,
        )
        assert isinstance(out, DataFrame)
        names = {r["name"] for r in out.select("name").collect()}
        assert names == {"Alice", "Bob", "Charlie"}

    def test_distinct_values_parquet_matches_interpreter(self, spark, sf_dir):
        """Vectorized parquet distinct_values == streaming-interpreter
        base implementation, filtered and unfiltered."""
        import __spark_entry__ as entry
        from duckdb_mongo_spark.backends.base import DocumentBackend

        be = entry._pq_backend(sf_dir)
        for filt in (None, {"c_acctbal": {"$gt": 5000.0}}):
            fast = sorted(be.distinct_values("main", "customer", "c_nationkey", filt))
            slow = sorted(
                DocumentBackend.distinct_values(be, "main", "customer", "c_nationkey", filt)
            )
            assert fast == slow and fast

    def test_semi_join_in_fallback_over_max_keys(self, spark, backend):
        users = frame(spark, backend, "users")
        orders = frame(spark, backend, "orders")
        build = orders.df().select("customer_id")
        out = users.semi_join_in(build, on="_id", build_col="customer_id",
                                 max_keys=1)
        from pyspark.sql import DataFrame

        assert isinstance(out, DataFrame)  # fell back to left-semi in Spark
        names = {r["name"] for r in out.select("name").collect()}
        assert names == {"Alice", "Bob", "Charlie"}

    def test_join_across_collections(self, spark, backend):
        import duckdb_mongo_spark as dms

        cat = dms.attach(backend, alias="j", spark=spark)
        cat.register_views(db=DB)
        out = spark.sql("""
            SELECT u.name, SUM(o.total) AS spend
            FROM j_orders o JOIN j_users u ON o.customer_id = u._id
            GROUP BY u.name ORDER BY spend DESC
        """).collect()
        assert out[0]["name"] == "Alice"
        assert out[0]["spend"] == pytest.approx(1059.97 + 79.99)
