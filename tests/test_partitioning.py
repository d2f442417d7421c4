"""Scale-utility tests: bucketed co-located joins (no Exchange in the
plan) and salted two-phase aggregation (same results, spread shuffle).
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from duckdb_mongo_spark.ops import partitioning as pt


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketed_test")
    spark.catalog.setCurrentDatabase("bucketed_test")
    yield spark
    spark.sql("DROP DATABASE IF EXISTS bucketed_test CASCADE")
    spark.catalog.setCurrentDatabase("default")


class TestBucketedJoin:
    def test_co_located_join_has_no_exchange(self, warehouse):
        spark = warehouse
        facts = spark.range(0, 10000).select(
            F.col("id").alias("k"), (F.col("id") % 97).alias("v")
        )
        dims = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        pt.write_bucketed(facts, "facts_b", ["k"], n_buckets=8)
        pt.write_bucketed(dims, "dims_b", ["k"], n_buckets=8)
        # disable broadcast: with a genuinely big-big join (the bucketed
        # layout's target) Spark picks SortMergeJoin, and bucketing
        # removes BOTH shuffles
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = pt.co_located_join(spark, "facts_b", "dims_b", ["k"])
            plan = plan_text(joined)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan  # co-located: no shuffle either side
            assert joined.count() == 1000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_bucketed_results_match_plain_join(self, warehouse):
        spark = warehouse
        joined = pt.co_located_join(spark, "facts_b", "dims_b", ["k"])
        expect = (
            spark.table("facts_b").join(spark.table("dims_b").hint("shuffle_hash"), ["k"])
        )
        got = sorted(tuple(r) for r in joined.collect())
        want = sorted(tuple(r) for r in expect.collect())
        assert got == want


def _py_zvalue(buckets: list[int], bits: int) -> int:
    """Independent pure-Python Morton interleave (test oracle)."""
    z = 0
    for d, b in enumerate(buckets):
        for i in range(bits):
            z |= ((b >> i) & 1) << (i * len(buckets) + d)
    return z


class TestZOrder:
    def test_zvalue_matches_python_interleave(self, spark):
        # exact bucket control: lo=0, hi=16, bits=4 → bucket == value
        rows = [(x, y) for x in range(16) for y in range(16)]
        df = spark.createDataFrame(rows, "x int, y int")
        got = {
            (r["x"], r["y"]): r["z"]
            for r in df.select(
                "x", "y",
                pt.zorder_value([("x", 0, 16), ("y", 0, 16)], bits=4).alias("z"),
            ).collect()
        }
        for x, y in rows:
            assert got[(x, y)] == _py_zvalue([x, y], 4), (x, y)

    def test_zvalue_null_and_out_of_range(self, spark):
        df = spark.createDataFrame(
            [(None, 5), (-100, 5), (1000, 5)], "x int, y int"
        )
        vals = df.select(
            pt.zorder_value([("x", 0, 16), ("y", 0, 16)], bits=4).alias("z")
        ).collect()
        # null and below-range x both bucket to 0; above-range clamps to 15
        assert vals[0]["z"] == _py_zvalue([0, 5], 4)
        assert vals[1]["z"] == _py_zvalue([0, 5], 4)
        assert vals[2]["z"] == _py_zvalue([15, 5], 4)

    def test_zvalue_envelope_guard(self):
        with pytest.raises(ValueError):
            pt.zorder_value([("a", 0, 1)] * 8, bits=8)  # 64 bits > 63

    def test_layout_clusters_both_dimensions(self, spark):
        # 64x64 grid shuffled; 16 z-ordered partitions should give every
        # partition a compact range in BOTH x and y, unlike an x-only sort
        # (tight x, full-span y) or a random layout (full span in both).
        rows = [(x, y) for x in range(64) for y in range(64)]
        df = spark.createDataFrame(rows, "x int, y int").repartition(16)
        laid = pt.zorder_layout(df, ["x", "y"], n_files=16, bits=6)
        spans = (
            laid.groupBy(F.spark_partition_id().alias("p"))
            .agg(
                (F.max("x") - F.min("x")).alias("sx"),
                (F.max("y") - F.min("y")).alias("sy"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        assert sum(r["n"] for r in spans) == 64 * 64  # layout loses nothing
        # weighted mean span ≤ half the full range on BOTH dims (ideal
        # 16-tile z-layout gives ~16-unit tiles; random gives ~63)
        tot = sum(r["n"] for r in spans)
        mx = sum(r["sx"] * r["n"] for r in spans) / tot
        my = sum(r["sy"] * r["n"] for r in spans) / tot
        assert mx < 32, mx
        assert my < 32, my

    def test_layout_preserves_rows_and_schema(self, spark):
        df = spark.createDataFrame(
            [(i, i * 3 % 17, f"r{i}") for i in range(500)], "a int, b int, s string"
        )
        out = pt.zorder_layout(df, ["a", "b"], n_files=4)
        assert out.columns == ["a", "b", "s"]  # __z dropped
        assert sorted(tuple(r) for r in out.collect()) == sorted(
            tuple(r) for r in df.collect()
        )

    def test_layout_all_null_column(self, spark):
        df = spark.createDataFrame([(None, i) for i in range(20)], "a int, b int")
        out = pt.zorder_layout(df, ["a", "b"], n_files=2)
        assert out.count() == 20

    def test_layout_timestamp_and_date_columns(self, spark):
        df = spark.createDataFrame(
            [(f"2024-0{1 + i % 9}-1{i % 8} 0{i % 9}:00:00",) for i in range(60)],
            "s string",
        ).selectExpr("CAST(s AS TIMESTAMP) AS ts", "CAST(s AS DATE) AS d")
        out = pt.zorder_layout(df, ["ts", "d"], n_files=4)
        assert out.count() == 60 and out.columns == ["ts", "d"]

    def test_layout_timestamp_ntz_column(self, spark):
        # TIMESTAMP_NTZ can't cast straight to double (DATATYPE_MISMATCH
        # on Spark 4.x) — the layout must route it via epoch micros, and
        # the Z-ordering must actually cluster on it.
        df = spark.createDataFrame(
            [(f"2024-0{1 + i % 9}-1{i % 8} 0{i % 9}:00:00", i % 7) for i in range(60)],
            "s string, v int",
        ).selectExpr("CAST(s AS TIMESTAMP_NTZ) AS tsn", "v")
        assert df.schema["tsn"].dataType.typeName() == "timestamp_ntz"
        out = pt.zorder_layout(df, ["tsn", "v"], n_files=4)
        assert out.count() == 60 and out.columns == ["tsn", "v"]

    def test_layout_rejects_string_column(self, spark):
        df = spark.createDataFrame([(1, "x")], "a int, s string")
        with pytest.raises(TypeError, match="numeric surrogate"):
            pt.zorder_layout(df, ["a", "s"], n_files=2)


class TestSaltedAggregation:
    def test_salted_count_matches_direct(self, spark):
        # heavily skewed: 90% of rows share one key
        df = spark.range(0, 20000).select(
            F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
                F.concat(F.lit("k"), (F.col("id") % 50).cast("string"))
            ).alias("key")
        )
        direct = {r["key"]: r["n"] for r in
                  df.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()}
        salted = {r["key"]: r["n"] for r in
                  pt.salted_group_count(df, "key", n_salts=8).collect()}
        assert salted == direct
        assert salted["hot"] == 18000

    def test_salt_is_deterministic(self, spark):
        df = spark.range(0, 100).select(F.col("id").cast("string").alias("key"))
        a = [r["__salt"] for r in pt.salt_keys(df, "key").orderBy("key").collect()]
        b = [r["__salt"] for r in pt.salt_keys(df, "key").orderBy("key").collect()]
        assert a == b
        assert len(set(a)) > 1  # actually spreads
