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
