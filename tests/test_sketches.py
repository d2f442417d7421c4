"""Frequency sketches (ops/sketches.py): heavy hitters with exact-verify
guarantee, Count-Min construction against a DuckDB oracle, estimate
bounds, and mergeability."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_mongo_spark.ops import sketches


@pytest.fixture(scope="module")
def skewed(spark):
    # zipf-ish: key "k0" appears 5000x, "k1" 2500x, ... long tail of
    # singletons; shuffled deterministically across partitions
    rows = []
    for i in range(8):
        rows += [f"k{i}"] * (5000 // (i + 1))
    rows += [f"tail{j}" for j in range(4000)]
    df = spark.createDataFrame([(v,) for v in rows], "v string")
    return df.repartition(16, F.crc32(F.col("v")))  # spread keys around


class TestHeavyHitters:
    def test_topk_matches_exact_groupby(self, spark, skewed):
        exact = {
            r["v"]: r["n"]
            for r in skewed.groupBy("v").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        top_true = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:8]
        got = sketches.heavy_hitters(skewed, "v", k=8).collect()
        assert [(r["value"], r["count"]) for r in got] == top_true

    def test_counts_are_exact_not_estimates(self, spark, skewed):
        got = sketches.heavy_hitters(skewed, "v", k=3).collect()
        assert got[0]["value"] == "k0" and got[0]["count"] == 5000

    def test_nulls_ignored(self, spark):
        df = spark.createDataFrame(
            [("a",)] * 5 + [(None,)] * 10 + [("b",)] * 3, "v string"
        )
        got = sketches.heavy_hitters(df, "v", k=2).collect()
        assert [(r["value"], r["count"]) for r in got] == [("a", 5), ("b", 3)]

    def test_numeric_column(self, spark):
        df = spark.createDataFrame([(i % 5,) for i in range(100)], "v int")
        got = sketches.heavy_hitters(df, "v", k=5).collect()
        assert all(r["count"] == 20 for r in got)
        assert sorted(r["value"] for r in got) == [0, 1, 2, 3, 4]

    def test_capacity_validation(self, spark, skewed):
        with pytest.raises(ValueError, match="capacity"):
            sketches.heavy_hitters(skewed, "v", k=10, capacity=5)

    def test_max_candidates_guard_disables_broadcast(self, spark, skewed):
        # r4 verdict item 5: partitions x capacity bounds the candidate
        # set; past max_candidates the verify join must NOT broadcast
        # (a 100k-partition scan at capacity 160 would broadcast 16M
        # rows). The degraded plan is a shuffle join — same rows.
        small = sketches.heavy_hitters(skewed, "v", k=4)
        guarded = sketches.heavy_hitters(skewed, "v", k=4, max_candidates=1)
        plan_small = small._jdf.queryExecution().executedPlan().toString()
        plan_guarded = guarded._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan_small
        assert "BroadcastHashJoin" not in plan_guarded
        assert sorted(map(tuple, small.collect())) == sorted(
            map(tuple, guarded.collect())
        )


class TestCountMin:
    DEPTH, WIDTH = 4, 512

    def _exact(self, df):
        return {
            r["v"]: r["n"]
            for r in df.groupBy("v").agg(F.count(F.lit(1)).alias("n")).collect()
        }

    def test_estimates_never_undercount(self, spark, skewed):
        sk = sketches.count_min_sketch(skewed, "v", self.DEPTH, self.WIDTH)
        exact = self._exact(skewed)
        probes = skewed.select("v").distinct().limit(200)
        est = {
            r["value"]: r["estimate"]
            for r in sketches.cms_lookup(sk, probes, "v", self.DEPTH, self.WIDTH).collect()
        }
        n = sum(exact.values())
        for v, e in est.items():
            assert e >= exact[v], (v, e, exact[v])
            assert e <= exact[v] + 2 * n / self.WIDTH * self.DEPTH  # loose bound

    def test_heavy_key_estimate_tight(self, spark, skewed):
        sk = sketches.count_min_sketch(skewed, "v", self.DEPTH, self.WIDTH)
        probes = spark.createDataFrame([("k0",)], "v string")
        est = sketches.cms_lookup(sk, probes, "v", self.DEPTH, self.WIDTH).collect()
        n = skewed.count()
        assert 5000 <= est[0]["estimate"] <= 5000 + 2 * n / self.WIDTH

    def test_sketch_size_bounded(self, spark, skewed):
        sk = sketches.count_min_sketch(skewed, "v", self.DEPTH, self.WIDTH)
        assert sk.count() <= self.DEPTH * self.WIDTH
        # total mass per row = number of non-null inputs
        n = skewed.count()
        per_row = {r["row"]: r["s"] for r in
                   sk.groupBy("row").agg(F.sum("count").alias("s")).collect()}
        assert all(v == n for v in per_row.values())

    def test_duckdb_oracle_reproduces_sketch(self, spark):
        # the md5-derived bucketing is engine-portable: DuckDB rebuilds
        # the identical sparse sketch from the same rows
        import duckdb

        vals = [f"v{i % 37}" for i in range(500)]
        df = spark.createDataFrame([(v,) for v in vals], "v string")
        sk = sketches.count_min_sketch(df, "v", depth=3, width=64)
        got = sorted(
            (r["row"], r["bucket"], r["count"]) for r in sk.collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE t(v VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
        rows = con.execute("""
            WITH e AS (
                SELECT j.row AS row,
                       CAST(CAST('0x' || substring(md5(j.row || ':' || v), 1, 8)
                            AS BIGINT) % 64 AS INT) AS bucket
                FROM t, (SELECT unnest(['0','1','2']) AS row) j
            )
            SELECT CAST(row AS INT), bucket, COUNT(*) FROM e
            GROUP BY 1, 2 ORDER BY 1, 2
        """).fetchall()
        assert got == [tuple(r) for r in rows]

    def test_merge_equals_sketch_of_union(self, spark):
        a = spark.createDataFrame([(f"x{i % 11}",) for i in range(200)], "v string")
        b = spark.createDataFrame([(f"x{i % 7}",) for i in range(150)], "v string")
        sk_a = sketches.count_min_sketch(a, "v", 3, 128)
        sk_b = sketches.count_min_sketch(b, "v", 3, 128)
        merged = sketches.cms_merge(sk_a, sk_b)
        direct = sketches.count_min_sketch(a.unionByName(b), "v", 3, 128)
        key = lambda r: (r["row"], r["bucket"])  # noqa: E731
        assert sorted(
            (r["row"], r["bucket"], r["count"]) for r in merged.collect()
        ) == sorted(
            (r["row"], r["bucket"], r["count"]) for r in direct.collect()
        )

    def test_absent_value_estimates_from_empty_buckets(self, spark):
        df = spark.createDataFrame([("a",)] * 10, "v string")
        sk = sketches.count_min_sketch(df, "v", 4, 1024)
        probes = spark.createDataFrame([("never-seen-zzz",)], "v string")
        est = sketches.cms_lookup(sk, probes, "v", 4, 1024).collect()
        # with width 1024 and one distinct input key, at least one of the
        # 4 rows almost surely has an empty bucket for the probe -> 0
        assert est[0]["estimate"] in (0, 10)
