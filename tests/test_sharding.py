"""Deterministic output sharding (ops/sharding.py): membership
stability, manifest verification round-trip, and DuckDB parity of the
commutative content checksum.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_mongo_spark.ops.sharding import (
    assign_shards,
    shard_manifest,
    write_training_shards,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(0, 1000).select(
        F.concat(F.lit("doc"), F.col("id")).alias("doc_id"),
        (F.col("id") * 7 % 100).alias("payload"),
    )


class TestAssign:
    def test_range_and_determinism(self, docs):
        a = assign_shards(docs, "doc_id", 16)
        rows = a.collect()
        assert all(0 <= r["shard"] < 16 for r in rows)
        b = {r["doc_id"]: r["shard"] for r in assign_shards(docs.repartition(9), "doc_id", 16).collect()}
        assert {r["doc_id"]: r["shard"] for r in rows} == b

    def test_growth_stability(self, docs, spark):
        """Adding documents never moves existing ones between shards."""
        base = {r["doc_id"]: r["shard"] for r in assign_shards(docs, "doc_id", 16).collect()}
        grown = docs.unionByName(
            spark.range(1000, 1500).select(
                F.concat(F.lit("doc"), F.col("id")).alias("doc_id"),
                F.lit(0).alias("payload"),
            )
        )
        after = {r["doc_id"]: r["shard"] for r in assign_shards(grown, "doc_id", 16).collect()}
        assert all(after[k] == v for k, v in base.items())

    def test_validation(self, docs):
        with pytest.raises(ValueError):
            assign_shards(docs, "doc_id", 0)


class TestWriteAndManifest:
    def test_write_round_trip(self, docs, spark, tmp_path):
        path = str(tmp_path / "shards")
        manifest = write_training_shards(docs, "doc_id", path, 8,
                                         content_cols=["doc_id", "payload"])
        assert len(manifest) == 8
        assert sum(m["n_rows"] for m in manifest) == 1000
        back = spark.read.parquet(path)
        assert back.count() == 1000
        # per-shard recount matches the manifest
        got = {r["shard"]: r["n"] for r in
               back.groupBy("shard").agg(F.count("*").alias("n")).collect()}
        assert got == {m["shard"]: m["n_rows"] for m in manifest}
        # one file per shard directory
        import os
        for m in manifest:
            d = os.path.join(path, f"shard={m['shard']}")
            files = [f for f in os.listdir(d) if f.endswith(".parquet")]
            assert len(files) == 1

    def test_checksum_detects_corruption(self, docs, tmp_path):
        sharded = assign_shards(docs, "doc_id", 4)
        clean = {r["shard"]: r["content_sum"] for r in
                 shard_manifest(sharded, "doc_id", content_cols=["doc_id", "payload"]).collect()}
        tampered = sharded.withColumn(
            "payload",
            F.when(F.col("doc_id") == "doc7", F.col("payload") + 1).otherwise(F.col("payload")),
        )
        dirty = {r["shard"]: r["content_sum"] for r in
                 shard_manifest(tampered, "doc_id", content_cols=["doc_id", "payload"]).collect()}
        diff = [k for k in clean if clean[k] != dirty[k]]
        assert len(diff) == 1  # exactly the shard holding doc7

    def test_checksum_order_insensitive(self, docs):
        sharded = assign_shards(docs, "doc_id", 4)
        a = {r["shard"]: r["content_sum"] for r in shard_manifest(sharded, "doc_id").collect()}
        b = {r["shard"]: r["content_sum"] for r in
             shard_manifest(sharded.orderBy(F.desc("doc_id")), "doc_id").collect()}
        assert a == b

    def test_duckdb_checksum_parity(self, docs):
        """The manifest checksum is reproducible in DuckDB — a transfer
        target can verify shards without Spark."""
        import duckdb

        from duckdb_mongo_spark.ops.sampling import oracle_bucket_sql

        sharded = assign_shards(docs, "doc_id", 4)
        spark_manifest = {
            (r["shard"], r["n_rows"], r["content_sum"])
            for r in shard_manifest(sharded, "doc_id", content_cols=["doc_id", "payload"]).collect()
        }
        con = duckdb.connect()
        con.execute("""
            CREATE TABLE docs AS
            SELECT 'doc' || CAST(range AS VARCHAR) AS doc_id,
                   (range * 7 % 100) AS payload
            FROM range(0, 1000)
        """)
        rows = con.execute(f"""
            SELECT {oracle_bucket_sql('doc_id', buckets=4)} AS shard,
                   COUNT(*) AS n_rows,
                   CAST(SUM(CAST('0x' || substring(md5(doc_id || chr(31) || CAST(payload AS VARCHAR)), 1, 15) AS BIGINT)) AS DECIMAL(38,0)) AS content_sum
            FROM docs GROUP BY 1
        """).fetchall()
        norm = lambda s: {(sh, n, int(c)) for sh, n, c in s}
        assert norm(spark_manifest) == norm(set(rows))
