"""Deterministic hash sampling/splits vs DuckDB oracle.

The engine-independence claim is the point: the same rows must be
selected by Spark and by the DuckDB SQL form of the bucket function.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_mongo_spark.ops.sampling import (
    PPM,
    hash_bucket,
    hash_sample,
    hash_split,
    oracle_bucket_sql,
    stratified_hash_sample,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    import __spark_entry__ as entry

    return entry._load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def con(sf_dir):
    from _oracle import duckdb_con

    return duckdb_con(sf_dir)


class TestHashSample:
    def test_matches_duckdb_exactly(self, docs, con):
        got = sorted(
            r.doc_id for r in hash_sample(docs, "doc_id", 0.25, salt="s1").select("doc_id").collect()
        )
        want = [
            r[0] for r in con.execute(
                f"SELECT doc_id FROM documents WHERE {oracle_bucket_sql('doc_id', 's1')}"
                f" < {int(0.25 * PPM)} ORDER BY doc_id"
            ).fetchall()
        ]
        assert got == want
        assert 0 < len(got) < docs.count()

    def test_stable_under_repartition(self, docs):
        base = sorted(r.doc_id for r in hash_sample(docs, "doc_id", 0.3).select("doc_id").collect())
        reparted = sorted(
            r.doc_id
            for r in hash_sample(docs.repartition(17), "doc_id", 0.3).select("doc_id").collect()
        )
        assert base == reparted

    def test_subset_membership_is_stable(self, docs):
        # a row's in/out decision must not depend on which other rows exist
        full = {r.doc_id for r in hash_sample(docs, "doc_id", 0.5).select("doc_id").collect()}
        half_corpus = docs.filter(F.col("doc_id") % 2 == 0)
        sub = {r.doc_id for r in hash_sample(half_corpus, "doc_id", 0.5).select("doc_id").collect()}
        assert sub == {d for d in full if d % 2 == 0}

    def test_fraction_roughly_honored(self, docs):
        n = docs.count()
        k = hash_sample(docs, "doc_id", 0.5).count()
        assert abs(k / n - 0.5) < 0.1

    def test_salt_changes_selection(self, docs):
        a = {r.doc_id for r in hash_sample(docs, "doc_id", 0.5, salt="a").select("doc_id").collect()}
        b = {r.doc_id for r in hash_sample(docs, "doc_id", 0.5, salt="b").select("doc_id").collect()}
        assert a != b

    def test_rejects_bad_fraction(self, docs):
        with pytest.raises(ValueError):
            hash_sample(docs, "doc_id", 1.5)


class TestHashSplit:
    def test_partition_of_corpus(self, docs, con):
        out = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
        counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert set(counts) == {"train", "val", "test"}  # no NULL bucket: fractions sum to 1
        assert sum(counts.values()) == docs.count()
        assert counts["train"] > counts["val"]
        # spot-check the val split against DuckDB
        got = sorted(r.doc_id for r in out.filter(F.col("split") == "val").select("doc_id").collect())
        b = oracle_bucket_sql("doc_id")
        want = [
            r[0] for r in con.execute(
                f"SELECT doc_id FROM documents WHERE {b} >= {int(0.8 * PPM)}"
                f" AND {b} < {int(0.9 * PPM)} ORDER BY doc_id"
            ).fetchall()
        ]
        assert got == want

    def test_incomplete_fractions_leave_null(self, spark):
        df = spark.range(1000)
        out = hash_split(df, "id", {"a": 0.3})
        null_n = out.filter(F.col("split").isNull()).count()
        assert 0 < null_n < 1000

    def test_rejects_oversum(self, spark):
        with pytest.raises(ValueError):
            hash_split(spark.range(1), "id", {"a": 0.8, "b": 0.3})
        with pytest.raises(ValueError, match="non-empty"):
            hash_split(spark.range(1), "id", {})

    def test_no_shuffle_in_plan(self, docs):
        plan = (
            hash_split(docs, "doc_id", {"train": 0.9, "test": 0.1})
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan


class TestStratifiedSample:
    def test_per_stratum_fractions(self, docs, con):
        out = stratified_hash_sample(
            docs, "doc_id", "lang", {"en": 0.1, "de": 1.0}, default=0.0, salt="st"
        )
        got = sorted((r.doc_id, r.lang) for r in out.select("doc_id", "lang").collect())
        b = oracle_bucket_sql("doc_id", "st")
        want = [
            tuple(r) for r in con.execute(
                f"""SELECT doc_id, lang FROM documents
                    WHERE {b} < CASE lang WHEN 'en' THEN {int(0.1 * PPM)}
                                          WHEN 'de' THEN {PPM} ELSE 0 END
                    ORDER BY doc_id"""
            ).fetchall()
        ]
        assert got == want
        langs = {r.lang for r in out.select("lang").distinct().collect()}
        assert langs <= {"en", "de"}

    def test_default_applies_to_unlisted(self, docs):
        out = stratified_hash_sample(docs, "doc_id", "lang", {"en": 0.0}, default=1.0)
        assert out.filter(F.col("lang") == "en").count() == 0
        assert out.count() == docs.filter(F.col("lang") != "en").count()


class TestWeightedSample:
    def test_matches_duckdb_and_clamps(self, docs, con):
        from duckdb_mongo_spark.ops.sampling import weighted_hash_sample

        # weight from data: longer docs keep with higher probability;
        # the *2e-4 factor pushes some docs over 1.0 to exercise clamping
        w = (F.col("n_chars") * 2e-4)
        got = sorted(
            r.doc_id
            for r in weighted_hash_sample(docs, "doc_id", w, salt="wq").select("doc_id").collect()
        )
        b = oracle_bucket_sql("doc_id", "wq")
        want = [
            r[0] for r in con.execute(
                f"""SELECT doc_id FROM documents
                    WHERE {b} < LEAST(GREATEST(n_chars * 2e-4, 0.0), 1.0) * {PPM}
                    ORDER BY doc_id"""
            ).fetchall()
        ]
        assert got == want
        assert 0 < len(got) < docs.count()

    def test_null_and_nan_weights_drop_row(self, spark):
        from duckdb_mongo_spark.ops.sampling import weighted_hash_sample

        df = spark.createDataFrame(
            [(1, None), (2, 1.0), (3, float("nan"))], "id int, w double"
        )
        got = [r.id for r in weighted_hash_sample(df, "id", "w").collect()]
        # NaN clamps to 1.0 under least/greatest (NaN sorts above all
        # doubles) — it must drop like NULL, not always-keep
        assert got == [2]


class TestBucketFunction:
    def test_range_and_determinism(self, spark):
        vals = (
            spark.range(500)
            .select(hash_bucket(F.col("id"), "x").alias("b"))
            .agg(F.min("b"), F.max("b"), F.count(F.lit(1)))
            .collect()[0]
        )
        assert vals[0] >= 0 and vals[1] < PPM

    def test_bucket_matches_reference_md5(self, spark):
        # the Spark expression must equal the portable definition
        # (md5 hex prefix as int) for arbitrary keys incl. unicode
        import hashlib

        keys = [str(i) for i in range(50)] + ["", "héllo wörld", "a b\tc", "0" * 64]
        df = spark.createDataFrame([(k,) for k in keys], "k string")
        got = {
            r.k: r.b
            for r in df.select("k", hash_bucket(F.col("k"), "s").alias("b")).collect()
        }
        for k in keys:
            want = int(hashlib.md5(f"s:{k}".encode()).hexdigest()[:15], 16) % PPM
            assert got[k] == want, k
