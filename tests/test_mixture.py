"""Data-mixture sampling (ops/sampling.mixture_plan / mixture_sample):
plan arithmetic, proportion targets, determinism, upsampling epochs,
and DuckDB-oracle parity for the no-upsample path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_mongo_spark.ops.sampling import (
    hash_sample,
    mixture_plan,
    mixture_sample,
    oracle_bucket_sql,
)


class TestMixturePlan:
    def test_downsample_only_auto_total(self):
        # binding source: code (1000 rows at weight .25 → total 4000)
        plan = mixture_plan({"web": 100_000, "code": 1_000}, {"web": 3, "code": 1})
        assert plan["code"] == {"take": 1000, "fraction": 1.0, "epochs": 0}
        assert plan["web"]["take"] == 3000
        assert plan["web"]["epochs"] == 0
        assert plan["web"]["fraction"] == pytest.approx(0.03)

    def test_upsample_epochs(self):
        plan = mixture_plan(
            {"wiki": 100, "web": 10_000}, {"wiki": 0.5, "web": 0.5},
            total_rows=460, allow_upsample=True,
        )
        assert plan["wiki"]["epochs"] == 2  # 230 needed / 100 = 2 full + 0.3
        assert plan["wiki"]["fraction"] == pytest.approx(0.3)
        assert plan["web"] == {"take": 230, "fraction": 0.023, "epochs": 0}

    def test_refuses_silent_upsample(self):
        with pytest.raises(ValueError, match="allow_upsample"):
            mixture_plan({"a": 10, "b": 10}, {"a": 1, "b": 1}, total_rows=100)

    def test_validation(self):
        with pytest.raises(ValueError):
            mixture_plan({}, {})
        with pytest.raises(ValueError, match="no counts"):
            mixture_plan({"a": 1}, {"a": 1, "b": 1})
        with pytest.raises(ValueError, match="non-negative"):
            mixture_plan({"a": 1}, {"a": -1})
        with pytest.raises(ValueError, match="empty"):
            mixture_plan({"a": 0}, {"a": 1}, total_rows=10)


@pytest.fixture(scope="module")
def sources(spark):
    web = spark.range(0, 4000).select(
        F.concat(F.lit("w"), F.col("id")).alias("doc_id"), F.lit("web text").alias("text")
    )
    code = spark.range(0, 500).select(
        F.concat(F.lit("c"), F.col("id")).alias("doc_id"), F.lit("code text").alias("text")
    )
    return {"web": web, "code": code}


class TestMixtureSample:
    def test_proportions_and_tags(self, sources):
        out = mixture_sample(sources, "doc_id", {"web": 3, "code": 1}).cache()
        by_src = {r["source"]: r["n"] for r in
                  out.groupBy("source").agg(F.count("*").alias("n")).collect()}
        # total 2000: web 1500, code 500 (hash sampling is ±ppm-exact on
        # the planned fraction, not on the realized count — allow 5%)
        assert by_src["code"] == 500
        assert by_src["web"] == pytest.approx(1500, rel=0.05)
        assert out.filter(F.col("epoch") != 0).count() == 0

    def test_deterministic(self, sources):
        a = {tuple(r) for r in mixture_sample(sources, "doc_id", {"web": 3, "code": 1}).collect()}
        b = {tuple(r) for r in mixture_sample(
            {k: v.repartition(7) for k, v in sources.items()}, "doc_id",
            {"web": 3, "code": 1}).collect()}
        assert a == b

    def test_no_upsample_equals_plain_hash_sample(self, sources):
        plan = mixture_plan({"web": 4000, "code": 500}, {"web": 3, "code": 1})
        out = mixture_sample(sources, "doc_id", {"web": 3, "code": 1})
        web_ids = {r["doc_id"] for r in out.filter(F.col("source") == "web").collect()}
        expect = {r["doc_id"] for r in
                  hash_sample(sources["web"], "doc_id", plan["web"]["fraction"]).collect()}
        assert web_ids == expect

    def test_upsample_epoch_column(self, sources):
        out = mixture_sample(
            sources, "doc_id", {"web": 1, "code": 4},
            total_rows=3000, allow_upsample=True,
        ).cache()
        code = out.filter(F.col("source") == "code")
        # need 2400 code rows from 500 → 4 full epochs + 0.8 partial
        assert code.filter(F.col("epoch") < 4).count() == 2000
        partial = code.filter(F.col("epoch") == 4).count()
        assert partial == pytest.approx(400, rel=0.1)
        # partial pass picks a re-salted subset, not a prefix duplicate
        # of epoch 0's rows only
        assert code.count() == pytest.approx(2400, rel=0.05)

    def test_oracle_parity_no_upsample(self, sources, tmp_path):
        """The no-upsample mixture is reproducible in DuckDB with the
        bucket SQL — cross-engine contract like the rest of ops/sampling."""
        import duckdb

        plan = mixture_plan({"web": 4000, "code": 500}, {"web": 3, "code": 1})
        out = mixture_sample(sources, "doc_id", {"web": 3, "code": 1})
        got = {(r["doc_id"], r["source"]) for r in out.collect()}

        con = duckdb.connect()
        con.execute(
            "CREATE TABLE web AS SELECT 'w' || CAST(range AS VARCHAR) AS doc_id FROM range(0, 4000)"
        )
        con.execute(
            "CREATE TABLE code AS SELECT 'c' || CAST(range AS VARCHAR) AS doc_id FROM range(0, 500)"
        )
        rows = con.execute(f"""
            SELECT doc_id, 'web' AS source FROM web
            WHERE {oracle_bucket_sql('doc_id')} < {int(round(plan['web']['fraction'] * 1_000_000))}
            UNION ALL
            SELECT doc_id, 'code' AS source FROM code
        """).fetchall()
        assert got == set(rows)
