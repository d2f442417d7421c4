"""Sequence packing (ops/packing.py): invariants, determinism, BFD
quality bound, and exact parity with a straight-line local reference
implementation of the same algorithm.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from duckdb_mongo_spark.ops.packing import pack_sequences, packing_stats

BUDGET = 100


@pytest.fixture(scope="module")
def docs(spark):
    rng = random.Random(42)
    rows = [(f"d{i:04d}", rng.choice([5, 12, 30, 48, 55, 70, 95, 130])) for i in range(400)]
    return spark.createDataFrame(rows, "doc_id string, n_tokens long")


@pytest.fixture(scope="module")
def packed(docs):
    return pack_sequences(docs, "doc_id", "n_tokens", BUDGET, num_buckets=8).cache()


class TestInvariants:
    def test_every_doc_exactly_once(self, docs, packed):
        assert packed.count() == docs.count()
        assert packed.select("doc_id").distinct().count() == docs.count()

    def test_budget_respected(self, packed):
        over = (
            packed.filter(~F.col("oversized"))
            .groupBy("seq_id").agg(F.sum("n_tokens").alias("t"))
            .filter(F.col("t") > BUDGET)
        )
        assert over.count() == 0

    def test_oversized_isolated_and_flagged(self, packed):
        # every >budget doc sits alone in its own flagged sequence
        big = packed.filter(F.col("n_tokens") > BUDGET)
        assert big.count() > 0
        assert big.filter(~F.col("oversized")).count() == 0
        per_seq = packed.groupBy("seq_id").agg(
            F.count(F.lit(1)).alias("n"), F.max("oversized").alias("has_over")
        )
        assert per_seq.filter(F.col("has_over") & (F.col("n") > 1)).count() == 0

    def test_seq_pos_is_dense_order(self, packed):
        rows = packed.filter(~F.col("oversized")).groupBy("seq_id").agg(
            F.count(F.lit(1)).alias("n"), F.max("seq_pos").alias("mx"),
            F.min("seq_pos").alias("mn"),
        ).collect()
        for r in rows:
            assert r["mn"] == 0 and r["mx"] == r["n"] - 1

    def test_seq_id_embeds_bucket(self, packed):
        bad = packed.filter(F.shiftright("seq_id", 32) != F.col("bucket"))
        assert bad.count() == 0


class TestQualityAndDeterminism:
    def test_bfd_bound(self, packed):
        stats = packing_stats(packed, "n_tokens", BUDGET)
        assert stats.filter(~F.col("within_bound")).count() == 0
        # sanity: decent fill on this distribution
        avg_fill = stats.agg(F.avg("fill_ratio")).first()[0]
        assert avg_fill > 0.8

    def test_deterministic_across_partitionings(self, docs, packed):
        again = pack_sequences(
            docs.repartition(13), "doc_id", "n_tokens", BUDGET, num_buckets=8
        )
        a = {tuple(r) for r in packed.collect()}
        b = {tuple(r) for r in again.collect()}
        assert a == b

    def test_salt_changes_buckets(self, docs):
        a = pack_sequences(docs, "doc_id", "n_tokens", BUDGET, num_buckets=8, salt="x")
        base = {r["doc_id"]: r["bucket"] for r in a.collect()}
        b = pack_sequences(docs, "doc_id", "n_tokens", BUDGET, num_buckets=8)
        other = {r["doc_id"]: r["bucket"] for r in b.collect()}
        assert base != other

    def test_matches_local_reference(self, docs, packed):
        """Exact parity with a straight-line single-process BFD over the
        same bucket assignment (the distributed op must equal the
        obvious local algorithm, not merely satisfy invariants)."""
        from bisect import bisect_left, insort

        rows = docs.collect()
        buckets = {
            r["doc_id"]: r["b"]
            for r in docs.select(
                "doc_id",
                __import__("duckdb_mongo_spark.ops.sampling", fromlist=["hash_bucket"])
                .hash_bucket(F.col("doc_id"), "", 8).alias("b"),
            ).collect()
        }
        expect = {}
        for bucket in sorted(set(buckets.values())):
            items = sorted(
                [(r["doc_id"], r["n_tokens"]) for r in rows if buckets[r["doc_id"]] == bucket],
                key=lambda x: (-x[1], x[0]),
            )
            open_bins, n_bins = [], 0
            for doc_id, tok in items:
                if tok > BUDGET:
                    expect[doc_id] = (bucket << 32) + n_bins
                    n_bins += 1
                    continue
                i = bisect_left(open_bins, (tok, -1))
                if i < len(open_bins):
                    rem, bin_id = open_bins.pop(i)
                    rem -= tok
                else:
                    bin_id, rem = n_bins, BUDGET - tok
                    n_bins += 1
                expect[doc_id] = (bucket << 32) + bin_id
                if rem > 0:
                    insort(open_bins, (rem, bin_id))
        got = {r["doc_id"]: r["seq_id"] for r in packed.collect()}
        assert got == expect


class TestHypothesis:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=10, deadline=None)
    @given(
        sizes=st.lists(st.integers(min_value=1, max_value=150), min_size=0, max_size=60),
        budget=st.integers(min_value=1, max_value=120),
    )
    def test_invariants_random(self, docs, sizes, budget):
        spark = docs.sparkSession
        rows = [(f"h{i:03d}", s) for i, s in enumerate(sizes)]
        if not rows:
            return
        df = spark.createDataFrame(rows, "doc_id string, n_tokens long")
        out = pack_sequences(df, "doc_id", "n_tokens", budget, num_buckets=3).collect()
        assert len(out) == len(rows)
        assert len({r["doc_id"] for r in out}) == len(rows)
        per_seq: dict = {}
        for r in out:
            per_seq.setdefault(r["seq_id"], []).append(r)
        for members in per_seq.values():
            if any(m["oversized"] for m in members):
                assert len(members) == 1
                assert members[0]["n_tokens"] > budget
            else:
                assert sum(m["n_tokens"] for m in members) <= budget


class TestValidation:
    def test_bad_budget(self, docs):
        with pytest.raises(ValueError):
            pack_sequences(docs, "doc_id", "n_tokens", 0)

    def test_bad_buckets(self, docs):
        with pytest.raises(ValueError):
            pack_sequences(docs, "doc_id", "n_tokens", 10, num_buckets=0)
