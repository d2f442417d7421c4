"""End-to-end training-data curation pipeline over the driver's
documents table: quality filter → PII mask → exact-substring span dedup
→ chunk → pack → split → shard. Each stage is tested in isolation
elsewhere; this asserts the stages COMPOSE — schemas line up, row
accounting holds across the whole chain, and the final shards are
deterministic end to end (the property a reproducible 100 TB pipeline
actually needs).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_mongo_spark.ops.chunking import chunk_documents
from duckdb_mongo_spark.ops.packing import pack_sequences
from duckdb_mongo_spark.ops.pii import mask_pii
from duckdb_mongo_spark.ops.quality import gopher_quality_filter
from duckdb_mongo_spark.ops.sampling import hash_split
from duckdb_mongo_spark.ops.sharding import assign_shards, shard_manifest
from duckdb_mongo_spark.ops.span_dedup import duplicate_spans, remove_duplicate_spans

CHUNK, OVERLAP, BUDGET = 64, 8, 256


def _pipeline(spark, sf_dir):
    import __spark_entry__ as entry

    entry._views(spark, sf_dir, "documents")
    # subset: the pipeline's correctness properties are scale-free and
    # the full table pushes this integration test past 10 minutes
    docs = (
        spark.table("documents")
        .filter(F.col("doc_id") < 300)
        .select(F.col("doc_id").cast("string").alias("doc_id"), "text")
    )

    # 1. quality: annotate, don't drop yet (audit-friendly), then filter
    q = gopher_quality_filter(docs, min_tokens=5, keep_col="keep")
    kept = q.filter(F.col("keep")).select("doc_id", "text")

    # 2. PII mask (pure projection)
    masked = kept.withColumn("text", mask_pii(F.col("text")))

    # 3. exact-substring span dedup
    spans = duplicate_spans(masked, k=12, max_gram_freq=500)
    deduped = remove_duplicate_spans(masked, spans).select(
        "doc_id", F.col("dedup_text").alias("text"), "n_tokens_removed"
    )

    # 4. chunk into overlapping windows
    chunks = chunk_documents(deduped, chunk_tokens=CHUNK, overlap_tokens=OVERLAP)
    chunks = chunks.withColumn(
        "chunk_id", F.concat_ws(":", "doc_id", F.col("chunk_idx").cast("string"))
    ).filter(F.col("n_chunk_tokens") > 0)

    # 5. pack chunks into training sequences
    packed = pack_sequences(chunks, "chunk_id", "n_chunk_tokens", BUDGET, num_buckets=8)

    # 6. split + shard on the packed sequence id (keeps a sequence intact)
    seqs = packed.select("seq_id").distinct()
    split = hash_split(seqs, "seq_id", {"train": 0.9, "val": 0.1})
    sharded = assign_shards(split.filter(F.col("split") == "train"), "seq_id", 4)
    return docs, kept, deduped, chunks, packed, sharded


@pytest.fixture(scope="module")
def stages(spark, sf_dir):
    docs, kept, deduped, chunks, packed, sharded = _pipeline(spark, sf_dir)
    return {
        "docs": docs.cache(), "kept": kept.cache(), "deduped": deduped.cache(),
        "chunks": chunks.cache(), "packed": packed.cache(), "sharded": sharded.cache(),
    }


class TestComposition:
    def test_stage_row_accounting(self, stages):
        n_docs = stages["docs"].count()
        n_kept = stages["kept"].count()
        assert 0 < n_kept <= n_docs
        # dedup never drops documents, only tokens
        assert stages["deduped"].count() == n_kept
        # every surviving doc chunks to >= 1 chunk (empty-after-dedup docs
        # produce one empty chunk which stage 4 filters)
        n_chunked_docs = stages["chunks"].select("doc_id").distinct().count()
        empty_after_dedup = stages["deduped"].filter(F.col("text") == "").count()
        assert n_chunked_docs == n_kept - empty_after_dedup
        # packing covers every chunk exactly once
        assert stages["packed"].count() == stages["chunks"].count()

    def test_budget_respected_end_to_end(self, stages):
        over = (
            stages["packed"].filter(~F.col("oversized"))
            .groupBy("seq_id").agg(F.sum("n_chunk_tokens").alias("t"))
            .filter(F.col("t") > BUDGET)
        )
        assert over.count() == 0
        # chunk size <= CHUNK <= BUDGET, so nothing should be oversized
        assert stages["packed"].filter(F.col("oversized")).count() == 0

    def test_dedup_actually_removed_tokens(self, stages):
        """The synthetic documents corpus repeats sentence templates, so
        span dedup must find real duplication — a vacuously-passing
        pipeline would hide a broken stage."""
        removed = stages["deduped"].agg(F.sum("n_tokens_removed")).first()[0]
        assert removed and removed > 0

    def test_sharding_deterministic(self, spark, sf_dir, stages):
        again = _pipeline(spark, sf_dir)[5]
        a = {(r["seq_id"], r["shard"]) for r in stages["sharded"].collect()}
        b = {(r["seq_id"], r["shard"]) for r in again.collect()}
        assert a == b and a

    def test_manifest_covers_all_train_sequences(self, stages):
        manifest = shard_manifest(stages["sharded"], "seq_id")
        total = manifest.agg(F.sum("n_rows")).first()[0]
        assert total == stages["sharded"].count()
