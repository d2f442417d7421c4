"""End-to-end training-data pipeline on the engine's own operators.

A runnable demonstration of the path a 100 TB text corpus takes from raw
documents to packed, sharded, verifiable training data:

    1. text analysis + quality scoring   (ops.text — JVM expressions only)
    2. exact dedup on content fingerprint, then MinHash-LSH near-dedup,
       keep each duplicate cluster's canonical member (ops.dedup —
       bucketed candidates, never all-pairs); embedding decontamination
       against eval probes via product-quantized ANN (ops.similarity —
       m-byte PQ codes, never full vectors)
    3. deterministic train/val split     (ops.sampling — md5 buckets,
       reproducible across runs and engines)
    4. token-window chunking             (ops.chunking — zero-shuffle HOF)
    5. sequence packing under a token budget (ops.packing — distributed
       best-fit-decreasing, md5-bucketed groups)
    6. sharded write + verifiable manifest (ops.sharding — DECIMAL-exact
       content checksums, corruption detectable per shard)

Every stage is DataFrame-native: the pipeline inherits partitioned
scans, AQE, and whole-stage codegen; the only Python in the hot path is
the Arrow-batched packing kernel. Run:

    python examples/training_data_pipeline.py [sf_dir] [out_dir]

defaults: /root/testdata/sf0.001, /tmp/training_pipeline_out
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_pipeline(spark, sf_dir: str, out_dir: str, min_quality: float = 0.2):
    from pyspark.sql import functions as F

    from duckdb_mongo_spark.ops import chunking, dedup, packing, sharding, similarity, text
    from duckdb_mongo_spark.ops.sampling import hash_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_raw = docs.count()

    # 1. analysis + quality gate (adds n_tokens/.../quality/lang_id/
    #    fingerprint — all codegen'd expressions, no UDFs)
    analyzed = text.with_analysis(docs, "text")
    kept = analyzed.filter(
        (F.col("quality") >= min_quality) & (F.col("n_tokens") >= 5)
    )

    # 2a. exact dedup on the rolling-hash content fingerprint
    kept = dedup.dedup_exact(kept, ["fingerprint"], "doc_id")
    # 2b. near-dedup: banded MinHash-LSH candidates -> candidate-restricted
    #     exact Jaccard -> connected components -> keep cluster minimum
    pairs = dedup.near_dup_pairs_minhash_lsh(
        kept, "doc_id", "text", threshold=0.8, k=8, bands=4
    )
    deduped = dedup.dedup_keep_canonical(kept, pairs, "doc_id")

    # 2c. embedding decontamination (ops.similarity PQ): compress the
    #     corpus embeddings to m-byte PQ codes (the 100 TB ANN storage
    #     path — codes instead of float vectors), then drop training
    #     docs whose embedding is an ANN top-k hit for an eval probe.
    #     Probes stand in for a held-out eval set; vec_id == doc_id in
    #     the driver testdata.
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = similarity.pq_train(emb, m=4, n_codes=64)
    codes = similarity.pq_encode(emb, books)
    probes = emb.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    contaminated = (
        similarity.pq_topk(probes, codes, books, k=2, metric="ip")
        .select(F.col("vec_id").alias("doc_id"))
        .distinct()
    )
    deduped = deduped.join(F.broadcast(contaminated), "doc_id", "left_anti")

    # 3. deterministic split: one added column, no shuffle; stable under
    #    reruns and engine changes (md5 buckets, salted)
    split = hash_split(
        deduped, "doc_id", {"train": 0.95, "val": 0.05}, salt="pipeline-v1"
    )
    train = split.filter(F.col("split") == "train")
    n_val = split.filter(F.col("split") == "val").count()

    # 4. overlapping token-window chunks sized for a 512-token context
    chunks = chunking.chunk_documents(
        train, id_col="doc_id", text_col="text",
        chunk_tokens=512, overlap_tokens=64,
    ).withColumn(
        "chunk_uid", F.concat_ws("#", F.col("doc_id"), F.col("chunk_idx"))
    )

    # 5. pack chunks into <= 2048-token sequences (distributed BFD)
    packed = packing.pack_sequences(
        chunks.select("chunk_uid", "n_chunk_tokens"),
        id_col="chunk_uid", tokens_col="n_chunk_tokens", budget=2048,
    )
    packed_chunks = chunks.join(packed.select("chunk_uid", "seq_id", "seq_pos"),
                                "chunk_uid")

    # 6. sharded write + manifest with DECIMAL-exact content checksums
    manifest = sharding.write_training_shards(
        packed_chunks.select("chunk_uid", "seq_id", "seq_pos", "chunk_text"),
        key_col="chunk_uid", path=out_dir, num_shards=8,
        content_cols=["chunk_text"],
    )
    return {
        "raw_docs": n_raw,
        "after_quality": kept.count(),
        "after_dedup": deduped.count(),
        "val_docs": n_val,
        "chunks": chunks.count(),
        "sequences": packed.select("seq_id").distinct().count(),
        "manifest": manifest,
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/training_pipeline_out"
    from duckdb_mongo_spark.session import get_spark

    stats = run_pipeline(get_spark("pipeline"), sf_dir, out_dir)
    for k, v in stats.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
