"""Deterministic output sharding for training-data exports.

A training run consumes the corpus as numbered shard files whose
contents must be stable across re-runs (resumable downloads, cache
keys, reproducibility audits). ``assign_shards`` maps each row to a
shard as a pure function of its key — the same md5 contract as
``ops.sampling`` — so re-running the export on different cluster
shapes, orders, or engine versions produces byte-identical shard
membership. ``write_training_shards`` materializes them in ONE pass
(``partitionBy`` on the shard column) and returns a manifest with
per-shard row counts and order-insensitive content checksums.

Scale: shard assignment is a zero-shuffle projection; the write's
shuffle (repartition on shard) is the unavoidable one — it is what
physically groups a shard's rows. Shard count should target
~0.5-2 GB/shard at the destination; pass counts from a manifest to
size it without an extra count() job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duckdb_mongo_spark.ops.sampling import hash_bucket


def assign_shards(
    df: DataFrame,
    key_col: str,
    num_shards: int,
    salt: str = "",
    shard_col: str = "shard",
) -> DataFrame:
    """Add a ``shard`` column in [0, num_shards) as a pure function of
    (salt, key) — stable under repartitioning, retries, and corpus
    growth (a new document never moves existing ones between shards)."""
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    return df.withColumn(
        shard_col, hash_bucket(F.col(key_col).cast("string"), salt, num_shards)
    )


def shard_manifest(
    sharded: DataFrame,
    key_col: str,
    shard_col: str = "shard",
    content_cols: list[str] | None = None,
) -> DataFrame:
    """One row per shard: row count plus an ORDER-INSENSITIVE content
    checksum (sum of per-row 60-bit md5 prefixes in a DECIMAL(38,0)
    accumulator — commutative, exact to ~10^20 rows per shard, and
    computed identically by DuckDB so a transfer target can verify
    without Spark), for checking a transferred shard without re-reading
    the source.

    ``content_cols`` defaults to [key_col]; include payload columns to
    make the checksum cover content, not just membership.
    """
    cols = content_cols or [key_col]
    row_sig = F.conv(
        F.substring(F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])), 1, 15),
        16, 10,
    ).cast("decimal(38,0)")
    return (
        sharded.groupBy(shard_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(row_sig).cast("decimal(38,0)").alias("content_sum"),
        )
        .orderBy(shard_col)
    )


def write_training_shards(
    df: DataFrame,
    key_col: str,
    path: str,
    num_shards: int,
    salt: str = "",
    fmt: str = "parquet",
    content_cols: list[str] | None = None,
) -> list[dict]:
    """Export the corpus as ``num_shards`` deterministic shards in one
    pass and return the manifest (list of {shard, n_rows, content_sum}).

    Layout: ``{path}/shard={k}/part-*.{fmt}`` via ``partitionBy`` —
    every shard lands in its own directory, written concurrently from
    one scan of the input. Each shard directory holds exactly one file
    (repartition by the shard column first), which is what training
    loaders expect.
    """
    sharded = assign_shards(df, key_col, num_shards, salt)
    (
        sharded.repartition(num_shards, F.col("shard"))
        .write.mode("overwrite")
        .partitionBy("shard")
        .format(fmt)
        .save(path)
    )
    manifest = shard_manifest(sharded, key_col, content_cols=content_cols)
    return [r.asDict() for r in manifest.collect()]
