"""Partitioning utilities for the 100 TB posture (NEW vs reference —
the reference's single-cursor scan has no partitioning story at all,
SURVEY §4.2).

- ``write_bucketed`` / ``co_located_join``: persist both sides bucketed
  and sorted by the join key so repeated big-big joins run WITHOUT a
  shuffle (SortMergeJoin over pre-bucketed scans — the standard warehouse
  layout for fact-fact joins that AQE cannot remove the exchange from).
- ``salted_group_count`` / ``salt_keys``: two-phase aggregation for
  skewed keys — explode each hot key into ``n_salts`` sub-keys, partial
  aggregate, then merge. AQE's skew-join splitting handles joins; this
  is the groupBy-side equivalent it does not cover.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ensure_min_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the input has fewer partitions
    than the session's default parallelism.

    Byte-based file splitting sizes scan partitions for SCAN cost, but
    the token/shingle/vector operators multiply work per input byte by
    ~100-500x (a 6 MB documents file explodes to 2.6M shingle rows), so
    a byte-sized split starves the cluster: measured at sf1, every
    documents stage ran 2 tasks on 32 cores and the dedup suite was
    ~6x slower than its compute cost. The repartition shuffles only the
    RAW input (small by premise when partitions are few); on a 100 TB
    corpus the input already carries >> defaultParallelism partitions
    and this is a no-op — exactly when the shuffle would be expensive.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — sizing probe only, never fail the op
        return df
    if current < target:
        return df.repartition(target)
    return df


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table.

    Both sides of a repeated join written with the SAME keys and bucket
    count join shuffle-free: each task reads matching bucket files.
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def co_located_join(
    spark, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two tables previously written with ``write_bucketed`` on the
    same keys/bucket count. The physical plan contains no Exchange on
    either side (verify with ``df.explain``)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def salt_keys(df: DataFrame, key: str, n_salts: int = 16, salt_col: str = "__salt") -> DataFrame:
    """Add a deterministic salt derived from the row (md5 of all columns)
    so hot keys spread over ``n_salts`` reducers. Deterministic → stable
    results and retry-safe tasks (no rand() in the shuffle key)."""
    h = F.conv(F.substring(F.md5(F.concat_ws("\x1f", *df.columns)), 1, 6), 16, 10)
    return df.withColumn(salt_col, (h % n_salts).cast("int"))


def salted_group_count(
    df: DataFrame, key: str, n_salts: int = 16
) -> DataFrame:
    """COUNT(*) per key via two-phase salted aggregation: partial count
    per (key, salt), then merge per key. Same result as a direct
    groupBy; the first shuffle spreads a hot key over ``n_salts``
    partitions instead of one."""
    salted = salt_keys(df, key, n_salts)
    partial = salted.groupBy(key, "__salt").agg(F.count(F.lit(1)).alias("__pc"))
    return partial.groupBy(key).agg(F.sum("__pc").cast("long").alias("n"))
