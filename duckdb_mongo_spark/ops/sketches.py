"""Frequency sketches for high-cardinality columns: heavy hitters
(Misra–Gries candidates + exact verify) and a Count–Min sketch.

The 100 TB problem these solve: ``groupBy(key).count().orderBy(...)`` on
a column with billions of distinct values shuffles every distinct key.
Both operators here bound state instead:

- ``heavy_hitters``: per-partition Misra–Gries summaries (bounded at
  ``capacity`` counters per partition, one Arrow pass) produce a
  candidate set of at most partitions × capacity keys; a second pass
  counts ONLY the candidates exactly (broadcast semi-join + grouped
  count). Guarantee (pigeonhole over partitions): every key with global
  frequency > n/capacity is in the candidate set, so the returned top-k
  is exact whenever the true k-th frequency clears that bar.
- ``count_min_sketch`` / ``cms_lookup``: depth × width counter matrix
  built as ONE explode + grouped count (md5-derived row hashes, so a
  DuckDB oracle reproduces the sketch bit-for-bit); estimates are
  min over rows of the bucket counts — never underestimates, over-
  estimates by ≤ 2n/width with probability 1 - 2^-depth. Sketches are
  mergeable by adding counts (union = groupBy row,bucket sum).

Both keep the hot path in whole-stage codegen or Arrow batches — no
row-at-a-time Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duckdb_mongo_spark.ops.partitioning import ensure_min_parallelism


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 20,
    capacity: int | None = None,
    max_candidates: int = 4_000_000,
) -> DataFrame:
    """Top-k most frequent values of ``col`` with EXACT counts, without a
    full-cardinality shuffle.

    Output: ``(value, count)`` ordered by count desc, value asc — counts
    are exact for every returned row. ``capacity`` (default ``max(8k,
    64)``) is the per-partition Misra–Gries counter budget; any value
    with global frequency > n/capacity is guaranteed to be a candidate.

    ``max_candidates`` bounds the DRIVER-side cost of the verify pass:
    the candidate set is at most partitions × capacity rows, and the
    exact-count join broadcasts it (mirroring the semi-join ``max_keys``
    pattern in frame.py). On a 100k-partition scan at default capacity
    that upper bound is 16M rows — too big to broadcast — so past the
    threshold the verify join degrades to a plain shuffle join instead:
    identical results and guarantee, one extra shuffle of the (still
    candidate-restricted) fact side, zero driver materialization.
    """
    import pandas as pd

    capacity = capacity or max(8 * k, 64)
    if capacity < k:
        raise ValueError("capacity must be >= k")
    df = ensure_min_parallelism(df)
    vtype = df.schema[col].dataType.simpleString()

    def mg(batches):
        # one Misra–Gries summary per PARTITION (mapInPandas feeds all of
        # a partition's batches to one generator instance)
        counters: dict = {}
        for pdf in batches:
            for v in pdf[col]:
                if v is None:
                    continue
                c = counters.get(v)
                if c is not None:
                    counters[v] = c + 1
                elif len(counters) < capacity:
                    counters[v] = 1
                else:
                    # decrement-all step, dropping zeroed counters
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({"value": pd.Series(list(counters), dtype="object")})

    cands = (
        df.select(col)
        .mapInPandas(mg, schema=f"value {vtype}")
        .distinct()
        .withColumnRenamed("value", col)
    )
    candidate_bound = df.rdd.getNumPartitions() * capacity
    build = F.broadcast(cands) if candidate_bound <= max_candidates else cands
    exact = (
        df.join(build, col, "inner")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("count"))
    )
    return (
        exact.select(F.col(col).alias("value"), "count")
        .orderBy(F.col("count").desc(), F.col("value").asc())
        .limit(k)
    )


def _cms_bucket(col, row: int, width: int):
    """Row ``row``'s bucket for a value: md5-derived 32-bit hash mod
    width — engine-portable (a DuckDB oracle reproduces it exactly)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{row}:"), col.cast("string"))), 1, 8),
        16, 10,
    ).cast("long")
    return (h % width).cast("int")


def count_min_sketch(
    df: DataFrame,
    col: str,
    depth: int = 5,
    width: int = 2048,
) -> DataFrame:
    """Count–Min sketch of ``col`` as a sparse ``(row, bucket, count)``
    DataFrame (at most depth × width rows regardless of input size).

    One explode (depth rows per input row, all codegen) + one grouped
    count with map-side combine: shuffle bounded at depth × width
    per partition. NULLs are excluded (consistent with COUNT(col)).
    Merge two sketches with identical (depth, width) by unioning and
    summing counts per (row, bucket).
    """
    if depth < 1 or width < 2:
        raise ValueError("depth must be >= 1 and width >= 2")
    df = ensure_min_parallelism(df)
    c = F.col(col)
    rows = F.explode(
        F.array(*[
            F.struct(
                F.lit(j).alias("row"), _cms_bucket(c, j, width).alias("bucket")
            )
            for j in range(depth)
        ])
    )
    return (
        df.filter(c.isNotNull())
        .select(rows.alias("rb"))
        .select(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def cms_lookup(
    sketch: DataFrame,
    values: DataFrame,
    col: str,
    depth: int = 5,
    width: int = 2048,
) -> DataFrame:
    """Point-frequency estimates for ``values[col]`` against a sketch
    built with the same (depth, width): min over rows of the bucket
    counts. Output: ``(value, estimate)``; a value hashing only to empty
    buckets estimates 0.

    The probe side re-derives each value's (row, bucket) pairs with the
    same hash, joins the (small) sketch broadcast, and takes the min —
    estimates never undercount and overcount by ≤ 2n/width w.h.p.
    """
    c = F.col(col)
    probes = values.select(c.alias("value")).distinct().select(
        "value",
        F.explode(F.array(*[
            F.struct(
                F.lit(j).alias("row"),
                _cms_bucket(F.col("value"), j, width).alias("bucket"),
            )
            for j in range(depth)
        ])).alias("rb"),
    ).select("value", F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left").select(
        "value", F.coalesce(F.col("count"), F.lit(0)).alias("count")
    )
    return joined.groupBy("value").agg(F.min("count").alias("estimate"))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two sketches of identical (depth, width): counts add."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("count").alias("count"))
    )
