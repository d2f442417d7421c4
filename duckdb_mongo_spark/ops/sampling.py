"""Deterministic hash-based sampling and dataset splits.

Training-data pipelines need sampling that is (a) reproducible across
runs and engines, (b) stable under repartitioning/retries, and (c) free
of coordination — Spark's ``df.sample``/``sampleBy`` are seeded per
partition, so adding an executor or reordering input changes the picked
rows. Hashing a KEY column instead makes membership a pure function of
the row: every engine (and the DuckDB oracle) agrees on exactly which
rows are in.

All operators are single-projection/filter map work — NO shuffle, no
UDF, whole-stage-codegen'd md5 — so they cost one scan at any corpus
size and compose with pushdown (the filter sits right above the scan).

Bucket function: first 15 hex chars of ``md5(salt || ':' || key)`` → a
60-bit integer → ``% 1_000_000`` (ppm resolution). The DuckDB oracle
form is ``CAST('0x' || substring(md5(...), 1, 15) AS BIGINT) %
1000000`` — bit-identical, same trick the dedup/minhash oracles use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def hash_bucket(key: Column, salt: str = "", buckets: int = PPM) -> Column:
    """Uniform bucket in [0, buckets) as a pure function of (salt, key).

    15 hex chars = 60 bits — exact in BIGINT on both engines (16 would
    overflow the signed 64-bit range)."""
    s = key.cast("string")
    if salt:
        s = F.concat(F.lit(f"{salt}:"), s)
    return (F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint") % buckets)


def hash_sample(df: DataFrame, key_col: str, fraction: float, salt: str = "") -> DataFrame:
    """Keep ~``fraction`` of rows, chosen deterministically by key hash.

    Same (key, salt) → same decision on every run, engine, partition
    layout, and subset of the data — the property that makes held-out
    sets stay held out when the corpus is re-sharded or incrementally
    extended. Zero-shuffle: compiles to scan + filter.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(hash_bucket(F.col(key_col), salt) < int(round(fraction * PPM)))


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Label every row with a split name ("train"/"val"/"test"/...) by
    contiguous hash-bucket ranges; fractions must sum to ≤ 1 (rows past
    the total get NULL — drop or treat as holdout).

    One added column, no shuffle; a partitioned write
    (``.write.partitionBy(split_col)``) then materializes all splits in
    a single pass over the corpus instead of one filtered scan per
    split.
    """
    if not splits:
        raise ValueError("splits must be non-empty")
    total = sum(splits.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    if any(v < 0 for v in splits.values()):
        raise ValueError("split fractions must be non-negative")
    bucket = hash_bucket(F.col(key_col), salt)
    expr = None
    lo = 0.0
    for name, frac in splits.items():
        hi = lo + frac
        cond = (bucket >= int(round(lo * PPM))) & (bucket < int(round(hi * PPM)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    return df.withColumn(split_col, expr)


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: each value of ``strata_col``
    keeps its own fraction (e.g. downsample dominant languages, keep
    all of rare ones). Unlisted strata keep ``default``.

    The threshold is a CASE over ``strata_col`` — still a single
    map-side filter, no per-stratum scans and no shuffle, unlike
    ``df.stat.sampleBy`` which is also non-deterministic under
    repartitioning.
    """
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for stratum {k!r} must be in [0, 1], got {v}")
    if not 0.0 <= default <= 1.0:
        raise ValueError(f"default fraction must be in [0, 1], got {default}")
    thresh = None
    for name, frac in fractions.items():
        cond = F.col(strata_col) == name
        val = F.lit(int(round(frac * PPM)))
        thresh = F.when(cond, val) if thresh is None else thresh.when(cond, val)
    thresh = (
        F.lit(int(round(default * PPM)))
        if thresh is None
        else thresh.otherwise(int(round(default * PPM)))
    )
    return df.filter(hash_bucket(F.col(key_col), salt) < thresh)


def weighted_hash_sample(
    df: DataFrame,
    key_col: str,
    weight: Column | str,
    salt: str = "",
) -> DataFrame:
    """Per-row keep-probability sampling: keep a row iff its hash bucket
    falls under ``weight`` (a column/expression in [0, 1], e.g. a quality
    score) — deterministic per (salt, key) like the uniform variant.

    The standard quality-weighted corpus selection: rows keep
    independently with probability = weight, but reproducibly — re-runs
    and engine changes keep exactly the same rows. Out-of-range weights
    are clamped; NULL and NaN weights drop the row (NaN would otherwise
    clamp to 1.0 — Spark orders NaN above every double). Zero-shuffle.
    """
    w = F.col(weight) if isinstance(weight, str) else weight
    wd = w.cast("double")
    clamped = F.least(F.greatest(wd, F.lit(0.0)), F.lit(1.0))
    thresh = F.when(F.isnan(wd), F.lit(0.0)).otherwise(clamped) * PPM
    return df.filter(hash_bucket(F.col(key_col), salt) < thresh)


def oracle_bucket_sql(key_expr: str, salt: str = "", buckets: int = PPM) -> str:
    """DuckDB SQL reproducing :func:`hash_bucket` bit-for-bit (for
    oracles and cross-engine audits)."""
    s = f"CAST({key_expr} AS VARCHAR)"
    if salt:
        s = f"'{salt}:' || {s}"
    return f"(CAST('0x' || substring(md5({s}), 1, 15) AS BIGINT) % {buckets})"
