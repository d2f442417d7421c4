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


def mixture_plan(
    counts: dict[str, int],
    target_weights: dict[str, float],
    total_rows: int | None = None,
    allow_upsample: bool = False,
) -> dict[str, dict]:
    """Solve a data-mixture recipe into per-source take plans.

    ``target_weights``: desired corpus proportions per source (they are
    normalized, so {"web": 3, "code": 1} means 75/25). Without
    ``total_rows`` the mixture is scaled as large as the sources allow:
    the binding source is the one with the smallest count/weight ratio
    (no upsampling), or the largest ratio bounds nothing when
    ``allow_upsample`` is set and ``total_rows`` is given.

    Returns {source: {"take": n, "fraction": f, "epochs": e}} where
    ``epochs`` is the number of FULL passes over the source (≥ 1 only
    when upsampling) and ``fraction`` the hash-sample fraction applied
    to the final partial pass. take = count * (epochs - 1 + fraction).
    """
    if not target_weights:
        raise ValueError("target_weights must be non-empty")
    missing = [s for s in target_weights if s not in counts]
    if missing:
        raise ValueError(f"no counts for sources {missing}")
    if any(w < 0 for w in target_weights.values()):
        raise ValueError("weights must be non-negative")
    wsum = float(sum(target_weights.values()))
    if wsum <= 0:
        raise ValueError("weights must sum to > 0")
    w = {s: v / wsum for s, v in target_weights.items()}
    if total_rows is None:
        # largest total for which no source needs upsampling
        total_rows = int(min(counts[s] / v for s, v in w.items() if v > 0))
    plan = {}
    for s, v in w.items():
        need = v * total_rows
        cnt = counts[s]
        if cnt <= 0:
            if need > 0:
                raise ValueError(f"source {s!r} is empty but has weight {v}")
            plan[s] = {"take": 0, "fraction": 0.0, "epochs": 0}
            continue
        if need > cnt and not allow_upsample:
            raise ValueError(
                f"source {s!r} needs {need:.0f} rows but has {cnt}; "
                "pass allow_upsample=True or lower total_rows"
            )
        if need <= cnt:  # plain (possibly full) downsample: no epochs
            epochs, frac = 0, need / cnt
        else:
            epochs = int(need // cnt)
            frac = (need - epochs * cnt) / cnt
        plan[s] = {"take": int(round(need)), "fraction": round(frac, 6), "epochs": epochs}
    return plan


def mixture_sample(
    sources: dict[str, DataFrame],
    key_col: str,
    target_weights: dict[str, float],
    total_rows: int | None = None,
    allow_upsample: bool = False,
    salt: str = "",
    counts: dict[str, int] | None = None,
    source_col: str = "source",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Assemble a training mixture with target source proportions,
    deterministically.

    The standard pretraining recipe step (weighting web/code/books/...
    sources): each source is hash-sampled to its planned fraction and
    tagged with ``source``; with ``allow_upsample`` a source can repeat
    for ``epochs`` full passes (tagged 0..e-1 in ``epoch``) plus a
    deterministic partial pass — matching how data mixtures express
    "2.3 epochs of Wikipedia".

    ``counts`` skips the one count() job per source when sizes are known
    (a 100 TB pipeline should pass manifest counts). Sampling itself is
    the zero-shuffle ``hash_sample``; the union is a metadata-only plan
    node. Per-epoch partial passes use salted sub-samples so epoch k's
    partial rows differ from epoch k+1's (salt = f"{salt}:e{k}").
    """
    if not sources:
        raise ValueError("sources must be non-empty")
    if counts is None:
        counts = {s: df.count() for s, df in sources.items()}
    plan = mixture_plan(counts, target_weights, total_rows, allow_upsample)
    parts = []
    for s, df in sources.items():
        if s not in plan or plan[s]["take"] == 0:
            continue
        spec = plan[s]
        for e in range(spec["epochs"]):
            parts.append(
                df.withColumn(source_col, F.lit(s)).withColumn(epoch_col, F.lit(e))
            )
        if spec["fraction"] > 0:
            # epoch 0's partial pass keeps the caller's salt unchanged so
            # a no-upsample mixture equals plain per-source hash_sample
            # (oracle-friendly); later epochs' partials re-salt so they
            # pick different rows than earlier passes
            esalt = salt if spec["epochs"] == 0 else f"{salt}:e{spec['epochs']}"
            parts.append(
                hash_sample(df, key_col, spec["fraction"], esalt)
                .withColumn(source_col, F.lit(s))
                .withColumn(epoch_col, F.lit(spec["epochs"]))
            )
    if not parts:
        raise ValueError("mixture plan selected zero rows from every source")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def oracle_bucket_sql(key_expr: str, salt: str = "", buckets: int = PPM) -> str:
    """DuckDB SQL reproducing :func:`hash_bucket` bit-for-bit (for
    oracles and cross-engine audits)."""
    s = f"CAST({key_expr} AS VARCHAR)"
    if salt:
        s = f"'{salt}:' || {s}"
    return f"(CAST('0x' || substring(md5({s}), 1, 15) AS BIGINT) % {buckets})"
