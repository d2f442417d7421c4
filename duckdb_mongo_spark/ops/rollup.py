"""Hypertable-style multi-resolution time rollups.

``time_rollup`` computes windowed aggregates at several time
granularities (minute → hour → day → ...) while scanning the raw data
ONCE: only the finest resolution aggregates from raw rows; every
coarser level re-aggregates the previous level's partials. At 100 TB
that is the difference between one fact-table scan and one per
resolution — re-aggregation inputs shrink by orders of magnitude per
level (the continuous-aggregate design of timeseries stores, expressed
as plain Spark aggregations).

Associativity makes this exact for sum/count/min/max; ``avg`` is
requested as sum+count and finalized as a derived column at every
level (never averaged-of-averages); ``first``/``last`` carry
(event-time, value) pairs re-selected by the original event time at
every level (min_by/max_by — the OHLC candle shape);
``approx_quantile:<q>`` carries a deterministic bottom-hash sample
whose per-slot minima merge associatively (quantiles themselves do
not merge; the sample does). The DuckDB oracle
aggregates each resolution directly from raw rows, so tests prove the
re-aggregation path equals the direct path.
"""

from __future__ import annotations

import re
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# date_trunc units, finest → coarsest (subset that re-nests cleanly;
# week intentionally absent: ISO weeks do not nest inside months)
RESOLUTIONS = ["second", "minute", "hour", "day", "month", "year"]

_MERGE = {"sum": F.sum, "min": F.min, "max": F.max}

# slots in the mergeable quantile sketch: rank error ~ sqrt(q(1-q)/k)
DEFAULT_QUANTILE_SLOTS = 64


def _parse_quantile(agg: str) -> float | None:
    """``approx_quantile:0.95`` → 0.95; any other agg name → None."""
    if not agg.startswith("approx_quantile:"):
        return None
    try:
        q = float(agg.split(":", 1)[1])
    except ValueError:
        raise ValueError(f"bad quantile in agg {agg!r}; use e.g. 'approx_quantile:0.95'")
    if not (0.0 <= q <= 1.0):
        raise ValueError(f"quantile must be in [0, 1], got {q} in {agg!r}")
    return q


def _qsan(col: str) -> str:
    return re.sub(r"\W", "_", col)


def _quantile_cols(metrics: dict) -> list[str]:
    """Distinct source columns needing a quantile sketch, in first-seen
    order — one sketch per column is shared by every quantile metric on
    it (p50+p95+p99 on one column cost one sketch)."""
    cols: list[str] = []
    for _out, (agg, col) in metrics.items():
        if _parse_quantile(agg) is not None and col not in cols:
            cols.append(col)
    return cols


def prepare_quantile_inputs(
    df: DataFrame,
    metrics: dict,
    ts_col: str,
    quantile_slots: int = DEFAULT_QUANTILE_SLOTS,
) -> DataFrame:
    """Project the per-row sketch inputs once, BEFORE the grouped
    aggregation, so the k per-slot aggregates each test one precomputed
    int instead of re-hashing the row k times.

    The sketch is a deterministic bottom-hash sample: each row hashes to
    one of ``quantile_slots`` slots (xxhash64 of (event time, value) —
    no RNG, so re-runs and the merge path reproduce bit-identical
    samples), and each slot keeps the row with the smallest hash via
    ``min_by``. Slot minima merge associatively (min of mins), which is
    what lets coarser rollup levels merge finer levels' sketches exactly
    as if built from raw rows. Rows duplicated in (ts, value) hash
    identically and are sampled once — the sketch is approximate anyway
    (rank error ~ sqrt(q(1-q)/k)). NULL values are excluded, matching
    SQL aggregate semantics."""
    for col in _quantile_cols(metrics):
        s = _qsan(col)
        h = F.xxhash64(F.col(ts_col), F.col(col))
        df = df.withColumn(
            f"__q_{s}_slot",
            F.when(F.col(col).isNotNull(), F.pmod(h, F.lit(quantile_slots)).cast("int")),
        ).withColumn(
            f"__q_{s}_pair",
            F.when(
                F.col(col).isNotNull(),
                F.struct(h.alias("h"), F.col(col).cast("double").alias("v")),
            ),
        )
    return df


_HLL_OK_TYPES = ("int", "bigint", "smallint", "tinyint", "string", "binary")


def validate_hll_inputs(df: DataFrame, metrics: dict) -> None:
    """Fail fast with guidance when an ``approx_distinct`` metric targets
    a column type ``hll_sketch_agg`` rejects (it accepts only
    INT/BIGINT/STRING/BINARY — a DOUBLE column otherwise surfaces as a
    deep Catalyst DATATYPE_MISMATCH at analysis time). Cast such columns
    to string upstream: distinct-count semantics are preserved (the
    value↔canonical-repr mapping is 1:1)."""
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for out, (agg, col) in metrics.items():
        if agg == "approx_distinct":
            t = types.get(col)
            if t is not None and t not in _HLL_OK_TYPES:
                raise ValueError(
                    f"approx_distinct metric {out!r}: hll_sketch_agg does not accept "
                    f"{col!r} of type {t} (supported: {', '.join(_HLL_OK_TYPES)}); "
                    f"cast the column to string first — distinct counts are unchanged"
                )


def build_partial_aggs(
    metrics: dict,
    ts_col: str | None = None,
    quantile_slots: int = DEFAULT_QUANTILE_SLOTS,
) -> list:
    """Mergeable partial-state aggregations for the finest level —
    shared by the batch rollup and the streaming continuous aggregate so
    their merge semantics cannot diverge.

    ``ts_col`` is required when a metric uses ``first``/``last``: their
    partial is (event-time, value) carried via ``min_by``/``max_by`` so
    coarser levels can re-select the earliest/latest value by the
    ORIGINAL event time, not bucket order. With first+max+min+last this
    is the OHLC (open/high/low/close) candle shape."""
    partial_aggs = []
    seen: set[str] = set()

    def _add(name, expr):
        if name in seen:
            # e.g. metrics {'x': ('avg', ...), 'x__sum': ('sum', ...)} —
            # silent dedupe would ship wrong values under the colliding name
            raise ValueError(
                f"metric names collide on internal partial {name!r}; rename one metric"
            )
        seen.add(name)
        partial_aggs.append(expr.alias(name))

    sketched: set[str] = set()
    for out, (agg, col) in metrics.items():
        if _parse_quantile(agg) is not None:
            if ts_col is None:
                raise ValueError(
                    f"metric {out!r}: approx_quantile needs the rollup's ts_col "
                    "(it seeds the deterministic row hash); call "
                    "prepare_quantile_inputs(df, metrics, ts_col) before aggregating"
                )
            s = _qsan(col)
            if s in sketched:
                continue  # one sketch per source column, shared by all its quantiles
            sketched.add(s)
            slot, pair = F.col(f"__q_{s}_slot"), F.col(f"__q_{s}_pair")
            for i in range(quantile_slots):
                hit = slot == i
                _add(
                    f"__p_qs_{s}__s{i}",
                    F.min_by(F.when(hit, pair), F.when(hit, pair["h"])),
                )
        elif agg in ("sum", "min", "max"):
            _add(f"__p_{out}", _MERGE[agg](F.col(col)))
        elif agg == "count":
            _add(f"__p_{out}", F.count(F.col(col)))
        elif agg == "avg":
            _add(f"__p_{out}__sum", F.sum(F.col(col)))
            _add(f"__p_{out}__cnt", F.count(F.col(col)))
        elif agg == "approx_distinct":
            # mergeable DataSketches HLL: distinct counts do NOT sum
            # across buckets, but their sketches union exactly — the one
            # metric a naive re-aggregating rollup silently gets wrong
            _add(f"__p_{out}__hll", F.hll_sketch_agg(F.col(col)))
        elif agg in ("first", "last"):
            if ts_col is None:
                raise ValueError(
                    f"metric {out!r}: first/last need the rollup's ts_col for "
                    "event-time ordering"
                )
            fn = F.min_by if agg == "first" else F.max_by
            pair = F.struct(F.col(ts_col).alias("t"), F.col(col).alias("v"))
            _add(f"__p_{out}", fn(pair, F.col(ts_col)))
        else:
            raise ValueError(f"unsupported agg {agg!r} for metric {out!r}")
    return partial_aggs


def build_merge_aggs(metrics: dict, quantile_slots: int = DEFAULT_QUANTILE_SLOTS) -> list:
    """Re-aggregations that merge one level's partials into the next
    coarser level's partials (same column names in and out)."""
    out = []
    merged: set[str] = set()
    for out_name, (agg, _col) in metrics.items():
        if _parse_quantile(agg) is not None:
            s = _qsan(_col)
            if s in merged:
                continue
            merged.add(s)
            for i in range(quantile_slots):
                # slot minima merge associatively: min-of-mins by hash is
                # exactly the sketch a direct build from raw would produce
                c = f"__p_qs_{s}__s{i}"
                out.append(F.min_by(F.col(c), F.col(c)["h"]).alias(c))
        elif agg in ("sum", "count"):
            out.append(F.sum(f"__p_{out_name}").alias(f"__p_{out_name}"))
        elif agg in ("min", "max"):
            out.append(_MERGE[agg](f"__p_{out_name}").alias(f"__p_{out_name}"))
        elif agg == "approx_distinct":
            out.append(F.hll_union_agg(f"__p_{out_name}__hll").alias(f"__p_{out_name}__hll"))
        elif agg in ("first", "last"):
            # re-select by the carried ORIGINAL event time — min/max over
            # bucket boundaries would be wrong only when a coarser bucket
            # spans partials, which is exactly the rollup's merge step
            fn = F.min_by if agg == "first" else F.max_by
            out.append(
                fn(F.col(f"__p_{out_name}"), F.col(f"__p_{out_name}.t")).alias(f"__p_{out_name}")
            )
        else:  # avg: merge carried partials
            out.append(F.sum(f"__p_{out_name}__sum").alias(f"__p_{out_name}__sum"))
            out.append(F.sum(f"__p_{out_name}__cnt").alias(f"__p_{out_name}__cnt"))
    return out


def finalize_metric_cols(metrics: dict, quantile_slots: int = DEFAULT_QUANTILE_SLOTS) -> list:
    """Output columns deriving each requested metric from its partials
    (avg = carried sum/count, never average-of-averages; HLL estimated
    at output only; quantiles linearly interpolated over the sketch's
    sorted sample, percentile_cont-style)."""
    cols = []
    for out_name, (agg, _col) in metrics.items():
        q = _parse_quantile(agg)
        if q is not None:
            s = _qsan(_col)
            arr = F.array_sort(
                F.filter(
                    F.array(*[F.col(f"__p_qs_{s}__s{i}")["v"] for i in range(quantile_slots)]),
                    lambda x: x.isNotNull(),
                )
            )
            n = F.size(arr)
            pos = F.lit(q) * (n - F.lit(1)).cast("double")
            lo = F.floor(pos).cast("int")
            frac = pos - lo.cast("double")
            v_lo = F.get(arr, lo)  # F.get is 0-based and null-safe OOB (ANSI-proof)
            v_hi = F.get(arr, F.least(lo + F.lit(1), n - F.lit(1)))
            cols.append(
                F.when(n == 0, F.lit(None).cast("double"))
                .otherwise(v_lo + frac * (v_hi - v_lo))
                .alias(out_name)
            )
        elif agg == "avg":
            cols.append(
                (F.col(f"__p_{out_name}__sum") / F.col(f"__p_{out_name}__cnt")).alias(out_name)
            )
        elif agg == "approx_distinct":
            cols.append(F.hll_sketch_estimate(f"__p_{out_name}__hll").alias(out_name))
        elif agg in ("first", "last"):
            cols.append(F.col(f"__p_{out_name}.v").alias(out_name))
        else:
            cols.append(F.col(f"__p_{out_name}").alias(out_name))
    return cols


def time_rollup(
    df: DataFrame,
    ts_col: str,
    metrics: dict[str, tuple[str, str]],
    group_cols: list[str] | None = None,
    resolutions: list[str] | None = None,
    bucket_col: str = "bucket",
    resolution_col: str = "resolution",
    cache_partials: bool = True,
    quantile_slots: int = DEFAULT_QUANTILE_SLOTS,
) -> DataFrame:
    """Aggregates at every requested resolution, single raw scan.

    ``metrics``: out_name → (agg, col) with agg ∈
    sum|count|min|max|avg|approx_distinct|first|last|approx_quantile:<q>;
    ``count`` counts non-null values of col (use ``avg``'s count or a
    non-null col for COUNT(*) shapes). ``first``/``last`` select the
    value at the earliest/latest ``ts_col`` in the bucket (ties broken
    arbitrarily — use a unique event time for determinism); together
    with min/max they give OHLC candles::

        time_rollup(trades, "ts", metrics={
            "open": ("first", "price"), "high": ("max", "price"),
            "low": ("min", "price"), "close": ("last", "price")})

    ``approx_quantile:<q>`` (e.g. ``"p95": ("approx_quantile:0.95",
    "latency")``) carries a deterministic mergeable bottom-hash sample
    of ``quantile_slots`` rows per bucket (see
    ``prepare_quantile_inputs``): exact quantiles do not merge across
    buckets, but slot minima do, so every resolution answers from a
    sketch identical to one built directly from raw rows (rank error
    ~ sqrt(q(1-q)/k), ~6-9%% at the default k=64; raise
    ``quantile_slots`` for tighter). Multiple quantiles of one column
    share one sketch.

    Output = group_cols + bucket
    (truncated timestamp) + resolution (unit string) + metric columns,
    one row-set per resolution unioned together.

    Coarser levels re-aggregate the finest level's partials: counts sum,
    sums sum, min/max re-min/max, avg finalizes from carried sum+count,
    and approx_distinct carries a DataSketches HLL sketch per bucket
    (``hll_sketch_agg`` → ``hll_union_agg`` → estimate at output) —
    distinct counts cannot be summed across buckets, but sketches union
    losslessly, which is how continuous aggregates keep uniques exact
    to sketch precision at every resolution.

    ``cache_partials`` (default on) persists + eagerly materializes the
    finest level: Spark does NOT share a common subplan across union
    branches, so without it every resolution re-scans the raw table —
    the exact cost this operator exists to avoid. The cached partials
    are tiny relative to raw (one row per finest bucket × group); Spark
    evicts them LRU, or unpersist via ``spark.catalog.clearCache()``.
    For a persistent continuous aggregate, write the finest level to a
    table and roll up from there instead.
    """
    group_cols = list(group_cols or [])
    resolutions = list(resolutions or ["minute", "hour", "day"])
    bad = [r for r in resolutions if r not in RESOLUTIONS]
    if bad:
        raise ValueError(f"unsupported resolutions {bad}; pick from {RESOLUTIONS}")
    order = sorted(set(resolutions), key=RESOLUTIONS.index)  # dedupe: a repeated unit must not double-emit its level
    if not metrics:
        raise ValueError("metrics must be non-empty")

    validate_hll_inputs(df, metrics)
    df = prepare_quantile_inputs(df, metrics, ts_col, quantile_slots)
    # partial (mergeable) state per metric at the finest level
    partial_aggs = build_partial_aggs(metrics, ts_col=ts_col, quantile_slots=quantile_slots)

    finest = order[0]
    level = (
        df.groupBy(F.date_trunc(finest, F.col(ts_col)).alias(bucket_col), *group_cols)
        .agg(*partial_aggs)
    )
    if cache_partials and len(order) > 1:
        level = level.persist()
        level.count()  # materialize: ONE raw scan feeds every level

    def _finalize(lv: DataFrame, unit: str) -> DataFrame:
        cols = [F.col(c) for c in group_cols]
        cols.append(F.col(bucket_col))
        cols.append(F.lit(unit).alias(resolution_col))
        cols.extend(finalize_metric_cols(metrics, quantile_slots=quantile_slots))
        return lv.select(*cols)

    outputs = [_finalize(level, finest)]
    for unit in order[1:]:
        level = (
            level.groupBy(F.date_trunc(unit, F.col(bucket_col)).alias(bucket_col), *group_cols)
            .agg(*build_merge_aggs(metrics, quantile_slots=quantile_slots))
        )
        outputs.append(_finalize(level, unit))
    return reduce(DataFrame.unionByName, outputs)
