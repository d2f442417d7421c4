"""Streaming continuous aggregate: the Structured-Streaming analog of
``ops.rollup.time_rollup``.

A timeseries store's continuous aggregate keeps multi-resolution
rollups fresh as data arrives. Spark 3.5+/4.x supports chained
streaming window aggregations (multiple stateful operators): the finest
resolution aggregates raw events under a watermark, and each coarser
level re-windows the finest level's MERGEABLE PARTIALS via
``window_time`` — raw events are read once, exactly like the batch
rollup, and the partial/merge/finalize builders are literally shared
with it (``ops.rollup.build_partial_aggs`` etc.), so batch and
streaming semantics cannot diverge.

Emission contract (append mode): a bucket row is emitted when the
watermark passes its window end — closed buckets are immutable, which
is what makes them safe to append to a hypertable sink. The streaming
levels are returned as one DataFrame per resolution because each level
is its own query/sink in a materialized continuous aggregate (and Spark
streaming cannot union branches that share upstream state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duckdb_mongo_spark.ops.rollup import (
    DEFAULT_QUANTILE_SLOTS,
    build_merge_aggs,
    build_partial_aggs,
    finalize_metric_cols,
    prepare_quantile_inputs,
    validate_hll_inputs,
)

# streaming windows need fixed durations; month/year (variable length)
# are batch-rollup-only
STREAM_RESOLUTIONS = {
    "second": "1 second",
    "minute": "1 minute",
    "hour": "1 hour",
    "day": "1 day",
}


def streaming_time_rollup(
    stream: DataFrame,
    ts_col: str,
    metrics: dict[str, tuple[str, str]],
    group_cols: list[str] | None = None,
    resolutions: list[str] | None = None,
    watermark: str = "10 minutes",
    bucket_col: str = "bucket",
    resolution_col: str = "resolution",
    quantile_slots: int = DEFAULT_QUANTILE_SLOTS,
) -> dict[str, DataFrame]:
    """Multi-resolution streaming rollup over event time.

    ``metrics``: out_name → (agg, col), agg ∈
    sum|count|min|max|avg|approx_distinct|first|last|approx_quantile:<q>
    — identical
    contract to the batch ``time_rollup`` (avg carried as sum+count and
    finalized per level; approx_distinct carried as a DataSketches HLL
    sketch and unioned upward, because distinct counts do not sum but
    sketches do; first/last carried as (event-time, value) pairs
    re-selected by the ORIGINAL event time at every level — the OHLC
    candle shape when combined with min/max).

    Returns {resolution: streaming DataFrame} with columns
    group_cols + bucket (window start) + bucket_end + resolution +
    metric columns. Start each with its own sink in append mode::

        levels = streaming_time_rollup(events, "ts", {...})
        for unit, df in levels.items():
            df.writeStream.format("delta").option(...).start(...)

    Scale note: state per level is one row per open (bucket × group);
    the chained levels' state shrinks geometrically with the bucket
    ratio, so the aggregate state is ~the finest level's — identical to
    the batch rollup's partial-size argument.
    """
    group_cols = list(group_cols or [])
    resolutions = list(resolutions or ["minute", "hour"])
    bad = [r for r in resolutions if r not in STREAM_RESOLUTIONS]
    if bad:
        raise ValueError(
            f"unsupported streaming resolutions {bad}; pick from {sorted(STREAM_RESOLUTIONS)}"
        )
    order = sorted(set(resolutions), key=list(STREAM_RESOLUTIONS).index)
    if not metrics:
        raise ValueError("metrics must be non-empty")
    validate_hll_inputs(stream, metrics)
    stream = prepare_quantile_inputs(stream, metrics, ts_col, quantile_slots)

    wm = stream.withWatermark(ts_col, watermark)
    finest = order[0]
    level = wm.groupBy(
        F.window(F.col(ts_col), STREAM_RESOLUTIONS[finest]), *group_cols
    ).agg(*build_partial_aggs(metrics, ts_col=ts_col, quantile_slots=quantile_slots))

    def _finalize(lv: DataFrame, unit: str) -> DataFrame:
        cols = [F.col(c) for c in group_cols]
        cols.append(F.col("window.start").alias(bucket_col))
        cols.append(F.col("window.end").alias(bucket_col + "_end"))
        cols.append(F.lit(unit).alias(resolution_col))
        cols.extend(finalize_metric_cols(metrics, quantile_slots=quantile_slots))
        return lv.select(*cols)

    out = {finest: _finalize(level, finest)}
    for unit in order[1:]:
        # window_time = window.end - 1 event-time tick: re-windowing on
        # it nests this level's closed windows inside the coarser one
        # and propagates the watermark through the chained stateful op
        level = level.groupBy(
            F.window(F.window_time("window"), STREAM_RESOLUTIONS[unit]), *group_cols
        ).agg(*build_merge_aggs(metrics, quantile_slots=quantile_slots))
        out[unit] = _finalize(level, unit)
    return out
