"""Structured Streaming over document collections (NEW vs reference).

The reference is strictly batch (no watermarks/windows/stateful ops
anywhere — SURVEY §2B "Streaming: none"); its natural streaming analog
is a MongoDB change stream: an ordered feed of inserted documents. This
module provides that shape Spark-first:

- ``document_stream``  — ``readStream`` over a JSONL collection
  directory with the engine's inferred (or provided) schema: the
  insert-only change-stream emulation; new files = new change batches.
- ``windowed_counts``  — event-time tumbling/sliding window aggregation
  with a watermark for late data.
- ``sessionized``      — session windows (gap-based) via the built-in
  ``session_window`` (JVM-side state store, no Python in the loop).

All three return unstarted DataFrames/queries so callers choose sink +
trigger; tests drive them with ``trigger(availableNow=True)`` into a
memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_mongo_spark.schema.infer import resolve_schema
from duckdb_mongo_spark.schema.types import to_spark_schema
from duckdb_mongo_spark.streaming import rollup, sketches, stateful, temporal

__all__ = [
    "rollup",
    "sketches",
    "stateful",
    "temporal",
    "document_stream",
    "windowed_counts",
    "sessionized",
    "stream_to_collection",
]


def stream_to_collection(
    stream: DataFrame,
    root: str,
    db: str,
    coll: str,
    checkpoint: str | None = None,
    trigger_available_now: bool = False,
):
    """Sink a stream back into a JSONL collection directory that the
    batch engine (``mongo_scan`` over ``jsonl:<root>``) and
    ``document_stream`` itself can read — the bronze-table shape of a
    change-stream ingestion pipeline. Returns the started query.
    """
    path = f"{root}/{db}/{coll}"
    writer = (
        stream.writeStream.format("json")
        .option("path", path)
        .option("checkpointLocation", checkpoint or f"{path}/_checkpoint")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _ensure_event_time(stream: DataFrame, ts_col: str) -> DataFrame:
    """Event time must be TIMESTAMP; documents often carry ISO-8601
    strings (plain-JSON collections have no typed dates) — cast once."""
    dtype = dict(stream.dtypes).get(ts_col)
    if dtype == "string":
        return stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return stream


def _nested_read_schema(schema):
    """Rebuild a NESTED Spark read schema from the engine's flattened
    field list: leaf dotted paths become struct members; parent JSON
    VARCHAR columns (fields that have children) become struct nodes and
    are re-rendered to JSON strings after the read."""
    from pyspark.sql import types as T

    from duckdb_mongo_spark.schema.types import to_spark_type

    paths = [f.mongo_path for f in schema.fields]
    parents = {
        p for p in paths
        if any(q != p and q.startswith(p + ".") for q in paths)
    }
    root: dict = {}
    for f in schema.fields:
        if f.mongo_path in parents:
            continue  # structure comes from the children
        segs = f.mongo_path.split(".")
        node = root
        for s in segs[:-1]:
            node = node.setdefault(s, {})
        node[segs[-1]] = to_spark_type(f.type)

    def build(node) -> T.StructType:
        return T.StructType(
            [
                T.StructField(k, build(v) if isinstance(v, dict) else v, True)
                for k, v in node.items()
            ]
        )

    return build(root), parents


def document_stream(
    spark: SparkSession,
    root: str,
    db: str,
    coll: str,
    columns: dict | None = None,
    sample_size: int = 100,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Insert-only change-stream emulation over ``<root>/<db>/<coll>/*.jsonl``.

    Schema comes from the engine's three-tier resolution against the
    documents already present (a stream needs a schema before data
    arrives — same reason the reference samples the collection at bind
    time). Output matches the batch scan surface: nested paths
    flattened to ``a_b`` columns plus the parent JSON VARCHAR column.
    """
    from duckdb_mongo_spark.backends import JsonlBackend

    backend = JsonlBackend(root)
    schema = resolve_schema(backend, db, coll, columns=columns, sample_size=sample_size)
    read_schema, parents = _nested_read_schema(schema)

    reader = spark.readStream.schema(read_schema).format("json")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    raw = reader.load(f"{root}/{db}/{coll}")
    cols = []
    for f in schema.fields:
        if f.mongo_path in parents:
            cols.append(F.to_json(F.col(f.mongo_path)).alias(f.name))
        else:
            cols.append(F.col(f.mongo_path).alias(f.name))
    return raw.select(*cols)


def windowed_counts(
    stream: DataFrame,
    ts_col: str,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "10 minutes",
    group_cols: list[str] | None = None,
    agg_exprs: dict[str, str] | None = None,
) -> DataFrame:
    """Event-time windowed aggregation with late-data watermark.

    ``agg_exprs``: {output_name: "fn(col)"} on top of the always-present
    ``n`` count; windows surface as ``window_start``/``window_end``.
    """
    stream = _ensure_event_time(stream, ts_col)
    wm = stream.withWatermark(ts_col, watermark)
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    keys = [win] + [F.col(c) for c in (group_cols or [])]
    aggs = [F.count(F.lit(1)).alias("n")]
    for name, expr in (agg_exprs or {}).items():
        aggs.append(F.expr(expr).alias(name))
    out = wm.groupBy(*keys).agg(*aggs)
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[F.col(c) for c in (group_cols or [])],
        "n",
        *[F.col(name) for name in (agg_exprs or {})],
    )


def sessionized(
    stream: DataFrame,
    ts_col: str,
    key_col: str,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session windows: events for one key within ``gap`` of each other
    merge into one session (built-in ``session_window`` — JVM state
    store; the streaming analog of the batch ``q_sessionize`` query)."""
    stream = _ensure_event_time(stream, ts_col)
    wm = stream.withWatermark(ts_col, watermark)
    return (
        wm.groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(f"session_window.start").alias("session_start"),
            F.col(f"session_window.end").alias("session_end"),
            F.col(key_col),
            "n_events",
        )
    )
