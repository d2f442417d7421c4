"""Streaming frequency sketch: the Structured-Streaming analog of
``ops.sketches.count_min_sketch``.

The batch sketch answers "how often does value X occur?" over a
high-cardinality column without a full-cardinality shuffle; the
streaming version answers it per event-time window with BOUNDED state:
each open window holds at most depth × width counter rows (e.g.
5 × 2048 ≈ 10k rows) regardless of how many distinct values flow
through — the exact property that makes a sketch the 100 TB answer, now
also the unbounded-stream answer. A windowed ``groupBy(col).count()``
would instead keep state per distinct value per window.

Contract parity: bucket hashes come from the SAME md5 derivation as the
batch sketch (``ops.sketches._cms_bucket``), so a closed window's rows
are exactly ``count_min_sketch`` of that window's events (pinned in
tests/test_streaming_sketches.py), windows merge with
``ops.sketches.cms_merge``, and point estimates come from the shared
``cms_lookup``. The whole pipeline is JVM codegen (explode + windowed
grouped count under a watermark) — no Python in the loop.

Emission (append mode): a window's sketch rows emit once the watermark
passes the window end; closed sketches are immutable and safe to append
to a sketch store keyed by (window_start, row, bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duckdb_mongo_spark.ops.sketches import _cms_bucket


def streaming_count_min(
    stream: DataFrame,
    col: str,
    ts_col: str = "ts",
    depth: int = 5,
    width: int = 2048,
    window: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-window Count–Min sketch of ``col`` over event time.

    Output columns: ``window_start``, ``window_end``, ``row``,
    ``bucket``, ``count`` — at most depth × width rows per window.
    NULL values are excluded (consistent with the batch sketch and
    COUNT(col)). Start with an append-mode sink::

        sk = streaming_count_min(events, "user_id", ts_col="ts")
        sk.writeStream.outputMode("append").format(...).start(...)
    """
    if depth < 1 or width < 2:
        raise ValueError("depth must be >= 1 and width >= 2")
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
        stream.withWatermark(ts_col, watermark)
        .filter(c.isNotNull())
        .select(F.col(ts_col).alias("__ts"), rows.alias("rb"))
        .groupBy(
            F.window(F.col("__ts"), window).alias("w"),
            F.col("rb.row").alias("row"),
            F.col("rb.bucket").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("count"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "row",
            "bucket",
            "count",
        )
    )
