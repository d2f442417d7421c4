"""Custom stateful streaming operators via ``applyInPandasWithState``
(NEW vs reference). The flagship is streaming deduplication — the
training-data-pipeline primitive: drop documents whose fingerprint was
already ingested, with per-key state that survives across micro-batches
(and optional state TTL so unbounded corpora don't grow state forever).

Spark's built-in ``dropDuplicates`` on a stream keeps ALL keys in state
with no eviction control per group; this operator keeps one bounded
fingerprint set per partition key and exposes the TTL knob — the shape
``applyInPandasWithState`` exists for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def dedup_stream(
    stream: DataFrame,
    key_col: str,
    fingerprint_col: str,
    ttl_minutes: int | None = None,
    max_fingerprints_per_key: int = 100_000,
) -> DataFrame:
    """Emit only first-seen (key, fingerprint) rows across micro-batches.

    State per key = the set of seen fingerprints (bounded by
    ``max_fingerprints_per_key``, oldest-first eviction). With
    ``ttl_minutes`` set, an idle key's state is dropped after the
    processing-time timeout — re-ingestion after the TTL re-admits the
    document (the standard freshness/memory trade).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = stream.schema
    state_schema = T.StructType(
        [T.StructField("seen", T.ArrayType(T.StringType()))]
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    col_order = [f.name for f in out_schema.fields]

    def fn(key, pdf_iter, state):
        if state.hasTimedOut:
            state.remove()
            return
        (seen_list,) = state.get if state.exists else ([],)
        seen = set(seen_list or [])
        order = list(seen_list or [])
        for pdf in pdf_iter:
            mask = []
            for fp in pdf[fingerprint_col]:
                fresh = fp not in seen
                mask.append(fresh)
                if fresh:
                    seen.add(fp)
                    order.append(fp)
            out = pdf[mask]
            if len(out):
                yield out[col_order]
        if len(order) > max_fingerprints_per_key:
            drop = len(order) - max_fingerprints_per_key
            order = order[drop:]
        state.update((order,))
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(fn, out_schema, state_schema, "append", timeout)
    )
