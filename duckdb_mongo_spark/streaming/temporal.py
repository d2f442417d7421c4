"""Event-time temporal joins for streams (NEW vs reference — streaming
is wholly out of the reference's scope, SURVEY §2B).

Two shapes a change-stream pipeline needs:

- ``stream_static_asof``: enrich each event with the dimension version
  in effect at the event's time (Flink's "temporal table join"). The
  versioned dimension (key, effective-from, payload) is converted — in
  BATCH — to half-open validity intervals [from, next_from) with one
  ``lead()`` window pass, after which the streaming side needs only a
  stateless equi-join + range residual: every event matches exactly one
  version row. No streaming state, no watermark requirement, and the
  interval form is broadcast like any dimension.
- ``stream_stream_interval_join``: Spark's native stream-stream join
  with a time-band condition (l.ts - lower ≤ r.ts ≤ l.ts + upper) and
  watermarks on both sides bounding the buffered state. This is the
  streaming analog of ``ops.joins.interval_join_points`` with state
  retention = band width + watermark delay.

Scale: the asof path is a broadcastable dimension join (dimension
versions ≪ events by premise); the interval join's state is bounded by
rate × (band + watermark) per key — both survive a 1000-executor
deployment because neither holds unbounded per-key history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["versioned_intervals", "stream_static_asof", "stream_stream_interval_join"]


def versioned_intervals(
    dim: DataFrame,
    key_cols: list[str],
    from_col: str,
    valid_to_col: str = "__valid_to",
) -> DataFrame:
    """Batch: (key, effective_from, payload) → half-open validity
    intervals — ``valid_to`` = next version's ``from`` within the key,
    NULL for the current version. One window pass, shuffle on key.

    Two versions sharing the same (key, from) make one interval empty
    and the winner order-dependent — pre-aggregate duplicates away (the
    same contract as asof_join's tied right rows, and as DuckDB ASOF)."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(from_col).asc())
    return dim.withColumn(valid_to_col, F.lead(from_col).over(w))


def stream_static_asof(
    events: DataFrame,
    dim: DataFrame,
    key_cols: list[str],
    event_ts: str,
    dim_from: str,
    how: str = "left",
) -> DataFrame:
    """As-of (backward) join of a stream to a VERSIONED static dimension:
    each event picks the dimension row whose validity interval
    [``dim_from``, next ``dim_from``) contains ``event_ts``.

    ``dim`` must be a batch DataFrame (re-read per micro-batch by Spark
    for fresh snapshots); ``events`` may be streaming or batch — the
    plan is a plain equi-join on the keys plus a range residual, which
    stream-static joins support natively with NO state store. A version
    row effective AT the event time matches (closed lower bound),
    mirroring ``ops.joins.asof_join``'s backward tie rule.
    """
    iv = versioned_intervals(dim, key_cols, dim_from)
    # rename dimension columns that collide (beyond the join keys)
    ev_cols = set(events.columns)
    renames = {
        c: f"{c}_dim" for c in iv.columns
        if c in ev_cols and c not in key_cols
    }
    for old, new in renames.items():
        iv = iv.withColumnRenamed(old, new)
    from_out = renames.get(dim_from, dim_from)
    cond = F.col(event_ts) >= F.col(from_out)
    valid_to = F.col("__valid_to")
    cond = cond & (valid_to.isNull() | (F.col(event_ts) < valid_to))
    # build the ON expression explicitly: keys + interval containment
    on_expr = None
    for k in key_cols:
        eq = events[k] == iv[k]
        on_expr = eq if on_expr is None else on_expr & eq
    on_expr = on_expr & cond if on_expr is not None else cond
    out = events.join(iv, on_expr, how)
    # drop the dimension's duplicate key columns + internal bound
    keep = [events[c] for c in events.columns]
    keep += [iv[c] for c in iv.columns if c not in key_cols and c != "__valid_to"]
    return out.select(*keep)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    lower_seconds: float,
    upper_seconds: float,
    left_watermark: str = "10 minutes",
    right_watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Native stream-stream join on equal keys with ``right_ts`` within
    ``[left_ts - lower, left_ts + upper]``.

    Watermarks on BOTH event-time columns are mandatory — they let the
    state store evict rows that can no longer match, so per-key state is
    bounded by arrival rate × (band + watermark delay). Outer variants
    emit unmatched rows only after the watermark passes (semantics per
    Spark's stream-stream join contract).
    """
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    on_expr = None
    for k in key_cols:
        eq = lw[k] == rw[k]
        on_expr = eq if on_expr is None else on_expr & eq
    # attribute refs (lw[..]/rw[..]) keep same-named event-time columns
    # unambiguous; fractional seconds survive via a float interval literal
    lo = lw[left_ts] - F.expr(f"INTERVAL {float(lower_seconds)} SECONDS")
    hi = lw[left_ts] + F.expr(f"INTERVAL {float(upper_seconds)} SECONDS")
    band = (rw[right_ts] >= lo) & (rw[right_ts] <= hi)
    on_expr = band if on_expr is None else on_expr & band
    return lw.join(rw, on_expr, how)
