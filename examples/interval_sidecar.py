"""Interval-envelope sidecar end to end — build, fingerprint-hit, join
fast path, and invalidation.

The shape: a large event stream where every query joins points against
per-key time-window envelopes (MIN/MAX of some activity per (user,
day)). Computing those envelopes inline costs a full raw scan plus a
groups≈rows aggregation PER QUERY; at scale that aggregation dominates
the join (the sf10 decomposition in BENCH artifacts puts it at 80-90%
of the wall). The sidecar materializes the envelope table ONCE —
versioned parquet, keyed by the source's file fingerprint — and the
join accepts the handle directly:

- build:      one aggregation job, committed atomically (v-* + CURRENT)
- query:      `interval_join_points(points, "ts", idx)` — the plan has
              NO HashAggregate and NO second raw scan on the interval
              side; broadcast is gated on the handle's TRUE row count
              (a compressed envelope file fools Spark's static
              estimate)
- rebuild:    a no-op while the source fingerprint matches
- invalidate: rewriting the source misses the fingerprint; the cached
              lookup returns None and the caller falls back inline

Usage: python examples/interval_sidecar.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb_mongo_spark as dms  # noqa: E402
from duckdb_mongo_spark.ops import interval_index as ii  # noqa: E402
from duckdb_mongo_spark.ops.interval_index import (  # noqa: E402
    build_interval_envelope_index,
    cached_interval_envelope_index,
)
from duckdb_mongo_spark.ops.joins import (  # noqa: E402
    interval_join_points,
    time_bin,
)

DAY = 86400.0


def plan_sig(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return (f"scans={len(re.findall(r'FileScan parquet', plan))} "
            f"aggs={plan.count('HashAggregate')} "
            f"exchanges={len(re.findall(r'Exchange hashpartitioning', plan))}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = dms.get_spark("interval-sidecar-example")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    points = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts")
    err_pred = F.col("event_type") == "error"

    print("== build (one aggregation job, committed atomically)")
    idx = build_interval_envelope_index(
        ev, "ts", ["user_id"], DAY, predicate=err_pred,
        aggs={"n_errors": F.count(F.lit(1))})
    print(f"   committed {idx.n_intervals} envelopes -> {idx.data_dir}")

    print("== rebuild is a fingerprint-checked no-op")
    before = ii.build_count
    build_interval_envelope_index(ev, "ts", ["user_id"], DAY,
                                  predicate=err_pred,
                                  aggs={"n_errors": F.count(F.lit(1))})
    print(f"   build_count unchanged: {ii.build_count == before}")

    print("== query-time join takes the handle directly")
    side = interval_join_points(points, "ts", idx)
    inline_env = (
        ev.filter(err_pred).select("user_id", "ts")
        .groupBy("user_id", time_bin(ev, "ts", DAY).alias("__bin"))
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"),
             F.count(F.lit(1)).alias("n_errors")))
    inline = interval_join_points(points, "ts", inline_env, "lo", "hi",
                                  on=["user_id"], bin_width=DAY,
                                  iv_bin_col="__bin")
    a = sorted((r.event_id, str(r.lo)) for r in side.collect())
    b = sorted((r.event_id, str(r.lo)) for r in inline.collect())
    print(f"   rows identical to the inline aggregation: {a == b} "
          f"({len(a)} rows)")
    print(f"   sidecar plan: {plan_sig(side)}   <- no envelope agg")
    print(f"   inline  plan: {plan_sig(inline)}")

    print("== cached lookup never builds; cache clear reloads from disk")
    ii.clear_interval_index_cache()
    got = cached_interval_envelope_index(
        ev, "ts", ["user_id"], DAY, predicate=err_pred,
        aggs={"n_errors": F.count(F.lit(1))})
    print(f"   reloaded by fingerprint: {got is not None}")


if __name__ == "__main__":
    main()
