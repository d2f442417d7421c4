"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Query mix mirrors the reference's three harness shapes (BASELINE.md):
full TPC-H-style analytics (q1/q3/q5/q18), pushdown micro-suite
(count/groupby/topn through the engine scan), and the NEW operator
suite (text analysis, minhash, cosine top-k) — measured end-to-end
including scan.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    import __spark_entry__ as entry
    from duckdb_mongo_spark.session import get_spark

    spark = get_spark("bench")
    qs = entry.queries()

    bench_queries = [
        # relational surface
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_local_supplier_volume",
        "q6_forecast_revenue",
        "q7_volume_shipping",
        "q13_customer_distribution",
        "q18_large_orders",
        "q_window_topk_per_customer",
        "q_sessionize",
        "q_time_bucket",
        # engine pushdown micro-suite
        "mongo_filter_projection",
        "mongo_agg_pushdown",
        "mongo_count_pushdown",
        "mongo_topn_pushdown",
        "mongo_semi_join_in",
        # NEW operators
        "text_analysis",
        "dedup_minhash_signatures",
        "dedup_simhash",
        "sim_cosine_topk",
        "sim_cosine_topk_vectorized",
    ]

    # warmup, mirroring the reference harness's warmup COUNT(*)
    # (benchmarks/benchmark-tpch.sh:69-98): spin the JVM + parquet reader
    # and the Python DataSource machinery (engine-scan worker spawn) once
    qs["q6_forecast_revenue"](spark, sf_dir).collect()
    qs["mongo_count_pushdown"](spark, sf_dir).collect()

    # per-query avg of N iterations — the reference harness's methodology
    # (benchmarks/benchmark-tpch.sh: N iterations averaged per query,
    # cold ATTACH per run, warmup first)
    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "2"))
    timings: dict[str, float] = {}
    for name in bench_queries:
        samples = []
        for _ in range(iters):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.collect()  # full materialization — no count-only shortcuts
            samples.append(time.perf_counter() - t0)
        timings[name] = round(sum(samples) / len(samples), 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
