"""Dump ``.explain("formatted")`` for declared queries to plans/<tag>/.

The optimization-round evidence convention (r14): for every query the
round touches, commit the formatted physical plan before and after the
change so plan claims ("2 Exchange -> 1", "PushedFilters now includes
...") are checkable against the repo without running Spark.

Usage:
    python tools/dump_plans.py <out_dir> <suffix> [query ...]

    out_dir   e.g. plans/r14
    suffix    "before" or "after" (file name: <query>_<suffix>.txt)
    query...  names from __spark_entry__.queries(); default = the bench
              headline list plus the sf10 join/text shapes (the set the
              round examines).

Plans are captured at SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01
— plan SHAPE is scale-invariant for this suite; AQE leaves the initial
plan visible as isFinalPlan=false)."""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q7_volume_shipping", "q13_customer_distribution",
    "q18_large_orders", "q_window_topk_per_customer", "q_sessionize",
    "q_time_bucket", "mongo_filter_projection", "mongo_agg_pushdown",
    "mongo_count_pushdown", "mongo_topn_pushdown", "mongo_semi_join_in",
    "text_analysis", "dedup_minhash_signatures", "dedup_simhash",
    "sim_cosine_topk", "q_asof_join", "q_interval_join",
    "search_text_topk", "search_text_topk_cached",
]


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "plans/r14"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(out_dir, exist_ok=True)

    import bench
    import __spark_entry__ as entry
    from duckdb_mongo_spark.session import get_spark

    spark = get_spark("dump_plans", extra_conf={
        "spark.sql.join.preferSortMergeJoin": "false",
    })
    qs = dict(entry.queries())
    oracles = dict(entry.oracle_sql())
    bench._install_lean_line_items(qs, oracles)
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"# unknown query {name!r}, skipped", file=sys.stderr)
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 — capture the failure itself
            text = f"EXPLAIN FAILED: {exc}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {sf_dir} ({suffix})\n")
            f.write(text)
        print(f"wrote {path} ({len(text)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
