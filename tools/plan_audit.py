"""Physical-plan audit for every headline query.

Captures the plan facts that matter at 100 TB — join strategies,
exchange (shuffle) count, scan pushdown (PushedFilters), Python-UDF
presence — as one markdown table per run. (Codegen coverage is not
counted: un-executed AdaptiveSparkPlan strings carry no codegen
markers, so the number would read 0 under AQE regardless.) Commit the output (PLANS.md) so plan regressions show
up as diffs: a dimension join flipping from BroadcastHashJoin to
SortMergeJoin, a filter falling off the scan, or a stray
BroadcastNestedLoopJoin is visible at review time instead of as a
mystery slowdown three rounds later.

Usage: python tools/plan_audit.py [sf_dir] > PLANS.md
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PATTERNS = {
    "BHJ": r"BroadcastHashJoin",
    "SMJ": r"SortMergeJoin",
    "SHJ": r"ShuffledHashJoin",
    "BNLJ": r"BroadcastNestedLoopJoin",
    "cartesian": r"CartesianProduct",
    "exchanges": r"Exchange (?:hash|range|SinglePartition)",
    "pythonUDF": r"BatchEvalPython|ArrowEvalPython",
    "mapInPandas": r"MapInPandas",
}


# intentionally nested-loop plans: the exact cosine scorer broadcasts the
# (small by contract) query side and scores every corpus row — the
# documented O(|Q|x|C|) baseline the bucketed/ANN variants exist to avoid
ALLOWED_NESTED = {"sim_cosine_topk", "sim_cosine_topk_vectorized"}


def audit_plan(plan: str) -> dict[str, int]:
    return {name: len(re.findall(pat, plan)) for name, pat in PATTERNS.items()}


def pushdown_evidence(plan: str) -> str:
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    non_empty = [p for p in pushed if p.strip()]
    if non_empty:
        return f"{len(non_empty)} scan(s) with pushed filters"
    if "MONGO_SCAN" in plan or "mongo_scan" in plan:
        return "engine scan (pushdown in scan_description)"
    return "—"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    import __spark_entry__ as entry
    from duckdb_mongo_spark.session import get_spark

    spark = get_spark("plan_audit")
    qs = entry.queries()
    print(f"# Physical-plan audit ({sf_dir}, Spark {spark.version})\n")
    print("Counts of plan operators per query. Red flags: any BNLJ/cartesian; "
          "SMJ where a side is dimension-sized; exchanges beyond the aggregation's need.\n")
    cols = list(PATTERNS) + ["pushdown"]
    print("| query | " + " | ".join(cols) + " |")
    print("|" + "---|" * (len(cols) + 1))
    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            counts = audit_plan(plan)
            row = [str(counts[c]) for c in PATTERNS]
            row.append(pushdown_evidence(plan))
            print(f"| {name} | " + " | ".join(row) + " |")
        except Exception as exc:  # noqa: BLE001 — audit must cover the rest
            print(f"| {name} | ERROR: {str(exc)[:80]} |")
    flagged = []
    print()
    for name, fn in qs.items():
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
            c = audit_plan(plan)
            if (c["BNLJ"] or c["cartesian"]) and name not in ALLOWED_NESTED:
                flagged.append(name)
        except Exception:  # noqa: BLE001
            pass
    print(f"**Nested-loop/cartesian flags (excluding the documented broadcast-query exact scorers):** {flagged or 'none'}")


if __name__ == "__main__":
    main()
