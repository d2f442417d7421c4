"""Pushdown compiler: predicate/expression ASTs → MQL, and the
scan-spec planner that decides find() vs aggregate() pipelines.

This is the Spark-side analog of the reference's three pushdown units:
filter compiler (src/mongo_filter_pushdown.cpp), $expr compiler
(src/mongo_expr_pushdown.cpp), and plan rewriter (src/mongo_optimizer.cpp).
Because PySpark exposes no Catalyst rewrite hooks, pushdown decisions are
made *before* the DataFrame is built — the engine owns the query entry
points, exactly as the reference owns mongo_scan bind/init (SURVEY.md §7).
"""

from duckdb_mongo_spark.pushdown.predicates import C, Col, Lit, col, lit
from duckdb_mongo_spark.pushdown.filters import compile_filter
from duckdb_mongo_spark.pushdown.planner import ScanSpec, plan_scan

__all__ = ["C", "Col", "Lit", "col", "lit", "compile_filter", "ScanSpec", "plan_scan"]
