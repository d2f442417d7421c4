"""MQL (MongoDB query language) subset: match/expr evaluators and a local
aggregation-pipeline interpreter.

Role: the reference engine compiles SQL into MQL and ships it to mongod
(/root/reference/src/mongo_filter_pushdown.cpp, mongo_expr_pushdown.cpp,
mongo_optimizer.cpp). Our engine compiles DataFrame/SQL-level operations to
the same MQL dialect; this package *executes* that dialect against local
document backends so the pushdown path is testable without a live MongoDB,
and serves as the executable spec of the dialect.
"""

from duckdb_mongo_spark.mql.match import matches_filter
from duckdb_mongo_spark.mql.expr import eval_expr
from duckdb_mongo_spark.mql.interpreter import run_pipeline

__all__ = ["matches_filter", "eval_expr", "run_pipeline"]
