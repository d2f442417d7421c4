"""NEW operators beyond the reference surface (SURVEY.md §2B "NEW" row):
large-scale training-data pipeline operations — deduplication, similarity
search, text analysis, multimodal columns — built Spark-first for the
100 TB posture (built-in functions / joins, no row-at-a-time Python in
hot paths; Pandas UDFs only where semantics require).

Determinism contract: every hash used here is md5-based (identical
across engines) so results are verifiable against a DuckDB oracle.
"""

from duckdb_mongo_spark.ops import dedup, joins, multimodal, rollup, sampling, similarity, text

__all__ = ["dedup", "joins", "multimodal", "rollup", "sampling", "similarity", "text"]
