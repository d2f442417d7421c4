"""NEW operators beyond the reference surface (SURVEY.md §2B "NEW" row):
large-scale training-data pipeline operations — deduplication, similarity
search, text analysis, multimodal columns, as-of/interval joins,
deterministic sampling, time rollups — built Spark-first for the
100 TB posture (built-in functions / joins, no row-at-a-time Python in
hot paths; Pandas UDFs only where semantics require).

Determinism contract: every hash used here is md5-based (identical
across engines) so results are verifiable against a DuckDB oracle.

Submodules load lazily (PEP 562): ``multimodal`` imports pandas at
module scope, and the core scan/pushdown surface must stay importable
(and fast to import) in a pandas-less environment.
"""

from __future__ import annotations

__all__ = ["chunking", "codecs", "dedup", "joins", "multimodal", "packing", "partitioning", "pii", "profile", "quality", "rollup", "sampling", "sharding", "similarity", "sketches", "span_dedup", "text", "vector_index", "video", "vp8", "webp", "webp_native"]


def __getattr__(name: str):
    if name in __all__:
        import importlib

        mod = importlib.import_module(f"duckdb_mongo_spark.ops.{name}")
        globals()[name] = mod
        return mod
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | set(__all__))
