"""duckdb_mongo_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the duckdb-mongo reference extension
(stephaniewang526/duckdb-mongo), rebuilt Spark-first.

Spark SQL plays DuckDB's role (all relational operators); this package is
the federation layer the reference implements in C++ — document scans
with schema inference, MQL pushdown compilation, catalog façade — plus
NEW large-scale LLM-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns).

Quick start::

    import duckdb_mongo_spark as dms
    spark = dms.get_spark()
    cat = dms.attach("jsonl:/path/to/docs", alias="m", spark=spark)
    users = cat.table("users")                     # MongoFrame
    from duckdb_mongo_spark.pushdown import C
    df = users.filter(C("age") > 28).select("name", "email", "age").df()
"""

from duckdb_mongo_spark.session import get_spark, register_data_source
from duckdb_mongo_spark.catalog import (
    attach,
    attached,
    detach,
    clear_cache,
    create_secret,
    drop_secret,
    get_secret,
    redacted_secret,
    build_connection_string,
    parse_attach_string,
)
from duckdb_mongo_spark.frame import MongoFrame
from duckdb_mongo_spark.pushdown import C, col, lit
from duckdb_mongo_spark.scan import infer_collection_schema, mongo_scan
from duckdb_mongo_spark.sinks import write_collection
from duckdb_mongo_spark import ops, streaming  # dms.ops.joins.asof_join, dms.streaming.temporal, ...

__version__ = "0.1.0"

__all__ = [
    "get_spark", "register_data_source", "attach", "attached", "detach",
    "clear_cache", "create_secret", "drop_secret", "get_secret",
    "redacted_secret", "build_connection_string", "parse_attach_string",
    "MongoFrame", "C", "col", "lit", "mongo_scan", "infer_collection_schema",
    "write_collection", "ops", "streaming",
]
