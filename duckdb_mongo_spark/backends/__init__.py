"""Document backends: where documents come from.

The reference talks to one backend (MongoDB via mongocxx). Our engine
keeps the same scan/pushdown semantics over a pluggable backend so the
whole stack is testable hermetically:

- ``MemoryBackend``   — dict-of-collections, fixtures in tests
- ``JsonlBackend``    — JSONL files on disk, one file per collection
- ``ParquetBackend``  — parquet tables viewed as document collections
                        (driver testdata under /root/testdata)
- ``CsvBackend``      — header-row CSV files as document collections
                        (the reference's `read_csv_auto` dim-file shape)
- ``PymongoBackend``  — a real MongoDB when pymongo is installed (gated)

All backends execute the same MQL dialect (find filter + aggregation
pipeline) via the local interpreter, except Pymongo which ships it to the
server — mirroring the reference's find/aggregate split
(/root/reference/src/mongo_table_function.cpp:280-603).
"""

from duckdb_mongo_spark.backends.base import DocumentBackend
from duckdb_mongo_spark.backends.memory import MemoryBackend
from duckdb_mongo_spark.backends.jsonl import JsonlBackend
from duckdb_mongo_spark.backends.parquet import ParquetBackend
from duckdb_mongo_spark.backends.csv import CsvBackend

__all__ = ["DocumentBackend", "MemoryBackend", "JsonlBackend", "ParquetBackend", "CsvBackend"]
