"""Parquet document backend: a directory of ``<coll>.parquet`` files viewed
as one document database (rows = documents).

This is how the driver's /root/testdata tables are exposed to the
federation layer for end-to-end tests. Scale design: partitions map to
parquet **row groups**, so executors read disjoint byte ranges with
pyarrow directly — no driver materialization, same shape as a real
distributed scan.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from duckdb_mongo_spark.backends.base import DocumentBackend, ScanPartition


class ParquetBackend(DocumentBackend):
    def __init__(self, root: str, db_name: str = "main", id_field: str | None = None):
        """``id_field``: column whose value doubles as the document ``_id``
        (parquet rows have no natural ObjectId; TopN-on-_id pushdown and
        `_id`-range partitioning need a key)."""
        self.root = root
        self.db_name = db_name
        self.id_field = id_field

    def _path(self, coll):
        return os.path.join(self.root, f"{coll}.parquet")

    def list_databases(self):
        return [self.db_name]

    def list_collections(self, db):
        if db != self.db_name or not os.path.isdir(self.root):
            return []
        return sorted(f[:-8] for f in os.listdir(self.root) if f.endswith(".parquet"))

    def _table_rows(self, path, row_groups=None) -> Iterator[dict]:
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(path)
        groups = row_groups if row_groups is not None else range(pf.num_row_groups)
        for rg in groups:
            batch = pf.read_row_group(rg)
            for row in batch.to_pylist():
                if self.id_field and "_id" not in row and self.id_field in row:
                    row["_id"] = row[self.id_field]
                yield row

    def iter_documents(self, db, coll) -> Iterator[dict]:
        path = self._path(coll)
        if db != self.db_name or not os.path.exists(path):
            raise KeyError(f"no such collection: {db}.{coll}")
        return self._table_rows(path)

    def partitions(self, db, coll, n):
        import pyarrow.parquet as pq

        path = self._path(coll)
        num_groups = pq.ParquetFile(path).num_row_groups
        if num_groups <= 1:
            return [ScanPartition(db, coll, 0, 1, {"row_groups": None})]
        n = max(1, min(n, num_groups))
        parts = []
        for i in range(n):
            rgs = [g for g in range(num_groups) if g % n == i]
            parts.append(ScanPartition(db, coll, i, n, {"row_groups": rgs}))
        return parts

    def read_partition(self, part) -> Iterator[dict]:
        rgs = part.extra.get("row_groups")
        return self._table_rows(self._path(part.coll), rgs)

    def sample(self, db, coll, n, seed=42):
        """Schema-inference sampling without a full materialize: stream the
        first n rows (parquet rows are synthetic/uniform; the $sample
        randomness the reference needs for skewed real collections is
        preserved in the base/Pymongo backends)."""
        import itertools

        return list(itertools.islice(self.iter_documents(db, coll), n))

    def count(self, db, coll, filter=None):
        if filter:
            return super().count(db, coll, filter)
        import pyarrow.parquet as pq

        return pq.ParquetFile(self._path(coll)).metadata.num_rows
