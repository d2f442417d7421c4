"""In-memory document backend (test fixtures).

Collections are ``{db: {coll: [doc, ...]}}``. Documents without ``_id``
get an auto ObjectId at insert, like mongod does.
"""

from __future__ import annotations

from collections.abc import Iterator

from duckdb_mongo_spark.backends.base import DocumentBackend, ScanPartition
from duckdb_mongo_spark.bsonlike import ObjectId


class MemoryBackend(DocumentBackend):
    # The hermetic mongod stand-in: tests assert server-side pushdown
    # against it, so it takes the remote profile (all stages pushed) AND
    # the remote execution paths (find_partition / aggregate run through
    # the backend like a server would, not the reader's local fallback).
    is_remote = True
    pushdown_profile = "remote"

    def __init__(self, data: dict[str, dict[str, list[dict]]] | None = None):
        self._data: dict[str, dict[str, list[dict]]] = {}
        if data:
            for db, colls in data.items():
                for coll, docs in colls.items():
                    self.insert_many(db, coll, docs)

    def insert_many(self, db: str, coll: str, docs: list[dict]):
        target = self._data.setdefault(db, {}).setdefault(coll, [])
        for doc in docs:
            doc = dict(doc)
            if "_id" not in doc:
                doc["_id"] = ObjectId()
            target.append(doc)

    def create_collection(self, db: str, coll: str):
        self._data.setdefault(db, {}).setdefault(coll, [])

    def drop_collection(self, db: str, coll: str):
        self._data.get(db, {}).pop(coll, None)

    def list_databases(self):
        return sorted(self._data)

    def list_collections(self, db):
        return sorted(self._data.get(db, {}))

    def iter_documents(self, db, coll) -> Iterator[dict]:
        if db not in self._data or coll not in self._data[db]:
            raise KeyError(f"no such collection: {db}.{coll}")
        return iter(self._data[db][coll])

    def partitions(self, db, coll, n):
        docs = self._data.get(db, {}).get(coll, [])
        total = max(1, min(n, (len(docs) + 999) // 1000))
        return [ScanPartition(db, coll, i, total) for i in range(total)]
