"""Real-MongoDB backend via pymongo (import-gated — pymongo is not in the
test container; this backend exists so the same engine runs unchanged
against a live server).

Pipelines/filters are shipped server-side (``is_remote = True``), exactly
like the reference's mongocxx cursor calls
(/root/reference/src/mongo_table_function.cpp:362,598).

Partitioning for scale: `_id`-range splits computed from server-side
``$sample`` split points, one ``$match`` range per partition — SURVEY.md
§4.2's NEW design for the 100 TB goal.
"""

from __future__ import annotations

import decimal as _decimal
from collections.abc import Iterator

from duckdb_mongo_spark.backends.base import DocumentBackend, ScanPartition
from duckdb_mongo_spark.bsonlike import ObjectId as _EngineObjectId
from duckdb_mongo_spark.errors import ConnectionStringError

try:  # pragma: no cover - not installed in test container
    import pymongo  # type: ignore

    HAVE_PYMONGO = True
except Exception:  # pragma: no cover
    pymongo = None
    HAVE_PYMONGO = False

try:  # pragma: no cover - bson ships with pymongo
    from bson import Decimal128 as _BsonDecimal128  # type: ignore
    from bson import ObjectId as _BsonObjectId  # type: ignore
except Exception:
    _BsonDecimal128 = None
    _BsonObjectId = None


def _from_wire(v):
    """Normalize wire-typed BSON values into the engine's own types at the
    backend boundary, so nothing downstream (schema inference, flatten
    coercion, the MQL oracle) ever sees a driver class: bson.ObjectId ->
    bsonlike.ObjectId (12 raw bytes preserved), bson.Decimal128 ->
    decimal.Decimal (exact digits, the reference's Decimal128-as-string
    parse; inference.cpp:1076-1148 accepts the same loss on cast).
    Detection is duck-typed (class name + API) so the in-process wire
    fake's stand-ins exercise this exact code path without bson installed.
    """
    if isinstance(v, dict):
        return {k: _from_wire(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_from_wire(x) for x in v]
    tn = type(v).__name__
    if tn == "ObjectId" and type(v) is not _EngineObjectId and hasattr(v, "binary"):
        return _EngineObjectId(bytes(v.binary))
    if tn == "Decimal128" and hasattr(v, "to_decimal"):
        return _decimal.Decimal(v.to_decimal())
    return v


def _to_wire(v):
    """Outbound filters/pipelines: engine types -> driver BSON types when
    the real bson package is present (pymongo cannot encode foreign
    classes). Without bson (the in-process fake) values pass through —
    the fake's stored wire ObjectIds subclass the engine ObjectId, so
    equality/range comparisons work on engine values directly."""
    if isinstance(v, dict):
        return {k: _to_wire(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_to_wire(x) for x in v]
    if type(v) is _EngineObjectId and _BsonObjectId is not None:
        return _BsonObjectId(str(v))
    if type(v) is _decimal.Decimal and _BsonDecimal128 is not None:
        return _BsonDecimal128(v)
    return v


def _strip_index_definition(pipeline):
    """Drop the engine-private ``__indexDefinition__`` payload (r10,
    ``mql/search_index``) from ``$search``/``$searchMeta`` heads before
    shipping a pipeline to a REAL server: there the live index holds
    the metadata the payload stands in for, and mongod would reject the
    unknown field."""
    out = []
    for stage in pipeline:
        if isinstance(stage, dict) and len(stage) == 1:
            (op, spec), = stage.items()
            if op in ("$search", "$searchMeta") and isinstance(spec, dict) \
                    and "__indexDefinition__" in spec:
                spec = {k: v for k, v in spec.items()
                        if k != "__indexDefinition__"}
                stage = {op: spec}
        out.append(stage)
    return out


def _cursor_guard(it):
    """Translate driver cursor-invalidation errors into the engine's
    ``CursorError`` while a scan drains a cursor batch-by-batch.

    Matched by class NAME (pymongo's ``CursorNotFound``, or the wire
    fake's stand-in of the same name) so the contract is pinned without
    importing pymongo. Everything else — notably AutoReconnect-class
    transient network errors — propagates unchanged: the retry unit is
    the Spark task (which re-opens a fresh cursor and re-reads its
    partition completely), never a partially-consumed cursor, so a
    mid-stream failure must fail loudly instead of truncating."""
    from duckdb_mongo_spark.errors import CursorError

    try:
        yield from it
    except Exception as exc:  # noqa: BLE001 — name-based driver-error match
        if type(exc).__name__ == "CursorNotFound":
            raise CursorError(
                f"server cursor invalidated mid-scan ({exc}); results "
                "would be truncated — the task fails and a retry "
                "re-reads this partition with a fresh cursor"
            ) from exc
        raise


class PymongoBackend(DocumentBackend):  # pragma: no cover - needs live server
    is_remote = True
    pushdown_profile = "remote"

    def find_schema_doc(self, db, coll, probe_limit=1000):
        doc = self.client[db][coll].find_one({"_id": "__schema"})
        return _from_wire(doc) if doc is not None else None

    def __init__(self, connection_string: str, timeout_ms: int = 5000):
        if not HAVE_PYMONGO:
            raise ConnectionStringError(
                "pymongo is not installed; use a local backend (jsonl/parquet/memory)"
            )
        # 5s connect/server-selection/socket timeouts, matching the
        # reference catalog (/root/reference/src/mongo_catalog.cpp:130-163).
        self.connection_string = connection_string
        self.timeout_ms = timeout_ms
        self._client = None

    @property
    def client(self):
        if self._client is None:
            self._client = pymongo.MongoClient(
                self.connection_string,
                connectTimeoutMS=self.timeout_ms,
                serverSelectionTimeoutMS=self.timeout_ms,
                socketTimeoutMS=self.timeout_ms,
            )
        return self._client

    def __getstate__(self):
        return {"connection_string": self.connection_string, "timeout_ms": self.timeout_ms}

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._client = None

    def list_databases(self):
        skip = {"admin", "local", "config"}  # same skip-list as the reference catalog
        return sorted(d for d in self.client.list_database_names() if d not in skip)

    def list_collections(self, db):
        return sorted(
            c for c in self.client[db].list_collection_names()
            if not c.startswith("system.")
        )

    def iter_documents(self, db, coll) -> Iterator[dict]:
        return _cursor_guard(
            _from_wire(d) for d in self.client[db][coll].find({}))

    def find(self, db, coll, filter=None, projection=None, limit=None):
        cur = self.client[db][coll].find(_to_wire(filter or {}), projection)
        if limit:
            cur = cur.limit(limit)
        return _cursor_guard(_from_wire(d) for d in cur)

    def _prepare_pipeline(self, pipeline):
        """Hook: a REAL server holds the live search index, so the
        engine-private ``__indexDefinition__`` payload must not reach
        the wire (mongod rejects unknown $search fields). The in-process
        fake overrides this to keep it — there the carried payload IS
        the live index (``testing/fake_mongo.FakeMongoBackend``)."""
        return _strip_index_definition(pipeline)

    def aggregate(self, db, coll, pipeline, seed=None):
        pipeline = self._prepare_pipeline(pipeline)
        cur = self.client[db][coll].aggregate(_to_wire(list(pipeline)), allowDiskUse=True)
        return _cursor_guard(_from_wire(d) for d in cur)

    def sample(self, db, coll, n, seed=42):
        return list(self.aggregate(db, coll, [{"$sample": {"size": n}}]))

    def count(self, db, coll, filter=None):
        # exclude the __schema sentinel doc so the count fast path agrees
        # with the scan path (datasource._docs_for filters it out)
        sentinel_free = {"_id": {"$ne": "__schema"}}
        f = {"$and": [filter, sentinel_free]} if filter else sentinel_free
        return self.client[db][coll].count_documents(_to_wire(f))

    def partitions(self, db, coll, n):
        if n <= 1:
            return [ScanPartition(db, coll, 0, 1, {"range": (None, None)})]
        # sample n*8 _ids, take n-1 evenly spaced split points (through
        # self.aggregate so split points are engine-typed; the range
        # filters they produce go back out through _to_wire)
        sampled = list(
            self.aggregate(db, coll, [{"$sample": {"size": n * 8}},
                                      {"$project": {"_id": 1}}])
        )
        # DISTINCT sampled ids: under the < 5% regime the server's
        # random cursor may emit the same document more than once, and
        # duplicate split points would produce empty [x, x) partitions
        # (r9 — surfaced by the fake's variable-duplicate streams)
        ids = sorted({d["_id"] for d in sampled})
        if len(ids) < n:
            return [ScanPartition(db, coll, 0, 1, {"range": (None, None)})]
        step = len(ids) // n
        points = [ids[i * step] for i in range(1, n)]
        bounds = [None] + points + [None]
        return [
            ScanPartition(db, coll, i, n, {"range": (bounds[i], bounds[i + 1])})
            for i in range(n)
        ]

    def _range_filter(self, part):
        lo, hi = part.extra.get("range", (None, None))
        filt = {}
        if lo is not None:
            filt.setdefault("_id", {})["$gte"] = lo
        if hi is not None:
            filt.setdefault("_id", {})["$lt"] = hi
        return filt

    def read_partition(self, part):
        return self.find(part.db, part.coll, filter=self._range_filter(part) or None)

    def find_partition(self, part, filter=None, projection=None, limit=None):
        """Server-side filtered cursor per partition: the pushed $match
        merges with the partition's _id range, so each executor pulls
        only its matching slice over the wire."""
        from duckdb_mongo_spark.pushdown.filters import merge_match

        filt = merge_match(self._range_filter(part) or None, filter)
        return self.find(part.db, part.coll, filter=filt, projection=projection,
                         limit=limit)

    def aggregate_partition(self, part, pipeline):
        """Record-wise pipeline per partition, server-side, with the
        partition's _id range prepended as $match."""
        rf = self._range_filter(part)
        full = ([{"$match": rf}] if rf else []) + list(pipeline)
        return self.aggregate(part.db, part.coll, full)
