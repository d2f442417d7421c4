"""JSONL document backend: ``<root>/<db>/<coll>.jsonl``, one doc per line.

Supports the MongoDB extended-JSON subset for typed values:
``{"$oid": "..."}`` → ObjectId, ``{"$date": "ISO"}`` → datetime,
``{"$numberDecimal": "..."}`` → Decimal, ``{"$binary": {"base64": ...}}``
→ bytes.

Scale design: ``partitions()`` splits each file into byte ranges (like
Spark's own text-file splits); each executor seeks to its range start,
aligns to the next newline, and reads to the range end. No driver-side
materialization.
"""

from __future__ import annotations

import base64
import datetime as _dt
import json
import os
from collections.abc import Iterator
from decimal import Decimal

from duckdb_mongo_spark.backends.base import DocumentBackend, ScanPartition
from duckdb_mongo_spark.bsonlike import ObjectId

_SPLIT_BYTES = 32 * 1024 * 1024


def decode_extended(obj):
    """Decode the extended-JSON typed-value subset, recursively."""
    if isinstance(obj, dict):
        if len(obj) == 1:
            (k, v), = obj.items()
            if k == "$oid":
                return ObjectId(v)
            if k == "$date":
                if isinstance(v, (int, float)):
                    return _dt.datetime.fromtimestamp(v / 1000.0, _dt.timezone.utc).replace(tzinfo=None)
                s = str(v).replace("Z", "+00:00")
                dt = _dt.datetime.fromisoformat(s)
                if dt.tzinfo is not None:
                    dt = dt.astimezone(_dt.timezone.utc).replace(tzinfo=None)
                return dt
            if k == "$numberDecimal":
                return Decimal(v)
            if k == "$numberLong" or k == "$numberInt":
                return int(v)
            if k == "$numberDouble":
                return float(v)
            if k == "$binary":
                return base64.b64decode(v["base64"] if isinstance(v, dict) else v)
        return {k: decode_extended(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [decode_extended(x) for x in obj]
    return obj


class JsonlBackend(DocumentBackend):
    """A collection is either ``<root>/<db>/<coll>.jsonl`` (single file)
    or a directory ``<root>/<db>/<coll>/`` of ``*.jsonl`` parts
    (multi-file layout — what a change-stream tailer or a distributed
    writer produces; lexicographic file order = arrival order)."""

    def __init__(self, root: str):
        self.root = root

    def _path(self, db, coll):
        return os.path.join(self.root, db, f"{coll}.jsonl")

    def _files(self, db, coll) -> list[str]:
        single = self._path(db, coll)
        if os.path.isfile(single):
            return [single]
        d = os.path.join(self.root, db, coll)
        if os.path.isdir(d):
            # .jsonl parts + .json parts (Spark's streaming json sink
            # writes part-*.json); skip metadata/checkpoint artifacts
            return sorted(
                os.path.join(d, f)
                for f in os.listdir(d)
                if f.endswith((".jsonl", ".json")) and not f.startswith(("_", "."))
            )
        return []

    def fingerprint(self, db, coll):
        files = self._files(db, coll)
        if not files:
            return None
        return tuple(
            (p, os.path.getsize(p), os.path.getmtime(p)) for p in files
        )

    def list_databases(self):
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d))
        )

    def list_collections(self, db):
        p = os.path.join(self.root, db)
        if not os.path.isdir(p):
            return []
        out = {f[:-6] for f in os.listdir(p) if f.endswith(".jsonl")}
        out |= {
            d for d in os.listdir(p)
            if os.path.isdir(os.path.join(p, d))
            and any(
                f.endswith((".jsonl", ".json")) and not f.startswith(("_", "."))
                for f in os.listdir(os.path.join(p, d))
            )
        }
        return sorted(out)

    def iter_documents(self, db, coll) -> Iterator[dict]:
        files = self._files(db, coll)
        if not files:
            raise KeyError(f"no such collection: {db}.{coll}")
        for path in files:
            with open(path, "rb") as f:
                for line in f:
                    line = line.strip()
                    if line:
                        yield decode_extended(json.loads(line))

    def partitions(self, db, coll, n):
        files = self._files(db, coll)
        if len(files) > 1:
            # one partition per file part (executors read files in parallel);
            # byte-splitting within parts kicks in for single-file layouts
            return [
                ScanPartition(db, coll, i, len(files), {"path": p})
                for i, p in enumerate(files)
            ]
        path = files[0] if files else self._path(db, coll)
        size = os.path.getsize(path) if os.path.exists(path) else 0
        if size == 0:
            return [ScanPartition(db, coll, 0, 1, {"start": 0, "end": 0})]
        n = max(1, min(n, (size + _SPLIT_BYTES - 1) // _SPLIT_BYTES))
        step = size // n
        parts = []
        for i in range(n):
            start = i * step
            end = size if i == n - 1 else (i + 1) * step
            parts.append(ScanPartition(db, coll, i, n, {"start": start, "end": end}))
        return parts

    def read_partition(self, part) -> Iterator[dict]:
        if "path" in part.extra:  # whole-file partition (directory layout)
            with open(part.extra["path"], "rb") as f:
                for line in f:
                    line = line.strip()
                    if line:
                        yield decode_extended(json.loads(line))
            return
        path = self._path(part.db, part.coll)
        start, end = part.extra["start"], part.extra["end"]
        if not os.path.exists(path) or end <= start:
            return
        with open(path, "rb") as f:
            if start > 0:
                f.seek(start - 1)
                f.readline()  # align to next newline (prev byte may be \n)
            while f.tell() <= end:
                line = f.readline()
                if not line:
                    break
                # a record belongs to the split containing its first byte
                if f.tell() - len(line) >= end:
                    break
                line = line.strip()
                if line:
                    yield decode_extended(json.loads(line))
