"""Backend partitioned-read correctness: every document is read exactly
once across partitions (the invariant distributed scans rest on), plus
extended-JSON decoding and the parquet Arrow scan path.
"""

from __future__ import annotations

import datetime as dt
import json
from decimal import Decimal

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from duckdb_mongo_spark.backends import JsonlBackend, MemoryBackend, ParquetBackend
from duckdb_mongo_spark.backends import jsonl as jsonl_mod
from duckdb_mongo_spark.bsonlike import ObjectId


def read_all_partitions(backend, db, coll, n):
    parts = backend.partitions(db, coll, n)
    docs = []
    for p in parts:
        docs.extend(backend.read_partition(p))
    return parts, docs


class TestJsonlPartitions:
    @pytest.fixture()
    def root(self, tmp_path, monkeypatch):
        monkeypatch.setattr(jsonl_mod, "_SPLIT_BYTES", 512)  # force splits
        d = tmp_path / "db1"
        d.mkdir()
        rows = [{"_id": f"d{i:04d}", "v": i, "pad": "x" * 40} for i in range(200)]
        (d / "c.jsonl").write_text("\n".join(json.dumps(r) for r in rows) + "\n")
        return str(tmp_path)

    def test_byte_splits_exactly_once(self, root):
        be = JsonlBackend(root)
        parts, docs = read_all_partitions(be, "db1", "c", 8)
        assert len(parts) > 1  # actually split
        ids = [d["_id"] for d in docs]
        assert len(ids) == 200
        assert len(set(ids)) == 200  # no doc read twice, none lost

    def test_split_count_capped_by_size(self, root):
        be = JsonlBackend(root)
        parts = be.partitions("db1", "c", 1000)
        # ≤ ceil(size / _SPLIT_BYTES) partitions, never the requested 1000
        assert 1 < len(parts) <= 40

    def test_directory_layout_one_partition_per_file(self, tmp_path):
        d = tmp_path / "db2" / "multi"
        d.mkdir(parents=True)
        for i in range(3):
            rows = [{"_id": f"f{i}-{j}"} for j in range(5)]
            (d / f"part-{i}.jsonl").write_text(
                "\n".join(json.dumps(r) for r in rows) + "\n")
        be = JsonlBackend(str(tmp_path))
        parts, docs = read_all_partitions(be, "db2", "multi", 8)
        assert len(parts) == 3
        assert len({d["_id"] for d in docs}) == 15

    def test_extended_json_decoding(self, tmp_path):
        d = tmp_path / "db3"
        d.mkdir()
        doc = {
            "_id": {"$oid": "507f1f77bcf86cd799439011"},
            "when": {"$date": "2023-05-01T12:00:00Z"},
            "amt": {"$numberDecimal": "12.34"},
            "n": {"$numberLong": "9007199254740993"},
        }
        (d / "c.jsonl").write_text(json.dumps(doc) + "\n")
        be = JsonlBackend(str(tmp_path))
        got = next(iter(be.iter_documents("db3", "c")))
        assert isinstance(got["_id"], ObjectId)
        assert got["when"] == dt.datetime(2023, 5, 1, 12, 0)
        assert got["amt"] == Decimal("12.34")
        assert got["n"] == 9007199254740993


class TestParquetPartitions:
    @pytest.fixture()
    def root(self, tmp_path):
        table = pa.table({
            "k": pa.array(range(1000), pa.int64()),
            "s": pa.array([f"s{i}" for i in range(1000)]),
        })
        pq.write_table(table, tmp_path / "c.parquet", row_group_size=100)
        return str(tmp_path)

    def test_row_group_splits_exactly_once(self, root):
        be = ParquetBackend(root, id_field="k")
        parts, docs = read_all_partitions(be, "main", "c", 4)
        assert len(parts) == 4  # 10 row groups over 4 partitions
        ks = [d["k"] for d in docs]
        assert len(ks) == 1000 and len(set(ks)) == 1000

    def test_arrow_scan_respects_partition_and_filter(self, root):
        be = ParquetBackend(root, id_field="k")
        parts = be.partitions("main", "c", 2)
        out_fields = [("k", pa.int64(), "k"), ("s", pa.string(), "s")]
        seen = []
        for p in parts:
            gen = be.arrow_scan("main", "c", p, {"k": {"$gte": 900}}, out_fields)
            for batch in gen:
                seen.extend(batch.column(0).to_pylist())
        assert sorted(seen) == list(range(900, 1000))

    def test_arrow_scan_limit(self, root):
        be = ParquetBackend(root, id_field="k")
        part = be.partitions("main", "c", 1)[0]
        gen = be.arrow_scan("main", "c", part, None,
                            [("k", pa.int64(), "k")], limit=37)
        n = sum(b.num_rows for b in gen)
        assert n == 37

    def test_metadata_count(self, root):
        be = ParquetBackend(root)
        assert be.count("main", "c") == 1000


class TestParquetSchemaSentinel:
    """The __schema sentinel doc must be invisible to BOTH the arrow fast
    path and the metadata COUNT fast path (round-1 ADVICE: the interpreted
    scan filtered it, the fast paths did not — off-by-one row/count)."""

    @pytest.fixture()
    def root(self, tmp_path):
        table = pa.table({
            "_id": pa.array(["__schema"] + [f"id{i}" for i in range(50)]),
            "v": pa.array([None] + list(range(50)), pa.int64()),
        })
        pq.write_table(table, tmp_path / "c.parquet")
        return str(tmp_path)

    def test_arrow_scan_excludes_sentinel(self, root):
        be = ParquetBackend(root)
        part = be.partitions("main", "c", 1)[0]
        out_fields = [("_id", pa.string(), "_id"), ("v", pa.int64(), "v")]
        ids = []
        for batch in be.arrow_scan("main", "c", part, None, out_fields):
            ids.extend(batch.column(0).to_pylist())
        assert "__schema" not in ids and len(ids) == 50

    def test_arrow_scan_excludes_sentinel_with_filter(self, root):
        be = ParquetBackend(root)
        part = be.partitions("main", "c", 1)[0]
        out_fields = [("_id", pa.string(), "_id")]
        ids = []
        for batch in be.arrow_scan(
            "main", "c", part, {"v": {"$lt": 5}}, out_fields
        ):
            ids.extend(batch.column(0).to_pylist())
        assert sorted(ids) == [f"id{i}" for i in range(5)]

    def test_metadata_count_excludes_sentinel(self, root):
        be = ParquetBackend(root)
        assert be.count("main", "c") == 50

    def test_filtered_count_excludes_sentinel(self, root):
        # sentinel doc has v=null, so {"v": null} would match it in MQL;
        # counts must never include engine metadata
        be = ParquetBackend(root)
        assert be.count("main", "c", {"v": {"$gte": 0}}) == 50
        assert be.count("main", "c", {"v": None}) == 0

    def test_sentinel_probe_invalidated_on_rewrite(self, root):
        """The probe cache is keyed on (path, mtime, size): rewriting the
        parquet file (sentinel removed here) while the backend instance
        lives must invalidate it — the entry-level scan cache keeps
        backends alive across queries (ADVICE r2)."""
        import os

        be = ParquetBackend(root)
        assert be.count("main", "c") == 50  # probe cached: sentinel present
        path = os.path.join(root, "c.parquet")
        table = pa.table({
            "_id": pa.array([f"id{i}" for i in range(50)]),
            "v": pa.array(list(range(50)), pa.int64()),
        })
        pq.write_table(table, path)
        os.utime(path, ns=(os.stat(path).st_atime_ns,
                           os.stat(path).st_mtime_ns + 1_000_000))
        assert be.count("main", "c") == 50  # no stale −1 off-by-one

    def test_arrow_scan_keeps_null_id_rows(self, tmp_path):
        """Arrow != yields null for null input and Table.filter drops
        null-mask rows — the sentinel filter must OR an is_null so rows
        with null _id survive, matching the interpreted path."""
        table = pa.table({
            "_id": pa.array(["__schema", "a", None, "b"]),
            "v": pa.array([None, 1, 2, 3], pa.int64()),
        })
        pq.write_table(table, tmp_path / "c.parquet")
        be = ParquetBackend(str(tmp_path))
        part = be.partitions("main", "c", 1)[0]
        out_fields = [("_id", pa.string(), "_id"), ("v", pa.int64(), "v")]
        vs = []
        for batch in be.arrow_scan("main", "c", part, None, out_fields):
            vs.extend(batch.column(1).to_pylist())
        assert sorted(vs) == [1, 2, 3]  # null-_id row kept, sentinel dropped


class TestMemoryPartitions:
    def test_modulo_split_exactly_once(self):
        be = MemoryBackend()
        be.insert_many("db", "c", [{"_id": i} for i in range(2500)])
        parts, docs = read_all_partitions(be, "db", "c", 4)
        assert len(parts) >= 2
        ids = [d["_id"] for d in docs]
        assert len(ids) == 2500 and len(set(ids)) == 2500
