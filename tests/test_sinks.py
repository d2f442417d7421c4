"""write_collection round-trips: DataFrame → collection → scan → same
documents. Also covers the multi-file parquet collection layout that the
sink produces (directory of part files = the realistic many-file dataset
shape; partitions become (file, row-group) chunks)."""

from __future__ import annotations

import datetime as dt
import os
from decimal import Decimal

import pytest

from duckdb_mongo_spark.backends import JsonlBackend, MemoryBackend, ParquetBackend
from duckdb_mongo_spark.frame import MongoFrame
from duckdb_mongo_spark.pushdown import C
from duckdb_mongo_spark.schema.infer import resolve_schema
from duckdb_mongo_spark.sinks import write_collection


def _df(spark, n=100):
    return spark.range(n).selectExpr(
        "CAST(id AS BIGINT) AS k",
        "CONCAT('doc-', id) AS name",
        "CAST(id AS DOUBLE) / 7 AS score",
        "id % 2 = 0 AS flag",
    ).repartition(4)


class TestParquetSink:
    def test_round_trip_multifile(self, spark, tmp_path):
        be = ParquetBackend(str(tmp_path), id_field="k")
        write_collection(_df(spark), be, "main", "c")
        # Spark wrote a directory of part files
        assert os.path.isdir(tmp_path / "c.parquet")
        assert "c" in be.list_collections("main")
        assert be.count("main", "c") == 100
        docs = {d["k"]: d for d in be.iter_documents("main", "c")}
        assert len(docs) == 100 and docs[3]["name"] == "doc-3"

    def test_scan_round_trip_both_paths(self, spark, tmp_path):
        from dataclasses import replace

        be = ParquetBackend(str(tmp_path), id_field="k")
        write_collection(_df(spark), be, "main", "c")
        sch = resolve_schema(be, "main", "c")
        f = (MongoFrame(spark=spark, backend=be, db="main", coll="c",
                        schema=sch)
             .filter(C("k") >= 50).select("k", "name"))
        fd, fs = replace(f), replace(f, direct=False)
        a = sorted(map(tuple, fd.df().collect()))
        b = sorted(map(tuple, fs.df().collect()))
        assert fd.last_exec_path == "direct"
        assert len(a) == 50 and a == b

    def test_multifile_partitions_cover_all_rows(self, spark, tmp_path):
        be = ParquetBackend(str(tmp_path), id_field="k")
        write_collection(_df(spark), be, "main", "c")
        parts = be.partitions("main", "c", 8)
        assert len(parts) > 1
        seen = []
        for p in parts:
            seen += [d["k"] for d in be.read_partition(p)]
        assert sorted(seen) == list(range(100))

    def test_append_and_error_modes(self, spark, tmp_path):
        be = ParquetBackend(str(tmp_path), id_field="k")
        write_collection(_df(spark, 10), be, "main", "c")
        write_collection(_df(spark, 5), be, "main", "c", mode="append")
        assert be.count("main", "c") == 15
        with pytest.raises(FileExistsError):
            write_collection(_df(spark, 1), be, "main", "c", mode="error")

    def test_overwrite_single_file_collection(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(pa.table({"k": pa.array([1, 2], pa.int64())}),
                       tmp_path / "c.parquet")
        be = ParquetBackend(str(tmp_path), id_field="k")
        with pytest.raises(ValueError):
            write_collection(_df(spark, 3), be, "main", "c", mode="append")
        write_collection(_df(spark, 3), be, "main", "c", mode="overwrite")
        assert be.count("main", "c") == 3


class TestCompaction:
    def test_compact_reduces_files_keeps_rows(self, spark, tmp_path):
        from duckdb_mongo_spark.sinks import compact_collection

        be = ParquetBackend(str(tmp_path), id_field="k")
        # 32 tiny part files: the incremental-ingest small-file shape
        write_collection(_df(spark, 2000).repartition(32), be, "main", "c")
        target = tmp_path / "c.parquet"
        before = sum(1 for f in os.listdir(target) if f.endswith(".parquet"))
        assert before >= 32
        n = compact_collection(spark, be, "main", "c", target_file_mb=128)
        after = sum(1 for f in os.listdir(target) if f.endswith(".parquet"))
        assert n == after == 1  # 2000 rows ≪ 128 MB → one file
        docs = {d["k"]: d for d in be.iter_documents("main", "c")}
        assert len(docs) == 2000 and docs[1234]["name"] == "doc-1234"

    def test_compact_with_zorder_layout(self, spark, tmp_path):
        from duckdb_mongo_spark.sinks import compact_collection

        be = ParquetBackend(str(tmp_path), id_field="k")
        write_collection(_df(spark, 1000).repartition(16), be, "main", "c")
        compact_collection(spark, be, "main", "c", layout_cols=["k", "score"])
        assert be.count("main", "c") == 1000

    def test_compact_recovers_from_crashed_swap(self, spark, tmp_path):
        # Prior run died between the two renames: data lives ONLY under
        # .__compact_old__ (plus a complete tmp_new). A rerun must restore
        # the old dir and compact normally instead of raising ENOENT.
        import shutil

        from duckdb_mongo_spark.sinks import compact_collection

        be = ParquetBackend(str(tmp_path), id_field="k")
        write_collection(_df(spark, 200).repartition(8), be, "main", "c")
        target = str(tmp_path / "c.parquet")
        shutil.copytree(target, target + ".__compact_tmp__")
        os.rename(target, target + ".__compact_old__")  # crash point
        n = compact_collection(spark, be, "main", "c")
        assert n == 1
        assert not os.path.exists(target + ".__compact_old__")
        assert not os.path.exists(target + ".__compact_tmp__")
        assert be.count("main", "c") == 200

    def test_compact_cleans_stale_temp_dirs(self, spark, tmp_path):
        # Swap completed but cleanup was lost (stale tmp_old with garbage)
        # plus a stale tmp_new: both must be discarded, live data kept.
        from duckdb_mongo_spark.sinks import compact_collection

        be = ParquetBackend(str(tmp_path), id_field="k")
        write_collection(_df(spark, 100).repartition(4), be, "main", "c")
        target = str(tmp_path / "c.parquet")
        os.makedirs(target + ".__compact_old__")
        os.makedirs(target + ".__compact_tmp__")
        with open(target + ".__compact_old__/junk.parquet", "w") as f:
            f.write("stale")
        n = compact_collection(spark, be, "main", "c")
        assert n == 1
        assert not os.path.exists(target + ".__compact_old__")
        assert not os.path.exists(target + ".__compact_tmp__")
        assert be.count("main", "c") == 100

    def test_compact_single_file_noop(self, spark, tmp_path):
        from duckdb_mongo_spark.sinks import compact_collection

        be = ParquetBackend(str(tmp_path), id_field="k")
        _df(spark, 10).coalesce(1).write.parquet(str(tmp_path / "tmpdir"))
        part = next(
            f for f in os.listdir(tmp_path / "tmpdir") if f.endswith(".parquet")
        )
        os.rename(tmp_path / "tmpdir" / part, tmp_path / "single.parquet")
        assert compact_collection(spark, be, "main", "single") == 1


class TestJsonlSink:
    def test_typed_round_trip(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, dt.datetime(2024, 3, 1, 12, 30, 0), Decimal("12.34"),
              bytearray(b"\x00\x01"), dt.date(2023, 5, 1)),
             (2, None, None, None, None)],
            "k bigint, ts timestamp, amt decimal(10,2), payload binary, d date",
        )
        be = JsonlBackend(str(tmp_path))
        write_collection(df, be, "db", "c")
        docs = {d["k"]: d for d in be.iter_documents("db", "c")}
        assert docs[1]["ts"] == dt.datetime(2024, 3, 1, 12, 30)
        assert docs[1]["amt"] == Decimal("12.34")
        assert docs[1]["payload"] == b"\x00\x01"
        assert docs[1]["d"] == dt.datetime(2023, 5, 1)  # dates → midnight rule
        # nulls were omitted at write: read back as missing
        assert "ts" not in docs[2] and "amt" not in docs[2]

    def test_scan_after_write(self, spark, tmp_path):
        be = JsonlBackend(str(tmp_path))
        write_collection(_df(spark, 40), be, "db", "c")
        sch = resolve_schema(be, "db", "c")
        f = (MongoFrame(spark=spark, backend=be, db="db", coll="c", schema=sch)
             .filter(C("flag") == True).select("k", "name"))  # noqa: E712
        assert f.df().count() == 20


class TestMemorySink:
    def test_round_trip_and_modes(self, spark):
        be = MemoryBackend()
        write_collection(_df(spark, 8), be, "db", "c")
        assert be.count("db", "c") == 8
        write_collection(_df(spark, 3), be, "db", "c", mode="append")
        assert be.count("db", "c") == 11
        write_collection(_df(spark, 2), be, "db", "c", mode="overwrite")
        assert be.count("db", "c") == 2
        with pytest.raises(FileExistsError):
            write_collection(_df(spark, 1), be, "db", "c", mode="error")

    def test_driver_row_cap(self, spark):
        be = MemoryBackend()
        with pytest.raises(ValueError):
            write_collection(_df(spark, 50), be, "db", "c", max_driver_rows=10)


class TestMongoSink:
    def test_foreach_partition_insert_via_fake(self, spark):
        from duckdb_mongo_spark.testing.fake_mongo import FakeMongoBackend

        be = FakeMongoBackend()
        # distributed=False: the fake's state lives in this process, so
        # executor-side copies (pickled state) cannot write back to it
        write_collection(_df(spark, 20), be, "db", "c", distributed=False)
        assert be.count("db", "c") == 20
        write_collection(_df(spark, 5), be, "db", "c", mode="append",
                         distributed=False)
        assert be.count("db", "c") == 25
        write_collection(_df(spark, 3), be, "db", "c", mode="overwrite",
                         distributed=False)
        assert be.count("db", "c") == 3
