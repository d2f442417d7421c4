"""CSV document backend: typed parsing, byte-range partitioning, full
engine integration (attach + scan + pushdown), DuckDB read_csv_auto
value parity.
"""

from __future__ import annotations

import datetime as dt

import pytest

import duckdb_mongo_spark as dms
from duckdb_mongo_spark.backends import CsvBackend
from duckdb_mongo_spark.pushdown import C

_CSV = """id,name,age,score,active,joined,note
1,Alice,30,9.5,true,2024-01-15,first
2,Bob,25,7.25,false,2024-02-20,
3,Charlie,35,8.0,true,2024-03-05,third
4,Dana,28,6.5,false,2024-04-10,fourth
"""


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    d = tmp_path_factory.mktemp("csvdocs") / "appdb"
    d.mkdir()
    (d / "people.csv").write_text(_CSV)
    return str(d.parent)


@pytest.fixture(scope="module")
def be(root):
    return CsvBackend(root)


class TestBackend:
    def test_listing(self, be):
        assert be.list_databases() == ["appdb"]
        assert be.list_collections("appdb") == ["people"]

    def test_typed_parse_and_missing_fields(self, be):
        docs = {d["id"]: d for d in be.iter_documents("appdb", "people")}
        assert docs[1]["age"] == 30 and isinstance(docs[1]["age"], int)
        assert docs[1]["score"] == 9.5 and isinstance(docs[1]["score"], float)
        assert docs[1]["active"] is True
        assert docs[1]["joined"] == dt.datetime(2024, 1, 15)
        assert "note" not in docs[2]  # empty cell -> absent field

    def test_partitions_cover_all_rows(self, be, root, tmp_path_factory):
        import os

        # grow the file so multiple byte splits exist, then force n=3
        d = tmp_path_factory.mktemp("csvbig") / "db"
        d.mkdir()
        rows = ["id,val"] + [f"{i},{i * 2}" for i in range(5000)]
        (d / "nums.csv").write_text("\n".join(rows) + "\n")
        big = CsvBackend(str(d.parent))
        import duckdb_mongo_spark.backends.csv as csvmod

        old = csvmod._SPLIT_BYTES
        csvmod._SPLIT_BYTES = 4096
        try:
            parts = big.partitions("db", "nums", 3)
            assert len(parts) == 3
            seen = []
            for p in parts:
                seen.extend(doc["id"] for doc in big.read_partition(p))
            assert sorted(seen) == list(range(5000))  # no dup, no loss
        finally:
            csvmod._SPLIT_BYTES = old


class TestEngineIntegration:
    def test_attach_scan_pushdown(self, spark, root):
        cat = dms.attach(f"csv:{root}", alias="c", spark=spark)
        mf = cat.table("people")
        out = mf.filter(C("age") > 27).select("name", "age")
        d = out.scan_description()
        assert "scan_method=find" in d and "$gt" in d
        rows = {r["name"]: r["age"] for r in out.df().collect()}
        assert rows == {"Alice": 30, "Charlie": 35, "Dana": 28}

    def test_duckdb_read_csv_auto_parity(self, spark, root):
        import duckdb

        cat = dms.attach(f"csv:{root}", alias="c2", spark=spark)
        got = {
            (r["name"], r["age"], r["score"], r["active"])
            for r in cat.table("people")
            .select("name", "age", "score", "active").df().collect()
        }
        con = duckdb.connect()
        expect = set(
            con.execute(
                f"SELECT name, age, score, active FROM read_csv_auto('{root}/appdb/people.csv')"
            ).fetchall()
        )
        assert got == expect
