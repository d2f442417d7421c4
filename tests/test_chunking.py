"""Document chunking (ops/chunking.py): boundary invariants,
reconstruction, DuckDB-oracle parity on the documents table, and a
hypothesis sweep of (chunk, overlap) grids vs a straight-line local
reference.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from duckdb_mongo_spark.ops.chunking import chunk_documents, chunk_sql


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        ("d1", " ".join(f"t{i}" for i in range(25))),   # 25 tokens
        ("d2", " ".join(f"u{i}" for i in range(10))),   # exactly one chunk
        ("d3", "single"),
        ("d4", "   \n\t  "),                            # whitespace-only
        ("d5", " ".join(f"v{i}" for i in range(10))),   # == chunk_tokens
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


@pytest.fixture(scope="module")
def chunked(docs):
    return chunk_documents(docs, chunk_tokens=10, overlap_tokens=3).cache()


class TestInvariants:
    def test_every_doc_chunked(self, docs, chunked):
        assert chunked.select("doc_id").distinct().count() == docs.count()

    def test_chunk_sizes(self, chunked):
        rows = chunked.filter(F.col("doc_id") == "d1").orderBy("chunk_idx").collect()
        # 25 tokens, chunk 10, stride 7: starts 0,7,14,21 -> sizes 10,10,10,4
        assert [r["chunk_start"] for r in rows] == [0, 7, 14, 21]
        assert [r["n_chunk_tokens"] for r in rows] == [10, 10, 10, 4]

    def test_single_chunk_doc(self, chunked):
        rows = chunked.filter(F.col("doc_id").isin("d2", "d5")).collect()
        assert all(r["chunk_idx"] == 0 and r["n_chunk_tokens"] == 10 for r in rows)

    def test_empty_doc_yields_one_empty_chunk(self, chunked):
        rows = chunked.filter(F.col("doc_id") == "d4").collect()
        assert len(rows) == 1
        assert rows[0]["n_chunk_tokens"] == 0 and rows[0]["chunk_text"] == ""

    def test_overlap_content(self, chunked):
        rows = {r["chunk_idx"]: r["chunk_text"].split(" ")
                for r in chunked.filter(F.col("doc_id") == "d1").collect()}
        # last 3 tokens of chunk k == first 3 of chunk k+1
        for k in range(3):
            assert rows[k][-3:] == rows[k + 1][:3]

    def test_reconstruction(self, docs, chunked):
        """Dropping each chunk's overlap prefix (except chunk 0) and
        concatenating reproduces the normalized document."""
        rows = chunked.filter(F.col("doc_id") == "d1").orderBy("chunk_idx").collect()
        toks = []
        for r in rows:
            piece = r["chunk_text"].split(" ")
            toks.extend(piece if r["chunk_idx"] == 0 else piece[3:])
        assert toks == [f"t{i}" for i in range(25)]

    def test_validation(self, docs):
        with pytest.raises(ValueError):
            chunk_documents(docs, chunk_tokens=0)
        with pytest.raises(ValueError):
            chunk_documents(docs, chunk_tokens=10, overlap_tokens=10)


class TestOracleParity:
    def test_documents_table_matches_duckdb(self, spark, sf_dir):
        import sys

        sys.path.insert(0, "/root/repo/tests")
        from _oracle import compare, duckdb_con

        import __spark_entry__ as entry

        entry._views(spark, sf_dir, "documents")
        out = chunk_documents(
            spark.table("documents").filter(F.col("doc_id") < 200),
            chunk_tokens=40, overlap_tokens=8,
        ).orderBy("doc_id", "chunk_idx")
        con = duckdb_con(sf_dir)
        sql = chunk_sql(
            "SELECT doc_id, text FROM documents WHERE doc_id < 200",
            chunk_tokens=40, overlap_tokens=8,
        ) + " ORDER BY doc_id, chunk_idx"
        res = compare(out, con, sql)
        assert res["value_match"], res
        assert res["rows_spark"] > 200  # multi-chunk docs exist


class TestHypothesis:
    @settings(max_examples=15, deadline=None)
    @given(
        n_tokens=st.integers(min_value=0, max_value=60),
        chunk=st.integers(min_value=1, max_value=20),
        overlap_frac=st.floats(min_value=0.0, max_value=0.95),
    )
    def test_grid_matches_local_reference(self, spark_hyp, n_tokens, chunk, overlap_frac):
        overlap = min(int(chunk * overlap_frac), chunk - 1)
        stride = chunk - overlap
        toks = [f"w{i}" for i in range(n_tokens)]
        df = spark_hyp.createDataFrame([("d", " ".join(toks))], "doc_id string, text string")
        got = [
            (r["chunk_idx"], r["chunk_start"], r["chunk_text"].split(" ") if r["chunk_text"] else [])
            for r in chunk_documents(df, chunk_tokens=chunk, overlap_tokens=overlap)
            .orderBy("chunk_idx").collect()
        ]
        # straight-line reference: forward grid, last window may be short
        import math

        last = stride * math.floor(max(n_tokens - overlap - 1, 0) / stride)
        expect = [
            (i, s, toks[s : s + chunk])
            for i, s in enumerate(range(0, last + 1, stride))
        ]
        assert got == expect
        # invariant: every token index covered by >= 1 chunk
        covered = set()
        for _i, s, piece in got:
            covered.update(range(s, s + len(piece)))
        assert covered == set(range(n_tokens))


@pytest.fixture(scope="module")
def spark_hyp(spark):
    return spark
