"""Repetition/quality signals + decontamination (ops/quality.py).

Hand-computed fixtures pin the signal definitions; the DuckDB
list-lambda oracles (repetition_sql_exprs / decontaminate_sql) are
cross-checked on both a synthetic corpus and real driver testdata; plan
assertions pin the zero-shuffle contract.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from duckdb_mongo_spark.ops.quality import (
    decontaminate,
    decontaminate_sql,
    gopher_quality_filter,
    repetition_signals,
    repetition_sql_exprs,
)
from _oracle import compare

DOCS = [
    # (doc_id, text) — fractions hand-computed in the asserts below
    (1, "a b a b a b"),                      # 6 toks; "a b" 2-gram x3
    (2, "x y z w v q r s t u"),              # 10 distinct toks, no repeats
    (3, "one two"),                          # shorter than n=5
    (4, ""),                                 # empty
    (5, "Spam! spam, SPAM spam"),            # normalization: all -> 'spam'
    (6, "l1\nl2\nl1\n\n  \nl3"),             # dup line l1: 4 lines, 3 distinct
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def _sig_map(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


class TestRepetitionSignals:
    def test_hand_computed(self, docs_df):
        out = _sig_map(repetition_signals(docs_df, top_ns=(2,), dup_ns=(2,)))
        # doc 1: toks=[a,b]*3 -> 2-grams: [ab, ba, ab, ba, ab]; top "a b"=3
        assert out[1]["n_tokens"] == 6
        assert out[1]["top_2gram_frac"] == pytest.approx(3 * 2 / 6)
        # dup occurrences: ab(3) + ba(2) = 5 of 5 grams
        assert out[1]["dup_2gram_frac"] == pytest.approx(1.0)
        # doc 2: no repeated grams -> top gram count 1
        assert out[2]["top_2gram_frac"] == pytest.approx(2 / 10)
        assert out[2]["dup_2gram_frac"] == 0.0
        # doc 4 empty: all zeros
        assert out[4]["n_tokens"] == 0
        assert out[4]["top_2gram_frac"] == 0.0
        # doc 5 normalizes to spam x4 -> top 2-gram "spam spam" x3
        assert out[5]["n_tokens"] == 4
        assert out[5]["top_2gram_frac"] == pytest.approx(3 * 2 / 4)

    def test_short_doc_zero(self, docs_df):
        out = _sig_map(repetition_signals(docs_df, top_ns=(5,), dup_ns=(5,)))
        assert out[3]["top_5gram_frac"] == 0.0
        assert out[3]["dup_5gram_frac"] == 0.0

    def test_dup_line_frac(self, docs_df):
        out = _sig_map(repetition_signals(docs_df))
        # doc 6: non-empty trimmed lines [l1,l2,l1,l3] -> 1 - 3/4
        assert out[6]["dup_line_frac"] == pytest.approx(0.25)
        assert out[1]["dup_line_frac"] == 0.0  # single line

    def test_duckdb_oracle_synthetic(self, docs_df):
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
        toks = (
            "list_filter(string_split_regex(trim(regexp_replace(lower(text), "
            "'[^a-z0-9\\s]', ' ', 'g')), '\\s+'), x -> x <> '')"
        )
        sql = (
            f"WITH tk AS (SELECT doc_id, {toks} AS t FROM documents) "
            f"SELECT doc_id, {', '.join(repetition_sql_exprs())} FROM tk ORDER BY doc_id"
        )
        got = repetition_signals(docs_df, include_lines=False).orderBy("doc_id")
        res = compare(got, con, sql)
        assert res["value_match"], res

    def test_duckdb_oracle_real_corpus(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        got = repetition_signals(docs, include_lines=False).orderBy("doc_id")
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
        toks = (
            "list_filter(string_split_regex(trim(regexp_replace(lower(text), "
            "'[^a-z0-9\\s]', ' ', 'g')), '\\s+'), x -> x <> '')"
        )
        sql = (
            f"WITH tk AS (SELECT doc_id, {toks} AS t FROM documents) "
            f"SELECT doc_id, {', '.join(repetition_sql_exprs())} FROM tk ORDER BY doc_id"
        )
        res = compare(got, con, sql)
        assert res["value_match"], res

    def test_zero_shuffle_plan(self, docs_df):
        plan = repetition_signals(docs_df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_keep_cols(self, docs_df):
        out = repetition_signals(docs_df, keep_cols=True)
        assert set(("doc_id", "text", "n_tokens")) <= set(out.columns)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Join" not in plan


class TestGopherFilter:
    def test_filters_repetitive(self, spark):
        rows = [
            (1, " ".join(["word%d" % i for i in range(60)])),   # clean, 60 uniq toks
            (2, "spam ham " * 40),                              # top-2gram dominated
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        kept = gopher_quality_filter(df, min_tokens=10)
        ids = [r.doc_id for r in kept.collect()]
        assert ids == [1]
        assert kept.columns == ["doc_id", "text"]

    def test_keep_col_annotation(self, spark):
        df = spark.createDataFrame([(1, "a " * 60), (2, " ".join(f"w{i}" for i in range(60)))],
                                   ["doc_id", "text"])
        out = gopher_quality_filter(df, min_tokens=10, keep_col="keep")
        m = {r.doc_id: r.keep for r in out.collect()}
        assert m == {1: False, 2: True}
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestDecontaminate:
    CORPUS = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "completely unrelated sentences live here without overlap at all"),
        (3, "short match"),
        (4, "quick brown fox jumps over the lazy dog and more words"),
    ]
    BENCH = [
        (100, "benchmark says the quick brown fox jumps over the lazy dog"),
        (101, "short match"),  # < n tokens: whole-text gram fallback
    ]

    def _frames(self, spark):
        return (
            spark.createDataFrame(self.CORPUS, ["doc_id", "text"]),
            spark.createDataFrame(self.BENCH, ["doc_id", "text"]),
        )

    def test_flags_overlap(self, spark):
        corpus, bench = self._frames(spark)
        out = decontaminate(corpus, bench, n=8)
        got = {r.doc_id: r.n_hits for r in out.collect()}
        # doc 1 shares the full 8-gram window(s) of "the quick ... dog",
        # doc 3 is caught via the short-doc whole-text fallback,
        # doc 2 clean; doc 4 shares "quick brown fox jumps over the lazy dog"
        # only if an ALIGNED 8-gram matches a benchmark 8-gram.
        assert 1 in got and 3 in got and 2 not in got
        assert all(r.hit_frac <= 1.0 for r in out.collect())

    def test_duckdb_oracle(self, spark):
        corpus, bench = self._frames(spark)
        out = decontaminate(corpus, bench, n=8).orderBy("doc_id")
        con = duckdb.connect()
        con.execute("CREATE TABLE corpus (doc_id BIGINT, text VARCHAR)")
        con.execute("CREATE TABLE bench (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO corpus VALUES (?, ?)", self.CORPUS)
        con.executemany("INSERT INTO bench VALUES (?, ?)", self.BENCH)
        sql = decontaminate_sql("SELECT * FROM corpus", "SELECT * FROM bench", n=8)
        res = compare(out, con, sql + " ORDER BY doc_id")
        assert res["value_match"], res

    def test_broadcast_plan(self, spark):
        corpus, bench = self._frames(spark)
        plan = (
            decontaminate(corpus, bench, n=8)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan

    def test_scrub_composition(self, spark):
        corpus, bench = self._frames(spark)
        flagged = decontaminate(corpus, bench, n=8).select("doc_id")
        clean = corpus.join(flagged, "doc_id", "left_anti")
        ids = sorted(r.doc_id for r in clean.collect())
        assert 2 in ids and 1 not in ids and 3 not in ids
