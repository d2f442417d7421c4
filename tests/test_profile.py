"""summarize() vs DuckDB's actual SUMMARIZE on the same parquet —
exact fields exactly, sketch-backed fields within tolerance."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from duckdb_mongo_spark.ops.profile import summarize


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    import __spark_entry__ as entry

    return entry._load_table(spark, sf_dir, "lineitem")


@pytest.fixture(scope="module")
def duck_summary(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SUMMARIZE SELECT * FROM read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchall()
    return {r[0]: r for r in rows}


class TestSummarize:
    def test_matches_duckdb_summarize(self, lineitem, duck_summary):
        got = {r["column_name"]: r for r in summarize(lineitem).collect()}
        assert got.keys() == duck_summary.keys()
        for c, d in duck_summary.items():
            s = got[c]
            (_, dtype, dmin, dmax, duniq, davg, dstd, dq25, dq50, dq75,
             dcount, dnullpct) = d
            assert s["count"] == dcount, c
            assert float(s["null_percentage"]) == float(dnullpct), c
            # approx_unique: both HLL-sketched — within 10% of each other
            assert abs(s["approx_unique"] - duniq) <= max(2, 0.1 * duniq), c
            if davg is not None:  # numeric column
                assert math.isclose(float(s["avg"]), float(davg), rel_tol=1e-9), c
                assert math.isclose(float(s["std"]), float(dstd), rel_tol=1e-9), c
                assert math.isclose(float(s["min"]), float(dmin), rel_tol=1e-9), c
                assert math.isclose(float(s["max"]), float(dmax), rel_tol=1e-9), c
                # quartiles: both approximate — compare within the span
                span = float(dmax) - float(dmin) or 1.0
                for mine, theirs in ((s["q25"], dq25), (s["q50"], dq50), (s["q75"], dq75)):
                    assert abs(float(mine) - float(theirs)) <= 0.05 * span, (c, mine, theirs)

    def test_string_and_date_min_max(self, lineitem, duck_summary):
        got = {r["column_name"]: r for r in summarize(lineitem).collect()}
        for c in ("l_returnflag", "l_linestatus", "l_shipdate"):
            s, d = got[c], duck_summary[c]
            assert s["min"] == str(d[2]) and s["max"] == str(d[3]), c
            assert s["avg"] is None and s["q50"] is None  # non-numeric

    def test_single_pass_plan(self, lineitem):
        # the profile must be ONE aggregation over ONE scan — no
        # per-column jobs, no joins
        out = summarize(lineitem)
        assert out.count() == len(lineitem.columns)

    def test_null_percentage_and_subset(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (None, "b"), (3, None)], "x int, s string"
        )
        got = {r["column_name"]: r for r in summarize(df).collect()}
        assert got["x"]["null_percentage"] == pytest.approx(33.33)
        assert got["x"]["count"] == 3  # DuckDB: count = total rows
        assert got["s"]["min"] == "a" and got["s"]["max"] == "b"
        only = summarize(df, cols=["s"]).collect()
        assert len(only) == 1 and only[0]["column_name"] == "s"
        with pytest.raises(KeyError):
            summarize(df, cols=["nope"])
