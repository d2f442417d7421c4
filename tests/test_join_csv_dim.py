"""Reference pushdown-suite parity: `join_agg_to_csv`
(/root/reference/benchmarks/pushdown_queries.sql:26-37) — a pushed-down
GROUP BY aggregate from the document scan joined to a small LOCAL CSV
dimension. Proves the federation shape the reference benchmarks: filter
and aggregate at the source, join/order in the engine, with file-based
dims mixed in (`read_csv_auto` ⇔ `spark.read.csv`).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def csv_dim(tmp_path_factory):
    p = tmp_path_factory.mktemp("dim") / "returnflag_dim.csv"
    p.write_text(
        "l_returnflag,description\n"
        "A,Accepted\n"
        "N,No issue\n"
        "R,Returned\n"
    )
    return str(p)


class TestJoinAggToCsv:
    def test_engine_agg_joined_to_csv_dim(self, spark, sf_dir, csv_dim):
        import __spark_entry__ as entry

        mf = entry._mongo_frame(spark, sf_dir, "lineitem")
        agg = (
            mf.group_by("l_returnflag")
            .agg(("sum", "l_extendedprice", "s"), ("count_star", None, "c"))
            .df()
        )
        # local columnar profile: grouped agg deliberately stays in
        # Spark (distributed beats a one-cursor interpreter — frame.py
        # pushdown-profile contract); remote profiles push it, proven in
        # test_query_results/test_planner with the memory backend
        assert "scan_method=find" in mf.scan_description()
        dim = spark.read.option("header", True).csv(csv_dim)
        out = (
            agg.join(F.broadcast(dim), "l_returnflag")
            .select("l_returnflag", "description", "s", "c")
            .orderBy("l_returnflag")
        )
        rows = out.collect()
        assert [r["l_returnflag"] for r in rows] == ["A", "N", "R"]

        # DuckDB oracle: identical SQL over the same parquet + CSV
        import duckdb

        con = duckdb.connect()
        expect = con.execute(f"""
            WITH agg AS (
                SELECT l_returnflag, SUM(l_extendedprice) AS s, COUNT(*) AS c
                FROM read_parquet('{sf_dir}/lineitem.parquet')
                GROUP BY l_returnflag
            )
            SELECT a.l_returnflag, d.description, a.s, a.c
            FROM agg a
            JOIN read_csv_auto('{csv_dim}') d USING (l_returnflag)
            ORDER BY a.l_returnflag
        """).fetchall()
        got = [(r["l_returnflag"], r["description"], pytest.approx(float(r["s"])), r["c"])
               for r in rows]
        expect_n = [(rf, d, float(s), c) for rf, d, s, c in expect]
        assert [(g[0], g[1], g[3]) for g in got] == [(e[0], e[1], e[3]) for e in expect_n]
        for g, e in zip(got, expect_n):
            assert g[2] == e[2]

    def test_broadcast_plan(self, spark, sf_dir, csv_dim):
        """The CSV dim must broadcast — a shuffle join against a 3-row
        dimension is the classic federation plan defect."""
        import __spark_entry__ as entry

        mf = entry._mongo_frame(spark, sf_dir, "lineitem")
        agg = mf.group_by("l_returnflag").agg(("sum", "l_extendedprice", "s")).df()
        dim = spark.read.option("header", True).csv(csv_dim)
        out = agg.join(F.broadcast(dim), "l_returnflag")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
