"""Schema-only lint over every ledger entry: output surface types must stay
inside tests/_oracle.SURFACE_TYPES ({DOUBLE, BIGINT/INT/..., STRING,
TIMESTAMP, DATE, BOOLEAN}).

Why: the driver's value hash materializes the Spark side and the DuckDB
side through different fetch paths; DECIMAL surfaces ('36.0000') hash
differently from float64 ('36.0') while row counts and schema names still
match. q_time_rollup carried the repo's only DECIMAL output columns and was
the only driver-hash-red entry for two consecutive rounds (r3, r4) — this
lint makes that class of failure impossible to reintroduce. Schema-only
(no collect), so it runs in seconds for all 50 entries.
"""

from __future__ import annotations

import pytest


class TestLedgerSurfaceLint:
    def test_all_entries_surface_types(self, spark, sf_dir):
        import __spark_entry__ as entry
        from _oracle import lint_surface_schema

        bad = {}
        for name, fn in entry.queries().items():
            df = fn(spark, sf_dir)
            offenders = lint_surface_schema(df)
            if offenders:
                bad[name] = offenders
        assert not bad, f"ledger entries with forbidden surface types: {bad}"

    @pytest.mark.parametrize(
        "sql,col,typ",
        [
            ("SELECT CAST(1.5 AS DECIMAL(18,4)) AS total", "total", "decimal(18,4)"),
            ("SELECT CAST(1.5 AS FLOAT) AS f", "f", "float"),
            ("SELECT ARRAY(1, 2) AS xs", "xs", "array<int>"),
            ("SELECT CAST('ab' AS BINARY) AS b", "b", "binary"),
        ],
    )
    def test_lint_catches_forbidden_surface(self, spark, sql, col, typ):
        # negative control: a deliberately DECIMAL/FLOAT/array/binary
        # surfaced frame must trip the lint
        from _oracle import lint_surface_schema

        offenders = lint_surface_schema(spark.sql(sql))
        assert offenders == [(col, typ)]

    def test_all_oracles_arrow_surface_types(self, sf_dir):
        # Oracle-side mirror of the entry lint, through the DRIVER'S fetch
        # protocol (Arrow). r8's only red row (seq_packing) was an oracle
        # whose window SUM(BIGINT) escaped as HUGEINT: fetchall() hid it
        # (HUGEINT->int), the driver's Arrow fetch saw decimal128. LIMIT 0
        # keeps this a schema-only pass over all 50 oracle SQLs.
        import __spark_entry__ as entry
        from _oracle import duckdb_con, lint_oracle_arrow_schema

        con = duckdb_con(sf_dir)
        bad = {}
        for name, sql in entry.oracle_sql().items():
            tbl = con.execute(
                f"SELECT * FROM ({sql}) AS __lint LIMIT 0"
            ).fetch_arrow_table()
            offenders = lint_oracle_arrow_schema(tbl)
            if offenders:
                bad[name] = offenders
        assert not bad, f"oracles with forbidden Arrow surface types: {bad}"

    def test_compare_catches_hugeint_oracle(self, spark, sf_dir):
        # Negative control for the r8 blind spot: an oracle that surfaces
        # HUGEINT (window SUM over BIGINT, no cast) must fail the strict
        # gate even though fetchall()-era values would have been identical.
        from _oracle import compare, duckdb_con

        con = duckdb_con(sf_dir)
        df = spark.sql("SELECT CAST(3 AS BIGINT) AS v")
        bad = compare(
            df, con,
            "SELECT SUM(x) OVER () AS v FROM (SELECT CAST(3 AS BIGINT) x)",
        )
        assert bad["value_match"]          # tolerant compare still passes
        assert not bad["strict_match"]     # ...but the strict gate is red
        assert bad["oracle_bad_types"] == [("v", "decimal128(38, 0)")]
        ok = compare(
            df, con,
            "SELECT CAST(SUM(x) OVER () AS BIGINT) AS v "
            "FROM (SELECT CAST(3 AS BIGINT) x)",
        )
        assert ok["strict_match"] and ok["value_match"]

    def test_lint_passes_allowed_surface(self, spark):
        from _oracle import lint_surface_schema

        df = spark.sql(
            "SELECT true AS b, CAST(1 AS TINYINT) AS t, 1 AS i, "
            "CAST(1 AS BIGINT) AS l, CAST(1.5 AS DOUBLE) AS d, 'x' AS s, "
            "current_date() AS dt, current_timestamp() AS ts"
        )
        assert lint_surface_schema(df) == []
