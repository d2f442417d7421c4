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

    def test_lint_passes_allowed_surface(self, spark):
        from _oracle import lint_surface_schema

        df = spark.sql(
            "SELECT true AS b, CAST(1 AS TINYINT) AS t, 1 AS i, "
            "CAST(1 AS BIGINT) AS l, CAST(1.5 AS DOUBLE) AS d, 'x' AS s, "
            "current_date() AS dt, current_timestamp() AS ts"
        )
        assert lint_surface_schema(df) == []
