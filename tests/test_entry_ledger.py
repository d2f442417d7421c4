"""Full driver-contract guard: every queries() entry value-matches its
oracle_sql() on the smoke-scale testdata.

This duplicates the driver's own per-round gate on purpose. Round-3
lesson: the driver regenerated testdata with a different parquet
timestamp annotation (nanos -> micros/NTZ) and q_sessionize broke at
HEAD while the unit suite stayed green — nothing in tests/ executed the
ledger end-to-end. This test makes entry breakage (or another testdata
shape drift) visible in `pytest` immediately.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def ledger(spark, sf_dir):
    from _oracle import check_all

    return check_all(sf_dir, spark=spark)


class TestEntryLedger:
    def test_no_entry_errors(self, ledger):
        errs = {k: v["error"] for k, v in ledger.items() if "error" in v}
        assert not errs, errs

    def test_all_entries_value_match(self, ledger):
        bad = {
            k: {kk: vv for kk, vv in v.items() if kk != "first_diffs"}
            for k, v in ledger.items()
            if not (v.get("value_match") or v.get("rows_only"))
        }
        assert not bad, bad

    def test_all_entries_strict_match(self, ledger):
        # Positional, type-exact compare (tests/_oracle.strict_rows_key):
        # the tolerant compare collapses Decimal->float, which is exactly
        # the normalization that hid the r3/r4 q_time_rollup driver-hash
        # failure. Surface-type drift must fail HERE, not at the driver.
        bad = {
            k: v.get("first_diffs", "strict mismatch")
            for k, v in ledger.items()
            if not (v.get("strict_match") or v.get("rows_only"))
        }
        assert not bad, bad

    def test_ledger_size_is_driver_cap(self, ledger):
        # the driver records at most 50 entries; keep queries() exactly
        # there so every entry stays oracle-proven (adding one silently
        # drops another out of the recorded ledger)
        assert len(ledger) == 50

    def test_entry_smoke(self, spark):
        import __spark_entry__ as entry

        df = entry.entry(spark)
        assert df.columns and df.count() >= 0
