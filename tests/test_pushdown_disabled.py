"""Graceful degradation when spark.sql.python.filterPushdown.enabled=false.

Spark 4.x refuses to instantiate a Python DataSource reader that overrides
``pushFilters`` while the conf is off (DATA_SOURCE_PUSHDOWN_DISABLED in
pyspark/sql/worker/plan_data_source_read.py). The engine must (a) enable the
conf at query time when the session never set it, (b) RESPECT an explicit
disable (no shared-state mutation), and (c) fall back to a pushFilters-free
reader whenever it is off — mirroring the reference's
pushdown-with-graceful-fallback (src/mongo_filter_pushdown.cpp:433-543).
"""

from __future__ import annotations

import pytest

from duckdb_mongo_spark import mongo_scan
from duckdb_mongo_spark.datasource import (
    MongoScanReader,
    _MongoScanReaderNoPushdown,
)
from duckdb_mongo_spark.pushdown import C
from duckdb_mongo_spark.session import ensure_python_filter_pushdown

CONF = "spark.sql.python.filterPushdown.enabled"


def test_ensure_enables_conf_when_unset(spark):
    """A session that never touched the conf gets it enabled (sessions
    from get_spark set it at build time; plain harness sessions opt in
    here)."""
    spark.conf.unset(CONF)
    try:
        assert ensure_python_filter_pushdown(spark) is True
        assert spark.conf.get(CONF) == "true"
    finally:
        spark.conf.set(CONF, "true")


def test_ensure_respects_explicit_disable(spark):
    """An EXPLICIT disable (e.g. a user workaround for a Spark pushdown
    bug) must not be silently overridden for the whole session — the
    engine routes to the pushFilters-free reader instead."""
    spark.conf.set(CONF, "false")
    try:
        assert ensure_python_filter_pushdown(spark) is False
        assert spark.conf.get(CONF) == "false"  # conf left untouched
    finally:
        spark.conf.set(CONF, "true")


def test_query_runs_when_conf_starts_false(spark, backend):
    spark.conf.set(CONF, "false")
    try:
        mf = mongo_scan(spark, backend, "duckdb_mongo_test", "users")
        rows = mf.filter(C("age") > 28).select("name", "age").df().collect()
        assert all(r.age > 28 for r in rows)
        assert rows
    finally:
        spark.conf.set(CONF, "true")


def test_no_pushdown_reader_has_no_pushfilters_override(spark, backend, monkeypatch):
    """When the conf cannot be enabled, the payload flag routes to a reader
    class that does NOT override pushFilters, and engine-side pushdown still
    yields correct results."""
    from pyspark.sql.datasource import DataSourceReader

    assert (
        _MongoScanReaderNoPushdown.pushFilters is DataSourceReader.pushFilters
    ), "fallback reader must not override pushFilters"
    assert MongoScanReader.pushFilters is not DataSourceReader.pushFilters

    # Force the fallback path regardless of the real conf.
    import duckdb_mongo_spark.frame as frame_mod

    monkeypatch.setattr(
        frame_mod, "ensure_python_filter_pushdown", lambda s: False
    )
    mf = mongo_scan(spark, backend, "duckdb_mongo_test", "users")
    rows = mf.filter(C("age") > 28).select("name", "age").df().collect()
    assert rows and all(r.age > 28 for r in rows)
    # engine-side pushdown is still compiled into the scan
    assert "filter=" in mf.filter(C("age") > 28).scan_description()
