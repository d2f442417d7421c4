"""Temporal joins for streams: stream-static as-of enrichment and the
native stream-stream time-interval join. Hermetic: file streams +
availableNow triggers into memory sinks; oracles are the batch
equivalents (ops.joins.asof_join and a plain inequality join).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from duckdb_mongo_spark.ops.joins import asof_join
from duckdb_mongo_spark.streaming.temporal import (
    stream_static_asof,
    stream_stream_interval_join,
    versioned_intervals,
)


@pytest.fixture()
def price_dim(spark):
    # versioned dimension: price per sku over time
    rows = [
        ("a", "2024-01-01 00:00:00", 10.0),
        ("a", "2024-01-01 12:00:00", 12.0),
        ("a", "2024-01-02 00:00:00", 15.0),
        ("b", "2024-01-01 06:00:00", 99.0),
    ]
    return spark.createDataFrame(rows, "sku string, eff string, price double").select(
        "sku", F.to_timestamp("eff").alias("eff"), "price"
    )


@pytest.fixture()
def orders_stream_dir(tmp_path):
    d = tmp_path / "orders"
    d.mkdir()
    rows = [
        {"oid": 1, "sku": "a", "ts": "2024-01-01T00:00:00Z", "qty": 2},  # at boundary → 10.0
        {"oid": 2, "sku": "a", "ts": "2024-01-01T13:00:00Z", "qty": 1},  # → 12.0
        {"oid": 3, "sku": "a", "ts": "2024-01-03T00:00:00Z", "qty": 4},  # open-ended → 15.0
        {"oid": 4, "sku": "b", "ts": "2024-01-01T00:00:00Z", "qty": 1},  # before first → null
        {"oid": 5, "sku": "c", "ts": "2024-01-01T09:00:00Z", "qty": 1},  # unknown sku → null
    ]
    (d / "part-000.jsonl").write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    return str(d)


def _orders_schema():
    return "oid long, sku string, ts timestamp, qty long"


class TestVersionedIntervals:
    def test_lead_bounds(self, price_dim):
        iv = versioned_intervals(price_dim, ["sku"], "eff")
        rows = {(r.sku, str(r.eff)): r["__valid_to"] for r in iv.collect()}
        assert rows[("a", "2024-01-01 00:00:00")] is not None
        assert rows[("a", "2024-01-02 00:00:00")] is None  # current version
        assert rows[("b", "2024-01-01 06:00:00")] is None


class TestStreamStaticAsof:
    def test_stream_matches_batch_asof(self, spark, price_dim, orders_stream_dir):
        stream = (
            spark.readStream.schema(_orders_schema()).json(orders_stream_dir)
        )
        out = stream_static_asof(stream, price_dim, ["sku"], "ts", "eff")
        assert out.isStreaming
        q = (
            out.writeStream.format("memory").queryName("enriched")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(60)
        got = {
            r.oid: (r.price, str(r.eff) if r.eff is not None else None)
            for r in spark.sql("SELECT * FROM enriched").collect()
        }
        assert got[1] == (10.0, "2024-01-01 00:00:00")  # closed lower bound
        assert got[2] == (12.0, "2024-01-01 12:00:00")
        assert got[3] == (15.0, "2024-01-02 00:00:00")  # open-ended current
        assert got[4] == (None, None)                   # before first version
        assert got[5] == (None, None)                   # unknown key
        # cross-check the whole result against the batch asof operator
        batch = spark.read.schema(_orders_schema()).json(orders_stream_dir)
        want = {
            r.oid: r.price
            for r in asof_join(batch, price_dim.withColumnRenamed("eff", "ts"),
                               on="ts", by=["sku"]).collect()
        }
        assert {k: v[0] for k, v in got.items()} == want

    def test_stateless_plan(self, spark, price_dim, orders_stream_dir):
        stream = spark.readStream.schema(_orders_schema()).json(orders_stream_dir)
        out = stream_static_asof(stream, price_dim, ["sku"], "ts", "eff")
        # stream-static joins run without a state store; nothing to
        # assert from the logical plan beyond successful availableNow
        # execution with no watermark set (stateful ops would refuse)
        q = (
            out.writeStream.format("memory").queryName("enriched2")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(60)
        assert spark.sql("SELECT count(*) FROM enriched2").collect()[0][0] == 5


class TestStreamStreamIntervalJoin:
    def test_band_join_matches_batch(self, spark, tmp_path):
        imp = tmp_path / "impressions"
        clk = tmp_path / "clicks"
        imp.mkdir(); clk.mkdir()
        imps = [
            {"ad": "x", "its": "2024-01-01T10:00:00Z"},
            {"ad": "x", "its": "2024-01-01T11:00:00Z"},
            {"ad": "y", "its": "2024-01-01T10:30:00Z"},
        ]
        clks = [
            {"ad": "x", "cts": "2024-01-01T10:00:30Z"},  # within 1 min of imp1
            {"ad": "x", "cts": "2024-01-01T11:30:00Z"},  # outside band of both
            {"ad": "y", "cts": "2024-01-01T10:30:59Z"},  # within
        ]
        (imp / "p.jsonl").write_text("\n".join(json.dumps(r) for r in imps) + "\n")
        (clk / "p.jsonl").write_text("\n".join(json.dumps(r) for r in clks) + "\n")
        ldf = spark.readStream.schema("ad string, its timestamp").json(str(imp))
        rdf = spark.readStream.schema("ad string, cts timestamp").json(str(clk))
        out = stream_stream_interval_join(
            ldf, rdf, ["ad"], "its", "cts", lower_seconds=0, upper_seconds=60,
            left_watermark="5 minutes", right_watermark="5 minutes",
        )
        assert out.isStreaming
        q = (
            out.writeStream.format("memory").queryName("attrib")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        got = sorted(
            (r.ad, str(r.its), str(r.cts))
            for r in spark.sql("SELECT * FROM attrib").collect()
        )
        bl = spark.read.schema("ad string, its timestamp").json(str(imp))
        br = spark.read.schema("ad string, cts timestamp").json(str(clk))
        want = sorted(
            (r.ad, str(r.its), str(r.cts))
            for r in bl.join(
                br,
                (bl.ad == br.ad)
                & (br.cts >= bl.its)
                & (br.cts <= bl.its + F.expr("INTERVAL 60 SECONDS")),
            ).select(bl.ad, "its", "cts").collect()
        )
        assert got == want
        assert len(got) == 2

    def test_same_named_ts_columns_and_fractional_band(self, spark, tmp_path):
        # both streams naming their event-time column "ts" is the common
        # case; the band must build from attribute refs, and fractional
        # seconds must not be truncated
        a = tmp_path / "a"
        b = tmp_path / "b"
        a.mkdir(); b.mkdir()
        (a / "p.jsonl").write_text(json.dumps({"k": "x", "ts": "2024-01-01T10:00:00Z"}) + "\n")
        (b / "p.jsonl").write_text(
            json.dumps({"k": "x", "ts": "2024-01-01T10:00:00.400Z"}) + "\n"
            + json.dumps({"k": "x", "ts": "2024-01-01T10:00:00.900Z"}) + "\n"
        )
        ldf = spark.readStream.schema("k string, ts timestamp").json(str(a))
        rdf = spark.readStream.schema("k string, ts timestamp").json(str(b))
        out = stream_stream_interval_join(
            ldf, rdf, ["k"], "ts", "ts", lower_seconds=0, upper_seconds=0.5,
        )
        q = (
            out.writeStream.format("memory").queryName("fracband")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        rows = spark.sql("SELECT * FROM fracband").collect()
        assert len(rows) == 1  # only the 0.4s click is inside the 0.5s band
