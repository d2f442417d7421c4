"""Structured Streaming tests (NEW vs reference — SURVEY §2B lists
streaming as absent from the reference; this is the change-stream-shaped
extension). Driven with availableNow triggers into memory sinks so they
are hermetic and fast.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from duckdb_mongo_spark import streaming as st


@pytest.fixture()
def stream_root(tmp_path):
    d = tmp_path / "docs" / "appdb" / "clicks"
    d.mkdir(parents=True)
    rows0 = [
        {"_id": "a1", "user": {"name": "u1", "tier": "gold"},
         "ts": "2024-01-01T10:00:00.000Z", "amount": 5},
        {"_id": "a2", "user": {"name": "u2", "tier": "free"},
         "ts": "2024-01-01T10:10:00.000Z", "amount": 7},
    ]
    rows1 = [
        {"_id": "a3", "user": {"name": "u1", "tier": "gold"},
         "ts": "2024-01-01T11:05:00.000Z", "amount": 11},
    ]
    (d / "part-000.jsonl").write_text("\n".join(json.dumps(r) for r in rows0) + "\n")
    (d / "part-001.jsonl").write_text("\n".join(json.dumps(r) for r in rows1) + "\n")
    return str(tmp_path / "docs")


class TestDocumentStream:
    def test_schema_and_rows(self, spark, stream_root):
        df = st.document_stream(spark, stream_root, "appdb", "clicks")
        assert df.isStreaming
        # batch-scan-compatible surface: flattened + parent JSON
        for c in ("_id", "user", "user_name", "user_tier", "ts", "amount"):
            assert c in df.columns
        q = (
            df.writeStream.format("memory").queryName("clicks_raw")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(60)
        rows = {r["_id"]: r for r in spark.sql("SELECT * FROM clicks_raw").collect()}
        assert len(rows) == 3
        assert rows["a1"]["user_name"] == "u1"
        assert json.loads(rows["a1"]["user"])["tier"] == "gold"
        assert rows["a3"]["amount"] == 11

    def test_windowed_counts_with_watermark(self, spark, stream_root):
        df = st.document_stream(spark, stream_root, "appdb", "clicks")
        agg = st.windowed_counts(
            df, "ts", window="1 hour", watermark="15 minutes",
            group_cols=["user_tier"],
            agg_exprs={"total": "sum(amount)"},
        )
        q = (
            agg.writeStream.format("memory").queryName("clicks_win")
            .outputMode("complete").trigger(availableNow=True).start()
        )
        q.awaitTermination(60)
        out = spark.sql(
            "SELECT * FROM clicks_win ORDER BY window_start, user_tier"
        ).collect()
        got = [(r["window_start"].hour, r["user_tier"], r["n"], r["total"]) for r in out]
        assert got == [(10, "free", 1, 7), (10, "gold", 1, 5), (11, "gold", 1, 11)]

    def test_sessionized(self, spark, stream_root):
        df = st.document_stream(spark, stream_root, "appdb", "clicks")
        ses = st.sessionized(df, "ts", "user_name", gap="30 minutes",
                             watermark="15 minutes")
        q = (
            ses.writeStream.format("memory").queryName("clicks_sess")
            .outputMode("complete").trigger(availableNow=True).start()
        )
        q.awaitTermination(60)
        out = spark.sql(
            "SELECT user_name, n_events FROM clicks_sess ORDER BY user_name, n_events"
        ).collect()
        # u1: 10:00 and 11:05 are >30min apart → two sessions of 1
        assert [(r["user_name"], r["n_events"]) for r in out] == [
            ("u1", 1), ("u1", 1), ("u2", 1)]

    def test_stateful_dedup_stream(self, spark, tmp_path):
        """applyInPandasWithState dedup: duplicate fingerprints across
        part files are dropped, first occurrence wins."""
        import json as _json

        from duckdb_mongo_spark.streaming.stateful import dedup_stream

        d = tmp_path / "docs" / "db" / "items"
        d.mkdir(parents=True)
        (d / "part-000.jsonl").write_text(
            "\n".join(_json.dumps(r) for r in [
                {"_id": "x1", "src": "s1", "fp": "AAA"},
                {"_id": "x2", "src": "s1", "fp": "BBB"},
                {"_id": "x3", "src": "s2", "fp": "AAA"},  # same fp, other key
            ]) + "\n")
        (d / "part-001.jsonl").write_text(
            "\n".join(_json.dumps(r) for r in [
                {"_id": "x4", "src": "s1", "fp": "AAA"},  # dup within key s1
                {"_id": "x5", "src": "s1", "fp": "CCC"},
            ]) + "\n")
        df = st.document_stream(spark, str(tmp_path / "docs"), "db", "items")
        deduped = dedup_stream(df, key_col="src", fingerprint_col="fp")
        q = (
            deduped.writeStream.format("memory").queryName("dedup_out")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(60)
        rows = spark.sql("SELECT * FROM dedup_out").collect()
        got = sorted((r["src"], r["fp"]) for r in rows)
        assert got == [("s1", "AAA"), ("s1", "BBB"), ("s1", "CCC"), ("s2", "AAA")]
        kept_ids = {r["_id"] for r in rows}
        assert "x4" not in kept_ids and "x1" in kept_ids

    def test_stream_to_collection_roundtrip(self, spark, stream_root, tmp_path):
        """Full loop: document stream → transform → JSONL-collection sink
        → batch engine reads it back (bronze-table ingestion shape)."""
        import duckdb_mongo_spark as dms
        from duckdb_mongo_spark.pushdown import C

        df = st.document_stream(spark, stream_root, "appdb", "clicks")
        enriched = df.withColumn("amount2", F.col("amount") * 2)
        sink_root = str(tmp_path / "bronze")
        q = st.stream_to_collection(
            enriched, sink_root, "appdb", "clicks_bronze",
            checkpoint=str(tmp_path / "ckpt"), trigger_available_now=True,
        )
        q.awaitTermination(60)
        mf = dms.mongo_scan(spark, f"jsonl:{sink_root}", "appdb", "clicks_bronze")
        rows = mf.filter(C("amount2") > 10).select("_id", "amount2").collect()
        assert sorted((r["_id"], r["amount2"]) for r in rows) == [
            ("a2", 14), ("a3", 22)]

    def test_backend_reads_directory_layout(self, spark, stream_root):
        """The batch engine sees the same directory collection."""
        import duckdb_mongo_spark as dms
        from duckdb_mongo_spark.pushdown import C

        mf = dms.mongo_scan(spark, f"jsonl:{stream_root}", "appdb", "clicks")
        rows = mf.filter(C("amount") > 6).select("_id", "user_name").collect()
        assert sorted(r["_id"] for r in rows) == ["a2", "a3"]


class TestWatermarkLateData:
    def test_late_event_beyond_watermark_is_dropped(self, spark, tmp_path):
        """Append-mode window agg across two micro-batch runs sharing a
        checkpoint: batch 1 advances the watermark past the 10:00 window
        and finalizes it; batch 2 delivers an event for that window that
        is later than the watermark allows — Spark must DROP it (the
        finalized window's count must not change, no duplicate row)."""
        import json as _json

        d = tmp_path / "docs" / "appdb" / "clicks"
        d.mkdir(parents=True)
        ckpt = str(tmp_path / "ckpt")
        sink = tmp_path / "sink"

        def run_batch():
            df = st.document_stream(spark, str(tmp_path / "docs"), "appdb", "clicks")
            agg = st.windowed_counts(
                df, "ts", window="1 hour", watermark="15 minutes",
                group_cols=["user_tier"], agg_exprs={"total": "sum(amount)"},
            )
            q = (
                agg.writeStream.format("json")
                .option("path", str(sink))
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        def sink_rows():
            out = []
            for f in sorted(sink.glob("part-*.json")):
                for line in f.read_text().splitlines():
                    if line.strip():
                        out.append(_json.loads(line))
            return out

        # batch 1: events at 10:05 and 12:30 → watermark advances to
        # 12:15, the 10:00-11:00 window closes and is emitted
        (d / "b1.jsonl").write_text(
            "\n".join(
                _json.dumps(r)
                for r in [
                    {"_id": "e1", "user": {"name": "u1", "tier": "gold"},
                     "ts": "2024-01-01T10:05:00.000Z", "amount": 5},
                    {"_id": "e2", "user": {"name": "u1", "tier": "gold"},
                     "ts": "2024-01-01T12:30:00.000Z", "amount": 1},
                ]
            )
            + "\n"
        )
        run_batch()
        rows1 = sink_rows()
        ten_oclock = [r for r in rows1 if r["window_start"].startswith("2024-01-01T10")]
        assert len(ten_oclock) == 1 and ten_oclock[0]["n"] == 1

        # batch 2: a LATE event for the already-closed 10:00 window plus
        # a fresh 14:00 event that advances the watermark further
        (d / "b2.jsonl").write_text(
            "\n".join(
                _json.dumps(r)
                for r in [
                    {"_id": "e3", "user": {"name": "u1", "tier": "gold"},
                     "ts": "2024-01-01T10:20:00.000Z", "amount": 100},  # late
                    {"_id": "e4", "user": {"name": "u1", "tier": "gold"},
                     "ts": "2024-01-01T14:00:00.000Z", "amount": 2},
                ]
            )
            + "\n"
        )
        run_batch()
        rows2 = sink_rows()
        ten_oclock = [r for r in rows2 if r["window_start"].startswith("2024-01-01T10")]
        # the late event must NOT reopen or duplicate the closed window
        assert len(ten_oclock) == 1 and ten_oclock[0]["n"] == 1
        assert ten_oclock[0]["total"] == 5
