"""Streaming Count-Min sketch (streaming.sketches.streaming_count_min)
cross-checked against the batch sketch on identical per-window data.

Harness: jsonl file stream driven with availableNow into a memory sink
(same pattern as test_streaming_rollup); a far-future sentinel row
pushes the watermark so every real window closes and emits.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from duckdb_mongo_spark.ops.sketches import cms_lookup, cms_merge, count_min_sketch
from duckdb_mongo_spark.streaming.sketches import streaming_count_min

_SCHEMA = "k string, ts timestamp"
DEPTH, WIDTH = 4, 64

_ROWS = (
    # window 10:00: skewed values in one minute
    [{"k": "hot", "ts": "2024-03-01T10:00:05.000Z"}] * 6
    + [{"k": "warm", "ts": "2024-03-01T10:00:20.000Z"}] * 2
    + [{"k": "cold1", "ts": "2024-03-01T10:00:40.000Z"}]
    # window 10:01: different mix, plus a null to be excluded
    + [{"k": "hot", "ts": "2024-03-01T10:01:10.000Z"}] * 3
    + [{"k": "cold2", "ts": "2024-03-01T10:01:30.000Z"}]
    + [{"k": None, "ts": "2024-03-01T10:01:45.000Z"}]
)


@pytest.fixture()
def stream_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    (d / "part-000.jsonl").write_text(
        "\n".join(json.dumps(r) for r in _ROWS) + "\n"
    )
    # sentinel far past every real window: closes them all
    (d / "part-001.jsonl").write_text(
        json.dumps({"k": "z", "ts": "2024-03-10T00:00:00.000Z"}) + "\n"
    )
    return d


@pytest.fixture()
def emitted(spark, stream_dir, tmp_path):
    stream = spark.readStream.schema(_SCHEMA).json(str(stream_dir))
    sk = streaming_count_min(
        stream, "k", ts_col="ts", depth=DEPTH, width=WIDTH,
        window="1 minute", watermark="5 minutes",
    )
    q = (
        sk.writeStream.outputMode("append")
        .format("memory").queryName("cms_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table("cms_sink")


class TestStreamingCountMin:
    def test_closed_windows_equal_batch_sketch(self, spark, emitted):
        """Each closed window's rows must be EXACTLY count_min_sketch of
        that window's events — shared md5 bucket derivation, so batch
        and streaming sketches cannot diverge."""
        for minute, n_rows in (("10:00", 9), ("10:01", 4)):
            win = [
                (r["row"], r["bucket"], r["count"])
                for r in emitted.collect()
                if r["window_start"].strftime("%H:%M") == minute
            ]
            batch_df = spark.createDataFrame(
                [(r["k"],) for r in _ROWS
                 if r["ts"].startswith(f"2024-03-01T{minute}") and r["k"]],
                "k string",
            )
            batch = [
                (r["row"], r["bucket"], r["count"])
                for r in count_min_sketch(batch_df, "k", DEPTH, WIDTH).collect()
            ]
            assert sorted(win) == sorted(batch)
            assert sum(c for _, _, c in win) == DEPTH * n_rows  # nulls excluded

    def test_state_bound(self, emitted):
        # per window at most depth x width rows — the sketch property
        per_window = emitted.groupBy("window_start").count().collect()
        assert per_window and all(r["count"] <= DEPTH * WIDTH for r in per_window)

    def test_merged_windows_estimate_totals(self, spark, emitted):
        """cms_merge over the two closed windows + shared cms_lookup:
        estimates never undercount the true totals and are exact for
        values without collisions at this width."""
        w1 = emitted.filter(F.date_format("window_start", "HH:mm") == "10:00")
        w2 = emitted.filter(F.date_format("window_start", "HH:mm") == "10:01")
        merged = cms_merge(
            w1.select("row", "bucket", "count"),
            w2.select("row", "bucket", "count"),
        )
        probes = spark.createDataFrame(
            [("hot",), ("warm",), ("cold1",), ("cold2",), ("absent",)], "k string"
        )
        est = {
            r["value"]: r["estimate"]
            for r in cms_lookup(merged, probes, "k", DEPTH, WIDTH).collect()
        }
        true = {"hot": 9, "warm": 2, "cold1": 1, "cold2": 1, "absent": 0}
        for k, t in true.items():
            assert est[k] >= t

    def test_validation(self, spark):
        df = spark.range(1).select(
            F.col("id").cast("string").alias("k"),
            F.current_timestamp().alias("ts"),
        )
        with pytest.raises(ValueError, match="depth"):
            streaming_count_min(df, "k", depth=0)
