"""Streaming continuous aggregate (streaming.rollup.streaming_time_rollup)
cross-checked against the batch rollup on identical data.

Harness: jsonl file stream driven with availableNow into memory sinks.
Append mode only emits a bucket once the watermark passes its window
end, so the fixture appends a far-future sentinel row and, if a chained
level still holds state after one pass (watermark propagation through
chained stateful operators can take an extra microbatch), re-runs the
query on the same checkpoint with an even later sentinel — mirroring
how a real continuous aggregate converges as new data arrives.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from duckdb_mongo_spark.ops.rollup import time_rollup
from duckdb_mongo_spark.streaming.rollup import streaming_time_rollup

_SCHEMA = "k string, ts timestamp, v double"

_ROWS = [
    # two keys, three minutes across two hours
    {"k": "a", "ts": "2024-03-01T10:00:10.000Z", "v": 1.0},
    {"k": "a", "ts": "2024-03-01T10:00:40.000Z", "v": 3.0},
    {"k": "b", "ts": "2024-03-01T10:01:05.000Z", "v": 10.0},
    {"k": "a", "ts": "2024-03-01T11:02:00.000Z", "v": 5.0},
    {"k": "b", "ts": "2024-03-01T11:02:30.000Z", "v": 7.0},
    {"k": "b", "ts": "2024-03-01T11:59:59.000Z", "v": 2.0},
]

_METRICS = {
    "n": ("count", "v"),
    "total": ("sum", "v"),
    "mx": ("max", "v"),
    "av": ("avg", "v"),
    "op": ("first", "v"),
    "cl": ("last", "v"),
    # tiny buckets: sketch == batch sketch exactly (shared builders),
    # exercising streaming chained merge of the quantile slot structs
    "p50": ("approx_quantile:0.5", "v"),
}


def _write(d, name, rows):
    (d / name).write_text("\n".join(json.dumps(r) for r in rows) + "\n")


@pytest.fixture()
def stream_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    _write(d, "part-000.jsonl", _ROWS)
    # sentinel far past every real window: pushes the watermark so all
    # real minute/hour buckets close and emit
    _write(d, "part-001.jsonl", [{"k": "z", "ts": "2024-03-10T00:00:00.000Z", "v": 0.0}])
    return d


def _run_pass(spark, stream_dir, tmp_path, tag):
    stream = spark.readStream.schema(_SCHEMA).json(str(stream_dir))
    levels = streaming_time_rollup(
        stream, "ts", _METRICS, group_cols=["k"],
        resolutions=["minute", "hour"], watermark="5 minutes",
    )
    queries = []
    for unit, df in levels.items():
        q = (
            df.writeStream.format("memory")
            .queryName(f"cagg_{unit}")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{unit}_shared"))
            .trigger(availableNow=True)
            .start()
        )
        queries.append(q)
    for q in queries:
        q.awaitTermination(120)


def _collect(spark, unit):
    return {
        (r["k"], r["bucket"].isoformat(), r["resolution"]): (
            r["n"], r["total"], r["mx"], round(r["av"], 9), r["op"], r["cl"], r["p50"],
        )
        for r in spark.sql(f"SELECT * FROM cagg_{unit}").collect()
        if r["k"] != "z"
    }


def _batch_expected(spark, unit):
    df = spark.createDataFrame(
        [(r["k"], r["ts"].replace("T", " ").replace(".000Z", ""), r["v"]) for r in _ROWS],
        "k string, ts_s string, v double",
    ).select("k", F.to_timestamp("ts_s").alias("ts"), "v")
    out = time_rollup(df, "ts", _METRICS, group_cols=["k"], resolutions=[unit])
    return {
        (r["k"], r["bucket"].isoformat(), r["resolution"]): (
            r["n"], r["total"], r["mx"], round(r["av"], 9), r["op"], r["cl"], r["p50"],
        )
        for r in out.collect()
    }


class TestStreamingTimeRollup:
    def test_levels_match_batch_rollup(self, spark, stream_dir, tmp_path):
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        try:
            _run_pass(spark, stream_dir, tmp_path, 0)
            # chained level may need one more microbatch cycle to flush:
            # append a later sentinel and re-run on the same checkpoint
            for attempt in (1, 2):
                got_min = _collect(spark, "minute")
                got_hour = _collect(spark, "hour")
                if len(got_min) >= 5 and len(got_hour) >= 4:
                    break
                _write(
                    stream_dir, f"part-00{attempt + 1}.jsonl",
                    [{"k": "z", "ts": f"2024-03-{10 + attempt:02d}T00:00:00.000Z", "v": 0.0}],
                )
                _run_pass(spark, stream_dir, tmp_path, attempt)
            assert _collect(spark, "minute") == _batch_expected(spark, "minute")
            assert _collect(spark, "hour") == _batch_expected(spark, "hour")
        finally:
            spark.conf.unset("spark.sql.session.timeZone")

    def test_parquet_hypertable_sink(self, spark, stream_dir, tmp_path):
        """End-to-end materialization: append-mode level written to a
        parquet 'hypertable' directory and read back as a batch table —
        the deployment shape (each level is its own sink)."""
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        try:
            stream = spark.readStream.schema(_SCHEMA).json(str(stream_dir))
            levels = streaming_time_rollup(
                stream, "ts", _METRICS, group_cols=["k"],
                resolutions=["hour"], watermark="5 minutes",
            )
            out_dir = str(tmp_path / "hypertable_hour")
            q = (
                levels["hour"].writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", str(tmp_path / "ckpt_pq"))
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            back = spark.read.parquet(out_dir).filter(F.col("k") != "z")
            got = {
                (r["k"], r["bucket"].isoformat()): (r["n"], r["total"])
                for r in back.collect()
            }
            expect = {
                (k, b): (n, t)
                for (k, b, _res), (n, t, *_rest) in _batch_expected(spark, "hour").items()
            }
            # emitted buckets are a subset of batch truth, values exact
            assert got
            for key, val in got.items():
                assert expect[key] == val
        finally:
            spark.conf.unset("spark.sql.session.timeZone")

    def test_rejects_variable_length_units(self, spark, stream_dir):
        stream = spark.readStream.schema(_SCHEMA).json(str(stream_dir))
        with pytest.raises(ValueError, match="unsupported streaming resolutions"):
            streaming_time_rollup(stream, "ts", _METRICS, resolutions=["month"])

    def test_requires_metrics(self, spark, stream_dir):
        stream = spark.readStream.schema(_SCHEMA).json(str(stream_dir))
        with pytest.raises(ValueError, match="metrics"):
            streaming_time_rollup(stream, "ts", {})

    def test_hll_double_column_rejected_with_guidance(self, spark, stream_dir):
        """hll_sketch_agg accepts only int/bigint/string/binary; a DOUBLE
        metric must fail at build time with a clear message, not as a
        deep Catalyst DATATYPE_MISMATCH (batch time_rollup shares the
        same validation)."""
        stream = spark.readStream.schema(_SCHEMA).json(str(stream_dir))
        with pytest.raises(ValueError, match="cast the column to string"):
            streaming_time_rollup(stream, "ts", {"nd": ("approx_distinct", "v")})
        from duckdb_mongo_spark.ops.rollup import time_rollup

        bdf = spark.createDataFrame([("a",)], "k string").selectExpr(
            "k", "CAST('2024-01-01' AS TIMESTAMP) AS ts", "CAST(1.5 AS DOUBLE) AS v"
        )
        with pytest.raises(ValueError, match="cast the column to string"):
            time_rollup(bdf, "ts", {"nd": ("approx_distinct", "v")})

    def test_hll_distinct_unions_across_chained_levels(self, spark, tmp_path):
        """An approx_distinct metric must UNION sketches upward (a naive
        rollup sums per-bucket distincts and overcounts): 30 one-minute
        buckets each holding 1 distinct uid (7 distinct overall) must
        estimate exactly 7 at the hour level."""
        import json as _json

        spark.conf.set("spark.sql.session.timeZone", "UTC")
        try:
            d = tmp_path / "hll_in"
            d.mkdir()
            rows = [
                {"k": "a", "ts": f"2024-03-01T10:{i:02d}:00.000Z", "uid": i % 7}
                for i in range(30)
            ]
            rows.append({"k": "z", "ts": "2024-03-10T00:00:00.000Z", "uid": 0})
            (d / "p0.jsonl").write_text("\n".join(_json.dumps(r) for r in rows))
            stream = spark.readStream.schema("k string, ts timestamp, uid bigint").json(str(d))
            levels = streaming_time_rollup(
                stream, "ts", {"nd": ("approx_distinct", "uid"), "n": ("count", "uid")},
                group_cols=["k"], resolutions=["minute", "hour"], watermark="5 minutes",
            )
            for unit, df in levels.items():
                q = (
                    df.writeStream.format("memory").queryName(f"cagg_hll_{unit}")
                    .outputMode("append")
                    .option("checkpointLocation", str(tmp_path / f"ck_{unit}"))
                    .trigger(availableNow=True).start()
                )
                q.awaitTermination(180)
            hour = [
                (r["nd"], r["n"])
                for r in spark.sql("SELECT * FROM cagg_hll_hour").collect()
                if r["k"] == "a"
            ]
            assert hour == [(7, 30)]
        finally:
            spark.conf.unset("spark.sql.session.timeZone")
