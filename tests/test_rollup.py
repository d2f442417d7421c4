"""Multi-resolution time rollup vs direct-from-raw DuckDB aggregation.

The operator re-aggregates coarser levels from the finest level's
partials; the oracle aggregates every resolution directly from raw
rows — equality proves the merge path (incl. avg-from-carried-partials,
never average-of-averages).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_mongo_spark.ops.rollup import time_rollup


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    import __spark_entry__ as entry

    return entry._load_table(spark, sf_dir, "events")


@pytest.fixture(scope="module")
def con(sf_dir):
    from _oracle import duckdb_con

    return duckdb_con(sf_dir)


class TestTimeRollup:
    def test_three_levels_match_duckdb(self, events, con):
        from _oracle import compare

        out = time_rollup(
            events,
            "ts",
            metrics={
                "total": ("sum", "value"),
                "n": ("count", "event_id"),
                "lo": ("min", "value"),
                "hi": ("max", "value"),
                "mean": ("avg", "value"),
            },
            group_cols=["event_type"],
            resolutions=["hour", "day", "month"],
        )
        one = """
            SELECT event_type, date_trunc('{u}', ts) AS bucket, '{u}' AS resolution,
                   SUM(value) AS total, COUNT(event_id) AS n,
                   MIN(value) AS lo, MAX(value) AS hi, AVG(value) AS mean
            FROM events GROUP BY 1, 2
        """
        sql = " UNION ALL ".join(one.format(u=u) for u in ("hour", "day", "month"))
        res = compare(out, con, sql)
        assert res["value_match"], res
        assert res["rows_spark"] > 100

    def test_single_scan_via_cached_partials(self, events):
        out = time_rollup(
            events, "ts", metrics={"n": ("count", "event_id")}, resolutions=["minute", "hour", "day"]
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        # every level must read the materialized finest partials, not
        # rescan the fact table (Spark does not share union subplans)
        assert "InMemoryTableScan" in plan, plan[:2000]
        assert out.count() > 0

    def test_approx_distinct_unions_not_sums(self, events, con):
        out = time_rollup(
            events, "ts",
            metrics={"users": ("approx_distinct", "user_id"), "n": ("count", "event_id")},
            resolutions=["hour", "day"],
        ).filter(F.col("resolution") == "day")
        got = {str(r.bucket): r.users for r in out.collect()}
        exact = dict(con.execute(
            "SELECT CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS VARCHAR), COUNT(DISTINCT user_id)"
            " FROM events GROUP BY 1"
        ).fetchall())
        assert got.keys() == exact.keys()
        for k, est in got.items():
            # day-level sketches are UNIONS of hour-level sketches; a
            # summing rollup would report ~sum of hourly distincts (far
            # larger). HLL lgk=12 error ~1.6%; allow 5%.
            assert abs(est - exact[k]) <= max(2, 0.05 * exact[k]), (k, est, exact[k])
        # prove the sum-trap is material on this data: hourly distincts
        # summed over a day exceed the day's true distinct count
        hourly_sum = dict(con.execute(
            """SELECT CAST(CAST(d AS TIMESTAMP) AS VARCHAR), SUM(u) FROM (
                 SELECT date_trunc('day', ts) AS d, date_trunc('hour', ts) AS h,
                        COUNT(DISTINCT user_id) AS u
                 FROM events GROUP BY 1, 2) GROUP BY 1"""
        ).fetchall())
        assert any(hourly_sum[k] > exact[k] * 2 for k in exact), "data too sparse for the trap"

    def test_ohlc_first_last_match_duckdb(self, events, con):
        from _oracle import compare

        # tie-safe input: one row per (event_type, ts) on BOTH sides, so
        # arg_min/arg_max and min_by/max_by cannot disagree on ties
        uniq = events.groupBy("event_type", "ts").agg(F.max("value").alias("value"))
        out = time_rollup(
            uniq,
            "ts",
            metrics={
                "open": ("first", "value"),
                "high": ("max", "value"),
                "low": ("min", "value"),
                "close": ("last", "value"),
            },
            group_cols=["event_type"],
            resolutions=["hour", "day", "month"],
        )
        one = """
            SELECT event_type, date_trunc('{u}', ts) AS bucket, '{u}' AS resolution,
                   arg_min(value, ts) AS open, MAX(value) AS high,
                   MIN(value) AS low, arg_max(value, ts) AS close
            FROM (SELECT event_type, ts, MAX(value) AS value
                  FROM events GROUP BY 1, 2)
            GROUP BY 1, 2
        """
        sql = " UNION ALL ".join(one.format(u=u) for u in ("hour", "day", "month"))
        res = compare(out, con, sql)
        assert res["value_match"], res
        assert res["rows_spark"] > 100

    def test_first_last_requires_ts_ordering(self, events):
        from duckdb_mongo_spark.ops.rollup import build_partial_aggs

        with pytest.raises(ValueError, match="first/last"):
            build_partial_aggs({"o": ("first", "value")})

    def test_rejects_bad_input(self, events):
        with pytest.raises(ValueError):
            time_rollup(events, "ts", metrics={}, resolutions=["hour"])
        with pytest.raises(ValueError):
            time_rollup(events, "ts", metrics={"n": ("count", "event_id")}, resolutions=["fortnight"])
        with pytest.raises(ValueError):
            time_rollup(events, "ts", metrics={"n": ("median", "value")}, resolutions=["hour"])
        # an avg metric's derived partials must not collide with another
        # metric's name — silent dedupe would ship wrong values
        with pytest.raises(ValueError, match="collide"):
            time_rollup(
                events, "ts",
                metrics={"x": ("avg", "value"), "x__sum": ("sum", "value")},
                resolutions=["hour"],
            )

    def test_duplicate_resolutions_emit_once(self, events):
        out = time_rollup(
            events, "ts", metrics={"n": ("count", "event_id")},
            resolutions=["hour", "day", "hour"],
        )
        per_res = {r["resolution"]: r["cnt"] for r in
                   out.groupBy("resolution").agg(F.count("*").alias("cnt")).collect()}
        direct = time_rollup(
            events, "ts", metrics={"n": ("count", "event_id")}, resolutions=["hour"]
        ).count()
        assert per_res["hour"] == direct  # not doubled


class TestQuantileRollup:
    """approx_quantile:<q> — deterministic mergeable bottom-hash sample.

    Exact quantiles do not merge across buckets; the sketch's per-slot
    hash minima do. Parity test proves merged == built-from-raw
    bit-identically; accuracy test bounds the rank error vs DuckDB's
    exact percentile_cont.
    """

    _M = {
        "p50": ("approx_quantile:0.5", "value"),
        "p95": ("approx_quantile:0.95", "value"),
        "n": ("count", "event_id"),
    }

    def test_merge_path_equals_direct_build(self, events):
        merged = time_rollup(
            events, "ts", self._M, group_cols=["event_type"], resolutions=["hour", "day"]
        ).filter(F.col("resolution") == "day")
        direct = time_rollup(
            events, "ts", self._M, group_cols=["event_type"], resolutions=["day"]
        )
        key = lambda r: (r["event_type"], str(r["bucket"]))
        a = {key(r): (r["p50"], r["p95"], r["n"]) for r in merged.collect()}
        b = {key(r): (r["p50"], r["p95"], r["n"]) for r in direct.collect()}
        assert a == b  # bit-identical, not approximately equal
        assert len(a) > 50

    def test_rank_error_bounded_vs_exact(self, events, con):
        out = time_rollup(
            events, "ts", self._M, group_cols=["event_type"], resolutions=["year"]
        )
        got = {r["event_type"]: (r["p50"], r["p95"]) for r in out.collect()}
        for et, (p50, p95) in got.items():
            for q, est in ((0.5, p50), (0.95, p95)):
                # fraction of values strictly below the estimate = its
                # empirical rank; k=64 gives stderr ~6%, bound at 3 sigma
                frac, = con.execute(
                    "SELECT AVG(CASE WHEN value < ? THEN 1.0 ELSE 0.0 END) "
                    "FROM events WHERE event_type = ?", [est, et]
                ).fetchone()
                assert abs(frac - q) < 0.2, (et, q, est, frac)

    def test_small_buckets_interpolate_like_percentile_cont(self, spark, con):
        # n <= slots and collision-free hashes: the sample IS the bucket,
        # so linear interpolation must equal exact percentile_cont
        rows = [("2024-01-01 00:00:%02d" % i, float(v)) for i, v in
                enumerate([5, 1, 9, 3, 7])]
        df = spark.createDataFrame(rows, "ts_s string, value double").select(
            F.to_timestamp("ts_s").alias("ts"), "value"
        )
        out = time_rollup(
            df, "ts", {"p50": ("approx_quantile:0.5", "value"),
                       "p90": ("approx_quantile:0.9", "value")},
            resolutions=["hour"], quantile_slots=512,
        ).collect()
        assert len(out) == 1 and out[0]["p50"] == 5.0
        assert abs(out[0]["p90"] - 8.2) < 1e-9  # 7 + 0.6*(9-7)

    def test_nulls_and_errors(self, spark, events):
        from duckdb_mongo_spark.ops.rollup import build_partial_aggs

        df = spark.createDataFrame(
            [("2024-01-01 00:00:00", None)], "ts_s string, value double"
        ).select(F.to_timestamp("ts_s").alias("ts"), "value")
        out = time_rollup(
            df, "ts", {"p50": ("approx_quantile:0.5", "value")}, resolutions=["hour"]
        ).collect()
        assert len(out) == 1 and out[0]["p50"] is None
        with pytest.raises(ValueError, match="quantile must be in"):
            time_rollup(events, "ts", {"x": ("approx_quantile:1.5", "value")},
                        resolutions=["hour"])
        with pytest.raises(ValueError, match="bad quantile"):
            time_rollup(events, "ts", {"x": ("approx_quantile:oops", "value")},
                        resolutions=["hour"])
        with pytest.raises(ValueError, match="ts_col"):
            build_partial_aggs({"x": ("approx_quantile:0.5", "value")})

    def test_shared_sketch_per_source_column(self):
        from duckdb_mongo_spark.ops.rollup import build_partial_aggs

        aggs = build_partial_aggs(
            {"p50": ("approx_quantile:0.5", "value"),
             "p95": ("approx_quantile:0.95", "value")},
            ts_col="ts", quantile_slots=16,
        )
        assert len(aggs) == 16  # ONE sketch, not one per quantile
