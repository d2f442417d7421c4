"""bench.py driver-contract smoke: exits 0 and stdout is EXACTLY one
JSON line with the promised keys.

Round-3 lessons, both of which this test catches in pytest instead of
at driver time: (1) a testdata type drift aborted the suite mid-bench;
(2) sf1 staging progress prints leaked into stdout and broke the
single-JSON-line contract.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_stdout_is_one_json_line():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_ITERS="1",
        SPARK_GRAFT_BENCH_SKIP_SF1="1",
        SPARK_GRAFT_BENCH_SKIP_SF10="1",
        SPARK_GRAFT_BENCH_SKIP_NATIVE="1",
        SPARK_GRAFT_BENCH_SKIP_DUCKDB="1",
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True, text=True, timeout=600, env=env, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    # detail line (optional, full sections) + compact final line; every
    # stdout line must itself be valid JSON
    assert 1 <= len(lines) <= 2, f"stdout must be 1-2 JSON lines, got {len(lines)}: {lines[:5]}"
    for ln in lines:
        json.loads(ln)
    out = json.loads(lines[-1])
    assert out["metric"] == "headline_queries_total_wall"
    assert out["unit"] == "sec"
    assert out["sf"] == 0.001
    assert isinstance(out["value"], (int, float)) and out["value"] > 0
    # 19 line items since r9 (the HOF cosine kernel left the bench for
    # the pytest parity cross-check; GEMM is the sole cosine line item)
    assert len(out["queries"]) >= 19
    # the driver reads a ~2 kB stdout tail: the FINAL line (plus newline)
    # must always fit, whatever auxiliary sections the detail line grows
    assert len(lines[-1]) < 1900, f"final line too big for driver tail: {len(lines[-1])}"
    allowed = {"metric", "value", "unit", "queries", "sf", "duckdb_total_sec",
               "vs_duckdb", "vs_duckdb_paired", "vs_duckdb_trimmed",
               "vs_duckdb_floor",
               "sf1_vs_duckdb", "sf1_paired", "sf1_trimmed", "sf10_text_ratio",
               "sf10_sim_ratio", "sf10_joins_ratio", "sf10_dedup_ratio",
               "sf10_scaling"}
    assert set(out) <= allowed, f"final line must stay compact: {set(out) - allowed}"
    assert all(isinstance(v, (int, float)) for v in out["queries"].values())
