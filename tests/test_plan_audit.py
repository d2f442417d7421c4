"""plan_audit tool smoke: runs on a query subset, emits a well-formed
markdown table with final-plan counts. The tool broke twice in round 3
(initial-plan double-counting under AQE, a dead pushdown-evidence
branch) without anything noticing — meta-tools need tests too.
"""

from __future__ import annotations

import os
import subprocess
import sys


def test_plan_audit_table_shape():
    env = dict(
        os.environ,
        PLAN_AUDIT_ONLY="q3_shipping_priority,mongo_filter_projection",
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "plan_audit.py"),
         "/root/testdata/sf0.001"],
        capture_output=True, text=True, timeout=300, env=env, cwd=repo,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = r.stdout.splitlines()
    rows = [ln for ln in lines if ln.startswith("| ") and not ln.startswith("| query")]
    assert len(rows) == 2, rows
    header = next(ln for ln in lines if ln.startswith("| query"))
    width = header.count("|")
    for row in rows:
        assert row.count("|") == width, row
        assert "ERROR" not in row, row
    q3 = next(r for r in rows if "q3_shipping_priority" in r)
    # q3 joins two dimensions: final plan must show broadcast joins and
    # pushed scan filters (AQE-final counting, not the initial plan)
    assert int(q3.split("|")[2].strip()) >= 2, q3
    assert "pushed filters" in q3
    mongo = next(r for r in rows if "mongo_filter_projection" in r)
    assert "BatchScan" in mongo
    assert any("flags" in ln and "none" in ln for ln in lines), lines[-3:]
