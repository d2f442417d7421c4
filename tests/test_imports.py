"""Import hygiene: the package root must stay importable (and fast)
without pandas — ops submodules load lazily (PEP 562) because
multimodal imports pandas at module scope.
"""

from __future__ import annotations

import os
import subprocess
import sys


def test_root_import_does_not_load_pandas():
    code = (
        "import sys; import duckdb_mongo_spark as dms;"
        "assert 'pandas' not in sys.modules, 'root import pulled in pandas';"
        "assert dms.ops.joins.asof_join and dms.ops.sampling.hash_split;"
        "assert dms.ops.rollup.time_rollup and dms.streaming.temporal.stream_static_asof;"
        "print('ok')"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, cwd=repo)
    assert r.returncode == 0, r.stderr[-2000:]
    assert r.stdout.strip() == "ok"
