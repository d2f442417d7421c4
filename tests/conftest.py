from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Durable ANN sidecars go to a per-run scratch root so one test run's
# indexes can't shadow another's (tmp_path corpora get fresh fingerprints
# anyway, but the root itself shouldn't accumulate across runs).
if "SPARK_GRAFT_INDEX_DIR" not in os.environ:
    import tempfile

    os.environ["SPARK_GRAFT_INDEX_DIR"] = tempfile.mkdtemp(
        prefix="spark_graft_idx_test_")
if "SPARK_GRAFT_TEXT_STATS_DIR" not in os.environ:
    import tempfile

    os.environ["SPARK_GRAFT_TEXT_STATS_DIR"] = tempfile.mkdtemp(
        prefix="spark_graft_txt_test_")
if "SPARK_GRAFT_INTERVAL_INDEX_DIR" not in os.environ:
    import tempfile

    os.environ["SPARK_GRAFT_INTERVAL_INDEX_DIR"] = tempfile.mkdtemp(
        prefix="spark_graft_iv_test_")


@pytest.fixture(scope="session")
def spark():
    from duckdb_mongo_spark.session import get_spark

    s = get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s


@pytest.fixture(scope="session")
def backend():
    from corpus import build_backend

    return build_backend()


@pytest.fixture(scope="session")
def sf_dir():
    d = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(d):
        pytest.skip(f"testdata dir {d} not present")
    return d
