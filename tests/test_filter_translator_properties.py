"""Property test: the ANN/search filter translator
(ops/vector_index.translate_match_filter) agrees with the interpreter's
matcher (mql/match.matches_filter) on every filter it accepts — mongod
missing-field semantics included (a flattened null stands for an absent
field; $ne/$nin match it, $eq/ranges don't)."""
from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_mongo_spark.mql.match import matches_filter
from duckdb_mongo_spark.ops.vector_index import translate_match_filter

ROWS = [
    (1, 5, "a"), (2, None, "b"), (3, 9, None), (4, 0, "a"),
    (5, -3, "zz"), (6, 5, None), (7, None, None), (8, 100, "b"),
]
from collections import namedtuple

_FS = namedtuple("FS", "name type")
COLS = {"_id": _FS("_id", "BIGINT"), "n": _FS("n", "BIGINT"),
        "s": _FS("s", "VARCHAR")}

_num = st.sampled_from([0, 5, 9, -3, 100, 7])
_strv = st.sampled_from(["a", "b", "zz", "nope"])
_scalar = st.one_of(_num, _strv, st.none())

_leaf = st.one_of(
    st.builds(lambda f, v: {f: v},
              st.sampled_from(["n", "s"]), _scalar),
    st.builds(lambda f, op, v: {f: {op: v}},
              st.just("n"),
              st.sampled_from(["$gt", "$gte", "$lt", "$lte"]), _num),
    st.builds(lambda f, op, v: {f: {op: v}},
              st.sampled_from(["n", "s"]),
              st.sampled_from(["$eq", "$ne"]), _scalar),
    st.builds(lambda f, op, vs: {f: {op: vs}},
              st.sampled_from(["n", "s"]),
              st.sampled_from(["$in", "$nin"]),
              st.lists(_scalar, min_size=1, max_size=3)),
)
_filter = st.one_of(
    _leaf,
    st.builds(lambda k, a, b: {k: [a, b]},
              st.sampled_from(["$and", "$or"]), _leaf, _leaf),
    st.builds(lambda a, b: {**a, **b}, _leaf, _leaf),  # implicit AND
)


class TestTranslatorProperties:
    @settings(max_examples=60, deadline=None)
    @given(flt=_filter)
    def test_accepted_filters_match_interpreter(self, spark_session, flt):
        col = translate_match_filter(flt, COLS)
        if col is None:
            return  # outside the subset: the caller falls back — fine
        df = spark_session.createDataFrame(ROWS, ["_id", "n", "s"])
        got = sorted(r._id for r in df.where(col).collect())
        docs = []
        for _id, n, s in ROWS:  # sparse view: None = absent field
            d = {"_id": _id}
            if n is not None:
                d["n"] = n
            if s is not None:
                d["s"] = s
            docs.append(d)
        exp = sorted(d["_id"] for d in docs if matches_filter(d, flt))
        assert got == exp, flt


# hypothesis re-runs the wrapped test many times; a function-scoped
# fixture would rebuild nothing here, but the session fixture keeps the
# single SparkSession
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def spark_session(spark):
    return spark
