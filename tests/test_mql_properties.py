"""Property-based tests (hypothesis) for the MQL layer — beyond the
reference's test strategy (SURVEY §5: "No randomized/property-based
testing"), these pin the two invariants the engine's correctness rests
on:

1. compiler/interpreter agreement: for any simple predicate and any
   document, ``matches_filter(doc, compile_filter(pred).match)`` equals
   direct evaluation of the predicate;
2. pushdown-split soundness: pushed-match ∧ residual ≡ original
   predicate (the reference removes only converted filters from the
   plan — same contract).
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_mongo_spark.mql.match import matches_filter
from duckdb_mongo_spark.pushdown import predicates as P
from duckdb_mongo_spark.pushdown.filters import compile_filter

# one type per column — the engine's schema inference types every column
# before any predicate runs, so cross-type comparisons cannot occur
COLTYPES = {
    "a": st.integers(min_value=-1000, max_value=1000),
    "b": st.text(alphabet="abcXYZ", max_size=4),
    "c": st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
}
COLS = list(COLTYPES)

docs = st.fixed_dictionaries(
    {},
    optional={c: st.one_of(t, st.none()) for c, t in COLTYPES.items()},
)


def _cmp_key(v):
    """MQL type-bracketed ordering: cross-type comparisons never match."""
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, (int, float)):
        return ("num", float(v))
    if isinstance(v, str):
        return ("str", v)
    return ("null", 0)


def eval_pred(pred, doc) -> bool:
    """Direct (oracle) evaluation of a predicate against a document,
    MongoDB semantics: comparisons only match same-type-bracket values,
    null equality matches missing, range ops never match null/missing."""
    if isinstance(pred, P.Cmp):
        # SQL semantics: NULL/missing never satisfies a comparison
        col, lit = pred.left.name, pred.right.value
        present = col in doc
        v = doc.get(col)
        if not present or v is None:
            return False
        tk, lk = _cmp_key(v), _cmp_key(lit)
        if tk[0] != lk[0]:
            return False
        if pred.op == "=":
            return tk[1] == lk[1]
        if pred.op == "!=":
            return tk[1] != lk[1]
        if pred.op == "<":
            return tk[1] < lk[1]
        if pred.op == "<=":
            return tk[1] <= lk[1]
        if pred.op == ">":
            return tk[1] > lk[1]
        if pred.op == ">=":
            return tk[1] >= lk[1]
    if isinstance(pred, P.In):
        # SQL semantics: NULL/missing never matches IN, NULLs in the
        # list match nothing
        col = pred.operand.name
        vals = [x.value for x in pred.values]
        present = col in doc
        v = doc.get(col)
        if not present or v is None:
            return False
        return any(
            _cmp_key(v)[0] == _cmp_key(x)[0] and _cmp_key(v)[1] == _cmp_key(x)[1]
            for x in vals
            if x is not None
        )
    if isinstance(pred, P.IsNull):
        c = pred.operand.name
        return c not in doc or doc[c] is None
    if isinstance(pred, P.IsNotNull):
        c = pred.operand.name
        return c in doc and doc[c] is not None
    if isinstance(pred, P.And):
        return all(eval_pred(ch, doc) for ch in pred.children)
    if isinstance(pred, P.Or):
        return any(eval_pred(ch, doc) for ch in pred.children)
    raise AssertionError(f"unhandled {pred!r}")


def leaf_preds():
    op = st.sampled_from(["=", "!=", "<", "<=", ">", ">="])

    def typed_cmp(c):
        return st.builds(
            lambda o, v: P.Cmp(o, P.Col(c), P.Lit(v)), op, COLTYPES[c]
        )

    def typed_in(c):
        # NULLs allowed in the IN list (compiler must strip them)
        vals = st.lists(st.one_of(COLTYPES[c], st.none()), min_size=1, max_size=4)
        return st.builds(lambda vs: P.In(P.Col(c), [P.Lit(v) for v in vs]), vals)

    col = st.sampled_from(COLS)
    return st.one_of(
        col.flatmap(typed_cmp),
        col.flatmap(typed_in),
        st.builds(lambda c: P.IsNull(P.Col(c)), col),
        st.builds(lambda c: P.IsNotNull(P.Col(c)), col),
    )


preds = st.recursive(
    leaf_preds(),
    lambda children: st.one_of(
        st.builds(lambda a, b: P.And([a, b]), children, children),
        st.builds(lambda a, b: P.Or([a, b]), children, children),
    ),
    max_leaves=6,
)


@settings(max_examples=300, deadline=None)
@given(pred=preds, doc=docs)
def test_compiled_filter_agrees_with_direct_evaluation(pred, doc):
    plan = compile_filter(pred)
    expected = eval_pred(pred, doc)
    if plan.residual is None:
        assert plan.match is not None
        assert matches_filter(doc, plan.match) == expected
    else:
        # split soundness: pushed ∧ residual ≡ original (conjunctive split)
        pushed_ok = plan.match is None or matches_filter(doc, plan.match)
        assert (pushed_ok and eval_pred(plan.residual, doc)) == expected


@settings(max_examples=200, deadline=None)
@given(pred=leaf_preds(), doc=docs)
def test_simple_filters_always_fully_push(pred, doc):
    plan = compile_filter(pred)
    assert plan.residual is None
    assert matches_filter(doc, plan.match) == eval_pred(pred, doc)


# ---------------------------------------------------------------------------
# r5 date-arithmetic properties: the $dateAdd/$dateTrunc/$dateDiff trio
# must satisfy the algebra mongod documents, on arbitrary datetimes.
# ---------------------------------------------------------------------------

import datetime as _dt

from duckdb_mongo_spark.mql.expr import _date_trunc, date_add_unit, eval_expr

_datetimes = st.datetimes(
    min_value=_dt.datetime(1970, 1, 1), max_value=_dt.datetime(2100, 1, 1)
)
_fixed_units = st.sampled_from(["second", "minute", "hour", "day", "week"])
_all_units = st.sampled_from(
    ["second", "minute", "hour", "day", "week", "month", "quarter", "year"]
)


@settings(max_examples=200, deadline=None)
@given(t=_datetimes, unit=_fixed_units, amount=st.integers(-10_000, 10_000))
def test_date_add_subtract_round_trip_fixed_units(t, unit, amount):
    assert date_add_unit(date_add_unit(t, amount, unit), -amount, unit) == t


@settings(max_examples=200, deadline=None)
@given(t=_datetimes, unit=_all_units, bin_size=st.integers(1, 7))
def test_date_trunc_idempotent_and_not_after(t, unit, bin_size):
    tr = _date_trunc(t, unit, bin_size=bin_size)
    assert tr <= t
    assert _date_trunc(tr, unit, bin_size=bin_size) == tr


@settings(max_examples=200, deadline=None)
@given(a=_datetimes, b=_datetimes, unit=_all_units)
def test_date_diff_counts_boundaries(a, b, unit):
    d = eval_expr({"$dateDiff": {"startDate": a, "endDate": b, "unit": unit}}, {})
    assert eval_expr(
        {"$dateDiff": {"startDate": b, "endDate": a, "unit": unit}}, {}
    ) == -d
    # zero exactly when both fall in the same unit bin
    assert (d == 0) == (_date_trunc(a, unit) == _date_trunc(b, unit))
