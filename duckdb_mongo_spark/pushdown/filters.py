"""Predicate AST → MQL ``find()`` filter compiler.

Spark-side analog of src/mongo_filter_pushdown.cpp:50-543 (semantics per
SURVEY.md §2A A5-A11, written from public MongoDB query docs):

- constant comparisons → ``{col: v}`` / ``{col: {$op: v}}``
- IN → ``$in``; IS [NOT] NULL → ``{col: null}`` / ``{$ne: null}``
- AND merges into one doc (per-column op merge) / ``$and``; OR → ``$or``
- dotted nested paths re-root the filter at ``parent.child``
- ObjectId coercion: 24-hex strings → ObjectId only for columns the
  schema probe marked as true ObjectIds (string_id_test regression)
- anything non-simple goes through the ``$expr`` compiler; what neither
  handles is returned as a residual predicate for Spark to evaluate
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass

from duckdb_mongo_spark.bsonlike import ObjectId, is_hex24
from duckdb_mongo_spark.pushdown import predicates as P
from duckdb_mongo_spark.pushdown.exprs import Unpushable, compile_pred_expr


@dataclass
class FilterPlan:
    match: dict | None       # MQL find-filter (may contain $expr)
    residual: object | None  # Pred evaluated in Spark after the scan

    @property
    def fully_pushed(self) -> bool:
        return self.residual is None


_OPS = {"=": "$eq", "!=": "$ne", "<": "$lt", "<=": "$lte", ">": "$gt", ">=": "$gte"}


def _mongo_key(name: str, schema) -> str:
    if schema is not None:
        spec = schema.field_map().get(name)
        if spec is not None:
            return spec.mongo_path
    return name


def _encode_value(v, colname: str, schema):
    """Typed BSON value encoding incl. DATE→datetime and ObjectId coercion
    (reference value encoding src/mongo_filter_pushdown.cpp:50-174)."""
    if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
        return _dt.datetime(v.year, v.month, v.day)
    if (
        schema is not None
        and is_hex24(v)
        and colname in schema.objectid_columns
    ):
        return ObjectId(v)
    return v


def _simple(pred, schema) -> dict | None:
    """Compile one predicate to a find-filter doc, or None if not simple."""
    if isinstance(pred, P.Cmp) and isinstance(pred.left, P.Col) and isinstance(pred.right, P.Lit):
        key = _mongo_key(pred.left.name, schema)
        val = _encode_value(pred.right.value, pred.left.name, schema)
        if val is None:
            # SQL: any comparison with a NULL literal is unknown, never
            # true — match nothing. ({col: {$eq: None}} would instead
            # match missing/null fields, MQL semantics.)
            return {"$expr": False}
        if pred.op == "=":
            return {key: {"$eq": val}}
        if pred.op == "!=":
            # MQL $ne matches MISSING/null fields; the predicate DSL has
            # SQL semantics (residuals run in Spark, where NULL != v is
            # not true) — conjoin the non-null guard. SQL engines add the
            # same IS NOT NULL next to pushed != (seen in Catalyst's
            # pushFilters and DuckDB's TableFilters alike).
            return {"$and": [{key: {"$ne": val}}, {key: {"$ne": None}}]}
        return {key: {_OPS[pred.op]: val}}
    if isinstance(pred, P.Cmp) and isinstance(pred.right, P.Col) and isinstance(pred.left, P.Lit):
        flipped = {"=": "=", "!=": "!=", "<": ">", "<=": ">=", ">": "<", ">=": "<="}[pred.op]
        return _simple(P.Cmp(flipped, pred.right, pred.left), schema)
    if isinstance(pred, P.In) and isinstance(pred.operand, P.Col):
        if not all(isinstance(v, P.Lit) for v in pred.values):
            return None
        key = _mongo_key(pred.operand.name, schema)
        vals = [
            _encode_value(v.value, pred.operand.name, schema)
            for v in pred.values
            if v.value is not None
        ]
        # SQL semantics: NULL in the IN list never matches (and MQL $in
        # with null would match MISSING fields) — strip them; an
        # all-NULL list matches nothing
        return {key: {"$in": vals}}
    if isinstance(pred, P.IsNull) and isinstance(pred.operand, P.Col):
        return {_mongo_key(pred.operand.name, schema): None}
    if isinstance(pred, P.IsNotNull) and isinstance(pred.operand, P.Col):
        return {_mongo_key(pred.operand.name, schema): {"$ne": None}}
    if isinstance(pred, P.Regex) and isinstance(pred.operand, P.Col):
        return {_mongo_key(pred.operand.name, schema): {"$regex": pred.pattern}}
    if isinstance(pred, P.Geo) and isinstance(pred.operand, P.Col):
        doc: dict = {pred.op: pred.body}
        if pred.siblings:
            doc.update(pred.siblings)
        return {_mongo_key(pred.operand.name, schema): doc}
    if isinstance(pred, P.And):
        parts = [_simple(c, schema) for c in pred.children]
        if any(p is None for p in parts):
            return None
        return _merge_and(parts)
    if isinstance(pred, P.Or):
        parts = [_simple(c, schema) for c in pred.children]
        if any(p is None for p in parts):
            return None
        return {"$or": parts}
    return None


def _merge_and(parts: list[dict]) -> dict:
    """Merge conjunct docs into one filter doc where keys don't collide
    (the reference's per-column merge, filter_pushdown.cpp:433-543);
    colliding keys fall back to ``$and``."""
    merged: dict = {}
    for part in parts:
        for k, v in part.items():
            if k not in merged:
                merged[k] = v
            elif (
                isinstance(merged[k], dict)
                and isinstance(v, dict)
                and not (set(merged[k]) & set(v))
                and not k.startswith("$")
            ):
                merged[k] = {**merged[k], **v}
            else:
                return {"$and": parts}
    return merged


def compile_filter(pred, schema=None) -> FilterPlan:
    """Compile a predicate into (pushed match, residual) halves.

    AND splits per-conjunct: pushable conjuncts go to the source, the
    rest stay in Spark — matching the reference, which removes only the
    converted filters from the plan.
    """
    if pred is None:
        return FilterPlan(None, None)
    simple = _simple(pred, schema)
    if simple is not None:
        return FilterPlan(simple, None)
    try:
        return FilterPlan({"$expr": compile_pred_expr(pred, schema)}, None)
    except Unpushable:
        pass
    if isinstance(pred, P.And):
        pushed_parts: list[dict] = []
        residual: list = []
        for child in pred.children:
            sub = compile_filter(child, schema)
            if sub.fully_pushed and sub.match is not None:
                pushed_parts.append(sub.match)
            else:
                residual.append(child)
        match = _merge_and(pushed_parts) if pushed_parts else None
        res = None
        if residual:
            res = residual[0] if len(residual) == 1 else P.And(residual)
        return FilterPlan(match, res)
    return FilterPlan(None, pred)


def merge_match(a: dict | None, b: dict | None) -> dict | None:
    """Combine two find-filters conjunctively."""
    if not a:
        return b
    if not b:
        return a
    return _merge_and([a, b])
