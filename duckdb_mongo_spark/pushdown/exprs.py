"""Complex-predicate → MQL ``$expr`` compiler.

Spark-side analog of the reference's expression pushdown
(src/mongo_expr_pushdown.cpp:103-421): function mapping
LENGTH→``$strLenCP``, SUBSTRING→``$substrCP`` (constant 1-based start ≥ 1
and length ≥ 0 only, start converted to 0-based), column-to-column
comparisons, CAST unwrapping, arithmetic. Raises ``Unpushable`` for
anything outside the dialect; the caller keeps those predicates
engine-side (Spark), matching the reference's negative space.
"""

from __future__ import annotations

import datetime as _dt

from duckdb_mongo_spark.pushdown import predicates as P


class Unpushable(Exception):
    """Predicate/expression cannot be compiled to MQL; evaluate in Spark."""


_CMP_OPS = {"=": "$eq", "!=": "$ne", "<": "$lt", "<=": "$lte", ">": "$gt", ">=": "$gte"}
_ARITH_OPS = {"+": "$add", "-": "$subtract", "*": "$multiply", "/": "$divide", "%": "$mod"}
_FUNC_MAP = {
    "length": "$strLenCP",
    "len": "$strLenCP",
    "char_length": "$strLenCP",
    "lower": "$toLower",
    "upper": "$toUpper",
    "abs": "$abs",
    "floor": "$floor",
    "ceil": "$ceil",
    "round": "$round",
    "concat": "$concat",
    "year": "$year",
    "month": "$month",
    "day": "$dayOfMonth",
}


def _field_ref(name: str, schema) -> str:
    """Resolve a (possibly flattened) column name to its dotted Mongo path."""
    if schema is not None:
        spec = schema.field_map().get(name)
        if spec is not None:
            return "$" + spec.mongo_path
    return "$" + name


def compile_expr(expr, schema=None):
    """Scalar expression AST → MQL aggregation expression."""
    if isinstance(expr, P.Col):
        return _field_ref(expr.name, schema)
    if isinstance(expr, P.Lit):
        v = expr.value
        if isinstance(v, str) and v.startswith("$"):
            return {"$literal": v}
        if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
            return _dt.datetime(v.year, v.month, v.day)
        return v
    if isinstance(expr, P.Cast):
        # CAST unwrapping (reference unwraps casts on both comparison
        # sides, src/mongo_expr_pushdown.cpp:316-415); numeric casts map
        # to $toX so Mongo applies the same coercion
        inner = compile_expr(expr.operand, schema)
        t = expr.type_name
        if t in ("BIGINT", "INT", "INTEGER", "LONG"):
            return {"$toLong": inner}
        if t in ("DOUBLE", "FLOAT", "REAL"):
            return {"$toDouble": inner}
        if t in ("VARCHAR", "STRING", "TEXT"):
            return {"$toString": inner}
        return inner
    if isinstance(expr, P.BinOp):
        op = _ARITH_OPS.get(expr.op)
        if op is None:
            raise Unpushable(f"arithmetic op {expr.op!r}")
        return {op: [compile_expr(expr.left, schema), compile_expr(expr.right, schema)]}
    if isinstance(expr, P.Func):
        name = expr.name.lower()
        if name in ("substring", "substr"):
            s, start, length = expr.args
            if not isinstance(start, P.Lit) or not isinstance(length, P.Lit):
                raise Unpushable("SUBSTRING requires constant start/length")
            if not isinstance(start.value, int) or start.value < 1:
                raise Unpushable("SUBSTRING start must be a constant >= 1 (1-based)")
            if not isinstance(length.value, int) or length.value < 0:
                raise Unpushable("SUBSTRING length must be a constant >= 0")
            return {
                "$substrCP": [compile_expr(s, schema), start.value - 1, length.value]
            }
        mql = _FUNC_MAP.get(name)
        if mql is None:
            raise Unpushable(f"function {expr.name!r} not in pushdown dialect")
        if mql == "$concat":
            return {"$concat": [compile_expr(a, schema) for a in expr.args]}
        return {mql: compile_expr(expr.args[0], schema)}
    raise Unpushable(f"expression {expr!r}")


def compile_pred_expr(pred, schema=None):
    """Predicate AST → MQL boolean aggregation expression (for ``$expr``)."""
    if isinstance(pred, P.Cmp):
        return {
            _CMP_OPS[pred.op]: [
                compile_expr(pred.left, schema),
                compile_expr(pred.right, schema),
            ]
        }
    if isinstance(pred, P.In):
        vals = []
        for v in pred.values:
            if not isinstance(v, P.Lit):
                raise Unpushable("IN list must be constants")
            vals.append(compile_expr(v, schema))
        return {"$in": [compile_expr(pred.operand, schema), vals]}
    if isinstance(pred, P.IsNull):
        return {"$lte": [compile_expr(pred.operand, schema), None]}
    if isinstance(pred, P.IsNotNull):
        return {"$gt": [compile_expr(pred.operand, schema), None]}
    if isinstance(pred, P.And):
        return {"$and": [compile_pred_expr(c, schema) for c in pred.children]}
    if isinstance(pred, P.Or):
        return {"$or": [compile_pred_expr(c, schema) for c in pred.children]}
    if isinstance(pred, P.Not):
        return {"$not": compile_pred_expr(pred.child, schema)}
    raise Unpushable(f"predicate {pred!r}")
