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
    # r5: date parts + trim family (all null-propagating in BOTH SQL and
    # MQL, so no _NULL_MASKING_FUNCS entries needed). Spark's
    # dayofweek() is 1=Sunday..7=Saturday == $dayOfWeek; weekofyear()
    # is the ISO week == $isoWeek.
    "hour": "$hour",
    "minute": "$minute",
    "second": "$second",
    "dayofweek": "$dayOfWeek",
    "dayofyear": "$dayOfYear",
    "weekofyear": "$isoWeek",
    "trim": "$trim",
    "ltrim": "$ltrim",
    "rtrim": "$rtrim",
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
        # sides, src/mongo_expr_pushdown.cpp:316-415). Conversions are
        # emitted as $convert with onError:null — Spark's (ANSI-off)
        # CAST('abc' AS BIGINT) yields NULL from a non-null input, while
        # a bare $toLong would ERROR server-side on the same value; the
        # onError clause makes the pushed form match the residual form.
        inner = compile_expr(expr.operand, schema)
        t = expr.type_name
        to = {
            "BIGINT": "long", "INT": "long", "INTEGER": "long", "LONG": "long",
            "DOUBLE": "double", "FLOAT": "double", "REAL": "double",
            "VARCHAR": "string", "STRING": "string", "TEXT": "string",
        }.get(t)
        if to is None:
            return inner
        return {"$convert": {"input": inner, "to": to, "onError": None}}
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
        if mql in ("$trim", "$ltrim", "$rtrim"):
            # the trim family takes a spec document, not a bare operand
            return {mql: {"input": compile_expr(expr.args[0], schema)}}
        return {mql: compile_expr(expr.args[0], schema)}
    raise Unpushable(f"expression {expr!r}")


_NEG_CMP = {"=": "!=", "!=": "=", "<": ">=", "<=": ">", ">": "<=", ">=": "<"}


def _compile_is_null(operand, schema, want_null: bool):
    """SQL IS [NOT] NULL for an arbitrary expression operand.

    A bare column compiles to the MQL null-order test. For composite
    expressions the MQL form of the expression cannot be consulted —
    $toLower maps null→\"\" (nullness masked) and $strLenCP errors on
    null server-side — so the SQL rule is compiled structurally instead:
    a null-propagating expression is NULL iff any referenced column is
    null/missing. Expressions that can mask or manufacture NULL
    ($toLower/$toUpper, division) are Unpushable → Spark residual.
    """
    if isinstance(operand, P.Col):
        ref = _field_ref(operand.name, schema)
        return {"$lte": [ref, None]} if want_null else {"$gt": [ref, None]}
    if isinstance(operand, P.Lit):
        return (operand.value is None) == want_null
    if _masks_null(operand) or _can_produce_null(operand):
        raise Unpushable("IS [NOT] NULL over a null-masking/producing expression")
    refs: list = []
    _collect_cols(operand, schema, refs)
    if not refs:
        return not want_null  # constant expression: never NULL in SQL
    if want_null:
        return {"$or": [{"$lte": [r, None]} for r in refs]}
    return {"$and": [{"$gt": [r, None]} for r in refs]}


def _is_nonnull_lit(e) -> bool:
    return isinstance(e, P.Lit) and e.value is not None


def _is_null_lit(e) -> bool:
    return isinstance(e, P.Lit) and e.value is None


def _collect_cols(e, schema, out: list) -> None:
    """Field refs appearing in an expression AST (for null guards)."""
    if isinstance(e, P.Col):
        ref = _field_ref(e.name, schema)
        if ref not in out:
            out.append(ref)
    elif isinstance(e, P.BinOp):
        _collect_cols(e.left, schema, out)
        _collect_cols(e.right, schema, out)
    elif isinstance(e, P.Cast):
        _collect_cols(e.operand, schema, out)
    elif isinstance(e, P.Func):
        for a in e.args:
            _collect_cols(a, schema, out)


_NULLABLE_CAST_TARGETS = {
    "BIGINT", "INT", "INTEGER", "LONG", "DOUBLE", "FLOAT", "REAL",
    "DATE", "TIMESTAMP", "BOOLEAN",
}


def _can_produce_null(e) -> bool:
    """True if the expression can yield NULL from non-null inputs
    (division/modulo by zero, numeric/narrowing CAST: Spark's ANSI-off
    CAST('abc' AS BIGINT) is NULL — only cast-to-string is total)."""
    if isinstance(e, P.BinOp):
        return e.op in ("/", "%") or _can_produce_null(e.left) or _can_produce_null(e.right)
    if isinstance(e, P.Cast):
        return e.type_name in _NULLABLE_CAST_TARGETS or _can_produce_null(e.operand)
    if isinstance(e, P.Func):
        return any(_can_produce_null(a) for a in e.args)
    return False


_NULL_MASKING_FUNCS = {"lower", "upper"}  # $toLower/$toUpper: null → ""


def _masks_null(e) -> bool:
    """True if the expression hides its input's nullness (MQL $toLower /
    $toUpper return \"\" for null input while SQL propagates NULL)."""
    if isinstance(e, P.Func):
        return e.name.lower() in _NULL_MASKING_FUNCS or any(
            _masks_null(a) for a in e.args
        )
    if isinstance(e, P.BinOp):
        return _masks_null(e.left) or _masks_null(e.right)
    if isinstance(e, P.Cast):
        return _masks_null(e.operand)
    return False


def _null_guards(side, compiled, schema, seen: set, guards: list) -> None:
    """Non-null guards for one comparison side.

    Guards every RAW column ref rather than (only) the compiled
    expression: MQL functions like $toLower map null→"" and would mask
    the nullness of their input, while SQL propagates NULL through
    scalar functions. The whole-expression guard is added only when the
    expression itself can produce null from non-null inputs."""
    if _is_nonnull_lit(side):
        return
    refs: list = []
    _collect_cols(side, schema, refs)
    if not isinstance(side, P.Col) and _can_produce_null(side):
        refs.append(compiled)
    for ref in refs:
        key = repr(ref)
        if key not in seen:
            seen.add(key)
            guards.append({"$gt": [ref, None]})


def compile_pred_expr(pred, schema=None, negate: bool = False):
    """Predicate AST → MQL boolean aggregation expression (for ``$expr``)
    with SQL NULL semantics.

    MQL ``$cmp`` is a total order where null/missing sorts lowest, so a
    bare ``{$lt: ["$a", 5]}`` would MATCH docs with missing/null ``a``
    while the same predicate evaluated as a Spark residual excludes them
    — results would silently differ based on pushability. Every
    comparison is therefore guarded with non-null checks on its operand
    expressions (``{$gt: [operand, None]}`` is "operand is non-null":
    everything sorts above null in the BSON order).

    ``negate`` implements SQL ``NOT`` under three-valued logic: NOT(p)
    is true iff p is *false*, not merely non-true — so the null guards
    stay POSITIVE outside the negated comparison, and And/Or distribute
    by De Morgan. Comparisons against a literal NULL compile to the
    match-nothing constant False (SQL ``col = NULL`` is never true).

    ORDERING IS LOAD-BEARING: guards are emitted BEFORE the comparison
    inside one ``$and``, and mongod documents aggregation ``$and`` as
    short-circuiting — operators that throw server-side on null input
    (e.g. ``$strLenCP``) are only safe because their non-null guard
    evaluates first. A refactor must not reorder, de-duplicate guards
    after the comparison, or split the guard and comparison into
    separate pipeline stages; new ``_FUNC_MAP`` entries with
    error-throwing null behavior inherit this dependency.
    """
    if isinstance(pred, P.Cmp):
        if _is_null_lit(pred.left) or _is_null_lit(pred.right):
            return False  # SQL: any comparison with NULL is unknown
        lhs = compile_expr(pred.left, schema)
        rhs = compile_expr(pred.right, schema)
        guards: list = []
        seen: set = set()
        _null_guards(pred.left, lhs, schema, seen, guards)
        _null_guards(pred.right, rhs, schema, seen, guards)
        op = _NEG_CMP[pred.op] if negate else pred.op
        cmp = {_CMP_OPS[op]: [lhs, rhs]}
        return {"$and": guards + [cmp]} if guards else cmp
    if isinstance(pred, P.In):
        vals = []
        has_null = False
        for v in pred.values:
            if not isinstance(v, P.Lit):
                raise Unpushable("IN list must be constants")
            if v.value is None:
                has_null = True  # SQL: NULL in the list never matches
            else:
                vals.append(compile_expr(v, schema))
        operand = compile_expr(pred.operand, schema)
        guards: list = []
        _null_guards(pred.operand, operand, schema, set(), guards)
        if negate:
            # x NOT IN (..., NULL) is never true in SQL
            if has_null:
                return False
            return {"$and": guards + [{"$not": {"$in": [operand, vals]}}]}
        if not vals:
            return False
        return {"$and": guards + [{"$in": [operand, vals]}]}
    if isinstance(pred, P.IsNull):
        return _compile_is_null(pred.operand, schema, want_null=not negate)
    if isinstance(pred, P.IsNotNull):
        return _compile_is_null(pred.operand, schema, want_null=negate)
    if isinstance(pred, P.And):
        parts = [compile_pred_expr(c, schema, negate) for c in pred.children]
        return {"$or": parts} if negate else {"$and": parts}
    if isinstance(pred, P.Or):
        parts = [compile_pred_expr(c, schema, negate) for c in pred.children]
        return {"$and": parts} if negate else {"$or": parts}
    if isinstance(pred, P.Not):
        return compile_pred_expr(pred.child, schema, not negate)
    raise Unpushable(f"predicate {pred!r}")
