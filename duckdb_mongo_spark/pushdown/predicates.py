"""Predicate & scalar-expression AST for the pushdown compiler.

Plays the role DuckDB's ``TableFilter`` / ``Expression`` trees play for
the reference compiler (src/mongo_filter_pushdown.cpp consumes
TableFilters; src/mongo_expr_pushdown.cpp consumes bound expressions).
Users build predicates with the tiny ``C("col")`` DSL; the engine's query
API also constructs them internally.

Example::

    from duckdb_mongo_spark.pushdown import C
    pred = (C("age") > 28) & C("address.city").isin("NYC", "SF")
"""

from __future__ import annotations

from dataclasses import dataclass


class Expr:
    """Base scalar expression."""

    # comparisons build predicates
    def __eq__(self, other):  # type: ignore[override]
        return Cmp("=", self, _wrap(other))

    def __ne__(self, other):  # type: ignore[override]
        return Cmp("!=", self, _wrap(other))

    def __lt__(self, other):
        return Cmp("<", self, _wrap(other))

    def __le__(self, other):
        return Cmp("<=", self, _wrap(other))

    def __gt__(self, other):
        return Cmp(">", self, _wrap(other))

    def __ge__(self, other):
        return Cmp(">=", self, _wrap(other))

    # arithmetic builds expressions
    def __add__(self, other):
        return BinOp("+", self, _wrap(other))

    def __radd__(self, other):
        return BinOp("+", _wrap(other), self)

    def __sub__(self, other):
        return BinOp("-", self, _wrap(other))

    def __rsub__(self, other):
        return BinOp("-", _wrap(other), self)

    def __mul__(self, other):
        return BinOp("*", self, _wrap(other))

    def __rmul__(self, other):
        return BinOp("*", _wrap(other), self)

    def __truediv__(self, other):
        return BinOp("/", self, _wrap(other))

    def __mod__(self, other):
        return BinOp("%", self, _wrap(other))

    def __hash__(self):
        return hash(repr(self))

    # string functions the reference pushes (A13/A14) + common extras
    def length(self):
        return Func("length", [self])

    def substring(self, start, length):
        return Func("substring", [self, _wrap(start), _wrap(length)])

    def lower(self):
        return Func("lower", [self])

    def upper(self):
        return Func("upper", [self])

    def trim(self):
        return Func("trim", [self])

    def ltrim(self):
        return Func("ltrim", [self])

    def rtrim(self):
        return Func("rtrim", [self])

    # date-part extractors (null-propagating, like year/month/day)
    def hour(self):
        return Func("hour", [self])

    def minute(self):
        return Func("minute", [self])

    def second(self):
        return Func("second", [self])

    def day_of_week(self):
        return Func("dayofweek", [self])

    def day_of_year(self):
        return Func("dayofyear", [self])

    def week_of_year(self):
        return Func("weekofyear", [self])

    def cast(self, type_name: str):
        return Cast(self, type_name.upper())

    # predicate helpers
    def isin(self, *values):
        vals = values[0] if len(values) == 1 and isinstance(values[0], (list, tuple, set)) else values
        return In(self, [_wrap(v) for v in vals])

    def is_null(self):
        return IsNull(self)

    def is_not_null(self):
        return IsNotNull(self)

    def regex(self, pattern: str):
        return Regex(self, pattern)

    # geo query predicates (pass-through to the source's $match — the
    # interpreter implements local semantics in mql/match.py, a remote
    # profile ships them verbatim so the server's geo index serves them)
    def geo_within(self, shape: dict):
        """``{col: {$geoWithin: shape}}`` — ``shape`` is the raw MQL body
        ({"$geometry": ...} / {"$box": ...} / {"$center": ...} /
        {"$centerSphere": ...} / {"$polygon": ...})."""
        return Geo(self, "$geoWithin", dict(shape))

    def geo_intersects(self, geometry: dict):
        """``{col: {$geoIntersects: {$geometry: g}}}`` — accepts either a
        bare GeoJSON geometry or a pre-wrapped {"$geometry": ...} body."""
        body = dict(geometry)
        if "$geometry" not in body:
            body = {"$geometry": body}
        return Geo(self, "$geoIntersects", body)

    def near(self, point, min_distance=None, max_distance=None,
             spherical: bool = False):
        """``$near`` / ``$nearSphere`` with optional distance bounds.
        GeoJSON ``point`` ({"type": "Point", ...}) nests the bounds inside
        the operator body (meters); legacy ``[x, y]`` coordinates put them
        as sibling operators (legacy units: degrees / radians)."""
        op = "$nearSphere" if spherical else "$near"
        if isinstance(point, dict):
            body = {"$geometry": dict(point)} if "$geometry" not in point \
                else dict(point)
            if min_distance is not None:
                body["$minDistance"] = min_distance
            if max_distance is not None:
                body["$maxDistance"] = max_distance
            return Geo(self, op, body)
        siblings = {}
        if min_distance is not None:
            siblings["$minDistance"] = min_distance
        if max_distance is not None:
            siblings["$maxDistance"] = max_distance
        return Geo(self, op, list(point), siblings)


@dataclass(repr=True, eq=False)
class Col(Expr):
    name: str  # dotted path allowed ("address.city")


@dataclass(repr=True, eq=False)
class Lit(Expr):
    value: object


@dataclass(repr=True, eq=False)
class BinOp(Expr):
    op: str
    left: Expr
    right: Expr


@dataclass(repr=True, eq=False)
class Func(Expr):
    name: str
    args: list


@dataclass(repr=True, eq=False)
class Cast(Expr):
    operand: Expr
    type_name: str


class Pred:
    """Base predicate."""

    def __and__(self, other):
        return And([self, other])

    def __or__(self, other):
        return Or([self, other])

    def __invert__(self):
        return Not(self)


@dataclass(repr=True)
class Cmp(Pred):
    op: str  # = != < <= > >=
    left: Expr
    right: Expr


@dataclass(repr=True)
class In(Pred):
    operand: Expr
    values: list


@dataclass(repr=True)
class IsNull(Pred):
    operand: Expr


@dataclass(repr=True)
class IsNotNull(Pred):
    operand: Expr


@dataclass(repr=True)
class Regex(Pred):
    operand: Expr
    pattern: str


@dataclass(repr=True)
class Geo(Pred):
    """Geo query predicate — always source-evaluated (no Spark residual
    form exists): ``{col: {op: body, **siblings}}``."""

    operand: Expr
    op: str        # $geoWithin | $geoIntersects | $near | $nearSphere
    body: object   # operator body (dict) or legacy [x, y] coordinates
    siblings: dict = None  # legacy-form sibling bounds ($minDistance/...)


@dataclass(repr=True)
class And(Pred):
    children: list


@dataclass(repr=True)
class Or(Pred):
    children: list


@dataclass(repr=True)
class Not(Pred):
    child: Pred


def _wrap(v) -> Expr:
    return v if isinstance(v, Expr) else Lit(v)


def col(name: str) -> Col:
    return Col(name)


def lit(v) -> Lit:
    return Lit(v)


C = col
