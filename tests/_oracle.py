"""Local emulation of the driver's correctness gate: run a queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet tables, then
compare row count / column names / order-insensitive values.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


# Only these types may appear in a ledger entry's OUTPUT schema. DECIMAL is
# deliberately absent: harnesses that fetch one engine through pandas/Arrow
# materialize DECIMAL as float64 while the other side stays Decimal, so
# '36.0' vs '36.0000' hash-differ with rows+schema still matching (the
# r3/r4 q_time_rollup signature). Accumulate in DECIMAL internally, surface
# as DOUBLE (the _dsum convention in __spark_entry__.py). FLOAT is absent
# for the same reason (float32 repr drift), arrays/structs/maps/binary
# because cross-engine ordering/encoding of nested values is unhashable.
SURFACE_TYPES = {
    "boolean", "tinyint", "smallint", "int", "bigint",
    "double", "string", "date", "timestamp", "timestamp_ntz",
}


def lint_surface_schema(df):
    """Return [(col, type), ...] for output columns outside SURFACE_TYPES."""
    return [
        (f.name, f.dataType.simpleString())
        for f in df.schema.fields
        if f.dataType.simpleString() not in SURFACE_TYPES
    ]


# Arrow-side mirror of SURFACE_TYPES for the ORACLE result. The r8 blind
# spot: `fetchall()` converts DuckDB HUGEINT to Python int, so an oracle
# whose window SUM(BIGINT) escaped as HUGEINT looked identical locally
# while the driver's Arrow fetch materialized decimal128(38,0) -> Decimal
# and hash-failed (seq_packing, r8's only red row). compare() now drains
# DuckDB through fetch_arrow_table() — the driver's protocol — and lints
# the Arrow schema, so oracle-side surface drift is a local failure.
def _arrow_type_ok(t) -> bool:
    import pyarrow as pa

    return (
        pa.types.is_boolean(t)
        or pa.types.is_signed_integer(t)
        or pa.types.is_float64(t)
        or pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_date(t)
        or pa.types.is_timestamp(t)
        or pa.types.is_null(t)
    )


def lint_oracle_arrow_schema(tbl):
    """Return [(col, arrow_type), ...] for oracle columns whose Arrow
    surface type the driver's hash would materialize differently from a
    Spark {bool,int,double,string,date,timestamp} column (HUGEINT ->
    decimal128, DECIMAL, float32, unsigned ints, nested types)."""
    return [
        (f.name, str(f.type))
        for f in tbl.schema
        if not _arrow_type_ok(f.type)
    ]


def duckdb_con(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _strict_norm(v):
    """Type-tagged normalization for the STRICT gate: surface-type drift
    (Decimal vs float, int vs str) is a failure even when the tolerant
    compare — which collapses Decimal->float — would still pass. This is
    the r4 blind spot: q_time_rollup was value-exact under the tolerant
    compare for two rounds while the driver's hash (which materializes
    each engine's surface type differently) stayed red. Decimals keep
    their scale ('36.0000' != '36.0'); floats keep the tolerant 9-digit
    round (cross-engine double aggregation is round-trip-stable at that
    precision, and the 49 double-surfaced entries prove it driver-green).
    """
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, Decimal):
        return ("decimal", str(v))
    if isinstance(v, _dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, _dt.date):
        return ("date", v.isoformat())
    if isinstance(v, float):
        return ("double", "NaN" if math.isnan(v) else repr(round(v, 9)))
    if isinstance(v, int):
        return ("int", repr(v))
    if isinstance(v, (list, tuple)):
        return ("array", tuple(_strict_norm(x) for x in v))
    if isinstance(v, (bytes, bytearray)):
        return ("bytes", bytes(v).hex())
    if v is None:
        return ("null", "")
    return (type(v).__name__, str(v))


def strict_rows_key(rows):
    """Positional (no column re-sort), type-exact row key. Rows are still
    sorted (ORDER BY ties are engine-dependent) but by their full
    normalized repr, so any value or type difference surfaces."""
    normed = [tuple(_strict_norm(v) for v in r) for r in rows]
    return sorted(normed, key=str)


def _sortable(v):
    if isinstance(v, tuple):
        return (2, tuple(_sortable(x) for x in v))
    return (0, "") if v is None else (1, str(v))


def rows_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(normed, key=lambda row: tuple(_sortable(v) for v in row))


def compare(spark_df, con, sql) -> dict:
    spark_rows = spark_df.collect()
    spark_cols = spark_df.columns
    # Drain DuckDB through Arrow — the driver's fetch protocol. fetchall()
    # collapses HUGEINT->int and hides exactly the surface drift the
    # driver's hash sees (r8 seq_packing).
    tbl = con.execute(sql).fetch_arrow_table()
    duck_cols = list(tbl.schema.names)
    _py_cols = [c.to_pylist() for c in tbl.columns]
    duck_rows = list(zip(*_py_cols)) if _py_cols else []
    oracle_bad = lint_oracle_arrow_schema(tbl)
    out = {
        "rows_spark": len(spark_rows),
        "rows_duck": len(duck_rows),
        "cols_spark": list(spark_cols),
        "cols_duck": list(duck_cols),
    }
    out["count_match"] = out["rows_spark"] == out["rows_duck"]
    # Exact POSITIONAL column order, not sorted names: the driver's value
    # hash is positional, so order drift is a real failure (r3 q_time_rollup).
    out["cols_match"] = out["cols_spark"] == out["cols_duck"]
    if not (out["count_match"] and out["cols_match"]):
        out["value_match"] = False
        return out
    a = rows_key([tuple(r) for r in spark_rows], spark_cols)
    b = rows_key(duck_rows, duck_cols)
    out["value_match"] = a == b
    if not out["value_match"]:
        diffs = [(x, y) for x, y in zip(a, b) if x != y]
        out["first_diffs"] = diffs[:3]
    sa = strict_rows_key([tuple(r) for r in spark_rows])
    sb = strict_rows_key(duck_rows)
    out["strict_match"] = sa == sb and not oracle_bad
    if oracle_bad:
        out["oracle_bad_types"] = oracle_bad
    if out["value_match"] and not out["strict_match"]:
        out["first_diffs"] = [(x, y) for x, y in zip(sa, sb) if x != y][:3]
    return out


def check_all(sf_dir: str, only: list[str] | None = None, spark=None) -> dict:
    import __spark_entry__ as entrymod

    if spark is None:
        from duckdb_mongo_spark.session import get_spark

        spark = get_spark()
    con = duckdb_con(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                results[name] = compare(df, con, oracles[name])
            else:
                results[name] = {"rows_spark": df.count(), "rows_only": True}
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": f"{type(e).__name__}: {e}"}
    return results


if __name__ == "__main__":
    import json
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    res = check_all(sf, only)
    ok = 0
    for name, r in res.items():
        status = (
            "OK" if r.get("value_match") and r.get("strict_match")
            else ("ROWS_ONLY" if r.get("rows_only") else "FAIL")
        )
        ok += status == "OK"
        line = {"q": name, "status": status}
        if status == "FAIL":
            line.update({k: v for k, v in r.items() if k != "first_diffs"})
            if "first_diffs" in r:
                line["first_diffs"] = str(r["first_diffs"])[:400]
        print(json.dumps(line, default=str))
    print(f"## {ok}/{len(res)} value-matched")
