"""Table profiling: the engine analog of DuckDB's ``SUMMARIZE``.

The reference delegates to DuckDB, so its users get ``SUMMARIZE <table>``
for free (per-column min/max/approx-distinct/avg/std/quartiles/nulls) —
a curation pipeline's first look at any new 100 TB table. This module
reproduces that surface Spark-first:

- ONE aggregation pass over the table computes every per-column stat as
  partial+merge aggregates (min/max/count exact; ``approx_count_distinct``
  is HyperLogLog++; quartiles via ``percentile_approx``'s mergeable
  t-digest-style sketch) — no per-column scans, no driver-side data.
- Only the single result row (a few values per column) reaches the
  driver; output row count = column count, independent of table size.

Output schema mirrors DuckDB ``SUMMARIZE`` column-for-column:
``column_name, column_type, min, max, approx_unique, avg, std, q25,
q50, q75, count, null_percentage`` — min/max/avg/std/quantiles as
strings (as DuckDB renders them), so profiles from either engine diff
cleanly. avg/std/quartiles are numeric-column-only (NULL otherwise);
min/max cover every orderable type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
# orderable scalar types min/max makes sense for (arrays/structs/maps
# and binary are profiled for count/nulls/distinct only)
_ORDERABLE = _NUMERIC + (
    T.StringType, T.DateType, T.TimestampType, T.TimestampNTZType, T.BooleanType,
)

_SUMMARY_SCHEMA = (
    "column_name string, column_type string, min string, max string, "
    "approx_unique long, avg string, std string, q25 string, q50 string, "
    "q75 string, count long, null_percentage double"
)


def _type_name(dt: T.DataType) -> str:
    """DuckDB-style upper-case type label from a Spark type."""
    s = dt.simpleString().upper()
    return {"LONG": "BIGINT", "SHORT": "SMALLINT", "BYTE": "TINYINT"}.get(s, s)


def summarize(
    df: DataFrame,
    cols: list[str] | None = None,
    percentile_accuracy: int = 10000,
) -> DataFrame:
    """Per-column profile of ``df`` — DuckDB ``SUMMARIZE`` parity.

    ``cols`` restricts the profile (default: every column).
    ``percentile_accuracy`` is ``percentile_approx``'s accuracy knob
    (10000 ≈ exact on small data, bounded sketch memory at 100 TB).

    One Spark job; every statistic is a partial+merge aggregate, so the
    pass parallelizes like any aggregation and ships only sketches.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    names = list(cols) if cols is not None else list(fields)
    missing = [c for c in names if c not in fields]
    if missing:
        raise KeyError(f"no such columns: {missing}")
    if not names:
        raise ValueError("no columns to summarize")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in names:
        dt = fields[c]
        col = F.col(c)
        aggs.append(F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__null_{c}"))
        aggs.append(F.approx_count_distinct(col).alias(f"__uniq_{c}"))
        if isinstance(dt, _ORDERABLE):
            aggs.append(F.min(col).cast("string").alias(f"__min_{c}"))
            aggs.append(F.max(col).cast("string").alias(f"__max_{c}"))
        if isinstance(dt, _NUMERIC):
            aggs.append(F.avg(col).cast("double").alias(f"__avg_{c}"))
            aggs.append(F.stddev_samp(col).cast("double").alias(f"__std_{c}"))
            aggs.append(
                F.percentile_approx(
                    col, [0.25, 0.5, 0.75], percentile_accuracy
                ).alias(f"__q_{c}")
            )
    row = df.agg(*aggs).first()

    n = row["__n"]
    out = []
    for c in names:
        dt = fields[c]
        nulls = row[f"__null_{c}"] or 0
        qs = row[f"__q_{c}"] if isinstance(dt, _NUMERIC) else None
        fmt = lambda v: None if v is None else repr(v) if isinstance(v, float) else str(v)
        out.append((
            c,
            _type_name(dt),
            row[f"__min_{c}"] if isinstance(dt, _ORDERABLE) else None,
            row[f"__max_{c}"] if isinstance(dt, _ORDERABLE) else None,
            int(row[f"__uniq_{c}"]),
            fmt(row[f"__avg_{c}"]) if isinstance(dt, _NUMERIC) else None,
            fmt(row[f"__std_{c}"]) if isinstance(dt, _NUMERIC) else None,
            fmt(qs[0]) if qs is not None else None,
            fmt(qs[1]) if qs is not None else None,
            fmt(qs[2]) if qs is not None else None,
            n,  # DuckDB's count is total rows (nulls included)
            round(100.0 * nulls / n, 2) if n else None,
        ))
    return df.sparkSession.createDataFrame(out, _SUMMARY_SCHEMA)
