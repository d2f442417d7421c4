"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 shape) at sf0.001.
``queries()`` exposes one callable per implemented operator from
SURVEY.md §2 (engine pushdown paths, Spark SQL surface, NEW
dedup/similarity/text/multimodal operators). ``oracle_sql()`` gives the
DuckDB-equivalent SQL for the driver's correctness gate.

Oracle-parity design notes:
- money/quantity aggregates go through ``CAST(SUM(CAST(x AS
  DECIMAL(18,s))) AS DOUBLE)`` — decimal sums are exact, so Spark and
  DuckDB agree bit-for-bit regardless of summation order;
- every hash is md5-based (portable across engines);
- time arithmetic uses integer microseconds (``unix_micros`` /
  ``epoch_us``);
- ranked outputs break ties on a key column so LIMIT sets are stable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def _nanos_ts_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark's vectorized
    reader rejects those, so they need the nanosAsLong fallback. Probed
    driver-side from the footer (no Spark job, no failed-stage noise)."""
    try:
        import pyarrow.dataset as pads

        schema = pads.dataset(path, format="parquet").schema
        return [
            f.name for f in schema
            if str(f.type).startswith("timestamp[ns")
        ]
    except Exception:
        return []


def _min_parallelism(spark: SparkSession) -> int:
    import os

    return int(os.environ.get("SPARK_GRAFT_CPUS", 0)) or spark.sparkContext.defaultParallelism


def _parallelize(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """The driver's toy parquet files hold ONE row group, so Spark's
    byte-range splitting yields a single scan task regardless of
    maxPartitionBytes. Measured here, forcing a round-robin repartition
    helps only isolated heavy aggregations (q1: 3.9s→1.6s) and HURTS
    join-heavy queries (extra exchange on top of the join shuffles,
    q5/q18 +~1s each), so scans are left as the source provides them —
    at production scale (many row groups / files) the source yields
    natural splits and Catalyst/AQE handle the rest."""
    return df


_TABLE_CACHE: dict[tuple, DataFrame] = {}


def _load_table(spark: SparkSession, sf_dir: str, t: str) -> DataFrame:
    # reuse the analyzed DataFrame per (session, dir, table): repeated
    # spark.read.parquet + footer probes are pure planning overhead
    key = (id(spark), sf_dir, t)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    df = _load_table_uncached(spark, sf_dir, t)
    _TABLE_CACHE[key] = df
    return df


def _tz_normalize(df: DataFrame) -> DataFrame:
    """Cast TIMESTAMP_NTZ columns to TIMESTAMP (LTZ).

    Parquet timestamps annotated isAdjustedToUTC=false (pandas/pyarrow
    writers' default) are inferred as TIMESTAMP_NTZ by Spark's
    inferTimestampNTZ (on by default since 3.4) — but chrono functions
    like unix_micros() accept only TIMESTAMP, and the whole query
    surface + DuckDB oracle treat these columns as instants. Under the
    UTC session timezone the NTZ→LTZ cast is value-identical to how
    DuckDB reads the same file (naive wall time == UTC instant)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampNTZType

    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def _load_table_uncached(spark: SparkSession, sf_dir: str, t: str) -> DataFrame:
    path = f"{sf_dir}/{t}.parquet"
    nanos = _nanos_ts_cols(path)
    if not nanos:
        return _parallelize(spark, _tz_normalize(spark.read.parquet(path)), path)
    # Spark can't read parquet TIMESTAMP(NANOS) (events.ts): read nanos as
    # long and truncate to micros (exactly DuckDB's read behavior).
    from pyspark.sql import functions as F

    prior = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        for field in df.schema.fields:
            if field.name in nanos and field.dataType.simpleString() == "bigint":
                df = df.withColumn(
                    field.name, F.timestamp_micros(F.expr(f"{field.name} div 1000"))
                )
        # a file can mix NANOS columns with micros/NTZ ones — normalize both
        return _parallelize(spark, _tz_normalize(df), path)
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prior)


_VIEW_CURRENT: dict[tuple, str] = {}


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    # register each (session, table) view once per sf_dir — repeated
    # createOrReplaceTempView calls are py4j/catalog round trips that add
    # up across a query suite (the reference's ATTACH view cache analog,
    # src/mongo_catalog.cpp:418-486). Keyed on the dir CURRENTLY backing
    # the view so switching sf_dir re-registers correctly.
    for t in tables:
        key = (id(spark), t)
        if _VIEW_CURRENT.get(key) == sf_dir and spark.catalog.tableExists(t):
            # tableExists guards against external dropTempView between
            # invocations (one cheap catalog probe vs re-registration)
            continue
        _load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        _VIEW_CURRENT[key] = sf_dir


def _register(name: str, fn, oracle: str | None = None) -> None:
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


def _sql_query(name: str, tables: list[str], spark_sql: str, oracle: str | None = None) -> None:
    """Register a query given as SQL (oracle defaults to the same text —
    most of the surface is expressed in the common ANSI subset)."""

    def fn(spark: SparkSession, sf_dir: str, _sql=spark_sql, _tables=tuple(tables)) -> DataFrame:
        _views(spark, sf_dir, *_tables)
        return spark.sql(_sql)

    _register(name, fn, oracle if oracle is not None else spark_sql)


def _dsum(expr: str, scale: int = 4) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


# ===========================================================================
# A. TPC-H-shape relational surface (SURVEY §2B — Spark SQL built-ins)
# ===========================================================================

# q1 money math: TPC-H columns are cent/percent-valued, so per-row
# arithmetic runs on scaled BIGINTs (exact, codegen-friendly). r6: each
# ACCUMULATOR uses the cheapest type that is provably exact at target
# scale — BIGINT sums for q100/ep100/d100 (≤1e7 per row: exact to
# ~9e11 rows per group) and for ep100*(100-d100) (≤1e9 per row: exact
# to ~9e9 rows per group, i.e. beyond sf1000); only sum_charge
# (~1e11 per row) keeps the DECIMAL(38,0) accumulator, whose exactness
# is unbounded. Measured at sf1: 0.76 → 0.64 s median vs the
# all-DECIMAL(38,0) form, values bit-identical on both engines.
_Q1_INTS = """
        CAST(ROUND(l_quantity * 100) AS BIGINT) AS q100,
        CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS ep100,
        CAST(ROUND(l_discount * 100) AS BIGINT) AS d100,
        CAST(ROUND(l_tax * 100) AS BIGINT) AS t100
"""

_sql_query(
    "q1_pricing_summary",
    ["lineitem"],
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(q100) AS DOUBLE) / 100 AS sum_qty,
           CAST(SUM(ep100) AS DOUBLE) / 100 AS sum_base_price,
           CAST(SUM(ep100 * (100 - d100)) AS DOUBLE) / 1e4 AS sum_disc_price,
           CAST(SUM(CAST(ep100 * (100 - d100) * (100 + t100) AS DECIMAL(38,0))) AS DOUBLE) / 1e6
               AS sum_charge,
           CAST(SUM(q100) AS DOUBLE) / 100 / COUNT(*) AS avg_qty,
           CAST(SUM(ep100) AS DOUBLE) / 100 / COUNT(*) AS avg_price,
           CAST(SUM(d100) AS DOUBLE) / 100 / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM (
        SELECT l_returnflag, l_linestatus, {_Q1_INTS}
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    ) t
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)

_sql_query(
    "q3_shipping_priority",
    ["customer", "orders", "lineitem"],
    f"""
    SELECT o.o_orderkey, {_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
)

_sql_query(
    "q5_local_supplier_volume",
    ["customer", "orders", "lineitem", "supplier", "nation", "region"],
    f"""
    SELECT n.n_name, {_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
)

_sql_query(
    "q6_forecast_revenue",
    ["lineitem"],
    f"""
    SELECT {_dsum('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)

_sql_query(
    "q10_returned_items",
    ["customer", "orders", "lineitem", "nation"],
    f"""
    SELECT c.c_custkey, c.c_name, {_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)

# r6: the former q4_order_priority_semi and q_anti_join_inactive entries
# folded into one tagged union (both shapes still oracle-proven; the
# freed slot holds sketch_count_min) — semi join via correlated EXISTS
# (TPC-H q4, reference test/sql/tpch/tpch.test) and anti join via NOT
# EXISTS, each planned independently by Catalyst under the UNION ALL.
_sql_query(
    "q_semi_anti_join",
    ["orders", "lineitem", "customer"],
    """
    SELECT 'semi' AS shape, o_orderpriority AS grp, COUNT(*) AS n
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    UNION ALL
    SELECT 'anti' AS shape, c.c_mktsegment AS grp, COUNT(*) AS n
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY c.c_mktsegment
    ORDER BY shape, grp
    """,
)

_sql_query(
    "q18_large_orders",
    ["customer", "orders", "lineitem"],
    """
    WITH big AS (
      SELECT l_orderkey, SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS q100
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > 15000
    )
    SELECT c.c_custkey, o.o_orderkey, CAST(b.q100 AS DOUBLE) / 100 AS total_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY total_qty DESC, o.o_orderkey
    LIMIT 20
    """,
    # pre-aggregate BEFORE the joins: lineitem partial-aggregates on its
    # scan partitioning and only the few HAVING survivors join (both
    # joins broadcast) — the joined-then-grouped form shuffles the full
    # joined fact width. Same rows/values (orderkey→custkey is 1:1);
    # measured 1.34→0.89 s at sf0.1, 1.73→1.35 s warm at sf1.
    # r6: the HAVING accumulator moved from DECIMAL(18,2) to BIGINT
    # cents (quantity <= 50 -> 5000 per row: exact to ~1.8e15 rows per
    # group; both engines compute the identical double product and
    # half-up round) — 1.34 -> 1.06 s median at sf1.
)

# q19 (brand revenue) + q14 (promo revenue share) in ONE tagged-union
# ledger entry (r7 fold — the q_semi_anti_join template — freeing a slot
# for span_dedup): both lineitem x part shapes stay driver-oracle-proven
_sql_query(
    "q_promo_brand_revenue",
    ["lineitem", "part"],
    f"""
    SELECT 'q19' AS shape, p.p_brand AS grp, COUNT(*) AS n,
           {_dsum('l.l_extendedprice', 2)} AS total
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_type = 'PROMO' AND l.l_quantity >= 10
    GROUP BY p.p_brand
    UNION ALL
    SELECT 'q14' AS shape, 'promo_pct' AS grp, COUNT(*) AS n,
           100.0 * {_dsum('promo', 6)} / {_dsum('volume', 6)} AS total
    FROM (
        SELECT l.l_extendedprice * (1 - l.l_discount) AS volume,
               CASE WHEN p.p_type LIKE 'PROMO%'
                    THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END AS promo
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
          AND l.l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    ) t
    ORDER BY shape, grp
    """,
)

# ROLLUP and CUBE grouping sets in ONE ledger entry (merged from the r2
# q_rollup_lineitem / q_cube_agg entries to free a slot for the r3
# temporal operators) — both grouping extensions plus GROUPING() markers
# stay driver-oracle-proven
_sql_query(
    "q_rollup_lineitem",
    ["lineitem"],
    f"""
    SELECT 'rollup' AS gset, l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls,
           {_dsum('l_quantity', 2)} AS sum_qty, COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'cube' AS gset, l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls,
           {_dsum('l_quantity', 2)} AS sum_qty, COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY gset, g_rf, g_ls, l_returnflag, l_linestatus
    """,
)

# COUNT(DISTINCT) + exact percentiles in one grouped scan (merged from
# the r1 q_count_distinct / q_percentiles_order_value entries to keep
# every oracle-backed entry inside the driver's 50-entry ledger window)
_sql_query(
    "q_count_distinct",
    ["customer"],
    """
    SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations, COUNT(*) AS n_customers,
           ROUND(percentile(c_acctbal, 0.5), 4) AS median_bal,
           ROUND(percentile(c_acctbal, 0.9), 4) AS p90_bal,
           ROUND(MIN(c_acctbal), 4) AS min_bal,
           ROUND(MAX(c_acctbal), 4) AS max_bal
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    oracle="""
    SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations, COUNT(*) AS n_customers,
           ROUND(quantile_cont(c_acctbal, 0.5), 4) AS median_bal,
           ROUND(quantile_cont(c_acctbal, 0.9), 4) AS p90_bal,
           ROUND(MIN(c_acctbal), 4) AS min_bal,
           ROUND(MAX(c_acctbal), 4) AS max_bal
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)

# INTERSECT / EXCEPT / UNION ALL in one entry (merged from the r1
# q_intersect_nations / q_except_nations / q_union_all_activity)
_sql_query(
    "q_set_ops",
    ["customer", "supplier", "orders", "events"],
    """
    SELECT 'intersect' AS op, k FROM (
        SELECT c_nationkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT c_nationkey AS k FROM customer WHERE c_mktsegment = 'MACHINERY')
    UNION ALL
    SELECT 'except' AS op, k FROM (
        SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000.0
        EXCEPT
        SELECT s_nationkey AS k FROM supplier WHERE s_acctbal > 5000.0)
    UNION ALL
    SELECT concat('union_', kind) AS op, n AS k FROM (
        SELECT kind, COUNT(*) AS n FROM (
            SELECT 'order' AS kind FROM orders
            UNION ALL
            SELECT 'event' AS kind FROM events) u
        GROUP BY kind)
    ORDER BY op, k
    """,
)

_sql_query(
    "q_cte_above_avg_balance",
    ["customer"],
    """
    WITH nation_stats AS (
        SELECT c_nationkey,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
        FROM customer GROUP BY c_nationkey
    )
    SELECT c.c_custkey, c.c_name, c.c_acctbal
    FROM customer c JOIN nation_stats ns ON c.c_nationkey = ns.c_nationkey
    WHERE c.c_acctbal > 2 * ns.avg_bal
    ORDER BY c.c_custkey
    """,
)

# conditional pivot + the scalar-function surface in ONE entry (r8:
# q_scalar_functions folded in as a tagged union to free a ledger slot
# for doc_chunking — the string/math function coverage stays
# driver-oracle-proven through the s*/i*/d1 slots)
_PIVOT_SCALAR_SQL = """
    SELECT 'pivot' AS shape, CAST(-1 AS BIGINT) AS k,
           l_returnflag AS s1, '' AS s2, '' AS s3, '' AS s4,
           '' AS s5, '' AS s6, '' AS s7,
           n_open AS i1, n_filled AS i2,
           CAST(0 AS BIGINT) AS i3, CAST(0 AS BIGINT) AS i4,
           CAST(0 AS BIGINT) AS i5, CAST(0 AS BIGINT) AS i6,
           CAST(0 AS BIGINT) AS i7,
           CAST(0.0 AS DOUBLE) AS d1
    FROM (SELECT l_returnflag,
                 COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS n_open,
                 COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS n_filled
          FROM lineitem
          GROUP BY l_returnflag) p
    UNION ALL
    SELECT 'scalar' AS shape, CAST(n_nationkey AS BIGINT) AS k,
           upper(n_name) AS s1, lower(n_name) AS s2,
           substring(n_name, 2, 3) AS s3,
           concat(n_name, '-', CAST(n_regionkey AS STRING)) AS s4,
           replace(n_name, 'A', '@') AS s5,
           lpad(n_name, 12, '.') AS s6,
           reverse(n_name) AS s7,
           CAST(length(n_name) AS BIGINT) AS i1,
           CAST(levenshtein(n_name, 'CANADA') AS BIGINT) AS i2,
           CAST(abs(n_regionkey - 2) AS BIGINT) AS i3,
           CAST(floor(n_nationkey / 4.0) AS BIGINT) AS i4,
           CAST(ceil(n_nationkey / 4.0) AS BIGINT) AS i5,
           CAST(power(2, n_regionkey) AS BIGINT) AS i6,
           CAST(n_nationkey % 7 AS BIGINT) AS i7,
           round(sqrt(n_nationkey), 4) AS d1
    FROM nation
    ORDER BY shape, k, s1
"""

_sql_query(
    "q_pivot_conditional",
    ["lineitem", "nation"],
    _PIVOT_SCALAR_SQL,
    # only dialect delta: Spark spells the cast type STRING, DuckDB VARCHAR
    oracle=_PIVOT_SCALAR_SQL.replace("AS STRING", "AS VARCHAR"),
)

_sql_query(
    "q_unnest_word_counts",
    ["documents"],
    """
    SELECT word, COUNT(*) AS n
    FROM (SELECT explode(split(lower(text), ' ')) AS word FROM documents) t
    WHERE word <> ''
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 20
    """,
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents) t
    WHERE word <> ''
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 20
    """,
)


_sql_query(
    "q_sessionize",
    ["events"],
    """
    WITH g AS (
        SELECT user_id, event_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR unix_micros(ts) - unix_micros(lag(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
    FROM g GROUP BY user_id ORDER BY user_id
    """,
    oracle="""
    WITH g AS (
        SELECT user_id, event_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
    FROM g GROUP BY user_id ORDER BY user_id
    """,
)

_sql_query(
    "q7_volume_shipping",
    ["supplier", "lineitem", "orders", "customer", "nation"],
    f"""
    SELECT supp_nation, cust_nation, l_year, {_dsum('volume', 6)} AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l.l_shipdate) AS l_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_5' AND n2.n_name = 'NATION_7')
            OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_5'))
          AND l.l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                               AND TIMESTAMP '1996-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)

_sql_query(
    "q8_market_share",
    ["part", "supplier", "lineitem", "orders", "customer", "nation", "region"],
    f"""
    SELECT o_year,
           {_dsum('brazil_volume', 6)} / {_dsum('volume', 6)} AS mkt_share
    FROM (
        SELECT year(o.o_orderdate) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               CASE WHEN n2.n_name = 'NATION_2'
                    THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END
                   AS brazil_volume
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        JOIN region r ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'AMERICA'
          AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                                AND TIMESTAMP '1996-12-31 00:00:00'
          AND p.p_type LIKE '%NOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)

_sql_query(
    "q13_customer_distribution",
    ["customer", "orders"],
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COALESCE(oc.n, 0) AS c_count
        FROM customer c
        LEFT OUTER JOIN (
            SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey
        ) oc ON c.c_custkey = oc.o_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    # r6: orders pre-aggregates to per-custkey counts BEFORE the outer
    # join (1.5M rows -> ~100k partial-combined), so the join carries
    # count rows instead of the full orders fact — the q18 shape again;
    # COALESCE(n, 0) keeps the no-orders customers that
    # COUNT(o_orderkey) gave 0. Measured 0.96 -> 0.84 s at sf1.
)

_sql_query(
    "q15_top_supplier",
    ["supplier", "lineitem"],
    f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {_dsum('l_extendedprice * (1 - l_discount)', 6)} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)

_sql_query(
    "q17_small_quantity_revenue",
    ["lineitem", "part"],
    f"""
    SELECT {_dsum('l.l_extendedprice', 2)} / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < (
          SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = p.p_partkey)
    """,
)

_sql_query(
    "q9_product_profit",
    ["part", "supplier", "lineitem", "orders", "nation"],
    f"""
    SELECT nation, o_year, {_dsum('amount', 6)} AS sum_profit
    FROM (
        SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS amount
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)

_sql_query(
    "q21_waiting_orders",
    ["supplier", "lineitem", "orders", "nation"],
    """
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      AND n.n_name = 'NATION_3'
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)

_sql_query(
    "q22_global_sales_opportunity",
    ["customer", "orders"],
    f"""
    SELECT cntrycode, COUNT(*) AS numcust, {_dsum('c_acctbal', 2)} AS totacctbal
    FROM (
        SELECT c_custkey % 10 AS cntrycode, c_acctbal
        FROM customer c
        WHERE c_custkey % 10 IN (1, 2, 3, 4, 5)
          AND c_acctbal > (
              SELECT {_dsum('c_acctbal', 2)} / COUNT(*)
              FROM customer
              WHERE c_acctbal > 0.0 AND c_custkey % 10 IN (1, 2, 3, 4, 5))
          AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    ) custsale
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)

# ONE window entry for the whole analytic-function surface (r8: the
# r1-merged framed AVG + lag/lead + first/last_value scan now also
# carries the per-partition top-k ROW_NUMBER shape that had its own
# slot, freeing one for seq_packing): a tagged union over generic
# (k1, k2, d1, i1..i4) slots — each branch is one shuffle on its
# partition key, the plan shape you want at scale
_WINDOW_ANALYTICS_SQL = """
    SELECT 'analytics' AS shape, user_id AS k1, event_id AS k2,
           CAST(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS d1,
           unix_micros(ts) - unix_micros(lag(ts) OVER w) AS i1,
           CAST(CASE WHEN lead(event_type) OVER w = event_type
                     THEN 1 ELSE 0 END AS BIGINT) AS i2,
           first_value(event_id) OVER w AS i3,
           last_value(event_id) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS i4
    FROM events
    WHERE user_id <= 50
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    UNION ALL
    SELECT 'topk' AS shape, o_custkey AS k1, o_orderkey AS k2,
           CAST(o_totalprice AS DOUBLE) AS d1,
           CAST(rn AS BIGINT) AS i1, CAST(0 AS BIGINT) AS i2,
           CAST(0 AS BIGINT) AS i3, CAST(0 AS BIGINT) AS i4
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) t
    WHERE rn <= 3 AND o_custkey <= 200
    ORDER BY shape, k1, k2
"""

_sql_query(
    "q_window_analytics",
    ["events", "orders"],
    _WINDOW_ANALYTICS_SQL,
    oracle=_WINDOW_ANALYTICS_SQL.replace("unix_micros(", "epoch_us("),
)

_sql_query(
    "q_full_outer_nation_activity",
    ["customer", "supplier", "nation"],
    """
    SELECT COALESCE(c.nk, s.nk) AS nk, n.n_name,
           COALESCE(c.n_cust, 0) AS n_cust, COALESCE(s.n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
          FROM customer GROUP BY c_nationkey) c
    FULL OUTER JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
                     FROM supplier GROUP BY s_nationkey) s
      ON c.nk = s.nk
    JOIN nation n ON n.n_nationkey = COALESCE(c.nk, s.nk)
    ORDER BY nk
    """,
)

# ===========================================================================
# B. Engine pushdown paths (SURVEY §2A — the federation layer itself,
#    running over the parquet tables exposed as a document backend)
# ===========================================================================


def _pq_backend(sf_dir: str, id_field: str | None = None):
    from duckdb_mongo_spark.backends import ParquetBackend

    return ParquetBackend(sf_dir, db_name="main", id_field=id_field)


_SCAN_CACHE: dict[tuple, tuple] = {}


def _mongo_frame(spark, sf_dir: str, coll: str, id_field: str | None = None,
                 filter: dict | None = None, pipeline: list | None = None,
                 direct: bool | None = None):
    """mongo_scan with the backend + resolved schema cached per
    (sf_dir, coll) — the reference re-infers per DIRECT mongo_scan call
    (README.md:566) but caches schema entries under ATTACH
    (src/mongo_catalog.cpp:418-486); the entries model the attached-
    catalog usage pattern, so schema inference runs once per collection
    instead of once per query execution."""
    from duckdb_mongo_spark.frame import MongoFrame
    from duckdb_mongo_spark.schema.infer import resolve_schema

    key = (sf_dir, coll, id_field)
    got = _SCAN_CACHE.get(key)
    if got is None:
        be = _pq_backend(sf_dir, id_field=id_field)
        got = (be, resolve_schema(be, "main", coll))
        _SCAN_CACHE[key] = got
    be, schema = got
    return MongoFrame(
        spark=spark, backend=be, db="main", coll=coll, schema=schema,
        manual_filter=filter, manual_pipeline=pipeline, direct=direct,
    )


def _mongo_filter_projection(spark, sf_dir):
    from duckdb_mongo_spark.pushdown import C

    # direct=False pins the partitioned Python-DataSource scan so the
    # driver oracle keeps proving A2/A3/A4 (partitioned arrow execution)
    # end-to-end; smaller entries use the direct-materialization path
    mf = _mongo_frame(spark, sf_dir, "orders", direct=False)
    return (
        mf.filter((C("o_totalprice") > 400000.0) & C("o_orderstatus").isin("O", "F"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        .df()
    )


_register(
    "mongo_filter_projection",
    _mongo_filter_projection,
    """
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
    FROM orders
    WHERE o_totalprice > 400000.0 AND o_orderstatus IN ('O', 'F')
    """,
)


def _mongo_expr_pushdown(spark, sf_dir):
    from duckdb_mongo_spark.pushdown import C

    mf = _mongo_frame(spark, sf_dir, "customer")
    return (
        mf.filter(C("c_mktsegment").substring(1, 4) == "AUTO")
        .select("c_custkey", "c_mktsegment")
        .df()
    )


_register(
    "mongo_expr_pushdown",
    _mongo_expr_pushdown,
    "SELECT c_custkey, c_mktsegment FROM customer WHERE substring(c_mktsegment, 1, 4) = 'AUTO'",
)


def _mongo_agg_pushdown(spark, sf_dir):
    from pyspark.sql import functions as F

    mf = _mongo_frame(spark, sf_dir, "orders")
    # AVG of doubles is summation-order-dependent at the last ulp, and the
    # engine legitimately varies partitioning (direct materialization vs
    # 8/32-way scans) — round to 4 decimals on BOTH sides so the oracle
    # hash is partitioning-independent (min/max/count are exact as-is)
    return (
        mf.group_by("o_orderstatus")
        .agg(
            ("count_star", None, "n_orders"),
            ("min", "o_totalprice", "min_price"),
            ("max", "o_totalprice", "max_price"),
            ("avg", "o_totalprice", "avg_price"),
        )
        .df()
        .withColumn("avg_price", F.round("avg_price", 4))
    )


_register(
    "mongo_agg_pushdown",
    _mongo_agg_pushdown,
    """
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
           ROUND(AVG(o_totalprice), 4) AS avg_price
    FROM orders GROUP BY o_orderstatus
    """,
)


def _mongo_count_pushdown(spark, sf_dir):
    """A18 + A19 in one ledger entry (slot freed for the r3 temporal
    operators): ungrouped COUNT(*) pushed as `$count` on supplier,
    grouped COUNT(col)/SUM pushed as `$group` with the `$cond` non-null
    counter on customer; the 1-row count frame is cross-joined onto the
    grouped result so both pushdown paths land in one oracle-checked
    result set."""
    from pyspark.sql import functions as F

    total = _mongo_frame(spark, sf_dir, "supplier").count_rows().df()
    grouped = (
        _mongo_frame(spark, sf_dir, "customer")
        .group_by("c_mktsegment")
        .agg(("count", "c_acctbal", "n_bal"), ("sum", "c_acctbal", "total_bal"))
        .df()
        # double SUM rounded on both sides: partitioning-independent hash
        # (see mongo_agg_pushdown)
        .withColumn("total_bal", F.round("total_bal", 4))
    )
    return grouped.crossJoin(total).orderBy("c_mktsegment")


_register(
    "mongo_count_pushdown",
    _mongo_count_pushdown,
    """
    SELECT c_mktsegment, COUNT(c_acctbal) AS n_bal,
           ROUND(SUM(c_acctbal), 4) AS total_bal,
           (SELECT COUNT(*) FROM supplier) AS count
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)


def _mongo_topn_pushdown(spark, sf_dir):

    mf = _mongo_frame(spark, sf_dir, "orders", id_field="o_orderkey")
    return mf.order_by_id(descending=True).limit(10).select("_id", "o_totalprice").df()


_register(
    "mongo_topn_pushdown",
    _mongo_topn_pushdown,
    "SELECT o_orderkey AS _id, o_totalprice FROM orders ORDER BY o_orderkey DESC LIMIT 10",
)


def _mongo_or_filter(spark, sf_dir):
    """A9/A7 + A23 merged (r4, frees the ledger slot used by
    mongo_pipeline_facet): tagged union of two find-path filter shapes —
    `or`: OR of comparisons + IS NOT NULL pushed as one $or; `manual`:
    raw MQL `filter :=` parameter merged with the WHERE clause. Both
    oracles are UNION ALL'd with the same tags, so each shape must still
    value-match DuckDB independently (the sim_cosine_topk merge
    precedent)."""
    from pyspark.sql import functions as F

    from duckdb_mongo_spark.pushdown import C

    mf = _mongo_frame(spark, sf_dir, "orders")
    pred = ((C("o_totalprice") > 450000.0) | (C("o_orderstatus") == "P")) \
        & C("o_orderpriority").is_not_null()
    or_df = (
        mf.filter(pred)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .df()
        .withColumn("shape", F.lit("or"))
    )
    manual = _mongo_frame(
        spark, sf_dir, "orders",
        filter={"o_orderstatus": {"$in": ["F", "P"]}},
    )
    manual_df = (
        manual.filter(C("o_totalprice") > 400000.0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .df()
        .withColumn("shape", F.lit("manual"))
    )
    return or_df.unionByName(manual_df)


_register(
    "mongo_or_filter",
    _mongo_or_filter,
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice, 'or' AS shape
    FROM orders
    WHERE (o_totalprice > 450000.0 OR o_orderstatus = 'P')
      AND o_orderpriority IS NOT NULL
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_totalprice, 'manual' AS shape
    FROM orders
    WHERE o_orderstatus IN ('F', 'P') AND o_totalprice > 400000.0
    """,
)


def _mongo_pipeline_facet(spark, sf_dir):
    """A24 manual `pipeline :=` running the r3/r4 interpreter stages as a
    driver-oracle entry: $facet with $sortByCount and $bucket
    sub-pipelines, flattened to rows inside the pipeline itself via
    $project($concatArrays($map ...)) + $unwind + $replaceRoot (the r4
    $$-variable operators). Executes in the MQL interpreter through the
    datasource's manual-pipeline path (mql/interpreter.py)."""
    from duckdb_mongo_spark.scan import mongo_scan

    be = _pq_backend(sf_dir)
    pipeline = [
        {"$facet": {
            "by_status": [{"$sortByCount": "$o_orderstatus"}],
            "price_buckets": [{"$bucket": {
                "groupBy": "$o_totalprice",
                "boundaries": [0, 100000, 200000, 300000, 400000, 700000],
                "default": "other",
            }}],
        }},
        {"$project": {"_id": 0, "rows": {"$concatArrays": [
            {"$map": {"input": "$by_status", "as": "d",
                      "in": {"facet": "by_status",
                             "key": {"$toString": "$$d._id"},
                             "n": "$$d.count"}}},
            {"$map": {"input": "$price_buckets", "as": "d",
                      "in": {"facet": "price_buckets",
                             "key": {"$toString": "$$d._id"},
                             "n": "$$d.count"}}},
        ]}}},
        {"$unwind": "$rows"},
        {"$replaceRoot": {"newRoot": "$rows"}},
    ]
    mf = mongo_scan(
        spark, be, "main", "orders", pipeline=pipeline,
        columns={"facet": "VARCHAR", "key": "VARCHAR", "n": "BIGINT"},
    )
    # a declared-columns schema always carries the engine's _id column
    # (reference binds _id unconditionally); the facet rows have none
    return mf.df().select("facet", "key", "n").orderBy("facet", "key")


_register(
    "mongo_pipeline_facet",
    _mongo_pipeline_facet,
    """
    SELECT 'by_status' AS facet, o_orderstatus AS key, COUNT(*) AS n
    FROM orders GROUP BY o_orderstatus
    UNION ALL
    SELECT 'price_buckets' AS facet,
           CASE WHEN o_totalprice >= 0 AND o_totalprice < 100000 THEN '0'
                WHEN o_totalprice < 200000 THEN '100000'
                WHEN o_totalprice < 300000 THEN '200000'
                WHEN o_totalprice < 400000 THEN '300000'
                WHEN o_totalprice < 700000 THEN '400000'
                ELSE 'other' END AS key,
           COUNT(*) AS n
    FROM orders GROUP BY 2
    ORDER BY facet, key
    """,
)


def _mongo_semi_join_in(spark, sf_dir):
    """A11 semi-join IN pushdown: build side (high-balance customers)
    materialized, key set pushed to the orders scan as $in."""
    from duckdb_mongo_spark.pushdown import C

    rich = (
        _mongo_frame(spark, sf_dir, "customer")
        .filter(C("c_acctbal") > 9900.0)
        .select("c_custkey")
    )
    orders = _mongo_frame(spark, sf_dir, "orders")
    # passing the MongoFrame (not .df()) lets the engine execute the
    # build side directly on the backend — one federation round-trip,
    # not two (frame.semi_join_in direct path)
    out = orders.semi_join_in(rich, on="o_custkey", build_col="c_custkey")
    from pyspark.sql import functions as F

    from duckdb_mongo_spark.frame import MongoFrame

    if isinstance(out, MongoFrame):
        # prune the probe scan to the one column the aggregation reads
        # (A4 projection pushdown; also keeps the scan broadcast-class)
        out = out.select("o_orderstatus")
    df = out.df() if isinstance(out, MongoFrame) else out
    return (
        df.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderstatus")
    )


_register(
    "mongo_semi_join_in",
    _mongo_semi_join_in,
    """
    SELECT o_orderstatus, COUNT(*) AS n
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9900.0)
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)

# ===========================================================================
# C. NEW operators (dedup / similarity / text / multimodal)
# ===========================================================================

_SHINGLE_TOKS_SQL = (
    "list_filter(string_split_regex(trim(regexp_replace(lower(text), "
    "'[^a-z0-9\\s]', ' ', 'g')), '\\s+'), x -> x <> '')"
)
_SHINGLE_GRAMS_SQL = f"""
    WITH tk AS (SELECT doc_id, {_SHINGLE_TOKS_SQL} AS t FROM documents),
    grams AS (
        SELECT doc_id,
               CASE WHEN len(t) >= 3
                    THEN list_transform(generate_series(1, len(t) - 2),
                                        i -> array_to_string(t[i:i+2], ' '))
                    ELSE [array_to_string(t, ' ')] END AS g
        FROM tk)
"""


def _sketch_count_min(spark, sf_dir):
    """Count–Min sketch (ops/sketches.py:120) of orders.o_custkey as a
    sparse (cms_row, cms_bucket, cms_count) surface — the md5
    digest-slice bucketing is engine-portable, so the DuckDB oracle
    rebuilds the IDENTICAL sketch from the same rows and the driver's
    hash compare proves it bit-for-bit (r4/r5 verdict item: the sketch
    ledger slot, freed by folding the semi/anti entries)."""
    from pyspark.sql import functions as F

    from duckdb_mongo_spark.ops.sketches import count_min_sketch

    _views(spark, sf_dir, "orders")
    sk = count_min_sketch(spark.table("orders"), "o_custkey",
                          depth=5, width=1024)
    return sk.select(
        F.col("row").alias("cms_row"),
        F.col("bucket").alias("cms_bucket"),
        F.col("count").alias("cms_count"),
    ).orderBy("cms_row", "cms_bucket")


_register(
    "sketch_count_min",
    _sketch_count_min,
    """
    WITH e AS (
        SELECT CAST(j.r AS INT) AS cms_row,
               CAST(CAST('0x' || substring(md5(j.r || ':' || o_custkey), 1, 8)
                    AS BIGINT) % 1024 AS INT) AS cms_bucket
        FROM orders, (SELECT unnest(['0','1','2','3','4']) AS r) j
        WHERE o_custkey IS NOT NULL
    )
    SELECT cms_row, cms_bucket, COUNT(*) AS cms_count
    FROM e GROUP BY cms_row, cms_bucket ORDER BY cms_row, cms_bucket
    """,
)


def _dedup_exact_groups(spark, sf_dir):
    from duckdb_mongo_spark.ops.dedup import exact_duplicate_groups

    _views(spark, sf_dir, "documents")
    docs = spark.table("documents")
    return exact_duplicate_groups(docs, ["lang", "n_chars"], "doc_id").orderBy("lang", "n_chars")


_register(
    "dedup_exact_groups",
    _dedup_exact_groups,
    """
    SELECT lang, n_chars, COUNT(*) AS n_dups, MIN(doc_id) AS keep_id
    FROM documents GROUP BY lang, n_chars HAVING COUNT(*) > 1
    ORDER BY lang, n_chars
    """,
)


def _dedup_minhash(spark, sf_dir):
    """Arrow-kernel minhash (ops/dedup.minhash_signatures_arrow):
    bit-identical to the JVM explode+grouped-MIN form (parity pinned in
    tests/test_ops.py) and faster at every measured scale (r5 A/B, k=4:
    sf0.1 ~tie, sf1 1.3 vs 1.6 s, sf10 4.0 vs 6.5 s) — the shingle md5
    hot loop runs cached-per-unique-shingle in C over Arrow batches, the
    shuffle carries raw uint32 slice values as longs, and hex rendering
    happens once post-agg in JVM codegen."""
    from duckdb_mongo_spark.ops.dedup import minhash_signatures_arrow

    _views(spark, sf_dir, "documents")
    return minhash_signatures_arrow(
        spark.table("documents"), "doc_id", "text", k=4
    ).orderBy("doc_id")


_register(
    "dedup_minhash_signatures",
    _dedup_minhash,
    _SHINGLE_GRAMS_SQL
    + """
    SELECT doc_id,
           list_min(list_transform(g, s -> substring(md5('0:' || s), 1, 8))) AS minhash_0,
           list_min(list_transform(g, s -> substring(md5('0:' || s), 9, 8))) AS minhash_1,
           list_min(list_transform(g, s -> substring(md5('0:' || s), 17, 8))) AS minhash_2,
           list_min(list_transform(g, s -> substring(md5('0:' || s), 25, 8))) AS minhash_3
    FROM grams ORDER BY doc_id
    """,
)


def _dedup_jaccard_pairs(spark, sf_dir):
    from duckdb_mongo_spark.ops.dedup import near_dup_pairs_jaccard

    _views(spark, sf_dir, "documents")
    return near_dup_pairs_jaccard(
        spark.table("documents"), "doc_id", "text", threshold=0.2
    ).orderBy("a", "b")


_register(
    "dedup_jaccard_pairs",
    _dedup_jaccard_pairs,
    _SHINGLE_GRAMS_SQL
    + """
    , sh0 AS (SELECT doc_id AS doc, unnest(list_distinct(g)) AS shingle FROM grams),
    -- stop-shingle cap (max_doc_freq=1000, the engine default): shingles in
    -- more docs than the cap are dropped BEFORE sizes/intersections
    shf AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) <= 1000),
    sh AS (SELECT sh0.doc, sh0.shingle FROM sh0 JOIN shf USING (shingle)),
    sizes AS (SELECT doc, COUNT(*) AS sz FROM sh GROUP BY doc),
    inter AS (SELECT a.doc AS a, b.doc AS b, COUNT(*) AS inter
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
              GROUP BY a.doc, b.doc)
    SELECT i.a, i.b, i.inter, sa.sz AS size_a, sb.sz AS size_b,
           round(i.inter / CAST(sa.sz + sb.sz - i.inter AS DOUBLE), 6) AS jaccard
    FROM inter i JOIN sizes sa ON i.a = sa.doc JOIN sizes sb ON i.b = sb.doc
    WHERE round(i.inter / CAST(sa.sz + sb.sz - i.inter AS DOUBLE), 6) >= 0.2
    ORDER BY i.a, i.b
    """,
)


def _dedup_minhash_lsh(spark, sf_dir):
    from duckdb_mongo_spark.ops.dedup import near_dup_pairs_minhash_lsh

    _views(spark, sf_dir, "documents")
    return near_dup_pairs_minhash_lsh(
        spark.table("documents"), "doc_id", "text", threshold=0.2, k=4, bands=2
    ).orderBy("a", "b")


_register(
    "dedup_minhash_lsh",
    _dedup_minhash_lsh,
    _SHINGLE_GRAMS_SQL
    + """
    , sig AS (
        SELECT doc_id,
            list_min(list_transform(g, s -> substring(md5('0:' || s), 1, 8))) AS m0,
            list_min(list_transform(g, s -> substring(md5('0:' || s), 9, 8))) AS m1,
            list_min(list_transform(g, s -> substring(md5('0:' || s), 17, 8))) AS m2,
            list_min(list_transform(g, s -> substring(md5('0:' || s), 25, 8))) AS m3
        FROM grams),
    bk AS (
        SELECT doc_id AS doc, 0 AS band, md5(m0 || '|' || m1) AS bucket FROM sig
        UNION ALL
        SELECT doc_id, 1, md5(m2 || '|' || m3) FROM sig),
    cand AS (
        SELECT DISTINCT l.doc AS a, r.doc AS b
        FROM bk l JOIN bk r ON l.band = r.band AND l.bucket = r.bucket AND l.doc < r.doc),
    sh AS (SELECT doc_id AS doc, unnest(list_distinct(g)) AS shingle FROM grams),
    sizes AS (SELECT doc, COUNT(*) AS sz FROM sh GROUP BY doc),
    inter AS (
        SELECT c.a, c.b, COUNT(*) AS inter
        FROM cand c JOIN sh sa ON sa.doc = c.a
                    JOIN sh sb ON sb.doc = c.b AND sb.shingle = sa.shingle
        GROUP BY c.a, c.b)
    SELECT i.a, i.b, round(i.inter / CAST(sa.sz + sb.sz - i.inter AS DOUBLE), 6) AS jaccard
    FROM inter i JOIN sizes sa ON i.a = sa.doc JOIN sizes sb ON i.b = sb.doc
    WHERE round(i.inter / CAST(sa.sz + sb.sz - i.inter AS DOUBLE), 6) >= 0.2
    ORDER BY i.a, i.b
    """,
)


def _dedup_simhash(spark, sf_dir):
    """Arrow-kernel simhash (ops/dedup.simhash_arrow): bit-identical to
    the JVM explode+grouped-SUM form (parity pinned in
    tests/test_dedup.py), ~20% faster at sf0.1 and sf1 in interleaved
    A/B (r4: 0.94 s vs 1.16 s at sf1) — the md5/bit-vote hot loop runs
    vectorized numpy over Arrow batches instead of per-expression JVM."""
    from duckdb_mongo_spark.ops.dedup import simhash_arrow

    _views(spark, sf_dir, "documents")
    return simhash_arrow(spark.table("documents"), "doc_id", "text", bits=16).orderBy("doc_id")


def _simhash_oracle() -> str:
    votes = ", ".join(
        f"SUM(CASE WHEN (hv >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(16)
    )
    simexpr = " + ".join(f"(CASE WHEN v{b} > 0 THEN {2 ** b} ELSE 0 END)" for b in range(16))
    return f"""
    WITH tk AS (SELECT doc_id, {_SHINGLE_TOKS_SQL} AS t FROM documents),
    tok AS (SELECT doc_id, unnest(list_distinct(t)) AS tok FROM tk),
    h AS (SELECT doc_id, CAST('0x' || substring(md5(tok), 1, 4) AS INTEGER) AS hv FROM tok),
    v AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id)
    SELECT doc_id, CAST({simexpr} AS BIGINT) AS simhash FROM v ORDER BY doc_id
    """


_register("dedup_simhash", _dedup_simhash, _simhash_oracle())

_COSINE_SQL = (
    "round(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * cv[i]))"
    " / (sqrt(list_sum(list_transform(qv, x -> x * x)))"
    " * sqrt(list_sum(list_transform(cv, x -> x * x)))), 6)"
)


def _sim_cosine_topk(spark, sf_dir):
    """Exact cosine top-k — GEMM kernel (mapInArrow + numpy GEMM with
    per-batch top-k preselect), the designated 100 TB path and, since
    r9, the ledgered/benched PRIMARY. The JVM HOF kernel
    (zip_with/aggregate) is demoted to the pytest parity cross-check
    (tests/test_ops.py::TestSimilarity::test_hof_kernel_matches_duckdb_oracle
    holds it to this same DuckDB oracle on the driver testdata;
    test_vectorized_matches_hof_path pins kernel equality): at sf10 the
    HOF form measured 5.2-6.5x DuckDB while GEMM measured 1.6-1.9x, so
    benching the deliberately JVM-pure cross-check as a headline line
    item misrepresented the engine's scale path (r8 verdict #3)."""
    from pyspark.sql import functions as F

    from duckdb_mongo_spark.ops.similarity import cosine_topk_vectorized

    _views(spark, sf_dir, "embeddings")
    emb = spark.table("embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return cosine_topk_vectorized(queries, emb, k=5).orderBy("q_id", "rank")


_COSINE_TOPK_SQL = f"""
    WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
    scored AS (SELECT q_id, c_id, {_COSINE_SQL} AS score FROM q, c),
    ranked AS (SELECT q_id, c_id, score,
                      ROW_NUMBER() OVER (PARTITION BY q_id
                                         ORDER BY score DESC, c_id) AS rank
               FROM scored)
    SELECT q_id, c_id AS vec_id, score, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 5 ORDER BY q_id, rank
    """

_register("sim_cosine_topk", _sim_cosine_topk, _COSINE_TOPK_SQL)


def _sim_embedding_near_dup(spark, sf_dir):
    """Embedding near-dup with the BUCKETED plan (hyperplane-signature
    self-join, never an O(n²) cross join): the oracle replicates the md5
    hyperplanes bit-for-bit (plane constants inlined into the SQL), so
    the hash-match verifies signatures, bucket join AND cosine scores.
    The exact==bucketed agreement contract is asserted in
    tests/test_ops.py (bucketed ⊆ exact, scores equal on found pairs).
    Threshold 0.35 sits in the synthetic corpus's actual cosine range
    (max pairwise ≈ 0.51) so the result is non-empty — r1's 0.8 was a
    vacuous 0-row match."""
    from duckdb_mongo_spark.ops.similarity import embedding_near_dup_pairs

    _views(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(
        spark.table("embeddings"), threshold=0.35, exact=False, dim=64, n_planes=4
    ).orderBy("a", "b")


def _near_dup_bucketed_oracle() -> str:
    from duckdb_mongo_spark.ops.similarity import hyperplanes

    sig_parts = []
    for plane in hyperplanes(64, 4, seed=42):
        lit = "[" + ", ".join(repr(x) for x in plane) + "]"
        sig_parts.append(
            "(CASE WHEN list_sum(list_transform(generate_series(1, 64), "
            f"i -> v[i] * ({lit})[i])) >= 0 THEN '1' ELSE '0' END)"
        )
    sig = " || ".join(sig_parts)
    return f"""
    WITH c AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    s AS (SELECT id, v, {sig} AS sig FROM c),
    pairs AS (SELECT l.id AS a, r.id AS b, l.v AS qv, r.v AS cv
              FROM s l JOIN s r ON l.sig = r.sig AND l.id < r.id)
    SELECT a, b, {_COSINE_SQL} AS score
    FROM pairs WHERE {_COSINE_SQL} >= 0.35 ORDER BY a, b
    """


_register(
    "sim_embedding_near_dup",
    _sim_embedding_near_dup,
    _near_dup_bucketed_oracle(),
)

# NOTE: the rows-only ANN variants (lsh_topk, ivf_topk) are exercised in
# tests/test_ops.py (recall vs exact, plan shape) rather than queries()
# — every ledger entry carries a full value-hash oracle.


def _multimodal_pipeline(spark, sf_dir):
    """Media-column pipeline: attach binary media column → fake-decode
    typed metadata (the real decode is the clearly-stubbed step; the
    Spark plumbing — binary column, mapInPandas schema, batch shape — is
    real) → frame-sample every 50th frame index per media row. Merged
    meta + frame-sample surface in one entry (driver ledger window)."""
    from pyspark.sql import functions as F

    from duckdb_mongo_spark.ops.multimodal import (
        attach_media_column,
        fake_decode_meta,
        frame_sample_plan,
    )

    _views(spark, sf_dir, "documents")
    docs = spark.table("documents").filter(F.col("doc_id") < 100).select("doc_id", "text")
    media = attach_media_column(docs, F.col("text"), mime="video/fake").drop("text")
    meta = fake_decode_meta(media)
    return (
        frame_sample_plan(meta, every_n=50)
        .select(
            "doc_id", "mime", "n_bytes", "checksum", "width", "height",
            "n_frames", "frame_idx",
        )
        .orderBy("doc_id", "frame_idx")
    )


_register(
    "multimodal_pipeline",
    _multimodal_pipeline,
    """
    WITH meta AS (
        SELECT doc_id, 'video/fake' AS mime,
               CAST(strlen(text) AS BIGINT) AS n_bytes,
               md5(text) AS checksum,
               CAST(64 + CAST('0x' || substring(md5(text), 1, 4) AS INTEGER) % 1985 AS BIGINT) AS width,
               CAST(64 + CAST('0x' || substring(md5(text), 5, 4) AS INTEGER) % 1985 AS BIGINT) AS height,
               CAST(1 + CAST('0x' || substring(md5(text), 9, 4) AS INTEGER) % 300 AS BIGINT) AS n_frames
        FROM documents WHERE doc_id < 100
    )
    SELECT doc_id, mime, n_bytes, checksum, width, height, n_frames,
           unnest(range(0, n_frames, 50)) AS frame_idx
    FROM meta ORDER BY doc_id, frame_idx
    """,
)


def _text_analysis(spark, sf_dir):
    from duckdb_mongo_spark.ops.text import with_analysis

    _views(spark, sf_dir, "documents")
    out = with_analysis(spark.table("documents"))
    return out.select(
        "doc_id", "n_tokens", "n_bpe_tokens", "punct_ratio", "stopword_ratio",
        "avg_token_len", "quality", "lang_id", "fingerprint",
    ).orderBy("doc_id")


def _text_oracle() -> str:
    from duckdb_mongo_spark.ops import text as tx

    toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    return f"""
    SELECT doc_id,
           CAST({tx.token_count_sql()} AS INTEGER) AS n_tokens,
           CAST({tx.bpe_token_count_sql()} AS INTEGER) AS n_bpe_tokens,
           {tx.punct_ratio_sql()} AS punct_ratio,
           {tx.stopword_ratio_sql()} AS stopword_ratio,
           CASE WHEN len({toks}) > 0
                THEN list_sum(list_transform({toks}, t -> length(t))) / CAST(len({toks}) AS DOUBLE)
                ELSE 0.0 END AS avg_token_len,
           {tx.quality_score_sql()} AS quality,
           {tx.language_id_sql()} AS lang_id,
           {tx.fingerprint_sql()} AS fingerprint
    FROM documents ORDER BY doc_id
    """


_register("text_analysis", _text_analysis, _text_oracle())


# ===========================================================================
# F. Temporal operators (DuckDB SQL-surface parity Spark lacks natively;
#    SURVEY §2B NEW rows — as-of join, range/interval join, hypertable
#    rollup). Oracle: DuckDB's native ASOF JOIN / inequality join /
#    direct-from-raw GROUP BYs.
# ===========================================================================


def _q_asof_join(spark, sf_dir):
    """As-of join (ops/joins.asof_join): each click event picks up the
    most recent error state for its user — the union+window
    single-shuffle plan, never a nested loop.

    r13: ``tie_break`` replaces the (user_id, ts)+MAX(value) right-side
    pre-aggregation — the greatest-value pick rides the window sort
    itself, removing one exchange plus a groups≈rows hash aggregation
    from the plan (the oracle keeps the explicit GROUP BY: SQL ASOF
    leaves tie-picks unspecified, so DuckDB must pre-aggregate).

    r14 (r13 verdict #6): ``asof_self_join`` joins the same tagged
    union (shape='sj') — both sides as predicate slices of ONE scan,
    the single-FileScan plan the bench agg line runs — so the
    single-scan operator has its own driver-oracle row. A 1-in-5 user
    stratum bounds the branch (oracle exposure, not a re-measure of
    the full join the aj branch already carries); the bench keeps the
    lean aj-only shape for per-round series comparability
    (bench._install_lean_line_items convention)."""
    from pyspark.sql import functions as F

    from duckdb_mongo_spark.ops.joins import asof_join, asof_self_join

    _views(spark, sf_dir, "events")
    ev = spark.table("events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("value").alias("err_value"))
    out = asof_join(clicks, errors, on="ts", by=["user_id"],
                    tie_break="err_value")
    aj = out.select(F.lit("aj").alias("shape"), "event_id", "user_id",
                    "ts", "ts_right", "err_value")
    sl = F.col("user_id") % 5 == 0
    sj = asof_self_join(
        ev.filter(sl).withColumn("err_value", F.col("value")),
        F.col("event_type") == "click",
        F.col("event_type") == "error",
        on="ts", left_cols=["event_id"], right_cols=["err_value"],
        by=["user_id"], tie_break="err_value")
    sjs = sj.select(F.lit("sj").alias("shape"), "event_id", "user_id",
                    "ts", "ts_right", "err_value")
    return aj.unionByName(sjs).orderBy("shape", "event_id")


_register(
    "q_asof_join",
    _q_asof_join,
    """
    SELECT * FROM (
      SELECT 'aj' AS shape, l.event_id, l.user_id, l.ts,
             r.ts AS ts_right, r.err_value
      FROM (SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'click') l
      ASOF LEFT JOIN (SELECT user_id, ts, MAX(value) AS err_value
                      FROM events WHERE event_type = 'error'
                      GROUP BY user_id, ts) r
        ON l.user_id = r.user_id AND l.ts >= r.ts
      UNION ALL
      SELECT 'sj', l.event_id, l.user_id, l.ts, r.ts, r.err_value
      FROM (SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'click' AND user_id % 5 = 0) l
      ASOF LEFT JOIN (SELECT user_id, ts, MAX(value) AS err_value
                      FROM events
                      WHERE event_type = 'error' AND user_id % 5 = 0
                      GROUP BY user_id, ts) r
        ON l.user_id = r.user_id AND l.ts >= r.ts
    ) ORDER BY shape, event_id
    """,
)


def _q_interval_join(spark, sf_dir):
    """Point-in-interval range join (ops/joins.interval_join_points):
    clicks falling inside each user's daily error window, executed as a
    bin-bucketed EQUI-join — never a BroadcastNestedLoopJoin.

    r12: the intervals are built PRE-BINNED — grouping on the 1-day bin
    grid itself (time_bin == date_trunc('day') boundaries under the UTC
    session) and passing ``iv_bin_col`` so the join keys ARE the
    grouping attributes: Catalyst reuses the aggregation exchange and
    the interval side reaches the join with zero extra shuffles (the
    r11 shape paid a second exchange re-shuffling the exploded rows on
    the derived bin key)."""
    from pyspark.sql import functions as F

    from duckdb_mongo_spark.ops.joins import interval_join_points, time_bin

    _views(spark, sf_dir, "events")
    ev = spark.table("events")
    points = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    err = ev.filter(F.col("event_type") == "error").select("user_id", "ts")
    intervals = (
        err.groupBy("user_id", time_bin(err, "ts", 86400.0).alias("__bin"))
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
    )
    # bin_width = the domain-known interval bound: day-grid windows, so
    # each interval owns exactly one 1-day bin (iv_bin_col contract)
    out = interval_join_points(points, "ts", intervals, "lo", "hi",
                               on=["user_id"], bin_width=86400.0,
                               iv_bin_col="__bin")
    pt = out.select(
        F.lit("pt").alias("shape"), "event_id", "user_id",
        F.col("ts").alias("t1"), F.col("lo").alias("t2"),
        F.col("hi").alias("t3"), F.lit(None).cast("timestamp").alias("t4"))

    # r13 (r12 verdict #7): interval_overlap_join's pre-binned path in
    # the same tagged union — WEEKLY click envelopes x weekly error
    # envelopes, BOTH sides prebinned (l_bin_col/r_bin_col, 2-exchange
    # plan). Week grid (epoch-anchored, = the time_bin grid, NOT
    # date_trunc('week')) because daily envelopes of sparse per-user
    # streams rarely overlap at small sf (0 rows at sf0.01 = vacuous
    # oracle exposure); a 1-in-7 user stratum bounds the branch — it
    # exists for oracle exposure of the overlap operator, not to
    # re-measure the envelope-aggregation floor the pt branch carries.
    from duckdb_mongo_spark.ops.joins import interval_overlap_join

    _WEEK = 7 * 86400.0

    def _week_env(df):
        return (df.groupBy("user_id", time_bin(df, "ts", _WEEK).alias("__bin"))
                .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")))

    sl = F.col("user_id") % 7 == 0
    cl = ev.filter((F.col("event_type") == "click") & sl).select("user_id", "ts")
    er = ev.filter((F.col("event_type") == "error") & sl).select("user_id", "ts")
    ov = interval_overlap_join(_week_env(cl), "lo", "hi", _week_env(er),
                               "lo", "hi", on=["user_id"], bin_width=_WEEK,
                               l_bin_col="__bin", r_bin_col="__bin")
    ovs = ov.select(
        F.lit("ov").alias("shape"), F.lit(None).cast("long").alias("event_id"),
        "user_id", F.col("lo").alias("t1"), F.col("hi").alias("t2"),
        F.col("lo_r").alias("t3"), F.col("hi_r").alias("t4"))
    return pt.unionByName(ovs).orderBy("shape", "event_id", "user_id", "t1", "t3")


_register(
    "q_interval_join",
    _q_interval_join,
    """
    SELECT * FROM (
      SELECT 'pt' AS shape, p.event_id, p.user_id, p.ts AS t1,
             i.lo AS t2, i.hi AS t3, CAST(NULL AS TIMESTAMP) AS t4
      FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') p
      JOIN (SELECT user_id, MIN(ts) AS lo, MAX(ts) AS hi
            FROM events WHERE event_type = 'error'
            GROUP BY user_id, date_trunc('day', ts)) i
        ON p.user_id = i.user_id AND p.ts >= i.lo AND p.ts <= i.hi
      UNION ALL
      SELECT 'ov', CAST(NULL AS BIGINT), l.user_id, l.lo, l.hi, r.lo, r.hi
      FROM (SELECT user_id, MIN(ts) AS lo, MAX(ts) AS hi
            FROM events WHERE event_type = 'click' AND user_id % 7 = 0
            GROUP BY user_id, CAST(FLOOR(epoch(ts)/604800) AS BIGINT)) l
      JOIN (SELECT user_id, MIN(ts) AS lo, MAX(ts) AS hi
            FROM events WHERE event_type = 'error' AND user_id % 7 = 0
            GROUP BY user_id, CAST(FLOOR(epoch(ts)/604800) AS BIGINT)) r
        ON l.user_id = r.user_id AND l.lo <= r.hi AND r.lo <= l.hi
    ) ORDER BY shape, event_id, user_id, t1, t3
    """,
)


def _q_time_rollup(spark, sf_dir):
    """Hypertable rollup (ops/rollup.time_rollup): hour+day aggregates
    from ONE raw scan — coarser levels re-aggregate the finest level's
    mergeable partials instead of re-scanning raw. Money-typed metric
    accumulates as DECIMAL so partial re-aggregation is bit-exact vs
    direct-from-raw (the oracle computes every level straight from the
    raw table), then SURFACES as DOUBLE per the repo's _dsum convention
    (see module docstring): every ledger entry's output schema uses only
    {DOUBLE, BIGINT, STRING, TIMESTAMP, DATE, BOOLEAN} so engines that
    materialize DECIMAL differently (Decimal vs float64) hash alike.
    Values here are <= 4 decimal digits with magnitude < 2^40, exactly
    representable in double, so no precision is lost at the surface."""
    from pyspark.sql import functions as F

    from duckdb_mongo_spark.ops.rollup import time_rollup

    _views(spark, sf_dir, "events")
    ev = spark.table("events").withColumn("dval", F.col("value").cast("decimal(18,4)"))
    out = time_rollup(
        ev,
        "ts",
        metrics={
            "n": ("count", "event_id"),
            "total": ("sum", "dval"),
            "mn": ("min", "dval"),
            "mx": ("max", "dval"),
        },
        group_cols=["event_type"],
        resolutions=["hour", "day"],
    )
    rollup = (
        out.withColumn("total", F.col("total").cast("double"))
        .withColumn("mn", F.col("mn").cast("double"))
        .withColumn("mx", F.col("mx").cast("double"))
        .select(F.lit("rollup").alias("shape"), "resolution", "event_type",
                "bucket", "n", "total", "mn", "mx")
    )
    # r7 fold: the r1 time-bucket + JSON-extraction shape rides the same
    # tagged union (shape='bucket'; sum_k in the mn slot, mx unused) —
    # freeing a ledger slot for profile_summarize while get_json_object
    # stays driver-oracle-proven
    bucket = spark.sql(f"""
        SELECT 'bucket' AS shape, 'hour' AS resolution, event_type,
               date_trunc('hour', ts) AS bucket, COUNT(*) AS n,
               {_dsum('value', 6)} AS total,
               CAST(SUM(CAST(get_json_object(props, '$.k') AS BIGINT))
                    AS DOUBLE) AS mn,
               CAST(NULL AS DOUBLE) AS mx
        FROM events
        WHERE ts < TIMESTAMP '2024-01-03 00:00:00'
        GROUP BY date_trunc('hour', ts), event_type
    """)
    # Column ORDER must match the oracle's SELECT order: the driver's
    # value hash is positional (r3 verdict — values were exact, order off).
    return rollup.unionAll(bucket).orderBy(
        "shape", "resolution", "event_type", "bucket")


_register(
    "q_time_rollup",
    _q_time_rollup,
    f"""
    SELECT 'rollup' AS shape, 'hour' AS resolution, event_type,
           date_trunc('hour', ts) AS bucket,
           COUNT(event_id) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total,
           CAST(MIN(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS mn,
           CAST(MAX(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS mx
    FROM events GROUP BY event_type, date_trunc('hour', ts)
    UNION ALL
    SELECT 'rollup' AS shape, 'day' AS resolution, event_type,
           date_trunc('day', ts) AS bucket,
           COUNT(event_id) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total,
           CAST(MIN(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS mn,
           CAST(MAX(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS mx
    FROM events GROUP BY event_type, date_trunc('day', ts)
    UNION ALL
    SELECT 'bucket' AS shape, 'hour' AS resolution, event_type,
           date_trunc('hour', ts) AS bucket, COUNT(*) AS n,
           {_dsum('value', 6)} AS total,
           CAST(SUM(CAST(props->>'k' AS BIGINT)) AS DOUBLE) AS mn,
           CAST(NULL AS DOUBLE) AS mx
    FROM events
    WHERE ts < TIMESTAMP '2024-01-03 00:00:00'
    GROUP BY date_trunc('hour', ts), event_type
    ORDER BY shape, resolution, event_type, bucket
    """,
)


def _span_dedup(spark, sf_dir):
    """Exact-substring span dedup (ops/span_dedup.py, the Lee et al.
    2022 semantics): duplicated >= k-token windows keep their
    lexicographically-first occurrence; later occurrences merge into
    removal spans (0-based start, exclusive end). exact_grams=True keys
    the duplicate relation on the gram TEXT so the DuckDB oracle
    reproduces it with zero hash-collision caveats (r6 verdict item:
    span_dedup deserves a driver-green row)."""
    from duckdb_mongo_spark.ops.span_dedup import duplicate_spans

    _views(spark, sf_dir, "documents")
    return duplicate_spans(
        spark.table("documents"), "doc_id", "text", k=5,
        max_gram_freq=1000, exact_grams=True,
    ).orderBy("doc_id", "span_start")


_register(
    "span_dedup",
    _span_dedup,
    f"""
    WITH tk AS (SELECT doc_id, {_SHINGLE_TOKS_SQL} AS t FROM documents),
    occ0 AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(t) - 5 + 1),
                    i -> struct_pack(p := i - 1,
                                     g := array_to_string(t[i:i+4], ' ')))) AS og
      FROM tk WHERE len(t) >= 5),
    occ AS (SELECT doc_id, og.p AS pos0, og.g AS g FROM occ0),
    rn AS (SELECT doc_id, pos0,
                  ROW_NUMBER() OVER (PARTITION BY g ORDER BY doc_id, pos0) AS rn,
                  COUNT(*) OVER (PARTITION BY g) AS cnt
           FROM occ),
    marked AS (SELECT DISTINCT doc_id, pos0
               FROM rn WHERE cnt > 1 AND cnt <= 1000 AND rn > 1),
    isl0 AS (SELECT doc_id, pos0 AS s,
                    MAX(pos0 + 5) OVER (PARTITION BY doc_id ORDER BY pos0
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
             FROM marked),
    isl AS (SELECT doc_id, s,
                   SUM(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
                     OVER (PARTITION BY doc_id ORDER BY s) AS island
            FROM isl0)
    SELECT doc_id, CAST(MIN(s) AS BIGINT) AS span_start,
           CAST(MAX(s) + 5 AS BIGINT) AS span_end
    FROM isl GROUP BY doc_id, island
    ORDER BY doc_id, span_start
    """,
)


def _doc_chunking(spark, sf_dir):
    """Overlapping token-window chunking (ops/chunking.py) — zero
    Python in the plan (ws_tokens + sequence + slice + one explode);
    the DuckDB list-lambda oracle (chunk_sql) reproduces every chunk
    boundary and every chunk text byte-for-byte (r7 verdict item #4:
    doc_chunking deserves a driver-green row)."""
    from duckdb_mongo_spark.ops.chunking import chunk_documents

    _views(spark, sf_dir, "documents")
    return chunk_documents(
        spark.table("documents").select("doc_id", "text"),
        id_col="doc_id", text_col="text",
        chunk_tokens=64, overlap_tokens=16,
    ).orderBy("doc_id", "chunk_idx")


def _chunk_oracle() -> str:
    from duckdb_mongo_spark.ops.chunking import chunk_sql

    inner = chunk_sql("SELECT doc_id, text FROM documents",
                      id_col="doc_id", text_col="text",
                      chunk_tokens=64, overlap_tokens=16)
    return f"SELECT * FROM ({inner}) ORDER BY doc_id, chunk_idx"


_register("doc_chunking", _doc_chunking, _chunk_oracle())


def _seq_packing(spark, sf_dir):
    """GPT-style contiguous sequence packing
    (ops/packing.pack_sequences_contiguous): per-md5-shard token
    streams cut every `budget` tokens — pure window arithmetic, one
    shuffle, and the whole assignment (seq_id/seq_off/end_seq per
    document) is recomputed by the DuckDB oracle from the same md5
    shard + exclusive-prefix-sum recurrence (r7 verdict item #4:
    seq_packing deserves a driver-green row; the BFD variant's
    iterative bin state stays pytest-proven — it is not expressible
    in the oracle's SQL)."""
    from pyspark.sql import functions as F

    from duckdb_mongo_spark.ops.packing import pack_sequences_contiguous
    from duckdb_mongo_spark.ops.text import ws_tokens

    _views(spark, sf_dir, "documents")
    docs = spark.table("documents").select(
        "doc_id",
        F.size(ws_tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    return pack_sequences_contiguous(
        docs, "doc_id", "n_tokens", budget=2048, num_shards=32,
    ).orderBy("doc_id")


def _packing_oracle() -> str:
    from duckdb_mongo_spark.ops.packing import pack_contiguous_sql

    src = ("SELECT doc_id, CAST(len(list_filter("
           "string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT)"
           " AS n_tokens FROM documents")
    inner = pack_contiguous_sql(src, "doc_id", "n_tokens",
                                budget=2048, num_shards=32)
    return f"SELECT * FROM ({inner}) ORDER BY doc_id"


_register("seq_packing", _seq_packing, _packing_oracle())


def _profile_summarize(spark, sf_dir):
    """SUMMARIZE-parity profiler (ops/profile.py) hash-proven on its
    EXACT statistics: count, null percentage, numeric min/max/avg/std
    (rounded — both engines' float drift is ~1e-8 relative), string and
    timestamp min/max as rendered strings. The engine-approximate stats
    (HLL approx_unique, t-digest quartiles) stay under the tolerance
    pytest (tests/test_profile.py vs real DuckDB SUMMARIZE) — two
    different sketches can never hash-match and are not asked to."""
    from pyspark.sql import functions as F

    from duckdb_mongo_spark.ops.profile import summarize

    _views(spark, sf_dir, "lineitem")
    s = summarize(spark.table("lineitem"),
                  cols=["l_orderkey", "l_quantity", "l_extendedprice",
                        "l_returnflag", "l_shipdate"])
    return s.select(
        "column_name", "count",
        F.col("null_percentage").alias("null_pct"),
        F.when(F.col("avg").isNotNull(),
               F.round(F.col("min").cast("double"), 4)).alias("min_num"),
        F.when(F.col("avg").isNotNull(),
               F.round(F.col("max").cast("double"), 4)).alias("max_num"),
        F.when(F.col("avg").isNull(), F.col("min")).alias("min_str"),
        F.when(F.col("avg").isNull(), F.col("max")).alias("max_str"),
        F.round(F.col("avg").cast("double"), 2).alias("avg_r"),
        F.round(F.col("std").cast("double"), 2).alias("std_r"),
    ).orderBy("column_name")


def _profile_oracle() -> str:
    def num(c):
        return f"""
      SELECT '{c}' AS column_name, COUNT(*) AS count,
             ROUND(100.0 * SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)
                   / COUNT(*), 2) AS null_pct,
             ROUND(CAST(MIN({c}) AS DOUBLE), 4) AS min_num,
             ROUND(CAST(MAX({c}) AS DOUBLE), 4) AS max_num,
             CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str,
             ROUND(AVG({c}), 2) AS avg_r, ROUND(STDDEV_SAMP({c}), 2) AS std_r
      FROM lineitem"""

    def st(c):
        return f"""
      SELECT '{c}' AS column_name, COUNT(*) AS count,
             ROUND(100.0 * SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)
                   / COUNT(*), 2) AS null_pct,
             CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
             CAST(MIN({c}) AS VARCHAR) AS min_str,
             CAST(MAX({c}) AS VARCHAR) AS max_str,
             CAST(NULL AS DOUBLE) AS avg_r, CAST(NULL AS DOUBLE) AS std_r
      FROM lineitem"""

    return " UNION ALL ".join(
        [num("l_orderkey"), num("l_quantity"), num("l_extendedprice"),
         st("l_returnflag"), st("l_shipdate")]) + " ORDER BY column_name"


_register("profile_summarize", _profile_summarize, _profile_oracle())


# ===========================================================================
# driver contract
# ===========================================================================


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return _QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
