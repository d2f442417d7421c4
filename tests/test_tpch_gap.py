"""TPC-H q2/q11/q12/q16/q20 — the five queries the driver ledger cannot carry.

The reference runs all 22 TPC-H queries (`test/sql/tpch/tpch.test:28-43`,
`PRAGMA tpch(i)` against dbgen answers). The driver's synthetic testdata has no
`partsupp` table and no `l_shipmode`/`l_commitdate`/`l_receiptdate` columns
(TESTDATA.md), so these five can never be `queries()` ledger entries — a data
gap, not an engine gap. This module closes the evidence gap as far as possible
without driver data: it synthesizes the missing tables/columns as deterministic
parquet fixtures, then runs the SAME SQL text through Spark SQL and through
DuckDB and value-compares the results (the same three checks the driver gate
applies: row count, column names, order-insensitive values).

Numeric columns are generated as integer-valued doubles so every SUM/product is
exact in binary floating point — the comparison cannot flake on summation order.
"""

from __future__ import annotations

import random

import pandas as pd
import pytest

from _oracle import compare

# ---------------------------------------------------------------------------
# Deterministic fixture data (seed=7): full TPC-H schema for the gap queries,
# including the columns the driver testdata lacks.
# ---------------------------------------------------------------------------

_SHIPMODES = ["MAIL", "SHIP", "AIR", "TRUCK", "RAIL", "FOB", "REG AIR"]
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_TYPES = [
    "ECONOMY ANODIZED STEEL", "LARGE BRUSHED BRASS", "MEDIUM POLISHED COPPER",
    "SMALL PLATED TIN", "STANDARD BURNISHED NICKEL", "PROMO POLISHED BRASS",
]
_NAME_WORDS = ["forest", "almond", "antique", "azure", "beige", "bisque", "blanched"]


def _gen_tables(rng: random.Random) -> dict[str, pd.DataFrame]:
    n_part, n_supp, n_cust, n_ord = 200, 20, 100, 600

    region = pd.DataFrame(
        {"r_regionkey": range(5), "r_name": [f"REGION_{i}" for i in range(5)]}
    )
    nation = pd.DataFrame(
        {
            "n_nationkey": range(25),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": [i % 5 for i in range(25)],
        }
    )
    supplier = pd.DataFrame(
        {
            "s_suppkey": range(1, n_supp + 1),
            "s_name": [f"Supplier#{i:04d}" for i in range(1, n_supp + 1)],
            "s_address": [f"addr-{i}" for i in range(1, n_supp + 1)],
            "s_nationkey": [rng.randrange(25) for _ in range(n_supp)],
            "s_phone": [f"{rng.randrange(10,35)}-{rng.randrange(100,999)}" for _ in range(n_supp)],
            "s_acctbal": [float(rng.randrange(-999, 9999)) for _ in range(n_supp)],
            "s_comment": [
                "wary Customer deposits sleep Complaints" if i % 7 == 0 else f"comment {i}"
                for i in range(1, n_supp + 1)
            ],
        }
    )
    part = pd.DataFrame(
        {
            "p_partkey": range(1, n_part + 1),
            "p_name": [
                f"{rng.choice(_NAME_WORDS)} {rng.choice(_NAME_WORDS)} {i}"
                for i in range(1, n_part + 1)
            ],
            "p_mfgr": [f"Manufacturer#{1 + i % 5}" for i in range(n_part)],
            "p_brand": [f"Brand#{1 + i % 5}{1 + i % 4}" for i in range(n_part)],
            "p_type": [rng.choice(_TYPES) for _ in range(n_part)],
            "p_size": [rng.randrange(1, 51) for _ in range(n_part)],
            "p_retailprice": [float(900 + (i % 200)) for i in range(n_part)],
        }
    )
    ps_rows = []
    for pk in range(1, n_part + 1):
        for sk in rng.sample(range(1, n_supp + 1), 4):
            ps_rows.append(
                (pk, sk, rng.randrange(1, 10000), float(rng.randrange(1, 1001)))
            )
    partsupp = pd.DataFrame(
        ps_rows, columns=["ps_partkey", "ps_suppkey", "ps_availqty", "ps_supplycost"]
    )
    customer = pd.DataFrame(
        {
            "c_custkey": range(1, n_cust + 1),
            "c_nationkey": [rng.randrange(25) for _ in range(n_cust)],
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": range(1, n_ord + 1),
            "o_custkey": [rng.randrange(1, n_cust + 1) for _ in range(n_ord)],
            "o_orderpriority": [rng.choice(_PRIORITIES) for _ in range(n_ord)],
            "o_orderdate": pd.to_datetime(
                [
                    f"199{rng.randrange(3,6)}-{rng.randrange(1,13):02d}-{rng.randrange(1,29):02d}"
                    for _ in range(n_ord)
                ]
            ).date,
        }
    )
    li_rows = []
    for ok in range(1, n_ord + 1):
        for _ in range(rng.randrange(1, 8)):
            ship_y, ship_m, ship_d = rng.randrange(1993, 1996), rng.randrange(1, 13), rng.randrange(1, 29)
            commit_off, receipt_off = rng.randrange(-30, 31), rng.randrange(-15, 46)
            ship = pd.Timestamp(ship_y, ship_m, ship_d)
            li_rows.append(
                (
                    ok,
                    rng.randrange(1, n_part + 1),
                    rng.randrange(1, n_supp + 1),
                    float(rng.randrange(1, 51)),
                    ship.date(),
                    (ship + pd.Timedelta(days=commit_off)).date(),
                    (ship + pd.Timedelta(days=receipt_off)).date(),
                    rng.choice(_SHIPMODES),
                )
            )
    lineitem = pd.DataFrame(
        li_rows,
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
            "l_shipdate", "l_commitdate", "l_receiptdate", "l_shipmode",
        ],
    )
    return {
        "region": region, "nation": nation, "supplier": supplier, "part": part,
        "partsupp": partsupp, "customer": customer, "orders": orders,
        "lineitem": lineitem,
    }


@pytest.fixture(scope="module")
def tpch_env(spark, tmp_path_factory):
    """Parquet fixtures + Spark temp views (gap_* prefix) + DuckDB views."""
    import duckdb

    base = tmp_path_factory.mktemp("tpch_gap")
    tables = _gen_tables(random.Random(7))
    con = duckdb.connect()
    for name, df in tables.items():
        path = str(base / f"{name}.parquet")
        df.to_parquet(path, index=False)
        spark.read.parquet(path).createOrReplaceTempView(f"gap_{name}")
        con.execute(f"CREATE VIEW gap_{name} AS SELECT * FROM '{path}'")
    yield spark, con
    for name in tables:
        spark.catalog.dropTempView(f"gap_{name}")
    con.close()


def _check(tpch_env, sql: str, min_rows: int = 1):
    spark, con = tpch_env
    res = compare(spark.sql(sql), con, sql)
    assert res["value_match"], res
    # guard against a vacuously-true comparison on an empty result
    assert res["rows_spark"] >= min_rows, res


# ---------------------------------------------------------------------------
# The five queries. Text follows the TPC-H spec shapes the reference executes
# via PRAGMA tpch(i) (predicate literals retargeted to the fixture domain);
# one SQL string runs verbatim on BOTH engines.
# ---------------------------------------------------------------------------


def test_q2_minimum_cost_supplier(tpch_env):
    _check(tpch_env, """
        SELECT s_acctbal, s_name, n_name, p_partkey, p_mfgr, s_address,
               s_phone, s_comment
        FROM gap_part, gap_supplier, gap_partsupp, gap_nation, gap_region
        WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
          AND p_size = 15 AND p_type LIKE '%BRASS'
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'REGION_1'
          AND ps_supplycost = (
              SELECT MIN(ps_supplycost)
              FROM gap_partsupp, gap_supplier, gap_nation, gap_region
              WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
                AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
                AND r_name = 'REGION_1')
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """)


def test_q11_important_stock(tpch_env):
    _check(tpch_env, """
        SELECT ps_partkey, SUM(ps_supplycost * ps_availqty) AS value
        FROM gap_partsupp, gap_supplier, gap_nation
        WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND n_name = 'NATION_3'
        GROUP BY ps_partkey
        HAVING SUM(ps_supplycost * ps_availqty) > (
            SELECT SUM(ps_supplycost * ps_availqty) * 0.01
            FROM gap_partsupp, gap_supplier, gap_nation
            WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
              AND n_name = 'NATION_3')
        ORDER BY value DESC
    """)


def test_q12_shipping_modes_priority(tpch_env):
    _check(tpch_env, """
        SELECT l_shipmode,
               SUM(CASE WHEN o_orderpriority = '1-URGENT'
                         OR o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END)
                   AS high_line_count,
               SUM(CASE WHEN o_orderpriority <> '1-URGENT'
                        AND o_orderpriority <> '2-HIGH' THEN 1 ELSE 0 END)
                   AS low_line_count
        FROM gap_orders, gap_lineitem
        WHERE o_orderkey = l_orderkey
          AND l_shipmode IN ('MAIL', 'SHIP')
          AND l_commitdate < l_receiptdate AND l_shipdate < l_commitdate
          AND l_receiptdate >= DATE '1994-01-01'
          AND l_receiptdate < DATE '1995-01-01'
        GROUP BY l_shipmode
        ORDER BY l_shipmode
    """, min_rows=2)


def test_q16_parts_supplier_relationship(tpch_env):
    _check(tpch_env, """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT ps_suppkey) AS supplier_cnt
        FROM gap_partsupp, gap_part
        WHERE p_partkey = ps_partkey
          AND p_brand <> 'Brand#11' AND p_type NOT LIKE 'MEDIUM POLISHED%'
          AND p_size IN (1, 4, 7, 15, 22, 30, 41, 49)
          AND ps_suppkey NOT IN (
              SELECT s_suppkey FROM gap_supplier
              WHERE s_comment LIKE '%Customer%Complaints%')
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """, min_rows=5)


def test_q20_potential_part_promotion(tpch_env):
    _check(tpch_env, """
        SELECT s_name, s_address
        FROM gap_supplier, gap_nation
        WHERE s_suppkey IN (
            SELECT ps_partsupp.ps_suppkey
            FROM gap_partsupp AS ps_partsupp
            WHERE ps_partkey IN (
                SELECT p_partkey FROM gap_part WHERE p_name LIKE 'forest%')
              AND ps_availqty > (
                  SELECT 0.5 * SUM(l_quantity)
                  FROM gap_lineitem
                  WHERE l_partkey = ps_partsupp.ps_partkey
                    AND l_suppkey = ps_partsupp.ps_suppkey
                    AND l_shipdate >= DATE '1994-01-01'
                    AND l_shipdate < DATE '1995-01-01'))
          AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
        ORDER BY s_name
    """)
