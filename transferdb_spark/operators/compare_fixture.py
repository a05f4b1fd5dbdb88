"""Deterministic mutated compare target (FIXTURES.md B5, `lineitem_tgt`).

compare-mode needs a target that diverges from the source in known
ways (deleted / added / modified rows — the repair cases of
/root/reference/module/compare/oracle/o2m/report.go:236-302). Rather
than materializing a table, the mutation is a *pure deterministic
derivation* of `lineitem`, defined twice — as a DataFrame transform and
as SQL — so the DuckDB oracle reproduces it bit-for-bit.

Mutation spec (all arithmetic on exact int64/IEEE doubles):
- DELETED : rows with l_orderkey % 997 == 0 AND l_linenumber == 1
            are absent from the target        -> INSERT repairs
- MODIFIED: rows with l_orderkey % 991 == 0 get l_quantity + 1
                                              -> INSERT+DELETE repairs
- ADDED   : rows with l_orderkey % 499 == 0 AND l_linenumber == 1 are
            duplicated with l_orderkey + 10000000 -> DELETE repairs
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LINEITEM_COLS = [
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "l_returnflag",
    "l_linestatus",
    "l_shipdate",
]


def mutated_target(lineitem: DataFrame) -> DataFrame:
    """The corrupted target as a DataFrame derivation of the source."""
    base = lineitem.filter(
        ~((F.col("l_orderkey") % 997 == 0) & (F.col("l_linenumber") == 1))
    ).withColumn(
        "l_quantity",
        F.when(F.col("l_orderkey") % 991 == 0, F.col("l_quantity") + 1).otherwise(
            F.col("l_quantity")
        ),
    )
    added = lineitem.filter(
        (F.col("l_orderkey") % 499 == 0) & (F.col("l_linenumber") == 1)
    ).withColumn("l_orderkey", F.col("l_orderkey") + F.lit(10_000_000))
    return base.select(LINEITEM_COLS).unionAll(added.select(LINEITEM_COLS))


MUTATED_TARGET_SQL = """
SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
       CASE WHEN l_orderkey % 991 = 0 THEN l_quantity + 1 ELSE l_quantity END AS l_quantity,
       l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
FROM lineitem
WHERE NOT (l_orderkey % 997 = 0 AND l_linenumber = 1)
UNION ALL
SELECT l_orderkey + 10000000, l_partkey, l_suppkey, l_linenumber, l_quantity,
       l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
FROM lineitem
WHERE l_orderkey % 499 = 0 AND l_linenumber = 1
"""


ORDERS_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def mutated_orders(orders: DataFrame) -> DataFrame:
    """Keyed-diff twin of mutated_target over `orders` — the fixture's
    only table with a guaranteed-unique key (o_orderkey):
    - DELETED : o_orderkey % 97 == 0 absent        -> INSERT repairs
    - MODIFIED: o_orderkey % 89 == 0 totalprice+1  -> UPDATE repairs
    - ADDED   : o_orderkey % 53 == 0 cloned +10M   -> DELETE repairs
    """
    base = orders.filter(~(F.col("o_orderkey") % 97 == 0)).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") + 1
        ).otherwise(F.col("o_totalprice")),
    )
    added = orders.filter(F.col("o_orderkey") % 53 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000)
    )
    return base.select(ORDERS_COLS).unionAll(added.select(ORDERS_COLS))


MUTATED_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus,
       CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice,
       o_orderdate, o_orderpriority
FROM orders
WHERE NOT (o_orderkey % 97 = 0)
UNION ALL
SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM orders
WHERE o_orderkey % 53 = 0
"""
