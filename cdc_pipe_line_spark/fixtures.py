"""Deterministic snapshot-pair derivation from the ``orders`` table.

FIXTURES.md §1: CDC diff tests need two versions of one keyed table.
Derived purely from key arithmetic so the DuckDB oracle can reproduce
them exactly (no randomness, no floats beyond IEEE-exact addition):

- v1 = orders where ``o_orderkey % 10 != 0``
- v2 = orders where ``o_orderkey % 50 != 1``, with
  ``o_totalprice + 1000.0`` on rows where ``o_orderkey % 20 == 3``

So, relative to v1 -> v2:

- inserts  = keys with ``% 10 == 0`` (in v2 only)
- deletes  = keys with ``% 50 == 1`` (v1 only; % 50 == 1 implies % 10 == 1)
- updates  = keys with ``% 20 == 3`` (in both; % 20 == 3 implies % 10 == 3,
  and never % 50 == 1), changed column = o_totalprice
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: SQL fragments the DuckDB oracle uses to derive the same pair.
V1_SQL = "SELECT * FROM orders WHERE o_orderkey % 10 != 0"
V2_SQL = (
    "SELECT o_orderkey, o_custkey, o_orderstatus, "
    "CASE WHEN o_orderkey % 20 = 3 THEN o_totalprice + 1000.0 "
    "ELSE o_totalprice END AS o_totalprice, o_orderdate, o_orderpriority "
    "FROM orders WHERE o_orderkey % 50 != 1"
)


def orders_snapshot_v1(orders: DataFrame) -> DataFrame:
    return orders.filter(F.col("o_orderkey") % 10 != 0)


def orders_snapshot_v2(orders: DataFrame) -> DataFrame:
    return orders.filter(F.col("o_orderkey") % 50 != 1).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 20 == 3, F.col("o_totalprice") + F.lit(1000.0)
        ).otherwise(F.col("o_totalprice")),
    )
