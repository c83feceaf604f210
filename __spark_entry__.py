"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Every query here maps to a SURVEY.md §2 operator; the implementation
lives in ``cdc_pipe_line_spark`` and the oracle SQL reproduces the
same semantics in ANSI/DuckDB SQL over the same parquet views.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_pipe_line_spark import fixtures
from cdc_pipe_line_spark.cdc import diff as cdc_diff

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table; pin UTC so timestamp output matches DuckDB."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# CDC diff family (SURVEY §2.3 J1-J5) — the flagship path
# --------------------------------------------------------------------------

def _orders_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    v1 = fixtures.orders_snapshot_v1(orders)
    v2 = fixtures.orders_snapshot_v2(orders)
    return cdc_diff.snapshot_diff(v2, v1, "o_orderkey")


def q_cdc_diff_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counts of insert/update/delete between two orders snapshots."""
    return (
        _orders_diff(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
    )


def q_cdc_diff_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key diff rows with the changed-column list as a csv string."""
    d = _orders_diff(spark, sf_dir)
    return d.select(
        "event_type",
        "key_value",
        F.coalesce(
            F.array_join(F.array_sort("changed_cols"), ","), F.lit("")
        ).alias("changed_cols_csv"),
    )


def q_cdc_first_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First upload -> all rows insert events (app/app.py:156-174)."""
    orders = _t(spark, sf_dir, "orders")
    ev = cdc_diff.first_load_events(fixtures.orders_snapshot_v1(orders), "o_orderkey")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count(F.col("new_values")["o_orderstatus"]).alias("n_payload_status"),
    )


_DIFF_CTE = f"WITH v1 AS ({fixtures.V1_SQL}), v2 AS ({fixtures.V2_SQL}), j AS (\n" \
    "SELECT v2.o_orderkey AS nk, v1.o_orderkey AS pk,\n" \
    "  CASE WHEN v1.o_orderkey IS NULL THEN 'insert'\n" \
    "       WHEN v2.o_orderkey IS NULL THEN 'delete'\n" \
    "       WHEN (v2.o_custkey IS DISTINCT FROM v1.o_custkey)\n" \
    "         OR (v2.o_orderstatus IS DISTINCT FROM v1.o_orderstatus)\n" \
    "         OR (v2.o_totalprice IS DISTINCT FROM v1.o_totalprice)\n" \
    "         OR (v2.o_orderdate IS DISTINCT FROM v1.o_orderdate)\n" \
    "         OR (v2.o_orderpriority IS DISTINCT FROM v1.o_orderpriority)\n" \
    "       THEN 'update'\n" \
    "       END AS event_type,\n" \
    "  CONCAT_WS(',',\n" \
    "    CASE WHEN v2.o_custkey IS DISTINCT FROM v1.o_custkey THEN 'o_custkey' END,\n" \
    "    CASE WHEN v2.o_orderdate IS DISTINCT FROM v1.o_orderdate THEN 'o_orderdate' END,\n" \
    "    CASE WHEN v2.o_orderpriority IS DISTINCT FROM v1.o_orderpriority THEN 'o_orderpriority' END,\n" \
    "    CASE WHEN v2.o_orderstatus IS DISTINCT FROM v1.o_orderstatus THEN 'o_orderstatus' END,\n" \
    "    CASE WHEN v2.o_totalprice IS DISTINCT FROM v1.o_totalprice THEN 'o_totalprice' END\n" \
    "  ) AS changed_cols_csv,\n" \
    "  CAST(COALESCE(v2.o_orderkey, v1.o_orderkey) AS VARCHAR) AS key_value\n" \
    "FROM v2 FULL OUTER JOIN v1 ON CAST(v2.o_orderkey AS VARCHAR) = CAST(v1.o_orderkey AS VARCHAR))\n"


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "cdc_diff_summary": q_cdc_diff_summary,
    "cdc_diff_events": q_cdc_diff_events,
    "cdc_first_load": q_cdc_first_load,
}

ORACLE: dict[str, str] = {
    "cdc_diff_summary": _DIFF_CTE
    + "SELECT event_type, count(*) AS n_events FROM j WHERE event_type IS NOT NULL GROUP BY event_type",
    "cdc_diff_events": _DIFF_CTE
    + "SELECT event_type, key_value,\n"
    "  CASE WHEN event_type = 'update' THEN changed_cols_csv ELSE '' END AS changed_cols_csv\n"
    "FROM j WHERE event_type IS NOT NULL",
    "cdc_first_load": f"WITH v1 AS ({fixtures.V1_SQL}) "
    "SELECT 'insert' AS event_type, count(*) AS n_events, "
    "count(o_orderstatus) AS n_payload_status FROM v1",
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_cdc_diff_summary(spark, DEFAULT_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each sql-expressible query."""
    return dict(ORACLE)
