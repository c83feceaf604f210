"""Reshape queries (SURVEY.md §2.4): pivot/unpivot round-trip on an
orders-derived wide table, schema-drift union, lineage columns."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_pipe_line_spark.reshape import (
    add_lineage,
    pivot_to_wide,
    union_with_drift,
    unpivot_to_tall,
)

YEARS = [str(y) for y in range(1995, 2002)]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from cdc_pipe_line_spark.queries import load_table

    return load_table(spark, sf_dir, name)


def _tall_orders(spark, sf_dir):
    """Tall (priority, status, yr, value) frame — the engine's
    preferred internal form (SURVEY.md §1.1 note 5)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderstatus").alias("status"),
        F.year("o_orderdate").cast("string").alias("yr"),
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("value"))


def q_unpivot_roundtrip(spark, sf_dir):
    """R1 + R9: unpivot(pivot(tall)) — the pivot uses a FIXED domain
    (no distinct job, bounded schema — the 100 TB-safe pivot) and null
    cells from it survive the round trip as explicit null rows (the
    reference preserved nulls in per-metric frames).  A pivot defect
    cannot cancel out: a wrong cell lands in a wrong (yr, value) row
    of the tall output and fails the hash."""
    wide = pivot_to_wide(
        _tall_orders(spark, sf_dir),
        ["priority", "status"],
        "yr",
        "value",
        values=YEARS,
    )
    return unpivot_to_tall(
        wide, ["priority", "status"], YEARS, var_name="yr", value_name="value"
    )


def q_union_drift(spark, sf_dir):
    """R3: unionByName(allowMissingColumns) over drifted projections."""
    o = _t(spark, sf_dir, "orders")
    a = o.select("o_orderkey", "o_totalprice")
    b = o.select("o_orderkey", "o_orderpriority")
    return union_with_drift([a, b])


def q_lineage_columns(spark, sf_dir):
    """R4: constant lineage columns prepended to a dim join."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")).select(
        F.col("n_name").alias("nation"), F.col("r_name").alias("region")
    )
    return add_lineage(joined, SECTOR="GAS UTILITY", FREQUENCY="TTM")


def q_event_flatten(spark, sf_dir):
    """R7 (consumer.py:259-319): update events flattened to rows —
    envelope + full payload as a JSON ``data`` column + extracted
    payload columns + ``_date_column``/``_operational`` markers.  The
    reference built one single-row DataFrame per event; here it is one
    distributed projection over the diff."""
    from cdc_pipe_line_spark.queries.cdc_q import _orders_diff

    d = _orders_diff(spark, sf_dir).filter(F.col("event_type") == "update")
    status = F.col("new_values")["o_orderstatus"]
    prio = F.col("new_values")["o_orderpriority"]
    return d.select(
        "event_type",
        "key_value",
        F.to_json(
            F.struct(status.alias("o_orderstatus"), prio.alias("o_orderpriority"))
        ).alias("data"),
        status.alias("o_orderstatus"),
        prio.alias("o_orderpriority"),
        F.lit("o_orderdate").alias("_date_column"),
        F.lit(True).alias("_operational"),
    )


_TALL_SQL = """
SELECT o_orderpriority AS priority, o_orderstatus AS status,
  CAST(year(o_orderdate) AS VARCHAR) AS yr,
  round(sum(o_totalprice), 2) AS value
FROM orders GROUP BY 1, 2, 3"""

QUERIES = {
    "reshape_unpivot_roundtrip": q_unpivot_roundtrip,
    "reshape_union_drift": q_union_drift,
    "reshape_lineage_columns": q_lineage_columns,
    "reshape_event_flatten": q_event_flatten,
}

ORACLE = {
    "reshape_unpivot_roundtrip": f"""
WITH tall AS ({_TALL_SQL}),
groups AS (SELECT DISTINCT priority, status FROM tall),
years AS (SELECT unnest(['{"','".join(YEARS)}']) AS yr)
SELECT g.priority, g.status, y.yr, t.value
FROM groups g CROSS JOIN years y
LEFT JOIN tall t ON t.priority = g.priority AND t.status = g.status AND t.yr = y.yr""",
    "reshape_union_drift": """
SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority FROM orders
UNION ALL
SELECT o_orderkey, CAST(NULL AS DOUBLE), o_orderpriority FROM orders""",
    "reshape_lineage_columns": """
SELECT 'GAS UTILITY' AS SECTOR, 'TTM' AS FREQUENCY, n_name AS nation, r_name AS region
FROM nation JOIN region ON n_regionkey = r_regionkey""",
}


def _event_flatten_oracle() -> str:
    from cdc_pipe_line_spark.queries.cdc_q import _DIFF_CTE

    return (
        _DIFF_CTE
        + """
SELECT j.event_type, j.key_value,
  '{"o_orderstatus":"' || v2.o_orderstatus || '","o_orderpriority":"'
    || v2.o_orderpriority || '"}' AS data,
  v2.o_orderstatus, v2.o_orderpriority,
  'o_orderdate' AS _date_column, TRUE AS _operational
FROM j JOIN v2 ON CAST(v2.o_orderkey AS VARCHAR) = j.key_value
WHERE j.event_type = 'update'"""
    )


ORACLE["reshape_event_flatten"] = _event_flatten_oracle()
