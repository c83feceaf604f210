"""SCD Type-2 queries (SURVEY.md §2.3 J6-J10): the events table as an
upsert stream -> versioned history, current view, point-in-time read,
idempotent dedup.

The oracle expresses the same chaining with lead() windows — the
ANSI-SQL ground truth for the Delta-MERGE-shaped recipe in
cdc/scd2.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_pipe_line_spark.cdc.scd2 import (
    apply_scd2,
    as_of,
    current_view,
    scd2_from_upserts,
)
from cdc_pipe_line_spark.delta_merge import payload_columns, widen_scd2


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from cdc_pipe_line_spark.queries import load_table

    return load_table(spark, sf_dir, name)


def _history(spark, sf_dir):
    """Each event is a full-row upsert of its user_id (the reference's
    consumer applied every Kafka event exactly this way,
    consumer.py:152-197)."""
    ev = _t(spark, sf_dir, "events")
    return scd2_from_upserts(ev, "user_id", "ts", ["value"])


def q_scd2_history(spark, sf_dir):
    """J6: full version chain — valid_from/valid_to contiguous per key."""
    return _history(spark, sf_dir).select(
        "key_value", "value", "valid_from", "valid_to", "is_current"
    )


def q_scd2_point_views(spark, sf_dir):
    """J9/P4 + J10 probe-tagged: the current-state view (is_current
    filter) and a point-in-time read over the validity interval, both
    over the same history."""
    h = _history(spark, sf_dir)
    cur = current_view(h).select(
        F.lit("current").alias("probe"),
        "key_value",
        "value",
        F.lit(None).cast("timestamp").alias("valid_from"),
    )
    asof = as_of(h, F.lit("2024-01-15 00:00:00").cast("timestamp")).select(
        F.lit("asof").alias("probe"), "key_value", "value", "valid_from"
    )
    return cur.unionByName(asof)


def q_scd2_wide_drift(spark, sf_dir):
    """Schema-drift materialization (the Delta ``withSchemaEvolution``
    recipe's batch twin, delta_merge.py): CDC events whose payload KEY
    depends on the event type — five distinct metric keys overall, so
    the wide schema grows as new types appear in the feed, exactly the
    reference's new-column-per-quarter drift.  ``apply_scd2`` chains
    the versions, then ``payload_columns`` (a bounded driver-side key
    census) + ``widen_scd2`` (pure projection, no shuffle) materialize
    one column per metric; rows null-fill every metric they don't
    carry.  Payload values use floor() so both engines format the
    string identically."""
    ev = _t(spark, sf_dir, "events")
    cdc = ev.select(
        F.col("event_id").cast("string").alias("event_id"),
        F.lit("update").alias("event_type"),
        F.col("user_id").cast("string").alias("key_value"),
        F.col("ts").alias("timestamp"),
        F.create_map(
            F.concat(F.lit("m_"), ev.event_type),
            F.floor("value").cast("bigint").cast("string"),
        ).alias("new_values"),
    )
    hist = apply_scd2(None, cdc)
    return widen_scd2(hist, payload_columns(hist))


_HISTORY_SQL = """
history AS (
  SELECT CAST(user_id AS VARCHAR) AS key_value, value, ts AS valid_from,
    lead(ts) OVER w AS valid_to,
    lead(ts) OVER w IS NULL AS is_current
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, value ASC))"""

QUERIES = {
    "scd2_history": q_scd2_history,
    "scd2_point_views": q_scd2_point_views,
    "scd2_wide_drift": q_scd2_wide_drift,
}

ORACLE = {
    "scd2_history": f"""
WITH {_HISTORY_SQL}
SELECT key_value, value, valid_from, valid_to, is_current FROM history""",
    "scd2_point_views": f"""
WITH {_HISTORY_SQL}
SELECT 'current' AS probe, key_value, value,
  CAST(NULL AS TIMESTAMP) AS valid_from
FROM history WHERE is_current
UNION ALL
SELECT 'asof', key_value, value, valid_from FROM history
WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
  AND (valid_to IS NULL OR TIMESTAMP '2024-01-15 00:00:00' < valid_to)""",
    "scd2_wide_drift": """
WITH chained AS (
  SELECT CAST(user_id AS VARCHAR) AS key_value,
    ts AS valid_from,
    lead(ts) OVER w AS valid_to,
    lead(ts) OVER w IS NULL AS is_current,
    CAST(event_id AS VARCHAR) AS _event_id,
    'update' AS _event_type,
    event_type AS et,
    CAST(CAST(floor(value) AS BIGINT) AS VARCHAR) AS val
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC))
SELECT key_value, valid_from, valid_to, is_current, _event_id, _event_type,
  CASE WHEN et = 'click' THEN val END AS m_click,
  CASE WHEN et = 'error' THEN val END AS m_error,
  CASE WHEN et = 'purchase' THEN val END AS m_purchase,
  CASE WHEN et = 'signup' THEN val END AS m_signup,
  CASE WHEN et = 'view' THEN val END AS m_view
FROM chained""",
}
