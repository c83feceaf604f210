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

from cdc_pipe_line_spark.cdc.scd2 import as_of, current_view, scd2_from_upserts


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


def q_scd2_current(spark, sf_dir):
    """J9/P4: current-state view = is_current filter."""
    return current_view(_history(spark, sf_dir)).select("key_value", "value")


def q_scd2_as_of(spark, sf_dir):
    """J10: point-in-time read over the validity interval."""
    h = _history(spark, sf_dir)
    return as_of(h, F.lit("2024-01-15 00:00:00").cast("timestamp")).select(
        "key_value", "value", "valid_from"
    )


def q_dedup_replayed_events(spark, sf_dir):
    """J8: replay the stream twice; idempotent dedup restores exactly
    one row per event_id (deterministic first-by-ts survivor)."""
    from cdc_pipe_line_spark.cdc.scd2 import dedup_events

    ev = _t(spark, sf_dir, "events")
    replayed = ev.unionByName(ev)  # at-least-once delivery simulation
    deduped = dedup_events(replayed, order_cols=["ts"])
    return deduped.groupBy("event_type").agg(F.count("*").alias("n_events"))


_HISTORY_SQL = """
history AS (
  SELECT CAST(user_id AS VARCHAR) AS key_value, value, ts AS valid_from,
    lead(ts) OVER w AS valid_to,
    lead(ts) OVER w IS NULL AS is_current
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, value ASC))"""

QUERIES = {
    "scd2_history": q_scd2_history,
    "scd2_current_state": q_scd2_current,
    "scd2_as_of": q_scd2_as_of,
    "scd2_dedup_replayed": q_dedup_replayed_events,
}

ORACLE = {
    "scd2_history": f"""
WITH {_HISTORY_SQL}
SELECT key_value, value, valid_from, valid_to, is_current FROM history""",
    "scd2_current_state": f"""
WITH {_HISTORY_SQL}
SELECT key_value, value FROM history WHERE is_current""",
    "scd2_as_of": f"""
WITH {_HISTORY_SQL}
SELECT key_value, value, valid_from FROM history
WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
  AND (valid_to IS NULL OR TIMESTAMP '2024-01-15 00:00:00' < valid_to)""",
    "scd2_dedup_replayed": """
SELECT event_type, count(*) AS n_events
FROM (SELECT DISTINCT event_id, event_type FROM events)
GROUP BY event_type""",
}
