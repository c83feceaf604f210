"""Native Delta Lake TRANSACTION-LOG reader (the public Delta
protocol spec: ``_delta_log/<version>.json`` files of newline-JSON
actions — ``metaData`` / ``protocol`` / ``add`` / ``remove`` /
``commitInfo``), implemented directly on Spark's JSON source so the
READ PATH works without the delta-spark package.

Reference parity: the reference pipeline's history lives in a real
Delta table (``deltaprocessing.py:96-101,116``; e.g. the SCD2 UPDATE
commit at ``data/delta/123/balance/delta_table/_delta_log/
00000000000000000005.json``).  delta-spark is absent from this
container (installs prohibited — COVERAGE.md environment note), so
the WRITE path ships as the protocol-fake ``delta_merge.py`` MERGE
recipe; this module closes the other half: reconstructing a table
snapshot from a genuine log.

Semantics implemented (the core of the spec's state reconstruction):
actions replay in version order, the LAST action per file path wins
(``remove`` tombstones a file, a later ``add`` of the same path
resurrects it), and the live snapshot is the parquet union of the
surviving ``add`` paths.  Checkpoint-parquet compaction and column
stats pruning are out of scope — log listing here is one bounded
directory scan (a production log is kept shallow by checkpointing,
so the bounded-actions assumption is the spec's own).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Explicit action schema — the JSON source must not infer (a log with
#: only add actions would otherwise drop the remove column entirely).
LOG_SCHEMA = (
    "metaData struct<id: string, format: struct<provider: string>, "
    "schemaString: string>, "
    "protocol struct<minReaderVersion: int, minWriterVersion: int>, "
    "add struct<path: string, size: bigint, dataChange: boolean>, "
    "remove struct<path: string, dataChange: boolean>, "
    "commitInfo struct<operation: string>"
)


def read_log_actions(spark: SparkSession, table_dir: str) -> DataFrame:
    """All log actions with their commit version, one row per action.

    Distributed JSON scan over ``_delta_log/*.json``; the version is
    parsed from each action's source file name, so ordering survives
    however many input splits the scan plans.
    """
    log_glob = os.path.join(table_dir, "_delta_log", "*.json")
    return (
        spark.read.schema(LOG_SCHEMA)
        .json(log_glob)
        .withColumn(
            "version",
            F.regexp_extract(
                F.input_file_name(), r"(\d+)\.json$", 1
            ).cast("bigint"),
        )
    )


def live_files(actions: DataFrame) -> DataFrame:
    """Surviving ``add`` paths after last-action-wins replay.

    One bounded aggregate over the action rows: per path, take the
    action with the highest ``(version, is_add)`` — a remove and a
    re-add inside one commit resolves to the add, matching the
    spec's idempotent-replay rule.  Log actions are bounded (the
    spec keeps logs shallow via checkpoints), so this is a
    vocabulary-sized shuffle, never data-sized.
    """
    touched = actions.select(
        F.coalesce(F.col("add.path"), F.col("remove.path")).alias("path"),
        "version",
        F.col("add.path").isNotNull().alias("is_add"),
        F.col("add.size").alias("size"),
    ).filter(F.col("path").isNotNull())
    latest = touched.groupBy("path").agg(
        F.max(F.struct("version", "is_add", "size")).alias("__last")
    )
    return latest.filter(F.col("__last.is_add")).select(
        "path", F.col("__last.size").alias("size")
    )


def read_snapshot(spark: SparkSession, table_dir: str) -> DataFrame:
    """The current table snapshot: parquet union of live files.

    The file list is collected driver-side — bounded by live-file
    count, the same driver-side footprint every table format's
    planner has — and handed to ONE parquet scan so Spark plans
    splits/pushdown across all live files together.
    """
    files = [
        os.path.join(table_dir, r.path)
        for r in live_files(read_log_actions(spark, table_dir)).collect()
    ]
    if not files:
        raise ValueError(f"delta log at {table_dir} has no live files")
    return spark.read.parquet(*files)
