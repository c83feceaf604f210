"""Query registry: every SURVEY.md §2 operator as a (spark, sf_dir) ->
DataFrame callable plus (where SQL-expressible) a DuckDB oracle twin.

Each submodule contributes ``QUERIES`` and ``ORACLE`` dicts; this
package merges them for ``__spark_entry__.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cdc_pipe_line_spark.queries import (
    analytics_q,
    cdc_q,
    io_q,
    quality_q,
    relational_q,
    reshape_q,
    scd2_q,
    similarity_q,
    streaming_q,
    text_q,
    timeseries_q,
)

# Ordering note: the driver's per-round correctness budget checks the
# FIRST ~50 registered queries, so registration order decides which
# queries get fresh external evidence each round.  Round 2 pinned
# text/similarity/streaming first (then the weakest-evidence packs);
# rounds 3-5 therefore re-checked the same registry[0:50] while 79
# later registrations never saw a driver run (VERDICT.md round 5,
# item 1).  Round 6 rotates: the names in ``_DRIVER_ROTATION`` — the
# exact set absent from CORRECTNESS_r01..r05 — register first, in a
# fixed order, so the driver's budget lands on never-driver-checked
# queries.  Each future round, names that have since appeared in a
# CORRECTNESS file move out of the rotation; new queries register
# after the rotation block and enter it once the backlog drains.
_MODULES = [
    text_q,
    similarity_q,
    streaming_q,
    timeseries_q,
    cdc_q,
    io_q,
    scd2_q,
    reshape_q,
    relational_q,
    analytics_q,
    quality_q,
]

#: Round-11 rotation: the backlog is EMPTY (every one of the 313
#: round-10 names has a driver CORRECTNESS row — gen_rotation.py
#: reports 0 never-checked), so this round the rotation carries the
#: names whose SEMANTICS or IMPLEMENTATION changed in round 11 and
#: therefore need fresh external evidence: the clustering-coefficient
#: primary/diagnostic swap (r10 verdict item 2), the functional-SCC
#: Round-13 rotation: the NEW query (DV-aware change-feed legs over
#: OVERWRITE/RESTORE) leads, then every query whose execution path
#: round 13 rewrote — the whole native-Delta family now rides
#: spec-encoded deletion vectors (roaring bitmap + z85 + inline),
#: validated decode on both scan routes, the non-DV scan fast path,
#: driver-side small-log replay (snapshot reads, metadata lookups,
#: TIMESTAMP AS OF), consistent checkpoint part sets, and the
#: manifest lifecycle — so each gets fresh external evidence against
#: its oracle.  Regenerate with ``python tools/gen_rotation.py``.
_DRIVER_ROTATION = (
    "cdc_delta_cdf_restore",
    "qa_delta_dv_invariants",
    "cdc_delta_dv_dml",
    "cdc_delta_dv_merge",
    "cdc_scd2_dv_merge",
    "io_delta_vacuum_restore",
    "io_delta_time_travel",
    "qa_delta_history_metrics",
    "io_delta_native_writer",
    "io_delta_log_scan",
    "io_delta_checkpoint",
    "io_delta_partitioned_prune",
    "io_delta_schema_evolution",
    "cdc_scd2_delta_native",
    "stream_delta_txn_sink",
    "qa_delta_invariants",
    "cdc_delta_changes",
    "stream_delta_source",
    "io_delta_stats_skipping",
    "cdc_delta_row_dml",
    "io_delta_zorder_skipping",
    "cdc_delta_merge_native",
    "cdc_delta_changes_rowlevel",
    "stream_delta_cdf",
    "qa_delta_check_constraints",
    "io_delta_generated_partition",
    "io_delta_column_mapping",
    "qa_delta_describe_detail",
)



def _rotated(merged: dict) -> dict:
    """Reorder a merged registry dict: rotation names first (in
    ``_DRIVER_ROTATION`` order), everything else after in module
    order.  Keys only reorder — never appear or vanish."""
    front = {n: merged[n] for n in _DRIVER_ROTATION if n in merged}
    rest = {n: v for n, v in merged.items() if n not in front}
    return {**front, **rest}


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        dup = set(out) & set(m.QUERIES)
        assert not dup, f"duplicate query names: {dup}"
        out.update(m.QUERIES)
    missing = set(_DRIVER_ROTATION) - set(out)
    assert not missing, f"rotation names not registered: {missing}"
    return _rotated(out)


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return _rotated(out)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table; pin UTC so timestamps match the oracle.

    ``events.ts`` has shipped in two parquet encodings across driver
    rounds — TIMESTAMP(NANOS) (rejected by Spark's reader: read nanos
    as long, floor-divide to micros; integer ``div`` because a double
    division would lose precision at 1e18 ns) and TIMESTAMP(MICROS)
    ``isAdjustedToUTC=false`` (which Spark 4 infers as
    ``timestamp_ntz``).  Both are normalized to ``timestamp`` under the
    pinned UTC zone, so every downstream consumer — watermarks, window
    functions, the JSON staging round-trip in ``streaming_q._stage``
    (whose ``timestampFormat`` option the writer silently IGNORES for
    ntz columns, producing strings the TZ read schema can't parse) —
    sees one canonical type in ANY session, engine-configured or
    vanilla.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif field.name == "ts" and field.dataType.simpleString() == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    # The synthetic test files are single-row-group parquet, so the scan
    # is ONE input split and every downstream narrow op runs on one core.
    # For the text/embedding tables the per-row work (shingling, minhash,
    # cosine) dwarfs a sub-MB shuffle, so fan out to the session's
    # parallelism when the scan under-splits.  Relational tables are left
    # alone: their first shuffle (join/agg) already spreads the work, and
    # a forced repartition just adds a stage.  At production scale a
    # table has >> defaultParallelism splits and this is a no-op.
    if name in ("documents", "embeddings"):
        parallelism = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < parallelism:
            df = df.repartition(parallelism)
    return df
