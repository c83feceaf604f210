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

# Ordering note (kept from round 2, still deliberate): round-1's
# driver correctness run truncated at the first 50 registered queries,
# so the packs with historically weakest external evidence
# (text/similarity/streaming) register FIRST — under any count cap or
# time budget the driver checks them earliest.  The registry has since
# grown far past 50 (148 as of round 5); every entry carries an oracle.
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


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        dup = set(out) & set(m.QUERIES)
        assert not dup, f"duplicate query names: {dup}"
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out


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
