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

#: Round-9 rotation: ``join_q12_ship_priority`` first (its round-8
#: hash-fail was adjudicated an ORACLE typing bug — DuckDB HUGEINT
#: sum — fixed this round with CAST AS BIGINT; re-check lands the
#: green row), then the 52 round-8 additions with no row in any
#: CORRECTNESS_r{01..08}.json, in original registration order —
#: regenerate with ``python tools/gen_rotation.py`` at round start.
#: The driver's ~50-query budget covers most of them this round;
#: round-9 additions register behind them.
_DRIVER_ROTATION = (
    "join_q12_ship_priority",
    "text_decontaminate_bloom",
    "text_lm_kneser_ney",
    "llm_mixture_temperature",
    "text_hash_embed_lsh",
    "text_line_dedup",
    "llm_url_dedup",
    "llm_dsir_weights",
    "text_quality_fasttext",
    "dedup_prefix_filter",
    "llm_chat_template_render",
    "llm_preference_pairs",
    "text_html_extract",
    "text_robots_compliance",
    "text_rake_keywords",
    "mm_jpeg_restart_decode",
    "mm_exif_orientation",
    "mm_png_filter_decode",
    "mm_media_embed_lsh",
    "mm_bmp_decode",
    "sim_mmr_rerank",
    "mm_tiff_decode",
    "mm_srt_parse",
    "mm_id3_tags",
    "stream_histogram_quantiles",
    "stream_python_datasink",
    "stream_watermark_metrics",
    "ts_downsample_m4",
    "ts_linear_trend",
    "ts_piecewise_trend",
    "ts_forecast_baselines",
    "ts_burst_kleinberg",
    "ts_haar_dwt",
    "cdc_disorder_audit",
    "cdc_apply_verify",
    "cdc_incremental_snapshot",
    "io_compaction_smallfiles",
    "io_delta_log_scan",
    "io_json_parse_modes",
    "scalar_try_functions",
    "agg_reservoir_sample",
    "agg_log_histogram_quantiles",
    "graph_clustering_coeff",
    "graph_kcore",
    "agg_bitmap_distinct",
    "graph_random_walks",
    "graph_personalized_pagerank",
    "agg_decay_engagement",
    "agg_delta_contribution",
    "graph_hits_scores",
    "qa_functional_deps",
    "qa_inclusion_deps",
    "qa_schema_contract",
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
