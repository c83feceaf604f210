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

#: Round-15 rotation (optimization round 2): the queries whose CODE
#: PATHS this round and round 14 rewrote lead — the r15 Arrow-kernel
#: rewrites (text_profile, the MinHash/SimHash/winnowing fused kernels
#: and every query sharing them, the SemDeDup kernels, khop) and then
#: the r14-touched ANN/LM family that never got external verification
#: (VERDICT r14 item 6) — so the driver's ~50-name budget lands on the
#: code that changed, not on already-fresh rows.  The remainder keeps
#: the stalest-evidence-ascending discipline (tools/gen_rotation.py).
_DRIVER_ROTATION = (
    "text_profile",
    "dedup_minhash_lsh",
    "dedup_incremental",
    "dedup_simhash",
    "text_winnowing",
    "dedup_semantic",
    "graph_khop_reach",
    "text_cross_dedup_matrix",
    "dedup_ngram_containment",
    "text_dedup_savings",
    "cdc_delta_dv_dml",
    "text_lm_score",
    "text_lm_kneser_ney",
    "sim_cosine_near_dup",
    "sim_knn_lsh",
    "sim_knn_ivf",
    "sim_knn_sq8",
    "sim_knn_ivf_sq8",
    "sim_knn_mips",
    "sim_knn_filtered",
    "sim_range_search",
    "sim_knn_bruteforce",
    "llm_quality_pipeline",
    "llm_epoch_shuffle",
    "text_langid_eval",
    "mm_image_resize",
    "sim_knn_pq",
    "mm_audio_stats",
    "mm_audio_decimate",
    "mm_gif_decode",
    "mm_mp4_samples",
    "mm_media_pipeline",
    "mm_media_embed_knn",
    "mm_image_channel_stats",
    "sim_source_centroids",
    "sim_recall_at_k",
    "stream_doc_gate",
    "stream_sliding_trending",
    "ts_ohlc_bars",
    "ts_interpolate_gaps",
    "ts_dow_seasonality",
    "ts_ewma",
    "ts_holt_trend",
    "ts_anomaly_mad",
    "ts_time_to_convert",
    "ts_cross_corr",
    "ts_cusum_changepoint",
    "ts_holt_backtest",
    "ts_autocorrelation",
    "ts_rolling_median",
    "ts_peak_concurrency",
    "cdc_changelog_compact",
    "join_fact_scd2_enrich",
    "cdc_bitemporal_asof",
    "scd3_prev_current",
    "cdc_sequence_gap_audit",
    "cdc_column_churn",
    "io_dpp_join",
    "io_mergeschema_scan",
    "io_csv_quarantine",
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
