"""Streaming (T1-T8) tests at sf0.001: oracle parity for the
registered queries plus SCD2 invariants on the streamed history."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_pipe_line_spark.queries import streaming_q
from tests.conftest import SF_DIR, assert_matches_oracle


@pytest.mark.parametrize(
    "name",
    [
        "stream_daily_counts",
        "stream_dedup_counts",
        "stream_scd2_current",
        "stream_every_n_trigger",
    ],
)
def test_streaming_query_matches_oracle(spark, duck, name):
    df = streaming_q.QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, duck, streaming_q.ORACLE[name])


def test_stream_scd2_invariants(spark):
    """Golden SCD2 invariants (SURVEY.md §5) hold on the *streamed*
    history: at most one current row per key; every expired row has a
    valid_to; version intervals never overlap."""
    import os
    import shutil
    import uuid

    from cdc_pipe_line_spark import streaming as st

    base = streaming_q._stage(spark, SF_DIR, "cdc")
    run_dir = f"/tmp/cdc_stream_run/{uuid.uuid4().hex}"
    stream = (
        spark.readStream.schema(st.EVENT_SCHEMA)
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.json")
        .option("timestampFormat", streaming_q._TS_FMT)
        .option("maxFilesPerTrigger", "1")
        .json(base)
    )
    q = st.run_scd2_stream(
        stream,
        os.path.join(run_dir, "history"),
        checkpoint_dir=os.path.join(run_dir, "ckpt"),
    )
    q.awaitTermination()
    h = st.read_scd2_history(spark, os.path.join(run_dir, "history")).cache()

    multi_current = (
        h.filter("is_current")
        .groupBy("key_value")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert multi_current == 0

    assert h.filter(~F.col("is_current") & F.col("valid_to").isNull()).count() == 0

    overlaps = (
        h.alias("a")
        .join(h.alias("b"), "key_value")
        .filter(F.col("a._event_id") < F.col("b._event_id"))
        .filter(
            (F.col("a.valid_from") < F.coalesce(F.col("b.valid_to"), F.lit("9999-01-01").cast("timestamp")))
            & (F.col("b.valid_from") < F.coalesce(F.col("a.valid_to"), F.lit("9999-01-01").cast("timestamp")))
        )
        .count()
    )
    assert overlaps == 0
    h.unpersist()
    shutil.rmtree(run_dir, ignore_errors=True)
