"""Read-amplification soak for the append-log SCD2 sink (VERDICT r04
items 5+6): drive ~100 micro-batches at sf1 volume through
``run_scd2_stream`` and measure, as the log grows:

- segment-file count (total and per-bucket max) — bounded by
  compaction at ``max_segments`` appends per bucket;
- read-back latency of ``read_scd2_history`` (the latest-wins window
  over all segments) sampled every N batches — must stay flat-ish
  after compaction kicks in, not grow with batch count;
- cached-RDD block count after every batch — the micro-batch
  persist/unpersist hygiene (streaming.py ``_apply``) must leave
  ZERO blocks behind (asserted at the end), so executor storage
  cannot grow across triggers.

Prints one JSON line; record the table in BENCH_NOTES.md.  Anchor:
the reference's small-files pathology (SURVEY.md §4 "severe" — one
parquet file per event, ~3 events/s).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cdc_pipe_line_spark import streaming as st
from cdc_pipe_line_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/_scale/sf1")
N_BATCHES = int(os.environ.get("SOAK_BATCHES", "100"))
SAMPLE_EVERY = int(os.environ.get("SOAK_SAMPLE_EVERY", "10"))
MAX_SEGMENTS = int(os.environ.get("SOAK_MAX_SEGMENTS", "16"))


def count_segments(data_dir: str) -> tuple[int, int]:
    """(total parquet segment files, max per bucket) under the local
    history data dir."""
    total, per_bucket = 0, {}
    for root, _dirs, files in os.walk(data_dir):
        n = sum(1 for f in files if f.endswith(".parquet"))
        total += n
        if "__bucket=" in root:
            b = root.rsplit("__bucket=", 1)[1]
            per_bucket[b] = per_bucket.get(b, 0) + n
    return total, max(per_bucket.values(), default=0)


def main() -> None:
    spark = get_spark(app_name="readamp-soak")
    spark.sparkContext.setLogLevel("ERROR")

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    max_id = ev.agg(F.max("event_id")).first()[0]
    cdc = ev.select(
        F.col("event_id").cast("string").alias("event_id"),
        F.lit("update").alias("event_type"),
        F.lit("c1").alias("company_id"),
        F.lit("events").alias("table_name"),
        F.col("ts").alias("timestamp"),
        F.lit("k").alias("key_column"),
        F.col("user_id").cast("string").alias("key_value"),
        F.create_map(F.lit("value"), F.col("value").cast("string")).alias(
            "new_values"
        ),
        # event_id order ~ time order: N_BATCHES time-ordered slices.
        # ZERO-PADDED so the file source's lexicographic path order ==
        # numeric batch order — otherwise __b=10 streams before __b=2,
        # the watermark has already advanced past it, and the stateful
        # dedup silently drops whole "late" batches.
        F.lpad(
            (F.col("event_id") * N_BATCHES / (max_id + 1)).cast("int").cast(
                "string"
            ),
            4,
            "0",
        ).alias("__b"),
    )
    src = f"/tmp/readamp_src/{uuid.uuid4().hex}"
    # one file per micro-batch; partitionBy writes all slices in one job
    cdc.repartition(N_BATCHES, "__b").sortWithinPartitions("__b").write.mode(
        "overwrite"
    ).partitionBy("__b").json(src)
    # The file source orders by MODIFICATION TIME (path only breaks
    # exact ties unreliably): one write job gives every slice the same
    # mtime, so trigger order would be arbitrary and the watermark
    # dedup would drop "late" whole batches.  Stamp slice b with
    # mtime t0+b so maxFilesPerTrigger=1 replays them in time order.
    t0 = os.stat(src).st_mtime - 2 * N_BATCHES
    for b in range(N_BATCHES):
        d = os.path.join(src, f"__b={b:04d}")
        for f in os.listdir(d):
            if f.endswith(".json"):
                os.utime(os.path.join(d, f), (t0 + b, t0 + b))

    run = f"/tmp/readamp_run/{uuid.uuid4().hex}"
    history = f"{run}/history"
    data_dir = f"{history}/data"
    sc = spark.sparkContext

    samples: list[dict] = []
    batch_times: list[float] = []
    state = {"last": time.perf_counter(), "max_cached": 0}

    def on_batch(_bdf, batch_id: int) -> None:
        now = time.perf_counter()
        batch_times.append(round(now - state["last"], 3))
        # on_batch runs BEFORE the finally-unpersist, so the batch's own
        # block is legitimately cached here; anything beyond ~2 (batch +
        # in-flight out) would be a leak building up across triggers.
        cached = len(sc._jsc.sc().getRDDStorageInfo())
        state["max_cached"] = max(state["max_cached"], cached)
        if batch_id % SAMPLE_EVERY == SAMPLE_EVERY - 1 or batch_id in (0, 1):
            total, worst = count_segments(data_dir)
            t0 = time.perf_counter()
            st.read_scd2_history(spark, history).write.format("noop").mode(
                "overwrite"
            ).save()
            read_s = round(time.perf_counter() - t0, 3)
            samples.append(
                {
                    "batch": batch_id,
                    "segments_total": total,
                    "segments_max_bucket": worst,
                    "read_back_sec": read_s,
                    "cached_rdds": cached,
                }
            )
            print(f"[readamp] {samples[-1]}", file=sys.stderr)
        state["last"] = time.perf_counter()

    stream = (
        spark.readStream.schema(st.EVENT_SCHEMA)
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.json")
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    t0 = time.perf_counter()
    q = st.run_scd2_stream(
        stream,
        history,
        checkpoint_dir=f"{run}/ckpt",
        max_segments=MAX_SEGMENTS,
        on_batch=on_batch,
    )
    q.awaitTermination()
    stream_total = round(time.perf_counter() - t0, 3)

    # the hygiene assertion: after the stream ends every micro-batch
    # persist must have been released — zero cached RDDs left
    leftover = len(sc._jsc.sc().getRDDStorageInfo())
    assert leftover == 0, f"{leftover} cached RDDs leaked by the sink"

    total, worst = count_segments(data_dir)
    t0 = time.perf_counter()
    n_history = st.read_scd2_history(spark, history).count()
    final_read = round(time.perf_counter() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "scd2_readamp_soak",
                "sf_dir": SF_DIR,
                "n_batches": N_BATCHES,
                "max_segments": MAX_SEGMENTS,
                "stream_total_sec": stream_total,
                "n_applied_batches": len(batch_times),
                "mean_batch_sec": round(
                    sum(batch_times) / max(len(batch_times), 1), 3
                ),
                "final_segments_total": total,
                "final_segments_max_bucket": worst,
                "final_read_back_sec": final_read,
                "history_rows": n_history,
                "max_cached_rdds_during": state["max_cached"],
                "leftover_cached_rdds": leftover,
                "samples": samples,
            }
        )
    )
    shutil.rmtree(src, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
