"""Adversarial skew soak (VERDICT r03 item 2): drive the diff and the
salted aggregate at sf1 volume with hostile key distributions and
compare wall time against uniform keys on the SAME row counts.

- diff: two 1.5M-row snapshots where ONE key carries 10% of the rows
  (150k duplicates collapsing through `_one_row_per_key`, the path
  whose repartition-before-aggregate traded away map-side combining —
  this measures exactly that trade under real skew).
- salted aggregate: 1M events re-keyed by a Zipf(1.1) draw (hot key
  ~7% of rows, heavy tail) vs a uniform 1000-key draw, through
  `salted_aggregate` AND a plain groupBy for reference.

Prints one JSON line; record the numbers in BENCH_NOTES.md.
A "cliff" = skewed > ~1.5x uniform on the same operator.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cdc_pipe_line_spark.cdc.diff import snapshot_diff
from cdc_pipe_line_spark.functions import salted_aggregate
from cdc_pipe_line_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/_scale/sf1")


def timed(label: str, df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = round(time.perf_counter() - t0, 3)
    print(f"[skew] {label}: {dt:.3f}s", file=sys.stderr)
    return dt


def main() -> None:
    spark = get_spark(app_name="skew-soak")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}

    # ---- diff under a 10%-hot duplicate key --------------------------
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    # skewed: keys 0..9 of every 10-block collapse onto one hot key
    skew_key = F.when(F.col("o_orderkey") % 10 == 0, F.lit(-1)).otherwise(
        F.col("o_orderkey")
    )
    v1_skew = orders.withColumn("o_orderkey", skew_key)
    v2_skew = v1_skew.withColumn(
        "o_totalprice",
        F.when(F.col("o_custkey") % 7 == 0, F.col("o_totalprice") + 1).otherwise(
            F.col("o_totalprice")
        ),
    )
    v2_uni = orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_custkey") % 7 == 0, F.col("o_totalprice") + 1).otherwise(
            F.col("o_totalprice")
        ),
    )
    # warm file listing + the diff plan's whole-stage-codegen once
    # (cold pass), then measure steady state — same protocol as
    # bench.py; without it the first diff eats ~2 s of one-time JIT.
    timed("warmup", orders.groupBy().count())
    for label in ("cold", "steady"):
        out["diff_uniform"] = timed(
            f"diff_uniform[{label}]", snapshot_diff(v2_uni, orders, "o_orderkey")
        )
        out["diff_skewed_10pct_hot"] = timed(
            f"diff_skewed[{label}]", snapshot_diff(v2_skew, v1_skew, "o_orderkey")
        )

    # ---- salted aggregate under Zipf keys ----------------------------
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "value"
    )
    n_keys = 1000
    rng = np.random.default_rng(7)
    zipf_lut = [
        int(k) % n_keys for k in rng.zipf(1.1, size=4096)
    ]  # heavy tail: key 0/1 dominate
    zipf_col = F.element_at(
        F.array(*[F.lit(v) for v in zipf_lut]),
        (F.pmod(F.xxhash64("event_id"), F.lit(4096)) + 1).cast("int"),
    )
    uni_col = F.pmod(F.xxhash64("event_id"), F.lit(n_keys))
    aggs = {
        "n": ("count", "event_id"),
        "s": ("sum", "event_id"),
        "mx": ("max", "value"),
    }
    ev_zipf = ev.withColumn("k", zipf_col)
    ev_uni = ev.withColumn("k", uni_col)
    for label in ("cold", "steady"):
        out["salted_uniform"] = timed(
            f"salted_uniform[{label}]", salted_aggregate(ev_uni, ["k"], aggs)
        )
        out["salted_zipf"] = timed(
            f"salted_zipf[{label}]", salted_aggregate(ev_zipf, ["k"], aggs)
        )
        out["plain_groupby_zipf"] = timed(
            f"plain_zipf[{label}]",
            ev_zipf.groupBy("k").agg(
                F.count("event_id").alias("n"),
                F.sum("event_id").alias("s"),
                F.max("value").alias("mx"),
            ),
        )

    # ---- streaming SCD2 sink under Zipf keys (SOAK_STREAM=1) ---------
    # The hot key's bucket accumulates a deep history that every batch
    # touching it must re-read and latest-wins-resolve; this measures
    # that read-modify-append loop plus compaction churn vs uniform
    # keys at the same volume.
    if os.environ.get("SOAK_STREAM") == "1":
        import shutil
        import uuid

        from pyspark.sql.types import StringType

        from cdc_pipe_line_spark import streaming as st

        ev_full = spark.read.parquet(f"{SF_DIR}/events.parquet")
        max_id = ev_full.agg(F.max("event_id")).first()[0]
        zipf_key = F.element_at(
            F.array(*[F.lit(str(v)) for v in zipf_lut]),
            (F.pmod(F.xxhash64("event_id"), F.lit(4096)) + 1).cast("int"),
        ).cast(StringType())
        for label, keycol in (
            ("stream_scd2_uniform", F.col("user_id").cast("string")),
            ("stream_scd2_zipf", zipf_key),
        ):
            cdc = ev_full.select(
                F.col("event_id").cast("string").alias("event_id"),
                F.lit("update").alias("event_type"),
                F.lit("c1").alias("company_id"),
                F.lit("events").alias("table_name"),
                F.col("ts").alias("timestamp"),
                F.lit("k").alias("key_column"),
                keycol.alias("key_value"),
                F.create_map(F.lit("value"), F.col("value").cast("string")).alias(
                    "new_values"
                ),
                # event_id order ~ time order in this table, so id
                # quartiles give four time-ordered micro-batches
                (F.col("event_id") * 4 / (max_id + 1)).cast("int").alias("__b"),
            )
            src = f"/tmp/skew_soak_src/{uuid.uuid4().hex}"
            for b in range(4):
                cdc.filter(F.col("__b") == b).drop("__b").repartition(1).write.mode(
                    "overwrite"
                ).json(f"{src}/b{b}")
            run = f"/tmp/skew_soak_run/{uuid.uuid4().hex}"
            stream = (
                spark.readStream.schema(st.EVENT_SCHEMA)
                .option("recursiveFileLookup", "true")
                .option("pathGlobFilter", "*.json")
                .option("maxFilesPerTrigger", "1")
                .json(src)
            )
            t0 = time.perf_counter()
            q = st.run_scd2_stream(
                stream, f"{run}/history", checkpoint_dir=f"{run}/ckpt"
            )
            q.awaitTermination()
            out[label] = round(time.perf_counter() - t0, 3)
            print(f"[skew] {label}: {out[label]:.3f}s", file=sys.stderr)
            shutil.rmtree(src, ignore_errors=True)
            shutil.rmtree(run, ignore_errors=True)
        out["stream_scd2_ratio"] = round(
            out["stream_scd2_zipf"] / out["stream_scd2_uniform"], 2
        )

    # ---- capped triangles under a celebrity vertex (SOAK_TRI=1) ------
    # One hub adjacent to 20k nodes atop a ring+chords background: the
    # uncapped adjacency-intersection carries a 20k-element array into
    # every hub edge (the wedge explosion VERDICT r8 item 6 flags); the
    # 64-cap bounds per-edge work regardless of skew.
    if os.environ.get("SOAK_TRI") == "1":
        from pyspark.sql.window import Window

        from cdc_pipe_line_spark.analytics import triangle_count

        n, hub_deg = 40_000, 20_000
        ids = spark.range(n)
        ring = ids.select(
            F.col("id").alias("a"), ((F.col("id") + 1) % n).alias("b")
        ).union(
            ids.select(
                F.col("id").alias("a"), ((F.col("id") + 7) % n).alias("b")
            )
        )
        hub = spark.range(1, hub_deg + 1).select(
            F.lit(0).cast("long").alias("a"), (F.col("id") * 2).alias("b")
        )
        edges = (
            ring.select(
                F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
            )
            .union(hub)
            .filter(F.col("a") < F.col("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        w_cap = Window.partitionBy("a").orderBy(
            F.expr("((b % 1000000007) * 2654435761) % 2147483648"), "b"
        )
        capped = (
            edges.withColumn("__r", F.row_number().over(w_cap))
            .filter(F.col("__r") <= 64)
            .drop("__r")
        )
        for label in ("cold", "steady"):
            out["tri_capped_celebrity"] = timed(
                f"tri_capped[{label}]", triangle_count(capped)
            )
            out["tri_uncapped_celebrity"] = timed(
                f"tri_uncapped[{label}]", triangle_count(edges)
            )
        out["tri_cap_ratio"] = round(
            out["tri_uncapped_celebrity"] / out["tri_capped_celebrity"], 2
        )

    out["diff_ratio"] = round(out["diff_skewed_10pct_hot"] / out["diff_uniform"], 2)
    out["salted_ratio"] = round(out["salted_zipf"] / out["salted_uniform"], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
