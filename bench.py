"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints exactly ONE JSON line to stdout:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the `noop` sink (full computation,
no driver-side collect, no optimizer shortcut via count-only plans) —
the same action profile a cluster write would have.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_pipe_line_spark.queries import all_queries
from cdc_pipe_line_spark.session import get_spark

# Headline set: one per operator family (SURVEY.md §2), weighted toward
# the scale-sensitive paths (CDC diff, joins, windows, dedup, ANN).
HEADLINE = [
    "cdc_diff_events",  # flagship: snapshot diff via one full-outer join (J1-J3)
    "agg_pricing_summary",  # TPC-H Q1-shaped hash aggregate (A1-A5)
    "join_revenue_by_region",  # multi-way broadcast join + agg (J family)
    "window_top_latest",  # TakeOrderedAndProject + WindowGroupLimit (W1/W2)
    "reshape_union_drift",  # unionByName w/ drift (R3)
    "scd2_point_views",  # SCD2 current view + as-of read (J6/J9/J10)
    "ts_rolling_zscore",  # window-frame anomaly scoring (W5)
    "ts_asof_sessionize",  # custom as-of join + sessionization
    "text_profile",  # quality/token/language profiling (north star)
    "dedup_minhash_lsh",  # MinHash LSH near-dup (north star)
    "sim_knn_bruteforce",  # cosine top-k over embeddings (north star)
    "stream_windowed_counts",  # bounded streams: tumbling + session windows (T8)
]

# Round-6 addition (VERDICT r5 item 5): a second tracked group over the
# round-5 surface, so a perf regression in the newer operator families
# is visible round-over-round, not only in one-off BENCH_NOTES soaks.
# One representative per family, weighted toward the scale-sensitive
# shapes (multi-stage LLM pipeline, fingerprint self-join, iterative
# graph traversal, global-distribution aggregates).
EXTENDED = [
    "llm_quality_pipeline",  # composed gate->dedup->quota->pack pipeline
    "agg_percentile_bands",  # global percentile banding (sketch path)
    "text_winnowing",  # winnowing fingerprints + capped pair join
    "graph_khop_reach",  # iterative k-hop BFS frontier expansion
    "join_q3_shipping_priority",  # TPC-H Q3 join+agg+top-k shape
    "agg_heavy_hitters",  # two-pass exact Misra-Gries heavy hitters
    "ts_rolling_median",  # exact rolling median (RANGE-frame window)
    "qa_constraint_suite",  # Deequ-style multi-constraint verification
    # round-7 additions: the two post-soak dedup optimizations (39x /
    # 8x at sf1 — BENCH_NOTES round 7) plus the new SemDeDup operator,
    # tracked so a regression in the pinned/banded paths is visible.
    # extended_total_sec therefore steps up vs r6 by construction.
    "dedup_simhash",  # banded simhash pairs (signature frame pinned)
    "dedup_levenshtein",  # prefix-blocked edit distance (banded verify)
    "dedup_semantic",  # SemDeDup cluster-blocked embedding dedup
    # round-9 addition: the native Delta write/read path (log commits,
    # state reconstruction, touched-key SCD2 rebuild), tracked so a
    # regression in the protocol implementation is visible
    # round-over-round.  extended_total_sec steps up vs r8 by
    # construction (the r7 precedent).
    "cdc_scd2_delta_native",
    # round-11 addition: the stats/skipping/DML layer's heaviest
    # composition (real MERGE INTO via the native builder protocol),
    # tracked so a regression in footer-stats writes, skipping
    # planning, or the copy-on-write rewrite is visible.
    # extended_total_sec steps up vs r10 by construction.
    "cdc_delta_merge_native",
    # round-12 addition: the merge-on-read path — deletion-vector
    # DELETE/UPDATE (sidecar writes, masked reads on both scan
    # routes), tracked so a regression in the DV mask join or the
    # sidecar write is visible.  extended_total_sec steps up vs r11
    # by construction.
    "cdc_delta_dv_dml",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark(app_name="cdc-pipe-line-bench")
    spark.sparkContext.setLogLevel("ERROR")

    registry = all_queries()

    # Untimed warmup: JVM/codegen/Python-worker spin-up, table file
    # listing, and the one-time JSON staging the streaming queries
    # cache under /tmp.  Keeps timings about the queries, not session
    # cold-start or fixture generation.
    spark.range(1_000_000).selectExpr("sum(id)").write.format(
        "noop"
    ).mode("overwrite").save()

    # Fork the Python worker daemons + Arrow serializers once, across
    # all cores: the first pandas_udf query otherwise pays ~2 s of
    # worker pool spin-up that is session overhead, not query cost.
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm_worker(v: pd.Series) -> pd.Series:
        return v

    spark.range(10_000, numPartitions=32).select(
        _warm_worker("id")
    ).write.format("noop").mode("overwrite").save()
    # Warm the flagship diff itself (it previously warmed the sibling
    # cdc_diff_summary): C2 compilation of the diff's join/aggregate
    # codegen converges on the THIRD execution of the exact shape, so
    # with only the cold pass ahead of it the steady pass was still
    # paying ~0.4 s of JIT tier-up (measured 1.49 s on run 1 vs 0.97 s
    # on run 2+ at sf0.1).
    registry["cdc_diff_events"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    from cdc_pipe_line_spark.queries.streaming_q import _stage

    base = _stage(spark, sf_dir, "raw")

    # Warm the Structured Streaming engine once (stream planner, state
    # store provider classes, memory-sink plumbing, AND the stateful
    # operator shapes the headline uses — windowed aggregate and
    # session_window under a watermark; measured, a session's FIRST
    # stateful stream pays ~6 s of one-time state-store/codegen setup
    # that a stateless warm stream does not touch).  Two rows of input:
    # the warm-up cost is shape-dependent, not data-dependent.
    from pyspark.sql import functions as _F

    from cdc_pipe_line_spark import streaming as _st
    from cdc_pipe_line_spark.queries.streaming_q import RAW_SCHEMA as _RS

    warm_src = "/tmp/cdc_stream_cache/_bench_warm"
    if not os.path.exists(os.path.join(warm_src, "_READY")):
        os.makedirs(warm_src, exist_ok=True)
        with open(os.path.join(warm_src, "w.json"), "w") as fh:
            fh.write(
                '{"event_id":1,"ts":"2024-01-01T00:00:00.000000Z",'
                '"user_id":1,"event_type":"view","value":1.0}\n'
                '{"event_id":2,"ts":"2024-01-01T00:10:00.000000Z",'
                '"user_id":1,"event_type":"view","value":2.0}\n'
            )
        with open(os.path.join(warm_src, "_READY"), "w") as fh:
            fh.write("ok")

    def _warm_read():
        return (
            spark.readStream.schema(_RS)
            .option("pathGlobFilter", "*.json")
            .json(warm_src)
        )

    _q1, _ = _st.start_to_memory(
        _warm_read()
        .withWatermark("ts", "1 day")
        .groupBy(_F.window("ts", "1 day"), "event_type")
        .agg(_F.count("*").alias("n")),
        output_mode="complete",
    )
    _q2, _ = _st.start_to_memory(
        _warm_read()
        .withWatermark("ts", "1 day")
        .groupBy(_F.session_window("ts", "30 minutes"), "user_id")
        .agg(_F.count("*").alias("n")),
        output_mode="complete",
    )
    _q1.awaitTermination()
    _q2.awaitTermination()

    # Machine-load fingerprint (VERDICT r7 item 4): readings taken
    # within ~2 min of another big JVM workload exiting run 30-40%
    # high uniformly (BENCH_NOTES rounds 6-7 — two "regressions" that
    # were contention).  Sample /proc/loadavg plus a fixed-shape JVM
    # no-op before every pass and emit them into the JSON, so a
    # contaminated run is machine-adjudicable from the artifact alone
    # instead of from prose.
    machine_samples: list[dict] = []

    def _machine_probe(label: str) -> None:
        try:
            with open("/proc/loadavg") as fh:
                load = [float(x) for x in fh.read().split()[:3]]
        except OSError:
            load = []
        t0 = time.perf_counter()
        spark.range(20_000_000, numPartitions=32).selectExpr(
            "sum(id * 3 + 1)"
        ).write.format("noop").mode("overwrite").save()
        machine_samples.append(
            {
                "label": label,
                "loadavg": load,
                "probe_sec": round(time.perf_counter() - t0, 3),
            }
        )

    def run_all(
        label: str, names: list[str]
    ) -> tuple[dict[str, float], float]:
        timings: dict[str, float] = {}
        t_all = time.perf_counter()
        for name in names:
            t0 = time.perf_counter()
            df = registry[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
            print(
                f"[bench:{label}] {name}: {timings[name]:.3f}s", file=sys.stderr
            )
        return timings, round(time.perf_counter() - t_all, 3)

    # Pass 1 (cold): includes one-time whole-stage-codegen JIT per query
    # shape (~1 s each — measured in BENCH_NOTES.md, not a data cost).
    # Then N steady passes (default 3, $SPARK_GRAFT_BENCH_PASSES): a
    # single steady pass proved too noisy to adjudicate regressions
    # (round 4: cdc_diff_events swung 1.20->1.81 s on untouched code),
    # so the headline number is the per-query MEDIAN across passes and
    # the JSON carries {median,min,max,n} spreads so a reader can tell
    # run variance from a real movement without re-running.
    n_passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")))
    _machine_probe("pre-cold")
    _, cold_total = run_all("cold", HEADLINE)
    passes: list[tuple[dict[str, float], float]] = []
    for i in range(n_passes):
        _machine_probe(f"pre-steady{i + 1}")
        passes.append(run_all(f"steady{i + 1}", HEADLINE))
    _machine_probe("pre-ext-cold")
    _, ext_cold_total = run_all("ext-cold", EXTENDED)
    ext_passes: list[tuple[dict[str, float], float]] = []
    for i in range(n_passes):
        _machine_probe(f"pre-ext-steady{i + 1}")
        ext_passes.append(run_all(f"ext-steady{i + 1}", EXTENDED))
    _machine_probe("post")

    def _median(vals: list[float]) -> float:
        s = sorted(vals)
        m = len(s) // 2
        return s[m] if len(s) % 2 else round((s[m - 1] + s[m]) / 2, 3)

    def _summarize(
        names: list[str], runs: list[tuple[dict[str, float], float]]
    ) -> tuple[dict[str, float], dict[str, dict], list[float]]:
        meds = {n: _median([p[0][n] for p in runs]) for n in names}
        spreads = {
            n: {
                "median": meds[n],
                "min": min(p[0][n] for p in runs),
                "max": max(p[0][n] for p in runs),
                "n": len(runs),
            }
            for n in names
        }
        return meds, spreads, [p[1] for p in runs]

    timings, spread, totals = _summarize(HEADLINE, passes)
    ext_timings, ext_spread, ext_totals = _summarize(EXTENDED, ext_passes)

    # The stdout contract stays ONE JSON line, but round 13's line
    # outgrew the driver's 2000-char artifact tail (the r13 bench
    # became unparseable and erased the round-over-round comparison —
    # VERDICT r14 item 2).  Keep the adjudication keys on stdout
    # (additions only: `master`/`parallelism` settle whether
    # $SPARK_GRAFT_CPUS took effect — VERDICT r14 item 3) and move the
    # per-query spreads + machine-load probes to a stderr line and a
    # sidecar file.  No timing methodology changed.
    detail = {
        "queries_spread": spread,
        "extended_spread": ext_spread,
        "machine": machine_samples,
        "sf": sf,
    }
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL", "/tmp/cdc_bench_detail.json"
    )
    try:
        with open(detail_path, "w") as fh:
            json.dump(detail, fh)
    except OSError:
        pass
    print("[bench:detail] " + json.dumps(detail), file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": _median(totals),
                "unit": "sec",
                "queries": timings,
                "steady_totals_sec": totals,
                "cold_total_sec": cold_total,
                "extended_total_sec": _median(ext_totals),
                "extended": ext_timings,
                "extended_steady_totals_sec": ext_totals,
                "extended_cold_total_sec": ext_cold_total,
                "master": spark.sparkContext.master,
                "parallelism": spark.sparkContext.defaultParallelism,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
