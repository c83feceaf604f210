"""Per-query sf0.1 -> sf1 scale soak (the VERDICT "soak table" tool).

Runs each named registered query in an ENGINE session (get_spark — this
measures the engine's own posture, unlike the deliberately-vanilla
driver sim) at sf0.1 and at the 10x `_scale/sf1` copy, two passes each
through the noop sink, and prints one JSON line with min-of-2 timings
and the sf1/sf0.1 ratio.  Record the table in BENCH_NOTES.md; any
ratio > ~5x on 10x data needs decomposing (contention, output growth,
or a real super-linear path).

Usage:
    cd /root/repo && python tools/query_soak.py name [name ...]
Env:
    SOAK_SMALL (default /root/testdata/sf0.1)
    SOAK_BIG   (default /root/repo/_scale/sf1)
    SOAK_PASSES (default 2)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_pipe_line_spark.queries import all_queries
from cdc_pipe_line_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: query_soak.py name [name ...]")
    small = os.environ.get("SOAK_SMALL", "/root/testdata/sf0.1")
    big = os.environ.get("SOAK_BIG", "/root/repo/_scale/sf1")
    passes = int(os.environ.get("SOAK_PASSES", "2"))
    spark = get_spark(app_name="query-soak")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    unknown = [n for n in names if n not in registry]
    if unknown:
        raise SystemExit(f"not registered: {unknown}")

    # session warmup (JVM + python workers), same as bench.py
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    def timed(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(passes):
            t0 = time.perf_counter()
            registry[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    out = {}
    for name in names:
        s = timed(name, small)
        b = timed(name, big)
        out[name] = {
            "sf0.1_sec": s,
            "sf1_sec": b,
            "ratio": round(b / s, 2) if s > 0 else None,
        }
        print(f"[soak] {name}: {s:.2f}s -> {b:.2f}s (x{b / s:.2f})",
              file=sys.stderr)
    try:
        with open("/proc/loadavg") as fh:
            load = [float(x) for x in fh.read().split()[:3]]
    except OSError:
        load = []
    print(json.dumps({"soak": out, "loadavg": load}))
    spark.stop()


if __name__ == "__main__":
    main()
