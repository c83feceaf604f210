"""Within-box A/B for the merge-statement fast path (VERDICT r12
what's-wrong 1 / next-item 1): time `cdc_delta_merge_native` (and the
adjacent `cdc_scd2_delta_native`) steady-state, importing the registry
from a CHOSEN repo root so HEAD and a git-worktree snapshot alternate
on identical data and caches.

    python tools/merge_ab.py /root/repo /root/ab_r11 --passes 4
"""

from __future__ import annotations

import json
import os
import sys
import time

QUERIES = ["cdc_delta_merge_native", "cdc_scd2_delta_native"]


def main() -> None:
    args = sys.argv[1:]
    passes = 4
    if "--passes" in args:
        i = args.index("--passes")
        passes = int(args[i + 1])
        del args[i : i + 2]
    roots = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, roots[0])
    from cdc_pipe_line_spark import get_spark

    spark = get_spark(app_name="merge-ab")
    results: dict[str, dict[str, list[float]]] = {
        r: {q: [] for q in QUERIES} for r in roots
    }
    for p in range(passes):
        for root in roots:
            # re-import the package from this root
            for mod in [
                m for m in list(sys.modules) if m.startswith("cdc_pipe_line")
            ]:
                del sys.modules[mod]
            sys.path.insert(0, root)
            try:
                from cdc_pipe_line_spark.queries import all_queries

                REG = all_queries()
                for q in QUERIES:
                    t0 = time.perf_counter()
                    REG[q](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    dt = time.perf_counter() - t0
                    results[root][q].append(round(dt, 3))
                    print(
                        f"[pass {p}] {os.path.basename(root)} {q}: {dt:.3f}s",
                        file=sys.stderr,
                    )
            finally:
                sys.path.remove(root)
    summary = {
        root: {
            q: {
                "best": min(v),
                "median": sorted(v)[len(v) // 2],
                "all": v,
            }
            for q, v in qs.items()
        }
        for root, qs in results.items()
    }
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
