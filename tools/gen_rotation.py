"""Regenerate ``_DRIVER_ROTATION`` for the next round.

The external driver's per-round correctness budget checks roughly the
FIRST 50 registered queries, so registration order decides which
queries earn fresh external evidence.  This tool diffs the live
registry against every ``CORRECTNESS_r*.json`` in the repo root and
prints the names that have NEVER appeared in a driver round, in
current registration order — paste the output into
``cdc_pipe_line_spark/queries/__init__.py::_DRIVER_ROTATION`` at the
start of each round (VERDICT r05/r06 rotation discipline).

Usage:
    cd /root/repo && python tools/gen_rotation.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(cap: int = 60) -> None:
    from cdc_pipe_line_spark.queries import all_queries

    last: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(path.split("_r")[1].split(".")[0])
        with open(path) as fh:
            for n in json.load(fh):
                last[n] = max(last.get(n, 0), rnd)
    reg = list(all_queries())
    # never-checked first (newest surface needs evidence most), then
    # ASCENDING by last-checked round — the driver's ~50-name budget
    # lands on the stalest external evidence (VERDICT r13 next-item 5)
    order = sorted(
        reg, key=lambda n: (last.get(n, -1), reg.index(n))
    )[:cap]
    from collections import Counter

    vintage = Counter(last.get(n, 0) for n in order)
    print(f"# rotation = {len(order)} of {len(reg)} registered; "
          f"last-checked-round histogram {dict(sorted(vintage.items()))}")
    print("_DRIVER_ROTATION = (")
    for n in order:
        print(f'    "{n}",')
    print(")")


if __name__ == "__main__":
    main()
