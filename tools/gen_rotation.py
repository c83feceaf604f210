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


def main() -> None:
    from cdc_pipe_line_spark.queries import all_queries

    seen: set[str] = set()
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        with open(path) as fh:
            seen |= set(json.load(fh))
    never = [n for n in all_queries() if n not in seen]
    print(f"# {len(never)} never-driver-checked of {len(all_queries())} "
          f"registered ({len(seen)} names seen across "
          f"{len(glob.glob('CORRECTNESS_r*.json'))} rounds)")
    print("_DRIVER_ROTATION = (")
    for n in never:
        print(f'    "{n}",')
    print(")")


if __name__ == "__main__":
    main()
