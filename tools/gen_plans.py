"""Dump the formatted physical plan of every headline query (the
plans PLANS.md audits).  Usage:

    python tools/gen_plans.py [query ...]      # default: bench HEADLINE
    SPARK_GRAFT_SF_DIR=... python tools/gen_plans.py cdc_diff_events

Streaming queries are excluded by default (their plan exists per
micro-batch, not on the returned DataFrame).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_pipe_line_spark.queries import all_queries
from cdc_pipe_line_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    if not names:
        from bench import HEADLINE

        names = [n for n in HEADLINE if not n.startswith("stream_")]
    spark = get_spark(app_name="gen-plans")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    for name in names:
        print(f"\n{'=' * 72}\n## {name}\n{'=' * 72}")
        df = registry[name](spark, sf_dir)
        df.explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
