"""Multi-process concurrent-writer soak (VERDICT r13 next-item 3).

N REAL processes blind-append to one native Delta table at once, each
committing M times through :func:`deltalog.commit`'s put-if-absent +
retry loop.  The parent then proves the optimistic-concurrency
contract held:

- the version chain is CONTIGUOUS from 0 (no gaps, no forks),
- every writer's every commit landed (no lost rows — each commit adds
  exactly one keyed row, and the final snapshot holds all N*M keys),
- each commit file was written by exactly one writer,
- in-commit timestamps are STRICTLY MONOTONIC across processes (the
  clamp floor reads the actual previous commit file, so it holds
  cross-process, not just in-process).

Children never start Spark — they stage one-row parquet files with
pyarrow and drive the commit protocol directly, so the soak stresses
the COMMIT path (allocation races, retry, conflict checks), not
executor startup.  The parent uses Spark only to create the table and
verify the final snapshot.

Usage:
    python tools/concurrent_soak.py [N_WRITERS] [M_COMMITS]
    python tools/concurrent_soak.py --child TABLE_DIR WID M   # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLE = "/tmp/cdc_concurrent_soak/table"


def child(table_dir: str, wid: int, m: int) -> None:
    """One writer process: M blind appends, each one keyed row."""
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from cdc_pipe_line_spark import deltalog

    versions = []
    for j in range(m):
        key = wid * 1_000_000 + j
        name = f"part-w{wid:03d}-{j:04d}-{uuid.uuid4().hex}.parquet"
        full = os.path.join(table_dir, name)
        pq.write_table(
            pa.table(
                {
                    "k": pa.array([key], pa.int64()),
                    "v": pa.array([float(wid)], pa.float64()),
                }
            ),
            full,
        )
        v = deltalog.commit(
            table_dir,
            [
                {
                    "add": {
                        "path": name,
                        "size": os.path.getsize(full),
                        "dataChange": True,
                        "partitionValues": {},
                    }
                },
                {"commitInfo": {"operation": "WRITE"}},
            ],
            retries=500,
        )
        versions.append(v)
    print(json.dumps({"wid": wid, "versions": versions}))


def run_soak(n_writers: int = 8, m_commits: int = 25) -> dict:
    import shutil
    import time

    from cdc_pipe_line_spark import deltalog, get_spark

    shutil.rmtree(os.path.dirname(TABLE), ignore_errors=True)
    os.makedirs(TABLE, exist_ok=True)
    spark = get_spark(app_name="concurrent-soak")
    seed = spark.createDataFrame([(-1, -1.0)], "k bigint, v double")
    deltalog.create_table(
        spark,
        seed,
        TABLE,
        properties={"delta.enableInCommitTimestamps": "true"},
    )

    t0 = time.time()
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--child",
                TABLE,
                str(w),
                str(m_commits),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for w in range(n_writers)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        if p.returncode != 0:
            raise RuntimeError(f"writer failed: {err[-2000:]}")
        outs.append(json.loads(out.strip().splitlines()[-1]))
    wall = time.time() - t0

    # --- verify: contiguous version chain, one winner per version
    log_dir = os.path.join(TABLE, "_delta_log")
    versions = sorted(
        int(f.split(".")[0])
        for f in os.listdir(log_dir)
        if f.endswith(".json") and f.split(".")[0].isdigit()
    )
    expect_n = 1 + n_writers * m_commits
    assert versions == list(range(expect_n)), (
        f"version chain not contiguous: {len(versions)} files, "
        f"expected {expect_n}"
    )
    claimed = sorted(v for o in outs for v in o["versions"])
    assert claimed == list(range(1, expect_n)), "claimed versions fork"

    # --- verify: strictly monotonic cross-process in-commit stamps
    icts = [
        deltalog._read_commit_ict(TABLE, v) for v in range(expect_n)
    ]
    assert all(i is not None for i in icts), "a commit lost its ICT"
    assert icts == sorted(icts) and len(set(icts)) == expect_n, (
        "in-commit timestamps not strictly monotonic across processes"
    )

    # --- verify: no lost rows
    snap = deltalog.read_snapshot(spark, TABLE)
    keys = sorted(r.k for r in snap.collect())
    expect_keys = sorted(
        [-1]
        + [
            w * 1_000_000 + j
            for w in range(n_writers)
            for j in range(m_commits)
        ]
    )
    assert keys == expect_keys, (
        f"lost rows: {len(keys)} keys vs {len(expect_keys)} expected"
    )

    result = {
        "writers": n_writers,
        "commits_per_writer": m_commits,
        "total_commits": expect_n - 1,
        "wall_sec": round(wall, 2),
        "commits_per_sec": round((expect_n - 1) / wall, 1),
        "contiguous": True,
        "ict_monotonic": True,
        "lost_rows": 0,
    }
    print(json.dumps(result))
    spark.stop()
    return result


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
    else:
        n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
        m = int(sys.argv[2]) if len(sys.argv) > 2 else 25
        run_soak(n, m)
