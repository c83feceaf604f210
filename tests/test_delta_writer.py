"""Native Delta writer contract (deltalog.py round-9 write half):
create/append/overwrite/compact round trips through the native
reader, overwrite snapshot isolation, OPTIMIZE content stability,
put-if-absent version allocation, and a real schemaString.

Reference parity: the reference's history table is a real Delta table
(deltaprocessing.py:96-101); delta-spark is absent from the container
so this binds the protocol-level writer instead.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from cdc_pipe_line_spark import deltalog


@pytest.fixture()
def table_dir(tmp_path):
    return str(tmp_path / "tbl")


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 7 % 13).alias("v")
    )


def _ids(spark, table_dir):
    return sorted(
        r["id"] for r in deltalog.read_snapshot(spark, table_dir).collect()
    )


def test_create_append_roundtrip(spark, table_dir):
    assert deltalog.create_table(spark, _mk(spark, 0, 5), table_dir) == 0
    assert deltalog.append(spark, _mk(spark, 5, 9), table_dir) == 1
    assert _ids(spark, table_dir) == list(range(9))


def test_overwrite_replaces_content(spark, table_dir):
    deltalog.create_table(spark, _mk(spark, 0, 5), table_dir)
    deltalog.append(spark, _mk(spark, 5, 9), table_dir)
    v = deltalog.overwrite(spark, _mk(spark, 100, 103), table_dir)
    assert v == 2
    assert _ids(spark, table_dir) == [100, 101, 102]
    # both old files tombstoned in ONE commit (snapshot isolation)
    log = os.path.join(table_dir, "_delta_log", f"{v:020d}.json")
    acts = [json.loads(l) for l in open(log)]
    assert sum("remove" in a for a in acts) == 2
    assert sum("add" in a for a in acts) == 1


def test_compact_preserves_content_single_file(spark, table_dir):
    deltalog.create_table(spark, _mk(spark, 0, 5), table_dir)
    deltalog.append(spark, _mk(spark, 5, 9), table_dir)
    deltalog.compact(spark, table_dir)
    assert _ids(spark, table_dir) == list(range(9))
    live = deltalog.live_files(
        deltalog.read_log_actions(spark, table_dir)
    ).collect()
    assert len(live) == 1
    # OPTIMIZE tombstones carry dataChange=false
    log = os.path.join(table_dir, "_delta_log", f"{2:020d}.json")
    acts = [json.loads(l) for l in open(log)]
    rms = [a for a in acts if "remove" in a]
    assert rms and all(a["remove"]["dataChange"] is False for a in rms)


def test_version_allocation_put_if_absent(spark, table_dir):
    deltalog.create_table(spark, _mk(spark, 0, 3), table_dir)
    deltalog.commit(table_dir, [{"commitInfo": {"operation": "NOOP"}}])
    # racing writer pinned to an already-taken version must FAIL
    with pytest.raises(FileExistsError):
        deltalog.commit(
            table_dir, [{"commitInfo": {"operation": "RACE"}}], version=1
        )
    # and the retry path (re-read log, next version) succeeds
    assert (
        deltalog.commit(table_dir, [{"commitInfo": {"operation": "RETRY"}}])
        == 2
    )


def test_create_writes_real_schema_string(spark, table_dir):
    df = _mk(spark, 0, 3)
    deltalog.create_table(spark, df, table_dir)
    log = os.path.join(table_dir, "_delta_log", f"{0:020d}.json")
    metas = [
        json.loads(l)["metaData"]
        for l in open(log)
        if "metaData" in json.loads(l)
    ]
    assert len(metas) == 1
    schema = json.loads(metas[0]["schemaString"])
    assert [f["name"] for f in schema["fields"]] == ["id", "v"]


def test_txn_append_idempotent(spark, table_dir):
    df = _mk(spark, 0, 4)
    assert deltalog.txn_append(spark, df, table_dir, app_id="a", version=0)
    assert deltalog.txn_append(
        spark, _mk(spark, 4, 6), table_dir, app_id="a", version=1
    )
    # replays of both versions are refused with NO new commit or rows
    before = sorted(os.listdir(os.path.join(table_dir, "_delta_log")))
    for v in (0, 1):
        assert not deltalog.txn_append(
            spark, df, table_dir, app_id="a", version=v
        )
    assert sorted(os.listdir(os.path.join(table_dir, "_delta_log"))) == before
    assert _ids(spark, table_dir) == list(range(6))
    # a DIFFERENT app's version counter is independent
    assert deltalog.txn_append(
        spark, _mk(spark, 6, 7), table_dir, app_id="b", version=0
    )
    assert deltalog.last_txn_version(spark, table_dir, "a") == 1
    assert deltalog.last_txn_version(spark, table_dir, "b") == 0
    assert deltalog.last_txn_version(spark, table_dir, "c") is None


def test_time_travel_every_version(spark, table_dir):
    deltalog.create_table(spark, _mk(spark, 0, 4), table_dir)
    deltalog.append(spark, _mk(spark, 4, 6), table_dir)
    deltalog.overwrite(spark, _mk(spark, 50, 52), table_dir)
    assert sorted(
        r["id"]
        for r in deltalog.read_snapshot(
            spark, table_dir, version_as_of=0
        ).collect()
    ) == [0, 1, 2, 3]
    assert sorted(
        r["id"]
        for r in deltalog.read_snapshot(
            spark, table_dir, version_as_of=1
        ).collect()
    ) == [0, 1, 2, 3, 4, 5]
    assert _ids(spark, table_dir) == [50, 51]
    ops = {
        r["version"]: r["operation"]
        for r in deltalog.table_history(spark, table_dir).collect()
    }
    assert ops == {0: "CREATE TABLE", 1: "WRITE", 2: "OVERWRITE"}


def test_checkpoint_and_log_cleanup(spark, table_dir):
    deltalog.create_table(spark, _mk(spark, 0, 4), table_dir)
    deltalog.append(spark, _mk(spark, 4, 6), table_dir)
    deltalog.txn_append(
        spark, _mk(spark, 6, 8), table_dir, app_id="app", version=5
    )
    ver = deltalog.write_checkpoint(spark, table_dir)
    assert ver == 2
    # checkpointed state must reconstruct identically
    assert _ids(spark, table_dir) == list(range(8))
    # txn high-water mark survives INTO the checkpoint
    removed = deltalog.cleanup_log_before_checkpoint(table_dir)
    assert removed == 3
    assert _ids(spark, table_dir) == list(range(8))
    assert deltalog.last_txn_version(spark, table_dir, "app") == 5
    # replay of the pre-checkpoint txn version still refused
    assert not deltalog.txn_append(
        spark, _mk(spark, 0, 1), table_dir, app_id="app", version=5
    )
    # post-cleanup commits append past the checkpoint and are read
    deltalog.append(spark, _mk(spark, 8, 9), table_dir)
    assert _ids(spark, table_dir) == list(range(9))


def test_partitioned_table_pruned_read(spark, table_dir):
    df = spark.range(0, 12).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("g")
    )
    deltalog.create_table(spark, df, table_dir, partition_by=["g"])
    acts = deltalog.read_log_actions(spark, table_dir)
    live = deltalog.live_files(acts).collect()
    assert len(live) == 3
    assert all(r["partitionValues"] and "g" in r["partitionValues"] for r in live)
    assert all(f"g={r['partitionValues']['g']}/" in r["path"] for r in live)
    # pruned read: only partition g=1, with the partition column restored
    got = deltalog.read_snapshot(
        spark, table_dir, partition_filter={"g": "1"}
    )
    rows = sorted((r["id"], r["g"]) for r in got.collect())
    assert rows == [(1, "1"), (4, "1"), (7, "1"), (10, "1")]
    # partition columns survive a checkpoint round trip too
    deltalog.write_checkpoint(spark, table_dir)
    deltalog.cleanup_log_before_checkpoint(table_dir)
    got2 = deltalog.read_snapshot(
        spark, table_dir, partition_filter={"g": "2"}
    )
    assert sorted(r["id"] for r in got2.collect()) == [2, 5, 8, 11]


def test_append_evolve_schema(spark, table_dir):
    deltalog.create_table(spark, _mk(spark, 0, 4), table_dir)
    wide = spark.range(4, 7).select(
        F.col("id"),
        (F.col("id") * 7 % 13).alias("v"),
        (F.col("id") * 2).alias("extra"),
    )
    deltalog.append_evolve(spark, wide, table_dir)
    snap = deltalog.read_snapshot(spark, table_dir)
    assert snap.columns == ["id", "v", "extra"]
    rows = {r["id"]: r["extra"] for r in snap.collect()}
    assert rows == {0: None, 1: None, 2: None, 3: None, 4: 8, 5: 10, 6: 12}
    # evolution survives a checkpoint + cleanup round trip
    deltalog.write_checkpoint(spark, table_dir)
    deltalog.cleanup_log_before_checkpoint(table_dir)
    snap2 = deltalog.read_snapshot(spark, table_dir)
    assert snap2.columns == ["id", "v", "extra"]
    assert {r["id"]: r["extra"] for r in snap2.collect()} == rows
