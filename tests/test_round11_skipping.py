"""Round-11 native-Delta DATA SKIPPING + row-level DML + ZORDER:
per-file column statistics on every add action (protocol ``stats``
JSON from the parquet footer), stats-based file pruning in
``read_snapshot``, copy-on-write DELETE/UPDATE that rewrite only the
files a predicate touches, and OPTIMIZE ZORDER whose Morton layout
makes the pruning bite on every clustered dimension.

Reference parity: the reference mutates its Delta history with
row-level UPDATEs through delta-spark (``deltaprocessing.py:116``);
stats + skipping is the protocol's scan-pruning contract those
tables rely on at scale.
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


def _mk(spark, n=400, files=8):
    # id-clustered layout: each file covers one disjoint id range
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 7).alias("bucket"),
        F.concat(F.lit("s"), F.format_string("%05d", "id")).alias("tag"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.col("id") * 1.5)
        .alias("score"),
    )
    return df.repartitionByRange(files, "id").sortWithinPartitions("id")


def _stats_of(spark, table_dir):
    return {
        r.path: json.loads(r.stats) if r.stats else None
        for r in deltalog.live_files(
            deltalog.read_log_actions(spark, table_dir)
        ).collect()
    }


# ------------------------------------------------------------ stats


def test_adds_carry_footer_stats(spark, table_dir):
    deltalog.create_table(spark, _mk(spark), table_dir, n_files=8)
    stats = _stats_of(spark, table_dir)
    assert len(stats) == 8 and all(stats.values())
    total = sum(s["numRecords"] for s in stats.values())
    assert total == 400
    for s in stats.values():
        assert s["minValues"]["id"] <= s["maxValues"]["id"]
        # string column stats present and ordered
        assert s["minValues"]["tag"] <= s["maxValues"]["tag"]
        # every 10th score is null -> nullCount tracks it
        assert s["nullCount"]["score"] >= 0
    # id ranges are disjoint across files (range-clustered layout)
    spans = sorted(
        (s["minValues"]["id"], s["maxValues"]["id"]) for s in stats.values()
    )
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi < lo


def test_all_null_column_absent_from_minmax_but_kept(spark, table_dir):
    df = spark.range(10).select(
        F.col("id"), F.lit(None).cast("string").alias("gone")
    )
    deltalog.create_table(spark, df, table_dir)
    (s,) = _stats_of(spark, table_dir).values()
    assert "gone" not in s["minValues"]
    assert s["nullCount"]["gone"] == 10
    # a predicate on the stats-less column cannot prune the file
    assert (
        deltalog.candidate_files(
            spark, table_dir, [("gone", "==", "x")]
        ).count()
        == 1
    )


# --------------------------------------------------------- skipping


def test_skipping_prunes_files_and_result_is_exact(spark, table_dir):
    deltalog.create_table(spark, _mk(spark), table_dir, n_files=8)
    # 400 ids over 8 files -> < 100 touches exactly 2
    cand = deltalog.candidate_files(spark, table_dir, [("id", "<", 100)])
    assert cand.count() == 2
    out = deltalog.read_snapshot(spark, table_dir, skipping=[("id", "<", 100)])
    assert sorted(r["id"] for r in out.collect()) == list(range(100))
    # conjunction narrows further
    cand2 = deltalog.candidate_files(
        spark, table_dir, [("id", ">=", 100), ("id", "<", 150)]
    )
    assert cand2.count() == 1
    # string predicate prunes on string stats
    cand3 = deltalog.candidate_files(
        spark, table_dir, [("tag", "<", "s00050")]
    )
    assert cand3.count() == 1


def test_skipping_empty_result_keeps_declared_schema(spark, table_dir):
    deltalog.create_table(spark, _mk(spark), table_dir, n_files=4)
    out = deltalog.read_snapshot(
        spark, table_dir, skipping=[("id", ">", 10_000)]
    )
    assert out.count() == 0
    assert out.columns == ["id", "bucket", "tag", "score"]


def test_skipping_survives_checkpoint_and_restore(spark, table_dir):
    deltalog.create_table(spark, _mk(spark), table_dir, n_files=8)
    deltalog.overwrite(spark, _mk(spark, n=200, files=4), table_dir, n_files=4)
    # restore re-adds files WITH their original stats
    deltalog.restore(spark, table_dir, 0)
    stats = _stats_of(spark, table_dir)
    assert len(stats) == 8 and all(stats.values())
    deltalog.write_checkpoint(spark, table_dir)
    deltalog.cleanup_log_before_checkpoint(table_dir)
    # stats flowed through the checkpoint rebuild: skipping still
    # prunes with the pre-checkpoint JSON gone (400 ids / 8 files)
    assert all(_stats_of(spark, table_dir).values())
    assert (
        deltalog.candidate_files(spark, table_dir, [("id", "<", 50)]).count()
        == 1
    )


def test_unsupported_op_or_literal_raises(spark, table_dir):
    deltalog.create_table(spark, _mk(spark, n=10, files=1), table_dir)
    with pytest.raises(ValueError, match="op"):
        deltalog.candidate_files(
            spark, table_dir, [("id", "!=", 1)]
        ).count()
    with pytest.raises(ValueError, match="literal"):
        deltalog.candidate_files(
            spark, table_dir, [("id", "<", [1])]
        ).count()


# ------------------------------------------------- DELETE / UPDATE


def test_delete_rewrites_only_touched_files(spark, table_dir):
    deltalog.create_table(spark, _mk(spark), table_dir, n_files=8)
    before = set(_stats_of(spark, table_dir))
    deltalog.delete_where(
        spark, table_dir, "id < 30", skipping=[("id", "<", 30)]
    )
    after = set(_stats_of(spark, table_dir))
    # 30 ids live in file 0 only: 7 of 8 original files untouched
    assert len(before & after) == 7
    ids = sorted(
        r["id"]
        for r in deltalog.read_snapshot(spark, table_dir).collect()
    )
    assert ids == list(range(30, 400))


def test_delete_null_condition_rows_are_kept(spark, table_dir):
    deltalog.create_table(spark, _mk(spark, n=50, files=1), table_dir)
    # score is NULL for id % 10 == 0 -> condition NULL -> row kept
    deltalog.delete_where(spark, table_dir, "score < 30.0")
    ids = sorted(
        r["id"]
        for r in deltalog.read_snapshot(spark, table_dir).collect()
    )
    # deleted: ids with score != null and score < 30 (id*1.5 < 30 -> id < 20, id%10 != 0)
    expect = [i for i in range(50) if i % 10 == 0 or i * 1.5 >= 30.0]
    assert ids == expect


def test_full_file_delete_is_pure_tombstone(spark, table_dir):
    deltalog.create_table(spark, _mk(spark), table_dir, n_files=8)
    n_before = len(_stats_of(spark, table_dir))
    # one whole file's range (file 0 holds ids 0..49)
    deltalog.delete_where(spark, table_dir, "id < 50")
    stats = _stats_of(spark, table_dir)
    # no replacement file was added: live count dropped by one
    assert len(stats) == n_before - 1
    assert deltalog.read_snapshot(spark, table_dir).count() == 350


def test_delete_noop_commits_nothing(spark, table_dir):
    v0 = deltalog.create_table(spark, _mk(spark), table_dir, n_files=4)
    v1 = deltalog.delete_where(spark, table_dir, "id < 0")
    assert v1 == v0
    assert not os.path.exists(
        os.path.join(table_dir, "_delta_log", f"{v0 + 1:020d}.json")
    )


def test_update_evaluates_sets_against_old_row(spark, table_dir):
    df = spark.range(10).select(
        F.col("id"),
        (F.col("id") * 1.0).alias("a"),
        (F.col("id") * 10.0).alias("b"),
    )
    deltalog.create_table(spark, df, table_dir)
    # swap semantics: both SETs must read the OLD a/b
    deltalog.update_where(
        spark, table_dir, "id >= 0", {"a": "b", "b": "a"}
    )
    rows = {
        r["id"]: (r["a"], r["b"])
        for r in deltalog.read_snapshot(spark, table_dir).collect()
    }
    assert rows[3] == (30.0, 3.0)


def test_update_touches_only_matching_files_and_keeps_types(
    spark, table_dir
):
    deltalog.create_table(spark, _mk(spark), table_dir, n_files=8)
    before = set(_stats_of(spark, table_dir))
    deltalog.update_where(
        spark,
        table_dir,
        "id >= 350",
        {"bucket": "bucket + 100"},
        skipping=[("id", ">=", 350)],
    )
    after = _stats_of(spark, table_dir)
    assert len(before & set(after)) == 7
    snap = deltalog.read_snapshot(spark, table_dir)
    assert dict(snap.dtypes)["bucket"] == "bigint"
    got = snap.filter("id >= 350").agg(F.min("bucket")).first()[0]
    assert got >= 100
    assert snap.filter("id < 350").agg(F.max("bucket")).first()[0] < 100


def test_update_unknown_column_raises(spark, table_dir):
    deltalog.create_table(spark, _mk(spark, n=10, files=1), table_dir)
    with pytest.raises(ValueError, match="unknown"):
        deltalog.update_where(spark, table_dir, "id = 1", {"nope": "1"})


def test_delete_on_partitioned_table_keeps_layout(spark, table_dir):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 4).cast("string").alias("g")
    )
    deltalog.create_table(spark, df, table_dir, partition_by=["g"])
    deltalog.delete_where(spark, table_dir, "id < 8")
    lf = deltalog.live_files(
        deltalog.read_log_actions(spark, table_dir)
    ).collect()
    assert all(r.partitionValues and "g" in r.partitionValues for r in lf)
    pruned = deltalog.read_snapshot(
        spark, table_dir, partition_filter={"g": "1"}
    )
    assert sorted(r["id"] for r in pruned.collect()) == [
        i for i in range(8, 100) if i % 4 == 1
    ]


def test_dml_is_visible_to_change_feed(spark, table_dir):
    deltalog.create_table(spark, _mk(spark, n=100, files=2), table_dir)
    v = deltalog.delete_where(spark, table_dir, "id < 10")
    ch = deltalog.read_changes(
        spark, table_dir, starting_version=v - 1, ending_version=v
    )
    counts = {
        r["_change_type"]: r["n"]
        for r in ch.groupBy("_change_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # the DELETE commit carries a cdc action, so the feed is
    # ROW-LEVEL: exactly the 10 deleted rows, no passthrough churn
    # from the rewritten file (the spec's use-cdc-when-present rule)
    assert counts == {"delete": 10}


# ----------------------------------------------------------- zorder


def test_zorder_tightens_envelopes_on_both_dims(spark, table_dir):
    df = spark.range(4096).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / F.lit(64)).cast("bigint").alias("y"),
        F.col("id").alias("payload"),
    )
    # hash layout: every file spans nearly the full x and y domains
    deltalog.create_table(spark, df.repartition(16), table_dir, n_files=16)
    c_x0 = deltalog.candidate_files(spark, table_dir, [("x", "<", 8)]).count()
    c_y0 = deltalog.candidate_files(spark, table_dir, [("y", "<", 8)]).count()
    assert c_x0 == 16 and c_y0 == 16
    v = deltalog.optimize_zorder(spark, table_dir, ["x", "y"], n_files=16)
    c_x1 = deltalog.candidate_files(spark, table_dir, [("x", "<", 8)]).count()
    c_y1 = deltalog.candidate_files(spark, table_dir, [("y", "<", 8)]).count()
    # an eighth of each domain must prune well on BOTH dims at once
    assert c_x1 <= 8 and c_y1 <= 8
    # content untouched, pure-rewrite commit
    assert deltalog.read_snapshot(spark, table_dir).count() == 4096
    acts = deltalog.read_log_actions(spark, table_dir).filter(
        F.col("version") == v
    )
    changed = acts.filter(
        F.col("add.dataChange") | F.col("remove.dataChange")
    ).count()
    assert changed == 0
    out = deltalog.read_snapshot(
        spark, table_dir, skipping=[("x", "<", 8), ("y", "<", 8)]
    )
    assert out.count() == 64


def test_zorder_rejects_partitioned_table(spark, table_dir):
    df = spark.range(20).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("g")
    )
    deltalog.create_table(spark, df, table_dir, partition_by=["g"])
    with pytest.raises(ValueError, match="partitioned"):
        deltalog.optimize_zorder(spark, table_dir, ["id"])


# ------------------------------------------------ targeted OPTIMIZE


def test_compact_partition_scoped_and_binpacked(spark, table_dir):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("g")
    )
    deltalog.create_table(spark, df, table_dir, partition_by=["g"])
    for i in range(3):
        deltalog.append(
            spark,
            spark.range(100 + i * 10, 110 + i * 10).select(
                F.col("id"), (F.col("id") % 2).cast("string").alias("g")
            ),
            table_dir,
        )
    lf = deltalog.live_files(deltalog.read_log_actions(spark, table_dir))
    per_g = {
        r["g"]: r["n"]
        for r in lf.groupBy(
            F.col("partitionValues").getItem("g").alias("g")
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert per_g == {"0": 4, "1": 4}
    # OPTIMIZE WHERE g=0: partition 1's files must not be touched
    deltalog.compact(spark, table_dir, partition_filter={"g": "0"})
    lf2 = deltalog.live_files(
        deltalog.read_log_actions(spark, table_dir)
    )
    per_g2 = {
        r["g"]: r["n"]
        for r in lf2.groupBy(
            F.col("partitionValues").getItem("g").alias("g")
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert per_g2 == {"0": 1, "1": 4}
    assert deltalog.read_snapshot(spark, table_dir).count() == 130


def test_compact_min_size_and_target_binpack(spark, table_dir):
    deltalog.create_table(
        spark, spark.range(10_000), table_dir, n_files=1
    )
    for i in range(4):
        deltalog.append(
            spark, spark.range(10_000 + i, 10_001 + i), table_dir
        )
    lf = deltalog.live_files(
        deltalog.read_log_actions(spark, table_dir)
    ).collect()
    big = max(r.size for r in lf)
    # only the four tiny files qualify; the big one is untouched
    deltalog.compact(spark, table_dir, min_file_bytes=big)
    lf2 = deltalog.live_files(
        deltalog.read_log_actions(spark, table_dir)
    ).collect()
    assert len(lf2) == 2  # big + one packed file
    assert {r.size for r in lf2} & {big}
    assert deltalog.read_snapshot(spark, table_dir).count() == 10_004
    # target_file_bytes splits the rewrite into several bins
    deltalog.append(
        spark, spark.range(20_000, 30_000), table_dir, n_files=1
    )
    sizes = {
        r.path: r.size
        for r in deltalog.live_files(
            deltalog.read_log_actions(spark, table_dir)
        ).collect()
    }
    total = sum(sizes.values())
    deltalog.compact(
        spark, table_dir, target_file_bytes=total // 3 + 1
    )
    n_after = deltalog.live_files(
        deltalog.read_log_actions(spark, table_dir)
    ).count()
    assert 2 <= n_after <= 4
    assert deltalog.read_snapshot(spark, table_dir).count() == 20_004


def test_compact_single_file_is_noop(spark, table_dir):
    v0 = deltalog.create_table(spark, spark.range(10), table_dir)
    v = deltalog.compact(spark, table_dir)
    assert v == v0
