"""Source/sink layer tests (S1-S14): OOXML round trips, header
autodetect semantics, zip consolidation, and oracle parity for the
registered io_ queries."""

from __future__ import annotations

import pytest

from cdc_pipe_line_spark import ooxml, sources
from cdc_pipe_line_spark.queries import io_q
from tests.conftest import SF_DIR, assert_matches_oracle


def test_xlsx_roundtrip_types():
    rows = [
        ["name", "qty", "price", "flag"],
        ["ACME", 3, 1.5, "yes"],
        ["Zeta & Sons <large>", 0, -2.25, None],
    ]
    data = ooxml.write_xlsx({"S1": rows})
    got = ooxml.read_xlsx_rows(data)
    assert got[0] == ["name", "qty", "price", "flag"]
    assert got[1] == ["ACME", 3, 1.5, "yes"]
    # XML-escaped text survives; trailing None padded
    assert got[2] == ["Zeta & Sons <large>", 0, -2.25, None]


def test_xlsx_multi_sheet_by_name():
    data = ooxml.write_xlsx({"A-1": [["x"], [1]], "B-2": [["y"], [2]]})
    assert ooxml.xlsx_sheet_names(data) == ["A-1", "B-2"]
    assert ooxml.read_xlsx_rows(data, sheet="B-2") == [["y"], [2]]


def test_docx_table_roundtrip():
    rows = [["k", "v"], ["1", "a&b"], ["2", ""]]
    got = ooxml.read_docx_table(ooxml.write_docx_table(rows))
    assert got == rows


def test_autodetect_header_reference_semantics():
    # app/app.py:610-619: row with a 'date' cell in the first 3 rows
    # becomes the header; first cell renamed METRIC; rows above dropped
    rows = [
        ["junk", None],
        ["Metric name", "Date", "2024-03-31"],
        ["Cash", "x", "1.0"],
    ]
    out = sources.autodetect_header(rows)
    assert out[0] == ["METRIC", "Date", "2024-03-31"]
    assert out[1:] == [["Cash", "x", "1.0"]]
    # no date cell -> unchanged
    plain = [["a", "b"], ["1", "2"]]
    assert sources.autodetect_header(plain) == plain


def test_rows_to_df_dedups_headers(spark):
    df = sources.rows_to_df(spark, [["a", "a", None], ["1", "2", "3"]])
    assert df.columns == ["a", "a_1", "c2"]
    assert df.count() == 1


@pytest.mark.parametrize("name", sorted(io_q.QUERIES))
def test_io_query_matches_oracle(spark, duck, name):
    df = io_q.QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, duck, io_q.ORACLE[name])


def test_ensure_bucketed_table_recovers_partial_write(spark):
    """A staging dir WITHOUT _SUCCESS (crashed write) must be cleaned
    and rewritten, not re-registered over partial data; and the
    rebuilt table must still read back complete and bucketed."""
    import os
    import shutil

    table = "bkt_test_partial"
    loc = f"/tmp/cdc_warehouse/{table}"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    shutil.rmtree(loc, ignore_errors=True)
    os.makedirs(loc)
    with open(os.path.join(loc, "part-garbage.parquet"), "w") as fh:
        fh.write("not parquet")  # simulated torn write, no _SUCCESS

    src = spark.range(100).selectExpr("id AS k", "id * 2 AS v")
    out = sources.ensure_bucketed_table(
        spark, table, lambda: src, ["k"], n_buckets=4
    )
    assert out.count() == 100
    assert os.path.exists(os.path.join(loc, "_SUCCESS"))
    # bucketing must be live again: keyed agg needs no shuffle (a bare
    # scan reports "Bucketed: false (disabled by query planner)" by
    # design, so assert on the plan that actually exploits buckets)
    agg = out.groupBy("k").sum("v")
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    shutil.rmtree(loc, ignore_errors=True)


def test_jdbc_parallel_read_and_pushdown(spark, tmp_path):
    """S10: the partitioned JDBC scan really splits into N range
    queries, and filters reach the generated SQL (PushedFilters)."""
    from cdc_pipe_line_spark import sources

    url = f"jdbc:derby:{tmp_path}/db;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    df = spark.range(0, 100).selectExpr("id AS k", "id * 2 AS v")
    sources.write_jdbc(df, url, "t", num_partitions=2, properties=props)

    back = sources.read_jdbc(
        spark, url, "t",
        partition_column="k", lower_bound=0, upper_bound=100,
        num_partitions=4, properties=props,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 100
    filtered = back.filter("k >= 90").select("k")
    assert filtered.count() == 10
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    # filter pushed into the generated SQL; only k in the read schema
    assert "GreaterThanOrEqual(k,90)" in plan
    assert "ReadSchema: struct<k:bigint>" in plan
    # append mode accumulates
    sources.write_jdbc(df.limit(5), url, "t", mode="append", properties=props)
    assert sources.read_jdbc(spark, url, "t", properties=props).count() == 105

    with pytest.raises(ValueError, match="requires"):
        sources.read_jdbc(spark, url, "t", partition_column="k", properties=props)


def test_ledger_sink_commit_protocol(spark, tmp_path):
    """Two-phase-commit contract of LedgerSinkDataSource: (a) the
    read path follows the manifest, so an orphaned staged file (a
    failed or speculative attempt that never reached commit) is
    invisible; (b) overwrite stages a fresh epoch and the manifest
    swap atomically retires the old one."""
    import json
    import os

    from pyspark.sql import functions as F

    from cdc_pipe_line_spark.pydatasource import (
        LedgerSinkDataSource,
        read_ledger,
    )

    try:
        spark.dataSource.register(LedgerSinkDataSource)
    except Exception:
        pass
    path = str(tmp_path / "ledger")
    df = spark.range(0, 1000).select(
        F.col("id").alias("event_id"), (F.col("id") % 7).alias("k")
    )
    df.repartition(8).write.format("ledger_sink").mode("overwrite").option(
        "path", path
    ).save()
    back, manifest = read_ledger(spark, path, "event_id bigint, k bigint")
    assert len(manifest["files"]) == 8
    assert back.count() == 1000
    assert back.agg(F.sum("event_id")).first()[0] == 499500
    # (a) orphan staged file: invisible to the manifest-driven read
    orphan = os.path.join(
        path, "_staged", manifest["epoch"], "part-00099-99999.jsonl"
    )
    with open(orphan, "w") as fh:
        fh.write(json.dumps({"event_id": 10**9, "k": 0}) + "\n")
    back2, _ = read_ledger(spark, path, "event_id bigint, k bigint")
    assert back2.count() == 1000
    # (b) overwrite swaps epochs; the old epoch's files stop mattering
    df.filter("event_id < 100").repartition(3).write.format(
        "ledger_sink"
    ).mode("overwrite").option("path", path).save()
    back3, m3 = read_ledger(spark, path, "event_id bigint, k bigint")
    assert m3["epoch"] != manifest["epoch"]
    assert len(m3["files"]) == 3
    assert back3.count() == 100
    # (c) commit pruned the superseded epoch's staged dir (ADVICE r7:
    # reruns must not accumulate garbage) — only the live epoch remains
    assert os.listdir(os.path.join(path, "_staged")) == [m3["epoch"]]


def test_stream_ledger_sink_replayed_commit_is_noop(tmp_path):
    """Exactly-once across restarts = batchId idempotence: Spark
    replays an uncommitted epoch with the SAME batchId after
    recovery; a second commit for an already-ledgered batch must not
    double-publish."""
    import json

    from cdc_pipe_line_spark.pydatasource import (
        _StreamLedgerCommit,
        _StreamLedgerWriter,
    )

    w = _StreamLedgerWriter({"path": str(tmp_path)})
    msgs = [_StreamLedgerCommit("_staged/x.jsonl", 5, 10)]
    w.commit(msgs, 7)
    w.commit(msgs, 7)  # replayed epoch
    w.commit([_StreamLedgerCommit("_staged/y.jsonl", 3, 6)], 8)
    with open(tmp_path / "_STREAM_LEDGER") as fh:
        led = json.load(fh)
    assert [b["batch_id"] for b in led["batches"]] == [7, 8]
    assert sum(f["rows"] for b in led["batches"] for f in b["files"]) == 8
