"""CDC diff + SCD2 unit tests on golden reference-shaped cases.

Golden semantics from SURVEY.md §5: 2-row first upload => 2 inserts;
modify/add/remove => exact insert/update/delete sets; null<->value is a
change, null<->null is not; SCD2 invariants (one current row per live
key, contiguous validity, deleted keys have no current row).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_pipe_line_spark.cdc import (
    apply_scd2,
    as_of,
    current_view,
    dedup_events,
    first_load_events,
    snapshot_diff,
    to_cdc_events,
)


def _snap(spark, rows):
    return spark.createDataFrame(rows, "key string, dim1 string, val1 double, val2 double")


def test_first_load_two_rows_two_inserts(spark):
    new = _snap(spark, [("1", "a", 1.0, None), ("2", "b", 2.0, 3.0)])
    ev = first_load_events(new, "key")
    rows = ev.collect()
    assert len(rows) == 2
    assert {r.event_type for r in rows} == {"insert"}
    assert all(r.old_values is None for r in rows)
    assert rows[0].new_values["key"] in {"1", "2"}


def test_diff_exact_sets(spark):
    prev = _snap(
        spark,
        [
            ("1", "a", 1.0, None),   # unchanged
            ("2", "b", 2.0, 3.0),   # update: val1 changes
            ("3", "c", None, None), # update: val2 null->value
            ("4", "d", 4.0, 4.0),   # delete
            ("5", "e", None, 5.0),  # unchanged (null<->null on val1)
        ],
    )
    new = _snap(
        spark,
        [
            ("1", "a", 1.0, None),
            ("2", "b", 2.5, 3.0),
            ("3", "c", None, 9.0),
            ("5", "e", None, 5.0),
            ("6", "f", 6.0, None),  # insert
        ],
    )
    d = snapshot_diff(new, prev, "key")
    by_type = {r.key_value: r for r in d.collect()}
    assert set(by_type) == {"2", "3", "4", "6"}
    assert by_type["6"].event_type == "insert"
    assert by_type["6"].new_values["val1"] == "6.0"
    assert by_type["6"].old_values is None
    assert by_type["4"].event_type == "delete"
    assert by_type["4"].new_values is None
    assert by_type["2"].event_type == "update"
    assert by_type["2"].changed_cols == ["val1"]
    assert by_type["3"].changed_cols == ["val2"]  # null->value IS a change


def test_diff_string_key_semantics(spark):
    """Keys compare as strings (app/app.py:206-207): int 1 == str '1'."""
    prev = spark.createDataFrame([(1, "x")], "k int, v string")
    new = spark.createDataFrame([("1", "x"), ("2", "y")], "k string, v string")
    d = snapshot_diff(new, prev, "k")
    rows = {r.key_value: r.event_type for r in d.collect()}
    assert rows == {"2": "insert"}


def test_envelope_schema(spark):
    new = _snap(spark, [("1", "a", 1.0, None)])
    ev = to_cdc_events(
        first_load_events(new, "key"),
        company_id="AEP",
        table_name="Asset",
        key_column="key",
        event_time=F.lit("2025-01-01 00:00:00").cast("timestamp"),
    )
    r = ev.collect()[0]
    assert r.company_id == "AEP" and r.table_name == "Asset"
    assert r.partition_key == "AEP_Asset_insert"
    assert len(r.event_id) == 36  # uuid
    assert r.key_column == "key"


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id string, event_type string, key_value string, "
        "timestamp timestamp, new_values map<string,string>",
    )


def test_scd2_invariants(spark):
    import datetime as dt

    t = lambda s: dt.datetime.fromisoformat(s)
    ev = _events(
        spark,
        [
            ("e1", "insert", "k1", t("2025-01-01"), {"v": "1"}),
            ("e2", "update", "k1", t("2025-01-03"), {"v": "2"}),
            ("e3", "insert", "k2", t("2025-01-02"), {"v": "9"}),
            ("e4", "delete", "k2", t("2025-01-04"), None),
            ("e4", "delete", "k2", t("2025-01-04"), None),  # dup event_id
        ],
    )
    hist = apply_scd2(None, ev)
    rows = sorted(hist.collect(), key=lambda r: (r.key_value, r.valid_from))
    # k1: two versions, chained; k2: one expired version, no current
    k1 = [r for r in rows if r.key_value == "k1"]
    k2 = [r for r in rows if r.key_value == "k2"]
    assert len(k1) == 2 and len(k2) == 1
    assert k1[0].valid_to == k1[1].valid_from  # contiguous chain
    assert not k1[0].is_current and k1[1].is_current
    assert k1[1].valid_to is None
    assert not k2[0].is_current and k2[0].valid_to == t("2025-01-04")
    cur = current_view(hist).collect()
    assert {r.key_value for r in cur} == {"k1"}
    # as-of before the update sees v=1
    aso = as_of(hist, "2025-01-02 12:00:00").collect()
    assert {(r.key_value, r.data["v"]) for r in aso} == {("k1", "1"), ("k2", "9")}


def test_scd2_incremental_apply_expires_history(spark):
    import datetime as dt

    t = lambda s: dt.datetime.fromisoformat(s)
    batch1 = _events(spark, [("e1", "insert", "k1", t("2025-01-01"), {"v": "1"})])
    batch2 = _events(spark, [("e2", "update", "k1", t("2025-02-01"), {"v": "2"})])
    hist = apply_scd2(apply_scd2(None, batch1), batch2)
    rows = sorted(hist.collect(), key=lambda r: r.valid_from)
    assert len(rows) == 2
    assert rows[0].valid_to == t("2025-02-01") and not rows[0].is_current
    assert rows[1].is_current and rows[1].data["v"] == "2"


def test_flagship_end_to_end_snapshot_fold(spark):
    """SURVEY §3.1 flagship path, golden: folding snapshot versions
    through diff -> events -> SCD2 must make the current view equal
    the LAST snapshot exactly, and keep expired history for keys that
    changed."""
    from cdc_pipe_line_spark import fixtures
    from cdc_pipe_line_spark.cdc.scd2 import current_view, scd2_from_snapshots
    from cdc_pipe_line_spark.queries import load_table

    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR

    orders = load_table(spark, SF_DIR, "orders")
    v1 = fixtures.orders_snapshot_v1(orders)
    v2 = fixtures.orders_snapshot_v2(orders)
    history = scd2_from_snapshots(
        [("2024-01-01 00:00:00", v1), ("2024-02-01 00:00:00", v2)], "o_orderkey"
    ).cache()
    cur = current_view(history)

    want = {
        str(r.o_orderkey): (str(r.o_orderstatus), f"{r.o_totalprice}")
        for r in v2.collect()
    }
    got = {
        r.key_value: (r.data["o_orderstatus"], r.data["o_totalprice"])
        for r in cur.collect()
    }
    assert got == want

    # updated keys (o_orderkey % 20 == 3) must carry an expired version
    expired_updated = (
        history.filter(~F.col("is_current"))
        .filter(F.col("key_value").cast("bigint") % 20 == 3)
        .count()
    )
    n_updated = v2.filter(F.col("o_orderkey") % 20 == 3).count()
    assert expired_updated == n_updated


def test_missing_key_column_error_quality(spark):
    import pytest

    from cdc_pipe_line_spark.cdc.diff import snapshot_diff
    from cdc_pipe_line_spark.cdc.scd2 import apply_scd2

    df = spark.createDataFrame([(1, "a")], "id int, v string")
    with pytest.raises(ValueError, match="key column 'nope'.*available.*id"):
        snapshot_diff(df, df, "nope")
    ev = spark.createDataFrame([("e1", "insert")], "event_id string, event_type string")
    with pytest.raises(ValueError, match="missing required column"):
        apply_scd2(None, ev)


def test_dedup_events_deterministic(spark):
    import datetime as dt

    ev = _events(
        spark,
        [
            ("e1", "insert", "k1", dt.datetime(2025, 1, 2), {"v": "late"}),
            ("e1", "insert", "k1", dt.datetime(2025, 1, 1), {"v": "early"}),
        ],
    )
    out = dedup_events(ev).collect()
    assert len(out) == 1
    assert out[0].new_values["v"] == "early"


def test_changelog_compaction_branches(spark):
    """All four net-effect branches: I..D annihilates, I..U nets to
    insert (LAST payload), U..D nets to delete, U..U nets to update."""
    import datetime as dt

    from pyspark.sql import functions as F

    from cdc_pipe_line_spark.cdc.diff import compact_changelog

    T = dt.datetime
    rows = [
        # key 1: I -> U -> D  => none
        (1, T(2024, 1, 1), 1, "I", 1.0),
        (2, T(2024, 1, 2), 1, "U", 2.0),
        (3, T(2024, 1, 3), 1, "D", 0.0),
        # key 2: I -> U       => insert with value 5.0
        (4, T(2024, 1, 1), 2, "I", 4.0),
        (5, T(2024, 1, 2), 2, "U", 5.0),
        # key 3: U -> D       => delete
        (6, T(2024, 1, 1), 3, "U", 6.0),
        (7, T(2024, 1, 2), 3, "D", 0.0),
        # key 4: U            => update
        (8, T(2024, 1, 1), 4, "U", 8.0),
    ]
    feed = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, op string, value double"
    )
    got = {
        r.user_id: (r.net_op, r.n_changes, r.last_value)
        for r in compact_changelog(feed, key_col="user_id").collect()
    }
    assert got[1] == ("none", 3, 0.0)
    assert got[2] == ("insert", 2, 5.0)
    assert got[3] == ("delete", 2, 0.0)
    assert got[4] == ("update", 1, 8.0)


def test_bitemporal_late_correction(spark):
    """The scenario bitemporality exists for: at tx T2 a correction
    arrives about valid period V1.  Reading (V1, as-known-at T1)
    still shows the ORIGINAL value; reading (V1, as-known-at T2)
    shows the correction; the valid axis keeps V2 unaffected."""
    import datetime as dt

    from pyspark.sql import functions as F

    from cdc_pipe_line_spark.cdc.bitemporal import (
        add_tx_intervals,
        as_of_bitemporal,
    )

    T = dt.datetime
    D = dt.date
    rows = [
        # key 1, valid Jan: recorded at tx Jan-01 value 10.0,
        # CORRECTED at tx Mar-01 to 11.0 (same valid period)
        (1, T(2024, 1, 1), 1, D(2024, 1, 1), D(2024, 2, 1), 10.0),
        (2, T(2024, 3, 1), 1, D(2024, 1, 1), D(2024, 2, 1), 11.0),
        # key 1, valid Feb: recorded at tx Feb-01, never corrected
        (3, T(2024, 2, 1), 1, D(2024, 2, 1), D(2024, 3, 1), 20.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, tx_ts timestamp, key long, "
        "valid_from date, valid_to date, value double",
    )
    bt = add_tx_intervals(
        df, key_cols=["key", "valid_from"], ts_col="tx_ts",
        tiebreak_col="event_id",
    )

    def read(valid_at, tx_at):
        out = as_of_bitemporal(
            bt, valid_at=F.lit(valid_at), tx_at=F.lit(tx_at)
        ).select("value").collect()
        return sorted(r.value for r in out)

    # what we believed on Jan-15 about mid-January: original 10.0
    assert read(D(2024, 1, 15), T(2024, 1, 15)) == [10.0]
    # what we believe on Mar-15 about mid-January: corrected 11.0
    assert read(D(2024, 1, 15), T(2024, 3, 15)) == [11.0]
    # February's fact is untouched by the January correction
    assert read(D(2024, 2, 15), T(2024, 3, 15)) == [20.0]
    # before anything was recorded: empty
    assert read(D(2024, 1, 15), T(2023, 12, 31)) == []
