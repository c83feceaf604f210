"""Golden-case tests for reshape (R1-R9) and timeseries (W4/W5/as-of)
semantics per SURVEY.md §5."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from cdc_pipe_line_spark.reshape import (
    detect_header_pandas,
    pivot_to_wide,
    union_with_drift,
    unpivot_to_tall,
)
from cdc_pipe_line_spark.timeseries import (
    MIN_POINTS,
    asof_join,
    daily_counts,
    gap_fill_daily,
    rolling_zscore,
)


def test_unpivot_pivot_roundtrip(spark):
    """Wide financial shape: metrics x dates round-trips exactly
    (SURVEY §5: unpivot∘pivot on data/Balance-Sheet-TTM.csv shape)."""
    wide = spark.createDataFrame(
        [
            ("AEP", "Cash & Equivalents", 1.5, None),
            ("AEP", "PE Ratio", 30.1, 28.0),
            ("DUK", "Cash & Equivalents", 9.9, 8.8),
        ],
        ["Company", "METRIC", "2024-12-31", "2024-09-30"],
    )
    tall = unpivot_to_tall(
        wide, ["Company", "METRIC"], var_name="Date", value_name="value"
    )
    assert tall.count() == 6  # 3 rows x 2 dates, nulls preserved
    back = pivot_to_wide(
        tall,
        ["Company", "METRIC"],
        "Date",
        "value",
        values=["2024-12-31", "2024-09-30"],
    )
    got = {
        (r["Company"], r["METRIC"]): (r["2024-12-31"], r["2024-09-30"])
        for r in back.collect()
    }
    assert got[("AEP", "Cash & Equivalents")] == (1.5, None)
    assert got[("DUK", "Cash & Equivalents")] == (9.9, 8.8)


def test_unpivot_numeric_coercion(spark):
    """R1 coerces invalid numerics to null (pd.to_numeric
    errors='coerce'; azuredatalake.py:209)."""
    wide = spark.createDataFrame(
        [("m1", "1.5", "oops")], ["METRIC", "2024-12-31", "2024-09-30"]
    )
    tall = unpivot_to_tall(wide, ["METRIC"], var_name="Date", value_name="v")
    vals = {r.Date: r.v for r in tall.collect()}
    assert vals == {"2024-12-31": 1.5, "2024-09-30": None}


def test_union_drift_positions(spark):
    a = spark.createDataFrame([(1, "x")], "k int, a string")
    b = spark.createDataFrame([(2, "y")], "k int, b string")
    out = union_with_drift([a, b])
    assert set(out.columns) == {"k", "a", "b"}
    rows = {r.k: (r.a, r.b) for r in out.collect()}
    assert rows == {1: ("x", None), 2: (None, "y")}


def test_detect_header():
    """R5: scan first 3 rows for a 'date' cell; first header ->
    METRIC; rows above dropped (app/app.py:610-619)."""
    raw = pd.DataFrame(
        [
            ["Some Title", None, None],
            ["Company", "Date", "2024-12-31"],
            ["AEP", "Cash", "1.5"],
        ]
    )
    out = detect_header_pandas(raw)
    assert list(out.columns) == ["METRIC", "Date", "2024-12-31"]
    assert len(out) == 1 and out.iloc[0, 0] == "AEP"
    assert detect_header_pandas(pd.DataFrame([["a", "b"], ["c", "d"]])) is None


def test_gap_fill_and_min_points_guard(spark):
    rows = [
        ("A", dt.datetime(2024, 1, d, 12), ) for d in range(1, 16) if d not in (5, 9)
    ] + [("B", dt.datetime(2024, 1, 2, 1),)]
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    daily = daily_counts(df, "ts", ["g"])
    filled = gap_fill_daily(daily, group_cols=["g"])
    # spine = global [jan1, jan15]; both series get 15 rows
    assert filled.filter(F.col("g") == "A").count() == 15
    assert filled.filter(F.col("g") == "B").count() == 15
    zero_days = filled.filter((F.col("g") == "A") & (F.col("value") == 0.0)).count()
    assert zero_days == 2  # jan 5, jan 9 zero-filled
    # B has 1 real point + 14 zeros = 15 >= MIN_POINTS passes; test guard
    scored = rolling_zscore(filled, group_cols=["g"], min_points=16)
    assert scored.count() == 0  # both series rejected under a higher guard
    scored2 = rolling_zscore(filled, group_cols=["g"], min_points=MIN_POINTS)
    assert scored2.count() == 30
    cols = scored2.columns
    assert cols == ["g", "timestamp", "value", "is_anomaly", "score", "expected_value"]


def test_rolling_zscore_flags_spike(spark):
    """FIXTURES.md §4: injected 10x spike must be flagged."""
    rows = [("s", dt.date(2024, 1, d), 5.0 + (d % 3) * 0.5) for d in range(1, 20)]
    rows[14] = ("s", dt.date(2024, 1, 15), 60.0)  # spike
    df = spark.createDataFrame(rows, "g string, d date, value double")
    scored = rolling_zscore(df, group_cols=["g"])
    flagged = {r.timestamp for r in scored.filter("is_anomaly").collect()}
    assert dt.date(2024, 1, 15) in flagged
    # warm-up rows (no trailing window) are never flagged
    assert dt.date(2024, 1, 1) not in flagged


def test_asof_join_golden(spark):
    left = spark.createDataFrame(
        [("p1", 1, dt.datetime(2024, 1, 1, 10)), ("p2", 1, dt.datetime(2024, 1, 1, 12)),
         ("p3", 2, dt.datetime(2024, 1, 1, 9))],
        "event_id string, user_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 10), 7.0),   # equal ts: inclusive
         (1, dt.datetime(2024, 1, 1, 11), 8.0),
         (2, dt.datetime(2024, 1, 2, 0), 9.0)],   # after left: no match
        "user_id bigint, ts timestamp, v double",
    )
    out = asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts", value_cols=["v"]
    )
    got = {r.event_id: r.v for r in out.collect()}
    assert got == {"p1": 7.0, "p2": 8.0, "p3": None}


def test_ewma_recursion_and_ordering(spark):
    """Hand-computed EWMA: seed = first value, fold in (ts, id) order;
    null values drop; ties break on event_id."""
    import datetime as dt

    from cdc_pipe_line_spark.timeseries import ewma_by_key

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 10, 100.0),
        (1, t0 + dt.timedelta(hours=1), 11, 50.0),
        (1, t0 + dt.timedelta(hours=1), 12, 30.0),  # same ts: id order
        (1, t0 + dt.timedelta(hours=2), 13, None),  # dropped
        (2, t0, 20, 7.0),                            # single event
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    out = {r.user_id: r for r in ewma_by_key(df, alpha=0.5).collect()}
    e = 100.0
    for v in (50.0, 30.0):
        e = e * 0.5 + v * 0.5
    assert out[1].n_events == 3
    assert out[1].ewma == round(e, 4)
    assert out[1].last_value == 30.0
    assert out[1].last_dev == round(30.0 - e, 4)
    assert (out[2].ewma, out[2].n_events) == (7.0, 1)  # seed only


def test_holt_by_key_hand_math(spark):
    """The coupled (level, trend) recursion against hand-computed
    values: vs=[1,2,4], a=.25, g=.125 -> l=1.9609375, b=0.1162109375
    (all dyadic, so equality is exact before the defensive round)."""
    import datetime as dt

    from cdc_pipe_line_spark.timeseries import holt_by_key

    rows = [
        (i, dt.datetime(2024, 1, 1 + i), 1, "v", float(v))
        for i, v in enumerate([1, 2, 4])
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    r = holt_by_key(df).collect()[0]
    assert r.level == 1.9609
    assert r.trend == 0.1162
    assert r.forecast_next == round(1.9609375 + 0.1162109375, 4)
    assert r.last_value == 4.0


def test_holt_single_point_is_level_only(spark):
    import datetime as dt

    from cdc_pipe_line_spark.timeseries import holt_by_key

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1, "v", 7.5)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    r = holt_by_key(df).collect()[0]
    assert (r.level, r.trend, r.forecast_next) == (7.5, 0.0, 7.5)


def test_holt_winters_constant_series_fixed_point(spark):
    """A constant series is an exact fixed point of the additive HW
    recursion: level == the constant, trend == 0, every seasonal
    component == 0, so every h-step forecast == the constant.  All
    arithmetic is dyadic-exact (constant 4.0), so equality is exact."""
    import datetime as dt

    from cdc_pipe_line_spark.timeseries import holt_winters_by_key

    rows = [
        ("k", dt.date(2024, 1, 1) + dt.timedelta(days=i), 4.0)
        for i in range(21)
    ]
    df = spark.createDataFrame(rows, "k string, d date, v double")
    r = holt_winters_by_key(
        df, key_col="k", order_col="d", value_col="v", period=7
    ).collect()[0]
    assert r.n_points == 21
    assert r.level == 4.0
    assert r.trend == 0.0
    assert list(r.seasonal) == [0.0] * 7


def test_holt_winters_pure_weekly_pattern_reproduced(spark):
    """A zero-trend pure weekly pattern: the init already captures the
    exact seasonals, the recursion keeps them (every update term is
    exactly zero), and the h-step forecasts reproduce the pattern."""
    import datetime as dt

    from cdc_pipe_line_spark.timeseries import holt_winters_by_key

    pattern = [8.0, 2.0, 4.0, 6.0, 1.0, 3.0, 4.0]  # mean = 4.0
    rows = [
        ("k", dt.date(2024, 1, 1) + dt.timedelta(days=i), pattern[i % 7])
        for i in range(28)
    ]
    df = spark.createDataFrame(rows, "k string, d date, v double")
    r = holt_winters_by_key(
        df, key_col="k", order_col="d", value_col="v", period=7
    ).collect()[0]
    assert r.level == 4.0
    assert r.trend == 0.0
    # ring aligned so seasonal[h-1] applies to horizon h = day 29, 30, ...
    expected = [pattern[(28 + h) % 7] - 4.0 for h in range(7)]
    assert list(r.seasonal) == expected
    for h in range(1, 8):
        assert r.level + h * r.trend + r.seasonal[h - 1] == pattern[(28 + h - 1) % 7]


def test_holt_winters_drops_short_series(spark):
    """Keys with fewer than 2*period+1 points have no defined init and
    must be dropped, not emitted with garbage state."""
    import datetime as dt

    from cdc_pipe_line_spark.timeseries import holt_winters_by_key

    rows = [
        ("short", dt.date(2024, 1, 1) + dt.timedelta(days=i), 1.0)
        for i in range(14)
    ] + [
        ("long", dt.date(2024, 1, 1) + dt.timedelta(days=i), 1.0)
        for i in range(15)
    ]
    df = spark.createDataFrame(rows, "k string, d date, v double")
    out = holt_winters_by_key(
        df, key_col="k", order_col="d", value_col="v", period=7
    )
    assert [r.k for r in out.collect()] == ["long"]


def test_session_window_exact_gap_merges(spark):
    """Pins the session_window boundary semantics the
    ts_session_window_tvf oracle replays: per-event windows are
    [ts, ts+gap) and sessions merge when windows overlap OR TOUCH —
    an exactly-30-minute silence therefore stays ONE session; only a
    strictly longer silence splits.  If a Spark upgrade flips this to
    strict overlap, this fails before the oracle silently diverges on
    boundary-landing data."""
    import datetime as dt

    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    df = spark.createDataFrame(
        [
            (1, t0),
            (1, t0 + dt.timedelta(minutes=30)),  # exactly gap -> merge
            (2, t0),
            (2, t0 + dt.timedelta(minutes=30, microseconds=1)),  # split
        ],
        "u long, ts timestamp",
    )
    out = (
        df.groupBy("u", F.session_window("ts", "30 minutes"))
        .count()
        .groupBy("u")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy("u")
        .collect()
    )
    assert [(r.u, r.n_sessions) for r in out] == [(1, 1), (2, 2)]
