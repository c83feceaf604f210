"""Time-series operators (SURVEY.md §2.5 A2, §2.6 W4-W5, J10-adjacent):
daily aggregation, date-spine gap fill, rolling anomaly scoring, as-of
joins, sessionization.

The reference built daily change counts in a Python dict, zero-filled
gaps in a loop, and outsourced scoring to a remote anomaly service
(automl_anomaly_detection.py:190-246).  Spark-first: the series is a
grouped aggregation, the spine is ``sequence()+explode`` (no driver
loop), and scoring is a rolling-window z-score — all Catalyst
expressions, per-series parallel, no data leaves the cluster.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Reference guard: series shorter than this are not scored
#: (automl_anomaly_detection.py:112).
MIN_POINTS = 12


def daily_counts(
    df: DataFrame, ts_col: str = "ts", group_cols: list[str] | None = None
) -> DataFrame:
    """Events -> per-day counts (A2; automl_anomaly_detection.py:190-213).

    One shuffle on (group_cols, day); map-side partial counts make the
    exchange tiny regardless of input size.
    """
    group_cols = group_cols or []
    return (
        df.groupBy(
            *group_cols, F.to_date(F.date_trunc("day", ts_col)).alias("d")
        )
        .agg(F.count("*").cast("double").alias("value"))
    )


def date_spine(start: Column, end: Column) -> Column:
    """Array of every date in [start, end] (W4 building block)."""
    return F.sequence(start, end, F.expr("INTERVAL 1 DAY"))


def gap_fill_daily(
    daily: DataFrame,
    *,
    group_cols: list[str] | None = None,
    d_col: str = "d",
    value_col: str = "value",
    fill: float = 0.0,
) -> DataFrame:
    """Zero-fill missing days over each series' [min, max] range — the
    whole table's range when grouped, so all series share one spine
    (W4; automl_anomaly_detection.py:215-227).

    Spine = one global [min,max] aggregate (broadcast) x distinct
    groups, exploded JVM-side; counts join back on (group, day).  The
    left side of the join is the spine (small relative to the raw
    events) so this stays cheap at scale.
    """
    group_cols = group_cols or []
    rng = daily.agg(
        F.min(d_col).alias("__start"), F.max(d_col).alias("__end")
    )
    spine = rng.select(
        F.explode(date_spine(F.col("__start"), F.col("__end"))).alias(d_col)
    )
    if group_cols:
        groups = daily.select(*group_cols).distinct()
        spine = groups.crossJoin(F.broadcast(spine))
    filled = spine.join(daily, on=[*group_cols, d_col], how="left")
    return filled.withColumn(value_col, F.coalesce(F.col(value_col), F.lit(fill)))


def rolling_zscore(
    series: DataFrame,
    *,
    group_cols: list[str] | None = None,
    d_col: str = "d",
    value_col: str = "value",
    lookback: int = 7,
    threshold: float = 3.0,
    min_points: int = MIN_POINTS,
) -> DataFrame:
    """Native anomaly scorer replacing the reference's remote detector
    (W5; automl_anomaly_detection.py:112-136,233-246).

    Per point: expected = trailing-``lookback`` mean, score =
    (value - expected) / stddev, anomaly = |score| > threshold.
    Series shorter than ``min_points`` are rejected wholesale, like the
    reference's >=12-point guard.  Output schema mirrors the
    reference's result rows: ``(..., timestamp, value, is_anomaly,
    score, expected_value)``.

    One shuffle on group_cols; the rolling frame is a ROWS window —
    codegen'd, no UDF.
    """
    group_cols = group_cols or []
    w_order = Window.partitionBy(*group_cols).orderBy(F.col(d_col).asc())
    w_trail = w_order.rowsBetween(-lookback, -1)
    w_all = Window.partitionBy(*group_cols)

    scored = (
        series.withColumn("__n", F.count("*").over(w_all))
        .filter(F.col("__n") >= min_points)
        .withColumn("expected_value", F.avg(value_col).over(w_trail))
        .withColumn("__sd", F.stddev_samp(value_col).over(w_trail))
        .withColumn(
            "score",
            F.when(
                F.col("__sd").isNotNull() & (F.col("__sd") > 0),
                (F.col(value_col) - F.col("expected_value")) / F.col("__sd"),
            ),
        )
        .withColumn(
            "is_anomaly",
            F.coalesce(F.abs(F.col("score")) > threshold, F.lit(False)),
        )
    )
    return scored.select(
        *group_cols,
        F.col(d_col).alias("timestamp"),
        F.col(value_col).alias("value"),
        "is_anomaly",
        "score",
        "expected_value",
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """Distributed as-of join (SURVEY.md §2.3 "engine adds"): for each
    left row, the latest right row with ``right_ts <= left_ts`` per
    key (direction='backward'; 'forward' mirrors it).

    Spark has no native as-of join; the scalable pattern is
    union-and-carry: tag both sides, sort each key's rows by time, and
    carry the last-seen right values forward with
    ``last(ignorenulls=True)``.  ONE shuffle total (on the key), vs. a
    naive range-join + aggregate which shuffles twice and explodes
    matches.  Right rows at equal timestamps are pre-deduped
    (greatest-by-ts wins deterministically via max).
    """
    assert direction in ("backward", "forward")
    # dedup right side at (key, ts): deterministic max per value col
    r = right.groupBy(*on, F.col(right_ts).alias("__ts")).agg(
        *[F.max(c).alias(c) for c in value_cols]
    )
    l_tag = left.withColumn("__ts", F.col(left_ts)).withColumn("__is_left", F.lit(1))
    r_tag = r.withColumn("__is_left", F.lit(0))
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    if direction == "backward":
        # right rows sort before left rows at equal ts => inclusive <=
        order = [F.col("__ts").asc(), F.col("__is_left").asc()]
        frame = Window.partitionBy(*on).orderBy(*order).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        carry = {c: F.last(F.when(F.col("__is_left") == 0, F.col(c)), ignorenulls=True).over(frame) for c in value_cols}
    else:
        order = [F.col("__ts").desc(), F.col("__is_left").asc()]
        frame = Window.partitionBy(*on).orderBy(*order).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        carry = {c: F.last(F.when(F.col("__is_left") == 0, F.col(c)), ignorenulls=True).over(frame) for c in value_cols}

    carried = unioned
    for c, expr in carry.items():
        carried = carried.withColumn(f"__asof_{c}", expr)
    out = carried.filter(F.col("__is_left") == 1).drop("__is_left", "__ts")
    for c in value_cols:
        out = out.drop(c).withColumnRenamed(f"__asof_{c}", c)
    return out


def sessionize(
    df: DataFrame,
    *,
    key_cols: list[str],
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time
    since the previous event of the key exceeds ``gap``.

    lag + conditional cumsum over one key-partitioned window (the
    standard batch pattern; streaming uses ``session_window``).
    Adds ``session_id`` = ``<key>-<n>`` stable within the key.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc())
    gap_expr = F.expr(f"INTERVAL {gap}")
    new_sess = (
        F.col(ts_col)
        > F.lag(F.col(ts_col)).over(w) + gap_expr
    )
    return (
        df.withColumn("__new", F.when(new_sess | F.lag(ts_col).over(w).isNull(), 1).otherwise(0))
        .withColumn("session_seq", F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("bigint"))
        .drop("__new")
    )


def ewma_by_key(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    value_col: str = "value",
    alpha: float = 0.2,
) -> DataFrame:
    """Exponentially weighted moving average per key (trend/anomaly
    smoothing): ``e_1 = v_1; e_i = (1-alpha)*e_{i-1} + alpha*v_i``
    over the key's events in (ts, tiebreak) order, emitting the final
    EWMA, the last raw value, and its deviation from the smoothed
    level — the drift signal a monitoring pipeline thresholds.

    Determinism contract (same as ``text.lm_score``): the recursion
    folds a POSITION-ordered collected array left-to-right, seeded
    with the first value — never a distributed float reduction whose
    combine order floats.  DuckDB's ``list_reduce`` has identical
    seed/order semantics, so the oracle replays it bit-for-bit
    (verified to the last ulp before the defensive round).

    Scale shape: one hash shuffle on the key + per-key sorted
    collect.  A key's history must fit one aggregation buffer — the
    same bound every per-key sequence model has; beyond that,
    pre-aggregate to coarser ticks first (``daily_counts``).
    """
    nulls_out = df.filter(F.col(value_col).isNotNull())
    sorted_vals = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(ts_col).alias("t"),
                    F.col(tiebreak_col).alias("k"),
                    F.col(value_col).cast("double").alias("v"),
                )
            )
        ),
        lambda s: s["v"],
    )
    per_key = nulls_out.groupBy(key_col).agg(
        F.count("*").cast("bigint").alias("n_events"),
        sorted_vals.alias("__vs"),
    )
    ewma = F.aggregate(
        F.slice("__vs", 2, F.greatest(F.size("__vs") - 1, F.lit(0))),
        F.element_at("__vs", 1),
        lambda acc, v: acc * F.lit(1.0 - alpha) + v * F.lit(alpha),
    )
    last = F.element_at("__vs", -1)
    return per_key.select(
        key_col,
        "n_events",
        F.round(last, 4).alias("last_value"),
        F.round(ewma, 4).alias("ewma"),
        F.round(last - ewma, 4).alias("last_dev"),
    )


def holt_by_key(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    value_col: str = "value",
    alpha: float = 0.25,
    beta: float = 0.125,
) -> DataFrame:
    """Holt double-exponential smoothing per key (level + linear
    trend): ``l_1 = v_1, b_1 = 0;  l_i = a*v_i + (1-a)*(l+b);
    b_i = g*(l_i - l) + (1-g)*b``, emitting the final level, trend,
    and the one-step forecast ``l + b`` — the next tier above
    :func:`ewma_by_key` for drift that has direction, not just a
    moving center.

    Determinism contract (same as ``ewma_by_key``): a position-ordered
    fold whose accumulator is a (level, trend) STRUCT; DuckDB's
    ``list_reduce`` seeds from the first element and folds in the same
    order over the same IEEE ops, so the oracle replays the coupled
    recursion bit-for-bit.  The default alpha/beta are dyadic
    (0.25, 0.125) so even the literals are exactly representable.

    Scale shape: identical to EWMA — one hash shuffle on the key,
    per-key sorted collect, per-key history bounded by the
    aggregation buffer (pre-aggregate to coarser ticks beyond that).
    """
    nulls_out = df.filter(F.col(value_col).isNotNull())
    sorted_vals = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(ts_col).alias("t"),
                    F.col(tiebreak_col).alias("k"),
                    F.col(value_col).cast("double").alias("v"),
                )
            )
        ),
        lambda s: s["v"],
    )
    per_key = nulls_out.groupBy(key_col).agg(
        F.count("*").cast("bigint").alias("n_events"),
        sorted_vals.alias("__vs"),
    )

    a, g = float(alpha), float(beta)

    def _step(acc, v):
        lnew = v * F.lit(a) + (F.lit(1.0 - a)) * (acc["l"] + acc["b"])
        bnew = (lnew - acc["l"]) * F.lit(g) + F.lit(1.0 - g) * acc["b"]
        return F.struct(lnew.alias("l"), bnew.alias("b"))

    state = F.aggregate(
        F.slice("__vs", 2, F.greatest(F.size("__vs") - 1, F.lit(0))),
        F.struct(
            F.element_at("__vs", 1).alias("l"),
            F.lit(0.0).alias("b"),
        ),
        _step,
    )
    last = F.element_at("__vs", -1)
    return per_key.select(
        key_col,
        "n_events",
        F.round(last, 4).alias("last_value"),
        F.round(state["l"], 4).alias("level"),
        F.round(state["b"], 4).alias("trend"),
        F.round(state["l"] + state["b"], 4).alias("forecast_next"),
    )


def cusum_changepoints(
    daily: DataFrame,
    *,
    group_cols: list[str],
    value_col: str = "value",
    ts_col: str = "timestamp",
    k: float = 0.5,
    h: float = 4.0,
) -> DataFrame:
    """Two-sided CUSUM change-point detection per group: the classic
    sequential drift detector (Page 1954) over a per-group series.

    ``S+_t = max(0, S+_{t-1} + z_t - k)``, ``S-_t = max(0, S-_{t-1}
    - z_t - k)`` with ``z_t`` the per-group standardized value; an
    alarm fires when either statistic crosses ``h`` and the statistic
    resets.  The max(0, ...) reset makes the recursion inherently
    sequential — not expressible as a window aggregate — so each
    group's series runs through ``applyInPandas`` (Arrow-batched, one
    group per call).  That is the sanctioned custom-stateful-operator
    shape: the SERIES is spine-sized (days x groups), not row-sized —
    the raw table never reaches Python; at 100 TB the aggregate that
    builds ``daily`` does all the heavy lifting JVM-side.

    Standardization uses the per-group mean/std of the WHOLE series
    (retrospective monitoring); mean/std are floor-rounded to 6dp so
    the recursion's inputs are bit-identical across engines (the
    oracle replays it with a RECURSIVE CTE).
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    stats = daily.groupBy(*group_cols).agg(
        (
            F.floor(F.avg(value_col) * 1e6 + F.lit(0.5)) / 1e6
        ).alias("__mu"),
        (
            F.floor(
                F.coalesce(F.stddev_samp(value_col), F.lit(0.0)) * 1e6
                + F.lit(0.5)
            )
            / 1e6
        ).alias("__sd"),
    )
    joined = daily.join(F.broadcast(stats), group_cols)

    # Group-key output types mirror the input schema (a long key must
    # not be declared StringType — Arrow conversion would reject it).
    in_type = {f.name: f.dataType for f in daily.schema.fields}
    out_schema = StructType(
        [
            *[
                StructField(c, in_type.get(c, StringType()), True)
                for c in group_cols
            ],
            StructField("d", StringType(), True),
            StructField("z", DoubleType(), True),
            StructField("s_hi", DoubleType(), True),
            StructField("s_lo", DoubleType(), True),
            StructField("alarm", BooleanType(), True),
            StructField("n_alarms_so_far", LongType(), True),
        ]
    )
    out_cols = [f.name for f in out_schema]

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        # Vectorized kernel: z standardization, rounding, and output
        # assembly are numpy array ops; only the inherently sequential
        # max(0, ...) recursion stays a scalar loop — over raw float64
        # values, no per-row pandas indexing or dict building.  The
        # recursion keeps the exact evaluation order of the original
        # ((s + z) - k, not s + (z - k)): float addition is not
        # associative and the oracle's RECURSIVE CTE replays the
        # left-to-right order bit-for-bit.
        pdf = pdf.sort_values("d").reset_index(drop=True)
        n = len(pdf)
        if n == 0:
            return pd.DataFrame(columns=out_cols)
        mu = float(pdf["__mu"].iloc[0])
        sd = float(pdf["__sd"].iloc[0])
        v = pdf[value_col].to_numpy(dtype="float64")
        z = (v - mu) / sd if sd > 0 else np.zeros(n, dtype="float64")
        s_hi_a = np.empty(n, dtype="float64")
        s_lo_a = np.empty(n, dtype="float64")
        alarm_a = np.empty(n, dtype=bool)
        alarms_a = np.empty(n, dtype="int64")
        s_hi = s_lo = 0.0
        n_alarms = 0
        for i in range(n):
            zi = z[i]
            s_hi = max(0.0, (s_hi + zi) - k)
            s_lo = max(0.0, (s_lo - zi) - k)
            alarm = s_hi > h or s_lo > h
            if alarm:
                n_alarms += 1
                s_hi = s_lo = 0.0
            s_hi_a[i] = s_hi
            s_lo_a[i] = s_lo
            alarm_a[i] = alarm
            alarms_a[i] = n_alarms
        out = {c: pdf[c] for c in group_cols}
        out["d"] = pdf["d"]
        out["z"] = np.floor(z * 1e4 + 0.5) / 1e4
        out["s_hi"] = np.floor(s_hi_a * 1e4 + 0.5) / 1e4
        out["s_lo"] = np.floor(s_lo_a * 1e4 + 0.5) / 1e4
        out["alarm"] = alarm_a
        out["n_alarms_so_far"] = alarms_a
        return pd.DataFrame(out, columns=out_cols)

    prepped = joined.select(
        *group_cols,
        F.date_format(ts_col, "yyyy-MM-dd").alias("d"),
        F.col(value_col),
        "__mu",
        "__sd",
    )
    return prepped.groupBy(*group_cols).applyInPandas(run, out_schema)


def holt_winters_by_key(
    df: DataFrame,
    *,
    key_col: str,
    order_col: str,
    value_col: str,
    period: int = 7,
    alpha: float = 0.25,
    beta: float = 0.125,
    gamma: float = 0.25,
) -> DataFrame:
    """Holt-Winters additive triple-exponential smoothing per key —
    the seasonal tier above :func:`holt_by_key` (level + trend +
    ``period``-long seasonal state; Winters 1960, public):

    ``l_t = a*(v_t - s_{t-m}) + (1-a)*(l + b)``
    ``b_t = g*(l_t - l) + (1-g)*b``
    ``s_t = d*(v_t - l_t) + (1-d)*s_{t-m}``

    with the textbook init over the first two seasons: ``l_m =
    avg(v_1..v_m)``, ``b_m = (avg(v_{m+1}..v_{2m}) - l_m)/m``,
    ``s_i = v_i - l_m``.  Keys with fewer than ``2*period + 1``
    points are dropped (init would be undefined).

    Determinism contract (same as holt/ewma): the recursion is a
    position-ordered :func:`F.aggregate` fold whose accumulator is a
    (level, trend, seasonal-ring) struct — the ring rotates by
    slice+append so ``s[1]`` is always the component that applies to
    the NEXT step.  alpha/beta/gamma default to dyadic literals and
    every operand sequence mirrors the DuckDB recursive-CTE oracle
    token-for-token, so identical IEEE doubles fold on both engines.

    Returns one row per key: ``n_points``, final ``level`` / ``trend``
    (unrounded doubles — callers pin), and ``seasonal`` as the
    ``period``-long array aligned so ``seasonal[h]`` applies to
    horizon ``h``; the h-step forecast is ``level + h*trend +
    seasonal[h]`` for ``h <= period``.

    Scale shape: one hash shuffle on the key, per-key sorted collect
    bounded by the series length (pre-aggregate to coarser ticks
    beyond the aggregation buffer — the caller here folds a daily
    spine, so the array is calendar-bounded).
    """
    m = int(period)
    a, g, d = float(alpha), float(beta), float(gamma)
    sorted_vals = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(order_col).alias("o"),
                    F.col(value_col).cast("double").alias("v"),
                )
            )
        ),
        lambda s: s["v"],
    )
    per_key = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(key_col)
        .agg(F.count("*").cast("bigint").alias("n_points"), sorted_vals.alias("__vs"))
        .filter(F.col("n_points") >= 2 * m + 1)
    )
    season1 = F.slice("__vs", 1, m)
    season2 = F.slice("__vs", m + 1, m)
    lsum = lambda arr: F.aggregate(  # noqa: E731 — ordered left-fold sum
        arr, F.lit(0.0), lambda acc, x: acc + x
    )
    l0 = lsum(season1) / F.lit(float(m))
    b0 = (lsum(season2) / F.lit(float(m)) - l0) / F.lit(float(m))
    s0 = F.transform(season1, lambda x: x - l0)

    def _step(acc, v):
        s1 = F.element_at(acc["s"], 1)
        lnew = F.lit(a) * (v - s1) + F.lit(1.0 - a) * (acc["l"] + acc["b"])
        bnew = F.lit(g) * (lnew - acc["l"]) + F.lit(1.0 - g) * acc["b"]
        snew = F.lit(d) * (v - lnew) + F.lit(1.0 - d) * s1
        return F.struct(
            lnew.alias("l"),
            bnew.alias("b"),
            F.concat(F.slice(acc["s"], 2, m - 1), F.array(snew)).alias("s"),
        )

    state = F.aggregate(
        F.slice("__vs", m + 1, F.size("__vs") - m),
        F.struct(l0.alias("l"), b0.alias("b"), s0.alias("s")),
        _step,
    )
    return per_key.select(
        key_col,
        "n_points",
        state["l"].alias("level"),
        state["b"].alias("trend"),
        state["s"].alias("seasonal"),
    )
