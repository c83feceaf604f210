"""Time-series queries (SURVEY.md A2/W4/W5 + engine-added as-of join
and sessionization) over the events table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_pipe_line_spark.timeseries import (
    asof_join,
    daily_counts,
    ewma_by_key,
    gap_fill_daily,
    holt_by_key,
    rolling_zscore,
    sessionize,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from cdc_pipe_line_spark.queries import load_table

    return load_table(spark, sf_dir, name)


def _gapfilled(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    daily = daily_counts(ev, "ts", ["event_type"])
    return gap_fill_daily(daily, group_cols=["event_type"])


def q_rolling_zscore(spark, sf_dir):
    """A2 + W4 + W5 in one slot: daily counts per type zero-filled
    over the global day spine (the ``value`` column IS the gap-filled
    series — every (type, day) row appears, zeros included), scored by
    the native rolling z-score anomaly detector (trailing-7 mean /
    stddev, |z|>3, >=12-point guard) — the Spark-side replacement for
    the reference's remote anomaly service."""
    scored = rolling_zscore(
        _gapfilled(spark, sf_dir), group_cols=["event_type"], lookback=7
    )
    return scored.select(
        "event_type",
        F.date_format("timestamp", "yyyy-MM-dd").alias("timestamp"),
        "value",
        "is_anomaly",
        F.round("score", 4).alias("score"),
        F.round("expected_value", 4).alias("expected_value"),
    )


def q_asof_sessionize(spark, sf_dir):
    """Engine-added as-of join + gap sessionization, probe-tagged:

    - ``asof``: each purchase matched to the user's latest click
      at-or-before it (union-and-carry, one shuffle); ``k`` is the
      purchase event_id, ``v`` the matched click value.
    - ``sess``: 30-minute-gap sessions per user (one lag window
      shuffle); ``k`` is the session count, ``v`` the event count.
    """
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    matched = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["click_value"],
    ).select(
        F.lit("asof").alias("probe"),
        "user_id",
        F.col("event_id").alias("k"),
        F.col("click_value").alias("v"),
    )
    s = sessionize(ev, key_cols=["user_id"], ts_col="ts", gap="30 minutes")
    sess = (
        s.groupBy("user_id")
        .agg(
            F.max("session_seq").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.lit("sess").alias("probe"),
            "user_id",
            F.col("n_sessions").alias("k"),
            F.col("n_events").cast("double").alias("v"),
        )
    )
    return matched.unionByName(sess)


_DAILY_SQL = """
daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(count(*) AS DOUBLE) AS value
  FROM events GROUP BY 1, 2),
rng AS (SELECT min(d) AS s, max(d) AS e FROM daily),
spine AS (
  SELECT CAST(unnest(generate_series((SELECT s FROM rng), (SELECT e FROM rng),
              INTERVAL 1 DAY)) AS DATE) AS d),
groups AS (SELECT DISTINCT event_type FROM daily),
filled AS (
  SELECT g.event_type, sp.d, COALESCE(dl.value, 0.0) AS value
  FROM groups g CROSS JOIN spine sp
  LEFT JOIN daily dl ON dl.event_type = g.event_type AND dl.d = sp.d)"""

def q_ewma(spark, sf_dir):
    """Per-user EWMA trend smoothing (alpha 0.2) over the event
    stream: final smoothed level, last raw value and its deviation —
    the drift signal a monitoring pipeline thresholds.  Oracle:
    DuckDB list_reduce replays the position-ordered recursion
    bit-for-bit (same seed and fold order)."""
    ev = _t(spark, sf_dir, "events")
    return ewma_by_key(ev, alpha=0.2)


def q_holt(spark, sf_dir):
    """Per-user Holt level+trend smoothing (alpha .25, beta .125) with
    one-step forecast; the coupled two-state recursion replays
    bit-for-bit via a DuckDB RECURSIVE CTE (list_reduce is unusable
    here: DuckDB 1.0 aliases struct accumulator fields in-place, so a
    two-field fold would read partially-updated state)."""
    ev = _t(spark, sf_dir, "events")
    return holt_by_key(ev)

def q_anomaly_mad(spark, sf_dir):
    """Robust anomaly scoring via median absolute deviation — the
    outlier-resistant alternative to the rolling z-score (a single
    spike inflates a stddev but barely moves a median).  Exact
    medians (Spark median() / DuckDB median are both exact
    interpolated), so the whole robust pipeline is hash-binding.
    Shape: daily counts -> per-type median (tiny agg, broadcast back)
    -> per-type MAD -> flags; three shrinking aggregates."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("d"),
    ).agg(F.count("*").cast("double").alias("n"))
    med = daily.groupBy("event_type").agg(F.median("n").alias("med"))
    dev = daily.join(F.broadcast(med), "event_type").withColumn(
        "absdev", F.abs(F.col("n") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.median("absdev").alias("mad"))
    scored = dev.join(F.broadcast(mad), "event_type").select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        "n",
        F.round("med", 4).alias("med"),
        F.round("mad", 4).alias("mad"),
        (
            F.col("absdev") > F.lit(3.0 * 1.4826) * F.col("mad")
        ).alias("is_anomaly"),
    )
    return scored


def q_time_to_convert(spark, sf_dir):
    """Days-to-convert distribution: hours between each user's first
    view and first subsequent purchase, bucketed into days — the
    funnel's latency histogram."""
    ev = _t(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    )
    p = (
        v.join(ev.filter(F.col("event_type") == "purchase"), "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id", "t_view")
        .agg(F.min("ts").alias("t_buy"))
    )
    days = F.floor(
        (F.unix_micros("t_buy") - F.unix_micros("t_view"))
        / F.lit(86400000000.0)
    ).cast("int")
    return (
        p.withColumn("days_to_convert", days)
        .groupBy("days_to_convert")
        .agg(F.count("*").alias("n_users"))
    )

def q_ohlc_bars(spark, sf_dir):
    """OHLC downsampling — the classic time-series resample: per
    (event_type, day) the opening/closing values (first/last by
    (ts, event_id), tie-broken deterministically), high/low, volume,
    and the day's summed value.  ONE hash-aggregate pass: open/close
    use ``min_by``/``max_by`` with a struct ordering key, so there is
    no window sort — at 100 TB this is a single map-side-combinable
    shuffle on the bar key, not a per-key ordered repartition."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    ordk = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy(
            "event_type",
            F.date_trunc("day", "ts").cast("date").alias("d"),
        )
        .agg(
            F.min_by("value", ordk).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", ordk).alias("close"),
            F.count("*").alias("volume"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("d"),
            F.round("open", 4).alias("open"),
            F.round("high", 4).alias("high"),
            F.round("low", 4).alias("low"),
            F.round("close", 4).alias("close"),
            "volume",
            "total_value",
        )
    )


def q_interpolate_gaps(spark, sf_dir):
    """Linear interpolation over a gappy hourly series: per-type
    hourly mean value joined onto the full hour spine; missing hours
    are linearly interpolated between the nearest observed neighbors
    (IGNORE NULLS window carries), edges take the nearest value.

    Scale shape: the spine is time-span-bound (hours x types), NOT
    row-count-bound — at 100 TB the aggregate shrinks the input to the
    same spine size before any window runs; the two IGNORE-NULLS
    passes then sort a bounded frame.  Output rows: one per
    (type, hour) — constant across scale factors."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    # integer hour buckets (epoch-hours) so spine arithmetic is exact
    hr = F.expr("unix_micros(ts) div 3600000000")
    # round the observed series to 6dp BEFORE interpolating: per-hour
    # avg() accumulates in engine-specific order, and an unrounded
    # last-ulp difference flips the 4dp output rounding on boundary
    # values — pinning the inputs makes the interpolation arithmetic
    # bit-identical across engines
    known = ev.groupBy(
        F.col("event_type"), hr.alias("h")
    ).agg(F.round(F.avg("value"), 6).alias("v"))
    rng = known.agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    spine = (
        rng.select(F.explode(F.sequence("h0", "h1")).alias("h"))
        .crossJoin(known.select("event_type").distinct())
    )
    g = spine.join(known, ["event_type", "h"], "left")
    wb = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    pv = F.last("v", ignorenulls=True).over(wb)
    ph = F.last(F.when(F.col("v").isNotNull(), F.col("h")), True).over(wb)
    nv = F.first("v", ignorenulls=True).over(wf)
    nh = F.first(F.when(F.col("v").isNotNull(), F.col("h")), True).over(wf)
    interp = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
        F.when(
            ph.isNotNull() & nh.isNotNull(),
            pv + (nv - pv) * (F.col("h") - ph) / (nh - ph),
        ).otherwise(F.coalesce(pv, nv))
    )
    src = F.when(F.col("v").isNotNull(), "obs").otherwise(
        F.when(ph.isNotNull() & nh.isNotNull(), "interp").otherwise("edge")
    )
    # NOT round(): midpoint interpolation between 6dp knowns lands
    # exactly on 4dp tie boundaries (…x5), where Spark (BigDecimal
    # HALF_UP on the true binary value) and DuckDB disagree.  floor
    # round-half-up is the same double arithmetic in both engines.
    rounded = F.floor(interp * 10000 + F.lit(0.5)) / 10000
    return g.select(
        "event_type",
        "h",
        rounded.alias("value"),
        src.alias("src"),
    )


def q_dow_seasonality(spark, sf_dir):
    """Weekly seasonal decomposition (STL-lite): daily event counts
    per type, detrended by a centered 7-day moving average; the
    seasonal index is the mean deviation per (type, day-of-week).
    Two shrinking passes: a daily aggregate, then one bounded window
    over the day spine (span-sized, not row-sized)."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("d"),
    ).agg(F.count("*").cast("double").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-3, 3)
    )
    det = daily.withColumn("trend", F.avg("n").over(w)).withColumn(
        "dev", F.col("n") - F.col("trend")
    )
    # ISO-agnostic dow: Spark dayofweek is 1=Sunday..7=Saturday
    return (
        det.groupBy("event_type", F.dayofweek("d").alias("dow"))
        .agg(
            F.round(F.avg("dev"), 4).alias("seasonal"),
            F.count("*").alias("n_days"),
        )
    )


QUERIES = {
    "ts_ohlc_bars": q_ohlc_bars,
    "ts_interpolate_gaps": q_interpolate_gaps,
    "ts_dow_seasonality": q_dow_seasonality,
    "ts_ewma": q_ewma,
    "ts_holt_trend": q_holt,
    "ts_anomaly_mad": q_anomaly_mad,
    "ts_time_to_convert": q_time_to_convert,
    "ts_rolling_zscore": q_rolling_zscore,
    "ts_asof_sessionize": q_asof_sessionize,
}

ORACLE = {
    "ts_ohlc_bars": """
WITH e AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
    ts, event_id, value
  FROM events WHERE value IS NOT NULL),
w AS (
  SELECT event_type, d, value,
    first_value(value) OVER win AS open,
    last_value(value) OVER win AS close
  FROM e
  WINDOW win AS (PARTITION BY event_type, d ORDER BY ts ASC, event_id ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
SELECT event_type, strftime(d, '%Y-%m-%d') AS d,
  round(max(open), 4) AS open,
  round(max(value), 4) AS high,
  round(min(value), 4) AS low,
  round(max(close), 4) AS close,
  count(*) AS volume,
  round(sum(value), 2) AS total_value
FROM w GROUP BY 1, 2""",
    "ts_interpolate_gaps": """
WITH known AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
    round(avg(value), 6) AS v
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
rng AS (SELECT min(h) AS h0, max(h) AS h1 FROM known),
spine AS (
  SELECT et.event_type, s.h
  FROM (SELECT DISTINCT event_type FROM known) et
  CROSS JOIN (
    SELECT unnest(generate_series((SELECT h0 FROM rng),
                                  (SELECT h1 FROM rng))) AS h) s),
g AS (
  SELECT sp.event_type, sp.h, k.v FROM spine sp
  LEFT JOIN known k ON k.event_type = sp.event_type AND k.h = sp.h),
x AS (
  SELECT event_type, h, v,
    last_value(v IGNORE NULLS) OVER wb AS pv,
    last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
      OVER wb AS ph,
    first_value(v IGNORE NULLS) OVER wf AS nv,
    first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
      OVER wf AS nh
  FROM g
  WINDOW
    wb AS (PARTITION BY event_type ORDER BY h ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    wf AS (PARTITION BY event_type ORDER BY h ASC
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
SELECT event_type, h,
  floor((CASE WHEN v IS NOT NULL THEN v
    WHEN ph IS NOT NULL AND nh IS NOT NULL
      THEN pv + (nv - pv) * (h - ph) / (nh - ph)
    ELSE coalesce(pv, nv) END) * 10000 + 0.5) / 10000 AS value,
  CASE WHEN v IS NOT NULL THEN 'obs'
    WHEN ph IS NOT NULL AND nh IS NOT NULL THEN 'interp'
    ELSE 'edge' END AS src
FROM x""",
    "ts_dow_seasonality": """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
    CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2),
det AS (
  SELECT event_type, d, n,
    n - avg(n) OVER (PARTITION BY event_type ORDER BY d ASC
      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS dev
  FROM daily)
SELECT event_type, dayofweek(d) + 1 AS dow,
  round(avg(dev), 4) AS seasonal, count(*) AS n_days
FROM det GROUP BY 1, 2""",
    "ts_anomaly_mad": """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
    CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2),
med AS (SELECT event_type, median(n) AS med FROM daily GROUP BY 1),
dev AS (
  SELECT daily.*, med.med, abs(n - med.med) AS absdev
  FROM daily JOIN med USING (event_type)),
mad AS (SELECT event_type, median(absdev) AS mad FROM dev GROUP BY 1)
SELECT dev.event_type, strftime(d, '%Y-%m-%d') AS d, n,
  round(dev.med, 4) AS med, round(mad.mad, 4) AS mad,
  absdev > 3.0 * 1.4826 * mad.mad AS is_anomaly
FROM dev JOIN mad ON dev.event_type = mad.event_type""",
    "ts_time_to_convert": """
WITH v AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY 1),
p AS (
  SELECT v.user_id, t_view, min(e.ts) AS t_buy
  FROM v JOIN events e ON e.user_id = v.user_id
    AND e.event_type = 'purchase' AND e.ts > v.t_view
  GROUP BY 1, 2)
SELECT CAST(floor((epoch_us(t_buy) - epoch_us(t_view)) / 86400000000.0)
    AS INT) AS days_to_convert,
  count(*) AS n_users
FROM p GROUP BY 1""",
    "ts_holt_trend": """
WITH RECURSIVE e AS (
  SELECT user_id, ts, event_id, value FROM events WHERE value IS NOT NULL),
g AS (
  SELECT user_id,
    list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vs,
    count(*) AS n
  FROM e GROUP BY user_id),
-- row-to-row recursion (NOT list_reduce: DuckDB 1.0 aliases struct
-- accumulator fields in-place, so a coupled two-field fold reads
-- partially-updated state)
seq AS (
  SELECT user_id, vs, n, 1 AS i, vs[1] AS l, CAST(0.0 AS DOUBLE) AS b
  FROM g
  UNION ALL
  SELECT user_id, vs, n, i + 1,
    vs[i + 1] * 0.25 + 0.75 * (l + b),
    ((vs[i + 1] * 0.25 + 0.75 * (l + b)) - l) * 0.125 + 0.875 * b
  FROM seq WHERE i < len(vs))
SELECT user_id, CAST(n AS BIGINT) AS n_events,
  round(vs[len(vs)], 4) AS last_value,
  round(l, 4) AS level,
  round(b, 4) AS trend,
  round(l + b, 4) AS forecast_next
FROM seq WHERE i = len(vs)""",
    "ts_ewma": """
WITH e AS (
  SELECT user_id, ts, event_id, value FROM events WHERE value IS NOT NULL),
g AS (
  SELECT user_id,
    list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vs,
    count(*) AS n
  FROM e GROUP BY user_id)
SELECT user_id,
  CAST(n AS BIGINT) AS n_events,
  round(vs[len(vs)], 4) AS last_value,
  round(list_reduce(vs, (acc, x) -> acc * 0.8 + x * 0.2), 4) AS ewma,
  round(vs[len(vs)] - list_reduce(vs, (acc, x) -> acc * 0.8 + x * 0.2), 4)
    AS last_dev
FROM g""",
    "ts_rolling_zscore": f"""
WITH {_DAILY_SQL},
scored AS (
  SELECT event_type, d, value,
    count(*) OVER (PARTITION BY event_type) AS n,
    avg(value) OVER w AS expected_value,
    stddev_samp(value) OVER w AS sd
  FROM filled
  WINDOW w AS (PARTITION BY event_type ORDER BY d ASC
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
SELECT event_type, strftime(d, '%Y-%m-%d') AS timestamp, value,
  COALESCE(abs(CASE WHEN sd > 0 THEN (value - expected_value) / sd END) > 3.0,
           FALSE) AS is_anomaly,
  round(CASE WHEN sd > 0 THEN (value - expected_value) / sd END, 4) AS score,
  round(expected_value, 4) AS expected_value
FROM scored WHERE n >= 12""",
    "ts_asof_sessionize": """
WITH clicks AS (
  SELECT user_id, ts, max(value) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
x AS (
  SELECT user_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC))
SELECT 'asof' AS probe, p.user_id, p.event_id AS k, c.click_value AS v
FROM p ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND c.ts <= p.ts
UNION ALL
SELECT 'sess', user_id, CAST(sum(new_sess) AS BIGINT),
  CAST(count(*) AS DOUBLE)
FROM x GROUP BY user_id""",
}


def q_cross_corr(spark, sf_dir):
    """Pearson correlation matrix between event-type daily series —
    the co-movement screen behind metric clustering and root-cause
    dashboards.  The correlation is computed FROM EXACT INTEGER SUMS
    (n, Σx, Σy, Σxy, Σx², Σy² as int64 over integer daily counts) and
    only then combined in double arithmetic: bit-identical inputs in
    both engines, so the matrix binds without tolerance — corr() as
    an aggregate would accumulate doubles in engine-specific order.
    Shape: daily aggregate, one self-join on day (spine-sized), one
    pair aggregate."""
    ev = _t(spark, sf_dir, "events")
    # pinned: the pair join references daily twice; unpinned, the
    # events scan+aggregate would be planned (and run) twice
    daily = ev.groupBy(
        F.col("event_type").alias("et"),
        F.date_trunc("day", "ts").cast("date").alias("d"),
    ).agg(F.count("*").alias("n")).localCheckpoint(eager=True)
    j = (
        daily.alias("x")
        .join(daily.alias("y"), "d")
        .filter(F.col("x.et") < F.col("y.et"))
        .select(
            F.col("x.et").alias("a"),
            F.col("y.et").alias("b"),
            F.col("x.n").alias("xv"),
            F.col("y.n").alias("yv"),
        )
    )
    s = j.groupBy("a", "b").agg(
        F.count("*").alias("n"),
        F.sum("xv").alias("sx"),
        F.sum("yv").alias("sy"),
        F.sum(F.col("xv") * F.col("yv")).alias("sxy"),
        F.sum(F.col("xv") * F.col("xv")).alias("sx2"),
        F.sum(F.col("yv") * F.col("yv")).alias("sy2"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = F.sqrt(
        (F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
    ) * F.sqrt(
        (F.col("n") * F.col("sy2") - F.col("sy") * F.col("sy")).cast(
            "double"
        )
    )
    corr = F.when(den > 0, num / den)
    return s.select(
        "a",
        "b",
        "n",
        (F.floor(corr * 10000 + F.lit(0.5)) / 10000).alias("corr"),
    )


QUERIES["ts_cross_corr"] = q_cross_corr

ORACLE["ts_cross_corr"] = """
WITH daily AS (
  SELECT event_type AS et, CAST(date_trunc('day', ts) AS DATE) AS d,
    count(*) AS n
  FROM events GROUP BY 1, 2),
j AS (
  SELECT x.et AS a, y.et AS b, x.n AS xv, y.n AS yv
  FROM daily x JOIN daily y USING (d) WHERE x.et < y.et),
s AS (
  SELECT a, b, count(*) AS n,
    CAST(sum(xv) AS BIGINT) AS sx, CAST(sum(yv) AS BIGINT) AS sy,
    CAST(sum(xv * yv) AS BIGINT) AS sxy,
    CAST(sum(xv * xv) AS BIGINT) AS sx2,
    CAST(sum(yv * yv) AS BIGINT) AS sy2
  FROM j GROUP BY 1, 2)
SELECT a, b, n,
  floor(CASE WHEN sqrt(CAST(n * sx2 - sx * sx AS DOUBLE))
           * sqrt(CAST(n * sy2 - sy * sy AS DOUBLE)) > 0
    THEN CAST(n * sxy - sx * sy AS DOUBLE)
      / (sqrt(CAST(n * sx2 - sx * sx AS DOUBLE))
         * sqrt(CAST(n * sy2 - sy * sy AS DOUBLE)))
    END * 10000 + 0.5) / 10000 AS corr
FROM s"""


def q_cusum_changepoint(spark, sf_dir):
    """Two-sided CUSUM change-point detection over per-type daily
    counts — the sequential drift detector whose max(0,...) reset
    makes it inherently recursive (no window-aggregate form exists):
    the sanctioned applyInPandas custom-stateful-operator shape, over
    a spine-sized series.  The oracle replays the full recursion with
    a RECURSIVE CTE (same floor-pinned standardization inputs)."""
    from cdc_pipe_line_spark.timeseries import cusum_changepoints

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.count("*").cast("double").alias("value"))
    return cusum_changepoints(
        daily,
        group_cols=["event_type"],
        value_col="value",
        ts_col="day",
    )


QUERIES["ts_cusum_changepoint"] = q_cusum_changepoint

ORACLE["ts_cusum_changepoint"] = """
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
    CAST(count(*) AS DOUBLE) AS value
  FROM events GROUP BY 1, 2),
stats AS (
  SELECT event_type,
    floor(avg(value) * 1e6 + 0.5) / 1e6 AS mu,
    floor(coalesce(stddev_samp(value), 0.0) * 1e6 + 0.5) / 1e6 AS sd
  FROM daily GROUP BY 1),
g AS (
  SELECT d.event_type,
    list(CAST(d.value AS DOUBLE) ORDER BY d.day) AS vs,
    list(strftime(d.day, '%Y-%m-%d') ORDER BY d.day) AS ds,
    any_value(s.mu) AS mu, any_value(s.sd) AS sd
  FROM daily d JOIN stats s USING (event_type)
  GROUP BY 1),
seq AS (
  SELECT event_type, vs, ds, mu, sd, 0 AS i,
    CAST(0.0 AS DOUBLE) AS s_hi, CAST(0.0 AS DOUBLE) AS s_lo,
    CAST(0 AS BIGINT) AS n_alarms, CAST(0.0 AS DOUBLE) AS z,
    FALSE AS alarm
  FROM g
  UNION ALL
  SELECT event_type, vs, ds, mu, sd, i + 1,
    CASE WHEN a THEN 0.0 ELSE nh END,
    CASE WHEN a THEN 0.0 ELSE nl END,
    n_alarms + CASE WHEN a THEN 1 ELSE 0 END,
    zz, a
  FROM (
    SELECT *,
      greatest(0.0, s_hi + zz - 0.5) AS nh,
      greatest(0.0, s_lo - zz - 0.5) AS nl,
      greatest(0.0, s_hi + zz - 0.5) > 4.0
        OR greatest(0.0, s_lo - zz - 0.5) > 4.0 AS a
    FROM (
      SELECT *,
        CASE WHEN sd > 0 THEN (vs[i + 1] - mu) / sd
          ELSE 0.0 END AS zz
      FROM seq WHERE i < len(vs)))
)
SELECT event_type, ds[i] AS d,
  floor(z * 1e4 + 0.5) / 1e4 AS z,
  floor(CASE WHEN alarm THEN 0.0 ELSE s_hi END * 1e4 + 0.5) / 1e4
    AS s_hi,
  floor(CASE WHEN alarm THEN 0.0 ELSE s_lo END * 1e4 + 0.5) / 1e4
    AS s_lo,
  alarm, n_alarms AS n_alarms_so_far
FROM seq WHERE i >= 1"""


def q_holt_backtest(spark, sf_dir):
    """Forecast backtesting: Holt level+trend (alpha .25, beta .125)
    run one-step-ahead over each event type's daily count series,
    scoring MAE and MAPE against the actuals — the evaluation loop
    that decides whether a forecaster ships.  Same sanctioned
    applyInPandas shape as the CUSUM detector (the coupled recursion
    has no window form; the series is spine-sized); the oracle
    replays the recursion with a RECURSIVE CTE and aggregates the
    same errors.  Inputs are integer counts, so both engines fold
    identical doubles."""
    import math as _math

    import pandas as pd

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.count("*").cast("double").alias("v"))

    schema = StructType(
        [
            StructField("event_type", StringType(), True),
            StructField("n_days", LongType(), True),
            StructField("mae", DoubleType(), True),
            StructField("mape_pct", DoubleType(), True),
            StructField("forecast_next", DoubleType(), True),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        vs = pdf["v"].tolist()
        lvl, tr = vs[0], 0.0
        abs_err = pct_err = 0.0
        n_scored = 0
        for v in vs[1:]:
            f = lvl + tr
            abs_err += abs(v - f)
            if v != 0:
                pct_err += abs(v - f) / v
            n_scored += 1
            new_l = v * 0.25 + 0.75 * (lvl + tr)
            tr = (new_l - lvl) * 0.125 + 0.875 * tr
            lvl = new_l
        fl = lambda x: _math.floor(x * 1e4 + 0.5) / 1e4
        return pd.DataFrame(
            [
                {
                    "event_type": pdf["event_type"].iloc[0],
                    "n_days": len(vs),
                    "mae": fl(abs_err / n_scored) if n_scored else None,
                    "mape_pct": fl(pct_err / n_scored * 100.0)
                    if n_scored
                    else None,
                    "forecast_next": fl(lvl + tr),
                }
            ]
        )

    return daily.groupBy("event_type").applyInPandas(run, schema)


QUERIES["ts_holt_backtest"] = q_holt_backtest

ORACLE["ts_holt_backtest"] = """
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
    CAST(count(*) AS DOUBLE) AS v
  FROM events GROUP BY 1, 2),
g AS (
  SELECT event_type, list(v ORDER BY day) AS vs, count(*) AS n
  FROM daily GROUP BY 1),
seq AS (
  SELECT event_type, vs, n, 1 AS i, vs[1] AS l,
    CAST(0.0 AS DOUBLE) AS b,
    CAST(0.0 AS DOUBLE) AS abs_err, CAST(0.0 AS DOUBLE) AS pct_err
  FROM g
  UNION ALL
  SELECT event_type, vs, n, i + 1,
    vs[i + 1] * 0.25 + 0.75 * (l + b),
    ((vs[i + 1] * 0.25 + 0.75 * (l + b)) - l) * 0.125 + 0.875 * b,
    abs_err + abs(vs[i + 1] - (l + b)),
    pct_err + CASE WHEN vs[i + 1] != 0
      THEN abs(vs[i + 1] - (l + b)) / vs[i + 1] ELSE 0.0 END
  FROM seq WHERE i < len(vs))
SELECT event_type, CAST(n AS BIGINT) AS n_days,
  floor(abs_err / (n - 1) * 1e4 + 0.5) / 1e4 AS mae,
  floor(pct_err / (n - 1) * 100.0 * 1e4 + 0.5) / 1e4 AS mape_pct,
  floor((l + b) * 1e4 + 0.5) / 1e4 AS forecast_next
FROM seq WHERE i = len(vs)"""


def q_autocorrelation(spark, sf_dir):
    """Autocorrelation function (ACF) at lags 1..7 over per-type
    daily counts — the diagnostic that picks seasonal periods and
    validates model residuals.  Pearson-at-lag computed FROM EXACT
    INTEGER SUMS (like ts_cross_corr): the lag pairing is one window
    lag per type, the per-(type, lag) sums are int64, and only the
    final correlation combines them in float — binds bit-for-bit.
    One daily aggregate + one 7-lag explode of the spine-sized
    series."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.date_trunc("day", "ts").cast("date").alias("d"),
        )
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("event_type").orderBy("d")
    # window expressions can't live inside the explode projection —
    # materialize the 7 lag columns in one window pass, THEN explode
    with_lags = daily.select(
        "event_type",
        "n",
        *[F.lag("n", k).over(w).alias(f"__l{k}") for k in range(1, 8)],
    )
    lagged = with_lags.select(
        "event_type",
        F.col("n").alias("x"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("lag"),
                        F.col(f"__l{k}").alias("prev"),
                    )
                    for k in range(1, 8)
                ]
            )
        ).alias("lp"),
    ).select(
        "event_type",
        F.col("lp.lag").alias("lag"),
        "x",
        F.col("lp.prev").alias("y"),
    ).filter(F.col("y").isNotNull())
    s = lagged.groupBy("event_type", "lag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sx2"),
        F.sum(F.col("y") * F.col("y")).alias("sy2"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = F.sqrt(
        (F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
    ) * F.sqrt(
        (F.col("n") * F.col("sy2") - F.col("sy") * F.col("sy")).cast(
            "double"
        )
    )
    acf = F.when(den > 0, num / den)
    return s.select(
        "event_type",
        "lag",
        "n",
        (F.floor(acf * 10000 + F.lit(0.5)) / 10000).alias("acf"),
    )


QUERIES["ts_autocorrelation"] = q_autocorrelation

ORACLE["ts_autocorrelation"] = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
    count(*) AS n
  FROM events GROUP BY 1, 2),
lagged AS (
  SELECT event_type, lag, x, y FROM (
    SELECT event_type, lg.lag, n AS x,
      CASE lg.lag
        WHEN 1 THEN lag(n, 1) OVER w WHEN 2 THEN lag(n, 2) OVER w
        WHEN 3 THEN lag(n, 3) OVER w WHEN 4 THEN lag(n, 4) OVER w
        WHEN 5 THEN lag(n, 5) OVER w WHEN 6 THEN lag(n, 6) OVER w
        WHEN 7 THEN lag(n, 7) OVER w END AS y
    FROM daily
    CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) lg
    WINDOW w AS (PARTITION BY event_type, lg.lag ORDER BY d ASC))
  WHERE y IS NOT NULL),
s AS (
  SELECT event_type, CAST(lag AS INT) AS lag, count(*) AS n,
    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
    CAST(sum(x * y) AS BIGINT) AS sxy,
    CAST(sum(x * x) AS BIGINT) AS sx2,
    CAST(sum(y * y) AS BIGINT) AS sy2
  FROM lagged GROUP BY 1, 2)
SELECT event_type, lag, n,
  floor(CASE WHEN sqrt(CAST(n * sx2 - sx * sx AS DOUBLE))
           * sqrt(CAST(n * sy2 - sy * sy AS DOUBLE)) > 0
    THEN CAST(n * sxy - sx * sy AS DOUBLE)
      / (sqrt(CAST(n * sx2 - sx * sx AS DOUBLE))
         * sqrt(CAST(n * sy2 - sy * sy AS DOUBLE)))
    END * 10000 + 0.5) / 10000 AS acf
FROM s"""


def q_rolling_median(spark, sf_dir):
    """Rolling 7-day MEDIAN smoothing per event type — the robust
    twin of the moving average (one outlier day doesn't drag the
    smooth).  Exact: the trailing window materializes as a bounded
    collect_list (<= 7 values) sorted in-expression, median by
    element arithmetic — the bounded-frame trick that keeps an exact
    order statistic inside codegen instead of a per-group sort or
    UDF.  DuckDB replays with windowed quantile_cont."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("d"),
    ).agg(F.count("*").cast("double").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-6, 0)
    )
    arr = F.array_sort(F.collect_list("n").over(w))
    sz = F.size(arr)
    mid = (sz / 2).cast("int")
    med = F.when(
        sz % 2 == 1, F.element_at(arr, mid + 1)
    ).otherwise(
        (F.element_at(arr, mid) + F.element_at(arr, mid + 1)) / 2.0
    )
    return daily.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        "n",
        F.round(med, 4).alias("rolling_median_7"),
        sz.alias("window_n"),
    )


QUERIES["ts_rolling_median"] = q_rolling_median

ORACLE["ts_rolling_median"] = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
    CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2)
SELECT event_type, strftime(d, '%Y-%m-%d') AS d, n,
  round(quantile_cont(n, 0.5) OVER w, 4) AS rolling_median_7,
  CAST(count(*) OVER w AS INT) AS window_n
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY d ASC
  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)"""


def q_peak_concurrency(spark, sf_dir):
    """Peak concurrent sessions per day — the capacity-planning
    number (license seats, connection pools, GPU slots).  Classic
    sweep-line: 30-min-gap sessions become +1/-1 boundary events, a
    running sum over (ts, +1-before--1) gives instantaneous
    concurrency, one max per day.  Ties resolve starts before ends
    at the same instant (touching sessions count as overlapping),
    pinned deterministically in both engines.

    Scale shape (round 6, VERDICT item 3): the sweep is a
    DISTRIBUTED prefix sum, not one global-window task.  Day(t) is
    monotone in t, so the global running sum factors into (a) a
    per-DAY partitioned running sum — each day's boundary events
    sort and sweep in their own task — plus (b) an exclusive
    carry-in of prior days' delta totals, computed on the tiny
    one-row-per-day aggregate via a broadcast ``b.d < a.d``
    self-join (the ``pack_sequences`` keyed-exclusive-sum pattern,
    text.py:781, with the cross-day carry on a days-sized table —
    thousands of rows even at 100 TB).  Zero unpartitioned Window
    nodes (plan-asserted); ``bounds`` is localCheckpoint-pinned so
    the session-build subtree runs once, not once per consumer."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    prev = F.lag("ts").over(w)
    sess = (
        ev.withColumn(
            "__new",
            F.when(
                prev.isNull()
                | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTES")),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "__sess",
            F.sum("__new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "__sess")
        .agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    )
    bounds = (
        sess.select(
            F.col("t0").alias("t"), F.lit(0).alias("kind"),
            F.lit(1).alias("delta"),
        )
        .unionByName(
            sess.select(
                F.col("t1").alias("t"), F.lit(1).alias("kind"),
                F.lit(-1).alias("delta"),
            )
        )
        .withColumn("d", F.date_trunc("day", "t"))
        # Two consumers (per-day sweep, day-total carry): pin so the
        # two-window session build runs once, not twice.
        .localCheckpoint(eager=True)
    )
    wday = Window.partitionBy("d").orderBy(
        F.col("t").asc(), F.col("kind").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = bounds.withColumn("local_c", F.sum("delta").over(wday))
    day_tot = bounds.groupBy("d").agg(F.sum("delta").alias("tot"))
    carry = (
        day_tot.alias("a")
        .join(
            F.broadcast(day_tot.select(
                F.col("d").alias("bd"), F.col("tot").alias("btot")
            )),
            F.col("bd") < F.col("a.d"),
            "left",
        )
        .groupBy("a.d")
        .agg(F.coalesce(F.sum("btot"), F.lit(0)).alias("carry_in"))
    )
    conc = local.join(F.broadcast(carry), "d").withColumn(
        "c", F.col("carry_in") + F.col("local_c")
    )
    return (
        conc.groupBy(F.date_format("d", "yyyy-MM-dd").alias("d"))
        .agg(
            F.max("c").alias("peak_concurrency"),
            F.sum(F.when(F.col("kind") == 0, 1).otherwise(0)).alias(
                "n_sessions_started"
            ),
        )
    )


QUERIES["ts_peak_concurrency"] = q_peak_concurrency

ORACLE["ts_peak_concurrency"] = """
WITH x AS (
  SELECT user_id, ts, event_id,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
s AS (
  SELECT *, sum(new_sess) OVER (
    PARTITION BY user_id ORDER BY ts ASC, event_id ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM x),
per AS (
  SELECT user_id, sess, min(ts) AS t0, max(ts) AS t1
  FROM s GROUP BY 1, 2),
b AS (
  SELECT t0 AS t, 0 AS kind, 1 AS delta FROM per
  UNION ALL
  SELECT t1, 1, -1 FROM per),
c AS (
  SELECT t, kind, CAST(sum(delta) OVER (ORDER BY t ASC, kind ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS c
  FROM b)
SELECT strftime(CAST(date_trunc('day', t) AS DATE), '%Y-%m-%d') AS d,
  max(c) AS peak_concurrency,
  CAST(sum(CASE WHEN kind = 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_sessions_started
FROM c GROUP BY 1"""


def q_mann_kendall(spark, sf_dir):
    """Mann-Kendall trend test per event type — the nonparametric
    "is this metric actually trending" check (no distribution
    assumption, robust to outliers) that belongs next to CUSUM in
    the monitoring pack.  S = sum over day pairs of
    sign(count_later - count_earlier); positive S = upward trend.

    Shape: the pair enumeration is a per-key self-join of the DAILY
    aggregate — day-count-squared per key, and day count is bounded
    (a year of days is 365 rows per key even at 100 TB; the fact
    table never self-joins).  Everything folds as integers: S, the
    concordant/discordant counts, and n — zero float boundaries."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.date_trunc("day", "ts").alias("d"),
        )
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)
    )
    a = daily.select(
        "event_type", F.col("d").alias("d1"), F.col("n").alias("n1")
    )
    b = daily.select(
        F.col("event_type").alias("et2"),
        F.col("d").alias("d2"),
        F.col("n").alias("n2"),
    )
    pairs = a.join(
        b,
        (F.col("event_type") == F.col("et2")) & (F.col("d1") < F.col("d2")),
    )
    sgn = F.when(F.col("n2") > F.col("n1"), 1).when(
        F.col("n2") < F.col("n1"), -1
    ).otherwise(0)
    stats = pairs.groupBy("event_type").agg(
        F.sum(sgn).alias("s_stat"),
        F.sum(F.when(sgn == 1, 1).otherwise(0)).alias("concordant"),
        F.sum(F.when(sgn == -1, 1).otherwise(0)).alias("discordant"),
        F.count("*").alias("n_pairs"),
    )
    days = daily.groupBy("event_type").agg(F.count("*").alias("n_days"))
    return stats.join(F.broadcast(days), "event_type").select(
        "event_type",
        "n_days",
        "n_pairs",
        "s_stat",
        "concordant",
        "discordant",
        F.when(F.col("s_stat") > 0, F.lit("up"))
        .when(F.col("s_stat") < 0, F.lit("down"))
        .otherwise(F.lit("flat"))
        .alias("trend"),
    )


QUERIES["ts_mann_kendall"] = q_mann_kendall

ORACLE["ts_mann_kendall"] = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS d, count(*) AS n
  FROM events GROUP BY 1, 2),
pairs AS (
  SELECT a.event_type,
    CASE WHEN b.n > a.n THEN 1 WHEN b.n < a.n THEN -1 ELSE 0 END
      AS sgn
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.d < b.d),
stats AS (
  SELECT event_type,
    CAST(sum(sgn) AS BIGINT) AS s_stat,
    CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS concordant,
    CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)
      AS discordant,
    count(*) AS n_pairs
  FROM pairs GROUP BY 1),
days AS (
  SELECT event_type, count(*) AS n_days FROM daily GROUP BY 1)
SELECT stats.event_type, n_days, n_pairs, s_stat, concordant,
  discordant,
  CASE WHEN s_stat > 0 THEN 'up' WHEN s_stat < 0 THEN 'down'
       ELSE 'flat' END AS trend
FROM stats JOIN days ON days.event_type = stats.event_type"""


def q_theil_sen(spark, sf_dir):
    """Theil-Sen robust slope per event type — the estimator that
    pairs with the Mann-Kendall test (same pair enumeration, now
    yielding a magnitude): median over all day pairs of
    (value_j - value_i) / (day_j - day_i).  Outlier-robust where OLS
    is not; the standard monitoring answer to "HOW fast is it
    trending".

    Shape: identical to ``ts_mann_kendall`` — the self-join runs on
    the DAILY aggregate (bounded by the calendar, not the fact
    table), daily values fold as integer cents so every slope is an
    exact double (int/int division), and the published median gets
    the floor-1e6 idiom because the two engines' 0.5-quantile
    interpolation can differ in the last ulp."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.date_trunc("day", "ts").alias("d"),
        )
        .agg(
            F.sum(
                F.round(F.col("value") * 100).cast("bigint")
            ).alias("cents")
        )
        .localCheckpoint(eager=True)
    )
    a = daily.select(
        "event_type", F.col("d").alias("d1"), F.col("cents").alias("c1")
    )
    b = daily.select(
        F.col("event_type").alias("et2"),
        F.col("d").alias("d2"),
        F.col("cents").alias("c2"),
    )
    slope = (F.col("c2") - F.col("c1")) / F.datediff(
        F.col("d2"), F.col("d1")
    ).cast("double")
    pairs = a.join(
        b,
        (F.col("event_type") == F.col("et2")) & (F.col("d1") < F.col("d2")),
    ).select("event_type", slope.alias("slope"))
    med = F.expr("percentile(slope, 0.5)")
    return (
        pairs.groupBy("event_type")
        .agg(
            F.count("*").alias("n_pairs"),
            F.floor(med * F.lit(1e6) + F.lit(0.5)).cast("bigint").alias(
                "slope_micro_cents"
            ),
            F.sum(
                F.when(F.col("slope") > 0, 1).otherwise(0)
            ).cast("bigint").alias("n_up_pairs"),
        )
    )


QUERIES["ts_theil_sen"] = q_theil_sen

ORACLE["ts_theil_sen"] = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS d,
    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
      AS cents
  FROM events GROUP BY 1, 2),
pairs AS (
  SELECT a.event_type,
    (b.cents - a.cents)
      / CAST(date_diff('day', a.d, b.d) AS DOUBLE) AS slope
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.d < b.d)
SELECT event_type, count(*) AS n_pairs,
  CAST(floor(quantile_cont(slope, CAST(0.5 AS DOUBLE)) * 1e6
    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS slope_micro_cents,
  CAST(sum(CASE WHEN slope > 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_up_pairs
FROM pairs GROUP BY 1"""


def q_stl_decompose(spark, sf_dir):
    """Full classical additive decomposition (the moving-average STL
    ancestor: Persons 1919 / Macaulay 1931 ratio-to-moving-average,
    additive form): per (event_type, day) the series splits into
    ``n = trend + seasonal + remainder`` — `ts_dow_seasonality`
    publishes only the seasonal INDEX; this publishes the complete
    per-day decomposition, with the reconstruction identity bound
    into the hash (remainder is derived, so a wrong trend or seasonal
    cannot cancel out).

    Cross-engine discipline: counts are integer-valued doubles (exact
    in IEEE), the 7-day centered trend is restricted to FULL windows
    (edge days carry no decomposition), deviations are pinned to 4 dp
    integer scale BEFORE the seasonal aggregate so the cross-day sum
    is an exact bigint sum (aggregate double summation is
    order-sensitive across engines), and every published double goes
    through the floor-pin idiom.

    Scale shape: one shrinking daily aggregate, one bounded window
    over the day spine per type, one broadcast-sized seasonal join
    (|types| x 7 rows).  Identical to `ts_dow_seasonality`'s cost.
    """
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("d"),
    ).agg(F.count("*").cast("double").alias("n"))
    w = Window.partitionBy("event_type").orderBy("d").rowsBetween(-3, 3)
    det = (
        daily.withColumn("trend", F.avg("n").over(w))
        .withColumn("n_frame", F.count("*").over(w))
        .filter(F.col("n_frame") == 7)
        .withColumn(
            "dev_s",
            F.floor((F.col("n") - F.col("trend")) * 1e4 + F.lit(0.5)).cast(
                "bigint"
            ),
        )
        # referenced twice (seasonal + final join): pin so the daily
        # aggregate subtree plans once, and the lineage split also
        # resolves the self-join ambiguity.  Day-spine-sized frame.
        .localCheckpoint(eager=True)
    )
    seasonal = det.groupBy(
        F.col("event_type").alias("et"), F.dayofweek("d").alias("dow")
    ).agg(
        (
            F.floor(
                F.sum("dev_s").cast("double") / F.count("*") + F.lit(0.5)
            )
            / F.lit(1e4)
        ).alias("seasonal"),
    )
    return (
        det.join(
            F.broadcast(seasonal),
            (F.col("event_type") == F.col("et"))
            & (F.dayofweek(F.col("d")) == F.col("dow")),
        )
        .select(
            "event_type",
            F.date_format(F.col("d"), "yyyy-MM-dd").alias("d"),
            "n",
            (F.floor(F.col("trend") * 1e4 + F.lit(0.5)) / F.lit(1e4)).alias(
                "trend"
            ),
            "seasonal",
            (
                F.floor(
                    (F.col("dev_s") / F.lit(1e4) - F.col("seasonal"))
                    * 1e4
                    + F.lit(0.5)
                )
                / F.lit(1e4)
            ).alias("remainder"),
        )
    )


QUERIES["ts_stl_decompose"] = q_stl_decompose

ORACLE["ts_stl_decompose"] = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
    CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2),
det AS (
  SELECT event_type, d, n,
    avg(n) OVER w AS trend,
    count(*) OVER w AS n_frame
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY d ASC
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
full_w AS (
  SELECT event_type, d, n, trend,
    CAST(floor((n - trend) * 1e4 + CAST(0.5 AS DOUBLE)) AS BIGINT)
      AS dev_s
  FROM det WHERE n_frame = 7),
seas AS (
  SELECT event_type, dayofweek(d) + 1 AS dow,
    floor(CAST(sum(dev_s) AS DOUBLE) / count(*)
          + CAST(0.5 AS DOUBLE)) / 1e4 AS seasonal
  FROM full_w GROUP BY 1, 2)
SELECT f.event_type, strftime(f.d, '%Y-%m-%d') AS d, f.n,
  floor(f.trend * 1e4 + CAST(0.5 AS DOUBLE)) / 1e4 AS trend,
  s.seasonal,
  floor((CAST(f.dev_s AS DOUBLE) / 1e4 - s.seasonal) * 1e4
        + CAST(0.5 AS DOUBLE)) / 1e4 AS remainder
FROM full_w f
JOIN seas s ON f.event_type = s.event_type
  AND dayofweek(f.d) + 1 = s.dow"""


def q_holt_winters(spark, sf_dir):
    """Holt-Winters ADDITIVE seasonal forecast (level + trend +
    weekly seasonal state) over the per-type daily event series —
    the seasonal tier that completes the classical smoothing family
    (ewma -> holt -> holt-winters) next to the decomposition view
    `ts_stl_decompose`: STL explains a series; HW extrapolates it,
    publishing a 7-day forecast curve per event type.

    Implementation is `timeseries.holt_winters_by_key` (position-
    ordered F.aggregate fold, (level, trend, seasonal-ring) struct
    accumulator, dyadic alpha/beta/gamma); the oracle replays the
    coupled 3-field recursion with a RECURSIVE CTE (never
    list_reduce — DuckDB aliases struct accumulator fields in-place).
    Every published double gets the floor-1e4 pin AFTER the shared
    forecast arithmetic, so the hash binds level, trend, all 7
    seasonal components, and the h-step forecasts bit-for-bit.

    Scale shape: the fact table collapses to the calendar-bounded
    daily spine FIRST (one partial-agg shuffle); the fold and the
    horizon explode run over |event_type| rows x 30-long arrays —
    the state expression re-evaluates per output column, which is
    free at spine size and why the raw table must never reach the
    fold directly."""
    from cdc_pipe_line_spark.timeseries import holt_winters_by_key

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("d"),
    ).agg(F.count("*").cast("double").alias("n"))
    hw = holt_winters_by_key(
        daily, key_col="event_type", order_col="d", value_col="n", period=7
    )

    def pin(c):
        return F.floor(c * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)

    st = hw.select(
        "event_type",
        "n_points",
        "level",
        "trend",
        F.posexplode("seasonal").alias("pos", "s"),
    )
    h = F.col("pos") + 1
    return st.select(
        "event_type",
        h.cast("int").alias("h"),
        "n_points",
        pin(F.col("level")).alias("level"),
        pin(F.col("trend")).alias("trend"),
        pin(F.col("s")).alias("seasonal"),
        pin(F.col("level") + h * F.col("trend") + F.col("s")).alias(
            "forecast"
        ),
    )


QUERIES["ts_holt_winters"] = q_holt_winters

ORACLE["ts_holt_winters"] = """
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
    CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2),
g AS (
  SELECT event_type, list(n ORDER BY d) AS vs, count(*) AS n_points
  FROM daily GROUP BY 1 HAVING count(*) >= 15),
init AS (
  SELECT event_type, vs, n_points,
    list_sum(vs[1:7]) / CAST(7 AS DOUBLE) AS l0
  FROM g),
init2 AS (
  SELECT event_type, vs, n_points, l0,
    (list_sum(vs[8:14]) / CAST(7 AS DOUBLE) - l0) / CAST(7 AS DOUBLE)
      AS b0,
    list_transform(vs[1:7], x -> x - l0) AS s0
  FROM init),
rec AS (
  SELECT event_type, vs, n_points, 7 AS i, l0 AS l, b0 AS b, s0 AS s
  FROM init2
  UNION ALL
  SELECT event_type, vs, n_points, i + 1,
    CAST(0.25 AS DOUBLE) * (vs[i + 1] - s[1])
      + CAST(0.75 AS DOUBLE) * (l + b),
    CAST(0.125 AS DOUBLE) * ((CAST(0.25 AS DOUBLE) * (vs[i + 1] - s[1])
        + CAST(0.75 AS DOUBLE) * (l + b)) - l)
      + CAST(0.875 AS DOUBLE) * b,
    s[2:7] || [CAST(0.25 AS DOUBLE) * (vs[i + 1]
        - (CAST(0.25 AS DOUBLE) * (vs[i + 1] - s[1])
           + CAST(0.75 AS DOUBLE) * (l + b)))
      + CAST(0.75 AS DOUBLE) * s[1]]
  FROM rec WHERE i < n_points),
fin AS (SELECT * FROM rec WHERE i = n_points),
hz AS (SELECT unnest(generate_series(1, 7)) AS h)
SELECT event_type, CAST(hz.h AS INT) AS h,
  CAST(n_points AS BIGINT) AS n_points,
  floor(l * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE)
    AS level,
  floor(b * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE)
    AS trend,
  floor(s[hz.h] * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE)
    AS seasonal,
  floor((l + hz.h * b + s[hz.h]) * 10000 + CAST(0.5 AS DOUBLE))
    / CAST(10000 AS DOUBLE) AS forecast
FROM fin CROSS JOIN hz"""


def q_session_window_tvf(spark, sf_dir):
    """Native ``session_window`` grouping in BATCH mode — the built-in
    session assembly (SPARK-36465) that `ts_asof_sessionize`'s manual
    lag + cumulative-sum pattern predates: one groupBy call yields one
    row per (user, session) with the engine-managed [start, last+gap)
    window, and at 100 TB it is the same single hash shuffle on the
    key with sessions merged inside the aggregate — no window-function
    sort pass over the raw stream.

    Boundary semantics pinned by probe (tests/test_reshape_timeseries
    ::test_session_window_exact_gap_merges): per-event windows are
    ``[ts, ts+gap)`` and Spark merges sessions whose windows overlap
    OR TOUCH, so an exactly-30-minute silence stays ONE session — the
    oracle's gaps-and-islands replay therefore breaks only on
    ``ts > lag + gap`` (strict).  Timestamps bind as unix_micros;
    values as exact per-event cents (summed as int64, immune to
    double sum order)."""
    ev = _t(spark, sf_dir, "events")
    sess = ev.groupBy(
        "user_id", F.session_window("ts", "30 minutes")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("value_cents"),
    )
    return sess.select(
        "user_id",
        F.unix_micros(F.col("session_window.start")).alias("start_us"),
        F.unix_micros(F.col("session_window.end")).alias("end_us"),
        "n_events",
        "value_cents",
    )


QUERIES["ts_session_window_tvf"] = q_session_window_tvf

ORACLE["ts_session_window_tvf"] = """
WITH x AS (
  SELECT user_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)),
s AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM x)
SELECT user_id, epoch_us(min(ts)) AS start_us,
  epoch_us(max(ts)) + 1800000000 AS end_us,
  count(*) AS n_events,
  CAST(sum(CAST(floor(value * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT))
    AS BIGINT) AS value_cents
FROM s GROUP BY user_id, sid"""


def q_anomaly_stl_residual(spark, sf_dir):
    """Anomaly scoring on the DESEASONALIZED remainder — the composed
    detector that fixes `ts_anomaly_mad`'s known blind spot: on a
    series with real weekly structure, raw-value MAD flags every
    strong weekday as anomalous and misses a genuinely odd Sunday.
    Here `ts_stl_decompose` first explains trend + weekly seasonality,
    and the MAD gate runs on what is LEFT, so a day is anomalous only
    relative to its own calendar position.

    Determinism: remainders arrive 4dp floor-pinned from the STL
    query, so per-type median/MAD — and the 3-sigma-equivalent
    ``|dev| > 3 * 1.4826 * MAD`` comparison — fold identical doubles
    in both engines (`ts_anomaly_mad` precedent); published med/mad
    get the floor-pin, the flag uses the raw values.

    Scale shape: the decomposition frame (day-spine-sized) is pinned
    once; everything after is two broadcast-sized median joins —
    the cost profile of the STL query itself."""
    dec = q_stl_decompose(spark, sf_dir).localCheckpoint(eager=True)
    med = dec.groupBy("event_type").agg(F.median("remainder").alias("med"))
    dev = dec.join(F.broadcast(med), "event_type").withColumn(
        "absdev", F.abs(F.col("remainder") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.median("absdev").alias("mad"))

    def pin(c):
        return F.floor(c * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)

    return dev.join(F.broadcast(mad), "event_type").select(
        "event_type",
        "d",
        "n",
        "remainder",
        pin(F.col("med")).alias("med"),
        pin(F.col("mad")).alias("mad"),
        (
            F.col("absdev")
            > F.lit(3.0) * F.lit(1.4826) * F.col("mad")
        ).alias("is_anomaly"),
    )


QUERIES["ts_anomaly_stl_residual"] = q_anomaly_stl_residual

#: the full STL oracle re-used as a CTE: slice everything before its
#: final SELECT, wrap that SELECT as `dec` — the two queries can
#: never drift apart silently (same discipline as the minhash
#: signature slice in dedup_lsh_recall's oracle)
_STL_SQL = ORACLE["ts_stl_decompose"]
_STL_CUT = _STL_SQL.index("SELECT f.event_type")
ORACLE["ts_anomaly_stl_residual"] = (
    _STL_SQL[:_STL_CUT]
    + ",\ndec AS (\n"
    + _STL_SQL[_STL_CUT:]
    + """),
med AS (SELECT event_type, median(remainder) AS med
        FROM dec GROUP BY 1),
dev AS (SELECT dec.*, med.med, abs(remainder - med.med) AS absdev
        FROM dec JOIN med USING (event_type)),
mad AS (SELECT event_type, median(absdev) AS mad FROM dev GROUP BY 1)
SELECT dev.event_type, d, n, remainder,
  floor(dev.med * 1e4 + CAST(0.5 AS DOUBLE)) / 1e4 AS med,
  floor(mad.mad * 1e4 + CAST(0.5 AS DOUBLE)) / 1e4 AS mad,
  absdev > CAST(3.0 AS DOUBLE) * CAST(1.4826 AS DOUBLE) * mad.mad
    AS is_anomaly
FROM dev JOIN mad ON dev.event_type = mad.event_type"""
)


def q_downsample_m4(spark, sf_dir):
    """M4 visualization downsampling (Jugel et al., VLDB 2014 —
    public): per series and per pixel-column time bucket, keep exactly
    the FOUR points a pixel-perfect line rendering needs — first,
    last, min, max — as one wide row per (event_type, bucket).
    Deliberately M4 and not LTTB: LTTB's selection is a sequential
    fold (each pick depends on the previous one — a one-task chain at
    scale), while M4 is ONE hash aggregate with map-side partials and
    is error-free for line rendering at the target width; at 100 TB
    the dashboard query runs at interactive latency regardless of
    input rows.

    Determinism: values in integer cents; min/max/first/last selected
    by ``min_by/max_by`` over ``struct(value-or-ts, us, event_id)``
    orderings with total tie-break, so every selected point is unique
    and engine-identical.  The bucket index is pure integer
    arithmetic from the span scalars (one bounded reduce, broadcast
    back as literals — the boundary-reduce pattern)."""
    T = 32
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    lo, hi = ev.agg(F.min("us"), F.max("us")).first()
    span = hi - lo + 1
    b = ev.withColumn(
        "bucket",
        F.expr(f"((us - {lo}L) * {T}) div {span}L"),
    )
    pt = lambda c1, c2, c3: F.struct(
        F.col(c1), F.col(c2), F.col(c3)
    )
    return (
        b.groupBy("event_type", "bucket")
        .agg(
            F.count("*").alias("n_points"),
            F.min_by(
                "cents", pt("us", "event_id", "cents")
            ).alias("v_first"),
            F.max_by(
                "cents", pt("us", "event_id", "cents")
            ).alias("v_last"),
            F.min_by(
                "us", pt("cents", "us", "event_id")
            ).alias("t_min"),
            F.min("cents").alias("v_min"),
            F.max_by(
                "us", F.struct(
                    F.col("cents"),
                    (-F.col("us")).alias("nus"),
                    (-F.col("event_id")).alias("nid"),
                )
            ).alias("t_max"),
            F.max("cents").alias("v_max"),
        )
        .select(
            "event_type",
            F.col("bucket").cast("bigint").alias("bucket"),
            "n_points",
            "v_first",
            "v_last",
            "t_min",
            "v_min",
            "t_max",
            "v_max",
        )
    )


QUERIES["ts_downsample_m4"] = q_downsample_m4

ORACLE["ts_downsample_m4"] = """
WITH ev AS (
  SELECT event_type, event_id, epoch_us(ts) AS us,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
span AS (SELECT min(us) AS lo, max(us) AS hi FROM ev),
b AS (
  SELECT event_type, event_id, us, cents,
    ((us - lo) * 32) // (hi - lo + 1) AS bucket
  FROM ev, span),
sel AS (
  SELECT *,
    row_number() OVER (PARTITION BY event_type, bucket
      ORDER BY us, event_id, cents) AS rf,
    row_number() OVER (PARTITION BY event_type, bucket
      ORDER BY us DESC, event_id DESC, cents DESC) AS rl,
    row_number() OVER (PARTITION BY event_type, bucket
      ORDER BY cents, us, event_id) AS rmin,
    row_number() OVER (PARTITION BY event_type, bucket
      ORDER BY cents DESC, us ASC, event_id ASC) AS rmax
  FROM b)
SELECT event_type, bucket,
  CAST(count(*) AS BIGINT) AS n_points,
  max(CASE WHEN rf = 1 THEN cents END) AS v_first,
  max(CASE WHEN rl = 1 THEN cents END) AS v_last,
  max(CASE WHEN rmin = 1 THEN us END) AS t_min,
  min(cents) AS v_min,
  max(CASE WHEN rmax = 1 THEN us END) AS t_max,
  max(cents) AS v_max
FROM sel GROUP BY 1, 2"""


def q_linear_trend(spark, sf_dir):
    """Per-type daily-volume OLS trend, entirely in EXACT integer
    sums (n, Σx, Σy, Σxy, Σx² over day index x and daily count y):
    ``slope_micro = (1e6 * (nΣxy - ΣxΣy)) div (nΣx² - (Σx)²)`` —
    tolerance-free cross-engine, the Pearson/ACF integer discipline
    applied to the regression everybody actually runs on volume
    dashboards (Theil-Sen and Mann-Kendall next door are its robust
    twins).  One shrinking daily aggregate, one per-type fold — the
    fact table is touched once."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count("*").alias("y")
    )
    wmin = daily.groupBy("event_type").agg(F.min("day").alias("d0"))
    xy = daily.join(wmin, "event_type").select(
        "event_type",
        F.datediff("day", "d0").cast("long").alias("x"),
        F.col("y").cast("long").alias("y"),
    )
    s = xy.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        F.col("sy").cast("bigint").alias("total_events"),
        F.expr(
            # n=1 (or an all-equal-x degenerate) zeroes the
            # denominator: Spark's non-ANSI div would yield NULL but
            # DuckDB's // errors — guard BOTH engines explicitly (the
            # ts_piecewise_trend discipline, ADVICE r8)
            "CASE WHEN n > 1 AND n * sxx - sx * sx != 0 THEN "
            "(1000000 * (n * sxy - sx * sy)) div (n * sxx - sx * sx) END"
        ).alias("slope_micro"),
        F.expr("(1000000 * sy) div n").alias("daily_mean_micro"),
    )


QUERIES["ts_linear_trend"] = q_linear_trend

ORACLE["ts_linear_trend"] = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
  FROM events GROUP BY 1, 2),
d0 AS (SELECT event_type, min(day) AS d0 FROM daily GROUP BY 1),
xy AS (
  SELECT d.event_type,
    CAST(date_diff('day', d0.d0, d.day) AS BIGINT) AS x,
    CAST(y AS BIGINT) AS y
  FROM daily d JOIN d0 USING (event_type)),
s AS (
  SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
    sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM xy GROUP BY 1)
SELECT event_type,
  CAST(n AS BIGINT) AS n_days,
  CAST(sy AS BIGINT) AS total_events,
  CAST(CASE WHEN n > 1 AND n * sxx - sx * sx != 0 THEN
    (1000000 * (n * sxy - sx * sy)) // (n * sxx - sx * sx) END AS BIGINT)
    AS slope_micro,
  CAST((1000000 * sy) // n AS BIGINT) AS daily_mean_micro
FROM s"""


def q_period_matched_filter(spark, sf_dir):
    """Dominant PERIOD of each event type's daily series by the
    square-wave matched-filter bank — the ``mm_audio_period_scan``
    technique applied to time series: for candidate periods {4,5,6,7}
    days the integer correlation ``corr(P) = sum_d (y_d - mean) *
    s_P(d)`` against the ±1 reference (mean cleared by
    cross-multiplication: ``n*y_d - total`` keeps everything int64),
    argmax |corr| with smallest-period tie-break.  Detects weekly-ish
    cadence without an FFT's libm surface — every value is exact
    integer arithmetic over the observed-day index, so the oracle
    replays the whole bank.

    Scale shape: one daily aggregate off the fact table, then a
    4-candidate explode over the per-type day series (calendar-
    bounded) and one hash-agg — vocabulary-sized end to end."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count("*").alias("y")
    )
    d0 = daily.groupBy("event_type").agg(
        F.min("day").alias("d0"),
        F.count("*").alias("n"),
        F.sum("y").alias("total"),
    )
    xy = daily.join(F.broadcast(d0), "event_type").select(
        "event_type",
        "n",
        F.datediff("day", "d0").cast("long").alias("x"),
        # mean-cleared residual, cross-multiplied to stay integer
        (F.col("y") * F.col("n") - F.col("total")).alias("r"),
    )
    cand = (
        xy.select(
            "event_type",
            "n",
            F.explode(F.array(*[F.lit(p) for p in (4, 5, 6, 7)])).alias(
                "p"
            ),
            F.col("x"),
            F.col("r"),
        )
        .withColumn(
            "s",
            F.when(
                F.col("x") % F.col("p") < F.expr("p div 2"), F.lit(1)
            ).otherwise(F.lit(-1)),
        )
        .groupBy("event_type", "n", "p")
        .agg(F.sum(F.col("r") * F.col("s")).alias("corr"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("corr")).desc(), F.col("p").asc()
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n_days"),
            F.col("p").cast("bigint").alias("best_period"),
            F.col("corr").cast("bigint").alias("corr_scaled"),
        )
    )


QUERIES["ts_period_matched_filter"] = q_period_matched_filter

ORACLE["ts_period_matched_filter"] = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
  FROM events GROUP BY 1, 2),
d0 AS (
  SELECT event_type, min(day) AS d0, count(*) AS n, sum(y) AS total
  FROM daily GROUP BY 1),
xy AS (
  SELECT d.event_type, n,
    CAST(date_diff('day', d0.d0, d.day) AS BIGINT) AS x,
    y * n - total AS r
  FROM daily d JOIN d0 USING (event_type)),
cand AS (
  SELECT event_type, n, c.p,
    CAST(sum(r * (CASE WHEN x % c.p < c.p // 2 THEN 1 ELSE -1 END))
      AS BIGINT) AS corr
  FROM xy, (SELECT unnest([4, 5, 6, 7]) AS p) c
  GROUP BY 1, 2, 3),
best AS (
  SELECT event_type, n, p, corr, row_number() OVER (
      PARTITION BY event_type ORDER BY abs(corr) DESC, p ASC) AS rn
  FROM cand)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
  CAST(p AS BIGINT) AS best_period, corr AS corr_scaled
FROM best WHERE rn = 1"""


def q_piecewise_trend(spark, sf_dir):
    """Segmented (piecewise-linear) trend per event type: depth-2
    binary segmentation — split at the argmax of the EXACT integer
    CUSUM deviation ``|n*cum_t - t*total|`` (the fractional mean
    cleared by cross-multiplication), once globally and once inside
    each half — then an integer-exact OLS slope per segment (the
    ts_linear_trend discipline).  Up to four segments per type; the
    whole decision path (both argmax splits, tie-breaks, degenerate
    one-day halves) is integer arithmetic, so the oracle replays it
    without tolerances.

    Scale shape: one daily aggregate off the fact table, then every
    window is partitioned by event type over the CALENDAR-bounded
    daily frame (days per type, not events) — the segmentation works
    on at most a few thousand rows per type regardless of corpus
    size, and the final stats are one shrinking aggregate."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(F.count("*").alias("y"))
    w = Window.partitionBy("event_type").orderBy("day")
    d = (
        daily.withColumn("rn", F.row_number().over(w))
        .withColumn("cum", F.sum("y").over(w))
    )
    tot = d.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("y").alias("total")
    )
    j = d.join(tot, "event_type").withColumn(
        "score",
        F.abs(F.col("n") * F.col("cum") - F.col("rn") * F.col("total")),
    )
    pick1 = Window.partitionBy("event_type").orderBy(
        F.desc("score"), F.asc("rn")
    )
    t1 = (
        j.filter(F.col("rn") < F.col("n"))
        .withColumn("__p", F.row_number().over(pick1))
        .filter(F.col("__p") == 1)
        .select("event_type", F.col("rn").alias("t1"))
    )
    halves = j.join(t1, "event_type", "left").withColumn(
        "half",
        F.when(F.col("rn") <= F.coalesce("t1", F.col("n")), F.lit(1)).otherwise(
            F.lit(2)
        ),
    )
    wh = Window.partitionBy("event_type", "half").orderBy("day")
    h = (
        halves.select("event_type", "half", "day", "y")
        .withColumn("rn_h", F.row_number().over(wh))
        .withColumn("cum_h", F.sum("y").over(wh))
    )
    tot_h = h.groupBy("event_type", "half").agg(
        F.count("*").alias("n_h"), F.sum("y").alias("total_h")
    )
    jh = h.join(tot_h, ["event_type", "half"]).withColumn(
        "score_h",
        F.abs(
            F.col("n_h") * F.col("cum_h") - F.col("rn_h") * F.col("total_h")
        ),
    )
    pick2 = Window.partitionBy("event_type", "half").orderBy(
        F.desc("score_h"), F.asc("rn_h")
    )
    t2 = (
        jh.filter(F.col("rn_h") < F.col("n_h"))
        .withColumn("__p", F.row_number().over(pick2))
        .filter(F.col("__p") == 1)
        .select("event_type", "half", F.col("rn_h").alias("t2"))
    )
    segs = (
        jh.join(t2, ["event_type", "half"], "left")
        .withColumn(
            "seg",
            (F.col("half") - 1) * 2
            + F.when(
                F.col("rn_h") <= F.coalesce("t2", F.col("n_h")), F.lit(1)
            ).otherwise(F.lit(2)),
        )
        .select("event_type", "seg", "day", "y")
    )
    d0 = daily.groupBy("event_type").agg(F.min("day").alias("d0"))
    xy = segs.join(d0, "event_type").select(
        "event_type",
        "seg",
        "day",
        F.datediff("day", "d0").cast("long").alias("x"),
        F.col("y").cast("long").alias("y"),
    )
    s = xy.groupBy("event_type", "seg").agg(
        F.count("*").alias("n"),
        F.min("day").alias("start_day"),
        F.max("day").alias("end_day"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return s.select(
        "event_type",
        F.col("seg").cast("bigint").alias("seg"),
        F.date_format("start_day", "yyyy-MM-dd").alias("start_day"),
        F.date_format("end_day", "yyyy-MM-dd").alias("end_day"),
        F.col("n").cast("bigint").alias("n_days"),
        F.col("sy").cast("bigint").alias("total_events"),
        F.when(
            (F.col("n") > 1) & (F.col("n") * F.col("sxx") != F.col("sx") * F.col("sx")),
            F.expr("(1000000 * (n * sxy - sx * sy)) div (n * sxx - sx * sx)"),
        ).alias("slope_micro"),
        F.expr("(1000000 * sy) div n").alias("daily_mean_micro"),
    )


QUERIES["ts_piecewise_trend"] = q_piecewise_trend

ORACLE["ts_piecewise_trend"] = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
  FROM events GROUP BY 1, 2),
d AS (
  SELECT event_type, day, y,
    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
    CAST(sum(y) OVER (PARTITION BY event_type ORDER BY day) AS BIGINT)
      AS cum
  FROM daily),
tot AS (
  SELECT event_type, count(*) AS n, CAST(sum(y) AS BIGINT) AS total
  FROM daily GROUP BY 1),
j AS (
  SELECT d.*, tot.n, tot.total,
    abs(tot.n * d.cum - d.rn * tot.total) AS score
  FROM d JOIN tot USING (event_type)),
t1 AS (
  SELECT event_type, rn AS t1 FROM (
    SELECT event_type, rn,
      row_number() OVER (PARTITION BY event_type
        ORDER BY score DESC, rn ASC) AS p
    FROM j WHERE rn < n)
  WHERE p = 1),
halves AS (
  SELECT j.event_type, j.day, j.y,
    CASE WHEN j.rn <= COALESCE(t1.t1, j.n) THEN 1 ELSE 2 END AS half
  FROM j LEFT JOIN t1 USING (event_type)),
h AS (
  SELECT event_type, half, day, y,
    row_number() OVER (PARTITION BY event_type, half ORDER BY day)
      AS rn_h,
    CAST(sum(y) OVER (PARTITION BY event_type, half ORDER BY day)
      AS BIGINT) AS cum_h
  FROM halves),
tot_h AS (
  SELECT event_type, half, count(*) AS n_h,
    CAST(sum(y) AS BIGINT) AS total_h
  FROM halves GROUP BY 1, 2),
jh AS (
  SELECT h.*, tot_h.n_h, tot_h.total_h,
    abs(tot_h.n_h * h.cum_h - h.rn_h * tot_h.total_h) AS score_h
  FROM h JOIN tot_h USING (event_type, half)),
t2 AS (
  SELECT event_type, half, rn_h AS t2 FROM (
    SELECT event_type, half, rn_h,
      row_number() OVER (PARTITION BY event_type, half
        ORDER BY score_h DESC, rn_h ASC) AS p
    FROM jh WHERE rn_h < n_h)
  WHERE p = 1),
segs AS (
  SELECT jh.event_type,
    (jh.half - 1) * 2
      + CASE WHEN jh.rn_h <= COALESCE(t2.t2, jh.n_h) THEN 1 ELSE 2 END
      AS seg,
    jh.day, jh.y
  FROM jh LEFT JOIN t2 USING (event_type, half)),
d0 AS (SELECT event_type, min(day) AS d0 FROM daily GROUP BY 1),
xy AS (
  SELECT s.event_type, s.seg, s.day,
    CAST(date_diff('day', d0.d0, s.day) AS BIGINT) AS x,
    CAST(s.y AS BIGINT) AS y
  FROM segs s JOIN d0 USING (event_type)),
st AS (
  SELECT event_type, seg, count(*) AS n,
    min(day) AS start_day, max(day) AS end_day,
    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM xy GROUP BY 1, 2)
SELECT event_type, CAST(seg AS BIGINT) AS seg,
  strftime(start_day, '%Y-%m-%d') AS start_day,
  strftime(end_day, '%Y-%m-%d') AS end_day,
  CAST(n AS BIGINT) AS n_days,
  CAST(sy AS BIGINT) AS total_events,
  CASE WHEN n > 1 AND n * sxx != sx * sx
    THEN CAST((1000000 * (n * sxy - sx * sy)) // (n * sxx - sx * sx)
      AS BIGINT) END AS slope_micro,
  CAST((1000000 * sy) // n AS BIGINT) AS daily_mean_micro
FROM st"""


def q_forecast_baselines(spark, sf_dir):
    """Forecast-baseline bake-off (Hyndman's naive / seasonal-naive /
    drift — the baselines every model must beat) on a 7-day holdout
    of per-type daily counts, ENTIRELY in exact integer arithmetic:
    integer predictions for naive/snaive, micro-scaled integer drift
    extrapolation, MAE as an exact micro-ratio, winner by (mae,
    method) — tolerance-free cross-engine, the ts_holt_backtest
    discipline without its float folds.  Types with under 15
    observed days are excluded (snaive needs a full season of
    train).

    Scale shape: one daily aggregate off the fact, then per-type
    windows over the calendar-bounded series; three baseline rows
    per type."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(F.count("*").alias("y"))
    w = Window.partitionBy("event_type").orderBy("day")
    d = daily.withColumn("rn", F.row_number().over(w)).withColumn(
        "y_lag7", F.lag("y", 7).over(w)
    )
    tot = d.groupBy("event_type").agg(F.count("*").alias("n"))
    j = d.join(tot, "event_type").filter(F.col("n") >= 15)
    train = j.filter(F.col("rn") <= F.col("n") - 7)
    anchors = train.groupBy("event_type").agg(
        F.max(F.struct("rn", "y"))["y"].alias("y_last"),
        F.min(F.struct("rn", "y"))["y"].alias("y_first"),
        F.max("rn").alias("n_train"),
    )
    test = (
        j.filter(F.col("rn") > F.col("n") - 7)
        .join(anchors, "event_type")
        .withColumn("h", F.col("rn") - (F.col("n") - 7))
    )
    errs = test.select(
        "event_type",
        F.abs(F.col("y") - F.col("y_last")).cast("bigint").alias("e_naive"),
        F.abs(F.col("y") - F.col("y_lag7")).cast("bigint").alias("e_snaive"),
        F.abs(
            F.lit(1000000) * F.col("y")
            - (
                F.lit(1000000) * F.col("y_last")
                + F.expr(
                    "(1000000 * h * (y_last - y_first)) div (n_train - 1)"
                )
            )
        ).cast("bigint").alias("e_drift_micro"),
    )
    mae = errs.groupBy("event_type").agg(
        F.expr("(1000000 * sum(e_naive)) div 7").alias("naive"),
        F.expr("(1000000 * sum(e_snaive)) div 7").alias("snaive"),
        F.expr("sum(e_drift_micro) div 7").alias("drift"),
    )
    melted = mae.select(
        "event_type",
        F.explode(
            F.array(
                F.struct(F.lit("drift").alias("method"), F.col("drift").alias("mae_micro")),
                F.struct(F.lit("naive").alias("method"), F.col("naive").alias("mae_micro")),
                F.struct(F.lit("snaive").alias("method"), F.col("snaive").alias("mae_micro")),
            )
        ).alias("m"),
    ).select("event_type", "m.method", "m.mae_micro")
    wbest = Window.partitionBy("event_type").orderBy(
        F.asc("mae_micro"), F.asc("method")
    )
    return melted.withColumn(
        "best", F.row_number().over(wbest) == 1
    )


QUERIES["ts_forecast_baselines"] = q_forecast_baselines

ORACLE["ts_forecast_baselines"] = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
  FROM events GROUP BY 1, 2),
d AS (
  SELECT event_type, day, y,
    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
    lag(y, 7) OVER (PARTITION BY event_type ORDER BY day) AS y_lag7
  FROM daily),
tot AS (SELECT event_type, count(*) AS n FROM daily GROUP BY 1),
j AS (
  SELECT d.*, tot.n FROM d JOIN tot USING (event_type)
  WHERE tot.n >= 15),
anchors AS (
  SELECT event_type,
    max(CASE WHEN rn = n - 7 THEN y END) AS y_last,
    max(CASE WHEN rn = 1 THEN y END) AS y_first,
    max(CASE WHEN rn <= n - 7 THEN rn END) AS n_train
  FROM j GROUP BY event_type),
test AS (
  SELECT j.event_type, j.y, j.y_lag7, a.y_last, a.y_first, a.n_train,
    j.rn - (j.n - 7) AS h
  FROM j JOIN anchors a USING (event_type)
  WHERE j.rn > j.n - 7),
errs AS (
  SELECT event_type,
    CAST(abs(y - y_last) AS BIGINT) AS e_naive,
    CAST(abs(y - y_lag7) AS BIGINT) AS e_snaive,
    CAST(abs(1000000 * y - (1000000 * y_last
      + (1000000 * h * (y_last - y_first)) // (n_train - 1)))
      AS BIGINT) AS e_drift_micro
  FROM test),
mae AS (
  SELECT event_type,
    CAST((1000000 * sum(e_naive)) // 7 AS BIGINT) AS naive,
    CAST((1000000 * sum(e_snaive)) // 7 AS BIGINT) AS snaive,
    CAST(sum(e_drift_micro) // 7 AS BIGINT) AS drift
  FROM errs GROUP BY 1),
melted AS (
  SELECT event_type, 'drift' AS method, drift AS mae_micro FROM mae
  UNION ALL
  SELECT event_type, 'naive', naive FROM mae
  UNION ALL
  SELECT event_type, 'snaive', snaive FROM mae)
SELECT event_type, method, mae_micro,
  row_number() OVER (PARTITION BY event_type
    ORDER BY mae_micro ASC, method ASC) = 1 AS best
FROM melted"""


def q_burst_kleinberg(spark, sf_dir):
    """Kleinberg-style 2-state burst detection (Kleinberg, KDD 2002)
    on per-type daily counts — the online FILTERING variant: states
    are base rate ``r0 = total/n`` and burst rate ``r1 = 2*r0``,
    per-day cost ``r - y*ln(r)`` (the Poisson NLL with the
    state-independent ``ln y!`` dropped), burst-entry toll
    ``gamma = ln n``, and the day's label is the cheaper cumulative
    state so far (ties -> base).  No backtracking pass: the label is
    the causal estimate a monitoring system can act on at day t —
    documented as the filtering (not smoothing) variant.

    Float discipline: every ln sees a pinned exact ratio, the DP is
    ONE sequential fold in a fixed order (identical double ops both
    engines — the Holt recursive-CTE pattern), margins rounded with
    the engine-neutral floor idiom.  Scale shape: one daily
    aggregate, then a per-type fold over the calendar-bounded
    series."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(F.count("*").alias("y"))
    g = daily.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.date_format("day", "yyyy-MM-dd").alias("day"),
                    F.col("y").cast("bigint").alias("y"),
                )
            )
        ).alias("arr"),
        F.count("*").alias("n"),
        F.sum("y").alias("total"),
    ).select(
        "event_type",
        "arr",
        (F.col("total").cast("double") / F.col("n").cast("double")).alias(
            "r0"
        ),
        F.log(F.col("n").cast("double")).alias("gamma"),
    ).withColumn("r1", F.lit(2.0) * F.col("r0"))

    def cost(y, r):
        return r - y * F.log(r)

    acc0 = F.struct(
        F.lit(None).cast("double").alias("c0"),
        F.lit(None).cast("double").alias("c1"),
        F.expr(
            "CAST(array() AS "
            "array<struct<day:string,y:bigint,burst:boolean,margin:double>>)"
        ).alias("out"),
    )

    def step(acc, el):
        y = el["y"].cast("double")
        first = acc["c0"].isNull()
        r0, r1, gamma = F.col("r0"), F.col("r1"), F.col("gamma")
        c0n = F.when(first, cost(y, r0)).otherwise(
            cost(y, r0) + F.least(acc["c0"], acc["c1"])
        )
        c1n = F.when(first, cost(y, r1) + gamma).otherwise(
            cost(y, r1) + F.least(acc["c0"] + gamma, acc["c1"])
        )
        entry = F.struct(
            el["day"].alias("day"),
            el["y"].alias("y"),
            (c1n < c0n).alias("burst"),
            (F.floor((c0n - c1n) * 10000 + F.lit(0.5)) / 10000).alias(
                "margin"
            ),
        )
        return F.struct(
            c0n.alias("c0"),
            c1n.alias("c1"),
            F.concat(acc["out"], F.array(entry)).alias("out"),
        )

    folded = g.select(
        "event_type", F.aggregate("arr", acc0, step)["out"].alias("out")
    )
    return folded.select(
        "event_type", F.explode("out").alias("o")
    ).select(
        "event_type",
        F.col("o.day").alias("day"),
        F.col("o.y").alias("y"),
        F.col("o.burst").alias("burst"),
        F.col("o.margin").alias("margin"),
    )


QUERIES["ts_burst_kleinberg"] = q_burst_kleinberg

ORACLE["ts_burst_kleinberg"] = """
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
  FROM events GROUP BY 1, 2),
g AS (
  SELECT event_type,
    list(strftime(day, '%Y-%m-%d') ORDER BY day) AS ds,
    list(CAST(y AS BIGINT) ORDER BY day) AS ys,
    count(*) AS n,
    CAST(sum(y) AS DOUBLE) / count(*) AS r0,
    ln(CAST(count(*) AS DOUBLE)) AS gamma
  FROM daily GROUP BY event_type),
seq AS (
  SELECT event_type, ds, ys, n, r0, gamma, 1 AS i,
    r0 - CAST(ys[1] AS DOUBLE) * ln(r0) AS c0,
    (2 * r0) - CAST(ys[1] AS DOUBLE) * ln(2 * r0) + gamma AS c1
  FROM g
  UNION ALL
  SELECT event_type, ds, ys, n, r0, gamma, i + 1,
    (r0 - CAST(ys[i + 1] AS DOUBLE) * ln(r0)) + least(c0, c1),
    ((2 * r0) - CAST(ys[i + 1] AS DOUBLE) * ln(2 * r0))
      + least(c0 + gamma, c1)
  FROM seq WHERE i < n)
SELECT event_type, ds[i] AS day, ys[i] AS y,
  c1 < c0 AS burst,
  floor((c0 - c1) * 10000 + 0.5) / 10000 AS margin
FROM seq"""


def q_haar_dwt(spark, sf_dir):
    """Unnormalized integer Haar wavelet transform (2 levels) of
    per-type daily counts — the multiresolution decomposition used
    for compressed telemetry and change localization (a burst shows
    up as a large detail coefficient at its scale).  Unnormalized
    ``a = x1 + x2, d = x1 - x2`` keeps every coefficient an EXACT
    integer (the sqrt(2) normalization is a display constant);
    odd-length tails carry the unpaired value up as-is, flagged.

    Scale shape: one daily aggregate, then per-type windows over the
    calendar-bounded series; output is coefficient rows per (type,
    level, position)."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(F.count("*").alias("y"))
    w = Window.partitionBy("event_type").orderBy("day")
    s0 = daily.withColumn("i", F.row_number().over(w) - 1).select(
        "event_type", "i", F.col("y").cast("bigint").alias("v")
    )

    def level(src, lvl):
        wl = Window.partitionBy("event_type").orderBy("i")
        nxt = src.withColumn("__nv", F.lead("v").over(wl))
        pairs = nxt.filter(F.col("i") % 2 == 0).select(
            "event_type",
            (F.col("i") / 2).cast("bigint").alias("k"),
            F.col("v").alias("x1"),
            F.col("__nv").alias("x2"),
        )
        approx = pairs.select(
            "event_type",
            F.col("k").alias("i"),
            F.coalesce(F.col("x1") + F.col("x2"), F.col("x1")).alias("v"),
        )
        detail = pairs.select(
            "event_type",
            F.lit(lvl).cast("bigint").alias("level"),
            F.col("k").alias("k"),
            F.lit("detail").alias("kind"),
            (F.col("x1") - F.coalesce(F.col("x2"), F.col("x1"))).alias(
                "coef"
            ),
            F.col("x2").isNull().alias("odd_tail"),
        )
        return approx, detail

    a1, d1 = level(s0, 1)
    a2, d2 = level(a1, 2)
    approx_rows = a2.select(
        "event_type",
        F.lit(2).cast("bigint").alias("level"),
        F.col("i").alias("k"),
        F.lit("approx").alias("kind"),
        F.col("v").alias("coef"),
        F.lit(False).alias("odd_tail"),
    )
    return d1.unionByName(d2).unionByName(approx_rows)


QUERIES["ts_haar_dwt"] = q_haar_dwt

ORACLE["ts_haar_dwt"] = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
  FROM events GROUP BY 1, 2),
s0 AS (
  SELECT event_type,
    row_number() OVER (PARTITION BY event_type ORDER BY day) - 1 AS i,
    CAST(y AS BIGINT) AS v
  FROM daily),
p1 AS (
  SELECT event_type, i // 2 AS k, v AS x1,
    lead(v) OVER (PARTITION BY event_type ORDER BY i) AS x2
  FROM s0 QUALIFY i % 2 = 0),
a1 AS (
  SELECT event_type, k AS i, COALESCE(x1 + x2, x1) AS v FROM p1),
d1 AS (
  SELECT event_type, CAST(1 AS BIGINT) AS level, k, 'detail' AS kind,
    x1 - COALESCE(x2, x1) AS coef, x2 IS NULL AS odd_tail
  FROM p1),
p2 AS (
  SELECT event_type, i // 2 AS k, v AS x1,
    lead(v) OVER (PARTITION BY event_type ORDER BY i) AS x2
  FROM a1 QUALIFY i % 2 = 0),
a2 AS (
  SELECT event_type, k AS i, COALESCE(x1 + x2, x1) AS v FROM p2),
d2 AS (
  SELECT event_type, CAST(2 AS BIGINT) AS level, k, 'detail' AS kind,
    x1 - COALESCE(x2, x1) AS coef, x2 IS NULL AS odd_tail
  FROM p2)
SELECT event_type, level, CAST(k AS BIGINT) AS k, kind,
  CAST(coef AS BIGINT) AS coef, odd_tail
FROM (SELECT * FROM d1 UNION ALL SELECT * FROM d2
  UNION ALL
  SELECT event_type, CAST(2 AS BIGINT), i, 'approx', v, FALSE FROM a2)"""
