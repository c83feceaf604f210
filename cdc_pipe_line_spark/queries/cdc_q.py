"""CDC-family queries (SURVEY.md §2.3 J1-J5): snapshot diff on a
deterministic orders-derived snapshot pair (fixtures.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_pipe_line_spark import fixtures
from cdc_pipe_line_spark.cdc import diff as cdc_diff


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from cdc_pipe_line_spark.queries import load_table

    return load_table(spark, sf_dir, name)


def _orders_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    v1 = fixtures.orders_snapshot_v1(orders)
    v2 = fixtures.orders_snapshot_v2(orders)
    return cdc_diff.snapshot_diff(v2, v1, "o_orderkey")


def q_cdc_diff_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe-tagged CDC lifecycle summary in one slot:

    - ``diff``: insert/update/delete counts between two orders
      snapshots (J1-J3);
    - ``first_load``: first upload -> all rows insert events with
      payload maps populated (J4; app/app.py:156-174);
    - ``dedup_replayed``: the events stream replayed twice, restored
      to exactly one row per event_id by the deterministic
      first-by-ts dedup (J8; reference ON CONFLICT DO NOTHING).
    """
    from cdc_pipe_line_spark.cdc.scd2 import dedup_events

    null_l = F.lit(None).cast("bigint")
    diff = (
        _orders_diff(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.lit("diff").alias("probe"), "event_type", "n_events",
                null_l.alias("n_payload_status"))
    )
    orders = _t(spark, sf_dir, "orders")
    first = (
        cdc_diff.first_load_events(fixtures.orders_snapshot_v1(orders), "o_orderkey")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count(F.col("new_values")["o_orderstatus"]).alias(
                "n_payload_status"
            ),
        )
        .select(F.lit("first_load").alias("probe"), "event_type", "n_events",
                "n_payload_status")
    )
    ev = _t(spark, sf_dir, "events")
    replayed = ev.unionByName(ev)  # at-least-once delivery simulation
    deduped = (
        dedup_events(replayed, order_cols=["ts"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.lit("dedup_replayed").alias("probe"), "event_type",
                "n_events", null_l.alias("n_payload_status"))
    )
    return diff.unionByName(first).unionByName(deduped)


def q_cdc_diff_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key diff rows with the changed-column list as a csv string."""
    d = _orders_diff(spark, sf_dir)
    return d.select(
        "event_type",
        "key_value",
        F.coalesce(
            F.array_join(F.array_sort("changed_cols"), ","), F.lit("")
        ).alias("changed_cols_csv"),
    )


_DIFF_CTE = (
    f"WITH v1 AS ({fixtures.V1_SQL}), v2 AS ({fixtures.V2_SQL}), j AS (\n"
    "SELECT v2.o_orderkey AS nk, v1.o_orderkey AS pk,\n"
    "  CASE WHEN v1.o_orderkey IS NULL THEN 'insert'\n"
    "       WHEN v2.o_orderkey IS NULL THEN 'delete'\n"
    "       WHEN (v2.o_custkey IS DISTINCT FROM v1.o_custkey)\n"
    "         OR (v2.o_orderstatus IS DISTINCT FROM v1.o_orderstatus)\n"
    "         OR (v2.o_totalprice IS DISTINCT FROM v1.o_totalprice)\n"
    "         OR (v2.o_orderdate IS DISTINCT FROM v1.o_orderdate)\n"
    "         OR (v2.o_orderpriority IS DISTINCT FROM v1.o_orderpriority)\n"
    "       THEN 'update'\n"
    "       END AS event_type,\n"
    "  CONCAT_WS(',',\n"
    "    CASE WHEN v2.o_custkey IS DISTINCT FROM v1.o_custkey THEN 'o_custkey' END,\n"
    "    CASE WHEN v2.o_orderdate IS DISTINCT FROM v1.o_orderdate THEN 'o_orderdate' END,\n"
    "    CASE WHEN v2.o_orderpriority IS DISTINCT FROM v1.o_orderpriority THEN 'o_orderpriority' END,\n"
    "    CASE WHEN v2.o_orderstatus IS DISTINCT FROM v1.o_orderstatus THEN 'o_orderstatus' END,\n"
    "    CASE WHEN v2.o_totalprice IS DISTINCT FROM v1.o_totalprice THEN 'o_totalprice' END\n"
    "  ) AS changed_cols_csv,\n"
    "  CAST(COALESCE(v2.o_orderkey, v1.o_orderkey) AS VARCHAR) AS key_value\n"
    "FROM v2 FULL OUTER JOIN v1 ON CAST(v2.o_orderkey AS VARCHAR) = CAST(v1.o_orderkey AS VARCHAR))\n"
)

def q_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal point read: "what did we believe 10 days ago about
    the state of the world 17 days ago" — events become per-user
    versions with a transaction interval (lead-chained, the SCD2
    shape) and a synthesized valid interval; the read is two interval
    predicates, no join.  Anchors derive from max(ts) in-plan (1-row
    broadcast) so the query is one declarative plan."""
    from cdc_pipe_line_spark.cdc.bitemporal import (
        add_tx_intervals,
        as_of_bitemporal,
    )
    from cdc_pipe_line_spark.queries import load_table

    ev = load_table(spark, sf_dir, "events")
    bt = (
        add_tx_intervals(
            ev, key_cols=["user_id"], ts_col="ts", tiebreak_col="event_id"
        )
        .withColumn(
            "valid_from",
            F.date_sub(F.to_date("ts"), (F.col("event_id") % 7).cast("int")),
        )
        .withColumn("valid_to", F.date_add("valid_from", 14))
    )
    anchors = ev.agg(F.max("ts").alias("__mx"))
    snap = as_of_bitemporal(
        bt.crossJoin(F.broadcast(anchors)),
        tx_at=F.col("__mx") - F.expr("INTERVAL 10 DAYS"),
        valid_at=F.date_sub(F.to_date("__mx"), 17),
    )
    return snap.groupBy("event_type").agg(
        F.count("*").alias("n_versions"),
        F.count_distinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )

def q_fact_scd2_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE warehouse CDC join: facts enriched with the dimension
    VERSION in effect at fact time (purchases x per-user state
    versions).  The key equi-join (user_id) bounds candidates to one
    user's few versions, so the temporal predicate rides the join
    condition of a plain SMJ/BHJ — no grid explode, no window over
    facts; unmatched facts (purchase before any state) keep nulls via
    the left join.  Zero-length versions (two states at one ts) are
    unmatched by half-open semantics — deterministic in both engines."""
    from cdc_pipe_line_spark.cdc.bitemporal import add_tx_intervals
    from cdc_pipe_line_spark.queries import load_table

    ev = load_table(spark, sf_dir, "events")
    dim = add_tx_intervals(
        ev.filter(F.col("event_type") != "purchase").select(
            F.col("user_id").alias("d_user"),
            F.col("event_id").alias("version_id"),
            F.col("value").alias("state_value"),
            "ts",
        ),
        key_cols=["d_user"],
        ts_col="ts",
        tiebreak_col="version_id",
    ).drop("ts")
    facts = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("fact_id"), "user_id", "ts"
    )
    j = facts.join(
        dim,
        (facts.user_id == dim.d_user)
        & (dim.tx_from <= facts.ts)
        & (dim.tx_to.isNull() | (facts.ts < dim.tx_to)),
        "left",
    )
    return j.select(
        "fact_id",
        "user_id",
        "version_id",
        F.round("state_value", 4).alias("state_value"),
        F.unix_micros("tx_from").alias("version_since"),
    )

def q_changelog_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net-effect changelog compaction: the event stream becomes a
    synthetic I/U/D feed (op = event_id mod 3) and each user's
    history collapses to its single net change — one struct-min/max
    aggregate, no window sort (see compact_changelog)."""
    from cdc_pipe_line_spark.cdc.diff import compact_changelog
    from cdc_pipe_line_spark.queries import load_table

    ev = load_table(spark, sf_dir, "events")
    feed = ev.withColumn(
        "op",
        F.element_at(
            F.array(F.lit("I"), F.lit("U"), F.lit("D")),
            (F.col("event_id") % 3 + 1).cast("int"),
        ),
    )
    return compact_changelog(feed, key_col="user_id")

QUERIES = {
    "cdc_changelog_compact": q_changelog_compact,
    "join_fact_scd2_enrich": q_fact_scd2_enrich,
    "cdc_bitemporal_asof": q_bitemporal_asof,
    "cdc_diff_summary": q_cdc_diff_summary,
    "cdc_diff_events": q_cdc_diff_events,
}

ORACLE = {
    "cdc_changelog_compact": """
WITH feed AS (
  SELECT user_id, ts, event_id, value,
    (['I', 'U', 'D'])[CAST(event_id % 3 AS INT) + 1] AS op
  FROM events),
ranked AS (
  SELECT *,
    row_number() OVER (PARTITION BY user_id
      ORDER BY ts ASC, event_id ASC) AS rn_a,
    row_number() OVER (PARTITION BY user_id
      ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM feed),
agg AS (
  SELECT user_id,
    max(CASE WHEN rn_a = 1 THEN op END) AS first_op,
    max(CASE WHEN rn_d = 1 THEN op END) AS last_op,
    round(max(CASE WHEN rn_d = 1 THEN CAST(value AS DOUBLE) END), 4)
      AS last_value,
    max(CASE WHEN rn_d = 1 THEN epoch_us(ts) END) AS last_ts,
    count(*) AS n_changes
  FROM ranked GROUP BY user_id)
SELECT user_id,
  CASE WHEN last_op = 'D' AND first_op = 'I' THEN 'none'
       WHEN last_op = 'D' THEN 'delete'
       WHEN first_op = 'I' THEN 'insert'
       ELSE 'update' END AS net_op,
  n_changes, first_op, last_op, last_value, last_ts
FROM agg""",
    "join_fact_scd2_enrich": """
WITH dim AS (
  SELECT user_id AS d_user, event_id AS version_id, value AS state_value,
    ts AS tx_from,
    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS tx_to
  FROM events WHERE event_type <> 'purchase'),
f AS (
  SELECT event_id AS fact_id, user_id, ts
  FROM events WHERE event_type = 'purchase')
SELECT f.fact_id, f.user_id, d.version_id,
  round(d.state_value, 4) AS state_value,
  epoch_us(d.tx_from) AS version_since
FROM f LEFT JOIN dim d ON f.user_id = d.d_user
  AND d.tx_from <= f.ts AND (d.tx_to IS NULL OR f.ts < d.tx_to)""",
    "cdc_bitemporal_asof": """
WITH mx AS (SELECT max(ts) AS mx FROM events),
bt AS (
  SELECT user_id, event_id, event_type, value, ts AS tx_from,
    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS tx_to,
    CAST(date_trunc('day', ts) AS DATE) - CAST(event_id % 7 AS INT)
      AS valid_from
  FROM events),
bt2 AS (SELECT *, valid_from + 14 AS valid_to FROM bt),
f AS (
  SELECT * FROM bt2 CROSS JOIN mx
  WHERE tx_from <= mx - INTERVAL 10 DAY
    AND (tx_to IS NULL OR tx_to > mx - INTERVAL 10 DAY)
    AND valid_from <= CAST(date_trunc('day', mx) AS DATE) - 17
    AND (valid_to IS NULL
         OR valid_to > CAST(date_trunc('day', mx) AS DATE) - 17))
SELECT event_type, count(*) AS n_versions,
  count(DISTINCT user_id) AS n_users,
  round(sum(value), 2) AS sum_value
FROM f GROUP BY event_type""",
    "cdc_diff_summary": _DIFF_CTE
    + """
SELECT 'diff' AS probe, event_type, count(*) AS n_events,
  CAST(NULL AS BIGINT) AS n_payload_status
FROM j WHERE event_type IS NOT NULL GROUP BY event_type
UNION ALL
SELECT 'first_load', 'insert', count(*), count(o_orderstatus) FROM v1
UNION ALL
SELECT 'dedup_replayed', event_type, count(*), CAST(NULL AS BIGINT)
FROM (SELECT DISTINCT event_id, event_type FROM events)
GROUP BY event_type""",
    "cdc_diff_events": _DIFF_CTE
    + "SELECT event_type, key_value,\n"
    "  CASE WHEN event_type = 'update' THEN changed_cols_csv ELSE '' END AS changed_cols_csv\n"
    "FROM j WHERE event_type IS NOT NULL",
}


def q_scd3_prev_current(spark, sf_dir):
    """SCD Type 3 — previous-and-current columns (the third classic
    slowly-changing-dimension strategy next to the repo's Type 1
    current-view and Type 2 history): per user, the latest purchase
    value, the immediately-previous one, the change timestamp and the
    delta.  ONE window pass (lag over the same (ts, event_id) order
    every CDC query uses) + latest-row filter via WindowGroupLimit —
    no self-join, no full history materialization."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    wd = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    hist = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.round("value", 4).alias("curr_value"),
        F.round(F.lag("value").over(w), 4).alias("prev_value"),
    )
    latest = hist.withColumn(
        "__rn", F.row_number().over(wd)
    ).filter(F.col("__rn") == 1)
    return latest.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("changed_at"),
        "curr_value",
        "prev_value",
        F.round(
            F.col("curr_value") - F.coalesce("prev_value", "curr_value"),
            4,
        ).alias("delta"),
    )


def q_sequence_gap_audit(spark, sf_dir):
    """CDC feed integrity: detect dropped records by auditing the
    monotone sequence id (event_id stands in for the source LSN) per
    id-range quartile — expected span vs observed count, missing
    total, and a contiguous flag.  Shrinking aggregate per quartile;
    the quartile bounds derive from one 1-row min/max broadcast, so
    the audit is two passes of pure map-reduce at any volume."""
    ev = _t(spark, sf_dir, "events")
    rng = ev.agg(
        F.min("event_id").alias("lo"), F.max("event_id").alias("hi")
    )
    with_q = ev.crossJoin(F.broadcast(rng)).select(
        "event_id",
        # integer div, not cast(double): CAST(double AS INT) truncates
        # in Spark but ROUNDS in DuckDB (the recorded parity trap)
        F.least(
            F.expr("(event_id - lo) * 4 div (hi - lo + 1)").cast("int"),
            F.lit(3),
        ).alias("quartile"),
    )
    return (
        with_q.groupBy("quartile")
        .agg(
            F.count("*").alias("n_present"),
            F.min("event_id").alias("first_id"),
            F.max("event_id").alias("last_id"),
        )
        .select(
            "quartile",
            "n_present",
            "first_id",
            "last_id",
            (
                F.col("last_id") - F.col("first_id") + 1 - F.col("n_present")
            ).alias("n_missing"),
            (
                F.col("last_id") - F.col("first_id") + 1
                == F.col("n_present")
            ).alias("contiguous"),
        )
    )


def q_scd4_history_table(spark, sf_dir):
    """SCD Type 4 — the CURRENT-table / HISTORY-table split (the
    fourth classic slowly-changing-dimension strategy, completing the
    repo's Type 1/2/3 set): the latest version of every user lands in
    the current table (``table_role='current'``) and every superseded
    version moves to the separate history table
    (``table_role='history'``) with its supersession timestamp — the
    layout warehouses use when the dimension is hot but history is
    audit-only.  ONE descending window pass (WindowGroupLimit-style
    rank over the standard (ts, event_id) CDC order) splits both
    tables; no self-join, no second scan — the union is two
    projections of the SAME ranked frame."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    wd = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.round("value", 4).alias("value"),
        F.row_number().over(wd).alias("__rn"),
        F.lag("ts").over(wd).alias("__superseded_at"),
    ).localCheckpoint(eager=True)
    current = ranked.filter(F.col("__rn") == 1).select(
        F.lit("current").alias("table_role"),
        "user_id",
        F.col("event_id").cast("bigint").alias("version_event"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.lit(None).cast("string").alias("superseded_at"),
        "value",
    )
    history = ranked.filter(F.col("__rn") > 1).select(
        F.lit("history").alias("table_role"),
        "user_id",
        F.col("event_id").cast("bigint").alias("version_event"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format("__superseded_at", "yyyy-MM-dd HH:mm:ss").alias(
            "superseded_at"
        ),
        "value",
    )
    return current.unionByName(history)


QUERIES["scd3_prev_current"] = q_scd3_prev_current
QUERIES["scd4_history_table"] = q_scd4_history_table
QUERIES["cdc_sequence_gap_audit"] = q_sequence_gap_audit

ORACLE["scd4_history_table"] = """
WITH p AS (
  SELECT user_id, ts, event_id, round(value, 4) AS value,
    row_number() OVER (PARTITION BY user_id
      ORDER BY ts DESC, event_id DESC) AS rn,
    lag(ts) OVER (PARTITION BY user_id
      ORDER BY ts DESC, event_id DESC) AS superseded_ts
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL)
SELECT CASE WHEN rn = 1 THEN 'current' ELSE 'history' END AS table_role,
  user_id,
  CAST(event_id AS BIGINT) AS version_event,
  strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
  CASE WHEN rn = 1 THEN NULL
       ELSE strftime(superseded_ts, '%Y-%m-%d %H:%M:%S') END
    AS superseded_at,
  value
FROM p"""

ORACLE["scd3_prev_current"] = """
WITH p AS (
  SELECT user_id, ts, event_id, round(value, 4) AS curr_value,
    round(lag(value) OVER (PARTITION BY user_id
      ORDER BY ts ASC, event_id ASC), 4) AS prev_value,
    row_number() OVER (PARTITION BY user_id
      ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL)
SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS changed_at,
  curr_value, prev_value,
  round(curr_value - coalesce(prev_value, curr_value), 4) AS delta
FROM p WHERE rn = 1"""

ORACLE["cdc_sequence_gap_audit"] = """
WITH rng AS (
  SELECT min(event_id) AS lo, max(event_id) AS hi FROM events),
q AS (
  SELECT event_id,
    least(CAST((event_id - lo) * 4 // (hi - lo + 1) AS INT), 3)
      AS quartile
  FROM events CROSS JOIN rng)
SELECT quartile, count(*) AS n_present,
  min(event_id) AS first_id, max(event_id) AS last_id,
  max(event_id) - min(event_id) + 1 - count(*) AS n_missing,
  max(event_id) - min(event_id) + 1 = count(*) AS contiguous
FROM q GROUP BY 1"""


def q_column_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column churn profile of the CDC update stream — which
    columns actually change — the signal that drives SCD type
    choices (hot columns -> Type 2 history; cold -> Type 1 overwrite)
    and column-level replication filters.  One explode of the diff's
    ``changed_cols`` array + a tiny aggregate; the diff itself is the
    registered one-full-outer-join plan."""
    d = _orders_diff(spark, sf_dir)
    upd = d.filter(F.col("event_type") == "update").localCheckpoint(
        eager=True
    )
    n_upd = upd.agg(F.count("*").alias("n_updates"))
    fl = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000
    return (
        upd.select(F.explode("changed_cols").alias("col"))
        .groupBy("col")
        .agg(F.count("*").alias("n_changed"))
        .crossJoin(F.broadcast(n_upd))
        .select(
            "col",
            "n_changed",
            "n_updates",
            fl(
                F.col("n_changed") / F.col("n_updates").cast("double")
                * 100.0
            ).alias("churn_pct"),
        )
    )


QUERIES["cdc_column_churn"] = q_column_churn

ORACLE["cdc_column_churn"] = _DIFF_CTE + """
, upd AS (
  SELECT string_split(changed_cols_csv, ',') AS cols FROM j
  WHERE event_type = 'update'),
n AS (SELECT count(*) AS n_updates FROM upd),
x AS (
  SELECT col FROM (SELECT unnest(cols) AS col FROM upd)
  WHERE col != '')
SELECT col, count(*) AS n_changed,
  any_value(n.n_updates) AS n_updates,
  floor(count(*) / CAST(any_value(n.n_updates) AS DOUBLE) * 100.0
    * 10000 + 0.5) / 10000 AS churn_pct
FROM x CROSS JOIN n GROUP BY col"""


def q_restatement_diff(spark, sf_dir):
    """Bitemporal restatement diff — the audit question behind every
    late-correction investigation: comparing what we believed at
    transaction time T1 vs T2 about the SAME valid-time point V,
    which users' facts were restated (belief changed), which appeared
    (first learned between T1 and T2), which disappeared (expired on
    the valid axis as knowledge advanced)?

    Mechanics: one bitemporal frame (tx intervals lead-chained per
    user, synthesized valid intervals — the cdc_bitemporal_asof
    fixture), localCheckpoint-pinned, read at two tx anchors
    (T1 = watermark - 20d, T2 = watermark - 5d) for one valid point
    (V = watermark-day - 10).  Per user each read yields <= 1 row (tx
    intervals are disjoint by construction), so the comparison is ONE
    full-outer join on user_id + a CASE classification — the same
    shape as the snapshot diff (J1-J3), here applied across the
    belief axis.  Value deltas compare as exact integer cents."""
    from cdc_pipe_line_spark.cdc.bitemporal import (
        add_tx_intervals,
        as_of_bitemporal,
    )
    from cdc_pipe_line_spark.queries import load_table

    ev = load_table(spark, sf_dir, "events")
    bt = (
        add_tx_intervals(
            ev, key_cols=["user_id"], ts_col="ts", tiebreak_col="event_id"
        )
        .withColumn(
            "valid_from",
            F.date_sub(F.to_date("ts"), (F.col("event_id") % 7).cast("int")),
        )
        .withColumn("valid_to", F.date_add("valid_from", 14))
        .localCheckpoint(eager=True)
    )
    anchors = ev.agg(F.max("ts").alias("__mx"))

    def snap(tx_days_back, tag):
        s = as_of_bitemporal(
            bt.crossJoin(F.broadcast(anchors)),
            tx_at=F.col("__mx") - F.expr(f"INTERVAL {tx_days_back} DAYS"),
            valid_at=F.date_sub(F.to_date("__mx"), 10),
        )
        return s.select(
            "user_id",
            F.col("event_id").alias(f"{tag}_version"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias(f"{tag}_cents"),
        )

    t1, t2 = snap(20, "t1"), snap(5, "t2")
    j = t1.join(t2, "user_id", "full")
    status = (
        F.when(F.col("t1_version").isNull(), F.lit("appeared"))
        .when(F.col("t2_version").isNull(), F.lit("disappeared"))
        .when(
            F.col("t1_version") != F.col("t2_version"), F.lit("restated")
        )
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(
            status.alias("status"),
            "user_id",
            F.coalesce("t2_cents", F.lit(0)).alias("c2"),
            F.coalesce("t1_cents", F.lit(0)).alias("c1"),
        )
        .groupBy("status")
        .agg(
            F.count("*").alias("n_users"),
            F.sum(F.col("c2") - F.col("c1")).alias("net_cents_delta"),
        )
    )


QUERIES["cdc_restatement_diff"] = q_restatement_diff

ORACLE["cdc_restatement_diff"] = """
WITH mx AS (SELECT max(ts) AS mx FROM events),
bt AS (
  SELECT user_id, event_id, value, ts AS tx_from,
    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS tx_to,
    CAST(date_trunc('day', ts) AS DATE) - CAST(event_id % 7 AS INT)
      AS valid_from
  FROM events),
bt2 AS (SELECT *, valid_from + 14 AS valid_to FROM bt),
t1 AS (
  SELECT user_id, event_id AS v,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM bt2 CROSS JOIN mx
  WHERE tx_from <= mx - INTERVAL 20 DAY
    AND (tx_to IS NULL OR tx_to > mx - INTERVAL 20 DAY)
    AND valid_from <= CAST(date_trunc('day', mx) AS DATE) - 10
    AND (valid_to IS NULL
         OR valid_to > CAST(date_trunc('day', mx) AS DATE) - 10)),
t2 AS (
  SELECT user_id, event_id AS v,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM bt2 CROSS JOIN mx
  WHERE tx_from <= mx - INTERVAL 5 DAY
    AND (tx_to IS NULL OR tx_to > mx - INTERVAL 5 DAY)
    AND valid_from <= CAST(date_trunc('day', mx) AS DATE) - 10
    AND (valid_to IS NULL
         OR valid_to > CAST(date_trunc('day', mx) AS DATE) - 10)),
j AS (
  SELECT coalesce(t1.user_id, t2.user_id) AS user_id,
    CASE WHEN t1.v IS NULL THEN 'appeared'
         WHEN t2.v IS NULL THEN 'disappeared'
         WHEN t1.v != t2.v THEN 'restated'
         ELSE 'unchanged' END AS status,
    coalesce(t2.cents, 0) - coalesce(t1.cents, 0) AS delta
  FROM t1 FULL JOIN t2 ON t1.user_id = t2.user_id)
SELECT status, count(*) AS n_users,
  CAST(sum(delta) AS BIGINT) AS net_cents_delta
FROM j GROUP BY 1"""


def q_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Validity-interval coalescing — the gaps-and-islands merge every
    temporal/CDC store needs (fold overlapping or adjacent validity
    ranges into maximal covered intervals; ref: the SCD2 history's
    interval algebra, here applied to per-user activity ranges).

    Each event opens a deterministic interval ``[ts, ts +
    (floor(value) + 1) minutes)`` in integer microseconds (the
    cross-engine epoch rule; floor() because bare double->int casts
    truncate in Spark but round in DuckDB).  Classic islands: an interval STARTS a new island iff its
    start exceeds the running max of all previous ends (per user, in
    start order); island id = cumulative sum of start flags; one
    aggregate per (user, island), rolled up per user.  Both windows
    are keyed by user — no global sort anywhere.
    """
    ev = _t(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    iv = ev.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (
            F.unix_micros("ts")
            + (F.floor("value").cast("bigint") + 1) * 60_000_000
        ).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = Window.partitionBy("user_id").orderBy("s", "e").rowsBetween(
        Window.unboundedPreceding, 0
    )
    flagged = iv.withColumn(
        "new_island",
        (
            F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-1))
        ).cast("bigint"),
    ).withColumn("island", F.sum("new_island").over(w_run))
    merged = flagged.groupBy("user_id", "island").agg(
        F.min("s").alias("ms"),
        F.max("e").alias("me"),
        F.count("*").alias("n_raw"),
    )
    return merged.groupBy("user_id").agg(
        F.sum("n_raw").alias("n_intervals"),
        F.count("*").alias("n_merged"),
        F.sum(F.col("me") - F.col("ms")).alias("covered_us"),
        F.max(F.col("me") - F.col("ms")).alias("longest_us"),
    )


QUERIES["cdc_interval_coalesce"] = q_interval_coalesce

ORACLE["cdc_interval_coalesce"] = """
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s,
    epoch_us(ts) + (CAST(floor(value) AS BIGINT) + 1) * 60000000 AS e
  FROM events),
flagged AS (
  SELECT user_id, s, e,
    CASE WHEN s > coalesce(max(e) OVER (PARTITION BY user_id
      ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      -1) THEN 1 ELSE 0 END AS new_island
  FROM iv),
islands AS (
  SELECT user_id, s, e,
    sum(new_island) OVER (PARTITION BY user_id ORDER BY s, e
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged),
merged AS (
  SELECT user_id, island, min(s) AS ms, max(e) AS me,
    count(*) AS n_raw
  FROM islands GROUP BY 1, 2)
SELECT user_id,
  CAST(sum(n_raw) AS BIGINT) AS n_intervals,
  count(*) AS n_merged,
  CAST(sum(me - ms) AS BIGINT) AS covered_us,
  CAST(max(me - ms) AS BIGINT) AS longest_us
FROM merged GROUP BY 1"""


def q_disorder_audit(spark, sf_dir):
    """Event-time DISORDER audit — the measurement that SIZES a
    watermark: per user (arrival order = event_id, the ingest
    sequence), an event is "late" when its event time sits behind the
    running maximum already seen for that key; the lateness magnitude
    distribution tells you exactly what ``withWatermark`` delay keeps
    completeness (choose >= the observed p99, audit the tail beyond
    it).  Per event type: event count, late count, the maximum
    lateness, and the exact p99 lateness over late events (k-th
    selection via a partitioned rank — no global sort, the shared rank
    definition k = ceil(99n/100)).

    All integer microseconds; the running max is a keyed window over
    the arrival order — one hash shuffle on user_id."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
    )
    warr = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = ev.withColumn(
        "disorder_us",
        F.greatest(
            F.coalesce(F.max("us").over(warr) - F.col("us"), F.lit(0)),
            F.lit(0),
        ),
    )
    late = d.filter(F.col("disorder_us") > 0)
    ranked = late.withColumn(
        "__rn",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy("disorder_us")
        ),
    )
    per_type = d.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("disorder_us") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_late"),
        F.max("disorder_us").alias("max_disorder_us"),
    )
    k = F.expr("(99 * n_late + 99) div 100")
    p99 = per_type.select("event_type", "n_late", k.alias("__k")).join(
        ranked.select("event_type", "__rn", "disorder_us"),
        ["event_type"],
    ).filter(F.col("__rn") == F.col("__k")).select(
        "event_type", F.col("disorder_us").alias("p99_disorder_us")
    )
    return per_type.join(p99, "event_type", "left").select(
        "event_type",
        "n_events",
        "n_late",
        "max_disorder_us",
        F.coalesce("p99_disorder_us", F.lit(0)).alias("p99_disorder_us"),
    )


QUERIES["cdc_disorder_audit"] = q_disorder_audit

ORACLE["cdc_disorder_audit"] = """
WITH ev AS (
  SELECT event_type, user_id, event_id, epoch_us(ts) AS us
  FROM events),
d AS (
  SELECT event_type,
    greatest(COALESCE(max(us) OVER (PARTITION BY user_id
      ORDER BY event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - us, 0), 0)
      AS disorder_us
  FROM ev),
per_type AS (
  SELECT event_type,
    CAST(count(*) AS BIGINT) AS n_events,
    CAST(sum(CASE WHEN disorder_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_late,
    CAST(max(disorder_us) AS BIGINT) AS max_disorder_us
  FROM d GROUP BY 1),
ranked AS (
  SELECT event_type, disorder_us,
    row_number() OVER (PARTITION BY event_type ORDER BY disorder_us)
      AS rn
  FROM d WHERE disorder_us > 0),
p99 AS (
  SELECT r.event_type, r.disorder_us AS p99_disorder_us
  FROM per_type t JOIN ranked r
    ON r.event_type = t.event_type
   AND r.rn = (99 * t.n_late + 99) // 100)
SELECT t.event_type, t.n_events, t.n_late, t.max_disorder_us,
  CAST(COALESCE(p.p99_disorder_us, 0) AS BIGINT) AS p99_disorder_us
FROM per_type t LEFT JOIN p99 p ON p.event_type = t.event_type"""



def q_apply_verify(spark, sf_dir):
    """CDC round-trip self-check: APPLY the emitted diff events back
    onto the previous snapshot — deletes anti-joined, updates and
    inserts rebuilt from the STRING payload maps (the exact wire
    format ``CDCEvent`` ships, app/app.py:80-89) — and reconcile the
    result against the new snapshot with a null-safe full-outer
    compare.  Proves the payload round-trip is lossless end to end
    (double/timestamp columns survive the string map) and the diff is
    complete: the oracle states the ground truth (applied == v2,
    zero mismatch/missing/extra) that the rebuild must measure.

    Scale shape: the diff is computed once and localCheckpoint-pinned
    (it feeds four branches); apply is one anti-join plus a
    map-projection union; reconcile is ONE full-outer SMJ on the key
    — the same two-exchange profile as the diff itself.  All output
    counts are aggregates; nothing row-level leaves the plan.
    """
    orders = _t(spark, sf_dir, "orders")
    v1 = fixtures.orders_snapshot_v1(orders)
    v2 = fixtures.orders_snapshot_v2(orders)
    d = cdc_diff.snapshot_diff(v2, v1, "o_orderkey").localCheckpoint(eager=True)

    types = {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp",
        "o_orderpriority": "string",
    }

    def rebuild(events):
        return events.select(
            *[F.col("new_values")[c].cast(t).alias(c) for c, t in types.items()]
        )

    gone = d.filter(F.col("event_type").isin("update", "delete")).select(
        F.col("key_value").alias("__k")
    )
    kept = v1.withColumn(
        "__k", F.col("o_orderkey").cast("string")
    ).join(gone, "__k", "left_anti").drop("__k")
    applied = kept.unionByName(
        rebuild(d.filter(F.col("event_type") == "update"))
    ).unionByName(rebuild(d.filter(F.col("event_type") == "insert")))

    a = applied.alias("a")
    b = v2.alias("b")
    recon = a.join(
        b, F.col("a.o_orderkey").eqNullSafe(F.col("b.o_orderkey")), "full_outer"
    )
    cols = list(types)
    any_diff = F.lit(False)
    for c in cols:
        any_diff = any_diff | ~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
    recon_agg = recon.agg(
        F.count("*").alias("__t"),
        F.sum(
            (
                F.col("a.o_orderkey").isNotNull()
                & F.col("b.o_orderkey").isNotNull()
                & any_diff
            ).cast("bigint")
        ).alias("n_mismatch"),
        F.sum(F.col("a.o_orderkey").isNull().cast("bigint")).alias("n_missing"),
        F.sum(F.col("b.o_orderkey").isNull().cast("bigint")).alias("n_extra"),
    )
    ops = d.agg(
        F.sum((F.col("event_type") == "insert").cast("bigint")).alias("n_insert"),
        F.sum((F.col("event_type") == "update").cast("bigint")).alias("n_update"),
        F.sum((F.col("event_type") == "delete").cast("bigint")).alias("n_delete"),
    )
    sizes = (
        v1.agg(F.count("*").alias("n_v1"))
        .crossJoin(v2.agg(F.count("*").alias("n_v2")))
        .crossJoin(applied.agg(F.count("*").alias("n_applied")))
    )
    return (
        sizes.crossJoin(F.broadcast(ops))
        .crossJoin(F.broadcast(recon_agg))
        .select(
            "n_v1",
            "n_v2",
            "n_insert",
            "n_update",
            "n_delete",
            "n_applied",
            "n_mismatch",
            "n_missing",
            "n_extra",
            (
                (F.col("n_mismatch") == 0)
                & (F.col("n_missing") == 0)
                & (F.col("n_extra") == 0)
            ).alias("reconciled"),
        )
    )


QUERIES["cdc_apply_verify"] = q_apply_verify

ORACLE["cdc_apply_verify"] = _DIFF_CTE + """
, c AS (SELECT
    CAST(sum(CASE WHEN event_type = 'insert' THEN 1 ELSE 0 END) AS BIGINT)
      AS n_insert,
    CAST(sum(CASE WHEN event_type = 'update' THEN 1 ELSE 0 END) AS BIGINT)
      AS n_update,
    CAST(sum(CASE WHEN event_type = 'delete' THEN 1 ELSE 0 END) AS BIGINT)
      AS n_delete
  FROM j)
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM v1) AS n_v1,
  (SELECT CAST(count(*) AS BIGINT) FROM v2) AS n_v2,
  n_insert, n_update, n_delete,
  (SELECT CAST(count(*) AS BIGINT) FROM v2) AS n_applied,
  CAST(0 AS BIGINT) AS n_mismatch,
  CAST(0 AS BIGINT) AS n_missing,
  CAST(0 AS BIGINT) AS n_extra,
  TRUE AS reconciled
FROM c"""


def q_incremental_snapshot(spark, sf_dir):
    """DBLog-style CHUNKED INCREMENTAL SNAPSHOT (Andreakis & 
    Papapanagiotou 2019; the Debezium incremental-snapshot algorithm):
    backfill a table in key chunks WHILE a change stream flows,
    merging per the protocol's watermark rule — a change landing
    BEFORE its key's chunk is read is superseded by the chunk read
    (the capture already sees it), a change landing AFTER is applied
    on top.  Simulated deterministically: the diff events arrive in
    key order, chunk i (keys ``k % 4 == i``) is captured after
    ``(S*i) div 4`` changes, captures rebuild typed rows from the
    string payload maps (the CDCEvent wire format), and the final
    merged table is reconciled against the true v2 snapshot with a
    null-safe full-outer compare — the protocol's exactly-once
    claim, measured not assumed.

    Scale shape: the diff is computed once and checkpoint-pinned;
    chunk membership and cutoffs are arithmetic on the key (no
    per-chunk jobs); capture/apply are anti-joins + map-projection
    unions; reconcile is ONE full-outer SMJ.  Telemetry rows are
    per-chunk aggregates."""
    from cdc_pipe_line_spark.functions import global_row_number

    orders = _t(spark, sf_dir, "orders")
    v1 = fixtures.orders_snapshot_v1(orders)
    v2 = fixtures.orders_snapshot_v2(orders)
    d = cdc_diff.snapshot_diff(v2, v1, "o_orderkey").localCheckpoint(
        eager=True
    )
    ch = d.select(
        "event_type",
        "new_values",
        F.col("key_value").cast("bigint").alias("kv"),
    )
    ch = global_row_number(ch, ["kv"], out_col="seq")
    stot = ch.agg(F.count("*").alias("__S"))
    ch = (
        ch.crossJoin(F.broadcast(stot))
        .withColumn("chunk", F.col("kv") % 4)
        .withColumn("cutoff", F.expr("(__S * chunk) div 4"))
        .withColumn("pre", F.col("seq") <= F.col("cutoff"))
        .localCheckpoint(eager=True)
    )

    types = {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp",
        "o_orderpriority": "string",
    }

    def rebuild(events):
        return events.select(
            *[F.col("new_values")[c].cast(t).alias(c) for c, t in types.items()]
        )

    v1k = v1.withColumn("kv", F.col("o_orderkey"))
    pre = ch.filter(F.col("pre"))
    capture = (
        v1k.join(pre.select("kv"), "kv", "left_anti")
        .drop("kv")
        .unionByName(rebuild(pre.filter(F.col("event_type") != "delete")))
        .withColumn("kv", F.col("o_orderkey"))
        .localCheckpoint(eager=True)
    )
    post = ch.filter(~F.col("pre"))
    final = (
        capture.join(post.select("kv"), "kv", "left_anti")
        .drop("kv")
        .unionByName(rebuild(post.filter(F.col("event_type") != "delete")))
        .localCheckpoint(eager=True)
    )

    a = final.alias("a")
    b = v2.alias("b")
    cols = list(types)
    any_diff = F.lit(False)
    for c in cols:
        any_diff = any_diff | ~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
    recon = (
        a.join(
            b,
            F.col("a.o_orderkey").eqNullSafe(F.col("b.o_orderkey")),
            "full_outer",
        )
        .agg(
            F.sum(
                (
                    F.col("a.o_orderkey").isNotNull()
                    & F.col("b.o_orderkey").isNotNull()
                    & any_diff
                ).cast("bigint")
            ).alias("__mis"),
            F.sum(F.col("a.o_orderkey").isNull().cast("bigint")).alias(
                "__missing"
            ),
            F.sum(F.col("b.o_orderkey").isNull().cast("bigint")).alias(
                "__extra"
            ),
        )
        .crossJoin(
            F.broadcast(
                final.agg(
                    F.count("*").cast("bigint").alias("n_final_total"),
                    F.sum("o_orderkey").cast("bigint").alias(
                        "final_checksum"
                    ),
                )
            )
        )
        .select(
            "n_final_total",
            "final_checksum",
            (
                (F.col("__mis") == 0)
                & (F.col("__missing") == 0)
                & (F.col("__extra") == 0)
            ).alias("reconciled"),
        )
    )

    per_chunk = (
        v1k.groupBy((F.col("kv") % 4).alias("chunk"))
        .agg(F.count("*").cast("bigint").alias("n_keys_v1"))
        .join(
            ch.groupBy("chunk").agg(
                F.max("cutoff").cast("bigint").alias("cutoff_seq"),
                F.sum(F.col("pre").cast("bigint")).alias("n_pre_superseded"),
                F.sum((~F.col("pre")).cast("bigint")).alias(
                    "n_post_applied"
                ),
            ),
            "chunk",
            "left",
        )
        .join(
            capture.groupBy((F.col("kv") % 4).alias("chunk")).agg(
                F.count("*").cast("bigint").alias("n_captured")
            ),
            "chunk",
            "left",
        )
    )
    return per_chunk.crossJoin(F.broadcast(recon)).select(
        F.col("chunk").cast("bigint").alias("chunk"),
        "cutoff_seq",
        "n_keys_v1",
        "n_captured",
        "n_pre_superseded",
        "n_post_applied",
        "n_final_total",
        "final_checksum",
        "reconciled",
    )


QUERIES["cdc_incremental_snapshot"] = q_incremental_snapshot

ORACLE["cdc_incremental_snapshot"] = _DIFF_CTE + """
, chg AS (
  SELECT event_type, CAST(key_value AS BIGINT) AS kv,
    row_number() OVER (ORDER BY CAST(key_value AS BIGINT)) AS seq
  FROM j WHERE event_type IS NOT NULL),
stot AS (SELECT count(*) AS S FROM chg),
chc AS (
  SELECT chg.*, kv % 4 AS chunk, (S * (kv % 4)) // 4 AS cutoff,
    seq <= (S * (kv % 4)) // 4 AS pre
  FROM chg CROSS JOIN stot),
v1k AS (SELECT o_orderkey AS kv FROM v1),
per AS (
  SELECT v.chunk, v.n_keys_v1,
    c.cutoff_seq, c.n_pre_superseded, c.n_post_applied
  FROM (SELECT kv % 4 AS chunk, CAST(count(*) AS BIGINT) AS n_keys_v1
        FROM v1k GROUP BY 1) v
  LEFT JOIN (
    SELECT chunk, CAST(max(cutoff) AS BIGINT) AS cutoff_seq,
      CAST(sum(CASE WHEN pre THEN 1 ELSE 0 END) AS BIGINT)
        AS n_pre_superseded,
      CAST(sum(CASE WHEN pre THEN 0 ELSE 1 END) AS BIGINT)
        AS n_post_applied
    FROM chc GROUP BY 1) c USING (chunk)),
cap AS (
  SELECT per.chunk, per.n_keys_v1
    - COALESCE((SELECT CAST(count(*) AS BIGINT) FROM chc
        WHERE chc.chunk = per.chunk AND pre
          AND event_type IN ('update', 'delete')), 0)
    + COALESCE((SELECT CAST(count(*) AS BIGINT) FROM chc
        WHERE chc.chunk = per.chunk AND pre
          AND event_type IN ('insert', 'update')), 0) AS n_captured
  FROM per)
SELECT per.chunk, per.cutoff_seq, per.n_keys_v1, cap.n_captured,
  per.n_pre_superseded, per.n_post_applied,
  (SELECT CAST(count(*) AS BIGINT) FROM v2) AS n_final_total,
  (SELECT CAST(sum(o_orderkey) AS BIGINT) FROM v2) AS final_checksum,
  TRUE AS reconciled
FROM per JOIN cap USING (chunk)"""
