"""SCD Type-2 temporal tables, Spark-first.

Reference semantics (SURVEY.md §2.3 J6-J10; consumer.py:152-197,
deltaprocessing.py:77-101): each applied insert/update **expires** the
key's current row (``is_current=false, valid_to=ts``) and **inserts** a
new version (``valid_from=ts, is_current=true``); a delete only
expires.  Events are idempotent on ``event_id`` (consumer.py:128-149).
The current state is the ``is_current`` filter
(deltaprocessing.py:119); point-in-time reads use the validity
interval (J10).

Scale design
------------
The reference issued ONE Delta ``UPDATE`` + ONE append **per event**
(1.4-19 s per row — BASELINE.md).  Here a whole batch of events is
applied in a constant number of distributed ops:

1. dedup events on ``event_id`` (aggregate, one shuffle);
2. per-key version chaining with a window (``lead(ts)``) — one
   shuffle on ``key_value``, which AQE coalesces;
3. one join of existing history against the touched-key set to expire
   current rows (broadcast when the batch is small — the common case).

With Delta available this maps to the canonical two-phase ``MERGE``;
on plain parquet the result is written back partitioned by a stable
key hash bucket, so rewrites touch only affected partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Canonical SCD2 history schema (payload is map<string,string>, as in diff.py).
SCD2_COLUMNS = [
    "key_value",
    "data",
    "valid_from",
    "valid_to",
    "is_current",
    "_event_id",
    "_event_type",
]


def dedup_events(events: DataFrame, *, order_cols: list[str] | None = None) -> DataFrame:
    """Idempotent replay: keep exactly one row per ``event_id``.

    The reference relied on ``ON CONFLICT (event_id) DO NOTHING``
    (consumer.py:128-149).  Deterministic here: the first row by
    ``order_cols`` (default: ``timestamp``) wins — unlike
    ``dropDuplicates`` whose survivor is partition-order dependent.
    """
    order_cols = order_cols or ["timestamp"]
    w = Window.partitionBy("event_id").orderBy(*[F.col(c).asc_nulls_last() for c in order_cols])
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_scd2(
    history: DataFrame | None,
    events: DataFrame,
    *,
    ts_col: str = "timestamp",
    payload_col: str = "new_values",
) -> DataFrame:
    """Apply a batch of CDC events to an SCD2 history -> new history.

    ``events`` needs ``event_id, event_type, key_value, <ts_col>,
    <payload_col>``.  ``history=None`` starts an empty table.

    Within a batch, multiple events per key chain correctly: each
    insert/update opens a version whose ``valid_to`` is the next
    event's timestamp for that key (delete closes the chain), so the
    invariants hold regardless of batch size — at most one current row
    per key, contiguous validity intervals (SURVEY.md §5 golden
    invariants; consumer.py:152-197).

    Replay safety (the reference's ``ON CONFLICT (event_id) DO
    NOTHING``, consumer.py:128-149) has two layers: within the batch,
    :func:`dedup_events`; across batches, events whose ``event_id``
    already exists in ``history._event_id`` are anti-joined away, so
    re-applying an already-applied batch is a no-op instead of
    duplicating versions.  The anti-join is one equi-join against the
    history's id column — in the streaming path the history side is
    only the touched buckets, so it stays proportional to the batch.
    """
    required = {"event_id", "event_type", "key_value", ts_col, payload_col}
    missing = required - set(events.columns)
    if missing:
        raise ValueError(
            f"events missing required column(s) {sorted(missing)}; "
            f"available: {events.columns}"
        )
    ev = filter_applied_events(dedup_events(events, order_cols=[ts_col]), history)
    new_versions = chain_new_versions(ev, ts_col=ts_col, payload_col=payload_col)

    if history is None:
        return new_versions

    # Expire previously-current rows for touched keys at the key's
    # first event timestamp in this batch.  The touched-key set is
    # usually tiny vs. history -> broadcast it (AQE also detects this).
    first_ts = first_event_ts(ev, ts_col=ts_col)
    expired = (
        history.join(F.broadcast(first_ts), "key_value", "left")
        .withColumn(
            "valid_to",
            F.when(
                F.col("is_current") & F.col("__first_ts").isNotNull(),
                F.col("__first_ts"),
            ).otherwise(F.col("valid_to")),
        )
        .withColumn(
            "is_current",
            F.when(F.col("__first_ts").isNotNull(), F.lit(False)).otherwise(
                F.col("is_current")
            ),
        )
        .drop("__first_ts")
    )
    return expired.unionByName(new_versions)


def filter_applied_events(ev: DataFrame, history: DataFrame | None) -> DataFrame:
    """Cross-batch replay guard: drop events whose ``event_id`` already
    produced a version in ``history`` (ON CONFLICT DO NOTHING)."""
    if history is None:
        return ev
    applied_ids = (
        history.select(F.col("_event_id").alias("event_id"))
        .where(F.col("event_id").isNotNull())
        .distinct()
    )
    return ev.join(applied_ids, "event_id", "left_anti")


def chain_new_versions(
    ev: DataFrame, *, ts_col: str = "timestamp", payload_col: str = "new_values"
) -> DataFrame:
    """Within-batch version chaining: each insert/update opens a
    version whose ``valid_to`` is the key's next event timestamp (one
    window shuffle on the key)."""
    w_key = Window.partitionBy("key_value").orderBy(F.col(ts_col).asc())
    chained = ev.withColumn("__next_ts", F.lead(F.col(ts_col)).over(w_key))
    return chained.filter(F.col("event_type").isin("insert", "update")).select(
        F.col("key_value"),
        F.col(payload_col).alias("data"),
        F.col(ts_col).alias("valid_from"),
        F.col("__next_ts").alias("valid_to"),
        F.col("__next_ts").isNull().alias("is_current"),
        F.col("event_id").alias("_event_id"),
        F.col("event_type").alias("_event_type"),
    )


def first_event_ts(ev: DataFrame, *, ts_col: str = "timestamp") -> DataFrame:
    """Per-key first event timestamp of a batch (the expire boundary)."""
    return ev.groupBy("key_value").agg(F.min(F.col(ts_col)).alias("__first_ts"))


def scd2_from_upserts(
    upserts: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Build an SCD2 history directly from an upsert stream.

    Every row of ``upserts`` is treated as a full-row upsert of
    ``key_col`` at ``ts_col`` (the reference's consumer treats each
    Kafka event exactly this way).  One window shuffle on the key.
    Deterministic tie-break: equal timestamps order by all value
    columns.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc_nulls_first() for c in value_cols]
    w = Window.partitionBy(key_col).orderBy(*order)
    return upserts.select(
        F.col(key_col).cast("string").alias("key_value"),
        *[F.col(c) for c in value_cols],
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def current_view(history: DataFrame) -> DataFrame:
    """Current-state view: ``is_current`` filter (deltaprocessing.py:119).

    Narrow op; at rest, materialize as the reference did
    (deltaprocessing.py:112-128) or keep virtual.
    """
    return history.filter(F.col("is_current"))


def as_of(history: DataFrame, at: Column | str) -> DataFrame:
    """Point-in-time (temporal) read over the validity interval (J10).

    ``valid_from <= at AND (valid_to IS NULL OR at < valid_to)`` —
    both predicates push down to the scan.
    """
    at_col = F.lit(at) if isinstance(at, str) else at
    return history.filter(
        (F.col("valid_from") <= at_col)
        & (F.col("valid_to").isNull() | (at_col < F.col("valid_to")))
    )


def scd2_from_snapshots(
    snapshots: list[tuple[str, DataFrame]],
    key_col: str,
    *,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Fold an ordered list of ``(timestamp, snapshot)`` into history.

    Convenience composition of snapshot_diff + apply_scd2 for backfills
    (the reference replayed snapshots through Kafka one file at a
    time).

    Iterative folds grow the logical plan multiplicatively (each step
    embeds the previous diff+apply), and Catalyst/codegen compile time
    quickly dwarfs execution — the classic iterative-algorithm trap.
    ``localCheckpoint`` truncates lineage every ``checkpoint_every``
    steps (0 disables; production backfills writing each step to a
    table don't need it).
    """
    from cdc_pipe_line_spark.cdc.diff import snapshot_diff, to_cdc_events

    history: DataFrame | None = None
    prev: DataFrame | None = None
    for i, (ts, snap) in enumerate(snapshots):
        diff = snapshot_diff(snap, prev, key_col)
        events = to_cdc_events(
            diff,
            company_id="-",
            table_name="-",
            key_column=key_col,
            event_time=F.lit(ts).cast("timestamp"),
        )
        history = apply_scd2(history, events)
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            history = history.localCheckpoint(eager=False)
        prev = snap
    assert history is not None, "need at least one snapshot"
    return history
