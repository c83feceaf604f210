"""Snapshot-diff CDC: two table versions -> insert/update/delete events.

Reference semantics (SURVEY.md §2.3; reference app/app.py:119-264):

- the primary key is a single column, compared **as a string**
  (app/app.py:206-207 builds ``{str(row[key]): row}`` dicts);
- inserts = keys only in the new snapshot (app/app.py:210-224);
- updates = keys in both where any shared column differs
  (app/app.py:225-246), with a per-column change map;
- deletes = keys only in the previous snapshot (app/app.py:248-262);
- first load (no previous snapshot) -> every row is an insert
  (app/app.py:156-174);
- NaN is normalized to null before comparison (app/app.py:135), so
  null vs null is NOT a change while null vs value IS.

Spark-first design — scale notes
--------------------------------
The reference does three dict passes on a single host.  A naive Spark
translation would be two anti-joins plus one inner join = the fat
tables shuffled three times.  Instead ``snapshot_diff`` does **one
full-outer join** on the stringified key and classifies each joined row
into insert/update/delete/unchanged, so each snapshot is shuffled
exactly once (or zero times when both sides are bucketed/co-partitioned
on the key).  Change detection uses Spark's null-safe equality
(``<=>``) negated, which reproduces the reference's NaN->null
normalization exactly.  Everything is a Catalyst-planned expression —
no Python UDFs, fully codegen'd, safe at 100 TB.

Row payloads are carried as ``map<string,string>`` (the reference keeps
schemaless dicts — SURVEY.md §1.1) so one event schema serves every
source table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Columns of the canonical diff output (before the event envelope).
DIFF_COLUMNS = ["event_type", "key_value", "old_values", "new_values", "changed_cols"]


def _string_map(prefix_df: str, cols: list[str]) -> Column:
    """``map<string,string>`` of column name -> stringified value.

    Mirrors the reference's ``row.to_dict()`` payloads
    (app/app.py:211-222) while staying a single JVM-side expression.
    """
    pairs: list[Column] = []
    for c in cols:
        pairs.append(F.lit(c))
        pairs.append(F.col(f"{prefix_df}.{c}").cast("string"))
    return F.map_from_arrays(
        F.array(*pairs[::2]), F.array(*pairs[1::2])
    )


def _one_row_per_key(df: DataFrame) -> DataFrame:
    """Collapse duplicate ``__k`` rows to one, deterministically.

    The reference builds ``{str(row[key]): row}`` dicts
    (app/app.py:206-207), so a snapshot with duplicate keys keeps ONE
    row per key.  Dict order there was file order; with no stable row
    order in a distributed frame, the survivor here is the row with
    the largest ``xxhash64(to_json(row))`` — arbitrary but stable.

    The explicit ``repartition("__k")`` BEFORE the aggregate is a
    measured optimization, not a convenience: left to itself, Catalyst
    sinks a partial SortAggregate + Sort BELOW the exchange, so each
    side pays TWO full sorts (pre-shuffle and post-shuffle).  The
    repartition is a barrier the partial aggregate cannot sink under,
    which collapses the plan to one Exchange -> one Sort -> both
    aggregate passes streaming over the sorted run — ~20% faster on
    the whole diff at sf0.1.  The trade is map-side combining: a
    heavily duplicated snapshot shuffles its duplicates instead of
    collapsing them early — acceptable because duplicate keys are the
    guarded EXCEPTION (reference dict semantics), not the common case.
    The partitioning is exactly what the downstream full-outer join
    needs, so the diff stays at one shuffle per side and the join
    reuses the aggregate's sort (asserted in tests/test_plans.py).

    Survivor: plain ``max(struct)`` (lexicographic over fields — cheap
    codegen'd comparison) when every column is orderable; snapshots
    carrying unorderable columns (maps) fall back to
    ``max_by(row, xxhash64(to_json(row)))``.  (A precomputed-hash
    ordering was measured SLOWER than the struct comparator — the
    per-row xxhash64 over all columns costs more than lexicographic
    compares on mostly-first-column-distinct data.)
    """
    from pyspark.sql.types import MapType

    def _orderable(dt) -> bool:
        if isinstance(dt, MapType):
            return False
        if hasattr(dt, "elementType"):  # ArrayType
            return _orderable(dt.elementType)
        if hasattr(dt, "fields"):  # StructType
            return all(_orderable(f.dataType) for f in dt.fields)
        return True

    cols = [c for c in df.columns if c != "__k"]
    row = F.struct(*[F.col(c) for c in cols])
    if all(_orderable(f.dataType) for f in df.schema.fields):
        agg = F.max(row).alias("__row")
    else:
        agg = F.max_by(row, F.xxhash64(F.to_json(row))).alias("__row")
    picked = df.repartition("__k").groupBy("__k").agg(agg)
    return picked.select("__k", *[F.col(f"__row.{c}").alias(c) for c in cols])


def snapshot_diff(
    new_df: DataFrame,
    prev_df: DataFrame | None,
    key_col: str,
    *,
    compare_cols: list[str] | None = None,
    dedup_keys: bool = True,
) -> DataFrame:
    """Diff two snapshots of a keyed table into CDC rows.

    Returns a DataFrame with columns
    ``event_type, key_value, old_values, new_values, changed_cols``
    containing only rows that changed (inserts/updates/deletes —
    unchanged keys are dropped, as in the reference).

    ``prev_df=None`` (or empty-schema) is first-load: all inserts
    (reference app/app.py:156-174).

    ``dedup_keys`` (default on, mirroring the reference's dict
    construction) collapses duplicate keys to one row per side before
    joining.  This is ALSO the skew guard: it makes the full-outer
    join provably 1:1, so no key can explode quadratically — which
    matters because AQE's skew-join optimization cannot split a
    FullOuter join (splitting either side would duplicate the
    unmatched-null rows), so a hot duplicated key would otherwise have
    no runtime rescue.  Pass ``dedup_keys=False`` only when the key is
    known unique and the aggregate must be shaved off.

    Shuffle profile: ONE exchange per side, on ``cast(key as string)``
    — the dedup aggregate partitions on the same key, so the join
    reuses its exchange.  If both inputs are already hash-partitioned
    on the key (e.g. read from a table bucketed by key), Catalyst
    elides the exchanges.
    """
    if key_col not in new_df.columns:
        raise ValueError(
            f"key column {key_col!r} not in new snapshot; "
            f"available: {new_df.columns}"
        )
    if prev_df is None:
        return first_load_events(new_df, key_col)
    if key_col not in prev_df.columns:
        raise ValueError(
            f"key column {key_col!r} not in previous snapshot; "
            f"available: {prev_df.columns}"
        )

    # The reference compares keys as str(row[key]) (app/app.py:206-207),
    # so a Python None key becomes the string 'None' and matches itself.
    # A raw null join key would never match in the full-outer join and
    # the row would fall through to the update branch with null
    # old/new payloads — normalize exactly like str(None).
    key_str = F.coalesce(F.col(key_col).cast("string"), F.lit("None"))
    ndf = new_df.withColumn("__k", key_str)
    pdf = prev_df.withColumn("__k", key_str)
    if dedup_keys:
        ndf = _one_row_per_key(ndf)
        pdf = _one_row_per_key(pdf)
    n = ndf.alias("n")
    p = pdf.alias("p")

    new_cols = [c for c in new_df.columns]
    prev_cols = [c for c in prev_df.columns]
    shared = [c for c in new_cols if c in set(prev_cols) and c != key_col]
    if compare_cols is not None:
        shared = [c for c in shared if c in set(compare_cols)]

    joined = n.join(p, F.col("n.__k") == F.col("p.__k"), "full_outer")

    in_new = F.col("n.__k").isNotNull()
    in_prev = F.col("p.__k").isNotNull()
    # null-safe inequality per shared column = the reference's
    # "normalize NaN to null, then dict-compare" (app/app.py:135,230-232)
    col_changed = [~F.col(f"n.{c}").eqNullSafe(F.col(f"p.{c}")) for c in shared]
    any_change = F.lit(False)
    for cc in col_changed:
        any_change = any_change | cc

    event_type = (
        F.when(in_new & ~in_prev, F.lit("insert"))
        .when(~in_new & in_prev, F.lit("delete"))
        .when(any_change, F.lit("update"))
    )

    changed_cols = F.filter(
        F.array(
            *[F.when(cc, F.lit(c)) for c, cc in zip(shared, col_changed)]
        ),
        lambda x: x.isNotNull(),
    )

    out = joined.select(
        event_type.alias("event_type"),
        F.coalesce(F.col("n.__k"), F.col("p.__k")).alias("key_value"),
        F.when(in_prev, _string_map("p", prev_cols)).alias("old_values"),
        F.when(in_new, _string_map("n", new_cols)).alias("new_values"),
        F.when(
            in_new & in_prev, changed_cols
        ).otherwise(F.lit(None).cast("array<string>")).alias("changed_cols"),
    )
    # unchanged keys (event_type null) are dropped; inserts keep no
    # old_values and deletes no new_values, matching CDCEvent
    # (app/app.py:80-89)
    out = out.filter(F.col("event_type").isNotNull())
    out = out.withColumn(
        "old_values", F.when(F.col("event_type") != "insert", F.col("old_values"))
    ).withColumn(
        "new_values", F.when(F.col("event_type") != "delete", F.col("new_values"))
    )
    return out


def first_load_events(new_df: DataFrame, key_col: str) -> DataFrame:
    """First upload: every row becomes an insert (app/app.py:156-174).

    Narrow (no shuffle): a projection over the scan.
    """
    cols = list(new_df.columns)
    return new_df.select(
        F.lit("insert").alias("event_type"),
        F.coalesce(F.col(key_col).cast("string"), F.lit("None")).alias("key_value"),
        F.lit(None).cast("map<string,string>").alias("old_values"),
        _string_map_self(cols).alias("new_values"),
        F.lit(None).cast("array<string>").alias("changed_cols"),
    )


def _string_map_self(cols: list[str]) -> Column:
    pairs_k = [F.lit(c) for c in cols]
    pairs_v = [F.col(c).cast("string") for c in cols]
    return F.map_from_arrays(F.array(*pairs_k), F.array(*pairs_v))


def to_cdc_events(
    diff: DataFrame,
    *,
    company_id: str,
    table_name: str,
    key_column: str,
    event_time: Column | None = None,
) -> DataFrame:
    """Wrap diff rows in the CDC event envelope.

    Reference ``CDCEvent`` (app/app.py:80-89): ``event_id`` (uuid),
    ``event_type``, ``company_id``, ``table_name``, ``timestamp``,
    ``key_column``, ``key_value``, ``old_values``, ``new_values``.
    ``event_time`` defaults to ``current_timestamp()``; pass a literal
    for reproducible runs.

    The Kafka partition key ``{company}_{table}_{event_type}``
    (app/app.py:275) is exposed as ``partition_key``.
    """
    ts = event_time if event_time is not None else F.current_timestamp()
    return diff.select(
        F.expr("uuid()").alias("event_id"),
        F.col("event_type"),
        F.lit(company_id).alias("company_id"),
        F.lit(table_name).alias("table_name"),
        ts.alias("timestamp"),
        F.lit(key_column).alias("key_column"),
        F.col("key_value"),
        F.col("old_values"),
        F.col("new_values"),
        F.concat_ws(
            "_", F.lit(company_id), F.lit(table_name), F.col("event_type")
        ).alias("partition_key"),
    )


def compact_changelog(
    changes: DataFrame,
    *,
    key_col: str,
    op_col: str = "op",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Net-effect compaction of a CDC change feed (Debezium-style):
    collapse each key's I/U/D history to the single change that has
    the same end effect — insert-then-delete annihilates ('none'),
    insert survives as insert with the LAST payload, delete of a
    pre-existing row stays delete, everything else is one update.
    Run before applying a long changelog to a 100 TB target: the
    merge touches each key once instead of once per change.

    Shape: ONE partial-aggregated groupBy — first/last versions come
    from min/max over (ts, tiebreak, ...) STRUCTS (lexicographic,
    tie-broken, map-side combinable), never a per-key window sort.
    """
    first = F.min(
        F.struct(
            F.col(ts_col).alias("t"),
            F.col(tiebreak_col).alias("k"),
            F.col(op_col).alias("o"),
        )
    )
    last = F.max(
        F.struct(
            F.col(ts_col).alias("t"),
            F.col(tiebreak_col).alias("k"),
            F.col(op_col).alias("o"),
            F.col(value_col).cast("double").alias("v"),
        )
    )
    agg = changes.groupBy(key_col).agg(
        first.alias("__f"),
        last.alias("__l"),
        F.count("*").alias("n_changes"),
    )
    f_op = F.col("__f").getField("o")
    l_op = F.col("__l").getField("o")
    net = (
        F.when((l_op == "D") & (f_op == "I"), "none")
        .when(l_op == "D", "delete")
        .when(f_op == "I", "insert")
        .otherwise("update")
    )
    return agg.select(
        key_col,
        net.alias("net_op"),
        "n_changes",
        f_op.alias("first_op"),
        l_op.alias("last_op"),
        F.round(F.col("__l").getField("v"), 4).alias("last_value"),
        F.unix_micros(F.col("__l").getField("t")).alias("last_ts"),
    )
