"""Scalar-function surface (SURVEY.md §2.8 F1-F13) + projection helpers
(§2.2 P1-P3).

All JVM-side Catalyst expressions — no Python UDFs.  Spark 4 runs in
ANSI mode, so the reference's coercing casts (pandas
``to_numeric(errors='coerce')``, azuredatalake.py:209) map to
``try_cast``, which yields null on failure exactly like the reference.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def coerce_double(col: Column | str) -> Column:
    """Numeric coercion with invalid->null (F9; azuredatalake.py:209)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("double")


def sanitize_name(col: Column | str) -> Column:
    """Metric/path-safe name sanitization as a column expression (R8).

    Reference chain (azuredatalake.py:35-40,190-198): space->_, &->and,
    /->_, %->pct, strip parens, collapse other non-alnum to _.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"%", "pct")
    c = F.regexp_replace(c, r"&", "and")
    c = F.regexp_replace(c, r"[()\[\]]", "")
    c = F.regexp_replace(c, r"[^A-Za-z0-9]+", "_")
    return F.regexp_replace(c, r"^_+|_+$", "")


def sanitize_name_py(name: str) -> str:
    """Driver-side twin of :func:`sanitize_name` for column names."""
    s = name.replace("%", "pct").replace("&", "and")
    s = re.sub(r"[()\[\]]", "", s)
    s = re.sub(r"[^A-Za-z0-9]+", "_", s)
    return s.strip("_")


def operational_columns(df: DataFrame, max_fallback: int = 3) -> list[str]:
    """Operational-column selection (P1; azuredatalake.py:236-252):
    ``Date`` plus any column whose lowercased name contains id/code/key;
    if none match, the first ``max_fallback`` columns.
    """
    cols = [
        c
        for c in df.columns
        if c == "Date" or any(tok in c.lower() for tok in ("id", "code", "key"))
    ]
    return cols if cols else list(df.columns)[:max_fallback]


def prune_columns(df: DataFrame, pattern: str = r"Unnamed|\.") -> DataFrame:
    """Drop columns matching a regex (P2; azuredatalake.py:175)."""
    rx = re.compile(pattern)
    return df.drop(*[c for c in df.columns if rx.search(c)])


def metric_columns(df: DataFrame) -> list[str]:
    """Metric columns = names not starting with ``_`` (P3;
    azuredatalake.py:337)."""
    return [c for c in df.columns if not c.startswith("_")]


def drop_all_null(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Drop rows whose (subset) values are all null (P5;
    azuredatalake.py:174,253)."""
    return df.na.drop(how="all", subset=subset)


#: Algebraic aggregates that compose across a salted two-stage plan.
_SALTABLE = {"count", "sum", "min", "max"}


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    *,
    buckets: int = 16,
) -> DataFrame:
    """Skew-safe two-stage aggregation.

    ``aggs`` maps output name -> (function, column) with function in
    ``{count, sum, min, max}`` (the algebraic set — partials merge with
    sum/sum/min/max respectively).  Stage 1 groups by
    ``(group_cols, salt)`` so one hot key spreads over ``buckets``
    reducers; stage 2 merges the partials on ``group_cols`` alone —
    at most ``buckets`` rows per key, so the second shuffle is tiny.

    AQE's skew-join splitting does this automatically for *joins*; for
    aggregations a hot grouping key still funnels into one partial->
    final task chain, which this operator breaks up.  (With floats,
    note the reassociation caveat: sums of doubles change bit patterns
    when regrouped — use decimals or integer-scaled values where exact
    reproducibility matters.)
    """
    unknown = {f for f, _ in aggs.values()} - _SALTABLE
    if unknown:
        raise ValueError(f"non-algebraic aggregate(s) for salting: {sorted(unknown)}")
    salt = F.spark_partition_id() % buckets
    partial_exprs = []
    final_exprs = []
    for out, (fn, col) in aggs.items():
        p = f"__p_{out}"
        partial_exprs.append(getattr(F, fn)(col).alias(p))
        merge_fn = "sum" if fn in ("count", "sum") else fn
        final_exprs.append(getattr(F, merge_fn)(p).alias(out))
    return (
        df.withColumn("__salt", salt)
        .groupBy(*group_cols, "__salt")
        .agg(*partial_exprs)
        .groupBy(*group_cols)
        .agg(*final_exprs)
    )


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    *,
    num_partitions: int | None = None,
    out_col: str = "rn",
) -> DataFrame:
    """Exact global ``row_number`` over a total order WITHOUT the
    ``Exchange SinglePartition`` funnel an unpartitioned Window plans
    — the two-phase distributed rank:

    1. range-repartition on the ordering key (RangePartitioner maps
       ascending key ranges to ascending partition ids), tag each row
       with its partition id;
    2. rank locally within each partition;
    3. add per-partition offsets — a census of at most
       ``num_partitions`` rows (aggregate output), prefix-summed in a
       window over that bounded frame and joined back broadcast.

    Global rank = offset + local rank, independent of where the
    sampled range boundaries land, because ranges are contiguous in
    the total order and the ordering key is expected to be unique
    (pass a tiebreaker column).  Two distributed shuffles replace one
    single-partition sort — the shape that survives a 100 TB corpus.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # The ranged frame feeds BOTH the local-rank branch and the census
    # branch; left unpinned, each branch instantiates its own
    # repartitionByRange job, and RangePartitioner's reservoir-sample
    # seed derives from the RDD id — two jobs, two seeds, boundaries a
    # few keys apart, so census offsets no longer match the pids the
    # local ranks were computed under (duplicate/skipped global ranks;
    # observed live on a 2550-row diff frame).  localCheckpoint pins
    # ONE set of boundaries and partition ids for both branches.
    keyed = (
        df.repartitionByRange(n, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    local = keyed.withColumn(
        "__lrn",
        F.row_number().over(
            Window.partitionBy("__pid").orderBy(
                *[F.col(c).asc() for c in order_cols]
            )
        ),
    )
    census = keyed.groupBy("__pid").agg(F.count("*").alias("__cnt"))
    # bounded frame: one row per partition (<= n rows), so the
    # unpartitioned prefix-sum window is safe by construction
    offsets = census.select(
        "__pid",
        F.coalesce(
            F.sum("__cnt").over(
                Window.orderBy("__pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("__off"),
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__off") + F.col("__lrn")).cast("long"))
        .drop("__pid", "__lrn", "__off")
    )


def global_running_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    *,
    num_partitions: int | None = None,
    out_col: str = "cum_before",
) -> DataFrame:
    """EXCLUSIVE global running sum of ``value_col`` over a total
    order — the cumulative-sum twin of :func:`global_row_number`,
    same two-phase distributed shape (range repartition + per-
    partition local cumsum + broadcast census offsets) instead of the
    ``Exchange SinglePartition`` funnel an unpartitioned window
    plans.  The ranged frame is localCheckpoint-pinned for the same
    reason documented there (one set of RangePartitioner boundaries
    for both branches).  ``order_cols`` must form a total order (pass
    a tiebreaker)."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    keyed = (
        df.repartitionByRange(n, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    local = keyed.withColumn(
        "__lcum",
        F.coalesce(
            F.sum(value_col).over(
                Window.partitionBy("__pid")
                .orderBy(*[F.col(c).asc() for c in order_cols])
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    census = keyed.groupBy("__pid").agg(F.sum(value_col).alias("__psum"))
    # bounded frame: one row per partition, aggregate output — the
    # unpartitioned prefix-sum window is safe by construction
    offsets = census.select(
        "__pid",
        F.coalesce(
            F.sum("__psum").over(
                Window.orderBy("__pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("__off"),
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__off") + F.col("__lcum")).cast("long"))
        .drop("__pid", "__lcum", "__off")
    )


class TokenSpansUDTF:
    """Python user-defined TABLE function (Spark 4 UDTF, SPARK-43798):
    one input string row -> N ``(pos, token, n_chars)`` rows, consumed
    through ``LATERAL`` in SQL.

    This is the governed replacement for the reference's imperative
    row-expansion loops (``app/app.py:160-171`` — ``iterrows`` turning
    each snapshot row into a list of CDCEvent rows): the same
    one-row-to-many-rows Python escape hatch, but planned by Catalyst
    (column-pruned scan below, map-side partial aggregation above) and
    executed Arrow-batched (``ArrowEvalPythonUDTF`` via
    ``udtf(..., useArrow=True)`` at registration — per-function, so no
    session conf leaks; plan-asserted in tests/test_plans.py).  Built-ins still win where they
    can express the op (this particular expansion IS expressible as
    ``posexplode(split(...))``, which the oracle exploits); the UDTF
    surface exists for expansions that are not.
    """

    def eval(self, text: str):  # noqa: D102 — contract method
        if text is None:
            return
        for i, tok in enumerate(text.split(" ")):
            if tok:
                yield i + 1, tok, len(tok)


def register_token_spans(spark) -> None:
    """Register :class:`TokenSpansUDTF` as SQL table function
    ``token_spans`` (idempotent — re-registration replaces)."""
    from pyspark.sql.functions import udtf

    spark.udtf.register(
        "token_spans",
        udtf(
            TokenSpansUDTF,
            returnType="pos int, token string, n_chars int",
            useArrow=True,
        ),
    )
