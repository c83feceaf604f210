"""Join-family operators beyond Catalyst's equi-join surface.

SURVEY.md §2.3 notes the engine exposes the join family the reference
never had (anti/semi are in the query pack; sort-merge/broadcast
selection is Catalyst's).  This module adds the non-equi patterns that
need *shaping* to scale:

- interval/range join: naively a BroadcastNestedLoopJoin (fine when
  one side broadcasts, O(n*m) when neither does).  The scale shape is
  bucketing: overlay a fixed grid, expand each interval to the grid
  cells it covers, equi-join on the cell, then exact-filter.  Work
  becomes O(n + m * cells_per_interval) with a plain shuffle join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(
    fact: DataFrame,
    intervals: DataFrame,
    *,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Join ``fact`` rows to every interval with
    ``lo <= value < hi`` via grid bucketing.

    Each interval explodes to ``ceil((hi-lo)/bucket_width)+1`` grid
    cells; facts map to exactly one cell — so the equi-join shuffles
    both sides once on the cell id and the exact range predicate only
    filters co-bucketed candidates.  Pick ``bucket_width`` near the
    median interval width (cells_per_interval ~ 2).

    Catalyst alternative: leave it as a broadcast NLJ when
    ``intervals`` is small — this function is for when it isn't.
    """
    cell = lambda c: F.floor(c / F.lit(bucket_width)).cast("bigint")  # noqa: E731
    f = fact.withColumn("__cell", cell(F.col(value_col)))
    iv = intervals.withColumn(
        "__cell",
        F.explode(
            F.sequence(cell(F.col(lo_col)), cell(F.col(hi_col)))
        ),
    )
    return (
        f.join(iv, "__cell")
        .filter(
            (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
        )
        .drop("__cell")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
) -> DataFrame:
    """Interval-overlap join (both sides are ranges): overlap iff
    ``l.lo < r.hi AND r.lo < l.hi``.  Same grid trick, both sides
    exploded.

    A pair of intervals can co-bucket in SEVERAL shared cells, so the
    equi-join emits duplicate candidate pairs.  They are deduplicated
    on per-side surrogate row ids assigned *before* the explode —
    deduping on the value columns would also collapse legitimately
    identical input rows and change pair multiplicity vs a true
    overlap join.

    ``left`` and ``right`` column names must be disjoint (the output
    carries both sides'), enforced up front.
    """
    dup = sorted(set(left.columns) & set(right.columns))
    if dup:
        raise ValueError(
            f"interval_overlap_join requires disjoint column names; "
            f"shared: {dup}. Rename one side before joining."
        )
    cell = lambda c: F.floor(c / F.lit(bucket_width)).cast("bigint")  # noqa: E731
    l = left.withColumn("__lid", F.monotonically_increasing_id()).withColumn(
        "__cell", F.explode(F.sequence(cell(F.col(left_lo)), cell(F.col(left_hi))))
    )
    r = right.withColumn("__rid", F.monotonically_increasing_id()).withColumn(
        "__cell", F.explode(F.sequence(cell(F.col(right_lo)), cell(F.col(right_hi))))
    )
    joined = (
        l.join(r, "__cell")
        .drop("__cell")
        .dropDuplicates(["__lid", "__rid"])
        .drop("__lid", "__rid")
    )
    return joined.filter(
        (F.col(left_lo) < F.col(right_hi)) & (F.col(right_lo) < F.col(left_hi))
    )
