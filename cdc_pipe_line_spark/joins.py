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

    A pair of intervals can co-bucket in SEVERAL shared cells; the
    duplicate candidates are eliminated ARITHMETICALLY instead of with
    a distinct: an overlapping pair's shared cells are exactly
    ``[cell(max(l.lo, r.lo)) .. cell(min(l.hi, r.hi))]``, so keeping
    only the match whose join cell equals ``cell(greatest(l.lo,
    r.lo))`` emits each pair exactly once.  That removes BOTH the
    dedup shuffle an id-based dropDuplicates costs and the
    retry-nondeterminism of ``monotonically_increasing_id`` under
    task re-execution (an earlier draft used ids; round-9 rewrite).

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
    l = left.withColumn(
        "__cell", F.explode(F.sequence(cell(F.col(left_lo)), cell(F.col(left_hi))))
    )
    r = right.withColumn(
        "__cell", F.explode(F.sequence(cell(F.col(right_lo)), cell(F.col(right_hi))))
    )
    return (
        l.join(r, "__cell")
        .filter(
            (F.col(left_lo) < F.col(right_hi))
            & (F.col(right_lo) < F.col(left_hi))
            & (
                F.col("__cell")
                == cell(F.greatest(F.col(left_lo), F.col(right_lo)))
            )
        )
        .drop("__cell")
    )


def bloom_filter_build(
    keys: DataFrame,
    key_col: str,
    *,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Build a Bloom-filter bitmap over ``keys[key_col]`` as a pure
    DataFrame aggregation (public construction: Bloom 1970; Spark's
    own runtime row-level filter, SPARK-32268, builds the same bitmap
    inside the optimizer).

    Each key sets ``num_hashes`` bits at positions
    ``pmod(xxhash64(key, seed), num_bits)``.  Bits explode to
    (word_index, bit_mask) entries, ``bit_or`` collapses them per
    64-bit word — ONE shuffle whose cardinality is at most
    ``num_bits / 64`` words regardless of key count — and the words
    assemble into a single-row ``map<int, bigint>`` (absent word ==
    0, so the map stays sparse when few bits are set).

    Returns a one-row DataFrame with column ``bloom``; broadcast it
    into :func:`bloom_prefilter`.  At 1M bits the bitmap is <=128 KiB
    — broadcastable at any dim cardinality, with FPP ~ (1 - e^{-kn/m})^k.
    """
    # shiftleft's Python wrapper only takes a literal shift count, so
    # the per-seed (word_index, bit_mask) struct is built as a SQL
    # expression (same Catalyst tree either way).
    pos = "pmod(xxhash64(`{k}`, {s}), {m})"
    entry = (
        "struct(cast(" + pos + " div 64 as int) as widx, "
        "shiftleft(1L, cast(" + pos + " % 64 as int)) as mask)"
    )
    entries = keys.select(
        F.explode(
            F.array(
                *[
                    F.expr(entry.format(k=key_col, s=s, m=num_bits))
                    for s in range(num_hashes)
                ]
            )
        ).alias("e")
    )
    words = entries.groupBy(F.col("e.widx").alias("widx")).agg(
        F.bit_or("e.mask").alias("word")
    )
    return words.agg(
        F.map_from_entries(
            F.collect_list(F.struct("widx", "word"))
        ).alias("bloom")
    )


def bloom_prefilter(
    fact: DataFrame,
    bloom: DataFrame,
    key_col: str,
    *,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Filter ``fact`` to rows whose ``key_col`` MIGHT be in the key
    set behind ``bloom`` (built with the same ``num_bits`` /
    ``num_hashes`` by :func:`bloom_filter_build`).

    No false negatives: every true match survives, so
    ``bloom_prefilter(fact, ...).join(dim, key)`` equals
    ``fact.join(dim, key)`` exactly — the filter only sheds
    guaranteed-non-matching rows BEFORE the join's shuffle, which at
    100 TB is the difference between shuffling the whole fact table
    and shuffling the ~matching slice.  Spark's optimizer injects
    this automatically when its thresholds line up
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``); this
    explicit form covers the shapes the optimizer misses — filters
    derived from a different stage, pre-aggregation before the join,
    or a reusable filter applied to several facts.

    The membership test is whole-stage-codegen'd column arithmetic:
    map lookup + shift + mask per hash, AND-folded.
    """
    # Collision-safe probe alias: a fact table that already carries a
    # column literally named "bloom" must neither turn ambiguous nor
    # lose its own column to the final drop (ADVICE r7).
    probe = F.broadcast(bloom.select(F.col("bloom").alias("__bloom_filter")))
    # try_element_at: a missing word means no bit in that word was
    # ever set -> treat as 0 (plain element_at throws under ANSI).
    pos = "pmod(xxhash64(`{k}`, {s}), {m})"
    test = (
        "(shiftrightunsigned(coalesce(try_element_at(`__bloom_filter`, cast("
        + pos
        + " div 64 as int)), 0L), cast("
        + pos
        + " % 64 as int)) & 1L) = 1L"
    )
    keep = F.lit(True)
    for s in range(num_hashes):
        keep = keep & F.expr(test.format(k=key_col, s=s, m=num_bits))
    return fact.crossJoin(probe).filter(keep).drop("__bloom_filter")
