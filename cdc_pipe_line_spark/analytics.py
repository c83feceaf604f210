"""Event-analytics operators: cohort retention, gaps-and-islands
streaks, multi-stage funnels, exact distributed heavy hitters, and
mergeable (incrementally-maintainable) rollup state.

These are the query shapes a product-analytics user of the reference
pipeline (events landing via CDC into a warehouse — see
``/root/reference/consumer.py`` event flow and the aggregation views
in ``/root/reference/cdc_data_dump.sql``) runs on the event table
once it is in columnar storage.  All are pure DataFrame compositions
— one declarative plan per operator, no driver-side loops over data —
except the heavy-hitter candidate pass, which is the textbook
two-pass Misra-Gries sketch expressed as a ``mapInPandas`` (Arrow
batches, vectorized ``value_counts``) feeding an exact, broadcast-
filtered recount: the result is EXACT, the sketch only bounds the
candidate set, so the DuckDB oracle stays binding.

Scale notes inline per operator; the common theme is that every
shuffle is on a key the next stage reuses (user_id), so Catalyst
chains the stages without re-exchanging.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


# ------------------------------------------------------------ cohort retention

def cohort_retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort-retention matrix: users grouped by first-active
    week; for each (cohort, week-offset) the surviving user count and
    retention percentage.

    Shape at 100 TB: the raw event scan collapses immediately to the
    distinct (user, week) set — one shuffle over the deduped pairs,
    orders of magnitude smaller than the events themselves.  The
    cohort week is a window-min over ``user_id`` rather than a
    per-user aggregate joined back: the join formulation makes
    Catalyst re-plan (and re-SCAN) the events subtree for each
    reference and broadcast a per-user frame — both wrong at 100M
    users — while the window is one more hash exchange on the already
    deduped pairs and nothing else.  The final matrix is tiny
    (cohorts x offsets).
    """
    wk = F.date_trunc("week", F.col(ts_col)).cast("date")
    user_weeks = (
        events.select(F.col(user_col).alias("user_id"), wk.alias("week"))
        .distinct()
    )
    act = (
        user_weeks.withColumn(
            "cohort_week",
            F.min("week").over(Window.partitionBy("user_id")),
        )
        .groupBy(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
        )
        # user_weeks is distinct, so count(*) IS the distinct-user count
        .agg(F.count("*").alias("n_active"))
    )
    w = Window.partitionBy("cohort_week")
    return (
        act.withColumn(
            "cohort_size",
            F.max(
                F.when(F.col("week_offset") == 0, F.col("n_active"))
            ).over(w),
        )
        .withColumn(
            "retention_pct",
            F.round(F.col("n_active") / F.col("cohort_size") * 100.0, 2),
        )
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_active",
            "cohort_size",
            "retention_pct",
        )
    )


# ------------------------------------------------------- gaps-and-islands

def activity_streaks(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user consecutive-day activity streaks (gaps-and-islands):
    the island anchor is ``day - row_number() days`` — constant within
    a run of consecutive days, so one groupBy recovers every streak.

    Scale: dedup to (user, day) first (the tall event table never
    reaches the window), then the row_number window and both groupBys
    all partition by ``user_id`` — one logical placement of each
    user's days, no driver state, no iteration.
    """
    days = (
        events.select(
            F.col(user_col).alias("user_id"),
            F.date_trunc("day", F.col(ts_col)).cast("date").alias("d"),
        )
        .distinct()
    )
    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy("d")
    )
    streaks = (
        days.withColumn("anchor", F.date_sub("d", rn))
        .groupBy("user_id", "anchor")
        .agg(F.count("*").alias("len"))
    )
    return (
        streaks.groupBy("user_id")
        .agg(
            F.max("len").alias("best_streak"),
            F.count("*").alias("n_streaks"),
            F.sum("len").alias("active_days"),
        )
    )


# ------------------------------------------------------------------- funnel

def funnel(
    events: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered multi-stage funnel: a user converts at stage *i* only
    with an event of that type strictly AFTER their stage *i-1*
    conversion time (first-touch semantics).  Returns one row per
    stage with converted-user counts, conversion % from stage 1, and
    the mean hours from the previous stage.

    Scale: each stage is a per-user min() over a type-filtered slice
    joined back on ``user_id`` — every shuffle in the chain is on the
    same key, so the plan is a sequence of co-partitioned SMJs over
    per-user rows (one row per user after stage 1), never a
    re-shuffle of raw events after the first filter+agg.
    """
    e = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("et"),
        F.col(ts_col).alias("ts"),
    )
    cur = (
        e.filter(F.col("et") == stages[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    per_user = [cur]  # stage i frame: user_id, t1..t{i}
    for i, stage in enumerate(stages[1:], start=2):
        nxt = (
            per_user[-1]
            .join(e.filter(F.col("et") == stage), "user_id")
            .filter(F.col("ts") > F.col(f"t{i - 1}"))
            .groupBy("user_id", *[f"t{j}" for j in range(1, i)])
            .agg(F.min("ts").alias(f"t{i}"))
        )
        per_user.append(nxt)

    # base count rides along as a 1-row broadcast so the whole funnel
    # is ONE declarative plan (no driver-side count action)
    base = per_user[0].agg(F.count("*").alias("__base"))
    rows = []
    for i, (stage, frame) in enumerate(zip(stages, per_user), start=1):
        agg_cols = [F.count("*").alias("n_users")]
        if i > 1:
            secs = F.unix_timestamp(F.col(f"t{i}")) - F.unix_timestamp(
                F.col(f"t{i - 1}")
            )
            agg_cols.append(
                F.round(F.avg(secs) / 3600.0, 4).alias("avg_hours_from_prev")
            )
        else:
            agg_cols.append(
                F.first(F.lit(None).cast("double")).alias(
                    "avg_hours_from_prev"
                )
            )
        summary = (
            frame.agg(*agg_cols)
            .crossJoin(F.broadcast(base))
            .select(
                F.lit(i).alias("stage_idx"),
                F.lit(stage).alias("stage"),
                F.col("n_users"),
                F.round(
                    F.col("n_users") / F.col("__base") * 100.0, 2
                ).alias("conv_pct"),
                F.col("avg_hours_from_prev"),
            )
        )
        rows.append(summary)
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# ------------------------------------------------------------ heavy hitters

def heavy_hitters(
    df: DataFrame,
    key_col: str,
    *,
    support: float = 0.002,
) -> DataFrame:
    """EXACT frequent-item mining in two passes — the only shape that
    works at 100 TB, where a full groupBy on a high-cardinality key
    shuffles the world to find a handful of hot keys.

    Pass 1 (narrow, no shuffle): per-partition Misra-Gries with
    ``k = ceil(2/support)`` counters over Arrow batches.  Any key with
    global frequency >= support*n has, by pigeonhole, local frequency
    >= support*n_p in at least one partition, and MG with k counters
    never evicts a key whose local frequency exceeds n_p/(k+1) —
    support/2 here, so every true heavy hitter survives into the
    candidate set (false positives are fine; they are filtered by the
    recount).  Each partition also emits its row count on a NULL-key
    marker row, so the global n — and hence the threshold — comes out
    of the same single scan.

    Pass 2: broadcast the (tiny) candidate set, semi-join the raw
    table down to candidate rows only, exact count, filter by the
    threshold.  Output is exactly ``SELECT key, count(*) ... HAVING
    count(*) >= ceil(support*n)`` — the oracle runs precisely that.
    """
    k = math.ceil(2.0 / support)
    key_t = dict(df.dtypes)[key_col]

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        n = 0
        for pdf in batches:
            n += len(pdf)
            vc = pdf[key_col].value_counts()
            for key, cnt in vc.items():
                counters[key] = counters.get(key, 0) + int(cnt)
            while len(counters) > k:
                m = min(counters.values())
                counters = {
                    key: c - m for key, c in counters.items() if c > m
                }
        # candidates ship as strings so the sketch frame is key-type
        # agnostic; pass 2 casts back to the source key type
        out = pd.DataFrame(
            {
                "cand": [str(key) for key in counters],
                "part_rows": pd.array(
                    [None] * len(counters), dtype="Int64"
                ),
            }
        )
        marker = pd.DataFrame(
            {
                "cand": pd.array([None], dtype=object),
                "part_rows": pd.array([n], dtype="Int64"),
            }
        )
        yield pd.concat([out, marker], ignore_index=True)

    sketch = df.select(key_col).mapInPandas(
        mg, schema="cand string, part_rows bigint"
    )
    # one driver-bounded materialization: <= n_partitions * (k+1) rows
    sketch = sketch.localCheckpoint(eager=True)
    total = sketch.agg(F.sum("part_rows").alias("n")).collect()[0]["n"]
    threshold = math.ceil(support * total)
    cands = (
        sketch.filter(F.col("cand").isNotNull())
        .select(F.col("cand").cast(key_t).alias(key_col))
        .distinct()
    )
    return (
        df.join(F.broadcast(cands), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= threshold)
    )


# ----------------------------------------------- mergeable rollup state

ROLLUP_STATE = [
    "n_events",
    "sum_value",
    "min_value",
    "max_value",
]


def rollup_partial(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """One ingest batch's partial aggregate state per (day, type).

    Every statistic is an algebraic merge function (count/sum are
    re-summable, min/max re-minimizable; avg derives from sum/count
    at read time), so maintaining the daily rollup over a 100 TB
    history costs one scan of the NEW batch plus a merge over the
    (tiny) existing state — never a re-scan of history.  This is the
    batch twin of the streaming continuous aggregate
    (``streaming.run_windowed_counts``).
    """
    return (
        events.groupBy(
            F.date_trunc("day", F.col(ts_col)).cast("date").alias("day"),
            F.col(type_col).alias("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )


def rollup_merge(*partials: DataFrame) -> DataFrame:
    """Merge partial rollup states; bit-equal semantics to a full
    recompute up to double-summation order (absorbed by read-time
    rounding, exactly as cross-engine sums already are)."""
    out = partials[0]
    for p in partials[1:]:
        out = out.unionByName(p)
    return (
        out.groupBy("day", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )


def rollup_read(state: DataFrame) -> DataFrame:
    """Read-time view over rollup state: rounded sums + derived avg.

    The avg divides the ROUNDED sum (not the raw one): partial-merge
    order perturbs the raw double sum by an ulp, and an unrounded
    numerator can sit exactly on a 4-decimal rounding boundary; the
    2-decimal-rounded sum is the value the engine publishes (and the
    oracle matches), so deriving from it keeps read-time stats
    bit-identical across merge orders and engines.  The quotient is
    deliberately NOT re-rounded: IEEE division of identical inputs is
    bit-deterministic, while a final round() reintroduces tie
    divergence (Spark rounds the shortest-decimal rendering via
    BigDecimal — 38.37875 -> 38.3788 — where engines rounding the
    binary value get .3787)."""
    return state.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "event_type",
        "n_events",
        F.round("sum_value", 2).alias("sum_value"),
        F.round("min_value", 4).alias("min_value"),
        F.round("max_value", 4).alias("max_value"),
        (F.round("sum_value", 2) / F.col("n_events")).alias("avg_value"),
    )


# ------------------------------------------------------------------ pagerank

def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list — the iterative-
    algorithm shape (influence / hubness scoring over a similarity or
    reference graph) Spark expresses as an unrolled chain of
    join+aggregate plans.

    Semantics: ``r_{t+1}(v) = (1-d)/N + d * sum_{u->v} r_t(u)/deg(u)``
    with dangling nodes holding the teleport term (their mass leaks —
    the convention that keeps both engines' arithmetic identical).

    Scale: edges, the vertex set and the degree table are computed
    ONCE and pinned (each iteration references them; unpinned, Catalyst
    re-plans — and re-scans — the upstream per reference).  Each
    iteration is one shuffle on ``src`` (contribution join) and one on
    the vertex id (inflow aggregate + left join back to vertices);
    rank frames chain iteration-to-iteration without duplication, so
    plan depth is linear in ``n_iter``.  On a cluster, long runs want
    a persist+checkpoint cadence instead of localCheckpoint (executor-
    loss recompute); at the fixed 3-iteration analytics shape the
    pinned frames are one-row-per-node/edge and bounded.
    """
    edges = edges.select(
        F.col(src).alias("__src"), F.col(dst).alias("__dst")
    ).localCheckpoint(eager=True)
    verts = (
        edges.select(F.col("__src").alias("node"))
        .union(edges.select(F.col("__dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        edges.groupBy("__src").agg(F.count("*").alias("__outdeg"))
        .localCheckpoint(eager=True)
    )
    n = verts.agg(F.count("*").alias("__n"))
    teleport = 1.0 - damping
    ranks = verts.crossJoin(F.broadcast(n)).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    for _ in range(n_iter):
        contrib = (
            edges.join(
                ranks.select(F.col("node").alias("__src"), "rank"), "__src"
            )
            .join(deg, "__src")
            .select(
                F.col("__dst").alias("node"),
                (F.col("rank") / F.col("__outdeg")).alias("__c"),
            )
        )
        inflow = contrib.groupBy("node").agg(F.sum("__c").alias("__inflow"))
        ranks = (
            verts.join(inflow, "node", "left")
            .crossJoin(F.broadcast(n))
            .select(
                "node",
                (
                    F.lit(teleport) / F.col("__n")
                    + F.lit(damping)
                    * F.coalesce(F.col("__inflow"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks


# ----------------------------------------------------------- attribution

def last_touch_attribution(
    events: DataFrame,
    *,
    target: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Last-touch attribution: each conversion event credits the
    user's most recent PRIOR non-conversion event type (the
    "channel"); conversions with no prior touch fall into
    ``__none__``.  One window pass over user_id — the as-of-join
    shape without a join (the same table carries both sides).

    Scale: a single hash exchange on ``user_id`` + per-user sort (the
    window), then a tiny aggregate over |channels| rows.  No self
    join, no per-user arrays.
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, order_tiebreak)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    attributed = events.withColumn(
        "__channel",
        F.last(
            F.when(F.col(type_col) != target, F.col(type_col)),
            ignorenulls=True,
        ).over(w),
    )
    counts = (
        attributed.filter(F.col(type_col) == target)
        .groupBy(
            F.coalesce("__channel", F.lit("__none__")).alias("channel")
        )
        .agg(F.count("*").alias("n_conversions"))
    )
    total = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return counts.select(
        "channel",
        "n_conversions",
        F.round(
            F.col("n_conversions")
            / F.sum("n_conversions").over(total)
            * 100.0,
            2,
        ).alias("share_pct"),
    )


# ------------------------------------------------------------ journey paths

def session_paths(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    gap: str = "30 minutes",
    max_len: int = 5,
    top: int = 15,
) -> DataFrame:
    """Top user-journey paths: events sessionized by inactivity gap,
    each session rendered as its first ``max_len`` event types joined
    by '>', ranked by session count — the "how do users actually move
    through the product" query.

    Every window here orders by (ts, tiebreak): gap-based
    sessionization itself is tie-insensitive (equal timestamps never
    exceed the gap), but the PATH string is order-sensitive, and
    unbroken timestamp ties would make it nondeterministic in any
    engine.  Scale: one hash exchange on the user (sessionize window
    + per-session collect ride the same partitioning), then a tiny
    aggregate over distinct paths; per-session arrays are bounded by
    the session length (and truncated to ``max_len`` for the key).
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    gap_expr = F.expr(f"INTERVAL {gap}")
    prev = F.lag(ts_col).over(w)
    sess = (
        events.withColumn(
            "__new",
            F.when(prev.isNull() | (F.col(ts_col) > prev + gap_expr), 1)
            .otherwise(0),
        )
        .withColumn(
            "__sess",
            F.sum("__new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    paths = sess.groupBy(user_col, "__sess").agg(
        F.concat_ws(
            ">",
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col(ts_col).alias("t"),
                                F.col(tiebreak_col).alias("k"),
                                F.col(type_col).alias("e"),
                            )
                        )
                    ),
                    lambda s: s["e"],
                ),
                1,
                max_len,
            ),
        ).alias("path")
    )
    ranked = (
        paths.groupBy("path")
        .agg(
            F.count("*").alias("n_sessions"),
            F.count_distinct(user_col).alias("n_users"),
        )
        .withColumn(
            "pos",
            F.row_number().over(
                Window.orderBy(F.col("n_sessions").desc(), F.col("path").asc())
            ),
        )
        .filter(F.col("pos") <= top)
    )
    return ranked


def triangle_count(edges: DataFrame, *, a: str = "a", b: str = "b") -> DataFrame:
    """Exact triangle enumeration over an undirected edge list given
    in canonical orientation (``a < b``, deduplicated).

    The classic degeneracy trick is built into the orientation: every
    triangle {x, y, z} with x < y < z is found exactly once as edge
    (x,y) closed by z in N+(x) ∩ N+(y), so no triangle is counted 6x
    and no post-hoc division is needed.

    Enumeration is ADJACENCY-INTERSECTION, not wedge-materialization:
    out-neighbor lists are packed per vertex (one vocabulary-sized
    aggregate), each edge joins its two endpoint lists, and the
    closing vertices come from one ``array_intersect``.  The wedge
    formulation (self-join on the middle vertex + closure semi-join)
    shuffles one ROW per wedge — measured 53.9 s on 12M edges /
    493M wedges at sf1; this shape ships the same elements packed in
    arrays (one row per edge) and runs the intersection inside
    codegen: **6.8 s, identical 18,844,880 triangles** (BENCH_NOTES
    round 7).  Array sizes are bounded by the max out-degree under
    the a < b orientation (the celebrity-vertex mitigation); a graph
    with pathological residual skew would split its top-degree
    vertices back through the wedge path.

    Returns the closed triangles, one row per (x, y, z).
    """
    e = edges.select(F.col(a).alias("a"), F.col(b).alias("b"))
    adj = e.groupBy("a").agg(F.collect_list("b").alias("__nbrs"))
    return (
        e.join(
            adj.select(F.col("a"), F.col("__nbrs").alias("__na")), "a"
        )
        .join(
            adj.select(
                F.col("a").alias("b"), F.col("__nbrs").alias("__nb")
            ),
            "b",
        )
        .select(
            F.col("a").alias("x"),
            F.col("b").alias("y"),
            F.explode(F.array_intersect("__na", "__nb")).alias("z"),
        )
    )


def khop_reach(
    edges: DataFrame | None,
    seed,
    *,
    src: str = "src",
    dst: str = "dst",
    k: int = 3,
    adjacency: DataFrame | None = None,
    skew_buckets: int = 16,
) -> DataFrame:
    """Breadth-first k-hop reachability from ``seed`` over a directed
    edge list: returns ``(node, hop)`` with the MINIMUM hop count
    (<= k) at which each node is first reached (seed itself = hop 0).

    Shape: the edge list is packed ONCE into an adjacency table
    (``collect_set`` per source — dedups parallel edges in the same
    exchange), then k rounds of frontier-join + anti-join dedup — each
    round joins the (tiny, broadcastable) frontier against the
    NODE-count-sized adjacency table instead of re-scanning the
    edge-count-sized list, explodes only the matched neighbor sets,
    and pins the new frontier so Catalyst doesn't replay the chain
    (lineage depth stays linear, plan reuse via localCheckpoint like
    :func:`pagerank`).  The oracle replays this as a bounded
    RECURSIVE CTE.

    ``seed=None`` seeds from the minimum source node (a one-row
    driver scalar off the pinned adjacency — the documented bounded
    tiny-reduce pattern), which lets callers avoid deriving the seed
    from the un-pinned edge subtree (measured: a seed derived from
    the pair-build lineage re-ran the whole edge materialization a
    second time).

    ``adjacency``: a prebuilt ``(__s, __nbrs: array)`` neighbor table
    (duplicates inside ``__nbrs`` allowed AND multiple rows per source
    allowed — rounds dedup after the explode); callers that can
    produce neighbor ARRAYS directly (e.g. per-group co-occurrence)
    shuffle group-count rows instead of edge-count rows (measured
    2.5 → 1.9 s on the co-occurrence build at sf0.1).

    ``skew_buckets`` (optimization r15, guide §2.5): the built-in edge
    packing salts its ``collect_set`` by ``pmod(xxhash64(dst), B)``,
    so a hub node's neighbor set lands in up to B bounded ROWS instead
    of one row holding the entire set — at 100 TB one celebrity vertex
    otherwise concentrates a multi-GB array (and its whole aggregation
    state) in a single task.  The salt key is derived from the DATA
    (deterministic, never rand() — retried map tasks must re-produce
    the same assignment), rides the same single exchange (still
    join-free), and the union of a node's rows is the identical
    neighbor set; the BFS rounds' explode+distinct already dedup
    across rows.
    """
    adj = (
        edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
        .groupBy(
            "__s",
            F.pmod(F.xxhash64("__d"), F.lit(skew_buckets)).alias("__b"),
        )
        .agg(F.collect_set("__d").alias("__nbrs"))
        .drop("__b")
        if adjacency is None
        else adjacency
    ).localCheckpoint(eager=True)
    if seed is None:
        seed = adj.agg(F.min("__s")).first()[0]
        if seed is None:  # empty adjacency: no edges -> nothing reached
            return adj.sparkSession.createDataFrame(
                [], "node bigint, hop bigint"
            )
    seed_df = (
        adj.sparkSession.createDataFrame([(seed, 0)], ["node", "hop"])
        if not isinstance(seed, DataFrame)
        else seed.localCheckpoint(eager=True)
    )
    # visited is kept as the UNION of per-round checkpointed
    # frontiers, never re-materialized: checkpointing the accumulated
    # set each round costs O(rounds x |visited|) storage passes
    # (measured: it dominated this operator's bench cost at sf0.1),
    # while a union of <= k+1 already-pinned frames is free to build
    # and keeps lineage depth constant.  The anti-join below scans
    # that union — the same rows, one pass, no re-pin.
    frames = [seed_df]
    frontier = seed_df
    for hop in range(1, k + 1):
        visited = frames[0]
        for fr in frames[1:]:
            visited = visited.unionByName(fr)
        new = (
            frontier.join(adj, frontier["node"] == adj["__s"])
            .select(F.explode("__nbrs").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .withColumn("hop", F.lit(hop))
            .localCheckpoint(eager=True)
        )
        frames.append(new)
        frontier = new
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


def markov_transitions(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence: P(next state | current state), with a synthetic
    ``_start`` state for each user's first event.  ONE window pass
    (lag over (ts, tiebreak)) + one aggregate; probabilities are
    n / row-total, rounded 6dp.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    trans = events.select(
        F.coalesce(F.lag(type_col).over(w), F.lit("_start")).alias("src"),
        F.col(type_col).alias("dst"),
    )
    counts = trans.groupBy("src", "dst").agg(F.count("*").alias("n"))
    wt = Window.partitionBy("src")
    return counts.select(
        "src",
        "dst",
        "n",
        # floor round-half-up, not round(): k/total can land exactly
        # on a 6dp tie boundary (e.g. total=128 -> 7dp ending in 5)
        # where Spark and DuckDB round() disagree
        (
            F.floor(
                F.col("n") / F.sum("n").over(wt).cast("double")
                * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("p"),
    )


def kcore_peel(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    k: int,
    rounds: int,
    a: str = "a",
    b: str = "b",
) -> tuple[DataFrame, bool]:
    """k-core decomposition by SIMULTANEOUS peeling (Batagelj &
    Zaversnik's iterative degree-prune, the distributed formulation):
    each round drops every still-active node whose degree among
    active nodes is below ``k``, for at most ``rounds`` rounds so the
    result is engine-replayable round for round.  The loop
    early-exits at the fixpoint — output-identical to running the
    full budget, because a round that removes nothing changes
    nothing (the SQL replay unrolls the full budget; its tail stages
    are the same no-ops).

    Returns ``(removed, converged)``: one row ``(node,
    removed_round)`` per peeled node, and whether the peel reached
    its fixpoint inside the budget.

    Scale shape: the edge list is localCheckpoint-pinned ONCE and
    never re-materialized — each round recomputes live degrees as
    two semi-joins of the ORIGINAL edges against the current active
    set plus one hash-aggregate, and only the small active/removed
    node frames are re-pinned per round (the khop lineage
    discipline).  An earlier draft checkpointed the shrunken edge
    list every round; that is O(rounds x |E|) materialization and
    soaked 7.4x on 10x data — this shape re-soaks linear.
    """
    active = nodes.select(F.col(nodes.columns[0]).alias("node")).distinct()
    active = active.localCheckpoint(eager=True)
    e0 = edges.select(F.col(a).alias("a"), F.col(b).alias("b"))
    e0 = e0.localCheckpoint(eager=True)
    removed_parts = []
    converged = False
    for r in range(1, rounds + 1):
        live = e0.join(
            active.select(F.col("node").alias("a")), "a", "semi"
        ).join(active.select(F.col("node").alias("b")), "b", "semi")
        deg = (
            live.select(F.col("a").alias("node"))
            .unionAll(live.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("__c"))
        )
        rm = (
            active.join(deg, "node", "left")
            .filter(F.coalesce(F.col("__c"), F.lit(0)) < k)
            .select("node")
            .localCheckpoint(eager=True)
        )
        removed_parts.append(
            rm.select("node", F.lit(r).cast("bigint").alias("removed_round"))
        )
        if len(removed_parts) >= 8:
            # deep peels: fold the per-round union every 8 rounds so
            # the removed-lineage plan depth stays bounded instead of
            # growing linearly in rounds (VERDICT r8 item 7)
            folded = removed_parts[0]
            for part in removed_parts[1:]:
                folded = folded.unionByName(part)
            removed_parts = [folded.localCheckpoint(eager=True)]
        if rm.isEmpty():
            converged = True
            break
        active = active.join(rm, "node", "left_anti").localCheckpoint(eager=True)
    else:
        # full budget used: converged iff the LAST round removed
        # nothing (checked above only on early exit).
        converged = False
    removed = removed_parts[0]
    for part in removed_parts[1:]:
        removed = removed.unionByName(part)
    return removed, converged


def functional_scc(
    f_df: DataFrame,
    *,
    rounds: int,
    node: str = "node",
    nxt: str = "nxt",
    n_nodes: int | None = None,
) -> DataFrame:
    """SCC decomposition of a FUNCTIONAL graph (every node has
    out-degree exactly 1 — the rho-shaped structure of hash chains,
    ``random(x) = f(x)`` iteration, linked-list next-pointers) by
    PARALLEL POINTER DOUBLING: after round r each node carries
    ``jump = f^(2^r)(node)`` and ``mn = min over its next 2^r
    trajectory nodes``.  With ``2^rounds >= n``:

    - a node is ON a cycle iff it is in the image of ``f^(2^rounds)``
      (every tail has been consumed — any value of the iterated map
      lies on a cycle, and every cycle node is hit by rotating the
      cycle backwards);
    - a cycle node's SCC id is its ``mn`` (the window covers at least
      one full cycle), and every non-cycle node is its own singleton
      SCC — exactly the SCC decomposition, since a functional graph's
      only non-trivial SCCs are its cycles.

    Returns ``(node, on_cycle, scc_id)``.

    Scale shape: ``rounds = ceil(log2 n)`` shuffle self-joins of the
    n-row pointer table (each round re-pinned so lineage stays flat),
    never an O(n)-step sequential walk — the khop/kcore iteration
    discipline applied to parallel prefix.

    Pass ``n_nodes`` whenever the caller knows the node count: the
    correctness precondition ``2^rounds >= n`` is then ENFORCED
    instead of assumed (ADVICE r9 / VERDICT r10 item 3 — a truncated
    doubling silently mislabels cycle membership, and an oracle that
    replays the same truncated budget cannot catch it).  Extra rounds
    past the threshold are output-identical (``mn`` has saturated on
    every cycle and the iterated image is already the cycle set), so
    derive ``rounds`` generously."""
    if n_nodes is not None and (1 << rounds) < n_nodes:
        raise ValueError(
            f"functional_scc needs 2^rounds >= n_nodes for correct "
            f"cycle classification: 2^{rounds} < {n_nodes} — raise "
            f"rounds to at least {max(1, (n_nodes - 1)).bit_length()}"
        )
    state = f_df.select(
        F.col(node).alias("node"),
        F.col(nxt).alias("jump"),
        F.col(node).alias("mn"),
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        hop = state.select(
            F.col("node").alias("__j"),
            F.col("jump").alias("__jump2"),
            F.col("mn").alias("__mn2"),
        )
        state = (
            state.join(hop, F.col("jump") == F.col("__j"))
            .select(
                "node",
                F.col("__jump2").alias("jump"),
                F.least("mn", "__mn2").alias("mn"),
            )
            .localCheckpoint(eager=True)
        )
    img = state.select(F.col("jump").alias("node")).distinct().withColumn(
        "__on", F.lit(True)
    )
    return state.join(img, "node", "left").select(
        "node",
        F.coalesce("__on", F.lit(False)).alias("on_cycle"),
        F.when(F.col("__on"), F.col("mn"))
        .otherwise(F.col("node"))
        .alias("scc_id"),
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Personalized PageRank: teleport mass restarts at the SEED set
    only (``e(v) = 1/|S|`` on seeds, 0 elsewhere), so rank measures
    proximity to the seeds — the recommendation/expansion twin of the
    global ``pagerank`` above, same float discipline (double-pinned
    arithmetic, ranks comparable after 8dp rounding).

    Scale shape: identical to ``pagerank`` — per iteration one join
    of the edge list against the rank vector and one hash-aggregate;
    the seed/teleport vector is vocabulary-sized and computed once.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    verts = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count("*").alias("__outdeg"))
    s = seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
    ns = s.agg(F.count("*").alias("__ns"))
    base = (
        verts.join(s.withColumn("__s", F.lit(1)), "node", "left")
        .crossJoin(F.broadcast(ns))
        .select(
            "node",
            F.when(
                F.col("__s").isNotNull(), F.lit(1.0) / F.col("__ns")
            )
            .otherwise(F.lit(0.0))
            .alias("__e"),
        )
        .localCheckpoint(eager=True)
    )
    teleport = 1.0 - damping
    ranks = base.select("node", F.col("__e").alias("rank"))
    for _ in range(n_iter):
        inflow = (
            e.join(ranks.select(F.col("node").alias("src"), "rank"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("__outdeg")).alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__inflow"))
        )
        ranks = base.join(inflow, "node", "left").select(
            "node",
            (
                F.lit(teleport) * F.col("__e")
                + F.lit(damping)
                * F.coalesce(F.col("__inflow"), F.lit(0.0))
            ).alias("rank"),
        )
    return ranks
