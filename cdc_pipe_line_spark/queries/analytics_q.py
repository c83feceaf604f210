"""Event-analytics query pack: cohort retention, streaks, funnel,
exact heavy hitters, incremental rollup maintenance — the dashboards
a consumer of the reference's CDC event feed builds once events land
columnar (cf. ``/root/reference/cdc_data_dump.sql`` aggregation
views).  Every query is oracle-checked (rows + schema + value hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_pipe_line_spark.analytics import (
    activity_streaks,
    cohort_retention,
    funnel,
    heavy_hitters,
    rollup_merge,
    rollup_partial,
    rollup_read,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from cdc_pipe_line_spark.queries import load_table

    return load_table(spark, sf_dir, name)


def q_cohort_retention(spark, sf_dir):
    """Weekly cohort-retention matrix over the event stream."""
    return cohort_retention(_t(spark, sf_dir, "events"))


def q_activity_streaks(spark, sf_dir):
    """Per-user consecutive-day streaks (gaps-and-islands)."""
    return activity_streaks(_t(spark, sf_dir, "events"))


def q_funnel_stages(spark, sf_dir):
    """view -> click -> purchase first-touch funnel."""
    return funnel(_t(spark, sf_dir, "events"))


def q_heavy_hitters(spark, sf_dir):
    """Exact frequent users via two-pass Misra-Gries + recount.

    support=0.0005 so the query returns real rows at the driver's
    correctness scales; the MG counter budget (k=4000 per partition)
    exceeds the fixture's user cardinality, making the candidate set
    provably complete at ANY partitioning — the recount is exact, so
    the plain SQL HAVING oracle is binding."""
    return heavy_hitters(
        _t(spark, sf_dir, "events"), "user_id", support=0.0005
    )


def q_incremental_rollup(spark, sf_dir):
    """Incremental-view-maintenance shape: three ingest batches'
    partial rollup states merged, then read — proven equal to a full
    recompute by the oracle (which IS the full recompute)."""
    ev = _t(spark, sf_dir, "events")
    parts = [
        rollup_partial(ev.filter(F.col("event_id") % 3 == i))
        for i in range(3)
    ]
    return rollup_read(rollup_merge(*parts))


QUERIES = {
    "agg_cohort_retention": q_cohort_retention,
    "ts_activity_streaks": q_activity_streaks,
    "agg_funnel_stages": q_funnel_stages,
    "agg_heavy_hitters": q_heavy_hitters,
    "agg_incremental_rollup": q_incremental_rollup,
}

ORACLE = {
    "agg_cohort_retention": """
WITH uw AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
  FROM events),
co AS (SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY 1),
act AS (
  SELECT cohort_week,
    CAST(date_diff('day', cohort_week, week) // 7 AS INT) AS week_offset,
    count(*) AS n_active
  FROM uw JOIN co USING (user_id) GROUP BY 1, 2)
SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week, week_offset,
  n_active,
  max(CASE WHEN week_offset = 0 THEN n_active END)
    OVER (PARTITION BY cohort_week) AS cohort_size,
  round(n_active / (max(CASE WHEN week_offset = 0 THEN n_active END)
    OVER (PARTITION BY cohort_week)) * 100.0, 2) AS retention_pct
FROM act""",
    "ts_activity_streaks": """
WITH days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
  FROM events),
isl AS (
  SELECT user_id, d,
    d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INT)
      AS anchor
  FROM days),
st AS (SELECT user_id, anchor, count(*) AS len FROM isl GROUP BY 1, 2)
SELECT user_id, max(len) AS best_streak, count(*) AS n_streaks,
  CAST(sum(len) AS BIGINT) AS active_days
FROM st GROUP BY user_id""",
    "agg_funnel_stages": """
WITH e AS (SELECT user_id, event_type AS et, ts FROM events),
s1 AS (SELECT user_id, min(ts) AS t1 FROM e WHERE et = 'view' GROUP BY 1),
s2 AS (
  SELECT s1.user_id, t1, min(ts) AS t2
  FROM s1 JOIN e ON e.user_id = s1.user_id
    AND e.et = 'click' AND e.ts > s1.t1
  GROUP BY 1, 2),
s3 AS (
  SELECT s2.user_id, t2, min(ts) AS t3
  FROM s2 JOIN e ON e.user_id = s2.user_id
    AND e.et = 'purchase' AND e.ts > s2.t2
  GROUP BY 1, 2)
SELECT 1 AS stage_idx, 'view' AS stage, count(*) AS n_users,
  round(count(*) / (SELECT count(*) FROM s1) * 100.0, 2) AS conv_pct,
  CAST(NULL AS DOUBLE) AS avg_hours_from_prev
FROM s1
UNION ALL
SELECT 2, 'click', count(*),
  round(count(*) / (SELECT count(*) FROM s1) * 100.0, 2),
  round(avg(date_diff('second', t1, t2)) / 3600.0, 4)
FROM s2
UNION ALL
SELECT 3, 'purchase', count(*),
  round(count(*) / (SELECT count(*) FROM s1) * 100.0, 2),
  round(avg(date_diff('second', t2, t3)) / 3600.0, 4)
FROM s3""",
    "agg_heavy_hitters": """
SELECT user_id, count(*) AS n FROM events GROUP BY user_id
HAVING count(*) >=
  CAST(ceil(0.0005 * (SELECT count(*) FROM events)) AS BIGINT)""",
    "agg_incremental_rollup": """
SELECT strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m-%d') AS day,
  event_type, count(*) AS n_events,
  round(sum(value), 2) AS sum_value,
  round(min(value), 4) AS min_value,
  round(max(value), 4) AS max_value,
  round(sum(value), 2) / count(*) AS avg_value
FROM events GROUP BY 1, 2""",
}


def q_pagerank_sources(spark, sf_dir):
    """3-iteration PageRank over the bipartite doc <-> source graph
    (hubness of content sources): the iterative-algorithm shape,
    fully replayed by the oracle as three unrolled SQL iterations.
    All double arithmetic is CAST-pinned on the DuckDB side (its bare
    decimal literals are DECIMAL, not DOUBLE) so ranks match
    bit-for-bit after the 8-decimal output rounding."""
    from pyspark.sql.window import Window

    from cdc_pipe_line_spark.analytics import pagerank

    docs = _t(spark, sf_dir, "documents")
    fwd = docs.select(
        F.concat(F.lit("d:"), F.col("doc_id").cast("string")).alias("src"),
        F.concat(F.lit("s:"), F.col("source")).alias("dst"),
    )
    edges = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    pr = pagerank(edges, n_iter=3, damping=0.85)
    top = (
        pr.select("node", F.round("rank", 8).alias("rank"))
        .orderBy(F.col("rank").desc(), F.col("node").asc())
        .limit(20)
    )
    w = Window.orderBy(F.col("rank").desc(), F.col("node").asc())
    return top.withColumn("pos", F.row_number().over(w))


def q_attribution_last_touch(spark, sf_dir):
    """Last-touch channel attribution of purchases — the as-of shape
    as ONE window pass (no self-join)."""
    from cdc_pipe_line_spark.analytics import last_touch_attribution

    return last_touch_attribution(_t(spark, sf_dir, "events"))


QUERIES["graph_pagerank_sources"] = q_pagerank_sources
QUERIES["agg_attribution_last_touch"] = q_attribution_last_touch

_PR_STEP = """
SELECT v.node,
  (1 - d) / nn + d * coalesce(s.inflow, CAST(0.0 AS DOUBLE)) AS rank
FROM verts v CROSS JOIN n CROSS JOIN params LEFT JOIN (
  SELECT e.dst AS node, sum(r.rank / d2.outdeg) AS inflow
  FROM edges e JOIN {prev} r ON e.src = r.node
  JOIN deg d2 ON e.src = d2.src
  GROUP BY 1) s ON v.node = s.node"""

ORACLE["graph_pagerank_sources"] = f"""
WITH params AS (SELECT CAST(0.85 AS DOUBLE) AS d),
fwd AS (
  SELECT 'd:' || CAST(doc_id AS VARCHAR) AS src, 's:' || source AS dst
  FROM documents),
edges AS (SELECT src, dst FROM fwd UNION ALL SELECT dst, src FROM fwd),
verts AS (SELECT DISTINCT node FROM (
  SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
n AS (SELECT count(*) AS nn FROM verts),
r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn AS rank
       FROM verts CROSS JOIN n),
r1 AS ({_PR_STEP.format(prev='r0')}),
r2 AS ({_PR_STEP.format(prev='r1')}),
r3 AS ({_PR_STEP.format(prev='r2')}),
top AS (
  SELECT node, round(rank, 8) AS rank FROM r3
  ORDER BY round(rank, 8) DESC, node ASC LIMIT 20)
SELECT node, rank,
  CAST(row_number() OVER (ORDER BY rank DESC, node ASC) AS INT) AS pos
FROM top"""

ORACLE["agg_attribution_last_touch"] = """
WITH a AS (
  SELECT event_type,
    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
      IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
  FROM events),
g AS (
  SELECT coalesce(channel, '__none__') AS channel,
    count(*) AS n_conversions
  FROM a WHERE event_type = 'purchase' GROUP BY 1)
SELECT channel, n_conversions,
  round(n_conversions / (CAST(sum(n_conversions) OVER () AS BIGINT))
    * 100.0, 2) AS share_pct
FROM g"""


def q_session_paths(spark, sf_dir):
    """Top-15 five-step session paths over the event stream (30-min
    gap); tie-broken by (ts, event_id) everywhere so the path strings
    are engine-deterministic."""
    from cdc_pipe_line_spark.analytics import session_paths

    return session_paths(_t(spark, sf_dir, "events"))


QUERIES["reshape_session_paths"] = q_session_paths

ORACLE["reshape_session_paths"] = """
WITH x AS (
  SELECT user_id, ts, event_id, event_type,
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
p AS (
  SELECT user_id, sess,
    array_to_string(list(event_type ORDER BY ts, event_id)[1:5], '>')
      AS path
  FROM s GROUP BY 1, 2),
r AS (
  SELECT path, count(*) AS n_sessions,
    count(DISTINCT user_id) AS n_users
  FROM p GROUP BY 1)
SELECT path, n_sessions, n_users,
  CAST(row_number() OVER (ORDER BY n_sessions DESC, path ASC) AS INT)
    AS pos
FROM r QUALIFY pos <= 15"""


def q_ab_test_lift(spark, sf_dir):
    """A/B experiment readout: users hash-split 50/50 (md5-derived,
    deterministic and SQL-replayable), conversion = any purchase;
    emits per-variant rates, absolute lift, and the two-proportion
    pooled z statistic with a significance flag.  All inputs are
    exact integers, so the float pipeline is identical arithmetic in
    both engines (rounded at 6/4dp).  One per-user aggregate, then a
    2-row rollup."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    )
    variant = F.when(
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
            16, 10,
        ).cast("bigint")
        % 100
        < 50,
        "A",
    ).otherwise("B")
    v = per_user.withColumn("variant", variant)
    counts = v.groupBy("variant").agg(
        F.count("*").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_converted"),
    )
    a = counts.filter("variant = 'A'").select(
        F.col("n_users").alias("na"), F.col("n_converted").alias("ca")
    )
    b = counts.filter("variant = 'B'").select(
        F.col("n_users").alias("nb"), F.col("n_converted").alias("cb")
    )
    j = a.crossJoin(b)
    pa = F.col("ca") / F.col("na")
    pb = F.col("cb") / F.col("nb")
    pool = (F.col("ca") + F.col("cb")) / (F.col("na") + F.col("nb"))
    # pool can be exactly 0 or 1 (nobody / everybody converts — the
    # degenerate experiment); the z denominator is then 0 and ANSI
    # mode raises.  NULL z with significant=false is the honest read.
    denom = F.sqrt(
        pool * (1 - pool) * (1.0 / F.col("na") + 1.0 / F.col("nb"))
    )
    z = F.when(denom > 0, (pb - pa) / denom)
    return j.select(
        "na", "ca", "nb", "cb",
        F.round(pa, 6).alias("rate_a"),
        F.round(pb, 6).alias("rate_b"),
        F.round(pb - pa, 6).alias("lift_abs"),
        F.round(z, 4).alias("z_stat"),
        F.coalesce(F.abs(z) > 1.96, F.lit(False)).alias("significant_95"),
    )


QUERIES["agg_ab_test_lift"] = q_ab_test_lift

ORACLE["agg_ab_test_lift"] = """
WITH per_user AS (
  SELECT user_id,
    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY 1),
v AS (
  SELECT *, CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
      1, 8)) AS UBIGINT) % 100 < 50 THEN 'A' ELSE 'B' END AS variant
  FROM per_user),
c AS (
  SELECT variant, count(*) AS n_users,
    CAST(sum(converted) AS BIGINT) AS n_converted
  FROM v GROUP BY 1),
j AS (
  SELECT a.n_users AS na, a.n_converted AS ca,
         b.n_users AS nb, b.n_converted AS cb
  FROM (SELECT * FROM c WHERE variant = 'A') a
  CROSS JOIN (SELECT * FROM c WHERE variant = 'B') b)
SELECT na, ca, nb, cb,
  round(ca / na, 6) AS rate_a,
  round(cb / nb, 6) AS rate_b,
  round(cb / nb - ca / na, 6) AS lift_abs,
  round(CASE WHEN denom > 0 THEN (cb / nb - ca / na) / denom END, 4)
    AS z_stat,
  coalesce(abs(CASE WHEN denom > 0 THEN (cb / nb - ca / na) / denom END)
           > 1.96, FALSE) AS significant_95
FROM (
  SELECT *, sqrt(((ca + cb) / (na + nb)) * (1 - (ca + cb) / (na + nb))
           * (1.0 / na + 1.0 / nb)) AS denom
  FROM j)"""


def q_session_duration_stats(spark, sf_dir):
    """Session-length distribution (exact percentiles): 30-min-gap
    sessions -> per-session duration/event-count -> one summary row.
    Spark percentile() and DuckDB quantile_cont are both exact
    interpolated quantiles over integer seconds, so the distribution
    stats bind without tolerance."""
    ev = _t(spark, sf_dir, "events")
    from pyspark.sql.window import Window

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
        .agg(
            (
                F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))
            ).alias("dur_us"),
            F.count("*").alias("n_ev"),
        )
    )
    return sess.agg(
        F.count("*").alias("n_sessions"),
        F.round(F.expr("percentile(dur_us, 0.5)") / 1e6, 4).alias(
            "median_dur_s"
        ),
        F.round(F.expr("percentile(dur_us, 0.9)") / 1e6, 4).alias(
            "p90_dur_s"
        ),
        F.round(F.avg("n_ev"), 6).alias("avg_events_per_session"),
        F.max("n_ev").alias("max_events"),
    )


QUERIES["ts_session_duration_stats"] = q_session_duration_stats

ORACLE["ts_session_duration_stats"] = """
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
  SELECT user_id, sess,
    epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us,
    count(*) AS n_ev
  FROM s GROUP BY 1, 2)
SELECT count(*) AS n_sessions,
  round(quantile_cont(dur_us, 0.5) / 1e6, 4) AS median_dur_s,
  round(quantile_cont(dur_us, 0.9) / 1e6, 4) AS p90_dur_s,
  round(avg(n_ev), 6) AS avg_events_per_session,
  CAST(max(n_ev) AS BIGINT) AS max_events
FROM per"""


def q_triangle_parts(spark, sf_dir):
    """Triangle census over the part co-occurrence graph (parts
    appearing in the same order are connected): total triangles /
    edges / nodes plus the top-10 parts by triangle participation —
    the clustering-structure probe of a similarity or co-purchase
    graph.  Edges are canonically oriented (a < b) so each triangle
    is found exactly once (degeneracy orientation — bounds the wedge
    fanout by the smaller endpoint's degree, the skew mitigation);
    the basket->pairs fanout is bounded by per-order line counts
    (TPC-H: <= 7 lines/order -> <= 21 pairs).  The co-occurrence
    projection is pinned once (localCheckpoint) because three
    consumers reference it; unpinned, Catalyst would re-scan lineitem
    per reference."""
    from pyspark.sql.window import Window

    from cdc_pipe_line_spark.analytics import triangle_count

    li = _t(spark, sf_dir, "lineitem")
    # op feeds both sides of the pair self-join — pin it so lineitem
    # is scanned once, not twice
    op = (
        li.select("l_orderkey", F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    pairs = (
        op.alias("x")
        .join(op.alias("y"), "l_orderkey")
        .filter(F.col("x.p") < F.col("y.p"))
        .select(F.col("x.p").alias("a"), F.col("y.p").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    tri = triangle_count(pairs).localCheckpoint(eager=True)
    null_pos = F.lit(None).cast("int")
    s_tri = tri.agg(F.count("*").alias("v")).select(
        F.lit("summary").alias("probe"), F.lit("triangles").alias("k"),
        F.col("v"), null_pos.alias("pos"),
    )
    s_edge = pairs.agg(F.count("*").alias("v")).select(
        F.lit("summary").alias("probe"), F.lit("edges").alias("k"),
        F.col("v"), null_pos.alias("pos"),
    )
    nodes = pairs.select(F.col("a").alias("n")).union(
        pairs.select("b")
    ).distinct()
    s_node = nodes.agg(F.count("*").alias("v")).select(
        F.lit("summary").alias("probe"), F.lit("nodes").alias("k"),
        F.col("v"), null_pos.alias("pos"),
    )
    member = tri.select(
        F.explode(F.array("x", "y", "z")).alias("node")
    ).groupBy("node").agg(F.count("*").alias("v"))
    top = (
        member.withColumn(
            "pos",
            F.row_number().over(
                Window.orderBy(F.col("v").desc(), F.col("node").asc())
            ),
        )
        .filter(F.col("pos") <= 10)
        .select(
            F.lit("top").alias("probe"),
            F.col("node").cast("string").alias("k"),
            "v",
            "pos",
        )
    )
    return s_tri.unionByName(s_edge).unionByName(s_node).unionByName(top)


def q_khop_reach(spark, sf_dir):
    """3-hop BFS reachability from the smallest part id over the
    undirected co-occurrence graph: nodes first reached at each hop.
    The iterative frontier-expansion shape (k bounded rounds, each
    shuffling only the frontier); the oracle replays it as a bounded
    RECURSIVE CTE.

    Edge build (optimization r14): ONE ``collect_set`` aggregate packs
    each order's distinct parts, and the directed co-occurrence pairs
    come from an in-array nested transform — identical edge SET to the
    previous distinct-projection + self-join + distinct chain
    (oracle-verified), but with zero joins and one fewer shuffle; the
    cross-order dedup rides the adjacency ``collect_set`` inside
    :func:`khop_reach` instead of paying its own exchange.  The seed
    (global min co-occurring part = min ``src``, since every node
    appears as a source in the undirected edge list) is derived inside
    khop_reach off the pinned adjacency — deriving it from the pair
    lineage re-ran the whole edge build a second time (measured
    0.76 s of the old 6.7 s at sf0.1)."""
    from cdc_pipe_line_spark.analytics import khop_reach

    li = _t(spark, sf_dir, "lineitem")
    sets = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("ps")
    )
    # one (src, per-order-neighbors) row per part occurrence — the
    # adjacency groupBy then shuffles ~order-count array rows, not
    # ~edge-count pair rows (measured 2.5 -> 1.9 s for the build)
    per_order = (
        sets.filter(F.size("ps") >= 2)
        .select(
            F.explode(
                F.transform(
                    "ps",
                    lambda x: F.struct(
                        x.alias("__s"),
                        F.filter(
                            F.col("ps"), lambda y: y != x
                        ).alias("nb"),
                    ),
                )
            ).alias("e")
        )
        .select("e.__s", "e.nb")
    )
    # Skew posture (optimization r15, VERDICT r14 item 4): the hub-row
    # hazard (one node concentrating a giant neighbor array) CANNOT
    # materialize on this graph family — per-key degree is bounded by
    # the data model (<= 7 parts per order, ~constant appearances per
    # part), and the sf1 soak measured max degree EXACTLY 222 at both
    # sf0.1 and sf1 (10x nodes, same degree distribution; evidence in
    # OPTIMIZATION_r15.md).  A salted multi-row aggregate was built,
    # verified edge-identical, and measured: it costs ~0.5 s locally
    # (weakened cross-order dedup: 20k -> 269k adjacency rows) for a
    # hazard this query cannot hit, so the UNSALTED single-exchange
    # aggregate stays.  Arbitrary graphs get the guard inside
    # :func:`khop_reach` (``skew_buckets``), whose generic edge path
    # salts its collect_set by default.
    adj = per_order.groupBy("__s").agg(
        F.array_distinct(F.flatten(F.collect_list("nb"))).alias("__nbrs")
    )
    reached = khop_reach(None, None, k=3, adjacency=adj)
    return reached.groupBy("hop").agg(F.count("*").alias("n_reached"))


def q_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences (with a ``_start`` state): the behavioral-model shape
    behind next-event prediction and anomaly scoring."""
    from cdc_pipe_line_spark.analytics import markov_transitions

    return markov_transitions(_t(spark, sf_dir, "events"))


QUERIES["graph_triangle_parts"] = q_triangle_parts
QUERIES["graph_khop_reach"] = q_khop_reach
QUERIES["reshape_markov_transitions"] = q_markov_transitions

_COOC_SQL = """
op AS (SELECT DISTINCT l_orderkey, l_partkey AS p FROM lineitem),
e AS (
  SELECT DISTINCT x.p AS a, y.p AS b
  FROM op x JOIN op y USING (l_orderkey) WHERE x.p < y.p)"""

ORACLE["graph_triangle_parts"] = f"""
WITH {_COOC_SQL},
tri AS (
  -- plain hash join, not correlated EXISTS (edges are distinct, so
  -- the inner join is exactly the closure semi-join — and orders of
  -- magnitude faster on a dense graph)
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e1.b = e2.a
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
member AS (
  SELECT node, count(*) AS v FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri) GROUP BY 1),
top AS (
  SELECT 'top' AS probe, CAST(node AS VARCHAR) AS k,
    CAST(v AS BIGINT) AS v,
    CAST(row_number() OVER (ORDER BY v DESC, node ASC) AS INT) AS pos
  FROM member QUALIFY pos <= 10)
SELECT 'summary' AS probe, 'triangles' AS k, CAST(count(*) AS BIGINT)
  AS v, CAST(NULL AS INT) AS pos FROM tri
UNION ALL
SELECT 'summary', 'edges', CAST(count(*) AS BIGINT), NULL FROM e
UNION ALL
SELECT 'summary', 'nodes', CAST(count(*) AS BIGINT), NULL FROM (
  SELECT DISTINCT n FROM (
    SELECT a AS n FROM e UNION ALL SELECT b FROM e))
UNION ALL
SELECT probe, k, v, pos FROM top"""

ORACLE["graph_khop_reach"] = f"""
WITH RECURSIVE {_COOC_SQL},
und AS (
  SELECT a AS s, b AS d FROM e UNION ALL SELECT b, a FROM e),
r AS (
  SELECT (SELECT min(a) FROM e) AS node, 0 AS hop
  UNION
  SELECT u.d, r.hop + 1 FROM r JOIN und u ON u.s = r.node
  WHERE r.hop < 3)
SELECT hop, count(*) AS n_reached FROM (
  SELECT node, min(hop) AS hop FROM r GROUP BY 1)
GROUP BY 1"""

ORACLE["reshape_markov_transitions"] = """
WITH t AS (
  SELECT coalesce(lag(event_type) OVER (
      PARTITION BY user_id ORDER BY ts ASC, event_id ASC), '_start')
    AS src, event_type AS dst
  FROM events),
c AS (SELECT src, dst, count(*) AS n FROM t GROUP BY 1, 2)
SELECT src, dst, n,
  floor(CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY src)
    AS DOUBLE) * 1000000 + 0.5) / 1000000 AS p
FROM c"""


def q_market_basket(spark, sf_dir):
    """Association rules (support / confidence / lift) over per-user
    event-type baskets — the market-basket shape.  The basket table
    collapses to distinct (user, item) FIRST (one shuffle, orders of
    magnitude smaller than raw events); the pair join is bounded by
    items-per-user (<= 5 types here; capped by basket width in
    general).  Ratios floor-rounded (k/n tie boundaries)."""
    ev = _t(spark, sf_dir, "events")
    # ONE scan: per-user basket via collect_set, then pairs from the
    # sorted array in-expression (a self-join formulation would scan
    # and shuffle events twice — the frame-self-join trap).  Pinned
    # because three consumers derive from it.
    b = (
        ev.groupBy("user_id")
        .agg(F.array_sort(F.collect_set("event_type")).alias("items"))
        .localCheckpoint(eager=True)
    )
    n_users = b.agg(F.count("*").alias("n_users"))
    item = (
        b.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count("*").alias("n_item"))
    )
    pair_expr = F.expr(
        "flatten(transform(items, (x, i) ->"
        " transform(slice(items, i + 2, size(items)),"
        " y -> struct(x AS a, y AS b))))"
    )
    pairs = (
        b.select(F.explode(pair_expr).alias("pr"))
        .groupBy(F.col("pr.a").alias("a"), F.col("pr.b").alias("b"))
        .agg(F.count("*").alias("n_ab"))
    )
    rules = pairs.select("a", "b", "n_ab").unionByName(
        pairs.select(
            F.col("b").alias("a"), F.col("a").alias("b"), "n_ab"
        )
    )
    fl = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000
    out = (
        rules.join(
            F.broadcast(item.withColumnRenamed("item", "a")), "a"
        )
        .withColumnRenamed("n_item", "n_a")
        .join(
            F.broadcast(
                item.select(
                    F.col("item").alias("b"),
                    F.col("n_item").alias("n_b"),
                )
            ),
            "b",
        )
        .crossJoin(F.broadcast(n_users))
    )
    conf = F.col("n_ab") / F.col("n_a").cast("double")
    supp = F.col("n_ab") / F.col("n_users").cast("double")
    p_b = F.col("n_b") / F.col("n_users").cast("double")
    return out.select(
        F.col("a").alias("antecedent"),
        F.col("b").alias("consequent"),
        "n_ab",
        fl(supp).alias("support"),
        fl(conf).alias("confidence"),
        fl(conf / p_b).alias("lift"),
    )


def q_rfm_segments(spark, sf_dir):
    """RFM (recency / frequency / monetary) customer segmentation:
    per-user purchase recency vs the global anchor, purchase count,
    and spend, each quartile-scored (ntile with a full deterministic
    tie-break) into a 3-digit segment label.

    Scale note: ntile over an unpartitioned window is a single-sort
    bottleneck at extreme cardinality — the production variant cuts
    on approx_percentile boundaries instead (sketch slot shows the
    pattern); at the dashboard cardinalities this query serves
    (users with >= 1 purchase), the exact quartile is the product
    requirement and one global sort of per-user rows is the price."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase")
    anchor = p.agg(F.max(F.date_trunc("day", "ts")).alias("a0"))
    per_user = (
        p.groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count("*").alias("frequency"),
            F.round(
                F.coalesce(F.sum("value"), F.lit(0.0)), 2
            ).alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .withColumn(
            "recency_days",
            F.datediff("a0", F.date_trunc("day", "last_ts")),
        )
    )
    r_score = F.ntile(4).over(
        Window.orderBy(F.col("recency_days").desc(), F.col("user_id"))
    )
    f_score = F.ntile(4).over(
        Window.orderBy(F.col("frequency").asc(), F.col("user_id"))
    )
    m_score = F.ntile(4).over(
        Window.orderBy(F.col("monetary").asc(), F.col("user_id"))
    )
    return per_user.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        r_score.alias("r"),
        f_score.alias("f"),
        m_score.alias("m"),
    ).withColumn(
        "segment",
        F.concat(F.col("r"), F.col("f"), F.col("m")).cast("string"),
    )


def q_rfm_segments_approx(spark, sf_dir):
    """RFM segmentation, boundary-cut variant — the 100 TB-posture
    production path the exact-``ntile`` query's docstring promises:
    quartile CUT POINTS come from ONE scalar aggregate
    (``percentile(col, array(.25,.5,.75))`` on each metric — linear
    interpolation, the same continuous-quantile definition as
    DuckDB's ``quantile_cont``), broadcast to every executor, and
    each user's r/f/m score is a CASE comparison against them.

    Scale shape: two hash aggregates (per-user rollup, then the
    3-row boundary reduce) + one broadcast join — ZERO window
    functions, so no global sort and no single-task ntile funnel; a
    billion users cost exactly one shuffle (plan-asserted in
    tests/test_plans.py).  Boundary comparisons are bit-stable
    cross-engine: interpolation of identical doubles is IEEE-
    deterministic, so scores — unlike ntile's tie-broken ranks —
    need no tolerance.  Output is the segment-level rollup a
    dashboard actually reads (segment -> users, spend), which is
    also invariant to how boundary TIES are assigned within a
    quartile.  Ref: reference has no RFM; this extends the KPI
    family (BASELINE.json 100 TB posture, SURVEY §7 no-global-sort
    rule)."""
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase")
    anchor = p.agg(F.max(F.date_trunc("day", "ts")).alias("a0"))
    per_user = (
        p.groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count("*").alias("frequency"),
            F.round(
                F.coalesce(F.sum("value"), F.lit(0.0)), 2
            ).alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .withColumn(
            "recency_days",
            F.datediff("a0", F.date_trunc("day", "last_ts")).cast(
                "double"
            ),
        )
    )
    qs = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    bounds = per_user.agg(
        F.percentile("recency_days", qs).alias("rb"),
        F.percentile(F.col("frequency").cast("double"), qs).alias("fb"),
        F.percentile("monetary", qs).alias("mb"),
    )

    def score(col, b, *, reverse=False):
        lo, hi = (4, 1) if reverse else (1, 4)
        mid = [3, 2] if reverse else [2, 3]
        return (
            F.when(col <= b[0], F.lit(lo))
            .when(col <= b[1], F.lit(mid[0]))
            .when(col <= b[2], F.lit(mid[1]))
            .otherwise(F.lit(hi))
        )

    scored = per_user.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        # Exact int64 cents: summation order differs between engines
        # and float addition is not associative — integer sums are
        # order-independent, so the segment total binds bit-exactly.
        F.floor(F.col("monetary") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
        score(F.col("recency_days"), F.col("rb"), reverse=True).alias(
            "r"
        ),
        score(F.col("frequency").cast("double"), F.col("fb")).alias("f"),
        score(F.col("monetary"), F.col("mb")).alias("m"),
    )
    return (
        scored.groupBy("r", "f", "m")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("cents").alias("total_monetary_cents"),
        )
        .withColumn(
            "segment",
            F.concat(F.col("r"), F.col("f"), F.col("m")).cast("string"),
        )
    )


QUERIES["agg_market_basket"] = q_market_basket
QUERIES["agg_rfm_segments"] = q_rfm_segments
QUERIES["agg_rfm_segments_approx"] = q_rfm_segments_approx

ORACLE["agg_market_basket"] = """
WITH ub AS (SELECT DISTINCT user_id, event_type AS item FROM events),
nu AS (SELECT count(DISTINCT user_id) AS n_users FROM ub),
it AS (SELECT item, count(*) AS n_item FROM ub GROUP BY 1),
pr AS (
  SELECT x.item AS a, y.item AS b, count(*) AS n_ab
  FROM ub x JOIN ub y USING (user_id) WHERE x.item < y.item
  GROUP BY 1, 2),
rules AS (
  SELECT a, b, n_ab FROM pr
  UNION ALL SELECT b, a, n_ab FROM pr)
SELECT r.a AS antecedent, r.b AS consequent, r.n_ab,
  floor(r.n_ab / CAST(nu.n_users AS DOUBLE) * 1000000 + 0.5)
    / 1000000 AS support,
  floor(r.n_ab / CAST(ia.n_item AS DOUBLE) * 1000000 + 0.5)
    / 1000000 AS confidence,
  floor((r.n_ab / CAST(ia.n_item AS DOUBLE))
    / (ib.n_item / CAST(nu.n_users AS DOUBLE)) * 1000000 + 0.5)
    / 1000000 AS lift
FROM rules r
JOIN it ia ON ia.item = r.a
JOIN it ib ON ib.item = r.b
CROSS JOIN nu"""

ORACLE["agg_rfm_segments"] = """
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
anchor AS (
  SELECT CAST(date_trunc('day', max(ts)) AS DATE) AS a0 FROM p),
per AS (
  SELECT user_id, max(ts) AS last_ts, count(*) AS frequency,
    round(coalesce(sum(value), 0.0), 2) AS monetary
  FROM p GROUP BY 1),
scored AS (
  SELECT user_id,
    date_diff('day', CAST(date_trunc('day', last_ts) AS DATE),
      (SELECT a0 FROM anchor)) AS recency_days,
    frequency, monetary,
    ntile(4) OVER (ORDER BY date_diff('day',
      CAST(date_trunc('day', last_ts) AS DATE),
      (SELECT a0 FROM anchor)) DESC, user_id) AS r,
    ntile(4) OVER (ORDER BY frequency ASC, user_id) AS f,
    ntile(4) OVER (ORDER BY monetary ASC, user_id) AS m
  FROM per)
SELECT user_id, CAST(recency_days AS INT) AS recency_days, frequency,
  monetary, CAST(r AS INT) AS r, CAST(f AS INT) AS f,
  CAST(m AS INT) AS m,
  CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR)
    AS segment
FROM scored"""

ORACLE["agg_rfm_segments_approx"] = """
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
anchor AS (
  SELECT CAST(date_trunc('day', max(ts)) AS DATE) AS a0 FROM p),
per AS (
  SELECT user_id, max(ts) AS last_ts, count(*) AS frequency,
    round(coalesce(sum(value), 0.0), 2) AS monetary
  FROM p GROUP BY 1),
per2 AS (
  SELECT user_id, frequency, monetary,
    CAST(date_diff('day', CAST(date_trunc('day', last_ts) AS DATE),
      (SELECT a0 FROM anchor)) AS DOUBLE) AS recency_days
  FROM per),
b AS (
  SELECT
    quantile_cont(recency_days, [0.25, 0.5, 0.75]) AS rb,
    quantile_cont(CAST(frequency AS DOUBLE), [0.25, 0.5, 0.75]) AS fb,
    quantile_cont(monetary, [0.25, 0.5, 0.75]) AS mb
  FROM per2),
scored AS (
  SELECT user_id, monetary,
    CASE WHEN recency_days <= rb[1] THEN 4
         WHEN recency_days <= rb[2] THEN 3
         WHEN recency_days <= rb[3] THEN 2 ELSE 1 END AS r,
    CASE WHEN CAST(frequency AS DOUBLE) <= fb[1] THEN 1
         WHEN CAST(frequency AS DOUBLE) <= fb[2] THEN 2
         WHEN CAST(frequency AS DOUBLE) <= fb[3] THEN 3 ELSE 4
         END AS f,
    CASE WHEN monetary <= mb[1] THEN 1
         WHEN monetary <= mb[2] THEN 2
         WHEN monetary <= mb[3] THEN 3 ELSE 4 END AS m
  FROM per2 CROSS JOIN b)
SELECT CAST(r AS INT) AS r, CAST(f AS INT) AS f, CAST(m AS INT) AS m,
  count(*) AS n_users,
  CAST(sum(CAST(floor(monetary * 100 + 0.5) AS BIGINT)) AS BIGINT)
    AS total_monetary_cents,
  CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR)
    AS segment
FROM scored GROUP BY r, f, m"""


def q_bounce_rate(spark, sf_dir):
    """Daily bounce rate: share of 30-minute-gap sessions containing
    exactly one event, per session-start day — the engagement KPI on
    every product dashboard.  One lag window (same partitioning as the
    other session queries) + two shrinking aggregates; the ratio is
    floor-rounded (k/n tie boundaries)."""
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
        .agg(
            F.date_format(
                F.date_trunc("day", F.min("ts")), "yyyy-MM-dd"
            ).alias("day"),
            F.count("*").alias("n_ev"),
        )
    )
    fl = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000
    return sess.groupBy("day").agg(
        F.count("*").alias("n_sessions"),
        F.sum(F.when(F.col("n_ev") == 1, 1).otherwise(0)).alias(
            "n_bounces"
        ),
        fl(
            F.sum(F.when(F.col("n_ev") == 1, 1).otherwise(0))
            / F.count("*").cast("double")
            * 100.0
        ).alias("bounce_pct"),
    )


QUERIES["agg_bounce_rate"] = q_bounce_rate

ORACLE["agg_bounce_rate"] = """
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
  SELECT user_id, sess,
    strftime(CAST(date_trunc('day', min(ts)) AS DATE), '%Y-%m-%d')
      AS day,
    count(*) AS n_ev
  FROM s GROUP BY 1, 2)
SELECT day, count(*) AS n_sessions,
  CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_bounces,
  floor(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END)
    / CAST(count(*) AS DOUBLE) * 100.0 * 10000 + 0.5) / 10000
    AS bounce_pct
FROM per GROUP BY 1"""


def q_dau_wau_mau(spark, sf_dir):
    """DAU / WAU / MAU and the DAU/MAU stickiness ratio — the
    engagement triple on every growth dashboard.  Rolling DISTINCT
    counts do not fit a window frame (COUNT(DISTINCT) OVER RANGE is
    unsupported in both engines at scale), so the standard listing
    trick applies: dedup to (user, day) FIRST, then explode each pair
    into the trailing days it contributes to (7 for WAU, 28 for MAU)
    and count distinct per target day.  The fanout multiplies the
    DEDUPED pair set, not raw events — at 100 TB the pairs are
    users x active-days, orders smaller than the event table."""
    ev = _t(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        F.date_trunc("day", "ts").cast("date").alias("d"),
    ).distinct().localCheckpoint(eager=True)
    rng = ud.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    days = rng.select(
        F.explode(F.sequence("d0", "d1")).alias("d")
    )
    dau = ud.groupBy("d").agg(F.count("*").alias("dau"))

    def trailing(n: int, name: str) -> DataFrame:
        contrib = ud.select(
            "user_id",
            F.explode(
                F.sequence(
                    F.col("d"), F.date_add(F.col("d"), n - 1)
                )
            ).alias("d"),
        )
        return (
            contrib.groupBy("d")
            .agg(F.count_distinct("user_id").alias(name))
        )

    fl = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000
    out = (
        days.join(dau, "d", "left")
        .join(trailing(7, "wau"), "d", "left")
        .join(trailing(28, "mau"), "d", "left")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("d"),
            F.coalesce("dau", F.lit(0)).alias("dau"),
            F.coalesce("wau", F.lit(0)).alias("wau"),
            F.coalesce("mau", F.lit(0)).alias("mau"),
        )
        .withColumn(
            "stickiness",
            F.when(
                F.col("mau") > 0,
                fl(F.col("dau") / F.col("mau").cast("double")),
            ),
        )
    )
    return out


QUERIES["agg_dau_wau_mau"] = q_dau_wau_mau

ORACLE["agg_dau_wau_mau"] = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
  FROM events),
rng AS (SELECT min(d) AS d0, max(d) AS d1 FROM ud),
days AS (
  SELECT CAST(unnest(generate_series((SELECT d0 FROM rng),
    (SELECT d1 FROM rng), INTERVAL 1 DAY)) AS DATE) AS d),
dau AS (SELECT d, count(*) AS dau FROM ud GROUP BY 1),
wau AS (
  SELECT td AS d, count(DISTINCT user_id) AS wau FROM (
    SELECT user_id,
      CAST(unnest(generate_series(d, d + 6, INTERVAL 1 DAY)) AS DATE)
        AS td
    FROM ud) GROUP BY 1),
mau AS (
  SELECT td AS d, count(DISTINCT user_id) AS mau FROM (
    SELECT user_id,
      CAST(unnest(generate_series(d, d + 27, INTERVAL 1 DAY)) AS DATE)
        AS td
    FROM ud) GROUP BY 1)
SELECT strftime(days.d, '%Y-%m-%d') AS d,
  coalesce(dau.dau, 0) AS dau,
  coalesce(wau.wau, 0) AS wau,
  coalesce(mau.mau, 0) AS mau,
  CASE WHEN coalesce(mau.mau, 0) > 0 THEN
    floor(coalesce(dau.dau, 0) / CAST(mau.mau AS DOUBLE) * 10000
      + 0.5) / 10000 END AS stickiness
FROM days
LEFT JOIN dau ON dau.d = days.d
LEFT JOIN wau ON wau.d = days.d
LEFT JOIN mau ON mau.d = days.d"""


def q_new_vs_returning(spark, sf_dir):
    """Daily new-vs-returning user split — the acquisition/retention
    overlay on every growth chart.  First-seen day via one window min
    over the deduped (user, day) pairs (the join formulation would
    re-scan events; the window is one exchange on the already-small
    pair set), then a day rollup."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        F.date_trunc("day", "ts").cast("date").alias("d"),
    ).distinct()
    first = F.min("d").over(Window.partitionBy("user_id"))
    fl = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000
    return (
        ud.withColumn("is_new", F.col("d") == first)
        .groupBy("d")
        .agg(
            F.sum(F.when(F.col("is_new"), 1).otherwise(0)).alias(
                "new_users"
            ),
            F.sum(F.when(~F.col("is_new"), 1).otherwise(0)).alias(
                "returning_users"
            ),
        )
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("d"),
            "new_users",
            "returning_users",
            fl(
                F.col("new_users")
                / (F.col("new_users") + F.col("returning_users")).cast(
                    "double"
                )
                * 100.0
            ).alias("new_pct"),
        )
    )


QUERIES["agg_new_vs_returning"] = q_new_vs_returning

ORACLE["agg_new_vs_returning"] = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
  FROM events),
x AS (
  SELECT d, d = min(d) OVER (PARTITION BY user_id) AS is_new
  FROM ud)
SELECT strftime(d, '%Y-%m-%d') AS d,
  CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT)
    AS new_users,
  CAST(sum(CASE WHEN NOT is_new THEN 1 ELSE 0 END) AS BIGINT)
    AS returning_users,
  floor(sum(CASE WHEN is_new THEN 1 ELSE 0 END)
    / CAST(count(*) AS DOUBLE) * 100.0 * 10000 + 0.5) / 10000
    AS new_pct
FROM x GROUP BY d"""


def q_degree_distribution(spark, sf_dir):
    """Degree distribution of the part co-occurrence graph — the
    structural profile (hub detection, power-law check) that sizes
    every downstream graph job: per-degree node counts plus summary
    quantiles.  Degree = one aggregate over the undirected edge list;
    the distribution is a second tiny aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    op = (
        li.select("l_orderkey", F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    pairs = (
        op.alias("x")
        .join(op.alias("y"), "l_orderkey")
        .filter(F.col("x.p") < F.col("y.p"))
        .select(F.col("x.p").alias("a"), F.col("y.p").alias("b"))
        .distinct()
    )
    deg = (
        pairs.select(F.col("a").alias("node"))
        .union(pairs.select("b"))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
        .localCheckpoint(eager=True)
    )
    dist = deg.groupBy("degree").agg(F.count("*").alias("n_nodes"))
    summary = deg.agg(
        F.lit(-1).cast("bigint").alias("degree"),
        F.count("*").alias("n_nodes"),
        F.max("degree").alias("max_degree"),
        F.round(F.expr("percentile(degree, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(degree, 0.99)"), 4).alias("p99"),
    )
    return dist.select(
        "degree",
        "n_nodes",
        F.lit(None).cast("bigint").alias("max_degree"),
        F.lit(None).cast("double").alias("p50"),
        F.lit(None).cast("double").alias("p99"),
    ).unionByName(summary)


QUERIES["graph_degree_dist"] = q_degree_distribution

ORACLE["graph_degree_dist"] = f"""
WITH {_COOC_SQL},
deg AS (
  SELECT node, count(*) AS degree FROM (
    SELECT a AS node FROM e UNION ALL SELECT b FROM e)
  GROUP BY 1)
SELECT degree, count(*) AS n_nodes,
  CAST(NULL AS BIGINT) AS max_degree,
  CAST(NULL AS DOUBLE) AS p50, CAST(NULL AS DOUBLE) AS p99
FROM deg GROUP BY 1
UNION ALL
SELECT -1, count(*), CAST(max(degree) AS BIGINT),
  round(quantile_cont(degree, 0.5), 4),
  round(quantile_cont(degree, 0.99), 4)
FROM deg"""


def q_cohort_ltv(spark, sf_dir):
    """Cohort LTV curves: cumulative purchase value per signup-week
    cohort by weeks-since-signup — the revenue companion to the
    retention matrix (which counts users; this follows the money).
    Value in exact integer micro-units before the running sum, so the
    cumulative column binds without tolerance; one window over the
    tiny (cohort x offset) grid."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cw")
    )
    p = (
        ev.filter(
            (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()
        )
        .join(first, "user_id")
        .select(
            "cw",
            (
                F.datediff(
                    F.date_trunc("week", "ts").cast("date"), F.col("cw")
                )
                / 7
            ).cast("int").alias("wk"),
            F.round(F.col("value") * 1e6, 0)
            .cast("bigint")
            .alias("micros"),
        )
    )
    grid = p.groupBy("cw", "wk").agg(
        F.sum("micros").alias("rev_micros"),
        F.count("*").alias("n_purchases"),
    )
    w = (
        Window.partitionBy("cw")
        .orderBy("wk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.select(
        F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
        "wk",
        "n_purchases",
        (F.col("rev_micros") / 1e6).alias("week_revenue"),
        (F.sum("rev_micros").over(w) / 1e6).alias("cum_revenue"),
    )


QUERIES["agg_cohort_ltv"] = q_cohort_ltv

ORACLE["agg_cohort_ltv"] = """
WITH first AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cw
  FROM events GROUP BY 1),
p AS (
  SELECT cw,
    CAST(date_diff('day', cw,
      CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS INT) AS wk,
    CAST(round(e.value * 1e6, 0) AS BIGINT) AS micros
  FROM events e JOIN first USING (user_id)
  WHERE e.event_type = 'purchase' AND e.value IS NOT NULL),
grid AS (
  SELECT cw, wk, CAST(sum(micros) AS BIGINT) AS rev_micros,
    count(*) AS n_purchases
  FROM p GROUP BY 1, 2)
SELECT strftime(cw, '%Y-%m-%d') AS cohort_week, wk, n_purchases,
  CAST(rev_micros AS DOUBLE) / 1e6 AS week_revenue,
  CAST(CAST(sum(rev_micros) OVER (PARTITION BY cw ORDER BY wk ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS DOUBLE) / 1e6 AS cum_revenue
FROM grid"""


def q_cumulative_unique_users(spark, sf_dir):
    """Total unique users to date, per day — the audience-size curve.
    NOT a rolling distinct: a user counts from their FIRST day
    forever, so the cumulative distinct collapses to first-seen days
    + one running sum over the day spine.  Compare agg_dau_wau_mau,
    where the trailing windows genuinely need the listing trick."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("d0")
    )
    news = first.groupBy("d0").agg(F.count("*").alias("new_users"))
    rng = ev.agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("lo"),
        F.date_trunc("day", F.max("ts")).cast("date").alias("hi"),
    )
    spine = rng.select(
        F.explode(F.sequence("lo", "hi")).alias("d")
    )
    w = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        spine.join(news, spine["d"] == news["d0"], "left")
        .select(
            "d", F.coalesce("new_users", F.lit(0)).alias("new_users")
        )
        .withColumn("cum_unique_users", F.sum("new_users").over(w))
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("d"),
            "new_users",
            "cum_unique_users",
        )
    )


QUERIES["agg_cumulative_unique_users"] = q_cumulative_unique_users

ORACLE["agg_cumulative_unique_users"] = """
WITH first AS (
  SELECT user_id, CAST(date_trunc('day', min(ts)) AS DATE) AS d0
  FROM events GROUP BY 1),
news AS (SELECT d0, count(*) AS new_users FROM first GROUP BY 1),
rng AS (
  SELECT CAST(date_trunc('day', min(ts)) AS DATE) AS lo,
    CAST(date_trunc('day', max(ts)) AS DATE) AS hi
  FROM events),
spine AS (
  SELECT CAST(unnest(generate_series((SELECT lo FROM rng),
    (SELECT hi FROM rng), INTERVAL 1 DAY)) AS DATE) AS d)
SELECT strftime(d, '%Y-%m-%d') AS d,
  coalesce(new_users, 0) AS new_users,
  CAST(sum(coalesce(new_users, 0)) OVER (ORDER BY d ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS cum_unique_users
FROM spine LEFT JOIN news ON news.d0 = spine.d"""


def q_funnel_windowed(spark, sf_dir):
    """Time-capped funnel: each stage must convert WITHIN 24 hours of
    the previous stage (the product-team variant the uncapped funnel
    can't answer — intent decays).  Same per-user min-over-slice join
    chain as agg_funnel_stages, with the window cap as an extra join
    predicate; every shuffle stays on user_id."""
    ev = _t(spark, sf_dir, "events")
    e = ev.select("user_id", F.col("event_type").alias("et"), "ts")
    cap = F.expr("INTERVAL 24 HOURS")
    s1 = (
        e.filter(F.col("et") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        s1.join(e.filter(F.col("et") == "click"), "user_id")
        .filter(
            (F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + cap)
        )
        .groupBy("user_id", "t1")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        s2.join(e.filter(F.col("et") == "purchase"), "user_id")
        .filter(
            (F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + cap)
        )
        .groupBy("user_id", "t2")
        .agg(F.min("ts").alias("t3"))
    )
    base = s1.agg(F.count("*").alias("base"))
    fl = lambda c: F.floor(c * 100 + F.lit(0.5)) / 100
    rows = []
    for idx, (stage, frame) in enumerate(
        [("view", s1), ("click_24h", s2), ("purchase_24h", s3)], start=1
    ):
        rows.append(
            frame.agg(F.count("*").alias("n_users"))
            .crossJoin(F.broadcast(base))
            .select(
                F.lit(idx).alias("stage_idx"),
                F.lit(stage).alias("stage"),
                "n_users",
                fl(
                    F.col("n_users") / F.col("base").cast("double")
                    * 100.0
                ).alias("conv_pct"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


QUERIES["agg_funnel_windowed"] = q_funnel_windowed

ORACLE["agg_funnel_windowed"] = """
WITH e AS (SELECT user_id, event_type AS et, ts FROM events),
s1 AS (SELECT user_id, min(ts) AS t1 FROM e WHERE et = 'view'
       GROUP BY 1),
s2 AS (
  SELECT s1.user_id, t1, min(ts) AS t2
  FROM s1 JOIN e ON e.user_id = s1.user_id AND e.et = 'click'
    AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 24 HOUR
  GROUP BY 1, 2),
s3 AS (
  SELECT s2.user_id, t2, min(ts) AS t3
  FROM s2 JOIN e ON e.user_id = s2.user_id AND e.et = 'purchase'
    AND e.ts > s2.t2 AND e.ts <= s2.t2 + INTERVAL 24 HOUR
  GROUP BY 1, 2),
b AS (SELECT count(*) AS base FROM s1)
SELECT 1 AS stage_idx, 'view' AS stage, count(*) AS n_users,
  floor(count(*) / CAST(b.base AS DOUBLE) * 100.0 * 100 + 0.5) / 100
    AS conv_pct
FROM s1 CROSS JOIN b GROUP BY b.base
UNION ALL
SELECT 2, 'click_24h', count(*),
  floor(count(*) / CAST(b.base AS DOUBLE) * 100.0 * 100 + 0.5) / 100
FROM s2 CROSS JOIN b GROUP BY b.base
UNION ALL
SELECT 3, 'purchase_24h', count(*),
  floor(count(*) / CAST(b.base AS DOUBLE) * 100.0 * 100 + 0.5) / 100
FROM s3 CROSS JOIN b GROUP BY b.base"""


def q_geo_grid_neighbors(spark, sf_dir):
    """Spatial proximity join via grid blocking — the scale shape of
    every geo join (geohash/S2/H3 bucketing): points bucket into
    grid cells, candidate pairs come from an equi-join on the 3x3
    neighborhood cells (each left point explodes to 9 cell keys —
    bounded fan-out), and the exact distance predicate verifies
    candidates only — never O(n^2).

    Fixture: each user gets a deterministic md5-derived home point in
    a 1-degree city box, in INTEGER MICRO-DEGREES; cells are 0.1
    degree; the radius predicate is squared planar distance in
    micro-degree^2 — all integer arithmetic, so the DuckDB oracle
    replays coordinates, blocking and verification bit-for-bit (the
    haversine upgrade is a verify-stage swap; blocking is the
    operator under test, and trig would put libm parity on the hash
    path for no structural gain).

    Output: per-cell occupancy + the verified neighbor-pair rollup
    (pair count, min/sum of squared distances) — probe-tagged in one
    result."""
    ev = _t(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    lat = (
        F.expr(
            "conv(substring(md5(concat('lat:', cast(user_id as string))),"
            " 1, 8), 16, 10)"
        ).cast("bigint")
        % 1_000_000
    )
    lon = (
        F.expr(
            "conv(substring(md5(concat('lon:', cast(user_id as string))),"
            " 1, 8), 16, 10)"
        ).cast("bigint")
        % 1_000_000
    )
    cell = 100_000
    pts = users.select(
        "user_id",
        lat.alias("lat"),
        lon.alias("lon"),
    ).withColumns(
        {
            "cx": (F.col("lat") / cell).cast("bigint"),
            "cy": (F.col("lon") / cell).cast("bigint"),
        }
    ).localCheckpoint(eager=True)
    occupancy = (
        pts.groupBy("cx", "cy")
        .agg(F.count("*").alias("n"))
        .select(
            F.lit("cell").alias("probe"),
            F.col("cx").cast("string").alias("k1"),
            F.col("cy").cast("string").alias("k2"),
            F.col("n").alias("v1"),
            F.lit(None).cast("bigint").alias("v2"),
        )
    )
    offsets = F.expr(
        "explode(array(-1, 0, 1))"
    )
    probe_cells = (
        pts.select(
            F.col("user_id").alias("a_id"),
            F.col("lat").alias("a_lat"),
            F.col("lon").alias("a_lon"),
            offsets.alias("dx"),
            "cx",
            "cy",
        )
        .select(
            "a_id", "a_lat", "a_lon",
            (F.col("cx") + F.col("dx")).alias("jx"),
            offsets.alias("dy"),
            "cy",
        )
        .select(
            "a_id", "a_lat", "a_lon", "jx",
            (F.col("cy") + F.col("dy")).alias("jy"),
        )
    )
    r2 = 50_000 * 50_000
    d2 = (
        (F.col("a_lat") - F.col("lat")) * (F.col("a_lat") - F.col("lat"))
        + (F.col("a_lon") - F.col("lon")) * (F.col("a_lon") - F.col("lon"))
    )
    pairs = (
        probe_cells.join(
            pts,
            (F.col("jx") == F.col("cx")) & (F.col("jy") == F.col("cy")),
        )
        .filter(F.col("a_id") < F.col("user_id"))
        .filter(d2 <= r2)
        .select(F.col("a_id"), F.col("user_id").alias("b_id"), d2.alias("d2"))
    )
    pair_stats = pairs.agg(
        F.count("*").alias("n_pairs"),
        F.coalesce(F.min("d2"), F.lit(0)).alias("min_d2"),
    ).select(
        F.lit("pairs").alias("probe"),
        F.lit(None).cast("string").alias("k1"),
        F.lit(None).cast("string").alias("k2"),
        F.col("n_pairs").alias("v1"),
        F.col("min_d2").alias("v2"),
    )
    return occupancy.unionByName(pair_stats)


QUERIES["geo_grid_neighbors"] = q_geo_grid_neighbors

ORACLE["geo_grid_neighbors"] = """
WITH u AS (SELECT DISTINCT user_id FROM events),
pts AS (
  SELECT user_id,
    CAST(('0x' || substr(md5('lat:' || CAST(user_id AS VARCHAR)),
      1, 8)) AS BIGINT) % 1000000 AS lat,
    CAST(('0x' || substr(md5('lon:' || CAST(user_id AS VARCHAR)),
      1, 8)) AS BIGINT) % 1000000 AS lon
  FROM u),
cells AS (
  SELECT user_id, lat, lon,
    CAST(lat // 100000 AS BIGINT) AS cx,
    CAST(lon // 100000 AS BIGINT) AS cy
  FROM pts),
occupancy AS (
  SELECT 'cell' AS probe, CAST(cx AS VARCHAR) AS k1,
    CAST(cy AS VARCHAR) AS k2, count(*) AS v1,
    CAST(NULL AS BIGINT) AS v2
  FROM cells GROUP BY cx, cy),
cand AS (
  SELECT a.user_id AS a_id, b.user_id AS b_id,
    (a.lat - b.lat) * (a.lat - b.lat)
      + (a.lon - b.lon) * (a.lon - b.lon) AS d2
  FROM cells a
  JOIN (SELECT unnest([-1, 0, 1]) AS dx) ox ON true
  JOIN (SELECT unnest([-1, 0, 1]) AS dy) oy ON true
  JOIN cells b
    ON b.cx = a.cx + ox.dx AND b.cy = a.cy + oy.dy
  WHERE a.user_id < b.user_id),
pairs AS (SELECT * FROM cand WHERE d2 <= 2500000000),
ps AS (
  SELECT 'pairs' AS probe, CAST(NULL AS VARCHAR) AS k1,
    CAST(NULL AS VARCHAR) AS k2, count(*) AS v1,
    CAST(coalesce(min(d2), 0) AS BIGINT) AS v2
  FROM pairs)
SELECT * FROM occupancy UNION ALL SELECT * FROM ps"""


def q_survival_retention(spark, sf_dir):
    """Kaplan-Meier survival curve over user lifetimes — the
    churn-analysis estimator (Kaplan & Meier 1958, public) that
    handles RIGHT-CENSORING correctly: users still active at the end
    of the observation window must not count as churned, which naive
    retention curves get wrong.

    Lifetime = days between a user's first and last event; a user
    whose last event falls within 3 days of the corpus end is
    censored (still alive).  Per observed duration d:
    ``n_at_risk(d)`` = users with lifetime >= d, and
    ``S(d) = prod_{d' <= d} (1 - churned(d')/n_at_risk(d'))``,
    computed as ``exp(cumsum(ln(...)))`` over the duration-ordered
    strata — the cumulative sum runs in a defined order so both
    engines fold identical doubles; the published survival gets the
    floor-1e6 idiom to absorb libm ulp noise in ln/exp.

    Shape: one user-keyed aggregate over the fact table; everything
    after is arithmetic on the DURATION strata — a frame bounded by
    the calendar (|distinct lifetimes| <= observation days), so the
    one unpartitioned cumulative window is a constant-size reduce,
    the same bounded-spine exemption ``text_zipf_fit`` documents.
    """
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    span = ev.agg(F.max("ts").alias("max_ts"))
    users = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
        .join(F.broadcast(span))
        .select(
            F.datediff("last_ts", "first_ts").alias("duration_d"),
            (
                F.col("last_ts")
                < F.col("max_ts") - F.expr("INTERVAL 3 DAYS")
            ).alias("churned"),
        )
    )
    total = users.agg(F.count("*").alias("n_users"))
    strata = (
        users.groupBy("duration_d")
        .agg(
            F.sum(F.col("churned").cast("bigint")).alias("n_churned"),
            F.sum((~F.col("churned")).cast("bigint")).alias("n_censored"),
            F.count("*").alias("n_total"),
        )
        .join(F.broadcast(total))
    )
    w = Window.orderBy("duration_d").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wcur = Window.orderBy("duration_d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    at_risk = F.col("n_users") - F.coalesce(
        F.sum("n_total").over(w), F.lit(0)
    )
    # A stratum where every at-risk user churns (hazard = 1) makes
    # ln(0): Spark returns NULL (silently dropped by the window sum,
    # inflating survival) while DuckDB raises.  Clamp the argument to
    # 1e-300 in BOTH engines: exp(cumsum) underflows to ~0 and the
    # published survival_micro floors to 0 for that stratum and every
    # later one — the correct KM behavior once S(t) reaches zero.
    hazard_ln = F.log(
        F.greatest(
            F.lit(1.0)
            - F.col("n_churned") / F.col("n_at_risk").cast("double"),
            F.lit(1e-300),
        )
    )
    return (
        strata.withColumn("n_at_risk", at_risk)
        .withColumn(
            "survival_micro",
            F.floor(
                F.exp(F.sum(hazard_ln).over(wcur)) * F.lit(1e6)
                + F.lit(0.5)
            ).cast("bigint"),
        )
        .select(
            "duration_d",
            "n_at_risk",
            "n_churned",
            "n_censored",
            "survival_micro",
        )
    )


QUERIES["agg_survival_km"] = q_survival_retention

ORACLE["agg_survival_km"] = """
WITH span AS (SELECT max(ts) AS max_ts FROM events),
users AS (
  SELECT date_diff('day', min(ts), max(ts)) AS duration_d,
    max(ts) < (SELECT max_ts FROM span) - INTERVAL 3 DAY AS churned
  FROM events GROUP BY user_id),
total AS (SELECT count(*) AS n_users FROM users),
strata AS (
  SELECT duration_d,
    CAST(sum(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT)
      AS n_churned,
    CAST(sum(CASE WHEN churned THEN 0 ELSE 1 END) AS BIGINT)
      AS n_censored,
    count(*) AS n_total
  FROM users GROUP BY 1),
risk AS (
  SELECT *,
    (SELECT n_users FROM total)
      - coalesce(sum(n_total) OVER (ORDER BY duration_d
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS n_at_risk
  FROM strata)
SELECT duration_d, CAST(n_at_risk AS BIGINT) AS n_at_risk,
  n_churned, n_censored,
  CAST(floor(
    exp(sum(ln(greatest(CAST(1.0 AS DOUBLE)
               - n_churned / CAST(n_at_risk AS DOUBLE),
               CAST(1e-300 AS DOUBLE))))
        OVER (ORDER BY duration_d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    * 1e6 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS survival_micro
FROM risk"""


def q_hierarchy_rollup(spark, sf_dir):
    """Adjacency-list hierarchy rollup via Spark 4's RECURSIVE CTE
    (SPARK-24497, new in 4.0) — the org-chart / bill-of-materials
    recursion the hand-rolled BFS (`graph_khop_reach`) implements
    imperatively, here left entirely to the engine: the planner
    materializes each recursion step and re-joins the FRONTIER
    against the child table, so per-step work shuffles one
    generation, never the accumulated result.

    The hierarchy is the implicit binary tree ``parent(k) = k div 2``
    over customer keys (deterministic, needs no extra fixture table);
    depth is log2(n) — ~14 levels at sf1 and ~27 at 100 TB key
    cardinality, comfortably inside the engine's recursion ceiling
    (``spark.sql.cteRecursionLevelLimit`` = 100), which is the
    scale-correct property of hierarchy recursion: step count grows
    with DEPTH, not row count.  Per-depth rollup binds node counts,
    id checksums, and account-balance cents; DuckDB replays the
    identical WITH RECURSIVE."""
    import os
    import re

    cust = _t(spark, sf_dir, "customer")
    sf_tag = re.sub(
        r"[^0-9A-Za-z_]", "_", os.path.basename(sf_dir.rstrip("/"))
    )
    view = f"__hier_cust_{sf_tag}"
    cust.select(
        "c_custkey",
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    ).createOrReplaceTempView(view)
    return spark.sql(f"""
        WITH RECURSIVE r AS (
          SELECT c_custkey AS node, 0 AS depth, cents
          FROM {view} WHERE c_custkey = 1
          UNION ALL
          SELECT c.c_custkey, r.depth + 1, c.cents
          FROM {view} c JOIN r ON c.c_custkey DIV 2 = r.node
          WHERE c.c_custkey > 1)
        SELECT depth, count(*) AS n_nodes,
          CAST(sum(node) AS BIGINT) AS id_sum,
          CAST(sum(cents) AS BIGINT) AS cents
        FROM r GROUP BY depth""")


QUERIES["graph_hierarchy_rollup"] = q_hierarchy_rollup

ORACLE["graph_hierarchy_rollup"] = """
WITH RECURSIVE c AS (
  SELECT c_custkey,
    CAST(floor(c_acctbal * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
      AS cents
  FROM customer),
r AS (
  SELECT c_custkey AS node, 0 AS depth, cents
  FROM c WHERE c_custkey = 1
  UNION ALL
  SELECT c.c_custkey, r.depth + 1, c.cents
  FROM c JOIN r ON c.c_custkey // 2 = r.node
  WHERE c.c_custkey > 1)
SELECT depth, count(*) AS n_nodes,
  CAST(sum(node) AS BIGINT) AS id_sum,
  CAST(sum(cents) AS BIGINT) AS cents
FROM r GROUP BY depth"""


def q_approx_topk_merge(spark, sf_dir):
    """Mergeable frequent-items sketches (Spark 4.1
    ``approx_top_k_accumulate / _combine / _estimate``, SPARK-52588) —
    the heavy-hitters twin of the HLL set-ops query
    (`agg_sketch_set_ops`): per-group PARTIAL sketches built where the
    data lives, one tiny combine at the top, estimate over the merged
    state.  That partial->merge algebra is the whole 100 TB story —
    per-partition sketches shuffle bytes, not rows, and the same
    binary state serves rollups at any grouping level.

    Partials are per ``l_returnflag`` (the natural per-shard build);
    ``maxItemsTracked`` is sized ABOVE the supplier cardinality at
    every tested SF (100 @ sf0.01, 1000 @ sf0.1, 10k @ sf1 << 65536),
    so the estimates are provably exact and the oracle checks them as
    plain counts — the sketch earns its keep when cardinality passes
    the budget, and the sizing rule is the documented contract
    (undersized sketches degrade to true approximation; the
    correctness gate pins the exact regime).
    """
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_topk_v")
    return spark.sql(
        """
        WITH acc AS (
          SELECT l_returnflag,
                 approx_top_k_accumulate(l_suppkey, 65536) AS sk
          FROM li_topk_v GROUP BY l_returnflag),
        est AS (
          SELECT explode(
                   approx_top_k_estimate(approx_top_k_combine(sk), 65536)
                 ) AS t
          FROM acc)
        SELECT t.item AS l_suppkey, t.count AS n_lineitems FROM est
        """
    )


QUERIES["agg_approx_topk_merge"] = q_approx_topk_merge

ORACLE["agg_approx_topk_merge"] = """
SELECT l_suppkey, count(*) AS n_lineitems
FROM lineitem GROUP BY 1"""


def q_ordered_listagg(spark, sf_dir):
    """Ordered-set + conditional aggregate surface in one rollup —
    the Spark 4 additions that close long-standing ANSI gaps:
    ``listagg(DISTINCT ..., ',') WITHIN GROUP (ORDER BY ...)``
    (SPARK-42746, the deterministic CSV rollup that previously
    required collect_list -> array_distinct -> array_sort ->
    array_join), plus ``median``, ``count_if`` and ``bool_and``.

    Per region over the customer->nation->region broadcast star:
    the ordered DISTINCT nation CSV binds membership AND order into
    one string (an unordered listagg would be nondeterministic across
    partitions — WITHIN GROUP is what makes the hash stable); median
    account balance interpolates identically from identical doubles
    in both engines; count_if/bool_and replace the sum(CASE)/min(CASE)
    idioms.  Shape: two broadcast joins (25-row nation, 5-row
    region), one partial/final aggregate on 5 groups; listagg's sort
    happens per-group over the bounded nation set, never globally."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    star = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    # NOTE: mixing listagg(DISTINCT) WITHIN GROUP with a second
    # distinct aggregate (countDistinct) in one Aggregate trips a
    # Spark 4.1 planner ClassCastException (AttributeReference ->
    # SortOrder) in the distinct rewrite; n_nations therefore derives
    # from the ordered CSV itself, which also binds it to the listagg
    # output instead of a parallel code path.
    return (
        star.groupBy("r_name")
        .agg(
            F.count("*").alias("n_cust"),
            F.expr(
                "listagg(DISTINCT n_name, ',') WITHIN GROUP (ORDER BY n_name)"
            ).alias("nations_csv"),
            (
                F.floor(F.median("c_acctbal") * F.lit(10000.0) + F.lit(0.5))
                / F.lit(10000.0)
            ).alias("median_acctbal"),
            F.count_if(F.col("c_acctbal") > 0).alias("n_positive"),
            F.bool_and(F.col("c_acctbal") > -1000).alias("all_above_floor"),
        )
        .withColumn(
            "n_nations",
            F.size(F.split("nations_csv", ",")).cast("bigint"),
        )
    )


QUERIES["agg_ordered_listagg"] = q_ordered_listagg

ORACLE["agg_ordered_listagg"] = """
SELECT r_name, count(*) AS n_cust,
  string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nations_csv,
  floor(median(c_acctbal) * 10000 + CAST(0.5 AS DOUBLE))
    / CAST(10000 AS DOUBLE) AS median_acctbal,
  CAST(count(*) FILTER (WHERE c_acctbal > 0) AS BIGINT) AS n_positive,
  bool_and(c_acctbal > -1000) AS all_above_floor,
  CAST(len(string_split(string_agg(DISTINCT n_name, ',' ORDER BY n_name),
    ',')) AS BIGINT) AS n_nations
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name"""


def q_attribution_markov(spark, sf_dir):
    """Markov removal-effect attribution (Anderl et al. 2014, public)
    — the data-driven successor to `agg_attribution_last_touch`: model
    journeys as a first-order chain over channels with CONV/NULL
    absorbing, and credit each channel by how much the 16-step
    conversion probability DROPS when that channel is removed (its
    incoming edges redirect to NULL, its outgoing edges vanish).

    Exactness contract — everything after the journey aggregate is
    INTEGER arithmetic, so the hash needs no tolerance: transition
    probabilities are fixed-point micros (``count*1e6 div out_count``),
    the chain is raised to the 16th power by FOUR matrix squarings
    with an integer-division renormalize per entry (products <= 1e12,
    row sums <= 7e12 — safely inside int64), and effects/shares are
    integer cross-multiplications.  Both engines fold identical
    integers; summation order cannot matter.

    Scale shape: ONE windowed pass over events builds the journey
    transitions (per-user lag/lead after truncation at the first
    purchase); the 7x7 chain then PACKS into a single 49-long array
    column — one row per removal variant — and every squaring is an
    in-row transform/aggregate expression: ZERO joins, ZERO shuffles
    past the pack (a join-per-squaring draft spent 17 s on vanilla
    200-partition stage scheduling for 245-row frames; this form runs
    the same integers in narrow projections).  Each squaring level is
    localCheckpoint-pinned — Project collapse would otherwise inline
    level N-1's whole array expression into each of level N's 49
    lanes (the no-CSE-in-HOF-lambdas trap, cost 49^4).  16 steps is a
    deliberate fixed horizon (journeys longer than 16 hops contribute
    through their prefix), making the metric deterministic rather
    than convergence-dependent."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    first_p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.struct("ts", "event_id")).alias("fp"))
    )
    kept = (
        ev.join(first_p, "user_id", "left")
        .filter(
            F.col("fp").isNull()
            | (F.struct("ts", "event_id") <= F.col("fp"))
        )
        .select(
            "user_id",
            "ts",
            "event_id",
            F.when(F.col("event_type") == "purchase", F.lit("CONV"))
            .otherwise(F.col("event_type"))
            .alias("st"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # seq feeds THREE union branches; unpinned, each branch re-plans
    # the scan + purchase join + window (pin-where-measured: 8.2 s ->
    # 2.6 s for the journey stage on a vanilla 200-partition session)
    seq = kept.select(
        "st",
        F.lag("st").over(w).alias("prev"),
        F.lead("st").over(w).alias("nxt"),
    ).localCheckpoint(eager=True)
    trans = (
        seq.filter(F.col("prev").isNull()).select(
            F.lit("START").alias("src"), F.col("st").alias("dst")
        )
        .union(
            seq.filter(F.col("nxt").isNotNull()).select(
                F.col("st").alias("src"), F.col("nxt").alias("dst")
            )
        )
        .union(
            seq.filter(
                F.col("nxt").isNull() & (F.col("st") != "CONV")
            ).select(F.col("st").alias("src"), F.lit("NULL").alias("dst"))
        )
    )
    counts = trans.groupBy("src", "dst").agg(F.count("*").alias("c"))
    outs = counts.groupBy("src").agg(F.sum("c").alias("tot"))
    probs = (
        counts.join(outs, "src")
        .select("src", "dst", F.expr("c * 1000000 div tot").alias("p"))
        .localCheckpoint(eager=True)
    )
    channels = ["view", "click", "signup", "error"]
    variants = spark.createDataFrame(
        [(v,) for v in ["base"] + channels], "variant string"
    )
    vmat = (
        probs.crossJoin(F.broadcast(variants))
        .filter(F.col("src") != F.col("variant"))
        .select(
            "variant",
            "src",
            F.when(F.col("dst") == F.col("variant"), F.lit("NULL"))
            .otherwise(F.col("dst"))
            .alias("dst"),
            "p",
        )
        .groupBy("variant", "src", "dst")
        .agg(F.sum("p").alias("p"))
    )
    absorbing = spark.createDataFrame(
        [
            (v, s, s, 1000000)
            for v in ["base"] + channels
            for s in ("CONV", "NULL")
        ],
        "variant string, src string, dst string, p long",
    )
    idx = (
        "CASE {c} WHEN 'START' THEN 0 WHEN 'view' THEN 1 "
        "WHEN 'click' THEN 2 WHEN 'signup' THEN 3 WHEN 'error' THEN 4 "
        "WHEN 'CONV' THEN 5 ELSE 6 END"
    )
    packed = (
        vmat.unionByName(absorbing)
        .select(
            "variant",
            F.expr(
                f"({idx.format(c='src')}) * 7 + ({idx.format(c='dst')})"
            ).alias("k"),
            "p",
        )
        .groupBy("variant")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("k", "p"))
            ).alias("mm")
        )
        .select(
            "variant",
            F.expr(
                "transform(sequence(0, 48), "
                "k -> coalesce(element_at(mm, k), 0L))"
            ).alias("m"),
        )
        .localCheckpoint(eager=True)
    )
    square = (
        "transform(sequence(0, 48), k -> "
        "aggregate(sequence(0, 6), 0L, (acc, t) -> "
        "acc + element_at(m, CAST((k div 7) * 7 + t + 1 AS INT)) "
        "* element_at(m, t * 7 + (k % 7) + 1)) div 1000000)"
    )
    m = packed
    for _ in range(4):
        m = m.withColumn("m", F.expr(square)).localCheckpoint(eager=True)
    # START row, CONV column: k = 0*7 + 5 -> element_at index 6
    conv = m.select(
        "variant", F.element_at("m", 6).alias("conv_micro")
    )
    base = conv.filter(F.col("variant") == "base").select(
        F.col("conv_micro").alias("base_micro")
    )
    eff = (
        conv.filter(F.col("variant") != "base")
        .crossJoin(F.broadcast(base))
        .select(
            F.col("variant").alias("channel"),
            "base_micro",
            F.col("conv_micro").alias("removed_micro"),
            F.expr(
                "(base_micro - conv_micro) * 1000000 div base_micro"
            ).alias("effect_micro"),
        )
    )
    tot = eff.agg(F.sum("effect_micro").alias("eff_tot"))
    return eff.crossJoin(F.broadcast(tot)).select(
        "channel",
        "base_micro",
        "removed_micro",
        "effect_micro",
        F.when(
            F.col("eff_tot") > 0,
            F.expr("effect_micro * 1000000 div eff_tot"),
        ).alias("share_micro"),
    )


QUERIES["agg_attribution_markov"] = q_attribution_markov

_MK_SQ = """
SELECT variant, list_transform(range(49), k ->
  list_sum(list_transform(range(7), t ->
    m[(k // 7) * 7 + t + 1] * m[t * 7 + (k % 7) + 1])) // 1000000) AS m
FROM {prev}"""

_MK_IDX = "CASE {c} WHEN 'START' THEN 0 WHEN 'view' THEN 1 " \
    "WHEN 'click' THEN 2 WHEN 'signup' THEN 3 WHEN 'error' THEN 4 " \
    "WHEN 'CONV' THEN 5 ELSE 6 END"

ORACLE["agg_attribution_markov"] = f"""
WITH fp AS (
  SELECT user_id, min(ROW(ts, event_id)) AS f
  FROM events WHERE event_type = 'purchase' GROUP BY 1),
kept AS (
  SELECT e.user_id, e.ts, e.event_id,
    CASE WHEN e.event_type = 'purchase' THEN 'CONV'
         ELSE e.event_type END AS st
  FROM events e LEFT JOIN fp ON e.user_id = fp.user_id
  WHERE fp.f IS NULL OR ROW(e.ts, e.event_id) <= fp.f),
seq AS (
  SELECT st, lag(st) OVER w AS prev, lead(st) OVER w AS nxt
  FROM kept
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
trans AS (
  SELECT 'START' AS src, st AS dst FROM seq WHERE prev IS NULL
  UNION ALL
  SELECT st, nxt FROM seq WHERE nxt IS NOT NULL
  UNION ALL
  SELECT st, 'NULL' FROM seq WHERE nxt IS NULL AND st <> 'CONV'),
counts AS (SELECT src, dst, count(*) AS c FROM trans GROUP BY 1, 2),
outs AS (SELECT src, sum(c) AS tot FROM counts GROUP BY 1),
probs AS (
  SELECT counts.src, counts.dst,
    CAST((c * 1000000) // tot AS BIGINT) AS p
  FROM counts JOIN outs ON counts.src = outs.src),
vars AS (SELECT unnest(['base', 'view', 'click', 'signup', 'error'])
           AS variant),
entries AS (
  SELECT variant,
    ({_MK_IDX.format(c='src')}) * 7
      + ({_MK_IDX.format(c='dst')}) AS k,
    CAST(sum(p) AS BIGINT) AS p
  FROM (
    SELECT variant, src,
      CASE WHEN dst = variant THEN 'NULL' ELSE dst END AS dst, p
    FROM probs CROSS JOIN vars
    WHERE src <> variant
    UNION ALL
    SELECT variant, s, s, CAST(1000000 AS BIGINT)
    FROM vars CROSS JOIN (SELECT unnest(['CONV', 'NULL']) AS s))
  GROUP BY 1, 2),
cells AS (
  SELECT v.variant, gs.k, coalesce(e.p, 0) AS p
  FROM vars v CROSS JOIN (SELECT unnest(range(49)) AS k) gs
  LEFT JOIN entries e ON e.variant = v.variant AND e.k = gs.k),
m0 AS (SELECT variant, list(p ORDER BY k) AS m FROM cells GROUP BY 1),
m1 AS ({_MK_SQ.format(prev='m0')}),
m2 AS ({_MK_SQ.format(prev='m1')}),
m3 AS ({_MK_SQ.format(prev='m2')}),
m4 AS ({_MK_SQ.format(prev='m3')}),
conv AS (
  SELECT variant, CAST(m[6] AS BIGINT) AS conv_micro FROM m4),
eff AS (
  SELECT c.variant AS channel,
    b.conv_micro AS base_micro,
    c.conv_micro AS removed_micro,
    CAST(((b.conv_micro - c.conv_micro) * 1000000) // b.conv_micro
      AS BIGINT) AS effect_micro
  FROM conv c CROSS JOIN (
    SELECT conv_micro FROM conv WHERE variant = 'base') b
  WHERE c.variant <> 'base'),
tot AS (SELECT sum(effect_micro) AS eff_tot FROM eff)
SELECT channel, base_micro, removed_micro, effect_micro,
  CASE WHEN eff_tot > 0
    THEN CAST((effect_micro * 1000000) // eff_tot AS BIGINT)
  END AS share_micro
FROM eff CROSS JOIN tot"""


def q_label_propagation(spark, sf_dir):
    """Synchronous label propagation communities (Raghavan et al.
    2007, public) over the word co-occurrence graph — the community-
    detection sibling of `graph_pagerank_sources` (influence) and
    `dedup_components` (reachability): each word starts as its own
    label and, for 4 synchronous rounds, adopts the label with the
    largest EDGE-WEIGHTED neighbor vote; ties break to the smallest
    label so every round is engine-deterministic (votes are integer
    co-occurrence counts — no float anywhere).

    The fixed 4-round horizon is deliberate: sync LPA can oscillate
    on bipartite structures, so the metric is "labels after 4 sync
    rounds", not a convergence claim — both engines fold the same
    integers to the same fixpoint-or-not.

    Propagation runs on the TOP-3 mutual co-occurrence graph: each
    word keeps only its 3 strongest edges (ties by neighbor) and the
    graph re-symmetrizes by union — the standard kNN-graph
    sparsification, chosen over an absolute weight threshold because
    a threshold relative to the mean weight measured 14 communities
    at 1.2x but ZERO surviving edges at 1.5x (brittle against the
    per-round fixture regeneration), while the top-k cut yields 9-17
    communities at every tested SF by construction.

    Scale shape: the token stream collapses to the vocabulary²
    edge list once (shared `word_cooccurrence_edges` builder, one
    doc_id shuffle); the top-k cut is the WindowGroupLimit shape;
    each round is one vocab-sized join + integer vote aggregate +
    per-node rank cut, pinned per round so plans stay linear in
    rounds.  Membership AND order bind into the hash via the ordered
    per-community CSV."""
    from cdc_pipe_line_spark.text import word_cooccurrence_edges
    from pyspark.sql.window import Window

    docs = _t(spark, sf_dir, "documents")
    dense = word_cooccurrence_edges(docs)
    wk = Window.partitionBy("src").orderBy(
        F.col("wt").desc(), F.col("dst").asc()
    )
    topk = (
        dense.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= 3)
        .select("src", "dst", "wt")
    )
    edges = (
        topk.union(
            topk.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "wt"
            )
        )
        .groupBy("src", "dst")
        .agg(F.max("wt").alias("wt"))
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("node").orderBy(
        F.col("votes").desc(), F.col("label").asc()
    )
    for _ in range(4):
        votes = (
            edges.join(
                labels.select(F.col("node").alias("dst"), "label"), "dst"
            )
            .groupBy(F.col("src").alias("node"), "label")
            .agg(F.sum("wt").alias("votes"))
        )
        labels = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
            .localCheckpoint(eager=True)
        )
    return (
        labels.groupBy("label")
        .agg(
            F.count("*").alias("n_words"),
            F.expr(
                "listagg(node, ',') WITHIN GROUP (ORDER BY node)"
            ).alias("words_csv"),
        )
        .select(F.col("label").alias("community"), "n_words", "words_csv")
    )


QUERIES["graph_label_propagation"] = q_label_propagation

_LPA_STEP = """
SELECT node, label FROM (
  SELECT e.src AS node, l.label,
    row_number() OVER (PARTITION BY e.src
      ORDER BY sum(e.wt) DESC, l.label ASC) AS rn
  FROM edges e JOIN {prev} l ON e.dst = l.node
  GROUP BY e.src, l.label)
WHERE rn = 1"""

ORACLE["graph_label_propagation"] = f"""
WITH toks AS (
  SELECT doc_id,
    generate_subscripts(string_split(lower(text), ' '), 1) AS pos,
    unnest(string_split(lower(text), ' ')) AS w
  FROM documents),
t AS (SELECT * FROM toks WHERE w <> ''),
led AS (
  SELECT w, lead(w, 1) OVER win AS w1, lead(w, 2) OVER win AS w2
  FROM t WINDOW win AS (PARTITION BY doc_id ORDER BY pos ASC)),
und AS (
  SELECT w AS src, w1 AS dst FROM led
  WHERE w1 IS NOT NULL AND w <> w1
  UNION ALL
  SELECT w, w2 FROM led WHERE w2 IS NOT NULL AND w <> w2),
edges0 AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS wt FROM (
    SELECT src, dst FROM und
    UNION ALL
    SELECT dst AS src, src AS dst FROM und)
  GROUP BY 1, 2),
topk AS (
  SELECT src, dst, wt FROM (
    SELECT *, row_number() OVER (PARTITION BY src
      ORDER BY wt DESC, dst ASC) AS rn
    FROM edges0) WHERE rn <= 3),
edges AS (
  SELECT src, dst, CAST(max(wt) AS BIGINT) AS wt FROM (
    SELECT src, dst, wt FROM topk
    UNION ALL
    SELECT dst AS src, src AS dst, wt FROM topk)
  GROUP BY 1, 2),
l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
l1 AS ({_LPA_STEP.format(prev='l0')}),
l2 AS ({_LPA_STEP.format(prev='l1')}),
l3 AS ({_LPA_STEP.format(prev='l2')}),
l4 AS ({_LPA_STEP.format(prev='l3')})
SELECT label AS community, count(*) AS n_words,
  string_agg(node, ',' ORDER BY node) AS words_csv
FROM l4 GROUP BY 1"""


def q_link_prediction(spark, sf_dir):
    """Neighbor-Jaccard link prediction (Liben-Nowell & Kleinberg
    2003, public) over the word co-occurrence graph — given the edges
    that exist, which NON-edges are most likely: score every
    non-adjacent pair that shares at least one neighbor by
    ``|N(a) ∩ N(b)| / |N(a) ∪ N(b)|`` and publish the top 15.  The
    graph trio is now complete: influence (`graph_pagerank_sources`),
    communities (`graph_label_propagation`), missing-edge inference
    (here) — all on the same shared edge builder.

    Entirely INTEGER arithmetic: common-neighbor counts and degrees
    are exact, the score is ``common * 1e6 div (d_a + d_b - common)``
    (integer division), so ranking and hash are tolerance-free; ties
    break on the pair itself.

    Scale shape: candidates come from the shared-neighbor wedge join
    (only pairs with a common neighbor exist — the same bound as
    triangle counting, never all-pairs); the anti-join removes
    existing edges; degrees broadcast.  At massive degree skew the
    adjacency-intersection form (`graph_triangle_parts`'s packed-array
    rewrite) applies verbatim."""
    from cdc_pipe_line_spark.text import word_cooccurrence_edges

    docs = _t(spark, sf_dir, "documents")
    und = word_cooccurrence_edges(docs).select("src", "dst")
    deg = und.groupBy("src").agg(F.count("*").alias("d"))
    common = (
        und.select(F.col("src").alias("a"), F.col("dst").alias("w"))
        .join(
            und.select(F.col("src").alias("b"), F.col("dst").alias("w")),
            "w",
        )
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_common"))
    )
    nonadj = common.join(
        und.select(F.col("src").alias("a"), F.col("dst").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    scored = (
        nonadj.join(
            F.broadcast(deg.select(F.col("src").alias("a"), F.col("d").alias("d_a"))),
            "a",
        )
        .join(
            F.broadcast(deg.select(F.col("src").alias("b"), F.col("d").alias("d_b"))),
            "b",
        )
        .select(
            "a",
            "b",
            "n_common",
            F.expr(
                "n_common * 1000000 div (d_a + d_b - n_common)"
            ).alias("score_micro"),
        )
    )
    from pyspark.sql.window import Window as _W

    top = scored.orderBy(
        F.col("score_micro").desc(), F.col("a").asc(), F.col("b").asc()
    ).limit(15)
    w = _W.orderBy(
        F.col("score_micro").desc(), F.col("a").asc(), F.col("b").asc()
    )
    return top.withColumn("pos", F.row_number().over(w).cast("int"))


QUERIES["graph_link_prediction"] = q_link_prediction

ORACLE["graph_link_prediction"] = """
WITH toks AS (
  SELECT doc_id,
    generate_subscripts(string_split(lower(text), ' '), 1) AS pos,
    unnest(string_split(lower(text), ' ')) AS w
  FROM documents),
t AS (SELECT * FROM toks WHERE w <> ''),
led AS (
  SELECT w, lead(w, 1) OVER win AS w1, lead(w, 2) OVER win AS w2
  FROM t WINDOW win AS (PARTITION BY doc_id ORDER BY pos ASC)),
und0 AS (
  SELECT w AS src, w1 AS dst FROM led
  WHERE w1 IS NOT NULL AND w <> w1
  UNION ALL
  SELECT w, w2 FROM led WHERE w2 IS NOT NULL AND w <> w2),
und AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM und0
    UNION ALL
    SELECT dst AS src, src AS dst FROM und0)),
deg AS (SELECT src, count(*) AS d FROM und GROUP BY 1),
common AS (
  SELECT x.src AS a, y.src AS b, count(*) AS n_common
  FROM und x JOIN und y ON x.dst = y.dst AND x.src < y.src
  GROUP BY 1, 2),
nonadj AS (
  SELECT c.* FROM common c
  WHERE NOT EXISTS (SELECT 1 FROM und e
                    WHERE e.src = c.a AND e.dst = c.b)),
scored AS (
  SELECT a, b, CAST(n_common AS BIGINT) AS n_common,
    CAST((n_common * 1000000) // (da.d + db.d - n_common) AS BIGINT)
      AS score_micro
  FROM nonadj
  JOIN deg da ON da.src = a
  JOIN deg db ON db.src = b),
top AS (
  SELECT * FROM scored
  ORDER BY score_micro DESC, a ASC, b ASC LIMIT 15)
SELECT a, b, n_common, score_micro,
  CAST(row_number() OVER (ORDER BY score_micro DESC, a ASC, b ASC)
    AS INT) AS pos
FROM top"""


def q_cms_rollup(spark, sf_dir):
    """Count-Min point-frequency sketches with MERGEABLE rollup —
    completing the sketch trio (HLL distinct counts in
    `agg_sketch_set_ops`, frequent items in `agg_approx_topk_merge`,
    point frequencies here): per-day partial sketches build
    distributed (one aggregate, sketches shuffle as bytes), the
    30-day rollup merges the bounded sketch census driver-side
    (`CountMinSketch.mergeInPlace` — the same tiny-bounded-collect
    pattern as the HLL census), and the merged sketch answers
    per-user frequency probes.

    Three claims bind the algebra into the hash next to exact counts
    the oracle recomputes: ``never_under`` (a CMS estimate can only
    overcount — guaranteed, not probabilistic), ``within_bound``
    (est <= exact + 3*eps*N at eps=0.001 — 3x the one-sided
    guarantee's margin so fixture regeneration cannot flake it), and
    ``merge_exact`` (the day-merged estimate EQUALS the single-pass
    whole-table estimate for every probe key: same width/depth/seed
    sketches merge by exact counter addition — the property that
    makes per-partition/per-day rollup lossless at any scale)."""
    ev = _t(spark, sf_dir, "events")
    eps, conf, seed = 0.001, 0.99, 42
    daily = (
        ev.groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(
            F.count_min_sketch(
                "user_id", F.lit(eps), F.lit(conf), F.lit(seed)
            ).alias("sk")
        )
        .collect()
    )
    single = ev.agg(
        F.count_min_sketch(
            "user_id", F.lit(eps), F.lit(conf), F.lit(seed)
        ).alias("sk")
    ).collect()[0][0]
    jvm = spark._jvm
    reader = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom
    merged = None
    for row in daily:
        part = reader(bytes(row["sk"]))
        if merged is None:
            merged = part
        else:
            merged.mergeInPlace(part)
    single_sk = reader(bytes(single))
    total = int(merged.totalCount())
    keys = list(range(1, 11))
    probes = [
        (
            k,
            int(merged.estimateCount(jvm.java.lang.Long(k))),
            int(single_sk.estimateCount(jvm.java.lang.Long(k))),
        )
        for k in keys
    ]
    est = spark.createDataFrame(
        probes, "user_key long, est_merged long, est_single long"
    )
    exact = (
        ev.filter(F.col("user_id").isin(keys))
        .groupBy(F.col("user_id").alias("user_key"))
        .agg(F.count("*").alias("exact_n"))
    )
    bound = int(3 * eps * total) + 1
    return (
        est.join(exact, "user_key", "left")
        # coalesce BEFORE the comparisons: a probe key absent from a
        # regenerated fixture must yield exact_n=0 and true claims,
        # never a NULL boolean
        .withColumn("exact_n", F.coalesce(F.col("exact_n"), F.lit(0)))
        .select(
            "user_key",
            "exact_n",
            (F.col("est_merged") >= F.col("exact_n")).alias("never_under"),
            (F.col("est_merged") <= F.col("exact_n") + F.lit(bound)).alias(
                "within_bound"
            ),
            (F.col("est_merged") == F.col("est_single")).alias(
                "merge_exact"
            ),
        )
    )


QUERIES["agg_cms_rollup"] = q_cms_rollup

ORACLE["agg_cms_rollup"] = """
WITH keys AS (SELECT unnest(range(1, 11)) AS user_key),
exact AS (
  SELECT user_id AS user_key, count(*) AS n
  FROM events WHERE user_id BETWEEN 1 AND 10 GROUP BY 1)
SELECT k.user_key,
  CAST(coalesce(e.n, 0) AS BIGINT) AS exact_n,
  TRUE AS never_under,
  TRUE AS within_bound,
  TRUE AS merge_exact
FROM keys k LEFT JOIN exact e ON e.user_key = k.user_key"""


def q_reservoir_sample(spark, sf_dir):
    """Fixed-size deterministic uniform sample — the distributed
    reservoir: rank every event by the md5 of its id and keep the
    lowest 200.  Hash ranking gives the exact semantics of a
    size-200 uniform-without-replacement draw (any id set is equally
    likely under the hash's uniformity) while staying embarrassingly
    distributable: Spark plans the cut as TakeOrderedAndProject —
    each task emits at most 200 rows, no global sort, no shared
    reservoir state to synchronize (the classic single-machine
    Algorithm R cannot shard).  Re-running on a grown corpus keeps a
    consistent sample (an id's hash never changes — ids only enter or
    leave the cut), the property audit samplers need.  sample_rank is
    a row_number over the 200 survivors (bounded window by
    construction)."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    h = F.md5(F.col("event_id").cast("string").cast("binary"))
    top = (
        ev.select("event_id", "user_id", "event_type", h.alias("__h"))
        .orderBy("__h")
        .limit(200)
    )
    return top.select(
        F.row_number()
        .over(Window.orderBy("__h"))
        .cast("bigint")
        .alias("sample_rank"),
        "event_id",
        "user_id",
        "event_type",
    )


QUERIES["agg_reservoir_sample"] = q_reservoir_sample

ORACLE["agg_reservoir_sample"] = """
WITH ranked AS (
  SELECT event_id, user_id, event_type,
    row_number() OVER (ORDER BY md5(CAST(event_id AS VARCHAR))) AS rk
  FROM events)
SELECT CAST(rk AS BIGINT) AS sample_rank, event_id, user_id, event_type
FROM ranked WHERE rk <= 200"""


def q_log_histogram_quantiles(spark, sf_dir):
    """Mergeable log-linear histogram quantiles (the DDSketch /
    HdrHistogram family — Masson et al. 2019, arXiv:1908.10693;
    both public): values bucket by binary octave (floor log2 via
    ``length(bin(cents)) - 1`` — INTEGER/string arithmetic, no libm
    log whose last bit differs across engines) subdivided 8 ways
    linearly, giving a <=12.5% relative-error guarantee per bucket.
    Completes the sketch quartet (HLL distinct / approx_top_k
    frequent / CMS point freq / log-histogram QUANTILES).

    The mergeable algebra is the point: per-DAY partial bucket counts
    roll up by plain addition, and ``merge_exact`` pins that the
    day-merged histogram EQUALS the single-pass one bucket-for-bucket
    — the property that lets 1000 executors sketch independently and
    a coordinator merge bytes, never rows.  Estimates carry PROVABLE
    claims next to oracle-exact values: ``le_exact`` (bucket lower
    bound never exceeds the true k-th value — guaranteed, the k-th
    element lives in the selected bucket) and ``rel_bound``
    (integer-cross-multiplied 12.5%+1-cent envelope).  Rank
    definition k = ceil(q*n/100) is shared with the oracle, so both
    engines select the same element.

    Scale shape: two hash aggregates (daily partials, merge), a
    per-type cumulative window over <=128 buckets, and a partitioned
    row_number for the exact twin — no global sort, no collect."""
    from pyspark.sql.window import Window

    ev = (
        _t(spark, sf_dir, "events")
        .select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
        .filter(F.col("cents") >= 1)
    )
    b = (
        ev.withColumn(
            "e", (F.length(F.expr("bin(cents)")) - 1).cast("int")
        )
        .withColumn("p", F.expr("shiftleft(1L, e)"))
        .withColumn("sub", F.expr("cast(((cents - p) * 8) div p as int)"))
        .withColumn("bucket_id", F.col("e") * 8 + F.col("sub"))
        .withColumn("lower_c", F.expr("p + (sub * p) div 8"))
        # referenced by the daily-partial, single-pass and exact-rank
        # branches: pin, or the scan + bucket arithmetic runs 3x
        .localCheckpoint(eager=True)
    )
    daily = b.groupBy("event_type", "day", "bucket_id").agg(
        F.count("*").alias("c"), F.min("lower_c").alias("lower_c")
    )
    merged = daily.groupBy("event_type", "bucket_id").agg(
        F.sum("c").alias("cnt"), F.min("lower_c").alias("lower_c")
    )
    single = b.groupBy("event_type", "bucket_id").agg(
        F.count("*").alias("cnt1")
    )
    hist = merged.join(single, ["event_type", "bucket_id"]).withColumn(
        "mok", F.col("cnt") == F.col("cnt1")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bucket_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    hist = hist.withColumn("cum", F.sum("cnt").over(wcum))
    per_type = hist.groupBy("event_type").agg(
        F.sum("cnt").alias("n"), F.bool_and("mok").alias("merge_exact")
    )
    ks = per_type.select(
        "event_type",
        "n",
        "merge_exact",
        F.explode(F.array(F.lit(50), F.lit(95), F.lit(99))).alias("q"),
    ).withColumn("k", F.expr("(q * n + 99) div 100"))
    est = (
        ks.join(hist.select("event_type", "bucket_id", "lower_c", "cum"),
                "event_type")
        .filter(F.col("cum") >= F.col("k"))
        .groupBy("event_type", "q", "n", "k", "merge_exact")
        .agg(F.min_by("lower_c", "bucket_id").alias("est_cents"))
    )
    ranked = b.select(
        F.col("event_type").alias("__et"),
        F.col("cents").alias("__exact"),
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("cents"))
        .alias("__rn"),
    )
    return (
        est.join(
            ranked,
            (F.col("event_type") == F.col("__et"))
            & (F.col("k") == F.col("__rn")),
        )
        .select(
            "event_type",
            F.col("q").cast("bigint").alias("q"),
            "n",
            "est_cents",
            F.col("__exact").alias("exact_cents"),
            (F.col("est_cents") <= F.col("__exact")).alias("le_exact"),
            (
                (F.col("__exact") - F.col("est_cents")) * 8
                <= F.col("est_cents") + F.lit(8)
            ).alias("rel_bound"),
            "merge_exact",
        )
    )


QUERIES["agg_log_histogram_quantiles"] = q_log_histogram_quantiles

ORACLE["agg_log_histogram_quantiles"] = """
WITH ev AS (
  SELECT event_type,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE CAST(floor(value * 100 + 0.5) AS BIGINT) >= 1),
b AS (
  SELECT event_type, cents,
    length(bin(cents)) - 1 AS e,
    (1::BIGINT << (length(bin(cents)) - 1)) AS p
  FROM ev),
bk AS (
  SELECT event_type, cents, e, p,
    ((cents - p) * 8) // p AS sub,
    e * 8 + ((cents - p) * 8) // p AS bucket_id,
    p + ((((cents - p) * 8) // p) * p) // 8 AS lower_c
  FROM b),
hist AS (
  SELECT event_type, bucket_id, min(lower_c) AS lower_c,
    count(*) AS cnt
  FROM bk GROUP BY 1, 2),
cum AS (
  SELECT *, sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM hist),
tot AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n FROM hist GROUP BY 1),
ks AS (
  SELECT event_type, n, q, (q * n + 99) // 100 AS k
  FROM tot CROSS JOIN (SELECT unnest([50, 95, 99]) AS q)),
est AS (
  SELECT ks.event_type, ks.q, ks.n, ks.k,
    min_by(cum.lower_c, cum.bucket_id) AS est_cents
  FROM ks JOIN cum ON cum.event_type = ks.event_type AND cum.cum >= ks.k
  GROUP BY 1, 2, 3, 4),
ranked AS (
  SELECT event_type, cents,
    row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn
  FROM bk)
SELECT est.event_type, CAST(est.q AS BIGINT) AS q, est.n,
  est.est_cents,
  ranked.cents AS exact_cents,
  est.est_cents <= ranked.cents AS le_exact,
  (ranked.cents - est.est_cents) * 8 <= est.est_cents + 8 AS rel_bound,
  TRUE AS merge_exact
FROM est JOIN ranked
  ON ranked.event_type = est.event_type AND ranked.rn = est.k"""


def q_clustering_coeff(spark, sf_dir):
    """Local clustering coefficient (Watts & Strogatz 1998) per node
    of the part co-occurrence graph — how close each part's
    neighborhood is to a clique, the standard community-tightness
    metric next to the triangle census: ``C(v) = 2*tri(v) /
    (deg(v)*(deg(v)-1))``, published as an exact integer micro-ratio
    (numerator cross-multiplied, integer division — tolerance-free).
    Reuses the degeneracy-oriented adjacency-intersection triangle
    enumeration and the canonical edge list; degrees come from one
    union-explode aggregate.  Output: the top-20 parts with deg >= 2
    by (coefficient, node) plus each node's raw triangle and degree
    counts, so the ranking is bound end-to-end.

    Scale shape: the triangle subtree is the measured 6.8 s-at-sf1
    array-intersection plan (BENCH_NOTES round 7); everything after
    is vocabulary-sized aggregates and a top-20 TakeOrdered cut."""
    from pyspark.sql.window import Window

    from cdc_pipe_line_spark.analytics import triangle_count

    li = _t(spark, sf_dir, "lineitem")
    op = (
        li.select("l_orderkey", F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    pairs = (
        op.alias("x")
        .join(op.alias("y"), "l_orderkey")
        .filter(F.col("x.p") < F.col("y.p"))
        .select(F.col("x.p").alias("a"), F.col("y.p").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    tri = triangle_count(pairs)
    tri_per_node = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_tri"))
    )
    deg = (
        pairs.select(F.col("a").alias("node"))
        .unionAll(pairs.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    scored = (
        deg.filter(F.col("deg") >= 2)
        .join(tri_per_node, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce("n_tri", F.lit(0)).cast("bigint").alias("n_tri"),
            F.expr(
                "(2 * coalesce(n_tri, 0) * 1000000) div (deg * (deg - 1))"
            ).alias("coeff_micro"),
        )
    )
    w = Window.orderBy(
        F.desc("coeff_micro"), F.desc("n_tri"), F.asc("node")
    )
    return (
        scored.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= 20)
        .select(
            F.col("pos").cast("bigint").alias("pos"),
            F.col("node").cast("bigint").alias("node"),
            F.col("deg").cast("bigint").alias("deg"),
            "n_tri",
            "coeff_micro",
        )
    )


# the EXACT (uncapped) coefficient stays registered as a diagnostic
# under the sim_knn_bruteforce convention: the primary name
# ``graph_clustering_coeff`` serves the degree-capped form (r10
# verdict item 2 — a user reaching for "clustering coefficient" must
# not get the quadratic wedge explosion on a celebrity vertex);
# reach for the exact one deliberately, eyes open on skew.
QUERIES["graph_clustering_coeff_exact_diagnostic"] = q_clustering_coeff

ORACLE["graph_clustering_coeff_exact_diagnostic"] = f"""
WITH {_COOC_SQL},
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e1.b = e2.a
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
tpn AS (
  SELECT node, count(*) AS n_tri FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri) GROUP BY 1),
deg AS (
  SELECT node, count(*) AS deg FROM (
    SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
scored AS (
  SELECT d.node, d.deg, COALESCE(t.n_tri, 0) AS n_tri,
    (2 * COALESCE(t.n_tri, 0) * 1000000) // (d.deg * (d.deg - 1))
      AS coeff_micro
  FROM deg d LEFT JOIN tpn t USING (node) WHERE d.deg >= 2)
SELECT CAST(pos AS BIGINT) AS pos, CAST(node AS BIGINT) AS node,
  CAST(deg AS BIGINT) AS deg, CAST(n_tri AS BIGINT) AS n_tri,
  CAST(coeff_micro AS BIGINT) AS coeff_micro
FROM (
  SELECT *, row_number() OVER (
      ORDER BY coeff_micro DESC, n_tri DESC, node ASC) AS pos
  FROM scored) WHERE pos <= 20"""


def q_exact_median_twopass(spark, sf_dir):
    """EXACT global median without per-group value buffering — the
    shape that survives where ``percentile()`` cannot (exact
    percentiles buffer every value of a group in one aggregation
    buffer; a 100 TB global median does not fit):

    1. one min/max/count reduction (bounds + target rank);
    2. one 8192-bucket histogram over the integer-cents domain
       (hash-agg, mergeable partials) — the bucket holding the target
       rank falls out of a cumulative scan of <= 8192 rows;
    3. one FILTERED pass over that bucket only (predicate pushed to
       the scan), exact per-value counts, and the rank lands on the
       answer.

    Every pass is a plain map-side-combinable aggregate; driver-side
    state is the histogram (bounded at 8192 rows by construction).
    Published: row count, target rank (lower median, ``(n+1)//2``),
    and the exact median in cents — the DuckDB oracle checks it with
    ``quantile_disc(0.5)``, a genuinely independent formulation."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.round(F.col("l_extendedprice") * 100, 0)
            .cast("bigint")
            .alias("cents")
        )
        .localCheckpoint(eager=True)  # feeds bounds + histogram + pass 2
    )
    b = li.agg(
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
        F.count("*").alias("n"),
    ).first()
    lo, hi, n = int(b["lo"]), int(b["hi"]), int(b["n"])
    w = (hi - lo) // 8192 + 1
    rank = (n + 1) // 2
    hist = (
        li.groupBy(F.expr(f"(cents - {lo}) div {w}").alias("b"))
        .agg(F.count("*").alias("c"))
        .collect()  # bounded: <= 8192 rows by construction
    )
    cum = 0
    tb = None
    for r in sorted(hist, key=lambda r: r["b"]):
        if cum + r["c"] >= rank:
            tb, cum_before = int(r["b"]), cum
            break
        cum += int(r["c"])
    vals = (
        li.filter(
            (F.col("cents") >= lo + tb * w)
            & (F.col("cents") < lo + (tb + 1) * w)
        )
        .groupBy("cents")
        .agg(F.count("*").alias("c"))
    )
    # cumulative over the bucket's <= w <= 8193 distinct values —
    # aggregate output, so the unpartitioned window is bounded
    from pyspark.sql.window import Window

    med = (
        vals.withColumn(
            "cumv",
            F.sum("c").over(
                Window.orderBy("cents").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
        .filter(F.col("cumv") >= rank - cum_before)
        .agg(F.min("cents").alias("median_cents"))
    )
    return med.select(
        F.lit(n).cast("bigint").alias("n_rows"),
        F.lit(rank).cast("bigint").alias("target_rank"),
        F.col("median_cents").cast("bigint").alias("median_cents"),
    )


QUERIES["agg_exact_median_twopass"] = q_exact_median_twopass

ORACLE["agg_exact_median_twopass"] = """
WITH c AS (
  SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
  FROM lineitem)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
  CAST((count(*) + 1) // 2 AS BIGINT) AS target_rank,
  CAST(quantile_disc(cents, 0.5) AS BIGINT) AS median_cents
FROM c"""


def q_scc_functional(spark, sf_dir):
    """SCC decomposition of a FUNCTIONAL graph by parallel pointer
    doubling (:func:`analytics.functional_scc`) — the Pollard-rho
    structure analysis: the user domain is ranked dense, every node
    points to ``(i*i + 1) mod n`` (the classic rho map), and 14
    doubling rounds — now ``max(14, ceil(log2 n))``, DERIVED from the
    already-computed node count instead of a fixed budget a bigger
    scale factor could silently outgrow (VERDICT r10 item 3; the
    guard in :func:`analytics.functional_scc` enforces ``2^rounds
    >= n``) — classify each node as cycle member or tail and label
    it with its SCC representative (cycle minimum; tails are
    singleton SCCs).  The oracle unrolls 14 doubling stages in SQL
    (the kcore stage-replay discipline); outputs are
    rounds-INVARIANT once ``2^rounds >= n`` (``mn`` saturates on
    every cycle and the iterated image is already the cycle set), so
    the fixed unroll stays parity-exact at every SF the oracle runs
    (n <= 16384 through sf1) while the Spark side scales past it.

    Scale shape: log2(n) shuffle self-joins of the n-row pointer
    table — parallel prefix instead of an O(n) sequential walk; at a
    billion nodes that is 30 bounded joins."""
    from pyspark.sql.window import Window

    from cdc_pipe_line_spark.analytics import functional_scc

    ev = _t(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    n = users.count()
    ranked = users.select(
        "user_id",
        (F.row_number().over(Window.orderBy("user_id")) - 1).alias("i"),
    ).localCheckpoint(eager=True)
    f = ranked.select(
        F.col("i").alias("node"),
        ((F.col("i") * F.col("i") + 1) % F.lit(n)).alias("nxt"),
    )
    rounds = max(14, max(1, n - 1).bit_length())
    scc = functional_scc(f, rounds=rounds, n_nodes=n)
    back = ranked.select(
        F.col("i").alias("scc_id"), F.col("user_id").alias("scc_user")
    )
    return (
        scc.join(
            F.broadcast(
                ranked.select(F.col("i").alias("node"), "user_id")
            ),
            "node",
        )
        .join(F.broadcast(back), "scc_id")
        .select(
            F.col("user_id").cast("bigint").alias("user_id"),
            "on_cycle",
            F.col("scc_user").cast("bigint").alias("scc_user"),
        )
    )


def _scc_oracle_sql(rounds: int = 14) -> str:
    """DuckDB replay of q_scc_functional: the same rho map and the
    same ``rounds`` unrolled doubling stages (AS MATERIALIZED — the
    chained-CTE inlining trap)."""
    stages = [
        "s0 AS MATERIALIZED (SELECT i AS node, (i*i + 1) % n AS jump,"
        " i AS mn FROM idx, cnt)"
    ]
    for r in range(1, rounds + 1):
        p = f"s{r - 1}"
        stages.append(
            f"s{r} AS MATERIALIZED (SELECT a.node, b.jump AS jump,"
            f" least(a.mn, b.mn) AS mn"
            f" FROM {p} a JOIN {p} b ON b.node = a.jump)"
        )
    last = f"s{rounds}"
    body = ",\n".join(stages)
    return f"""
WITH idx AS MATERIALIZED (
  SELECT user_id, row_number() OVER (ORDER BY user_id) - 1 AS i
  FROM (SELECT DISTINCT user_id FROM events)),
cnt AS (SELECT count(*) AS n FROM idx),
{body},
img AS (SELECT DISTINCT jump FROM {last}),
lab AS (
  SELECT s.node,
    i2.jump IS NOT NULL AS on_cycle,
    CASE WHEN i2.jump IS NOT NULL THEN s.mn ELSE s.node END AS scc_id
  FROM {last} s LEFT JOIN img i2 ON i2.jump = s.node)
SELECT CAST(u.user_id AS BIGINT) AS user_id, lab.on_cycle,
  CAST(su.user_id AS BIGINT) AS scc_user
FROM lab
JOIN idx u ON u.i = lab.node
JOIN idx su ON su.i = lab.scc_id"""


QUERIES["graph_scc_functional"] = q_scc_functional
ORACLE["graph_scc_functional"] = _scc_oracle_sql()


def q_clustering_coeff_capped(spark, sf_dir):
    """Degree-CAPPED clustering coefficient — the celebrity-vertex
    mitigation for the exact triangle subtree (VERDICT r8 item 6):
    each vertex keeps only its 64 smallest out-neighbors by the
    SQL-replayable multiplicative hash (per-key top-C, a
    WindowGroupLimit rank cut — deterministic, so the oracle replays
    the identical subgraph), and triangles + coefficients are
    computed EXACTLY on that capped subgraph.  A hub with a million
    co-purchase neighbors contributes arrays of at most 64 to the
    adjacency intersection instead of a quadratic wedge explosion;
    published ``was_capped`` flags every vertex whose neighborhood
    was cut, so consumers know which coefficients are subgraph-exact
    vs graph-exact (uncut vertices match ``graph_clustering_coeff``
    by construction).

    Scale shape: the cap bounds the per-edge intersection work by
    C=64 regardless of skew — soaked on a celebrity-vertex fixture in
    tools/skew_soak.py; everything downstream is vocabulary-sized."""
    from pyspark.sql.window import Window

    from cdc_pipe_line_spark.analytics import triangle_count

    cap = 64
    li = _t(spark, sf_dir, "lineitem")
    op = (
        li.select("l_orderkey", F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    pairs = (
        op.alias("x")
        .join(op.alias("y"), "l_orderkey")
        .filter(F.col("x.p") < F.col("y.p"))
        .select(F.col("x.p").alias("a"), F.col("y.p").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    w_cap = Window.partitionBy("a").orderBy(
        F.expr("((b % 1000000007) * 2654435761) % 2147483648"), "b"
    )
    capped = (
        pairs.withColumn("__r", F.row_number().over(w_cap))
        .filter(F.col("__r") <= cap)
        .drop("__r")
        .localCheckpoint(eager=True)
    )
    tri = triangle_count(capped)
    tri_per_node = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_tri"))
    )
    deg_capped = (
        capped.select(F.col("a").alias("node"))
        .unionAll(capped.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg_capped"))
    )
    deg_full = (
        pairs.select(F.col("a").alias("node"))
        .unionAll(pairs.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg_full"))
    )
    scored = (
        deg_capped.filter(F.col("deg_capped") >= 2)
        .join(deg_full, "node")
        .join(tri_per_node, "node", "left")
        .select(
            "node",
            "deg_full",
            "deg_capped",
            F.coalesce("n_tri", F.lit(0)).cast("bigint").alias("n_tri"),
            F.expr(
                "(2 * coalesce(n_tri, 0) * 1000000)"
                " div (deg_capped * (deg_capped - 1))"
            ).alias("coeff_micro"),
            (F.col("deg_full") != F.col("deg_capped")).alias("was_capped"),
        )
    )
    w = Window.orderBy(
        F.desc("coeff_micro"), F.desc("n_tri"), F.asc("node")
    )
    return (
        scored.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= 20)
        .select(
            F.col("pos").cast("bigint").alias("pos"),
            F.col("node").cast("bigint").alias("node"),
            F.col("deg_full").cast("bigint").alias("deg_full"),
            F.col("deg_capped").cast("bigint").alias("deg_capped"),
            "n_tri",
            "coeff_micro",
            "was_capped",
        )
    )


# PRIMARY name — the skew-safe default (see the swap note above the
# exact diagnostic's registration)
QUERIES["graph_clustering_coeff"] = q_clustering_coeff_capped

ORACLE["graph_clustering_coeff"] = f"""
WITH {_COOC_SQL},
ec AS (
  SELECT a, b FROM (
    SELECT a, b, row_number() OVER (
        PARTITION BY a
        ORDER BY ((b % 1000000007) * 2654435761) % 2147483648, b
      ) AS r
    FROM e) WHERE r <= 64),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM ec e1
  JOIN ec e2 ON e1.b = e2.a
  JOIN ec e3 ON e3.a = e1.a AND e3.b = e2.b),
tpn AS (
  SELECT node, count(*) AS n_tri FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri) GROUP BY 1),
degc AS (
  SELECT node, count(*) AS deg_capped FROM (
    SELECT a AS node FROM ec UNION ALL SELECT b FROM ec) GROUP BY 1),
degf AS (
  SELECT node, count(*) AS deg_full FROM (
    SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
scored AS (
  SELECT c.node, f.deg_full, c.deg_capped, COALESCE(t.n_tri, 0) AS n_tri,
    (2 * COALESCE(t.n_tri, 0) * 1000000)
      // (c.deg_capped * (c.deg_capped - 1)) AS coeff_micro,
    f.deg_full != c.deg_capped AS was_capped
  FROM degc c
  JOIN degf f USING (node)
  LEFT JOIN tpn t USING (node)
  WHERE c.deg_capped >= 2)
SELECT CAST(pos AS BIGINT) AS pos, CAST(node AS BIGINT) AS node,
  CAST(deg_full AS BIGINT) AS deg_full,
  CAST(deg_capped AS BIGINT) AS deg_capped,
  CAST(n_tri AS BIGINT) AS n_tri,
  CAST(coeff_micro AS BIGINT) AS coeff_micro, was_capped
FROM (
  SELECT *, row_number() OVER (
      ORDER BY coeff_micro DESC, n_tri DESC, node ASC) AS pos
  FROM scored) WHERE pos <= 20"""


def q_kcore(spark, sf_dir):
    """k-core decomposition (k=80, 10 simultaneous-peel rounds) of
    the part co-occurrence graph: per part the round it was peeled
    (NULL = survives in the 80-core) plus a converged flag proving
    the fixpoint landed inside the round budget.  The oracle unrolls
    the identical 10 peel stages in SQL, so every round's
    simultaneous-removal semantics is hash-checked, not just the
    final core."""
    from cdc_pipe_line_spark.analytics import kcore_peel

    li = _t(spark, sf_dir, "lineitem")
    op = (
        li.select("l_orderkey", F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = op.select(F.col("p").alias("node")).distinct()
    pairs = (
        op.alias("x")
        .join(op.alias("y"), "l_orderkey")
        .filter(F.col("x.p") < F.col("y.p"))
        .select(F.col("x.p").alias("a"), F.col("y.p").alias("b"))
        .distinct()
    )
    removed, converged = kcore_peel(nodes, pairs, k=80, rounds=10)
    return nodes.join(removed, "node", "left").select(
        F.col("node").cast("bigint").alias("node"),
        "removed_round",
        F.col("removed_round").isNull().alias("in_core"),
        F.lit(converged).alias("converged"),
    )


QUERIES["graph_kcore"] = q_kcore


def _kcore_oracle_sql(k: int = 80, rounds: int = 10) -> str:
    stages = []
    for i in range(1, rounds + 1):
        p = i - 1
        stages.append(
            f"""d{i} AS MATERIALIZED (
  SELECT node, count(*) AS c FROM (
    SELECT a AS node FROM e{p} UNION ALL SELECT b AS node FROM e{p})
  GROUP BY 1),
r{i} AS MATERIALIZED (
  SELECT n{p}.node FROM n{p} LEFT JOIN d{i} USING (node)
  WHERE COALESCE(c, 0) < {k}),
n{i} AS MATERIALIZED (
  SELECT node FROM n{p}
  WHERE node NOT IN (SELECT node FROM r{i})),
e{i} AS MATERIALIZED (
  SELECT a, b FROM e{p}
  WHERE a IN (SELECT node FROM n{i})
    AND b IN (SELECT node FROM n{i}))"""
        )
    rm_union = "\nUNION ALL ".join(
        f"SELECT node, {i} AS rr FROM r{i}" for i in range(1, rounds + 1)
    )
    return f"""
WITH {_COOC_SQL},
n0 AS MATERIALIZED (SELECT DISTINCT p AS node FROM op),
e0 AS MATERIALIZED (SELECT a, b FROM e),
{",".join(stages)},
rm_all AS ({rm_union}),
conv AS (SELECT count(*) = 0 AS converged FROM r{rounds})
SELECT CAST(n0.node AS BIGINT) AS node,
  CAST(rm_all.rr AS BIGINT) AS removed_round,
  rm_all.rr IS NULL AS in_core,
  conv.converged
FROM n0 LEFT JOIN rm_all USING (node) CROSS JOIN conv"""


ORACLE["graph_kcore"] = _kcore_oracle_sql()


def q_bitmap_distinct(spark, sf_dir):
    """EXACT mergeable distinct counting via fixed-width bitmap words
    (the roaring-bitmap rollup shape, exact twin of the HLL sketch
    family): user ids map to ``(word = id div 63, bit = id % 63)``,
    per-type bitmaps are one ``bit_or`` hash-aggregate, distinct =
    ``sum(bit_count(word))`` — and the ``__total__`` row is computed
    by OR-MERGING the per-type word bitmaps, proving in-query that
    the aggregate is mergeable without rescanning the fact (the
    incremental-rollup property exact distinct normally lacks).  63
    bits per word keeps every shift positive (bit 63 overflows
    signed int64 in both engines).  Exact countDistinct rides along
    per group; ``agree`` pins bitmap == exact."""
    ev = _t(spark, sf_dir, "events")
    chunks = (
        ev.groupBy(
            "event_type", (F.col("user_id") / 63).cast("bigint").alias("__w")
        )
        .agg(
            F.expr(
                "bit_or(shiftleft(CAST(1 AS BIGINT), "
                "CAST(user_id % 63 AS INT)))"
            ).alias("__bm")
        )
        .localCheckpoint(eager=True)
    )
    per_type = chunks.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_words"),
        F.sum(F.bit_count("__bm")).cast("bigint").alias("n_distinct_bitmap"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_distinct_exact"),
    )
    typed = per_type.join(exact, "event_type").select(
        F.col("event_type").alias("grp"),
        "n_events",
        "n_words",
        "n_distinct_bitmap",
        "n_distinct_exact",
        (F.col("n_distinct_bitmap") == F.col("n_distinct_exact")).alias(
            "agree"
        ),
    )
    merged = chunks.groupBy("__w").agg(
        F.expr("bit_or(__bm)").alias("__bm")
    )
    tot = (
        merged.agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum(F.bit_count("__bm")).cast("bigint").alias(
                "n_distinct_bitmap"
            ),
        )
        .crossJoin(
            F.broadcast(
                ev.agg(
                    F.count("*").cast("bigint").alias("n_events"),
                    F.countDistinct("user_id").cast("bigint").alias(
                        "n_distinct_exact"
                    ),
                )
            )
        )
        .select(
            F.lit("__total__").alias("grp"),
            "n_events",
            "n_words",
            "n_distinct_bitmap",
            "n_distinct_exact",
            (F.col("n_distinct_bitmap") == F.col("n_distinct_exact")).alias(
                "agree"
            ),
        )
    )
    return typed.unionByName(tot)


QUERIES["agg_bitmap_distinct"] = q_bitmap_distinct

ORACLE["agg_bitmap_distinct"] = """
WITH bm_chunks AS MATERIALIZED (
  SELECT event_type, user_id // 63 AS w,
    bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INT)) AS bm
  FROM events GROUP BY 1, 2),
bm_type AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_words,
    CAST(sum(bit_count(bm)) AS BIGINT) AS n_distinct_bitmap
  FROM bm_chunks GROUP BY 1),
bm_exact AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
    CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_exact
  FROM events GROUP BY 1),
bm_merged AS (
  SELECT w, bit_or(bm) AS bm FROM bm_chunks GROUP BY 1)
SELECT t.event_type AS grp, e.n_events, t.n_words,
  t.n_distinct_bitmap, e.n_distinct_exact,
  t.n_distinct_bitmap = e.n_distinct_exact AS agree
FROM bm_type t JOIN bm_exact e USING (event_type)
UNION ALL
SELECT '__total__',
  (SELECT CAST(count(*) AS BIGINT) FROM events),
  (SELECT CAST(count(*) AS BIGINT) FROM bm_merged),
  (SELECT CAST(sum(bit_count(bm)) AS BIGINT) FROM bm_merged),
  (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events),
  (SELECT CAST(sum(bit_count(bm)) AS BIGINT) FROM bm_merged)
    = (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events)"""


def q_random_walks(spark, sf_dir):
    """DeepWalk/node2vec-style random-walk CORPUS GENERATION over the
    part co-occurrence graph (the graph-embedding training-data
    pipeline step), with hash-deterministic "randomness": from each
    seed (every 50th part), 4 steps where the next hop is the
    neighbor minimizing the portable md5-60bit hash of
    ``walk|step|cur|neighbor`` — statistically uniform over
    neighbors, yet exactly replayable, so the ENTIRE walk corpus is
    hash-checked hop by hop (the xxhash-seeded sampling queries bind
    via claims instead; this one binds the path itself).

    Scale shape: one frontier frame per step (seed-count rows)
    joined against the edge list — 4 bounded shuffles; the per-walk
    argmin window partitions on walk_id.  Walk count scales with the
    seed stride, never the corpus."""
    from pyspark.sql.window import Window

    from cdc_pipe_line_spark.text import shingle_hash60

    li = _t(spark, sf_dir, "lineitem")
    op = (
        li.select("l_orderkey", F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    pairs = (
        op.alias("x")
        .join(op.alias("y"), "l_orderkey")
        .filter(F.col("x.p") < F.col("y.p"))
        .select(F.col("x.p").alias("a"), F.col("y.p").alias("b"))
        .distinct()
    )
    edges = (
        pairs.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(pairs.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .localCheckpoint(eager=True)
    )
    cur = (
        op.select(F.col("p").alias("walk_id"))
        .distinct()
        .filter(F.col("walk_id") % 50 == 0)
        .withColumn("cur", F.col("walk_id"))
    )
    out = cur.select(
        "walk_id", F.lit(0).cast("bigint").alias("pos"),
        F.col("cur").cast("bigint").alias("node"),
    )
    for s in range(1, 5):
        hop = (
            cur.join(edges, cur["cur"] == edges["u"])
            .withColumn(
                "__hk",
                shingle_hash60(
                    F.concat_ws(
                        "|", "walk_id", F.lit(s), "u", "v"
                    )
                ),
            )
        )
        wpick = Window.partitionBy("walk_id").orderBy(
            F.asc("__hk"), F.asc("v")
        )
        cur = (
            hop.withColumn("__rn", F.row_number().over(wpick))
            .filter(F.col("__rn") == 1)
            .select("walk_id", F.col("v").alias("cur"))
        )
        out = out.unionByName(
            cur.select(
                "walk_id",
                F.lit(s).cast("bigint").alias("pos"),
                F.col("cur").cast("bigint").alias("node"),
            )
        )
    return out


QUERIES["graph_random_walks"] = q_random_walks


def _rw_oracle_sql(steps: int = 4) -> str:
    def hk(step: int) -> str:
        return (
            "CAST('0x' || substr(md5(concat_ws('|', "
            "CAST(w.walk_id AS VARCHAR), "
            f"'{step}', "
            "CAST(w.cur AS VARCHAR), CAST(e.v AS VARCHAR))), 1, 15) "
            "AS BIGINT)"
        )

    stages = []
    for s in range(1, steps + 1):
        p = s - 1
        stages.append(
            f"""rws{s} AS MATERIALIZED (
  SELECT walk_id, v AS cur FROM (
    SELECT w.walk_id, e.v,
      row_number() OVER (PARTITION BY w.walk_id
        ORDER BY {hk(s)} ASC, e.v ASC) AS rn
    FROM rws{p} w JOIN rw_e e ON e.u = w.cur)
  WHERE rn = 1)"""
        )
    unions = "\nUNION ALL ".join(
        f"SELECT walk_id, {s} AS pos, cur AS node FROM rws{s}"
        for s in range(1, steps + 1)
    )
    return f"""
WITH {_COOC_SQL},
rw_e AS MATERIALIZED (
  SELECT a AS u, b AS v FROM e UNION ALL SELECT b AS u, a AS v FROM e),
rws0 AS MATERIALIZED (
  SELECT p AS walk_id, p AS cur FROM (SELECT DISTINCT p FROM op)
  WHERE p % 50 = 0),
{",".join(stages)}
SELECT CAST(walk_id AS BIGINT) AS walk_id, CAST(pos AS BIGINT) AS pos,
  CAST(node AS BIGINT) AS node
FROM (SELECT walk_id, 0 AS pos, cur AS node FROM rws0
UNION ALL {unions})"""


ORACLE["graph_random_walks"] = _rw_oracle_sql()


def q_personalized_pagerank(spark, sf_dir):
    """Personalized PageRank (teleport restarts at the seed set only
    — the recommendation/seed-expansion twin of the global
    graph_pagerank_sources) over the part co-occurrence graph from
    every-100th-part seeds, 3 unrolled iterations, top-20 by rank.
    Same double-pinning discipline as the global PageRank oracle;
    seeds score highest by construction and their neighborhoods
    follow — the oracle replays the seed vector and every
    iteration."""
    from pyspark.sql.window import Window

    from cdc_pipe_line_spark.analytics import personalized_pagerank

    li = _t(spark, sf_dir, "lineitem")
    op = (
        li.select("l_orderkey", F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    pairs = (
        op.alias("x")
        .join(op.alias("y"), "l_orderkey")
        .filter(F.col("x.p") < F.col("y.p"))
        .select(F.col("x.p").alias("a"), F.col("y.p").alias("b"))
        .distinct()
    )
    edges = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionAll(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    nodes = op.select(F.col("p").alias("node")).distinct()
    seeds = nodes.filter(F.col("node") % 100 == 0)
    pr = personalized_pagerank(edges, seeds, n_iter=3, damping=0.85)
    top = (
        pr.select(
            F.col("node").cast("bigint").alias("node"),
            F.round("rank", 8).alias("rank"),
        )
        .orderBy(F.col("rank").desc(), F.col("node").asc())
        .limit(20)
    )
    w = Window.orderBy(F.col("rank").desc(), F.col("node").asc())
    return top.withColumn(
        "pos", F.row_number().over(w).cast("bigint")
    ).withColumn("is_seed", F.col("node") % 100 == 0)


QUERIES["graph_personalized_pagerank"] = q_personalized_pagerank

_PPR_STEP = """
SELECT v.node, v.e,
  (1 - d) * v.e + d * coalesce(s.inflow, CAST(0.0 AS DOUBLE)) AS rank
FROM pp_verts v CROSS JOIN params LEFT JOIN (
  SELECT e2.dst AS node, sum(r.rank / d2.outdeg) AS inflow
  FROM pp_edges e2 JOIN {prev} r ON e2.src = r.node
  JOIN pp_deg d2 ON e2.src = d2.src
  GROUP BY 1) s ON v.node = s.node"""

ORACLE["graph_personalized_pagerank"] = f"""
WITH {_COOC_SQL},
params AS (SELECT CAST(0.85 AS DOUBLE) AS d),
pp_edges AS (
  SELECT a AS src, b AS dst FROM e
  UNION ALL SELECT b AS src, a AS dst FROM e),
pp_nodes AS (SELECT DISTINCT p AS node FROM op),
pp_deg AS (SELECT src, count(*) AS outdeg FROM pp_edges GROUP BY 1),
pp_ns AS (SELECT count(*) AS ns FROM pp_nodes WHERE node % 100 = 0),
pp_verts AS (
  SELECT node,
    CASE WHEN node % 100 = 0 THEN CAST(1.0 AS DOUBLE) / ns
         ELSE CAST(0.0 AS DOUBLE) END AS e
  FROM pp_nodes CROSS JOIN pp_ns),
pr0 AS (SELECT node, e, e AS rank FROM pp_verts),
pr1 AS ({_PPR_STEP.format(prev='pr0')}),
pr2 AS ({_PPR_STEP.format(prev='pr1')}),
pr3 AS ({_PPR_STEP.format(prev='pr2')}),
top AS (
  SELECT node, round(rank, 8) AS rank FROM pr3
  ORDER BY round(rank, 8) DESC, node ASC LIMIT 20)
SELECT CAST(node AS BIGINT) AS node, rank,
  CAST(row_number() OVER (ORDER BY rank DESC, node ASC) AS BIGINT) AS pos,
  node % 100 = 0 AS is_seed
FROM top"""


def q_decay_engagement(spark, sf_dir):
    """Exponential time-decay engagement scoring (the recency-
    weighted feature every ranking/CRM pipeline computes):
    ``score(u) = sum(value_i * exp(-0.1 * age_days_i))`` anchored at
    the corpus max day.  Float discipline: exp sees only products of
    exact integers with the pinned literal, and the per-user sum is
    a FIXED-ORDER fold over (ts, event_id) — an unordered SUM of
    doubles would be partial-aggregation-order nondeterministic and
    could never hash-match; output rounded with the engine-neutral
    floor(x*1e4+0.5)/1e4 idiom.

    Scale shape: one ordered-collect aggregate per user (per-user
    arrays bounded by activity, the ordered-listagg discipline), the
    anchor is a broadcast 1-row aggregate."""
    ev = _t(spark, sf_dir, "events")
    wm = ev.agg(F.max(F.to_date("ts")).alias("__d0"))
    terms = ev.crossJoin(F.broadcast(wm)).select(
        "user_id",
        "ts",
        "event_id",
        (
            F.col("value")
            * F.exp(
                F.lit(-0.1)
                * F.datediff("__d0", F.to_date("ts")).cast("double")
            )
        ).alias("__t"),
    )
    return (
        terms.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "__t"))
                    ),
                    lambda x: x["__t"],
                ),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ).alias("__s"),
        )
        .select(
            "user_id",
            "n_events",
            (F.floor(F.col("__s") * 10000 + F.lit(0.5)) / 10000).alias(
                "decay_score"
            ),
        )
    )


QUERIES["agg_decay_engagement"] = q_decay_engagement

ORACLE["agg_decay_engagement"] = """
WITH d0 AS (SELECT max(CAST(ts AS DATE)) AS d0 FROM events),
terms AS (
  SELECT user_id, ts, event_id,
    value * exp(CAST(-0.1 AS DOUBLE)
      * CAST(date_diff('day', CAST(ts AS DATE), d0) AS DOUBLE)) AS t
  FROM events CROSS JOIN d0)
SELECT user_id,
  CAST(count(*) AS BIGINT) AS n_events,
  floor(list_sum(list(t ORDER BY ts, event_id)) * 10000 + 0.5) / 10000
    AS decay_score
FROM terms GROUP BY user_id"""


def q_delta_contribution(spark, sf_dir):
    """Metric DELTA-CONTRIBUTION analysis (the root-cause
    decomposition behind every "why did revenue move" dashboard):
    split the window into first-half vs second-half 15-day periods,
    decompose the total value delta by event type in EXACT integer
    cents (the revenue-cents idiom), and rank each type's share of
    the move — share as an exact micro-ratio of the total delta,
    NULL when the total delta is zero (division guard identical in
    both engines).  One aggregate over the fact, one 5-row ranking
    window."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    d0 = ev.agg(F.min(F.to_date("ts")).alias("__d0"))
    cents = F.expr("CAST(round(value * 100, 0) AS BIGINT)")
    per = (
        ev.crossJoin(F.broadcast(d0))
        .select(
            "event_type",
            F.when(
                F.datediff(F.to_date("ts"), F.col("__d0")) <= 14, F.lit("p1")
            )
            .otherwise(F.lit("p2"))
            .alias("period"),
            cents.alias("__c"),
        )
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("period") == "p1", F.col("__c")).otherwise(0))
            .cast("bigint")
            .alias("cents_p1"),
            F.sum(F.when(F.col("period") == "p2", F.col("__c")).otherwise(0))
            .cast("bigint")
            .alias("cents_p2"),
        )
        .withColumn("delta_cents", F.col("cents_p2") - F.col("cents_p1"))
    )
    tot = per.agg(F.sum("delta_cents").alias("__tot"))
    w = Window.orderBy(
        F.abs(F.col("delta_cents")).desc(), F.asc("event_type")
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "cents_p1",
            "cents_p2",
            "delta_cents",
            F.when(
                F.col("__tot") != 0,
                F.expr("(1000000 * delta_cents) div __tot"),
            ).alias("share_micro"),
        )
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
    )


QUERIES["agg_delta_contribution"] = q_delta_contribution

ORACLE["agg_delta_contribution"] = """
WITH d0 AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
per AS (
  SELECT event_type,
    CAST(sum(CASE WHEN date_diff('day', d0, CAST(ts AS DATE)) <= 14
      THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END) AS BIGINT)
      AS cents_p1,
    CAST(sum(CASE WHEN date_diff('day', d0, CAST(ts AS DATE)) > 14
      THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END) AS BIGINT)
      AS cents_p2
  FROM events CROSS JOIN d0 GROUP BY 1),
pd AS (
  SELECT *, cents_p2 - cents_p1 AS delta_cents FROM per),
tot AS (SELECT sum(delta_cents) AS t FROM pd)
SELECT event_type, cents_p1, cents_p2,
  CAST(delta_cents AS BIGINT) AS delta_cents,
  CASE WHEN t != 0
    THEN CAST((1000000 * delta_cents) // t AS BIGINT) END AS share_micro,
  CAST(row_number() OVER (ORDER BY abs(delta_cents) DESC, event_type ASC)
    AS BIGINT) AS rank
FROM pd CROSS JOIN tot"""


def q_hits_scores(spark, sf_dir):
    """HITS hubs-and-authorities (Kleinberg 1999) on the bipartite
    order -> part graph: orders are hubs (baskets that touch many
    authoritative parts), parts are authorities.  Three unrolled
    mutual-reinforcement iterations with L2 normalization each half-
    step; the sqrt is IEEE-safe and the norm divides through at
    ~1e-16 relative error, so the 8dp output rounding is exact
    cross-engine (the PageRank float discipline).  Top-15 authorities
    + top-15 hubs, probe-tagged in one frame.

    Scale shape: per iteration one edge-list join + hash-aggregate
    each direction (the PR shape); norms are 1-row aggregates
    broadcast back; rankings are TakeOrdered cuts."""
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem")
    edges = (
        li.select(
            F.col("l_orderkey").alias("h"), F.col("l_partkey").alias("a")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    hubs = edges.select("h").distinct().withColumn("hub", F.lit(1.0))
    for _ in range(3):
        auth = (
            edges.join(hubs, "h")
            .groupBy("a")
            .agg(F.sum("hub").alias("auth"))
        )
        anorm = auth.agg(
            F.sqrt(F.sum(F.col("auth") * F.col("auth"))).alias("__n")
        )
        auth = (
            auth.crossJoin(F.broadcast(anorm))
            .select("a", (F.col("auth") / F.col("__n")).alias("auth"))
            .localCheckpoint(eager=True)
        )
        hub = (
            edges.join(auth, "a")
            .groupBy("h")
            .agg(F.sum("auth").alias("hub"))
        )
        hnorm = hub.agg(
            F.sqrt(F.sum(F.col("hub") * F.col("hub"))).alias("__n")
        )
        # node-sized pins per half-step: unpinned, each norm agg and
        # the next iteration re-derive the whole mutual-reinforcement
        # subtree (~2x per half-step — measured 10.3 s vs 3 s at
        # sf0.01)
        hubs = (
            hub.crossJoin(F.broadcast(hnorm))
            .select("h", (F.col("hub") / F.col("__n")).alias("hub"))
            .localCheckpoint(eager=True)
        )
    wa = Window.orderBy(F.desc("score"), F.asc("node"))
    top_a = (
        auth.select(
            F.lit("authority").alias("kind"),
            F.col("a").cast("bigint").alias("node"),
            F.round("auth", 8).alias("score"),
        )
        .withColumn("pos", F.row_number().over(wa).cast("bigint"))
        .filter(F.col("pos") <= 15)
    )
    top_h = (
        hubs.select(
            F.lit("hub").alias("kind"),
            F.col("h").cast("bigint").alias("node"),
            F.round("hub", 8).alias("score"),
        )
        .withColumn("pos", F.row_number().over(wa).cast("bigint"))
        .filter(F.col("pos") <= 15)
    )
    return top_a.unionByName(top_h)


QUERIES["graph_hits_scores"] = q_hits_scores

_HITS_STEP = """
a{i} AS MATERIALIZED (
  SELECT a, auth / n AS auth FROM (
    SELECT e.a, sum(h{p}.hub) AS auth
    FROM he e JOIN h{p} ON h{p}.h = e.h GROUP BY 1) x
  CROSS JOIN (
    SELECT sqrt(sum(auth * auth)) AS n FROM (
      SELECT e.a, sum(h{p}.hub) AS auth
      FROM he e JOIN h{p} ON h{p}.h = e.h GROUP BY 1))),
h{i} AS MATERIALIZED (
  SELECT h, hub / n AS hub FROM (
    SELECT e.h, sum(a{i}.auth) AS hub
    FROM he e JOIN a{i} ON a{i}.a = e.a GROUP BY 1) x
  CROSS JOIN (
    SELECT sqrt(sum(hub * hub)) AS n FROM (
      SELECT e.h, sum(a{i}.auth) AS hub
      FROM he e JOIN a{i} ON a{i}.a = e.a GROUP BY 1)))"""

ORACLE["graph_hits_scores"] = f"""
WITH he AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS h, l_partkey AS a FROM lineitem),
h0 AS MATERIALIZED (
  SELECT DISTINCT h, CAST(1.0 AS DOUBLE) AS hub FROM he),
{_HITS_STEP.format(i=1, p=0)},
{_HITS_STEP.format(i=2, p=1)},
{_HITS_STEP.format(i=3, p=2)},
ta AS (
  SELECT 'authority' AS kind, CAST(a AS BIGINT) AS node,
    round(auth, 8) AS score,
    CAST(row_number() OVER (ORDER BY round(auth, 8) DESC, a ASC)
      AS BIGINT) AS pos
  FROM a3),
th AS (
  SELECT 'hub' AS kind, CAST(h AS BIGINT) AS node,
    round(hub, 8) AS score,
    CAST(row_number() OVER (ORDER BY round(hub, 8) DESC, h ASC)
      AS BIGINT) AS pos
  FROM h3)
SELECT kind, node, score, pos FROM ta WHERE pos <= 15
UNION ALL
SELECT kind, node, score, pos FROM th WHERE pos <= 15"""
