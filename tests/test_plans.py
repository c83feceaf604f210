"""Physical-plan regression tests (the 100 TB posture, enforced).

Correctness tests prove WHAT each operator returns; these prove HOW —
broadcast where intended, pushdown reaching the scan, top-k never
globally sorting, the diff shuffling each side exactly once.  A
refactor that silently turns a broadcast star join into four
sort-merge joins still passes the oracle; it fails here.
"""

from __future__ import annotations

import re

import pytest

from cdc_pipe_line_spark.queries import all_queries
from tests.conftest import SF_DIR


def _plan(spark, name: str) -> str:
    df = all_queries()[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_cdc_diff_single_join_two_exchanges(spark):
    plan = _plan(spark, "cdc_diff_events")
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") == 1
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2
    # payload maps must be pruned: no map_from_arrays survives projection
    assert "map_from_arrays" not in plan


def test_star_join_all_broadcast(spark):
    plan = _plan(spark, "join_revenue_by_region")
    assert plan.count("BroadcastHashJoin") == 4
    assert "SortMergeJoin" not in plan
    # the date range predicate must reach the orders scan
    assert re.search(r"PushedFilters: \[.*GreaterThanOrEqual\(o_orderdate", plan)


def test_bucketed_join_zero_shuffle(spark):
    """Bucketed tables must make BOTH the join and the downstream
    per-key aggregation shuffle-free: the one shuffle was paid at
    write time."""
    plan = _plan(spark, "join_bucketed_colocated")
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan


def test_topk_never_global_sorts_and_per_key_uses_group_limit(spark):
    """Both probes of window_top_latest keep their scale shape: the
    top-10 branch is a TakeOrderedAndProject (never a global sort) and
    the latest-per-key branch a WindowGroupLimit (rank pushdown)."""
    plan = _plan(spark, "window_top_latest")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan
    assert "WindowGroupLimit" in plan


def test_pricing_scan_prunes_columns(spark):
    plan = _plan(spark, "agg_pricing_summary")
    m = re.search(r"FileScan parquet \[([^\]]*)\]", plan)
    assert m, plan
    assert len(m.group(1).split(",")) <= 5, f"scan too wide: {m.group(1)}"


def test_current_view_pushes_predicate_at_rest(spark, tmp_path):
    """The current-state view over MATERIALIZED history must reach the
    scan as a pushed filter (row-group skipping at scale), not a
    post-scan filter."""
    from cdc_pipe_line_spark.cdc.scd2 import current_view, scd2_from_upserts
    from cdc_pipe_line_spark.queries import load_table

    ev = load_table(spark, SF_DIR, "events")
    hist = scd2_from_upserts(ev, "user_id", "ts", ["value"])
    path = str(tmp_path / "hist")
    hist.write.parquet(path)
    cur = current_view(spark.read.parquet(path))
    plan = cur._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PushedFilters: \[[^\]]*EqualTo\(is_current,true\)", plan), plan


def test_asof_join_union_and_carry_no_join(spark):
    plan = _plan(spark, "ts_asof_sessionize")
    # union-and-carry: the purchase/click match is a window over the
    # UNION, never a join of the two event streams (the sessionize
    # probe in the same slot is also join-free)
    for join in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"):
        assert join not in plan, f"asof fell back to {join}"


def test_shingle_filter_not_cloned_into_scan(spark):
    """Regression for the pushdown-clones-expensive-expression trap:
    the scan-level filter must stay cheap (word split at most), never
    the full shingle pipeline."""
    plan = _plan(spark, "dedup_minhash_lsh")
    for line in plan.splitlines():
        if "FileScan" in line and "documents" in line:
            assert "array_distinct" not in line, "shingles cloned into scan filter"


def test_ivf_build_never_single_partition(spark):
    """Regression for the IVF seeding scale bug: seeds come from ORDER
    BY hash LIMIT k (TakeOrderedAndProject — per-partition top-k, k
    rows max per task), never a partitionless window that funnels the
    whole corpus through one task.  No Exchange SinglePartition may
    appear anywhere in the build+search plan."""
    plan = _plan(spark, "sim_knn_ivf")
    assert "TakeOrderedAndProject" in plan
    # Any remaining single-partition exchange must be fed by a bounded
    # operator — a partial aggregate (scalar mean) or the seed top-k —
    # never by an unbounded scan/project of the corpus (the old bug).
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        child = lines[i + 1] if i + 1 < len(lines) else ""
        assert "HashAggregate" in child or "TakeOrderedAndProject" in child, (
            "unbounded single-partition exchange:\n" + "\n".join(lines[i : i + 3])
        )


def test_text_profile_single_pass(spark):
    """text_profile must stay ONE narrow pass: no shuffle (the only
    Exchange is load_table's round-robin fan-out), exactly one Arrow
    boundary (the r15 mapInArrow integer-count kernel — guide §4.2;
    never a row-at-a-time BatchEvalPython), and the scan pruned to the
    three columns the kernel reads (doc_id, text, lang) — an opaque
    map over ``*`` would silently disable column pruning."""
    plan = _plan(spark, "text_profile")
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("MapInArrow") == 1, plan
    assert re.search(r"ReadSchema: struct<doc_id:bigint,text:string,lang:string>", plan), plan


def test_quota_sample_uses_group_limit(spark):
    """quota_sample's rank filter must stay a WindowGroupLimit
    (partial+final: each task keeps its local top-``quota`` per group
    BEFORE the shuffle), never degrade to a full per-group sort — at
    scale a billion-doc domain must move ``quota`` rows, not a
    billion.  The pack probe in the same slot is a running-sum window
    and legitimately sorts within groups, so the assertion targets the
    group-limit nodes, not the absence of Sort."""
    plan = _plan(spark, "llm_data_prep")
    # partial (pre-shuffle) + final (post-shuffle) pushdown
    assert plan.count("WindowGroupLimit") >= 2, plan
    assert "Exchange rangepartitioning" not in plan  # never a global sort


def test_multi_grouping_single_fact_scan(spark):
    """rollup/cube/gsets are all derived from ONE cube: the fact table
    must be scanned once, not once per grouping clause.  (The cube is
    localCheckpoint'd, so the branch plans read the materialized RDD —
    no orders FileScan may appear more than once across the job.)"""
    df = all_queries()["agg_multi_grouping"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 0, plan  # branches read the checkpoint
    assert "Expand" not in plan  # cube shuffle already paid upstream


@pytest.mark.slow
def test_no_shuffle_cartesian_in_any_batch_query(spark):
    """Global plan-hygiene net: no registered batch query may plan a
    shuffle-based CartesianProduct — the refactor accident (a dropped
    join key) that an oracle check at sf0.01 would survive and a
    100 TB run would not.  Deliberate cross-products in the ANN
    queries are BroadcastNestedLoopJoin over a bounded query set and
    stay allowed.  Streaming/IO queries are excluded: constructing
    them runs stream/fixture side-effects, and their plans live per
    micro-batch."""
    skip_prefixes = ("stream_", "io_", "join_bucketed")  # side-effecting setup
    names = [
        n for n in all_queries() if not n.startswith(skip_prefixes)
    ]
    offenders = {}
    for name in names:
        df = all_queries()[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders[name] = True
    assert not offenders, f"shuffle cartesian in: {sorted(offenders)}"


def test_dpp_join_prunes_partitions_at_runtime(spark):
    """io_dpp_join must read the fact through a runtime-injected
    partition filter (DPP), not a full scan + post-join filter."""
    plan = _plan(spark, "io_dpp_join")
    assert "dynamicpruningexpression" in plan
    # and the column projection must still prune (partition col is
    # directory metadata, not data)
    assert re.search(
        r"ReadSchema: struct<l_orderkey:bigint,l_quantity:double>", plan
    )


def test_cohort_retention_one_scan_no_join(spark):
    plan = _plan(spark, "agg_cohort_retention")
    assert plan.count("FileScan") == 1
    assert "Join" not in plan


def test_rfm_approx_no_window_no_single_partition(spark):
    """The boundary-cut RFM variant must keep its 100 TB shape: zero
    Window nodes (scores are CASE comparisons against broadcast
    percentile boundaries, never ntile) and zero single-partition
    exchanges (no global sort funnel)."""
    plan = _plan(spark, "agg_rfm_segments_approx")
    assert not re.search(r"\bWindow\b \[", plan), plan
    # no global sort of the per-user frame (ntile's funnel); the
    # SinglePartition exchanges that remain feed the 1-row scalar
    # boundary reduce (partials-of-partials), not per-user data
    assert "Exchange rangepartitioning" not in plan, plan
    assert "BroadcastExchange" in plan  # boundaries broadcast, not shuffled


def test_q5_pushdown_and_broadcast_dims(spark):
    """TPC-H Q5: the order-date range must reach the orders scan as a
    pushed filter, the region literal must reach the region scan, and
    no join may plan as a cartesian.  (Join strategy is AQE/size-
    adaptive — broadcast at test SF, SMJ at scale — so only the
    invariants are pinned.)"""
    plan = _plan(spark, "join_q5_local_supplier")
    assert re.search(
        r"PushedFilters: \[.*GreaterThanOrEqual\(o_orderdate", plan
    ), plan
    assert re.search(r"PushedFilters: \[.*EqualTo\(r_name,ASIA", plan), plan
    assert "CartesianProduct" not in plan


def test_q6_all_filters_pushed_single_stage(spark):
    """TPC-H Q6 is the pushdown canary: date window, discount band
    and quantity cap must ALL reach the lineitem scan; the rest of
    the query is one scalar reduce."""
    plan = _plan(spark, "agg_q6_forecast_revenue")
    # toString elides long PushedFilters lists with "..."; assert the
    # date filter made the pushed list and the band/cap filters sit in
    # the scan-adjacent DataFilters (i.e. nothing migrated above a
    # join/exchange — there is none), scan read exactly 4 columns.
    assert re.search(
        r"PushedFilters: \[.*GreaterThanOrEqual\(l_shipda", plan
    ), plan
    assert re.search(r"DataFilters: \[.*l_discount", plan), plan
    assert plan.count("FileScan") == 1
    assert re.search(
        r"ReadSchema: struct<l_quantity:double,l_extendedprice:double,"
        r"l_discount:double,l_shipdate:timestamp", plan
    ), plan


def test_zipf_topk_never_sorts_vocabulary(spark):
    """The Zipf rank cut must stay a distributed top-k: the
    pre-checkpoint subtree plans TakeOrderedAndProject, never a
    global Sort of the vocabulary."""
    from pyspark.sql import functions as F

    from cdc_pipe_line_spark.queries import load_table

    docs = load_table(spark, SF_DIR, "documents")
    freq = (
        docs.select(
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    top = freq.orderBy(F.col("freq").desc(), F.col("w").asc()).limit(200)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_peak_concurrency_distributed_sweep(spark):
    """The sweep-line must stay a distributed prefix sum: the running
    concurrency is a per-day PARTITIONED window plus a broadcast
    carry-in — never an unpartitioned window, whose
    Exchange SinglePartition funnels every boundary event through one
    task at 100x."""
    plan = _plan(spark, "ts_peak_concurrency")
    assert "Exchange SinglePartition" not in plan, plan
    # the carry joins must broadcast (days-sized tables)
    assert "BroadcastExchange" in plan


def test_heavy_hitters_no_full_cardinality_shuffle_before_filter(spark):
    """The recount must filter the raw table through a broadcast
    semi-join against the (pinned) candidate sketch, never a plain
    groupBy over the raw key space.  The MG pass itself is already
    materialized by the time this plan exists (localCheckpoint ->
    Scan ExistingRDD) — its narrowness is pinned by construction
    (mapInPandas directly on the scan, no exchange upstream)."""
    plan = _plan(spark, "agg_heavy_hitters")
    assert "Scan ExistingRDD" in plan  # the pinned sketch, not a rescan
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_tfidf_single_tokenize_pass(spark):
    """The corpus explode must run once (pinned matrix), not once per
    DF/TF branch."""
    plan = _plan(spark, "text_tfidf_terms")
    assert plan.count("Generate explode") <= 1


def test_runtime_bloom_filter_injects_on_selective_shuffle_join(spark):
    """100 TB posture: when a shuffle join's build side is selective,
    Spark injects a runtime bloom filter (bloom_filter_agg on the dim
    key -> might_contain on the fact scan side), cutting shuffle write
    volume before the exchange.  Pinned here so the session defaults
    (AQE + runtime filters) keep the behavior; thresholds are lowered
    only to make the tiny fixture eligible."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "10GB",
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        # force the shuffle join shape (broadcast joins don't need blooms)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        od = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
            "o_orderpriority = '1-URGENT'"
        )
        j = li.join(od, li.l_orderkey == od.o_orderkey).groupBy(
            "o_orderstatus"
        ).count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_triangles_use_adjacency_intersection_not_wedges(spark):
    """Triangle enumeration must keep the adjacency-intersection shape
    (one row per EDGE through the closure, the intersection inside
    codegen) — the wedge formulation shuffles one row per wedge and
    measured 8x slower at sf1 (493M wedges; BENCH_NOTES round 7).
    The registered query checkpoints the triangle frame, so assert on
    the operator's own plan."""
    from cdc_pipe_line_spark.analytics import triangle_count

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "a long, b long"
    )
    plan = (
        triangle_count(edges)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "array_intersect" in plan, plan
    # the closure never re-materializes wedges: exactly the two
    # adjacency joins, no third join
    assert plan.count("Join") <= 2, plan


def test_simhash_signature_subtree_pinned(spark):
    """dedup_simhash's candidate self-join must run over the PINNED
    signature frame: no parquet scan (and no pandas-UDF signature
    evaluation) may appear in the pair plan — re-planning the
    UDF-bearing subtree through the join measured 39x slower at sf1
    (BENCH_NOTES round 7)."""
    plan = _plan(spark, "dedup_simhash")
    assert "Scan parquet" not in plan, plan
    assert "Scan ExistingRDD" in plan
    assert "ArrowEvalPython" not in plan, plan


def test_decontaminate_shingle_frames_pinned(spark):
    """text_decontaminate's gram join must consume checkpointed
    shingle frames: Project collapse otherwise inlines the
    higher-order shingle expression into every consumer (measured
    10x at sf1, BENCH_NOTES round 7)."""
    plan = _plan(spark, "text_decontaminate")
    assert "Scan parquet" not in plan, plan
    assert "Scan ExistingRDD" in plan


def test_bloom_prefilter_probe_is_single_row_broadcast(spark):
    """The explicit Bloom prefilter's probe side must be ONE
    broadcast bitmap row fused as a BroadcastNestedLoopJoin (never a
    shuffled cartesian), with the membership tests folded into a
    Filter above the fact scan — the shape whose cost is one bitmap
    lookup per fact row and zero extra shuffles."""
    from pyspark.sql import functions as F

    from cdc_pipe_line_spark.joins import bloom_filter_build, bloom_prefilter

    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    dim = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    bloom = bloom_filter_build(dim, "c_custkey", num_bits=1 << 16, num_hashes=5)
    pre = bloom_prefilter(orders, bloom, "o_custkey", num_bits=1 << 16, num_hashes=5)
    plan = pre._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "xxhash64" in plan  # membership tests stayed column arithmetic


def test_python_udtf_arrow_pruned_scan(spark):
    """The UDTF lateral expansion must run Arrow-batched (not pickled
    row-at-a-time), read ONLY the expanded column from parquet, and
    aggregate with a map-side partial directly above the expansion —
    the shape whose only exchange is the bounded token vocabulary."""
    plan = _plan(spark, "scalar_python_udtf")
    assert "ArrowEvalPythonUDTF" in plan
    assert "BatchEvalPythonUDTF" not in plan
    assert "ReadSchema: struct<p_name:string>" in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_bloom_prune_pushes_point_lookup_to_scan(spark):
    """The IN point-lookup must reach the parquet scan as a pushed
    filter (row-group + bloom evaluation happens below the engine),
    and the staged files must actually carry the bloom — parquet-mr
    silently skips blooms on dictionary-encoded chunks."""
    plan = _plan(spark, "io_parquet_bloom_prune")
    assert re.search(r"PushedFilters: \[.*In\(o_custkey", plan), plan

    from cdc_pipe_line_spark.queries.io_q import _cache
    from cdc_pipe_line_spark.sources import parquet_bloom_present

    path, ready = _cache(SF_DIR, "orders_bloom")
    assert ready and parquet_bloom_present(spark, path, "o_custkey")
    # negative control: a bloom-free write of the same data reports no
    # bloom, proving the helper reads the footer rather than trusting
    # the write option.
    neg, neg_ready = _cache(SF_DIR, "orders_nobloom_ctl")
    if not neg_ready:
        spark.read.parquet(path).limit(100).write.mode("overwrite").parquet(neg)
        from cdc_pipe_line_spark.queries.io_q import _mark

        _mark(neg)
    assert not parquet_bloom_present(spark, neg, "o_custkey")


def test_sql_udf_is_inlined_not_python(spark):
    """SQL UDFs must inline into the calling plan: no Python eval
    node anywhere, the net_cents body visible as a plain FLOOR
    expression in the Filter, the scan pruned to the 4 referenced
    columns, and one partial/final aggregate exchange."""
    plan = _plan(spark, "scalar_sql_udf")
    assert "EvalPython" not in plan
    assert re.search(r"Filter .*FLOOR", plan), plan
    assert (
        "ReadSchema: struct<l_extendedprice:double,l_discount:double,"
        "l_tax:double,l_returnflag:string>" in plan
    )
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_collation_group_is_collation_aware_aggregate(spark):
    """The group key must be the COLLATED expression (shuffle
    partitioning + aggregate comparator both collation-aware), not a
    lower() rewrite; no Python nodes; scan pruned to the 3 referenced
    customer columns.  Spark 4.1 plans collated group keys as
    SortAggregate (collated strings are not hash-aggregable yet) with
    the standard two-exchange distinct expansion — pinned so an
    upgrade that changes the strategy is noticed, not silent."""
    plan = _plan(spark, "scalar_collation_group")
    assert "EvalPython" not in plan
    assert "collate(seg_raw" in plan, plan
    assert (
        "ReadSchema: struct<c_custkey:bigint,c_acctbal:double,"
        "c_mktsegment:string>" in plan
        or "ReadSchema: struct<c_custkey:bigint,c_mktsegment:string,"
        "c_acctbal:double>" in plan
    ), plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2


def test_join_strategy_hints_are_honored(spark):
    """The three join-strategy escape hatches must actually change the
    physical plan — at 100 TB the difference between a sort-merge and
    a shuffled-hash join on a skew-free key is a full sort per side.
    Pins: default equi-join on unsorted parquet = SortMergeJoin;
    hint('shuffle_hash') = ShuffledHashJoin (no sort);
    hint('broadcast') on an over-threshold side = BroadcastHashJoin
    (the hint overrides autoBroadcastJoinThreshold)."""
    from cdc_pipe_line_spark.queries import load_table

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load_table(spark, SF_DIR, "orders")
        c = load_table(spark, SF_DIR, "customer")
        on = o.o_custkey == c.c_custkey

        default_plan = (
            o.join(c, on)._jdf.queryExecution().executedPlan().toString()
        )
        assert "SortMergeJoin" in default_plan

        sh_plan = (
            o.join(c.hint("shuffle_hash"), on)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "ShuffledHashJoin" in sh_plan
        assert "SortMergeJoin" not in sh_plan

        bc_plan = (
            o.join(c.hint("broadcast"), on)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in bc_plan
        assert "Exchange hashpartitioning" not in bc_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_modern_sql_parameter_pushes_down(spark):
    """The typed parameter marker must behave exactly like a literal
    once bound: the o_totalprice predicate reaches the parquet scan as
    a pushed filter, and the lateral-alias net computation stays one
    codegen projection (no subquery materialization)."""
    plan = _plan(spark, "scalar_modern_sql")
    assert re.search(r"PushedFilters: \[.*GreaterThan\(o_totalprice,50000", plan), plan
    assert "EvalPython" not in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_semantic_dedup_seed_broadcast_bounded_by_budget(spark):
    """semantic_dedup's centroid side must be bounded by the BUDGET,
    never the corpus (VERDICT r7 weak item): the hash-ranked seed
    select plans as TakeOrderedAndProject (each task emits at most K
    rows — never a global sort / rangepartitioning of the corpus) and
    that K-row frame is what the BroadcastExchange ships.  A refactor
    that reintroduces a corpus-proportional seed table (the old
    ``id % stride == 0`` filter) loses the TakeOrderedAndProject node
    and fails here."""
    from cdc_pipe_line_spark.similarity import semantic_assign

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assigned = semantic_assign(emb, n_centroids=7)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastExchange" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # functional half of the bound: at most K clusters can exist
    assert assigned.select("cluster_id").distinct().count() <= 7


@pytest.mark.slow
def test_no_unpartitioned_window_over_unbounded_frame(spark):
    """Global plan-hygiene net (VERDICT r7 item 3): an unpartitioned
    Window funnels its whole input through ONE task
    (Exchange SinglePartition) — acceptable only above a frame that is
    bounded by construction.  For every registered batch query, any
    WindowExec with an empty partitionSpec must have an aggregate or a
    limit between itself and every parquet scan in its subtree: the
    aggregate collapses fact cardinality to group cardinality
    (vocabulary, census, calendar spine), the limit to a constant.  A
    refactor that slides a fact table under a global Window — the
    llm_epoch_shuffle draft this test caught — fails here.

    Streaming/IO queries are excluded for the same side-effect reasons
    as the cartesian net above."""
    BARRIERS = {
        "HashAggregateExec",
        "SortAggregateExec",
        "ObjectHashAggregateExec",
        "TakeOrderedAndProjectExec",
        "GlobalLimitExec",
        "LocalLimitExec",
        "CollectLimitExec",
    }

    def unwrap(node):
        if node.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
            return unwrap(node.inputPlan())
        return node

    def walk(node):
        node = unwrap(node)
        yield node
        cs = node.children()
        for i in range(cs.size()):
            yield from walk(cs.apply(i))

    def reaches_scan_unbarriered(node):
        node = unwrap(node)
        cls = node.getClass().getSimpleName()
        if cls in BARRIERS:
            return False
        if cls == "FileSourceScanExec":
            return True
        cs = node.children()
        return any(
            reaches_scan_unbarriered(cs.apply(i)) for i in range(cs.size())
        )

    skip_prefixes = ("stream_", "io_", "join_bucketed")
    offenders = {}
    for name in all_queries():
        if name.startswith(skip_prefixes):
            continue
        df = all_queries()[name](spark, SF_DIR)
        jplan = df._jdf.queryExecution().executedPlan()
        for n in walk(jplan):
            if (
                n.getClass().getSimpleName() == "WindowExec"
                and n.partitionSpec().isEmpty()
                and reaches_scan_unbarriered(n)
            ):
                offenders[name] = n.toString().splitlines()[0][:120]
    assert not offenders, f"unbounded global Window in: {offenders}"
