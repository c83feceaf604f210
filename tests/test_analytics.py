"""Edge-case tests for the event-analytics operators (the oracle gate
in test_entry_oracle covers the registered fixture queries; these pin
semantics the fixtures can't: MG eviction, funnel ordering, merge
invariance)."""

from __future__ import annotations

import datetime as dt

import pytest
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
from cdc_pipe_line_spark.similarity import lsh_range_search
from cdc_pipe_line_spark.text import tfidf_top_terms


TS = dt.datetime


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_cohort_retention_matrix(spark):
    # u1 starts week of Mon 2024-01-01, active again +1wk and +3wk;
    # u2 starts +1wk, never returns
    rows = [
        (1, TS(2024, 1, 2), 1, "view", 1.0),
        (2, TS(2024, 1, 9), 1, "view", 1.0),
        (3, TS(2024, 1, 23), 1, "view", 1.0),
        (4, TS(2024, 1, 10), 2, "view", 1.0),
    ]
    out = {
        (r.cohort_week, r.week_offset): (r.n_active, r.cohort_size, r.retention_pct)
        for r in cohort_retention(_events(spark, rows)).collect()
    }
    assert out[("2024-01-01", 0)] == (1, 1, 100.0)
    assert out[("2024-01-01", 1)] == (1, 1, 100.0)
    assert out[("2024-01-01", 3)] == (1, 1, 100.0)
    assert out[("2024-01-08", 0)] == (1, 1, 100.0)
    assert ("2024-01-08", 1) not in out


def test_activity_streaks_islands(spark):
    # u1: days 1,2,3 then 7,8 -> best 3, 2 streaks, 5 active days;
    # duplicate events on one day collapse
    rows = [
        (i, TS(2024, 3, d, h), 1, "view", 1.0)
        for i, (d, h) in enumerate(
            [(1, 1), (1, 23), (2, 5), (3, 5), (7, 5), (8, 5)]
        )
    ]
    r = activity_streaks(_events(spark, rows)).collect()[0]
    assert (r.best_streak, r.n_streaks, r.active_days) == (3, 2, 5)


def test_funnel_requires_order(spark):
    # u1 converts fully; u2 clicked BEFORE first view -> not a stage-2
    # convert; u3 views only
    rows = [
        (1, TS(2024, 1, 1, 10), 1, "view", 1.0),
        (2, TS(2024, 1, 1, 11), 1, "click", 1.0),
        (3, TS(2024, 1, 1, 12), 1, "purchase", 1.0),
        (4, TS(2024, 1, 2, 10), 2, "click", 1.0),
        (5, TS(2024, 1, 2, 11), 2, "view", 1.0),
        (6, TS(2024, 1, 3, 10), 3, "view", 1.0),
    ]
    out = {r.stage: r for r in funnel(_events(spark, rows)).collect()}
    assert out["view"].n_users == 3
    assert out["click"].n_users == 1
    assert out["purchase"].n_users == 1
    assert out["click"].avg_hours_from_prev == 1.0
    assert out["view"].avg_hours_from_prev is None
    assert out["purchase"].conv_pct == pytest.approx(33.33)


def test_heavy_hitters_exact_under_eviction(spark):
    # key cardinality (100) far above the MG budget (support=0.2 ->
    # k=10 counters): the hot key (400 of ~895 rows) must still
    # surface, and the recount must be exact
    rows = [(i, TS(2024, 1, 1), 7, "view", 1.0) for i in range(400)]
    rows += [
        (1000 + i, TS(2024, 1, 1), 100 + (i % 99), "view", 1.0)
        for i in range(495)
    ]
    ev = _events(spark, rows).repartition(8)
    got = {r.user_id: r.n for r in heavy_hitters(ev, "user_id", support=0.2).collect()}
    assert got == {7: 400}


def test_heavy_hitters_threshold_is_ceil(spark):
    # 10 rows, support 0.25 -> threshold ceil(2.5)=3: a key with 2
    # rows is out, 3 rows is in
    rows = [(i, TS(2024, 1, 1), 1, "v", 1.0) for i in range(3)]
    rows += [(10 + i, TS(2024, 1, 1), 2, "v", 1.0) for i in range(2)]
    rows += [(20 + i, TS(2024, 1, 1), 3 + i, "v", 1.0) for i in range(5)]
    got = {r.user_id: r.n for r in heavy_hitters(_events(spark, rows), "user_id", support=0.25).collect()}
    assert got == {1: 3}


def test_rollup_merge_invariant_to_split(spark):
    rows = [
        (i, TS(2024, 1, 1 + i % 5, 3), i % 7, ["a", "b"][i % 2], float(i))
        for i in range(200)
    ]
    ev = _events(spark, rows)
    full = rollup_read(rollup_partial(ev)).collect()
    parts = [rollup_partial(ev.filter(F.col("event_id") % 4 == i)) for i in range(4)]
    merged = rollup_read(rollup_merge(*parts)).collect()
    key = lambda r: (r.day, r.event_type)
    assert sorted(map(tuple, merged)) == sorted(map(tuple, full))


def test_tfidf_df_is_document_frequency(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple banana", "en"),
            (2, "apple cherry", "en"),
            (3, "banane pomme", "fr"),
        ],
        "doc_id long, text string, lang string",
    )
    out = tfidf_top_terms(docs, k=5)
    rows = {(r.lang, r.term): r for r in out.collect()}
    # df counts DOCUMENTS containing the term, not occurrences
    assert rows[("en", "apple")].df == 2
    assert rows[("en", "apple")].tf == 3
    # apple: 3*ln(3/2)=1.2164 beats banana: 1*ln(3)=1.0986
    assert rows[("en", "apple")].score == pytest.approx(1.2164)
    assert rows[("en", "banana")].score == pytest.approx(1.0986)
    assert rows[("en", "apple")].rank < rows[("en", "banana")].rank
    # fr vocabulary ranks independently of en
    assert rows[("fr", "banane")].rank == 1


def test_lsh_range_search_threshold_and_self(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 64).astype(float)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    out = lsh_range_search(q, emb, threshold=-1.1, n_planes=2, dim=64)
    rows = out.collect()
    assert all(r.q_id != r.vec_id for r in rows)  # self excluded
    # with threshold below -1 every bucket-mate must be returned
    strict = lsh_range_search(q, emb, threshold=0.2, n_planes=2, dim=64).collect()
    assert all(r.cos_sim >= 0.2 for r in strict)
    assert len(strict) < len(rows)


def test_pagerank_symmetric_cycle(spark):
    from cdc_pipe_line_spark.analytics import pagerank

    # a <-> b two-cycle: symmetric, ranks stay exactly 0.5 each
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    got = {r.node: r.rank for r in pagerank(edges, n_iter=3).collect()}
    assert got["a"] == pytest.approx(0.5)
    assert got["b"] == pytest.approx(0.5)


def test_pagerank_hub_attracts_mass(spark):
    from cdc_pipe_line_spark.analytics import pagerank

    # star: three leaves each point at hub (and hub back) — hub must
    # outrank the leaves; dangling 'z' (edge in, none out) leaks mass
    edges = spark.createDataFrame(
        [("l1", "hub"), ("l2", "hub"), ("l3", "hub"),
         ("hub", "l1"), ("hub", "l2"), ("hub", "l3"), ("l1", "z")],
        "src string, dst string",
    )
    got = {r.node: r.rank for r in pagerank(edges, n_iter=3).collect()}
    assert got["hub"] > got["l1"] > 0
    assert got["z"] < got["hub"]
    assert len(got) == 5


def test_attribution_no_prior_touch_is_none(spark):
    from cdc_pipe_line_spark.analytics import last_touch_attribution

    rows = [
        (1, TS(2024, 1, 1, 9), 1, "purchase", 1.0),   # nothing before
        (2, TS(2024, 1, 1, 10), 2, "view", 1.0),
        (3, TS(2024, 1, 1, 11), 2, "click", 1.0),
        (4, TS(2024, 1, 1, 12), 2, "purchase", 1.0),  # last touch: click
        (5, TS(2024, 1, 1, 13), 2, "purchase", 1.0),  # purchases don't self-attribute
    ]
    got = {r.channel: (r.n_conversions, r.share_pct)
           for r in last_touch_attribution(_events(spark, rows)).collect()}
    assert got["__none__"] == (1, pytest.approx(33.33))
    assert got["click"] == (2, pytest.approx(66.67))


# ------------------------------------------------ graph operators (round 5)


def test_triangle_count_exact(spark):
    # K4 on {1,2,3,4} (4 triangles) plus a pendant edge 4-5 (0 new)
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)],
        "a long, b long",
    )
    from cdc_pipe_line_spark.analytics import triangle_count

    tri = {tuple(r) for r in triangle_count(edges).collect()}
    assert tri == {(1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4)}


def test_triangle_count_no_triangles(spark):
    from cdc_pipe_line_spark.analytics import triangle_count

    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "a long, b long")
    assert triangle_count(edges).count() == 0


def test_khop_reach_min_hop(spark):
    # path 1-2-3-4-5 plus shortcut 1-4: node 4 is hop 1, node 5 hop 2,
    # and k=3 must NOT relabel already-visited nodes
    from cdc_pipe_line_spark.analytics import khop_reach

    und = [(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3), (4, 5),
           (5, 4), (1, 4), (4, 1)]
    edges = spark.createDataFrame(und, "src long, dst long")
    out = {r["node"]: r["hop"] for r in khop_reach(edges, 1, k=3).collect()}
    assert out == {1: 0, 2: 1, 4: 1, 3: 2, 5: 2}


def test_khop_reach_isolated_seed(spark):
    from cdc_pipe_line_spark.analytics import khop_reach

    edges = spark.createDataFrame([(7, 8)], "src long, dst long")
    out = {r["node"]: r["hop"] for r in khop_reach(edges, 1, k=2).collect()}
    assert out == {1: 0}


def test_markov_transitions_rows_and_probs(spark):
    from cdc_pipe_line_spark.analytics import markov_transitions

    rows = [
        (1, TS(2024, 1, 1, 0, 0), 1, "view", None),
        (2, TS(2024, 1, 1, 0, 1), 1, "click", None),
        (3, TS(2024, 1, 1, 0, 2), 1, "view", None),
        (4, TS(2024, 1, 1, 0, 0), 2, "view", None),
        (5, TS(2024, 1, 1, 0, 1), 2, "purchase", None),
    ]
    out = {
        (r["src"], r["dst"]): (r["n"], r["p"])
        for r in markov_transitions(_events(spark, rows)).collect()
    }
    assert out[("_start", "view")] == (2, 1.0)
    # from 'view': one click (u1) and one purchase (u2) -> 0.5 each
    assert out[("view", "click")] == (1, 0.5)
    assert out[("view", "purchase")] == (1, 0.5)
    assert out[("click", "view")] == (1, 1.0)
    # probabilities per src sum to 1
    sums = {}
    for (src, _), (n, p) in out.items():
        sums[src] = sums.get(src, 0.0) + p
    assert all(abs(s - 1.0) < 1e-9 for s in sums.values())


def test_markov_tie_break_deterministic(spark):
    # identical ts: event_id orders the sequence
    from cdc_pipe_line_spark.analytics import markov_transitions

    rows = [
        (2, TS(2024, 1, 1), 1, "click", None),
        (1, TS(2024, 1, 1), 1, "view", None),
    ]
    out = {
        (r["src"], r["dst"]) for r in markov_transitions(_events(spark, rows)).collect()
    }
    assert ("view", "click") in out and ("click", "view") not in out


def test_listagg_distinct_plus_countdistinct_planner_bug_still_present(spark):
    """Documents the Spark 4.1 planner bug that shaped
    agg_ordered_listagg: mixing listagg(DISTINCT) WITHIN GROUP with a
    second distinct aggregate in ONE Aggregate throws an internal
    ClassCastException (AttributeReference -> SortOrder) in the
    distinct-rewrite rule.  The query therefore derives n_nations
    from the ordered CSV instead.  WHEN THIS TEST FAILS on a Spark
    upgrade, the bug is fixed: simplify agg_ordered_listagg back to a
    direct countDistinct and delete this test."""
    import pytest as _pytest

    df = spark.createDataFrame([(1, "a"), (1, "b")], ["k", "s"])
    df.createOrReplaceTempView("listagg_bug_v")
    with _pytest.raises(Exception, match="SortOrder|INTERNAL"):
        spark.sql(
            """SELECT k, listagg(DISTINCT s, ',')
                        WITHIN GROUP (ORDER BY s) AS csv,
                      count(DISTINCT s) AS nd
               FROM listagg_bug_v GROUP BY k"""
        ).collect()


def test_markov_attribution_invariants(spark):
    from tests.conftest import SF_DIR
    """Structural invariants of removal-effect attribution: removing a
    channel can only LOWER 16-step conversion (base >= removed >= 0),
    effects live in [0, 1e6] micro-units, and shares are a partition
    of ~1e6 (integer floor division loses at most n_channels units)."""
    from cdc_pipe_line_spark.queries import all_queries

    rows = all_queries()["agg_attribution_markov"](
        spark, SF_DIR
    ).collect()
    assert len(rows) == 4
    base = rows[0].base_micro
    assert all(r.base_micro == base for r in rows)
    for r in rows:
        assert 0 <= r.removed_micro <= base
        assert 0 <= r.effect_micro <= 1000000
    share_sum = sum(r.share_micro for r in rows)
    assert 1000000 - 4 <= share_sum <= 1000000


def test_textrank_rank_mass_conserved(spark):
    """On the symmetric co-occurrence graph every vertex has outgoing
    mass, so PageRank's total rank is conserved at ~1.0 after any
    number of iterations (teleport + distributed mass partition the
    unit); the top-15 cut must also be strictly rank-ordered."""
    from cdc_pipe_line_spark.queries import all_queries, load_table
    from cdc_pipe_line_spark.text import textrank_terms
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    pr = textrank_terms(docs, n_iter=4)
    total = pr.agg(F.sum("rank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-9
    top = all_queries()["text_textrank_terms"](spark, SF_DIR).collect()
    ranks = [r.rank for r in top]
    assert ranks == sorted(ranks, reverse=True)
    assert [r.pos for r in top] == list(range(1, len(top) + 1))
