"""Property tests for the round-9 operators: functional-graph SCC vs
brute force, two-pass median vs numpy, shard-manifest partition
properties, and interval-overlap-join equivalence on adversarial
layouts (zero-width, nested, exact-touch intervals).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


class TestFunctionalScc:
    @pytest.mark.parametrize("n,f", [
        (40, lambda i, n: (i * i + 1) % n),       # Pollard rho
        (37, lambda i, n: (3 * i + 5) % n),       # affine (permutation-ish)
        (25, lambda i, n: (i * i) % n),           # rho with fixpoint 0/1
        (16, lambda i, n: 0),                     # star: all tails into 0
    ])
    def test_matches_bruteforce(self, spark, n, f):
        from cdc_pipe_line_spark.analytics import functional_scc

        nxt = {i: f(i, n) for i in range(n)}
        # brute force: i is on a cycle iff iterating n steps from i
        # returns to i within the cycle; find cycle sets directly
        on_cycle = set()
        for i in range(n):
            x = i
            for _ in range(n):
                x = nxt[x]
            # x is now on a cycle; walk the cycle once
            cyc = {x}
            y = nxt[x]
            while y != x:
                cyc.add(y)
                y = nxt[y]
            if i in cyc:
                on_cycle.add(i)
        expect = {}
        for i in range(n):
            if i in on_cycle:
                # min of i's cycle
                cyc = {i}
                y = nxt[i]
                while y != i:
                    cyc.add(y)
                    y = nxt[y]
                expect[i] = (True, min(cyc))
            else:
                expect[i] = (False, i)

        rounds = 1
        while (1 << rounds) < n:
            rounds += 1
        fdf = spark.createDataFrame(
            [(i, nxt[i]) for i in range(n)], "node long, nxt long"
        )
        got = {
            r["node"]: (r["on_cycle"], r["scc_id"])
            for r in functional_scc(fdf, rounds=rounds).collect()
        }
        assert got == expect


class TestExactMedianTwopass:
    def test_matches_numpy_lower_median(self, spark):
        rng = np.random.default_rng(11)
        vals = rng.integers(-(10**7), 10**7, size=5001).tolist()
        vals += [vals[0]] * 37  # heavy duplicate block
        df = spark.createDataFrame([(int(v),) for v in vals], "cents long")

        # replicate the registered query's algorithm shape inline
        b = df.agg(
            F.min("cents").alias("lo"),
            F.max("cents").alias("hi"),
            F.count("*").alias("n"),
        ).first()
        lo, hi, n = int(b["lo"]), int(b["hi"]), int(b["n"])
        w = (hi - lo) // 8192 + 1
        rank = (n + 1) // 2
        hist = df.groupBy(
            F.expr(f"(cents - {lo}) div {w}").alias("b")
        ).agg(F.count("*").alias("c")).collect()
        cum = 0
        for r in sorted(hist, key=lambda r: r["b"]):
            if cum + r["c"] >= rank:
                tb, cum_before = int(r["b"]), cum
                break
            cum += int(r["c"])
        from pyspark.sql.window import Window

        med = (
            df.filter(
                (F.col("cents") >= lo + tb * w)
                & (F.col("cents") < lo + (tb + 1) * w)
            )
            .groupBy("cents")
            .agg(F.count("*").alias("c"))
            .withColumn(
                "cumv",
                F.sum("c").over(
                    Window.orderBy("cents").rowsBetween(
                        Window.unboundedPreceding, Window.currentRow
                    )
                ),
            )
            .filter(F.col("cumv") >= rank - cum_before)
            .agg(F.min("cents"))
            .first()[0]
        )
        assert med == int(np.sort(np.array(vals))[rank - 1])


class TestShardManifest:
    def test_every_doc_in_exactly_one_shard_and_bytes_conserved(self, spark):
        from cdc_pipe_line_spark.functions import global_running_sum

        target = 1000
        df = spark.range(500).select(
            F.md5(F.col("id").cast("string")).alias("ok"),
            F.col("id"),
            (F.col("id") % 97 + 3).alias("nbytes"),
        )
        cum = global_running_sum(df, ["ok", "id"], "nbytes")
        sharded = cum.withColumn(
            "shard_id", F.expr(f"cum_before div {target}")
        )
        rows = sharded.collect()
        assert len(rows) == 500
        assert len({r["id"] for r in rows}) == 500
        total = sum(r["nbytes"] for r in rows)
        per_shard = {}
        for r in rows:
            per_shard.setdefault(r["shard_id"], 0)
            per_shard[r["shard_id"]] += r["nbytes"]
        assert sum(per_shard.values()) == total
        # shards are contiguous 0..K and each (except possibly the
        # last) holds at least `target` minus one doc of slack
        ids = sorted(per_shard)
        assert ids == list(range(len(ids)))
        max_doc = max(r["nbytes"] for r in rows)
        for s in ids[:-1]:
            assert per_shard[s] >= target - max_doc
            assert per_shard[s] <= target + max_doc


class TestIntervalOverlap:
    def test_matches_bruteforce_adversarial(self, spark):
        from cdc_pipe_line_spark.joins import interval_overlap_join

        rng = np.random.default_rng(5)
        left = []
        for i in range(120):
            lo = int(rng.integers(0, 500))
            left.append((i, lo, lo + int(rng.integers(0, 80))))
        # adversarial right: nested, zero-width, exact-touch
        right = [
            (0, 0, 600),        # covers everything
            (1, 100, 100),      # zero-width (can never overlap)
            (2, 200, 280),
            (3, 280, 300),      # touches 2 exactly (no overlap at 280)
            (4, 250, 260),      # nested inside 2
        ]
        l = spark.createDataFrame(left, "lid long, l_lo long, l_hi long")
        r = spark.createDataFrame(right, "rid long, r_lo long, r_hi long")
        got = {
            (x["lid"], x["rid"])
            for x in interval_overlap_join(
                l,
                r,
                left_lo="l_lo",
                left_hi="l_hi",
                right_lo="r_lo",
                right_hi="r_hi",
                bucket_width=64,
            ).collect()
        }
        expect = {
            (li, ri)
            for (li, llo, lhi) in left
            for (ri, rlo, rhi) in right
            if llo < rhi and rlo < lhi
        }
        assert got == expect
