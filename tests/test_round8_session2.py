"""Unit/property tests for the second round-8 session's operators:
BMP codec edges, k-core peel semantics, prefix-filter completeness,
DSIR selection invariants, the hashed quality gate, and the bitmap
distinct identity.  The oracle gate (test_entry_oracle) hash-checks
every registered query end-to-end; these pin the LIBRARY-level
contracts a refactor could silently break while staying oracle-green
on the synthetic corpus.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cdc_pipe_line_spark.multimodal import MediaDecodeError, _bmp_pixels, make_bmp24


def _grad(w, h):
    xs = np.arange(w, dtype=np.int64)[None, :]
    ys = np.arange(h, dtype=np.int64)[:, None]
    return np.stack(
        [(7 + 2 * xs + 5 * ys) % 256, (3 * xs + ys) % 256, (xs + 7 * ys) % 256],
        axis=2,
    ).astype(np.uint8)


class TestBmpCodec:
    def test_roundtrip_both_orientations_and_padding(self):
        # widths chosen so stride padding is 0..3 bytes (w*3 % 4 cycles)
        for w in (3, 4, 5, 6):
            for td in (False, True):
                arr = _grad(w, 5)
                got_w, got_h, got_td, dec = _bmp_pixels(make_bmp24(arr, topdown=td))
                assert (got_w, got_h, got_td) == (w, 5, td)
                assert np.array_equal(dec, arr), (w, td)

    def test_truncated_pixels_quarantine_reason(self):
        enc = make_bmp24(_grad(5, 4))
        with pytest.raises(MediaDecodeError, match="truncated pixel array"):
            _bmp_pixels(enc[:-2])

    def test_non_24bpp_and_compressed_quarantine(self):
        enc = bytearray(make_bmp24(_grad(4, 4)))
        bad_bpp = bytes(enc[:28]) + b"\x08\x00" + bytes(enc[30:])
        with pytest.raises(MediaDecodeError, match="unsupported bpp"):
            _bmp_pixels(bad_bpp)
        bad_comp = bytes(enc[:30]) + b"\x01\x00\x00\x00" + bytes(enc[34:])
        with pytest.raises(MediaDecodeError, match="unsupported compression"):
            _bmp_pixels(bad_comp)

    def test_missing_signature(self):
        with pytest.raises(MediaDecodeError, match="BM signature"):
            _bmp_pixels(b"XX" + b"\x00" * 60)


class TestKcorePeel:
    def _peel(self, spark, edges, nodes, k, rounds=10):
        from cdc_pipe_line_spark.analytics import kcore_peel

        e = spark.createDataFrame(edges, "a long, b long")
        n = spark.createDataFrame([(x,) for x in nodes], "node long")
        removed, converged = kcore_peel(n, e, k=k, rounds=rounds)
        return {
            r.node: r.removed_round for r in removed.collect()
        }, converged

    def test_triangle_survives_2core_pendant_peels(self, spark):
        # triangle 1-2-3 plus pendant 4 hanging off 1
        edges = [(1, 2), (2, 3), (1, 3), (1, 4)]
        removed, converged = self._peel(spark, edges, [1, 2, 3, 4], k=2)
        assert converged
        assert removed == {4: 1}  # pendant peels round 1; triangle stays

    def test_chain_peels_from_both_ends_simultaneously(self, spark):
        # path 1-2-3-4-5 under k=2: simultaneous peel eats both ends
        # one layer per round — removal rounds are the distance to an
        # end, NOT one node at a time (binds the SIMULTANEOUS
        # semantics the oracle unrolls).
        edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
        removed, converged = self._peel(spark, edges, [1, 2, 3, 4, 5], k=2)
        assert converged
        assert removed == {1: 1, 5: 1, 2: 2, 4: 2, 3: 3}

    def test_isolated_node_removes_round_one(self, spark):
        removed, converged = self._peel(spark, [(1, 2)], [1, 2, 9], k=1)
        assert converged
        assert removed == {9: 1}

    def test_budget_exhaustion_reports_not_converged(self, spark):
        # path of 6 needs 3 rounds under k=2; budget 2 -> not converged
        edges = [(i, i + 1) for i in range(1, 6)]
        removed, converged = self._peel(
            spark, edges, list(range(1, 7)), k=2, rounds=2
        )
        assert not converged
        assert set(removed) == {1, 2, 5, 6}  # middle pair still pending


class TestPrefixFilterCompleteness:
    def test_every_high_jaccard_pair_is_found(self, spark):
        """The prefix-filter THEOREM on a crafted corpus: every pair
        with Jaccard >= 0.8 must appear (lossless), and emitted
        micro-ratios must equal the exact set Jaccard."""
        from cdc_pipe_line_spark.text import prefix_filter_pairs, shingle_df

        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        docs = [
            (1, base),
            (2, base),  # identical -> jac 1.0
            (3, base + " lambda"),  # high overlap
            (4, "one two three four five six seven eight nine ten"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            (r.id_a, r.id_b): r.jac_micro
            for r in prefix_filter_pairs(df).collect()
        }
        # ground truth by brute force over shingle sets
        sh = {
            r.id: set(r.sh) for r in shingle_df(df).collect()
        }
        expect = {}
        ids = sorted(sh)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                inter = len(sh[a] & sh[b])
                union = len(sh[a] | sh[b])
                if union and 5 * inter >= 4 * union:
                    expect[(a, b)] = (1000000 * inter) // union
        assert got == expect
        assert (1, 2) in got and got[(1, 2)] == 1000000


class TestDsirAndQualityGate:
    def test_dsir_selects_top_quarter_by_rank(self, spark):
        from cdc_pipe_line_spark.text import dsir_weights

        docs = spark.createDataFrame(
            [
                (i, ("spark table join " * 5) if i % 2 == 0 else ("uno dos tres " * 5), "en" if i % 2 == 0 else "es")
                for i in range(16)
            ],
            "doc_id long, text string, lang string",
        )
        out = dsir_weights(docs, F.col("lang") == "en").collect()
        assert len(out) == 16
        sel = [r for r in out if r.selected]
        assert len(sel) == 4  # ceil(16/4)
        # selected = exactly the 4 best ranks, and target-language docs
        # (whose tokens define the target distribution) score highest
        assert {r.rn for r in sel} == {1, 2, 3, 4}
        assert all(r.doc_id % 2 == 0 for r in sel)
        # ranks are a permutation of 1..16 (global_row_number exactness)
        assert sorted(r.rn for r in out) == list(range(1, 17))

    def test_quality_gate_integer_score_and_keep_flag(self, spark):
        from cdc_pipe_line_spark.text import hashed_quality_score

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "single"), (3, "alpha beta")],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in hashed_quality_score(docs).collect()}
        assert 2 not in rows  # <2 words: no bigrams, dropped
        assert rows[1].n_feats == 2 and rows[3].n_feats == 1
        # doc 1's score = doc 3's score + the (beta,gamma) feature:
        # additive in features by construction
        assert rows[1].keep == (rows[1].score > 0)


class TestBitmapDistinct:
    def test_bitmap_equals_exact_on_adversarial_ids(self, spark):
        """Ids straddling word boundaries (62, 63, 64, 125, 126) and
        duplicates: bitmap distinct must equal exact distinct."""
        ids = [0, 1, 62, 63, 64, 125, 126, 126, 63, 0, 200, 500, 501]
        df = spark.createDataFrame(
            [(i, "t") for i in ids], "user_id long, event_type string"
        )
        chunks = df.groupBy(
            (F.col("user_id") / 63).cast("bigint").alias("w")
        ).agg(
            F.expr(
                "bit_or(shiftleft(CAST(1 AS BIGINT), "
                "CAST(user_id % 63 AS INT)))"
            ).alias("bm")
        )
        got = chunks.agg(F.sum(F.bit_count("bm"))).first()[0]
        assert got == len(set(ids))


class TestDeltaLogReplay:
    def test_last_action_wins_including_resurrection(self, spark, tmp_path):
        """Spec rule: replay by version, last action per path wins —
        a removed file must disappear, and a LATER re-add of the same
        path must resurrect it."""
        import json

        from cdc_pipe_line_spark import deltalog

        base = str(tmp_path / "tbl")
        log = tmp_path / "tbl" / "_delta_log"
        log.mkdir(parents=True)
        df = spark.range(10).withColumnRenamed("id", "k")
        for name, lo in (("a.parquet", 0), ("b.parquet", 5)):
            tmp = str(tmp_path / "stage")
            df.filter((F.col("k") >= lo) & (F.col("k") < lo + 5)).coalesce(
                1
            ).write.mode("overwrite").parquet(tmp)
            import os as _os

            src = [f for f in _os.listdir(tmp) if f.endswith(".parquet")][0]
            _os.replace(_os.path.join(tmp, src), _os.path.join(base, name))

        def commit(v, actions):
            with open(log / f"{v:020d}.json", "w") as fh:
                for a in actions:
                    fh.write(json.dumps(a) + "\n")

        commit(0, [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"add": {"path": "a.parquet", "size": 1, "dataChange": True}},
            {"add": {"path": "b.parquet", "size": 1, "dataChange": True}},
        ])
        commit(1, [{"remove": {"path": "b.parquet", "dataChange": True}}])
        live = {
            r.path
            for r in deltalog.live_files(
                deltalog.read_log_actions(spark, base)
            ).collect()
        }
        assert live == {"a.parquet"}
        assert deltalog.read_snapshot(spark, base).count() == 5
        # resurrection: re-add b in a later commit
        commit(2, [{"add": {"path": "b.parquet", "size": 1, "dataChange": True}}])
        live2 = {
            r.path
            for r in deltalog.live_files(
                deltalog.read_log_actions(spark, base)
            ).collect()
        }
        assert live2 == {"a.parquet", "b.parquet"}
        assert deltalog.read_snapshot(spark, base).count() == 10

    def test_empty_live_set_raises(self, spark, tmp_path):
        import json

        from cdc_pipe_line_spark import deltalog

        log = tmp_path / "t2" / "_delta_log"
        log.mkdir(parents=True)
        with open(log / ("0" * 20 + ".json"), "w") as fh:
            fh.write(json.dumps({"add": {"path": "x.parquet", "size": 1, "dataChange": True}}) + "\n")
        with open(log / ("0" * 19 + "1.json"), "w") as fh:
            fh.write(json.dumps({"remove": {"path": "x.parquet", "dataChange": True}}) + "\n")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="no live files"):
            deltalog.read_snapshot(spark, str(log.parent))


class TestGlobalRowNumberDeterminism:
    def test_ranks_are_exact_permutation_on_multi_partition_input(self, spark):
        """Regression: the ranged frame feeds both the local-rank and
        census branches; unpinned, each branch re-samples range
        boundaries under a different RDD-id-derived seed and offsets
        drift off the pids (duplicate/skipped ranks — observed live
        on a 2550-row diff frame).  The localCheckpoint inside
        global_row_number must keep ranks an exact permutation."""
        from cdc_pipe_line_spark.functions import global_row_number

        df = (
            spark.range(0, 5000)
            .repartition(16)
            .select((F.col("id") * 7919 % 5000).alias("k"))
            .distinct()
        )
        ranked = global_row_number(df, ["k"], out_col="rn")
        rows = {r.k: r.rn for r in ranked.collect()}
        ks = sorted(rows)
        assert [rows[k] for k in ks] == list(range(1, len(ks) + 1))
