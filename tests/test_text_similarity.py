"""Golden-case tests for dedup, similarity, text analysis, multimodal
plumbing (the north-star training-data operators)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_pipe_line_spark.multimodal import (
    as_media_table,
    extract_media_meta,
    fake_decode_meta,
    sample_frames,
)
from cdc_pipe_line_spark.similarity import brute_force_topk, cosine, lsh_topk
from cdc_pipe_line_spark.text import (
    dedup_connected_components,
    dedup_exact,
    language_id,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    text_stats,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again ok"),
    (2, "the quick brown fox jumps over the lazy dog again and again ok"),  # exact dup
    (3, "the quick brown fox jumps over the lazy dog again and again now"),  # near dup
    (4, "completely different words about spark engines and shuffle planning"),
    (5, "el gato la casa de los perros y las flores es bonita"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_dedup_exact_min_id_survives(spark):
    out = dedup_exact(_docs(spark))
    ids = {r.doc_id for r in out.collect()}
    assert ids == {1, 3, 4, 5}  # doc 2 is an exact dup of 1


def test_ngram_jaccard_finds_near_dup(spark):
    pairs = ngram_jaccard_pairs(_docs(spark), n=5, threshold=0.5)
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    assert got[(1, 2)] == 1.0  # identical
    assert (1, 3) in got and 0.5 <= got[(1, 3)] < 1.0
    assert not any(4 in p or 5 in p for p in got)


def test_connected_components_multi_hop_chain(spark):
    """A 5-node chain (1-2-3-4-5) needs label propagation over
    multiple rounds — the min label must travel the full diameter —
    plus a separate 2-node component and pair ordering both ways."""
    pairs = spark.createDataFrame(
        [(1, 2), (3, 2), (3, 4), (5, 4), (11, 10)],
        "id_a long, id_b long",
    )
    out = {
        r.doc_id: r.keeper_id
        for r in dedup_connected_components(pairs).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_minhash_lsh_finds_near_dup(spark):
    pairs = minhash_lsh_pairs(_docs(spark), n=5, threshold=0.5)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got  # identical docs always collide in every band


def test_simhash_identical_distance_zero(spark):
    pairs = simhash_pairs(_docs(spark), max_hamming=3)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert got[(1, 2)] == 0
    assert (1, 4) not in got


def test_language_id_obvious_cases(spark):
    out = {r.doc_id: r.lang_pred for r in language_id(_docs(spark)).collect()}
    assert out[1] == "en" and out[5] == "es"


def test_text_stats_known_values(spark):
    df = spark.createDataFrame([(1, "Aa bb, cc!")], "doc_id long, text string")
    r = text_stats(df).collect()[0]
    assert r.n_words == 3
    assert r.punct_ratio == round(2 / 10, 4)
    assert r.avg_word_len == round(8 / 3, 4)


def _vecs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),   # close to 1
        (3, [0.0, 1.0, 0.0]),
        (4, [-1.0, 0.0, 0.0]),  # opposite of 1
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk_ordering(spark):
    emb = _vecs(spark)
    q = emb.filter("vec_id = 1").select(F.col("vec_id").alias("q_id"), "embedding")
    out = brute_force_topk(q, emb, k=2).collect()
    ranked = [(r.vec_id, r.rank) for r in sorted(out, key=lambda r: r.rank)]
    assert ranked == [(2, 1), (3, 2)]  # 2 closest, then orthogonal, never self


def test_lsh_recall_on_close_vectors(spark):
    """LSH must keep same-direction vectors in one bucket (hyperplane
    signs match for near-identical vectors with overwhelming prob at 6
    planes x this geometry)."""
    emb = _vecs(spark)
    q = emb.filter("vec_id = 1").select(F.col("vec_id").alias("q_id"), "embedding")
    out = lsh_topk(q, emb, k=2, n_planes=4, dim=3).collect()
    assert any(r.vec_id == 2 for r in out)


def test_ivf_recall_vs_brute_force(spark):
    """IVF with a healthy probe budget must recover most of the exact
    top-k on the real embeddings fixture (>=60% overlap at sf0.001 —
    probe recall, not exact equality, is the contract)."""
    from cdc_pipe_line_spark.queries import load_table
    from cdc_pipe_line_spark.similarity import ivf_topk

    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    exact = {
        (r.q_id, r.vec_id) for r in brute_force_topk(q, emb, k=10).collect()
    }
    approx = {
        (r.q_id, r.vec_id)
        for r in ivf_topk(q, emb, k=10, n_centroids=8, n_probe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall too low: {recall:.2f}"


def test_media_meta_matches_fake_decode(spark):
    docs = spark.createDataFrame([(7, "hello world")], "doc_id long, text string")
    media = as_media_table(
        docs, id_col="doc_id", payload_col=F.col("text").cast("binary"),
        media_type="image/fake",
    )
    r = extract_media_meta(media).collect()[0]
    assert r.n_bytes == 11
    assert (r.width, r.height) == fake_decode_meta(b"hello world")
    import hashlib

    assert r.content_md5 == hashlib.md5(b"hello world").hexdigest()


def test_sample_frames_bounds(spark):
    docs = spark.createDataFrame(
        [(1, "x" * 100), (2, "y" * 5000)], "doc_id long, text string"
    )
    media = as_media_table(
        docs, id_col="doc_id", payload_col=F.col("text").cast("binary"),
        media_type="video/fake",
    )
    out = sample_frames(media, every_n_bytes=1024, max_frames=3)
    counts = {r[0]: r[1] for r in out.groupBy("media_id").count().collect()}
    assert counts == {1: 1, 2: 3}  # min 1 frame, capped at max_frames
    offsets = [r.byte_offset for r in out.filter("media_id = 2").collect()]
    assert sorted(offsets) == [0, 1024, 2048]


def test_ngram_jaccard_max_df_bounds_hot_shingle_candidates(spark):
    """Adversarial corpus: 80% of docs share one boilerplate sentence.
    Without a df cap the inverted index pairs all of them (quadratic);
    with max_df the boilerplate shingles leave the candidate index, so
    boilerplate-only doc pairs vanish while genuinely-similar pairs
    keep their EXACT jaccard (hot shingles still count in |A∩B|)."""
    boiler = "all rights reserved contact support for more information today"
    rows = []
    # 40 docs that share ONLY the boilerplate sentence (distinct tails)
    for i in range(40):
        rows.append((i, f"{boiler} unique tail {i} zz{i} yy{i} xx{i} ww{i}"))
    # one genuine near-dup pair that also carries the boilerplate
    rows.append((100, f"{boiler} the quick brown fox jumps over the lazy dog"))
    rows.append((101, f"{boiler} the quick brown fox jumps over the lazy cat"))
    # 10 clean docs sharing nothing
    for i in range(200, 210):
        rows.append((i, f"totally unrelated content number {i} alpha{i} beta{i} gamma{i} delta{i} eps{i}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = ngram_jaccard_pairs(docs, n=5, threshold=0.3, max_df=5)
    got = {(r.id_a, r.id_b): r.jaccard for r in capped.collect()}
    # the quadratic boilerplate block is gone...
    assert not any(a < 100 and b < 100 for a, b in got), got
    # ...but the genuine pair survives via its rare fox/dog shingles
    assert (100, 101) in got

    # and its jaccard is EXACT: identical to the uncapped computation
    uncapped = ngram_jaccard_pairs(docs, n=5, threshold=0.3)
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in uncapped.filter("id_a = 100 and id_b = 101").collect()
    }
    assert got[(100, 101)] == exact[(100, 101)]


def test_levenshtein_max_block_bounds_hot_prefix(spark):
    """Adversarial corpus: many docs share one boilerplate 12-char
    prefix.  Without a cap that block is O(b^2) edit-distance verifies;
    with max_block_size the hot block leaves candidacy while pairs in
    healthy blocks keep their exact distances."""
    from cdc_pipe_line_spark.text import levenshtein_pairs

    rows = []
    # 30 docs sharing a long boilerplate prefix (identical first 12+
    # chars), mutually near-identical
    for i in range(30):
        rows.append((i, f"all rights reserved tail {i:03d}"))
    # one genuine near-dup pair in a small block
    rows.append((100, "zebra document alpha"))
    rows.append((101, "zebra document alphb"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = levenshtein_pairs(
        docs, max_distance=8, prefix_len=12, max_block_size=10
    )
    got = {(r.id_a, r.id_b): r.distance for r in capped.collect()}
    assert not any(a < 100 for a, b in got), got  # hot block dropped
    assert got.get((100, 101)) == 1  # healthy block kept, exact distance

    # uncapped finds the boilerplate pairs too (sanity: cap did the work)
    uncapped = levenshtein_pairs(
        docs, max_distance=8, prefix_len=12, max_block_size=None
    )
    assert uncapped.filter("id_a < 100").count() > 0


def test_minhash_shuffle_fallback_same_pairs(spark):
    """The guarded broadcast must be pure strategy: forcing the
    shuffle path (threshold 0) returns exactly the same verified
    pairs as the broadcast path."""
    from cdc_pipe_line_spark.text import minhash_lsh_pairs

    rows = []
    for i in range(20):
        rows.append((i, f"the quick brown fox jumps over the lazy dog {i}"))
        rows.append((1000 + i, f"the quick brown fox jumps over the lazy dog {i} x"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bcast = {
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_lsh_pairs(docs, threshold=0.3).collect()
    }
    shuf = {
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_lsh_pairs(
            docs, threshold=0.3, broadcast_verify_max=0
        ).collect()
    }
    assert bcast == shuf and bcast


def test_quota_sample_caps_each_group(spark):
    from cdc_pipe_line_spark.text import quota_sample

    rows = [(i, "big") for i in range(10)] + [(100, "small"), (101, "small")]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = quota_sample(df, group_col="lang", quota=3).collect()
    by_lang = {}
    for r in kept:
        by_lang.setdefault(r.lang, []).append((r.doc_id, r.seq))
    # deterministic: lowest ids kept, seq is the within-group rank
    assert sorted(by_lang["big"]) == [(0, 1), (1, 2), (2, 3)]
    assert sorted(by_lang["small"]) == [(100, 1), (101, 2)]
    # plan: rank pushdown, not a full per-group sort-and-filter
    plan = (
        quota_sample(df, group_col="lang", quota=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan


def test_pack_sequences_bins_by_running_budget(spark):
    from cdc_pipe_line_spark.text import pack_sequences

    rows = [
        (1, "en", 600), (2, "en", 600), (3, "en", 600),  # 0,0,1 @1000
        (4, "en", 2500),                                 # starts at 1800 -> bin 1
        (5, "en", 100),                                  # starts at 4300 -> bin 4
        (6, "de", 999), (7, "de", 2), (8, "de", 999),    # 0, 0, 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, ws_tokens long")
    got = {
        r.doc_id: r.seq
        for r in pack_sequences(
            df, budget=1000, group_col="lang", token_col="ws_tokens"
        ).collect()
    }
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, 5: 4, 6: 0, 7: 0, 8: 1}


def test_repetition_stats_flags_loops(spark):
    from cdc_pipe_line_spark.text import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "alpha beta\nalpha beta\ngamma delta"),       # dup line
            (2, "go go go go go go"),                          # dup bigrams
            (3, "all words here are fully distinct tokens"),   # clean
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert got[1].dup_line_frac > 0.3
    assert got[2].dup_bigram_frac == 0.8  # 5 bigrams, 1 distinct
    assert got[3].dup_line_frac == 0.0 and got[3].dup_bigram_frac == 0.0


def test_scrub_pii_and_counts(spark):
    from cdc_pipe_line_spark.text import scrub_counts, scrub_pii

    docs = spark.createDataFrame(
        [(1, "mail me at a.user+x@example.co or see https://ex.org/p?q=1 now")],
        "doc_id long, text string",
    )
    row = scrub_pii(scrub_counts(docs)).collect()[0]
    assert row.n_urls == 1 and row.n_emails == 1
    assert row.text_scrubbed == "mail me at <EMAIL> or see <URL> now"


def test_decontaminate_flags_overlap_only(spark):
    """A train doc sharing an 8-gram with the benchmark is flagged
    with the right hit count; clean docs and sub-n docs are absent."""
    from cdc_pipe_line_spark.text import decontaminate

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # shares two 8-grams (a 9-word window of the benchmark)
            (1, "alpha beta gamma delta epsilon zeta eta theta iota"),
            # same words, different order: no shared 8-gram
            (2, "iota theta eta zeta epsilon delta gamma beta alpha"),
            # too short to have any 8-gram
            (3, "alpha beta gamma"),
        ],
        "doc_id long, text string",
    )
    out = {r.id: r for r in decontaminate(train, bench, n=8).collect()}
    assert set(out) == {1}
    assert out[1].n_contaminated == 2
    assert out[1].contamination_frac == 1.0  # both of its 8-grams hit
    assert out[1].example_gram == "alpha beta gamma delta epsilon zeta eta theta"


def test_train_split_groups_are_atomic(spark):
    """Near-duplicate documents must land in the SAME split (their
    group keeper hashes for all of them); split fractions come from
    the md5 bucket so the assignment is deterministic."""
    from cdc_pipe_line_spark.text import train_split

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra"),          # near-dup of 1
            (3, "completely different words about spark partitions and shuffles"),
        ],
        "doc_id long, text string",
    )
    out = {r.id: r for r in train_split(docs).collect()}
    assert out[1].split_key == out[2].split_key == 1  # group keeper
    assert out[1].split == out[2].split               # atomic move
    assert out[3].split_key == 3                      # singleton hashes itself
    # deterministic across invocations
    again = {r.id: r for r in train_split(docs).collect()}
    assert {k: (v.bucket, v.split) for k, v in out.items()} == {
        k: (v.bucket, v.split) for k, v in again.items()
    }


def test_lm_score_known_model(spark):
    """Hand-computable bigram LM: train on one corpus, score another —
    exercises the OOV left-join path and the smoothing arithmetic."""
    import math

    from cdc_pipe_line_spark.text import lm_bigram_model, lm_score

    train = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    # unigrams: a:3 b:3 c:1 -> V=3; bigrams: 'a b':3, 'b a':1, 'b c':1
    model, vocab = lm_bigram_model(train)
    m = {r.gram: (r.c2, r.c1) for r in model.collect()}
    assert m == {"a b": (3, 3), "b a": (1, 3), "b c": (1, 3)}
    assert vocab.collect()[0].v == 3

    score_ab = math.log((3 + 1) / (3 + 3))  # P(b|a) smoothed
    score_oov = math.log((0 + 1) / (0 + 3))  # unseen first word
    out = {
        r.id: r
        for r in lm_score(
            spark.createDataFrame(
                [(10, "a b"), (11, "z z")], "doc_id long, text string"
            ),
            model,
            vocab,
        ).collect()
    }
    assert out[10].n_oov == 0
    assert out[10].avg_logp == round(score_ab, 4)
    assert out[10].ppl == round(math.exp(-round(score_ab, 4)), 4)
    assert out[11].n_oov == 1  # 'z z' never seen
    assert out[11].avg_logp == round(score_oov, 4)
    assert out[11].min_logp == round(score_oov, 4)


def test_lm_score_single_word_docs_dropped(spark):
    from cdc_pipe_line_spark.text import lm_bigram_model, lm_score

    docs = spark.createDataFrame(
        [(1, "hello"), (2, "hello world")], "doc_id long, text string"
    )
    model, vocab = lm_bigram_model(docs)
    out = lm_score(docs, model, vocab).collect()
    assert [r.id for r in out] == [2]  # no bigrams in doc 1


def test_sq8_recall_vs_brute_force(spark):
    """SQ8 quantization preserves top-k on a corpus with planted
    structure: recall@5 vs exact brute force must be high (the 256-
    level grid loses far less than cosine-neighborhood gaps)."""
    import numpy as np

    from cdc_pipe_line_spark.similarity import brute_force_topk, sq8_topk

    rng = np.random.RandomState(7)
    base = rng.randn(20, 16).astype("float32")
    rows = []
    vid = 0
    for b in base:
        for _ in range(10):  # 10 jittered neighbors per seed
            rows.append((vid, (b + rng.randn(16).astype("float32") * 0.05).tolist()))
            vid += 1
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = corpus.filter("vec_id % 50 = 0").selectExpr(
        "vec_id as q_id", "embedding"
    )
    exact = {
        (r.q_id, r.vec_id)
        for r in brute_force_topk(q, corpus, k=5).collect()
    }
    approx = {
        (r.q_id, r.vec_id)
        for r in sq8_topk(q, corpus, k=5, rerank=20, dim=16).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"SQ8 recall@5 {recall}"


def test_sq8_constant_dimension_codes_zero(spark):
    from pyspark.sql import functions as F

    from cdc_pipe_line_spark.similarity import sq8_bounds, sq8_topk

    corpus = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 3.0]), (3, [1.0, 2.5])],
        "vec_id long, embedding array<float>",
    )
    b = sq8_bounds(corpus, dim=2).collect()[0]
    assert b.mins == [1.0, 2.0] and b.maxs == [1.0, 3.0]
    q = corpus.filter("vec_id = 1").selectExpr("vec_id as q_id", "embedding")
    out = sq8_topk(q, corpus, k=2, rerank=2, dim=2).collect()
    assert {r.vec_id for r in out} == {2, 3}  # self excluded, both ranked
    assert all(r.approx_sim is not None for r in out)


def test_domain_mix_budget_semantics(spark):
    """Greedy fill: the exclusive running sum gates inclusion, so the
    boundary doc is taken, the next one is not; unknown domains get
    the default budget."""
    from cdc_pipe_line_spark.text import domain_mix

    docs = spark.createDataFrame(
        [(i, "a", 40) for i in range(10)] + [(100, "b", 40), (101, "b", 40)],
        "doc_id long, source string, ws_tokens long",
    )
    out = domain_mix(
        docs, {"a": 100}, default_budget=50, token_col="ws_tokens"
    ).collect()
    a = sorted([r for r in out if r.domain == "a"], key=lambda r: r.cum_before)
    assert [r.cum_before for r in a] == [0, 40, 80, 120, 160, 200, 240, 280, 320, 360]
    assert [r.take for r in a] == [True, True, True] + [False] * 7
    # default budget 50: second b-doc starts at cum_before=40 < 50, so
    # BOTH are taken — the boundary doc straddles the budget
    b = {r.id: r.take for r in out if r.domain == "b"}
    assert sum(b.values()) == 2


def test_duplicate_spans_merges_overlaps(spark):
    """Two docs share a 6-word run; with n=4 the three duplicated
    start positions merge into ONE span covering the run, and unique
    text produces no spans."""
    from cdc_pipe_line_spark.text import duplicate_spans

    shared = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (1, f"one two {shared} three four"),
            (2, f"{shared} five six seven eight"),
            (3, "totally unrelated words nine ten eleven twelve"),
        ],
        "doc_id long, text string",
    )
    out = {r.id: r for r in duplicate_spans(docs, n=4, min_df=2).collect()}
    assert set(out) == {1, 2}
    # doc 1: shared run occupies word indices 2..7 -> grams at 2,3,4
    assert (out[1].span_start, out[1].span_end, out[1].n_positions) == (2, 8, 3)
    # doc 2: run at indices 0..5 -> grams at 0,1,2
    assert (out[2].span_start, out[2].span_end, out[2].n_positions) == (0, 6, 3)


def test_duplicate_spans_disjoint_islands(spark):
    """Two separated shared runs in one doc yield two spans."""
    from cdc_pipe_line_spark.text import duplicate_spans

    a = "red green blue white"
    b = "cat dog fox owl"
    docs = spark.createDataFrame(
        [
            (1, f"{a} xx yy zz qq ww ee {b}"),
            (2, f"{a} mm nn oo pp rr tt {b}"),
        ],
        "doc_id long, text string",
    )
    spans = sorted(
        (r.id, r.span_start, r.span_end)
        for r in duplicate_spans(docs, n=4, min_df=2).collect()
    )
    assert spans == [(1, 0, 4), (1, 10, 14), (2, 0, 4), (2, 10, 14)]


def test_strip_spans_cuts_exact_ranges(spark):
    """Applying spans removes exactly the covered words, keeps order,
    and passes untouched docs through in normalized form."""
    from cdc_pipe_line_spark.text import duplicate_spans, strip_spans

    shared = "alpha beta gamma delta"
    docs = spark.createDataFrame(
        [
            (1, f"one two {shared} three"),
            (2, f"{shared} five six seven"),
            (3, "unique text with no duplicate runs at all"),
        ],
        "doc_id long, text string",
    )
    spans = duplicate_spans(docs, n=4, min_df=2)
    out = {r.id: r for r in strip_spans(docs, spans).collect()}
    assert out[1].clean_text == "one two three"
    assert out[1].n_removed == 4 and out[1].n_words == 7
    assert out[2].clean_text == "five six seven"
    assert out[3].clean_text == "unique text with no duplicate runs at all"
    assert out[3].n_removed == 0


def test_ivf_sq8_recall_vs_brute_force(spark):
    """The composed IVF-SQ8 path keeps most of the exact top-10 on the
    real embeddings fixture — quantization must not degrade the
    probe-bounded recall below the plain-IVF contract."""
    from cdc_pipe_line_spark.queries import load_table
    from cdc_pipe_line_spark.similarity import ivf_sq8_topk

    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    exact = {
        (r.q_id, r.vec_id) for r in brute_force_topk(q, emb, k=10).collect()
    }
    approx = {
        (r.q_id, r.vec_id)
        for r in ivf_sq8_topk(
            q, emb, k=10, n_centroids=8, n_probe=4, rerank=40
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF-SQ8 recall too low: {recall:.2f}"


def test_hash_tf_embed_near_dups_are_neighbors(spark):
    """Hash-TF embedding: identical docs embed identically, a near-dup
    is the top cosine neighbor, and the vector is the exact TF
    histogram (sums to word count)."""
    from cdc_pipe_line_spark.similarity import brute_force_topk
    from cdc_pipe_line_spark.text import hash_tf_embed

    emb = hash_tf_embed(_docs(spark), dim=32).select(
        F.col("id").alias("doc_id"), "embedding"
    )
    vecs = {r.doc_id: r.embedding for r in emb.collect()}
    assert vecs[1] == vecs[2]  # exact dup -> identical embedding
    assert sum(vecs[1]) == 13  # 13 words in the doc
    q = emb.filter("doc_id = 1").selectExpr("doc_id as q_id", "embedding")
    top = sorted(
        brute_force_topk(q, emb, corpus_id="doc_id", k=2).collect(),
        key=lambda r: r.rank,
    )
    assert top[0].doc_id == 2 and top[0].cos_sim == 1.0
    assert top[1].doc_id == 3  # near-dup ranks next


def test_incremental_dedup_flags_only_incoming_dups(spark):
    """Incoming docs that near-duplicate the existing corpus are
    flagged against their index match; novel incoming docs are not;
    existing-vs-existing pairs never appear."""
    from cdc_pipe_line_spark.text import incremental_minhash_dedup

    base = "the quick brown fox jumps over the lazy dog again and again ok"
    existing = spark.createDataFrame(
        [(1, base), (2, "completely different corpus content about spark")],
        "doc_id long, text string",
    )
    incoming = spark.createDataFrame(
        [(10, base), (11, "entirely novel incoming text nothing matches")],
        "doc_id long, text string",
    )
    out = incremental_minhash_dedup(existing, incoming, n=5, threshold=0.5)
    rows = [(r.id_new, r.id_old, r.jaccard) for r in out.collect()]
    assert rows == [(10, 1, 1.0)]


def test_duplicate_spans_boilerplate_stays_linear(spark):
    """Adversarial corpus: 120 docs all sharing one boilerplate run.
    The doc-frequency marking join is doc-linear by construction (the
    dup-gram list is distinct), so every doc gets exactly ONE merged
    span — no pairwise blowup like an all-pairs candidate join."""
    from cdc_pipe_line_spark.text import duplicate_spans

    boiler = "all rights reserved contact support for more details"
    docs = spark.createDataFrame(
        [(i, f"{boiler} unique tail {i} a{i} b{i} c{i}") for i in range(120)],
        "doc_id long, text string",
    )
    out = duplicate_spans(docs, n=6, min_df=2).collect()
    assert len(out) == 120  # exactly one span per doc, not O(n^2) rows
    # the shared run is the 8-word boilerplate PLUS 'unique tail'
    # (also common to every doc): dup 6-grams start at 0..4 -> [0, 10)
    assert all(r.span_start == 0 and r.span_end == 10 for r in out)


def test_chunk_documents_window_semantics(spark):
    """Windows advance by chunk-overlap, the tail keeps the remainder,
    short docs give one window, and the union of chunks covers every
    word with exactly the overlap duplicated."""
    from cdc_pipe_line_spark.text import chunk_documents

    text = " ".join(f"w{i}" for i in range(11))
    docs = spark.createDataFrame(
        [(1, text), (2, "only three words")], "doc_id long, text string"
    )
    out = sorted(
        chunk_documents(docs, chunk_size=6, overlap=2).collect(),
        key=lambda r: (r.id, r.chunk_id),
    )
    d1 = [(r.start_word, r.n_words, r.chunk_text) for r in out if r.id == 1]
    # 11 words, size 6, stride 4 -> ceil(9/4)=3 windows: 0..5, 4..9, 8..10
    assert d1 == [
        (0, 6, "w0 w1 w2 w3 w4 w5"),
        (4, 6, "w4 w5 w6 w7 w8 w9"),
        (8, 3, "w8 w9 w10"),
    ]
    d2 = [(r.chunk_id, r.n_words) for r in out if r.id == 2]
    assert d2 == [(0, 3)]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_size=4, overlap=4)


def test_luhn_valid_known_cards(spark):
    from cdc_pipe_line_spark.text import luhn_valid

    # 4532015112830366 is a canonical Luhn-valid test number; flipping
    # the check digit must invalidate it.
    df = spark.createDataFrame(
        [("4532015112830366",), ("4532015112830367",),
         ("0000000000000000",)],
        "card string",
    ).withColumn("ok", luhn_valid(F.col("card")))
    got = {r.card: r.ok for r in df.collect()}
    assert got["4532015112830366"] is True
    assert got["4532015112830367"] is False
    assert got["0000000000000000"] is True  # sum 0 % 10 == 0


def test_pii_audit_counts(spark):
    from cdc_pipe_line_spark.text import pii_audit

    rows = [
        (1, "call +1-555-123-4567 or +44-201-711-2345 now"),
        (2, "server 192.168.0.1 talks to 10.0.0.2"),
        (3, "ssn 123-45-6789 card 4532015112830366 junk 4532015112830367"),
        (4, "no pii here at all"),
    ]
    df = pii_audit(
        spark.createDataFrame(rows, "doc_id long, text string")
    )
    got = {r.doc_id: r for r in df.collect()}
    assert got[1].n_phones == 2
    assert got[2].n_ipv4 == 2
    assert got[3].n_ssn_shaped == 1
    assert got[3].n_card_shaped == 2
    assert got[3].n_cards_luhn_valid == 1  # only the valid specimen
    assert (
        got[4].n_phones == got[4].n_ipv4 == got[4].n_ssn_shaped
        == got[4].n_card_shaped == got[4].n_cards_luhn_valid == 0
    )


def test_semantic_dedup_drops_within_cluster_dups(spark):
    from cdc_pipe_line_spark.similarity import semantic_dedup

    # Multiplicative-hash seed ranks for these ids: 0 < 5 < 1 < 2 < 4,
    # so with a budget of 2 the seeds are ids 0 and 5.  1 duplicates
    # 0's direction (same cluster, cosine 1.0 -> dropped); 2 and 4 are
    # orthogonal / anti-parallel to every centroid (tie or negative ->
    # land in cluster 0, nothing similar); 5 anchors its own cluster.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [2.0, 0.0, 0.0, 0.0]),   # dup of 0 (cosine 1)
        (2, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
        (5, [0.0, 0.0, -1.0, 0.0]),  # anti-parallel to 4
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup(df, n_centroids=2, threshold=0.95)
    got = {r.cluster_id: r for r in out.collect()}
    c0 = got[0]
    assert c0.n_pairs >= 1 and c0.n_dropped == 1 and c0.dropped_id_sum == 1
    total_dropped = sum(r.n_dropped for r in got.values())
    assert total_dropped == 1  # only the true duplicate is dropped


def test_pack_sequences_budget_invariants(spark):
    from cdc_pipe_line_spark.text import chunk_pack_sequences

    # shard A: 3+4+5=12 tokens, budget 8 -> pack0 = 8 tokens
    # (doc2 splits), pack1 = 4 tokens
    rows = [
        (1, "A", "a b c"),
        (2, "A", "d e f g"),
        (3, "A", "h i j k l"),
        (4, "B", "x y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {(r.shard, r.pack_id): r for r in chunk_pack_sequences(df, budget=8).collect()}
    a0, a1, b0 = out[("A", 0)], out[("A", 1)], out[("B", 0)]
    assert a0.n_tokens == 8 and a1.n_tokens == 4
    assert a0.n_docs == 3 and a1.n_docs == 1
    assert a0.n_split_docs == 1 and a1.n_split_docs == 1  # doc3 in both
    assert b0.n_tokens == 2 and b0.n_docs == 1 and b0.n_split_docs == 0
    # every non-tail pack is exactly the budget


def test_line_dedup_first_occurrence_and_reconstruction(spark):
    from cdc_pipe_line_spark.text import line_dedup

    # 2-word lines: doc 1 = [a b][c d], doc 2 repeats [a b] then has
    # its own [e f]; doc 3 repeats BOTH of doc 1's lines (drops to
    # zero kept lines); within-doc duplicate line in doc 4 keeps only
    # the first copy.
    rows = [
        (1, "a b c d"),
        (2, "a b e f"),
        (3, "a b c d"),
        (4, "g h g h"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in line_dedup(df, line_words=2).collect()
    }
    assert (got[1].n_lines, got[1].n_kept, got[1].n_dropped) == (2, 2, 0)
    assert (got[2].n_lines, got[2].n_kept) == (2, 1)  # [a b] lost
    assert (got[3].n_kept, got[3].n_dropped) == (0, 2)  # fully boilerplate
    assert (got[4].n_kept, got[4].n_dropped) == (1, 1)  # intra-doc dup
    assert got[1].kept_words == 4 and got[2].kept_words == 2
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert got[1].clean_md5 == md5("a b c d")
    assert got[2].clean_md5 == md5("e f")
    assert got[3].clean_md5 == md5("")
    assert got[4].clean_md5 == md5("g h")


def test_decontaminate_bloom_identical_to_exact(spark):
    """The Bloom-prefiltered decontamination must be ROW-IDENTICAL to
    the exact pipeline (no false negatives; false positives die in the
    verify join) — including at a deliberately tiny bitmap where the
    false-positive rate is high."""
    from cdc_pipe_line_spark.text import decontaminate, decontaminate_bloom

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [(i, f"doc {i} unique filler words number {i} " + base)
            for i in range(1, 6)]
    rows += [(100 + i, f"totally clean document {i} with nothing shared "
              f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}")
             for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = docs.filter("doc_id = 1")
    train = docs.filter("doc_id <> 1")
    exact = {
        (r.id, r.n_contaminated, r.contamination_frac, r.example_gram)
        for r in decontaminate(train, bench, n=8).collect()
    }
    for bits in (1 << 8, 1 << 16):  # tiny bitmap -> heavy FP pressure
        bloomed = {
            (r.id, r.n_contaminated, r.contamination_frac, r.example_gram)
            for r in decontaminate_bloom(
                train, bench, n=8, num_bits=bits
            ).collect()
        }
        assert bloomed == exact, f"mismatch at num_bits={bits}"
    assert exact  # the planted overlap must actually flag
