"""Round-15 optimization locks: the Arrow text-profile kernel must be
value-identical to the expression-family chain it replaced.

q_text_profile (optimization r15) computes its integer counts in one
``mapInArrow`` pass and leaves ratio/rounding arithmetic to the JVM.
The pre-r15 expression chain (text_stats / token_counts / language_id /
repetition_stats / scrub_counts over shared word arrays) remains in the
library as the composable operators — and serves here as the parity
reference, on a corpus built to hit every divergence candidate between
Java regex and Python ``re.ASCII`` semantics (whitespace classes incl.
\\x0B, trim-is-space-only, empty/blank/single-word docs, NULL text,
unicode case, URLs/emails/punctuation, duplicate lines and bigrams).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_pipe_line_spark.text import (
    _words,
    language_id,
    profile_features,
    repetition_stats,
    scrub_counts,
    text_stats,
    token_counts,
)

NASTY = [
    (1, "the  quick\tbrown\nfox,  jumps!  over http://x.y/z a@b.co", "en"),
    (2, "", "en"),
    (3, "   ", "en"),
    (4, "word", "en"),
    (5, "el la de los, el la \n\n el la\x0bde", "es"),
    (6, "a b a b a b", "de"),
    (7, "Line1\nLine1\n  \nLine2\tx", "fr"),
    (8, "café über straße İstanbul Kelvin", "de"),
    (9, "a@b.co c@d.org https://e.f/g?h=1 i123 456j !!", "en"),
    (10, None, "en"),
    (11, "der die das und ist ein le les des et est une", "de"),
    (12, "THE A AND OF TO IN IS", "en"),
    (13, "x " * 300, "en"),
    (14, " nbsp sep the", "en"),
    (15, "tab\x0bonly\x0cseps\rhere", "en"),
    (16, "the the the\nthe the\nthe the", "en"),
]


def _expression_profile(docs):
    """The pre-r15 expression-family chain (the parity oracle)."""
    w = docs.select("*", _words(F.col("text")).alias("__w"))
    w = w.select("*", F.transform("__w", F.lower).alias("__lw"))
    profiled = language_id(
        token_counts(text_stats(w, words_col="__w"), words_col="__w"),
        lower_words_col="__lw",
    )
    profiled = scrub_counts(repetition_stats(profiled, words_col="__w"))
    return profiled.select(
        "doc_id", "n_words", "avg_word_len", "punct_ratio",
        "stopword_ratio", "ws_tokens", "bpe_tokens", "lang", "lang_pred",
        "dup_line_frac", "dup_bigram_frac", "n_urls", "n_emails",
    )


def test_arrow_profile_matches_expression_chain(spark):
    docs = spark.createDataFrame(
        NASTY, "doc_id long, text string, lang string"
    )
    old = _expression_profile(docs)
    new = profile_features(docs)
    assert old.schema == new.schema
    assert old.exceptAll(new).count() == 0
    assert new.exceptAll(old).count() == 0


def test_arrow_profile_matches_on_fixture_corpus(spark):
    from cdc_pipe_line_spark.queries import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    old = _expression_profile(docs)
    new = profile_features(docs)
    assert old.exceptAll(new).count() == 0
    assert new.exceptAll(old).count() == 0


MINHASH_NASTY = [
    (1, "the  quick\tbrown\nfox,  jumps!  over the lazy dog now"),
    (2, ""),
    (3, "   "),
    (4, "one two three four"),  # < n words: dropped
    (5, "a b c d e"),
    (6, "a b c d e f"),
    (7, None),
    (8, "café über straße İstanbul Kelvin x y z"),
    (9, "w1\x0bw2\x0cw3\rw4\nw5 w6"),
    (10, "dup dup dup dup dup dup dup dup dup"),
    (11, "The Quick BROWN fox JUMPS over THE LAZY dog NOW"),
]


def test_fused_shingle_sig_matches_expression_path(spark):
    """The r15 fused shingle+signature Arrow kernel must emit exactly
    the shingle arrays (content AND first-occurrence order) and MinHash
    signatures of the shingle_df + minhash_signatures expression path,
    including the drop rules (NULL text, < n words)."""
    from cdc_pipe_line_spark.text import (
        minhash_signatures,
        shingle_df,
        shingle_sig_df,
    )

    docs = spark.createDataFrame(MINHASH_NASTY, "doc_id long, text string")
    old_sh = shingle_df(docs, id_col="doc_id", text_col="text", n=5)
    old_sig = minhash_signatures(docs, n=5, _shingles=old_sh)
    ss = shingle_sig_df(docs, n=5)
    for old, new in ((old_sh, ss.select("id", "sh")),
                     (old_sig, ss.select("id", "sig"))):
        assert old.exceptAll(new).count() == 0
        assert new.exceptAll(old).count() == 0


def test_fused_simhash_matches_expression_path(spark):
    """The r15 fused SimHash Arrow kernel must emit exactly the
    (id, h) rows of the r14 shape (shingle_df + md5-once projection +
    Arrow numpy vote), including the drop rules."""
    from pyspark.sql import functions as F

    from cdc_pipe_line_spark.text import (
        _simhash_vote_udf,
        shingle_df,
        simhash_df,
    )

    rows = [(i, t) for i, t in enumerate([
        "the  quick\tbrown\nfox,  jumps!  over the lazy dog now",
        "", "   ", "one two", "a b c", "a b c d", None,
        "café über straße İstanbul Kelvin x y z",
        "w1\x0bw2\x0cw3\rw4\nw5 w6", "dup dup dup dup dup",
        "The Quick BROWN fox JUMPS over THE LAZY dog NOW",
    ])]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = shingle_df(docs, id_col="doc_id", text_col="text", n=3)
    hexed = sh.select("id", F.transform("sh", F.md5).alias("__m"))

    def half(start):
        return F.transform(
            "__m",
            lambda s: F.conv(F.substring(s, start, 8), 16, 10).cast("bigint"),
        )

    old = hexed.select("id", _simhash_vote_udf()(half(1), half(9)).alias("h"))
    new = simhash_df(docs, n=3)
    assert old.exceptAll(new).count() == 0
    assert new.exceptAll(old).count() == 0


def test_khop_salted_adjacency_identical(spark):
    """The r15 skew guard in khop_reach's generic edge path (salted
    multi-row collect_set, bounded per-row neighbor arrays) must not
    change reachability: same (node, hop) set as an unsalted run, and
    per-source rows stay bounded by the bucket count."""
    import random

    from pyspark.sql import functions as F

    from cdc_pipe_line_spark.analytics import khop_reach

    rnd = random.Random(7)
    edges = [(rnd.randrange(40), rnd.randrange(40)) for _ in range(400)]
    # one hub with every node as neighbor (the row-size hazard shape)
    edges += [(99, i) for i in range(40)] + [(i, 99) for i in range(40)]
    e = spark.createDataFrame(edges, "src long, dst long")
    salted = khop_reach(e, 99, k=3, skew_buckets=4)
    unsalted = khop_reach(e, 99, k=3, skew_buckets=1)
    assert salted.exceptAll(unsalted).count() == 0
    assert unsalted.exceptAll(salted).count() == 0


def test_winnow_kernel_matches_expression_shape(spark):
    """The r15 winnowing fingerprint kernel must emit exactly the
    (doc_id, fp) set of the exploded expression shape (md5 per char
    position, sliding-window min, full windows only), including the
    short-doc (< k chars, < w grams), empty and NULL edge rows."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from cdc_pipe_line_spark.text import winnow_fingerprints

    k, w = 8, 4
    rows = [(i, t) for i, t in enumerate([
        "abcdefghijk", "abcdefghij", "short", "", None, "x" * 200,
        "the quick brown fox jumps over the lazy dog",
        "caféüberstraße İstanbul plus unicode padding here",
        "a b a b a b a b a b a b a b",
    ])]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    grams = docs.select(
        "doc_id",
        (F.greatest(F.length("text") - (k - 1), F.lit(1)) - 1).alias("maxpos"),
        F.posexplode(F.expr(
            f"transform(sequence(1, greatest(length(text) - {k - 1},"
            f" 1)), i -> conv(substring(md5(substring(text, i, {k})),"
            " 1, 8), 16, 10))")).alias("pos", "h"),
    ).select("doc_id", "maxpos", "pos", F.col("h").cast("bigint").alias("h"))
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    old = (grams.withColumn("wmin", F.min("h").over(win))
           .filter(F.col("pos") <= F.col("maxpos") - (w - 1))
           .select("doc_id", F.col("wmin").alias("fp")).distinct())
    new = winnow_fingerprints(docs, k=k, w=w)
    assert old.exceptAll(new).count() == 0
    assert new.exceptAll(old).count() == 0


def test_semantic_dedup_kernels_match_expression_path(spark):
    """The r15 dedup_semantic Arrow kernels (broadcast-seed numpy
    argmax + per-cluster applyInArrow pair scan) must reproduce the
    expression pipeline exactly, including round-to-4dp tie-breaks to
    the lowest centroid id and near-threshold boundary pairs.  (Zero-
    norm vectors are outside the operator's domain: ANSI mode raises
    DIVIDE_BY_ZERO in both forms.)"""
    import random

    from cdc_pipe_line_spark.similarity import (
        _semantic_dedup_exprs,
        semantic_dedup,
    )

    rnd = random.Random(11)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(200)]
    rows += [(200, [1e-30] * 8), (201, [1e-30] * 8)]  # tiny norms
    rows += [(202, [1.0] + [0.0] * 7), (203, [2.0] + [0.0] * 7),
             (204, [0.5] + [0.0] * 7)]  # exact duplicate directions
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    for thr in (0.35, 0.9999):
        old = _semantic_dedup_exprs(df, n_centroids=9, threshold=thr)
        new = semantic_dedup(df, n_centroids=9, threshold=thr)
        assert old.exceptAll(new).count() == 0
        assert new.exceptAll(old).count() == 0
