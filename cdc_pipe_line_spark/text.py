"""Text-analysis + deduplication operators for large-scale training-data
pipelines (BASELINE.json north-star: dedup, text analysis over
``documents``).

Everything here is built for the 100 TB posture:

- per-document features (stats, language-ID, fingerprints) are narrow
  Catalyst expressions — no shuffle, no UDF;
- exact dedup is one hash-groupBy;
- near-dup (Jaccard / MinHash-LSH / SimHash) avoids the O(n^2) pairs
  blowup by generating candidates from shared buckets (shingles,
  LSH bands, SimHash bands) and only verifying candidates.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Tiny built-in stopword lexicons for the n-gram language heuristic.
LANG_LEXICON: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is"],
    "es": ["el", "la", "de", "los", "las", "y", "es"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "fr": ["le", "les", "des", "et", "est", "une"],
}

#: BPE-ish tokenizer: letter runs, digit runs, single other symbols.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _words(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def normalize_text(text: Column) -> Column:
    """Canonical form for hashing: lowercase, collapsed whitespace."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def text_stats(
    df: DataFrame, text_col: str = "text", *, words_col: str | None = None
) -> DataFrame:
    """Quality-scoring features (length / punctuation / stopword
    ratios).  Narrow projection, codegen'd.

    ``words_col`` names a pre-materialized word array: Catalyst does
    no common-subexpression elimination inside higher-order-function
    lambdas, so pipelines computing several word-based feature
    families over the same scan should split the text once and share
    the column (see ``queries.text_q.q_text_profile``).
    """
    t = F.col(text_col)
    words = F.col(words_col) if words_col else _words(t)
    n_chars = F.length(t).cast("bigint")
    n_words = F.size(words).cast("bigint")
    stop_hits = F.size(
        F.filter(words, lambda w: F.lower(w).isin(LANG_LEXICON["en"]))
    ).cast("bigint")
    n_punct = (
        F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    ).cast("bigint")
    return df.withColumns(
        {
            "n_chars": n_chars,
            "n_words": n_words,
            "avg_word_len": F.round(
                (F.length(F.regexp_replace(t, r"\s+", "")) / F.greatest(n_words, F.lit(1))),
                4,
            ),
            "punct_ratio": F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4),
            "stopword_ratio": F.round(stop_hits / F.greatest(n_words, F.lit(1)), 4),
        }
    )


def token_counts(
    df: DataFrame, text_col: str = "text", *, words_col: str | None = None
) -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens per document.

    ``words_col``: see :func:`text_stats`."""
    t = F.col(text_col)
    words = F.col(words_col) if words_col else _words(t)
    return df.withColumns(
        {
            "ws_tokens": F.size(words).cast("bigint"),
            "bpe_tokens": F.size(F.regexp_extract_all(t, F.lit(TOKEN_REGEX), 0)).cast(
                "bigint"
            ),
        }
    )


def language_id(
    df: DataFrame,
    text_col: str = "text",
    *,
    lower_words_col: str | None = None,
) -> DataFrame:
    """Heuristic language ID: stopword-hit counts per language, argmax
    with deterministic (count desc, lang asc) tie-break; 'und' when no
    lexicon word occurs.

    ``lower_words_col`` names a pre-materialized LOWERCASED word
    array; without it the split+lower expression is re-evaluated per
    lexicon filter (no CSE inside HOF lambdas — see
    :func:`text_stats`)."""
    if lower_words_col:
        lw = F.col(lower_words_col)
    else:
        lw = F.transform(_words(F.col(text_col)), lambda w: F.lower(w))
    hit_cols = []
    for lang, lex in sorted(LANG_LEXICON.items()):
        hits = F.size(F.filter(lw, lambda w: w.isin(lex))).cast("bigint")
        hit_cols.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*hit_cols))
    # array_max on struct compares (hits, lang) lexicographically: max
    # hits, then max lang — flip lang to get asc tie-break? Keep desc
    # on hits; tie-break = lexicographically LARGEST lang. Determinism
    # is what matters; document the rule.
    # __best is materialized in its own projection: lang_pred references
    # it twice (.hits guard + .lang value) and Catalyst would otherwise
    # inline the whole 2x4-filter scoring array into both references.
    return (
        df.withColumn("__best", best)
        .withColumn(
            "lang_pred",
            F.when(
                F.col("__best").getField("hits") > 0,
                F.col("__best").getField("lang"),
            ).otherwise(F.lit("und")),
        )
        .drop("__best")
    )


#: URL / email patterns shared by scrub + count (kept simple enough to
#: behave identically in Spark's and DuckDB's regex engines).
URL_REGEX = r"https?://[^\s]+"
EMAIL_REGEX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def repetition_stats(
    df: DataFrame, text_col: str = "text", *, words_col: str | None = None
) -> DataFrame:
    """Gopher-style repetition signals (quality filtering for training
    corpora): the fraction of non-blank lines that repeat an earlier
    line, and the fraction of word bigrams that are repeats.  Both are
    narrow codegen'd array expressions — no shuffle, no UDF; a
    boilerplate-heavy or looping document scores high on either.

    ``words_col``: see :func:`text_stats`.
    """
    t = F.col(text_col)
    words = F.col(words_col) if words_col else _words(t)
    lines = F.filter(
        F.split(t, r"\n"), lambda x: F.length(F.trim(x)) > 0
    )
    bigrams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - 2, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, 2)),
    )
    bigrams = F.when(F.size(words) >= 2, bigrams).otherwise(F.array())
    return df.withColumns(
        {
            "dup_line_frac": F.round(
                1
                - F.size(F.array_distinct(lines))
                / F.greatest(F.size(lines), F.lit(1)),
                4,
            ),
            "dup_bigram_frac": F.round(
                1
                - F.size(F.array_distinct(bigrams))
                / F.greatest(F.size(bigrams), F.lit(1)),
                4,
            ),
        }
    )


def scrub_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Count URL / email occurrences per document (the audit columns a
    scrubbing pipeline keys its reporting on).  Narrow projection."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_urls": F.size(F.regexp_extract_all(t, F.lit(URL_REGEX), 0)).cast(
                "bigint"
            ),
            "n_emails": F.size(
                F.regexp_extract_all(t, F.lit(EMAIL_REGEX), 0)
            ).cast("bigint"),
        }
    )


# ---------------------------------------------------------------------------
# Arrow profile pass (optimization r15): the five expression families
# above are the composable per-feature operators; q_text_profile runs
# all of them over the same scan, where the cost is interpreted
# higher-order-function lambdas per word (no CSE inside HOF lambdas,
# 5 families x several array passes each).  One ``mapInArrow`` pass
# computes every INTEGER count per document in the Python worker
# (regexes precompiled once per worker at module import — guide §4.5)
# and leaves ALL float arithmetic (ratios + round(x, 4)) to the same
# JVM expressions as before, so the floating-point results are
# bit-identical by construction: same integer inputs, same division
# AST, same BigDecimal HALF_UP rounding.  Measured 1.12 -> 0.67 s on
# the bench slot at sf0.1 (the expression-tuning alternative was also
# measured — see OPTIMIZATION_r15.md).
#
# Exact-parity notes (locked by tests/test_round15_profile.py):
# - ``re.ASCII`` makes Python's \s/\w the same ASCII classes as Java
#   regex defaults ([ \t\n\x0B\f\r] and [a-zA-Z_0-9]);
# - Spark ``trim`` strips 0x20 only -> ``str.strip(" ")``;
# - Spark ``split`` keeps leading/trailing empty tokens (limit -1),
#   like ``re.split``;
# - NULL text propagates NULL counts (size(NULL) is NULL) EXCEPT the
#   bigram pair (the ``otherwise(array())`` branch makes them 0, so
#   dup_bigram_frac is 1.0) and lang_pred (NULL > 0 is false -> 'und').

_PROF_WS_RE = re.compile(r"\s+", re.ASCII)
_PROF_PUNCT_RE = re.compile(r"[^\w\s]", re.ASCII)
_PROF_TOKEN_RE = re.compile(TOKEN_REGEX, re.ASCII)
_PROF_URL_RE = re.compile(URL_REGEX, re.ASCII)
_PROF_EMAIL_RE = re.compile(EMAIL_REGEX, re.ASCII)
_PROF_LANGS = sorted(LANG_LEXICON)
_PROF_LEX = {lang: frozenset(LANG_LEXICON[lang]) for lang in _PROF_LANGS}
_PROF_EN = _PROF_LANGS.index("en")

_PROF_COUNT_COLS = (
    "n_chars", "n_words", "n_nospace", "n_punct", "stop_hits",
    "bpe_tokens", "lang_pred", "n_lines", "n_dist_lines",
    "n_bigrams", "n_dist_bigrams", "n_urls", "n_emails",
)

PROFILE_COUNTS_SCHEMA = (
    "doc_id long, lang string, n_chars long, n_words long, "
    "n_nospace long, n_punct long, stop_hits long, bpe_tokens long, "
    "lang_pred string, n_lines long, n_dist_lines long, "
    "n_bigrams long, n_dist_bigrams long, n_urls long, n_emails long"
)


def _profile_count_batches(it):
    """mapInArrow kernel: (doc_id, text, lang) batches -> integer
    profile counts.  Lives at module level so local-mode Python
    workers unpickle it by reference (importable from the shipped
    package, not a closure)."""
    import pyarrow as pa

    for batch in it:
        ids, texts, langs = batch.column(0), batch.column(1), batch.column(2)
        out: dict[str, list] = {k: [] for k in _PROF_COUNT_COLS}
        for t in texts.to_pylist():
            if t is None:
                for k in _PROF_COUNT_COLS:
                    out[k].append(None)
                # size(NULL)>=2 is NULL -> otherwise(array()) -> size 0
                out["n_bigrams"][-1] = 0
                out["n_dist_bigrams"][-1] = 0
                out["lang_pred"][-1] = "und"  # NULL hits > 0 -> otherwise
                continue
            words = _PROF_WS_RE.split(t.strip(" "))
            n_words = len(words)
            lw = [w.lower() for w in words]
            hits = [
                sum(1 for w in lw if w in _PROF_LEX[lg]) for lg in _PROF_LANGS
            ]
            best_hits, best_lang = max(zip(hits, _PROF_LANGS))
            lines = [x for x in t.split("\n") if x.strip(" ") != ""]
            if n_words >= 2:
                bigrams = [
                    words[i] + " " + words[i + 1] for i in range(n_words - 1)
                ]
            else:
                bigrams = []
            out["n_chars"].append(len(t))
            out["n_words"].append(n_words)
            out["n_nospace"].append(len(_PROF_WS_RE.sub("", t)))
            out["n_punct"].append(len(_PROF_PUNCT_RE.findall(t)))
            out["stop_hits"].append(hits[_PROF_EN])
            out["bpe_tokens"].append(len(_PROF_TOKEN_RE.findall(t)))
            out["lang_pred"].append(best_lang if best_hits > 0 else "und")
            out["n_lines"].append(len(lines))
            out["n_dist_lines"].append(len(set(lines)))
            out["n_bigrams"].append(len(bigrams))
            out["n_dist_bigrams"].append(len(set(bigrams)))
            out["n_urls"].append(len(_PROF_URL_RE.findall(t)))
            out["n_emails"].append(len(_PROF_EMAIL_RE.findall(t)))
        yield pa.RecordBatch.from_arrays(
            [ids, langs]
            + [
                pa.array(
                    out[k],
                    type=pa.string() if k == "lang_pred" else pa.int64(),
                )
                for k in _PROF_COUNT_COLS
            ],
            names=["doc_id", "lang", *_PROF_COUNT_COLS],
        )


def profile_features(df: DataFrame) -> DataFrame:
    """The full per-document profile (quality stats, token counts,
    language ID, repetition signals, scrub counts) in ONE narrow
    ``mapInArrow`` pass over ``(doc_id, text, lang)`` plus a JVM
    ratio/rounding projection.  Result columns and values are
    identical to chaining :func:`text_stats` / :func:`token_counts` /
    :func:`language_id` / :func:`repetition_stats` /
    :func:`scrub_counts` over shared word arrays (the pre-r15 shape,
    kept as the composable per-feature operators and as the parity
    reference in tests)."""
    counts = df.select("doc_id", "text", "lang").mapInArrow(
        _profile_count_batches, PROFILE_COUNTS_SCHEMA
    )
    gw = F.greatest(F.col("n_words"), F.lit(1))
    return counts.select(
        "doc_id",
        "n_words",
        F.round(F.col("n_nospace") / gw, 4).alias("avg_word_len"),
        F.round(
            F.col("n_punct") / F.greatest(F.col("n_chars"), F.lit(1)), 4
        ).alias("punct_ratio"),
        F.round(F.col("stop_hits") / gw, 4).alias("stopword_ratio"),
        F.col("n_words").alias("ws_tokens"),
        "bpe_tokens",
        "lang",
        "lang_pred",
        F.round(
            1 - F.col("n_dist_lines") / F.greatest(F.col("n_lines"), F.lit(1)),
            4,
        ).alias("dup_line_frac"),
        F.round(
            1
            - F.col("n_dist_bigrams")
            / F.greatest(F.col("n_bigrams"), F.lit(1)),
            4,
        ).alias("dup_bigram_frac"),
        "n_urls",
        "n_emails",
    )


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    *,
    out_col: str = "text_scrubbed",
    url_token: str = "<URL>",
    email_token: str = "<EMAIL>",
) -> DataFrame:
    """Replace URLs and emails with placeholder tokens (C4-style
    pre-training scrub).  Emails first: a URL can contain an
    ``@``-free authority but an email never contains ``://``, so the
    order only matters for pathological inputs; both passes are
    JVM-side ``regexp_replace`` (narrow, codegen'd)."""
    t = F.col(text_col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(t, EMAIL_REGEX, email_token), URL_REGEX, url_token
    )
    return df.withColumn(out_col, scrubbed)


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the normalized text (exact-dup
    key), plus a 64-bit rolling-style hash (xxhash64 of the word
    sequence)."""
    norm = normalize_text(F.col(text_col))
    return df.withColumns(
        {
            "fp_md5": F.md5(norm),
            "fp_hash64": F.xxhash64(norm),
        }
    )


# ----------------------------------------------------------------- dedup

def dedup_exact(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup on the normalized-text hash; the smallest id in each
    group survives (deterministic).  One hash-groupBy shuffle."""
    keyed = df.withColumn("__fp", F.md5(normalize_text(F.col(text_col))))
    w = Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__fp", "__rn")
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: flag every training document that
    shares at least one word ``n``-gram with any benchmark/eval
    document (the train/test-overlap scrub an LLM data pipeline runs
    before training; 8-grams are the common published choice).

    Returns ``(id, n_contaminated, contamination_frac, example_gram)``
    — one row per CONTAMINATED training document: how many
    distinct-per-doc grams hit the benchmark index, the fraction of
    the doc's grams that did (pipelines typically drop above a
    fraction threshold, not a raw count), and the lexicographically
    smallest offender for auditability.  Anti-join the ids to drop
    them.

    Scale shape: the benchmark side collapses to a distinct-gram
    inverted index (eval suites are tiny next to a training corpus —
    AQE broadcasts it when it fits, and the equi-join on the gram
    means clean documents generate no candidates at all).  The train
    side is the same exploded-shingle stream every dedup operator
    here uses; nothing is ever O(train x benchmark).
    """
    # Pin both shingle frames: the shingle column is an expensive
    # higher-order expression, and downstream Project collapse inlines
    # it into EVERY consumer (size + explode + join key each recompute
    # it from text) — measured 52 s -> 5.2 s (10x) on 50k docs at sf1
    # with both pins (BENCH_NOTES round 7).
    tr = shingle_df(
        train, id_col=id_col, text_col=text_col, n=n
    ).localCheckpoint(eager=True)
    bm = shingle_df(
        benchmark, id_col=id_col, text_col=text_col, n=n
    ).localCheckpoint(eager=True)
    bm_grams = bm.select(F.explode("sh").alias("gram")).distinct()
    return (
        tr.select("id", F.size("sh").alias("__n_sh"), F.explode("sh").alias("gram"))
        .join(bm_grams, "gram")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_contaminated"),
            F.round(F.count("*") / F.first("__n_sh"), 4).alias(
                "contamination_frac"
            ),
            F.min("gram").alias("example_gram"),
        )
    )


def decontaminate_bloom(
    train: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """:func:`decontaminate` with an explicit runtime Bloom prefilter
    on the training gram stream — the composition for the regime
    where the benchmark gram set is large (millions of eval grams
    across dozens of suites): instead of shuffling the ENTIRE
    exploded train gram stream into the equi-join, a <=128 KiB bitmap
    over the benchmark grams broadcasts to every task and sheds the
    overwhelmingly-clean grams BEFORE the join's exchange.  At 100 TB
    the train gram stream is ~10^11 rows and >99.9% of them match
    nothing; the bitmap turns that into a scan-side filter.

    No false negatives (Bloom guarantee), and survivors still pass
    the EXACT gram join, so the output is row-identical to
    :func:`decontaminate` — which is exactly what the oracle checks
    (same contract as ``join_bloom_prefilter`` vs the plain join).
    """
    from cdc_pipe_line_spark.joins import bloom_filter_build, bloom_prefilter

    tr = shingle_df(
        train, id_col=id_col, text_col=text_col, n=n
    ).localCheckpoint(eager=True)
    bm = shingle_df(
        benchmark, id_col=id_col, text_col=text_col, n=n
    ).localCheckpoint(eager=True)
    # referenced twice (bitmap build + exact verify join): pin, or the
    # distinct-gram aggregate runs twice
    bm_grams = (
        bm.select(F.explode("sh").alias("gram"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    bloom = bloom_filter_build(
        bm_grams, "gram", num_bits=num_bits, num_hashes=num_hashes
    )
    stream = tr.select(
        "id", F.size("sh").alias("__n_sh"), F.explode("sh").alias("gram")
    )
    pre = bloom_prefilter(
        stream, bloom, "gram", num_bits=num_bits, num_hashes=num_hashes
    )
    return (
        pre.join(bm_grams, "gram")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_contaminated"),
            F.round(F.count("*") / F.first("__n_sh"), 4).alias(
                "contamination_frac"
            ),
            F.min("gram").alias("example_gram"),
        )
    )


def shingles(text: Column, n: int = 5) -> Column:
    """Distinct word n-gram shingles of a document.

    NOTE: prefer :func:`shingle_df` on the hot path — nesting this
    whole tree in one projection re-evaluates the word split inside
    every higher-order-function lambda call (Catalyst does no CSE for
    interpreted lambdas; measured ~6x slower at sf0.1).
    """
    words = _words(normalize_text(text))
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n))
    )
    return F.array_distinct(
        F.when(F.size(words) >= n, grams).otherwise(F.array())
    )


def shingle_df(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text", n: int = 5
) -> DataFrame:
    """``(id, sh: array<string>)`` of distinct word n-gram shingles.

    Documents with fewer than ``n`` words are dropped (they have no
    shingles; every consumer treats them as contributing nothing).

    Materializes the word array in its own projection first so the
    split/normalize work runs once per row; the shingle lambda then
    only slices the materialized array.  CollapseProject keeps the two
    projections separate because the word expression is non-cheap and
    multiply-referenced.  Do NOT filter on ``size(sh)`` downstream:
    predicate pushdown substitutes the whole shingle expression into a
    scan-level filter (measured: the entire corpus re-shingled inside
    one pre-exchange task) — the word-level filter here is the cheap
    equivalent.
    """
    w = df.select(
        F.col(id_col).alias("id"),
        _words(normalize_text(F.col(text_col))).alias("__w"),
    )
    wc = F.col("__w")
    w = w.filter(F.size(wc) >= n)
    # greatest() guard: the filter above excludes sub-n docs from the
    # RESULT, but an optimizer may still evaluate this projection for
    # such rows (seen with local relations), and sequence(0, negative)
    # is a descending range whose slice(start=0) errors
    idx = F.sequence(F.lit(0), F.greatest(F.size(wc) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(wc, i + 1, n)))
    return w.select("id", F.array_distinct(grams).alias("sh"))


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs by word-``n``-gram Jaccard similarity.

    Candidates come from the shared-shingle inverted index (explode ->
    self-join on shingle), so disjoint documents never form a pair —
    the classic bound that keeps this far under O(n^2) when shingle
    collisions are rare.  Verification is exact regardless of how the
    candidate was found: the pair's full shingle arrays are re-joined
    and ``|A∩B|`` computed with ``array_intersect``.  Pairs are
    emitted once with ``id_a < id_b``.

    ``max_df`` is the scale guard: shingles whose document frequency
    exceeds it are dropped from the candidate INDEX (not from
    verification).  Without it, one boilerplate sentence shared by a
    million documents creates ~10^12 candidate rows out of the
    self-join.  A true near-dup pair is only missed if the docs share
    NO shingle rarer than ``max_df`` — i.e. the documents are pure
    boilerplate, which exact/minhash dedup already catches.  Emitted
    jaccard values are exact either way (hot shingles still count in
    the intersection).
    """
    sh = shingle_df(df, id_col=id_col, text_col=text_col, n=n)
    # referenced three times (index + both verification sides):
    # materialize so the corpus is shingled once, not three times
    sh = sh.localCheckpoint(eager=True)
    exploded = sh.select("id", F.explode("sh").alias("g"))
    if max_df is not None:
        hot = (
            exploded.groupBy("g")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") > max_df)
            .select("g")
        )
        exploded = exploded.join(hot, "g", "left_anti")
    a = exploded.alias("a")
    b = exploded.alias("b")
    cand = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    verified = (
        cand.join(
            sh.select(F.col("id").alias("id_a"), F.col("sh").alias("__sh_a")), "id_a"
        )
        .join(
            sh.select(F.col("id").alias("id_b"), F.col("sh").alias("__sh_b")), "id_b"
        )
        .withColumn("n_shared", F.size(F.array_intersect("__sh_a", "__sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_shared")
                / (F.size("__sh_a") + F.size("__sh_b") - F.col("n_shared")),
                4,
            ),
        )
    )
    return verified.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


def dedup_connected_components(
    pairs: DataFrame,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Cluster near-dup PAIRS into dedup GROUPS: ``(doc_id,
    keeper_id)`` where ``keeper_id`` is the smallest id in the
    document's connected component — the step that turns pairwise
    similarity output into an actionable keep/drop list for a
    training-data pipeline.

    Iterative min-label propagation with POINTER JUMPING: each round
    every node (1) adopts the smallest label among itself and its
    neighbors, then (2) jumps to its label's label (``lbl <-
    lbl(lbl)``).  The jump halves label-chain lengths, so convergence
    is O(log diameter) rounds — a 1M-node path needs ~20 rounds, not
    1M — the same complexity class as large-star/small-star CC-MR at
    web scale; plain propagation alone is O(diameter) and silently
    under-merges long chains.  Each round is two shuffle-on-key joins;
    ``localCheckpoint`` truncates lineage per round so the plan
    doesn't grow with iterations.  The driver-side loop carries only a
    has-anything-changed flag, never data.

    Raises ``RuntimeError`` if the fixpoint is not reached within
    ``max_iterations`` (a silent partial merge would corrupt the
    keep/drop list); with pointer jumping the default 20 covers
    diameters up to ~2^20.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("lbl", F.col("id"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iterations):
        nbr_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        propagated = labels.join(nbr_min, labels.id == nbr_min.src, "left").select(
            labels.id,
            F.least(
                F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))
            ).alias("lbl"),
        )
        # pointer jump: lbl <- lbl(lbl).  The label is always a node id,
        # so the self-join resolves it; a label already at its root maps
        # to itself.
        ptr = propagated.select(
            F.col("id").alias("p_id"), F.col("lbl").alias("p_lbl")
        )
        new_labels = (
            propagated.join(ptr, propagated.lbl == ptr.p_id, "left")
            .select(
                propagated.id,
                F.least(
                    F.col("lbl"), F.coalesce(F.col("p_lbl"), F.col("lbl"))
                ).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected components did not converge within {max_iterations} "
            "rounds; raise max_iterations (pointer jumping needs "
            "~log2(diameter) rounds)"
        )
    return labels.select(
        F.col("id").alias("doc_id"), F.col("lbl").alias("keeper_id")
    )


def train_split(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    val_pct: int = 5,
    test_pct: int = 5,
    n: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Deterministic, leakage-free train/val/test split.

    A naive per-document hash split leaks: a near-duplicate of a
    val/test document lands in train and the eval is contaminated.
    Here every document hashes its dedup GROUP instead — the
    connected component's keeper id (same near-dup pairs and pointer-
    jumping components as the dedup path) — so a whole duplicate
    cluster moves between splits as one unit; singleton docs hash
    their own id.  The bucket hash is the engine-portable md5
    base-16 integer (bit-for-bit reproducible in any engine with md5,
    like every other probabilistic op here), mod 100:
    ``[0, val_pct) -> val``, ``[val_pct, val_pct+test_pct) -> test``,
    rest train.

    Returns ``(id, split_key, bucket, split)`` — carry ``split_key``
    so audits can verify group atomicity.
    """
    pairs = ngram_jaccard_pairs(
        df, id_col=id_col, text_col=text_col, n=n, threshold=threshold
    )
    groups = dedup_connected_components(pairs)
    base = df.select(F.col(id_col).cast("bigint").alias("id"))
    keyed = base.join(groups, base.id == groups.doc_id, "left").select(
        "id", F.coalesce("keeper_id", "id").alias("split_key")
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("split_key").cast("string")), 1, 15), 16, 10
        ).cast("bigint")
        % 100
    )
    return keyed.withColumn("bucket", bucket).withColumn(
        "split",
        F.when(F.col("bucket") < val_pct, "val")
        .when(F.col("bucket") < val_pct + test_pct, "test")
        .otherwise("train"),
    )


def minhash_signatures(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    num_hashes: int = 32,
    seed: int = 42,
    _shingles: DataFrame | None = None,
) -> DataFrame:
    """MinHash signatures over word-shingles.

    Permutation family h_i(x) = (a_i * x + b_i) mod p over a
    60-bit md5-derived integer of each shingle — deterministic from
    ``seed`` AND reproducible in ANSI SQL (both the base hash and the
    affine family are plain integer arithmetic, so the DuckDB oracle
    replays the exact signatures; xxhash64 would be Spark-only).

    Shingle hashing stays JVM-side (md5 + base-16 conv); the
    permutation/min step is an Arrow-batched numpy UDF: the expression
    form (num_hashes ``transform`` lambdas per row) is evaluated
    interpretively by Catalyst and measured ~10x slower at sf0.1.
    Optimization r14 ALSO tried the UDF-free shape — explode the
    shingle array, codegen'd hash, then 32 plain ``min((a*x+b)%p)``
    aggregates per doc with map-side partials.  The signature segment
    alone measured 2x faster (1.35 s → 0.65 s), but the FULL pipeline
    regressed in the bench context: +6 s on the cold pass (planning +
    codegen of the 32-expression aggregate under the banded self-join)
    and +0.3–1.0 s steady (the aggregate inserts an extra exchange +
    stage under the band join, where the UDF projection pipelines over
    the checkpointed shingle frame with no shuffle).  Rejected on
    measurement — see OPTIMIZATION_r14.md.
    Output: (id, sig: array<bigint>).

    ``_shingles``: a precomputed :func:`shingle_df` result — lets
    :func:`minhash_lsh_pairs` share one shingling pass between the
    signature and verification branches instead of re-reading and
    re-shingling the corpus.
    """
    from pyspark.sql.functions import pandas_udf

    A_list, B_list, p = minhash_coeffs(num_hashes, seed)
    A = np.array(A_list, dtype=np.int64)
    B = np.array(B_list, dtype=np.int64)

    @pandas_udf("array<long>")
    def minhash_vote(hx: pd.Series) -> pd.Series:
        out = []
        for arr in hx:
            if arr is None or len(arr) == 0:
                out.append(None)
                continue
            x = np.asarray(arr, dtype=np.int64)
            out.append(((A[:, None] * x[None, :] + B[:, None]) % p).min(axis=1))
        return pd.Series(out)

    sh = (
        _shingles
        if _shingles is not None
        else shingle_df(df, id_col=id_col, text_col=text_col, n=n)
    )
    hashed = sh.withColumn(
        "hx", F.transform("sh", lambda g: shingle_hash60(g) % p)
    )
    return hashed.select("id", minhash_vote("hx").alias("sig"))


def _py_norm_words(t: str) -> list[str]:
    """Python parity of ``_words(normalize_text(text))`` (the shingle
    tokenizer): lowercase, collapse ASCII whitespace runs to one
    space, strip 0x20 only (Spark ``trim``), split on whitespace.
    ``re.ASCII`` makes \\s the same ASCII class as Java regex
    defaults; parity is locked by tests/test_round15_profile.py."""
    return _PROF_WS_RE.split(_PROF_WS_RE.sub(" ", t.lower()).strip(" "))


def shingle_sig_df(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    num_hashes: int = 32,
    seed: int = 42,
) -> DataFrame:
    """``(id, sh: array<string>, sig: array<bigint>)`` — the shingle
    array AND its MinHash signature in ONE ``mapInArrow`` pass
    (optimization r15, guide §4.2).

    :func:`minhash_lsh_pairs` previously ran three passes over the
    corpus-scale stream: the shingle build (interpreted slice +
    concat_ws + array_distinct HOF lambdas, checkpointed), the
    per-shingle md5 hash (another interpreted ``transform``), and the
    Arrow numpy min vote (a second Python boundary).  This kernel does
    tokenize -> ordered-distinct shingles -> md5/60-bit hash -> affine
    min in compiled Python/numpy per batch, crossing the boundary
    once, and emits BOTH columns so one checkpoint serves the banding
    branch and the exact-Jaccard verification branch.

    Value parity (same results as shingle_df + minhash_signatures,
    locked by tests/test_round15_profile.py):
    - tokenizer: :func:`_py_norm_words` (ASCII classes = Java regex);
    - shingles keep first-occurrence order (``array_distinct``);
    - docs with < n words are dropped (no shingles), NULL text too;
    - hash: ``int(md5(utf8).hexdigest()[:15], 16) % p`` == Spark
      ``conv(substring(md5(g), 1, 15), 16, 10) % p`` (md5 of the
      UTF-8 bytes in both engines);
    - signature: the same int64 numpy ``((A*x + B) % p).min`` as
      :func:`minhash_signatures` (products < 2^62, no overflow).
    """
    A_list, B_list, p = minhash_coeffs(num_hashes, seed)
    A = np.array(A_list, dtype=np.int64)[:, None]
    B = np.array(B_list, dtype=np.int64)[:, None]

    def batches(it):
        import hashlib

        import pyarrow as pa

        for batch in it:
            ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            out_id: list[int] = []
            out_sh: list[list[str]] = []
            out_sig: list[list[int]] = []
            for i, t in zip(ids, texts):
                if t is None:
                    continue
                words = _py_norm_words(t)
                if len(words) < n:
                    continue
                grams = list(
                    dict.fromkeys(
                        " ".join(words[j : j + n])
                        for j in range(len(words) - n + 1)
                    )
                )
                hx = np.fromiter(
                    (
                        int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % p
                        for g in grams
                    ),
                    dtype=np.int64,
                    count=len(grams),
                )
                out_id.append(i)
                out_sh.append(grams)
                out_sig.append(((A * hx[None, :] + B) % p).min(axis=1).tolist())
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_id, type=pa.int64()),
                    pa.array(out_sh, type=pa.list_(pa.string())),
                    pa.array(out_sig, type=pa.list_(pa.int64())),
                ],
                names=["id", "sh", "sig"],
            )

    return df.select(
        F.col(id_col).cast("long").alias("id"), F.col(text_col).alias("text")
    ).mapInArrow(batches, "id long, sh array<string>, sig array<bigint>")


def minhash_coeffs(num_hashes: int, seed: int) -> tuple[list[int], list[int], int]:
    """The (A, B, p) affine-permutation constants for
    :func:`minhash_signatures` — exposed so the SQL oracle can embed
    the identical literals.  p = 2^31-1 keeps ``a * x`` within int64
    (both < 2^31 => product < 2^62) in numpy and SQL alike."""
    import random

    rnd = random.Random(seed)
    p = (1 << 31) - 1
    A = [rnd.randrange(1, p) for _ in range(num_hashes)]
    B = [rnd.randrange(0, p) for _ in range(num_hashes)]
    return A, B, p


def shingle_hash60(g: Column) -> Column:
    """60-bit integer hash of a shingle: the first 15 hex chars of
    md5, parsed base-16.  Chosen over xxhash64 because every engine
    with md5 + base conversion reproduces it bit-for-bit (DuckDB:
    ``CAST('0x' || substr(md5(g), 1, 15) AS BIGINT)``), which is what
    lets the MinHash pipeline be hash-checked end-to-end; 60 bits
    stays positive in a signed int64."""
    return F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("bigint")


def minhash_lsh_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    seed: int = 42,
    broadcast_verify_max: int = 100_000,
) -> DataFrame:
    """MinHash + LSH near-dup pairs (the scale path for dedup).

    Signatures are banded (``bands`` bands of ``num_hashes/bands``
    rows); documents sharing any band bucket become candidates
    (shuffle on the band hash — tiny vs. all-pairs); candidates are
    verified with exact n-gram Jaccard.  At 100 TB this is the only
    workable shape: the inverted-index join of
    :func:`ngram_jaccard_pairs` bounds on shingle frequency, while LSH
    bounds on collision probability tuned by (bands, rows).
    """
    rows_per_band = num_hashes // bands
    # ONE fused Arrow pass (optimization r15) computes shingles AND
    # signatures; the checkpoint feeds both the banding branch and the
    # Jaccard verification branch.  Previously: a checkpointed shingle
    # pass (interpreted slice/concat/array_distinct lambdas), an
    # interpreted per-shingle md5 transform, and a separate Arrow min
    # vote — three corpus passes and two Python boundaries (measured
    # 0.88 + 0.65 s of the 2.3 s pipeline at sf0.1; the fused kernel
    # runs the same counts in one boundary).  Values are identical —
    # see :func:`shingle_sig_df`.
    ss = shingle_sig_df(
        df,
        id_col=id_col,
        text_col=text_col,
        n=n,
        num_hashes=num_hashes,
        seed=seed,
    ).localCheckpoint(eager=True)
    sh = ss.select("id", "sh")
    sigs = ss.select("id", "sig")
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        # the band key is the signature slice itself
                        # (joined as a string) rather than an
                        # engine-specific hash of it — SQL-replicable,
                        # and at <= ~8 values per band the key stays
                        # small enough that hashing it buys nothing
                        F.concat_ws(
                            "_",
                            F.transform(
                                F.slice("sig", i * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                        ).alias("bucket"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # Verify ONLY the LSH candidates: semi-join the shingle table down
    # to candidate docs first, then the pair join touches the tiny
    # slice twice instead of shuffling the full shingle table.  The
    # candidate set feeds two consumers (the id semi-join and the pair
    # rows) — materialize it once or the whole banding pipeline runs
    # twice.  Under sane banding the candidate slice is broadcast-
    # sized, but banding degrades on adversarial corpora (near-
    # identical boilerplate everywhere -> candidate set ~ corpus), so
    # the broadcast is GUARDED: the candidate-doc count (one cheap job
    # over the already-materialized pairs) must stay under
    # ``broadcast_verify_max``, else every verify join falls back to a
    # shuffle — same rows, no driver/executor OOM.
    cand = cand.localCheckpoint(eager=True)
    cand_ids = cand.select(
        F.explode(F.array("id_a", "id_b")).alias("id")
    ).distinct()
    n_cand_docs = cand_ids.count()
    hint = F.broadcast if n_cand_docs <= broadcast_verify_max else (lambda d: d)
    sh_cand = sh.join(hint(cand_ids), "id", "left_semi")
    n_shared = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    return (
        cand.join(hint(sh_cand.alias("a")), F.col("id_a") == F.col("a.id"))
        .join(hint(sh_cand.alias("b")), F.col("id_b") == F.col("b.id"))
        .withColumn("n_shared", n_shared)
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_shared")
                / (F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - F.col("n_shared")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def winnow_fingerprints(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """``(doc_id, fp)`` winnowing fingerprint SET per document
    (Schleimer et al. 2003) in ONE ``mapInArrow`` pass (optimization
    r15, guide §4.2): char ``k``-grams hashed (md5 first 8 hex), a
    sliding window of ``w`` keeps each full window's minimum, the
    per-doc set is deduped in the kernel.

    Replaces the exploded expression shape — 1.45M interpreted
    md5-per-position rows at sf0.1 through a partitionBy(doc_id)
    Window (hash exchange + sort) and a global ``distinct`` (second
    exchange) — with a single narrow pass: text goes in (~1.5 MB at
    sf0.1), the w-fold-smaller deduped fingerprint set comes out.  An
    r14 attempt that moved only the sliding min to Python lost on
    gram-array transfer; fusing the HASHING too is what makes the
    boundary pay (the kernel ships text once, not the gram stream).

    Value parity with the expression shape (locked by
    tests/test_round15_profile.py): ``substring`` counts code points
    (Python slicing too); a doc shorter than ``k`` hashes its whole
    text as the single gram; only FULL windows emit (docs with fewer
    than ``w`` grams produce nothing); NULL text produces nothing;
    hash = ``int(md5(utf8(gram)).hexdigest()[:8], 16)``.
    """

    def batches(it):
        import hashlib

        import pyarrow as pa

        for batch in it:
            ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            out_id: list[int] = []
            out_fp: list[int] = []
            for i, t in zip(ids, texts):
                if t is None:
                    continue
                n_grams = max(len(t) - (k - 1), 1)
                if n_grams < w:
                    continue
                h = np.fromiter(
                    (
                        int(
                            hashlib.md5(t[j : j + k].encode()).hexdigest()[:8],
                            16,
                        )
                        for j in range(n_grams)
                    ),
                    dtype=np.int64,
                    count=n_grams,
                )
                wmin = np.lib.stride_tricks.sliding_window_view(h, w).min(
                    axis=1
                )
                fps = np.unique(wmin)
                out_id.extend([i] * len(fps))
                out_fp.extend(fps.tolist())
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_id, type=pa.int64()),
                    pa.array(out_fp, type=pa.int64()),
                ],
                names=["doc_id", "fp"],
            )

    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    ).mapInArrow(batches, "doc_id long, fp long")


def quota_sample(
    df: DataFrame,
    *,
    group_col: str,
    quota: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group document quota: keep at most ``quota`` docs per group
    (domain/source/language), chosen deterministically by ascending
    ``id_col`` — the standard cap that stops one mega-domain from
    dominating a training mix (cf. Common-Crawl per-domain caps).

    Scale shape: a KEYED window (partition by group), which Spark
    executes as ``WindowGroupLimit`` — each task keeps only its local
    top-``quota`` per group before the shuffle, so a billion-doc
    domain moves ``quota`` rows, not a billion.  Never a global sort.
    Emits ``seq`` (1-based rank within the group) alongside the kept
    rows.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("seq", F.row_number().over(w).cast("bigint"))
        .filter(F.col("seq") <= quota)
    )


def pack_sequences(
    df: DataFrame,
    *,
    budget: int,
    group_col: str,
    token_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy contiguous token packing: assign each document to a
    fixed-token-budget bin — the batch-construction step that turns a
    cleaned corpus into training sequences.  ``bin = floor(exclusive
    running token sum / budget)`` in deterministic ``id_col`` order:
    the streaming approximation of first-fit packing (a doc straddling
    a boundary belongs to the bin where it starts; a doc longer than
    the budget spans bins on its own).

    Scale shape: one KEYED window per group (shard) — packing is
    per-shard by design (each trainer worker packs its own shard), so
    there is no global sort; the running sum is a single streaming
    pass over each group's sorted run.
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    excl = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn(
        "seq", F.floor(excl / F.lit(budget)).cast("bigint")
    )


def levenshtein_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_distance: int = 8,
    prefix_len: int = 12,
    max_block_size: int | None = 100,
) -> DataFrame:
    """Near-dup pairs by edit distance, blocked on the normalized-text
    prefix.

    Blocking bounds the candidate space (same-prefix docs only) — the
    equi-join shuffles on the prefix key, never O(n^2).  Verification
    is Spark's built-in ``levenshtein`` (JVM-side).  Prefix blocking
    misses pairs that diverge inside the first ``prefix_len`` chars;
    that recall trade is the standard one (cf. MinHash banding) and is
    documented at the query layer.

    ``max_block_size`` is the scale guard (the same hole ``max_df``
    closes for shingle candidates): one boilerplate prefix shared by
    100k documents would make its block O(b^2) — 10^10 pairs, each
    paying an O(len^2) edit-distance verify.  Blocks larger than the
    cap are dropped from candidacy entirely (an aggregate on the block
    key — same shuffle the join needs).  A pair lost this way shares a
    >= ``prefix_len``-char prefix with >cap other docs, i.e. it is
    mass boilerplate that exact/MinHash dedup already catches.  The
    natural block sizes on the documents fixture are <= 13; the
    default cap of 100 never binds outside adversarial corpora.
    """
    norm = normalize_text(F.col(text_col))
    keyed = df.select(
        F.col(id_col).alias("id"),
        norm.alias("t"),
        F.substring(norm, 1, prefix_len).alias("blk"),
    )
    if max_block_size is not None:
        hot = (
            keyed.groupBy("blk")
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") > max_block_size)
            .select("blk")
        )
        keyed = keyed.join(hot, "blk", "left_anti")
    keyed = keyed.withColumn("__len", F.length("t"))
    a, b = keyed.alias("a"), keyed.alias("b")
    # |len(a) - len(b)| is a lower bound on edit distance: push the
    # length prefilter into the join so out-of-range pairs never reach
    # the DP; the 3-arg levenshtein bands the DP to O(len * k) and
    # early-exits at -1 (emitted set unchanged — both cuts only remove
    # pairs the distance filter would drop).  Measured 39 -> [see
    # BENCH_NOTES round 7] on 512k candidates at sf1.
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.id") < F.col("b.id"))
            & (
                F.abs(F.col("a.__len") - F.col("b.__len"))
                <= F.lit(max_distance)
            ),
        )
        .withColumn(
            "distance",
            F.levenshtein(F.col("a.t"), F.col("b.t"), max_distance),
        )
        .filter(
            (F.col("distance") >= 0) & (F.col("distance") <= max_distance)
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            "distance",
        )
    )


def _simhash_vote_udf():
    """Vectorized simhash vote: shingle hashes (two int64 arrays
    carrying the md5 hi/lo 32-bit halves) -> 64-bit signature.

    The shingle hashing stays JVM-side (md5 + base-16 conv, split into
    two 32-bit halves so every intermediate fits a signed int64 — the
    same split the SQL oracle replays); only the per-bit voting runs
    in numpy.  A pure column-expression version (64 ``aggregate``
    calls) was ~0.14 s/doc because Catalyst evaluates
    higher-order-function lambdas interpretively per element — the
    Arrow-batched numpy vote is orders faster and is the documented
    exception where a pandas UDF beats built-ins.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def simhash_vote(hi: pd.Series, lo: pd.Series) -> pd.Series:
        shifts = np.arange(64, dtype=np.uint64)
        out = np.zeros(len(hi), dtype=np.int64)
        for i, (ah, al) in enumerate(zip(hi, lo)):
            if ah is None or len(ah) == 0:
                continue
            h = (np.asarray(ah, dtype=np.uint64) << np.uint64(32)) | np.asarray(
                al, dtype=np.uint64
            )
            ones = ((h[:, None] >> shifts) & np.uint64(1)).sum(axis=0)
            votes = 2 * ones.astype(np.int64) - len(h)
            sig = np.bitwise_or.reduce(
                np.where(votes > 0, np.uint64(1) << shifts, np.uint64(0))
            )
            out[i] = sig.astype(np.int64)  # wrap bit 63 into the sign
        return pd.Series(out)

    return simhash_vote


def _md5_half(g: Column, start: int) -> Column:
    """One 32-bit half of md5(g): hex chars [start, start+8) parsed
    base-16 — integer-exact in any engine with md5 + base conversion
    (DuckDB: ``CAST('0x' || substr(md5(g), start, 8) AS BIGINT)``),
    which is what lets the SimHash fingerprint be replayed by the SQL
    oracle."""
    return F.conv(F.substring(F.md5(g), start, 8), 16, 10).cast("bigint")


def simhash64(text: Column, n: int = 3) -> Column:
    """64-bit SimHash over word ``n``-grams: JVM-side md5-derived
    shingle hashing, Arrow-batched numpy bit voting.  (Column form —
    prefer :func:`simhash_df` on the hot path, see
    :func:`shingle_df`.)"""
    sh = shingles(text, n)
    hi = F.transform(sh, lambda g: _md5_half(g, 1))
    lo = F.transform(sh, lambda g: _md5_half(g, 9))
    return _simhash_vote_udf()(hi, lo)


def simhash_df(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """``(id, h: bigint)`` SimHash in ONE fused ``mapInArrow`` pass
    (optimization r15, the :func:`shingle_sig_df` treatment applied to
    the SimHash leg).

    History of this shape: the r7/r14 form ran the shingle build as
    interpreted HOF lambdas, one interpreted md5 ``transform``, and an
    Arrow numpy bit-vote UDF (two expression passes + one Python
    boundary; a 64-sum codegen aggregate vote was measured ~8x slower
    — JIT method budget — and rejected in r14).  The fused kernel does
    tokenize -> ordered-distinct n-grams -> md5 -> 32-bit halves ->
    bit vote in compiled Python/numpy per batch, crossing the boundary
    once.  Bit-identical by construction: same tokenizer parity as
    :func:`_py_norm_words`, ``int(md5(utf8).hexdigest()[a:b], 16)`` ==
    ``conv(substring(md5(g), a+1, 8), 16, 10)``, and the identical
    numpy vote arithmetic (``2*ones - n`` votes, or-reduce of disjoint
    bit literals, bit 63 wrapping into the int64 sign); docs with < n
    words and NULL text drop exactly as shingle_df dropped them.
    Locked by tests/test_round15_profile.py."""

    def batches(it):
        import hashlib

        import pyarrow as pa

        shifts = np.arange(64, dtype=np.uint64)
        for batch in it:
            ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            out_id: list[int] = []
            out_h: list[int] = []
            for i, t in zip(ids, texts):
                if t is None:
                    continue
                words = _py_norm_words(t)
                if len(words) < n:
                    continue
                grams = dict.fromkeys(
                    " ".join(words[j : j + n])
                    for j in range(len(words) - n + 1)
                )
                hx = np.fromiter(
                    (
                        int(hashlib.md5(g.encode()).hexdigest()[:16], 16)
                        for g in grams
                    ),
                    dtype=np.uint64,
                    count=len(grams),
                )
                ones = ((hx[:, None] >> shifts) & np.uint64(1)).sum(axis=0)
                votes = 2 * ones.astype(np.int64) - len(hx)
                sig = np.bitwise_or.reduce(
                    np.where(votes > 0, np.uint64(1) << shifts, np.uint64(0))
                )
                out_id.append(i)
                out_h.append(int(sig.astype(np.int64)))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_id, type=pa.int64()),
                    pa.array(out_h, type=pa.int64()),
                ],
                names=["id", "h"],
            )

    return df.select(
        F.col(id_col).cast("long").alias("id"), F.col(text_col).alias("text")
    ).mapInArrow(batches, "id long, h long")


def simhash_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs within a Hamming radius.

    Candidates by the pigeonhole trick: split the 64-bit hash into
    ``max_hamming + 1`` bands — any pair within the radius shares at
    least one exact band.  Join per band, then verify the true Hamming
    distance with bit_count(xor).
    """
    # Pin the signatures: the banded frame feeds BOTH sides of the
    # candidate self-join, and without the pin Catalyst re-plans the
    # whole shingle+md5+vote subtree per side — measured 126 s -> 3.2 s
    # (39x) on 50k docs at sf1 (BENCH_NOTES round 7).  The standard
    # self-derivation trap, same cure as minhash_lsh_pairs.
    sh = simhash_df(df, id_col=id_col, text_col=text_col, n=n).localCheckpoint(
        eager=True
    )
    return hamming_pairs(sh, id_col="id", hash_col="h", max_hamming=max_hamming)


def hamming_pairs(
    df: DataFrame,
    *,
    id_col: str = "id",
    hash_col: str = "h",
    max_hamming: int = 3,
) -> DataFrame:
    """All (id_a < id_b) pairs whose 64-bit ``hash_col`` values are
    within ``max_hamming`` — the shared banded-candidate engine behind
    :func:`simhash_pairs` (text) and perceptual-hash image dedup
    (multimodal dHash).

    Pigeonhole banding: split the hash into ``max_hamming + 1``
    bands; any pair within the radius agrees exactly on at least one
    band, so the equi-join on (band, piece) has recall 1.0 by
    construction and the bit_count(xor) verify touches candidates
    only.  Callers pass a MATERIALIZED frame (pin expensive upstreams
    first — see simhash_pairs).
    """
    bands = max_hamming + 1
    width = 64 // bands
    sh = df.select(F.col(id_col).alias("id"), F.col(hash_col).alias("h"))
    banded = sh.select(
        "id",
        "h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("h", i * width)
                        .bitwiseAND(F.lit((1 << width) - 1).cast("bigint"))
                        .alias("piece"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "h", "bb.band", "bb.piece")
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.piece") == F.col("b.piece"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.h").alias("h_a"),
            F.col("b.h").alias("h_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ------------------------------------------------------- LM scoring

def lm_words(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(id, __w)`` normalized word arrays of scorable (>= 2 word)
    documents — the shared tokenize pass of the LM family.  Callers
    that run BOTH :func:`lm_bigram_model` and :func:`lm_score` over
    the same corpus should materialize this once
    (``localCheckpoint``) and pass it to both via ``_words``;
    otherwise each aggregate subtree re-tokenizes the corpus
    (optimization r14 — the quality pipeline paid the
    normalize+split pass three times)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("__w"),
    ).filter(F.size("__w") >= 2)


def lm_bigram_model(
    df: DataFrame,
    *,
    text_col: str = "text",
    _words: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Train a corpus-level bigram count model: ``(model, vocab)``.

    ``model`` is one row per distinct bigram ``(gram, c2, c1)`` —
    its occurrence count and the occurrence count of its FIRST word
    (the conditional's denominator, pre-joined here at vocab scale so
    scoring needs one equi-join, not two).  ``vocab`` is a one-row
    frame ``(v,)`` with the distinct-unigram count, the additive-
    smoothing denominator term.

    Scale shape: two hash-aggregate shuffles over the exploded token
    stream (the same stream every shingle operator pumps), then a join
    between two VOCAB-sized tables — at 100 TB the model is millions
    of rows while the corpus is billions, so the c1 join never touches
    corpus-scale data and AQE broadcasts the unigram side where it
    fits.  No driver-side collect: ``vocab`` stays a DataFrame and is
    broadcast into the scoring plan as a 1-row join.
    """
    words = (
        _words
        if _words is not None
        else df.select(
            F.split(normalize_text(F.col(text_col)), " ").alias("__w")
        ).filter(F.size("__w") >= 2)
    )
    # Pinned LAZILY: ``uni`` feeds BOTH the model's c1 join and the
    # vocab count below — without the pin the vocab aggregate re-ran
    # the whole tokenize+explode+agg corpus pass a second time
    # (optimization r14).  Lazy, not eager: the first consumer
    # materializes it in its own job (usually the vocab broadcast
    # build), so no extra serialized job is added — measured
    # local-neutral at sf0.1 (duplicate stages ran in parallel on
    # idle cores there) while halving the tokenize passes a busy
    # cluster actually pays for.
    uni = (
        words.select(F.explode("__w").alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
        .localCheckpoint(eager=False)
    )
    bg = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("__w") - 1),
                lambda i: F.struct(
                    F.element_at("__w", i).alias("w1"),
                    F.concat_ws(
                        " ", F.element_at("__w", i), F.element_at("__w", i + 1)
                    ).alias("gram"),
                ),
            )
        ).alias("b")
    ).select("b.w1", "b.gram")
    model = (
        bg.groupBy("w1", "gram")
        .agg(F.count("*").alias("c2"))
        .join(uni, "w1")
        .select("gram", "c2", "c1")
    )
    vocab = uni.agg(F.count("*").alias("v"))
    return model, vocab


def lm_score(
    df: DataFrame,
    model: DataFrame,
    vocab: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    _words: DataFrame | None = None,
) -> DataFrame:
    """Perplexity-proxy quality scoring (the CCNet-style LM filter an
    LLM data pipeline runs to rank documents): score every document by
    the mean log-probability of its word bigrams under an additively
    smoothed bigram model — ``ln((c2 + alpha) / (c1 + alpha*V))`` —
    plus the worst (minimum) bigram log-prob and the out-of-vocabulary
    bigram count (non-zero when scoring against a model trained on a
    DIFFERENT corpus).

    Returns ``(id, n_bigrams, n_oov, avg_logp, min_logp, ppl)``;
    pipelines drop the high-perplexity (low ``avg_logp``) tail.

    Determinism contract (what makes this hash-comparable across
    engines): the per-document sum folds the log terms in POSITION
    order via a sorted-array aggregate, never a distributed float sum
    whose combine order is partition-dependent; ``min`` is a
    selection, not arithmetic.  All counts are exact integers; floats
    appear only in the final ln/avg, rounded to 4 dp.

    Scale shape: one explode of the document token stream, ONE
    equi-join against the vocab-sized model (left join: OOV grams
    score with c2=0), one groupBy(id) collecting ``(pos, logp)``
    structs.  The collect_list payload is ~16 bytes/token — the same
    order as the shingle arrays the dedup family shuffles.
    """
    words = (
        _words
        if _words is not None
        else df.select(
            F.col(id_col).alias("id"),
            F.split(normalize_text(F.col(text_col)), " ").alias("__w"),
        ).filter(F.size("__w") >= 2)
    )
    ex = words.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("__w") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("__w", i), F.element_at("__w", i + 1)
                ),
            )
        ).alias("pos", "gram"),
    )
    scored = (
        ex.join(model, "gram", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "id",
            "pos",
            F.coalesce("c2", F.lit(0)).alias("c2"),
            F.log(
                (F.coalesce("c2", F.lit(0)) + F.lit(alpha))
                / (F.coalesce("c1", F.lit(0)) + F.lit(alpha) * F.col("v"))
            ).alias("logp"),
        )
    )
    per_doc = scored.groupBy("id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum(F.when(F.col("c2") == 0, 1).otherwise(0)).alias("n_oov"),
        F.array_sort(
            F.collect_list(F.struct("pos", "logp"))
        ).alias("__terms"),
    )
    total = F.aggregate(
        F.col("__terms"), F.lit(0.0), lambda acc, t: acc + t["logp"]
    )
    avg = F.round(total / F.col("n_bigrams"), 4)
    return per_doc.select(
        "id",
        "n_bigrams",
        F.col("n_oov").cast("bigint").alias("n_oov"),
        avg.alias("avg_logp"),
        F.round(
            F.array_min(F.transform("__terms", lambda t: t["logp"])), 4
        ).alias("min_logp"),
        F.round(F.exp(-avg), 4).alias("ppl"),
    )


def kneser_ney_score(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995;
    Chen & Goodman 1999 — public), the standard upgrade over the
    additive-smoothed LM filter: ``P(w|v) = (c(v,w) - D)/c(v·) +
    (D·N1+(v,·)/c(v·)) · N1+(·,w)/N1+(·,·)`` — the backoff mass goes
    to words by how many CONTEXTS they follow (continuation counts),
    not raw frequency, which is what makes KN the right filter for
    boilerplate-heavy web text (a frequent-but-one-context token
    stops looking probable everywhere).

    Returns ``(id, n_bigrams, avg_logp, min_logp)`` per document,
    scored against the corpus itself (the CCNet self-scoring setup).

    Determinism contract: every model quantity is an exact integer
    count (bigram counts, per-context totals, distinct-continuation
    counts, distinct-type total); ``D`` is 0.75 (exact binary); the
    probability AST is fixed as ``(c2 - D)/c1b + (D·n1v/c1b)·(nw/nt)``
    so both engines fold identical doubles; the per-doc sum folds in
    POSITION order (sorted-array aggregate) and rounds to 4 dp at the
    end — the lm_score discipline.

    Scale shape: one explode of the token stream, three vocab-sized
    hash aggregates (context totals, left/right continuation counts),
    one 1-row type total broadcast, ONE equi-join of the gram stream
    against the assembled model.  Never corpus x corpus.
    """
    words = df.select(
        F.col(id_col).alias("id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("__w"),
    ).filter(F.size("__w") >= 2)
    bg = words.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("__w") - 1),
                lambda i: F.struct(
                    F.element_at("__w", i).alias("w1"),
                    F.element_at("__w", i + 1).alias("w2"),
                ),
            )
        ).alias("pos", "b"),
    ).select("id", "pos", "b.w1", "b.w2")
    # pinned once: the exploded stream feeds the model aggregates AND
    # the scoring join (4 consumers otherwise re-explode the corpus)
    bg = bg.localCheckpoint(eager=True)
    # lazily pinned (optimization r14): ``grams`` feeds four consumers
    # (n1v, nw, nt, the model join) — unpinned, each re-aggregated the
    # pinned-but-600k-row bigram stream; the pinned frame is
    # vocab²-bounded
    grams = (
        bg.groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
        .localCheckpoint(eager=False)
    )
    c1b = bg.groupBy("w1").agg(F.count("*").alias("c1b"))
    n1v = grams.groupBy("w1").agg(F.count("*").alias("n1v"))
    nw = grams.groupBy("w2").agg(F.count("*").alias("nw"))
    nt = grams.agg(F.count("*").alias("nt"))
    model = (
        grams.join(c1b, "w1")
        .join(n1v, "w1")
        .join(nw, "w2")
        .crossJoin(F.broadcast(nt))
    )
    d = F.lit(discount)
    p = (F.col("c2") - d) / F.col("c1b") + (
        d * F.col("n1v") / F.col("c1b")
    ) * (F.col("nw") / F.col("nt"))
    scored = bg.join(model, ["w1", "w2"]).select(
        "id", "pos", F.log(p).alias("logp")
    )
    per_doc = scored.groupBy("id").agg(
        F.count("*").alias("n_bigrams"),
        F.array_sort(F.collect_list(F.struct("pos", "logp"))).alias(
            "__terms"
        ),
        F.min("logp").alias("__mn"),
    )
    total = F.aggregate(
        F.col("__terms"), F.lit(0.0), lambda acc, t: acc + t["logp"]
    )
    return per_doc.select(
        "id",
        "n_bigrams",
        F.round(total / F.col("n_bigrams"), 4).alias("avg_logp"),
        F.round(F.col("__mn"), 4).alias("min_logp"),
    )


def domain_mix(
    df: DataFrame,
    budgets: dict[str, int],
    *,
    id_col: str = "doc_id",
    domain_col: str = "source",
    token_col: str = "ws_tokens",
    default_budget: int = 0,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Training-mixture construction: greedily fill each domain's
    token budget in a deterministic pseudo-random document order
    (md5 of the id — a seedless shuffle both engines replay), so the
    selected set approximates the target domain weighting without a
    global sort or any RNG state.

    A document is taken while the tokens consumed BEFORE it
    (exclusive running sum within its domain) are still under the
    domain's budget — the standard greedy fill, so the last taken
    document may straddle the boundary.  Returns every input row with
    ``(cum_before, take)`` for auditability; filter ``take`` for the
    mixture.

    Scale shape: one hash-partition shuffle on the domain plus a
    running-sum window per domain — identical to
    :func:`pack_sequences`.  A single domain's rows must sort within
    one task's window (running sums cannot salt); Spark's window sort
    spills, and real corpora shard hot domains upstream (e.g.
    ``web/part-N`` sub-domains), which this composes with.
    """
    entries = [
        F.lit(x) for kv in sorted(budgets.items()) for x in kv
    ]
    budget = F.coalesce(
        F.element_at(F.create_map(*entries), F.col(domain_col)),
        F.lit(default_budget),
    )
    w = (
        Window.partitionBy(domain_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.select(
        F.col(id_col).alias("id"),
        F.col(domain_col).alias("domain"),
        F.col(token_col).cast("bigint").alias(token_col),
        # passthrough (e.g. upstream scores) rides the same window
        # stage — composing pipelines must NOT join back on id, which
        # would recompute this frame's whole upstream subtree
        *keep_cols,
        cum.cast("bigint").alias("cum_before"),
        (cum < budget).alias("take"),
    )


def corpus_datacard(
    df: DataFrame,
    *,
    group_col: str = "lang",
    token_col: str = "ws_tokens",
    source_col: str = "source",
) -> DataFrame:
    """Per-group corpus data card + grand total (ROLLUP row with a
    null group): the summary table a dataset release ships — document
    and source counts, token volume, and the exact token-length
    distribution (p50/p90/p99 via interpolated ``percentile``, the
    same quantile_cont semantics DuckDB uses, verified engine-equal).

    Scale note: exact percentiles sort each group's values inside one
    aggregate buffer — right for data-card cardinalities (groups =
    languages/sources).  For percentiles over BILLIONS of rows per
    group switch to ``percentile_approx`` (t-digest, mergeable,
    bounded memory); the sketch-vs-exact trade is the same one
    ``agg_sketch_sample_profile`` measures for HLL/GK.
    """
    t = F.col(token_col)
    return (
        df.rollup(group_col)
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.countDistinct(source_col).cast("bigint").alias("n_sources"),
            F.sum(t).cast("bigint").alias("total_tokens"),
            F.min(t).cast("bigint").alias("min_tokens"),
            F.max(t).cast("bigint").alias("max_tokens"),
            F.round(F.avg(t), 4).alias("avg_tokens"),
            F.round(F.expr(f"percentile({token_col}, 0.5)"), 4).alias("p50"),
            F.round(F.expr(f"percentile({token_col}, 0.9)"), 4).alias("p90"),
            F.round(F.expr(f"percentile({token_col}, 0.99)"), 4).alias("p99"),
        )
    )


def duplicate_spans(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 16,
    min_df: int = 2,
) -> DataFrame:
    """Exact-substring duplicate spans (the Lee et al. 2022
    "Deduplicating Training Data" ExactSubstr shape, word-granular):
    every maximal word range of a document covered by ``n``-grams
    that also occur in >= ``min_df`` OTHER documents' worth of text.
    Pipelines cut these spans out of the training text instead of
    dropping whole near-duplicate documents.

    Returns one row per merged span: ``(id, span_start, span_end,
    n_positions)`` — word indices (0-based, end-exclusive) and how
    many duplicated ``n``-gram start positions the span merged.

    Scale shape: positioned shingles -> gram doc-frequency (one
    hash-groupBy; at deployment hash grams to 64-bit first so the
    shuffle moves 8-byte keys) -> equi-join positions back to the
    duplicated grams -> per-doc gaps-and-islands merge with two
    window passes (running max of interval end, running sum of
    island breaks).  Everything is integer arithmetic over the same
    exploded-shingle stream the dedup family pumps; no all-pairs
    term anywhere (the suffix-array alternative the paper uses is a
    single-machine construction; doc-frequency n-gram marking is the
    standard distributed equivalent).
    """
    words = df.select(
        F.col(id_col).alias("id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("__w"),
    ).filter(F.size("__w") >= n)
    pos_grams = words.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("__w") - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice("__w", i, n)),
            )
        ).alias("pos", "gram"),
    )
    dup_grams = (
        pos_grams.groupBy("gram")
        .agg(F.countDistinct("id").alias("__df"))
        .filter(F.col("__df") >= min_df)
        .select("gram")
    )
    hits = pos_grams.join(dup_grams, "gram").select("id", "pos")
    w_prev = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = hits.withColumn(
        "__new_island",
        F.when(
            F.col("pos")
            > F.coalesce(F.max(F.col("pos") + n).over(w_prev), F.lit(-1)),
            1,
        ).otherwise(0),
    ).withColumn("__island", F.sum("__new_island").over(w_run))
    return (
        flagged.groupBy("id", "__island")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            (F.max("pos") + n).cast("bigint").alias("span_end"),
            F.count("*").cast("bigint").alias("n_positions"),
        )
        .drop("__island")
    )


def strip_spans(
    df: DataFrame,
    spans: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply :func:`duplicate_spans` (or any ``(id, span_start,
    span_end)`` frame, word indices end-exclusive): cut the covered
    words out of each document and re-join the survivors — the
    transformation step of span-cutting dedup.

    Returns ``(id, n_words, n_removed, clean_text)``; documents with
    no spans pass through verbatim (normalized whitespace).

    Scale shape: words explode with their position, spans attach via
    an equi-join ON THE ID (span ranges are a post-join filter — never
    a range-only join), uncovered words re-assemble with one sorted
    collect per doc.  Span counts per doc are small (merged maximal
    intervals), so the join fan-out is |words| x |spans per doc| ~
    |words|.
    """
    words = df.select(
        F.col(id_col).alias("id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("__w"),
    )
    ex = words.select(
        "id", F.posexplode("__w").alias("i", "word")
    )
    sp = spans.select(
        F.col("id").alias("__sid"), "span_start", "span_end"
    )
    covered = (
        ex.join(
            sp,
            (F.col("id") == F.col("__sid"))
            & (F.col("i") >= F.col("span_start"))
            & (F.col("i") < F.col("span_end")),
            "left",
        )
        .groupBy("id", "i", "word")
        .agg(F.max(F.col("__sid").isNotNull()).alias("__cut"))
    )
    return (
        covered.groupBy("id")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum(F.col("__cut").cast("int")).cast("bigint").alias("n_removed"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(~F.col("__cut"), F.struct("i", "word"))
                        )
                    ),
                    lambda s: s["word"],
                ),
            ).alias("clean_text"),
        )
    )


def hash_tf_embed(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
) -> DataFrame:
    """Deterministic feature-hashing document embedding (the hashing
    trick): every word maps to ``md5-60bit % dim`` and the embedding
    is the term-frequency histogram over those buckets — a model-free
    featurizer that turns the documents table into an
    ``array<float>`` column ANY of the ANN operators consume
    directly, entirely in-engine (no external model service).
    Cosine over hash-TF vectors approximates word-histogram
    similarity; near-dup documents land near each other by
    construction.

    Returns ``(id, embedding: array<float>)``.  Counts are exact
    integers (float32-exact far beyond any document length), and the
    md5 bucket hash is the same engine-portable integer recipe the
    MinHash family uses — the whole featurizer replays in SQL.

    Scale shape: hash the vocabulary (distinct words), join the
    bucket back onto the token stream, then ONE fixed-width
    conditional-sum pivot per document — linear in tokens, map-side
    partials, entirely codegen'd.
    """
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("w"),
    )
    # hash the VOCABULARY, not the token stream: md5+base-conv per
    # distinct word (vocab ~ millions) instead of per token (~ 10^11
    # at 100 TB), then an equi-join carries the bucket back to the
    # stream — AQE broadcasts the vocab side when it fits.  Result is
    # identical (bucket depends only on the word), so the SQL oracle
    # may hash either side.
    vocab = (
        words.select("w")
        .distinct()
        .withColumn("b", shingle_hash60(F.col("w")) % dim)
    )
    # ONE shuffle: the dense vector is a fixed-width conditional-sum
    # pivot — dim counters per group, whole-stage-codegen'd with
    # map-side partial aggregation.  (A collect_list -> map ->
    # element_at assembly was measured ~10x slower: interpreted HOFs
    # plus O(dim) map lookups per element.)
    slots = [
        F.sum(F.when(F.col("b") == i, 1).otherwise(0)).alias(f"__s{i}")
        for i in range(dim)
    ]
    dense = words.join(vocab, "w").groupBy("id").agg(*slots)
    return dense.select(
        "id",
        F.array(
            *[F.col(f"__s{i}").cast("float") for i in range(dim)]
        ).alias("embedding"),
    )


def minhash_band_keys(
    sigs: DataFrame, *, num_hashes: int = 32, bands: int = 8
) -> DataFrame:
    """``(id, band, bucket)`` LSH band keys of a signature frame —
    the persisted dedup INDEX shape: band keys are signature slices
    joined as strings (engine-portable, SQL-replicable), exactly as
    :func:`minhash_lsh_pairs` banding."""
    rows_per_band = num_hashes // bands
    return sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.concat_ws(
                            "_",
                            F.transform(
                                F.slice(
                                    "sig", i * rows_per_band + 1, rows_per_band
                                ),
                                lambda x: x.cast("string"),
                            ),
                        ).alias("bucket"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")


def incremental_minhash_dedup(
    existing: DataFrame,
    incoming: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Ingest-time near-dup dedup: flag every INCOMING document that
    near-duplicates the EXISTING corpus — the daily-batch shape of a
    production pipeline, where new crawl shards check against a
    persisted index instead of re-deduplicating 100 TB from scratch.

    Returns ``(id_new, id_old, jaccard)`` — anti-join ``id_new`` to
    admit only novel documents.

    Scale shape: the existing side's signatures/band keys are the
    PERSISTED index (:func:`minhash_band_keys` — write it once, read
    it per batch); only the incoming batch is shingled/hashed fresh.
    The candidate join is banded-index equi-join (incoming bands are
    batch-sized), and the exact-Jaccard verify touches candidate docs
    only.  Same md5/affine recipe as :func:`minhash_lsh_pairs`, so
    the whole incremental pipeline replays in SQL.
    """
    # Fused shingle+signature Arrow pass per side (optimization r15,
    # same kernel as minhash_lsh_pairs), pinned because each side
    # feeds TWO consumers (band keys + the Jaccard verify) — unpinned,
    # each consumer re-ran the whole shingle/hash subtree.
    ss_e = shingle_sig_df(
        existing, id_col=id_col, text_col=text_col, n=n,
        num_hashes=num_hashes, seed=seed,
    ).localCheckpoint(eager=True)
    ss_i = shingle_sig_df(
        incoming, id_col=id_col, text_col=text_col, n=n,
        num_hashes=num_hashes, seed=seed,
    ).localCheckpoint(eager=True)
    sh_e = ss_e.select("id", "sh")
    sh_i = ss_i.select("id", "sh")
    sig_e = ss_e.select("id", "sig")
    sig_i = ss_i.select("id", "sig")
    idx = minhash_band_keys(sig_e, num_hashes=num_hashes, bands=bands)
    new_keys = minhash_band_keys(sig_i, num_hashes=num_hashes, bands=bands)
    cand = (
        new_keys.alias("a")
        .join(
            idx.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .select(F.col("a.id").alias("id_new"), F.col("b.id").alias("id_old"))
        .distinct()
    )
    verified = (
        cand.join(
            sh_i.select(F.col("id").alias("id_new"), F.col("sh").alias("__sh_n")),
            "id_new",
        )
        .join(
            sh_e.select(F.col("id").alias("id_old"), F.col("sh").alias("__sh_o")),
            "id_old",
        )
        .withColumn(
            "__shared", F.size(F.array_intersect("__sh_n", "__sh_o"))
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("__shared")
                / (
                    F.size("__sh_n") + F.size("__sh_o") - F.col("__shared")
                ),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("id_new", "id_old", "jaccard")


def line_dedup(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_words: int = 8,
) -> DataFrame:
    """C4-style corpus-wide LINE deduplication (Raffel et al. 2020,
    arXiv:1910.10683 §2.2 — public): every document splits into
    consecutive ``line_words``-word lines, a line occurring anywhere
    else in the corpus keeps only its FIRST occurrence (lowest
    ``(doc_id, line_no)``), and each document is rebuilt from its
    surviving lines.  The intra-document twin of the doc-level dedup
    family: boilerplate (navigation, license headers) dies corpus-wide
    without dropping whole documents.

    Returns one row per document: ``n_lines / n_kept / n_dropped /
    kept_words`` and ``clean_md5`` — the md5 of the rebuilt text, so
    the oracle binds the RECONSTRUCTION, not just the counts.

    Scale shape: one shuffle to assemble lines (per-doc hash
    aggregate), one to elect first occurrences — an aggregate
    ``min(struct(doc, line_no))`` per line text with map-side
    partials, so a line duplicated 10M times collapses inside each
    task before it travels (the skew-resistant alternative to a
    row_number window over the duplicate class) — and a join of lines
    against winners on the line hash.  Never all-pairs, never a
    global sort."""
    words = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.split(normalize_text(F.col(text_col)), " ")
        ).alias("pos", "w"),
    ).filter(F.col("w") != "")
    lines = (
        words.groupBy(
            "id", (F.floor(F.col("pos") / line_words)).alias("line_no")
        )
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s.getField("w"),
                ),
                " ",
            ).alias("line_text"),
            F.count("*").alias("n_words"),
        )
    )
    firsts = lines.groupBy("line_text").agg(
        F.min(F.struct(F.col("id"), F.col("line_no"))).alias("__first")
    )
    flagged = lines.join(firsts, "line_text").withColumn(
        "__kept",
        (F.col("id") == F.col("__first.id"))
        & (F.col("line_no") == F.col("__first.line_no")),
    )
    kept_line = F.when(
        F.col("__kept"), F.struct(F.col("line_no"), F.col("line_text"))
    )
    return flagged.groupBy(F.col("id").alias(id_col)).agg(
        F.count("*").alias("n_lines"),
        F.sum(F.when(F.col("__kept"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        F.sum(F.when(F.col("__kept"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_dropped"),
        F.coalesce(
            F.sum(F.when(F.col("__kept"), F.col("n_words"))), F.lit(0)
        )
        .cast("bigint")
        .alias("kept_words"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_line)),
                    lambda s: s.getField("line_text"),
                ),
                " ",
            )
        ).alias("clean_md5"),
    )


def chunk_documents(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Overlapping word-window chunking (the RAG / context-window
    preparation step): each document splits into windows of
    ``chunk_size`` words advancing by ``chunk_size - overlap``, the
    final window keeping whatever remains.  Returns
    ``(id, chunk_id, start_word, n_words, chunk_text)`` — chunk_id is
    the 0-based window index, so (id, chunk_id) is a stable key for
    embedding/indexing downstream.

    Deterministic integer/slice arithmetic end to end (SQL-replayable);
    one narrow explode, no shuffle — chunking is a map-side operator
    however large the corpus.
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError("require 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    words = df.select(
        F.col(id_col).alias("id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("__w"),
    )
    n = F.size("__w")
    # windows start at 0, stride, 2*stride, ... while start+overlap < n
    # (i.e. every window adds at least one new word); short docs get
    # exactly one window
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)), F.lit(1)
    ).cast("int")
    return words.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.struct(
                    (i * stride).alias("start"),
                    F.slice("__w", i * stride + 1, chunk_size).alias("cw"),
                ),
            )
        ).alias("chunk_id", "c"),
    ).select(
        "id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.col("c.start").cast("bigint").alias("start_word"),
        F.size("c.cw").cast("bigint").alias("n_words"),
        F.concat_ws(" ", "c.cw").alias("chunk_text"),
    )


# ------------------------------------------------------------- TF-IDF

def tfidf_top_terms(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
    k: int = 10,
    min_len: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per group by TF-IDF — the corpus
    profiling pass a training-data curator runs to see what each
    language/domain slice actually contains (the aggregate twin of the
    per-document ``hash_tf_embed`` featurizer).

    TF is the term's total occurrences within the group; DF is the
    corpus-wide count of documents containing the term; the score is
    ``tf * ln(N/df)``.  Tokenization is the same lower/[^a-z]+ split
    the quality profiler uses, so the oracle replays it verbatim with
    DuckDB's ``string_split_regex``.

    Scale: ONE explode of the corpus into the (doc, term) count
    matrix — tokenization is the expensive stage at 100 TB, so it
    runs once and the matrix is pinned (``localCheckpoint``: Catalyst
    re-plans a twice-referenced subtree twice, which would re-explode
    the corpus for the DF and TF branches).  DF and TF are then cheap
    partial-aggregated groupBys over the compact matrix; the final
    top-k is a WindowGroupLimit over |vocab x groups| rows, not over
    documents.  No Python in the plan.
    """
    doc_terms = (
        docs.select(
            F.col(id_col).alias("__doc"),
            F.col(group_col).alias("grp"),
            F.explode(
                F.split(F.lower(F.col(text_col)), "[^a-z]+")
            ).alias("term"),
        )
        .filter(F.length("term") >= min_len)
        .groupBy("__doc", "grp", "term")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    # doc_terms is distinct by construction: count(*) IS the doc freq
    df_t = doc_terms.groupBy("term").agg(F.count("*").alias("df"))
    tf = doc_terms.groupBy("grp", "term").agg(F.sum("c").alias("tf"))
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4
            ),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("grp").orderBy(
            F.col("score").desc(), F.col("term").asc()
        )
    )
    return (
        scored.withColumn("rank", rk.cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("grp").alias(group_col),
            "term",
            "tf",
            "df",
            "score",
            "rank",
        )
    )


def ngram_containment_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Asymmetric near-dup pairs by shingle CONTAINMENT:
    ``|A∩B| / |smaller side|`` — the metric that catches a document
    quoted or embedded inside a larger one, which symmetric Jaccard
    misses (a 100-line doc fully contained in a 10,000-line doc has
    jaccard ~0.01 but containment 1.0).  Output is directional:
    (contained_id, container_id), smaller shingle set = contained,
    ties to the lower id.

    Candidates, scale guards (``max_df``) and exact verification are
    the same inverted-index machinery as
    :func:`ngram_jaccard_pairs` — only the final metric differs.
    """
    sh = shingle_df(df, id_col=id_col, text_col=text_col, n=n)
    sh = sh.localCheckpoint(eager=True)
    exploded = sh.select("id", F.explode("sh").alias("g"))
    if max_df is not None:
        hot = (
            exploded.groupBy("g")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") > max_df)
            .select("g")
        )
        exploded = exploded.join(hot, "g", "left_anti")
    a = exploded.alias("a")
    b = exploded.alias("b")
    cand = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    verified = (
        cand.join(
            sh.select(F.col("id").alias("id_a"), F.col("sh").alias("__sh_a")), "id_a"
        )
        .join(
            sh.select(F.col("id").alias("id_b"), F.col("sh").alias("__sh_b")), "id_b"
        )
        .withColumn("n_shared", F.size(F.array_intersect("__sh_a", "__sh_b")))
        .withColumn("__na", F.size("__sh_a"))
        .withColumn("__nb", F.size("__sh_b"))
        .withColumn(
            "containment",
            F.round(F.col("n_shared") / F.least("__na", "__nb"), 4),
        )
        .filter(F.col("containment") >= threshold)
    )
    return verified.select(
        F.when(F.col("__na") <= F.col("__nb"), F.col("id_a"))
        .otherwise(F.col("id_b"))
        .alias("contained_id"),
        F.when(F.col("__na") <= F.col("__nb"), F.col("id_b"))
        .otherwise(F.col("id_a"))
        .alias("container_id"),
        F.col("n_shared").cast("bigint").alias("n_shared"),
        "containment",
    )


def weighted_sample(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    group_col: str = "lang",
    weight: Column | None = None,
    k: int = 20,
) -> DataFrame:
    """Weighted sampling without replacement, k per group
    (Efraimidis–Spirakis A-ES): each row draws priority
    ``ln(u)/w`` (order-equivalent to ``u^(1/w)``) and the top-k
    priorities win — heavier rows proportionally likelier.  THE
    training-mix selection primitive when quality scores should bias,
    not hard-filter, the corpus.

    One narrow pass + a per-group top-k (WindowGroupLimit) — no
    global sort, no driver-side randomness: ``u`` derives from
    ``md5(id)`` (deterministic, replayable in SQL like the MinHash
    recipe), and the published priority is rounded to 10 decimals
    with an id tiebreak so cross-engine libm ulp noise in ``ln``
    cannot reorder the selection.
    """
    w = weight if weight is not None else F.lit(1.0)
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
        + F.lit(1e-12)  # keep ln() off exactly-zero u
    )
    pri = F.round(F.log(u) / w, 10)
    rk = F.row_number().over(
        Window.partitionBy(group_col).orderBy(
            F.col("__pri").desc(), F.col(id_col).asc()
        )
    )
    return (
        docs.withColumn("__pri", pri)
        .withColumn("pos", rk)
        .filter(F.col("pos") <= k)
        .select(
            group_col,
            id_col,
            F.col("__pri").alias("priority"),
            "pos",
        )
    )


def bm25_search(
    docs: DataFrame,
    query_terms: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    min_len: int = 3,
) -> DataFrame:
    """Okapi BM25 ranked retrieval over the corpus — the lexical
    retrieval baseline every RAG / dedup-adjudication pipeline needs
    next to the ANN stack (Robertson & Zaragoza 2009, public).

    ``query_terms`` is a (query_id, term) frame (a handful of rows —
    the query workload).  Scoring: per query term,

        idf  = ln(1 + (N - df + 0.5) / (df + 0.5))
        norm = tf * (k1 + 1) / (tf + k1 * (1 - b + b * (dl / avgdl)))

    summed over the query's terms.  Every per-term score is published
    as integer micro-units (``floor(x * 1e6 + 0.5)``) BEFORE the
    per-document sum, so the total is an order-independent integer —
    cross-engine ulp noise in the float sum can't reorder ranks (the
    exact-integer formulation the revenue/Gini queries use).

    Scale shape: the corpus tokenizes ONCE into the (doc, term, tf)
    matrix (pinned — two consumers: postings probe + doc lengths);
    the query-term list broadcasts into the matrix, so only postings
    for queried terms survive the probe (inverted-index access path —
    at 100 TB the scored frame is |matching postings|, not |corpus|).
    Doc lengths join the *filtered* postings on the doc key; the
    final top-k is a per-query WindowGroupLimit.  No Python anywhere.
    """
    matrix = (
        docs.select(
            F.col(id_col).alias("__doc"),
            F.explode(
                F.split(F.lower(F.col(text_col)), "[^a-z]+")
            ).alias("term"),
        )
        .filter(F.length("term") >= min_len)
        .groupBy("__doc", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    dl = matrix.groupBy("__doc").agg(
        F.sum("tf").cast("bigint").alias("dl")
    )
    # Corpus stats as a 1-row frame (docs with zero kept tokens still
    # count toward N and avgdl) — broadcast, never collected.
    stats = docs.agg(F.count("*").alias("n_docs")).crossJoin(
        dl.agg(F.sum("dl").alias("total_dl"))
    ).select(
        "n_docs",
        (F.col("total_dl").cast("double") / F.col("n_docs")).alias(
            "avgdl"
        ),
    )
    df_t = matrix.groupBy("term").agg(F.count("*").alias("df"))
    qt = query_terms.join(df_t, "term").join(F.broadcast(stats))
    postings = matrix.join(
        F.broadcast(qt), "term"
    ).join(dl, "__doc")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    norm = (
        F.col("tf")
        * (F.lit(k1) + F.lit(1.0))
        / (
            F.col("tf")
            + F.lit(k1)
            * (
                F.lit(1.0)
                - F.lit(b)
                + F.lit(b) * (F.col("dl") / F.col("avgdl"))
            )
        )
    )
    term_micro = F.floor(idf * norm * F.lit(1e6) + F.lit(0.5)).cast(
        "bigint"
    )
    scored = (
        postings.select(
            "query_id",
            F.col("__doc").alias(id_col),
            term_micro.alias("m"),
        )
        .groupBy("query_id", id_col)
        .agg(
            F.sum("m").alias("score_micro"),
            F.count("*").alias("n_hit_terms"),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("score_micro").desc(), F.col(id_col).asc()
        )
    )
    return (
        scored.withColumn("rank", rk)
        .filter(F.col("rank") <= top_k)
        .select(
            "query_id", id_col, "score_micro", "n_hit_terms", "rank"
        )
    )


#: Extended PII patterns (pii_audit).  Each behaves identically in
#: Java regex (Spark) and RE2 (DuckDB): no backreferences, no
#: lookaround — only \b, \d, counted repetition.
PHONE_REGEX = r"\+\d{1,2}-\d{3}-\d{3}-\d{4}"
IPV4_REGEX = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
SSN_REGEX = r"\b\d{3}-\d{2}-\d{4}\b"
CARD_REGEX = r"\b\d{16}\b"


def luhn_valid(card: Column) -> Column:
    """Luhn checksum over a 16-digit card string — the validity filter
    that separates card-SHAPED tokens from plausible card numbers in a
    PII sweep (ISO/IEC 7812, public).  Pure integer fold: reverse the
    string, double every second digit from the right (subtracting 9
    when the double exceeds 9), sum mod 10 == 0.  Expressed as a
    ``zip_with`` over the character array so it stays inside codegen
    (no UDF), and replayable verbatim in ANSI-ish SQL
    (``list_transform(range(1,17), ...)`` over ``substr(reverse(c))``
    in DuckDB)."""
    chars = F.slice(F.split(F.reverse(card), ""), 1, 16)
    contrib = F.zip_with(
        chars,
        F.sequence(F.lit(1), F.lit(16)),
        lambda ch, j: F.when(
            j % 2 == 0,
            F.when(ch.cast("int") * 2 > 9, ch.cast("int") * 2 - 9).otherwise(
                ch.cast("int") * 2
            ),
        ).otherwise(ch.cast("int")),
    )
    total = F.aggregate(contrib, F.lit(0), lambda acc, v: acc + v)
    return total % 10 == 0


def pii_audit(
    df: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """Per-document extended-PII detection counts: phone numbers,
    IPv4 addresses, SSN-shaped tokens, 16-digit card candidates, and
    Luhn-VALID cards (the actionable subset) — the audit pass a
    training-data pipeline runs before release, extending the
    URL/email scrub (:func:`scrub_counts`/:func:`scrub_pii`) to the
    numeric PII families.

    One narrow codegen'd projection over the text column — four
    ``regexp_extract_all`` + one in-array Luhn fold, no shuffle, no
    UDF; at 100 TB this pipelines with the scan.
    """
    t = F.col(text_col)
    cards = F.regexp_extract_all(t, F.lit(CARD_REGEX), 0)
    return df.withColumns(
        {
            "n_phones": F.size(
                F.regexp_extract_all(t, F.lit(PHONE_REGEX), 0)
            ),
            "n_ipv4": F.size(F.regexp_extract_all(t, F.lit(IPV4_REGEX), 0)),
            "n_ssn_shaped": F.size(
                F.regexp_extract_all(t, F.lit(SSN_REGEX), 0)
            ),
            "n_card_shaped": F.size(cards),
            "n_cards_luhn_valid": F.size(
                F.filter(cards, lambda c: luhn_valid(c))
            ),
        }
    )


def chunk_pack_sequences(
    df: DataFrame,
    *,
    budget: int = 512,
    text_col: str = "text",
    order_col: str = "doc_id",
    part_col: str = "source",
) -> DataFrame:
    """Concat-and-chunk sequence packing — the GPT-style pretraining
    batch construction (public: Brown et al. 2020 §2.1 'documents are
    concatenated and split into sequences of N tokens'): within each
    ``part_col`` shard, documents are concatenated in ``order_col``
    order and the token stream is cut every ``budget`` tokens, so a
    document can straddle a pack boundary.  The DOCUMENT-level
    variant (each doc whole, bin = where it starts) is
    :func:`pack_sequences`; this one accounts tokens exactly —
    every non-tail pack is exactly ``budget`` tokens.

    Each document's pack span is pure window arithmetic — exclusive
    running token sum ``c``, first pack ``floor(c/budget)``, last pack
    ``floor((c + n_tok - 1)/budget)`` — then an explode over the
    (bounded, usually 1-2 element) pack range.  The cumulative window
    is PARTITIONED by the shard column: packing is a per-shard
    sequential contract in production anyway (each data shard packs
    independently on its executor), so no global sort exists anywhere.

    Returns one row per (shard, pack): documents touching the pack,
    documents SPLIT across its boundary, and the pack's token count
    (= budget except each shard's ragged last pack).
    """
    from pyspark.sql.window import Window

    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("bigint")
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    spans = df.select(
        F.col(part_col).alias("shard"),
        toks.alias("n_tok"),
        F.coalesce(F.sum(toks).over(w), F.lit(0)).alias("c"),
    ).select(
        "shard",
        "n_tok",
        F.floor(F.col("c") / budget).alias("first_pack"),
        F.floor((F.col("c") + F.col("n_tok") - 1) / budget).alias(
            "last_pack"
        ),
        F.col("c"),
    )
    exploded = spans.select(
        "shard",
        "n_tok",
        "c",
        "first_pack",
        "last_pack",
        F.explode(
            F.sequence(F.col("first_pack"), F.col("last_pack"))
        ).alias("pack_id"),
    )
    tok_in_pack = F.greatest(
        F.lit(0),
        F.least(F.col("c") + F.col("n_tok"), (F.col("pack_id") + 1) * budget)
        - F.greatest(F.col("c"), F.col("pack_id") * budget),
    )
    return exploded.groupBy("shard", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("first_pack") != F.col("last_pack")).cast("bigint")).alias(
            "n_split_docs"
        ),
        F.sum(tok_in_pack).alias("n_tokens"),
    )


def word_cooccurrence_edges(
    docs: DataFrame,
    *,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Symmetric weighted word co-occurrence graph (±2-token window),
    shared by :func:`textrank_terms` and the label-propagation
    community query: pairs come from TWO lead() columns over the
    position-ordered token stream — ONE shuffle on ``doc_col``, never
    a positional self-join — then collapse to the vocabulary² bound
    and pin (eager localCheckpoint) so downstream iterative consumers
    never re-plan the token scan.  Returns ``(src, dst, wt)`` with
    both directions present."""
    from pyspark.sql.window import Window

    toks = docs.select(
        F.col(doc_col).alias("__doc"),
        F.posexplode(F.split(F.lower(F.col(text_col)), " ")).alias(
            "__pos", "__w"
        ),
    ).filter(F.col("__w") != "")
    win = Window.partitionBy("__doc").orderBy("__pos")
    led = toks.select(
        F.col("__w").alias("w"),
        F.lead("__w", 1).over(win).alias("w1"),
        F.lead("__w", 2).over(win).alias("w2"),
    )
    und = led.select(
        F.col("w").alias("src"), F.col("w1").alias("dst")
    ).filter(F.col("w1").isNotNull() & (F.col("w") != F.col("w1"))).union(
        led.select(F.col("w").alias("src"), F.col("w2").alias("dst")).filter(
            F.col("w2").isNotNull() & (F.col("w") != F.col("w2"))
        )
    )
    return (
        und.union(
            und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .groupBy("src", "dst")
        .agg(F.count("*").alias("wt"))
        .localCheckpoint(eager=True)
    )


def textrank_terms(
    docs: DataFrame,
    *,
    text_col: str = "text",
    doc_col: str = "doc_id",
    n_iter: int = 4,
    damping: float = 0.85,
) -> DataFrame:
    """TextRank keyword scoring (Mihalcea & Tarau 2004, public):
    weighted PageRank over the word co-occurrence graph (±2-token
    window), the unsupervised keyword extractor that needs no corpus
    statistics beyond the co-occurrence counts themselves — the graph
    sibling of the frequency views (`tfidf_terms`, `pmi_cooccur`).

    Scale shape: co-occurrence pairs come from TWO lead() columns over
    the position-ordered token stream (one shuffle on ``doc_col``) —
    never a positional self-join of the token table against itself.
    The edge list then collapses to the VOCABULARY² bound (one hash
    aggregate), and every PageRank iteration joins/aggregates
    vocab-sized frames only; edges/degrees/vertices are
    localCheckpoint-pinned once so Catalyst never re-plans the token
    scan per iteration (same discipline as `analytics.pagerank`).

    Determinism: the update is ``(1-d)/N + d * sum(rank*w/wdeg)`` with
    the teleport computed as the SAME runtime subtraction in both
    engines; final ranks are floor-1e8 pinned by the caller.  Rank
    mass is only approximately conserved (dangling words cannot occur:
    the graph is symmetric), so the sum-order ulp noise the pin
    absorbs is the only cross-engine drift.
    """
    edges = word_cooccurrence_edges(
        docs, text_col=text_col, doc_col=doc_col
    )
    wdeg = (
        edges.groupBy("src").agg(F.sum("wt").alias("__wdeg"))
        .localCheckpoint(eager=True)
    )
    # symmetric graph: every vertex appears as a src
    verts = edges.select(F.col("src").alias("node")).distinct().localCheckpoint(
        eager=True
    )
    n = verts.agg(F.count("*").alias("__n"))
    teleport = 1.0 - damping
    ranks = verts.crossJoin(F.broadcast(n)).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    for _ in range(n_iter):
        contrib = (
            edges.join(
                ranks.select(F.col("node").alias("src"), "rank"), "src"
            )
            .join(wdeg, "src")
            .select(
                F.col("dst").alias("node"),
                ((F.col("rank") * F.col("wt")) / F.col("__wdeg")).alias("__c"),
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


def dsir_weights(
    df: DataFrame,
    target: Column,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by how much more likely its hashed-unigram bag is under the
    TARGET domain's bucket distribution than under the RAW corpus's —
    ``logw(d) = sum_b c_d[b] * (ln p_tgt[b] - ln p_raw[b])`` with
    add-one smoothing over ``dim`` hash buckets.  ``target`` is a
    boolean Column over ``df``'s rows marking the target-domain
    documents (both distributions are fitted in ONE pass: the raw
    count is every token, the target count is the flagged subset).

    Mirrors the reference's quality-gating role (SURVEY §2 text
    filtering; the reference gates rows imperatively in
    ``app/app.py`` ingest) as a published, model-free selector.

    Scale shape: the per-doc bucket histogram is ``hash_tf_embed``
    (vocab-hashed, one conditional-sum pivot); the bucket
    distributions are ONE extra hash-aggregate over the same token
    stream reduced to ``dim`` rows; lambdas travel as a broadcast
    one-row map, so scoring is a map-only pass over the histograms.
    Float discipline: ln is evaluated on exact integer ratios and the
    per-doc fold runs in fixed bucket order (zero-count terms add an
    exact ``0.0``), so the DuckDB oracle replays bit-for-bit; the
    final weight is rounded to 4dp (lm_score discipline).

    Returns ``(doc_id, n_tokens, logw, rn, selected)`` where ``rn``
    is the exact global rank by descending weight (two-phase
    distributed rank — no single-partition sort) and ``selected``
    keeps the top quarter (ceil) — the resampling budget.
    """
    flagged = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("__t"), target.alias("__tgt")
    )
    words = flagged.select(
        "__tgt", F.explode(F.split(normalize_text(F.col("__t")), " ")).alias("w")
    )
    vocab = (
        words.select("w").distinct().withColumn("b", shingle_hash60(F.col("w")) % dim)
    )
    bucketed = words.join(vocab, "w")
    dist = bucketed.groupBy("b").agg(
        F.count("*").alias("n_raw"),
        F.sum(F.col("__tgt").cast("bigint")).alias("n_tgt"),
    )
    # dim rows -> one row: totals + the per-bucket log-ratio map.
    # ln((t_b+1)/(T+dim)) - ln((r_b+1)/(R+dim)) on exact ratios.
    totals = dist.agg(
        F.sum("n_raw").alias("__R"), F.sum("n_tgt").alias("__T")
    )
    lam = (
        dist.crossJoin(F.broadcast(totals))
        .select(
            "b",
            (
                F.log((F.col("n_tgt") + 1.0) / (F.col("__T") + float(dim)))
                - F.log((F.col("n_raw") + 1.0) / (F.col("__R") + float(dim)))
            ).alias("lam"),
        )
        .groupBy()
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("b", "lam")))
            ).alias("__lam")
        )
    )
    hist = hash_tf_embed(df, id_col=id_col, text_col=text_col, dim=dim)
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    scored = hist.crossJoin(F.broadcast(lam)).select(
        F.col("id").alias(id_col),
        F.aggregate(
            F.transform(idx, lambda i: F.element_at("embedding", i + 1)),
            F.lit(0).cast("bigint"),
            lambda acc, c: acc + c.cast("bigint"),
        ).alias("n_tokens"),
        F.round(
            F.aggregate(
                F.transform(
                    idx,
                    lambda i: F.element_at("embedding", i + 1).cast("double")
                    * F.coalesce(
                        F.element_at("__lam", i.cast("bigint")), F.lit(0.0)
                    ),
                ),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ),
            4,
        ).alias("logw"),
    )
    from cdc_pipe_line_spark.functions import global_row_number

    ranked = global_row_number(
        scored.select(
            id_col, "n_tokens", "logw", (-F.col("logw")).alias("__neg")
        ),
        ["__neg", id_col],
    ).drop("__neg")
    n = scored.agg(F.count("*").alias("__n"))
    return ranked.crossJoin(F.broadcast(n)).select(
        id_col,
        "n_tokens",
        "logw",
        F.col("rn").cast("bigint").alias("rn"),
        (F.col("rn") <= F.ceil(F.col("__n") / 4)).alias("selected"),
    )


def hashed_quality_score(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 256,
) -> DataFrame:
    """fastText-style hashed linear text classifier, integer-exact:
    every word bigram maps to a ``dim``-bucket feature (the portable
    md5-60bit hash) and the score is the exact BIGINT dot product of
    the bigram counts with a fixed hash-derived weight vector
    ``w[b] = ((b+1) * 2654435761) % 2001 - 1000`` — the deployed
    shape of a linear quality filter (CCNet / fastText spam gate)
    with the learned weights replaced by a deterministic stand-in so
    the whole operator replays in SQL (the training step is out of
    scope; serving is the data-pipeline operator).

    Scale shape: bigrams explode from the same normalized token
    stream every text operator shares; the feature hash is computed
    on the DISTINCT-bigram vocabulary and equi-joined back (corpus
    stream never feeds md5), then one hash-aggregate per doc sums
    weights.  All integer arithmetic — no float traps.

    Returns ``(doc_id, n_feats, score, keep)``.
    """
    words = df.select(
        F.col(id_col).alias("id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("__w"),
    ).filter(F.size("__w") >= 2)
    grams = words.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("__w") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("__w", i), F.element_at("__w", i + 1)
                ),
            )
        ).alias("gram"),
    )
    gvocab = (
        grams.select("gram")
        .distinct()
        .withColumn("b", shingle_hash60(F.col("gram")) % dim)
        .withColumn(
            "wt", ((F.col("b") + 1) * F.lit(2654435761)) % 2001 - 1000
        )
    )
    return (
        grams.join(gvocab, "gram")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_feats"),
            F.sum("wt").cast("bigint").alias("score"),
        )
        .select(
            F.col("id").alias(id_col),
            F.col("n_feats").cast("bigint").alias("n_feats"),
            "score",
            (F.col("score") > 0).alias("keep"),
        )
    )


def prefix_filter_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Set-similarity self-join by PREFIX FILTERING (the AllPairs /
    PPJoin candidate bound, Bayardo et al. 2007 / Xiao et al. 2008):
    order every document's shingle set by ascending global document
    frequency (rarest first, ties by shingle), index only the first
    ``|x| - ceil(0.8|x|) + 1`` shingles, and join candidates on
    shared PREFIX shingles — any pair with Jaccard >= 0.8 provably
    shares at least one prefix token, so the index is ~20% of the
    postings the plain inverted index carries and the hot
    (high-df) shingles never enter the candidate join at all.
    Verification is exact: full shingle arrays re-joined,
    ``5*|A∩B| >= 4*|A∪B|`` cross-multiplied in integers, jaccard
    emitted as an exact micro-ratio.

    Complement to ``ngram_jaccard_pairs``'s max_df cap: the cap
    DROPS hot postings (bounded loss, emitted as telemetry); prefix
    filtering is LOSSLESS for the threshold — worst case (all
    documents identical) the prefix index degenerates to
    output-proportional work, which is the true duplicate mass.

    Scale shape: one shingling pass (checkpoint-pinned, reused by
    index and verify), one df aggregate over the exploded stream,
    per-doc rank windows bounded by document length, and the
    candidate join runs over the ~20% prefix postings only.
    """
    sh = shingle_df(df, id_col=id_col, text_col=text_col, n=n)
    sh = sh.localCheckpoint(eager=True)
    tok = sh.select("id", F.explode("sh").alias("g"))
    dfreq = tok.groupBy("g").agg(F.count("*").alias("__df"))
    sized = sh.select("id", F.size("sh").alias("sz"))
    wrk = Window.partitionBy("id").orderBy("__df", "g")
    ranked = tok.join(dfreq, "g").withColumn("rk", F.row_number().over(wrk))
    pref = (
        ranked.join(sized, "id")
        .filter(F.col("rk") <= F.col("sz") - F.expr("(4 * sz + 4) div 5") + 1)
        .select("id", "g")
    )
    cand = (
        pref.alias("a")
        .join(
            pref.alias("b"),
            (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return (
        cand.join(
            sh.select(F.col("id").alias("id_a"), F.col("sh").alias("__sa")),
            "id_a",
        )
        .join(
            sh.select(F.col("id").alias("id_b"), F.col("sh").alias("__sb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.size("__sa").alias("sz_a"),
            F.size("__sb").alias("sz_b"),
            F.size(F.array_intersect("__sa", "__sb")).alias("n_shared"),
        )
        .filter(F.expr("5 * n_shared >= 4 * (sz_a + sz_b - n_shared)"))
        .withColumn(
            "jac_micro",
            F.expr(
                "(1000000 * CAST(n_shared AS BIGINT)) "
                "div (sz_a + sz_b - n_shared)"
            ),
        )
    )
