"""Similarity-search + multimodal queries (north-star ops) over
``embeddings`` and ``documents``.

The cosine oracle hand-rolls the same left-to-right double-precision
fold as the Spark implementation (similarity.py), so values match to
the last ulp before the defensive round(4).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_pipe_line_spark.multimodal import (
    as_media_table,
    audio_stats,
    embed_media,
    extract_media_meta,
    jpeg_color_stats,
    jpeg_dc_preview_stats,
    jpeg_gray_stats,
    jpeg_progressive_gray_stats,
    make_gif,
    make_jpeg_color,
    make_jpeg_gray,
    make_jpeg_gray_progressive,
    make_jpeg_gray_progressive_full,
    make_mp4_sampled,
    make_wav,
    mp4_sample_index,
    sample_frames,
)
from cdc_pipe_line_spark.similarity import (
    semantic_dedup,
    brute_force_topk,
    cosine_near_dup_pairs,
    ivf_sq8_topk,
    ivf_topk,
    lsh_topk,
    sq8_topk,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from cdc_pipe_line_spark.queries import load_table

    return load_table(spark, sf_dir, name)


def _queries_and_corpus(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    return q, emb


def q_knn_bruteforce(spark, sf_dir):
    """Exact cosine top-10 per query vector (every 100th vector is a
    query) — the ANN correctness baseline."""
    q, emb = _queries_and_corpus(spark, sf_dir)
    return brute_force_topk(q, emb, k=10)


def q_knn_lsh(spark, sf_dir):
    """Random-hyperplane LSH bucketed top-10 — the scale path.

    Fully oracle-checked: the hyperplanes are deterministic literals
    and the projection folds are the same left-to-right double
    arithmetic in both engines, so DuckDB reproduces the buckets (sign
    parity verified corpus-wide), the candidate join, and the exact
    re-rank bit-for-bit."""
    q, emb = _queries_and_corpus(spark, sf_dir)
    return lsh_topk(q, emb, k=10, n_planes=6, dim=64)


def q_knn_ivf(spark, sf_dir):
    """IVF (mini-k-means inverted lists, 8-of-16 probes) top-10 — the
    second ANN scale path.

    The inverted-list build is seeded via distributed hash-order
    sampling (xxhash64 — deliberately not SQL-replicable), so instead
    of replaying the k-means in SQL the oracle binds through the
    sketch-query pattern (cf. ``agg_sketch_sample_profile``): one row
    per query carrying EXACT brute-force values DuckDB recomputes
    (top-1 id/sim, top-10 sim sum) plus boolean accuracy claims the
    approximate path must uphold — per-query recall@10 >= 0.4,
    corpus-wide mean recall >= 0.6, and <= k rows returned.  A recall
    regression flips a boolean and fails the driver's hash check."""
    q, emb = _queries_and_corpus(spark, sf_dir)
    ivf = ivf_topk(q, emb, k=10, n_centroids=16, n_probe=8)
    exact = brute_force_topk(q, emb, k=10)
    hits = (
        ivf.select("q_id", "vec_id")
        .join(exact.select("q_id", "vec_id"), ["q_id", "vec_id"], "left_semi")
        .groupBy("q_id")
        .agg(F.count("*").alias("__n_hit"))
    )
    n_ivf = ivf.groupBy("q_id").agg(F.count("*").alias("__n_ivf"))
    per_q = (
        exact.groupBy("q_id")
        .agg(
            F.max(F.when(F.col("rank") == 1, F.col("vec_id"))).alias(
                "exact_top1_id"
            ),
            F.max(F.when(F.col("rank") == 1, F.col("cos_sim"))).alias(
                "exact_top1_sim"
            ),
            F.round(F.sum("cos_sim"), 4).alias("exact_top10_sim_sum"),
            F.count("*").alias("__n_exact"),
        )
        .join(hits, "q_id", "left")
        .join(n_ivf, "q_id", "left")
        .withColumn(
            "__recall",
            F.coalesce(F.col("__n_hit"), F.lit(0)) / F.col("__n_exact"),
        )
    )
    mean_ok = per_q.agg(
        (F.avg("__recall") >= 0.6).alias("mean_recall10_ge_06")
    )
    return (
        per_q.crossJoin(F.broadcast(mean_ok))
        .select(
            "q_id",
            "exact_top1_id",
            "exact_top1_sim",
            "exact_top10_sim_sum",
            (F.col("__recall") >= 0.4).alias("recall10_ge_04"),
            "mean_recall10_ge_06",
            (F.coalesce(F.col("__n_ivf"), F.lit(0)) <= 10).alias("ivf_le_k"),
        )
    )


def q_audio_stats(spark, sf_dir):
    """Signal-level audio features over REAL PCM bytes: every document
    becomes a deterministic square-wave WAV (frames/amplitude/channels
    derived from doc_id), numpy computes RMS/peak/duration from the
    parsed samples in mapInPandas, and every 50th payload is truncated
    to exercise the quarantine path.  The square wave makes the
    statistics arithmetic (|sample| == amp everywhere, so RMS == peak
    == amp exactly, no float error), which lets the oracle bind the
    numpy stats path from doc_id alone."""

    @F.pandas_udf("binary")
    def _wav_payload(
        frames: pd.Series, amp: pd.Series, ch: pd.Series, cut: pd.Series
    ) -> pd.Series:
        out = []
        for f, a, c, k in zip(frames, amp, ch, cut):
            b = make_wav(int(f), int(a), channels=int(c))
            out.append(b[:-3] if k else b)
        return pd.Series(out, dtype=object)

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (((F.col("doc_id") % 40) + 1) * 16).alias("__frames"),
        ((F.col("doc_id") % 2000) + 1).alias("__amp"),
        (1 + (F.col("doc_id") % 2)).alias("__ch"),
        (F.col("doc_id") % 50 == 0).alias("__cut"),
    )
    media = as_media_table(
        docs,
        id_col="doc_id",
        payload_col=_wav_payload("__frames", "__amp", "__ch", "__cut"),
        media_type="audio/wav",
    )
    return audio_stats(media)


def q_gif_decode(spark, sf_dir):
    """GIF through the REAL LZW decoder: every document becomes a
    deterministic single-frame GIF (dims from doc_id, naive 9-bit
    CLEAR-per-pixel LZW), decode_media decompresses the stream and
    validates the pixel count; every 37th payload is truncated into
    the quarantine path.  make_gif's byte count is arithmetic —
    ``794 + B + ceil(B/255)``, ``B = ceil(9*(2wh+1)/8)`` — so the
    oracle binds the encoder+decoder round trip from doc_id alone."""

    @F.pandas_udf("binary")
    def _gif_payload(
        w: pd.Series, h: pd.Series, seed: pd.Series, cut: pd.Series
    ) -> pd.Series:
        out = []
        for a, b, s, k in zip(w, h, seed, cut):
            g = make_gif(int(a), int(b), seed=int(s))
            out.append(g[:-3] if k else g)
        return pd.Series(out, dtype=object)

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        ((F.col("doc_id") % 20) + 1).alias("__w"),
        ((F.col("doc_id") % 12) + 1).alias("__h"),
        (F.col("doc_id") % 256).alias("__seed"),
        (F.col("doc_id") % 37 == 0).alias("__cut"),
    )
    media = as_media_table(
        docs,
        id_col="doc_id",
        payload_col=_gif_payload("__w", "__h", "__seed", "__cut"),
        media_type="image/gif",
    )
    return extract_media_meta(media).select(
        "media_id", "n_bytes", "width", "height", "decode_err"
    )


def q_mp4_samples(spark, sf_dir):
    """Container-aware video frame access: every document becomes a
    minimal real MP4 (stsz/stco/stsc sample tables + mdat), and
    mp4_sample_index materializes each sample's byte range by
    actually parsing the ISO-BMFF structure — the slice-then-decode
    shape of distributed frame sampling.  Sample sizes/offsets are
    closed-form in doc_id (one chunk, sizes base+(i%7)), so the
    oracle replays the whole layout; every 41st payload loses its
    mdat body and quarantines with the exact bounds-check message."""

    @F.pandas_udf("binary")
    def _mp4_payload(
        n: pd.Series, base: pd.Series, cut: pd.Series
    ) -> pd.Series:
        out = []
        for a, b, k in zip(n, base, cut):
            m = make_mp4_sampled(int(a), int(b), seed=int(a) * 7 + int(b))
            out.append(m[: 132 + 4 * int(a)] if k else m)
        return pd.Series(out, dtype=object)

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        ((F.col("doc_id") % 25) + 2).alias("__n"),
        ((F.col("doc_id") % 50) + 10).alias("__base"),
        (F.col("doc_id") % 41 == 0).alias("__cut"),
    )
    media = as_media_table(
        docs,
        id_col="doc_id",
        payload_col=_mp4_payload("__n", "__base", "__cut"),
        media_type="video/mp4",
    )
    return mp4_sample_index(media)


def q_knn_ivf_sq8(spark, sf_dir):
    """IVF-SQ8 composed ANN (inverted lists x quantized codes — the
    FAISS IVF,SQ8 shape) with 8-of-16 probes and exact re-rank.
    Oracle pattern as sim_knn_ivf: exact brute-force values DuckDB
    recomputes + boolean accuracy claims the composed approximate
    path must uphold (per-query recall@10 >= 0.4, mean >= 0.6,
    <= k rows)."""
    q, emb = _queries_and_corpus(spark, sf_dir)
    approx = ivf_sq8_topk(
        q, emb, k=10, n_centroids=16, n_probe=8, rerank=40, dim=64
    )
    exact = brute_force_topk(q, emb, k=10)
    hits = (
        approx.select("q_id", "vec_id")
        .join(exact.select("q_id", "vec_id"), ["q_id", "vec_id"], "left_semi")
        .groupBy("q_id")
        .agg(F.count("*").alias("__n_hit"))
    )
    n_approx = approx.groupBy("q_id").agg(F.count("*").alias("__n_approx"))
    per_q = (
        exact.groupBy("q_id")
        .agg(
            F.max(F.when(F.col("rank") == 1, F.col("vec_id"))).alias(
                "exact_top1_id"
            ),
            F.max(F.when(F.col("rank") == 1, F.col("cos_sim"))).alias(
                "exact_top1_sim"
            ),
            F.round(F.sum("cos_sim"), 4).alias("exact_top10_sim_sum"),
            F.count("*").alias("__n_exact"),
        )
        .join(hits, "q_id", "left")
        .join(n_approx, "q_id", "left")
        .withColumn(
            "__recall",
            F.coalesce(F.col("__n_hit"), F.lit(0)) / F.col("__n_exact"),
        )
    )
    mean_ok = per_q.agg(
        (F.avg("__recall") >= 0.6).alias("mean_recall10_ge_06")
    )
    return (
        per_q.crossJoin(F.broadcast(mean_ok))
        .select(
            "q_id",
            "exact_top1_id",
            "exact_top1_sim",
            "exact_top10_sim_sum",
            (F.col("__recall") >= 0.4).alias("recall10_ge_04"),
            "mean_recall10_ge_06",
            (F.coalesce(F.col("__n_approx"), F.lit(0)) <= 10).alias(
                "ivfsq8_le_k"
            ),
        )
    )


def q_knn_sq8(spark, sf_dir):
    """Scalar-quantized (SQ8) ANN top-10: int8-coded corpus, ADC scan
    against full-precision queries, exact re-rank of the top-40
    candidates — the memory-bandwidth scale path (4x fewer corpus
    bytes/vector than float32).

    Fully oracle-checked: per-dimension min/max are selections (no
    arithmetic), the code/floor/dequantize arithmetic is plain double
    expression work replayed verbatim in SQL, so the hash binds the
    QUANTIZED candidate path (approx_sim + membership), not just the
    reranked output."""
    q, emb = _queries_and_corpus(spark, sf_dir)
    return sq8_topk(q, emb, k=10, rerank=40, dim=64)


def q_cosine_near_dup(spark, sf_dir):
    """Embedding high-similarity pairs within same-label blocks.

    Threshold 0.35 ~= the 99.9th percentile of within-label cosine in
    the synthetic embeddings (which contain no true near-dups) — keeps
    the operator's output non-empty so the oracle check is
    meaningful; production dedup would use ~0.95.
    """
    emb = _t(spark, sf_dir, "embeddings")
    return cosine_near_dup_pairs(emb, block_col="label", threshold=0.35)


def q_media_pipeline(spark, sf_dir):
    """Multimodal plumbing probe-tagged in one slot:

    - ``meta``: documents as binary payloads -> Arrow-batched
      mapInPandas metadata extraction (length-derived stand-in decode
      for the opaque ``image/fake`` type);
    - ``ppm``: REAL byte decoding end-to-end — a binary-PPM (P6)
      payload is constructed from each document with pure column
      expressions (header + md5-derived pixel fill, so DuckDB replays
      the exact bytes), then parsed back by the stdlib
      :func:`~cdc_pipe_line_spark.multimodal.decode_media` netpbm
      parser inside mapInPandas; the oracle recomputes width/height
      from the construction formula, binding the parser bit-for-bit;
    - ``png``: the compressed-format tier — a real PNG (CRC'd chunks,
      stored-zlib scanlines) is built per document by the
      deterministic :func:`~cdc_pipe_line_spark.multimodal.make_png`
      encoder in a vectorized pandas UDF, then parsed back by the
      stdlib PNG decoder (chunk walk + CRC verify + inflate +
      scanline validation).  The oracle recomputes width/height AND
      the exact file byte count arithmetically
      (``h*(1+w*3) + 68`` for RGB-8 stored blocks), binding
      signature, chunk framing, and scanline layout; ``content_md5``
      is NULL on both sides (CRC words make the digest
      SQL-unreplayable — n_bytes+dims carry the binding instead);
    - ``frames``: frame-sampling fanout via byte-offset arithmetic
      (sequence+explode, pure column expressions).
    """
    from cdc_pipe_line_spark.multimodal import make_png

    @F.pandas_udf("binary")
    def _png_payload(w: pd.Series, h: pd.Series, fill: pd.Series) -> pd.Series:
        return pd.Series(
            [
                make_png(int(a), int(b), f.encode("ascii"))
                for a, b, f in zip(w, h, fill)
            ],
            dtype=object,
        )
    docs = _t(spark, sf_dir, "documents")
    null_l = F.lit(None).cast("bigint")
    null_s = F.lit(None).cast("string")
    meta = extract_media_meta(
        as_media_table(
            docs,
            id_col="doc_id",
            payload_col=F.col("text").cast("binary"),
            media_type="image/fake",
        )
    ).select(
        F.lit("meta").alias("probe"),
        "media_id", "media_type", "n_bytes", "content_md5", "width", "height",
        null_l.alias("frame_no"), null_l.alias("byte_offset"),
    )
    # Deterministic P6 payload: dims from byte length, pixel bytes from
    # a repeated md5 hex fill (ASCII, so string ops == byte ops in both
    # engines).  floor() keeps the repeat count engine-agnostic.
    ppm_src = docs.select(
        "doc_id",
        ((F.octet_length("text") % 64) + 1).alias("__w"),
        ((F.octet_length("text") % 48) + 1).alias("__h"),
        "text",
    ).withColumn("__npix", F.col("__w") * F.col("__h") * 3).withColumn(
        "__payload",
        F.concat(
            F.lit("P6\n"),
            F.col("__w").cast("string"), F.lit(" "), F.col("__h").cast("string"),
            F.lit("\n255\n"),
            F.expr(
                "substring(repeat(md5(text), cast(floor(__npix / 32) as int) + 1),"
                " 1, __npix)"
            ),
        ),
    )
    ppm = extract_media_meta(
        as_media_table(
            ppm_src,
            id_col="doc_id",
            payload_col=F.col("__payload").cast("binary"),
            media_type="image/ppm",
        )
    ).select(
        F.lit("ppm").alias("probe"),
        "media_id", "media_type", "n_bytes", "content_md5", "width", "height",
        null_l.alias("frame_no"), null_l.alias("byte_offset"),
    )
    png_src = docs.select(
        "doc_id",
        ((F.octet_length("text") % 64) + 1).alias("__w"),
        ((F.octet_length("text") % 48) + 1).alias("__h"),
        F.md5(F.col("text").cast("binary")).alias("__fill"),
    ).withColumn("__payload", _png_payload("__w", "__h", "__fill"))
    png = extract_media_meta(
        as_media_table(
            png_src,
            id_col="doc_id",
            payload_col="__payload",
            media_type="image/png",
        )
    ).select(
        F.lit("png").alias("probe"),
        "media_id", "media_type", "n_bytes",
        null_s.alias("content_md5"),
        "width", "height",
        null_l.alias("frame_no"), null_l.alias("byte_offset"),
    )
    frames = sample_frames(
        as_media_table(
            docs,
            id_col="doc_id",
            payload_col=F.col("text").cast("binary"),
            media_type="video/fake",
        ),
        every_n_bytes=1024,
        max_frames=8,
    ).select(
        F.lit("frames").alias("probe"),
        "media_id", "media_type",
        null_l.alias("n_bytes"), null_s.alias("content_md5"),
        null_l.alias("width"), null_l.alias("height"),
        F.col("frame_no").cast("bigint").alias("frame_no"), "byte_offset",
    )
    return meta.unionByName(ppm).unionByName(png).unionByName(frames)


def q_media_embed_knn(spark, sf_dir):
    """Multimodal -> ANN composition: binary payloads -> mapInPandas
    feature extraction (16-dim deterministic stand-in encoder) ->
    exact cosine top-5.  The full pipeline a media dedup/retrieval job
    runs, end-to-end oracle-checked."""
    docs = _t(spark, sf_dir, "documents")
    media = as_media_table(
        docs,
        id_col="doc_id",
        payload_col=F.col("text").cast("binary"),
        media_type="image/fake",
    )
    emb = embed_media(media, dim=16)
    q = emb.filter(F.col("media_id") % 100 == 0).select(
        F.col("media_id").alias("q_id"), "embedding"
    )
    return brute_force_topk(
        q, emb, query_id="q_id", corpus_id="media_id", k=5
    )


def q_media_embed_lsh(spark, sf_dir):
    """Scale-path twin of ``mm_media_embed_knn`` (VERDICT r7 item 6):
    the same binary-payload -> mapInPandas 16-dim encoder feed, but
    candidates come from hyperplane-LSH buckets instead of the q x n
    brute-force sweep — the corpus is hashed once (narrow), the only
    join is a bucket equi-join against the broadcast query set, and
    exact cosine re-ranks within the bucket.  Sublinear in corpus
    growth where the brute-force twin soaked x6.3 on 10x data; the
    DuckDB oracle replays the encoder, the plane projections, the
    bucket join and the re-rank end-to-end (no exact sweep anywhere —
    recall for this plane family is measured separately by
    ``dedup_lsh_recall``)."""
    from cdc_pipe_line_spark.similarity import lsh_topk

    docs = _t(spark, sf_dir, "documents")
    media = as_media_table(
        docs,
        id_col="doc_id",
        payload_col=F.col("text").cast("binary"),
        media_type="image/fake",
    )
    # Materialize the embedding once (the query side derives from the
    # corpus side — without the pin the mapInPandas encoder subtree
    # plans twice), and fan back out: AQE coalesces the tiny frame to
    # ~1 partition otherwise.
    emb = (
        embed_media(media, dim=16)
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(eager=True)
    )
    q = emb.filter(F.col("media_id") % 100 == 0).select(
        F.col("media_id").alias("q_id"), "embedding"
    )
    out = lsh_topk(
        q, emb, query_id="q_id", corpus_id="media_id",
        k=5, n_planes=6, dim=16,
    )
    return out.select(
        "q_id", "media_id", "cos_sim",
        F.col("rank").cast("bigint").alias("rank"),
    )


_COS = (
    "round(list_sum(list_transform(range(1, 65), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))) / "
    "(sqrt(list_sum(list_transform(range(1, 65), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)))) * "
    "sqrt(list_sum(list_transform(range(1, 65), "
    "i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))))), 4)"
)


def _lsh_bucket_sql(
    vec: str, *, dim: int = 64, n_planes: int = 6, seed: int = 42
) -> str:
    """DuckDB expression reproducing :func:`similarity.lsh_bucket` for
    the given plane config (default 64-dim, 6 planes, seed 42): the
    plane weights are the same 6-decimal literals Spark folds, and the
    dot product is the same left-to-right double sum, so the sign —
    hence the bucket id — matches exactly (verified corpus-wide at
    sf0.01/sf0.1)."""
    from cdc_pipe_line_spark.similarity import random_hyperplanes

    terms = []
    for i, plane in enumerate(random_hyperplanes(dim, n_planes, seed)):
        lits = ", ".join(repr(float(x)) for x in plane)
        terms.append(
            f"(CASE WHEN list_sum(list_transform(range(1, {dim + 1}), "
            f"j -> CAST({vec}[j] AS DOUBLE) * ([{lits}])[j])) > 0 "
            f"THEN {1 << i} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"

def q_range_search(spark, sf_dir):
    """Radius search: all corpus vectors with cosine >= 0.3 of each
    query vector, candidates via hyperplane-LSH buckets — the
    "retrieve everything similar" shape (contamination sweeps), fully
    oracle-replayed like ``sim_knn_lsh`` (same planes, same buckets,
    same rounded exact-cosine filter)."""
    from cdc_pipe_line_spark.similarity import lsh_range_search

    q, emb = _queries_and_corpus(spark, sf_dir)
    return lsh_range_search(q, emb, threshold=0.3, n_planes=6, dim=64)

def q_image_resize(spark, sf_dir):
    """Nearest-neighbor resize over REAL decoded netpbm pixels to a
    fixed 16x12 model-input raster: the image-preprocessing step of a
    multimodal pipeline.  The PPM payload is the same md5-fill
    construction as mm_media_pipeline's ppm probe, so the oracle
    replays every OUTPUT byte arithmetically (floor-index resample of
    the md5 hex stream) and binds the full pixel sum + both corners.
    Every 50th payload is truncated to the bare magic, pinning the
    quarantine leg (resize_err, never a task failure)."""
    from cdc_pipe_line_spark.multimodal import (
        as_media_table,
        resize_image_nearest,
    )

    docs = _t(spark, sf_dir, "documents")
    src = docs.select(
        "doc_id",
        ((F.octet_length("text") % 64) + 1).alias("__w"),
        ((F.octet_length("text") % 48) + 1).alias("__h"),
        "text",
    ).withColumn("__npix", F.col("__w") * F.col("__h") * 3).withColumn(
        "__payload",
        F.concat(
            F.lit("P6\n"),
            F.col("__w").cast("string"), F.lit(" "),
            F.col("__h").cast("string"),
            F.lit("\n255\n"),
            F.expr(
                "substring(repeat(md5(text), cast(floor(__npix / 32) as int) + 1),"
                " 1, __npix)"
            ),
        ).cast("binary"),
    ).withColumn(
        "__payload",
        F.when(
            F.col("doc_id") % 50 == 0, F.lit(b"P6")
        ).otherwise(F.col("__payload")),
    )
    media = as_media_table(
        src, id_col="doc_id", payload_col="__payload",
        media_type="image/ppm",
    )
    return resize_image_nearest(media, 16, 12)

def q_knn_pq(spark, sf_dir):
    """Product-quantization ADC top-10 — the compressed-domain ANN
    tier completing the FAISS-shaped stack (BF / LSH / IVF / SQ8 /
    IVF,SQ8 / PQ).  Codebook training seeds via xxhash sampling
    (deliberately not SQL-replicable), so the oracle binds through
    the sketch-query pattern like sim_knn_ivf: exact brute-force
    values DuckDB recomputes + recall boolean claims the PQ path
    must uphold — per-query recall@10 >= 0.2, corpus-wide mean
    >= 0.5 (measured: 0.82 at sf0.01, 0.68 at sf1 with the 5%
    corpus-proportional shortlist), and <= k rows per query."""
    from cdc_pipe_line_spark.similarity import pq_topk

    q, emb = _queries_and_corpus(spark, sf_dir)
    pq = pq_topk(q, emb, k=10, shortlist=100, shortlist_frac=0.05)
    exact = brute_force_topk(q, emb, k=10)
    hits = (
        pq.select("q_id", "vec_id")
        .join(exact.select("q_id", "vec_id"), ["q_id", "vec_id"], "left_semi")
        .groupBy("q_id")
        .agg(F.count("*").alias("__n_hit"))
    )
    n_pq = pq.groupBy("q_id").agg(F.count("*").alias("__n_pq"))
    per_q = (
        exact.groupBy("q_id")
        .agg(
            F.max(F.when(F.col("rank") == 1, F.col("vec_id"))).alias(
                "exact_top1_id"
            ),
            F.max(F.when(F.col("rank") == 1, F.col("cos_sim"))).alias(
                "exact_top1_sim"
            ),
            F.round(F.sum("cos_sim"), 4).alias("exact_top10_sim_sum"),
            F.count("*").alias("__n_exact"),
        )
        .join(hits, "q_id", "left")
        .join(n_pq, "q_id", "left")
        .withColumn(
            "__recall",
            F.coalesce(F.col("__n_hit"), F.lit(0)) / F.col("__n_exact"),
        )
    )
    mean_ok = per_q.agg(
        (F.avg("__recall") >= 0.5).alias("mean_recall10_ge_05")
    )
    return (
        per_q.crossJoin(F.broadcast(mean_ok))
        .select(
            "q_id",
            "exact_top1_id",
            "exact_top1_sim",
            "exact_top10_sim_sum",
            (F.col("__recall") >= 0.2).alias("recall10_ge_02"),
            "mean_recall10_ge_05",
            (F.coalesce(F.col("__n_pq"), F.lit(0)) <= 10).alias("pq_le_k"),
        )
    )

def q_audio_decimate(spark, sf_dir):
    """Frame decimation (every 4th frame) over the same square-wave
    WAV fixtures as mm_audio_stats: |sample| == amp everywhere, so
    the decimated RMS and peak stay EXACTLY amp and the oracle binds
    the whole numpy path arithmetically; frames are multiples of 16
    so out_frames = in_frames / 4 exactly.  Truncated payloads (every
    50th) exercise the quarantine leg."""

    @F.pandas_udf("binary")
    def _wav_payload2(
        frames: pd.Series, amp: pd.Series, ch: pd.Series, cut: pd.Series
    ) -> pd.Series:
        out = []
        for f, a, c, kk in zip(frames, amp, ch, cut):
            b = make_wav(int(f), int(a), channels=int(c))
            out.append(b[:-3] if kk else b)
        return pd.Series(out, dtype=object)

    from cdc_pipe_line_spark.multimodal import decimate_audio

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (((F.col("doc_id") % 40) + 1) * 16).alias("__frames"),
        ((F.col("doc_id") % 2000) + 1).alias("__amp"),
        (1 + (F.col("doc_id") % 2)).alias("__ch"),
        (F.col("doc_id") % 50 == 0).alias("__cut"),
    )
    media = as_media_table(
        docs,
        id_col="doc_id",
        payload_col=_wav_payload2("__frames", "__amp", "__ch", "__cut"),
        media_type="audio/wav",
    )
    return decimate_audio(media, k=4)



def q_jpeg_decode(spark, sf_dir):
    """JPEG through the REAL baseline decoder (huffman entropy decode
    + dequantize + inverse zigzag + IDCT — multimodal.make_jpeg_gray /
    _jpeg_gray_pixels): every document becomes a genuine Annex-K
    baseline JFIF whose 8x8 blocks are per-block constants
    ``base + 2*(b % 5)`` (even values, uniform quant 16, so DC
    quantization is LOSSLESS and the decoded raster equals the
    encoded pattern exactly — the encode side still walks DC
    prediction across magnitude categories, EOB coding, byte
    stuffing and bit padding, and the decode side undoes all of it
    plus the IDCT).  Pixel stats are therefore closed-form in
    doc_id, which is what the oracle replays; every 43rd payload is
    cut inside the APP0 segment for the deterministic quarantine
    leg.  The general-content path (dense ACs, ZRL runs, clipping)
    is pinned in tests/test_multimodal_codec.py against an
    independent numpy quant-roundtrip reference."""
    import numpy as np

    @F.pandas_udf("binary")
    def _jpeg_payload(
        w: pd.Series, h: pd.Series, base: pd.Series, cut: pd.Series
    ) -> pd.Series:
        out = []
        for a, b, v0, k in zip(w, h, base, cut):
            a, b, v0 = int(a), int(b), int(v0)
            arr = np.zeros((b, a), dtype=np.uint8)
            blk = 0
            for by in range(b // 8):
                for bx in range(a // 8):
                    arr[
                        by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                    ] = v0 + 2 * (blk % 5)
                    blk += 1
            enc = make_jpeg_gray(arr)
            out.append(enc[:20] if k else enc)
        return pd.Series(out, dtype=object)

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (8 * ((F.col("doc_id") % 3) + 1)).alias("__w"),
        (8 * ((F.col("doc_id") % 2) + 1)).alias("__h"),
        (100 + 2 * (F.col("doc_id") % 20)).alias("__base"),
        (F.col("doc_id") % 43 == 0).alias("__cut"),
    )
    media = as_media_table(
        docs,
        id_col="doc_id",
        payload_col=_jpeg_payload("__w", "__h", "__base", "__cut"),
        media_type="image/jpeg",
    )
    return jpeg_gray_stats(media)




def q_jpeg_restart_decode(spark, sf_dir):
    """JPEG DRI/RSTn restart-interval scans through the REAL baseline
    decoder (VERDICT r7 item 7, oracle-green leg): every document
    becomes a genuine JFIF whose scan is split into byte-aligned
    restart segments — interval ``(doc_id % 3) + 1`` MCUs, so the
    corpus exercises every-MCU, mid-row and row-spanning restarts with
    D0..D7 marker cycling and per-segment DC prediction resets (the
    error-resilience structure cameras write).  The decoded raster is
    identical to the non-DRI encoding of the same blocks, so the
    closed-form pixel stats replay in SQL; every 47th payload is cut
    inside the APP0 segment for the quarantine leg.  Marker-sequence
    and segment-count violations are pinned in
    tests/test_multimodal_codec.py."""
    import numpy as np

    @F.pandas_udf("binary")
    def _jpeg_payload(
        w: pd.Series, h: pd.Series, base: pd.Series,
        ri: pd.Series, cut: pd.Series,
    ) -> pd.Series:
        out = []
        for a, b, v0, r, k in zip(w, h, base, ri, cut):
            a, b, v0 = int(a), int(b), int(v0)
            arr = np.zeros((b, a), dtype=np.uint8)
            blk = 0
            for by in range(b // 8):
                for bx in range(a // 8):
                    arr[
                        by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                    ] = v0 + 2 * (blk % 5)
                    blk += 1
            enc = make_jpeg_gray(arr, restart_interval=int(r))
            out.append(enc[:20] if k else enc)
        return pd.Series(out, dtype=object)

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (8 * ((F.col("doc_id") % 4) + 1)).alias("__w"),
        (8 * ((F.col("doc_id") % 2) + 1)).alias("__h"),
        (100 + 2 * (F.col("doc_id") % 20)).alias("__base"),
        ((F.col("doc_id") % 3) + 1).alias("__ri"),
        (F.col("doc_id") % 47 == 0).alias("__cut"),
    )
    media = as_media_table(
        docs,
        id_col="doc_id",
        payload_col=_jpeg_payload("__w", "__h", "__base", "__ri", "__cut"),
        media_type="image/jpeg",
    )
    return jpeg_gray_stats(media)


def q_jpeg_progressive_dc(spark, sf_dir):
    """PROGRESSIVE JPEG through the DC-scan preview decoder
    (VERDICT r8 item 5's carried decode leg, closed in round 11):
    every document becomes a genuine SOF2 file whose FIRST scan — the
    DC scan (Ss=Se=0, Ah=0, Al=0), the layout every progressive
    encoder leads with — is entropy-decoded into the 1/8-scale
    preview (a DC-only block inverse-transforms to the uniform value
    DC/8 + 128).  Blocks are per-block constants ``base + 2*(b % 5)``
    with even values and uniform quant 16, so DC quantization is
    LOSSLESS and each preview pixel equals its block's constant
    exactly — preview stats are closed-form in doc_id, which the
    oracle replays; every 53rd payload is cut inside the APP0 segment
    for the quarantine leg.  The point-transform (Al=1) and
    scan-order/error legs are pinned in
    tests/test_multimodal_codec.py.

    Scale shape: one Arrow-batched mapInPandas pass, one narrow row
    per image, no shuffle — the triage-then-preview tier a crawl
    needs for the progressive payloads the baseline decoder routes
    away."""
    import numpy as np

    @F.pandas_udf("binary")
    def _payload(
        w: pd.Series, h: pd.Series, base: pd.Series, cut: pd.Series
    ) -> pd.Series:
        out = []
        for a, b, v0, k in zip(w, h, base, cut):
            a, b, v0 = int(a), int(b), int(v0)
            arr = np.zeros((b, a), dtype=np.uint8)
            blk = 0
            for by in range(b // 8):
                for bx in range(a // 8):
                    arr[
                        by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                    ] = v0 + 2 * (blk % 5)
                    blk += 1
            enc = make_jpeg_gray_progressive(arr)
            out.append(enc[:20] if k else enc)
        return pd.Series(out, dtype=object)

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (8 * ((F.col("doc_id") % 3) + 1)).alias("__w"),
        (8 * ((F.col("doc_id") % 2) + 1)).alias("__h"),
        (100 + 2 * (F.col("doc_id") % 20)).alias("__base"),
        (F.col("doc_id") % 53 == 0).alias("__cut"),
    )
    media = as_media_table(
        docs,
        id_col="doc_id",
        payload_col=_payload("__w", "__h", "__base", "__cut"),
        media_type="image/jpeg",
    )
    return jpeg_dc_preview_stats(media)


def q_jpeg_scan_triage(spark, sf_dir):
    """Header-tier JPEG routing over a corpus mixing ALL FOUR coding
    processes (VERDICT r8 item 5's classify leg): each document's
    JFIF is re-marked by ``doc_id % 4`` to baseline / progressive
    (SOF2) / extended (SOF1) / lossless (SOF3) — the SOF payload
    layout is identical across them, so the rewrite produces
    structurally-valid frames of every class — and every 41st payload
    is cut inside the header for the malformed leg.  The triage pass
    publishes scan class, dimensions, a ``decodable`` verdict and an
    EXPLICIT quarantine reason (``non-baseline scan: extended`` /
    ``jpeg: truncated before SOF marker``), all closed-form in
    doc_id, so the oracle replays routing AND both quarantine legs.
    Since round 11 the progressive class routes DECODABLE (the
    engine carries a full SOF2 decode — ``mm_jpeg_progressive_decode``);
    extended/lossless still quarantine."""
    import numpy as np

    from cdc_pipe_line_spark.multimodal import jpeg_scan_triage

    _SOF = {0: b"\xc0", 1: b"\xc2", 2: b"\xc1", 3: b"\xc3"}

    @F.pandas_udf("binary")
    def _jpeg_payload(
        w: pd.Series, h: pd.Series, cls: pd.Series, cut: pd.Series
    ) -> pd.Series:
        out = []
        for a, b, c, k in zip(w, h, cls, cut):
            arr = np.full((int(b), int(a)), 120, dtype=np.uint8)
            enc = make_jpeg_gray(arr)
            i = enc.index(b"\xff\xc0")
            enc = enc[: i + 1] + _SOF[int(c)] + enc[i + 2 :]
            out.append(enc[:20] if k else enc)
        return pd.Series(out, dtype=object)

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (8 * ((F.col("doc_id") % 3) + 1)).alias("__w"),
        (8 * ((F.col("doc_id") % 2) + 1)).alias("__h"),
        (F.col("doc_id") % 4).alias("__cls"),
        (F.col("doc_id") % 41 == 0).alias("__cut"),
    )
    media = as_media_table(
        docs,
        id_col="doc_id",
        payload_col=_jpeg_payload("__w", "__h", "__cls", "__cut"),
        media_type="image/jpeg",
    )
    return jpeg_scan_triage(media)


def q_pca_power_iteration(spark, sf_dir):
    """Top PRINCIPAL COMPONENT of the embedding corpus by power
    iteration — the PCA pass embedding pipelines run before
    whitening, SemDeDup preprocessing, or index training.  Two
    stages, each engine-replayable:

    1. DISTRIBUTED second-moment matrix: embeddings are quantized to
       integer millis (exact, order-free sums — the float-sum
       order-dependence trap never arises), one posexplode self-join
       + hash-agg produces the 64x64 integer co-moment and mean
       sums, and the centered covariance lands as EXACT integer
       micro-units via ``(2*(n*Sxy - Sx*Sy) + n*n) div (2*n*n)``.
    2. Bounded iteration: five power-iteration steps on the 64x64
       matrix (matvec as a cells⋈vector join + hash-agg per step —
       vocabulary-sized), components floor-pinned to 8dp after each
       normalization (the pagerank float discipline; sqrt is
       IEEE-safe) so both engines fold identical doubles.

    Published: the 64 components at 6dp plus the Rayleigh-quotient
    eigenvalue at 4dp.  Scale note: int64 co-moments hold to ~1e8
    rows per partition-merge at milli quantization; beyond that the
    same shape runs hierarchically (per-shard moments are mergeable
    by construction)."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.posexplode(
            F.expr(
                "transform(embedding,"
                " x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT))"
            )
        ).alias("pos", "q"),
    ).localCheckpoint(eager=True)  # feeds the self-join + mean sums
    n = emb.select("vec_id").distinct().count()
    cells = (
        emb.alias("a")
        .join(emb.alias("b"), "vec_id")
        .groupBy(
            F.col("a.pos").alias("i"), F.col("b.pos").alias("j")
        )
        .agg(F.sum(F.col("a.q") * F.col("b.q")).alias("sxy"))
    )
    means = emb.groupBy("pos").agg(F.sum("q").alias("sx"))
    cov = (
        cells.join(
            F.broadcast(means.select(F.col("pos").alias("i"), F.col("sx").alias("sxi"))),
            "i",
        )
        .join(
            F.broadcast(means.select(F.col("pos").alias("j"), F.col("sx").alias("sxj"))),
            "j",
        )
        .select(
            "i",
            "j",
            F.expr(
                f"(2 * ({n} * sxy - sxi * sxj) + {n} * {n})"
                f" div (2 * {n} * {n})"
            ).alias("c_micro"),
        )
        .localCheckpoint(eager=True)  # 64x64, reused every iteration
    )
    dim = 64
    v = [1.0 / dim] * dim
    pin8 = lambda c: F.floor(c * 1e8 + F.lit(0.5)) / 1e8  # noqa: E731
    for _ in range(5):
        varr = F.array(*[F.lit(x) for x in v])
        u = (
            cov.select(
                "i",
                (
                    (F.col("c_micro") / 1e6)
                    * F.element_at(varr, F.col("j").cast("int") + 1)
                ).alias("t"),
            )
            .groupBy("i")
            .agg(F.sum("t").alias("u"))
        )
        nrm = u.agg(
            F.sqrt(F.sum(F.col("u") * F.col("u"))).alias("nn")
        )
        rows = (
            u.crossJoin(F.broadcast(nrm))
            .select("i", pin8(F.col("u") / F.col("nn")).alias("v"))
            .collect()  # bounded: 64 rows
        )
        nxt = [0.0] * dim
        for r in rows:
            nxt[int(r["i"])] = float(r["v"])
        v = nxt
    varr = F.array(*[F.lit(x) for x in v])
    lam = (
        cov.select(
            (
                (F.col("c_micro") / 1e6)
                * F.element_at(varr, F.col("i").cast("int") + 1)
                * F.element_at(varr, F.col("j").cast("int") + 1)
            ).alias("t")
        )
        .agg((F.floor(F.sum("t") * 1e4 + F.lit(0.5)) / 1e4).alias("lam"))
    )
    comps = spark.createDataFrame(
        [(i, v[i]) for i in range(dim)], "pos bigint, comp double"
    ).select("pos", (F.floor(F.col("comp") * 1e6 + F.lit(0.5)) / 1e6).alias("comp_6dp"))
    return comps.crossJoin(F.broadcast(lam)).select(
        "pos", "comp_6dp", F.col("lam").alias("lambda_4dp")
    )


def q_exif_gps(spark, sf_dir):
    """EXIF GPS through the NESTED sub-IFD walk — the two TIFF legs
    the orientation query doesn't reach: a pointer entry (GPSInfo
    0x8825) whose value is the offset of a SECOND IFD, and
    RATIONAL[3] deg/min/sec arrays folded to integer micro-arcseconds
    exactly (cross-multiplied; fixture denominators divide out).
    Hemisphere refs, both byte orders (Intel on even ids, Motorola on
    odd), all fields closed-form in doc_id; every 53rd payload plants
    an out-of-range GPS pointer and quarantines with the precise
    reason — the geo-metadata pass a media pipeline runs before any
    location-based filtering or deduplication."""
    from cdc_pipe_line_spark.multimodal import exif_gps, make_exif_gps_app1

    @F.pandas_udf("binary")
    def _payload(
        lat_d: pd.Series, lat_m: pd.Series, lat_s: pd.Series,
        lon_d: pd.Series, lon_m: pd.Series, lon_s: pd.Series,
        flags: pd.Series,
    ) -> pd.Series:
        out = []
        for a, b, c, d, e, f, fl in zip(
            lat_d, lat_m, lat_s, lon_d, lon_m, lon_s, flags
        ):
            fl = int(fl)
            app1 = make_exif_gps_app1(
                int(a), int(b), int(c),
                "N" if fl & 1 else "S",
                int(d), int(e), int(f),
                "E" if fl & 2 else "W",
                little_endian=bool(fl & 4),
                break_pointer=bool(fl & 8),
            )
            out.append(b"\xff\xd8" + app1 + b"\xff\xd9")
        return pd.Series(out, dtype=object)

    d = F.col("doc_id")
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (d % 90).alias("__lat_d"),
        (d % 60).alias("__lat_m"),
        ((d * 37) % 60000).alias("__lat_s"),
        (d % 180).alias("__lon_d"),
        ((d * 7) % 60).alias("__lon_m"),
        ((d * 53) % 60000).alias("__lon_s"),
        (
            (d % 2)
            + 2 * ((d % 3 == 0).cast("int"))
            + 4 * ((d % 4 < 2).cast("int"))
            + 8 * ((d % 53 == 0).cast("int"))
        ).alias("__flags"),
    )
    media = as_media_table(
        docs,
        id_col="doc_id",
        payload_col=_payload(
            "__lat_d", "__lat_m", "__lat_s",
            "__lon_d", "__lon_m", "__lon_s", "__flags",
        ),
        media_type="image/jpeg",
    )
    return exif_gps(media)


def q_audio_period_scan(spark, sf_dir):
    """Square-wave matched-filter PERIOD DETECTION over real PCM
    WAVs: each document becomes a 240-sample square wave whose period
    cycles {2,4,6,8} frames by doc_id, and the filter bank
    (:func:`multimodal.audio_period_scan`) must recover exactly that
    period — correlations against all four ±1 references are pure
    int64 dots, so the oracle replays the ENTIRE bank (signal,
    references, argmax with smallest-period tie-break) closed-form in
    doc_id.  Every 43rd payload is cut inside the data chunk for the
    quarantine leg.  The pitch-detection shape every audio curation
    pipeline runs before resampling decisions, with the FFT's
    libm-dependence replaced by exact arithmetic."""
    import numpy as np

    from cdc_pipe_line_spark.multimodal import audio_period_scan, make_wav

    @F.pandas_udf("binary")
    def _wav_payload(
        per: pd.Series, amp: pd.Series, cut: pd.Series
    ) -> pd.Series:
        out = []
        for p, a, k in zip(per, amp, cut):
            enc = make_wav(240, int(a), period=int(p))
            out.append(enc[:60] if k else enc)
        return pd.Series(out, dtype=object)

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (2 * ((F.col("doc_id") % 4) + 1)).alias("__per"),
        (100 + (F.col("doc_id") % 50)).alias("__amp"),
        (F.col("doc_id") % 43 == 0).alias("__cut"),
    )
    media = as_media_table(
        docs,
        id_col="doc_id",
        payload_col=_wav_payload("__per", "__amp", "__cut"),
        media_type="audio/wav",
    )
    return audio_period_scan(media)


def q_png_filter_decode(spark, sf_dir):
    """PNG through REAL pixel reconstruction (CRC-verified chunk walk,
    bounded inflate, and full scanline UNFILTERING — the fixture
    cycles all five filter types by row, so None/Sub/Up/Average/Paeth
    all decode corpus-wide, including the Paeth predictor's
    tie-breaking).  Pixels are the closed-form gradient
    ``(base + 3x + 7y) % 256``, so the oracle replays the raster
    stats exactly; every 59th payload carries a corrupted IDAT CRC
    and quarantines with the precise chunk-level reason (integrity
    checking is the operator, not a by-product)."""
    import numpy as np

    from cdc_pipe_line_spark.multimodal import make_png_gray, png_gray_stats

    @F.pandas_udf("binary")
    def _png_payload(
        w: pd.Series, h: pd.Series, base: pd.Series, cut: pd.Series
    ) -> pd.Series:
        out = []
        for a, b, v0, k in zip(w, h, base, cut):
            a, b, v0 = int(a), int(b), int(v0)
            xs = np.arange(a, dtype=np.int64)
            ys = np.arange(b, dtype=np.int64)
            arr = ((v0 + 3 * xs[None, :] + 7 * ys[:, None]) % 256).astype(
                np.uint8
            )
            enc = make_png_gray(arr)
            if k:
                i = 33 + 8  # first IDAT body byte
                enc = enc[:i] + bytes([enc[i] ^ 0xFF]) + enc[i + 1 :]
            out.append(enc)
        return pd.Series(out, dtype=object)

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        ((F.col("doc_id") % 24) + 4).alias("__w"),
        ((F.col("doc_id") % 10) + 5).alias("__h"),
        (F.col("doc_id") % 100).alias("__base"),
        (F.col("doc_id") % 59 == 0).alias("__cut"),
    )
    media = as_media_table(
        docs,
        id_col="doc_id",
        payload_col=_png_payload("__w", "__h", "__base", "__cut"),
        media_type="image/png",
    )
    return png_gray_stats(media)


def q_exif_orientation(spark, sf_dir):
    """EXIF orientation extraction over genuine APP1/TIFF bytes — the
    metadata tier every image pipeline reads BEFORE pixel work (the
    rotation-normalization pass): marker walk to APP1, TIFF
    byte-order dispatch (Intel 'II' on even ids, Motorola 'MM' on
    odd — both wire formats cameras ship), IFD0 entry scan for tag
    0x0112.  Orientation cycles all 8 EXIF values by doc_id; every
    53rd payload carries a corrupt TIFF byte-order mark and
    quarantines with a precise reason.  Closed-form in doc_id, so the
    oracle replays field extraction AND the quarantine leg."""
    import numpy as np

    from cdc_pipe_line_spark.multimodal import make_exif_app1

    base_img = make_jpeg_gray(
        (np.arange(64, dtype=np.int64).reshape(8, 8) * 2 % 256).astype(
            np.uint8
        )
    )
    bad_app1 = (
        b"\xff\xe1"
        + __import__("struct").pack(">H", 2 + 6 + 8)
        + b"Exif\x00\x00"
        + b"XX\x00\x2a\x00\x00\x00\x08"
    )

    @F.pandas_udf("binary")
    def _payload(o: pd.Series, le: pd.Series, cut: pd.Series) -> pd.Series:
        out = []
        for a, b, k in zip(o, le, cut):
            app1 = bad_app1 if k else make_exif_app1(
                int(a), little_endian=bool(b)
            )
            out.append(base_img[:2] + app1 + base_img[2:])
        return pd.Series(out, dtype=object)

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        ((F.col("doc_id") % 8) + 1).alias("__o"),
        (F.col("doc_id") % 2 == 0).alias("__le"),
        (F.col("doc_id") % 53 == 0).alias("__cut"),
    )
    media = as_media_table(
        docs,
        id_col="doc_id",
        payload_col=_payload("__o", "__le", "__cut"),
        media_type="image/jpeg",
    )
    from cdc_pipe_line_spark.multimodal import exif_orientation

    return exif_orientation(media)


def q_jpeg_color_decode(spark, sf_dir):
    """Color JPEG through the REAL baseline 4:2:0 decoder
    (MCU-interleaved huffman entropy decode + per-component
    dequantize/IDCT + nearest-neighbor chroma upsample + BT.601
    YCbCr->RGB — multimodal.make_jpeg_color / _jpeg_color_pixels;
    round 7 closes VERDICT r6 item 7, extending round 6's grayscale
    decode to chroma).  Every document becomes a genuine interleaved
    JFIF whose YCbCr planes are per-MCU constants in doc_id (even
    values, uniform quant 16 -> DC quantization lossless), so the
    decoded RGB is closed-form: the oracle replays the SAME
    ``floor(x + 0.5)`` BT.601 doubles per MCU.  Every 41st payload is
    cut inside the APP0 segment for the quarantine leg.  General
    content (dense ACs, chroma clipping) is pinned in
    tests/test_multimodal_codec.py against an independent numpy
    quant-roundtrip reference."""
    import numpy as np

    @F.pandas_udf("binary")
    def _payload(
        w: pd.Series, h: pd.Series, seed: pd.Series, cut: pd.Series
    ) -> pd.Series:
        out = []
        for a, b, d, k in zip(w, h, seed, cut):
            a, b, d = int(a), int(b), int(d)
            y = np.zeros((b, a), np.uint8)
            cb = np.zeros((b // 2, a // 2), np.uint8)
            cr = np.zeros((b // 2, a // 2), np.uint8)
            m = 0
            for my in range(b // 16):
                for mx in range(a // 16):
                    y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = (
                        100 + 2 * ((d + m) % 20)
                    )
                    cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = (
                        90 + 4 * ((d + m) % 10)
                    )
                    cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = (
                        120 + 2 * ((d + 3 * m) % 15)
                    )
                    m += 1
            enc = make_jpeg_color(y, cb, cr)
            out.append(enc[:20] if k else enc)
        return pd.Series(out, dtype=object)

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (16 * ((F.col("doc_id") % 2) + 1)).alias("__w"),
        (16 * ((F.col("doc_id") % 3) + 1)).alias("__h"),
        F.col("doc_id").alias("__seed"),
        (F.col("doc_id") % 41 == 0).alias("__cut"),
    )
    media = as_media_table(
        docs,
        id_col="doc_id",
        payload_col=_payload("__w", "__h", "__seed", "__cut"),
        media_type="image/jpeg",
    )
    return jpeg_color_stats(media)




def q_semantic_dedup(spark, sf_dir):
    """SemDeDup semantic dedup (Abbas et al. 2023): cluster the
    embedding space (deterministic hash-ranked centroids, budget
    ceil(sqrt(n)) so the broadcast side is SUBLINEAR in the corpus —
    VERDICT r7) and emit near-dup pairs only WITHIN clusters —
    assignment n x sqrt(n) cosines, expected cluster size sqrt(n), so
    total candidate work O(n^1.5), never O(n^2) and never a
    corpus-sized broadcast.  Threshold 0.35 ~= the tail of the
    within-cluster cosine distribution in the synthetic embeddings
    (no true semantic dups planted), keeping the output non-trivial;
    production uses ~0.95 plus Lloyd-refined centroids.  Per-cluster
    sizes, pair counts, drop counts and an id checksum are the
    oracle-checked output, so cluster skew is measured, not
    assumed."""
    emb = _t(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, threshold=0.35)




def q_video_scene_cuts(spark, sf_dir):
    """Container-level scene-cut detection over real ISO-BMFF sample
    tables: keyframes (every 10th sample, +40 bytes — the I-frame
    size signature) are planted in the fixture MP4s, mp4_sample_index
    parses the genuine stsz/stco/stsc layout, and scene_cuts flags
    size jumps >= 30 bytes — the decode-nothing frame-sampling
    heuristic of a video training-data pipeline (only flagged byte
    ranges would be pixel-decoded downstream).  Sizes are closed-form
    in doc_id so the oracle replays the parse AND the lag-window cut
    logic; every 43rd payload loses its mdat body and quarantines."""
    from cdc_pipe_line_spark.multimodal import scene_cuts

    @F.pandas_udf("binary")
    def _mp4_payload(
        n: pd.Series, base: pd.Series, cut: pd.Series
    ) -> pd.Series:
        out = []
        for a, b, k in zip(n, base, cut):
            m = make_mp4_sampled(
                int(a), int(b), seed=int(a) * 3 + int(b),
                keyframe_every=10, keyframe_extra=40,
            )
            out.append(m[: 132 + 4 * int(a)] if k else m)
        return pd.Series(out, dtype=object)

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        ((F.col("doc_id") % 25) + 12).alias("__n"),
        ((F.col("doc_id") % 50) + 10).alias("__base"),
        (F.col("doc_id") % 43 == 0).alias("__cut"),
    )
    media = as_media_table(
        docs,
        id_col="doc_id",
        payload_col=_mp4_payload("__n", "__base", "__cut"),
        media_type="video/mp4",
    )
    return scene_cuts(mp4_sample_index(media), threshold=30)




def q_image_dhash_dedup(spark, sf_dir):
    """Perceptual image dedup: dHash (difference hash) over REAL
    decoded PPM rasters, candidate pairs via the banded Hamming
    engine (pigeonhole recall 1.0, never all-pairs on the Spark
    side).  Fixture images render a modular gradient
    ``v(x, y) = ((a*x + b*y) % 16) * 12 + c`` (r=g=b): 16 (a, b)
    pattern classes, with ``c`` a per-doc brightness offset that
    dHash provably IGNORES (comparisons are invariant to adding a
    constant) — the perceptual property exact byte hashing lacks,
    pinned by the oracle which replays hash construction from the
    closed form and verifies pairs ALL-PAIRS with bit_count(xor).
    Every 37th payload truncates mid-raster and quarantines.
    Output: per-Hamming pair census + quarantine census (id
    checksums bind membership)."""
    from cdc_pipe_line_spark.multimodal import dhash_images
    from cdc_pipe_line_spark.text import hamming_pairs

    @F.pandas_udf("binary")
    def _ppm(
        a: pd.Series, b: pd.Series, c: pd.Series, cut: pd.Series
    ) -> pd.Series:
        import numpy as np

        out = []
        w, h = 36, 24
        for av, bv, cv, k in zip(a, b, c, cut):
            av, bv, cv = int(av), int(bv), int(cv)
            x = np.arange(w)
            y = np.arange(h)
            v = ((av * x[None, :] + bv * y[:, None]) % 16) * 12 + cv
            rgb = np.repeat(v.astype(np.uint8)[:, :, None], 3, axis=2)
            payload = b"P6\n36 24\n255\n" + rgb.tobytes()
            out.append(payload[: len(payload) // 2] if k else payload)
        return pd.Series(out, dtype=object)

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (1 + F.col("doc_id") % 4).alias("__a"),
        (1 + (F.col("doc_id") / 4).cast("bigint") % 4).alias("__b"),
        (40 * (F.col("doc_id") % 2)).alias("__c"),
        (F.col("doc_id") % 37 == 0).alias("__cut"),
    )
    media = as_media_table(
        docs,
        id_col="doc_id",
        payload_col=_ppm("__a", "__b", "__c", "__cut"),
        media_type="image/x-portable-pixmap",
    )
    hashed = dhash_images(media, id_col="media_id").localCheckpoint(
        eager=True
    )
    # 100 TB shape: NEVER enumerate pairs of identical images.  The
    # corpus collapses to DISTINCT hash values with (count, id-sum)
    # group stats — at any scale this frame is |distinct dhash| rows —
    # and the census derives arithmetically: within-group (Hamming 0)
    # pairs are C(n,2) with each id counted (n-1) times; cross-group
    # pairs go through the banded engine over the DISTINCT hashes and
    # weight by count products.  Naive pair enumeration measured
    # 25.2 s / x13 superlinear at sf1 (class sizes x10 -> pairs x100);
    # this form is O(distinct hashes) after the group-by.
    groups = (
        hashed.filter(F.col("dhash").isNotNull())
        .groupBy("dhash")
        .agg(
            F.count("*").alias("n"),
            F.sum("media_id").alias("sid"),
        )
        .localCheckpoint(eager=True)
    )
    within = groups.agg(
        F.lit(0).alias("hamming"),
        F.sum(F.col("n") * (F.col("n") - 1) / 2).cast("bigint").alias("n"),
        F.sum((F.col("n") - 1) * F.col("sid")).alias("id_sum"),
    ).filter(F.col("n") > 0)
    hp = hamming_pairs(
        groups.select(F.col("dhash").alias("id"), F.col("dhash").alias("h")),
        id_col="id",
        hash_col="h",
        max_hamming=3,
    ).filter(F.col("hamming") > 0)
    ga = groups.select(
        F.col("dhash").alias("id_a"),
        F.col("n").alias("n_a"),
        F.col("sid").alias("sid_a"),
    )
    gb = groups.select(
        F.col("dhash").alias("id_b"),
        F.col("n").alias("n_b"),
        F.col("sid").alias("sid_b"),
    )
    cross = (
        hp.join(ga, "id_a")
        .join(gb, "id_b")
        .groupBy("hamming")
        .agg(
            F.sum(F.col("n_a") * F.col("n_b")).alias("n"),
            F.sum(
                F.col("n_b") * F.col("sid_a") + F.col("n_a") * F.col("sid_b")
            ).alias("id_sum"),
        )
    )
    census = within.unionByName(cross).select(
        F.lit("pairs").alias("probe"),
        F.col("hamming").cast("int").alias("hamming"),
        "n",
        "id_sum",
    )
    quar = hashed.filter(F.col("decode_err").isNotNull()).agg(
        F.lit("quarantined").alias("probe"),
        F.lit(None).cast("int").alias("hamming"),
        F.count("*").alias("n"),
        F.sum("media_id").alias("id_sum"),
    )
    return census.unionByName(quar)




def q_audio_vad_segments(spark, sf_dir):
    """VAD-lite speech segmentation — the audio-pipeline preprocessing
    step that splits a recording into voiced segments before
    transcription/training: real PCM decode -> per-64-frame-window
    RMS (numpy, Arrow-batched) -> threshold -> gaps-and-islands
    segment assembly in keyed Spark windows.  Fixture WAVs plant
    silence window-aligned (``make_wav_gated``: active iff
    ``j % period < period - 1``), so window RMS is EXACTLY amp or 0
    and the oracle replays windowing, thresholding AND the island
    fold closed-form.  Every 37th payload truncates mid-PCM and
    quarantines."""
    from pyspark.sql.window import Window

    from cdc_pipe_line_spark.multimodal import (
        audio_window_rms,
        make_wav_gated,
    )

    @F.pandas_udf("binary")
    def _wav(
        n: pd.Series, amp: pd.Series, period: pd.Series, cut: pd.Series
    ) -> pd.Series:
        out = []
        for nv, av, pv, k in zip(n, amp, period, cut):
            w = make_wav_gated(
                int(nv), int(av), block=64, period=int(pv),
                active=int(pv) - 1,
            )
            out.append(w[: len(w) // 2] if k else w)
        return pd.Series(out, dtype=object)

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (64 * ((F.col("doc_id") % 20) + 4)).alias("__n"),
        ((F.col("doc_id") % 2000) + 1).alias("__amp"),
        (2 + F.col("doc_id") % 3).alias("__period"),
        (F.col("doc_id") % 37 == 0).alias("__cut"),
    )
    media = as_media_table(
        docs,
        id_col="doc_id",
        payload_col=_wav("__n", "__amp", "__period", "__cut"),
        media_type="audio/wav",
    )
    wins = audio_window_rms(media, window=64).localCheckpoint(eager=True)
    w_prev = Window.partitionBy("media_id").orderBy("win_id")
    flagged = (
        wins.filter(F.col("win_id").isNotNull())
        .withColumn("active", (F.col("rms_milli") > 0).cast("bigint"))
        .withColumn(
            "new_seg",
            (
                (F.col("active") == 1)
                & (
                    F.coalesce(
                        F.lag("active").over(w_prev), F.lit(0)
                    )
                    == 0
                )
            ).cast("bigint"),
        )
    )
    good = flagged.groupBy("media_id").agg(
        F.count("*").alias("n_windows"),
        F.sum("active").alias("n_active"),
        F.sum("new_seg").alias("n_segments"),
        F.max("rms_milli").alias("peak_rms_milli"),
        F.lit(None).cast("string").alias("decode_err"),
    )
    quar = (
        wins.filter(F.col("win_id").isNull())
        .select(
            "media_id",
            F.lit(None).cast("bigint").alias("n_windows"),
            F.lit(None).cast("bigint").alias("n_active"),
            F.lit(None).cast("bigint").alias("n_segments"),
            F.lit(None).cast("bigint").alias("peak_rms_milli"),
            "decode_err",
        )
    )
    return good.unionByName(quar)


def q_knn_mips(spark, sf_dir):
    """Maximum-inner-product top-10 (MIPS) with the augmentation
    reduction verified in-query: corpus vectors get a deterministic
    dyadic popularity scale ``1 + (vec_id % 8)/8`` (unit vectors make
    plain cosine == MIPS, so the scale is what makes this a DIFFERENT
    ranking problem), the exact path ranks ``s * <q, v>``, and the
    Shrivastava-Li/Neyshabur-Srebro reduction path re-ranks through
    cosine on vectors augmented with ``sqrt(M^2 - s^2)`` (constant
    augmented norm M = max scale, query padded with 0).  The
    reduction's top-10 must agree with the exact top-10 at recall
    >= 0.9 per query — a boolean claim the oracle pins TRUE, so a
    broken reduction flips the hash (sketch-claim pattern, cf.
    `sim_knn_ivf`).  Exact scores floor-1e4 pinned before ranking;
    the scale is dyadic so ``s * dot`` is one exactly-representable
    multiply in both engines.

    Scale shape: query set broadcast twice (exact + augmented),
    corpus never self-joined; top-k per query via the rank window."""
    from cdc_pipe_line_spark.similarity import brute_force_topk, mips_topk

    q, emb = _queries_and_corpus(spark, sf_dir)
    c = emb.select(
        "vec_id",
        (
            F.lit(1.0) + (F.col("vec_id") % 8).cast("double") / F.lit(8.0)
        ).alias("s"),
        "embedding",
    )
    exact = mips_topk(q, c, k=10)
    mx = c.agg(F.max("s").alias("M"))
    aug_c = c.crossJoin(F.broadcast(mx)).select(
        "vec_id",
        F.concat(
            F.transform("embedding", lambda x: x * F.col("s")),
            F.array(
                F.sqrt(F.col("M") * F.col("M") - F.col("s") * F.col("s"))
            ),
        ).alias("embedding"),
    )
    aug_q = q.select(
        "q_id", F.concat("embedding", F.array(F.lit(0.0))).alias("embedding")
    )
    red = brute_force_topk(aug_q, aug_c, k=10)
    hits = (
        exact.select("q_id", "vec_id")
        .join(red.select("q_id", "vec_id"), ["q_id", "vec_id"], "left_semi")
        .groupBy("q_id")
        .agg(F.count("*").alias("__n_hit"))
    )
    return (
        exact.join(hits, "q_id", "left")
        .select(
            "q_id",
            "vec_id",
            "ip",
            F.col("rank").cast("bigint").alias("rank"),
            (F.coalesce(F.col("__n_hit"), F.lit(0)) >= 9).alias(
                "reduction_ok"
            ),
        )
    )


QUERIES = {
    "sim_knn_mips": q_knn_mips,
    "mm_audio_vad_segments": q_audio_vad_segments,
    "mm_image_dhash_dedup": q_image_dhash_dedup,
    "mm_video_scene_cuts": q_video_scene_cuts,
    "dedup_semantic": q_semantic_dedup,
    "mm_jpeg_decode": q_jpeg_decode,
    "mm_jpeg_restart_decode": q_jpeg_restart_decode,
    "mm_jpeg_scan_triage": q_jpeg_scan_triage,
    "mm_exif_orientation": q_exif_orientation,
    "mm_exif_gps": q_exif_gps,
    "sim_pca_power_iteration": q_pca_power_iteration,
    "mm_png_filter_decode": q_png_filter_decode,
    "mm_jpeg_color_decode": q_jpeg_color_decode,
    "sim_range_search": q_range_search,
    "mm_image_resize": q_image_resize,
    "sim_knn_bruteforce": q_knn_bruteforce,
    "sim_knn_lsh": q_knn_lsh,
    "sim_knn_ivf": q_knn_ivf,
    "sim_knn_pq": q_knn_pq,
    "sim_knn_sq8": q_knn_sq8,
    "sim_knn_ivf_sq8": q_knn_ivf_sq8,
    "mm_audio_stats": q_audio_stats,
    "mm_audio_period_scan": q_audio_period_scan,
    "mm_audio_decimate": q_audio_decimate,
    "mm_gif_decode": q_gif_decode,
    "mm_mp4_samples": q_mp4_samples,
    "sim_cosine_near_dup": q_cosine_near_dup,
    "mm_media_pipeline": q_media_pipeline,
    "mm_media_embed_knn": q_media_embed_knn,
    "mm_media_embed_lsh": q_media_embed_lsh,
}

_SQ8_CODE = (
    "CASE WHEN CAST(maxs[{i}] AS DOUBLE) = CAST(mins[{i}] AS DOUBLE) THEN 0 "
    "ELSE least(CAST(floor((CAST({x} AS DOUBLE) - CAST(mins[{i}] AS DOUBLE)) "
    "/ (CAST(maxs[{i}] AS DOUBLE) - CAST(mins[{i}] AS DOUBLE)) * 256.0) "
    "AS INT), 255) END"
)

ORACLE = {
    "mm_audio_period_scan": """
WITH p AS (
  SELECT doc_id, 2 * ((doc_id % 4) + 1) AS per,
         100 + (doc_id % 50) AS amp
  FROM documents WHERE doc_id % 43 != 0),
sig AS (
  SELECT doc_id, per, i,
    CASE WHEN i % per < per // 2 THEN amp ELSE -amp END AS x
  FROM p, (SELECT unnest(range(0, 240)) AS i) r),
corr AS (
  SELECT doc_id, c.cand,
    CAST(sum(x * (CASE WHEN i % c.cand < c.cand // 2
                  THEN 1 ELSE -1 END)) AS BIGINT) AS corr
  FROM sig, (SELECT unnest([2, 4, 6, 8]) AS cand) c
  GROUP BY 1, 2),
best AS (
  SELECT doc_id, cand, corr FROM (
    SELECT doc_id, cand, corr, row_number() OVER (
        PARTITION BY doc_id ORDER BY abs(corr) DESC, cand ASC) AS rn
    FROM corr) WHERE rn = 1),
en AS (
  SELECT doc_id, CAST(sum(x * x) AS BIGINT) AS energy,
    CAST(count(*) AS BIGINT) AS n_samples
  FROM sig GROUP BY 1)
SELECT d.doc_id AS media_id, e.n_samples, e.energy,
  CAST(b.cand AS BIGINT) AS best_period, b.corr AS best_corr,
  CASE WHEN d.doc_id % 43 = 0
    THEN 'wav: data chunk truncated' END AS decode_err
FROM documents d
LEFT JOIN en e ON e.doc_id = d.doc_id
LEFT JOIN best b ON b.doc_id = d.doc_id""",
    "mm_audio_vad_segments": """
WITH p AS (
  SELECT doc_id,
    (doc_id % 20) + 4 AS n_w,
    (doc_id % 2000) + 1 AS amp,
    2 + doc_id % 3 AS period,
    doc_id % 37 = 0 AS cut
  FROM documents),
wins AS (
  SELECT doc_id, amp, period, unnest(range(0, n_w)) AS j
  FROM p WHERE NOT cut),
flagged AS (
  SELECT doc_id, j,
    CASE WHEN j % period < period - 1 THEN 1 ELSE 0 END AS active,
    CASE WHEN j % period < period - 1 THEN amp * 1000 ELSE 0 END
      AS rms_milli
  FROM wins),
seg AS (
  SELECT doc_id, j, active, rms_milli,
    CASE WHEN active = 1 AND coalesce(lag(active) OVER (
      PARTITION BY doc_id ORDER BY j), 0) = 0 THEN 1 ELSE 0 END
      AS new_seg
  FROM flagged)
SELECT doc_id AS media_id,
  count(*) AS n_windows,
  CAST(sum(active) AS BIGINT) AS n_active,
  CAST(sum(new_seg) AS BIGINT) AS n_segments,
  CAST(max(rms_milli) AS BIGINT) AS peak_rms_milli,
  CAST(NULL AS VARCHAR) AS decode_err
FROM seg GROUP BY 1
UNION ALL
SELECT doc_id, NULL, NULL, NULL, NULL,
  'wav: data chunk truncated'
FROM p WHERE cut""",
    "mm_image_dhash_dedup": """
WITH p AS (
  SELECT doc_id,
    1 + doc_id % 4 AS a,
    1 + (doc_id // 4) % 4 AS b,
    doc_id % 37 = 0 AS cut
  FROM documents),
grid AS (
  SELECT doc_id, a, b, gy.y, gx.x,
    CAST(y * 8 + x AS BIGINT) AS i,
    CASE WHEN (a * (4 * x) + b * (3 * y)) % 16
            < (a * (4 * (x + 1)) + b * (3 * y)) % 16
      THEN 1 ELSE 0 END AS bit
  FROM p, (SELECT unnest(range(0, 8)) AS x) gx,
       (SELECT unnest(range(0, 8)) AS y) gy
  WHERE NOT cut),
hashes AS (
  SELECT doc_id,
    CAST(sum(CASE WHEN i = 63
      THEN CASE WHEN bit = 1 THEN -9223372036854775807 - 1 ELSE 0 END
      ELSE bit * (CAST(1 AS BIGINT) << i) END) AS BIGINT) AS h
  FROM grid GROUP BY 1),
pairs AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b,
    bit_count(xor(x.h, y.h)) AS hamming
  FROM hashes x JOIN hashes y ON x.doc_id < y.doc_id
  WHERE bit_count(xor(x.h, y.h)) <= 3)
SELECT 'pairs' AS probe, CAST(hamming AS INT) AS hamming,
  count(*) AS n,
  CAST(sum(id_a) + sum(id_b) AS BIGINT) AS id_sum
FROM pairs GROUP BY 2
UNION ALL
SELECT 'quarantined', CAST(NULL AS INT), count(*),
  CAST(sum(doc_id) AS BIGINT)
FROM p WHERE cut""",
    "mm_video_scene_cuts": """
WITH p AS (
  SELECT doc_id,
    (doc_id % 25) + 12 AS n,
    (doc_id % 50) + 10 AS base,
    doc_id % 43 = 0 AS cut
  FROM documents),
samples AS (
  SELECT doc_id, n, base, unnest(range(0, n)) AS i FROM p
  WHERE NOT cut),
sized AS (
  SELECT doc_id, i,
    CAST(base + (i % 7)
      + CASE WHEN i % 10 = 0 THEN 40 ELSE 0 END AS BIGINT) AS sz
  FROM samples),
flagged AS (
  SELECT doc_id, i, sz,
    CASE WHEN sz - lag(sz) OVER (PARTITION BY doc_id ORDER BY i)
      >= 30 THEN 1 ELSE 0 END AS c
  FROM sized)
SELECT doc_id AS media_id,
  CAST(NULL AS VARCHAR) AS decode_err,
  count(*) AS n_samples,
  CAST(sum(c) AS BIGINT) AS n_cuts,
  CAST(min(CASE WHEN c = 1 THEN i END) AS BIGINT)
    AS first_cut_sample,
  CAST(sum(CASE WHEN c = 1 THEN sz END) AS BIGINT) AS cut_bytes,
  CAST(sum(sz) AS BIGINT) AS total_bytes
FROM flagged GROUP BY 1
UNION ALL
SELECT doc_id,
  'mp4: sample 0 (' || CAST(132 + 4 * n AS VARCHAR) || '+'
    || CAST(base + 40 AS VARCHAR) || ') beyond EOF '
    || CAST(132 + 4 * n AS VARCHAR),
  0, 0, NULL, NULL, NULL
FROM p WHERE cut""",
    "dedup_semantic": f"""
WITH seeds AS (
  SELECT cent_id, cv FROM (
    SELECT vec_id AS cent_id, embedding AS cv,
      row_number() OVER (
        ORDER BY ((vec_id % 1000000007) * 2654435761) % 2147483648,
                 vec_id) AS rk,
      (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM embeddings) AS k
    FROM embeddings)
  WHERE rk <= k),
assigned AS (
  SELECT vec_id, embedding, cent_id AS cluster_id
  FROM (
    SELECT e.vec_id, e.embedding, s.cent_id,
      {_COS.format(a='e.embedding', b='s.cv')} AS sim
    FROM embeddings e CROSS JOIN seeds s)
  QUALIFY row_number() OVER (PARTITION BY vec_id
    ORDER BY sim DESC, cent_id ASC) = 1),
pairs AS (
  SELECT a.cluster_id, a.vec_id AS id_a, b.vec_id AS id_b
  FROM assigned a JOIN assigned b
    ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
  WHERE {_COS.format(a='a.embedding', b='b.embedding')} >= 0.35),
drops AS (SELECT cluster_id, id_b FROM pairs GROUP BY 1, 2),
pc AS (SELECT cluster_id, count(*) AS n_vecs FROM assigned GROUP BY 1),
ps AS (SELECT cluster_id, count(*) AS n_pairs FROM pairs GROUP BY 1),
ds AS (
  SELECT cluster_id, count(*) AS n_dropped,
    CAST(sum(id_b) AS BIGINT) AS dropped_id_sum
  FROM drops GROUP BY 1)
SELECT pc.cluster_id, pc.n_vecs,
  CAST(coalesce(ps.n_pairs, 0) AS BIGINT) AS n_pairs,
  CAST(coalesce(ds.n_dropped, 0) AS BIGINT) AS n_dropped,
  CAST(coalesce(ds.dropped_id_sum, 0) AS BIGINT) AS dropped_id_sum
FROM pc
LEFT JOIN ps ON ps.cluster_id = pc.cluster_id
LEFT JOIN ds ON ds.cluster_id = pc.cluster_id""",
    "mm_jpeg_color_decode": """
WITH p AS (
  SELECT doc_id,
    16 * ((doc_id % 2) + 1) AS w,
    16 * ((doc_id % 3) + 1) AS h,
    doc_id % 41 = 0 AS cut
  FROM documents),
mcus AS (
  SELECT doc_id, unnest(range(0, (w // 16) * (h // 16))) AS m
  FROM p),
ycc AS (
  SELECT doc_id, m,
    100 + 2 * ((doc_id + m) % 20) AS y,
    90 + 4 * ((doc_id + m) % 10) AS cb,
    120 + 2 * ((doc_id + 3 * m) % 15) AS cr
  FROM mcus),
rgb AS (
  SELECT doc_id, m,
    least(greatest(floor(y + CAST(1.402 AS DOUBLE) * (cr - 128)
      + CAST(0.5 AS DOUBLE)), 0), 255) AS r,
    least(greatest(floor(y - CAST(0.344136 AS DOUBLE) * (cb - 128)
      - CAST(0.714136 AS DOUBLE) * (cr - 128)
      + CAST(0.5 AS DOUBLE)), 0), 255) AS g,
    least(greatest(floor(y + CAST(1.772 AS DOUBLE) * (cb - 128)
      + CAST(0.5 AS DOUBLE)), 0), 255) AS b
  FROM ycc),
agg AS (
  SELECT doc_id,
    CAST(sum(256 * r) AS BIGINT) AS r_sum,
    CAST(sum(256 * g) AS BIGINT) AS g_sum,
    CAST(sum(256 * b) AS BIGINT) AS b_sum,
    CAST(min(r) AS INT) AS r_min, CAST(max(r) AS INT) AS r_max,
    CAST(min(g) AS INT) AS g_min, CAST(max(g) AS INT) AS g_max,
    CAST(min(b) AS INT) AS b_min, CAST(max(b) AS INT) AS b_max
  FROM rgb GROUP BY 1)
SELECT p.doc_id AS media_id,
  CASE WHEN cut THEN NULL ELSE CAST(w AS INT) END AS w,
  CASE WHEN cut THEN NULL ELSE CAST(h AS INT) END AS h,
  CASE WHEN cut THEN NULL ELSE agg.r_sum END AS r_sum,
  CASE WHEN cut THEN NULL ELSE agg.g_sum END AS g_sum,
  CASE WHEN cut THEN NULL ELSE agg.b_sum END AS b_sum,
  CASE WHEN cut THEN NULL ELSE agg.r_min END AS r_min,
  CASE WHEN cut THEN NULL ELSE agg.r_max END AS r_max,
  CASE WHEN cut THEN NULL ELSE agg.g_min END AS g_min,
  CASE WHEN cut THEN NULL ELSE agg.g_max END AS g_max,
  CASE WHEN cut THEN NULL ELSE agg.b_min END AS b_min,
  CASE WHEN cut THEN NULL ELSE agg.b_max END AS b_max,
  CASE WHEN cut THEN 'jpeg: truncated before SOS'
       ELSE CAST(NULL AS VARCHAR) END AS decode_err
FROM p JOIN agg ON agg.doc_id = p.doc_id""",
    "mm_jpeg_decode": """
WITH p AS (
  SELECT doc_id,
    8 * ((doc_id % 3) + 1) AS w,
    8 * ((doc_id % 2) + 1) AS h,
    100 + 2 * (doc_id % 20) AS base,
    doc_id % 43 = 0 AS cut
  FROM documents),
blocks AS (
  SELECT doc_id, unnest(range(0, (w // 8) * (h // 8))) AS b
  FROM p),
agg AS (
  SELECT blocks.doc_id,
    CAST(sum(64 * (p.base + 2 * (b % 5))) AS BIGINT) AS pix_sum,
    CAST(min(p.base + 2 * (b % 5)) AS INT) AS pix_min,
    CAST(max(p.base + 2 * (b % 5)) AS INT) AS pix_max,
    CAST(max(CASE WHEN b = 0 THEN p.base + 2 * (b % 5) END) AS INT)
      AS corner_tl,
    CAST(max(CASE WHEN b = (p.w // 8) * (p.h // 8) - 1
      THEN p.base + 2 * (b % 5) END) AS INT) AS corner_br
  FROM blocks JOIN p ON p.doc_id = blocks.doc_id
  GROUP BY 1)
SELECT p.doc_id AS media_id,
  CASE WHEN cut THEN NULL ELSE CAST(w AS INT) END AS w,
  CASE WHEN cut THEN NULL ELSE CAST(h AS INT) END AS h,
  CASE WHEN cut THEN NULL
    ELSE CAST((w // 8) * (h // 8) AS INT) END AS n_blocks,
  CASE WHEN cut THEN NULL ELSE agg.pix_sum END AS pix_sum,
  CASE WHEN cut THEN NULL ELSE agg.pix_min END AS pix_min,
  CASE WHEN cut THEN NULL ELSE agg.pix_max END AS pix_max,
  CASE WHEN cut THEN NULL ELSE agg.corner_tl END AS corner_tl,
  CASE WHEN cut THEN NULL ELSE agg.corner_br END AS corner_br,
  CASE WHEN cut THEN 'jpeg: truncated before SOS'
       ELSE CAST(NULL AS VARCHAR) END AS decode_err
FROM p JOIN agg ON agg.doc_id = p.doc_id""",
    "mm_png_filter_decode": """
WITH p AS (
  SELECT doc_id,
    (doc_id % 24) + 4 AS w,
    (doc_id % 10) + 5 AS h,
    doc_id % 100 AS base,
    doc_id % 59 = 0 AS cut
  FROM documents),
px AS (
  SELECT doc_id, x, y, (base + 3 * x + 7 * y) % 256 AS v
  FROM (SELECT doc_id, base, h, unnest(range(0, w)) AS x FROM p),
  LATERAL (SELECT unnest(range(0, h)) AS y)),
agg AS (
  SELECT doc_id,
    CAST(sum(v) AS BIGINT) AS pix_sum,
    CAST(min(v) AS INT) AS pix_min,
    CAST(max(v) AS INT) AS pix_max
  FROM px GROUP BY 1)
SELECT p.doc_id AS media_id,
  CASE WHEN cut THEN NULL ELSE CAST(w AS INT) END AS w,
  CASE WHEN cut THEN NULL ELSE CAST(h AS INT) END AS h,
  CASE WHEN cut THEN NULL ELSE agg.pix_sum END AS pix_sum,
  CASE WHEN cut THEN NULL ELSE agg.pix_min END AS pix_min,
  CASE WHEN cut THEN NULL ELSE agg.pix_max END AS pix_max,
  CASE WHEN cut THEN NULL
    ELSE CAST(base % 256 AS INT) END AS corner_tl,
  CASE WHEN cut THEN NULL
    ELSE CAST((base + 3 * (w - 1) + 7 * (h - 1)) % 256 AS INT)
    END AS corner_br,
  CASE WHEN cut THEN 'png: CRC mismatch in b''IDAT'' chunk'
       ELSE CAST(NULL AS VARCHAR) END AS decode_err
FROM p JOIN agg ON agg.doc_id = p.doc_id""",
    "mm_exif_orientation": """
SELECT doc_id AS media_id,
  CASE WHEN doc_id % 53 = 0 THEN NULL
       WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
  CASE WHEN doc_id % 53 = 0 THEN NULL ELSE 2 END AS n_entries,
  CASE WHEN doc_id % 53 = 0 THEN NULL
       ELSE CAST(doc_id % 8 + 1 AS INT) END AS orientation,
  CASE WHEN doc_id % 53 = 0 THEN 'exif: bad TIFF byte order'
       ELSE CAST(NULL AS VARCHAR) END AS decode_err
FROM documents""",
    "mm_jpeg_scan_triage": """
SELECT doc_id AS media_id,
  CASE WHEN doc_id % 41 = 0 THEN NULL
       WHEN doc_id % 4 = 0 THEN 'baseline'
       WHEN doc_id % 4 = 1 THEN 'progressive'
       WHEN doc_id % 4 = 2 THEN 'extended'
       ELSE 'lossless' END AS scan_class,
  CASE WHEN doc_id % 41 = 0 THEN NULL
       ELSE CAST(8 * ((doc_id % 3) + 1) AS INT) END AS w,
  CASE WHEN doc_id % 41 = 0 THEN NULL
       ELSE CAST(8 * ((doc_id % 2) + 1) AS INT) END AS h,
  CASE WHEN doc_id % 41 = 0 THEN FALSE ELSE doc_id % 4 <= 1 END AS decodable,
  CASE WHEN doc_id % 41 = 0 THEN 'jpeg: truncated before SOF marker'
       WHEN doc_id % 4 <= 1 THEN NULL
       WHEN doc_id % 4 = 2 THEN 'non-baseline scan: extended'
       ELSE 'non-baseline scan: lossless' END AS quarantine_reason
FROM documents""",
    "sim_pca_power_iteration": """
WITH qv AS (
  SELECT vec_id,
    list_transform(embedding,
      x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS ql
  FROM embeddings),
q AS MATERIALIZED (
  SELECT vec_id, ix.ix - 1 AS pos, ql[ix.ix] AS q
  FROM qv, (SELECT unnest(range(1, 65)) AS ix) ix),
nn0 AS (SELECT count(DISTINCT vec_id) AS n FROM q),
cells AS MATERIALIZED (
  SELECT a.pos AS i, b.pos AS j, sum(a.q * b.q) AS sxy
  FROM q a JOIN q b USING (vec_id) GROUP BY 1, 2),
means AS (SELECT pos, sum(q) AS sx FROM q GROUP BY 1),
cov AS MATERIALIZED (
  SELECT i, j,
    (2 * (n * sxy - mi.sx * mj.sx) + n * n) // (2 * n * n) AS c_micro
  FROM cells
  JOIN means mi ON mi.pos = i
  JOIN means mj ON mj.pos = j
  CROSS JOIN nn0),
v0 AS (
  SELECT unnest(range(0, 64)) AS pos,
    CAST(1.0 AS DOUBLE) / 64 AS v),
u1 AS MATERIALIZED (
  SELECT c.i AS pos,
    sum((CAST(c_micro AS DOUBLE) / 1000000) * v.v) AS u
  FROM cov c JOIN v0 v ON v.pos = c.j GROUP BY 1),
nrm1 AS (SELECT sqrt(sum(u * u)) AS nn FROM u1),
v1 AS MATERIALIZED (
  SELECT pos,
    floor(u / nn * 1e8 + CAST(0.5 AS DOUBLE)) / 1e8 AS v
  FROM u1, nrm1),
u2 AS MATERIALIZED (
  SELECT c.i AS pos,
    sum((CAST(c_micro AS DOUBLE) / 1000000) * v.v) AS u
  FROM cov c JOIN v1 v ON v.pos = c.j GROUP BY 1),
nrm2 AS (SELECT sqrt(sum(u * u)) AS nn FROM u2),
v2 AS MATERIALIZED (
  SELECT pos,
    floor(u / nn * 1e8 + CAST(0.5 AS DOUBLE)) / 1e8 AS v
  FROM u2, nrm2),
u3 AS MATERIALIZED (
  SELECT c.i AS pos,
    sum((CAST(c_micro AS DOUBLE) / 1000000) * v.v) AS u
  FROM cov c JOIN v2 v ON v.pos = c.j GROUP BY 1),
nrm3 AS (SELECT sqrt(sum(u * u)) AS nn FROM u3),
v3 AS MATERIALIZED (
  SELECT pos,
    floor(u / nn * 1e8 + CAST(0.5 AS DOUBLE)) / 1e8 AS v
  FROM u3, nrm3),
u4 AS MATERIALIZED (
  SELECT c.i AS pos,
    sum((CAST(c_micro AS DOUBLE) / 1000000) * v.v) AS u
  FROM cov c JOIN v3 v ON v.pos = c.j GROUP BY 1),
nrm4 AS (SELECT sqrt(sum(u * u)) AS nn FROM u4),
v4 AS MATERIALIZED (
  SELECT pos,
    floor(u / nn * 1e8 + CAST(0.5 AS DOUBLE)) / 1e8 AS v
  FROM u4, nrm4),
u5 AS MATERIALIZED (
  SELECT c.i AS pos,
    sum((CAST(c_micro AS DOUBLE) / 1000000) * v.v) AS u
  FROM cov c JOIN v4 v ON v.pos = c.j GROUP BY 1),
nrm5 AS (SELECT sqrt(sum(u * u)) AS nn FROM u5),
v5 AS MATERIALIZED (
  SELECT pos,
    floor(u / nn * 1e8 + CAST(0.5 AS DOUBLE)) / 1e8 AS v
  FROM u5, nrm5),
lam AS (
  SELECT floor(sum((CAST(c_micro AS DOUBLE) / 1000000) * vi.v * vj.v)
    * 1e4 + CAST(0.5 AS DOUBLE)) / 1e4 AS lam
  FROM cov c
  JOIN v5 vi ON vi.pos = c.i
  JOIN v5 vj ON vj.pos = c.j)
SELECT CAST(pos AS BIGINT) AS pos,
  floor(v * 1e6 + CAST(0.5 AS DOUBLE)) / 1e6 AS comp_6dp,
  lam AS lambda_4dp
FROM v5, lam""",
    "mm_exif_gps": """
SELECT doc_id AS media_id,
  CASE WHEN doc_id % 53 = 0 THEN NULL
       WHEN doc_id % 4 < 2 THEN 'II' ELSE 'MM' END AS byte_order,
  CASE WHEN doc_id % 53 = 0 THEN NULL
       WHEN doc_id % 2 = 1 THEN 'N' ELSE 'S' END AS ns,
  CASE WHEN doc_id % 53 = 0 THEN NULL
       ELSE ((doc_id % 90) * 3600 + (doc_id % 60) * 60) * 1000000
            + ((doc_id * 37) % 60000) * 1000 END AS lat_arcsec_micro,
  CASE WHEN doc_id % 53 = 0 THEN NULL
       WHEN doc_id % 3 = 0 THEN 'E' ELSE 'W' END AS ew,
  CASE WHEN doc_id % 53 = 0 THEN NULL
       ELSE ((doc_id % 180) * 3600 + ((doc_id * 7) % 60) * 60) * 1000000
            + ((doc_id * 53) % 60000) * 1000 END AS lon_arcsec_micro,
  CASE WHEN doc_id % 53 = 0
       THEN 'exif: GPS IFD offset out of range' END AS decode_err
FROM documents""",
    "mm_jpeg_restart_decode": """
WITH p AS (
  SELECT doc_id,
    8 * ((doc_id % 4) + 1) AS w,
    8 * ((doc_id % 2) + 1) AS h,
    100 + 2 * (doc_id % 20) AS base,
    doc_id % 47 = 0 AS cut
  FROM documents),
blocks AS (
  SELECT doc_id, unnest(range(0, (w // 8) * (h // 8))) AS b
  FROM p),
agg AS (
  SELECT blocks.doc_id,
    CAST(sum(64 * (p.base + 2 * (b % 5))) AS BIGINT) AS pix_sum,
    CAST(min(p.base + 2 * (b % 5)) AS INT) AS pix_min,
    CAST(max(p.base + 2 * (b % 5)) AS INT) AS pix_max,
    CAST(max(CASE WHEN b = 0 THEN p.base + 2 * (b % 5) END) AS INT)
      AS corner_tl,
    CAST(max(CASE WHEN b = (p.w // 8) * (p.h // 8) - 1
      THEN p.base + 2 * (b % 5) END) AS INT) AS corner_br
  FROM blocks JOIN p ON p.doc_id = blocks.doc_id
  GROUP BY 1)
SELECT p.doc_id AS media_id,
  CASE WHEN cut THEN NULL ELSE CAST(w AS INT) END AS w,
  CASE WHEN cut THEN NULL ELSE CAST(h AS INT) END AS h,
  CASE WHEN cut THEN NULL
    ELSE CAST((w // 8) * (h // 8) AS INT) END AS n_blocks,
  CASE WHEN cut THEN NULL ELSE agg.pix_sum END AS pix_sum,
  CASE WHEN cut THEN NULL ELSE agg.pix_min END AS pix_min,
  CASE WHEN cut THEN NULL ELSE agg.pix_max END AS pix_max,
  CASE WHEN cut THEN NULL ELSE agg.corner_tl END AS corner_tl,
  CASE WHEN cut THEN NULL ELSE agg.corner_br END AS corner_br,
  CASE WHEN cut THEN 'jpeg: truncated before SOS'
       ELSE CAST(NULL AS VARCHAR) END AS decode_err
FROM p JOIN agg ON agg.doc_id = p.doc_id""",
    "mm_audio_decimate": """
WITH p AS (
  SELECT doc_id, ((doc_id % 40) + 1) * 16 AS frames,
         (doc_id % 2000) + 1 AS amp,
         1 + (doc_id % 2) AS ch,
         doc_id % 50 = 0 AS cut
  FROM documents)
SELECT doc_id AS media_id, CAST(frames AS BIGINT) AS in_frames,
  CAST(frames // 4 AS BIGINT) AS out_frames,
  CAST(ch AS INT) AS channels,
  round(CAST(amp AS DOUBLE), 4) AS rms,
  CAST(amp AS INT) AS peak,
  CAST(NULL AS VARCHAR) AS decode_err
FROM p WHERE NOT cut
UNION ALL
SELECT doc_id, NULL, NULL, NULL, NULL, NULL, 'wav: data chunk truncated'
FROM p WHERE cut""",
    "sim_knn_pq": f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id % 100 = 0),
scored AS (
  SELECT q.q_id, e.vec_id,
    {_COS.format(a='q.qv', b='e.embedding')} AS cos_sim
  FROM embeddings e CROSS JOIN q WHERE e.vec_id != q.q_id),
ranked AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
        ORDER BY cos_sim DESC, vec_id ASC) AS rank
    FROM scored) WHERE rank <= 10)
SELECT q_id,
  max(CASE WHEN rank = 1 THEN vec_id END) AS exact_top1_id,
  max(CASE WHEN rank = 1 THEN cos_sim END) AS exact_top1_sim,
  round(sum(cos_sim), 4) AS exact_top10_sim_sum,
  TRUE AS recall10_ge_02,
  TRUE AS mean_recall10_ge_05,
  TRUE AS pq_le_k
FROM ranked GROUP BY q_id""",
    "mm_image_resize": """
WITH d AS (
  SELECT doc_id, (octet_length(encode(text)) % 64) + 1 AS w,
         (octet_length(encode(text)) % 48) + 1 AS h, md5(text) AS m
  FROM documents)
SELECT doc_id AS media_id, CAST(w AS INT) AS src_w, CAST(h AS INT) AS src_h,
  16 AS out_w, 12 AS out_h, CAST(576 AS BIGINT) AS n_out_bytes,
  CAST(list_sum(list_transform(range(0, 576), j ->
    ascii(substr(m, CAST((((((j // 48) * h) // 12) * w + (((j % 48) // 3) * w) // 16) * 3 + (j % 3)) % 32 AS INT) + 1, 1)))) AS BIGINT)
    AS pix_sum,
  ascii(substr(m, 1, 1)) AS corner_tl,
  ascii(substr(m, CAST(((((11 * h) // 12) * w + (15 * w) // 16) * 3 + 2) % 32 AS INT) + 1, 1)) AS corner_br,
  CAST(NULL AS VARCHAR) AS resize_err
FROM d WHERE doc_id % 50 != 0
UNION ALL
SELECT doc_id, NULL, NULL, 16, 12, NULL, NULL, NULL, NULL,
  'netpbm: truncated header'
FROM d WHERE doc_id % 50 = 0""",
    "sim_range_search": f"""
WITH cb AS (
  SELECT vec_id, embedding, {_lsh_bucket_sql('embedding')} AS bucket
  FROM embeddings),
qb AS (
  SELECT vec_id AS q_id, embedding AS qv, bucket
  FROM cb WHERE vec_id % 100 = 0)
SELECT qb.q_id, cb.vec_id,
  {_COS.format(a='qb.qv', b='cb.embedding')} AS cos_sim
FROM cb JOIN qb USING (bucket)
WHERE cb.vec_id != qb.q_id
  AND {_COS.format(a='qb.qv', b='cb.embedding')} >= 0.3""",
    "sim_knn_sq8": f"""
WITH ex AS (
  SELECT unnest(range(1, len(embedding) + 1)) AS pos,
         unnest(embedding) AS x
  FROM embeddings),
per_dim AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM ex GROUP BY pos),
b AS (SELECT list(mn ORDER BY pos) AS mins, list(mx ORDER BY pos) AS maxs
      FROM per_dim),
coded AS (
  SELECT vec_id,
    list_transform(range(1, 65),
      i -> {_SQ8_CODE.format(i='i', x='embedding[i]')}) AS codes
  FROM embeddings, b),
deq AS (
  SELECT vec_id,
    list_transform(range(1, 65),
      i -> CAST(mins[i] AS DOUBLE) + (CAST(codes[i] AS DOUBLE) + 0.5)
           * (CAST(maxs[i] AS DOUBLE) - CAST(mins[i] AS DOUBLE)) / 256.0)
      AS dv
  FROM coded, b),
q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings
      WHERE vec_id % 100 = 0),
cand AS (
  SELECT q.q_id, d.vec_id,
    {_COS.format(a='q.qv', b='d.dv')} AS approx_sim
  FROM deq d, q WHERE d.vec_id != q.q_id),
keep AS (
  SELECT q_id, vec_id, approx_sim FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
        ORDER BY approx_sim DESC, vec_id ASC) AS rn
    FROM cand) WHERE rn <= 40),
exact AS (
  SELECT k.q_id, k.vec_id, k.approx_sim,
    {_COS.format(a='q.qv', b='e.embedding')} AS cos_sim
  FROM keep k
  JOIN embeddings e ON k.vec_id = e.vec_id
  JOIN q ON k.q_id = q.q_id)
SELECT q_id, vec_id, approx_sim, cos_sim, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
      ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM exact) WHERE rank <= 10""",
    "sim_knn_lsh": f"""
WITH cb AS (
  SELECT vec_id, embedding, {_lsh_bucket_sql('embedding')} AS bucket
  FROM embeddings),
qb AS (
  SELECT vec_id AS q_id, embedding AS qv, bucket
  FROM cb WHERE vec_id % 100 = 0),
scored AS (
  SELECT qb.q_id, cb.vec_id,
    {_COS.format(a='qb.qv', b='cb.embedding')} AS cos_sim
  FROM cb JOIN qb USING (bucket) WHERE cb.vec_id != qb.q_id)
SELECT q_id, vec_id, cos_sim, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
      ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM scored) WHERE rank <= 10""",
    "sim_knn_ivf": f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id % 100 = 0),
scored AS (
  SELECT q.q_id, e.vec_id,
    {_COS.format(a='q.qv', b='e.embedding')} AS cos_sim
  FROM embeddings e CROSS JOIN q WHERE e.vec_id != q.q_id),
ranked AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
        ORDER BY cos_sim DESC, vec_id ASC) AS rank
    FROM scored) WHERE rank <= 10)
SELECT q_id,
  max(CASE WHEN rank = 1 THEN vec_id END) AS exact_top1_id,
  max(CASE WHEN rank = 1 THEN cos_sim END) AS exact_top1_sim,
  round(sum(cos_sim), 4) AS exact_top10_sim_sum,
  TRUE AS recall10_ge_04,
  TRUE AS mean_recall10_ge_06,
  TRUE AS ivf_le_k
FROM ranked GROUP BY q_id""",
    "mm_mp4_samples": """
WITH p AS (
  SELECT doc_id,
    (doc_id % 25) + 2 AS n,
    (doc_id % 50) + 10 AS base,
    doc_id % 41 = 0 AS cut
  FROM documents),
ok AS (
  SELECT doc_id, n, base, unnest(range(0, n)) AS i FROM p WHERE NOT cut)
SELECT doc_id AS media_id,
  CAST(i AS BIGINT) AS sample_id,
  CAST(132 + 4 * n + i * base + 21 * (i // 7)
       + ([0, 0, 1, 3, 6, 10, 15])[(i % 7) + 1] AS BIGINT) AS byte_offset,
  CAST(base + (i % 7) AS BIGINT) AS sample_size,
  CAST(NULL AS VARCHAR) AS decode_err
FROM ok
UNION ALL
SELECT doc_id, NULL, NULL, NULL,
  'mp4: sample 0 (' || CAST(132 + 4 * n AS VARCHAR) || '+'
    || CAST(base AS VARCHAR) || ') beyond EOF '
    || CAST(132 + 4 * n AS VARCHAR)
FROM p WHERE cut""",
    "mm_gif_decode": """
WITH p AS (
  SELECT doc_id,
    (doc_id % 20) + 1 AS w,
    (doc_id % 12) + 1 AS h,
    doc_id % 37 = 0 AS cut
  FROM documents),
sz AS (
  SELECT doc_id, w, h, cut,
    CAST(ceil(9 * (2 * w * h + 1) / 8.0) AS BIGINT) AS b
  FROM p)
SELECT doc_id AS media_id,
  CAST(794 + b + ceil(b / 255.0) - CASE WHEN cut THEN 3 ELSE 0 END AS BIGINT)
    AS n_bytes,
  CASE WHEN cut THEN NULL ELSE CAST(w AS BIGINT) END AS width,
  CASE WHEN cut THEN NULL ELSE CAST(h AS BIGINT) END AS height,
  CASE WHEN cut THEN 'gif: truncated sub-block'
       ELSE CAST(NULL AS VARCHAR) END AS decode_err
FROM sz""",
    "mm_audio_stats": """
WITH p AS (
  SELECT doc_id,
    ((doc_id % 40) + 1) * 16 AS frames,
    (doc_id % 2000) + 1 AS amp,
    1 + (doc_id % 2) AS ch,
    doc_id % 50 = 0 AS cut
  FROM documents)
SELECT doc_id AS media_id,
  CASE WHEN cut THEN NULL ELSE CAST(frames AS BIGINT) END AS n_samples,
  CASE WHEN cut THEN NULL ELSE CAST(ch AS BIGINT) END AS channels,
  CASE WHEN cut THEN NULL ELSE CAST(16000 AS BIGINT) END AS sample_rate,
  CASE WHEN cut THEN NULL ELSE round(frames / 16000.0, 6) END AS duration_s,
  CASE WHEN cut THEN NULL ELSE round(CAST(amp AS DOUBLE), 4) END AS rms,
  CASE WHEN cut THEN NULL ELSE CAST(amp AS BIGINT) END AS peak,
  CASE WHEN cut THEN 'wav: data chunk truncated'
       ELSE CAST(NULL AS VARCHAR) END AS decode_err
FROM p""",
    "sim_knn_ivf_sq8": f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id % 100 = 0),
scored AS (
  SELECT q.q_id, e.vec_id,
    {_COS.format(a='q.qv', b='e.embedding')} AS cos_sim
  FROM embeddings e CROSS JOIN q WHERE e.vec_id != q.q_id),
ranked AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
        ORDER BY cos_sim DESC, vec_id ASC) AS rank
    FROM scored) WHERE rank <= 10)
SELECT q_id,
  max(CASE WHEN rank = 1 THEN vec_id END) AS exact_top1_id,
  max(CASE WHEN rank = 1 THEN cos_sim END) AS exact_top1_sim,
  round(sum(cos_sim), 4) AS exact_top10_sim_sum,
  TRUE AS recall10_ge_04,
  TRUE AS mean_recall10_ge_06,
  TRUE AS ivfsq8_le_k
FROM ranked GROUP BY q_id""",
    "sim_knn_bruteforce": f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id % 100 = 0),
scored AS (
  SELECT q.q_id, e.vec_id,
    {_COS.format(a='q.qv', b='e.embedding')} AS cos_sim
  FROM embeddings e CROSS JOIN q WHERE e.vec_id != q.q_id)
SELECT q_id, vec_id, cos_sim, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM scored) WHERE rank <= 10""",
    "sim_knn_mips": """
WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings
           WHERE vec_id % 100 = 0),
c AS (SELECT vec_id,
        CAST(1 AS DOUBLE)
          + (vec_id % 8) / CAST(8 AS DOUBLE) AS s,
        embedding
      FROM embeddings),
scored AS (
  SELECT q.q_id, c.vec_id,
    floor(list_sum(list_transform(range(1, 65),
        i -> CAST(q.qv[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
      * c.s * 10000 + CAST(0.5 AS DOUBLE)) / CAST(10000 AS DOUBLE) AS ip
  FROM c CROSS JOIN q WHERE c.vec_id != q.q_id)
SELECT q_id, vec_id, ip, CAST(rank AS BIGINT) AS rank,
  TRUE AS reduction_ok
FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
    ORDER BY ip DESC, vec_id ASC) AS rank
  FROM scored) WHERE rank <= 10""",
    "sim_cosine_near_dup": f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  {_COS.format(a='a.embedding', b='b.embedding')} AS cos_sim
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_COS.format(a='a.embedding', b='b.embedding')} >= 0.35""",
    "mm_media_embed_knn": """
WITH emb AS (
  SELECT doc_id AS media_id,
    list_transform(range(1, 17),
      i -> CAST(ascii(substr(md5(text), CAST(i AS INT), 1)) AS DOUBLE)) AS v
  FROM documents),
q AS (SELECT media_id AS q_id, v AS qv FROM emb WHERE media_id % 100 = 0),
scored AS (
  SELECT q.q_id, e.media_id,
    round(list_sum(list_transform(range(1, 17), i -> qv[i] * e.v[i])) /
      (sqrt(list_sum(list_transform(range(1, 17), i -> qv[i] * qv[i]))) *
       sqrt(list_sum(list_transform(range(1, 17), i -> e.v[i] * e.v[i])))), 4)
      AS cos_sim
  FROM emb e CROSS JOIN q WHERE e.media_id != q.q_id)
SELECT q_id, media_id, cos_sim, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
      ORDER BY cos_sim DESC, media_id ASC) AS rank
  FROM scored) WHERE rank <= 5""",
    "mm_media_embed_lsh": f"""
WITH emb AS (
  SELECT doc_id AS media_id,
    list_transform(range(1, 17),
      i -> CAST(ascii(substr(md5(text), CAST(i AS INT), 1)) AS DOUBLE)) AS v
  FROM documents),
cb AS (
  SELECT media_id, v, {_lsh_bucket_sql('v', dim=16)} AS bucket FROM emb),
qb AS (
  SELECT media_id AS q_id, v AS qv, bucket
  FROM cb WHERE media_id % 100 = 0),
scored AS (
  SELECT qb.q_id, cb.media_id,
    round(list_sum(list_transform(range(1, 17), i -> qv[i] * cb.v[i])) /
      (sqrt(list_sum(list_transform(range(1, 17), i -> qv[i] * qv[i]))) *
       sqrt(list_sum(list_transform(range(1, 17), i -> cb.v[i] * cb.v[i])))),
      4) AS cos_sim
  FROM cb JOIN qb USING (bucket) WHERE cb.media_id != qb.q_id)
SELECT q_id, media_id, cos_sim, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
      ORDER BY cos_sim DESC, media_id ASC) AS rank
  FROM scored) WHERE rank <= 5""",
    "mm_media_pipeline": """
SELECT 'meta' AS probe, doc_id AS media_id, 'image/fake' AS media_type,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  md5(text) AS content_md5,
  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
  CAST(octet_length(encode(text)) % 480 AS BIGINT) AS height,
  CAST(NULL AS BIGINT) AS frame_no, CAST(NULL AS BIGINT) AS byte_offset
FROM documents
UNION ALL
SELECT 'ppm', doc_id, 'image/ppm',
  CAST(octet_length(encode(p)) AS BIGINT),
  md5(p),
  CAST(w AS BIGINT), CAST(h AS BIGINT),
  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
FROM (
  SELECT doc_id, w, h,
    'P6' || chr(10) || CAST(w AS VARCHAR) || ' ' || CAST(h AS VARCHAR)
      || chr(10) || '255' || chr(10)
      || substr(repeat(md5(text), CAST(floor(w*h*3 / 32) AS INT) + 1), 1, w*h*3)
      AS p
  FROM (SELECT doc_id, text,
          (octet_length(encode(text)) % 64) + 1 AS w,
          (octet_length(encode(text)) % 48) + 1 AS h
        FROM documents))
UNION ALL
-- png probe: the parser's output is bound by ARITHMETIC — a stored-
-- block RGB-8 PNG of w x h pixels is exactly h*(1+w*3) + 68 bytes
-- (sig 8, IHDR 25, IDAT 12+11+raw, IEND 12), and width/height must
-- round-trip through IHDR + inflate + scanline validation.  md5 is
-- NULL on both sides: CRC words aren't SQL-computable.
SELECT 'png', doc_id, 'image/png',
  CAST(h * (1 + w * 3) + 68 AS BIGINT),
  CAST(NULL AS VARCHAR),
  CAST(w AS BIGINT), CAST(h AS BIGINT),
  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
FROM (SELECT doc_id,
        (octet_length(encode(text)) % 64) + 1 AS w,
        (octet_length(encode(text)) % 48) + 1 AS h
      FROM documents)
UNION ALL
SELECT 'frames', doc_id, 'video/fake', NULL, NULL, NULL, NULL,
  CAST(f.frame_no AS BIGINT), CAST(f.frame_no * 1024 AS BIGINT)
FROM documents,
LATERAL (SELECT unnest(range(0,
    least(greatest(octet_length(encode(text)) // 1024, 1), 8))) AS frame_no) f""",
}


def q_knn_filtered(spark, sf_dir):
    """Metadata-filtered exact top-5 (same-label nearest neighbors,
    every 100th vector a query) — the vector-DB filtered-search shape:
    the label equi-join prunes candidates BEFORE any distance math
    (pre-filter strategy, exact recall under selective filters)."""
    from cdc_pipe_line_spark.similarity import filtered_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), "label", "embedding"
    )
    return filtered_topk(q, emb, k=5)


QUERIES["sim_knn_filtered"] = q_knn_filtered

ORACLE["sim_knn_filtered"] = f"""
WITH q AS (
  SELECT vec_id AS q_id, label, embedding AS qv
  FROM embeddings WHERE vec_id % 100 = 0),
scored AS (
  SELECT q.q_id, q.label, e.vec_id,
    {_COS.format(a='q.qv', b='e.embedding')} AS cos_sim
  FROM embeddings e JOIN q ON e.label = q.label
  WHERE e.vec_id != q.q_id)
SELECT q_id, label, vec_id, cos_sim, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM scored) WHERE rank <= 5"""


def q_image_channel_stats(spark, sf_dir):
    """Per-channel pixel means over real decoded netpbm rasters — the
    normalization-constant pass before model input scaling.  Same
    md5-fill PPM construction as mm_image_resize, so the oracle
    replays the channel sums in CLOSED FORM: the byte stream cycles
    with period lcm(32, 3) = 96, within which each channel visits all
    32 md5 positions exactly once (gcd(3, 32) = 1) — so a full cycle
    contributes the same total to every channel, and only the
    sub-cycle remainder needs element-wise replay (<= 93 terms/doc
    instead of w*h*3)."""
    from cdc_pipe_line_spark.multimodal import (
        as_media_table,
        image_channel_stats,
    )

    docs = _t(spark, sf_dir, "documents")
    src = docs.select(
        "doc_id",
        ((F.octet_length("text") % 64) + 1).alias("__w"),
        ((F.octet_length("text") % 48) + 1).alias("__h"),
        "text",
    ).withColumn("__npix", F.col("__w") * F.col("__h") * 3).withColumn(
        "__payload",
        F.concat(
            F.lit("P6\n"),
            F.col("__w").cast("string"), F.lit(" "),
            F.col("__h").cast("string"),
            F.lit("\n255\n"),
            F.expr(
                "substring(repeat(md5(text), cast(floor(__npix / 32) as int) + 1),"
                " 1, __npix)"
            ),
        ).cast("binary"),
    ).withColumn(
        "__payload",
        F.when(
            F.col("doc_id") % 50 == 0, F.lit(b"P6")
        ).otherwise(F.col("__payload")),
    )
    media = as_media_table(
        src, id_col="doc_id", payload_col="__payload",
        media_type="image/ppm",
    )
    return image_channel_stats(media)


QUERIES["mm_image_channel_stats"] = q_image_channel_stats

ORACLE["mm_image_channel_stats"] = """
WITH d AS (
  SELECT doc_id, (octet_length(encode(text)) % 64) + 1 AS w,
         (octet_length(encode(text)) % 48) + 1 AS h, md5(text) AS m
  FROM documents),
x AS (
  SELECT doc_id, w, h, w * h AS wh,
    (w * h) // 32 AS fb, 3 * ((w * h) % 32) AS rem,
    list_sum(list_transform(range(0, 32),
      i -> ascii(substr(m, CAST(i AS INT) + 1, 1)))) AS tot,
    list_transform(range(0, 96),
      r -> ascii(substr(m, CAST(r % 32 AS INT) + 1, 1))) AS cyc
  FROM d),
s AS (
  SELECT doc_id, w, h, wh,
    fb * tot + coalesce(list_sum(list_transform(
      list_filter(range(0, rem), r -> r % 3 = 0),
      r -> cyc[CAST(r AS INT) + 1])), 0) AS rs,
    fb * tot + coalesce(list_sum(list_transform(
      list_filter(range(0, rem), r -> r % 3 = 1),
      r -> cyc[CAST(r AS INT) + 1])), 0) AS gs,
    fb * tot + coalesce(list_sum(list_transform(
      list_filter(range(0, rem), r -> r % 3 = 2),
      r -> cyc[CAST(r AS INT) + 1])), 0) AS bs
  FROM x)
SELECT doc_id AS media_id, CAST(w AS INT) AS w, CAST(h AS INT) AS h,
  CAST(rs AS BIGINT) AS r_sum, CAST(gs AS BIGINT) AS g_sum,
  CAST(bs AS BIGINT) AS b_sum,
  floor(rs / CAST(wh AS DOUBLE) * 1e4 + 0.5) / 1e4 AS r_mean,
  floor(gs / CAST(wh AS DOUBLE) * 1e4 + 0.5) / 1e4 AS g_mean,
  floor(bs / CAST(wh AS DOUBLE) * 1e4 + 0.5) / 1e4 AS b_mean,
  CAST(NULL AS VARCHAR) AS stats_err
FROM s WHERE doc_id % 50 != 0
UNION ALL
SELECT doc_id, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
  'netpbm: truncated header'
FROM d WHERE doc_id % 50 = 0"""


def q_source_centroids(spark, sf_dir):
    """Source-level centroid similarity: per-source mean document
    embedding (element-wise average of the md5-derived 16-dim
    vectors), then pairwise cosine between source centroids — the
    corpus-curation view that surfaces near-duplicate SOURCES (mirror
    sites, re-crawls) rather than near-duplicate documents.

    Scale shape: the centroid is ONE posexplode + hash aggregate on
    (source, dim) — 20 x 16 cells regardless of corpus size — and the
    pairwise cosine runs on the tiny centroid table.  Per-dim means
    floor-pinned to 6dp before the cosine so both engines fold
    identical doubles."""
    docs = _t(spark, sf_dir, "documents")
    dims = F.array(
        *[
            F.ascii(F.substring(F.md5("text"), i, 1)).cast("double")
            for i in range(1, 17)
        ]
    )
    cells = (
        docs.select("source", F.posexplode(dims).alias("pos", "x"))
        .groupBy("source", "pos")
        .agg(
            (F.floor(F.avg("x") * 1e6 + F.lit(0.5)) / 1e6).alias("m")
        )
    )
    cent = (
        cells.groupBy("source")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "m"))
            ).alias("pm")
        )
        .select(
            "source",
            F.expr("transform(pm, s -> s.m)").alias("v"),
        )
        .localCheckpoint(eager=True)
    )
    dot = F.expr(
        "aggregate(zip_with(a.v, b.v, (x, y) -> x * y),"
        " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    na = F.sqrt(
        F.expr(
            "aggregate(transform(a.v, x -> x * x),"
            " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
    )
    nb = F.sqrt(
        F.expr(
            "aggregate(transform(b.v, x -> x * x),"
            " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
    )
    pairs = (
        cent.alias("a")
        .join(
            cent.alias("b"),
            F.col("a.source") < F.col("b.source"),
        )
        .select(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
            (
                F.floor(dot / (na * nb) * 10000 + F.lit(0.5)) / 10000
            ).alias("centroid_cos"),
        )
    )
    return pairs


QUERIES["sim_source_centroids"] = q_source_centroids

ORACLE["sim_source_centroids"] = """
WITH emb AS (
  SELECT source,
    list_transform(range(1, 17),
      i -> CAST(ascii(substr(md5(text), CAST(i AS INT), 1)) AS DOUBLE))
      AS v
  FROM documents),
cells AS (
  SELECT source, pos, floor(avg(x) * 1e6 + 0.5) / 1e6 AS m
  FROM (
    SELECT source, unnest(range(1, 17)) AS pos, unnest(v) AS x
    FROM emb)
  GROUP BY 1, 2),
cent AS (
  SELECT source, list(m ORDER BY pos) AS v FROM cells GROUP BY 1)
SELECT a.source AS src_a, b.source AS src_b,
  floor(
    list_sum(list_transform(range(1, 17),
      i -> a.v[CAST(i AS INT)] * b.v[CAST(i AS INT)]))
    / (sqrt(list_sum(list_transform(range(1, 17),
        i -> a.v[CAST(i AS INT)] * a.v[CAST(i AS INT)])))
       * sqrt(list_sum(list_transform(range(1, 17),
        i -> b.v[CAST(i AS INT)] * b.v[CAST(i AS INT)]))))
    * 10000 + 0.5) / 10000 AS centroid_cos
FROM cent a JOIN cent b ON a.source < b.source"""


def q_recall_at_k(spark, sf_dir):
    """ANN evaluation readout — recall@k (k = 1, 5, 10) of the
    hyperplane-LSH path against exact brute force, per the "measure,
    don't guess" rule: the number every ANN deployment decision
    hangs on, produced by the engine itself.  Both pipelines are the
    registered ones (literal planes, md5-free exact cosine), the
    truth and candidate top-10 sets join on (q_id, vec_id), and
    recall is hits/k averaged over queries — all integer counting
    until the final division."""
    from cdc_pipe_line_spark.similarity import brute_force_topk, lsh_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    truth = brute_force_topk(q, emb, k=10).select(
        "q_id", "vec_id", F.col("rank").alias("t_rank")
    ).localCheckpoint(eager=True)
    approx = lsh_topk(q, emb, k=10, n_planes=6, dim=64).select(
        "q_id", "vec_id", F.lit(1).alias("hit")
    ).localCheckpoint(eager=True)
    j = truth.join(approx, ["q_id", "vec_id"], "left")
    fl = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000
    per_q = j.groupBy("q_id").agg(
        *[
            F.sum(
                F.when(
                    (F.col("t_rank") <= k) & F.col("hit").isNotNull(), 1
                ).otherwise(0)
            ).alias(f"h{k}")
            for k in (1, 5, 10)
        ]
    )
    n_q = F.count("*").cast("double")
    return per_q.agg(
        F.count("*").alias("n_queries"),
        fl(F.sum("h1") / n_q).alias("recall_at_1"),
        fl(F.sum("h5") / (n_q * 5)).alias("recall_at_5"),
        fl(F.sum("h10") / (n_q * 10)).alias("recall_at_10"),
    )


QUERIES["sim_recall_at_k"] = q_recall_at_k

ORACLE["sim_recall_at_k"] = f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS qv FROM embeddings
  WHERE vec_id % 100 = 0),
truth AS (
  SELECT q_id, vec_id, rank AS t_rank FROM (
    SELECT q.q_id, e.vec_id,
      row_number() OVER (PARTITION BY q.q_id
        ORDER BY {_COS.format(a='q.qv', b='e.embedding')} DESC,
                 e.vec_id ASC) AS rank
    FROM embeddings e CROSS JOIN q WHERE e.vec_id != q.q_id)
  WHERE rank <= 10),
cb AS (
  SELECT vec_id, embedding, {_lsh_bucket_sql('embedding')} AS bucket
  FROM embeddings),
qb AS (
  SELECT vec_id AS q_id, embedding AS qv, bucket
  FROM cb WHERE vec_id % 100 = 0),
approx AS (
  SELECT q_id, vec_id FROM (
    SELECT qb.q_id, cb.vec_id,
      row_number() OVER (PARTITION BY qb.q_id
        ORDER BY {_COS.format(a='qb.qv', b='cb.embedding')} DESC,
                 cb.vec_id ASC) AS rank
    FROM cb JOIN qb USING (bucket) WHERE cb.vec_id != qb.q_id)
  WHERE rank <= 10),
j AS (
  SELECT t.q_id, t.t_rank,
    CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM truth t LEFT JOIN approx a
    ON a.q_id = t.q_id AND a.vec_id = t.vec_id),
per_q AS (
  SELECT q_id,
    sum(CASE WHEN t_rank <= 1 THEN hit ELSE 0 END) AS h1,
    sum(CASE WHEN t_rank <= 5 THEN hit ELSE 0 END) AS h5,
    sum(CASE WHEN t_rank <= 10 THEN hit ELSE 0 END) AS h10
  FROM j GROUP BY 1)
SELECT count(*) AS n_queries,
  floor(CAST(sum(h1) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000
    AS recall_at_1,
  floor(CAST(sum(h5) AS DOUBLE) / (count(*) * 5) * 10000 + 0.5)
    / 10000 AS recall_at_5,
  floor(CAST(sum(h10) AS DOUBLE) / (count(*) * 10) * 10000 + 0.5)
    / 10000 AS recall_at_10
FROM per_q"""


def q_bmp_decode(spark, sf_dir):
    """24-bpp BMP decode over REAL bytes: genuine file+info headers,
    BGR byte order, 4-byte row padding, and BOTH raster directions —
    bottom-up (positive biHeight, every non-multiple-of-3 id) and
    top-down (negative biHeight) — decoded by one Arrow-batched
    mapInPandas pass.  Pixels are the closed-form gradient
    ``(base + 2x + 5y) % 256`` (and channel-specific twins), so the
    oracle replays channel sums and both orientation-normalized
    corners exactly; every 61st payload is truncated mid-pixel-array
    and quarantines with the precise reason.  The corner values bind
    the row flip AND the padding skip — a decoder that forgets
    either fails the hash."""
    import numpy as np

    from cdc_pipe_line_spark.multimodal import bmp_stats, make_bmp24

    @F.pandas_udf("binary")
    def _bmp_payload(
        w: pd.Series, h: pd.Series, base: pd.Series,
        td: pd.Series, cut: pd.Series,
    ) -> pd.Series:
        out = []
        for a, b, v0, t, k in zip(w, h, base, td, cut):
            a, b, v0 = int(a), int(b), int(v0)
            xs = np.arange(a, dtype=np.int64)[None, :]
            ys = np.arange(b, dtype=np.int64)[:, None]
            arr = np.stack(
                [
                    (v0 + 2 * xs + 5 * ys) % 256,
                    (v0 + 3 * xs + 1 * ys) % 256,
                    (v0 + 1 * xs + 7 * ys) % 256,
                ],
                axis=2,
            ).astype(np.uint8)
            enc = make_bmp24(arr, topdown=bool(t))
            if k:
                enc = enc[:-3]
            out.append(enc)
        return pd.Series(out, dtype=object)

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        ((F.col("doc_id") % 13) + 3).alias("__w"),
        ((F.col("doc_id") % 7) + 3).alias("__h"),
        (F.col("doc_id") % 97).alias("__base"),
        (F.col("doc_id") % 3 == 0).alias("__td"),
        (F.col("doc_id") % 61 == 0).alias("__cut"),
    )
    media = as_media_table(
        docs,
        id_col="doc_id",
        payload_col=_bmp_payload("__w", "__h", "__base", "__td", "__cut"),
        media_type="image/bmp",
    )
    return bmp_stats(media)


QUERIES["mm_bmp_decode"] = q_bmp_decode

ORACLE["mm_bmp_decode"] = """
WITH p AS (
  SELECT doc_id,
    (doc_id % 13) + 3 AS w,
    (doc_id % 7) + 3 AS h,
    doc_id % 97 AS base,
    doc_id % 3 = 0 AS topdown,
    doc_id % 61 = 0 AS cut
  FROM documents),
px AS (
  SELECT doc_id, unnest(range(0, w * h)) AS i FROM p),
vals AS (
  SELECT px.doc_id,
    (p.base + 2 * (i % p.w) + 5 * (i // p.w)) % 256 AS r,
    (p.base + 3 * (i % p.w) + 1 * (i // p.w)) % 256 AS g,
    (p.base + 1 * (i % p.w) + 7 * (i // p.w)) % 256 AS b
  FROM px JOIN p ON p.doc_id = px.doc_id),
agg AS (
  SELECT doc_id,
    CAST(sum(r) AS BIGINT) AS r_sum,
    CAST(sum(g) AS BIGINT) AS g_sum,
    CAST(sum(b) AS BIGINT) AS b_sum
  FROM vals GROUP BY 1)
SELECT p.doc_id AS media_id,
  CASE WHEN cut THEN NULL ELSE CAST(w AS INT) END AS w,
  CASE WHEN cut THEN NULL ELSE CAST(h AS INT) END AS h,
  CASE WHEN cut THEN NULL ELSE topdown END AS topdown,
  CASE WHEN cut THEN NULL ELSE agg.r_sum END AS r_sum,
  CASE WHEN cut THEN NULL ELSE agg.g_sum END AS g_sum,
  CASE WHEN cut THEN NULL ELSE agg.b_sum END AS b_sum,
  CASE WHEN cut THEN NULL ELSE CAST(base AS INT) END AS corner_tl_r,
  CASE WHEN cut THEN NULL
    ELSE CAST((base + 2 * (w - 1) + 5 * (h - 1)) % 256 AS INT)
  END AS corner_br_r,
  CASE WHEN cut THEN 'bmp: truncated pixel array'
       ELSE CAST(NULL AS VARCHAR) END AS decode_err
FROM p JOIN agg ON agg.doc_id = p.doc_id"""


def q_mmr_rerank(spark, sf_dir):
    """Maximal Marginal Relevance diversified re-ranking (Carbonell &
    Goldstein 1998) — the retrieval-serving step between ANN top-k
    and what a RAG pipeline actually feeds the model: from each
    query's exact top-20, greedily select 5 maximizing
    ``0.7*rel - 0.3*max_sim_to_selected``, ties broken (score desc,
    vec_id asc).  Every greedy step is hash-bound: the oracle unrolls
    the identical four selection stages (MATERIALIZED — the chained
    CTEs would otherwise inline exponentially), so a wrong max-sim
    join or tie-break at ANY step fails the driver check.

    Scale shape: the candidate frame (queries x 20) and its pairwise
    sims (queries x 20 x 19, both checkpoint-pinned) are the ONLY
    inputs to the greedy loop — corpus-scale work ends at the top-20
    subtree; each unrolled step is joins over the bounded candidate
    frame with per-query windows."""
    from pyspark.sql.window import Window

    from cdc_pipe_line_spark.similarity import brute_force_topk, cosine

    q, emb = _queries_and_corpus(spark, sf_dir)
    cand = brute_force_topk(q, emb, k=20).localCheckpoint(eager=True)
    ce = cand.select("q_id", "vec_id", "cos_sim").join(
        emb.select("vec_id", "embedding"), "vec_id"
    )
    pair = (
        ce.alias("x")
        .join(ce.alias("y"), "q_id")
        .filter(F.col("x.vec_id") != F.col("y.vec_id"))
        .select(
            "q_id",
            F.col("x.vec_id").alias("a"),
            F.col("y.vec_id").alias("b"),
            F.round(
                cosine(F.col("x.embedding"), F.col("y.embedding")), 4
            ).alias("s"),
        )
        .localCheckpoint(eager=True)
    )
    sel = (
        cand.filter(F.col("rank") == 1)
        .select(
            "q_id",
            "vec_id",
            "cos_sim",
            F.lit(1).cast("bigint").alias("pos"),
            F.col("cos_sim").alias("mmr_score"),
        )
        .localCheckpoint(eager=True)
    )
    for pos in range(2, 6):
        remaining = cand.select("q_id", "vec_id", "cos_sim").join(
            sel.select("q_id", "vec_id"), ["q_id", "vec_id"], "left_anti"
        )
        ms = (
            pair.join(
                sel.select("q_id", F.col("vec_id").alias("b")),
                ["q_id", "b"],
                "semi",
            )
            .groupBy("q_id", F.col("a").alias("vec_id"))
            .agg(F.max("s").alias("__ms"))
        )
        scored = remaining.join(ms, ["q_id", "vec_id"]).withColumn(
            "__score",
            F.lit(0.7) * F.col("cos_sim") - F.lit(0.3) * F.col("__ms"),
        )
        wpick = Window.partitionBy("q_id").orderBy(
            F.desc("__score"), F.asc("vec_id")
        )
        nxt = (
            scored.withColumn("__p", F.row_number().over(wpick))
            .filter(F.col("__p") == 1)
            .select(
                "q_id",
                "vec_id",
                "cos_sim",
                F.lit(pos).cast("bigint").alias("pos"),
                F.col("__score").alias("mmr_score"),
            )
        )
        sel = sel.unionByName(nxt).localCheckpoint(eager=True)
    return sel.select(
        "q_id",
        "vec_id",
        "pos",
        "cos_sim",
        (F.floor(F.col("mmr_score") * 10000 + F.lit(0.5)) / 10000).alias(
            "mmr_score"
        ),
    )


QUERIES["sim_mmr_rerank"] = q_mmr_rerank


def _mmr_oracle_sql() -> str:
    cos_qc = _COS.format(a="mq.qv", b="e.embedding")
    cos_cc = _COS.format(a="ex.embedding", b="ey.embedding")
    steps = []
    for i in range(2, 6):
        p = i - 1
        steps.append(
            f"""msel{i} AS MATERIALIZED (
  SELECT * FROM msel{p}
  UNION ALL
  SELECT q_id, vec_id, cos_sim, {i} AS pos, score AS mmr_score FROM (
    SELECT c.q_id, c.vec_id, c.cos_sim,
      CAST(0.7 AS DOUBLE) * c.cos_sim
        - CAST(0.3 AS DOUBLE) * m.ms AS score,
      row_number() OVER (PARTITION BY c.q_id
        ORDER BY (CAST(0.7 AS DOUBLE) * c.cos_sim
                  - CAST(0.3 AS DOUBLE) * m.ms) DESC,
                 c.vec_id ASC) AS rk
    FROM mcand c
    JOIN (SELECT p2.q_id, p2.a, max(p2.s) AS ms FROM mpair p2
          JOIN msel{p} s ON s.q_id = p2.q_id AND s.vec_id = p2.b
          GROUP BY 1, 2) m
      ON m.q_id = c.q_id AND m.a = c.vec_id
    WHERE NOT EXISTS (SELECT 1 FROM msel{p} s2
      WHERE s2.q_id = c.q_id AND s2.vec_id = c.vec_id))
  WHERE rk = 1)"""
        )
    return f"""
WITH mq AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings
            WHERE vec_id % 100 = 0),
mscored AS MATERIALIZED (
  SELECT mq.q_id, e.vec_id, {cos_qc} AS cos_sim
  FROM embeddings e CROSS JOIN mq WHERE e.vec_id != mq.q_id),
mcand AS MATERIALIZED (
  SELECT q_id, vec_id, cos_sim FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
      ORDER BY cos_sim DESC, vec_id ASC) AS rank
    FROM mscored) WHERE rank <= 20),
mpair AS MATERIALIZED (
  SELECT x.q_id, x.vec_id AS a, y.vec_id AS b, {cos_cc} AS s
  FROM mcand x JOIN mcand y
    ON x.q_id = y.q_id AND x.vec_id != y.vec_id
  JOIN embeddings ex ON ex.vec_id = x.vec_id
  JOIN embeddings ey ON ey.vec_id = y.vec_id),
msel1 AS MATERIALIZED (
  SELECT q_id, vec_id, cos_sim, 1 AS pos, cos_sim AS mmr_score FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
      ORDER BY cos_sim DESC, vec_id ASC) AS rk
    FROM mcand) WHERE rk = 1),
{",".join(steps)}
SELECT q_id, vec_id, CAST(pos AS BIGINT) AS pos, cos_sim,
  floor(mmr_score * 10000 + 0.5) / 10000 AS mmr_score
FROM msel5"""


ORACLE["sim_mmr_rerank"] = _mmr_oracle_sql()


def q_tiff_decode(spark, sf_dir):
    """Baseline-TIFF decode over REAL bytes: IFD walk with BOTH byte
    orders (II on even ids, MM on odd — reusing the EXIF TIFF
    dispatch), SHORT values left-justified in the value slot,
    MULTI-STRIP pixel assembly with the strip offset/count arrays
    stored via IFD offset indirection (value-vs-pointer is the
    layout wrinkle that separates a real IFD walker from a
    happy-path one; ``n_strips`` binds it — reading only strip 0
    fails pix_sum and corner_br).  Pixels are the closed-form
    gradient ``(base + 3x + 5y) % 256``; every 67th payload carries
    a corrupt magic and quarantines with the precise reason."""
    import numpy as np

    from cdc_pipe_line_spark.multimodal import make_tiff_gray, tiff_gray_stats

    @F.pandas_udf("binary")
    def _tiff_payload(
        w: pd.Series, h: pd.Series, base: pd.Series,
        le: pd.Series, cut: pd.Series,
    ) -> pd.Series:
        out = []
        for a, b, v0, l, k in zip(w, h, base, le, cut):
            a, b, v0 = int(a), int(b), int(v0)
            xs = np.arange(a, dtype=np.int64)[None, :]
            ys = np.arange(b, dtype=np.int64)[:, None]
            arr = ((v0 + 3 * xs + 5 * ys) % 256).astype(np.uint8)
            enc = make_tiff_gray(arr, little_endian=bool(l))
            if k:
                bo = enc[:2]
                fmt = "<H" if bo == b"II" else ">H"
                enc = bo + __import__("struct").pack(fmt, 43) + enc[4:]
            out.append(enc)
        return pd.Series(out, dtype=object)

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        ((F.col("doc_id") % 11) + 4).alias("__w"),
        ((F.col("doc_id") % 6) + 4).alias("__h"),
        (F.col("doc_id") % 89).alias("__base"),
        (F.col("doc_id") % 2 == 0).alias("__le"),
        (F.col("doc_id") % 67 == 0).alias("__cut"),
    )
    media = as_media_table(
        docs,
        id_col="doc_id",
        payload_col=_tiff_payload("__w", "__h", "__base", "__le", "__cut"),
        media_type="image/tiff",
    )
    return tiff_gray_stats(media)


QUERIES["mm_tiff_decode"] = q_tiff_decode

ORACLE["mm_tiff_decode"] = """
WITH p AS (
  SELECT doc_id,
    (doc_id % 11) + 4 AS w,
    (doc_id % 6) + 4 AS h,
    doc_id % 89 AS base,
    doc_id % 67 = 0 AS cut
  FROM documents),
px AS (
  SELECT doc_id, unnest(range(0, w * h)) AS i FROM p),
vals AS (
  SELECT px.doc_id,
    (p.base + 3 * (i % p.w) + 5 * (i // p.w)) % 256 AS v
  FROM px JOIN p ON p.doc_id = px.doc_id),
agg AS (
  SELECT doc_id,
    CAST(sum(v) AS BIGINT) AS pix_sum,
    CAST(min(v) AS INT) AS pix_min,
    CAST(max(v) AS INT) AS pix_max
  FROM vals GROUP BY 1)
SELECT p.doc_id AS media_id,
  CASE WHEN cut THEN NULL ELSE CAST(w AS INT) END AS w,
  CASE WHEN cut THEN NULL ELSE CAST(h AS INT) END AS h,
  CASE WHEN cut THEN NULL ELSE 2 END AS n_strips,
  CASE WHEN cut THEN NULL ELSE agg.pix_sum END AS pix_sum,
  CASE WHEN cut THEN NULL ELSE agg.pix_min END AS pix_min,
  CASE WHEN cut THEN NULL ELSE agg.pix_max END AS pix_max,
  CASE WHEN cut THEN NULL ELSE CAST(base AS INT) END AS corner_tl,
  CASE WHEN cut THEN NULL
    ELSE CAST((base + 3 * (w - 1) + 5 * (h - 1)) % 256 AS INT)
  END AS corner_br,
  CASE WHEN cut THEN 'tiff: bad magic 43'
       ELSE CAST(NULL AS VARCHAR) END AS decode_err
FROM p JOIN agg ON agg.doc_id = p.doc_id"""


def q_srt_parse(spark, sf_dir):
    """SubRip (.srt) subtitle PARSING — the caption sidecar every
    video-corpus pipeline ingests next to the MP4 track (cue index,
    ``HH:MM:SS,mmm --> HH:MM:SS,mmm`` time range, text payload):
    genuine SRT bytes are built per document (closed-form cue count,
    offsets, durations), then parsed back ENTIRELY with engine
    string operators — block split on blank lines, regexp timestamp
    extraction, integer millisecond reassembly — no UDF.  The
    oracle computes the expected per-doc aggregates straight from
    the closed form, so a parser that drops a cue, misreads the
    comma-millisecond field, or miscounts multi-word payloads fails
    the hash.  Malformed every-71st docs carry a corrupted arrow
    separator and must quarantine (cue count 0 + flag)."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        ((F.col("doc_id") % 5) + 1).alias("__n"),
        (F.col("doc_id") % 7).alias("__o"),
        (F.col("doc_id") % 13).alias("__d"),
        (F.col("doc_id") % 71 == 0).alias("__bad"),
    )

    def ts_expr(ms_col):
        h = (ms_col / 3600000).cast("bigint")
        m = ((ms_col % 3600000) / 60000).cast("bigint")
        s = ((ms_col % 60000) / 1000).cast("bigint")
        ms = (ms_col % 1000).cast("bigint")
        return F.concat(
            F.lpad(h.cast("string"), 2, "0"), F.lit(":"),
            F.lpad(m.cast("string"), 2, "0"), F.lit(":"),
            F.lpad(s.cast("string"), 2, "0"), F.lit(","),
            F.lpad(ms.cast("string"), 3, "0"),
        )

    cue = F.transform(
        F.sequence(F.lit(0), F.col("__n") - 1),
        lambda i: F.concat(
            (i + 1).cast("string"),
            F.lit("\n"),
            ts_expr(F.lit(10000) * i + F.col("__o") * 111),
            F.when(F.col("__bad"), F.lit(" ==> ")).otherwise(
                F.lit(" --> ")
            ),
            ts_expr(
                F.lit(10000) * i
                + F.col("__o") * 111
                + F.lit(900)
                + F.col("__d") * 37
            ),
            F.lit("\n"),
            F.format_string("line %s cue %s", F.col("doc_id"), i),
        ),
    )
    srt = docs.select(
        "doc_id", F.array_join(cue, "\n\n").alias("payload")
    )
    # ---- the parser: engine string ops only ----
    blocks = srt.select(
        "doc_id", F.explode(F.split("payload", "\n\n")).alias("b")
    )
    ts_re = r"(\d{2}):(\d{2}):(\d{2}),(\d{3}) --> (\d{2}):(\d{2}):(\d{2}),(\d{3})"

    def ms(prefix_group):
        g = prefix_group
        return (
            F.regexp_extract("b", ts_re, g).cast("bigint") * 3600000
            + F.regexp_extract("b", ts_re, g + 1).cast("bigint") * 60000
            + F.regexp_extract("b", ts_re, g + 2).cast("bigint") * 1000
            + F.regexp_extract("b", ts_re, g + 3).cast("bigint")
        )

    parsed = blocks.select(
        "doc_id",
        F.when(F.regexp_extract("b", ts_re, 1) != "", ms(1)).alias("__s"),
        F.when(F.regexp_extract("b", ts_re, 1) != "", ms(5)).alias("__e"),
        F.element_at(F.split("b", "\n"), 3).alias("__txt"),
    )
    return parsed.groupBy("doc_id").agg(
        F.sum(F.col("__s").isNotNull().cast("bigint")).alias("n_cues"),
        F.coalesce(
            F.sum(F.col("__e") - F.col("__s")), F.lit(0)
        ).cast("bigint").alias("total_ms"),
        F.sum(
            F.when(
                F.col("__s").isNotNull(),
                F.size(F.split(F.col("__txt"), " ")),
            ).otherwise(0)
        ).cast("bigint").alias("n_words"),
        (F.sum(F.col("__s").isNull().cast("bigint")) > 0).alias("malformed"),
    )


QUERIES["mm_srt_parse"] = q_srt_parse

ORACLE["mm_srt_parse"] = """
WITH p AS (
  SELECT doc_id,
    (doc_id % 5) + 1 AS n,
    doc_id % 71 = 0 AS bad,
    (doc_id % 13) AS d
  FROM documents)
SELECT doc_id,
  CASE WHEN bad THEN 0 ELSE CAST(n AS BIGINT) END AS n_cues,
  CASE WHEN bad THEN 0
       ELSE CAST(n * (900 + d * 37) AS BIGINT) END AS total_ms,
  CASE WHEN bad THEN 0 ELSE CAST(4 * n AS BIGINT) END AS n_words,
  bad AS malformed
FROM p"""


def q_id3_tags(spark, sf_dir):
    """MP3 ID3v2.3 metadata extraction over genuine tag bytes — the
    audio-corpus catalog pass (title/artist/duration before any
    signal work): SYNCSAFE total-size decode (the fixture's padding
    pushes every tag past 127 bytes, so a plain-u32 size reader
    misreads and fails the hash), plain-u32 frame walk, latin-1 text
    frames, padding-area stop, MPEG frame-sync check after the tag.
    Every 73rd payload has a corrupt magic and quarantines."""
    from cdc_pipe_line_spark.multimodal import id3_tags, make_id3v2

    @F.pandas_udf("binary")
    def _id3_payload(
        did: pd.Series, pad: pd.Series, cut: pd.Series
    ) -> pd.Series:
        out = []
        for i, p, k in zip(did, pad, cut):
            i, p = int(i), int(p)
            enc = make_id3v2(
                title=f"Track {i}",
                artist=f"Artist {i % 10}",
                length_ms=1000 * (i % 60 + 30),
                padding=p,
            )
            if k:
                enc = b"XX3" + enc[3:]
            out.append(enc)
        return pd.Series(out, dtype=object)

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        ((F.col("doc_id") % 300) + 120).alias("__pad"),
        (F.col("doc_id") % 73 == 0).alias("__cut"),
    )
    media = as_media_table(
        docs,
        id_col="doc_id",
        payload_col=_id3_payload("doc_id", "__pad", "__cut"),
        media_type="audio/mpeg",
    )
    return id3_tags(media)


QUERIES["mm_id3_tags"] = q_id3_tags

ORACLE["mm_id3_tags"] = """
WITH p AS (
  SELECT doc_id,
    (doc_id % 300) + 120 AS pad,
    doc_id % 73 = 0 AS cut,
    length(CAST(doc_id AS VARCHAR)) AS dl
  FROM documents)
SELECT doc_id AS media_id,
  CASE WHEN cut THEN NULL ELSE '2.3.0' END AS version,
  CASE WHEN cut THEN NULL
    ELSE CAST(52 + dl + pad AS BIGINT) END AS tag_size,
  CASE WHEN cut THEN NULL ELSE CAST(3 AS BIGINT) END AS n_frames,
  CASE WHEN cut THEN NULL
    ELSE 'Track ' || CAST(doc_id AS VARCHAR) END AS title,
  CASE WHEN cut THEN NULL
    ELSE 'Artist ' || CAST(doc_id % 10 AS VARCHAR) END AS artist,
  CASE WHEN cut THEN NULL
    ELSE CAST(1000 * (doc_id % 60 + 30) AS BIGINT) END AS length_ms,
  CASE WHEN cut THEN NULL ELSE TRUE END AS has_audio,
  CASE WHEN cut THEN 'id3: missing ID3 magic'
       ELSE CAST(NULL AS VARCHAR) END AS decode_err
FROM p"""


QUERIES["mm_jpeg_progressive_dc"] = q_jpeg_progressive_dc

ORACLE["mm_jpeg_progressive_dc"] = """
WITH p AS (
  SELECT doc_id,
    8 * ((doc_id % 3) + 1) AS w,
    8 * ((doc_id % 2) + 1) AS h,
    100 + 2 * (doc_id % 20) AS base,
    doc_id % 53 = 0 AS cut
  FROM documents),
blocks AS (
  SELECT doc_id, unnest(range(0, (w // 8) * (h // 8))) AS b
  FROM p),
agg AS (
  SELECT blocks.doc_id,
    CAST(sum(p.base + 2 * (b % 5)) AS BIGINT) AS pv_sum,
    CAST(min(p.base + 2 * (b % 5)) AS INT) AS pv_min,
    CAST(max(p.base + 2 * (b % 5)) AS INT) AS pv_max,
    CAST(max(CASE WHEN b = 0 THEN p.base + 2 * (b % 5) END) AS INT)
      AS corner_tl,
    CAST(max(CASE WHEN b = (p.w // 8) * (p.h // 8) - 1
      THEN p.base + 2 * (b % 5) END) AS INT) AS corner_br
  FROM blocks JOIN p ON p.doc_id = blocks.doc_id
  GROUP BY 1)
SELECT p.doc_id AS media_id,
  CASE WHEN cut THEN NULL ELSE CAST(w AS INT) END AS w,
  CASE WHEN cut THEN NULL ELSE CAST(h AS INT) END AS h,
  CASE WHEN cut THEN NULL ELSE 0 END AS al,
  CASE WHEN cut THEN NULL ELSE CAST(w // 8 AS INT) END AS pv_w,
  CASE WHEN cut THEN NULL ELSE CAST(h // 8 AS INT) END AS pv_h,
  CASE WHEN cut THEN NULL ELSE agg.pv_sum END AS pv_sum,
  CASE WHEN cut THEN NULL ELSE agg.pv_min END AS pv_min,
  CASE WHEN cut THEN NULL ELSE agg.pv_max END AS pv_max,
  CASE WHEN cut THEN NULL ELSE agg.corner_tl END AS corner_tl,
  CASE WHEN cut THEN NULL ELSE agg.corner_br END AS corner_br,
  CASE WHEN cut THEN 'jpeg: truncated before SOS'
       ELSE CAST(NULL AS VARCHAR) END AS decode_err
FROM p JOIN agg ON agg.doc_id = p.doc_id"""


def q_jpeg_progressive_decode(spark, sf_dir):
    """FULL progressive JPEG decode (multimodal.
    make_jpeg_gray_progressive_full / _jpeg_progressive_pixels):
    every document becomes a genuine SIX-scan SOF2 file — DC scan at
    Al=1, DC successive-approximation refinement (Ah=1), two AC
    spectral-selection bands (1..5, 6..63) first-passed at Al=1 with
    REAL accumulated EOB runs, then two AC REFINEMENT scans
    (Ah=1/Al=0: newly-significant run/1 coding + correction-sweeping
    EOB runs — libjpeg's default progressive script shape) — and the
    decoder replays all six scans into the coefficient state before
    one IDCT.  Blocks are per-block
    constants ``base + 2*(b % 5)`` (even values, quant 16): DC
    quantizes losslessly and every AC is zero, so the AC scans are
    pure cross-block EOB runs — the decoder's EOBRUN arithmetic is
    load-bearing for the hash, and full-raster pixel stats stay
    closed-form in doc_id for the oracle.  Every 59th payload is cut
    inside the APP0 segment for the quarantine leg.  General content
    (dense ACs, ZRL, clipping) is pinned in
    tests/test_multimodal_codec.py by cross-decoder equality with the
    baseline path on random rasters.

    Scale shape: one Arrow-batched mapInPandas pass, one narrow row
    per image, no shuffle."""
    import numpy as np

    @F.pandas_udf("binary")
    def _payload(
        w: pd.Series, h: pd.Series, base: pd.Series, cut: pd.Series
    ) -> pd.Series:
        out = []
        for a, b, v0, k in zip(w, h, base, cut):
            a, b, v0 = int(a), int(b), int(v0)
            arr = np.zeros((b, a), dtype=np.uint8)
            blk = 0
            for by in range(b // 8):
                for bx in range(a // 8):
                    arr[
                        by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                    ] = v0 + 2 * (blk % 5)
                    blk += 1
            enc = make_jpeg_gray_progressive_full(arr, ac_successive=True)
            out.append(enc[:20] if k else enc)
        return pd.Series(out, dtype=object)

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (8 * ((F.col("doc_id") % 4) + 1)).alias("__w"),
        (8 * ((F.col("doc_id") % 2) + 1)).alias("__h"),
        (100 + 2 * (F.col("doc_id") % 20)).alias("__base"),
        (F.col("doc_id") % 59 == 0).alias("__cut"),
    )
    media = as_media_table(
        docs,
        id_col="doc_id",
        payload_col=_payload("__w", "__h", "__base", "__cut"),
        media_type="image/jpeg",
    )
    return jpeg_progressive_gray_stats(media)


QUERIES["mm_jpeg_progressive_decode"] = q_jpeg_progressive_decode

ORACLE["mm_jpeg_progressive_decode"] = """
WITH p AS (
  SELECT doc_id,
    8 * ((doc_id % 4) + 1) AS w,
    8 * ((doc_id % 2) + 1) AS h,
    100 + 2 * (doc_id % 20) AS base,
    doc_id % 59 = 0 AS cut
  FROM documents),
blocks AS (
  SELECT doc_id, unnest(range(0, (w // 8) * (h // 8))) AS b
  FROM p),
agg AS (
  SELECT blocks.doc_id,
    CAST(sum(64 * (p.base + 2 * (b % 5))) AS BIGINT) AS pix_sum,
    CAST(min(p.base + 2 * (b % 5)) AS INT) AS pix_min,
    CAST(max(p.base + 2 * (b % 5)) AS INT) AS pix_max,
    CAST(max(CASE WHEN b = 0 THEN p.base + 2 * (b % 5) END) AS INT)
      AS corner_tl,
    CAST(max(CASE WHEN b = (p.w // 8) * (p.h // 8) - 1
      THEN p.base + 2 * (b % 5) END) AS INT) AS corner_br
  FROM blocks JOIN p ON p.doc_id = blocks.doc_id
  GROUP BY 1)
SELECT p.doc_id AS media_id,
  CASE WHEN cut THEN NULL ELSE CAST(w AS INT) END AS w,
  CASE WHEN cut THEN NULL ELSE CAST(h AS INT) END AS h,
  CASE WHEN cut THEN NULL
    ELSE CAST((w // 8) * (h // 8) AS INT) END AS n_blocks,
  CASE WHEN cut THEN NULL ELSE agg.pix_sum END AS pix_sum,
  CASE WHEN cut THEN NULL ELSE agg.pix_min END AS pix_min,
  CASE WHEN cut THEN NULL ELSE agg.pix_max END AS pix_max,
  CASE WHEN cut THEN NULL ELSE agg.corner_tl END AS corner_tl,
  CASE WHEN cut THEN NULL ELSE agg.corner_br END AS corner_br,
  CASE WHEN cut THEN 'jpeg: missing EOI'
       ELSE CAST(NULL AS VARCHAR) END AS decode_err
FROM p JOIN agg ON agg.doc_id = p.doc_id"""
