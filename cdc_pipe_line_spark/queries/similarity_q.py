"""Similarity-search + multimodal queries (north-star ops) over
``embeddings`` and ``documents``.

The cosine oracle hand-rolls the same left-to-right double-precision
fold as the Spark implementation (similarity.py), so values match to
the last ulp before the defensive round(4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_pipe_line_spark.multimodal import (
    as_media_table,
    embed_media,
    extract_media_meta,
    sample_frames,
)
from cdc_pipe_line_spark.similarity import (
    brute_force_topk,
    cosine_near_dup_pairs,
    ivf_topk,
    lsh_topk,
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
    Rows-only check: recall vs. brute force is probabilistic by
    design (compared explicitly in tests)."""
    q, emb = _queries_and_corpus(spark, sf_dir)
    return lsh_topk(q, emb, k=10, n_planes=6, dim=64)


def q_knn_ivf(spark, sf_dir):
    """IVF (mini-k-means inverted lists, 4-of-16 probes) top-10 — the
    second ANN scale path.  Rows-only check: probe recall is
    approximate by design (compared vs. brute force in tests)."""
    q, emb = _queries_and_corpus(spark, sf_dir)
    return ivf_topk(q, emb, k=10, n_centroids=16, n_probe=4)


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
      mapInPandas metadata extraction (decode stubbed
      deterministically);
    - ``frames``: frame-sampling fanout via byte-offset arithmetic
      (sequence+explode, pure column expressions).
    """
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
    return meta.unionByName(frames)


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


_COS = (
    "round(list_sum(list_transform(range(1, 65), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))) / "
    "(sqrt(list_sum(list_transform(range(1, 65), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)))) * "
    "sqrt(list_sum(list_transform(range(1, 65), "
    "i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))))), 4)"
)

QUERIES = {
    "sim_knn_bruteforce": q_knn_bruteforce,
    "sim_knn_lsh": q_knn_lsh,
    "sim_knn_ivf": q_knn_ivf,
    "sim_cosine_near_dup": q_cosine_near_dup,
    "mm_media_pipeline": q_media_pipeline,
    "mm_media_embed_knn": q_media_embed_knn,
}

ORACLE = {
    "sim_knn_bruteforce": f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id % 100 = 0),
scored AS (
  SELECT q.q_id, e.vec_id,
    {_COS.format(a='q.qv', b='e.embedding')} AS cos_sim
  FROM embeddings e CROSS JOIN q WHERE e.vec_id != q.q_id)
SELECT q_id, vec_id, cos_sim, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
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
    "mm_media_pipeline": """
SELECT 'meta' AS probe, doc_id AS media_id, 'image/fake' AS media_type,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  md5(text) AS content_md5,
  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
  CAST(octet_length(encode(text)) % 480 AS BIGINT) AS height,
  CAST(NULL AS BIGINT) AS frame_no, CAST(NULL AS BIGINT) AS byte_offset
FROM documents
UNION ALL
SELECT 'frames', doc_id, 'video/fake', NULL, NULL, NULL, NULL,
  CAST(f.frame_no AS BIGINT), CAST(f.frame_no * 1024 AS BIGINT)
FROM documents,
LATERAL (SELECT unnest(range(0,
    least(greatest(octet_length(encode(text)) // 1024, 1), 8))) AS frame_no) f""",
}
