"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas
iterators (``mapInPandas``).

The container ships no image/audio codecs, so the actual decode is
STUBBED (``decode_media`` raises NotImplementedError; the pipeline
uses :func:`fake_decode_meta`, a deterministic stand-in).  Everything
around the stub — binary schema, Arrow batch shape, UDF signature,
partitioning — is real and tested, so swapping in a real codec is a
one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical multimodal record schema: payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload", BinaryType(), True),
    ]
)

META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("content_md5", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
    ]
)


def decode_media(payload: bytes, media_type: str):  # pragma: no cover
    """Real codec hook — intentionally unimplemented in this image.

    On a cluster with codecs installed, replace with e.g.
    PIL.Image.open / soundfile.read / pyav frame iteration.
    """
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "wire a real decoder here (PIL/soundfile/pyav) at deployment"
    )


def fake_decode_meta(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for the decode step: pseudo
    width/height derived from the byte length (stable across engines
    and runs)."""
    n = len(payload)
    return (n % 640, n % 480)


def as_media_table(df: DataFrame, *, id_col, payload_col, media_type: str) -> DataFrame:
    """Wrap an arbitrary binary-bearing DataFrame into the canonical
    media schema.  ``id_col``/``payload_col`` accept names or Columns."""
    idc = F.col(id_col) if isinstance(id_col, str) else id_col
    pc = F.col(payload_col) if isinstance(payload_col, str) else payload_col
    return df.select(
        idc.cast("long").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        pc.cast("binary").alias("payload"),
    )


def extract_media_meta(media: DataFrame) -> DataFrame:
    """Decode/feature-extract via ``mapInPandas`` (Arrow batches).

    The per-batch function is pure pandas over binary payloads — the
    shape a real decoder needs (one python worker per partition,
    vectorized Arrow transfer, no per-row pickling).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            dims = payloads.map(
                lambda b: fake_decode_meta(b) if b is not None else (None, None)
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else None),
                    "content_md5": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    "width": dims.map(lambda d: d[0]),
                    "height": dims.map(lambda d: d[1]),
                }
            )

    return media.mapInPandas(batches, META_SCHEMA)


EMBED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), True),
    ]
)


def embed_media(media: DataFrame, *, dim: int = 16) -> DataFrame:
    """Feature-extraction plumbing: binary payload -> ``array<float>``
    embedding via ``mapInPandas`` (the exact shape a real image/audio
    encoder runs in — Arrow batches into one python worker per
    partition, model weights loaded once per worker).

    The "model" is the deterministic stand-in (md5-derived char codes,
    reproducible in any engine) — swap the lambda for a real encoder
    at deployment.  Output feeds the similarity operators directly
    (brute-force/LSH/IVF top-k).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            embs = pdf["payload"].map(
                lambda b: [float(ord(c)) for c in hashlib.md5(b).hexdigest()[:dim]]
                if b is not None
                else None
            )
            yield pd.DataFrame({"media_id": pdf["media_id"], "embedding": embs})

    return media.mapInPandas(batches, EMBED_SCHEMA)


def sample_frames(
    media: DataFrame, *, every_n_bytes: int = 1024, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling plumbing for video-ish payloads: emit up to
    ``max_frames`` (media_id, frame_no, offset) rows per payload.

    The byte-offset arithmetic is the real partition-preserving fanout
    a video sampler needs; the frame *content* extraction is behind
    the same stubbed decode hook.  Pure column expressions (sequence +
    explode), no UDF.
    """
    n = F.length(F.col("payload")).cast("bigint")
    n_frames = F.least(
        F.greatest((n / every_n_bytes).cast("bigint"), F.lit(1)), F.lit(max_frames)
    )
    return media.select(
        "media_id",
        "media_type",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_no", "__x"),
    ).select(
        "media_id",
        "media_type",
        "frame_no",
        (F.col("frame_no").cast("bigint") * every_n_bytes).alias("byte_offset"),
    )
