"""Multimodal column plumbing (SURVEY.md §2.2 LLM ops).

Images/audio/video are opaque BINARY columns plus typed metadata. The
Spark-side machinery that matters at 100 TB — schema, partitioning, Arrow
batch shape through mapInPandas, feature extraction signatures — is real
and tested here; the actual codec decode is stubbed (no image/audio libs
in this container) behind ``decode_image``/``decode_audio`` which raise
NotImplementedError, with a deterministic byte-level feature extractor
standing in so the pipeline is end-to-end verifiable.

The fixture has no binary table, so ``documents.text`` is encoded to
bytes — the plumbing is identical for real media payloads.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

THUMB_BYTES = 8


def decode_image(payload: bytes) -> "object":
    """Decode an image payload to HxWxC pixels. STUB: the container has no
    image codec libraries; wire Pillow/opencv here in production."""
    raise NotImplementedError("image decode requires a codec library")


def decode_audio(payload: bytes) -> "object":
    """Decode audio to PCM samples. STUB (no audio libs in container)."""
    raise NotImplementedError("audio decode requires a codec library")


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched byte-level feature extraction over a binary column.
    Deterministic stand-in for decode+featurize: byte length, md5 of the
    payload, and a fixed-size prefix ("thumbnail")."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len),
                "payload_md5": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                "thumb_hex": payloads.map(lambda b: b[:THUMB_BYTES].hex()),
            }
        )


_FEATURES_ORACLE = f"""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS payload_md5,
       lower(hex(encode(substring(text, 1, {THUMB_BYTES})))) AS thumb_hex
FROM documents
WHERE doc_id < 100
ORDER BY doc_id
"""


@query("q_multimodal_features", oracle=_FEATURES_ORACLE)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    binary = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    feats = binary.mapInPandas(
        extract_features,
        "doc_id long, n_bytes int, payload_md5 string, thumb_hex string",
    )
    return feats.orderBy("doc_id")


# Frame-sampling plumbing: given (media, n_frames, stride) pick frame
# offsets — pure Spark expressions; the decode of each frame is the
# stubbed step. Demonstrates the schema/partition shape for video.
_FRAMES_ORACLE = """
SELECT doc_id, frame_no, byte_offset
FROM (
  SELECT doc_id,
         unnest(range(4)) AS frame_no,
         unnest(range(4)) * (octet_length(encode(text)) // 4) AS byte_offset
  FROM documents WHERE doc_id < 20
)
ORDER BY doc_id, frame_no
"""


@query("q_multimodal_frame_offsets", oracle=_FRAMES_ORACLE)
def q_multimodal_frame_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    n_bytes = F.octet_length(F.encode("text", "utf-8"))
    return (
        d.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("frame_no"),
            n_bytes.alias("n_bytes"),
        )
        .select(
            "doc_id",
            "frame_no",
            (F.col("frame_no") * (F.col("n_bytes") / 4).cast("long")).alias(
                "byte_offset"
            ),
        )
        .orderBy("doc_id", "frame_no")
    )


# Resize plumbing: target dimensions preserving aspect ratio, computed
# from typed metadata columns — the pure-arithmetic half of a resize
# stage (the pixel resample itself is the stubbed decode step). Source
# dims are deterministically derived from doc metadata in lieu of real
# image headers.
_RESIZE_MAX = 512

_RESIZE_ORACLE = f"""
SELECT doc_id, src_w, src_h,
       CAST(floor(src_w * scale) AS INT) AS dst_w,
       CAST(floor(src_h * scale) AS INT) AS dst_h
FROM (
  SELECT doc_id, src_w, src_h,
         CAST({_RESIZE_MAX} AS DOUBLE) / greatest(src_w, src_h) AS scale
  FROM (
    SELECT doc_id,
           640 + (n_chars % 1280) AS src_w,
           480 + ((n_chars * 7) % 720) AS src_h
    FROM documents WHERE doc_id < 100
  )
)
ORDER BY doc_id
"""


@query("q_multimodal_resize_dims", oracle=_RESIZE_ORACLE)
def q_multimodal_resize_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    dims = d.select(
        "doc_id",
        (F.lit(640) + F.col("n_chars") % 1280).alias("src_w"),
        (F.lit(480) + (F.col("n_chars") * 7) % 720).alias("src_h"),
    )
    scale = F.lit(float(_RESIZE_MAX)) / F.greatest("src_w", "src_h")
    return dims.select(
        "doc_id",
        "src_w",
        "src_h",
        F.floor(F.col("src_w") * scale).cast("int").alias("dst_w"),
        F.floor(F.col("src_h") * scale).cast("int").alias("dst_h"),
    ).orderBy("doc_id")
