"""Multimodal-column queries over the documents table (north-star §7.5).

The metadata path is fully SQL-expressible (DuckDB oracles: encode/
octet_length/sha256); the decode/resize/frame paths run through the
Arrow-batched python seam and get the rows-only check — the unit tests
(tests/test_multimodal.py) pin their exact values on goldens instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from yamr_spark.operators.multimodal import (
    decode_image_stats,
    resize_thumbnail,
    sample_frames,
    with_binary_payload,
)
from yamr_spark.registry import register
from yamr_spark.tables import table


def _payload(spark, sf_dir):
    return with_binary_payload(table(spark, sf_dir, "documents"))


@register(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           sha256(text) AS sha256,
           'application/octet-stream' AS mime
    FROM documents
    """,
)
def q_multimodal_meta(spark, sf_dir):
    """Metadata-only projection over binary payloads — parquet column
    pruning means the payload bytes are derived but the pattern under
    test is: filters/selects on meta never deserialize payload in python."""
    return _payload(spark, sf_dir).select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.sha256").alias("sha256"),
        F.col("meta.mime").alias("mime"),
    )


@register(
    "multimodal_large_assets",
    oracle="""
    SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes
    FROM documents
    WHERE octet_length(encode(text)) > 512
    """,
)
def q_multimodal_large_assets(spark, sf_dir):
    """Metadata predicate (size filter) — the asset-triage query shape."""
    return (
        _payload(spark, sf_dir)
        .where(F.col("meta.n_bytes") > 512)
        .select("doc_id", F.col("meta.n_bytes").alias("n_bytes"))
    )


@register("multimodal_decode_stats")
def q_multimodal_decode(spark, sf_dir):
    """Decode seam: per-image shape + pixel stats via mapInPandas
    (rows-only check; exact values pinned by unit goldens)."""
    return decode_image_stats(_payload(spark, sf_dir))


@register("multimodal_thumbnails")
def q_multimodal_thumbnails(spark, sf_dir):
    """Resize seam: 8×8 nearest-neighbor thumbnails as binary."""
    return resize_thumbnail(_payload(spark, sf_dir))


@register("multimodal_frame_sample")
def q_multimodal_frames(spark, sf_dir):
    """Frame-sampling seam: payload → every-4th fixed-size frame (1→N)."""
    return sample_frames(_payload(spark, sf_dir))


@register(
    "multimodal_frame_counts",
    oracle="""
    SELECT doc_id,
           CAST((octet_length(encode(text)) // 256 + 3) // 4 AS BIGINT) AS n_frames
    FROM documents
    WHERE octet_length(encode(text)) // 256 > 0
    """,
)
def q_multimodal_frame_counts(spark, sf_dir):
    """Frame-sampling cardinality, oracle-checked: every-4th 256-byte
    frame → ceil(n_frames/4) rows per doc. Pins the mapInPandas UDTF's
    1→N fan-out against closed-form arithmetic (the frame BYTES stay
    rows-only; the COUNT is exact)."""
    frames = sample_frames(_payload(spark, sf_dir), frame_bytes=256, every_k=4)
    return frames.groupBy("doc_id").agg(F.count("*").alias("n_frames"))
