"""Multimodal-column queries: metadata-only (payload never read) and the
Arrow-batched decode-stub pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_cms_inpatient_etl_spark.operators.multimodal import (
    attach_binary_payload,
    decode_features,
    sample_frames,
)
from airflow_cms_inpatient_etl_spark.queries.base import register
from airflow_cms_inpatient_etl_spark.sources.registry import load_table


@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           'application/fake-image' AS mime,
           OCTET_LENGTH(CAST(text AS BLOB)) AS n_bytes,
           OCTET_LENGTH(CAST(text AS BLOB)) % 4096 AS shard_bucket
    FROM documents
    """,
)
def multimodal_metadata(spark, sf_dir):
    """Typed metadata over binary payload columns — the query shape that must
    prune the payload out of the scan entirely."""
    d = load_table(spark, sf_dir, "documents")
    mm = attach_binary_payload(d)
    return mm.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").cast("bigint").alias("n_bytes"),
        (F.col("meta.n_bytes") % 4096).cast("bigint").alias("shard_bucket"),
    )


@register(
    "multimodal_decode_stub",
    oracle="""
    SELECT doc_id,
           CAST(OCTET_LENGTH(CAST(text AS BLOB)) AS INT) AS n_bytes,
           CAST(OCTET_LENGTH(CAST(text AS BLOB)) % 640 + 1 AS INT) AS fake_width,
           CAST(OCTET_LENGTH(CAST(text AS BLOB)) % 480 + 1 AS INT) AS fake_height,
           CAST(OCTET_LENGTH(CAST(text AS BLOB)) % 3 + 1 AS INT) AS fake_channels
    FROM documents
    """,
)
def multimodal_decode_stub(spark, sf_dir):
    """mapInPandas decode stage (stub kernel, real Arrow plumbing) — the
    deterministic fake features are oracle-checkable arithmetic on byte length."""
    d = load_table(spark, sf_dir, "documents")
    return decode_features(attach_binary_payload(d))


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH meta AS (
        SELECT doc_id,
               CAST(FLOOR(OCTET_LENGTH(CAST(text AS BLOB)) / 100) AS BIGINT) + 1 AS n_frames
        FROM documents
    )
    SELECT doc_id, n_frames, CAST(UNNEST(RANGE(0, n_frames, 7)) AS BIGINT) AS frame_idx
    FROM meta
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    """Frame sampling (video-style): metadata-driven explode of every-7th
    frame index — one row per sampled frame, payload column never read."""
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    out = sample_frames(decode_features(attach_binary_payload(d)), every_k=7)
    return out.select(
        "doc_id",
        F.col("n_frames").cast("bigint").alias("n_frames"),
        F.col("frame_idx").cast("bigint").alias("frame_idx"),
    )


@register(
    "multimodal_audio_chunks",
    oracle="""
    WITH meta AS (
        SELECT doc_id,
               CAST(OCTET_LENGTH(CAST(text AS BLOB)) AS BIGINT) AS duration_ms
        FROM documents
    ),
    chunks AS (
        SELECT doc_id, duration_ms,
               UNNEST(RANGE(0, duration_ms, 5000)) AS s
        FROM meta
    )
    SELECT doc_id, duration_ms,
           CAST(s AS BIGINT) AS chunk_start_ms,
           CAST(LEAST(s + 5000, duration_ms) AS BIGINT) AS chunk_end_ms
    FROM chunks
    """,
)
def multimodal_audio_chunks(spark, sf_dir):
    """Audio chunking (ASR-style 5-second segments): metadata-driven explode
    of the payload timeline, final chunk clipped to the true duration —
    payload bytes never read; the row-expansion shape real audio pipelines
    use before a batched transcription/feature kernel."""
    from airflow_cms_inpatient_etl_spark.operators.multimodal import chunk_audio

    d = load_table(spark, sf_dir, "documents")
    return chunk_audio(attach_binary_payload(d), chunk_ms=5000)
