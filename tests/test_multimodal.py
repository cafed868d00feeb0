"""Multimodal plumbing tests: decode stub, frame sampling, resize stage."""

from __future__ import annotations

from airflow_cms_inpatient_etl_spark.operators.multimodal import (
    attach_binary_payload,
    chunk_audio,
    decode_features,
    resize_features,
    sample_frames,
)
from airflow_cms_inpatient_etl_spark.sources.registry import load_table
from tests.conftest import SF_SMOKE


def test_decode_features_deterministic(spark):
    d = load_table(spark, SF_SMOKE, "documents")
    decoded = decode_features(attach_binary_payload(d))
    rows = {r["doc_id"]: r for r in decoded.collect()}
    assert len(rows) == d.count()
    sample = next(iter(rows.values()))
    assert sample["fake_width"] == sample["n_bytes"] % 640 + 1


def test_sample_frames_every_k(spark):
    d = load_table(spark, SF_SMOKE, "documents").limit(20)
    frames = sample_frames(decode_features(attach_binary_payload(d)), every_k=7).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    for doc_id, idxs in by_doc.items():
        assert idxs == list(range(0, max(idxs) + 1, 7))  # 0, 7, 14, ...


def test_chunk_audio_zero_byte_payload_yields_no_chunks(spark):
    """A zero-byte payload is legal input: it must produce zero chunk rows
    (like UNNEST(RANGE(0, 0, step))), not an illegal-sequence runtime error.
    Non-empty payloads chunk normally alongside it, with the tail clipped."""
    mm = attach_binary_payload(
        spark.createDataFrame([(1, ""), (2, "x" * 7001)], "doc_id bigint, text string")
    )
    rows = chunk_audio(mm, chunk_ms=5000).collect()
    assert [r["doc_id"] for r in rows] == [2, 2]
    assert [(r["chunk_start_ms"], r["chunk_end_ms"]) for r in rows] == [(0, 5000), (5000, 7001)]


def test_resize_features_scales(spark):
    d = load_table(spark, SF_SMOKE, "documents").limit(10)
    resized = resize_features(decode_features(attach_binary_payload(d)), 64, 64).collect()
    assert all(r["width"] == 64 and r["height"] == 64 for r in resized)
    assert all(r["scale_x"] > 0 and r["scale_y"] > 0 for r in resized)
