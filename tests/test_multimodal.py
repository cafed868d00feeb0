"""Multimodal plumbing tests: decode stub, frame sampling, resize stage."""

from __future__ import annotations

from airflow_cms_inpatient_etl_spark.operators.multimodal import (
    attach_binary_payload,
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


def test_resize_features_scales(spark):
    d = load_table(spark, SF_SMOKE, "documents").limit(10)
    resized = resize_features(decode_features(attach_binary_payload(d)), 64, 64).collect()
    assert all(r["width"] == 64 and r["height"] == 64 for r in resized)
    assert all(r["scale_x"] > 0 and r["scale_y"] > 0 for r in resized)
