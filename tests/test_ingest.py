"""Ingest-path tests (reference DAG 1: download → unzip → stage)."""

from __future__ import annotations

import os
import zipfile

import pytest

from airflow_cms_inpatient_etl_spark.sources.http_zip import (
    download,
    ingest_zip_url,
    stage_files,
    unzip,
    unzip_distributed,
)


@pytest.fixture()
def sample_zip(tmp_path):
    src = tmp_path / "payload.zip"
    with zipfile.ZipFile(src, "w") as zf:
        zf.writestr("a.csv", "h1,h2\n1,2\n")
        zf.writestr("nested/b.csv", "h1\n3\n")
        zf.writestr("notes.txt", "ignore me")
    return str(src)


def test_download_file_url(tmp_path, sample_zip):
    dest = str(tmp_path / "out" / "got.zip")
    got = download(f"file://{sample_zip}", dest)
    assert os.path.getsize(got) > 0


def test_download_empty_fails(tmp_path):
    empty = tmp_path / "empty.bin"
    empty.write_bytes(b"")
    with pytest.raises(RuntimeError, match="no data"):
        download(f"file://{empty}", str(tmp_path / "dst.bin"))


def test_unzip_and_stage_overwrites(tmp_path, sample_zip):
    extracted = unzip(sample_zip, str(tmp_path / "x"))
    assert len(extracted) == 3
    staging = str(tmp_path / "staging")
    staged = stage_files(extracted, staging)
    assert sorted(os.path.basename(p) for p in staged) == ["a.csv", "b.csv", "notes.txt"]
    # idempotent re-run: re-extract and stage again over existing files
    extracted2 = unzip(sample_zip, str(tmp_path / "x2"))
    staged2 = stage_files(extracted2, staging)
    assert len(staged2) == 3


def test_unzip_empty_archive_fails(tmp_path):
    empty_zip = tmp_path / "empty.zip"
    with zipfile.ZipFile(empty_zip, "w"):
        pass
    with pytest.raises(RuntimeError, match="no files"):
        unzip(str(empty_zip), str(tmp_path / "never"))


def test_ingest_end_to_end(tmp_path, sample_zip):
    staged = ingest_zip_url(f"file://{sample_zip}", str(tmp_path / "stage"))
    assert len(staged) == 3


def test_unzip_distributed(spark, tmp_path, sample_zip):
    """Scale path: binaryFile scan + mapInPandas inflate across executors."""
    df = unzip_distributed(spark, sample_zip, member_suffix=".csv")
    rows = {r["member"]: r["content"] for r in df.collect()}
    assert set(rows) == {"a.csv", "nested/b.csv"}
    assert rows["a.csv"] == b"h1,h2\n1,2\n"
