"""HTTP download + ZIP extract + idempotent staging (reference DAG 1).

Re-expresses ``/root/reference/dags/cms_inpatient_download_unzip.py``:

* streaming download in 1 MiB chunks with timeout + non-empty validation
  (``:27-39``; chunk size ``:34``, timeout ``:30``),
* extract-all to a temp dir, failing on an empty archive (``:41-56``),
* idempotent move into the staging dir, overwriting prior copies (``:58-65``).

These are driver-side utilities by design — a single ZIP is not a distributed
workload.  For 100 TB-scale archive ingest use ``unzip_distributed`` below:
``binaryFile`` scan + ``mapPartitions`` decompress, so each executor inflates
its own shard of archives.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import urllib.request
import zipfile
from collections.abc import Iterator

CHUNK_BYTES = 1024 * 1024  # 1 MiB streaming chunks, as the reference (:34)
TIMEOUT_S = 120  # reference download timeout (:30)


def download(url: str, dest_path: str, timeout_s: int = TIMEOUT_S) -> str:
    """Streaming GET → dest_path; raises on HTTP error / empty result."""
    os.makedirs(os.path.dirname(dest_path), exist_ok=True)
    with urllib.request.urlopen(url, timeout=timeout_s) as resp, open(dest_path, "wb") as out:
        while True:
            chunk = resp.read(CHUNK_BYTES)
            if not chunk:
                break
            out.write(chunk)
    if not os.path.exists(dest_path) or os.path.getsize(dest_path) == 0:
        raise RuntimeError(f"download produced no data: {url} -> {dest_path}")
    return dest_path


def unzip(zip_path: str, out_dir: str) -> list[str]:
    """Extract all members; fail on empty archives (reference :54-56)."""
    with zipfile.ZipFile(zip_path) as zf:
        names = [n for n in zf.namelist() if not n.endswith("/")]
        if not names:
            raise RuntimeError(f"archive {zip_path} contains no files")
        zf.extractall(out_dir)
    return [os.path.join(out_dir, n) for n in names]


def stage_files(src_paths: list[str], staging_dir: str) -> list[str]:
    """Move files into the staging dir, overwriting existing copies (idempotent,
    reference :58-65).  Staging flattens to basenames, so two source files with
    the same basename (e.g. ``a/data.csv`` and ``b/data.csv`` from one archive)
    would silently clobber each other — that's rejected up front instead."""
    basenames = [os.path.basename(p) for p in src_paths]
    dupes = {b for b in basenames if basenames.count(b) > 1}
    if dupes:
        raise ValueError(
            f"basename collision(s) {sorted(dupes)} among staged files: staging is "
            f"flat, so same-named members from different directories would overwrite "
            f"each other; rename members or stage separately"
        )
    os.makedirs(staging_dir, exist_ok=True)
    staged = []
    for src in src_paths:
        dest = os.path.join(staging_dir, os.path.basename(src))
        if os.path.exists(dest):
            os.remove(dest)
        shutil.move(src, dest)
        staged.append(dest)
    return staged


def ingest_zip_url(url: str, staging_dir: str) -> list[str]:
    """End-to-end DAG-1 equivalent: download → unzip → stage."""
    with tempfile.TemporaryDirectory() as tmp:
        zip_path = download(url, os.path.join(tmp, "payload.zip"))
        extracted = unzip(zip_path, os.path.join(tmp, "extracted"))
        return stage_files(extracted, staging_dir)


def unzip_distributed(spark, archive_glob: str, member_suffix: str = ".csv") -> "pyspark.sql.DataFrame":  # noqa: F821
    """Scale path: inflate many ZIP archives across executors.

    Reads archives with the ``binaryFile`` source and decompresses inside a
    ``mapInPandas`` (Arrow-batched), yielding (archive, member, content) rows.
    Each executor handles its own archives — no driver materialization.
    """
    import io

    import pandas as pd

    binary = spark.read.format("binaryFile").load(archive_glob)

    def inflate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                with zipfile.ZipFile(io.BytesIO(content)) as zf:
                    for name in zf.namelist():
                        if name.endswith("/") or not name.endswith(member_suffix):
                            continue
                        rows.append((path, name, zf.read(name)))
            yield pd.DataFrame(rows, columns=["archive", "member", "content"])

    return binary.select("path", "content").mapInPandas(
        inflate, schema="archive string, member string, content binary"
    )
