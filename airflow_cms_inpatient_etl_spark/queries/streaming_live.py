"""Live Structured Streaming queries in the graded registry (rows-only checks:
a streaming execution has no SQL oracle; batch-equivalence is asserted in
tests/test_streaming.py instead)."""

from __future__ import annotations

import shutil
import tempfile
import uuid

from airflow_cms_inpatient_etl_spark.queries.base import register
from airflow_cms_inpatient_etl_spark.streaming.jobs import (
    run_stream_to_memory,
    stream_events,
    tumbling_counts,
)


@register("streaming_tumbling_live")  # no oracle: real incremental execution
def streaming_tumbling_live(spark, sf_dir):
    """End-to-end Structured Streaming run: file-source stream over the events
    fixture → watermark → tumbling window counts → memory sink, drained with
    processAllAvailable.  Returns the sink table (identical contents to the
    batch events_tumbling_window modulo the open tail window)."""
    stage_dir = tempfile.mkdtemp(prefix="events_stream_")
    try:
        shutil.copy(f"{sf_dir}/events.parquet", f"{stage_dir}/part-0.parquet")
        name = f"stream_live_{uuid.uuid4().hex[:8]}"
        run_stream_to_memory(
            tumbling_counts(stream_events(spark, stage_dir)), name, output_mode="complete"
        )
        return spark.table(name)
    finally:
        # the stream is stopped (run_stream_to_memory drains then stops), so
        # the file-source staging dir is dead weight — remove it
        shutil.rmtree(stage_dir, ignore_errors=True)
