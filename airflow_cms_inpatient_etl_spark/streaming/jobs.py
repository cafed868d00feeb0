"""Streaming jobs over the events stream (SURVEY §2.B streaming row; Phase 4).

The batch queries in ``queries/timeseries.py`` define the semantics; these are
the incremental versions: ``readStream`` → watermark → windowed aggregation /
dedup → sink.  Tests drive them with the file source over the same parquet
fixtures and assert batch-equivalence (the only meaningful oracle for
streaming state — SURVEY §7 risk register).

Scale notes: event-time windows + watermarks keep state bounded (late data
beyond the watermark is dropped, state for closed windows is evicted); the
grouping key (window, event_type) shuffles once per micro-batch; RocksDB state
store would back this on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # raw nanos (nanosAsLong read path)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over events parquet (ts arrives as nanos → timestamp)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.readStream.schema(EVENTS_SCHEMA).parquet(path)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def tumbling_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling-window counts (append-mode safe)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming dedup on (user_id, event_type, ts) with bounded state."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type", "ts"]
    )


def run_stream_to_memory(df: DataFrame, name: str, output_mode: str) -> None:
    """Drive a streaming query to completion against the memory sink (local
    test harness: processAllAvailable drains the file source synchronously)."""
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
