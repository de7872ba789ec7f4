"""Structured Streaming runtime for the events stream (SURVEY.md §2.10
extension): file-source → event-time windowed aggregation with watermark →
sink. The transformations are the SAME definitions as streaming.windows —
one logical plan serving batch backfill and continuous processing.

Scale notes: state lives in the state store keyed by (window, group); the
watermark bounds it by evicting windows older than max_event_time - delay.
Late rows within the delay update their window; later ones are dropped —
the knob is ``late_threshold``. For production: RocksDB state store,
checkpoint to durable storage, and `spark.sql.shuffle.partitions` sized to
state volume (state is hash-partitioned by key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Schema of the events stream (streaming sources require explicit schemas —
#: there is no inference mid-stream).
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(spark: SparkSession, source_dir: str, fmt: str = "json") -> DataFrame:
    """File-source stream: every new file in source_dir becomes a
    micro-batch (the parquet/json drop-folder pattern; swap for Kafka by
    changing this one reader)."""
    return (
        spark.readStream.format(fmt)
        .schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .load(source_dir)
    )


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    late_threshold: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts — the streaming form of
    s1_tumbling_window / s2_sliding_window."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", late_threshold)
        .groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_counts(events: DataFrame, gap: str = "30 minutes", late_threshold: str = "30 minutes") -> DataFrame:
    """Watermarked session windows per user — streaming s3_session_window."""
    return (
        events.withWatermark("ts", late_threshold)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def start_to_memory(
    df: DataFrame, name: str, output_mode: str = "append"
) -> StreamingQuery:
    """Run a streaming plan into an in-memory table (tests/demos). For
    production sinks swap format for 'parquet'/'kafka' + checkpointLocation."""
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
