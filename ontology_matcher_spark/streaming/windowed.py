"""Watermarked windowed aggregation over an event stream — the
canonical Structured-Streaming late-data pattern (watermark bounds
state; append mode emits each window exactly once, after the
watermark passes its end).

The reference is batch-only; this is the incremental twin of the
batch `q_events_hourly` query (__spark_entry__.py): identical
grouping (time window × event_type) and aggregates, so for an
on-time stream the finalized streaming output equals the batch
groupBy of the same rows — pinned by tests/test_streaming.py.

At 100 TB scale this shape is what keeps state bounded: without the
watermark, window state for an unbounded key×window space accumulates
forever; with it, Spark drops state (and late rows) once
`max(event time) - watermark` passes a window's end.
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

#: driver testdata events.parquet shape
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


def stream_events(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of event parquet drops."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )


def windowed_event_counts(
    events: DataFrame,
    watermark: str = "10 minutes",
    window_len: str = "1 hour",
) -> DataFrame:
    """Streaming (or batch) windowed counts + sums per event_type.

    Watermark ``watermark`` bounds both state retention and how late a
    row may arrive; rows older than the watermark when their window
    has been finalized are DROPPED (never double-emitted)."""
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(
            F.window("ts", window_len).alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_windowed_event_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
    window_len: str = "1 hour",
) -> StreamingQuery:
    """events stream → finalized per-window counts, append-mode
    parquet sink. Append mode + watermark = each (window, event_type)
    row is written exactly once, when the watermark passes the
    window's end — the restart-safe incremental rollup shape
    (checkpointLocation carries the watermark + file-source state)."""
    agg = windowed_event_counts(
        stream_events(spark, input_dir), watermark, window_len
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
