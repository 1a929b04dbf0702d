"""Streaming jobs: the batch operators under Structured Streaming.

Tested with the file source + ``availableNow`` trigger (bounded drain), the
standard pattern for converting a batch backfill into an incremental job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.mention_detect import detect_mentions


def streaming_event_counts(
    spark: SparkSession, source_dir: str, schema, watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked tumbling-window counts over a file-source event stream
    (late rows beyond the watermark are dropped by the state store)."""
    events = spark.readStream.schema(schema).parquet(source_dir)
    # event-time watermarks require TIMESTAMP (source may be TIMESTAMP_NTZ)
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def streaming_mentions(
    spark: SparkSession, source_dir: str, schema, sink_fn
) -> "StreamingQuery":
    """Incremental mention detection: each micro-batch runs the SAME
    detect_mentions DAG via foreachBatch (exactly the reference pipeline,
    incrementalized)."""
    docs = spark.readStream.schema(schema).parquet(source_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        corpus_like = batch_df.select(
            "doc_id",
            F.lit("stream").alias("repo"),
            F.sha2("text", 256).alias("content_sha"),
            F.col("text").alias("content"),
        )
        sink_fn(detect_mentions(corpus_like, num_partitions=4), batch_id)

    return (
        docs.writeStream.foreachBatch(process)
        .trigger(availableNow=True)
        .option("checkpointLocation", source_dir + "/_checkpoint")
        .start()
    )
