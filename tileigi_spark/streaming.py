"""Structured Streaming front-end for continuously-arriving pages/events.

The reference is a pure batch tiler (SURVEY.md §2.7: no streaming
operators), but the engine's inputs are append-only tables, so streaming
ingestion composes naturally: a stream of crawled pages is geotagged
micro-batch by micro-batch with the same Arrow extractor, and event
streams get watermarked tumbling-window aggregates. Tile building stays
batch (foreachBatch), matching the reference's checkpoint/resume model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def stream_pages(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """readStream over an append-only page directory (parquet)."""
    return spark.readStream.schema(schema).parquet(path)


def geotag_stream(pages_stream: DataFrame) -> DataFrame:
    """Same extractor as batch (extract.geotag_pages works on streams —
    mapInPandas is stream-compatible)."""
    from .extract import geotag_pages
    return geotag_pages(pages_stream)


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts per event type — the streaming
    form of the batch `events_hourly` query."""
    ts_type = dict(events.dtypes).get("ts", "timestamp")
    if ts_type != "timestamp":  # watermarks require TIMESTAMP, not _NTZ
        events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(F.round(F.col("value") * 1000).cast("long"))
                 .alias("sum_value_milli"))
            .select(F.col("w.start").alias("hour"), "event_type", "n",
                    "sum_value_milli"))


def run_geotag_stream_once(spark: SparkSession, src_path: str,
                           schema: str, out_path: str,
                           checkpoint: str) -> None:
    """availableNow micro-batch run: geotag everything currently in the
    source directory, write points parquet, exactly-once via checkpoint."""
    geo = geotag_stream(stream_pages(spark, src_path, schema))
    (geo.writeStream
     .format("parquet")
     .option("path", out_path)
     .option("checkpointLocation", checkpoint)
     .trigger(availableNow=True)
     .start()
     .awaitTermination())
