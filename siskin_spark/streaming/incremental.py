"""Incremental ingestion as Structured Streaming with availableNow
(SURVEY.md §2.10): the reference has no streaming — its incrementality
is batch-with-memoization (date-sliced harvests, --only-newer sync).
The Spark-native mirror is a file-source stream with
``trigger(availableNow=True)``: each invocation processes exactly the
files that arrived since the last checkpoint, then stops — the same
semantics as the reference's `lftp --only-newer` + concat, but with
exactly-once bookkeeping from the checkpoint log instead of file mtimes.

``windowed_counts`` shows the watermarked windowed aggregation shape
for genuinely continuous sources; the same groupBy runs identically in
batch (see the ``windowed_events`` oracle query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def ingest_available_now(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    checkpoint_dir: str,
    schema: StructType,
    fmt: str = "json",
    transform=None,
) -> None:
    """Harvest->bronze: pick up new files from ``src_dir``, optionally
    transform (a DataFrame->DataFrame normalizer, e.g. a converter from
    operators/normalize.py), append to a Parquet bronze table.
    Runs to completion (availableNow) — callable from a cron/pipeline
    stage exactly like the reference's incremental harvest tasks."""
    stream = spark.readStream.schema(schema).format(fmt).load(src_dir)
    if transform is not None:
        stream = transform(stream)
    q = (
        stream.writeStream.format("parquet")
        .option("path", dst_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 day",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked tumbling-window aggregation — works on a streaming
    OR batch DataFrame (watermark is a no-op in batch); late rows beyond
    the watermark are dropped in streaming mode."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(ts_col, window).alias("w"), F.col(key_col))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col(key_col),
            F.col("n"),
            F.col("sum_value"),
        )
    )
