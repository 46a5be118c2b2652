"""Continuous (live-append) datasets on Structured Streaming.

Reference: the `continuous` dataset records live events and commits
time-stamped chunks; `continuous.window` exposes a time-bounded view
over committed chunks (builtin/continuous_dataset.cc:435,580; doc
datasets/ContinuousDataset.md). The reference has no watermarks or
windowed aggregation semantics — those are green-field Spark wins
layered on the same surface.

Spark mapping:
- continuous_dataset: readStream on a directory → writeStream
  (append) to a time-partitioned parquet table. Each micro-batch is
  the reference's "chunk commit"; partitioning by date/hour makes
  the window view a partition-pruned batch scan.
- continuous_window_view: batch read of the sink filtered on the
  time column = `continuous.window`.
- windowed_rollup: watermarked tumbling-window aggregation — the
  streaming twin of queries.q23_tumbling_window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def continuous_dataset(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    schema: StructType,
    ts_col: str = "ts",
    fmt: str = "json",
) -> StreamingQuery:
    """Append-only ingest: files arriving in source_dir stream into a
    date-partitioned parquet table. availableNow semantics are left
    to the caller via query.trigger options; default micro-batches.
    """
    stream = (
        spark.readStream.schema(schema)
        .format(fmt)
        .load(source_dir)
        .withColumn("__date", F.to_date(F.col(ts_col)))
    )
    return (
        stream.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("__date")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def continuous_window_view(
    spark: SparkSession, sink_dir: str, start: str, end: str, ts_col: str = "ts"
) -> DataFrame:
    """continuous.window: time-bounded batch view over the committed
    stream. The __date partition column turns the range filter into
    partition pruning — only the in-window files are scanned."""
    df = spark.read.parquet(sink_dir)
    return df.filter((F.col(ts_col) >= start) & (F.col(ts_col) < end)).drop("__date")


def windowed_rollup(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Watermarked tumbling-window aggregate over a streaming
    DataFrame: late data beyond the watermark is dropped, state is
    bounded — the piece the reference never had."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n",
            "total_value",
        )
    )
