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


SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
_SESSION_STATE_SCHEMA = "start double, last double, n long, total double"


def stateful_sessionize(
    stream: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-key session windows with an idle-gap close rule — the
    reference's sessionization transform lifted onto a stream.

    A session closes when (a) a gap > gap_seconds appears between
    consecutive events inside a batch, or (b) the processing-time
    timeout fires with no new events for the key. One emitted row per
    CLOSED session; the open tail session rides in the group state
    (bounded: 4 scalars per key)."""
    import pandas as pd  # local import: workers ship this closure

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap = float(gap_seconds)

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, pd.Timestamp(start, unit="s"), pd.Timestamp(last, unit="s"), n, total)],
                columns=["user_id", "session_start", "session_end", "n_events", "total_value"],
            )
            return
        ts_vals, vals = [], []
        for pdf in pdfs:
            ts_vals.extend(pdf[ts_col].astype("int64").to_list())
            vals.extend(pdf[value_col].to_list())
        order = sorted(range(len(ts_vals)), key=lambda i: ts_vals[i])
        events = [(ts_vals[i] / 1e9, float(vals[i])) for i in order]
        if state.exists:
            start, last, n, total = state.get
        else:
            start = last = None
        closed = []
        for t, v in events:
            if start is None:
                start, last, n, total = t, t, 0, 0.0
            elif t - last > gap:
                closed.append((start, last, n, total))
                start, last, n, total = t, t, 0, 0.0
            n, total, last = n + 1, total + v, max(last, t)
        state.update((start, last, n, total))
        state.setTimeoutDuration(int(gap * 1000))
        if closed:
            yield pd.DataFrame(
                [
                    (user_id, pd.Timestamp(s, unit="s"), pd.Timestamp(e, unit="s"), n_, tot)
                    for s, e, n_, tot in closed
                ],
                columns=["user_id", "session_start", "session_end", "n_events", "total_value"],
            )

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            fn,
            SESSION_OUTPUT_SCHEMA,
            _SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def streaming_dedup(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Ingest-time exact dedup for a continuous dataset: drop repeated
    keys (content fingerprints, event ids) arriving within the
    watermark horizon — dropDuplicatesWithinWatermark, so the
    dedup state is BOUNDED (keys older than the watermark age out)
    instead of growing with the stream like a plain dropDuplicates
    would. The batch twin is dedup.dedup_exact; at 100 TB/day of
    ingest the watermark bound is what keeps state store size
    constant."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
