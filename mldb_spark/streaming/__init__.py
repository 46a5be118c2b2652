"""Streaming (SURVEY §2.11)."""

from mldb_spark.streaming.continuous import (  # noqa: F401
    continuous_dataset,
    continuous_window_view,
    windowed_rollup,
)
