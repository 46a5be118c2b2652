"""Virtual-dataset operators and batch procedures (SURVEY §2.1-2.8, §2.13)."""

from mldb_spark.operators.relational import (  # noqa: F401
    bucketize,
    distinct_on,
    melt,
    merge_datasets,
    pivot_agg,
    ranking,
    sample_dataset,
    stats_table,
    summary_statistics,
    transpose_cells,
    union_datasets,
)
from mldb_spark.operators.temporal import (  # noqa: F401
    latest_cells,
    temporal_agg,
    when_filter,
)
