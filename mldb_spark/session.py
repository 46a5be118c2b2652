"""SparkSession factory tuned for both local testing and cluster scale.

The reference engine hand-tunes parallelism (MIN_ROW_PER_TASK=32,
TASK_PER_THREAD=8, /root/reference core/bound_queries.cc:39-40); on
Spark the equivalents are shuffle partitioning + AQE, set once here.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mldb_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Local mode defaults come from $SPARK_GRAFT_CPUS (driver contract);
    on a real cluster, pass master=None with an external conf and the
    builder only layers the SQL-level settings, which are
    cluster-size-independent:

    - AQE on: runtime coalescing, skew-join splitting, and dynamic
      join-strategy switching replace any hand-scheduled plan choice.
    - shuffle.partitions is only the *initial* number — AQE coalesces.
      At 100 TB you'd raise it (e.g. 2000-8000) via external conf; the
      value here suits local[32] at sf<=1.
    - Arrow on: every pandas_udf / toPandas crosses the JVM<->Python
      boundary in columnar batches.
    - session timezone pinned UTC so TIMESTAMP semantics match the
      reference (timezone-less UTC instants, TypeSystem.md:25-27) and
      the duckdb oracle.
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # wide-aggregate codegen (optimization r9): the simhash
        # 64-bit-vote aggregate carries >100 fields, which silently
        # drops the whole stage out of whole-stage codegen at the
        # default maxFields=100 (~15-20% on that stage). 200 keeps
        # such deliberate wide-but-bounded aggregates compiled at ANY
        # scale factor; genuinely huge projections (the 10k-column
        # cells views) still exceed it and stay interpreted, as
        # before. Scale-independent: field count is a plan property,
        # not a cluster-size property.
        .config("spark.sql.codegen.maxFields", "200")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Heap sized to the LOCAL workload, not the box (guide §5;
        # optimization r10): this sandbox's hypervisor charges ~3-60µs
        # per first-touch page fault, so an oversized lazily-grown heap
        # is a fault DEBT the first queries that allocate big
        # sort/aggregation buffers pay down mid-stage (measured: 32-task
        # stages with seconds of executorRunTime at <5% CPU; qa24 6.2s
        # -> 2.8s and q89 3.5s -> 0.7s on a fully-faulted heap).
        # 10g covers every sf<=1 gate with wide margin and bounds the
        # debt; scale runs (the 16x probe, a real cluster) size memory
        # externally via SPARK_DRIVER_MEMORY / cluster conf as before.
        # (-Xms/-XX:+AlwaysPreTouch moved the debt to a ~6min session
        # start; THP halved fault counts but its madvise defrag stalled
        # q85's shuffle 9x — both measured and rejected, see
        # OPTIMIZATION_r10.md.)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "10g"))
        .config("spark.ui.enabled", "false")
        # no console progress bars: harnesses capture stdout/stderr and
        # 90 queries of \r-rewritten bars swamp (and truncate) the one
        # JSON line the driver parses out of bench.py
        .config("spark.ui.showConsoleProgress", "false")
    )
    if master is not None:
        builder = builder.master(master)
    elif "SPARK_MASTER" in os.environ:
        builder = builder.master(os.environ["SPARK_MASTER"])
    else:
        builder = builder.master(f"local[{cpus}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
