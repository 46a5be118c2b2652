"""Stage-level profiler: run one query with the Spark UI REST API on
and dump per-stage wall/metrics, so optimization targets the right
stage (guide §1.1/§7.1 — the UI is disabled in the bench session, so
this builds its own).

Usage: python tools/profile_stages.py q31_embedding_neardup [--sf DIR] [--runs N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    os.environ["MLDB_SPARK_SKIP_FIXTURE_EXPORT"] = "1"
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("mldb_spark_stageprof")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "10g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    from mldb_spark.caching import release_cached

    fn = entrymod.queries()[args.query]
    spark.read.parquet(os.path.join(args.sf, "lineitem.parquet")).count()

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def stages():
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        ) as r:
            return json.load(r)

    seen = {s["stageId"] for s in stages()}
    for i in range(args.runs):
        release_cached()
        spark.catalog.clearCache()
        t0 = time.time()
        df = fn(spark, args.sf)
        df.write.mode("overwrite").format("noop").save()
        el = time.time() - t0
        print(f"--- run {i}: {el:.3f}s", flush=True)
        new = [s for s in stages() if s["stageId"] not in seen]
        seen |= {s["stageId"] for s in new}
        new.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        tot_run = sum(s.get("executorRunTime") or 0 for s in new)
        print(f"  {len(new)} stages, executorRunTime total {tot_run} ms")
        for s in new[:14]:
            nm = (s.get("name") or "")[:70]
            print(
                f"  run={s.get('executorRunTime', 0):>7}ms cpu={int((s.get('executorCpuTime') or 0)/1e6):>7}ms "
                f"gc={s.get('jvmGcTime', 0):>6}ms "
                f"tasks={s.get('numCompleteTasks'):>3} "
                f"sread={s.get('shuffleReadBytes', 0):>9} swrite={s.get('shuffleWriteBytes', 0):>9} {nm}"
            )
    release_cached()
    return 0


if __name__ == "__main__":
    sys.exit(main())
