"""Per-query profiling harness for the optimization rounds.

Usage:
  python tools/profile_query.py [--sf SF_DIR] [--plan-dir DIR] [--runs N] q61 qa24 ...

For each named query: warm the session, run the body best-of-N with
the noop sink (the bench's exact methodology, guide §1.4), print the
timing, and write `.explain("formatted")` of the returned DataFrame
to <plan-dir>/<query>.txt (plans/r09/<q>_before.txt / _after.txt are
the judge-facing copies).
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mldb_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--suffix", default="")
    args = ap.parse_args()

    os.environ["MLDB_SPARK_SKIP_FIXTURE_EXPORT"] = "1"
    spark = get_spark("mldb_spark_profile")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark.read.parquet(os.path.join(args.sf, "lineitem.parquet")).count()

    from mldb_spark.caching import release_cached

    for name in args.queries:
        fn = qs[name]
        release_cached()
        spark.catalog.clearCache()
        best = None
        df = None
        for _ in range(args.runs):
            t0 = time.time()
            df = fn(spark, args.sf)
            df.write.mode("overwrite").format("noop").save()
            el = time.time() - t0
            best = el if best is None else min(best, el)
            # capture the plan BEFORE releasing the query's tracked
            # persists: the dump must reflect what the timed noop
            # write actually executed (InMemoryTableScan over a
            # persisted intermediate, not its post-release recompute)
            if args.plan_dir:
                os.makedirs(args.plan_dir, exist_ok=True)
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                path = os.path.join(
                    args.plan_dir, f"{name}{args.suffix}.txt"
                )
                with open(path, "w") as f:
                    f.write(buf.getvalue())
            release_cached()
            spark.catalog.clearCache()
        print(f"{name}: best-of-{args.runs} {best:.3f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
