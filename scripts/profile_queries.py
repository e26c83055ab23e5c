"""Per-query profiling: split steady-state time into plan-build
(driver/py4j analysis), execution (noop sink), and result transfer
(toPandas); count Spark jobs and post-AQE exchanges per action.

Usage: python scripts/profile_queries.py [query ...]
Defaults to the top-cost set from BENCH_LOCAL.json when no names given.
Prints one line per query: steady min-of-3 of each phase.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from lamindb_spark.session import get_spark, release_checkpoints


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    qs = entrymod.queries()
    if not names:
        with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_LOCAL.json")) as fh:
            sq = json.load(fh)["steady_queries"]
        names = [k for k, _ in sorted(sq.items(), key=lambda kv: -kv[1])[:20]]
    spark = get_spark("lamindb-spark-profile")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    qs["tpch_q1"](spark, sf_dir).collect()  # warmup
    tracker = spark.sparkContext.statusTracker()
    jvm_gc = spark.sparkContext._jvm.System.gc

    out = {}
    for name in names:
        fn = qs[name]
        release_checkpoints(spark)
        gc.collect()
        jvm_gc()
        plan_t, exec_t, pandas_t, jobs = [], [], [], 0
        for i in range(3):
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            df.toPandas()
            t3 = time.time()
            plan_t.append(t1 - t0)
            exec_t.append(t2 - t1)
            pandas_t.append(t3 - t2)
        out[name] = {
            "plan": round(min(plan_t), 3),
            "exec": round(min(exec_t), 3),
            "pandas": round(min(pandas_t), 3),
        }
        print(
            f"{name:24s} plan={out[name]['plan']:6.3f} exec={out[name]['exec']:6.3f} "
            f"pandas={out[name]['pandas']:6.3f}",
            file=sys.stderr,
        )
    print(json.dumps(out, indent=1, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
