#!/usr/bin/env python3
"""Per-job breakdown of one headline query: job id, duration, stage
task counts — shows WHERE the driver round-trips go.

Usage: python tools/job_breakdown.py name [--sf DIR]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from rust_vector_search_spark.plans import QUERIES  # noqa: E402
from rust_vector_search_spark.plans.registry import (  # noqa: E402
    release_driver_blocks,
)
from rust_vector_search_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf"); sf_dir = args[i + 1]; del args[i:i + 2]
    name = args[0]

    spark = get_spark(app_name="job_breakdown")
    spark.range(1000).selectExpr("sum(id)").collect()
    for w in ("q6_forecast_revenue", "ann_rp_forest_recall",
              "streaming_dedup_arrival_order"):
        QUERIES[w](spark, sf_dir).write.mode("overwrite").format("noop").save()

    sc = spark.sparkContext
    st = sc.statusTracker()
    release_driver_blocks(spark)
    before = set(st.getJobIdsForGroup(None))
    t0 = time.perf_counter()
    QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
    wall = time.perf_counter() - t0
    new = sorted(set(st.getJobIdsForGroup(None)) - before)

    # pull durations from the Java status store (AppStatusStore)
    store = sc._jsc.sc().statusStore()
    total = 0.0
    for j in new:
        jd = store.job(j)
        sub = jd.submissionTime()
        ct = jd.completionTime()
        dur = 0.0
        if not sub.isEmpty() and not ct.isEmpty():
            dur = (ct.get().getTime() - sub.get().getTime()) / 1000.0
        total += dur
        ji = st.getJobInfo(j)
        stages = list(ji.stageIds) if ji else []
        ntasks = jd.numTasks()
        print(f"job {j}: {dur:7.3f}s  tasks={ntasks:5d} stages={stages}")
    print(f"{name}: wall={wall:.2f}s sum_job_dur={total:.2f}s jobs={len(new)}")
    spark.stop()


if __name__ == "__main__":
    main()
