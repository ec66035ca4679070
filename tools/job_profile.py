#!/usr/bin/env python3
"""Noise-free plan-shape profile for headline queries: count the Spark
JOBS a query launches (driver round-trips), their stages and tasks, via
the status tracker — deterministic metrics for A/B comparison on a host
with variable CPU steal (r15 finding: wall noise up to 3x between
back-to-back runs; job/stage/task counts don't move).

Usage: python tools/job_profile.py name[,name...] [--sf DIR]
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
    names = [n for a in args for n in a.split(",") if n]
    if not names:
        raise SystemExit(__doc__)

    spark = get_spark(app_name="job_profile")
    spark.range(1000).selectExpr("sum(id)").collect()
    for w in ("q6_forecast_revenue", "ann_rp_forest_recall",
              "streaming_dedup_arrival_order"):
        QUERIES[w](spark, sf_dir).write.mode("overwrite").format("noop").save()

    st = spark.sparkContext.statusTracker()
    for name in names:
        release_driver_blocks(spark)
        before = set(st.getJobIdsForGroup(None))
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
            "noop").save()
        wall = time.perf_counter() - t0
        new = sorted(set(st.getJobIdsForGroup(None)) - before)
        nstages = ntasks = 0
        for j in new:
            ji = st.getJobInfo(j)
            if ji is None:
                continue
            for s in ji.stageIds:
                si = st.getStageInfo(s)
                if si is not None and si.numTasks > 0:
                    nstages += 1
                    ntasks += si.numTasks
        print(
            f"{name}: jobs={len(new)} stages={nstages} tasks={ntasks} "
            f"wall={wall:.2f}s", flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
