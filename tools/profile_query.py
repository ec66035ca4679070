#!/usr/bin/env python3
"""r15 optimization loop: solo-time headline queries with the SAME
warm-up + noop-sink methodology as bench.py, and optionally dump
.explain("formatted") to plans/r15/<name>_<tag>.txt.

Usage:
  python tools/profile_query.py name[,name...] [--reps 3] [--tag before]
         [--sf /root/testdata/sf0.1] [--no-explain]

Prints per-rep walls and the median. Methodology matches bench.py
(full warm-up suite, release_driver_blocks between reps) so numbers
are comparable to the bench rows.
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
    reps, tag, do_explain = 3, None, True
    if "--sf" in args:
        i = args.index("--sf"); sf_dir = args[i + 1]; del args[i:i + 2]
    if "--reps" in args:
        i = args.index("--reps"); reps = int(args[i + 1]); del args[i:i + 2]
    if "--tag" in args:
        i = args.index("--tag"); tag = args[i + 1]; del args[i:i + 2]
    if "--no-explain" in args:
        args.remove("--no-explain"); do_explain = False
    names = [n for a in args for n in a.split(",") if n]
    if not names:
        raise SystemExit(__doc__)

    spark = get_spark(app_name="profile")
    # bench.py warm-up trio (JVM/codegen, forest family, streaming)
    spark.range(1000).selectExpr("sum(id)").collect()
    for w in ("q6_forecast_revenue", "ann_rp_forest_recall",
              "streaming_dedup_arrival_order"):
        QUERIES[w](spark, sf_dir).write.mode("overwrite").format("noop").save()

    plans_dir = os.path.join(
        REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16")
    )
    os.makedirs(plans_dir, exist_ok=True)

    for name in names:
        fn = QUERIES[name]
        if do_explain and tag:
            import contextlib, io
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(buf.getvalue())
        walls = []
        for _ in range(reps):
            release_driver_blocks(spark)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            walls.append(round(time.perf_counter() - t0, 3))
        med = sorted(walls)[len(walls) // 2]
        print(f"{name}: median {med} s  reps {walls}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
