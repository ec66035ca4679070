#!/usr/bin/env python3
"""Scale probe at the reference's dimensionality (VERDICT r1 #6): build
and search an RP forest over N×300-d synthetic vectors (seeded Gaussian
— wiki-news-300d stands in; the container has no network), measure
build / search wall-clock and recall@10 vs exact BLAS kNN.

Data is a seeded Gaussian-mixture (n/50 clusters, sigma 0.25) — the
cluster structure real embedding corpora have. Pass ``--gaussian`` for
unstructured i.i.d. Gaussian, the degenerate worst case for ANY
space-partitioning index (measured: recall 0.39 at 20k, reference
config — recorded in BASELINE.md as the adversarial floor).

Usage: python tools/scale_probe.py [n_vectors] [num_trees] [leaf]
           [--gaussian] [--batch B]
Defaults: 100_000 vectors, the reference's 50 trees / leaf 5.
``--batch B`` builds B trees at a time via build_rp_forest_batched —
bounds peak scratch disk to one batch's subtree exchange (the 65 GB
all-at-once exchange is what killed the first 1M attempt, BASELINE.md).
NB: local-mode driver JVM holds all per-level checkpoint blocks — run
with SPARK_GRAFT_DRIVER_MEM=48g for n >= 100k.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import pyspark.sql.functions as F  # noqa: E402


def main() -> None:
    argv = sys.argv[1:]
    batch = 0
    if "--batch" in argv:
        i = argv.index("--batch")
        batch = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    workdir = None
    if "--workdir" in argv:
        # build into a NAMED dir and keep it (no cleanup) so the search
        # leg can re-run via --index without paying the build again
        i = argv.index("--workdir")
        workdir = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    index_dir = None
    if "--index" in argv:
        # search-only mode: reuse a previously-built batched index (its
        # dir holds idx/{nodes,leaves} and the deduped emb parquet) —
        # lets the search/recall legs re-run without paying the build
        i = argv.index("--index")
        index_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    n_queries = 100
    if "--queries" in argv:
        i = argv.index("--queries")
        n_queries = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    sigma = 0.25
    if "--sigma" in argv:
        # cluster spread of the mixture corpus: 0.25 = the easy
        # clustered regime, ~1.0 = mid-hardness (cluster scale
        # comparable to center scale), --gaussian = the i.i.d. floor
        i = argv.index("--sigma")
        sigma = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    args = [a for a in argv if a != "--gaussian"]
    gaussian = "--gaussian" in argv
    n = int(args[0]) if len(args) > 0 else 100_000
    num_trees = int(args[1]) if len(args) > 1 else 50
    leaf = int(args[2]) if len(args) > 2 else 5
    dim, k = 300, 10

    # NB: measured at 320k nodes / 300-d (20k × 50 trees): the join-chain
    # fallback routes 100 queries in ~123 s vs ~239 s for a force-raised
    # broadcast node-map gate (per-worker unpickle of a ~1 GB python dict
    # dominates) — the default 256 MB gate picks the right path; don't
    # override SPARK_GRAFT_BC_NODES_MB here.
    os.environ.setdefault("SPARK_GRAFT_MAX_RESULT", "8g")

    from rust_vector_search_spark.operators.index import (
        build_rp_forest,
        build_rp_forest_batched,
    )
    from rust_vector_search_spark.operators.knn import knn_exact_fast
    from rust_vector_search_spark.operators.search import search_rp_forest
    from rust_vector_search_spark.session import get_spark

    spark = get_spark(app_name="scale_probe")

    if index_dir:
        from rust_vector_search_spark.operators.index import load_index
        from rust_vector_search_spark.operators.knn import knn_exact_fast
        from rust_vector_search_spark.operators.search import search_rp_forest
        from rust_vector_search_spark.session import get_spark

        spark = get_spark(app_name="scale_probe_search")
        emb = spark.read.parquet(f"{index_dir}/idx/emb").withColumnRenamed(
            "emb", "embedding"
        )
        forest = load_index(
            spark, f"{index_dir}/idx", num_trees=num_trees,
            max_node_size=leaf, seed=42,
        )
        print(
            f"loaded index: nodes={forest.node_count} depth={forest.max_depth}",
            flush=True,
        )
        q = emb.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        t0 = time.time()
        approx = search_rp_forest(forest, emb, q, k=k).select(
            "query_id", "vec_id"
        ).localCheckpoint(eager=True)
        n_approx = approx.count()
        t_search = time.time() - t0
        print(f"RESULT search: {t_search:.1f}s  ({n_approx} result rows)", flush=True)
        exact = knn_exact_fast(emb, q, k=k).select("query_id", "vec_id")
        hits = exact.join(approx, ["query_id", "vec_id"], "left_semi").count()
        total = n_queries * k
        print(
            f"RESULT recall@{k}: {hits / total:.3f}  "
            f"({num_trees} trees, leaf<={leaf}, from {index_dir})",
            flush=True,
        )
        return

    if workdir:
        os.makedirs(workdir, exist_ok=True)
    work = workdir or tempfile.mkdtemp(prefix="scale_probe_")
    try:
        kind = "gaussian" if gaussian else f"{n // 50}-cluster mixture (sigma {sigma})"
        print(f"generating {n} x {dim}-d vectors ({kind}, seed 42) ...", flush=True)
        rng = np.random.default_rng(42)
        import pandas as pd

        centers = None if gaussian else rng.standard_normal((n // 50, dim))
        chunks = []
        for lo in range(0, n, 20_000):
            hi = min(lo + 20_000, n)
            if gaussian:
                X = rng.standard_normal((hi - lo, dim)).astype(np.float32)
            else:
                which = rng.integers(0, len(centers), hi - lo)
                X = (
                    centers[which] + sigma * rng.standard_normal((hi - lo, dim))
                ).astype(np.float32)
            chunks.append(
                pd.DataFrame({"vec_id": np.arange(lo, hi), "embedding": list(X)})
            )
        spark.createDataFrame(pd.concat(chunks)).repartition(32).write.mode(
            "overwrite"
        ).parquet(f"{work}/emb")
        emb = spark.read.parquet(f"{work}/emb")
        emb.count()

        t0 = time.time()
        if batch:
            forest = build_rp_forest_batched(
                emb,
                f"{work}/idx",
                num_trees=num_trees,
                max_node_size=leaf,
                seed=42,
                max_depth=32,
                local_threshold=16384,
                tree_batch_size=batch,
            )
        else:
            forest = build_rp_forest(
                emb,
                num_trees=num_trees,
                max_node_size=leaf,
                seed=42,
                max_depth=32,
                local_threshold=16384,
            )
        t_build = time.time() - t0
        free_gb = shutil.disk_usage("/").free / 2**30
        print(
            f"RESULT build: {t_build:.1f}s  trees={num_trees} leaf<={leaf} "
            f"nodes={forest.node_count} depth={forest.max_depth} "
            f"batch={batch or 'mono'} disk_free={free_gb:.0f}G",
            flush=True,
        )
        if workdir:
            # substrate metadata (VERDICT r14 #5): a persisted probe
            # substrate must carry its OWN build parameters, because a
            # later rebuild that guesses them (e.g. deep_index_probe's
            # _ensure_index, which has no --sigma flag) would silently
            # put a DIFFERENT corpus under the same name — the
            # idxm500k hazard: reclaim the sigma=1.0 hard-regime
            # substrate, rebuild by flag, and every number measured on
            # it after that is mislabeled history.
            import json

            with open(os.path.join(workdir, "substrate_meta.json"), "w") as f:
                json.dump(
                    {
                        "n": n, "dim": dim, "num_trees": num_trees,
                        "leaf": leaf, "seed": 42,
                        "gaussian": bool(gaussian),
                        "sigma": None if gaussian else sigma,
                        "batch": batch,
                    },
                    f,
                )

        q = emb.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        t0 = time.time()
        approx = search_rp_forest(forest, emb, q, k=k).select(
            "query_id", "vec_id"
        ).localCheckpoint(eager=True)
        n_approx = approx.count()
        t_search = time.time() - t0
        print(f"RESULT search: {t_search:.1f}s  ({n_approx} result rows)", flush=True)

        exact = knn_exact_fast(emb, q, k=k).select("query_id", "vec_id")
        hits = exact.join(approx, ["query_id", "vec_id"], "left_semi").count()
        total = n_queries * k
        print(
            f"RESULT recall@{k}: {hits / total:.3f}  "
            f"({n} x {dim}-d, {num_trees} trees, leaf<={leaf})",
            flush=True,
        )
    finally:
        if not workdir:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
