#!/usr/bin/env python3
"""Build and commit the RP-forest index FIXTURE that makes the forest
SEARCH path oracle-checkable (VERDICT r5 item 1).

The forest BUILD is seeded-random (xxhash64 pivot draws) and not
SQL-replayable — but the SEARCH over a FIXED, pre-built index is fully
deterministic: routing (`/root/reference/src/lib.rs:105-128`), sibling
backfill (`:122-124`), and exact re-rank (`:137-148`) are pure functions
of (nodes, leaves, queries). Building the reference-geometry forest
(50 trees, leaf ≤ 5, seed 42 — `src/main.rs:141-142`) ONCE from the
sf0.01 embeddings and committing the parquet lets the DuckDB oracle
replay the whole search with a recursive-CTE descent over the same
files, turning the forest family's rows-only evidence into hash-exact.

Rebuild (only if the sf0.01 fixtures regenerate):
    python3 tools/build_index_fixture.py
Deterministic: same embeddings + seed ⇒ bit-identical parquet content.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(REPO, "data", "index_fixture")


def main() -> None:
    from rust_vector_search_spark.operators.index import (
        build_rp_forest,
        save_index,
    )
    from rust_vector_search_spark.session import get_spark
    from rust_vector_search_spark.sources import load_table

    spark = get_spark(app_name="build_index_fixture")
    emb = load_table(spark, SF_DIR, "embeddings")
    forest = build_rp_forest(emb, num_trees=50, max_node_size=5, seed=42)
    # coalesce to one file per tree partition: a committed fixture wants
    # stable, minimal file layout, not build parallelism
    forest.nodes = forest.nodes.coalesce(1)
    forest.leaves = forest.leaves.coalesce(1)
    # compact=False: the committed fixture is replayed bit-for-bit by
    # the DuckDB oracle's full-precision recursive descent — it must
    # keep array<double> coeffs (the r10 compact default would round)
    save_index(forest, OUT, compact=False)
    print(
        f"fixture written to {OUT}: "
        f"{forest.node_count} nodes, depth {forest.max_depth}, "
        f"dim {forest.dim}, {forest.num_trees} trees"
    )
    spark.stop()


if __name__ == "__main__":
    main()
