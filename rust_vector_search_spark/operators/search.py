"""RP-forest approximate SEARCH — operators O9, O10, O12 of the reference
(`/root/reference/src/lib.rs:105-149`), as a batch of queries (the
idiomatic Spark form, SURVEY §3.3).

Routing (O9 ``tree_result``): each query descends every tree; at an
inner node the side predicate (``src/hyperplane.rs:9-11``) picks the
child. The reference routes ONE query recursively; here ALL queries
route through ALL trees at once — one iterative broadcast-join per tree
level, queries × trees rows in flight, no per-query work on the driver.

Backfill deviation (SURVEY §1.5.3/§7.3.3): the reference tops up from the
sibling subtree with per-query sequential feedback (``src/lib.rs:122-124``)
and takes a leaf's FIRST min(n, len) entries (``src/lib.rs:110-113``).
Batch form: collect the WHOLE routed leaf, and when the leaf holds fewer
than k members, also collect every leaf under the sibling prefix — a
strictly-better-recall, order-independent approximation.

Candidate union across trees (O10): the reference's concurrent DashSet
(``src/lib.rs:131-135``) is exactly a shuffle ``distinct()`` on
(query_id, vec_id). Re-rank (O11/O12) reuses the exact-kNN machinery.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window

from ..functions.vector import point_is_above, sq_euc_dist
from .index import RPForest

__all__ = ["search_rp_forest", "route_queries"]


def route_queries(forest: RPForest, queries: DataFrame, max_depth: int = 64) -> DataFrame:
    """Descend every (query, tree) pair to its leaf. Returns
    (query_id, tree_id, leaf_path)."""
    spark = queries.sparkSession
    trees = spark.range(forest.num_trees).select(
        F.col("id").cast("int").alias("tree_id")
    )
    active = queries.crossJoin(trees).select(
        "tree_id", F.lit("").alias("node_path"), "query_id", "query_vec"
    )
    nodes = forest.nodes
    routed_parts: list[DataFrame] = []
    for depth in range(max_depth):
        stepped = active.join(F.broadcast(nodes), ["tree_id", "node_path"], "left")
        # no matching inner node ⇒ current path is a leaf
        at_leaf = stepped.filter(F.col("constant").isNull()).select(
            "query_id", "tree_id", F.col("node_path").alias("leaf_path")
        )
        routed_parts.append(at_leaf)
        descending = stepped.filter(F.col("constant").isNotNull())
        if descending.isEmpty():
            break
        active = descending.withColumn(
            "side",
            F.when(
                point_is_above(F.col("coeffs"), F.col("constant"), F.col("query_vec")),
                F.lit("1"),
            ).otherwise(F.lit("0")),
        ).select(
            "tree_id",
            F.concat(F.col("node_path"), F.col("side")).alias("node_path"),
            "query_id",
            "query_vec",
        )
    routed = routed_parts[0]
    for df in routed_parts[1:]:
        routed = routed.unionByName(df)
    return routed


def search_rp_forest(
    forest: RPForest,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    backfill: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k (O9+O10+O12). ``queries`` has (query_id,
    query_vec); returns (query_id, vec_id, dist, rnk)."""
    routed = route_queries(forest, queries)
    leaves = forest.leaves

    cand = routed.join(leaves, ["tree_id", "leaf_path"]).select("query_id", "vec_id")

    if backfill:
        # per routed leaf, if its member count < k pull every leaf under
        # the sibling prefix (src/lib.rs:122-124 batch approximation)
        leaf_sizes = leaves.groupBy("tree_id", "leaf_path").agg(
            F.count(F.lit(1)).alias("leaf_n")
        )
        underfull = (
            routed.join(F.broadcast(leaf_sizes), ["tree_id", "leaf_path"], "left")
            .filter((F.col("leaf_n") < k) | F.col("leaf_n").isNull())
            .filter(F.length("leaf_path") > 0)
            .select(
                "query_id",
                "tree_id",
                F.concat(
                    F.expr("substring(leaf_path, 1, length(leaf_path) - 1)"),
                    F.when(
                        F.expr("substring(leaf_path, length(leaf_path), 1)") == "1",
                        F.lit("0"),
                    ).otherwise(F.lit("1")),
                ).alias("sibling_prefix"),
            )
        )
        sib = underfull.join(
            leaves,
            (underfull.tree_id == leaves.tree_id)
            & leaves.leaf_path.startswith(underfull.sibling_prefix),
        ).select("query_id", "vec_id")
        cand = cand.unionByName(sib)

    cand = cand.distinct()  # O10: DashSet union ⇒ shuffle distinct

    vecs = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    scored = (
        cand.join(vecs, "vec_id")
        .join(F.broadcast(queries), "query_id")
        .select(
            "query_id", "vec_id", sq_euc_dist("query_vec", "v").alias("dist")
        )
    )
    if exclude_self:
        scored = scored.filter(F.col("vec_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )
