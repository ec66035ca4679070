"""RP-forest (Annoy-style) index BUILD — operators O4–O8 of the reference
(`/root/reference/src/lib.rs:22-103`), re-architected for Spark.

The reference builds each tree by sequential recursion (``build_a_tree``,
``src/lib.rs:50-62``) parallelized per-tree with rayon (``src/lib.rs:93-96``).
A literal translation would put one tree per task and recurse on the
driver — useless at 100 TB. Instead the build is LEVEL-SYNCHRONOUS
(SURVEY §3.2): one DataFrame holds every (tree, vector) assignment, and
each iteration splits EVERY open node of EVERY tree at once:

  1. annotate each row with its node's population and a seeded-hash rank
     — ONE shuffle on (tree_id, node_path) serves both window functions;
  2. nodes ≤ max_node_size close into leaves; for open nodes the two
     rank-1/rank-2 rows are the split pivots (the reference's
     ``choose_multiple`` 2-sample, ``src/lib.rs:26-28``, made seedable
     per SURVEY §1.5.5 — the hash is salted with the depth so a
     degenerate split redraws different pivots next level);
  3. hyperplane per node: normal = b − a, constant = −normal·midpoint
     (``build_hyperplane``, ``src/lib.rs:22-48``) — a tiny per-node
     table broadcast back (no shuffle);
  4. route every row: side = n·x + c ≥ 0 (ties "above", preserving
     ``src/hyperplane.rs:10``), append the side bit to node_path.

Each level materializes once (eager ``localCheckpoint``) — this both
truncates lineage (SURVEY §7.3.1) and makes the per-level driver
decision (how many rows remain open) a metadata check instead of a
recomputation. Depth = ceil(log2(n/max_node_size)) levels; the shuffle
key (tree_id, node_path) keeps trees and subtrees co-located. The
finished index is two Parquet-able DataFrames — the index IS a table.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from ..functions.vector import avg_vec, dot, point_is_above, sub_vec

__all__ = ["RPForest", "build_rp_forest", "save_index", "load_index"]


@dataclass
class RPForest:
    """The forest as relational data (SURVEY §1.1 'index tree'/'forest'):
    ``nodes``:  (tree_id, node_path, coeffs ARRAY<DOUBLE>, constant DOUBLE)
    ``leaves``: (tree_id, leaf_path, vec_id)
    """

    nodes: DataFrame
    leaves: DataFrame
    num_trees: int
    max_node_size: int
    seed: int
    max_depth: int = 0  # deepest inner-node level; routing needs ≤ max_depth+1 steps
    node_count: int = 0  # total hyperplanes; drives broadcast-vs-shuffle routing


def build_rp_forest(
    emb: DataFrame,
    num_trees: int = 16,
    max_node_size: int = 32,
    seed: int = 42,
    max_depth: int = 24,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dedup: bool = True,
    checkpoint_interval: int = 1,
) -> RPForest:
    """Build the forest (O8 ``build_index``, ``src/lib.rs:81-103``).

    ``dedup=True`` mirrors the reference's exact dedup before build
    (``src/lib.rs:87-88``) — duplicate vectors would defeat hyperplane
    splits (a node of identical points can never separate) and create
    hot leaves; SURVEY §7.3.4."""
    spark = emb.sparkSession
    base = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("emb"))
    if dedup:
        keep = base.groupBy("emb").agg(F.min("vec_id").alias("vec_id"))
        base = base.join(keep, ["emb", "vec_id"], "left_semi")

    trees = spark.range(num_trees).select(F.col("id").cast("int").alias("tree_id"))
    active = (
        base.crossJoin(trees)
        .select("tree_id", F.lit("").alias("node_path"), "vec_id", "emb")
        .localCheckpoint(eager=True)
    )

    all_leaves: list[DataFrame] = []
    all_nodes: list[DataFrame] = []
    depth_reached = 0

    for depth in range(max_depth):
        node_w = Window.partitionBy("tree_id", "node_path")
        rank_w = node_w.orderBy(
            F.xxhash64("vec_id", "tree_id", "node_path", F.lit(seed), F.lit(depth))
        )
        annotated = active.select(
            "tree_id",
            "node_path",
            "vec_id",
            "emb",
            F.count(F.lit(1)).over(node_w).alias("_n"),
            F.row_number().over(rank_w).alias("_rk"),
        )

        closed = annotated.filter(F.col("_n") <= max_node_size)
        all_leaves.append(
            closed.select("tree_id", F.col("node_path").alias("leaf_path"), "vec_id")
        )
        opened = annotated.filter(F.col("_n") > max_node_size)

        # hyperplanes from the two pivot rows of each open node (O5)
        planes = (
            opened.filter(F.col("_rk") <= 2)
            .groupBy("tree_id", "node_path")
            .agg(
                F.max(F.when(F.col("_rk") == 1, F.col("emb"))).alias("a"),
                F.max(F.when(F.col("_rk") == 2, F.col("emb"))).alias("b"),
            )
            .select(
                "tree_id",
                "node_path",
                sub_vec("b", "a").alias("coeffs"),
                (-dot(sub_vec("b", "a"), avg_vec("a", "b"))).alias("constant"),
            )
            # plane-normal norm, precomputed once so multi-probe search can
            # turn n·x + c into a geometric point-to-plane distance
            .withColumn("coeff_norm", F.sqrt(dot("coeffs", "coeffs")))
        )
        all_nodes.append(planes)

        # route open rows (O6/O7): side bit appended to the path
        active = (
            opened.join(F.broadcast(planes), ["tree_id", "node_path"])
            .withColumn(
                "side",
                F.when(
                    point_is_above(F.col("coeffs"), F.col("constant"), F.col("emb")),
                    F.lit("1"),
                ).otherwise(F.lit("0")),
            )
            .select(
                "tree_id",
                F.concat(F.col("node_path"), F.col("side")).alias("node_path"),
                "vec_id",
                "emb",
            )
        )
        depth_reached = depth + 1
        # materialize + check termination every few levels: intermediate
        # levels chain lazily (their shuffles still execute, but no extra
        # materialization/job-boundary cost per level)
        if depth % checkpoint_interval == checkpoint_interval - 1:
            active = active.localCheckpoint(eager=True)
            if active.rdd.isEmpty():
                break

    # depth cap reached: force-close whatever is still open
    all_leaves.append(
        active.select("tree_id", F.col("node_path").alias("leaf_path"), "vec_id")
    )

    leaves = all_leaves[0]
    for df in all_leaves[1:]:
        leaves = leaves.unionByName(df)
    if all_nodes:
        nodes = all_nodes[0]
        for df in all_nodes[1:]:
            nodes = nodes.unionByName(df)
    else:
        nodes = spark.createDataFrame(
            [],
            "tree_id int, node_path string, coeffs array<double>, "
            "constant double, coeff_norm double",
        )
    nodes = nodes.localCheckpoint(eager=True)
    return RPForest(
        nodes=nodes,
        leaves=leaves.localCheckpoint(eager=True),
        num_trees=num_trees,
        max_node_size=max_node_size,
        seed=seed,
        max_depth=depth_reached,
        node_count=nodes.count(),
    )


def save_index(forest: RPForest, path: str) -> None:
    """Persist the forest as Parquet partitioned by tree_id — a NEW
    capability vs the reference (whose index dies with the process,
    ``src/lib.rs:15-19``); partition pruning makes single-tree reads
    cheap at scale."""
    forest.nodes.write.mode("overwrite").partitionBy("tree_id").parquet(
        f"{path}/nodes"
    )
    forest.leaves.write.mode("overwrite").partitionBy("tree_id").parquet(
        f"{path}/leaves"
    )


def load_index(
    spark: SparkSession, path: str, num_trees: int, max_node_size: int, seed: int
) -> RPForest:
    nodes = spark.read.parquet(f"{path}/nodes")
    stats = nodes.agg(
        F.max(F.length("node_path")).alias("d"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    return RPForest(
        nodes=nodes,
        leaves=spark.read.parquet(f"{path}/leaves"),
        num_trees=num_trees,
        max_node_size=max_node_size,
        seed=seed,
        max_depth=(stats.d or 0) + 1,
        node_count=stats.n,
    )
