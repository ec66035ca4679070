"""Index maintenance: resplit_overgrown_leaves — the repair half of the
"append now, rebuild periodically" contract of incremental_index_ingest.

The reference's invariant is leaf ≤ max_node_size DEDUPED vectors
(/root/reference/src/lib.rs:50-62 recursion floor after the
src/lib.rs:87-88 dedup); ingest through frozen hyperplanes erodes it.
These tests pin that maintenance restores the invariant without touching
routing for untouched leaves, preserves membership exactly, keeps the
forest routable (every member still routes to its own leaf), follows
build's dedup semantics (dup-only overgrowth is NOT overgrowth), and is
deterministic/idempotent.
"""

from __future__ import annotations

from dataclasses import replace

import pyspark.sql.functions as F
import pytest

from rust_vector_search_spark.operators.index import (
    build_rp_forest,
    delete_vectors,
    prune_underfull_subtrees,
    resplit_overgrown_leaves,
)
from rust_vector_search_spark.operators.search import route_queries

from conftest import SF_SMOKE


def _ingest_batch(forest, new_vectors):
    """The batch twin of incremental_index_ingest's foreachBatch body:
    route through the FROZEN forest, append to leaves."""
    routed = route_queries(
        forest,
        new_vectors.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        ),
        route_strategy="join",
    ).select("tree_id", "leaf_path", F.col("query_id").alias("vec_id"))
    return replace(forest, leaves=forest.leaves.unionByName(routed))


@pytest.fixture(scope="module")
def overgrown(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") < 300)
    forest = build_rp_forest(base, num_trees=3, max_node_size=8, seed=42)
    aug = _ingest_batch(forest, emb.filter(F.col("vec_id") >= 300))
    return emb, forest, aug


def _leaf_sizes(leaves):
    return leaves.groupBy("tree_id", "leaf_path").count()


def test_resplit_restores_leaf_bound(spark, overgrown):
    emb, _, aug = overgrown
    n_over = _leaf_sizes(aug.leaves).filter(F.col("count") > 8).count()
    assert n_over > 0, "fixture must actually overgrow some leaves"

    fixed = resplit_overgrown_leaves(aug, emb)
    # invariant restored (smoke embeddings are distinct, so raw == rep)
    assert _leaf_sizes(fixed.leaves).filter(F.col("count") > 8).count() == 0
    # membership preserved exactly
    assert (
        fixed.leaves.select("tree_id", "vec_id")
        .exceptAll(aug.leaves.select("tree_id", "vec_id"))
        .count()
        == 0
    )
    assert fixed.leaves.count() == aug.leaves.count()
    # new paths only EXTEND old ones: every new leaf is a descendant of
    # (or equal to) a pre-maintenance leaf of the same tree
    old = aug.leaves.select(
        "tree_id", F.col("leaf_path").alias("old_path")
    ).distinct()
    orphans = (
        fixed.leaves.select("tree_id", "leaf_path")
        .distinct()
        .join(old, "tree_id")
        .groupBy("tree_id", "leaf_path")
        .agg(
            F.max(
                F.col("leaf_path").startswith(F.col("old_path"))
            ).alias("anchored")
        )
        .filter(~F.col("anchored"))
        .count()
    )
    assert orphans == 0
    # stats refreshed, stale persisted layout disowned
    assert fixed.node_count > aug.node_count
    assert fixed.path is None


def test_resplit_forest_stays_routable(spark, overgrown):
    """Every indexed vector, routed as a query through the maintained
    forest, must land exactly in the leaf that contains it — the
    property that makes the extended trees a real index, not just a
    relabeling."""
    emb, _, aug = overgrown
    fixed = resplit_overgrown_leaves(aug, emb)
    sample = emb.filter(F.col("vec_id") % 7 == 0)
    routed = route_queries(
        fixed,
        sample.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        ),
        route_strategy="join",
    ).select("tree_id", "leaf_path", F.col("query_id").alias("vec_id"))
    missing = routed.join(
        fixed.leaves, ["tree_id", "leaf_path", "vec_id"], "left_anti"
    ).count()
    assert missing == 0
    assert routed.count() == sample.count() * fixed.num_trees


def test_resplit_deterministic(spark, overgrown):
    emb, _, aug = overgrown
    a = resplit_overgrown_leaves(aug, emb)
    b = resplit_overgrown_leaves(aug, emb)
    assert sorted(
        a.nodes.select("tree_id", "node_path", "constant").collect()
    ) == sorted(b.nodes.select("tree_id", "node_path", "constant").collect())
    assert sorted(a.leaves.collect()) == sorted(b.leaves.collect())


def test_resplit_idempotent_and_noop(spark, overgrown):
    emb, forest, aug = overgrown
    # no overgrown leaves → the SAME forest object back, zero rebuild
    assert resplit_overgrown_leaves(forest, emb) is forest
    # maintenance of maintained forest → no further change
    fixed = resplit_overgrown_leaves(aug, emb)
    again = resplit_overgrown_leaves(fixed, emb)
    assert again is fixed


def test_resplit_missing_payload_raises(spark, overgrown):
    emb, _, aug = overgrown
    with pytest.raises(RuntimeError, match="missing from the supplied"):
        resplit_overgrown_leaves(aug, emb.filter(F.col("vec_id") != 450))


def test_delete_vectors(spark, overgrown):
    emb, forest, _ = overgrown
    doomed = emb.filter(F.col("vec_id") < 50).select("vec_id")
    after = delete_vectors(forest, doomed)
    # gone from every tree's leaves; everything else untouched
    assert after.leaves.filter(F.col("vec_id") < 50).count() == 0
    assert (
        after.leaves.count()
        == forest.leaves.count() - 50 * forest.num_trees
    )
    assert after.nodes is forest.nodes  # hyperplanes untouched
    assert after.path == forest.path  # persisted nodes still valid
    # deleted ids can never surface: candidates come from leaves only
    from rust_vector_search_spark.operators.search import search_rp_forest

    res = search_rp_forest(
        after,
        emb,
        emb.filter(F.col("vec_id").isin(100, 200)).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        ),
        k=5,
    )
    assert res.filter(F.col("vec_id") < 50).count() == 0
    assert res.count() == 10


def test_prune_underfull_subtrees(spark, overgrown):
    emb, forest, _ = overgrown
    # fresh build: every inner node was split BECAUSE it held more than
    # max_node_size members — prune is a no-op, same object back
    assert prune_underfull_subtrees(forest) is forest

    # mass deletion (80%) leaves subtrees underfull and some empty
    survivors = emb.filter(F.col("vec_id") < 60)
    thinned = delete_vectors(
        forest, emb.filter(F.col("vec_id") >= 60).select("vec_id")
    )
    pruned = prune_underfull_subtrees(thinned)
    assert pruned.node_count < forest.node_count
    assert pruned.path is None
    # membership preserved exactly
    assert pruned.leaves.count() == thinned.leaves.count()
    assert (
        pruned.leaves.select("tree_id", "vec_id")
        .exceptAll(thinned.leaves.select("tree_id", "vec_id"))
        .count()
        == 0
    )
    # structural invariants: every surviving node's subtree holds more
    # than max_node_size members, and every proper prefix of every leaf
    # is a surviving node (the tree is still a tree)
    sizes = (
        pruned.leaves.join(
            pruned.nodes.select("tree_id", "node_path"), "tree_id"
        )
        .filter(F.col("leaf_path").startswith(F.col("node_path")))
        .filter(F.length("leaf_path") > F.length("node_path"))
        .groupBy("tree_id", "node_path")
        .count()
    )
    assert sizes.filter(F.col("count") <= 8).count() == 0
    assert sizes.count() == pruned.node_count  # no zero-member nodes
    # still routable: every survivor routes to its own leaf
    routed = route_queries(
        pruned,
        survivors.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        ),
        route_strategy="join",
    ).select("tree_id", "leaf_path", F.col("query_id").alias("vec_id"))
    assert (
        routed.join(
            pruned.leaves, ["tree_id", "leaf_path", "vec_id"], "left_anti"
        ).count()
        == 0
    )
    # idempotent: a pruned forest has nothing left to collapse
    assert prune_underfull_subtrees(pruned) is pruned


def test_resplit_duplicate_semantics(spark):
    """Build dedup semantics carried into maintenance: a leaf overgrown
    only by duplicate embeddings is left alone; in a genuinely
    splittable leaf the duplicates follow their representative into its
    new leaf."""
    dim_a = [1.0, 0.0]
    rows = (
        # representative + three duplicates of it
        [(0, dim_a), (4, dim_a), (5, dim_a), (6, dim_a)]
        # distinct fillers
        + [(i, [float(i), float(-i)]) for i in (1, 2, 3, 7, 8, 9, 10)]
    )
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )

    # dup-only overgrowth: 2 distinct embeddings, 5 members, max=4
    small = emb.filter(F.col("vec_id").isin(0, 1))
    f_small = build_rp_forest(small, num_trees=2, max_node_size=4, seed=7)
    aug_small = _ingest_batch(
        f_small, emb.filter(F.col("vec_id").isin(4, 5, 6))
    )
    kept = resplit_overgrown_leaves(aug_small, emb)
    assert kept is aug_small  # dup-only overgrowth: untouched, no rebuild

    # splittable: 8 distinct embeddings (> max 4), dups ride along
    f_base = build_rp_forest(
        emb.filter(F.col("vec_id") < 4), num_trees=2, max_node_size=4, seed=7
    )
    aug = _ingest_batch(f_base, emb.filter(F.col("vec_id") >= 4))
    fixed = resplit_overgrown_leaves(aug, emb)
    sizes = (
        fixed.leaves.join(
            emb.select("vec_id", F.col("embedding").alias("_e")), "vec_id"
        )
        .groupBy("tree_id", "leaf_path")
        .agg(F.count_distinct("_e").alias("n_distinct"))
    )
    assert sizes.filter(F.col("n_distinct") > 4).count() == 0
    # duplicates share their representative's leaf, per tree
    rep_leaf = fixed.leaves.filter(F.col("vec_id") == 0).select(
        "tree_id", "leaf_path"
    )
    for dup in (4, 5, 6):
        dup_leaf = fixed.leaves.filter(F.col("vec_id") == dup).select(
            "tree_id", "leaf_path"
        )
        assert sorted(dup_leaf.collect()) == sorted(rep_leaf.collect())


def test_forest_health_stats_track_lifecycle_decay(spark, overgrown):
    """The rebuild-trigger signals (VERDICT r9 #4): overgrown_leaves
    sees ingest-side decay, fill_ratio sees deletion-side decay, and
    every column stays consistent with the leaf table it summarizes."""
    from rust_vector_search_spark.operators.index import forest_health_stats

    emb, fresh, aug = overgrown
    fresh_stats = {r.tree_id: r for r in forest_health_stats(fresh).collect()}
    assert len(fresh_stats) == 3
    n_base = fresh.leaves.filter(F.col("tree_id") == 0).count()
    for r in fresh_stats.values():
        assert r.n_vectors == n_base
        assert r.overgrown_leaves == 0  # fresh build holds the invariant
        assert 0.0 <= r.occupancy_gini < 1.0
        assert 0.0 < r.fill_ratio <= 1.0

    # ingest-side decay: the augmented (never-resplit) forest has
    # overgrown leaves, and fill can exceed 1 (members past capacity)
    aug_stats = {r.tree_id: r for r in forest_health_stats(aug).collect()}
    assert all(r.overgrown_leaves > 0 for r in aug_stats.values())
    assert all(r.fill_ratio > fresh_stats[t].fill_ratio
               for t, r in aug_stats.items())

    # deletion-side decay: drop 80% of members — survivors spread thin
    # across leaves positioned for the old corpus, so fill collapses
    # and the size distribution polarizes (Gini rises)
    kept = fresh.leaves.select("vec_id").distinct().filter(
        F.col("vec_id") % 5 == 0
    )
    shrunk = delete_vectors(
        fresh,
        fresh.leaves.select("vec_id").distinct().join(
            kept, "vec_id", "left_anti"
        ),
    )
    shrunk_stats = {
        r.tree_id: r for r in forest_health_stats(shrunk).collect()
    }
    for t, r in shrunk_stats.items():
        assert r.fill_ratio < fresh_stats[t].fill_ratio
        assert r.occupancy_gini > fresh_stats[t].occupancy_gini


def test_estimate_recall_mechanics(spark):
    """estimate_recall (VERDICT r11 #2): the sampled routing-quality
    probe next to the occupancy trigger. Pins: (1) deterministic for a
    fixed (corpus, seed); (2) exact regime — a single-leaf forest
    (max_node_size >= |corpus|) routes every query to the whole corpus,
    so recall is exactly 1.0; (3) bounds and the cost contract's sample
    honoring."""
    from rust_vector_search_spark.operators.index import build_rp_forest
    from rust_vector_search_spark.operators.search import estimate_recall

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")

    # exact regime: leaf cap >= corpus => one leaf per tree => brute force
    wide = build_rp_forest(emb, num_trees=2, max_node_size=600, seed=42)
    r = estimate_recall(wide, emb, n_sample=20, k=5, seed=3)
    assert r["recall"] == 1.0
    assert r["n_sample"] == 20 and r["k"] == 5
    assert r["total"] == r["hits"] == 20 * 5

    # a selective forest: bounded, deterministic, seed-sensitive sample
    forest = build_rp_forest(emb, num_trees=4, max_node_size=8, seed=42)
    a = estimate_recall(forest, emb, n_sample=30, k=5, seed=1)
    b = estimate_recall(forest, emb, n_sample=30, k=5, seed=1)
    assert a == b
    assert 0.0 <= a["recall"] <= 1.0
    assert a["total"] <= 30 * 5


def test_estimate_recall_complements_fill_trigger(spark, tmp_path):
    """The division of labor (VERDICT r11 #2): after a mass delete +
    prune, the drained-leaf-aware fill trigger fires (structure
    degraded — pre-r12 this read ~1.0 and was BLIND), and
    estimate_recall reads the routing quality of the surviving corpus
    directly — the number that tells the operator whether the firing
    is urgent. At smoke scale the survivors' recall stays high (a
    smaller corpus is easier), which is exactly the case where reading
    ONLY fill would over-alarm: the pair of signals is the point."""
    from rust_vector_search_spark.operators.index import (
        build_rp_forest,
        delete_vectors,
        needs_rebuild,
        prune_underfull_subtrees,
        save_index,
    )
    from rust_vector_search_spark.operators.search import estimate_recall

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    forest = build_rp_forest(emb, num_trees=4, max_node_size=8, seed=42)
    save_index(forest, str(tmp_path / "idx_er"))

    survivors = emb.filter(F.col("vec_id") % 5 == 0)
    pruned = prune_underfull_subtrees(
        delete_vectors(
            forest, emb.filter(F.col("vec_id") % 5 != 0).select("vec_id")
        )
    )
    v = needs_rebuild(pruned)
    # 80% gone: the occupancy trigger sees it even post-prune now
    assert v["fill_vs_fresh"] < 0.3
    assert v["needs_rebuild"] is True
    # the quality read over the CURRENT corpus is a separate signal
    er = estimate_recall(pruned, survivors, n_sample=30, k=5, seed=1)
    assert 0.0 <= er["recall"] <= 1.0
    assert er["n_sample"] == 30


def test_extend_forest_bit_identity_and_guards(spark, tmp_path):
    """extend_forest grows a persisted index in place and must be
    BIT-IDENTICAL to the larger fresh build (pivot hashes salt on
    absolute tree_id — the same property the batched build composes
    on): extend(5-tree index, +3) ≡ fresh 8-tree build, node for node,
    leaf for leaf. Also pins: baseline append (original trees keep
    their old denominator, new trees enter fresh, trigger quiet at
    1.0), the leftover-partition guard, and the no-path refusal."""
    import pytest as _pytest

    from rust_vector_search_spark.operators.index import (
        build_rp_forest_batched,
        extend_forest,
        load_index,
        needs_rebuild,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    p_full = str(tmp_path / "idx_full")
    p_part = str(tmp_path / "idx_part")
    full = build_rp_forest_batched(
        emb, p_full, num_trees=8, max_node_size=16, seed=42,
        tree_batch_size=3,
    )
    part = build_rp_forest_batched(
        emb, p_part, num_trees=5, max_node_size=16, seed=42,
        tree_batch_size=3,
    )

    ext = extend_forest(part, emb, 3, tree_batch_size=2)
    assert ext.num_trees == 8
    assert ext.path == p_part

    def _nodes(f):
        return sorted(
            (r.tree_id, r.node_path, tuple(r.coeffs), r.constant)
            for r in f.nodes.select(
                "tree_id", "node_path", "coeffs", "constant"
            ).collect()
        )

    def _leaves(f):
        return sorted(
            (r.tree_id, r.leaf_path, r.vec_id) for r in f.leaves.collect()
        )

    assert _nodes(ext) == _nodes(full)
    assert _leaves(ext) == _leaves(full)

    # baseline: 8 per-tree rows, the original 5 carried VERBATIM
    assert [r["tree_id"] for r in ext.fresh_health] == list(range(8))
    assert ext.fresh_health[:5] == part.fresh_health[:5]
    v = needs_rebuild(ext)
    assert abs(v["fill_vs_fresh"] - 1.0) < 1e-9
    assert v["needs_rebuild"] is False
    # the rewritten on-disk baseline round-trips through a fresh load
    reloaded = load_index(
        spark, p_part, num_trees=8, max_node_size=16, seed=42
    )
    assert {r["tree_id"] for r in reloaded.fresh_health} == set(range(8))

    # leftover-partition guard: loading the (now 8-tree) dir with a
    # stale count and extending again must refuse, not interleave
    stale = load_index(
        spark, p_part, num_trees=5, max_node_size=16, seed=42
    )
    with _pytest.raises(ValueError, match="holds tree_id"):
        extend_forest(stale, emb, 2)

    # in-memory forests must be saved first
    mem = build_rp_forest(emb, num_trees=2, max_node_size=16, seed=42)
    with _pytest.raises(ValueError, match="no persisted path"):
        extend_forest(mem, emb, 1)


def test_recall_baseline_roundtrip_matches_uncached(spark, tmp_path):
    """save_recall_baseline + cached estimate_recall (r12): on an
    UNCHANGED corpus the cached check must answer the exact same
    question as the uncached probe — same pinned sample (identical
    seeded xxhash64 order), same exact truth (top-k prefix of the
    persisted top-k_eff), same forest search — so recall/hits/total
    are equal, with zero exhausted queries and the cached marker set."""
    from rust_vector_search_spark.operators.search import (
        estimate_recall,
        save_recall_baseline,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    forest = build_rp_forest(emb, num_trees=4, max_node_size=8, seed=42)
    p = str(tmp_path / "idx_rb")

    info = save_recall_baseline(
        forest, emb, p, n_sample=25, k=5, reserve=3, seed=7
    )
    assert info["n_sample"] == 25 and info["k_eff"] == 15
    assert info["n_corpus"] == emb.count()

    uncached = estimate_recall(forest, emb, n_sample=25, k=5, seed=7)
    cached = estimate_recall(
        forest, emb, n_sample=25, k=5, seed=7, truth_path=p
    )
    assert cached["cached"] is True
    assert cached["n_exhausted"] == 0
    assert cached["inserted_at_least"] == 0
    for key in ("recall", "hits", "total", "n_sample", "k", "seed"):
        assert cached[key] == uncached[key], key


def test_recall_baseline_stays_exact_under_deletion(spark, tmp_path):
    """The deletion contract: with >= k cached survivors per query the
    first k survivors ARE the exact current top-k, so the cached
    check must equal a from-scratch recomputation (fresh BLAS truth on
    the SAME pinned queries over the survivor corpus) — not an
    approximation of it. Uniform 50% delete against reserve=4 leaves
    ~2k survivors per window: nothing exhausts."""
    from rust_vector_search_spark.operators.knn import knn_exact_fast
    from rust_vector_search_spark.operators.search import (
        estimate_recall,
        save_recall_baseline,
        search_rp_forest,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    forest = build_rp_forest(emb, num_trees=4, max_node_size=8, seed=42)
    p = str(tmp_path / "idx_rbdel")
    save_recall_baseline(forest, emb, p, n_sample=20, k=5, reserve=4, seed=3)

    survivors = emb.filter(F.col("vec_id") % 2 == 0)
    shrunk = delete_vectors(
        forest, emb.filter(F.col("vec_id") % 2 != 0).select("vec_id")
    )
    cached = estimate_recall(
        shrunk, survivors, n_sample=20, k=5, seed=3, truth_path=p
    )
    assert cached["n_exhausted"] == 0
    assert cached["n_sample"] == 20

    # from-scratch ground truth on the pinned sample over the survivors
    q = spark.read.parquet(f"{p}/recall_truth/queries")
    exact = knn_exact_fast(survivors, q, k=5).select("query_id", "vec_id")
    approx = search_rp_forest(shrunk, survivors, q, k=5).select(
        "query_id", "vec_id"
    )
    total = exact.count()
    hits = exact.join(approx, ["query_id", "vec_id"], "left_semi").count()
    assert cached["total"] == total
    assert cached["hits"] == hits
    assert cached["recall"] == (hits / total)


def test_recall_baseline_exhaustion_and_guards(spark, tmp_path):
    """Honesty edges: (1) reserve=1 + a 90% delete exhausts every
    query's window -> typed error demanding a re-anchor, never a
    silently-wrong ratio; (2) an insert past the baseline count is
    outside the cached contract -> strict raises, strict=False reports
    retention with the inserted_at_least flag; (3) parameter conflicts
    with the anchored meta raise instead of answering a different
    question than the caller named."""
    import pytest as _pytest

    from rust_vector_search_spark.operators.search import (
        estimate_recall,
        save_recall_baseline,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    forest = build_rp_forest(emb, num_trees=4, max_node_size=8, seed=42)

    # (1) no margin: k_eff == k, so any k-window casualty exhausts
    p1 = str(tmp_path / "idx_rbx1")
    save_recall_baseline(forest, emb, p1, n_sample=15, k=5, reserve=1, seed=3)
    tenth = emb.filter(F.col("vec_id") % 10 == 0)
    shrunk = delete_vectors(
        forest, emb.filter(F.col("vec_id") % 10 != 0).select("vec_id")
    )
    with _pytest.raises(ValueError, match="re-anchor"):
        estimate_recall(shrunk, tenth, n_sample=15, k=5, seed=3, truth_path=p1)

    # (2) inserts: foreign ids the anchor never saw
    p2 = str(tmp_path / "idx_rbx2")
    save_recall_baseline(forest, emb, p2, n_sample=15, k=5, reserve=4, seed=3)
    grown = emb.select("vec_id", "embedding").unionByName(
        emb.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    )
    with _pytest.raises(ValueError, match="absent from the anchored"):
        estimate_recall(forest, grown, n_sample=15, k=5, seed=3, truth_path=p2)
    retention = estimate_recall(
        forest, grown, n_sample=15, k=5, seed=3, truth_path=p2, strict=False
    )
    assert retention["inserted_at_least"] == emb.count()
    assert 0.0 <= retention["recall"] <= 1.0

    # (3) conflicts with the anchored meta
    with _pytest.raises(ValueError, match="exceeds the baseline"):
        estimate_recall(forest, emb, n_sample=15, k=9, seed=3, truth_path=p2)
    with _pytest.raises(ValueError, match="n_sample"):
        estimate_recall(forest, emb, n_sample=20, k=5, seed=3, truth_path=p2)
    with _pytest.raises(ValueError, match="seed"):
        estimate_recall(forest, emb, n_sample=15, k=5, seed=4, truth_path=p2)


def test_recall_baseline_mixed_exhaustion_accounting(spark, tmp_path):
    """The partial-exhaustion regime (between the all-certified and
    all-exhausted edges already pinned): a thin reserve + heavy
    clustered deletion exhausts SOME queries' cached windows. The
    exhausted count must match an INDEPENDENT numpy recomputation
    (full float64 distance sort per pinned query, same (dist, vec_id)
    tie-breaks, survivor filter applied to the top-k_eff window), and
    the certified queries' recall must equal a fresh BLAS recompute
    restricted to the same certified set — exhaustion may shrink the
    sample, never tilt the ratio."""
    import numpy as np

    from rust_vector_search_spark.operators.knn import knn_exact_fast
    from rust_vector_search_spark.operators.search import (
        estimate_recall,
        save_recall_baseline,
        search_rp_forest,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    forest = build_rp_forest(emb, num_trees=4, max_node_size=8, seed=42)
    p = str(tmp_path / "idx_rbmix")
    k, reserve = 5, 2
    save_recall_baseline(
        forest, emb, p, n_sample=25, k=k, reserve=reserve, seed=11
    )

    # clustered deletion: drop a contiguous id band (70%) so some
    # queries lose their whole neighborhood and others keep it
    survivors = emb.filter(
        (F.col("vec_id") % 10 < 3)
    )
    shrunk = delete_vectors(
        forest, emb.filter(F.col("vec_id") % 10 >= 3).select("vec_id")
    )
    res = estimate_recall(shrunk, survivors, k=k, truth_path=p)

    # independent oracle: numpy full-sort per pinned query
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    X = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    surv_ids = {r.vec_id for r in survivors.select("vec_id").collect()}
    qrows = spark.read.parquet(f"{p}/recall_truth/queries").collect()
    k_eff = k * reserve
    n_exhausted_expected = 0
    for qr in qrows:
        qv = np.array(list(qr.query_vec), dtype=np.float64)
        d = ((X - qv) ** 2).sum(axis=1)
        order = sorted(
            (float(d[i]), int(ids[i]))
            for i in range(len(ids))
            if int(ids[i]) != qr.query_id
        )
        window = order[:k_eff]
        n_surv = sum(1 for _, vid in window if vid in surv_ids)
        if n_surv < k and len(window) >= k_eff:
            n_exhausted_expected += 1
    assert res["n_exhausted"] == n_exhausted_expected
    assert res["n_exhausted"] > 0  # the regime actually exercised
    assert res["n_sample"] == 25 - n_exhausted_expected

    # certified-side parity: fresh BLAS truth on the certified queries
    q = spark.read.parquet(f"{p}/recall_truth/queries")
    exhausted_qids = set()
    for qr in qrows:
        qv = np.array(list(qr.query_vec), dtype=np.float64)
        d = ((X - qv) ** 2).sum(axis=1)
        order = sorted(
            (float(d[i]), int(ids[i]))
            for i in range(len(ids))
            if int(ids[i]) != qr.query_id
        )
        window = order[:k_eff]
        n_surv = sum(1 for _, vid in window if vid in surv_ids)
        if n_surv < k and len(window) >= k_eff:
            exhausted_qids.add(qr.query_id)
    cert_q = q.filter(~F.col("query_id").isin(list(exhausted_qids)))
    exact = knn_exact_fast(survivors, cert_q, k=k).select(
        "query_id", "vec_id"
    )
    approx = search_rp_forest(shrunk, survivors, cert_q, k=k).select(
        "query_id", "vec_id"
    )
    total = exact.count()
    hits = exact.join(approx, ["query_id", "vec_id"], "left_semi").count()
    assert res["total"] == total
    assert res["hits"] == hits


def test_recall_baseline_membership_guard_net_zero_drift(spark, tmp_path):
    """VERDICT r12 #1 (the round's one weak mark): a mixed insert+delete
    drift netting <= 0 rows escaped the count guard and certified stale
    cached neighbors as 'exact' recall. The anchor now persists the
    corpus id set and strict mode verifies MEMBERSHIP: delete k rows and
    insert k fresh-id rows (net 0 — the count guard reads 0 inserted)
    -> strict raises naming the foreign ids; strict=False proceeds and
    reports the EXACT foreign count as inserted_at_least, labeled
    retention."""
    import pytest as _pytest

    from rust_vector_search_spark.operators.search import (
        estimate_recall,
        save_recall_baseline,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    forest = build_rp_forest(emb, num_trees=4, max_node_size=8, seed=42)
    p = str(tmp_path / "idx_netzero")
    save_recall_baseline(forest, emb, p, n_sample=15, k=5, reserve=4, seed=3)

    # net-zero drift: drop 100 anchored ids, add 100 ids the anchor
    # never saw — corpus count is UNCHANGED
    dropped = emb.orderBy("vec_id").limit(100).select("vec_id")
    fresh = (
        emb.orderBy("vec_id")
        .limit(100)
        .select((F.col("vec_id") + 900000).alias("vec_id"), "embedding")
    )
    drifted = (
        emb.join(dropped, "vec_id", "left_anti")
        .select("vec_id", "embedding")
        .unionByName(fresh)
    )
    assert drifted.count() == emb.count()  # the count guard's blind spot

    with _pytest.raises(ValueError, match="absent from the anchored"):
        estimate_recall(forest, drifted, k=5, truth_path=p)
    retention = estimate_recall(
        forest, drifted, k=5, truth_path=p, strict=False
    )
    assert retention["inserted_at_least"] == 100  # exact, not max(0, 0)
    assert 0.0 <= retention["recall"] <= 1.0

    # pure deletion still passes strict: current ids are a subset
    survivors = emb.join(dropped, "vec_id", "left_anti")
    ok = estimate_recall(forest, survivors, k=5, truth_path=p)
    assert ok["inserted_at_least"] == 0


def test_recall_baseline_payload_check_catches_mutation(spark, tmp_path):
    """The id-immutability boundary, both sides: an in-place vector
    update under the SAME id passes the default id-only membership check
    (the documented assumption — ids name immutable payloads), and
    check_payload=True catches it via the anchored (vec_id, xxhash64)
    pairs. Also: check_payload against a pre-r13 anchor (no corpus_ids)
    refuses, and check_payload in uncached mode refuses."""
    import pytest as _pytest

    from rust_vector_search_spark.operators.search import (
        estimate_recall,
        save_recall_baseline,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    forest = build_rp_forest(emb, num_trees=4, max_node_size=8, seed=42)
    p = str(tmp_path / "idx_payload")
    save_recall_baseline(forest, emb, p, n_sample=15, k=5, reserve=4, seed=3)

    # mutate one row's payload in place (same id, different vector) —
    # cast back to array<float> so the untouched rows' hashes stay
    # byte-identical to the anchor (a silent widen to array<double>
    # would make EVERY row read as mutated and weaken the pin)
    mutated = emb.select(
        "vec_id",
        F.when(
            F.col("vec_id") == 0,
            F.transform("embedding", lambda x: x + F.lit(10.0)).cast(
                "array<float>"
            ),
        )
        .otherwise(F.col("embedding"))
        .alias("embedding"),
    )
    # id-only membership: passes (the documented assumption's blind side)
    ok = estimate_recall(forest, mutated, k=5, truth_path=p)
    assert ok["inserted_at_least"] == 0
    # content membership: the mutated (id, hash) pair is foreign
    with _pytest.raises(ValueError, match="mutated since"):
        estimate_recall(forest, mutated, k=5, truth_path=p, check_payload=True)
    # ... and it is EXACTLY the one mutated row, not a type-cast smear
    drift = estimate_recall(
        forest, mutated, k=5, truth_path=p, check_payload=True, strict=False
    )
    assert drift["inserted_at_least"] == 1
    # r14 (self-review): the impostor must not CERTIFY either — under
    # check_payload the hash-mismatched row drops out of the certified
    # survivors, so the accounting matches DELETING the row outright
    # (the anchored neighbor is gone; the +10-per-coord impostor is far
    # too distant to re-enter any top-k). Before the fix the survivor
    # semi-join stayed id-only and retention read as if nothing changed.
    del_r = estimate_recall(
        forest, emb.filter(F.col("vec_id") != 0), k=5, truth_path=p,
        strict=False,
    )
    assert (
        drift["total"], drift["hits"], drift["recall"],
        drift["n_exhausted"],
    ) == (
        del_r["total"], del_r["hits"], del_r["recall"],
        del_r["n_exhausted"],
    )
    # the unmutated corpus passes the content check
    ok2 = estimate_recall(forest, emb, k=5, truth_path=p, check_payload=True)
    assert ok2["inserted_at_least"] == 0

    # pre-r13 anchor: no corpus_ids -> check_payload refuses
    import shutil

    shutil.rmtree(f"{p}/recall_truth/corpus_ids")
    with _pytest.raises(ValueError, match="pre-r13 anchor"):
        estimate_recall(forest, emb, k=5, truth_path=p, check_payload=True)
    # uncached mode: nothing cached to verify
    with _pytest.raises(ValueError, match="only to cached mode"):
        estimate_recall(forest, emb, k=5, check_payload=True)


def test_recall_baseline_legacy_anchor_count_fallback(spark, tmp_path):
    """Anchors written before r13 lack corpus_ids: the check must fall
    back to the legacy count guard WITH a RuntimeWarning naming the
    re-anchor — never silently, and never by catching a read error (the
    absence probe goes through the Hadoop FS API)."""
    import shutil

    import pytest as _pytest

    from rust_vector_search_spark.operators.search import (
        estimate_recall,
        save_recall_baseline,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    forest = build_rp_forest(emb, num_trees=4, max_node_size=8, seed=42)
    p = str(tmp_path / "idx_legacy")
    save_recall_baseline(forest, emb, p, n_sample=15, k=5, reserve=4, seed=3)
    shutil.rmtree(f"{p}/recall_truth/corpus_ids")  # simulate pre-r13

    with _pytest.warns(RuntimeWarning, match="COUNT guard"):
        res = estimate_recall(forest, emb, k=5, truth_path=p)
    assert res["inserted_at_least"] == 0
    # the legacy guard still catches a pure count increase
    grown = emb.select("vec_id", "embedding").unionByName(
        emb.select((F.col("vec_id") + 700000).alias("vec_id"), "embedding")
    )
    with _pytest.warns(RuntimeWarning, match="COUNT guard"):
        with _pytest.raises(ValueError, match="grown"):
            estimate_recall(forest, grown, k=5, truth_path=p)


def test_recall_baseline_complete_neighborhood_certifies(spark, tmp_path):
    """ADVICE r12 #4: when the anchor corpus had exactly k_eff non-self
    rows, a query's full cached window IS its complete neighborhood —
    certifiable at ANY deletion depth. The count-only truncation rule
    read n_cached == k_eff as 'truncated' and could spuriously trip the
    all-exhausted refusal. Pin: tiny corpus (n = k_eff + 1), deep
    delete below k survivors -> every query still certifies, recall
    equals a fresh recompute over the survivors."""
    from rust_vector_search_spark.operators.knn import knn_exact_fast
    from rust_vector_search_spark.operators.search import (
        estimate_recall,
        save_recall_baseline,
        search_rp_forest,
    )

    emb = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .orderBy("vec_id")
        .limit(11)  # k_eff = 5*2 = 10 = n - 1: complete neighborhoods
    )
    forest = build_rp_forest(emb, num_trees=4, max_node_size=4, seed=42)
    p = str(tmp_path / "idx_complete")
    save_recall_baseline(
        forest, emb, p, n_sample=11, k=5, reserve=2, seed=3
    )

    # delete 8 of 11: every query keeps < k=5 cached survivors — the
    # old rule exhausted ALL of them and raised; the complete-window
    # rule certifies all
    survivors = emb.filter(F.col("vec_id") % 4 == 0)
    shrunk = delete_vectors(
        forest, emb.filter(F.col("vec_id") % 4 != 0).select("vec_id")
    )
    res = estimate_recall(shrunk, survivors, k=5, truth_path=p)
    assert res["n_exhausted"] == 0
    assert res["n_sample"] == 11

    # exactness: the certified truth equals a fresh BLAS recompute
    q = spark.read.parquet(f"{p}/recall_truth/queries")
    exact = knn_exact_fast(survivors, q, k=5).select("query_id", "vec_id")
    approx = search_rp_forest(shrunk, survivors, q, k=5).select(
        "query_id", "vec_id"
    )
    total = exact.count()
    hits = exact.join(approx, ["query_id", "vec_id"], "left_semi").count()
    assert res["total"] == total
    assert res["hits"] == hits


def test_cached_certification_fixture_ties_to_operator(spark):
    """The driver-window ledger (ann_cached_certification_fixture) and
    the REAL cached operator must tell the same story on the same
    inputs: the ledger's sums (certified count, exhausted count, total,
    hits) equal estimate_recall's dict over the identical fixture
    anchor + delete — so a hash-green driver row certifies the
    operator's math, not a lookalike twin's."""
    import tempfile

    from rust_vector_search_spark.operators.index import (
        delete_vectors,
        load_index,
    )
    from rust_vector_search_spark.operators.search import (
        estimate_recall,
        save_recall_baseline,
    )
    from rust_vector_search_spark.plans import QUERIES
    from rust_vector_search_spark.plans.annindex import (
        _CERT_RESERVE,
        _FIXTURE_DIR,
        _FIXTURE_MARGIN,
        K,
        N_QUERIES,
    )

    sf = "/root/testdata/sf0.01"  # the fixture was built from sf0.01
    ledger = {
        r.query_id: r
        for r in QUERIES["ann_cached_certification_fixture"](
            spark, sf
        ).collect()
    }
    assert len(ledger) == N_QUERIES
    # the regime must exercise BOTH branches of the exhaustion rule
    assert 0 < sum(r.certified for r in ledger.values()) < N_QUERIES

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    forest = load_index(
        spark, _FIXTURE_DIR, num_trees=50, max_node_size=5, seed=42
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    path = str(tempfile.mkdtemp(prefix="rp_cert_tie_"))
    save_recall_baseline(
        forest, emb, path, queries=q, k=K, reserve=_CERT_RESERVE,
        method="fold",
    )
    survivors = emb.filter(F.col("vec_id") % 2 == 0)
    shrunk = delete_vectors(
        forest, emb.filter(F.col("vec_id") % 2 != 0).select("vec_id")
    )
    res = estimate_recall(
        shrunk, survivors, k=K, truth_path=path,
        spill_margin=_FIXTURE_MARGIN, route_strategy="join",
    )
    assert res["n_sample"] == sum(r.certified for r in ledger.values())
    assert res["n_exhausted"] == sum(
        1 - r.certified for r in ledger.values()
    )
    assert res["total"] == sum(r.cert_total for r in ledger.values())
    assert res["hits"] == sum(r.cert_hits for r in ledger.values())
    assert res["recall"] == (
        res["hits"] / res["total"] if res["total"] else 1.0
    )


def test_resplit_batched_bit_identity(spark, overgrown, tmp_path):
    """VERDICT r13 #1: the debt-bounded chunked repair must be
    node-for-node and leaf-for-leaf identical to the one-shot form —
    the scale fix changes WHERE scratch peaks (one tree group's debt
    instead of the accumulated total), never what gets built. Chunk
    size 1 maximizes group boundaries (3 trees → 3 groups, every
    cross-tree interaction would surface); compact=False so the
    comparison is on full-precision doubles."""
    from rust_vector_search_spark.operators.index import (
        resplit_overgrown_leaves_batched,
        save_index,
    )

    emb, _, aug = overgrown
    one = resplit_overgrown_leaves(aug, emb)
    p_one = str(tmp_path / "one")
    save_index(one, p_one, compact=False)
    p_chunk = str(tmp_path / "chunk")
    chunked = resplit_overgrown_leaves_batched(
        aug, emb, p_chunk, tree_batch_size=1, compact=False
    )
    ncols = ["tree_id", "node_path", "coeffs", "constant", "coeff_norm"]
    a = spark.read.parquet(f"{p_one}/nodes").select(*ncols)
    b = spark.read.parquet(f"{p_chunk}/nodes").select(*ncols)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    lcols = ["tree_id", "leaf_path", "vec_id"]
    la = spark.read.parquet(f"{p_one}/leaves").select(*lcols)
    lb = spark.read.parquet(f"{p_chunk}/leaves").select(*lcols)
    assert la.exceptAll(lb).count() == 0
    assert lb.exceptAll(la).count() == 0
    # a second chunking (uneven groups: 2 + 1) lands on the same index
    p_chunk2 = str(tmp_path / "chunk2")
    resplit_overgrown_leaves_batched(
        aug, emb, p_chunk2, tree_batch_size=2, compact=False
    )
    b2 = spark.read.parquet(f"{p_chunk2}/nodes").select(*ncols)
    assert b2.exceptAll(b).count() == 0
    assert b.exceptAll(b2).count() == 0
    # the returned forest is the loaded persisted repair: immediately
    # routable (path set), bound restored, health baseline recorded
    assert chunked.path == p_chunk
    assert (
        _leaf_sizes(chunked.leaves).filter(F.col("count") > 8).count() == 0
    )
    assert chunked.fresh_health is not None
    assert chunked.node_count == one.node_count


def test_resplit_batched_guards_and_noop(spark, overgrown, tmp_path):
    """No-overgrowth short-circuit persists the input verbatim; writing
    the repair over the forest's own persisted layout is refused (the
    group writes stream FROM that layout while appending)."""
    from rust_vector_search_spark.operators.index import (
        resplit_overgrown_leaves_batched,
    )

    emb, fresh, _ = overgrown
    p = str(tmp_path / "noop")
    out = resplit_overgrown_leaves_batched(
        fresh, emb, p, tree_batch_size=2, compact=False
    )
    assert out.node_count == fresh.node_count
    assert out.leaves.count() == fresh.leaves.count()
    assert (
        out.leaves.select("tree_id", "leaf_path", "vec_id")
        .exceptAll(fresh.leaves.select("tree_id", "leaf_path", "vec_id"))
        .count()
        == 0
    )
    with pytest.raises(ValueError, match="overlap"):
        resplit_overgrown_leaves_batched(out, emb, p)
    # ADVICE r14: containment rejected in BOTH directions, not just
    # equality — nested out_path would plant index subdirs inside the
    # live layout; enclosing out_path would delete the source
    with pytest.raises(ValueError, match="overlap"):
        resplit_overgrown_leaves_batched(out, emb, f"{p}/nodes")
    with pytest.raises(ValueError, match="overlap"):
        resplit_overgrown_leaves_batched(out, emb, str(tmp_path))


def _persist_overgrown(spark, overgrown, base_dir, only_tree=None):
    """Materialize the overgrown fixture AS A PERSISTED LAYOUT: save the
    fresh forest, then append the ingested rows to {path}/leaves the way
    incremental_index_ingest does (partitioned parquet append). Returns
    the loaded (overgrown-on-disk) forest. ``only_tree`` confines the
    ingest to one tree — the localized-debt shape the partition-surgery
    contract is about."""
    from rust_vector_search_spark.operators.index import (
        load_index,
        save_index,
    )

    emb, fresh, aug = overgrown
    save_index(fresh, base_dir, compact=False)
    extra = aug.leaves.exceptAll(fresh.leaves)
    if only_tree is not None:
        extra = extra.filter(F.col("tree_id") == only_tree)
    extra.write.mode("append").partitionBy("tree_id").parquet(
        f"{base_dir}/leaves"
    )
    return load_index(spark, base_dir, fresh.num_trees, 8, 42)


def _lsfiles(root):
    import os

    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                out[os.path.relpath(p, root)] = os.path.getmtime(p)
    return out


def test_resplit_inplace_bit_identity(spark, overgrown, tmp_path):
    """VERDICT r14 #1: the in-place partition surgery must produce the
    SAME layout as the full-copy repair — node-for-node and
    leaf-for-leaf — while never rewriting untouched node files. Chunk
    size 1 maximizes group boundaries."""
    from rust_vector_search_spark.operators.index import (
        resplit_overgrown_leaves_batched,
        resplit_overgrown_leaves_inplace,
    )

    emb, _, _ = overgrown
    p = str(tmp_path / "live")
    loaded = _persist_overgrown(spark, overgrown, p)
    base_health = [dict(r) for r in loaded.fresh_health]
    nodes_before = _lsfiles(f"{p}/nodes")

    # full-copy reference repair of the SAME disk state
    p_ref = str(tmp_path / "ref")
    resplit_overgrown_leaves_batched(
        loaded, emb, p_ref, tree_batch_size=1, compact=False
    )
    surg = resplit_overgrown_leaves_inplace(
        loaded, emb, tree_batch_size=1
    )

    ncols = ["tree_id", "node_path", "coeffs", "constant", "coeff_norm"]
    a = spark.read.parquet(f"{p}/nodes").select(*ncols)
    b = spark.read.parquet(f"{p_ref}/nodes").select(*ncols)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    lcols = ["tree_id", "leaf_path", "vec_id"]
    la = spark.read.parquet(f"{p}/leaves").select(*lcols)
    lb = spark.read.parquet(f"{p_ref}/leaves").select(*lcols)
    assert la.exceptAll(lb).count() == 0
    assert lb.exceptAll(la).count() == 0

    # surgery contract, node side: pure append — every pre-surgery node
    # file survives byte-untouched (same path, same mtime)
    nodes_after = _lsfiles(f"{p}/nodes")
    for f, mt in nodes_before.items():
        assert f in nodes_after and nodes_after[f] == mt, f
    assert len(nodes_after) > len(nodes_before)

    # returned forest: reloaded from the repaired layout, bound
    # restored, baseline carried VERBATIM, marker gone
    assert surg.path == p
    assert (
        _leaf_sizes(surg.leaves).filter(F.col("count") > 8).count() == 0
    )
    assert [dict(r) for r in surg.fresh_health] == base_health
    import os

    assert not os.path.exists(f"{p}/_SURGERY_IN_PROGRESS")
    # idempotent: a second surgery finds nothing overgrown
    again = resplit_overgrown_leaves_inplace(surg, emb)
    assert again is surg


def test_resplit_inplace_touches_only_debt_trees(spark, overgrown, tmp_path):
    """The cost contract itself: debt confined to one tree must leave
    the OTHER trees' node AND leaf partitions byte-untouched — this is
    what makes maintenance wall ∝ debt instead of ∝ index size."""
    from rust_vector_search_spark.operators.index import (
        resplit_overgrown_leaves_inplace,
    )

    emb, _, _ = overgrown
    p = str(tmp_path / "live1")
    loaded = _persist_overgrown(spark, overgrown, p, only_tree=0)
    over0 = (
        _leaf_sizes(loaded.leaves).filter(F.col("count") > 8).collect()
    )
    assert over0 and all(r.tree_id == 0 for r in over0)
    nodes_before = _lsfiles(f"{p}/nodes")
    leaves_before = _lsfiles(f"{p}/leaves")

    surg = resplit_overgrown_leaves_inplace(loaded, emb)
    assert (
        _leaf_sizes(surg.leaves).filter(F.col("count") > 8).count() == 0
    )
    nodes_after = _lsfiles(f"{p}/nodes")
    leaves_after = _lsfiles(f"{p}/leaves")
    # untouched trees: every file identical, nothing added or removed
    for rel, mt in nodes_before.items():
        if "tree_id=0" not in rel:
            assert nodes_after.get(rel) == mt, rel
    for rel in nodes_after:
        if "tree_id=0" not in rel:
            assert rel in nodes_before, rel
    for rel, mt in leaves_before.items():
        if "tree_id=0" not in rel:
            assert leaves_after.get(rel) == mt, rel
    # the debt tree: nodes appended (old files intact), leaves replaced
    assert any(
        "tree_id=0" in rel and rel not in nodes_before
        for rel in nodes_after
    )
    for rel, mt in nodes_before.items():
        if "tree_id=0" in rel:
            assert nodes_after.get(rel) == mt, rel
    assert any(
        "tree_id=0" in rel and rel not in leaves_before
        for rel in leaves_after
    )


def test_resplit_inplace_guards(spark, overgrown, tmp_path):
    """Path-less forests are refused (nothing persisted to repair); a
    leftover surgery marker fences BOTH load_index and a re-repair; a
    layout with missing tree partitions loads with a warning (ADVICE
    r14: partial batched writes must not read as smaller indexes)."""
    import os
    import shutil
    import warnings

    from rust_vector_search_spark.operators.index import (
        load_index,
        resplit_overgrown_leaves_inplace,
    )

    emb, fresh, aug = overgrown
    with pytest.raises(ValueError, match="no\\s+persisted path"):
        resplit_overgrown_leaves_inplace(aug, emb)

    p = str(tmp_path / "marked")
    loaded = _persist_overgrown(spark, overgrown, p)
    open(f"{p}/_SURGERY_IN_PROGRESS", "w").close()
    with pytest.raises(ValueError, match="interrupted"):
        load_index(spark, p, loaded.num_trees, 8, 42)
    with pytest.raises(ValueError, match="interrupted"):
        resplit_overgrown_leaves_inplace(loaded, emb)
    os.remove(f"{p}/_SURGERY_IN_PROGRESS")

    # partial layout: drop one tree's node partition → loud warning
    shutil.rmtree(f"{p}/nodes/tree_id=2")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        load_index(spark, p, loaded.num_trees, 8, 42)
    assert any("tree partitions" in str(x.message) for x in w)


def test_compact_index_files_bit_identity_and_scope(
    spark, overgrown, tmp_path
):
    """File-level compaction (r15): fragmented tree_id partitions are
    rewritten to ONE data file each with content bit-identical
    (multiset, both tables); partitions at or under the threshold keep
    their bytes verbatim — cost ∝ fragmentation, the same contract as
    the partition-surgery repair. Health baseline and marker lifecycle
    follow the in-place family."""
    from rust_vector_search_spark.operators.index import (
        _partition_file_counts,
        compact_index_files,
    )

    emb, fresh, aug = overgrown
    p = str(tmp_path / "frag")
    loaded = _persist_overgrown(spark, overgrown, p)
    # fragment harder: three more ingest-shaped appends onto leaves
    extra = aug.leaves.exceptAll(fresh.leaves).localCheckpoint(eager=True)
    for _ in range(3):
        extra.write.mode("append").partitionBy("tree_id").parquet(
            f"{p}/leaves"
        )
    base_health = [dict(r) for r in loaded.fresh_health]
    ncols = ["tree_id", "node_path", "coeffs", "constant", "coeff_norm"]
    lcols = ["tree_id", "leaf_path", "vec_id"]
    nodes_before = (
        spark.read.parquet(f"{p}/nodes").select(*ncols)
        .localCheckpoint(eager=True)
    )
    leaves_before = (
        spark.read.parquet(f"{p}/leaves").select(*lcols)
        .localCheckpoint(eager=True)
    )
    files_before = {
        t: _partition_file_counts(spark, f"{p}/{t}")
        for t in ("nodes", "leaves")
    }
    mtimes_before = {
        t: _lsfiles(f"{p}/{t}") for t in ("nodes", "leaves")
    }
    thresh = 2
    assert any(
        n > thresh for c in files_before.values() for n in c.values()
    ), "fixture must actually be fragmented"

    out = compact_index_files(
        loaded, max_files_per_partition=thresh, tree_batch_size=1
    )

    # content identical, both tables, both directions
    na = spark.read.parquet(f"{p}/nodes").select(*ncols)
    assert na.exceptAll(nodes_before).count() == 0
    assert nodes_before.exceptAll(na).count() == 0
    la = spark.read.parquet(f"{p}/leaves").select(*lcols)
    assert la.exceptAll(leaves_before).count() == 0
    assert leaves_before.exceptAll(la).count() == 0

    # fragmented partitions now hold ONE file; healthy ones untouched
    for t in ("nodes", "leaves"):
        after = _partition_file_counts(spark, f"{p}/{t}")
        mt_after = _lsfiles(f"{p}/{t}")
        for tid, n in files_before[t].items():
            if n > thresh:
                assert after[tid] == 1, (t, tid)
            else:
                assert after[tid] == n, (t, tid)
                for rel, mt in mtimes_before[t].items():
                    if f"tree_id={tid}" in rel:
                        assert mt_after.get(rel) == mt, (t, rel)

    # returned forest: same path, baseline verbatim, marker gone,
    # membership readable
    import os

    assert out.path == p
    assert [dict(r) for r in out.fresh_health] == base_health
    assert not os.path.exists(f"{p}/_SURGERY_IN_PROGRESS")
    assert out.leaves.count() == leaves_before.count()

    # idempotent no-op: nothing left over the threshold
    again = compact_index_files(out, max_files_per_partition=thresh)
    assert again is out


def test_compact_index_files_guards(spark, overgrown, tmp_path):
    """Path-less forests refused; leftover marker fences; bad threshold
    refused — the in-place family's guard contract."""
    from rust_vector_search_spark.operators.index import (
        compact_index_files,
    )

    emb, fresh, aug = overgrown
    with pytest.raises(ValueError, match="no persisted path"):
        compact_index_files(aug)

    p = str(tmp_path / "cmarked")
    loaded = _persist_overgrown(spark, overgrown, p)
    with pytest.raises(ValueError, match="must be >= 1"):
        compact_index_files(loaded, max_files_per_partition=0)
    open(f"{p}/_SURGERY_IN_PROGRESS", "w").close()
    with pytest.raises(ValueError, match="interrupted"):
        compact_index_files(loaded)
