"""Focused pins for the r16 optimization-round internals changes: each
test targets a rewrite that must be behavior-identical (guide §1 —
optimizations may not change what an operator computes)."""

import pyspark.sql.functions as F


def test_attach_cell_matches_window_argmin(spark):
    """The per-row argmin fold (operators/ivf.attach_cell) must select
    exactly the window's (dist ASC, c_id ASC) centroid — including the
    ties-to-smaller-c_id rule — and pass other columns through."""
    from rust_vector_search_spark.operators.ivf import (
        _nearest_cells,
        attach_cell,
    )

    # planted ties: vectors equidistant from two centroids must take
    # the smaller centroid id
    rows = [
        (0, [0.0, 0.0]),   # centroid (stride 2)
        (1, [1.0, 1.0]),
        (2, [2.0, 2.0]),   # centroid
        (3, [1.0, 1.0]),   # exactly between centroids 0 and 2 -> tie -> 0
        (4, [3.0, 3.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = emb.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("cv")
    )
    fold = {
        (r.vec_id, r.cell)
        for r in attach_cell(emb, cents, "embedding").select(
            "vec_id", "cell"
        ).collect()
    }
    win = {
        (r.vec_id, r.c_id)
        for r in _nearest_cells(emb, cents, 1, "vec_id", "embedding").collect()
    }
    assert fold == win
    assert (3, 0) in fold  # the planted tie resolves to the smaller c_id


def test_attach_cell_empty_centroids_is_empty(spark):
    """Empty centroid set must yield an empty result (the old join
    form's behavior), not null cells."""
    from rust_vector_search_spark.operators.ivf import attach_cell

    emb = spark.createDataFrame(
        [(0, [0.0]), (1, [1.0])], "vec_id long, embedding array<double>"
    )
    cents = emb.filter(F.lit(False)).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("cv")
    )
    assert attach_cell(emb, cents, "embedding").count() == 0


def test_pq_encode_fold_matches_window_reference(spark):
    """pq_encode's per-row fold must reproduce the explode + broadcast
    join + row_number window reference implementation code-for-code,
    including subspace order and the ties-to-smaller-c_id rule."""
    from pyspark.sql.window import Window

    from rust_vector_search_spark.functions.vector import sq_euc_dist
    from rust_vector_search_spark.operators.pq import pq_codebook, pq_encode

    import random

    rng = random.Random(3)
    m, sub_dim = 4, 2
    rows = [
        (i, [round(rng.uniform(-1, 1), 3) for _ in range(m * sub_dim)])
        for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = pq_codebook(emb, m, sub_dim, cb_stride=8)

    # reference: the pre-r16 window implementation
    j = F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("j")
    subv = emb.select(F.col("vec_id"), F.col("embedding").alias("_v")).select(
        "vec_id", j, "_v"
    ).select(
        "vec_id",
        "j",
        F.slice(F.col("_v"), F.col("j") * sub_dim + 1, F.lit(sub_dim)).alias("sv"),
    )
    scored = subv.join(F.broadcast(cb), "j").select(
        "vec_id", "j", "pos", "c_id", sq_euc_dist("sv", "cv").alias("sd")
    )
    w = Window.partitionBy("vec_id", "j").orderBy(
        F.col("sd").asc(), F.col("c_id").asc()
    )
    ref = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "pos"))),
                lambda s: s["pos"],
            ).alias("code")
        )
    )
    got = {r.vec_id: list(r.code) for r in pq_encode(emb, cb, m, sub_dim).collect()}
    want = {r.vec_id: list(r.code) for r in ref.collect()}
    assert got == want


def test_release_driver_blocks_unpersist_all_drops_blocks(spark):
    """bench.py's inter-row hygiene: unpersist_all must leave zero
    registered RDD blocks (VERDICT r15 #6 — blocks from earlier queries
    otherwise squat in the unified pool and later rows measure memory
    pressure, not their plan)."""
    from rust_vector_search_spark.plans.registry import release_driver_blocks

    df = spark.range(1000).localCheckpoint(eager=True)
    assert df.count() == 1000
    assert spark.sparkContext._jsc.getPersistentRDDs().size() > 0
    release_driver_blocks(spark, unpersist_all=True)
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0


def test_star_components_converged_input_max_iters_one(spark):
    """ADVICE r15: consecutive-checksum convergence needs one round
    beyond the fixpoint to confirm it; that confirmation round is
    granted on top of max_iters, so an already-converged input with
    max_iters=1 returns instead of raising."""
    from rust_vector_search_spark.operators.dedup import (
        connected_components_star,
    )

    pairs = spark.createDataFrame(
        [(i, 0) for i in range(1, 4)], "doc_id_a long, doc_id_b long"
    )
    got = {
        (r.node, r.component_id)
        for r in connected_components_star(pairs, max_iters=1).collect()
    }
    assert got == {(0, 0), (1, 0), (2, 0), (3, 0)}
