"""Product-quantization family (operators/pq.py): encode invariants,
end-to-end quality vs exact kNN, and the scale-shape plan assertions.
Value-level parity with DuckDB is covered by test_oracle_parity
(ann_ivfpq_topk / ann_pq_topk both carry full oracles)."""

from __future__ import annotations

import os
import re
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from conftest import SF_ORACLE, SF_SMOKE  # noqa: E402

from rust_vector_search_spark.operators.knn import knn_exact  # noqa: E402
from rust_vector_search_spark.operators.pq import (  # noqa: E402
    ivf_pq_topk,
    pq_codebook,
    pq_encode,
)
from rust_vector_search_spark.sources import load_table  # noqa: E402

M, SUB_DIM, CB_STRIDE = 8, 8, 32


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _queries(emb, n=10):
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_pq_codes_cover_corpus_and_stay_in_range(spark):
    emb = _emb(spark, SF_SMOKE)
    cb = pq_codebook(emb, M, SUB_DIM, CB_STRIDE)
    ks = cb.filter(F.col("j") == 0).count()
    codes = pq_encode(emb, cb, M, SUB_DIM)
    n = emb.count()
    assert codes.count() == n  # every vector encoded exactly once
    bad = codes.filter(
        (F.size("code") != M)
        | F.exists("code", lambda c: (c < 1) | (c > ks))
    ).count()
    assert bad == 0


def test_pq_encode_is_deterministic(spark):
    emb = _emb(spark, SF_SMOKE)
    cb = pq_codebook(emb, M, SUB_DIM, CB_STRIDE)
    a = {r["vec_id"]: r["code"] for r in pq_encode(emb, cb, M, SUB_DIM).collect()}
    b = {r["vec_id"]: r["code"] for r in pq_encode(emb, cb, M, SUB_DIM).collect()}
    assert a == b


def test_ivfpq_recall_vs_exact(spark):
    """Quality decomposition: recall vs exact kNN is bounded by the IVF
    cell restriction (nprobe/|C| of the corpus — plain IVF at the same
    params measures ~0.40 at sf0.01), so the meaningful gates are
    (a) the PQ prefilter + exact re-rank loses almost nothing WITHIN
    the probed cells (IVF-PQ hits ≥ 85% of plain-IVF hits), and
    (b) flat-PQ (no cell restriction — prefilter 50/500 + re-rank)
    clears an absolute floor on the clustered fixture corpus."""
    from rust_vector_search_spark.operators.ivf import ivf_search
    from rust_vector_search_spark.operators.pq import pq_topk

    emb = _emb(spark, SF_ORACLE)
    q = _queries(emb)
    exact = knn_exact(emb, q, k=10).select("query_id", "vec_id")
    n_exact = exact.count()

    def hits(df):
        return exact.join(
            df.select("query_id", "vec_id"), ["query_id", "vec_id"], "left_semi"
        ).count()

    ivf_hits = hits(ivf_search(emb, q, k=10))
    ivfpq_hits = hits(
        ivf_pq_topk(emb, q, k=10, m=M, sub_dim=SUB_DIM, cb_stride=CB_STRIDE)
    )
    assert ivfpq_hits >= 0.85 * ivf_hits, (
        f"PQ prefilter lost too much within cells: {ivfpq_hits}/{ivf_hits}"
    )
    flat = hits(pq_topk(emb, q, k=10, m=M, sub_dim=SUB_DIM, cb_stride=CB_STRIDE))
    assert flat / n_exact >= 0.5, f"flat-PQ recall@10 {flat / n_exact:.3f} < 0.5"


def test_ivfpq_plan_is_cell_equijoin(spark):
    """The candidate scan reaches the PQ code table through a cell
    EQUI-join. Only the tiny broadcast cross joins are nested-loop:
    corpus x centroids, queries x centroids (IVF assignment) and
    queries x codebook (LUT) — never a nested loop over the code
    table."""
    from test_plans import plan_of

    from rust_vector_search_spark.plans import QUERIES

    plan = plan_of(QUERIES["ann_ivfpq_topk"](spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    nlj = re.findall(r"^\(\d+\) BroadcastNestedLoopJoin", plan, re.M)
    # r16: pq_encode and ivf_assign now attach their centroid/codebook
    # tables as ONE-ROW broadcast arrays (per-row argmin fold, no
    # exchange) — each reads as a BroadcastNestedLoopJoin of a 1-row
    # side, raising the tiny-crossjoin count from 3 to at most 5. The
    # gate this test exists for is unchanged and asserted below: the
    # CODE table is reached through a hash equi-join on cell, never a
    # nested loop.
    assert len(nlj) <= 5, plan[:3000]
    assert re.search(r"^\(\d+\) \w*HashJoin", plan, re.M), plan[:3000]
    assert "cell" in plan
