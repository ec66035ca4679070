"""Int8 embedding quantization — the storage/shuffle-footprint scale
path for similarity search over ``array<float>`` columns.

At 100 TB the dominant ANN costs are storage and shuffle bytes, not
FLOPs: per-vector symmetric int8 quantization cuts both 4× (300-d
float32 → 300 B + one scale), at a recall cost that an exact re-rank
over a small quantized-prefilter candidate set recovers. This mirrors
the standard SQ8 scheme (Faiss ``ScalarQuantizer``/Annoy-style), kept
deliberately rational-arithmetic-only (round, multiply, divide — no
transcendentals) so every step is bit-reproducible in any engine and
the whole pipeline stays oracle-checkable.

No reference twin: the reference stores full f32 vectors
(``/root/reference/src/vector.rs``); this is a scale-path extension.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window

__all__ = ["quantize_int8", "int8_prefilter_topk", "ivf_int8_topk"]


def _q_dot(a: str, b: str) -> Column:
    """Integer dot product of two equally-sized int arrays (HOF)."""
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def quantize_int8(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """Per-vector symmetric int8 quantization:
    ``scale = max|x| / 127``, ``q_i = round(x_i / scale)`` ∈ [−127, 127].

    Returns (id, scale DOUBLE, qvec ARRAY<INT>, qnorm2 LONG) where
    qnorm2 = Σ q_i² (precomputed so distance scoring needs only the
    cross-term). Zero vectors get scale 0 and all-zero codes.
    ``keep_cols`` pass through unchanged (r16: lets a caller carry the
    map-side IVF cell column through the same row pass instead of
    joining it back on vec_id)."""
    absmax = F.aggregate(
        F.col(vec_col),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    scale = (absmax / F.lit(127.0)).alias("scale")
    keep = [F.col(c) for c in keep_cols]
    out = emb.select(F.col(id_col), F.col(vec_col), scale, *keep)
    qvec = F.when(
        F.col("scale") == 0.0,
        F.transform(F.col(vec_col), lambda x: F.lit(0)),
    ).otherwise(
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") / F.col("scale"), 0).cast("int"),
        )
    )
    out = out.select(F.col(id_col), F.col("scale"), qvec.alias("qvec"), *keep)
    return out.withColumn("qnorm2", _q_dot("qvec", "qvec"))


def ivf_int8_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    stride: int = 20,
    nprobe: int = 3,
    prefilter_k: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """IVF-restricted int8 prefilter + exact re-rank — the SUB-LINEAR
    composition of the two scale paths (VERDICT r5 item 3): int8 codes
    give 4× fewer bytes per scanned vector, IVF cells make the scan
    touch only ~nprobe/|C| of the corpus instead of all of it (the
    linear scan in ``int8_prefilter_topk`` at quant.py's crossJoin is
    the exact-baseline shape; THIS is the plan a 100 TB deployment
    runs). Candidate selection is a cell EQUI-join — codes partitioned
    (bucketable) by cell, the tiny (query, cell) probe list broadcast —
    never a crossJoin over the code table.

    Every step is rational arithmetic on deterministic inputs
    (deterministic centroids per operators/ivf.py, SQ8 quantization per
    ``quantize_int8``), so the DuckDB oracle replays the whole plan
    bit-exactly. Returns (query_id, vec_id, dist, rnk)."""
    from ..functions.vector import sq_euc_dist
    from .ivf import _centroids, _nearest_cells, attach_cell

    cents = _centroids(emb, stride, id_col, vec_col)
    qcells = _nearest_cells(
        queries, cents, nprobe, "query_id", "query_vec"
    ).select("query_id", F.col("c_id").alias("cell"))

    # r16 (guide §2.4): the cell rides the same row pass as the
    # quantization (per-row argmin fold + keep_cols passthrough) — the
    # previous assign-table build was a window over N·|C| scored rows
    # plus a vec_id join back to the quantized payload (two exchanges
    # for a per-row computation).
    codes = quantize_int8(
        attach_cell(emb.select(F.col(id_col), F.col(vec_col)), cents, vec_col),
        id_col,
        vec_col,
        keep_cols=("cell",),
    ).select(
        F.col(id_col).alias("vec_id"),
        F.col("scale").alias("c_scale"),
        F.col("qvec").alias("c_qvec"),
        F.col("qnorm2").alias("c_qnorm2"),
        F.col("cell"),
    )
    qc = quantize_int8(
        queries.select(
            F.col("query_id").alias("_qid"), F.col("query_vec").alias("_qv")
        ),
        "_qid",
        "_qv",
    ).select(
        F.col("_qid").alias("query_id"),
        F.col("scale").alias("q_scale"),
        F.col("qvec").alias("q_qvec"),
        F.col("qnorm2").alias("q_qnorm2"),
    )
    # the probe list is (n_queries × nprobe) rows — broadcast it against
    # the cell-keyed code table: the scan is restricted to probed cells
    # BEFORE any distance math runs
    cand_codes = codes.join(F.broadcast(qcells), "cell").join(
        F.broadcast(qc), "query_id"
    )
    if exclude_self:
        cand_codes = cand_codes.filter(F.col("vec_id") != F.col("query_id"))
    approx = (
        F.col("q_scale") * F.col("q_scale") * F.col("q_qnorm2")
        + F.col("c_scale") * F.col("c_scale") * F.col("c_qnorm2")
        - F.lit(2.0) * F.col("q_scale") * F.col("c_scale") * _q_dot("q_qvec", "c_qvec")
    )
    # no dedup needed: each vector belongs to exactly ONE cell (argmin
    # assignment), so a (query, vec) pair can only arise once even with
    # nprobe > 1 — the prefilter window sees unique pairs with no
    # distinct shuffle
    scored = cand_codes.select(
        "query_id", "vec_id", approx.alias("approx_dist")
    )
    w_pre = Window.partitionBy("query_id").orderBy(
        F.col("approx_dist").asc(), F.col("vec_id").asc()
    )
    cand = (
        scored.withColumn("_prn", F.row_number().over(w_pre))
        .filter(F.col("_prn") <= prefilter_k)
        .select("query_id", "vec_id")
    )
    vecs = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"))
    exact = (
        cand.join(vecs, "vec_id")
        .join(
            F.broadcast(queries.select("query_id", "query_vec")), "query_id"
        )
        .select(
            "query_id", "vec_id", sq_euc_dist("query_vec", "_v").alias("dist")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("vec_id").asc()
    )
    return (
        exact.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )


def int8_prefilter_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    prefilter_k: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Quantized prefilter + exact re-rank top-k (squared euclidean).

    Approximate distance from int8 codes only:
    ``d̂(a,b) = s_a²·Σq_a² + s_b²·Σq_b² − 2·s_a·s_b·Σ(q_a·q_b)`` —
    ranks the corpus per query, keeps ``prefilter_k`` candidates, then
    re-scores EXACTLY from the full-precision vectors and returns the
    top ``k``. Only the prefilter stage ever ships int8 codes (4× fewer
    bytes through the shuffle than f32); the exact stage joins the fat
    vectors for candidate rows only. Deterministic ties: (dist, vec_id).

    NOTE: the prefilter here is a LINEAR scan of all codes per query
    (the crossJoin below) — this is the exact-baseline form whose value
    is the 4× byte reduction, kept as the oracle-simple ground shape.
    The sub-linear production plan is ``ivf_int8_topk`` above, which
    restricts the same scoring to the query's nprobe IVF cells via a
    cell equi-join."""
    from ..functions.vector import sq_euc_dist

    qc = quantize_int8(
        queries.select(
            F.col("query_id").alias("_qid"), F.col("query_vec").alias("_qv")
        ),
        "_qid",
        "_qv",
    ).select(
        F.col("_qid").alias("query_id"),
        F.col("scale").alias("q_scale"),
        F.col("qvec").alias("q_qvec"),
        F.col("qnorm2").alias("q_qnorm2"),
    )
    cc = quantize_int8(emb, id_col, vec_col).select(
        F.col(id_col).alias("vec_id"),
        F.col("scale").alias("c_scale"),
        F.col("qvec").alias("c_qvec"),
        F.col("qnorm2").alias("c_qnorm2"),
    )
    cross = F.broadcast(qc).crossJoin(cc).filter(
        F.col("vec_id") != F.col("query_id")
    )
    approx = (
        F.col("q_scale") * F.col("q_scale") * F.col("q_qnorm2")
        + F.col("c_scale") * F.col("c_scale") * F.col("c_qnorm2")
        - F.lit(2.0) * F.col("q_scale") * F.col("c_scale") * _q_dot("q_qvec", "c_qvec")
    )
    scored = cross.select(
        "query_id", "vec_id", approx.alias("approx_dist")
    )
    w_pre = Window.partitionBy("query_id").orderBy(
        F.col("approx_dist").asc(), F.col("vec_id").asc()
    )
    cand = (
        scored.withColumn("_prn", F.row_number().over(w_pre))
        .filter(F.col("_prn") <= prefilter_k)
        .select("query_id", "vec_id")
    )
    vecs = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"))
    exact = (
        cand.join(vecs, "vec_id")
        .join(
            F.broadcast(queries.select("query_id", "query_vec")), "query_id"
        )
        .select(
            "query_id", "vec_id", sq_euc_dist("query_vec", "_v").alias("dist")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("vec_id").asc()
    )
    return (
        exact.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )
