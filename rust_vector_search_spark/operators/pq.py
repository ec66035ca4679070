"""Product quantization (PQ) — the memory-scale path for similarity
search, composed with IVF cells into the standard billion-scale ANN
index shape (IVF-PQ, the Faiss ``IndexIVFPQ`` / Jégou et al. 2011
"Product Quantization for Nearest Neighbor Search" design).

The vector is split into ``m`` subvectors; each subvector is encoded as
the id of its nearest centroid in a per-subspace codebook, so a
``d``-dim float32 vector becomes ``m`` small ints (64-d float32 → 8
codes ≈ 32× smaller). Queries never decode: a per-query lookup table
(LUT) of subspace-distances to every codebook centroid is precomputed
once (``m × ks`` doubles — tiny), and the approximate distance of a
database vector is the sum of ``m`` LUT lookups indexed by its codes
(asymmetric distance computation, ADC). An exact re-rank over the
full-precision vectors of the top ``prefilter_k`` candidates recovers
the quantization error, exactly as in ``operators/quant.py``.

Everything is DETERMINISTIC so the DuckDB oracle replays it value-for-
value (same design as operators/ivf.py): codebooks are the subvectors
of every ``cb_stride``-th vector by id (no k-means RNG), encode ties
break to the smaller centroid id, and every floating sum is a fixed-
order sequential fold (subspace order for ADC, element order inside a
subspace), bit-identical between Catalyst HOFs and DuckDB
``list_reduce``.

Scale shape (the 100 TB points):
- codes are the ONLY per-vector payload the candidate scan touches —
  ``m`` ints + a cell id instead of ``d`` floats (the full vectors are
  joined for the ≤ ``prefilter_k`` re-rank rows only);
- the LUT is per-query work proportional to ``m·ks·(d/m) = d·ks``,
  independent of corpus size, and ships broadcast;
- with IVF composition the scan touches only the query's ``nprobe``
  cells via a cell EQUI-join (never a crossJoin over the code table);
- codes+cells are persistable bucketed by cell, so repeated query
  batches skip both assignment jobs entirely.

No reference twin: the reference stores full f32 vectors
(``/root/reference/src/vector.rs``); this extends the quantization
family (operators/quant.py) with the sub-byte-per-dimension regime.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window

from ..functions.vector import sq_euc_dist

__all__ = ["pq_codebook", "pq_encode", "pq_lut", "pq_topk", "ivf_pq_topk"]


def _subspaces(m: int, sub_dim: int):
    """(j, slice-start) pairs for the m subspaces of a d = m·sub_dim vector."""
    return [(j, j * sub_dim + 1) for j in range(m)]


def pq_codebook(
    emb: DataFrame,
    m: int = 8,
    sub_dim: int = 8,
    cb_stride: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-subspace codebooks: (j, pos, cv).

    Centroids are the subvectors of every ``cb_stride``-th vector by id —
    the same deterministic farthest-thing-from-random as the IVF coarse
    quantizer (operators/ivf.py), reproducible in any engine. ``pos`` is
    the 1-based rank of the centroid id inside its subspace (the code
    value vectors are encoded to)."""
    cents = emb.filter(F.col(id_col) % cb_stride == 0).select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("_v")
    )
    j = F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("j")
    long = cents.select("c_id", "_v", j).select(
        "j",
        "c_id",
        F.slice(F.col("_v"), F.col("j") * sub_dim + 1, F.lit(sub_dim)).alias("cv"),
    )
    w = Window.partitionBy("j").orderBy(F.col("c_id").asc())
    return long.withColumn("pos", F.row_number().over(w)).select(
        "j", "pos", "c_id", "cv"
    )


def pq_encode(
    emb: DataFrame,
    codebook: DataFrame,
    m: int = 8,
    sub_dim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """(id, code ARRAY<INT>) — code[j] is the 1-based ``pos`` of the
    nearest centroid of subspace j (ties → smaller centroid id).

    The argmin is a PER-ROW FOLD over the broadcast codebook (r16,
    guide §2.4/§1.2) — zero exchange, zero sort. The previous form
    exploded N·m subvectors, broadcast-joined the codebook into N·m·ks
    scored rows and ran a row_number window over (id, j) (a full
    exchange + sort of the cross product) plus a grouped collect back
    to the code array — three exchanges for a computation that is a
    pure function of each row. Here every row maps subspace j to the
    argmin of ``sq_euc_dist`` over the j-th c_id-SORTED centroid list
    with a left fold keeping the first strict improvement, so ties
    resolve to the smaller c_id — selection identical to the window's
    (sd ASC, c_id ASC) order, on the same float bits, with the same
    broadcast footprint the join already paid."""
    per_j = codebook.groupBy("j").agg(
        F.array_sort(F.collect_list(F.struct("c_id", "pos", "cv"))).alias("cl")
    )
    cbs = per_j.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "cl"))), lambda s: s["cl"]
        ).alias("_cbs")
    )

    def _best_pos(jj):
        sv = F.slice(F.col("_v"), jj * sub_dim + 1, F.lit(sub_dim))
        cl = F.get(F.col("_cbs"), jj)
        scored = F.transform(
            cl,
            lambda e: F.struct(
                sq_euc_dist(sv, e["cv"]).alias("d"), e["pos"].alias("pos")
            ),
        )
        init = F.struct(
            F.lit(float("inf")).alias("d"), F.get(cl, 0)["pos"].alias("pos")
        )
        return F.aggregate(
            scored, init, lambda acc, x: F.when(x["d"] < acc["d"], x).otherwise(acc)
        )["pos"]

    keep = [F.col(c) for c in keep_cols]
    return (
        emb.select(F.col(id_col), F.col(vec_col).alias("_v"), *keep)
        .crossJoin(F.broadcast(cbs))
        # empty codebook ⇒ _cbs = [] (never partially filled: every
        # centroid contributes to every subspace) — emit nothing, the
        # join form's empty output
        .filter(F.size(F.col("_cbs")) == m)
        .select(
            id_col,
            F.transform(F.sequence(F.lit(0), F.lit(m - 1)), _best_pos).alias(
                "code"
            ),
            *keep,
        )
    )


def pq_lut(
    queries: DataFrame,
    codebook: DataFrame,
    m: int = 8,
    sub_dim: int = 8,
    qid: str = "query_id",
    qvec: str = "query_vec",
) -> DataFrame:
    """(query_id, lut ARRAY<ARRAY<DOUBLE>>): lut[j+1][pos] = squared
    euclidean distance between the query's j-th subvector and centroid
    ``pos`` of subspace j. ``m·ks`` doubles per query — broadcast-sized
    regardless of corpus size."""
    long = queries.crossJoin(F.broadcast(codebook)).select(
        qid,
        "j",
        "pos",
        sq_euc_dist(
            F.slice(F.col(qvec), F.col("j") * sub_dim + 1, F.lit(sub_dim)), F.col("cv")
        ).alias("sd"),
    )
    per_j = long.groupBy(qid, "j").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "sd"))), lambda s: s["sd"]
        ).alias("jl")
    )
    return per_j.groupBy(qid).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "jl"))), lambda s: s["jl"]
        ).alias("lut")
    )


def _adc(lut_col: str = "lut", code_col: str = "code"):
    """ADC approximate distance: Σ_j lut[j][code[j]] as a fixed-order
    left fold from 0.0 (subspace order — the DuckDB twin folds an
    ORDER-BY-j list the same way)."""
    return F.aggregate(
        F.zip_with(
            F.col(lut_col), F.col(code_col), lambda l, c: F.element_at(l, c)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _exact_rerank(
    cand: DataFrame,
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    vecs = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"))
    exact = (
        cand.join(vecs, "vec_id")
        .join(F.broadcast(queries.select("query_id", "query_vec")), "query_id")
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


def ivf_pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    stride: int = 20,
    nprobe: int = 3,
    m: int = 8,
    sub_dim: int = 8,
    cb_stride: int = 32,
    prefilter_k: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """IVF-PQ top-k — the billion-scale composition: the coarse IVF
    quantizer restricts the scan to the query's ``nprobe`` cells (cell
    EQUI-join against the broadcast probe list — never a crossJoin over
    codes), ADC scores the surviving codes from the broadcast per-query
    LUT (``m`` array lookups + a fold per candidate; the only per-vector
    bytes touched are ``m`` ints), and the top ``prefilter_k`` re-rank
    exactly from the full-precision vectors.

    Returns (query_id, vec_id, dist, rnk) — dist is the EXACT squared
    euclidean distance of the re-ranked survivors."""
    from .ivf import _centroids, _nearest_cells, attach_cell

    cents = _centroids(emb, stride, id_col, vec_col)
    qcells = _nearest_cells(
        queries, cents, nprobe, "query_id", "query_vec"
    ).select("query_id", F.col("c_id").alias("cell"))

    cb = pq_codebook(emb, m, sub_dim, cb_stride, id_col, vec_col)
    # r16 (guide §2.4): cell assignment and PQ codes are both per-row
    # folds now, so they ride ONE pass over the corpus (keep_cols
    # passthrough) — the previous shape built a separate assign table
    # and joined it back on vec_id (an exchange of the code payload).
    codes = pq_encode(
        attach_cell(emb.select(F.col(id_col), F.col(vec_col)), cents, vec_col),
        cb,
        m,
        sub_dim,
        id_col,
        vec_col,
        keep_cols=("cell",),
    ).withColumnRenamed(id_col, "vec_id")
    lut = pq_lut(queries, cb, m, sub_dim)

    # each vector lives in exactly ONE cell (argmin assignment), so the
    # probe join yields unique (query, vec) pairs — no distinct needed
    cand_codes = codes.join(F.broadcast(qcells), "cell").join(
        F.broadcast(lut), "query_id"
    )
    if exclude_self:
        cand_codes = cand_codes.filter(F.col("vec_id") != F.col("query_id"))
    scored = cand_codes.select("query_id", "vec_id", _adc().alias("approx_dist"))
    w_pre = Window.partitionBy("query_id").orderBy(
        F.col("approx_dist").asc(), F.col("vec_id").asc()
    )
    cand = (
        scored.withColumn("_prn", F.row_number().over(w_pre))
        .filter(F.col("_prn") <= prefilter_k)
        .select("query_id", "vec_id")
    )
    return _exact_rerank(cand, emb, queries, k, id_col, vec_col)


def pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    sub_dim: int = 8,
    cb_stride: int = 32,
    prefilter_k: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Flat-PQ top-k: ADC over ALL codes (linear scan) + exact re-rank.

    The exact-baseline shape of the family — its value is the ``m``
    ints/vector scan footprint, kept oracle-simple; the sub-linear
    production plan is ``ivf_pq_topk`` above (same codes, scan
    restricted to IVF cells)."""
    cb = pq_codebook(emb, m, sub_dim, cb_stride, id_col, vec_col)
    codes = pq_encode(emb, cb, m, sub_dim, id_col, vec_col).withColumnRenamed(
        id_col, "vec_id"
    )
    lut = pq_lut(queries, cb, m, sub_dim)
    cross = codes.crossJoin(F.broadcast(lut))
    if exclude_self:
        cross = cross.filter(F.col("vec_id") != F.col("query_id"))
    scored = cross.select("query_id", "vec_id", _adc().alias("approx_dist"))
    w_pre = Window.partitionBy("query_id").orderBy(
        F.col("approx_dist").asc(), F.col("vec_id").asc()
    )
    cand = (
        scored.withColumn("_prn", F.row_number().over(w_pre))
        .filter(F.col("_prn") <= prefilter_k)
        .select("query_id", "vec_id")
    )
    return _exact_rerank(cand, emb, queries, k, id_col, vec_col)
