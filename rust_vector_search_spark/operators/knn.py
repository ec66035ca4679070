"""Exact k-nearest-neighbor operators — the semantic ground truth the
reference's approximate path is measured against.

Reference mapping (SURVEY §2.1):
  - O11 exact distance re-rank: ``/root/reference/src/lib.rs:137-140``
    (kernel ``src/vector.rs:33-36``) → `sq_euc_dist` Catalyst expression.
  - O12 sort + top-k + id remap: ``/root/reference/src/lib.rs:142-148``
    → ``row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id)``.
  - O13 point query with label lookup: ``/root/reference/src/main.rs:81-93``
    → dimension joins around the kNN core.
  - O14 batch all-pairs top-k: ``/root/reference/src/main.rs:100-123``
    → self-join + per-query window.

Scale design: the QUERY side is broadcast (queries ≪ corpus — the
reference shares its index read-only across rayon threads the same way,
``src/main.rs:111-113``); the corpus side stays distributed, so the
distance computation is embarrassingly parallel map-side work with one
shuffle on ``query_id`` for the top-k window. Brute force is O(|Q|·|C|)
by definition — it is the BASELINE; the sub-linear path is the RP-forest
index (operators/index.py, operators/search.py) and IVF (operators/ivf.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window

from ..functions.vector import cosine_sim, sq_euc_dist

__all__ = ["knn_exact", "knn_exact_cosine", "knn_exact_fast", "all_pairs_topk", "knn_with_labels"]


def _topk(scored: DataFrame, k: int, order: list[Column]) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )


def knn_exact(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Brute-force top-k by squared Euclidean distance.

    ``queries`` must have columns (query_id, query_vec); result is
    ``(query_id, vec_id, dist, rnk)`` with deterministic ``(dist, vec_id)``
    tie-break (the reference's ``sort_by(partial_cmp)`` at
    ``src/lib.rs:142`` is tie-unstable; we pin ties for oracle parity).
    """
    pairs = corpus.crossJoin(F.broadcast(queries))
    if exclude_self:
        pairs = pairs.filter(F.col(id_col) != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        sq_euc_dist("query_vec", vec_col).alias("dist"),
    )
    return _topk(scored, k, [F.col("dist").asc(), F.col("vec_id").asc()])


def knn_exact_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k by cosine similarity (descending) — the
    similarity-search baseline for the embedding near-dup surface."""
    pairs = corpus.crossJoin(F.broadcast(queries)).filter(
        F.col(id_col) != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        cosine_sim("query_vec", vec_col).alias("cos_sim"),
    )
    return _topk(scored, k, [F.col("cos_sim").desc(), F.col("vec_id").asc()])


def all_pairs_topk(
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int | None = None,
) -> DataFrame:
    """O14 all-pairs self-kNN (``src/main.rs:100-123``), exact form.

    ``sample_mod`` mirrors the reference's subset sampling
    (``src/main.rs:101-110``) with a DETERMINISTIC modular filter instead
    of ``choose_multiple`` so the oracle can reproduce it. Quadratic by
    nature — at 100 TB this exists only as the recall ground truth on
    sampled subsets; production all-pairs goes through the index path.
    """
    queries = corpus.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    if sample_mod is not None:
        queries = queries.filter(F.col("query_id") % sample_mod == 0)
    return knn_exact(corpus, queries, k=k, id_col=id_col, vec_col=vec_col)


def knn_with_labels(
    corpus: DataFrame,
    labels: DataFrame,
    query_label_values: list[str],
    k: int = 10,
    label_key: str = "doc_id",
    label_col: str = "text",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """O13 "visualize" (``src/main.rs:81-93``): label → id via the
    dictionary table, kNN, then ids → labels for the results; distances
    reported as √d like the reference's display (``src/main.rs:90``).

    The reference's two HashMaps (``src/main.rs:14-15``) become equi-joins
    against a broadcast dimension table — the idiomatic Spark shape.
    """
    dim = labels.select(
        F.col(label_key).alias("query_id"), F.col(label_col).alias("query_label")
    )
    queries = (
        F.broadcast(dim)
        .filter(F.col("query_label").isin(query_label_values))
        .join(corpus, F.col("query_id") == F.col(id_col))
        .select("query_id", "query_label", F.col(vec_col).alias("query_vec"))
    )
    hits = knn_exact(corpus, queries.select("query_id", "query_vec"), k=k,
                     id_col=id_col, vec_col=vec_col)
    out = (
        hits.join(F.broadcast(labels.select(F.col(label_key).alias("vec_id"),
                                            F.col(label_col).alias("neighbor_label"))),
                  "vec_id")
        .withColumn("euclidean", F.sqrt(F.col("dist")))
    )
    return out.select("query_id", "vec_id", "neighbor_label", "dist", "euclidean", "rnk")


def knn_exact_fast(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Arrow/BLAS fast path for brute-force kNN: queries are collected to
    a small numpy matrix (they are broadcast-sized by contract — the
    reference shares them read-only across threads the same way,
    ``src/main.rs:111-113``); each Arrow batch of the corpus computes the
    full distance block with one matrix multiply (‖q‖² + ‖x‖² − 2·QXᵀ)
    and emits only its per-batch top-k per query, so the final global
    top-k window sees ≤ k·(num_batches) rows per query instead of |C|.

    ~10-50× faster than the per-element HOF expression at wide batches;
    NOT oracle-bit-exact (BLAS reassociates sums), so it registers as the
    rows-only twin of `knn_exact_euclidean` and tests assert id-set
    equality instead (tests/test_ann.py).

    The driver collect is GATED by the same byte estimate used for the
    forest's broadcast-queries decision (search.py): count × (dim × 8 +
    row overhead) must stay under ``SPARK_GRAFT_BC_QUERIES_MB`` (default
    256). A corpus-as-queries caller gets a typed error pointing at the
    distributed paths instead of a silent driver OOM."""
    import os

    import numpy as np
    import pandas as pd

    stats = queries.agg(
        F.count(F.lit(1)).alias("n"), F.max(F.size("query_vec")).alias("d")
    ).collect()[0]
    n_q, dim = int(stats.n), int(stats.d or 0)
    gate = int(os.environ.get("SPARK_GRAFT_BC_QUERIES_MB", "256")) * 1024 * 1024
    if n_q * (dim * 8 + 120) >= gate:
        raise ValueError(
            f"knn_exact_fast: query set (~{n_q} rows × {dim} dims) exceeds "
            f"the driver-collect gate (SPARK_GRAFT_BC_QUERIES_MB); this path "
            f"is for broadcast-sized query batches — use knn_exact (HOF) or "
            f"the forest/IVF search paths for corpus-sized query sets"
        )
    q_rows = queries.select("query_id", "query_vec").collect()
    Q = np.array([list(r.query_vec) for r in q_rows], dtype=np.float64)
    qids = np.array([r.query_id for r in q_rows], dtype=np.int64)
    qsq = (Q * Q).sum(axis=1)

    def _blocks(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            d = qsq[:, None] + (X * X).sum(axis=1)[None, :] - 2.0 * (Q @ X.T)
            kk = min(k + (1 if exclude_self else 0), d.shape[1])
            part = np.argpartition(d, kk - 1, axis=1)[:, :kk]
            rows = {
                "query_id": np.repeat(qids, kk),
                "vec_id": ids[part].ravel(),
                "dist": np.take_along_axis(d, part, axis=1).ravel(),
            }
            yield pd.DataFrame(rows)

    partial = corpus.select(id_col, vec_col).mapInPandas(
        _blocks, schema="query_id long, vec_id long, dist double"
    )
    if exclude_self:
        partial = partial.filter(F.col("vec_id") != F.col("query_id"))
    return _topk(partial, k, [F.col("dist").asc(), F.col("vec_id").asc()])


def mine_hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query,
    the top-k most-similar corpus vectors with a DIFFERENT label — the
    near-miss examples a retriever/embedding model learns the most from
    (in-batch random negatives are trivially easy; the hard ones sit
    just across the class boundary).

    ``queries`` carries (query_id, query_vec, query_label). This exact
    form is the broadcast-queries baseline (same shape as
    ``knn_exact_cosine`` — the oracle ground truth); a corpus-sized
    query set composes the label filter with the IVF cell or RP-forest
    candidate joins instead (operators/ivf.py, plans/annindex.py),
    which keeps candidate generation sub-linear and applies the
    label-mismatch predicate before the re-rank.
    """
    pairs = corpus.crossJoin(F.broadcast(queries)).filter(
        (F.col(id_col) != F.col("query_id"))
        & (F.col(label_col) != F.col("query_label"))
    )
    scored = pairs.select(
        "query_id",
        "query_label",
        F.col(id_col).alias("vec_id"),
        F.col(label_col).alias("neg_label"),
        cosine_sim("query_vec", vec_col).alias("cos_sim"),
    )
    return _topk(scored, k, [F.col("cos_sim").desc(), F.col("vec_id").asc()])
