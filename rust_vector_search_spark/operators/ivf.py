"""IVF (inverted-file) approximate nearest neighbor — the bucketed scale
path for similarity search. Not in the reference (whose only access path
is the RP forest); included per the similarity-search inventory, and
designed to be fully DETERMINISTIC so the DuckDB oracle can verify it
value-for-value (unlike the seeded-random RP forest, which is checked by
recall instead).

Coarse quantizer: every ``stride``-th vector by id is a centroid (a
deterministic farthest-thing-from-random that both engines reproduce
trivially); each vector is assigned to its nearest centroid (ties →
smaller centroid id). A query probes its ``nprobe`` nearest cells and
re-ranks exactly within them.

Scale shape: |C| ≈ √N centroids broadcast to assign cells map-side; the
probe turns the quadratic scan into a join on cell id over ~nprobe/|C|
of the corpus. Cell assignment is persistable (bucketed by cell) so
repeated queries skip the assignment job entirely.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window

from ..functions.vector import sq_euc_dist

__all__ = ["ivf_assign", "ivf_search"]


def _centroids(emb: DataFrame, stride: int, id_col: str, vec_col: str) -> DataFrame:
    return emb.filter(F.col(id_col) % stride == 0).select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("cv")
    )


def _nearest_cells(
    points: DataFrame, cents: DataFrame, n: int, pid: str, pvec: str
) -> DataFrame:
    """n nearest centroids per point; deterministic (dist, c_id) order."""
    scored = points.crossJoin(F.broadcast(cents)).select(
        F.col(pid),
        F.col("c_id"),
        sq_euc_dist(pvec, "cv").alias("cdist"),
    )
    if n == 1:
        # argmin as min(struct) (r16, guide §2.3): the row_number window
        # shuffled + sorted ALL N·|C| scored rows; the struct-min's
        # map-side partial aggregation collapses them to N rows before
        # the exchange and needs no sort. Lexicographic (cdist, c_id)
        # struct order is exactly the window's (cdist ASC, c_id ASC),
        # so the assigned cell — ties to the smaller c_id — is
        # bit-identical.
        return (
            scored.groupBy(pid)
            .agg(F.min(F.struct("cdist", "c_id")).alias("_m"))
            .select(pid, F.col("_m.c_id").alias("c_id"))
        )
    w = Window.partitionBy(pid).orderBy(F.col("cdist").asc(), F.col("c_id").asc())
    return (
        scored.withColumn("crn", F.row_number().over(w))
        .filter(F.col("crn") <= n)
        .select(pid, "c_id")
    )


def ivf_assign(
    emb: DataFrame,
    stride: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cell assignment: (vec_id, cell). One broadcast join + per-row argmin."""
    cents = _centroids(emb, stride, id_col, vec_col)
    points = emb.select(F.col(id_col), F.col(vec_col))
    return _nearest_cells(points, cents, 1, id_col, vec_col).withColumnRenamed(
        "c_id", "cell"
    )


def ivf_search(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    stride: int = 20,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """IVF top-k: probe the ``nprobe`` nearest cells, re-rank exactly.
    Returns (query_id, vec_id, dist, rnk)."""
    cents = _centroids(emb, stride, id_col, vec_col)
    assign = ivf_assign(emb, stride, id_col, vec_col)
    qcells = _nearest_cells(queries, cents, nprobe, "query_id", "query_vec").select(
        "query_id", F.col("c_id").alias("cell")
    )
    cand = qcells.join(assign, "cell").select("query_id", "vec_id").distinct()
    vecs = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    scored = (
        cand.join(vecs, "vec_id")
        .join(F.broadcast(queries), "query_id")
        .select("query_id", "vec_id", sq_euc_dist("query_vec", "v").alias("dist"))
    )
    if exclude_self:
        scored = scored.filter(F.col("vec_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )
