"""Iterative graph algorithms beyond connected components.

``pagerank_integer`` runs PageRank (Page et al. 1999) with the rank
state held in INTEGER micro-units (1e6 = rank 1.0) and every update
step expressed as integer division — so the result is bit-identical
under any partial-aggregation order and replayable by a DuckDB oracle
that unrolls the iterations as chained CTEs. The float formulation's
per-node contribution sum is order-sensitive (doubles reassociate
across partials); the integer formulation trades ~1e-6 absolute
precision for exact engine-portable determinism — the same bar as the
rational SQ8 quantizer in operators/quant.py.

Scale shape (the 100 TB story): per iteration the plan is ONE join of
the slim (src, dst, degree) edge list against the (node, rank) state +
ONE aggregation on dst — both shuffles carry 16-byte rows, never
adjacency lists. At cluster scale you pre-partition edges by src once
(bucketing) and every iteration's join is co-located; rank state is
one bigint per node. Components (operators/dedup.py:384) cover
reachability; this covers the weighted-importance family (centrality,
influence, spam scoring over link graphs).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["pagerank_integer", "PR_UNIT"]

PR_UNIT = 1_000_000  # integer micro-units per 1.0 of rank


def pagerank_integer(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 5,
    damping_pct: int = 85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """PageRank over a SYMMETRIZED edge list (every node has in- and
    out-edges, so there are no dangling-mass corrections), fixed
    ``iters`` iterations, integer arithmetic throughout:

        contrib(e)   = rank(src) DIV degree(src)
        rank'(node)  = (1-d)·UNIT + (Σ contrib · d_pct) DIV 100

    Integer DIV truncates identically in Spark and DuckDB (operands are
    non-negative), and bigint sums are exact — the whole fixpoint is a
    pure function of the edge list. Returns (node, rank) for every
    node. The caller symmetrizes; duplicate edges must be removed
    (degree counts rows).

    Plan hygiene at depth (VERDICT r6 #7, same discipline as the
    routing-frontier fix): the static (src, dst, degree) frame is
    materialized ONCE with an eager localCheckpoint — lazily it would
    re-enter the plan every iteration, re-deriving the caller's edge
    pipeline ``iters`` times — and the rank state is checkpointed every
    ``checkpoint_every`` iterations so the logical plan stays a bounded
    suffix instead of growing linearly and re-running Catalyst over an
    ever-deeper DAG (the known CPU-minutes planning pathology). With
    that, per-iteration cost is flat in the iteration count."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    # static per-edge frame: (src, dst, degree) — built once, reused
    # every iteration (at scale: bucket by src so the per-iteration
    # rank join is co-located)
    ed = e.join(deg, "src").localCheckpoint(eager=True)
    base = (100 - damping_pct) * PR_UNIT // 100
    if iters <= 0:
        return ed.select(F.col("src").alias("node")).distinct().select(
            "node", F.lit(PR_UNIT).cast("long").alias("rank")
        )
    ranks = None
    for i in range(iters):
        if ranks is None:
            # iteration 1 folded analytically (r15, guide §2.4): rank0 is
            # the PR_UNIT constant for every node, so contrib needs no
            # rank join (and no initial distinct-node state) — identical
            # integers, two fewer exchanges. A/B-adjudicated r16 (5
            # alternating pairs, one session): fold wins every summary
            # statistic (median 4.50 vs 4.74 s); the r15 driver
            # regression was tail-noise.
            contrib = ed.select(
                F.col("dst"), F.expr(f"CAST({PR_UNIT} AS BIGINT) DIV d").alias("c")
            )
        else:
            contrib = ed.join(ranks, ed["src"] == ranks["node"]).select(
                F.col("dst"), F.expr("rank DIV d").alias("c")
            )
        ranks = contrib.groupBy(F.col("dst").alias("node")).agg(
            (
                F.lit(base).cast("long")
                + F.expr(f"CAST(sum(c) * {damping_pct} AS BIGINT) DIV 100")
            ).alias("rank")
        )
        if checkpoint_every > 0 and (i + 1) % checkpoint_every == 0 and (
            i + 1
        ) < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def pagerank_oracle_sql(
    edges_cte: str, iters: int = 5, damping_pct: int = 85
) -> str:
    """DuckDB twin of ``pagerank_integer``: the iterations unroll as
    chained CTEs (r0 … r{iters}) over the same integer update rule.
    ``edges_cte`` must define a relation ``edges(src, dst)`` —
    symmetrized, deduplicated."""
    base = (100 - damping_pct) * PR_UNIT // 100
    parts = [
        f"{edges_cte},",
        "deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),",
        f"r0 AS (SELECT src AS node, {PR_UNIT}::BIGINT AS rank FROM deg)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""", r{i} AS (
  SELECT e.dst AS node,
         {base}::BIGINT + CAST(sum(r.rank // dg.d) * {damping_pct} AS BIGINT) // 100 AS rank
  FROM edges e
  JOIN r{i - 1} r ON e.src = r.node
  JOIN deg dg ON e.src = dg.src
  GROUP BY e.dst)"""
        )
    return "WITH " + "\n".join(parts)
