"""Count-min sketch — fixed-size frequency state for heavy-hitter
detection over unbounded key domains (Cormode & Muthukrishnan 2005).

Why it matters at 100 TB: an exact per-key count over a high-cardinality
column (URLs, user ids, n-grams) shuffles one row per key; the CMS
shuffles a FIXED depth×width counter grid (here 4×256 longs) no matter
how many keys exist — the aggregation state the 'frequent boilerplate
n-grams' and 'top talkers' passes of a training-data pipeline want.
Estimates only ever OVER-count (collisions add), never under-count —
``est(k) = min_i grid[i][h_i(k)] ≥ true(k)``.

Determinism bar: the d hash functions are salted md5 (first 8 hex chars
→ integer, the same engine-portable trick as MinHash in
operators/dedup.py) — no RNG, bit-identical buckets in any engine, so a
DuckDB oracle rebuilds the sketch and replays every estimate exactly.
This is the repo's first value-checkable SKETCH (the HLL++
``events_approx_distinct_users`` is Spark-internal and rows-only).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window

__all__ = ["cms_bucket", "cms_build", "cms_estimate", "cms_heavy_hitters"]


def cms_bucket(key: Column, row_i: int, width: int) -> Column:
    """Hash row ``row_i``'s bucket for a key: first 8 hex chars of
    md5('i:' || key) as an integer, mod width. Salting the digest input
    (not slicing one digest d ways) keeps rows independent."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{row_i}:"), key.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the sketch from the RAW stream (one increment per input
    row — the state never sees per-key aggregation, which is the whole
    point). Returns ≤ depth·width rows (r, b, cnt): a partial+final
    count over a bounded group domain — the shuffle carries at most
    depth·width rows per map task regardless of input size."""
    key = F.col(key_col)
    rb = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("r"),
                        cms_bucket(key, i, width).alias("b"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rb")
    )
    return rb.groupBy(F.col("rb.r").alias("r"), F.col("rb.b").alias("b")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point estimates for a key set: min over the depth rows of each
    key's bucket counters. The sketch is ≤ depth·width rows —
    broadcast — so estimation is a map-side join + a min-agg on the
    key. Returns (key, cms_est)."""
    kb = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("r"),
                        cms_bucket(F.col(key_col), i, width).alias("b"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(key_col, F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
    joined = kb.join(F.broadcast(sketch), ["r", "b"])
    return joined.groupBy(key_col).agg(F.min("cnt").alias("cms_est"))


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 10,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Top-k keys by CMS estimate, with the exact count alongside (the
    demonstration pairing: est ≥ exact always; at width ≪ #keys the
    overestimate is visible and bounded). Ties break on the key.
    Returns (key, exact_count, cms_est, rnk)."""
    sketch = cms_build(df, key_col, depth, width)
    exact = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("exact_count"))
    est = cms_estimate(sketch, exact.select(key_col), key_col, depth, width)
    both = exact.join(est, key_col)
    w = Window.orderBy(F.col("cms_est").desc(), F.col(key_col).asc())
    return (
        both.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(key_col, "exact_count", "cms_est", "rnk")
    )
