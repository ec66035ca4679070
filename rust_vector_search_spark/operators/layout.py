"""Z-order (Morton) data layout + min/max skipping statistics.

The 100 TB lever the relational queries rely on implicitly: Parquet/
Iceberg/Delta scans prune row groups and files by min/max column stats,
but stats only prune if the LAYOUT clusters each column's values. A
single-column sort gives perfect pruning on that column and none on any
other; interleaving the bits of two keys (the Morton / Z-order curve —
the technique behind Delta OPTIMIZE ZORDER BY and Iceberg's z-ordered
rewrites) gives every interleaved column locality at once.

Everything here is integer bit arithmetic — ``shiftright``/``&``/``|``
on BIGINT — so the DuckDB oracle replays it bit-for-bit; no UDF, no
float, no shuffle beyond the one global sort any layout rewrite pays.

Reference note: the reference engine has no storage layout at all (its
corpus lives in RAM, ``/root/reference/src/lib.rs:15-19``); this module
is part of the Spark-first scale surface, not reference parity.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window

__all__ = ["morton_z2", "zorder_bucket_stats", "dd_morton_z2"]

Z_BITS = 16  # bits kept per key: 2 keys x 16 bits -> 32-bit z-value


def morton_z2(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """Interleave the low ``bits`` bits of two BIGINT columns:
    bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1.

    Keys wider than ``bits`` are masked (real z-order writers normalize
    values into a fixed bit budget the same way); the mask keeps the
    expression a pure function of the inputs in BOTH engines.
    """
    a = a.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    b = b.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda x, y: x.bitwiseOR(y), parts).alias("zval")


def dd_morton_z2(a: str, b: str, bits: int = Z_BITS) -> str:
    """DuckDB SQL twin of :func:`morton_z2` (same masks, same shifts)."""
    mask = (1 << bits) - 1
    parts = []
    for i in range(bits):
        parts.append(f"((({a} & {mask}) >> {i} & 1) << {2 * i})")
        parts.append(f"((({b} & {mask}) >> {i} & 1) << {2 * i + 1})")
    return "(" + " | ".join(parts) + ")"


def zorder_bucket_stats(
    df: DataFrame,
    key_a: str,
    key_b: str,
    n_buckets: int = 32,
    tie_break: list[str] | None = None,
) -> DataFrame:
    """Lay ``df`` out in z-order over (key_a, key_b), cut it into
    ``n_buckets`` equal files (``ntile``), and report each bucket's
    min/max per key — exactly the stats a Parquet footer would carry.

    At cluster scale the ntile-over-global-sort is a
    ``repartitionByRange(zval)`` + ``sortWithinPartitions`` write; the
    stats table here makes the pruning effect measurable (and
    oracle-checkable) without inspecting file footers.
    """
    tie = tie_break or [key_a, key_b]
    z = df.withColumn("zval", morton_z2(F.col(key_a), F.col(key_b)))
    w = Window.orderBy("zval", *tie)
    return (
        z.withColumn("bucket", F.ntile(n_buckets).over(w))
        .groupBy("bucket")
        .agg(
            F.min(key_a).alias(f"min_{key_a}"),
            F.max(key_a).alias(f"max_{key_a}"),
            F.min(key_b).alias(f"min_{key_b}"),
            F.max(key_b).alias(f"max_{key_b}"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
