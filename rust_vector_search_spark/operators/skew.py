"""Skew-mitigation operators: two-phase salted aggregation.

Random hyperplanes through duplicate-heavy regions create hot leaves
(SURVEY §7.3.4), hot shingles create hot LSH buckets, and hot group keys
create straggler reducers. AQE's skew-join splitting handles the join
side; for aggregations over skewed keys the classic fix is SALTING:
shard each group key into ``num_salts`` sub-groups (phase 1: partial
aggregate per (key, salt) — spreads one hot key over many reducers),
then combine the shards (phase 2: tiny shuffle over distinct keys).

Correct for any commutative+associative aggregate; exposed here for
count/sum and used by an oracle-checked query to prove the rewrite
preserves results exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = ["salted_agg"]


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    sum_cols: dict[str, Column],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: ``sum_cols`` maps output name → addend
    Column (summed exactly; pass decimal-cast addends for the oracle
    contract). A `n_rows` count is always included.

    The salt is derived DETERMINISTICALLY from the full row content
    (xxhash64 over every column) — never from
    monotonically_increasing_id(), whose value changes on task retry /
    stage recompute and, feeding a shuffle key, would re-salt rows into
    different groups and double-count or drop them. Rows identical in
    every column share a salt (their map-side partial agg collapses them
    anyway); any value diversity under a hot key spreads it."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(num_salts))
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*group_cols, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            *[F.sum(expr).alias(f"_s_{name}") for name, expr in sum_cols.items()],
        )
    )
    return phase1.groupBy(*group_cols).agg(
        F.sum("_c").alias("n_rows"),
        *[
            F.sum(f"_s_{name}").cast("double").alias(name)
            for name in sum_cols
        ],
    )
