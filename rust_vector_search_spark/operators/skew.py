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

__all__ = ["salted_agg", "salted_join"]


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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    num_salts: int = 16,
) -> DataFrame:
    """Skew-salted equi-join — the join-side twin of ``salted_agg``,
    for the case AQE's skew splitting can't reach: BOTH sides too big
    to broadcast and a hot key that would pin one reducer. The big
    side salts each row deterministically (xxhash64 over every column
    — stable under task retry, unlike monotonically_increasing_id);
    the small side replicates ``num_salts`` ways (explode of a
    sequence — its shuffle volume grows num_salts×, the knob trading
    replication for parallelism). Joining on (key, salt) spreads one
    hot key over num_salts reducers and emits EXACTLY the rows of the
    plain key join — proven by the oracle-checked query
    ``salted_join_orders_lineitem``.

    Returns the joined frame with the salt/replica columns dropped.
    The plain-join equality holds for any join graph because every
    (big row, small row) pair with equal keys meets in exactly one
    salt shard: the big row's single salt s, met by the small row's
    replica s."""
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(num_salts)
    ).cast("int")
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    joined = b.join(
        s, (b[big_key] == s[small_key]) & (b["_salt"] == s["_salt"])
    )
    return joined.drop(b["_salt"]).drop(s["_salt"])
