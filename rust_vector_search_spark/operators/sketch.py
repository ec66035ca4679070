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

``hll_distinct`` applies the same bar to cardinality estimation
(Flajolet et al. 2007 HyperLogLog): md5-derived (bucket, rank)
registers, integer register state (the harmonic-mean denominator is an
EXACT bigint — sum of 2^(49-M_j) — so no float reassociation can creep
into the merge), one double divide + the textbook small-range
linear-counting branch at the very end. Spark's own
``approx_count_distinct`` (HLL++, engine-internal state) stays
registered rows-only as ``events_approx_distinct_users``; this operator
is the value-hash-checkable twin.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window

__all__ = [
    "cms_bucket",
    "cms_build",
    "cms_estimate",
    "cms_heavy_hitters",
    "hll_distinct",
    "HLL_M",
    "HLL_ALPHA_M2_SCALED",
    "bloom_positions",
    "bloom_words",
    "bloom_might_contain",
]


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


HLL_M = 256  # 2^p registers, p = 8 (±1.04/√256 ≈ 6.5% standard error)

# alpha_m · m² · 2^49 — the whole estimator numerator folded into ONE
# double literal so both engines compute est = C / S with a single IEEE
# divide (identical inputs ⇒ identical double ⇒ identical floor).
HLL_ALPHA_M2_SCALED = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 562949953421312.0


def hll_distinct(df: DataFrame, key_col: str, group_cols: list[str]) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate, engine-portable.

    Register derivation (m = 256, p = 8): h = md5(key); bucket = first
    2 hex chars (8 bits); w = next 12 hex chars (48 bits); rank
    ρ = leading zeros of w in its 48-bit window + 1 = 49 - bit_length(w)
    (ρ = 49 at w = 0). Register M_j = max ρ over the bucket's keys.

    The harmonic-mean denominator Σ 2^(-M_j) is kept EXACT by scaling:
    S = Σ 2^(49-M_j) as a bigint (≤ 256·2^49 = 2^57 — no overflow, no
    float rounding in the aggregation, so partial/final merge order is
    irrelevant — the 100 TB mergeability story with zero float risk).
    Absent buckets contribute 2^49 (M = 0) without materializing them:
    S += (m - #present) · 2^49. Raw estimate = α_m·m²·2^49 / S — one
    double divide. Small-range branch (raw ≤ 2.5m, zero registers
    V > 0): linear counting m·ln(m/V), the one libm call — cross-engine
    floor parity over every reachable V ∈ [1, 255] is pinned by
    tests/test_mixing.py::test_hll_linear_counting_engine_parity.

    Returns (group_cols…, hll_est: bigint) — floor of the estimate.
    """
    h = F.md5(F.col(key_col).cast("string"))
    b = F.conv(F.substring(h, 1, 2), 16, 10).cast("long").alias("b")
    w = F.conv(F.substring(h, 3, 12), 16, 10).cast("long")
    rho = F.when(w > 0, F.lit(49) - F.length(F.bin(w))).otherwise(F.lit(49))
    regs = df.groupBy(*group_cols, b).agg(F.max(rho).alias("m_j"))
    per = regs.groupBy(*group_cols).agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(49 - m_j AS INT))")).alias(
            "s_present"
        ),
        F.count(F.lit(1)).alias("n_present"),
    )
    m = F.lit(HLL_M)
    s = (
        F.col("s_present")
        + (m - F.col("n_present")).cast("long") * F.lit(562949953421312).cast("long")
    )
    v = (m - F.col("n_present")).cast("double")  # zero registers
    raw = F.lit(HLL_ALPHA_M2_SCALED) / s.cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (v > 0),
        m.cast("double") * F.log(m.cast("double") / v),
    ).otherwise(raw)
    return per.select(*group_cols, F.floor(est).cast("long").alias("hll_est"))


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


# --- Bloom filter: runtime join pruning ---------------------------------------
#
# The runtime-filter shape every large-scale engine injects around a
# selective join (Spark's InjectRuntimeFilter, Trino's dynamic filters):
# fold the SMALL side's join keys into an m-bit filter (one bounded
# aggregation — the state is m bits regardless of row count), ship it to
# every scan task of the BIG side (m/8 bytes — here 512), and drop
# non-candidate rows BEFORE they reach the join exchange. No false
# negatives ever (every true match survives); false positives only cost
# wasted shuffle rows, quantified by the registered query. Spark's own
# bloom_filter_agg/might_contain use engine-internal xxhash64 state; this
# operator uses the repo's salted-md5 positions (cms_bucket — the same
# family as the CMS rows above) so a DuckDB oracle replays membership
# bit-for-bit.


def bloom_positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """The k filter positions of a key: salted-md5 buckets mod m — the
    identical hash family as the CMS (independent salted digests, no
    slicing of one digest)."""
    return [cms_bucket(key, i, m_bits) for i in range(k)]


def bloom_words(small: DataFrame, key_col: str, m_bits: int, k: int) -> list[int]:
    """Build the filter from the small side as ``m_bits/64`` signed
    64-bit words. One aggregation (distinct positions — at most m_bits
    rows into the driver, a CONFIG constant independent of data scale:
    the same bounded collect Spark's own runtime-filter planner does
    when it re-broadcasts the bloom aggregate)."""
    pos = (
        small.select(
            F.explode(F.array(*bloom_positions(F.col(key_col), m_bits, k))).alias("p")
        )
        .distinct()
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in pos:
        words[r["p"] // 64] |= 1 << (r["p"] % 64)
    # LongType is signed: wrap the high bit
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(
    key: Column, words: list[int], m_bits: int, k: int
) -> Column:
    """Membership predicate against the broadcast word array: for each
    of the key's k positions, index the word (element_at — O(1), no
    scan of the filter) and test the bit. Pure JVM integer ops inside
    whole-stage codegen — the per-row cost a 100 TB scan can afford."""
    lit_words = F.array(*[F.lit(w).cast("long") for w in words])
    checks = []
    for p in bloom_positions(key, m_bits, k):
        word = F.element_at(lit_words, (p / 64).cast("int") + 1)
        bit = F.getbit(word, p % 64)
        checks.append(bit == 1)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out
