"""Semantics tests for the r6b additions: z-order layout stats, SCD2
versioning, hard-negative mining, and stateful streaming sessionization.
(Value parity vs DuckDB is covered for all four by test_oracle_parity's
registry-wide parametrization; these tests pin the operator-level
invariants the hashes alone don't explain.)"""

from __future__ import annotations

import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from conftest import SF_SMOKE  # noqa: E402


def test_morton_interleave_matches_python_reference(spark):
    from rust_vector_search_spark.operators.layout import morton_z2

    def py_z(a: int, b: int, bits: int = 16) -> int:
        a &= (1 << bits) - 1
        b &= (1 << bits) - 1
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    rows = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (70000, 3)]
    df = spark.createDataFrame(rows, "a long, b long").withColumn(
        "z", morton_z2(F.col("a"), F.col("b"))
    )
    for r in df.collect():
        assert r.z == py_z(r.a, r.b), (r.a, r.b)


def test_zorder_layout_skips_more_buckets_than_natural(spark):
    """The point of the operator: under z-order the selective partkey
    predicate prunes buckets; under insertion order it can't."""
    from rust_vector_search_spark.plans import QUERIES

    stats = QUERIES["zorder_layout_stats"](spark, SF_SMOKE).collect()
    need = {
        layout: sum(1 for r in stats if r.layout == layout and r.scan_needed)
        for layout in ("zorder", "natural")
    }
    total = {
        layout: sum(1 for r in stats if r.layout == layout)
        for layout in ("zorder", "natural")
    }
    assert total["zorder"] == 32 and total["natural"] == 32
    # every bucket holds the same row count ±1 (ntile contract)
    counts = sorted(r.n_rows for r in stats if r.layout == "zorder")
    assert counts[-1] - counts[0] <= 1
    assert need["zorder"] < need["natural"], need


def test_scd2_versions_partition_time_and_close_correctly(spark):
    from rust_vector_search_spark.plans import QUERIES

    rows = QUERIES["scd2_customer_order_history"](spark, SF_SMOKE).collect()
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r.custkey, []).append(r)
    assert by_cust
    for cust, vs in by_cust.items():
        vs.sort(key=lambda r: r.version)
        # exactly one open (current) version, and it is the last one
        assert sum(1 for r in vs if r.is_current) == 1
        assert vs[-1].is_current and vs[-1].valid_to is None
        prev_total = 0.0
        for i, r in enumerate(vs):
            assert r.version == i + 1
            # half-open intervals chain: valid_to == next valid_from
            if i + 1 < len(vs):
                assert r.valid_to == vs[i + 1].valid_from
            assert r.cum_total > prev_total - 1e-9
            prev_total = r.cum_total


def test_hard_negatives_never_share_the_query_label(spark):
    from rust_vector_search_spark.plans import QUERIES

    rows = QUERIES["hard_negative_pairs"](spark, SF_SMOKE).collect()
    assert rows
    per_q: dict[int, list] = {}
    for r in rows:
        assert r.neg_label != r.query_label
        assert r.vec_id != r.query_id
        per_q.setdefault(r.query_id, []).append(r)
    for q, rs in per_q.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        sims = [r.cos_sim for r in rs]
        assert sims == sorted(sims, reverse=True)


def test_stateful_sessions_agree_with_batch_sessionization(spark):
    """The streaming state machine and the batch gaps-and-islands SQL
    are the same function of the data: per-user session count and event
    total must match, and exactly one session per user is open."""
    from rust_vector_search_spark.plans import QUERIES

    stream_rows = QUERIES["streaming_stateful_sessions"](spark, SF_SMOKE).collect()
    batch_rows = QUERIES["events_sessionization"](spark, SF_SMOKE).collect()

    per_user: dict[int, list] = {}
    for r in stream_rows:
        per_user.setdefault(r.user_id, []).append(r)
    batch = {r.user_id: (r.n_sessions, r.n_events) for r in batch_rows}
    assert set(per_user) == set(batch)
    for user, sessions in per_user.items():
        assert sum(1 for s in sessions if s.is_open) == 1
        assert len(sessions) == batch[user][0]
        assert sum(s.n_events for s in sessions) == batch[user][1]
        # the open session is the latest one
        assert max(sessions, key=lambda s: s.session_end).is_open


def test_zorder_plan_is_distributed_and_wide_keys_cluster(spark):
    """Scale guards for the r7 rewrite (VERDICT r6 #2 + ADVICE r6):
      - NO Exchange SinglePartition anywhere in the executed plan — the
        bucketing must be the two-pass distributed rank, not a
        one-task global-sort ntile;
      - range normalization must preserve the WIDE key's clustering:
        l_orderkey exceeds the 16-bit budget even at smoke SF, so under
        the old truncation its z-contribution wrapped and every z-order
        bucket spanned ~the full orderkey domain; with range scaling
        the mean per-bucket orderkey span must be well under half the
        domain."""
    from rust_vector_search_spark.plans import QUERIES

    df = QUERIES["zorder_layout_stats"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan

    stats = df.collect()
    zrows = [r for r in stats if r.layout == "zorder"]
    domain = max(r.max_orderkey for r in zrows) - min(
        r.min_orderkey for r in zrows
    )
    mean_span = sum(r.max_orderkey - r.min_orderkey for r in zrows) / len(zrows)
    assert mean_span < 0.5 * domain, (mean_span, domain)


def test_ranked_bucket_stats_matches_ntile_window(spark):
    """The distributed two-pass rank must agree bucket-for-bucket with
    the single-partition ntile window it replaces, including the
    uneven-tail case (n_rows not divisible by n_buckets)."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from rust_vector_search_spark.operators.layout import ranked_bucket_stats

    df = (
        spark.range(1003)
        .select(
            (F.col("id") * 37 % 1009).alias("k"),
            F.col("id").alias("v"),
        )
    )
    got = {
        r.bucket: (r.min_k, r.max_k, r.min_v, r.max_v, r.n_rows)
        for r in ranked_bucket_stats(df, ["k", "v"], ["k", "v"], 7).collect()
    }
    w = Window.orderBy("k", "v")
    want = {
        r.bucket: (r.min_k, r.max_k, r.min_v, r.max_v, r.n_rows)
        for r in df.withColumn("bucket", F.ntile(7).over(w))
        .groupBy("bucket")
        .agg(
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    }
    assert got == want
